"""Round-5 wide-key chip measurement (VERDICT #2): the SPLIT-PLANE
count-side route (single i32 compare plane + tie fixup,
ops/sort_merge._count_side_bc64_split) vs the round-4 limb ladder vs
the packed-i32 control, config-1 geometry (1M build / 2^24 probe,
keys spanning ~2^40). Done-bar: split within 2.0x of packed.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5000 \
       python -u scripts/probe_r5_wide.py
"""

import json
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

from ccve_tpu.ops import sort_merge as sm

print("devices:", jax.devices(), flush=True)

N_BUILD, N_PROBE, NITER = 1_000_000, 1 << 24, 8
rng = np.random.default_rng(1)

wide_keys = rng.integers(0, 2**40, N_BUILD, dtype=np.int64)
wide_probe = np.concatenate(
    [
        rng.choice(wide_keys, N_PROBE // 2),
        rng.integers(0, 2**40, N_PROBE - N_PROBE // 2, dtype=np.int64),
    ]
)
rng.shuffle(wide_probe)
payloads = rng.integers(0, 2**30, N_BUILD, dtype=np.int64)

sk = np.sort(wide_keys)
lo = np.searchsorted(sk, wide_probe, "left")
hi = np.searchsorted(sk, wide_probe, "right")
expected = int((hi - lo).sum())
order = np.argsort(wide_keys, kind="stable")
cpay = np.concatenate([[0], np.cumsum(payloads[order])])
expected_chk = int((cpay[hi] - cpay[lo]).sum())
print(f"expected count {expected} chk {expected_chk}", flush=True)

t_wide = sm.build_sorted(wide_keys, payloads)
assert t_wide.pack32 is None and t_wide.wide_ok
assert t_wide.span_bits is not None and 30 < t_wide.span_bits <= 61
print("span_bits", t_wide.span_bits, flush=True)
probe_wide = jax.device_put(jnp.asarray(wide_probe))

narrow_keys = np.arange(N_BUILD, dtype=np.int64)
narrow_probe = rng.integers(0, 2 * N_BUILD, N_PROBE, dtype=np.int64)
t_narrow = sm.build_sorted(narrow_keys, payloads)
probe_narrow = jax.device_put(jnp.asarray(narrow_probe.astype(np.int32)))


def timed_loop(fn, probe, expected=None, expected_chk=None, niter=NITER):
    if expected is not None:
        c1, chk1 = jax.jit(fn)(probe)
        assert int(c1) == expected, (int(c1), expected)
        if expected_chk is not None:
            assert int(chk1) == expected_chk, (int(chk1), expected_chk)

    @jax.jit
    def loop(p):
        def body(_, acc):
            bias = jnp.where(acc < 0, 1, 0).astype(p.dtype)
            c, chk = fn(p + bias)
            return acc + c

        return jax.lax.fori_loop(0, niter, body, jnp.int64(0))

    tot = int(loop(probe))
    if expected is not None:
        assert tot == niter * expected, (tot, niter * expected)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(loop(probe))
        best = min(best, time.perf_counter() - t0)
    return best / niter


def wide_route(route):
    def run():
        old = sm.WIDE_COUNT_ROUTE
        sm.WIDE_COUNT_ROUTE = route
        try:
            return timed_loop(
                lambda p: sm.sorted_match_totals(t_wide, p, use_kernel=True),
                probe_wide, expected, expected_chk,
            )
        finally:
            sm.WIDE_COUNT_ROUTE = old

    return run


results = {}
cases = [
    ("wide_split_plane", wide_route("split"), N_PROBE),
    ("wide_limb_ladder", wide_route("limb"), N_PROBE),
    (
        "narrow_packed",
        lambda: timed_loop(
            lambda p: sm.sorted_match_totals(t_narrow, p, use_kernel=True),
            probe_narrow,
        ),
        N_PROBE,
    ),
]
for name, run, n in cases:
    try:
        t = run()
        results[name] = {
            "ms": round(t * 1e3, 2),
            "rows_per_s_M": round(n / t / 1e6, 1),
        }
        print(f"{name}: {t * 1e3:.2f} ms ({n / t / 1e6:.1f}M/s)", flush=True)
    except Exception:
        print(f"{name}: FAILED", flush=True)
        traceback.print_exc()
        results[name] = None

if results.get("wide_split_plane") and results.get("narrow_packed"):
    results["split_vs_packed_ratio"] = round(
        results["narrow_packed"]["rows_per_s_M"]
        / results["wide_split_plane"]["rows_per_s_M"],
        2,
    )
if results.get("wide_limb_ladder") and results.get("narrow_packed"):
    results["limb_vs_packed_ratio"] = round(
        results["narrow_packed"]["rows_per_s_M"]
        / results["wide_limb_ladder"]["rows_per_s_M"],
        2,
    )
print(json.dumps(results), flush=True)
