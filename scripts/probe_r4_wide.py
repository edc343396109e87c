"""Round-4 wide-key chip measurement (VERDICT #3 done-bar): config-1
geometry (1M build / 2^24 probe) with keys spanning ~2^40, limb-sort
Pallas path vs the packed-i32 path on narrow keys vs the old int64
lax.sort fallback. Ground truth from numpy searchsorted (the remote
compiler SIGSEGVs on some fallback shapes); every variant guarded so
one failure doesn't kill the sweep.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5000 \
       python -u scripts/probe_r4_wide.py
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

# numpy ground truth (keys may repeat: count via sorted-run math)
sk = np.sort(wide_keys)
lo = np.searchsorted(sk, wide_probe, "left")
hi = np.searchsorted(sk, wide_probe, "right")
expected = int((hi - lo).sum())
order = np.argsort(wide_keys, kind="stable")
spay = payloads[order]
cpay = np.concatenate([[0], np.cumsum(spay)])
expected_chk = int((cpay[hi] - cpay[lo]).sum())
print(f"expected count {expected} chk {expected_chk}", flush=True)

t_wide = sm.build_sorted(wide_keys, payloads)
assert t_wide.pack32 is None and t_wide.wide_ok
probe_wide = jax.device_put(jnp.asarray(wide_probe))

narrow_keys = np.arange(N_BUILD, dtype=np.int64)
narrow_probe = rng.integers(0, 2 * N_BUILD, N_PROBE, dtype=np.int64)
t_narrow = sm.build_sorted(narrow_keys, payloads)
probe_narrow = jax.device_put(
    jnp.asarray(narrow_probe.astype(np.int32))
)


def timed_loop(fn, probe, expected=None, expected_chk=None, niter=NITER):
    # checksum validated ONCE outside the loop: a second int64
    # accumulator in the loop body triggers an XLA scoped-vmem
    # reduce-window compile bug at this scale (see PERF_NOTES)
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


results = {}
cases = [
    (
        "wide_pallas",
        lambda: timed_loop(
            lambda p: sm.sorted_match_totals(t_wide, p, use_kernel=True),
            probe_wide, expected, expected_chk,
        ),
        N_PROBE,
    ),
    (
        "wide_xla_fallback",
        lambda: timed_loop(
            lambda p: sm.sorted_match_totals(t_wide, p, use_kernel=False),
            probe_wide, expected, expected_chk, niter=2,
        ),
        N_PROBE,
    ),
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
        print(f"{name}: {t * 1e3:.2f} ms ({n / t / 1e6:.1f}M/s)",
              flush=True)
    except Exception:
        print(f"{name}: FAILED", flush=True)
        traceback.print_exc()
        results[name] = None

if results.get("wide_pallas") and results.get("narrow_packed"):
    results["wide_vs_packed_ratio"] = round(
        results["narrow_packed"]["rows_per_s_M"]
        / results["wide_pallas"]["rows_per_s_M"],
        2,
    )
print(json.dumps(results), flush=True)
