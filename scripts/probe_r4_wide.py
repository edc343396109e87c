"""Round-4 wide-key chip measurement (VERDICT #3 done-bar): config-1
geometry (1M build / 16M probe) with keys spanning ~2^40, limb-sort
Pallas path vs the packed-i32 path on narrow keys vs the old int64
lax.sort fallback.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5000 \
       python -u scripts/probe_r4_wide.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ccve_tpu.ops import sort_merge as sm

print("devices:", jax.devices(), flush=True)

N_BUILD, N_PROBE, NITER = 1_000_000, 16_000_000, 8
rng = np.random.default_rng(1)

# wide: keys uniform over ~2^40 span; probes half-hit
wide_keys = np.sort(
    rng.choice(
        np.arange(2**40, dtype=np.int64), N_BUILD, replace=False
    )
    if False
    else rng.integers(0, 2**40, N_BUILD, dtype=np.int64)
)
wide_probe = np.concatenate(
    [
        rng.choice(wide_keys, N_PROBE // 2),
        rng.integers(0, 2**40, N_PROBE - N_PROBE // 2, dtype=np.int64),
    ]
)
rng.shuffle(wide_probe)
payloads = rng.integers(0, 2**30, N_BUILD, dtype=np.int64)

t_wide = sm.build_sorted(wide_keys, payloads)
assert t_wide.pack32 is None and t_wide.wide_ok, (
    t_wide.pack32, t_wide.wide_ok,
)
probe_wide = jax.device_put(jnp.asarray(wide_probe))

# narrow control: same multiset structure, keys compressed to ranks
# (span < 2^30 -> packed path)
rank_of = {int(k): i for i, k in enumerate(np.sort(wide_keys))}
narrow_keys = np.arange(N_BUILD, dtype=np.int64)
narrow_probe = np.asarray(
    [rank_of.get(int(k), N_BUILD + (int(k) % N_BUILD)) for k in
     wide_probe[: 1 << 22]],
    dtype=np.int64,
)  # 4M subset for the control (host remap is slow; scaling is linear)
t_narrow = sm.build_sorted(narrow_keys, payloads)
probe_narrow = jax.device_put(jnp.asarray(narrow_probe.astype(np.int32)))


def timed_loop(fn, probe, expected=None, niter=NITER):
    @jax.jit
    def loop(p):
        def body(_, acc):
            bias = jnp.where(acc < 0, 1, 0).astype(p.dtype)
            c, chk = fn(p + bias)
            return acc + c

        return jax.lax.fori_loop(0, niter, body, jnp.int64(0))

    tot = int(loop(probe))
    if expected is not None:
        assert tot == niter * expected, (tot, expected)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(loop(probe))
        best = min(best, time.perf_counter() - t0)
    return best / niter, tot // niter


results = {}

# ground truth once (XLA path, one dispatch)
c_ref, chk_ref = sm.sorted_match_totals(
    t_wide, probe_wide, use_kernel=False
)
c_ref = int(c_ref)
print(f"wide expected count {c_ref}", flush=True)

t, c = timed_loop(
    lambda p: sm.sorted_match_totals(t_wide, p, use_kernel=True),
    probe_wide, expected=c_ref,
)
results["wide_pallas"] = {"ms": round(t * 1e3, 2),
                          "rows_per_s_M": round(N_PROBE / t / 1e6, 1)}
print(f"wide pallas: {t * 1e3:.2f} ms ({N_PROBE / t / 1e6:.1f}M/s)",
      flush=True)

t, c = timed_loop(
    lambda p: sm.sorted_match_totals(t_wide, p, use_kernel=False),
    probe_wide, expected=c_ref, niter=2,
)
results["wide_xla_fallback"] = {
    "ms": round(t * 1e3, 2),
    "rows_per_s_M": round(N_PROBE / t / 1e6, 1),
}
print(f"wide xla: {t * 1e3:.2f} ms", flush=True)

t, c = timed_loop(
    lambda p: sm.sorted_match_totals(t_narrow, p, use_kernel=True),
    probe_narrow,
)
n_sub = narrow_probe.shape[0]
results["narrow_packed_4M"] = {
    "ms": round(t * 1e3, 2),
    "rows_per_s_M": round(n_sub / t / 1e6, 1),
}
print(
    f"narrow packed (4M subset): {t * 1e3:.2f} ms "
    f"({n_sub / t / 1e6:.1f}M/s)",
    flush=True,
)
results["wide_vs_packed_ratio"] = round(
    results["narrow_packed_4M"]["rows_per_s_M"]
    / results["wide_pallas"]["rows_per_s_M"],
    2,
)
print(json.dumps(results), flush=True)
