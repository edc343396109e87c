"""Probe: dense-counts kernel tile height R (currently 256) at 17M."""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import ccve_tpu  # noqa: F401
from ccve_tpu.kernels.merge_scan import merge_scan_build_counts

N, M = 16 * (1 << 20), 1 << 20
rng = np.random.default_rng(0)
keys = np.sort(rng.integers(0, 2**21, N + M).astype(np.int32))
s = jnp.asarray((keys.astype(np.int64) << 1).astype(np.int32))
# tag a sorted subset as builds: every ~17th entry
tag = (np.arange(N + M) % 17 == 0)
s = jnp.asarray(((keys.astype(np.int64) << 1) | tag).astype(np.int32))
m = int(tag.sum())
REPS = 8

ref = None
for R in [128, 256, 512, 1024]:
    f = jax.jit(lambda v, R=R: merge_scan_build_counts(v, m, R=R))

    @jax.jit
    def run_loop(v, R=R):
        def body(_, acc):
            bc = merge_scan_build_counts(
                v ^ (acc & 0).astype(jnp.int32), m, R=R
            )
            return acc + bc[0].astype(jnp.int64)

        with jax.enable_x64(False):
            return jax.lax.fori_loop(0, REPS, body, jnp.int64(0))

    try:
        got = np.asarray(f(s))
        if ref is None:
            ref = got
        ok = np.array_equal(got, ref)
        t0 = time.perf_counter()
        int(run_loop(s))
        warm = time.perf_counter() - t0
        best = min(
            (lambda t: (int(run_loop(s)), time.perf_counter() - t)[1])(
                time.perf_counter()
            )
            for _ in range(3)
        )
        print(
            f"R={R:5d}: {best/REPS*1e3:6.2f} ms  correct={ok} "
            f"(warm {warm:.0f}s)",
            flush=True,
        )
    except Exception as e:
        print(f"R={R:5d}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
