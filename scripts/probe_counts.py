"""On-chip probe: dense-counts kernel time vs tile height R at headline
scale (17.8M stream, 1M builds). Grid-step overhead vs ladder-depth
trade (PERF_NOTES.md roadmap)."""

import time
import numpy as np
import jax
import jax.numpy as jnp

from ccve_tpu.kernels.merge_scan import merge_scan_build_counts

rng = np.random.default_rng(0)
m = 1 << 20
n_probe = 1 << 24
bk = np.sort(rng.integers(0, 1 << 29, m).astype(np.int32))
pk = rng.choice(bk, n_probe).astype(np.int32)
s = np.sort(np.concatenate([(pk.astype(np.int64) << 1),
                            (bk.astype(np.int64) << 1) | 1])).astype(np.int32)
sj = jnp.asarray(s)

# reference counts
ref_total = np.sum(np.isin(pk, bk))  # all hit by construction = n_probe


def timed(f, *a, reps=10):
    r = f(*a)
    np.asarray(jax.device_get(r.reshape(-1)[:1]))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    np.asarray(jax.device_get(r.reshape(-1)[:1]))
    return (time.perf_counter() - t0) / reps, r


for R in (64, 128, 256):
    f = jax.jit(lambda x, R=R: merge_scan_build_counts(x, m, R=R))
    t, bc = timed(f, sj)
    tot = int(jnp.sum(bc.astype(jnp.int64)))
    ok = tot == n_probe
    print(f"R={R:4d}: {t*1e3:7.2f} ms  total={tot} ok={ok}")
