"""On-chip probe: XLA batched-sort cost vs run length at 16M scale, and
the hybrid sort's phase breakdown. Decides whether longer pre-sort runs
can shrink or replace the Batcher phase (PERF_NOTES.md roadmap 1)."""

import time
import numpy as np
import jax
import jax.numpy as jnp

N = 1 << 24  # 16M


def timed(f, *a, reps=8):
    r = f(*a)
    np.asarray(jax.device_get(r.reshape(-1)[:1]))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    np.asarray(jax.device_get(r.reshape(-1)[:1]))
    return (time.perf_counter() - t0) / reps


x = jnp.asarray(
    np.random.default_rng(0).integers(0, 1 << 30, N, np.int32)
)

for run_log in (13, 14, 15, 16, 17, 18):
    L = 1 << run_log

    @jax.jit
    def f(x, L=L):
        return jax.lax.sort([x.reshape(-1, L)], dimension=1, num_keys=1)[0]

    t = timed(f, x)
    print(f"batched sort runs 2^{run_log}: {t*1e3:7.2f} ms "
          f"({N/t/1e6:6.0f} M/s)")

# hybrid phases at 16M (probe-only scale)
from ccve_tpu.kernels.bigsort import pallas_sort_i32

t = timed(jax.jit(lambda x: pallas_sort_i32(x)), x)
print(f"hybrid full 16M: {t*1e3:7.2f} ms ({N/t/1e6:6.0f} M/s)")

xs = np.sort(np.asarray(x))
got = np.asarray(jax.jit(lambda x: pallas_sort_i32(x))(x))
print("correct:", np.array_equal(got, xs))

# 17M (current headline sort size)
x17 = jnp.asarray(
    np.random.default_rng(1).integers(0, 1 << 30, N + (1 << 20), np.int32)
)
t = timed(jax.jit(lambda x: pallas_sort_i32(x)), x17)
print(f"hybrid full 17M: {t*1e3:7.2f} ms ({x17.shape[0]/t/1e6:6.0f} M/s)")
