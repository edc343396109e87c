"""Probe: replace phase-1 XLA batched pre-sort with an in-VMEM Pallas
Batcher presort (p 0..chunk_log-1, 91 stages at chunk 2^13)."""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import ccve_tpu  # noqa: F401
from ccve_tpu.kernels import bigsort as bs

N = 17 * (1 << 20)
TILE_LOG, CHUNK_LOG = bs.TILE_LOG, bs.CHUNK_LOG
tile = 1 << TILE_LOG
n_pad = N + ((-N) % tile)
rows = n_pad // 128
R = tile // 128
nt = n_pad // tile

rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 2**30, n_pad, dtype=np.int32)).reshape(rows, 128)


def timed(f, *a, reps=8):
    r = f(*a)
    np.asarray(jax.device_get(r.reshape(-1)[:1]))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    np.asarray(jax.device_get(r.reshape(-1)[:1]))
    return (time.perf_counter() - t0) / reps


@jax.jit
def xla_presort(y):
    return jax.lax.sort([y.reshape(-1, 1 << CHUNK_LOG)], dimension=1,
                        num_keys=1)[0].reshape(rows, 128)


@jax.jit
def pallas_presort(y):
    with jax.enable_x64(False):
        spec = pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            bs._make_local_kernel(TILE_LOG, 0, CHUNK_LOG),
            grid=(nt,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
            compiler_params=bs._VMEM_BIG,
        )(y)


t0 = time.perf_counter()
t = timed(xla_presort, x)
print(f"xla_presort_8k: {t*1e3:.2f} ms  (compile+warm {time.perf_counter()-t0:.0f}s)", flush=True)

t0 = time.perf_counter()
t = timed(pallas_presort, x)
print(f"pallas_presort_0to13: {t*1e3:.2f} ms  (compile+warm {time.perf_counter()-t0:.0f}s)", flush=True)

out = pallas_presort(x)
ref = np.sort(np.asarray(x).reshape(-1, 1 << CHUNK_LOG), axis=1).reshape(rows, 128)
print("correct:", np.array_equal(np.asarray(out), ref), flush=True)
