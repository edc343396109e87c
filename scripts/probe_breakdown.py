"""Probe: per-phase timing of the hybrid sort at 16M + the downstream
unequal merge and counts kernel — where does the 30.6 ms headline go?

Timing = bench.py's sustained methodology: a device-side fori_loop of
REPS iterations with a data-dependent (always-zero) input bias, one
scalar readback ( block_until_ready alone is unreliable through the
axon relay )."""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import ccve_tpu  # noqa: F401
from ccve_tpu.kernels import bigsort as bs
from ccve_tpu.kernels.merge_scan import merge_scan_build_counts

N = 16 * (1 << 20)
M = 1 << 20
TILE_LOG, CHUNK_LOG = bs.TILE_LOG, bs.CHUNK_LOG
tile = 1 << TILE_LOG
n_pad = N + ((-N) % tile)
rows = n_pad // 128
R = tile // 128
nt = n_pad // tile
REPS = 8

rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 2**30, n_pad, dtype=np.int32)).reshape(rows, 128)
bkeys = np.sort(rng.choice(2**30, M, replace=False)).astype(np.int32)
b = jnp.asarray(bkeys)
smerged = jnp.sort(jnp.concatenate([x.reshape(-1), b]))

spec = pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)


def local_call(kern, y):
    with jax.enable_x64(False):
        return pl.pallas_call(
            kern, grid=(nt,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
            compiler_params=bs._VMEM_BIG,
        )(y)


k_pre = bs._make_local_kernel(TILE_LOG, 0, CHUNK_LOG, alt_in=True)
k_ph2 = bs._make_local_kernel(TILE_LOG, CHUNK_LOG, alt_out=True)

PHASES = {
    "presort(16M)": (lambda y: local_call(k_pre, y), x, True),
    "phase2(16M)": (lambda y: local_call(k_ph2, y), x, True),
    "fullsort(16M)": (
        lambda y: bs._sort_padded(y.reshape(-1), TILE_LOG, CHUNK_LOG).reshape(
            rows, 128
        ),
        x,
        True,
    ),
    "merge_16M_1M": (
        lambda y: bs.merge_sorted_i32(y, b)[: rows * 128].reshape(rows, 128),
        x.reshape(-1),
        False,
    ),
    "counts(17M)": (
        lambda y: merge_scan_build_counts(y, M),
        smerged,
        False,
    ),
}


def sustained(f, arg):
    @jax.jit
    def run_loop(v):
        def body(_, acc):
            bias = (acc & 0).astype(jnp.int32)
            r = f(v + bias)
            return acc + r.reshape(-1)[0].astype(jnp.int64)

        return jax.lax.fori_loop(0, REPS, body, jnp.int64(0))

    t0 = time.perf_counter()
    int(run_loop(arg))  # compile + warm
    warm = time.perf_counter() - t0
    best = min(
        (lambda t: (int(run_loop(arg)), time.perf_counter() - t)[1])(
            time.perf_counter()
        )
        for _ in range(3)
    )
    return best / REPS, warm


for name, (f, arg, _) in PHASES.items():
    t, warm = sustained(f, arg)
    print(f"{name}: {t*1e3:.2f} ms  (compile+warm {warm:.0f}s)", flush=True)
