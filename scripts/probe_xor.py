"""Probe: halver stage via static XOR permutation (one row/lane gather)
vs the 2-roll+select form (_bitonic_stage). 17-stage chain at 16M."""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import ccve_tpu  # noqa: F401
from ccve_tpu.kernels import flatvec as fv
from ccve_tpu.kernels import bigsort as bs

TILE_LOG = 17
R = 1 << (TILE_LOG - 7)
NT = 128
rows = NT * R
REPS = 8

rng = np.random.default_rng(0)


def rm_kernel(x_ref, o_ref):
    v = x_ref[:]
    flat = fv.flat_index(R)
    for k_log in range(TILE_LOG - 1, -1, -1):
        v = bs._bitonic_stage(v, flat, k_log, R)
    o_ref[:] = v


def xor_kernel(x_ref, o_ref):
    v = x_ref[:]
    rr = fv.iota2(R, 0)
    flat = fv.flat_index(R)
    for k_log in range(TILE_LOG - 1, -1, -1):
        k = 1 << k_log
        if k_log >= 7:
            # partner = v[row ^ kr]: swap the halves of each aligned
            # 2*kr row block (two static slices + one concat)
            kr = k >> 7
            b = v.reshape(R // (2 * kr), 2, kr, 128)
            partner = jnp.concatenate([b[:, 1], b[:, 0]], axis=1).reshape(
                R, 128
            )
            is_lo = (rr & kr) == 0
            v = jnp.where(
                is_lo, jnp.minimum(v, partner), jnp.maximum(v, partner)
            )
        else:
            v = bs._bitonic_stage(v, flat, k_log, R)
    o_ref[:] = v


def run(kern, y):
    spec = pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(NT,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        compiler_params=bs._VMEM_BIG,
    )(y)


# correctness on per-tile bitonic sequences
half = (1 << TILE_LOG) // 2
seq, ref = [], []
for t in range(NT):
    a = np.sort(rng.integers(0, 2**30, half, dtype=np.int32))
    b = np.sort(rng.integers(0, 2**30, half, dtype=np.int32))[::-1]
    s = np.concatenate([a, b])
    seq.append(s)
    ref.append(np.sort(s))
xb = jnp.asarray(np.concatenate(seq)).reshape(rows, 128)
refv = np.concatenate(ref)

x = jnp.asarray(rng.integers(0, 2**30, rows * 128, dtype=np.int32)).reshape(
    rows, 128
)


def sustained(kern):
    @jax.jit
    def run_loop(v):
        def body(_, acc):
            r = run(kern, v + (acc & 0).astype(jnp.int32))
            return acc + r[0, 0].astype(jnp.int64)

        with jax.enable_x64(False):
            return jax.lax.fori_loop(0, REPS, body, jnp.int64(0))

    t0 = time.perf_counter()
    int(run_loop(x))
    warm = time.perf_counter() - t0
    best = min(
        (lambda t: (int(run_loop(x)), time.perf_counter() - t)[1])(
            time.perf_counter()
        )
        for _ in range(3)
    )
    return best / REPS, warm


for name, kern in [("rm_roll", rm_kernel), ("xor_perm", xor_kernel)]:
    with jax.enable_x64(False):
        got = np.asarray(jax.jit(lambda v, k=kern: run(k, v))(xb)).reshape(-1)
    ok = np.array_equal(got, refv)
    t, w = sustained(kern)
    print(f"{name:9s}: {t*1e3:6.2f} ms  correct={ok}  (warm {w:.0f}s)",
          flush=True)
