"""Probe: column-major bitonic-merge stages vs row-major.

rm halver stage at stride k<128 needs a 3-op flat shift; in a
column-major view (flat index = lane*R + row) every halver stage of a
2^17 bitonic sequence is a SINGLE roll (sublane for k<10, lane for
k>=10) because halver pairs never cross the relevant boundary. Cost:
one [8,128,128]-transpose in, one out. Measure both kernel forms."""
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
R = 1 << (TILE_LOG - 7)  # 1024
NT = 128
rows = NT * R
REPS = 8

rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 2**30, rows * 128, dtype=np.int32)).reshape(
    rows, 128
)


def rm_kernel(x_ref, o_ref):
    v = x_ref[:]
    flat = fv.flat_index(R)
    for k_log in range(TILE_LOG - 1, -1, -1):
        v = bs._bitonic_stage(v, flat, k_log, R)
    o_ref[:] = v


def cm_kernel(x_ref, o_ref):
    v = x_ref[:]
    # the input sequence is bitonic in RM flat order; re-lay it so the
    # cm view (flat = lane*R + row) reads the same sequence:
    # w[128b+l, a] = v[8a+b, l]
    v = jnp.transpose(v.reshape(128, 8, 128), (1, 2, 0)).reshape(R, 128)
    # cm view: element (r, l) is logical index l*R + r. Halver stage at
    # stride 2^s: s < 10 -> sublane roll only (pairs within a column);
    # s >= 10 -> lane roll only (stride 2^(s-10) lanes, same row).
    rr = fv.iota2(R, 0)
    ll = fv.iota2(R, 1)
    for k_log in range(TILE_LOG - 1, -1, -1):
        k = 1 << k_log
        if k_log < 10:
            up = pltpu.roll(v, R - (1 << k_log), axis=0)
            dn = pltpu.roll(v, 1 << k_log, axis=0)
            is_lo = (rr & k) == 0
        else:
            kl = 1 << (k_log - 10)
            up = pltpu.roll(v, 128 - kl, axis=1)
            dn = pltpu.roll(v, kl, axis=1)
            is_lo = (ll & kl) == 0
        v = jnp.where(is_lo, jnp.minimum(v, up), jnp.maximum(v, dn))
    # cm-sorted -> rm-sorted: out[8a+b, l] = v[128b+l, a]
    o_ref[:] = jnp.transpose(v.reshape(8, 128, 128), (2, 0, 1)).reshape(
        R, 128
    )


def run(kern, y):
    spec = pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(NT,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
        compiler_params=bs._VMEM_BIG,
    )(y)


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


# correctness of the cm form: both kernels sort a BITONIC sequence; feed
# one (up-down per tile) and compare against np.sort per tile
halfR = rows * 128 // NT // 2
seq = []
for t in range(NT):
    a = np.sort(rng.integers(0, 2**30, halfR, dtype=np.int32))
    b = np.sort(rng.integers(0, 2**30, halfR, dtype=np.int32))[::-1]
    seq.append(np.concatenate([a, b]))
bit = np.concatenate(seq)
ref = np.concatenate([np.sort(s) for s in seq])
xb = jnp.asarray(bit).reshape(rows, 128)
with jax.enable_x64(False):
    got_rm = np.asarray(jax.jit(lambda v: run(rm_kernel, v))(xb)).reshape(-1)
    got_cm = np.asarray(jax.jit(lambda v: run(cm_kernel, v))(xb)).reshape(-1)
print("rm correct:", np.array_equal(got_rm, ref), flush=True)
print("cm correct:", np.array_equal(got_cm, ref), flush=True)

t, w = sustained(rm_kernel)
print(f"rm 17-stage: {t*1e3:.2f} ms (warm {w:.0f}s)", flush=True)
t, w = sustained(cm_kernel)
print(f"cm 17-stage + transpose: {t*1e3:.2f} ms (warm {w:.0f}s)", flush=True)
