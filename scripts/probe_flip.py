"""On-chip probe: does Mosaic lower lane/sublane reversals, and what do
they cost relative to one compare-exchange stage at headline scale?

Motivation (PERF_NOTES.md roadmap 1): the merge-path kernel odd-even-
merges 2R rows and discards the upper half (18 stages over 2R). A
bitonic lower-half extraction is min(A[i], B[n-1-i]) + 17 stages over R
— ~45% cheaper IF flip(B) is cheap. This measures that IF.
"""

import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 1024
NT = 136  # headline level size: 136 tiles of [1024, 128]


def timed(f, *a):
    r = f(*a)
    np.asarray(jax.device_get(r.reshape(-1)[:1]))  # relay sync
    t0 = time.perf_counter()
    for _ in range(10):
        r = f(*a)
    np.asarray(jax.device_get(r.reshape(-1)[:1]))
    return (time.perf_counter() - t0) / 10


def make(body, reps):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        for _ in range(reps):
            x = body(x)
        o_ref[:] = x

    spec = pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kernel,
        grid=(NT,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((NT * R, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )
    return jax.jit(lambda x: f(x))


def ce_body(x):
    from ccve_tpu.kernels.bigsort import _ce_stage
    from ccve_tpu.kernels import flatvec as fv

    return _ce_stage(x, fv.flat_index(R), 10, 7, R)


bodies = {
    "lane_rev": lambda x: x[:, ::-1],
    "sub_rev": lambda x: x[::-1, :],
    "full_rev": lambda x: x[::-1, ::-1],
    "flipfn": lambda x: jnp.flip(x),
    "ce_stage": ce_body,
}

x = jnp.asarray(
    np.random.default_rng(0).integers(0, 1 << 30, (NT * R, 128), np.int32)
)

with jax.enable_x64(False):
    base = None
    for name, body in bodies.items():
        try:
            f0, f8 = make(body, 0), make(body, 8)
            t0, t8 = timed(f0, x), timed(f8, x)
            per = (t8 - t0) / 8 * 1e3
            print(f"{name:10s}: marginal {per:7.3f} ms/stage  "
                  f"(0-rep {t0*1e3:6.2f} ms, 8-rep {t8*1e3:6.2f} ms)")
        except Exception as e:
            print(f"{name:10s}: FAILED — {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:150]}")
