"""Slope-method cost of tiny loop bodies. A single host readback
through the axon relay costs ~26 ms — at NI=256 that floor alone reads
as "100 us/iter", which fooled probe_step_cost.py's first numbers.
Timing at two loop lengths and taking the slope removes every fixed
cost (dispatch, relay sync) exactly.

Findings on chip (2026-08-19):
  e.elementwise         0.6 us/iter
  s.tiny lax.sort 2048  36.2 us/iter
  p1.one tiny pallas    4.3 us/iter
  p2.two tiny pallas    8.6 us/iter   (=> ~4.3 us per Mosaic call)
  pg.pallas grid=64     6.6 us/iter
So: Pallas launch is ~4 us, NOT 205 us; the sorted executor's step
budget is dominated by real work + the tiny lax.sorts (36 us each),
not launches. See probe_step_cost.py for the per-stage slopes.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
       python -u scripts/probe_launch_floor.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_LO, N_HI = 256, 2048


def timed(run, init, ni):
    out = run(init, ni)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[:1]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(init, ni)
        np.asarray(
            jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[:1])
        )
        best = min(best, time.perf_counter() - t0)
    return best


def loop_time(label, body, init):
    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def run(x, ni):
        return jax.lax.fori_loop(0, ni, body, x)

    t_lo = timed(run, init, N_LO)
    t_hi = timed(run, init, N_HI)
    per = (t_hi - t_lo) / (N_HI - N_LO)
    print(f"{label}: {per * 1e6:.1f} us/iter "
          f"(floor reading {t_lo / N_LO * 1e6:.1f})", flush=True)
    return per


def tiny_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1


def tiny(x):
    with jax.enable_x64(False):
        return pl.pallas_call(
            tiny_kernel,
            out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)


def tiny_grid(x, g):
    with jax.enable_x64(False):
        return pl.pallas_call(
            tiny_kernel,
            grid=(g,),
            out_shape=jax.ShapeDtypeStruct((16 * g, 128), jnp.int32),
            in_specs=[
                pl.BlockSpec((16, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((16, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(x)


def main():
    print(jax.devices(), flush=True)
    x0 = jnp.zeros((16, 128), jnp.int32)

    loop_time("e.elementwise x+1", lambda _, x: x + 1, x0)

    k0 = jnp.arange(2048, dtype=jnp.int32)[::-1].copy()

    def body_s(_, k):
        s = jax.lax.sort([k], num_keys=1)[0]
        return s + jnp.where(s[0] < 0, jnp.int32(1), jnp.int32(0))

    loop_time("s.tiny lax.sort 2048", body_s, k0)

    loop_time("p1.one tiny pallas", lambda _, x: tiny(x), x0)
    loop_time("p2.two tiny pallas", lambda _, x: tiny(tiny(x)), x0)

    xg = jnp.zeros((16 * 64, 128), jnp.int32)
    loop_time("pg.pallas grid=64", lambda _, x: tiny_grid(x, 64), xg)


if __name__ == "__main__":
    main()
