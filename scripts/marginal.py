"""Slope-based device timing: the axon relay costs ~28 ms per readback
and ~0.3 ms per dispatch, so absolute small-op timings lie. Chain the op
N times device-side with a real data dependency and fit the slope
between two chain lengths — fixed costs cancel.

marginal(make_chain) where make_chain(n_iter) -> jitted f(*args).
"""

import time
import numpy as np
import jax
import jax.numpy as jnp

I1, I2, REPS = 16, 512, 4


def _run(f, args, reps=REPS):
    r = jax.block_until_ready(f(*args))
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1]))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1]))
    return (time.perf_counter() - t0) / reps


def marginal(make_chain, *args):
    """Per-iteration device time of the chained op."""
    t1 = _run(make_chain(I1), args)
    t2 = _run(make_chain(I2), args)
    return (t2 - t1) / (I2 - I1)


def chain_idx(op, n):
    """Chain an (vals, idx)->out op: next idx = (idx + out) % n."""

    def make(iters):
        @jax.jit
        def f(vals, idx):
            def body(i, c):
                out = op(vals, c)
                return ((c + out.astype(c.dtype)) % n).astype(c.dtype)

            return jax.lax.fori_loop(0, iters, body, idx)

        return f

    return make


if __name__ == "__main__":
    from ccve_tpu.ops import mxu_move as mm

    rng = np.random.default_rng(0)
    k = 2048
    for n in (2048, 131072, 524288, 2097152):
        vals = jnp.asarray(rng.integers(0, 1 << 40, n))
        idx = jnp.asarray(rng.integers(0, n, k))
        t_x = marginal(chain_idx(lambda v, i: jnp.take(v, i, mode="clip"), n), vals, idx)
        t_m = marginal(chain_idx(mm.gather, n), vals, idx)
        print(f"gather k=2048 n={n:8d}: xla {t_x*1e6:7.1f} us   mxu {t_m*1e6:7.1f} us")

    # scatter: dst.at[:, pos].set(vals) — chain via pos rotation
    W = 12
    dst = jnp.asarray(rng.integers(0, 1 << 40, (W, k)))
    vals = jnp.asarray(rng.integers(0, 1 << 40, (W, k)))
    pos0 = jnp.asarray(rng.permutation(k))

    def sc_chain(op):
        def make(iters):
            @jax.jit
            def f(dst, pos):
                def body(i, c):
                    d, p = c
                    d2 = op(d, p, vals)
                    return d2, (p + 1) % k

                return jax.lax.fori_loop(0, iters, body, (dst, pos))[0]

            return f

        return make

    t_x = marginal(sc_chain(lambda d, p, v: d.at[:, p].set(v, mode="drop")), dst, pos0)
    t_m = marginal(sc_chain(mm.scatter_cols), dst, pos0)
    print(f"scatter [12,2048]:        xla {t_x*1e6:7.1f} us   mxu {t_m*1e6:7.1f} us")
