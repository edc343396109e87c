"""How can select_arms + update_arms on [2, 9] arrays cost ~4-8 ms per
segment inside the device-dynamic scan? Time the bandit math alone in a
fori_loop (slope method, two loop lengths), then with a take(arms)
threshold consumer.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
       python -u scripts/probe_bandit_cost.py
"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

print(jax.devices(), flush=True)

from ccve_tpu.control import device_bandit as db

L, A = 2, 9
arms_vals = jnp.asarray([0, 64, 128, 256, 512, 768, 1024, 1536, 2048],
                        jnp.int32)


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


def loop_time(label, body, init, n_lo=128, n_hi=1024):
    @partial(jax.jit, static_argnums=1)
    def run(x, ni):
        return jax.lax.fori_loop(0, ni, body, x)

    t_lo = timed(run, init, n_lo)
    t_hi = timed(run, init, n_hi)
    per = (t_hi - t_lo) / (n_hi - n_lo)
    print(f"{label}: {per * 1e6:.1f} us/iter", flush=True)


bs0 = db.init_state(L, A)


def body_bandit(i, carry):
    bs, acc = carry
    arm, bs = db.select_arms(bs)
    thr = jnp.take(arms_vals, arm)
    reward = 0.5 + 0.001 * (acc % 7).astype(jnp.float32)
    bs = db.update_arms(bs, arm, reward)
    return bs, acc + thr.astype(jnp.float32).sum()


loop_time("bandit select+take+update", body_bandit,
          (bs0, jnp.float32(0)))


def body_sel(i, carry):
    bs, acc = carry
    arm, bs = db.select_arms(bs)
    return bs, acc + arm.astype(jnp.float32).sum()


loop_time("select_arms only", body_sel, (bs0, jnp.float32(0)))


def body_upd(i, carry):
    bs, acc = carry
    arm = (jnp.arange(L, dtype=jnp.int32) + (acc % 3).astype(jnp.int32)) % A
    bs = db.update_arms(bs, arm, acc % 1.0)
    return bs, acc + bs.est.sum()


loop_time("update_arms only", body_upd, (bs0, jnp.float32(0)))
