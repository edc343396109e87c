"""Probe: variants of the i64 probe-key -> packed i32 (key'<<1) cast.
Current clip-in-i64 form costs 3.8 ms sustained at 16M (probe_pipeline)."""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import ccve_tpu  # noqa: F401

N = 16_000_000
key_lo = -1
key_span = 1 << 21
rng = np.random.default_rng(0)
pk_host = rng.integers(0, 1_000_001, N, dtype=np.int64)
pk = jax.device_put(jnp.asarray(pk_host))
REPS = 8


def v_current(k):
    return (jnp.clip(k - key_lo, 0, key_span - 1) << 1).astype(jnp.int32)


def v_cast_first(k):
    k32 = k.astype(jnp.int32)
    lo32 = jnp.int32(key_lo)
    in_lo = k >= jnp.int64(key_lo)
    in_hi = k < jnp.int64(key_lo + key_span)
    p = jnp.clip(k32 - lo32, 0, key_span - 1)
    p = jnp.where(in_lo, p, 0)
    p = jnp.where(in_hi, p, key_span - 1)
    return (p << 1).astype(jnp.int32)


def v_limbs(k):
    v = jax.lax.bitcast_convert_type(k, jnp.int32)  # [n, 2] (lo, hi) LE
    lo, hi = v[:, 0], v[:, 1]
    klo_lo = jnp.asarray(np.array(key_lo, np.int64).astype(np.int32))
    klo_hi = jnp.asarray(np.array(key_lo >> 32, np.int64).astype(np.int32))
    bias = jnp.int32(-(1 << 31))
    d_lo = lo - klo_lo
    borrow = ((lo ^ bias) < (klo_lo ^ bias)).astype(jnp.int32)
    d_hi = hi - klo_hi - borrow
    neg = d_hi < 0
    over = (d_hi > 0) | ((d_hi == 0) & ((d_lo ^ bias) >= (key_span ^ bias)))
    p = jnp.where(neg, 0, jnp.where(over, key_span - 1, d_lo))
    return (p << 1).astype(jnp.int32)


def sustained(f):
    @jax.jit
    def run_loop(v):
        def body(_, acc):
            bias = jnp.where(acc < 0, jnp.int64(1), jnp.int64(0))
            r = f(v + bias)
            return acc + r[0].astype(jnp.int64)

        return jax.lax.fori_loop(0, REPS, body, jnp.int64(0))

    int(run_loop(pk))
    best = min(
        (lambda t: (int(run_loop(pk)), time.perf_counter() - t)[1])(
            time.perf_counter()
        )
        for _ in range(3)
    )
    return best / REPS


ref = np.asarray(v_current(pk))
for name, f in [("current", v_current), ("cast_first", v_cast_first),
                ("limbs", v_limbs)]:
    got = np.asarray(jax.jit(f)(pk))
    ok = np.array_equal(got, ref)
    t = sustained(f)
    print(f"{name:10s}: {t*1e3:6.2f} ms  correct={ok}", flush=True)
