"""Radix-sort crossover measurement (VERDICT round-1 item 8).

Times ops/sort.radix_sort_pairs against the two production sorts —
jax.lax.sort (via xla_sort_pairs) and the hybrid Pallas pairsort — at
several sizes and key widths, to either find a regime where radix wins
(narrow-digit bounded domains at >=16M, fewer passes) or record the
measured numbers behind its demotion to parity/fallback status.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python -u scripts/probe_radix.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

NIT = 4


def sust(label, fn, *args, nit=NIT):
    out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))
    t0 = time.perf_counter()
    for _ in range(nit):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))
    dt = (time.perf_counter() - t0) / nit
    print(f"{label}: {dt * 1e3:.2f} ms", flush=True)
    return dt


def main():
    print(jax.devices(), flush=True)
    from ccve_tpu.ops.sort import radix_sort_pairs, xla_sort_pairs

    rng = np.random.default_rng(7)
    for n in (1 << 20, 1 << 22, 1 << 24):
        for bits in (16, 32, 64):
            hi = (1 << min(bits, 62)) - 1
            keys = jnp.asarray(
                rng.integers(0, hi, size=n, dtype=np.int64))
            vals = jnp.asarray(np.arange(n, dtype=np.int32))
            jax.block_until_ready((keys, vals))

            radix = jax.jit(
                lambda k, v, b=bits: radix_sort_pairs(k, v, bits=b))
            xla = jax.jit(xla_sort_pairs)

            try:
                tr = sust(f"radix  n=2^{n.bit_length()-1} bits={bits}",
                          radix, keys, vals)
            except Exception as e:  # noqa: BLE001
                print(f"radix n={n} bits={bits} FAILED: {e}", flush=True)
                tr = float("inf")
            tx = sust(f"xla    n=2^{n.bit_length()-1} bits={bits}",
                      xla, keys, vals)
            print(f"  -> radix/xla = {tr / tx:.2f}x", flush=True)

    # i32-domain comparison vs the engine's own hybrid Pallas sort
    from ccve_tpu.kernels import bigsort as bs
    n = 1 << 24
    keys32 = jnp.asarray(
        rng.integers(0, 1 << 30, size=n, dtype=np.int32))
    hybrid = jax.jit(bs.pallas_sort_i32)
    sust("hybrid pallas sort_i32 n=2^24 (keys only)", hybrid, keys32)


if __name__ == "__main__":
    main()
