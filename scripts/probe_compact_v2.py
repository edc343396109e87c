"""Compaction-kernel v2 throughput: Pallas ring kernel vs XLA scatter.

VERDICT round-1 item 4 asked for the masked-prefix-sum-scatter Pallas
compaction kernel to be production-grade and measured against the XLA
scatter path. v2 (kernels/compact.py, ring flush) is wired into
sorted_expand; this probe records its rate vs the two alternatives at
sizes from executor blocks to bulk scale:

 - xla_scatter: cumsum rank + .at[pos].set (the former production path)
 - xla_sortcompact: single stable sort by !mask (what sorted_expand used
   before the kernel)
 - pallas_v2: kernels.compact.pallas_compact_i32 (3 planes, the
   sorted_expand shape)

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python -u scripts/probe_compact_v2.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

NIT = 8


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
    print(f"  {label}: {dt * 1e3:.3f} ms", flush=True)
    return dt


def xla_scatter(cols, mask):
    n = cols.shape[1]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    tgt = jnp.where(mask, pos, n)
    out = jnp.zeros_like(cols)
    out = out.at[:, tgt].set(cols, mode="drop", unique_indices=True)
    return out, jnp.sum(mask.astype(jnp.int32))


def xla_sortcompact(cols, mask):
    key = (~mask).astype(jnp.int32)
    ops = jax.lax.sort([key] + [cols[i] for i in range(cols.shape[0])],
                       num_keys=1, is_stable=True)
    return jnp.stack(ops[1:]), jnp.sum(mask.astype(jnp.int32))


def main():
    print(jax.devices(), flush=True)
    from ccve_tpu.kernels.compact import pallas_compact_i32

    rng = np.random.default_rng(3)
    for logn in (11, 14, 17, 20, 24):
        n = 1 << logn
        cols = jnp.asarray(
            rng.integers(0, 1 << 30, size=(3, n), dtype=np.int32))
        mask = jnp.asarray(rng.random(n) < 0.5)
        jax.block_until_ready((cols, mask))
        print(f"n=2^{logn} ({n}) 3 planes, 50% survivors", flush=True)

        pv2 = jax.jit(pallas_compact_i32)
        # correctness cross-check once per size
        got, cnt = pv2(cols, mask)
        ref = np.asarray(cols)[:, np.asarray(mask)]
        assert int(cnt) == ref.shape[1], (int(cnt), ref.shape[1])
        np.testing.assert_array_equal(np.asarray(got)[:, : ref.shape[1]], ref)

        tp = sust("pallas_v2     ", pv2, cols, mask)
        ts = sust("xla_scatter   ", jax.jit(xla_scatter), cols, mask)
        tc = sust("xla_sortcompact", jax.jit(xla_sortcompact), cols, mask)
        best = min(ts, tc)
        print(f"  -> pallas {n / tp / 1e6:.1f} M rows/s, "
              f"best-XLA {n / best / 1e6:.1f} M rows/s, "
              f"ratio pallas/bestXLA = {tp / best:.2f}x", flush=True)


if __name__ == "__main__":
    main()
