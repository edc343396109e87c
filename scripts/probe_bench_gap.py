"""Why does bench.py's loop measure 25.5 ms/batch when the raw
pack+sort+fused chain measures 6.5 ms? Bisect in one process:
  v1 raw chain (pack -> _sort_padded_buf -> merge_counts_fused -> sum)
  v2 sorted_match_totals (adds the payload-dot checksum)
  v3 bulk_count([table], probe2d)  (adds transpose + wrappers)
  v4 bench body verbatim (probe + bias first)

RESOLVED 2026-08-19 (on chip): v1 6.57 / v2 6.46 / v3 6.56 /
v4 28.23 ms. v1-v3 use `bias = tot & 0` — XLA constant-folds x&0=0,
the carried probe array becomes loop-invariant, and the WHOLE chain is
hoisted out of the fori_loop: those variants time ONE batch (+ the
~27 ms relay sync) / NI = 52/8 = 6.5 ms. v4's bias depends on the
accumulator (`acc < 0`), which XLA cannot fold, so every iteration
really runs: 28.2 ms at NI=8 vs bench.py's 25.5 at NI=32 is exactly
the relay-floor amortization difference. bench.py is honest; there is
no gap. Rule added to PERF_NOTES: a loop-carried bias must be derived
from a value XLA cannot prove constant (acc-compare, never `& 0`).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
       python -u scripts/probe_bench_gap.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

NI = 8


def main():
    print(jax.devices(), flush=True)
    from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table
    from ccve_tpu.exec.bulk import bulk_count
    from ccve_tpu.kernels import bigsort as bs
    from ccve_tpu.kernels.merge_scan import merge_counts_fused
    from ccve_tpu.ops.sort_merge import build_sorted, sorted_match_totals

    nb, npr = 1_000_000, 16_000_000
    keys_b, pays_b = gen_rhs_table(nb, 1)
    tb = build_sorted(keys_b, pays_b)
    probe_h = gen_probe_table(npr, 1, nb)
    expected = int((probe_h[:, 0] < nb).sum())
    p1d = jax.device_put(jnp.asarray(probe_h[:, 0].astype(np.int32)))
    p2d = jax.device_put(jnp.asarray(probe_h.astype(np.int32)))

    kmin0, kb0 = tb.pack32
    key_lo = kmin0 - 1
    span = 1 << kb0
    b32 = (((tb.keys - key_lo) << 1) | 1).astype(jnp.int32)
    tile17 = 1 << bs.TILE_LOG
    n_pad = npr + (-npr) % tile17

    def timeit(name, run, arg, expect=None):
        out = int(run(arg))
        if expect is not None:
            assert out == expect, (name, out, expect)
        t0 = time.perf_counter()
        int(run(arg))
        per = (time.perf_counter() - t0) / NI
        print(f"{name}: {per * 1e3:.2f} ms/batch", flush=True)

    @jax.jit
    def v1(p):
        def body(_, carry):
            acc, pp = carry
            pkc = jnp.clip(pp, jnp.int32(key_lo),
                           jnp.int32(key_lo + span - 1))
            p32 = (pkc - jnp.int32(key_lo)) << 1
            p32 = jnp.pad(p32, (0, n_pad - npr),
                          constant_values=np.int32(2**31 - 1))
            abuf = bs._sort_padded_buf(p32, bs.TILE_LOG, bs.CHUNK_LOG)
            bc = merge_counts_fused(abuf, n_pad, npr, b32, nb)
            tot = jnp.sum(bc, dtype=jnp.int64)
            bias = (tot & 0).astype(jnp.int32)
            return acc + tot, pp + bias

        return jax.lax.fori_loop(0, NI, body, (jnp.int64(0), p))[0]

    timeit("v1 raw chain", v1, p1d, NI * expected)

    @jax.jit
    def v2(p):
        def body(_, carry):
            acc, pp = carry
            c, chk = sorted_match_totals(tb, pp)
            bias = (c & 0).astype(jnp.int32)
            return acc + c, pp + bias

        return jax.lax.fori_loop(0, NI, body, (jnp.int64(0), p))[0]

    timeit("v2 sorted_match_totals", v2, p1d, NI * expected)

    @jax.jit
    def v3(p):
        def body(_, carry):
            acc, pp = carry
            r = bulk_count([tb], pp)
            bias = (r.count & 0).astype(jnp.int32)
            return acc + r.count, pp + bias

        return jax.lax.fori_loop(0, NI, body, (jnp.int64(0), p))[0]

    timeit("v3 bulk_count 2d", v3, p2d, NI * expected)

    @jax.jit
    def v4(p):
        def body(_, acc):
            bias = jnp.where(acc < 0, jnp.int32(1), jnp.int32(0))
            r = bulk_count([tb], p + bias)
            return acc + r.count

        return jax.lax.fori_loop(0, NI, body, jnp.int64(0))

    timeit("v4 bench body verbatim", v4, p2d, NI * expected)


if __name__ == "__main__":
    main()
