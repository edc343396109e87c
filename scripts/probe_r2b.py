"""Round-2 chip probe batch (serial, one process):
  A. headline phase breakdown: pack / sort / splits / fused kernel
  B. chunk_rank per-step cost after the in-kernel sorts
  C. pallas_compact v2 vs XLA compaction at several sizes
  D. config 6 with the on-device tuner
  E. bulk micro-bench variants at the reference's 134M-key stream
  F. sorted_expand at 1M (the 4M compile stalls; find the boundary)

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python -u scripts/probe_r2b.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

NIT = 16


def sust(label, fn, *args, nit=NIT):
    """Sustained: chain nit dependent executions in one dispatch."""
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
    from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table
    from ccve_tpu.kernels import bigsort as bs
    from ccve_tpu.kernels.merge_scan import (
        _merge_splits_fused,
        merge_counts_fused,
    )
    from ccve_tpu.ops.sort_merge import build_sorted

    # --- A: headline breakdown ----------------------------------------
    n_build, n_probe = 1_000_000, 16_000_000
    keys, payloads = gen_rhs_table(n_build, 1)
    table = build_sorted(keys, payloads)
    probe = gen_probe_table(n_probe, 1, n_build)
    p_i32 = jax.device_put(jnp.asarray(probe[:, 0].astype(np.int32)))

    kmin, key_bits = table.pack32
    key_lo = kmin - 1
    span = 1 << key_bits
    b32 = (((table.keys - key_lo) << 1) | 1).astype(jnp.int32)
    tile = 1 << bs.TILE_LOG
    n_pad = n_probe + (-n_probe) % tile

    @jax.jit
    def pack(p):
        pkc = jnp.clip(p, jnp.int32(key_lo), jnp.int32(key_lo + span - 1))
        p32 = (pkc - jnp.int32(key_lo)) << 1
        return jnp.pad(p32, (0, n_pad - n_probe),
                       constant_values=np.int32(2**31 - 1))

    p32p = pack(p_i32)
    sust("A.pack 16M", pack, p_i32)

    sortf = jax.jit(
        lambda x: bs._sort_padded_buf(x, bs.TILE_LOG, bs.CHUNK_LOG)
    )
    abuf = sortf(p32p)
    sust("A.sort 16.9M", sortf, p32p)

    n_tiles = -(-(n_pad + n_build) // (256 * 128))
    splitf = jax.jit(
        lambda ab, b: _merge_splits_fused(
            ab.reshape(-1), n_pad, b, n_build, n_tiles + 1, 15
        )
    )
    splitf(abuf, b32)
    sust("A.splits bisection", splitf, abuf, b32)

    fusedf = jax.jit(
        lambda ab, b: merge_counts_fused(ab, n_pad, n_probe, b, n_build)
    )
    fusedf(abuf, b32)
    sust("A.fused merge+counts (incl splits)", fusedf, abuf, b32)

    # --- B: chunk_rank per-step ----------------------------------------
    from ccve_tpu.kernels.chunk_probe import chunk_rank, stage_table_planes

    rng = np.random.default_rng(0)
    block = 2048
    for m, dom in [(2048, 4000), (50_000, 100_000), (200_000, 400_000)]:
        tk = np.sort(rng.integers(0, dom, m).astype(np.int64))
        kk = rng.integers(0, dom, block).astype(np.int64)
        kmin2 = int(tk.min())
        hi = int(tk.max()) - kmin2 + 2
        pk = jnp.asarray(
            ((np.clip(kk - kmin2 + 1, 0, hi) << 1) | 1).astype(np.int32)
        )
        tpk = stage_table_planes(((tk - kmin2 + 1) << 1).astype(np.int32),
                                 block)
        mult, start = jax.block_until_ready(chunk_rank(tpk, m, pk))
        e_start = np.searchsorted(tk, kk, "left")
        e_mult = np.searchsorted(tk, kk, "right") - e_start
        assert np.array_equal(np.asarray(mult), e_mult), f"m={m} WRONG"

        NI = 64

        @jax.jit
        def loop(pk0):
            def body(_, carry):
                acc, p = carry
                mu, st = chunk_rank(tpk, m, p)
                bias = (mu[0] & 0) * 2
                return acc + jnp.sum(mu, dtype=jnp.int64), p + bias

            return jax.lax.fori_loop(0, NI, body, (jnp.int64(0), pk0))[0]

        int(loop(pk))
        t0 = time.perf_counter()
        int(loop(pk))
        print(f"B.chunk_rank m={m}: "
              f"{(time.perf_counter() - t0) / NI * 1e6:.1f} us/step",
              flush=True)

    # --- C: pallas_compact v2 vs XLA ------------------------------------
    from ccve_tpu.kernels.compact import pallas_compact
    from ccve_tpu.core.chunk import compress_indices
    from ccve_tpu.ops import mxu_move as mv

    for C, n in [(3, 2048), (3, 16384), (3, 262144), (3, 4_194_304)]:
        cols = jnp.asarray(
            rng.integers(0, 2**62, (C, n)).astype(np.int64)
        )
        mask = jnp.asarray(rng.random(n) < 0.4)

        pc = jax.jit(lambda c, mk: pallas_compact(c, mk)[0][0][0])
        exp = np.asarray(cols)[:, np.asarray(mask)]

        def xla_compact(c, mk):
            sel, cnt = compress_indices(mk)
            return jnp.take(c, sel, axis=1)[0][0]

        xc = jax.jit(xla_compact)
        got, _ = pallas_compact(cols, mask)
        assert np.array_equal(np.asarray(got)[:, : exp.shape[1]], exp)
        ta = sust(f"C.pallas_compact C=3 n={n}", pc, cols, mask)
        tb = sust(f"C.xla_compact    C=3 n={n}", xc, cols, mask)
        print(f"C.n={n}: pallas {n / ta / 1e6:.1f}M rows/s, "
              f"xla {n / tb / 1e6:.1f}M rows/s", flush=True)

    # --- D: config 6 with device tuner ----------------------------------
    from ccve_tpu.bench.configs import config6_mixed_selectivity
    from ccve_tpu.config import (
        CompactionStrategy,
        EngineConfig,
        PayloadMode,
    )
    from ccve_tpu.exec.pipeline import JoinPipeline
    from ccve_tpu.ops import filter as flt
    from ccve_tpu.ops.hash_table import build_csr

    lhs, rhs, blk, mod = 2_000_000, 50_000, 2048, 10
    rng6 = np.random.default_rng(7)
    probe6 = np.empty((lhs, 2), np.int64)
    phase = (np.arange(lhs) // (128 * blk)) % 2
    n_a = int((phase == 0).sum())
    probe6[:, 0] = rng6.integers(0, rhs, lhs)
    probe6[phase == 0, 0] = rng6.integers(0, rhs // mod, n_a) * mod
    probe6[:, 1] = rng6.integers(0, rhs, lhs)
    k6, p6 = gen_rhs_table(rhs, 1)
    t6 = [build_csr(k6, p6) for _ in range(2)]
    cfg = EngineConfig(
        block_size=blk, n_joins=2, lhs_size=lhs, rhs_size=rhs,
        strategy=CompactionStrategy.DYNAMIC,
        payload_mode=PayloadMode.REFERENCE, device_tuner=True,
        tuner_segment_chunks=16,
    )
    pipe = JoinPipeline(t6, cfg, prefilter=flt.mod_eq(mod, 0))
    pipe.run(probe6)
    r = pipe.run(probe6)
    print(f"D.config6 DYNAMIC device-tuner: {r['seconds']:.3f}s "
          f"count={r['count']} greedy={r['greedy_thresholds']}",
          flush=True)
    print(f"D.bandit n_sel=\n{r['bandit_n_sel']}", flush=True)

    # --- E: bulk micro-bench at the reference's 134M keys ---------------
    from ccve_tpu.bench.micro import run_bulk_variant
    from ccve_tpu.core.datagen import gen_microbench_keys
    from ccve_tpu.ops.hash_table import build_lp

    n_keys = 1 << 27  # 134,217,728 (simd_micro_bench.cpp:78)
    mk_keys = gen_microbench_keys(n_keys, 128, 1)
    bk_, bp_ = gen_rhs_table(128, 1)
    st_small = build_sorted(bk_, bp_)
    keys_dev = jax.device_put(jnp.asarray(mk_keys))
    jax.block_until_ready(keys_dev)
    r = run_bulk_variant(st_small, keys_dev, "bulk_sorted_134M")
    print(f"E.bulk sorted 134M: {r.ns_per_key:.3f} ns/key "
          f"#tuples {r.tuples}", flush=True)
    lp_small = build_lp(bk_, bp_)
    r2 = run_bulk_variant(lp_small, keys_dev, "bulk_lp_134M")
    print(f"E.bulk lp 134M: {r2.ns_per_key:.3f} ns/key "
          f"#tuples {r2.tuples}", flush=True)
    assert r.tuples == r2.tuples

    # --- F: sorted_expand at 1M (compile-stall boundary) ----------------
    from ccve_tpu.ops.sort_merge import sorted_expand

    pe = jax.device_put(jnp.asarray(probe[:1_000_000, 0].astype(np.int32)))
    t0 = time.perf_counter()
    olde = jax.jit(lambda p: sorted_expand(table, p, 1_000_000,
                                           use_kernel=False))
    r0 = olde(pe)
    np.asarray(jax.device_get(jnp.ravel(r0[3])[:1]))
    print(f"F.expand OLD 1M compiled+ran in {time.perf_counter()-t0:.0f}s",
          flush=True)
    sust("F.expand OLD 1M", olde, pe, nit=4)
    t0 = time.perf_counter()
    newe = jax.jit(lambda p: sorted_expand(table, p, 1_000_000,
                                           use_kernel=True))
    r1 = newe(pe)
    np.asarray(jax.device_get(jnp.ravel(r1[3])[:1]))
    print(f"F.expand NEW 1M compiled+ran in {time.perf_counter()-t0:.0f}s",
          flush=True)
    assert int(r0[3]) == int(r1[3])
    sust("F.expand NEW 1M", newe, pe, nit=4)


if __name__ == "__main__":
    main()
