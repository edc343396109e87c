"""Dissect the sorted executor's per-step cost (~420 us/step measured,
flat in table size — neither the XLA 2048-sorts nor the merge were it).

  a. minimal pallas kernel (copy, grid=1) in a fori loop      -> launch
  b. chunk_rank kernel alone in a fori loop (m=50k)           -> + merge
  c. chunk_rank + the executor's drain glue (compress+compact
     + gather_rows) per iteration                             -> + glue
  d. full SortedPipeline._run_tree one level                  -> total

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
       python -u scripts/probe_step_cost.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NI = 128


def loop_time(label, body, init):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, NI, body, x)

    out = run(init)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[:1]))
    t0 = time.perf_counter()
    out = run(init)
    np.asarray(jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[:1]))
    per = (time.perf_counter() - t0) / NI
    print(f"{label}: {per * 1e6:.1f} us/iter", flush=True)
    return per


def main():
    print(jax.devices(), flush=True)

    # --- 0: headline marginal cost of the carried-fused stage ----------
    from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table
    from ccve_tpu.kernels import bigsort as bs
    from ccve_tpu.kernels.merge_scan import merge_counts_fused
    from ccve_tpu.ops.sort_merge import build_sorted

    nb, npr = 1_000_000, 16_000_000
    keys_b, pays_b = gen_rhs_table(nb, 1)
    tb = build_sorted(keys_b, pays_b)
    probe_h = gen_probe_table(npr, 1, nb)
    p_dev = jax.device_put(jnp.asarray(probe_h[:, 0].astype(np.int32)))
    kmin0, kb0 = tb.pack32
    key_lo = kmin0 - 1
    span = 1 << kb0
    b32 = (((tb.keys - key_lo) << 1) | 1).astype(jnp.int32)
    tile17 = 1 << bs.TILE_LOG
    n_pad = npr + (-npr) % tile17

    def chain(with_fused):
        @jax.jit
        def run(p):
            def body(_, carry):
                acc, pp = carry
                pkc = jnp.clip(pp, jnp.int32(key_lo),
                               jnp.int32(key_lo + span - 1))
                p32 = (pkc - jnp.int32(key_lo)) << 1
                p32 = jnp.pad(p32, (0, n_pad - npr),
                              constant_values=np.int32(2**31 - 1))
                abuf = bs._sort_padded_buf(p32, bs.TILE_LOG, bs.CHUNK_LOG)
                if with_fused:
                    bc = merge_counts_fused(abuf, n_pad, npr, b32, nb)
                    tot = jnp.sum(bc, dtype=jnp.int64)
                else:
                    tot = jnp.sum(
                        abuf[0].astype(jnp.int64), dtype=jnp.int64
                    )
                # anti-CSE bias MUST be acc-dependent: `tot & 0` is
                # constant-folded and the chain hoists out of the loop
                # (see probe_bench_gap.py RESOLVED note)
                bias = jnp.where(acc < 0, jnp.int32(1), jnp.int32(0))
                return acc + tot, pp + bias

            return jax.lax.fori_loop(0, 8, body, (jnp.int64(0), p))[0]

        int(run(p_dev))
        t0 = time.perf_counter()
        int(run(p_dev))
        return (time.perf_counter() - t0) / 8

    t_sort = chain(False)
    print(f"0.pack+sort only: {t_sort * 1e3:.2f} ms", flush=True)
    t_full = chain(True)
    print(f"0.pack+sort+fused: {t_full * 1e3:.2f} ms "
          f"(fused marginal {(t_full - t_sort) * 1e3:.2f} ms)", flush=True)

    from ccve_tpu.kernels.chunk_probe import (
        I32_MAX,
        chunk_rank,
        stage_table_planes,
    )

    rng = np.random.default_rng(0)
    block, m, dom = 2048, 50_000, 100_000
    tk = np.sort(rng.integers(0, dom, m).astype(np.int64))
    kk = rng.integers(0, dom, block).astype(np.int64)
    kmin = int(tk.min())
    hi = int(tk.max()) - kmin + 2
    pk0 = jnp.asarray(
        ((np.clip(kk - kmin + 1, 0, hi) << 1) | 1).astype(np.int32)
    )
    tpk = stage_table_planes(((tk - kmin + 1) << 1).astype(np.int32), block)

    # --- a: minimal kernel --------------------------------------------
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

    loop_time(
        "a.tiny pallas kernel", lambda _, x: tiny(x),
        jnp.zeros((16, 128), jnp.int32),
    )

    # --- a2: tiny kernel with a big VMEM-resident input ---------------
    def tiny2_kernel(t_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:] + t_ref[0, 0]

    def tiny2(x):
        with jax.enable_x64(False):
            return pl.pallas_call(
                tiny2_kernel,
                out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(tpk, x)

    loop_time(
        "a2.tiny kernel + whole-table VMEM input",
        lambda _, x: tiny2(x),
        jnp.zeros((16, 128), jnp.int32),
    )

    # --- b: chunk_rank alone ------------------------------------------
    def body_b(_, carry):
        acc, p = carry
        mu, st = chunk_rank(tpk, m, p)
        bias = jnp.where(acc < 0, jnp.int32(2), jnp.int32(0))
        return acc + jnp.sum(mu, dtype=jnp.int64), p + bias

    loop_time("b.chunk_rank m=50k", body_b, (jnp.int64(0), pk0))

    # --- c: + executor drain glue --------------------------------------
    from ccve_tpu.core.chunk import Chunk, compress_indices, gather_rows
    from ccve_tpu.ops import compactor as comp

    W = 3
    cols0 = jnp.zeros((W, block), jnp.int64)
    cache0 = comp.CompactorState(
        cache_cols=jnp.zeros((W, block), jnp.int64),
        cache_count=jnp.asarray(0, jnp.int32),
    )

    def body_c(_, carry):
        acc, p, cache = carry
        mu, st = chunk_rank(tpk, m, p)
        sel, cnt = compress_indices(mu > 0)
        chunk = Chunk(cols0, sel, cnt)
        emitted, cache = comp.compact(cache, chunk, jnp.int32(2048))
        dense = gather_rows(emitted)
        bias = jnp.where(
            acc + (dense[0, 0] & 1) < -1, jnp.int32(2), jnp.int32(0)
        )
        return acc + emitted.count.astype(jnp.int64), p + bias, cache

    loop_time("c.chunk_rank + drain glue", body_c,
              (jnp.int64(0), pk0, cache0))

    # --- d: full _run_tree one level ------------------------------------
    from ccve_tpu.config import CompactionStrategy, EngineConfig, PayloadMode
    from ccve_tpu.exec.sorted_pipeline import SortedPipeline
    from ccve_tpu.ops.sort_merge import build_sorted

    table = build_sorted(tk)
    cfg = EngineConfig(
        block_size=block, n_joins=1, lhs_size=block, rhs_size=m,
        strategy=CompactionStrategy.FULL,
        payload_mode=PayloadMode.REFERENCE,
    )
    pipe = SortedPipeline([table], cfg)
    pstate0 = pipe.fresh_state()
    cols_in = jnp.zeros((pipe.width, block), jnp.int64).at[0].set(
        jnp.asarray(kk)
    )
    thr = jnp.full((1,), 2048, jnp.int32)

    def body_d(_, carry):
        acc, ps = carry
        ps = pipe._run_tree(0, cols_in, jnp.int32(block), ps, thr)
        return acc + ps.result_count, ps

    loop_time("d.full level step", body_d, (jnp.int64(0), pstate0))


if __name__ == "__main__":
    main()
