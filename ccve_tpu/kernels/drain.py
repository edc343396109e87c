"""Fused per-segment drain kernel for the sorted-chunk executor.

One `pallas_call` processes a WHOLE SEGMENT of chunks through the full
static level recursion of `exec/sorted_pipeline.SortedPipeline._run_tree`
— drain over match ranks, compaction (NaiveCompactor semantics,
/root/reference/compactor.cpp:5-41, generalized with the threshold axis
of setting.h:17-29), descend, final-level count collapse — with the
per-level compactor caches held as VMEM scratch carried ACROSS the
sequential grid steps (one grid step per chunk). This replaces the
XLA-op drain glue (~40 us of small-op latency per chunk per level,
PERF_NOTES round-3 gaps #1) with ~a microsecond of in-register VPU work
per chunk.

Scope (the count-only static/dynamic fast path):
 - batched rank mode: the kernel consumes per-level MULT PLANES
   (int32[S, L, block]) extracted from the precomputed rank columns; in
   count-only runs the start halves of the ranks are never read.
 - capacity == 0 (counting collector) and record_occupancy == False —
   the same conditions as the final-level count collapse, which the
   kernel applies at level L-1.
 - thresholds are a TRACED [L] i32 vector (scalar-prefetch), so one
   compiled kernel serves NONE/FULL/BINARY/per-level statics AND the
   device-tuner's per-segment arms; threshold 0 degenerates to
   pass-through inside the branch-free select exactly like the
   trace-time skip it replaces.
 - work counters (level entries + compact executions, the device
   tuner's reward denominator) accumulate in SMEM and are returned, so
   DYNAMIC runs ride the same kernel as the statics they are judged
   against.

The emitted multiset is unchanged from the XLA drain (same compactor
algebra, same drain-rank replay of the reference's emission structure,
main.cpp:119-191); only op granularity moves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ccve_tpu.kernels import flatvec as fv


def _plane_rows(block: int) -> int:
    # [R, 128] i32 planes; min sublane tile 8
    return max(block // 128, 8)


@functools.partial(
    jax.jit,
    static_argnames=("block", "fanouts", "interpret", "record_occupancy",
                     "branchy"),
)
def drain_segment(
    mults: jax.Array,  # int32[S, L, RF] (RF = plane_rows(block)*128)
    counts: jax.Array,  # int32[S]
    thresholds: jax.Array,  # int32[L]
    cache_m: jax.Array,  # int32[CL, L, RF]  (CL = max(L-1, 1))
    cache_cnt: jax.Array,  # int32[CC]  (CC = L if record_occupancy else CL)
    *,
    block: int,
    fanouts: tuple[int, ...],
    interpret: bool = False,
    record_occupancy: bool = False,
    branchy: bool = True,
):
    """Run one segment through the fused drain. Returns
    (total int32[1,1], cache_m_out, cache_cnt_out int32[CC,1],
    work int32[L,1], rows int32[L,1][, occ int32[L,RF],
    occ_full int32[L,1]]).

    `record_occupancy` (round-5: eliminates the Zebra fallback to the
    XLA drain) keeps per-level occupancy histograms in VMEM scratch:
    every post-compaction emitted chunk adds a one-hot at its live-row
    count — `occ[l, c]` for c < block, `occ_full[l]` for c == block —
    matching the XLA drain's `occupancy.at[level, emitted.count].add(1)`
    exactly. In this mode the FINAL level runs the real compactor count
    algebra (its cache is count-only: no planes, one extra ccnt slot)
    instead of the count collapse, because the collapse has no per-chunk
    emissions to histogram; totals are invariant either way (stream +
    flush)."""
    S, L, RF = mults.shape
    R = RF // 128
    NR = (RF - 1).bit_length()  # shift rounds for flat scans over RF
    CL = cache_m.shape[0]
    CC = cache_cnt.shape[0]
    assert len(fanouts) == L and cache_m.shape[1] == L
    assert CC == (L if record_occupancy else CL)

    def kernel(*refs):
        if record_occupancy:
            (
                counts_ref, thr_ref, mults_ref, cache_in, ccnt_in,
                tot_out, cache_out, ccnt_out, work_out, rows_out,
                occ_out, occf_out,
                cache_s, ccnt_s, res_s, work_s, rows_s, occ_s, occf_s,
            ) = refs
        else:
            (
                counts_ref, thr_ref, mults_ref, cache_in, ccnt_in,
                tot_out, cache_out, ccnt_out, work_out, rows_out,
                cache_s, ccnt_s, res_s, work_s, rows_s,
            ) = refs
            occ_out = occf_out = occ_s = occf_s = None
        i = pl.program_id(0)
        S_ = pl.num_programs(0)

        @pl.when(i == 0)
        def _init():
            cache_s[...] = cache_in[...]
            for cl in range(CC):
                ccnt_s[cl] = ccnt_in[cl, 0]
            res_s[0] = 0
            for l in range(L):
                work_s[l] = 0
                rows_s[l] = 0
            if record_occupancy:
                occ_s[...] = jnp.zeros((L, R, 128), jnp.int32)
                for l in range(L):
                    occf_s[l] = 0

        cnt = counts_ref[i]
        work_s[0] = work_s[0] + 1
        rows_s[0] = rows_s[0] + cnt
        flat = fv.flat_index(R)

        def record_occ(l: int, c, live):
            # one-hot at the emitted chunk's live-row count: plane slot
            # for c < block, the SMEM overflow row for c == block —
            # mirrors occupancy.at[level, emitted.count].add(1). `live`
            # mirrors the XLA drain's branchy descend: a subtree under
            # an empty emission records nothing (exec/pipeline.py
            # branchy_descend), though its branch-free compute still
            # runs here.
            if not record_occupancy:
                return
            occ_s[l] = occ_s[l] + (
                (flat == c) & (c < block) & live
            ).astype(jnp.int32)
            occf_s[l] = occf_s[l] + jnp.where(
                live & (c == block), 1, 0
            ).astype(jnp.int32)

        def gen(l: int, planes: dict, c, live):
            """Unrolled level recursion: drain ranks, compact, descend."""
            if l == L - 1 and record_occupancy:
                # final level, Zebra mode: real compactor COUNT algebra
                # (count-only cache: no planes, one ccnt slot) + per-
                # chunk histogram + counting collect — no collapse.
                thr = thr_ref[l]
                for t in range(fanouts[l]):
                    keep = (
                        jnp.where(flat < c, planes[l], 0) > t
                    ).astype(jnp.int32)
                    ecnt = jnp.max(fv.prefix_sum_i32(keep, R, NR))
                    ccnt = ccnt_s[l]
                    pt = (ecnt >= thr) | (ecnt >= block)
                    new_count = ccnt + ecnt
                    emits_cache = new_count >= block
                    absorb_emit = jnp.where(
                        emits_cache, jnp.minimum(new_count, block), 0
                    )
                    ec2 = jnp.where(pt, ecnt, absorb_emit)
                    ccnt_s[l] = jnp.where(
                        pt,
                        ccnt,
                        jnp.where(
                            emits_cache,
                            jnp.maximum(new_count - block, 0),
                            new_count,
                        ),
                    )
                    work_s[l] = work_s[l] + jnp.where(pt, 0, 1)
                    record_occ(l, ec2, live)
                    res_s[0] = res_s[0] + ec2
                return
            if l == L - 1:
                # final-level count collapse: sum_t |{mult > t}| == sum.
                # Explicit lax.reduce: jnp.sum promotes its accumulator
                # to i64 under ambient x64 (Mosaic has no 64-bit types)
                m = jnp.where(flat < c, planes[l], 0)
                # max-of-scan: m >= 0 so the inclusive prefix sum is
                # monotone and its max IS the total (jnp.sum promotes
                # to i64 under ambient x64; lax.reduce has no Mosaic
                # lowering — PERF_NOTES gotchas)
                res_s[0] = res_s[0] + jnp.max(
                    fv.prefix_sum_i32(m, R, NR)
                )
                return
            thr = thr_ref[l]
            for t in range(fanouts[l]):
                keep = (jnp.where(flat < c, planes[l], 0) > t).astype(
                    jnp.int32
                )
                rank = fv.prefix_sum_i32(keep, R, NR)
                ecnt = jnp.max(rank)
                down = [planes[l2] for l2 in range(l + 1, L)]
                comp = fv.butterfly_compact(down, keep, R, NR, rank=rank)
                eplanes = dict(zip(range(l + 1, L), comp))

                # --- NaiveCompactor algebra (branch-free selects) -----
                ccnt = ccnt_s[l]
                pt = (ecnt >= thr) | (ecnt >= block)
                new_count = ccnt + ecnt
                emits_cache = new_count >= block
                absorb_emit = jnp.where(
                    emits_cache, jnp.minimum(new_count, block), 0
                )
                ecnt2 = jnp.where(pt, ecnt, absorb_emit)
                emit = {}
                for l2, ep in eplanes.items():
                    cp = cache_s[l, l2]
                    filled = jnp.where(
                        flat < ccnt,
                        cp,
                        fv.shift_flat_right_dyn(ep, ccnt, R),
                    )
                    over = fv.shift_flat_left_dyn(ep, block - ccnt, R)
                    emit[l2] = jnp.where(
                        pt, ep, jnp.where(emits_cache, filled, 0)
                    )
                    cache_s[l, l2] = jnp.where(
                        pt,
                        cp,
                        jnp.where(emits_cache, over, filled),
                    )
                ccnt_s[l] = jnp.where(
                    pt,
                    ccnt,
                    jnp.where(
                        emits_cache,
                        jnp.maximum(new_count - block, 0),
                        new_count,
                    ),
                )
                # work accounting (device-tuner reward denominator):
                # one compact execution + one nonempty descend
                work_s[l] = work_s[l] + jnp.where(pt, 0, 1)
                work_s[l + 1] = work_s[l + 1] + (ecnt2 > 0).astype(
                    jnp.int32
                )
                rows_s[l + 1] = rows_s[l + 1] + ecnt2
                record_occ(l, ecnt2, live)
                gen(
                    l + 1, emit, ecnt2,
                    live & (ecnt2 > 0) if branchy else live,
                )

        planes0 = {l: mults_ref[0, l] for l in range(L)}
        gen(0, planes0, cnt, jnp.bool_(True))

        @pl.when(i == S_ - 1)
        def _fin():
            tot_out[0, 0] = res_s[0]
            cache_out[...] = cache_s[...]
            for cl in range(CC):
                ccnt_out[cl, 0] = ccnt_s[cl]
            for l in range(L):
                work_out[l, 0] = work_s[l]
                rows_out[l, 0] = rows_s[l]
            if record_occupancy:
                occ_out[...] = occ_s[...]
                for l in range(L):
                    occf_out[l, 0] = occf_s[l]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S,),
        in_specs=[
            pl.BlockSpec(
                (1, L, R, 128),
                lambda i, *_: (i, 0, 0, 0),  # *_: prefetch refs
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        )
        + (
            (
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            )
            if record_occupancy
            else ()
        ),
        scratch_shapes=[
            pltpu.VMEM((CL, L, R, 128), jnp.int32),
            pltpu.SMEM((CC,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((L,), jnp.int32),
            pltpu.SMEM((L,), jnp.int32),
        ]
        + (
            [
                pltpu.VMEM((L, R, 128), jnp.int32),
                pltpu.SMEM((L,), jnp.int32),
            ]
            if record_occupancy
            else []
        ),
    )

    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
                jax.ShapeDtypeStruct((CL, L, R, 128), jnp.int32),
                jax.ShapeDtypeStruct((CC, 1), jnp.int32),
                jax.ShapeDtypeStruct((L, 1), jnp.int32),
                jax.ShapeDtypeStruct((L, 1), jnp.int32),
            )
            + (
                (
                    jax.ShapeDtypeStruct((L, R, 128), jnp.int32),
                    jax.ShapeDtypeStruct((L, 1), jnp.int32),
                )
                if record_occupancy
                else ()
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(
            counts.astype(jnp.int32),
            thresholds.astype(jnp.int32),
            mults.reshape(S, L, R, 128),
            cache_m.reshape(CL, L, R, 128),
            cache_cnt.reshape(CC, 1).astype(jnp.int32),
        )
