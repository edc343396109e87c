"""Multi-plane hybrid sort — i32 keys + N i32 value planes through the
same Batcher / bitonic merge-path machinery as kernels/bigsort.py.

bigsort.py sorts ONE i32 plane (the count-side join needs nothing
else). The materializing / per-probe-stats paths (ops/sort_merge.py:
`sorted_match_stats`, `sorted_expand`) must carry cargo through the
sort — payloads, row ids, 64-bit partial sums as (hi, lo) limb pairs —
which today rides multi-operand int64 `jax.lax.sort`s. Here every
compare-exchange computes its swap predicate from the KEY plane and
applies the same select to each value plane:

    take_up = is_lo & (up_key < key)          # strict: ties never swap
    take_dn = is_hi & (dn_key > key)
    plane'  = where(take_up, plane<<s, where(take_dn, plane>>s, plane))

so a P-value sort costs ~(4+3P)/4 the vector ops of the key-only sort
per stage, with identical stage counts and identical merge-path
structure (the bisections run on keys only; `_merge_splits_alt` /
`_merge_splits_two` are reused from bigsort verbatim).

Sort is NOT stable: equal keys may reorder, but each value tuple stays
attached to its key. Keys must lie strictly inside (INT32_MIN,
INT32_MAX) — both serve as sentinels. Value planes are opaque i32
cargo (any bit pattern, sign included).

The reference's counterpart is again the AVX-512 gather machinery
(chaining_ht.cpp:126-136 GatherResult): per-key random access the TPU
lacks — carrying payloads through the sort IS the TPU's payload
gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ccve_tpu.kernels import flatvec as fv
from ccve_tpu.kernels.bigsort import (
    I32_MAX,
    TILE_LOG,
    _VMEM_BIG,
    _merge_splits_alt,
    _merge_splits_two,
)


def _exchange_multi(k, vs, idx, s: int, take_of, R: int):
    """Shared compare-exchange core: `take_of(is_lo_candidates)` masks are
    produced by the caller from `idx`; partner pairs move as a unit."""
    up_k = fv.shift_flat_left(k, s, R)
    dn_k = fv.shift_flat_right(k, s, R, 0)
    is_lo, is_hi = take_of
    take_up = is_lo & (up_k < k)
    take_dn = is_hi & (dn_k > k)
    new_k = jnp.where(take_up, up_k, jnp.where(take_dn, dn_k, k))
    new_vs = [
        jnp.where(
            take_up,
            fv.shift_flat_left(v, s, R),
            jnp.where(take_dn, fv.shift_flat_right(v, s, R, 0), v),
        )
        for v in vs
    ]
    return new_k, new_vs


def _ce_stage_multi(k, vs, idx, p_log: int, k_log: int, R: int):
    """Batcher stage (p, k) — the mask algebra of bigsort._ce_stage with
    predicate-driven pair movement instead of min/max."""
    s = 1 << k_log
    m2p = idx & ((1 << (p_log + 1)) - 1)
    if k_log == p_log:
        is_lo = m2p < s
        is_hi = ~is_lo
    else:
        bitk = (idx & s) != 0
        is_lo = bitk & (m2p < (1 << (p_log + 1)) - s)
        is_hi = (~bitk) & (m2p >= s)
    return _exchange_multi(k, vs, idx, s, (is_lo, is_hi), R)


def _bitonic_stage_multi(k, vs, idx, k_log: int, R: int):
    """Bitonic halver stage at stride 2^k_log (bigsort._bitonic_stage)."""
    s = 1 << k_log
    is_lo = (idx & s) == 0
    return _exchange_multi(k, vs, idx, s, (is_lo, ~is_lo), R)


# ---------------------------------------------------------------------------
# Phase 1+2: in-VMEM from-scratch Batcher per tile
# ---------------------------------------------------------------------------


def _make_local_kernel_multi(tile_log: int, n_vals: int, alt: bool):
    """Full Batcher sort of each 2^tile_log tile, key + value planes.
    `alt`: odd tiles complemented (keys only) on entry/exit so they land
    stored DESCENDING for the bitonic merge levels (bigsort's scheme)."""
    R = 1 << (tile_log - 7)

    def kernel(*refs):
        k_ref = refs[0]
        v_refs = refs[1 : 1 + n_vals]
        o_k = refs[1 + n_vals]
        o_vs = refs[2 + n_vals : 2 + 2 * n_vals]
        k = k_ref[:]
        m = -(pl.program_id(0) & 1)
        if alt:
            k = k ^ m
        vs = [r[:] for r in v_refs]
        idx = fv.flat_index(R)
        for p_log in range(0, tile_log):
            for k_log in range(p_log, -1, -1):
                k, vs = _ce_stage_multi(k, vs, idx, p_log, k_log, R)
        if alt:
            k = k ^ m
        o_k[:] = k
        for o, v in zip(o_vs, vs):
            o[:] = v

    return kernel


# ---------------------------------------------------------------------------
# Phase 3: bitonic lower-half merge-path kernel, multi-plane
# ---------------------------------------------------------------------------


def _make_merge_kernel_multi(
    tile_log: int, rows: int, n_vals: int, n_real: int | None = None
):
    """bigsort._make_bitonic_merge_kernel with value planes: windows of
    every plane are DMA'd with the key windows' offsets (identical
    layout), the element-aligned min-pairing becomes a predicate select,
    and the halver stages move pairs. Scratch layout: [wak, wbk,
    wav_0..wav_{P-1}, wbv_0..wbv_{P-1}, 2(P+1) DMA semaphores]."""
    R = 1 << (tile_log - 7)
    Rw = R + 8

    def kernel(a_off_r, a_rem_r, b_off_r, b_front_r, out_m_r, *refs):
        n_io = 1 + n_vals
        hbms = refs[:n_io]  # keys + value planes
        outs = refs[n_io : 2 * n_io]
        scratch = refs[2 * n_io :]
        wak, wbk = scratch[0], scratch[1]
        wavs = scratch[2 : 2 + n_vals]
        wbvs = scratch[2 + n_vals : 2 + 2 * n_vals]
        semas = scratch[2 + 2 * n_vals :]
        t = pl.program_id(0)

        @pl.when(t < n_real if n_real is not None else t >= 0)
        def _merge():
            a_off, b_off = a_off_r[t], b_off_r[t]
            a_rem, b_front, m = a_rem_r[t], b_front_r[t], out_m_r[t]
            ra = jnp.minimum(jax.lax.shift_right_logical(a_off, 7), rows)
            rb = jnp.minimum(jax.lax.shift_right_logical(b_off, 7), rows)
            copies = []
            for i, (src, dst) in enumerate(
                list(zip(hbms, [wak] + list(wavs)))
                + list(zip(hbms, [wbk] + list(wbvs)))
            ):
                r = ra if i < n_io else rb
                c = pltpu.make_async_copy(src.at[pl.ds(r, Rw)], dst, semas[i])
                c.start()
                copies.append(c)
            for c in copies:
                c.wait()

            sa = a_off & 127
            sb = b_off & 127
            ak = fv.shift_flat_left_dyn(wak[...], sa, Rw, I32_MAX)[0:R]
            bk = fv.shift_flat_left_dyn(wbk[...], sb, Rw, I32_MAX)[0:R]
            avs = [fv.shift_flat_left_dyn(w[...], sa, Rw, 0)[0:R] for w in wavs]
            bvs = [fv.shift_flat_left_dyn(w[...], sb, Rw, 0)[0:R] for w in wbvs]
            flat = fv.flat_index(R)
            ak = jnp.where(flat >= a_rem, I32_MAX, ak)
            bk = jnp.where(flat < b_front, I32_MAX, bk)

            take_b = bk < ak  # strict: A wins ties, like jnp.minimum
            k = jnp.where(take_b, bk, ak) ^ m
            vs = [jnp.where(take_b, bv, av) for av, bv in zip(avs, bvs)]
            for k_log in range(tile_log - 1, -1, -1):
                k, vs = _bitonic_stage_multi(k, vs, flat, k_log, R)
            outs[0][...] = k ^ m
            for o, v in zip(outs[1:], vs):
                o[...] = v

        if n_real is not None:

            @pl.when(t >= n_real)
            def _slack():
                outs[0][...] = jnp.full((R, 128), I32_MAX, jnp.int32)
                for o in outs[1:]:
                    o[...] = jnp.zeros((R, 128), jnp.int32)

    return kernel


# ---------------------------------------------------------------------------
# Drivers
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("tile_log",))
def _sort_padded_multi(k, vs: tuple, tile_log: int):
    """Sort (i32 keys, value planes)[n_pad], n_pad a tile multiple,
    keys +INF-padded. Mirrors bigsort._sort_padded."""
    tile = 1 << tile_log
    n_pad = k.shape[0]
    nt = n_pad // tile
    rows = n_pad // 128
    R = tile // 128
    P = len(vs)

    n_levels = max(nt - 1, 0).bit_length()
    alt = n_levels > 0

    yk = k.reshape(rows, 128)
    yvs = [v.reshape(rows, 128) for v in vs]
    with jax.enable_x64(False):
        spec = pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
        shape = jax.ShapeDtypeStruct((rows, 128), jnp.int32)
        outs = pl.pallas_call(
            _make_local_kernel_multi(tile_log, P, alt),
            grid=(nt,),
            in_specs=[spec] * (1 + P),
            out_specs=[spec] * (1 + P),
            out_shape=[shape] * (1 + P),
            compiler_params=_VMEM_BIG,
        )(yk, *yvs)
        yk, yvs = outs[0], list(outs[1:])

    Rw = R + 8
    if n_levels:
        yk = jnp.concatenate(
            [yk, jnp.full((2 * R, 128), I32_MAX, jnp.int32)], axis=0
        )
        yvs = [
            jnp.concatenate([v, jnp.zeros((2 * R, 128), jnp.int32)], axis=0)
            for v in yvs
        ]
    merge_kernel = _make_merge_kernel_multi(
        tile_log, rows + R - 8, P, n_real=nt
    )
    pad2 = jnp.zeros(2, jnp.int32)
    for lvl in range(n_levels):
        run_log = tile_log + lvl
        splits = _merge_splits_alt(
            yk.reshape(-1), run_log, nt, tile_log, n_pad
        )
        with jax.enable_x64(False):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(nt + 2,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * (1 + P),
                out_specs=[
                    pl.BlockSpec(
                        (R, 128), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
                    )
                ]
                * (1 + P),
                scratch_shapes=(
                    [pltpu.VMEM((Rw, 128), jnp.int32)] * (2 * (1 + P))
                    + [pltpu.SemaphoreType.DMA] * (2 * (1 + P))
                ),
            )
            outs = pl.pallas_call(
                merge_kernel,
                grid_spec=grid_spec,
                out_shape=[
                    jax.ShapeDtypeStruct((rows + 2 * R, 128), jnp.int32)
                ]
                * (1 + P),
                compiler_params=_VMEM_BIG,
            )(*(jnp.concatenate([s, pad2]) for s in splits), yk, *yvs)
            yk, yvs = outs[0], list(outs[1:])

    return yk.reshape(-1)[:n_pad], tuple(v.reshape(-1)[:n_pad] for v in yvs)


@functools.partial(jax.jit, static_argnames=("tile_log",))
def _merge_two_padded_multi(ak, avs: tuple, bk, bvs: tuple, tile_log: int):
    """One bitonic merge-path level over pre-sorted (A, B) pair streams;
    B flipped into descending storage (bigsort._merge_two_padded)."""
    tile = 1 << tile_log
    R = tile // 128
    Rw = R + 8
    P = len(avs)
    nA, nB = ak.shape[0], bk.shape[0]
    n = nA + nB
    n_pad = n + ((-n) % tile)
    nt = n_pad // tile
    rows = n_pad // 128
    slack = Rw * 128

    def assemble(a, b, fill):
        f = jnp.full(slack, fill, jnp.int32)
        return jnp.concatenate(
            [f, a, b[::-1], jnp.full(n_pad - n, fill, jnp.int32), f]
        ).reshape(rows + 2 * Rw, 128)

    ypad_k = assemble(ak, bk, I32_MAX)
    ypad_vs = [assemble(a, b, 0) for a, b in zip(avs, bvs)]
    a_off, a_rem, b_off, b_front, out_m = _merge_splits_two(
        ypad_k.reshape(-1), nA, nB, nt, tile_log, n_pad, base=slack
    )
    splits = (a_off + slack, a_rem, b_off + slack, b_front, out_m)
    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(nt,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * (1 + P),
            out_specs=[
                pl.BlockSpec(
                    (R, 128), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
                )
            ]
            * (1 + P),
            scratch_shapes=(
                [pltpu.VMEM((Rw, 128), jnp.int32)] * (2 * (1 + P))
                + [pltpu.SemaphoreType.DMA] * (2 * (1 + P))
            ),
        )
        outs = pl.pallas_call(
            _make_merge_kernel_multi(tile_log, rows + Rw, P),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.int32)]
            * (1 + P),
            compiler_params=_VMEM_BIG,
        )(*splits, ypad_k, *ypad_vs)
    return outs[0].reshape(-1), tuple(o.reshape(-1) for o in outs[1:])


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("tile_log", "n_levels_cap")
)
def _sort_padded_multi_capped(k, vs: tuple, tile_log: int,
                              n_levels_cap: int):
    """`_sort_padded_multi` with an early-stopped merge ladder (the i32
    twin of `_sort_padded_multi64_capped`): the final executed level
    writes every run ASCENDING (force_asc) so downstream run scanners
    walk forward; cap 0 leaves ascending local tiles."""
    tile = 1 << tile_log
    n_pad = k.shape[0]
    nt = n_pad // tile
    rows = n_pad // 128
    R = tile // 128
    P = len(vs)

    n_levels_full = max(nt - 1, 0).bit_length()
    n_levels = min(n_levels_full, n_levels_cap)

    yk = k.reshape(rows, 128)
    yvs = [v.reshape(rows, 128) for v in vs]
    with jax.enable_x64(False):
        spec = pl.BlockSpec((R, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        shape = jax.ShapeDtypeStruct((rows, 128), jnp.int32)
        outs = pl.pallas_call(
            _make_local_kernel_multi(tile_log, P, n_levels > 0),
            grid=(nt,),
            in_specs=[spec] * (1 + P),
            out_specs=[spec] * (1 + P),
            out_shape=[shape] * (1 + P),
            compiler_params=_VMEM_BIG,
        )(yk, *yvs)
        yk, yvs = outs[0], list(outs[1:])

    Rw = R + 8
    if n_levels:
        yk = jnp.concatenate(
            [yk, jnp.full((2 * R, 128), I32_MAX, jnp.int32)], axis=0
        )
        yvs = [
            jnp.concatenate([v, jnp.zeros((2 * R, 128), jnp.int32)],
                            axis=0)
            for v in yvs
        ]
    merge_kernel = _make_merge_kernel_multi(
        tile_log, rows + R - 8, P, n_real=nt
    )
    pad2 = jnp.zeros(2, jnp.int32)
    for lvl in range(n_levels):
        run_log = tile_log + lvl
        splits = _merge_splits_alt(
            yk.reshape(-1), run_log, nt, tile_log, n_pad,
            force_asc=lvl == n_levels - 1,
        )
        with jax.enable_x64(False):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(nt + 2,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * (1 + P),
                out_specs=[
                    pl.BlockSpec(
                        (R, 128), lambda t, *_: (t, 0),
                        memory_space=pltpu.VMEM,
                    )
                ]
                * (1 + P),
                scratch_shapes=(
                    [pltpu.VMEM((Rw, 128), jnp.int32)] * (2 * (1 + P))
                    + [pltpu.SemaphoreType.DMA] * (2 * (1 + P))
                ),
            )
            outs = pl.pallas_call(
                merge_kernel,
                grid_spec=grid_spec,
                out_shape=[
                    jax.ShapeDtypeStruct((rows + 2 * R, 128), jnp.int32)
                ]
                * (1 + P),
                compiler_params=_VMEM_BIG,
            )(*(jnp.concatenate([s, pad2]) for s in splits), yk, *yvs)
            yk, yvs = outs[0], list(outs[1:])

    return (
        yk.reshape(-1)[:n_pad],
        tuple(v.reshape(-1)[:n_pad] for v in yvs),
    )


def pallas_sort_multi_i32_runs(keys, vals, tile_log: int = TILE_LOG,
                               n_levels_cap: int | None = None):
    """`pallas_sort_multi_i32` with an early-stopped ladder: returns
    (keys, value_planes, run_log) where runs of 2^run_log are each
    ascending-sorted (counts are additive over runs — the same trade as
    `pallas_sort_i64_limbs`). Input is +INF-padded to a tile multiple;
    outputs keep the padding (length = padded size)."""
    vals = tuple(vals)
    n = keys.shape[0]
    tile = 1 << tile_log
    pad = (-n) % tile
    if pad:
        keys = jnp.concatenate([keys, jnp.full(pad, I32_MAX, jnp.int32)])
        vals = tuple(
            jnp.concatenate([v, jnp.zeros(pad, jnp.int32)]) for v in vals
        )
    n_pad = keys.shape[0]
    nt = n_pad // tile
    n_levels = max(nt - 1, 0).bit_length()
    cap = n_levels if n_levels_cap is None else min(n_levels, n_levels_cap)
    k, vs = _sort_padded_multi_capped(keys, vals, tile_log, cap)
    return k, vs, tile_log + cap


def pallas_sort_multi_i32(keys, vals, tile_log: int = TILE_LOG):
    """Ascending sort of i32 keys carrying i32 value planes. Returns
    (sorted_keys, tuple_of_sorted_value_planes). Unstable among equal
    keys; key/value tuples stay attached. Keys strictly inside
    (INT32_MIN, INT32_MAX)."""
    vals = tuple(vals)
    n = keys.shape[0]
    tile = 1 << tile_log
    if n <= tile:
        out = jax.lax.sort([keys, *vals], num_keys=1)
        return out[0], tuple(out[1:])
    pad = (-n) % tile
    if pad:
        keys = jnp.concatenate([keys, jnp.full(pad, I32_MAX, jnp.int32)])
        vals = tuple(
            jnp.concatenate([v, jnp.zeros(pad, jnp.int32)]) for v in vals
        )
    k, vs = _sort_padded_multi(keys, vals, tile_log)
    return k[:n], tuple(v[:n] for v in vs)


def merge_sorted_multi_i32(ak, avs, bk, bvs, tile_log: int = TILE_LOG):
    """Merge two ASCENDING-sorted pair streams (ties: A's elements
    first). Returns (keys, value_planes) of length |A|+|B|."""
    avs, bvs = tuple(avs), tuple(bvs)
    n = ak.shape[0] + bk.shape[0]
    if n <= (1 << tile_log) or ak.shape[0] == 0 or bk.shape[0] == 0:
        out = jax.lax.sort(
            [
                jnp.concatenate([ak, bk]),
                *(
                    jnp.concatenate([a, b])
                    for a, b in zip(avs, bvs)
                ),
            ],
            num_keys=1,
        )
        return out[0], tuple(out[1:])
    k, vs = _merge_two_padded_multi(ak, avs, bk, bvs, tile_log)
    return k[:n], tuple(v[:n] for v in vs)


# ---------------------------------------------------------------------------
# 64-bit keys as (hi, lo) i32 limb planes — the wide-key-domain sort
# ---------------------------------------------------------------------------
#
# The reference runs ANY int64 key at full speed (the key type IS
# int64, /root/reference/base.h:54-56); the i32 machinery above gates
# on key spans <= 2^30 (ops/sort_merge pack32). These variants carry
# the key as TWO i32 planes compared with the u32-limb algebra of
# kernels/flatvec (signed hi, unsigned lo), so >2^30-span keys keep
# kernel speed instead of falling back to multi-operand int64
# lax.sort. Stage cost ~2x the i32 key (two limbs shifted + a 3-op
# compare); structure (Batcher tiles, bitonic merge-path levels,
# alternating-orientation storage via bitwise NOT — which reverses
# int64 order limb-wise exactly as it does i32) is identical. The
# merge-path bisections run OUTSIDE the kernels on reconstructed int64
# keys (bigsort._merge_splits_* are sentinel-generic over the key
# dtype). Keys must lie strictly inside (INT64_MIN, INT64_MAX).

_LO_MAX = np.int32(-1)  # u32 all-ones: lo limb of INT64_MAX


def _lt64_strict(ahi, alo, bhi, blo):
    return fv.lt64(ahi, alo, bhi, blo)


def _exchange_multi64(kh, kl, vs, s: int, take_of, R: int):
    up_h = fv.shift_flat_left(kh, s, R)
    up_l = fv.shift_flat_left(kl, s, R)
    dn_h = fv.shift_flat_right(kh, s, R, 0)
    dn_l = fv.shift_flat_right(kl, s, R, 0)
    is_lo, is_hi = take_of
    take_up = is_lo & _lt64_strict(up_h, up_l, kh, kl)
    take_dn = is_hi & _lt64_strict(kh, kl, dn_h, dn_l)

    def move(x, up, dn):
        return jnp.where(take_up, up, jnp.where(take_dn, dn, x))

    new_kh = move(kh, up_h, dn_h)
    new_kl = move(kl, up_l, dn_l)
    new_vs = [
        move(v, fv.shift_flat_left(v, s, R), fv.shift_flat_right(v, s, R, 0))
        for v in vs
    ]
    return new_kh, new_kl, new_vs


def _ce_stage_multi64(kh, kl, vs, idx, p_log: int, k_log: int, R: int):
    s = 1 << k_log
    m2p = idx & ((1 << (p_log + 1)) - 1)
    if k_log == p_log:
        is_lo = m2p < s
        is_hi = ~is_lo
    else:
        bitk = (idx & s) != 0
        is_lo = bitk & (m2p < (1 << (p_log + 1)) - s)
        is_hi = (~bitk) & (m2p >= s)
    return _exchange_multi64(kh, kl, vs, s, (is_lo, is_hi), R)


def _bitonic_stage_multi64(kh, kl, vs, idx, k_log: int, R: int):
    s = 1 << k_log
    is_lo = (idx & s) == 0
    return _exchange_multi64(kh, kl, vs, s, (is_lo, ~is_lo), R)


def _make_local_kernel_multi64(tile_log: int, n_vals: int, alt: bool):
    R = 1 << (tile_log - 7)

    def kernel(*refs):
        kh_ref, kl_ref = refs[0], refs[1]
        v_refs = refs[2 : 2 + n_vals]
        o_kh, o_kl = refs[2 + n_vals], refs[3 + n_vals]
        o_vs = refs[4 + n_vals : 4 + 2 * n_vals]
        kh, kl = kh_ref[:], kl_ref[:]
        m = -(pl.program_id(0) & 1)
        if alt:
            kh, kl = kh ^ m, kl ^ m
        vs = [r[:] for r in v_refs]
        idx = fv.flat_index(R)
        for p_log in range(0, tile_log):
            for k_log in range(p_log, -1, -1):
                kh, kl, vs = _ce_stage_multi64(
                    kh, kl, vs, idx, p_log, k_log, R
                )
        if alt:
            kh, kl = kh ^ m, kl ^ m
        o_kh[:] = kh
        o_kl[:] = kl
        for o, v in zip(o_vs, vs):
            o[:] = v

    return kernel


def _make_merge_kernel_multi64(
    tile_log: int, rows: int, n_vals: int, n_real: int | None = None
):
    """_make_merge_kernel_multi with a 2-limb key: windows for both key
    planes + value planes, lt64 pairing, limb-wise complement. Scratch:
    [wakh, wakl, wbkh, wbkl, wav_*, wbv_*, DMA semaphores]."""
    R = 1 << (tile_log - 7)
    Rw = R + 8

    def kernel(a_off_r, a_rem_r, b_off_r, b_front_r, out_m_r, *refs):
        n_io = 2 + n_vals  # key hi, key lo, value planes
        hbms = refs[:n_io]
        outs = refs[n_io : 2 * n_io]
        scratch = refs[2 * n_io :]
        wa = scratch[:n_io]
        wb = scratch[n_io : 2 * n_io]
        semas = scratch[2 * n_io :]
        t = pl.program_id(0)

        @pl.when(t < n_real if n_real is not None else t >= 0)
        def _merge():
            a_off, b_off = a_off_r[t], b_off_r[t]
            a_rem, b_front, m = a_rem_r[t], b_front_r[t], out_m_r[t]
            ra = jnp.minimum(jax.lax.shift_right_logical(a_off, 7), rows)
            rb = jnp.minimum(jax.lax.shift_right_logical(b_off, 7), rows)
            copies = []
            for i, (src, dst) in enumerate(
                list(zip(hbms, wa)) + list(zip(hbms, wb))
            ):
                r = ra if i < n_io else rb
                c = pltpu.make_async_copy(src.at[pl.ds(r, Rw)], dst, semas[i])
                c.start()
                copies.append(c)
            for c in copies:
                c.wait()

            sa = a_off & 127
            sb = b_off & 127
            fills = [I32_MAX, _LO_MAX] + [0] * n_vals
            aw = [
                fv.shift_flat_left_dyn(w[...], sa, Rw, f)[0:R]
                for w, f in zip(wa, fills)
            ]
            bw = [
                fv.shift_flat_left_dyn(w[...], sb, Rw, f)[0:R]
                for w, f in zip(wb, fills)
            ]
            flat = fv.flat_index(R)
            akh = jnp.where(flat >= a_rem, I32_MAX, aw[0])
            akl = jnp.where(flat >= a_rem, _LO_MAX, aw[1])
            bkh = jnp.where(flat < b_front, I32_MAX, bw[0])
            bkl = jnp.where(flat < b_front, _LO_MAX, bw[1])

            take_b = _lt64_strict(bkh, bkl, akh, akl)  # A wins ties
            kh = jnp.where(take_b, bkh, akh) ^ m
            kl = jnp.where(take_b, bkl, akl) ^ m
            vs = [
                jnp.where(take_b, bv, av)
                for av, bv in zip(aw[2:], bw[2:])
            ]
            for k_log in range(tile_log - 1, -1, -1):
                kh, kl, vs = _bitonic_stage_multi64(
                    kh, kl, vs, flat, k_log, R
                )
            outs[0][...] = kh ^ m
            outs[1][...] = kl ^ m
            for o, v in zip(outs[2:], vs):
                o[...] = v

        if n_real is not None:

            @pl.when(t >= n_real)
            def _slack():
                outs[0][...] = jnp.full((R, 128), I32_MAX, jnp.int32)
                outs[1][...] = jnp.full((R, 128), _LO_MAX, jnp.int32)
                for o in outs[2:]:
                    o[...] = jnp.zeros((R, 128), jnp.int32)

    return kernel


def _k64(kh, kl):
    """Reconstruct int64 keys from limb planes (XLA side, for splits)."""
    return (kh.astype(jnp.int64) << 32) | (
        kl.astype(jnp.int64) & jnp.int64(0xFFFFFFFF)
    )


def _sort_padded_multi64(kh, kl, vs: tuple, tile_log: int):
    """Full 64-bit limb-key sort: the capped driver at full ladder
    depth (the final level's force_asc is a no-op there — one run
    remains, written ascending either way)."""
    tile = 1 << tile_log
    nt = kh.shape[0] // tile
    full = max(nt - 1, 0).bit_length()
    return _sort_padded_multi64_capped(kh, kl, vs, tile_log, full)


@functools.partial(jax.jit, static_argnames=("tile_log",))
def _merge_two_padded_multi64(
    akh, akl, avs: tuple, bkh, bkl, bvs: tuple, tile_log: int
):
    tile = 1 << tile_log
    R = tile // 128
    Rw = R + 8
    P = len(avs)
    nA, nB = akh.shape[0], bkh.shape[0]
    n = nA + nB
    n_pad = n + ((-n) % tile)
    nt = n_pad // tile
    rows = n_pad // 128
    slack = Rw * 128

    def assemble(a, b, fill):
        f = jnp.full(slack, fill, jnp.int32)
        return jnp.concatenate(
            [f, a, b[::-1], jnp.full(n_pad - n, fill, jnp.int32), f]
        ).reshape(rows + 2 * Rw, 128)

    ypad_kh = assemble(akh, bkh, I32_MAX)
    ypad_kl = assemble(akl, bkl, _LO_MAX)
    ypad_vs = [assemble(a, b, 0) for a, b in zip(avs, bvs)]
    y64 = _k64(ypad_kh, ypad_kl).reshape(-1)
    a_off, a_rem, b_off, b_front, out_m = _merge_splits_two(
        y64, nA, nB, nt, tile_log, n_pad, base=slack
    )
    splits = (a_off + slack, a_rem, b_off + slack, b_front, out_m)
    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(nt,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * (2 + P),
            out_specs=[
                pl.BlockSpec(
                    (R, 128), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
                )
            ]
            * (2 + P),
            scratch_shapes=(
                [pltpu.VMEM((Rw, 128), jnp.int32)] * (2 * (2 + P))
                + [pltpu.SemaphoreType.DMA] * (2 * (2 + P))
            ),
        )
        outs = pl.pallas_call(
            _make_merge_kernel_multi64(tile_log, rows + Rw, P),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.int32)]
            * (2 + P),
            compiler_params=_VMEM_BIG,
        )(*splits, ypad_kh, ypad_kl, *ypad_vs)
    return (
        outs[0].reshape(-1),
        outs[1].reshape(-1),
        tuple(o.reshape(-1) for o in outs[2:]),
    )


def _split64(k):
    return (
        jax.lax.shift_right_arithmetic(k, 32).astype(jnp.int32),
        k.astype(jnp.int32),  # low 32 bits (wrapping)
    )


def pallas_sort_multi_i64(keys, vals, tile_log: int = TILE_LOG):
    """Ascending sort of int64 keys carrying i32 value planes, via
    (hi, lo) limb planes. Unstable among equal keys; tuples stay
    attached. Keys strictly inside (INT64_MIN, INT64_MAX). Returns
    (sorted_keys int64, tuple_of_sorted_value_planes)."""
    vals = tuple(vals)
    n = keys.shape[0]
    tile = 1 << tile_log
    if n <= tile:
        out = jax.lax.sort([keys, *vals], num_keys=1)
        return out[0], tuple(out[1:])
    pad = (-n) % tile
    if pad:
        keys = jnp.concatenate(
            [keys, jnp.full(pad, jnp.iinfo(jnp.int64).max, jnp.int64)]
        )
        vals = tuple(
            jnp.concatenate([v, jnp.zeros(pad, jnp.int32)]) for v in vals
        )
    kh, kl = _split64(keys)
    kh, kl, vs = _sort_padded_multi64(kh, kl, vals, tile_log)
    return _k64(kh, kl)[:n], tuple(v[:n] for v in vs)


def merge_sorted_multi_i64(ak, avs, bk, bvs, tile_log: int = TILE_LOG):
    """Merge two ASCENDING-sorted int64 streams (ties: A first).
    Returns (keys int64, value_planes) of length |A|+|B|."""
    avs, bvs = tuple(avs), tuple(bvs)
    n = ak.shape[0] + bk.shape[0]
    if n <= (1 << tile_log) or ak.shape[0] == 0 or bk.shape[0] == 0:
        out = jax.lax.sort(
            [
                jnp.concatenate([ak, bk]),
                *(jnp.concatenate([a, b]) for a, b in zip(avs, bvs)),
            ],
            num_keys=1,
        )
        return out[0], tuple(out[1:])
    akh, akl = _split64(ak)
    bkh, bkl = _split64(bk)
    kh, kl, vs = _merge_two_padded_multi64(
        akh, akl, avs, bkh, bkl, bvs, tile_log
    )
    return _k64(kh, kl)[:n], tuple(v[:n] for v in vs)


def pallas_sort_i64_limbs(keys, tile_log: int = TILE_LOG,
                          n_levels_cap: int | None = None):
    """Key-only 64-bit sort returning the RAW (hi, lo) limb planes —
    callers that feed limb-consuming kernels skip the int64
    reconstruct/re-split round trip (~an emulated-int64 pass each way).
    With `n_levels_cap` the merge ladder stops early, leaving sorted
    runs of 2^(tile_log + cap) — counts are additive over probe
    sub-runs (ops/sort_merge._count_side_bc), so count-side callers
    trade ladder levels for per-run scans. Returns (khi, klo, run_log)
    where run_log is the sorted-run length log2 (== padded-size log
    when fully sorted)."""
    n = keys.shape[0]
    tile = 1 << tile_log
    pad = (-n) % tile
    if pad:
        keys = jnp.concatenate(
            [keys, jnp.full(pad, jnp.iinfo(jnp.int64).max, jnp.int64)]
        )
    n_pad = keys.shape[0]
    nt = n_pad // tile
    n_levels = max(nt - 1, 0).bit_length()
    cap = n_levels if n_levels_cap is None else min(n_levels, n_levels_cap)
    kh, kl = _split64(keys)
    kh, kl, _ = _sort_padded_multi64_capped(kh, kl, (), tile_log, cap)
    run_log = tile_log + cap
    return kh, kl, run_log


@functools.partial(
    jax.jit, static_argnames=("tile_log", "n_levels_cap")
)
def _sort_padded_multi64_capped(kh, kl, vs: tuple, tile_log: int,
                                n_levels_cap: int):
    """_sort_padded_multi64 with an early-stopped merge ladder; the
    final executed level (if any) writes every run ASCENDING
    (force_asc) so downstream scanners can walk runs forward."""
    tile = 1 << tile_log
    n_pad = kh.shape[0]
    nt = n_pad // tile
    rows = n_pad // 128
    R = tile // 128
    P = len(vs)

    n_levels_full = max(nt - 1, 0).bit_length()
    n_levels = min(n_levels_full, n_levels_cap)
    alt = n_levels_full > 0  # orientation scheme fixed by the presort

    ykh = kh.reshape(rows, 128)
    ykl = kl.reshape(rows, 128)
    yvs = [v.reshape(rows, 128) for v in vs]
    with jax.enable_x64(False):
        spec = pl.BlockSpec((R, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        shape = jax.ShapeDtypeStruct((rows, 128), jnp.int32)
        outs = pl.pallas_call(
            _make_local_kernel_multi64(tile_log, P, alt and n_levels > 0),
            grid=(nt,),
            in_specs=[spec] * (2 + P),
            out_specs=[spec] * (2 + P),
            out_shape=[shape] * (2 + P),
            compiler_params=_VMEM_BIG,
        )(ykh, ykl, *yvs)
        ykh, ykl, yvs = outs[0], outs[1], list(outs[2:])

    Rw = R + 8
    if n_levels:
        ykh = jnp.concatenate(
            [ykh, jnp.full((2 * R, 128), I32_MAX, jnp.int32)], axis=0
        )
        ykl = jnp.concatenate(
            [ykl, jnp.full((2 * R, 128), _LO_MAX, jnp.int32)], axis=0
        )
        yvs = [
            jnp.concatenate([v, jnp.zeros((2 * R, 128), jnp.int32)],
                            axis=0)
            for v in yvs
        ]
    merge_kernel = _make_merge_kernel_multi64(
        tile_log, rows + R - 8, P, n_real=nt
    )
    pad2 = jnp.zeros(2, jnp.int32)
    for lvl in range(n_levels):
        run_log = tile_log + lvl
        force_asc = lvl == n_levels - 1
        splits = _merge_splits_alt(
            _k64(ykh, ykl).reshape(-1), run_log, nt, tile_log, n_pad,
            force_asc=force_asc,
        )
        with jax.enable_x64(False):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(nt + 2,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * (2 + P),
                out_specs=[
                    pl.BlockSpec(
                        (R, 128), lambda t, *_: (t, 0),
                        memory_space=pltpu.VMEM,
                    )
                ]
                * (2 + P),
                scratch_shapes=(
                    [pltpu.VMEM((Rw, 128), jnp.int32)] * (2 * (2 + P))
                    + [pltpu.SemaphoreType.DMA] * (2 * (2 + P))
                ),
            )
            outs = pl.pallas_call(
                merge_kernel,
                grid_spec=grid_spec,
                out_shape=[
                    jax.ShapeDtypeStruct((rows + 2 * R, 128), jnp.int32)
                ]
                * (2 + P),
                compiler_params=_VMEM_BIG,
            )(*(jnp.concatenate([s, pad2]) for s in splits),
              ykh, ykl, *yvs)
            ykh, ykl, yvs = outs[0], outs[1], list(outs[2:])

    flat_kh = ykh.reshape(-1)[:n_pad]
    flat_kl = ykl.reshape(-1)[:n_pad]
    return flat_kh, flat_kl, tuple(v.reshape(-1)[:n_pad] for v in yvs)


def merge_sorted_i64_limbs(akh, akl, bk, tile_log: int = TILE_LOG):
    """Key-only unequal merge of an ASCENDING limb-plane stream (A) with
    an ASCENDING int64 stream (B, the small side — flipped internally),
    returning limb planes. Ties: A first."""
    nA, nB = akh.shape[0], bk.shape[0]
    n = nA + nB
    bkh, bkl = _split64(bk)
    if n <= (1 << tile_log) or nA == 0 or nB == 0:
        out = jax.lax.sort([jnp.concatenate([_k64(akh, akl), bk])],
                           num_keys=1)[0]
        oh, ol = _split64(out)
        return oh, ol
    kh, kl, _ = _merge_two_padded_multi64(
        akh, akl, (), bkh, bkl, (), tile_log
    )
    return kh[:n], kl[:n]
