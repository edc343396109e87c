"""Fused per-chunk probe kernel — one dispatch computes every probe row's
match count and first-match position against a VMEM-staged sorted table.

This is the TPU-native replacement for the pipelined executor's per-row
cursor chase (`scan_next`, the reference's InOneNext fused loop,
chaining_ht.cpp:138-173 / linear_probing_ht.cpp:117-153). The reference
walks each probe row's bucket chain with per-key random loads — an
AVX-512 gather workload a TPU cannot do. Here the whole chunk is probed
in ONE sorted-merge pass, the same formulation the bulk engine uses
(ops/sort_merge.py), shrunk to chunk granularity:

  1. grid step 0 Batcher-sorts the chunk's packed keys DESCENDING
     in-register (ascending sort of the complement; row ids ride as
     cargo) into persistent VMEM scratch — measured on chip, the
     XLA alternative (two flat 2048-element lax.sorts around the
     kernel) costs ~350 us/step, ~40x the whole in-kernel budget;
  2. the kernel merges them into the staged sorted table with a
     SEQUENTIAL CARRIED TILE MERGE: SMEM cursors (a_pos, b_pos) walk the
     two sorted streams one output tile per grid step — each step loads
     a table window at a_pos (dynamic `pl.ds` row slice + element
     shift), shifts the in-VMEM chunk window to b_pos, takes the
     element-aligned min of the A window and the FLIPPED B window (the
     descending storage makes the flip free — kernels/bigsort.py's
     bitonic lower-half trick), and sorts the bitonic result with
     tile_log halver stages. No merge-path bisection, no per-lane
     random access: cursor advances come from counting the B-side
     elements that landed in the tile (their cargo is >= 0).
  3. the merged tile runs the merge-scan math (kernels/merge_scan.py):
     running build count `c`, run-start base via monotone prefix-max —
     mult = c - base, start = base (= the first matching row of the
     sorted table, since the j-th build element of the merged stream IS
     table row j);
  4. probe entries are butterfly-compacted out of the tile and appended
     to a VMEM ring (exactly `block` of them across the whole stream);
     the last grid step Batcher-unsorts the ring by its row-id plane and
     writes (mult, start) in original row order.

Packing convention (ops/sort_merge.pack32): key' = key - kmin + 1
clamped to [0, range+1], table operand = key' << 1 (even), probe
operand = key' << 1 | 1 (odd, so probes sort AFTER equal-key builds and
their running build count is exactly #builds <= key). Invalid probe
lanes (>= count, filtered out, or key outside the packable range after
clamping still matches nothing) ride as I32_MAX odd sentinels: they
merge at the stream's end, count no builds, and emit mult = 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ccve_tpu.kernels import flatvec as fv
from ccve_tpu.kernels.bigsort import I32_MAX, _VMEM_BIG
from ccve_tpu.kernels.pairsort import _ce_stage_multi

I32_MIN = fv.I32_MIN

# SMEM carry slots
_PREV, _C, _BASE, _W, _APOS, _BPOS = range(6)


def _bitonic_stage_pair(k, v, idx, k_log: int, R: int):
    """Halver stage moving (key, cargo) pairs as a unit (strict
    predicate: ties never swap, so each cargo stays with its key)."""
    s = 1 << k_log
    up_k = fv.shift_flat_left(k, s, R)
    dn_k = fv.shift_flat_right(k, s, R, 0)
    is_lo = (idx & s) == 0
    take_up = is_lo & (up_k < k)
    take_dn = (~is_lo) & (dn_k > k)
    new_k = jnp.where(take_up, up_k, jnp.where(take_dn, dn_k, k))
    new_v = jnp.where(
        take_up,
        fv.shift_flat_left(v, s, R),
        jnp.where(take_dn, fv.shift_flat_right(v, s, R, 0), v),
    )
    return new_k, new_v


def _make_chunk_rank_kernel(R: int, m: int, n_tiles: int):
    """R = block/128. Table has m real entries; buffer padded with
    I32_MAX to >= m + (R+8)*128 elements. Grid = (n_tiles,) sequential."""
    tile = R * 128
    tile_log = tile.bit_length() - 1
    # +8 slack rows: Mosaic's dynamic rotate needs sublane-aligned (x8)
    # shapes (same reason the merge kernels use R + 8 windows)
    Rw = R + 8

    def kernel(tpk_ref, pk_ref, mult_ref, start_ref,
               sbk_ref, sbr_ref, ring_m, ring_s, ring_r, carry):
        t = pl.program_id(0)
        flat = fv.flat_index(R)

        @pl.when(t == 0)
        def _():
            # in-register Batcher presort, DESCENDING by complement
            # (ascending-sort of ~x is descending-sort of x,
            # kernels/bigsort.py's alt trick), row ids as cargo
            k0 = ~pk_ref[:]
            vs0 = [flat]
            for p_log in range(tile_log):
                for k_log in range(p_log, -1, -1):
                    k0, vs0 = _ce_stage_multi(k0, vs0, flat, p_log, k_log, R)
            sbk_ref[...] = ~k0
            sbr_ref[...] = vs0[0]
            carry[_PREV] = -1  # packed keys' >= 0: forces a run start
            carry[_C] = 0
            carry[_BASE] = I32_MIN
            carry[_W] = 0
            carry[_APOS] = 0
            carry[_BPOS] = 0

        a_pos = carry[_APOS]
        b_pos = carry[_BPOS]

        # --- A window: table entries [a_pos, a_pos + tile) --------------
        ra = jax.lax.shift_right_logical(a_pos, 7)
        aw = tpk_ref[pl.ds(ra, Rw), :]
        ak = fv.shift_flat_left_dyn(aw, a_pos & 127, Rw, I32_MAX)[0:R]

        # --- B window: FLIPPED chunk slice starting at logical b_pos ----
        # sbk is stored DESCENDING, so the flipped ascending window is a
        # plain right-shift: w_b[i] = B_logical[b_pos + tile-1 - i]
        # = sbk_flat[i - b_pos]; i < b_pos is past B's end -> +INF.
        # b_pos == tile (chunk fully consumed) exceeds the shift helper's
        # [0, tile) domain: clamp and mask the whole window instead.
        done_b = b_pos >= tile
        bp = jnp.minimum(b_pos, tile - 1)
        bk = fv.shift_flat_right_dyn(sbk_ref[:], bp, R, I32_MAX)
        bc = fv.shift_flat_right_dyn(sbr_ref[:], bp, R, -1)
        bk = jnp.where(done_b, I32_MAX, bk)
        bc = jnp.where(done_b, -1, bc)

        # --- bitonic lower-half merge. Ties go to B: real A and B
        # operands never tie (tag parity differs), but B's invalid-lane
        # sentinels (I32_MAX) tie with A's pad sentinels, and only the B
        # side carries a row-id cargo that MUST be extracted ------------
        take_b = bk <= ak
        k = jnp.where(take_b, bk, ak)
        cargo = jnp.where(take_b, bc, -1)
        for k_log in range(tile_log - 1, -1, -1):
            k, cargo = _bitonic_stage_pair(k, cargo, flat, k_log, R)

        # --- merge-scan: c (running builds), run-start base ------------
        is_build = (k & 1) == 0
        ib = is_build.astype(jnp.int32)
        c = fv.prefix_sum_i32(ib, R, tile_log) + carry[_C]
        key = jax.lax.shift_right_arithmetic(k, 1)
        prev = fv.shift_flat_right(key, 1, R, 0)
        prev = jnp.where(flat == 0, carry[_PREV], prev)
        run_start = key != prev
        base = jnp.maximum(
            fv.prefix_max_i32(
                jnp.where(run_start, c - ib, I32_MIN), R, tile_log
            ),
            carry[_BASE],
        )
        mult = c - base

        # --- extract the tile's probe entries into the ring ------------
        mask = (cargo >= 0).astype(jnp.int32)
        rank = fv.prefix_sum_i32(mask, R, tile_log)
        k_t = rank[R - 1, 127]
        cm, cs, cr = fv.butterfly_compact(
            [mult, base, cargo], mask, R, tile_log, rank=rank
        )
        w = carry[_W]
        # w == tile => ring full; the shifted values are never selected
        # (flat < w everywhere) but the shift amount must stay in-domain.
        ws = jnp.minimum(w, tile - 1)
        for ring, vals in ((ring_m, cm), (ring_s, cs), (ring_r, cr)):
            shifted = fv.shift_flat_right_dyn(vals, ws, R)
            ring[...] = jnp.where(flat < w, ring[...], shifted)

        # --- carries ----------------------------------------------------
        carry[_PREV] = key[R - 1, 127]
        carry[_C] = c[R - 1, 127]
        carry[_BASE] = base[R - 1, 127]
        carry[_W] = w + k_t
        carry[_APOS] = jnp.minimum(a_pos + (tile - k_t), m)
        carry[_BPOS] = jnp.minimum(b_pos + k_t, tile)

        @pl.when(t == n_tiles - 1)
        def _():
            # Batcher-unsort by the row-id plane (a permutation of
            # 0..tile-1): (mult, start) land in original row order
            ku = ring_r[...]
            vsu = [ring_m[...], ring_s[...]]
            for p_log in range(tile_log):
                for k_log in range(p_log, -1, -1):
                    ku, vsu = _ce_stage_multi(ku, vsu, flat, p_log, k_log, R)
            mult_ref[...] = vsu[0]
            start_ref[...] = vsu[1]

    return kernel


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def _chunk_rank_call(tpk, pk, m: int, interpret: bool = False):
    R = pk.shape[0]
    tile = R * 128
    n_tiles = -(-(m + tile) // tile)
    rep = pl.BlockSpec(
        (R, 128), lambda t: (0, 0), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        _make_chunk_rank_kernel(R, m, n_tiles),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole table
            rep,
        ],
        out_specs=[rep] * 2,
        out_shape=[jax.ShapeDtypeStruct((R, 128), jnp.int32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.int32),  # sorted chunk keys (desc)
            pltpu.VMEM((R, 128), jnp.int32),  # their row ids
            pltpu.VMEM((R, 128), jnp.int32),  # ring: mult
            pltpu.VMEM((R, 128), jnp.int32),  # ring: start
            pltpu.VMEM((R, 128), jnp.int32),  # ring: row id
            pltpu.SMEM((6,), jnp.int32),
        ],
        compiler_params=_VMEM_BIG,
        interpret=interpret,
    )(tpk, pk)
    return outs


def stage_table_planes(packed_keys: np.ndarray, block: int):
    """Host-side staging: sorted (key' << 1) i32[m] -> padded [rows, 128]
    plane with I32_MAX tail slack for the kernel's shifted window loads."""
    m = packed_keys.shape[0]
    R = block // 128
    rows = -(-m // 128) + R + 8
    buf = np.full(rows * 128, I32_MAX, np.int32)
    buf[:m] = packed_keys
    return jnp.asarray(buf.reshape(rows, 128))


def chunk_rank(tpk: jax.Array, m: int, pk: jax.Array,
               interpret: bool = False):
    """(mult, start) int32[block] per probe lane, original order.

    tpk: staged table planes (stage_table_planes). m: real entry count.
    pk: packed probe operands i32[block] (key' << 1 | 1, invalid lanes
    I32_MAX). `start` indexes the SORTED table (garbage where mult==0).
    """
    block = pk.shape[0]
    R = block // 128
    with jax.enable_x64(False):
        mult, start = _chunk_rank_call(
            tpk, pk.reshape(R, 128), m, interpret=interpret
        )
    return mult.reshape(-1), start.reshape(-1)


def chunk_rank_xla(table_keys: jax.Array, keys: jax.Array,
                   valid: jax.Array):
    """Portable fallback (CPU tests / unpackable keys): ranks via
    searchsorted on the sorted table. Same contract as chunk_rank but
    takes raw int64 keys + validity mask."""
    start = jnp.searchsorted(table_keys, keys, side="left").astype(jnp.int32)
    end = jnp.searchsorted(table_keys, keys, side="right").astype(jnp.int32)
    mult = jnp.where(valid, end - start, 0).astype(jnp.int32)
    return mult, start
