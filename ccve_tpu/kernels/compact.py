"""Pallas stream-compaction kernel — `compressstoreu` for TPU.

The reference's innermost trick is AVX-512 stream compaction:
`_mm256_mask_compressstoreu_epi32` packs the selected lanes of a vector
contiguously (chaining_ht.cpp:248, linear_probing_ht.cpp:206-208). The
TPU VPU has no compress instruction and no scatter unit (XLA lowers a
16M-element scatter at ~80M elem/s), so this kernel re-derives compaction
from shift-and-select primitives the VPU does have:

 - **Within a tile** of T = 8x128 rows, each selected element must move
   LEFT by its hole deficit d[i] = i - rank[i] (ranks via a Hillis-Steele
   prefix scan built from the same shifts). Since d is monotone
   non-decreasing, moving elements by one power-of-two bit of d per round
   (LSB first) is collision-free — classic **butterfly compaction** in
   log2(T) = 10 rounds of `pltpu.roll` + select over the flat row-major
   [8, 128] layout (a lane roll stitched with a sublane roll).
 - **Across tiles**, a partial output row (< 128 elements) is carried in
   VMEM scratch: each tile right-shifts its compacted run by the carry
   fill (a dynamic-amount roll), splices the carry in front, DMAs whole
   128-lane rows to HBM at a row-aligned dynamic offset, and keeps the
   new partial row as carry. A tile's overhang rows are overwritten by
   the next tile; positions beyond the final count are garbage by
   contract (same as the reference's selection vectors past `count_`,
   base.h:96-99).

int64 columns travel as hi/lo u32 limb pairs (split/recombined outside;
the kernel is pure 32-bit — Mosaic's lane width).

API: `pallas_compact(cols int64[C, n], mask bool[n]) -> (int64[C, n],
count int32)` — rows where mask holds, packed to the front, order
preserved.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R = 8  # sublane rows per tile (minimum int32 tiling)
TILE = _R * 128
_LOG_TILE = 10
_A = 2 * _R  # assembly rows: tile + carry overhang, 8-row aligned for DMA


def _iota2(dim):
    return jax.lax.broadcasted_iota(jnp.int32, (_R, 128), dim)


def _flat_index():
    return _iota2(0) * 128 + _iota2(1)


def _shift_flat_left(x, s: int):
    """out[i] = x[(i + s) % T] over the flat row-major [R, 128] layout.
    (pltpu.roll takes non-negative shifts: left by k == roll by size-k.)"""
    q, rem = divmod(s, 128)
    y = pltpu.roll(x, (_R - q) % _R, axis=0) if q % _R else x
    if rem:
        a = pltpu.roll(y, 128 - rem, axis=1)
        b = pltpu.roll(a, _R - 1, axis=0)
        y = jnp.where(_iota2(1) < 128 - rem, a, b)
    return y


def _shift_flat_right_zero(x, s: int):
    """out[i] = x[i - s], zero-filled for i < s (for prefix scans)."""
    q, rem = divmod(s, 128)
    y = pltpu.roll(x, q, axis=0) if q else x
    if rem:
        a = pltpu.roll(y, rem, axis=1)
        b = pltpu.roll(a, 1, axis=0)
        y = jnp.where(_iota2(1) >= rem, a, b)
    return jnp.where(_flat_index() >= s, y, 0)


def _inclusive_rank(m):
    """Inclusive prefix sum of an int32 0/1 mask in flat order."""
    acc = m
    for b in range(_LOG_TILE):
        acc = acc + _shift_flat_right_zero(acc, 1 << b)
    return acc


def _butterfly_compact(vals, m):
    """Pack masked elements of flat [R,128] arrays to the front."""
    rank = _inclusive_rank(m) - m  # exclusive
    d = jnp.where(m > 0, _flat_index() - rank, 0)
    valid = m > 0
    for b in range(_LOG_TILE):
        s = 1 << b
        sd = _shift_flat_left(d, s)
        sv = _shift_flat_left(valid.astype(jnp.int32), s) > 0
        incoming = sv & (((sd >> b) & 1) > 0)
        resident = valid & (((d >> b) & 1) == 0)
        vals = [jnp.where(incoming, _shift_flat_left(v, s), v) for v in vals]
        d = jnp.where(incoming, sd, d)
        valid = incoming | resident
    return vals


def _splice_with_carry(v, carry_row, c0):
    """[_A, 128]: carry elements at flat [0, c0), then v's elements.
    c0 is a traced scalar in [0, 128)."""
    vp = jnp.concatenate(
        [v, jnp.zeros((_A - _R, 128), v.dtype)], axis=0
    )  # [_A, 128]
    lane = jax.lax.broadcasted_iota(jnp.int32, (_A, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (_A, 128), 0)
    a = pltpu.roll(vp, c0, axis=1)  # a[r,c] = vp[r, (c-c0)%128]
    b = pltpu.roll(a, 1, axis=0)  # b[r,c] = a[r-1, c]
    shifted = jnp.where(lane >= c0, a, b)
    carry_b = jnp.broadcast_to(carry_row, (_A, 128))
    return jnp.where((row == 0) & (lane < c0), carry_b, shifted)


def _kernel(mask_ref, limbs_ref, out_hbm, count_ref, state_ref, carry_ref,
            scratch, sem):
    i = pl.program_id(0)
    last = pl.num_programs(0) - 1
    L = limbs_ref.shape[0]

    @pl.when(i == 0)
    def _():
        state_ref[0] = 0  # output row base
        state_ref[1] = 0  # carry fill c0
        carry_ref[:] = jnp.zeros_like(carry_ref)

    m = mask_ref[:]  # [R, 128] int32 0/1
    # count = max inclusive rank. (NOT jnp.sum: its accumulator promotes
    # to int64 under x64 even with dtype pinned, which Mosaic rejects.)
    tile_count = jnp.max(_inclusive_rank(m))
    vals = _butterfly_compact([limbs_ref[l] for l in range(L)], m)

    row_base = state_ref[0]
    c0 = state_ref[1]
    for l in range(L):
        scratch[l] = _splice_with_carry(vals[l], carry_ref[l, 0:1, :], c0)

    copy = pltpu.make_async_copy(
        scratch, out_hbm.at[:, pl.ds(row_base, _A), :], sem
    )
    copy.start()
    copy.wait()

    total = c0 + tile_count
    emit_rows = total // 128
    new_c0 = total % 128
    # new carry = the partial row at index emit_rows, lanes < new_c0
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    for l in range(L):
        # dynamic-offset ref read (value-level dynamic_slice is not
        # lowerable in Mosaic; pl.ds on a ref is)
        part = scratch[l, pl.ds(emit_rows, 1), :]
        carry_ref[l, 0:1, :] = jnp.where(lane1 < new_c0, part, 0)

    state_ref[0] = row_base + emit_rows
    state_ref[1] = new_c0

    @pl.when(i == last)
    def _():
        count_ref[0, 0] = (row_base + emit_rows) * 128 + new_c0


def _call(n_tiles, L, out_rows, mask2, limbs3):
    return pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (L, _R, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # [L, out_rows, 128], DMA'd
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, out_rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((2,), jnp.int32),  # row_base, carry fill
            pltpu.VMEM((L, 8, 128), jnp.int32),  # carry (row 0 used)
            pltpu.VMEM((L, _A, 128), jnp.int32),  # assembly buffer
            pltpu.SemaphoreType.DMA,
        ],
    )(mask2, limbs3)


def pallas_compact(cols: jax.Array, mask: jax.Array):
    """Compact int64[C, n] by bool[n]; returns (int64[C, n], int32 count).
    n must be a multiple of TILE=1024 (engine block sizes are)."""
    C, n = cols.shape
    assert n % TILE == 0, f"n={n} must be a multiple of {TILE}"
    n_tiles = n // TILE

    # int64 -> (lo, hi) u32 limbs, bit patterns preserved as int32
    u = cols.astype(jnp.uint64)
    lo = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32).astype(jnp.int32)
    hi = (u >> jnp.uint64(32)).astype(jnp.uint32).astype(jnp.int32)
    limbs = jnp.concatenate([lo, hi], axis=0)  # [2C, n]
    L = 2 * C
    limbs3 = limbs.reshape(L, n // 128, 128)

    mask2 = mask.astype(jnp.int32).reshape(n // 128, 128)
    out_rows = n // 128 + _A  # room for the last tile's overhang

    # x64-off trace: Mosaic cannot legalize the i64 scalars x64 mode puts
    # into index maps / SMEM carries (see kernels/murmur.py).
    with jax.enable_x64(False):
        out_limbs, count = _call(n_tiles, L, out_rows, mask2, limbs3)

    flat = out_limbs.reshape(L, out_rows * 128)[:, :n]
    lo = flat[:C].astype(jnp.uint32).astype(jnp.uint64)
    hi = flat[C:].astype(jnp.uint32).astype(jnp.uint64)
    out = lo | (hi << jnp.uint64(32))
    return out.astype(jnp.int64), count[0, 0]
