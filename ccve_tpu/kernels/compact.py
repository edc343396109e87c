"""Pallas stream-compaction kernel — `compressstoreu` for TPU.

The reference's innermost trick is AVX-512 stream compaction:
`_mm256_mask_compressstoreu_epi32` packs the selected lanes of a vector
contiguously (chaining_ht.cpp:248, linear_probing_ht.cpp:206-208). The
TPU VPU has no compress instruction and no scatter unit, so compaction
is re-derived from shift-and-select primitives the VPU does have
(kernels/flatvec.py):

 - **Within a tile** each selected element moves LEFT by its hole
   deficit d[i] = i - rank[i] (rank via a Hillis-Steele prefix scan),
   one power-of-two bit per round, LSB first — collision-free because d
   is monotone: classic butterfly compaction in log2(tile) rounds.
 - **Across tiles** compacted runs append into a VMEM ring via one
   dynamic flat shift; whole R-row blocks flush to HBM only when >=
   R*128 values have accumulated — ~n/(R*128) perfectly disjoint DMAs
   total. The AMORTIZED flush is what the first version of this kernel
   lacked: its per-tile DMA round trip capped it at ~0.4M rows/s
   (PERF_NOTES.md); the ring pattern is the same one that makes
   merge_scan_build_counts fast.

int64 columns travel as hi/lo u32 limb pairs (split/recombined outside;
the kernel is pure 32-bit — Mosaic's lane width).

API: `pallas_compact(cols int64[C, n], mask bool[n]) -> (int64[C, n],
count int32)` — rows where mask holds, packed to the front, order
preserved; n a multiple of 128.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ccve_tpu.kernels import flatvec as fv
from ccve_tpu.kernels.bigsort import _VMEM_BIG

_R_MAX = 256  # tile rows: grid-step-bound like the dense-counts kernel

# kept for callers/tests that size inputs in tiles
TILE = 8 * 128


def _ring_call(n_tiles, L, R, out_rows, mask2, limbs3, interpret):
    return pl.pallas_call(
        _make_ring_kernel(L, R),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (L, R, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # [L, out_rows, 128]
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, out_rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((3,), jnp.int32),  # ring fill, flushed rows, total
            pltpu.VMEM((L, 2 * R, 128), jnp.int32),  # ring
            pltpu.VMEM((L, R, 128), jnp.int32),  # DMA stage
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=_VMEM_BIG,
        interpret=interpret,
    )(mask2, limbs3)


def _make_ring_kernel(L: int, R: int):
    tile = R * 128
    rounds = tile.bit_length() - 1
    ring_r = 2 * R

    def kernel(mask_ref, limbs_ref, out_hbm, count_ref, carry, ring,
               stage, sem):
        i = pl.program_id(0)
        last = pl.num_programs(0) - 1

        @pl.when(i == 0)
        def _():
            carry[0] = 0  # ring fill w
            carry[1] = 0  # flushed output rows
            carry[2] = 0  # total selected

        m = mask_ref[:]
        rank = fv.prefix_sum_i32(m, R, rounds)
        k_t = rank[R - 1, 127]
        vals = fv.butterfly_compact(
            [limbs_ref[l] for l in range(L)], m, R, rounds, rank=rank
        )

        w = carry[0]
        flat2 = fv.flat_index(ring_r)
        for l in range(L):
            v2 = jnp.concatenate(
                [vals[l], jnp.zeros((ring_r - R, 128), jnp.int32)], axis=0
            )
            shifted = fv.shift_flat_right_dyn(v2, w, ring_r)
            ring[l] = jnp.where(flat2 < w, ring[l], shifted)
        w = w + k_t
        carry[2] = carry[2] + k_t

        def flush():
            for l in range(L):
                stage[l] = ring[l, 0:R]
            copy = pltpu.make_async_copy(
                stage, out_hbm.at[:, pl.ds(carry[1], R), :], sem
            )
            copy.start()
            copy.wait()
            carry[1] = carry[1] + R

        @pl.when(w >= tile)
        def _():
            flush()
            for l in range(L):
                ring[l] = pltpu.roll(ring[l], R, axis=0)
            carry[0] = w - tile

        @pl.when(w < tile)
        def _():
            carry[0] = w

        @pl.when((i == last) & (carry[0] > 0))
        def _():
            flush()  # final partial block; junk past count is sliced off

        @pl.when(i == last)
        def _():
            count_ref[0, 0] = carry[2]

    return kernel


def _compact_limbs(limbs: jax.Array, mask: jax.Array, interpret: bool):
    """Shared driver: i32[L, n] planes by bool[n] -> (i32[L, n], count)."""
    L, n = limbs.shape
    assert n % 128 == 0, f"n={n} must be a multiple of 128"
    # power-of-two tile rows: the prefix/butterfly ladder depths and the
    # ring roll assume it (and Mosaic needs sublane counts % 8 == 0)
    R = 1 << min(max(n // 128, 8), _R_MAX).bit_length() - 1
    tile = R * 128
    pad = (-n) % tile
    npad = n + pad
    if pad:
        limbs = jnp.concatenate(
            [limbs, jnp.zeros((L, pad), jnp.int32)], axis=1
        )
        mask = jnp.concatenate([mask, jnp.zeros(pad, bool)])
    limbs3 = limbs.reshape(L, npad // 128, 128)
    mask2 = mask.astype(jnp.int32).reshape(npad // 128, 128)
    out_rows = npad // 128 + R  # final partial flush writes R full rows

    # x64-off trace: Mosaic cannot legalize the i64 scalars x64 mode puts
    # into index maps / SMEM carries (see kernels/murmur.py).
    with jax.enable_x64(False):
        out_limbs, count = _ring_call(
            npad // tile, L, R, out_rows, mask2, limbs3, interpret
        )
    return out_limbs.reshape(L, out_rows * 128)[:, :n], count[0, 0]


def pallas_compact_i32(cols: jax.Array, mask: jax.Array,
                       interpret: bool = False):
    """Compact int32[C, n] planes by bool[n]; returns (int32[C, n],
    int32 count) — rows where mask holds, packed to the front, order
    preserved. n a multiple of 128."""
    return _compact_limbs(cols.astype(jnp.int32), mask, interpret)


def pallas_compact(cols: jax.Array, mask: jax.Array,
                   interpret: bool = False):
    """Compact int64[C, n] by bool[n]; returns (int64[C, n], int32 count).
    n must be a multiple of 128."""
    C, n = cols.shape
    u = cols.astype(jnp.uint64)
    lo = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32).astype(jnp.int32)
    hi = (u >> jnp.uint64(32)).astype(jnp.uint32).astype(jnp.int32)
    limbs = jnp.concatenate([lo, hi], axis=0)  # [2C, n]
    flat, count = _compact_limbs(limbs, mask, interpret)
    lo = flat[:C].astype(jnp.uint32).astype(jnp.uint64)
    hi = flat[C:].astype(jnp.uint32).astype(jnp.uint64)
    out = lo | (hi << jnp.uint64(32))
    return out.astype(jnp.int64), count
