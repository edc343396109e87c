"""Hybrid sort — XLA's batched sort for short runs, Pallas odd-even
merge networks in VMEM, and merge-path passes across HBM.

Measured on v5e (PERF_NOTES.md): XLA's flat sort of 17M i32 runs ~54 ms
device-time, but its BATCHED sort of the same data as [2176, 8192] rows
takes ~11 ms, and a Pallas compare-exchange (CE) stage over the whole
array costs ~0.06 ms. This module composes those fast pieces:

  1. pad to a multiple of TILE = 2^17; XLA batched sort of [*, 8192]
     rows -> sorted 8K runs                                    (~11 ms)
  2. ONE block-local Pallas pass of Batcher odd-even merge levels:
     runs 2^13 -> 2^17. Merge windows stay TILE-aligned, so the CE
     masks are static and every comparison is ascending (min to the
     lower index) — no reversals, no data-dependent control    (~4 ms)
  3. MERGE-PATH levels, runs 2^17 -> n: one linear pass per level.
     A 24-step vectorized bisection (inside the jit) finds, for each
     2^17-element output tile, the split (a_t, b_t) of its run pair;
     the kernel DMAs one [1024, 128] window from each side, masks
     elements outside [split, run end) to ∓INF, odd-even-merges the
     two sorted halves in-register (18 static stages), shifts off the
     -INF prefix, and emits exactly one output tile. Each level reads
     and writes the array once — O(n) per level instead of the
     O(n log n) of cross-block CE stages              (~1.5 ms/level)

Batcher stage masks (validated against numpy, tests/test_bigsort.py):
stage (p, k): CE(x, x+k) ascending, where
  k == p: lower iff x mod 2p < p
  k <  p: lower iff (x & k) != 0 and x mod 2p < 2p - k;
          upper iff (x & k) == 0 and x mod 2p >= k.

Replaces jax.lax.sort in the count-side probe path (ops/sort_merge.py);
the reference's counterpart is the AVX-512 bulk probe machinery
(simd_micro_bench.cpp, chaining_ht.cpp:176-377) whose per-key random
access a TPU cannot do — sorting IS the TPU's probe primitive, so the
sort's speed sets the join's speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ccve_tpu.kernels import flatvec as fv

I32_MAX = np.int32(np.iinfo(np.int32).max)
I32_MIN = np.int32(np.iinfo(np.int32).min)

# Mosaic's default 16 MB scoped-vmem cap is too small for the unrolled
# CE-stage chains (liveness keeps several whole-window temps); v5e has
# 128 MB VMEM per core.
_VMEM_BIG = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

TILE_LOG = 17  # elements per tile: [1024, 128] i32 = 512 KB
CHUNK_LOG = 13  # XLA batched pre-sort run length


def _ce_stage(x, idx, p_log: int, k_log: int, R: int):
    """One ascending compare-exchange stage at static stride 2^k_log
    over the flat [R, 128] view; `idx` = flat index within the 2p
    window structure (any array congruent mod 2p works)."""
    k = 1 << k_log
    up = fv.shift_flat_left(x, k, R)
    dn = fv.shift_flat_right(x, k, R, 0)
    m2p = idx & ((1 << (p_log + 1)) - 1)
    if k_log == p_log:
        is_lo = m2p < k
        return jnp.where(is_lo, jnp.minimum(x, up), jnp.maximum(x, dn))
    bitk = (idx & k) != 0
    is_lo = bitk & (m2p < (1 << (p_log + 1)) - k)
    is_hi = (~bitk) & (m2p >= k)
    return jnp.where(
        is_lo,
        jnp.minimum(x, up),
        jnp.where(is_hi, jnp.maximum(x, dn), x),
    )


# ---------------------------------------------------------------------------
# Phase 2: tile-local Batcher levels (runs CHUNK .. TILE), static masks
# ---------------------------------------------------------------------------


def _make_local_kernel(tile_log: int, chunk_log: int):
    R = 1 << (tile_log - 7)

    def kernel(x_ref, o_ref):
        x = x_ref[:]
        idx = fv.flat_index(R)  # tile-aligned windows: local == global
        for p_log in range(chunk_log, tile_log):
            for k_log in range(p_log, -1, -1):
                x = _ce_stage(x, idx, p_log, k_log, R)
        o_ref[:] = x

    return kernel


# ---------------------------------------------------------------------------
# Phase 3: merge-path levels (runs TILE .. n) — one linear pass each
# ---------------------------------------------------------------------------


def _merge_splits(y, run_log: int, n_tiles: int, tile_log: int, n_pad: int):
    """For each output tile t of the level merging sorted runs of
    2^run_log: the merge-path split (a_t, b_t) with a_t + b_t = the
    tile's diagonal. 24-iteration vectorized bisection over all tiles
    at once; out-of-range probes read as ∓INF. Returns ABSOLUTE element
    offsets into y."""
    L = 1 << run_log
    tile = 1 << tile_log
    t = jnp.arange(n_tiles, dtype=jnp.int32)
    gpos = t * tile  # global output position of the tile start
    pair = gpos // (2 * L)
    d = gpos - pair * 2 * L  # diagonal within the pair, in [0, 2L)
    a_base = pair * 2 * L
    b_base = a_base + L

    def fetch(base, off):
        # y[base + off] with run-relative bounds: +INF at or past the
        # run end (off >= L — e.g. the B[d-a] probe at a = d-L — or past
        # n_pad, a virtual pad run), -INF below 0 (the A[-1] probe)
        idx = base + off
        v = jnp.take(y, jnp.clip(idx, 0, n_pad - 1), mode="clip")
        v = jnp.where((off >= L) | (idx >= n_pad), I32_MAX, v)
        return jnp.where(off < 0, I32_MIN, v)

    # find max a in [lo0, hi0] with A[a-1] <= B[d-a]  (then B[b-1] < A[a])
    lo = jnp.maximum(d - L, 0)
    hi = jnp.minimum(d, L)

    def body(_, lohif):
        lo, hi = lohif
        mid = (lo + hi + 1) >> 1
        ok = fetch(a_base, mid - 1) <= fetch(b_base, d - mid)
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid - 1)

    lo, hi = jax.lax.fori_loop(0, run_log + 2, body, (lo, hi))
    a = lo
    return a_base + a, b_base + (d - a)


def _make_merge_kernel(tile_log: int, rows: int):
    """Merge-path kernel: one output tile per grid step. Scalar-prefetch
    arrays give each side's absolute split offset and run-end. Each side
    loads an [R+8, 128] row-aligned window and ALIGNS it in-register
    (one dynamic flat shift by split mod 128), so the two merge halves
    start exactly at their splits — a half therefore always holds a full
    tile of its run, with +INF past the run end / array end (the fill
    both the shift and the run-end mask produce). The halves odd-even-
    merge in-register (tile_log+1 static stages); the first half of the
    result is the output tile. One compiled kernel serves every level
    (the level enters only through the prefetched offsets)."""
    R = 1 << (tile_log - 7)
    Rw = R + 8  # slack rows: the alignment shift consumes < 128 elems
    R2 = 2 * R

    def kernel(a_off_r, b_off_r, a_end_r, b_end_r, y_hbm, o_ref, wa, wb,
               sema, semb):
        t = pl.program_id(0)
        a_off, b_off = a_off_r[t], b_off_r[t]
        a_end, b_end = a_end_r[t], b_end_r[t]
        # clamp into the padded buffer: a fully-virtual run (base past
        # n_pad) reads the +INF slack; its run-end mask voids the values
        ra = jnp.minimum(jax.lax.shift_right_logical(a_off, 7), rows)
        rb = jnp.minimum(jax.lax.shift_right_logical(b_off, 7), rows)
        ca = pltpu.make_async_copy(y_hbm.at[pl.ds(ra, Rw)], wa, sema)
        cb = pltpu.make_async_copy(y_hbm.at[pl.ds(rb, Rw)], wb, semb)
        ca.start()
        cb.start()
        ca.wait()
        cb.wait()

        a = fv.shift_flat_left_dyn(wa[...], a_off & 127, Rw, I32_MAX)[0:R]
        b = fv.shift_flat_left_dyn(wb[...], b_off & 127, Rw, I32_MAX)[0:R]
        flat = fv.flat_index(R)
        a = jnp.where(flat >= a_end - a_off, I32_MAX, a)
        b = jnp.where(flat >= b_end - b_off, I32_MAX, b)

        x = jnp.concatenate([a, b], axis=0)
        idx2 = fv.flat_index(R2)
        # odd-even merge of two sorted 2^tile_log halves: p = tile
        for k_log in range(tile_log, -1, -1):
            x = _ce_stage(x, idx2, tile_log, k_log, R2)
        o_ref[...] = x[0:R]

    return kernel


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("tile_log", "chunk_log"))
def _sort_padded(x, tile_log: int, chunk_log: int):
    """Sort i32[n_pad] (n_pad a multiple of TILE, +INF-padded)."""
    tile = 1 << tile_log
    n_pad = x.shape[0]
    nt = n_pad // tile
    rows = n_pad // 128
    R = tile // 128

    # phase 1: XLA batched pre-sort of CHUNK-length runs
    y = jax.lax.sort(
        [x.reshape(-1, 1 << chunk_log)], dimension=1, num_keys=1
    )[0].reshape(rows, 128)

    with jax.enable_x64(False):
        # phase 2: tile-local levels
        if tile_log > chunk_log:
            spec = pl.BlockSpec(
                (R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
            y = pl.pallas_call(
                _make_local_kernel(tile_log, chunk_log),
                grid=(nt,),
                in_specs=[spec],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
                compiler_params=_VMEM_BIG,
            )(y)

    # phase 3: merge-path levels
    n_levels = max(nt - 1, 0).bit_length()  # ceil(log2(nt))
    Rw = R + 8
    merge_kernel = _make_merge_kernel(tile_log, rows)
    for lvl in range(n_levels):
        run_log = tile_log + lvl
        L = 1 << run_log
        yf = y.reshape(-1)
        a_off, b_off = _merge_splits(yf, run_log, nt, tile_log, n_pad)
        pair = (jnp.arange(nt, dtype=jnp.int32) * tile) // (2 * L)
        a_end = jnp.minimum(pair * 2 * L + L, n_pad)
        b_end = jnp.minimum(pair * 2 * L + 2 * L, n_pad)
        # Rw rows of +INF slack so any in-range window read is valid
        ypad = jnp.concatenate(
            [y, jnp.full((Rw, 128), I32_MAX, jnp.int32)], axis=0
        )
        with jax.enable_x64(False):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
                grid=(nt,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(
                    (R, 128),
                    lambda t, *_: (t, 0),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[
                    pltpu.VMEM((Rw, 128), jnp.int32),
                    pltpu.VMEM((Rw, 128), jnp.int32),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA,
                ],
            )
            y = pl.pallas_call(
                merge_kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
                compiler_params=_VMEM_BIG,
            )(
                a_off.astype(jnp.int32),
                b_off.astype(jnp.int32),
                a_end.astype(jnp.int32),
                b_end.astype(jnp.int32),
                ypad,
            )

    return y.reshape(-1)


def _merge_splits_two(y, nA: int, nB: int, n_tiles: int, tile_log: int,
                      n_pad: int):
    """Merge-path splits for ONE level merging two sorted runs of
    UNEQUAL lengths: A = y[0:nA], B = y[nA:nA+nB]. Same bisection as
    `_merge_splits` with per-side run lengths. Returns absolute element
    offsets (a_off, b_off) per output tile."""
    tile = 1 << tile_log
    t = jnp.arange(n_tiles, dtype=jnp.int32)
    d = t * tile  # diagonal = global output position of the tile start

    def fetch(base, off, L):
        idx = base + off
        v = jnp.take(y, jnp.clip(idx, 0, n_pad - 1), mode="clip")
        v = jnp.where((off >= L) | (idx >= n_pad), I32_MAX, v)
        return jnp.where(off < 0, I32_MIN, v)

    lo = jnp.maximum(d - nB, 0)
    hi = jnp.minimum(d, nA)

    def body(_, lohif):
        lo, hi = lohif
        mid = (lo + hi + 1) >> 1
        ok = fetch(0, mid - 1, nA) <= fetch(nA, d - mid, nB)
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid - 1)

    n_iter = max(nA, nB).bit_length() + 1
    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    return lo, nA + (d - lo)


@functools.partial(jax.jit, static_argnames=("tile_log",))
def _merge_two_padded(a, b, tile_log: int):
    """One merge-path level over pre-sorted A (len multiple of 128) and
    pre-sorted B: returns sorted concat, +INF-padded to a tile multiple."""
    tile = 1 << tile_log
    R = tile // 128
    Rw = R + 8
    nA, nB = a.shape[0], b.shape[0]
    n = nA + nB
    n_pad = n + ((-n) % tile)
    nt = n_pad // tile
    rows = n_pad // 128
    y = jnp.concatenate(
        [a, b, jnp.full(n_pad - n, I32_MAX, jnp.int32)]
    )
    a_off, b_off = _merge_splits_two(y, nA, nB, nt, tile_log, n_pad)
    a_end = jnp.full((nt,), nA, jnp.int32)
    b_end = jnp.full((nt,), n, jnp.int32)
    ypad = jnp.concatenate(
        [y.reshape(rows, 128), jnp.full((Rw, 128), I32_MAX, jnp.int32)],
        axis=0,
    )
    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(nt,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (R, 128), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((Rw, 128), jnp.int32),
                pltpu.VMEM((Rw, 128), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        )
        out = pl.pallas_call(
            _make_merge_kernel(tile_log, rows),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
            compiler_params=_VMEM_BIG,
        )(
            a_off.astype(jnp.int32),
            b_off.astype(jnp.int32),
            a_end,
            b_end,
            ypad,
        )
    return out.reshape(-1)


def merge_sorted_i32(
    a: jax.Array, b: jax.Array, tile_log: int = TILE_LOG
) -> jax.Array:
    """Merge two ASCENDING-sorted i32 arrays (ties: A's elements first)
    in one linear merge-path pass — the count-side join uses this to
    fold the PRE-SORTED build stream into the sorted probe stream
    without paying for it inside the 16M sort (the reference's
    counterpart keeps its table pre-organized for probing,
    chaining_ht.cpp:176-377; here 'pre-organized' = pre-sorted).
    Values must lie strictly inside (INT32_MIN, INT32_MAX); lengths are
    arbitrary (the kernel's split offsets are element-granular)."""
    n = a.shape[0] + b.shape[0]
    if n <= (1 << tile_log) or a.shape[0] == 0 or b.shape[0] == 0:
        return jax.lax.sort([jnp.concatenate([a, b])], num_keys=1)[0]
    return _merge_two_padded(a, b, tile_log)[:n]


def pallas_sort_i32(
    x: jax.Array, tile_log: int = TILE_LOG, chunk_log: int = CHUNK_LOG
) -> jax.Array:
    """Ascending sort of i32[n]. Hybrid XLA-batched + Batcher/merge-path
    passes; ~2x XLA's flat sort at 17M on v5e. Values must be strictly
    inside (INT32_MIN, INT32_MAX) — both serve as sentinels (the packed
    join streams are non-negative and < 2^31 - 1)."""
    n = x.shape[0]
    tile = 1 << tile_log
    if n <= (1 << chunk_log):
        return jax.lax.sort([x], num_keys=1)[0]
    pad = (-n) % tile
    if pad:
        x = jnp.concatenate([x, jnp.full(pad, I32_MAX, jnp.int32)])
    return _sort_padded(x, tile_log, chunk_log)[:n]
