"""Hybrid sort — XLA's batched sort for short runs, Pallas odd-even
merge networks in VMEM, and merge-path passes across HBM.

Measured on v5e (PERF_NOTES.md): XLA's flat sort of 17M i32 runs ~54 ms
device-time, but its BATCHED sort of the same data as [2176, 8192] rows
takes ~11 ms, and a Pallas compare-exchange (CE) stage over the whole
array costs ~0.06 ms. This module composes those fast pieces:

  1. pad to a multiple of TILE = 2^17; in-VMEM Pallas Batcher presort
     (levels 0..13) -> sorted 8K runs                        (~11.7 ms,
     vs ~16 ms for XLA's batched [*, 8192] sort of the same data)
  2. ONE block-local Pallas pass of Batcher odd-even merge levels:
     runs 2^13 -> 2^17. Merge windows stay TILE-aligned, so the CE
     masks are static and every comparison is ascending (min to the
     lower index) — no reversals, no data-dependent control    (~4 ms)
  3. MERGE-PATH levels, runs 2^17 -> n: one linear pass per level.
     A vectorized bisection (inside the jit) finds, for each
     2^17-element output tile, the split (a_t, b_t) of its run pair;
     the kernel DMAs one [1024, 128] window from each side and emits
     exactly one output tile via the BITONIC LOWER-HALF extraction:
     with odd-indexed runs stored DESCENDING (maintained level to
     level by a parity NOT — ascending-sort of ~x IS descending-sort
     of x), the flipped pairing min(A[i], B_logical[T-1-i]) is an
     ELEMENT-ALIGNED min of the two stored windows; the result is
     bitonic, and tile_log (17) halver stages over ONE tile sort it —
     vs tile_log+1 (18) odd-even stages over TWO tiles for the naive
     merge that computes the upper half only to discard it. Each
     level reads and writes the array once — O(n) per level instead
     of the O(n log n) of cross-block CE stages.

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


def _make_local_kernel(
    tile_log: int,
    chunk_log: int,
    top_log: int | None = None,
    alt_in: bool = False,
    alt_out: bool = False,
):
    """Batcher levels p in [chunk_log, top_log) over [2^(tile_log-7), 128]
    blocks — sorts each 2^top_log-aligned window, assuming 2^chunk_log
    runs are already sorted. top_log defaults to tile_log; chunk_log = 0
    sorts from scratch (the in-VMEM presort).

    `alt_in` / `alt_out` implement the alternating-orientation storage
    the bitonic merge-path levels need (odd TILES stored descending):
    ascending-sort of ~x is descending-sort of x, so odd tiles are
    bitwise-NOTted on entry to the first phase (alt_in) and NOTted back
    on exit from the last (alt_out) — in between the stored values are
    the complements, on which every stage runs unchanged."""
    R = 1 << (tile_log - 7)
    top = tile_log if top_log is None else top_log

    def kernel(x_ref, o_ref):
        x = x_ref[:]
        m = -(pl.program_id(0) & 1)
        if alt_in:
            x = x ^ m
        idx = fv.flat_index(R)  # tile-aligned windows: local == global
        for p_log in range(chunk_log, top):
            for k_log in range(p_log, -1, -1):
                x = _ce_stage(x, idx, p_log, k_log, R)
        if alt_out:
            x = x ^ m
        o_ref[:] = x

    return kernel


# ---------------------------------------------------------------------------
# Phase 3: merge-path levels (runs TILE .. n) — one linear pass each
# ---------------------------------------------------------------------------


def _bitonic_stage(x, idx, k_log: int, R: int):
    """One halver stage of the bitonic merger at static stride 2^k_log:
    position i pairs with i ^ 2^k_log; min to the cleared-bit side.
    tile_log such stages (k_log = tile_log-1 .. 0) sort any bitonic
    sequence of 2^tile_log elements ascending."""
    k = 1 << k_log
    up = fv.shift_flat_left(x, k, R)
    dn = fv.shift_flat_right(x, k, R, 0)
    is_lo = (idx & k) == 0
    return jnp.where(is_lo, jnp.minimum(x, up), jnp.maximum(x, dn))


def _merge_splits_alt(y, run_log: int, n_tiles: int, tile_log: int,
                      n_pad: int, force_asc: bool = False):
    """Merge-path splits for one bitonic level over alternating-
    orientation runs of 2^run_log: even runs (A) stored ascending, odd
    runs (B) stored DESCENDING. The bisection runs on LOGICAL ascending
    values — a descending run's logical element j lives at stored
    position base + La-1-j, where La = its stored (non-virtual) length.
    Returns, per output tile: the A window's absolute stored start and
    its valid element count, the B window's absolute stored start and
    its +INF front count, and the output run's orientation mask (0
    ascending / -1 descending — tile written as complements)."""
    L = 1 << run_log
    tile = 1 << tile_log
    t = jnp.arange(n_tiles, dtype=jnp.int32)
    gpos = t * tile  # global output position of the tile start
    pair = gpos // (2 * L)
    q0 = gpos - pair * 2 * L  # tile start WITHIN the output run's storage
    a_base = pair * 2 * L
    b_base = a_base + L
    La = jnp.clip(n_pad - b_base, 0, L)  # stored length of the B run
    # Truncated runs store their SMALLEST La elements (desc runs in
    # reverse), so a desc output tile at stored offset q0 holds logical
    # merged elements [Lo-q0-tile, Lo-q0) reversed (Lo = the output
    # run's stored length) — its merge diagonal counts from that end.
    Lo = jnp.clip(n_pad - a_base, 0, 2 * L)
    # force_asc: the level's LAST pass may write every output run
    # ascending (out_m = 0, diagonal from the front) — free, and it
    # leaves an early-stopped buffer (n_levels_cap) directly consumable
    # by forward scanners
    desc_out = jnp.where(
        jnp.bool_(not force_asc), (pair & 1) == 1, False
    )
    d = jnp.where(desc_out, Lo - q0 - tile, q0)

    # sentinels from the key dtype: the bisection also serves the 64-bit
    # limb sorts (pairsort), which hand it reconstructed int64 keys
    KMAX = jnp.asarray(jnp.iinfo(y.dtype).max, y.dtype)
    KMIN = jnp.asarray(jnp.iinfo(y.dtype).min, y.dtype)

    def fetch_a(off):
        idx = a_base + off
        v = jnp.take(y, jnp.clip(idx, 0, n_pad - 1), mode="clip")
        v = jnp.where((off >= L) | (idx >= n_pad), KMAX, v)
        return jnp.where(off < 0, KMIN, v)

    def fetch_b(off):
        idx = b_base + La - 1 - off
        v = jnp.take(y, jnp.clip(idx, 0, n_pad - 1), mode="clip")
        v = jnp.where(off >= La, KMAX, v)
        return jnp.where(off < 0, KMIN, v)

    # find max a in [lo0, hi0] with A[a-1] <= B[d-a]  (then B[b-1] < A[a])
    lo = jnp.maximum(d - L, 0)
    hi = jnp.minimum(d, L)

    def body(_, lohif):
        lo, hi = lohif
        mid = (lo + hi + 1) >> 1
        ok = fetch_a(mid - 1) <= fetch_b(d - mid)
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid - 1)

    lo, hi = jax.lax.fori_loop(0, run_log + 2, body, (lo, hi))
    a = lo
    sb = d - a
    a_off = a_base + a
    a_rem = jnp.clip(jnp.minimum(a_base + L, n_pad) - a_off, 0, tile)
    # stored window of B's flipped logical slice [sb, sb+tile): it ENDS
    # at stored position base + La-1-sb, so it starts tile-1 earlier;
    # logical offsets >= La are +INF and sit at the window's FRONT
    b_off = jnp.maximum(b_base + La - sb - tile, 0)
    b_front = jnp.clip(sb + tile - La, 0, tile)
    out_m = jnp.where(desc_out, -1, 0)
    return (
        a_off.astype(jnp.int32),
        a_rem.astype(jnp.int32),
        b_off.astype(jnp.int32),
        b_front.astype(jnp.int32),
        out_m.astype(jnp.int32),
    )


def _make_bitonic_merge_kernel(tile_log: int, rows: int,
                               n_real: int | None = None):
    """Bitonic lower-half merge-path kernel: one output tile per grid
    step. Loads the A window (ascending run, +INF past a_rem) and the B
    window (descending-stored run — its stored order IS the flipped
    ascending order the pairing needs; +INF for the first b_front
    slots), takes the element-aligned min — a bitonic sequence whose
    sort is exactly the tile's T smallest elements — and sorts it with
    tile_log halver stages. out_m = -1 complements in/out so odd output
    runs land stored-descending without any in-register flip (the half
    the naive odd-even merge computed and discarded is gone: tile_log
    stages over ONE tile vs tile_log+1 over two).

    `rows` bounds the DMA start row (the buffer has rows + Rw rows).
    With `n_real` set, grid steps t >= n_real write a +INF tile instead
    — the level's output carries its own end slack, so the next level
    needs no fresh concatenation."""
    R = 1 << (tile_log - 7)
    Rw = R + 8  # slack rows: the alignment shift consumes < 128 elems

    def kernel(a_off_r, a_rem_r, b_off_r, b_front_r, out_m_r, y_hbm,
               o_ref, wa, wb, sema, semb):
        t = pl.program_id(0)

        @pl.when(t < n_real if n_real is not None else t >= 0)
        def _merge():
            a_off, b_off = a_off_r[t], b_off_r[t]
            a_rem, b_front, m = a_rem_r[t], b_front_r[t], out_m_r[t]
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
            a = jnp.where(flat >= a_rem, I32_MAX, a)
            b = jnp.where(flat < b_front, I32_MAX, b)

            x = jnp.minimum(a, b) ^ m
            for k_log in range(tile_log - 1, -1, -1):
                x = _bitonic_stage(x, flat, k_log, R)
            o_ref[...] = x ^ m

        if n_real is not None:

            @pl.when(t >= n_real)
            def _slack():
                o_ref[...] = jnp.full((R, 128), I32_MAX, jnp.int32)

    return kernel


def _make_carried_merge_kernel(tile_log: int, rows: int, n_real: int,
                               run_log: int, n_pad: int,
                               force_asc: bool):
    """Bitonic lower-half merge level with CARRIED SMEM cursors instead
    of merge-path splits. TPU grids execute sequentially, so each output
    tile advances (pos1, pos2) for the next one — the XLA-side 24-step
    bisection (8 per-element gathers per output tile, ~0.2 ms/level at
    16M) and its 5 scalar-prefetch operands disappear entirely.

    The crossover the bisection used to find falls out of the pairing:
    with side-1's window ascending and side-2's window read in reversed
    logical order, s1[i] - s2[i] is nondecreasing, so there is a single
    crossover c = #(s1[i] <= s2[i]) and the merged tile takes exactly
    side-1's first c and side-2's first tile-c logical elements — ONE
    compare + sum. Ties between equal values may attribute a boundary
    element to the other stream; the values are identical, so the output
    multiset is unchanged — which is why this kernel serves the KEY-ONLY
    ladder only (pairsort's cargo merges keep the bisection: swapping
    equal-keyed tuples would swap their cargo).

    Orientation contract matches _merge_splits_alt: even input runs
    stored ascending, odd stored descending; output run r stored
    descending for odd r unless `force_asc` (the ladder's last level).
    DESC-output pairs store tiles in reverse logical order, which a
    forward cursor cannot walk — so they run in COMPLEMENT space: the
    ascending merge of {~a} u {~b} walked forward IS the reversed real
    merge, and complementing swaps the sides' roles (~B is stored
    ascending, ~A reads flipped). m = -(pair&1) complements loads and
    the stored output — the same parity-NOT the whole ladder uses.
    n_pad being a tile multiple keeps every run length a tile multiple,
    so pair output lengths never straddle a tile."""
    R = 1 << (tile_log - 7)
    Rw = R + 8
    tile = 1 << tile_log
    L = 1 << run_log
    pair_shift = run_log + 1 - tile_log  # output tiles per pair

    def kernel(y_hbm, o_ref, carry, w1, w2, sem1, sem2):
        t = pl.program_id(0)

        @pl.when(t < n_real)
        def _merge():
            pair = jax.lax.shift_right_logical(t, pair_shift)

            @pl.when((t & ((1 << pair_shift) - 1)) == 0)
            def _reset():
                carry[0] = 0  # pos1: side-1 logical elements consumed
                carry[1] = 0  # pos2: side-2 logical elements consumed

            pos1 = carry[0]
            pos2 = carry[1]
            a_base = pair << (run_log + 1)
            b_base = a_base + L
            len_a = jnp.clip(n_pad - a_base, 0, L)  # stored run lengths
            len_b = jnp.clip(n_pad - b_base, 0, L)
            if force_asc:
                m = jnp.int32(0)
                swap = jnp.bool_(False)
            else:
                m = (-(pair & 1)).astype(jnp.int32)
                swap = (pair & 1) == 1
            base1 = jnp.where(swap, b_base, a_base)
            len1 = jnp.where(swap, len_b, len_a)
            base2 = jnp.where(swap, a_base, b_base)
            len2 = jnp.where(swap, len_a, len_b)

            abs1 = base1 + pos1
            valid1 = jnp.clip(len1 - pos1, 0, tile)
            valid2 = jnp.clip(len2 - pos2, 0, tile)
            # stored window of side-2's reversed logical slice [pos2,
            # pos2+tile): ENDS at stored base2 + len2-1-pos2, so it
            # starts tile-1 earlier; exhausted logical offsets sit at
            # the window's FRONT (same layout as _merge_splits_alt)
            off2 = jnp.maximum(base2 + len2 - pos2 - tile, 0)
            front2 = jnp.clip(pos2 + tile - len2, 0, tile)

            r1 = jnp.minimum(jax.lax.shift_right_logical(abs1, 7), rows)
            r2 = jnp.minimum(jax.lax.shift_right_logical(off2, 7), rows)
            c1 = pltpu.make_async_copy(y_hbm.at[pl.ds(r1, Rw)], w1, sem1)
            c2 = pltpu.make_async_copy(y_hbm.at[pl.ds(r2, Rw)], w2, sem2)
            c1.start()
            c2.start()
            c1.wait()
            c2.wait()

            s1 = fv.shift_flat_left_dyn(w1[...], abs1 & 127, Rw, I32_MAX)[0:R]
            s2 = fv.shift_flat_left_dyn(w2[...], off2 & 127, Rw, I32_MAX)[0:R]
            flat = fv.flat_index(R)
            # complement into working space FIRST, then mask with +INF
            s1 = jnp.where(flat >= valid1, I32_MAX, s1 ^ m)
            s2 = jnp.where(flat < front2, I32_MAX, s2 ^ m)

            # the indicator is a prefix property (single crossover), so
            # the count is a MAX — jnp.sum would promote its accumulator
            # to i64 at Mosaic-lowering time (PERF_NOTES gotchas)
            c = jnp.max(jnp.where(s1 <= s2, flat + 1, 0))
            taken1 = jnp.minimum(c, valid1)
            taken2 = jnp.minimum(tile - taken1, valid2)
            carry[0] = pos1 + taken1
            carry[1] = pos2 + taken2

            x = jnp.minimum(s1, s2)
            for k_log in range(tile_log - 1, -1, -1):
                x = _bitonic_stage(x, flat, k_log, R)
            o_ref[...] = x ^ m

        @pl.when(t >= n_real)
        def _slack():
            o_ref[...] = jnp.full((R, 128), I32_MAX, jnp.int32)

    return kernel


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("tile_log", "chunk_log"))
def _sort_padded(x, tile_log: int, chunk_log: int):
    return _sort_padded_buf(x, tile_log, chunk_log).reshape(-1)[: x.shape[0]]


@functools.partial(
    jax.jit,
    static_argnames=("tile_log", "chunk_log", "n_levels_cap", "carried"),
)
def _sort_padded_buf(
    x,
    tile_log: int,
    chunk_log: int,
    n_levels_cap: int | None = None,
    carried: bool = True,
):
    """Sort i32[n_pad] (n_pad a multiple of TILE, +INF-padded). Returns
    the UNSLICED [rows(+slack), 128] buffer — positions past n_pad are
    +INF (the merge levels' end slack), which downstream fused kernels
    use directly as window slack without a trim copy.

    `n_levels_cap` stops the merge ladder early: only the first cap
    merge levels run, leaving ceil(nt / 2^cap) independently sorted
    ASCENDING runs of 2^(tile_log+cap) elements each (the final
    performed level writes both outputs of every pair ascending —
    force_asc costs nothing). Callers whose consumer is additive over
    probe sub-runs (the dense-counts scan: counts per build row sum
    over any partition of the probe stream) skip ~1.3 ms per level at
    16M and re-scan the build stream once per extra run instead — see
    ops/sort_merge._count_side_bc for the cost model."""
    tile = 1 << tile_log
    n_pad = x.shape[0]
    nt = n_pad // tile
    rows = n_pad // 128
    R = tile // 128

    n_levels = max(nt - 1, 0).bit_length()  # ceil(log2(nt))
    if n_levels_cap is not None:
        n_levels = min(n_levels, n_levels_cap)
    alt = n_levels > 0  # alternate tile orientation for bitonic merges

    y = x.reshape(rows, 128)
    with jax.enable_x64(False):
        # phases 1+2 FUSED: one in-VMEM Batcher pass per tile, levels
        # 0..tile_log from scratch — one HBM round trip and one launch
        # instead of two (the split form measured 7.5 + 3.6 ms at 16M
        # in-pipeline). Odd tiles are complemented on entry and
        # un-complemented on exit (alt), leaving them stored DESCENDING
        # for the bitonic merge levels.
        spec = pl.BlockSpec(
            (R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        y = pl.pallas_call(
            _make_local_kernel(tile_log, 0, alt_in=alt, alt_out=alt),
            grid=(nt,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
            compiler_params=_VMEM_BIG,
        )(y)

    # phase 3: bitonic merge-path levels over alternating-orientation
    # runs; the final level's single output run (pair 0) is ascending.
    # The array lives in a buffer with 2R rows (>= Rw) of +INF end
    # slack the whole way: each level's grid has 2 extra steps that
    # re-emit the slack tiles, so NO per-level concatenation copies.
    Rw = R + 8
    if n_levels:
        y = jnp.concatenate(
            [y, jnp.full((2 * R, 128), I32_MAX, jnp.int32)], axis=0
        )
    merge_kernel = _make_bitonic_merge_kernel(
        tile_log, rows + R - 8, n_real=nt
    )
    pad2 = jnp.zeros(2, jnp.int32)
    for lvl in range(n_levels):
        run_log = tile_log + lvl
        # the LAST level always writes ascending runs: for a full sort
        # that's the single pair-0 run (force_asc is a no-op); for a
        # capped ladder it leaves every remaining run forward-readable
        force_asc = lvl == n_levels - 1
        if carried:
            # key-only ladder: carried SMEM cursors, no XLA bisection
            with jax.enable_x64(False):
                y = pl.pallas_call(
                    _make_carried_merge_kernel(
                        tile_log, rows + R - 8, nt, run_log, n_pad,
                        force_asc,
                    ),
                    grid=(nt + 2,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                    out_specs=pl.BlockSpec(
                        (R, 128), lambda t: (t, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    out_shape=jax.ShapeDtypeStruct(
                        (rows + 2 * R, 128), jnp.int32
                    ),
                    scratch_shapes=[
                        pltpu.SMEM((2,), jnp.int32),
                        pltpu.VMEM((Rw, 128), jnp.int32),
                        pltpu.VMEM((Rw, 128), jnp.int32),
                        pltpu.SemaphoreType.DMA,
                        pltpu.SemaphoreType.DMA,
                    ],
                    compiler_params=_VMEM_BIG,
                )(y)
            continue
        yf = y.reshape(-1)
        a_off, a_rem, b_off, b_front, out_m = _merge_splits_alt(
            yf, run_log, nt, tile_log, n_pad, force_asc=force_asc
        )
        with jax.enable_x64(False):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=5,
                grid=(nt + 2,),
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
                out_shape=jax.ShapeDtypeStruct((rows + 2 * R, 128), jnp.int32),
                compiler_params=_VMEM_BIG,
            )(
                jnp.concatenate([a_off, pad2]),
                jnp.concatenate([a_rem, pad2]),
                jnp.concatenate([b_off, pad2]),
                jnp.concatenate([b_front, pad2]),
                jnp.concatenate([out_m, pad2]),
                y,
            )

    return y


def _merge_splits_two(y, nA: int, nB: int, n_tiles: int, tile_log: int,
                      n_pad: int, base: int = 0):
    """Merge-path splits for ONE level merging two sorted runs of
    UNEQUAL lengths: A = y[base:base+nA] ascending, B the next nB
    elements stored DESCENDING (flipped by the caller so the bitonic
    kernel's pairing is element-aligned). The bisection runs on logical
    ascending B values: B[j] = y[base + nA + nB-1-j]. Returned offsets
    are base-relative. Output is a single ascending run."""
    tile = 1 << tile_log
    t = jnp.arange(n_tiles, dtype=jnp.int32)
    d = t * tile  # diagonal = global output position of the tile start

    KMAX = jnp.asarray(jnp.iinfo(y.dtype).max, y.dtype)
    KMIN = jnp.asarray(jnp.iinfo(y.dtype).min, y.dtype)

    def fetch_a(off):
        v = jnp.take(y, base + jnp.clip(off, 0, n_pad - 1), mode="clip")
        v = jnp.where(off >= nA, KMAX, v)
        return jnp.where(off < 0, KMIN, v)

    def fetch_b(off):
        idx = nA + nB - 1 - off
        v = jnp.take(y, base + jnp.clip(idx, 0, n_pad - 1), mode="clip")
        v = jnp.where(off >= nB, KMAX, v)
        return jnp.where(off < 0, KMIN, v)

    lo = jnp.maximum(d - nB, 0)
    hi = jnp.minimum(d, nA)

    def body(_, lohif):
        lo, hi = lohif
        mid = (lo + hi + 1) >> 1
        ok = fetch_a(mid - 1) <= fetch_b(d - mid)
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid - 1)

    n_iter = max(nA, nB).bit_length() + 1
    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    a = lo
    sb = d - a
    a_rem = jnp.clip(nA - a, 0, tile)
    # can be NEGATIVE by up to `tile` when B is nearly consumed (the
    # +INF front of the flipped window precedes the array) — the caller
    # offsets into ypad's +INF front slack rather than clamping, which
    # would misalign the valid tail of the window
    b_off = nA + nB - sb - tile
    b_front = jnp.clip(sb + tile - nB, 0, tile)
    zero = jnp.zeros_like(a)
    return (
        a.astype(jnp.int32),
        a_rem.astype(jnp.int32),
        b_off.astype(jnp.int32),
        b_front.astype(jnp.int32),
        zero.astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("tile_log",))
def _merge_two_padded(a, b, tile_log: int):
    """One bitonic merge-path level over pre-sorted A and pre-sorted B:
    returns sorted concat, +INF-padded to a tile multiple. B is flipped
    into descending storage first (one cheap XLA reverse of the SMALL
    side — callers pass the build stream as B) so the kernel's aligned
    min-pairing applies."""
    tile = 1 << tile_log
    R = tile // 128
    Rw = R + 8
    nA, nB = a.shape[0], b.shape[0]
    n = nA + nB
    n_pad = n + ((-n) % tile)
    nt = n_pad // tile
    rows = n_pad // 128
    # ONE assembly concat with +INF slack on BOTH sides: b_off may be
    # negative by up to `tile` (< Rw*128) when B is nearly consumed —
    # those window slots are +INF-masked, but the DMA must still have
    # rows to read
    slack = Rw * 128
    inf_slack = jnp.full(slack, I32_MAX, jnp.int32)
    ypad = jnp.concatenate(
        [
            inf_slack,
            a,
            b[::-1],
            jnp.full(n_pad - n, I32_MAX, jnp.int32),
            inf_slack,
        ]
    ).reshape(rows + 2 * Rw, 128)
    a_off, a_rem, b_off, b_front, out_m = _merge_splits_two(
        ypad.reshape(-1), nA, nB, nt, tile_log, n_pad, base=slack
    )
    splits = (a_off + slack, a_rem, b_off + slack, b_front, out_m)
    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
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
            _make_bitonic_merge_kernel(tile_log, rows + Rw),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
            compiler_params=_VMEM_BIG,
        )(*splits, ypad)
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
