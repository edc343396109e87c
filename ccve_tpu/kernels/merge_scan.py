"""Pallas fused merge-scan: all sort-merge prefix scans in one pass.

After the sort-merge join's single sort (ops/sort_merge.py), computing
per-element (mult, psum) takes four XLA scans (two cumsums, two cummaxes)
plus elementwise glue — each scan is a separate multi-pass HBM sweep
(~15 GB/s effective, measured). This kernel fuses ALL of it into one
linear pass over the sorted stream with carries in SMEM:

  per tile [8, 128] (flat order, kernels/flatvec.py):
    build tag     = LSB of the tagged payload (pay*2+1 builds, 0 probes)
    c             = running build count        (Hillis prefix + carry)
    pc            = running build payload sum  (u32-limb int64 prefix)
    run starts    = key != previous key        (shift + SMEM carry)
    base_c/base_p = prefix-max of run-start prefix values (monotone for
                    non-negative payloads — same precondition as the XLA
                    cummax path)
    mult, psum    = c - base_c, pc - base_p at probe elements

Outputs per-element mult (i32) and psum as (hi, lo) i32 limbs, combined
to int64 outside. Requires non-negative build payloads (engine payloads
are row + 10^7; callers fall back to the XLA path otherwise).

Citations: replaces the scan stage of the probe decomposition
(chaining_ht.cpp:82-136's match+gather, re-expressed over sorted runs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ccve_tpu.kernels import flatvec as fv
from ccve_tpu.kernels.bigsort import _VMEM_BIG

_R = 8
TILE = _R * 128
_ROUNDS = 10
I32_MIN = fv.I32_MIN

# SMEM carry slots
_PREV_KHI, _PREV_KLO, _C, _PC_HI, _PC_LO, _BC, _BP_HI, _BP_LO = range(8)


def _kernel(khi_ref, klo_ref, phi_ref, plo_ref, mult_ref, pshi_ref,
            pslo_ref, carry):
    """Tagged-stream form: separate key and tagged-payload limb inputs."""
    khi, klo = khi_ref[:], klo_ref[:]
    phi, plo = phi_ref[:], plo_ref[:]

    ib = plo & 1  # build tag (LSB of tagged payload)
    bphi, bplo = fv.shr1_64(phi, plo)
    is_build = ib > 0
    bphi = jnp.where(is_build, bphi, 0)
    bplo = jnp.where(is_build, bplo, 0)
    _scan_core(khi, klo, ib, is_build, bphi, bplo,
               mult_ref, pshi_ref, pslo_ref, carry)


def _make_packed_kernel(pay_bits: int):
    """Packed-stream form: ONE int64 operand (key' << pay_bits | field)
    as (hi, lo) limbs; builds have even fields (pay*2), probes the
    all-ones odd tag (ops/sort_merge packed totals convention). Decoding
    happens on-VPU, halving kernel input bandwidth vs the tagged form."""
    assert 2 <= pay_bits <= 31, pay_bits

    def kernel(shi_ref, slo_ref, mult_ref, pshi_ref, pslo_ref, carry):
        shi, slo = shi_ref[:], slo_ref[:]
        # key' = packed >> pay_bits (pay_bits < 32: spans the lo limb)
        klo = jax.lax.shift_right_logical(slo, pay_bits) | jax.lax.shift_left(
            shi, 32 - pay_bits
        )
        khi = jax.lax.shift_right_arithmetic(shi, pay_bits)
        field = slo & ((1 << pay_bits) - 1)
        is_build = (field & 1) == 0
        ib = is_build.astype(jnp.int32)
        bpay = jnp.where(
            is_build, jax.lax.shift_right_logical(field, 1), 0
        )  # < 2^30: hi limb is 0
        _scan_core(khi, klo, ib, is_build, jnp.zeros_like(bpay), bpay,
                   mult_ref, pshi_ref, pslo_ref, carry)

    return kernel


def _scan_core(khi, klo, ib, is_build, bphi, bplo,
               mult_ref, pshi_ref, pslo_ref, carry):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry[_C] = 0
        carry[_PC_HI] = 0
        carry[_PC_LO] = 0
        carry[_BC] = I32_MIN
        carry[_BP_HI] = I32_MIN
        carry[_BP_LO] = 0
        carry[_PREV_KHI] = 0
        carry[_PREV_KLO] = 0

    # running build count / payload sum
    c = fv.prefix_sum_i32(ib, _R, _ROUNDS) + carry[_C]
    pchi_l, pclo_l = fv.prefix_sum_64(bphi, bplo, _R, _ROUNDS)
    pchi, pclo = fv.add64(
        pchi_l, pclo_l,
        jnp.full((_R, 128), carry[_PC_HI], jnp.int32),
        jnp.full((_R, 128), carry[_PC_LO], jnp.int32),
    )

    # run starts: key != previous key (carry the last key of the prev tile)
    flat = fv.flat_index(_R)
    pkhi = fv.shift_flat_right(khi, 1, _R, 0)
    pklo = fv.shift_flat_right(klo, 1, _R, 0)
    pkhi = jnp.where(flat == 0, carry[_PREV_KHI], pkhi)
    pklo = jnp.where(flat == 0, carry[_PREV_KLO], pklo)
    run_start = (khi != pkhi) | (klo != pklo)
    run_start = run_start | ((flat == 0) & (i == 0))

    # per-run bases via prefix max of run-start prefix values
    cx = c - ib
    base_c = jnp.maximum(
        fv.prefix_max_i32(jnp.where(run_start, cx, I32_MIN), _R, _ROUNDS),
        carry[_BC],
    )
    pcx_hi, pcx_lo = fv.sub64(pchi, pclo, bphi, bplo)
    sp_hi = jnp.where(run_start, pcx_hi, I32_MIN)
    sp_lo = jnp.where(run_start, pcx_lo, 0)
    bm_hi, bm_lo = fv.prefix_max_64(sp_hi, sp_lo, _R, _ROUNDS)
    base_p_hi, base_p_lo = fv.max64(
        bm_hi, bm_lo,
        jnp.full((_R, 128), carry[_BP_HI], jnp.int32),
        jnp.full((_R, 128), carry[_BP_LO], jnp.int32),
    )

    probe = ~is_build
    mult_ref[:] = jnp.where(probe, c - base_c, 0)
    ps_hi, ps_lo = fv.sub64(pchi, pclo, base_p_hi, base_p_lo)
    pshi_ref[:] = jnp.where(probe, ps_hi, 0)
    pslo_ref[:] = jnp.where(probe, ps_lo, 0)

    # carries from the tile's last element
    carry[_PREV_KHI] = khi[_R - 1, 127]
    carry[_PREV_KLO] = klo[_R - 1, 127]
    carry[_C] = c[_R - 1, 127]
    carry[_PC_HI] = pchi[_R - 1, 127]
    carry[_PC_LO] = pclo[_R - 1, 127]
    carry[_BC] = base_c[_R - 1, 127]
    carry[_BP_HI] = base_p_hi[_R - 1, 127]
    carry[_BP_LO] = base_p_lo[_R - 1, 127]


def _call(n_tiles, rows, khi, klo, phi, plo):
    spec = pl.BlockSpec((_R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.int32)] * 3,
        scratch_shapes=[pltpu.SMEM((8,), jnp.int32)],
    )(khi, klo, phi, plo)


def merge_scan_stats(sk: jax.Array, st: jax.Array):
    """Per-element (mult int32[n], psum int64[n]) from the sorted merged
    stream: sk = sorted keys, st = tagged payloads (build: pay*2+1,
    probe: 0), both int64. Build payloads must be non-negative."""
    n = sk.shape[0]
    pad = (-n) % TILE
    if pad:
        sk = jnp.concatenate(
            [sk, jnp.full(pad, jnp.iinfo(jnp.int64).max, jnp.int64)]
        )
        st = jnp.concatenate([st, jnp.zeros(pad, jnp.int64)])

    def split(x):
        u = x.astype(jnp.uint64)
        lo = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32).astype(jnp.int32)
        hi = (u >> jnp.uint64(32)).astype(jnp.uint32).astype(jnp.int32)
        return hi, lo

    khi, klo = split(sk)
    phi, plo = split(st)
    return merge_scan_stats_limbs(khi, klo, phi, plo, n)


def merge_scan_stats_limbs(khi, klo, phi, plo, n: int | None = None,
                           return_planes: bool = False):
    """`merge_scan_stats` on PRE-SPLIT (hi, lo) i32 planes — run
    identity is EQUALITY on the key planes and the tag lives in the
    payload planes (build: pay*2+1, probe: 0), so any bijective
    bit-split of the key works verbatim (e.g. the wide split-plane
    route's (s1, s2) planes). Skips the emulated-int64 split the int64
    entry pays; `return_planes` also skips the int64 psum reconstruct,
    handing back (mult, ps_hi, ps_lo) i32 planes for callers that feed
    them straight into a plane sort (the unsort). `n` trims outputs."""
    total = khi.shape[0]
    n = total if n is None else n
    pad = (-total) % TILE
    if pad:
        khi = jnp.concatenate(
            [khi, jnp.full(pad, jnp.int32(2**31 - 1), jnp.int32)]
        )
        klo = jnp.concatenate([klo, jnp.full(pad, -1, jnp.int32)])
        phi = jnp.concatenate([phi, jnp.zeros(pad, jnp.int32)])
        plo = jnp.concatenate([plo, jnp.zeros(pad, jnp.int32)])
    rows = khi.shape[0] // 128
    r = lambda x: x.reshape(rows, 128)

    with jax.enable_x64(False):
        mult, ps_hi, ps_lo = _call(
            rows // _R, rows, r(khi), r(klo), r(phi), r(plo)
        )

    mult = mult.reshape(-1)[:n]
    if return_planes:
        return mult, ps_hi.reshape(-1)[:n], ps_lo.reshape(-1)[:n]
    hi = ps_hi.reshape(-1)[:n].astype(jnp.uint32).astype(jnp.uint64)
    lo = ps_lo.reshape(-1)[:n].astype(jnp.uint32).astype(jnp.uint64)
    psum = ((hi << jnp.uint64(32)) | lo).astype(jnp.int64)
    return mult, psum


# ---------------------------------------------------------------------------
# Row-stats i32 form: the pair-plane stream (kernels/pairsort.py) of
# `sorted_match_stats` — key' << 1 | tag (build 0 / probe 1) plus the
# payload-or-row i32 cargo plane — scanned in ONE pass that also emits
# the UNSORT-ready planes (key2 = probe row id, builds/phantoms keyed a
# sentinel that sorts past the [:n] window), replacing ~6 XLA HBM sweeps
# ---------------------------------------------------------------------------

_S32_PREV, _S32_C, _S32_PCHI, _S32_PCLO, _S32_BC, _S32_BPHI, _S32_BPLO = (
    range(7)
)
_I32_MAX = 2**31 - 1


def _make_stats32_kernel(n_sentinel: int, mult_bits: int | None = None):
    """Requires non-negative build payloads (the cummax base trick —
    callers with allow_negative use the XLA segmented scan instead) and
    real packed keys strictly below INT32_MAX (key_bits <= 29 gate), so
    s == INT32_MAX identifies sort-padding phantoms exactly.

    With `mult_bits` set (caller guarantees psum < 2^(31 - mult_bits)
    and mult < 2^mult_bits from the static pack/max_mult metadata), the
    kernel emits TWO planes — key2 and (psum << mult_bits) | mult — so
    the unsort sort carries one cargo plane instead of three."""

    def kernel(s_ref, v_ref, *out_and_carry):
        if mult_bits is None:
            key2_ref, mult_ref, pshi_ref, pslo_ref, carry = out_and_carry
        else:
            key2_ref, packed_ref, carry = out_and_carry
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry[_S32_PREV] = -1  # packed keys >= 0: forces a run start
            carry[_S32_C] = 0
            carry[_S32_PCHI] = 0
            carry[_S32_PCLO] = 0
            carry[_S32_BC] = I32_MIN
            carry[_S32_BPHI] = I32_MIN
            carry[_S32_BPLO] = 0

        s = s_ref[:]
        v = v_ref[:]
        is_build = (s & 1) == 0
        ib = is_build.astype(jnp.int32)
        bplo = jnp.where(is_build, v, 0)  # non-negative: hi limb is 0

        c = fv.prefix_sum_i32(ib, _R, _ROUNDS) + carry[_S32_C]
        pchi_l, pclo_l = fv.prefix_sum_64(
            jnp.zeros_like(bplo), bplo, _R, _ROUNDS
        )
        pchi, pclo = fv.add64(
            pchi_l,
            pclo_l,
            jnp.full((_R, 128), carry[_S32_PCHI], jnp.int32),
            jnp.full((_R, 128), carry[_S32_PCLO], jnp.int32),
        )

        key = jax.lax.shift_right_arithmetic(s, 1)
        flat = fv.flat_index(_R)
        prev = fv.shift_flat_right(key, 1, _R, 0)
        prev = jnp.where(flat == 0, carry[_S32_PREV], prev)
        run_start = key != prev

        cx = c - ib
        base_c = jnp.maximum(
            fv.prefix_max_i32(jnp.where(run_start, cx, I32_MIN), _R, _ROUNDS),
            carry[_S32_BC],
        )
        pcx_hi, pcx_lo = fv.sub64(pchi, pclo, jnp.zeros_like(bplo), bplo)
        bm_hi, bm_lo = fv.prefix_max_64(
            jnp.where(run_start, pcx_hi, I32_MIN),
            jnp.where(run_start, pcx_lo, 0),
            _R,
            _ROUNDS,
        )
        base_p_hi, base_p_lo = fv.max64(
            bm_hi,
            bm_lo,
            jnp.full((_R, 128), carry[_S32_BPHI], jnp.int32),
            jnp.full((_R, 128), carry[_S32_BPLO], jnp.int32),
        )

        probe = ~is_build
        mult = jnp.where(probe, c - base_c, 0)
        ps_hi, ps_lo = fv.sub64(pchi, pclo, base_p_hi, base_p_lo)
        if mult_bits is None:
            mult_ref[:] = mult
            pshi_ref[:] = jnp.where(probe, ps_hi, 0)
            pslo_ref[:] = jnp.where(probe, ps_lo, 0)
        else:
            packed_ref[:] = jnp.where(
                probe, jax.lax.shift_left(ps_lo, mult_bits) | mult, 0
            )
        key2_ref[:] = jnp.where(
            is_build | (s == jnp.int32(_I32_MAX)),
            jnp.int32(n_sentinel),
            v,
        )

        carry[_S32_PREV] = key[_R - 1, 127]
        carry[_S32_C] = c[_R - 1, 127]
        carry[_S32_PCHI] = pchi[_R - 1, 127]
        carry[_S32_PCLO] = pclo[_R - 1, 127]
        carry[_S32_BC] = base_c[_R - 1, 127]
        carry[_S32_BPHI] = base_p_hi[_R - 1, 127]
        carry[_S32_BPLO] = base_p_lo[_R - 1, 127]

    return kernel


def merge_scan_stats32(
    s: jax.Array, v: jax.Array, n_sentinel: int, mult_bits: int | None = None
):
    """(key2, mult, ps_hi, ps_lo) — or (key2, packed) when `mult_bits`
    is set — i32 planes (PADDED length: padding rows carry key2 =
    n_sentinel and zero stats, so the caller's unsort slice [:n] drops
    them for free) from the sorted i32 pair stream."""
    n = s.shape[0]
    pad = (-n) % TILE
    if pad:
        s = jnp.concatenate([s, jnp.full(pad, _I32_MAX, jnp.int32)])
        v = jnp.concatenate([v, jnp.zeros(pad, jnp.int32)])
    rows = s.shape[0] // 128
    n_out = 4 if mult_bits is None else 2
    spec = pl.BlockSpec((_R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            _make_stats32_kernel(n_sentinel, mult_bits),
            grid=(rows // _R,),
            in_specs=[spec] * 2,
            out_specs=[spec] * n_out,
            out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.int32)] * n_out,
            scratch_shapes=[pltpu.SMEM((7,), jnp.int32)],
        )(s.reshape(rows, 128), v.reshape(rows, 128))
    return tuple(o.reshape(-1) for o in outs)


# ---------------------------------------------------------------------------
# Count-side u32 form: the sort operand carries NO payload at all, and the
# kernel emits DENSE per-build-row counts (stream compaction with an
# amortized ring-buffer flush — no gather, no unsort, tiny output)
# ---------------------------------------------------------------------------

_CS_PREV, _CS_CP, _CS_BASE, _CS_W, _CS_ROW = range(5)
_CS_R = 256  # tile height: the dense kernel is grid-step-bound, not
#              VMEM-bound — 64→256 measured 7.5→5.0 ms at 17.8M on v5e
#              (ladders deepen 13→15 rounds but grid steps drop 4x)


def _counts_scan_tile(s, i, last, bc_hbm, carry, ring, stage, sem, R: int):
    """Shared count-side tile body: run scan + in-register compaction +
    ring flush over ONE merged tile `s` (see _make_counts32_dense_kernel
    for the math; also the merge-fused kernel below)."""
    tile = R * 128
    rounds = tile.bit_length() - 1
    ring_r = 2 * R

    @pl.when(i == 0)
    def _():
        carry[_CS_PREV] = -1  # packed keys >= 0: forces a run start
        carry[_CS_CP] = 0
        carry[_CS_BASE] = I32_MIN
        carry[_CS_W] = 0
        carry[_CS_ROW] = 0

    ib = s & 1
    ip = 1 - ib
    # MXU prefix beats the Hillis ladder ~5x at these tile sizes (tile
    # sums <= R*128 << 2^24, so the f32 matmuls are exact)
    cp_local = (
        fv.prefix_sum_i32_mxu(ip, R)
        if R >= 32
        else fv.prefix_sum_i32(ip, R, rounds)
    )
    cp = cp_local + carry[_CS_CP]

    key = jax.lax.shift_right_arithmetic(s, 1)
    flat = fv.flat_index(R)
    prev = fv.shift_flat_right(key, 1, R, 0)
    prev = jnp.where(flat == 0, carry[_CS_PREV], prev)
    run_start = key != prev

    cpx = cp - ip
    base = jnp.maximum(
        fv.prefix_max_i32(jnp.where(run_start, cpx, I32_MIN), R, rounds),
        carry[_CS_BASE],
    )
    pcount = jnp.where(ib > 0, cp - base, 0)

    carry[_CS_PREV] = key[R - 1, 127]
    carry[_CS_CP] = cp[R - 1, 127]
    carry[_CS_BASE] = base[R - 1, 127]

    # ---- compact this tile's build counts, append to the ring ----
    rank_b = flat + 1 - cp_local  # inclusive build rank, for free
    k_t = tile - cp_local[R - 1, 127]
    (cpc,) = fv.butterfly_compact([pcount], ib, R, rounds, rank=rank_b)

    w = carry[_CS_W]
    cpc2 = jnp.concatenate(
        [cpc, jnp.zeros((ring_r - R, 128), jnp.int32)], axis=0
    )
    shifted = fv.shift_flat_right_dyn(cpc2, w, ring_r)
    ring[...] = jnp.where(fv.flat_index(ring_r) < w, ring[...], shifted)
    w = w + k_t

    def flush():
        stage[...] = ring[0:R]
        copy = pltpu.make_async_copy(
            stage, bc_hbm.at[pl.ds(carry[_CS_ROW], R), :], sem
        )
        copy.start()
        copy.wait()
        carry[_CS_ROW] = carry[_CS_ROW] + R

    @pl.when(w >= tile)
    def _():
        flush()
        ring[...] = pltpu.roll(ring[...], R, axis=0)  # left by R rows
        carry[_CS_W] = w - tile

    @pl.when(w < tile)
    def _():
        carry[_CS_W] = w

    # final partial flush: residue < tile (junk lanes past w are
    # sliced off by the wrapper)
    @pl.when((i == last) & (carry[_CS_W] > 0))
    def _():
        flush()

    # build(+pad) count of this tile — the merged-fused kernel's B-side
    # cursor advance
    return k_t


def _make_counts32_dense_kernel(R: int):
    """Count-side scan + in-kernel compaction over the u32 packed stream
    (key' << 1 | tag; tag 1 = build, 0 = probe, so probes order before
    builds at equal key'). For the j-th build entry of the stream —
    table row j, since the table is pre-sorted and equal packed values
    are interchangeable — emits bc[j] = #probes in its run (its probe
    multiplicity), densely packed to bc_hbm.

    Compaction without overlap hazards: each tile butterfly-compacts its
    build counts in-register, appends them to a VMEM ring via a dynamic
    flat shift, and flushes exactly R full rows whenever >= R*128 values
    accumulate — ~m/(R*128) perfectly disjoint DMAs total (amortized,
    not per-tile; per-tile DMA round-trips are what sank the standalone
    compaction kernel, see kernels/compact.py + PERF_NOTES.md).

    One ladder is saved by construction: the inclusive build rank is
    flat + 1 - cp (probe count + build count = position + 1)."""
    def kernel(s_ref, bc_hbm, carry, ring, stage, sem):
        i = pl.program_id(0)
        last = pl.num_programs(0) - 1
        _counts_scan_tile(
            s_ref[:], i, last, bc_hbm, carry, ring, stage, sem, R
        )

    return kernel


def merge_scan_build_counts(
    s: jax.Array, m: int, R: int = _CS_R, extra: int = 0
):
    """Per-build-row probe multiplicities bc int32[m] from the SORTED
    i32[n] packed stream (key' << 1 | tag, tag 1 = build; the table's m
    build entries appear in table order). Padding entries (INT32_MAX =
    huge key', build tag, probe-less run) append trailing zeros that the
    [:m] slice drops. `extra` bounds ADDITIONAL phantom build entries
    already present in the stream (a padded upstream sort/merge keeps
    its +INF tail rather than paying a trim copy) so the dense output
    buffer is sized to absorb them.  Σ bc = total matches;
    dot(bc, payloads) = total matched-payload sum."""
    tile = R * 128
    n = s.shape[0]
    pad = (-n) % tile
    if pad:
        s = jnp.concatenate(
            [s, jnp.full(pad, jnp.iinfo(jnp.int32).max, jnp.int32)]
        )
    rows = s.shape[0] // 128
    s2 = s.reshape(rows, 128)
    # appended values <= m + pad + extra; round up to flush rows + slack
    out_rows = -(-(m + tile + max(extra, 0)) // 128) + R
    spec = pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        bc = pl.pallas_call(
            _make_counts32_dense_kernel(R),
            grid=(rows // R,),
            in_specs=[spec],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((out_rows, 128), jnp.int32),
            scratch_shapes=[
                pltpu.SMEM((5,), jnp.int32),
                pltpu.VMEM((2 * R, 128), jnp.int32),
                pltpu.VMEM((R, 128), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )(s2)
    return bc.reshape(-1)[:m]


# ---------------------------------------------------------------------------
# Merge-FUSED count-side form: the unequal (probe-stream, build-stream)
# merge level happens INSIDE the counts kernel — per output tile, DMA one
# window from each sorted source, take the bitonic lower half, run the
# same scan + ring compaction. Removes the merged stream's HBM write +
# read and one kernel launch vs merge_sorted_i32 → merge_scan_build_counts
# ---------------------------------------------------------------------------

_MC_R = 256
_MC_TILE_LOG = 15  # log2(_MC_R * 128)
S_B = _MC_R * 128 + 1024  # reversed-build front slack (element units)


_MC_APOS, _MC_BPOS = 5, 6


def _make_merge_counts_kernel(R: int, rows_a: int, rows_b: int,
                              nA: int, nB: int, n_real: int,
                              a_row_off: int = 0,
                              mask_a_end: bool = False):
    """Grid step t emits merged tile t via a SEQUENTIAL CARRIED MERGE:
    SMEM cursors (a_pos, b_pos) walk the two sorted streams — the A
    window (probe stream, ascending, +INF-padded buffer) and the flipped
    B window (build stream REVERSED in HBM with +INF front slack, so the
    bitonic element-aligned min pairing reads it contiguously —
    kernels/bigsort.py's lower-half trick). No merge-path splits: the
    XLA bisection they need costs ~3 ms at 17M/546 tiles (measured —
    small XLA gathers lower to per-element loops), while the cursor
    advance falls out of the scan for free (the count-side scan already
    counts the tile's probes, and ALL probes come from A; pads
    mis-assigned between the two exhausted streams in the endgame are
    value-identical +INF, and the cursors clamp)."""
    from ccve_tpu.kernels.bigsort import I32_MAX, _bitonic_stage

    Rw = R + 8
    tile = R * 128

    def kernel(abuf, bbuf, bc_hbm, carry, wa, wb, ring, stage,
               sema, semb, semf):
        t = pl.program_id(0)
        nt = pl.num_programs(0)
        last = nt - 1

        @pl.when(t == 0)
        def _():
            # carry init here (not only in _counts_scan_tile): tile 0
            # may take the pure-probe fast path, which skips the scan
            carry[_CS_PREV] = -1
            carry[_CS_CP] = 0
            carry[_CS_BASE] = I32_MIN
            carry[_CS_W] = 0
            carry[_CS_ROW] = 0
            carry[_MC_APOS] = 0
            carry[_MC_BPOS] = 0

        a_pos = carry[_MC_APOS]
        b_pos = carry[_MC_BPOS]
        e_b = (nB - b_pos - tile) + S_B  # flipped-window element offset
        ra = jnp.minimum(
            a_row_off + jax.lax.shift_right_logical(a_pos, 7), rows_a
        )
        rb = jnp.minimum(jax.lax.shift_right_logical(e_b, 7), rows_b)
        ca = pltpu.make_async_copy(abuf.at[pl.ds(ra, Rw)], wa, sema)
        cb = pltpu.make_async_copy(bbuf.at[pl.ds(rb, Rw)], wb, semb)
        ca.start()
        cb.start()
        ca.wait()
        cb.wait()

        ak = fv.shift_flat_left_dyn(wa[...], a_pos & 127, Rw, I32_MAX)[0:R]
        bk = fv.shift_flat_left_dyn(wb[...], e_b & 127, Rw, I32_MAX)[0:R]
        flat = fv.flat_index(R)
        if mask_a_end:
            # per-run invocation over a shared buffer: positions past
            # this run's end hold the NEXT run's data, not +INF slack
            ak = jnp.where(flat >= nA - a_pos, I32_MAX, ak)

        # pure-probe tile: A's window max <= B's smallest remaining, and
        # the window lies inside the REAL probes (A's sort padding is
        # build-tagged); the last tile owns the final ring flush
        pure = (
            (ak[R - 1, 127] <= bk[R - 1, 127])
            & (a_pos + tile <= n_real)
            & (t != last)
        )

        @pl.when(jnp.logical_not(pure))
        def _slow():
            x = jnp.minimum(ak, bk)
            for k_log in range(_MC_TILE_LOG - 1, -1, -1):
                x = _bitonic_stage(x, flat, k_log, R)
            k_t = _counts_scan_tile(
                x, t, last, bc_hbm, carry, ring, stage, semf, R
            )
            # cursor advance: the tile's probes all came from A; pads
            # (both sides' +INF) land on B's account and the clamps
            # absorb the endgame miscount — pad values are identical
            carry[_MC_APOS] = jnp.minimum(a_pos + (tile - k_t), nA)
            carry[_MC_BPOS] = jnp.minimum(b_pos + k_t, nB)

        @pl.when(pure)
        def _fast():
            # identity merge; closed-form scan carries — cp grows by
            # tile; base = cpx at the tile's LAST run start (cpx is
            # monotone in flat, so the prefix-max ladder is one max);
            # no builds, nothing joins the ring
            key = jax.lax.shift_right_arithmetic(ak, 1)
            prev = fv.shift_flat_right(key, 1, R, 0)
            prev = jnp.where(flat == 0, carry[_CS_PREV], prev)
            p_star = jnp.max(jnp.where(key != prev, flat, -1))
            carry[_CS_BASE] = jnp.where(
                p_star >= 0,
                jnp.maximum(carry[_CS_BASE], p_star + carry[_CS_CP]),
                carry[_CS_BASE],
            )
            carry[_CS_CP] = carry[_CS_CP] + tile
            carry[_CS_PREV] = key[R - 1, 127]
            carry[_MC_APOS] = a_pos + tile

    return kernel


def merge_counts_fused(abuf, nA: int, n_real: int, b32, m: int,
                       interpret: bool = False, a_row_off: int = 0,
                       mask_a_end: bool = False):
    """bc int32[m] from an UNMERGED pair of sorted streams:

      abuf — [rows, 128] i32 buffer whose flat slice
             [a_row_off*128, a_row_off*128 + nA) is ONE sorted probe
             run (key' << 1, even). Without `mask_a_end` the run must
             be followed by >= R+8 rows of +INF slack
             (bigsort._sort_padded_buf emits exactly this); with it,
             positions past the run are masked in-kernel, so several
             runs may share one buffer back to back (the early-stopped
             partial sort — counts are additive over probe sub-runs);
      b32  — i32[m] sorted build operands (key' << 1 | 1, odd).

    n_real = the count of REAL probes among the nA (sort padding is
    build-tagged and contributes zero counts past bc[m-1])."""
    R = _MC_R
    tile = R * 128
    if abuf.shape[0] * 128 < a_row_off * 128 + nA + (R + 8) * 128:
        # single-tile sorts carry no end slack — pad (small n, cheap)
        need = (
            -(-(a_row_off * 128 + nA + (R + 8) * 128) // 128)
            - abuf.shape[0]
        )
        abuf = jnp.concatenate(
            [
                abuf,
                jnp.full(
                    (need, 128), np.int32(np.iinfo(np.int32).max), jnp.int32
                ),
            ]
        )
    rows_a = abuf.shape[0]
    nB = m
    n_tiles = -(-(nA + nB) // tile)

    # B: reversed, +INF front slack (the flipped window's past-the-end
    # region) and tail slack for the shifted row loads
    tail = (R + 8) * 128 + ((-m) % 128)
    IMAX = np.int32(np.iinfo(np.int32).max)
    bbuf = jnp.concatenate(
        [
            jnp.full(S_B, IMAX, jnp.int32),
            b32[::-1],
            jnp.full(tail, IMAX, jnp.int32),
        ]
    ).reshape(-1, 128)

    # appended count values = all build-tagged elements = n_tiles*tile
    # minus the real probes
    out_rows = -(-(n_tiles * tile - n_real + tile) // 128) + R
    Rw = R + 8
    with jax.enable_x64(False):
        bc = pl.pallas_call(
            _make_merge_counts_kernel(
                R, rows_a - Rw, bbuf.shape[0] - Rw, nA, nB, n_real,
                a_row_off=a_row_off, mask_a_end=mask_a_end,
            ),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((out_rows, 128), jnp.int32),
            scratch_shapes=[
                pltpu.SMEM((7,), jnp.int32),
                pltpu.VMEM((Rw, 128), jnp.int32),
                pltpu.VMEM((Rw, 128), jnp.int32),
                pltpu.VMEM((2 * R, 128), jnp.int32),
                pltpu.VMEM((R, 128), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=_VMEM_BIG,
            interpret=interpret,
        )(abuf, bbuf)
    return bc.reshape(-1)[:m]


def merge_scan_stats_packed(s: jax.Array, pay_bits: int):
    """Packed-stream variant: `s` is the SORTED packed int64 array
    (key' << pay_bits | field; builds even fields = pay*2, probes the
    all-ones tag — ops/sort_merge's packed-totals convention). Decodes on
    the VPU, so only the packed limbs cross HBM. pay_bits must be < 32."""
    n = s.shape[0]
    pad = (-n) % TILE
    if pad:
        # INT64_MAX: field = all-ones tag (probe), huge key' — a
        # buildless run contributing nothing
        s = jnp.concatenate(
            [s, jnp.full(pad, jnp.iinfo(jnp.int64).max, jnp.int64)]
        )
    rows = s.shape[0] // 128
    u = s.astype(jnp.uint64)
    slo = (u & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32).astype(jnp.int32)
    shi = (u >> jnp.uint64(32)).astype(jnp.uint32).astype(jnp.int32)
    shi = shi.reshape(rows, 128)
    slo = slo.reshape(rows, 128)

    spec = pl.BlockSpec((_R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        mult, ps_hi, ps_lo = pl.pallas_call(
            _make_packed_kernel(pay_bits),
            grid=(rows // _R,),
            in_specs=[spec] * 2,
            out_specs=[spec] * 3,
            out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.int32)] * 3,
            scratch_shapes=[pltpu.SMEM((8,), jnp.int32)],
        )(shi, slo)

    mult = mult.reshape(-1)[:n]
    hi = ps_hi.reshape(-1)[:n].astype(jnp.uint32).astype(jnp.uint64)
    lo = ps_lo.reshape(-1)[:n].astype(jnp.uint32).astype(jnp.uint64)
    psum = ((hi << jnp.uint64(32)) | lo).astype(jnp.int64)
    return mult, psum


# ---------------------------------------------------------------------------
# Count-side 64-bit-key form: the wide-domain twin of
# merge_scan_build_counts — the packed stream (key' << 1 | tag) arrives
# as (hi, lo) i32 limb planes; runs compare on both limbs, all scans
# and the compaction/ring machinery stay i32
# ---------------------------------------------------------------------------

_C64_PHI, _C64_PLO, _C64_CP, _C64_BASE, _C64_W, _C64_ROW = range(6)


def _make_counts64_dense_kernel(R: int):
    """`_make_counts32_dense_kernel` with a 2-limb key: tag = lo & 1
    (1 = build, probes order first in a run by the pack), run identity
    = the packed value with the tag bit cleared, compared limb-wise.
    Everything downstream of `pcount` (butterfly compaction, VMEM ring,
    amortized row flushes) is the i32 machinery unchanged."""

    def kernel(shi_ref, slo_ref, bc_hbm, carry, ring, stage, sem):
        i = pl.program_id(0)
        last = pl.num_programs(0) - 1
        tile = R * 128
        rounds = tile.bit_length() - 1
        ring_r = 2 * R

        @pl.when(i == 0)
        def _():
            carry[_C64_PHI] = I32_MIN  # packed keys >= 0: run start
            carry[_C64_PLO] = 0
            carry[_C64_CP] = 0
            carry[_C64_BASE] = I32_MIN
            carry[_C64_W] = 0
            carry[_C64_ROW] = 0

        shi, slo = shi_ref[:], slo_ref[:]
        ib = slo & 1
        ip = 1 - ib
        cp_local = (
            fv.prefix_sum_i32_mxu(ip, R)
            if R >= 32
            else fv.prefix_sum_i32(ip, R, rounds)
        )
        cp = cp_local + carry[_C64_CP]

        klo = slo & jnp.int32(-2)  # clear the tag bit
        flat = fv.flat_index(R)
        prev_hi = fv.shift_flat_right(shi, 1, R, 0)
        prev_lo = fv.shift_flat_right(klo, 1, R, 0)
        prev_hi = jnp.where(flat == 0, carry[_C64_PHI], prev_hi)
        prev_lo = jnp.where(flat == 0, carry[_C64_PLO], prev_lo)
        run_start = (shi != prev_hi) | (klo != prev_lo)

        cpx = cp - ip
        base = jnp.maximum(
            fv.prefix_max_i32(
                jnp.where(run_start, cpx, I32_MIN), R, rounds
            ),
            carry[_C64_BASE],
        )
        pcount = jnp.where(ib > 0, cp - base, 0)

        carry[_C64_PHI] = shi[R - 1, 127]
        carry[_C64_PLO] = klo[R - 1, 127]
        carry[_C64_CP] = cp[R - 1, 127]
        carry[_C64_BASE] = base[R - 1, 127]

        # ---- compact + ring append + amortized flush (i32 machinery)
        rank_b = flat + 1 - cp_local
        k_t = tile - cp_local[R - 1, 127]
        (cpc,) = fv.butterfly_compact([pcount], ib, R, rounds, rank=rank_b)

        w = carry[_C64_W]
        cpc2 = jnp.concatenate(
            [cpc, jnp.zeros((ring_r - R, 128), jnp.int32)], axis=0
        )
        shifted = fv.shift_flat_right_dyn(cpc2, w, ring_r)
        ring[...] = jnp.where(
            fv.flat_index(ring_r) < w, ring[...], shifted
        )
        w = w + k_t

        def flush():
            stage[...] = ring[0:R]
            copy = pltpu.make_async_copy(
                stage, bc_hbm.at[pl.ds(carry[_C64_ROW], R), :], sem
            )
            copy.start()
            copy.wait()
            carry[_C64_ROW] = carry[_C64_ROW] + R

        @pl.when(w >= tile)
        def _():
            flush()
            ring[...] = pltpu.roll(ring[...], R, axis=0)
            carry[_C64_W] = w - tile

        @pl.when(w < tile)
        def _():
            carry[_C64_W] = w

        @pl.when((i == last) & (carry[_C64_W] > 0))
        def _():
            flush()

    return kernel


def merge_scan_build_counts64(
    shi: jax.Array, slo: jax.Array, m: int, R: int = _CS_R,
    extra: int = 0, interpret: bool = False,
):
    """Per-build-row probe multiplicities bc int32[m] from the SORTED
    packed-64 stream given as (hi, lo) i32 limb planes (key' << 1 | tag
    as int64; tag 1 = build; builds appear in table order). Padding
    (INT64_MAX: build tag, probe-less giant run) appends trailing zeros
    sliced off by [:m]."""
    tile = R * 128
    n = shi.shape[0]
    pad = (-n) % tile
    if pad:
        shi = jnp.concatenate(
            [shi, jnp.full(pad, jnp.iinfo(jnp.int32).max, jnp.int32)]
        )
        slo = jnp.concatenate(
            [slo, jnp.full(pad, -1, jnp.int32)]
        )
    rows = shi.shape[0] // 128
    shi2 = shi.reshape(rows, 128)
    slo2 = slo.reshape(rows, 128)
    out_rows = -(-(m + tile + max(extra, 0)) // 128) + R
    spec = pl.BlockSpec((R, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    with jax.enable_x64(False):
        bc = pl.pallas_call(
            _make_counts64_dense_kernel(R),
            grid=(rows // R,),
            in_specs=[spec, spec],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((out_rows, 128), jnp.int32),
            scratch_shapes=[
                pltpu.SMEM((6,), jnp.int32),
                pltpu.VMEM((2 * R, 128), jnp.int32),
                pltpu.VMEM((R, 128), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(shi2, slo2)
    return bc.reshape(-1)[:m]
