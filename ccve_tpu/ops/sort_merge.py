"""Sort-merge equi-join stats — the gather-free TPU probe path.

The reference's probe is random access: hash each key, chase a bucket
chain with per-key loads (chaining_ht.cpp:38-173). AVX-512 has hardware
gathers, so that maps well to x86. The TPU VPU has NO random-access
gather unit — XLA lowers `jnp.take` from a 4M-entry HBM table to ~40M
elements/s (measured; see BENCH notes), while XLA's TPU sort runs at
>200M 64-bit pairs/s. The TPU-native formulation of the same join is
therefore sort-merge over the VPU's forte — sorts and prefix scans:

 1. concat (sorted-or-not) build keys and probe keys, tagged build=0 /
    probe=1, and sort by (key, tag): within a key run, all build entries
    precede all probe entries;
 2. inclusive prefix count of build entries `c` and prefix payload sum
    `pc`; per-run bases recovered with a cummax over run-start markers
    (run-start prefix values are monotone, so a max-scan IS "latest run
    start" propagation — no gather);
 3. per probe element: mult = c - base_c, psum = pc - base_p;
 4. restore original probe order with a second sort keyed by carried row
    id (a sort is ~2x faster than the equivalent scatter on TPU).

Output (mult, psum per probe key) is exactly exec/bulk.match_stats's
contract, verified against it in tests. Requires non-negative payloads
for the cummax trick (engine payloads are row_index + 10^7,
chaining_ht.cpp:21); `sorted_match_stats(..., allow_negative=True)`
switches base-recovery to an associative segmented scan.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ccve_tpu.exec.bulk import MatchStats


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["keys", "payloads"],
    meta_fields=["pack", "pack32", "pay32", "max_mult", "span62",
                 "wide_ok", "span_bits"],
)
@dataclasses.dataclass(frozen=True)
class SortedTable:
    """A build table for the sort-merge path: rows sorted by key.

    `pack` (static aux): (key_base, key_bits, pay_bits) when the build's
    key range and payload magnitude allow packing (key', tag, payload)
    into ONE int64 sort operand — else None. Computed at build time on
    the host; the probe side is range-checked on device. `max_mult` is
    the largest key multiplicity (the reference's chunk_factor bound,
    chaining_ht.cpp:15-26) — the static fan-out of `sorted_expand`."""

    keys: jax.Array  # int64[m], ascending
    payloads: jax.Array  # int64[m], aligned with keys
    pack: tuple | None = None
    pack32: tuple | None = None
    # payloads fit an i32 bit-for-bit (static, host-checked at build):
    # gates the multi-plane Pallas stats path, where payloads ride the
    # sort as an i32 cargo plane (kernels/pairsort.py)
    pay32: bool = False
    max_mult: int = 1
    # key span < 2^62: the 64-bit tag pack (k-lo)<<1|tag stays in int64
    span62: bool = False
    # wide-key Pallas eligibility (static, host-checked at build):
    # span62 plus payloads non-negative (the fused scan's cummax base
    # trick) and i32-sized — gates the 2-plane limb-key sort paths that
    # keep >2^30-span int64 keys at kernel speed (the reference's key
    # domain is all of int64, /root/reference/base.h:54-56)
    wide_ok: bool = False
    # bit width of the TAGGED packed key' ((kmax-kmin+2) << 1 | 1),
    # host-computed at build: the static split point of the wide
    # count-side SPLIT-PLANE route (s1 = top <=30 bits, single compare
    # plane; s2 = residue cargo). None = unknown (device-built tables)
    span_bits: int | None = None


def _pack_meta(keys: np.ndarray, payloads: np.ndarray):
    if keys.size == 0 or payloads.min(initial=0) < 0:
        return None
    kmin, kmax = int(keys.min()), int(keys.max())
    # probe keys clamp into [kmin-1, kmax+1]; field must hold range+2
    key_range = kmax - kmin + 2
    key_bits = max(int(key_range).bit_length(), 1)
    pay_field_max = 2 * int(payloads.max(initial=0)) + 1
    pay_bits = max(pay_field_max.bit_length(), 2)
    if key_bits + pay_bits > 62:
        return None
    return (kmin, key_bits, pay_bits)


def _pack32_meta(keys: np.ndarray):
    """(kmin, key_bits) when (key' << 1 | tag) fits a non-negative i32 —
    key spans up to 2^30. Independent of payload range/sign: the
    count-side path (see `sorted_match_totals`) never sorts payloads."""
    if keys.size == 0:
        return None
    kmin, kmax = int(keys.min()), int(keys.max())
    key_bits = max(int(kmax - kmin + 2).bit_length(), 1)
    if key_bits > 30:
        return None
    return (kmin, key_bits)


def build_sorted(keys, payloads=None, device=None) -> SortedTable:
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    if payloads is None:
        payloads = np.arange(keys.shape[0], dtype=np.int64) + 10_000_000
    else:
        payloads = np.ascontiguousarray(payloads, dtype=np.int64)
    order = np.argsort(keys, kind="stable")
    span62 = bool(
        keys.size > 0
        and int(keys.max()) - int(keys.min()) + 2 < 2**62
    )
    if keys.size:
        _, counts = np.unique(keys, return_counts=True)
        max_mult = int(counts.max())
    else:
        max_mult = 1
    return SortedTable(
        keys=jax.device_put(jnp.asarray(keys[order]), device),
        payloads=jax.device_put(jnp.asarray(payloads[order]), device),
        pack=_pack_meta(keys, payloads),
        pack32=_pack32_meta(keys),
        pay32=bool(
            payloads.size == 0
            or (
                payloads.min() >= -(2**31)
                and payloads.max() < 2**31
            )
        ),
        max_mult=max_mult,
        span62=span62,
        wide_ok=bool(
            span62
            and payloads.min(initial=0) >= 0
            and payloads.max(initial=0) < 2**31
        ),
        span_bits=(
            int(keys.max()) - int(keys.min()) + 2
        ).bit_length() + 1 if keys.size else None,
    )


def _segment_base(run_start: jax.Array, prefix: jax.Array, monotone: bool):
    """Value of `prefix` at each position's latest run start."""
    if monotone:
        neg = jnp.full_like(prefix, jnp.iinfo(prefix.dtype).min)
        return jax.lax.cummax(jnp.where(run_start, prefix, neg))
    # general segmented copy-last scan
    def combine(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb, vb, va)

    _, base = jax.lax.associative_scan(
        combine, (run_start, jnp.where(run_start, prefix, 0))
    )
    return base


def _merged_stats(table: SortedTable, probe_keys: jax.Array, allow_negative):
    """Shared core: one stable sort of build∪probe plus prefix scans.
    Returns (mult, psum, srow, is_build) in merged-sorted order, with
    zeros at build positions."""
    m = table.keys.shape[0]
    n = probe_keys.shape[0]

    # Builds precede probes at equal keys because they come first in the
    # concat and the sort is stable — no tag operand needed.
    keys = jnp.concatenate([table.keys, probe_keys.astype(jnp.int64)])
    pay = jnp.concatenate([table.payloads, jnp.zeros(n, jnp.int64)])
    row = jnp.concatenate(
        [jnp.full(m, -1, jnp.int32), jnp.arange(n, dtype=jnp.int32)]
    )

    sk, spay, srow = jax.lax.sort([keys, pay, row], num_keys=1, is_stable=True)

    is_build = srow < 0
    ib = is_build.astype(jnp.int32)
    c = jnp.cumsum(ib)  # inclusive build count
    bpay = jnp.where(is_build, spay, 0)
    pc = jnp.cumsum(bpay)  # inclusive build payload sum

    run_start = jnp.concatenate(
        [jnp.ones(1, bool), sk[1:] != sk[:-1]]
    )
    base_c = _segment_base(run_start, c - ib, monotone=True)
    base_p = _segment_base(run_start, pc - bpay, monotone=not allow_negative)

    mult_sorted = jnp.where(is_build, 0, c - base_c).astype(jnp.int32)
    psum_sorted = jnp.where(is_build, 0, pc - base_p)
    return mult_sorted, psum_sorted, srow, is_build


def _pack32_streams(table: SortedTable, probe_keys: jax.Array):
    """i32-packed merge streams: build key' even (tag 0, sorts first
    within a run), probe key' odd. Probes clamp into [0, key_span-1] —
    strictly above every build key' at the top, so clamped keys match
    nothing. key_bits <= 29 keeps the packed probe max (key_span-1)<<1|1
    strictly under INT32_MAX (the sort sentinel)."""
    kmin, key_bits = table.pack32
    key_lo = kmin - 1
    key_span = 1 << key_bits
    b32 = ((table.keys - key_lo) << 1).astype(jnp.int32)
    i32_ok = (
        probe_keys.dtype == jnp.int32
        and -(2**31) <= key_lo
        and key_lo + key_span - 1 < 2**31
    )
    if i32_ok:
        pkc = jnp.clip(
            probe_keys, jnp.int32(key_lo), jnp.int32(key_lo + key_span - 1)
        )
        p32 = ((pkc - jnp.int32(key_lo)) << 1) | 1
    else:
        p32 = (
            (
                jnp.clip(
                    probe_keys.astype(jnp.int64) - key_lo, 0, key_span - 1
                )
                << 1
            )
            | 1
        ).astype(jnp.int32)
    return b32, p32


# Experimental (round 5): early-stopped ladder for the per-probe STATS
# path — the count-side trade (stop the merge ladder, scan per run)
# applied to the executor's rank/stats pass. Gated off by default until
# the chip A/B decides; stats are per-probe, so run independence holds
# (each run merges the FULL build stream and a probe's equal-key group
# never leaves its run).
STATS_EARLY_STOP: bool = False


def _stats_early_stop_packed(p32, pval, b32, bval, n: int, mb: int,
                             tl: int) -> MatchStats:
    """Early-stopped packed stats: capped (key', rowid) ladder, per-run
    [merge + fused stats scan], ONE unsort over the concatenated run
    outputs. Ladder pads are de-senteneled to I32_MAX-1 — an EVEN
    (build-tagged) phantom in its own probe-less run, keyed n by the
    scan and sliced off with the real builds."""
    from ccve_tpu.kernels import pairsort as ps
    from ccve_tpu.kernels.merge_scan import merge_scan_stats32

    I32M = np.int32(2**31 - 1)
    tile = 1 << tl
    n_pad = n + ((-n) % tile)
    nt = n_pad // tile
    n_levels_full = max(nt - 1, 0).bit_length()
    m_build = b32.shape[0]
    target_runs = max(1.0, 0.8 * n_pad / max(m_build, 1))
    skip = min(n_levels_full, max(0, int(np.log2(target_runs))))
    if SKIP_LEVELS_OVERRIDE is not None:
        skip = min(n_levels_full, max(0, SKIP_LEVELS_OVERRIDE))
    cap = n_levels_full - skip
    sk, (sv,), run_log = ps.pallas_sort_multi_i32_runs(
        p32, [pval], tile_log=tl, n_levels_cap=cap
    )
    run = 1 << run_log
    sk = jnp.where(sk == I32M, I32M - 1, sk)
    n_pad2 = sk.shape[0]
    n_runs = -(-n_pad2 // run)
    pad2 = n_runs * run - n_pad2
    if pad2:
        sk = jnp.concatenate([sk, jnp.full(pad2, I32M - 1, jnp.int32)])
        sv = jnp.concatenate([sv, jnp.zeros(pad2, jnp.int32)])
    runs_k = sk.reshape(n_runs, run)
    runs_v = sv.reshape(n_runs, run)

    def body(_, rkv):
        rk, rv = rkv
        mk, (mval,) = ps.merge_sorted_multi_i32(
            rk, [rv], b32, [bval], tile_log=tl
        )
        key2, packed = merge_scan_stats32(mk, mval, n, mult_bits=mb)
        return None, (key2, packed)

    _, (k2, pkd) = jax.lax.scan(body, None, (runs_k, runs_v))
    _, (pk2,) = ps.pallas_sort_multi_i32(
        k2.reshape(-1), [pkd.reshape(-1)], tile_log=tl
    )
    pk = pk2[:n]
    mult = (pk & ((1 << mb) - 1)).astype(jnp.int32)
    psum = (pk >> mb).astype(jnp.int64)
    return MatchStats(mult=mult, psum=psum)


def _sorted_match_stats_pallas(
    table: SortedTable,
    probe_keys: jax.Array,
    allow_negative: bool,
    tile_log: int | None,
) -> MatchStats:
    """Per-probe stats on the multi-plane Pallas sort (kernels/pairsort):

      1. sort the PROBE stream only — key' = (k - lo) << 1 | 1, cargo =
         row id — then one unequal merge-path pass folds in the
         pre-sorted build stream (key' even, cargo = i32 payload);
      2. the same prefix scans as `_merged_stats` produce per-position
         mult / psum (builds precede probes in a run via the tag LSB);
      3. unsort with ONE more multi-plane sort: probes keyed by row id,
         builds keyed n (they sort to the back and fall off the [:n]
         slice); psum travels as (hi, lo) i32 limb planes.

    Replaces two 3-operand stable int64 lax.sorts with i32 plane sorts —
    the same count-side trick `sorted_match_totals` uses, extended to
    per-row outputs. Gated on pack32 (key span), key_bits <= 29 (the
    probe clamp key' must stay strictly under INT32_MAX when packed) and
    pay32 (payloads ride an i32 plane)."""
    from ccve_tpu.kernels import bigsort as bs
    from ccve_tpu.kernels import pairsort as ps
    from ccve_tpu.kernels.merge_scan import merge_scan_stats32
    from ccve_tpu.ops.scan_utils import cumsum_i64_limbs, cumsum_small_i32

    tl = bs.TILE_LOG if tile_log is None else tile_log
    n = probe_keys.shape[0]
    b32, p32 = _pack32_streams(table, probe_keys)
    bval = table.payloads.astype(jnp.int32)
    pval = jnp.arange(n, dtype=jnp.int32)

    if not allow_negative and STATS_EARLY_STOP and table.pack is not None:
        pay_bits = table.pack[2]
        mbits = max(int(table.max_mult).bit_length(), 1)
        if (pay_bits - 1) + 2 * mbits <= 31 and n > (1 << tl):
            return _stats_early_stop_packed(
                p32, pval, b32, bval, n, mbits, tl
            )

    sp_k, (sp_v,) = ps.pallas_sort_multi_i32(p32, [pval], tile_log=tl)
    sk, (sval,) = ps.merge_sorted_multi_i32(
        sp_k, [sp_v], b32, [bval], tile_log=tl
    )

    if not allow_negative:
        # all scans + unsort-plane assembly fused into ONE linear Pallas
        # pass (kernels/merge_scan.merge_scan_stats32); needs the cummax
        # base trick's non-negative payloads.
        # When the static pack metadata bounds psum < 2^(31 - mult_bits)
        # (psum <= max_mult * max_payload), psum and mult pack into ONE
        # i32 cargo plane — the unsort sort carries 1 plane, not 3.
        mb = None
        if table.pack is not None:
            pay_bits = table.pack[2]  # bits of 2*max_pay + 1
            mbits = max(int(table.max_mult).bit_length(), 1)
            if (pay_bits - 1) + 2 * mbits <= 31:
                mb = mbits
        if mb is not None:
            key2, packed = merge_scan_stats32(sk, sval, n, mult_bits=mb)
            _, (pk2,) = ps.pallas_sort_multi_i32(key2, [packed], tile_log=tl)
            pk = pk2[:n]
            mult = (pk & ((1 << mb) - 1)).astype(jnp.int32)
            psum = (pk >> mb).astype(jnp.int64)
            return MatchStats(mult=mult, psum=psum)
        key2, mult_sorted, hi, lo = merge_scan_stats32(sk, sval, n)
    else:
        is_build = (sk & 1) == 0
        ib = is_build.astype(jnp.int32)
        c = cumsum_small_i32(ib)
        bpay = jnp.where(is_build, sval.astype(jnp.int64), 0)
        pc = cumsum_i64_limbs(bpay)
        kk = sk >> 1  # run identity is the original key, not the pack
        run_start = jnp.concatenate([jnp.ones(1, bool), kk[1:] != kk[:-1]])
        base_c = _segment_base(run_start, c - ib, monotone=True)
        base_p = _segment_base(run_start, pc - bpay, monotone=False)
        mult_sorted = jnp.where(is_build, 0, c - base_c).astype(jnp.int32)
        psum_sorted = jnp.where(is_build, 0, pc - base_p)
        key2 = jnp.where(is_build, jnp.int32(n), sval)
        lo = psum_sorted.astype(jnp.int32)
        hi = (psum_sorted >> 32).astype(jnp.int32)
    _, (mult2, lo2, hi2) = ps.pallas_sort_multi_i32(
        key2, [mult_sorted, lo, hi], tile_log=tl
    )
    psum = (hi2[:n].astype(jnp.int64) << 32) | (
        lo2[:n].astype(jnp.int64) & jnp.int64(0xFFFFFFFF)
    )
    return MatchStats(mult=mult2[:n], psum=psum)


def _pack64_streams(table: SortedTable, probe_keys: jax.Array):
    """64-bit tag-packed merge streams for WIDE key domains (span <
    2^62, `span62`): build key' even, probe key' odd; probes clamp into
    [key_lo, key_hi] (guard rows that match nothing). The bases are
    TRACED scalars read off the sorted table's ends — unlike pack32
    there is no host-side bit-width to bake, because the packed value
    always fits int64."""
    key_lo = table.keys[0] - 1
    key_hi = table.keys[-1] + 1
    b64 = (table.keys - key_lo) << 1
    pcl = jnp.clip(probe_keys.astype(jnp.int64), key_lo, key_hi)
    p64 = ((pcl - key_lo) << 1) | 1
    return b64, p64


# Wide STATS route selector ("limb" = r4 2-plane limb ladder,
# "split1" = single-compare-plane ladder + i32 merge + planes-native
# fused scan, no emulated-int64 pass anywhere); chip A/B pending.
WIDE_STATS_ROUTE: str = "limb"


def _sorted_match_stats_pallas_wide_split1(
    table: SortedTable,
    probe_keys: jax.Array,
    tile_log: int | None,
) -> MatchStats:
    """Wide per-probe stats, single-plane end to end (the `split1`
    design applied to the STATS path): sort by s1 = key' >> sh (one
    i32 compare plane) carrying (s2, row id) cargo; merge with the
    split build stream on the same single-compare-plane machinery; ONE
    post-merge tie fixup (cargo follows); then the fused scan consumes
    the split planes DIRECTLY — its run identity is equality on
    (s1, s2 & ~1) == untagged-key equality, and the tagged payload
    rides as (pay >> 31, pay*2+1) i32 planes — and hands back psum
    PLANES for the unsort. No emulated-int64 op touches the stream.
    Requires span_bits <= 61 and wide_ok (payload < 2^31)."""
    from ccve_tpu.kernels import bigsort as bs
    from ccve_tpu.kernels import pairsort as ps
    from ccve_tpu.kernels.merge_scan import merge_scan_stats_limbs

    tl = bs.TILE_LOG if tile_log is None else tile_log
    n = probe_keys.shape[0]
    m = table.keys.shape[0]
    sh = table.span_bits - 30
    b64, p64 = _pack64_streams(table, probe_keys)
    mask = (1 << sh) - 1
    s1 = (p64 >> sh).astype(jnp.int32)
    s2 = (p64 & mask).astype(jnp.int32)
    b1 = (b64 >> sh).astype(jnp.int32)
    b2 = (b64 & mask).astype(jnp.int32)
    bval = table.payloads.astype(jnp.int32)
    pval = jnp.arange(n, dtype=jnp.int32)

    sp1, (sp2, spv) = ps.pallas_sort_multi_i32(
        s1, [s2, pval], tile_log=tl
    )
    mk, (m2, mv) = ps.merge_sorted_multi_i32(
        sp1, [sp2, spv], b1, [b2, bval], tile_log=tl
    )
    fix_seg = 1 << max(int(n + m - 1).bit_length(), 1)
    mk, m2, (mv,) = _tie_fixup_runs(mk, m2, fix_seg, extras=(mv,))

    # builds are EVEN-tagged in _pack64_streams (probes odd): at equal
    # keys the build sorts first — the scan's builds-before-probes
    # convention — and the tag lives in s2's LSB
    is_build = (m2 & 1) == 0
    phi = jnp.where(
        is_build, jax.lax.shift_right_logical(mv, jnp.int32(31)), 0
    ).astype(jnp.int32)
    plo = jnp.where(is_build, (mv << 1) | 1, 0).astype(jnp.int32)
    mult_sorted, ps_hi, ps_lo = merge_scan_stats_limbs(
        mk, m2 & jnp.int32(-2), phi, plo, n + m, return_planes=True
    )

    key2 = jnp.where(is_build, jnp.int32(n), mv)
    _, (mult2, lo2, hi2) = ps.pallas_sort_multi_i32(
        key2, [mult_sorted, ps_lo, ps_hi], tile_log=tl
    )
    psum = (hi2[:n].astype(jnp.int64) << 32) | (
        lo2[:n].astype(jnp.int64) & jnp.int64(0xFFFFFFFF)
    )
    return MatchStats(mult=mult2[:n], psum=psum)


def _sorted_match_stats_pallas_wide(
    table: SortedTable,
    probe_keys: jax.Array,
    tile_log: int | None,
) -> MatchStats:
    """`_sorted_match_stats_pallas` for key spans ABOVE pack32's 2^30:
    the probe sort and the build merge run on the 2-plane (hi, lo)
    limb-key kernels (kernels/pairsort.py `pallas_sort_multi_i64`), the
    fused merge-scan consumes the merged stream in its tagged-limb form
    (kernels/merge_scan.merge_scan_stats, limb-native already), and the
    unsort stays an i32 plane sort keyed by row id. ~2x the packed
    path's stage cost (two limbs + a 3-op compare per CE) instead of
    the 3-operand int64 lax.sort fallback's ~8x. Gated on `wide_ok`."""
    from ccve_tpu.kernels import bigsort as bs
    from ccve_tpu.kernels import pairsort as ps
    from ccve_tpu.kernels.merge_scan import merge_scan_stats

    tl = bs.TILE_LOG if tile_log is None else tile_log
    n = probe_keys.shape[0]
    b64, p64 = _pack64_streams(table, probe_keys)
    bval = table.payloads.astype(jnp.int32)
    pval = jnp.arange(n, dtype=jnp.int32)

    sp_k, (sp_v,) = ps.pallas_sort_multi_i64(p64, [pval], tile_log=tl)
    sk, (sval,) = ps.merge_sorted_multi_i64(
        sp_k, [sp_v], b64, [bval], tile_log=tl
    )

    is_build = (sk & 1) == 0
    # tagged-stream scan: key' (untagged) + tagged payload (pay*2+1
    # builds / 0 probes), both int64 — merge_scan_stats splits limbs
    st = jnp.where(is_build, sval.astype(jnp.int64) * 2 + 1, 0)
    mult_sorted, psum_sorted = merge_scan_stats(sk >> 1, st)

    key2 = jnp.where(is_build, jnp.int32(n), sval)
    lo = psum_sorted.astype(jnp.int32)
    hi = (psum_sorted >> 32).astype(jnp.int32)
    _, (mult2, lo2, hi2) = ps.pallas_sort_multi_i32(
        key2, [mult_sorted.astype(jnp.int32), lo, hi], tile_log=tl
    )
    psum = (hi2[:n].astype(jnp.int64) << 32) | (
        lo2[:n].astype(jnp.int64) & jnp.int64(0xFFFFFFFF)
    )
    return MatchStats(mult=mult2[:n], psum=psum)


def sorted_match_stats(
    table: SortedTable,
    probe_keys: jax.Array,
    allow_negative: bool = False,
    use_kernel: bool | None = None,
    tile_log: int | None = None,
) -> MatchStats:
    """Per-probe-key (match count, matched-payload sum) via sort-merge,
    in original probe-row order."""
    kernel_ok = (
        jax.default_backend() != "cpu" if use_kernel is None else use_kernel
    )
    if (
        kernel_ok
        and table.pack32 is not None
        and table.pack32[1] <= 29
        and table.pay32
    ):
        return _sorted_match_stats_pallas(
            table, probe_keys, allow_negative, tile_log
        )
    if (
        kernel_ok
        and table.wide_ok
        and not allow_negative
        and table.keys.shape[0] > 0
    ):
        sb = table.span_bits
        if WIDE_STATS_ROUTE == "split1" and sb is not None and 30 < sb <= 61:
            return _sorted_match_stats_pallas_wide_split1(
                table, probe_keys, tile_log
            )
        return _sorted_match_stats_pallas_wide(table, probe_keys, tile_log)
    m = table.keys.shape[0]
    mult_sorted, psum_sorted, srow, is_build = _merged_stats(
        table, probe_keys, allow_negative
    )
    # Restore probe order: one more (cheap) sort keyed by row id, with
    # mult packed into the key's low bits — build entries (row −1) sort to
    # the front, probe rows land at positions m..m+n-1 in original order.
    packed = (srow.astype(jnp.int64) << jnp.int64(32)) | mult_sorted.astype(
        jnp.int64
    )
    packed_s, psum = jax.lax.sort([packed, psum_sorted], num_keys=1)
    mult = (packed_s[m:] & jnp.int64(0xFFFFFFFF)).astype(jnp.int32)
    return MatchStats(mult=mult, psum=psum[m:])


# Tuning hook: force the count-side ladder's skipped-level count (the
# 0.8*n/m heuristic otherwise); probe scripts sweep it on chip.
SKIP_LEVELS_OVERRIDE: int | None = None

# Static stride schedule for `_tie_fixup_runs` (the pass pyramid run
# before the verified stride-1 loop takes over). Chip-swept round 5:
# FLAT within ~±1 ms session noise from () to (8,4,2,1), rising ~1 ms
# per extra stride beyond — duplicate probes arrive already grouped
# (equal (s1,s2) values need no ordering) and the build/probe tag
# ordering falls out of the merge, so the fixup's real work is only
# the rare cross-key s1 collisions. (8,4,2,1) is the measured optimum.
TIE_FIXUP_STRIDES: tuple = (8, 4, 2, 1)

# Wide count-side route selector: "split" = single-compare-plane
# LADDER + limb merge/counts; "split1" = single-plane END TO END
# (ladder, merge AND counts all on (s1, s2) planes — the counts kernel
# is equality-only, so the split planes feed it verbatim); "limb" =
# the r4 2-plane limb ladder. Probe scripts A/B these.
WIDE_COUNT_ROUTE: str = "split1"


def _count_side_bc64(p64: jax.Array, b64: jax.Array, m: int,
                     interpret: bool = False,
                     tile_log: int | None = None) -> jax.Array:
    """`_count_side_bc` for WIDE key domains: packed-64 streams (p64 =
    key'<<1 probes, b64 = (key'<<1)|1 builds, builds pre-sorted) ride
    the (hi, lo) limb-plane sort machinery (kernels/pairsort
    `pallas_sort_i64_limbs`) with the SAME early-stopped ladder, and
    each sorted probe sub-run merges against the build stream
    (`merge_sorted_i64_limbs`) before the 64-bit counts kernel scans it
    — counts are additive over sub-runs."""
    from ccve_tpu.kernels import bigsort as bs
    from ccve_tpu.kernels import pairsort as ps
    from ccve_tpu.kernels.merge_scan import merge_scan_build_counts64

    n = p64.shape[0]
    tile_log = bs.TILE_LOG if tile_log is None else tile_log
    tile = 1 << tile_log
    if n <= tile:
        sk = jax.lax.sort(
            [jnp.concatenate([p64, b64])], num_keys=1
        )[0]
        shi = (sk >> 32).astype(jnp.int32)
        slo = sk.astype(jnp.int32)
        return merge_scan_build_counts64(
            shi, slo, m, interpret=interpret
        )
    n_pad = n + ((-n) % tile)
    nt = n_pad // tile
    n_levels_full = max(nt - 1, 0).bit_length()
    target_runs = max(1.0, 0.8 * n_pad / max(m, 1))
    skip = min(n_levels_full, max(0, int(np.log2(target_runs))))
    if SKIP_LEVELS_OVERRIDE is not None:
        skip = min(n_levels_full, max(0, SKIP_LEVELS_OVERRIDE))
    cap = n_levels_full - skip
    khi, klo, run_log = ps.pallas_sort_i64_limbs(
        p64, tile_log=tile_log, n_levels_cap=cap
    )
    run = 1 << run_log
    n_runs = -(-n_pad // run)
    # one lax.scan over UNIFORM runs, not a Python loop: the loop would
    # trace n_runs copies of the merge driver + counts kernel into one
    # program — the same compile blowup that killed the monolithic 16M
    # sorted_expand (PERF_NOTES "compile wall"). Pad the sorted buffer
    # to a run multiple with INT64_MAX (phantom probe-less build runs
    # that append zeros past m).
    pad2 = n_runs * run - n_pad
    if pad2:
        khi = jnp.concatenate(
            [khi, jnp.full(pad2, np.int32(2**31 - 1), jnp.int32)]
        )
        klo = jnp.concatenate(
            [klo, jnp.full(pad2, np.int32(-1), jnp.int32)]
        )
    runs_h = khi.reshape(n_runs, run)
    runs_l = klo.reshape(n_runs, run)

    def body(bc, rhl):
        rh, rl = rhl
        mh, ml = ps.merge_sorted_i64_limbs(rh, rl, b64)
        bc_r = merge_scan_build_counts64(
            mh, ml, m, extra=run, interpret=interpret
        )
        return bc + bc_r, None

    bc, _ = jax.lax.scan(
        body, jnp.zeros(m, jnp.int32), (runs_h, runs_l)
    )
    return bc


def _tie_fixup_runs(s1: jax.Array, s2: jax.Array, run: int,
                    extras: tuple = ()):
    """Within each ascending `run`-length segment of the s1-sorted
    stream, sort the s2 cargo inside equal-s1 groups — completing the
    (s1, s2) lexicographic order after a SINGLE-COMPARE-PLANE ladder.
    `extras` are additional cargo planes that travel with their
    (s1, s2) pair through every swap (e.g. row ids for a stats-path
    variant).

    Static strided odd-even passes clear the common case (s1 ties are
    rare: 30 bits of prefix); a verified stride-1 odd-even
    `while_loop` then runs until the stream checks sorted — exact for
    ANY tie profile (odd-even transposition sorts a group of length L
    in <= L phases), so adversarial ties cost passes, never
    correctness, and no fallback branch has to be compiled."""
    n = s1.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    pos_in_run = idx & (run - 1)
    extras = tuple(extras)

    def one_pass(s2, extras, st: int, phase: int):
        nbr1 = jnp.concatenate([s1[st:], jnp.full((st,), -1, jnp.int32)])
        nbr2 = jnp.concatenate([s2[st:], jnp.zeros((st,), jnp.int32)])
        is_lower = (
            (((idx // st) & 1) == phase)
            & (pos_in_run + st < run)
            & (s1 == nbr1)
        )
        swap = is_lower & (s2 > nbr2)
        swap_below = jnp.concatenate(
            [jnp.zeros((st,), bool), swap[:-st]]
        )

        def apply(v):
            nbr = jnp.concatenate([v[st:], jnp.zeros((st,), jnp.int32)])
            below = jnp.concatenate(
                [jnp.zeros((st,), jnp.int32), v[:-st]]
            )
            return jnp.where(
                swap_below, below, jnp.where(swap, nbr, v)
            )

        return apply(s2), tuple(apply(v) for v in extras)

    def check(s2):
        nbr1 = jnp.concatenate([s1[1:], jnp.full((1,), -1, jnp.int32)])
        nbr2 = jnp.concatenate([s2[1:], jnp.zeros((1,), jnp.int32)])
        adj = (pos_in_run + 1 < run) & (s1 == nbr1)
        return jnp.all(jnp.where(adj, s2 <= nbr2, True))

    for st in TIE_FIXUP_STRIDES:
        for ph in (0, 1):
            s2, extras = one_pass(s2, extras, st, ph)

    def body(carry):
        s2, extras, _ = carry
        s2, extras = one_pass(s2, extras, 1, 0)
        s2, extras = one_pass(s2, extras, 1, 1)
        return s2, extras, check(s2)

    s2, extras, _ = jax.lax.while_loop(
        lambda c: ~c[-1], body, (s2, extras, check(s2))
    )
    return (s1, s2) if not extras else (s1, s2, extras)


def _count_side_bc64_split(p64: jax.Array, b64: jax.Array, m: int,
                           sh: int, interpret: bool = False,
                           tile_log: int | None = None) -> jax.Array:
    """SPLIT-PLANE wide counts — the span-adaptive single-compare-plane
    route (VERDICT r4 #2): instead of the 2-plane limb ladder (every
    compare-exchange pays the 3-op lt64 on (hi, lo) pairs), sort the
    probe stream by s1 = key' >> sh — a SINGLE non-negative i32 compare
    plane (sh chosen at build time so s1 < 2^30) — with the residue
    s2 = key' & (2^sh - 1) riding as cargo. Movement is the same two
    planes, but each CE compares ONE plane (~half the ladder ALU; the
    stages are measured ALU-bound, PERF_NOTES). s1 ties (keys sharing
    the 30-bit prefix) are then finished by `_tie_fixup_runs`, the
    32/32 limb planes are reconstructed in PURE i32 math
    (khi = s1 >> (32-sh), klo = (s1 << sh) | s2 — no emulated-int64
    pass), and the per-run limb merge + 64-bit counts kernel run
    unchanged. Requires sh <= 31 (span_bits <= 61)."""
    from ccve_tpu.kernels import bigsort as bs
    from ccve_tpu.kernels import pairsort as ps
    from ccve_tpu.kernels.merge_scan import merge_scan_build_counts64

    n = p64.shape[0]
    tile_log = bs.TILE_LOG if tile_log is None else tile_log
    tile = 1 << tile_log
    if n <= tile:
        sk = jax.lax.sort([jnp.concatenate([p64, b64])], num_keys=1)[0]
        shi = (sk >> 32).astype(jnp.int32)
        slo = sk.astype(jnp.int32)
        return merge_scan_build_counts64(shi, slo, m, interpret=interpret)

    s1 = (p64 >> sh).astype(jnp.int32)
    s2 = (p64 & ((1 << sh) - 1)).astype(jnp.int32)
    n_pad = n + ((-n) % tile)
    nt = n_pad // tile
    n_levels_full = max(nt - 1, 0).bit_length()
    target_runs = max(1.0, 0.8 * n_pad / max(m, 1))
    skip = min(n_levels_full, max(0, int(np.log2(target_runs))))
    if SKIP_LEVELS_OVERRIDE is not None:
        skip = min(n_levels_full, max(0, SKIP_LEVELS_OVERRIDE))
    cap = n_levels_full - skip
    sk1, (sk2,), run_log = ps.pallas_sort_multi_i32_runs(
        s1, [s2], tile_log=tile_log, n_levels_cap=cap
    )
    # ladder padding: s1 = I32_MAX (> any real s1 < 2^30), s2 = 0 —
    # reconstructs to a probe-tagged phantom above every build key',
    # which joins a run with no builds and contributes nothing
    run = 1 << run_log
    sk1, sk2 = _tie_fixup_runs(sk1, sk2, run)
    khi = (
        jax.lax.shift_right_logical(sk1, jnp.int32(32 - sh))
        if sh < 32
        else sk1
    )
    klo = (sk1 << sh) | sk2  # i32 wrap == exact low 32 bits of key'

    n_pad2 = sk1.shape[0]
    n_runs = -(-n_pad2 // run)
    pad2 = n_runs * run - n_pad2
    if pad2:
        khi = jnp.concatenate(
            [khi, jnp.full(pad2, np.int32(2**31 - 1), jnp.int32)]
        )
        klo = jnp.concatenate(
            [klo, jnp.full(pad2, np.int32(-1), jnp.int32)]
        )
    runs_h = khi.reshape(n_runs, run)
    runs_l = klo.reshape(n_runs, run)

    def body(bc, rhl):
        rh, rl = rhl
        mh, ml = ps.merge_sorted_i64_limbs(rh, rl, b64)
        bc_r = merge_scan_build_counts64(
            mh, ml, m, extra=run, interpret=interpret
        )
        return bc + bc_r, None

    bc, _ = jax.lax.scan(
        body, jnp.zeros(m, jnp.int32), (runs_h, runs_l)
    )
    return bc


def _count_side_bc64_split1(p64: jax.Array, b64: jax.Array, m: int,
                            sh: int, interpret: bool = False,
                            tile_log: int | None = None) -> jax.Array:
    """Fully single-plane wide counts — `_count_side_bc64_split` with
    the MERGE and COUNTS also on the (s1, s2) planes: the per-run merge
    is `merge_sorted_multi_i32` (one i32 compare per CE instead of
    lt64), ONE post-merge tie fixup per run establishes the full
    (s1, s2) order (so the pre-merge fixup is dropped — the merge only
    needs s1 order on both sides), and `merge_scan_build_counts64`
    consumes the split planes directly: its run identity is EQUALITY on
    (hi, lo&~1) and its tag is lo&1 — both invariant under the
    (s1, s2) bit-split, no limb reconstruct at all. Ladder pad keys are
    remapped I32_MAX -> I32_MAX-1 (the merge kernel's sentinel must
    stay unused); they sort last and form matchless runs either way."""
    from ccve_tpu.kernels import bigsort as bs
    from ccve_tpu.kernels import pairsort as ps
    from ccve_tpu.kernels.merge_scan import merge_scan_build_counts64

    n = p64.shape[0]
    tile_log = bs.TILE_LOG if tile_log is None else tile_log
    tile = 1 << tile_log
    if n <= tile:
        sk = jax.lax.sort([jnp.concatenate([p64, b64])], num_keys=1)[0]
        shi = (sk >> 32).astype(jnp.int32)
        slo = sk.astype(jnp.int32)
        return merge_scan_build_counts64(shi, slo, m, interpret=interpret)

    I32M = np.int32(2**31 - 1)
    s1 = (p64 >> sh).astype(jnp.int32)
    s2 = (p64 & ((1 << sh) - 1)).astype(jnp.int32)
    b1 = (b64 >> sh).astype(jnp.int32)
    b2 = (b64 & ((1 << sh) - 1)).astype(jnp.int32)
    n_pad = n + ((-n) % tile)
    nt = n_pad // tile
    n_levels_full = max(nt - 1, 0).bit_length()
    target_runs = max(1.0, 0.8 * n_pad / max(m, 1))
    skip = min(n_levels_full, max(0, int(np.log2(target_runs))))
    if SKIP_LEVELS_OVERRIDE is not None:
        skip = min(n_levels_full, max(0, SKIP_LEVELS_OVERRIDE))
    cap = n_levels_full - skip
    sk1, (sk2,), run_log = ps.pallas_sort_multi_i32_runs(
        s1, [s2], tile_log=tile_log, n_levels_cap=cap
    )
    run = 1 << run_log
    # de-sentinel the ladder padding: probe-tagged, above every real
    # s1 (< 2^30), matchless run either way
    sk1 = jnp.where(sk1 == I32M, I32M - 1, sk1)

    n_pad2 = sk1.shape[0]
    n_runs = -(-n_pad2 // run)
    pad2 = n_runs * run - n_pad2
    if pad2:
        # build-tagged phantoms (s2 = -1): emit zero counts past m
        sk1 = jnp.concatenate([sk1, jnp.full(pad2, I32M - 1, jnp.int32)])
        sk2 = jnp.concatenate([sk2, jnp.full(pad2, -1, jnp.int32)])
    runs_1 = sk1.reshape(n_runs, run)
    runs_2 = sk2.reshape(n_runs, run)
    fix_seg = 1 << max(int(run + m - 1).bit_length(), 1)

    def body(bc, r12):
        r1, r2 = r12
        mk, (m2,) = ps.merge_sorted_multi_i32(
            r1, [r2], b1, [b2], tile_log=tile_log
        )
        mk, m2 = _tie_fixup_runs(mk, m2, fix_seg)
        bc_r = merge_scan_build_counts64(
            mk, m2, m, extra=run, interpret=interpret
        )
        return bc + bc_r, None

    bc, _ = jax.lax.scan(
        body, jnp.zeros(m, jnp.int32), (runs_1, runs_2)
    )
    return bc


def _count_side_bc(p32: jax.Array, b32: jax.Array, m: int) -> jax.Array:
    """Dense per-build-row probe counts bc i32[m] from packed i32
    streams (p32 = key'<<1 probes, b32 = (key'<<1)|1 builds, build
    stream pre-sorted) — the count-side engine shared by
    `sorted_build_counts` and `sorted_match_totals`.

    The probe side does NOT need a total order: counts are additive
    over any partition of the probe stream, so the sort ladder stops
    early (bigsort._sort_padded_buf n_levels_cap) and the fused counts
    kernel scans each sorted sub-run against the build stream
    independently, summing the bc arrays. Cost model (PERF_NOTES
    stage-cost 4.35 ps/elem): one merge level ~ 17 stage-passes over
    n_pad; one extra run re-scans the build stream (~30 passes over m)
    — optimum at about 0.8 * n_pad / m runs. At config 1 (16M/1M) this
    skips 3-4 of 7 levels for ~3 ms of the 25.5 ms budget."""
    from ccve_tpu.kernels import bigsort as bs
    from ccve_tpu.kernels.merge_scan import (
        merge_counts_fused,
        merge_scan_build_counts,
    )

    n = p32.shape[0]
    tile = 1 << bs.TILE_LOG
    if n <= (1 << bs.CHUNK_LOG):
        s = bs.merge_sorted_i32(jax.lax.sort([p32], num_keys=1)[0], b32)
        return merge_scan_build_counts(s, m)
    n_pad = n + ((-n) % tile)
    p32 = jnp.pad(
        p32, (0, n_pad - n), constant_values=np.int32(2**31 - 1)
    )
    nt = n_pad // tile
    n_levels_full = max(nt - 1, 0).bit_length()
    target_runs = max(1.0, 0.8 * n_pad / max(m, 1))
    skip = min(n_levels_full, max(0, int(np.log2(target_runs))))
    if SKIP_LEVELS_OVERRIDE is not None:  # tuning hook (probe scripts)
        skip = min(n_levels_full, max(0, SKIP_LEVELS_OVERRIDE))
    cap = n_levels_full - skip
    abuf = bs._sort_padded_buf(
        p32, bs.TILE_LOG, bs.CHUNK_LOG, n_levels_cap=cap
    )
    run = tile << cap
    n_runs = -(-n_pad // run)
    bc = None
    for r in range(n_runs):
        off = r * run
        nA_r = min(run, n_pad - off)
        n_real_r = int(np.clip(n - off, 0, nA_r))
        bc_r = merge_counts_fused(
            abuf, nA_r, n_real_r, b32, m,
            a_row_off=off // 128,
            mask_a_end=(r != n_runs - 1),
        )
        bc = bc_r if bc is None else bc + bc_r
    return bc


def rank_table(table: SortedTable) -> SortedTable:
    """Twin of `table` whose payload is the SORTED ROW INDEX at each key
    run's FIRST row and 0 elsewhere — the input to `sorted_match_ranks`.
    A probe key matches exactly one full key run, so the twin's matched-
    payload sum IS the run's start row: no division, no algebra, just
    `psum` (start = 0 rows are disambiguated by mult > 0). Shares the
    key plane with the original table (no extra HBM for keys); pack
    metadata is recomputed for the index payloads (max m-1) entirely
    from static shape/pack info — no host readback."""
    m = int(table.keys.shape[0])
    idx = jnp.arange(m, dtype=jnp.int64)
    if m > 0:
        run_start = jnp.concatenate(
            [jnp.ones(1, bool), table.keys[1:] != table.keys[:-1]]
        )
        pay = jnp.where(run_start, idx, 0)
    else:
        pay = idx
    pack = None
    if table.pack32 is not None and m > 0:
        kmin, key_bits = table.pack32
        pay_bits = max(int(2 * (m - 1) + 1).bit_length(), 2)
        if key_bits + pay_bits <= 62:
            pack = (kmin, key_bits, pay_bits)
    return SortedTable(
        keys=table.keys,
        payloads=pay,
        pack=pack,
        pack32=table.pack32,
        pay32=m < 2**31,
        max_mult=table.max_mult,
        span62=table.span62,
        # index payloads are 0..m-1 (non-negative, i32): the twin stays
        # wide-eligible whenever the key span allows it
        wide_ok=table.span62 and m < 2**31,
        span_bits=table.span_bits,
    )


def sorted_match_ranks(
    rtable: SortedTable,
    probe_keys: jax.Array,
    use_kernel: bool | None = None,
    tile_log: int | None = None,
):
    """Per-probe-key (mult, start) in original probe order: mult = match
    count, start = first matching row of the SORTED table (garbage where
    mult == 0). `rtable` must be a `rank_table(...)` twin (payload ==
    sorted row index at run starts, 0 elsewhere): a probe's matched rows
    are exactly one full key run, so the matched-payload sum IS the
    run-start row — the whole heavily-optimized stats path (Pallas plane
    sorts, fused merge-scan) is reused verbatim, with no per-chunk table
    staging and no VMEM table-size bound (streams ride HBM,
    kernels/pairsort.py), and start falls out with zero extra math."""
    st = sorted_match_stats(
        rtable, probe_keys, use_kernel=use_kernel, tile_log=tile_log
    )
    return st.mult, st.psum.astype(jnp.int32)


def sorted_build_counts(table: SortedTable, probe_keys: jax.Array):
    """Per-build-ROW probe multiplicities bc int32[m]: bc[j] = number of
    probe keys equal to table.keys[j] (table order = sorted order). The
    count-side primitive behind `sorted_match_totals`, exposed for
    aggregate pushdown (ops/aggregate.join_dense_aggregate): when a
    group-by key equals the join key, per-group stats are algebra over
    bc and the build payloads — no per-probe materialization.

    Requires the table's 32-bit packing (key span <= 2^30); falls back
    to an XLA searchsorted-free two-sided histogram otherwise."""
    m = table.keys.shape[0]
    if table.pack32 is not None and jax.default_backend() != "cpu":
        kmin, key_bits = table.pack32
        key_lo = kmin - 1
        key_span = 1 << key_bits
        b32 = (((table.keys - key_lo) << 1) | 1).astype(jnp.int32)
        if (
            probe_keys.dtype == jnp.int32
            and -(2**31) <= key_lo
            and key_lo + key_span - 1 < 2**31
        ):
            pkc = jnp.clip(
                probe_keys,
                jnp.int32(key_lo),
                jnp.int32(key_lo + key_span - 1),
            )
            p32 = (pkc - jnp.int32(key_lo)) << 1
        else:
            p32 = (
                jnp.clip(probe_keys - key_lo, 0, key_span - 1) << 1
            ).astype(jnp.int32)
        return _count_side_bc(p32, b32, m)
    # general path: tag-sorted stream + XLA scans (CPU / wide keys)
    n = probe_keys.shape[0]
    keys = jnp.concatenate([table.keys, probe_keys.astype(jnp.int64)])
    tags = jnp.concatenate(
        [jnp.ones(m, jnp.int32), jnp.zeros(n, jnp.int32)]
    )
    sk, st = jax.lax.sort([keys, tags], num_keys=2)  # probes before builds
    ip = (st == 0).astype(jnp.int32)
    cp = jnp.cumsum(ip)
    run_start = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    base = _segment_base(run_start, cp - ip, monotone=True)
    bc = jnp.where(st == 1, cp - base, 0)
    # j-th build of the stream is table row j: compact by cumulative
    # build rank via a length-m segment-sum (scatter-free on CPU is fine)
    bidx = jnp.cumsum(st) - 1
    return (
        jnp.zeros(m, jnp.int32)
        .at[jnp.clip(bidx, 0, m - 1)]
        .add(jnp.where(st == 1, bc, 0).astype(jnp.int32))
    )


def sorted_match_totals(
    table: SortedTable,
    probe_keys: jax.Array,
    allow_negative: bool = False,
    use_kernel: bool | None = None,
):
    """(total match count, total matched-payload sum) for a single-level
    join — order-invariant, so the unsort pass is skipped, and the
    build/probe tag travels in the payload's LSB (pay*2+1 for builds, 0
    for probes), making the sort a 2-operand one. Requires |payload| <
    2^62 (engine payloads are row+10^7); falls back to the 3-operand path
    otherwise via `_merged_stats`.

    `use_kernel` (default: auto — on for TPU backends with non-negative
    payloads) fuses all post-sort scans into one Pallas pass
    (kernels/merge_scan.py)."""
    m = table.keys.shape[0]
    n = probe_keys.shape[0]

    # auto: any accelerator backend (the axon plugin reports its own
    # name, so test for not-cpu rather than 'tpu'). `use_kernel` itself
    # stays None for the downstream branches' own auto logic.
    kernel_ok = (
        jax.default_backend() != "cpu" if use_kernel is None else use_kernel
    )

    if kernel_ok and table.pack32 is not None:
        # COUNT-SIDE u32 path: payloads never enter the sort. Sort ONE
        # i32 operand (key' << 1 | tag), probes (tag 0) before builds
        # (tag 1); per build entry the kernel counts the probes in its
        # run and emits the counts DENSELY (in-kernel ring-buffer
        # compaction). The j-th build entry of the merged stream is
        # table row j (table pre-sorted, equal packed values
        # interchangeable), so
        #   count = Σ bc,  psum = dot(bc, table.payloads)
        # — no unsort, no gather, no payload scans, and a ~1.5x faster
        # sort than the packed-int64 operand (measured: i32 ~51 ms vs
        # i64 ~75 ms at 17M on v5e). Exact for negative payloads too:
        # the dot carries the sign.
        #
        # The whole chain runs PADDED: the pack pads to a sort-tile
        # multiple in the same fused pass, the sort/merge keep their
        # padding (+INF entries are build-tagged phantoms with huge
        # keys that sort last and fall off the bc[:m] slice), and no
        # intermediate concat/trim copy ever touches HBM. A probe
        # column already narrowed to i32 skips the int64 pack entirely
        # (elementwise i64 emulation costs ~3.8 ms at 16M — measured,
        # scripts/probe_pack.py — ~8x the i32 form).
        kmin, key_bits = table.pack32
        key_lo = kmin - 1
        key_span = 1 << key_bits
        b32 = (((table.keys - key_lo) << 1) | 1).astype(jnp.int32)
        i32_ok = (
            probe_keys.dtype == jnp.int32
            # clamp-then-subtract stays in i32 iff both clamp bounds do
            and -(2**31) <= key_lo
            and key_lo + key_span - 1 < 2**31
        )
        if i32_ok:
            # clamp BEFORE the subtract (both bounds fit i32, so neither
            # the clip nor the shifted difference can wrap)
            pkc = jnp.clip(
                probe_keys,
                jnp.int32(key_lo),
                jnp.int32(key_lo + key_span - 1),
            )
            p32 = (pkc - jnp.int32(key_lo)) << 1
        else:
            p32 = (
                jnp.clip(probe_keys - key_lo, 0, key_span - 1) << 1
            ).astype(jnp.int32)

        bc = _count_side_bc(p32, b32, m).astype(jnp.int64)
        return jnp.sum(bc), jnp.sum(bc * table.payloads)

    # remaining branches mix probe keys with int64 operands
    probe_keys = probe_keys.astype(jnp.int64)

    if kernel_ok and table.wide_ok and not allow_negative and m > 0:
        # WIDE key domain (span > 2^30, < 2^62): the same count-side
        # formulation as the packed-i32 path — probe-only limb-key sort
        # with the EARLY-STOPPED ladder, per-run limb merges against the
        # pre-sorted build stream, dense per-build-row counts from the
        # 64-bit counts kernel, psum = dot(bc, payloads). No payloads
        # in the sort, no unsort. (The fallback below would pay the
        # 2-operand stable int64 lax.sort — ~8x the i32 stage cost.)
        # When the build-time span_bits allows (<= 61), the probe sort
        # runs the SPLIT-PLANE route (_count_side_bc64_split): single
        # i32 compare plane + residue cargo + tie fixup — about half
        # the ladder ALU of the limb compare.
        key_lo = table.keys[0] - 1
        key_hi = table.keys[-1] + 1
        b64 = ((table.keys - key_lo) << 1) | 1
        pcl = jnp.clip(probe_keys, key_lo, key_hi)
        p64 = (pcl - key_lo) << 1
        sb = table.span_bits
        split_ok = sb is not None and 30 < sb <= 61
        if WIDE_COUNT_ROUTE == "split1" and split_ok:
            bc = _count_side_bc64_split1(p64, b64, m, sb - 30).astype(
                jnp.int64
            )
        elif WIDE_COUNT_ROUTE == "split" and split_ok:
            bc = _count_side_bc64_split(p64, b64, m, sb - 30).astype(
                jnp.int64
            )
        else:
            bc = _count_side_bc64(p64, b64, m).astype(jnp.int64)
        return jnp.sum(bc), jnp.sum(bc * table.payloads)

    if table.pack is not None and not allow_negative:
        # ONE-operand sort: (key', payload-or-tag) packed into an int64.
        # Builds carry even fields (pay*2), probes the all-ones odd tag,
        # so builds order before probes at equal keys without stability.
        # Probe keys outside the build range clamp to key' 0 / key_span —
        # runs with no builds, mult 0 — so packing is unconditionally
        # exact.
        kmin, key_bits, pay_bits = table.pack
        key_lo = kmin - 1
        key_span = 1 << key_bits
        tag = (1 << pay_bits) - 1
        bpacked = ((table.keys - key_lo) << pay_bits) | (table.payloads << 1)
        pclamped = jnp.clip(probe_keys - key_lo, 0, key_span - 1)
        ppacked = (pclamped << pay_bits) | tag
        s = jax.lax.sort(
            [jnp.concatenate([bpacked, ppacked])], num_keys=1
        )[0]
        if use_kernel is None:
            use_kernel = jax.default_backend() != "cpu"
        if use_kernel and pay_bits <= 31:
            # decode inside the kernel: only the packed limbs cross HBM
            from ccve_tpu.kernels.merge_scan import merge_scan_stats_packed

            mult, psum = merge_scan_stats_packed(s, pay_bits)
            return jnp.sum(mult.astype(jnp.int64)), jnp.sum(psum)
        sk = s >> pay_bits
        field = s & tag
        st = jnp.where(field == tag, 0, field + 1)  # kernel tag convention
    else:
        keys = jnp.concatenate([table.keys, probe_keys])
        st0 = jnp.concatenate(
            [table.payloads * 2 + 1, jnp.zeros(n, jnp.int64)]
        )
        sk, st = jax.lax.sort([keys, st0], num_keys=1, is_stable=True)

    if use_kernel is None:
        # auto: any accelerator backend (the axon plugin reports its own
        # name, so test for not-cpu rather than 'tpu')
        use_kernel = not allow_negative and jax.default_backend() != "cpu"
    if use_kernel:
        from ccve_tpu.kernels.merge_scan import merge_scan_stats

        mult, psum = merge_scan_stats(sk, st)
        return jnp.sum(mult.astype(jnp.int64)), jnp.sum(psum)

    from ccve_tpu.ops.scan_utils import cumsum_i64_limbs, cumsum_small_i32

    is_build = (st & 1) > 0
    ib = is_build.astype(jnp.int32)
    c = cumsum_small_i32(ib)  # MXU block scan (see ops/scan_utils.py)
    bpay = jnp.where(is_build, st >> 1, 0)
    pc = cumsum_i64_limbs(bpay)

    run_start = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    base_c = _segment_base(run_start, c - ib, monotone=True)
    base_p = _segment_base(run_start, pc - bpay, monotone=not allow_negative)

    mult = jnp.where(is_build, 0, c - base_c)
    psum = jnp.where(is_build, 0, pc - base_p)
    return jnp.sum(mult.astype(jnp.int64)), jnp.sum(psum)


def _sorted_expand_pallas(
    table: SortedTable,
    probe_keys: jax.Array,
    capacity: int,
    tile_log: int | None,
):
    """sorted_expand on the multi-plane Pallas sort: the merged stream
    comes from one probe-only pair sort + one unequal merge (cargo =
    payload-or-row i32, as in `_sorted_match_stats_pallas`), and the
    final validity-keyed compaction of the F*(m+n) candidates is ONE
    multi-plane sort — key = probe row (invalid candidates keyed n,
    sorting past the [:capacity] window), cargo = (key', payload) i32
    planes — instead of the 4-operand stable int64 lax.sort."""
    from ccve_tpu.kernels import bigsort as bs
    from ccve_tpu.kernels import pairsort as ps
    from ccve_tpu.ops.scan_utils import cumsum_small_i32

    tl = bs.TILE_LOG if tile_log is None else tile_log
    n = probe_keys.shape[0]
    F = max(int(table.max_mult), 1)
    kmin, _ = table.pack32
    key_lo = kmin - 1

    b32, p32 = _pack32_streams(table, probe_keys)
    bval = table.payloads.astype(jnp.int32)
    pval = jnp.arange(n, dtype=jnp.int32)
    sp_k, (sp_v,) = ps.pallas_sort_multi_i32(p32, [pval], tile_log=tl)
    sk, (sval,) = ps.merge_sorted_multi_i32(
        sp_k, [sp_v], b32, [bval], tile_log=tl
    )

    is_build = (sk & 1) == 0
    ib = is_build.astype(jnp.int32)
    c = cumsum_small_i32(ib)
    kk = sk >> 1
    run_start = jnp.concatenate([jnp.ones(1, bool), kk[1:] != kk[:-1]])
    base_c = _segment_base(run_start, c - ib, monotone=True)
    ordv = c - base_c
    total = jnp.sum(jnp.where(is_build, 0, ordv).astype(jnp.int64))

    key2_f, mkey_f, pay_f = [], [], []
    for f in range(1, F + 1):
        src = is_build & (ordv == f)
        payf = _segment_base(src, jnp.where(src, sval, 0), monotone=False)
        valid = (~is_build) & (ordv >= f)
        key2_f.append(jnp.where(valid, sval, jnp.int32(n)))
        mkey_f.append(kk)
        pay_f.append(payf)

    key2 = jnp.concatenate(key2_f)
    nc = key2.shape[0]
    if nc % 128 == 0:
        # stream compaction beats the compaction SORT ~15x at this scale
        # (kernels/compact.py ring kernel: 834M rows/s vs the multi-plane
        # sort's — and vs XLA's 53.6M — measured 2026-08-19); output
        # order becomes merged-stream order, a triple-multiset no-op
        from ccve_tpu.kernels.compact import pallas_compact_i32

        planes = jnp.stack(
            [key2, jnp.concatenate(mkey_f), jnp.concatenate(pay_f)]
        )
        packed, _cnt = pallas_compact_i32(planes, key2 != jnp.int32(n))
        rows2, mk2, pv2 = packed[0], packed[1], packed[2]
        # invalid tail slots hold junk — mask by `total` below as before,
        # but rows must read n (the sentinel) past the valid prefix
        idxc = jnp.arange(nc, dtype=jnp.int32)
        rows2 = jnp.where(idxc < _cnt, rows2, jnp.int32(n))
    else:
        rows2, (mk2, pv2) = ps.pallas_sort_multi_i32(
            key2,
            [jnp.concatenate(mkey_f), jnp.concatenate(pay_f)],
            tile_log=tl,
        )
    pad = max(capacity - key2.shape[0], 0)
    if pad:
        rows2 = jnp.concatenate([rows2, jnp.full(pad, n, jnp.int32)])
        mk2 = jnp.concatenate([mk2, jnp.zeros(pad, jnp.int32)])
        pv2 = jnp.concatenate([pv2, jnp.zeros(pad, jnp.int32)])
    idx = jnp.arange(capacity, dtype=jnp.int64)
    live = idx < total
    out_rows = jnp.where(live, rows2[:capacity], -1)
    out_keys = jnp.where(
        live, mk2[:capacity].astype(jnp.int64) + key_lo, 0
    )
    out_pays = jnp.where(live, pv2[:capacity].astype(jnp.int64), 0)
    return out_rows, out_keys, out_pays, total


# Compile-safe probe rows per expand program, measured on chip
# (2026-08-21): the expand program's compile time scales superlinearly
# with shape — 1M: 383 s, 2M: 484 s, 4M: killed at 55 min, 16M: killed
# the relay at ~70 min (PERF_NOTES r4/r5). 2M is the largest tile that
# compiles in minutes; per-row runtime also improves 1M -> 2M
# (39 -> 23.5 ms per 1M rows), so 2M is the product default on both
# axes.
EXPAND_TILE_ROWS = 2_097_152


def sorted_expand_tiled(
    table: SortedTable,
    probe_keys,
    tile_rows: int | None = None,
    use_kernel: bool | None = None,
    tile_log: int | None = None,
):
    """Capacity auto-tiling for `sorted_expand` — the product answer to
    the compile wall (VERDICT r4 #1): probe streams longer than
    `EXPAND_TILE_ROWS` are split into fixed-size tiles, ONE jitted
    tile-shaped program serves all of them (expansion is independent
    per probe row, so tiling is exact), and each tile's `rows` are
    returned in GLOBAL probe coordinates.

    The last tile is padded with a sentinel key strictly below the
    table's smallest key (one 1-element device read — the build is
    sorted), which matches nothing on both the packed-kernel and
    fallback routes. Returns (tiles, total): `tiles` is a list of
    (rows i64[cap], keys i64[cap], payloads i64[cap], total i64)
    per-tile tuples with cap = tile_rows * max_mult, `total` the grand
    total as a python int (reading it is the only synchronization)."""
    probe_keys = jnp.asarray(probe_keys).reshape(-1)
    n = probe_keys.shape[0]
    tile = int(tile_rows or EXPAND_TILE_ROWS)
    if n <= tile:
        out = sorted_expand(
            table, probe_keys, n * max(int(table.max_mult), 1),
            use_kernel=use_kernel, tile_log=tile_log,
        )
        return [out], int(out[3])

    kmin = int(np.asarray(table.keys[:1])[0])
    if kmin == np.iinfo(np.int64).min:
        raise ValueError(
            "cannot synthesize a below-range pad key: the build table's "
            "smallest key is INT64_MIN; pass a tile_rows dividing the "
            "probe length instead"
        )
    pad = (-n) % tile
    if pad:
        probe_keys = jnp.concatenate(
            [probe_keys, jnp.full(pad, kmin - 1, jnp.int64)]
        )
    cap = tile * max(int(table.max_mult), 1)
    one_tile = _expand_tile_fn(cap, use_kernel, tile_log)
    tiles = [
        one_tile(table, probe_keys[s : s + tile], jnp.int64(s))
        for s in range(0, n + pad, tile)
    ]
    # ONE host sync for the whole stream: the per-tile totals are summed
    # on device and read back once (per-tile int() readbacks would pay
    # 8 relay round trips; a fresh jit closure per call would re-trace —
    # both measured, PERF_NOTES r5 materialize)
    grand = jnp.sum(jnp.stack([t[3] for t in tiles]))
    return tiles, int(grand)


@functools.lru_cache(maxsize=None)
def _expand_tile_fn(cap: int, use_kernel, tile_log):
    """ONE jitted tile program per (cap, flags): the table rides as a
    traced pytree argument, so every `sorted_expand_tiled` call (and
    every same-shape table) reuses the same compiled executable instead
    of re-tracing a fresh closure per invocation."""

    @jax.jit
    def one_tile(table, p, offset):
        rows, ck, cp, total = sorted_expand(
            table, p, cap, use_kernel=use_kernel, tile_log=tile_log
        )
        rows = jnp.where(
            rows >= 0, rows.astype(jnp.int64) + offset, jnp.int64(-1)
        )
        return rows, ck, cp, total

    return one_tile


def sorted_expand(
    table: SortedTable,
    probe_keys: jax.Array,
    capacity: int,
    use_kernel: bool | None = None,
    tile_log: int | None = None,
):
    """Materialize ALL matched (probe_row, build_key, build_payload)
    triples of one join level — gather-free. The reference materializes
    through per-row payload gathers (GatherResult, chaining_ht.cpp:126-
    136); on TPU the same output falls out of the merged sorted stream:

      1. ONE stable 3-operand sort of build∪probe (key, payload, row).
      2. Per-run build ordinals / per-probe build counts via the same
         prefix scans as `sorted_match_stats`.
      3. For f = 1..max_mult (static): the f-th build's payload
         propagates to every probe of its run with one segmented
         copy-last scan; a probe with >= f builds emits one triple.
      4. ONE validity-keyed sort compacts the F*(m+n) candidates to the
         front; the static `capacity` prefix is returned.

    Work is O(F * (m+n) log) with NO random-access gathers and no
    intermediate wider than F*(m+n) (vs the candidate-grid expansion's
    per-level probe of every slot). Returns (rows i32[capacity],
    keys i64[capacity], payloads i64[capacity], total_matches i64);
    slots past the match count carry row == -1. `capacity` bounds the
    RETURNED rows only — total_matches reports overflow."""
    kernel_ok = (
        jax.default_backend() != "cpu" if use_kernel is None else use_kernel
    )
    if (
        kernel_ok
        and table.pack32 is not None
        and table.pack32[1] <= 29
        and table.pay32
    ):
        return _sorted_expand_pallas(table, probe_keys, capacity, tile_log)
    m = table.keys.shape[0]
    n = probe_keys.shape[0]
    F = max(int(table.max_mult), 1)

    keys = jnp.concatenate([table.keys, probe_keys.astype(jnp.int64)])
    pay = jnp.concatenate([table.payloads, jnp.zeros(n, jnp.int64)])
    row = jnp.concatenate(
        [jnp.full(m, -1, jnp.int32), jnp.arange(n, dtype=jnp.int32)]
    )
    sk, spay, srow = jax.lax.sort(
        [keys, pay, row], num_keys=1, is_stable=True
    )

    is_build = srow < 0
    ib = is_build.astype(jnp.int32)
    c = jnp.cumsum(ib)
    run_start = jnp.concatenate([jnp.ones(1, bool), sk[1:] != sk[:-1]])
    base_c = _segment_base(run_start, c - ib, monotone=True)
    # builds: 1-based in-run ordinal; probes: the run's build count
    # (builds precede probes at equal keys: table first + stable sort)
    ordv = c - base_c
    total = jnp.sum(jnp.where(is_build, 0, ordv).astype(jnp.int64))

    rows_f, keys_f, pays_f, valid_f = [], [], [], []
    for f in range(1, F + 1):
        src = is_build & (ordv == f)
        pay_f = _segment_base(src, spay, monotone=False)
        valid = (~is_build) & (ordv >= f)
        rows_f.append(srow)
        keys_f.append(sk)
        pays_f.append(pay_f)
        valid_f.append(valid)

    flag = jnp.concatenate(
        [(~v).astype(jnp.int32) for v in valid_f]
    )
    rows = jnp.concatenate(rows_f)
    mkeys = jnp.concatenate(keys_f)
    mpays = jnp.concatenate(pays_f)
    _, rows_s, keys_s, pays_s = jax.lax.sort(
        [flag, rows, mkeys, mpays], num_keys=1, is_stable=True
    )
    valid_n = jnp.sum(1 - flag)
    pad = max(capacity - rows.shape[0], 0)
    if pad:
        rows_s = jnp.concatenate([rows_s, jnp.full(pad, -1, jnp.int32)])
        keys_s = jnp.concatenate([keys_s, jnp.zeros(pad, jnp.int64)])
        pays_s = jnp.concatenate([pays_s, jnp.zeros(pad, jnp.int64)])
    idx = jnp.arange(capacity, dtype=jnp.int32)
    out_rows = jnp.where(idx < valid_n, rows_s[:capacity], -1)
    out_keys = jnp.where(idx < valid_n, keys_s[:capacity], 0)
    out_pays = jnp.where(idx < valid_n, pays_s[:capacity], 0)
    return out_rows, out_keys, out_pays, total
