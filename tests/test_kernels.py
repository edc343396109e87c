"""Pallas kernels vs their XLA/NumPy references (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from ccve_tpu.kernels.compact import pallas_compact
from ccve_tpu.kernels.murmur import murmurhash64_pallas
from ccve_tpu.ops.hashing import murmurhash64_np


def test_murmur_pallas_bit_exact():
    rng = np.random.default_rng(0)
    x = rng.integers(-(2**63), 2**63, size=4096, dtype=np.int64)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(murmurhash64_pallas(jnp.asarray(x)))
    np.testing.assert_array_equal(got, murmurhash64_np(x))


def test_murmur_pallas_unaligned_length():
    x = np.arange(1000, dtype=np.int64) * 7919 - 12345
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(murmurhash64_pallas(jnp.asarray(x)))
    np.testing.assert_array_equal(got, murmurhash64_np(x))


@pytest.mark.parametrize("c", [1, 3])
def test_pallas_compact_matches_numpy(c):
    rng = np.random.default_rng(1)
    n = 2048
    cols = rng.integers(-(2**62), 2**62, size=(c, n), dtype=np.int64)
    mask = rng.random(n) < 0.3
    with pltpu.force_tpu_interpret_mode():
        out, count = pallas_compact(jnp.asarray(cols), jnp.asarray(mask))
    out, count = np.asarray(out), int(count)
    assert count == int(mask.sum())
    np.testing.assert_array_equal(out[:, :count], cols[:, mask])


def test_pallas_compact_all_and_none():
    n = 1024
    cols = np.arange(n, dtype=np.int64).reshape(1, n)
    with pltpu.force_tpu_interpret_mode():
        out, count = pallas_compact(
            jnp.asarray(cols), jnp.ones(n, dtype=bool)
        )
        assert int(count) == n
        np.testing.assert_array_equal(np.asarray(out), cols)
        _, count0 = pallas_compact(
            jnp.asarray(cols), jnp.zeros(n, dtype=bool)
        )
        assert int(count0) == 0


@pytest.mark.slow
def test_merge_scan_stats_matches_xla_path():
    import jax

    from ccve_tpu.core.datagen import gen_rhs_table
    from ccve_tpu.kernels.merge_scan import merge_scan_stats
    from ccve_tpu.ops.sort_merge import build_sorted, sorted_match_stats

    keys, payloads = gen_rhs_table(300, 3)
    table = build_sorted(keys, payloads)
    rng = np.random.default_rng(11)
    probe = jnp.asarray(rng.integers(0, keys.max() + 2, 2500).astype(np.int64))

    ref = sorted_match_stats(table, probe)  # XLA path, aligned

    m = table.keys.shape[0]
    merged_keys = jnp.concatenate([table.keys, probe])
    tagged = jnp.concatenate(
        [table.payloads * 2 + 1, jnp.zeros(probe.shape[0], jnp.int64)]
    )
    sk, st = jax.lax.sort([merged_keys, tagged], num_keys=1, is_stable=True)
    with pltpu.force_tpu_interpret_mode():
        mult, psum = merge_scan_stats(sk, st)
    assert int(mult.astype(jnp.int64).sum()) == int(
        np.asarray(ref.mult).sum()
    )
    assert int(psum.sum()) == int(np.asarray(ref.psum).sum())


@pytest.mark.slow
def test_merge_scan_totals_via_kernel():
    import dataclasses

    from ccve_tpu.core.datagen import gen_rhs_table
    from ccve_tpu.ops.sort_merge import build_sorted, sorted_match_totals

    keys, payloads = gen_rhs_table(128, 2)
    # pack32=None pins the TAGGED-stream kernel path (the count-side u32
    # path would otherwise shadow it; it has its own tests below)
    table = dataclasses.replace(
        build_sorted(keys, payloads), pack=None, pack32=None
    )
    rng = np.random.default_rng(12)
    probe = jnp.asarray(rng.integers(0, keys.max() + 2, 1800).astype(np.int64))
    c_ref, p_ref = sorted_match_totals(table, probe, use_kernel=False)
    with pltpu.force_tpu_interpret_mode():
        c_k, p_k = sorted_match_totals(table, probe, use_kernel=True)
    assert int(c_k) == int(c_ref)
    assert int(p_k) == int(p_ref)


@pytest.mark.slow
def test_merge_scan_packed_kernel():
    import dataclasses

    from ccve_tpu.core.datagen import gen_rhs_table
    from ccve_tpu.ops.sort_merge import build_sorted, sorted_match_totals

    keys, payloads = gen_rhs_table(160, 3)
    table = dataclasses.replace(build_sorted(keys, payloads), pack32=None)
    assert table.pack is not None and table.pack[2] <= 31
    rng = np.random.default_rng(14)
    probe = jnp.asarray(
        rng.integers(-10, keys.max() + 20, 2100).astype(np.int64)
    )
    c_ref, p_ref = sorted_match_totals(table, probe, use_kernel=False)
    with pltpu.force_tpu_interpret_mode():
        c_k, p_k = sorted_match_totals(table, probe, use_kernel=True)
    assert int(c_k) == int(c_ref)
    assert int(p_k) == int(p_ref)


@pytest.mark.slow
def test_merge_scan_counts32_kernel():
    """Count-side u32 path vs the XLA scan path — duplicates, misses,
    out-of-range probes, and exact multiple-of-TILE sizes."""
    from ccve_tpu.ops.sort_merge import build_sorted, sorted_match_totals

    rng = np.random.default_rng(21)
    for m, n, dom in [(500, 3000, 400), (3, 10, 5), (1024, 4096, 1024)]:
        keys = rng.integers(0, dom, m).astype(np.int64)
        pays = rng.integers(0, 10_000, m).astype(np.int64)
        probe = jnp.asarray(rng.integers(-10, dom + 10, n).astype(np.int64))
        table = build_sorted(keys, pays)
        assert table.pack32 is not None
        c_ref, p_ref = sorted_match_totals(table, probe, use_kernel=False)
        with pltpu.force_tpu_interpret_mode():
            c_k, p_k = sorted_match_totals(table, probe, use_kernel=True)
        assert int(c_k) == int(c_ref), (m, n)
        assert int(p_k) == int(p_ref), (m, n)


@pytest.mark.slow
def test_merge_scan_counts32_negative_payloads():
    """The count-side path is exact for NEGATIVE payloads (they never
    enter a sort or a monotone scan — the dot carries the sign)."""
    from ccve_tpu.ops.sort_merge import build_sorted, sorted_match_totals

    rng = np.random.default_rng(22)
    keys = rng.integers(0, 300, 700).astype(np.int64)
    pays = rng.integers(-5000, 5000, 700).astype(np.int64)
    probe = jnp.asarray(rng.integers(0, 320, 2500).astype(np.int64))
    table = build_sorted(keys, pays)
    c_ref, p_ref = sorted_match_totals(
        table, probe, allow_negative=True, use_kernel=False
    )
    with pltpu.force_tpu_interpret_mode():
        c_k, p_k = sorted_match_totals(
            table, probe, allow_negative=True, use_kernel=True
        )
    assert int(c_k) == int(c_ref)
    assert int(p_k) == int(p_ref)


@pytest.mark.slow
def test_merge_counts_fused_matches_split_path():
    """Merge-fused counts kernel == merge + dense-counts chain."""
    import jax.numpy as jnp

    from ccve_tpu.kernels.merge_scan import (
        merge_counts_fused,
        merge_scan_build_counts,
    )

    rng = np.random.default_rng(3)
    for n, m in [(100_000, 30_000), (40_000, 70_000), (33_000, 100)]:
        dom = max(m, 1000)
        pk = np.sort(rng.integers(0, dom, n)).astype(np.int32) * 2
        bk = (np.sort(rng.integers(0, dom, m)).astype(np.int32) * 2) | 1
        s = np.sort(np.concatenate([pk, bk]))
        with pltpu.force_tpu_interpret_mode():
            ref = np.asarray(merge_scan_build_counts(jnp.asarray(s), m))
        nA = n + (-n) % (256 * 128)
        IMAX = np.int32(2**31 - 1)
        abuf = np.full(((nA // 128) + 264 + 8, 128), IMAX, np.int32)
        abuf.reshape(-1)[:n] = pk
        got = np.asarray(
            merge_counts_fused(
                jnp.asarray(abuf), nA, n, jnp.asarray(bk), m, interpret=True
            )
        )
        assert np.array_equal(got, ref), (n, m)


def test_merge_counts_fused_pure_tiles():
    """Builds clustered in a narrow key range: most merged tiles are
    pure-probe and take the kernel's closed-form fast path."""
    import jax.numpy as jnp

    from ccve_tpu.kernels.merge_scan import (
        merge_counts_fused,
        merge_scan_build_counts,
    )

    rng = np.random.default_rng(9)
    n, m = 300_000, 5_000
    pk = np.sort(rng.integers(0, 200_000, n)).astype(np.int32) * 2
    # builds only in [40_000, 40_500): tiles before/after are pure probe
    bk = (np.sort(rng.integers(40_000, 40_500, m)).astype(np.int32) * 2) | 1
    s = np.sort(np.concatenate([pk, bk]))
    with pltpu.force_tpu_interpret_mode():
        ref = np.asarray(merge_scan_build_counts(jnp.asarray(s), m))
    nA = n + (-n) % (256 * 128)
    IMAX = np.int32(2**31 - 1)
    abuf = np.full(((nA // 128) + 264 + 8, 128), IMAX, np.int32)
    abuf.reshape(-1)[:n] = pk
    got = np.asarray(
        merge_counts_fused(
            jnp.asarray(abuf), nA, n, jnp.asarray(bk), m, interpret=True
        )
    )
    assert np.array_equal(got, ref)


def test_merge_counts_fused_per_run_invocation():
    """Per-run invocation over one shared buffer (a_row_off +
    mask_a_end): counts are additive over probe sub-runs, so two
    back-to-back sorted runs scanned independently against the build
    stream must sum to the single-stream reference."""
    import jax.numpy as jnp

    from ccve_tpu.kernels.merge_scan import (
        merge_counts_fused,
        merge_scan_build_counts,
    )

    rng = np.random.default_rng(13)
    n1 = 256 * 128 * 2  # run 1: exactly 2 counts-tiles, 128-row aligned
    n2 = 40_000  # run 2: ragged tail
    m = 9_000
    dom = 50_000
    pk1 = np.sort(rng.integers(0, dom, n1)).astype(np.int32) * 2
    pk2 = np.sort(rng.integers(0, dom, n2)).astype(np.int32) * 2
    bk = (np.sort(rng.integers(0, dom, m)).astype(np.int32) * 2) | 1

    s = np.sort(np.concatenate([pk1, pk2, bk]))
    with pltpu.force_tpu_interpret_mode():
        ref = np.asarray(merge_scan_build_counts(jnp.asarray(s), m))

    IMAX = np.int32(2**31 - 1)
    rows = (n1 + n2 + (-n2) % 128) // 128 + 264 + 8
    abuf = np.full((rows, 128), IMAX, np.int32)
    abuf.reshape(-1)[:n1] = pk1
    abuf.reshape(-1)[n1 : n1 + n2] = pk2
    bkj = jnp.asarray(bk)
    a = jnp.asarray(abuf)
    got1 = np.asarray(
        merge_counts_fused(
            a, n1, n1, bkj, m, interpret=True, a_row_off=0,
            mask_a_end=True,
        )
    )
    got2 = np.asarray(
        merge_counts_fused(
            a, n2, n2, bkj, m, interpret=True, a_row_off=n1 // 128,
            mask_a_end=False,
        )
    )
    assert np.array_equal(got1 + got2, ref)


@pytest.mark.slow
def test_count_side_bc_partial_sort_path():
    """_count_side_bc (early-stopped partial sort + per-run counts)
    against a NumPy histogram oracle, at sizes that force multiple
    runs (3 tiles, cap 0 -> 3 runs at the 0.8*n/m heuristic)."""
    import jax.numpy as jnp

    from ccve_tpu.ops.sort_merge import _count_side_bc

    rng = np.random.default_rng(17)
    n, m, dom = 300_000, 5_000, 50_000
    pk = rng.integers(0, dom, n).astype(np.int32)  # UNSORTED probes
    bkeys = np.sort(rng.integers(0, dom, m)).astype(np.int32)
    p32 = jnp.asarray(pk * 2)
    b32 = jnp.asarray((bkeys * 2) | 1)
    with pltpu.force_tpu_interpret_mode():
        bc = np.asarray(_count_side_bc(p32, b32, m))
    hist = np.bincount(pk, minlength=dom)
    assert np.array_equal(bc, hist[bkeys])
