"""Multi-plane hybrid sort (kernels/pairsort.py) vs NumPy — interpret
mode on CPU with shrunken tiles so the in-VMEM Batcher, the alternating
bitonic merge-path levels, and the unequal two-run merge all run."""

import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu
import pytest

from ccve_tpu.kernels.pairsort import (
    merge_sorted_multi_i32,
    pallas_sort_multi_i32,
)

TILE_LOG = 11


def _check_pairs(k, vs):
    """Keys must come back sorted; each (key, *values) tuple must
    survive as a multiset (the sort is unstable but pair-preserving)."""
    with pltpu.force_tpu_interpret_mode():
        gk, gvs = pallas_sort_multi_i32(
            jnp.asarray(k), [jnp.asarray(v) for v in vs], tile_log=TILE_LOG
        )
    gk = np.asarray(gk)
    assert np.array_equal(gk, np.sort(k))
    got = {tuple(t) for t in np.stack([gk, *map(np.asarray, gvs)], axis=1)}
    ref = {tuple(t) for t in np.stack([k, *vs], axis=1)}
    assert got == ref


@pytest.mark.slow
@pytest.mark.parametrize("n", [100, 4095, 4096, 5000, 16384, 16385])
@pytest.mark.parametrize("n_planes", [1, 3])
def test_pairsort_random(n, n_planes):
    rng = np.random.default_rng(n + n_planes)
    k = rng.integers(-(1 << 30), 1 << 30, n, dtype=np.int32)
    # distinct tuples: plane 0 is a permutation id
    vs = [np.arange(n, dtype=np.int32)] + [
        rng.integers(-(1 << 31), (1 << 31) - 1, n, dtype=np.int32)
        for _ in range(n_planes - 1)
    ]
    _check_pairs(k, vs)


@pytest.mark.slow
def test_pairsort_duplicate_keys_keep_pairing():
    rng = np.random.default_rng(5)
    n = 20000
    k = rng.integers(0, 40, n).astype(np.int32)  # heavy duplicates
    v = np.arange(n, dtype=np.int32)
    _check_pairs(k, [v])


@pytest.mark.slow
def test_pairsort_matches_stable_argsort_values_per_key():
    """Per-key value multisets must match a stable argsort exactly."""
    rng = np.random.default_rng(11)
    n = 9000
    k = rng.integers(0, 100, n).astype(np.int32)
    v = rng.integers(0, 1 << 20, n).astype(np.int32)
    with pltpu.force_tpu_interpret_mode():
        gk, (gv,) = pallas_sort_multi_i32(
            jnp.asarray(k), [jnp.asarray(v)], tile_log=TILE_LOG
        )
    order = np.argsort(k, kind="stable")
    gk, gv = np.asarray(gk), np.asarray(gv)
    assert np.array_equal(gk, k[order])
    for key in np.unique(k):
        assert sorted(gv[gk == key]) == sorted(v[k == key])


def test_merge_sorted_multi():
    rng = np.random.default_rng(7)
    for nA, nB in [(16384, 2048), (5000, 3000), (300, 40), (100, 12288)]:
        ak = np.sort(rng.integers(0, 1 << 20, nA).astype(np.int32))
        bk = np.sort(rng.integers(0, 1 << 20, nB).astype(np.int32))
        av = rng.integers(0, 1 << 30, nA).astype(np.int32)
        bv = rng.integers(0, 1 << 30, nB).astype(np.int32)
        with pltpu.force_tpu_interpret_mode():
            gk, (gv,) = merge_sorted_multi_i32(
                jnp.asarray(ak), [jnp.asarray(av)],
                jnp.asarray(bk), [jnp.asarray(bv)],
                tile_log=TILE_LOG,
            )
        allk = np.concatenate([ak, bk])
        assert np.array_equal(np.asarray(gk), np.sort(allk))
        got = {tuple(t) for t in np.stack([gk, gv], axis=1).tolist()}
        ref = {
            tuple(t)
            for t in np.stack(
                [allk, np.concatenate([av, bv])], axis=1
            ).tolist()
        }
        assert got == ref


# ---------------------------------------------------------------------------
# 64-bit limb-key sort (wide key domains)
# ---------------------------------------------------------------------------


@pytest.mark.slow
@pytest.mark.parametrize("n", [5000, 16384, 16385])
def test_pairsort64_random_wide_span(n):
    """int64 keys spanning ~2^40 with a cargo plane: sorted order must
    match numpy, and each cargo value must stay attached to its key."""
    import jax.numpy as jnp

    from ccve_tpu.kernels.pairsort import pallas_sort_multi_i64

    rng = np.random.default_rng(42)
    keys = rng.integers(-(2**40), 2**40, n, dtype=np.int64)
    vals = np.arange(n, dtype=np.int32)
    with pltpu.force_tpu_interpret_mode():
        sk, (sv,) = pallas_sort_multi_i64(
            jnp.asarray(keys), [jnp.asarray(vals)], tile_log=10
        )
    sk, sv = np.asarray(sk), np.asarray(sv)
    assert np.array_equal(sk, np.sort(keys))
    # pairing: the value must point back at an equal key
    assert np.array_equal(keys[sv], sk)


@pytest.mark.slow
def test_merge_sorted64_unequal():
    from ccve_tpu.kernels.pairsort import merge_sorted_multi_i64
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    a = np.sort(rng.integers(-(2**50), 2**50, 9000, dtype=np.int64))
    b = np.sort(rng.integers(-(2**50), 2**50, 1500, dtype=np.int64))
    av = np.arange(9000, dtype=np.int32)
    bv = np.arange(1500, dtype=np.int32) + 100_000
    with pltpu.force_tpu_interpret_mode():
        mk, (mv,) = merge_sorted_multi_i64(
            jnp.asarray(a), [jnp.asarray(av)],
            jnp.asarray(b), [jnp.asarray(bv)], tile_log=10,
        )
    mk, mv = np.asarray(mk), np.asarray(mv)
    assert np.array_equal(mk, np.sort(np.concatenate([a, b])))
    both = np.concatenate([a, b])
    vals = np.concatenate([av, bv])
    # pairing: each merged value plane entry maps to an equal key
    lookup = dict(zip(vals.tolist(), both.tolist()))
    assert all(lookup[int(v)] == int(k) for v, k in zip(mv, mk))


@pytest.mark.slow
@pytest.mark.parametrize("cap", [0, 1, 3, None])
def test_pairsort_multi_i32_runs_capped(cap):
    """Early-stopped multi-plane i32 ladder (`pallas_sort_multi_i32_runs`):
    every 2^run_log run must be ASCENDING-sorted (force_asc on the last
    executed level), key/value pairs stay attached, and the run set is a
    permutation of the input."""
    import jax.numpy as jnp

    from ccve_tpu.kernels.pairsort import I32_MAX, pallas_sort_multi_i32_runs

    rng = np.random.default_rng(3)
    n = 9000
    keys = rng.integers(0, 5000, n).astype(np.int32)
    vals = np.arange(n, dtype=np.int32)
    with pltpu.force_tpu_interpret_mode():
        sk, (sv,), run_log = pallas_sort_multi_i32_runs(
            jnp.asarray(keys), [jnp.asarray(vals)],
            tile_log=10, n_levels_cap=cap,
        )
    sk, sv = np.asarray(sk), np.asarray(sv)
    run = 1 << run_log  # the final run may be partial; consumers pad
    for s in range(0, sk.shape[0], run):
        assert np.all(np.diff(sk[s : s + run]) >= 0), s
    real = sk < I32_MAX
    assert np.array_equal(sk[real], keys[sv[real]])
    assert np.sort(sv[real]).tolist() == list(range(n))
