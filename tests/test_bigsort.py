"""Hybrid Batcher/merge-path sort (kernels/bigsort.py) vs np.sort —
interpret mode on CPU with shrunken tile/chunk parameters so every
phase (XLA batched pre-sort, tile-local Batcher levels, merge-path
levels incl. ragged tails and virtual pad runs) is exercised."""

import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu
import pytest

from ccve_tpu.kernels.bigsort import pallas_sort_i32

PARAMS = dict(tile_log=11, chunk_log=8)


def _check(x):
    ref = np.sort(x)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(pallas_sort_i32(jnp.asarray(x), **PARAMS))
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("n", [100, 2048, 4095, 5000, 16385, 33333])
def test_bigsort_random(n):
    rng = np.random.default_rng(n)
    _check(rng.integers(-(1 << 31), (1 << 31) - 1, n, dtype=np.int32))


@pytest.mark.slow
def test_bigsort_structured():
    rng = np.random.default_rng(3)
    _check(rng.integers(0, 50, 20000).astype(np.int32))  # heavy dups
    _check(np.full(10000, 7, np.int32))  # constant
    _check(np.arange(12000, dtype=np.int32))  # pre-sorted
    _check(np.arange(12000, dtype=np.int32)[::-1].copy())  # reversed


def test_merge_sorted_two_runs():
    from ccve_tpu.kernels.bigsort import merge_sorted_i32

    rng = np.random.default_rng(7)
    for nA, nB in [(16384, 2048), (8192, 8192), (5000, 3000), (300, 40),
                   (12288, 100), (100, 12288)]:
        a = np.sort(rng.integers(0, 1 << 20, nA).astype(np.int32))
        b = np.sort(rng.integers(0, 1 << 20, nB).astype(np.int32))
        ref = np.sort(np.concatenate([a, b]))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(
                merge_sorted_i32(
                    jnp.asarray(a), jnp.asarray(b), tile_log=11
                )
            )
        assert np.array_equal(got, ref), (nA, nB)


@pytest.mark.slow
def test_carried_merge_matches_split_path():
    """The carried-cursor merge levels (SMEM crossover counting, desc
    pairs in complement space) must equal the merge-path-split kernel
    exactly on distinct keys, at every cap, across odd/even/truncated
    tile counts."""
    from jax.experimental.pallas import tpu as pltpu

    from ccve_tpu.kernels import bigsort as bs

    rng = np.random.default_rng(5)
    tl, cl = 11, 8
    tile = 1 << tl
    for nt in [2, 3, 5, 13]:
        n_pad = nt * tile
        x = rng.permutation(
            np.arange(-n_pad // 2, n_pad - n_pad // 2, dtype=np.int32)
        )  # distinct values: outputs must match element-for-element
        with pltpu.force_tpu_interpret_mode():
            for cap in [None, 1, 2]:
                got_c = np.asarray(
                    bs._sort_padded_buf(
                        jnp.asarray(x), tl, cl, n_levels_cap=cap,
                        carried=True,
                    )
                ).reshape(-1)[:n_pad]
                got_s = np.asarray(
                    bs._sort_padded_buf(
                        jnp.asarray(x), tl, cl, n_levels_cap=cap,
                        carried=False,
                    )
                ).reshape(-1)[:n_pad]
                assert np.array_equal(got_c, got_s), (nt, cap)


@pytest.mark.slow
def test_carried_merge_tie_heavy():
    """Massive duplicates: crossover ties may attribute equal values to
    either stream — the multiset and per-run ordering must still hold."""
    from jax.experimental.pallas import tpu as pltpu

    from ccve_tpu.kernels import bigsort as bs

    rng = np.random.default_rng(6)
    tl, cl = 11, 8
    tile = 1 << tl
    for nt, dom in [(5, 7), (13, 3), (8, 1)]:
        n_pad = nt * tile
        x = rng.integers(0, dom, n_pad).astype(np.int32)
        with pltpu.force_tpu_interpret_mode():
            for cap in [None, 2]:
                got = np.asarray(
                    bs._sort_padded_buf(
                        jnp.asarray(x), tl, cl, n_levels_cap=cap,
                        carried=True,
                    )
                ).reshape(-1)
                n_levels = max(nt - 1, 0).bit_length()
                k = n_levels if cap is None else min(cap, n_levels)
                run = tile << k
                for s in range(0, n_pad, run):
                    r = got[s : min(s + run, n_pad)]
                    assert (np.diff(r) >= 0).all(), (nt, dom, cap, s)
                assert np.array_equal(np.sort(got[:n_pad]), np.sort(x))


def test_prefix_sum_mxu_matches_ladder():
    """MXU matmul prefix sum == flat cumsum on the row-major layout.
    (The Hillis ladder itself needs pltpu.roll, which only evaluates
    inside a kernel — NumPy is the oracle here.)"""
    import jax

    from ccve_tpu.kernels import flatvec as fv

    rng = np.random.default_rng(7)
    for R in [32, 64, 256]:
        xh = rng.integers(0, 2, (R, 128)).astype(np.int32)
        ref = np.cumsum(xh.reshape(-1)).reshape(R, 128).astype(np.int32)
        with jax.enable_x64(False):
            b = np.asarray(fv.prefix_sum_i32_mxu(jnp.asarray(xh), R))
        assert np.array_equal(ref, b), R
