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
