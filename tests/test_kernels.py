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
