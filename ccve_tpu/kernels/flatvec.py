"""Shared Pallas helpers: flat-order shifts, scans, and u32-limb int64
arithmetic over [R, 128] tiles.

The TPU VPU operates on [sublane, lane] registers with no cross-lane
random access; treating an [R, 128] tile as a FLAT row-major vector, a
shift by s is a lane roll stitched with a sublane roll (`pltpu.roll`
supports dynamic shifts). Prefix sums/maxima are Hillis-Steele ladders of
those shifts. int64 values travel as (hi, lo) i32 limb pairs — Mosaic has
no 64-bit types — with two's-complement add/sub/compare built from u32
primitives (unsigned compare via the sign-bias trick).

Used by kernels/compact.py (butterfly compaction) and
kernels/merge_scan.py (fused sort-merge scans).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

I32_MIN = -(1 << 31)


def iota2(R: int, dim: int):
    return jax.lax.broadcasted_iota(jnp.int32, (R, 128), dim)


def flat_index(R: int):
    return iota2(R, 0) * 128 + iota2(R, 1)


def shift_flat_left(x, s: int, R: int):
    """out[i] = x[(i + s) % T] over flat row-major [R, 128]."""
    q, rem = divmod(s, 128)
    y = pltpu.roll(x, (R - q) % R, axis=0) if q % R else x
    if rem:
        a = pltpu.roll(y, 128 - rem, axis=1)
        b = pltpu.roll(a, R - 1, axis=0)
        y = jnp.where(iota2(R, 1) < 128 - rem, a, b)
    return y


def shift_flat_right(x, s: int, R: int, fill):
    """out[i] = x[i - s], `fill` below i = s."""
    q, rem = divmod(s, 128)
    y = pltpu.roll(x, q % R, axis=0) if q % R else x
    if rem:
        a = pltpu.roll(y, rem, axis=1)
        b = pltpu.roll(a, 1, axis=0)
        y = jnp.where(iota2(R, 1) >= rem, a, b)
    return jnp.where(flat_index(R) >= s, y, fill)


def shift_flat_right_dyn(x, s, R: int, fill=0):
    """out[i] = x[i - s], `fill` below i = s; `s` is a TRACED scalar in
    [0, R*128) (pltpu.roll supports dynamic shift amounts)."""
    q = jax.lax.shift_right_logical(s, 7)  # s // 128
    rem = s & 127
    y = pltpu.roll(x, q, axis=0)
    a = pltpu.roll(y, rem, axis=1)
    b = pltpu.roll(a, 1, axis=0)
    y = jnp.where(iota2(R, 1) >= rem, a, b)
    return jnp.where(flat_index(R) >= s, y, fill)


def shift_flat_left_dyn(x, s, R: int, fill=0):
    """out[i] = x[i + s], `fill` at i >= R*128 - s; `s` TRACED in
    [0, R*128)."""
    q = jax.lax.shift_right_logical(s, 7)
    rem = s & 127
    y = pltpu.roll(x, jnp.where(q == 0, 0, R - q), axis=0)
    a = pltpu.roll(y, jnp.where(rem == 0, 0, 128 - rem), axis=1)
    b = pltpu.roll(a, R - 1, axis=0)
    y = jnp.where(iota2(R, 1) < 128 - rem, a, b)
    return jnp.where(flat_index(R) < R * 128 - s, y, fill)


def butterfly_compact(vals, m, R: int, n_rounds: int, rank=None):
    """Pack masked elements of flat [R, 128] arrays to the front
    (order-preserving). `m` is an int32 0/1 mask; `rank` (optional) is
    its precomputed INCLUSIVE prefix sum — callers that already have it
    (e.g. from a fused scan) skip a ladder. Elements move left by their
    hole deficit one power-of-two bit per round (LSB first) —
    collision-free because the deficit is monotone."""
    if rank is None:
        rank = prefix_sum_i32(m, R, n_rounds)
    d = jnp.where(m > 0, flat_index(R) - (rank - m), 0)
    valid = m > 0
    for b in range(n_rounds):
        s = 1 << b
        sd = shift_flat_left(d, s, R)
        sv = shift_flat_left(valid.astype(jnp.int32), s, R) > 0
        incoming = sv & (((sd >> b) & 1) > 0)
        resident = valid & (((d >> b) & 1) == 0)
        vals = [jnp.where(incoming, shift_flat_left(v, s, R), v) for v in vals]
        d = jnp.where(incoming, sd, d)
        valid = incoming | resident
    return vals


def prefix_sum_i32(x, R: int, n_rounds: int):
    """Inclusive flat prefix sum (Hillis-Steele)."""
    acc = x
    for b in range(n_rounds):
        acc = acc + shift_flat_right(acc, 1 << b, R, 0)
    return acc


def prefix_sum_i32_mxu(x, R: int):
    """Inclusive flat prefix sum via three MXU matmuls: within-row
    prefix (x @ upper-tri), row totals (x @ ones), and row offsets
    (strict-lower-tri @ totals). EXACT while the total stays < 2^24
    (f32 integer window) — the counts kernels' tile sums are <= R*128.
    ~3 pass-equivalents instead of log2(R*128) Hillis rounds of
    shift+add; use inside large-tile kernels (R >= 32)."""
    xf = x.astype(jnp.float32)
    k = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    upper = (k <= j).astype(jnp.float32)
    row_prefix = jax.lax.dot(xf, upper)
    row_tot = jax.lax.dot(xf, jnp.ones((128, 128), jnp.float32))
    r = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    q = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    strict_lower = (q < r).astype(jnp.float32)
    offs = jax.lax.dot(strict_lower, row_tot)
    return (row_prefix + offs).astype(jnp.int32)


def prefix_max_i32(x, R: int, n_rounds: int):
    """Inclusive flat prefix max."""
    acc = x
    for b in range(n_rounds):
        acc = jnp.maximum(acc, shift_flat_right(acc, 1 << b, R, I32_MIN))
    return acc


# ---------------------------------------------------------------------------
# u32-limb int64 arithmetic on (hi, lo) i32 pairs
# ---------------------------------------------------------------------------


def _ult(a, b):
    """Unsigned < on i32 bit patterns (sign-bias trick)."""
    bias = jnp.int32(I32_MIN)
    return (a ^ bias) < (b ^ bias)


def add64(ahi, alo, bhi, blo):
    lo = alo + blo  # wrapping two's complement == unsigned wrap
    carry = _ult(lo, alo).astype(jnp.int32)
    return ahi + bhi + carry, lo


def sub64(ahi, alo, bhi, blo):
    lo = alo - blo
    borrow = _ult(alo, blo).astype(jnp.int32)
    return ahi - bhi - borrow, lo


def lt64(ahi, alo, bhi, blo):
    """Signed 64-bit < on limb pairs (hi signed, lo unsigned)."""
    return (ahi < bhi) | ((ahi == bhi) & _ult(alo, blo))


def max64(ahi, alo, bhi, blo):
    a_less = lt64(ahi, alo, bhi, blo)
    return jnp.where(a_less, bhi, ahi), jnp.where(a_less, blo, alo)


def prefix_sum_64(hi, lo, R: int, n_rounds: int):
    """Inclusive flat prefix sum of int64 limb pairs."""
    for b in range(n_rounds):
        shi = shift_flat_right(hi, 1 << b, R, 0)
        slo = shift_flat_right(lo, 1 << b, R, 0)
        hi, lo = add64(hi, lo, shi, slo)
    return hi, lo


def prefix_max_64(hi, lo, R: int, n_rounds: int):
    """Inclusive flat prefix max of int64 limb pairs."""
    for b in range(n_rounds):
        shi = shift_flat_right(hi, 1 << b, R, I32_MIN)
        slo = shift_flat_right(lo, 1 << b, R, 0)
        hi, lo = max64(hi, lo, shi, slo)
    return hi, lo


def shr1_64(hi, lo):
    """Arithmetic 64-bit >> 1 on (hi, lo) i32 limbs."""
    lo_u = jax.lax.shift_right_logical(lo, 1) | jax.lax.shift_left(hi, 31)
    return jax.lax.shift_right_arithmetic(hi, 1), lo_u
