"""Pallas murmur64 kernel — the hash primitive on the VPU.

Bit-exact Pallas implementation of the reference's `murmurhash64`
(hash_functions.h:8-16; 8-lane AVX-512 variant hash_functions.h:18-28).
TPU VPU lanes are 32-bit, so the uint64 wrapping multiply is emulated in
u32 limbs with the schoolbook 16-bit-digit decomposition (all
intermediates < 2^32). The int64 input/output conversion happens outside
the kernel (cheap XLA bitwise ops); the kernel body is pure u32 VPU code.

Used for parity testing against ops/hashing.murmurhash64 and as the hash
stage of fused kernels; XLA's own u64 emulation is already ~630M hashes/s
on this chip, so this kernel's value is the fused contexts, not the
standalone op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ccve_tpu.ops.hashing import MURMUR_MULTIPLIER

# Python ints: materialized as literals inside the kernel trace (jnp
# scalars created at module scope would be captured constants, which
# pallas_call rejects).
_M_LO = MURMUR_MULTIPLIER & 0xFFFFFFFF
_M_HI = MURMUR_MULTIPLIER >> 32


def _mul64(a_hi, a_lo, b_hi, b_lo):
    """(a_hi:a_lo) * (b_hi:b_lo) mod 2^64 in u32 limbs (16-bit digits)."""
    u16 = jnp.uint32(0xFFFF)
    s16 = jnp.uint32(16)
    a0 = a_lo & u16
    a1 = a_lo >> s16
    b0 = b_lo & u16
    b1 = b_lo >> s16

    t = a0 * b0
    w0 = t & u16
    k = t >> s16
    t = a1 * b0 + k
    w1 = t & u16
    w2 = t >> s16
    t = a0 * b1 + w1
    k = t >> s16
    lo = (t << s16) | w0
    hi_of_lolo = a1 * b1 + w2 + k  # high 32 bits of a_lo*b_lo

    # full product mod 2^64: lo64(a_lo*b_lo) + 2^32*(hi(a_lo*b_lo)
    #   + a_lo*b_hi + a_hi*b_lo)
    hi = hi_of_lolo + a_lo * b_hi + a_hi * b_lo  # wrapping u32
    return hi, lo


def _murmur_limbs(hi, lo):
    """Three rounds of x ^= x >> 32; x *= M on (hi, lo) u32 limbs."""
    m_hi, m_lo = jnp.uint32(_M_HI), jnp.uint32(_M_LO)
    for _ in range(2):
        lo = lo ^ hi  # x ^= x >> 32 (upper limb of the shift is 0)
        hi, lo = _mul64(hi, lo, m_hi, m_lo)
    lo = lo ^ hi
    return hi, lo


def _kernel(hi_ref, lo_ref, out_hi_ref, out_lo_ref):
    hi, lo = _murmur_limbs(hi_ref[:], lo_ref[:])
    out_hi_ref[:] = hi
    out_lo_ref[:] = lo


def murmurhash64_pallas(x: jax.Array, block: int = 1 << 17) -> jax.Array:
    """Hash an int64/uint64 array on the VPU; returns uint64. Shape must
    be 1-D; processed in `block`-sized grid steps (padded internally)."""
    n = x.shape[0]
    xu = x.astype(jnp.uint64)
    lo = (xu & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (xu >> jnp.uint64(32)).astype(jnp.uint32)

    # 2-D [rows, 128] layout for clean VPU tiling; pad so the row count is
    # a whole number of grid blocks.
    row_block = max(min(block // 128, -(-n // 128)), 8)
    pad = (-n) % (row_block * 128)
    if pad:
        lo = jnp.concatenate([lo, jnp.zeros(pad, jnp.uint32)])
        hi = jnp.concatenate([hi, jnp.zeros(pad, jnp.uint32)])
    rows = lo.shape[0] // 128
    lo2, hi2 = lo.reshape(rows, 128), hi.reshape(rows, 128)

    grid = rows // row_block
    # Mosaic rejects the i64 scalars that x64-mode tracing injects into
    # grid index maps ("failed to legalize func.return"); the kernel is
    # pure u32, so trace the pallas_call with x64 off.
    with jax.enable_x64(False):
        out_hi, out_lo = _call(grid, row_block, rows, hi2, lo2)

    out = out_hi.reshape(-1).astype(jnp.uint64) << jnp.uint64(32)
    out = out | out_lo.reshape(-1).astype(jnp.uint64)
    return out[:n]


def _call(grid, row_block, rows, hi2, lo2):
    return pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((row_block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((row_block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((row_block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((row_block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, 128), jnp.uint32),
            jax.ShapeDtypeStruct((rows, 128), jnp.uint32),
        ],
    )(hi2, lo2)
