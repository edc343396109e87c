"""MXU one-hot gather/scatter — the engine's "gather unit".

XLA lowers a small TPU gather (jnp.take of a few thousand indices) to a
per-element dynamic-slice loop: measured 652 us for 2048 elements out of
128K on v5e (~320 ns/element) — it is THE cost of the chunk-at-a-time
executor (every probe/Next step is a handful of such gathers; the
reference's counterpart is a single AVX-512 `vpgatherqq`,
chaining_ht.cpp:239-292, which a TPU simply does not have).

The TPU's strength is the MXU, and a gather IS a matmul:

    out[i] = values[idx[i]]  ==  onehot(idx)[i, :] @ values[:]

done hierarchically so the one-hot never gets big:

  1. row-select:  onehot(idx >> lane_log) [k, R] @ limbs [R, C * nl]
     -> each query's table ROW, all byte-limbs at once        (MXU)
  2. lane-select: x lane one-hot [k, C], reduce over C        (VPU)

Exactness: values travel as 8-bit limbs (bf16 holds 0..255 exactly),
the one-hot rows have exactly ONE 1, and the MXU accumulates in f32 —
every sum has a single nonzero term, so the result is bit-exact for any
int64/int32 input, negatives included (two's-complement limbs).

Scatter is the transpose: limbs [*, k] @ onehot(pos) [k, block], with a
free "covered" row (ones) that tells which destinations were written —
positions must be unique among live lanes (all call sites scatter
through a selection vector or a prefix-sum rank, which are unique by
construction; duplicates among DROPPED lanes at the `n` sentinel are
fine).

Semantics parity: `gather` clamps indices like jnp.take(mode="clip");
`scatter` drops out-of-range positions like .at[pos].set(mode="drop").

Cost: k*n MACs per gather — at k = 2048, n = 512K that is ~4G MACs,
tens of microseconds on the MXU vs 650 us for the XLA loop. Use for
chunk-sized k against small-to-medium tables; the bulk executor's
million-row gathers keep XLA's loop (k too large for k*n).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# one-hot matmul pays k*n MACs; past this table size the XLA loop wins
MAX_GATHER_N = 1 << 21
MAX_K = 1 << 14

_LANE = 128  # C: minor-dim width of the 2-level decomposition


def _to_limbs(x: jax.Array):
    """int array -> (bf16 limb planes [..., nl], nl). 8-bit limbs."""
    if x.dtype == jnp.int64:
        u = x.astype(jnp.uint64)
        nl = 8
        limbs = [
            ((u >> jnp.uint64(8 * i)) & jnp.uint64(0xFF)).astype(jnp.uint8)
            for i in range(nl)
        ]
    else:
        u = x.astype(jnp.int32).astype(jnp.uint32)
        nl = 4
        limbs = [
            ((u >> jnp.uint32(8 * i)) & jnp.uint32(0xFF)).astype(jnp.uint8)
            for i in range(nl)
        ]
    return jnp.stack(limbs, axis=-1).astype(jnp.bfloat16), nl


def _from_limbs(planes: jax.Array, dtype):
    """f32 limb planes [..., nl] -> int array (exact round-trip)."""
    nl = planes.shape[-1]
    b = jnp.round(planes).astype(jnp.int32).astype(jnp.uint32) & jnp.uint32(
        0xFF
    )
    if nl == 8:
        u = jnp.zeros(planes.shape[:-1], jnp.uint64)
        for i in range(nl):
            u = u | (b[..., i].astype(jnp.uint64) << jnp.uint64(8 * i))
        return u.astype(jnp.int64)
    u = jnp.zeros(planes.shape[:-1], jnp.uint32)
    for i in range(nl):
        u = u | (b[..., i] << jnp.uint32(8 * i))
    return u.astype(jnp.int32).astype(dtype)


def _onehot(idx: jax.Array, n: int) -> jax.Array:
    i = jnp.arange(n, dtype=jnp.int32)
    return (idx[:, None].astype(jnp.int32) == i[None, :]).astype(jnp.bfloat16)


def gather_cols(cols: jax.Array, idx: jax.Array) -> jax.Array:
    """out[..., i] = cols[..., clamp(idx[i])] — jnp.take(cols, idx,
    axis=-1, mode="clip") on the MXU. cols int64/int32 [..., n]."""
    n = cols.shape[-1]
    k = idx.shape[0]
    lead = cols.shape[:-1]
    idx = jnp.clip(idx.astype(jnp.int32), 0, n - 1)

    C = min(_LANE, n)
    R = -(-n // C)
    pad = R * C - n
    flat = cols.reshape(-1, n)
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
    limbs, nl = _to_limbs(flat.reshape(-1, R, C))  # [F, R, C, nl]
    F = limbs.shape[0]
    # [R, F*C*nl] operand: row-select all columns/limbs in one matmul
    op = limbs.transpose(1, 0, 2, 3).reshape(R, F * C * nl)

    rows = idx // C
    lanes = idx - rows * C
    row_oh = _onehot(rows, R)  # [k, R]
    picked = jax.lax.dot(
        row_oh, op, precision=None,
        preferred_element_type=jnp.float32,
    ).reshape(k, F, C, nl)
    lane_oh = _onehot(lanes, C).astype(jnp.float32)  # [k, C]
    sel = jnp.einsum("kfcl,kc->kfl", picked, lane_oh)
    out = _from_limbs(sel, cols.dtype)  # [k, F]
    return out.T.reshape(*lead, k)


def gather(values: jax.Array, idx: jax.Array) -> jax.Array:
    """out[i] = values[clamp(idx[i])] — 1-D jnp.take(mode="clip")."""
    return gather_cols(values[None, :], idx)[0]


def scatter_cols(
    dst: jax.Array, pos: jax.Array, vals: jax.Array
) -> jax.Array:
    """dst.at[..., pos].set(vals, mode="drop") on the MXU. `pos` must be
    unique among in-range entries; out-of-range entries are dropped.
    dst [..., block], vals [..., k]."""
    block = dst.shape[-1]
    k = pos.shape[0]
    pos = pos.astype(jnp.int32)
    in_range = (pos >= 0) & (pos < block)
    # route dropped lanes to a one-hot of all zeros
    safe = jnp.where(in_range, pos, -1)
    oh = _onehot(safe, block)  # [k, block]; dropped rows are zero

    flat = vals.reshape(-1, k)
    limbs, nl = _to_limbs(flat)  # [F, k, nl]
    F = limbs.shape[0]
    op = jnp.concatenate(
        [
            limbs.transpose(0, 2, 1).reshape(F * nl, k),
            jnp.ones((1, k), jnp.bfloat16),  # covered row, for free
        ],
        axis=0,
    )
    out = jax.lax.dot(
        op, oh, precision=None, preferred_element_type=jnp.float32
    )  # [F*nl + 1, block]
    covered = out[-1] > 0.5
    # d same-valued writers sum to d*v in the matmul; dividing by the
    # (free) cover count restores v exactly (d*v <= 2048*255 < 2^24, and
    # IEEE division of exact integers with an exact quotient is exact).
    # XLA's .set picks one of the duplicates — identical values by
    # contract at every call site (e.g. dead-lane sel zeros scatter the
    # same slot value as live lane 0), so the semantics agree.
    cnt = jnp.maximum(out[-1], 1.0)
    planes = (out[:-1] / cnt).reshape(F, nl, block).transpose(0, 2, 1)
    written = _from_limbs(planes, dst.dtype).reshape(
        *dst.shape[:-1], block
    )
    return jnp.where(covered, written, dst)


def scatter(dst: jax.Array, pos: jax.Array, vals: jax.Array) -> jax.Array:
    """1-D dst.at[pos].set(vals, mode="drop"); unique in-range pos."""
    return scatter_cols(dst[None, :], pos, vals[None, :])[0]


def use_mxu(n: int, k: int) -> bool:
    """Whether the one-hot path beats XLA's gather loop at this shape."""
    return k <= MAX_K and n <= MAX_GATHER_N


# measured break-evens on v5e (scripts/marginal.py, slope method):
#   gather k=2048: XLA take ~30 us flat; MXU 4.5 us @ n=2K, ~31 us @ 128K
#   scatter [12, 2048]: XLA 146 us, MXU 5 us
_GATHER_N = 1 << 17
_SCATTER_BLOCK = 1 << 13


def take1(vals: jax.Array, idx: jax.Array) -> jax.Array:
    """Size-dispatched 1-D gather with clip semantics. Indices must be
    in range at live lanes (clip covers the dead-lane garbage)."""
    if vals.shape[-1] <= _GATHER_N and idx.shape[0] <= MAX_K:
        return gather(vals, idx)
    return jnp.take(vals, idx, mode="clip")


def take_cols(cols: jax.Array, idx: jax.Array) -> jax.Array:
    """Size-dispatched axis=-1 gather with clip semantics."""
    if cols.shape[-1] <= _GATHER_N and idx.shape[0] <= MAX_K:
        return gather_cols(cols, idx)
    return jnp.take(cols, idx, axis=-1, mode="clip")


def put1(dst: jax.Array, pos: jax.Array, vals: jax.Array) -> jax.Array:
    """Size-dispatched dst.at[pos].set(vals, mode="drop"); unique
    in-range positions."""
    if dst.shape[-1] <= _SCATTER_BLOCK and pos.shape[0] <= MAX_K:
        return scatter(dst, pos, vals)
    return dst.at[pos].set(vals, mode="drop")


def put_cols(dst: jax.Array, pos: jax.Array, vals: jax.Array) -> jax.Array:
    """Size-dispatched dst.at[..., pos].set(vals, mode="drop"); unique
    in-range positions."""
    if dst.shape[-1] <= _SCATTER_BLOCK and pos.shape[0] <= MAX_K:
        return scatter_cols(dst, pos, vals)
    return dst.at[..., pos].set(vals, mode="drop")
