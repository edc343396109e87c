"""Round-4 sorted-executor device-time breakdown (chip).

Measures, with device-loop sustained timing (anti-CSE bias + one scalar
readback), the pieces of a config-3-geometry preloaded static run:

  A. seg_ranks: the grouped rank precompute for the whole stream
     (one 4-level pass over 489x2048 chunk cols)
  B. mult extraction + padding glue (the XLA ops between A and C)
  C. drain_segment: the fused kernel over all 489 chunks
  D. run() end-to-end (single dispatch) for reference
  E. bulk_count on the same query (the engine floor)

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5000 \
       python -u scripts/probe_r4_drainbreak.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ccve_tpu.config import CompactionStrategy, EngineConfig, PayloadMode
from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table
from ccve_tpu.exec.bulk import bulk_count
from ccve_tpu.exec.sorted_pipeline import SortedPipeline
from ccve_tpu.kernels.drain import _plane_rows, drain_segment
from ccve_tpu.ops.sort_merge import build_sorted

print("devices:", jax.devices(), flush=True)

lhs, rhs, block = 1_000_000, 50_000, 2048
probe = gen_probe_table(lhs, 4, 2 * rhs)
keys, payloads = gen_rhs_table(rhs, 1)
st = build_sorted(keys, payloads)
cfg = EngineConfig(
    block_size=block, n_joins=4, lhs_size=lhs, rhs_size=rhs,
    strategy=CompactionStrategy.FULL, payload_mode=PayloadMode.REFERENCE,
)
pipe = SortedPipeline([st] * 4, cfg)
S = -(-lhs // block)
pad = S * block - lhs
cols = np.zeros((S * block, 4), np.int64)
cols[:lhs] = probe
chunk_cols = jnp.asarray(
    np.ascontiguousarray(np.swapaxes(cols.reshape(S, block, 4), 1, 2))
)
counts = jnp.asarray(
    np.r_[np.full(S - 1, block, np.int32), [block - pad]]
)

NITER = 8


def sustain(fn, *args, niter=NITER):
    @jax.jit
    def loop(a0, *rest):
        def body(_, acc):
            bias = jnp.where(acc < 0, 1, 0).astype(a0.dtype)
            out = fn(a0 + bias, *rest)
            leaf = jax.tree.leaves(out)[0]
            return acc + leaf.reshape(-1)[0].astype(jnp.int64)

        return jax.lax.fori_loop(0, niter, body, jnp.int64(0))

    int(loop(*args))  # compile+warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(loop(*args))
        best = min(best, time.perf_counter() - t0)
    return best / niter


res = {}

# A: rank precompute
t = sustain(lambda cc: pipe._seg_ranks(cc), chunk_cols)
res["A_seg_ranks_ms"] = round(t * 1e3, 2)
print(f"A seg_ranks: {t * 1e3:.2f} ms", flush=True)

# B: extraction glue (ranks -> padded mult planes)
seg_ranks = jax.jit(pipe._seg_ranks)(chunk_cols)


def extract(sr):
    return jax.lax.shift_right_logical(sr, 32).astype(jnp.int32)


t = sustain(extract, seg_ranks)
res["B_extract_ms"] = round(t * 1e3, 2)
print(f"B extract: {t * 1e3:.2f} ms", flush=True)

# C: fused drain kernel alone
mults = extract(seg_ranks)
thr = jnp.full((4,), block, jnp.int32)
RF = _plane_rows(block) * 128
cache = jnp.zeros((3, 4, RF), jnp.int32)
ccnt = jnp.zeros((3,), jnp.int32)


def drain(m):
    out = drain_segment(
        m, counts.astype(jnp.int32), thr, cache, ccnt,
        block=block, fanouts=tuple(pipe._fanout),
    )
    return out[0]


t = sustain(drain, mults)
res["C_drain_kernel_ms"] = round(t * 1e3, 2)
print(f"C drain kernel: {t * 1e3:.2f} ms", flush=True)

# D: end-to-end run (one dispatch) best-of-5
pipe.run(probe, preload=True)
best = float("inf")
for _ in range(5):
    r = pipe.run(probe, preload=True)
    best = min(best, r["seconds"])
res["D_run_end_to_end_ms"] = round(best * 1e3, 2)
print(f"D run: {best * 1e3:.2f} ms", flush=True)

# E: bulk floor
pd = jax.device_put(jnp.asarray(probe))
t = sustain(lambda p: bulk_count([st] * 4, p).count, pd)
res["E_bulk_ms"] = round(t * 1e3, 2)
print(f"E bulk: {t * 1e3:.2f} ms", flush=True)

print(json.dumps(res), flush=True)
