"""Round-5 config-2 sustained measurement + bound attribution
(VERDICT #6): the single-level filtered join saw no gain from the
fused drain (synced 0.035-0.037 s, r4) — apply the sustained
methodology and attribute what bounds it by timing the pieces:

  (a) full sorted-executor run, sustained (run(sustain=8))
  (b) the rank pass alone on the filtered stream (sorted_match_ranks
      at stream scale — the per-segment probe work)
  (c) the bulk count on the same workload with the same prefilter
      semantics (the no-executor floor)

Also measures the fused drain's Zebra occupancy mode (round-5 kernel
extension) vs the XLA occupancy drain at this geometry — the measured
delta for the COMPONENTS.md support matrix.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5000 \
       python -u scripts/probe_r5_config2.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ccve_tpu.config import CompactionStrategy, EngineConfig, PayloadMode
from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table
from ccve_tpu.exec.sorted_pipeline import SortedPipeline
from ccve_tpu.ops import filter as flt
from ccve_tpu.ops.sort_merge import build_sorted, rank_table, sorted_match_ranks

print("devices:", jax.devices(), flush=True)
res = {}

lhs, rhs, block = 1_000_000, 100_000, 2048
probe2 = gen_probe_table(lhs, 1, rhs)
k2, p2 = gen_rhs_table(rhs, 2)
st2 = build_sorted(k2, p2)
cfg2 = EngineConfig(
    block_size=block, n_joins=1, lhs_size=lhs, rhs_size=rhs,
    chunk_factor=2, strategy=CompactionStrategy.FULL,
    payload_mode=PayloadMode.REFERENCE,
)
pipe2 = SortedPipeline([st2], cfg2, prefilter=flt.mod_eq(10, 0))

# (a) synced best-of-5 + sustained
r = pipe2.run(probe2, preload=True)
cnt2 = r["count"]
best = r["seconds"]
for _ in range(4):
    r = pipe2.run(probe2, preload=True)
    assert r["count"] == cnt2
    best = min(best, r["seconds"])
res["c2_sorted_full_synced"] = {
    "s": round(best, 4), "rows_per_s_M": round(lhs / best / 1e6, 1)
}
print("c2 synced:", res["c2_sorted_full_synced"], flush=True)

rs = pipe2.run(probe2, preload=True, sustain=8)
assert rs["count"] == cnt2
best_s = rs["seconds"]
for _ in range(2):
    rs = pipe2.run(probe2, preload=True, sustain=8)
    best_s = min(best_s, rs["seconds"])
res["c2_sorted_full_sustained"] = {
    "s": round(best_s, 4), "rows_per_s_M": round(lhs / best_s / 1e6, 1)
}
print("c2 sustained:", res["c2_sorted_full_sustained"], flush=True)

# (b) the rank pass alone at stream scale (the executor's probe work)
rt = rank_table(st2)
keys_flat = jax.device_put(jnp.asarray(probe2[:, 0]))
NIT = 8


@jax.jit
def rank_loop(p):
    def body(_, acc):
        bias = jnp.where(acc < 0, 1, 0).astype(p.dtype)
        mult, start = sorted_match_ranks(rt, p + bias, use_kernel=True)
        return acc + jnp.sum(mult.astype(jnp.int64))

    return jax.lax.fori_loop(0, NIT, body, jnp.int64(0))


int(rank_loop(keys_flat))
best_r = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    int(rank_loop(keys_flat))
    best_r = min(best_r, time.perf_counter() - t0)
res["c2_rank_pass_only"] = {
    "s": round(best_r / NIT, 4),
    "rows_per_s_M": round(lhs / (best_r / NIT) / 1e6, 1),
}
print("rank pass only:", res["c2_rank_pass_only"], flush=True)

# (c) bulk-count floor with the filter folded in (mult zeroed where the
# filter rejects — same arithmetic the executor's prefilter applies)
from ccve_tpu.ops.sort_merge import sorted_match_stats


@jax.jit
def bulk_filtered(p):
    def body(_, acc):
        bias = jnp.where(acc < 0, 1, 0).astype(p.dtype)
        pb = p + bias
        st = sorted_match_stats(st2, pb, use_kernel=True)
        keep = (pb % 10) == 0
        return acc + jnp.sum(
            jnp.where(keep, st.mult, 0).astype(jnp.int64)
        )

    return jax.lax.fori_loop(0, NIT, body, jnp.int64(0))


int(bulk_filtered(keys_flat))
best_b = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    int(bulk_filtered(keys_flat))
    best_b = min(best_b, time.perf_counter() - t0)
res["c2_bulk_filtered_floor"] = {
    "s": round(best_b / NIT, 4),
    "rows_per_s_M": round(lhs / (best_b / NIT) / 1e6, 1),
}
print("bulk filtered floor:", res["c2_bulk_filtered_floor"], flush=True)

# Zebra occupancy: fused kernel (round-5) vs XLA-drain fallback removed
# — measure the occupancy mode's cost on the kernel path
cfg_occ = EngineConfig(
    block_size=block, n_joins=1, lhs_size=lhs, rhs_size=rhs,
    chunk_factor=2, strategy=CompactionStrategy.FULL,
    payload_mode=PayloadMode.REFERENCE, record_occupancy=True,
)
pipe_occ = SortedPipeline([st2], cfg_occ, prefilter=flt.mod_eq(10, 0))
assert pipe_occ._fused_drain_ok
r = pipe_occ.run(probe2, preload=True)
assert r["count"] == cnt2
best_o = r["seconds"]
for _ in range(4):
    r = pipe_occ.run(probe2, preload=True)
    best_o = min(best_o, r["seconds"])
occ = np.asarray(r["occupancy"])
res["c2_occupancy_fused"] = {
    "s": round(best_o, 4),
    "rows_per_s_M": round(lhs / best_o / 1e6, 1),
    "occ_rows": int(occ.sum()),
}
print("c2 occupancy fused:", res["c2_occupancy_fused"], flush=True)

print(json.dumps(res), flush=True)
