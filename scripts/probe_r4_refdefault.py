"""Round-4 reference-default workload on the fused sorted executor:
20M probe rows x 3 joins x 2M build rows (base.h:44-51, the reference
driver's own defaults) — preloaded synced + sustained, counts
cross-checked against the bulk engine.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5000 \
       python -u scripts/probe_r4_refdefault.py
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
from ccve_tpu.ops.sort_merge import build_sorted

print("devices:", jax.devices(), flush=True)

lhs, rhs, n_joins, cf, block = 20_000_000, 2_000_000, 3, 1, 2048
probe = gen_probe_table(lhs, n_joins, rhs)
keys, payloads = gen_rhs_table(rhs, cf)
st = build_sorted(keys, payloads)
tables = [st] * n_joins

pd = jax.device_put(jnp.asarray(probe))
ref = bulk_count(tables, pd)
expected = int(ref.count)
print("expected", expected, flush=True)

NITER = 8


@jax.jit
def bulk_loop(p):
    def body(_, acc):
        bias = jnp.where(acc < 0, 1, 0).astype(p.dtype)
        return acc + bulk_count(tables, p + bias).count

    return jax.lax.fori_loop(0, NITER, body, jnp.int64(0))


assert int(bulk_loop(pd)) == NITER * expected
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    int(bulk_loop(pd))
    best = min(best, time.perf_counter() - t0)
res = {"bulk_sustained_s": round(best / NITER, 4),
       "bulk_rows_per_s_M": round(lhs / (best / NITER) / 1e6, 1)}
print("bulk:", res, flush=True)

cfg = EngineConfig(
    block_size=block, n_joins=n_joins, lhs_size=lhs, rhs_size=rhs,
    chunk_factor=cf, strategy=CompactionStrategy.FULL,
    payload_mode=PayloadMode.REFERENCE,
)
pipe = SortedPipeline(tables, cfg)
r = pipe.run(probe, preload=True)
assert r["count"] == expected, (r["count"], expected)
best = r["seconds"]
for _ in range(3):
    r = pipe.run(probe, preload=True)
    best = min(best, r["seconds"])
res["sorted_full_synced_s"] = round(best, 4)
res["sorted_full_synced_rows_per_s_M"] = round(lhs / best / 1e6, 1)
print("sorted synced:", best, flush=True)

rs = pipe.run(probe, preload=True, sustain=4)
assert rs["count"] == expected
best_s = rs["seconds"]
for _ in range(2):
    rs = pipe.run(probe, preload=True, sustain=4)
    best_s = min(best_s, rs["seconds"])
res["sorted_full_sustained_s"] = round(best_s, 4)
res["sorted_full_sustained_rows_per_s_M"] = round(lhs / best_s / 1e6, 1)
res["x_bulk"] = round(best_s / res["bulk_sustained_s"], 2)
print(json.dumps(res), flush=True)
