"""Round-3 measurement: batched-rank sorted executor vs round-2 numbers.

Config 2 geometry (1 level, 1M rows, filter 10%) and config 3 geometry
(4-way, 1M rows) on the chip, interleaved best-of-3, both rank modes.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python -u scripts/probe_r3_sorted.py
"""
import time

import numpy as np
import jax

from ccve_tpu.config import CompactionStrategy, EngineConfig, PayloadMode
from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table
from ccve_tpu.exec.sorted_pipeline import SortedPipeline
from ccve_tpu.ops import filter as flt
from ccve_tpu.ops.sort_merge import build_sorted

print("devices:", jax.devices(), flush=True)
BLOCK = 2048


def best_of(pipe, probe, reps=3, preload=True):
    r = pipe.run(probe, preload=preload)  # warm-up
    best = pipe.run(probe, preload=preload)
    for _ in range(reps - 1):
        r2 = pipe.run(probe, preload=preload)
        assert r2["count"] == best["count"]
        if r2["seconds"] < best["seconds"]:
            best = r2
    return best


# ---- config 2 geometry: 1 join, filter 10%, 1M rows, rhs 100k ----------
lhs, rhs = 1_000_000, 100_000
probe = gen_probe_table(lhs, 1, rhs)
keys, payloads = gen_rhs_table(rhs, 2)
st = build_sorted(keys, payloads)
cfg = EngineConfig(
    block_size=BLOCK, n_joins=1, lhs_size=lhs, rhs_size=rhs,
    chunk_factor=2, strategy=CompactionStrategy.FULL,
    payload_mode=PayloadMode.REFERENCE,
)
pipes = {
    "c2_batched": SortedPipeline([st], cfg, prefilter=flt.mod_eq(10, 0)),
    "c2_chunk": SortedPipeline([st], cfg, prefilter=flt.mod_eq(10, 0),
                               rank_mode="chunk"),
}
results = {}
for name, p in pipes.items():
    r = best_of(p, probe)
    results[name] = r
    print(f"{name}: {r['seconds']:.4f} s = {lhs/r['seconds']/1e6:.2f}M rows/s"
          f" count={r['count']}", flush=True)
assert results["c2_batched"]["count"] == results["c2_chunk"]["count"]

# ---- config 3 geometry: 4-way, 1M rows, rhs 50k -------------------------
lhs, rhs = 1_000_000, 50_000
probe = gen_probe_table(lhs, 4, 2 * rhs)
keys, payloads = gen_rhs_table(rhs, 1)
st = build_sorted(keys, payloads)
tables = [st] * 4
for strat in (CompactionStrategy.NONE, CompactionStrategy.FULL):
    cfg = EngineConfig(
        block_size=BLOCK, n_joins=4, lhs_size=lhs, rhs_size=rhs,
        strategy=strat, payload_mode=PayloadMode.REFERENCE,
    )
    cases = {
        f"c3_{strat.value}_batched": SortedPipeline(tables, cfg),
        f"c3_{strat.value}_chunk": SortedPipeline(tables, cfg,
                                                  rank_mode="chunk"),
    }
    counts = set()
    for name, p in cases.items():
        r = best_of(p, probe)
        counts.add(r["count"])
        print(f"{name}: {r['seconds']:.4f} s = "
              f"{lhs/r['seconds']/1e6:.2f}M rows/s count={r['count']}",
              flush=True)
    assert len(counts) == 1, counts
print("OK", flush=True)
