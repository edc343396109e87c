"""Segment-size sweep for the batched-rank sorted executor (preloaded):
bigger segments amortize per-dispatch overhead + rank-pass fixed costs.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python -u scripts/probe_r3_segsize.py
"""
import time

import jax
import numpy as np

from ccve_tpu.config import CompactionStrategy, EngineConfig, PayloadMode
from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table
from ccve_tpu.exec.sorted_pipeline import SortedPipeline
from ccve_tpu.ops import filter as flt
from ccve_tpu.ops.sort_merge import build_sorted

print("devices:", jax.devices(), flush=True)
BLOCK = 2048


def best_of(pipe, probe, seg, reps=3):
    pipe.run(probe, segment_chunks=seg, preload=True)
    best = None
    for _ in range(reps):
        r = pipe.run(probe, segment_chunks=seg, preload=True)
        if best is None or r["seconds"] < best["seconds"]:
            best = r
    return best


# config 2 geometry
lhs, rhs = 1_000_000, 100_000
probe2 = gen_probe_table(lhs, 1, rhs)
keys, payloads = gen_rhs_table(rhs, 2)
st2 = build_sorted(keys, payloads)
cfg2 = EngineConfig(block_size=BLOCK, n_joins=1, lhs_size=lhs, rhs_size=rhs,
                    chunk_factor=2, strategy=CompactionStrategy.FULL,
                    payload_mode=PayloadMode.REFERENCE)
p2 = SortedPipeline([st2], cfg2, prefilter=flt.mod_eq(10, 0))

# config 3 geometry
probe3 = gen_probe_table(lhs, 4, 2 * 50_000)
k3, pl3 = gen_rhs_table(50_000, 1)
st3 = build_sorted(k3, pl3)
cfg3 = EngineConfig(block_size=BLOCK, n_joins=4, lhs_size=lhs,
                    rhs_size=50_000, strategy=CompactionStrategy.FULL,
                    payload_mode=PayloadMode.REFERENCE)
p3 = SortedPipeline([st3] * 4, cfg3)

for seg in (64, 128, 256):
    r2 = best_of(p2, probe2, seg)
    print(f"c2 seg={seg}: {r2['seconds']:.4f} s = "
          f"{lhs/r2['seconds']/1e6:.2f}M rows/s", flush=True)
for seg in (64, 128, 256):
    r3 = best_of(p3, probe3, seg)
    print(f"c3 seg={seg}: {r3['seconds']:.4f} s = "
          f"{lhs/r3['seconds']/1e6:.2f}M rows/s", flush=True)
print("OK", flush=True)
