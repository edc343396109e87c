"""Probe: warm pipelined-executor throughput (config like the roadmap's
0.22M rows/s measurement: 2-way join, cf 2, full compaction)."""
import sys, time
sys.path.insert(0, "/root/repo")

import numpy as np

import ccve_tpu  # noqa: F401
from ccve_tpu.config import EngineConfig, CompactionStrategy, PayloadMode
from ccve_tpu.core.datagen import gen_probe_table
from ccve_tpu.exec.pipeline import JoinPipeline
from ccve_tpu.ops.hash_table import build_lp
from ccve_tpu.core.datagen import gen_rhs_table

import os
N, RHS, JOINS, BLOCK = 200_000, 4096, 2, int(os.environ.get('BLOCK', 256))
keys, payloads = gen_rhs_table(RHS, 2)
probe = gen_probe_table(N, JOINS, RHS)
tables = [build_lp(keys, payloads) for _ in range(JOINS)]
cfg = EngineConfig(
    n_joins=JOINS,
    block_size=BLOCK,
    chunk_factor=2,
    strategy=CompactionStrategy.FULL,
    collect_tuples=False,
    payload_mode=PayloadMode.FULL,
)
pipe = JoinPipeline(tables, cfg)
r = pipe.run(probe)  # compile + warm
print(f"warm1: count={r['count']} {r['seconds']:.2f}s", flush=True)
for _ in range(2):
    r = pipe.run(probe)
    print(
        f"warm: {r['seconds']:.3f}s  {N / r['seconds'] / 1e6:.3f}M rows/s",
        flush=True,
    )
