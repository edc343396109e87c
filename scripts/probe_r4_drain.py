"""Round-4: fused drain kernel (kernels/drain.py) A/B on chip.

Interleaved rounds (measurement rule: sequential best-of-N through the
relay jitters +-2-4x; only interleaved A/B comparisons are
trustworthy). Workloads = canonical config 2 / config 3 geometry,
sorted executor, preloaded feeds, counts asserted vs the expected
(bulk-engine-verified) values.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5000 \
       python -u scripts/probe_r4_drain.py
"""

import json
import time

import jax
import jax.numpy as jnp

from ccve_tpu.bench.configs import _timed  # noqa: F401  (devices warm)
from ccve_tpu.config import (
    CompactionStrategy,
    EngineConfig,
    PayloadMode,
)
from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table
from ccve_tpu.exec.sorted_pipeline import SortedPipeline
from ccve_tpu.ops import filter as flt
from ccve_tpu.ops.sort_merge import build_sorted

print("devices:", jax.devices(), flush=True)


def make_c2(fused: bool):
    lhs, rhs, block = 1_000_000, 100_000, 2048
    probe = gen_probe_table(lhs, 1, rhs)
    keys, payloads = gen_rhs_table(rhs, 2)
    st = build_sorted(keys, payloads)
    cfg = EngineConfig(
        block_size=block, n_joins=1, lhs_size=lhs, rhs_size=rhs,
        chunk_factor=2, strategy=CompactionStrategy.FULL,
        payload_mode=PayloadMode.REFERENCE,
    )
    pipe = SortedPipeline([st], cfg, prefilter=flt.mod_eq(10, 0))
    pipe._fused_drain_ok = pipe._fused_drain_ok and fused
    return pipe, probe, lhs


def make_c3(fused: bool, strategy=CompactionStrategy.FULL):
    lhs, rhs, block = 1_000_000, 50_000, 2048
    probe = gen_probe_table(lhs, 4, 2 * rhs)
    keys, payloads = gen_rhs_table(rhs, 1)
    st = build_sorted(keys, payloads)
    cfg = EngineConfig(
        block_size=block, n_joins=4, lhs_size=lhs, rhs_size=rhs,
        strategy=strategy, payload_mode=PayloadMode.REFERENCE,
    )
    pipe = SortedPipeline([st] * 4, cfg)
    pipe._fused_drain_ok = pipe._fused_drain_ok and fused
    return pipe, probe, lhs


cases = {
    "c2_full_fused": make_c2(True),
    "c2_full_old": make_c2(False),
    "c3_full_fused": make_c3(True),
    "c3_full_old": make_c3(False),
    "c3_none_fused": make_c3(True, CompactionStrategy.NONE),
}

best: dict = {}
expected: dict = {}
for name, (pipe, probe, lhs) in cases.items():
    t0 = time.perf_counter()
    r = pipe.run(probe, preload=True)  # compile + warm
    print(
        f"warm {name}: fused={pipe._fused_drain_ok} count={r['count']} "
        f"{time.perf_counter() - t0:.1f}s (compile) "
        f"run={r['seconds']:.4f}s",
        flush=True,
    )
    key = name.split("_")[0] + name.split("_")[1]
    if key in expected:
        assert r["count"] == expected[key], (name, r["count"], expected)
    expected[key] = r["count"]
    best[name] = r["seconds"]

for rnd in range(3):
    for name, (pipe, probe, lhs) in cases.items():
        r = pipe.run(probe, preload=True)
        best[name] = min(best[name], r["seconds"])
    print(f"round {rnd}: " + json.dumps(best), flush=True)

out = {
    n: {"seconds": best[n], "rows_per_s": cases[n][2] / best[n]}
    for n in cases
}
print(json.dumps(out), flush=True)
