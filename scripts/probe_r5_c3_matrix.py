"""Round-5 support-matrix deltas at config-3 geometry (VERDICT #7):
measure each fused-drain fallback's cost against the fused count-only
baseline on the SAME session/workload —

  - fused count-only (baseline; the r4 canonical row)
  - XLA drain count-only (kernel disabled: the pure fusion delta)
  - materializing collector (capacity > 0, REFERENCE mode): the one
    remaining structural fallback
  - Zebra occupancy on the FUSED kernel (round-5 extension) vs its old
    XLA fallback

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5000 \
       python -u scripts/probe_r5_c3_matrix.py
"""

import dataclasses
import json

import jax

from ccve_tpu.config import CompactionStrategy, EngineConfig, PayloadMode
from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table
from ccve_tpu.exec.sorted_pipeline import SortedPipeline
from ccve_tpu.ops.sort_merge import build_sorted

print("devices:", jax.devices(), flush=True)
res = {}

lhs, rhs, block = 1_000_000, 50_000, 2048
probe = gen_probe_table(lhs, 4, 2 * rhs)
k, p = gen_rhs_table(rhs, 1)
st = build_sorted(k, p)
tables = [st] * 4
cfg = EngineConfig(
    block_size=block, n_joins=4, lhs_size=lhs, rhs_size=rhs,
    strategy=CompactionStrategy.FULL, payload_mode=PayloadMode.REFERENCE,
)


def best_of(pipe, n=5, **kw):
    r = pipe.run(probe, preload=True, **kw)
    cnt = r["count"]
    best = r["seconds"]
    for _ in range(n - 1):
        r = pipe.run(probe, preload=True, **kw)
        assert r["count"] == cnt
        best = min(best, r["seconds"])
    return best, cnt, r


cases = {}
pipe = SortedPipeline(tables, cfg)
assert pipe._fused_drain_ok
s, cnt0, _ = best_of(pipe)
cases["fused_count_only"] = s
print("fused_count_only", s, flush=True)

pipe_x = SortedPipeline(tables, cfg)
pipe_x._fused_drain_ok = False
s, cnt, _ = best_of(pipe_x)
assert cnt == cnt0
cases["xla_drain_count_only"] = s
print("xla_drain_count_only", s, flush=True)

cfg_m = dataclasses.replace(cfg, collect_tuples=True)
pipe_m = SortedPipeline(tables, cfg_m, result_capacity=1 << 18)
assert not pipe_m._fused_drain_ok
s, cnt, _ = best_of(pipe_m, n=3)
assert cnt == cnt0
cases["materialize_xla_drain"] = s
print("materialize_xla_drain", s, flush=True)

cfg_o = dataclasses.replace(cfg, record_occupancy=True)
pipe_o = SortedPipeline(tables, cfg_o)
assert pipe_o._fused_drain_ok
s, cnt, r = best_of(pipe_o)
assert cnt == cnt0
cases["occupancy_fused"] = s
occ_total = int(r["occupancy"].sum())
print("occupancy_fused", s, flush=True)

pipe_ox = SortedPipeline(tables, cfg_o)
pipe_ox._fused_drain_ok = False
s, cnt, r2 = best_of(pipe_ox, n=3)
assert cnt == cnt0
import numpy as np

assert np.array_equal(
    np.asarray(r["occupancy"]), np.asarray(r2["occupancy"])
), "fused vs XLA occupancy tables diverge on chip"
cases["occupancy_xla_drain"] = s
print("occupancy_xla_drain", s, flush=True)

base = cases["fused_count_only"]
res = {
    k: {"s": round(v, 4), "x_fused": round(v / base, 2)}
    for k, v in cases.items()
}
res["occupancy_rows"] = occ_total
print(json.dumps(res), flush=True)
