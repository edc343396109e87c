"""Is the device-DYNAMIC gap exploration or structure? Run config 6's
workload with the device tuner restricted to a SINGLE arm (2048 =
FULL-equivalent): no exploration is possible, so any remaining gap vs
the static FULL run is structural overhead of the dynamic path
(seg-of-chunks scan nesting, bandit math, level_rows op, traced
thresholds).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
       python -u scripts/probe_dyn_overhead.py
"""

import time

import numpy as np

import jax

print(jax.devices(), flush=True)

from ccve_tpu.config import CompactionStrategy, EngineConfig, PayloadMode
from ccve_tpu.core.datagen import gen_rhs_table
from ccve_tpu.exec.pipeline import JoinPipeline
from ccve_tpu.ops import filter as flt
from ccve_tpu.ops.hash_table import build_csr

lhs, rhs, block, mod = 2_000_000, 50_000, 2048, 10
phase_chunks = 128
n_joins = 2

rng = np.random.default_rng(7)
probe = np.empty((lhs, n_joins), np.int64)
phase = (np.arange(lhs) // (phase_chunks * block)) % 2
n_a = int((phase == 0).sum())
probe[:, 0] = rng.integers(0, rhs, lhs)
probe[phase == 0, 0] = rng.integers(0, rhs // mod, n_a) * mod
probe[:, 1] = rng.integers(0, rhs, lhs)

keys, payloads = gen_rhs_table(rhs, 1)
tables = [build_csr(keys, payloads) for _ in range(n_joins)]


def run(strategy, device_tuner=False, arms=None, seg=8):
    kw = {}
    if arms is not None:
        kw["threshold_arms"] = arms
    cfg = EngineConfig(
        block_size=block, n_joins=n_joins, lhs_size=lhs, rhs_size=rhs,
        strategy=strategy, payload_mode=PayloadMode.REFERENCE,
        tuner_segment_chunks=seg, device_tuner=device_tuner, **kw,
    )
    pipe = JoinPipeline(tables, cfg, prefilter=flt.mod_eq(mod, 0))
    pipe.run(probe)
    r = pipe.run(probe)
    return r["seconds"], r["count"]


t_full, c_full = run(CompactionStrategy.FULL)
print(f"static FULL: {t_full:.3f}s count={c_full}", flush=True)

t_1arm, c1 = run(CompactionStrategy.DYNAMIC, device_tuner=True,
                 arms=(2048,))
assert c1 == c_full
print(f"device DYNAMIC, single arm 2048: {t_1arm:.3f}s "
      f"(structural overhead {t_1arm / t_full:.2f}x)", flush=True)

t_1arm64, _ = run(CompactionStrategy.DYNAMIC, device_tuner=True,
                  arms=(2048,), seg=64)
print(f"device DYNAMIC, single arm, seg=64: {t_1arm64:.3f}s", flush=True)

t_dyn, cd = run(CompactionStrategy.DYNAMIC, device_tuner=True)
assert cd == c_full
print(f"device DYNAMIC, 9 arms: {t_dyn:.3f}s "
      f"(exploration adds {t_dyn - t_1arm:.3f}s)", flush=True)
