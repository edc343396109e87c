"""Round-5 config-6 DYNAMIC regret re-measure at n=18 (advisor power
fix): same interleaved design as probe_r4_config6.py, plus SEM-based
CI reporting so the parity note quantifies its own power.


Interleaved rounds of FULL vs device-DYNAMIC at start_sampling 2
(round-3 default) and 1 (half the warm budget on the 4-arm set).
Records per-variant mean/std/min across rounds so the regret ratio can
be judged against run-to-run jitter — the 'statistical parity note'
done-bar.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5500 \
       python -u scripts/probe_r4_config6.py
"""

import dataclasses
import json

import jax
import numpy as np

from ccve_tpu.config import CompactionStrategy, EngineConfig, PayloadMode
from ccve_tpu.core.datagen import gen_rhs_table
from ccve_tpu.exec.pipeline import JoinPipeline
from ccve_tpu.ops import filter as flt
from ccve_tpu.ops.hash_table import build_csr

print("devices:", jax.devices(), flush=True)

lhs, rhs, block = 2_000_000, 50_000, 2048
phase_chunks, mod, segment_chunks = 128, 10, 8
n_joins = 2
rng = np.random.default_rng(7)
probe = np.empty((lhs, n_joins), np.int64)
phase_rows = phase_chunks * block
phase = (np.arange(lhs) // phase_rows) % 2
n_a = int((phase == 0).sum())
probe[:, 0] = rng.integers(0, rhs, lhs)
probe[phase == 0, 0] = rng.integers(0, rhs // mod, n_a) * mod
probe[:, 1] = rng.integers(0, rhs, lhs)
keys, payloads = gen_rhs_table(rhs, 1)
tables = [build_csr(keys, payloads) for _ in range(n_joins)]

base = EngineConfig(
    block_size=block, n_joins=n_joins, lhs_size=lhs, rhs_size=rhs,
    strategy=CompactionStrategy.FULL, payload_mode=PayloadMode.REFERENCE,
    tuner_segment_chunks=segment_chunks,
    threshold_arms=(0, block // 2, 3 * block // 4, block),
    bandit_commit_after=6,
)
cases = {
    "full": base,
    "dyn_ss2": dataclasses.replace(
        base, strategy=CompactionStrategy.DYNAMIC, device_tuner=True
    ),
    "dyn_ss1": dataclasses.replace(
        base, strategy=CompactionStrategy.DYNAMIC, device_tuner=True,
        bandit_start_sampling=1, bandit_commit_after=4,
    ),
}
pipes = {
    n: JoinPipeline(tables, c, prefilter=flt.mod_eq(mod, 0))
    for n, c in cases.items()
}
expected = None
times: dict = {n: [] for n in cases}
for name, pipe in pipes.items():  # warm/compile
    r = pipe.run(probe)
    if expected is None:
        expected = r["count"]
    assert r["count"] == expected, (name, r["count"], expected)
    print(f"warm {name}: {r['seconds']:.3f}s", flush=True)

ROUNDS = 18
for rd in range(ROUNDS):
    for name, pipe in pipes.items():
        r = pipe.run(probe)
        assert r["count"] == expected
        times[name].append(r["seconds"])
    print(f"round {rd}: " + json.dumps(
        {n: round(t[-1], 3) for n, t in times.items()}), flush=True)

out = {}
for name, ts in times.items():
    a = np.asarray(ts)
    out[name] = {
        "mean": round(float(a.mean()), 4),
        "std": round(float(a.std()), 4),
        "min": round(float(a.min()), 4),
    }
for d in ("dyn_ss2", "dyn_ss1"):
    out[d]["regret_mean"] = round(
        out[d]["mean"] / out["full"]["mean"], 4
    )
    out[d]["regret_min"] = round(out[d]["min"] / out["full"]["min"], 4)
    # parity z-score: gap in units of combined per-run std
    s = (out[d]["std"] ** 2 + out["full"]["std"] ** 2) ** 0.5
    out[d]["gap_sigma"] = round(
        (out[d]["mean"] - out["full"]["mean"]) / max(s, 1e-9), 2
    )
print(json.dumps(out), flush=True)

# SEM-based confidence interval on the regret ratio (advisor, round 4)
import math
n = ROUNDS
for d in ("dyn_ss2", "dyn_ss1"):
    sem = math.sqrt(
        (out[d]["std"] ** 2 + out["full"]["std"] ** 2) / n
    )
    gap = out[d]["mean"] - out["full"]["mean"]
    lo = (gap - 1.96 * sem) / out["full"]["mean"] + 1.0
    hi = (gap + 1.96 * sem) / out["full"]["mean"] + 1.0
    print(json.dumps({
        "variant": d, "n": n, "sem_gap_s": round(sem, 4),
        "regret_ratio_ci95": [round(lo, 3), round(hi, 3)],
    }), flush=True)
