"""Heterogeneous per-level compaction, round 2: branchy per-chunk compact
+ INTERLEAVED timing (relay drift cancels across cases, unlike the
sequential best-of-3 in probe_hetero.py which saw +-46% on identical
programs).

Workload (4-level, sorted executor):
  level 0: hit 0.95 — emissions ~95% occupancy; absorbing every
           almost-full chunk costs more than the ~5% descent saving
           -> threshold 0 optimal
  level 1: hit 0.03 — tiny emissions, 2-level subtree below
           -> threshold block optimal (~30x fewer descents)
  levels 2-3: hit 1.0 — full chunks flow through (pass-through free
           under the branchy compact)

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python -u scripts/probe_hetero2.py
"""

import dataclasses
import time

import numpy as np

import jax


def main():
    print(jax.devices(), flush=True)
    from ccve_tpu.config import CompactionStrategy, EngineConfig, PayloadMode
    from ccve_tpu.core.datagen import gen_rhs_table
    from ccve_tpu.exec.sorted_pipeline import SortedPipeline
    from ccve_tpu.ops.sort_merge import build_sorted

    lhs, rhs, block = 2_000_000, 50_000, 2048
    hit = (0.95, 0.03, 1.0, 1.0)
    rng = np.random.default_rng(2)
    probe = np.stack(
        [
            rng.integers(0, max(int(rhs / h), 1), size=lhs, dtype=np.int64)
            for h in hit
        ],
        axis=1,
    )
    keys, payloads = gen_rhs_table(rhs, 1)
    st = build_sorted(keys, payloads)
    tables = [st] * 4

    base = EngineConfig(
        block_size=block, n_joins=4, lhs_size=lhs, rhs_size=rhs,
        strategy=CompactionStrategy.FULL,
        payload_mode=PayloadMode.REFERENCE,
    )
    cases = {
        "NONE": dataclasses.replace(
            base, strategy=CompactionStrategy.NONE),
        "FULL": base,
        "mixed(0,B,0,0)": dataclasses.replace(
            base, compact_threshold_per_level=(0, block, 0, 0)),
    }
    pipes = {}
    counts = {}
    for name, cfg in cases.items():
        pipes[name] = SortedPipeline(tables, cfg)
        r = pipes[name].run(probe)  # warm-up compile
        counts[name] = r["count"]
    assert len(set(counts.values())) == 1, counts

    best = {name: float("inf") for name in cases}
    ROUNDS = 4
    for rd in range(ROUNDS):
        for name, pipe in pipes.items():
            r = pipe.run(probe)
            best[name] = min(best[name], r["seconds"])
            print(f"  round {rd} {name:15s}: {r['seconds']:.3f}s",
                  flush=True)
    print("---", flush=True)
    for name, b in best.items():
        print(f"{name:15s}: best {b:.3f}s "
              f"({lhs / b / 1e6:.2f}M rows/s)", flush=True)
    stat = min(best["NONE"], best["FULL"])
    print(f"mixed vs best static: {stat / best['mixed(0,B,0,0)']:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
