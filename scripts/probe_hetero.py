"""Heterogeneous per-level compaction premise probe (sorted executor).

Workload: 3-level join where the per-level optimum differs by design —
  level 0: hit ~100% (emissions are full chunks; compaction buys nothing,
           its op chain + cache copies are pure overhead -> NONE-optimal)
  level 1: hit ~5%   (tiny emissions; each non-empty emission descends
           into the level-2 subtree -> FULL-optimal, ~20x fewer descents)
  level 2: last level (collect only; threshold irrelevant)

Measures static NONE, static FULL, and the mixed static vector
(0, block, 0) via EngineConfig.compact_threshold_per_level. If mixed
beats min(NONE, FULL) by >10%, the DYNAMIC tuner has a real per-level
signal to find on this executor (VERDICT round-1 item 9).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python -u scripts/probe_hetero.py
"""

import dataclasses

import numpy as np

import jax


def gen_hetero_probe(lhs, rhs, hit_rates, seed=2):
    """Per-column uniform keys over [0, rhs/hit) so the fraction of rows
    matching the 0..rhs-1 unique-key table is ~hit per level."""
    rng = np.random.default_rng(seed)
    cols = [
        rng.integers(0, max(int(rhs / h), 1), size=lhs, dtype=np.int64)
        for h in hit_rates
    ]
    return np.stack(cols, axis=1)


def main():
    print(jax.devices(), flush=True)
    from ccve_tpu.config import CompactionStrategy, EngineConfig, PayloadMode
    from ccve_tpu.core.datagen import gen_rhs_table
    from ccve_tpu.exec.sorted_pipeline import SortedPipeline
    from ccve_tpu.ops.sort_merge import build_sorted

    lhs, rhs, block = 2_000_000, 50_000, 2048
    probe = gen_hetero_probe(lhs, rhs, (1.0, 0.05, 0.5))
    keys, payloads = gen_rhs_table(rhs, 1)
    st = build_sorted(keys, payloads)
    tables = [st, st, st]

    base_cfg = EngineConfig(
        block_size=block, n_joins=3, lhs_size=lhs, rhs_size=rhs,
        strategy=CompactionStrategy.FULL,
        payload_mode=PayloadMode.REFERENCE,
    )

    cases = [
        ("NONE", dataclasses.replace(
            base_cfg, strategy=CompactionStrategy.NONE)),
        ("FULL", base_cfg),
        ("mixed (0,B,0)", dataclasses.replace(
            base_cfg, compact_threshold_per_level=(0, block, 0))),
        ("mixed (B,B,0)", dataclasses.replace(
            base_cfg, compact_threshold_per_level=(block, block, 0))),
        ("mixed (0,0,0)", dataclasses.replace(
            base_cfg, compact_threshold_per_level=(0, 0, 0))),
    ]
    base = None
    for name, cfg in cases:
        pipe = SortedPipeline(tables, cfg)
        pipe.run(probe)
        secs = [pipe.run(probe)["seconds"] for _ in range(3)]
        r = pipe.run(probe)
        if base is None:
            base = r["count"]
        assert r["count"] == base, (name, r["count"], base)
        print(
            f"{name:14s}: best {min(secs):.3f}s of "
            f"{[f'{s:.3f}' for s in secs]} count={r['count']}",
            flush=True,
        )


if __name__ == "__main__":
    main()
