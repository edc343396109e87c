"""Round-2 chip measurements, part 2: branchy A/B + configs 2/3/6.
(sorted_expand old-vs-new is measured separately — its 4M XLA compile
stalls the remote compile helper for >25 min, under investigation.)

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python -u scripts/measure_r2_configs.py
"""
import time

import jax
import numpy as np


def main():
    print(jax.devices(), flush=True)
    from ccve_tpu.config import CompactionStrategy, EngineConfig, PayloadMode
    from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table
    from ccve_tpu.exec.pipeline import JoinPipeline
    from ccve_tpu.ops.hash_table import build_csr

    lhs, rhs, blockc = 1_000_000, 50_000, 2048
    probe4 = gen_probe_table(lhs, 4, 2 * rhs)
    k4, p4 = gen_rhs_table(rhs, 1)
    t4 = [build_csr(k4, p4) for _ in range(4)]
    for branchy in (False, True):
        cfg = EngineConfig(
            block_size=blockc, n_joins=4, lhs_size=lhs, rhs_size=rhs,
            strategy=CompactionStrategy.FULL,
            payload_mode=PayloadMode.REFERENCE, branchy_descend=branchy,
        )
        pipe = JoinPipeline(t4, cfg)
        pipe.run(probe4)
        r = pipe.run(probe4)
        print(
            f"exec 4-way FULL branchy={branchy}: {r['seconds']:.3f}s "
            f"count={r['count']}", flush=True,
        )

    from ccve_tpu.bench.configs import (
        config2_filtered_join,
        config3_four_way,
        config6_mixed_selectivity,
    )

    for name, fn in (
        ("config2", config2_filtered_join),
        ("config3", config3_four_way),
        ("config6", lambda: config6_mixed_selectivity(log_dir="./bandit_log_config6")),
    ):
        t0 = time.perf_counter()
        r = fn()
        print(f"{name}: {r}  (wall {time.perf_counter() - t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
