"""Headline benchmark: single-chip hash-join probe throughput.

Workload = BASELINE.json config 1: one equi-join, 1M build rows / 16M
probe rows, uniform int64 keys (the reference pipeline driver's
generators, main.cpp:41-55 / linear_probing_ht.cpp:14-25, reproduced
bit-exactly by core/datagen.py). The measured operator is the full probe:
locate every match of every probe key, count it, and gather+sum the
matched build payloads — the same per-key work the reference micro-bench
times (simd_micro_bench.cpp:155-186), plus payload gathering the
reference skips (it stores no payloads).

Two engines are measured (both verified against the same expected count):
 - hash_lp:    linear-probing table + batched gather probe
   (exec/bulk.lp_match_stats) — the reference's algorithm, TPU-ified;
 - sort_merge: gather-free sort-merge stats (ops/sort_merge.py) — the
   TPU-native formulation (the TPU has no random-gather hardware; XLA
   sort outruns XLA gather ~5x per pass here).

The headline metric is the faster engine's rows/s.

Baseline: the reference's best recorded numbers are AVX-512 cycles/key on
its open-addressing table — 4.06 (probe) + 5.22 (next) = 9.28 cycles/key
(simd_hash_probing_notes:68-75, see BASELINE.md). At a 3.0 GHz clock this
is ~323M rows/s/core; `vs_baseline` is our rows/s over that figure.

Prints exactly ONE JSON line to stdout.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

N_BUILD = 1_000_000
N_PROBE = 16_000_000
BASELINE_ROWS_PER_S = 3.0e9 / 9.28  # AVX-512 LP probe+next @ 3 GHz


def main() -> None:
    from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table
    from ccve_tpu.exec.bulk import bulk_count
    from ccve_tpu.ops.hash_table import build_lp
    from ccve_tpu.ops.sort_merge import build_sorted

    t0 = time.perf_counter()
    keys, payloads = gen_rhs_table(N_BUILD, 1)
    probe = gen_probe_table(N_PROBE, 1, N_BUILD)
    print(f"datagen: {time.perf_counter() - t0:.2f}s", file=sys.stderr)

    t0 = time.perf_counter()
    engines = {
        "hash_lp": build_lp(keys, payloads),
        "sort_merge": build_sorted(keys, payloads),
    }
    jax.block_until_ready([t for t in engines.values()])
    print(f"build: {time.perf_counter() - t0:.2f}s", file=sys.stderr)

    probe_dev = jax.device_put(jnp.asarray(probe))
    jax.block_until_ready(probe_dev)

    # probe keys are uniform in [0, N_BUILD]; build keys are 0..N_BUILD-1
    # unique, so expected matches = #(key < N_BUILD)
    expected_count = int((probe[:, 0] < N_BUILD).sum())

    best = {}
    for name, table in engines.items():
        def run(table=table):
            res = bulk_count([table], probe_dev)
            jax.block_until_ready(res)
            return res

        res = run()  # warm-up / compile
        assert int(res.count) == expected_count, (
            f"{name}: count {int(res.count)} != expected {expected_count}"
        )
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        best[name] = min(times)
        print(
            f"{name}: best {best[name] * 1e3:.2f} ms "
            f"({N_PROBE / best[name] / 1e6:.1f}M rows/s)",
            file=sys.stderr,
        )

    winner = min(best, key=best.get)
    rows_per_s = N_PROBE / best[winner]
    print(
        json.dumps(
            {
                "metric": "hash_join_probe_rows_per_s_single_chip",
                "value": rows_per_s,
                "unit": "rows/s",
                "vs_baseline": rows_per_s / BASELINE_ROWS_PER_S,
                "engine": winner,
                "all_engines_rows_per_s": {
                    k: N_PROBE / v for k, v in best.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
