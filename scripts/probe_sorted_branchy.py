"""A/B the branchy descend in the SORTED-chunk executor on chip.

Config-3 geometry (4-way chained join, ~50% hit/level, 1M rows) and
config-2 geometry (filtered 1-level join), FULL and NONE strategies,
branchy_descend off vs on.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python -u scripts/probe_sorted_branchy.py
"""

import jax

def main():
    print(jax.devices(), flush=True)
    from ccve_tpu.config import CompactionStrategy, EngineConfig, PayloadMode
    from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table
    from ccve_tpu.exec.sorted_pipeline import SortedPipeline
    from ccve_tpu.ops import filter as flt
    from ccve_tpu.ops.sort_merge import build_sorted

    lhs, rhs, block = 1_000_000, 50_000, 2048
    keys, payloads = gen_rhs_table(rhs, 1)
    st = build_sorted(keys, payloads)

    # config 3: 4-way
    probe4 = gen_probe_table(lhs, 4, 2 * rhs)
    for strategy in (CompactionStrategy.NONE, CompactionStrategy.FULL):
        base = None
        for branchy in (False, True):
            cfg = EngineConfig(
                block_size=block, n_joins=4, lhs_size=lhs, rhs_size=rhs,
                strategy=strategy, payload_mode=PayloadMode.REFERENCE,
                branchy_descend=branchy,
            )
            pipe = SortedPipeline([st] * 4, cfg)
            pipe.run(probe4)
            secs = []
            for _ in range(3):
                r = pipe.run(probe4)
                secs.append(r["seconds"])
            if base is None:
                base = r["count"]
            assert r["count"] == base, (strategy, branchy, r["count"], base)
            best = min(secs)
            print(
                f"4-way {strategy.value:5s} branchy={branchy}: "
                f"best {best:.3f}s of {[f'{s:.3f}' for s in secs]} "
                f"({lhs / best / 1e6:.2f}M rows/s) count={r['count']}",
                flush=True,
            )

    # config 2: filtered single join, chunk_factor 2
    keys2, pay2 = gen_rhs_table(rhs, 2)
    st2 = build_sorted(keys2, pay2)
    probe1 = gen_probe_table(lhs, 1, 2 * rhs)
    base = None
    for branchy in (False, True):
        cfg = EngineConfig(
            block_size=block, n_joins=1, lhs_size=lhs, rhs_size=rhs,
            chunk_factor=2, strategy=CompactionStrategy.FULL,
            payload_mode=PayloadMode.REFERENCE, branchy_descend=branchy,
        )
        pipe = SortedPipeline([st2], cfg, prefilter=flt.mod_eq(10, 0))
        pipe.run(probe1)
        secs = []
        for _ in range(3):
            r = pipe.run(probe1)
            secs.append(r["seconds"])
        if base is None:
            base = r["count"]
        assert r["count"] == base, (branchy, r["count"], base)
        best = min(secs)
        print(
            f"filtered FULL branchy={branchy}: best {best:.3f}s of "
            f"{[f'{s:.3f}' for s in secs]} ({lhs / best / 1e6:.2f}M "
            f"rows/s) count={r['count']}",
            flush=True,
        )


if __name__ == "__main__":
    main()
