"""Hash-probe engines at config-1 scale (VERDICT round-1 item 7).

Times exec/bulk.lp_match_stats and csr_match_stats end-to-end on the
chip at the headline workload (1M build / 16M probe, uniform) with the
same sustained device-loop methodology bench.py uses for the sort-merge
engine, so PERF_NOTES can carry one rows/s row per engine at full scale.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python -u scripts/probe_hash_fullscale.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N_BUILD = 1 << 20
N_PROBE = 1 << 24
NITER = 4  # the hash engines run seconds/batch; 4 amortizes the relay


def main():
    print(jax.devices(), file=sys.stderr, flush=True)
    from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table
    from ccve_tpu.exec.bulk import csr_match_stats, lp_match_stats
    from ccve_tpu.ops.hash_table import build_csr, build_lp

    keys, payloads = gen_rhs_table(N_BUILD, 1)
    probe = gen_probe_table(N_PROBE, 1, N_BUILD)
    expected = int((probe[:, 0] < N_BUILD).sum())

    lp = build_lp(keys, payloads)
    csr = build_csr(keys, payloads)
    probe_dev = jax.device_put(jnp.asarray(probe[:, 0]))
    jax.block_until_ready(probe_dev)

    for name, table, fn in (
        ("hash_lp", lp, lp_match_stats),
        ("hash_csr", csr, csr_match_stats),
    ):

        @jax.jit
        def run_loop(p, table=table, fn=fn):
            def body(_, acc):
                bias = jnp.where(acc < 0, jnp.int64(1), jnp.int64(0))
                st = fn(table, p + bias)
                return acc + st.mult.astype(jnp.int64).sum()

            return jax.lax.fori_loop(0, NITER, body, jnp.int64(0))

        total = int(run_loop(probe_dev))  # warm-up/compile + honest sync
        assert total == NITER * expected, (name, total, expected)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            int(run_loop(probe_dev))
            best = min(best, time.perf_counter() - t0)
        per = best / NITER
        print(
            f"{name}: {per * 1e3:.1f} ms/batch sustained "
            f"({N_PROBE / per / 1e6:.2f}M rows/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
