"""Round-4 headline margin sweep (VERDICT #5): merge-ladder skip levels
around the 0.8*n/m heuristic, measured on the bench.py sustained
methodology (device fori_loop, anti-CSE bias, one scalar readback).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 4000 \
       python -u scripts/probe_r4_skip_sweep.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import ccve_tpu.ops.sort_merge as sm
from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table

print("devices:", jax.devices(), flush=True)

N_BUILD, N_PROBE, NITER = 1_000_000, 16_000_000, 32
keys, payloads = gen_rhs_table(N_BUILD, 1)
probe = gen_probe_table(N_PROBE, 1, N_BUILD)
table = sm.build_sorted(keys, payloads)
probe_dev = jax.device_put(jnp.asarray(probe.astype(np.int32)))  # [n, 1]
expected = int((probe[:, 0] < N_BUILD).sum())

results = {}
for skip in (None, 2, 3, 4, 5):
    sm.SKIP_LEVELS_OVERRIDE = skip

    # call sorted_match_totals DIRECTLY: bulk_count rides a
    # module-level jit whose cache ignores the trace-time override
    # (first sweep measured one program five times)
    @jax.jit
    def run_loop(p):
        def body(_, acc):
            bias = jnp.where(acc < 0, jnp.int32(1), jnp.int32(0))
            c, chk = sm.sorted_match_totals(table, (p + bias)[:, 0])
            return acc + c

        return jax.lax.fori_loop(0, NITER, body, jnp.int64(0))

    total = int(run_loop(probe_dev))
    assert total == NITER * expected, (skip, total)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(run_loop(probe_dev))
        best = min(best, time.perf_counter() - t0)
    per = best / NITER
    results[str(skip)] = {
        "ms": round(per * 1e3, 3),
        "rows_per_s_M": round(N_PROBE / per / 1e6, 1),
    }
    print(f"skip={skip}: {per * 1e3:.3f} ms/batch "
          f"({N_PROBE / per / 1e6:.1f}M rows/s)", flush=True)
sm.SKIP_LEVELS_OVERRIDE = None
print(json.dumps(results), flush=True)
