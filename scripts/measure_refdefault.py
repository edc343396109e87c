"""The reference driver's DEFAULT workload, end-to-end, at full scale:
kLHSTupleSize = 2e7 probe rows x kJoins = 3 levels x kRHSTupleSize = 2e6
build rows (/root/reference/base.h:44-51, main.cpp:202-243), chunk-factor
{1, 2, 4} — the one reference workload never reproduced at scale
(VERDICT round 2, Missing #2). One table row per engine per chunk-factor
with cross-checked counts:

 - bulk: operator-at-a-time count (sustained device loop, upload excluded
   like configs.py);
 - sorted executor: chunk-at-a-time batched-rank engine, FULL compaction,
   streamed AND preloaded feeds;
 - cursor executor: the parity engine, FULL, single run (its full-scale
   run is minutes; relay jitter is small relative to that).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5000 \
       python -u scripts/measure_refdefault.py
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ccve_tpu.config import CompactionStrategy, EngineConfig, PayloadMode
from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table
from ccve_tpu.exec.bulk import bulk_count
from ccve_tpu.exec.pipeline import JoinPipeline
from ccve_tpu.exec.sorted_pipeline import SortedPipeline
from ccve_tpu.ops.hash_table import build_csr
from ccve_tpu.ops.sort_merge import build_sorted

print("devices:", jax.devices(), flush=True)

LHS, RHS, JOINS, BLOCK = 20_000_000, 2_000_000, 3, 2048


def emit(**kw):
    print(json.dumps(kw), flush=True)


probe = gen_probe_table(LHS, JOINS, RHS)

for cf in (1, 2, 4):
    keys, payloads = gen_rhs_table(RHS, cf)
    st = build_sorted(keys, payloads)
    stables = [st] * JOINS

    # ---- bulk (sustained 4x loop, probe device-resident) --------------
    probe_dev = jax.device_put(jnp.asarray(probe.astype(np.int32)))
    res = bulk_count(stables, probe_dev)
    expected = int(res.count)

    NITER = 4

    @jax.jit
    def bulk_loop(p):
        def body(_, acc):
            bias = jnp.where(acc < 0, 1, 0).astype(p.dtype)
            r = bulk_count(stables, p + bias)
            return acc + r.count

        return jax.lax.fori_loop(0, NITER, body, jnp.int64(0))

    assert int(bulk_loop(probe_dev)) == NITER * expected
    t0 = time.perf_counter()
    int(bulk_loop(probe_dev))
    sus = (time.perf_counter() - t0) / NITER
    emit(engine="bulk", chunk_factor=cf, seconds=sus,
         rows_per_s=LHS / sus, count=expected)
    del probe_dev

    # ---- sorted executor (FULL), streamed + preloaded ------------------
    cfg = EngineConfig(
        block_size=BLOCK, n_joins=JOINS, lhs_size=LHS, rhs_size=RHS,
        chunk_factor=cf, strategy=CompactionStrategy.FULL,
        payload_mode=PayloadMode.REFERENCE,
    )
    spipe = SortedPipeline(stables, cfg)
    r = spipe.run(probe)  # warm-up/compile
    assert r["count"] == expected, (r["count"], expected)
    best_s = min(spipe.run(probe)["seconds"] for _ in range(2))
    rp = spipe.run(probe, preload=True)
    assert rp["count"] == expected
    best_p = min(rp["seconds"], spipe.run(probe, preload=True)["seconds"])
    emit(engine="sorted_full", chunk_factor=cf, seconds=best_s,
         rows_per_s=LHS / best_s, preloaded_seconds=best_p,
         preloaded_rows_per_s=LHS / best_p, count=expected)

    # ---- cursor executor (FULL), single run ---------------------------
    ctables = [build_csr(keys, payloads) for _ in range(JOINS)]
    cpipe = JoinPipeline(ctables, cfg)
    # warm-up on a slice (compile), then one full timed run
    cpipe.run(probe[: 64 * BLOCK])
    rc = cpipe.run(probe)
    assert rc["count"] == expected, (rc["count"], expected)
    emit(engine="cursor_full", chunk_factor=cf, seconds=rc["seconds"],
         rows_per_s=LHS / rc["seconds"], count=expected)

print("OK", flush=True)
