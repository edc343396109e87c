"""Bisect the device-DYNAMIC structural overhead (1.55x vs static FULL
at identical thresholds):

  A. strategy FULL, flat _process scan            (baseline)
  B. strategy DYNAMIC routed through the SAME flat _process with fixed
     thresholds — adds ONLY the per-step level_rows occupancy op
  C. strategy DYNAMIC via _process_dyn, single arm — adds the nested
     seg-scan + bandit math on top of B

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
       python -u scripts/probe_dyn_structure.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

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

n_chunks = lhs // block
n = n_chunks * block  # whole chunks only (relative timing is the point)
probe = probe[:n]
batch = np.ascontiguousarray(
    np.swapaxes(probe.reshape(n_chunks, block, n_joins), 1, 2)
)
counts = np.full(n_chunks, block, np.int32)


def flat_run(strategy):
    cfg = EngineConfig(
        block_size=block, n_joins=n_joins, lhs_size=lhs, rhs_size=rhs,
        strategy=strategy, payload_mode=PayloadMode.REFERENCE,
    )
    pipe = JoinPipeline(tables, cfg, prefilter=flt.mod_eq(mod, 0))
    thr = jnp.full((n_joins,), 2048, jnp.int32)
    bj = jnp.asarray(batch)
    cj = jnp.asarray(counts)

    def once():
        ps = pipe.fresh_state()
        ps = pipe._process(ps, bj, cj, thr)
        ps = pipe._flush(ps, thr)
        return int(np.asarray(jax.device_get(ps.result_count)))

    c = once()
    t0 = time.perf_counter()
    c = once()
    return time.perf_counter() - t0, c


tA, cA = flat_run(CompactionStrategy.FULL)
print(f"A. FULL flat scan: {tA:.3f}s count={cA}", flush=True)

tB, cB = flat_run(CompactionStrategy.DYNAMIC)
assert cB == cA
print(f"B. DYNAMIC flat scan fixed thr (adds level_rows op): {tB:.3f}s "
      f"= {tB / tA:.2f}x A", flush=True)

# D: the nested seg-of-chunks scan with FIXED thresholds, no bandit —
# isolates scan nesting from the bandit math
def nested_run():
    cfg = EngineConfig(
        block_size=block, n_joins=n_joins, lhs_size=lhs, rhs_size=rhs,
        strategy=CompactionStrategy.DYNAMIC,
        payload_mode=PayloadMode.REFERENCE,
    )
    pipe = JoinPipeline(tables, cfg, prefilter=flt.mod_eq(mod, 0))
    seg = 8
    n_seg = n_chunks // seg
    b4 = jnp.asarray(batch[: n_seg * seg].reshape(n_seg, seg, n_joins, block))
    c2 = jnp.asarray(counts[: n_seg * seg].reshape(n_seg, seg))
    thr = jnp.full((n_joins,), 2048, jnp.int32)

    @jax.jit
    def process(ps, b4, c2):
        def one_seg(ps, xs):
            cols_seg, counts_seg = xs

            def one_chunk(p, x):
                c, cnt = x
                return pipe._one_chunk(p, c, cnt, thr), None

            ps, _ = jax.lax.scan(one_chunk, ps, (cols_seg, counts_seg))
            return ps, None

        ps, _ = jax.lax.scan(one_seg, ps, (b4, c2))
        return ps

    def once():
        ps = pipe.fresh_state()
        ps = process(ps, b4, c2)
        ps = pipe._flush(ps, thr)
        return int(np.asarray(jax.device_get(ps.result_count)))

    once()
    t0 = time.perf_counter()
    c = once()
    return time.perf_counter() - t0, c


tD, cD = nested_run()
print(f"D. DYNAMIC nested seg scan, no bandit: {tD:.3f}s = {tD / tA:.2f}x A",
      flush=True)

cfg = EngineConfig(
    block_size=block, n_joins=n_joins, lhs_size=lhs, rhs_size=rhs,
    strategy=CompactionStrategy.DYNAMIC,
    payload_mode=PayloadMode.REFERENCE,
    tuner_segment_chunks=8, device_tuner=True, threshold_arms=(2048,),
)
pipe = JoinPipeline(tables, cfg, prefilter=flt.mod_eq(mod, 0))
pipe.run(probe)
t0 = time.perf_counter()
r = pipe.run(probe)
tC = time.perf_counter() - t0
assert r["count"] == cA
print(f"C. DYNAMIC device tuner single arm: {tC:.3f}s = {tC / tA:.2f}x A "
      f"(seg nesting + bandit adds {tC - tB:.3f}s over B)", flush=True)
