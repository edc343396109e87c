"""Instrument _run_device_dynamic section by section: host batch prep,
H2D upload, the _process_dyn dispatch (synced), the est readback, the
flush, the final count readback.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
       python -u scripts/probe_dyn_sections.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

print(jax.devices(), flush=True)

from ccve_tpu.config import CompactionStrategy, EngineConfig, PayloadMode
from ccve_tpu.control import device_bandit as db
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

cfg = EngineConfig(
    block_size=block, n_joins=n_joins, lhs_size=lhs, rhs_size=rhs,
    strategy=CompactionStrategy.DYNAMIC,
    payload_mode=PayloadMode.REFERENCE,
    tuner_segment_chunks=8, device_tuner=True, threshold_arms=(2048,),
)
pipe = JoinPipeline(tables, cfg, prefilter=flt.mod_eq(mod, 0))

n = lhs
n_chunks = -(-n // block)
counts = np.full(n_chunks, block, np.int32)
pad_rows = n_chunks * block - n
if pad_rows:
    counts[-1] = block - pad_rows


def sections():
    seg = cfg.tuner_segment_chunks
    n_seg = -(-n_chunks // seg)
    total = n_seg * seg
    marks = [("start", time.perf_counter())]

    padded = np.zeros((total * block, cfg.n_joins), np.int64)
    padded[:n] = probe
    batch = np.ascontiguousarray(
        np.swapaxes(padded.reshape(total, block, cfg.n_joins), 1, 2)
    )
    counts_full = np.zeros(total, np.int32)
    counts_full[:n_chunks] = counts
    marks.append(("host prep", time.perf_counter()))

    batch4 = jnp.asarray(batch.reshape(n_seg, seg, cfg.n_joins, block))
    counts2 = jnp.asarray(counts_full.reshape(n_seg, seg))
    np.asarray(jax.device_get(batch4.reshape(-1)[:1]))
    marks.append(("h2d upload", time.perf_counter()))

    pstate = pipe.fresh_state()
    bstate = db.init_state(pipe.n_levels, len(cfg.resolved_threshold_arms))
    pstate, bstate = pipe._process_dyn(pstate, bstate, batch4, counts2)
    np.asarray(jax.device_get(pstate.result_count))
    marks.append(("process_dyn", time.perf_counter()))

    est = np.asarray(jax.device_get(bstate.est))
    marks.append(("est readback", time.perf_counter()))

    arms = np.asarray(cfg.resolved_threshold_arms, np.int32)
    thresholds = arms[est.argmax(1)]
    pstate = pipe._flush(pstate, jnp.asarray(thresholds))
    count = int(np.asarray(jax.device_get(pstate.result_count)))
    marks.append(("flush+count", time.perf_counter()))
    return marks, count


sections()  # warm
marks, count = sections()
prev = marks[0][1]
for name, t in marks[1:]:
    print(f"{name:14s} {(t - prev) * 1e3:8.1f} ms", flush=True)
    prev = t
print(f"total {(marks[-1][1] - marks[0][1]):.3f}s count={count}",
      flush=True)
