"""Isolate the batched-rank cost: time _seg_ranks alone vs one full
_process segment on config-2/3 geometry (round-3 bisection).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
       python -u scripts/probe_r3_rankcost.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ccve_tpu.config import CompactionStrategy, EngineConfig, PayloadMode
from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table
from ccve_tpu.exec.sorted_pipeline import SortedPipeline
from ccve_tpu.ops.sort_merge import build_sorted

print("devices:", jax.devices(), flush=True)
BLOCK, SEG = 2048, 64


def sync(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0].reshape(-1)[:1]))


def t(fn, *a, reps=3):
    sync(fn(*a))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); sync(fn(*a))
        best = min(best, time.perf_counter() - t0)
    return best


lhs, rhs = 1_000_000, 50_000
probe = gen_probe_table(lhs, 4, 2 * rhs)
keys, payloads = gen_rhs_table(rhs, 1)
st = build_sorted(keys, payloads)
cfg = EngineConfig(block_size=BLOCK, n_joins=4, lhs_size=lhs, rhs_size=rhs,
                   strategy=CompactionStrategy.FULL,
                   payload_mode=PayloadMode.REFERENCE)
pipe = SortedPipeline([st] * 4, cfg)

seg_cols = jnp.asarray(
    np.ascontiguousarray(
        np.swapaxes(probe[: SEG * BLOCK].reshape(SEG, BLOCK, 4), 1, 2)
    )
)
counts = jnp.full(SEG, BLOCK, jnp.int32)

ranks_fn = jax.jit(pipe._seg_ranks)
print(f"_seg_ranks (4 levels, {SEG}x{BLOCK}): {t(ranks_fn, seg_cols)*1e3:.2f} ms",
      flush=True)

# one level only
import ccve_tpu.ops.sort_merge as sm
one = jax.jit(lambda c: sm.sorted_match_ranks(
    pipe._rank_tables[0], c[:, 0, :].reshape(-1)))
print(f"sorted_match_ranks 1 level: {t(one, seg_cols)*1e3:.2f} ms", flush=True)

stats_only = jax.jit(lambda c: sm.sorted_match_stats(
    pipe._rank_tables[0], c[:, 0, :].reshape(-1)))
print(f"sorted_match_stats 1 level: {t(stats_only, seg_cols)*1e3:.2f} ms",
      flush=True)

# full segment process (ranks + scan of 64 chunks)
ps = pipe.fresh_state()
thr = jnp.asarray(pipe.static_thresholds())
proc = jax.jit(lambda p, c, n: pipe._scan_chunks(p, c, n, thr))
print(f"full segment (ranks + 64-chunk scan): {t(proc, ps, seg_cols, counts)*1e3:.2f} ms",
      flush=True)
