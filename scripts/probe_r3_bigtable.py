"""VERDICT #2 'done' check: the sorted executor on a 4M-entry build
table. Round 2's chunk kernel capped at 2^20 VMEM entries and silently
fell back to chunk_rank_xla (~350 us/step lax.sorts). The batched rank
mode streams the table from HBM (pairsort merge), so a 4M-entry table
takes the kernel path. Measured head-to-head, counts cross-checked
against the bulk engine.

Geometry: 1M probe rows, 1 level, 4M-entry build (keys in [0, 8M) —
pack32 key_bits 23 <= 29, so the Pallas stats path engages).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python -u scripts/probe_r3_bigtable.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from ccve_tpu.config import CompactionStrategy, EngineConfig, PayloadMode
from ccve_tpu.exec.bulk import bulk_count
from ccve_tpu.exec.sorted_pipeline import SortedPipeline
from ccve_tpu.ops.sort_merge import build_sorted

print("devices:", jax.devices(), flush=True)
BLOCK, LHS, M = 2048, 1_000_000, 4_000_000
rng = np.random.default_rng(17)
keys = rng.integers(0, 2 * M, M).astype(np.int64)
payloads = np.arange(M, dtype=np.int64) + 10_000_000
probe = rng.integers(0, 2 * M, (LHS, 1)).astype(np.int64)

st = build_sorted(keys, payloads)
assert st.pack32 is not None and st.pack32[1] <= 29
expected = int(bulk_count([st], jax.device_put(jnp.asarray(probe))).count)
print(f"bulk expected count: {expected}", flush=True)

cfg = EngineConfig(block_size=BLOCK, n_joins=1, lhs_size=LHS, rhs_size=M,
                   strategy=CompactionStrategy.FULL,
                   payload_mode=PayloadMode.REFERENCE)

for name, pipe in (
    ("batched (HBM-streamed rank pass)", SortedPipeline([st], cfg)),
    ("chunk mode (falls back to chunk_rank_xla: table > 2^20 entries)",
     SortedPipeline([st], cfg, rank_mode="chunk")),
):
    if "chunk" in name:
        assert not any(pipe._kernel_level)  # really is the fallback
    pipe.run(probe, preload=True)
    best = min(pipe.run(probe, preload=True)["seconds"] for _ in range(3))
    r = pipe.run(probe, preload=True)
    assert r["count"] == expected, (r["count"], expected)
    print(f"{name}: {best:.4f} s = {LHS/best/1e6:.2f}M rows/s", flush=True)
print("OK", flush=True)
