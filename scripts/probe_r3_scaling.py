"""config-5 scaling harness on the virtual CPU mesh, P in {1,2,4,8} —
STRUCTURAL record only (CPU devices share one socket's bandwidth, so
efficiency here tracks collective/shuffle overhead trends for regression
purposes, NOT real multi-chip scaling — BASELINE north star needs a pod).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     PYTHONPATH=/root/repo python -u scripts/probe_r3_scaling.py
"""
import json
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

from ccve_tpu.bench.configs import config5_distributed

for p in (1, 2, 4, 8):
    r = config5_distributed(n_build=100_000, n_probe=1_000_000, n_devices=p)
    r["label"] = "structural_cpu_mesh"
    print(json.dumps(r), flush=True)
