"""Canonical round-3 config 2 + 3 artifacts (cli baseline functions,
full size, on chip) — the JSON the README/VERDICT numbers cite.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 5000 \
       python -u scripts/probe_r3_c23_final.py
"""
import json

import jax

from ccve_tpu.bench.configs import config2_filtered_join, config3_four_way

print("devices:", jax.devices(), flush=True)
print(json.dumps(config2_filtered_join(), default=str), flush=True)
print(json.dumps(config3_four_way(), default=str), flush=True)
