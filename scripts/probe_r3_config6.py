"""config 6 after the bandit convergence work (warm start 4->2 + early
commit): DYNAMIC-device regret vs best static, interleaved best-of-3
(the VERDICT #5 bar: <= 1.05x FULL). Runs the canonical
config6_mixed_selectivity and prints its JSON + commit history.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 4000 \
       python -u scripts/probe_r3_config6.py
"""
import json

import jax

from ccve_tpu.bench.configs import config6_mixed_selectivity

print("devices:", jax.devices(), flush=True)
out = config6_mixed_selectivity()
print(json.dumps(out, default=str), flush=True)
