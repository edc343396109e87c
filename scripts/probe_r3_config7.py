"""config 7 after round-3 executor changes (interleaved protocol is
inside the config function).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 4000 \
       python -u scripts/probe_r3_config7.py
"""
import json

import jax

from ccve_tpu.bench.configs import config7_heterogeneous_levels

print("devices:", jax.devices(), flush=True)
out = config7_heterogeneous_levels()
print(json.dumps(out, default=str), flush=True)
