import json
from ccve_tpu.bench.configs import config1_materialize
out = config1_materialize()
print(json.dumps(out, default=float), flush=True)
