"""bulk_fused_lp after the tiling fix: 4M whole-stream vs 134M tiled
(2^22 tiles) on chip — the round-2 regression check
(VERDICT weak #3; target: 134M <= 4M-scale ns/key, counts agree).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 4000 \
       python -u scripts/probe_lp_tiled.py
"""
import jax
import jax.numpy as jnp

from ccve_tpu.bench.micro import run_bulk_variant
from ccve_tpu.core.datagen import gen_microbench_keys, gen_rhs_table
from ccve_tpu.ops.hash_table import build_lp

print("devices:", jax.devices(), flush=True)
bk, bp = gen_rhs_table(128, 1)
lp = build_lp(bk, bp)

for n, tile in ((1 << 22, None), (1 << 27, 1 << 22), (1 << 27, None)):
    keys = gen_microbench_keys(n, 128, 1)
    kd = jax.device_put(jnp.asarray(keys))
    jax.block_until_ready(kd)
    r = run_bulk_variant(lp, kd, f"lp_n{n}_tile{tile}", tile_rows=tile)
    print(f"n=2^{n.bit_length()-1} tile={tile}: {r.ns_per_key:.1f} ns/key "
          f"tuples={r.tuples}", flush=True)
    del kd
print("OK", flush=True)
