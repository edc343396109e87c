"""LP tile-size sweep at 134M (round 3, follow-up)."""
import jax
import jax.numpy as jnp

from ccve_tpu.bench.micro import run_bulk_variant
from ccve_tpu.core.datagen import gen_microbench_keys, gen_rhs_table
from ccve_tpu.ops.hash_table import build_lp

print("devices:", jax.devices(), flush=True)
bk, bp = gen_rhs_table(128, 1)
lp = build_lp(bk, bp)
n = 1 << 27
keys = gen_microbench_keys(n, 128, 1)
kd = jax.device_put(jnp.asarray(keys))
jax.block_until_ready(kd)
for tile in (1 << 21, 1 << 23, 1 << 24):
    r = run_bulk_variant(lp, kd, f"t{tile}", tile_rows=tile)
    print(f"tile=2^{tile.bit_length()-1}: {r.ns_per_key:.1f} ns/key "
          f"tuples={r.tuples}", flush=True)
print("OK", flush=True)
