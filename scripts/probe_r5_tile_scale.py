"""Find the largest compile-safe expand tile: time compile+run of
sorted_expand at 1M (then 2M if fast) probe rows, 1M build."""
import time, jax, jax.numpy as jnp, numpy as np
from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table
from ccve_tpu.ops.sort_merge import build_sorted, sorted_expand

print("devices:", jax.devices(), flush=True)
keys, payloads = gen_rhs_table(1_000_000, 1)
table = build_sorted(keys, payloads)
probe = gen_probe_table(2_000_000, 1, 1_000_000)
pd = jax.device_put(jnp.asarray(probe[:, 0]))

for tile in (1_048_576, 2_097_152):
    t0 = time.perf_counter()
    @jax.jit
    def expand(p, _tile=tile):
        return sorted_expand(table, p, _tile)
    out = expand(pd[:tile])
    total = int(out[3])
    t_compile = time.perf_counter() - t0
    t1 = time.perf_counter()
    for _ in range(3):
        int(expand(pd[:tile])[3])
    t_run = (time.perf_counter() - t1) / 3
    print(f"tile {tile}: compile+first {t_compile:.1f}s, run {t_run*1e3:.1f}ms, total {total}", flush=True)
