"""Probe: sustained sorted_match_totals on the bench workload with an
i32 vs i64 probe column — is the narrow/padded path actually winning?"""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import ccve_tpu  # noqa: F401
from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table
from ccve_tpu.ops.sort_merge import build_sorted, sorted_match_totals

N_BUILD, N_PROBE = 1_000_000, 16_000_000
keys, payloads = gen_rhs_table(N_BUILD, 1)
probe = gen_probe_table(N_PROBE, 1, N_BUILD)[:, 0]
table = build_sorted(keys, payloads)
REPS = 8


def sustained(pk, dtype):
    @jax.jit
    def run_loop(v):
        def body(_, acc):
            bias = jnp.where(acc < 0, 1, 0).astype(dtype)
            c, p = sorted_match_totals(table, v + bias)
            return acc + c

        return jax.lax.fori_loop(0, REPS, body, jnp.int64(0))

    t0 = time.perf_counter()
    r = int(run_loop(pk))
    warm = time.perf_counter() - t0
    best = min(
        (lambda t: (int(run_loop(pk)), time.perf_counter() - t)[1])(
            time.perf_counter()
        )
        for _ in range(3)
    )
    return best / REPS, warm, r // REPS


p64 = jax.device_put(jnp.asarray(probe))
p32 = jax.device_put(jnp.asarray(probe.astype(np.int32)))
t32, w32, c32 = sustained(p32, jnp.int32)
print(f"i32 probe: {t32*1e3:.2f} ms  count={c32}  (warm {w32:.0f}s)", flush=True)
t64, w64, c64 = sustained(p64, jnp.int64)
print(f"i64 probe: {t64*1e3:.2f} ms  count={c64}  (warm {w64:.0f}s)", flush=True)
assert c32 == c64
