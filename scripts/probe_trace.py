"""Probe: capture a jax profiler device trace of the totals loop."""
import sys, glob, time
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
p32 = jax.device_put(jnp.asarray(probe.astype(np.int32)))
REPS = 4


@jax.jit
def run_loop(v):
    def body(_, acc):
        bias = jnp.where(acc < 0, 1, 0).astype(jnp.int32)
        c, p = sorted_match_totals(table, v + bias)
        return acc + c

    return jax.lax.fori_loop(0, REPS, body, jnp.int64(0))


int(run_loop(p32))  # compile + warm
with jax.profiler.trace("/tmp/jaxtrace"):
    int(run_loop(p32))
print("files:", glob.glob("/tmp/jaxtrace/**/*", recursive=True)[:20])
