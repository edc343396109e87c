"""Probe: sustained timing of successive prefixes of the count-side
join pipeline (bench.py workload), to localize non-kernel overhead.

Stages: pack -> sort -> merge -> counts -> totals (the full path of
sorted_match_totals' pack32 branch, ops/sort_merge.py)."""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import ccve_tpu  # noqa: F401
from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table
from ccve_tpu.ops.sort_merge import build_sorted
from ccve_tpu.kernels.bigsort import merge_sorted_i32, pallas_sort_i32
from ccve_tpu.kernels.merge_scan import merge_scan_build_counts

N_BUILD, N_PROBE = 1_000_000, 16_000_000
keys, payloads = gen_rhs_table(N_BUILD, 1)
probe = gen_probe_table(N_PROBE, 1, N_BUILD)
table = build_sorted(keys, payloads)
probe_dev = jax.device_put(jnp.asarray(probe[:, 0]))

kmin, key_bits = table.pack32
key_lo = kmin - 1
key_span = 1 << key_bits
b32 = (((table.keys - key_lo) << 1) | 1).astype(jnp.int32)
m = table.keys.shape[0]
REPS = 8


def staged(stop):
    def f(pk):
        p32 = (jnp.clip(pk - key_lo, 0, key_span - 1) << 1).astype(jnp.int32)
        if stop == "pack":
            return p32
        s = pallas_sort_i32(p32)
        if stop == "sort":
            return s
        s = merge_sorted_i32(s, b32)
        if stop == "merge":
            return s
        bc = merge_scan_build_counts(s, m).astype(jnp.int64)
        if stop == "counts":
            return bc
        return jnp.sum(bc) + jnp.sum(bc * table.payloads)

    @jax.jit
    def run_loop(pk):
        def body(_, acc):
            bias = jnp.where(acc < 0, jnp.int64(1), jnp.int64(0))
            r = f(pk + bias)
            return acc + r.reshape(-1)[0].astype(jnp.int64)

        return jax.lax.fori_loop(0, REPS, body, jnp.int64(0))

    t0 = time.perf_counter()
    int(run_loop(probe_dev))
    warm = time.perf_counter() - t0
    best = min(
        (lambda t: (int(run_loop(probe_dev)), time.perf_counter() - t)[1])(
            time.perf_counter()
        )
        for _ in range(3)
    )
    return best / REPS, warm


prev = 0.0
for stop in ["pack", "sort", "merge", "counts", "totals"]:
    t, warm = staged(stop)
    print(
        f"{stop:7s}: {t*1e3:7.2f} ms  (+{(t-prev)*1e3:6.2f})  warm {warm:.0f}s",
        flush=True,
    )
    prev = t
