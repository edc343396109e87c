"""Probe: config 4 stage timings with sustained (fori+readback) sync."""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import ccve_tpu  # noqa: F401
from ccve_tpu.core.datagen import gen_rhs_table, gen_zipf_keys
from ccve_tpu.ops.aggregate import join_dense_aggregate
from ccve_tpu.ops.sort import radix_sort_pairs, xla_sort_pairs
from ccve_tpu.ops.sort_merge import build_sorted

n_probe, domain, alpha = 4_000_000, 100_000, 1.1
keys, payloads = gen_rhs_table(domain, 1)
table = build_sorted(keys, payloads)
probe = jax.device_put(jnp.asarray(gen_zipf_keys(n_probe, domain, alpha)))
REPS = 8


def sustained(f, arg):
    # single-dispatch with a scalar readback sync (the fori form hits a
    # scoped-vmem compile bug in the radix one-hot rank reduce-windows);
    # each rep includes one ~15-27 ms relay round trip — subtract the
    # measured floor below.
    jf = jax.jit(f)
    int(jf(arg))
    best = min(
        (lambda t: (int(jf(arg)), time.perf_counter() - t)[1])(
            time.perf_counter()
        )
        for _ in range(6)
    )
    return best


def agg_only(p):
    agg, total = join_dense_aggregate(table, p, domain)
    return total


def agg_sort(p):
    agg, total = join_dense_aggregate(table, p, domain)
    sk, sv = radix_sort_pairs(agg.sum, agg.keys, bits=48)
    return total + sk[-1] - sk[-1] + sv[-1] - sv[-1]


def agg_xla_sort(p):
    agg, total = join_dense_aggregate(table, p, domain)
    sk, sv = xla_sort_pairs(agg.sum, agg.keys)
    return total + sk[-1] - sk[-1] + sv[-1] - sv[-1]


floor = sustained(lambda p: p[0] * 0, probe)
print(f"relay floor : {floor*1e3:7.2f} ms", flush=True)
for name, f in [("agg_only", agg_only), ("agg+xlasort", agg_xla_sort), ("agg+radix48", agg_sort)]:
    t = sustained(f, probe)
    print(f"{name:12s}: {t*1e3:7.2f} ms  (-floor {(t-floor)*1e3:.2f} ms)",
          flush=True)
