"""A/B the early-stop depth: time the pack + capped sort + per-run
fused counts chain at skip = 0..5 merge levels (config 1 geometry,
honest acc-dependent bias, sustained 8x device loop).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
       python -u scripts/probe_skip_levels.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

print(jax.devices(), flush=True)

from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table
from ccve_tpu.kernels import bigsort as bs
from ccve_tpu.kernels.merge_scan import merge_counts_fused
from ccve_tpu.ops.sort_merge import build_sorted

NI = 8
nb, npr = 1_000_000, 16_000_000
keys_b, pays_b = gen_rhs_table(nb, 1)
tb = build_sorted(keys_b, pays_b)
probe_h = gen_probe_table(npr, 1, nb)
expected = int((probe_h[:, 0] < nb).sum())
p1d = jax.device_put(jnp.asarray(probe_h[:, 0].astype(np.int32)))

kmin0, kb0 = tb.pack32
key_lo = kmin0 - 1
span = 1 << kb0
b32 = (((tb.keys - key_lo) << 1) | 1).astype(jnp.int32)
tile = 1 << bs.TILE_LOG
n_pad = npr + (-npr) % tile
nt = n_pad // tile
n_levels_full = max(nt - 1, 0).bit_length()


def chain(skip):
    cap = max(n_levels_full - skip, 0)
    run = tile << cap
    n_runs = -(-n_pad // run)

    @jax.jit
    def f(p):
        def body(_, carry):
            acc, pp = carry
            pkc = jnp.clip(pp, jnp.int32(key_lo),
                           jnp.int32(key_lo + span - 1))
            p32 = (pkc - jnp.int32(key_lo)) << 1
            p32 = jnp.pad(p32, (0, n_pad - npr),
                          constant_values=np.int32(2**31 - 1))
            abuf = bs._sort_padded_buf(
                p32, bs.TILE_LOG, bs.CHUNK_LOG, n_levels_cap=cap
            )
            bc = None
            for r in range(n_runs):
                off = r * run
                nA_r = min(run, n_pad - off)
                n_real_r = int(np.clip(npr - off, 0, nA_r))
                bc_r = merge_counts_fused(
                    abuf, nA_r, n_real_r, b32, nb,
                    a_row_off=off // 128,
                    mask_a_end=(r != n_runs - 1),
                )
                bc = bc_r if bc is None else bc + bc_r
            tot = jnp.sum(bc, dtype=jnp.int64)
            bias = jnp.where(acc < 0, jnp.int32(1), jnp.int32(0))
            return acc + tot, pp + bias

        return jax.lax.fori_loop(0, NI, body, (jnp.int64(0), p))[0]

    out = int(f(p1d))
    assert out == NI * expected, (skip, out, NI * expected)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(f(p1d))
        best = min(best, (time.perf_counter() - t0) / NI)
    print(f"skip={skip} cap={cap} runs={n_runs}: {best * 1e3:.2f} ms/batch",
          flush=True)


for skip in range(0, 6):
    chain(skip)
