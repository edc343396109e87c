"""Phase-by-phase actual vs roofline model (config 1 geometry, honest
acc-dependent bias, NI=16 sustained):

  1. pack only
  2. pack + presort (cap=0: in-tile Batcher, no merge levels)
  3. pack + presort + 4 merge levels (cap=4)
  4. full chain (+ 8-run fused counts + sum)

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
       python -u scripts/probe_phase_gap.py
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

NI = 16
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
CAP = 4
RUN = tile << CAP
N_RUNS = -(-n_pad // RUN)


def chain(stage):
    @jax.jit
    def f(p):
        def body(_, carry):
            acc, pp = carry
            pkc = jnp.clip(pp, jnp.int32(key_lo),
                           jnp.int32(key_lo + span - 1))
            p32 = (pkc - jnp.int32(key_lo)) << 1
            p32 = jnp.pad(p32, (0, n_pad - npr),
                          constant_values=np.int32(2**31 - 1))
            if stage == 1:
                tot = jnp.sum(p32[::65536].astype(jnp.int64))
            else:
                cap = 0 if stage == 2 else CAP
                abuf = bs._sort_padded_buf(
                    p32, bs.TILE_LOG, bs.CHUNK_LOG, n_levels_cap=cap
                )
                if stage < 4:
                    tot = jnp.sum(abuf[::512, 0].astype(jnp.int64))
                else:
                    bc = None
                    for r in range(N_RUNS):
                        off = r * RUN
                        nA_r = min(RUN, n_pad - off)
                        n_real_r = int(np.clip(npr - off, 0, nA_r))
                        bc_r = merge_counts_fused(
                            abuf, nA_r, n_real_r, b32, nb,
                            a_row_off=off // 128,
                            mask_a_end=(r != N_RUNS - 1),
                        )
                        bc = bc_r if bc is None else bc + bc_r
                    tot = jnp.sum(bc, dtype=jnp.int64)
            bias = jnp.where(acc < 0, jnp.int32(1), jnp.int32(0))
            return acc + tot, pp + bias

        return jax.lax.fori_loop(0, NI, body, (jnp.int64(0), p))[0]

    out = int(f(p1d))
    if stage == 4:
        assert out == NI * expected
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        int(f(p1d))
        best = min(best, (time.perf_counter() - t0) / NI)
    return best


names = ["pack", "+presort(cap0)", f"+merges(cap{CAP})",
         f"+counts({N_RUNS} runs)+sum"]
prev = 0.0
for stage, name in enumerate(names, start=1):
    t = chain(stage)
    print(f"{stage}.{name}: {t * 1e3:.2f} ms (marginal "
          f"{(t - prev) * 1e3:.2f})", flush=True)
    prev = t
