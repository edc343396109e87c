"""CPU model of lp_match_stats' halving-ladder survivor counts at the
micro-bench geometry (scale 0: rhs=128, 512 slots) for 4M vs 134M key
streams — tests the round-2 regression hypothesis (405.7 vs 294.6
ns/key): does the halving schedule's overflow fallback fire at 134M?

Run: PYTHONPATH=/root/repo python scripts/probe_lp_drain_model.py
"""
import numpy as np

from ccve_tpu.core.datagen import gen_microbench_keys, gen_rhs_table
from ccve_tpu.ops.hashing import murmurhash64_np

rhs_tuples, hit_freq = 128, 1
keys_tab, _ = gen_rhs_table(rhs_tuples, 1)

# replicate build_lp host-side: slots = next pow2 >= 4*n, linear probe
n_slots = 1 << (4 * rhs_tuples - 1).bit_length()
slots = np.full(n_slots, -1, np.int64)
for k in sorted(keys_tab.tolist()):
    pass
# insertion order = build order (keys_tab order)
slots[:] = -1
for k in keys_tab.tolist():
    s = int(murmurhash64_np(np.array([k], np.uint64))[0] % n_slots)
    while slots[s] != -1:
        s = (s + 1) % n_slots
    slots[s] = k

occ = slots != -1
print(f"slots={n_slots} load={occ.mean():.3f}")
# run length from each slot
run_len = np.zeros(n_slots, np.int64)
for s in range(n_slots):
    c, i = 0, s
    while occ[i]:
        c += 1
        i = (i + 1) % n_slots
        if c > n_slots:
            break
    run_len[s] = c
print(f"max run from any slot: {run_len.max()}")

for n in (1 << 22, 1 << 27):
    keys = gen_microbench_keys(n, rhs_tuples, hit_freq)
    h = (murmurhash64_np(keys.astype(np.uint64)) % n_slots).astype(np.int64)
    drain = run_len[h]  # steps until this lane dies (hits EMPTY)
    # step 0 runs at full width; survivors into the ladder = drain > 1
    survivors = drain > 1
    cap = n
    floor = max(n // 16, 16384)
    stage = 0
    step_done = 1
    overflowed = False
    while cap > floor:
        new_cap = max(cap // 2, floor)
        n_live = int((drain > step_done).sum())
        over = n_live > new_cap
        overflowed |= over
        print(f"n=2^{int(np.log2(n))} stage {stage}: new_cap={new_cap} "
              f"live={n_live} ({n_live/n:.3f} of n) overflow={over}")
        cap = new_cap
        step_done += 1
        stage += 1
    tail_iters = int(max(drain.max() - step_done, 0))
    print(f"n=2^{int(np.log2(n))}: OVERFLOW={overflowed}, tail width "
          f"{cap}, tail iters ~{tail_iters}, mean drain "
          f"{drain.mean():.2f}")
