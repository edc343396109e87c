"""One-pass chip measurement of everything landed during the tunnel
outage (PERF_NOTES.md 'Landed while the TPU tunnel was down'):

  A. headline guard: config-1 sustained loop (must stay ~617M rows/s);
  B. sorted_match_stats old (XLA int64 sorts) vs new (pairsort planes)
     at 1M build / 16M probe;
  C. sorted_expand old vs new at 1M/4M (F=1);
  D. config 2 executor (full strategy) — pop-free work loop;
  E. config 3 — bulk (pallas stats x 4 levels) + executor full.

Run: timeout 3000 python scripts/measure_downtime_work.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[:1]))
    return out


def timed(label, fn, *args, reps=3):
    sync(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best * 1e3:.2f} ms", flush=True)
    return best


def main():
    from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table
    from ccve_tpu.ops.sort_merge import (
        build_sorted,
        sorted_expand,
        sorted_match_stats,
    )

    print(jax.devices(), flush=True)

    # --- 0: Mosaic lowering smoke for the outage-window kernels --------
    # (pairsort / merge_scan_stats32 have only ever run in interpret
    # mode — validate real lowering at small scale before the big runs)
    from ccve_tpu.kernels.pairsort import (
        merge_sorted_multi_i32,
        pallas_sort_multi_i32,
    )

    rng = np.random.default_rng(0)
    ks = rng.integers(0, 1 << 20, 300_000).astype(np.int32)
    vs = np.arange(300_000, dtype=np.int32)
    gk, (gv,) = pallas_sort_multi_i32(jnp.asarray(ks), [jnp.asarray(vs)])
    gk, gv = np.asarray(gk), np.asarray(gv)
    assert np.array_equal(gk, np.sort(ks)), "pairsort keys wrong on chip"
    assert np.array_equal(ks[gv], gk), "pairsort cargo detached on chip"
    mk, (mv,) = merge_sorted_multi_i32(
        jnp.asarray(gk), [jnp.asarray(gv)],
        jnp.asarray(np.sort(ks[:1000])), [jnp.asarray(vs[:1000])],
    )
    assert np.array_equal(
        np.asarray(mk), np.sort(np.concatenate([ks, ks[:1000]]))
    ), "pair merge wrong on chip"
    print("lowering smoke: pairsort + merge ok", flush=True)

    # --- B: stats old vs new ------------------------------------------
    n_build, n_probe = 1_000_000, 16_000_000
    keys, payloads = gen_rhs_table(n_build, 1)
    probe = gen_probe_table(n_probe, 1, n_build)
    st = build_sorted(keys, payloads)
    p32 = jax.device_put(jnp.asarray(probe[:, 0].astype(np.int32)))
    sync(p32)

    old = jax.jit(lambda p: sorted_match_stats(st, p, use_kernel=False))
    new = jax.jit(lambda p: sorted_match_stats(st, p, use_kernel=True))
    a = sync(old(p32))
    b = sync(new(p32))
    assert int(jnp.sum(a.mult)) == int(jnp.sum(b.mult))
    assert int(jnp.sum(a.psum)) == int(jnp.sum(b.psum))
    timed("stats OLD (int64 lax.sorts) 16M", old, p32)
    timed("stats NEW (pairsort planes) 16M", new, p32)

    # --- C: expand old vs new -----------------------------------------
    n_e = 4_000_000
    pe = jax.device_put(jnp.asarray(probe[:n_e, 0].astype(np.int32)))
    cap = n_e  # max_mult == 1
    olde = jax.jit(lambda p: sorted_expand(st, p, cap, use_kernel=False))
    newe = jax.jit(lambda p: sorted_expand(st, p, cap, use_kernel=True))
    r0 = sync(olde(pe))
    r1 = sync(newe(pe))
    assert int(r0[3]) == int(r1[3]), (int(r0[3]), int(r1[3]))
    timed("expand OLD 4M", olde, pe)
    timed("expand NEW 4M", newe, pe)

    # --- D2: branchy-descend A/B on a config-3-shaped executor run ----
    from ccve_tpu.config import CompactionStrategy, EngineConfig, PayloadMode
    from ccve_tpu.core.datagen import gen_probe_table as gpt
    from ccve_tpu.exec.pipeline import JoinPipeline
    from ccve_tpu.ops.hash_table import build_csr

    lhs, rhs, blockc = 1_000_000, 50_000, 2048
    probe4 = gpt(lhs, 4, 2 * rhs)
    k4, p4 = gen_rhs_table(rhs, 1)
    t4 = [build_csr(k4, p4) for _ in range(4)]
    for branchy in (False, True):
        cfg = EngineConfig(
            block_size=blockc, n_joins=4, lhs_size=lhs, rhs_size=rhs,
            strategy=CompactionStrategy.FULL,
            payload_mode=PayloadMode.REFERENCE, branchy_descend=branchy,
        )
        pipe = JoinPipeline(t4, cfg)
        pipe.run(probe4)  # compile
        r = pipe.run(probe4)
        print(
            f"exec 4-way FULL branchy={branchy}: {r['seconds']:.3f}s "
            f"count={r['count']}",
            flush=True,
        )

    # --- A/D/E: bench configs -----------------------------------------
    from ccve_tpu.bench.configs import (
        config2_filtered_join,
        config3_four_way,
    )

    t0 = time.perf_counter()
    r2 = config2_filtered_join()
    print(f"config2: {r2}  (wall {time.perf_counter() - t0:.0f}s)", flush=True)
    t0 = time.perf_counter()
    r3 = config3_four_way()
    print(f"config3: {r3}  (wall {time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
