"""Round-2 chip measurements, run serially in ONE process (the axon
relay wedges when two processes touch the TPU concurrently — observed
2026-08-19: a second process no longer fails fast, it hangs BOTH).

  0. Mosaic lowering smoke + microbenchmark of the NEW chunk-probe
     kernel (kernels/chunk_probe.py) — per-step device cost vs table
     size, the number that decides the sorted executor's throughput;
  1. sorted_expand old (XLA int64 sorts) vs new (pairsort planes), 4M;
  2. 4-way executor branchy-descend A/B (landed in the outage window);
  3. config 2 (now incl. the sorted executor) and config 3 (same).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 \
       python -u scripts/measure_r2.py
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
    print(jax.devices(), flush=True)

    # --- 0: chunk-probe kernel smoke + per-step cost ------------------
    from ccve_tpu.kernels.chunk_probe import (
        I32_MAX,
        chunk_rank,
        stage_table_planes,
    )

    rng = np.random.default_rng(0)
    block = 2048
    for m, dom in [(2048, 4000), (50_000, 100_000), (200_000, 400_000)]:
        tk = np.sort(rng.integers(0, dom, m).astype(np.int64))
        kmin = int(tk.min())
        keys = rng.integers(0, dom, block).astype(np.int64)
        hi = int(tk.max()) - kmin + 2
        kp = np.clip(keys - kmin + 1, 0, hi)
        pk = jnp.asarray(((kp << 1) | 1).astype(np.int32))
        tpk = stage_table_planes(((tk - kmin + 1) << 1).astype(np.int32),
                                 block)
        mult, start = jax.block_until_ready(chunk_rank(tpk, m, pk))
        e_start = np.searchsorted(tk, keys, "left")
        e_mult = np.searchsorted(tk, keys, "right") - e_start
        assert np.array_equal(np.asarray(mult), e_mult), f"m={m} WRONG"
        live = e_mult > 0
        assert np.array_equal(np.asarray(start)[live], e_start[live])
        print(f"chunk_rank m={m}: correct on chip", flush=True)

        # sustained per-step cost: chain NITER dependent steps
        NITER = 64

        @jax.jit
        def loop(pk0):
            def body(_, carry):
                acc, p = carry
                mu, st = chunk_rank(tpk, m, p)
                bias = (mu[0] & 0) * 2  # data-dependent, always 0
                return acc + jnp.sum(mu, dtype=jnp.int64), p + bias

            return jax.lax.fori_loop(
                0, NITER, body, (jnp.int64(0), pk0)
            )[0]

        int(loop(pk))  # compile + warm
        t0 = time.perf_counter()
        int(loop(pk))
        per = (time.perf_counter() - t0) / NITER
        print(f"chunk_rank m={m}: {per * 1e6:.1f} us/step sustained",
              flush=True)

    # --- 1: expand old vs new at 1M build / 4M probe ------------------
    from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table
    from ccve_tpu.ops.sort_merge import build_sorted, sorted_expand

    n_build = 1_000_000
    keys, payloads = gen_rhs_table(n_build, 1)
    st = build_sorted(keys, payloads)
    probe = gen_probe_table(4_000_000, 1, n_build)
    pe = jax.device_put(jnp.asarray(probe[:, 0].astype(np.int32)))
    sync(pe)
    cap = 4_000_000
    olde = jax.jit(lambda p: sorted_expand(st, p, cap, use_kernel=False))
    newe = jax.jit(lambda p: sorted_expand(st, p, cap, use_kernel=True))
    r0 = sync(olde(pe))
    print("expand OLD compiled", flush=True)
    r1 = sync(newe(pe))
    print("expand NEW compiled", flush=True)
    assert int(r0[3]) == int(r1[3]), (int(r0[3]), int(r1[3]))
    timed("expand OLD 4M", olde, pe)
    timed("expand NEW 4M", newe, pe)

    # --- 2: 4-way executor branchy A/B --------------------------------
    from ccve_tpu.config import CompactionStrategy, EngineConfig, PayloadMode
    from ccve_tpu.exec.pipeline import JoinPipeline
    from ccve_tpu.ops.hash_table import build_csr

    lhs, rhs, blockc = 1_000_000, 50_000, 2048
    probe4 = gen_probe_table(lhs, 4, 2 * rhs)
    k4, p4 = gen_rhs_table(rhs, 1)
    t4 = [build_csr(k4, p4) for _ in range(4)]
    for branchy in (False, True):
        cfg = EngineConfig(
            block_size=blockc, n_joins=4, lhs_size=lhs, rhs_size=rhs,
            strategy=CompactionStrategy.FULL,
            payload_mode=PayloadMode.REFERENCE, branchy_descend=branchy,
        )
        pipe = JoinPipeline(t4, cfg)
        pipe.run(probe4)
        r = pipe.run(probe4)
        print(
            f"exec 4-way FULL branchy={branchy}: {r['seconds']:.3f}s "
            f"count={r['count']}", flush=True,
        )

    # --- 3: configs 2 and 3 (incl. the sorted executor rows) ----------
    from ccve_tpu.bench.configs import (
        config2_filtered_join,
        config3_four_way,
    )

    t0 = time.perf_counter()
    r2 = config2_filtered_join()
    print(f"config2: {r2}  (wall {time.perf_counter() - t0:.0f}s)",
          flush=True)
    t0 = time.perf_counter()
    r3 = config3_four_way()
    print(f"config3: {r3}  (wall {time.perf_counter() - t0:.0f}s)",
          flush=True)


if __name__ == "__main__":
    main()
