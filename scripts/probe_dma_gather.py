"""Per-DMA random line-fetch cost on the v5e — the decision input for
the SURVEY §7.3 fused hash-probe kernel (VERDICT r3 "next #2").

The fused LP/CSR probe kernel's premise is replacing XLA's per-element
gather loop (~25 ns/elem measured) with software-pipelined async DMAs:
each probe key fetches one [line_rows, 128]-i32 line from the
HBM-resident table at its hashed slot, W fetches in flight. This probe
measures the STEADY-STATE cost per fetch as a function of pipeline
depth W and line size, via a fori_loop of start/wait pairs over a ring
of VMEM line buffers with a scalar accumulator preventing DCE.

If the floor lands well under ~25 ns/line, the fused kernel wins and
gets built; if it lands above, the recorded number IS the negative
result (the per-DMA issue/complete cost is the hardware floor for
per-key random access, and the sort-merge engine remains the probe
path). Either way the number goes to PERF_NOTES.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 4000 \
       python -u scripts/probe_dma_gather.py
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), flush=True)

TABLE_ROWS = 1 << 17  # 128K rows x 128 i32 = 16M slots = 64 MB HBM


@functools.partial(
    jax.jit, static_argnames=("depth", "line_rows", "fetches_per_step")
)
def dma_bench(table, rows_idx, depth: int, line_rows: int,
              fetches_per_step: int):
    """Returns int32[1,1] accumulator after issuing len(rows_idx) DMAs
    of [line_rows, 128] lines with `depth` in flight."""
    n = rows_idx.shape[0]
    T = fetches_per_step
    assert n % T == 0 and depth & (depth - 1) == 0

    def kernel(idx_ref, hbm, out_ref, ring, acc_s, sems):
        t = pl.program_id(0)
        base = t * T

        @pl.when(t == 0)
        def _():
            acc_s[0] = 0

        def dma(j, slot):
            r = idx_ref[base + j]
            return pltpu.make_async_copy(
                hbm.at[pl.ds(r, line_rows)], ring.at[slot], sems.at[slot]
            )

        for j in range(depth):
            dma(j, j).start()

        # UNROLL keys per fori iteration: the round-4 measurement showed
        # the serial loop BODY (~230 ns/iter at unroll 1) is the floor,
        # not DMA bandwidth — unrolling amortizes loop/branch overhead
        U = min(8, depth)

        def body(jj, acc):
            j0 = jj * U
            for u in range(U):
                j = j0 + u
                slot_p = (j + depth) & (depth - 1)  # == j's slot
                dma(j, slot_p).wait()
                acc = acc + ring[slot_p, 0, 0]

                @pl.when(j + depth < T)
                def _():
                    dma(j + depth, slot_p).start()

            return acc

        acc = jax.lax.fori_loop(0, T // U, body, jnp.int32(0))
        acc_s[0] = acc_s[0] + acc

        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            out_ref[0, 0] = acc_s[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((depth, line_rows, 128), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                has_side_effects=True,
            ),
        )(rows_idx, table)


def timed(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.device_get(out))  # honest sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.device_get(out))
        best = min(best, time.perf_counter() - t0)
    return best


rng = np.random.default_rng(0)
table = jnp.asarray(
    rng.integers(0, 2**31 - 1, (TABLE_ROWS, 128), dtype=np.int32)
)

N = 1 << 17  # fetches per dispatch (prefetch rides SMEM: <=512 KB)
results = {}
for line_rows in (1, 2):
    idx = jnp.asarray(
        rng.integers(0, TABLE_ROWS - line_rows, N, dtype=np.int32)
    )
    for depth in (1, 4, 8, 16):
        t = timed(dma_bench, table, idx, depth, line_rows, 4096)
        ns = t / N * 1e9
        results[f"line{line_rows * 128}_depth{depth}"] = round(ns, 2)
        print(
            f"line_rows={line_rows} depth={depth}: {t * 1e3:.2f} ms "
            f"= {ns:.1f} ns/fetch",
            flush=True,
        )
print(json.dumps(results), flush=True)
