"""Per-operator roofline accounting for the count-side join (the
BASELINE.json north-star asks for "per-operator roofline accounting
(HBM-bound gather for probe, compute-bound hash) at speed-of-light per
chip").

On a TPU the probe is NOT an HBM-bound gather — the VPU has no random
access gather unit, so the engine's probe is the hybrid sort
(kernels/bigsort.py) and its speed-of-light is set by compare-exchange
ALU throughput, not bandwidth. This module makes that audit explicit:
for each operator of the headline pipeline it reports

  bytes_hbm   — HBM bytes moved (reads + writes)
  t_hbm       — bytes / BW_HBM                (bandwidth bound)
  t_alu       — CE stage-passes x stage cost  (compare-exchange bound)
  bound       — which limit binds (max of the two)

and the pipeline totals, so "x% of roofline" is a statement about the
binding resource per operator. The two constants are MEASURED on the
v5e behind this container (PERF_NOTES.md):

  BW_HBM      = 819e9 B/s      (v5e HBM peak)
  STAGE_COST  = 4.35e-12 s     per element per CE stage-pass — from the
                converged 0.073 ms / full-array stage at 16.78M i32
                (PERF_NOTES.md "Sort wall — CONVERGED"; both the fused
                in-tile Batcher and the bitonic merge levels sit on it)

INDEPENDENT ANCHORS (cli roofline --anchor, measured on chip
2026-08-19, see `measure_anchors`): a non-engine Pallas kernel's
K-slope gives 4.78 ps/elem/stage = 1.10x the constant, and XLA's own
batched sort pays 7.92 ps = 1.82x — the model is not self-referentially
generous; the engine's kernels are faster per stage than the compiler's
own sort.

Run `python -m ccve_tpu.cli roofline [--n-build N --n-probe N]`, or
pass `measured_s` (e.g. bench.py's sustained ms/batch) to get the
percent-of-speed-of-light figure.
"""

from __future__ import annotations

from dataclasses import dataclass

BW_HBM = 819e9  # B/s, v5e peak
STAGE_COST = 4.35e-12  # s per element per compare-exchange stage-pass
TILE_LOG = 17  # kernels/bigsort.TILE_LOG
I32 = 4


@dataclass
class OpModel:
    name: str
    bytes_hbm: int
    stage_passes: float  # CE stage-passes x elements (ALU work)

    @property
    def t_hbm(self) -> float:
        return self.bytes_hbm / BW_HBM

    @property
    def t_alu(self) -> float:
        return self.stage_passes * STAGE_COST

    @property
    def t_sol(self) -> float:
        return max(self.t_hbm, self.t_alu)

    @property
    def bound(self) -> str:
        return "ALU" if self.t_alu >= self.t_hbm else "HBM"


MC_TILE_LOG = 15  # kernels/merge_scan._MC_TILE_LOG (fused kernel tile)


def count_side_model(n_build: int, n_probe: int) -> list[OpModel]:
    """Operator list for `sorted_match_totals`'s pack32 path: i32 pack →
    fused in-tile Batcher presort → bitonic merge-path levels, STOPPED
    EARLY (counts are additive over probe sub-runs, so the ladder stops
    at ~0.8·n/m runs — ops/sort_merge._count_side_bc) → per-run fused
    merge+counts scans against the build stream → payload dot. The
    model mirrors the engine's own skip heuristic so the speed-of-light
    prices the algorithm actually run."""
    tile = 1 << TILE_LOG
    n_pad = n_probe + (-n_probe) % tile
    nt = n_pad // tile
    n_levels_full = max(nt - 1, 0).bit_length()
    m = n_build
    # the engine's early-stop heuristic (ops/sort_merge._count_side_bc)
    import math

    target_runs = max(1.0, 0.8 * n_pad / max(m, 1))
    skip = min(n_levels_full, max(0, int(math.log2(target_runs))))
    n_levels = n_levels_full - skip
    run = tile << n_levels
    n_runs = -(-n_pad // run)
    scanned = n_pad + n_runs * m  # fused kernel elements over all runs

    ops = [
        OpModel(
            "pack_i32 (probe keys -> key'<<1|tag)",
            bytes_hbm=2 * I32 * n_probe,
            stage_passes=0,
        ),
        OpModel(
            f"presort in-VMEM Batcher ({sum(range(1, TILE_LOG + 1))} stages)",
            bytes_hbm=2 * I32 * n_pad,
            stage_passes=sum(range(1, TILE_LOG + 1)) * n_pad,
        ),
        OpModel(
            f"bitonic merge-path x{n_levels} levels ({TILE_LOG} stages"
            f" each; {skip} levels skipped -> {n_runs} runs)",
            bytes_hbm=2 * I32 * n_pad * n_levels,
            stage_passes=TILE_LOG * n_pad * n_levels,
        ),
        OpModel(
            f"fused merge+counts x{n_runs} runs (merge_counts_fused: "
            f"{MC_TILE_LOG} halver + ~30 scan passes)",
            bytes_hbm=I32 * (scanned + n_runs * m) + I32 * m * n_runs,
            stage_passes=(MC_TILE_LOG + 30) * scanned,
        ),
        OpModel(
            "payload dot (bc . payloads)",
            bytes_hbm=(I32 + 8) * m,
            stage_passes=0,
        ),
    ]
    return ops


def report(
    n_build: int = 1_000_000,
    n_probe: int = 16_000_000,
    measured_s: float | None = None,
) -> str:
    ops = count_side_model(n_build, n_probe)
    lines = [
        f"count-side join roofline @ {n_build / 1e6:.1f}M build / "
        f"{n_probe / 1e6:.1f}M probe "
        f"(BW {BW_HBM / 1e9:.0f} GB/s, stage {STAGE_COST * 1e12:.2f} ps/elem)",
        f"{'operator':52s} {'MB':>8s} {'t_hbm':>9s} {'t_alu':>9s} "
        f"{'t_sol':>9s} bound",
    ]
    tot_sol = tot_hbm = tot_alu = 0.0
    for op in ops:
        tot_sol += op.t_sol
        tot_hbm += op.t_hbm
        tot_alu += op.t_alu
        lines.append(
            f"{op.name:52s} {op.bytes_hbm / 1e6:8.1f} "
            f"{op.t_hbm * 1e3:7.3f}ms {op.t_alu * 1e3:7.3f}ms "
            f"{op.t_sol * 1e3:7.3f}ms {op.bound}"
        )
    lines.append(
        f"{'TOTAL (speed-of-light, serial ops)':52s} {'':8s} "
        f"{tot_hbm * 1e3:7.3f}ms {tot_alu * 1e3:7.3f}ms "
        f"{tot_sol * 1e3:7.3f}ms"
    )
    lines.append(
        f"pure-bandwidth fantasy (read probe once): "
        f"{I32 * n_probe / BW_HBM * 1e3:.3f} ms — unreachable without a "
        f"random-access gather unit; the TPU probe's speed-of-light is "
        f"the CE-ALU line above"
    )
    if measured_s is not None:
        lines.append(
            f"measured: {measured_s * 1e3:.3f} ms = "
            f"{tot_sol / measured_s * 100:.1f}% of model speed-of-light "
            f"({n_probe / measured_s / 1e6:.1f}M rows/s)"
        )
    return "\n".join(lines)


def measure_anchors(n: int = 1 << 24, niter: int = 16) -> str:
    """Independent cross-checks of STAGE_COST, so pct_of_sol is not
    graded by constants calibrated from the very kernels it grades:

      A. the K-SLOPE of a non-engine Pallas kernel running K unrolled
         CE stage passes per tile visit: (t(64) - t(16)) / 48 stages
         isolates the marginal ALU cost per stage with the HBM round
         trip and launch costs differenced away (a single isolated
         stage is HBM-bound at ~16 B/elem and reads 25x the constant —
         the first, wrong, version of this anchor);
      B. XLA's own batched sort of the same data as [n/8192, 8192] —
         its per-element per-Batcher-stage cost (8192-run network = 91
         stage-passes), i.e. what the COMPILER's sort pays per stage.

    Run on the chip (device fori_loop, accumulator-dependent bias, one
    scalar readback — PERF_NOTES measurement rules). A is the apples-
    to-apples check: if A >> STAGE_COST the model is too generous; if
    XLA's B is cheaper per stage than our kernels, the sort wall is
    software, not hardware."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ccve_tpu.kernels import flatvec as fv

    rng = np.random.default_rng(11)
    x0 = jnp.asarray(rng.integers(0, 2**30, n).astype(np.int32))

    R = 1024  # one [1024, 128] tile per grid step, like the engine
    rows = n // 128

    def make_ce_kernel(K: int):
        def ce_kernel(x_ref, o_ref):
            x = x_ref[:]
            flat = fv.flat_index(R)
            for s in range(K):
                k = 1 << (s % 3)  # cycle strides 1/2/4 like a network
                up = fv.shift_flat_left(x, k, R)
                dn = fv.shift_flat_right(x, k, R, 0)
                is_lo = (flat & k) == 0
                x = jnp.where(
                    is_lo, jnp.minimum(x, up), jnp.maximum(x, dn)
                )
            o_ref[:] = x

        return ce_kernel

    spec = pl.BlockSpec((R, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def stages(x2d, K: int):
        with jax.enable_x64(False):
            return pl.pallas_call(
                make_ce_kernel(K),
                grid=(rows // R,),
                in_specs=[spec],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
            )(x2d)

    def timed(fn, arg):
        out = fn(arg)
        np.asarray(jax.device_get(jnp.ravel(out)[:1]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(arg)
            np.asarray(jax.device_get(jnp.ravel(out)[:1]))
            best = min(best, time.perf_counter() - t0)
        return best

    import functools as _ft

    @_ft.partial(jax.jit, static_argnums=1)
    def stage_loop(x, K):
        def body(_, carry):
            acc, xx = carry
            y = stages(xx, K)
            return acc + y[0, 0].astype(jnp.int64), y

        return jax.lax.fori_loop(
            0, niter, body, (jnp.int64(0), x.reshape(rows, 128))
        )[0]

    t16 = timed(lambda x: stage_loop(x, 16), x0) / niter
    t64 = timed(lambda x: stage_loop(x, 64), x0) / niter
    a_cost = (t64 - t16) / 48 / n


    runs = n // 8192
    stages_8192 = sum(range(1, 14))  # Batcher network for 2^13 = 91

    @jax.jit
    def xla_sort_loop(x):
        def body(_, carry):
            acc, xx = carry
            s = jax.lax.sort(xx.reshape(runs, 8192), dimension=1)
            bias = jnp.where(acc < 0, jnp.int32(1), jnp.int32(0))
            return acc + s[0, 0].astype(jnp.int64), xx + bias

        return jax.lax.fori_loop(0, niter, body, (jnp.int64(0), x))[0]

    t_xla = timed(xla_sort_loop, x0) / niter
    b_cost = t_xla / (n * stages_8192)

    return (
        f"STAGE_COST anchors @ n={n / 1e6:.1f}M i32 "
        f"(model constant {STAGE_COST * 1e12:.2f} ps/elem/stage):\n"
        f" A. non-engine CE kernel K-slope (t64 {t64 * 1e3:.2f} / t16 "
        f"{t16 * 1e3:.2f} ms): {a_cost * 1e12:.2f} ps/elem/stage "
        f"= {a_cost / STAGE_COST:.2f}x model\n"
        f" B. XLA batched sort [{runs}, 8192]: {t_xla * 1e3:.2f} ms / "
        f"{stages_8192} Batcher stages -> {b_cost * 1e12:.2f} "
        f"ps/elem/stage = {b_cost / STAGE_COST:.2f}x model"
    )


if __name__ == "__main__":
    print(report())
