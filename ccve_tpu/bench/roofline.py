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


if __name__ == "__main__":
    print(report())
