"""Utilities: profiling, roofline accounting (reference L0 profiler suite)."""

from ccve_tpu.utils.profiler import (
    BeeProfiler,
    PhaseProfiler,
    Timer,
    ZebraProfiler,
)

__all__ = ["BeeProfiler", "ZebraProfiler", "PhaseProfiler", "Timer"]
