"""Benchmark harnesses (reference L5: main.cpp + simd_micro_bench.cpp)."""
