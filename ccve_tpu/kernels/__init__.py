"""Pallas TPU kernels for the hot ops (reference L0/L3 SIMD paths)."""
