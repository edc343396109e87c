from ccve_tpu.ops.hashing import murmurhash64, murmurhash64_np, murmurhash64_py

__all__ = ["murmurhash64", "murmurhash64_np", "murmurhash64_py"]
