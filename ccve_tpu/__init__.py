"""ccve_tpu — a TPU-native vectorized query-execution engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C++/AVX-512 codebase `Chunk-Compaction-in-Vectorized-Execution-SIMD`
(see /root/reference and SURVEY.md): vectorized hash joins over linear-probing
and chaining hash tables, chunk compaction of under-filled selection vectors
(full / binary / dynamic bandit-tuned strategies), an N-way join pipeline
executor, plus the north-star extensions (filter, hash aggregate, radix sort,
and a distributed multi-chip tier over a `jax.sharding.Mesh`).

The engine operates on int64 columns and requires 64-bit mode; importing this
package enables `jax_enable_x64`.
"""

import os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: compiles over the TPU tunnel take 20-60s+;
# caching them on disk amortizes across processes/runs. Opt out with
# CCVE_NO_COMPILE_CACHE=1.
if not os.environ.get("CCVE_NO_COMPILE_CACHE"):
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "CCVE_COMPILE_CACHE_DIR", "/tmp/ccve_jax_cache"
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these options
        pass

from ccve_tpu.config import EngineConfig, CompactionStrategy  # noqa: E402

__all__ = ["EngineConfig", "CompactionStrategy"]
__version__ = "0.1.0"
