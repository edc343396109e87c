"""Multi-chip tier: hash-partitioned joins over a jax.sharding.Mesh.

No reference counterpart (the C++ codebase is single-thread, SURVEY.md §2);
this is the scaling axis BASELINE.json's north star mandates.
"""

from ccve_tpu.parallel.distributed import (
    PartitionedTables,
    dist_bulk_count,
    make_join_mesh,
    partition_tables,
)

__all__ = [
    "PartitionedTables",
    "dist_bulk_count",
    "make_join_mesh",
    "partition_tables",
]
