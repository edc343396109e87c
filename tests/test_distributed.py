"""Distributed hash-partitioned join on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from ccve_tpu.config import PayloadMode
from ccve_tpu.core.datagen import gen_probe_table, gen_rhs_table
from ccve_tpu.exec.oracle import OracleBuildTable, oracle_pipeline
from ccve_tpu.parallel.distributed import (
    dist_bulk_count,
    make_join_mesh,
    partition_tables,
)


@pytest.mark.parametrize("kind", ["lp", "csr", "sorted"])
@pytest.mark.parametrize("n_devices", [2, 8])
def test_dist_count_matches_oracle(kind, n_devices):
    mesh = make_join_mesh(n_devices)
    n_joins, lhs, rhs = 2, 600, 64
    probe = gen_probe_table(lhs, n_joins, rhs)
    keys, payloads = gen_rhs_table(rhs, 2)
    ptables = [
        partition_tables(keys, payloads, n_devices, kind, mesh)
        for _ in range(n_joins)
    ]
    expected = oracle_pipeline(
        probe, [OracleBuildTable(keys, payloads)] * n_joins, PayloadMode.FULL
    )
    res = dist_bulk_count(mesh, ptables, probe, cap_slack=8.0)
    assert not bool(res.overflow)
    assert int(res.count) == expected.shape[0]
    for l in range(n_joins):
        col = n_joins + 2 * l + 1
        assert int(res.payload_checksums[l]) == int(expected[:, col].sum())
    assert float(res.skew) >= 1.0


def test_dist_skew_detection():
    """All-identical probe keys land on one partition: skew ≈ P."""
    mesh = make_join_mesh(4)
    rhs = 32
    keys, payloads = gen_rhs_table(rhs, 1)
    probe = np.full((400, 1), keys[3], dtype=np.int64)
    ptables = [partition_tables(keys, payloads, 4, "lp", mesh)]
    res = dist_bulk_count(mesh, ptables, probe, cap_slack=16.0)
    assert not bool(res.overflow)
    assert int(res.count) == 400
    assert float(res.skew) > 3.0


def test_dist_overflow_flag():
    """cap too small for a skewed shuffle must raise the overflow flag."""
    mesh = make_join_mesh(4)
    keys, payloads = gen_rhs_table(32, 1)
    probe = np.full((512, 1), keys[0], dtype=np.int64)
    ptables = [partition_tables(keys, payloads, 4, "lp", mesh)]
    res = dist_bulk_count(mesh, ptables, probe, cap_slack=0.1)
    assert bool(res.overflow)


def test_dist_ring_matches_oracle():
    from ccve_tpu.parallel.distributed import (
        dist_bulk_count_ring,
        partition_tables_block,
    )

    mesh = make_join_mesh(4)
    n_joins, lhs, rhs = 2, 500, 64
    probe = gen_probe_table(lhs, n_joins, rhs)
    keys, payloads = gen_rhs_table(rhs, 2)
    ptables = [
        partition_tables_block(keys, payloads, 4, kind, mesh)
        for kind in ("lp", "csr")
    ]
    expected = oracle_pipeline(
        probe, [OracleBuildTable(keys, payloads)] * n_joins, PayloadMode.FULL
    )
    res = dist_bulk_count_ring(mesh, ptables, probe)
    assert int(res.count) == expected.shape[0]
    for l in range(n_joins):
        col = n_joins + 2 * l + 1
        assert int(res.payload_checksums[l]) == int(expected[:, col].sum())
