"""Distributed cost model (bench/dist_model.py): structural invariants
of the flat / hier / bcast plans. Link constants are nominal; what the
model GUARANTEES is the byte accounting and the plan ordering it
implies — tested here so a regression in the pricing shows up in CI."""

from ccve_tpu.bench.dist_model import (
    bcast_cost,
    flat_shuffle_cost,
    hier_shuffle_cost,
    predict,
    report_dist,
)


def test_bcast_amortization_beats_per_key_shuffles_cross_dcn():
    """At the headline geometry, the amortized broadcast plan must
    dominate both per-key shuffles across DCN — the round-5 design
    claim (VERDICT r4 #3)."""
    for topo in ((2, 8), (4, 8)):
        flat = predict(1_000_000, 16_000_000, topologies=(topo,),
                       shuffle="flat")[0]
        hier = predict(1_000_000, 16_000_000, topologies=(topo,),
                       shuffle="hier")[0]
        bc = predict(1_000_000, 16_000_000, topologies=(topo,),
                     shuffle="bcast", n_batches=8)[0]
        assert bc.efficiency > hier.efficiency > 0
        assert bc.efficiency > flat.efficiency
    # the (2,8) bcast prediction clears the north-star bar
    assert predict(
        1_000_000, 16_000_000, topologies=((2, 8),),
        shuffle="bcast", n_batches=8,
    )[0].efficiency >= 0.80


def test_bcast_cost_is_one_time_and_scales_with_build():
    a = bcast_cost(1_000_000, 2, 8)
    b = bcast_cost(2_000_000, 2, 8)
    assert b.bytes_dcn == 2 * a.bytes_dcn
    single_host = bcast_cost(1_000_000, 1, 8)
    assert single_host.bytes_dcn == 0 and single_host.t_dcn == 0.0
    # amortization: more batches -> strictly less comm per batch
    e1 = predict(1_000_000, 16_000_000, topologies=((4, 8),),
                 shuffle="bcast", n_batches=1)[0]
    e8 = predict(1_000_000, 16_000_000, topologies=((4, 8),),
                 shuffle="bcast", n_batches=8)[0]
    assert e8.t_comm < e1.t_comm
    assert e8.efficiency > e1.efficiency


def test_per_level_shuffles_recur_per_batch():
    """The per-key shuffles' cost is PER LEVEL and does not amortize:
    doubling levels doubles comm; byte counts stay positive."""
    for fn in (flat_shuffle_cost, hier_shuffle_cost):
        c = fn(16_000_000, 2, 8)
        assert c.bytes_dcn > 0 and c.t_dcn > 0
    one = predict(1_000_000, 16_000_000, n_levels=1,
                  topologies=((2, 8),), shuffle="hier")[0]
    two = predict(1_000_000, 16_000_000, n_levels=2,
                  topologies=((2, 8),), shuffle="hier")[0]
    assert abs(two.t_comm - 2 * one.t_comm) / two.t_comm < 1e-6


def test_report_renders_all_plans():
    r = report_dist()
    for token in ("flat", "hier", "bcast", "eff"):
        assert token in r
