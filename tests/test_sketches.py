"""Sketch-based approximations must track their exact twins: the
approximate path is only a valid scale substitute if its error is
bounded on real data."""

from __future__ import annotations

from pyspark.sql import functions as F

from mvrs_dspa_spark.plans.analytics import (
    event_value_percentiles,
    event_value_percentiles_approx,
)
from mvrs_dspa_spark.plans.tpch import event_user_counts, event_user_counts_approx


def test_approx_percentiles_track_exact(spark, sf_medium):
    exact = {r.event_type: r for r in event_value_percentiles(spark, sf_medium).collect()}
    approx = {
        r.event_type: r for r in event_value_percentiles_approx(spark, sf_medium).collect()
    }
    assert set(exact) == set(approx)
    for et, e in exact.items():
        a = approx[et]
        for col in ("p50", "p90", "p99"):
            ev, av = getattr(e, col), getattr(a, col)
            # accuracy=10k -> rank error ~1e-4; values are cents-granular
            # so allow a small absolute + relative band
            assert abs(av - ev) <= max(0.05 * abs(ev), 2.0), (et, col, ev, av)


def test_hll_distinct_tracks_exact(spark, sf_medium):
    exact = {r.event_type: r.n_users for r in event_user_counts(spark, sf_medium).collect()}
    approx = {
        r.event_type: r.n_users_approx
        for r in event_user_counts_approx(spark, sf_medium).collect()
    }
    assert set(exact) == set(approx)
    for et, n in exact.items():
        # default rsd 5%: allow 3 sigma
        assert abs(approx[et] - n) <= max(3, 0.15 * n), (et, n, approx[et])


def test_portable_hll_accuracy_and_register_bound(spark, sf_medium):
    from mvrs_dspa_spark.functions import hashing as H
    from mvrs_dspa_spark.operators.sketches import (
        HLL_M,
        hll_registers,
        hll_user_counts,
    )
    from mvrs_dspa_spark.tables import table

    rows = hll_user_counts(spark, sf_medium).collect()
    assert len(rows) == 5
    for r in rows:
        # 512 registers -> ~4.6% standard error; allow 3 sigma
        assert abs(r.hll_estimate - r.n_exact) <= max(5, 0.15 * r.n_exact), r

    # register table is structurally bounded: <= m rows per group
    ev = table(spark, sf_medium, "events")
    regs = hll_registers(
        ev, H.str_code_col(F.col("user_id").cast("string")), "event_type"
    )
    per_group = regs.groupBy("event_type").count().collect()
    assert all(r["count"] <= HLL_M for r in per_group)


def test_portable_hll_registers_merge_by_max(spark, sf_small):
    """HLL mergeability (what makes it shuffle/stream-safe): registers
    of two disjoint halves combined with MAX must equal the registers
    of the union."""
    from mvrs_dspa_spark.functions import hashing as H
    from mvrs_dspa_spark.operators.sketches import hll_registers
    from mvrs_dspa_spark.tables import table

    ev = table(spark, sf_small, "events").select("user_id")
    code = H.str_code_col(F.col("user_id").cast("string"))
    full = {
        (r.bucket): r.m_j for r in hll_registers(ev, code).collect()
    }
    h1 = hll_registers(ev.where(F.col("user_id") % 2 == 0), code).collect()
    h2 = hll_registers(ev.where(F.col("user_id") % 2 == 1), code).collect()
    merged: dict = {}
    for r in [*h1, *h2]:
        merged[r.bucket] = max(merged.get(r.bucket, 0), r.m_j)
    assert merged == full


def test_join_size_estimate_tracks_exact(spark, sf_medium):
    from mvrs_dspa_spark.operators.sketches import join_size_estimate

    rows = join_size_estimate(spark, sf_medium).collect()
    assert len(rows) == 3
    for r in rows:
        # unbiased count-sketch, D=5/W=1024: generous 25% band
        assert abs(r.rel_error) <= 0.25, r
        assert r.sketch_estimate >= 0
