"""Sketch-based approximations must track their exact twins: the
approximate path is only a valid scale substitute if its error is
bounded on real data."""

from __future__ import annotations

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
