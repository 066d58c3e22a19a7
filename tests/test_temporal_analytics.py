"""Semantic pins for the temporal-analytics additions (SURVEY §2
#118-120): point-in-time state join, Kaplan-Meier conversion,
l-diversity audit. Cross-engine value equality is covered by the
auto-parametrized oracle-parity sweep; these tests pin the semantics
an oracle twin can't distinguish from a shared mistake."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mvrs_dspa_spark.plans.analytics2 import kaplan_meier_conversion
from mvrs_dspa_spark.plans.analytics2 import point_in_time_state_join
from mvrs_dspa_spark.operators.validation import (
    L_DIV,
    l_diversity_report,
)
from mvrs_dspa_spark.tables import table


def test_point_in_time_join_is_lossless_and_unique(spark, sf_small):
    """The interval predicate must match EXACTLY one state version per
    event (a second match would inflate the left join); events at a
    user's first timestamp have no prior version and land in 'none'."""
    out = point_in_time_state_join(spark, sf_small).collect()
    ev = table(spark, sf_small, "events")
    n_events = ev.count()
    assert sum(r.n_events for r in out) == n_events

    first_ts = ev.groupBy("user_id").agg(F.min("ts").alias("t0"))
    n_first = (
        ev.join(first_ts, "user_id").where(F.col("ts") == F.col("t0")).count()
    )
    assert sum(r.n_events for r in out if r.prior_state == "none") == n_first
    # transition context is the PRIOR interval: an event opening a new
    # state must never report its own state (only a same-type repeat may)
    assert all(r.n_events > 0 for r in out)


def _write_events(spark, rows, out_dir):
    base = dt.datetime(2024, 1, 1)
    data = [
        (
            i,
            base + dt.timedelta(hours=int(h * 24)),
            uid,
            etype,
            10.0,
            "{}",
        )
        for i, (uid, h, etype) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")


def test_kaplan_meier_known_case(spark, tmp_path):
    """Hand-checkable product-limit estimate: 4 users, conversions at
    day 0 (1 user) and day 1 (2 users), 1 user censored at day 3.
    S(0) = 3/4; S(1) = 3/4 * (1 - 2/3) = 1/4; censor-only day 3 emits
    no row but holds the user in the risk sets before it."""
    rows = [
        (1, 0.0, "signup"), (1, 0.2, "purchase"),
        (2, 0.0, "signup"), (2, 1.5, "purchase"),
        (3, 0.0, "signup"), (3, 1.0, "purchase"),
        (4, 0.0, "signup"), (4, 3.0, "view"),
    ]
    _write_events(spark, rows, str(tmp_path))
    got = [
        (r.day, r.n_at_risk, r.n_converted, r.survival)
        for r in kaplan_meier_conversion(spark, str(tmp_path)).collect()
    ]
    assert got == [(0, 4, 1, 0.75), (1, 3, 2, 0.25)]


def test_kaplan_meier_monotone_on_sf(spark, sf_small):
    out = kaplan_meier_conversion(spark, sf_small).collect()
    assert len(out) > 0
    days = [r.day for r in out]
    assert days == sorted(days)
    surv = [r.survival for r in out]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b for a, b in zip(surv, surv[1:])), "survival must fall"
    risks = [r.n_at_risk for r in out]
    assert all(a >= b for a, b in zip(risks, risks[1:])), "risk set shrinks"
    ev = table(spark, sf_small, "events")
    n_users = ev.select("user_id").distinct().count()
    assert risks[0] <= n_users
    n_converters = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r.n_converted for r in out) == n_converters


def test_l_diversity_bounds(spark, sf_small):
    out = l_diversity_report(spark, sf_small).collect()
    assert len(out) > 0
    for r in out:
        assert r.l_distinct < L_DIV
        assert r.l_distinct <= r.group_size
        # entropy-l is exp(H): 1 for a single-user group, at most the
        # distinct count (uniform case), within rounding slack
        assert 1.0 - 1e-9 <= r.entropy_l <= r.l_distinct + 1e-3
        if r.l_distinct == 1:
            assert r.entropy_l == 1.0
