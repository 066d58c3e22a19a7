"""Salting utilities: salted aggregate/join must be result-identical
to their unsalted forms while spreading hot keys across reducers."""

from __future__ import annotations

from pyspark.sql import functions as F

from mvrs_dspa_spark.operators import skew
from mvrs_dspa_spark.tables import table


def test_salt_is_deterministic_and_bounded(spark, sf_small):
    ev = table(spark, sf_small, "events").limit(500)
    a = {r.event_id: r._salt for r in skew.with_salt(ev, "event_id", 8).collect()}
    b = {r.event_id: r._salt for r in skew.with_salt(ev, "event_id", 8).collect()}
    assert a == b
    assert set(a.values()) <= set(range(8))
    assert len(set(a.values())) > 1  # actually spreads


def test_salted_aggregate_matches_plain(spark, sf_small):
    ev = table(spark, sf_small, "events")
    salted = {
        r.event_type: (r.n_rows, round(r.sum_value, 6))
        for r in skew.salted_aggregate(
            ev, ["event_type"], "event_id", ["value"]
        ).collect()
    }
    plain = {
        r.event_type: (r.n, round(r.s, 6))
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark, sf_small):
    ev = table(spark, sf_small, "events").select("event_id", "user_id", "value")
    users = (
        table(spark, sf_small, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("user_n"))
    )
    plain = ev.join(users, "user_id").select("event_id", "user_n")
    salted = skew.salted_join(ev, users, on="user_id", salt_on="event_id").select(
        "event_id", "user_n"
    )
    p = {r.event_id: r.user_n for r in plain.collect()}
    s = {r.event_id: r.user_n for r in salted.collect()}
    assert p == s


def test_salted_join_spreads_partitions(spark, sf_small):
    # every (key, salt) bucket present on the replicated small side
    users = spark.createDataFrame([(1,), (2,)], "user_id long")
    rep = skew.replicate_small_for_salted_join(users, 4)
    rows = {(r.user_id, r._salt) for r in rep.collect()}
    assert rows == {(u, s) for u in (1, 2) for s in range(4)}


def test_salted_join_rejects_outer_joins(spark, sf_small):
    import pytest

    ev = table(spark, sf_small, "events").select("event_id", "user_id")
    users = ev.select("user_id").distinct()
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            skew.salted_join(ev, users, "user_id", "event_id", how=how)
