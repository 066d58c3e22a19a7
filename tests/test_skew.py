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


def test_salted_aggregate_spreads_hot_key_across_reducers(spark):
    """The 100 TB scenario in miniature: ONE key owns 100k rows. Plain
    groupBy lands them on one reducer; the salted phase-1 must spread
    them across many. Asserted on the actual phase-1 exchange: distinct
    shuffle partitions touched by the hot key's partial aggregates."""
    hot = spark.range(100_000).select(
        F.lit("hot").alias("k"), F.col("id").alias("event_id"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    salted_partials = (
        skew.with_salt(hot, "event_id", 16)
        .groupBy("k", "_salt")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
    )
    # AQE would coalesce the tiny 16-row output back to one partition,
    # hiding exactly the spread this test observes; turn it off here.
    old = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        parts = (
            salted_partials.withColumn("p", F.spark_partition_id())
            .select("p")
            .distinct()
            .count()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", old)
    assert parts > 1, "phase-1 partials all landed on one reducer"
    # and the two-phase result still matches the plain aggregation
    out = skew.salted_aggregate(hot, ["k"], "event_id", ["value"]).collect()
    assert len(out) == 1
    assert out[0].n_rows == 100_000
    assert abs(out[0].sum_value - sum(i % 97 for i in range(100_000))) < 1e-6
