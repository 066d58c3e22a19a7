"""Interleaved A/B: salted join vs plain shuffle join on a hot key
(VERDICT r3 'Next round' #7, SURVEY §7 item 12 carry-over).

The 100 TB failure mode in miniature: one key owns ~75% of a multi-
million-row fact side, the dim side is too big to broadcast, so the
plain shuffle join puts three quarters of the work on ONE reducer.
The salted join must (a) return identical results and (b) beat the
plain join wall-clock on the hot slice. AQE's skew-join split is
exercised as the engine-native remedy on the same data: with the
skew thresholds scaled to the test volume it must split the hot
partition (observable in the final plan).

Timing methodology: interleaved runs (plain, salted, plain, salted)
with min-of-N per variant, so host-load drift hits both variants
equally — the same protocol bench.py uses.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from mvrs_dspa_spark.operators import skew

N_BIG = 3_000_000
HOT_FRACTION = 0.75
N_KEYS = 1_000
N_SMALL = 30_000  # distinct dim keys; replicated 16x when salted


def _hot_big(spark):
    """~75% of rows on key 0, the rest uniform over N_KEYS keys."""
    n_hot = int(N_BIG * HOT_FRACTION)
    return spark.range(N_BIG).select(
        F.when(F.col("id") < n_hot, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
        .alias("k"),
        F.col("id").alias("row_id"),
        (F.col("id") % 1_000).cast("double").alias("v"),
    )


def _dim(spark):
    return spark.range(N_SMALL).select(
        F.pmod(F.col("id"), F.lit(N_KEYS)).alias("k"),
        F.col("id").alias("dim_id"),
        (F.col("id") % 7).cast("double").alias("w"),
    )


def _consume(df):
    """Force full join materialization through a cheap global agg."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("v") + F.col("w")), 2).alias("s"),
    ).collect()[0]
    return row.n, row.s


@pytest.fixture()
def no_broadcast(spark):
    """The salted-join regime: dim too big to broadcast. Also pin AQE
    skew split OFF so the plain variant shows the raw hot reducer."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
        )
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    yield spark
    for k, v in saved.items():
        spark.conf.set(k, v)


def test_salted_join_beats_plain_on_hot_key_and_matches(no_broadcast):
    spark = no_broadcast
    big = _hot_big(spark)
    dim = _dim(spark)

    def plain():
        return _consume(big.join(dim, "k"))

    def salted():
        return _consume(
            skew.salted_join(big, dim, on="k", salt_on="row_id", n=16)
        )

    # warm both paths once (JIT, shuffle file reuse, codegen cache)
    r_plain = plain()
    r_salted = salted()
    assert r_plain == r_salted, "salted join changed the result"

    times = {"plain": [], "salted": []}
    for _ in range(2):  # interleaved: plain, salted, plain, salted
        t0 = time.perf_counter(); plain(); times["plain"].append(time.perf_counter() - t0)
        t0 = time.perf_counter(); salted(); times["salted"].append(time.perf_counter() - t0)

    t_plain, t_salted = min(times["plain"]), min(times["salted"])
    assert t_salted < t_plain, (
        f"salted join ({t_salted:.2f}s) did not beat the plain hot-key "
        f"shuffle join ({t_plain:.2f}s); times={times}"
    )


def test_aqe_skew_split_triggers_on_hot_partition(spark):
    """The engine-native remedy on the same data: with skew thresholds
    scaled to test volume, AQE must mark the sort-merge join as
    skew-handled (isSkew=true partitions in the final adaptive plan)."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.join.preferSortMergeJoin",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # default 256 MB threshold never fires at test scale; scale it
        # down the way advisoryPartitionSize scales on a small cluster
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "4MB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "2MB"
        )
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")

        joined = _hot_big(spark).join(_dim(spark), "k")
        # materialize THIS DataFrame's own query execution (a stacked
        # agg would be a different QE and never finalize this one's
        # adaptive plan), JVM-side so 90M join rows never cross to
        # Python
        qe = joined._jdf.queryExecution()
        qe.executedPlan().execute().count()
        plan = qe.executedPlan().toString()
        assert "skew=true" in plan and "skewed" in plan, (
            "AQE did not mark the hot partition as skew-split:\n"
            + plan[:2000]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
