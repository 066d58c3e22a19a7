"""Streaming DAU/WAU maintenance (29ac; the continuous form of
`plans/analytics2.dau_wau_stickiness`, #128).

The engagement ratio needs exactly one piece of state: the distinct
(user, active-day) pair set — bounded by users x days, NOT event
volume, so a year of state for a million users is ~365M small rows
(a dimension table, not a log). Per micro-batch the batch's pairs
are set-merged in (union + distinct on the affected frame), and the
stickiness table is served on demand by the SAME offset-explode
rollup the batch query uses. Batch==stream equality is pinned, as is
idempotence: replaying a batch that adds no new pairs must not
change the state (the set-merge absorbs duplicates, which is what
makes at-least-once delivery safe for this metric).

Same compaction + GDPR-erasure hygiene as the other maintainers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mvrs_dspa_spark.streaming.scd2_stream import (
    COMPACT_PARTITION_CAP,
    COMPACT_TO,
)

_DAY_US = 86_400_000_000

PAIRS_SCHEMA = "user_id long, day long"


class EngagementMaintainer:
    """Accumulates the distinct (user, day) activity set across
    micro-batches; `stickiness()` serves the DAU/WAU table."""

    def __init__(
        self,
        spark,
        compact_cap: int = COMPACT_PARTITION_CAP,
        compact_to: int = COMPACT_TO,
    ) -> None:
        self.spark = spark
        self.pairs: DataFrame = spark.createDataFrame([], PAIRS_SCHEMA)
        self.n_batches = 0
        self.compact_cap = compact_cap
        self.compact_to = compact_to

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        delta = batch_df.select(
            "user_id",
            F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day"),
        ).distinct()
        merged = self.pairs.unionByName(delta).distinct()
        if merged.rdd.getNumPartitions() > self.compact_cap:
            merged = merged.repartition(self.compact_to, "user_id")
        self.pairs = merged.localCheckpoint(eager=True)
        self.n_batches += 1

    def erase_users(self, user_ids) -> None:
        """GDPR erasure (see `scd2_stream.Scd2Maintainer.erase_users`):
        the subject's activity days vanish from every future serving."""
        ids = list(user_ids)
        self.pairs = self.pairs.where(
            # NULL-safe: ~isin() is NULL for a NULL key, which would
            # silently erase all null-keyed state too (ADVICE r6)
            ~F.col("user_id").isin(ids) | F.col("user_id").isNull()
        ).localCheckpoint(eager=True)

    def stickiness(self) -> DataFrame:
        """The DAU/WAU table in the batch operator's shape, served
        from the maintained pair set (same offset-explode rollup)."""
        cover = self.pairs.select(
            "user_id",
            "day",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        ).select("user_id", (F.col("day") + F.col("off")).alias("day"))
        wau = cover.groupBy("day").agg(
            F.countDistinct("user_id").alias("wau")
        )
        dau = self.pairs.groupBy("day").agg(
            F.count(F.lit(1)).alias("dau")
        )
        return (
            dau.join(wau, "day")
            .select(
                "day",
                "dau",
                "wau",
                F.round(
                    F.col("dau") / F.col("wau").cast("double"), 6
                ).alias("stickiness"),
            )
            .orderBy("day")
        )


def run_engagement_stream(
    source: DataFrame, checkpoint: str
) -> EngagementMaintainer:
    """Drive a bounded event stream to completion; returns the
    maintainer holding the distinct activity set."""
    maintainer = EngagementMaintainer(source.sparkSession)
    q = (
        source.writeStream.foreachBatch(maintainer.update)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("engagement stream did not finish within 300s")
    return maintainer
