"""Streaming PSI drift monitor (§2e 29af; the continuous form of
`plans/analytics.value_drift_psi`, #10am).

PSI is the production drift monitor BETWEEN a reference window and
live traffic — inherently a streaming job: the reference
distribution is frozen at deploy time and every micro-batch shifts
the current distribution. The sufficient statistic is the
(event_type, period, bucket) count grid — decomposable counters
bounded at n_types x 2 x n_bins cells — so a micro-batch stream
maintains it incrementally: per batch, bucket the batch's values
through the SAME `psi_bucket_col` expression the batch query uses,
additively merge into the running grid, lineage-cut with
localCheckpoint. Serving runs the SAME `psi_from_counts` tail, so a
replayed log produces EXACTLY the registered batch query's PSI table
(batch==stream pytest pin). The split timestamp is configuration
(the reference-window boundary a deploy fixes); the batch query's
retrospective halfway split is one choice of it.

Mirrors the reference's per-key running-count jobs
(`jobs/activeposts/PostStatisticsFunction.scala:20-150`); follows the
SprtMonitor pattern (streaming/sprt_stream.py) and the shared-
definition rule from ADVICE r7: no inline twin of the bucketing or
the PSI algebra exists here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mvrs_dspa_spark.plans.analytics import psi_bucket_col, psi_from_counts

GRID_SCHEMA = "event_type string, period int, bucket long, c long"

COMPACT_PARTITION_CAP = 64
COMPACT_TO = 8


class PsiMonitor:
    """Accumulates the (type, period, bucket) count grid across
    micro-batches; `report()` serves the PSI table in the batch
    query's exact shape."""

    def __init__(
        self,
        spark,
        split_us: int,
        compact_cap: int = COMPACT_PARTITION_CAP,
        compact_to: int = COMPACT_TO,
    ) -> None:
        self.spark = spark
        self.split_us = int(split_us)
        self.grid: DataFrame = spark.createDataFrame([], GRID_SCHEMA)
        self.n_batches = 0
        self.compact_cap = compact_cap
        self.compact_to = compact_to

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        delta = (
            batch_df.select(
                "event_type",
                F.when(F.unix_micros("ts") < F.lit(self.split_us), 0)
                .otherwise(1)
                .cast("int")
                .alias("period"),
                psi_bucket_col().alias("bucket"),
            )
            .groupBy("event_type", "period", "bucket")
            .agg(F.count(F.lit(1)).alias("d_c"))
        )
        merged = self.grid.join(
            delta, ["event_type", "period", "bucket"], "full_outer"
        ).select(
            "event_type",
            "period",
            "bucket",
            (
                F.coalesce("c", F.lit(0)) + F.coalesce("d_c", F.lit(0))
            ).alias("c"),
        )
        if merged.rdd.getNumPartitions() > self.compact_cap:
            merged = merged.repartition(
                self.compact_to, "event_type", "bucket"
            )
        self.grid = merged.localCheckpoint(eager=True)
        self.n_batches += 1

    def report(self) -> DataFrame:
        """PSI per event type through the SAME serving tail the batch
        query uses, from the maintained bounded grid."""
        return psi_from_counts(self.grid)

    def erase_users(self, user_ids) -> None:
        """GDPR hook parity with the other stateful maintainers (see
        `scd2_stream.Scd2Maintainer.erase_users`): the grid keys on
        (type, period, bucket) only — no per-user state exists, so
        erasure is a no-op by construction (documented, not silently
        absent; the counts are aggregates the subject's rows already
        dissolved into, the same posture as dp_event_counts)."""
        return None

    def save(self, path: str) -> None:
        """Persist the grid for driver-restart durability (the
        in-memory localCheckpoint state dies with the driver; pair
        with the stream's checkpointLocation so a restarted query
        resumes from the next unprocessed batch AND the reloaded
        grid — restart==uninterrupted pytest-pinned)."""
        self.grid.write.mode("overwrite").parquet(path)

    @classmethod
    def load(cls, spark, split_us: int, path: str, **kw) -> "PsiMonitor":
        mon = cls(spark, split_us, **kw)
        mon.grid = (
            spark.read.parquet(path)
            .select("event_type", "period", "bucket", "c")
            .localCheckpoint(eager=True)
        )
        return mon


def run_psi_stream(
    source: DataFrame, checkpoint: str, split_us: int
) -> PsiMonitor:
    """Drive a bounded event stream to completion; returns the monitor
    holding the final count grid."""
    monitor = PsiMonitor(source.sparkSession, split_us)
    q = (
        source.writeStream.foreachBatch(monitor.update)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("psi stream did not finish within 300s")
    return monitor
