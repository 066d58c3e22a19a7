"""Streaming exact Wasserstein-1 drift monitor (§2e 29ah; the
continuous form of `plans/analytics4.value_wasserstein_drift`, #175).

Completes the continuous drift family — PSI (29af, binned,
saturates), and now the magnitude-aware W1 between a frozen reference
window and live traffic. The sufficient statistic is the
(event_type, cents, c1, c2) count grid: cents is the exact value
domain coded through the SHARED `w1_cents_col`, so the state is
value-DOMAIN-bounded (distinct cent values seen per type), not event-
volume-bounded — the right trade for a monetary column whose support
is a bounded price grid. Per micro-batch, events bucket into
(type, period, cents) deltas (period from a configured reference-
boundary timestamp, the PsiMonitor convention) and merge additively;
serving runs the SHARED `w1_from_cells` tail, so a replayed log
reproduces the registered batch query's W1 table EXACTLY
(batch==stream pytest pin — exactness survives because every count is
an integer and the serving math is the batch query's own
decimal(38,0) pipeline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mvrs_dspa_spark.plans.analytics4 import w1_cents_col, w1_from_cells

GRID_SCHEMA = "event_type string, cents long, c1 long, c2 long"

COMPACT_PARTITION_CAP = 64
COMPACT_TO = 8


class WassersteinMonitor:
    """Accumulates the (type, cents) reference/current count grid
    across micro-batches; `report()` serves the W1 table in the batch
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
        is_ref = F.unix_micros("ts") < F.lit(self.split_us)
        delta = (
            batch_df.select(
                "event_type",
                is_ref.alias("ref"),
                w1_cents_col().alias("cents"),
            )
            .groupBy("event_type", "cents")
            .agg(
                F.sum(F.when(F.col("ref"), 1).otherwise(0)).alias("d1"),
                F.sum(F.when(~F.col("ref"), 1).otherwise(0)).alias("d2"),
            )
        )
        merged = self.grid.join(
            delta, ["event_type", "cents"], "full_outer"
        ).select(
            "event_type",
            "cents",
            (F.coalesce("c1", F.lit(0)) + F.coalesce("d1", F.lit(0))).alias(
                "c1"
            ),
            (F.coalesce("c2", F.lit(0)) + F.coalesce("d2", F.lit(0))).alias(
                "c2"
            ),
        )
        if merged.rdd.getNumPartitions() > self.compact_cap:
            merged = merged.repartition(self.compact_to, "event_type")
        self.grid = merged.localCheckpoint(eager=True)
        self.n_batches += 1

    def report(self) -> DataFrame:
        """W1 per event type through the SAME serving tail the batch
        query uses, from the maintained value-domain-bounded grid."""
        return w1_from_cells(self.grid)

    def ks_report(self) -> DataFrame:
        """Exact two-sample KS per type from the SAME grid — one
        maintained state, two drift statistics (W1 = magnitude, KS =
        sup-distance). Serves through the shared `ks_from_cells`
        tail, so a replayed log reproduces the registered batch KS
        query (#10am-b) exactly (pytest-pinned)."""
        from mvrs_dspa_spark.plans.analytics4 import ks_from_cells

        return ks_from_cells(self.grid)

    def divergence_report(self) -> DataFrame:
        """JSD + Hellinger from the SAME grid through the shared
        `divergences_from_cells` tail (#202) — one maintained state,
        four drift statistics (W1, KS, JSD, Hellinger), all equal to
        their batch twins exactly (pytest-pinned)."""
        from mvrs_dspa_spark.plans.analytics4 import divergences_from_cells

        return divergences_from_cells(self.grid)

    def erase_users(self, user_ids) -> None:
        """GDPR hook parity (see `scd2_stream.Scd2Maintainer`): the
        grid keys on (type, cents) only — no per-user state, erasure
        is a documented no-op (the PsiMonitor posture)."""
        return None

    def save(self, path: str) -> None:
        """Persist the grid for driver-restart durability (see
        PsiMonitor.save)."""
        self.grid.write.mode("overwrite").parquet(path)

    @classmethod
    def load(
        cls, spark, split_us: int, path: str, **kw
    ) -> "WassersteinMonitor":
        mon = cls(spark, split_us, **kw)
        mon.grid = (
            spark.read.parquet(path)
            .select("event_type", "cents", "c1", "c2")
            .localCheckpoint(eager=True)
        )
        return mon


def run_wasserstein_stream(
    source: DataFrame, checkpoint: str, split_us: int
) -> WassersteinMonitor:
    """Drive a bounded event stream to completion; returns the monitor
    holding the final count grid."""
    monitor = WassersteinMonitor(source.sparkSession, split_us)
    q = (
        source.writeStream.foreachBatch(monitor.update)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("wasserstein stream did not finish within 300s")
    return monitor
