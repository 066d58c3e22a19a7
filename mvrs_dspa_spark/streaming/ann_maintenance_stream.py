"""Streaming IVF index-maintenance monitor (§2e 29as; the continuous
form of `operators/ann.ann_index_maintenance`, #87).

The r11 exact-grid conversion is what makes this maintainer possible:
per-cell (count, int64 squared-distance sum) stats against the FIXED
trained quantizer are ADDITIVE, so the state — bounded by nlist x 2
rows, independent of ingest volume — merges across micro-batches in
any order and serves the registered batch report BIT-FOR-BIT through
the shared `maintenance_report_from_stats` tail (batch==stream pin).
This is the recurring-ingest ANN shape: the index owner watches the
report between ingests and retrains only when a cell flags.

Erasure is PER-VECTOR EXACT: additive integer sums subtract as
precisely as they add, so `erase_vectors` removes a vector's exact
(cell, slice, d2) contribution given the vector itself (the quantizer
is pinned, so the assignment is recomputable) — the strongest erasure
posture in the monitor family (cf. 29ao's per-user log erasure,
29aj's documented structural inability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mvrs_dspa_spark.operators.ann import (
    ANN_INCR_MOD,
    maintenance_cell_stats,
    maintenance_report_from_stats,
)

STATE_SCHEMA = "cluster int, is_base boolean, n long, s_d2 long"

COMPACT_PARTITION_CAP = 64
COMPACT_TO = 8


class AnnMaintenanceMonitor:
    """Maintains per-cell base/delta occupancy + exact distance sums
    for a PINNED integer-grid coarse quantizer across micro-batches of
    (vec_id, embedding) rows."""

    def __init__(
        self,
        spark,
        cents: list[list[int]],
        mod: int = ANN_INCR_MOD,
        compact_cap: int = COMPACT_PARTITION_CAP,
        compact_to: int = COMPACT_TO,
    ) -> None:
        if not cents:
            raise ValueError("AnnMaintenanceMonitor needs a trained quantizer")
        self.spark = spark
        self.cents = [[int(x) for x in c] for c in cents]
        self.mod = mod
        self.state: DataFrame = spark.createDataFrame([], STATE_SCHEMA)
        self.n_batches = 0
        self.compact_cap = compact_cap
        self.compact_to = compact_to

    def _merge(self, delta: DataFrame) -> None:
        merged = (
            self.state.unionByName(delta)
            .groupBy("cluster", "is_base")
            .agg(F.sum("n").alias("n"), F.sum("s_d2").alias("s_d2"))
            .where(F.col("n") > 0)  # fully-erased cells leave no row
        )
        if merged.rdd.getNumPartitions() > self.compact_cap:
            merged = merged.repartition(self.compact_to, "cluster")
        self.state = merged.localCheckpoint(eager=True)

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        self._merge(maintenance_cell_stats(batch_df, self.cents, self.mod))
        self.n_batches += 1

    def erase_vectors(self, vectors_df: DataFrame) -> None:
        """Subtract the exact contribution of the given
        (vec_id, embedding) rows — integer sums erase as precisely as
        they accumulate."""
        if vectors_df.isEmpty():
            return
        gone = maintenance_cell_stats(
            vectors_df, self.cents, self.mod
        ).select(
            "cluster",
            "is_base",
            (-F.col("n")).alias("n"),
            (-F.col("s_d2")).alias("s_d2"),
        )
        self._merge(gone)

    def report(self) -> DataFrame:
        """The maintenance report through the SAME serving tail as the
        registered #87 batch query."""
        return maintenance_report_from_stats(self.state)

    def save(self, path: str) -> None:
        self.state.write.mode("overwrite").parquet(path)

    @classmethod
    def load(
        cls, spark, path: str, cents: list[list[int]], **kw
    ) -> "AnnMaintenanceMonitor":
        mon = cls(spark, cents, **kw)
        mon.state = (
            spark.read.parquet(path)
            .select("cluster", "is_base", "n", "s_d2")
            .localCheckpoint(eager=True)
        )
        return mon


def run_ann_maintenance_stream(
    source: DataFrame, checkpoint: str, cents: list[list[int]]
) -> AnnMaintenanceMonitor:
    """Drive a bounded (vec_id, embedding) stream to completion
    against a trained quantizer; returns the monitor holding the
    final per-cell stats."""
    monitor = AnnMaintenanceMonitor(source.sparkSession, cents)
    q = (
        source.writeStream.foreachBatch(monitor.update)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("ann-maintenance stream did not finish in 300s")
    return monitor
