"""Streaming embedding centroid-drift monitor (§2e 29am; the
continuous form of `operators/embeddings.embedding_centroid_drift`,
#191).

The per-(label, slice, dim) coded component sums are int64-exact and
ADDITIVE, so the state — bounded by labels x 2 x dims, independent of
vector volume — merges across micro-batches in any order; serving
runs the SHARED `embedding_drift_from_sums` tail, so a replayed
embedding log reproduces the batch drift table EXACTLY (batch==stream
pin). The representation-space member of the continuous drift family
(PSI 29af, W1 29ah, rank tests 29al).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mvrs_dspa_spark.operators.embeddings import (
    embedding_dim_sums,
    embedding_drift_from_sums,
)

STATE_SCHEMA = "label int, period int, dim int, s_c long, n long"

COMPACT_PARTITION_CAP = 64
COMPACT_TO = 8


class EmbeddingDriftMonitor:
    """Maintains the additive per-dimension coded-sum grid across
    micro-batches of (vec_id, embedding, label) rows."""

    def __init__(
        self,
        spark,
        compact_cap: int = COMPACT_PARTITION_CAP,
        compact_to: int = COMPACT_TO,
    ) -> None:
        self.spark = spark
        self.state: DataFrame = spark.createDataFrame([], STATE_SCHEMA)
        self.n_batches = 0
        self.compact_cap = compact_cap
        self.compact_to = compact_to

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        delta = embedding_dim_sums(batch_df)
        merged = (
            self.state.unionByName(delta)
            .groupBy("label", "period", "dim")
            .agg(F.sum("s_c").alias("s_c"), F.sum("n").alias("n"))
        )
        if merged.rdd.getNumPartitions() > self.compact_cap:
            merged = merged.repartition(self.compact_to, "label")
        self.state = merged.localCheckpoint(eager=True)
        self.n_batches += 1

    def report(self) -> DataFrame:
        """The drift table through the SAME serving tail as #191."""
        return embedding_drift_from_sums(self.state)

    def erase_users(self, user_ids) -> None:
        """No-op by construction (the PsiMonitor posture): the grid
        holds per-dimension aggregate sums with no per-subject
        attribution; erasure happens upstream on the retained log."""

    def save(self, path: str) -> None:
        self.state.write.mode("overwrite").parquet(path)

    @classmethod
    def load(cls, spark, path: str, **kw) -> "EmbeddingDriftMonitor":
        mon = cls(spark, **kw)
        mon.state = (
            spark.read.parquet(path)
            .select("label", "period", "dim", "s_c", "n")
            .localCheckpoint(eager=True)
        )
        return mon


def run_embdrift_stream(
    source: DataFrame, checkpoint: str
) -> EmbeddingDriftMonitor:
    """Drive a bounded embedding stream to completion; returns the
    monitor holding the final coded-sum grid."""
    monitor = EmbeddingDriftMonitor(source.sparkSession)
    q = (
        source.writeStream.foreachBatch(monitor.update)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("embedding-drift stream did not finish in 300s")
    return monitor
