"""Streaming ALS fold-in serving (§2e; the continuous form of
`operators/mlmodels.als_implicit_recs`, #142).

The production shape for a factorization recommender: the expensive
alternating fit runs in batch (model training), while the stream
handles *fold-in* — new or newly-active users get a factor vector by
solving their single ridge system against the FROZEN item factors
(Hu et al. 2008 §4: one user's solve only needs Y, YtY and that
user's own interactions; it touches no other user). FAISS-style
add-after-train for matrix factorization, and the model-serving twin
of the incremental IVF maintenance operator (#87).

Per micro-batch: interaction deltas are merged into the running
per-(user, item) count table (additive merge, the RfmMaintainer
pattern), then ONLY the users present in the batch are re-solved —
each re-solve is the same `_solve_side` the distributed batch fit
uses, so streamed factors are pinned EQUAL to a batch solve over the
same accumulated interactions (test_streaming_als).

State is bounded by (active users x touched items), not event
volume; the frozen item-factor frame and its k x k Gramian are
computed once at construction. Compaction hygiene follows the SCD2/
RFM maintainers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mvrs_dspa_spark.operators.mlmodels import (
    ALS_K,
    ALS_REC_N,
    _gramian,
    _solve_side,
)

INTER_SCHEMA = "custkey long, partkey long, cnt long"
FACTOR_SCHEMA = "custkey long, fac array<double>"

COMPACT_PARTITION_CAP = 64
COMPACT_TO = 16


class AlsFoldInServer:
    """Folds new users into a frozen item-factor model, one ridge
    solve per affected user per batch; serves top-N unseen items."""

    def __init__(
        self,
        spark,
        item_factors: DataFrame,
        compact_cap: int = COMPACT_PARTITION_CAP,
        compact_to: int = COMPACT_TO,
    ) -> None:
        self.spark = spark
        # frozen model: localCheckpoint so every batch reuses the
        # materialized factors instead of re-running their lineage;
        # the k x k Gramian is likewise computed ONCE here (the batch
        # fit collects it per half-step; a frozen model never changes)
        self.items = item_factors.localCheckpoint(eager=True)
        self.items_yty = _gramian(self.items)
        self.inter: DataFrame = spark.createDataFrame([], INTER_SCHEMA)
        self.factors: DataFrame = spark.createDataFrame([], FACTOR_SCHEMA)
        self.n_batches = 0
        self.compact_cap = compact_cap
        self.compact_to = compact_to

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        """batch_df: (custkey, partkey) interaction events."""
        if batch_df.isEmpty():
            return
        delta = batch_df.groupBy("custkey", "partkey").agg(
            F.count(F.lit(1)).alias("d_cnt")
        )
        merged = (
            self.inter.join(delta, ["custkey", "partkey"], "full_outer")
            .select(
                "custkey",
                "partkey",
                (
                    F.coalesce("cnt", F.lit(0))
                    + F.coalesce("d_cnt", F.lit(0))
                ).alias("cnt"),
            )
        )
        if merged.rdd.getNumPartitions() > self.compact_cap:
            merged = merged.repartition(self.compact_to, "custkey")
        self.inter = merged.localCheckpoint(eager=True)

        touched = delta.select("custkey").distinct()
        solved = _solve_side(
            self.inter.join(F.broadcast(touched), "custkey"),
            self.items,
            "custkey",
            "partkey",
            self.items_yty,
        )
        kept = self.factors.join(touched, "custkey", "left_anti")
        factors = kept.unionByName(solved)
        if factors.rdd.getNumPartitions() > self.compact_cap:
            factors = factors.repartition(self.compact_to, "custkey")
        self.factors = factors.localCheckpoint(eager=True)
        self.n_batches += 1

    def recommend(self, n: int = ALS_REC_N) -> DataFrame:
        """Top-n unseen items for every folded-in user (the batch
        query's serving join, over the maintained factor table)."""
        dot = F.lit(0.0)
        for d in range(ALS_K):
            dot = dot + F.element_at("ufac", d + 1) * F.element_at(
                "vfac", d + 1
            )
        scored = (
            F.broadcast(self.factors.withColumnRenamed("fac", "ufac"))
            .crossJoin(self.items.withColumnRenamed("fac", "vfac"))
            .select("custkey", "partkey", F.round(dot, 6).alias("score"))
        )
        unseen = scored.join(
            self.inter.select("custkey", "partkey"),
            ["custkey", "partkey"],
            "left_anti",
        )
        w = Window.partitionBy("custkey").orderBy(
            F.desc("score"), F.asc("partkey")
        )
        return (
            unseen.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= n)
            .select("custkey", "partkey", "rank", "score")
            .orderBy("custkey", "rank")
        )


def run_als_fold_in(
    source: DataFrame, item_factors: DataFrame, checkpoint: str
) -> AlsFoldInServer:
    """Drive a bounded interaction stream to completion; returns the
    server holding folded-in user factors."""
    server = AlsFoldInServer(source.sparkSession, item_factors)
    q = (
        source.writeStream.foreachBatch(server.update)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("als fold-in stream did not finish within 300s")
    return server
