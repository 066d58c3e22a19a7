"""Streaming SCD2 dimension maintenance (§2e; the continuous form of
`plans/analytics.user_state_history`).

A warehouse's slowly-changing dimension is maintained from a change
stream, not rebuilt from scratch: per micro-batch, only the batch's
users are touched — their OPEN version row is replayed as the seed
ahead of the batch's events, the same change-detection window the
batch operator uses recomputes just that tail segment (closing the
open row if the state moved, chaining any further changes), and
version numbers continue from the user's closed-row count. Untouched
users' rows are never rewritten, so per-batch work is O(affected
users), not O(dimension).

Driver state is the history DataFrame itself, lineage-cut per batch
with localCheckpoint (the recommendations-job pattern); on a cluster
the same merge writes through a Delta/Iceberg MERGE instead. The
batch==stream equality test pins that replaying the event log in
ordered micro-batches produces EXACTLY the batch-built SCD2 table —
rows, intervals, flags, and version numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HISTORY_SCHEMA = (
    "user_id long, state string, valid_from timestamp, "
    "valid_to timestamp, is_current boolean, version long"
)

# Long-run hygiene: every batch unions (untouched ∪ recomputed), so the
# checkpointed history's partition count grows by ~shuffle_partitions
# per batch — after thousands of batches the dimension would be carved
# into thousands of splinter partitions (per-task overhead dominates,
# the exact small-file problem OPTIMIZE fixes on disk). When the count
# crosses the cap, compact back to `compact_to` partitions hashed on
# user_id BEFORE the checkpoint, so the next batch's per-user joins
# start from a sane layout. Amortized cost: one bounded-table shuffle
# every ~cap/shuffle_partitions batches.
COMPACT_PARTITION_CAP = 64
COMPACT_TO = 16


class Scd2Maintainer:
    """Accumulates the SCD2 history across micro-batches."""

    def __init__(
        self,
        spark,
        compact_cap: int = COMPACT_PARTITION_CAP,
        compact_to: int = COMPACT_TO,
    ) -> None:
        self.spark = spark
        self.history: DataFrame = spark.createDataFrame([], HISTORY_SCHEMA)
        self.n_batches = 0
        self.n_compactions = 0
        self.compact_cap = compact_cap
        self.compact_to = compact_to

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        affected = batch_df.select("user_id").distinct()

        # seed: each affected user's open row, replayed ahead of the
        # batch (event_id -1 sorts before any real event at equal ts)
        open_rows = self.history.join(affected, "user_id", "left_semi").where(
            F.col("is_current")
        )
        seeds = open_rows.select(
            "user_id",
            F.col("state"),
            F.col("valid_from").alias("ts"),
            F.lit(-1).cast("long").alias("event_id"),
        )
        batch_ev = batch_df.select(
            "user_id",
            F.col("event_type").alias("state"),
            "ts",
            "event_id",
        )
        seg = seeds.unionByName(batch_ev)

        # same change-detection + interval chaining as the batch op
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        changes = (
            seg.withColumn("prev_state", F.lag("state").over(w))
            .where(
                F.col("prev_state").isNull()
                | (F.col("state") != F.col("prev_state"))
            )
            .select("user_id", "state", F.col("ts").alias("valid_from"))
        )
        w2 = Window.partitionBy("user_id").orderBy("valid_from")
        # versions continue from each user's closed-row count
        offsets = (
            self.history.join(affected, "user_id", "left_semi")
            .where(~F.col("is_current"))
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_closed"))
        )
        recomputed = (
            changes.withColumn(
                "valid_to", F.lead("valid_from").over(w2)
            )
            .withColumn("is_current", F.col("valid_to").isNull())
            .withColumn("rn", F.row_number().over(w2).cast("long"))
            .join(offsets, "user_id", "left")
            .select(
                "user_id",
                "state",
                "valid_from",
                "valid_to",
                "is_current",
                (F.col("rn") + F.coalesce("n_closed", F.lit(0))).alias(
                    "version"
                ),
            )
        )
        untouched = self.history.join(
            affected, "user_id", "left_anti"
        ).unionByName(
            # affected users' CLOSED rows stay as-is
            self.history.join(affected, "user_id", "left_semi").where(
                ~F.col("is_current")
            )
        )
        new_hist = untouched.unionByName(recomputed)
        if new_hist.rdd.getNumPartitions() > self.compact_cap:
            new_hist = new_hist.repartition(self.compact_to, "user_id")
            self.n_compactions += 1
        self.history = new_hist.localCheckpoint(eager=True)
        self.n_batches += 1

    def erase_users(self, user_ids) -> None:
        """GDPR right-to-be-forgotten enforcement for STREAMING state
        (the stateful twin of `validation.gdpr_erasure_audit`): drop
        every dimension row of the requested subjects from the
        checkpointed history. Deletion requests arrive out-of-band of
        the event stream, so this is an operator API, not a batch
        transform; if the subject reappears later, their history
        restarts from scratch (version 1) — exactly the erase-then-new
        semantics the regulation requires. The filter is a broadcast
        NOT-IN over the (small) request list; at cluster scale the
        same contract is a MERGE DELETE on the dimension table."""
        ids = list(user_ids)
        self.history = self.history.where(
            # NULL-safe: ~isin() is NULL for a NULL key, which would
            # silently erase all null-keyed state too (ADVICE r6)
            ~F.col("user_id").isin(ids) | F.col("user_id").isNull()
        ).localCheckpoint(eager=True)


def run_scd2_stream(source: DataFrame, checkpoint: str) -> Scd2Maintainer:
    """Drive a bounded event stream to completion; returns the
    maintainer holding the final SCD2 history."""
    maintainer = Scd2Maintainer(source.sparkSession)
    q = (
        source.writeStream.foreachBatch(maintainer.update)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("scd2 stream did not finish within 300s")
    return maintainer
