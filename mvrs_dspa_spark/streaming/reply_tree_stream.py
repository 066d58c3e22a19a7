"""Incremental reply-tree resolution ON the stream (SURVEY §2e #27,
streaming variant).

Direct analog of the reference's keyed orphan buffering
(`streams/BuildReplyTreeProcessFunction.scala:28-41`): first-level
comments carry a post id; replies carry only a parent-comment
pointer, arrive in arbitrary order, and must be resolved to their
root post incrementally — buffering orphans whose parent has not
arrived yet, and reporting (not silently dropping) replies whose
chain never materializes before the watermark passes them
(`danglingReplies` / `postForComment` keyed state, ref :37-41).

Spark-first shape (NOT a translation of the Flink operator): the
reference keeps *operator-global* mutable maps so a resolved reply's
descendants — buffered under a different key — flush immediately.
Structured Streaming state is strictly per-key, so cross-key
propagation is expressed as a **feedback loop**: each micro-batch's
newly-resolved (or dropped) mappings are appended to a feedback file
source unioned with the input, and rendezvous with their waiting
children in the NEXT micro-batch. A chain of depth d settles in d
micro-batches; state per key is one resolved mapping plus the
still-orphaned direct children of that key only — O(fan-out), not
O(users), per key, and the keyed state shards across executors
where the reference's union-list state duplicates onto every worker
(its own :207-214 NOTE calls that out as a scale problem).

Rendezvous key = the comment id under which an event must meet its
counterpart: a first-level comment (or feedback mapping) keys by its
OWN comment id; a reply keys by its PARENT'S comment id.

Causality guard (ref :144-157): a reply with a timestamp earlier
than its resolved parent's is dropped — with a tombstone fed back so
its own descendants drop too — keeping results deterministic under
nondeterministic arrival order.

Dangling eviction (ref `evictDanglingReplies` :288-317): an orphan
whose event time falls below the watermark can never see an on-time
parent (a valid parent's timestamp is <= the reply's); an event-time
timeout reports it with status='dangling'. Its descendants evict by
their own (later) timestamps in turn. The watermark delay must cover
feedback latency (chain depth x trigger interval) — the analog of
the reference coupling eviction to min(both stream watermarks).

The resolved-mapping state is unbounded, exactly as the reference's
`postForComment` (its :97-100 NOTE); production deployments bound it
with the state-store TTL knob rather than operator logic.
"""

from __future__ import annotations

import os
import time
from typing import Any, Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# wire schema shared by the raw input (depth null) and feedback files
EVENT_SCHEMA = (
    "comment_id long, ts timestamp, post_id long, parent_id long, "
    "is_feedback boolean, depth long"
)

OUT_SCHEMA = (
    "comment_id long, post_id long, ts timestamp, depth long, status string"
)

# state for rendezvous key K:
#   map_post / map_ts_us / map_depth — resolved mapping for comment K
#     (map_post = -1 is the causality tombstone);
#   pend_* — parallel arrays of replies still waiting for K.
STATE_SCHEMA = (
    "map_post long, map_ts_us long, map_depth long, "
    "pend_ids array<long>, pend_ts_us array<long>"
)

TOMBSTONE = -1


def _resolver_fn(map_ttl_ms: int | None = None):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            map_post, map_ts_us, map_depth, p_ids, p_ts = state.get
            pend = list(zip(p_ids, p_ts))
        else:
            map_post, map_ts_us, map_depth = None, None, 0
            pend = []

        wm_us = state.getCurrentWatermarkMs() * 1000

        # optional mapping TTL (ref postMappingTtl,
        # BuildReplyTreeProcessFunction.scala:29,241-242): expire the
        # resolved mapping once the watermark is TTL past its event
        # time — children arriving later dangle, exactly as the
        # reference's retained-map eviction makes them. Bounds the
        # otherwise-unbounded per-key mapping state.
        if (
            map_ttl_ms is not None
            and map_post is not None
            and wm_us > 0
            and map_ts_us + map_ttl_ms * 1000 <= wm_us
        ):
            map_post, map_ts_us, map_depth = None, None, 0

        out = []

        rows = []
        if not state.hasTimedOut:
            for pdf in pdfs:
                for i in range(len(pdf)):
                    rows.append(
                        (
                            int(pdf["ts"].iloc[i].value) // 1000,  # ns -> us
                            int(pdf["comment_id"].iloc[i]),
                            None
                            if pd.isna(pdf["post_id"].iloc[i])
                            else int(pdf["post_id"].iloc[i]),
                            None
                            if pd.isna(pdf["depth"].iloc[i])
                            else int(pdf["depth"].iloc[i]),
                            bool(pdf["is_feedback"].iloc[i]),
                        )
                    )
        else:
            for _ in pdfs:  # release Arrow batches
                pass

        # mapping installs before reply processing, each in (ts, id)
        # order — deterministic regardless of Arrow batch order
        rows.sort(key=lambda r: (r[2] is None, r[0], r[1]))
        for ts_us, cid, post, depth, is_fb in rows:
            if post is not None:
                if map_post is None:
                    map_post, map_ts_us = post, ts_us
                    map_depth = depth or 0
                if not is_fb:  # raw first-level comment
                    out.append((cid, post, ts_us, 0, "comment"))
            else:
                pend.append((cid, ts_us))

        if map_post is not None and pend:
            for cid, p_ts_us in sorted(pend, key=lambda r: (r[1], r[0])):
                if map_post == TOMBSTONE or p_ts_us < map_ts_us:
                    # causality violation (or descendant of one): drop,
                    # tombstone-feedback so its children drop too
                    out.append(
                        (cid, TOMBSTONE, p_ts_us, map_depth + 1, "dropped")
                    )
                else:
                    out.append(
                        (cid, map_post, p_ts_us, map_depth + 1, "resolved")
                    )
            pend = []

        # dangling eviction: an orphan at/below the watermark can never
        # see an on-time parent (valid parent ts <= reply ts)
        if pend and wm_us > 0:
            keep = []
            for cid, p_ts_us in pend:
                if p_ts_us <= wm_us:
                    out.append((cid, None, p_ts_us, None, "dangling"))
                else:
                    keep.append((cid, p_ts_us))
            pend = keep

        if pend or map_post is not None:
            state.update(
                (
                    map_post,
                    map_ts_us,
                    map_depth,
                    [c for c, _ in pend],
                    [t for _, t in pend],
                )
            )
            if pend:
                # wake when the watermark passes the oldest orphan
                state.setTimeoutTimestamp(min(t for _, t in pend) // 1000 + 1)
            elif map_ttl_ms is not None:
                # wake at mapping expiry so the state clears without
                # needing another event on this key
                state.setTimeoutTimestamp(
                    max(map_ts_us // 1000 + map_ttl_ms + 1, wm_us // 1000 + 1)
                )
        else:
            state.remove()

        if out:
            yield pd.DataFrame(
                {
                    "comment_id": [r[0] for r in out],
                    "post_id": pd.array([r[1] for r in out], dtype="Int64"),
                    "ts": [pd.Timestamp(r[2], unit="us") for r in out],
                    "depth": pd.array([r[3] for r in out], dtype="Int64"),
                    "status": [r[4] for r in out],
                }
            )

    return fn


def reply_tree_stream(
    src: DataFrame,
    watermark_delay: str = "30 minutes",
    map_ttl_ms: int | None = None,
) -> DataFrame:
    """Keyed incremental resolution over a (raw ∪ feedback) stream.

    `src` must carry EVENT_SCHEMA columns. `map_ttl_ms` bounds the
    per-key mapping state (ref `postMappingTtl`); children arriving
    after their parent's mapping expired are reported dangling.
    """
    keyed = (
        src.withColumn(
            "rendezvous_id",
            F.when(
                F.col("post_id").isNotNull(), F.col("comment_id")
            ).otherwise(F.col("parent_id")),
        )
        .where(F.col("rendezvous_id").isNotNull())
        .withWatermark("ts", watermark_delay)
    )
    return keyed.groupBy("rendezvous_id").applyInPandasWithState(
        _resolver_fn(map_ttl_ms),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def run_reply_tree_resolution(
    spark: SparkSession,
    input_glob: str,
    work_dir: str,
    watermark_delay: str = "30 minutes",
    timeout_s: int = 180,
    max_files_per_trigger: int | None = None,
    final_fence: bool = True,
    map_ttl_ms: int | None = None,
) -> DataFrame:
    """Drive the feedback-loop topology to quiescence; return results.

    Output rows: (comment_id, post_id, ts, depth, status) with status
    in {'comment', 'resolved', 'dropped', 'dangling'}. 'dropped' and
    'dangling' are the reference's dropped-replies side output
    (`outputTagDroppedReplies`) — reported, never silently discarded.

    `final_fence` emits a far-future sentinel once the feedback loop
    quiesces — the bounded-stream analog of Flink's end-of-input
    Long.MaxValue watermark — so every still-orphaned reply is
    reported dangling instead of sitting in state forever. Leave it
    on for bounded runs; an always-on deployment relies on the
    normal watermark instead.
    """
    feedback_dir = os.path.join(work_dir, "feedback")
    out_dir = os.path.join(work_dir, "resolved")
    chk_dir = os.path.join(work_dir, "chk")
    os.makedirs(feedback_dir, exist_ok=True)

    reader = spark.readStream.schema(
        "comment_id long, ts timestamp, post_id long, parent_id long"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = (
        reader.parquet(input_glob)
        .withColumn("is_feedback", F.lit(False))
        .withColumn("depth", F.lit(None).cast("long"))
    )
    fb = spark.readStream.schema(EVENT_SCHEMA).parquet(feedback_dir)
    resolved = reply_tree_stream(
        raw.unionByName(fb), watermark_delay, map_ttl_ms=map_ttl_ms
    )

    def emit(batch: DataFrame, _batch_id: int) -> None:
        batch = batch.persist()
        if batch.count():
            batch.write.mode("append").parquet(out_dir)
            # resolved replies (and causality tombstones) become
            # mappings for THEIR children in the next micro-batch
            fb_rows = batch.where(
                F.col("status").isin("resolved", "dropped")
            ).select(
                "comment_id",
                "ts",
                F.col("post_id").cast("long").alias("post_id"),
                F.lit(None).cast("long").alias("parent_id"),
                F.lit(True).alias("is_feedback"),
                F.col("depth").cast("long").alias("depth"),
            )
            if fb_rows.count():
                fb_rows.write.mode("append").parquet(feedback_dir)
        batch.unpersist()

    q = (
        resolved.writeStream.foreachBatch(emit)
        .option("checkpointLocation", chk_dir)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            q.processAllAvailable()
            # feedback written during the final batch re-arms the
            # source; loop until a full pass adds no new input files
            before = len(os.listdir(feedback_dir))
            q.processAllAvailable()
            if len(os.listdir(feedback_dir)) == before:
                break
        if final_fence:
            mx = (
                spark.read.schema(
                    "comment_id long, ts timestamp, post_id long, parent_id long"
                )
                .parquet(input_glob)
                .agg(F.max("ts").alias("mx"))
                .collect()[0]["mx"]
            )
            if mx is not None:
                import datetime

                fence = spark.createDataFrame(
                    [
                        (
                            -999,
                            mx + datetime.timedelta(days=366),
                            -999,
                            None,
                            True,
                            None,
                        )
                    ],
                    EVENT_SCHEMA,
                )
                fence.write.mode("append").parquet(feedback_dir)
                # fence batch advances the watermark; the (possibly
                # data-less) follow-up batches fire the dangling timers
                q.processAllAvailable()
                q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)
    if not os.path.isdir(out_dir):
        return spark.createDataFrame([], OUT_SCHEMA)
    return spark.read.schema(OUT_SCHEMA).parquet(out_dir)
