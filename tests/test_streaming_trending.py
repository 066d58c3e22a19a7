"""Trending top-K stream: finalized-window ranking, exactly-once
emission under foreachBatch retry, and watermark-gated finality."""

from __future__ import annotations

import glob
import os
import time
from datetime import datetime, timezone

from pyspark.sql import functions as F

from mvrs_dspa_spark.streaming.trending import (
    idempotent_batch_writer,
    rank_topk,
    trending_topk_job,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _t(h: int, m: int = 0) -> datetime:
    return datetime(2026, 2, 1, h, m, tzinfo=timezone.utc)


def _write_batches(spark, tmp_path, batches):
    root = str(tmp_path / "in")
    os.makedirs(root, exist_ok=True)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, SCHEMA)
        p = os.path.join(root, f"b{i:03d}")
        df.coalesce(1).write.parquet(p)
        ts = time.time() + i * 10
        for dirpath, _, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(dirpath, f), (ts, ts))
    return os.path.join(root, "b*")


def test_topk_ranks_only_finalized_windows(spark, tmp_path):
    # hour 9: clicks dominate; the 12:00 event pushes the watermark
    # past 10:00 so the 9:00 window finalizes and emits exactly once
    b0 = (
        [(i, _t(9, i % 50), 1, "click", 1.0) for i in range(6)]
        + [(100 + i, _t(9, i % 50), 1, "view", 1.0) for i in range(4)]
        + [(200 + i, _t(9, i % 50), 1, "error", 1.0) for i in range(2)]
    )
    b1 = [(999, _t(12, 0), 9, "signup", 1.0)]
    glob_in = _write_batches(spark, tmp_path, [b0, b1])

    src = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(glob_in)
    )
    out = str(tmp_path / "out")
    q = trending_topk_job(
        src,
        out,
        str(tmp_path / "chk"),
        k=2,
        size="1 hour",
        watermark_delay="30 minutes",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination(30)

    rows = spark.read.parquet(os.path.join(out, "_batch_id=*")).collect()
    nine = [r for r in rows if r["window_start"] == _t(9, 0).replace(tzinfo=None)]
    assert [(r["event_type"], r["n_events"], r["rank"]) for r in sorted(
        nine, key=lambda r: r["rank"]
    )] == [("click", 6, 1), ("view", 4, 2)]


def test_idempotent_writer_skips_replayed_batch(spark, tmp_path):
    out = str(tmp_path / "idem")
    batch = spark.createDataFrame(
        [(_t(9, 0), _t(10, 0), "click", 5, 5.0),
         (_t(9, 0), _t(10, 0), "view", 3, 3.0)],
        "window_start timestamp, window_end timestamp, event_type string, "
        "n_events long, total_value double",
    )
    write = idempotent_batch_writer(out, k=1)
    write(batch, 7)
    first = spark.read.parquet(os.path.join(out, "_batch_id=7")).collect()
    write(batch, 7)  # foreachBatch retry: same batchId, same data
    second = spark.read.parquet(os.path.join(out, "_batch_id=7")).collect()
    assert len(first) == len(second) == 1
    assert first[0]["event_type"] == "click"
    assert len(glob.glob(os.path.join(out, "_batch_id=*"))) == 1


def test_rank_topk_deterministic_tiebreak(spark):
    batch = spark.createDataFrame(
        [(_t(9, 0), "b", 5), (_t(9, 0), "a", 5), (_t(9, 0), "c", 4)],
        "window_start timestamp, event_type string, n_events long",
    )
    got = [
        (r["event_type"], r["rank"])
        for r in rank_topk(batch, "event_type", 2)
        .orderBy("rank")
        .collect()
    ]
    assert got == [("a", 1), ("b", 2)]  # equal counts -> key order
