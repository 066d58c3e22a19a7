"""One definition, two execution modes: the SAME windowed-count
DataFrame function must agree between batch execution (withWatermark
is a no-op, all windows computed) and streaming execution (windows
emitted only when finalized by the watermark). Every window the
stream emits must match the batch row exactly; windows the stream
hasn't finalized are the only permissible difference."""

from __future__ import annotations

import os
import time
from datetime import datetime, timezone

from mvrs_dspa_spark.streaming.trending import windowed_key_counts

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _t(h: int, m: int = 0) -> datetime:
    return datetime(2026, 3, 1, h, m, tzinfo=timezone.utc)


def test_same_definition_batch_and_stream_agree(spark, tmp_path):
    rows = [
        (i, _t(8 + (i % 3), (7 * i) % 60), i % 5, ["click", "view", "error"][i % 3], float(i % 7))
        for i in range(200)
    ]
    rows.append((999, _t(15, 0), 1, "signup", 1.0))  # watermark driver

    src_dir = str(tmp_path / "src")
    spark.createDataFrame(rows, SCHEMA).coalesce(2).write.parquet(src_dir)

    batch = windowed_key_counts(
        spark.read.parquet(src_dir), key="event_type", size="1 hour"
    )
    batch_rows = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }

    stream = windowed_key_counts(
        spark.readStream.schema(SCHEMA).parquet(src_dir),
        key="event_type",
        size="1 hour",
        watermark_delay="30 minutes",
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("unify")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_rows = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM unify").collect()
    }

    assert stream_rows, "stream emitted nothing"
    # every finalized streaming window matches batch exactly
    for k, v in stream_rows.items():
        assert batch_rows[k] == v, (k, v, batch_rows.get(k))
    # the only batch rows missing from the stream are unfinalized
    # windows: 1-hour window [ws, ws+1h) is unfinalized iff its end is
    # past the final watermark (max ts 15:00 - 30 min delay = 14:30),
    # i.e. ws > 13:30
    from datetime import timedelta

    wm = _t(14, 30).replace(tzinfo=None)
    for (ws, et) in set(batch_rows) - set(stream_rows):
        assert ws + timedelta(hours=1) > wm, (ws, et)
