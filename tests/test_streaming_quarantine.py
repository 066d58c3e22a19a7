"""Streaming quarantine must route exactly the rows the batch
operator quarantines, with identical reason strings."""

from __future__ import annotations

import datetime
import os

from mvrs_dspa_spark.operators.validation import quarantine_split
from mvrs_dspa_spark.streaming.quarantine_stream import run_quarantine_stream

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _ts(h):
    return datetime.datetime(2024, 1, 1, h, 0, 0)


ROWS = [
    (1, _ts(1), 1, "click", 10.0, "{}"),
    (2, _ts(2), 2, "view", -5.0, "{}"),
    (3, _ts(3), 3, "hover", 1.0, "{}"),
    (4, _ts(4), -4, "click", 1.0, "{}"),
    (5, _ts(5), 5, "purchase", 7.0, "{}"),
    (6, datetime.datetime(2031, 1, 1), 6, "view", 1.0, "{}"),
]


def test_streaming_quarantine_matches_batch(spark, tmp_path):
    root = str(tmp_path / "in")
    os.makedirs(root)
    for i in range(3):  # three micro-batches of two rows
        chunk = ROWS[i * 2 : (i + 1) * 2]
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(
            os.path.join(root, f"b{i:03d}")
        )
    src = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(root, "b*"))
    )
    good_dir = str(tmp_path / "good")
    quar_dir = str(tmp_path / "quarantine")
    run_quarantine_stream(src, good_dir, quar_dir, str(tmp_path / "ckpt"))

    got_good = {
        r.event_id for r in spark.read.parquet(good_dir + "/batch_id=*").collect()
    }
    got_bad = {
        r.event_id: r.reasons
        for r in spark.read.parquet(quar_dir + "/batch_id=*").collect()
    }

    batch = spark.createDataFrame(ROWS, SCHEMA)
    want_good, want_bad_df = quarantine_split(batch)
    want_good_ids = {r.event_id for r in want_good.collect()}
    want_bad = {r.event_id: r.reasons for r in want_bad_df.collect()}

    assert got_good == want_good_ids == {1, 5}
    assert got_bad == want_bad
    assert set(got_bad) == {2, 3, 4, 6}
