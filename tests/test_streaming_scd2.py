"""Streaming SCD2 maintenance must produce EXACTLY the batch-built
dimension — rows, intervals, current flags, and version numbers —
when the event log is replayed in ordered micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from mvrs_dspa_spark.plans.analytics import user_state_history
from mvrs_dspa_spark.streaming.replay import (
    read_replay_stream,
    write_replay_batches,
)
from mvrs_dspa_spark.streaming.scd2_stream import run_scd2_stream
from mvrs_dspa_spark.tables import table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r.user_id, r.state, r.valid_from, r.valid_to, r.is_current, r.version)
        for r in df.collect()
    )


def test_streaming_scd2_equals_batch(spark, tmp_path):
    ev = table(spark, SF, "events")
    # bounded ts-prefix slice so the replayed stream covers complete
    # per-user histories for the same input the batch twin sees
    cutoff = ev.agg(
        F.min("ts").alias("mn")
    ).collect()[0].mn
    import datetime

    hi = cutoff + datetime.timedelta(days=3)
    sliced_dir = str(tmp_path / "sliced")
    sliced = ev.where(F.col("ts") < F.lit(hi))
    # write the slice as its own events table for the batch twin
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = sliced.collect()
    tbl = pa.table(
        {
            "event_id": pa.array([r.event_id for r in rows], pa.int64()),
            "ts": pa.array([r.ts for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r.user_id for r in rows], pa.int64()),
            "event_type": pa.array([r.event_type for r in rows], pa.string()),
            "value": pa.array([r.value for r in rows], pa.float64()),
            "props": pa.array([r.props for r in rows], pa.string()),
        }
    )
    import os

    os.makedirs(sliced_dir)
    pq.write_table(tbl, f"{sliced_dir}/events.parquet")

    replay_dir = str(tmp_path / "replay")
    write_replay_batches(sliced, replay_dir, n_batches=4)
    src = read_replay_stream(spark, replay_dir, sliced.schema)
    mon = run_scd2_stream(src, str(tmp_path / "ckpt"))
    assert mon.n_batches >= 4

    want = _rows(user_state_history(spark, sliced_dir))
    got = _rows(mon.history)
    assert got == want
    assert len(got) > 0
