"""Streaming throughput harness: the bounded micro-benchmark must
drain completely and report sane, positive rates for both the JVM
file-stream path and the Python DataSource path."""

from __future__ import annotations

import pytest

from mvrs_dspa_spark.streaming.throughput import measure_stream_throughput
from mvrs_dspa_spark.tables import table


@pytest.fixture(scope="module")
def split_events_dir(spark, sf_medium, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tp") / "events8")
    table(spark, sf_medium, "events").repartition(8).write.parquet(out)
    return out


def test_parquet_stream_throughput_stateless(spark, split_events_dir):
    r = measure_stream_throughput(
        spark, source="parquet", pipeline="stateless",
        parquet_dir=split_events_dir,
    )
    assert r["rows"] > 0 and r["batches"] >= 2, r
    assert r["rows_per_s"] > 1_000, r


def test_parquet_stream_throughput_sliding(spark, split_events_dir):
    r = measure_stream_throughput(
        spark, source="parquet", pipeline="sliding",
        parquet_dir=split_events_dir,
    )
    assert r["rows"] > 0 and r["batches"] >= 2, r
    assert r["rows_per_s"] > 1_000, r


def test_sliding_throughput_state_partitions_knob(spark, split_events_dir):
    """The round-8 profiling lever: state_partitions pins the query's
    state-store instance count (fewer per-batch commits) and restores
    the session conf afterwards. No timing assert — cross-JVM rates
    flake; the measured 30.3k -> 41.6k rows/s (32 -> 8 partitions,
    same workload shape, min-of-3 same-JVM) is recorded in SURVEY §6."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    r = measure_stream_throughput(
        spark, source="parquet", pipeline="sliding",
        parquet_dir=split_events_dir, state_partitions=8,
    )
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    assert r["rows"] > 0 and r["rows_per_s"] > 1_000, r


def test_synthetic_stream_throughput(spark):
    r = measure_stream_throughput(
        spark, source="synthetic", pipeline="stateless",
        synthetic_rows=20_000, rows_per_batch=5_000,
    )
    assert r["rows"] == 20_000, r
    assert r["batches"] >= 3, r
    assert r["rows_per_s"] > 0, r


def test_progress_not_truncated_by_recent_progress_cap(
    spark, sf_medium, tmp_path
):
    """The summary must come from the listener, not q.recentProgress:
    Spark caps the latter at spark.sql.streaming.numRecentProgressUpdates
    entries, silently undercounting runs with more triggers. With the
    cap lowered below the trigger count, the listener-based totals
    still see every row."""
    src = str(tmp_path / "events12")
    expected = table(spark, sf_medium, "events").count()
    table(spark, sf_medium, "events").repartition(12).write.parquet(src)

    old = spark.conf.get("spark.sql.streaming.numRecentProgressUpdates")
    try:
        spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "3")
        r = measure_stream_throughput(
            spark,
            source="parquet",
            pipeline="stateless",
            parquet_dir=src,
            files_per_trigger=1,
        )
    finally:
        spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", old)
    assert r["batches"] >= 10, r  # > the cap of 3
    assert r["rows"] == expected, r
