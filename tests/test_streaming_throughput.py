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


def test_synthetic_stream_throughput(spark):
    r = measure_stream_throughput(
        spark, source="synthetic", pipeline="stateless",
        synthetic_rows=20_000, rows_per_batch=5_000,
    )
    assert r["rows"] == 20_000, r
    assert r["batches"] >= 3, r
    assert r["rows_per_s"] > 0, r
