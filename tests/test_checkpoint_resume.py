"""Checkpoint resume semantics: a restarted query must pick up where
the checkpoint left off — no reprocessing, no duplicates in an
exactly-once file sink (SURVEY §2e #28)."""

from __future__ import annotations

import os

from mvrs_dspa_spark.streaming import sources

SCHEMA = "id long, v double"


def _write(spark, path, lo, hi):
    spark.createDataFrame(
        [(i, float(i)) for i in range(lo, hi)], SCHEMA
    ).coalesce(1).write.mode("append").parquet(path)


def test_restart_from_checkpoint_no_duplicates(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # run 1: only rows [0, 50) exist
    _write(spark, src, 0, 50)
    stream = sources.read_stream(spark, src, "parquet", SCHEMA)
    q1 = sources.parquet_sink(stream, out, ckpt)
    q1.awaitTermination(120)
    assert spark.read.parquet(out).count() == 50

    # run 2: new rows land, a NEW query resumes from the same checkpoint
    _write(spark, src, 50, 80)
    stream2 = sources.read_stream(spark, src, "parquet", SCHEMA)
    q2 = sources.parquet_sink(stream2, out, ckpt)
    q2.awaitTermination(120)

    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(80)), "resume must add only new rows, exactly once"
