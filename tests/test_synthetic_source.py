"""Custom Python DataSource: determinism, partitioning, streaming."""

from __future__ import annotations

from pyspark.sql import functions as F

from mvrs_dspa_spark.streaming.synthetic_source import (
    register_synthetic_source,
)


def _read(spark, **opts):
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_deterministic_and_partitioned(spark):
    register_synthetic_source(spark)
    a = _read(spark, rows=500, seed=7, numPartitions=4)
    assert a.count() == 500
    assert a.rdd.getNumPartitions() == 4
    # same seed -> identical data; different seed -> different data
    b = _read(spark, rows=500, seed=7, numPartitions=2)  # partitioning-free
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    c = _read(spark, rows=500, seed=8, numPartitions=4)
    assert a.exceptAll(c).count() > 0
    # schema + sanity of generated columns
    assert a.schema.simpleString() == (
        "struct<event_id:bigint,ts:timestamp,user_id:bigint,"
        "event_type:string,value:double,props:string>"
    )
    types = {r.event_type for r in a.select("event_type").distinct().collect()}
    assert types <= {"click", "error", "purchase", "signup", "view"}
    assert a.where(F.col("event_id").isNull()).count() == 0


def test_stream_read_batches_and_checkpoint_ranges(spark, tmp_path):
    register_synthetic_source(spark)
    src = (
        spark.readStream.format("synthetic_events")
        .option("rowsPerBatch", 50)
        .option("seed", 7)
        .load()
    )
    q = (
        src.writeStream.format("memory")
        .queryName("synth")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT COUNT(*) c FROM synth").first().c >= 100:
                break
            time.sleep(1)
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM synth").collect()
    assert len(got) >= 100
    # stream rows equal the batch rows for the same seed (same generator)
    ids = sorted(r.event_id for r in got)
    assert ids == list(range(len(ids))), "offsets must be gapless row ranges"
    batch = {tuple(r) for r in _read(spark, rows=len(ids), seed=7).collect()}
    assert {tuple(r) for r in got} == batch
