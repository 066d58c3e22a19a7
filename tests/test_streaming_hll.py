"""Streaming HLL: the incrementally-merged register table must equal
the batch-built one register-for-register (MAX is the HLL merge, and
the streaming aggregation state is the running merge)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mvrs_dspa_spark.functions import hashing as H
from mvrs_dspa_spark.operators.sketches import hll_registers
from mvrs_dspa_spark.streaming.hll_stream import run_hll_stream
from mvrs_dspa_spark.tables import table

SF = "/root/testdata/sf0.001"
SCHEMA = "event_id long, user_id long, event_type string"


def test_streaming_hll_registers_match_batch(spark, tmp_path):
    ev = table(spark, SF, "events").select(
        "event_id", "user_id", "event_type"
    )
    rows = ev.collect()
    root = str(tmp_path / "ev_in")
    os.makedirs(root)
    per = (len(rows) + 3) // 4
    for i in range(4):
        chunk = [tuple(r) for r in rows[i * per : (i + 1) * per]]
        if chunk:
            spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(
                os.path.join(root, f"b{i:03d}")
            )
    src = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(root, "b*"))
    )
    got = run_hll_stream(src, str(tmp_path / "ckpt"))

    want = {
        (r.event_type, r.bucket): r.m_j
        for r in hll_registers(
            ev, H.str_code_col(F.col("user_id").cast("string")), "event_type"
        ).collect()
    }
    assert got == want
