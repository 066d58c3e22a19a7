"""Streaming quarantine routing (§2e; the continuous form of
`operators/validation.quarantine_split`).

The DLT-expectations deployment shape: one foreachBatch splits every
micro-batch through the SAME rule set the batch operator uses (rules
are declared once in validation.py and compiled to both engines), then
writes clean rows to the main table and failing rows — with their
reason lists — to a quarantine directory, each under batch-id
partitions so driver retries re-deliver idempotently (the 29n
exactly-once pattern). Batch and stream therefore quarantine
IDENTICAL rows for identical input, pinned by test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mvrs_dspa_spark.operators.validation import quarantine_split


def run_quarantine_stream(
    source: DataFrame,
    good_path: str,
    quarantine_path: str,
    checkpoint: str,
):
    """Route a bounded event stream through the quarantine split."""

    def route(batch_df: DataFrame, batch_id: int) -> None:
        good, bad = quarantine_split(batch_df)
        good.write.mode("overwrite").parquet(
            f"{good_path}/batch_id={batch_id}"
        )
        bad.write.mode("overwrite").parquet(
            f"{quarantine_path}/batch_id={batch_id}"
        )

    q = (
        source.writeStream.foreachBatch(route)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        q.stop()
        raise TimeoutError("quarantine stream did not finish within 180s")
    return q
