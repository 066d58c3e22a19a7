"""Context-window chunking over `documents` (LLM-pipeline op).

Splits each document's token stream into fixed-width training windows
with a stride overlap (window 64, stride 48 -> 16-token overlap) and
emits per-chunk metadata plus a portable content hash — the
sequence-preparation step between cleaning/dedup and `pack_sequences`
in a pretraining pipeline.

Plan shape: the chunk *starts* are exploded FIRST (one row per
(doc, start)), and the token array rides through the generator, so
each chunk slices an already-materialized array. Slicing inside a
`transform(starts, ...)` lambda instead would re-evaluate the whole
tokenize pipeline per chunk via CollapseProject inlining — the
measured O(n²) trap ([[pyspark-perf-pitfalls]]). Narrow after the
explode: no shuffle at all; at 100 TB this is scan-bound with ~1.3x
row/byte amplification (overlap / stride).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mvrs_dspa_spark.functions import hashing as H
from mvrs_dspa_spark.functions import text as T
from mvrs_dspa_spark.plans.registry import register
from mvrs_dspa_spark.tables import table

CHUNK = 64
STRIDE = 48


@register(
    "chunk_documents",
    oracle=f"""
        SELECT doc_id,
               CAST((s - 1) / {STRIDE} AS BIGINT) AS chunk_idx,
               CAST(len(c) AS BIGINT) AS n_tokens,
               list_reduce(
                   list_prepend(0::BIGINT,
                                list_transform(c, x -> {H.str_code_sql('x')})),
                   (acc, x) -> (acc * 31 + x) % {H.P}) AS chunk_hash
        FROM (
            SELECT doc_id, s, t[s : s + {CHUNK} - 1] AS c
            FROM (
                SELECT doc_id, t,
                       unnest(generate_series(1, greatest(len(t), 1),
                                              {STRIDE})) AS s
                FROM (SELECT doc_id, {T.tokens_sql('text')} AS t
                      FROM documents)
            )
        )
        ORDER BY doc_id, chunk_idx
    """,
    doc="Fixed-width training-window chunking (64-token windows, "
    "stride 48): per-chunk token count + rolling content hash. "
    "Starts exploded before slicing so the tokenizer runs once per "
    "doc, not once per chunk; fully narrow, shuffle-free.",
    tags=("llm", "chunking"),
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    toks = d.select(
        "doc_id", T.tokens_col(F.col("text")).alias("t")
    )
    starts = toks.select(
        "doc_id",
        "t",
        F.posexplode(
            F.sequence(
                F.lit(1), F.greatest(F.size("t"), F.lit(1)), F.lit(STRIDE)
            )
        ).alias("chunk_idx", "s"),
    )
    chunk = F.slice(F.col("t"), F.col("s"), CHUNK)
    chunk_hash = F.aggregate(
        F.transform(chunk, H.str_code_col),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % F.lit(H.P),
    )
    return (
        starts.select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size(chunk).cast("long").alias("n_tokens"),
            chunk_hash.alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )
