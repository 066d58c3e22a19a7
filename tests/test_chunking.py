"""Chunking invariants beyond the oracle-parity gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from mvrs_dspa_spark.operators import chunking
from mvrs_dspa_spark.functions import text as T
from mvrs_dspa_spark.tables import table


def test_chunks_cover_every_token_exactly(spark, sf_medium):
    docs = table(spark, sf_medium, "documents").select(
        "doc_id", F.size(T.tokens_col(F.col("text"))).alias("n")
    )
    chunks = chunking.chunk_documents(spark, sf_medium)
    got = (
        chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("chunk_idx").alias("last_idx"),
            F.sum("n_tokens").alias("tok_sum"),
        )
        .join(docs, "doc_id")
        .collect()
    )
    C, S = chunking.CHUNK, chunking.STRIDE
    for r in got:
        # chunk count matches the stride arithmetic
        n_starts = (max(r.n, 1) - 1) // S + 1
        assert r.n_chunks == n_starts, (r.doc_id, r.n, r.n_chunks)
        assert r.last_idx == n_starts - 1
        # token coverage: all chunks full C except the tail ones
        full = sum(min(C, r.n - i * S) for i in range(n_starts) if r.n - i * S > 0)
        assert r.tok_sum == full, (r.doc_id, r.n, r.tok_sum, full)


def test_chunk_hash_is_content_determined(spark):
    # two docs with identical text produce identical chunk hash streams
    df = spark.createDataFrame(
        [(1, "a b c " * 40), (2, "a b c " * 40), (3, "x y z " * 40)],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("___tmp")
    from mvrs_dspa_spark.functions import hashing as H

    toks = T.tokens_col(F.col("text"))
    starts = df.select(
        "doc_id",
        toks.alias("t"),
        F.posexplode(
            F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(chunking.STRIDE))
        ).alias("chunk_idx", "s"),
    )
    chunk = F.slice(F.col("t"), F.col("s"), chunking.CHUNK)
    h = F.aggregate(
        F.transform(chunk, H.str_code_col),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % F.lit(H.P),
    )
    rows = starts.select("doc_id", "chunk_idx", h.alias("h")).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = r.h
    assert by_doc[1] == by_doc[2]
    assert by_doc[1] != by_doc[3]
