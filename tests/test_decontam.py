"""Decontamination invariants beyond the oracle-parity gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from mvrs_dspa_spark.operators import decontam
from mvrs_dspa_spark.functions import text as T
from mvrs_dspa_spark.tables import table


def test_decontaminate_invariants(spark, sf_medium):
    rows = decontam.decontaminate(spark, sf_medium).collect()
    # benchmark slice excluded from the output
    assert all(r.doc_id % decontam.BENCH_MOD != 0 for r in rows)
    # flag is exactly hits > 0
    assert all(r.contaminated == (r.n_hits > 0) for r in rows)
    # output covers every training doc exactly once
    n_docs = table(spark, sf_medium, "documents").count()
    n_bench = (
        table(spark, sf_medium, "documents")
        .where(F.col("doc_id") % decontam.BENCH_MOD == 0)
        .count()
    )
    assert len(rows) == n_docs - n_bench
    assert len({r.doc_id for r in rows}) == len(rows)


def test_decontaminate_membership_join_is_broadcast(spark, sf_medium):
    plan = decontam.decontaminate(spark, sf_medium)._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan


def test_gram8_codes_width_and_determinism(spark):
    # n tokens -> max(n-7, 0) grams before dedup; identical texts agree
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i"), (2, "a b c d e f g h i"), (3, "a b c"), (4, "")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.g
        for r in df.select(
            "doc_id", decontam.gram8_codes(T.tokens_col(F.col("text"))).alias("g")
        ).collect()
    }
    assert len(out[1]) == 2  # 9 tokens -> 2 8-grams
    assert out[1] == out[2]
    assert out[3] == [] and out[4] == []
    # an 8-gram appearing in two different docs yields the same code
    df2 = spark.createDataFrame(
        [(5, "x a b c d e f g h"), (6, "a b c d e f g h y")],
        "doc_id long, text string",
    )
    o = {
        r.doc_id: set(r.g)
        for r in df2.select(
            "doc_id", decontam.gram8_codes(T.tokens_col(F.col("text"))).alias("g")
        ).collect()
    }
    assert o[5] & o[6], "shared 8-gram 'a..h' must produce a shared code"
