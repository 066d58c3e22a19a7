"""PII scrubbing + repetition metrics (the corpus is PII-free word
soup, so masking semantics are proven on synthetic rows here; the
registered queries prove oracle parity on the real tables)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mvrs_dspa_spark.operators import cleaning


def test_pii_masking_semantics(spark):
    rows = [
        (1, "contact bob.smith+spam@ex-ample.co.uk or jane@x.io today"),
        (2, "server at 10.0.255.3 answered"),
        (3, "call +41 79 123 45 67 or (044) 555-1234 now"),
        (4, "email me@site.org from 192.168.0.1 tel 0791234567"),
        (5, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.clean
        for r in df.select(
            "doc_id", cleaning.scrub_text(F.col("text")).alias("clean")
        ).collect()
    }
    assert got[1] == "contact <EMAIL> or <EMAIL> today"
    assert got[2] == "server at <IP> answered"
    assert got[3] == "call <PHONE> or <PHONE> now"
    assert got[4] == "email <EMAIL> from <IP> tel <PHONE>"
    assert got[5] == "nothing sensitive here"


def test_pii_counts_match_duckdb_on_synthetic(spark, tmp_path):
    # same expressions, both engines, over data that actually contains PII
    import duckdb

    rows = [
        (1, "a@b.co and c@d.org"),
        (2, "ip 8.8.8.8 phone 0041791234567"),
        (3, "plain text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pq = str(tmp_path / "pii.parquet")
    df.coalesce(1).write.parquet(pq)

    spark_rows = sorted(
        tuple(r)
        for r in df.select(
            "doc_id",
            cleaning.scrub_text(F.col("text")).alias("clean_text"),
            *[
                F.regexp_count(F.col("text"), F.lit(p)).alias(f"n_{n}")
                for n, p, _ in cleaning.PII_PATTERNS
            ],
        ).collect()
    )
    sql = f"""
        SELECT doc_id, {cleaning._scrub_sql('text')} AS clean_text,
               {', '.join(
                   f"CAST(len(regexp_extract_all(text, '{p}')) AS BIGINT) AS n_{n}"
                   for n, p, _ in cleaning.PII_PATTERNS)}
        FROM read_parquet('{pq}/*.parquet') ORDER BY doc_id
    """
    duck_rows = sorted(tuple(r) for r in duckdb.sql(sql).fetchall())
    assert spark_rows == duck_rows


def test_repetition_metrics(spark):
    rows = [
        (1, "spam spam spam spam"),          # one word repeated
        (2, "a b c d"),                      # all distinct
        (3, "x y x y x y"),                  # repeated bigrams
        (4, "solo"),                         # single token: no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("documents")
    # reuse the registered op's internals through a local table() stand-in
    from mvrs_dspa_spark.functions import text as T

    toks = df.select("doc_id", T.tokens_col(F.col("text")).alias("toks"))
    n = F.greatest(F.size("toks") - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice("toks", F.lit(1), n),
        F.slice("toks", F.lit(2), n),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    got = {
        r.doc_id: round(r.ratio, 6)
        for r in toks.select(
            "doc_id",
            F.when(F.size("toks") < 2, F.lit(0.0))
            .otherwise(
                1.0
                - F.size(F.array_distinct(bigrams)).cast("double")
                / (F.size("toks") - 1)
            )
            .alias("ratio"),
        ).collect()
    }
    assert got[1] == round(1 - 1 / 3, 6)  # 3 bigrams, 1 distinct
    assert got[2] == 0.0
    assert got[3] == round(1 - 2 / 5, 6)  # 5 bigrams, 2 distinct
    assert got[4] == 0.0
