"""Prefix-filter set-similarity join: the scale claims behind the
oracle gate (which already proves result == brute force).

- candidate volume: joining on the rarest-first PREFIX must generate
  strictly fewer candidate rows than the all-token equi-join;
- the prefix never contains the globally hottest token unless a set
  is too small to avoid it (the skew-avoidance property).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mvrs_dspa_spark.functions import text as T
from mvrs_dspa_spark.tables import table

SF = "/root/testdata/sf0.01"


def _tok_rows(spark):
    d = table(spark, SF, "documents")
    return d.select(
        "doc_id",
        F.explode(F.array_distinct(T.tokens_col(F.col("text")))).alias(
            "token"
        ),
    )


def _prefix_rows(spark):
    tok_rows = _tok_rows(spark)
    df_tok = tok_rows.groupBy("token").agg(F.count(F.lit(1)).alias("tdf"))
    return (
        tok_rows.join(df_tok, "token")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("tdf", "token"))),
                lambda x: x["token"],
            ).alias("s")
        )
        .withColumn("n", F.size("s"))
        .where(F.col("n") > 0)
        .withColumn("p", F.col("n") - F.expr("(3*n + 4) div 5") + 1)
        .select(
            "doc_id",
            F.explode(F.slice("s", F.lit(1), F.col("p"))).alias("token"),
        )
    )


def _pair_count(rows):
    a, b = rows.alias("a"), rows.alias("b")
    return a.join(
        b,
        (F.col("a.token") == F.col("b.token"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).count()


def test_prefix_candidates_fewer_than_all_token_candidates(spark):
    full = _pair_count(_tok_rows(spark))
    pref = _pair_count(_prefix_rows(spark))
    assert pref < full, (pref, full)
    # at tau=0.6 the prefix is ~40% of each set; candidate rows scale
    # ~quadratically with the per-token key volume on the joined keys,
    # so demand a material (not marginal) reduction
    assert pref < 0.5 * full, (pref, full)


def test_prefix_avoids_global_hottest_token(spark):
    tok_rows = _tok_rows(spark)
    hottest = (
        tok_rows.groupBy("token")
        .count()
        .orderBy(F.desc("count"), "token")
        .first()["token"]
    )
    pref = _prefix_rows(spark)
    n_docs = tok_rows.select("doc_id").distinct().count()
    hot_in_prefix = pref.where(F.col("token") == hottest).count()
    # the hottest token sits at the BACK of the rarest-first order;
    # it only enters a prefix when a set is so small the prefix spans
    # most of it — that must be the exception, not the rule
    assert hot_in_prefix < 0.2 * n_docs, (hot_in_prefix, n_docs)
