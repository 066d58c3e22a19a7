"""Text retrieval operators over the `documents` table (SURVEY §2f).

A training-data pipeline needs lexical retrieval twice: BM25 scoring
to pull benchmark-adjacent documents for decontamination-by-retrieval
(the complement of the 8-gram exact pass in decontam.py), and tf-idf
keyword extraction for corpus inspection / topic tagging. Both are
classic inverted-index computations re-expressed as DataFrame plans:
tokenize → explode → aggregate postings; no index structure is
materialized because the postings "index" IS the intermediate
(doc, term, tf) relation.

Scale posture (100 TB): one scan of `documents` feeds both the tf and
df aggregates; document-frequency tables are vocabulary-sized (≪ data,
Zipf-headed), so the tf⋈df join is a vocabulary join — AQE's skew-join
split handles the stopword head, and the only forced broadcast is the
1-row corpus-stats scalar. BM25 additionally filters tokens to the
query terms BEFORE the explode, so the exploded relation is bounded by
|docs| × |query| rows, not corpus token count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mvrs_dspa_spark.functions import text as T
from mvrs_dspa_spark.plans.registry import register
from mvrs_dspa_spark.tables import table

# Okapi BM25 constants (Robertson & Zaragoza 2009, the standard
# defaults used by Lucene/Elasticsearch).
BM25_K1 = 1.2
BM25_B = 0.75

# Pinned query for the registered gate (mid-frequency vocabulary terms
# in the synthetic corpus); the operator itself takes any term list.
GATE_QUERY_TERMS = ("spark", "stream", "merge", "vector")

TOP_N = 20


def bm25_search(
    spark: SparkSession,
    sf_dir: str,
    terms: tuple[str, ...] = GATE_QUERY_TERMS,
    top_n: int = TOP_N,
) -> DataFrame:
    """Okapi BM25 top-N over whitespace tokens (lowercased).

    Plan: scan → per-doc length, filter tokens to the query terms
    BEFORE exploding (bounded explode) → tf per (doc, term) → df per
    term (|terms| rows, broadcast) → score → global top-N. Ordering is
    on the ROUNDED score with doc_id tiebreak so the selected set is
    engine-deterministic.
    """
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", T.tokens_col(F.lower(F.col("text"))).alias("toks")
    )
    dl = docs.select("doc_id", "toks", F.size("toks").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    term_arr = F.array(*[F.lit(t) for t in terms])
    tf = (
        dl.select(
            "doc_id",
            "dl",
            F.explode(
                F.filter(F.col("toks"), lambda t: F.array_contains(term_arr, t))
            ).alias("tok"),
        )
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # df has ≤ |terms| rows (constant in the data size): broadcast is
    # structurally bounded, not a scale hazard.
    scored = tf.join(F.broadcast(df), "tok").crossJoin(F.broadcast(stats))
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (
        F.col("tf")
        * (BM25_K1 + 1.0)
        / (
            F.col("tf")
            + BM25_K1
            * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.round(F.sum(idf * tf_part), 4).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(top_n)
    )


_TERMS_IN = ", ".join(f"'{t}'" for t in GATE_QUERY_TERMS)


@register(
    "bm25_search",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, {T.tokens_sql('lower(text)')} AS toks
            FROM documents
        ),
        dl AS (SELECT doc_id, toks, len(toks) AS dl FROM d),
        stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
        tf AS (
            SELECT doc_id, dl, tok, COUNT(*) AS tf
            FROM (
                SELECT doc_id, dl,
                       unnest(list_filter(toks, t -> t IN ({_TERMS_IN}))) AS tok
                FROM dl
            )
            GROUP BY doc_id, dl, tok
        ),
        df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_terms_matched,
               ROUND(SUM(
                   ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * ({BM25_K1} + 1.0)
                   / (tf.tf + {BM25_K1}
                      * (1.0 - {BM25_B} + {BM25_B} * tf.dl / s.avgdl))
               ), 4) AS bm25
        FROM tf JOIN df USING (tok) CROSS JOIN stats s
        GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id
        LIMIT {TOP_N}
    """,
    doc="Okapi BM25 top-20 for a pinned query (k1=1.2, b=0.75): "
    "filter-before-explode bounded postings, vocabulary-sized df "
    "broadcast, 1-row stats broadcast. Retrieval complement of the "
    "exact 8-gram decontamination pass.",
    tags=("text", "retrieval", "llm"),
)
def bm25_search_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_search(spark, sf_dir)


TFIDF_TOP_K = 3


@register(
    "tfidf_top_terms",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, {T.tokens_sql('lower(text)')} AS toks
            FROM documents
        ),
        stats AS (SELECT COUNT(*) AS n_docs FROM d),
        tf AS (
            SELECT doc_id, tok, COUNT(*) AS tf
            FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
            GROUP BY doc_id, tok
        ),
        df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        w AS (
            SELECT doc_id, tok,
                   CAST(tf AS BIGINT) AS tf,
                   ROUND(tf * ln(1.0 * s.n_docs / df.df), 6) AS tfidf
            FROM tf JOIN df USING (tok) CROSS JOIN stats s
        )
        SELECT doc_id, tok AS term, tf, tfidf,
               CAST(rnk AS INTEGER) AS rnk
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, tok
            ) AS rnk
            FROM w
        )
        WHERE rnk <= {TFIDF_TOP_K}
        ORDER BY doc_id, rnk
    """,
    doc="Per-document top-3 tf-idf terms (keyword extraction): one "
    "token explode feeds tf and the vocabulary-sized df; idf join is "
    "a vocabulary join (AQE skew-split on the Zipf head), rank is a "
    "per-doc window over rounded weights with term tiebreak.",
    tags=("text", "retrieval", "llm"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", T.tokens_col(F.lower(F.col("text"))).alias("toks")
    )
    stats = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = (
        docs.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.col("tok").alias("term"),
            "tf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    rank_w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        w.withColumn("rnk", F.row_number().over(rank_w))
        .where(F.col("rnk") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tf", "tfidf", "rnk")
        .orderBy("doc_id", "rnk")
    )


COVERAGE_TOP_K = 25


@register(
    "token_coverage_curve",
    oracle=f"""
        WITH counts AS (
            SELECT tok, COUNT(*) AS n
            FROM (
                SELECT unnest({T.tokens_sql('lower(text)')}) AS tok
                FROM documents
            )
            GROUP BY tok
        ),
        tot AS (SELECT SUM(n) AS total FROM counts),
        ranked AS (
            SELECT tok, n,
                   CAST(row_number() OVER (ORDER BY n DESC, tok) AS INTEGER)
                       AS rank
            FROM counts
        )
        SELECT rank, tok, CAST(n AS BIGINT) AS n,
               ROUND(1.0 * SUM(n) OVER (
                   ORDER BY rank
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) / t.total, 6) AS cum_share
        FROM ranked CROSS JOIN tot t
        WHERE rank <= {COVERAGE_TOP_K}
        ORDER BY rank
    """,
    doc="Zipf coverage curve: cumulative corpus share of the top-K "
    "vocabulary tokens — the 'how big must the tokenizer vocab be' "
    "diagnostic. One token shuffle to vocabulary-sized counts; the "
    "rank window and running sum operate on the aggregated vocab "
    "only (bounded), with the corpus total a 1-row broadcast.",
    tags=("text", "retrieval", "llm"),
)
def token_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = (
        table(spark, sf_dir, "documents")
        .select(
            F.explode(T.tokens_col(F.lower(F.col("text")))).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = counts.agg(F.sum("n").alias("total"))
    ranked = counts.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("n"), "tok"))
    ).where(F.col("rank") <= COVERAGE_TOP_K)
    cum = (
        F.sum("n")
        .over(Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            "rank",
            "tok",
            "n",
            F.round(cum / F.col("total"), 6).alias("cum_share"),
        )
        .orderBy("rank")
    )
