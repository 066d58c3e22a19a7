"""Cross-modal dedup agreement (SURVEY §2f): how the text-side
MinHash near-dup pair set and the embedding-cosine near-dup pair set
agree — the calibration report a pipeline owner reads before choosing
thresholds or trusting one modality alone (doc_id and vec_id share an
id space in the synthetic corpus).

Composes the two REGISTERED definitions on both engines: the Spark
side calls the registered query functions, the oracle embeds the
registered oracle texts as CTEs — so this report is definitionally in
sync with the queries it evaluates.

Scale: both inputs are already-bounded near-dup PAIR sets (linear in
true duplicates, not corpus size); the full outer join and the
3-group aggregate are negligible next to producing them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# importing registers the composed queries' dependencies first
from mvrs_dspa_spark.operators import ann as _ann  # noqa: F401
from mvrs_dspa_spark.operators import dedup as _dedup  # noqa: F401
from mvrs_dspa_spark.operators.ann import embedding_near_dup
from mvrs_dspa_spark.operators.dedup import dedup_minhash_lsh
from mvrs_dspa_spark.plans.registry import _REGISTRY, register

_TEXT_SQL = _REGISTRY["dedup_minhash_lsh"].oracle
_EMB_SQL = _REGISTRY["embedding_near_dup"].oracle


@register(
    "dedup_modality_agreement",
    oracle=f"""
        WITH t AS ({_TEXT_SQL}),
        e AS ({_EMB_SQL}),
        j AS (
            SELECT COALESCE(t.doc_a, e.vec_a) AS id_a,
                   COALESCE(t.doc_b, e.vec_b) AS id_b,
                   t.est_sim, e.cos_sim
            FROM t FULL JOIN e
              ON t.doc_a = e.vec_a AND t.doc_b = e.vec_b
        )
        SELECT CASE WHEN est_sim IS NOT NULL AND cos_sim IS NOT NULL
                        THEN 'both'
                    WHEN est_sim IS NOT NULL THEN 'text_only'
                    ELSE 'embedding_only' END AS verdict,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND(AVG(est_sim), 6) AS avg_text_sim,
               ROUND(AVG(cos_sim), 6) AS avg_cos_sim
        FROM j
        GROUP BY 1
        ORDER BY verdict
    """,
    doc="Agreement matrix between MinHash text near-dups and "
    "embedding-cosine near-dups: pairs found by both, text only, or "
    "embeddings only, with mean similarity per cell. Composed from "
    "the registered definitions on BOTH engines.",
    tags=("dedup", "ann", "llm"),
)
def dedup_modality_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b", "est_sim")
    e = embedding_near_dup(spark, sf_dir).select("vec_a", "vec_b", "cos_sim")
    j = t.join(
        e,
        (t["doc_a"] == e["vec_a"]) & (t["doc_b"] == e["vec_b"]),
        "full_outer",
    )
    verdict = (
        F.when(
            F.col("est_sim").isNotNull() & F.col("cos_sim").isNotNull(),
            F.lit("both"),
        )
        .when(F.col("est_sim").isNotNull(), F.lit("text_only"))
        .otherwise(F.lit("embedding_only"))
    )
    return (
        j.select(verdict.alias("verdict"), "est_sim", "cos_sim")
        .groupBy("verdict")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("est_sim"), 6).alias("avg_text_sim"),
            F.round(F.avg("cos_sim"), 6).alias("avg_cos_sim"),
        )
        .orderBy("verdict")
    )


from mvrs_dspa_spark.operators.similarity import (  # noqa: E402
    similar_users_jaccard,
    similar_users_minhash_lsh,
)

_JAC_SQL = _REGISTRY["similar_users_jaccard"].oracle
_MH_SQL = _REGISTRY["similar_users_minhash_lsh"].oracle


@register(
    "recommendation_agreement",
    oracle=f"""
        WITH jac AS ({_JAC_SQL}),
        mh AS ({_MH_SQL}),
        j AS (
            SELECT COALESCE(jac.user_id, mh.user_id) AS user_id,
                   jac.similarity, mh.est_sim
            FROM jac FULL JOIN mh
              ON jac.user_id = mh.user_id
             AND jac.rec_user_id = mh.rec_user_id
        )
        SELECT user_id,
               CAST(COUNT(similarity) AS BIGINT) AS n_exact,
               CAST(COUNT(est_sim) AS BIGINT) AS n_approx,
               CAST(COUNT(CASE WHEN similarity IS NOT NULL
                                AND est_sim IS NOT NULL THEN 1 END)
                    AS BIGINT) AS n_both,
               CASE WHEN COUNT(similarity) > 0
                    THEN ROUND(1.0 * COUNT(CASE WHEN similarity IS NOT NULL
                                 AND est_sim IS NOT NULL THEN 1 END)
                               / COUNT(similarity), 4)
               END AS exact_overlap
        FROM j
        GROUP BY user_id
        ORDER BY user_id
    """,
    doc="Exact-vs-approximate recommender agreement: per user, top-N "
    "sets from exact Jaccard and MinHash+LSH, their intersection, and "
    "the overlap fraction of the exact set the approximation retains. "
    "Differences also surface the PIPELINE asymmetry (the exact path "
    "applies known-pair and active-user filters the LSH path does "
    "not) — which is the point of publishing the report. Composed "
    "from the registered definitions on BOTH engines.",
    tags=("similarity", "llm"),
)
def recommendation_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    j = similar_users_jaccard(spark, sf_dir).select(
        "user_id", "rec_user_id", "similarity"
    )
    m = similar_users_minhash_lsh(spark, sf_dir).select(
        "user_id", "rec_user_id", "est_sim"
    )
    joined = j.join(m, ["user_id", "rec_user_id"], "full_outer")
    n_both = F.count(
        F.when(
            F.col("similarity").isNotNull() & F.col("est_sim").isNotNull(), 1
        )
    )
    n_exact = F.count("similarity")
    return (
        joined.groupBy("user_id")
        .agg(
            n_exact.alias("n_exact"),
            F.count("est_sim").alias("n_approx"),
            n_both.alias("n_both"),
            F.when(
                n_exact > 0, F.round(n_both.cast("double") / n_exact, 4)
            ).alias("exact_overlap"),
        )
        .orderBy("user_id")
    )


_DEDUP_SQL = _REGISTRY["dedup_minhash_lsh"].oracle


@register(
    "cross_source_dup_matrix",
    oracle=f"""
        WITH pairs AS ({_DEDUP_SQL})
        SELECT LEAST(da.source, db.source) AS source_a,
               GREATEST(da.source, db.source) AS source_b,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND(AVG(p.est_sim), 6) AS avg_sim
        FROM pairs p
        JOIN documents da ON da.doc_id = p.doc_a
        JOIN documents db ON db.doc_id = p.doc_b
        GROUP BY 1, 2
        ORDER BY source_a, source_b
    """,
    doc="Cross-source duplication matrix: near-dup pair counts per "
    "unordered source pair (the provenance report behind 'how much "
    "of source X is already in source Y' decisions when assembling a "
    "corpus from overlapping crawls). Composes the registered "
    "MinHash pair set; the doc->source joins are dimension lookups "
    "on the bounded pair list, and sources are LEAST/GREATEST-"
    "canonicalized so the matrix is unordered on both engines.",
    tags=("dedup", "llm"),
)
def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mvrs_dspa_spark.tables import table

    pairs = dedup_minhash_lsh(spark, sf_dir).select(
        "doc_a", "doc_b", "est_sim"
    )
    src = table(spark, sf_dir, "documents").select("doc_id", "source")
    joined = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")
            ),
            "doc_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")
            ),
            "doc_b",
        )
    )
    return (
        joined.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            "est_sim",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("est_sim"), 6).alias("avg_sim"),
        )
        .orderBy("source_a", "source_b")
    )


# --- dedup method evaluation ------------------------------------------------


def _exact_pairs_sql(tau: float) -> str:
    from mvrs_dspa_spark.operators.dedup import _DOC_SHINGLE_ITEMS_SQL

    return f"""
        SELECT doc_a, doc_b FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   COUNT(*) AS k,
                   MIN(a.n) AS na, MIN(b.n) AS nb
            FROM (SELECT i.doc_id, i.code, s.n
                  FROM ({_DOC_SHINGLE_ITEMS_SQL}) i
                  JOIN (SELECT doc_id, COUNT(*) AS n
                        FROM ({_DOC_SHINGLE_ITEMS_SQL}) GROUP BY 1) s
                    USING (doc_id)) a
            JOIN (SELECT i.doc_id, i.code, s.n
                  FROM ({_DOC_SHINGLE_ITEMS_SQL}) i
                  JOIN (SELECT doc_id, COUNT(*) AS n
                        FROM ({_DOC_SHINGLE_ITEMS_SQL}) GROUP BY 1) s
                    USING (doc_id)) b
              ON a.code = b.code AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        WHERE 1.0 * k / (na + nb - k) >= {tau}
    """


def _dedup_eval_oracle() -> str:
    from mvrs_dspa_spark.functions import minhash as MH
    from mvrs_dspa_spark.operators.dedup import (
        _SIG_SQL,
        BANDS,
        N_HASHES,
        NEAR_DUP_SIM,
    )

    mh_sql = f"""
        SELECT c.id_a AS doc_a, c.id_b AS doc_b
        FROM ({MH.candidate_pairs_sql(_SIG_SQL, "doc_id", N_HASHES, BANDS)}) c
        JOIN ({_SIG_SQL}) sa ON sa.doc_id = c.id_a
        JOIN ({_SIG_SQL}) sb ON sb.doc_id = c.id_b
        WHERE {MH.est_similarity_sql(N_HASHES)} >= {NEAR_DUP_SIM}
    """
    return f"""
        WITH mh AS ({mh_sql}),
        ex AS ({_exact_pairs_sql(NEAR_DUP_SIM)}),
        tp AS (SELECT COUNT(*) AS n FROM mh SEMI JOIN ex USING (doc_a, doc_b))
        SELECT (SELECT COUNT(*) FROM ex)::BIGINT AS n_exact,
               (SELECT COUNT(*) FROM mh)::BIGINT AS n_minhash,
               (SELECT n FROM tp)::BIGINT AS n_true_positive,
               ROUND((SELECT n FROM tp)
                     / NULLIF((SELECT COUNT(*) FROM mh), 0)::DOUBLE, 6)
                   AS precision,
               ROUND((SELECT n FROM tp)
                     / NULLIF((SELECT COUNT(*) FROM ex), 0)::DOUBLE, 6)
                   AS recall
    """


@register(
    "dedup_method_eval",
    oracle=_dedup_eval_oracle(),
    doc="Dedup-method evaluation: precision/recall of the production "
    "MinHash+LSH pipeline against the EXACT shingle-Jaccard ground "
    "truth at the same 0.5 threshold — the decision-ready summary the "
    "per-decile minhash_calibration feeds ('is the approximate path "
    "good enough to replace the exact one on this corpus?'). Both "
    "sides' definitions are the already-oracle-proven engine-portable "
    "constructions, so even an EVALUATION OF AN APPROXIMATION "
    "hash-matches across engines. Ground-truth pair volume is the "
    "exact inverted-index join (bounded like ngram_jaccard_pairs); "
    "the MinHash side is the banded candidate join. Cost is by "
    "construction the SUM of both pipelines — at 100 TB this eval "
    "runs on a deterministic doc-hash sample (doc_id %% K), which "
    "preserves unbiased precision/recall; the full-corpus form here "
    "is what the oracle can verify exactly. The CPU-bound shingle "
    "scan (tokenize + per-pair md5, the dominant stage) is computed "
    "ONCE and checkpointed; both pipelines read the materialized "
    "shingles instead of re-scanning the corpus.",
    tags=("dedup", "validation", "llm"),
)
def dedup_method_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mvrs_dspa_spark.operators.dedup import (
        NEAR_DUP_SIM,
        _doc_shingles,
        jaccard_pairs_from_shingles,
        minhash_pairs_from_shingles,
    )

    # one shingle scan feeds BOTH pipelines (lazy localCheckpoint: the
    # first consumer materializes it in-job, the second reads the
    # materialized partitions — same idiom as the triangle query's
    # edge list; interleaved A/B at sf0.1: plain 4.0 s / eager 3.5 s /
    # lazy 3.0 s, vs 4.4 s for the former two-full-pipeline form)
    sh = (
        _doc_shingles(spark, sf_dir)
        .where(F.size("sh") > 0)
        .localCheckpoint(eager=False)
    )
    # each pair list feeds TWO consumers (its own count and the
    # true-positive semi-join), so materialize the small pair frames
    # once instead of running each full pipeline twice (r11)
    mh = (
        minhash_pairs_from_shingles(sh)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)
    )
    # exact ground truth at the SAME threshold the minhash path targets
    ex = (
        jaccard_pairs_from_shingles(sh, threshold=NEAR_DUP_SIM)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)
    )
    tp = mh.join(ex, ["doc_a", "doc_b"], "left_semi")
    n_ex = ex.agg(F.count(F.lit(1)).alias("n_exact"))
    n_mh = mh.agg(F.count(F.lit(1)).alias("n_minhash"))
    n_tp = tp.agg(F.count(F.lit(1)).alias("n_true_positive"))
    return (
        n_ex.crossJoin(F.broadcast(n_mh))
        .crossJoin(F.broadcast(n_tp))
        .select(
            "n_exact",
            "n_minhash",
            "n_true_positive",
            F.round(
                F.col("n_true_positive")
                / F.nullif(F.col("n_minhash"), F.lit(0)).cast("double"),
                6,
            ).alias("precision"),
            F.round(
                F.col("n_true_positive")
                / F.nullif(F.col("n_exact"), F.lit(0)).cast("double"),
                6,
            ).alias("recall"),
        )
    )
