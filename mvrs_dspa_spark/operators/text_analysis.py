"""Text-analysis operators over the `documents` table (SURVEY §2d #21,
§2f #37-40).

`text_features` reproduces the reference's clustering feature vector
exactly (`jobs/clustering/UnusualActivityDetectionJob.scala:421-438`):
10 × distinct-token ratio, ALL-CAPS-token ratio, four-letter-token
ratio. The rest are the LLM-pipeline text ops: language-ID by
stopword voting, quality scoring, token counting, fingerprinting.

All are single-pass narrow plans: scan → project (whole-stage
codegen, no shuffle except final sort) — at 100 TB these are
embarrassingly parallel and bounded by parquet scan throughput.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mvrs_dspa_spark.functions import hashing as H
from mvrs_dspa_spark.functions import text as T
from mvrs_dspa_spark.plans.registry import register
from mvrs_dspa_spark.tables import table

_FP_A, _FP_B = H.hash_params(1, seed=7)[0]


def _toks(df: DataFrame) -> DataFrame:
    return df.select("doc_id", "text", T.tokens_col(F.col("text")).alias("toks"))


@register(
    "text_features",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {T.tokens_sql('text')} AS toks FROM documents
        )
        SELECT doc_id,
               CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE ROUND(10.0 * len(list_distinct(list_transform(toks, x -> lower(x)))) / len(toks), 6)
               END AS f_distinct_ratio,
               CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE ROUND(1.0 * len(list_filter(toks, x -> regexp_matches(x, '^[A-Z]+$'))) / len(toks), 6)
               END AS f_upper_ratio,
               CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE ROUND(1.0 * len(list_filter(toks, x -> length(x) = 4)) / len(toks), 6)
               END AS f_fourletter_ratio
        FROM t
        ORDER BY doc_id
    """,
    doc="Reference clustering text features "
    "(UnusualActivityDetectionJob.scala:421): distinct/upper/4-letter ratios.",
    tags=("text",),
)
def text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _toks(table(spark, sf_dir, "documents"))
    n = F.size("toks").cast("double")

    def ratio(num: Column) -> Column:
        return F.when(F.size("toks") == 0, F.lit(0.0)).otherwise(
            F.round(num.cast("double") / n, 6)
        )

    return t.select(
        "doc_id",
        ratio(
            10 * F.size(F.array_distinct(F.transform(F.col("toks"), F.lower)))
        ).alias("f_distinct_ratio"),
        ratio(F.size(F.filter(F.col("toks"), lambda x: x.rlike("^[A-Z]+$")))).alias(
            "f_upper_ratio"
        ),
        ratio(F.size(F.filter(F.col("toks"), lambda x: F.length(x) == 4))).alias(
            "f_fourletter_ratio"
        ),
    ).orderBy("doc_id")


def _lang_pred_sql() -> str:
    conds = []
    for lang in T.LANG_ORDER:
        others = [o for o in T.LANG_ORDER if o != lang]
        cond = " AND ".join(f"s_{lang} >= s_{o}" for o in others)
        conds.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(conds) + " ELSE 'und' END"


_LANG_ID_ORACLE = f"""
        WITH t AS (
            SELECT doc_id, lang, {T.tokens_sql('text')} AS toks FROM documents
        ),
        scored AS (
            SELECT doc_id, lang,
                   {', '.join(f"{T.stopword_hits_sql('toks', lg)} AS s_{lg}" for lg in T.LANG_ORDER)}
            FROM t
        )
        SELECT doc_id, lang,
               {_lang_pred_sql()} AS pred_lang,
               {' + '.join(f's_{lg}' for lg in T.LANG_ORDER)} AS n_stopword_hits
        FROM scored
        ORDER BY doc_id
"""


@register(
    "lang_id",
    oracle=_LANG_ID_ORACLE,
    doc="Language-ID heuristic: per-language stopword vote, "
    "deterministic argmax (priority " + ">".join(T.LANG_ORDER) + ").",
    tags=("text",),
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", T.tokens_col(F.col("text")).alias("toks")
    )
    scored = t.select(
        "doc_id",
        "lang",
        *[
            T.stopword_hits_col(F.col("toks"), lg).alias(f"s_{lg}")
            for lg in T.LANG_ORDER
        ],
    )
    pred: Column = F.lit("und")
    # build the CASE chain back-to-front so priority order matches SQL
    for lang in reversed(T.LANG_ORDER):
        cond = None
        for other in T.LANG_ORDER:
            if other == lang:
                continue
            c = F.col(f"s_{lang}") >= F.col(f"s_{other}")
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    total = None
    for lg in T.LANG_ORDER:
        total = F.col(f"s_{lg}") if total is None else total + F.col(f"s_{lg}")
    return scored.select(
        "doc_id", "lang", pred.alias("pred_lang"), total.alias("n_stopword_hits")
    ).orderBy("doc_id")


# Shared metric CTEs (t -> tokens, m -> raw ratio metrics): one
# definition feeds both the doc_quality report and the percentile
# filter, so the filter's keep/drop decisions are gated on exactly the
# score the report publishes.
_QUALITY_CTES = f"""
        t AS (
            SELECT doc_id, lang, text, {T.tokens_sql('text')} AS toks
            FROM documents
        ),
        m AS (
            SELECT doc_id, lang,
                   length(text) AS n_chars,
                   len(toks) AS n_tokens,
                   CASE WHEN len(toks) = 0 THEN 0.0
                        ELSE 1.0 * list_sum(list_transform(toks, x -> length(x))) / len(toks) END AS avg_token_len,
                   CASE WHEN len(toks) = 0 THEN 0.0
                        ELSE 1.0 * {T.stopword_hits_sql('toks', 'en')} / len(toks) END AS stopword_ratio,
                   CASE WHEN length(text) = 0 THEN 0.0
                        ELSE 1.0 * length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / length(text) END AS alpha_ratio
            FROM t
        )
"""

_QUALITY_SCORE_SQL = """ROUND(0.5 * stopword_ratio + 0.3 * alpha_ratio
                     + 0.2 * (CASE WHEN n_tokens < 100 THEN n_tokens ELSE 100 END) / 100.0, 6)"""


def _quality_metrics(df: DataFrame, extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Raw (unrounded) quality metrics per doc; Spark twin of the
    ``m`` CTE in :data:`_QUALITY_CTES`. ``extra_cols`` ride along
    unchanged (e.g. ``ts`` for the streaming curation job)."""
    t = df.select(
        "doc_id", "lang", "text", *extra_cols,
        T.tokens_col(F.col("text")).alias("toks"),
    )
    n_tokens = F.size("toks")
    tok_len_sum = F.aggregate(
        F.transform(F.col("toks"), F.length),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    avg_token_len = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        tok_len_sum.cast("double") / n_tokens
    )
    stopword_ratio = F.when(n_tokens == 0, F.lit(0.0)).otherwise(
        T.stopword_hits_col(F.col("toks"), "en").cast("double") / n_tokens
    )
    n_chars = F.length("text")
    alpha_ratio = F.when(n_chars == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("double") / n_chars
    )
    return t.select(
        "doc_id",
        "lang",
        *extra_cols,
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        avg_token_len.alias("_atl"),
        stopword_ratio.alias("_sr"),
        alpha_ratio.alias("_ar"),
    )


def _quality_score_col() -> Column:
    return F.round(
        0.5 * F.col("_sr")
        + 0.3 * F.col("_ar")
        + 0.2 * F.least(F.col("n_tokens"), F.lit(100)) / 100.0,
        6,
    )


@register(
    "doc_quality",
    oracle=f"""
        WITH {_QUALITY_CTES}
        SELECT doc_id, n_chars, n_tokens,
               ROUND(avg_token_len, 6) AS avg_token_len,
               ROUND(stopword_ratio, 6) AS stopword_ratio,
               ROUND(alpha_ratio, 6) AS alpha_ratio,
               {_QUALITY_SCORE_SQL} AS quality_score
        FROM m
        ORDER BY doc_id
    """,
    doc="Quality scoring: length/stopword/alpha ratios + rational "
    "composite score (no transcendentals: cross-engine exact).",
    tags=("text",),
)
def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _quality_metrics(table(spark, sf_dir, "documents"))
        .select(
            "doc_id",
            "n_chars",
            "n_tokens",
            F.round("_atl", 6).alias("avg_token_len"),
            F.round("_sr", 6).alias("stopword_ratio"),
            F.round("_ar", 6).alias("alpha_ratio"),
            _quality_score_col().alias("quality_score"),
        )
        .orderBy("doc_id")
    )


# Drop the lowest-quality fraction per language: per-stratum rather
# than global because quality scores aren't comparable across
# languages (the stopword list is per-language).
QUALITY_DROP_FRAC = 0.2


@register(
    "quality_percentile_filter",
    oracle=f"""
        WITH {_QUALITY_CTES},
        s AS (
            SELECT doc_id, lang, n_tokens,
                   {_QUALITY_SCORE_SQL} AS quality_score
            FROM m
        )
        SELECT doc_id, lang, quality_score, ROUND(q_rank, 6) AS q_rank
        FROM (
            SELECT *, PERCENT_RANK() OVER (
                PARTITION BY lang ORDER BY quality_score, doc_id
            ) AS q_rank
            FROM s
        )
        WHERE q_rank >= {QUALITY_DROP_FRAC}
        ORDER BY doc_id
    """,
    doc="Percentile quality gate: drop the bottom 20% of docs per "
    "language by the published quality_score (percent_rank over the "
    "rounded score, doc_id tiebreak, so the kept set is deterministic "
    "and engine-identical). One shuffle on lang; strata are few, so "
    "the window never concentrates more than one language per task.",
    tags=("text", "sampling", "llm"),
)
def quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _quality_metrics(table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "n_tokens", "_sr", "_ar"
    )
    w = Window.partitionBy("lang").orderBy("quality_score", "doc_id")
    return (
        s.select("doc_id", "lang", _quality_score_col().alias("quality_score"))
        .withColumn("q_rank", F.percent_rank().over(w))
        .where(F.col("q_rank") >= QUALITY_DROP_FRAC)
        .select("doc_id", "lang", "quality_score", F.round("q_rank", 6).alias("q_rank"))
        .orderBy("doc_id")
    )


@register(
    "token_counts",
    oracle=f"""
        SELECT doc_id,
               length(text) AS n_chars,
               len({T.tokens_sql('text')}) AS n_ws_tokens,
               len(regexp_extract_all(text, '{T.BPE_PATTERN}')) AS n_bpe_tokens
        FROM documents
        ORDER BY doc_id
    """,
    doc="Token counting: whitespace tokens + BPE-ish regex tokens.",
    tags=("text",),
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(T.tokens_col(F.col("text"))).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(T.BPE_PATTERN), 0)).alias(
            "n_bpe_tokens"
        ),
    ).orderBy("doc_id")


@register(
    "doc_fingerprint",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {T.tokens_sql('text')} AS toks FROM documents
        )
        SELECT doc_id,
               CAST(CASE WHEN len(toks) = 0 THEN 0
                    ELSE {T.fingerprint_sql('toks', _FP_A, _FP_B)} END
                    AS BIGINT) AS fingerprint
        FROM t
        ORDER BY doc_id
    """,
    doc="Order/multiplicity-insensitive document fingerprint "
    "(sum of affine token hashes mod P).",
    tags=("text",),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _toks(table(spark, sf_dir, "documents"))
    return t.select(
        "doc_id",
        F.when(F.size("toks") == 0, F.lit(0).cast("long"))
        .otherwise(T.fingerprint_col(F.col("toks"), _FP_A, _FP_B))
        .alias("fingerprint"),
    ).orderBy("doc_id")


@register(
    "doc_unigram_logprob",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({T.tokens_sql('lower(text)')}) AS tok
            FROM documents
        ),
        freq AS (SELECT tok, COUNT(*) AS n_w FROM toks GROUP BY tok),
        tot AS (SELECT SUM(n_w) AS n FROM freq)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               ROUND(AVG(-log2(1.0 * f.n_w / t.n)), 4) AS bits_per_token
        FROM toks JOIN freq f USING (tok) CROSS JOIN tot t
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    doc="CCNet-style perplexity proxy: per-document cross-entropy "
    "(bits/token) under the corpus's own unigram distribution — high "
    "bits/token flags rare-token gibberish, low flags boilerplate "
    "(Wenzek et al. 2020 use a KenLM 5-gram; the unigram variant is "
    "the SQL-expressible analog with the same pipeline role).",
    tags=("text", "llm"),
)
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One explode feeds BOTH the vocabulary aggregate and the scoring
    join; the frequency table is Zipf-headed, so at 100 TB the join
    skews on stopwords — AQE's skew-join split handles exactly this
    shape (one hot build row x many probe rows), and the vocabulary
    side never needs a forced broadcast. The 1-row total-token scalar
    is the only hinted broadcast (scale-safe)."""
    # tokenize ONCE (r11): the token arrays feed both the vocabulary
    # aggregate and the scoring join (3 documents scans before); the
    # vocab-bounded frequency table also materializes so the total and
    # the join read one build.
    t = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id", T.tokens_col(F.lower(F.col("text"))).alias("toks")
        )
        .localCheckpoint(eager=False)
    )
    toks = t.select("doc_id", F.explode("toks").alias("tok"))
    freq = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_w"))
        .localCheckpoint(eager=False)
    )
    tot = freq.agg(F.sum("n_w").alias("n"))
    bits = -F.log2(F.col("n_w").cast("double") / F.col("n"))
    return (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(bits), 4).alias("bits_per_token"),
        )
        .orderBy("doc_id")
    )


@register(
    "lang_id_confusion",
    oracle=f"""
        WITH pred AS ({_LANG_ID_ORACLE})
        SELECT lang, pred_lang,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(1.0 * COUNT(*)
                     / SUM(COUNT(*)) OVER (PARTITION BY lang), 6) AS recall,
               ROUND(1.0 * COUNT(*)
                     / SUM(COUNT(*)) OVER (PARTITION BY pred_lang), 6)
                   AS precision
        FROM pred
        GROUP BY lang, pred_lang
        ORDER BY lang, pred_lang
    """,
    doc="Language-ID evaluation: confusion matrix of predicted vs "
    "labeled language with per-cell recall (row-normalized) and "
    "precision (column-normalized) — the quality report a pipeline "
    "owner runs before trusting lang_id as a filter. Composes the "
    "registered lang_id definition on BOTH engines; normalizers are "
    "analytic sums over the aggregated cells (no second scan).",
    tags=("text", "llm"),
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    pred = lang_id(spark, sf_dir)
    cells = pred.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    by_lang = Window.partitionBy("lang")
    by_pred = Window.partitionBy("pred_lang")
    return (
        cells.select(
            "lang",
            "pred_lang",
            "n",
            F.round(F.col("n").cast("double") / F.sum("n").over(by_lang), 6).alias(
                "recall"
            ),
            F.round(
                F.col("n").cast("double") / F.sum("n").over(by_pred), 6
            ).alias("precision"),
        )
        .orderBy("lang", "pred_lang")
    )


# --- BPE merge-candidate statistics ----------------------------------------

BPE_TOP_PAIRS = 30


@register(
    "bpe_merge_pairs",
    oracle=f"""
        WITH toks AS (
            SELECT unnest({T.tokens_sql('text')}) AS w FROM documents
        ),
        vocab AS (SELECT w, COUNT(*) AS freq FROM toks GROUP BY w),
        pairs AS (
            SELECT unnest(
                       CASE WHEN len(w) < 2 THEN []::VARCHAR[]
                            ELSE list_transform(
                                generate_series(1, len(w) - 1),
                                i -> substr(w, i, 2))
                       END
                   ) AS pair,
                   freq
            FROM vocab
        )
        SELECT pair, CAST(SUM(freq) AS BIGINT) AS weighted_count
        FROM pairs
        GROUP BY pair
        ORDER BY weighted_count DESC, pair
        LIMIT {BPE_TOP_PAIRS}
    """,
    doc="First-round BPE merge candidates (tokenizer training, "
    "Sennrich et al. 2016 step 1): adjacent character-pair counts "
    "weighted by word frequency, top pairs = the merges BPE would "
    "make first. The corpus-sized work is ONE token aggregation to "
    "the vocabulary; pair explosion then runs on the vocabulary only "
    "(bounded by |vocab| * word length), the shape that lets "
    "tokenizer training run at 100 TB — char pairs via substr on "
    "both engines (split-on-empty-regex disagrees between them).",
    tags=("llm", "text"),
)
def bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    vocab = (
        d.select(F.explode(T.tokens_col(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    n = F.length("w") - 1
    pairs = F.when(
        F.length("w") < 2, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), n), lambda i: F.substring(F.col("w"), i, 2)
        )
    )
    return (
        vocab.select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("weighted_count"))
        .orderBy(F.desc("weighted_count"), "pair")
        .limit(BPE_TOP_PAIRS)
    )


# --- chunk-level language consistency (code-switch detection) ---------------

CS_CHUNK = 64  # disjoint sections (chunk == stride; no overlap)


@register(
    "code_switch_report",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {T.tokens_sql('text')} AS toks FROM documents
        ),
        chunks AS (
            SELECT doc_id, t[s : s + {CS_CHUNK} - 1] AS ctoks
            FROM (
                SELECT doc_id, toks AS t,
                       unnest(generate_series(1, len(toks), {CS_CHUNK}))
                           AS s
                FROM t WHERE len(toks) > 0
            )
        ),
        scored AS (
            SELECT doc_id,
                   {', '.join(f"{T.stopword_hits_sql('ctoks', lg)} AS s_{lg}" for lg in T.LANG_ORDER)}
            FROM chunks
        ),
        preds AS (
            SELECT doc_id, {_lang_pred_sql()} AS pred FROM scored
        ),
        counts AS (
            SELECT doc_id, pred, COUNT(*) AS c
            FROM preds GROUP BY doc_id, pred
        ),
        ranked AS (
            SELECT doc_id, pred, c,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY c DESC, pred
                   ) AS rk
            FROM counts
        ),
        per_doc AS (
            SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n_chunks,
                   CAST(COUNT(*) AS BIGINT) AS n_langs
            FROM counts GROUP BY doc_id
        )
        SELECT p.doc_id, p.n_chunks, p.n_langs,
               r.pred AS majority_lang,
               p.n_langs > 1 AS is_code_switched
        FROM per_doc p JOIN ranked r ON r.doc_id = p.doc_id AND r.rk = 1
        ORDER BY p.doc_id
    """,
    doc=f"Code-switching / mixed-language detection: every document is "
    f"language-identified SECTION by section (disjoint {CS_CHUNK}-token "
    "chunks, the chunking definition with stride=chunk) using the "
    "published lang_id stopword-vote argmax; a document whose chunks "
    "disagree is flagged. The doc-level filter every multilingual "
    "corpus pipeline needs on top of doc-level lang-ID — mixed "
    "documents pollute per-language training splits. Composes two "
    "registered definitions on both engines; chunk votes are narrow "
    "array expressions, the one shuffle is the per-doc rollup.",
    tags=("text", "llm"),
)
def code_switch_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    toks = d.select(
        "doc_id", T.tokens_col(F.col("text")).alias("t")
    ).where(F.size("t") > 0)
    chunks = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t"), F.lit(CS_CHUNK)),
                lambda s: F.slice(F.col("t"), s, CS_CHUNK),
            )
        ).alias("ctoks"),
    )
    scored = chunks.select(
        "doc_id",
        *[
            T.stopword_hits_col(F.col("ctoks"), lg).alias(f"s_{lg}")
            for lg in T.LANG_ORDER
        ],
    )
    pred: Column = F.lit("und")
    for lang in reversed(T.LANG_ORDER):
        cond = None
        for other in T.LANG_ORDER:
            if other == lang:
                continue
            c = F.col(f"s_{lang}") >= F.col(f"s_{other}")
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    counts = (
        scored.select("doc_id", pred.alias("pred"))
        .groupBy("doc_id", "pred")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("c"), "pred")
    )
    majority = (
        counts.withColumn("rk", rk)
        .where(F.col("rk") == 1)
        .select("doc_id", F.col("pred").alias("majority_lang"))
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_chunks"),
        F.count(F.lit(1)).alias("n_langs"),
    )
    return (
        per_doc.join(majority, "doc_id")
        .select(
            "doc_id",
            "n_chunks",
            "n_langs",
            "majority_lang",
            (F.col("n_langs") > 1).alias("is_code_switched"),
        )
        .orderBy("doc_id")
    )


# --- bigram LM quality proxy (stupid backoff) -------------------------------

BACKOFF_ALPHA = 0.4  # Brants et al. 2007 "stupid backoff" constant


@register(
    "doc_bigram_logprob",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {T.tokens_sql('lower(text)')} AS toks
            FROM documents
        ),
        pairs AS (
            SELECT doc_id,
                   toks[i] AS w1,
                   toks[i + 1] AS w2
            FROM (
                SELECT doc_id, toks,
                       unnest(generate_series(1, len(toks) - 1)) AS i
                FROM t WHERE len(toks) >= 2
            )
        ),
        uni AS (
            SELECT tok, COUNT(*) AS c FROM (
                SELECT unnest(toks) AS tok FROM t
            ) GROUP BY tok
        ),
        tot AS (SELECT SUM(c) AS n FROM uni),
        bi AS (
            SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2
        )
        SELECT p.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_scored,
               ROUND(AVG(-log2(
                   CASE WHEN b.c12 IS NOT NULL
                        THEN 1.0 * b.c12 / u1.c
                        ELSE {BACKOFF_ALPHA} * u2.c / t.n END
               )), 4) AS bits_per_token
        FROM pairs p
        LEFT JOIN bi b ON b.w1 = p.w1 AND b.w2 = p.w2
        JOIN uni u1 ON u1.tok = p.w1
        JOIN uni u2 ON u2.tok = p.w2
        CROSS JOIN tot t
        GROUP BY p.doc_id
        ORDER BY p.doc_id
    """,
    doc=f"Bigram-LM perplexity proxy with stupid backoff (Brants et "
    f"al. 2007, alpha={BACKOFF_ALPHA}): per-document bits/token under "
    "the corpus's own bigram model, backing off to the scaled unigram "
    "for unseen pairs — one step closer to the KenLM stage of the "
    "CCNet pipeline than the unigram proxy (#59), and the bigram "
    "count join is the genuinely n-gram-LM-shaped workload: the count "
    "table scales with the PAIR vocabulary, its Zipf head is exactly "
    "what AQE skew-split handles, and the backoff is a LEFT-join miss "
    "— no OOV special-casing. The 1-row token-total scalar is the "
    "only hinted broadcast.",
    tags=("text", "llm"),
)
def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tokenize ONCE (r11, the bigram_pmi idiom): before, the token
    # projection re-ran for each of its consumers (unigram counts, the
    # bigram count build, the scoring pass — 5 documents scans in the
    # before-plan). The materialized arrays feed three cheap explode
    # passes; the unigram and bigram count tables are vocabulary-
    # bounded and each feeds multiple joins, so they materialize too,
    # and the token total derives from the unigram table (sum of
    # counts == token count, exactly).
    t = (
        table(spark, sf_dir, "documents")
        .select(
            "doc_id", T.tokens_col(F.lower(F.col("text"))).alias("toks")
        )
        .localCheckpoint(eager=False)
    )
    n = F.greatest(F.size("toks") - 1, F.lit(0))
    pair_arr = F.zip_with(
        F.slice("toks", F.lit(1), n),
        F.slice("toks", F.lit(2), n),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    pairs = (
        t.where(F.size("toks") >= 2)
        .select("doc_id", F.explode(pair_arr).alias("p"))
        .select("doc_id", "p.w1", "p.w2")
    )
    uni = (
        t.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    tot = uni.agg(F.sum("c").alias("n"))
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))
    score = F.when(
        F.col("c12").isNotNull(),
        F.col("c12").cast("double") / F.col("c1"),
    ).otherwise(
        F.lit(BACKOFF_ALPHA) * F.col("c2") / F.col("n")
    )
    return (
        pairs.join(bi, ["w1", "w2"], "left")
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.round(F.avg(-F.log2(score)), 4).alias("bits_per_token"),
        )
        .orderBy("doc_id")
    )


# --- collocation extraction: adjacent-bigram PMI ----------------------------

PMI_MIN_COUNT = 5   # bigram support floor (Church & Hanks 1990 practice)
PMI_TOP = 50


@register(
    "bigram_pmi",
    oracle=f"""
        WITH toks AS (
            SELECT {T.tokens_sql('lower(text)')} AS toks FROM documents
        ),
        big AS (
            SELECT unnest(toks[1:len(toks) - 1]) AS w1,
                   unnest(toks[2:len(toks)]) AS w2
            FROM toks WHERE len(toks) >= 2
        ),
        uni AS (
            SELECT unnest(toks) AS tok FROM toks
        ),
        uc AS (SELECT tok, COUNT(*) AS c FROM uni GROUP BY tok),
        n_uni AS (SELECT COUNT(*) AS nu FROM uni),
        bc AS (
            SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY w1, w2
            HAVING COUNT(*) >= {PMI_MIN_COUNT}
        ),
        n_big AS (SELECT COUNT(*) AS nb FROM (SELECT * FROM big))
        SELECT b.w1, b.w2, CAST(b.c12 AS BIGINT) AS pair_count,
               ROUND(log2((b.c12::DOUBLE / nb)
                          / ((u1.c::DOUBLE / nu) * (u2.c::DOUBLE / nu))), 6)
                   AS pmi
        FROM bc b
        JOIN uc u1 ON b.w1 = u1.tok
        JOIN uc u2 ON b.w2 = u2.tok
        CROSS JOIN n_uni CROSS JOIN n_big
        ORDER BY pmi DESC, w1, w2
        LIMIT {PMI_TOP}
    """,
    doc="Adjacent-bigram pointwise mutual information (Church & Hanks "
    "1990 collocation extraction): PMI = log2(p(w1,w2)/(p(w1)p(w2))) "
    f"over consecutive token pairs with support >= {PMI_MIN_COUNT}, "
    f"top {PMI_TOP}. Scale posture: bigrams come from one LINEAR "
    "zip_with(slice, slice) pass (the dedup shingle pattern — never "
    "the O(tokens^2) element_at form); both count tables are "
    "vocabulary-bounded, and the support filter runs BEFORE the "
    "unigram joins so the Zipf tail never reaches the shuffle. The "
    "first step of phrase-vocabulary induction (word2vec phrases, "
    "tokenizer merge seeding).",
    tags=("text", "llm"),
)
def bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    # tokenize ONCE: before r11 the CPU-bound tokenize ran four times
    # (bigram counts, bigram total, unigram counts, unigram total —
    # 10 parquet scans in the before-plan); the totals now come from
    # summing the count tables (sum of counts == row count, exactly),
    # so the only corpus-sized passes are the two explodes over the
    # materialized token arrays
    toks = d.select(
        T.tokens_col(F.lower(F.col("text"))).alias("toks")
    ).localCheckpoint(eager=False)
    n = F.greatest(F.size("toks") - 1, F.lit(0))
    pair = F.explode(
        F.zip_with(
            F.slice("toks", F.lit(1), n),
            F.slice("toks", F.lit(2), n),
            lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
        )
    )
    big = toks.select(pair.alias("p")).select("p.w1", "p.w2")
    uni = toks.select(F.explode("toks").alias("tok"))
    # vocabulary-bounded count tables, each feeding several consumers
    uc = (
        uni.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    n_uni = uc.agg(F.sum("c").alias("nu"))
    bc_all = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=False)
    )
    bc = bc_all.where(F.col("c12") >= PMI_MIN_COUNT)
    n_big = bc_all.agg(F.sum("c12").alias("nb"))
    pmi = F.log2(
        (F.col("c12").cast("double") / F.col("nb"))
        / (
            (F.col("c1").cast("double") / F.col("nu"))
            * (F.col("c2").cast("double") / F.col("nu"))
        )
    )
    return (
        bc.join(uc.select(F.col("tok").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uc.select(F.col("tok").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_big))
        .select(
            "w1",
            "w2",
            F.col("c12").alias("pair_count"),
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(PMI_TOP)
    )


# --- character-class script profile ----------------------------------------


def _class_count(text: Column, pattern: str) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, pattern, ""))


@register(
    "script_profile",
    oracle="""
        SELECT doc_id,
               n_chars,
               ROUND(n_letter / NULLIF(n_chars, 0)::DOUBLE, 6) AS letter_ratio,
               ROUND(n_digit / NULLIF(n_chars, 0)::DOUBLE, 6) AS digit_ratio,
               ROUND(n_space / NULLIF(n_chars, 0)::DOUBLE, 6) AS space_ratio,
               ROUND((n_chars - n_letter - n_digit - n_space)
                     / NULLIF(n_chars, 0)::DOUBLE, 6) AS other_ratio,
               CASE
                   WHEN n_chars = 0 THEN 'empty'
                   WHEN n_letter >= n_digit AND n_letter >= n_space
                        AND n_letter >= (n_chars - n_letter - n_digit - n_space)
                       THEN 'letter'
                   WHEN n_digit >= n_space
                        AND n_digit >= (n_chars - n_letter - n_digit - n_space)
                       THEN 'digit'
                   WHEN n_space >= (n_chars - n_letter - n_digit - n_space)
                       THEN 'space'
                   ELSE 'other'
               END AS dominant
        FROM (
            SELECT doc_id,
                   length(text) AS n_chars,
                   length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_letter,
                   length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
                   length(text) - length(regexp_replace(text, '[ \t\n\r]', '', 'g')) AS n_space
            FROM documents
        )
        ORDER BY doc_id
    """,
    doc="Per-document character-class profile: letter/digit/space/other "
    "ratios plus the dominant class (fixed letter>digit>space>other "
    "tiebreak). The script-level complement of lang_id — catches "
    "OCR noise, markup blobs, and number dumps that token heuristics "
    "miss. Pure projection over the scan (regexp counts, no "
    "shuffle); the 'other' class is DERIVED (n - letter - digit - "
    "space) so the two engines can never disagree on an exotic "
    "character class.",
    tags=("text", "llm"),
)
def script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    t = F.col("text")
    counted = d.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        _class_count(t, "[A-Za-z]").alias("n_letter"),
        _class_count(t, "[0-9]").alias("n_digit"),
        _class_count(t, "[ \\t\\n\\r]").alias("n_space"),
    )
    n, le, di, sp = (F.col(c) for c in ("n_chars", "n_letter", "n_digit", "n_space"))
    ot = n - le - di - sp
    denom = F.nullif(n, F.lit(0)).cast("double")
    dominant = (
        F.when(n == 0, F.lit("empty"))
        .when((le >= di) & (le >= sp) & (le >= ot), F.lit("letter"))
        .when((di >= sp) & (di >= ot), F.lit("digit"))
        .when(sp >= ot, F.lit("space"))
        .otherwise(F.lit("other"))
    )
    return counted.select(
        "doc_id",
        "n_chars",
        F.round(le / denom, 6).alias("letter_ratio"),
        F.round(di / denom, 6).alias("digit_ratio"),
        F.round(sp / denom, 6).alias("space_ratio"),
        F.round(ot / denom, 6).alias("other_ratio"),
        dominant.alias("dominant"),
    ).orderBy("doc_id")


# --- stopword-distribution entropy per document ----------------------------

_STOP_PAIRS = tuple(
    (lang, w) for lang in T.LANG_ORDER for w in T.STOPWORDS[lang]
)
_STOP_PAIRS_SQL = ", ".join(f"('{lg}', '{w}')" for lg, w in _STOP_PAIRS)


@register(
    "doc_stopword_entropy",
    oracle=f"""
        WITH sw(lang, tok) AS (VALUES {_STOP_PAIRS_SQL}),
        hits AS (
            SELECT t.doc_id, t.lang, t.tok, COUNT(*)::DOUBLE AS c
            FROM (SELECT doc_id, lang,
                         unnest({T.tokens_sql('lower(text)')}) AS tok
                  FROM documents) t
            JOIN sw ON sw.lang = t.lang AND sw.tok = t.tok
            GROUP BY 1, 2, 3
        ),
        probs AS (
            SELECT doc_id, lang, c,
                   c / SUM(c) OVER (PARTITION BY doc_id) AS p
            FROM hits
        )
        SELECT doc_id, lang,
               CAST(SUM(c) AS BIGINT) AS n_stop,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_stop,
               ROUND(SUM(CAST(ROUND(-p * log2(p) * 1e9) AS BIGINT))
                         / 1e9, 6) AS entropy_bits
        FROM probs
        GROUP BY doc_id, lang
        ORDER BY doc_id
    """,
    doc="Shannon entropy of each document's stopword usage against its "
    "own language's stopword list — a fluency signal finer than the "
    "stopword RATIO in doc_quality (#38): natural prose spreads mass "
    "over many function words (high entropy), keyword-stuffed or "
    "templated text hammers one or two (low). The stopword lexicon is "
    "a 40-row broadcast; one token explode (the same corpus-sized "
    "shape as every text query) then per-doc cells.",
    tags=("text", "llm"),
)
def doc_stopword_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    sw = docs.sparkSession.createDataFrame(
        list(_STOP_PAIRS), "lang string, tok string"
    )
    hits = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(T.tokens_col(F.lower(F.col("text")))).alias("tok"),
        )
        .join(F.broadcast(sw), ["lang", "tok"])
        .groupBy("doc_id", "lang", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    wd = Window.partitionBy("doc_id")
    p = F.col("c") / F.sum("c").over(wd)
    return (
        hits.select(
            "doc_id",
            "lang",
            F.col("c").alias("c"),
            # 1e9 int64 term code: float SUMMATION ORDER of the raw
            # -p*log2(p) doubles differs across engines/builds (this
            # exact query was the r6 red row); summing exact integers
            # is order-independent.
            F.round(-p * F.log2(p) * 1e9).cast("long").alias("term_code"),
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("c").cast("long").alias("n_stop"),
            F.count(F.lit(1)).alias("n_distinct_stop"),
            F.round(F.sum("term_code") / 1e9, 6).alias("entropy_bits"),
        )
        .orderBy("doc_id")
    )


# --- n-gram diversity (distinct-n) report ------------------------------------

_DIVERSITY_NS = (1, 2, 3)


def _ngrams_col(toks, n: int):
    """Contiguous n-grams of a token array as space-joined strings;
    empty array when the document is shorter than n (guarded because
    Spark's sequence(1, 0) counts DOWN instead of returning empty)."""
    if n == 1:
        return toks
    joined = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + off) for off in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, joined).otherwise(
        F.array().cast("array<string>")
    )


def _ngrams_sql(lst: str, n: int) -> str:
    if n == 1:
        return lst
    parts = " || ' ' || ".join(f"{lst}[i + {off}]" for off in range(n))
    return (
        f"CASE WHEN len({lst}) >= {n} THEN "
        f"list_transform(generate_series(1, len({lst}) - {n - 1}), "
        f"i -> {parts}) ELSE [] END"
    )


@register(
    "ngram_diversity_report",
    oracle=f"""
        WITH toked AS (
            SELECT source, {T.tokens_sql('lower(text)')} AS toks
            FROM documents
        ),
        grams AS (
            {" UNION ALL ".join(
                f'''SELECT source, {n} AS n,
                           unnest({_ngrams_sql('toks', n)}) AS gram
                    FROM toked'''
                for n in _DIVERSITY_NS
            )}
        )
        SELECT source, n,
               CAST(COUNT(*) AS BIGINT) AS total_ngrams,
               CAST(COUNT(DISTINCT gram) AS BIGINT) AS distinct_ngrams,
               ROUND(COUNT(DISTINCT gram) / CAST(COUNT(*) AS DOUBLE), 6)
                   AS distinct_ratio
        FROM grams
        GROUP BY source, n
        ORDER BY source, n
    """,
    doc="Per-source n-gram diversity (distinct-1/2/3 of Li et al. "
    "2016): unique-over-total ratio for unigrams, bigrams, trigrams "
    "— the corpus-health metric that flags mode-collapsed or "
    "template-generated sources (low distinct-n) next to the "
    "repetition view of single documents (#47) and the boilerplate "
    "shingle share (#51). N-gram construction is a pure projection "
    "(list transform over the token array, no shuffle); the one "
    "exchange is the (source, n) rollup whose count-distinct Spark "
    "executes as a two-phase partial aggregation. Counts exact "
    "int64; the ratio is one division, rounded on both engines.",
    tags=("text", "llm"),
)
def ngram_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tokenize ONCE (r11): each n-gram order's union branch exploded
    # its own freshly-tokenized scan (3 documents scans); the
    # materialized arrays feed all three explodes.
    docs = (
        table(spark, sf_dir, "documents")
        .select("source", T.tokens_col(F.lower(F.col("text"))).alias("toks"))
        .localCheckpoint(eager=False)
    )
    grams = None
    for n in _DIVERSITY_NS:
        part = docs.select(
            "source",
            F.lit(n).alias("n"),
            F.explode(_ngrams_col(F.col("toks"), n)).alias("gram"),
        )
        grams = part if grams is None else grams.unionAll(part)
    return (
        grams.groupBy("source", "n")
        .agg(
            F.count(F.lit(1)).alias("total_ngrams"),
            F.count_distinct("gram").alias("distinct_ngrams"),
        )
        .select(
            "source",
            "n",
            "total_ngrams",
            "distinct_ngrams",
            F.round(
                F.col("distinct_ngrams") / F.col("total_ngrams").cast("double"),
                6,
            ).alias("distinct_ratio"),
        )
        .orderBy("source", "n")
    )


# --- corpus statistical-law diagnostics (#155-157) ----------------------------
#
# Heaps' law vocabulary growth, the Zipf rank-frequency slope, and
# Good-Turing unseen mass: the three classical corpus diagnostics an
# LLM-data owner reads before trusting token counts, dedup rates, or
# tokenizer budgets. Log-log OLS fits carry 1e-6 int-coded logs into
# exact integer sums (the 1e12 code scale cancels inside the slope
# ratio), so both engines fit bit-identical lines.

_HEAPS_POINTS = 10


def _ols_sums_sql(x: str, y: str) -> dict[str, str]:
    return {
        "n": "COUNT(*) OVER ()",
        "sx": f"SUM({x}) OVER ()",
        "sy": f"SUM({y}) OVER ()",
        "sxx": f"SUM({x} * {x}) OVER ()",
        "sxy": f"SUM({x} * {y}) OVER ()",
    }


@register(
    "heaps_law_fit",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({T.tokens_sql('lower(text)')}) AS tok
            FROM documents
        ),
        nd AS (SELECT COUNT(*) AS n_docs FROM documents),
        firsts AS (SELECT tok, MIN(doc_id) AS first_doc FROM toks
                   GROUP BY tok),
        per_doc AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
        cps AS (
            SELECT i AS checkpoint,
                   (i * (SELECT n_docs FROM nd)) // {_HEAPS_POINTS} AS thr
            FROM (SELECT unnest(generate_series(1, {_HEAPS_POINTS})) AS i)
        ),
        pts AS (
            SELECT c.checkpoint,
                   (SELECT CAST(COALESCE(SUM(p.n), 0) AS BIGINT)
                    FROM per_doc p WHERE p.doc_id < c.thr) AS n_tokens,
                   (SELECT CAST(COUNT(*) AS BIGINT)
                    FROM firsts f WHERE f.first_doc < c.thr) AS vocab
            FROM cps c
        ),
        coded AS (
            SELECT checkpoint, n_tokens, vocab,
                   CAST(ROUND(LN(n_tokens) * 1e6) AS BIGINT) AS xc,
                   CAST(ROUND(LN(vocab) * 1e6) AS BIGINT) AS yc
            FROM pts WHERE n_tokens > 0 AND vocab > 0
        ),
        fit AS (
            SELECT checkpoint, n_tokens, vocab,
                   {_ols_sums_sql('xc', 'yc')['n']} AS n,
                   {_ols_sums_sql('xc', 'yc')['sx']} AS sx,
                   {_ols_sums_sql('xc', 'yc')['sy']} AS sy,
                   {_ols_sums_sql('xc', 'yc')['sxx']} AS sxx,
                   {_ols_sums_sql('xc', 'yc')['sxy']} AS sxy
            FROM coded
        )
        SELECT checkpoint, n_tokens, vocab,
               ROUND((1.0 * n * sxy - 1.0 * sx * sy)
                     / (1.0 * n * sxx - 1.0 * sx * sx), 6) AS beta,
               ROUND(EXP((sy - (1.0 * n * sxy - 1.0 * sx * sy)
                               / (1.0 * n * sxx - 1.0 * sx * sx) * sx)
                         / (n * 1e6)), 6) AS k
        FROM fit
        ORDER BY checkpoint
    """,
    doc="Heaps'-law fit V(N) = K * N^beta of vocabulary growth "
    "(Heaps 1978): vocabulary and token counts at 10 ingestion-order "
    "checkpoints from ONE pass (each token's first-occurrence doc is "
    "a MIN aggregate — no per-checkpoint rescan), then a log-log OLS "
    "for (K, beta). English text sits near beta ~ 0.5; beta drifting "
    "up flags vocabulary churn (noise/boilerplate), down flags "
    "template collapse — the growth-curve companion to the static "
    "Zipf coverage curve (#68). Determinism: checkpoint counts are "
    "exact int64; logs are coded to 1e-6 ints before the OLS sums "
    "(the code scale cancels in the slope ratio); slope/intercept "
    "are single expressions on identical integer sums, rounded to "
    "6. Plan: one explode feeds both the first-occurrence MIN and "
    "the per-doc counts; checkpoints are a 10-row broadcast "
    "range-join fan-out; the OLS is a window over 10 rows.",
    tags=("text", "llm"),
)
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # tokenize ONCE (r11): the arrays feed the first-occurrence
    # explode, the per-doc token counts (now size(toks) — a pure
    # projection, identical to counting the exploded rows; zero-token
    # docs sum 0 and the n_tokens > 0 gate already drops empty
    # checkpoints), and the doc-count scalar — 4 documents scans -> 1.
    t = docs.select(
        "doc_id", T.tokens_col(F.lower(F.col("text"))).alias("toks")
    ).localCheckpoint(eager=False)
    nd = t.agg(F.count(F.lit(1)).alias("n_docs"))
    firsts = (
        t.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    per_doc = t.select("doc_id", F.size("toks").alias("n"))
    cps = (
        F.broadcast(nd)
        .select(
            F.explode(
                F.sequence(F.lit(1), F.lit(_HEAPS_POINTS))
            ).alias("checkpoint"),
            "n_docs",
        )
        .select(
            "checkpoint",
            F.expr(f"checkpoint * n_docs div {_HEAPS_POINTS}").alias("thr"),
        )
    )
    n_at = (
        per_doc.join(F.broadcast(cps), per_doc["doc_id"] < cps["thr"])
        .groupBy("checkpoint")
        .agg(F.sum("n").alias("n_tokens"))
    )
    v_at = (
        firsts.join(F.broadcast(cps), firsts["first_doc"] < cps["thr"])
        .groupBy("checkpoint")
        .agg(F.count(F.lit(1)).alias("vocab"))
    )
    coded = (
        n_at.join(v_at, "checkpoint")
        .where((F.col("n_tokens") > 0) & (F.col("vocab") > 0))
        .select(
            "checkpoint",
            "n_tokens",
            "vocab",
            F.round(F.log(F.col("n_tokens")) * 1e6).cast("long").alias("xc"),
            F.round(F.log(F.col("vocab")) * 1e6).cast("long").alias("yc"),
        )
    )
    w = Window.partitionBy()
    n = F.count(F.lit(1)).over(w)
    sx = F.sum("xc").over(w)
    sy = F.sum("yc").over(w)
    sxx = F.sum(F.col("xc") * F.col("xc")).over(w)
    sxy = F.sum(F.col("xc") * F.col("yc")).over(w)
    slope = (1.0 * n * sxy - 1.0 * sx * sy) / (
        1.0 * n * sxx - 1.0 * sx * sx
    )
    k = F.exp((sy - slope * sx) / (n * F.lit(1e6)))
    return (
        coded.select(
            "checkpoint",
            "n_tokens",
            "vocab",
            F.round(slope, 6).alias("beta"),
            F.round(k, 6).alias("k"),
        )
        .orderBy("checkpoint")
    )


_ZIPF_RANKS = 100


@register(
    "zipf_slope_fit",
    oracle=f"""
        WITH toks AS (
            SELECT unnest({T.tokens_sql('lower(text)')}) AS tok
            FROM documents
        ),
        freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_w
                 FROM toks GROUP BY tok),
        ranked AS (
            SELECT tok, n_w,
                   ROW_NUMBER() OVER (ORDER BY n_w DESC, tok) AS rank
            FROM freq
        ),
        coded AS (
            SELECT rank, n_w,
                   CAST(ROUND(LN(rank) * 1e6) AS BIGINT) AS xc,
                   CAST(ROUND(LN(n_w) * 1e6) AS BIGINT) AS yc
            FROM ranked WHERE rank <= {_ZIPF_RANKS}
        )
        SELECT rank, n_w AS freq,
               ROUND((1.0 * COUNT(*) OVER () * SUM(xc * yc) OVER ()
                      - 1.0 * SUM(xc) OVER () * SUM(yc) OVER ())
                     / (1.0 * COUNT(*) OVER () * SUM(xc * xc) OVER ()
                        - 1.0 * SUM(xc) OVER () * SUM(xc) OVER ()), 6)
                   AS zipf_slope
        FROM coded
        ORDER BY rank
    """,
    doc=f"Zipf rank-frequency slope (Zipf 1949): log-log OLS over the "
    f"top-{_ZIPF_RANKS} vocabulary ranks — natural text sits near "
    "slope -1; a flat slope flags synthetic/uniform vocabularies, a "
    "steep one flags boilerplate domination. The parametric summary "
    "of the cumulative coverage curve (#68) and the frequency-side "
    "companion of the Heaps fit (#155). Same integer-coded OLS "
    "determinism: rank selection orders by (count desc, token), logs "
    "code to 1e-6 ints, the slope is one expression on exact sums. "
    "Plan: one explode -> vocabulary aggregate -> distributed "
    "top-100 (TakeOrderedAndProject; the full vocabulary never "
    "passes a single-partition sort) -> 100-row analytic fit.",
    tags=("text", "llm"),
)
def zipf_slope_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(T.tokens_col(F.lower(F.col("text")))).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_w"))
    # distributed top-K (TakeOrderedAndProject) instead of a global
    # row_number window: the full vocabulary never passes through a
    # single-partition sort; only the 100 survivors get ranked
    top = freq.orderBy(F.desc("n_w"), F.asc("tok")).limit(_ZIPF_RANKS)
    w_rank = Window.orderBy(F.desc("n_w"), F.asc("tok"))
    coded = (
        top.withColumn("rank", F.row_number().over(w_rank))
        .select(
            "rank",
            F.col("n_w"),
            F.round(F.log(F.col("rank")) * 1e6).cast("long").alias("xc"),
            F.round(F.log(F.col("n_w")) * 1e6).cast("long").alias("yc"),
        )
    )
    w = Window.partitionBy()
    n = F.count(F.lit(1)).over(w)
    sx = F.sum("xc").over(w)
    sy = F.sum("yc").over(w)
    sxx = F.sum(F.col("xc") * F.col("xc")).over(w)
    sxy = F.sum(F.col("xc") * F.col("yc")).over(w)
    slope = (1.0 * n * sxy - 1.0 * sx * sy) / (
        1.0 * n * sxx - 1.0 * sx * sx
    )
    return coded.select(
        "rank",
        F.col("n_w").alias("freq"),
        F.round(slope, 6).alias("zipf_slope"),
    ).orderBy("rank")


@register(
    "vocab_good_turing",
    oracle=f"""
        WITH toks AS (
            SELECT unnest({T.tokens_sql('lower(text)')}) AS tok
            FROM documents
        ),
        freq AS (SELECT tok, COUNT(*) AS n_w FROM toks GROUP BY tok)
        SELECT CAST(COALESCE(SUM(n_w), 0) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS vocab,
               CAST(count_if(n_w = 1) AS BIGINT) AS hapax,
               CAST(count_if(n_w = 2) AS BIGINT) AS dis,
               CASE WHEN SUM(n_w) > 0 THEN
                   ROUND(COUNT(*) / CAST(SUM(n_w) AS DOUBLE), 6)
               END AS type_token_ratio,
               CASE WHEN SUM(n_w) > 0 THEN
                   ROUND(count_if(n_w = 1)
                         / CAST(SUM(n_w) AS DOUBLE), 6)
               END AS gt_unseen_mass
        FROM freq
    """,
    doc="Good-Turing vocabulary statistics (Good 1953): token/type "
    "counts, hapax and dis legomena, type-token ratio, and the "
    "Good-Turing unseen-probability mass N1/N — the closed-corpus "
    "estimate of how much vocabulary the NEXT shard will introduce, "
    "which calibrates tokenizer budgets (#92) and OOV handling. One "
    "vocabulary aggregate, one scalar rollup; all counts exact "
    "int64, each ratio one guarded division.",
    tags=("text", "llm"),
)
def vocab_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(T.tokens_col(F.lower(F.col("text")))).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_w"))
    tot = F.sum("n_w")
    hapax = F.count_if(F.col("n_w") == 1)
    return freq.agg(
        F.coalesce(tot, F.lit(0)).cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        hapax.alias("hapax"),
        F.count_if(F.col("n_w") == 2).alias("dis"),
        F.when(
            tot > 0, F.round(F.count(F.lit(1)) / tot.cast("double"), 6)
        ).alias("type_token_ratio"),
        F.when(tot > 0, F.round(hapax / tot.cast("double"), 6)).alias(
            "gt_unseen_mass"
        ),
    )


# --- shingle-level repetition entropy profile --------------------------------
#
# The shingle twin of doc_stopword_entropy (#112) and the entropy-form
# complement of doc_repetition (#47): per document, the Shannon
# entropy of its NON-distinct bigram-shingle distribution plus the
# top-shingle share. Templated/looped text re-uses few shingles (low
# entropy, high max share); natural prose spreads mass widely.


@register(
    "shingle_entropy_profile",
    oracle=f"""
        WITH sh AS (
            SELECT doc_id,
                   list_transform(
                       generate_series(1, len(tc) - 1),
                       i -> (tc[i] * 31 + tc[i + 1]) % {H.P}) AS codes
            FROM (
                SELECT doc_id,
                       list_transform(toks, t -> {H.str_code_sql('t')}) AS tc
                FROM (SELECT doc_id, {T.tokens_sql('text')} AS toks
                      FROM documents)
            )
        ),
        cells AS (
            SELECT doc_id, code, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(codes) AS code
                  FROM sh WHERE len(codes) > 0)
            GROUP BY doc_id, code
        ),
        probs AS (
            SELECT doc_id, c,
                   SUM(c) OVER (PARTITION BY doc_id) AS n,
                   MAX(c) OVER (PARTITION BY doc_id) AS mx
            FROM cells
        )
        SELECT doc_id,
               CAST(MIN(n) AS BIGINT) AS n_shingles,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               ROUND(COUNT(*) / (1.0 * MIN(n)), 6) AS distinct_ratio,
               ROUND(MIN(mx) / (1.0 * MIN(n)), 6) AS top_share,
               ROUND(SUM(CAST(ROUND(-(1.0 * c / n) * log2(1.0 * c / n)
                                    * 1e9) AS BIGINT)) / 1e9, 6)
                   AS shingle_entropy_bits
        FROM probs
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    doc="Per-document bigram-shingle entropy profile: total and "
    "distinct shingle counts, distinct ratio, top-shingle share, and "
    "the Shannon entropy of the shingle distribution (1e9-int-coded "
    "terms; summation-order free per the house rule). Low entropy + "
    "high top share = templated or loop-generated text that per-WORD "
    "repetition metrics (#47) under-detect when the repeated unit is "
    "a phrase. One token-hash projection (same O(tokens) zip_with "
    "shape as the dedup shingle scan) and one (doc, code) "
    "aggregation; per-doc windows ride the same partitioning.",
    tags=("text", "llm", "dedup"),
)
def shingle_entropy_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = F.col("toks")
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    left = F.slice(toks, F.lit(1), n)
    right = F.slice(toks, F.lit(2), n)
    codes = F.zip_with(
        left,
        right,
        lambda x, y: (H.str_code_col(x) * 31 + H.str_code_col(y))
        % F.lit(H.P),
    )
    cells = (
        d.select("doc_id", T.tokens_col(F.col("text")).alias("toks"))
        .select("doc_id", codes.alias("codes"))
        .where(F.size("codes") > 0)
        .select("doc_id", F.explode("codes").alias("code"))
        .groupBy("doc_id", "code")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wd = Window.partitionBy("doc_id")
    probs = cells.select(
        "doc_id",
        "c",
        F.sum("c").over(wd).alias("n"),
        F.max("c").over(wd).alias("mx"),
    )
    p = 1.0 * F.col("c") / F.col("n")
    return (
        probs.select(
            "doc_id",
            "c",
            "n",
            "mx",
            F.round(-p * F.log2(p) * 1e9).cast("long").alias("term_code"),
        )
        .groupBy("doc_id")
        .agg(
            F.min("n").cast("long").alias("n_shingles"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.round(
                F.count(F.lit(1)) / (1.0 * F.min("n")), 6
            ).alias("distinct_ratio"),
            F.round(F.min("mx") / (1.0 * F.min("n")), 6).alias("top_share"),
            F.round(F.sum("term_code") / 1e9, 6).alias(
                "shingle_entropy_bits"
            ),
        )
        .orderBy("doc_id")
    )


# --- readability (Flesch / Flesch-Kincaid) ---------------------------------
#
# The classic syllable heuristic: vowel-group count per word
# ([aeiouy]+ runs in the lowercased word), floored at 1 — every word
# costs at least one syllable (Flesch 1948 operationalized the same
# way in early implementations; exact syllabification needs a
# dictionary, and the ranking use-case only needs a consistent
# monotone proxy). Sentences = [.!?]+ runs, floored at 1.

_SYL_RE = "[aeiouy]+"
_SENT_RE = "[.!?]+"


@register(
    "doc_readability",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, text, {T.tokens_sql("text")} AS toks
            FROM documents
        ),
        c AS (
            SELECT doc_id,
                   len(toks) AS n_words,
                   greatest(len(regexp_extract_all(text, '{_SENT_RE}')), 1)
                       AS n_sentences,
                   CASE WHEN len(toks) = 0 THEN 0
                        ELSE list_sum(list_transform(toks,
                            w -> greatest(len(regexp_extract_all(
                                     lower(w), '{_SYL_RE}')), 1)))
                   END AS n_syllables
            FROM t
        )
        SELECT doc_id,
               CAST(n_words AS BIGINT) AS n_words,
               CAST(n_sentences AS BIGINT) AS n_sentences,
               CAST(n_syllables AS BIGINT) AS n_syllables,
               CASE WHEN n_words > 0 THEN
                   ROUND(206.835
                         - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                         - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4)
               END AS flesch_ease,
               CASE WHEN n_words > 0 THEN
                   ROUND(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
                         + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
                         - 15.59, 4)
               END AS fk_grade
        FROM c
        ORDER BY doc_id
    """,
    doc="Flesch reading-ease + Flesch-Kincaid grade per document "
    "(Flesch 1948 / Kincaid 1975) — the readability screen used "
    "alongside the quality family (#38/#53/#141) when selecting "
    "training text by audience level. Syllables are the deterministic "
    "vowel-group heuristic (runs of [aeiouy] in the lowercased word, "
    "floored at 1/word) so both engines count identically; the two "
    "scores are per-row rational formulas over integer counts — "
    "projection-only, no shuffle at all.",
    tags=("text", "llm"),
)
def doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _toks(table(spark, sf_dir, "documents"))
    syl_per_word = F.transform(
        F.col("toks"),
        lambda w: F.greatest(
            F.size(F.regexp_extract_all(F.lower(w), F.lit(_SYL_RE), 0)),
            F.lit(1),
        ),
    )
    c = t.select(
        "doc_id",
        F.size("toks").alias("n_words"),
        F.greatest(
            F.size(F.regexp_extract_all("text", F.lit(_SENT_RE), 0)),
            F.lit(1),
        ).alias("n_sentences"),
        F.when(F.size("toks") == 0, F.lit(0))
        .otherwise(
            F.aggregate(
                syl_per_word, F.lit(0), lambda acc, x: acc + x
            )
        )
        .alias("n_syllables"),
    )
    wd = F.col("n_words").cast("double")
    return c.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_sentences").cast("long").alias("n_sentences"),
        F.col("n_syllables").cast("long").alias("n_syllables"),
        F.when(
            F.col("n_words") > 0,
            F.round(
                206.835
                - 1.015 * (wd / F.col("n_sentences"))
                - 84.6 * (F.col("n_syllables") / wd),
                4,
            ),
        ).alias("flesch_ease"),
        F.when(
            F.col("n_words") > 0,
            F.round(
                0.39 * (wd / F.col("n_sentences"))
                + 11.8 * (F.col("n_syllables") / wd)
                - 15.59,
                4,
            ),
        ).alias("fk_grade"),
    ).orderBy("doc_id")


# --- feature hashing (the hashing trick) -----------------------------------
#
# Weinberger et al. 2009 (arXiv:0902.2206): token -> bucket via one
# affine hash, sign via a second independent hash, so collisions
# cancel in expectation and the D-dim representation is an unbiased
# inner-product sketch. The vectorization step feeding linear models
# (quality classifier #141) when the vocabulary is unbounded.

FEATURE_HASH_DIM = 64
_FH_BUCKET_A, _FH_BUCKET_B = H.hash_params(1, seed=131)[0]
_FH_SIGN_A, _FH_SIGN_B = H.hash_params(1, seed=137)[0]


@register(
    "feature_hashing_vectors",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, unnest({T.tokens_sql("text")}) AS tok
            FROM documents
        ),
        h AS (
            SELECT doc_id,
                   {H.affine_sql(H.str_code_sql("tok"), _FH_BUCKET_A, _FH_BUCKET_B)}
                       % {FEATURE_HASH_DIM} AS bucket,
                   CASE WHEN {H.affine_sql(H.str_code_sql("tok"), _FH_SIGN_A, _FH_SIGN_B)}
                             % 2 = 0 THEN 1 ELSE -1 END AS sgn
            FROM t
        )
        SELECT doc_id,
               CAST(bucket AS BIGINT) AS bucket,
               CAST(SUM(sgn) AS BIGINT) AS weight
        FROM h
        GROUP BY doc_id, bucket
        HAVING SUM(sgn) <> 0
        ORDER BY doc_id, bucket
    """,
    doc="Signed feature hashing (the hashing trick, Weinberger et al. "
    "2009): every token maps to one of "
    f"{FEATURE_HASH_DIM} buckets via the house affine family, with an "
    "independent second hash choosing the sign so collision noise "
    "cancels in expectation — the unbounded-vocabulary vectorizer "
    "feeding linear models like the quality classifier #141. Sparse "
    "(doc_id, bucket, weight) rows, zero-cancelled entries dropped. "
    "Scale shape: one explode + one (doc_id, bucket) aggregation — "
    "output is doc-linear with a hard D-per-doc cap, and the hash is "
    "the md5-affine code (no vocabulary table, no broadcast).",
    tags=("text", "llm"),
)
def feature_hashing_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _toks(table(spark, sf_dir, "documents")).select(
        "doc_id", F.explode("toks").alias("tok")
    )
    code = H.str_code_col(F.col("tok"))
    h = t.select(
        "doc_id",
        (
            H.affine_col(code, _FH_BUCKET_A, _FH_BUCKET_B)
            % FEATURE_HASH_DIM
        ).alias("bucket"),
        F.when(
            H.affine_col(code, _FH_SIGN_A, _FH_SIGN_B) % 2 == 0, F.lit(1)
        )
        .otherwise(F.lit(-1))
        .alias("sgn"),
    )
    return (
        h.groupBy("doc_id", "bucket")
        .agg(F.sum("sgn").alias("weight"))
        .where(F.col("weight") != 0)
        .select(
            "doc_id",
            F.col("bucket").cast("long").alias("bucket"),
            F.col("weight").cast("long").alias("weight"),
        )
        .orderBy("doc_id", "bucket")
    )
