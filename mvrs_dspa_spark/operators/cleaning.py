"""Training-data cleaning operators: PII scrubbing and repetition
quality metrics (SURVEY §2f #46-47).

Complements `text_analysis` (lang-ID, length/stopword quality) with
the other two filters every large-scale corpus pipeline runs before
training: masking personally-identifiable spans, and dropping
machine-generated / boilerplate documents by repetition statistics
(the "repetition" rules of the published Gopher/MassiveText filtering
recipe — top-word share and duplicate n-gram fraction).

Everything is JVM-side column expressions over the parquet scan — no
UDFs, no Python on the hot path:

- `pii_scrub` — chained `regexp_replace` (linear scans per pattern,
  whole-stage codegen) + `regexp_count` audit columns.  Patterns are
  written in the common subset of Java regex and RE2 (no \\b, no
  backrefs) so the DuckDB oracle runs the IDENTICAL expressions.
- `doc_repetition` — whitespace tokens (shared
  `functions/text.tokens_*` mirrors), bigrams via the zip_with(slice,
  slice) form (see `dedup.shingles_from_codes` for why not
  transform(sequence)), top-word share via explode + two-level
  aggregation keyed on doc_id (the scan is pre-partitioned on doc_id,
  so both groupBys reuse one exchange).

At 100 TB both stay scan-bound and narrow except doc_repetition's
explode, whose shuffle key (doc_id, word) is near-uniform — no hot
keys, no skew handling needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mvrs_dspa_spark.functions import text as T
from mvrs_dspa_spark.plans.registry import register
from mvrs_dspa_spark.tables import table

# Patterns restricted to the Java-regex ∩ RE2 common subset.  Order
# matters: emails first (their local part looks like a phone to the
# digit-run pattern), then IPv4, then phone digit runs.
PII_PATTERNS = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"),
    ("phone", "[+(]?[0-9][0-9()\\- ]{6,}[0-9]", "<PHONE>"),
)


def scrub_text(col: F.Column) -> F.Column:
    out = col
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def _scrub_sql(expr: str) -> str:
    out = expr
    for _, pat, token in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out


@register(
    "pii_scrub",
    oracle=f"""
        SELECT doc_id,
               {_scrub_sql('text')} AS clean_text,
               {', '.join(
                   f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)"
                   f" AS n_{name}"
                   for name, pat, _ in PII_PATTERNS)}
        FROM documents
        ORDER BY doc_id
    """,
    doc="PII masking: emails / IPv4 / phone digit runs replaced by "
    "typed tokens, with per-kind match counts for audit.",
    tags=("llm", "cleaning"),
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        scrub_text(F.col("text")).alias("clean_text"),
        *[
            F.regexp_count(F.col("text"), F.lit(pat)).alias(f"n_{name}")
            for name, pat, _ in PII_PATTERNS
        ],
    ).orderBy("doc_id")


@register(
    "doc_repetition",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {T.tokens_sql('text')} AS toks FROM documents
        ),
        words AS (
            SELECT doc_id, unnest(toks) AS w FROM t
        ),
        word_counts AS (
            SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w
        ),
        shares AS (
            SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n_words,
                   ROUND(MAX(c)::DOUBLE / SUM(c), 6) AS top_word_share
            FROM word_counts GROUP BY doc_id
        ),
        bi AS (
            SELECT doc_id,
                   CASE WHEN len(toks) < 2 THEN 0.0 ELSE
                     ROUND(1.0 - len(list_distinct(list_transform(
                         generate_series(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i + 1]
                     )))::DOUBLE / (len(toks) - 1), 6)
                   END AS dup_bigram_ratio
            FROM t
        )
        SELECT s.doc_id, s.n_words, s.top_word_share, b.dup_bigram_ratio
        FROM shares s JOIN bi b ON s.doc_id = b.doc_id
        ORDER BY s.doc_id
    """,
    doc="Gopher-style repetition metrics: share of the most frequent "
    "word and duplicate-bigram fraction per document.",
    tags=("llm", "cleaning"),
)
def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = d.select("doc_id", T.tokens_col(F.col("text")).alias("toks"))

    # bigrams stay array-side (no shuffle): zip_with over two slices —
    # the transform(sequence) form re-evaluates toks per index
    n = F.greatest(F.size("toks") - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice("toks", F.lit(1), n),
        F.slice("toks", F.lit(2), n),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    bi = toks.select(
        "doc_id",
        F.when(F.size("toks") < 2, F.lit(0.0))
        .otherwise(
            F.round(
                1.0
                - F.size(F.array_distinct(bigrams)).cast("double")
                / (F.size("toks") - 1),
                6,
            )
        )
        .alias("dup_bigram_ratio"),
    )

    # top-word share needs cross-row counts -> explode; both groupBys
    # and the final join are keyed on doc_id (bigrams side too), so
    # the doc_id partitioning from the repartition is reused throughout
    shares = (
        toks.select("doc_id", F.explode("toks").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_words"),
            F.round(F.max("c").cast("double") / F.sum("c"), 6).alias(
                "top_word_share"
            ),
        )
    )
    return (
        shares.join(bi, "doc_id")
        .select("doc_id", "n_words", "top_word_share", "dup_bigram_ratio")
        .orderBy("doc_id")
    )


FUZZY_MAX_DIST = 4


@register(
    "fuzzy_name_pairs",
    oracle=f"""
        WITH names AS (SELECT DISTINCT p_name FROM part),
        toks AS (
            SELECT p_name, unnest(string_split(p_name, ' ')) AS tok
            FROM names
        ),
        cand AS (
            SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b
            FROM toks a JOIN toks b
              ON a.tok = b.tok AND a.p_name < b.p_name
        )
        SELECT name_a, name_b,
               CAST(levenshtein(name_a, name_b) AS INTEGER) AS dist
        FROM cand
        WHERE levenshtein(name_a, name_b) <= {FUZZY_MAX_DIST}
        ORDER BY name_a, name_b
    """,
    doc="Edit-distance similarity join over part names (entity "
    "resolution / catalog matching): DISTINCT names first — the "
    "candidate space is the bounded name VOCABULARY, not the row "
    "count, so the one corpus-sized operation is the distinct's "
    "shuffle. Blocking on shared tokens keeps the verify step off "
    "the full vocab cross product; Levenshtein verification is exact "
    "and integer (engine-identical).",
    tags=("cleaning", "similarity"),
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = table(spark, sf_dir, "part").select("p_name").distinct()
    toks = names.select(
        "p_name", F.explode(F.split("p_name", " ")).alias("tok")
    )
    a = toks.alias("a")
    b = toks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
        )
        .distinct()
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        cand.where(dist <= FUZZY_MAX_DIST)
        .select("name_a", "name_b", dist.cast("int").alias("dist"))
        .orderBy("name_a", "name_b")
    )


# --- entity-resolution blocking-strategy report ----------------------------

_BLOCK_LEN_BUCKET = 8

# strategy name -> (DuckDB key expr, Spark key builder) over p_name
_BLOCK_STRATEGIES_SQL = {
    "first_token": "string_split(p_name, ' ')[1]",
    "last_token": "string_split(p_name, ' ')[-1]",
    f"len_bucket{_BLOCK_LEN_BUCKET}": (
        f"CAST(length(p_name) // {_BLOCK_LEN_BUCKET} AS VARCHAR)"
    ),
}


def _block_key_col(strategy: str) -> F.Column:
    if strategy == "first_token":
        return F.element_at(F.split("p_name", " "), 1)
    if strategy == "last_token":
        return F.element_at(F.split("p_name", " "), -1)
    return F.floor(F.length("p_name") / _BLOCK_LEN_BUCKET).cast("string")


@register(
    "entity_resolution_blocking",
    oracle="\nUNION ALL\n".join(
        f"""
        SELECT * FROM (
            WITH names AS (SELECT DISTINCT p_name FROM part),
            blocks AS (
                SELECT {expr} AS bkey, COUNT(*) AS b
                FROM names GROUP BY 1
            )
            SELECT '{name}' AS strategy,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM names) AS n_names,
                   CAST(COUNT(*) AS BIGINT) AS n_blocks,
                   CAST(MAX(b) AS BIGINT) AS max_block_size,
                   CAST(SUM(b * (b - 1) // 2) AS BIGINT) AS cand_pairs,
                   ROUND(1.0 - SUM(b * (b - 1) // 2)
                         / ((SELECT COUNT(*) FROM names)
                            * ((SELECT COUNT(*) FROM names) - 1) // 2)::DOUBLE,
                         6) AS reduction_ratio
            FROM blocks
        )
        """
        for name, expr in _BLOCK_STRATEGIES_SQL.items()
    )
    + "\nORDER BY strategy",
    doc="Blocking-strategy evaluation for entity resolution (the "
    "planning step BEFORE the fuzzy_name_pairs join, #70): for each "
    "candidate blocking key over the distinct part-name vocabulary — "
    "first token, last token, length bucket — the block-size "
    "distribution, the candidate-pair volume sum(b*(b-1)/2) it would "
    "generate, and the reduction ratio vs the full cross product "
    "(Christen 2012's standard metrics). All integer arithmetic; the "
    "corpus-sized work is the one DISTINCT, each strategy then scans "
    "the bounded vocabulary.",
    tags=("cleaning", "validation"),
)
def entity_resolution_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    names = table(spark, sf_dir, "part").select("p_name").distinct()
    # the distinct-name vocabulary is re-read per strategy; checkpoint
    # once so the corpus-sized distinct runs once (same idiom as the
    # triangle query's edge reuse)
    names = names.localCheckpoint(eager=False)
    n_names = names.agg(F.count(F.lit(1)).alias("n_names"))
    out = None
    for strategy in _BLOCK_STRATEGIES_SQL:
        blocks = names.groupBy(
            _block_key_col(strategy).alias("bkey")
        ).agg(F.count(F.lit(1)).alias("b"))
        pairs = F.sum(F.expr("b * (b - 1) div 2"))
        row = (
            blocks.agg(
                F.count(F.lit(1)).alias("n_blocks"),
                F.max("b").alias("max_block_size"),
                pairs.alias("cand_pairs"),
            )
            .crossJoin(F.broadcast(n_names))
            .select(
                F.lit(strategy).alias("strategy"),
                "n_names",
                "n_blocks",
                "max_block_size",
                "cand_pairs",
                F.round(
                    1.0
                    - F.col("cand_pairs")
                    / F.expr("n_names * (n_names - 1) div 2").cast("double"),
                    6,
                ).alias("reduction_ratio"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("strategy")


# --- category blocklist filter report (C4-style badwords gate) ---------------
#
# The safety-filter member the cleaning family was missing next to PII
# scrubbing (#46) and repetition metrics (#47): C4 drops any document
# containing a term from a category blocklist (Raffel et al. 2020,
# "List of Dirty, Naughty ..."); production pipelines audit the gate
# per category before enforcing it. Lists here are a configurable
# stand-in over the synthetic vocabulary — the mechanism (token-exact
# multi-category matching, per-category and combined keep rates) is
# the operator.

BLOCKLISTS: dict[str, tuple[str, ...]] = {
    "latency_complaints": ("slow",),
    "duplication_markers": ("dup",),
    "vendor_terms": ("spark",),
}


@register(
    "blocklist_filter_report",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest({T.tokens_sql('lower(text)')}) AS tok
            FROM documents
        ),
        lex(category, tok) AS (
            VALUES {", ".join(
                f"('{cat}', '{w}')"
                for cat, words in sorted(BLOCKLISTS.items())
                for w in words
            )}
        ),
        hits AS (
            SELECT l.category, t.doc_id, COUNT(*) AS n_hits
            FROM toks t JOIN lex l ON l.tok = t.tok
            GROUP BY l.category, t.doc_id
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        rolled AS (
            SELECT CASE WHEN GROUPING(category) = 1
                        THEN 'ANY' ELSE category END AS category,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT)
                       AS n_docs_flagged,
                   CAST(SUM(n_hits) AS BIGINT) AS n_token_hits
            FROM hits
            GROUP BY ROLLUP (category)
        )
        SELECT category, n_docs_flagged, n_token_hits,
               CASE WHEN n.n_docs > 0
                    THEN ROUND(n_docs_flagged
                               / CAST(n.n_docs AS DOUBLE), 6)
               END AS flag_rate
        FROM rolled CROSS JOIN n
        ORDER BY category
    """,
    doc="Category-blocklist audit of the C4-style badwords gate "
    "(Raffel et al. 2020): per category, documents containing any "
    "listed term (token-exact match on the house tokenizer), total "
    "token hits, and the flag rate; plus the combined ANY row — the "
    "keep-rate a pipeline owner reviews before enforcing the drop. "
    "Completes the cleaning family's safety side next to PII "
    "scrubbing (#46) and repetition (#47). Plan: ONE explode of one "
    "document scan, broadcast-joined to the tiny (category, word) "
    "lexicon — handles overlapping category lists and never rescans "
    "the corpus per category (a per-category union would plan one "
    "full scan each); the per-doc rollup bounds the DISTINCT in the "
    "combined row by flagged docs only. All counts exact int64; the "
    "one float is the final rate.",
    tags=("cleaning", "llm"),
)
def blocklist_filter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(T.tokens_col(F.lower(F.col("text")))).alias("tok")
    )
    lex = spark.createDataFrame(
        [
            (cat, w)
            for cat, words in sorted(BLOCKLISTS.items())
            for w in words
        ],
        "category string, tok string",
    )
    hits = (
        toks.join(F.broadcast(lex), "tok")
        .groupBy("category", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    # per-category rows AND the cross-category ANY row from ONE pass:
    # (category, doc_id) is unique, so per-cat COUNT(DISTINCT doc_id)
    # equals the row count, while the rollup total deduplicates docs
    # flagged by several categories.
    rolled = (
        hits.rollup("category")
        .agg(
            F.grouping("category").alias("g"),
            F.count_distinct("doc_id").alias("n_docs_flagged"),
            F.sum("n_hits").alias("n_token_hits"),
        )
        .select(
            F.when(F.col("g") == 1, F.lit("ANY"))
            .otherwise(F.col("category"))
            .alias("category"),
            "n_docs_flagged",
            "n_token_hits",
        )
    )
    return (
        rolled.crossJoin(F.broadcast(n))
        .select(
            "category",
            "n_docs_flagged",
            F.coalesce("n_token_hits", F.lit(0).cast("long")).alias(
                "n_token_hits"
            ),
            F.when(
                F.col("n_docs") > 0,
                F.round(
                    F.col("n_docs_flagged") / F.col("n_docs").cast("double"),
                    6,
                ),
            ).alias("flag_rate"),
        )
        .orderBy("category")
    )
