"""Deterministic sampling / splitting / packing for training-data
pipelines (SURVEY §2f companions to the dedup/quality family).

Everything keys off the portable md5 code (`hashing.str_code_col`), so
assignment is a pure function of the row — reproducible across runs,
engines, and cluster sizes, with no RNG state to coordinate:

- `train_test_split`: hash-bucket split assignment (80/10/10). The
  standard alternative, `DataFrame.randomSplit`, is seed- and
  partitioning-dependent; a hash of the stable id is not.
- `stratified_sample`: per-stratum Bernoulli keep with per-language
  rates (upsampling low-resource languages is the canonical use).
- `source_quota_cap`: at most N docs per source, chosen by hash rank
  (not file order, which is ingest-dependent).
- `pack_sequences`: contiguous greedy packing of docs into
  fixed-capacity bins per source by running char count — the batch
  analog of sequence packing for training shards.

Scale shape: split/sample are stateless narrow projections (scan
throughput bound, embarrassingly parallel). quota/packing shuffle
once on `source` for their window — at 100 TB the per-source window
is the intended semantics (quota and packing are per-shard-stream
decisions); skew across sources is bounded by the quota/capacity
itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mvrs_dspa_spark.functions import hashing as H
from mvrs_dspa_spark.plans.registry import register
from mvrs_dspa_spark.tables import table


def _code(col: Column, salt: str) -> Column:
    """Salted md5 code of a column, in [0, P)."""
    return H.str_code_col(F.concat(F.lit(salt + ":"), col.cast("string")))


def _code_sql(expr: str, salt: str) -> str:
    return H.str_code_sql(f"'{salt}:' || ({expr})::VARCHAR")


SPLIT_SALT = "split-v1"
SAMPLE_SALT = "sample-v1"
QUOTA_SALT = "quota-v1"
MIX_SALT = "mix-v1"


@register(
    "train_test_split",
    oracle=f"""
        SELECT doc_id,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id, {_code_sql('doc_id', SPLIT_SALT)} % 100 AS bucket
            FROM documents
        )
        ORDER BY doc_id
    """,
    doc="Deterministic 80/10/10 split by salted hash bucket of doc_id "
    "— stable under re-runs, repartitioning, and engine choice "
    "(unlike randomSplit).",
    tags=("sampling",),
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    bucket = _code(F.col("doc_id"), SPLIT_SALT) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return docs.select("doc_id", split.alias("split")).orderBy("doc_id")


# Per-language keep rates: downsample the high-resource language,
# keep the rest — the canonical rebalancing move.
SAMPLE_RATES = {"en": 0.25, "de": 1.0, "es": 1.0, "fr": 1.0, "zh": 0.5}
_DEFAULT_RATE = 1.0


@register(
    "stratified_sample",
    oracle=f"""
        SELECT doc_id, lang
        FROM (
            SELECT doc_id, lang,
                   {_code_sql('doc_id', SAMPLE_SALT)} / {float(H.P)} AS u,
                   CASE lang
                        WHEN 'en' THEN 0.25 WHEN 'de' THEN 1.0
                        WHEN 'es' THEN 1.0  WHEN 'fr' THEN 1.0
                        WHEN 'zh' THEN 0.5  ELSE {_DEFAULT_RATE} END AS rate
            FROM documents
        )
        WHERE u < rate
        ORDER BY doc_id
    """,
    doc="Per-language Bernoulli sample at configured rates, keyed on a "
    "salted doc_id hash: the kept set is a deterministic function of "
    "the data, and nested samples (lower rate ⊂ higher rate) come for "
    "free from the shared uniform u.",
    tags=("sampling",),
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    u = _code(F.col("doc_id"), SAMPLE_SALT) / float(H.P)
    rate = F.lit(_DEFAULT_RATE)
    for lang, r in SAMPLE_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return docs.where(u < rate).select("doc_id", "lang").orderBy("doc_id")


QUOTA_PER_SOURCE = 15


@register(
    "source_quota_cap",
    oracle=f"""
        SELECT doc_id, source, hash_rank
        FROM (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY {_code_sql('doc_id', QUOTA_SALT)}, doc_id
                   ) AS hash_rank
            FROM documents
        )
        WHERE hash_rank <= {QUOTA_PER_SOURCE}
        ORDER BY source, hash_rank
    """,
    doc="Cap each source at N docs, selected by salted-hash rank so "
    "the kept subset is a uniform, order-independent choice (file "
    "order would bias toward early-ingested docs). One shuffle on "
    "source; rank is computed per partition group.",
    tags=("sampling",),
)
def source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        _code(F.col("doc_id"), QUOTA_SALT), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("hash_rank"))
        .where(F.col("hash_rank") <= QUOTA_PER_SOURCE)
        .orderBy("source", "hash_rank")
    )


@register(
    "lang_mix_temperature",
    oracle=f"""
        WITH counts AS (
            SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
        ),
        rates AS (
            SELECT lang, n_docs,
                   SQRT((SELECT MIN(n_docs) FROM counts)::DOUBLE
                        / n_docs::DOUBLE) AS p
            FROM counts
        ),
        kept AS (
            SELECT d.lang, COUNT(*) AS n_kept
            FROM documents d JOIN rates r USING (lang)
            WHERE {_code_sql('doc_id', MIX_SALT)} / {float(H.P)} < r.p
            GROUP BY d.lang
        )
        SELECT r.lang,
               r.n_docs,
               CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
               ROUND(r.p, 6) AS target_rate
        FROM rates r LEFT JOIN kept k USING (lang)
        ORDER BY lang
    """,
    doc="Temperature-smoothed language mixing (alpha = 0.5): language "
    "l is kept with probability sqrt(n_min / n_l), so the resulting "
    "mix is proportional to n_l^alpha — the multinomial temperature "
    "reweighting used for multilingual pretraining corpora (mT5/XLM-R "
    "style), with the lowest-resource language kept in full. alpha is "
    "pinned to 0.5 because sqrt is IEEE correctly-rounded in both "
    "engines (fractional pow is not), keeping the keep/drop decision "
    "bit-identical.",
    tags=("sampling", "llm"),
)
def lang_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language keep-rate mixing; counts shuffle once on `lang`
    (tiny: one row per language), rates broadcast back onto the doc
    stream, so the corpus itself never shuffles — the right shape at
    100 TB where strata are few and documents are not."""
    docs = table(spark, sf_dir, "documents")
    # the per-language count table (one row per language) feeds the
    # min scalar, the rate table, and the final report; materialized
    # once, documents is scanned twice (count pass + keep pass), not
    # 5x (r11)
    counts = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .localCheckpoint(eager=False)
    )
    n_min = counts.agg(F.min("n_docs").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "lang",
        "n_docs",
        F.sqrt(F.col("n_min").cast("double") / F.col("n_docs").cast("double")).alias("p"),
    )
    u = _code(F.col("doc_id"), MIX_SALT) / float(H.P)
    kept = (
        docs.select("lang", u.alias("u"))
        .join(F.broadcast(rates.select("lang", "p")), "lang")
        .where(F.col("u") < F.col("p"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept, "lang", "left")
        .select(
            "lang",
            "n_docs",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.round("p", 6).alias("target_rate"),
        )
        .orderBy("lang")
    )


PACK_CAPACITY = 2048  # chars per bin (stand-in for a token budget)


@register(
    "pack_sequences",
    oracle=f"""
        SELECT source, bin_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM (
            SELECT source, n_chars,
                   CAST(FLOOR(COALESCE(SUM(n_chars) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) / {PACK_CAPACITY}) AS BIGINT) AS bin_id
            FROM documents
        )
        GROUP BY source, bin_id
        ORDER BY source, bin_id
    """,
    doc="Contiguous greedy sequence packing: docs stream per source in "
    "doc_id order; each lands in bin floor(running_chars / capacity). "
    "Batch analog of training-shard packing — one shuffle on source, "
    "then a window cumsum and a re-aggregation on (source, bin).",
    tags=("sampling",),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bin_id = F.floor(
        F.coalesce(F.sum("n_chars").over(w), F.lit(0)) / PACK_CAPACITY
    ).cast("long")
    return (
        docs.select("source", "n_chars", bin_id.alias("bin_id"))
        .groupBy("source", "bin_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("source", "bin_id")
    )


BUCKET_CHARS = 256  # length-bucket granularity (char stand-in for tokens)
BATCH_SIZE = 32     # rows per inference/training batch


@register(
    "length_bucketed_batches",
    oracle=f"""
        SELECT doc_id, len_bucket, batch_idx, pos_in_batch
        FROM (
            SELECT doc_id, len_bucket,
                   CAST((ROW_NUMBER() OVER (
                       PARTITION BY len_bucket ORDER BY n_chars, doc_id
                   ) - 1) // {BATCH_SIZE} AS BIGINT) AS batch_idx,
                   CAST((ROW_NUMBER() OVER (
                       PARTITION BY len_bucket ORDER BY n_chars, doc_id
                   ) - 1) % {BATCH_SIZE} AS BIGINT) AS pos_in_batch
            FROM (
                SELECT doc_id, n_chars,
                       CAST(n_chars // {BUCKET_CHARS} AS BIGINT) AS len_bucket
                FROM documents
            )
        )
        ORDER BY len_bucket, batch_idx, pos_in_batch
    """,
    doc="Length-bucketed batch assignment: documents group into "
    "fixed-size batches of near-equal length, the standard padding-"
    "waste reducer for batched LLM inference/training. Deterministic "
    "(no RNG): batches are a pure function of (n_chars, doc_id).",
    tags=("sampling", "llm"),
)
def length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle on len_bucket for the window; batch/pos arithmetic
    is a projection over the rank. At 100 TB the bucket count is
    bounded (max_len / granularity), so per-bucket windows are the
    skew concern — mitigated by bucketing on (len_bucket) only for
    the rank and never collecting batches driver-side."""
    docs = table(spark, sf_dir, "documents")
    bucket = F.floor(F.col("n_chars") / BUCKET_CHARS).cast("long")
    w = Window.partitionBy("len_bucket").orderBy("n_chars", "doc_id")
    rank0 = F.row_number().over(w) - 1
    return (
        docs.select("doc_id", "n_chars", bucket.alias("len_bucket"))
        .select(
            "doc_id",
            "len_bucket",
            F.floor(rank0 / BATCH_SIZE).cast("long").alias("batch_idx"),
            (rank0 % BATCH_SIZE).cast("long").alias("pos_in_batch"),
        )
        .orderBy("len_bucket", "batch_idx", "pos_in_batch")
    )


WEIGHTED_SALT = "wsample-v1"
WEIGHTED_K = 50


@register(
    "weighted_sample_topk",
    oracle=f"""
        WITH keyed AS (
            SELECT doc_id, n_chars,
                   ROUND(pow(
                       (1.0 + {_code_sql('doc_id', WEIGHTED_SALT)}) / {H.P + 1}.0,
                       1.0 / GREATEST(n_chars, 1)
                   ), 9) AS sample_key
            FROM documents
        )
        SELECT doc_id, n_chars, sample_key
        FROM keyed
        ORDER BY sample_key DESC, doc_id
        LIMIT {WEIGHTED_K}
    """,
    doc="Efraimidis-Spirakis weighted sampling (IPL 2006): key = "
    "u^(1/w) with u a deterministic hash uniform and w = n_chars; the "
    "global top-K by key IS a weighted sample without replacement. "
    "RNG-free (pure function of doc_id, like the rest of the sampling "
    "family), single narrow pass + global top-K — TakeOrderedAndProject, "
    "per-partition heaps, no full sort at any scale. Keys are ordered "
    "ROUNDED (9 dp, doc_id tiebreak) so both engines select the same "
    "set despite last-ulp pow() differences.",
    tags=("sampling", "llm"),
)
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    u = (1.0 + _code(F.col("doc_id"), WEIGHTED_SALT)) / float(H.P + 1)
    key = F.round(
        F.pow(u, 1.0 / F.greatest(F.col("n_chars"), F.lit(1))), 9
    )
    return (
        d.select("doc_id", "n_chars", key.alias("sample_key"))
        .orderBy(F.desc("sample_key"), "doc_id")
        .limit(WEIGHTED_K)
    )


# --- temporal (leakage-free) split -----------------------------------------

TEMPORAL_TRAIN_PCT = 80  # train on the first 80% of the time range


@register(
    "temporal_split",
    oracle=f"""
        WITH rng AS (
            SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
            FROM events
        ),
        labeled AS (
            SELECT user_id, event_type, epoch_us(ts) AS ts_us,
                   CASE WHEN epoch_us(ts) <
                            (SELECT mn + ((mx - mn) * {TEMPORAL_TRAIN_PCT})
                                       // 100
                             FROM rng)
                        THEN 'train' ELSE 'test' END AS split
            FROM events
        ),
        train_users AS (
            SELECT DISTINCT user_id FROM labeled WHERE split = 'train'
        )
        SELECT split,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT l.user_id) AS BIGINT) AS n_users,
               CAST(COUNT(DISTINCT CASE WHEN tu.user_id IS NOT NULL
                                        THEN l.user_id END) AS BIGINT)
                   AS warm_users,
               make_timestamp(MIN(ts_us)) AS first_ts,
               make_timestamp(MAX(ts_us)) AS last_ts
        FROM labeled l LEFT JOIN train_users tu ON l.user_id = tu.user_id
        GROUP BY split
        ORDER BY split
    """,
    doc=f"Temporal train/test split (train = first {TEMPORAL_TRAIN_PCT}% "
    "of the event-time range, integer micros arithmetic): the "
    "leakage-free complement of the hash-bucket split — evaluation "
    "data is strictly FUTURE relative to training data, the split "
    "every forecasting/recsys eval needs. Reports per-split event and "
    "user counts plus warm_users (test users already seen in train — "
    "the warm-start rate that determines whether the eval measures "
    "generalization to new users or new time). One scan + a "
    "user-level semi-join against the bounded train-user set.",
    tags=("llm", "sampling"),
)
def temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    rng = ev.agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
    )
    labeled = (
        ev.crossJoin(F.broadcast(rng))
        .select(
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("ts_us"),
            F.when(
                F.unix_micros("ts")
                < F.col("mn")
                + F.expr(f"((mx - mn) * {TEMPORAL_TRAIN_PCT}) div 100"),
                F.lit("train"),
            )
            .otherwise(F.lit("test"))
            .alias("split"),
        )
    )
    # ONE labeled pass (r11): aggregate to the (user, split) grid
    # first — per-split distinct users are its row counts, and the
    # warm flag (user has a train event) derives from the grid itself,
    # so the corpus-sized train-user join and the double distinct over
    # raw events are gone. events scans 4 -> 2 (range + label).
    grp = (
        labeled.groupBy("user_id", "split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts_us").alias("mn_us"),
            F.max("ts_us").alias("mx_us"),
        )
        .localCheckpoint(eager=False)
    )
    flags = grp.groupBy("user_id").agg(
        F.max((F.col("split") == "train").cast("int")).alias("has_train")
    )
    return (
        grp.join(flags, "user_id")
        .groupBy("split")
        .agg(
            F.sum("n").alias("n_events"),
            F.count(F.lit(1)).alias("n_users"),
            F.count_if(F.col("has_train") == 1).alias("warm_users"),
            F.timestamp_micros(F.min("mn_us")).alias("first_ts"),
            F.timestamp_micros(F.max("mx_us")).alias("last_ts"),
        )
        .orderBy("split")
    )


# --- deterministic bottom-k "reservoir" sample -----------------------------

RESERVOIR_K = 100
_RES_AB = H.hash_params(1, seed=8181)[0]


def reservoir_priorities(ev: DataFrame) -> DataFrame:
    """The priority projection — ONE definition shared by the
    registered batch query and the streaming reservoir maintainer
    (streaming/reservoir_stream.ReservoirMonitor)."""
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.round("value", 2).alias("value"),
        H.affine_col(F.col("event_id"), *_RES_AB).alias("priority"),
    )


def reservoir_rank(sample: DataFrame) -> DataFrame:
    """Rank the k-row bottom-k sample into the served output shape
    (window runs on k rows, never the corpus) — shared serving tail."""
    w = Window.orderBy("priority", "event_id")
    return sample.select(
        F.row_number().over(w).alias("sample_rank"),
        "event_id",
        "user_id",
        "event_type",
        "value",
        "priority",
    )


@register(
    "reservoir_sample_events",
    oracle=f"""
        WITH pri AS (
            SELECT event_id, user_id, event_type, ROUND(value, 2) AS value,
                   {H.affine_sql("event_id", *_RES_AB)} AS priority
            FROM events
        )
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY priority, event_id)
                    AS INTEGER) AS sample_rank,
               event_id, user_id, event_type, value,
               CAST(priority AS BIGINT) AS priority
        FROM pri
        ORDER BY priority, event_id
        LIMIT {RESERVOIR_K}
    """,
    doc="Fixed-size uniform sample without replacement via bottom-k "
    "priorities: each row's priority is the affine hash of its id (a "
    "bijection of [0, P), so the k smallest are a uniform k-subset), "
    "keep the k smallest. This is the DISTRIBUTED form of reservoir "
    "sampling: hash priorities are stable under any partitioning, "
    "re-execution, and data arrival order — Vitter's sequential "
    "algorithm R needs a single ordered pass, bottom-k needs only a "
    "per-partition top-k (TakeOrderedAndProject: no global sort, no "
    "shuffle of non-sample rows) and a k-row merge; the mergeability "
    "is also what makes it a one-pass streaming sketch. Oracle-exact "
    "because the priorities are engine-portable integers.",
    tags=("sampling", "sketch", "llm"),
)
def reservoir_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    pri = reservoir_priorities(ev)
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition
    # heap + driver merge of k rows); the rank window then runs on the
    # k-row result, not the corpus
    sample = pri.orderBy("priority", "event_id").limit(RESERVOIR_K)
    return reservoir_rank(sample)


# --- DSIR importance-weighted data selection ---------------------------------

DSIR_BUCKETS = 256
DSIR_TARGET_SOURCE = "src0"  # the curated slice whose distribution we want
DSIR_TOP_K = 100


@register(
    "dsir_importance_weights",
    oracle=None,  # built below (needs the tokens/str_code SQL helpers)
    doc="DSIR data selection (Xie et al. 2023, arXiv:2302.03169): "
    "score every document by how much it resembles a small target "
    "domain (here the curated 'src0' slice) under hashed unigram "
    "importance weights — log p_target(bucket)/p_corpus(bucket) "
    "averaged over the doc's tokens, add-1 smoothed; keep the top-K. "
    "Hashed features are the paper's own trick for a bounded, "
    "mergeable representation: the two distributions live in ONE "
    f"{DSIR_BUCKETS}-row bucket table (target count via conditional "
    "aggregation on the same scan), broadcast back to the exploded "
    "tokens, so corpus-sized work is one explode + one broadcast "
    "equi-join; orderBy+limit compiles to TakeOrderedAndProject "
    "(per-partition top-K, no global sort). Weights are rounded "
    "BEFORE the cutoff with doc_id tiebreak, so both engines select "
    "the identical K.",
    tags=("llm", "sampling"),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mvrs_dspa_spark.functions import text as T

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        "lang",
        F.explode(T.tokens_col(F.lower(F.col("text")))).alias("tok"),
    ).select(
        "doc_id",
        "source",
        "lang",
        F.pmod(H.str_code_col(F.col("tok")), F.lit(DSIR_BUCKETS)).alias(
            "bucket"
        ),
    # tokenize+hash runs once: toks feeds the bucket distribution AND
    # the per-doc scoring join (two corpus scans before r11); dist is
    # a <=DSIR_BUCKETS-row table read by the broadcast and the totals
    ).localCheckpoint(eager=False)
    dist = toks.groupBy("bucket").agg(
        F.count_if(F.col("source") == DSIR_TARGET_SOURCE).alias("n_t"),
        F.count(F.lit(1)).alias("n_c"),
    ).localCheckpoint(eager=False)
    tot = dist.agg(
        F.sum("n_t").alias("tt"), F.sum("n_c").alias("tc")
    )
    log_ratio = F.log(
        (F.col("n_t") + 1).cast("double") / (F.col("tt") + DSIR_BUCKETS)
    ) - F.log(
        (F.col("n_c") + 1).cast("double") / (F.col("tc") + DSIR_BUCKETS)
    )
    scored = (
        toks.join(F.broadcast(dist), "bucket")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(log_ratio), 6).alias("weight"),
        )
    )
    top = scored.orderBy(F.col("weight").desc(), "doc_id").limit(DSIR_TOP_K)
    w = Window.orderBy(F.col("weight").desc(), "doc_id")
    return top.select(
        F.row_number().over(w).alias("sel_rank"),
        "doc_id",
        "source",
        "lang",
        "n_tokens",
        "weight",
        (F.col("source") == DSIR_TARGET_SOURCE).alias("is_target"),
    )


def _patch_dsir_oracle() -> None:
    import dataclasses

    from mvrs_dspa_spark.functions import text as T
    from mvrs_dspa_spark.plans.registry import _REGISTRY

    spec = _REGISTRY["dsir_importance_weights"]
    if spec.oracle is not None:
        return
    bucket = f"({H.str_code_sql('tok')}) % {DSIR_BUCKETS}"
    _REGISTRY["dsir_importance_weights"] = dataclasses.replace(
        spec,
        oracle=f"""
            WITH toks AS (
                SELECT doc_id, source, lang,
                       unnest({T.tokens_sql('lower(text)')}) AS tok
                FROM documents
            ),
            b AS (
                SELECT doc_id, source, lang, {bucket} AS bucket FROM toks
            ),
            dist AS (
                SELECT bucket,
                       count_if(source = '{DSIR_TARGET_SOURCE}') AS n_t,
                       COUNT(*) AS n_c
                FROM b GROUP BY bucket
            ),
            tot AS (SELECT SUM(n_t) AS tt, SUM(n_c) AS tc FROM dist),
            scored AS (
                SELECT doc_id, source, lang,
                       CAST(COUNT(*) AS BIGINT) AS n_tokens,
                       ROUND(AVG(
                           LN(CAST(n_t + 1 AS DOUBLE)
                              / (tt + {DSIR_BUCKETS}))
                           - LN(CAST(n_c + 1 AS DOUBLE)
                                / (tc + {DSIR_BUCKETS}))), 6) AS weight
                FROM b JOIN dist USING (bucket) CROSS JOIN tot
                GROUP BY doc_id, source, lang
            )
            SELECT CAST(ROW_NUMBER() OVER
                       (ORDER BY weight DESC, doc_id) AS INT) AS sel_rank,
                   doc_id, source, lang, n_tokens, weight,
                   (source = '{DSIR_TARGET_SOURCE}') AS is_target
            FROM scored
            ORDER BY weight DESC, doc_id
            LIMIT {DSIR_TOP_K}
        """,
    )


_patch_dsir_oracle()


# --- DoReMi-style domain mixture reweighting ----------------------------------

DOREMI_ETA = 1.0  # exponentiated-gradient step size


@register(
    "doremi_domain_weights",
    oracle=f"""
        WITH toks AS (
            SELECT source, unnest(list_filter(
                       string_split_regex(lower(text), '\\s+'),
                       t -> t <> '')) AS tok
            FROM documents
        ),
        freq AS (SELECT tok, COUNT(*) AS n_w FROM toks GROUP BY tok),
        tot AS (SELECT SUM(n_w) AS n FROM freq),
        per_src AS (
            SELECT t.source,
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   SUM(CAST(ROUND(-log2(1.0 * f.n_w / o.n) * 1e6)
                            AS BIGINT)) AS bits_code
            FROM toks t JOIN freq f USING (tok) CROSS JOIN tot o
            GROUP BY t.source
        ),
        nd AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY source
        ),
        scored AS (
            SELECT p.source, nd.n_docs, p.n_tokens,
                   p.bits_code / (1e6 * p.n_tokens) AS bpt,
                   GREATEST(
                       p.bits_code / (1e6 * p.n_tokens)
                       - SUM(p.bits_code) OVER ()
                         / (1e6 * SUM(p.n_tokens) OVER ()),
                       0.0) AS excess
            FROM per_src p JOIN nd USING (source)
        ),
        coded AS (
            SELECT source, n_docs, n_tokens, bpt, excess,
                   CAST(ROUND(
                       (n_tokens / CAST(SUM(n_tokens) OVER () AS DOUBLE))
                       * EXP({DOREMI_ETA} * excess) * 1e9)
                       AS BIGINT) AS t_code
            FROM scored
        )
        SELECT source, n_docs, n_tokens,
               ROUND(bpt, 6) AS bits_per_token,
               ROUND(excess, 6) AS excess_bits,
               ROUND(t_code / CAST(SUM(t_code) OVER () AS DOUBLE), 6)
                   AS domain_weight
        FROM coded
        ORDER BY source
    """,
    doc="DoReMi-style domain mixture reweighting (Xie et al. 2023, "
    "arXiv:2305.10429): one exponentiated-gradient step that "
    "up-weights domains with EXCESS loss over the corpus reference — "
    "here the per-source bits/token under the corpus's own unigram "
    "LM (the same proxy #59 scores documents with; DoReMi proper "
    "iterates this with a trained proxy model). Completes the "
    "mixing family: temperature smoothing (#49) reweights by SIZE, "
    "this reweights by LEARNABILITY. Determinism: per-token bits are "
    "1e-6 int codes summed exactly; reference loss comes from the "
    "SAME integer sums via analytic windows over the bounded "
    "source-level table; the EG weight is coded to 1e-9 ints before "
    "the one normalizing division. Plan: one explode feeds the "
    "vocabulary aggregate and the scoring join (Zipf-skew handled "
    "by AQE exactly as in #59); everything after is arithmetic over "
    "one row per source.",
    tags=("sampling", "llm"),
)
def doremi_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mvrs_dspa_spark.functions.text import tokens_col

    docs = table(spark, sf_dir, "documents")
    # tokenize ONCE (r11): the arrays feed the vocabulary aggregate,
    # the scoring join, and the per-source doc counts (4 documents
    # scans before); the vocab-bounded frequency table materializes so
    # the total and the join read one build.
    t = docs.select(
        "source", tokens_col(F.lower(F.col("text"))).alias("toks")
    ).localCheckpoint(eager=False)
    toks = t.select("source", F.explode("toks").alias("tok"))
    freq = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_w"))
        .localCheckpoint(eager=False)
    )
    tot = freq.agg(F.sum("n_w").alias("n"))
    bits_code = F.round(
        -F.log2(F.lit(1.0) * F.col("n_w") / F.col("n")) * 1e6
    ).cast("long")
    per_src = (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(bits_code).alias("bits_code"),
        )
    )
    nd = t.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w_all = Window.partitionBy()
    bpt = F.col("bits_code") / (F.lit(1e6) * F.col("n_tokens"))
    ref = F.sum("bits_code").over(w_all) / (
        F.lit(1e6) * F.sum("n_tokens").over(w_all)
    )
    scored = per_src.join(nd, "source").select(
        "source",
        "n_docs",
        "n_tokens",
        bpt.alias("bpt"),
        F.greatest(bpt - ref, F.lit(0.0)).alias("excess"),
    )
    t_code = F.round(
        (F.col("n_tokens") / F.sum("n_tokens").over(w_all).cast("double"))
        * F.exp(F.lit(DOREMI_ETA) * F.col("excess"))
        * 1e9
    ).cast("long")
    coded = scored.withColumn("t_code", t_code)
    return coded.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round("bpt", 6).alias("bits_per_token"),
        F.round("excess", 6).alias("excess_bits"),
        F.round(
            F.col("t_code") / F.sum("t_code").over(w_all).cast("double"), 6
        ).alias("domain_weight"),
    ).orderBy("source")


# --- packing efficiency report ----------------------------------------------


@register(
    "pack_efficiency_report",
    oracle=f"""
        WITH packed AS (
            SELECT source, bin_id,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars
            FROM (
                SELECT source, n_chars,
                       CAST(FLOOR(COALESCE(SUM(n_chars) OVER (
                           PARTITION BY source ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING
                       ), 0) / {PACK_CAPACITY}) AS BIGINT) AS bin_id
                FROM documents
            )
            GROUP BY source, bin_id
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS bins_used,
               CAST(CEIL(SUM(total_chars)
                         / CAST({PACK_CAPACITY} AS DOUBLE)) AS BIGINT)
                   AS bins_lower_bound,
               CAST(SUM(total_chars) AS BIGINT) AS total_chars,
               ROUND(SUM(total_chars)
                     / (COUNT(*) * CAST({PACK_CAPACITY} AS DOUBLE)), 6)
                   AS fill_rate,
               CAST(COUNT(*) FILTER (WHERE total_chars > {PACK_CAPACITY})
                    AS BIGINT) AS overflow_bins,
               CAST(MAX(total_chars) AS BIGINT) AS max_bin_chars
        FROM packed
        GROUP BY source
        ORDER BY source
    """,
    doc="Packing-efficiency audit of the greedy contiguous packer "
    "(#45, same binning definition inline): per source — bins used "
    "vs the ceil(total/capacity) theoretical lower bound, fill rate, "
    "bins the start-position rule lets overflow capacity, and the "
    "worst bin. The report a trainer reads before choosing packing "
    "strategy (greedy-contiguous trades fill for perfect input "
    "locality; this quantifies the trade). Runs entirely on the "
    "(source, bin) aggregate of #45 — no extra corpus pass.",
    tags=("sampling", "llm"),
)
def pack_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    packed = pack_sequences(spark, sf_dir)
    return (
        packed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("bins_used"),
            F.ceil(
                F.sum("total_chars") / float(PACK_CAPACITY)
            ).cast("long").alias("bins_lower_bound"),
            F.sum("total_chars").cast("long").alias("total_chars"),
            F.round(
                F.sum("total_chars")
                / (F.count(F.lit(1)) * float(PACK_CAPACITY)),
                6,
            ).alias("fill_rate"),
            F.count_if(F.col("total_chars") > PACK_CAPACITY)
            .cast("long")
            .alias("overflow_bins"),
            F.max("total_chars").cast("long").alias("max_bin_chars"),
        )
        .orderBy("source")
    )


# --- deterministic per-epoch shuffle order ----------------------------------
#
# A trainer needs a NEW deterministic order each epoch — decorrelated
# across epochs, reproducible across restarts, and shardable without a
# global sort. Per epoch e, each doc's sort key is an independent
# affine hash; docs shard by key mod N_EPOCH_SHARDS and take their
# position WITHIN the shard (windows per (epoch, shard) — the #52
# shard-manifest idiom, never a corpus-wide rank).

EPOCHS = 2
N_EPOCH_SHARDS = 8
_EPOCH_ABS = H.hash_params(EPOCHS, seed=515)


@register(
    "epoch_shuffle_order",
    oracle=f"""
        WITH keyed AS (
            SELECT e.epoch, d.doc_id,
                   CASE e.epoch {" ".join(
                       f"WHEN {e} THEN {H.affine_sql('d.doc_id', *ab)}"
                       for e, ab in enumerate(_EPOCH_ABS)
                   )} END AS k
            FROM documents d,
                 (SELECT unnest(generate_series(0, {EPOCHS - 1})) AS epoch) e
        )
        SELECT epoch,
               CAST(k % {N_EPOCH_SHARDS} AS BIGINT) AS shard,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY epoch, k % {N_EPOCH_SHARDS}
                   ORDER BY k, doc_id) - 1 AS BIGINT) AS pos,
               doc_id
        FROM keyed
        ORDER BY epoch, shard, pos
    """,
    doc=f"Deterministic per-epoch training shuffle ({EPOCHS} epochs x "
    f"{N_EPOCH_SHARDS} shards): each epoch keys every doc with an "
    "independent member of the affine family, shards by key, and "
    "ranks within (epoch, shard) — a fresh decorrelated order every "
    "epoch (cross-epoch rank correlation ~0, pytest-pinned) with NO "
    "corpus-wide sort (the #52 shard-manifest scale idiom), "
    "reproducible across restarts because the keys are pure "
    "functions of doc_id. The dataloader-side companion of the "
    "shard manifest #52 and curriculum phases #90.",
    tags=("sampling", "llm"),
)
def epoch_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id")
    frames = []
    for e, ab in enumerate(_EPOCH_ABS):
        frames.append(
            docs.select(
                F.lit(e).alias("epoch"),
                "doc_id",
                H.affine_col(F.col("doc_id"), *ab).alias("k"),
            )
        )
    keyed = frames[0]
    for f2 in frames[1:]:
        keyed = keyed.unionByName(f2)
    w = Window.partitionBy("epoch", F.col("k") % N_EPOCH_SHARDS).orderBy(
        "k", "doc_id"
    )
    return keyed.select(
        "epoch",
        (F.col("k") % N_EPOCH_SHARDS).cast("long").alias("shard"),
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
        "doc_id",
    ).orderBy("epoch", "shard", "pos")
