"""Data-quality constraint checking (SURVEY §2f #56).

Every serious ingest pipeline runs declarative validation (dbt tests /
Deequ-style constraints) before downstream jobs consume a batch. This
expresses the engine's star schema contracts — domain bounds,
referential integrity, key uniqueness, derived-column consistency — as
ONE DataFrame: a union of scalar violation counts, each independently
scan-bound.

Scale shape: domain/consistency rules are narrow scan+agg passes
(embarrassingly parallel); the referential rules are anti joins whose
build side is the smaller key set (broadcast at dim sizes, shuffle
otherwise — Catalyst picks); key-uniqueness is one groupBy on the key.
Nothing here shuffles the fact tables more than once per rule, and the
union output is a handful of scalar rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mvrs_dspa_spark.plans.registry import register
from mvrs_dspa_spark.tables import table


def _rule(name: str, count_df: DataFrame) -> DataFrame:
    return count_df.select(
        F.lit(name).alias("rule"), F.col("n").cast("long").alias("n_violations")
    )


def _rules_from_one_scan(stats_df: DataFrame, names: list[str]) -> DataFrame:
    """Explode one single-row aggregate (one column per rule, in
    ``names`` order) into per-rule (rule, n_violations) rows — N rules
    over a table cost ONE scan instead of N."""
    cols = stats_df.columns
    return stats_df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col(c).cast("long").alias("n_violations"),
                    )
                    for name, c in zip(names, cols)
                ]
            )
        ).alias("r")
    ).select("r.rule", "r.n_violations")


@register(
    "constraint_violations",
    oracle="""
        SELECT rule, n_violations FROM (
            SELECT 'events.duplicate_event_id' AS rule,
                   CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) AS n_violations
            FROM events
            UNION ALL
            SELECT 'events.value_negative_or_null',
                   CAST(COUNT(*) FILTER (WHERE value IS NULL OR value < 0) AS BIGINT)
            FROM events
            UNION ALL
            SELECT 'documents.n_chars_mismatch',
                   CAST(COUNT(*) FILTER (WHERE n_chars <> length(text)) AS BIGINT)
            FROM documents
            UNION ALL
            SELECT 'lineitem.quantity_not_positive',
                   CAST(COUNT(*) FILTER (WHERE l_quantity <= 0) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'lineitem.discount_out_of_range',
                   CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 1) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'lineitem.orphan_orderkey',
                   CAST(COUNT(*) AS BIGINT)
            FROM lineitem ANTI JOIN orders ON l_orderkey = o_orderkey
            UNION ALL
            SELECT 'orders.orphan_custkey',
                   CAST(COUNT(*) AS BIGINT)
            FROM orders ANTI JOIN customer ON o_custkey = c_custkey
        )
        ORDER BY rule
    """,
    doc="Deequ/dbt-style batch validation: domain bounds, referential "
    "integrity (anti-join counts), key uniqueness, derived-column "
    "consistency — one unioned violation-count report per ingest "
    "batch.",
    tags=("relational", "validation"),
)
def constraint_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    docs = table(spark, sf_dir, "documents")
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")

    # per-table rule groups fold into ONE aggregation each (r11): the
    # duplicate-id and value-domain rules previously scanned events
    # twice, and the two lineitem domain rules scanned lineitem twice —
    # a combined agg computes every per-table count in one pass (the
    # distinct-id rewrite carries the count_if partials through its
    # event_id shuffle for free) and an explode splits the single
    # stats row back into per-rule rows.
    rules = [
        _rules_from_one_scan(
            ev.agg(
                (F.count(F.lit(1)) - F.countDistinct("event_id")).alias("dup"),
                F.count_if(
                    F.col("value").isNull() | (F.col("value") < 0)
                ).alias("neg"),
            ),
            ["events.duplicate_event_id", "events.value_negative_or_null"],
        ),
        _rule(
            "documents.n_chars_mismatch",
            docs.agg(
                F.count_if(F.col("n_chars") != F.length("text")).alias("n")
            ),
        ),
        _rules_from_one_scan(
            li.agg(
                F.count_if(F.col("l_quantity") <= 0).alias("qty"),
                F.count_if(
                    (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
                ).alias("disc"),
            ),
            [
                "lineitem.quantity_not_positive",
                "lineitem.discount_out_of_range",
            ],
        ),
        _rule(
            "lineitem.orphan_orderkey",
            li.join(
                orders, li.l_orderkey == orders.o_orderkey, "left_anti"
            ).agg(F.count(F.lit(1)).alias("n")),
        ),
        _rule(
            "orders.orphan_custkey",
            orders.join(
                cust, orders.o_custkey == cust.c_custkey, "left_anti"
            ).agg(F.count(F.lit(1)).alias("n")),
        ),
    ]
    out = rules[0]
    for r in rules[1:]:
        out = out.unionByName(r)
    return out.orderBy("rule")




@register(
    "events_profile",
    oracle="""
        SELECT col_name, n_rows, n_null, n_distinct, min_num, max_num
        FROM (
            SELECT 'event_id' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_null,
                   CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
                   MIN(event_id)::DOUBLE AS min_num,
                   MAX(event_id)::DOUBLE AS max_num
            FROM events
            UNION ALL
            SELECT 'ts', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(ts) AS BIGINT),
                   CAST(COUNT(DISTINCT ts) AS BIGINT),
                   epoch_us(MIN(ts))::DOUBLE, epoch_us(MAX(ts))::DOUBLE
            FROM events
            UNION ALL
            SELECT 'user_id', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(user_id) AS BIGINT),
                   CAST(COUNT(DISTINCT user_id) AS BIGINT),
                   MIN(user_id)::DOUBLE, MAX(user_id)::DOUBLE
            FROM events
            UNION ALL
            SELECT 'event_type', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(event_type) AS BIGINT),
                   CAST(COUNT(DISTINCT event_type) AS BIGINT),
                   NULL, NULL
            FROM events
            UNION ALL
            SELECT 'value', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(value) AS BIGINT),
                   CAST(COUNT(DISTINCT value) AS BIGINT),
                   ROUND(MIN(value), 6), ROUND(MAX(value), 6)
            FROM events
            UNION ALL
            SELECT 'props', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(props) AS BIGINT),
                   CAST(COUNT(DISTINCT props) AS BIGINT),
                   NULL, NULL
            FROM events
        )
        ORDER BY col_name
    """,
    doc="Deequ/dbt-style column profile of the events table: row/null/"
    "exact-distinct counts per column, numeric min/max (timestamps as "
    "unix micros; strings skip min/max — cross-engine string "
    "formatting is not canonical). One logical pass per column, each "
    "scan-bound and narrow; Catalyst shares the scan across the "
    "unioned aggregates.",
    tags=("validation",),
)
def events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")

    # ONE combined aggregation for all six column profiles (r11;
    # before, each column ran its own full-table agg — 6 events scans).
    # Multiple count-distincts compile to one Expand-based aggregate
    # whose shuffle carries the same bytes as the six separate
    # per-column distinct shuffles combined, but the table is scanned
    # once. The single stats row then explodes back into the per-column
    # report rows.
    null_d = F.lit(None).cast("double")
    specs = [
        ("event_id", F.min("event_id").cast("double"),
         F.max("event_id").cast("double")),
        ("ts", F.unix_micros(F.min("ts")).cast("double"),
         F.unix_micros(F.max("ts")).cast("double")),
        ("user_id", F.min("user_id").cast("double"),
         F.max("user_id").cast("double")),
        ("event_type", null_d, null_d),
        ("value", F.round(F.min("value"), 6), F.round(F.max("value"), 6)),
        ("props", null_d, null_d),
    ]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col, mn, mx in specs:
        aggs += [
            F.count(col).alias(f"cnt_{col}"),
            F.countDistinct(col).alias(f"nd_{col}"),
            mn.alias(f"mn_{col}"),
            mx.alias(f"mx_{col}"),
        ]
    stats = ev.agg(*aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(col).alias("col_name"),
                    F.col("n_rows").alias("n_rows"),
                    (F.col("n_rows") - F.col(f"cnt_{col}")).alias("n_null"),
                    F.col(f"nd_{col}").alias("n_distinct"),
                    F.col(f"mn_{col}").alias("min_num"),
                    F.col(f"mx_{col}").alias("max_num"),
                )
                for col, _, _ in specs
            ]
        )
    )
    return (
        stats.select(rows.alias("r"))
        .select("r.*")
        .orderBy("col_name")
    )


@register(
    "props_key_profile",
    oracle="""
        WITH kv AS (
            SELECT k, json_extract_string(props, '$.' || k) AS v
            FROM (SELECT props, unnest(json_keys(props)) AS k FROM events)
        )
        SELECT k AS key,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
               CAST(COUNT(TRY_CAST(v AS BIGINT)) AS BIGINT) AS n_numeric,
               MIN(TRY_CAST(v AS BIGINT)) AS min_num,
               MAX(TRY_CAST(v AS BIGINT)) AS max_num
        FROM kv
        GROUP BY k
        ORDER BY k
    """,
    doc="Semi-structured profiling of the props JSON column: per key, "
    "occurrence count, distinct values, numeric-parse rate, and "
    "numeric range — the schema-inference report for a column whose "
    "schema lives in the data. Spark side explodes "
    "from_json(map<string,string>) (one JSON parse per row, "
    "JVM-side); one shuffle on the bounded key vocabulary.",
    tags=("validation",),
)
def props_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    kv = (
        table(spark, sf_dir, "events")
        .select(
            F.explode(
                F.from_json("props", "map<string,string>")
            ).alias("key", "v")
        )
    )
    num = F.expr("try_cast(v AS bigint)")
    return (
        kv.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("v").alias("n_distinct"),
            F.count(num).alias("n_numeric"),
            F.min(num).alias("min_num"),
            F.max(num).alias("max_num"),
        )
        .orderBy("key")
    )


# --- k-anonymity audit ------------------------------------------------------

K_ANON = 5
_LEN_BUCKET = 100  # n_chars quantized to 100-char buckets


@register(
    "k_anonymity_report",
    oracle=f"""
        SELECT lang, source,
               CAST(n_chars // {_LEN_BUCKET} AS BIGINT) AS len_bucket,
               CAST(COUNT(*) AS BIGINT) AS group_size
        FROM documents
        GROUP BY 1, 2, 3
        HAVING COUNT(*) < {K_ANON}
        ORDER BY lang, source, len_bucket
    """,
    doc=f"k-anonymity audit (k={K_ANON}) over the quasi-identifier "
    f"tuple (lang, source, {_LEN_BUCKET}-char length bucket): groups "
    "smaller than k are re-identification risks — releasing or "
    "training on them can expose individual documents' provenance. "
    "The data-governance check run before publishing corpus "
    "statistics (Sweeney 2002). One scan, one bounded-key shuffle; "
    "the HAVING filter is evaluated post-aggregation on the "
    "group-cardinality-bounded result.",
    tags=("validation", "llm"),
)
def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy(
            "lang",
            "source",
            F.expr(f"n_chars div {_LEN_BUCKET}").alias("len_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("group_size"))
        .where(F.col("group_size") < K_ANON)
        .orderBy("lang", "source", "len_bucket")
    )


# --- l-diversity audit ------------------------------------------------------

L_DIV = 5
_VALUE_BAND = 10  # event value quantized to 10-unit bands


@register(
    "l_diversity_report",
    oracle=f"""
        WITH cells AS (
            SELECT event_type,
                   CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
                   CAST(FLOOR(value / {_VALUE_BAND}) AS BIGINT) AS value_band,
                   user_id, COUNT(*) AS n
            FROM events GROUP BY 1, 2, 3, 4
        )
        SELECT event_type, hod, value_band,
               CAST(SUM(n) AS BIGINT) AS group_size,
               CAST(COUNT(*) AS BIGINT) AS l_distinct,
               ROUND(EXP(LN(CAST(SUM(n) AS DOUBLE))
                         - SUM(n * LN(CAST(n AS DOUBLE)))
                           / CAST(SUM(n) AS DOUBLE)), 4) AS entropy_l
        FROM cells
        GROUP BY 1, 2, 3
        HAVING COUNT(*) < {L_DIV}
        ORDER BY event_type, hod, value_band
    """,
    doc=f"l-diversity audit (l={L_DIV}, Machanavajjhala et al. 2007) — "
    "the successor check to k-anonymity (#56b): a group can be large "
    "enough to pass k yet still leak if everyone in it shares the "
    "sensitive value. Quasi-identifier tuple (event_type, hour-of-day, "
    f"{_VALUE_BAND}-unit value band), sensitive attribute user_id; "
    "groups with fewer than l distinct users are homogeneity-attack "
    "risks. Reports distinct-l plus ENTROPY-l (exp of the Shannon "
    "entropy of the within-group user distribution, the stricter "
    "variant that also catches 99%-one-user skew) computed "
    "algebraically from sum(n ln n) — corpus-sized work is one "
    "(QI, user) aggregation, the QI rollup runs on the cell table.",
    tags=("validation", "llm"),
)
def l_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type",
        F.hour("ts").cast("long").alias("hod"),
        F.floor(F.col("value") / _VALUE_BAND).cast("long").alias(
            "value_band"
        ),
        "user_id",
    ).agg(F.count(F.lit(1)).alias("n"))
    gs = F.sum("n")
    return (
        cells.groupBy("event_type", "hod", "value_band")
        .agg(
            gs.alias("group_size"),
            F.count(F.lit(1)).alias("l_distinct"),
            F.round(
                F.exp(
                    F.log(gs.cast("double"))
                    - F.sum(F.col("n") * F.log(F.col("n").cast("double")))
                    / gs.cast("double")
                ),
                4,
            ).alias("entropy_l"),
        )
        .where(F.col("l_distinct") < L_DIV)
        .orderBy("event_type", "hod", "value_band")
    )


# --- snapshot reconciliation diff ------------------------------------------


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff of two keyed snapshots: added / removed / changed.

    The data-reconciliation primitive behind migration sign-offs and
    pipeline-regression checks ("does v2 of the job produce the same
    table?"). One full outer join on the key — both sides shuffle once
    on the same key, so at 100 TB this is join-key-partitioned work
    with no driver involvement; `changed` compares via null-safe
    equality so NULL -> value transitions are caught.
    """
    o = old.select(
        *key_cols, *[F.col(c).alias(f"old_{c}") for c in compare_cols]
    )
    n = new.select(
        *key_cols, *[F.col(c).alias(f"new_{c}") for c in compare_cols]
    )
    joined = o.join(n, key_cols, "full")
    in_old = F.col(f"old_{compare_cols[0]}").isNotNull()
    in_new = F.col(f"new_{compare_cols[0]}").isNotNull()
    same = None
    for c in compare_cols:
        eq = F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        same = eq if same is None else (same & eq)
    status = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(~same, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.withColumn("status", status)


@register(
    "events_snapshot_diff",
    oracle="""
        WITH rng AS (
            SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
            FROM events
        ),
        per_user AS (
            SELECT user_id,
                   count_if(epoch_us(ts) <
                       (SELECT mn + (mx - mn) // 2 FROM rng)) AS old_n,
                   count_if(epoch_us(ts) >=
                       (SELECT mn + (mx - mn) // 2 FROM rng)) AS new_n,
                   ROUND(SUM(CASE WHEN epoch_us(ts) <
                       (SELECT mn + (mx - mn) // 2 FROM rng)
                       THEN value END), 2) AS old_value,
                   ROUND(SUM(CASE WHEN epoch_us(ts) >=
                       (SELECT mn + (mx - mn) // 2 FROM rng)
                       THEN value END), 2) AS new_value
            FROM events GROUP BY user_id
        )
        SELECT user_id,
               CASE WHEN old_n = 0 THEN 'added'
                    WHEN new_n = 0 THEN 'removed'
                    ELSE 'changed' END AS status,
               CAST(old_n AS BIGINT) AS old_n,
               CAST(new_n AS BIGINT) AS new_n,
               old_value, new_value
        FROM per_user
        WHERE old_n <> new_n
           OR old_value IS DISTINCT FROM new_value
        ORDER BY user_id
    """,
    doc="Snapshot reconciliation: per-user activity profile of the "
    "second half of the time range diffed against the first half — "
    "users added / removed / changed between the two snapshots, with "
    "both profiles side by side. Computed as ONE conditional "
    "aggregation over a single scan (count_if/sum-case per period), "
    "NOT a self-join of two snapshot subqueries: half the reads, one "
    "shuffle, and the full-outer-join semantics fall out of the "
    "period counts. The generic two-frame form is `table_diff` "
    "(full outer join on the key, null-safe column compare).",
    tags=("validation", "relational"),
)
def events_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    rng = ev.agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
    )
    labeled = ev.crossJoin(F.broadcast(rng)).select(
        "user_id",
        "value",
        (
            F.unix_micros("ts") < F.col("mn") + F.expr("(mx - mn) div 2")
        ).alias("is_old"),
    )
    per_user = labeled.groupBy("user_id").agg(
        F.count_if("is_old").alias("old_n"),
        F.count_if(~F.col("is_old")).alias("new_n"),
        F.round(F.sum(F.when(F.col("is_old"), F.col("value"))), 2).alias(
            "old_value"
        ),
        F.round(F.sum(F.when(~F.col("is_old"), F.col("value"))), 2).alias(
            "new_value"
        ),
    )
    status = (
        F.when(F.col("old_n") == 0, F.lit("added"))
        .when(F.col("new_n") == 0, F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    return (
        per_user.where(
            (F.col("old_n") != F.col("new_n"))
            | ~F.col("old_value").eqNullSafe(F.col("new_value"))
        )
        .select("user_id", status.alias("status"), "old_n", "new_n",
                "old_value", "new_value")
        .orderBy("user_id")
    )


# --- quarantine split (expectations enforcement) ---------------------------

# (rule name, Spark predicate builder, DuckDB predicate SQL) — a row
# FAILS the rule when the predicate is true. Shared order defines the
# reasons string on both engines.
_QUARANTINE_RULES_SQL = (
    ("value_out_of_range", "value IS NULL OR value < 0 OR value > 100000"),
    ("ts_out_of_range",
     "ts IS NULL OR ts < TIMESTAMP '2020-01-01' OR ts >= TIMESTAMP '2030-01-01'"),
    ("unknown_event_type",
     "event_type IS NULL OR event_type NOT IN "
     "('click', 'error', 'purchase', 'signup', 'view')"),
    ("negative_user_id", "user_id IS NULL OR user_id < 0"),
)


def _quarantine_preds_spark():
    from pyspark.sql import functions as F

    ts_lo = F.lit("2020-01-01").cast("timestamp")
    ts_hi = F.lit("2030-01-01").cast("timestamp")
    kinds = ("click", "error", "purchase", "signup", "view")
    return (
        ("value_out_of_range",
         F.col("value").isNull() | (F.col("value") < 0) | (F.col("value") > 100000)),
        ("ts_out_of_range",
         F.col("ts").isNull() | (F.col("ts") < ts_lo) | (F.col("ts") >= ts_hi)),
        ("unknown_event_type",
         F.col("event_type").isNull() | ~F.col("event_type").isin(*kinds)),
        ("negative_user_id",
         F.col("user_id").isNull() | (F.col("user_id") < 0)),
    )


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined) — expectations enforcement (Delta Live
    Tables expectations / dbt severity-error analog): rows failing any
    rule land in quarantine WITH their comma-joined reason list; clean
    rows pass through untouched. One scan, two filtered projections —
    Spark computes both sides from the same shuffle-free plan, so at
    100 TB this costs one pass over the data, not one per rule.

    The report twin is `constraint_violations` (counts per rule);
    this is the enforcement form a pipeline actually wires between
    ingest and merge, with the quarantine table as the re-drive queue.
    """
    from pyspark.sql import functions as F

    preds = _quarantine_preds_spark()
    reasons = F.array_join(
        F.filter(
            F.array(*[F.when(p, F.lit(name)) for name, p in preds]),
            lambda x: x.isNotNull(),
        ),
        ",",
    )
    tagged = df.withColumn("reasons", reasons)
    good = tagged.where(F.col("reasons") == "").drop("reasons")
    bad = tagged.where(F.col("reasons") != "")
    return good, bad


@register(
    "events_quarantine",
    oracle=f"""
        SELECT event_id,
               array_to_string(list_filter([
                   {", ".join(
                       f"CASE WHEN {sql} THEN '{name}' END"
                       for name, sql in _QUARANTINE_RULES_SQL
                   )}
               ], x -> x IS NOT NULL), ',') AS reasons
        FROM events
        WHERE {" OR ".join(f"({sql})" for _, sql in _QUARANTINE_RULES_SQL)}
        ORDER BY event_id
    """,
    doc="Quarantined event rows with their failure reasons (DLT "
    "expectations / dbt severity-error enforcement form of the "
    "constraint_violations report): every row failing any domain rule, "
    "with the comma-joined ordered reason list — the re-drive queue a "
    "pipeline writes between ingest and merge. Pure projection + "
    "filter over one scan; rules are declared ONCE and compiled to "
    "both engines, so gate and oracle can't drift.",
    tags=("validation",),
)
def events_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, bad = quarantine_split(table(spark, sf_dir, "events"))
    return bad.select("event_id", "reasons").orderBy("event_id")


# --- GDPR erasure-cascade audit ----------------------------------------------

ERASE_PCT = 1  # simulated right-to-be-forgotten cohort: 1% of keys


def _erase_cohort_sql(key: str) -> str:
    from mvrs_dspa_spark.functions import hashing as H

    salted = "'gdpr:' || (" + key + ")::VARCHAR"
    return f"({H.str_code_sql(salted)}) % 100 < {ERASE_PCT}"


def _erase_cohort_col(key: F.Column) -> F.Column:
    from mvrs_dspa_spark.functions import hashing as H

    return (
        H.str_code_col(F.concat(F.lit("gdpr:"), key.cast("string"))) % 100
        < ERASE_PCT
    )


@register(
    "gdpr_erasure_audit",
    oracle=f"""
        WITH del_cust AS (
            SELECT c_custkey FROM customer
            WHERE {_erase_cohort_sql('c_custkey')}
        ),
        del_orders AS (
            SELECT o_orderkey, o_custkey FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM del_cust)
        ),
        del_li AS (
            SELECT l_orderkey FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders)
        ),
        del_ev AS (
            SELECT user_id FROM events
            WHERE {_erase_cohort_sql('user_id')}
        )
        SELECT * FROM (
            SELECT 'customer' AS table_name,
                   CAST(COUNT(*) AS BIGINT) AS rows_to_erase,
                   CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS keys_affected
            FROM del_cust
            UNION ALL
            SELECT 'orders', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
            FROM del_orders
            UNION ALL
            SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
            FROM del_li
            UNION ALL
            SELECT 'events', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(DISTINCT user_id) AS BIGINT)
            FROM del_ev
        )
        ORDER BY table_name
    """,
    doc="GDPR right-to-be-forgotten erasure audit: given a deletion "
    f"cohort ({ERASE_PCT}% of subject keys by salted hash — in "
    "production the request table), report every row the erasure "
    "cascade must touch across the star schema BEFORE running it: the "
    "customers themselves, their orders, the lineitems of those orders "
    "(two-hop cascade through the foreign-key chain), and the "
    "subjects' event-log rows. The pre-flight sizing/sign-off report a "
    "deletion pipeline emits before a destructive MERGE DELETE. "
    "Cascades are semi joins down the key chain — each hop shuffles on "
    "its own join key exactly once, no row ever widens — and the "
    "output is one row per table. The same predicate drives the actual "
    "delete, so audit and deletion cannot drift.",
    tags=("validation", "relational"),
)
def gdpr_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    ev = table(spark, sf_dir, "events")

    del_cust = cust.where(_erase_cohort_col(F.col("c_custkey"))).select(
        "c_custkey"
    )
    del_orders = orders.join(
        del_cust, orders["o_custkey"] == del_cust["c_custkey"], "left_semi"
    ).select("o_orderkey", "o_custkey")
    del_li = li.join(
        del_orders.select("o_orderkey"),
        li["l_orderkey"] == F.col("o_orderkey"),
        "left_semi",
    ).select("l_orderkey")
    del_ev = ev.where(_erase_cohort_col(F.col("user_id"))).select("user_id")

    def summary(df: DataFrame, name: str, key: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("rows_to_erase"),
            F.countDistinct(key).alias("keys_affected"),
        )

    return (
        summary(del_cust, "customer", "c_custkey")
        .unionByName(summary(del_orders, "orders", "o_custkey"))
        .unionByName(summary(del_li, "lineitem", "l_orderkey"))
        .unionByName(summary(del_ev, "events", "user_id"))
        .orderBy("table_name")
    )
