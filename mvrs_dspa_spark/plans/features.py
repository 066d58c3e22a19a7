"""Feature-engineering / release block (SURVEY §2 #137-140, round 6).

Four query surfaces a training-data platform needs around its model
pipelines, each a declarative plan with a DuckDB oracle twin:

- ``woe_information_value`` — weight-of-evidence encoding + information
  value of categorical feature bins against a binary target (the
  credit-scoring standard; Siddiqi 2006).
- ``wilson_ctr_ranking`` — Wilson score lower-bound ranking of
  per-user conversion rates (Wilson 1927; the "sort by best" idiom
  that beats naive rate ranking for small n).
- ``zorder_clustering`` — Z-order (Morton) bit-interleaved layout
  assignment over two join/filter dimensions with per-file min-max
  pruning stats (the Delta/Iceberg OPTIMIZE ZORDER idiom; Morton
  1966). Extends the single-key range clustering of the compaction
  operator (29i) to multi-dimensional data-skipping.
- ``dp_event_counts`` — differentially-private released counts via the
  Laplace mechanism (Dwork et al. 2006) with a deterministic
  hash-seeded noise stream so the release is reproducible and
  cross-engine checkable (test posture; a production release would
  draw from a CSPRNG).

House determinism rules throughout: integer sufficient statistics,
one final float expression rounded on both sides, feature-level sums
carried as exact 1e-6-scaled int64 codes so summation order cannot
move a hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mvrs_dspa_spark.functions import hashing as H
from mvrs_dspa_spark.plans.registry import register
from mvrs_dspa_spark.tables import table

_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000


# --- weight of evidence / information value ----------------------------------
#
# Binary target: is the event a purchase. Three categorical feature
# binnings, each derivable without a corpus-wide window:
#   dow      day-of-week bucket (epoch-day mod 7)        7 bins
#   hour6    six-hour time-of-day bucket                 4 bins
#   value_b  fixed-width $100 value band, clamped at 4   5 bins
# WOE per bin with +0.5 count smoothing; IV as the sum of per-bin
# contributions, summed as exact 1e-6 int codes.

_WOE_BINS_SQL = f"""
    SELECT 'dow' AS feature,
           (epoch_us(ts) // {_DAY_US}) % 7 AS bin,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
    FROM events
    UNION ALL
    SELECT 'hour6',
           ((epoch_us(ts) // {_HOUR_US}) % 24) // 6,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
    FROM events
    UNION ALL
    SELECT 'value_b',
           LEAST(CAST(ROUND(value * 100) AS BIGINT) // 10000, 4),
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
    FROM events
"""


@register(
    "woe_information_value",
    oracle=f"""
        WITH binned AS ({_WOE_BINS_SQL}),
        cells AS (
            SELECT feature, bin,
                   SUM(y) AS n_pos, SUM(1 - y) AS n_neg
            FROM binned GROUP BY feature, bin
        ),
        tot AS (
            SELECT SUM(y) AS pos_tot, SUM(1 - y) AS neg_tot
            FROM binned WHERE feature = 'dow'
        ),
        scored AS (
            SELECT feature, bin,
                   CAST(n_pos AS BIGINT) AS n_pos,
                   CAST(n_neg AS BIGINT) AS n_neg,
                   LN(((n_pos + 0.5) / pos_tot)
                      / ((n_neg + 0.5) / neg_tot)) AS woe_raw,
                   ((n_pos + 0.5) / pos_tot - (n_neg + 0.5) / neg_tot)
                       * LN(((n_pos + 0.5) / pos_tot)
                            / ((n_neg + 0.5) / neg_tot)) AS iv_raw
            FROM cells CROSS JOIN tot
        )
        SELECT feature, bin, n_pos, n_neg,
               ROUND(woe_raw, 6) AS woe,
               ROUND(iv_raw, 6) AS iv_term,
               ROUND(SUM(CAST(ROUND(iv_raw * 1e6) AS BIGINT))
                         OVER (PARTITION BY feature) / 1e6,
                     6) AS feature_iv
        FROM scored
        ORDER BY feature, bin
    """,
    doc="Weight-of-evidence encoding + information value (Siddiqi "
    "2006, the credit-scoring feature screen): per categorical bin, "
    "WOE = ln of the smoothed positive-share over negative-share "
    "ratio against the purchase target, and per feature the IV sum "
    "that ranks predictive power (rule of thumb: IV > 0.1 medium, "
    "> 0.3 strong). All three binnings are O(1) per row (epoch "
    "arithmetic and a clamped fixed-width band — no corpus window), "
    "so the plan is one union scan -> one groupBy on <= 16 cells; "
    "totals ride a 1-row cross join. Counts are exact int64; the "
    "only floats are the final WOE/IV expressions, written with "
    "identical operation order in both engines and rounded to 6; the "
    "feature-level IV sums 1e-6-scaled int codes so the <= 7-term "
    "summation order cannot shift the hash. The WOE values double as "
    "the encoder lookup table for #123's supervised-encoding family.",
    tags=("analytics", "llm", "features"),
)
def woe_information_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    # ONE events scan (r11): the three feature binnings come from a
    # single map-side explode instead of three union branches (each a
    # full scan), and the totals are exactly the dow-feature cell sums
    # of the bounded grid (every event lands in exactly one dow bin) —
    # before, 4 events scans; now 1.
    bins = [
        ("dow", (F.expr(f"unix_micros(ts) div {_DAY_US}") % 7)),
        (
            "hour6",
            F.expr(f"(unix_micros(ts) div {_HOUR_US}) % 24 div 6"),
        ),
        (
            "value_b",
            F.least(
                F.expr("cast(round(value * 100) as bigint) div 10000"),
                F.lit(4).cast("long"),
            ),
        ),
    ]
    binned = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("feature"),
                        col.cast("long").alias("bin"),
                        y.alias("y"),
                    )
                    for name, col in bins
                ]
            )
        ).alias("r")
    ).select("r.feature", "r.bin", "r.y")
    cells = (
        binned.groupBy("feature", "bin")
        .agg(
            F.sum("y").alias("n_pos"),
            F.sum(F.lit(1) - F.col("y")).alias("n_neg"),
        )
        .localCheckpoint(eager=False)
    )
    tot = cells.filter(F.col("feature") == "dow").agg(
        F.sum("n_pos").alias("pos_tot"),
        F.sum("n_neg").alias("neg_tot"),
    )
    pos_sm = F.col("n_pos") + 0.5
    neg_sm = F.col("n_neg") + 0.5
    woe_raw = F.log(
        (pos_sm / F.col("pos_tot")) / (neg_sm / F.col("neg_tot"))
    )
    iv_raw = (
        (pos_sm / F.col("pos_tot") - neg_sm / F.col("neg_tot")) * woe_raw
    )
    w = Window.partitionBy("feature")
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "feature",
            "bin",
            "n_pos",
            "n_neg",
            F.round(woe_raw, 6).alias("woe"),
            F.round(iv_raw, 6).alias("iv_term"),
            F.round(iv_raw * 1e6).cast("long").alias("iv_code"),
        )
        .withColumn(
            "feature_iv", F.round(F.sum("iv_code").over(w) / 1e6, 6)
        )
        .drop("iv_code")
        .orderBy("feature", "bin")
    )


# --- Wilson lower-bound conversion ranking -----------------------------------

_Z2 = 3.8416  # 1.96^2, the 95% normal quantile squared


@register(
    "wilson_ctr_ranking",
    oracle=f"""
        WITH stats AS (
            SELECT user_id,
                   COUNT(*) AS n_events,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_purchases
            FROM events GROUP BY user_id
        ),
        scored AS (
            SELECT user_id, n_events, n_purchases,
                   ROUND(n_purchases / CAST(n_events AS DOUBLE), 6)
                       AS raw_rate,
                   ROUND(
                       (n_purchases / CAST(n_events AS DOUBLE)
                            + {_Z2} / (2 * n_events)
                        - 1.96 * SQRT(
                            (n_purchases / CAST(n_events AS DOUBLE)
                                 * (1 - n_purchases
                                        / CAST(n_events AS DOUBLE))
                             + {_Z2} / (4 * n_events)) / n_events))
                       / (1 + {_Z2} / n_events),
                       6) AS wilson_lb
            FROM stats
        )
        SELECT user_id, n_events, n_purchases, raw_rate, wilson_lb
        FROM scored
        ORDER BY wilson_lb DESC, user_id
        LIMIT 100
    """,
    doc="Wilson score lower-bound ranking of per-user purchase "
    "conversion (Wilson 1927; the 'sort by best' ranking that "
    "penalizes small samples — a 1/1 converter ranks below a 40/80 "
    "one, which naive rate ranking gets wrong). One groupBy over "
    "events to integer (n, k) sufficient statistics per user, then "
    "the closed-form bound is pure per-row arithmetic — no second "
    "pass, no window. The bound expression is written with identical "
    "operation order in both engines from exact integer inputs and "
    "rounded to 6; top-100 selection orders by the ROUNDED bound "
    "with user_id as the unique tiebreaker so both engines cut the "
    "same set. At 100 TB this is one shuffle on user_id with "
    "map-side partial aggregation, then a global top-N push-down.",
    tags=("analytics", "ranking"),
)
def wilson_ctr_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    stats = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("n_purchases"),
    )
    n = F.col("n_events")
    phat = F.col("n_purchases") / n.cast("double")
    lb = (
        phat
        + F.lit(_Z2) / (2 * n)
        - 1.96 * F.sqrt((phat * (1 - phat) + F.lit(_Z2) / (4 * n)) / n)
    ) / (1 + F.lit(_Z2) / n)
    return (
        stats.select(
            "user_id",
            "n_events",
            "n_purchases",
            F.round(phat, 6).alias("raw_rate"),
            F.round(lb, 6).alias("wilson_lb"),
        )
        .orderBy(F.desc("wilson_lb"), "user_id")
        .limit(100)
    )


# --- Z-order (Morton) clustering layout --------------------------------------
#
# 8-bit per-dimension codes scaled from the observed [min, max] extent
# (integer arithmetic: (v - min) * 256 // (max - min + 1)), interleaved
# into a 16-bit Morton code, cut into 64 files of 1024 z-values each.
# The expanded bit-interleave expression is generated once and rendered
# into both engines.

_N_ZBITS = 8
_Z_FILES = 64
_Z_FILE_SPAN = (1 << (2 * _N_ZBITS)) // _Z_FILES


def _interleave_sql(x: str, y: str, intdiv: str = "//") -> str:
    terms = []
    for i in range(_N_ZBITS):
        terms.append(f"(({x}) {intdiv} {1 << i}) % 2 * {1 << (2 * i)}")
        terms.append(
            f"(({y}) {intdiv} {1 << i}) % 2 * {1 << (2 * i + 1)}"
        )
    return " + ".join(terms)


@register(
    "zorder_clustering",
    oracle=f"""
        WITH ext AS (
            SELECT MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
                   MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
            FROM lineitem
        ),
        coded AS (
            SELECT l_partkey, l_suppkey,
                   (l_partkey - pmin) * 256 // (pmax - pmin + 1) AS x8,
                   (l_suppkey - smin) * 256 // (smax - smin + 1) AS y8
            FROM lineitem CROSS JOIN ext
        ),
        zed AS (
            SELECT l_partkey, l_suppkey,
                   ({_interleave_sql("x8", "y8")}) // {_Z_FILE_SPAN}
                       AS file_id
            FROM coded
        )
        SELECT file_id,
               COUNT(*) AS n_rows,
               MIN(l_partkey) AS part_min, MAX(l_partkey) AS part_max,
               MIN(l_suppkey) AS supp_min, MAX(l_suppkey) AS supp_max,
               ROUND((MAX(l_partkey) - MIN(l_partkey) + 1)
                         * (MAX(l_suppkey) - MIN(l_suppkey) + 1)
                     / CAST((SELECT (pmax - pmin + 1) * (smax - smin + 1)
                             FROM ext) AS DOUBLE),
                     6) AS span_fraction
        FROM zed
        GROUP BY file_id
        ORDER BY file_id
    """,
    doc="Z-order (Morton 1966) clustering layout over the "
    "(l_partkey, l_suppkey) filter dimensions — the OPTIMIZE ZORDER "
    "idiom of Delta/Iceberg, extending the single-key range "
    "clustering of the compaction operator (29i) to two-dimensional "
    "data skipping. Per-dimension 8-bit codes come from an integer "
    "affine scale of the observed extent (one 1-row aggregate, "
    "broadcast back), the 16-bit Morton code is a fully-expanded "
    "div/mod bit interleave (whole-stage-codegen arithmetic, no "
    "UDF), and rows cut into 64 equal z-range files. The report is "
    "each file's min-max envelope per dimension and its span "
    "fraction of the full extent — the quantity a scan planner "
    "prunes on: Z-order bounds BOTH dimensions' envelopes at "
    "~1/sqrt(64) of the extent, where a single-key sort leaves the "
    "second dimension's envelope at ~100%. Everything before the "
    "64-cell rollup is per-row integer arithmetic; the one float is "
    "the final span ratio, rounded identically in both engines.",
    tags=("layout", "scale"),
)
def zorder_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    ext = li.agg(
        F.min("l_partkey").alias("pmin"),
        F.max("l_partkey").alias("pmax"),
        F.min("l_suppkey").alias("smin"),
        F.max("l_suppkey").alias("smax"),
    )
    coded = (
        li.select("l_partkey", "l_suppkey")
        .crossJoin(F.broadcast(ext))
        .withColumn(
            "x8",
            F.expr("(l_partkey - pmin) * 256 div (pmax - pmin + 1)"),
        )
        .withColumn(
            "y8",
            F.expr("(l_suppkey - smin) * 256 div (smax - smin + 1)"),
        )
    )
    z_expr = _interleave_sql("x8", "y8", intdiv="div")
    total_span = (
        (F.col("pmax") - F.col("pmin") + 1)
        * (F.col("smax") - F.col("smin") + 1)
    ).cast("double")
    return (
        coded.withColumn(
            "file_id", F.expr(f"({z_expr}) div {_Z_FILE_SPAN}")
        )
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("part_min"),
            F.max("l_partkey").alias("part_max"),
            F.min("l_suppkey").alias("supp_min"),
            F.max("l_suppkey").alias("supp_max"),
            F.round(
                (F.max("l_partkey") - F.min("l_partkey") + 1)
                * (F.max("l_suppkey") - F.min("l_suppkey") + 1)
                / F.first(total_span),
                6,
            ).alias("span_fraction"),
        )
        .orderBy("file_id")
    )


# --- differentially-private count release ------------------------------------

_DP_EPSILON = 1.0
_DP_A, _DP_B = H.hash_params(1, seed=971_113)[0]
_DP_DENOM = 2_147_483_649  # P + 2: maps affine codes into (0, 1)


@register(
    "dp_event_counts",
    oracle=f"""
        WITH cells AS (
            SELECT event_type,
                   epoch_us(ts) // {_DAY_US} AS day,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        seeded AS (
            SELECT event_type, day, n,
                   ({H.affine_sql(
                       H.str_code_sql(
                           "event_type || '#' || CAST(day AS VARCHAR)"
                       ),
                       _DP_A,
                       _DP_B,
                   )} + 1) / {_DP_DENOM}.0 AS u
            FROM cells
        )
        SELECT event_type, day,
               CAST({_DP_EPSILON} AS DOUBLE) AS epsilon,
               ROUND(GREATEST(
                   n - SIGN(u - 0.5) * LN(1 - 2 * ABS(u - 0.5))
                           / {_DP_EPSILON},
                   0), 3) AS released_count
        FROM seeded
        ORDER BY event_type, day
    """,
    doc="Differentially-private release of per-(event_type, day) "
    "counts via the Laplace mechanism (Dwork et al. 2006): "
    "sensitivity-1 counting query, noise ~ Laplace(1/epsilon) by "
    "inverse-CDF transform of a uniform draw, released values "
    "clamped at 0. Complements the k-anonymity (#56b), l-diversity "
    "(#119) and GDPR-erasure (#121) privacy family with the "
    "statistical-release side. The uniform draw is a deterministic "
    "affine hash of the cell key mapped into (0,1) — reproducible "
    "and cross-engine checkable (test posture; a production release "
    "would use a CSPRNG, which this seeds cleanly behind). "
    "Determinism: the hash code is exact int64 both sides, the "
    "(code+1)/(P+2) division and the ln(1-2|u-0.5|) inverse CDF are "
    "single correctly-rounded IEEE ops on identical inputs, and the "
    "released value rounds to 3 decimals. Plan shape: one groupBy "
    "to the bounded (type, day) grid; noise is per-cell arithmetic.",
    tags=("privacy", "analytics"),
)
def dp_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    cells = (
        ev.select(
            "event_type",
            F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    key = F.concat_ws("#", F.col("event_type"), F.col("day").cast("string"))
    u = (
        H.affine_col(H.str_code_col(key), _DP_A, _DP_B) + 1
    ) / F.lit(float(_DP_DENOM))
    c = u - 0.5
    noise = -F.signum(c) * F.log(1 - 2 * F.abs(c)) / F.lit(_DP_EPSILON)
    return cells.select(
        "event_type",
        "day",
        F.lit(_DP_EPSILON).alias("epsilon"),
        F.round(F.greatest(F.col("n") + noise, F.lit(0.0)), 3).alias(
            "released_count"
        ),
    ).orderBy("event_type", "day")
