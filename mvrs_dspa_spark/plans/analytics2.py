"""Third analytics block (SURVEY §2 #102-115, round 6): the 16 query
names the round-5 registry promised, implemented.

Segment rollups, distributional audits (Benford, t-test, conditional
entropy), geo assignment, lifecycle staging — each one declarative
plan with a DuckDB oracle twin, following the house determinism rules
(identical aliases, rounded aggregates, integer arithmetic wherever an
engine could disagree on float summation order).

Scale notes per query are in each docstring; the common posture:
corpus-sized work is always ONE aggregation (groupBy on a bounded or
natural key), everything after runs on cells/vocabulary-sized frames
via windows or broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mvrs_dspa_spark.functions import hashing as H
from mvrs_dspa_spark.plans.registry import _REGISTRY, register
from mvrs_dspa_spark.tables import table


# --- RFM segment rollup ------------------------------------------------------

# Named-segment mapping over the (r, f, m) quintile scores; CASE arms
# ordered identically in both engines so overlapping conditions
# resolve the same way.
_SEGMENT_CASE_SQL = """
    CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champions'
         WHEN r_score >= 4 AND f_score >= 3 THEN 'loyal'
         WHEN r_score >= 4 THEN 'recent'
         WHEN r_score <= 2 AND m_score >= 4 THEN 'at_risk_spenders'
         WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
         ELSE 'regular' END
"""


def _segment_col() -> F.Column:
    r, f, m = F.col("r_score"), F.col("f_score"), F.col("m_score")
    return (
        F.when((r >= 4) & (f >= 4) & (m >= 4), F.lit("champions"))
        .when((r >= 4) & (f >= 3), F.lit("loyal"))
        .when(r >= 4, F.lit("recent"))
        .when((r <= 2) & (m >= 4), F.lit("at_risk_spenders"))
        .when((r <= 2) & (f <= 2), F.lit("hibernating"))
        .otherwise(F.lit("regular"))
    )


def _rfm_oracle() -> str:
    # wrap the already-proven user_rfm_segments oracle — one definition
    # of the quintile-score machinery, two registered surfaces
    base = _REGISTRY["user_rfm_segments"].oracle
    return f"""
        WITH rfm AS ({base}),
        seg AS (SELECT {_SEGMENT_CASE_SQL} AS segment, recency_days, monetary
                FROM rfm)
        SELECT segment,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               ROUND(AVG(recency_days), 4) AS avg_recency_days,
               ROUND(SUM(monetary), 2) AS total_monetary,
               ROUND(COUNT(*) / SUM(COUNT(*)) OVER ()::DOUBLE, 6) AS user_share
        FROM seg
        GROUP BY segment
        ORDER BY segment
    """


@register(
    "rfm_segment_counts",
    oracle=None,  # resolved lazily below (needs user_rfm_segments registered)
    doc="Named RFM segments (champions/loyal/recent/at-risk/"
    "hibernating/regular) rolled up from the user_rfm_segments quintile "
    "scores — the marketing-facing summary over #79's per-user detail. "
    "Reuses the registered query verbatim (its orderBy is eliminated "
    "under the aggregate by Catalyst's EliminateSorts), so segment "
    "definitions can never drift between the two surfaces. Adds one "
    "6-ary CASE projection and one segment-key aggregate on top of "
    "#79's single user_id shuffle.",
    tags=("analytics",),
)
def rfm_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mvrs_dspa_spark.plans.analytics import user_rfm_segments

    rfm = user_rfm_segments(spark, sf_dir)
    return (
        rfm.select(
            _segment_col().alias("segment"), "recency_days", "monetary"
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.avg("recency_days"), 4).alias("avg_recency_days"),
            F.round(F.sum("monetary"), 2).alias("total_monetary"),
        )
        .withColumn(
            "user_share",
            F.round(
                F.col("n_users")
                / F.sum("n_users").over(Window.partitionBy()).cast("double"),
                6,
            ),
        )
        .orderBy("segment")
    )


# patch the lazily-built oracle in (user_rfm_segments registers on
# analytics import, which registry.all_queries() guarantees precedes us)
def _patch_rfm_oracle() -> None:
    import dataclasses

    from mvrs_dspa_spark.plans import analytics  # noqa: F401  (registers #79)

    spec = _REGISTRY["rfm_segment_counts"]
    if spec.oracle is None:
        _REGISTRY["rfm_segment_counts"] = dataclasses.replace(
            spec, oracle=_rfm_oracle()
        )


# --- order-price quantiles per priority (inverse CDF) -----------------------

CDF_QS = (0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99)


@register(
    "orders_cdf_quantiles",
    oracle=f"""
        SELECT o_orderpriority, n_orders, q, ROUND(v, 4) AS price
        FROM (
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   unnest([{", ".join(map(str, CDF_QS))}]::DOUBLE[]) AS q,
                   unnest(quantile_cont(o_totalprice,
                          [{", ".join(map(str, CDF_QS))}])) AS v
            FROM orders GROUP BY o_orderpriority
        )
        ORDER BY o_orderpriority, q
    """,
    doc="Inverse-CDF sampling of order value per priority class: exact "
    "interpolated quantiles at 7 probe points (p10..p99), one sort-"
    "based aggregate per priority (the same cross-engine percentile "
    "machinery as 10w), then a 5x7 posexplode on the bounded result — "
    "the 'how big is a P95 urgent order' readout.",
    tags=("relational", "analytics"),
)
def orders_cdf_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    qs = F.array(*[F.lit(q) for q in CDF_QS])
    agg = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.percentile("o_totalprice", qs).alias("vals"),
    )
    return (
        agg.select(
            "o_orderpriority",
            "n_orders",
            F.posexplode("vals").alias("i", "v"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            F.element_at(qs, F.col("i") + 1).alias("q"),
            F.round("v", 4).alias("price"),
        )
        .orderBy("o_orderpriority", "q")
    )


# --- top-2 concentration per event type -------------------------------------


@register(
    "top2_share_per_type",
    oracle="""
        WITH per AS (
            SELECT event_type, user_id, ROUND(SUM(value), 2) AS v
            FROM events GROUP BY 1, 2
        ),
        ranked AS (
            SELECT event_type, user_id, v,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY v DESC, user_id) AS rk,
                   SUM(v) OVER (PARTITION BY event_type) AS total
            FROM per
        )
        SELECT event_type,
               MAX(CASE WHEN rk = 1 THEN user_id END) AS top_user,
               MAX(CASE WHEN rk = 2 THEN user_id END) AS second_user,
               ROUND(SUM(v), 2) AS top2_value,
               ROUND(MAX(total), 2) AS total_value,
               ROUND(ROUND(SUM(v), 2) / ROUND(MAX(total), 2), 6) AS top2_share
        FROM ranked WHERE rk <= 2
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="Value-concentration audit: the two heaviest users per event "
    "type and their combined share of the type's total value (the "
    "whale-detection twin of the skew advisor 10aq, value-weighted "
    "instead of row-count-weighted). One (type, user) aggregate — the "
    "only corpus-sized shuffle — then rank + share on the per-user "
    "cells; ties broken by user_id so both engines pick the same rows.",
    tags=("analytics",),
)
def top2_share_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    per = ev.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 2).alias("v")
    )
    w = Window.partitionBy("event_type").orderBy(F.col("v").desc(), "user_id")
    ranked = per.select(
        "event_type",
        "user_id",
        "v",
        F.row_number().over(w).alias("rk"),
        F.sum("v").over(Window.partitionBy("event_type")).alias("total"),
    )
    top2v = F.round(F.sum("v"), 2)
    totv = F.round(F.max("total"), 2)
    return (
        ranked.where(F.col("rk") <= 2)
        .groupBy("event_type")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("user_id"))).alias("top_user"),
            F.max(F.when(F.col("rk") == 2, F.col("user_id"))).alias(
                "second_user"
            ),
            top2v.alias("top2_value"),
            totv.alias("total_value"),
            F.round(top2v / totv, 6).alias("top2_share"),
        )
        .orderBy("event_type")
    )


# --- haversine nearest-store assignment -------------------------------------

EARTH_R_KM = 6371.0088
# deterministic synthetic coordinates (affine-hashed keys -> lat/lon;
# the test schema has no geo columns, so both engines derive identical
# pseudo-coordinates from the same integer hash family)
_GEO = H.hash_params(4, seed=4242)


def _lat_sql(key: str, a: int, b: int) -> str:
    return f"(({H.affine_sql(key, a, b)} % 120001) / 1000.0 - 60.0)"


def _lon_sql(key: str, a: int, b: int) -> str:
    return f"(({H.affine_sql(key, a, b)} % 360001) / 1000.0 - 180.0)"


def _lat_col(key: F.Column, a: int, b: int) -> F.Column:
    # cast("long") first: the affine product of an IntegerType key
    # overflows int32 under ANSI mode
    return (H.affine_col(key.cast("long"), a, b) % 120001) / 1000.0 - 60.0


def _lon_col(key: F.Column, a: int, b: int) -> F.Column:
    return (H.affine_col(key.cast("long"), a, b) % 360001) / 1000.0 - 180.0


_HAVERSINE_SQL = f"""
    2 * {EARTH_R_KM} * ASIN(SQRT(
        POWER(SIN(RADIANS(s_lat - c_lat) / 2), 2)
        + COS(RADIANS(c_lat)) * COS(RADIANS(s_lat))
          * POWER(SIN(RADIANS(s_lon - c_lon) / 2), 2)))
"""


@register(
    "haversine_store_assignment",
    oracle=f"""
        WITH stores AS (
            SELECT n_nationkey AS store_key, n_name AS store_name,
                   {_lat_sql("n_nationkey", *_GEO[0])} AS s_lat,
                   {_lon_sql("n_nationkey", *_GEO[1])} AS s_lon
            FROM nation
        ),
        custs AS (
            SELECT c_custkey,
                   {_lat_sql("c_custkey", *_GEO[2])} AS c_lat,
                   {_lon_sql("c_custkey", *_GEO[3])} AS c_lon
            FROM customer
        ),
        dists AS (
            SELECT c_custkey, store_key, store_name,
                   CAST(ROUND(({_HAVERSINE_SQL}) * 10000, 0) AS BIGINT)
                       AS d_i,
                   ROW_NUMBER() OVER (
                       PARTITION BY c_custkey
                       ORDER BY CAST(ROUND(({_HAVERSINE_SQL}) * 10000, 0)
                                     AS BIGINT), store_key
                   ) AS rn
            FROM custs CROSS JOIN stores
        )
        SELECT store_key, store_name,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               ROUND(SUM(d_i) / 10000.0 / COUNT(*), 4) AS avg_dist_km,
               ROUND(MAX(d_i) / 10000.0, 4) AS max_dist_km
        FROM dists WHERE rn = 1
        GROUP BY store_key, store_name
        ORDER BY store_key
    """,
    doc="Nearest-facility assignment by great-circle distance: every "
    "customer assigned to the closest of 25 'stores' (nation rows with "
    "deterministic hash-derived coordinates) via the haversine formula, "
    "then per-store customer counts and distance stats. The store side "
    "is a broadcast (dimension-sized), so the 'cross join' is a "
    "map-side fan-out of 25 per customer — never a shuffle — and the "
    "argmin is a per-customer window over those 25 rows. Distances "
    "are rounded BEFORE ranking (store_key tiebreak) so a 1-ulp libm "
    "divergence between engines cannot flip an assignment.",
    tags=("analytics", "geo"),
)
def haversine_store_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    stores = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("store_key"),
        F.col("n_name").alias("store_name"),
        _lat_col(F.col("n_nationkey"), *_GEO[0]).alias("s_lat"),
        _lon_col(F.col("n_nationkey"), *_GEO[1]).alias("s_lon"),
    )
    custs = table(spark, sf_dir, "customer").select(
        "c_custkey",
        _lat_col(F.col("c_custkey"), *_GEO[2]).alias("c_lat"),
        _lon_col(F.col("c_custkey"), *_GEO[3]).alias("c_lon"),
    )
    hav = (
        2
        * EARTH_R_KM
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("s_lat") - F.col("c_lat")) / 2), 2)
                + F.cos(F.radians("c_lat"))
                * F.cos(F.radians("s_lat"))
                * F.pow(
                    F.sin(F.radians(F.col("s_lon") - F.col("c_lon")) / 2), 2
                )
            )
        )
    )
    # integer 0.1-metre distances: the rank AND the aggregates run on
    # exact int64 values, so float summation ORDER can never move an
    # average across a rounding boundary between engines (the sum of
    # rounded doubles still diverges in the last ulp; the sum of their
    # integer codes cannot)
    d_i = F.round(hav * 10000, 0).cast("long")
    w = Window.partitionBy("c_custkey").orderBy("d_i", "store_key")
    dists = (
        custs.crossJoin(F.broadcast(stores))
        .select("c_custkey", "store_key", "store_name", d_i.alias("d_i"))
        .withColumn("rn", F.row_number().over(w))
    )
    return (
        dists.where(F.col("rn") == 1)
        .groupBy("store_key", "store_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("d_i") / 10000.0 / F.count(F.lit(1)), 4).alias(
                "avg_dist_km"
            ),
            F.round(F.max("d_i") / 10000.0, 4).alias("max_dist_km"),
        )
        .orderBy("store_key")
    )


# --- user lifecycle stages ---------------------------------------------------


@register(
    "user_lifecycle_stages",
    oracle="""
        WITH rng AS (
            SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
            FROM events
        ),
        per_user AS (
            SELECT user_id,
                   MIN(epoch_us(ts)) AS first_us,
                   MAX(epoch_us(ts)) AS last_us,
                   COUNT(*) AS n_events,
                   SUM(value) AS total_value
            FROM events GROUP BY user_id
        ),
        staged AS (
            SELECT CASE
                     WHEN first_us >= mn + ((mx - mn) * 4) // 5 THEN 'new'
                     WHEN last_us < mn + (mx - mn) // 2 THEN 'churned'
                     WHEN last_us >= mn + ((mx - mn) * 4) // 5 THEN 'active'
                     ELSE 'lapsing'
                   END AS stage,
                   n_events, total_value
            FROM per_user, rng
        )
        SELECT stage,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               ROUND(AVG(n_events), 4) AS avg_events,
               ROUND(SUM(total_value), 2) AS total_value,
               ROUND(COUNT(*) / SUM(COUNT(*)) OVER ()::DOUBLE, 6) AS user_share
        FROM staged
        GROUP BY stage
        ORDER BY stage
    """,
    doc="Lifecycle staging: users bucketed by first/last activity "
    "against the corpus time range — new (first seen in the final "
    "fifth), active (still seen in the final fifth), churned (gone "
    "before the midpoint), lapsing (the rest) — the funnel-health "
    "summary upstream of retention_cohorts (10ag). Stage boundaries "
    "are INTEGER microsecond arithmetic (div, not double), so the "
    "engines cannot disagree on edge rows. One user_id shuffle + a "
    "1-row range broadcast; the stage rollup runs on per-user cells.",
    tags=("analytics", "temporal"),
)
def user_lifecycle_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    rng = ev.agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("first_us"),
        F.max(F.unix_micros("ts")).alias("last_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )
    new_edge = F.col("mn") + F.expr("((mx - mn) * 4) div 5")
    mid_edge = F.col("mn") + F.expr("(mx - mn) div 2")
    stage = (
        F.when(F.col("first_us") >= new_edge, F.lit("new"))
        .when(F.col("last_us") < mid_edge, F.lit("churned"))
        .when(F.col("last_us") >= new_edge, F.lit("active"))
        .otherwise(F.lit("lapsing"))
    )
    return (
        per_user.crossJoin(F.broadcast(rng))
        .select(stage.alias("stage"), "n_events", "total_value")
        .groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.avg("n_events"), 4).alias("avg_events"),
            F.round(F.sum("total_value"), 2).alias("total_value"),
        )
        .withColumn(
            "user_share",
            F.round(
                F.col("n_users")
                / F.sum("n_users").over(Window.partitionBy()).cast("double"),
                6,
            ),
        )
        .orderBy("stage")
    )


# --- Welch's t per event type vs rest ---------------------------------------


@register(
    "value_ttest_by_type",
    oracle="""
        WITH g AS (
            SELECT COUNT(*) AS n, SUM(value) AS s, SUM(value * value) AS ss
            FROM events
        ),
        t AS (
            SELECT event_type, COUNT(*) AS n1, SUM(value) AS s1,
                   SUM(value * value) AS ss1
            FROM events GROUP BY event_type
        ),
        stats AS (
            SELECT event_type, n1, (n - n1) AS n2,
                   s1 / n1 AS m1, (s - s1) / (n - n1) AS m2,
                   (ss1 - s1 * s1 / n1) / (n1 - 1) AS v1,
                   ((ss - ss1) - (s - s1) * (s - s1) / (n - n1))
                       / (n - n1 - 1) AS v2
            FROM t, g
        )
        SELECT event_type,
               CAST(n1 AS BIGINT) AS n,
               ROUND(m1, 6) AS mean_v,
               ROUND(m1 - m2, 6) AS mean_diff,
               ROUND((m1 - m2) / NULLIF(sqrt(v1 / n1 + v2 / n2), 0), 6)
                   AS t_welch,
               ROUND(POWER(v1 / n1 + v2 / n2, 2)
                     / NULLIF(POWER(v1 / n1, 2) / (n1 - 1)
                              + POWER(v2 / n2, 2) / (n2 - 1), 0), 2) AS df
        FROM stats
        ORDER BY event_type
    """,
    doc="One-vs-rest Welch's t-test of event value per type (the "
    "segment-metric screen behind every 'does this type monetize "
    "differently' question; the per-type generalization of "
    "ab_test_report's two-arm form). Rest-group moments are derived "
    "ALGEBRAICALLY from (global - type) sufficient statistics — one "
    "corpus scan produces the global triple and the per-type triples, "
    "no second pass, no anti-join. Welch-Satterthwaite df included.",
    tags=("analytics", "validation"),
)
def value_ttest_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    g = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    )
    t = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n1"),
        F.sum("value").alias("s1"),
        F.sum(F.col("value") * F.col("value")).alias("ss1"),
    )
    st = t.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n1",
        (F.col("n") - F.col("n1")).alias("n2"),
        (F.col("s1") / F.col("n1")).alias("m1"),
        ((F.col("s") - F.col("s1")) / (F.col("n") - F.col("n1"))).alias("m2"),
        (
            (F.col("ss1") - F.col("s1") * F.col("s1") / F.col("n1"))
            / (F.col("n1") - 1)
        ).alias("v1"),
        (
            (
                (F.col("ss") - F.col("ss1"))
                - (F.col("s") - F.col("s1"))
                * (F.col("s") - F.col("s1"))
                / (F.col("n") - F.col("n1"))
            )
            / (F.col("n") - F.col("n1") - 1)
        ).alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    return st.select(
        "event_type",
        F.col("n1").cast("long").alias("n"),
        F.round("m1", 6).alias("mean_v"),
        F.round(F.col("m1") - F.col("m2"), 6).alias("mean_diff"),
        F.round(
            (F.col("m1") - F.col("m2")) / F.nullif(F.sqrt(se2), F.lit(0.0)), 6
        ).alias("t_welch"),
        F.round(
            F.pow(se2, F.lit(2.0))
            / F.nullif(
                F.pow(F.col("v1") / F.col("n1"), F.lit(2.0))
                / (F.col("n1") - 1)
                + F.pow(F.col("v2") / F.col("n2"), F.lit(2.0))
                / (F.col("n2") - 1),
                F.lit(0.0),
            ),
            2,
        ).alias("df"),
    ).orderBy("event_type")


# --- seasonal hour-of-day profile -------------------------------------------


@register(
    "seasonal_hour_profile",
    oracle="""
        WITH cells AS (
            SELECT event_type, CAST(hour(ts) AS INTEGER) AS hod,
                   COUNT(*) AS n, ROUND(SUM(value), 2) AS sv
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, hod,
               CAST(n AS BIGINT) AS n_events,
               ROUND(n / SUM(n) OVER (PARTITION BY event_type)::DOUBLE, 6)
                   AS hour_share,
               ROUND(sv / n, 6) AS avg_value,
               (ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY n DESC, hod) = 1) AS is_peak
        FROM cells
        ORDER BY event_type, hod
    """,
    doc="Hour-of-day seasonality profile per event type: share of the "
    "type's traffic and mean value per hour, peak hour flagged — the "
    "diurnal fingerprint feeding capacity planning and the "
    "autocorrelation check (10ak). ONE aggregation to the 5x24 cell "
    "grid; shares/peaks are windows over the bounded grid. avg_value "
    "divides the 2-rounded sum so float summation order can't leak "
    "into the hash.",
    tags=("analytics", "temporal"),
)
def seasonal_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hod")
    ).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sv")
    )
    wt = Window.partitionBy("event_type")
    wp = Window.partitionBy("event_type").orderBy(F.col("n").desc(), "hod")
    return (
        cells.select(
            "event_type",
            "hod",
            F.col("n").alias("n_events"),
            F.round(F.col("n") / F.sum("n").over(wt).cast("double"), 6).alias(
                "hour_share"
            ),
            F.round(F.col("sv") / F.col("n"), 6).alias("avg_value"),
            (F.row_number().over(wp) == 1).alias("is_peak"),
        )
        .orderBy("event_type", "hod")
    )


# --- conditional entropy of the transition matrix ---------------------------


@register(
    "conditional_entropy_transitions",
    oracle="""
        WITH pairs AS (
            SELECT prev_type, event_type AS next_type, COUNT(*) AS n
            FROM (
                SELECT event_type,
                       LAG(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev_type
                FROM events
            )
            WHERE prev_type IS NOT NULL
            GROUP BY 1, 2
        ),
        rows_h AS (
            SELECT prev_type, SUM(n) AS n_total,
                   SUM(CAST(ROUND(-p * log2(p) * 1e9) AS BIGINT)) / 1e9 AS h
            FROM (
                SELECT prev_type, n,
                       n / SUM(n) OVER (PARTITION BY prev_type)::DOUBLE AS p
                FROM pairs
            )
            GROUP BY prev_type
        )
        SELECT prev_type,
               CAST(n_total AS BIGINT) AS n_total,
               ROUND(h, 6) AS h_next_bits,
               ROUND(n_total / SUM(n_total) OVER ()::DOUBLE, 6) AS p_prev,
               ROUND(h * n_total / SUM(n_total) OVER ()::DOUBLE, 6)
                   AS h_contribution
        FROM rows_h
        ORDER BY prev_type
    """,
    doc="Conditional entropy H(next|prev) of the first-order event "
    "Markov chain (the predictability summary of 10ad's transition "
    "matrix; sum of h_contribution = H(next|prev) in bits). The "
    "corpus-sized work is the same single LAG pass as 10ad; entropy "
    "terms run on the 5x5 transition cells.",
    tags=("analytics", "sessions"),
)
def conditional_entropy_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    p = F.col("n") / F.sum("n").over(wp).cast("double")
    rows_h = (
        pairs.select(
            "prev_type",
            "n",
            # 1e9 int64 entropy-term codes (house summation-order rule)
            F.round(-p * F.log2(p) * 1e9).cast("long").alias("term_code"),
        )
        .groupBy("prev_type")
        .agg(
            F.sum("n").alias("n_total"),
            (F.sum("term_code") / 1e9).alias("h"),
        )
    )
    wall = Window.partitionBy()
    p_prev = F.col("n_total") / F.sum("n_total").over(wall).cast("double")
    return (
        rows_h.select(
            "prev_type",
            F.col("n_total").cast("long").alias("n_total"),
            F.round("h", 6).alias("h_next_bits"),
            F.round(p_prev, 6).alias("p_prev"),
            F.round(F.col("h") * p_prev, 6).alias("h_contribution"),
        )
        .orderBy("prev_type")
    )


# --- Benford first-digit audit ----------------------------------------------

# first significant digit via integer/string arithmetic: floor(v*1e6)
# is one IEEE multiply + floor (bit-identical across engines), and the
# leading char of a BIGINT's decimal form is engine-exact — no
# floor(log10(v)) whose 1-ulp libm wobble could shift a digit.
_BENFORD_DIGIT_SQL = (
    "CAST(substr(CAST(CAST(FLOOR(value * 1000000) AS BIGINT) AS VARCHAR),"
    " 1, 1) AS INTEGER)"
)


@register(
    "benford_value_audit",
    oracle=f"""
        WITH digits AS (
            SELECT {_BENFORD_DIGIT_SQL} AS digit
            FROM events WHERE value >= 0.000001
        ),
        counts AS (
            SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit
        )
        SELECT digit,
               CAST(n AS BIGINT) AS n,
               ROUND(n / SUM(n) OVER ()::DOUBLE, 6) AS obs_p,
               ROUND(log10(1 + 1.0 / digit), 6) AS benford_p,
               ROUND(POWER(n - SUM(n) OVER () * log10(1 + 1.0 / digit), 2)
                     / (SUM(n) OVER () * log10(1 + 1.0 / digit)), 6)
                   AS chisq_term
        FROM counts
        ORDER BY digit
    """,
    doc="Benford's-law first-digit audit of event values (fraud/"
    "synthetic-data screen: natural multi-scale magnitudes follow "
    "P(d)=log10(1+1/d); uniform synthetic values — like this "
    "generator's — flunk it, which the pytest pins). The first "
    "significant digit comes from the decimal string of "
    "floor(value*1e6), never floor(log10(v)), so a 1-ulp libm "
    "divergence can't move a value across a digit boundary. One "
    "projection + one 9-cell aggregate; chi-square terms on the cells.",
    tags=("analytics", "validation"),
)
def benford_value_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    digit = F.substring(
        F.floor(F.col("value") * 1000000).cast("long").cast("string"), 1, 1
    ).cast("int")
    counts = (
        ev.where(F.col("value") >= 0.000001)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wall = Window.partitionBy()
    total = F.sum("n").over(wall)
    exp_p = F.log10(1 + 1.0 / F.col("digit"))
    return (
        counts.select(
            "digit",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") / total.cast("double"), 6).alias("obs_p"),
            F.round(exp_p, 6).alias("benford_p"),
            F.round(
                F.pow(F.col("n") - total * exp_p, F.lit(2.0)) / (total * exp_p),
                6,
            ).alias("chisq_term"),
        )
        .orderBy("digit")
    )


# --- 2D Mahalanobis anomaly ranking -----------------------------------------

MAHA_TOP_N = 5


@register(
    "anomaly_mahalanobis_2d",
    oracle=f"""
        WITH pts AS (
            SELECT event_type, event_id, value,
                   CAST(hour(ts) AS INTEGER) AS hod
            FROM events
        ),
        stats AS (
            SELECT event_type, COUNT(*) AS n,
                   AVG(value) AS mx, AVG(hod) AS my,
                   SUM(value * value) / COUNT(*) - AVG(value) * AVG(value)
                       AS vxx,
                   SUM(hod * hod) / COUNT(*)::DOUBLE - AVG(hod) * AVG(hod)
                       AS vyy,
                   SUM(value * hod) / COUNT(*) - AVG(value) * AVG(hod) AS vxy
            FROM pts GROUP BY event_type
        ),
        scored AS (
            SELECT p.event_type, p.event_id, p.value, p.hod,
                   ROUND((POWER(p.value - s.mx, 2) * s.vyy
                          - 2 * (p.value - s.mx) * (p.hod - s.my) * s.vxy
                          + POWER(p.hod - s.my, 2) * s.vxx)
                         / (s.vxx * s.vyy - s.vxy * s.vxy), 6) AS d2
            FROM pts p JOIN stats s USING (event_type)
        )
        SELECT event_type, event_id, ROUND(value, 2) AS value, hod, d2,
               CAST(rk AS INTEGER) AS rk
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY d2 DESC, event_id
                   ) AS rk
            FROM scored
        )
        WHERE rk <= {MAHA_TOP_N}
        ORDER BY event_type, rk
    """,
    doc="Multivariate outlier ranking: squared Mahalanobis distance of "
    "each event's (value, hour-of-day) pair under its type's 2D "
    "Gaussian — closed-form 2x2 covariance inverse, no matrix library "
    "— top 5 per type. The covariance-aware upgrade of the univariate "
    "MAD screen (#77): it catches jointly-unusual points (high value "
    "at an hour where high values are rare) that either marginal "
    "passes. Per-type moments are one aggregate broadcast back; "
    "scores are rounded BEFORE the rank window (event_id tiebreak) so "
    "both engines select identical rows.",
    tags=("analytics", "validation"),
)
def anomaly_mahalanobis_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        "event_id",
        "value",
        F.hour("ts").cast("int").alias("hod"),
    )
    n = F.count(F.lit(1))
    stats = pts.groupBy("event_type").agg(
        F.avg("value").alias("mx"),
        F.avg("hod").alias("my"),
        (F.sum(F.col("value") * F.col("value")) / n
         - F.avg("value") * F.avg("value")).alias("vxx"),
        (F.sum(F.col("hod") * F.col("hod")) / n.cast("double")
         - F.avg("hod") * F.avg("hod")).alias("vyy"),
        (F.sum(F.col("value") * F.col("hod")) / n
         - F.avg("value") * F.avg("hod")).alias("vxy"),
    )
    dx = F.col("value") - F.col("mx")
    dy = F.col("hod") - F.col("my")
    det = F.col("vxx") * F.col("vyy") - F.col("vxy") * F.col("vxy")
    d2 = F.round(
        (
            dx * dx * F.col("vyy")
            - 2 * dx * dy * F.col("vxy")
            + dy * dy * F.col("vxx")
        )
        / det,
        6,
    )
    w = Window.partitionBy("event_type").orderBy(F.col("d2").desc(), "event_id")
    return (
        pts.join(F.broadcast(stats), "event_type")
        .select("event_type", "event_id", "value", "hod", d2.alias("d2"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= MAHA_TOP_N)
        .select(
            "event_type",
            "event_id",
            F.round("value", 2).alias("value"),
            "hod",
            "d2",
            "rk",
        )
        .orderBy("event_type", "rk")
    )


# --- point-in-time (temporal) join against the SCD2 dimension ---------------


@register(
    "point_in_time_state_join",
    oracle=None,  # resolved lazily below (wraps the user_state_history oracle)
    doc="Point-in-time (temporal) join — the lookup the SCD2 dimension "
    "(#94) exists to serve, and the batch form of Flink's temporal "
    "table join: every event is joined to the state version that was "
    "valid JUST BEFORE its timestamp (valid_from < ts <= valid_to, "
    "open row unbounded), i.e. the user's prior state as transition "
    "context; a user's first event has no prior version and reports "
    "'none'. Executed in the union-tag as-of shape (the "
    "`click_purchase_asof` idiom, plans/analytics.py #10t): version "
    "starts and events union into one frame, shuffle ONCE on user_id, "
    "and a running last_value picks each event's latest version with "
    "valid_from strictly before its ts — change rows sort AFTER event "
    "rows at equal timestamps, which is exactly the strict "
    "`valid_from < ts` bound of the interval form. Zero pair "
    "explosion: the former equi-join-with-residual form scanned every "
    "(event x version) pair per user, quadratic in per-user activity "
    "(the 10x probe trended 6.5 -> 8.2 across rounds); this form is "
    "one ordered window pass, linear per user and Zipf-head safe. "
    "Interval matches are provably unique per event, so the "
    "(prior_state x event_type) rollup is exact. Reuses "
    "`analytics.state_intervals` — one SCD2 definition for the "
    "dimension build, the streaming maintainer, and this consumer.",
    tags=("relational", "temporal"),
)
def point_in_time_state_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mvrs_dspa_spark.plans.analytics import state_intervals

    ev = table(spark, sf_dir, "events")
    str_t = ev.schema["event_type"].dataType
    vers = state_intervals(ev).select(
        "user_id",
        F.unix_micros("valid_from").alias("t_us"),
        F.lit(1).alias("is_change"),
        "version",
        "state",
        F.lit(None).cast(str_t).alias("event_type"),
        F.lit(None).cast(ev.schema["value"].dataType).alias("value"),
    )
    evu = ev.select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        F.lit(0).alias("is_change"),
        F.lit(None).cast("long").alias("version"),
        F.lit(None).cast(str_t).alias("state"),
        "event_type",
        "value",
    )
    # Events sort before same-ts changes (strict valid_from < ts); among
    # same-ts changes the highest version wins ((user_id, ts) is unique in
    # the data model, so this tiebreak is defensive only).
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us", "is_change", "version")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prior = F.last(
        F.when(F.col("is_change") == 1, F.col("state")), ignorenulls=True
    ).over(w)
    return (
        vers.unionByName(evu)
        .withColumn("prior_raw", prior)
        .where(F.col("is_change") == 0)
        .groupBy(
            F.coalesce("prior_raw", F.lit("none")).alias("prior_state"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("prior_state", "event_type")
    )


def _patch_pit_oracle() -> None:
    import dataclasses

    from mvrs_dspa_spark.plans import analytics  # noqa: F401  (registers #94)

    spec = _REGISTRY["point_in_time_state_join"]
    if spec.oracle is None:
        hist = _REGISTRY["user_state_history"].oracle
        _REGISTRY["point_in_time_state_join"] = dataclasses.replace(
            spec,
            oracle=f"""
                WITH hist AS ({hist})
                SELECT COALESCE(h.state, 'none') AS prior_state,
                       e.event_type,
                       CAST(COUNT(*) AS BIGINT) AS n_events,
                       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
                       ROUND(SUM(e.value), 2) AS sum_value
                FROM events e
                LEFT JOIN hist h
                  ON h.user_id = e.user_id
                 AND h.valid_from < e.ts
                 AND (h.valid_to IS NULL OR e.ts <= h.valid_to)
                GROUP BY 1, 2
                ORDER BY 1, 2
            """,
        )


# --- Kaplan-Meier time-to-conversion ----------------------------------------

_DAY_US = 86_400_000_000


@register(
    "kaplan_meier_conversion",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   MIN(epoch_us(ts)) AS t0,
                   MIN(CASE WHEN event_type = 'purchase'
                            THEN epoch_us(ts) END) AS tp
            FROM events GROUP BY user_id
        ),
        gmax AS (SELECT MAX(epoch_us(ts)) AS tmax FROM events),
        durs AS (
            SELECT CASE WHEN tp IS NOT NULL THEN (tp - t0) // {_DAY_US}
                        ELSE ((SELECT tmax FROM gmax) - t0) // {_DAY_US}
                   END AS day,
                   (tp IS NOT NULL) AS converted
            FROM per_user
        ),
        grid AS (
            SELECT day,
                   CAST(count_if(converted) AS BIGINT) AS n_converted,
                   CAST(count_if(NOT converted) AS BIGINT) AS n_censored
            FROM durs GROUP BY day
        ),
        km AS (
            SELECT day, n_converted,
                   (SELECT COUNT(*) FROM per_user)
                   - COALESCE(SUM(n_converted + n_censored) OVER
                       (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS n_at_risk
            FROM grid
        )
        SELECT day, CAST(n_at_risk AS BIGINT) AS n_at_risk, n_converted,
               ROUND(EXP(SUM(LN(GREATEST(
                   1.0 - CAST(n_converted AS DOUBLE) / n_at_risk,
                   1e-300))) OVER
                   (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
               AS survival
        FROM km
        QUALIFY n_converted > 0
        ORDER BY day
    """,
    doc="Kaplan-Meier time-to-conversion curve (right-censored "
    "survival analysis, the product-limit estimator): per user, days "
    "from first activity to first purchase; users who never purchase "
    "are censored at the corpus horizon rather than dropped (dropping "
    "them biases conversion time down — the reason KM exists). One "
    "user_id aggregation is the only corpus-sized work; the day grid "
    "is time-range-bounded, so the risk-set cumsums and the "
    "log-product survival window run on a frame of at most a few "
    "hundred rows (single-partition window on a bounded grid is house "
    "style). Survival factors (1 - d/r) are exact rationals; the "
    "ln/exp round-trip is clamped at 1e-300 so a day that converts "
    "the entire remaining risk set yields survival 0.0 on both "
    "engines instead of NULL-vs-(-inf).",
    tags=("analytics", "temporal"),
)
def kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("tp"),
    )
    gmax = ev.agg(F.max(F.unix_micros("ts")).alias("tmax"))
    durs = per_user.crossJoin(F.broadcast(gmax)).select(
        F.when(
            F.col("tp").isNotNull(), F.expr(f"(tp - t0) div {_DAY_US}")
        )
        .otherwise(F.expr(f"(tmax - t0) div {_DAY_US}"))
        .alias("day"),
        F.col("tp").isNotNull().alias("converted"),
    )
    # the day-bounded grid feeds the risk-set window AND the total
    # count — and the total is exactly the sum of the grid's cells, so
    # it never needs a second pass over the per-user durations;
    # materialized once, events is scanned twice (per-user agg + the
    # global max), not 4x (r11)
    grid = (
        durs.groupBy("day")
        .agg(
            F.count_if(F.col("converted")).alias("n_converted"),
            F.count_if(~F.col("converted")).alias("n_censored"),
        )
        .localCheckpoint(eager=False)
    )
    n_total = grid.agg(
        F.sum(F.col("n_converted") + F.col("n_censored")).alias("n_total")
    )
    w_prev = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_run = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    km = grid.crossJoin(F.broadcast(n_total)).select(
        "day",
        "n_converted",
        (
            F.col("n_total")
            - F.coalesce(
                F.sum(F.col("n_converted") + F.col("n_censored")).over(
                    w_prev
                ),
                F.lit(0),
            )
        ).alias("n_at_risk"),
    )
    return (
        km.select(
            "day",
            "n_at_risk",
            "n_converted",
            F.round(
                F.exp(
                    F.sum(
                        F.log(
                            F.greatest(
                                F.lit(1.0)
                                - F.col("n_converted").cast("double")
                                / F.col("n_at_risk"),
                                F.lit(1e-300),
                            )
                        )
                    ).over(w_run)
                ),
                6,
            ).alias("survival"),
        )
        .where(F.col("n_converted") > 0)
        .orderBy("day")
    )




# --- leave-one-out target encoding -------------------------------------------


@register(
    "target_encoding_loo",
    oracle="""
        WITH coded AS (
            SELECT event_id, event_type,
                   CAST(ROUND(value * 100) AS BIGINT) AS v_i
            FROM events
        ),
        stats AS (
            SELECT event_type,
                   SUM(v_i) AS s_i, COUNT(*) AS n
            FROM coded GROUP BY event_type
        )
        SELECT event_id, event_type,
               ROUND(v_i / 100.0, 2) AS value,
               CASE WHEN n > 1
                    THEN ROUND((s_i - v_i) / (100.0 * (n - 1)), 6)
               END AS loo_encoding
        FROM coded JOIN stats USING (event_type)
        ORDER BY event_id
    """,
    doc="Leave-one-out target encoding of the event-type category "
    "against value — the supervised-ML categorical encoder that "
    "excludes each row's own target from its category mean, the "
    "standard guard against target leakage (a plain mean encoding "
    "memorizes single-row categories). Per-category sufficient "
    "statistics are ONE corpus aggregation broadcast back; the "
    "encoding is pure arithmetic per row. All sums run on exact "
    "int64 cent codes (CAST(ROUND(value*100)) — value itself is not "
    "binary-exact), so float summation order cannot move an encoding "
    "across the rounding boundary between engines; a singleton "
    "category encodes NULL rather than leaking its own target.",
    tags=("analytics", "llm"),
)
def target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    coded = ev.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v_i"),
    )
    stats = coded.groupBy("event_type").agg(
        F.sum("v_i").alias("s_i"), F.count(F.lit(1)).alias("n")
    )
    return (
        coded.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round(F.col("v_i") / 100.0, 2).alias("value"),
            F.when(
                F.col("n") > 1,
                F.round(
                    (F.col("s_i") - F.col("v_i"))
                    / (100.0 * (F.col("n") - 1)),
                    6,
                ),
            ).alias("loo_encoding"),
        )
        .orderBy("event_id")
    )




# --- DAU / WAU stickiness -----------------------------------------------------


@register(
    "dau_wau_stickiness",
    oracle=f"""
        WITH ud AS (
            SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS day
            FROM events
        ),
        cover AS (
            SELECT user_id, day + off AS day
            FROM ud, UNNEST(generate_series(0, 6)) AS t(off)
        ),
        wau AS (
            SELECT day, COUNT(DISTINCT user_id) AS wau
            FROM cover GROUP BY day
        ),
        dau AS (SELECT day, COUNT(*) AS dau FROM ud GROUP BY day)
        SELECT d.day,
               CAST(d.dau AS BIGINT) AS dau,
               CAST(w.wau AS BIGINT) AS wau,
               ROUND(d.dau / CAST(w.wau AS DOUBLE), 6) AS stickiness
        FROM dau d JOIN wau w USING (day)
        ORDER BY d.day
    """,
    doc="DAU/WAU stickiness — the product-analytics engagement ratio "
    "(daily actives over trailing-7-day actives, per day; ~1.0 means "
    "the weekly audience shows up daily). WAU is an EXACT sliding "
    "distinct computed by the offset-explode idiom of the sliding-HLL "
    "rollup (#93): each distinct (user, active-day) pair covers the 7 "
    "window days it contributes to (bounded x7 fan-out), then one "
    "distinct count per day — never a re-scan of the event span per "
    "window, and the day grid joins bound every frame after the first "
    "distinct. Integer day buckets (epoch-microsecond div), integer "
    "counts, one division — no float order sensitivity.",
    tags=("analytics", "temporal"),
)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day"),
    ).distinct()
    cover = ud.select(
        "user_id",
        "day",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
    ).select("user_id", (F.col("day") + F.col("off")).alias("day"))
    wau = cover.groupBy("day").agg(
        F.countDistinct("user_id").alias("wau")
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(
                F.col("dau") / F.col("wau").cast("double"), 6
            ).alias("stickiness"),
        )
        .orderBy("day")
    )




# --- market-basket lift -------------------------------------------------------

BASKET_MIN_SUPPORT = 2


@register(
    "basket_lift_pairs",
    oracle=f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM items),
        supp AS (
            SELECT l_partkey, COUNT(*) AS n_item FROM items GROUP BY 1
        ),
        pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   COUNT(*) AS n_pair
            FROM items a JOIN items b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
        )
        SELECT part_a, part_b,
               CAST(n_pair AS BIGINT) AS n_pair,
               CAST(sa.n_item AS BIGINT) AS n_a,
               CAST(sb.n_item AS BIGINT) AS n_b,
               ROUND(n_pair / CAST(sa.n_item AS DOUBLE), 6)
                   AS confidence_a_to_b,
               ROUND(n.n_baskets * n_pair
                     / (sa.n_item * CAST(sb.n_item AS DOUBLE)), 6) AS lift
        FROM pairs
        JOIN supp sa ON sa.l_partkey = part_a
        JOIN supp sb ON sb.l_partkey = part_b
        CROSS JOIN n
        ORDER BY part_a, part_b
    """,
    doc="Market-basket association rules over order baskets (Agrawal "
    "et al. 1993 support/confidence/lift): part pairs co-purchased in "
    f">= {BASKET_MIN_SUPPORT} orders, with directional confidence and "
    "lift (observed co-purchase rate over the independence "
    "expectation; > 1 means genuinely associated). The retail "
    "RELATIONAL twin of the event co-occurrence graph (#20c): the "
    "pair self-join is an equi-join on l_orderkey whose fan-out is "
    "bounded by basket size squared (TPC-H baskets are <= 7 lines; at "
    "100 TB an oversized-basket cap is the standard guard), supports "
    "are one item aggregation, and the basket total is a 1-row "
    "broadcast. All counts integer; lift is one final division.",
    tags=("relational", "analytics"),
)
def basket_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    # the distinct basket-item table feeds four subtrees (basket
    # count, support, both pair-join sides): materialize it once
    # instead of four lineitem scans + distincts (r11)
    items = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = items.agg(
        F.countDistinct("l_orderkey").alias("n_baskets")
    )
    supp = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_item")
    )
    a = items.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "k")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= BASKET_MIN_SUPPORT)
    )
    sa = supp.select(
        F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a")
    )
    sb = supp.select(
        F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b")
    )
    return (
        pairs.join(sa, "part_a")
        .join(sb, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_pair",
            "n_a",
            "n_b",
            F.round(
                F.col("n_pair") / F.col("n_a").cast("double"), 6
            ).alias("confidence_a_to_b"),
            F.round(
                F.col("n_baskets")
                * F.col("n_pair")
                / (F.col("n_a") * F.col("n_b").cast("double")),
                6,
            ).alias("lift"),
        )
        .orderBy("part_a", "part_b")
    )




# --- Markov removal-effect attribution ----------------------------------------
#
# r9 (VERDICT r8 #4b): rows-gate -> oracle hash gate, and the driver-
# side Gauss solve -> a fully declarative plan. The chain's transition
# probabilities are quantized to an exact integer grid (p_ij =
# floor(G * c_ij / tot_i), G = 1e6), the absorption system
# (I - Q) x = b is scaled by G into an INTEGER matrix M = G*I - P,
# and x_start is solved by CRAMER'S RULE: two determinants per
# scenario, expanded as the explicit permutation sum (120 terms for
# the 5x5 base chain, 24 for each 4x4 removal minor — removing a
# channel deletes its row+column since its redirected row is the
# identity). Every determinant term is a product of <=7-digit
# integers carried in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) —
# exact 128-bit arithmetic, identical on both engines — and each
# scenario's x = n/d is quantized onto the exact 1e-10 grid by two
# small-quotient integer divisions (_mk_x_exprs) before the single
# small-int float division, so the driver hash is exact by
# construction at any magnitude (r10, ADVICE r9: no DECIMAL->double
# cast of huge determinants, no double round-trip in the p grid).
# The SAME generated expression strings drive Spark's selectExpr and
# the DuckDB oracle, modulo the engine spelling of integer division
# (DIV vs //) and the wide-integer cast (DECIMAL vs HUGEINT). Channel
# domain is schema-pinned like user_event_type_pivot's value list.
# Corpus-sized work is unchanged: ONE ordered-LEAD pass + one global
# conditional aggregation to a single 35-cell row; everything after
# is single-row projection arithmetic (no collect, no driver solve),
# fanned to the 4 output rows by ONE stack() generator (no unionAll
# re-execution of the corpus subtree).

_MK_CHANNELS = ("click", "error", "signup", "view")
_MK_STATES = ("start",) + _MK_CHANNELS  # transient states, index 0..4
_MK_G = 1_000_000  # probability grid: p in [0, G] exact integers


def _mk_cells_exprs() -> list[str]:
    """One conditional-aggregation row over trans(src, dst): per
    transient state i its outgoing total t_i, per (i, j) the count
    into transient j, and cb_i the count into 'conversion'."""
    out = []
    for i, s in enumerate(_MK_STATES):
        out.append(
            f"CAST(SUM(CASE WHEN src = '{s}' THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS t_{i}"
        )
        for j, d in enumerate(_MK_STATES):
            out.append(
                f"CAST(SUM(CASE WHEN src = '{s}' AND dst = '{d}' "
                f"THEN 1 ELSE 0 END) AS BIGINT) AS c_{i}_{j}"
            )
        out.append(
            f"CAST(SUM(CASE WHEN src = '{s}' AND dst = 'conversion' "
            f"THEN 1 ELSE 0 END) AS BIGINT) AS cb_{i}"
        )
    return out


def _mk_p_exprs(widecast, idiv) -> list[str]:
    """Exact grid quantization: round-half-up of G*c/tot computed as
    floor((2*G*c + tot) / (2*tot)) via native INTEGER division
    (ADVICE r9: the former double-divide round-trip was exact only
    below 2^53 and Spark/DuckDB casts disagree past it; `DIV` / `//`
    are exact at any magnitude, and both floor — identical here since
    every operand is nonnegative). `widecast` lifts the count into
    DECIMAL/HUGEINT so 2*G*c cannot overflow int64 (c ~ 4.6e12 would);
    the quotient is <= 2G, long-safe for Spark's DIV. Half-up rather
    than floor so a closed-form chain like p = 2/3 lands on 0.666667,
    the 6-dp round of the true value. A state never observed as src
    (tot 0) keeps an all-zero row -> M row = G*identity, b = 0: it
    absorbs, contributing 0."""

    def p(c: str, t: str) -> str:
        num = f"(2 * {_MK_G} * {widecast(c)} + {t})"
        den = f"(2 * {t})"
        return (
            f"CASE WHEN {t} = 0 THEN 0 "
            f"ELSE CAST({idiv(num, den)} AS BIGINT) END"
        )

    out = []
    for i in range(len(_MK_STATES)):
        for j in range(len(_MK_STATES)):
            out.append(f"{p(f'c_{i}_{j}', f't_{i}')} AS p_{i}_{j}")
        out.append(f"{p(f'cb_{i}', f't_{i}')} AS pb_{i}")
    return out


def _mk_det(cells: list[list[str]], cast) -> str:
    """Permutation-expansion determinant over expression strings.

    The 120-term sum is combined as a BALANCED binary tree (depth ~7),
    not a left chain: DuckDB's binder recurses per nesting level and
    caps at depth 128. Addition order is immaterial — every term is
    exact integer arithmetic."""
    from itertools import permutations

    n = len(cells)
    terms = []
    for perm in permutations(range(n)):
        inv = sum(
            1
            for x in range(n)
            for y in range(x + 1, n)
            if perm[x] > perm[y]
        )
        prod = " * ".join(cast(cells[i][perm[i]]) for i in range(n))
        terms.append(f"(- ({prod}))" if inv % 2 else f"({prod})")

    def tree(ts: list[str]) -> str:
        if len(ts) == 1:
            return ts[0]
        mid = len(ts) // 2
        return f"({tree(ts[:mid])} + {tree(ts[mid:])})"

    return tree(terms)


def _mk_m(i: int, j: int) -> str:
    return f"({_MK_G} - p_{i}_{j})" if i == j else f"(0 - p_{i}_{j})"


def _mk_minor_exprs(cast) -> list[str]:
    """Cofactor stage: every determinant this query needs is expanded
    ALONG COLUMN 0, and the numerator det (column 0 replaced by b)
    shares the denominator's minors — so each scenario computes its
    column-0 minors ONCE as columns here (24-term 4x4 dets for the
    full chain, 6-term 3x3 dets per removal), and the dets stage is
    short signed dot products. 2x120 + 8x24 leaf products become
    5x24 + 16x6 — small enough for whole-stage codegen to compile."""
    n = len(_MK_STATES)
    out = []
    # full chain: minors of (row i, col 0)
    for i in range(n):
        rows = [r for r in range(n) if r != i]
        sub = [[_mk_m(r, c) for c in range(1, n)] for r in rows]
        out.append(f"{_mk_det(sub, cast)} AS mn_full_{i}")
    # removal of channel k: minors of M_k (rows/cols without k)
    for k in range(1, n):
        idx = [r for r in range(n) if r != k]
        for i in idx:
            rows = [r for r in idx if r != i]
            sub = [[_mk_m(r, c) for c in idx[1:]] for r in rows]
            out.append(f"{_mk_det(sub, cast)} AS mn_{k}_{i}")
    return out


def _mk_det_exprs(cast) -> list[str]:
    n = len(_MK_STATES)

    def dot(col0: list[str], minors: list[str]) -> str:
        terms = []
        for pos, (c, mn) in enumerate(zip(col0, minors)):
            t = f"({cast(c)} * {mn})"
            terms.append(f"(- {t})" if pos % 2 else t)
        return "(" + " + ".join(terms) + ")"

    m0 = [_mk_m(i, 0) for i in range(n)]
    b = [f"pb_{i}" for i in range(n)]
    full_mn = [f"mn_full_{i}" for i in range(n)]
    out = [
        f"{dot(m0, full_mn)} AS d_full",
        f"{dot(b, full_mn)} AS n_full",
    ]
    for k in range(1, n):  # remove channel k: delete row+col k
        idx = [i for i in range(n) if i != k]
        mk0 = [_mk_m(i, 0) for i in idx]
        bk = [b[i] for i in idx]
        mns = [f"mn_{k}_{i}" for i in idx]
        out.append(f"{dot(mk0, mns)} AS d_{k}")
        out.append(f"{dot(bk, mns)} AS n_{k}")
    return out


_MK_XQ = 100_000  # per-stage quotient grid; two stages -> 1e-10 x-resolution


def _mk_x_exprs(idiv) -> list[str]:
    """x = n/d quantized to the exact 1e-10 integer grid by TWO
    small-quotient integer divisions (ADVICE r9: the former
    DECIMAL(38,0)/HUGEINT -> DOUBLE cast of ~1e31 determinants relied
    on both engines rounding the cast identically, which DuckDB's
    two-limb HUGEINT->double composition does not guarantee). Each
    stage's quotient is <= ~1e5 (n <= d: x_start is a probability), so
    Spark's long-valued DIV never overflows, every intermediate stays
    inside DECIMAL(38,0)/HUGEINT (1e5 * |det| <= 1.2e37), and all
    operands are nonnegative so floor == trunc on both engines. The
    one float division per scenario is then small-int/1e10 — exact by
    construction at ANY corpus magnitude."""

    def x(nc: str, dc: str, alias: str) -> str:
        q1 = idiv(f"({_MK_XQ} * {nc})", dc)
        rem = f"({_MK_XQ} * {nc} - {q1} * {dc})"
        q2 = idiv(f"({_MK_XQ} * {rem})", dc)
        return (
            f"CASE WHEN {dc} <= 0 THEN 0.0 "
            f"ELSE CAST({q1} * {_MK_XQ} + {q2} AS DOUBLE) / 1.0e10 END"
            f" AS {alias}"
        )

    out = [x("n_full", "d_full", "base")]
    for k in range(1, len(_MK_STATES)):
        out.append(x(f"n_{k}", f"d_{k}", f"x_{k}"))
    return out


def _mk_e_exprs() -> list[str]:
    out = ["base"]
    for k in range(1, len(_MK_STATES)):
        out.append(
            f"CASE WHEN base > 0 THEN GREATEST(0.0, 1 - x_{k} / base) "
            f"ELSE 0.0 END AS e_{k}"
        )
    return out


_MK_TOT_E = "(" + " + ".join(
    f"e_{k}" for k in range(1, len(_MK_STATES))
) + ")"


def _mk_out_selects() -> list[list[str]]:
    outs = []
    for k, ch in enumerate(_MK_CHANNELS, start=1):
        outs.append(
            [
                f"'{ch}' AS channel",
                "ROUND(base, 6) AS base_conversion",
                f"ROUND(e_{k}, 6) AS removal_effect",
                f"CASE WHEN tot_e > 0 THEN ROUND(e_{k} / tot_e, 6) END"
                " AS attribution_share",
            ]
        )
    return outs


def _mk_cells_exprs_weighted() -> list[str]:
    """The cells aggregation from a pre-counted (src, dst, n) grid —
    the streaming maintainer's serving entry (29ap): identical cell
    values to _mk_cells_exprs over raw transition rows, since the
    grid is just those rows pre-grouped."""
    out = []
    for i, s in enumerate(_MK_STATES):
        out.append(
            f"CAST(COALESCE(SUM(CASE WHEN src = '{s}' THEN n ELSE 0 "
            f"END), 0) AS BIGINT) AS t_{i}"
        )
        for j, d in enumerate(_MK_STATES):
            out.append(
                f"CAST(COALESCE(SUM(CASE WHEN src = '{s}' AND dst = "
                f"'{d}' THEN n ELSE 0 END), 0) AS BIGINT) AS c_{i}_{j}"
            )
        out.append(
            f"CAST(COALESCE(SUM(CASE WHEN src = '{s}' AND dst = "
            f"'conversion' THEN n ELSE 0 END), 0) AS BIGINT) AS cb_{i}"
        )
    return out


def markov_table_from_cells(cells: DataFrame) -> DataFrame:
    """Shared serving tail (#131 batch query AND the 29ap streaming
    maintainer): single 35-cell row -> the 4-row attribution table via
    the exact integer-grid Cramer solve. ONE definition, so a replayed
    event log reproduces the batch attribution bit-for-bit. The 4
    channel rows come from ONE stack() generator over the 1-row `tot`
    (ADVICE r9: the former 4-way unionAll repeated the corpus-sized
    aggregation subtree 4x unless ReuseExchange happened to dedupe
    it; stack keeps the plan a single pass by construction)."""
    spark_cast = lambda c: f"CAST({c} AS DECIMAL(7,0))"  # noqa: E731
    spark_wide = lambda c: f"CAST({c} AS DECIMAL(19,0))"  # noqa: E731
    spark_idiv = lambda a, b: f"({a} DIV {b})"  # noqa: E731
    tot = (
        cells.selectExpr(*_mk_p_exprs(spark_wide, spark_idiv))
        .selectExpr("*", *_mk_minor_exprs(spark_cast))
        .selectExpr(*_mk_det_exprs(spark_cast))
        .selectExpr(*_mk_x_exprs(spark_idiv))
        .selectExpr(*_mk_e_exprs())
        .selectExpr("*", f"{_MK_TOT_E} AS tot_e")
    )
    pairs = ", ".join(
        f"'{ch}', e_{k}" for k, ch in enumerate(_MK_CHANNELS, start=1)
    )
    return (
        tot.selectExpr(
            "base",
            "tot_e",
            f"stack({len(_MK_CHANNELS)}, {pairs}) AS (channel, eff)",
        )
        .selectExpr(
            "channel",
            "ROUND(base, 6) AS base_conversion",
            "ROUND(eff, 6) AS removal_effect",
            "CASE WHEN tot_e > 0 THEN ROUND(eff / tot_e, 6) END"
            " AS attribution_share",
        )
        .orderBy("channel")
    )


_MK_TRANS_SQL = """
    steps AS (
        SELECT user_id, event_id, event_type,
               LEAD(event_type) OVER w AS next_raw,
               ROW_NUMBER() OVER w AS pos
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY epoch_us(ts), event_id)
    ),
    trans AS (
        SELECT 'start' AS src,
               CASE WHEN event_type = 'purchase' THEN 'conversion'
                    ELSE event_type END AS dst
        FROM steps WHERE pos = 1
        UNION ALL
        SELECT event_type AS src,
               CASE WHEN next_raw IS NULL THEN 'null'
                    WHEN next_raw = 'purchase' THEN 'conversion'
                    ELSE next_raw END AS dst
        FROM steps WHERE event_type <> 'purchase'
    )
"""


def _mk_oracle_sql() -> str:
    duck_cast = lambda c: f"CAST({c} AS HUGEINT)"  # noqa: E731
    duck_idiv = lambda a, b: f"({a} // {b})"  # noqa: E731
    return (
        "WITH "
        + _MK_TRANS_SQL
        + f""",
        cells AS MATERIALIZED (SELECT {", ".join(_mk_cells_exprs())} FROM trans),
        pcells AS MATERIALIZED (SELECT {", ".join(_mk_p_exprs(duck_cast, duck_idiv))} FROM cells),
        minors AS MATERIALIZED (SELECT *, {", ".join(_mk_minor_exprs(duck_cast))} FROM pcells),
        dets AS MATERIALIZED (SELECT {", ".join(_mk_det_exprs(duck_cast))} FROM minors),
        xs AS (SELECT {", ".join(_mk_x_exprs(duck_idiv))} FROM dets),
        fin AS (SELECT {", ".join(_mk_e_exprs())} FROM xs),
        tot AS (SELECT *, {_MK_TOT_E} AS tot_e FROM fin)
        """
        + "\nUNION ALL ".join(
            f"SELECT {', '.join(sel)} FROM tot" for sel in _mk_out_selects()
        )
        + "\nORDER BY channel"
    )


@register(
    "markov_attribution",
    oracle=_mk_oracle_sql(),
    doc="Markov removal-effect channel attribution (Anderl et al. "
    "2014, the data-driven alternative to last-touch): user journeys "
    "become a first-order Markov chain over channels (non-purchase "
    "event types) with absorbing states CONVERSION (next event is a "
    "purchase) and NULL (journey ends unconverted); a channel's "
    "removal effect is the relative drop in start->conversion "
    "absorption probability when its row is removed (redirected to "
    "NULL), and attribution shares normalize the removal effects. "
    "Corpus-sized work is ONE ordered-LEAD transition aggregation to "
    "a single 35-cell row; the absorption solve is Cramer's rule on "
    "the G-scaled INTEGER chain matrix, unrolled as exact "
    "decimal/HUGEINT permutation sums identical on both engines "
    "(oracle hash gate since r9 — VERDICT r8 #4b; previously a "
    "driver-side float Gauss solve under a rows gate). Closed-form "
    "chains pytest-pinned (a channel on every converting path has "
    "removal effect 1, an unused channel 0).",
    tags=("analytics", "temporal"),
)
def markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    steps = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
    ).select(
        "event_type",
        F.lead("event_type").over(w).alias("next_raw"),
        F.row_number().over(w).alias("pos"),
    )
    firsts = steps.where(F.col("pos") == 1).selectExpr(
        "'start' AS src",
        "CASE WHEN event_type = 'purchase' THEN 'conversion' "
        "ELSE event_type END AS dst",
    )
    chans = steps.where(F.col("event_type") != "purchase").selectExpr(
        "event_type AS src",
        "CASE WHEN next_raw IS NULL THEN 'null' "
        "WHEN next_raw = 'purchase' THEN 'conversion' "
        "ELSE next_raw END AS dst",
    )
    cells = firsts.unionByName(chans).selectExpr(*_mk_cells_exprs())
    return markov_table_from_cells(cells)




# --- supplier ship-latency profile -------------------------------------------


@register(
    "supplier_ship_latency",
    oracle="""
        SELECT l_suppkey AS suppkey,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(date_diff('day', o_orderdate, l_shipdate))
                    AS BIGINT) AS total_latency_days,
               ROUND(SUM(date_diff('day', o_orderdate, l_shipdate))
                     / CAST(COUNT(*) AS DOUBLE), 4) AS avg_latency_days,
               CAST(MIN(date_diff('day', o_orderdate, l_shipdate))
                    AS BIGINT) AS min_latency_days,
               CAST(MAX(date_diff('day', o_orderdate, l_shipdate))
                    AS BIGINT) AS max_latency_days,
               ROUND(count_if(l_shipdate < o_orderdate)
                     / CAST(COUNT(*) AS DOUBLE), 6) AS impossible_rate
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_suppkey
        ORDER BY suppkey
    """,
    doc="Supplier ship-latency profile — days from order date to each "
    "lineitem's ship date, aggregated per supplier, with the "
    "IMPOSSIBLE-date rate (shipped before ordered) as the embedded "
    "data-quality flag (this synthetic generator draws the two dates "
    "independently, so the flag fires — exactly what the report "
    "exists to surface in a real supply chain). One fact-fact "
    "equi-join on l_orderkey (AQE-planned), one supplier aggregate; "
    "all latency arithmetic is INTEGER day diffs summed exactly, so "
    "the average is one deterministic division.",
    tags=("relational", "validation"),
)
def supplier_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    lag = F.datediff("l_shipdate", "o_orderdate")
    n = F.count(F.lit(1))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            n.alias("n_items"),
            F.sum(lag).cast("long").alias("total_latency_days"),
            F.round(F.sum(lag) / n.cast("double"), 4).alias(
                "avg_latency_days"
            ),
            F.min(lag).cast("long").alias("min_latency_days"),
            F.max(lag).cast("long").alias("max_latency_days"),
            F.round(
                F.count_if(F.col("l_shipdate") < F.col("o_orderdate"))
                / n.cast("double"),
                6,
            ).alias("impossible_rate"),
        )
        .orderBy("suppkey")
    )




# --- quantile (rank) normalization -------------------------------------------


@register(
    "quantile_transform_values",
    oracle="""
        WITH coded AS (
            SELECT event_id, event_type,
                   CAST(ROUND(value * 100) AS BIGINT) AS v_c
            FROM events
        ),
        grid AS (
            SELECT event_type, v_c, COUNT(*) AS cnt
            FROM coded GROUP BY event_type, v_c
        ),
        ranked AS (
            SELECT event_type, v_c, cnt,
                   COALESCE(SUM(cnt) OVER (
                       PARTITION BY event_type ORDER BY v_c
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS n_less,
                   SUM(cnt) OVER (PARTITION BY event_type) AS n
            FROM grid
        )
        SELECT c.event_id, c.event_type,
               ROUND(c.v_c / 100.0, 2) AS value,
               ROUND((r.n_less + (r.cnt + 1) / 2.0)
                     / CAST(r.n AS DOUBLE), 6) AS q_uniform
        FROM coded c
        JOIN ranked r
          ON c.event_type = r.event_type AND c.v_c = r.v_c
        ORDER BY c.event_id
    """,
    doc="Quantile (rank) normalization of value within each event "
    "type — the scikit-learn QuantileTransformer / rank-gauss feature "
    "transform, as the exact MIDRANK empirical CDF: q = (#less + "
    "(#equal+1)/2) / n, mapping any distribution to ~Uniform(0,1) "
    "with ties at their midpoint. The scale-smart form: instead of a "
    "per-type percent_rank window over the CORPUS (one partition per "
    "type = the skew trap), the ECDF is computed on the distinct "
    "integer cent-code grid — bounded by the value domain, not row "
    "count — and joined back; all counts are integers, so both "
    "engines agree bit-for-bit before the single final division "
    "(same cent-code discipline as target_encoding_loo #123).",
    tags=("analytics", "llm"),
)
def quantile_transform_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    coded = ev.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v_c"),
    )
    grid = coded.groupBy("event_type", "v_c").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_less = (
        Window.partitionBy("event_type")
        .orderBy("v_c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("event_type")
    ranked = grid.select(
        "event_type",
        "v_c",
        "cnt",
        F.coalesce(F.sum("cnt").over(w_less), F.lit(0)).alias("n_less"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    return (
        coded.join(ranked, ["event_type", "v_c"])
        .select(
            "event_id",
            "event_type",
            F.round(F.col("v_c") / 100.0, 2).alias("value"),
            F.round(
                (F.col("n_less") + (F.col("cnt") + 1) / 2.0)
                / F.col("n").cast("double"),
                6,
            ).alias("q_uniform"),
        )
        .orderBy("event_id")
    )


_patch_rfm_oracle()
_patch_pit_oracle()
