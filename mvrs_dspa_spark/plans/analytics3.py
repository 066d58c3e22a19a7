"""Round-6 seventh wave: lifecycle and time-series structure queries
(SURVEY §2 #143-144).

- ``user_activity_streaks`` — the gaps-and-islands idiom: longest run
  of consecutive active days per user, plus streak counts. The classic
  SQL formulation (day - ROW_NUMBER() is constant within an island)
  is fully declarative: no iteration, no UDF, one shuffle on user_id.
- ``hourly_stl_decomposition`` — STL-style seasonal/trend/remainder
  decomposition of the hourly event-count series (Cleveland et al.
  1990's decomposition skeleton: centered 25-hour moving-average
  trend, hour-of-day mean seasonal of the detrended series, additive
  remainder). The moving average and seasonal means are carried as
  EXACT integer sufficient statistics (25x-scaled detrended codes) so
  summation order cannot move a hash; each float is one division on
  identical integer inputs, rounded on both engines.

Both extend the hourly/temporal family (10af gap-fill, 10ah momentum,
10ak autocorrelation, 10an CUSUM) with the two shapes it still lacked:
per-entity consecutive-run structure and an explicit
seasonal-vs-trend split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mvrs_dspa_spark.plans.registry import register
from mvrs_dspa_spark.tables import table

_DAY_US = 86_400_000_000
_HOUR_US = 3_600_000_000

# Centered moving-average window for the trend: +/- 12 hours.
_STL_HALF = 12
_STL_W = 2 * _STL_HALF + 1  # 25


@register(
    "user_activity_streaks",
    oracle=f"""
        WITH days AS (
            SELECT DISTINCT user_id,
                   epoch_us(ts) // {_DAY_US} AS day
            FROM events
        ),
        islands AS (
            SELECT user_id, day,
                   day - ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY day) AS isl
            FROM days
        ),
        streaks AS (
            SELECT user_id, isl,
                   CAST(COUNT(*) AS BIGINT) AS len,
                   MIN(day) AS start_day
            FROM islands GROUP BY user_id, isl
        ),
        marked AS (
            SELECT user_id, len, start_day,
                   MAX(len) OVER (PARTITION BY user_id) AS max_len
            FROM streaks
        )
        SELECT user_id,
               CAST(SUM(len) AS BIGINT) AS n_active_days,
               CAST(COUNT(*) AS BIGINT) AS n_streaks,
               MAX(len) AS longest_streak,
               MIN(CASE WHEN len = max_len THEN start_day END)
                   AS longest_streak_start
        FROM marked
        GROUP BY user_id
        ORDER BY user_id
    """,
    doc="Longest consecutive-active-day streak per user via the "
    "gaps-and-islands idiom (day - ROW_NUMBER is constant within a "
    "run of consecutive days): per user the active-day count, number "
    "of distinct streaks, longest streak length, and the earliest "
    "start day of a maximal streak (deterministic tiebreak). The "
    "engagement-loyalty lifecycle metric next to the RFM (#79) and "
    "lifecycle-stage (#107) segmentations. Pure integer arithmetic "
    "end-to-end. Plan: one distinct on the (user, day) pair grid "
    "(bounded by users x retention days, far below event volume), "
    "then every window and aggregate is partitioned by user_id — the "
    "distinct's shuffle is the ONLY exchange; the analytic max rides "
    "the same partitioning. No skew risk beyond a single user's day "
    "count, which the retention window caps.",
    tags=("analytics", "windows"),
)
def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day"),
    ).distinct()
    w_rn = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "isl", F.col("day") - F.row_number().over(w_rn)
    )
    streaks = islands.groupBy("user_id", "isl").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("day").alias("start_day"),
    )
    w_max = Window.partitionBy("user_id")
    marked = streaks.withColumn("max_len", F.max("len").over(w_max))
    return (
        marked.groupBy("user_id")
        .agg(
            F.sum("len").alias("n_active_days"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("len").alias("longest_streak"),
            F.min(
                F.when(F.col("len") == F.col("max_len"), F.col("start_day"))
            ).alias("longest_streak_start"),
        )
        .orderBy("user_id")
    )


@register(
    "hourly_stl_decomposition",
    oracle=f"""
        WITH hourly AS (
            SELECT epoch_us(ts) // {_HOUR_US} AS hr, COUNT(*) AS n
            FROM events GROUP BY 1
        ),
        bounds AS (SELECT MIN(hr) AS h0, MAX(hr) AS h1 FROM hourly),
        grid AS (
            SELECT unnest(generate_series(h0, h1)) AS hr FROM bounds
        ),
        filled AS (
            SELECT g.hr, COALESCE(h.n, 0) AS n
            FROM grid g LEFT JOIN hourly h USING (hr)
        ),
        tr AS (
            SELECT hr, n,
                   SUM(n) OVER w25 AS s25,
                   COUNT(*) OVER w25 AS c25
            FROM filled
            WINDOW w25 AS (ORDER BY hr
                           ROWS BETWEEN {_STL_HALF} PRECEDING
                                    AND {_STL_HALF} FOLLOWING)
        ),
        det AS (
            SELECT hr, n, s25,
                   {_STL_W} * n - s25 AS det_code
            FROM tr WHERE c25 = {_STL_W}
        ),
        seas AS (
            SELECT hr % 24 AS hod,
                   SUM(det_code) AS dsum,
                   CAST(COUNT(*) AS BIGINT) AS dcnt
            FROM det GROUP BY 1
        )
        SELECT d.hr AS hour,
               CAST(d.n AS BIGINT) AS n_events,
               ROUND(d.s25 / {_STL_W}.0, 6) AS trend,
               ROUND(s.dsum / ({_STL_W}.0 * s.dcnt), 6) AS seasonal,
               ROUND(d.n - d.s25 / {_STL_W}.0
                         - s.dsum / ({_STL_W}.0 * s.dcnt), 6)
                   AS remainder
        FROM det d JOIN seas s ON d.hr % 24 = s.hod
        ORDER BY hour
    """,
    doc="STL-style additive decomposition of the hourly event-count "
    "series (Cleveland et al. 1990 skeleton): trend = centered "
    f"{_STL_W}-hour moving average (emitted only where the window is "
    "complete), seasonal = hour-of-day mean of the detrended series, "
    "remainder = observed - trend - seasonal. The anomaly/monitoring "
    "companion to autocorrelation (10ak) and CUSUM (10an): a "
    "remainder spike is a seasonality-adjusted anomaly. Determinism: "
    f"the detrended series is carried as the exact integer code "
    f"{_STL_W}*n - sum25 (no float subtraction), seasonal means and "
    "the trend are each ONE division of exact int64 sums, and the "
    "remainder expression is written with identical operation order "
    "in both engines, rounded to 6. Plan: one groupBy to the hourly "
    "grid (bounded by the retention window — the single-partition "
    "analytic over it is a constant-size series, the house pattern "
    "of 10ah/10ak/10an), a sequence-explode gap fill so ROWS frames "
    "mean hours, then a 24-cell seasonal rollup joined back by "
    "hour-of-day.",
    tags=("analytics", "windows", "timeseries"),
)
def hourly_stl_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.select(F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("hr"))
        .groupBy("hr")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bounds = hourly.agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    grid = bounds.select(
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hr")
    )
    filled = grid.join(hourly, "hr", "left").select(
        "hr", F.coalesce("n", F.lit(0).cast("long")).alias("n")
    )
    w25 = (
        Window.orderBy("hr").rowsBetween(-_STL_HALF, _STL_HALF)
    )
    tr = filled.select(
        "hr",
        "n",
        F.sum("n").over(w25).alias("s25"),
        F.count(F.lit(1)).over(w25).alias("c25"),
    )
    det = tr.where(F.col("c25") == _STL_W).select(
        "hr",
        "n",
        "s25",
        (F.lit(_STL_W) * F.col("n") - F.col("s25")).alias("det_code"),
    )
    seas = det.groupBy((F.col("hr") % 24).alias("hod")).agg(
        F.sum("det_code").alias("dsum"),
        F.count(F.lit(1)).alias("dcnt"),
    )
    trend = F.col("s25") / float(_STL_W)
    seasonal = F.col("dsum") / (float(_STL_W) * F.col("dcnt"))
    return (
        det.join(
            F.broadcast(seas), det["hr"] % 24 == seas["hod"]
        )
        .select(
            F.col("hr").alias("hour"),
            F.col("n").cast("long").alias("n_events"),
            F.round(trend, 6).alias("trend"),
            F.round(seasonal, 6).alias("seasonal"),
            F.round(F.col("n") - trend - seasonal, 6).alias("remainder"),
        )
        .orderBy("hour")
    )
