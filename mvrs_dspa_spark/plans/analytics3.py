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
    # bounded hourly series feeds bounds + gap-fill (and the serving
    # tail reads it through two window/join consumers); checkpoint ->
    # one events scan instead of four (r11, the MASE pattern)
    hourly = (
        ev.select(F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("hr"))
        .groupBy("hr")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
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


# --- Theil-Sen robust trend ----------------------------------------------------
#
# Median-of-pairwise-slopes estimator (Theil 1950, Sen 1968): 29.3%
# breakdown point where OLS (10ai) breaks on one bad hour. The pair
# set is quadratic in the series length, so the series is capped at
# TS_MAX_POINTS by adaptive hour-bucketing (width = ceil(span/720)):
# the 10x stress probe caught the unbounded form going quadratic on a
# span that grows with data volume.

TS_MAX_POINTS = 720

# The bucketed hourly series CTEs — ONE definition shared by the
# Theil-Sen slope oracle (#150) and the Mann-Kendall trend-test oracle
# (#187, plans/analytics5.py): hourly counts, adaptive bucket width,
# and the <= TS_MAX_POINTS (event_type, hr_rel, n, w) point set.
TS_PTS_SQL = f"""
        hourly AS (
            SELECT event_type,
                   epoch_us(ts) // {_HOUR_US} AS hr,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        bnds AS (SELECT MIN(hr) AS h0, MAX(hr) AS h1 FROM hourly),
        wd AS (
            SELECT (h1 - h0 + {TS_MAX_POINTS}) // {TS_MAX_POINTS} AS w
            FROM bnds
        ),
        rel AS (
            SELECT h.event_type,
                   ((h.hr - MIN(h.hr) OVER (PARTITION BY h.event_type))
                        // w.w) * w.w AS hr_rel,
                   h.n, w.w
            FROM hourly h CROSS JOIN wd w
        ),
        pts AS (
            SELECT event_type, hr_rel,
                   CAST(SUM(n) AS BIGINT) AS n,
                   ANY_VALUE(w) AS w
            FROM rel GROUP BY event_type, hr_rel
        )"""


def ts_bucketed_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of TS_PTS_SQL: the capped (event_type, hr_rel, n, w)
    hourly point series feeding both the Theil-Sen slope (#150) and
    the Mann-Kendall trend test (#187)."""
    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("hr"),
        )
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wd = hourly.agg(
        F.expr(
            f"(max(hr) - min(hr) + {TS_MAX_POINTS}) div {TS_MAX_POINTS}"
        ).alias("w")
    )
    return (
        hourly.crossJoin(F.broadcast(wd))
        .select(
            "event_type",
            F.expr(
                "((hr - min(hr) over (partition by event_type)) div w) * w"
            ).alias("hr_rel"),
            "n",
            "w",
        )
        .groupBy("event_type", "hr_rel")
        .agg(F.sum("n").alias("n"), F.any_value("w").alias("w"))
    )


@register(
    "hourly_theil_sen_trend",
    oracle=f"""
        WITH {TS_PTS_SQL},
        slopes AS (
            SELECT a.event_type,
                   (b.n - a.n)
                       / CAST(a.w * (b.hr_rel - a.hr_rel) AS DOUBLE)
                       AS slope
            FROM pts a JOIN pts b
              ON a.event_type = b.event_type AND a.hr_rel < b.hr_rel
        ),
        ranked AS (
            SELECT event_type, slope,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY slope) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS cnt
            FROM slopes
        ),
        med AS (
            SELECT event_type,
                   AVG(slope) AS ts_slope,
                   ANY_VALUE(cnt) AS n_pairs
            FROM ranked
            WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
            GROUP BY event_type
        ),
        resid AS (
            SELECT r.event_type,
                   r.n / CAST(r.w AS DOUBLE) - m.ts_slope * r.hr_rel
                       AS res,
                   m.ts_slope, m.n_pairs
            FROM pts r JOIN med m USING (event_type)
        ),
        rranked AS (
            SELECT event_type, res, ts_slope, n_pairs,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY res) AS rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS cnt
            FROM resid
        )
        SELECT event_type,
               CAST(ANY_VALUE(cnt) AS BIGINT) AS n_points,
               CAST(ANY_VALUE(n_pairs) AS BIGINT) AS n_pairs,
               ROUND(ANY_VALUE(ts_slope), 6) AS slope_per_hour,
               ROUND(AVG(res), 6) AS intercept
        FROM rranked
        WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="Theil-Sen robust trend per event type over the hourly count "
    "series (Theil 1950, Sen 1968): slope = median of all pairwise "
    "slopes, intercept = median residual at the relative-hour "
    "origin — the 29%-breakdown robust companion to the OLS fit "
    "(10ai) and the MAD outlier screen (#77). Determinism: each "
    "pairwise slope is ONE division of exact int64 deltas; the "
    "median picks the middle row(s) of a ROW_NUMBER ordering and "
    "averages at most two doubles (commutative — no summation-order "
    "exposure). Scale: the pair set is quadratic in the series "
    "LENGTH, so the series is adaptively down-sampled — bucket width "
    "= ceil(span/720), at most 720 points per type regardless of the "
    "retention span (on a 30-day corpus width is 1 and the series IS "
    "the hourly one); slopes stay in per-hour units by dividing the "
    "bucket-total delta by width*hour-delta, and the 10x stress "
    "probe pins ~flat runtime under a 10x-longer span. Per-type "
    "parallel; the event scan contributes only the hourly rollup.",
    tags=("analytics", "timeseries"),
)
def hourly_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    w_type = Window.partitionBy("event_type")
    # materialize the <=720x5-row point series ONCE (lazy
    # localCheckpoint, the mann_kendall idiom): pts feeds both sides
    # of the pairwise-slope self-join AND the residual stage — without
    # it the events scan + hourly rollup executes six times (the
    # bucket-width broadcast doubles each of the three consumers; r11
    # before-plan shows Scan parquet x6).
    pts = ts_bucketed_points(spark, sf_dir).localCheckpoint(eager=False)
    a, b = pts.alias("a"), pts.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.hr_rel") < F.col("b.hr_rel")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.n") - F.col("a.n"))
            / (
                F.col("a.w") * (F.col("b.hr_rel") - F.col("a.hr_rel"))
            ).cast("double")
        ).alias("slope"),
    )
    w_rank = Window.partitionBy("event_type").orderBy("slope")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_type).alias("cnt"),
    )
    med = (
        ranked.where(
            (F.col("rn") == F.expr("(cnt + 1) div 2"))
            | (F.col("rn") == F.expr("(cnt + 2) div 2"))
        )
        .groupBy("event_type")
        .agg(
            F.avg("slope").alias("ts_slope"),
            F.any_value("cnt").alias("n_pairs"),
        )
    )
    resid = pts.join(med, "event_type").select(
        "event_type",
        (
            F.col("n") / F.col("w").cast("double")
            - F.col("ts_slope") * F.col("hr_rel")
        ).alias("res"),
        "ts_slope",
        "n_pairs",
    )
    w_rrank = Window.partitionBy("event_type").orderBy("res")
    rranked = resid.select(
        "event_type",
        "res",
        "ts_slope",
        "n_pairs",
        F.row_number().over(w_rrank).alias("rn"),
        F.count(F.lit(1)).over(w_type).alias("cnt"),
    )
    return (
        rranked.where(
            (F.col("rn") == F.expr("(cnt + 1) div 2"))
            | (F.col("rn") == F.expr("(cnt + 2) div 2"))
        )
        .groupBy("event_type")
        .agg(
            F.any_value("cnt").cast("long").alias("n_points"),
            F.any_value("n_pairs").cast("long").alias("n_pairs"),
            F.round(F.any_value("ts_slope"), 6).alias("slope_per_hour"),
            F.round(F.avg("res"), 6).alias("intercept"),
        )
        .orderBy("event_type")
    )


# --- seasonal-naive forecast backtest (MASE) -----------------------------------

_MASE_H = 24  # holdout horizon: the last day of hours


@register(
    "forecast_backtest_mase",
    oracle=f"""
        WITH hourly AS (
            SELECT event_type,
                   epoch_us(ts) // {_HOUR_US} AS hr,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        bounds AS (SELECT MIN(hr) AS h0, MAX(hr) AS h1 FROM hourly),
        grid AS (
            SELECT t.event_type, g.hr
            FROM (SELECT DISTINCT event_type FROM hourly) t
            CROSS JOIN (SELECT unnest(generate_series(h0, h1)) AS hr
                        FROM bounds) g
        ),
        filled AS (
            SELECT g.event_type, g.hr, COALESCE(h.n, 0) AS n
            FROM grid g LEFT JOIN hourly h
              ON h.event_type = g.event_type AND h.hr = g.hr
        ),
        lagged AS (
            SELECT f.event_type, f.hr, f.n,
                   LAG(f.n, {_MASE_H}) OVER (
                       PARTITION BY f.event_type ORDER BY f.hr) AS n_lag,
                   b.h0, b.h1
            FROM filled f CROSS JOIN bounds b
        ),
        lt AS (
            SELECT l.event_type, l.n AS n_last_train
            FROM lagged l WHERE l.hr = l.h1 - {_MASE_H}
        ),
        agg AS (
            SELECT l.event_type,
                   SUM(CASE WHEN l.hr > l.h1 - {_MASE_H}
                            THEN ABS(l.n - t.n_last_train) END)
                       AS err_naive,
                   SUM(CASE WHEN l.hr > l.h1 - {_MASE_H}
                            THEN ABS(l.n - l.n_lag) END) AS err_seasonal,
                   SUM(CASE WHEN l.hr >= l.h0 + {_MASE_H}
                                 AND l.hr <= l.h1 - {_MASE_H}
                            THEN ABS(l.n - l.n_lag) END) AS den_sum,
                   SUM(CASE WHEN l.hr >= l.h0 + {_MASE_H}
                                 AND l.hr <= l.h1 - {_MASE_H}
                            THEN 1 END) AS den_cnt
            FROM lagged l JOIN lt t USING (event_type)
            GROUP BY l.event_type
        )
        SELECT event_type,
               ROUND(err_naive / {_MASE_H}.0, 6) AS mae_naive,
               ROUND(err_seasonal / {_MASE_H}.0, 6) AS mae_seasonal,
               CASE WHEN den_sum > 0 THEN
                   ROUND((err_naive * den_cnt)
                         / CAST({_MASE_H} * den_sum AS DOUBLE), 6)
               END AS mase_naive,
               CASE WHEN den_sum > 0 THEN
                   ROUND((err_seasonal * den_cnt)
                         / CAST({_MASE_H} * den_sum AS DOUBLE), 6)
               END AS mase_seasonal
        FROM agg
        ORDER BY event_type
    """,
    doc="Seasonal-naive forecast backtest with MASE per event type "
    "(Hyndman & Koehler 2006): hold out the final 24 hours, forecast "
    "them with (a) the last training value and (b) the value 24 "
    "hours earlier, and scale each MAE by the in-sample seasonal-"
    "naive MAE — MASE < 1 beats the in-sample seasonal baseline; "
    "seasonal-naive beating flat-naive confirms the daily cycle the "
    "STL split (#144) models. The eval harness half of the "
    "forecasting loop (10ah momentum and 10ak autocorrelation are "
    "the diagnostics half). Determinism: all errors are ABS of "
    "exact int64 count deltas summed exactly; each reported float "
    "is ONE division (cross-multiplied MASE so numerator/denominator "
    "stay integer), rounded on both engines. Plan: the dense "
    "(type x hour) grid is bounded by types x retention window; one "
    "LAG window per type and one rollup — the event scan feeds a "
    "single hourly aggregation.",
    tags=("analytics", "timeseries"),
)
def forecast_backtest_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # the bounded (type x hour) count grid feeds bounds, the type
    # list, and the gap-fill join — and the lagged series is read by
    # both the last-train lookup and the error rollup; before r11
    # every reference re-ran the corpus aggregation (8 events scans in
    # the plan). One lazy checkpoint of the grid makes the whole tail
    # grid-bounded: events is scanned once.
    hourly = (
        ev.select(
            "event_type",
            F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("hr"),
        )
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    bounds = hourly.agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    types = hourly.select("event_type").distinct()
    grid = types.crossJoin(
        F.broadcast(bounds).select(
            F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hr")
        )
    )
    filled = grid.join(hourly, ["event_type", "hr"], "left").select(
        "event_type",
        "hr",
        F.coalesce("n", F.lit(0).cast("long")).alias("n"),
    )
    w_lag = Window.partitionBy("event_type").orderBy("hr")
    lagged = filled.withColumn(
        "n_lag", F.lag("n", _MASE_H).over(w_lag)
    ).crossJoin(F.broadcast(bounds))
    lt = lagged.where(F.col("hr") == F.col("h1") - _MASE_H).select(
        "event_type", F.col("n").alias("n_last_train")
    )
    is_test = F.col("hr") > F.col("h1") - _MASE_H
    in_den = (F.col("hr") >= F.col("h0") + _MASE_H) & (
        F.col("hr") <= F.col("h1") - _MASE_H
    )
    agg = (
        lagged.join(F.broadcast(lt), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(is_test, F.abs(F.col("n") - F.col("n_last_train")))
            ).alias("err_naive"),
            F.sum(
                F.when(is_test, F.abs(F.col("n") - F.col("n_lag")))
            ).alias("err_seasonal"),
            F.sum(
                F.when(in_den, F.abs(F.col("n") - F.col("n_lag")))
            ).alias("den_sum"),
            F.sum(F.when(in_den, F.lit(1))).alias("den_cnt"),
        )
    )
    mase = lambda err: F.when(  # noqa: E731
        F.col("den_sum") > 0,
        F.round(
            (err * F.col("den_cnt"))
            / (F.lit(_MASE_H) * F.col("den_sum")).cast("double"),
            6,
        ),
    )
    return agg.select(
        "event_type",
        F.round(F.col("err_naive") / float(_MASE_H), 6).alias("mae_naive"),
        F.round(F.col("err_seasonal") / float(_MASE_H), 6).alias(
            "mae_seasonal"
        ),
        mase(F.col("err_naive")).alias("mase_naive"),
        mase(F.col("err_seasonal")).alias("mase_seasonal"),
    ).orderBy("event_type")


# --- burstiness / index-of-dispersion profile ----------------------------------


@register(
    "hourly_burstiness",
    oracle=f"""
        WITH hourly AS (
            SELECT event_type,
                   epoch_us(ts) // {_HOUR_US} AS hr,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        bounds AS (SELECT MIN(hr) AS h0, MAX(hr) AS h1 FROM hourly),
        grid AS (
            SELECT t.event_type, g.hr
            FROM (SELECT DISTINCT event_type FROM hourly) t
            CROSS JOIN (SELECT unnest(generate_series(h0, h1)) AS hr
                        FROM bounds) g
        ),
        filled AS (
            SELECT g.event_type, COALESCE(h.n, 0) AS n
            FROM grid g LEFT JOIN hourly h
              ON h.event_type = g.event_type AND h.hr = g.hr
        ),
        s AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_hours,
                   CAST(SUM(n) AS BIGINT) AS s1,
                   CAST(SUM(n * n) AS BIGINT) AS s2
            FROM filled GROUP BY event_type
        )
        SELECT event_type, n_hours,
               ROUND(s1 / CAST(n_hours AS DOUBLE), 6) AS mean_rate,
               CASE WHEN n_hours > 1 AND s1 > 0 THEN
                   ROUND((n_hours * s2 - s1 * s1)
                         / CAST((n_hours - 1) * s1 AS DOUBLE), 6)
               END AS dispersion,
               CASE WHEN n_hours > 1 AND s1 > 0 THEN
                   ROUND((n_hours * s2 - s1 * s1) * n_hours
                         / CAST((n_hours - 1) * s1 * s1 AS DOUBLE), 6)
               END AS cv_squared
        FROM s
        ORDER BY event_type
    """,
    doc="Burstiness profile per event type over the gap-filled hourly "
    "series: index of dispersion (variance-to-mean ratio; 1 under a "
    "Poisson arrival process, > 1 = bursty/overdispersed — the "
    "capacity-planning statistic) and the squared coefficient of "
    "variation. Sits next to the inter-arrival profile (10as) as the "
    "count-domain view of the same burstiness question. Determinism: "
    "variance comes from the exact integer identity n*S2 - S1^2 over "
    "int64 count sums, and each reported statistic is ONE division "
    "of integer products (cross-multiplied), rounded on both "
    "engines. Plan: one hourly rollup, a bounded types x hours gap "
    "fill, and a 5-row aggregate.",
    tags=("analytics", "timeseries"),
)
def hourly_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    # bounded hourly grid feeds bounds + types + gap-fill; checkpoint
    # -> one events scan instead of three (r11, the MASE pattern)
    hourly = (
        ev.select(
            "event_type",
            F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("hr"),
        )
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    bounds = hourly.agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    types = hourly.select("event_type").distinct()
    grid = types.crossJoin(
        F.broadcast(bounds).select(
            F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hr")
        )
    )
    filled = grid.join(hourly, ["event_type", "hr"], "left").select(
        "event_type", F.coalesce("n", F.lit(0).cast("long")).alias("n")
    )
    s = filled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    var_num = F.col("n_hours") * F.col("s2") - F.col("s1") * F.col("s1")
    ok = (F.col("n_hours") > 1) & (F.col("s1") > 0)
    return s.select(
        "event_type",
        "n_hours",
        F.round(F.col("s1") / F.col("n_hours").cast("double"), 6).alias(
            "mean_rate"
        ),
        F.when(
            ok,
            F.round(
                var_num
                / ((F.col("n_hours") - 1) * F.col("s1")).cast("double"),
                6,
            ),
        ).alias("dispersion"),
        F.when(
            ok,
            F.round(
                var_num
                * F.col("n_hours")
                / (
                    (F.col("n_hours") - 1) * F.col("s1") * F.col("s1")
                ).cast("double"),
                6,
            ),
        ).alias("cv_squared"),
    ).orderBy("event_type")


# --- daily growth accounting ----------------------------------------------------


@register(
    "daily_growth_accounting",
    oracle=f"""
        WITH days AS (
            SELECT DISTINCT user_id,
                   epoch_us(ts) // {_DAY_US} AS day
            FROM events
        ),
        maxd AS (SELECT MAX(day) AS max_day FROM days),
        seq AS (
            SELECT user_id, day,
                   LAG(day) OVER (PARTITION BY user_id ORDER BY day)
                       AS prev,
                   LEAD(day) OVER (PARTITION BY user_id ORDER BY day)
                       AS next
            FROM days
        ),
        stat AS (
            SELECT day,
                   CAST(count_if(prev IS NULL) AS BIGINT) AS n_new,
                   CAST(count_if(prev = day - 1) AS BIGINT) AS n_retained,
                   CAST(count_if(prev IS NOT NULL AND prev < day - 1)
                        AS BIGINT) AS n_resurrected
            FROM seq GROUP BY day
        ),
        churn AS (
            SELECT s.day + 1 AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_churned
            FROM seq s CROSS JOIN maxd m
            WHERE (s.next IS NULL OR s.next > s.day + 1)
              AND s.day + 1 <= m.max_day
            GROUP BY s.day + 1
        )
        SELECT COALESCE(s.day, c.day) AS day,
               COALESCE(s.n_new, 0) AS n_new,
               COALESCE(s.n_retained, 0) AS n_retained,
               COALESCE(s.n_resurrected, 0) AS n_resurrected,
               COALESCE(c.n_churned, 0) AS n_churned,
               CASE WHEN COALESCE(c.n_churned, 0) > 0 THEN
                   ROUND((COALESCE(s.n_new, 0)
                          + COALESCE(s.n_resurrected, 0))
                         / CAST(c.n_churned AS DOUBLE), 6)
               END AS quick_ratio
        FROM stat s FULL OUTER JOIN churn c ON s.day = c.day
        ORDER BY day
    """,
    doc="Daily growth accounting (the Social Capital growth framework "
    "popularized by Chamath Palihapitiya's 'quick ratio'): every "
    "active (user, day) classified as NEW (first day ever), RETAINED "
    "(also active the previous day), or RESURRECTED (returning after "
    "a gap); CHURNED(d) counts users active on d-1 but not d (no "
    "phantom churn after the observation window's last day). Quick "
    "ratio = (new + resurrected) / churned — > 1 means the DAU base "
    "grows. The flow-decomposition companion to the stock views "
    "(retention cohorts 10ag, DAU/WAU #128, lifecycle #107, streaks "
    "#143). Pure integer counting from one (user, day) distinct; "
    "both LAG and LEAD ride the same user-partitioned sort; the two "
    "bounded day-level rollups meet in a full outer join; the one "
    "float is the guarded final ratio. At 100 TB: one exchange on "
    "user_id, then day-grid-bounded everything.",
    tags=("analytics", "windows"),
)
def daily_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day"),
    ).distinct()
    w_u = Window.partitionBy("user_id").orderBy("day")
    # the lag/lead sequence feeds both the per-day state rollup and
    # the churn pass, and the max-day scalar reads the same rows —
    # materialized once, events is scanned once instead of 3x (r11)
    seq = days.select(
        "user_id",
        "day",
        F.lag("day").over(w_u).alias("prev"),
        F.lead("day").over(w_u).alias("next"),
    ).localCheckpoint(eager=False)
    maxd = seq.agg(F.max("day").alias("max_day"))
    stat = seq.groupBy("day").agg(
        F.count_if(F.col("prev").isNull()).alias("n_new"),
        F.count_if(F.col("prev") == F.col("day") - 1).alias("n_retained"),
        F.count_if(
            F.col("prev").isNotNull() & (F.col("prev") < F.col("day") - 1)
        ).alias("n_resurrected"),
    )
    churn = (
        seq.crossJoin(F.broadcast(maxd))
        .where(
            (F.col("next").isNull() | (F.col("next") > F.col("day") + 1))
            & (F.col("day") + 1 <= F.col("max_day"))
        )
        .groupBy((F.col("day") + 1).alias("day"))
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    joined = stat.join(churn, "day", "full_outer")
    n_churned = F.coalesce("n_churned", F.lit(0).cast("long"))
    gains = F.coalesce("n_new", F.lit(0).cast("long")) + F.coalesce(
        "n_resurrected", F.lit(0).cast("long")
    )
    return joined.select(
        "day",
        F.coalesce("n_new", F.lit(0).cast("long")).alias("n_new"),
        F.coalesce("n_retained", F.lit(0).cast("long")).alias("n_retained"),
        F.coalesce("n_resurrected", F.lit(0).cast("long")).alias(
            "n_resurrected"
        ),
        n_churned.alias("n_churned"),
        F.when(
            n_churned > 0,
            F.round(gains / n_churned.cast("double"), 6),
        ).alias("quick_ratio"),
    ).orderBy("day")


# --- ABC (Pareto) inventory classification --------------------------------------


@register(
    "parts_abc_classification",
    oracle="""
        WITH rev AS (
            SELECT l_partkey,
                   CAST(ROUND(SUM(l_extendedprice * (1 - l_discount))
                              * 100) AS BIGINT) AS cents
            FROM lineitem GROUP BY l_partkey
        ),
        ranked AS (
            SELECT l_partkey, cents,
                   SUM(cents) OVER (ORDER BY cents DESC, l_partkey
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS cum,
                   SUM(cents) OVER () AS tot
            FROM rev
        ),
        classed AS (
            SELECT CASE WHEN cum * 100 <= 80 * tot THEN 'A'
                        WHEN cum * 100 <= 95 * tot THEN 'B'
                        ELSE 'C' END AS abc_class,
                   cents, tot
            FROM ranked
        )
        SELECT abc_class,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               ROUND(SUM(cents) / 100.0, 2) AS revenue,
               ROUND(SUM(cents) / CAST(ANY_VALUE(tot) AS DOUBLE), 6)
                   AS revenue_share
        FROM classed
        GROUP BY abc_class
        ORDER BY abc_class
    """,
    doc="ABC (Pareto) inventory classification of parts by discounted "
    "revenue — the 80/15/5 cut: class A holds the parts covering the "
    "first 80% of cumulative revenue, B to 95%, C the tail; the "
    "classic warehouse prioritization next to the concentration "
    "views (q11 value concentration, activity Gini 10ar). "
    "Determinism: per-part revenue is rounded to exact cent codes "
    "BEFORE the cumulative window (int64 running sum over the "
    "deterministic (cents desc, partkey) order — no float cumsum), "
    "class boundaries compare cross-multiplied integers, and the "
    "two output floats are single divisions. Scale: the global "
    "ordered window runs over the PART DIMENSION (already one row "
    "per part after the map-side-combined rollup) — dimension-"
    "bounded, the house equi-depth/NTILE posture (10aj) — while the "
    "lineitem fact contributes only the first aggregation.",
    tags=("relational", "analytics"),
)
def parts_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            * 100
        )
        .cast("long")
        .alias("cents")
    )
    w_cum = (
        Window.orderBy(F.desc("cents"), F.asc("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    ranked = rev.select(
        "l_partkey",
        "cents",
        F.sum("cents").over(w_cum).alias("cum"),
        F.sum("cents").over(w_all).alias("tot"),
    )
    abc = (
        F.when(F.col("cum") * 100 <= 80 * F.col("tot"), "A")
        .when(F.col("cum") * 100 <= 95 * F.col("tot"), "B")
        .otherwise("C")
    )
    return (
        ranked.select(abc.alias("abc_class"), "cents", "tot")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("cents") / 100.0, 2).alias("revenue"),
            F.round(
                F.sum("cents") / F.any_value("tot").cast("double"), 6
            ).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


# --- CUPED variance-reduced A/B analysis ----------------------------------------

_CUPED_A = 2_654_435_761 % 2_147_483_647  # Knuth multiplicative (as ab_test)


@register(
    "ab_test_cuped",
    oracle=f"""
        WITH bounds AS (
            SELECT MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS t1
            FROM events
        ),
        per_user AS (
            SELECT user_id,
                   (({_CUPED_A}::BIGINT * (user_id % 2147483647))
                        % 2147483647) % 2 AS arm,
                   CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                 AND epoch_us(ts) * 2 < b.t0 + b.t1
                            THEN CAST(ROUND(value * 100) AS BIGINT)
                            ELSE 0 END), 0) AS BIGINT) AS x,
                   CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                 AND epoch_us(ts) * 2 >= b.t0 + b.t1
                            THEN CAST(ROUND(value * 100) AS BIGINT)
                            ELSE 0 END), 0) AS BIGINT) AS y
            FROM events CROSS JOIN bounds b
            GROUP BY user_id, arm
        ),
        arms AS (
            SELECT arm,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * x) AS sxx, SUM(x * y) AS sxy,
                   SUM(y * y) AS syy
            FROM per_user GROUP BY arm
        ),
        g AS (
            SELECT arm, n, sx, sy,
                   SUM(n) OVER () AS gn,
                   SUM(sx) OVER () AS gsx, SUM(sy) OVER () AS gsy,
                   SUM(sxx) OVER () AS gsxx,
                   SUM(sxy) OVER () AS gsxy,
                   SUM(syy) OVER () AS gsyy
            FROM arms
        )
        SELECT arm, n AS n_users,
               ROUND(sy / (100.0 * n), 6) AS mean_post,
               CASE WHEN 1.0 * gn * gsxx - 1.0 * gsx * gsx > 0 THEN
                   ROUND(sy / (100.0 * n)
                         - ((1.0 * gn * gsxy - 1.0 * gsx * gsy)
                            / (1.0 * gn * gsxx - 1.0 * gsx * gsx))
                           * (sx / (100.0 * n) - gsx / (100.0 * gn)),
                         6)
               END AS mean_post_cuped,
               CASE WHEN 1.0 * gn * gsxx - 1.0 * gsx * gsx > 0 THEN
                   ROUND((1.0 * gn * gsxy - 1.0 * gsx * gsy)
                         / (1.0 * gn * gsxx - 1.0 * gsx * gsx), 6)
               END AS theta,
               CASE WHEN (1.0 * gn * gsxx - 1.0 * gsx * gsx) > 0
                     AND (1.0 * gn * gsyy - 1.0 * gsy * gsy) > 0 THEN
                   ROUND((1.0 * gn * gsxy - 1.0 * gsx * gsy)
                         * (1.0 * gn * gsxy - 1.0 * gsx * gsy)
                         / ((1.0 * gn * gsxx - 1.0 * gsx * gsx)
                            * (1.0 * gn * gsyy - 1.0 * gsy * gsy)),
                         6)
               END AS var_reduction
        FROM g
        ORDER BY arm
    """,
    doc="CUPED variance-reduced A/B analysis (Deng et al. 2013, the "
    "industry-standard experiment sensitivity booster): per user, "
    "pre-period purchase revenue (first half of the time range) is "
    "the covariate, post-period revenue the metric; theta = "
    "cov(x,y)/var(x) pooled across arms, adjusted per-arm mean = "
    "mean(y) - theta*(mean_arm(x) - mean(x)), variance reduction = "
    "corr(x,y)^2. Complements the Welch t-test report (10ap) — the "
    "same hash-bucketed arms, now with the pre-period adjustment "
    "that shrinks the confidence interval by the reported factor. "
    "Determinism: ALL sufficient statistics are exact int64 sums of "
    "cent codes (per-user products stay < 2^63 at the cent scale; a "
    "planet-scale deployment would carry dollar codes), theta and "
    "each adjusted mean are single expressions on identical integer "
    "sums, every output rounds to 6. Plan: one groupBy to per-user "
    "(x, y) cents, one 2-row arm rollup, analytic global sums over "
    "those 2 rows — the CUPED closed form needs no per-user second "
    "pass.",
    tags=("analytics", "experimentation"),
)
def ab_test_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.expr("unix_micros(ts)")).alias("t0"),
        F.max(F.expr("unix_micros(ts)")).alias("t1"),
    )
    cents = F.round(F.col("value") * 100).cast("long")
    is_purchase = F.col("event_type") == "purchase"
    in_pre = F.expr("unix_micros(ts) * 2") < F.col("t0") + F.col("t1")
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy(
            "user_id",
            (
                (F.lit(_CUPED_A) * (F.col("user_id") % 2147483647))
                % 2147483647
                % 2
            ).alias("arm"),
        )
        .agg(
            F.coalesce(
                F.sum(F.when(is_purchase & in_pre, cents).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("x"),
            F.coalesce(
                F.sum(F.when(is_purchase & ~in_pre, cents).otherwise(0)),
                F.lit(0),
            )
            .cast("long")
            .alias("y"),
        )
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    w = Window.partitionBy()
    gn = F.sum("n").over(w)
    gsx = F.sum("sx").over(w)
    gsy = F.sum("sy").over(w)
    gsxx = F.sum("sxx").over(w)
    gsxy = F.sum("sxy").over(w)
    gsyy = F.sum("syy").over(w)
    cov_num = 1.0 * gn * gsxy - 1.0 * gsx * gsy
    varx_num = 1.0 * gn * gsxx - 1.0 * gsx * gsx
    vary_num = 1.0 * gn * gsyy - 1.0 * gsy * gsy
    theta = cov_num / varx_num
    # guards in DOUBLE like the numerators: raw int64 cent-code products
    # overflow int64 under ANSI mode at larger scale factors (ADVICE r6)
    varx_pos = varx_num > 0
    return (
        arms.select(
            "arm",
            F.col("n").alias("n_users"),
            F.round(F.col("sy") / (100.0 * F.col("n")), 6).alias(
                "mean_post"
            ),
            F.when(
                varx_pos,
                F.round(
                    F.col("sy") / (100.0 * F.col("n"))
                    - theta
                    * (
                        F.col("sx") / (100.0 * F.col("n"))
                        - gsx / (100.0 * gn)
                    ),
                    6,
                ),
            ).alias("mean_post_cuped"),
            F.when(varx_pos, F.round(theta, 6)).alias("theta"),
            F.when(
                varx_pos & (vary_num > 0),
                F.round(cov_num * cov_num / (varx_num * vary_num), 6),
            ).alias("var_reduction"),
        )
        .orderBy("arm")
    )


# --- supplier scorecard -----------------------------------------------------------


@register(
    "supplier_scorecard",
    oracle="""
        WITH li AS (
            SELECT l_suppkey,
                   CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT) AS rev_cents,
                   CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret,
                   CAST(ROUND(l_discount * 10000) AS BIGINT) AS disc_bp,
                   l_partkey
            FROM lineitem
        ),
        per_s AS (
            SELECT s.s_suppkey, s.s_name,
                   CAST(COUNT(*) AS BIGINT) AS n_lineitems,
                   SUM(rev_cents) AS rev_cents,
                   CAST(SUM(ret) AS BIGINT) AS n_returned,
                   SUM(disc_bp) AS disc_bp,
                   CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
                       AS n_distinct_parts
            FROM li JOIN supplier s ON s.s_suppkey = li.l_suppkey
            GROUP BY s.s_suppkey, s.s_name
        )
        SELECT s_suppkey, s_name, n_lineitems, n_distinct_parts,
               ROUND(rev_cents / 100.0, 2) AS revenue,
               ROUND(rev_cents / CAST(SUM(rev_cents) OVER () AS DOUBLE),
                     6) AS revenue_share,
               ROUND(n_returned / CAST(n_lineitems AS DOUBLE), 6)
                   AS return_rate,
               ROUND(disc_bp / (10000.0 * n_lineitems), 6)
                   AS avg_discount,
               CAST(ROW_NUMBER() OVER (ORDER BY rev_cents DESC,
                                       s_suppkey) AS BIGINT)
                   AS revenue_rank
        FROM per_s
        ORDER BY revenue_rank
        LIMIT 50
    """,
    doc="Supplier scorecard — the procurement-review rollup: per "
    "supplier the line-item volume, distinct-part breadth, revenue "
    "and corpus share, return rate (returnflag R), and average "
    "granted discount, ranked by revenue (top 50). Complements the "
    "latency profile (#133) with the commercial KPIs. Determinism: "
    "revenue as exact cent codes, discounts as exact basis-point "
    "codes, every ratio ONE division; ranking orders by the exact "
    "integer revenue with suppkey tiebreak. Plan: one fact rollup "
    "on suppkey (map-side combined; the dimension joins via "
    "broadcast), share/rank as analytics over the supplier-"
    "dimension-bounded result, top-50 pushed down.",
    tags=("relational", "analytics"),
)
def supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    enriched = li.select(
        "l_suppkey",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("rev_cents"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("disc_bp"),
        "l_partkey",
    )
    per_s = (
        enriched.join(
            F.broadcast(sup.select("s_suppkey", "s_name")),
            enriched["l_suppkey"] == F.col("s_suppkey"),
        )
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum("rev_cents").alias("rev_cents"),
            F.sum("ret").alias("n_returned"),
            F.sum("disc_bp").alias("disc_bp"),
            F.count_distinct("l_partkey").alias("n_distinct_parts"),
        )
    )
    w_all = Window.partitionBy()
    w_rank = Window.orderBy(F.desc("rev_cents"), F.asc("s_suppkey"))
    return (
        per_s.select(
            "s_suppkey",
            "s_name",
            "n_lineitems",
            "n_distinct_parts",
            F.round(F.col("rev_cents") / 100.0, 2).alias("revenue"),
            F.round(
                F.col("rev_cents")
                / F.sum("rev_cents").over(w_all).cast("double"),
                6,
            ).alias("revenue_share"),
            F.round(
                F.col("n_returned") / F.col("n_lineitems").cast("double"), 6
            ).alias("return_rate"),
            F.round(
                F.col("disc_bp") / (10000.0 * F.col("n_lineitems")), 6
            ).alias("avg_discount"),
            F.row_number().over(w_rank).cast("long").alias("revenue_rank"),
        )
        .orderBy("revenue_rank")
        .limit(50)
    )


# --- brand price elasticity -------------------------------------------------------


@register(
    "brand_price_elasticity",
    oracle="""
        WITH obs AS (
            SELECT p.p_brand,
                   CAST(ROUND(LN(l.l_extendedprice / l.l_quantity)
                              * 1e4) AS BIGINT) AS xc,
                   CAST(ROUND(LN(l.l_quantity) * 1e4) AS BIGINT) AS yc
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
        ),
        s AS (
            SELECT p_brand,
                   CAST(COUNT(*) AS BIGINT) AS n_obs,
                   SUM(xc) AS sx, SUM(yc) AS sy,
                   SUM(xc * xc) AS sxx, SUM(xc * yc) AS sxy
            FROM obs GROUP BY p_brand
        )
        SELECT p_brand, n_obs,
               CASE WHEN 1.0 * n_obs * sxx - 1.0 * sx * sx > 0 THEN
                   ROUND((1.0 * n_obs * sxy - 1.0 * sx * sy)
                         / (1.0 * n_obs * sxx - 1.0 * sx * sx), 6)
               END AS elasticity
        FROM s
        ORDER BY p_brand
    """,
    doc="Brand-level price elasticity of demand: per brand, the OLS "
    "slope of ln(quantity) on ln(unit price) over its line items — "
    "the constant-elasticity (log-log) demand model of introductory "
    "econometrics; elasticity < -1 = elastic demand. The same "
    "integer-coded OLS as the Heaps/Zipf fits (#155/#156), but at the "
    "1e-4 code scale: per-brand observation counts are fact-sized "
    "(not 10-100 points), so code products must stay int64 through "
    "SUM at ~1e9 rows per brand; the final slope/guard expressions "
    "run in double (identical operation order both engines). Plan: fact scan joins the broadcast "
    "part dimension, ONE map-side-combined rollup to the bounded "
    "brand grid. On synthetic uniform prices the elasticity "
    "correctly lands near its null value — the operator is the "
    "estimator, not the data.",
    tags=("relational", "analytics"),
)
def brand_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    obs = (
        li.where((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .select(
            "p_brand",
            F.round(
                F.log(F.col("l_extendedprice") / F.col("l_quantity")) * 1e4
            )
            .cast("long")
            .alias("xc"),
            F.round(F.log(F.col("l_quantity")) * 1e4)
            .cast("long")
            .alias("yc"),
        )
    )
    s = obs.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("xc").alias("sx"),
        F.sum("yc").alias("sy"),
        F.sum(F.col("xc") * F.col("xc")).alias("sxx"),
        F.sum(F.col("xc") * F.col("yc")).alias("sxy"),
    )
    slope = (
        1.0 * F.col("n_obs") * F.col("sxy") - 1.0 * F.col("sx") * F.col("sy")
    ) / (
        1.0 * F.col("n_obs") * F.col("sxx") - 1.0 * F.col("sx") * F.col("sx")
    )
    return s.select(
        "p_brand",
        "n_obs",
        F.when(
            1.0 * F.col("n_obs") * F.col("sxx")
            - 1.0 * F.col("sx") * F.col("sx")
            > 0,
            F.round(slope, 6),
        ).alias("elasticity"),
    ).orderBy("p_brand")
