"""Skew mitigation utilities (SURVEY §4 scale posture).

At 100 TB a handful of hot keys (viral posts in the reference's event
streams, boilerplate shingles in dedup) can put one reducer orders of
magnitude behind the rest. Two standard remedies, engine-native:

- :func:`salted_aggregate` — two-phase aggregation: partial-aggregate
  on (key, salt) to spread a hot key over N reducers, then combine on
  key. Correct for any decomposable aggregate (sum/count/min/max, and
  avg as sum+count). AQE's skew handling only splits *join* partitions,
  not aggregation state, so this is the aggregation-side remedy.
- :func:`replicate_small_for_salted_join` — the salted-join pattern:
  the big side gets a deterministic salt in [0, n); the small side is
  exploded n-fold so every (key, salt) bucket finds its match. Used
  when the small side is too big to broadcast but the big side's key
  distribution is skewed. (When the small side fits in memory,
  `F.broadcast` is strictly better — see the join strategy in
  plans/tpch.py.)

The salted rollup is registered as an oracle-gated query: the salt
must be invisible in the result, so hash-matching DuckDB's plain
GROUP BY proves the decomposition correct.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mvrs_dspa_spark.plans.registry import register
from mvrs_dspa_spark.tables import table

DEFAULT_SALT = 16


def with_salt(df: DataFrame, salt_on: str, n: int = DEFAULT_SALT) -> DataFrame:
    """Deterministic salt in [0, n) derived from a (unique-ish) column.

    Hash-derived rather than rand(): re-runs and speculative retries
    see the same salt, so the operator stays idempotent.
    """
    return df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n)))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    salt_on: str,
    sums: Sequence[str] = (),
    n: int = DEFAULT_SALT,
) -> DataFrame:
    """Two-phase skew-safe aggregation: count + sums per key.

    Phase 1 groups on (keys..., salt) — a hot key's rows land on n
    reducers instead of one; phase 2 combines the n partials per key.
    Shuffle volume rises by ~n rows *per key* (tiny), reducer skew
    drops by ~n.
    """
    partial = with_salt(df, salt_on, n).groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(c).alias(f"_s_{c}") for c in sums],
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n_rows"),
        *[F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sums],
    )


def replicate_small_for_salted_join(
    small: DataFrame, n: int = DEFAULT_SALT
) -> DataFrame:
    """Explode the small join side n-fold with a `_salt` column so it
    equi-joins against `with_salt(big, ...)` on (key, _salt)."""
    return small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_on: str,
    n: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join on `on`: big side salted, small side replicated.

    Only join types where an unmatched SMALL-side row produces no output
    row are supported: the small side is replicated n-fold, so right /
    full outer joins would emit each unmatched small-side row once per
    salt value — silently wrong n-fold duplication.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join does not support how={how!r}: the n-fold "
            "replicated small side would duplicate unmatched rows; use "
            "inner/left/left_semi/left_anti"
        )
    b = with_salt(big, salt_on, n)
    s = replicate_small_for_salted_join(small, n)
    joined = b.join(s, [on, "_salt"], how)
    return joined.drop("_salt")


@register(
    "salted_event_rollup",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n_rows,
               ROUND(SUM(value), 2) AS total_value
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    doc="Hot-key-safe two-phase aggregation: salt spreads each "
    "event_type (only 5 distinct -> maximal skew) over 16 reducers; "
    "result hash-matches the plain GROUP BY, proving the salt is "
    "invisible.",
    tags=("relational", "scale"),
)
def salted_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    out = salted_aggregate(
        ev, keys=["event_type"], salt_on="event_id", sums=["value"]
    )
    return out.select(
        "event_type",
        "n_rows",
        F.round("sum_value", 2).alias("total_value"),
    ).orderBy("event_type")
