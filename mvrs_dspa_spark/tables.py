"""Loaders for the test star schema.

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under an sf directory.
Loading stays lazy (DataFrame readers), so Catalyst can prune columns
and push filters into the parquet scan per query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_session_configs(spark: SparkSession) -> None:
    """Make reads work under ANY caller-supplied session, not just ours.

    events.parquet stores ts as INT64 TIMESTAMP(NANOS); without
    nanosAsLong the scan throws PARQUET_TYPE_ILLEGAL.  Both configs are
    runtime-settable SQLConfs, so setting them here is safe even on a
    session we did not build.  UTC pins timestamp-literal parsing so
    date predicates (q3/q4/q6/q12...) can't shift under a non-UTC JVM.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    _ensure_session_configs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Normalize ts to TIMESTAMP (session tz, pinned UTC above) no
        # matter how the generator wrote it: INT64 TIMESTAMP(NANOS)
        # surfaces as long nanos via nanosAsLong; TIMESTAMP(MICROS)
        # without the UTC-adjusted flag surfaces as TIMESTAMP_NTZ.
        # DuckDB reads both as naive micros, so either branch keeps the
        # oracle comparison instant-identical.
        from pyspark.sql import functions as F

        field = dict(df.dtypes).get("ts")
        if field == "bigint":
            # integer div: nanos ~1.7e18 exceed double's 53-bit mantissa
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field == "timestamp_ntz":
            # NTZ -> LTZ is exact under the UTC session tz; downstream
            # code (unix_micros, windows, watermarks) expects TIMESTAMP
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


# --- events.props "k" extraction -------------------------------------------
#
# props is the flat {"k": <scalar>} JSON payload. Extracting the k
# value token by regex instead of a full JSON parse halves the
# CPU-bound extraction stage (interleaved A/B at sf0.1: 0.62 -> 0.41 s
# through the similarity items pipeline). The full-token pattern
# ([^,}"]+ then TRY_CAST at the use site) keeps JSON-equivalent scalar
# semantics — "46.5" or "abc" still cast to NULL, never a partial
# numeric match (RE2 has no lookahead, so a digits-only pattern could
# not be mirrored safely in the DuckDB oracle). Written in the Java
# regex ∩ RE2 common subset so both engines extract identical strings;
# no-match maps to NULL on both sides via NULLIF.

PROPS_K_PATTERN = '"k":\\s*"?([^,}"]+)"?'


def props_k_col():
    from pyspark.sql import functions as F

    return F.nullif(
        F.regexp_extract("props", PROPS_K_PATTERN, 1), F.lit("")
    )


def props_k_sql() -> str:
    return f"NULLIF(regexp_extract(props, '{PROPS_K_PATTERN}', 1), '')"
