"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a registered Spark query and its oracle SQL side by side at a
given scale factor and compares row count, column names, and an
order-insensitive canonicalized value set — catching hash mismatches
before the round gate does.
"""

from __future__ import annotations

import datetime
import math

import duckdb

from mvrs_dspa_spark.tables import TABLE_NAMES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    conn = duckdb.connect()
    for name in TABLE_NAMES:
        # tolerate partial directories: scenario tests synthesize only
        # the table(s) a query reads (e.g. a degenerate events table)
        if os.path.exists(f"{sf_dir}/{name}.parquet"):
            conn.execute(
                f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
            )
    return conn


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (int, str)):
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return str(v)


def _canon_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(row[i]) for i in order) for row in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


def compare(spark, sf_dir: str, name: str) -> None:
    """Assert the Spark query and DuckDB oracle agree for query `name`."""
    from mvrs_dspa_spark.plans.registry import all_queries

    spec = all_queries()[name]
    assert spec.oracle is not None, f"{name} has no oracle"

    sdf = spec.fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    conn = duckdb_conn(sf_dir)
    try:
        res = conn.execute(spec.oracle)
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
    finally:
        conn.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    cs, cd = _canon_rows(spark_cols, spark_rows), _canon_rows(duck_cols, duck_rows)
    mismatches = [(a, b) for a, b in zip(cs, cd) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[0]}"
