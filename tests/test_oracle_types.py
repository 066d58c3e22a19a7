"""Every registered oracle must produce driver-hashable column types.

The driver value-hashes typed results; DuckDB's SUM(int)/count_if
return HUGEINT where Spark returns BIGINT, which hash-mismatches even
when values are identical (round-1 lost q12 + pack_sequences to this).
DESCRIBE every oracle against the sf0.001 views and fail on any
HUGEINT-family column so a new query can't reintroduce the bug.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry

BANNED = {"HUGEINT", "UHUGEINT", "INT128", "UINT128"}
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    conn = duckdb.connect()
    for t in TABLES:
        conn.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        )
    return conn


@pytest.mark.slow  # >10 s: slow tier, run with -m slow
def test_no_nested_oracle_columns(duck):
    """The driver canonicalizes results through pandas sort_values,
    which cannot hash list/struct/map cells (round-3 lost
    embedding_quantize to a `codes array<bigint>` column). Gate the
    whole class: every oracle-checked query must emit flat scalar
    columns only — serialize nested payloads (array_join / to_json)
    on BOTH engines instead."""
    offenders = {}
    for name, sql in entry.oracle_sql().items():
        desc = duck.execute(f"DESCRIBE SELECT * FROM ({sql}) q").fetchall()
        bad = [
            (col, typ)
            for col, typ, *_ in desc
            if "[]" in typ or typ.upper().startswith(("STRUCT", "MAP", "LIST"))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"oracles emit nested (unhashable) columns: {offenders}"


@pytest.mark.slow  # ~2 min: builds all ~260 registered plans
def test_no_nested_spark_columns(spark, sf_small):
    """Spark-side twin of the oracle lint, covering the queries the
    oracle lint can't: rows-gated entries have no oracle SQL, so a
    nested Spark output column sails past DESCRIBE and crashes the
    driver canonicalizer at check time (r5 lost embedding_pq to a
    `codes array<int>` column exactly this way; r3 lost
    embedding_quantize). Build every registered query at sf0.001 and
    fail on any array/map/struct field in the result schema."""
    from pyspark.sql import types as T

    from mvrs_dspa_spark.plans.registry import all_queries

    offenders = {}
    for name, spec in all_queries().items():
        df = spec.fn(spark, sf_small)
        bad = [
            (f.name, f.dataType.simpleString())
            for f in df.schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"registered queries emit nested (driver-unhashable) columns: {offenders}"
    )


def test_no_hugeint_oracle_columns(duck):
    offenders = {}
    for name, sql in entry.oracle_sql().items():
        desc = duck.execute(f"DESCRIBE SELECT * FROM ({sql}) q").fetchall()
        bad = [(col, typ) for col, typ, *_ in desc if typ.upper() in BANNED]
        if bad:
            offenders[name] = bad
    assert not offenders, f"oracles emit non-hashable int128 types: {offenders}"
