"""Cross-engine identity of the deterministic hash layer — if these
hold, every minhash/LSH/fingerprint oracle comparison reduces to
plain arithmetic both engines do identically."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from mvrs_dspa_spark.functions import hashing as H


def test_hash_params_deterministic():
    assert H.hash_params(4) == H.hash_params(4)
    assert H.hash_params(4, seed=1) != H.hash_params(4, seed=2)
    for a, b in H.hash_params(64):
        assert 1 <= a < H.P and 0 <= b < H.P


def test_affine_cross_engine(spark):
    (a, b), *_ = H.hash_params(1)
    xs = [0, 1, 12345, H.P - 1, 2**40]
    sdf = spark.createDataFrame([(x,) for x in xs], "x long").select(
        H.affine_col(F.col("x"), a, b).alias("h")
    )
    spark_vals = [r.h for r in sdf.collect()]
    duck_vals = [
        duckdb.sql(f"select {H.affine_sql(str(x), a, b)}").fetchone()[0] for x in xs
    ]
    py_vals = [(a * (x % H.P) + b) % H.P for x in xs]
    assert spark_vals == duck_vals == py_vals


def test_str_code_cross_engine(spark):
    strs = ["", "a", "abc", "hello world", "ZZ top 42!", "ünïcode"]
    sdf = spark.createDataFrame([(s,) for s in strs], "s string").select(
        H.str_code_col(F.col("s")).alias("c")
    )
    spark_vals = [r.c for r in sdf.collect()]
    conn = duckdb.connect()
    duck_vals = [
        conn.execute(f"select {H.str_code_sql('?')}", [s]).fetchone()[0] for s in strs
    ]
    assert spark_vals == duck_vals
    assert len(set(spark_vals)) == len(strs)  # no trivial collisions


def test_poly_hash_cross_engine(spark):
    """Cubic polynomial family: Spark and DuckDB bit-identical over
    negatives, zero, P boundary, and large int64 values."""
    import duckdb
    from pyspark.sql import functions as F

    from mvrs_dspa_spark.functions import hashing as H

    coeffs = H.poly_params(3, degree=3, seed=313)
    xs = [0, 1, 5, 97, H.P - 1, H.P, H.P + 1, 2**40, 123_456_789]
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    conn = duckdb.connect()
    for cs in coeffs:
        got = {
            r.x: r.h
            for r in df.select("x", H.poly_col(F.col("x"), cs).alias("h")).collect()
        }
        for x in xs:
            want = conn.execute(f"SELECT {H.poly_sql(str(x), cs)}").fetchone()[0]
            assert got[x] == want, (x, cs, got[x], want)


def test_poly_hash_sign_balance():
    """Sign hash must be near-balanced over a dense integer range (the
    failure mode that rules out parity-of-affine for consecutive keys)."""
    from mvrs_dspa_spark.functions import hashing as H

    for cs in H.poly_params(5, degree=3, seed=727):
        signs = [1 - 2 * (_poly_int(x, cs) % 2) for x in range(10_000)]
        assert abs(sum(signs)) < 400  # ~4 sigma for n=10k


def _poly_int(x: int, coeffs) -> int:
    acc = coeffs[0]
    xm = x % 2_147_483_647
    for c in coeffs[1:]:
        acc = (acc * xm + c) % 2_147_483_647
    return acc
