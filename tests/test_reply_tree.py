"""Reply-tree root resolution — edge cases mirroring the reference's
BuildReplyTreeProcessFunctionTestSuite (dangling replies, deep chains)."""

from __future__ import annotations

from pyspark.sql import Row

from mvrs_dspa_spark.operators.reply_tree import resolve_roots


def _resolve(spark, rows):
    df = spark.createDataFrame(
        [Row(id=i, parent_id=p) for i, p in rows], "id long, parent_id long"
    )
    out = resolve_roots(df).collect()
    return {r.id: (r.root_id, r.depth) for r in out}


def test_flat_forest(spark):
    got = _resolve(spark, [(1, None), (2, 1), (3, 1), (4, None), (5, 4)])
    assert got == {1: (1, 0), 2: (1, 1), 3: (1, 1), 4: (4, 0), 5: (4, 1)}


def test_deep_chain(spark):
    # depth 40 forces several doubling rounds (ceil(log2 40) = 6)
    rows = [(0, None)] + [(i, i - 1) for i in range(1, 41)]
    got = _resolve(spark, rows)
    assert got[40] == (0, 40)
    assert got[17] == (0, 17)
    assert len(got) == 41


def test_dangling_chain_excluded(spark):
    # 10 -> 99 (missing); 11 -> 10 chains into the dangling node
    got = _resolve(spark, [(1, None), (10, 99), (11, 10)])
    assert got == {1: (1, 0)}


def test_all_roots(spark):
    got = _resolve(spark, [(1, None), (2, None)])
    assert got == {1: (1, 0), 2: (2, 0)}
