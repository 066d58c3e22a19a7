"""cluster_components unit tests: the transitive cases pair-level
dedup misses (a~b, b~c but not a~c) and multi-component graphs."""

from __future__ import annotations

from pyspark.sql import functions as F

from mvrs_dspa_spark.operators.dedup import cluster_components


def _cc(spark, node_ids, undirected_edges):
    nodes = spark.createDataFrame([(n,) for n in node_ids], "doc long")
    edges = spark.createDataFrame(
        [(a, b) for a, b in undirected_edges] + [(b, a) for a, b in undirected_edges],
        "a long, b long",
    )
    got = cluster_components(nodes, edges)
    return {r["doc"]: r["comp"] for r in got.collect()}


def test_chain_merges_transitively(spark):
    # 1-2, 2-3, 3-4: one component rooted at 1, even though 1~4 was
    # never a candidate pair.
    assert _cc(spark, [1, 2, 3, 4], [(1, 2), (2, 3), (3, 4)]) == {
        1: 1, 2: 1, 3: 1, 4: 1
    }


def test_components_stay_separate(spark):
    got = _cc(spark, [1, 2, 3, 10, 11, 20], [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_singletons_self_labeled(spark):
    assert _cc(spark, [5, 7], []) == {5: 5, 7: 7}


def test_shingles_survive_empty_documents(spark):
    # zero-token docs used to pass length -1 to slice() and blow up the
    # whole dedup family at runtime
    from pyspark.sql import functions as F

    from mvrs_dspa_spark.operators.dedup import shingles_from_codes

    df = spark.createDataFrame(
        [(1, [7, 11, 13]), (2, []), (3, [5])], "id long, tc array<long>"
    )
    rows = {r.id: r.sh for r in df.select(
        "id", shingles_from_codes(F.col("tc")).alias("sh")
    ).collect()}
    assert rows[2] == []
    assert rows[3] == []
    assert len(rows[1]) == 2
