"""Label-propagation communities: disjoint-clique recovery,
determinism, and modularity bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from mvrs_dspa_spark.operators.similarity import (
    item_communities_lpa,
    lpa_communities,
    modularity,
)


def _clique_edges(spark, cliques):
    rows = []
    for members in cliques:
        for i in members:
            for j in members:
                if i != j:
                    rows.append((i, j, 10))
    return spark.createDataFrame(rows, "src long, dst long, support long")


def test_lpa_recovers_disjoint_cliques(spark):
    edges = _clique_edges(
        spark, [(1, 2, 3, 4), (10, 11, 12), (20, 21, 22, 23, 24)]
    )
    labels = {r.node: r.community for r in lpa_communities(edges).collect()}
    # every clique collapses to one community (the smallest member id)
    assert {labels[n] for n in (1, 2, 3, 4)} == {1}
    assert {labels[n] for n in (10, 11, 12)} == {10}
    assert {labels[n] for n in (20, 21, 22, 23, 24)} == {20}
    # three well-separated communities -> strongly positive modularity
    q = modularity(edges, lpa_communities(edges))
    assert q > 0.5


def test_lpa_single_clique_modularity_zero(spark):
    edges = _clique_edges(spark, [(1, 2, 3, 4, 5)])
    labels = lpa_communities(edges)
    assert {r.community for r in labels.collect()} == {1}
    # one community holding every edge: Q = 1 - 1 = 0
    assert abs(modularity(edges, labels)) < 1e-9


def test_item_communities_deterministic_and_bounded(spark, sf_small):
    a = item_communities_lpa(spark, sf_small).collect()
    b = item_communities_lpa(spark, sf_small).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) > 0
    items = {r.item for r in a}
    for r in a:
        assert r.community in items  # labels are node ids
        assert -0.5 - 1e-9 <= r.modularity <= 1.0 + 1e-9
    # community sizes are consistent
    from collections import Counter

    sizes = Counter(r.community for r in a)
    assert all(r.community_size == sizes[r.community] for r in a)
