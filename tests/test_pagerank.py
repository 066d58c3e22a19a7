"""PageRank properties (operators/similarity.py item_pagerank).

The unrolled-CTE oracle pins cross-engine equality; these tests pin
the algorithm itself against an independent numpy power iteration on
the collected (vocabulary-sized) graph, plus the invariants a correct
PageRank must satisfy.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mvrs_dspa_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def pr_rows(spark):
    return sim.item_pagerank(spark, "/root/testdata/sf0.01").collect()


def test_pagerank_mass_conserved(pr_rows):
    assert len(pr_rows) > 0
    total = sum(r.pagerank for r in pr_rows)
    # undirected graph -> no dangling mass; sum of ranks == 1
    assert abs(total - 1.0) < 1e-3, total


def test_pagerank_matches_numpy(spark, pr_rows):
    items = sim._items_df(spark, "/root/testdata/sf0.01")
    n_users = items.select("user_id").distinct().count()
    a, b = items.alias("a"), items.alias("b")
    e0 = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("i"), F.col("b.item").alias("j"))
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= sim.TRI_SUPPORT_FRAC * n_users)
        .collect()
    )
    nodes = sorted({r.i for r in e0} | {r.j for r in e0})
    idx = {v: k for k, v in enumerate(nodes)}
    n = len(nodes)
    w = np.zeros((n, n))
    for r in e0:
        w[idx[r.i], idx[r.j]] = r.support
        w[idx[r.j], idx[r.i]] = r.support
    w = w / w.sum(axis=1, keepdims=True)
    r_vec = np.full(n, 1.0 / n)
    for _ in range(sim.PR_ITERS):
        r_vec = (1 - sim.PR_DAMPING) / n + sim.PR_DAMPING * (w.T @ r_vec)
    got = {row.item: row.pagerank for row in pr_rows}
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - r_vec[idx[v]]) < 1e-5, (v, got[v], r_vec[idx[v]])


def test_pagerank_degree_monotone_on_path_graph(pr_rows):
    """Highest-degree nodes should outrank leaf nodes on average —
    a weak sanity check that ranking direction is right."""
    ranks = sorted(r.pagerank for r in pr_rows)
    assert ranks[-1] > ranks[0] or len(ranks) == 1
