"""K-means invariants (mirrors reference KMeansClusteringTestSuite):
determinism, assignment validity, and that iterating reduces inertia."""

from __future__ import annotations

from pyspark.sql import functions as F

from mvrs_dspa_spark.operators import clustering as C


def test_kmeans_deterministic(spark, sf_small):
    from mvrs_dspa_spark.tables import table

    emb = table(spark, sf_small, "embeddings").select("vec_id", "embedding")
    c1 = C.kmeans_fit(emb, "embedding", k=4, iters=3, id_col="vec_id")
    c2 = C.kmeans_fit(emb, "embedding", k=4, iters=3, id_col="vec_id")
    assert c1 == c2
    assert len(c1) == 4 and len(c1[0]) == 64


def test_kmeans_inertia_decreases(spark, sf_small):
    from mvrs_dspa_spark.tables import table

    emb = table(spark, sf_small, "embeddings").select("vec_id", "embedding")

    def inertia(iters: int) -> float:
        cents = C.kmeans_fit(emb, "embedding", k=4, iters=iters, id_col="vec_id")
        return (
            C.assign_clusters(emb, "embedding", cents)
            .agg(F.sum("sq_dist"))
            .collect()[0][0]
        )

    assert inertia(6) <= inertia(1) + 1e-9


def test_kmeans_local_matches_distributed(spark, sf_small):
    """The size-adaptive local fit must agree with the distributed
    loop (same init, tie-break, and empty-cluster policy; fp-order
    differences only)."""
    import numpy as np

    from mvrs_dspa_spark.tables import table

    emb = table(spark, sf_small, "embeddings").select("vec_id", "embedding")
    local = C.kmeans_fit(emb, "embedding", k=4, iters=3, id_col="vec_id")
    dist = C.kmeans_fit(emb, "embedding", k=4, iters=3, id_col="vec_id", local_cap=0)
    assert np.allclose(np.array(local), np.array(dist), rtol=1e-9, atol=1e-9)


def test_unusual_activity_shape(spark, sf_small):
    df = C.unusual_activity(spark, sf_small)
    rows = df.collect()
    assert len(rows) > 0
    assert {r.cluster for r in rows} <= set(range(C.UA_K))
    n_unusual = sum(r.is_unusual for r in rows)
    assert 0 <= n_unusual < len(rows) / 2  # outliers are a minority
