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

def test_ensure_k_splits_empty_clusters(spark):
    """Adversarial init: the 8 lowest-id rows are IDENTICAL points, so
    every point ties to cluster 0 on the first pass and clusters 1-7
    empty. ensureK (ref KMeansClustering.scala:96-114) must refill
    them by splitting the heaviest cluster; the fit returns 8
    pairwise-distinct centroids on BOTH fit paths."""
    blob_a = [(i, [5.0, 5.0]) for i in range(8)]  # identical inits
    rest = [(i, [5.0 + (i % 3) * 1e-3, 5.0]) for i in range(8, 30)]
    blob_b = [(i, [50.0, -20.0]) for i in range(30, 60)]
    df = spark.createDataFrame(
        blob_a + rest + blob_b, "vec_id long, embedding array<double>"
    )
    for cap in (0, 100_000):  # distributed and local paths
        cents = C.kmeans_fit(
            df, "embedding", k=8, iters=4, id_col="vec_id", local_cap=cap
        )
        assert len(cents) == 8
        assert len({tuple(c) for c in cents}) == 8, cents


def test_ensure_k_no_op_when_all_clusters_populated():
    cents = [[0.0, 0.0], [10.0, 10.0]]
    counts = [5, 5]
    before = [list(c) for c in cents]
    C._split_empty_clusters(cents, counts)
    assert cents == before and counts == [5, 5]


def test_label_agreement_perfect_on_separable_data(spark):
    """Four well-separated label-aligned blobs: k=4 k-means must
    recover them exactly -> purity == nmi == 1."""
    import random

    from mvrs_dspa_spark.operators.clustering import label_agreement_report

    rng = random.Random(11)
    rows = []
    for lbl in range(4):
        center = [50.0 * lbl] * 4
        for i in range(60):
            # interleaved ids: the deterministic lowest-id init then
            # seeds one centroid inside each blob
            rows.append(
                (
                    i * 4 + lbl,
                    lbl,
                    [c + rng.uniform(-1, 1) for c in center],
                )
            )
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    r = label_agreement_report(df, "embedding", "label", k=4).collect()[0]
    assert r.n == 240 and r.n_labels == 4
    assert r.purity == 1.0
    assert r.nmi == 1.0


def test_label_agreement_bounded_and_deterministic(spark, sf_small):
    from mvrs_dspa_spark.operators.clustering import kmeans_label_agreement

    a = kmeans_label_agreement(spark, sf_small).collect()
    b = kmeans_label_agreement(spark, sf_small).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    r = a[0]
    assert 0.0 <= r.purity <= 1.0
    assert -1e-9 <= r.nmi <= 1.0 + 1e-9


def test_kmeans_exact_local_matches_distributed_exactly(spark, sf_small):
    """The integer-grid fit (r11 kmeans_embeddings conversion) must be
    BIT-identical between the driver-side and distributed paths — no
    fp tolerance: quantization, int64 sums, and truncating division
    are order-independent by construction."""
    from mvrs_dspa_spark.tables import table

    emb = table(spark, sf_small, "embeddings").select("vec_id", "embedding")
    local = C.kmeans_fit_exact(emb, "embedding", k=4, iters=3, id_col="vec_id")
    dist = C.kmeans_fit_exact(
        emb, "embedding", k=4, iters=3, id_col="vec_id", local_cap=0
    )
    assert local == dist
    assert all(isinstance(v, int) for c in local for v in c)


def test_kmeans_exact_empty_cluster_keeps_previous_centroid(spark):
    """Adversarial init: duplicate lowest-id points collapse a cluster
    to empty; the exact fit keeps the previous centroid (declarative
    convention, unlike the float fit's ensureK split) — and the fit
    still terminates with the duplicate centroid intact."""
    import pandas as pd

    pts = [(i, [0.0, 0.0]) for i in range(2)] + [
        (i, [float(i), 1.0]) for i in range(2, 8)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(pts, columns=["vec_id", "embedding"]),
        "vec_id long, embedding array<float>",
    )
    cents = C.kmeans_fit_exact(df, "embedding", k=2, iters=1, id_col="vec_id")
    assert len(cents) == 2
    # init was two identical points; every row assigned to cluster 0
    # (ties -> lowest), so cluster 1 was empty and kept [0, 0]
    assert cents[1] == [0, 0]
    assert cents[0] != [0, 0]  # cluster 0 recentred to the global mean
    # ...and with more iterations the kept centroid recaptures points
    # (it is nearer the origin cluster than the moved centroid), so
    # the fit self-heals instead of carrying a dead cluster forever
    cents3 = C.kmeans_fit_exact(df, "embedding", k=2, iters=3, id_col="vec_id")
    assert cents3[1] != [0, 0]
