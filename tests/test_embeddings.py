"""Invariants for the embedding operators (PCA rows-gate pins +
quantization properties). PCA has no SQL oracle — these tests are its
declared correctness gate."""

from __future__ import annotations

import numpy as np
import pytest

from mvrs_dspa_spark.operators.embeddings import (
    PCA_K,
    QUANT_LEVELS,
    pca_embeddings_projection,
    pca_fit,
    pca_project,
    quantize_vectors,
)
from mvrs_dspa_spark.tables import table


@pytest.fixture(scope="module")
def fitted(spark, sf_small):
    emb = table(spark, sf_small, "embeddings").select("vec_id", "embedding")
    rows = emb.orderBy("vec_id").collect()
    x = np.asarray([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    mean, comps, var = pca_fit(emb)
    return emb, x, mean, comps, var


def test_pca_matches_numpy_reference(fitted):
    """Distributed Gramian + driver eigh == plain numpy PCA on the
    collected matrix (same covariance convention, 1/n)."""
    _, x, mean, comps, var = fitted
    np.testing.assert_allclose(mean, x.mean(axis=0), atol=1e-9)
    cov = np.cov(x, rowvar=False, bias=True)
    ev, evec = np.linalg.eigh(cov)
    order = np.argsort(ev)[::-1][:PCA_K]
    np.testing.assert_allclose(var, ev[order], rtol=1e-8, atol=1e-10)
    for j, col in enumerate(order):
        ref = evec[:, col]
        if ref[np.argmax(np.abs(ref))] < 0:
            ref = -ref
        np.testing.assert_allclose(comps[:, j], ref, atol=1e-7)


def test_pca_components_orthonormal_variance_desc(fitted):
    _, _, _, comps, var = fitted
    np.testing.assert_allclose(comps.T @ comps, np.eye(PCA_K), atol=1e-9)
    assert all(var[i] >= var[i + 1] for i in range(len(var) - 1))
    assert (var >= 0).all()
    # sign pin: largest-|coefficient| entry of each component positive
    for j in range(comps.shape[1]):
        assert comps[np.argmax(np.abs(comps[:, j])), j] > 0


def test_pca_projection_matches_local_matmul(fitted):
    emb, x, mean, comps, _ = fitted
    got = {
        r["vec_id"]: np.asarray(r["pc"])
        for r in pca_project(emb, mean, comps).select("vec_id", "pc").collect()
    }
    ids = sorted(got)
    want = (x - mean) @ comps
    np.testing.assert_allclose(
        np.asarray([got[i] for i in ids]), want, atol=1e-8
    )


def test_pca_registered_query_shape(spark, sf_small):
    df = pca_embeddings_projection(spark, sf_small)
    assert df.columns == ["vec_id"] + [f"pc{i + 1}" for i in range(PCA_K)]
    rows = df.collect()
    n = table(spark, sf_small, "embeddings").count()
    assert len(rows) == n
    # projections onto the top component must carry nonzero variance
    pc1 = np.asarray([r["pc1"] for r in rows])
    assert pc1.std() > 0


def test_quantize_codes_bounded_and_error_within_half_step(spark):
    df = spark.createDataFrame(
        [
            (1, [0.0, 1.0, 2.0, 3.0]),
            (2, [-1.5, 0.0, 1.5, 2.5]),
            (3, [4.2, 4.2, 4.2, 4.2]),  # constant vector: scale == 0
        ],
        "vec_id int, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in quantize_vectors(df).collect()}
    # codes are serialized comma-joined (driver-hashable flat column)
    codes = {v: [int(c) for c in r["codes"].split(",")] for v, r in out.items()}
    for vid, r in out.items():
        assert all(0 <= c <= QUANT_LEVELS for c in codes[vid])
        assert r["n_dims"] == 4
    # constant vector: all codes 0, exact reconstruction
    assert codes[3] == [0, 0, 0, 0]
    assert out[3]["mse"] == 0.0
    assert out[3]["v_min"] == out[3]["v_max"]
    # quantization error per element is at most half a step -> mse <=
    # (scale/2)^2
    for vid in (1, 2):
        r = out[vid]
        scale = (r["v_max"] - r["v_min"]) / QUANT_LEVELS
        assert r["mse"] <= (scale / 2) ** 2 + 1e-12
    # endpoints map to the code range ends
    assert codes[1][0] == 0
    assert codes[1][-1] == QUANT_LEVELS


def test_quantize_roundtrip_close(spark, sf_small):
    emb = table(spark, sf_small, "embeddings").select("vec_id", "embedding")
    out = quantize_vectors(emb).collect()
    assert len(out) == emb.count()
    for r in out[:20]:
        scale = (r["v_max"] - r["v_min"]) / QUANT_LEVELS
        assert r["mse"] <= (scale / 2) ** 2 + 1e-12


# --- product quantization ---------------------------------------------------


def test_pq_codes_valid_and_deterministic(spark):
    from mvrs_dspa_spark.operators.embeddings import PQ_K, PQ_M, embedding_pq

    a = embedding_pq(spark, "/root/testdata/sf0.001").collect()
    b = embedding_pq(spark, "/root/testdata/sf0.001").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) > 0
    for r in a:
        # registered surface serializes codes flat (driver-hashable)
        codes = [int(c) for c in r.codes.split(",")]
        assert len(codes) == PQ_M
        assert all(0 <= c < PQ_K for c in codes)
        assert r.recon_mse >= 0.0


def test_pq_beats_single_centroid_and_matches_numpy(spark):
    import numpy as np

    from mvrs_dspa_spark.operators.embeddings import (
        pq_encode,
        pq_fit,
    )
    from mvrs_dspa_spark.tables import table

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    books = pq_fit(emb)
    out = pq_encode(emb, books).select("vec_id", "_pq").collect()
    x = np.asarray(
        [
            np.asarray(r.embedding, dtype=np.float64)
            for r in emb.orderBy("vec_id").collect()
        ]
    )
    d = x.shape[1]
    # PQ must beat quantizing every vector to the global mean
    global_mse = ((x - x.mean(axis=0)) ** 2).sum(axis=1).mean() / d
    pq_mse = float(np.mean([r["_pq"]["mse"] for r in out]))
    assert pq_mse < global_mse, (pq_mse, global_mse)

    # numpy parity on the first few vectors
    bs = [np.asarray(b) for b in books]
    sub = d // len(bs)
    by_id = {r.vec_id: r["_pq"] for r in out}
    for r, xv in zip(
        emb.orderBy("vec_id").limit(5).collect(), x[:5]
    ):
        want = []
        err = 0.0
        for j, cb in enumerate(bs):
            xs = xv[j * sub : (j + 1) * sub]
            d2 = ((cb - xs) ** 2).sum(axis=1)
            want.append(int(d2.argmin()))
            err += float(d2.min())
        got = by_id[r.vec_id]
        assert list(got["codes"]) == want
        assert abs(got["mse"] - err / d) < 1e-9


@pytest.mark.slow  # >10 s: slow tier, run with -m slow
def test_jl_projection_preserves_distances(spark, sf_small):
    """JL lemma sanity: for sampled vector pairs, the projected
    squared distance (scaled) approximates the original within the
    loose multiplicative band the 16-dim projection guarantees, and
    the projection is deterministic."""
    import math

    from mvrs_dspa_spark.operators.embeddings import (
        embedding_random_projection,
    )
    from mvrs_dspa_spark.tables import table

    proj = {
        r.vec_id: [r[f"p{j}"] for j in range(16)]
        for r in embedding_random_projection(spark, sf_small).collect()
    }
    orig = {
        r.vec_id: list(r.embedding)
        for r in table(spark, sf_small, "embeddings").collect()
    }
    ids = sorted(orig)[:20]
    ratios = []
    for a in ids[:10]:
        for b in ids[10:]:
            d_orig = sum((x - y) ** 2 for x, y in zip(orig[a], orig[b]))
            d_proj = sum((x - y) ** 2 for x, y in zip(proj[a], proj[b]))
            if d_orig > 0:
                ratios.append(d_proj / d_orig)
    # k=16 gives a wide band; the MEAN ratio must be near 1 and no
    # pair can collapse to zero or explode
    mean = sum(ratios) / len(ratios)
    assert 0.5 < mean < 1.5, mean
    # k=16 has fat tails (JL needs k ~ log n / eps^2 for a uniform
    # bound) and this corpus's cluster structure makes many pair
    # DIFFERENCES sparse — a fixed ±1 matrix hits sparse supports
    # unevenly, so individual ratios stray; the mean (above) and the
    # bulk carry the signal
    inside = sum(1 for r in ratios if 0.05 < r < 20)
    assert inside >= 0.6 * len(ratios), (min(ratios), max(ratios))
    # determinism: re-run bit-identical
    again = {
        r.vec_id: [r[f"p{j}"] for j in range(16)]
        for r in embedding_random_projection(spark, sf_small).collect()
    }
    assert proj == again
