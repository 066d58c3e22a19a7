"""Streaming K-means with decaying weights (reference
KMeansClusteringTestSuite analog: convergence + decay semantics)."""

from __future__ import annotations

from mvrs_dspa_spark.streaming.kmeans import StreamingKMeansModel, streaming_kmeans

SCHEMA = "pid long, vec array<double>"


def _blob(center, n, spread=1.0):
    # deterministic grid around the center (no RNG: reproducible)
    out = []
    for i in range(n):
        dx = ((i * 7) % 11 - 5) / 5.0 * spread
        dy = ((i * 13) % 11 - 5) / 5.0 * spread
        out.append([center[0] + dx, center[1] + dy])
    return out


def test_model_update_moves_centroids(spark):
    model = StreamingKMeansModel(centroids=[[1.0, 1.0], [9.0, 9.0]], decay=0.8)
    pts = _blob((0, 0), 30) + _blob((10, 10), 30)
    df = spark.createDataFrame([(i, v) for i, v in enumerate(pts)], SCHEMA)
    model.update(df, "vec")
    assert abs(model.centroids[0][0]) < 1.0 and abs(model.centroids[0][1]) < 1.0
    assert abs(model.centroids[1][0] - 10) < 1.0 and abs(model.centroids[1][1] - 10) < 1.0
    assert model.weights == [30.0, 30.0]

    # decay: an empty next batch decays weights, keeps centroids
    before = [list(c) for c in model.centroids]
    empty = spark.createDataFrame([], SCHEMA)
    model.update(empty, "vec")
    assert model.centroids == before
    assert model.weights == [24.0, 24.0]


def test_streaming_convergence_and_decay(spark, tmp_path):
    # 3 micro-batches; the second blob drifts from (10,10) to (14,14) —
    # decay lets centroid 1 follow the drift.
    batches = [
        _blob((0, 0), 40) + _blob((10, 10), 40),
        _blob((0, 0), 40) + _blob((12, 12), 40),
        _blob((0, 0), 40) + _blob((14, 14), 40),
    ]
    src = str(tmp_path / "km_in")
    for i, pts in enumerate(batches):
        df = spark.createDataFrame(
            [(i * 1000 + j, v) for j, v in enumerate(pts)], SCHEMA
        )
        df.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    )
    model = StreamingKMeansModel(centroids=[[1.0, 1.0], [9.0, 9.0]], decay=0.5)
    q = streaming_kmeans(stream, model, "vec", str(tmp_path / "km_ckpt"))
    q.awaitTermination(180)

    assert model.batches_seen == 3
    # stable blob: centroid 0 stays at the origin
    assert abs(model.centroids[0][0]) < 1.0
    # drifting blob: centroid 1 tracked past the historical mean (12)
    # toward the latest position (14) because old batches are decayed
    assert model.centroids[1][0] > 12.0
    assert model.weights[0] > 0 and model.weights[1] > 0

    assigned = model.assign(
        spark.createDataFrame([(0, [0.5, 0.5]), (1, [13.5, 13.9])], SCHEMA), "vec"
    ).collect()
    got = {r.pid: r.cluster for r in assigned}
    assert got == {0: 0, 1: 1}
