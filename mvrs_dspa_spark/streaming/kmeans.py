"""Streaming K-means with decaying cluster weights (SURVEY §2d #24).

Re-expression of the reference's streaming clustering
(`jobs/clustering/KMeansClusterFunction.scala`: periodic cluster-model
update over windowed points, previous centroids seed the next fit,
with a decay factor down-weighting the old model;
`KMeansClusterFunction.scala` decay semantics).

Spark-first shape: the model (k centroids + weights, a few KB) lives
on the driver; `foreachBatch` runs one distributed assignment +
per-cluster mean pass per micro-batch and folds the batch into the
model with exponential decay:

    w' = decay * w + n_batch
    c' = (decay * w * c + n_batch * mean_batch) / w'

which is exactly the "forgetful" update of published streaming k-means
formulations (Spark's legacy StreamingKMeans on DStreams uses the same
rule). Assignment and aggregation reuse the batch operators in
`operators/clustering` — map-side argmin against literal centroids,
one shuffle per batch — so per-batch cost scales like the batch op.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mvrs_dspa_spark.operators.clustering import assign_clusters


@dataclass
class StreamingKMeansModel:
    centroids: list[list[float]]
    decay: float = 0.9
    weights: list[float] = field(default_factory=list)
    batches_seen: int = 0

    def __post_init__(self) -> None:
        if not self.weights:
            self.weights = [0.0] * len(self.centroids)

    def update(self, batch_df: DataFrame, vec_col: str) -> None:
        """Fold one micro-batch into the model (distributed pass)."""
        assigned = assign_clusters(batch_df, vec_col, self.centroids)
        stats = (
            assigned.select("cluster", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        dim = len(self.centroids[0])
        sums = {c: [0.0] * dim for c in range(len(self.centroids))}
        counts = [0.0] * len(self.centroids)
        for r in stats:
            sums[r.cluster][r.pos] = float(r.s)
            counts[r.cluster] = float(r.n)  # same n for every pos of a cluster

        for c in range(len(self.centroids)):
            w_old = self.decay * self.weights[c]
            n = counts[c]
            w_new = w_old + n
            if n > 0:
                self.centroids[c] = [
                    (w_old * self.centroids[c][d] + sums[c][d]) / w_new
                    for d in range(dim)
                ]
            # empty cluster: centroid unchanged, weight decays toward 0
            self.weights[c] = w_new
        self.batches_seen += 1

    def assign(self, df: DataFrame, vec_col: str) -> DataFrame:
        return assign_clusters(df, vec_col, self.centroids)


def streaming_kmeans(
    stream: DataFrame,
    model: StreamingKMeansModel,
    vec_col: str,
    checkpoint: str,
):
    """Run the model-update loop over a streaming DataFrame.

    Returns the started StreamingQuery; `model` is updated in place
    per micro-batch (driver-side mutable model, broadcast into each
    batch plan as literals — the same topology as the reference's
    broadcast control stream).
    """

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.isEmpty():
            model.update(batch_df, vec_col)

    return (
        stream.writeStream.foreachBatch(_update)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
