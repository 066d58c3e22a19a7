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

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mvrs_dspa_spark.operators.clustering import assign_clusters


def parse_parameter_line(line: str) -> list[tuple[str, object]]:
    """Parse one control-file line into (kind, value) updates.

    Grammar mirrors the reference's dynamic parameter stream
    (`jobs/clustering/ClusteringParameter.scala:40-64`):
      ``k = 4``             -> ("k", 4)
      ``decay = 0.85``      -> ("decay", 0.85)
      ``label:3 = outlier`` -> ("label", (3, "outlier"))
    ``#`` comment lines and blank lines yield nothing; anything else
    raises ValueError (the reference surfaces these as error events).
    """
    if line.strip().startswith("#") or not line.strip():
        return []
    parts = [p.strip() for p in line.split("=", 1)]
    if len(parts) != 2:
        raise ValueError(f"invalid parameter line: {line!r}")
    key, value = parts[0].lower(), parts[1]
    if key == "k":
        return [("k", int(value))]
    if key == "decay":
        return [("decay", float(value))]
    if key.startswith("label"):
        idx = key.split(":", 1)[1].strip() if ":" in key else ""
        if not idx.isdigit():
            raise ValueError(f"invalid parameter line: {line!r}")
        return [("label", (int(idx), value.lower()))]
    raise ValueError(f"invalid parameter line: {line!r}")


# deterministic split offset: ±factor * 1e-14 * max(value, 1) per dim,
# the reference's valueOffset (KMeansClustering.scala:161) — a nudge big
# enough that Lloyd iterations separate the twins, small enough not to
# move the pair's mean
def _split_offset(value: float, factor: int) -> float:
    return factor * 1e-14 * max(value, 1.0)


@dataclass
class StreamingKMeansModel:
    centroids: list[list[float]]
    decay: float = 0.9
    weights: list[float] = field(default_factory=list)
    batches_seen: int = 0
    labels: dict[int, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if not self.weights:
            self.weights = [0.0] * len(self.centroids)

    @property
    def k(self) -> int:
        return len(self.centroids)

    def ensure_k(self, k: int) -> None:
        """Grow/shrink the model to exactly k clusters.

        Reference semantics (`KMeansClustering.scala:96-114` ensureK):
        below k, recursively split the heaviest cluster into two
        centroids offset by ±valueOffset with half the weight each
        (new cluster appended, i.e. index max+1); above k, keep the k
        heaviest clusters (stable order for the survivors).
        """
        if k < 1:
            raise ValueError(f"invalid k: {k}")
        iteration = 1
        while len(self.centroids) < k:
            big = max(range(len(self.centroids)), key=lambda c: self.weights[c])
            base = self.centroids[big]
            # grow the offset factor until both twins are distinct from
            # every existing centroid: splitting a twin of an earlier
            # split can otherwise land exactly on its sibling (the ±3e
            # then ±6e offsets cancel in double precision)
            f = iteration * 3
            while True:
                lo = [v - _split_offset(v, f) for v in base]
                hi = [v + _split_offset(v, f) for v in base]
                taken = {
                    tuple(c) for i, c in enumerate(self.centroids) if i != big
                }
                if tuple(lo) != tuple(hi) and not {tuple(lo), tuple(hi)} & taken:
                    break
                f *= 2
            self.centroids[big] = lo
            self.centroids.append(hi)
            half = self.weights[big] / 2.0
            self.weights[big] = half
            self.weights.append(half)
            iteration += 1
        if len(self.centroids) > k:
            keep = sorted(
                sorted(range(len(self.centroids)), key=lambda c: -self.weights[c])[:k]
            )
            self.centroids = [self.centroids[c] for c in keep]
            self.weights = [self.weights[c] for c in keep]

    def collapse_duplicates(self) -> int:
        """Merge exactly-coincident centroids (weights summed), then
        re-split back to the previous k via ensure_k.

        The reference hits this in `buildClusters` (duplicate initial
        centroids are eliminated by the toMap, then ensureK restores
        k); in the streaming model, collapse happens when drifting
        data pulls two centroids onto the same point.  Returns the
        number of duplicates merged.
        """
        k = len(self.centroids)
        seen: dict[tuple, int] = {}
        centroids, weights = [], []
        for c, w in zip(self.centroids, self.weights):
            key = tuple(c)
            if key in seen:
                weights[seen[key]] += w
            else:
                seen[key] = len(centroids)
                centroids.append(list(c))
                weights.append(w)
        merged = k - len(centroids)
        if merged:
            self.centroids, self.weights = centroids, weights
            self.ensure_k(k)
        return merged

    def apply_parameters(self, updates: list[tuple[str, object]]) -> None:
        """Apply parsed control updates; k changes run ensure_k."""
        for kind, value in updates:
            if kind == "decay":
                decay = float(value)
                if not 0.0 <= decay <= 1.0:
                    raise ValueError(f"invalid decay: {decay}")
                self.decay = decay
            elif kind == "k":
                self.ensure_k(int(value))
            elif kind == "label":
                idx, label = value
                self.labels[int(idx)] = label

    def apply_control_file(self, path: str) -> None:
        """Re-read a control file (latest value per key wins).

        Driver-side analog of the reference's broadcast parameter
        stream (`KMeansClusterFunction.scala:201`): the file is tiny,
        read once per micro-batch, and the resulting model constants
        are baked into the next batch's distributed plan as literals.
        """
        if not os.path.exists(path):
            return
        with open(path) as f:
            updates = [u for line in f for u in parse_parameter_line(line)]
        self.apply_parameters(updates)

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
        # drifting data can pull two centroids onto the same point; merge
        # and re-split so the model always carries k live clusters
        self.collapse_duplicates()

    def assign(self, df: DataFrame, vec_col: str) -> DataFrame:
        out = assign_clusters(df, vec_col, self.centroids)
        if self.labels:
            mapping = F.create_map(
                *[F.lit(x) for i, lb in self.labels.items() for x in (i, lb)]
            )
            out = out.withColumn("cluster_label", mapping[F.col("cluster")])
        return out


def streaming_kmeans(
    stream: DataFrame,
    model: StreamingKMeansModel,
    vec_col: str,
    checkpoint: str,
    control_path: str | None = None,
):
    """Run the model-update loop over a streaming DataFrame.

    Returns the started StreamingQuery; `model` is updated in place
    per micro-batch (driver-side mutable model, broadcast into each
    batch plan as literals — the same topology as the reference's
    broadcast control stream).

    `control_path`, when given, is re-read before every micro-batch so
    k / decay / cluster labels can be changed while the query runs —
    the reference's dynamic parameter file
    (`ClusteringParameter.scala`, `KMeansClusterFunction.scala:163`).
    """

    def _update(batch_df: DataFrame, batch_id: int) -> None:
        if control_path is not None:
            model.apply_control_file(control_path)
        if not batch_df.isEmpty():
            model.update(batch_df, vec_col)

    return (
        stream.writeStream.foreachBatch(_update)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
