"""Training-export shapes (SURVEY §2f #52-53): deterministic shard
manifests and SemDeDup-style semantic deduplication.

- `shard_manifest`: the step between a curated corpus and training —
  assign every document to one of N output shards and a position
  inside it, as a pure function of the stable id (portable md5 code,
  `hashing.str_code_col`). Hash-ordering inside the shard doubles as
  a deterministic global shuffle of the training order: no RNG state,
  reproducible across runs, engines, and cluster sizes.
- `semantic_dedup`: embedding-space near-duplicate pruning following
  the SemDeDup recipe (Abbas et al., 2023, arXiv:2303.09540): K-means
  partitions the space, then candidate pairs are compared ONLY within
  a cluster, so the quadratic term is bounded per cluster instead of
  global. Reuses the engine's deterministic `kmeans_fit` and the
  oracle-verified cosine fold from `operators/ann.py`.

Scale shape:
- shard_manifest is one shuffle on shard_id (the window); position
  assignment is per-partition. At 100 TB the write side would follow
  with `partitionBy(shard_id)` — `streaming/sources.partitioned_write`
  already demonstrates that surface.
- semantic_dedup's pair join is an equi-join on cluster id; per-
  cluster volume is n_c^2, so k must grow with the corpus (SemDeDup
  uses k in the tens of thousands at web scale) — k here is small only
  so the tiny test fixture keeps multi-member clusters. The kept set
  is within-cluster tau-independent, matching the paper's policy of
  keeping one point per epsilon-ball.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mvrs_dspa_spark.functions import hashing as H
from mvrs_dspa_spark.operators.ann import _cos_udf
from mvrs_dspa_spark.operators.clustering import assign_clusters, kmeans_fit
from mvrs_dspa_spark.plans.registry import register
from mvrs_dspa_spark.tables import table

N_SHARDS = 8
SHARD_SALT = "shard-v1"

SEM_K = 8  # clusters; scale with corpus size (see module docstring)
SEM_ITERS = 8
SEM_TAU = 0.4  # same threshold as embedding_near_dup's oracle baseline


@register(
    "shard_manifest",
    oracle=f"""
        SELECT doc_id, shard_id, pos
        FROM (
            SELECT doc_id,
                   code % {N_SHARDS} AS shard_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY code % {N_SHARDS}
                       ORDER BY code, doc_id
                   ) - 1 AS pos
            FROM (
                SELECT doc_id,
                       {H.str_code_sql(f"'{SHARD_SALT}:' || doc_id::VARCHAR")}
                           AS code
                FROM documents
            )
        )
        ORDER BY shard_id, pos
    """,
    doc="Deterministic shard manifest: salted-hash shard assignment + "
    "hash-ordered position within the shard (a reproducible global "
    "shuffle of the training order, no RNG state).",
    tags=("sampling", "export"),
)
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    code = H.str_code_col(
        F.concat(F.lit(SHARD_SALT + ":"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("shard_id").orderBy("code", "doc_id")
    return (
        docs.select("doc_id", code.alias("code"), (code % N_SHARDS).alias("shard_id"))
        .select(
            "doc_id",
            "shard_id",
            (F.row_number().over(w) - 1).cast("long").alias("pos"),
        )
        .orderBy("shard_id", "pos")
    )


@register(
    "semantic_dedup",
    oracle=None,  # depends on iterative kmeans; rows-only + pytest invariants
    doc="SemDeDup-style semantic dedup (arXiv:2303.09540): K-means "
    "partitions the embedding space; within each cluster a vector is "
    "dropped when a lower-id vector with cosine >= tau exists. Kept "
    "set is within-cluster tau-independent; pair comparisons bounded "
    "per cluster, never global.",
    tags=("ann", "dedup", "llm"),
)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = kmeans_fit(emb, "embedding", k=SEM_K, iters=SEM_ITERS, id_col="vec_id")
    assigned = assign_clusters(emb, "embedding", centroids).select(
        "vec_id", "embedding", "cluster"
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    # pair cosine via Arrow-batched numpy (rows-gated query, so the
    # oracle-fold FP order is not required; the pair volume is the hot
    # loop and the batched matmul is ~100x the interpreted fold)
    cos = _cos_udf()(F.col("a.embedding"), F.col("b.embedding"))
    # v is dropped when ANY lower-id same-cluster vector is >= tau close
    # (the earlier vector itself may also be dropped — chains collapse
    # toward their lowest id, exactly the paper's keep-one-per-ball).
    dropped = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") > F.col("b.vec_id")),
            "inner",
        )
        .where(cos >= SEM_TAU)
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("keep", F.lit(False))
    )
    return (
        assigned.select("vec_id", "cluster")
        .join(dropped, "vec_id", "left")
        .select("vec_id", "cluster", F.coalesce("keep", F.lit(True)).alias("keep"))
        .orderBy("vec_id")
    )
