"""Invariants for the training-export operators (`operators/export.py`).

shard_manifest is fully oracle-gated (test_oracle_parity); here we
check the structural properties the oracle can't express directly.
semantic_dedup has no SQL oracle (iterative k-means), so its contract
is pinned entirely by these invariants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mvrs_dspa_spark.operators.ann import dot_col, _with_norm_df
from mvrs_dspa_spark.operators.export import (
    N_SHARDS,
    SEM_TAU,
    semantic_dedup,
    shard_manifest,
)
from mvrs_dspa_spark.tables import table


def test_shard_manifest_covers_all_docs_with_dense_positions(spark, sf_medium):
    m = shard_manifest(spark, sf_medium).collect()
    n_docs = table(spark, sf_medium, "documents").count()
    assert len(m) == n_docs
    assert len({r.doc_id for r in m}) == n_docs
    by_shard: dict[int, list[int]] = {}
    for r in m:
        assert 0 <= r.shard_id < N_SHARDS
        by_shard.setdefault(r.shard_id, []).append(r.pos)
    # positions are dense 0..n-1 within every shard
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))
    # hash sharding is roughly balanced (no shard over 2x the mean)
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) <= 2 * n_docs / N_SHARDS


def test_shard_manifest_stable_under_repartitioning(spark, sf_medium):
    a = {(r.doc_id, r.shard_id, r.pos) for r in shard_manifest(spark, sf_medium).collect()}
    b = {
        (r.doc_id, r.shard_id, r.pos)
        for r in shard_manifest(spark, sf_medium).repartition(7).collect()
    }
    assert a == b


def _cosine_pairs(spark, sf_dir, ids_by_cluster):
    """All within-cluster (lo, hi) pairs with cosine >= SEM_TAU."""
    emb = _with_norm_df(table(spark, sf_dir, "embeddings"))
    a, b = emb.alias("a"), emb.alias("b")
    cos = dot_col(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    pairs = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("lo"),
            F.col("b.vec_id").alias("hi"),
            cos.alias("cos"),
        )
        .where(F.col("cos") >= SEM_TAU)
        .collect()
    )
    cluster_of = {v: c for c, ids in ids_by_cluster.items() for v in ids}
    return [(r.lo, r.hi) for r in pairs if cluster_of[r.lo] == cluster_of[r.hi]]


def test_semantic_dedup_invariants(spark, sf_small):
    rows = semantic_dedup(spark, sf_small).collect()
    n_vecs = table(spark, sf_small, "embeddings").count()
    assert len(rows) == n_vecs

    ids_by_cluster: dict[int, set[int]] = {}
    keep = {}
    for r in rows:
        ids_by_cluster.setdefault(r.cluster, set()).add(r.vec_id)
        keep[r.vec_id] = r.keep

    edges = _cosine_pairs(spark, sf_small, ids_by_cluster)
    has_earlier_neighbor = {hi for lo, hi in edges}

    # exactly the vectors with an earlier tau-close same-cluster
    # neighbor are dropped; everything else is kept
    for vec_id, kept in keep.items():
        assert kept == (vec_id not in has_earlier_neighbor), vec_id

    # the kept set is tau-independent within every cluster
    for lo, hi in edges:
        assert not (keep[lo] and keep[hi]), (lo, hi)
