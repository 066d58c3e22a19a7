"""Partitioning independence: a distributed query's RESULT must not
depend on how the data happens to be partitioned — shuffle-partition
count is a deployment knob (32 locally, thousands on a cluster), and
any drift under it means nondeterministic tie-breaking or
order-sensitive logic that would surface as flaky results at scale.

Representative set: window/tie-break-heavy (sessions, top-K,
manifests), hash-family (minhash dedup), aggregation-order-sensitive
floats (rollups rounded per the registry's determinism rules).
"""

from __future__ import annotations

import pytest

from mvrs_dspa_spark.plans.registry import all_queries

QUERIES = [
    "user_sessions",
    "dedup_minhash_lsh",
    "similar_users_minhash_lsh",
    "pack_sequences",
    "weighted_sample_topk",
    "shard_manifest",
    "curriculum_manifest",
    "salted_event_rollup",
    "hll_user_counts",
    "top_user_per_type",
    # round-8 second wave: global-grid midranks (summation-order
    # hazards if any accumulator were float), coalition lattice,
    # greedy selection with argmax ties, bootstrap replicate ranks,
    # integer-total retrieval ranking
    "value_mannwhitney_by_type",
    "shapley_channel_attribution",
    "coreset_kcenter_selection",
    "bootstrap_mean_ci",
    "ql_dirichlet_search",
    "graph_kcore_summary",
    # round 9: the two rows->oracle conversions — the Cramer solve's
    # single-row conditional aggregation and the BPE argmax loop must
    # be partition-count-blind (integer/decimal arithmetic only)
    "markov_attribution",
    "bpe_train",
    # round 10: the two rows->oracle conversions — the rank-bucket
    # digest's cumulative grid + straddle split and the pinned-
    # assignment contingency/MI pipeline must be partition-count-
    # blind (integer grids, int-coded transcendental terms)
    "tdigest_value_quantiles",
    "kmeans_label_agreement",
    # round 11: the rows->oracle conversions — the fold-order LSH
    # projections/cosines (Arrow batch composition must not change
    # any double) and the hex-digest fake feature
    "ann_lsh",
    "ann_lsh_banded",
    "media_features",
    "kmeans_embeddings",
    "ann_ivf",
    "ann_index_maintenance",
    "embedding_pq",
    "semantic_dedup",
    "ann_ivf_pq",
]


def _rows(spark, name: str, sf: str, partitions: int):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
        df = all_queries()[name].fn(spark, sf)
        return sorted(tuple(r) for r in df.collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("name", QUERIES)
def test_result_independent_of_shuffle_partitions(spark, sf_small, name):
    a = _rows(spark, name, sf_small, 3)
    b = _rows(spark, name, sf_small, 32)
    assert a == b, f"{name}: result depends on shuffle partition count"
