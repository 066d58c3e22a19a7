"""ANN quality: the approximate paths must actually find most of what
brute force finds (recall gates), and plans must stay equi-join."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mvrs_dspa_spark.operators import ann


def _topk_sets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


@pytest.mark.slow  # >10 s: slow tier, run with -m slow
def test_ivf_recall_vs_brute_force(spark, sf_small):
    truth = _topk_sets(ann.ann_cosine_topk(spark, sf_small))
    approx = _topk_sets(ann.ann_ivf(spark, sf_small))
    assert set(approx) == set(truth)  # every query answered
    recalls = [
        len(approx[q] & truth[q]) / len(truth[q]) for q in truth if truth[q]
    ]
    mean_recall = sum(recalls) / len(recalls)
    # nprobe/nlist = 4/16 with 64-dim synthetic data: most true
    # neighbors share a probed cell
    assert mean_recall >= 0.5, f"mean recall {mean_recall:.3f} too low"


def test_ivf_returns_at_most_k(spark, sf_small):
    df = ann.ann_ivf(spark, sf_small)
    counts: dict[int, int] = {}
    for r in df.collect():
        counts[r.query_id] = counts.get(r.query_id, 0) + 1
    assert all(c <= ann.TOP_K for c in counts.values())


def test_lsh_candidates_subset_scored_correctly(spark, sf_small):
    # every LSH pair's cosine must equal the brute-force pair cosine
    brute = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in ann.embedding_near_dup(spark, sf_small).collect()
    }
    for r in ann.ann_lsh(spark, sf_small).collect():
        if (r.vec_a, r.vec_b) in brute:
            assert abs(r.cos_sim - brute[(r.vec_a, r.vec_b)]) < 1e-9


@pytest.mark.slow  # >10 s: slow tier, run with -m slow
def test_ann_quality_report_bounds(spark, sf_small):
    """The evaluation harness's own invariants, and floor bounds on
    the measured recalls (theory at cos~0.45: banded 8x4 ~ 0.79,
    full-signature 12-bit ~ 0.005 — the report exists precisely to
    make that gap visible)."""
    from mvrs_dspa_spark.operators.ann import ann_quality_report

    rows = {r["method"]: r for r in ann_quality_report(spark, sf_small).collect()}
    assert set(rows) == {"ivf_top10", "lsh_fullsig", "lsh_banded"}
    # LSH methods verify candidates with exact cosine -> precision 1.0
    for m in ("lsh_fullsig", "lsh_banded"):
        assert rows[m]["n_hits"] == rows[m]["n_retrieved"], m
    assert rows["lsh_banded"]["recall"] >= 0.7
    assert rows["ivf_top10"]["recall"] >= 0.5
    # the banded OR-construction must dominate the single table
    assert rows["lsh_banded"]["recall"] > rows["lsh_fullsig"]["recall"]


def test_banded_lsh_subset_of_exact_pairs(spark, sf_small):
    """Every banded-LSH pair is a true >=threshold pair (exact cosine
    verification): the candidate stage can only lose pairs, never
    invent them."""
    from mvrs_dspa_spark.operators.ann import ann_lsh_banded, embedding_near_dup

    got = {
        (r["vec_a"], r["vec_b"]) for r in ann_lsh_banded(spark, sf_small).collect()
    }
    truth = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_near_dup(spark, sf_small).collect()
    }
    assert got <= truth
    assert got  # and it finds a nonempty subset


# --- IVF-PQ with exact refine ----------------------------------------------


def test_ivf_pq_recall_and_determinism(spark):
    import numpy as np

    from mvrs_dspa_spark.operators.ann import TOP_K, ann_ivf_pq
    from mvrs_dspa_spark.tables import table

    SF = "/root/testdata/sf0.01"
    out = ann_ivf_pq(spark, SF).collect()
    assert len(out) > 0
    by_q: dict[int, list[int]] = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    for qid, ns in by_q.items():
        assert len(ns) <= TOP_K
        assert qid not in ns  # self excluded
        assert len(set(ns)) == len(ns)

    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in table(spark, SF, "embeddings").collect()
    }
    ids = sorted(emb)
    x = np.asarray([emb[i] for i in ids])
    recalls = []
    for qid, got in by_q.items():
        d = ((x - emb[qid]) ** 2).sum(axis=1)
        truth = [
            ids[i]
            for i in np.argsort(d, kind="stable")
            if ids[i] != qid
        ][:TOP_K]
        recalls.append(len(set(got) & set(truth)) / TOP_K)
    # measured 0.60 mean at sf0.01 (vs 0.63 for IVF-flat — the probe
    # ceiling, not the compression, is the limiter); pin a floor with
    # headroom for future testdata regenerations
    assert float(np.mean(recalls)) >= 0.45, recalls

    again = ann_ivf_pq(spark, SF).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]


def test_index_maintenance_partitions_delta_completely(spark, sf_small):
    from mvrs_dspa_spark.operators.ann import (
        ANN_INCR_MOD,
        ann_index_maintenance,
    )
    from mvrs_dspa_spark.tables import table

    rows = ann_index_maintenance(spark, sf_small).collect()
    v = table(spark, sf_small, "embeddings")
    n_delta = v.where(F.col("vec_id") % ANN_INCR_MOD == 0).count()
    n_base = v.where(F.col("vec_id") % ANN_INCR_MOD != 0).count()
    assert sum(r.n_delta for r in rows) == n_delta
    assert sum(r.n_base for r in rows) == n_base
    # deterministic: seeded quantizer + stable assignment
    again = ann_index_maintenance(spark, sf_small).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_index_maintenance_flags_drifted_delta(spark):
    """A delta batch from a DIFFERENT distribution (far from every
    base centroid) must trip the needs_refit flag."""
    import random

    from mvrs_dspa_spark.operators.ann import ann_index_maintenance

    rng = random.Random(7)
    dim = 8
    # base: ids not divisible by 4, clustered near the origin
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)])
        for i in range(1, 400)
        if i % 4 != 0
    ]
    # delta: ids divisible by 4, shifted far away
    rows += [
        (i, [50.0 + rng.uniform(-1, 1) for _ in range(dim)])
        for i in range(4, 400, 4)
    ]
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = tempfile.mkdtemp(prefix="ann_maint_")
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float64())
            ),
        }
    )
    pq.write_table(tbl, os.path.join(tmp, "embeddings.parquet"))
    out = ann_index_maintenance(spark, tmp).collect()
    assert any(r.needs_refit for r in out), (
        "far-shifted delta batch did not trip needs_refit"
    )


def test_ivf_index_save_load_serving_parity(spark, sf_small, tmp_path):
    """Persisted index must answer queries identically to the fresh
    build, and the serving layout must prune cell partitions."""
    from mvrs_dspa_spark.operators.ann import (
        QUERY_MOD,
        build_ivf_index,
        ivf_query,
        load_ivf_index,
        save_ivf_index,
    )
    from mvrs_dspa_spark.tables import table

    v = table(spark, sf_small, "embeddings").select("vec_id", "embedding")
    lists, cents = build_ivf_index(v)
    path = str(tmp_path / "ivf_index")
    save_ivf_index(lists, cents, path)
    loaded_lists, loaded_cents = load_ivf_index(spark, path)
    assert loaded_cents == [list(map(float, c)) for c in cents]

    queries = v.where(F.col("vec_id") % QUERY_MOD == 0)
    fresh = ivf_query(lists, cents, queries).collect()
    served = ivf_query(loaded_lists, loaded_cents, queries).collect()
    assert [tuple(r) for r in fresh] == [tuple(r) for r in served]
    assert len(served) > 0

    # the cluster equi-join must reach the scan as a partition filter
    plan = ivf_query(loaded_lists, loaded_cents, queries)._jdf.queryExecution().toString()
    assert "PartitionFilters" in plan


def test_truncation_eval_monotone_and_prefix_perfect(spark, sf_small, tmp_path):
    """More dims can only help (recall@10 rises 16 -> 32 on the sf
    data), and when ALL information lives in the first 16 dims
    (suffix identically zero) truncation is lossless: recall 1.0."""
    from mvrs_dspa_spark.operators.ann import embedding_truncation_eval

    rows = {r.dims: r for r in embedding_truncation_eval(spark, sf_small).collect()}
    assert set(rows) == {16, 32}
    for r in rows.values():
        assert 0.0 <= r.recall_at_10 <= 1.0
    assert rows[32].recall_at_10 >= rows[16].recall_at_10

    # prefix-only synthetic: 120 vectors, dims 16..63 all zero
    data = [
        (
            i,
            [float((i * 31 + j * 7) % 97) / 97.0 for j in range(16)]
            + [0.0] * 48,
            0,
        )
        for i in range(120)
    ]
    spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    out = {r.dims: r for r in embedding_truncation_eval(spark, str(tmp_path)).collect()}
    assert out[16].recall_at_10 == 1.0
    assert out[32].recall_at_10 == 1.0
