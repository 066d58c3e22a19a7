"""ANN quality: the approximate paths must actually find most of what
brute force finds (recall gates), and plans must stay equi-join."""

from __future__ import annotations

from mvrs_dspa_spark.operators import ann


def _topk_sets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


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
