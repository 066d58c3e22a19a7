"""Invariants for the distributed model fits (operators/mlmodels.py):
local==distributed path parity, learning actually happening, and
semantic pins on the ALS recommendations."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mvrs_dspa_spark.operators.mlmodels import (
    ALS_K,
    ALS_REC_N,
    ALS_REC_USERS,
    _als_fit_local,
    _lr_fit_local,
    als_implicit_recs,
    doc_features,
    lr_fit,
    quality_classifier_lr,
)
from mvrs_dspa_spark.tables import table


def _labeled_feats(spark, sf_dir):
    feats = doc_features(table(spark, sf_dir, "documents"))
    thr = feats.agg(
        F.expr("percentile(quality_score, 0.5)").alias("t")
    ).collect()[0]["t"]
    return feats.select(
        "doc_id",
        (F.col("quality_score") >= float(thr)).cast("double").alias("y"),
        "feat",
    )


def test_lr_local_matches_distributed(spark, sf_small):
    feats = _labeled_feats(spark, sf_small)
    w_local = _lr_fit_local(feats.collect(), iters=5)
    w_dist = lr_fit(feats, iters=5, local_cap=0)
    assert np.allclose(w_local, w_dist, rtol=1e-6, atol=1e-9)


def test_lr_learns_the_teacher(spark, sf_medium):
    rows = quality_classifier_lr(spark, sf_medium).collect()
    assert len(rows) == 10
    assert [r.decile for r in rows] == list(range(10))
    r0 = rows[0]
    assert r0.test_accuracy > 0.75, "distillation should beat chance"
    assert r0.test_auc > 0.85
    # calibration: the top decile must be mostly positive, bottom mostly not
    lo = next(r for r in rows if r.n_docs and r.decile <= 2)
    hi = next(r for r in reversed(rows) if r.n_docs and r.decile >= 7)
    assert hi.frac_positive > lo.frac_positive


def test_als_local_matches_distributed(spark, sf_small):
    import mvrs_dspa_spark.operators.mlmodels as M

    orders = table(spark, sf_small, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_small, "lineitem").select("l_orderkey", "l_partkey")
    inter = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rows = [(r.custkey, r.partkey, r.cnt) for r in inter.collect()]
    ufac_l, _ = _als_fit_local(rows, iters=2)
    users_d, items_d = M.als_fit_distributed(
        inter, "custkey", "partkey", iters=2
    )
    got = {r.custkey: list(r.fac) for r in users_d.collect()}
    assert set(got) == set(ufac_l)
    for u, fac in ufac_l.items():
        assert np.allclose(fac, got[u], rtol=1e-6, atol=1e-8), u
    users_d.unpersist()
    items_d.unpersist()


def test_als_recs_shape_and_exclusion(spark, sf_medium):
    recs = als_implicit_recs(spark, sf_medium)
    rows = recs.collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.custkey, []).append(r)
    assert len(by_user) == ALS_REC_USERS
    orders = table(spark, sf_medium, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_medium, "lineitem").select("l_orderkey", "l_partkey")
    seen = {
        (r.o_custkey, r.l_partkey)
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
        .collect()
    }
    for u, urows in by_user.items():
        assert [r.rank for r in sorted(urows, key=lambda r: r.rank)] == list(
            range(1, ALS_REC_N + 1)
        )
        scores = [r.score for r in sorted(urows, key=lambda r: r.rank)]
        assert scores == sorted(scores, reverse=True)
        for r in urows:
            assert (r.custkey, r.partkey) not in seen, "recommended a seen part"


def test_als_block_structure_recovered():
    # two disjoint taste blocks; a user must be recommended the unseen
    # items of their OWN block
    rows = []
    for u in range(10):
        block = 0 if u < 5 else 1
        for i in range(6):
            item = block * 6 + i
            if (u + i) % 3 != 0:  # leave holes to recommend into
                rows.append((u, item, 3))
    ufac, ifac = _als_fit_local(rows, iters=8)
    seen = {(u, i) for u, i, _ in rows}
    for u in range(10):
        block_items = set(range(6)) if u < 5 else set(range(6, 12))
        scores = {
            i: float(np.dot(ufac[u], ifac[i]))
            for i in ifac
            if (u, i) not in seen
        }
        best = max(scores, key=lambda i: (scores[i], -i))
        assert best in block_items, (u, best, scores)


def test_als_deterministic(spark, sf_small):
    a = [tuple(r) for r in als_implicit_recs(spark, sf_small).collect()]
    b = [tuple(r) for r in als_implicit_recs(spark, sf_small).collect()]
    assert a == b
