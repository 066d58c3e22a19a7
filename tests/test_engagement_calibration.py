"""Pins for DAU/WAU stickiness (#128) and kNN confidence calibration
(#129)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mvrs_dspa_spark.operators.ann import (
    KNN_K,
    knn_confidence_calibration,
    knn_label_eval,
)
from mvrs_dspa_spark.plans.analytics2 import dau_wau_stickiness
from mvrs_dspa_spark.tables import table


def test_dau_wau_bounds(spark, sf_small):
    out = dau_wau_stickiness(spark, sf_small).collect()
    assert len(out) > 0
    for r in out:
        assert r.wau >= r.dau > 0, "weekly actives contain daily actives"
        assert 0.0 < r.stickiness <= 1.0
    days = [r.day for r in out]
    assert days == sorted(days)
    # every active day appears exactly once
    ev = table(spark, sf_small, "events")
    n_days = (
        ev.select(
            F.expr("unix_micros(ts) div 86400000000").alias("d")
        )
        .distinct()
        .count()
    )
    assert len(out) == n_days


def test_knn_calibration_conserves_probes(spark, sf_small):
    calib = knn_confidence_calibration(spark, sf_small).collect()
    assert len(calib) > 0
    for r in calib:
        # majority vote count ranges from ceil(K/majority splits) to K
        assert 1 <= r.vote_count <= KNN_K
        assert 0 <= r.n_correct <= r.n_probes
        assert 0.0 <= r.accuracy <= 1.0
    # bucket counts partition the probe set of the per-class eval (#99)
    per_class = knn_label_eval(spark, sf_small).collect()
    assert sum(r.n_probes for r in calib) == sum(
        r.n_queries for r in per_class
    )
    # correctness totals agree between the two views of the same preds
    assert sum(r.n_correct for r in calib) == sum(
        r.n_correct for r in per_class
    )


def test_markov_attribution_closed_form(spark, tmp_path):
    """Hand-checkable chain: two users convert via signup->click->
    purchase, one user views and leaves. Removing signup OR click
    kills every converting path (removal effect 1, equal shares);
    view is on no converting path (effect 0), and the pinned-domain
    channel 'error' never occurs (tot 0 -> absorbing identity row,
    effect 0). Base conversion 2/3, which the half-up G-grid
    quantization must land on 0.666667 exactly."""
    import datetime as dt

    from mvrs_dspa_spark.plans.analytics2 import markov_attribution

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, "signup"), (1, "click"), (1, "purchase"),
        (2, "signup"), (2, "click"), (2, "purchase"),
        (3, "view"),
    ]
    spark.createDataFrame(
        [
            (i, base + dt.timedelta(minutes=i), uid, t, 1.0, "{}")
            for i, (uid, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    out = {r.channel: r for r in markov_attribution(spark, str(tmp_path)).collect()}
    assert set(out) == {"click", "error", "signup", "view"}
    assert out["signup"].base_conversion == round(2 / 3, 6)
    assert out["signup"].removal_effect == 1.0
    assert out["click"].removal_effect == 1.0
    assert out["view"].removal_effect == 0.0
    assert out["error"].removal_effect == 0.0
    assert out["signup"].attribution_share == 0.5
    assert out["click"].attribution_share == 0.5
    assert out["view"].attribution_share == 0.0
    assert out["error"].attribution_share == 0.0


def test_markov_attribution_shares_normalize(spark, sf_small):
    from mvrs_dspa_spark.plans.analytics2 import markov_attribution

    out = markov_attribution(spark, sf_small).collect()
    assert len(out) > 0
    for r in out:
        assert 0.0 <= r.removal_effect <= 1.0
        assert 0.0 < r.base_conversion <= 1.0
    assert abs(sum(r.attribution_share for r in out) - 1.0) < 1e-4


def test_quantile_transform_uniformity(spark, sf_small):
    """Midrank-ECDF properties: q in (0,1), monotone in value within
    a type, mean(q) == 1/2 exactly per type (midranks sum to
    n(n+1)/2), and the min/max values land symmetrically."""
    from collections import defaultdict

    from mvrs_dspa_spark.plans.analytics2 import quantile_transform_values

    out = quantile_transform_values(spark, sf_small).collect()
    assert len(out) > 0
    by_type = defaultdict(list)
    for r in out:
        assert 0.0 < r.q_uniform <= 1.0  # unique max midranks to n/n
        by_type[r.event_type].append((r.value, r.q_uniform))
    for t, pairs in by_type.items():
        pairs.sort()
        qs = [q for _, q in pairs]
        n = len(qs)
        assert qs == sorted(qs), t
        # midranks sum to n(n+1)/2 exactly -> mean q = (n+1)/(2n)
        assert abs(sum(qs) / n - (n + 1) / (2 * n)) < 1e-4, t
        # ties share one midrank
        seen = {}
        for v, q in pairs:
            assert seen.setdefault(v, q) == q, (t, v)
