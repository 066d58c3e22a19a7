"""Invariants for the round-6 seventh wave (#143-146): activity
streaks, STL decomposition, the NB language classifier, and the NDCG
ranking eval. Cross-engine value parity is covered by
test_oracle_parity; these pin the semantic properties parity alone
can't see."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from mvrs_dspa_spark.plans.registry import all_queries


def _q(name):
    return all_queries()[name].fn


def test_streaks_known_islands(spark, tmp_path):
    """Days {1,2,3, 7,8, 12} -> streaks (3,2,1): longest 3 starting
    day 1; plus a second user with one long run."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in [1, 2, 3, 7, 8, 12]:
        for _ in range(2):  # duplicates within a day must not count twice
            rows.append(
                (eid, base + datetime.timedelta(days=day, hours=eid % 3),
                 1, "click", 1.0, "{}")
            )
            eid += 1
    for day in [5, 6, 7, 8]:
        rows.append(
            (eid, base + datetime.timedelta(days=day), 2, "view", 1.0, "{}")
        )
        eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    sf = str(tmp_path / "streaks_sf")
    df.write.parquet(f"{sf}/events.parquet")
    out = {
        r["user_id"]: r
        for r in _q("user_activity_streaks")(spark, sf).collect()
    }
    assert out[1]["n_active_days"] == 6
    assert out[1]["n_streaks"] == 3
    assert out[1]["longest_streak"] == 3
    # earliest start of a maximal streak; base is 2024-01-01 + 1 day
    day0 = (base + datetime.timedelta(days=1)).date()
    epoch_day = (day0 - datetime.date(1970, 1, 1)).days
    assert out[1]["longest_streak_start"] == epoch_day
    assert out[2]["n_streaks"] == 1
    assert out[2]["longest_streak"] == 4


def test_streaks_totals_consistent(spark, sf_medium):
    rows = _q("user_activity_streaks")(spark, sf_medium).collect()
    assert rows
    for r in rows:
        assert 1 <= r["longest_streak"] <= r["n_active_days"]
        assert r["n_streaks"] <= r["n_active_days"]


def test_stl_reconstruction_is_additive(spark, sf_medium):
    """trend + seasonal + remainder must reconstruct the observed
    count exactly (up to the two 1e-6 roundings)."""
    rows = _q("hourly_stl_decomposition")(spark, sf_medium).collect()
    assert len(rows) > 500  # 30 days of hours minus the window edges
    for r in rows:
        recon = r["trend"] + r["seasonal"] + r["remainder"]
        assert abs(recon - r["n_events"]) < 5e-6, r
    # the seasonal component is a function of hour-of-day only
    by_hod = {}
    for r in rows:
        by_hod.setdefault(r["hour"] % 24, set()).add(r["seasonal"])
    assert all(len(v) == 1 for v in by_hod.values())


def test_nb_confusion_is_a_partition_of_test_docs(spark, sf_medium):
    rows = _q("nb_lang_classifier")(spark, sf_medium).collect()
    from mvrs_dspa_spark.operators.mlmodels import (
        NB_TRAIN_PCT,
        _NB_SPLIT_A,
        _NB_SPLIT_B,
    )
    from mvrs_dspa_spark.functions import hashing as H
    from mvrs_dspa_spark.tables import table

    docs = table(spark, sf_medium, "documents")
    n_test = docs.where(
        H.affine_col(F.col("doc_id").cast("long"), _NB_SPLIT_A, _NB_SPLIT_B)
        % 100
        >= NB_TRAIN_PCT
    ).count()
    assert sum(r["n"] for r in rows) == n_test
    # per-class recalls sum to ~1
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["recall"])
    for lang, recalls in by_lang.items():
        assert abs(sum(recalls) - 1.0) < 1e-4, (lang, recalls)


def test_ndcg_bounds_and_consistency(spark, sf_medium):
    rows = _q("ann_ndcg_eval")(spark, sf_medium).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["ndcg_at_k"] <= 1.0, r
        assert r["precision_at_k"] == pytest.approx(r["n_hits"] / 10.0)
        # a perfect-precision list is a perfect ranking only if all
        # hits rank first — but zero hits MUST mean zero ndcg
        if r["n_hits"] == 0:
            assert r["ndcg_at_k"] == 0.0


def test_ndcg_gain_codes_are_monotone():
    from mvrs_dspa_spark.operators.ann import _NDCG_GAINS, _NDCG_IDCG

    assert list(_NDCG_GAINS) == sorted(_NDCG_GAINS, reverse=True)
    assert _NDCG_GAINS[0] == 1_000_000  # rank 1: 1/log2(2) = 1
    assert list(_NDCG_IDCG) == sorted(_NDCG_IDCG)  # cumulative
