"""Invariants for the feature-engineering/release block (plans/features.py).

Oracle parity is covered by test_oracle_parity; these pin the
*semantics*: WOE/IV identities, the Wilson bound's shrinkage
properties, Z-order's two-dimensional locality advantage over a
single-key sort, and the DP release's noise calibration.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mvrs_dspa_spark.plans.features import (
    _Z_FILES,
    dp_event_counts,
    wilson_ctr_ranking,
    woe_information_value,
    zorder_clustering,
)
from mvrs_dspa_spark.tables import table


def test_woe_identities(spark, sf_medium):
    rows = woe_information_value(spark, sf_medium).collect()
    feats = {r.feature for r in rows}
    assert feats == {"dow", "hour6", "value_b"}
    # every feature's bins partition the same corpus
    by_feat = {}
    for r in rows:
        by_feat.setdefault(r.feature, []).append(r)
    sizes = {f: sum(r.n_pos + r.n_neg for r in rs) for f, rs in by_feat.items()}
    assert len(set(sizes.values())) == 1
    for f, rs in by_feat.items():
        # IV is the sum of its terms (to rounding granularity) and >= ~0:
        # each term is (a-b)*ln(a/b), sign-definite up to smoothing
        assert rs[0].feature_iv == pytest.approx(
            sum(r.iv_term for r in rs), abs=1e-5
        )
        assert rs[0].feature_iv >= -1e-6
        # reconstruct one WOE by hand
        pos_tot = sum(r.n_pos for r in rs)
        neg_tot = sum(r.n_neg for r in rs)
        r0 = rs[0]
        expect = math.log(
            ((r0.n_pos + 0.5) / pos_tot) / ((r0.n_neg + 0.5) / neg_tot)
        )
        assert r0.woe == pytest.approx(expect, abs=1e-5)


def test_wilson_shrinkage(spark, sf_medium):
    rows = wilson_ctr_ranking(spark, sf_medium).collect()
    assert len(rows) == 100
    # descending by bound, lower bound below the raw rate, in [0, 1]
    bounds = [r.wilson_lb for r in rows]
    assert bounds == sorted(bounds, reverse=True)
    for r in rows:
        assert 0.0 <= r.wilson_lb <= r.raw_rate <= 1.0
    # a small-n perfect converter must rank below a large-n good one:
    # check monotone shrinkage directly on the closed form
    def lb(k, n, z2=3.8416):
        p = k / n
        return (
            p + z2 / (2 * n) - 1.96 * math.sqrt((p * (1 - p) + z2 / (4 * n)) / n)
        ) / (1 + z2 / n)

    assert lb(1, 1) < lb(40, 80)
    assert lb(5, 10) < lb(50, 100)


def test_zorder_beats_single_key_sort(spark, sf_medium):
    rep = zorder_clustering(spark, sf_medium).collect()
    assert 1 <= len(rep) <= _Z_FILES
    assert all(r.n_rows > 0 for r in rep)
    # The span *product* (~1/n_files) is layout-invariant; Z-order's
    # advantage is envelope BALANCE: each file bounds both dimensions,
    # so a filter on the secondary dimension alone skips most files,
    # where a partkey-sorted layout leaves every file's suppkey
    # envelope at ~100% (zero skipping). Probe several suppkey points
    # and compare files-touched under min-max pruning.
    li = table(spark, sf_medium, "lineitem")
    n = li.count()
    per_file = max(1, -(-n // _Z_FILES))
    linear = (
        li.select(
            "l_partkey",
            "l_suppkey",
            F.expr(
                "(row_number() over (order by l_partkey, l_suppkey) - 1) "
                f"div {per_file} as file_id"
            ),
        )
        .groupBy("file_id")
        .agg(
            F.min("l_suppkey").alias("supp_min"),
            F.max("l_suppkey").alias("supp_max"),
        )
        .collect()
    )
    probes = [5, 37, 61, 88]
    z_touched = sum(
        1
        for p in probes
        for r in rep
        if r.supp_min <= p <= r.supp_max
    )
    lin_touched = sum(
        1
        for p in probes
        for r in linear
        if r.supp_min <= p <= r.supp_max
    )
    assert z_touched < 0.35 * lin_touched, (z_touched, lin_touched)


def test_dp_noise_calibration(spark, sf_medium):
    released = dp_event_counts(spark, sf_medium)
    ev = table(spark, sf_medium, "events")
    true = (
        ev.select(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    joined = released.join(true, ["event_type", "day"]).collect()
    assert len(joined) == released.count()
    errs = [abs(r.released_count - r.n) for r in joined]
    # Laplace(b=1/eps=1): mean |noise| = 1, P(|noise| > 8) ~ 3e-4.
    # The deterministic hash stream should look like that distribution.
    assert sum(errs) / len(errs) < 3.0
    assert max(errs) < 25.0
    assert any(e > 0.01 for e in errs)  # noise actually applied
    assert all(r.released_count >= 0 for r in joined)  # clamped


def test_dp_release_is_reproducible(spark, sf_medium):
    a = {(r.event_type, r.day): r.released_count
         for r in dp_event_counts(spark, sf_medium).collect()}
    b = {(r.event_type, r.day): r.released_count
         for r in dp_event_counts(spark, sf_medium).collect()}
    assert a == b
