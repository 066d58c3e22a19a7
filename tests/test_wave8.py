"""Invariants for the round-6 eighth wave (#147-151): blocklist
filter audit, n-gram diversity, DoReMi domain reweighting, Theil-Sen
trend, and the MASE forecast backtest. Cross-engine parity is covered
by test_oracle_parity; these pin semantics on known inputs."""

from __future__ import annotations

import datetime

import pytest

from mvrs_dspa_spark.plans.registry import all_queries


def _q(name):
    return all_queries()[name].fn


def test_blocklist_any_row_dominates(spark, sf_medium):
    rows = {
        r["category"]: r
        for r in _q("blocklist_filter_report")(spark, sf_medium).collect()
    }
    assert "ANY" in rows
    per_cat = [r for c, r in rows.items() if c != "ANY"]
    assert rows["ANY"]["n_docs_flagged"] >= max(
        r["n_docs_flagged"] for r in per_cat
    )
    assert rows["ANY"]["n_docs_flagged"] <= sum(
        r["n_docs_flagged"] for r in per_cat
    )
    assert rows["ANY"]["n_token_hits"] == sum(
        r["n_token_hits"] for r in per_cat
    )
    for r in rows.values():
        assert 0.0 <= r["flag_rate"] <= 1.0


def test_ngram_diversity_bounds(spark, sf_medium):
    rows = _q("ngram_diversity_report")(spark, sf_medium).collect()
    by_source = {}
    for r in rows:
        assert 1 <= r["distinct_ngrams"] <= r["total_ngrams"]
        assert 0.0 < r["distinct_ratio"] <= 1.0
        by_source.setdefault(r["source"], set()).add(r["n"])
    assert all(ns == {1, 2, 3} for ns in by_source.values())
    # total bigrams = total unigrams - one per (nonempty) doc
    for src, _ in by_source.items():
        tot = {r["n"]: r["total_ngrams"] for r in rows if r["source"] == src}
        assert tot[2] < tot[1] and tot[3] < tot[2]


def test_doremi_weights_are_a_distribution(spark, sf_medium):
    rows = _q("doremi_domain_weights")(spark, sf_medium).collect()
    assert len(rows) == 20
    assert abs(sum(r["domain_weight"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r["domain_weight"] > 0
        assert r["excess_bits"] >= 0.0
    # a domain with excess loss must be up-weighted relative to its
    # token share against a zero-excess domain of similar size
    tot_tokens = sum(r["n_tokens"] for r in rows)
    boosts = {
        r["source"]: (r["domain_weight"] / (r["n_tokens"] / tot_tokens),
                      r["excess_bits"])
        for r in rows
    }
    zero = [b for b, e in boosts.values() if e == 0.0]
    pos = [b for b, e in boosts.values() if e > 0.0]
    if zero and pos:
        assert max(zero) < max(pos) + 1e-9


def test_theil_sen_recovers_exact_line(spark, tmp_path):
    """Counts laid out as n(hr) = 2*hr_rel + 5: every pairwise slope
    is exactly 2, every residual exactly 5."""
    base = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for hr in range(12):
        for _ in range(2 * hr + 5):
            rows.append(
                (eid, base + datetime.timedelta(hours=hr, seconds=eid % 50),
                 eid % 7, "click", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    sf = str(tmp_path / "ts_sf")
    df.write.parquet(f"{sf}/events.parquet")
    out = _q("hourly_theil_sen_trend")(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_hours"] == 12
    assert r["n_pairs"] == 12 * 11 // 2
    assert r["slope_per_hour"] == pytest.approx(2.0)
    assert r["intercept"] == pytest.approx(5.0)


def test_mase_zero_for_perfect_seasonal_pattern(spark, tmp_path):
    """A perfectly 24h-periodic series (with one train-era glitch so
    the scaling denominator is nonzero): seasonal-naive forecasts the
    holdout exactly (MASE 0); flat-naive does not."""
    base = datetime.datetime(2024, 3, 1)
    pattern = [1, 3, 2, 5] * 6  # period 24
    rows = []
    eid = 0
    for day in range(4):
        for hod in range(24):
            n = pattern[hod] + (7 if (day == 1 and hod == 0) else 0)
            for _ in range(n):
                rows.append(
                    (eid, base + datetime.timedelta(days=day, hours=hod),
                     eid % 5, "view", 1.0, "{}")
                )
                eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    sf = str(tmp_path / "mase_sf")
    df.write.parquet(f"{sf}/events.parquet")
    out = _q("forecast_backtest_mase")(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["mae_seasonal"] == 0.0
    assert r["mase_seasonal"] == 0.0
    assert r["mae_naive"] > 0.0
    assert r["mase_naive"] > 0.0
