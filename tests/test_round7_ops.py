"""Invariant pins for the round-7 operator wave — cheap structural
truths the DuckDB parity hash can't express (it proves Spark==DuckDB,
not that both are RIGHT)."""

from __future__ import annotations

from mvrs_dspa_spark.plans.registry import all_queries


def _run(spark, sf, name):
    return all_queries()[name].fn(spark, sf).collect()


def test_sprt_llr_recomputes_from_counts(spark, sf_small):
    from mvrs_dspa_spark.plans.analytics4 import (
        _SPRT_BOUND_CODE,
        _SPRT_FAIL_CODE,
        _SPRT_SUCC_CODE,
    )

    rows = _run(spark, sf_small, "sequential_ab_sprt")
    cum = 0
    for r in sorted(rows, key=lambda r: r.day):
        cum += (
            r.n_success * _SPRT_SUCC_CODE
            + (r.n_trials - r.n_success) * _SPRT_FAIL_CODE
        )
        assert r.llr == round(cum / 1e9, 6), r
        want = (
            "accept_h1"
            if cum >= _SPRT_BOUND_CODE
            else "accept_h0"
            if cum <= -_SPRT_BOUND_CODE
            else "continue"
        )
        assert r.decision == want, r


def test_token_budget_selection_is_prefix_and_within_budget(
    spark, sf_small
):
    rows = sorted(
        _run(spark, sf_small, "token_budget_selection"),
        key=lambda r: r.rank,
    )
    total = rows[-1].cum_tokens
    # selection is a prefix of the quality ranking
    flags = [r.selected for r in rows]
    assert flags == sorted(flags, reverse=True)
    kept = [r for r in rows if r.selected]
    assert kept, "budget selected nothing"
    assert kept[-1].cum_tokens * 2 <= total
    # the next doc (if any) would exceed the budget
    if len(kept) < len(rows):
        assert rows[len(kept)].cum_tokens * 2 > total
    # quality ordering is monotone non-increasing along rank
    qs = [r.quality_score for r in rows]
    assert all(a >= b for a, b in zip(qs, qs[1:]))


def test_wasserstein_nonnegative_and_counts_conserve(spark, sf_small):
    from mvrs_dspa_spark.tables import table

    rows = _run(spark, sf_small, "value_wasserstein_drift")
    n_events = table(spark, sf_small, "events").count()
    assert sum(r.n_first_half + r.n_second_half for r in rows) == n_events
    for r in rows:
        if r.wasserstein_1 is not None:
            assert r.wasserstein_1 >= 0, r


def test_kmeans_assign_pinned_bounds(spark, sf_small):
    from mvrs_dspa_spark.operators.clustering import PIN_K

    rows = _run(spark, sf_small, "kmeans_assign_pinned")
    assert rows, "no assignments"
    assert all(0 <= r.cluster < PIN_K for r in rows)
    assert all(r.dist >= 0 for r in rows)


def test_ewma_abs_error_consistent(spark, sf_small):
    rows = _run(spark, sf_small, "ewma_hourly_forecast")
    for r in rows:
        assert r.abs_error >= 0
        # |actual - forecast| at display precision, within the 1e-6
        # rounding granularity of the two published columns
        assert (
            abs(abs(r.actual_value - r.ewma_forecast) - r.abs_error)
            < 2e-6
        ), r


def test_absorbing_paths_probability_bounds(spark, sf_small):
    rows = _run(spark, sf_small, "session_path_markov_absorbing")
    for r in rows:
        assert 0.0 <= r.p_absorb <= 1.0
        assert r.n_absorbed <= r.n_sessions
        if r.n_absorbed > 0:
            assert r.mean_steps_to_purchase >= 1.0
        # a session STARTING with purchase absorbs at step 1
        if r.start_type == "purchase":
            assert r.p_absorb == 1.0 and r.mean_steps_to_purchase == 1.0


def test_containment_join_direction_and_bounds(spark, sf_small):
    rows = _run(spark, sf_small, "minhash_containment_join")
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 <= r.est_jaccard <= 1
        assert r.est_containment >= r.est_jaccard - 1e-9, r
        assert r.direction == (
            "a_in_b" if r.n_a <= r.n_b else "b_in_a"
        )


def test_percolation_monotone_in_threshold(spark, sf_small):
    rows = sorted(
        _run(spark, sf_small, "percolation_components"),
        key=lambda r: r.tau,
    )
    # raising the bar can only remove edges and nodes and shrink the
    # largest component
    for lo, hi in zip(rows, rows[1:]):
        assert hi.n_edges <= lo.n_edges
        assert hi.n_nodes <= lo.n_nodes
        assert hi.max_component <= lo.max_component


def test_price_index_base_year_is_one(spark, sf_small):
    rows = sorted(
        _run(spark, sf_small, "price_index_laspeyres"),
        key=lambda r: r.year,
    )
    assert rows, "no years"
    base = rows[0]
    assert base.laspeyres == 1.0 == base.paasche == base.fisher
