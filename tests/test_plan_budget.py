"""Shuffle-count budgets for the headline queries (SURVEY §4).

A silent extra exchange is the classic scale regression: the query
stays correct, the small-SF timing barely moves, and at 100 TB the new
shuffle doubles the job's network volume. Each headline plan gets a
ceiling equal to its audited shuffle count (pre-AQE physical plan, so
the budget is deterministic); a refactor that adds an exchange must
consciously raise the budget in this file."""

from __future__ import annotations

import re

import pytest

from mvrs_dspa_spark.plans.registry import all_queries

# audited shuffle counts (round 6); equality allowed, exceeding fails
_SHUFFLE_BUDGET = {
    "q1_pricing_summary": 2,       # agg exchange + result range-sort
    "q3_shipping_priority": 1,     # fact-fact join (dims broadcast)
    "q5_supplier_volume": 2,
    "sliding_activity_stats": 4,
    "user_sessions": 2,
    "similar_users_jaccard": 9,
    "similar_users_minhash_lsh": 6,
    "dedup_minhash_lsh": 3,        # signature agg + band join + sort
    "ann_cosine_topk": 2,
    "kmeans_embeddings": 1,
    "hourly_event_rollup": 3,
    "latest_events_snapshot": 2,
    "q6_forecast_revenue": 1,      # single partial+final agg pair
    "point_in_time_state_join": 5,
    "substring_dup_rate": 5,
    "dsir_importance_weights": 6,
    # waves 7-8 (audited round 6). Unbounded-data exchanges are 1-2
    # per plan (the first rollup / explode agg); the rest ride grids
    # bounded by the retention window, vocabulary, or probe cap.
    "user_activity_streaks": 3,
    "hourly_stl_decomposition": 4,
    "nb_lang_classifier": 16,
    "ann_ndcg_eval": 3,
    "ngram_diversity_report": 3,
    "doremi_domain_weights": 6,
    # +3 exchanges over the unbucketed form: the width scalar and
    # the bucket rollup — bought the 720-point series cap (the 10x
    # stress probe caught the unbounded form going quadratic)
    "hourly_theil_sen_trend": 10,
    "forecast_backtest_mase": 9,
    "knn_shapley_data_values": 2,
    "blocklist_filter_report": 5,
    "hourly_burstiness": 4,
    "ncm_classifier_eval": 5,
    "heaps_law_fit": 7,
    "zipf_slope_fit": 2,
    "vocab_good_turing": 2,
    # (user, day) distinct + LAG/LEAD window + two day rollups
    # meeting in a full-outer join; only the distinct is unbounded
    "daily_growth_accounting": 8,
    # part-dimension rollup + the dimension-bounded global cum window
    "parts_abc_classification": 5,
    "ab_test_cuped": 4,
    "supplier_scorecard": 5,
    "brand_price_elasticity": 2,
    # round 7 (audited at registration). Unbounded exchanges are the
    # first fact-grain aggregation/window; everything after rides
    # grids bounded by the band buckets, value domain, hour series,
    # or part dimension.
    "kmeans_assign_pinned": 1,        # final range-sort only
    "order_batch_windows": 1,         # one custkey partitioning, reused
    "sequential_ab_sprt": 2,
    "ewma_hourly_forecast": 4,        # hourly agg + 48x grid fan-out
    "lineitem_discount_lift": 2,
    "cohort_ltv_curves": 6,
    "influence_functions_lr": 1,      # suff-stats agg; fit broadcast back
    "minhash_containment_join": 3,    # sig agg + band join + sort
    "shingle_entropy_profile": 2,
    "price_index_laspeyres": 7,       # fact join + part-year grid joins
    "session_path_markov_absorbing": 3,
    "uplift_model_tlearner": 4,
    "value_wasserstein_drift": 4,     # cent-grid agg + grid windows
    "embedding_random_projection": 1,  # projection-only + sort
    "token_budget_selection": 1,      # doc-grain global rank (see doc)
}

_EXCHANGE_RE = re.compile(
    r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition)"
)


def _shuffles(spark, sf_small, name: str) -> int:
    df = all_queries()[name].fn(spark, sf_small)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    plan = df._jdf.queryExecution().explainString(mode)
    return len(_EXCHANGE_RE.findall(plan))


@pytest.mark.parametrize("name", sorted(_SHUFFLE_BUDGET))
def test_shuffle_budget(spark, sf_small, name):
    n = _shuffles(spark, sf_small, name)
    assert n <= _SHUFFLE_BUDGET[name], (
        f"{name} plans {n} shuffles, budget {_SHUFFLE_BUDGET[name]} — "
        "a new exchange appeared; justify it and raise the budget "
        "consciously, or remove it"
    )
