"""Degenerate-slice behavior: every registered query must run on
EMPTY input tables — a time/partition filter that matches nothing is
routine at scale, and an operator that crashes on it (rather than
producing its empty or zero-valued result) is broken in production
even if every populated-data gate is green.

Scalar-aggregate queries legitimately emit their single summary row
(zeros/NULLs) on empty input; everything else must emit zero rows.
"""

from __future__ import annotations

import pytest

from mvrs_dspa_spark.plans.registry import all_queries
from mvrs_dspa_spark.tables import TABLE_NAMES

# queries whose result on empty input is a non-empty summary/report
# (scalar aggregates over zero rows, or fixed validation-check rows)
_NONEMPTY_ON_EMPTY = {
    "constraint_violations": 7,   # one row per declared check, all zero
    "session_conversion": 1,      # single funnel summary row
    "ann_quality_report": 3,      # one row per evaluated method, zeros
    "events_profile": 6,          # one row per profiled column, zeros
    "hourly_value_autocorrelation": 2,  # one row per lag, n=0/NULL r
    "multi_step_funnel": 3,  # one zero-count row per funnel step
    "ab_test_report": 1,  # scalar aggregate: one all-NULL summary row
    # r10 pinned-assignment form: scalar aggregate (one all-NULL row,
    # identical on the oracle side); the fitted form still returns 0
    "kmeans_label_agreement": 1,
    "join_key_skew_report": 3,  # one scalar summary row per key column
    "activity_gini": 1,  # scalar aggregate: one summary row
    "join_size_estimate": 3,  # one NULL-sized summary row per join pair
    "dedup_method_eval": 1,  # scalar aggregate: one all-zero/NULL row
    "q14_promo_revenue_share": 1,
    "q6_forecast_revenue": 1,
    "q19_disjunctive_revenue": 1,
    "q17_small_quantity_revenue": 1,
    "entity_resolution_blocking": 3,  # one scalar summary row per strategy
    "gdpr_erasure_audit": 4,  # one all-zero summary row per audited table
    "embedding_truncation_eval": 2,  # one scalar summary row per width
    "bloom_membership_report": 1,  # scalar aggregate: one all-zero row
    "quality_classifier_lr": 10,  # fixed 10-row score-decile report
    "vocab_good_turing": 1,  # scalar aggregate: one all-zero/NULL row
    "percolation_components": 3,  # fixed threshold grid, all-zero rows
    "kruskal_wallis_value": 1,  # scalar aggregate: one all-NULL/zero row
    "graph_assortativity": 1,  # scalar aggregate: one all-NULL/zero row
    "graph_kcore_summary": 3,  # one all-zero row per k in the fixed ladder
    "value_anova_by_type": 1,  # scalar aggregate: one all-NULL/zero row
    "value_brown_forsythe": 1,  # scalar aggregate: one all-NULL/zero row
    "did_analysis": 1,  # scalar aggregate: one all-NULL summary row
    "user_capture_recapture": 1,  # scalar aggregate: one all-NULL/zero row
    "embedding_intrinsic_dim": 1,  # scalar aggregate: one all-NULL/zero row
    "conversion_trend_cochran_armitage": 1,  # scalar: one all-NULL/zero row
    # r9 oracle conversion: channel domain is schema-pinned, so the
    # report is always one all-zero row per channel (effects 0, NULL
    # shares) even on empty input
    "markov_attribution": 4,
}


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("empty_sf")
    for t in TABLE_NAMES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        df.limit(0).write.parquet(str(root / f"{t}.parquet"))
    return str(root)


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_runs_on_empty_input(spark, empty_sf, name):
    df = all_queries()[name].fn(spark, empty_sf)
    n = len(df.collect())
    assert n == _NONEMPTY_ON_EMPTY.get(name, 0), (name, n)
