"""Single source of truth for the driver-checkable query surface.

Every operator the engine claims is registered here as a
:class:`QuerySpec`: a Spark plan builder plus (where SQL-expressible)
the equivalent DuckDB oracle SQL. ``__spark_entry__.queries()`` and
``oracle_sql()`` are thin views over this registry.

Determinism rules for oracle-matched queries:
- alias every computed column identically in Spark and SQL;
- round floating aggregates on BOTH sides (sum of cent-granular
  doubles -> round 2; ratios -> round 6) so summation order can't
  flip the value hash;
- top-N queries order by the ROUNDED value with a unique tiebreaker
  column so both engines select the same row set.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered table views
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


def register(
    name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc, tags)
        return fn

    return deco


# The external correctness driver checks the FIRST 50 registered
# queries each round. Since r10 the window is GENERATED, not accreted
# (VERDICT r9 #2): `python tools/freshness.py --write-window` rewrites
# the tuple between the markers below as _CHANGED_THIS_ROUND (first
# driver checks of changed/new implementations, <=5 by policy)
# followed by the oldest-first re-sweep queue (never-checked first,
# then stalest round, oracle gates before rows gates, name tiebreak).
# tests/test_freshness_ledger.py pins _DRIVER_PRIORITY to the tool's
# output, so a hand edit or a missed regeneration fails CI. Names not
# in the window follow in registration order.

# Queries whose implementation changed (or that were first registered)
# this round — they take the window's front slots for a first driver
# check of the NEW behavior; everything else is re-verification and
# cycles mechanically. Keep <=5 (the drain policy) and clear at the
# next round open.
_CHANGED_THIS_ROUND: tuple[str, ...] = (
    # r12 optimization-round plan changes. The LSH first-matching-band
    # candidate dedup rides under every scored_candidate_pairs_* user
    # (dedup_clusters, dedup_method_eval, percolation_components pick
    # up window slots from the staleness queue); the cooccurrence
    # NULL-user pin rides under the whole graph family via
    # item_communities_lpa's edges.
    "dedup_minhash_lsh",
    "similar_users_minhash_lsh",
    "als_implicit_recs",
    "join_size_estimate",
    "item_communities_lpa",
)

# --- BEGIN GENERATED WINDOW (python tools/freshness.py --write-window) ---
_DRIVER_PRIORITY: tuple[str, ...] = (
    "dedup_minhash_lsh",
    "similar_users_minhash_lsh",
    "als_implicit_recs",
    "join_size_estimate",
    "item_communities_lpa",
    "kaplan_meier_conversion",
    "knn_confidence_calibration",
    "l_diversity_report",
    "nb_lang_classifier",
    "ngram_jaccard_pairs",
    "orders_cdf_quantiles",
    "quantile_transform_values",
    "reservoir_sample_events",
    "rfm_segment_counts",
    "seasonal_hour_profile",
    "substring_dup_rate",
    "supplier_ship_latency",
    "target_encoding_loo",
    "theta_sketch_overlap",
    "top2_share_per_type",
    "user_activity_streaks",
    "user_lifecycle_stages",
    "value_ttest_by_type",
    "wilson_ctr_ranking",
    "woe_information_value",
    "zorder_clustering",
    "quality_classifier_lr",
    "ab_test_cuped",
    "blocklist_filter_report",
    "brand_price_elasticity",
    "cohort_ltv_curves",
    "conditional_entropy_transitions",
    "daily_growth_accounting",
    "doc_fingerprint",
    "doc_quality",
    "doc_stopword_entropy",
    "doremi_domain_weights",
    "embedding_random_projection",
    "event_cube_summary",
    "event_dow_chisq",
    "event_type_transitions",
    "event_value_histogram",
    "event_value_regression",
    "ewma_hourly_forecast",
    "forecast_backtest_mase",
    "heaps_law_fit",
    "hourly_burstiness",
    "hourly_value_momentum",
    "influence_functions_lr",
    "kmeans_assign_pinned",
)
# --- END GENERATED WINDOW ---


def all_queries() -> dict[str, QuerySpec]:
    # Import registers as a side effect; keep imports here to avoid cycles.
    from mvrs_dspa_spark.operators import (  # noqa: F401
        export,
        multimodal,
        range_join,
        reply_tree,
        sampling,
        sessionize,
        similarity,
        skew,
        text_analysis,
        validation,
        window_stats,
    )
    from mvrs_dspa_spark.operators import (  # noqa: F401
        ann,
        bpe,
        chunking,
        cleaning,
        clustering,
        decontam,
        dedup,
        embeddings,
        ensemble,
        mlmodels,
        retrieval,
        sketches,
    )
    from mvrs_dspa_spark.plans import (  # noqa: F401
        analytics,
        analytics2,
        analytics3,
        analytics4,
        analytics5,
        features,
        tpch,
        tpch_extra,
    )

    ordered: dict[str, QuerySpec] = {}
    for name in _DRIVER_PRIORITY:
        spec = _REGISTRY.get(name)
        if spec is not None:
            ordered[name] = spec
    for name, spec in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
