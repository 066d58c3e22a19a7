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


# The external correctness driver checks the FIRST 50 registered queries
# each round. This list pins the front of the ordering explicitly so slot
# allocation doesn't depend on import side-effect order: queries never
# driver-verified (r1-r2), queries whose implementation changed this round,
# and queries first registered this round go first; stable r2-green queries
# rotate to the back. Names not in this list follow in registration order.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # -- round-5 rotation: the 8 queries never driver-verified in any
    # round lead (the round-4 registration list overflowed the 50-slot
    # window before these late additions). The two oracle-gated ones
    # come first. After this round every query ever registered has a
    # driver result. --
    "event_pattern_matches",
    "knn_label_eval",
    "embedding_pq",
    "ann_quality_report",
    "ann_index_maintenance",
    "bpe_train",
    "kmeans_label_agreement",
    "item_communities_lpa",
    # -- round-5 new registrations (appended as they land, so
    # first-time names stay inside the 50-slot window) --
    "rfm_segment_counts",
    "graph_degree_stats",
    "orders_cdf_quantiles",
    "top2_share_per_type",
    "haversine_store_assignment",
    "user_lifecycle_stages",
    "theta_sketch_distinct_union",
    "value_ttest_by_type",
    "seasonal_hour_profile",
    "entity_resolution_blocking",
    "doc_stopword_entropy",
    "reservoir_sample_events",
    "conditional_entropy_transitions",
    "benford_value_audit",
    "tdigest_value_quantiles",
    "anomaly_mahalanobis_2d",
    "dedup_minhash_lsh",  # shared-scan refactor this round (see dedup.py)
    "dedup_method_eval",  # shared shingle scan refactor this round
    "join_size_estimate",  # single-job union rebuild this round
    # -- regression re-sweep: the longest-unverified hash-green rows
    # (last checked r2) fill the remaining slots, oldest first --
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_volume",
    "top_user_per_type",
    "customers_without_orders",
    "event_user_counts",
    "q10_returned_revenue",
    "q14_promo_revenue_share",
    "q16_supplier_part_counts",
    "q18_large_orders",
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q9_product_profit",
    "q12_priority_shipping",
    "q13_order_count_distribution",
    "q19_disjunctive_revenue",
    "q21_sole_return_supplier",
    "q22_idle_rich_customers",
    "q4_late_shipping_priority",
    "q8_market_share",
    "q11_concentrated_part_value",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q20_bulk_bolt_suppliers",
    "click_purchase_asof",
    "event_rollup_hierarchy",
    "user_value_moving_avg",
    "event_value_percentiles",
    "latest_events_snapshot",
    "activity_ledger",
    "dedup_exact",
    "dedup_simhash",
    "ngram_jaccard_pairs",
    "embedding_near_dup",
    "ann_cosine_topk",
    "pii_scrub",
    "doc_repetition",
    "decontaminate",
    "chunk_documents",
    "boilerplate_ngrams",
    "dedup_clusters",
    "dedup_incremental",
)


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
        retrieval,
        sketches,
    )
    from mvrs_dspa_spark.plans import analytics, tpch, tpch_extra  # noqa: F401

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
