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
    # r11 rows->oracle conversions (census 16 -> 9). These five take
    # the changed slots; the other two conversions of the round —
    # ann_index_maintenance and ann_quality_report — are r5-stale and
    # earn their window slots from the oldest-first queue anyway.
    "media_features",
    "ann_lsh",
    "ann_lsh_banded",
    "kmeans_embeddings",
    "ann_ivf",
)

# --- BEGIN GENERATED WINDOW (python tools/freshness.py --write-window) ---
_DRIVER_PRIORITY: tuple[str, ...] = (
    "media_features",
    "ann_lsh",
    "ann_lsh_banded",
    "kmeans_embeddings",
    "ann_ivf",
    "ann_index_maintenance",
    "ann_quality_report",
    "q10_returned_revenue",
    "q11_concentrated_part_value",
    "q12_priority_shipping",
    "q13_order_count_distribution",
    "q14_promo_revenue_share",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q1_pricing_summary",
    "q20_bulk_bolt_suppliers",
    "q21_sole_return_supplier",
    "q22_idle_rich_customers",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_late_shipping_priority",
    "q5_supplier_volume",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_profit",
    "top_user_per_type",
    "user_value_moving_avg",
    "ann_ndcg_eval",
    "anomaly_mahalanobis_2d",
    "basket_lift_pairs",
    "benford_value_audit",
    "bloom_membership_report",
    "dau_wau_stickiness",
    "dedup_method_eval",
    "dedup_minhash_lsh",
    "doc_novelty_rate",
    "dp_event_counts",
    "dsir_importance_weights",
    "embedding_pq",
    "embedding_truncation_eval",
    "entity_resolution_blocking",
    "gdpr_erasure_audit",
    "graph_degree_stats",
    "haversine_store_assignment",
    "hourly_stl_decomposition",
    "join_size_estimate",
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
