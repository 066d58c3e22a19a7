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
    # r10: integer-division grid quantization + exact two-stage x
    # quantization + stack() output fan-out (ADVICE r9 items 1/2/4).
    "markov_attribution",
    # r10: the \x1f separator invariant is now enforced in the shared
    # vocab filter on both engines (ADVICE r9 item 3) — re-check both
    # riders of the _bpe_chain_ctes merge chain.
    "bpe_train",
    "tokenizer_fertility",
    # r10: rows-gate -> oracle hash gate conversions (VERDICT r9 #4):
    # pinned-centroid contingency table + 1e9 int-code MI/entropy for
    # the agreement report; rank-bucket k1-scale digest on the bounded
    # cents grid for the t-digest.
    "kmeans_label_agreement",
    "tdigest_value_quantiles",
)

# --- BEGIN GENERATED WINDOW (python tools/freshness.py --write-window) ---
_DRIVER_PRIORITY: tuple[str, ...] = (
    "markov_attribution",
    "bpe_train",
    "tokenizer_fertility",
    "kmeans_label_agreement",
    "tdigest_value_quantiles",
    "events_profile",
    "events_quarantine",
    "events_snapshot_diff",
    "hll_user_counts",
    "hourly_crosscorr_leadlag",
    "hourly_value_autocorrelation",
    "hybrid_search",
    "incremental_hourly_rollup",
    "interarrival_profile",
    "item_pagerank",
    "join_key_skew_report",
    "k_anonymity_report",
    "mad_value_outliers",
    "minhash_calibration",
    "multi_step_funnel",
    "negative_samples",
    "prefix_jaccard_join",
    "props_key_profile",
    "script_profile",
    "session_attribution",
    "sliding_distinct_users_hll",
    "source_token_divergence",
    "temporal_split",
    "user_decayed_activity",
    "user_rfm_segments",
    "user_state_history",
    "winsorized_value_stats",
    "ann_ivf_pq",
    "ann_lsh_banded",
    "activity_ledger",
    "ann_cosine_topk",
    "click_purchase_asof",
    "customers_without_orders",
    "decontaminate",
    "dedup_exact",
    "dedup_simhash",
    "doc_repetition",
    "embedding_near_dup",
    "event_pattern_matches",
    "event_rollup_hierarchy",
    "event_user_counts",
    "event_value_percentiles",
    "knn_label_eval",
    "latest_events_snapshot",
    "pii_scrub",
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
