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
    # -- round-4 rotation: the 35 queries never driver-verified in
    # r1-r3 (all late round-3 additions), plus embedding_quantize
    # whose codes column was re-serialized this round after the r3
    # driver FAIL. Stable hash-green queries rotate to the back. --
    "embedding_quantize",
    "ab_test_report",
    "activity_gini",
    "ann_ivf_pq",
    "ann_lsh_banded",
    "bpe_merge_pairs",
    "cms_heavy_hitters",
    "code_switch_report",
    "corpus_mixture_report",
    "cross_source_dup_matrix",
    "doc_bigram_logprob",
    "event_value_equidepth_histogram",
    "events_profile",
    "hourly_changepoint_cusum",
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
    "session_attribution",
    "source_token_divergence",
    "temporal_split",
    "user_decayed_activity",
    "value_drift_ks",
    "value_drift_psi",
    "winsorized_value_stats",
    # -- round-4 new registrations fill the remaining slots (added as
    # they land, keeping the first-50 window on first-time names) --
    "user_rfm_segments",
    "event_dow_chisq",
    "bigram_pmi",
    "script_profile",
    "events_snapshot_diff",
    "hll_user_counts",
    "join_size_estimate",
    "cdc_merge_apply",
    "hourly_crosscorr_leadlag",
    "decontaminate_semantic",
    "curriculum_manifest",
    "events_quarantine",
    "sliding_distinct_users_hll",
    "user_state_history",
    "dedup_containment",
    "dedup_method_eval",
    "event_pattern_matches",
    "knn_label_eval",
    "embedding_pq",
    "ann_quality_report",
    # -- slots 51+: rows-gate queries whose correctness already rests
    # on strong local gates (exact python-reference equivalence for
    # bpe_train, numpy parity for embedding_pq, invariant pytests for
    # the others); the driver's 50-slot window goes to oracle-gated
    # first-timers. ROUND-5 ROTATION: move these four to the front,
    # then rotate the long-stable r2-green block through the
    # remaining slots. --
    "ann_index_maintenance",
    "bpe_train",
    "kmeans_label_agreement",
    "item_communities_lpa",
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
