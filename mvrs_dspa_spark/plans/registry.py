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
    # -- never driver-verified in rounds 1-2 (26) --
    "similar_users_jaccard",
    "similar_users_minhash_lsh",
    "user_item_sets",
    "user_sessions",
    "sliding_activity_stats",
    "hourly_event_rollup",
    "text_features",
    "lang_id",
    "doc_quality",
    "token_counts",
    "doc_fingerprint",
    "quality_percentile_filter",
    "pack_sequences",
    "train_test_split",
    "stratified_sample",
    "source_quota_cap",
    "lang_mix_temperature",
    "shard_manifest",
    "training_corpus_manifest",
    "semantic_dedup",
    "constraint_violations",
    "reply_tree_roots",
    "reply_tree_stats",
    "salted_event_rollup",
    "error_purchase_precursor_join",
    "media_features",
    # -- first registered in round 3 (12) --
    "length_bucketed_batches",
    "doc_unigram_logprob",
    "lang_id_confusion",
    "session_conversion",
    "event_cube_summary",
    "user_event_type_pivot",
    "user_journey_paths",
    "event_type_transitions",
    "event_value_histogram",
    "user_hourly_gapfill",
    "retention_cohorts",
    "hourly_value_momentum",
    # -- first registered in round 3, cont. (12) --
    "bm25_search",
    "tfidf_top_terms",
    "embedding_quantize",
    "pca_embeddings_projection",
    "event_value_regression",
    "source_token_entropy",
    "weighted_sample_topk",
    "token_coverage_curve",
    "dedup_modality_agreement",
    "recommendation_agreement",
    "fuzzy_name_pairs",
    "item_cooccurrence_triangles",
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
