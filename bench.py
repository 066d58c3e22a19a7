#!/usr/bin/env python3
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is fully executed (count() forces every exchange and
aggregation; nothing is cached between queries — Spark's DataFrame
cache is never used). Timing is steady-state: each query runs once
untimed (Catalyst analysis + Janino/whole-stage-codegen compile are
one-time JVM costs that amortize away at scale), then the MIN of three
timed full executions is reported — single timed runs in a shared JVM
swing 2x on GC pauses and background load, and the min measures the
plan, not the pause. Set SPARK_GRAFT_COLD=1 to time first executions
instead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mvrs_dspa_spark.plans.registry import queries  # noqa: E402
from mvrs_dspa_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_supplier_volume",
    "sliding_activity_stats",
    "user_sessions",
    "similar_users_jaccard",
    "similar_users_minhash_lsh",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "kmeans_embeddings",
]

# Timed identically but reported separately and EXCLUDED from the
# headline total, so round-over-round totals stay comparable while the
# round-2 LLM-pipeline additions still get perf visibility.
EXTRA_QUERIES = [
    "decontaminate",
    "chunk_documents",
    "boilerplate_ngrams",
    "error_purchase_precursor_join",
    "ann_ivf",
    "dedup_incremental",
    "semantic_dedup",
    "quality_percentile_filter",
    "training_corpus_manifest",
    "media_features",
    # round 3: iterative (pointer-doubling) and multi-table-scan paths
    "reply_tree_stats",
    "constraint_violations",
    "latest_events_snapshot",
    # round 3 additions: vocabulary join, grouping sets, ordered collect
    "doc_unigram_logprob",
    "event_cube_summary",
    "user_journey_paths",
    # round 3 additions: retrieval + embedding compression
    "bm25_search",
    "embedding_quantize",
    # round 3 additions: banded LSH (the moderate-cosine scale path)
    # and the salted hot-key aggregation
    "ann_lsh_banded",
    "salted_event_rollup",
    # round 3 additions: iterative graph, bounded-grid sketch,
    # vocabulary-explode tokenizer statistics
    "item_pagerank",
    "cms_heavy_hitters",
    "bpe_merge_pairs",
    # round 3 addition: the compressed-domain ANN serving path.
    # prefix_jaccard_join is deliberately NOT benched at sf0.1: the
    # synthetic corpus has a ~40-word vocabulary, so at tau=0.6 nearly
    # every doc pair genuinely qualifies — the OUTPUT is Theta(n^2)
    # (DuckDB's brute force also runs minutes) and no algorithm can
    # beat its own result size; the operator's asymptotics are
    # vocabulary-driven and only meaningful on realistic text.
    "ann_ivf_pq",
    # round 4 additions: collocation mining (linear bigram explode),
    # quintile-edge segmentation, portable sketches
    "bigram_pmi",
    "user_rfm_segments",
    "hll_user_counts",
    "join_size_estimate",
    # round 4 cont.: sketch-partial window rollup, SCD2 windows,
    # MERGE-with-deletes, quality-staged manifest
    "sliding_distinct_users_hll",
    "user_state_history",
    "cdc_merge_apply",
    "curriculum_manifest",
    # round 4 final: containment pairs, MATCH_RECOGNIZE analog,
    # approximate-vs-exact dedup eval, supervised/graph evaluations
    "dedup_containment",
    "event_pattern_matches",
    "dedup_method_eval",
    "knn_label_eval",
    "kmeans_label_agreement",
    "item_communities_lpa",
    # round 6: representative slice of the 16 new registrations —
    # mergeable sketches, broadcast geo fan-out, graph rollup,
    # stopword-lexicon join, covariance-broadcast scoring
    # round 11: the remaining converted-family members not yet listed —
    # full-signature LSH, exact-grid PQ, and the maintenance report.
    # ann_quality_report is deliberately NOT benched: it recomputes
    # brute-force truth + IVF + both LSH variants, all of which are
    # timed individually here.
    "ann_lsh",
    "embedding_pq",
    "ann_index_maintenance",
    "theta_sketch_distinct_union",
    "tdigest_value_quantiles",
    "haversine_store_assignment",
    "graph_degree_stats",
    "doc_stopword_entropy",
    "anomaly_mahalanobis_2d",
    # round 6 second wave: temporal join against the SCD2 dimension,
    # survival curve, substring-window explode, hashed-unigram scoring
    "point_in_time_state_join",
    "kaplan_meier_conversion",
    "dsir_importance_weights",
    "substring_dup_rate",
    # round 6 later waves: sliding-distinct engagement, truncated-dim
    # retrieval eval, basket pair join, chain-solve attribution,
    # bounded-grid rank transform, bloom build+probe
    "dau_wau_stickiness",
    "embedding_truncation_eval",
    "basket_lift_pairs",
    "markov_attribution",
    "quantile_transform_values",
    "bloom_membership_report",
    # feature-engineering / release block (#137-140)
    "woe_information_value",
    "wilson_ctr_ranking",
    "zorder_clustering",
    "dp_event_counts",
    # distributed model fits (#141-142)
    "quality_classifier_lr",
    "als_implicit_recs",
    # waves 7-8 (#143-153): the scan-heavy / window-heavy additions —
    # pair-quadratic robust trend (bounded series), probe-window
    # Shapley valuation, token-explode NB scoring and EG reweighting
    "user_activity_streaks",
    "hourly_stl_decomposition",
    "nb_lang_classifier",
    "ann_ndcg_eval",
    "ngram_diversity_report",
    "doremi_domain_weights",
    "hourly_theil_sen_trend",
    "forecast_backtest_mase",
    "knn_shapley_data_values",
    "blocklist_filter_report",
    "hourly_burstiness",
    "ncm_classifier_eval",
    "heaps_law_fit",
    "zipf_slope_fit",
    "vocab_good_turing",
    "daily_growth_accounting",
    "parts_abc_classification",
    "ab_test_cuped",
    "supplier_scorecard",
    "brand_price_elasticity",
    # round 8: the pinned hash-gate twins (projection-only — these pin
    # the cost of the oracle-checkable selection steps)
    "ann_lsh_assign_pinned",
    "embedding_pq_encode_pinned",
    # round 8 second wave: rank tests on the cent grid, coalition
    # lattice, graph structure metrics, text vectorizers
    "value_mannwhitney_by_type",
    "kruskal_wallis_value",
    "value_hour_spearman",
    "hourly_mann_kendall_trend",
    "shapley_channel_attribution",
    "graph_clustering_coefficient",
    "graph_assortativity",
    "graph_kcore_summary",
    "doc_readability",
    "feature_hashing_vectors",
    "coreset_kcenter_selection",
    "mannwhitney_fdr_bh",
    "changepoint_segmented_trend",
    "embedding_centroid_drift",
    "value_anova_by_type",
    "value_brown_forsythe",
    "bootstrap_mean_ci",
    "pack_efficiency_report",
    "epoch_shuffle_order",
    "did_analysis",
    "user_capture_recapture",
    "embedding_intrinsic_dim",
    "conversion_trend_cochran_armitage",
    "ql_dirichlet_search",
    "value_drift_divergences",
]

# Multi-iteration model fits amortize codegen across their own
# iterations and persist/checkpoint intermediate state, so a warmup +
# min-of-3 protocol quadruples minutes-long wall-clock for no extra
# signal: these are timed as ONE cold execution.
ONESHOT_QUERIES = {
    "als_implicit_recs",
    # bounded-iteration ops: k x (checkpointed round) structure — the
    # warmup+min-of-3 protocol re-runs every round for no extra signal
    "graph_kcore_summary",
    "coreset_kcenter_selection",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark(app_name="mvrs-dspa-bench")
    spark.sparkContext.setLogLevel("ERROR")
    q = queries()

    cold = os.environ.get("SPARK_GRAFT_COLD") == "1"
    # untimed JVM spin-up on a small query
    q["q1_pricing_summary"](spark, sf_dir).count()

    def run(names: list[str]) -> dict[str, float]:
        timings: dict[str, float] = {}
        for name in names:
            # measure each query from a clean heap: without this, garbage
            # from the previous query's shuffles lands as GC pauses inside
            # the next query's timed run (measured 2x swings)
            spark._jvm.System.gc()
            oneshot = cold or name in ONESHOT_QUERIES
            if not oneshot:
                q[name](spark, sf_dir).count()  # untimed: codegen compile
            best = float("inf")
            for _ in range(1 if oneshot else 3):
                t0 = time.perf_counter()
                q[name](spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        return timings

    # 1-min load average bracketing each block: SURVEY §6's noisy-
    # neighbor methodology (VERDICT r9 #5) — a bench row is only
    # comparable round-over-round at matched calibration_q1, and the
    # load samples let a reader attribute a swing to host conditions
    # without re-running.
    loads = {"start": round(os.getloadavg()[0], 2)}
    timings = run(BENCH_QUERIES)
    loads["after_headline"] = round(os.getloadavg()[0], 2)
    extra = run(EXTRA_QUERIES)
    loads["end"] = round(os.getloadavg()[0], 2)
    total = round(sum(timings.values()), 3)
    # Multi-minute one-shot fits are reported in their own field and
    # excluded from the extras sum so extras-total stays comparable
    # round-over-round (VERDICT r6 #7).
    slow = {n: extra.pop(n) for n in list(extra) if n in ONESHOT_QUERIES}
    # host-load calibration constant: q1 is a fixed, never-refactored
    # scan+agg plan, so its min-of-3 moves ONLY with host conditions.
    # Round-over-round comparisons should normalize by this (r4 and r5
    # totals both swung ~20% on driver-host load with zero code change).
    result = json.dumps(
        {
            "metric": "headline_queries_total_runtime",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "extra_queries": extra,
            "extra_total": round(sum(extra.values()), 3),
            "slow_queries": slow,
            "calibration_q1": timings.get("q1_pricing_summary"),
            # headline normalized by the calibration constant — the
            # PRIMARY round-over-round metric (SURVEY §6 contract):
            # raw seconds move with host load; this mostly doesn't.
            # Guarded like calibration_q1 above: a missing or
            # 0.0-rounded calibration timing must not crash the report
            # after every query already ran (ADVICE r10 #4).
            "headline_over_cal": (
                round(total / timings["q1_pricing_summary"], 1)
                if timings.get("q1_pricing_summary")
                else None
            ),
            "load_avg_1m": loads,
            "sf": sf,
            "methodology": "cold-first-run" if cold else "steady-state-min-of-3",
            # Effective-parallelism echo (r12, additions only — VERDICT
            # r11 #2): the bench HONORS $SPARK_GRAFT_CPUS (session.py
            # builds local[{cpus}] and matches shuffle partitions to
            # it), but the JSON never said so, and at sf0.1 the 8-vs-32
            # core ratio is pure noise — so the driver's scaling probe
            # flagged suspect_cpus_ignored. Naming the resolved core
            # count and the scheduler's own defaultParallelism makes
            # the probe legible.
            "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
            "default_parallelism": spark.sparkContext.defaultParallelism,
            "sf_dir": sf_dir,
            # ECHO of the headline fields, placed LAST in the object:
            # the driver stores only the final 2000 chars of stdout
            # (BENCH_r06..r10 all truncate this line mid-"queries" and
            # record parsed=null), so the line's head — metric, value,
            # and the 10 headline timings — never survived into the
            # round artifact. Duplicating them at the tail keeps the
            # contract prefix {"metric": ...} intact for any
            # line-detecting parser while guaranteeing the headline
            # numbers sit inside the captured window. Pure addition:
            # no key removed, renamed, or reordered (r11).
            "headline_echo": {"value": total, "queries": timings},
        }
    )
    # The driver tail-captures stdout and has truncated the JSON line
    # before (BENCH_r06 lost the headline total): print the JSON FIRST
    # and also persist it next to the repo so the artifact can't be
    # lost to capture truncation.
    print(result)
    sys.stdout.flush()
    try:
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_out.json")
        with open(out, "w") as f:
            f.write(result + "\n")
    except OSError:
        pass


if __name__ == "__main__":
    main()
