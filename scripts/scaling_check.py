#!/usr/bin/env python3
"""Cross-SF scaling evidence: run representative headline queries at
sf0.001 / sf0.01 / sf0.1 (100x data spread) and report wall-clock
scaling exponents. An operator whose time grows ~O(n) prints an
exponent near 1 over the decade steps (sub-linear when fixed overhead
dominates the small SFs, which is the expected local-mode shape);
anything super-linear (exponent >> 1) is a red flag that the plan has
a hidden quadratic (self-join, unbounded window, driver loop) that a
1000-executor cluster at 100 TB would hit.

Usage: python scripts/scaling_check.py > SCALING.md
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# one representative per plan family: narrow scan, agg, join, window,
# shuffle-heavy dedup, vector search, index build+search, pattern scan
QUERIES = [
    "q1_pricing_summary",
    "q5_regional_revenue",
    "window_top_orders",
    "pipeline_e2e",
    "dedup_exact",
    "minhash_lsh_candidates",
    "embedding_cosine_topk",
    "bm25_search_topk",
    "sequence_funnel_matches",
    "merge_intervals",
    "heavy_hitters_merge",
    "topk_orders_per_customer",
    "containment_dedup_pairs",
    "upsert_latest_state",
    "neardup_triangle_stats",
    "streaming_pipeline",
    "span_dedup_stats",
    "span_index_batches",
    "hybrid_rrf_search",
    "source_overlap_matrix",
    "series_similarity_topk",
    # round-3 additions: lookup enrichment, reverse search, geo agg,
    # keyed fingerprint diff, hash-shuffle heads
    "ip_cidr_enrich",
    "percolate_matches",
    "geo_grid_counts",
    "snapshot_diff_classes",
    "epoch_shuffle_heads",
    # late round-3 additions: pointer-doubling closure, full window
    # surface, fixed-point PageRank, data-dependent histogram, narrow
    # string extraction
    "hierarchy_closure_depth",
    "window_function_matrix",
    "neardup_pagerank",
    "auto_date_histogram",
    "highlight_snippets",
    # final round-3 additions: in-row HOF repetition signal, bucketed
    # co-located join (incl. layout write), moment-closed matrix
    # stats, skew diagnostics, pluggable-source streaming run
    "dup_ngram_char_frac",
    "bucketed_orders_join",
    "matrix_stats_lineitem",
    "key_skew_report_users",
    "kinesis_sim_pipeline",
    # ES pipeline-agg tail: windowed bucket chains, bucket control
    # trio, log-template grouping, date_range x filters
    "pipeline_aggs_daily",
    "bucket_control_topdays",
    "categorize_text_templates",
    "date_range_filters_agg",
    # ES aggregation tail: disc-quantile boxplot, single-row Welch
    # reduce, calendar/value-grid bucket aggs, vocab-sized fuzzy
    # expansion, sampled estimate
    "boxplot_value_by_type",
    "ttest_quantity_returnflag",
    "rate_orders_monthly",
    "multi_terms_status_priority",
    "change_point_daily_orders",
    "fuzzy_terms_part",
    "ip_prefix_counts",
    "random_sampler_estimate",
    "variable_width_histogram_price",
    # ES aggregation tail 2 + DPP: Apriori-pruned basket pairs,
    # bucket-frame moving percentiles, domain-frame KS window,
    # partitioned-store build + runtime-pruned join
    "frequent_item_sets_orders",
    "moving_percentiles_daily",
    "bucket_ks_test_value",
    "dpp_quarter_revenue",
    # weak supervision, bounded-round graph peel, greedy coreset
    "weak_label_votes",
    "kcore_parts_graph",
    "coreset_kcenter_ids",
    # ES relations / training-data / eval-QA batch: join-field
    # queries, rescore window, group-extreme pairs, histogram-CDF
    # curriculum, capped-sample recall harness, corpus-stat explain
    "has_child_orders",
    "rescore_topk_events",
    "preference_pairs",
    "curriculum_epochs",
    "cross_source_priority_dedup",
    "lsh_recall_eval",
    "explain_bm25_doc",
    "length_bucket_batches",
    # ML primitives / ingest / rollup-search / DataSource-sink batch
    "logreg_gradient_embeddings",
    "ltr_rescore_topk",
    "filter_ablation_matrix",
    "vocab_coverage_curve",
    "ingest_pipeline_events",
    "extended_stats_quantity",
    "rollup_search_monthly",
    "es_bulk_sink_roundtrip",
    # search-surface trio: compiled query DSL, aggs DSL, full _search
    "es_query_dsl_search",
    "es_aggs_dsl_daily",
    "es_search_request",
    # round-4 interpreter tail
    "protobuf_jvm_roundtrip",
    "es_search_request_pipeline",
    "es_search_composite_page",
    "es_search_significant_terms",
    "es_search_knn",
    "es_search_rescore",
    "delete_update_by_query",
    # round-5 response-fidelity batch: two-section bodies, hybrid knn,
    # function_score breadth, fixed-interval/tz histograms, terms
    # paging with shard-simulated bounds, metric additions, nested
    # agg + runtime fields, faceted post_filter, ingest processors
    "es_search_hits_and_aggs",
    "es_search_knn_hybrid",
    "es_search_knn_rrf",
    "es_search_function_score_modes",
    "es_search_date_histogram_fixed",
    "es_search_terms_paging",
    "es_search_aggs_round5",
    "es_search_nested_agg",
    "es_search_post_filter",
    "es_search_geo_rings",
    "ingest_processors_round5",
    # round-6: parsed Lucene syntax, join-field body, samplers,
    # index-free mlt, scroll/PIT export (sequential per-page jobs —
    # expect flat-ish absolute time, not data scaling)
    "es_search_query_string",
    "es_search_min_should_match",
    "es_search_has_child_body",
    "es_search_sampler_body",
    "es_search_more_like_this_body",
    "es_scroll_pit_export",
    # round-7: position-chain match family, feature scoring, sliced
    # export, percolation (N alerts = one scan), new aggregations
    "es_search_phrase_prefix",
    "es_search_intervals",
    "es_search_rank_feature",
    "es_search_multi_match_types",
    "es_scroll_sliced_export",
    "es_percolate_alerts",
    "es_aggs_matrix_stats",
    "es_aggs_random_sampler",
    "es_aggs_categorize_text",
    "es_search_knn_similarity",
    # round-8: the ES|QL surface (BUCKET histogram, LOOKUP JOIN,
    # INLINESTATS window, anchored LIKE/RLIKE scan, FORK branch
    # union, CHANGE_POINT on the aggregated series) and _explain
    "esql_date_histogram",
    "esql_lookup_join_stats",
    "esql_inlinestats",
    "esql_like_rlike",
    "esql_fork_branches",
    "esql_change_point",
    "es_explain_score",
    # round-9: idle-machine anchors for the two most JIT-warm-up-
    # sensitive plans (driver-bench outliers adjudicated as JVM
    # warmth, not regressions — see BASELINE.md), plus the new ES|QL
    # surface: the full-text WHERE bridge, the pinned-NOW range, the
    # auto-interval histogram, and the TS scaffold
    "hierarchy_subtree_rollup",
    "esql_match_function",
    "esql_qstr_function",
    "esql_now_range",
    "esql_bucket_auto",
    "esql_ts_stats",
    "esql_kql_function",
    "esql_score_sort",
    "esql_string_scalars",
    "esql_fork_fuse_hybrid",
    "esql_categorize",
    "es_search_retriever_linear",
    # round-9 wave 2: TS time-series aggregates (two-level lowering),
    # KNN() in WHERE, RERANK, and the spatial scalar chain
    "esql_ts_rate",
    "esql_knn_function",
    "esql_rerank",
    "esql_st_distance",
]


def main() -> int:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from cga_kinesis_to_elasticsearch_spark.session import get_spark

    spark = get_spark("scaling-check")
    spark.sparkContext.setLogLevel("ERROR")
    qs = mod.queries()

    # warm codegen/session on the smallest SF
    for name in QUERIES:
        try:
            qs[name](spark, SFS[0]).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    print("# SCALING — wall clock vs scale factor (local[32])")
    print()
    print(
        "100x data spread (sf0.001 -> sf0.1). `exp` is the fitted\n"
        "log-slope of time vs data size over the last decade step\n"
        "(sf0.01 -> sf0.1): ~1 = linear scaling, < 1 = fixed overhead\n"
        "still dominating, >> 1 = hidden super-linear work. Warm\n"
        "timings, best of 2.\n"
    )
    print("| query | sf0.001 s | sf0.01 s | sf0.1 s | exp (last decade) |")
    print("|---|---|---|---|---|")
    for name in QUERIES:
        times = []
        err = None
        for sf in SFS:
            best = math.inf
            for _ in range(2):
                t0 = time.perf_counter()
                try:
                    qs[name](spark, sf).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except Exception as exc:  # noqa: BLE001
                    # keep a successful first attempt's timing; only a
                    # fully-failed SF poisons the row
                    err = f"{type(exc).__name__}"
                    continue
                best = min(best, time.perf_counter() - t0)
            times.append(best if best != math.inf else None)
        if any(t is None for t in times):
            print(f"| {name} | ERROR ({err}) | | | |")
            continue
        exp = math.log10(times[2] / times[1]) if times[1] > 0 else float("nan")
        print(
            f"| {name} | {times[0]:.2f} | {times[1]:.2f} | {times[2]:.2f} "
            f"| {exp:.2f} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
