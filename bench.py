#!/usr/bin/env python3
"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints one SHORT per-query line each

    {"q": "<name>", "best": N, "all": [..]}

followed by a FINAL compact line

    {"metric": "...", "value": N, "unit": "sec", "sf": ..., ...}

(well under 200 bytes) — the harness that records the bench
tail-captures a bounded number of characters and parses the LAST
line, and round 7-9's single full-payload line outgrew that capture
(per-query evidence arrived truncated). The full payload (the same
{"queries": {...}, "all_runs": {...}} map as before) is written to
BENCH_local.json (scratch) and BENCH_perquery.json (committed).

Each query is fully evaluated through the noop sink (no driver collect,
no pandas conversion — measures the distributed plan, not the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

# Headline set: the parity pipeline + one representative per north-star
# family (dedup / similarity / text), plus the classic agg/join/window
# shapes that dominate a 100 TB workload.
HEADLINE = [
    "pipeline_e2e",
    "grok_parse_docs",
    "enrich_snowflake",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "window_top_orders",
    "dedup_exact",
    "minhash_lsh_candidates",
    "simhash_docs",
    "embedding_cosine_topk",
    "embedding_ivf_topk",
    "salted_hot_key_agg",
    "text_quality",
    "sketch_daily_users",
    "pack_training_sequences",
    "lm_quality_score",
    # distribution-matching data selection (hashed n-gram importance)
    "dsir_importance_weights",
    "fuzzy_dedup_keep",
    "embedding_refine_topk",
    "bloom_pruned_semi_join",
    "range_export_manifest",
    # ES-core parity: build the inverted index on disk + BM25 top-k
    "bm25_search_topk",
    # maintained-state sinks: CDC upsert round-trip + mergeable top-k
    "upsert_latest_state",
    "heavy_hitters_merge",
    # full Structured Streaming run (decode->route->grok->enrich->sink
    # over micro-batches) — the reference's own workload shape; its
    # seconds/records(sf) is the single-node throughput comparison
    "streaming_pipeline",
    # round-3 additions: substring-level ExactSubstr dedup, hybrid
    # lexical+semantic retrieval (BM25+cosine RRF), cross-source
    # near-dup analytics
    "span_dedup_stats",
    "hybrid_rrf_search",
    "source_overlap_matrix",
    # late round-3 additions: recursive-CTE-parity closure (pointer
    # doubling), the full window-function surface in one plan, and the
    # data-dependent auto_date_histogram
    "hierarchy_subtree_rollup",
    "window_function_matrix",
    "auto_date_histogram",
    # in-row HOF-heavy FineWeb repetition signal + the bucketed
    # co-located join (layout write + exchange-free SMJ)
    "dup_ngram_char_frac",
    "bucketed_orders_join",
    # ES-tail round-3 additions: market-basket frequent pairs
    # (Apriori prune + in-row pair expansion), trailing-window exact
    # moving percentiles over the daily histogram, and the
    # dynamic-partition-pruned quarter rollup (includes the
    # month-partitioned store build on first run)
    "frequent_item_sets_orders",
    "moving_percentiles_daily",
    "dpp_quarter_revenue",
    # ES-relations / training-data / ML-primitive additions: parent-
    # child join-field query, fixed-sample LSH recall harness, exact
    # fixed-point logistic gradient (one full-batch GD round)
    "has_child_orders",
    "lsh_recall_eval",
    "logreg_gradient_embeddings",
    # the full _search composition (query DSL + aggs DSL in one plan)
    "es_search_request",
    # round-4 additions: the JVM-vs-Arrow protobuf decode parity, the
    # single-exchange cross-batch span index, and the widened _search
    # interpreter — per-level pipeline aggs in a request body,
    # composite pagination, JLH significant_terms, and the brute
    # cosine knn section (the indexed variants are benched above)
    "protobuf_jvm_roundtrip",
    "span_index_batches",
    "es_search_request_pipeline",
    "es_search_composite_page",
    "es_search_significant_terms",
    "es_search_knn",
    # round-5 additions: the two-section hits+aggs response, hybrid
    # knn+query scoring, terms paging with shard-simulated error
    # bounds, the metric batch (boxplot/MAD/top_metrics/rate/
    # rare_terms/bounds), nested agg + runtime fields, and the ingest
    # processor wave (user_agent/fingerprint/script/urldecode)
    "es_search_hits_and_aggs",
    "es_search_knn_hybrid",
    "es_search_terms_paging",
    "es_search_aggs_round5",
    "es_search_nested_agg",
    "ingest_processors_round5",
    # round-6 additions: the Kibana search-bar Lucene syntax (parsed,
    # lowered, scored), scored constant leaves + explicit
    # minimum_should_match, join-field queries through the body
    # (agg-before-join semi-joins), sampler/reverse_nested request
    # aggs, index-free more_like_this, and the scroll/PIT export
    "es_search_query_string",
    "es_search_min_should_match",
    "es_search_has_child_body",
    "es_search_sampler_body",
    "es_search_more_like_this_body",
    "es_scroll_pit_export",
    # round-7 additions: search-as-you-type (phrase/bool prefix),
    # rank_feature static-signal scoring, the intervals proximity
    # query, and the sliced parallel scroll export
    "es_search_phrase_prefix",
    "es_search_rank_feature",
    "es_search_intervals",
    "es_scroll_sliced_export",
    # round-8 additions: the Kibana Discover ES|QL date histogram
    # (BUCKET grouping) and the ES 8.18 LOOKUP JOIN command — the two
    # pipe shapes a Discover user runs all day
    "esql_date_histogram",
    "esql_lookup_join_stats",
    # round-9 additions: the ES|QL full-text WHERE bridge (MATCH
    # lowered through the query-DSL compiler — how Kibana 8.17+
    # text-filters every ES|QL data view) and the pinned-NOW time-
    # picker range
    "esql_match_function",
    "esql_now_range",
    # the TS command's metric rollup (rate per series per bucket,
    # summed across series) and KNN() vector retrieval in WHERE —
    # the two 8.19 shapes a metrics/RAG user runs all day
    "esql_ts_rate",
    "esql_knn_function",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from cga_kinesis_to_elasticsearch_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = mod.queries()
    # JVM/codegen warmup so the timed runs measure steady-state
    # execution, not first-query session setup: one scan-agg shape at
    # the bench SF, plus the full pipeline at the smallest SF — the
    # envelope-synthesis + grok expression tree costs several seconds
    # of one-time whole-stage-codegen compilation, which is session
    # setup, not per-query work. Warmup/timing failures never kill the
    # run: one broken query must not zero out the whole artifact (the
    # round-1 bench died rc=1 with no JSON line at all).
    try:
        qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception:
        pass
    warm_sf = "/root/testdata/sf0.001"
    if Path(warm_sf).exists():
        for name in HEADLINE:
            try:
                qs[name](spark, warm_sf).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:
                pass

    # BEST-OF-2 per query: this sandbox shows up to ~1.45x machine
    # spread between back-to-back identical runs (measured round 6),
    # so a single sample per query makes round-over-round comparisons
    # cry wolf. Two timed runs per query inside one process, min wins
    # (the run closest to the plan's true cost); both totals reported.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = qs[name]
        samples: list[float] = []
        # job group per query: lets the executor-time attribution below
        # (REST /jobs -> stageIds -> /stages executorRunTime) split each
        # query's wall seconds into distributed compute vs driver/
        # scheduling floor — the r09 verdict's "overhead-bound vs
        # compute-bound" signal that wall time at sf0.1 cannot carry
        spark.sparkContext.setJobGroup(f"bench:{name}", name)
        for _ in range(max(runs, 1)):
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:  # noqa: BLE001 - record, keep going
                errors[name] = f"{type(exc).__name__}: {exc}"[:200]
                samples = []
                break
            samples.append(round(time.perf_counter() - t0, 3))
        if samples:
            all_runs[name] = samples
            timings[name] = min(samples)
    spark.sparkContext.setJobGroup("bench:tail", "post-queries")

    # Executor-time attribution (best-effort; the bench result never
    # depends on it): sum executorRunTime over each query group's
    # stages. exec_sec covers ALL `runs` timed runs of a query (the
    # warmup ran under no group), so compare exec_sec / runs to the
    # per-run wall seconds: a query with exec/runs << wall is driver/
    # scheduling-floor-bound and its wall time will not improve with
    # cores or plan work. Caveats: jobs submitted from a query's OWN
    # driver threads (scroll slices, streaming foreachBatch, threaded
    # layout builds) don't inherit the thread-local group and are
    # undercounted; stages shared via exchange reuse may double-count.
    # Diagnostic evidence, not a timing source.
    exec_sec: dict[str, float] = {}
    try:
        import urllib.request

        ui = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId

        def _get(path: str):
            with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}", timeout=10) as r:
                return json.loads(r.read().decode())

        stage_ms: dict[int, int] = {}
        for st in _get("/stages?status=complete"):
            stage_ms[st["stageId"]] = st.get("executorRunTime", 0)
        for job in _get("/jobs"):
            grp = job.get("jobGroup") or ""
            if not grp.startswith("bench:"):
                continue
            qname = grp[len("bench:"):]
            if qname not in timings:
                continue
            ms = sum(stage_ms.get(sid, 0) for sid in job.get("stageIds", []))
            exec_sec[qname] = round(exec_sec.get(qname, 0.0) + ms / 1000.0, 3)
    except Exception:  # noqa: BLE001 - attribution is optional evidence
        exec_sec = {}

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs": runs,
        "best": "min-of-runs per query",
        "all_runs": all_runs,
    }
    if exec_sec:
        payload["exec_sec_all_runs"] = exec_sec
    if errors:
        payload["errors"] = errors
    # Per-query results as ONE SHORT LINE EACH (not a single giant JSON
    # line): the recording harness tail-captures a bounded character
    # window, and round 8/9's full payload line outgrew it and arrived
    # truncated mid-JSON — per-query evidence was lost (PERF_r09
    # per_query came back empty). Short lines survive the tail intact.
    for name in HEADLINE:
        if name in timings:
            print(json.dumps({"q": name, "best": timings[name], "all": all_runs[name]}))
        elif name in errors:
            print(json.dumps({"q": name, "error": errors[name]}))
    # … and the full payload to files for diffing: BENCH_local.json
    # (gitignored scratch, kept for compatibility) and
    # BENCH_perquery.json (committed each round — durable
    # round-over-round per-query evidence independent of stdout capture)
    full = json.dumps(payload)
    try:
        (REPO / "BENCH_local.json").write_text(full + "\n")
        (REPO / "BENCH_perquery.json").write_text(full + "\n")
    except OSError:
        pass
    # the compact line LAST: the recording harness tail-captures a
    # bounded window and parses the final line, so this one must stay
    # small (≤200 bytes) no matter how many queries the suite grows
    compact = {
        "metric": payload["metric"],
        "value": total,
        "unit": "sec",
        "sf": sf,
        "runs": runs,
        "n_queries": len(timings),
        "n_errors": len(errors),
    }
    print(json.dumps(compact))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
