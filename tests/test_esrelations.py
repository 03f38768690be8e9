"""Semantics tests for the ES relational-query parity batch
(plans/esrelations.py): has_child/has_parent join-field queries,
rescore windowing, scripted_metric algebra, global/missing buckets,
and _termvectors statistics."""

from __future__ import annotations

from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.plans import QUERY_REGISTRY


def _run(name, spark, sf_dir):
    return QUERY_REGISTRY[name][0](spark, sf_dir)


class TestHasChildParent:
    def test_has_child_scores_count_matching_children(self, spark, sf_dir):
        rows = _run("has_child_orders", spark, sf_dir).collect()
        assert rows and all(r.child_hits >= 1 for r in rows)
        # top-20, sorted by score then key
        scores = [(-(r.child_hits), r.o_orderkey) for r in rows]
        assert scores == sorted(scores)
        assert len(rows) <= 20

    def test_has_child_parent_verified_against_manual_join(
        self, spark, sf_dir
    ):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        manual = (
            li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 45))
            .groupBy("l_orderkey")
            .count()
        )
        want = {r.l_orderkey: r["count"] for r in manual.collect()}
        for r in _run("has_child_orders", spark, sf_dir).collect():
            assert want[r.o_orderkey] == r.child_hits

    def test_has_parent_only_urgent_parents_counted(self, spark, sf_dir):
        out = _run("has_parent_lineitems", spark, sf_dir).collect()
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
        n_expected = li.join(
            urgent.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
        ).count()
        assert sum(r.n_items for r in out) == n_expected


class TestRescore:
    def test_rescore_only_reorders_within_primary_window(
        self, spark, sf_dir
    ):
        # every final hit must be inside the primary top-50 by value:
        # rescore re-ranks the window, it can never promote a doc from
        # outside it (the ES contract)
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        primary = (
            ev.select(
                "event_id",
                F.round(F.col("value") * 100).cast("long").alias("vc"),
            )
            .orderBy(F.desc("vc"), F.asc("event_id"))
            .limit(50)
        )
        window_ids = {r.event_id for r in primary.collect()}
        out = _run("rescore_topk_events", spark, sf_dir).collect()
        assert len(out) == 10
        assert all(r.event_id in window_ids for r in out)

    def test_combined_score_formula(self, spark, sf_dir):
        for r in _run("rescore_topk_events", spark, sf_dir).collect():
            assert r.combined == 5 * r.value_cents + 2 * r.bonus
            assert 0 <= r.bonus <= 86400


class TestScriptedMetric:
    def test_reduce_phases_agree_with_per_row_script(self, spark, sf_dir):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
            "l_extendedprice"
        ) * F.col("l_tax")
        manual = {
            r.l_returnflag: r
            for r in li.select("l_returnflag", profit.alias("p"))
            .groupBy("l_returnflag")
            .agg(
                F.round(F.sum("p"), 2).alias("s"),
                F.round(F.max("p"), 2).alias("mx"),
            )
            .collect()
        }
        for r in _run("scripted_metric_profit", spark, sf_dir).collect():
            assert r.total_profit == manual[r.l_returnflag].s
            assert r.best_item == manual[r.l_returnflag].mx
            assert r.worst_item <= r.best_item


class TestGlobalMissing:
    def test_global_bucket_ignores_search_context(self, spark, sf_dir):
        rows = _run("global_missing_aggs", spark, sf_dir).collect()
        by_bucket = {r.bucket: r for r in rows}
        g = by_bucket.pop("_global_")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        assert g.n_docs == docs.count()  # unscoped
        # context buckets are scoped: their total can never exceed global
        assert sum(r.n_docs for r in by_bucket.values()) <= g.n_docs
        assert all(0 <= r.n_missing <= r.n_docs for r in rows)


class TestTermvectors:
    def test_positions_and_freqs_consistent(self, spark, sf_dir):
        rows = _run("termvectors_docs", spark, sf_dir).collect()
        assert rows
        for r in rows:
            pos = [int(p) for p in r.positions.split(",")]
            assert len(pos) == r.term_freq
            assert pos == sorted(pos) and pos[0] >= 1
            # in-doc freq can never exceed the corpus-wide total, and
            # a term seen in this doc is seen in >= 1 doc
            assert r.term_freq <= r.ttf and r.doc_freq >= 1

    def test_term_freq_matches_recount(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
            F.col("doc_id") < 5
        )
        texts = {r.doc_id: r.text for r in docs.collect()}
        rows = _run("termvectors_docs", spark, sf_dir).collect()
        for r in rows:
            toks = [t for t in texts[r.doc_id].split() if t]
            assert toks.count(r.term) == r.term_freq
