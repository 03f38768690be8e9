"""Persisted inverted text index + BM25 search (sinks/textindex.py):
index round-trip, AND semantics, BM25 ranking sanity, and the
partition-pruning contract (queries must not scan unqueried term
buckets)."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.sinks.textindex import (
    bm25_topk,
    build_text_index,
    search_and,
)

_DOCS = [
    (0, "spark merges the batch merge merge"),
    (1, "vector scan joins the spark plan"),
    (2, "merge vector spark"),
    (3, "totally unrelated words here"),
    (4, "spark spark spark merge vector vector"),
]


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("tix") / "idx"
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    build_text_index(docs, root)
    return root


class TestSearch:
    def test_and_semantics(self, spark, index):
        got = {
            r["doc_id"]: r["total_tf"]
            for r in search_and(spark, index, ["spark", "merge"]).collect()
        }
        # docs 0 (spark 1 + merge 2; "merges" is a different term),
        # 2 (1+1), 4 (3+1) contain both; 1 and 3 don't
        assert got == {0: 3, 2: 2, 4: 4}

    def test_bm25_matches_reference_formula(self, spark, index):
        k1, b = 1.2, 0.75
        terms = ["spark", "merge", "vector"]
        got = {
            r["doc_id"]: (r["n_hit_terms"], r["score"])
            for r in bm25_topk(spark, index, terms, k=10, k1=k1, b=b).collect()
        }
        # pure-Python reference over the same tokenization
        toks = {i: t.split() for i, t in _DOCS}
        dls = {i: len(t) for i, t in toks.items()}
        n_docs, total = len(toks), sum(dls.values())
        avgdl = total / n_docs
        want = {}
        for i, t in toks.items():
            tf = Counter(t)
            score, hits = 0.0, 0
            for term in sorted(terms):
                if tf[term] == 0:
                    continue
                df = sum(1 for tt in toks.values() if term in tt)
                idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                score += idf * (
                    tf[term] * (1.0 + k1)
                    / (tf[term] + k1 * (1.0 - b + b * (dls[i] / avgdl)))
                )
                hits += 1
            if hits:
                want[i] = (hits, round(score, 6))
        assert got == want
        # the triple-term heavy doc must outrank the single-hit docs
        ranked = [
            r["doc_id"]
            for r in bm25_topk(spark, index, terms, k=2, k1=k1, b=b).collect()
        ]
        assert set(ranked) <= {0, 2, 4}

    def test_unknown_term_empty(self, spark, index):
        assert search_and(spark, index, ["zzzznope"]).count() == 0


class TestPruning:
    def test_partition_filter_pins_buckets(self, spark, index):
        plan = (
            search_and(spark, index, ["spark"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        scan = [l for l in plan.splitlines() if "PartitionFilters" in l]
        assert scan and "bucket" in scan[0]
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", scan[0])
        assert m and m.group(1).strip(), "empty partition filter — no pruning"


class TestPhraseSearch:
    def test_phrase_counts(self, spark, index):
        from cga_kinesis_to_elasticsearch_spark.sinks.textindex import (
            phrase_search,
        )

        got = {
            r["doc_id"]: r["n_occurrences"]
            for r in phrase_search(spark, index, ["merge", "merge"]).collect()
        }
        # doc 0: "... merge merge" -> one consecutive pair
        assert got == {0: 1}
        got2 = {
            r["doc_id"]: r["n_occurrences"]
            for r in phrase_search(spark, index, ["spark", "spark"]).collect()
        }
        # doc 4: "spark spark spark" -> two overlapping pairs
        assert got2 == {4: 2}

    def test_three_term_phrase(self, spark, index):
        from cga_kinesis_to_elasticsearch_spark.sinks.textindex import (
            phrase_search,
        )

        got = {
            r["doc_id"]: r["n_occurrences"]
            for r in phrase_search(
                spark, index, ["spark", "spark", "spark"]
            ).collect()
        }
        assert got == {4: 1}
        # doc 2 is exactly "merge vector spark"
        got3 = {
            r["doc_id"]: r["n_occurrences"]
            for r in phrase_search(
                spark, index, ["merge", "vector", "spark"]
            ).collect()
        }
        assert got3 == {2: 1}

    def test_absent_phrase_empty(self, spark, index):
        from cga_kinesis_to_elasticsearch_spark.sinks.textindex import (
            phrase_search,
        )

        # both terms exist corpus-wide but never adjacently in doc 3
        assert phrase_search(spark, index, ["vector", "merge"]).count() == 0
