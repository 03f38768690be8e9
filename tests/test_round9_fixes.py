"""Round-9 fixes: the dissect ``%{+key/n}`` append-order ordinal and
``_explain``'s recursive nested-bool decomposition (plus its
malformed-clause loudness)."""

from __future__ import annotations

import pytest

from cga_kinesis_to_elasticsearch_spark.operators.esapi import run_explain
from cga_kinesis_to_elasticsearch_spark.operators.ingest import (
    apply_ingest_pipeline,
)
from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
    run_search_body,
)


class TestDissectAppendOrdinal:
    def _run(self, spark, pattern, value, sep=" "):
        df = spark.createDataFrame([(value,)], "msg string")
        return apply_ingest_pipeline(
            df,
            [{"dissect": {
                "field": "msg", "pattern": pattern,
                "append_separator": sep,
            }}],
        ).first()

    def test_ordinals_reorder_the_append(self, spark):
        # the ES docs' own shape: captures ordered by /n, not by
        # pattern position
        r = self._run(
            spark,
            "%{+name/2} %{+name/4} %{+name/3} %{+name/1}",
            "john jacob jingleheimer schmidt",
        )
        assert r.name == "schmidt john jingleheimer jacob"

    def test_plain_append_keeps_pattern_order(self, spark):
        r = self._run(spark, "%{+name} %{+name}", "a b")
        assert r.name == "a b"

    def test_ordinal_on_non_append_key_rejected(self, spark):
        with pytest.raises(ValueError, match="append-order"):
            self._run(spark, "%{key/2} %{rest}", "a b")

    def test_mixed_ordinal_and_plain_rejected(self, spark):
        with pytest.raises(ValueError, match="mixes"):
            self._run(spark, "%{+name/1} %{+name}", "a b")

    def test_duplicate_ordinal_rejected(self, spark):
        with pytest.raises(ValueError, match="repeats"):
            self._run(spark, "%{+name/1} %{+name/1}", "a b")

    def test_no_silent_slash_column(self, spark):
        # the old behavior created a literal 'key/2' column; the
        # output column must be the bare key
        r = self._run(spark, "%{+k/2}-%{+k/1}", "b-a", sep=",")
        assert r.k == "a,b"
        assert not any("/" in f for f in r.asDict())


def _docs(spark):
    return spark.createDataFrame(
        [
            (0, "scan merge scan window", "en", 22),
            (1, "merge sort batch", "de", 16),
            (2, "window group filter", "en", 19),
            (3, "scan", "fr", 4),
        ],
        "doc_id long, text string, lang string, n_chars long",
    )


_NESTED = {
    "query": {
        "bool": {
            "must": [
                {"match": {"text": "scan"}},
                {"bool": {"should": [
                    {"match": {"text": "merge"}},
                    {"term": {"lang": {"value": "en", "boost": 2.5}}},
                ]}},
            ],
            "filter": [{"bool": {"must": [
                {"range": {"n_chars": {"gte": 5}}},
            ]}}],
        }
    }
}


class TestExplainNestedBool:
    def test_two_level_labels_present(self, spark):
        rows = run_explain(_docs(spark), 0, _NESTED).collect()
        labels = {r.clause for r in rows}
        assert {
            "must[0]:match", "must[1]:bool",
            "must[1].should[0]:match", "must[1].should[1]:term",
            "filter[0]:bool", "filter[0].must[0]:range",
            "total",
        } == labels

    def test_depth1_rows_sum_to_total(self, spark):
        by = {
            r.clause: r
            for r in run_explain(_docs(spark), 0, _NESTED).collect()
        }
        total = by["total"]
        assert total.matched
        assert total.value == pytest.approx(
            by["must[0]:match"].value + by["must[1]:bool"].value,
            rel=1e-12,
        )

    def test_nested_bool_row_equals_sum_of_children(self, spark):
        by = {
            r.clause: r
            for r in run_explain(_docs(spark), 0, _NESTED).collect()
        }
        assert by["must[1]:bool"].value == pytest.approx(
            by["must[1].should[0]:match"].value
            + by["must[1].should[1]:term"].value,
            rel=1e-12,
        )
        # descendants of filter context never score
        assert by["filter[0]:bool"].value == 0.0
        assert by["filter[0].must[0]:range"].value == 0.0
        assert by["filter[0].must[0]:range"].matched

    def test_total_still_equals_search_score(self, spark):
        df = _docs(spark)
        by = {r.clause: r for r in run_explain(df, 0, _NESTED).collect()}
        hits = run_search_body(df, {**_NESTED, "size": 10}).collect()
        scores = {r.doc_id: r._score for r in hits}
        assert scores[0] == pytest.approx(by["total"].value, rel=1e-12)

    def test_malformed_subclause_is_loud(self, spark):
        bad = {"query": {"bool": {"must": [
            {"match": {"text": "scan"}, "term": {"lang": "en"}},
        ]}}}
        with pytest.raises(ValueError, match="single-clause"):
            run_explain(_docs(spark), 0, bad)

    def test_non_dict_subclause_is_loud(self, spark):
        bad = {"query": {"bool": {"must": ["match"]}}}
        with pytest.raises(ValueError, match="single-clause"):
            run_explain(_docs(spark), 0, bad)


class TestLinearRetriever:
    def _frame(self, spark):
        return spark.createDataFrame(
            [(1, "merge sort beats bubble sort", [1.0, 0.0]),
             (2, "vector scan with filters", [0.9, 0.1]),
             (3, "hash merge scan pipeline", [0.0, 1.0]),
             (4, "scan scan scan", [0.5, 0.5])],
            "doc_id long, body string, emb array<float>",
        )

    def _body(self, wq=2.0, wk=1.0, nq="minmax", nk="minmax"):
        return {
            "retriever": {"linear": {
                "retrievers": [
                    {"retriever": {"standard": {"query": {
                        "match": {"body": "merge scan"}}}},
                     "weight": wq, "normalizer": nq},
                    {"retriever": {"knn": {"field": "emb",
                        "query_vector": [1.0, 0.0], "k": 3}},
                     "weight": wk, "normalizer": nk},
                ],
                "rank_window_size": 4,
            }},
            "size": 4,
        }

    def test_minmax_weighted_sum(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        hits = run_search_body(self._frame(spark), self._body()).collect()
        got = {r.doc_id: r._score for r in hits}
        # doc 3 is the best BM25 hit -> minmax 1.0 * weight 2; its
        # knn cosine is the window minimum -> 0
        assert got[3] == pytest.approx(2.0)
        # every score is a weighted sum in [0, wq + wk]
        assert all(0.0 <= s <= 3.0 + 1e-9 for s in got.values())

    def test_none_normalizer_keeps_raw(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        hits = run_search_body(
            self._frame(spark),
            self._body(wq=0.0, wk=1.0, nq="none", nk="none"),
        ).collect()
        got = {r.doc_id: r._score for r in hits}
        # knn raw score is (1 + cos)/2: the aligned vector scores 1.0
        assert got[1] == pytest.approx(1.0)

    def test_bad_normalizer_loud(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        body = self._body(nk="l2_norm")
        with pytest.raises(ValueError, match="normalizer"):
            run_search_body(self._frame(spark), body).collect()

    def test_linear_needs_standard_and_knn(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        body = {"retriever": {"linear": {"retrievers": [
            {"retriever": {"standard": {"query": {"match_all": {}}}}},
        ]}}, "size": 2}
        with pytest.raises(ValueError, match="one standard"):
            run_search_body(self._frame(spark), body)
