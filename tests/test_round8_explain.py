"""Round-8 ``_explain`` endpoint: per-clause score decomposition for
one document, pinned EQUAL to the ``_score`` the same query produces
through ``run_search_body`` — explain and search must never disagree."""

from __future__ import annotations

import pytest

from cga_kinesis_to_elasticsearch_spark.operators.esapi import run_explain
from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
    run_search_body,
)


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


_BODY = {
    "query": {
        "bool": {
            "must": [{"match": {"text": "scan merge"}}],
            "should": [{"term": {"lang": {"value": "en", "boost": 2.5}}}],
            "filter": [{"range": {"n_chars": {"gte": 0}}}],
        }
    }
}


class TestExplainSearchParity:
    @pytest.mark.parametrize("doc_id", [0, 1, 3])
    def test_total_equals_search_score(self, spark, doc_id):
        df = _docs(spark)
        expl = {r.clause: r for r in run_explain(df, doc_id, _BODY).collect()}
        total = expl["total"]
        hits = run_search_body(df, {**_BODY, "size": 10}).collect()
        scores = {r.doc_id: r._score for r in hits}
        if total.matched:
            assert doc_id in scores
            assert scores[doc_id] == pytest.approx(total.value, rel=1e-12)
        else:
            assert doc_id not in scores
            assert total.value == 0.0

    def test_clause_rows_sum_to_total(self, spark):
        rows = run_explain(_docs(spark), 0, _BODY).collect()
        by = {r.clause: r for r in rows}
        assert set(by) == {
            "must[0]:match", "should[0]:term", "filter[0]:range", "total"}
        assert by["filter[0]:range"].matched and by["filter[0]:range"].value == 0.0
        assert by["should[0]:term"].matched and by["should[0]:term"].value == 2.5
        assert by["must[0]:match"].value > 0
        assert by["total"].value == pytest.approx(
            by["must[0]:match"].value + by["should[0]:term"].value)

    def test_non_matching_doc_reports_false(self, spark):
        # doc 2 has neither query term: must misses -> everything 0
        by = {r.clause: r for r in run_explain(_docs(spark), 2, _BODY).collect()}
        assert not by["must[0]:match"].matched
        assert by["must[0]:match"].value == 0.0
        assert by["should[0]:term"].matched  # en — but gated by must
        assert not by["total"].matched
        assert by["total"].value == 0.0

    def test_must_not_row(self, spark):
        body = {"query": {"bool": {
            "must": [{"match": {"text": "scan"}}],
            "must_not": [{"term": {"lang": "de"}}],
        }}}
        by = {r.clause: r
              for r in run_explain(_docs(spark), 0, body).collect()}
        assert by["must_not[0]:term"].matched  # NOT de -> clause OK
        assert by["must_not[0]:term"].value == 0.0
        assert by["total"].matched

    def test_non_bool_query_single_clause(self, spark):
        body = {"query": {"match": {"text": "scan"}}}
        by = {r.clause: r
              for r in run_explain(_docs(spark), 3, body).collect()}
        assert set(by) == {"query:match", "total"}
        assert by["query:match"].value == pytest.approx(by["total"].value)
        hits = run_search_body(_docs(spark), {**body, "size": 10}).collect()
        score = {r.doc_id: r._score for r in hits}[3]
        assert score == pytest.approx(by["total"].value, rel=1e-12)

    def test_function_score_total(self, spark):
        body = {"query": {"function_score": {
            "query": {"match": {"text": "scan"}},
            "functions": [{"field_value_factor": {
                "field": "n_chars", "factor": 0.1}}],
            "boost_mode": "multiply",
        }}}
        by = {r.clause: r
              for r in run_explain(_docs(spark), 0, body).collect()}
        hits = run_search_body(_docs(spark), {**body, "size": 10}).collect()
        score = {r.doc_id: r._score for r in hits}[0]
        assert by["total"].value == pytest.approx(score, rel=1e-12)

    def test_errors(self, spark):
        df = _docs(spark)
        with pytest.raises(ValueError, match="exactly one query clause"):
            run_explain(df, 0, {"size": 3})
        with pytest.raises(ValueError, match="no identity column"):
            run_explain(df.drop("doc_id"), 0, _BODY, id_field="doc_id")


class TestRetrieverTree:
    """ES 8.14+ retriever syntax lowers onto the legacy body paths."""

    def _emb(self, spark):
        return spark.createDataFrame(
            [(i, [float(i), 1.0], i % 4) for i in range(12)],
            "vec_id long, embedding array<float>, label long",
        )

    def test_standard_retriever_matches_query_form(self, spark):
        df = self._emb(spark)
        new = run_search_body(df, {
            "retriever": {"standard": {
                "query": {"range": {"label": {"gte": 2}}},
                "filter": {"range": {"vec_id": {"lte": 7}}},
            }},
            "size": 20, "sort": [{"vec_id": "asc"}],
        }).collect()
        old = run_search_body(df, {
            "query": {"bool": {
                "must": [{"range": {"label": {"gte": 2}}}],
                "filter": [{"range": {"vec_id": {"lte": 7}}}]}},
            "size": 20, "sort": [{"vec_id": "asc"}],
        }).collect()
        assert [r.vec_id for r in new] == [r.vec_id for r in old]

    def test_knn_retriever_matches_knn_form(self, spark):
        df = self._emb(spark)
        new = run_search_body(df, {
            "retriever": {"knn": {
                "field": "embedding", "query_vector": [1.0, 0.0],
                "k": 3, "num_candidates": 99,
            }},
        }).collect()
        old = run_search_body(df, {
            "knn": {"field": "embedding", "query_vector": [1.0, 0.0],
                    "k": 3},
        }).collect()
        assert [(r.vec_id, r._score) for r in new] == [
            (r.vec_id, r._score) for r in old]

    def test_rrf_retriever_matches_legacy_hybrid(self, spark):
        df = self._emb(spark)
        new = run_search_body(df, {
            "retriever": {"rrf": {
                "retrievers": [
                    {"standard": {"query": {"range": {"label": {"gte": 1}}}}},
                    {"knn": {"field": "embedding",
                             "query_vector": [0.0, 1.0], "k": 4}},
                ],
                "rank_window_size": 6, "rank_constant": 10,
            }},
            "size": 5,
        }).collect()
        old = run_search_body(df, {
            "query": {"range": {"label": {"gte": 1}}},
            "knn": {"field": "embedding", "query_vector": [0.0, 1.0],
                    "k": 4},
            "rank": {"rrf": {"rank_window_size": 6, "rank_constant": 10}},
            "size": 5,
        }).collect()
        assert [(r.vec_id, r._score) for r in new] == [
            (r.vec_id, r._score) for r in old]

    def test_retriever_errors(self, spark):
        df = self._emb(spark)
        with pytest.raises(ValueError, match="mutually exclusive"):
            run_search_body(df, {
                "retriever": {"standard": {"query": {"match_all": {}}}},
                "query": {"match_all": {}},
            })
        # text_similarity_reranker EXECUTES since round 9 (stand-in
        # scorer) — an empty spec fails its own validation
        with pytest.raises(ValueError, match="needs retriever"):
            run_search_body(df, {
                "retriever": {"text_similarity_reranker": {}}})
        with pytest.raises(ValueError, match="unsupported type"):
            run_search_body(df, {"retriever": {"made_up_kind": {}}})
        with pytest.raises(ValueError, match="one standard \\+ one knn"):
            run_search_body(df, {
                "retriever": {"rrf": {"retrievers": [
                    {"standard": {"query": {"match_all": {}}}},
                    {"standard": {"query": {"match_all": {}}}},
                ]}}})
        with pytest.raises(ValueError, match="needs a query"):
            run_search_body(df, {"retriever": {"standard": {}}})


class TestMget:
    def test_request_order_and_found(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.esapi import (
            run_mget,
        )

        df = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
            "doc_id long, t string, n long",
        )
        out = run_mget(df, {"ids": [3, 99, 1]}).collect()
        assert [(r.pos, r.doc_id, r.found) for r in out] == [
            (1, 3, True), (2, 99, False), (3, 1, True)]
        assert out[0].t == "c" and out[1].t is None

    def test_docs_form_and_source(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.esapi import (
            run_mget,
        )

        df = spark.createDataFrame(
            [(1, "a", 10)], "doc_id long, t string, n long")
        out = run_mget(df, {
            "docs": [{"_id": 1}], "_source": ["n"],
        }).collect()
        assert out[0].n == 10 and "t" not in out[0].asDict()

    def test_errors(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.esapi import (
            run_mget,
        )

        df = spark.createDataFrame([(1,)], "doc_id long")
        import pytest as _pt
        with _pt.raises(ValueError, match="needs ids or docs"):
            run_mget(df, {})
        with _pt.raises(ValueError, match="need _id"):
            run_mget(df, {"docs": [{"id": 1}]})
