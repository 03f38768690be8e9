"""Query-DSL compiler semantics (operators/querydsl.py): every leaf,
bool composition, minimum_should_match defaults, plan-time
validation, and predicate pushdown."""

from __future__ import annotations

import pytest

from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
    apply_query,
    compile_query,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma", "src1", 10, "en"),
            (2, "beta delta", "src2", 20, "de"),
            (3, "alpha   beta", "src10", 30, None),
            (4, "zeta", "other", 40, "en"),
            (5, None, "src1", 50, "fr"),
        ],
        "id long, text string, source string, n long, lang string",
    )


def _ids(spark, dsl):
    return sorted(r.id for r in apply_query(_df(spark), dsl).collect())


class TestLeaves:
    def test_term_terms_range_exists(self, spark):
        assert _ids(spark, {"term": {"lang": "en"}}) == [1, 4]
        assert _ids(spark, {"terms": {"lang": ["en", "de"]}}) == [1, 2, 4]
        assert _ids(spark, {"range": {"n": {"gte": 20, "lt": 50}}}) == [
            2,
            3,
            4,
        ]
        assert _ids(spark, {"exists": {"field": "lang"}}) == [1, 2, 4, 5]

    def test_prefix_wildcard(self, spark):
        assert _ids(spark, {"prefix": {"source": "src1"}}) == [1, 3, 5]
        assert _ids(spark, {"wildcard": {"source": "src?"}}) == [1, 2, 5]
        assert _ids(spark, {"wildcard": {"source": "*the*"}}) == [4]

    def test_match_or_and(self, spark):
        assert _ids(spark, {"match": {"text": "alpha delta"}}) == [1, 2, 3]
        assert _ids(
            spark,
            {"match": {"text": {"query": "alpha beta", "operator": "and"}}},
        ) == [1, 3]

    def test_match_phrase_requires_adjacency(self, spark):
        # doc 1 has 'alpha beta' adjacent; doc 3 too (multi-space
        # collapses under the whitespace analyzer); 'alpha gamma' is
        # never adjacent even though both tokens occur in doc 1
        assert _ids(spark, {"match_phrase": {"text": "alpha beta"}}) == [
            1,
            3,
        ]
        assert _ids(spark, {"match_phrase": {"text": "alpha gamma"}}) == []

    def test_match_all(self, spark):
        assert _ids(spark, {"match_all": {}}) == [1, 2, 3, 4, 5]


class TestBool:
    def test_must_not_and_should_msm_default_with_must(self, spark):
        # with a must present, should is optional (msm defaults to 0)
        dsl = {
            "bool": {
                "must": [{"range": {"n": {"lte": 30}}}],
                "must_not": [{"term": {"lang": "de"}}],
                "should": [{"term": {"source": "src1"}}],
            }
        }
        # doc3 (lang NULL): the term query does NOT match a missing
        # field, so must_not PASSES it — ES match semantics (a plain
        # SQL NOT would three-valued-logic it out; caught by the
        # property test in test_property_round3.py)
        assert _ids(spark, dsl) == [1, 3]

    def test_should_msm_default_without_must(self, spark):
        # bare should: at least one clause must match (msm default 1)
        dsl = {
            "bool": {
                "should": [
                    {"term": {"lang": "de"}},
                    {"prefix": {"source": "other"}},
                ]
            }
        }
        assert _ids(spark, dsl) == [2, 4]

    def test_minimum_should_match_counts(self, spark):
        dsl = {
            "bool": {
                "should": [
                    {"match": {"text": "beta"}},
                    {"range": {"n": {"lte": 20}}},
                    {"term": {"lang": "en"}},
                ],
                "minimum_should_match": 2,
            }
        }
        # doc1: beta+lte20(no:10<=20 yes)+en -> 3; doc2: beta+20 -> 2;
        # doc3: beta only (n=30, lang null) -> 1; doc4: en only -> 1
        assert _ids(spark, dsl) == [1, 2]

    def test_validation_fails_at_plan_time(self, spark):
        with pytest.raises(ValueError, match="unsupported query clause"):
            compile_query({"fuzzy_rescore": {}})
        with pytest.raises(ValueError, match="unsupported clauses"):
            compile_query({"bool": {"boost": 2}})
        with pytest.raises(ValueError, match="exactly one root"):
            compile_query({"term": {"a": 1}, "range": {"b": {}}})
        with pytest.raises(ValueError, match="unsupported bound"):
            compile_query({"range": {"n": {"between": [1, 2]}}})

    def test_range_pushes_to_scan(self, spark, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("qdsl") / "docs")
        _df(spark).write.parquet(d)
        out = apply_query(
            spark.read.parquet(d),
            {"bool": {"must": [{"range": {"n": {"gte": 20}}}]}},
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [IsNotNull(n), GreaterThanOrEqual(n,20" in plan


class TestSearchBody:
    def test_query_plus_aggs_composition(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        out = {
            r.by_lang: r.doc_count
            for r in run_search_body(
                _df(spark),
                {
                    "query": {"range": {"n": {"lte": 30}}},
                    "aggs": {"by_lang": {"terms": {"field": "lang"}}},
                },
            ).collect()
        }
        # aggs run over the FILTERED set (ids 1,2,3); the null-lang doc
        # is OMITTED from the terms buckets like ES (no missing param)
        assert out == {"en": 1, "de": 1}

    def test_hits_with_sort_size_source(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        rows = run_search_body(
            _df(spark),
            {
                "query": {"exists": {"field": "lang"}},
                "sort": [{"n": {"order": "desc"}}],
                "size": 2,
                "_source": ["id", "n"],
            },
        ).collect()
        assert [(r.id, r.n) for r in rows] == [(5, 50), (4, 40)]
        assert set(rows[0].asDict()) == {"id", "n"}


class TestScoring:
    def test_match_bm25_score_order(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )
        import math

        rows = run_search_body(
            _df(spark),
            {
                "query": {"match": {"text": "alpha beta"}},
                "sort": [{"_score": {"order": "desc"}}],
                "size": 3,
                "_source": ["id"],
            },
        ).collect()
        # docs 1,2,3 match; 2 contains only "beta" -> lowest score;
        # 3 ("alpha beta", dl=2) outranks 1 ("alpha beta gamma", dl=3)
        assert [r.id for r in rows] == [3, 1, 2]
        # replay the Lucene practical formula for doc 3 (tf=1 both
        # terms, dl=2). Field statistics count docs WITH the field:
        # docs 1-4 (doc 5 has null text), total_len=3+2+2+1
        n_docs, total_len = 4, 8
        avgdl = total_len / n_docs
        k1, b = 1.2, 0.75

        def contrib(df_t, tf, dl):
            idf = math.log(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
            return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))

        expected = contrib(2, 1, 2) + contrib(3, 1, 2)
        got = rows[0]._score
        assert abs(got - expected) < 1e-9

    def test_default_sort_is_score(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        rows = run_search_body(
            _df(spark),
            {"query": {"match": {"text": "alpha beta"}}, "size": 2},
        ).collect()
        assert [r.id for r in rows] == [3, 1]

    def test_function_score_decay(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        rows = run_search_body(
            _df(spark),
            {
                "query": {
                    "function_score": {
                        "query": {"exists": {"field": "text"}},
                        "functions": [
                            {
                                "gauss": {
                                    "n": {
                                        "origin": 10,
                                        "scale": 20,
                                        "decay": 0.5,
                                    }
                                },
                                "weight": 2.0,
                            }
                        ],
                    }
                },
                "size": 4,
                "_source": ["id"],
            },
        ).collect()
        # distance from n=10: doc1=0 -> 2.0; doc2=10 -> 2*0.5^0.25;
        # doc3=20 (== scale) -> 2*decay = 1.0; doc4=30 -> 2*0.5^2.25
        assert [r.id for r in rows] == [1, 2, 3, 4]
        assert abs(rows[0]._score - 2.0) < 1e-9
        assert abs(rows[1]._score - 2 * 0.5**0.25) < 1e-9
        assert abs(rows[2]._score - 1.0) < 1e-9

    def test_doc_tiebreak_deterministic(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        # lang 'en' ties for docs 1 and 4: the id tie-break must pick 1
        rows = run_search_body(
            _df(spark),
            {
                "query": {"exists": {"field": "lang"}},
                "sort": [{"lang": {"order": "asc"}}],
                "size": 2,
                "_source": ["id", "lang"],
            },
        ).collect()
        assert [(r.id, r.lang) for r in rows] == [(2, "de"), (1, "en")]

    def test_score_with_unscorable_query_fails_nothing(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        # filter-context query + _score sort: constant score, tiebreak
        # by id keeps the hit set deterministic
        rows = run_search_body(
            _df(spark),
            {
                "query": {"term": {"source": "src1"}},
                "size": 1,
                "_source": ["id"],
            },
        ).collect()
        assert [r.id for r in rows] == [1]


class TestNewLeaves:
    """Round-4 leaves: ids / regexp / fuzzy / terms_set and the
    compound constant_score / dis_max / multi_match."""

    def test_ids_uses_identity_column(self, spark):
        # _df has "id" as its identity column (no doc_id)
        assert _ids(spark, {"ids": {"values": [2, 4, 99]}}) == [2, 4]
        with pytest.raises(ValueError, match="ids"):
            compile_query({"ids": {"values": []}})

    def test_regexp_is_anchored(self, spark):
        # ES/Lucene regexp matches the WHOLE value: "src." must not
        # match "src10"
        assert _ids(spark, {"regexp": {"source": "src."}}) == [1, 2, 5]
        assert _ids(spark, {"regexp": {"source": "src.*"}}) == [
            1, 2, 3, 5,
        ]

    def test_fuzzy_levenshtein(self, spark):
        # src1 (delete) and src10 (substitute) are 1 edit from
        # "src11"; src2 is 2 edits away and must not match
        assert _ids(spark, {"fuzzy": {"source": {"value": "src11",
                                                 "fuzziness": 1}}}) == [
            1, 3, 5,
        ]
        assert _ids(spark, {"fuzzy": {"source": {"value": "other",
                                                 "fuzziness": 0}}}) == [4]
        with pytest.raises(ValueError, match="fuzziness"):
            compile_query({"fuzzy": {"source": {"value": "x",
                                                "fuzziness": 3}}})

    def test_terms_set_field_and_script(self, spark):
        # doc must contain >= n/10 of the given tokens (field-driven m)
        got = _ids(spark, {"terms_set": {"text": {
            "terms": ["alpha", "beta", "gamma"],
            "minimum_should_match_field": "id",
        }}})
        # id=1 needs 1 (has 3), id=2 needs 2 (has 1), id=3 needs 3
        # (has 2), id=4 needs 4 (has 0), id=5 text is null
        assert got == [1]
        got = _ids(spark, {"terms_set": {"text": {
            "terms": ["alpha", "beta"],
            "minimum_should_match_script": {"source": "2"},
        }}})
        assert got == [1, 3]
        with pytest.raises(ValueError, match="exactly one"):
            compile_query({"terms_set": {"text": {"terms": ["a"]}}})

    def test_constant_score_dis_max_multi_match(self, spark):
        assert _ids(spark, {"constant_score": {"filter": {
            "term": {"lang": "de"}}}}) == [2]
        assert _ids(spark, {"dis_max": {"queries": [
            {"term": {"lang": "de"}},
            {"term": {"source": "other"}},
        ]}}) == [2, 4]
        assert _ids(spark, {"multi_match": {
            "query": "delta zeta",
            "fields": ["text", "source"],
        }}) == [2, 4]

    def test_multi_match_best_fields_score(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        rows = run_search_body(
            _df(spark),
            {
                "query": {"multi_match": {"query": "delta zeta",
                                          "fields": ["text", "source"]}},
                "size": 2,
                "_source": ["id"],
            },
        ).collect()
        # both match exactly one rare term; scores > 0 and the _doc
        # tiebreak puts id=2 first on equal best-field idf profile
        assert sorted(r.id for r in rows) == [2, 4]
        assert all(r._score > 0 for r in rows)


class TestCollapse:
    def test_collapse_keeps_best_hit_per_group(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        rows = run_search_body(
            _df(spark),
            {
                "query": {"match_all": {}},
                "collapse": {"field": "lang"},
                "sort": [{"n": {"order": "desc"}}],
                "_source": ["id", "lang", "n"],
            },
        ).collect()
        # best (max n) per lang: en->4 (n=40), de->2, None->3, fr->5
        assert [(r.lang, r.id) for r in rows] == [
            ("fr", 5), ("en", 4), (None, 3), ("de", 2),
        ]

    def test_collapse_then_size(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        rows = run_search_body(
            _df(spark),
            {
                "query": {"match_all": {}},
                "collapse": {"field": "lang"},
                "sort": [{"n": {"order": "asc"}}],
                "size": 2,
                "_source": ["id"],
            },
        ).collect()
        assert [r.id for r in rows] == [1, 2]
        with pytest.raises(ValueError, match="collapse"):
            run_search_body(_df(spark), {"collapse": {}, "size": 1})


class TestPaginationHighlightKnn:
    def test_from_and_search_after_agree(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        base = {"query": {"match_all": {}}, "sort": [{"n": "asc"}],
                "_source": ["id"]}
        page2_from = run_search_body(
            _df(spark), {**base, "from": 2, "size": 2}).collect()
        page2_after = run_search_body(
            _df(spark), {**base, "search_after": [20], "size": 2}
        ).collect()
        assert [r.id for r in page2_from] == [3, 4]
        assert [r.id for r in page2_after] == [3, 4]
        with pytest.raises(ValueError, match="mutually exclusive"):
            run_search_body(_df(spark), {**base, "from": 1,
                                         "search_after": [20], "size": 1})
        with pytest.raises(ValueError, match="per sort key"):
            run_search_body(_df(spark), {**base,
                                         "search_after": [1, 2, 3],
                                         "size": 1})

    def test_search_after_tiebreak_value(self, spark):
        # docs tied on the sort key at a page boundary: one extra
        # search_after value addresses the engine's appended _doc
        # tie-break so the next page neither skips nor repeats them
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        tied = spark.createDataFrame(
            [(1, "x", 10), (2, "x", 10), (3, "x", 10), (4, "x", 20)],
            "id long, text string, n long",
        )
        base = {"query": {"match_all": {}}, "sort": [{"n": "asc"}],
                "_source": ["id"]}
        page1 = run_search_body(tied, {**base, "size": 2}).collect()
        assert [r.id for r in page1] == [1, 2]
        # resume after (n=10, id=2): ties on n must continue with 3
        page2 = run_search_body(
            tied, {**base, "search_after": [10, 2], "size": 2}
        ).collect()
        assert [r.id for r in page2] == [3, 4]

    def test_search_after_desc_direction(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        rows = run_search_body(_df(spark), {
            "query": {"match_all": {}},
            "sort": [{"n": {"order": "desc"}}],
            "search_after": [40], "size": 2, "_source": ["id"],
        }).collect()
        assert [r.id for r in rows] == [3, 2]

    def test_highlight_marks_matched_tokens(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        rows = run_search_body(_df(spark), {
            "query": {"match": {"text": "beta zeta"}},
            "sort": [{"id": "asc"}], "size": 5,
            "highlight": {"fields": {"text": {}}},
            "_source": ["id"],
        }).collect()
        got = {r.id: r.text_highlight for r in rows}
        assert got[1] == "alpha <em>beta</em> gamma"
        assert got[4] == "<em>zeta</em>"
        with pytest.raises(ValueError, match="highlight field"):
            run_search_body(_df(spark), {
                "query": {"term": {"lang": "en"}}, "size": 1,
                "sort": [{"id": "asc"}],
                "highlight": {"fields": {"text": {}}},
            })

    def test_knn_cosine_topk_with_filter(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        emb = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.7, 0.7]),
             (4, [-1.0, 0.0])],
            "vec_id long, embedding array<float>",
        )
        rows = run_search_body(emb, {
            "knn": {"field": "embedding", "query_vector": [1.0, 0.0],
                    "k": 2},
            "_source": ["vec_id"],
        }).collect()
        assert [r.vec_id for r in rows] == [1, 3]
        assert rows[0]._score == 1.0  # (1 + cos 0deg) / 2
        rows = run_search_body(emb, {
            "knn": {"field": "embedding", "query_vector": [1.0, 0.0],
                    "k": 2, "filter": {"range": {"vec_id": {"gte": 2}}}},
            "_source": ["vec_id"],
        }).collect()
        assert [r.vec_id for r in rows] == [3, 2]
        # body-level size trims the returned page to min(size, k):
        # a literal ES body with size < k must not over-return
        rows = run_search_body(emb, {
            "knn": {"field": "embedding", "query_vector": [1.0, 0.0],
                    "k": 3},
            "size": 1,
            "_source": ["vec_id"],
        }).collect()
        assert [r.vec_id for r in rows] == [1]
        # size > k still returns only the k retrieved candidates
        rows = run_search_body(emb, {
            "knn": {"field": "embedding", "query_vector": [1.0, 0.0],
                    "k": 2},
            "size": 10,
            "_source": ["vec_id"],
        }).collect()
        assert [r.vec_id for r in rows] == [1, 3]
        with pytest.raises(ValueError, match="knn composes"):
            run_search_body(emb, {"knn": {"field": "embedding",
                                          "query_vector": [1.0, 0.0],
                                          "k": 1},
                                  "aggs": {"n": {"value_count":
                                                 {"field": "vec_id"}}}})

    def test_knn_hybrid_additive_and_rrf(self, spark):
        # ES 8 hybrid: knn contributes boost*score for its top-k only,
        # query contributes 1.0 (filter context) for matching docs,
        # hit set = union of both arms
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        emb = spark.createDataFrame(
            [(1, [1.0, 0.0], "red"), (2, [0.0, 1.0], "red"),
             (3, [0.7, 0.7], "blue"), (4, [-1.0, 0.0], "red")],
            "id long, embedding array<float>, color string",
        )
        rows = run_search_body(emb, {
            "knn": {"field": "embedding", "query_vector": [1.0, 0.0],
                    "k": 2},
            "query": {"term": {"color": "red"}},
            "size": 4,
            "_source": ["id"],
        }).collect()
        # knn top-2 = {1 (1.0), 3 (~0.85)}; query matches {1, 2, 4}
        # scores: 1 -> 2.0, 3 -> ~0.85, 2/4 -> 1.0 each
        assert [r.id for r in rows] == [1, 2, 4, 3]
        assert rows[0]._score == 2.0
        # rrf fusion: 1/(1+rank) with rank_constant=1
        rows = run_search_body(emb, {
            "knn": {"field": "embedding", "query_vector": [1.0, 0.0],
                    "k": 2},
            "query": {"term": {"color": "red"}},
            "rank": {"rrf": {"rank_window_size": 4, "rank_constant": 1}},
            "size": 4,
            "_source": ["id"],
        }).collect()
        # knn arm ranks: 1,3,2,4 (window 4); query arm ranks: 1,2,4
        # doc 1: 1/2 + 1/2 = 1.0; doc 2: 1/4 + 1/3; doc 3: 1/3;
        # doc 4: 1/5 + 1/4
        assert [r.id for r in rows] == [1, 2, 4, 3]
        assert abs(rows[0]._score - 1.0) < 1e-9


class TestRescore:
    def test_rescore_window_and_weights(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        df = spark.createDataFrame(
            [(1, "alpha beta", 10.0), (2, "alpha", 20.0),
             (3, "beta beta", 5.0), (4, "alpha beta beta", 1.0),
             (5, "gamma", 50.0)],
            "id long, text string, n double",
        )
        rows = run_search_body(df, {
            "query": {"match": {"text": "alpha"}},
            "rescore": {"window_size": 2, "query": {
                "rescore_query": {"match": {"text": "beta"}},
                "query_weight": 1.0, "rescore_query_weight": 10.0}},
            "size": 2, "_source": ["id"],
        }).collect()
        # primary top-2 window is docs 1,2 (shortest alpha docs by
        # BM25 dl-normalization + _doc tiebreak); within the window
        # the beta boost flips doc 1 ahead of doc 2 and doc 4 (best
        # beta score overall) stays OUTSIDE the window, like ES
        assert [r.id for r in rows] == [1, 2]
        with pytest.raises(ValueError, match="_score-ordered"):
            run_search_body(df, {
                "query": {"match": {"text": "alpha"}},
                "sort": [{"n": "desc"}],
                "rescore": {"query": {"rescore_query": {"match_all": {}}}},
                "size": 1,
            })
        with pytest.raises(ValueError, match="rescore_query"):
            run_search_body(df, {
                "query": {"match": {"text": "alpha"}},
                "rescore": {"window_size": 2, "query": {}},
                "size": 1,
            })

    def test_rescore_keeps_hits_beyond_window(self, spark):
        # ES: hits beyond window_size keep their PRIMARY scores and
        # follow the rescored set — size > window must not shrink the
        # hit list
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        df = spark.createDataFrame(
            [(1, "alpha beta", 10.0), (2, "alpha", 20.0),
             (3, "beta beta", 5.0), (4, "alpha beta beta", 1.0),
             (5, "gamma", 50.0)],
            "id long, text string, n double",
        )
        rows = run_search_body(df, {
            "query": {"match": {"text": "alpha"}},
            "rescore": {"window_size": 2, "query": {
                "rescore_query": {"match": {"text": "beta"}},
                "query_weight": 1.0, "rescore_query_weight": 10.0}},
            "size": 3, "_source": ["id"],
        }).collect()
        # 3 alpha docs match; window re-sorts {1,2}, doc 4 follows
        # with its primary score — NOT dropped
        assert [r.id for r in rows] == [1, 2, 4]


class TestFunctionScoreModes:
    def _df(self, spark):
        return spark.createDataFrame(
            [(1, 4.0, 100.0, "red"), (2, 16.0, 200.0, "blue"),
             (3, 0.0, 300.0, "red"), (4, None, 400.0, "blue")],
            "id long, pop double, n double, color string",
        )

    def test_field_value_factor_modifiers(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        rows = run_search_body(self._df(spark), {
            "query": {"function_score": {
                "query": {"match_all": {}},
                "field_value_factor": {"field": "pop", "factor": 4.0,
                                       "modifier": "sqrt", "missing": 1.0},
            }},
            "size": 4, "_source": ["id"],
        }).collect()
        # sqrt(pop*4): 1->4, 2->8, 3->0, 4(missing 1)->2
        got = {r.id: r._score for r in rows}
        assert got == {2: 8.0, 1: 4.0, 4: 2.0, 3: 0.0}
        assert [r.id for r in rows] == [2, 1, 4, 3]

    def test_score_and_boost_modes_with_filters(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        body = {
            "query": {"function_score": {
                "query": {"match_all": {}},
                "functions": [
                    {"filter": {"term": {"color": "red"}}, "weight": 3.0},
                    {"field_value_factor": {"field": "pop",
                                            "missing": 0.0},
                     "weight": 2.0},
                    {"script_score": {
                        "script": {"source": "doc['n'].value / 100"}},
                     "filter": {"range": {"n": {"gte": 300}}}},
                ],
                "score_mode": "sum",
                "boost_mode": "sum",
                "max_boost": 20.0,
            }},
            "size": 4, "_source": ["id"],
        }
        rows = run_search_body(self._df(spark), body).collect()
        # function sums: 1: 3 + 8 = 11; 2: 32 -> capped 20;
        # 3: 3 + 0 + 3 = 6; 4: 0 + 4 = 4. boost_mode sum adds the
        # query score 1.0
        got = {r.id: r._score for r in rows}
        assert got == {1: 12.0, 2: 21.0, 3: 7.0, 4: 5.0}

    def test_min_score_and_avg_mode(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        rows = run_search_body(self._df(spark), {
            "query": {"function_score": {
                "query": {"match_all": {}},
                "functions": [
                    {"field_value_factor": {"field": "pop",
                                            "missing": 0.0},
                     "weight": 1.0},
                    {"weight": 2.0},
                ],
                "score_mode": "avg",      # weighted: (pop + 2*2)/3
                "boost_mode": "replace",
                "min_score": 2.0,
            }},
            "size": 4, "_source": ["id"],
        }).collect()
        # avg scores: 1: (4+4)/3=2.67; 2: (16+4)/3=6.67; 3: 4/3=1.33
        # (dropped); 4: (0+4)/3=1.33 (dropped)
        assert [r.id for r in rows] == [2, 1]

    def test_unknown_modes_raise(self, spark):
        import pytest
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        with pytest.raises(ValueError, match="score_mode"):
            run_search_body(self._df(spark), {
                "query": {"function_score": {
                    "functions": [{"weight": 2.0}],
                    "score_mode": "median"}},
                "size": 1,
            })
        with pytest.raises(ValueError, match="boost_mode"):
            run_search_body(self._df(spark), {
                "query": {"function_score": {
                    "functions": [{"weight": 2.0}],
                    "boost_mode": "xor"}},
                "size": 1,
            })


class TestHitsAndAggs:
    def test_two_section_union(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        df = spark.createDataFrame(
            [(1, "red", 10.0), (2, "red", 20.0), (3, "blue", 30.0),
             (4, "blue", 40.0), (5, "green", 0.0)],
            "id long, color string, n double",
        )
        out = run_search_body(df, {
            "query": {"range": {"n": {"gt": 5.0}}},
            "sort": [{"n": "desc"}],
            "size": 2,
            "_source": ["id", "n"],
            "aggs": {"per_color": {"terms": {"field": "color"},
                     "aggs": {"total": {"sum": {"field": "n"}}}}},
        })
        rows = out.collect()
        hits = sorted(
            [r for r in rows if r.section == "hits"],
            key=lambda r: r.hit_rank,
        )
        aggs = {r.per_color: (r.doc_count, r.total)
                for r in rows if r.section == "aggs"}
        assert [(r.hit_rank, r.id, r.n) for r in hits] == [
            (1, 4, 40.0), (2, 3, 30.0)]
        # aggs run over the FULL query-filtered set, not the hit page
        assert aggs == {"red": (2, 30.0), "blue": (2, 70.0)}
        # each side's columns are NULL on the other side's rows
        assert all(r.per_color is None for r in hits)
        assert all(r.hit_rank is None and r.id is None
                   for r in rows if r.section == "aggs")


class TestSuggest:
    def test_term_suggester_missing_mode(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        df = spark.createDataFrame(
            [(1, "spark scan merge"), (2, "spark sort merge"),
             (3, "spark spark scan")],
            "id long, text string",
        )
        rows = run_search_body(df, {"suggest": {"fix": {
            "text": "spark scann mergs",
            "term": {"field": "text", "size": 3},
        }}}).collect()
        got = {(r.token, r.suggestion): (r.freq, r.distance) for r in rows}
        # "spark" is IN the vocabulary -> no suggestions for it
        # (suggest_mode=missing, ES default)
        assert got == {("scann", "scan"): (2, 1),
                       ("mergs", "merge"): (2, 1)}
        with pytest.raises(ValueError, match="suggest-only"):
            run_search_body(df, {
                "query": {"match_all": {}},
                "suggest": {"s": {"text": "x",
                                  "term": {"field": "text"}}},
            })
        with pytest.raises(ValueError, match="max_edits"):
            run_search_body(df, {"suggest": {"s": {
                "text": "zz", "term": {"field": "text",
                                       "max_edits": 3}}}})


class TestScriptScore:
    def test_doc_field_arithmetic(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        rows = run_search_body(_df(spark), {
            "query": {"script_score": {
                "query": {"exists": {"field": "lang"}},
                "script": {"source": "doc['n'].value * 2 + 1"},
            }},
            "size": 2, "_source": ["id"],
        }).collect()
        # matched docs 1,2,4,5; score = 2n+1 -> top: id5 (101), id4 (81)
        assert [(r.id, r._score) for r in rows] == [(5, 101), (4, 81)]
        with pytest.raises(ValueError, match="_score"):
            run_search_body(_df(spark), {
                "query": {"script_score": {
                    "query": {"match_all": {}},
                    "script": {"source": "_score * 2"},
                }}, "size": 1})
        with pytest.raises(ValueError, match="unsupported script"):
            run_search_body(_df(spark), {
                "query": {"script_score": {
                    "query": {"match_all": {}},
                    "script": {"source": "system # bad"},
                }}, "size": 1})


class TestNestedQuery:
    def _frame(self, spark):
        return spark.createDataFrame(
            [(1, [(5, "a"), (2, "b")]), (2, [(1, "b")]), (3, []),
             (4, None)],
            "id long, items array<struct<qty:long, grade:string>>",
        )

    def test_same_element_conjunction(self, spark):
        df = self._frame(spark)
        # doc 1 has grade-b qty 2 and grade-a qty 5: the bool must
        # hold on ONE element — doc 1 matches only via (2, b);
        # requiring qty >= 3 AND grade b matches NOBODY even though
        # doc 1 has qty 5 (grade a) and grade b (qty 2): the
        # cross-element false positive nested exists to prevent
        got = sorted(r.id for r in apply_query(df, {"nested": {
            "path": "items",
            "query": {"bool": {"must": [
                {"range": {"items.qty": {"gte": 2}}},
                {"term": {"items.grade": "b"}},
            ]}}}}).collect())
        assert got == [1]
        got = sorted(r.id for r in apply_query(df, {"nested": {
            "path": "items",
            "query": {"bool": {"must": [
                {"range": {"items.qty": {"gte": 3}}},
                {"term": {"items.grade": "b"}},
            ]}}}}).collect())
        assert got == []

    def test_empty_and_null_arrays_do_not_match(self, spark):
        got = sorted(r.id for r in apply_query(self._frame(spark), {
            "nested": {"path": "items",
                       "query": {"exists": {"field": "items.qty"}}},
        }).collect())
        assert got == [1, 2]

    def test_composes_under_bool_and_validates(self, spark):
        df = self._frame(spark)
        got = sorted(r.id for r in apply_query(df, {"bool": {
            "must_not": [{"nested": {
                "path": "items",
                "query": {"term": {"items.grade": "b"}}}}],
        }}).collect())
        # docs without a matching element PASS must_not (incl. the
        # empty/null arrays)
        assert got == [3, 4]
        with pytest.raises(ValueError, match="nested needs"):
            compile_query({"nested": {"path": "items"}})


class TestGeoQueries:
    def _frame(self, spark):
        return spark.createDataFrame(
            [(1, (0, 0)), (2, (30, 40)), (3, (100, 0)), (4, (-20, 10)),
             (5, None)],
            "id long, loc struct<lat:long, lon:long>",
        )

    def test_geo_distance_planar(self, spark):
        # radius 50 from origin: d(1)=0, d(2)=50, d(3)=100, d(4)~22.4
        got = sorted(r.id for r in apply_query(self._frame(spark), {
            "geo_distance": {"distance": 50,
                             "loc": {"lat": 0, "lon": 0}},
        }).collect())
        assert got == [1, 2, 4]
        with pytest.raises(ValueError, match="positive NUMBER"):
            compile_query({"geo_distance": {"distance": "12km",
                                            "loc": {"lat": 0, "lon": 0}}})

    def test_geo_bounding_box(self, spark):
        got = sorted(r.id for r in apply_query(self._frame(spark), {
            "geo_bounding_box": {"loc": {
                "top_left": {"lat": 35, "lon": -25},
                "bottom_right": {"lat": -25, "lon": 15},
            }},
        }).collect())
        # box lat [-25, 35], lon [-25, 15]: ids 1 (0,0) and 4 (-20,10)
        assert got == [1, 4]
        # composes under bool with the null row passing must_not
        got = sorted(r.id for r in apply_query(self._frame(spark), {
            "bool": {"must_not": [{"geo_bounding_box": {"loc": {
                "top_left": {"lat": 35, "lon": -25},
                "bottom_right": {"lat": -25, "lon": 15}}}}]},
        }).collect())
        assert got == [2, 3, 5]


class TestPostFilterAndTotals:
    def _df(self, spark):
        return spark.createDataFrame(
            [(1, "red", 10.0), (2, "red", 20.0), (3, "blue", 30.0),
             (4, "blue", 40.0), (5, "green", 50.0)],
            "id long, color string, n double",
        )

    def test_post_filter_facet_pattern(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        rows = run_search_body(self._df(spark), {
            "query": {"range": {"n": {"gte": 15.0}}},
            "post_filter": {"term": {"color": "blue"}},
            "sort": [{"n": "desc"}],
            "size": 10,
            "_source": ["id"],
            "aggs": {"per_color": {"terms": {"field": "color"}}},
            "track_total_hits": True,
        }).collect()
        hits = sorted(r.id for r in rows if r.section == "hits")
        # facet counts IGNORE the clicked color filter
        facets = {r.per_color: r.doc_count
                  for r in rows if r.section == "aggs"}
        total = [r.doc_count for r in rows if r.section == "total"]
        assert hits == [3, 4]
        assert facets == {"red": 1, "blue": 2, "green": 1}
        assert total == [2]  # post-filtered hit count, not page size

    def test_body_min_score_affects_aggs(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        out = run_search_body(self._df(spark), {
            "query": {"function_score": {
                "query": {"match_all": {}},
                "field_value_factor": {"field": "n"},
                "boost_mode": "replace"}},
            "min_score": 25.0,
            "aggs": {"c": {"value_count": {"field": "id"}}},
        }).collect()[0]
        assert out.c == 3  # docs scoring < 25 excluded from aggs too

    def test_validation(self, spark):
        import pytest
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        with pytest.raises(ValueError, match="post_filter"):
            run_search_body(self._df(spark), {
                "post_filter": {"term": {"color": "red"}},
                "aggs": {"c": {"value_count": {"field": "id"}}}})
        with pytest.raises(ValueError, match="track_total_hits"):
            run_search_body(self._df(spark), {
                "track_total_hits": True, "size": 2})


class TestRuntimeAndScriptSort:
    def test_runtime_mappings_visible_everywhere(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        df = spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "id long, n double")
        rows = run_search_body(df, {
            "runtime_mappings": {"n2": {"type": "double", "script": {
                "source": "doc['n'].value * 2"}}},
            "query": {"range": {"n2": {"gte": 40.0}}},
            "sort": [{"n2": "desc"}],
            "size": 5,
            "_source": ["id", "n2"],
            "aggs": {"total2": {"sum": {"field": "n2"}}},
        }).collect()
        hits = [(r.id, r.n2) for r in rows if r.section == "hits"]
        aggs = [r.total2 for r in rows if r.section == "aggs"]
        assert sorted(hits) == [(2, 40.0), (3, 60.0)]
        assert aggs == [100.0]

    def test_script_sort(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        df = spark.createDataFrame(
            [(1, 7.0), (2, 3.0), (3, 5.0)], "id long, n double")
        rows = run_search_body(df, {
            "query": {"match_all": {}},
            "sort": [{"_script": {"type": "number", "order": "asc",
                                  "script": {
                                      "source": "doc['n'].value % 4"}}}],
            "size": 3, "_source": ["id"],
        }).collect()
        # n % 4: 1->3, 2->3, 3->1; tie between 1 and 2 breaks on id
        assert [r.id for r in rows] == [3, 1, 2]
        assert set(rows[0].asDict()) == {"id"}


class TestNestedAgg:
    def test_nested_doc_counts_and_subaggs(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        df = spark.createDataFrame(
            [(1, [("alice", 5.0), ("bob", 3.0)]),
             (2, [("alice", 1.0)]),
             (3, [])],
            "id long, comments array<struct<author string, stars double>>",
        )
        rows = apply_aggs(df, {"c": {"nested": {"path": "comments"},
            "aggs": {"per_author": {"terms":
                                    {"field": "comments.author"},
                     "aggs": {"avg_stars": {"avg":
                              {"field": "comments.stars"}}}}}}}).collect()
        top = [r for r in rows if r.agg_path == "c"]
        assert len(top) == 1 and top[0].doc_count == 3  # nested docs
        got = {r.per_author: (r.doc_count, r.avg_stars)
               for r in rows if r.agg_path == "c>per_author"}
        assert got == {"alice": (2, 3.0), "bob": (1, 3.0)}


class TestMsearch:
    def test_two_bodies_union(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_msearch,
        )

        df = spark.createDataFrame(
            [(1, "red", 10.0), (2, "blue", 20.0), (3, "red", 30.0)],
            "id long, color string, n double",
        )
        rows = run_msearch(df, [
            {"query": {"term": {"color": "red"}},
             "sort": [{"n": "desc"}], "size": 1, "_source": ["id"]},
            {"aggs": {"per_color": {"terms": {"field": "color"}}}},
        ]).collect()
        r1 = [r.id for r in rows if r.request == 1]
        r2 = {r.per_color: r.doc_count for r in rows if r.request == 2}
        assert r1 == [3]
        assert r2 == {"red": 2, "blue": 1}
        import pytest
        with pytest.raises(ValueError, match="non-empty"):
            run_msearch(df, [])


class TestBoolScoring:
    def test_must_and_should_scores_add(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        df = spark.createDataFrame(
            [(1, "alpha beta"), (2, "alpha"), (3, "alpha beta beta"),
             (4, "gamma")],
            "id long, text string",
        )
        # must match alpha (BM25), should match beta adds score only
        # where it matches; filter adds nothing
        rows = run_search_body(df, {
            "query": {"bool": {
                "must": [{"match": {"text": "alpha"}}],
                "should": [{"match": {"text": "beta"}}],
                "filter": [{"range": {"id": {"lte": 10}}}],
            }},
            "size": 3, "_source": ["id"],
        }).collect()
        # docs 1,3 get alpha+beta scores; doc 3 has higher beta tf but
        # shorter... doc 1 dl=2, doc 3 dl=3. All matches are returned;
        # doc 2 (alpha only) must rank below 1 and 3
        ids = [r.id for r in rows]
        assert set(ids) == {1, 2, 3}
        assert ids.index(2) == 2  # lowest score: no beta contribution
        scores = {r.id: r._score for r in rows}
        assert scores[1] > scores[2] and scores[3] > scores[2]

    def test_bool_without_scoring_clauses_is_constant(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        df = spark.createDataFrame([(1, 5.0), (2, 9.0)], "id long, n double")
        rows = run_search_body(df, {
            "query": {"bool": {"filter": [{"range": {"n": {"gt": 0}}}]}},
            "size": 2, "_source": ["id"],
        }).collect()
        assert all(r._score == 1.0 for r in rows)


class TestRelationQueries:
    """Round-6: has_child / has_parent / parent_id through
    run_search_body with a relations map."""

    def _frames(self, spark):
        parents = spark.createDataFrame(
            [(1, "X"), (2, "Y"), (3, "Z")], "o_key long, status string"
        )
        children = spark.createDataFrame(
            [(1, 50), (1, 60), (2, 5), (2, 70)], "c_key long, v long"
        )
        return parents, children

    def test_has_child_min_max(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        parents, children = self._frames(spark)
        rel = {"child": {"df": children, "local_key": "o_key",
                         "foreign_key": "c_key"}}
        rows = run_search_body(parents, {
            "query": {"has_child": {
                "type": "child",
                "query": {"range": {"v": {"gte": 50}}},
                "min_children": 2,
            }},
            "sort": [{"o_key": "asc"}], "size": 10,
        }, relations=rel).collect()
        assert [r.o_key for r in rows] == [1]
        rows = run_search_body(parents, {
            "query": {"has_child": {"type": "child",
                                    "query": {"match_all": {}},
                                    "max_children": 1}},
            "sort": [{"o_key": "asc"}], "size": 10,
        }, relations=rel).collect()
        assert [r.o_key for r in rows] == []  # both parents have 2

    def test_has_parent_and_parent_id(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        parents, children = self._frames(spark)
        rel = {"parent": {"df": parents, "local_key": "c_key",
                          "foreign_key": "o_key"}}
        rows = run_search_body(children, {
            "query": {"has_parent": {"parent_type": "parent",
                                     "query": {"term": {"status": "Y"}}}},
            "sort": [{"v": "asc"}], "size": 10,
        }, relations=rel).collect()
        assert [r.v for r in rows] == [5, 70]
        rows = run_search_body(children, {
            "query": {"parent_id": {"type": "parent", "id": 1}},
            "sort": [{"v": "asc"}], "size": 10,
        }, relations=rel).collect()
        assert [r.v for r in rows] == [50, 60]

    def test_plan_time_errors(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            compile_query,
            run_search_body,
        )

        parents, _ = self._frames(spark)
        with pytest.raises(ValueError, match="unknown relation"):
            run_search_body(parents, {
                "query": {"has_child": {"type": "nope",
                                        "query": {"match_all": {}}}},
                "size": 1,
            })
        with pytest.raises(ValueError, match="frame-level"):
            compile_query({"bool": {"must": [
                {"has_child": {"type": "x", "query": {"match_all": {}}}}
            ]}})


class TestMoreLikeThisBody:
    def test_mlt_selects_and_scores(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        df = spark.createDataFrame(
            [(1, "apple banana apple"), (2, "banana cherry"),
             (3, "cherry cherry"), (4, "durian")],
            "doc_id long, text string",
        )
        rows = run_search_body(df, {
            "query": {"more_like_this": {
                "fields": ["text"],
                "like": "apple apple banana",
                "min_term_freq": 1, "min_doc_freq": 1,
                "max_query_terms": 2,
                "minimum_should_match": "50%",  # of 2 -> 1
            }},
            "size": 4, "_source": ["doc_id"],
        }).collect()
        # selected terms: apple (ltf 2) and banana; docs 1,2 match
        assert sorted(r.doc_id for r in rows) == [1, 2]
        scores = {r.doc_id: r._score for r in rows}
        assert scores[1] > scores[2] > 0

    def test_mlt_validation(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            compile_query,
            run_search_body,
        )

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError, match="exactly one field"):
            run_search_body(df, {"query": {"more_like_this": {
                "fields": ["a", "b"], "like": "x"}}, "size": 1})
        with pytest.raises(ValueError, match="min_term_freq"):
            run_search_body(df, {"query": {"more_like_this": {
                "fields": ["text"], "like": "once each word",
                "min_term_freq": 2}}, "size": 1})
        with pytest.raises(ValueError, match="frame-level"):
            compile_query({"bool": {"must": [{"more_like_this": {
                "fields": ["text"], "like": "x"}}]}})


class TestDisMaxScoring:
    def test_tie_breaker_and_boost(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        df = spark.createDataFrame(
            [(1, "alpha beta"), (2, "alpha"), (3, "beta"), (4, "x")],
            "doc_id long, text string",
        )
        rows = run_search_body(df, {
            "query": {"dis_max": {
                "queries": [
                    {"match": {"text": "alpha"}},
                    {"match": {"text": "beta"}},
                ],
                "tie_breaker": 0.5,
            }},
            "size": 4, "_source": ["doc_id"],
        }).collect()
        scores = {r.doc_id: r._score for r in rows}
        assert set(scores) == {1, 2, 3}
        # doc1 matches both arms: best + 0.5*other > either single arm
        assert scores[1] > max(scores[2], scores[3])
        # boost doubles a branch's BM25
        rows = run_search_body(df, {
            "query": {"match": {"text": {"query": "alpha",
                                         "boost": 2.0}}},
            "size": 1, "_source": ["doc_id"],
        }).collect()
        base = run_search_body(df, {
            "query": {"match": {"text": "alpha"}},
            "size": 1, "_source": ["doc_id"],
        }).collect()
        assert abs(rows[0]._score - 2 * base[0]._score) < 1e-9


class TestTermsLookup:
    def test_lookup_rewrites_anywhere_in_tree(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        df = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "doc_id long, k string"
        )
        lk = spark.createDataFrame(
            [(10, ["a", "c"]), (11, [])],
            "lid long, vals array<string>",
        )
        rel = {"lk": {"df": lk, "id_col": "lid"}}
        rows = run_search_body(df, {
            "query": {"bool": {"must": [
                {"terms": {"k": {"index": "lk", "id": 10,
                                 "path": "vals"}}},
            ]}},
            "sort": [{"doc_id": "asc"}], "size": 5,
        }, relations=rel).collect()
        assert [r.doc_id for r in rows] == [1, 3]
        # empty lookup list matches nothing (ES)
        rows = run_search_body(df, {
            "query": {"terms": {"k": {"index": "lk", "id": 11,
                                      "path": "vals"}}},
            "sort": [{"doc_id": "asc"}], "size": 5,
        }, relations=rel).collect()
        assert rows == []
        # unknown index / missing doc fail at plan time
        with pytest.raises(ValueError, match="unknown index"):
            run_search_body(df, {
                "query": {"terms": {"k": {"index": "zz", "id": 1,
                                          "path": "vals"}}},
                "size": 1,
            }, relations=rel)
        with pytest.raises(ValueError, match="exactly one doc"):
            run_search_body(df, {
                "query": {"terms": {"k": {"index": "lk", "id": 99,
                                          "path": "vals"}}},
                "size": 1,
            }, relations=rel)


class TestRangeDateMath:
    def test_anchor_math_and_rounding(self, spark):
        df = spark.createDataFrame(
            [(1, "2024-01-01 05:00:00"), (2, "2024-01-03 00:00:00"),
             (3, "2024-02-10 00:00:00")],
            "id long, ts string",
        ).selectExpr("id", "CAST(ts AS TIMESTAMP) AS ts")
        got = sorted(r.id for r in apply_query(df, {"range": {"ts": {
            "gte": "2024-01-01||/d",
            "lt": "2024-01-01||/M+1M",
        }}}).collect())
        assert got == [1, 2]
        # day rounding drops the 05:00 doc when anchored after it
        got = sorted(r.id for r in apply_query(df, {"range": {"ts": {
            "gte": "2024-01-01 23:00:00||/d+1d",
        }}}).collect())
        assert got == [2, 3]

    def test_now_and_errors(self, spark):
        df = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00")], "id long, ts string"
        ).selectExpr("id", "CAST(ts AS TIMESTAMP) AS ts")
        # now-anchored math executes (everything is in the past)
        assert apply_query(
            df, {"range": {"ts": {"lte": "now-1d/d"}}}
        ).count() == 1
        assert apply_query(
            df, {"range": {"ts": {"gte": "now+1h"}}}
        ).count() == 0
        # a now-prefixed string that is NOT valid date-math grammar is
        # a literal bound, not an error — 'nowhere' must stay a plain
        # lexicographic comparison (ES applies date math to date
        # fields only; the engine has no mapping to know)
        compile_query({"range": {"v": {"gte": "now-1q"}}})  # no raise
        compile_query({"range": {"v": {"gte": "nowhere"}}})  # no raise
        with pytest.raises(ValueError, match="bad anchor"):
            compile_query({"range": {"ts": {"gte": "yesterday||/d"}}})
        # a plain string bound stays a literal comparison
        assert apply_query(
            df, {"range": {"ts": {"gte": "2023-12-31"}}}
        ).count() == 1


class TestSortMissing:
    def test_missing_last_default_and_first_override(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        df = spark.createDataFrame(
            [(1, 10), (2, None), (3, 5)], "doc_id long, n long"
        )
        rows = run_search_body(df, {
            "query": {"match_all": {}},
            "sort": [{"n": {"order": "asc"}}],
            "size": 3, "_source": ["doc_id"],
        }).collect()
        # ES: missing sorts LAST by default (Spark asc() would put the
        # NULL row first)
        assert [r.doc_id for r in rows] == [3, 1, 2]
        rows = run_search_body(df, {
            "query": {"match_all": {}},
            "sort": [{"n": {"order": "asc", "missing": "_first"}}],
            "size": 3, "_source": ["doc_id"],
        }).collect()
        assert [r.doc_id for r in rows] == [2, 3, 1]
        rows = run_search_body(df, {
            "query": {"match_all": {}},
            "sort": [{"n": {"order": "desc"}}],
            "size": 3, "_source": ["doc_id"],
        }).collect()
        assert [r.doc_id for r in rows] == [1, 3, 2]
        with pytest.raises(ValueError, match="_first/_last"):
            run_search_body(df, {
                "query": {"match_all": {}},
                "sort": [{"n": {"order": "asc", "missing": 0}}],
                "size": 1,
            })


class TestSourceFiltering:
    def test_string_wildcard_and_dict_forms(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        df = spark.createDataFrame(
            [(1, "a", "b", 9)],
            "doc_id long, user_name string, user_mail string, n long",
        )
        base = {"query": {"match_all": {}},
                "sort": [{"doc_id": "asc"}], "size": 1}
        rows = run_search_body(df, {**base, "_source": "n"}).collect()
        assert set(rows[0].asDict()) == {"n"}
        rows = run_search_body(df, {**base, "_source": ["user_*"]}).collect()
        assert set(rows[0].asDict()) == {"user_name", "user_mail"}
        rows = run_search_body(df, {**base, "_source": {
            "includes": ["user_*", "doc_id"],
            "excludes": "user_mail"}}).collect()
        assert set(rows[0].asDict()) == {"doc_id", "user_name"}
        rows = run_search_body(df, {**base, "_source": {
            "excludes": ["n"]}}).collect()
        assert set(rows[0].asDict()) == {"doc_id", "user_name",
                                         "user_mail"}
        with pytest.raises(ValueError, match="unknown columns"):
            run_search_body(df, {**base, "_source": ["zzz"]})
        with pytest.raises(ValueError, match="includes/excludes"):
            run_search_body(df, {**base, "_source": {"include": ["n"]}})


class TestGeoDistanceSort:
    def test_nearest_first_and_validation(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(1, 0, 0), (2, 10, 10), (3, 3, 4)],
            "id long, lat long, lon long",
        ).select("id", F.struct("lat", "lon").alias("loc"))
        rows = run_search_body(df, {
            "query": {"match_all": {}},
            "sort": [{"_geo_distance": {"loc": {"lat": 0, "lon": 0},
                                        "order": "asc"}}],
            "size": 3, "_source": ["id"],
        }).collect()
        assert [r.id for r in rows] == [1, 3, 2]
        assert set(rows[0].asDict()) == {"id"}  # sort col dropped
        with pytest.raises(ValueError, match="lat/lon"):
            run_search_body(df, {
                "query": {"match_all": {}},
                "sort": [{"_geo_distance": {"loc": [0, 0]}}],
                "size": 1,
            })


class TestMatchPhraseSlop:
    def test_slop_in_order_proximity(self, spark):
        df = spark.createDataFrame(
            [(1, "quick brown fox"), (2, "quick red brown fox"),
             (3, "quick a b brown"), (4, "brown quick"), (5, "quick")],
            "id long, text string",
        )
        def ids(slop):
            return sorted(r.id for r in apply_query(df, {
                "match_phrase": {"text": {"query": "quick brown",
                                          "slop": slop}}
            }).collect())
        assert ids(1) == [1, 2]
        # slop 2 buys the adjacent transposition (Lucene sloppy
        # phrase: "brown quick" matches "quick brown"~2, not ~1)
        assert ids(2) == [1, 2, 3, 4]
        assert 4 not in ids(1)
        # slop 0 via dict equals the fast containment path
        assert sorted(r.id for r in apply_query(df, {
            "match_phrase": {"text": {"query": "quick brown",
                                      "slop": 0}}}).collect()) == [1]

    def test_three_token_chain_and_repeats(self, spark):
        df = spark.createDataFrame(
            [(1, "a x b x c"), (2, "a b c"), (3, "a c b"),
             (4, "b a x x c"), (5, "a a b")],
            "id long, text string",
        )
        got = sorted(r.id for r in apply_query(df, {
            "match_phrase": {"text": {"query": "a b c", "slop": 2}}
        }).collect())
        # doc 3 "a c b": the (b,c) transposition costs the whole
        # slop-2 budget and the swapped chain is consecutive — matches
        assert got == [1, 2, 3]
        # doc 4 "b a x x c": the (a,b) swap leaves no budget for the
        # two-gap chain to c — still out at slop 2
        assert 4 not in got
        # repeated query token: 'a a' within slop
        got = sorted(r.id for r in apply_query(df, {
            "match_phrase": {"text": {"query": "a a", "slop": 0}}
        }).collect())
        assert got == [5]


class TestCombinedFields:
    def test_filter_and_scoring(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        df = spark.createDataFrame(
            [(1, "alpha beta", "gamma"), (2, "alpha", None),
             (3, "nope", "alpha alpha"), (4, "x", "y")],
            "doc_id long, title string, body string",
        )
        dsl = {"combined_fields": {
            "query": "alpha gamma", "fields": ["title", "body"]}}
        assert _j(apply_query_ids(spark, df, dsl)) == [1, 2, 3]
        dsl_and = {"combined_fields": {
            "query": "alpha gamma", "fields": ["title", "body"],
            "operator": "and"}}
        assert _j(apply_query_ids(spark, df, dsl_and)) == [1]
        rows = run_search_body(df, {
            "query": {"combined_fields": {
                "query": "alpha", "fields": ["title", "body"]}},
            "size": 3, "_source": ["doc_id"],
        }).collect()
        scores = {r.doc_id: r._score for r in rows}
        # doc3 has tf=2 in the combined stream and the shortest is...
        # doc2 combined = 'alpha ' (dl 1 after empty coalesce join):
        # all three positive; tf=2 doc ranks above same-length tf=1
        assert set(scores) == {1, 2, 3}
        assert all(v > 0 for v in scores.values())
        assert scores[3] > scores[1]
        with pytest.raises(ValueError, match="equal weights"):
            apply_query(df, {"combined_fields": {
                "query": "x", "fields": ["title^3"]}})


def apply_query_ids(spark, df, dsl):
    return [r.doc_id for r in apply_query(df, dsl).collect()]


def _j(ids):
    return sorted(ids)
