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


class TestGeoGridAggs:
    def _pts(self, spark, rows):
        from pyspark.sql import functions as F

        return spark.createDataFrame(
            rows, "id long, lat double, lon double"
        ).select(
            "id",
            F.when(
                F.col("lat").isNotNull(), F.struct("lat", "lon")
            ).alias("loc"),
        )

    def test_geohash_canonical_vector(self, spark):
        # the classic geohash test vector
        df = self._pts(spark, [(1, 57.64911, 10.40744)])
        out = run_search_body(df, {"aggs": {"gh": {
            "geohash_grid": {"field": "loc", "precision": 11},
        }}}).collect()
        assert [(r.gh, r.doc_count) for r in out] == [
            ("u4pruydqqvj", 1)
        ]

    def test_geohash_prefix_property(self, spark):
        # coarser precision = prefix of the finer key
        df = self._pts(spark, [(1, -33.8688, 151.2093)])
        keys = {}
        for p in (3, 5, 7):
            out = run_search_body(df, {"aggs": {"gh": {
                "geohash_grid": {"field": "loc", "precision": p},
            }}}).collect()
            keys[p] = out[0].gh
        assert keys[5].startswith(keys[3])
        assert keys[7].startswith(keys[5])

    def test_geotile_zxy_key(self, spark):
        import math

        lat, lon, z = 57.64911, 10.40744, 9
        df = self._pts(spark, [(1, lat, lon)])
        out = run_search_body(df, {"aggs": {"gt": {
            "geotile_grid": {"field": "loc", "precision": z},
        }}}).collect()
        n = 1 << z
        x = math.floor((lon + 180) / 360 * n)
        latr = math.radians(lat)
        y = math.floor(
            (1 - math.log(math.tan(latr) + 1 / math.cos(latr))
             / math.pi) / 2 * n
        )
        assert [(r.gt, r.doc_count) for r in out] == [(f"{z}/{x}/{y}", 1)]

    def test_geotile_lat_clamps_to_mercator_bound(self, spark):
        df = self._pts(spark, [(1, 89.9, 0.0), (2, -89.9, 0.0)])
        out = run_search_body(df, {"aggs": {"gt": {
            "geotile_grid": {"field": "loc", "precision": 2},
        }}}).collect()
        keys = sorted(r.gt for r in out)
        # poles clamp into the top/bottom tile row, never out of range
        assert keys == ["2/2/0", "2/2/3"]

    def test_null_location_gets_no_bucket(self, spark):
        df = self._pts(spark, [(1, 1.0, 1.0), (2, None, None)])
        out = run_search_body(df, {"aggs": {"gh": {
            "geohash_grid": {"field": "loc", "precision": 4},
        }}}).collect()
        assert sum(r.doc_count for r in out) == 1

    def test_size_cut_and_subagg(self, spark):
        from pyspark.sql import functions as F

        rows = [(i, 10.0 + (i % 3) * 20, 10.0) for i in range(9)]
        df = spark.createDataFrame(
            rows, "id long, lat double, lon double"
        ).select(
            "id", F.struct("lat", "lon").alias("loc"),
            (F.col("id") * 1.0).alias("v"),
        )
        out = run_search_body(df, {"aggs": {"gt": {
            "geotile_grid": {"field": "loc", "precision": 6, "size": 2},
            "aggs": {"m": {"max": {"field": "v"}}},
        }}}).collect()
        assert len(out) == 2
        assert all(r.doc_count == 3 for r in out)

    def test_precision_validation(self, spark):
        df = self._pts(spark, [(1, 0.0, 0.0)])
        with pytest.raises(ValueError, match="precision"):
            run_search_body(df, {"aggs": {"g": {
                "geohash_grid": {"field": "loc", "precision": 13},
            }}})
        with pytest.raises(ValueError, match="precision"):
            run_search_body(df, {"aggs": {"g": {
                "geotile_grid": {"field": "loc", "precision": 30},
            }}})


class TestTimeSeriesBucket:
    def test_buckets_per_tsid_with_metrics(self, spark):
        from pyspark.sql import functions as F  # noqa: F401

        df = spark.createDataFrame(
            [
                ("h1", "cpu", 1.0), ("h1", "cpu", 3.0),
                ("h1", "mem", 5.0), ("h2", "cpu", 7.0),
                (None, "cpu", 9.0),  # no dimension -> no _tsid
            ],
            "host string, metric string, v double",
        )
        out = run_search_body(df, {"aggs": {"s": {
            "time_series": {"dimensions": ["host", "metric"]},
            "aggs": {"m": {"max": {"field": "v"}}},
        }}}).collect()
        got = {r.s: (r.doc_count, r.m) for r in out}
        assert got == {
            "h1|cpu": (2, 3.0), "h1|mem": (1, 5.0), "h2|cpu": (1, 7.0),
        }

    def test_size_cut_busiest_first(self, spark):
        rows = [("a", float(i)) for i in range(5)] + [
            ("b", 1.0), ("c", 2.0)
        ]
        df = spark.createDataFrame(rows, "host string, v double")
        out = run_search_body(df, {"aggs": {"s": {
            "time_series": {"dimensions": ["host"], "size": 2},
        }}}).collect()
        assert [(r.s, r.doc_count) for r in out] == [
            ("a", 5), ("b", 1)
        ]

    def test_dimensions_required_and_options_rejected(self, spark):
        df = spark.createDataFrame([("a", 1.0)], "host string, v double")
        with pytest.raises(ValueError, match="dimensions"):
            run_search_body(df, {"aggs": {"s": {"time_series": {}}}})
        with pytest.raises(ValueError, match="unsupported options"):
            run_search_body(df, {"aggs": {"s": {
                "time_series": {"dimensions": ["host"], "keyed": True},
            }}})


class TestCompositeGeotileSource:
    def test_pages_resume_disjoint_and_exhaustive(self, spark):
        from pyspark.sql import functions as F

        rows = [(i, float(i % 7) * 10 - 30, float(i % 11) * 30 - 150)
                for i in range(40)]
        df = spark.createDataFrame(
            rows, "id long, lat double, lon double"
        ).select("id", F.struct("lat", "lon").alias("loc"))

        def page(after):
            body = {"aggs": {"p": {"composite": {
                "size": 5,
                "sources": [{"tile": {"geotile_grid": {
                    "field": "loc", "precision": 6}}}],
                **({"after": {"tile": after}} if after else {}),
            }}}}
            return run_search_body(df, body).collect()

        seen, after, total = [], None, 0
        while True:
            rows_ = page(after)
            if not rows_:
                break
            keys = [r.tile for r in rows_]
            assert keys == sorted(keys)
            assert not set(keys) & set(seen)
            seen += keys
            total += sum(r.doc_count for r in rows_)
            after = keys[-1]
        assert total == 40

    def test_unsupported_source_still_rejected(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(1, 1.0, 1.0)],
                                   "id long, lat double, lon double"
                                   ).select(
            "id", F.struct("lat", "lon").alias("loc"))
        with pytest.raises(ValueError, match="unsupported type"):
            run_search_body(df, {"aggs": {"p": {"composite": {
                "sources": [{"g": {"geohash_grid": {
                    "field": "loc", "precision": 3}}}],
            }}}})


class TestGeoLine:
    def _track(self, spark, rows):
        from pyspark.sql import functions as F

        return spark.createDataFrame(
            rows, "g string, t long, lat long, lon long"
        ).select(
            "g", "t",
            F.when(
                F.col("lat").isNotNull(), F.struct("lat", "lon")
            ).alias("loc"),
        )

    def test_points_in_sort_order(self, spark):
        df = self._track(spark, [
            ("a", 3, 30, 130), ("a", 1, 10, 110), ("a", 2, 20, 120),
        ])
        out = run_search_body(df, {"aggs": {"grp": {
            "terms": {"field": "g", "size": 5},
            "aggs": {"l": {"geo_line": {
                "field": "loc", "sort": {"field": "t"},
            }}},
        }}}).collect()
        assert out[0].l.type == "LineString"
        assert list(out[0].l.points) == ["110 10", "120 20", "130 30"]

    def test_desc_keeps_latest_and_size_caps(self, spark):
        df = self._track(spark, [
            ("a", i, i * 10, i * 100) for i in range(1, 5)
        ])
        out = run_search_body(df, {"aggs": {"grp": {
            "terms": {"field": "g", "size": 5},
            "aggs": {"l": {"geo_line": {
                "field": "loc", "sort": {"field": "t"},
                "sort_order": "desc", "size": 2,
            }}},
        }}}).collect()
        # latest two points, reverse track order
        assert list(out[0].l.points) == ["400 40", "300 30"]

    def test_null_point_or_sort_skipped(self, spark):
        df = self._track(spark, [
            ("a", 1, 10, 110), ("a", 2, None, None), ("a", None, 30, 130),
        ])
        out = run_search_body(df, {"aggs": {"grp": {
            "terms": {"field": "g", "size": 5},
            "aggs": {"l": {"geo_line": {
                "field": "loc", "sort": {"field": "t"},
            }}},
        }}}).collect()
        assert list(out[0].l.points) == ["110 10"]

    def test_validation(self, spark):
        df = self._track(spark, [("a", 1, 10, 110)])
        with pytest.raises(ValueError, match="sort"):
            run_search_body(df, {"aggs": {"grp": {
                "terms": {"field": "g"},
                "aggs": {"l": {"geo_line": {"field": "loc"}}},
            }}})
        with pytest.raises(ValueError, match="size"):
            run_search_body(df, {"aggs": {"grp": {
                "terms": {"field": "g"},
                "aggs": {"l": {"geo_line": {
                    "field": "loc", "sort": {"field": "t"},
                    "size": 20000,
                }}},
            }}})


class TestIpRangeAgg:
    def test_masks_froms_and_malformed(self, spark):
        df = spark.createDataFrame(
            [("10.0.0.5",), ("10.0.0.200",), ("10.0.1.0",),
             ("192.168.1.1",), ("300.1.2.3",), ("10.1",), (None,)],
            "ip string",
        )
        out = run_search_body(df, {"aggs": {"b": {
            "ip_range": {"field": "ip", "ranges": [
                {"mask": "10.0.0.0/24"},
                {"from": "10.0.0.0", "to": "10.0.0.128"},
                {"from": "192.0.0.0"},
            ]},
        }}}).collect()
        got = {r.b: r.doc_count for r in out}
        # overlapping ranges: a doc lands in every matching block
        assert got == {
            "10.0.0.0/24": 2,
            "10.0.0.0-10.0.0.128": 1,
            "192.0.0.0-*": 1,
        }

    def test_mask_base_aligns_down(self, spark):
        df = spark.createDataFrame([("10.0.0.200",)], "ip string")
        out = run_search_body(df, {"aggs": {"b": {
            "ip_range": {"field": "ip", "ranges": [
                # unaligned base: /25 of .129 aligns down to .128
                {"mask": "10.0.0.129/25"},
            ]},
        }}}).collect()
        assert [(r.b, r.doc_count) for r in out] == [
            ("10.0.0.129/25", 1)
        ]

    def test_key_override_and_validation(self, spark):
        df = spark.createDataFrame([("1.2.3.4",)], "ip string")
        out = run_search_body(df, {"aggs": {"b": {
            "ip_range": {"field": "ip", "ranges": [
                {"from": "1.0.0.0", "to": "2.0.0.0", "key": "ones"},
            ]},
        }}}).collect()
        assert out[0].b == "ones"
        with pytest.raises(ValueError, match="bad IPv4"):
            run_search_body(df, {"aggs": {"b": {
                "ip_range": {"field": "ip", "ranges": [
                    {"from": "::1", "to": "::2"},
                ]},
            }}})
        with pytest.raises(ValueError, match="bad mask"):
            run_search_body(df, {"aggs": {"b": {
                "ip_range": {"field": "ip", "ranges": [
                    {"mask": "10.0.0.0/40"},
                ]},
            }}})


class TestFrequentItemSets:
    def test_exact_pair_layer(self, spark):
        df = spark.createDataFrame(
            [("a", "x", "p"), ("a", "x", "q"), ("a", "y", "p"),
             ("b", "x", "p"), ("a", "x", None)],
            "f1 string, f2 string, f3 string",
        )
        out = run_search_body(df, {"aggs": {"sets": {
            "frequent_item_sets": {
                "fields": [{"field": "f1"}, {"field": "f2"},
                           {"field": "f3"}],
                "minimum_support": 0.4, "size": 5,
            },
        }}}).collect()
        rows = [(r.sets, r.doc_count, r.support) for r in out]
        assert rows[0] == ("f1=a,f2=x", 3, 0.6)
        assert ("f1=a,f3=p", 2, 0.4) in rows
        assert ("f2=x,f3=p", 2, 0.4) in rows
        assert len(rows) == 3  # everything else is below support

    def test_rejections(self, spark):
        df = spark.createDataFrame([("a", "x")], "f1 string, f2 string")
        with pytest.raises(ValueError, match=">= 2 fields"):
            run_search_body(df, {"aggs": {"s": {
                "frequent_item_sets": {"fields": [{"field": "f1"}]},
            }}})
        with pytest.raises(ValueError, match="size-2"):
            run_search_body(df, {"aggs": {"s": {
                "frequent_item_sets": {
                    "fields": [{"field": "f1"}, {"field": "f2"}],
                    "minimum_set_size": 3,
                },
            }}})
        with pytest.raises(ValueError, match="only top-level"):
            run_search_body(df, {"aggs": {
                "s": {"frequent_item_sets": {
                    "fields": [{"field": "f1"}, {"field": "f2"}]}},
                "other": {"terms": {"field": "f1"}},
            }})


class TestTextSimilarityReranker:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "merge scan vector pipeline"),
                (2, "merge scan"),
                (3, "vector table window"),
                (4, "merge scan vector table"),
                (5, "nothing here"),
            ],
            "doc_id long, text string",
        )

    def test_two_stage_rerank(self, spark):
        out = run_search_body(self._docs(spark), {
            "retriever": {"text_similarity_reranker": {
                "retriever": {"standard": {"query": {
                    "match": {"text": "merge scan vector"},
                }}},
                "field": "text",
                "inference_text": "merge scan vector table",
                "inference_id": "stub-model",
                "rank_window_size": 4,
            }},
            "size": 3,
        }).collect()
        assert [(r.doc_id, round(r._score, 4)) for r in out] == [
            (4, 1.0), (1, 0.75), (2, 0.5),
        ]

    def test_parity_with_esql_rerank(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.esql import (
            run_esql,
        )

        df = self._docs(spark)
        ret = run_search_body(df, {
            "retriever": {"text_similarity_reranker": {
                "retriever": {"standard": {"query": {
                    "match": {"text": "merge scan vector"},
                }}},
                "field": "text",
                "inference_text": "merge scan vector table",
                "rank_window_size": 100,
            }},
            "size": 5,
        }).collect()
        pipe = run_esql(
            'FROM d | WHERE MATCH(text, "merge scan vector") '
            '| RERANK "merge scan vector table" ON text '
            "| LIMIT 5 | KEEP doc_id, _score",
            {"d": df},
        ).collect()
        assert [(r.doc_id, r._score) for r in ret] == [
            (r.doc_id, r._score) for r in pipe
        ]

    def test_validation(self, spark):
        df = self._docs(spark)
        with pytest.raises(ValueError, match="needs retriever"):
            run_search_body(df, {"retriever": {
                "text_similarity_reranker": {
                    "field": "text", "inference_text": "x",
                },
            }})
        with pytest.raises(ValueError, match="unsupported options"):
            run_search_body(df, {"retriever": {
                "text_similarity_reranker": {
                    "retriever": {"standard": {"query": {
                        "match_all": {}}}},
                    "field": "text", "inference_text": "x",
                    "min_score": 0.5,
                },
            }})


class TestTsdbRollupComposition:
    def test_rate_under_time_series_histogram(self, spark):
        import datetime as dt

        rows = [
            ("h1", dt.datetime(2024, 1, 1, h), 24.0) for h in (0, 12)
        ] + [("h2", dt.datetime(2024, 1, 1, 6), 48.0)]
        df = spark.createDataFrame(rows, "host string, ts timestamp, v double")
        from pyspark.sql import functions as F

        out = run_search_body(df, {"aggs": {"s": {
            "time_series": {"dimensions": ["host"]},
            "aggs": {"d": {
                "date_histogram": {"field": "ts",
                                   "calendar_interval": "day"},
                "aggs": {"r": {"rate": {"field": "v",
                                        "unit": "hour"}}},
            }},
        }}}).filter(F.col("agg_path") == "s>d").collect()
        got = {r.s: r.r for r in out}
        # h1: sum 48 over a day -> 2/hour; h2: 48 -> 2/hour
        assert got == {"h1": 2.0, "h2": 2.0}
