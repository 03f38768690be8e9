"""Aggregation-DSL interpreter semantics (operators/aggsdsl.py):
per-level bucket computation, ES null/missing handling, explode-lowered
range/filters with zero-doc buckets, pipeline aggs, top_hits, global."""

from __future__ import annotations

import pytest

from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
    apply_aggs,
    compile_aggs,
)


def _df(spark):
    return spark.createDataFrame(
        [
            ("a", 5, 10.0, "2024-01-01 10:00:00"),
            ("a", 15, 20.0, "2024-01-01 11:00:00"),
            ("b", 25, 30.0, "2024-01-02 09:00:00"),
            ("b", 25, 40.0, "2024-01-02 10:00:00"),
            (None, 7, 5.0, "2024-01-02 11:00:00"),
        ],
        "k string, n long, v double, ts string",
    ).selectExpr("k", "n", "v", "CAST(ts AS TIMESTAMP) AS ts")


class TestAggsDsl:
    def test_terms_with_metrics(self, spark):
        out = {
            r.by_k: r
            for r in apply_aggs(
                _df(spark),
                {
                    "by_k": {
                        "terms": {"field": "k"},
                        "aggs": {
                            "total": {"sum": {"field": "v"}},
                            "distinct_n": {"cardinality": {"field": "n"}},
                            "top": {"max": {"field": "n"}},
                        },
                    }
                },
            ).collect()
        }
        assert out["a"].doc_count == 2 and out["a"].total == 30.0
        assert out["b"].distinct_n == 1 and out["b"].top == 25
        # ES: docs with a NULL terms field are omitted (no null bucket)
        assert set(out) == {"a", "b"}

    def test_terms_missing_param(self, spark):
        out = {
            r.by_k: r.doc_count
            for r in apply_aggs(
                _df(spark),
                {"by_k": {"terms": {"field": "k", "missing": "N/A"}}},
            ).collect()
        }
        assert out == {"a": 2, "b": 2, "N/A": 1}

    def test_terms_size_top_n(self, spark):
        rows = apply_aggs(
            _df(spark),
            {"by_k": {"terms": {"field": "k", "size": 1}}},
        ).collect()
        # doc_count tie between a and b -> key asc tiebreak picks a
        assert [(r.by_k, r.doc_count) for r in rows] == [("a", 2)]

    def test_outer_metric_computed_at_outer_level(self, spark):
        # the composite-flattening bug shape: a metric on the OUTER
        # date_histogram must aggregate the whole day, not (day, k)
        rows = apply_aggs(
            _df(spark),
            {
                "per_day": {
                    "date_histogram": {
                        "field": "ts",
                        "calendar_interval": "day",
                    },
                    "aggs": {
                        "day_total": {"sum": {"field": "v"}},
                        "per_k": {
                            "terms": {"field": "k"},
                            "aggs": {"k_total": {"sum": {"field": "v"}}},
                        },
                    },
                }
            },
        ).collect()
        outer = {
            r.per_day: (r.doc_count, r.day_total)
            for r in rows
            if r.agg_path == "per_day"
        }
        inner = {
            (r.per_day, r.per_k): (r.doc_count, r.k_total)
            for r in rows
            if r.agg_path == "per_day>per_k"
        }
        # outer: includes the null-k doc on day 2
        assert outer == {"2024-01-01": (2, 30.0), "2024-01-02": (3, 75.0)}
        # inner: null-k doc omitted from terms buckets
        assert inner == {
            ("2024-01-01", "a"): (2, 30.0),
            ("2024-01-02", "b"): (2, 70.0),
        }
        # outer rows carry NULL for inner-level columns and vice versa
        assert all(
            r.k_total is None for r in rows if r.agg_path == "per_day"
        )
        assert all(
            r.day_total is None for r in rows if r.agg_path == "per_day>per_k"
        )

    def test_nested_chain_and_histogram(self, spark):
        rows = apply_aggs(
            _df(spark),
            {
                "per_day": {
                    "date_histogram": {
                        "field": "ts",
                        "calendar_interval": "day",
                    },
                    "aggs": {
                        "per_bucket": {
                            "histogram": {"field": "n", "interval": 10},
                            "aggs": {"avg_v": {"avg": {"field": "v"}}},
                        }
                    },
                }
            },
        ).collect()
        got = {
            (r.per_day, r.per_bucket): (r.doc_count, r.avg_v)
            for r in rows
            if r.agg_path == "per_day>per_bucket"
        }
        assert got[("2024-01-01", 0)] == (1, 10.0)
        assert got[("2024-01-01", 10)] == (1, 20.0)
        assert got[("2024-01-02", 20)] == (2, 35.0)

    def test_range_es_exact(self, spark):
        # overlapping ranges: a doc lands in EVERY matching bucket;
        # requested-but-empty ranges appear with doc_count 0; no NULL
        # bucket for out-of-range docs
        rows = apply_aggs(
            _df(spark),
            {
                "bands": {
                    "range": {
                        "field": "n",
                        "ranges": [
                            {"to": 10},
                            {"from": 5, "to": 20},
                            {"from": 100, "to": 200},
                            {"from": 20},
                        ],
                    }
                }
            },
        ).collect()
        got = {r.bands: r.doc_count for r in rows}
        assert got == {"*-10": 2, "5-20": 3, "100-200": 0, "20-*": 2}

    def test_range_custom_keys_and_metric_zero_fill(self, spark):
        rows = apply_aggs(
            _df(spark),
            {
                "bands": {
                    "range": {
                        "field": "n",
                        "ranges": [
                            {"to": 10, "key": "low"},
                            {"from": 100, "key": "none"},
                        ],
                    },
                    "aggs": {
                        "t": {"sum": {"field": "n"}},
                        "m": {"max": {"field": "n"}},
                    },
                }
            },
        ).collect()
        got = {r.bands: (r.doc_count, r.t, r.m) for r in rows}
        # empty bucket: additive metrics zero-fill, max stays NULL
        assert got == {"low": (2, 12, 7), "none": (0, 0, None)}

    def test_filters_agg(self, spark):
        rows = apply_aggs(
            _df(spark),
            {
                "cls": {
                    "filters": {
                        "filters": {
                            "small": {"range": {"n": {"lt": 10}}},
                            "big": {"range": {"n": {"gte": 10}}},
                            "nothing": {"term": {"k": "zzz"}},
                        }
                    },
                    "aggs": {"t": {"sum": {"field": "n"}}},
                }
            },
        ).collect()
        got = {r.cls: (r.doc_count, r.t) for r in rows}
        assert got == {"small": (2, 12), "big": (3, 65), "nothing": (0, 0)}

    def test_filter_missing_global(self, spark):
        df = _df(spark)
        filtered = df.filter("n >= 10")
        rows = apply_aggs(
            filtered,
            {
                "no_k": {"missing": {"field": "k"}},
                "only_b": {
                    "filter": {"term": {"k": "b"}},
                    "aggs": {"bt": {"sum": {"field": "v"}}},
                },
                "everything": {
                    "global": {},
                    "aggs": {"all_total": {"sum": {"field": "v"}}},
                },
            },
            base_df=df,
        ).collect()
        by_path = {r.agg_path: r for r in rows}
        assert by_path["no_k"].doc_count == 0  # null-k doc was filtered
        assert by_path["only_b"].doc_count == 2
        assert by_path["only_b"].bt == 70.0
        # global escapes the query: all 5 docs
        assert by_path["everything"].doc_count == 5
        assert by_path["everything"].all_total == 105.0

    def test_pipeline_aggs(self, spark):
        rows = (
            apply_aggs(
                _df(spark),
                {
                    "per_day": {
                        "date_histogram": {
                            "field": "ts",
                            "calendar_interval": "day",
                        },
                        "aggs": {
                            "total": {"sum": {"field": "v"}},
                            "cum": {"cumulative_sum": {"buckets_path": "total"}},
                            "dv": {"derivative": {"buckets_path": "total"}},
                            "sd": {
                                "serial_diff": {"buckets_path": "total", "lag": 1}
                            },
                            "mv": {
                                "moving_fn": {
                                    "buckets_path": "total",
                                    "window": 2,
                                    "script": "MovingFunctions.unweightedAvg(values)",
                                }
                            },
                            "per_doc": {
                                "bucket_script": {
                                    "buckets_path": {"t": "total", "c": "_count"},
                                    "script": "params.t / params.c",
                                }
                            },
                        },
                    }
                },
            )
            .orderBy("per_day")
            .collect()
        )
        d1, d2 = rows
        assert (d1.total, d1.cum, d1.dv, d1.sd, d1.mv) == (
            30.0,
            30.0,
            None,
            None,
            None,
        )
        assert (d2.total, d2.cum, d2.dv, d2.sd, d2.mv) == (
            75.0,
            105.0,
            45.0,
            45.0,
            30.0,
        )
        assert d1.per_doc == 15.0 and d2.per_doc == 25.0

    def test_bucket_selector_prunes_descendants(self, spark):
        rows = apply_aggs(
            _df(spark),
            {
                "per_day": {
                    "date_histogram": {
                        "field": "ts",
                        "calendar_interval": "day",
                    },
                    "aggs": {
                        "total": {"sum": {"field": "v"}},
                        "keep": {
                            "bucket_selector": {
                                "buckets_path": {"t": "total"},
                                "script": "params.t > 50",
                            }
                        },
                        "per_k": {"terms": {"field": "k"}},
                    },
                }
            },
        ).collect()
        days = [r.per_day for r in rows if r.agg_path == "per_day"]
        inner = [
            (r.per_day, r.per_k)
            for r in rows
            if r.agg_path == "per_day>per_k"
        ]
        assert days == ["2024-01-02"]  # day 1 (30.0) dropped
        assert inner == [("2024-01-02", "b")]  # descendants pruned too

    def test_bucket_sort_top_n(self, spark):
        rows = apply_aggs(
            _df(spark),
            {
                "per_day": {
                    "date_histogram": {
                        "field": "ts",
                        "calendar_interval": "day",
                    },
                    "aggs": {
                        "total": {"sum": {"field": "v"}},
                        "top1": {
                            "bucket_sort": {
                                "sort": [{"total": {"order": "desc"}}],
                                "size": 1,
                            }
                        },
                    },
                }
            },
        ).collect()
        assert [(r.per_day, r.total) for r in rows] == [("2024-01-02", 75.0)]

    def test_top_hits(self, spark):
        rows = apply_aggs(
            _df(spark),
            {
                "per_k": {
                    "terms": {"field": "k"},
                    "aggs": {
                        "best": {
                            "top_hits": {
                                "size": 2,
                                "sort": [{"v": {"order": "desc"}}],
                                "_source": ["n", "v"],
                            }
                        }
                    },
                }
            },
        ).collect()
        got = {r.per_k: [(h.n, h.v) for h in r.best] for r in rows}
        assert got == {
            "a": [(15, 20.0), (5, 10.0)],
            "b": [(25, 40.0), (25, 30.0)],
        }

    def test_metrics_only_single_row(self, spark):
        [r] = apply_aggs(
            _df(spark),
            {"total": {"sum": {"field": "n"}}, "mx": {"max": {"field": "v"}}},
        ).collect()
        assert r.doc_count == 5 and r.total == 77 and r.mx == 40.0
        assert r.agg_path == ""

    def test_plan_time_validation(self, spark):
        with pytest.raises(ValueError, match="unsupported bucket"):
            # geo_line graduated to a real multi-metric in round 9 —
            # keep a genuinely-unlowered kind here
            compile_aggs({"x": {"geohex_grid": {"field": "k"}}})
        with pytest.raises(ValueError, match="cannot nest"):
            compile_aggs(
                {"x": {"sum": {"field": "n"}, "aggs": {"y": {"max": {"field": "n"}}}}}
            )
        with pytest.raises(ValueError, match="exactly one type"):
            compile_aggs({"x": {"sum": {"field": "n"}, "max": {"field": "n"}}})
        with pytest.raises(ValueError, match="calendar_interval"):
            compile_aggs(
                {"x": {"date_histogram": {"field": "ts", "calendar_interval": "fortnight"}}}
            )
        with pytest.raises(ValueError, match="duplicate agg name"):
            compile_aggs(
                {
                    "x": {
                        "terms": {"field": "k"},
                        "aggs": {"x": {"sum": {"field": "n"}}},
                    }
                }
            )
        with pytest.raises(ValueError, match="histogram/"):
            compile_aggs(
                {
                    "x": {
                        "terms": {"field": "k"},
                        "aggs": {
                            "c": {"cumulative_sum": {"buckets_path": "_count"}}
                        },
                    }
                }
            )
        with pytest.raises(ValueError, match="top level"):
            compile_aggs(
                {
                    "x": {
                        "terms": {"field": "k"},
                        "aggs": {"g": {"global": {}}},
                    }
                }
            )
        # a colliding other_bucket_key still fails at plan time
        with pytest.raises(ValueError, match="collides"):
            compile_aggs(
                {
                    "x": {
                        "filters": {
                            "filters": {"a": {"match_all": {}}},
                            "other_bucket_key": "a",
                        }
                    }
                }
            )

    def test_bad_buckets_path_fails(self, spark):
        with pytest.raises(ValueError, match="buckets_path"):
            apply_aggs(
                _df(spark),
                {
                    "per_day": {
                        "date_histogram": {
                            "field": "ts",
                            "calendar_interval": "day",
                        },
                        "aggs": {
                            "c": {"cumulative_sum": {"buckets_path": "nope"}}
                        },
                    }
                },
            ).collect()

    def test_single_exchange_plan(self, spark):
        # the everyday single-chain tree still costs ONE exchange
        out = apply_aggs(
            _df(spark),
            {
                "by_k": {
                    "terms": {"field": "k"},
                    "aggs": {"total": {"sum": {"field": "v"}}},
                }
            },
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 1

    def test_two_level_chain_single_pass(self, spark):
        # outer + inner levels share one groupingSets aggregation:
        # a single Expand + one exchange, not one scan per level
        out = apply_aggs(
            _df(spark),
            {
                "per_day": {
                    "date_histogram": {
                        "field": "ts",
                        "calendar_interval": "day",
                    },
                    "aggs": {
                        "day_total": {"sum": {"field": "v"}},
                        "per_k": {"terms": {"field": "k"}},
                    },
                }
            },
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan ExistingRDD") <= 1
        assert "Expand" in plan


class TestMultiValueMetrics:
    """Round-4 metric leaves: stats / extended_stats / percentiles /
    weighted_avg."""

    def _frame(self, spark):
        return spark.createDataFrame(
            [("a", 1.0, 2.0), ("a", 3.0, 1.0), ("b", 5.0, None),
             ("b", None, 4.0)],
            "k string, x double, w double",
        )

    def test_stats_and_extended_stats(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        rows = apply_aggs(self._frame(spark), {
            "per_k": {"terms": {"field": "k"}, "aggs": {
                "st": {"stats": {"field": "x"}},
                "ext": {"extended_stats": {"field": "x"}},
            }},
        }).orderBy("per_k").collect()
        a = [r for r in rows if r.per_k == "a"][0]
        assert a.st.asDict() == {
            "count": 2, "min": 1.0, "max": 3.0, "avg": 2.0, "sum": 4.0,
        }
        ext = a.ext.asDict()
        assert ext["sum_of_squares"] == 10.0
        assert ext["variance"] == 1.0          # population, like ES
        assert ext["std_deviation"] == 1.0
        b = [r for r in rows if r.per_k == "b"][0]
        assert b.st["count"] == 1 and b.ext["variance"] == 0.0

    def test_percentiles_exact_and_default_percents(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        rows = apply_aggs(self._frame(spark), {
            "p": {"percentiles": {"field": "x", "percents": [0, 50, 100]}},
        }).collect()
        assert list(rows[0].p) == [1.0, 3.0, 5.0]
        # default percents: 7 values, ES's 1/5/25/50/75/95/99
        rows = apply_aggs(self._frame(spark), {
            "p": {"percentiles": {"field": "x"}},
        }).collect()
        assert len(list(rows[0].p)) == 7
        import pytest as _pt

        with _pt.raises(ValueError, match="percents"):
            apply_aggs(self._frame(spark), {
                "p": {"percentiles": {"field": "x", "percents": [101]}},
            })

    def test_weighted_avg_skips_null_pairs(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        rows = apply_aggs(self._frame(spark), {
            "per_k": {"terms": {"field": "k"}, "aggs": {
                "wa": {"weighted_avg": {"value": {"field": "x"},
                                        "weight": {"field": "w"}}},
            }},
        }).orderBy("per_k").collect()
        assert abs(rows[0].wa - 5.0 / 3.0) < 1e-12
        assert rows[1].wa is None  # both pairs have a null side
        import pytest as _pt

        with _pt.raises(ValueError, match="weighted_avg"):
            apply_aggs(self._frame(spark), {
                "wa": {"weighted_avg": {"value": {"field": "x"}}},
            })


class TestRound4Buckets:
    """date_range / adjacency_matrix / composite."""

    def _frame(self, spark):
        import datetime as dt

        return spark.createDataFrame(
            [("a", "x", 1, dt.datetime(2024, 1, 5)),
             ("a", "y", 2, dt.datetime(2024, 2, 10)),
             ("b", "x", 3, dt.datetime(2024, 2, 20)),
             ("b", None, 4, dt.datetime(2024, 3, 1)),
             ("c", "y", 5, dt.datetime(2024, 1, 15))],
            "k string, g string, n long, ts timestamp",
        )

    def test_date_range_explodes_and_zero_fills(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        rows = apply_aggs(self._frame(spark), {
            "period": {"date_range": {"field": "ts", "ranges": [
                {"key": "jan", "from": "2024-01-01", "to": "2024-02-01"},
                {"key": "wide", "from": "2024-01-01", "to": "2024-04-01"},
                {"key": "none", "from": "2025-01-01"},
            ]}, "aggs": {"total": {"sum": {"field": "n"}}}},
        }).orderBy("period").collect()
        got = {r.period: (r.doc_count, r.total) for r in rows}
        # overlapping ranges: jan docs land in BOTH jan and wide;
        # the empty range is reported zero-filled
        assert got == {"jan": (2, 6), "wide": (5, 15), "none": (0, 0)}

    def test_adjacency_matrix_pairs_omit_empty(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        rows = apply_aggs(self._frame(spark), {
            "adj": {"adjacency_matrix": {"filters": {
                "low": {"range": {"n": {"lte": 3}}},
                "ka": {"term": {"k": "a"}},
                "kc": {"term": {"k": "c"}},
            }}},
        }).collect()
        got = {r.adj: r.doc_count for r in rows}
        # kc&low would be empty (doc c has n=5) -> omitted, like ES;
        # ka&kc impossible -> omitted
        assert got == {"low": 3, "ka": 2, "kc": 1, "ka&low": 2}

    def test_composite_pagination_and_order(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        body = {"composite": {
            "sources": [{"kk": {"terms": {"field": "k"}}},
                        {"gg": {"terms": {"field": "g"}}}],
            "size": 2,
        }, "aggs": {"total": {"sum": {"field": "n"}}}}
        p1 = apply_aggs(self._frame(spark), {"comp": body}).collect()
        assert [(r.kk, r.gg, r.total) for r in p1] == [
            ("a", "x", 1), ("a", "y", 2),
        ]
        body2 = {**body, "composite": {**body["composite"],
                                       "after": {"kk": "a", "gg": "y"}}}
        p2 = apply_aggs(self._frame(spark), {"comp": body2}).collect()
        # null g row is omitted (no missing_bucket)
        assert [(r.kk, r.gg) for r in p2] == [("b", "x"), ("c", "y")]

    def test_composite_desc_order_and_validation(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        rows = apply_aggs(self._frame(spark), {
            "comp": {"composite": {"sources": [
                {"kk": {"terms": {"field": "k", "order": "desc"}}},
            ], "size": 2}},
        }).collect()
        assert [r.kk for r in rows] == ["c", "b"]
        import pytest as _pt

        with _pt.raises(ValueError, match="only top-level"):
            apply_aggs(self._frame(spark), {
                "comp": {"composite": {"sources": [
                    {"kk": {"terms": {"field": "k"}}}]}},
                "other": {"terms": {"field": "g"}},
            })
        with _pt.raises(ValueError, match="metric leaves"):
            apply_aggs(self._frame(spark), {
                "comp": {"composite": {"sources": [
                    {"kk": {"terms": {"field": "k"}}}]},
                    "aggs": {"sub": {"terms": {"field": "g"}}}},
            })


class TestSiblingPipelines:
    def _frame(self, spark):
        return spark.createDataFrame(
            [("d1", "x", 1.0), ("d1", "y", 3.0), ("d2", "x", 5.0),
             ("d2", "y", 7.0), ("d3", "x", 9.0)],
            "day string, typ string, v double",
        )

    def test_root_sibling_aggregates_child_buckets(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        rows = apply_aggs(self._frame(spark), {
            "per_day": {"terms": {"field": "day"},
                        "aggs": {"total": {"sum": {"field": "v"}}}},
            "avg_daily": {"avg_bucket": {"buckets_path": "per_day>total"}},
            "max_docs": {"max_bucket": {"buckets_path": "per_day>_count"}},
            "st": {"stats_bucket": {"buckets_path": "per_day>total"}},
        }).collect()
        root = [r for r in rows if r.agg_path == ""][0]
        # daily totals 4, 12, 9 -> avg 25/3, max _count 2
        assert abs(root.avg_daily - 25.0 / 3.0) < 1e-12
        assert root.max_docs == 2
        assert root.st.asDict() == {
            "count": 3, "min": 4.0, "max": 12.0, "avg": 25.0 / 3.0,
            "sum": 25.0,
        }
        # bucket rows carry NULL sibling columns
        assert all(
            r.avg_daily is None for r in rows if r.agg_path == "per_day"
        )

    def test_nested_sibling_respects_child_selector(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        # per-typ parent, per-day child with a selector dropping small
        # buckets; the sibling avg sees only SURVIVING child buckets
        rows = apply_aggs(self._frame(spark), {
            "per_typ": {"terms": {"field": "typ"}, "aggs": {
                "per_day": {"terms": {"field": "day"}, "aggs": {
                    "total": {"sum": {"field": "v"}},
                    "keep": {"bucket_selector": {
                        "buckets_path": {"t": "total"},
                        "script": "params.t >= 5",
                    }},
                }},
                "avg_kept": {"avg_bucket": {
                    "buckets_path": "per_day>total"}},
            }},
        }).collect()
        got = {r.per_typ: r.avg_kept for r in rows
               if r.agg_path == "per_typ"}
        # typ x: day totals 1,5,9 -> kept 5,9 -> avg 7
        # typ y: 3,7 -> kept 7 -> avg 7
        assert got == {"x": 7.0, "y": 7.0}

    def test_sibling_validation(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        with pytest.raises(ValueError, match="buckets_path"):
            apply_aggs(self._frame(spark), {
                "a": {"avg_bucket": {"buckets_path": "nopath"}},
            })
        with pytest.raises(ValueError, match="not a bucket agg"):
            apply_aggs(self._frame(spark), {
                "per_day": {"terms": {"field": "day"}},
                "a": {"avg_bucket": {"buckets_path": "missing>x"}},
            })
        with pytest.raises(ValueError, match="not produced"):
            apply_aggs(self._frame(spark), {
                "per_day": {"terms": {"field": "day"}},
                "a": {"avg_bucket": {"buckets_path": "per_day>nope"}},
            })


class TestSignificantTerms:
    def test_jlh_score_and_gate(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        df = spark.createDataFrame(
            [("d1", 1.0)] * 6 + [("d2", 1.0)] * 3 + [("d3", 1.0)] * 3
            + [("d1", 9.0)] * 1 + [("d2", 9.0)] * 5,
            "day string, v double",
        )
        fg = df.filter(df.v > 5)
        rows = apply_aggs(fg, {
            "sig": {"significant_terms": {"field": "day", "size": 5}},
        }, base_df=df).collect()
        # only d2 is MORE frequent in fg (5/6) than bg (8/18); JLH =
        # (5/6 - 4/9) * (5/6 / (4/9)) = 35/48
        assert len(rows) == 1
        r = rows[0]
        assert (r.sig, r.doc_count, r.bg_count) == ("d2", 5, 8)
        assert abs(r.score - 35.0 / 48.0) < 1e-12

    def test_top_level_only(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        df = spark.createDataFrame([("a", "b")], "x string, y string")
        with pytest.raises(ValueError, match="top level"):
            apply_aggs(df, {
                "outer": {"terms": {"field": "x"}, "aggs": {
                    "sig": {"significant_terms": {"field": "y"}}}},
            })


class TestTermsOrderAndPrune:
    def _frame(self, spark):
        return spark.createDataFrame(
            [("a", "p", 1.0), ("a", "q", 2.0), ("b", "p", 30.0),
             ("c", "p", 4.0), ("c", "q", 5.0), ("c", "q", 6.0)],
            "k string, g string, v double",
        )

    def test_order_by_metric_and_key(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        rows = apply_aggs(self._frame(spark), {
            "top": {"terms": {"field": "k", "size": 2,
                              "order": {"total": "desc"}},
                    "aggs": {"total": {"sum": {"field": "v"}}}},
        }).collect()
        # totals: a=3, b=30, c=15 -> top2 by total desc: b, c
        assert sorted((r.top, r.total) for r in rows) == [
            ("b", 30.0), ("c", 15.0),
        ]
        rows = apply_aggs(self._frame(spark), {
            "top": {"terms": {"field": "k", "size": 2,
                              "order": {"_key": "desc"}}},
        }).collect()
        assert sorted(r.top for r in rows) == ["b", "c"]
        with pytest.raises(ValueError, match="order ref"):
            apply_aggs(self._frame(spark), {
                "top": {"terms": {"field": "k", "size": 1,
                                  "order": {"nope": "desc"}}},
            })

    def test_size_cap_prunes_descendants(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        rows = apply_aggs(self._frame(spark), {
            "top": {"terms": {"field": "k", "size": 1,
                              "order": {"total": "desc"}},
                    "aggs": {
                        "total": {"sum": {"field": "v"}},
                        "per_g": {"terms": {"field": "g"}},
                    }},
        }).collect()
        # only bucket b survives -> child rows exist only under b
        child = [(r.top, r.per_g) for r in rows
                 if r.agg_path == "top>per_g"]
        assert child == [("b", "p")]


class TestAutoDateHistogram:
    def test_picks_smallest_fitting_interval(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )
        import datetime as dt

        rows = [(dt.datetime(2024, 1, 1) + dt.timedelta(hours=i * 5),
                 float(i)) for i in range(30)]
        df = spark.createDataFrame(rows, "ts timestamp, v double")
        out = apply_aggs(df, {
            "auto": {"auto_date_histogram": {"field": "ts", "buckets": 8},
                     "aggs": {"total": {"sum": {"field": "v"}}}},
        }).orderBy("auto").collect()
        # 150h span: 12h -> 13 aligned buckets (>8), 24h -> 7 (fits)
        assert len(out) == 7
        assert out[0].auto == "2024-01-01 00:00:00"
        assert out[0].doc_count == 5 and out[0].total == 10.0
        # tighter target escalates the interval to a week
        out = apply_aggs(df, {
            "auto": {"auto_date_histogram": {"field": "ts", "buckets": 2}},
        }).collect()
        assert len(out) == 2
        with pytest.raises(ValueError, match="buckets"):
            apply_aggs(df, {
                "auto": {"auto_date_histogram": {"field": "ts",
                                                 "buckets": 0}},
            })

    def test_rejected_as_composite_source(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )
        import datetime as dt

        df = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1), 1.0)], "ts timestamp, v double")
        with pytest.raises(ValueError, match="unsupported type"):
            apply_aggs(df, {"c": {"composite": {"sources": [
                {"a": {"auto_date_histogram": {"field": "ts"}}}]}}})


class TestPercentilesBucket:
    def test_percentiles_over_child_buckets(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 1.0), ("b", 4.0), ("c", 7.0)],
            "k string, v double",
        )
        rows = apply_aggs(df, {
            "per_k": {"terms": {"field": "k"},
                      "aggs": {"total": {"sum": {"field": "v"}}}},
            "pb": {"percentiles_bucket": {
                "buckets_path": "per_k>total",
                "percents": [0, 50, 100]}},
        }).collect()
        root = [r for r in rows if r.agg_path == ""][0]
        # child totals 2, 4, 7 -> p0=2, p50=4, p100=7
        assert list(root.pb) == [2.0, 4.0, 7.0]
        with pytest.raises(ValueError, match="percents"):
            apply_aggs(df, {
                "per_k": {"terms": {"field": "k"}},
                "pb": {"percentiles_bucket": {
                    "buckets_path": "per_k>_count",
                    "percents": [200]}},
            })


class TestAutoDateHistogramNesting:
    def test_rejected_under_bucket_keys(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )
        import datetime as dt

        df = spark.createDataFrame(
            [("a", dt.datetime(2024, 1, 1))], "k string, ts timestamp")
        with pytest.raises(ValueError, match="cannot nest under"):
            apply_aggs(df, {"per_k": {"terms": {"field": "k"}, "aggs": {
                "auto": {"auto_date_histogram": {"field": "ts"}}}}})
        # filter parents are fine: the pick runs on the narrowed frame
        out = apply_aggs(df, {"recent": {
            "filter": {"term": {"k": "a"}},
            "aggs": {"auto": {"auto_date_histogram": {"field": "ts"}}},
        }})
        assert out.count() >= 1


class TestCompositeSourceTypes:
    def test_histogram_and_date_histogram_sources(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )
        import datetime as dt

        df = spark.createDataFrame(
            [(3.0, dt.datetime(2024, 1, 1, 5)),
             (7.0, dt.datetime(2024, 1, 1, 9)),
             (12.0, dt.datetime(2024, 1, 2, 0)),
             (14.0, dt.datetime(2024, 1, 2, 1))],
            "v double, ts timestamp",
        )
        rows = apply_aggs(df, {"c": {"composite": {
            "sources": [
                {"day": {"date_histogram": {"field": "ts",
                                            "calendar_interval": "day"}}},
                {"bin": {"histogram": {"field": "v", "interval": 5}}},
            ],
            "size": 10,
        }}}).collect()
        got = [(r.day, r.bin, r.doc_count) for r in rows]
        assert got == [
            ("2024-01-01", 0.0, 1), ("2024-01-01", 5.0, 1),
            ("2024-01-02", 10.0, 2),
        ]
        # after-tuple resumes mid-day
        rows = apply_aggs(df, {"c": {"composite": {
            "sources": [
                {"day": {"date_histogram": {"field": "ts",
                                            "calendar_interval": "day"}}},
                {"bin": {"histogram": {"field": "v", "interval": 5}}},
            ],
            "size": 10,
            "after": {"day": "2024-01-01", "bin": 0.0},
        }}}).collect()
        assert [(r.day, r.bin) for r in rows] == [
            ("2024-01-01", 5.0), ("2024-01-02", 10.0),
        ]


class TestMinDocCountZero:
    def test_histogram_gap_buckets(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        df = spark.createDataFrame(
            [(1.0,), (22.0,)], "v double")
        rows = apply_aggs(df, {"h": {
            "histogram": {"field": "v", "interval": 5,
                          "min_doc_count": 0},
            "aggs": {"total": {"sum": {"field": "v"}}}},
        }).orderBy("h").collect()
        got = [(r.h, r.doc_count, r.total) for r in rows]
        assert got == [(0.0, 1, 1.0), (5.0, 0, 0.0), (10.0, 0, 0.0),
                       (15.0, 0, 0.0), (20.0, 1, 22.0)]

    def test_date_histogram_gaps_per_parent(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )
        import datetime as dt

        df = spark.createDataFrame(
            [("a", dt.datetime(2024, 1, 1)), ("a", dt.datetime(2024, 1, 4)),
             ("b", dt.datetime(2024, 1, 2))],
            "k string, ts timestamp",
        )
        rows = apply_aggs(df, {"per_k": {"terms": {"field": "k"},
                                         "aggs": {"d": {
            "date_histogram": {"field": "ts", "calendar_interval": "day",
                               "min_doc_count": 0}}}}}).collect()
        a_days = sorted((r.d, r.doc_count) for r in rows
                        if r.agg_path == "per_k>d" and r.per_k == "a")
        # gaps filled WITHIN a's own span; b (one day) gets no gaps
        assert a_days == [("2024-01-01", 1), ("2024-01-02", 0),
                          ("2024-01-03", 0), ("2024-01-04", 1)]
        b_days = [(r.d, r.doc_count) for r in rows
                  if r.agg_path == "per_k>d" and r.per_k == "b"]
        assert b_days == [("2024-01-02", 1)]

    def test_month_gap_fill(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )
        import datetime as dt

        df = spark.createDataFrame(
            [(dt.datetime(2024, 1, 15),), (dt.datetime(2024, 4, 2),)],
            "ts timestamp",
        )
        rows = apply_aggs(df, {"m": {"date_histogram": {
            "field": "ts", "calendar_interval": "month",
            "min_doc_count": 0}}}).orderBy("m").collect()
        assert [(r.m, r.doc_count) for r in rows] == [
            ("2024-01", 1), ("2024-02", 0), ("2024-03", 0), ("2024-04", 1)]


class TestDateHistogramIntervals:
    def _df(self, spark):
        import datetime as dt

        return spark.createDataFrame(
            [(1, dt.datetime(2024, 3, 7, 13, 10, 0)),   # Thursday
             (2, dt.datetime(2024, 3, 7, 13, 40, 0)),
             (3, dt.datetime(2024, 3, 7, 15, 5, 0)),
             (4, dt.datetime(2024, 5, 20, 1, 0, 0))],   # Q2, Monday
            "id long, ts timestamp",
        )

    def test_fixed_interval_30m_with_gaps(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        rows = apply_aggs(
            self._df(spark).filter("id < 4"),
            {"h": {"date_histogram": {"field": "ts",
                                      "fixed_interval": "30m",
                                      "min_doc_count": 0}}},
        ).orderBy("h").collect()
        got = [(r.h, r.doc_count) for r in rows]
        assert got[0] == ("2024-03-07 13:00:00", 1)
        assert got[1] == ("2024-03-07 13:30:00", 1)
        assert ("2024-03-07 14:00:00", 0) in got
        assert got[-1] == ("2024-03-07 15:00:00", 1)
        assert len(got) == 5  # 13:00..15:00 grid, 30m steps

    def test_week_and_quarter(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        rows = apply_aggs(self._df(spark), {"w": {"date_histogram": {
            "field": "ts", "calendar_interval": "week"}}}).collect()
        # ISO weeks start Monday: 2024-03-07 -> 2024-03-04;
        # 2024-05-20 is itself a Monday
        assert sorted((r.w, r.doc_count) for r in rows) == [
            ("2024-03-04", 3), ("2024-05-20", 1)]
        rows = apply_aggs(self._df(spark), {"q": {"date_histogram": {
            "field": "ts", "calendar_interval": "quarter"}}}).collect()
        assert sorted((r.q, r.doc_count) for r in rows) == [
            ("2024-01-01", 3), ("2024-04-01", 1)]

    def test_time_zone_and_offset(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        # +05:30: 13:10 UTC -> 18:40 local, so days bucket in local time
        rows = apply_aggs(self._df(spark), {"d": {"date_histogram": {
            "field": "ts", "calendar_interval": "day",
            "time_zone": "+05:30"}}}).collect()
        assert sorted((r.d, r.doc_count) for r in rows) == [
            ("2024-03-07", 3), ("2024-05-20", 1)]
        # offset +14h: the 13:xx events fall in the [2024-03-06 14:00,
        # 2024-03-07 14:00) bucket, the 15:05 one in the next
        rows = apply_aggs(self._df(spark).filter("id < 4"),
                          {"d": {"date_histogram": {
                              "field": "ts", "calendar_interval": "day",
                              "offset": "+14h"}}}).collect()
        assert sorted((r.d, r.doc_count) for r in rows) == [
            ("2024-03-06 14:00:00", 2), ("2024-03-07 14:00:00", 1)]

    def test_plan_time_validation(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            compile_aggs,
        )

        with pytest.raises(ValueError, match="exactly one of"):
            compile_aggs({"x": {"date_histogram": {
                "field": "ts", "calendar_interval": "day",
                "fixed_interval": "30m"}}})
        with pytest.raises(ValueError, match="exactly one of"):
            compile_aggs({"x": {"date_histogram": {"field": "ts"}}})
        with pytest.raises(ValueError, match="bad duration"):
            compile_aggs({"x": {"date_histogram": {
                "field": "ts", "fixed_interval": "2w"}}})
        with pytest.raises(ValueError, match="sub-second"):
            compile_aggs({"x": {"date_histogram": {
                "field": "ts", "fixed_interval": "500ms"}}})


class TestTermsPaging:
    def _df(self, spark):
        rows = []
        for i in range(60):
            rows.append((i, f"t{i % 12}", "red" if i % 2 else "blue"))
        return spark.createDataFrame(rows, "id long, term string, c string")

    def test_multi_terms(self, spark):
        from pyspark.sql import functions as F
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        df = self._df(spark).withColumn(
            "term", F.when(F.col("id") < 55, F.col("term"))
        )
        rows = apply_aggs(df, {"mt": {"multi_terms": {
            "terms": [{"field": "term"}, {"field": "c"}], "size": 3}}},
        ).collect()
        # 55 docs have both fields; keys are 'tN|color'; top-3 by
        # count desc then key asc
        got = [(r.mt, r.doc_count) for r in rows]
        assert len(got) == 3
        assert all("|" in k for k, _ in got)
        assert got == sorted(got, key=lambda kv: (-kv[1], kv[0]))

    def test_show_doc_count_error_single_shard(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        rows = apply_aggs(self._df(spark), {"t": {"terms": {
            "field": "term", "size": 5,
            "show_term_doc_count_error": True}}}).collect()
        assert len(rows) == 5
        assert all(r.doc_count_error_upper_bound == 0 for r in rows)
        assert all(r.doc_count == 5 for r in rows)

    def test_sharded_terms_error_bounds(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        # 12 terms, 5 docs each, scattered over 4 md5 shards with
        # shard_size 2: the coordinator merge undercounts and the
        # bound is the sum of uncovered shard thresholds
        rows = apply_aggs(self._df(spark), {"t": {"terms": {
            "field": "term", "size": 4, "shards": 4, "shard_size": 2,
            "shard_key": "id", "show_term_doc_count_error": True}}},
        ).collect()
        assert len(rows) == 4
        assert all(r.doc_count <= 5 for r in rows)
        assert all(r.doc_count_error_upper_bound >= 0 for r in rows)
        # every shard returned a cut list (12 terms > shard_size 2),
        # so any term missing somewhere carries a positive bound
        assert any(r.doc_count_error_upper_bound > 0 for r in rows)

    def test_sharded_plan_time_validation(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            compile_aggs,
        )

        with pytest.raises(ValueError, match="shard_key"):
            compile_aggs({"t": {"terms": {"field": "term", "size": 3,
                                          "shards": 4}}})
        with pytest.raises(ValueError, match="explicit size"):
            compile_aggs({"t": {"terms": {"field": "term", "shards": 4,
                                          "shard_key": "id"}}})
        with pytest.raises(ValueError, match="top level"):
            compile_aggs({"o": {"terms": {"field": "c"}, "aggs": {
                "t": {"terms": {"field": "term", "size": 3,
                                "shards": 4, "shard_key": "id"}}}}})
        with pytest.raises(ValueError, match="sub-aggs"):
            compile_aggs({"t": {"terms": {"field": "term", "size": 3,
                                          "shards": 4,
                                          "shard_key": "id"},
                                "aggs": {"m": {"sum": {"field": "id"}}}}})

    def test_request_body_default_size(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        df = self._df(spark)
        # 12 distinct terms: the analytics API returns all of them,
        # the request body applies ES's default size=10
        assert apply_aggs(
            df, {"t": {"terms": {"field": "term"}}}).count() == 12
        assert run_search_body(
            df, {"aggs": {"t": {"terms": {"field": "term"}}}}).count() == 10


class TestRound5Aggs:
    def _df(self, spark):
        rows = [(i, float(i % 7), f"k{i % 15}",
                 f"2024-01-0{1 + i % 3} 0{i % 5}:10:00") for i in range(60)]
        return spark.createDataFrame(
            rows, "id long, v double, k string, ts string"
        ).selectExpr("id", "v", "k", "CAST(ts AS TIMESTAMP) AS ts")

    def test_boxplot(self, spark):
        r = apply_aggs(
            spark.createDataFrame([(float(x),) for x in range(1, 10)],
                                  "v double"),
            {"b": {"boxplot": {"field": "v"}}},
        ).collect()[0]
        assert (r.b["min"], r.b["q1"], r.b["q2"], r.b["q3"],
                r.b["max"]) == (1.0, 3.0, 5.0, 7.0, 9.0)

    def test_median_absolute_deviation(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 100.0),
             ("b", 5.0)], "k string, v double")
        rows = apply_aggs(df, {"per_k": {"terms": {"field": "k"},
            "aggs": {"mad": {"median_absolute_deviation":
                             {"field": "v"}}}}}).collect()
        got = {r.per_k: r.mad for r in rows}
        # a: median 2.5, |dev| = [1.5, .5, .5, 97.5] -> median 1.0
        assert got == {"a": 1.0, "b": 0.0}

    def test_top_metrics(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0, 10.0), ("a", 9.0, 20.0), ("b", 5.0, 30.0)],
            "k string, score double, val double")
        rows = apply_aggs(df, {"per_k": {"terms": {"field": "k"},
            "aggs": {"best": {"top_metrics": {
                "metrics": [{"field": "val"}],
                "sort": [{"score": {"order": "desc"}}]}}}}}).collect()
        got = {r.per_k: r.best_val for r in rows}
        assert got == {"a": 20.0, "b": 30.0}

    def test_rate(self, spark):
        df = self._df(spark)
        rows = apply_aggs(df, {"per_day": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {"per_hour": {"rate": {"field": "v",
                                           "unit": "hour"}},
                     "total": {"sum": {"field": "v"}}}}}).collect()
        for r in rows:
            assert abs(r.per_hour - r.total / 24.0) < 1e-9
        with pytest.raises(ValueError, match="FIXED-length"):
            compile_aggs({"m": {
                "date_histogram": {"field": "ts",
                                   "calendar_interval": "month"},
                "aggs": {"r": {"rate": {"unit": "day"}}}}})

    def test_rare_terms_prunes_descendants(self, spark):
        df = spark.createDataFrame(
            [("common", i) for i in range(5)] + [("rare1", 0),
             ("rare2", 1)], "k string, id long")
        rows = apply_aggs(df, {"rt": {"rare_terms":
            {"field": "k", "max_doc_count": 1},
            "aggs": {"per_id": {"terms": {"field": "id"}}}}}).collect()
        tops = {r.rt for r in rows if r.agg_path == "rt"}
        assert tops == {"rare1", "rare2"}
        kids = {(r.rt, r.per_id) for r in rows if r.agg_path == "rt>per_id"}
        assert kids == {("rare1", 0), ("rare2", 1)}

    def test_terms_min_doc_count(self, spark):
        df = spark.createDataFrame(
            [("a",)] * 3 + [("b",)] * 2 + [("c",)], "k string")
        rows = apply_aggs(df, {"t": {"terms": {"field": "k",
                                               "min_doc_count": 2}}},
        ).collect()
        assert {(r.t, r.doc_count) for r in rows} == {("a", 3), ("b", 2)}

    def test_histogram_offset_and_bounds(self, spark):
        df = spark.createDataFrame(
            [(3.0,), (8.0,), (23.0,)], "v double")
        rows = apply_aggs(df, {"h": {"histogram": {
            "field": "v", "interval": 10, "offset": 2,
            "min_doc_count": 0,
            "extended_bounds": {"min": -8, "max": 35}}}},
        ).orderBy("h").collect()
        got = [(r.h, r.doc_count) for r in rows]
        # offset 2 grid: ..., -8, 2, 12, 22, 32; 3.0 and 8.0 -> 2,
        # 23 -> 22; extended bounds stretch -8..32
        assert got == [(-8.0, 0), (2.0, 2), (12.0, 0), (22.0, 1),
                       (32.0, 0)]
        rows = apply_aggs(df, {"h": {"histogram": {
            "field": "v", "interval": 10,
            "hard_bounds": {"min": 0, "max": 10}}}}).collect()
        assert {(r.h, r.doc_count) for r in rows} == {(0.0, 2)}

    def test_date_histogram_extended_bounds(self, spark):
        import datetime as dt

        df = spark.createDataFrame(
            [(dt.datetime(2024, 1, 2),)], "ts timestamp")
        rows = apply_aggs(df, {"d": {"date_histogram": {
            "field": "ts", "calendar_interval": "day",
            "min_doc_count": 0,
            "extended_bounds": {"min": "2024-01-01",
                                "max": "2024-01-04"}}}},
        ).orderBy("d").collect()
        assert [(r.d, r.doc_count) for r in rows] == [
            ("2024-01-01", 0), ("2024-01-02", 1), ("2024-01-03", 0),
            ("2024-01-04", 0)]


class TestRound5AggsExtras:
    def test_terms_include_exclude(self, spark):
        df = spark.createDataFrame(
            [("aa",), ("ab",), ("bb",), ("aa",)], "k string")
        rows = apply_aggs(df, {"t": {"terms": {"field": "k",
                                               "include": "a.*"}}},
        ).collect()
        assert {(r.t, r.doc_count) for r in rows} == {("aa", 2), ("ab", 1)}
        rows = apply_aggs(df, {"t": {"terms": {"field": "k",
                                               "exclude": ["aa"]}}},
        ).collect()
        assert {(r.t, r.doc_count) for r in rows} == {("ab", 1), ("bb", 1)}

    def test_filters_other_bucket(self, spark):
        df = spark.createDataFrame(
            [(1,), (5,), (50,)], "n long")
        rows = apply_aggs(df, {"f": {"filters": {
            "filters": {"small": {"range": {"n": {"lt": 10}}}},
            "other_bucket_key": "rest"}}}).collect()
        assert {(r.f, r.doc_count) for r in rows} == {
            ("small", 2), ("rest", 1)}

    def test_histogram_and_dh_missing(self, spark):
        import datetime as dt

        df = spark.createDataFrame(
            [(1.0,), (None,)], "v double")
        rows = apply_aggs(df, {"h": {"histogram": {
            "field": "v", "interval": 10, "missing": 25.0}}}).collect()
        assert {(r.h, r.doc_count) for r in rows} == {(0.0, 1), (20.0, 1)}
        df2 = spark.createDataFrame(
            [(dt.datetime(2024, 1, 2),), (None,)], "ts timestamp")
        rows = apply_aggs(df2, {"d": {"date_histogram": {
            "field": "ts", "calendar_interval": "day",
            "missing": "2024-01-05"}}}).collect()
        assert {(r.d, r.doc_count) for r in rows} == {
            ("2024-01-02", 1), ("2024-01-05", 1)}

    def test_significant_text(self, spark):
        base = spark.createDataFrame(
            [(1, "spark rocks", True), (2, "spark crash oom", True),
             (3, "spark ok", False), (4, "spark fine", False),
             (5, "spark crash disk", True), (6, "spark good", False)],
            "id long, text string, err boolean",
        )
        fg = base.filter("err")
        rows = apply_aggs(fg, {"sig": {"significant_text":
                                       {"field": "text", "size": 2}}},
                          base_df=base).collect()
        got = {r.sig: (r.doc_count, r.bg_count) for r in rows}
        # 'crash' appears in 2/3 fg docs and 2/6 bg docs -> strongly
        # significant; 'spark' is everywhere -> filtered (fg rate ==
        # bg rate)
        assert "crash" in got and got["crash"] == (2, 2)
        assert "spark" not in got


class TestSamplersAndReverseNested:
    """Round-6: sampler / diversified_sampler / reverse_nested as
    request-body aggregations."""

    def test_sampler_trims_doc_set(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        df = spark.createDataFrame(
            [(i, f"s{i % 3}", i * 10) for i in range(10)],
            "doc_id long, src string, n long",
        )
        rows = {
            r.agg_path: r
            for r in apply_aggs(df, {"samp": {
                "sampler": {"shard_size": 4},
                "aggs": {"tot": {"sum": {"field": "n"}}},
            }}).collect()
        }
        # deterministic: first 4 docs by doc_id -> n = 0+10+20+30
        assert rows["samp"].doc_count == 4
        assert rows["samp"].tot == 60

    def test_diversified_sampler_caps_per_value(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        df = spark.createDataFrame(
            [(i, "a" if i < 8 else "b") for i in range(10)],
            "doc_id long, src string",
        )
        rows = {
            r.agg_path: r
            for r in apply_aggs(df, {"div": {
                "diversified_sampler": {
                    "field": "src", "max_docs_per_value": 2,
                    "shard_size": 10,
                },
                "aggs": {"n": {"value_count": {"field": "doc_id"}}},
            }}).collect()
        }
        assert rows["div"].doc_count == 4  # 2 per src value
        import pytest as _pt

        with _pt.raises(ValueError, match="field"):
            apply_aggs(df, {"div": {"diversified_sampler": {
                "shard_size": 5}}, })

    def test_reverse_nested_counts_parents(self, spark):
        from pyspark.sql import Row

        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )

        odf = spark.createDataFrame(
            [(1, "A", [Row(f="R"), Row(f="N")]),
             (2, "B", [Row(f="R"), Row(f="R")]),
             (3, "A", [Row(f="N")])],
            "doc_id long, status string, items array<struct<f:string>>",
        )
        rows = {
            r.agg_path: r
            for r in apply_aggs(odf, {"it": {
                "nested": {"path": "items"},
                "aggs": {"ret": {
                    "filter": {"term": {"items.f": "R"}},
                    "aggs": {"par": {
                        "reverse_nested": {},
                        "aggs": {"by_s": {"terms": {"field": "status"}}},
                    }},
                }},
            }}).collect()
        }
        assert rows["it"].doc_count == 5  # nested docs
        assert rows["it>ret"].doc_count == 3  # R elements
        assert rows["it>ret>par"].doc_count == 2  # parents with an R
        import pytest as _pt

        with _pt.raises(ValueError, match="only allowed under"):
            apply_aggs(odf, {"par": {"reverse_nested": {}}})
