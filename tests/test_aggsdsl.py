"""Aggregation-DSL interpreter semantics (operators/aggsdsl.py)."""

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
        got = {(r.per_day, r.per_bucket): (r.doc_count, r.avg_v) for r in rows}
        assert got[("2024-01-01", 0)] == (1, 10.0)
        assert got[("2024-01-01", 10)] == (1, 20.0)
        assert got[("2024-01-02", 20)] == (2, 35.0)

    def test_range_buckets_label_like_es(self, spark):
        rows = apply_aggs(
            _df(spark),
            {
                "bands": {
                    "range": {
                        "field": "n",
                        "ranges": [{"to": 10}, {"from": 10, "to": 20}, {"from": 20}],
                    }
                }
            },
        ).collect()
        got = {r.bands: r.doc_count for r in rows}
        assert got == {"*-10": 1, "10-20": 1, "20-*": 2}

    def test_metrics_only_single_row(self, spark):
        [r] = apply_aggs(
            _df(spark),
            {"total": {"sum": {"field": "n"}}, "mx": {"max": {"field": "v"}}},
        ).collect()
        assert r.doc_count == 4 and r.total == 70 and r.mx == 40.0

    def test_plan_time_validation(self, spark):
        with pytest.raises(ValueError, match="unsupported bucket"):
            compile_aggs({"x": {"geo_line": {"field": "k"}}})
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

    def test_single_exchange_plan(self, spark):
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
