"""Percolator operator."""

from __future__ import annotations

from pyspark.sql import Row

from cga_kinesis_to_elasticsearch_spark.operators.percolate import percolate


def _queries(spark):
    return spark.createDataFrame(
        [
            ("all2", ["a", "b"], []),
            ("not_c", ["a"], ["c"]),
            ("never", ["zzz"], []),
        ],
        "query_id string, must array<string>, must_not array<string>",
    )


class TestPercolate:
    def test_must_and_must_not(self, spark):
        toks = spark.createDataFrame(
            [
                # doc 1: a b      -> all2, not_c
                Row(doc_id=1, token="a"),
                Row(doc_id=1, token="b"),
                # doc 2: a c      -> banned from not_c; missing b
                Row(doc_id=2, token="a"),
                Row(doc_id=2, token="c"),
                # doc 3: b only   -> nothing (conjunction incomplete)
                Row(doc_id=3, token="b"),
            ]
        )
        got = {
            (r["doc_id"], r["query_id"])
            for r in percolate(toks, _queries(spark)).collect()
        }
        assert got == {(1, "all2"), (1, "not_c")}

    def test_duplicate_tokens_do_not_fake_conjunction(self, spark):
        # doc with 'a' twice must NOT satisfy must=[a, b]: the operator
        # contract takes a term SET, so this guards the distinct() the
        # caller applies — duplicated input is a caller bug, but the
        # count decomposition itself must not double-count distinct
        # pairs after dedup
        toks = spark.createDataFrame(
            [Row(doc_id=1, token="a"), Row(doc_id=1, token="b")]
        ).distinct()
        got = {
            r["query_id"] for r in percolate(toks, _queries(spark)).collect()
        }
        assert "all2" in got

    def test_no_cross_product_in_plan(self, spark):
        toks = spark.createDataFrame([Row(doc_id=1, token="a")])
        plan = percolate(toks, _queries(spark))._jdf.queryExecution(
        ).executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
