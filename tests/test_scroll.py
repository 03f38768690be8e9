"""Scroll / point-in-time export (operators/scroll.py): disjoint,
exhaustive pages pinned against concurrent appends."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.operators.scroll import (
    open_pit,
    run_scroll,
    run_scroll_union,
)


def _write(spark, path, lo, hi, mode="overwrite"):
    spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("grp"),
    ).write.mode(mode).parquet(path)


class TestScroll:
    def test_pages_disjoint_and_exhaustive(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _write(spark, path, 0, 53)
        df = spark.read.parquet(path)
        body = {"sort": [{"doc_id": "asc"}]}
        pages = list(run_scroll(df, body, page_size=20))
        assert [len(p) for p in pages] == [20, 20, 13]
        seen = [r["doc_id"] for p in pages for r in p]
        assert seen == list(range(53))  # in order, no dup, no gap

    def test_ties_at_page_boundary(self, spark, tmp_path):
        # low-cardinality sort key: ties MUST split cleanly across the
        # boundary via the _doc tie-break cursor value
        path = str(tmp_path / "t")
        _write(spark, path, 0, 30)
        df = spark.read.parquet(path)
        pages = list(
            run_scroll(df, {"sort": [{"grp": "asc"}]}, page_size=7)
        )
        seen = sorted(r["doc_id"] for p in pages for r in p)
        assert seen == list(range(30))
        flat = [r["doc_id"] for p in pages for r in p]
        assert len(flat) == len(set(flat))

    def test_pit_pins_file_listing(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _write(spark, path, 0, 40)
        pit = open_pit(spark, path)
        body = {"sort": [{"doc_id": "asc"}]}
        it = run_scroll(pit, body, page_size=25)
        first = next(it)
        _write(spark, path, 100, 130, mode="append")
        rest = [r["doc_id"] for p in it for r in p]
        got = sorted([r["doc_id"] for r in first] + rest)
        assert got == list(range(40))  # appended 100.. invisible
        # a fresh (non-PIT) read DOES see the appended rows
        assert spark.read.parquet(path).count() == 70

    def test_union_page_ordinals(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _write(spark, path, 0, 11)
        df = spark.read.parquet(path)
        out = run_scroll_union(
            df, {"sort": [{"doc_id": "asc"}]}, page_size=5
        ).toPandas()
        assert out.groupby("page").size().tolist() == [5, 5, 1]

    def test_plan_time_validation(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _write(spark, path, 0, 5)
        df = spark.read.parquet(path)
        with pytest.raises(ValueError, match="explicit sort"):
            next(run_scroll(df, {}, 5))
        with pytest.raises(ValueError, match="scrollable"):
            next(run_scroll(df, {"sort": ["_score"]}, 5))
        with pytest.raises(ValueError, match="drives"):
            next(run_scroll(
                df, {"sort": [{"doc_id": "asc"}], "size": 3}, 5))
        with pytest.raises(ValueError, match="cursor columns"):
            next(run_scroll(
                df, {"sort": [{"grp": "asc"}], "_source": ["grp"]}, 5))
