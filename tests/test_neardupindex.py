"""Persistent cross-batch near-dup index (sinks/neardupindex.py):
within-batch greedy semantics, cross-batch suppression through the
stored index, and replay idempotence under at-least-once delivery."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cga_kinesis_to_elasticsearch_spark.sinks.neardupindex import (
    neardup_against_index,
    read_neardup_index,
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ids(df):
    return sorted(r.doc_id for r in df.collect())


class TestNearDupIndex:
    def test_within_batch_keep_first(self, spark, tmp_path):
        batch = _docs(
            spark,
            [
                (1, BASE),
                (2, BASE.replace("today", "tomorrow")),  # near-dup of 1
                (9, "entirely different text about parquet row group statistics"),
            ],
        )
        out = neardup_against_index(spark, batch, tmp_path, "text", "doc_id")
        assert _ids(out) == [1, 9]

    def test_cross_batch_suppression(self, spark, tmp_path):
        b1 = _docs(spark, [(1, BASE)])
        b2 = _docs(
            spark,
            [
                (5, BASE.replace("today", "tonight")),  # near-dup of stored 1
                (6, "unrelated content mentioning bloom filters and sketches"),
            ],
        )
        s1 = neardup_against_index(spark, b1, tmp_path, "text", "doc_id")
        assert _ids(s1) == [1]
        s2 = neardup_against_index(spark, b2, tmp_path, "text", "doc_id")
        assert _ids(s2) == [6]

    def test_replay_reproduces_original_survivors(self, spark, tmp_path):
        b1 = _docs(spark, [(1, BASE), (2, BASE.replace("quick", "swift"))])
        first = _ids(neardup_against_index(spark, b1, tmp_path, "text", "doc_id"))
        replay = _ids(neardup_against_index(spark, b1, tmp_path, "text", "doc_id"))
        assert first == replay == [1]

    def test_index_stores_only_survivor_bands(self, spark, tmp_path):
        b1 = _docs(spark, [(1, BASE), (2, BASE.replace("quick", "swift"))])
        neardup_against_index(spark, b1, tmp_path, "text", "doc_id")
        idx = read_neardup_index(spark, tmp_path)
        assert {r.first_id for r in idx.collect()} == {1}

    def test_bands_never_store_text(self, spark, tmp_path):
        b1 = _docs(spark, [(1, BASE)])
        neardup_against_index(spark, b1, tmp_path, "text", "doc_id")
        idx = read_neardup_index(spark, tmp_path)
        assert set(idx.columns) == {"band_id", "band_key", "first_id"}
