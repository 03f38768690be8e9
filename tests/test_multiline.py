"""Multiline log reassembly (operators/multiline.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cga_kinesis_to_elasticsearch_spark.operators.multiline import (
    reassemble_multiline,
)


def _lines(spark, rows):
    return spark.createDataFrame(rows, "stream string, ord long, line string")


class TestMultiline:
    def test_stack_trace_reassembly(self, spark):
        rows = [
            ("a", 1, "ERROR boom"),
            ("a", 2, "  at Foo.bar"),
            ("a", 3, "  at Baz.qux"),
            ("a", 4, "INFO fine"),
            ("b", 1, "WARN hmm"),
        ]
        out = {
            (r.stream, r.event_no): (r.message, r.n_lines, r.first_order)
            for r in reassemble_multiline(
                _lines(spark, rows), "line", "stream", "ord", r"^(ERROR|INFO|WARN)"
            ).collect()
        }
        assert out[("a", 1)] == ("ERROR boom\n  at Foo.bar\n  at Baz.qux", 3, 1)
        assert out[("a", 2)] == ("INFO fine", 1, 4)
        assert out[("b", 1)] == ("WARN hmm", 1, 1)

    def test_orphan_continuations_kept_as_event_zero(self, spark):
        rows = [
            ("a", 1, "  dangling tail of a previous file"),
            ("a", 2, "ERROR real start"),
        ]
        out = {
            r.event_no: r.message
            for r in reassemble_multiline(
                _lines(spark, rows), "line", "stream", "ord", r"^ERROR"
            ).collect()
        }
        assert out[0] == "  dangling tail of a previous file"
        assert out[1] == "ERROR real start"

    def test_order_column_drives_assembly_not_input_order(self, spark):
        rows = [
            ("a", 3, "  second cont"),
            ("a", 1, "ERROR start"),
            ("a", 2, "  first cont"),
        ]
        out = reassemble_multiline(
            _lines(spark, rows), "line", "stream", "ord", r"^ERROR"
        ).collect()
        assert len(out) == 1
        assert out[0].message == "ERROR start\n  first cont\n  second cont"

    def test_streams_are_independent(self, spark):
        rows = [
            ("a", 1, "ERROR a1"),
            ("b", 2, "  continuation in b only"),
            ("a", 3, "  cont of a1"),
        ]
        out = {
            (r.stream, r.event_no)
            for r in reassemble_multiline(
                _lines(spark, rows), "line", "stream", "ord", r"^ERROR"
            ).collect()
        }
        assert out == {("a", 1), ("b", 0)}
