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


class TestSceneChanges:
    """detect_scene_changes (operators/multimodal.py) on constructed
    frame sets with known boundaries."""

    def test_boundary_fires_on_content_shift(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.multimodal import (
            detect_scene_changes,
        )

        # frames 0-1 identical, frame 2 totally different byte profile
        rows = [(1, [b"aaaaaaaa", b"aaaaaaaa", b"cccccccc"])]
        df = spark.createDataFrame(rows, "doc_id long, frames array<binary>")
        out = {r.frame_idx: r for r in detect_scene_changes(df).collect()}
        assert out[0].dist_prev is None and not out[0].is_scene_change
        assert out[1].dist_prev == 0.0 and not out[1].is_scene_change
        assert out[2].dist_prev > 0.25 and out[2].is_scene_change

    def test_gradual_drift_stays_below_threshold(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.multimodal import (
            detect_scene_changes,
        )

        rows = [(1, [b"aaaaaaab", b"aaaaaabb", b"aaaaabbb"])]
        df = spark.createDataFrame(rows, "doc_id long, frames array<binary>")
        out = detect_scene_changes(df).collect()
        assert not any(r.is_scene_change for r in out)


class TestAudioSegments:
    def test_segments_merge_contiguous_activity(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.multimodal import (
            audio_energy_segments,
        )

        # 4 windows of 2 bytes: loud, loud, quiet, loud
        payload = bytes([250, 250, 250, 250, 5, 5, 250, 250])
        df = spark.createDataFrame([(1, payload)], "doc_id long, media binary")
        out = sorted(
            audio_energy_segments(df, window_bytes=2).collect(),
            key=lambda r: r.segment_no,
        )
        got = [(r.active, r.n_windows, r.from_window, r.to_window) for r in out]
        assert got == [(True, 2, 0, 1), (False, 1, 2, 2), (True, 1, 3, 3)]

    def test_all_silent_is_one_segment(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.multimodal import (
            audio_energy_segments,
        )

        df = spark.createDataFrame([(1, bytes(8))], "doc_id long, media binary")
        out = audio_energy_segments(df, window_bytes=2).collect()
        assert len(out) == 1 and not out[0].active and out[0].n_windows == 4
