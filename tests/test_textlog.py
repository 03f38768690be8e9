"""Text-log source: grok stream parse (G8) in batch and streaming."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.grok import default_grok
from cga_kinesis_to_elasticsearch_spark.sources.textlog import (
    read_log_batch,
    read_log_stream,
)

LINES = [
    "2024-01-01T10:00:00 kernel panic averted",
    "2024-01-02T11:30:00 disk almost full",
    "not a log line at all",
]


class TestBatch:
    def test_typed_parse(self, spark, tmp_path):
        (tmp_path / "a.log").write_text("\n".join(LINES) + "\n")
        g = default_grok()
        out = read_log_batch(spark, str(tmp_path), g, "LINUXMESSAGES")
        rows = {r.value: r.parsed for r in out.collect()}
        assert rows[LINES[0]].os_time == "2024-01-01T10:00:00"
        assert rows[LINES[0]].var_log_messages == "kernel panic averted"
        assert rows[LINES[2]] is None  # non-match -> NULL struct


class TestStream:
    def test_stream_matches_batch(self, spark, tmp_path):
        src = tmp_path / "logs"
        src.mkdir()
        (src / "a.log").write_text("\n".join(LINES) + "\n")
        g = default_grok()
        got = []
        q = (
            read_log_stream(spark, str(src), g, "LINUXMESSAGES")
            .writeStream.foreachBatch(lambda b, _i: got.extend(b.collect()))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        deadline = time.time() + 60
        while q.isActive and time.time() < deadline:
            q.awaitTermination(1)
        assert not q.isActive
        batch = read_log_batch(spark, str(src), g, "LINUXMESSAGES").collect()
        assert sorted(r.value for r in got) == sorted(r.value for r in batch)
        parsed = {r.value: r.parsed for r in got}
        assert parsed[LINES[1]].os_time == "2024-01-02T11:30:00"


class TestChunkTokensOverlap:
    def test_windows_and_offsets(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.text import (
            chunk_tokens_overlap,
        )

        df = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"),
             (3, "solo")],
            "doc_id long, text string",
        )
        rows = chunk_tokens_overlap(
            df, "text", "doc_id", chunk_size=4, stride=3
        ).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        # doc1: 10 tokens -> starts 0,3,6 (6+4=10 reaches the end)
        d1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
        assert [r.start_token for r in d1] == [0, 3, 6]
        assert d1[0].chunk_text == "t0 t1 t2 t3"
        assert d1[1].chunk_text == "t3 t4 t5 t6"  # 1-token overlap
        assert d1[2].chunk_text == "t6 t7 t8 t9"
        assert all(r.n_chunk_tokens == 4 for r in d1)
        # short docs: one window, ragged
        assert len(by_doc[2]) == 1 and by_doc[2][0].n_chunk_tokens == 2
        assert len(by_doc[3]) == 1
        # every token covered exactly (union of windows == doc)
        import pytest as _pt

        with _pt.raises(ValueError, match="stride"):
            chunk_tokens_overlap(df, "text", "doc_id", 4, 0)
        with _pt.raises(ValueError, match="stride"):
            chunk_tokens_overlap(df, "text", "doc_id", 4, 5)

    def test_ragged_tail_covered(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.text import (
            chunk_tokens_overlap,
        )

        df = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(11)))],
            "doc_id long, text string",
        )
        rows = sorted(
            chunk_tokens_overlap(
                df, "text", "doc_id", chunk_size=4, stride=3
            ).collect(),
            key=lambda r: r.chunk_id,
        )
        # 11 tokens: starts 0,3,6,9 — last window ragged (2 tokens)
        assert [r.start_token for r in rows] == [0, 3, 6, 9]
        assert rows[-1].n_chunk_tokens == 2
        covered = set()
        for r in rows:
            covered.update(
                range(r.start_token, r.start_token + r.n_chunk_tokens)
            )
        assert covered == set(range(11))
