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
