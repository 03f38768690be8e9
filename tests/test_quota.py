"""Per-key quota flagging via transformWithStateInPandas
(streaming/quota.py): cross-batch state, window rollover, per-key
isolation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.streaming.quota import quota_flag_stream


def _run(spark, tmp_path, rows_per_batch, limit, window_ms):
    """Feed batches through a file-based stream (one parquet file per
    batch, maxFilesPerTrigger=1 => deterministic batch boundaries)."""
    src = tmp_path / "src"
    for i, rows in enumerate(rows_per_batch):
        spark.createDataFrame(rows, "key string, ts_ms long, seq long").coalesce(
            1
        ).write.mode("append").parquet(str(src / f"b{i}"))
    stream = (
        spark.readStream.schema("key string, ts_ms long, seq long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = quota_flag_stream(stream, limit=limit, window_ms=window_ms)
    q = (
        out.writeStream.format("memory")
        .queryName("quota_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {r.seq: r.quota_exceeded for r in spark.table("quota_out").collect()}


class TestQuota:
    def test_flags_overflow_within_and_across_batches(self, spark, tmp_path):
        # limit 3 per 1000ms window; key "a" sends 5 in-window rows
        batches = [
            [("a", 0, 1), ("a", 10, 2), ("a", 20, 3)],
            [("a", 30, 4), ("a", 40, 5), ("b", 0, 6)],
        ]
        got = _run(spark, tmp_path, batches, limit=3, window_ms=1000)
        assert {k: got[k] for k in (1, 2, 3)} == {1: False, 2: False, 3: False}
        # state persisted across the batch boundary: 4 and 5 overflow
        assert got[4] and got[5]
        # other keys unaffected
        assert got[6] is False

    def test_window_rollover_resets_count(self, spark, tmp_path):
        batches = [
            [("a", 0, 1), ("a", 1, 2), ("a", 2, 3)],
            [("a", 5000, 4), ("a", 5001, 5)],
        ]
        got = _run(spark, tmp_path, batches, limit=2, window_ms=1000)
        assert got[3] is True  # third in-window row overflows
        assert got[4] is False and got[5] is False  # new window, reset


class TestQuotaBatchSemantics:
    def test_rows_preserved_exactly(self, spark, tmp_path):
        batches = [[("a", i, i) for i in range(7)]]
        got = _run(spark, tmp_path, batches, limit=100, window_ms=10**9)
        assert len(got) == 7 and not any(got.values())
