"""Streaming dedup (streaming/dedup.py): bounded-state duplicate
suppression via dropDuplicatesWithinWatermark, batch degeneration to
dropDuplicates."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.streaming.dedup import stream_dedup


def _write(spark, path, rows):
    spark.createDataFrame(rows, "arrival_ts timestamp, text string").coalesce(
        1
    ).write.mode("append").parquet(str(path))


class TestStreamDedup:
    def test_batch_mode_drops_normalized_dups(self, spark):
        df = spark.createDataFrame(
            [
                (dt.datetime(2024, 1, 1), "Hello, World"),
                (dt.datetime(2024, 1, 2), "hello world!"),  # normalized dup
                (dt.datetime(2024, 1, 3), "different"),
            ],
            "arrival_ts timestamp, text string",
        )
        out = stream_dedup(df, "arrival_ts")
        assert out.count() == 2
        texts = {r.text.lower().rstrip("!,") for r in out.collect()}
        assert any("different" in t for t in texts)

    def test_streaming_suppresses_cross_batch_duplicates(self, spark, tmp_path):
        t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
        src = tmp_path / "src"
        src.mkdir()
        _write(spark, src, [(t0, "doc one"), (t0, "doc two"), (t0, "doc one")])

        stream = (
            spark.readStream.schema("arrival_ts timestamp, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = stream_dedup(stream, "arrival_ts", delay="10 minutes")
        rows = []
        q = (
            out.writeStream.foreachBatch(lambda b, _i: rows.extend(b.collect()))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            time.sleep(3)
            # second batch: a duplicate within the watermark horizon and
            # one fresh doc — only the fresh one may come through
            _write(
                spark,
                src,
                [
                    (t0 + dt.timedelta(minutes=1), "doc one"),
                    (t0 + dt.timedelta(minutes=1), "doc three"),
                ],
            )
            deadline = time.time() + 90
            while time.time() < deadline and len(rows) < 3:
                time.sleep(2)
        finally:
            q.stop()
        texts = sorted(r.text for r in rows)
        assert texts == ["doc one", "doc three", "doc two"]
