"""Watermarked event-time windows (streaming/windows.py): late rows
within the threshold count; rows older than the watermark are dropped."""

from __future__ import annotations

import datetime as dt
import time

from cga_kinesis_to_elasticsearch_spark.streaming.windows import (
    late_drop_stats,
    windowed_counts,
)


def _write(spark, path, rows):
    spark.createDataFrame(rows, "arrival_ts timestamp, key string").coalesce(
        1
    ).write.mode("append").parquet(str(path))


class TestWatermarkedWindows:
    def test_batch_mode_equals_date_trunc(self, spark, sf_dir):
        from cga_kinesis_to_elasticsearch_spark.io import load_table
        from pyspark.sql import functions as F

        ev = load_table(spark, sf_dir, "events")
        out = windowed_counts(ev, ts_col="ts", key_col="event_type")
        expected = ev.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        ).count()
        got = {(r.window_start, r.event_type): r.n for r in out.collect()}
        exp = {(r.window_start, r.event_type): r["count"] for r in expected.collect()}
        assert got == exp

    def test_streaming_drops_too_late_rows(self, spark, tmp_path):
        t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

        def at(minutes):
            return t0 + dt.timedelta(minutes=minutes)

        src = tmp_path / "src"
        src.mkdir()
        # batch 1: two events in the 10:00 window, one at 12:05 that
        # pushes the watermark (12:05 - 10min) far past 11:00
        _write(spark, src, [(at(1), "a"), (at(2), "a"), (at(125), "a")])

        stream = (
            spark.readStream.schema("arrival_ts timestamp, key string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = windowed_counts(
            stream, key_col="key", window_duration="1 hour", late_threshold="10 minutes"
        )
        rows = []
        q = (
            out.writeStream.foreachBatch(lambda b, _i: rows.extend(b.collect()))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            # batch 2: a straggler for the long-finalized 10:00 window —
            # older than the watermark, must be dropped
            time.sleep(3)
            _write(spark, src, [(at(3), "a")])
            # batch 3: advance the watermark further so 10:00 emits
            time.sleep(3)
            _write(spark, src, [(at(250), "a")])
            deadline = time.time() + 90
            while time.time() < deadline and not any(
                r.window_start == t0 for r in rows
            ):
                time.sleep(2)
            stats = late_drop_stats(q)
        finally:
            q.stop()
        ten = [r for r in rows if r.window_start == t0]
        assert len(ten) == 1
        # 2 on-time rows; the too-late third never counted
        assert ten[0].n == 2
        # and the drop is OBSERVABLE: the progress metrics record it
        assert stats["rows_dropped_late"] >= 1
        assert stats["progress_reports"] >= 1


class TestSlidingWindows:
    def test_each_event_lands_in_window_over_slide_windows(self, spark):
        import datetime as dt
        from pyspark.sql import functions as F

        t = dt.datetime(2024, 1, 1, 10, 17, 0)  # bucket 10:15
        df = spark.createDataFrame([(t, "k")], "ts timestamp, key string")
        out = windowed_counts(
            df,
            ts_col="ts",
            key_col="key",
            window_duration="1 hour",
            slide_duration="15 minutes",
        )
        starts = sorted(
            r.window_start.strftime("%H:%M") for r in out.collect()
        )
        # 4 overlapping windows: 09:30..10:30 through 10:15..11:15
        assert starts == ["09:30", "09:45", "10:00", "10:15"]
        assert all(r.n == 1 for r in out.collect())

    def test_default_is_tumbling(self, spark):
        import datetime as dt

        t = dt.datetime(2024, 1, 1, 10, 17, 0)
        df = spark.createDataFrame([(t, "k")], "ts timestamp, key string")
        out = windowed_counts(df, ts_col="ts", key_col="key").collect()
        assert len(out) == 1 and out[0].window_start.hour == 10
