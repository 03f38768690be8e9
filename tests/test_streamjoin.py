"""Stream-stream time-bounded join (streaming/joins.py) and sink
compaction (sinks/compact.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.io import load_table
from cga_kinesis_to_elasticsearch_spark.streaming.joins import time_bounded_join


@pytest.fixture(scope="module")
def split_events(spark, sf_dir, tmp_path_factory):
    """Clicks and purchases from the events table, written out as two
    file-source dirs so they can be read as streams."""
    d = tmp_path_factory.mktemp("ssj")
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks.write.parquet(str(d / "clicks"))
    purchases.write.parquet(str(d / "purchases"))
    return d, clicks, purchases


def _run_stream_join(spark, d, watermark_delay, name, max_files=2):
    clicks = (
        spark.readStream.schema("click_id bigint, user_id bigint, click_ts timestamp")
        .option("maxFilesPerTrigger", max_files)
        .parquet(str(d / "clicks"))
    )
    purchases = spark.readStream.schema(
        "purchase_id bigint, user_id bigint, purchase_ts timestamp"
    ).parquet(str(d / "purchases"))
    joined = time_bounded_join(
        purchases,
        clicks,
        on=["user_id"],
        left_time="purchase_ts",
        right_time="click_ts",
        lower="30 minutes",
        upper="0 seconds",
        watermark_delay=watermark_delay,
    )
    query = (
        joined.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(d / f"ck-{name}"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)


class TestStreamStreamJoin:
    def test_matches_batch_join(self, spark, split_events):
        """With a watermark beyond the data's time span (no state
        eviction), the streaming result IS the batch inequality join."""
        d, clicks, purchases = split_events
        batch = time_bounded_join(
            purchases,
            clicks,
            on=["user_id"],
            left_time="purchase_ts",
            right_time="click_ts",
            lower="30 minutes",
            upper="0 seconds",
        )
        streamed = _run_stream_join(spark, d, "365 days", "ssj_full")
        assert batch.count() > 0
        assert streamed.exceptAll(batch).count() == 0
        assert batch.exceptAll(streamed).count() == 0

    def test_short_watermark_is_subset(self, spark, split_events):
        """A short watermark may evict state before the matching side
        arrives: the result must be a subset of the batch join, never
        contain spurious rows."""
        d, clicks, purchases = split_events
        batch = time_bounded_join(
            purchases,
            clicks,
            on=["user_id"],
            left_time="purchase_ts",
            right_time="click_ts",
            lower="30 minutes",
            upper="0 seconds",
        )
        streamed = _run_stream_join(spark, d, "1 minute", "ssj_short", max_files=1)
        assert streamed.exceptAll(batch).count() == 0

    def test_refuses_keyless_join(self, spark, split_events):
        _, clicks, purchases = split_events
        with pytest.raises(ValueError, match="equality key"):
            time_bounded_join(
                purchases, clicks, [], "purchase_ts", "click_ts", "30 minutes", "0 seconds"
            )

    def test_refuses_ambiguous_columns(self, spark, split_events):
        _, clicks, _ = split_events
        other = clicks.withColumnRenamed("click_id", "purchase_id")
        with pytest.raises(ValueError, match="ambiguous"):
            time_bounded_join(
                other,
                clicks,
                ["user_id"],
                "click_ts",
                "click_ts",
                "30 minutes",
                "0 seconds",
            )


class TestCompaction:
    def test_compacts_and_preserves_data(self, spark, sf_dir, tmp_path):
        from cga_kinesis_to_elasticsearch_spark.sinks.compact import compact_index

        root = tmp_path / "data"
        ev = load_table(spark, sf_dir, "events").withColumn(
            "es_index",
            F.concat(F.lit("gorouter-"), F.date_format("ts", "yyyy-MM-dd")),
        )
        # simulate many micro-batch appends -> many small files/partition
        for _ in range(3):
            ev.repartition(8).write.partitionBy("es_index").mode("append").parquet(
                str(root)
            )
        # materialize the pre-compaction contents: the rewrite replaces
        # the files a lazy read would reference
        before = spark.read.parquet(str(root)).toPandas()
        n_before = len(before)
        stats = compact_index(spark, root, target_file_bytes=1 << 30)
        assert stats.partitions_compacted == stats.partitions_examined > 0
        assert stats.files_after < stats.files_before
        # every compacted partition collapsed to the byte-optimal single file
        assert stats.files_after == stats.partitions_compacted
        after = spark.read.parquet(str(root)).toPandas()
        assert len(after) == n_before
        key = ["event_id"]
        a = before.sort_values(key).reset_index(drop=True).sort_index(axis=1)
        b = after.sort_values(key).reset_index(drop=True).sort_index(axis=1)
        import pandas.testing as pdt

        pdt.assert_frame_equal(a, b, check_like=True, check_categorical=False)
        # idempotent: second run is a no-op
        again = compact_index(spark, root, target_file_bytes=1 << 30)
        assert again.partitions_compacted == 0
        assert again.files_after == stats.files_after

    def test_skips_small_partitions_and_markers(self, spark, tmp_path):
        from cga_kinesis_to_elasticsearch_spark.sinks.compact import compact_index

        root = tmp_path / "data"
        df = spark.range(10).withColumn("es_index", F.lit("gorouter-2024-01-01"))
        df.coalesce(1).write.partitionBy("es_index").parquet(str(root))
        stats = compact_index(spark, root)
        assert stats.partitions_examined == 1
        assert stats.partitions_compacted == 0


class TestCascadedThreeWayJoin:
    """Cascaded (3-stream) join: the declared query pins full batch
    equivalence at sf0.01; here, the mechanics on a tiny fixture —
    chain wiring (stamp_right=False), single event-time column rule,
    and hop-window semantics."""

    def test_chain_matches_batch(self, spark, tmp_path):
        import datetime as dt

        base = dt.datetime(2024, 1, 1, 12, 0, 0)

        def t(mins):
            return base + dt.timedelta(minutes=mins)

        views = [(100, 1, t(0)), (101, 2, t(0))]
        clicks = [(200, 1, t(10)), (201, 2, t(90))]  # u2 click outside 60m
        purchases = [(300, 1, t(30)), (301, 2, t(95))]
        spark.createDataFrame(
            views, "view_id long, user_id long, view_ts timestamp"
        ).write.parquet(str(tmp_path / "v"))
        spark.createDataFrame(
            clicks, "click_id long, user_id long, click_ts timestamp"
        ).write.parquet(str(tmp_path / "c"))
        spark.createDataFrame(
            purchases, "purchase_id long, user_id long, purchase_ts timestamp"
        ).write.parquet(str(tmp_path / "p"))

        v = spark.readStream.schema(
            "view_id long, user_id long, view_ts timestamp"
        ).parquet(str(tmp_path / "v"))
        c = spark.readStream.schema(
            "click_id long, user_id long, click_ts timestamp"
        ).parquet(str(tmp_path / "c"))
        p = spark.readStream.schema(
            "purchase_id long, user_id long, purchase_ts timestamp"
        ).parquet(str(tmp_path / "p"))

        hop1 = time_bounded_join(
            c, v, on=["user_id"], left_time="click_ts",
            right_time="view_ts", lower="60 minutes", upper="0 seconds",
            watermark_delay="365 days",
        ).select(
            "user_id", "view_id",
            F.unix_millis("view_ts").alias("view_ms"),
            "click_id", "click_ts",
        )
        hop2 = time_bounded_join(
            p, hop1, on=["user_id"], left_time="purchase_ts",
            right_time="click_ts", lower="60 minutes", upper="0 seconds",
            watermark_delay="365 days", stamp_right=False,
        )
        q = (
            hop2.writeStream.format("memory").queryName("t3wj")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        rows = [
            (r["user_id"], r["view_id"], r["click_id"], r["purchase_id"])
            for r in spark.table("t3wj").collect()
        ]
        # u1: view->click(+10m)->purchase(+30m) completes; u2's click
        # is 90m after the view -> hop1 drops it, so no funnel row
        assert rows == [(1, 100, 200, 300)]
