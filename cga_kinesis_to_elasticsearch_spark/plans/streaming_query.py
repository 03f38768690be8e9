"""Declared query for the streaming path.

Runs the full Structured Streaming job — file-based raw-record source
(Kinesis stand-in), decode with poison bucketing, the parity pipeline
inside foreachBatch, ES-bulk-shaped day-partitioned sink — over
envelopes synthesized from the events table, then returns the sink
contents read back with doc-id dedup (T1). Deterministic: same input ->
same docs, so the driver's rows/schema check is stable across runs.
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from .declared import q
from ..operators.enrichment import flatten_dimensions
from ..pipeline import PipelineConfig
from ..sinks.bulk import ParquetIndexSink
from ..sources.envelopes import (
    ALLOWED_ORIGINS,
    synthesize_cf_dimensions,
    synthesize_envelopes,
)
from ..sources.records import read_raw_record_stream, write_raw_records
from ..streaming.job import StreamConfig, drain, run_stream


_ATTRIBUTION_ORACLE = """
SELECT p.user_id,
       p.event_id AS purchase_id,
       c.event_id AS click_id,
       epoch_ms(p.ts) AS purchase_ms,
       epoch_ms(c.ts) AS click_ms,
       round(p.value, 2) AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts BETWEEN p.ts - INTERVAL 30 MINUTE AND p.ts
"""


@q("stream_stream_attribution", _ATTRIBUTION_ORACLE)
def _stream_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream join, run to completion and checked
    against the equivalent *batch* join in DuckDB: purchases attributed
    to any click by the same user in the preceding 30 minutes.

    The watermark delay is set beyond the fixture's time span so no
    join state is evicted mid-run — the streaming result is then
    exactly the batch inequality join, which is what makes a SQL oracle
    possible for a streaming operator. Eviction semantics (short
    delays dropping matches) are pinned in tests/test_streamjoin.py.
    """
    from ..io import load_table
    from ..session import tune_session
    from ..streaming.joins import time_bounded_join

    tune_session(spark)
    work = Path(tempfile.mkdtemp(prefix="cga-ssj-"))
    try:
        ev = load_table(spark, sf_dir, "events")
        clicks_dir, purchases_dir = str(work / "clicks"), str(work / "purchases")
        ev.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        ).write.parquet(clicks_dir)
        ev.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        ).write.parquet(purchases_dir)

        clicks = spark.readStream.schema(
            "click_id bigint, user_id bigint, click_ts timestamp"
        ).parquet(clicks_dir)
        purchases = spark.readStream.schema(
            "purchase_id bigint, user_id bigint, purchase_ts timestamp,"
            " purchase_value double"
        ).parquet(purchases_dir)
        joined = time_bounded_join(
            purchases,
            clicks,
            on=["user_id"],
            left_time="purchase_ts",
            right_time="click_ts",
            lower="30 minutes",
            upper="0 seconds",
            watermark_delay="365 days",
        )
        name = "ssj_attribution"
        query = (
            joined.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(work / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        out = spark.table(name).select(
            "user_id",
            "purchase_id",
            "click_id",
            F.unix_millis("purchase_ts").alias("purchase_ms"),
            F.unix_millis("click_ts").alias("click_ms"),
            F.round("purchase_value", 2).alias("purchase_value"),
        )
        # materialize before the workdir disappears (executor-side)
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _streaming_oracle() -> str:
    """The batch pipeline replay (northstar._pipeline_oracle) restricted
    to the enabled-routes arm set and the sink's readback projection:
    the micro-batch run must land EXACTLY the batch pipeline's documents
    (SURVEY §5 item 4), so the same SQL verifies the streaming path —
    upgraded from the old rows-only check."""
    from .northstar import _pipeline_oracle

    return _pipeline_oracle(
        kept_arms="(5, 6, 7)",
        tail=""",
           CASE WHEN p.origin IN ('env1', 'env2')
                THEN coalesce(d.app_name, '') END AS cf_app,
           CASE WHEN p.origin IN ('env1', 'env2')
                THEN coalesce(d.org_name, '') END AS cf_org""",
    )


@q("streaming_pipeline", _streaming_oracle())
def _streaming_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = Path(tempfile.mkdtemp(prefix="cga-stream-"))
    try:
        raw_dir = work / "raw"
        # events.parquet is one row group -> one task; spread the raw
        # rows so envelope synthesis + to_json encode run on every core
        # (same fix pipeline_e2e carries); write_raw_records still
        # clusters by shard, so the per-shard-file layout (T3) is
        # unchanged and the oracle compares sorted rows anyway
        records = synthesize_envelopes(
            spark, sf_dir, partitions=spark.sparkContext.defaultParallelism
        )
        write_raw_records(records, str(raw_dir))
        dim = flatten_dimensions(*synthesize_cf_dimensions(spark))
        sink = ParquetIndexSink(work / "sink")
        query, metrics = run_stream(
            spark,
            read_raw_record_stream(spark, str(raw_dir)),
            lambda s: dim,
            sink,
            StreamConfig(
                checkpoint_location=str(work / "ck"),
                available_now=True,
                pipeline=PipelineConfig(allowed_origins=ALLOWED_ORIGINS),
            ),
        )
        drain(query)
        docs = sink.read_index(spark).select(
            "doc_id",
            "es_index",
            "index_class",
            "event_date",
            "timestamp",
            F.col("`@cf.app`").alias("cf_app"),
            F.col("`@cf.org`").alias("cf_org"),
        )
        # materialize before the workdir disappears — localCheckpoint
        # keeps the rows on executors (no driver round-trip through
        # pandas, which cost ~1 s at sf0.1). No orderBy: the driver's
        # compare sorts rows itself, a full sort here is a wasted
        # exchange.
        out = docs.localCheckpoint()
        assert metrics.sent_count > 0
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# Multi-way (3-stream) watermarked join: view -> click -> purchase
# attribution chain, each hop bounded to the preceding step's 12-hour
# window — the cascaded stream-stream join shape (each hop keeps its
# own watermarked state; state per hop is bounded by delay x rate).
# ---------------------------------------------------------------------------

_FUNNEL_WINDOW_MIN = 720

_THREEWAY_ORACLE = f"""
SELECT v.user_id,
       v.event_id AS view_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       epoch_ms(v.ts) AS view_ms,
       epoch_ms(c.ts) AS click_ms,
       epoch_ms(p.ts) AS purchase_ms,
       round(p.value, 2) AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'view') v
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON v.user_id = c.user_id
 AND c.ts BETWEEN v.ts AND v.ts + INTERVAL {_FUNNEL_WINDOW_MIN} MINUTE
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = c.user_id
 AND p.ts BETWEEN c.ts AND c.ts + INTERVAL {_FUNNEL_WINDOW_MIN} MINUTE
"""


@q("stream_threeway_funnel", _THREEWAY_ORACLE)
def _stream_threeway_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASCADED stream-stream join over three live streams: clicks
    joined to the views they follow (12 h bound), purchases joined to
    those clicks (12 h bound) — the multi-way streaming-join shape
    where each hop maintains its own watermark-bounded state. Run to
    completion with an un-evicting watermark, the result must equal
    the batch three-way inequality join, which is what the SQL oracle
    checks; eviction under short delays is pinned separately in
    tests/test_streamjoin.py."""
    from ..io import load_table
    from ..session import tune_session
    from ..streaming.joins import time_bounded_join

    tune_session(spark)
    work = Path(tempfile.mkdtemp(prefix="cga-3wj-"))
    try:
        ev = load_table(spark, sf_dir, "events")
        dirs = {}
        specs = {
            "view": ("view_id", "view_ts", False),
            "click": ("click_id", "click_ts", False),
            "purchase": ("purchase_id", "purchase_ts", True),
        }
        for etype, (idc, tsc, with_value) in specs.items():
            cols = [
                F.col("event_id").alias(idc),
                "user_id",
                F.col("ts").alias(tsc),
            ]
            if with_value:
                cols.append(F.col("value").alias("purchase_value"))
            d = str(work / etype)
            ev.filter(F.col("event_type") == etype).select(*cols).write.parquet(d)
            dirs[etype] = d

        views = spark.readStream.schema(
            "view_id bigint, user_id bigint, view_ts timestamp"
        ).parquet(dirs["view"])
        clicks = spark.readStream.schema(
            "click_id bigint, user_id bigint, click_ts timestamp"
        ).parquet(dirs["click"])
        purchases = spark.readStream.schema(
            "purchase_id bigint, user_id bigint, purchase_ts timestamp,"
            " purchase_value double"
        ).parquet(dirs["purchase"])

        w = f"{_FUNNEL_WINDOW_MIN} minutes"
        hop1 = time_bounded_join(
            clicks,
            views,
            on=["user_id"],
            left_time="click_ts",
            right_time="view_ts",
            lower=w,
            upper="0 seconds",
            watermark_delay="365 days",
        )
        # a cascaded hop may carry at most ONE event-time column:
        # freeze the already-joined view timestamp to a plain epoch so
        # click_ts remains the sole watermark column entering hop 2
        hop1 = hop1.select(
            "user_id",
            "view_id",
            F.unix_millis("view_ts").alias("view_ms"),
            "click_id",
            "click_ts",
        )
        hop2 = time_bounded_join(
            purchases,
            hop1,
            on=["user_id"],
            left_time="purchase_ts",
            right_time="click_ts",
            lower=w,
            upper="0 seconds",
            watermark_delay="365 days",
            stamp_right=False,  # hop1 already carries its watermark
        )
        name = "threeway_funnel"
        query = (
            hop2.writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(work / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        out = spark.table(name).select(
            "user_id",
            "view_id",
            "click_id",
            "purchase_id",
            "view_ms",
            F.unix_millis("click_ts").alias("click_ms"),
            F.unix_millis("purchase_ts").alias("purchase_ms"),
            F.round("purchase_value", 2).alias("purchase_value"),
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


@q("kinesis_sim_pipeline", _streaming_oracle())
def _kinesis_sim_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The identical micro-batch pipeline, but ingested through the
    PLUGGABLE kinesis_sim source (Spark 4 Python DataSource API,
    sources/kinesis_sim.py) instead of the file stand-in: real
    shard/offset/commit semantics (S1/S2) feeding decode -> route ->
    grok -> enrich -> sink unchanged — and landing exactly the batch
    pipeline's documents, verified by the same oracle as
    streaming_pipeline. The fixture prep (driver-side jsonl write) is
    test scaffolding, not the measured operator; production swaps the
    format string for the real connector (config.py)."""
    from ..sources.kinesis_sim import (
        read_kinesis_sim_stream,
        write_kinesis_sim_fixture,
    )
    from ..sources.records import encode_records

    work = Path(tempfile.mkdtemp(prefix="cga-ksim-"))
    try:
        raw_dir = str(work / "stream")
        records = synthesize_envelopes(spark, sf_dir)
        raw = encode_records(records).select(
            "shard_id",
            "sequence_number",
            "partition_key",
            F.unix_millis("arrival_ts").alias("ts_ms"),
            "data",
        )
        rows = [
            (
                r.shard_id,
                int(r.sequence_number),
                r.partition_key,
                r.ts_ms,
                bytes(r.data),
                r.sequence_number,  # opaque string preserved -> doc_id
            )
            for r in raw.collect()
        ]
        write_kinesis_sim_fixture(rows, raw_dir, records_per_file=4096)
        dim = flatten_dimensions(*synthesize_cf_dimensions(spark))
        sink = ParquetIndexSink(work / "sink")
        query, metrics = run_stream(
            spark,
            read_kinesis_sim_stream(spark, raw_dir),
            lambda s: dim,
            sink,
            StreamConfig(
                checkpoint_location=str(work / "ck"),
                available_now=True,
                pipeline=PipelineConfig(allowed_origins=ALLOWED_ORIGINS),
            ),
        )
        drain(query)
        docs = sink.read_index(spark).select(
            "doc_id",
            "es_index",
            "index_class",
            "event_date",
            "timestamp",
            F.col("`@cf.app`").alias("cf_app"),
            F.col("`@cf.org`").alias("cf_org"),
        )
        out = docs.localCheckpoint()
        assert metrics.sent_count > 0
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)
