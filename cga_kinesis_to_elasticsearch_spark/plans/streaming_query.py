"""Declared query for the streaming path (rows-only check — the
micro-batch run is not SQL-expressible, SURVEY §5 item 4).

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


@q("streaming_pipeline", None)
def _streaming_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = Path(tempfile.mkdtemp(prefix="cga-stream-"))
    try:
        raw_dir = work / "raw"
        records = synthesize_envelopes(spark, sf_dir)
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
        # materialize before the workdir disappears
        out = spark.createDataFrame(docs.toPandas(), docs.schema)
        assert metrics.sent_count > 0
        return out.orderBy("doc_id")
    finally:
        shutil.rmtree(work, ignore_errors=True)
