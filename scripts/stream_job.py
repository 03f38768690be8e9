#!/usr/bin/env python3
"""Submitable streaming job: the reference deployment's entry point,
Spark-shaped.

A deployment that ran `govau/cga-kinesis-to-elasticsearch` points the
SAME environment variables (APP_NAME, STREAM_NAME, ES_URL, ES_AWS_*,
DAYS_TO_KEEP, ALLOWED_ORIGINS, FLUSH_INTERVAL_SECONDS, AWS_REGION —
config.EngineConfig.from_env) at:

    spark-submit \
      --packages <kinesis-connector>,<elasticsearch-spark> \
      scripts/stream_job.py

and gets the same pipeline on Structured Streaming. Without the
connectors (e.g. this container) the job refuses with a clear message
— or runs `--smoke`, which drives the identical pipeline from
synthesized envelopes through the parquet sink, proving the wiring
end-to-end with zero AWS dependencies:

    python scripts/stream_job.py --smoke /tmp/smoke_out
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    from cga_kinesis_to_elasticsearch_spark.config import EngineConfig
    from cga_kinesis_to_elasticsearch_spark.session import get_spark
    from cga_kinesis_to_elasticsearch_spark.sinks.bulk import ParquetIndexSink
    from cga_kinesis_to_elasticsearch_spark.streaming.job import (
        drain,
        run_stream,
    )

    smoke = "--smoke" in sys.argv
    if smoke:
        out = Path(sys.argv[sys.argv.index("--smoke") + 1])
        spark = get_spark("stream-job-smoke")
        spark.sparkContext.setLogLevel("ERROR")

        from cga_kinesis_to_elasticsearch_spark.operators.enrichment import (
            flatten_dimensions,
        )
        from cga_kinesis_to_elasticsearch_spark.pipeline import PipelineConfig
        from cga_kinesis_to_elasticsearch_spark.sources.envelopes import (
            ALLOWED_ORIGINS,
            synthesize_cf_dimensions,
            synthesize_envelopes,
        )
        from cga_kinesis_to_elasticsearch_spark.sources.records import (
            read_raw_record_stream,
            write_raw_records,
        )
        from cga_kinesis_to_elasticsearch_spark.streaming.job import StreamConfig

        src = out / "raw"
        records = synthesize_envelopes(spark, "/root/testdata/sf0.001")
        write_raw_records(records, str(src))
        dim = flatten_dimensions(*synthesize_cf_dimensions(spark)).cache()
        sink = ParquetIndexSink(out / "sink")
        cfg = StreamConfig(
            checkpoint_location=str(out / "ck"),
            available_now=True,
            pipeline=PipelineConfig(allowed_origins=ALLOWED_ORIGINS),
        )
        query, metrics = run_stream(
            spark,
            read_raw_record_stream(spark, str(src)),
            lambda s: dim,
            sink,
            cfg,
        )
        drain(query)
        n = spark.read.parquet(str(out / "sink" / "data")).count()
        print(f"smoke OK: {n} documents landed, sent={metrics.sent_count}")
        return 0

    try:
        cfg = EngineConfig.from_env()
    except KeyError as exc:
        print(f"config error: {exc.args[0]}", file=sys.stderr)
        return 2
    spark = get_spark(cfg.app_name)
    try:
        raw = (
            spark.readStream.format("kinesis")
            .options(**cfg.kinesis_source_options())
            .load()
        )
    except Exception as exc:
        print(
            "Kinesis connector unavailable — submit with "
            "--packages <spark-sql-kinesis> (see README 'Running against "
            f"real infrastructure').\n{exc}",
            file=sys.stderr,
        )
        return 2

    # real deployment: es-hadoop sink via cfg.es_connector_options();
    # the parquet sink stands in when no ES cluster is reachable.
    import os

    sink = ParquetIndexSink(Path(os.environ.get("SINK_PATH", "/tmp/cga-sink")))

    def dim_provider(s):
        # production: refresh from the CF API snapshot job's parquet
        from cga_kinesis_to_elasticsearch_spark.operators.enrichment import (
            flatten_dimensions,
        )
        from cga_kinesis_to_elasticsearch_spark.sources.envelopes import (
            synthesize_cf_dimensions,
        )

        return flatten_dimensions(*synthesize_cf_dimensions(s))

    query, _metrics = run_stream(
        spark, raw, dim_provider, sink, cfg.stream_config()
    )
    query.awaitTermination()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
