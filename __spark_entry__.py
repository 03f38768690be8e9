"""Driver contract for the spark-graft builder (PySpark target).

``entry``: flagship parity pipeline (decode -> filter -> route -> grok
-> broadcast enrichment -> computed columns) over envelopes synthesized
from the sf0.001 events table.

``queries`` / ``oracle_sql``: the declared-query surface — one entry
per implemented SURVEY §2 operator / north-star extension, each with a
DuckDB oracle (cga_kinesis_to_elasticsearch_spark/plans/declared.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from cga_kinesis_to_elasticsearch_spark.operators.enrichment import (
        flatten_dimensions,
    )
    from cga_kinesis_to_elasticsearch_spark.pipeline import (
        PipelineConfig,
        run_pipeline,
    )
    from cga_kinesis_to_elasticsearch_spark.session import tune_session
    from cga_kinesis_to_elasticsearch_spark.sources.envelopes import (
        ALLOWED_ORIGINS,
        synthesize_cf_dimensions,
        synthesize_envelopes,
    )

    tune_session(spark)
    records = synthesize_envelopes(spark, "/root/testdata/sf0.001")
    dim = flatten_dimensions(*synthesize_cf_dimensions(spark))
    cfg = PipelineConfig(
        allowed_origins=ALLOWED_ORIGINS, enable_disabled_routes=True
    )
    docs = run_pipeline(records, dim, cfg)
    # stable, driver-friendly schema: drop nested structs
    return docs.drop("log_message", "arrival_ts")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cga_kinesis_to_elasticsearch_spark.plans import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from cga_kinesis_to_elasticsearch_spark.plans import oracle_sql as _oracle_sql

    return _oracle_sql()
