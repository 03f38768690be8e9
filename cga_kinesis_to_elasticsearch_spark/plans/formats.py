"""Declared queries for the CSV / JSON-lines sources
(sources/fileformats.py).

Each roundtrip query pushes the events table OUT through the text
format and back IN through the schema-pinned reader, then aggregates
with type-sensitive probes. The oracle aggregates the ORIGINAL parquet
in DuckDB — so the hash only matches if every type survived the text
roundtrip bit-exactly:

- ``max_ts_ms``   — timestamp serialized as ISO-micros UTC and
  reparsed to the identical instant (breaks on tz drift, precision
  loss, or NTZ remapping);
- ``total_value`` — doubles printed and reparsed losslessly;
- ``props_chars`` — quote/escape handling of embedded JSON strings
  (CSV quoting, JSON string escaping);
- ``n_corrupt``   — PERMISSIVE rescue column stayed empty (the oracle
  pins it to literal 0: one malformed row and counts shift anyway).

Staging writes go under /tmp — driver-owned runs may not write inside
the repo; content is regenerated per call (overwrite) so reruns are
deterministic.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..sources import fileformats as FF
from .declared import _t, q

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

_ROUNDTRIP_ORACLE = """
    SELECT event_type,
           count(*) AS n,
           count(DISTINCT user_id) AS n_users,
           round(sum(value), 2) AS total_value,
           max(epoch_ms(ts)) AS max_ts_ms,
           sum(length(props)) AS props_chars,
           CAST(0 AS BIGINT) AS n_corrupt
    FROM events
    GROUP BY event_type
"""


def _staging(sf_dir: str, fmt: str) -> str:
    sf = Path(sf_dir).name or "sf"
    root = Path(tempfile.gettempdir()) / "spark_graft_formats" / sf
    root.mkdir(parents=True, exist_ok=True)
    return str(root / f"events_{fmt}")


def _probe_agg(df: DataFrame) -> DataFrame:
    return df.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.max(F.unix_millis("ts")).alias("max_ts_ms"),
        F.sum(F.length("props")).alias("props_chars"),
        F.sum(
            F.when(F.col(FF.CORRUPT_COL).isNull(), 0).otherwise(1)
        ).alias("n_corrupt"),
    )


@q("csv_source_roundtrip", _ROUNDTRIP_ORACLE)
def _csv_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> CSV (quoted/escaped, ISO-micros timestamps) -> pinned
    reader -> aggregate; hash-compared to the parquet original."""
    path = _staging(sf_dir, "csv")
    FF.write_csv(_t(spark, sf_dir, "events"), path)
    return _probe_agg(FF.read_csv(spark, path, EVENTS_SCHEMA))


@q("json_source_roundtrip", _ROUNDTRIP_ORACLE)
def _json_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> JSON-lines (the reference's own bulk-body format,
    bulk_index_request.go:140) -> pinned reader -> aggregate."""
    path = _staging(sf_dir, "jsonl")
    FF.write_jsonl(_t(spark, sf_dir, "events"), path)
    return _probe_agg(FF.read_jsonl(spark, path, EVENTS_SCHEMA))
