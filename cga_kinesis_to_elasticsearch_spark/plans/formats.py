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
           CAST(sum(length(props)) AS BIGINT) AS props_chars,
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


# ---------------------------------------------------------------------------
# Range-clustered sorted export (sinks/sorted_export.py)
# ---------------------------------------------------------------------------

_RANGE_N = 8

_RANGE_ORACLE = f"""
WITH k AS (SELECT epoch_us(ts) AS key FROM events),
st AS (SELECT min(key) AS lo, max(key) AS hi FROM k),
b AS (SELECT list_transform(range(1, {_RANGE_N}),
                            j -> lo + (hi - lo) * j // {_RANGE_N}) AS bnds
      FROM st),
a AS (SELECT key, len(list_filter(bnds, x -> key > x)) AS file_id
      FROM k CROSS JOIN b)
SELECT file_id, count(*) AS n_rows,
       min(key) AS min_key, max(key) AS max_key
FROM a GROUP BY file_id
"""


@q("range_export_manifest", _RANGE_ORACLE)
def _range_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-clustered export of events by epoch-micros(ts) into
    {_RANGE_N} sorted, disjoint files (explicit integer-arithmetic
    boundaries — the reproducible mode), manifest computed from the
    landed files. An oracle match proves on-disk placement, per-file
    extents, and row counts all at once; file/row-group pruning over
    this layout is exercised in tests/test_sorted_export.py."""
    from ..sinks.sorted_export import (
        export_range_clustered,
        fixed_width_boundaries,
    )

    ev = _t(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    bnds = fixed_width_boundaries(ev, F.col("ts_us"), _RANGE_N)
    sf = Path(sf_dir).name or "sf"
    root = Path(tempfile.gettempdir()) / "spark_graft_range_export" / sf
    return export_range_clustered(
        spark, ev, root, "ts_us", _RANGE_N,
        tiebreaks=("event_id",), boundaries=bnds,
    )


@q("orc_source_roundtrip", _ROUNDTRIP_ORACLE)
def _orc_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> ORC (Spark's bundled columnar alternative) -> pinned
    reader -> aggregate; ORC stores timestamps as typed instants, so
    the oracle match proves native-type fidelity (vs the text formats'
    serialize/reparse path). n_corrupt is structurally 0: ORC has no
    PERMISSIVE rescue — torn files fail the read."""
    path = _staging(sf_dir, "orc")
    ev = _t(spark, sf_dir, "events")
    FF.write_orc(ev, path)
    df = FF.read_orc(spark, path, EVENTS_SCHEMA)
    return df.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.max(F.unix_millis("ts")).alias("max_ts_ms"),
        F.sum(F.length("props")).alias("props_chars"),
        F.lit(0).cast("long").alias("n_corrupt"),
    )


# ---------------------------------------------------------------------------
# Multiline log reassembly (operators/multiline.py)
# ---------------------------------------------------------------------------

_MULTILINE_ORACLE = """
WITH l AS (
  SELECT 'shard-' || CAST(user_id % 4 AS VARCHAR) AS stream,
         event_id AS ord,
         CASE WHEN event_id % 3 = 0
              THEN 'EVT ' || CAST(event_id AS VARCHAR) || ' begin'
              ELSE '  cont ' || CAST(event_id AS VARCHAR) END AS line
  FROM events),
n AS (
  SELECT stream, ord, line,
         CAST(sum(CASE WHEN regexp_matches(line, '^EVT ') THEN 1 ELSE 0 END)
              OVER (PARTITION BY stream ORDER BY ord
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS event_no
  FROM l)
SELECT stream, event_no,
       string_agg(line, chr(10) ORDER BY ord) AS message,
       count(*) AS n_lines,
       min(ord) AS first_order
FROM n GROUP BY stream, event_no
"""


@q("multiline_reassembly", _MULTILINE_ORACLE)
def _multiline_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiline log reassembly (operators/multiline.py): continuation
    lines merge into their parent event via a running start-count over
    per-shard order — the Filebeat/Logstash multiline codec as one
    window + one exchange-sharing aggregation. Lines are synthesized
    deterministically from events (every third line starts an event);
    the oracle replays numbering and the ordered reassembly in SQL."""
    from ..operators.multiline import reassemble_multiline

    ev = _t(spark, sf_dir, "events")
    lines = ev.select(
        F.concat(F.lit("shard-"), (F.col("user_id") % 4).cast("string")).alias(
            "stream"
        ),
        F.col("event_id").alias("ord"),
        F.when(
            F.col("event_id") % 3 == 0,
            F.format_string("EVT %d begin", F.col("event_id")),
        )
        .otherwise(F.format_string("  cont %d", F.col("event_id")))
        .alias("line"),
    )
    return reassemble_multiline(
        lines, "line", "stream", "ord", start_pattern=r"^EVT "
    )


# ---------------------------------------------------------------------------
# WARC-style web-archive roundtrip
# ---------------------------------------------------------------------------

_WARC_ORACLE = """
SELECT source || '.example' AS host,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(strlen(text)) AS BIGINT) AS payload_bytes,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS distinct_payloads,
       min('https://' || source || '.example/doc/' || doc_id) AS min_url
FROM documents GROUP BY source
"""


@q("warc_source_roundtrip", _WARC_ORACLE)
def _warc_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC-style archive roundtrip (sources/fileformats.write_warc /
    read_warc): documents serialize into length-framed web-archive
    records, the Arrow-batched record parser reads them back, and the
    per-host aggregate must equal the same aggregate over the original
    table — proving Content-Length framing, URI headers and payload
    bytes all survive. The hash breaks if framing miscounts a single
    byte (the next record would mis-parse)."""
    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example/doc/"),
        F.col("doc_id").cast("string"),
    )
    staged = docs.select(url.alias("url"), F.col("text").alias("payload"))
    out = Path(tempfile.gettempdir()) / "spark_graft_formats" / (
        Path(sf_dir).name or "sf"
    ) / "warc"
    FF.write_warc(staged, str(out), "url", "payload")
    back = FF.read_warc(spark, str(out))
    host = F.regexp_extract("url", r"^https://([^/]+)/", 1)
    return back.groupBy(host.alias("host")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("content_length").cast("long").alias("payload_bytes"),
        F.countDistinct(F.md5("payload")).cast("long").alias(
            "distinct_payloads"
        ),
        F.min("url").alias("min_url"),
    )


# ---------------------------------------------------------------------------
# Parquet schema evolution: two writer generations (v2 adds a column),
# one mergeSchema read. The data-lake reality at 100 TB: years of
# files with drifting schemas must read as ONE table without a
# rewrite. The oracle never sees the staged files — it replays the
# evolution logically from `orders` (v1 rows lack the new column =>
# NULL), so the hash only matches if mergeSchema unified the
# generations losslessly.
# ---------------------------------------------------------------------------

_EVO_ORACLE = """
WITH unified AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END
           AS o_orderpriority
  FROM orders
)
SELECT coalesce(o_orderpriority, '<v1>') AS priority,
       count(*) AS n,
       count(o_orderpriority) AS n_with_col,
       round(sum(round(o_totalprice * 100)) / 100.0, 2) AS total_price
FROM unified
GROUP BY 1
ORDER BY 1
"""


@q("schema_evolution_union", _EVO_ORACLE)
def _schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution round-trip: generation v1 (even order keys,
    3 columns) and v2 (odd keys, + o_orderpriority) are written as
    separate parquet directories, then read back in ONE pass with
    ``mergeSchema=true`` — v1 rows surface NULL for the added column.
    Reader-side schema merge is metadata-only (footer union), so the
    scan stays a plain columnar read; the aggregation is one
    map-side-combined groupBy. Totals stage through exact cents."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    root = Path(_staging(sf_dir, "evo"))
    v1 = o.where(F.col("o_orderkey") % 2 == 0).drop("o_orderpriority")
    v2 = o.where(F.col("o_orderkey") % 2 == 1)
    v1.write.mode("overwrite").parquet(str(root / "gen=1"))
    v2.write.mode("overwrite").parquet(str(root / "gen=2"))
    unified = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(str(root))
    )
    return (
        unified.groupBy(
            F.coalesce("o_orderpriority", F.lit("<v1>")).alias("priority")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("o_orderpriority").alias("n_with_col"),
            F.round(
                F.sum(F.round(F.col("o_totalprice") * 100)) / 100.0, 2
            ).alias("total_price"),
        )
        .orderBy("priority")
    )
