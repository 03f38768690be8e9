"""Schema-pinned CSV / JSON-lines sources and sinks.

The reference ingests exactly one wire format (protobuf Envelopes off
Kinesis, main.go:357-360) and emits exactly one (JSON bulk bodies,
bulk_index_request.go:140). A general engine needs the common
interchange formats as first-class sources with the SAME correctness
posture as the parquet path:

- **explicit StructType, never inferSchema** — schema inference reads
  the data twice and can flip types between runs/partitions; at 100 TB
  a second pass over the input is a non-starter. Callers pass (or
  derive once, plan-time) the schema; malformed rows land in a
  rescue column instead of failing the job (PERMISSIVE +
  columnNameOfCorruptRecord, the file-format analogue of the
  poison-record bucket T2).
- **timestamps as instants** — same TIMESTAMP_NTZ guard as
  ``io.load_table``: a host session defaulting to NTZ must not change
  what the engine computes.
- **round-trip invariance is oracle-tested** — `csv_source_roundtrip` /
  `json_source_roundtrip` in plans/formats.py write the events table
  out through the text format, read it back, and must hash-match a
  DuckDB aggregate over the ORIGINAL parquet: any type drift
  (timestamp precision, float formatting, NULL encoding) breaks the
  hash.

Streaming: both readers take ``spark.readStream`` the same way
(``read_csv(spark.readStream, ...)`` path argument), since they only
configure the DataFrameReader — one code path for batch and stream,
like every other operator in this engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructField, StructType, TimestampType

__all__ = [
    "read_csv",
    "read_jsonl",
    "read_csv_stream",
    "read_jsonl_stream",
    "write_csv",
    "write_jsonl",
    "CORRUPT_COL",
]

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_field(schema: StructType) -> StructType:
    """PERMISSIVE mode only populates the corrupt column if it is part
    of the declared schema."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    from pyspark.sql.types import StringType

    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )


def _fix_ntz(df: DataFrame) -> DataFrame:
    """Concrete-TimestampType repair, same contract as io.load_table."""
    for field in df.schema.fields:
        if field.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn(
                field.name, F.col(field.name).cast(TimestampType())
            )
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV with a pinned schema; malformed rows survive into
    ``_corrupt_record`` (drop or bucket them downstream, T2-style).

    ``timestampFormat`` default covers the ISO-micros form our writer
    emits; pass overrides for foreign data.
    """
    reader = (
        spark.read.format("csv")
        .schema(_with_corrupt_field(schema))
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        # a 100 TB input is many files; one task per split either way,
        # but disallow multiline records so splits stay byte-range
        .option("multiLine", "false")
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return _fix_ntz(reader.load(path))


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    **options: str,
) -> DataFrame:
    """JSON-lines with a pinned schema (the ES bulk-body format the
    reference emits, read back as a source)."""
    reader = (
        spark.read.format("json")
        .schema(_with_corrupt_field(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .option("multiLine", "false")
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return _fix_ntz(reader.load(path))


def read_csv_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    max_files_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """Streaming variant of :func:`read_csv`: tail a directory of CSV
    files as micro-batches (the file-source stand-in for a Kinesis
    stream of CSV payloads). Same pinned schema, corrupt-column and
    NTZ contracts; ``maxFilesPerTrigger`` is the backpressure knob
    (T5)."""
    if max_files_per_trigger is not None:
        options = {**options, "maxFilesPerTrigger": str(max_files_per_trigger)}
    reader = (
        spark.readStream.format("csv")
        .schema(_with_corrupt_field(schema))
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .option("multiLine", "false")
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return _fix_ntz(reader.load(path))


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """Streaming variant of :func:`read_jsonl`."""
    if max_files_per_trigger is not None:
        options = {**options, "maxFilesPerTrigger": str(max_files_per_trigger)}
    reader = (
        spark.readStream.format("json")
        .schema(_with_corrupt_field(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .option("multiLine", "false")
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return _fix_ntz(reader.load(path))


def _writable(df: DataFrame) -> DataFrame:
    # Text formats have no native timestamp; serialize as ISO-micros
    # UTC strings so the read side reparses to the identical instant
    # regardless of either session's timestampType default.
    out = df
    for field in df.schema.fields:
        if field.dataType.typeName() in ("timestamp", "timestamp_ntz"):
            out = out.withColumn(
                field.name,
                F.date_format(
                    F.col(field.name).cast(TimestampType()),
                    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
                ),
            )
    return out


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    (
        _writable(df)
        .write.mode("overwrite")
        .option("header", str(header).lower())
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    _writable(df).write.mode("overwrite").json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (bundled with Spark, unlike Avro). ORC is natively
    typed — timestamps are stored as instants, so no ISO-string
    serialization detour is needed; the roundtrip oracle still proves
    micros survive."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Schema-pinned ORC reader: the explicit concrete StructType keeps
    timestamps as instants under any session timestampType default
    (same contract as the CSV/JSON readers), and skips inference. ORC
    rows are structurally typed, so there is no PERMISSIVE corrupt-row
    rescue column — a torn file fails the read instead."""
    return _fix_ntz(spark.read.schema(schema).orc(path))


# ---------------------------------------------------------------------------
# WARC-style web-archive records (the canonical 100 TB corpus ingest
# format). Length-framed: each record is a header block (WARC/1.0 +
# key: value lines) terminated by a blank line, then EXACTLY
# Content-Length bytes of payload — so payloads may contain anything,
# including header-lookalike text. The reader parses whole archive
# files (binaryFile source, one file per task) with an Arrow-batched
# generator: per-task memory is one file's bytes, the standard
# trade-off for record-framed archive formats (real WARCs are sized
# ~1 GB for exactly this reason); record parsing itself is streaming
# within the buffer.
# ---------------------------------------------------------------------------


def warc_record_col(url: Column, payload: Column) -> Column:
    """One serialized WARC-style record as a string column. The
    Content-Length counts payload BYTES (utf-8), not characters."""
    return F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        url,
        F.lit("\r\nContent-Length: "),
        F.octet_length(payload).cast("string"),
        F.lit("\r\n\r\n"),
        payload,
        F.lit("\r\n"),
    )


def write_warc(
    df: DataFrame, path: str, url_col: str, payload_col: str
) -> None:
    """Serialize (url, payload) rows as concatenated WARC-style
    records, one archive file per partition (plain text sink; records
    carry their own length framing, so the text writer's newline
    between records is insignificant whitespace)."""
    rec = warc_record_col(F.col(url_col), F.col(payload_col))
    df.select(rec.alias("value")).write.mode("overwrite").text(path)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Parse WARC-style archives into
    ``(url string, content_length long, payload string)`` rows.

    binaryFile gives (path, content) per archive; an Arrow-batched
    ``mapInPandas`` walks each buffer record by record, honoring
    Content-Length — the only correct framing when payloads may embed
    separator-lookalike bytes. Stays distributed: files parse in
    parallel, one task per file."""
    from collections.abc import Iterator

    import pandas as pd

    schema = "url string, content_length long, payload string"

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: list[tuple[str, int, str]] = []
            for buf in pdf["content"]:
                data = bytes(buf)
                pos = 0
                n = len(data)
                while pos < n:
                    # skip inter-record whitespace
                    while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
                        pos += 1
                    if pos >= n:
                        break
                    head_end = data.find(b"\r\n\r\n", pos)
                    if head_end < 0:
                        # fail LOUD on a torn archive (same posture as the
                        # schema-pinned readers): silently dropping the
                        # tail would under-count without a trace
                        raise ValueError(
                            "torn WARC record: header at byte "
                            f"{pos} has no terminating blank line"
                        )
                    header = data[pos:head_end].decode("utf-8", "replace")
                    fields = {}
                    for line in header.split("\r\n")[1:]:
                        k, _, v = line.partition(":")
                        fields[k.strip().lower()] = v.strip()
                    try:
                        clen = int(fields.get("content-length", "0"))
                    except ValueError as exc:
                        raise ValueError(
                            "corrupt WARC Content-Length "
                            f"{fields.get('content-length')!r} at byte {pos}"
                        ) from exc
                    body_start = head_end + 4
                    body = data[body_start : body_start + clen]
                    if len(body) < clen:
                        raise ValueError(
                            f"truncated WARC payload at byte {body_start}: "
                            f"need {clen} bytes, file has {len(body)}"
                        )
                    out.append(
                        (
                            fields.get("warc-target-uri", ""),
                            clen,
                            body.decode("utf-8", "replace"),
                        )
                    )
                    pos = body_start + clen
            yield pd.DataFrame(
                out, columns=["url", "content_length", "payload"]
            )

    bf = spark.read.format("binaryFile").load(path)
    return bf.select("content").mapInPandas(parse, schema)
