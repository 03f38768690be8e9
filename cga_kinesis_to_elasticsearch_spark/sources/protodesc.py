"""Compiled protobuf descriptor set + JVM decode path for the
Envelope family (SURVEY §2.1 S7 — production parity).

``sources/protowire.py`` decodes the wire format in Arrow-batched
Python — correct, but the one Python stage on the parity pipeline's
hot path. The 100 TB upgrade is Spark's JVM ``from_protobuf`` (Spark
>= 3.4), which needs a compiled ``FileDescriptorSet``. protoc and the
protobuf runtime aren't available in every environment, and the
descriptor format is itself a published protobuf message — so this
module HAND-ENCODES the descriptor set from the same field-tag tables
protowire transcribes (envelope.pb.go:99-118, log.pb.go:57-65,
http.pb.go:218-234, metric.pb.go, error.pb.go, uuid.pb.go), using the
same varint/length-delimited wire rules.

Contents:

- :func:`descriptor_set_bytes` — the serialized FileDescriptorSet for
  ``events.Envelope`` and its sub-messages (proto2: required fields
  mirror protowire's required sets; the ``tags`` map is a standard
  map_entry nested message). Field DECLARATION order matches
  schemas.ENVELOPE_SCHEMA so the ``from_protobuf`` struct lines up
  with the engine's envelope schema column-for-column. Integer widths
  match too: int32 where the schema says IntegerType, int64 (two's-
  complement, uint64 wrapped) where it says LongType — the same
  convention as protowire's ``_to_signed64``.
- :func:`decode_protobuf_records_jvm` — drop-in replacement for
  ``protowire.decode_protobuf_records`` running entirely JVM-side:
  ``from_protobuf(..., mode=PERMISSIVE)`` nulls the envelope struct on
  malformed bytes / missing required fields, which maps to the same
  ``decode_error = true`` contract (T2 poison-record bucket).
- :func:`jvm_protobuf_available` — plan-time probe: the spark-protobuf
  package is an OPTIONAL Spark module; when it isn't on the
  classpath, callers fall back to the Arrow codec.
- :func:`select_protobuf_decoder` — the config switch: ``"jvm"``
  prefers from_protobuf and falls back (loudly) to the Arrow codec;
  ``"arrow"`` pins the Python codec. Wire it into StreamJobConfig's
  ``decoder`` hook (streaming/job.py) for a 100% codegen pipeline.

Correctness cross-check: the descriptor is validated against a REAL
protobuf runtime in tests/test_protodesc.py — the spark-connect jar
ships a shaded protobuf-java (org.sparkproject.connect.protobuf),
which parses this FileDescriptorSet, builds live Descriptors, and
DynamicMessage-decodes protowire-encoded fixtures to the same values.
The declared query ``protobuf_jvm_roundtrip`` additionally
hash-checks whichever decoder :func:`select_protobuf_decoder` picks
against the DuckDB oracle, and test_protodesc.py pins that BOTH
decoders produce identical rows when the JVM path is loadable.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schemas import ENVELOPE_SCHEMA
from .protowire import decode_protobuf_records

__all__ = [
    "descriptor_set_bytes",
    "write_descriptor_set",
    "jvm_protobuf_available",
    "decode_protobuf_records_jvm",
    "select_protobuf_decoder",
]

# descriptor.proto field numbers (published protobuf spec)
_FDS_FILE = 1          # FileDescriptorSet.file
_FDP_NAME = 1          # FileDescriptorProto.name
_FDP_PACKAGE = 2       # .package
_FDP_MESSAGE = 4       # .message_type
_FDP_SYNTAX = 12       # .syntax
_DP_NAME = 1           # DescriptorProto.name
_DP_FIELD = 2          # .field
_DP_NESTED = 3         # .nested_type
_DP_OPTIONS = 7        # .options (MessageOptions)
_MO_MAP_ENTRY = 7      # MessageOptions.map_entry
_F_NAME = 1            # FieldDescriptorProto.name
_F_NUMBER = 3          # .number
_F_LABEL = 4           # .label
_F_TYPE = 5            # .type
_F_TYPE_NAME = 6       # .type_name

# FieldDescriptorProto.Type / .Label enum values (descriptor.proto)
DOUBLE, INT64, INT32, STRING, MESSAGE = 1, 3, 5, 9, 11
OPT, REQ, REP = 1, 2, 3


def _varint(out: bytearray, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _ld(out: bytearray, num: int, payload: bytes) -> None:
    _varint(out, num << 3 | 2)
    _varint(out, len(payload))
    out.extend(payload)


def _vi(out: bytearray, num: int, v: int) -> None:
    _varint(out, num << 3 | 0)
    _varint(out, v)


def _field(
    name: str, number: int, ftype: int, label: int = OPT,
    type_name: str | None = None,
) -> bytes:
    f = bytearray()
    _ld(f, _F_NAME, name.encode())
    _vi(f, _F_NUMBER, number)
    _vi(f, _F_LABEL, label)
    _vi(f, _F_TYPE, ftype)
    if type_name:
        _ld(f, _F_TYPE_NAME, type_name.encode())
    return bytes(f)


def _message(name: str, fields: list[bytes], nested: list[bytes] = (),
             map_entry: bool = False) -> bytes:
    m = bytearray()
    _ld(m, _DP_NAME, name.encode())
    for f in fields:
        _ld(m, _DP_FIELD, f)
    for n in nested:
        _ld(m, _DP_NESTED, n)
    if map_entry:
        opts = bytearray()
        _vi(opts, _MO_MAP_ENTRY, 1)
        _ld(m, _DP_OPTIONS, bytes(opts))
    return bytes(m)


def descriptor_set_bytes() -> bytes:
    """Serialized FileDescriptorSet for the events.Envelope family.
    Field tags/requiredness transcribed from the generated Go cited in
    the module docstring; declaration order matches ENVELOPE_SCHEMA."""
    uuid_msg = _message("UUID", [
        _field("low", 1, INT64, REQ),    # uint64 on the wire; wraps
        _field("high", 2, INT64, REQ),   # into LongType like protowire
    ])
    log_msg = _message("LogMessage", [
        _field("message", 1, STRING, REQ),  # bytes; decoded as text
        _field("message_type", 2, INT32, REQ),
        _field("timestamp", 3, INT64, REQ),
        _field("app_id", 4, STRING),
        _field("source_type", 5, STRING),
        _field("source_instance", 6, STRING),
    ])
    http_msg = _message("HttpStartStop", [
        _field("start_timestamp", 1, INT64, REQ),
        _field("stop_timestamp", 2, INT64, REQ),
        _field("request_id", 3, MESSAGE, REQ, ".events.UUID"),
        _field("peer_type", 4, INT32, REQ),   # enum; int32 wire-compat
        _field("method", 5, INT32, REQ),      # enum; int32 wire-compat
        _field("uri", 6, STRING, REQ),
        _field("remote_address", 7, STRING, REQ),
        _field("user_agent", 8, STRING, REQ),
        _field("status_code", 9, INT32, REQ),
        _field("content_length", 10, INT64, REQ),
        _field("application_id", 12, MESSAGE, OPT, ".events.UUID"),
        _field("instance_index", 13, INT32),
        _field("instance_id", 14, STRING),
        _field("forwarded", 15, STRING, REP),
    ])
    value_msg = _message("ValueMetric", [
        _field("name", 1, STRING, REQ),
        _field("value", 2, DOUBLE, REQ),
        _field("unit", 3, STRING, REQ),
    ])
    counter_msg = _message("CounterEvent", [
        _field("name", 1, STRING, REQ),
        _field("delta", 2, INT64, REQ),   # uint64; wraps into LongType
        _field("total", 3, INT64),
    ])
    error_msg = _message("Error", [
        _field("source", 1, STRING, REQ),
        _field("code", 2, INT32, REQ),
        _field("message", 3, STRING, REQ),
    ])
    container_msg = _message("ContainerMetric", [
        _field("application_id", 1, STRING, REQ),
        _field("instance_index", 2, INT32, REQ),
        _field("cpu_percentage", 3, DOUBLE, REQ),
        _field("memory_bytes", 4, INT64, REQ),
        _field("disk_bytes", 5, INT64, REQ),
        _field("memory_bytes_quota", 6, INT64),
        _field("disk_bytes_quota", 7, INT64),
    ])
    tags_entry = _message("TagsEntry", [
        _field("key", 1, STRING),
        _field("value", 2, STRING),
    ], map_entry=True)
    # declaration order == ENVELOPE_SCHEMA order, so the from_protobuf
    # struct lines up with the engine's envelope columns
    envelope = _message("Envelope", [
        _field("origin", 1, STRING, REQ),
        _field("event_type", 2, INT32, REQ),  # enum; int32 wire-compat
        _field("timestamp", 6, INT64),
        _field("deployment", 13, STRING),
        _field("job", 14, STRING),
        _field("index", 15, STRING),
        _field("ip", 16, STRING),
        _field("tags", 17, MESSAGE, REP, ".events.Envelope.TagsEntry"),
        _field("log_message", 8, MESSAGE, OPT, ".events.LogMessage"),
        _field("http_start_stop", 7, MESSAGE, OPT, ".events.HttpStartStop"),
        _field("value_metric", 9, MESSAGE, OPT, ".events.ValueMetric"),
        _field("counter_event", 10, MESSAGE, OPT, ".events.CounterEvent"),
        _field("error", 11, MESSAGE, OPT, ".events.Error"),
        _field("container_metric", 12, MESSAGE, OPT,
               ".events.ContainerMetric"),
    ], nested=[tags_entry])

    fdp = bytearray()
    _ld(fdp, _FDP_NAME, b"cga_envelope.proto")
    _ld(fdp, _FDP_PACKAGE, b"events")
    for m in (uuid_msg, log_msg, http_msg, value_msg, counter_msg,
              error_msg, container_msg, envelope):
        _ld(fdp, _FDP_MESSAGE, m)
    _ld(fdp, _FDP_SYNTAX, b"proto2")

    fds = bytearray()
    _ld(fds, _FDS_FILE, bytes(fdp))
    return bytes(fds)


def write_descriptor_set(path: str | None = None) -> str:
    """Write the descriptor set to ``path`` (default: a stable file in
    the temp dir) and return the path ``from_protobuf`` reads."""
    if path is None:
        path = os.path.join(tempfile.gettempdir(), "cga_envelope.desc")
    data = descriptor_set_bytes()
    if not (os.path.exists(path) and open(path, "rb").read() == data):
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    return path


def jvm_protobuf_available(spark: SparkSession) -> bool:
    """Plan-time probe: is the optional spark-protobuf module on the
    classpath? (Building the expression raises the documented
    PROTOBUF_NOT_LOADED analysis error when it isn't.)"""
    try:
        from pyspark.sql.protobuf.functions import from_protobuf

        probe = spark.createDataFrame(
            [(bytearray(b"\x0a\x01x\x10\x05"),)], "data binary"
        )
        probe.select(
            from_protobuf(
                "data", "events.Envelope", write_descriptor_set()
            )
        ).schema  # analysis only; no job
        return True
    except Exception:
        return False


_RAW_COLS = ["shard_id", "sequence_number", "partition_key",
             "arrival_ts", "data"]
_ENVELOPE_FIELDS = [f.name for f in ENVELOPE_SCHEMA.fields]


def decode_protobuf_records_jvm(
    raw: DataFrame, desc_path: str | None = None
) -> DataFrame:
    """Raw records with protobuf ``data`` -> RECORD_SCHEMA +
    decode_error, entirely JVM-side (same contract as
    protowire.decode_protobuf_records; no Python stage).

    PERMISSIVE mode nulls the envelope struct on malformed bytes or
    missing required fields — that null IS the ``decode_error`` flag,
    preserving the record coordinates for the T2 poison bucket."""
    from pyspark.sql.protobuf.functions import from_protobuf

    desc = desc_path or write_descriptor_set()
    env = from_protobuf(
        F.col("data"), "events.Envelope", desc, {"mode": "PERMISSIVE"}
    ).alias("__env")
    d = raw.select(*_RAW_COLS, env)
    return d.select(
        *_RAW_COLS,
        *[F.col(f"__env.{name}").alias(name) for name in _ENVELOPE_FIELDS],
        F.col("__env").isNull().alias("decode_error"),
    )


def select_protobuf_decoder(spark: SparkSession, decoder: str = "jvm"):
    """The StreamConfig switch: return the decode callable for
    ``decoder`` in {"jvm", "arrow"}. "jvm" prefers the codegen
    from_protobuf path and falls back LOUDLY to the Arrow codec when
    the optional spark-protobuf module isn't on the classpath."""
    if decoder == "arrow":
        return decode_protobuf_records
    if decoder != "jvm":
        raise ValueError(f"unknown protobuf decoder {decoder!r}")
    if jvm_protobuf_available(spark):
        return decode_protobuf_records_jvm
    print(
        "WARNING: spark-protobuf module not on the classpath; "
        "falling back to the Arrow-batched wire codec "
        "(sources/protowire.py) for Envelope decode"
    )
    return decode_protobuf_records
