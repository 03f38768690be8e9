"""Fixed StructType schemas for the data model (SURVEY §1.2).

The reference is schema-dynamic at the sink (ES ``dynamic: true``,
main.go:306-320) and schema-fixed at the source (protobuf). This engine
inverts that: fixed StructType end-to-end, derived at plan time.

Envelope layout: vendor/github.com/cloudfoundry/sonde-go/events/
envelope.pb.go:99-118 and the per-payload .pb.go files.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Envelope_EventType enum (envelope.pb.go:55-60)
EVENT_TYPE_HTTP_START_STOP = 4
EVENT_TYPE_LOG_MESSAGE = 5
EVENT_TYPE_VALUE_METRIC = 6
EVENT_TYPE_COUNTER_EVENT = 7
EVENT_TYPE_ERROR = 8
EVENT_TYPE_CONTAINER_METRIC = 9

# LogMessage_MessageType (log.pb.go:25-26)
MESSAGE_TYPE_OUT = 1
MESSAGE_TYPE_ERR = 2


def _f(name: str, dt, nullable: bool = True) -> StructField:
    return StructField(name, dt, nullable)


# log.pb.go:57-65
LOG_MESSAGE_SCHEMA = StructType(
    [
        _f("message", StringType()),  # []byte in proto; decoded to text at parse
        _f("message_type", IntegerType()),
        _f("timestamp", LongType()),
        _f("app_id", StringType()),
        _f("source_type", StringType()),
        _f("source_instance", StringType()),
    ]
)

# uuid.pb.go
UUID_SCHEMA = StructType([_f("low", LongType()), _f("high", LongType())])

# http.pb.go:218-234
HTTP_START_STOP_SCHEMA = StructType(
    [
        _f("start_timestamp", LongType()),
        _f("stop_timestamp", LongType()),
        _f("request_id", UUID_SCHEMA),
        _f("peer_type", IntegerType()),
        _f("method", IntegerType()),
        _f("uri", StringType()),
        _f("remote_address", StringType()),
        _f("user_agent", StringType()),
        _f("status_code", IntegerType()),
        _f("content_length", LongType()),
        _f("application_id", UUID_SCHEMA),
        _f("instance_index", IntegerType()),
        _f("instance_id", StringType()),
        _f("forwarded", ArrayType(StringType())),
    ]
)

# metric.pb.go:22-27
VALUE_METRIC_SCHEMA = StructType(
    [_f("name", StringType()), _f("value", DoubleType()), _f("unit", StringType())]
)

# metric.pb.go:56-61
COUNTER_EVENT_SCHEMA = StructType(
    [_f("name", StringType()), _f("delta", LongType()), _f("total", LongType())]
)

# error.pb.go:22-27
ERROR_SCHEMA = StructType(
    [_f("source", StringType()), _f("code", IntegerType()), _f("message", StringType())]
)

# metric.pb.go:90-99
CONTAINER_METRIC_SCHEMA = StructType(
    [
        _f("application_id", StringType()),
        _f("instance_index", IntegerType()),
        _f("cpu_percentage", DoubleType()),
        _f("memory_bytes", LongType()),
        _f("disk_bytes", LongType()),
        _f("memory_bytes_quota", LongType()),
        _f("disk_bytes_quota", LongType()),
    ]
)

# envelope.pb.go:99-118 — tagged union as nullable sub-structs
ENVELOPE_SCHEMA = StructType(
    [
        _f("origin", StringType(), nullable=False),
        _f("event_type", IntegerType(), nullable=False),
        _f("timestamp", LongType()),  # event-time ns (unused by reference, T4)
        _f("deployment", StringType()),
        _f("job", StringType()),
        _f("index", StringType()),
        _f("ip", StringType()),
        _f("tags", MapType(StringType(), StringType())),
        _f("log_message", LOG_MESSAGE_SCHEMA),
        _f("http_start_stop", HTTP_START_STOP_SCHEMA),
        _f("value_metric", VALUE_METRIC_SCHEMA),
        _f("counter_event", COUNTER_EVENT_SCHEMA),
        _f("error", ERROR_SCHEMA),
        _f("container_metric", CONTAINER_METRIC_SCHEMA),
    ]
)

# One row per Kinesis record (consumer.go:17; FIXTURES.md A1): the
# record envelope wraps the (decoded) event Envelope.
RECORD_SCHEMA = StructType(
    [
        _f("shard_id", StringType(), nullable=False),
        _f("sequence_number", StringType(), nullable=False),
        _f("partition_key", StringType()),
        _f("arrival_ts", TimestampType(), nullable=False),
        _f("data", BinaryType()),  # raw payload, when carrying undecoded records
        *ENVELOPE_SCHEMA.fields,
    ]
)

# CF dimension entities (caching_lazyfill.go:13-19, FIXTURES.md A3),
# namespaced per origin env (main.go:79-109).
CF_APPS_SCHEMA = StructType(
    [
        _f("env", StringType(), nullable=False),
        _f("guid", StringType(), nullable=False),
        _f("name", StringType()),
        _f("space_guid", StringType()),
        _f("environment", MapType(StringType(), StringType())),
    ]
)
CF_SPACES_SCHEMA = StructType(
    [
        _f("env", StringType(), nullable=False),
        _f("guid", StringType(), nullable=False),
        _f("name", StringType()),
        _f("organization_guid", StringType()),
    ]
)
CF_ORGS_SCHEMA = StructType(
    [
        _f("env", StringType(), nullable=False),
        _f("guid", StringType(), nullable=False),
        _f("name", StringType()),
    ]
)
