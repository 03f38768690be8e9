"""Protobuf wire-format codec (SURVEY §2.1 S7; envelope.pb.go:99-118).

Pure-codec properties plus the Spark mapInPandas round-trip and the
poison-record contract (T2, consumer.go:213-232)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.sources.protowire import (
    ProtoWireError,
    _put_varint,
    decode_envelope,
    decode_protobuf_records,
    encode_envelope,
    encode_protobuf_records,
)

FULL_ENVELOPE = {
    "origin": "env1",
    "event_type": 5,
    "timestamp": -1_234_567_890_123,  # negative int64 -> 10-byte varint
    "deployment": "cf",
    "job": "router",
    "index": "0",
    "ip": "10.0.0.1",
    "tags": {"source_id": "gorouter", "deployment": "cf"},
    "log_message": {
        "message": "GET / HTTP/1.1 200",
        "message_type": 1,
        "timestamp": 1_700_000_000_000_000_000,
        "app_id": "abc-123",
        "source_type": "RTR",
        "source_instance": "3",
    },
}


class TestCodec:
    def test_roundtrip_log_message(self):
        assert decode_envelope(encode_envelope(FULL_ENVELOPE)) == FULL_ENVELOPE

    def test_roundtrip_http_with_uuid_and_repeated(self):
        env = {
            "origin": "env2",
            "event_type": 4,
            "http_start_stop": {
                "start_timestamp": 1,
                "stop_timestamp": 2,
                # uint64 with the high bit set wraps to a negative
                # LongType value and must survive the trip
                "request_id": {"low": (1 << 63) + 5 - (1 << 64), "high": 7},
                "peer_type": 1,
                "method": 2,
                "uri": "/x",
                "remote_address": "1.2.3.4",
                "user_agent": "ua",
                "status_code": 200,
                "content_length": -1,
                "forwarded": ["10.0.0.1", "10.0.0.2"],
            },
        }
        assert decode_envelope(encode_envelope(env)) == env

    def test_roundtrip_metrics(self):
        for payload in [
            {"value_metric": {"name": "m", "value": 3.14159, "unit": "ms"}},
            {"counter_event": {"name": "c", "delta": 1, "total": 99}},
            {"error": {"source": "s", "code": -7, "message": "boom"}},
            {
                "container_metric": {
                    "application_id": "a",
                    "instance_index": 0,
                    "cpu_percentage": 0.5,
                    "memory_bytes": 1 << 40,
                    "disk_bytes": 456,
                }
            },
        ]:
            env = {"origin": "e", "event_type": 6, **payload}
            assert decode_envelope(encode_envelope(env)) == env

    @pytest.mark.parametrize(
        "bad",
        [
            b"\xff\xff\xff",  # truncated varint
            encode_envelope(FULL_ENVELOPE)[:40],  # truncated message
            b"\x0a\x02hi",  # origin only: missing required event_type
            b"\x0b\x00",  # wire type 3 (group): unsupported
            b"\x0a\xff\x01",  # declared length overruns buffer
        ],
    )
    def test_corrupt_rejected(self, bad):
        with pytest.raises(ProtoWireError):
            decode_envelope(bad)

    def test_unknown_fields_skipped(self):
        env = {"origin": "env1", "event_type": 5}
        buf = bytearray(encode_envelope(env))
        for num, wire, payload in [
            (19, 0, b"\x07"),
            (20, 2, bytes([2]) + b"hi"),
            (21, 1, b"\x00" * 8),
            (22, 5, b"\x00" * 4),
        ]:
            _put_varint(buf, num << 3 | wire)
            buf += payload
        assert decode_envelope(bytes(buf)) == env

    def test_wrong_wire_type_for_known_field_rejected(self):
        # origin (field 1) is length-delimited; send it as a varint
        buf = bytes([1 << 3 | 0, 7]) + encode_envelope(
            {"origin": "x", "event_type": 5}
        )
        with pytest.raises(ProtoWireError):
            decode_envelope(buf)


class TestSparkRoundTrip:
    @pytest.fixture(scope="class")
    def decoded(self, spark, sf_dir):
        from cga_kinesis_to_elasticsearch_spark.sources.envelopes import (
            synthesize_envelopes,
        )

        recs = synthesize_envelopes(spark, sf_dir)
        dec = decode_protobuf_records(encode_protobuf_records(recs))
        return recs, dec

    def test_no_decode_errors(self, decoded):
        _, dec = decoded
        assert dec.filter("decode_error").count() == 0

    def test_values_identical(self, decoded):
        recs, dec = decoded
        cols = [
            "sequence_number",
            "origin",
            "event_type",
            "timestamp",
            F.col("log_message.message").alias("msg"),
            F.col("log_message.app_id").alias("app_id"),
            F.col("log_message.source_type").alias("st"),
            F.col("tags")["source_id"].alias("src"),
        ]
        a, b = recs.select(cols), dec.select(cols)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    def test_stream_end_to_end_protobuf_payloads(
        self, spark, sf_dir, tmp_path_factory
    ):
        """The full streaming job over *protobuf* wire payloads: same
        documents as the batch pipeline, poison bytes counted into the
        error bucket (T2)."""
        import datetime as dt

        from cga_kinesis_to_elasticsearch_spark.operators.enrichment import (
            flatten_dimensions,
        )
        from cga_kinesis_to_elasticsearch_spark.pipeline import (
            PipelineConfig,
            run_pipeline,
        )
        from cga_kinesis_to_elasticsearch_spark.sinks.bulk import ParquetIndexSink
        from cga_kinesis_to_elasticsearch_spark.sources.envelopes import (
            ALLOWED_ORIGINS,
            synthesize_cf_dimensions,
            synthesize_envelopes,
        )
        from cga_kinesis_to_elasticsearch_spark.sources.records import (
            read_raw_record_stream,
        )
        from cga_kinesis_to_elasticsearch_spark.streaming.job import (
            StreamConfig,
            drain,
            run_stream,
        )

        records = synthesize_envelopes(spark, sf_dir).cache()
        dim = flatten_dimensions(*synthesize_cf_dimensions(spark))
        d = tmp_path_factory.mktemp("pbstream")
        encode_protobuf_records(records).repartition("shard_id").write.mode(
            "append"
        ).parquet(str(d))
        poison = spark.createDataFrame(
            [("shard-x", "poison-0", "pk", dt.datetime(2024, 1, 1),
              b"\xff\xff\xff")],
            "shard_id string, sequence_number string, partition_key string,"
            " arrival_ts timestamp, data binary",
        )
        poison.coalesce(1).write.mode("append").parquet(str(d))

        sink = ParquetIndexSink(tmp_path_factory.mktemp("pbsink"))
        cfg = StreamConfig(
            checkpoint_location=str(tmp_path_factory.mktemp("pbck")),
            available_now=True,
            pipeline=PipelineConfig(allowed_origins=ALLOWED_ORIGINS),
            decoder=decode_protobuf_records,
        )
        query, metrics = run_stream(
            spark, read_raw_record_stream(spark, str(d)), lambda s: dim,
            sink, cfg,
        )
        drain(query)
        expected = run_pipeline(records, dim, cfg.pipeline).count()
        assert sink.read_index(spark).count() == expected
        assert metrics.sent_count == expected
        assert metrics.errors_count == 1

    def test_poison_bytes_bucketed_not_fatal(self, spark):
        import datetime

        rows = [
            ("s1", "1", None, datetime.datetime(2024, 1, 1),
             encode_envelope({"origin": "env1", "event_type": 5})),
            ("s1", "2", None, datetime.datetime(2024, 1, 1), b"\xff\xff\xff"),
            ("s1", "3", None, datetime.datetime(2024, 1, 1), None),
        ]
        raw = spark.createDataFrame(
            rows,
            "shard_id string, sequence_number string, partition_key string,"
            " arrival_ts timestamp, data binary",
        )
        dec = decode_protobuf_records(raw)
        good = dec.filter(~F.col("decode_error"))
        bad = dec.filter("decode_error")
        assert good.count() == 1 and bad.count() == 2
        # poison rows keep their record coordinates for the error bucket
        assert {r.sequence_number for r in bad.collect()} == {"2", "3"}
