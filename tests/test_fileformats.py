"""CSV / JSON-lines sources (sources/fileformats.py): pinned-schema
reads, malformed-row rescue (the file-format analogue of the
poison-record bucket T2, consumer.go:213-224), and timestamp-instant
fidelity through the text roundtrip.

Spark refuses any query whose referenced set is ONLY the internal
corrupt column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN),
and column pruning makes `filter(corrupt).count()` exactly that — so
every corrupt-column check below references a data column in the same
plan (agg probe or two-column collect)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.io import load_table
from cga_kinesis_to_elasticsearch_spark.sources import fileformats as FF
from cga_kinesis_to_elasticsearch_spark.plans.formats import EVENTS_SCHEMA


@pytest.fixture()
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _n_corrupt(df) -> int:
    row = df.agg(
        F.max("event_id").alias("probe"),  # forces a data-column reference
        F.sum(
            F.when(F.col(FF.CORRUPT_COL).isNotNull(), 1).otherwise(0)
        ).alias("n_bad"),
    ).first()
    return int(row["n_bad"] or 0)


class TestRoundtrip:
    def test_csv_preserves_every_column(self, spark, events, tmp_path):
        path = str(tmp_path / "csv")
        FF.write_csv(events, path)
        back = FF.read_csv(spark, path, EVENTS_SCHEMA)
        assert _n_corrupt(back) == 0
        a = events.select("event_id", "ts", "value", "props")
        b = back.select("event_id", "ts", "value", "props")
        # exceptAll both ways == multiset equality, incl. ts instants
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    def test_jsonl_preserves_every_column(self, spark, events, tmp_path):
        path = str(tmp_path / "jsonl")
        FF.write_jsonl(events, path)
        back = FF.read_jsonl(spark, path, EVENTS_SCHEMA)
        assert _n_corrupt(back) == 0
        a = events.select("event_id", "ts", "value", "props")
        b = back.select("event_id", "ts", "value", "props")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


class TestMalformedRescue:
    def test_csv_bad_row_lands_in_corrupt_column(self, spark, tmp_path):
        p = tmp_path / "bad.csv"
        p.write_text(
            "event_id,ts,user_id,event_type,value,props\n"
            "1,2024-01-01T00:00:00.000000Z,7,click,1.5,\"{}\"\n"
            "not-a-long,xx,zz,click,huh,\"{}\"\n"
        )
        rows = (
            FF.read_csv(spark, str(p), EVENTS_SCHEMA)
            .select("event_id", FF.CORRUPT_COL)
            .collect()
        )
        good = [r for r in rows if r[FF.CORRUPT_COL] is None]
        bad = [r for r in rows if r[FF.CORRUPT_COL] is not None]
        assert len(good) == 1 and len(bad) == 1
        assert good[0]["event_id"] == 1
        # the rescued raw line is preserved verbatim for the error bucket
        assert "not-a-long" in bad[0][FF.CORRUPT_COL]

    def test_jsonl_bad_row_lands_in_corrupt_column(self, spark, tmp_path):
        p = tmp_path / "bad.jsonl"
        p.write_text(
            '{"event_id": 1, "ts": "2024-01-01T00:00:00.000000Z",'
            ' "user_id": 7, "event_type": "click", "value": 1.5, "props": "{}"}\n'
            "this is not json\n"
        )
        rows = (
            FF.read_jsonl(spark, str(p), EVENTS_SCHEMA)
            .select("event_id", FF.CORRUPT_COL)
            .collect()
        )
        assert len([r for r in rows if r[FF.CORRUPT_COL] is None]) == 1
        assert len([r for r in rows if r[FF.CORRUPT_COL] is not None]) == 1


class TestNtzGuard:
    def test_read_yields_instants_under_ntz_default(self, spark, tmp_path):
        prev = spark.conf.get("spark.sql.timestampType")
        try:
            spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
            p = tmp_path / "one.csv"
            p.write_text(
                "event_id,ts,user_id,event_type,value,props\n"
                "1,2024-01-01T00:00:00.000000Z,7,click,1.5,\"{}\"\n"
            )
            df = FF.read_csv(spark, str(p), EVENTS_SCHEMA)
            assert dict(df.dtypes)["ts"] == "timestamp"
            ms = df.select(F.unix_millis("ts").alias("ms")).first()["ms"]
            assert ms == 1704067200000
        finally:
            spark.conf.set("spark.sql.timestampType", prev)


class TestStreamingReaders:
    def test_jsonl_stream_matches_batch(self, spark, events, tmp_path):
        src = str(tmp_path / "stream_src")
        out = str(tmp_path / "stream_out")
        ckpt = str(tmp_path / "ckpt")
        FF.write_jsonl(events.limit(200), src)
        stream = FF.read_jsonl_stream(
            spark, src, EVENTS_SCHEMA, max_files_per_trigger=2
        )
        assert stream.isStreaming
        q = (
            stream.drop(FF.CORRUPT_COL)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.read.parquet(out)
        assert got.count() == 200
        # same rows, same instants, through the streaming path
        a = events.limit(200).select("event_id", "ts", "value")
        b = got.select("event_id", "ts", "value")
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


class TestOrcRoundtrip:
    def test_orc_preserves_types_and_instants(self, spark, sf_dir, tmp_path):
        from cga_kinesis_to_elasticsearch_spark.plans.formats import EVENTS_SCHEMA
        from cga_kinesis_to_elasticsearch_spark.sources import fileformats as FF
        from cga_kinesis_to_elasticsearch_spark.io import load_table
        import pyspark.sql.functions as F

        ev = load_table(spark, sf_dir, "events")
        path = str(tmp_path / "events_orc")
        FF.write_orc(ev, path)
        back = FF.read_orc(spark, path, EVENTS_SCHEMA)
        assert [f.dataType.typeName() for f in back.schema.fields] == [
            f.dataType.typeName() for f in EVENTS_SCHEMA.fields
        ]
        a = ev.agg(F.sum(F.unix_micros("ts")), F.sum("event_id")).collect()[0]
        b = back.agg(F.sum(F.unix_micros("ts")), F.sum("event_id")).collect()[0]
        assert tuple(a) == tuple(b)


class TestWarcRoundtrip:
    """Length-framed WARC-style records: payloads may contain ANY
    bytes — including header lookalikes — because framing follows
    Content-Length, never separators."""

    def test_adversarial_payloads(self, spark, tmp_path):
        from cga_kinesis_to_elasticsearch_spark.sources.fileformats import (
            read_warc,
            write_warc,
        )

        payloads = [
            ("https://a.example/1", "plain text body"),
            # embeds a fake record header mid-payload
            ("https://a.example/2",
             "before\r\nWARC/1.0\r\nContent-Length: 999\r\n\r\nafter"),
            ("https://b.example/3", ""),  # empty payload
            ("https://b.example/4", "multi\nline\r\nbody\r\n\r\ntail"),
            ("https://b.example/5", "ünïcödé bytes — länge ≠ strlen"),
        ]
        df = spark.createDataFrame(payloads, "url string, payload string")
        out = str(tmp_path / "warc")
        write_warc(df, out, "url", "payload")
        back = {
            r["url"]: (r["content_length"], r["payload"])
            for r in read_warc(spark, out).collect()
        }
        assert len(back) == len(payloads)
        for url, body in payloads:
            clen, got = back[url]
            assert got == body, url
            assert clen == len(body.encode("utf-8"))


class TestWarcFailLoud:
    def test_truncated_record_raises(self, spark, tmp_path):
        from cga_kinesis_to_elasticsearch_spark.sources.fileformats import (
            read_warc,
        )

        d = tmp_path / "warc"
        d.mkdir()
        (d / "part-0.txt").write_bytes(
            b"WARC/1.0\r\nWARC-Target-URI: https://x/1\r\n"
            b"Content-Length: 50\r\n\r\nonly ten b"
        )
        import pytest as _pytest

        with _pytest.raises(Exception, match="truncated WARC payload"):
            read_warc(spark, str(d)).collect()
