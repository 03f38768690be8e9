"""Pluggable kinesis_sim source (Spark 4 Python DataSource API):
schema parity with the raw-record surface, per-shard ordering across
micro-batches, backpressure capping, checkpointed resume (committed
offsets are never re-served), and mid-stream shard discovery.
"""

from __future__ import annotations

from datetime import datetime, timezone

from cga_kinesis_to_elasticsearch_spark.sources.kinesis_sim import (
    read_kinesis_sim_stream,
    write_kinesis_sim_fixture,
)
from cga_kinesis_to_elasticsearch_spark.sources.records import (
    RAW_RECORD_SCHEMA,
)


def _rows(shard: str, seqs, ts0: int = 1_700_000_000_000):
    return [
        (shard, s, f"pk{s}", ts0 + s * 1000, f"payload-{shard}-{s}".encode())
        for s in seqs
    ]


def _drain(spark, stream, checkpoint: str):
    """Run all available data through foreachBatch, collecting batches."""
    batches: list[list] = []

    def sink(df, batch_id):
        batches.append(df.collect())

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    return batches


class TestBatchRead:
    def test_reads_all_shards_with_raw_schema(self, spark, tmp_path):
        root = str(tmp_path / "stream")
        write_kinesis_sim_fixture(
            _rows("shardId-000", range(3)) + _rows("shardId-001", range(2)),
            root,
        )
        from cga_kinesis_to_elasticsearch_spark.sources.kinesis_sim import (
            KinesisSimDataSource,
        )

        spark.dataSource.register(KinesisSimDataSource)
        df = spark.read.format("kinesis_sim").option("path", root).load()
        assert df.schema == RAW_RECORD_SCHEMA
        got = {(r.shard_id, r.sequence_number) for r in df.collect()}
        assert len(got) == 5
        assert ("shardId-000", f"{2:020d}") in got
        row = df.filter("shard_id = 'shardId-001'").orderBy(
            "sequence_number"
        ).first()
        assert bytes(row.data) == b"payload-shardId-001-0"
        assert row.arrival_ts == datetime.fromtimestamp(
            1_700_000_000_000 / 1000.0, tz=timezone.utc
        ).replace(tzinfo=None)


class TestStreaming:
    def test_backpressure_and_per_shard_order(self, spark, tmp_path):
        """The cap is steady-state admission control: the first batch
        of a (re)start drains the backlog uncapped; after that the
        offset advances at most max_records_per_batch per shard per
        trigger, and per-shard order holds across all batches."""
        root = str(tmp_path / "stream")
        write_kinesis_sim_fixture(
            _rows("s0", range(3)) + _rows("s1", range(2)), root
        )
        stream = read_kinesis_sim_stream(spark, root, max_records_per_batch=5)
        batches: list[list] = []
        q = (
            stream.writeStream.foreachBatch(
                lambda df, _: batches.append(df.collect())
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()  # backlog batch (uncapped)
            assert sum(len(b) for b in batches) == 5
            # steady state: 12 new records arrive -> >= 3 capped batches
            write_kinesis_sim_fixture(
                _rows("s0", range(3, 15)) + _rows("s1", range(2, 9)),
                root,
                records_per_file=4,
            )
            before = len(batches)
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
        steady = [b for b in batches[before:] if b]
        assert len(steady) >= 3  # 12 records / cap 5
        assert all(
            sum(1 for r in b if r.shard_id == "s0") <= 5 for b in steady
        )
        # per-shard sequence numbers strictly increase across batches
        seen: dict[str, list[str]] = {}
        for b in batches:
            for r in sorted(b, key=lambda r: (r.shard_id, r.sequence_number)):
                seen.setdefault(r.shard_id, []).append(r.sequence_number)
        assert seen["s0"] == sorted(set(seen["s0"])) and len(seen["s0"]) == 15
        assert seen["s1"] == sorted(set(seen["s1"])) and len(seen["s1"]) == 9

    def test_checkpoint_resume_and_shard_discovery(self, spark, tmp_path):
        root = str(tmp_path / "stream")
        ckpt = str(tmp_path / "ckpt")
        write_kinesis_sim_fixture(_rows("s0", range(5)), root)
        first = _drain(
            spark, read_kinesis_sim_stream(spark, root), ckpt
        )
        got1 = [r for b in first for r in b]
        assert len(got1) == 5
        # append new records to s0 AND a brand-new shard, then resume
        write_kinesis_sim_fixture(
            _rows("s0", range(5, 8)) + _rows("s9", range(2)), root
        )
        second = _drain(
            spark, read_kinesis_sim_stream(spark, root), ckpt
        )
        got2 = [r for b in second for r in b]
        # only the delta is served: nothing committed is re-read
        assert {(r.shard_id, r.sequence_number) for r in got2} == {
            ("s0", f"{s:020d}") for s in range(5, 8)
        } | {("s9", f"{s:020d}") for s in range(2)}

    def test_pipeline_runs_on_sim_source(self, spark, tmp_path):
        """The emitted surface feeds decode_records unchanged — the
        production swap is format-string-only."""
        import json as _json

        from cga_kinesis_to_elasticsearch_spark.sources.records import (
            decode_records,
        )

        root = str(tmp_path / "stream")
        env = {
            "origin": "gorouter",
            "event_type": 5,  # LogMessage
            "deployment": "cf",
            "job": "router",
            "index": "0",
            "ip": "10.0.0.1",
            "timestamp": 1_700_000_000_000_000_000,
        }
        payload = _json.dumps(env).encode()
        write_kinesis_sim_fixture(
            [("s0", i, "pk", 1_700_000_000_000, payload) for i in range(4)],
            root,
        )
        stream = read_kinesis_sim_stream(spark, root)
        out: list = []
        q = (
            decode_records(stream)
            .writeStream.foreachBatch(lambda df, _: out.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination()
        assert len(out) == 4
        assert all(r.origin == "gorouter" and not r.decode_error for r in out)


class TestFixtureWriterSafety:
    def test_reappend_never_truncates(self, spark, tmp_path):
        """Re-appending an already-written seq must not destroy the
        original file (filenames are never reused)."""
        from cga_kinesis_to_elasticsearch_spark.sources.kinesis_sim import (
            KinesisSimDataSource,
        )

        root = str(tmp_path / "stream")
        write_kinesis_sim_fixture(
            _rows("s0", range(10)), root, records_per_file=10
        )
        # duplicate append that previously reused (and truncated) the
        # file named after seq 0
        write_kinesis_sim_fixture(
            _rows("s0", range(3)), root, records_per_file=10
        )
        spark.dataSource.register(KinesisSimDataSource)
        df = spark.read.format("kinesis_sim").option("path", root).load()
        seqs = sorted(int(r.sequence_number) for r in df.collect())
        # all 10 originals survive; the 3 duplicates are stored too
        assert seqs == sorted(list(range(10)) + [0, 1, 2])
