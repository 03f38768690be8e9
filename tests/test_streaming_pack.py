"""Stateful streaming sequence packing (streaming/packing.py): the
state transition driven directly, and batch/stream equivalence — the
micro-batch run must emit exactly what batch pack_spans computes."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.operators.text import pack_spans
from cga_kinesis_to_elasticsearch_spark.streaming.packing import (
    pack_stream,
    pack_update,
)


class FakeState:
    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None


def _batch(rows):
    return iter([pd.DataFrame(rows)])


class TestUpdateFunction:
    def test_offset_carries_across_batches(self):
        fn = pack_update(budget=32)
        st = FakeState()
        out1 = list(fn(("s",), _batch({"id": [0], "n_tok": [20]}), st))
        assert st.get == (20,)
        spans1 = list(
            zip(out1[0]["id"], out1[0]["seq_id"], out1[0]["tokens_in_seq"])
        )
        assert spans1 == [(0, 0, 20)]
        # next batch: doc of 20 tokens straddles the 32 boundary
        out2 = list(fn(("s",), _batch({"id": [1], "n_tok": [20]}), st))
        spans2 = list(
            zip(out2[0]["id"], out2[0]["seq_id"], out2[0]["tokens_in_seq"])
        )
        assert spans2 == [(1, 0, 12), (1, 1, 8)]
        assert st.get == (40,)

    def test_batch_sorted_by_id(self):
        fn = pack_update(budget=100)
        st = FakeState()
        out = list(fn(("s",), _batch({"id": [3, 1, 2], "n_tok": [5, 5, 5]}), st))
        assert list(out[0]["id"]) == [1, 2, 3]

    def test_empty_batch_noop(self):
        fn = pack_update(budget=10)
        st = FakeState()
        assert list(fn(("s",), iter([]), st)) == []
        assert not st.exists


class TestBatchStreamEquivalence:
    def test_stream_equals_batch_pack(self, spark, tmp_path):
        rows = [
            (i, ["alpha", "beta"][i % 2], " ".join(["w"] * (5 + i % 7)))
            for i in range(40)
        ]
        batch_df = spark.createDataFrame(rows, "id long, stream string, text string")
        expected = {
            (r.id, r.s, r.seq_id): r.tokens_in_seq
            for r in pack_spans(
                batch_df.withColumnRenamed("stream", "s"),
                "text",
                "id",
                "s",
                budget=16,
            ).collect()
        }

        src = tmp_path / "src"
        src.mkdir()
        # two files in id order -> availableNow processes them as
        # separate micro-batches with maxFilesPerTrigger=1
        for lo, hi in [(0, 20), (20, 40)]:
            spark.createDataFrame(
                rows[lo:hi], "id long, stream string, text string"
            ).coalesce(1).write.mode("append").parquet(str(src / f"f{lo}"))

        stream = (
            spark.readStream.schema("id long, stream string, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )
        out_rows = []

        def sink(b, _bid):
            out_rows.extend(b.collect())

        q = (
            pack_stream(stream, "text", "id", "stream", budget=16)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {(r.id, r.stream, r.seq_id): r.tokens_in_seq for r in out_rows}
        assert got == expected
