"""Stateful streaming sessionization (applyInPandasWithState)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.streaming.stateful import (
    STATE_SCHEMA,
    session_update,
    sessionize_stream,
)


class TestUpdateFunction:
    """The state transition function, driven directly (no stream)."""

    class FakeState:
        def __init__(self):
            self._v = None
            self.hasTimedOut = False
            self.timeout = None

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

        def setTimeoutDuration(self, ms):
            self.timeout = ms

    def _batch(self, *ts):
        import pandas as pd

        return iter([pd.DataFrame({"ts_ms": list(ts)})])

    def test_opens_session(self):
        fn = session_update(gap_ms=1000)
        st = self.FakeState()
        out = list(fn(("u1",), self._batch(100, 200), st))
        assert out == [] and st.get == (100, 200, 2) and st.timeout == 1000

    def test_extends_within_gap(self):
        fn = session_update(gap_ms=1000)
        st = self.FakeState()
        st.update((100, 200, 2))
        assert list(fn(("u1",), self._batch(600), st)) == []
        assert st.get == (100, 600, 3)

    def test_closes_on_gap_and_restarts(self):
        fn = session_update(gap_ms=1000)
        st = self.FakeState()
        st.update((100, 200, 2))
        out = list(fn(("u1",), self._batch(5000), st))
        assert len(out) == 1
        row = out[0].iloc[0]
        assert (row.session_start, row.session_end, row.n_events) == (100, 200, 2)
        assert st.get == (5000, 5000, 1)

    def test_timeout_emits_and_clears(self):
        fn = session_update(gap_ms=1000)
        st = self.FakeState()
        st.update((100, 900, 3))
        st.hasTimedOut = True
        out = list(fn(("u1",), iter([]), st))
        assert len(out) == 1 and out[0].iloc[0].n_events == 3
        assert not st.exists


class TestStreamEndToEnd:
    def test_sessions_close_via_timeout(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        ck = tmp_path / "ck"
        out_rows = []

        df0 = spark.createDataFrame(
            [("u1", 1000), ("u1", 2000), ("u2", 1500)], "key string, ts_ms long"
        )
        df0.coalesce(1).write.mode("append").parquet(str(src))

        stream = spark.readStream.schema("key string, ts_ms long").parquet(str(src))
        sessions = sessionize_stream(stream, gap_ms=1500)

        def sink(batch, _bid):
            out_rows.extend(batch.collect())

        q = (
            sessions.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", str(ck))
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            deadline = time.time() + 60
            # keep feeding empty-ish batches so the trigger fires and
            # processing-time timeouts get a chance to expire
            fed = False
            while time.time() < deadline and len(out_rows) < 2:
                time.sleep(2)
                if not fed:
                    fed = True
                    spark.createDataFrame(
                        [("u3", 9000)], "key string, ts_ms long"
                    ).coalesce(1).write.mode("append").parquet(str(src))
        finally:
            q.stop()
        by_key = {r.key: r for r in out_rows}
        assert "u1" in by_key and by_key["u1"].n_events == 2
        assert by_key["u1"].session_start == 1000
        assert by_key["u1"].session_end == 2000
        assert "u2" in by_key and by_key["u2"].n_events == 1
