"""Time-bounded sequence detection (operators/sequence.py) on
hand-constructed streams where every completion is enumerable."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.operators.sequence import (
    sequence_matches,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, u, dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=m), t)
            for i, (u, m, t) in enumerate(rows)
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )


def _steps():
    return [
        F.col("event_type") == "a",
        F.col("event_type") == "b",
        F.col("event_type") == "c",
    ]


def _run(df, within_min):
    return {
        r["user_id"]: r["n_matches"]
        for r in sequence_matches(
            df, "user_id", "ts", "event_id", _steps(), within_min * 60_000
        ).collect()
    }


class TestSequenceMatches:
    def test_basic_completion_and_time_bound(self, spark):
        rows = [
            (1, 0, "a"), (1, 5, "b"), (1, 9, "c"),      # completes in 9 min
            (2, 0, "a"), (2, 5, "b"), (2, 40, "c"),     # too late at 30-min bound
        ]
        assert _run(_ev(spark, rows), 30) == {1: 1}
        assert _run(_ev(spark, rows), 60) == {1: 1, 2: 1}

    def test_interleaved_noise_ignored(self, spark):
        rows = [
            (1, 0, "a"), (1, 1, "x"), (1, 2, "b"), (1, 3, "y"), (1, 4, "c"),
        ]
        assert _run(_ev(spark, rows), 30) == {1: 1}

    def test_order_enforced(self, spark):
        rows = [(1, 0, "b"), (1, 1, "a"), (1, 2, "c")]  # b before a: no chain
        assert _run(_ev(spark, rows), 30) == {}
        rows2 = [(1, 0, "c"), (1, 1, "b"), (1, 2, "a")]
        assert _run(_ev(spark, rows2), 30) == {}

    def test_max_origin_picks_latest_feasible_start(self, spark):
        # old a at t=0 would miss the 30-min bound for c at t=45; the
        # fresher a at t=20 keeps the chain alive
        rows = [
            (1, 0, "a"), (1, 20, "a"), (1, 25, "b"), (1, 45, "c"),
        ]
        assert _run(_ev(spark, rows), 30) == {1: 1}

    def test_every_completion_counted(self, spark):
        rows = [
            (1, 0, "a"), (1, 1, "b"), (1, 2, "c"), (1, 3, "c"), (1, 50, "c"),
        ]
        # both early c's complete; the one at t=50 misses the bound
        assert _run(_ev(spark, rows), 30) == {1: 2}

    def test_two_step_pattern(self, spark):
        df = _ev(spark, [(1, 0, "a"), (1, 10, "b"), (1, 100, "b")])
        got = {
            r["user_id"]: r["n_matches"]
            for r in sequence_matches(
                df, "user_id", "ts", "event_id",
                [F.col("event_type") == "a", F.col("event_type") == "b"],
                30 * 60_000,
            ).collect()
        }
        assert got == {1: 1}

    def test_single_step_rejected(self, spark):
        df = _ev(spark, [(1, 0, "a")])
        with pytest.raises(ValueError):
            sequence_matches(
                df, "user_id", "ts", "event_id",
                [F.col("event_type") == "a"], 1000,
            )
