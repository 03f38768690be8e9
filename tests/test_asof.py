"""As-of join operator semantics (operators/asof.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    events = spark.createDataFrame(
        [("u1", 10, 100.0), ("u1", 20, 200.0), ("u2", 15, 150.0)],
        "k string, t long, v double",
    )
    probes = spark.createDataFrame(
        [("p1", "u1", 5), ("p2", "u1", 10), ("p3", "u1", 25), ("p4", "u2", 14), ("p5", "u3", 50)],
        "pid string, k string, t long",
    )
    return probes, events


class TestAsofBackward:
    def test_latest_at_or_before(self, frames):
        probes, events = frames
        out = {
            r.pid: r.asof_v
            for r in asof_join(
                probes, events, key="k", probe_ts="t", event_ts="t", value_cols=["v"]
            ).collect()
        }
        assert out["p1"] is None  # nothing at or before t=5
        assert out["p2"] == 100.0  # tie: event at t=10 counts (<=)
        assert out["p3"] == 200.0  # latest of the two
        assert out["p4"] is None  # u2's event is later (t=15 > 14)
        assert out["p5"] is None  # unseen key

    def test_probe_columns_preserved(self, frames):
        probes, events = frames
        out = asof_join(
            probes, events, key="k", probe_ts="t", event_ts="t", value_cols=["v"]
        )
        assert set(out.columns) == {"pid", "k", "t", "asof_v"}
        assert out.count() == probes.count()


class TestAsofForward:
    def test_earliest_at_or_after(self, frames):
        probes, events = frames
        out = {
            r.pid: r.asof_v
            for r in asof_join(
                probes,
                events,
                key="k",
                probe_ts="t",
                event_ts="t",
                value_cols=["v"],
                direction="forward",
            ).collect()
        }
        assert out["p1"] == 100.0  # next event after t=5
        assert out["p2"] == 100.0  # tie counts (>=)
        assert out["p3"] is None  # nothing after t=25
        assert out["p4"] == 150.0

    def test_bad_direction_raises(self, frames):
        probes, events = frames
        with pytest.raises(ValueError):
            asof_join(
                probes, events, key="k", probe_ts="t", event_ts="t",
                value_cols=["v"], direction="sideways",
            )
