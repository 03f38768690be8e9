"""Snapshot diff operator."""

from __future__ import annotations

from pyspark.sql import Row

from cga_kinesis_to_elasticsearch_spark.operators.diff import snapshot_diff


class TestSnapshotDiff:
    def test_all_four_classes(self, spark):
        old = spark.createDataFrame(
            [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
        )
        new = spark.createDataFrame(
            [Row(k=1, v="a"), Row(k=2, v="B"), Row(k=4, v="d")]
        )
        out = {
            r["k"]: r["change"]
            for r in snapshot_diff(old, new, ["k"], ["v"]).collect()
        }
        assert out == {
            1: "unchanged",
            2: "changed",
            3: "removed",
            4: "added",
        }

    def test_null_vs_empty_not_confused(self, spark):
        # ("x", NULL) vs ("x", "") must classify as changed — the
        # length-tagged fingerprint cannot collide them
        old = spark.createDataFrame(
            [Row(k=1, a="x", b=None)], "k int, a string, b string"
        )
        new = spark.createDataFrame(
            [Row(k=1, a="x", b="")], "k int, a string, b string"
        )
        (row,) = snapshot_diff(old, new, ["k"], ["a", "b"]).collect()
        assert row["change"] == "changed"

    def test_shift_collision_guarded(self, spark):
        # ("ab", "c") vs ("a", "bc") — plain concat would collide
        old = spark.createDataFrame([Row(k=1, a="ab", b="c")])
        new = spark.createDataFrame([Row(k=1, a="a", b="bc")])
        (row,) = snapshot_diff(old, new, ["k"], ["a", "b"]).collect()
        assert row["change"] == "changed"

    def test_only_fingerprints_shuffle(self, spark):
        old = spark.createDataFrame([Row(k=1, big="payload", v=1)])
        new = spark.createDataFrame([Row(k=1, big="payload", v=2)])
        plan = snapshot_diff(old, new, ["k"], ["v"])._jdf.queryExecution(
        ).executedPlan().toString()
        # the payload column must be pruned before the exchange: it may
        # appear in source Scan lines, but never in a Project/Exchange
        for line in plan.splitlines():
            if "Project" in line or "Exchange" in line:
                assert "big#" not in line, line
