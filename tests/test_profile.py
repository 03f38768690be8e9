"""Single-pass table profiling (operators/profile.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.operators.profile import profile_table


class TestProfileTable:
    def test_counts_and_minmax(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 1.5), (2, None, 2.5), (3, "a", None), (4, "b", 0.5)],
            "id long, s string, v double",
        )
        out = {r["column"]: r for r in profile_table(df, exact=True).collect()}
        assert set(out) == {"id", "s", "v"}
        assert all(r["n_rows"] == 4 for r in out.values())
        assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
        assert out["v"]["n_nulls"] == 1 and out["v"]["n_distinct"] == 3
        assert out["id"]["min_value"] == "1" and out["id"]["max_value"] == "4"
        # doubles render via fixed-scale decimal, never scientific
        assert out["v"]["min_value"] == "0.500000"
        assert out["v"]["max_value"] == "2.500000"

    def test_approx_mode_has_no_expand(self, spark, sf_dir):
        from cga_kinesis_to_elasticsearch_spark.io import load_table

        orders = load_table(spark, sf_dir, "orders")
        exact_plan = profile_table(
            orders, ["o_custkey", "o_orderstatus"], exact=True
        )._jdf.queryExecution().executedPlan().toString()
        approx = profile_table(orders, ["o_custkey", "o_orderstatus"])
        approx_plan = (
            approx._jdf.queryExecution().executedPlan().toString()
        )
        # exact multi-column distinct needs Expand (input replicated per
        # column); the approx scale path must not
        assert "Expand" in exact_plan
        assert "Expand" not in approx_plan
        # approx estimates are sane on real data
        row = {r["column"]: r for r in approx.collect()}
        n = orders.count()
        est = row["o_custkey"]["n_distinct"]
        true = orders.select("o_custkey").distinct().count()
        assert abs(est - true) / true < 0.1
        assert row["o_orderstatus"]["n_rows"] == n

    def test_column_subset_and_order(self, spark):
        df = spark.createDataFrame([(1, "x")], "b long, a string")
        out = profile_table(df, ["b", "a"]).collect()
        # deterministic ascending column order regardless of input order
        assert [r["column"] for r in out] == ["a", "b"]
