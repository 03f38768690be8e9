"""Dynamic partition pruning: correctness + the plan pin that makes
the feature real (a silent fallback to a full scan must fail here,
not at 100 TB)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.plans.dpp import (
    built_dpp_store,
    dpp_quarter_revenue,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def store(spark):
    return built_dpp_store(spark, SF_DIR)


class TestDppQuery:
    def test_matches_direct_filter(self, spark, store):
        got = {
            r["om"]: (r["n"], r["cents"])
            for r in dpp_quarter_revenue(spark, SF_DIR).collect()
        }
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        want = {
            r["om"]: (r["n"], r["cents"])
            for r in (
                orders.select(
                    F.date_format("o_orderdate", "yyyy-MM").alias("om"),
                    F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
                )
                .where(F.col("om").isin("1995-04", "1995-05", "1995-06"))
                .groupBy("om")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents"))
                .collect()
            )
        }
        assert got == want
        assert set(got) == {"1995-04", "1995-05", "1995-06"}

    def test_plan_has_dynamic_pruning(self, spark, store):
        """The fact scan must carry a runtime dynamicpruning partition
        filter — i.e. Spark prunes month directories from the DIM
        side's quarter filter at execution time, not a full scan."""
        df = dpp_quarter_revenue(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        norm = plan.lower()
        assert "dynamicpruning" in norm, plan[:4000]

    def test_partitioned_layout_on_disk(self, store):
        months = sorted(p.name for p in (store / "orders_by_month").iterdir()
                        if p.name.startswith("om="))
        # 7-year TPC-H span → ~80 month directories
        assert len(months) >= 24
        assert months[0].startswith("om=")
