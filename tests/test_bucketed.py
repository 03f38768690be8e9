"""Bucketed co-located join: correctness + the exchange-free plan pin.

The point of plans/sql_extras.bucketed_orders_join is physical: both
sides are written bucketed on the join key, so the sort-merge join
must consume the bucketing and the ONLY exchange in the plan is the
3-row final aggregation. These tests pin that property so a
regression (e.g. a changed bucket count on one side) fails loudly
instead of silently re-shuffling 100 TB.
"""

from __future__ import annotations

import re

from cga_kinesis_to_elasticsearch_spark.plans import queries

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestBucketedJoin:
    def test_matches_plain_join(self, spark):
        from pyspark.sql import functions as F

        got = {
            r.o_orderstatus: (r.n_items, r.sum_qty)
            for r in queries()["bucketed_orders_join"](spark, SF_DIR).collect()
        }
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        want = {
            r.o_orderstatus: (r.n_items, r.sum_qty)
            for r in (
                o.join(li, o.o_orderkey == li.l_orderkey)
                .groupBy("o_orderstatus")
                .agg(
                    F.count(F.lit(1)).alias("n_items"),
                    F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
                )
            ).collect()
        }
        assert got == want

    def test_join_is_exchange_free(self, spark):
        plan = _plan(queries()["bucketed_orders_join"](spark, SF_DIR))
        # both scans consume the bucketed layout
        assert plan.count("Bucketed: true") == 2
        assert plan.count("SelectedBucketsCount: 8 out of 8") == 2
        assert "SortMergeJoin" in plan
        # the single exchange is the final 3-row aggregation, nothing
        # below the join moves
        assert len(re.findall(r"Exchange", plan)) == 1
        join_part = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in join_part
