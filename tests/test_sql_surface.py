"""Scale-mechanics assertions: approximate aggregates, bucketed
co-located joins (no exchange), and partition pruning at the sink —
the physical-plan properties COVERAGE.md claims, checked against the
actual executed plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.io import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestApproxAggregates:
    def test_hll_within_tolerance(self, spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        approx = {
            r.event_type: r.approx_users
            for r in ev.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"))
            .collect()
        }
        exact = {
            r.event_type: r.exact
            for r in ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("exact"))
            .collect()
        }
        for et, ex in exact.items():
            assert abs(approx[et] - ex) / max(ex, 1) < 0.05


class TestBucketedJoin:
    def test_bucketed_tables_join_without_shuffle(self, spark, tmp_path):
        """Pre-bucketing both join sides on the key removes the
        exchange entirely — the co-location strategy for repeated big
        joins at 100 TB (shuffle paid once at write time)."""
        spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{tmp_path}'")
        spark.sql("USE bkt")
        try:
            orders = load_table(spark, "/root/testdata/sf0.001", "orders")
            customer = load_table(spark, "/root/testdata/sf0.001", "customer")
            orders.write.bucketBy(4, "o_custkey").sortBy("o_custkey").mode(
                "overwrite"
            ).saveAsTable("orders_b")
            customer.write.bucketBy(4, "c_custkey").sortBy("c_custkey").mode(
                "overwrite"
            ).saveAsTable("customer_b")
            ob, cb = spark.table("orders_b"), spark.table("customer_b")
            joined = ob.join(cb, ob.o_custkey == cb.c_custkey).select(
                "o_orderkey", "c_name"
            )
            # disable broadcast so the join strategy is decided by layout
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                plan = _plan(joined)
            finally:
                spark.conf.set(
                    "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
                )
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan  # co-located
            assert joined.count() > 0
        finally:
            spark.sql("DROP TABLE IF EXISTS bkt.orders_b")
            spark.sql("DROP TABLE IF EXISTS bkt.customer_b")
            spark.sql("USE default")
            spark.sql("DROP DATABASE IF EXISTS bkt")


class TestPartitionPruning:
    def test_sink_reads_prune_by_index(self, spark, tmp_path):
        """Day-partitioned sink layout (P1) must answer
        single-index queries by scanning ONE partition directory."""
        df = spark.createDataFrame(
            [(f"d{i}", f"gorouter-2024-01-{(i % 3) + 1:02d}") for i in range(30)],
            "doc_id string, es_index string",
        )
        df.write.partitionBy("es_index").parquet(str(tmp_path / "data"))
        back = spark.read.parquet(str(tmp_path / "data")).filter(
            F.col("es_index") == "gorouter-2024-01-01"
        )
        plan = _plan(back)
        # the equality predicate reaches the scan as a PARTITION filter
        # (directory-level pruning), not a post-scan row filter
        assert "PartitionFilters: [isnotnull(es_index" in plan
        assert "es_index" in plan.split("PartitionFilters:")[1].split("]")[0]
        assert "= gorouter-2024-01-01" in plan.split("PartitionFilters:")[1].split("]")[0]
        assert back.select("es_index").distinct().count() == 1
        assert back.count() == 10
