"""Bucketed co-located joins (operators/bucketing.py): the plan pin
that matters at 100 TB — two tables bucketed on the join key join with
ZERO hash exchanges — plus result equality against the plain join."""

from __future__ import annotations

import uuid

import pytest

from cga_kinesis_to_elasticsearch_spark.operators.bucketing import (
    colocated_join,
    hash_exchanges,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_cust = f"b_orders_{suffix}", f"b_cust_{suffix}"
    orders = spark.read.parquet(f"{SF}/orders.parquet").withColumnRenamed(
        "o_custkey", "custkey"
    )
    cust = spark.read.parquet(f"{SF}/customer.parquet").withColumnRenamed(
        "c_custkey", "custkey"
    )
    write_bucketed(orders, t_orders, ["custkey"], num_buckets=8)
    write_bucketed(cust, t_cust, ["custkey"], num_buckets=8)
    yield t_orders, t_cust, orders, cust
    spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
    spark.sql(f"DROP TABLE IF EXISTS {t_cust}")


@pytest.fixture()
def no_broadcast(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set(
        "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
    )


class TestColocatedJoin:
    def test_zero_exchanges(self, spark, tables, no_broadcast):
        t_orders, t_cust, _, _ = tables
        joined = colocated_join(spark, t_orders, t_cust, on=["custkey"])
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert hash_exchanges(joined) == 0
        assert "SortMergeJoin" in plan

    def test_plain_join_does_exchange(self, spark, tables, no_broadcast):
        # contrast: the same join on unbucketed frames shuffles both sides
        _, _, orders, cust = tables
        plain = orders.join(cust, on=["custkey"])
        assert hash_exchanges(plain) >= 2

    def test_result_equality(self, spark, tables, no_broadcast):
        t_orders, t_cust, orders, cust = tables
        a = colocated_join(spark, t_orders, t_cust, on=["custkey"])
        b = orders.join(cust, on=["custkey"])
        assert a.count() == b.count()
        cols = ["custkey", "o_orderkey", "c_name"]
        assert sorted(map(tuple, a.select(*cols).collect())) == sorted(
            map(tuple, b.select(*cols).collect())
        )
