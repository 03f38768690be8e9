"""Bucketed table layout for shuffle-free co-located joins.

At 100 TB the dominant recurring cost of fact-to-fact joins is the key
shuffle. When the same join key is used repeatedly (orders x lineitem
on orderkey, events x events on user), paying ONE layout-time
clustering and joining exchange-free forever after is the standard
trade: ``bucketBy(n, key)`` writes each table pre-hash-clustered, and
Spark's planner then drops both Exchange operators from any
equi-join on the bucket key with matching bucket counts (and drops the
sorts too when ``sortBy`` matches).

This is the batch analogue of the streaming path's "no keyed state on
the hot path" rule (DESIGN.md §1): organize data once, at write time,
so the per-query plan stays narrow.

The reference has no equivalent (its only join is the broadcast
dimension lookup, main.go:331-349); this is a north-star scale
mechanic for the 100 TB posture.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "colocated_join", "hash_exchanges"]


def write_bucketed(
    df: "DataFrame",
    table: str,
    keys: list[str],
    num_buckets: int = 16,
    sort_keys: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    ``num_buckets`` sizes the per-bucket data, not the parallelism cap:
    scans can still split a bucket's files. Pick it so a bucket's share
    of the join's working set fits an executor core (~128-256 MB post
    compression) — at 100 TB on 1000 executors that is O(10^4-10^5)
    buckets.
    """
    sort_keys = sort_keys or keys
    (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, keys[0], *keys[1:])
        .sortBy(sort_keys[0], *sort_keys[1:])
        .saveAsTable(table)
    )


def colocated_join(
    spark: "SparkSession",
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> "DataFrame":
    """Join two tables bucketed on ``on`` with equal bucket counts.

    The plan is a SortMergeJoin with ZERO hash exchanges (pinned in
    test_bucketing.py) — each task reads bucket i of both sides.
    """
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def hash_exchanges(df: "DataFrame") -> int:
    """Count hash-partitioning Exchange operators in the physical plan
    (the thing bucketing exists to eliminate)."""
    jvm = df.sparkSession._jvm  # type: ignore[attr-defined]
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)  # type: ignore[attr-defined]
    return sum(
        1 for line in plan.splitlines() if "Arguments: hashpartitioning" in line
    )
