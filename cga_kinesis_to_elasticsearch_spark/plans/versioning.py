"""Data-versioning declared queries: snapshot diff classification.

Two versions of the orders table are synthesized identically on both
sides from o_orderkey arithmetic — "old" is the current table minus
the rows added since (keys % 89 == 0) with a stale status on keys
% 7 == 0; "new" is the current table minus rows deleted since (keys
% 83 == 0). The diff must classify every key into
added/removed/changed/unchanged, exercising all four classes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.diff import snapshot_diff
from .declared import _t, q

_DIFF_ORACLE = """
WITH old AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus,
         o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 89 <> 0
),
new AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 83 <> 0
),
d AS (
  SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
         CASE
           WHEN old.o_orderkey IS NULL THEN 'added'
           WHEN new.o_orderkey IS NULL THEN 'removed'
           WHEN old.o_orderstatus = new.o_orderstatus
                AND old.o_totalprice = new.o_totalprice
                AND old.o_orderpriority = new.o_orderpriority
             THEN 'unchanged'
           ELSE 'changed'
         END AS change
  FROM old FULL OUTER JOIN new USING (o_orderkey)
)
SELECT change, COUNT(*) AS n_keys,
       MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
FROM d GROUP BY change ORDER BY change
"""


def _versions(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    old = orders.where(F.col("o_orderkey") % 89 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    new = orders.where(F.col("o_orderkey") % 83 != 0)
    return old, new


@q("snapshot_diff_classes", _DIFF_ORACLE)
def snapshot_diff_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Added/removed/changed/unchanged counts between two synthesized
    orders snapshots. Only (key, md5 fingerprint) pairs shuffle — the
    full-outer classification join never moves payload columns
    (operators/diff.py)."""
    old, new = _versions(spark, sf_dir)
    d = snapshot_diff(
        old,
        new,
        key_cols=["o_orderkey"],
        compare_cols=["o_orderstatus", "o_totalprice", "o_orderpriority"],
    )
    return (
        d.groupBy("change")
        .agg(
            F.count("*").alias("n_keys"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("change")
    )
