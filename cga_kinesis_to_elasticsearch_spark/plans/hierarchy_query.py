"""Hierarchy-closure declared queries (recursive-CTE parity).

A synthetic forest over ``customer``: node id = c_custkey, parent =
c_custkey DIV 7 (0 => root). Both engines derive the same forest from
the same table; DuckDB resolves it with WITH RECURSIVE while Spark
uses pointer doubling (operators/hierarchy.py) — O(log depth) shuffles
instead of the CTE's O(depth) sequential passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.hierarchy import closure_root_depth
from .declared import _t, q

_NODES_SQL = """
SELECT c_custkey AS id,
       NULLIF(c_custkey // 7, 0) AS parent,
       round(c_acctbal * 100) AS bal_c
FROM customer
"""

_CHAIN_SQL = f"""
WITH RECURSIVE nodes AS ({_NODES_SQL}),
chain AS (
  SELECT id, id AS root, 0 AS depth FROM nodes WHERE parent IS NULL
  UNION ALL
  SELECT n.id, c.root, c.depth + 1
  FROM nodes n JOIN chain c ON n.parent = c.id
)
"""


def _nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    parent = F.expr("c_custkey DIV 7")
    return c.select(
        F.col("c_custkey").alias("id"),
        F.when(parent == 0, F.lit(None).cast("long"))
        .otherwise(parent)
        .alias("parent"),
        F.round(F.col("c_acctbal") * 100).alias("bal_c"),
    )


@q(
    "hierarchy_closure_depth",
    _CHAIN_SQL
    + """
SELECT id, root, CAST(depth AS BIGINT) AS depth
FROM chain
ORDER BY id
""",
)
def hierarchy_closure_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full per-node ancestor closure: (id, root, depth) for every
    customer in the DIV-7 forest. The oracle walks the recursive CTE
    level by level; Spark pointer-doubles to the same fixpoint in
    ceil(log2 depth) compact self-joins."""
    return (
        closure_root_depth(_nodes(spark, sf_dir))
        .select("id", "root", F.col("depth").cast("long").alias("depth"))
        .orderBy("id")
    )


@q(
    "hierarchy_subtree_rollup",
    _CHAIN_SQL
    + """
SELECT root,
       COUNT(*) AS n_nodes,
       CAST(MAX(depth) AS BIGINT) AS max_depth,
       round(SUM(n.bal_c) / 100.0, 2) AS total_bal
FROM chain JOIN nodes n USING (id)
GROUP BY root
ORDER BY root
""",
)
def hierarchy_subtree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-root subtree rollup over the closure: size, height, and
    exact-cents balance total. The closure result is joined back to the
    node frame on id (both sides already hash-partitioned on id from
    the final doubling round)."""
    nodes = _nodes(spark, sf_dir)
    closure = closure_root_depth(nodes)
    return (
        closure.join(nodes.select("id", "bal_c"), "id")
        .groupBy("root")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.max("depth").cast("long").alias("max_depth"),
            F.round(F.sum("bal_c") / 100.0, 2).alias("total_bal"),
        )
        .orderBy("root")
    )
