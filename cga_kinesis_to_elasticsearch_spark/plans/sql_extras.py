"""SQL-surface extras: cube / grouping sets / pivot / JSON path /
array higher-order functions.

SURVEY §2.11 lists these as absent from the reference but free on the
Spark surface; each is declared here with a DuckDB oracle so the free
claim is *checked*, not asserted.

Cross-engine notes:
- cube/grouping-sets NULL markers are disambiguated with coalesce to
  '<all>' (the grouping columns are never NULL in the data);
- pivot cells use count -> fillna(0) on the Spark side and
  sum(CASE...) on the SQL side, both cast to BIGINT;
- list_aggregate('sum') of an empty DuckDB list is NULL while Spark's
  fold returns the init value — coalesce on the SQL side;
- DuckDB len() is BIGINT, Spark size() is INT — cast to long.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .declared import _t, q

# ---------------------------------------------------------------------------
# CUBE
# ---------------------------------------------------------------------------


@q(
    "cube_order_stats",
    """
    SELECT coalesce(o_orderstatus, '<all>') AS orderstatus,
           coalesce(o_orderpriority, '<all>') AS orderpriority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def _cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping combinations in one
    pass (Spark expands to a single Expand + hash aggregate — one
    shuffle regardless of how many grouping sets)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("orderpriority"),
            "n",
            "total",
        )
    )


# ---------------------------------------------------------------------------
# GROUPING SETS (via the SQL entry point — also exercises spark.sql)
# ---------------------------------------------------------------------------


@q(
    "grouping_sets_revenue",
    """
    SELECT coalesce(l_returnflag, '<all>') AS returnflag,
           coalesce(l_linestatus, '<all>') AS linestatus,
           count(*) AS n,
           round(sum(l_extendedprice), 2) AS total
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def _grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through spark.sql — the DataFrame API
    only exposes the cube/rollup special cases, but the engine's SQL
    entry point carries the general form; same Expand-based plan."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, '<all>') AS returnflag,
               coalesce(l_linestatus, '<all>') AS linestatus,
               count(*) AS n,
               round(sum(l_extendedprice), 2) AS total
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# ---------------------------------------------------------------------------
# PIVOT
# ---------------------------------------------------------------------------


@q(
    "pivot_status_counts",
    """
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
    FROM orders GROUP BY o_orderpriority
    """,
)
def _pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts to one column per status. The value list is
    pinned so the plan needs no pre-pass to discover pivot values (at
    scale the discovery pass is a full extra scan)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


# ---------------------------------------------------------------------------
# JSON path extraction
# ---------------------------------------------------------------------------


@q(
    "json_extract_props",
    """
    SELECT event_id,
           CAST(props->>'$.k' AS INT) AS k_value,
           CAST(CAST(props->>'$.k' AS INT) % 10 AS INT) AS k_bucket
    FROM events
    """,
)
def _json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path functions over the events.props JSON column —
    get_json_object stays JVM-side (Jackson under codegen), no Python.
    The grok route (grok_parse_props) covers the same column as regex;
    this is the JSON-native path."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id",
        k.alias("k_value"),
        (k % 10).cast("int").alias("k_bucket"),
    )


# ---------------------------------------------------------------------------
# Array higher-order functions
# ---------------------------------------------------------------------------


@q(
    "array_hof_order_quantities",
    """
    WITH g AS (
      SELECT l_orderkey, list_sort(list(l_quantity)) AS qties
      FROM lineitem GROUP BY l_orderkey)
    SELECT l_orderkey,
           qties[1] AS min_qty,
           qties[-1] AS max_qty,
           CAST(len(qties) AS BIGINT) AS n_items,
           round(list_aggregate(qties, 'sum') / len(qties), 4) AS avg_qty,
           round(coalesce(list_aggregate(
             list_filter(qties, x -> x > 25), 'sum'), 0.0), 2) AS big_sum
    FROM g
    """,
)
def _array_hof_order_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + higher-order functions: per-order sorted
    quantity vector, then element_at / size / fold / filter-fold — all
    codegen'd JVM lambdas, no UDFs. collect_list is made deterministic
    by array_sort before any position-sensitive op."""
    li = _t(spark, sf_dir, "lineitem")
    g = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_quantity")).alias("qties")
    )
    fold_sum = lambda col: F.aggregate(col, F.lit(0.0), lambda a, x: a + x)
    return g.select(
        "l_orderkey",
        F.element_at("qties", 1).alias("min_qty"),
        F.element_at("qties", -1).alias("max_qty"),
        F.size("qties").cast("long").alias("n_items"),
        F.round(fold_sum(F.col("qties")) / F.size("qties"), 4).alias("avg_qty"),
        F.round(
            fold_sum(F.filter("qties", lambda x: x > 25)), 2
        ).alias("big_sum"),
    )


# ---------------------------------------------------------------------------
# Exact percentiles / dispersion
# ---------------------------------------------------------------------------


@q(
    "percentile_order_value",
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(stddev_samp(o_totalprice), 4) AS sd
    FROM orders GROUP BY o_orderstatus
    """,
)
def _percentile_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles + sample stddev. Spark's
    percentile() and DuckDB's quantile_cont use the same interpolation,
    so values agree at round(4). (percentile_approx is the scale path —
    see approx_distinct_users for the sketch-based pattern.)"""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd"),
    )


# ---------------------------------------------------------------------------
# RANGE-framed window (time-based sliding aggregate)
# ---------------------------------------------------------------------------


@q(
    "window_range_7day",
    """
    SELECT o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 2)
             AS revenue_7day
    FROM orders
    """,
)
def _window_range_7day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per customer, revenue in the trailing
    7 days (peers at the same timestamp included on both engines —
    RANGE semantics make tie order irrelevant, unlike ROWS)."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-604800, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("revenue_7day"),
    )
