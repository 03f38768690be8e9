"""Extended TPC-H-shape declared queries (q2..q22 adapted).

The driver's tables are TPC-H-like but reduced (no partsupp, a single
l_shipdate, no comment/phone columns), so each classic query is adapted
to the available columns while keeping its *shape* — the operator
pattern a 100 TB workload exercises:

- q2   correlated min-per-group (window rank over joined dims)
- q4   EXISTS semi-join feeding an aggregation
- q6   tight scan-and-sum with range predicates (pushdown showcase)
- q7   two-sided dimension resolution + year rollup
- q8   market-share ratio (conditional agg over a 6-way join)
- q9   profit decomposition by nation x year
- q10  top-k customers by returned revenue
- q11  scalar-subquery threshold over a grouped value
- q13  distribution-of-counts (two-level aggregation, left join)
- q15  argmax via scalar subquery on a derived view
- q16  NOT IN anti-join + count distinct
- q17  correlated average (per-group avg joined back)
- q19  OR-bundled multi-predicate join
- q20  nested semi-join (HAVING-filtered supplier set)
- q21  per-group max self-comparison (last shipper in F orders)
- q22  anti-join + global scalar average

Scale notes: every dimension side (part, supplier, nation, region,
customer where small) is broadcast; fact-fact joins shuffle on the join
key only after column pruning; two-phase aggregates (q13, q21) keep the
same shuffle key so the exchange is reused.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.functions import broadcast

from .declared import _t, q

# ---------------------------------------------------------------------------
# q2 — min-acctbal supplier per part (correlated min -> window rank)
# ---------------------------------------------------------------------------


@q(
    "q2_min_supplier",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    cand AS (
      SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
             row_number() OVER (PARTITION BY p_partkey
                                ORDER BY s_acctbal ASC, s_suppkey ASC) AS rn
      FROM part
      JOIN ps ON p_partkey = l_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE p_size <= 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE')
    SELECT p_partkey, s_suppkey, s_name,
           round(s_acctbal, 2) AS acctbal, n_name AS nation
    FROM cand WHERE rn = 1
    """,
)
def _q2_min_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 shape: cheapest (here: lowest-acctbal) qualifying
    supplier per part. partsupp is reconstructed as the distinct
    (partkey, suppkey) pairs observed in lineitem; the correlated
    MIN becomes one window rank over broadcast-joined dims."""
    pairs = (
        _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    w = Window.partitionBy("p_partkey").orderBy(
        F.asc("s_acctbal"), F.asc("s_suppkey")
    )
    return (
        pairs.join(broadcast(p), pairs.l_partkey == p.p_partkey)
        .join(broadcast(s), pairs.l_suppkey == s.s_suppkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "s_suppkey",
            "s_name",
            F.round("s_acctbal", 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
    )


# ---------------------------------------------------------------------------
# q4 — order priority checking (EXISTS -> left-semi join)
# ---------------------------------------------------------------------------


@q(
    "q4_priority_check",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def _q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4 shape: EXISTS over lineitem (shipped after the order
    date stands in for commit<receipt). Left-semi join — the probe side
    never widens, and the aggregation runs on orders only."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# q6 — forecasting revenue change (pure scan + range predicates)
# ---------------------------------------------------------------------------


@q(
    "q6_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def _q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q6: the canonical pushdown showcase — every predicate
    reaches the parquet scan (PushedFilters), projection prunes to 4
    columns, and the plan is scan -> partial agg -> final agg."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )


# ---------------------------------------------------------------------------
# q7 — volume shipping between two nations
# ---------------------------------------------------------------------------


@q(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                           AND TIMESTAMP '1997-12-31')
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def _q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7 shape: both ends of each lineitem resolved to nations
    (supplier side and customer side), filtered to one nation pair.
    Both nation dims broadcast under different aliases."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31 00:00:00")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# q8 — national market share
# ---------------------------------------------------------------------------


@q(
    "q8_market_share",
    """
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                            AND TIMESTAMP '1996-12-31')
    GROUP BY o_year
    """,
)
def _q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8 shape: NATION_5's share of ECONOMY-part revenue sold
    into EUROPE customers, by order year. Conditional-sum ratio over a
    6-way join; every dim broadcast, lineitem->orders the only shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1995-01-01", "1996-12-31 00:00:00")
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# q9 — product type profit
# ---------------------------------------------------------------------------


@q(
    "q9_product_profit",
    """
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount)
               - 0.6 * p_retailprice * l_quantity AS amount
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%')
    GROUP BY nation, o_year
    """,
)
def _q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 shape: profit per supplier-nation per year for 'red'
    parts. ps_supplycost doesn't exist here, so cost is modeled as 60%
    of retail price x quantity — same expression shape."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 2).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# q10 — returned item reporting (top 20 customers)
# ---------------------------------------------------------------------------


@q(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           n_name AS nation
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-10-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def _q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q10: customers who returned the most revenue in a quarter.
    Global top-k -> TakeOrderedAndProject, no full sort."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "nation")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q11 — important part values (scalar-subquery threshold)
# ---------------------------------------------------------------------------


@q(
    "q11_important_parts",
    """
    WITH v AS (
      SELECT l_partkey AS partkey,
             sum(l_extendedprice * l_quantity) AS value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY l_partkey)
    SELECT partkey, round(value, 2) AS value
    FROM v WHERE value > (SELECT sum(value) * 0.001 FROM v)
    """,
)
def _q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 shape: per-part shipped value from NATION_7 suppliers,
    kept only above 0.1% of the national total. The scalar subquery is
    a 1-row broadcast cross join, not a driver collect."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    v = (
        li.join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("value"))
    )
    threshold = v.agg((F.sum("value") * 0.001).alias("__threshold"))
    return (
        v.join(broadcast(threshold))
        .filter(F.col("value") > F.col("__threshold"))
        .select("partkey", F.round("value", 2).alias("value"))
    )


# ---------------------------------------------------------------------------
# q13 — customer order-count distribution
# ---------------------------------------------------------------------------


@q(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def _q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13: two-level aggregation — orders per customer (left
    join keeps zero-order customers), then the distribution of those
    counts. Second aggregation is tiny (one row per distinct count)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# q15 — top supplier (argmax via scalar subquery)
# ---------------------------------------------------------------------------


@q(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def _q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15: supplier(s) with max quarterly revenue. Revenue is
    rounded before the max-compare so Spark and DuckDB agree on ties;
    the max is a 1-row broadcast, not a second scan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("__max_rev"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.join(broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__max_rev"))
        .join(broadcast(s), F.col("suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# q16 — supplier counts per part attribute (NOT IN anti-join)
# ---------------------------------------------------------------------------


@q(
    "q16_part_supplier_counts",
    """
    SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
      AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def _q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 shape: distinct-supplier counts per (brand, type,
    size), excluding blacklisted suppliers (negative acctbal stands in
    for the complaints filter). NOT IN -> broadcast left-anti join."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q17 — small-quantity-order revenue (correlated avg)
# ---------------------------------------------------------------------------


@q(
    "q17_small_qty_revenue",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def _q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17: revenue from unusually small orders of one brand.
    The correlated per-part average is computed once per part on the
    brand-filtered lineitems and joined back (broadcast both: the
    brand prunes to ~2% of parts)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem").join(
        broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    avg_qty = li.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("__qty_cut")
    )
    return (
        li.join(broadcast(avg_qty.withColumnRenamed("l_partkey", "__pk")),
                F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# q19 — discounted revenue (OR-bundled predicates)
# ---------------------------------------------------------------------------


@q(
    "q19_discounted_revenue",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def _q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19: three OR'd brand/size/quantity bundles over a
    broadcast part join; the disjunction stays a single codegen'd
    filter, no union of scans."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    bundle = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .filter(bundle)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# q20 — potential part promotion (nested semi-join)
# ---------------------------------------------------------------------------


@q(
    "q20_part_promotion",
    """
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 200)
    """,
)
def _q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 shape: NATION_3 suppliers who shipped >200 units of
    'small' parts in 1997 (availqty stands in as shipped quantity).
    IN-subquery -> HAVING-filtered aggregate, then a left-semi join."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    heavy = (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 200)
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        s.join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


# ---------------------------------------------------------------------------
# q21 — last shipper in multi-supplier finalized orders
# ---------------------------------------------------------------------------


@q(
    "q21_waiting_suppliers",
    """
    WITH l AS (
      SELECT l_orderkey, l_suppkey, l_shipdate
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'),
    agg AS (
      SELECT l_orderkey AS ok, max(l_shipdate) AS max_ship,
             count(DISTINCT l_suppkey) AS n_supp
      FROM l GROUP BY l_orderkey),
    last AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM l JOIN agg ON l.l_orderkey = agg.ok
      WHERE l.l_shipdate = agg.max_ship AND agg.n_supp >= 2)
    SELECT s_suppkey, s_name, count(*) AS numwait
    FROM last JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_suppkey, s_name
    ORDER BY numwait DESC, s_suppkey ASC
    LIMIT 25
    """,
)
def _q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 shape (adapted to a single date column): in finalized
    orders served by >=2 suppliers, count how often each supplier was
    the LAST to ship — the 'kept everyone waiting' supplier. The
    per-order max/distinct-count are window functions over l_orderkey,
    so the whole per-order phase costs ONE shuffle (vs aggregate +
    join-back + distinct = three); supplier counts per order are tiny,
    so the collect_set window state stays small."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    l = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    w = Window.partitionBy("l_orderkey")
    last = (
        l.withColumn("max_ship", F.max("l_shipdate").over(w))
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .filter((F.col("l_shipdate") == F.col("max_ship")) & (F.col("n_supp") >= 2))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        last.join(broadcast(s), last.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# q22 — global sales opportunity (anti-join + scalar average)
# ---------------------------------------------------------------------------


@q(
    "q22_global_sales",
    """
    WITH avg_bal AS (
      SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0)
    SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode,
           count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND c_nationkey % 5 IN (0, 1, 2)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY cntrycode
    """,
)
def _q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22 shape: above-average-balance customers with no urgent
    orders (every customer here has *some* order, so 'never ordered
    urgently' keeps the anti-join non-degenerate), grouped by country
    code (nationkey % 5 stands in for the phone prefix). Anti-join +
    1-row broadcast scalar average."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__ab")
    )
    return (
        c.filter((F.col("c_nationkey") % 5).isin(0, 1, 2))
        .join(broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 5).cast("int").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence (association rules): which parts ship
# together in one order, with support / confidence / lift. The pair
# expansion is the classic in-basket self-join — fan-out bounded by
# basket size (<= 7 lines per TPC-H order; a production basket op caps
# or samples giant baskets first), so the shuffle carries (order,
# part) pairs, never a |parts|^2 product.
# ---------------------------------------------------------------------------

_BASKET_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n_ord AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM items),
part_n AS (SELECT l_partkey, count(*) AS n_part FROM items GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         count(*) AS n_ab
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, n_ab,
       pa.n_part AS n_a, pb.n_part AS n_b,
       round(n_ab / CAST(n_orders AS DOUBLE), 6) AS support,
       round(n_ab / CAST(pa.n_part AS DOUBLE), 6) AS confidence,
       round((n_ab / CAST(pa.n_part AS DOUBLE))
             / (pb.n_part / CAST(n_orders AS DOUBLE)), 4) AS lift
FROM pairs
JOIN part_n pa ON pa.l_partkey = part_a
JOIN part_n pb ON pb.l_partkey = part_b
CROSS JOIN n_ord
ORDER BY n_ab DESC, part_a, part_b
LIMIT 25
"""


@q("basket_association_rules", _BASKET_ORACLE)
def _basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-occurring part pairs with support/confidence/lift.
    Plan: one distinct on (order, part), an in-basket self-join
    sharing that exchange (both sides hash on l_orderkey), pair
    counting, then two joins against the per-part counts (a parts-
    sized frame — broadcast here, shuffle-join at dimension scale)
    and a one-row order-count broadcast. Ratios divide exact longs,
    so both engines emit identical doubles."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n_ord = items.select(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    part_n = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_part")
    )
    a = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    pa = part_n.select(
        F.col("l_partkey").alias("part_a"), F.col("n_part").alias("n_a")
    )
    pb = part_n.select(
        F.col("l_partkey").alias("part_b"), F.col("n_part").alias("n_b")
    )
    out = (
        pairs.join(F.broadcast(pa), "part_a")
        .join(F.broadcast(pb), "part_b")
        .crossJoin(F.broadcast(n_ord))
    )
    conf = F.col("n_ab") / F.col("n_a").cast("double")
    return (
        out.select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            F.round(
                F.col("n_ab") / F.col("n_orders").cast("double"), 6
            ).alias("support"),
            F.round(conf, 6).alias("confidence"),
            F.round(
                conf / (F.col("n_b") / F.col("n_orders").cast("double")), 4
            ).alias("lift"),
        )
        .orderBy(F.col("n_ab").desc(), "part_a", "part_b")
        .limit(25)
    )
