"""Declared queries + DuckDB oracles (the t2 correctness surface).

Every SURVEY §2 operator and north-star extension is exposed as a
``(spark, sf_dir) -> DataFrame`` callable with a matching ANSI-SQL
oracle string for DuckDB. Column names are aliased identically on both
sides; doubles are rounded (Spark HALF_UP == DuckDB for these shapes)
so order-insensitive value hashing is stable across engines.

Conventions:
- grok oracles are GENERATED from the same compiled pattern
  (grok.duckdb_exprs), so regex semantics agree by construction;
- timestamps surface as formatted strings or epoch millis — DuckDB
  reads the testdata's TIMESTAMP(NANOS) natively while Spark truncates
  to micros, and both truncations agree at ms/second granularity;
- every LIMIT carries a total order with a unique tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.functions import broadcast

from ..grok import default_grok, duckdb_exprs, grok_columns, grok_match
from ..io import load_table
from ..session import tune_session

QUERY_REGISTRY: dict[str, tuple[Callable, str | None]] = {}

_GROK = default_grok()
_GROK.add_pattern("PROPSKV", r"\{\"k\": %{INT:k_value:int}\}")
_GROK.add_pattern("DOCHEAD", r"^%{WORD:w1} %{WORD:w2} %{GREEDYDATA:tail}")


def _widen_ints(df: DataFrame) -> DataFrame:
    """Declared-query surface convention: top-level integer columns
    are 64-bit. Spark's row_number/size/levenshtein/etc. return int32
    while every oracle aggregate is BIGINT — widening here (one
    narrow codegen projection) makes the sweep width-note-free
    without touching operator-internal types."""
    from pyspark.sql import types as T

    narrow = tuple(
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ByteType, T.ShortType, T.IntegerType))
    )
    if not narrow:
        return df
    # backticks: column names may contain dots (@cf.app)
    return df.select(
        *[
            F.col(f"`{f.name}`").cast("long").alias(f.name)
            if f.name in narrow
            else F.col(f"`{f.name}`")
            for f in df.schema.fields
        ]
    )


def q(name: str, oracle: str | None):
    def deco(fn: Callable) -> Callable:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            return _widen_ints(fn(spark, sf_dir))

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERY_REGISTRY[name] = (wrapped, oracle)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in QUERY_REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_, sql) in QUERY_REGISTRY.items() if sql is not None
    }


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Parity operators (SURVEY §2) over the driver tables
# ---------------------------------------------------------------------------


@q(
    "route_and_filter",
    """
    SELECT route_class,
           strftime(ts, '%Y-%m-%d') AS event_date,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM (
      SELECT *,
             CASE WHEN event_type = 'error' THEN '__drop__'
                  WHEN event_type IN ('click', 'view') THEN 'activity'
                  WHEN event_type = 'purchase' THEN 'revenue'
                  WHEN event_type = 'signup' THEN 'accounts'
                  ELSE '__drop__' END AS route_class
      FROM events)
    WHERE route_class <> '__drop__'
    GROUP BY route_class, event_date
    """,
)
def _route_and_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2: switch-ladder routing with silent drops (main.go:362-412
    re-expressed over the events table)."""
    ev = _t(spark, sf_dir, "events")
    route = (
        F.when(F.col("event_type") == "error", "__drop__")
        .when(F.col("event_type").isin("click", "view"), "activity")
        .when(F.col("event_type") == "purchase", "revenue")
        .when(F.col("event_type") == "signup", "accounts")
        .otherwise("__drop__")
    )
    return (
        ev.withColumn("route_class", route)
        .filter(F.col("route_class") != "__drop__")
        .groupBy("route_class", F.date_format("ts", "yyyy-MM-dd").alias("event_date"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@q(
    "grok_parse_props",
    "SELECT event_id, "
    + ", ".join(duckdb_exprs(_GROK, "props", "PROPSKV"))
    + " FROM events",
)
def _grok_parse_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1/G5: typed grok capture (:int) compiled to regexp_extract +
    try_cast (grok.go:228-259)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select("event_id", *grok_columns(_GROK, "props", "PROPSKV"))


@q(
    "grok_parse_docs",
    "SELECT doc_id, "
    + ", ".join(duckdb_exprs(_GROK, "text", "DOCHEAD"))
    + " FROM documents",
)
def _grok_parse_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1/G4: multi-capture grok parse -> string columns."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", *grok_columns(_GROK, "text", "DOCHEAD"))


_MATCH_RX = _GROK.compile("%{WORD} (join|scan)").regex


@q(
    "grok_match_ratio",
    f"""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN regexp_matches(text, '{_MATCH_RX}') THEN 1 ELSE 0 END) AS BIGINT) AS n_match
    FROM documents GROUP BY lang
    """,
)
def _grok_match_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7: match predicate as a column (grok.go:187-198)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.when(grok_match(_GROK, F.col("text"), "%{WORD} (join|scan)"), 1).otherwise(0)
        ).alias("n_match"),
    )


@q(
    "enrich_snowflake",
    """
    SELECT c_custkey, c_name,
           coalesce(n_name, '') AS nation,
           coalesce(r_name, '') AS region
    FROM customer
    LEFT JOIN nation ON c_nationkey = n_nationkey
    LEFT JOIN region ON n_regionkey = r_regionkey
    """,
)
def _enrich_snowflake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: 3-level snowflake resolution apps->spaces->orgs
    (caching_lazyfill.go:241-265), as customer->nation->region with
    broadcast joins and left-outer tolerance."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce("n_name", F.lit("")).alias("nation"),
            F.coalesce("r_name", F.lit("")).alias("region"),
        )
    )


@q(
    "enrich_missing_tolerated",
    """
    SELECT event_id,
           coalesce(c_name, '') AS cust_name,
           (c_custkey IS NOT NULL) AS matched
    FROM events LEFT JOIN customer ON user_id * 13 = c_custkey
    """,
)
def _enrich_missing_tolerated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J3: broadcast lookup join with missing-key tolerance — the
    IgnoreMissingApps='' degrade (caching_lazyfill.go:111-118)."""
    ev = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer")
    return (
        ev.join(broadcast(c), ev.user_id * 13 == c.c_custkey, "left")
        .select(
            "event_id",
            F.coalesce("c_name", F.lit("")).alias("cust_name"),
            F.col("c_custkey").isNotNull().alias("matched"),
        )
    )


@q(
    "computed_columns",
    """
    SELECT event_id,
           epoch_ms(ts) AS ts_millis,
           strftime(ts, '%Y-%m-%d') AS event_date,
           'gorouter-' || strftime(ts, '%Y-%m-%d') AS es_index
    FROM events
    """,
)
def _computed_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed document columns: epoch-millis timestamp (main.go:438),
    date stamp (main.go:355), index name concat (main.go:400)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.unix_millis("ts").alias("ts_millis"),
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        F.concat(F.lit("gorouter-"), F.date_format("ts", "yyyy-MM-dd")).alias(
            "es_index"
        ),
    )


@q(
    "retention_filter",
    """
    WITH idx AS (
      SELECT DISTINCT 'gorouter-' || strftime(ts, '%Y-%m-%d') AS index_name FROM events
      UNION ALL SELECT * FROM (VALUES ('.kibana'), ('noformat'), ('short'),
                               ('gorouter-2023-13-45'), ('x-0000-01-01')) t(index_name)
    )
    SELECT index_name,
           (index_name = '.kibana'
            OR (length(index_name) >= 10
                AND regexp_matches(index_name[-10:], '^\\d{4}-\\d{2}-\\d{2}$')
                AND index_name[-10:] >= '2024-01-15')) AS keep
    FROM idx
    """,
)
def _retention_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: the retention predicate over a synthesized index catalog
    (main.go:214,227,232-239); cutoff fixed at 2024-01-15."""
    from ..operators.retention import retention_keep

    ev = _t(spark, sf_dir, "events")
    names = ev.select(
        F.concat(F.lit("gorouter-"), F.date_format("ts", "yyyy-MM-dd")).alias(
            "index_name"
        )
    ).distinct()
    extra = spark.createDataFrame(
        [(".kibana",), ("noformat",), ("short",), ("gorouter-2023-13-45",), ("x-0000-01-01",)],
        ["index_name"],
    )
    cat = names.unionAll(extra)
    return cat.select(
        "index_name", retention_keep(F.col("index_name"), "2024-01-15").alias("keep")
    )


@q(
    "suffix_strip",
    """
    SELECT c_custkey, deployed_name,
           CASE WHEN deployed_name LIKE '%-venerable'
                  THEN deployed_name[1:length(deployed_name)-10]
                WHEN deployed_name LIKE '%-blue'
                  THEN deployed_name[1:length(deployed_name)-5]
                WHEN deployed_name LIKE '%-green'
                  THEN deployed_name[1:length(deployed_name)-6]
                ELSE deployed_name END AS app_name
    FROM (
      SELECT c_custkey,
             c_name || CASE c_custkey % 4 WHEN 0 THEN '-venerable'
                                          WHEN 1 THEN '-blue'
                                          WHEN 2 THEN '-green'
                                          ELSE '' END AS deployed_name
      FROM customer)
    """,
)
def _suffix_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blue/green suffix strip (caching_lazyfill.go:143-150; list
    main.go:104) over deterministic synthetic names."""
    from ..operators.enrichment import strip_app_suffixes

    c = _t(spark, sf_dir, "customer")
    deployed = F.concat(
        F.col("c_name"),
        F.when(F.col("c_custkey") % 4 == 0, "-venerable")
        .when(F.col("c_custkey") % 4 == 1, "-blue")
        .when(F.col("c_custkey") % 4 == 2, "-green")
        .otherwise(""),
    )
    return c.select(
        "c_custkey",
        deployed.alias("deployed_name"),
        strip_app_suffixes(deployed).alias("app_name"),
    )


@q(
    "observed_counters",
    """
    SELECT count(CASE WHEN event_type <> 'error' THEN 1 END) AS sent_count,
           count(CASE WHEN event_type = 'error' THEN 1 END) AS errors_count
    FROM events
    """,
)
def _observed_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the sent/errors monotonic counters (main.go:41-47,203-207)
    as a global aggregation."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.when(F.col("event_type") != "error", 1)).alias("sent_count"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("errors_count"),
    )


@q(
    "day_partition_counts",
    """
    SELECT strftime(ts, '%Y-%m-%d') AS event_date, event_type,
           count(*) AS n, round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def _day_partition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: day-partitioned routing — output volume by partition key."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"), "event_type"
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))


# ---------------------------------------------------------------------------
# Standard SQL surface (SURVEY §2.11 — free from Spark, declared so the
# oracle can check it)
# ---------------------------------------------------------------------------


@q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def _q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@q(
    "q3_shipping_priority",
    """
    SELECT o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY o_orderkey, orderdate
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def _q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("o_orderkey", "revenue", "orderdate")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@q(
    "q5_regional_revenue",
    """
    SELECT n_name AS nation,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def _q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@q(
    "window_top_orders",
    """
    SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
    FROM (
      SELECT c_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY c_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM customer JOIN orders ON c_custkey = o_custkey)
    WHERE rn <= 3
    """,
)
def _window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rn",
        )
    )


@q(
    "window_running_sum",
    """
    SELECT o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS UNBOUNDED PRECEDING), 2) AS running_total
    FROM orders
    """,
)
def _window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("running_total")
    )


@q(
    "set_operations",
    """
    SELECT 'with_orders_and_rich' AS tag, c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      INTERSECT SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'no_orders' AS tag, c_custkey FROM (
      SELECT c_custkey FROM customer
      EXCEPT SELECT o_custkey FROM orders)
    """,
)
def _set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    with_orders = o.select(F.col("o_custkey").alias("c_custkey"))
    inter = rich.intersect(with_orders).select(
        F.lit("with_orders_and_rich").alias("tag"), "c_custkey"
    )
    none = (
        c.select("c_custkey")
        .exceptAll(with_orders)
        .distinct()
        .select(F.lit("no_orders").alias("tag"), "c_custkey")
    )
    return inter.unionAll(none)


@q(
    "rollup_order_stats",
    """
    SELECT coalesce(o_orderstatus, '<all>') AS orderstatus,
           coalesce(o_orderpriority, '<all>') AS orderpriority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def _rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("orderpriority"),
            "n",
            "total",
        )
    )


@q(
    "distinct_parts_per_flag",
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_suppliers,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def _distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.count("*").alias("n_rows"),
    )


@q(
    "sessionize_events",
    """
    WITH flagged AS (
      SELECT user_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def _sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows via gap detection (>30 min), the batch analog of
    streaming session windows (T4 notes the reference has none)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_session = F.when(
        F.lag("ts").over(w).isNull()
        | (F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w)) > 1_800_000),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("new_session", new_session)
        .groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"), F.count("*").alias("n_events"))
    )


@q(
    "tumbling_hour_stats",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def _tumbling_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation — F.window in streaming,
    date_trunc in batch (identical bucketing)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour_start"
        ),
        "event_type",
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))


@q(
    "semi_anti_join",
    """
    SELECT 'with_orders' AS side, count(*) AS n FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'without_orders' AS side, count(*) AS n FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def _semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi and left-anti joins (EXISTS / NOT EXISTS) — absent from
    the reference (SURVEY §2.11), free on the Spark surface."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    cond = c.c_custkey == F.col("o_custkey")
    semi = c.join(o, cond, "left_semi").agg(F.count("*").alias("n")).select(
        F.lit("with_orders").alias("side"), "n"
    )
    anti = c.join(o, cond, "left_anti").agg(F.count("*").alias("n")).select(
        F.lit("without_orders").alias("side"), "n"
    )
    return semi.unionAll(anti)


@q(
    "salted_hot_key_agg",
    """
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events GROUP BY event_type
    """,
)
def _salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase salted aggregation (operators/skew.py):
    identical results to the plain GROUP BY oracle, but hot keys split
    across 16 sub-aggregations before the final combine."""
    from ..operators.skew import salted_agg

    ev = _t(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        {"n": ("count", "event_id"), "__sum_value": ("sum", "value")},
        salt_col="event_id",
        n_salts=16,
    )
    return out.select(
        "event_type", "n", F.round("__sum_value", 2).alias("total_value")
    )


@q(
    "salted_skew_join",
    """
    SELECT c.c_mktsegment,
           count(*) AS n,
           round(sum(e.value), 2) AS total_value
    FROM events e
    JOIN customer c ON c.c_custkey = (e.user_id % 1500) + 1
    GROUP BY c.c_mktsegment
    """,
)
def _salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted equi join (operators/skew.salted_join):
    the fact side's hot keys split across 8 deterministic salts, the
    dimension replicated once per salt — result exactly equals the
    plain join, which IS the oracle. For when AQE can't help: layouts
    committed before runtime (bucketed tables, stateful streaming
    joins). The dim key is synthesized from user_id so every event
    matches at any SF."""
    from ..operators.skew import salted_join

    ev = _t(spark, sf_dir, "events").withColumn(
        "c_custkey", (F.col("user_id") % 1500) + 1
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(
        ev, cust, on=["c_custkey"], salt_col="event_id", n_salts=8
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@q(
    "windowed_event_counts",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def _windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The watermark-ready windowed aggregation (streaming/windows.py)
    run in batch mode — same code path Structured Streaming executes
    with withWatermark, degenerate to date_trunc bucketing here."""
    from ..streaming.windows import windowed_counts

    ev = _t(spark, sf_dir, "events")
    out = windowed_counts(ev, ts_col="ts", key_col="event_type")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
    )


@q(
    "approx_distinct_users",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS approx_users,
           count(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def _approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (absent from the reference, SURVEY §2.11):
    sketch-based distinct-user counts per event type via Datasketches
    HLL (mergeable — the same state sketchmaint stores incrementally).
    Oracle is EXACT count(DISTINCT): at sf0.01 cardinalities the lgK=14
    sketch is still in its exact coupon phase, so estimate == truth;
    at 100 TB the identical plan answers with bounded (~1.6%/sqrt(2^14))
    error and constant per-group state. tests/test_sql_surface.py also
    pins <5% relative error for approx_count_distinct (HLL++)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(14)))
            .alias("approx_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type")
    )


@q(
    "asof_last_click",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts, epoch_ms(ts) AS ts_ms FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, c.ts_ms AS asof_ts_ms
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def _asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): for each purchase, the latest
    click by the same user at or before it — union-sort formulation,
    one key shuffle, no pair blow-up. Oracle: DuckDB's native ASOF
    LEFT JOIN."""
    from ..operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.unix_millis("ts").alias("ts_ms")
    )
    out = asof_join(
        probes, clicks, key="user_id", probe_ts="ts", event_ts="ts",
        value_cols=["ts_ms"],
    )
    return out.select("event_id", "user_id", F.col("asof_ts_ms"))


@q(
    "q12_priority_by_status",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_linestatus
    """,
)
def _q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 shape: join + conditional aggregation (CASE inside
    SUM compiles to map-side partial aggregates — no extra pass)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@q(
    "q14_promo_revenue_share",
    """
    SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def _q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q14 shape: broadcast dim join + conditional revenue ratio."""
    from pyspark.sql.functions import broadcast

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0)
    return (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_share")
        )
    )


@q(
    "q18_large_orders",
    """
    SELECT o_orderkey, o_totalprice, sum(l_quantity) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_totalprice
    HAVING sum(l_quantity) > 150
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
)
def _q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18 shape: agg + HAVING + global top-k (TakeOrderedAndProject
    — no full sort materialization)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(20)
    )


@q(
    "range_join_ship_windows",
    """
    WITH iv AS (
      SELECT o_orderkey,
             epoch(o_orderdate) AS w_start,
             epoch(o_orderdate) + 3 * 86400 AS w_end
      FROM orders WHERE o_orderkey % 997 = 0)
    SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
           iv.o_orderkey,
           CAST(epoch(l.l_shipdate) AS BIGINT) AS ship_epoch
    FROM lineitem l JOIN iv
      ON epoch(l.l_shipdate) >= iv.w_start AND epoch(l.l_shipdate) <= iv.w_end
    """,
)
def _range_join_ship_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (operators/rangejoin.py): lineitems shipped inside a
    3-day window after sampled orders — bucketed-bin equi-join instead
    of the quadratic inequality join the oracle runs."""
    from ..operators.rangejoin import range_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.unix_timestamp("l_shipdate").alias("ship_epoch"),
    )
    iv = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 997 == 0)
        .select(
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("w_start"),
            (F.unix_timestamp("o_orderdate") + 3 * 86400).alias("w_end"),
        )
    )
    out = range_join(
        li, iv, point_col="ship_epoch", start_col="w_start", end_col="w_end",
        bin_width=4 * 86400,
    )
    return out.select("l_orderkey", "l_linenumber", "o_orderkey", "ship_epoch")


@q(
    "session_window_stats",
    """
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                  THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered)
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events
    FROM numbered GROUP BY user_id, session_id
    """,
)
def _session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in F.session_window (gap 30 min) — the Catalyst-native
    session operator (streams unchanged with a watermark); oracle is
    the classic gaps-and-islands SQL."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )
