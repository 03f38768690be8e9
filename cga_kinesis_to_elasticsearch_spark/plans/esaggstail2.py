"""ES aggregation tail, part 2: the remaining Elasticsearch
aggregation / search families with no analogue yet —
``diversified_sampler``, ``moving_percentiles``,
``normalize``, ``bucket_count_ks_test``, ``frequent_item_sets``,
``function_score`` decay scoring, ``collapse`` (field collapsing
with inner-hit accounting), ``geo_distance`` rings, ``search_after``
cursor pagination, and the ``moving_fn`` model family
(linearWeightedAvg + unrolled holt).

Float discipline (house rule, BASELINE oracle notes): every statistic
closes from exact INTEGER inputs (counts, cent-scaled amounts, whole
day distances); doubles appear only in a final closure expression
evaluated identically on both engines and rounded (4-9 decimals).
``pow``/``log`` in closures follow the precedent set by
``ttest_quantity_returnflag`` / ``text_tfidf_top_terms`` — identical
expression trees on integer inputs, rounded before hashing.

Reference context: the reference ships records into Elasticsearch
(main.go:111-212) where these aggregations are what its users run
over the indexed events; each query here is the engine-side
equivalent over the same shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.functions import broadcast

from .declared import _t, q

# ---------------------------------------------------------------------------
# diversified_sampler: cap docs-per-value deterministically, then agg.
# ---------------------------------------------------------------------------

_DIVERSIFIED_ORACLE = """
WITH ranked AS (
  SELECT lang, n_chars,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       round(sum(n_chars) * 1.0 / count(*), 4) AS avg_chars
FROM ranked WHERE rn <= 3
GROUP BY lang ORDER BY lang
"""


@q("diversified_sampler_quality", _DIVERSIFIED_ORACLE)
def _diversified_sampler_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``diversified_sampler`` aggregation: a deterministic sample
    capped at ``max_docs_per_value = 3`` on the ``source`` field
    (de-biasing a dominant source), with a child ``avg`` aggregation
    over ``n_chars`` by language on the sampled set.

    Determinism: ES diversifies by hash order; here the per-source
    order is md5(doc_id) with doc_id tiebreak — stable across engines
    and partitionings. Scale shape: one (source) shuffle for the
    row_number window (sources are the diversity key, so the window
    partition count is the source cardinality), then a partial-agg
    shuffle over the tiny sampled set."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    sampled = docs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 3)
    return (
        sampled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(
            "lang",
            "n",
            "sum_chars",
            F.round(F.col("sum_chars") * 1.0 / F.col("n"), 4).alias("avg_chars"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# moving_percentiles: trailing-window percentiles over a date histogram.
# ---------------------------------------------------------------------------

_MOVING_PCT_ORACLE = """
WITH o AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
days AS (SELECT DISTINCT d FROM o)
SELECT strftime(days.d, '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n7,
       round(quantile_cont(o.cents, 0.5), 4) AS p50_c,
       round(quantile_cont(o.cents, 0.9), 4) AS p90_c
FROM days JOIN o ON o.d BETWEEN days.d - 6 AND days.d
GROUP BY days.d ORDER BY day
"""


@q("moving_percentiles_daily", _MOVING_PCT_ORACLE)
def _moving_percentiles_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``moving_percentiles`` pipeline aggregation: p50/p90 of
    order totals over a trailing 7-day window of a daily
    date_histogram (ES moves the percentile sketch across buckets;
    this computes the exact equivalent).

    Scale shape mirrors ES exactly: ONE partial-agg shuffle reduces
    the fact table to per-day sorted cent arrays (the bucket frame —
    |days| rows, KB-to-MB at any corpus scale since the window spans
    7 buckets), and the trailing window flatten + exact interpolated
    percentile run over that bucket frame, never over raw facts. The
    unpartitioned window is over the bucket frame only — same
    coordinating-node shape as every ES pipeline agg (see
    ``pipeline_aggs_daily``). Interpolation is the standard
    ``h = (n-1)p`` linear rule, identical to DuckDB quantile_cont."""
    orders = _t(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.to_date("o_orderdate").alias("d"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.sort_array(F.collect_list("cents")).alias("vals"))
        .withColumn("di", F.datediff(F.col("d"), F.lit("1990-01-01")))
    )
    w = Window.orderBy("di").rangeBetween(-6, 0)
    merged = daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.sort_array(F.flatten(F.collect_list("vals").over(w))).alias("a"),
    )

    def pct(p: float):
        # h = (n-1)*p; v = a[lo] + frac*(a[lo+1]-a[lo]) (1-indexed
        # element_at; try_element_at covers the h==n-1 edge)
        h = (F.size("a") - 1) * F.lit(p)
        lo = F.floor(h)
        frac = h - lo
        v_lo = F.element_at("a", (lo + 1).cast("int")).cast("double")
        v_hi = F.coalesce(
            F.try_element_at("a", (lo + 2).cast("int")), F.element_at("a", (lo + 1).cast("int"))
        ).cast("double")
        return F.round(v_lo + frac * (v_hi - v_lo), 4)

    return merged.select(
        "day",
        F.size("a").cast("long").alias("n7"),
        pct(0.5).alias("p50_c"),
        pct(0.9).alias("p90_c"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# normalize: rescale bucket metrics (percent_of_sum / rescale_0_1 / z).
# ---------------------------------------------------------------------------

_NORMALIZE_ORACLE = """
WITH buckets AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS nd,
         CAST(sum(n) AS BIGINT) AS s,
         CAST(sum(n * n) AS BIGINT) AS q,
         CAST(min(n) AS BIGINT) AS mn,
         CAST(max(n) AS BIGINT) AS mx
  FROM buckets
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       n,
       round(n * 1.0 / s, 9) AS percent_of_sum,
       round((n - mn) * 1.0 / (mx - mn), 9) AS rescale_0_1,
       round((n - s * 1.0 / nd)
             / sqrt(q * 1.0 / nd - (s * 1.0 / nd) * (s * 1.0 / nd)), 6)
         AS zscore
FROM buckets, stats
ORDER BY day
"""


@q("normalize_daily_share", _NORMALIZE_ORACLE)
def _normalize_daily_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``normalize`` pipeline aggregation, all three rescale
    methods over a daily date_histogram: ``percent_of_sum``,
    ``rescale_0_1`` and ``z-score`` (ES ``mean`` method generalized).

    Scale shape: one partial-agg shuffle builds the |days|-row bucket
    frame; the five global stats reduce that frame to ONE broadcast
    row (no unpartitioned window over facts). z-score closes from
    exact integer sums (sum, sum-of-squares) so both engines evaluate
    the identical double expression."""
    ev = _t(spark, sf_dir, "events")
    buckets = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = buckets.agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("q"),
        F.min("n").alias("mn"),
        F.max("n").alias("mx"),
    )
    mean = F.col("s") * 1.0 / F.col("nd")
    return (
        buckets.crossJoin(broadcast(stats))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n") * 1.0 / F.col("s"), 9).alias("percent_of_sum"),
            F.round(
                (F.col("n") - F.col("mn")) * 1.0 / (F.col("mx") - F.col("mn")), 9
            ).alias("rescale_0_1"),
            F.round(
                (F.col("n") - mean)
                / F.sqrt(F.col("q") * 1.0 / F.col("nd") - mean * mean),
                6,
            ).alias("zscore"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# bucket_count_ks_test: two-sample Kolmogorov-Smirnov D statistic.
# ---------------------------------------------------------------------------

_KS_ORACLE = """
WITH s AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS b
  FROM events
  WHERE event_type IN ('click', 'purchase') AND value IS NOT NULL
),
g AS (SELECT v, CAST(sum(a) AS BIGINT) AS na, CAST(sum(b) AS BIGINT) AS nb
      FROM s GROUP BY v),
t AS (SELECT CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb FROM g),
c AS (SELECT CAST(sum(na) OVER w AS BIGINT) AS ca,
             CAST(sum(nb) OVER w AS BIGINT) AS cb
      FROM g WINDOW w AS (ORDER BY v))
SELECT round(max(abs(ca * 1.0 / ta - cb * 1.0 / tb)), 9) AS ks_d,
       max(ta) AS n_click, max(tb) AS n_purchase
FROM c, t
"""


@q("bucket_ks_test_value", _KS_ORACLE)
def _bucket_ks_test_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``bucket_count_ks_test`` pipeline aggregation: the exact
    two-sample Kolmogorov-Smirnov D statistic between the ``value``
    distributions of 'click' vs 'purchase' events (ES computes it
    over bucket counts; this is the exact ECDF-sup form).

    Scale shape: facts reduce to one (cent-value, count_a, count_b)
    frame — cardinality is the DISTINCT VALUE DOMAIN, not row count —
    then a single cumulative window over that domain frame and a
    1-row max. Counts stay integer until the final two divisions."""
    ev = _t(spark, sf_dir, "events")
    s = ev.where(
        F.col("event_type").isin("click", "purchase") & F.col("value").isNotNull()
    ).select(
        F.round(F.col("value") * 100).cast("long").alias("v"),
        (F.col("event_type") == "click").cast("long").alias("a"),
        (F.col("event_type") == "purchase").cast("long").alias("b"),
    )
    g = s.groupBy("v").agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    t = g.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select(
        F.sum("na").over(w).alias("ca"), F.sum("nb").over(w).alias("cb")
    )
    return c.crossJoin(broadcast(t)).agg(
        F.round(
            F.max(F.abs(F.col("ca") * 1.0 / F.col("ta") - F.col("cb") * 1.0 / F.col("tb"))),
            9,
        ).alias("ks_d"),
        F.max("ta").alias("n_click"),
        F.max("tb").alias("n_purchase"),
    )


# ---------------------------------------------------------------------------
# frequent_item_sets: market-basket frequent pairs (Apriori-pruned).
# ---------------------------------------------------------------------------

_FREQ_PAIRS_ORACLE = """
WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
f AS (SELECT l_partkey FROM items GROUP BY 1 HAVING count(*) >= 2),
it AS (SELECT i.l_orderkey, i.l_partkey FROM items i JOIN f USING (l_partkey)),
p AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM it a JOIN it b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT p1, p2, CAST(count(*) AS BIGINT) AS support
FROM p GROUP BY 1, 2 HAVING count(*) >= 2
ORDER BY support DESC, p1, p2 LIMIT 50
"""


@q("frequent_item_sets_orders", _FREQ_PAIRS_ORACLE)
def _frequent_item_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``frequent_item_sets`` aggregation (market-basket): frequent
    part PAIRS across orders with minimum support 2, top-50 by
    (support desc, pair) — deterministic at the limit boundary.

    Scale shape (the Apriori/FP-growth distributed recipe): (1) prune
    to frequent ITEMS first — one (partkey) partial-agg shuffle, then
    a broadcast semi-join (hash semi-join at 100 TB; the frequent-item
    set shrinks with support); (2) ONE (orderkey) shuffle collects
    each pruned basket; (3) pair expansion happens IN-ROW over the
    sorted basket array (no self-join — same bucketed-expansion shape
    as LSH candidate pairs, `operators/dedup.py`), bounded by
    C(basket_size, 2); (4) one (p1, p2) partial-agg shuffle counts
    support. Facts never self-join."""
    li = _t(spark, sf_dir, "lineitem")
    # NOTE (r9): a collect_set-first variant that removes the distinct
    # exchange (baskets built once, explode+broadcast-prune preserving
    # the orderkey partitioning) measured EQUAL-or-slower in a 5-round
    # same-process A/B (old ~2.03 s vs 2.27 s at sf0.1): the basket
    # ObjectHashAggregate runs once per consuming branch and costs more
    # than the exchange it saves. Keeping the distinct shape.
    items = li.select("l_orderkey", "l_partkey").distinct()
    freq = (
        items.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("l_partkey")
    )
    pruned = items.join(broadcast(freq), "l_partkey")
    baskets = pruned.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("basket")
    )
    # in-row pair expansion: for i<j emit (basket[i], basket[j])
    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(basket, (x, i) -> "
                "transform(slice(basket, i + 2, size(basket)), y -> struct(x AS p1, y AS p2))))"
            )
        ).alias("pr")
    ).select(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
    return (
        pairs.groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 2)
        .orderBy(F.desc("support"), "p1", "p2")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# function_score gauss decay: recency-decayed relevance scoring.
# ---------------------------------------------------------------------------

_DECAY_ORACLE = """
WITH s AS (
  SELECT o_orderkey, o_custkey,
         CAST(datediff('day', DATE '1997-06-30', CAST(o_orderdate AS DATE))
              AS BIGINT) AS dd,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
scored AS (
  SELECT o_orderkey, o_custkey, dd, cents,
         round(power(0.5,
                     power(greatest(abs(dd) - 30, 0) / 182.0, 2)), 6)
           AS decay_score
  FROM s
)
SELECT o_orderkey, o_custkey, dd, cents, decay_score
FROM scored
ORDER BY decay_score DESC, cents DESC, o_orderkey LIMIT 25
"""


@q("function_score_decay_orders", _DECAY_ORACLE)
def _function_score_decay_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``function_score`` with a ``gauss`` decay on date recency:
    origin 1997-06-30, offset 30 d, scale 182 d, decay 0.5 — the
    standard "boost recent documents" recipe
    (score = 0.5 ^ ((max(0, |dist| - offset) / scale)^2)), top-25 with
    deterministic (score, cents, key) tiebreak.

    Scale shape: pure narrow per-row scoring (integer day distance →
    one closed-form double) followed by TakeOrdered(25) — no shuffle
    beyond the top-k reduction. The decay closure is evaluated from
    the same integer inputs on both engines and rounded to 6."""
    orders = _t(spark, sf_dir, "orders")
    s = orders.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1997-06-30"))
        .cast("long")
        .alias("dd"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    decay = F.round(
        F.pow(
            F.lit(0.5),
            F.pow(F.greatest(F.abs(F.col("dd")) - 30, F.lit(0)) / F.lit(182.0), F.lit(2.0)),
        ),
        6,
    )
    return (
        s.withColumn("decay_score", decay)
        .orderBy(F.desc("decay_score"), F.desc("cents"), "o_orderkey")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# collapse: field collapsing with inner-hit accounting.
# ---------------------------------------------------------------------------

_COLLAPSE_ORACLE = """
WITH s AS (
  SELECT user_id, event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id ORDER BY v DESC, event_id) AS rn,
         CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS user_hits
  FROM s
)
SELECT user_id, event_id, event_type, v, user_hits
FROM ranked WHERE rn = 1
ORDER BY v DESC, event_id LIMIT 20
"""


@q("field_collapse_top_events", _COLLAPSE_ORACLE)
def _field_collapse_top_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``collapse`` (field collapsing): the top-20 events by value
    collapsed to ONE hit per ``user_id`` (the user's best event),
    carrying the inner-hit count (how many events each collapsed user
    matched) — the search-result-dedup idiom.

    Scale shape: one (user_id) shuffle serves BOTH the row_number and
    the inner-hit count (same window partition), then TakeOrdered(20)
    reduces — never a global sort of all hits."""
    ev = _t(spark, sf_dir, "events")
    s = ev.where(F.col("value").isNotNull()).select(
        "user_id",
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    w = Window.partitionBy("user_id")
    wr = w.orderBy(F.desc("v"), "event_id")
    return (
        s.withColumn("rn", F.row_number().over(wr))
        .withColumn("user_hits", F.count(F.lit(1)).over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "v", "user_hits")
        .orderBy(F.desc("v"), "event_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# geo_distance: distance-ring buckets from a fixed origin.
# ---------------------------------------------------------------------------

# Planar centi-degree convention shared with plans/geo.py: customers
# get deterministic (lat_centi, lon_centi) from coprime multipliers.
_RING_EDGES = (1000, 2000, 4000, 8000)  # centi-degrees

_GEO_RINGS_ORACLE = """
WITH pts AS (
  SELECT c_custkey, c_acctbal,
         -6000 + (c_custkey * 7) % 12000 AS lat_centi,
         -18000 + (c_custkey * 13) % 36000 AS lon_centi
  FROM customer
),
d AS (
  SELECT c_acctbal,
         (lat_centi - 1500) * (lat_centi - 1500)
         + (lon_centi + 2500) * (lon_centi + 2500) AS d2
  FROM pts
),
ringed AS (
  SELECT CASE WHEN d2 < 1000 * 1000 THEN '0-1000'
              WHEN d2 < 2000 * 2000 THEN '1000-2000'
              WHEN d2 < 4000 * 4000 THEN '2000-4000'
              WHEN d2 < 8000 * 8000 THEN '4000-8000'
              ELSE '8000+' END AS ring,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM d
)
SELECT ring, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(bal_c) AS BIGINT) AS bal_cents
FROM ringed GROUP BY ring ORDER BY ring
"""


@q("geo_distance_rings", _GEO_RINGS_ORACLE)
def _geo_distance_rings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``geo_distance`` aggregation: concentric distance rings from
    a fixed origin (1500, -2500 centi-degrees) with count + balance
    sum per ring — planar centi-degree distance per the repo's geo
    convention (`plans/geo.py`), SQUARED distance compared to squared
    edges so the ring assignment never leaves integer arithmetic.

    Scale shape: pure narrow per-row ring label (no sqrt, no join)
    then one 5-group partial-agg shuffle."""
    cust = _t(spark, sf_dir, "customer")
    lat = F.lit(-6000) + (F.col("c_custkey") * 7) % 12000
    lon = F.lit(-18000) + (F.col("c_custkey") * 13) % 36000
    d2 = (lat - 1500) * (lat - 1500) + (lon + 2500) * (lon + 2500)
    ring = (
        F.when(d2 < 1000 * 1000, "0-1000")
        .when(d2 < 2000 * 2000, "1000-2000")
        .when(d2 < 4000 * 4000, "2000-4000")
        .when(d2 < 8000 * 8000, "4000-8000")
        .otherwise("8000+")
    )
    return (
        cust.select(
            ring.alias("ring"),
            F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
        )
        .groupBy("ring")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("bal_c").alias("bal_cents"))
        .orderBy("ring")
    )


# ---------------------------------------------------------------------------
# search_after: cursor pagination without offset scans.
# ---------------------------------------------------------------------------

_SEARCH_AFTER_ORACLE = """
WITH s AS (
  SELECT event_id, user_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY v DESC, event_id) AS rn FROM s
)
SELECT event_id, user_id, event_type, v
FROM ranked WHERE rn BETWEEN 11 AND 20
ORDER BY v DESC, event_id
"""


@q("search_after_page", _SEARCH_AFTER_ORACLE)
def _search_after_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``search_after`` deep pagination: page 2 (rows 11-20) of
    events sorted by (value desc, event_id), fetched the cursor way —
    the client holds the last sort key of page 1 and the engine
    filters PAST it, never materializing an offset.

    Scale shape: page 1 is a TakeOrdered(10) reduction; its last row
    (the cursor — 1 row to the driver, exactly what an ES client
    holds) becomes a narrow pushed-down filter for page 2, which is
    again TakeOrdered(10). No global sort, no rank window over all
    hits — the oracle's row_number BETWEEN form is the offset
    anti-pattern this replaces."""
    ev = _t(spark, sf_dir, "events")
    s = ev.where(F.col("value").isNotNull()).select(
        "event_id",
        "user_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    page1 = s.orderBy(F.desc("v"), "event_id").limit(10).collect()
    cv, ce = page1[-1]["v"], page1[-1]["event_id"]
    after = (F.col("v") < cv) | ((F.col("v") == cv) & (F.col("event_id") > ce))
    return s.where(after).orderBy(F.desc("v"), "event_id").limit(10)


# ---------------------------------------------------------------------------
# moving_fn model family: linearWeightedAvg + holt over 7-bucket windows.
# ---------------------------------------------------------------------------

# holt(alpha=0.3, beta=0.1) over a FIXED 7-bucket window is a linear
# recursion (s_1 = x_1, b_1 = 0; s_t = a*x_t + (1-a)(s+b);
# b_t = B(s_t - s_{t-1}) + (1-B) b_{t-1}; forecast = s_7 + b_7), so it
# unrolls to one exact linear combination sum(c_i * x_i). The c_i
# below are that unroll; both engines evaluate the IDENTICAL literal
# expression left-to-right, so the doubles agree bit-for-bit.
_HOLT_COEF = (
    "-0.0777457993310001",
    "0.06967475003099996",
    "0.09988125929999996",
    "0.13875278999999996",
    "0.18833699999999995",
    "0.25109999999999993",
    "0.32999999999999996",
)


def _holt_expr(arr: str) -> str:
    # the D suffix keeps Spark from parsing the literals as DECIMAL
    terms = " + ".join(
        f"{c}D * element_at({arr}, {i + 1})" for i, c in enumerate(_HOLT_COEF)
    )
    return f"round({terms}, 6)"


def _holt_sql(arr: str) -> str:
    terms = " + ".join(f"{c} * {arr}[{i + 1}]" for i, c in enumerate(_HOLT_COEF))
    return f"round({terms}, 6)"


_MOVING_FN_ORACLE = f"""
WITH buckets AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
framed AS (
  SELECT event_type, d, n,
         list(n) OVER (PARTITION BY event_type ORDER BY d
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS a
  FROM buckets
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day, n,
       CASE WHEN len(a) = 7 THEN
         round((1 * a[1] + 2 * a[2] + 3 * a[3] + 4 * a[4] + 5 * a[5]
                + 6 * a[6] + 7 * a[7]) / 28.0, 9) END AS lwa7,
       CASE WHEN len(a) = 7 THEN {_holt_sql("a")} END AS holt7
FROM framed ORDER BY event_type, day
"""


@q("moving_fn_models_daily", _MOVING_FN_ORACLE)
def _moving_fn_models_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``moving_fn`` model family beyond the plain average (which
    ``pipeline_aggs_daily`` covers): ``linearWeightedAvg`` (weights
    rise toward the most recent bucket) and ``holt`` (double
    exponential smoothing, alpha=0.3 beta=0.1) over a 7-BUCKET
    trailing window of the per-type daily count histogram — null
    until the window is full, like ES before enough buckets exist.

    Exactness: the lwa numerator is a pure integer dot product
    (round once after /28); holt over a fixed window is unrolled to a
    literal linear combination (see _HOLT_COEF) so both engines run
    the identical IEEE expression. Scale shape: one partial-agg
    shuffle to the (type, day) bucket frame, one window over it —
    the ES coordinating-node shape."""
    ev = _t(spark, sf_dir, "events")
    buckets = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-6, 0)
    )
    framed = buckets.withColumn("a", F.collect_list("n").over(w))
    full = F.size("a") == 7
    lwa_num = sum(
        (i + 1) * F.element_at("a", i + 1) for i in range(7)
    )
    return framed.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n",
        F.when(full, F.round(lwa_num / F.lit(28.0), 9)).alias("lwa7"),
        F.when(full, F.expr(_holt_expr("a"))).alias("holt7"),
    ).orderBy("event_type", "day")
