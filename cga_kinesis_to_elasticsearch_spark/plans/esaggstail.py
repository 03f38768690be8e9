"""ES aggregation tail: the remaining Elasticsearch aggregation /
query families a Kibana-backed analytics surface exposes that had no
analogue yet — ``boxplot``, ``t_test``, ``rate``, ``multi_terms``,
``change_point``, ``fuzzy`` term matching, ``ip_prefix``,
``random_sampler`` and ``variable_width_histogram``.

Float discipline (BASELINE oracle notes): every statistic closes from
exact INTEGER sums (counts, cent-scaled amounts, whole quantities);
doubles appear only in (a) raw input values that are compared or
selected, never summed, and (b) a final closure expression evaluated
identically on both engines and rounded to 9 decimals.

Reference context: the reference ships records into Elasticsearch
(main.go:111-212) where exactly these aggregations are what its users
run over the indexed events; each query here is the engine-side
equivalent over the same shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.functions import broadcast

from .declared import _t, q

# ---------------------------------------------------------------------------
# boxplot: per-key five-number summary + Tukey whiskers (ES boxplot
# aggregation: min/q1/q2/q3/max plus lower/upper whisker = nearest
# data points inside the 1.5*IQR fences).
# ---------------------------------------------------------------------------

_BOXPLOT_ORACLE = """
WITH ranked AS (
  SELECT event_type, value,
         cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cd
  FROM events WHERE value IS NOT NULL
),
quart AS (
  SELECT event_type,
         count(*) AS n,
         min(value) AS v_min,
         max(value) AS v_max,
         min(CASE WHEN cd >= 0.25 THEN value END) AS q1,
         min(CASE WHEN cd >= 0.5 THEN value END) AS q2,
         min(CASE WHEN cd >= 0.75 THEN value END) AS q3
  FROM ranked GROUP BY event_type
),
fenced AS (
  SELECT *, q3 - q1 AS iqr,
         q1 - 1.5 * (q3 - q1) AS lo_fence,
         q3 + 1.5 * (q3 - q1) AS hi_fence
  FROM quart
),
whisk AS (
  SELECT e.event_type,
         min(CASE WHEN e.value >= f.lo_fence THEN e.value END)
           AS lo_whisker,
         max(CASE WHEN e.value <= f.hi_fence THEN e.value END)
           AS hi_whisker
  FROM events e JOIN fenced f ON e.event_type = f.event_type
  WHERE e.value IS NOT NULL
  GROUP BY e.event_type
)
SELECT f.event_type, f.n, f.v_min, f.q1, f.q2, f.q3, f.v_max,
       round(f.iqr, 9) AS iqr, w.lo_whisker, w.hi_whisker
FROM fenced f JOIN whisk w ON f.event_type = w.event_type
ORDER BY f.event_type
"""


@q("boxplot_value_by_type", _BOXPLOT_ORACLE)
def _boxplot_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES boxplot parity: five-number summary + Tukey whiskers of
    event value per event type. Quartiles are percentile_disc via
    cume_dist (selected INPUT values, no interpolation — exact on
    ties and bit-identical cross-engine); whiskers are the nearest
    input values inside the 1.5*IQR fences.

    Scale shape: two hash exchanges on event_type — the cume_dist
    window and its groupBy share the first (same partitioning), and
    the whisker pass re-scans the narrow (type, value) projection
    against the BROADCAST per-type fences. No global sort, no
    interpolated floats; the only arithmetic is the fence closure,
    identical IEEE on both engines."""
    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    staged = ev.select("event_type", "value")
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = staged.withColumn("cd", F.cume_dist().over(w))
    quart = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
        F.min(F.when(F.col("cd") >= 0.25, F.col("value"))).alias("q1"),
        F.min(F.when(F.col("cd") >= 0.5, F.col("value"))).alias("q2"),
        F.min(F.when(F.col("cd") >= 0.75, F.col("value"))).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    fenced = quart.select(
        "*",
        iqr.alias("iqr"),
        (F.col("q1") - F.lit(1.5) * iqr).alias("lo_fence"),
        (F.col("q3") + F.lit(1.5) * iqr).alias("hi_fence"),
    )
    whisk = (
        staged.join(
            broadcast(fenced.select("event_type", "lo_fence", "hi_fence")),
            "event_type",
        )
        .groupBy("event_type")
        .agg(
            F.min(
                F.when(F.col("value") >= F.col("lo_fence"), F.col("value"))
            ).alias("lo_whisker"),
            F.max(
                F.when(F.col("value") <= F.col("hi_fence"), F.col("value"))
            ).alias("hi_whisker"),
        )
    )
    return (
        fenced.join(whisk, "event_type")
        .select(
            "event_type",
            "n",
            "v_min",
            "q1",
            "q2",
            "q3",
            "v_max",
            F.round("iqr", 9).alias("iqr"),
            "lo_whisker",
            "hi_whisker",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# t_test: Welch's unpaired two-sample t on l_quantity between return
# flags A and R (ES t_test aggregation, "heteroscedastic" type).
# Quantity is a whole number <= 50, so n / sum(x) / sum(x^2) are exact
# int64 beyond 100 TB row counts; the Welch closure runs in double.
# ---------------------------------------------------------------------------

_TTEST_ORACLE = """
WITH sums AS (
  SELECT
    CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS nr,
    CAST(sum(CASE WHEN l_returnflag = 'A'
             THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS sa,
    CAST(sum(CASE WHEN l_returnflag = 'R'
             THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS sr,
    CAST(sum(CASE WHEN l_returnflag = 'A'
             THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
             ELSE 0 END) AS BIGINT) AS ssa,
    CAST(sum(CASE WHEN l_returnflag = 'R'
             THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
             ELSE 0 END) AS BIGINT) AS ssr
  FROM lineitem
),
d AS (
  SELECT na, nr,
         CAST(na AS DOUBLE) AS nad, CAST(nr AS DOUBLE) AS nrd,
         CAST(sa AS DOUBLE) AS sad, CAST(sr AS DOUBLE) AS srd,
         CAST(ssa AS DOUBLE) AS ssad, CAST(ssr AS DOUBLE) AS ssrd
  FROM sums
),
v AS (
  SELECT na, nr,
         sad / nad AS ma, srd / nrd AS mr,
         (ssad - sad * sad / nad) / (nad - 1) AS va,
         (ssrd - srd * srd / nrd) / (nrd - 1) AS vr,
         nad, nrd
  FROM d
)
SELECT na, nr,
       round(ma, 9) AS mean_a,
       round(mr, 9) AS mean_r,
       round(ma - mr, 9) AS mean_diff,
       round((ma - mr) / sqrt(va / nad + vr / nrd), 9) AS t_stat,
       round(pow(va / nad + vr / nrd, 2) /
             (pow(va / nad, 2) / (nad - 1) + pow(vr / nrd, 2) / (nrd - 1)),
             9) AS welch_df
FROM v
"""


@q("ttest_quantity_returnflag", _TTEST_ORACLE)
def _ttest_quantity_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES t_test parity (heteroscedastic / Welch): compares mean
    l_quantity between returned (R) and the A flag populations —
    t statistic and Welch-Satterthwaite degrees of freedom.

    Scale shape: ONE scan, one partial-aggregated reduce to a single
    6-counter row (conditional int64 sums — quantity <= 50 keeps
    sum(x^2) exact int64 past 10^15 rows); the Welch closure is a few
    double ops on that one row, identical IEEE on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    is_a = F.col("l_returnflag") == "A"
    is_r = F.col("l_returnflag") == "R"
    zero = F.lit(0).cast("long")
    sums = li.agg(
        F.sum(F.when(is_a, F.lit(1)).otherwise(0)).cast("long").alias("na"),
        F.sum(F.when(is_r, F.lit(1)).otherwise(0)).cast("long").alias("nr"),
        F.sum(F.when(is_a, x).otherwise(zero)).alias("sa"),
        F.sum(F.when(is_r, x).otherwise(zero)).alias("sr"),
        F.sum(F.when(is_a, x * x).otherwise(zero)).alias("ssa"),
        F.sum(F.when(is_r, x * x).otherwise(zero)).alias("ssr"),
    )
    nad, nrd = F.col("na").cast("double"), F.col("nr").cast("double")
    sad, srd = F.col("sa").cast("double"), F.col("sr").cast("double")
    ssad, ssrd = F.col("ssa").cast("double"), F.col("ssr").cast("double")
    ma, mr = sad / nad, srd / nrd
    va = (ssad - sad * sad / nad) / (nad - F.lit(1))
    vr = (ssrd - srd * srd / nrd) / (nrd - F.lit(1))
    se2 = va / nad + vr / nrd
    return sums.select(
        "na",
        "nr",
        F.round(ma, 9).alias("mean_a"),
        F.round(mr, 9).alias("mean_r"),
        F.round(ma - mr, 9).alias("mean_diff"),
        F.round((ma - mr) / F.sqrt(se2), 9).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(va / nad, 2) / (nad - F.lit(1))
                + F.pow(vr / nrd, 2) / (nrd - F.lit(1))
            ),
            9,
        ).alias("welch_df"),
    )


# ---------------------------------------------------------------------------
# rate: per calendar-month bucket, the order count and revenue
# normalized to a per-day unit (ES rate aggregation with unit=day
# inside a date_histogram) — buckets of unequal width become
# comparable.
# ---------------------------------------------------------------------------

_RATE_ORACLE = """
WITH m AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         count(*) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS sum_c
  FROM orders GROUP BY 1
)
SELECT strftime(month, '%Y-%m-%d') AS month,
       CAST(day(last_day(month)) AS BIGINT) AS days_in_month,
       n_orders,
       round(n_orders / CAST(day(last_day(month)) AS DOUBLE), 9)
         AS orders_per_day,
       CAST(round(sum_c / CAST(day(last_day(month)) AS DOUBLE), 0)
            AS BIGINT) AS revenue_per_day_c
FROM m ORDER BY month
"""


@q("rate_orders_monthly", _RATE_ORACLE)
def _rate_orders_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rate-aggregation parity: date_histogram(month) with order
    count and revenue normalized to per-day rates, so February and
    July buckets compare fairly.

    Scale shape: ONE partial-aggregated exchange keyed on the month
    (calendar-bounded group count); revenue sums as exact cents
    int64 and each per-day rate is a single double division on the
    reduced frame. The order rate rounds to 9; the revenue rate is
    emitted as INTEGER cents/day — at multi-million-dollar months a
    9-decimal grid sits below double's ulp, where the two engines'
    round() implementations legitimately disagree."""
    o = _t(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate")).cast("date")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    m = (
        o.select(month.alias("month"), cents.alias("c"))
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("c").alias("sum_c"),
        )
    )
    days = F.dayofmonth(F.last_day(F.col("month"))).cast("long")
    return m.select(
        F.date_format("month", "yyyy-MM-dd").alias("month"),
        days.alias("days_in_month"),
        "n_orders",
        F.round(F.col("n_orders") / days.cast("double"), 9).alias(
            "orders_per_day"
        ),
        F.round(F.col("sum_c") / days.cast("double"), 0)
        .cast("long")
        .alias("revenue_per_day_c"),
    ).orderBy("month")


# ---------------------------------------------------------------------------
# multi_terms: top composite (status, priority) buckets ordered by
# doc count — ES multi_terms aggregation (terms over a field tuple,
# with the same top-N + deterministic tie-break contract as terms).
# ---------------------------------------------------------------------------

_MULTI_TERMS_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS doc_count,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS sum_price_c
FROM orders
GROUP BY o_orderstatus, o_orderpriority
ORDER BY doc_count DESC, o_orderstatus, o_orderpriority
LIMIT 10
"""


@q("multi_terms_status_priority", _MULTI_TERMS_ORACLE)
def _multi_terms_status_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ES multi_terms parity: terms over the (status, priority) tuple,
    top 10 by doc count with the key tuple as tie-break, plus a
    sub-aggregated revenue sum in exact cents.

    Scale shape: one partial-aggregated exchange on the composite key
    (cardinality = |status| x |priority|, tiny), then a driver-side
    top-10 of the already-reduced frame — the fact table never sorts."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return (
        o.select("o_orderstatus", "o_orderpriority", cents.alias("c"))
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum("c").alias("sum_price_c"),
        )
        .orderBy(
            F.col("doc_count").desc(), "o_orderstatus", "o_orderpriority"
        )
        .limit(10)
    )


# ---------------------------------------------------------------------------
# change_point: single most-likely level-shift in the daily order
# count series (ES change_point aggregation). Split chosen to
# minimize total within-segment SSE — the classic binary-segmentation
# step — with the earliest day as tie-break.
# ---------------------------------------------------------------------------

_CHANGE_POINT_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
cum AS (
  SELECT d, x,
         row_number() OVER (ORDER BY d) AS k,
         CAST(sum(x) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cs,
         CAST(sum(x * x) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS css,
         count(*) OVER () AS tk,
         CAST(sum(x) OVER () AS BIGINT) AS ts,
         CAST(sum(x * x) OVER () AS BIGINT) AS tss
  FROM daily
),
cand AS (
  SELECT d, k, tk,
         CAST(k AS DOUBLE) AS nl, CAST(tk - k AS DOUBLE) AS nr,
         CAST(cs AS DOUBLE) AS sl, CAST(ts - cs AS DOUBLE) AS sr,
         CAST(css AS DOUBLE) AS ssl, CAST(tss - css AS DOUBLE) AS ssr,
         CAST(ts AS DOUBLE) AS tsd, CAST(tss AS DOUBLE) AS tssd,
         CAST(tk AS DOUBLE) AS tkd
  FROM cum WHERE k < tk
),
scored AS (
  SELECT strftime(d, '%Y-%m-%d') AS split_day,
         k AS n_left, tk - k AS n_right,
         round(sl / nl, 9) AS mean_left,
         round(sr / nr, 9) AS mean_right,
         round((ssl - sl * sl / nl) + (ssr - sr * sr / nr), 9)
           AS sse_split,
         round(tssd - tsd * tsd / tkd, 9) AS sse_single,
         round((tssd - tsd * tsd / tkd)
               - ((ssl - sl * sl / nl) + (ssr - sr * sr / nr)), 9)
           AS sse_reduction
  FROM cand
)
SELECT * FROM scored ORDER BY sse_split ASC, split_day ASC LIMIT 1
"""


@q("change_point_daily_orders", _CHANGE_POINT_ORACLE)
def _change_point_daily_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ES change_point parity: the binary-segmentation level-shift
    detector — the split day minimizing total within-segment SSE of
    the daily order-count series, with the variance explained.

    Scale shape: the data-sized work is ONE partial-aggregated
    exchange to calendar-bounded daily buckets (exact int64 count and
    count^2 sums — daily counts of ~4e7 keep sum(x^2) inside int64 at
    100 TB); the cumulative/total windows and the argmin then run on
    that tiny frame (a single in-memory partition by construction,
    which is the point — the candidate scan is O(#days), not O(rows)).
    SSE closure in double, rounded to 9, identical IEEE cross-engine."""
    o = _t(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("x"))
        .select("d", F.col("x").cast("long").alias("x"))
    )
    wc = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = daily.select(
        "d",
        F.row_number().over(Window.orderBy("d")).alias("k"),
        F.sum("x").over(wc).alias("cs"),
        F.sum(F.col("x") * F.col("x")).over(wc).alias("css"),
        F.count(F.lit(1)).over(wt).alias("tk"),
        F.sum("x").over(wt).alias("ts"),
        F.sum(F.col("x") * F.col("x")).over(wt).alias("tss"),
    ).where(F.col("k") < F.col("tk"))
    nl = F.col("k").cast("double")
    nr = (F.col("tk") - F.col("k")).cast("double")
    sl = F.col("cs").cast("double")
    sr = (F.col("ts") - F.col("cs")).cast("double")
    ssl = F.col("css").cast("double")
    ssr = (F.col("tss") - F.col("css")).cast("double")
    tkd = F.col("tk").cast("double")
    tsd = F.col("ts").cast("double")
    tssd = F.col("tss").cast("double")
    sse_split = (ssl - sl * sl / nl) + (ssr - sr * sr / nr)
    sse_single = tssd - tsd * tsd / tkd
    scored = cum.select(
        F.date_format("d", "yyyy-MM-dd").alias("split_day"),
        F.col("k").alias("n_left"),
        (F.col("tk") - F.col("k")).alias("n_right"),
        F.round(sl / nl, 9).alias("mean_left"),
        F.round(sr / nr, 9).alias("mean_right"),
        F.round(sse_split, 9).alias("sse_split"),
        F.round(sse_single, 9).alias("sse_single"),
        F.round(sse_single - sse_split, 9).alias("sse_reduction"),
    )
    return scored.orderBy(
        F.col("sse_split").asc(), F.col("split_day").asc()
    ).limit(1)


# ---------------------------------------------------------------------------
# fuzzy: edit-distance term matching (ES fuzzy query, fuzziness=2)
# against the part-name vocabulary.
# ---------------------------------------------------------------------------

_FUZZY_PROBE = "gren"  # a misspelling: matches green (1), grey... etc.

_FUZZY_ORACLE = f"""
WITH words AS (
  SELECT DISTINCT p_partkey, w.term
  FROM part, unnest(string_split(p_name, ' ')) AS w(term)
  WHERE w.term <> ''
),
vocab AS (
  SELECT term, count(*) AS n_parts FROM words GROUP BY term
)
SELECT term, levenshtein(term, '{_FUZZY_PROBE}') AS dist, n_parts
FROM vocab
WHERE levenshtein(term, '{_FUZZY_PROBE}') <= 2
ORDER BY dist, term
"""


@q("fuzzy_terms_part", _FUZZY_ORACLE)
def _fuzzy_terms_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES fuzzy-query parity: vocabulary terms within Levenshtein
    distance 2 of the probe, with per-term document frequency —
    the expansion step a fuzzy term query performs against the
    term dictionary.

    Scale shape: term extraction is narrow; the distinct
    (part, term) + vocab aggregation shuffle on the term key
    (vocabulary-sized output, not corpus-sized); the edit distance
    evaluates once per DISTINCT term against a literal probe —
    never per document."""
    p = _t(spark, sf_dir, "part")
    words = (
        p.select(
            "p_partkey",
            F.explode(F.split(F.col("p_name"), " ")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    vocab = words.groupBy("term").agg(F.count(F.lit(1)).alias("n_parts"))
    dist = F.levenshtein(F.col("term"), F.lit(_FUZZY_PROBE))
    return (
        vocab.select("term", dist.alias("dist"), "n_parts")
        .where(F.col("dist") <= 2)
        .orderBy("dist", "term")
    )


# ---------------------------------------------------------------------------
# ip_prefix: /16 subnet bucketing of client IPs (ES ip_prefix
# aggregation, prefix_length=16) over the same synthesized IP facts
# as ip_cidr_enrich (loganalytics._IP_SQL).
# ---------------------------------------------------------------------------

_IP_PREFIX_ORACLE = """
WITH f AS (
  SELECT event_id, user_id,
         (10 + user_id % 4) AS o1,
         (user_id % 200) AS o2
  FROM events
)
SELECT CAST(o1 AS VARCHAR) || '.' || CAST(o2 AS VARCHAR) || '.0.0/16'
         AS subnet,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM f
GROUP BY o1, o2
ORDER BY n_events DESC, subnet
"""


@q("ip_prefix_counts", _IP_PREFIX_ORACLE)
def _ip_prefix_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ip_prefix parity (prefix_length=16): events bucketed by the
    /16 subnet of their client IP (synthesized from ids exactly as
    ip_cidr_enrich), with event and distinct-user counts.

    Scale shape: one partial-aggregated exchange on the (o1, o2)
    prefix pair (<= 800 buckets by construction; real /16 space caps
    at 65k) — prefix extraction is integer arithmetic in codegen, no
    string parsing on the hot path."""
    ev = _t(spark, sf_dir, "events")
    o1 = (F.lit(10) + F.col("user_id") % 4).cast("long")
    o2 = (F.col("user_id") % 200).cast("long")
    return (
        ev.select(
            o1.alias("o1"), o2.alias("o2"), "user_id"
        )
        .groupBy("o1", "o2")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.concat_ws(
                "",
                F.col("o1").cast("string"),
                F.lit("."),
                F.col("o2").cast("string"),
                F.lit(".0.0/16"),
            ).alias("subnet"),
            "n_events",
            "n_users",
        )
        .orderBy(F.col("n_events").desc(), "subnet")
    )


# ---------------------------------------------------------------------------
# random_sampler: deterministic hash-bernoulli sample + inverse-
# probability scaled estimates (ES random_sampler aggregation:
# run the child aggs on a p-fraction and scale counts back up).
# ---------------------------------------------------------------------------

_SAMPLER_SEED = "rs1"
_SAMPLER_P = 0.25  # keep-probability; hex threshold = p * 2^32

_SAMPLER_ORACLE = f"""
WITH s AS (
  SELECT value
  FROM events
  WHERE substring(md5('{_SAMPLER_SEED}:' || CAST(event_id AS VARCHAR)), 1, 8)
        < '40000000'
),
agg AS (
  SELECT count(*) AS sampled_n,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
           AS sampled_c
  FROM s
)
SELECT sampled_n,
       round(sampled_n / {_SAMPLER_P!r}, 9) AS est_total_n,
       round(sampled_c / {_SAMPLER_P!r} / 100, 9) AS est_total_value
FROM agg
"""


@q("random_sampler_estimate", _SAMPLER_ORACLE)
def _random_sampler_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES random_sampler parity: aggregate over a deterministic
    hash-bernoulli p=0.25 sample and scale the results by 1/p —
    the same md5-threshold predicate as the corpus sampling ops
    (replayable, split-safe, no RNG state).

    Scale shape: the sample predicate is a narrow codegen filter
    evaluated at the scan (3/4 of rows never leave the mapper) and
    ONE single-row reduce follows — the exact cost profile that makes
    random_sampler attractive on a 100 TB index."""
    ev = _t(spark, sf_dir, "events")
    keep = (
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{_SAMPLER_SEED}:"),
                    F.col("event_id").cast("string"),
                )
            ),
            1,
            8,
        )
        < "40000000"
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    agg = ev.where(keep).agg(
        F.count(F.lit(1)).alias("sampled_n"),
        F.sum(cents).alias("sampled_c"),
    )
    return agg.select(
        "sampled_n",
        F.round(F.col("sampled_n") / F.lit(_SAMPLER_P), 9).alias(
            "est_total_n"
        ),
        F.round(
            F.col("sampled_c") / F.lit(_SAMPLER_P) / F.lit(100), 9
        ).alias("est_total_value"),
    )


# ---------------------------------------------------------------------------
# variable_width_histogram: 8 equal-frequency, value-atomic price
# buckets (ES variable_width_histogram clusters close values into a
# requested number of buckets; equal-frequency on the distinct-value
# grid is the deterministic analogue — identical values never split).
# ---------------------------------------------------------------------------

_VWH_BUCKETS = 8

_VWH_ORACLE = f"""
WITH v AS (
  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS c,
         count(*) AS n
  FROM orders GROUP BY 1
),
cum AS (
  SELECT c, n,
         CAST(coalesce(sum(n) OVER (ORDER BY c
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS before_n,
         CAST(sum(n) OVER () AS BIGINT) AS tot_n
  FROM v
),
b AS (
  SELECT c, n,
         CAST(least(floor(before_n * {_VWH_BUCKETS}.0 / tot_n),
                    {_VWH_BUCKETS - 1}) AS BIGINT) AS bucket
  FROM cum
)
SELECT bucket,
       CAST(sum(n) AS BIGINT) AS doc_count,
       round(min(c) / 100.0, 9) AS min_price,
       round(max(c) / 100.0, 9) AS max_price,
       round(CAST(sum(c * n) AS DOUBLE) / CAST(sum(n) AS DOUBLE) / 100, 9)
         AS avg_price
FROM b GROUP BY bucket ORDER BY bucket
"""


@q("variable_width_histogram_price", _VWH_ORACLE)
def _variable_width_histogram_price(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ES variable_width_histogram parity: 8 equal-frequency,
    value-atomic buckets over order price with per-bucket count /
    min / max / centroid — deterministic where ES's one-pass
    clustering is not (identical prices land in one bucket; bucket
    of a distinct value = floor(rows_before * B / total)).

    Scale shape: the data-sized work is ONE partial-aggregated
    exchange onto the distinct cent-value grid (bounded domain — the
    grid size is price-range-bounded regardless of row count); the
    cumulative window and final 8-bucket reduce run on that grid.
    No global row sort, unlike a naive ntile plan. sum(c * n) is
    int64-exact to ~10^11 rows per grid value; bucket means close in
    double rounded to 9."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    v = (
        o.select(cents.alias("c"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wb = Window.orderBy("c").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wt = Window.orderBy("c").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = v.select(
        "c",
        "n",
        F.coalesce(F.sum("n").over(wb), F.lit(0)).cast("long").alias(
            "before_n"
        ),
        F.sum("n").over(wt).cast("long").alias("tot_n"),
    )
    bucket = F.least(
        F.floor(
            F.col("before_n") * F.lit(float(_VWH_BUCKETS)) / F.col("tot_n")
        ),
        F.lit(_VWH_BUCKETS - 1).cast("long"),
    )
    return (
        cum.select("c", "n", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum("n").alias("doc_count"),
            F.round(F.min("c") / F.lit(100.0), 9).alias("min_price"),
            F.round(F.max("c") / F.lit(100.0), 9).alias("max_price"),
            F.round(
                F.sum(F.col("c") * F.col("n")).cast("double")
                / F.sum("n").cast("double")
                / F.lit(100),
                9,
            ).alias("avg_price"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# terms + doc_count_error_upper_bound: the distributed top-N merge ES
# actually performs — each shard returns its local top shard_size
# terms, the coordinator sums what it received, and a term missing
# from a shard is charged that shard's smallest returned count as the
# worst-case undercount. Shards here are deterministic md5 buckets of
# the DOCUMENT id (a term's docs scatter across shards, as in ES).
# ---------------------------------------------------------------------------

_TSE_SHARDS = 8
_TSE_SHARD_SIZE = 12
_TSE_TOPN = 10

_TSE_ORACLE = f"""
WITH base AS (
  SELECT user_id AS term,
         (('0x' || substr(md5('sh:' || CAST(event_id AS VARCHAR)), 1, 4))
           ::BIGINT) % {_TSE_SHARDS} AS shard
  FROM events
),
pc AS (SELECT shard, term, count(*) AS cnt FROM base GROUP BY 1, 2),
r AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY shard ORDER BY cnt DESC, term ASC) AS rn,
         count(*) OVER (PARTITION BY shard) AS shard_terms
  FROM pc
),
kept AS (SELECT * FROM r WHERE rn <= {_TSE_SHARD_SIZE}),
thr AS (
  SELECT shard,
         CASE WHEN max(shard_terms) > {_TSE_SHARD_SIZE}
              THEN min(cnt) ELSE 0 END AS thr
  FROM kept GROUP BY shard
),
tot AS (SELECT CAST(sum(thr) AS BIGINT) AS total_thr FROM thr),
merged AS (
  SELECT k.term,
         CAST(sum(k.cnt) AS BIGINT) AS doc_count,
         CAST(sum(t.thr) AS BIGINT) AS covered_thr
  FROM kept k JOIN thr t USING (shard) GROUP BY k.term
)
SELECT term, doc_count,
       CAST(tot.total_thr - covered_thr AS BIGINT)
         AS doc_count_error_upper_bound
FROM merged CROSS JOIN tot
ORDER BY doc_count DESC, term ASC LIMIT {_TSE_TOPN}
"""


@q("terms_shard_error_bounds", _TSE_ORACLE)
def _terms_shard_error_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms-aggregation shard-merge parity: local top-shard_size
    per md5-document shard, coordinator-side sum, and the exact
    doc_count_error_upper_bound contract — a term absent from a
    shard's returned list is charged that shard's smallest returned
    count (zero when the shard returned its whole term list).

    Scale shape: the data-sized work is ONE partial-aggregated
    exchange to (shard, term) counts; the per-shard top-K window runs
    on the count frame (term-cardinality-sized, a rank prune away
    from tiny) and everything after — thresholds, coverage join,
    final top-N — is shard_size x shards rows. Deterministic where
    real ES is not: shards are md5 buckets, ties break on the term."""
    ev = _t(spark, sf_dir, "events")
    shard = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("sh:"), F.col("event_id").cast("string")
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % _TSE_SHARDS
    )
    pc = (
        ev.select(F.col("user_id").alias("term"), shard.alias("shard"))
        .groupBy("shard", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ws = Window.partitionBy("shard")
    wr = Window.partitionBy("shard").orderBy(
        F.col("cnt").desc(), F.col("term").asc()
    )
    kept = (
        pc.select(
            "*",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(ws).alias("shard_terms"),
        )
        .where(F.col("rn") <= _TSE_SHARD_SIZE)
    )
    thr = kept.groupBy("shard").agg(
        F.when(
            F.max("shard_terms") > _TSE_SHARD_SIZE, F.min("cnt")
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("thr")
    )
    tot = thr.agg(F.sum("thr").alias("total_thr"))
    merged = (
        kept.join(broadcast(thr), "shard")
        .groupBy("term")
        .agg(
            F.sum("cnt").alias("doc_count"),
            F.sum("thr").alias("covered_thr"),
        )
    )
    return (
        merged.crossJoin(broadcast(tot))
        .select(
            "term",
            "doc_count",
            (F.col("total_thr") - F.col("covered_thr")).alias(
                "doc_count_error_upper_bound"
            ),
        )
        .orderBy(F.col("doc_count").desc(), F.col("term").asc())
        .limit(_TSE_TOPN)
    )
