"""ES pipeline-aggregation parity: the sibling aggs of the already-
mapped derivative/moving_avg/stats_bucket family that operate ON the
bucket list of a parent ``date_histogram`` — ``cumulative_sum``,
``derivative``, ``moving_fn`` (unweighted avg over the trailing
window), ``serial_diff`` (lag-n difference), plus the bucket-control
trio ``bucket_script`` / ``bucket_selector`` / ``bucket_sort`` — and
``categorize_text`` (the log-template grouping aggregation).

ES evaluates pipeline aggs on the coordinating node over the reduced
bucket list; the Spark shape mirrors that exactly: ONE partial-
aggregated scan of the fact table builds the (type, day) bucket frame
(KB-sized at any corpus scale — cardinality is days x types), and
every pipeline agg is a window function over that frame, partitioned
by the parent terms key so the work is distributed and adding
executors never re-shuffles the facts.

Float discipline (house rule, see BASELINE oracle notes): ``value``
stages through exact integer cents per ROW (both engines round the
same IEEE double), all bucket metrics are integer sums, and the only
float ops are one identical division rounded on both sides.

Reference parity note: the reference ships events to Elasticsearch
(main.go sink wiring) precisely so users can run these aggregations;
this module maps the query surface those users exercise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .declared import _t, q

# ---------------------------------------------------------------------------
# cumulative_sum + derivative + moving_fn + serial_diff in one chain
# over the per-type daily histogram.
# ---------------------------------------------------------------------------

_PIPELINE_AGGS_ORACLE = """
WITH buckets AS (
  SELECT event_type,
         CAST(ts AS DATE) AS d,
         count(*) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v_c
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       strftime(d, '%Y-%m-%d') AS day,
       CAST(n AS BIGINT) AS n,
       v_c,
       CAST(sum(v_c) OVER w AS BIGINT) AS cum_v_c,
       v_c - lag(v_c) OVER w AS deriv_v_c,
       round(sum(v_c) OVER w3 / (count(*) OVER w3 * 100.0), 4) AS mov_avg3,
       v_c - lag(v_c, 7) OVER w AS serial_diff7
FROM buckets
WINDOW w AS (PARTITION BY event_type ORDER BY d),
       w3 AS (PARTITION BY event_type ORDER BY d
              ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
ORDER BY event_type, day
"""


@q("pipeline_aggs_daily", _PIPELINE_AGGS_ORACLE)
def _pipeline_aggs_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``cumulative_sum`` / ``derivative`` / ``moving_fn`` (window=3
    trailing unweighted avg, the ES default shift — current bucket
    EXCLUDED) / ``serial_diff`` (lag 7, the week-over-week idiom) over
    a per-event-type daily date_histogram.

    Scale shape: ONE map-side-combined count/sum builds the bucket
    frame; all four pipeline aggs are windows over the SAME
    (event_type, day) sort, so the plan has one fact shuffle (the
    partial agg) + one bucket-frame sort. ES parity: pipeline aggs
    under a terms>date_histogram tree. First-bucket semantics match
    ES: derivative/serial_diff are null until lag rows exist, and
    moving_fn over an empty trailing window is null."""
    ev = _t(spark, sf_dir, "events")
    buckets = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("d"),
            F.round(F.col("value") * 100).cast("long").alias("v_c"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v_c").alias("v_c"))
    )
    w = Window.partitionBy("event_type").orderBy("d")
    w3 = w.rowsBetween(-3, -1)
    return (
        buckets.select(
            "event_type",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "n",
            "v_c",
            F.sum("v_c").over(w).alias("cum_v_c"),
            (F.col("v_c") - F.lag("v_c").over(w)).alias("deriv_v_c"),
            F.round(
                F.sum("v_c").over(w3)
                / (F.count(F.lit(1)).over(w3) * 100.0),
                4,
            ).alias("mov_avg3"),
            (F.col("v_c") - F.lag("v_c", 7).over(w)).alias("serial_diff7"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# bucket_script -> bucket_selector -> bucket_sort: per-bucket computed
# metric, bucket-level HAVING, then top-N buckets per parent term.
# ---------------------------------------------------------------------------

_BUCKET_CONTROL_ORACLE = """
WITH buckets AS (
  SELECT event_type,
         CAST(ts AS DATE) AS d,
         count(*) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v_c
  FROM events GROUP BY 1, 2
),
scripted AS (
  SELECT event_type, strftime(d, '%Y-%m-%d') AS day, n, v_c,
         round(v_c / (n * 100.0), 4) AS avg_value
  FROM buckets
  WHERE n >= 3
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY v_c DESC, day) AS rnk
  FROM scripted
)
SELECT event_type, day, CAST(n AS BIGINT) AS n, v_c, avg_value,
       CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 5
ORDER BY event_type, rnk
"""


@q("bucket_control_topdays", _BUCKET_CONTROL_ORACLE)
def _bucket_control_topdays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``bucket_script`` (avg_value = value_sum / doc_count, staged
    in exact cents) + ``bucket_selector`` (keep buckets with >= 3
    docs) + ``bucket_sort`` (top-5 revenue days per event type,
    deterministic day tiebreak) over the same terms>date_histogram
    tree as pipeline_aggs_daily.

    Scale shape: one fact shuffle for the partial agg; the script/
    selector are narrow projections over the KB-sized bucket frame and
    the sort is a per-type window row_number — never a global sort of
    facts."""
    ev = _t(spark, sf_dir, "events")
    buckets = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("d"),
            F.round(F.col("value") * 100).cast("long").alias("v_c"),
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v_c").alias("v_c"))
    )
    scripted = buckets.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n",
        "v_c",
        F.round(F.col("v_c") / (F.col("n") * 100.0), 4).alias("avg_value"),
    ).filter(F.col("n") >= 3)
    w = Window.partitionBy("event_type").orderBy(
        F.desc("v_c"), F.asc("day")
    )
    return (
        scripted.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
        .orderBy("event_type", "rnk")
    )


# ---------------------------------------------------------------------------
# date_range x filters: the two remaining bucket aggs of the ES core
# — explicit [from, to) date buckets with nested named filters.
# ---------------------------------------------------------------------------

_DATE_RANGE_FILTERS_ORACLE = """
WITH staged AS (
  SELECT CASE WHEN ts <  TIMESTAMP '2024-01-10' THEN 'to-01-10'
              WHEN ts <  TIMESTAMP '2024-01-20' THEN '01-10_to_01-20'
              ELSE 'from-01-20' END AS bucket,
         event_type,
         CAST(round(value * 100) AS BIGINT) AS v_c
  FROM events
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN v_c >= 10000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_high_value,
       CAST(sum(v_c) AS BIGINT) AS v_c_total,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN v_c ELSE 0 END)
            AS BIGINT) AS v_c_purchase
FROM staged
GROUP BY bucket
ORDER BY bucket
"""


@q("date_range_filters_agg", _DATE_RANGE_FILTERS_ORACLE)
def _date_range_filters_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``date_range`` (explicit ``[from, to)`` buckets, ES's
    inclusive-from/exclusive-to convention) with a nested ``filters``
    agg (named overlapping predicates: purchase docs, high-value docs
    — a doc counts in EVERY filter it matches, per ES semantics),
    metrics in exact cents.

    Scale shape: the bucket key is a narrow CASE inside codegen — one
    partial-aggregated shuffle of 3 grouping keys; filters are
    conditional-agg columns, not separate scans (ES evaluates all
    named filters in one pass the same way)."""
    ev = _t(spark, sf_dir, "events")
    staged = ev.select(
        F.when(F.col("ts") < F.lit("2024-01-10").cast("timestamp"), "to-01-10")
        .when(
            F.col("ts") < F.lit("2024-01-20").cast("timestamp"),
            "01-10_to_01-20",
        )
        .otherwise("from-01-20")
        .alias("bucket"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v_c"),
    )
    is_purchase = F.col("event_type") == "purchase"
    return (
        staged.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(is_purchase, 1).otherwise(0)).alias("n_purchase"),
            F.sum(
                F.when(F.col("v_c") >= 10000, 1).otherwise(0)
            ).alias("n_high_value"),
            F.sum("v_c").alias("v_c_total"),
            F.sum(F.when(is_purchase, F.col("v_c")).otherwise(0)).alias(
                "v_c_purchase"
            ),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# categorize_text: group semi-structured text by its template after
# masking numeric tokens — the ML log-categorization aggregation.
# ---------------------------------------------------------------------------

_CATEGORIZE_ORACLE = """
WITH masked AS (
  SELECT doc_id, source,
         array_to_string(
           (str_split(regexp_replace(text, '[0-9]+', '<num>', 'g'),
                      ' '))[1:3],
           ' ') AS category
  FROM documents
),
grouped AS (
  SELECT category,
         count(*) AS n_docs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         min(doc_id) AS example_doc
  FROM masked GROUP BY category
)
SELECT category, CAST(n_docs AS BIGINT) AS n_docs, n_sources,
       example_doc
FROM grouped
ORDER BY n_docs DESC, category
LIMIT 20
"""


@q("categorize_text_templates", _CATEGORIZE_ORACLE)
def _categorize_text_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``categorize_text`` analogue: digit runs mask to ``<num>``
    (one JVM regexp per row, no Python), the category key is the
    masked 3-token prefix (ES's token-weighted categorizer reduced to
    a deterministic, oracle-checkable rule), and each category reports
    doc count, distinct sources and the smallest doc_id as the
    example. Top-20 categories by count, name-tiebroken.

    Scale shape: narrow per-row masking inside codegen, one partial-
    aggregated shuffle on the category key (count-distinct on the
    tiny per-category source set), TakeOrderedAndProject for the
    top-20 — no global sort."""
    docs = _t(spark, sf_dir, "documents")
    masked = docs.select(
        "doc_id",
        "source",
        F.concat_ws(
            " ",
            F.slice(
                F.split(
                    F.regexp_replace("text", "[0-9]+", "<num>"), " "
                ),
                1,
                3,
            ),
        ).alias("category"),
    )
    return (
        masked.groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("example_doc"),
        )
        .orderBy(F.desc("n_docs"), F.asc("category"))
        .limit(20)
    )
