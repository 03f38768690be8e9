"""Event-analytics declared queries over the events fixture: ordered
funnel conversion, cohort retention, and value histograms — the
product-analytics shapes a log/event engine is asked for daily
(complementing sessionize_events / tumbling_hour_stats in
declared.py).

Scale notes are per query; all three are built-ins only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .declared import _t, q

# ---------------------------------------------------------------------------
# Ordered funnel: view -> click (after a view) -> purchase (after a
# qualifying click), evaluated per user over the (ts, event_id) order.
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH w1 AS (
  SELECT user_id, event_id, ts, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END) OVER win AS first_view
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING)
),
w2 AS (
  SELECT *,
         min(CASE WHEN event_type = 'click' AND first_view IS NOT NULL
                  THEN ts END) OVER win AS first_qclick
  FROM w1
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING)
)
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_views,
       CAST(sum(CASE WHEN event_type = 'click' AND first_view IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_qual_clicks,
       CAST(sum(CASE WHEN event_type = 'purchase' AND first_qclick IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_qual_purchases,
       sum(CASE WHEN event_type = 'purchase' AND first_qclick IS NOT NULL
                THEN 1 ELSE 0 END) > 0 AS converted
FROM w2 GROUP BY user_id
"""


@q("funnel_conversion", _FUNNEL_ORACLE)
def _funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel via one per-user window scan: running first-view
    and first-qualifying-click timestamps gate the later stages.

    Scale shape: ONE hash exchange on user_id — both Window ops share
    the same partitioning/ordering (one sort), and the final groupBy
    reuses the window's partitioning, so no further shuffle. No
    self-joins per stage (the naive funnel join is O(stages)
    shuffles)."""
    ev = _t(spark, sf_dir, "events")
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s1 = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(win).alias(
            "first_view"
        ),
    )
    qual_click = (F.col("event_type") == "click") & F.col("first_view").isNotNull()
    s2 = s1.select(
        "*",
        F.min(F.when(qual_click, F.col("ts"))).over(win).alias("first_qclick"),
    )
    qual_purchase = (F.col("event_type") == "purchase") & F.col(
        "first_qclick"
    ).isNotNull()
    return s2.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
            "n_views"
        ),
        F.sum(F.when(qual_click, 1).otherwise(0)).alias("n_qual_clicks"),
        F.sum(F.when(qual_purchase, 1).otherwise(0)).alias("n_qual_purchases"),
        (F.sum(F.when(qual_purchase, 1).otherwise(0)) > 0).alias("converted"),
    )


# ---------------------------------------------------------------------------
# Cohort retention: users grouped by first-activity date; how many are
# active again N days later.
# ---------------------------------------------------------------------------

_COHORT_ORACLE = """
WITH c AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_date
           FROM events GROUP BY user_id),
a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_date FROM events)
SELECT strftime(c.cohort_date, '%Y-%m-%d') AS cohort_date,
       date_diff('day', c.cohort_date, a.active_date) AS day_offset,
       count(*) AS n_active
FROM a JOIN c ON a.user_id = c.user_id
GROUP BY 1, 2
"""


@q("cohort_retention", _COHORT_ORACLE)
def _cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: (first-activity date, day offset) ->
    active-user count.

    Scale shape: the per-user cohort table and the distinct activity
    table both shuffle on user_id (the join then needs no extra
    exchange on either side); the final matrix aggregation shuffles
    tiny (date, offset) keys. The cohort side is |users| rows — at
    dimension scale it broadcasts; the join key layout already handles
    the general case."""
    ev = _t(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_date")
    )
    activity = ev.select(
        "user_id", F.to_date("ts").alias("active_date")
    ).distinct()
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            F.date_format("cohort_date", "yyyy-MM-dd").alias("cohort_date"),
            F.datediff("active_date", "cohort_date").alias("day_offset"),
        )
        .agg(F.count("*").alias("n_active"))
    )


# ---------------------------------------------------------------------------
# Fixed-width value histogram per event type.
# ---------------------------------------------------------------------------

_BIN_W = 50

_HIST_ORACLE = f"""
SELECT event_type,
       CAST(floor(value / {_BIN_W}.0) AS BIGINT) AS bin,
       CAST(floor(value / {_BIN_W}.0) AS BIGINT) * {_BIN_W} AS bin_lo,
       count(*) AS n,
       round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2, 3
"""


@q("value_histogram", _HIST_ORACLE)
def _value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of the value measure per event type — the
    binning is a narrow expression, so the only exchange is the
    (type, bin) aggregation of partial counts (map-side combined)."""
    ev = _t(spark, sf_dir, "events")
    bin_col = F.floor(F.col("value") / _BIN_W).cast("int")
    return (
        ev.groupBy(
            "event_type",
            bin_col.alias("bin"),
            (bin_col * _BIN_W).alias("bin_lo"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# SCD-2 dimension enrichment: attribute value AS OF each event's time.
# ---------------------------------------------------------------------------

# Versioned user dimension synthesized identically on both sides: every
# user starts on 'free' at Jan 1; upgrades to 'pro' (user_id % 28) + 1
# days later. Events span Jan 1-30, so some events precede the upgrade.
_SCD2_ORACLE = """
WITH u AS (SELECT DISTINCT user_id FROM events),
v AS (
  SELECT user_id, epoch_ms(TIMESTAMP '2024-01-01') AS from_ms, 'free' AS plan
  FROM u
  UNION ALL
  SELECT user_id,
         epoch_ms(TIMESTAMP '2024-01-01'
                  + INTERVAL (CAST(user_id % 28 AS INT) + 1) DAY),
         'pro'
  FROM u
)
SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS ts_ms,
       v.plan AS asof_plan
FROM events e ASOF LEFT JOIN v
  ON e.user_id = v.user_id AND epoch_ms(e.ts) >= v.from_ms
"""


@q("enrich_scd2_asof", _SCD2_ORACLE)
def _enrich_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal dimension enrichment: each event picks up the
    dimension attribute valid AT ITS EVENT TIME via the as-of join —
    the event-time-correct upgrade of the reference's TTL'd lookup
    cache (SURVEY J5), which always serves the *current* snapshot and
    mislabels replayed/late events.

    Scale shape: the union-sort as-of join pays one key shuffle for
    events + versions together (operators/asof.py); the version table
    is 2 rows per user and rides the same exchange — no per-row point
    lookups, no inequality self-join."""
    from ..operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    base = F.lit("2024-01-01 00:00:00").cast("timestamp")
    v_free = users.select(
        "user_id",
        F.unix_millis(base).alias("from_ms"),
        F.lit("free").alias("plan"),
    )
    v_pro = users.select(
        "user_id",
        F.unix_millis(
            F.timestamp_add(
                "DAY", (F.col("user_id") % 28).cast("int") + 1, base
            )
        ).alias("from_ms"),
        F.lit("pro").alias("plan"),
    )
    versions = v_free.unionByName(v_pro)
    probes = ev.select("event_id", "user_id", F.unix_millis("ts").alias("ts_ms"))
    out = asof_join(
        probes,
        versions,
        key="user_id",
        probe_ts="ts_ms",
        event_ts="from_ms",
        value_cols=["plan"],
    )
    return out.select("event_id", "user_id", "ts_ms", "asof_plan")


# ---------------------------------------------------------------------------
# Sliding event-time windows (1 h window, 15 min slide)
# ---------------------------------------------------------------------------

# Spark's F.window(ts, '1 hour', '15 minutes') assigns each event to
# window/slide = 4 epoch-aligned windows; the oracle reproduces the
# assignment by expanding each event to offsets 0..3 of its 15-min
# bucket. Both engines align buckets to the epoch.
_SLIDING_ORACLE = """
WITH x AS (
  SELECT event_type,
         time_bucket(INTERVAL '15 minutes', ts)
           - unnest(range(0, 4)) * INTERVAL '15 minutes' AS w_start
  FROM events
)
SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n
FROM x GROUP BY 1, 2
"""


@q("sliding_window_counts", _SLIDING_ORACLE)
def _sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows via the same windowed_counts helper
    the stream uses (streaming/windows.py with slide_duration): each
    event lands in window/slide overlapping windows; the groupBy is the
    one exchange, map-side combined on (window, type) keys."""
    from ..streaming.windows import windowed_counts

    ev = _t(spark, sf_dir, "events")
    out = windowed_counts(
        ev,
        ts_col="ts",
        key_col="event_type",
        window_duration="1 hour",
        slide_duration="15 minutes",
    )
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "event_type",
        "n",
    )


# ---------------------------------------------------------------------------
# Top event paths: most common length-3 event-type sequences per user
# stream — the "what do users do next" product-analytics staple.
# ---------------------------------------------------------------------------

_PATH_K = 15

_PATHS_ORACLE = f"""
WITH o AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
p AS (SELECT event_type || '>' || e2 || '>' || e3 AS path
      FROM o WHERE e2 IS NOT NULL AND e3 IS NOT NULL),
c AS (SELECT path, count(*) AS n FROM p GROUP BY path)
SELECT path, n,
       CAST(row_number() OVER (ORDER BY n DESC, path) AS BIGINT) AS rank
FROM c
ORDER BY n DESC, path
LIMIT {_PATH_K}
"""


@q("top_event_paths", _PATHS_ORACLE)
def _top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent 3-step event-type paths across all user streams.

    Scale shape: ONE shuffle on user_id (the lead window), then the
    path count is a map-side-combined agg over tiny path strings; the
    final top-k window runs on the aggregated path table (|event
    types|^3 rows at most), not the events. The per-user sort is the
    same exchange sessionization pays — at 100 TB this is the
    bounded-cardinality (path, count) rollup pattern, never a
    documents-scale shuffle."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.select(
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .select(F.concat_ws(">", "e1", "e2", "e3").alias("path"))
    )
    counts = paths.groupBy("path").agg(F.count("*").alias("n"))
    wk = Window.orderBy(F.desc("n"), F.asc("path"))
    return (
        counts.withColumn("rank", F.row_number().over(wk).cast("long"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(_PATH_K)
    )


# ---------------------------------------------------------------------------
# Time-series gap filling: dense hourly grid per event type with zero
# rows where no events arrived (the rollup/dashboard densify step).
# ---------------------------------------------------------------------------

_GAPFILL_ORACLE = """
WITH b AS (SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
           FROM events GROUP BY 1, 2),
span AS (SELECT event_type, min(h) AS h_lo, max(h) AS h_hi
         FROM b GROUP BY event_type),
grid AS (SELECT event_type,
                unnest(generate_series(h_lo, h_hi, INTERVAL 1 HOUR)) AS h
         FROM span)
SELECT g.event_type,
       strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour,
       coalesce(b.n, 0) AS n
FROM grid g LEFT JOIN b USING (event_type, h)
"""


@q("gap_fill_hourly", _GAPFILL_ORACLE)
def _gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly counts per event type: missing hours appear with
    n=0 between each type's first and last event.

    Scale shape: the sparse hourly rollup is one map-side-combined agg;
    the dense grid is generated from the tiny per-type (min, max) span
    row via sequence+explode — hours/type, not events — and the final
    left join keys on (type, hour) against the already-aggregated
    rollup. Nothing here rescales with raw event volume except the
    first aggregation."""
    ev = _t(spark, sf_dir, "events")
    sparse = (
        ev.select("event_type", F.date_trunc("hour", "ts").alias("h"))
        .groupBy("event_type", "h")
        .agg(F.count("*").alias("n"))
    )
    span = sparse.groupBy("event_type").agg(
        F.min("h").alias("h_lo"), F.max("h").alias("h_hi")
    )
    grid = span.select(
        "event_type",
        F.explode(
            F.sequence("h_lo", "h_hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    return (
        grid.join(sparse, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Time-bounded sequence detection (operators/sequence.py): every
# view -> click -> purchase completion within 24 hours, per user.
# ---------------------------------------------------------------------------

_SEQ_ORACLE = """
WITH e AS (
  SELECT user_id, ts, event_id, epoch_ms(ts) AS tsms, event_type
  FROM events WHERE user_id IS NOT NULL),
w0 AS (
  SELECT *, max(CASE WHEN event_type = 'view' THEN tsms END) OVER win AS c0
  FROM e
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
w1 AS (
  SELECT *, max(CASE WHEN event_type = 'click' AND c0 IS NOT NULL
                     THEN c0 END) OVER win AS c1
  FROM w0
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
SELECT user_id, count(*) AS n_matches,
       min(tsms) AS first_match_ms, max(tsms) AS last_match_ms
FROM w1
WHERE event_type = 'purchase' AND c1 IS NOT NULL AND tsms - c1 <= 86400000
GROUP BY user_id
"""


@q("sequence_funnel_matches", _SEQ_ORACLE)
def _sequence_funnel_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite (operators/sequence.sequence_matches):
    every purchase completing a view -> click -> purchase chain within 24
    hours, counted per user. One key exchange, k-1 chained
    running windows sharing the sort, no self-joins (the naive k-way
    join shape is k-1 full-fact shuffles). funnel_conversion answers
    "ever converted"; this finds EVERY completion under a time bound."""
    from ..operators.sequence import sequence_matches

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    return sequence_matches(
        ev,
        "user_id",
        "ts",
        "event_id",
        steps=[
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        within_ms=86_400_000,
    )


# ---------------------------------------------------------------------------
# Exact percentiles + percentile ranks per key (ES `percentiles` /
# `percentile_ranks` aggregations, exact lower-discrete variant — the
# KLL-sketch path in sketches_query covers the approximate/mergeable
# regime; this is the exact answer a dashboard asserts against)
# ---------------------------------------------------------------------------

_PCT_ORACLE = """
WITH c AS (SELECT event_type, value,
                  cume_dist() OVER (PARTITION BY event_type
                                    ORDER BY value) AS cd
           FROM events WHERE value IS NOT NULL)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       min(CASE WHEN cd >= 0.5 THEN value END) AS p50,
       min(CASE WHEN cd >= 0.95 THEN value END) AS p95,
       min(CASE WHEN cd >= 0.99 THEN value END) AS p99,
       round(avg(CASE WHEN value <= 100.0 THEN 1.0 ELSE 0.0 END), 6)
         AS rank_le_100
FROM c GROUP BY event_type
"""


@q("value_percentiles_by_type", _PCT_ORACLE)
def _value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-key percentiles via cume_dist: p is the smallest value
    whose cumulative distribution reaches p (percentile_disc), plus the
    ES percentile_ranks analogue (share of values <= 100). Exact on
    ties and reproducible bit-for-bit — the selected percentiles are
    INPUT values, never interpolated floats; the only arithmetic is the
    0/1 ratio, a count quotient.

    Scale shape: ONE hash exchange — the window partitions by
    event_type and the groupBy reuses that partitioning, so the sort
    and the aggregation share a single shuffle; no per-percentile
    passes (all three cut points + the rank read one cume_dist
    column). NULL values are filtered BEFORE the window because the
    engines disagree on null sort order (Spark first, DuckDB last)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cd = F.cume_dist().over(
        Window.partitionBy("event_type").orderBy("value")
    )
    c = ev.select("event_type", "value", cd.alias("cd"))

    def pct(p: float, name: str):
        return F.min(
            F.when(F.col("cd") >= p, F.col("value"))
        ).alias(name)

    return c.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        pct(0.5, "p50"),
        pct(0.95, "p95"),
        pct(0.99, "p99"),
        F.round(
            F.avg(F.when(F.col("value") <= 100.0, 1.0).otherwise(0.0)), 6
        ).alias("rank_le_100"),
    )


# ---------------------------------------------------------------------------
# Composite aggregation with after-key pagination (ES `composite` agg):
# stable keyset paging over grouped buckets — the scalable way to
# enumerate a huge bucket space page by page (terms aggs truncate;
# composite streams). A page is: buckets with key strictly AFTER the
# cursor in (event_type, event_date) order, first _COMP_PAGE of them.
# ---------------------------------------------------------------------------

_COMP_AFTER = ("error", "2024-01-20")
_COMP_PAGE = 8

_COMP_ORACLE = f"""
WITH b AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS event_date,
         count(*) AS n, round(sum(value), 2) AS total_value
  FROM events GROUP BY 1, 2)
SELECT event_type, event_date, CAST(n AS BIGINT) AS n, total_value
FROM b
WHERE (event_type, event_date) > ('{_COMP_AFTER[0]}', '{_COMP_AFTER[1]}')
ORDER BY event_type, event_date LIMIT {_COMP_PAGE}
"""


@q("composite_agg_page", _COMP_ORACLE)
def _composite_agg_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One page of an ES composite aggregation over
    (event_type, event_date) buckets: tuple-ordered after-key cursor,
    page-size limit. The next page's cursor is the last row returned —
    pagination needs no server-side state.

    Scale shape: the after-key predicate is on GROUPING columns, so
    Catalyst pushes it below the aggregation (raw rows outside the
    cursor range never aggregate) and the ordered page is a
    TakeOrderedAndProject — per-partition top-N then a driver merge of
    N-row heads, never a global sort. One map-side-combined exchange
    total."""
    ev = _t(spark, sf_dir, "events")
    b = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("event_date")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    after = F.struct(
        F.lit(_COMP_AFTER[0]).alias("event_type"),
        F.lit(_COMP_AFTER[1]).alias("event_date"),
    )
    page = b.filter(F.struct("event_type", "event_date") > after)
    return page.orderBy("event_type", "event_date").limit(_COMP_PAGE)


# ---------------------------------------------------------------------------
# Native session windows: Spark's built-in session_window (the
# streaming-capable sessionizer — state-store-backed with watermark
# eviction under readStream; identical semantics in batch). The custom
# applyInPandasWithState sessionizer (streaming/stateful.py) covers
# bespoke per-session logic; this is the declarative fast path.
# ---------------------------------------------------------------------------

_SESSION_GAP_MIN = 30

_SESSION_ORACLE = f"""
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL {_SESSION_GAP_MIN} MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM events),
s AS (SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o)
SELECT user_id,
       epoch_ms(min(ts)) AS start_ms,
       epoch_ms(max(ts) + INTERVAL {_SESSION_GAP_MIN} MINUTE) AS end_ms,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM s GROUP BY user_id, sid
"""


@q("native_session_window_stats", _SESSION_ORACLE)
def _native_session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session aggregation with Spark's native
    ``session_window`` (30-minute inactivity gap): one shuffle on
    (user_id, evolving window), map-side partial merge, and the exact
    same code runs over readStream with a watermark (state-store
    sessionization with eviction). The oracle replays the classic
    gaps-and-islands formulation: session boundary where the gap to
    the previous event exceeds the threshold; a session's end is its
    last event plus the gap — Spark's session_window.end convention."""
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy(
        "user_id", F.session_window("ts", f"{_SESSION_GAP_MIN} minutes")
    ).agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return g.select(
        "user_id",
        F.unix_millis("session_window.start").alias("start_ms"),
        F.unix_millis("session_window.end").alias("end_ms"),
        "n_events",
        "total_value",
    )


# ---------------------------------------------------------------------------
# auto_date_histogram: pick the smallest calendar-ladder interval that
# keeps the bucket count under a target, then bucket — ES's
# auto_date_histogram agg. The interval choice is DATA-DEPENDENT but
# fully declarative: a one-row min/max stats frame broadcasts onto the
# events scan, so the whole plan is two aggregations and no driver
# logic (works identically on a 1000-executor cluster).
# ---------------------------------------------------------------------------

_ADH_TARGET = 40
_ADH_LADDER_H = (1, 3, 12, 24, 168, 720)

_ADH_ORACLE = f"""
WITH stats AS (
  SELECT min(epoch_ms(ts) // 1000) AS t0,
         max(epoch_ms(ts) // 1000) AS t1
  FROM events
),
pick AS (
  SELECT t0, t1,
         CASE
           {' '.join(f"WHEN t1 // ({h} * 3600) - t0 // ({h} * 3600) + 1 <= {_ADH_TARGET} THEN {h}" for h in _ADH_LADDER_H)}
           ELSE {_ADH_LADDER_H[-1]}
         END AS interval_h
  FROM stats
),
b AS (
  SELECT interval_h,
         (epoch_ms(ts) // 1000) // (interval_h * 3600)
           * (interval_h * 3600) AS bucket_s,
         value
  FROM events, pick
)
SELECT CAST(interval_h AS BIGINT) AS interval_h,
       CAST(bucket_s AS BIGINT) AS bucket_s,
       count(*) AS n,
       round(sum(round(value * 100)) / 100.0, 2) AS total_value
FROM b
GROUP BY interval_h, bucket_s
ORDER BY bucket_s
"""


@q("auto_date_histogram", _ADH_ORACLE)
def _auto_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES auto_date_histogram: the interval ladder (1h..30d) is probed
    against the observed [min, max] span and the smallest interval
    with <= 40 buckets wins; rows then bucket by integer floor-div on
    epoch seconds. Plan: one map-side-combinable min/max agg reduced
    to ONE row, broadcast-joined back (no driver round-trip), then one
    partial-aggregated groupBy. Value totals stage through exact
    cents."""
    ev = _t(spark, sf_dir, "events")
    secs = F.expr("unix_millis(ts) DIV 1000")
    stats = ev.agg(
        F.min(secs).alias("t0"), F.max(secs).alias("t1")
    )
    expr = None
    for h in _ADH_LADDER_H:
        # count FLOOR-ALIGNED buckets, not raw span: a span of N*h
        # seconds can straddle N+1 aligned buckets
        cond = (
            F.expr(
                f"t1 DIV ({h} * 3600) - t0 DIV ({h} * 3600)"
            )
            + 1
            <= _ADH_TARGET
        )
        expr = (
            F.when(cond, F.lit(h))
            if expr is None
            else expr.when(cond, F.lit(h))
        )
    pick = stats.select(
        expr.otherwise(F.lit(_ADH_LADDER_H[-1])).alias("interval_h")
    )
    b = ev.select(secs.alias("s"), "value").crossJoin(F.broadcast(pick))
    return (
        b.select(
            F.col("interval_h").cast("long").alias("interval_h"),
            F.expr("(s DIV (interval_h * 3600)) * (interval_h * 3600)")
            .cast("long")
            .alias("bucket_s"),
            "value",
        )
        .groupBy("interval_h", "bucket_s")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.round(F.col("value") * 100)) / 100.0, 2).alias(
                "total_value"
            ),
        )
        .orderBy("bucket_s")
    )


# ---------------------------------------------------------------------------
# A/B experiment readout: deterministic hash assignment (user_id
# parity), per-arm moment stats and the Welch t statistic, per event
# type. Every moment stages through exact integer cents so both
# engines assemble the t statistic from bit-identical doubles.
# ---------------------------------------------------------------------------

_ABTEST_ORACLE = """
WITH m AS (
  SELECT event_type,
         user_id % 2 AS arm,
         round(value * 100) AS v_c
  FROM events
),
s AS (
  SELECT event_type, arm,
         count(*) AS n,
         CAST(sum(v_c) AS BIGINT) AS sum_c,
         CAST(sum(v_c * v_c) AS BIGINT) AS sumsq_c
  FROM m GROUP BY event_type, arm
),
w AS (
  SELECT a.event_type,
         a.n AS n_a, b.n AS n_b,
         a.sum_c / (a.n * 100.0) AS mean_a,
         b.sum_c / (b.n * 100.0) AS mean_b,
         (a.sumsq_c / 10000.0
            - a.n * (a.sum_c / (a.n * 100.0)) * (a.sum_c / (a.n * 100.0)))
           / (a.n - 1) AS var_a,
         (b.sumsq_c / 10000.0
            - b.n * (b.sum_c / (b.n * 100.0)) * (b.sum_c / (b.n * 100.0)))
           / (b.n - 1) AS var_b
  FROM s a JOIN s b ON a.event_type = b.event_type
  WHERE a.arm = 0 AND b.arm = 1
)
SELECT event_type, n_a, n_b,
       round(mean_a, 4) AS mean_a,
       round(mean_b, 4) AS mean_b,
       round((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b), 6)
         AS t_stat
FROM w
ORDER BY event_type
"""


@q("ab_welch_t_readout", _ABTEST_ORACLE)
def _ab_welch_t_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type A/B readout: users hash into two arms (id
    parity), one partial-aggregated pass computes count/sum/sum-of-
    squares per (type, arm) in exact cents, and the two arm rows join
    back on event_type (25-row frame, broadcast) to form Welch's t.
    The fact table is scanned ONCE; everything after the first agg is
    KB-sized."""
    ev = _t(spark, sf_dir, "events")
    v_c = F.round(F.col("value") * 100)
    s = (
        ev.select(
            "event_type", (F.col("user_id") % 2).alias("arm"), v_c.alias("v_c")
        )
        .groupBy("event_type", "arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v_c").cast("long").alias("sum_c"),
            F.sum(F.col("v_c") * F.col("v_c")).cast("long").alias("sumsq_c"),
        )
    )
    a = s.where(F.col("arm") == 0).select(
        "event_type",
        F.col("n").alias("n_a"),
        F.col("sum_c").alias("sum_a"),
        F.col("sumsq_c").alias("ssq_a"),
    )
    b = s.where(F.col("arm") == 1).select(
        F.col("event_type").alias("et_b"),
        F.col("n").alias("n_b"),
        F.col("sum_c").alias("sum_b"),
        F.col("sumsq_c").alias("ssq_b"),
    )
    j = a.join(F.broadcast(b), a.event_type == b.et_b)
    mean_a = F.col("sum_a") / (F.col("n_a") * 100.0)
    mean_b = F.col("sum_b") / (F.col("n_b") * 100.0)
    var_a = (
        F.col("ssq_a") / 10000.0 - F.col("n_a") * mean_a * mean_a
    ) / (F.col("n_a") - 1)
    var_b = (
        F.col("ssq_b") / 10000.0 - F.col("n_b") * mean_b * mean_b
    ) / (F.col("n_b") - 1)
    return (
        j.select(
            "event_type",
            "n_a",
            "n_b",
            F.round(mean_a, 4).alias("mean_a"),
            F.round(mean_b, 4).alias("mean_b"),
            F.round(
                (mean_a - mean_b)
                / F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b")),
                6,
            ).alias("t_stat"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Chi-square independence: event_type x assignment arm. All moments
# are exact integer counts; expected/contribution floats close with
# one identical IEEE expression per cell, so the hash is stable.
# ---------------------------------------------------------------------------

_CHI2_ORACLE = """
WITH cells AS (
  SELECT event_type, user_id % 2 AS arm, count(*) AS obs
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type, arm, obs,
         sum(obs) OVER (PARTITION BY event_type) AS row_tot,
         sum(obs) OVER (PARTITION BY arm) AS col_tot,
         sum(obs) OVER () AS grand
  FROM cells
)
SELECT event_type, arm, obs,
       round(row_tot * col_tot / CAST(grand AS DOUBLE), 4) AS expected,
       round((obs - row_tot * col_tot / CAST(grand AS DOUBLE))
             * (obs - row_tot * col_tot / CAST(grand AS DOUBLE))
             / (row_tot * col_tot / CAST(grand AS DOUBLE)), 6) AS contrib
FROM tot
ORDER BY event_type, arm
"""


@q("chi2_type_by_arm", _CHI2_ORACLE)
def _chi2_type_by_arm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square contingency cells for event_type x A/B arm: one
    map-side-combined count over the fact scan reduces to a 10-row
    cell frame; the marginal totals are windows over THAT frame (KB
    of state), never a second fact pass. Expected counts and
    contributions close with the same IEEE expression in both
    engines."""
    ev = _t(spark, sf_dir, "events")
    cells = (
        ev.select("event_type", (F.col("user_id") % 2).alias("arm"))
        .groupBy("event_type", "arm")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    w_row = Window.partitionBy("event_type")
    w_col = Window.partitionBy("arm")
    w_all = Window.partitionBy()
    tot = cells.select(
        "event_type",
        "arm",
        "obs",
        F.sum("obs").over(w_row).alias("row_tot"),
        F.sum("obs").over(w_col).alias("col_tot"),
        F.sum("obs").over(w_all).alias("grand"),
    )
    expected = F.col("row_tot") * F.col("col_tot") / F.col("grand").cast(
        "double"
    )
    return tot.select(
        "event_type",
        "arm",
        "obs",
        F.round(expected, 4).alias("expected"),
        F.round(
            (F.col("obs") - expected) * (F.col("obs") - expected) / expected,
            6,
        ).alias("contrib"),
    ).orderBy("event_type", "arm")


# ---------------------------------------------------------------------------
# stats_bucket / *_bucket pipeline aggs: second-order stats over the
# daily date_histogram buckets, per event type — ES computes these on
# the coordinating node over the bucket list; here the bucket frame
# (days x types, KB-sized) is the only input to the second
# aggregation, so the fact table is scanned exactly once.
# ---------------------------------------------------------------------------

_STATS_BUCKET_ORACLE = """
WITH buckets AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       count(*) AS n_buckets,
       CAST(min(n) AS BIGINT) AS min_bucket,
       CAST(max(n) AS BIGINT) AS max_bucket,
       CAST(sum(n) AS BIGINT) AS sum_buckets,
       round(CAST(sum(n) AS DOUBLE) / count(*), 4) AS avg_bucket,
       strftime(min(CASE WHEN n = mn THEN day END), '%Y-%m-%d') AS min_day,
       strftime(min(CASE WHEN n = mx THEN day END), '%Y-%m-%d') AS max_day
FROM (SELECT *, min(n) OVER (PARTITION BY event_type) AS mn,
               max(n) OVER (PARTITION BY event_type) AS mx
      FROM buckets)
GROUP BY event_type
ORDER BY event_type
"""


@q("stats_bucket_daily", _STATS_BUCKET_ORACLE)
def _stats_bucket_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES stats_bucket + min_bucket/max_bucket keys: one
    map-side-combined count builds the (type, day) bucket frame; the
    window + second agg run over that KB-sized frame only. The
    argmin/argmax day uses the deterministic first-day-of-extreme
    convention on both sides; avg divides exact longs."""
    ev = _t(spark, sf_dir, "events")
    buckets = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type")
    staged = buckets.select(
        "event_type",
        "day",
        "n",
        F.min("n").over(w).alias("mn"),
        F.max("n").over(w).alias("mx"),
    )
    return (
        staged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.min("n").alias("min_bucket"),
            F.max("n").alias("max_bucket"),
            F.sum("n").alias("sum_buckets"),
            F.round(
                F.sum("n").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_bucket"),
            F.date_format(
                F.min(F.when(F.col("n") == F.col("mn"), F.col("day"))),
                "yyyy-MM-dd",
            ).alias("min_day"),
            F.date_format(
                F.min(F.when(F.col("n") == F.col("mx"), F.col("day"))),
                "yyyy-MM-dd",
            ).alias("max_day"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Key-skew diagnostic report (skew.key_skew_report): the decision
# input for salted_agg / AQE skew handling, with an exact Gini closed
# over the count-of-counts histogram (no global key sort).
# ---------------------------------------------------------------------------

_SKEW_ORACLE = """
WITH counts AS (
  SELECT user_id, count(*) AS v FROM events GROUP BY user_id),
hist AS (SELECT v, count(*) AS f FROM counts GROUP BY v),
st AS (
  SELECT v, f,
         coalesce(sum(f) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s,
         coalesce(sum(f) OVER (ORDER BY v DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS kb
  FROM hist),
a AS (
  SELECT CAST(sum(f) AS BIGINT) AS n_keys,
         CAST(sum(v * f) AS BIGINT) AS n_rows,
         CAST(max(v) AS BIGINT) AS max_count,
         CAST(sum(v * (f * s + (f * (f + 1)) // 2)) AS BIGINT) AS sum_ic,
         CAST(sum(v * greatest(0, least(f, 10 - kb))) AS BIGINT)
           AS topn_rows
  FROM st)
SELECT n_keys, n_rows, max_count,
       round(n_rows / n_keys, 9) AS avg_per_key,
       round(topn_rows / n_rows, 9) AS topn_share,
       round((2 * CAST(sum_ic AS DOUBLE)
              - (CAST(n_keys AS DOUBLE) + 1) * CAST(n_rows AS DOUBLE))
             / (CAST(n_keys AS DOUBLE) * CAST(n_rows AS DOUBLE)), 9)
         AS gini
FROM a
"""


@q("key_skew_report_users", _SKEW_ORACLE)
def _key_skew_report_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact skew diagnostics for events.user_id: cardinality, max and
    mean rows per key, top-10-key row share, Gini of the per-key count
    distribution — closed over the count-of-counts histogram so no
    global key sort is ever needed (skew.key_skew_report)."""
    from ..operators.skew import key_skew_report

    ev = _t(spark, sf_dir, "events")
    return key_skew_report(ev, "user_id", top_n=10)


# ---------------------------------------------------------------------------
# Event transition matrix: first-order Markov transition counts and
# probabilities between consecutive event types per user — the
# product-analytics "what happens next" readout complementing
# top_event_paths (whole paths) and funnel_conversion (fixed order).
# ---------------------------------------------------------------------------

_TRANSITION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events),
t AS (SELECT event_type AS from_type, next_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
        FROM t GROUP BY 1)
SELECT t.from_type, t.to_type, t.n, tot.n_from,
       round(t.n / tot.n_from, 6) AS p
FROM t JOIN tot USING (from_type)
"""


@q("event_transition_matrix", _TRANSITION_ORACLE)
def _event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix over per-user event sequences:
    count and conditional probability of each (from -> to) event-type
    step, ordered by (ts, event_id) within a user.

    Scale shape: ONE shuffle on user_id for the lead() window, one
    partial-agg count of the (from, to) pairs (|types|^2 rows), and
    the per-from normalization as a window over that tiny frame — the
    events table never moves twice."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    t = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wf = Window.partitionBy("from_type")
    return t.select(
        "from_type",
        "to_type",
        "n",
        F.sum("n").over(wf).alias("n_from"),
        F.round(F.col("n") / F.sum("n").over(wf), 6).alias("p"),
    )
