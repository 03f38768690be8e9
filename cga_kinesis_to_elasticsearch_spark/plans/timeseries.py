"""Time-series / slowly-changing-state declared queries over the
events fixture: interval coalescing (gaps-and-islands), SCD-2 state
history construction, trailing-window z-score anomaly flags, and
linear gap interpolation — the temporal shapes a log/event engine
grows into once basic sessionization (declared.py sessionize_events)
is in place.

The reference keeps no temporal state at all (each record is routed
and indexed independently, main.go:362-412); these are north-star
extensions, all built-ins-only and one-exchange-per-key designs.

Cross-engine float discipline: every comparison that decides a row's
fate is integer arithmetic (counts, byte sums, epoch millis); doubles
appear only in OUTPUT columns, computed with the identical expression
tree on both engines and rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .declared import _t, q

_FMT = "yyyy-MM-dd HH:mm:ss"

# ---------------------------------------------------------------------------
# Interval coalescing: each event opens a 30-minute activity interval;
# merge each user's overlapping/adjacent intervals into maximal spans.
# ---------------------------------------------------------------------------

_MERGE_ORACLE = """
WITH iv AS (
  SELECT user_id, event_id, ts, ts + INTERVAL 30 MINUTE AS te,
         max(ts + INTERVAL 30 MINUTE) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM events),
isl AS (
  SELECT *,
         CAST(sum(CASE WHEN prev_end IS NULL OR ts > prev_end
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
  FROM iv)
SELECT user_id, island,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS span_start,
       strftime(max(te), '%Y-%m-%d %H:%M:%S') AS span_end,
       count(*) AS n_events
FROM isl GROUP BY user_id, island
"""


@q("merge_intervals", _MERGE_ORACLE)
def _merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval coalescing: running max-end over the
    per-user order marks island starts; a running sum of those flags
    numbers the islands; one groupBy collapses each island to its span.

    Scale shape: ONE hash exchange on user_id — both windows and the
    final aggregation share the same partitioning and sort, so
    Catalyst plans a single Exchange + single Sort. The naive
    interval-merge via self-join is O(n^2) per user; this is O(n log n)
    and scales to billions of rows as long as single users fit a
    partition (true for event data; a pathological single-key skew
    would take the salted two-phase variant in operators/skew.py)."""
    ev = _t(spark, sf_dir, "events")
    ordered = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = ev.select(
        "user_id",
        "event_id",
        "ts",
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("te"),
    ).withColumn(
        "prev_end",
        F.max("te").over(ordered.rowsBetween(Window.unboundedPreceding, -1)),
    )
    isl = iv.withColumn(
        "island",
        F.sum(
            F.when(
                F.col("prev_end").isNull() | (F.col("ts") > F.col("prev_end")), 1
            ).otherwise(0)
        ).over(ordered.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return isl.groupBy("user_id", "island").agg(
        F.date_format(F.min("ts"), _FMT).alias("span_start"),
        F.date_format(F.max("te"), _FMT).alias("span_end"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# SCD-2 construction: collapse each user's consecutive same-event_type
# runs into versioned validity ranges (valid_from, valid_to, is_current).
# ---------------------------------------------------------------------------

_SCD2_ORACLE = """
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(event_type) OVER w IS NULL
                   OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
runs AS (
  SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
  FROM flagged),
collapsed AS (
  SELECT user_id, version, min(event_type) AS state,
         min(ts) AS valid_from, count(*) AS n_events
  FROM runs GROUP BY user_id, version)
SELECT user_id, version, state,
       strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(lead(valid_from) OVER (PARTITION BY user_id ORDER BY version),
                '%Y-%m-%d %H:%M:%S') AS valid_to,
       n_events,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) IS NULL
         AS is_current
FROM collapsed
"""


@q("scd2_build", _SCD2_ORACLE)
def _scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build an SCD-2 dimension history from an event stream: runs of
    consecutive equal state become versioned rows whose valid_to is the
    next version's valid_from (NULL = current). This is the WRITE side
    of `enrich_scd2_asof` (eventanalytics.py), which consumes such a
    table with an as-of join.

    Scale shape: one exchange on user_id shared by the change-flag
    window, the run-numbering window, the collapse groupBy AND the
    lead() over versions — Catalyst reuses the partitioning throughout
    (the per-version lead sorts within the same partitions). Nothing
    ever moves twice."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    )
    runs = flagged.withColumn(
        "version",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    collapsed = runs.groupBy("user_id", "version").agg(
        F.min("event_type").alias("state"),
        F.min("ts").alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    nxt = F.lead("valid_from").over(wv)
    return collapsed.select(
        "user_id",
        "version",
        "state",
        F.date_format("valid_from", _FMT).alias("valid_from"),
        F.date_format(nxt, _FMT).alias("valid_to"),
        "n_events",
        nxt.isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Trailing-window z-score anomaly flags over the daily count series.
# Variance is computed from integer window sums (sum, sum of squares),
# so both engines feed IDENTICAL doubles into the identical (x-mean)/sd
# expression — no aggregate-ordering float drift.
# ---------------------------------------------------------------------------

_ZSCORE_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2),
win AS (
  SELECT event_type, day, n,
         count(*)  OVER w AS w_cnt,
         sum(n)    OVER w AS w_sum,
         sum(n * n) OVER w AS w_sum2
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
       w_cnt AS n_trailing,
       round(CASE WHEN w_cnt >= 3
                       AND w_cnt * w_sum2 - w_sum * w_sum > 0
                  THEN (CAST(n AS DOUBLE) - CAST(w_sum AS DOUBLE) / w_cnt)
                       / sqrt((CAST(w_cnt * w_sum2 - w_sum * w_sum AS DOUBLE))
                              / (CAST(w_cnt AS DOUBLE) * (w_cnt - 1)))
                  END, 4) AS zscore,
       CASE WHEN w_cnt >= 3 AND w_cnt * w_sum2 - w_sum * w_sum > 0
                 AND abs((CAST(n AS DOUBLE) - CAST(w_sum AS DOUBLE) / w_cnt)
                         / sqrt((CAST(w_cnt * w_sum2 - w_sum * w_sum AS DOUBLE))
                                / (CAST(w_cnt AS DOUBLE) * (w_cnt - 1)))) > 2.0
            THEN TRUE ELSE FALSE END AS is_anomaly
FROM win
"""


@q("anomaly_zscore_daily", _ZSCORE_ORACLE)
def _anomaly_zscore_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type daily volumes flagged against a trailing 7-point
    window: z = (x - mean) / sample-stddev, with mean/variance derived
    from integer window sums (count, sum, sum-of-squares) rather than
    the engines' own stddev aggregates — stddev_samp implementations
    differ in summation order across engines, which would make the
    value hash flaky; integer sums cannot.

    Scale shape: the raw scan collapses to |event_type| x |days| rows
    in one map-side-combined aggregation; the window then runs on that
    tiny series (one exchange of aggregated rows, never raw facts) —
    the same aggregate-first discipline as week_over_week_counts."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    win = daily.select(
        "event_type",
        "day",
        "n",
        F.count("*").over(w).alias("w_cnt"),
        F.sum("n").over(w).alias("w_sum"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("w_sum2"),
    )
    disc = F.col("w_cnt") * F.col("w_sum2") - F.col("w_sum") * F.col("w_sum")
    z = (
        F.col("n").cast("double")
        - F.col("w_sum").cast("double") / F.col("w_cnt")
    ) / F.sqrt(
        disc.cast("double") / (F.col("w_cnt").cast("double") * (F.col("w_cnt") - 1))
    )
    valid = (F.col("w_cnt") >= 3) & (disc > 0)
    return win.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        F.col("w_cnt").alias("n_trailing"),
        F.round(F.when(valid, z), 4).alias("zscore"),
        F.when(valid & (F.abs(z) > 2.0), F.lit(True))
        .otherwise(F.lit(False))
        .alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# Linear interpolation across missing hours: the dense-grid companion
# to gap_fill_hourly (which zero-fills counts); here a VALUE series is
# linearly interpolated between its nearest observed neighbours.
# Observed points are rounded before interpolation so both engines
# interpolate from identical doubles.
# ---------------------------------------------------------------------------

_INTERP_ORACLE = """
WITH hourly AS (
  SELECT event_type,
         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS h,
         CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS vc
  FROM events WHERE event_type IN ('view', 'purchase')
  GROUP BY 1, 2),
bounds AS (
  SELECT event_type, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1),
grid AS (
  SELECT b.event_type, g.h
  FROM bounds b, LATERAL (SELECT unnest(range(b.h0, b.h1 + 1)) AS h) g),
joined AS (
  SELECT g.event_type, g.h, hv.vc,
         last_value(hv.vc IGNORE NULLS) OVER w AS prev_c,
         last_value(CASE WHEN hv.vc IS NOT NULL THEN g.h END IGNORE NULLS)
           OVER w AS prev_h,
         first_value(hv.vc IGNORE NULLS) OVER w2 AS next_c,
         first_value(CASE WHEN hv.vc IS NOT NULL THEN g.h END IGNORE NULLS)
           OVER w2 AS next_h
  FROM grid g LEFT JOIN hourly hv ON g.event_type = hv.event_type
                                 AND g.h = hv.h
  WINDOW w AS (PARTITION BY g.event_type ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         w2 AS (PARTITION BY g.event_type ORDER BY g.h
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
nd AS (
  SELECT event_type, h, vc,
         CASE WHEN vc IS NOT NULL THEN vc
              WHEN prev_c IS NULL THEN next_c
              WHEN next_c IS NULL THEN prev_c
              ELSE prev_c * (next_h - prev_h)
                   + (next_c - prev_c) * (h - prev_h) END AS num,
         CASE WHEN vc IS NOT NULL OR prev_c IS NULL OR next_c IS NULL
              THEN CAST(1 AS BIGINT) ELSE next_h - prev_h END AS den
  FROM joined)
SELECT event_type, h AS hour_epoch, vc IS NOT NULL AS observed,
       ((200 * num + den) // (2 * den)) / 10000.0 AS v_filled
FROM nd
"""


@q("interpolate_hourly", _INTERP_ORACLE)
def _interpolate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly grid with LINEAR interpolation over missing hours:
    forward/backward last-observation windows carry (cents, hour) of
    the nearest observed neighbours; the fill is the exact lerp between
    them (edges clamp to the single available neighbour).

    Float discipline: the hourly series is staged as an INTEGER cent
    sum (order-free — a float sum rounded to cents flips at the .005
    boundary depending on engine accumulation order), the lerp
    numerator/denominator stay integers, and half-up rounding to 1e-4
    dollars is pure integer math ((200*num+den) div (2*den)); the ONLY
    float op is the final exact-integer / 10000.0 division, identical
    on both engines. Non-negative values by data contract (the integer
    half-up identity assumes num >= 0); headroom is 200 * vc_max *
    gap_hours < 2^63 — $2.3e11/hour at a 10^5-hour gap.

    Scale shape: interpolation runs on the AGGREGATED hourly series
    (|event_type| x |hours| rows), never raw facts. The grid explodes
    from one row per type via sequence(); both direction windows and
    the join share the event_type partitioning — AQE sees kilobyte
    inputs. The per-type hour span is bounded (years ~ 10^4 rows), so
    unbounded frames are safe."""
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy(
            "event_type",
            F.floor(F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / 3600)
            .alias("h"),
        )
        .agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("vc"))
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = bounds.select(
        "event_type", F.explode(F.sequence("h0", "h1")).alias("h")
    )
    joined = grid.join(hourly, ["event_type", "h"], "left")
    wb = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("vc").isNotNull(), F.col("h"))
    st = joined.select(
        "event_type",
        "h",
        "vc",
        F.last("vc", ignorenulls=True).over(wb).alias("prev_c"),
        F.last(obs_h, ignorenulls=True).over(wb).alias("prev_h"),
        F.first("vc", ignorenulls=True).over(wf).alias("next_c"),
        F.first(obs_h, ignorenulls=True).over(wf).alias("next_h"),
    )
    gap = F.col("next_h") - F.col("prev_h")
    lerp_num = F.col("prev_c") * gap + (
        F.col("next_c") - F.col("prev_c")
    ) * (F.col("h") - F.col("prev_h"))
    nd = st.select(
        "event_type",
        "h",
        "vc",
        F.when(F.col("vc").isNotNull(), F.col("vc"))
        .when(F.col("prev_c").isNull(), F.col("next_c"))
        .when(F.col("next_c").isNull(), F.col("prev_c"))
        .otherwise(lerp_num)
        .alias("num"),
        F.when(
            F.col("vc").isNotNull()
            | F.col("prev_c").isNull()
            | F.col("next_c").isNull(),
            F.lit(1).cast("long"),
        )
        .otherwise(gap)
        .alias("den"),
    )
    return nd.select(
        "event_type",
        F.col("h").alias("hour_epoch"),
        F.col("vc").isNotNull().alias("observed"),
        (
            F.expr("(200 * num + den) div (2 * den)") / F.lit(10000.0)
        ).alias("v_filled"),
    )


# ---------------------------------------------------------------------------
# Finite-horizon EWMA smoothing of the daily series. True EWMA is an
# infinite recursion (not SQL-replayable bit-exactly); truncating at H
# terms bounds the difference by (1-a)^H (<1% of a unit step at
# a=0.3, H=12) and makes every weight a LITERAL — both engines
# evaluate the identical weighted sum in the identical order, so no
# runtime pow() and no cross-engine float drift.
# ---------------------------------------------------------------------------

_EWMA_A, _EWMA_H = 0.3, 12
_EWMA_W = [_EWMA_A * (1 - _EWMA_A) ** j for j in range(_EWMA_H)]


def _ewma_oracle() -> str:
    num = " + ".join(
        f"coalesce(lag(CAST(n AS DOUBLE), {j}) OVER w, 0.0) * {w!r}"
        for j, w in enumerate(_EWMA_W)
    )
    den = " + ".join(
        f"(CASE WHEN lag(n, {j}) OVER w IS NULL THEN 0.0 ELSE {w!r} END)"
        for j, w in enumerate(_EWMA_W)
    )
    return f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2),
sm AS (
  SELECT event_type, day, n,
         ({num}) AS s_num, ({den}) AS s_den
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day))
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
       round(s_num / s_den, 6) AS ewma
FROM sm
"""


@q("ewma_daily_counts", _ewma_oracle())
def _ewma_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted smoothing of per-type daily volumes
    (a=0.3, 12-term horizon): the trend line under the z-score anomaly
    flags. The window runs on the AGGREGATED daily series; the lag
    chain is one sort within the same exchange; weights are literals
    shared with the oracle, normalized by the weights actually
    available so the series start is unbiased."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    num = None
    den = None
    for j, wt in enumerate(_EWMA_W):
        lj = F.lag(F.col("n").cast("double"), j).over(w)
        term = F.coalesce(lj, F.lit(0.0)) * F.lit(wt)
        dterm = F.when(lj.isNull(), F.lit(0.0)).otherwise(F.lit(wt))
        num = term if num is None else num + term
        den = dterm if den is None else den + dterm
    return daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        F.round(num / den, 6).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# Local-time reporting (from_utc_timestamp): the reference serves
# gov.au operators — dashboards read Sydney local time, with DST.
# The oracle's nested timezone() calls pin the conversion to
# UTC-stored-instants regardless of the DuckDB session TimeZone.
# ---------------------------------------------------------------------------

_TZ = "Australia/Sydney"

_LOCALTIME_ORACLE = f"""
WITH loc AS (
  SELECT event_type,
         strftime(timezone('{_TZ}', timezone('UTC', ts)), '%H') AS local_hour
  FROM events)
SELECT event_type, CAST(local_hour AS BIGINT) AS local_hour,
       count(*) AS n_events
FROM loc GROUP BY 1, 2
"""


@q("local_hour_counts", _LOCALTIME_ORACLE)
def _local_hour_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event volume by SYDNEY-local hour (from_utc_timestamp with full
    DST handling — verified across the AEST/AEDT boundary by the
    fixture's multi-month span): the operator-facing view of a
    UTC-stored stream. A narrow expression + one tiny aggregated
    rollup; the session stays UTC, only the DISPLAY hour shifts."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.date_format(F.from_utc_timestamp("ts", _TZ), "HH")
        .cast("int")
        .alias("local_hour"),
    ).agg(F.count("*").alias("n_events"))


# ---------------------------------------------------------------------------
# Time-series similarity search: which users' daily-activity series
# most resemble a target user's (EDBT'19 "Time Series Similarity
# Search for Streaming Data in Distributed Systems" — the batch
# formulation). Pearson correlation over the fixed 30-day span,
# computed RELATIONALLY: sufficient statistics (Σx, Σx², Σxy) from
# integer daily counts, so everything before the final quotient is
# exact integer arithmetic in both engines.
# ---------------------------------------------------------------------------

_SIM_TARGET_USER = 0
_SIM_DAYS = 30  # events span 2024-01-01 .. 2024-01-30
_SIM_TOPK = 10

_SERIES_SIM_ORACLE = f"""
WITH c AS (
  SELECT user_id, datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS idx,
         count(*) AS n
  FROM events GROUP BY 1, 2),
tgt AS (SELECT idx, n FROM c WHERE user_id = {_SIM_TARGET_USER}),
ty AS (SELECT sum(n) AS sy, sum(n * n) AS syy FROM tgt),
xs AS (
  SELECT c.user_id,
         sum(c.n) AS sx, sum(c.n * c.n) AS sxx,
         coalesce(sum(c.n * tgt.n), 0) AS sxy
  FROM c LEFT JOIN tgt USING (idx)
  WHERE c.user_id <> {_SIM_TARGET_USER}
  GROUP BY c.user_id),
corr AS (
  SELECT user_id,
         round(({_SIM_DAYS} * sxy - sx * sy)
               / (sqrt({_SIM_DAYS} * sxx - sx * sx)
                  * sqrt({_SIM_DAYS} * syy - sy * sy)), 6) AS corr
  FROM xs CROSS JOIN ty
  WHERE ({_SIM_DAYS} * sxx - sx * sx) > 0
    AND ({_SIM_DAYS} * syy - sy * sy) > 0)
SELECT user_id, corr FROM corr
ORDER BY corr DESC, user_id LIMIT {_SIM_TOPK}
"""


@q("series_similarity_topk", _SERIES_SIM_ORACLE)
def _series_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k users whose daily event-count series correlates best with
    the target user's, by Pearson correlation over the 30-day span.
    Sufficient statistics only: per-user Σx/Σx² plus Σxy against the
    BROADCAST target series (a <=30-row frame) — the corpus aggregates
    once map-side-combined on user_id and never self-joins; missing
    days are implicit zeros, which contribute nothing to any sum, so
    no gap-filling pass is needed. The final correlation is one float
    quotient of exact integer stats, rounded to 6 digits on both
    engines."""
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
            "idx"
        ),
    ).agg(F.count("*").alias("n"))
    # the per-(user, day) counts feed the target slice AND the corpus
    # stats: materialize once (tiny: users x active-days rows)
    c = c.localCheckpoint()
    tgt = c.filter(F.col("user_id") == _SIM_TARGET_USER).select(
        "idx", F.col("n").alias("tn")
    )
    ty = tgt.agg(
        F.sum("tn").alias("sy"), F.sum(F.col("tn") * F.col("tn")).alias("syy")
    )
    xs = (
        c.filter(F.col("user_id") != _SIM_TARGET_USER)
        .join(F.broadcast(tgt), "idx", "left")
        .groupBy("user_id")
        .agg(
            F.sum("n").alias("sx"),
            F.sum(F.col("n") * F.col("n")).alias("sxx"),
            F.coalesce(F.sum(F.col("n") * F.col("tn")), F.lit(0)).alias("sxy"),
        )
    )
    d = F.lit(_SIM_DAYS)
    varx = d * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = d * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.round(
        (d * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.sqrt(varx) * F.sqrt(vary)),
        6,
    )
    return (
        xs.crossJoin(F.broadcast(ty))
        .filter((varx > 0) & (vary > 0))
        .select("user_id", corr.alias("corr"))
        .orderBy(F.col("corr").desc(), "user_id")
        .limit(_SIM_TOPK)
    )


# ---------------------------------------------------------------------------
# Distribution drift (PSI): the standard production-ML drift monitor —
# Population Stability Index of the value distribution, reference week
# (Jan 1-7) vs current week (Jan 22-28), per event type, over 10 fixed
# width-50 bins with +1 smoothing. PSI < 0.1 stable / > 0.25 shifted.
# ---------------------------------------------------------------------------

_PSI_BINS = 10
_PSI_WIDTH = 50

_PSI_ORACLE = f"""
WITH b AS (
  SELECT event_type,
         CASE WHEN ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
              THEN 'ref'
              WHEN ts >= TIMESTAMP '2024-01-22' AND ts < TIMESTAMP '2024-01-29'
              THEN 'cur' END AS per,
         least(CAST(floor(value / {_PSI_WIDTH}) AS INT), {_PSI_BINS - 1}) AS bin
  FROM events WHERE value IS NOT NULL),
c AS (SELECT event_type, per, bin, count(*) AS cnt
      FROM b WHERE per IS NOT NULL GROUP BY 1, 2, 3),
grid AS (
  SELECT t.event_type, s.bin
  FROM (SELECT DISTINCT event_type FROM c) t,
       (SELECT unnest(range(0, {_PSI_BINS})) AS bin) s),
f AS (
  SELECT g.event_type, g.bin,
         coalesce(r.cnt, 0) AS rc, coalesce(u.cnt, 0) AS cc
  FROM grid g
  LEFT JOIN c r ON r.event_type = g.event_type AND r.bin = g.bin
                AND r.per = 'ref'
  LEFT JOIN c u ON u.event_type = g.event_type AND u.bin = g.bin
                AND u.per = 'cur'),
n AS (SELECT event_type, sum(rc) AS rn, sum(cc) AS cn
      FROM f GROUP BY event_type),
terms AS (
  SELECT f.event_type, f.bin,
         ((f.rc + 1) / (n.rn + {_PSI_BINS}.0)
          - (f.cc + 1) / (n.cn + {_PSI_BINS}.0))
         * ln(((f.rc + 1) / (n.rn + {_PSI_BINS}.0))
              / ((f.cc + 1) / (n.cn + {_PSI_BINS}.0))) AS term
  FROM f JOIN n USING (event_type))
SELECT event_type,
       round(list_sum(list(term ORDER BY bin)), 6) AS psi,
       round(list_sum(list(term ORDER BY bin)), 6) < 0.1 AS stable
FROM terms GROUP BY event_type
"""


@q("value_drift_psi", _PSI_ORACLE)
def _value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type between a reference
    and a current week — fixed-width binned, +1-smoothed so empty bins
    stay finite, summed in ascending-bin order (the ordered fold makes
    the float total identical to the SQL oracle). Scale shape: one
    map-side-combined count per (type, period, bin) — raw rows
    aggregate before any join — then the dense 10-bin grid and the PSI
    fold run on tens of rows."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    per = (
        F.when(
            (F.col("ts") >= "2024-01-01") & (F.col("ts") < "2024-01-08"),
            "ref",
        ).when(
            (F.col("ts") >= "2024-01-22") & (F.col("ts") < "2024-01-29"),
            "cur",
        )
    )
    bin_ = F.least(
        F.floor(F.col("value") / _PSI_WIDTH).cast("int"),
        F.lit(_PSI_BINS - 1),
    )
    c = (
        ev.select("event_type", per.alias("per"), bin_.alias("bin"))
        .filter(F.col("per").isNotNull())
        .groupBy("event_type", "per", "bin")
        .agg(F.count("*").alias("cnt"))
    )
    # dense grid: every (type, bin) with both period counts
    grid = (
        c.select("event_type")
        .distinct()
        .crossJoin(
            _t(spark, sf_dir, "events")
            .sparkSession.range(_PSI_BINS)
            .select(F.col("id").cast("int").alias("bin"))
        )
    )
    ref = c.filter(F.col("per") == "ref").select(
        "event_type", "bin", F.col("cnt").alias("rc")
    )
    cur = c.filter(F.col("per") == "cur").select(
        "event_type", "bin", F.col("cnt").alias("cc")
    )
    f = (
        grid.join(ref, ["event_type", "bin"], "left")
        .join(cur, ["event_type", "bin"], "left")
        .select(
            "event_type",
            "bin",
            F.coalesce("rc", F.lit(0)).alias("rc"),
            F.coalesce("cc", F.lit(0)).alias("cc"),
        )
    )
    n = f.groupBy("event_type").agg(
        F.sum("rc").alias("rn"), F.sum("cc").alias("cn")
    )
    j = f.join(n, "event_type")
    p = (F.col("rc") + 1) / (F.col("rn") + float(_PSI_BINS))
    qq = (F.col("cc") + 1) / (F.col("cn") + float(_PSI_BINS))
    term = (p - qq) * F.log(p / qq)
    psi = F.round(
        F.aggregate(
            F.array_sort(
                F.collect_list(F.struct(F.col("bin"), term.alias("t")))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        ),
        6,
    )
    # one aggregate, then derive the flag — a second aggregate
    # expression would build and sort the per-group struct list twice
    return (
        j.groupBy("event_type")
        .agg(psi.alias("psi"))
        .select("event_type", "psi", (F.col("psi") < 0.1).alias("stable"))
    )


# ---------------------------------------------------------------------------
# Per-key OLS trend: revenue slope per nation over the order timeline.
# Cross-engine float discipline: all five regression sums (n, Sx, Sy,
# Sxy, Sxx) are EXACT integers (day index x revenue cents), so the
# closing slope/intercept divisions evaluate the identical IEEE
# expression on identical inputs in both engines — no ordered fold
# needed.
# ---------------------------------------------------------------------------

_TREND_ORACLE = """
WITH o AS (
  SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
         date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS x,
         CAST(round(o_totalprice * 100) AS BIGINT) AS y_cents
  FROM orders JOIN customer ON o_custkey = c_custkey
),
d AS (
  SELECT nationkey, x, SUM(y_cents) AS y
  FROM o GROUP BY nationkey, x
),
s AS (
  SELECT nationkey,
         COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM d GROUP BY nationkey
)
SELECT s.nationkey, n_name AS nation, n AS n_days,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
         AS slope_cents_per_day,
       round((CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * sxy
              - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
              * sx) / n, 6) AS intercept_cents
FROM s JOIN nation ON s.nationkey = n_nationkey
ORDER BY s.nationkey
"""


@q("trend_slope_by_nation", _TREND_ORACLE)
def trend_slope_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation least-squares revenue trend (slope + intercept in
    cents/day) over daily totals. Two shuffles total: (nation, day)
    partial-aggregated map-side, then 25 regression-sum rows; the
    nation-name join broadcasts. Integer sums keep it hash-exact."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        F.col("c_nationkey").alias("nationkey"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01").cast("date")).alias("x"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y_cents"),
    )
    d = o.groupBy("nationkey", "x").agg(F.sum("y_cents").alias("y"))
    s = d.groupBy("nationkey").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    slope = (nd * F.col("sxy") - sxd * F.col("sy")) / (
        nd * F.col("sxx") - sxd * F.col("sx")
    )
    return (
        s.join(F.broadcast(nation), s.nationkey == nation.n_nationkey)
        .select(
            "nationkey",
            F.col("n_name").alias("nation"),
            F.col("n").alias("n_days"),
            F.round(slope, 6).alias("slope_cents_per_day"),
            F.round(
                (F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n"),
                6,
            ).alias("intercept_cents"),
        )
        .orderBy("nationkey")
    )
