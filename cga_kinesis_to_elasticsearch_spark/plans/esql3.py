"""Round-9 ES|QL surface as declared queries: the full-text WHERE
bridge (``MATCH()`` / ``QSTR()`` — how Kibana 8.17+ text-filters
every ES|QL data view), ``NOW()`` with a deterministic anchor plus
datetime interval arithmetic (the Kibana time-picker form), the
``BUCKET()`` 4-arg auto form (what Lens generates), and the ``TS``
command scaffold (ES 8.19) — each a literal pipe chain through the
interpreter, value-checked against a hand-written DuckDB oracle.

Reference context: the reference's gorouter/app log indices
(main.go:447) are text-searched in exactly the MATCH shape, and
every ops dashboard's "last 15 minutes" filter is the NOW() range.

Scale shape: MATCH/QSTR lower through the SAME query-DSL compiler
``_search`` uses, producing one Catalyst predicate inline with the
rest of the WHERE — the filter pushes to the scan, no extra stage.
NOW() and the auto BUCKET interval fold to literals at plan time, so
the physical plan is identical to the hand-written range/histogram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.esql import run_esql
from .declared import _t, q

# ---------------------------------------------------------------------------
# 1. MATCH(): analyzed-text search inside an ES|QL WHERE
# ---------------------------------------------------------------------------

_ESQL_MATCH_ORACLE = """
WITH tk AS (
    SELECT doc_id, n_chars,
           list_filter(string_split_regex(text, '\\s+'),
                       t -> t <> '') AS toks
    FROM documents
)
SELECT doc_id, n_chars
FROM tk
WHERE list_contains(toks, 'merge') AND list_contains(toks, 'scan')
ORDER BY doc_id
"""


@q("esql_match_function", _ESQL_MATCH_ORACLE)
def _esql_match_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``MATCH(field, "query", {"operator": "AND"})`` (ES 8.17)
    — the bridge Kibana generates for any text filter over an ES|QL
    data view. Lowered through the engine's query-DSL match compiler
    (operators/querydsl.compile_query), so ES|QL and the ``_search``
    API can never disagree about what a text query matches; the
    whitespace analyzer tokenizes both the query literal (at plan
    time) and the document field (in codegen).

    Scale shape: the match predicate is an array_contains AND over
    the analyzed token split — pure codegen inline with the WHERE,
    one scan, no shuffle before the sort."""
    docs = _t(spark, sf_dir, "documents")
    return run_esql(
        """
        FROM documents
        | WHERE MATCH(text, "merge scan", {"operator": "AND"})
        | KEEP doc_id, n_chars
        | SORT doc_id
        """,
        {"documents": docs},
    )


# ---------------------------------------------------------------------------
# 2. QSTR(): Lucene query syntax inside an ES|QL WHERE
# ---------------------------------------------------------------------------

_ESQL_QSTR_ORACLE = """
WITH tk AS (
    SELECT lang, n_chars,
           list_filter(string_split_regex(text, '\\s+'),
                       t -> t <> '') AS toks
    FROM documents
)
SELECT lang,
       count(*) AS n,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM tk
WHERE list_contains(toks, 'vector') AND NOT list_contains(toks, 'hash')
GROUP BY lang
ORDER BY lang
"""


@q("esql_qstr_function", _ESQL_QSTR_ORACLE)
def _esql_qstr_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``QSTR("text:vector AND NOT text:hash")`` (ES 8.17) —
    full Lucene query syntax inside a pipe chain, lowered through the
    engine's query_string parser (operators/luceneq): fielded terms
    need no default_field, the boolean operators build the same
    must/must_not tree the ``_search`` endpoint compiles.

    Scale shape: the parsed tree folds into ONE boolean predicate at
    plan time; STATS stays the single partial-agg shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return run_esql(
        """
        FROM documents
        | WHERE QSTR("text:vector AND NOT text:hash")
        | STATS n = count(*), sum_chars = sum(n_chars) BY lang
        | SORT lang
        """,
        {"documents": docs},
    )


# ---------------------------------------------------------------------------
# 2b. KQL(): the Kibana search-bar language inside an ES|QL WHERE
# ---------------------------------------------------------------------------

_ESQL_KQL_ORACLE = """
WITH tk AS (
    SELECT doc_id, lang, n_chars,
           list_filter(string_split_regex(text, '\\s+'),
                       t -> t <> '') AS toks
    FROM documents
)
SELECT doc_id, lang
FROM tk
WHERE (list_contains(toks, 'merge') OR list_contains(toks, 'vector'))
  AND list_contains(toks, 'scan')
  AND n_chars >= 120
ORDER BY doc_id
"""


@q("esql_kql_function", _ESQL_KQL_ORACLE)
def _esql_kql_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``KQL("...")`` — the Kibana search-bar language (the
    bar's DEFAULT syntax since 7.0), parsed by the engine's KQL
    parser (operators/kql) onto the SAME query-DSL tree the
    ``_search`` endpoint compiles: grouped field values
    (``text:(merge or vector)``), ``and``/``or`` keywords, and range
    operators all in one bar expression.

    Scale shape: plan-time parse to ONE boolean predicate inline
    with the WHERE — same single-scan filter as MATCH/QSTR."""
    docs = _t(spark, sf_dir, "documents")
    return run_esql(
        """
        FROM documents
        | WHERE KQL("text:(merge or vector) and text:scan
            and n_chars >= 120")
        | KEEP doc_id, lang
        | SORT doc_id
        """,
        {"documents": docs},
    )


# ---------------------------------------------------------------------------
# 3. NOW() + interval arithmetic with a pinned anchor
# ---------------------------------------------------------------------------

_ESQL_NOW_RANGE_ORACLE = """
SELECT event_type,
       count(*) AS n,
       round(avg(value), 6) AS avg_value
FROM events
WHERE ts > TIMESTAMP '2024-01-20 00:00:00' - INTERVAL 14 DAY
  AND ts <= TIMESTAMP '2024-01-20 00:00:00'
  AND event_type <> 'error'
GROUP BY event_type
ORDER BY event_type
"""


@q("esql_now_range", _ESQL_NOW_RANGE_ORACLE)
def _esql_now_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``WHERE ts > NOW() - 2 weeks`` — the Kibana time-picker
    form (the single most common WHERE in Discover). ``NOW()`` lowers
    to the ``now=`` anchor passed to ``run_esql`` (deterministic, so
    the oracle replays the identical instant — mirroring how ES pins
    one instant per query); ``- 2 weeks`` folds to an ANSI INTERVAL.

    Scale shape: both bounds fold to timestamp literals at plan
    time, so the range predicate pushes to the parquet scan
    (PushedFilters), exactly like a hand-written range filter."""
    ev = _t(spark, sf_dir, "events")
    out = run_esql(
        """
        FROM events
        | WHERE ts > NOW() - 2 weeks AND ts <= NOW()
            AND event_type != "error"
        | STATS n = count(*), avg_value = avg(value) BY event_type
        | SORT event_type
        """,
        {"events": ev},
        now="2024-01-20 00:00:00",
    )
    return out.select(
        "event_type", "n", F.round("avg_value", 6).alias("avg_value")
    )


# ---------------------------------------------------------------------------
# 4. BUCKET() 4-arg auto form: Lens' target-bucket-count histogram
# ---------------------------------------------------------------------------

_ESQL_BUCKET_AUTO_ORACLE = """
SELECT CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS day_b,
       floor(value / 50) * 50 AS val_b,
       count(*) AS n
FROM events
GROUP BY 1, 2
ORDER BY day_b, val_b
"""


@q("esql_bucket_auto", _ESQL_BUCKET_AUTO_ORACLE)
def _esql_bucket_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``BUCKET(f, target, from, to)`` — the auto form Lens
    emits: pick a nice interval for at most ``target`` buckets over
    the LITERAL bounds. A 30-day span at target 40 walks the fixed
    ladder to 1 day (12 h would give 60 buckets); a 0..500 value
    range at target 10 rounds 50 up to the nice width 50. Both
    intervals fold at PLAN time — the physical plan is the identical
    one-shuffle histogram the explicit-span form builds; the bucket
    surfaces as epoch seconds so both engines hash the same integer.
    """
    ev = _t(spark, sf_dir, "events")
    out = run_esql(
        """
        FROM events
        | STATS n = count(*)
            BY b = BUCKET(ts, 40, "2024-01-01", "2024-01-31"),
               vb = BUCKET(value, 10, 0, 500)
        | SORT b, vb
        """,
        {"events": ev},
    )
    return out.select(
        F.col("b").cast("long").alias("day_b"),
        F.col("vb").alias("val_b"),
        "n",
    )


# ---------------------------------------------------------------------------
# 5. TS command scaffold (ES 8.19 tech preview)
# ---------------------------------------------------------------------------

_ESQL_TS_STATS_ORACLE = """
SELECT CAST(floor(epoch(ts) / 43200) * 43200 AS BIGINT) AS h12,
       round(max(value), 6) AS max_v,
       count(*) AS n
FROM events
WHERE value IS NOT NULL
GROUP BY 1
ORDER BY h12
"""


@q("esql_ts_stats", _ESQL_TS_STATS_ORACLE)
def _esql_ts_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``TS`` (ES 8.19 tech preview) — FROM with time-series
    metric semantics. A plain STATS (no rate()/*_over_time calls)
    aggregates over documents exactly like FROM; the time-series
    aggregate family is exercised by ``esql_ts_rate`` /
    ``esql_ts_gauge`` below.

    Scale shape: same one-shuffle bucketed aggregation as FROM."""
    ev = _t(spark, sf_dir, "events")
    out = run_esql(
        """
        TS events
        | WHERE value IS NOT NULL
        | STATS max_v = max(value), n = count(*)
            BY h = BUCKET(ts, 12 hours)
        | SORT h
        """,
        {"events": ev},
    )
    return out.select(
        F.col("h").cast("long").alias("h12"),
        F.round("max_v", 6).alias("max_v"),
        "n",
    )

# ---------------------------------------------------------------------------
# 5b. TS time-series aggregates: the counter family (RATE) and the
#     gauge family (*_over_time / DELTA / IRATE), two-level lowering
# ---------------------------------------------------------------------------

_ESQL_TS_RATE_ORACLE = """
WITH base AS (
    SELECT user_id, event_type, date_trunc('day', ts) AS day,
           epoch_us(ts) AS us, value,
           value - lag(value) OVER w AS d
    FROM events
    WINDOW w AS (PARTITION BY user_id, date_trunc('day', ts),
                 event_type ORDER BY epoch_us(ts))
), per_series AS (
    SELECT day, event_type, user_id,
           CASE WHEN (max(us) - min(us)) / 1000000.0 > 0
                THEN sum(CASE WHEN d < 0 THEN value ELSE d END)
                     / ((max(us) - min(us)) / 1000000.0)
           END AS r,
           max(value) AS mx, count(value) AS c
    FROM base GROUP BY 1, 2, 3
)
SELECT strftime(day, '%Y-%m-%d') AS day, event_type,
       round(sum(r), 4) AS total_rate,
       round(max(mx), 4) AS peak,
       count(c) AS n_series
FROM per_series GROUP BY 1, 2
ORDER BY day, event_type
"""


@q("esql_ts_rate", _ESQL_TS_RATE_ORACLE)
def _esql_ts_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``TS`` counter aggregates (ES 8.19 tech preview):
    ``STATS SUM(RATE(v)) BY BUCKET(ts, 1 day), type`` — the metric
    dashboard query. The two-level lowering computes RATE per time
    series (``ts_dimensions=["user_id"]`` — ES's ``_tsid``) per
    bucket with Prometheus reset handling (a negative step means the
    counter restarted; the post-reset value IS the increase), then
    SUMs across series. RATE = reset-adjusted increase / observed
    span seconds (<2 samples -> NULL).

    Scale shape: ONE lag() window whose hash partitioning the
    stage-1 partial aggregate reuses (a single exchange on
    dims+keys), then one more partial-agg shuffle on the collapsed
    |series x buckets| frame — two exchanges total at any scale; the
    raw frame is scanned once with only 4 columns read."""
    ev = _t(spark, sf_dir, "events")
    out = run_esql(
        """
        TS events
        | STATS total_rate = SUM(RATE(value)),
                peak = MAX(MAX_OVER_TIME(value)),
                n_series = COUNT(COUNT_OVER_TIME(value))
            BY day = BUCKET(ts, 1 day), event_type
        | SORT day, event_type
        """,
        {"events": ev},
        ts_dimensions=["user_id"],
    )
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "event_type",
        F.round("total_rate", 4).alias("total_rate"),
        F.round("peak", 4).alias("peak"),
        "n_series",
    )


_ESQL_TS_GAUGE_ORACLE = """
WITH base AS (
    SELECT user_id, event_type, epoch_us(ts) AS us, value,
           value - lag(value) OVER w AS d,
           (epoch_us(ts) - lag(epoch_us(ts)) OVER w) / 1000000.0
               AS iv
    FROM events
    WINDOW w AS (PARTITION BY user_id, event_type
                 ORDER BY epoch_us(ts))
), per_series AS (
    SELECT event_type, user_id,
           max_by(value, us) - min_by(value, us) AS dlt,
           sum(CASE WHEN d < 0 THEN value ELSE d END) AS inc,
           max_by(CASE WHEN d < 0 THEN value ELSE d END / iv, us)
               AS ir,
           min_by(value, us) AS fst,
           max_by(value, us) AS lst
    FROM base GROUP BY 1, 2
)
SELECT event_type,
       round(sum(dlt), 4) AS moved,
       round(sum(inc), 4) AS grew,
       round(max(ir), 6) AS max_irate,
       round(min(fst), 4) AS first_min,
       round(avg(lst), 4) AS last_avg
FROM per_series GROUP BY event_type
ORDER BY event_type
"""


@q("esql_ts_gauge", _ESQL_TS_GAUGE_ORACLE)
def _esql_ts_gauge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``TS`` gauge/instant aggregates (ES 8.19 tech preview):
    DELTA (last-minus-first, NO reset logic — the gauge form),
    INCREASE (reset-adjusted), IRATE (last step / last interval),
    FIRST/LAST_OVER_TIME (min_by/max_by on the sample time) — each
    per series (user_id), then aggregated across series BY type.

    Scale shape: same two-exchange plan as ``esql_ts_rate`` — the
    window and stage-1 aggregate share one hash exchange; stage 2
    shuffles only |series| rows."""
    ev = _t(spark, sf_dir, "events")
    out = run_esql(
        """
        TS events
        | STATS moved = SUM(DELTA(value)),
                grew = SUM(INCREASE(value)),
                max_irate = MAX(IRATE(value)),
                first_min = MIN(FIRST_OVER_TIME(value)),
                last_avg = AVG(LAST_OVER_TIME(value))
            BY event_type
        | SORT event_type
        """,
        {"events": ev},
        ts_dimensions=["user_id"],
        ts_time_col="ts",
    )
    return out.select(
        "event_type",
        F.round("moved", 4).alias("moved"),
        F.round("grew", 4).alias("grew"),
        F.round("max_irate", 6).alias("max_irate"),
        F.round("first_min", 4).alias("first_min"),
        F.round("last_avg", 4).alias("last_avg"),
    )


# ---------------------------------------------------------------------------
# 5c. KNN(): vector retrieval inside an ES|QL WHERE (ES 8.19)
# ---------------------------------------------------------------------------

# a deterministic 64-dim query vector (the embeddings tables are
# 64-dim at every SF)
_KNN_QV = [1.0 if i % 7 == 0 else 0.25 for i in range(64)]
_KNN_QV_TXT = "[" + ", ".join(repr(x) for x in _KNN_QV) + "]"

_ESQL_KNN_ORACLE = f"""
WITH scored AS (
    SELECT vec_id, label,
           (1 + list_cosine_similarity({_KNN_QV_TXT}::DOUBLE[],
                                       embedding::DOUBLE[])) / 2 AS s
    FROM embeddings
    WHERE label <> 0
)
SELECT vec_id, CAST(label AS BIGINT) AS label, round(s, 4) AS score
FROM scored
ORDER BY s DESC, vec_id
LIMIT 7
"""


@q("esql_knn_function", _ESQL_KNN_ORACLE)
def _esql_knn_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``WHERE KNN(field, [query_vector], k)`` (ES 8.19 tech
    preview) — vector retrieval in pipe syntax, the ES|QL face of
    the engine's similarity subsystem. The sibling conjunct
    (``label != 0``) pre-filters BEFORE the top-k, ES's rule for
    WHERE conjunctions around knn; with ``METADATA _score`` the
    (1+cos)/2 similarity — the SAME expression the ``_search`` knn
    section ranks by — lands in relevance.

    Scale shape: prefilter pushes to the scan, then one codegen
    zip_with dot product per surviving row + TakeOrdered(k); the
    corpus never shuffles and only k rows leave the executors."""
    emb = _t(spark, sf_dir, "embeddings")
    out = run_esql(
        f"""
        FROM embeddings METADATA _score
        | WHERE KNN(embedding, {_KNN_QV_TXT}, 7) AND label != 0
        | SORT _score DESC, vec_id
        | KEEP vec_id, label, _score
        """,
        {"embeddings": emb},
    )
    return out.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.round("_score", 4).alias("score"),
    )


# ---------------------------------------------------------------------------
# 5d. MATCH_PHRASE() / TERM(): the rest of the full-text WHERE family
# ---------------------------------------------------------------------------

_ESQL_PHRASE_TERM_ORACLE = """
SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
FROM documents
WHERE (' ' || text || ' ') LIKE '% merge scan %' OR lang = 'zh'
GROUP BY lang
ORDER BY lang
"""


@q("esql_match_phrase_term", _ESQL_PHRASE_TERM_ORACLE)
def _esql_match_phrase_term(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ES|QL ``MATCH_PHRASE()`` (ES 8.19) + ``TERM()`` (ES 8.16) —
    the rest of the full-text WHERE family, composed under OR to pin
    that the extracted predicates stay ordinary booleans. Both lower
    through the SAME query-DSL compiler ``_search`` uses
    (match_phrase's consecutive-token check, term's un-analyzed
    equality), so the pipe and the API agree on every hit.

    Scale shape: one Catalyst predicate inline with the WHERE; the
    STATS stays the single partial-agg shuffle."""
    docs = _t(spark, sf_dir, "documents")
    out = run_esql(
        """
        FROM documents
        | WHERE MATCH_PHRASE(text, "merge scan") OR TERM(lang, "zh")
        | STATS n = count(*), chars = sum(n_chars) BY lang
        | SORT lang
        """,
        {"documents": docs},
    )
    return out.select("lang", "n", "chars")


# ---------------------------------------------------------------------------
# 5e. HASH() / ROUND_TO() / MV_PERCENTILE(): round-9 scalar fill-ins
# ---------------------------------------------------------------------------

_ESQL_HASH_ROUND_TO_ORACLE = """
SELECT CAST(CASE WHEN n_chars IS NULL THEN NULL
            WHEN n_chars >= 800 THEN 800
            WHEN n_chars >= 400 THEN 400
            WHEN n_chars >= 200 THEN 200
            WHEN n_chars >= 100 THEN 100
            ELSE 0 END AS BIGINT) AS bucket_chars,
       count(DISTINCT sha256(text)) AS n_fp,
       count(DISTINCT md5(text)) AS n_md5
FROM documents
GROUP BY 1
ORDER BY bucket_chars
"""


@q("esql_hash_round_to", _ESQL_HASH_ROUND_TO_ORACLE)
def _esql_hash_round_to(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``HASH("algo", v)`` (ES 8.16) + ``ROUND_TO(v, points..)``
    (ES 8.19): content fingerprints counted per fixed-point size
    bucket. HASH maps to the named digest (md5/sha1/sha2) — never to
    Spark's murmur ``hash()``, which would silently disagree with
    every other engine; ROUND_TO's literal points fold to a
    comparison ladder at plan time (values below every point clamp
    to the smallest, ES's histogram-lower-bound rule).

    Scale shape: codegen scalars + one partial-agg shuffle; the
    distinct-count shuffles (hash, bucket) pairs only."""
    docs = _t(spark, sf_dir, "documents")
    out = run_esql(
        """
        FROM documents
        | EVAL bucket_chars = ROUND_TO(n_chars, 0, 100, 200, 400, 800),
               fp = HASH("sha256", text), fp_md5 = HASH("md5", text)
        | STATS n_fp = count_distinct(fp),
                n_md5 = count_distinct(fp_md5)
            BY bucket_chars
        | SORT bucket_chars
        """,
        {"documents": docs},
    )
    return out.select(
        F.col("bucket_chars").cast("long").alias("bucket_chars"),
        "n_fp",
        "n_md5",
    )


_ESQL_MV_PERCENTILE_ORACLE = """
WITH s AS (
    SELECT vec_id, label, list_sort(embedding) AS e,
           len(embedding) AS n
    FROM embeddings
)
SELECT vec_id, CAST(label AS BIGINT) AS label,
       round(CAST(e[32] AS DOUBLE) +
             (CAST(e[33] AS DOUBLE) - CAST(e[32] AS DOUBLE)) *
             ((CAST(n - 1 AS DOUBLE) * (50) / 100.0) - 31), 6)
           AS med,
       round(CAST(e[57] AS DOUBLE) +
             (CAST(e[58] AS DOUBLE) - CAST(e[57] AS DOUBLE)) *
             ((CAST(n - 1 AS DOUBLE) * (90) / 100.0) - 56), 6)
           AS p90
FROM s
WHERE vec_id < 40
ORDER BY vec_id
"""


@q("esql_mv_percentile", _ESQL_MV_PERCENTILE_ORACLE)
def _esql_mv_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``MV_PERCENTILE(field, p)`` — exact linear interpolation
    on the sorted multivalue (ES's definition for exact sets),
    here the median and p90 of each 64-dim embedding. The oracle
    hand-computes the same interpolation on DuckDB's list_sort, so
    the definition — not just the code — is pinned cross-engine.

    Scale shape: a pure codegen array expression; no shuffle at
    all (narrow scan -> project -> filter)."""
    emb = _t(spark, sf_dir, "embeddings")
    out = run_esql(
        """
        FROM embeddings
        | WHERE vec_id < 40
        | EVAL med = MV_PERCENTILE(embedding, 50),
               p90 = MV_PERCENTILE(embedding, 90)
        | SORT vec_id
        """,
        {"embeddings": emb},
    )
    return out.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        F.round("med", 6).alias("med"),
        F.round("p90", 6).alias("p90"),
    )


# ---------------------------------------------------------------------------
# 5f. ST_* spatial scalars: TO_GEOPOINT / ST_X / ST_Y / ST_DISTANCE
# ---------------------------------------------------------------------------

# synthesized coordinates, same convention as plans/geo.py: integer
# centi-degrees from c_custkey via coprime multipliers
_ST_LATLON_SQL = (
    "(-6000 + (c_custkey * 7) % 12000) / 100.0 AS lat, "
    "(-18000 + (c_custkey * 13) % 36000) / 100.0 AS lon"
)
# the fixed query point (Sydney) and Lucene's mean earth radius —
# the same constants the engine's ST_DISTANCE lowers to
_ST_Q_LAT, _ST_Q_LON = -33.87, 151.21
_ST_R = "6371008.7714"

_ESQL_ST_DISTANCE_ORACLE = f"""
WITH pts AS (SELECT c_custkey, c_nationkey, {_ST_LATLON_SQL}
             FROM customer),
d AS (
    SELECT c_custkey, c_nationkey,
           2 * {_ST_R} * asin(sqrt(
               pow(sin((radians({_ST_Q_LAT}) - radians(lat)) / 2), 2)
               + cos(radians(lat)) * cos(radians({_ST_Q_LAT}))
               * pow(sin((radians({_ST_Q_LON}) - radians(lon)) / 2), 2)
           )) AS dist
    FROM pts
)
SELECT CAST(c_nationkey AS BIGINT) AS nation,
       count(*) AS n_near,
       round(min(dist) / 1000, 3) AS closest_km
FROM d
WHERE dist < 8000000
GROUP BY 1
ORDER BY nation
"""


@q("esql_st_distance", _ESQL_ST_DISTANCE_ORACLE)
def _esql_st_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL spatial scalars (8.12+): ``TO_GEOPOINT`` parses WKT
    points (round-tripped here through CONCAT to exercise the
    parser), ``ST_DISTANCE`` computes great-circle meters by the
    haversine on Lucene's mean earth radius (6371008.7714 m — the
    constant ES's geo math is built on); the oracle replays the
    identical formula on the raw coordinates, so the geometry — not
    just the plumbing — is pinned.

    Scale shape: codegen scalars + pushed-down radius predicate +
    one partial-agg shuffle; nothing wide anywhere."""
    cust = _t(spark, sf_dir, "customer")
    out = run_esql(
        f"""
        FROM customer
        | EVAL lat = (-6000 + (c_custkey * 7) % 12000) / 100.0,
               lon = (-18000 + (c_custkey * 13) % 36000) / 100.0,
               wkt = CONCAT("POINT (", TO_STRING(lon), " ",
                            TO_STRING(lat), ")"),
               p = TO_GEOPOINT(wkt),
               dist = ST_DISTANCE(p,
                   TO_GEOPOINT("POINT ({_ST_Q_LON} {_ST_Q_LAT})"))
        | WHERE dist < 8000000
        | STATS n_near = count(*), closest = min(dist)
            BY nation = c_nationkey
        | SORT nation
        """,
        {"customer": cust},
    )
    return out.select(
        F.col("nation").cast("long").alias("nation"),
        "n_near",
        F.round(F.col("closest") / 1000, 3).alias("closest_km"),
    )


# ---------------------------------------------------------------------------
# 5g. RERANK: retrieve-then-rerank in pipe syntax (ES 8.18)
# ---------------------------------------------------------------------------

_ESQL_RERANK_ORACLE = """
WITH tk AS (
    SELECT doc_id, lang,
           list_filter(string_split_regex(text, '\\s+'),
                       t -> t <> '') AS wt,
           list_distinct(list_filter(
               string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'),
               t -> t <> '')) AS st
    FROM documents
), cand AS (
    SELECT doc_id, lang, st FROM tk
    WHERE list_contains(wt, 'merge') OR list_contains(wt, 'scan')
)
SELECT doc_id, lang,
       round(len(list_filter(['merge', 'scan', 'vector', 'table'],
                             t -> list_contains(st, t))) / 4.0, 6)
           AS score
FROM cand
ORDER BY score DESC, doc_id
LIMIT 20
"""


@q("esql_rerank", _ESQL_RERANK_ORACLE)
def _esql_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``RERANK "query" ON field`` (ES 8.18 tech preview) —
    the retrieve-then-rerank pattern in pure pipe syntax: MATCH
    retrieves candidates, RERANK re-scores and re-sorts them. ES
    calls an inference endpoint here; this engine's scorer is a
    DETERMINISTIC LEXICAL STAND-IN (distinct-token overlap under the
    standard analyzer — documented in the command docstring), so the
    command plumbing is real and oracle-checked while the model call
    stays an honest external dependency.

    Scale shape: candidates filter first (one predicate), the
    stand-in score is a codegen array-intersect, and SORT+LIMIT is
    TakeOrdered — only 20 rows leave the executors."""
    docs = _t(spark, sf_dir, "documents")
    out = run_esql(
        """
        FROM documents METADATA _score
        | WHERE MATCH(text, "merge scan")
        | RERANK "merge scan vector table" ON text
        | SORT _score DESC, doc_id
        | LIMIT 20
        | KEEP doc_id, lang, _score
        """,
        {"documents": docs},
    )
    return out.select(
        "doc_id", "lang", F.round("_score", 6).alias("score")
    )


# ---------------------------------------------------------------------------
# 5h. text_similarity_reranker retriever (ES 8.15): the semantic
#     two-stage pattern on the _search side
# ---------------------------------------------------------------------------

_TSR_ORACLE = """
WITH tk AS (
    SELECT doc_id, lang,
           list_filter(string_split_regex(text, '\\s+'),
                       t -> t <> '') AS wt,
           list_distinct(list_filter(
               string_split_regex(lower(text), '[^\\p{L}\\p{N}]+'),
               t -> t <> '')) AS st
    FROM documents
), cand AS (
    SELECT doc_id, lang, st FROM tk
    WHERE list_contains(wt, 'merge') OR list_contains(wt, 'scan')
)
SELECT doc_id, lang,
       round(len(list_filter(['merge', 'scan', 'vector', 'window'],
                             t -> list_contains(st, t))) / 4.0, 6)
           AS score
FROM cand
ORDER BY score DESC, doc_id
LIMIT 15
"""


@q("es_search_retriever_reranker", _TSR_ORACLE)
def _es_search_retriever_reranker(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The ES 8.15 ``text_similarity_reranker`` retriever — the
    semantic two-stage pattern on the ``_search`` side: an inner
    standard retriever feeds its top ``rank_window_size`` hits to a
    reranker that re-scores over ``field`` vs ``inference_text``. ES
    calls an inference endpoint; the engine executes the documented
    deterministic lexical stand-in — the SAME scorer the ES|QL
    RERANK command uses, so the pipe and the retriever tree can
    never rank differently (pinned in tests). The window here
    exceeds the match count so the oracle needs no BM25 replay —
    every inner match is reranked.

    Scale shape: the inner retriever bounds the frame to the window;
    the rescore is one codegen expression over that page and the
    final cut is TakeOrdered(size)."""
    docs = _t(spark, sf_dir, "documents")
    from ..operators.querydsl import run_search_body

    out = run_search_body(docs, {
        "retriever": {"text_similarity_reranker": {
            "retriever": {"standard": {"query": {
                "match": {"text": "merge scan"},
            }}},
            "field": "text",
            "inference_text": "merge scan vector window",
            "inference_id": "semantic-reranker-stub",
            "rank_window_size": 10000,
        }},
        "size": 15,
    })
    return out.select(
        "doc_id", "lang", F.round("_score", 6).alias("score")
    )


# ---------------------------------------------------------------------------
# 6. LIKE pattern lists + the round-9 scalar batch over documents
# ---------------------------------------------------------------------------

_ESQL_STRING_SCALARS_ORACLE = """
SELECT lang,
       count(*) AS n,
       count(*) FILTER (WHERE strpos(text, 'scan') > 0) AS with_scan,
       CAST(sum(strlen(text)) AS BIGINT) AS total_bytes
FROM documents
WHERE text LIKE '%merge%' OR text LIKE '%vector%'
GROUP BY lang
ORDER BY lang
"""


@q("esql_string_scalars", _ESQL_STRING_SCALARS_ORACLE)
def _esql_string_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``LIKE ("*merge*", "*vector*")`` — the 8.16 pattern-LIST
    form, lowered to ONE anchored alternation regex (a single codegen
    predicate, not N ors) — plus the round-9 scalar batch:
    ``LOCATE(str, substr)`` (ES|QL argument order, swapped into
    Spark's) and ``BYTE_LENGTH`` (octet_length), folded into a
    per-language STATS with a per-aggregate WHERE.

    Scale shape: scan -> one regex predicate -> narrow scalar
    projection -> ONE partial-agg shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return run_esql(
        """
        FROM documents
        | WHERE text LIKE ("*merge*", "*vector*")
        | EVAL loc = LOCATE(text, "scan"), bytes = BYTE_LENGTH(text)
        | STATS n = count(*),
                with_scan = count(*) WHERE loc > 0,
                total_bytes = sum(bytes)
            BY lang
        | SORT lang
        """,
        {"documents": docs},
    )

# ---------------------------------------------------------------------------
# 7. METADATA _score: relevance-ranked ES|QL (Discover's sort-by-score)
# ---------------------------------------------------------------------------

# BM25 k1=1.2, b=0.75; field statistics over docs with >=1 token,
# exactly like operators/querydsl._bm25_score (same contract as the
# es_explain_score oracle).
_ESQL_SCORE_SORT_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
  FROM documents
),
stats AS (
  SELECT CAST(sum(CASE WHEN len(tk) > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs,
         CAST(sum(CASE WHEN len(tk) > 0 THEN len(tk) END) AS BIGINT)
           AS total_len
  FROM toks
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(tk) AS term FROM toks)
  WHERE term IN ('merge', 'scan')
  GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
),
bm AS (
  SELECT t.doc_id,
         sum(
           ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
           * (t.tf * 2.2)
           / (t.tf + 1.2 * (0.25 + 0.75
              * (d.dl / (CAST(s.total_len AS DOUBLE) / s.n_docs))))
         ) AS v
  FROM tf t
  JOIN dfreq f USING (term)
  JOIN (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM toks) d
    USING (doc_id)
  CROSS JOIN stats s
  GROUP BY t.doc_id
)
SELECT doc_id, round(v, 6) AS score
FROM bm
ORDER BY score DESC, doc_id
LIMIT 20
"""


@q("esql_score_sort", _ESQL_SCORE_SORT_ORACLE)
def _esql_score_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``FROM idx METADATA _score | WHERE MATCH(..) | SORT
    _score DESC`` — relevance-ranked Discover. ``_score`` starts at 0
    and every scoring full-text function in the WHERE adds its BM25
    contribution — the SAME scoring expression ``_search`` ranks by
    (pinned equal in tests), so the pipe, the bar, and the endpoint
    agree on ranking. The oracle replays the Lucene practical scoring
    function relationally.

    Scale shape: one broadcast corpus-stats row (same as _search's
    match scoring), the predicate + score are codegen expressions,
    SORT+LIMIT a TakeOrdered — only 20 rows reach the driver."""
    docs = _t(spark, sf_dir, "documents")
    return run_esql(
        """
        FROM documents METADATA _score
        | WHERE MATCH(text, "merge scan")
        | EVAL score = ROUND(_score, 6)
        | SORT score DESC, doc_id
        | LIMIT 20
        | KEEP doc_id, score
        """,
        {"documents": docs},
    )

# ---------------------------------------------------------------------------
# 8. FORK + FUSE: hybrid search in pure pipe syntax (ES 8.19)
# ---------------------------------------------------------------------------

_ESQL_FORK_FUSE_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
  FROM documents
),
stats AS (
  SELECT CAST(sum(CASE WHEN len(tk) > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs,
         CAST(sum(CASE WHEN len(tk) > 0 THEN len(tk) END) AS BIGINT)
           AS total_len
  FROM toks
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(tk) AS term FROM toks)
  WHERE term IN ('merge', 'scan', 'vector', 'filters')
  GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
),
dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM toks),
contrib AS (
  SELECT t.doc_id, t.term,
         ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
         * (t.tf * 2.2)
         / (t.tf + 1.2 * (0.25 + 0.75
            * (d.dl / (CAST(s.total_len AS DOUBLE) / s.n_docs)))) AS c
  FROM tf t
  JOIN dfreq f USING (term)
  JOIN dl d USING (doc_id)
  CROSS JOIN stats s
),
r1 AS (
  SELECT doc_id,
         row_number() OVER (
           ORDER BY v DESC, CAST(doc_id AS VARCHAR)) AS rk
  FROM (SELECT doc_id, sum(c) AS v FROM contrib
        WHERE term IN ('merge', 'scan') GROUP BY doc_id)
  QUALIFY rk <= 20
),
r2 AS (
  SELECT doc_id,
         row_number() OVER (
           ORDER BY v DESC, CAST(doc_id AS VARCHAR)) AS rk
  FROM (SELECT doc_id, sum(c) AS v FROM contrib
        WHERE term IN ('vector', 'filters') GROUP BY doc_id)
  QUALIFY rk <= 20
),
fused AS (
  SELECT COALESCE(r1.doc_id, r2.doc_id) AS doc_id,
         COALESCE(1.0 / (60 + r1.rk), 0.0)
         + COALESCE(1.0 / (60 + r2.rk), 0.0) AS f
  FROM r1 FULL OUTER JOIN r2 ON r1.doc_id = r2.doc_id
)
SELECT CAST(doc_id AS VARCHAR) AS _id, round(f, 6) AS fused
FROM fused
ORDER BY fused DESC, CAST(doc_id AS VARCHAR)
LIMIT 15
"""


@q("esql_fork_fuse_hybrid", _ESQL_FORK_FUSE_ORACLE)
def _esql_fork_fuse_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``FORK ... | FUSE`` (ES 8.19 tech preview) — hybrid
    search in pure pipe syntax: two scored MATCH branches, each
    SORT+LIMITed to its top 20, merged by ``_id`` with reciprocal
    rank fusion (1/(60+rank), the same math as hybrid_rrf_search and
    the retriever tree). The oracle replays both BM25 rankings and
    the RRF join relationally.

    Scale shape: each branch is a TakeOrdered over the shared scan;
    FUSE's rank window partitions per branch over the LIMITed pages
    (like ES, which fuses result pages, not indices), then one
    groupBy on ``_id``."""
    docs = _t(spark, sf_dir, "documents")
    return run_esql(
        """
        FROM documents METADATA _id, _score
        | FORK (WHERE MATCH(text, "merge scan")
                  | SORT _score DESC, _id | LIMIT 20)
               (WHERE MATCH(text, "vector filters")
                  | SORT _score DESC, _id | LIMIT 20)
        | FUSE
        | EVAL fused = ROUND(_score, 6)
        | SORT fused DESC, _id
        | LIMIT 15
        | KEEP _id, fused
        """,
        {"documents": docs},
    )

# ---------------------------------------------------------------------------
# 9. CATEGORIZE(): Kibana's log-pattern grouping as a STATS BY key
# ---------------------------------------------------------------------------

_ESQL_CATEGORIZE_ORACLE = """
WITH lines AS (
  SELECT event_type || ' code ' || CAST(value AS VARCHAR) AS msg,
         value
  FROM events
),
keyed AS (
  SELECT array_to_string(
           list_filter(string_split_regex(msg, '\\s+'),
                       t -> t <> '' AND NOT regexp_matches(t, '[0-9]')),
           ' ') AS cat,
         value
  FROM lines
  WHERE msg IS NOT NULL
)
SELECT cat,
       count(*) AS n,
       round(avg(value), 6) AS avg_value
FROM keyed
WHERE cat <> ''
GROUP BY cat
ORDER BY cat
"""


@q("esql_categorize", _ESQL_CATEGORIZE_ORACLE)
def _esql_categorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``STATS .. BY CATEGORIZE(msg)`` (ES 8.18 GA) — the
    log-pattern grouping behind Kibana's pattern analysis, as a BY
    function. Same deterministic key as the engine's categorize_text
    aggregation (digit-bearing tokens dropped — the varying parts of
    a log template), so the pipe and the aggregation bucket
    identically.

    Scale shape: the category key is one codegen split/filter/join
    expression; STATS stays the single partial-agg shuffle."""
    ev = _t(spark, sf_dir, "events")
    out = run_esql(
        """
        FROM events
        | EVAL msg = CONCAT(event_type, " code ", TO_STRING(value))
        | WHERE msg IS NOT NULL
        | STATS n = count(*), avg_value = avg(value)
            BY cat = CATEGORIZE(msg)
        | WHERE cat IS NOT NULL
        | SORT cat
        """,
        {"events": ev},
    )
    return out.select(
        "cat", "n", F.round("avg_value", 6).alias("avg_value")
    )

# ---------------------------------------------------------------------------
# 10. The ES 8.18 linear retriever: weighted normalized hybrid
# ---------------------------------------------------------------------------

_LIN_DIM = 64
_LIN_VEC = [round(((i * 7) % 19) / 19.0, 6) for i in range(_LIN_DIM)]

_RETRIEVER_LINEAR_ORACLE = f"""
WITH q AS (SELECT [{", ".join(str(x) for x in _LIN_VEC)}]::DOUBLE[] AS qv),
kn AS (
  SELECT vec_id,
         (1 + list_cosine_similarity(embedding::DOUBLE[], qv)) / 2 AS s
  FROM embeddings CROSS JOIN q
  ORDER BY s DESC, vec_id LIMIT 15
),
kn_c AS (
  SELECT vec_id,
         CASE WHEN max(s) OVER () > min(s) OVER ()
              THEN (s - min(s) OVER ())
                   / (max(s) OVER () - min(s) OVER ())
              ELSE 1.0 END * 1.5 AS c
  FROM kn
),
q_c AS (
  SELECT vec_id, 0.4 AS c
  FROM embeddings WHERE label <= 3
  ORDER BY vec_id LIMIT 15
),
fused AS (
  SELECT vec_id, sum(c) AS score
  FROM (SELECT * FROM kn_c UNION ALL SELECT * FROM q_c)
  GROUP BY vec_id
)
SELECT f.vec_id, CAST(e.label AS BIGINT) AS label,
       round(f.score, 6) AS score
FROM fused f JOIN embeddings e USING (vec_id)
ORDER BY f.score DESC, f.vec_id LIMIT 8
"""


@q("es_search_retriever_linear", _RETRIEVER_LINEAR_ORACLE)
def _es_search_retriever_linear(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The ES 8.18 ``linear`` retriever — the explicit-weights
    alternative to rrf: each arm's top-window scores min-max
    normalize to [0, 1] (a constant-score arm degenerates to 1) and
    sum under per-arm weights. Lowered at plan time onto the same
    hybrid query+knn path as the rrf retriever, with a
    ``rank: {{linear: ..}}`` fusion mode. The oracle replays the
    cosine arm, both normalizations, and the weighted join.

    Scale shape: identical to rrf — window-row arm frames, one tiny
    groupBy fusion, broadcast-join back for _source."""
    from ..operators.querydsl import run_search_body

    emb = _t(spark, sf_dir, "embeddings")
    out = run_search_body(emb, {
        "retriever": {"linear": {
            "retrievers": [
                {"retriever": {"standard": {"query": {
                    "range": {"label": {"lte": 3}}}}},
                 "weight": 0.4, "normalizer": "minmax"},
                {"retriever": {"knn": {"field": "embedding",
                    "query_vector": _LIN_VEC, "k": 8}},
                 "weight": 1.5, "normalizer": "minmax"},
            ],
            "rank_window_size": 15,
        }},
        "size": 8,
        "_source": ["vec_id", "label"],
    })
    return out.select(
        "vec_id", F.col("label").cast("long").alias("label"),
        F.round("_score", 6).alias("score"),
    )
