"""Round-8 surface as declared queries: ES|QL ``BUCKET()`` grouping
(the query Kibana Discover generates for every ES|QL date
histogram), KEEP wildcards + the MV_* scalar family, ``LOOKUP
JOIN`` (ES 8.18's general join command), and the ``_explain``
endpoint (per-clause score decomposition for one document) — each a
literal pipe chain / request body through the interpreter,
value-checked against a hand-written DuckDB oracle.

Reference context: the reference's gorouter/app indices
(main.go:447) are exactly what Kibana Discover queries with ES|QL —
a date histogram over log volume is THE first chart every ops
dashboard draws.

Scale shape: a pipe chain compiles to ONE logical plan — BUCKET is a
codegen scalar expression (date_trunc / epoch-aligned floor), so the
histogram is exactly the one partial-agg shuffle the hand-written
groupBy would run; LOOKUP JOIN broadcasts the lookup index like
every dimension join in this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.esql import run_esql
from .declared import _t, q

# ---------------------------------------------------------------------------
# 1. BUCKET(ts, 1 hour): the Kibana Discover date histogram
# ---------------------------------------------------------------------------

_ESQL_DATE_HISTOGRAM_ORACLE = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS h,
       count(*) AS n,
       round(avg(value), 6) AS avg_value
FROM events
WHERE event_type <> 'error'
GROUP BY 1
ORDER BY h
"""


@q("esql_date_histogram", _ESQL_DATE_HISTOGRAM_ORACLE)
def _esql_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``BUCKET()`` — calendar form: ``STATS ... BY h =
    BUCKET(ts, 1 hour)`` is the query Kibana Discover generates for
    every ES|QL date histogram. A 1-unit calendar span lowers to
    ``date_trunc``, so the histogram is the identical one-shuffle
    plan the hand-written groupBy builds; the BY-key assignment names
    the bucket column.

    Scale shape: scan -> codegen date_trunc -> ONE partial-agg
    shuffle -> sort; nothing about the pipe syntax changes the
    physics."""
    ev = _t(spark, sf_dir, "events")
    out = run_esql(
        """
        FROM events
        | WHERE event_type != "error"
        | STATS n = count(*), avg_value = avg(value)
            BY h = BUCKET(ts, 1 hour)
        | SORT h ASC
        """,
        {"events": ev},
    )
    return out.select(
        F.date_format("h", "yyyy-MM-dd HH:mm").alias("h"),
        "n",
        F.round("avg_value", 6).alias("avg_value"),
    )


# ---------------------------------------------------------------------------
# 2. BUCKET fixed-width + numeric: epoch-aligned 6-hour buckets and a
#    floor-multiple value histogram in one STATS
# ---------------------------------------------------------------------------

_ESQL_BUCKET_FIXED_ORACLE = """
SELECT CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS b6h,
       floor(value / 2.5) * 2.5 AS vb,
       count(*) AS n
FROM events
GROUP BY 1, 2
ORDER BY b6h, vb
"""


@q("esql_bucket_fixed", _ESQL_BUCKET_FIXED_ORACLE)
def _esql_bucket_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``BUCKET()`` — fixed-interval and numeric forms in one
    STATS: ``BUCKET(ts, 6 hours)`` lowers to epoch-aligned
    fixed-width buckets (ES fixed_interval alignment: floor of epoch
    seconds over the span), ``BUCKET(value, 2.5)`` to the numeric
    floor-multiple histogram. The bucket surfaces as epoch seconds so
    both engines hash the identical integer.

    Scale shape: two codegen scalar keys, ONE partial-agg shuffle —
    a 2-D histogram costs the same wire as a 1-D one."""
    ev = _t(spark, sf_dir, "events")
    out = run_esql(
        """
        FROM events
        | STATS n = count(*)
            BY b = BUCKET(ts, 6 hours), vb = BUCKET(value, 2.5)
        | SORT b ASC, vb ASC
        """,
        {"events": ev},
    )
    return out.select(
        F.col("b").cast("long").alias("b6h"), "vb", "n"
    )


# ---------------------------------------------------------------------------
# 3. KEEP wildcards + MV_* scalars over the documents table
# ---------------------------------------------------------------------------

_ESQL_KEEP_MV_ORACLE = """
SELECT doc_id, n_chars,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       string_split(text, ' ')[1] AS first_w,
       string_split(text, ' ')[len(string_split(text, ' '))] AS last_w
FROM documents
ORDER BY doc_id
LIMIT 100
"""


@q("esql_keep_wildcard_mv", _ESQL_KEEP_MV_ORACLE)
def _esql_keep_wildcard_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``KEEP`` wildcards + the MV_* scalar family: tokenize
    inside the pipe, measure the multi-value column with
    MV_COUNT/MV_FIRST/MV_LAST, then project with wildcard patterns
    (``KEEP doc_*, n_*, ...`` — idiomatic ES|QL; resolved against the
    frame's columns with ES|QL's precedence rule, unknown patterns
    fail loud).

    Scale shape: entirely narrow — split + array accessors are
    codegen expressions, KEEP is a projection; the only exchange is
    the TakeOrdered for the LIMIT."""
    docs = _t(spark, sf_dir, "documents")
    return run_esql(
        """
        FROM documents
        | EVAL words = split(text, " "),
               n_words = MV_COUNT(words),
               first_w = MV_FIRST(words),
               last_w = MV_LAST(words)
        | KEEP doc_*, n_*, first_w, last_w
        | SORT doc_id ASC
        | LIMIT 100
        """,
        {"documents": docs},
    )


# ---------------------------------------------------------------------------
# 4. LOOKUP JOIN: ES 8.18's general join command
# ---------------------------------------------------------------------------

_ESQL_LOOKUP_JOIN_ORACLE = """
SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
       count(*) AS n,
       round(sum(c.c_acctbal), 2) AS total_bal
FROM events e
JOIN customer c ON c.c_custkey = (e.user_id % 1500) + 1
WHERE e.event_type <> 'error'
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
"""


@q("esql_lookup_join_stats", _ESQL_LOOKUP_JOIN_ORACLE)
def _esql_lookup_join_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``LOOKUP JOIN`` (ES 8.18): the general join command —
    unlike ENRICH it keeps the lookup index's FULL column set and
    multiple matches multiply the stream row; same-named stream
    columns are overridden (last-write-wins). Here events join the
    customer index on a derived key and aggregate the looked-up
    balance per nation.

    Scale shape: ONE broadcast hash join (the lookup index is the
    small side) + ONE STATS partial-agg shuffle — identical to the
    hand-written enrichment plan."""
    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")
    out = run_esql(
        """
        FROM events
        | EVAL c_custkey = user_id % 1500 + 1
        | LOOKUP JOIN customer ON c_custkey
        | WHERE event_type != "error"
        | STATS n = count(*), total_bal = sum(c_acctbal)
            BY c_nationkey
        | SORT c_nationkey ASC
        """,
        {"events": ev, "customer": cust},
    )
    return out.select(
        "c_nationkey", "n", F.round("total_bal", 2).alias("total_bal")
    )


# ---------------------------------------------------------------------------
# 5. _explain: per-clause score decomposition for ONE document
# ---------------------------------------------------------------------------

_EXPLAIN_DOC = 7
_EXPLAIN_BODY = {
    "query": {
        "bool": {
            "must": [{"match": {"text": "scan merge"}}],
            "should": [{"term": {"lang": {"value": "en", "boost": 2.5}}}],
            "filter": [{"range": {"n_chars": {"gte": 0}}}],
        }
    }
}

# BM25 constants k1=1.2, b=0.75: (1+k1)=2.2, (1-b)=0.25. Lucene field
# statistics (n_docs / total_len) are taken over docs with >=1 token
# for the field, exactly like operators/querydsl._bm25_score.
_ES_EXPLAIN_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, n_chars,
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
  WHERE term IN ('scan', 'merge')
  GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
),
doc AS (
  SELECT doc_id, lang, n_chars, CAST(len(tk) AS BIGINT) AS dl
  FROM toks WHERE doc_id = {_EXPLAIN_DOC}
),
bm AS (
  SELECT d.doc_id,
         COALESCE(sum(
           ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
           * (t.tf * 2.2)
           / (t.tf + 1.2 * (0.25 + 0.75
              * (d.dl / (CAST(s.total_len AS DOUBLE) / s.n_docs))))
         ), 0.0) AS v,
         count(t.term) > 0 AS m
  FROM doc d
  CROSS JOIN stats s
  LEFT JOIN tf t ON t.doc_id = d.doc_id
  LEFT JOIN dfreq f ON f.term = t.term
  GROUP BY d.doc_id
)
SELECT d.doc_id, 'must[0]:match' AS clause, bm.m AS matched,
       round(bm.v, 6) AS value
FROM doc d JOIN bm USING (doc_id)
UNION ALL
SELECT doc_id, 'should[0]:term', lang = 'en',
       CASE WHEN lang = 'en' THEN 2.5 ELSE 0.0 END
FROM doc
UNION ALL
SELECT doc_id, 'filter[0]:range', n_chars >= 0, 0.0 FROM doc
UNION ALL
SELECT d.doc_id, 'total',
       bm.m AND d.n_chars >= 0,
       round(CASE WHEN bm.m AND d.n_chars >= 0
             THEN bm.v + CASE WHEN d.lang = 'en' THEN 2.5 ELSE 0.0 END
             ELSE 0.0 END, 6)
FROM doc d JOIN bm USING (doc_id)
ORDER BY clause
"""


@q("es_explain_score", _ES_EXPLAIN_ORACLE)
def _es_explain_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``_explain``: the per-clause "why does this document score
    X" breakdown for one doc against a bool query — the BM25 must
    clause reports its real summed-term score, the constant-score
    should reports its boost when it matches, the filter reports
    matched-with-value-0, and the ``total`` row is produced by the
    SAME scoring expression ``_search`` ranks by (pinned equal in
    tests/test_round8_explain.py). The oracle replays the Lucene
    practical scoring function relationally and emits the identical
    clause rows.

    Scale shape: one broadcast stats row for the BM25 clause (same
    as _search), an id-equality filter that pushes to the scan, and
    a 4-element explode from the one matched row — no shuffle."""
    from ..operators.esapi import run_explain

    docs = _t(spark, sf_dir, "documents")
    out = run_explain(docs, _EXPLAIN_DOC, _EXPLAIN_BODY)
    return out.select(
        "doc_id", "clause", "matched",
        F.round("value", 6).alias("value"),
    ).orderBy("clause")


# ---------------------------------------------------------------------------
# 6. The ES|QL scalar function family: TO_* conversions + dates
# ---------------------------------------------------------------------------

_ESQL_FUNCTIONS_ORACLE = """
SELECT upper(event_type) AS etype_up,
       strftime(ts, '%Y-%m-%d') AS day,
       count(*) AS n,
       max(CAST(floor((epoch(ts) - epoch(TIMESTAMP '2023-12-31'))
                      / 3600) AS BIGINT)) AS max_age_h
FROM events
WHERE event_type LIKE 'c%' AND extract('hour' FROM ts) >= 12
GROUP BY 1, 2
ORDER BY etype_up, day
LIMIT 40
"""


@q("esql_functions_scalar", _ESQL_FUNCTIONS_ORACLE)
def _esql_functions_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ES|QL scalar function family in one pipe: TO_UPPER,
    DATE_FORMAT (format-FIRST, ES|QL argument order), DATE_EXTRACT
    (java.time ChronoField names), DATE_DIFF (complete units, like
    ChronoUnit.between — the oracle replays it as floor(epoch-delta /
    3600) because DuckDB's date_diff counts boundary CROSSINGS, a
    different function), DATE_PARSE, and STARTS_WITH. Every name
    translates at plan time into the Spark built-in; nothing leaves
    codegen.

    Scale shape: scan with both predicates pushed -> ONE partial-agg
    shuffle -> TakeOrdered."""
    ev = _t(spark, sf_dir, "events")
    return run_esql(
        """
        FROM events
        | EVAL etype_up = TO_UPPER(event_type),
               day = DATE_FORMAT("yyyy-MM-dd", ts),
               hour_of_day = DATE_EXTRACT("hour_of_day", ts),
               age_h = DATE_DIFF("hours",
                   DATE_PARSE("yyyy-MM-dd", "2023-12-31"), ts)
        | WHERE STARTS_WITH(event_type, "c") AND hour_of_day >= 12
        | STATS n = count(*), max_age_h = max(age_h) BY etype_up, day
        | SORT etype_up ASC, day ASC
        | LIMIT 40
        """,
        {"events": ev},
    )


# ---------------------------------------------------------------------------
# 7. ES|QL LIKE (*/? wildcards, whole-string) and anchored RLIKE
# ---------------------------------------------------------------------------

_ESQL_LIKE_ORACLE = """
SELECT lang, source, count(*) AS n
FROM documents
WHERE text LIKE '%scan%merge%' OR regexp_full_match(lang, 'e.')
GROUP BY lang, source
ORDER BY lang, source
"""


@q("esql_like_rlike", _ESQL_LIKE_ORACLE)
def _esql_like_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``LIKE``/``RLIKE`` semantics: LIKE wildcards are ``*`` /
    ``?`` matching the WHOLE string (lowered to an anchored RLIKE —
    SQL's %/_ would be silently wrong), and ES|QL RLIKE itself is
    whole-string (like the ES regexp query), so ``lang RLIKE "e."``
    matches 'en' but NOT 'dean' — the oracle uses DuckDB's
    regexp_full_match for exactly that contract.

    Scale shape: one scan (the disjunction stays row-local), one
    partial-agg shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return run_esql(
        """
        FROM documents
        | WHERE text LIKE "*scan*merge*" OR lang RLIKE "e."
        | STATS n = count(*) BY lang, source
        | SORT lang ASC, source ASC
        """,
        {"documents": docs},
    )


# ---------------------------------------------------------------------------
# 8. INLINESTATS: per-group aggregates without collapsing
# ---------------------------------------------------------------------------

_ESQL_INLINESTATS_ORACLE = """
WITH w AS (
  SELECT event_type, value,
         avg(value) OVER (PARTITION BY event_type) AS avg_v
  FROM events
)
SELECT event_type, count(*) AS n,
       round(max(value), 4) AS max_kept
FROM w
WHERE value >= 1.8 * avg_v
GROUP BY event_type
ORDER BY event_type
"""


@q("esql_inlinestats", _ESQL_INLINESTATS_ORACLE)
def _esql_inlinestats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``INLINESTATS`` (ES 8.16): per-group aggregates joined
    back onto every row — here "events at least 1.8x their type's
    average" — then a normal STATS over the survivors. Lowered to a
    window aggregate over the BY key (NULL keys form their own
    group, like STATS).

    Scale shape: ONE window exchange on the BY key + ONE partial-agg
    shuffle; the global (no-BY) form instead reduces to a broadcast
    row, so no single-partition window ever appears."""
    ev = _t(spark, sf_dir, "events")
    out = run_esql(
        """
        FROM events
        | INLINESTATS avg_v = avg(value) BY event_type
        | WHERE value >= 1.8 * avg_v
        | STATS n = count(*), max_kept = max(value) BY event_type
        | SORT event_type ASC
        """,
        {"events": ev},
    )
    return out.select(
        "event_type", "n", F.round("max_kept", 4).alias("max_kept")
    )


# ---------------------------------------------------------------------------
# 9. ROW: the literal one-row source
# ---------------------------------------------------------------------------

_ESQL_ROW_ORACLE = """
SELECT CAST(1 AS BIGINT) AS a, 'x' AS b, 2.5 AS c,
       CAST(3 AS BIGINT) AS d
"""


@q("esql_row_literal", _ESQL_ROW_ORACLE)
def _esql_row_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``ROW``: the literal one-row source (the scratchpad
    command the ES|QL docs open with), with an EVAL over it —
    entirely plan-time, no table scan at all."""
    from ..session import tune_session

    tune_session(spark)
    return run_esql(
        'ROW a = 1, b = "x", c = 2.5 | EVAL d = a + 2', {}
    )


# ---------------------------------------------------------------------------
# 10. STATS with per-aggregate WHERE (ES 8.16)
# ---------------------------------------------------------------------------

_ESQL_STATS_WHERE_ORACLE = """
SELECT event_type,
       count(*) AS n,
       count(*) FILTER (WHERE value > 4.0) AS big,
       round(COALESCE(sum(value) FILTER (WHERE value > 4.0), 0.0), 4)
         AS big_sum
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@q("esql_stats_where", _ESQL_STATS_WHERE_ORACLE)
def _esql_stats_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL per-aggregate filters (ES 8.16): ``STATS big = count(*)
    WHERE value > 4.0 BY event_type`` — each aggregate carries its
    own predicate, lowered to the ANSI ``FILTER (WHERE ..)`` clause
    both engines implement natively.

    Scale shape: STILL one partial-agg shuffle — per-agg filters are
    row-local inside the same aggregation pass, never a pre-split of
    the frame or a second scan."""
    ev = _t(spark, sf_dir, "events")
    out = run_esql(
        """
        FROM events
        | STATS n = count(*),
                big = count(*) WHERE value > 4.0,
                big_sum = sum(value) WHERE value > 4.0
            BY event_type
        | SORT event_type ASC
        """,
        {"events": ev},
    )
    return out.select(
        "event_type", "n", "big",
        F.round(F.coalesce("big_sum", F.lit(0.0)), 4).alias("big_sum"),
    )


# ---------------------------------------------------------------------------
# 11. CASE() function form + regex REPLACE + literal SPLIT + MV_SLICE
# ---------------------------------------------------------------------------

_ESQL_CASE_ORACLE = """
SELECT CASE WHEN n_chars >= 300 THEN 'long'
            WHEN n_chars >= 120 THEN 'mid'
            ELSE 'short' END AS band,
       regexp_replace(lang, '[aeiou]', '?', 'g') AS cleaned,
       count(*) AS n,
       min(array_to_string(list_slice(string_split(text, ' '), 1, 2),
                           '_')) AS first2
FROM documents
GROUP BY 1, 2
ORDER BY band, cleaned
"""


@q("esql_case_replace_split", _ESQL_CASE_ORACLE)
def _esql_case_replace_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ES|QL's FUNCTION-form ``CASE(c1, v1, c2, v2, default)`` (the
    shape Kibana emits — ES|QL has no CASE WHEN syntax), regex
    ``REPLACE`` (ES|QL REPLACE is regex substitution, so it lowers to
    regexp_replace, NOT Spark's literal replace), literal-delimiter
    ``SPLIT`` and 0-based-inclusive ``MV_SLICE`` — all in one pipe
    over the documents table.

    Scale shape: every translated function is a codegen scalar; one
    partial-agg shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return run_esql(
        """
        FROM documents
        | EVAL band = CASE(n_chars >= 300, "long",
                           n_chars >= 120, "mid", "short"),
               cleaned = REPLACE(lang, "[aeiou]", "?"),
               first2 = MV_CONCAT(
                   MV_SLICE(SPLIT(text, " "), 0, 1), "_")
        | STATS n = count(*), first2 = min(first2) BY band, cleaned
        | SORT band ASC, cleaned ASC
        """,
        {"documents": docs},
    )


# ---------------------------------------------------------------------------
# 12. CHANGE_POINT over the daily order-count series
# ---------------------------------------------------------------------------

_ESQL_CHANGE_POINT_ORACLE = """
WITH daily AS (
  SELECT o_orderdate AS d, CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
cum AS (
  SELECT d, x,
         row_number() OVER (ORDER BY d) AS k,
         CAST(sum(x) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS DOUBLE) AS cs,
         CAST(sum(x * x) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS DOUBLE) AS css,
         count(*) OVER () AS tk,
         CAST(sum(x) OVER () AS DOUBLE) AS ts,
         CAST(sum(x * x) OVER () AS DOUBLE) AS tss
  FROM daily
),
cand AS (
  SELECT k,
         (css - cs * cs / CAST(k AS DOUBLE))
         + ((tss - css) - (ts - cs) * (ts - cs)
            / CAST(tk - k AS DOUBLE)) AS sse,
         tss - ts * ts / CAST(tk AS DOUBLE) AS sse_single
  FROM cum WHERE k < tk
),
best AS (SELECT * FROM cand ORDER BY sse, k LIMIT 1)
SELECT strftime(c.d, '%Y-%m-%d') AS day,
       c.x,
       'step_change' AS cp_type,
       round(b.sse / b.sse_single, 6) AS pvalue
FROM cum c JOIN best b ON c.k = b.k + 1
"""


@q("esql_change_point", _ESQL_CHANGE_POINT_ORACLE)
def _esql_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``CHANGE_POINT`` (ES 8.18): STATS builds the daily
    order-count series, CHANGE_POINT appends type/pvalue columns
    non-NULL on the detected change row (the first row of the new
    regime, like ES). The detector is the engine's
    binary-segmentation level-shift (same math as the change_point
    aggregation) with the documented deterministic stand-in p-value
    sse_split/sse_single; the oracle replays it relationally and
    joins the k+1 row.

    Scale shape: the data-sized work is the STATS shuffle down to
    ~2,400 daily rows; the CHANGE_POINT window then runs on that tiny
    frame — in-contract with ES, which caps the command at 1,000
    points."""
    o = _t(spark, sf_dir, "orders")
    out = run_esql(
        """
        FROM orders
        | STATS x = count(*) BY d = o_orderdate
        | CHANGE_POINT x ON d AS cp_type, pvalue
        | WHERE cp_type IS NOT NULL
        """,
        {"orders": o},
    )
    return out.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "x", "cp_type", "pvalue",
    )


# ---------------------------------------------------------------------------
# 13. FORK: one prefix, several branch pipelines, unioned
# ---------------------------------------------------------------------------

_ESQL_FORK_ORACLE = """
SELECT event_type, count(*) AS hi, 'fork1' AS _fork,
       CAST(NULL AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS total
FROM events WHERE value > 4.9 GROUP BY event_type
UNION ALL
SELECT event_type, CAST(NULL AS BIGINT), 'fork2',
       count(*), round(sum(value), 4)
FROM events GROUP BY event_type
ORDER BY _fork, event_type
"""


@q("esql_fork_branches", _ESQL_FORK_ORACLE)
def _esql_fork_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``FORK`` (ES 8.19): the common prefix feeds two branch
    pipelines — a filtered high-value count and the full per-type
    stats — whose outputs union with the ``_fork`` discriminator
    (missing columns NULL-filled), exactly the two-perspective query
    shape FORK exists for.

    Scale shape: each branch is one partial-agg shuffle over the
    shared scan; the union concatenates without a shuffle."""
    ev = _t(spark, sf_dir, "events")
    out = run_esql(
        """
        FROM events
        | FORK (WHERE value > 4.9 | STATS hi = count(*) BY event_type)
               (STATS n = count(*), total = sum(value) BY event_type)
        | SORT _fork ASC, event_type ASC
        """,
        {"events": ev},
    )
    return out.select(
        "event_type", "hi", "_fork", "n",
        F.round("total", 4).alias("total"),
    )


# ---------------------------------------------------------------------------
# 14. The ES 8.14+ retriever tree: rrf over a standard + knn pair
# ---------------------------------------------------------------------------

_RET_DIM = 64
_RET_VEC = [round(((i * 11) % 17) / 17.0, 6) for i in range(_RET_DIM)]

_RETRIEVER_RRF_ORACLE = f"""
WITH q AS (SELECT [{", ".join(str(x) for x in _RET_VEC)}]::DOUBLE[] AS qv),
knn_arm AS (
  SELECT vec_id, CAST(row_number() OVER (
           ORDER BY list_cosine_similarity(embedding::DOUBLE[], qv) DESC,
                    vec_id) AS BIGINT) AS r
  FROM embeddings CROSS JOIN q
  ORDER BY r LIMIT 15
),
q_arm AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) AS r
  FROM embeddings WHERE label <= 3
  ORDER BY r LIMIT 15
),
fused AS (
  SELECT vec_id, sum(1.0 / (20 + r)) AS score
  FROM (SELECT * FROM knn_arm UNION ALL SELECT * FROM q_arm)
  GROUP BY vec_id
)
SELECT f.vec_id, CAST(e.label AS BIGINT) AS label,
       round(f.score, 6) AS score
FROM fused f JOIN embeddings e USING (vec_id)
ORDER BY f.score DESC, f.vec_id LIMIT 8
"""


@q("es_search_retriever_rrf", _RETRIEVER_RRF_ORACLE)
def _es_search_retriever_rrf(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The ES 8.14+ ``retriever`` tree — the NEW top-level search
    syntax semantic-search clients send: an ``rrf`` retriever fusing a
    ``standard`` retriever (query arm) with a ``knn`` retriever
    (vector arm), lowered at plan time onto the engine's existing
    hybrid query+knn+rank.rrf path (``num_candidates`` is dropped —
    the knn section here is exact). Same RRF math as
    es_search_knn_rrf, reached through the modern body shape.

    Scale shape: identical to the legacy form — both arm frames are
    window-row sized, fuse in one tiny groupBy, broadcast-join back
    for _source."""
    from ..operators.querydsl import run_search_body

    emb = _t(spark, sf_dir, "embeddings")
    out = run_search_body(emb, {
        "retriever": {"rrf": {
            "retrievers": [
                {"standard": {"query": {"range": {"label": {"lte": 3}}}}},
                {"knn": {"field": "embedding", "query_vector": _RET_VEC,
                         "k": 8, "num_candidates": 50}},
            ],
            "rank_window_size": 15,
            "rank_constant": 20,
        }},
        "size": 8,
        "_source": ["vec_id", "label"],
    })
    return out.select(
        "vec_id", F.col("label").cast("long").alias("label"),
        F.round("_score", 6).alias("score"),
    )


# ---------------------------------------------------------------------------
# 15. CIDR_MATCH / TO_IP: subnet filtering on a derived IPv4 column
# ---------------------------------------------------------------------------

_ESQL_CIDR_ORACLE = """
WITH ips AS (
  SELECT event_type,
         (10 * 16777216 + (user_id % 256) * 65536
          + (event_id % 256) * 256 + 1) AS ip_int
  FROM events
)
SELECT event_type, count(*) AS n
FROM ips
WHERE ip_int // 8388608 = 21        -- 10.128.0.0/9  (shift 23)
   OR ip_int // 16384 = 10241       -- 10.0.64.0/18  (shift 14)
GROUP BY event_type
ORDER BY event_type
"""


@q("esql_cidr_match", _ESQL_CIDR_ORACLE)
def _esql_cidr_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``CIDR_MATCH`` — the ops-dashboard subnet filter: an
    IPv4 column (synthesized from event keys here) filtered against
    two literal CIDR blocks. The block prefix/shift fold at PLAN
    time, so each row costs one dotted-quad integer fold + an integer
    divide per block — pure codegen, no UDF, and the oracle replays
    the identical integer arithmetic.

    Scale shape: row-local predicate + ONE partial-agg shuffle."""
    ev = _t(spark, sf_dir, "events")
    return run_esql(
        """
        FROM events
        | EVAL ip = CONCAT("10.", TO_STRING(user_id % 256), ".",
                           TO_STRING(event_id % 256), ".1")
        | WHERE CIDR_MATCH(ip, "10.128.0.0/9", "10.0.64.0/18")
        | STATS n = count(*) BY event_type
        | SORT event_type ASC
        """,
        {"events": ev},
    )


# ---------------------------------------------------------------------------
# 16. _mget: documents by id, in request order, with found flags
# ---------------------------------------------------------------------------

_MGET_ORACLE = """
WITH req(pos, id) AS (VALUES (1, 7), (2, 99999999), (3, 3), (4, 42))
SELECT CAST(req.pos AS BIGINT) AS pos,
       CAST(req.id AS BIGINT) AS doc_id,
       d.doc_id IS NOT NULL AS found,
       d.lang, d.n_chars
FROM req LEFT JOIN documents d ON d.doc_id = req.id
ORDER BY pos
"""


@q("es_mget_docs", _MGET_ORACLE)
def _es_mget_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``_mget``: four requested ids — one of them deliberately
    absent — returned one row per REQUESTED id in request order with
    the ``found`` flag (the missing id keeps its row, found=false and
    NULL source columns, exactly like ES).

    Scale shape: the id list pushes to the scan as an IN predicate;
    the bounded hit set broadcasts onto the 4-row request frame —
    the corpus never shuffles."""
    from ..operators.esapi import run_mget

    docs = _t(spark, sf_dir, "documents")
    return run_mget(docs, {
        "ids": [7, 99999999, 3, 42],
        "_source": ["lang", "n_chars"],
    })


# ---------------------------------------------------------------------------
# 17. FROM ... METADATA: the Kibana metadata columns
# ---------------------------------------------------------------------------

_ESQL_METADATA_ORACLE = """
SELECT 'documents' AS _index,
       CAST(doc_id AS VARCHAR) AS _id,
       doc_id, lang
FROM documents
WHERE doc_id < 20
ORDER BY doc_id
"""


@q("esql_from_metadata", _ESQL_METADATA_ORACLE)
def _esql_from_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``FROM documents METADATA _index, _id`` — the metadata
    columns Kibana requests on every Discover query: ``_index`` is
    the source's name (so comma-list unions stay attributable) and
    ``_id`` the document identity as a string.

    Scale shape: two literal/cast projections on the scan — zero
    cost; the WHERE pushes to the scan as usual."""
    docs = _t(spark, sf_dir, "documents")
    return run_esql(
        """
        FROM documents METADATA _index, _id
        | WHERE doc_id < 20
        | KEEP _index, _id, doc_id, lang
        | SORT doc_id ASC
        """,
        {"documents": docs},
    )


# ---------------------------------------------------------------------------
# 18. The ES|QL aggregate-function family
# ---------------------------------------------------------------------------

_ESQL_AGG_FAMILY_ORACLE = """
SELECT lang,
       count(DISTINCT source) AS n_sources,
       round(quantile_cont(n_chars, 0.5), 4) AS med,
       round(quantile_cont(n_chars, 0.95), 4) AS p95,
       round(sum(n_chars * (doc_id % 5 + 1))
             / sum(doc_id % 5 + 1), 6) AS wavg,
       array_to_string(list_sort(list(n_chars), 'DESC')[1:3], ',')
         AS top3,
       array_to_string(list_sort(list(DISTINCT source)), ',') AS srcs
FROM documents
GROUP BY lang
ORDER BY lang
"""


@q("esql_agg_family", _ESQL_AGG_FAMILY_ORACLE)
def _esql_agg_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ES|QL aggregate-function family in one STATS:
    COUNT_DISTINCT (lowered EXACT — ES|QL's HLL precision knob is a
    latency/memory trade the exact plan doesn't need), MEDIAN and
    PERCENTILE (exact interpolated, ES|QL's 0-100 scale; Spark's
    percentile() and DuckDB's quantile_cont share the interpolation),
    WEIGHTED_AVG, TOP(n_chars, 3, "desc") (top-N multivalue) and
    VALUES (unique values, sorted for determinism — ES|QL guarantees
    no order). Multivalues surface joined as strings so both engines
    hash identical scalars.

    Scale shape: ONE partial-agg shuffle carries every aggregate;
    TOP/VALUES state is per-group top-N / distinct-set sized."""
    docs = _t(spark, sf_dir, "documents")
    out = run_esql(
        """
        FROM documents
        | STATS n_sources = COUNT_DISTINCT(source),
                med = MEDIAN(n_chars),
                p95 = PERCENTILE(n_chars, 95),
                wavg = WEIGHTED_AVG(n_chars, doc_id % 5 + 1),
                top3 = TOP(n_chars, 3, "desc"),
                srcs = VALUES(source)
            BY lang
        | SORT lang ASC
        """,
        {"documents": docs},
    )
    return out.select(
        "lang", "n_sources",
        F.round("med", 4).alias("med"),
        F.round("p95", 4).alias("p95"),
        F.round("wavg", 6).alias("wavg"),
        F.expr(
            "array_join(transform(top3, v -> CAST(v AS STRING)), ',')"
        ).alias("top3"),
        F.array_join("srcs", ",").alias("srcs"),
    )
