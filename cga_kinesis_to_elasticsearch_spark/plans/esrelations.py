"""ES parity batch 4: relational query surfaces — ``has_child`` /
``has_parent`` (the parent-child join field), ``rescore`` (two-phase
top-N re-ranking), ``scripted_metric`` (map/combine/reduce custom
aggregation), ``global`` + ``missing`` buckets, and the
``_termvectors`` API (per-document term statistics).

Reference context: the reference indexes day-partitioned log documents
into Elasticsearch (main.go:111-212); these are the query-DSL features
its users run against those indices that were not yet mapped
(join-field queries over order/line-item shaped documents, rescoring a
match window, custom metric scripts, term vectors for relevance
debugging).

Float discipline (house rule): money stages through the same
``round(sum(expr), 2)`` closures the TPC-H queries use (cents-exact
doubles; order-free within float64), ranking keys are cent-scaled
BIGINTs, and every LIMIT sits under a total order so the selected SET
is deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .declared import _t, q

# ---------------------------------------------------------------------------
# has_child: parents selected (and scored) by matching children.
# ES: {"has_child": {"type": "lineitem", "score_mode": "sum", ...}} —
# the parent document's score is the count/sum over matching children.
# ---------------------------------------------------------------------------

_HAS_CHILD_ORACLE = """
WITH hits AS (
  SELECT l_orderkey AS o_orderkey, count(*) AS child_hits
  FROM lineitem
  WHERE l_returnflag = 'R' AND l_quantity > 45
  GROUP BY 1
)
SELECT o.o_orderkey, o.o_orderstatus,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
       h.child_hits
FROM orders o JOIN hits h USING (o_orderkey)
ORDER BY h.child_hits DESC, o.o_orderkey
LIMIT 20
"""


@q("has_child_orders", _HAS_CHILD_ORACLE)
def _has_child_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``has_child`` query: return parent (order) documents having
    at least one child (line item) matching ``returnflag='R' AND
    quantity > 45``, scored by the number of matching children
    (``score_mode: sum`` over a constant-score child query) — top-20
    parents by score.

    Scale shape: the child filter collapses to a (orderkey, count)
    aggregate BEFORE touching parents — one partial-agg shuffle on the
    join key, then a key-to-key join; the parent table is never
    scanned per child. This is exactly how ES executes has_child
    (child ordinals -> parent bitset), re-expressed as agg-then-join.
    Ties break on orderkey so the top-20 SET is deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    hits = (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 45))
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.count(F.lit(1)).alias("child_hits"))
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("total_cents"),
    )
    return (
        orders.join(hits, "o_orderkey")
        .orderBy(F.desc("child_hits"), F.asc("o_orderkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# has_parent: children selected by a parent predicate, then aggregated.
# ---------------------------------------------------------------------------

_HAS_PARENT_ORACLE = """
SELECT l.l_returnflag, l.l_linestatus,
       count(*) AS n_items,
       CAST(sum(l.l_quantity) AS BIGINT) AS sum_qty
FROM lineitem l
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_orderkey = l.l_orderkey
    AND o.o_orderpriority = '1-URGENT'
)
GROUP BY l.l_returnflag, l.l_linestatus
"""


@q("has_parent_lineitems", _HAS_PARENT_ORACLE)
def _has_parent_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``has_parent`` query: return child (line item) documents
    whose parent order is ``1-URGENT``, aggregated per
    returnflag/linestatus bucket (terms agg over the matched
    children).

    Scale shape: the parent predicate reduces orders to a key set and
    the children stream through ONE left-semi join (no parent columns
    are carried, no row multiplication possible), then one
    partial-agg shuffle on a 6-value composite domain. quantity is a
    whole number, so the sum closes as an exact BIGINT."""
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(urgent, "l_orderkey", "left_semi")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").cast("long").alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# rescore: re-rank the top window of a primary sort with a secondary
# scoring function (ES rescore: query_weight / rescore_query_weight).
# ---------------------------------------------------------------------------

_RESCORE_WINDOW = 50
_RESCORE_K = 10
_RESCORE_ANCHOR = "2024-01-15 12:00:00"
# query_weight = 5, rescore_query_weight = 2 (integer weights so the
# combined score is an exact BIGINT on both engines)
_RESCORE_ORACLE = f"""
WITH scored AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS value_cents,
         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s
  FROM events
),
top_window AS (
  SELECT * FROM scored
  ORDER BY value_cents DESC, event_id ASC
  LIMIT {_RESCORE_WINDOW}
),
rescored AS (
  SELECT event_id, event_type, value_cents,
         greatest(0, 86400 - abs(
             ts_s - CAST(epoch(TIMESTAMP '{_RESCORE_ANCHOR}') AS BIGINT)
         )) AS bonus
  FROM top_window
)
SELECT event_id, event_type, value_cents, bonus,
       5 * value_cents + 2 * bonus AS combined
FROM rescored
ORDER BY combined DESC, event_id ASC
LIMIT {_RESCORE_K}
"""


@q("rescore_topk_events", _RESCORE_ORACLE)
def _rescore_topk_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``rescore``: the primary query ranks by value; only the top
    ``window_size=50`` hits are re-scored with a secondary function (a
    linear time-decay around an anchor instant — ES's ``linear`` decay)
    and combined as ``query_weight*primary + rescore_query_weight*
    secondary``; the final top-10 comes from the rescored window.

    Scale shape: the primary phase is a TakeOrdered(50) — a per-
    partition top-50 merged on the driver, never a global sort — and
    the secondary function evaluates on 50 rows only. That asymmetry
    (cheap primary over everything, expensive scorer over a bounded
    window) is the entire point of rescore at 100 TB. Integer weights
    and cent/second-scaled BIGINTs keep both phases exact."""
    ev = _t(spark, sf_dir, "events")
    scored = ev.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
        F.unix_timestamp("ts").alias("ts_s"),
    )
    top_window = scored.orderBy(
        F.desc("value_cents"), F.asc("event_id")
    ).limit(_RESCORE_WINDOW)
    anchor = F.unix_timestamp(F.lit(_RESCORE_ANCHOR).cast("timestamp"))
    bonus = F.greatest(
        F.lit(0).cast("long"),
        F.lit(86400).cast("long") - F.abs(F.col("ts_s") - anchor),
    )
    return (
        top_window.select(
            "event_id",
            "event_type",
            "value_cents",
            bonus.alias("bonus"),
        )
        .withColumn(
            "combined", 5 * F.col("value_cents") + 2 * F.col("bonus")
        )
        .orderBy(F.desc("combined"), F.asc("event_id"))
        .limit(_RESCORE_K)
    )


# ---------------------------------------------------------------------------
# scripted_metric: custom per-doc script -> algebraic combine/reduce.
# ---------------------------------------------------------------------------

_SCRIPTED_ORACLE = """
WITH mapped AS (
  SELECT l_returnflag,
         l_extendedprice * (1 - l_discount)
           - l_extendedprice * l_tax AS profit
  FROM lineitem
)
SELECT l_returnflag,
       round(sum(profit), 2) AS total_profit,
       round(max(profit), 2) AS best_item,
       round(min(profit), 2) AS worst_item,
       CAST(sum(CASE WHEN profit > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_profitable
FROM mapped
GROUP BY l_returnflag
"""


@q("scripted_metric_profit", _SCRIPTED_ORACLE)
def _scripted_metric_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``scripted_metric`` aggregation: a per-document map script
    (``profit = price*(1-discount) - price*tax``) with algebraic
    combine/reduce phases (sum, max, min, profitable-count) per
    returnflag bucket — the "custom metric the built-in aggs don't
    have" escape hatch.

    Scale shape: the map script is a projection attribute inside the
    scan (whole-stage codegen, no UDF), and every reduce is
    map-side-combinable, so the whole agg is ONE partial-agg shuffle
    on a 3-value key — the same cost envelope as a plain sum. This is
    the honest distributed translation of scripted_metric's
    map/combine/reduce contract; a script that is NOT algebraic (e.g.
    a median) must use the sketch path (operators/sketches.py)
    instead. Money follows the q1 closure discipline
    (``round(sum(expr), 2)`` over cents-exact doubles)."""
    li = _t(spark, sf_dir, "lineitem")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "l_extendedprice"
    ) * F.col("l_tax")
    return (
        li.select("l_returnflag", profit.alias("profit"))
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("profit"), 2).alias("total_profit"),
            F.round(F.max("profit"), 2).alias("best_item"),
            F.round(F.min("profit"), 2).alias("worst_item"),
            F.sum(F.when(F.col("profit") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_profitable"),
        )
    )


# ---------------------------------------------------------------------------
# global + missing buckets: context-scoped terms agg alongside a
# corpus-wide global bucket; missing counts docs lacking an extracted
# field.
# ---------------------------------------------------------------------------

_FIELD_RE = "\\b(spark|vector)\\b"

_GLOBAL_MISSING_ORACLE = f"""
WITH staged AS (
  SELECT lang, n_chars,
         nullif(regexp_extract(text, '{_FIELD_RE}', 1), '') AS field
  FROM documents
),
context AS (
  SELECT lang AS bucket,
         count(*) AS n_docs,
         CAST(sum(CASE WHEN field IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_missing
  FROM staged WHERE n_chars >= 200
  GROUP BY lang
),
g_all AS (
  SELECT '_global_' AS bucket,
         count(*) AS n_docs,
         CAST(sum(CASE WHEN field IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_missing
  FROM staged
)
SELECT * FROM context UNION ALL SELECT * FROM g_all
"""


@q("global_missing_aggs", _GLOBAL_MISSING_ORACLE)
def _global_missing_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``global`` + ``missing`` aggregations in one request: the
    search context filters to docs with >= 200 chars; per-language
    buckets count docs and docs MISSING an extracted field (first
    ``spark|vector`` token — extraction-can-fail is why missing
    exists), while the ``global`` bucket ignores the search context
    and reports corpus-wide totals.

    Scale shape: one scan stages the extraction; the context and
    global branches are two partial-agg shuffles over that scan (AQE
    reuses the exchange where profitable). The field extraction is a
    single JVM regexp per row — no UDF."""
    docs = _t(spark, sf_dir, "documents")
    staged = docs.select(
        "lang",
        "n_chars",
        F.nullif(
            F.regexp_extract(F.col("text"), _FIELD_RE, 1), F.lit("")
        ).alias("field"),
    )
    missing = F.sum(
        F.when(F.col("field").isNull(), 1).otherwise(0)
    ).cast("long")
    context = (
        staged.filter(F.col("n_chars") >= 200)
        .groupBy(F.col("lang").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            missing.alias("n_missing"),
        )
    )
    glob = staged.groupBy(F.lit("_global_").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        missing.alias("n_missing"),
    )
    return context.unionByName(glob)


# ---------------------------------------------------------------------------
# _termvectors: per-document term statistics (term_freq + 1-based
# positions) with corpus-wide doc_freq / total term freq.
# ---------------------------------------------------------------------------

_TV_DOCS = 5

# DuckDB list lambdas index from 1; Spark posexplode is 0-based and
# adds 1 — both sides emit 1-based positions over the SAME
# empty-filtered token stream (the proximity-search convention).
_TERMVECTORS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
  FROM documents
),
pos AS (
  SELECT doc_id, u.term AS term, u.pos AS pos
  FROM (
    SELECT doc_id,
           unnest(list_transform(tk,
               (t, i) -> {{'term': t, 'pos': i}})) AS u
    FROM toks
  )
),
stats AS (
  SELECT term,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
         CAST(count(*) AS BIGINT) AS ttf
  FROM pos GROUP BY term
),
selected AS (
  SELECT doc_id, term,
         CAST(count(*) AS BIGINT) AS term_freq,
         string_agg(pos::VARCHAR, ',' ORDER BY pos) AS positions
  FROM pos WHERE doc_id < {_TV_DOCS}
  GROUP BY doc_id, term
)
SELECT s.doc_id, s.term, s.term_freq, s.positions, st.doc_freq, st.ttf
FROM selected s JOIN stats st USING (term)
"""


@q("termvectors_docs", _TERMVECTORS_ORACLE)
def _termvectors_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``_termvectors`` API (with ``term_statistics: true``): for
    each requested document, every term with its in-doc frequency and
    1-based position list, plus corpus-wide doc_freq and total term
    frequency — the relevance-debugging view of the inverted index.

    Scale shape: corpus term statistics are ONE partial-agg shuffle of
    (term, doc_id)-sized pairs (these are exactly the postings the
    text index in sinks/textindex.py stores — against a built index
    this query is a pruned read); the per-document side explodes only
    the requested docs. Positions join to a canonical comma string via
    sort_array so collect order can't leak in."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(
            F.split(F.col("text"), r"\s+"), lambda t: t != ""
        ).alias("tk"),
    )
    pos = toks.select(
        "doc_id", F.posexplode(F.col("tk")).alias("pos0", "term")
    ).select("doc_id", "term", (F.col("pos0") + 1).alias("pos"))
    stats = pos.groupBy("term").agg(
        F.countDistinct("doc_id").alias("doc_freq"),
        F.count(F.lit(1)).alias("ttf"),
    )
    selected = (
        pos.filter(F.col("doc_id") < _TV_DOCS)
        .groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).alias("term_freq"),
            F.array_join(
                F.sort_array(F.collect_list("pos")), ","
            ).alias("positions"),
        )
    )
    return selected.join(stats, "term").select(
        "doc_id", "term", "term_freq", "positions", "doc_freq", "ttf"
    )


# ---------------------------------------------------------------------------
# Ingest pipeline: declarative processor chain applied at index time.
# ---------------------------------------------------------------------------

_INGEST_PIPELINE = [
    {"rename": {"field": "event_type", "target_field": "type"}},
    {"uppercase": {"field": "type"}},
    {"set": {"field": "pipeline_ver", "value": "v2"}},
    {"copy": {"field": "raw_props", "from": "props"}},
    {"gsub": {"field": "props", "pattern": "[\\s\"{}]+", "replacement": ""}},
    {"convert": {"field": "user_id", "type": "string"}},
    {
        "date": {
            "field": "ts",
            "target_field": "day",
            "output_format": "yyyy-MM-dd",
        }
    },
    {"remove": {"field": "value"}},
    {"remove": {"field": "ts"}},
]

_INGEST_ORACLE = """
SELECT event_id,
       CAST(user_id AS VARCHAR) AS user_id,
       upper(event_type) AS type,
       regexp_replace(props, '[\\s"{}]+', '', 'g') AS props,
       'v2' AS pipeline_ver,
       props AS raw_props,
       strftime(ts, '%Y-%m-%d') AS day
FROM events
"""


@q("ingest_pipeline_events", _INGEST_ORACLE)
def _ingest_pipeline_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ingest pipeline (PUT _ingest/pipeline) applied to the event
    stream: rename+uppercase the type, stamp a pipeline version, keep
    the raw props beside a gsub-cleaned copy, stringify the user id,
    derive the day field (the index-routing date), drop the scored
    value — a representative everyday processor chain, interpreted by
    operators/ingest.py.

    Scale shape: the WHOLE chain compiles to one narrow projection
    (every processor is a Column expression folded left-to-right), so
    a 40-processor pipeline costs the same single codegen'd scan as
    one processor — no per-processor passes, no UDFs."""
    from ..operators.ingest import apply_ingest_pipeline

    ev = _t(spark, sf_dir, "events")
    return apply_ingest_pipeline(ev, _INGEST_PIPELINE)


# ---------------------------------------------------------------------------
# Ingest pipeline with the grok processor: parse-at-index-time.
# ---------------------------------------------------------------------------

from ..grok import default_grok as _default_grok
from ..grok.spark import duckdb_exprs as _duckdb_exprs

_IGROK = _default_grok()
_IGROK.add_pattern(
    "EVLINE", r"^%{WORD:etype} uid=%{INT:uid:int} v=%{NUMBER:val_s}$"
)

_EVLINE = r"^%{WORD:etype} uid=%{INT:uid:int} v=%{NUMBER:val_s}$"

_INGEST_GROK_PIPELINE = [
    {
        "grok": {
            "field": "line",
            "patterns": ["%{EVLINE}"],
            "pattern_definitions": {"EVLINE": _EVLINE},
        }
    },
    {"convert": {"field": "val_s", "type": "double",
                 "ignore_failure": True}},
    {"rename": {"field": "val_s", "target_field": "val"}},
    {"uppercase": {"field": "etype"}},
    {"remove": {"field": "line"}},
]


def _ingest_grok_oracle() -> str:
    exprs = _duckdb_exprs(_IGROK, "line", "EVLINE")
    raw = {e.rsplit(" AS ", 1)[1]: e.rsplit(" AS ", 1)[0] for e in exprs}
    rx = _IGROK.compile("EVLINE").regex.replace("'", "''")
    # Spark's packed-capture parse yields NULL captures on non-match
    # (grok/spark.grok_parse_many); DuckDB regexp_extract yields '' —
    # guard every capture with the match predicate
    return f"""
WITH s AS (
  SELECT event_id,
         CASE WHEN event_type = 'error'
              THEN 'malformed ' || props
              ELSE event_type || ' uid=' || CAST(user_id AS VARCHAR)
                   || ' v=' || CAST(round(value, 3) AS VARCHAR) END AS line
  FROM events
),
m AS (SELECT event_id, line, regexp_matches(line, '{rx}') AS ok FROM s)
SELECT event_id,
       CASE WHEN ok THEN upper({raw['etype']}) END AS etype,
       CASE WHEN ok THEN {raw['uid']} END AS uid,
       CASE WHEN ok
            THEN CAST(NULLIF({raw['val_s']}, '') AS DOUBLE) END AS val
FROM m
"""


@q("ingest_grok_events", _ingest_grok_oracle())
def _ingest_grok_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest ``grok`` processor — THE on-theme processor for this
    reference (its whole job is grok parsing, main.go:396,402) — in a
    realistic parse-at-index-time chain: grok a log line into typed
    captures (WORD/INT/NUMBER), convert + rename + uppercase the
    results, drop the raw line. ``error`` events carry a deliberately
    malformed line: the processor emits NULL captures for them (the
    engine's match-or-empty F5 contract, where ES would route to
    on_failure) and the downstream processors tolerate the NULLs.

    Scale shape: the grok stage is the single-pass packed-capture
    rewrite (ONE regex evaluation per row, grok/spark.grok_parse_many)
    between two narrow projections — zero shuffles, zero Python; the
    oracle regex is GENERATED from the same compiled pattern so both
    engines agree by construction."""
    from ..operators.ingest import apply_ingest_pipeline

    ev = _t(spark, sf_dir, "events")
    lined = ev.select(
        "event_id",
        F.when(
            F.col("event_type") == "error",
            F.concat(F.lit("malformed "), F.col("props")),
        )
        .otherwise(
            F.concat(
                F.col("event_type"),
                F.lit(" uid="),
                F.col("user_id").cast("string"),
                F.lit(" v="),
                F.round(F.col("value"), 3).cast("string"),
            )
        )
        .alias("line"),
    )
    return apply_ingest_pipeline(lined, _INGEST_GROK_PIPELINE)


# ---------------------------------------------------------------------------
# extended_stats: the full ES moment family per bucket.
# ---------------------------------------------------------------------------

_EXT_STATS_ORACLE = """
WITH staged AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x FROM lineitem
),
sums AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM staged GROUP BY l_returnflag
)
SELECT l_returnflag, n, sx AS sum_qty, sxx AS sum_of_squares,
       round(sxd / nd, 9) AS avg_qty,
       round((nd * sxxd - sxd * sxd) / (nd * nd), 9) AS variance_pop,
       round(sqrt((nd * sxxd - sxd * sxd) / (nd * nd)), 9) AS std_dev,
       round(sxd / nd + 2 * sqrt((nd * sxxd - sxd * sxd) / (nd * nd)), 9)
         AS std_upper,
       round(sxd / nd - 2 * sqrt((nd * sxxd - sxd * sxd) / (nd * nd)), 9)
         AS std_lower
FROM (SELECT *, CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
             CAST(sxx AS DOUBLE) AS sxxd
      FROM sums)
"""


@q("extended_stats_quantity", _EXT_STATS_ORACLE)
def _extended_stats_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``extended_stats`` aggregation per returnflag: count, sum,
    sum_of_squares, avg, POPULATION variance/std-deviation (ES's
    default), and the sigma=2 std_deviation_bounds — the anomaly-band
    aggregation ES dashboards lean on.

    Scale shape: one partial-aggregated shuffle of three int64 moments
    per bucket (quantity is a whole number, so every sum is exact);
    the moment closures are single IEEE expressions over those
    integers, rounded identically on both engines — the matrix_stats
    discipline."""
    li = _t(spark, sf_dir, "lineitem")
    staged = li.select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("x")
    )
    sums = staged.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    sxxd = F.col("sxx").cast("double")
    var = (nd * sxxd - sxd * sxd) / (nd * nd)
    return sums.select(
        "l_returnflag",
        "n",
        F.col("sx").alias("sum_qty"),
        F.col("sxx").alias("sum_of_squares"),
        F.round(sxd / nd, 9).alias("avg_qty"),
        F.round(var, 9).alias("variance_pop"),
        F.round(F.sqrt(var), 9).alias("std_dev"),
        F.round(sxd / nd + 2 * F.sqrt(var), 9).alias("std_upper"),
        F.round(sxd / nd - 2 * F.sqrt(var), 9).alias("std_lower"),
    )


# ---------------------------------------------------------------------------
# rollup search: answer a coarse aggregate FROM the pre-aggregated
# rollup; the fact-level oracle proves the re-aggregation is exact.
# ---------------------------------------------------------------------------

_ROLLUP_SEARCH_ORACLE = """
SELECT strftime(ts, '%Y-%m') AS month,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
             / count(*), 4) AS avg_cents
FROM events
GROUP BY strftime(ts, '%Y-%m'), event_type
"""


@q("rollup_search_monthly", _ROLLUP_SEARCH_ORACLE)
def _rollup_search_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rollup search (the read half of sinks/rollup.py's continuous
    aggregate): the month-level answer is computed FROM the day-level
    rollup — day partials re-aggregate to months, count and cent-sum
    combine exactly, avg closes from the combined partials — while the
    ORACLE computes straight from the facts. The hash match is the
    materialized-view correctness proof: serving from the rollup gives
    bit-identical answers to scanning the raw events.

    Scale shape: the fact scan happens once to build day partials
    (bounded by days x types, the continuous-aggregate state the
    streaming hook maintains incrementally); the month answer is an
    aggregation over that TINY frame. At 100 TB this is the difference
    between scanning 7 years of events per dashboard query and
    re-aggregating a few thousand rollup rows — the entire point of
    ES's rollup/transform machinery."""
    ev = _t(spark, sf_dir, "events")
    day_rollup = (
        ev.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.date_format("ts", "yyyy-MM").alias("month"),
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("vc"),
        )
        .groupBy("day", "month", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("vc").alias("sum_cents"),
        )
    )
    return (
        day_rollup.groupBy("month", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_cents").cast("long").alias("sum_cents"),
        )
        .select(
            "month",
            "event_type",
            "n",
            "sum_cents",
            F.round(
                F.col("sum_cents").cast("double") / F.col("n"), 4
            ).alias("avg_cents"),
        )
    )


# ---------------------------------------------------------------------------
# ES-bulk DataSource sink round trip: write bulk bodies through the
# pluggable writer, read the committed actions back, aggregate.
# ---------------------------------------------------------------------------

_ESBULK_ORACLE = """
SELECT 'docs-' || lang AS es_index,
       count(*) AS n_actions,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang
"""


@q("es_bulk_sink_roundtrip", _ESBULK_ORACLE)
def _es_bulk_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full disk round trip through the pluggable ES-bulk sink
    (sinks/esbulk_sink.py): documents write as bulk-action NDJSON via
    ``format("es_bulk_sim")`` (DataSource V2 commit protocol), the
    COMMITTED actions are read back, and per-index counts/sums must
    match the fact-level oracle — proving the writer loses, duplicates
    and reorders nothing (sum_chars would catch a corrupted _source).

    Scale shape: one narrow projection into per-task NDJSON spills;
    commit messages carry names+counts only (driver never sees doc
    bytes). The read-back is a plain JSON scan of the committed files
    — at 100 TB that is the ES cluster's job; here it closes the
    verification loop."""
    import tempfile
    from pathlib import Path

    from ..sinks.esbulk_sink import write_es_bulk

    sf = Path(sf_dir).name
    root = str(
        Path(tempfile.gettempdir()) / "spark_graft_esbulk" / sf
    )
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(F.lit("docs-"), F.col("lang")).alias("es_index"),
        "n_chars",
    )
    write_es_bulk(docs, root, mode="overwrite")
    # meta/source lines pair positionally inside each committed file;
    # the Arrow reader re-pairs them so count AND per-index char sum
    # come from one pass over the bulk bodies
    return _esbulk_read_back(spark, root)


def _esbulk_read_back(spark: SparkSession, root: str) -> DataFrame:
    """(es_index, n_actions, sum_chars) from the committed bulk files,
    pairing each meta line with its following source line —
    distributed over the committed file list (one task per file;
    driver sees names only)."""
    from pathlib import Path

    files = [str(p) for p in sorted((Path(root) / "bulk").glob("*.ndjson"))]

    def _pairs(it):
        import json as _json

        import pandas as pd

        for pdf in it:
            rows = []
            for path in pdf["path"]:
                with open(path) as f:
                    lines = [ln for ln in f.read().splitlines() if ln]
                for m, s in zip(lines[::2], lines[1::2]):
                    meta = _json.loads(m)["index"]
                    src = _json.loads(s)
                    rows.append(
                        (meta["_index"], int(src["n_chars"]))
                    )
            yield pd.DataFrame(rows, columns=["es_index", "n_chars"])

    paths = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(max(1, len(files)))
    pairs = paths.mapInPandas(_pairs, "es_index string, n_chars long")
    return pairs.groupBy("es_index").agg(
        F.count(F.lit(1)).alias("n_actions"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


# ---------------------------------------------------------------------------
# Query DSL: a representative bool query compiled by the DSL compiler
# (operators/querydsl.py) — term/range/exists/match/phrase/prefix
# under must/must_not/should with minimum_should_match.
# ---------------------------------------------------------------------------

_DSL_QUERY = {
    "bool": {
        "must": [{"range": {"n_chars": {"gte": 150, "lt": 500}}}],
        "filter": [{"exists": {"field": "lang"}}],
        "must_not": [{"term": {"lang": "zh"}}],
        "should": [
            {"match": {"text": "spark window"}},
            {"match_phrase": {"text": "merge batch"}},
            {"prefix": {"source": "src1"}},
        ],
        "minimum_should_match": 2,
    }
}

_QUERYDSL_ORACLE = """
WITH staged AS (
  SELECT doc_id, lang, source, n_chars,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
  FROM documents
)
SELECT doc_id, lang, source, n_chars
FROM staged
WHERE n_chars >= 150 AND n_chars < 500
  AND lang IS NOT NULL
  AND NOT coalesce(lang = 'zh', false)
  AND (
        coalesce((list_contains(tk, 'spark')
                  OR list_contains(tk, 'window'))::INT, 0)
      + coalesce((contains(' ' || array_to_string(tk, ' ') || ' ',
                  ' merge batch '))::INT, 0)
      + coalesce((source LIKE 'src1%')::INT, 0)
      ) >= 2
"""


@q("es_query_dsl_search", _QUERYDSL_ORACLE)
def _es_query_dsl_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES query DSL, compiled (operators/querydsl.py): a bool query
    with a range must, an exists filter, a term must_not, and three
    should clauses (analyzed match, match_phrase, prefix) under
    ``minimum_should_match: 2`` — the everyday filter-context JSON an
    ES user would POST, lowered to ONE Catalyst predicate.

    Scale shape: the whole tree is one boolean expression — the
    n_chars range and lang conjuncts push into the parquet scan
    (PushedFilters), the token tests evaluate in codegen, and the
    should-count is an integer sum of flags. A 50-clause bool costs
    one scan, zero joins; this is the query-side twin of the ingest
    interpreter."""
    from ..operators.querydsl import apply_query

    docs = _t(spark, sf_dir, "documents")
    return apply_query(docs, _DSL_QUERY).select(
        "doc_id", "lang", "source", "n_chars"
    )


# ---------------------------------------------------------------------------
# Aggregation DSL: a nested aggs tree (date_histogram > terms with
# metric leaves) compiled by operators/aggsdsl.py.
# ---------------------------------------------------------------------------

_AGGS_TREE = {
    "per_day": {
        "date_histogram": {"field": "ts", "calendar_interval": "day"},
        "aggs": {
            "per_type": {
                "terms": {"field": "event_type"},
                "aggs": {
                    "total_cents": {"sum": {"field": "vc"}},
                    "users": {"cardinality": {"field": "user_id"}},
                    "worst_cents": {"min": {"field": "vc"}},
                },
            }
        },
    }
}

_AGGSDSL_ORACLE = """
SELECT 'per_day' AS agg_path,
       strftime(ts, '%Y-%m-%d') AS per_day,
       NULL AS per_type,
       count(*) AS doc_count,
       NULL AS total_cents, NULL AS users, NULL AS worst_cents
FROM events
GROUP BY 2
UNION ALL
SELECT 'per_day>per_type' AS agg_path,
       strftime(ts, '%Y-%m-%d') AS per_day,
       event_type AS per_type,
       count(*) AS doc_count,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(count(DISTINCT user_id) AS BIGINT) AS users,
       CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS worst_cents
FROM events
GROUP BY 2, 3
"""


@q("es_aggs_dsl_daily", _AGGSDSL_ORACLE)
def _es_aggs_dsl_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES aggregation DSL, compiled (operators/aggsdsl.py): a
    ``date_histogram > terms`` bucket chain with sum / exact
    cardinality / min metric leaves — the everyday dashboard request
    body, with ES's own per-level semantics: the response carries a
    row per day (the outer buckets with their own doc_count) AND a row
    per (day, type) with the metric leaves.

    Scale shape: BOTH levels compute in one groupingSets pass — a
    single partial-aggregated shuffle with an Expand, not a scan per
    level (count/sum/min combine map-side; the exact countDistinct is
    the one expansion — the HLL sketch in operators/sketches.py is the
    100 TB swap-in, exactly ES's precision_threshold trade)."""
    from ..operators.aggsdsl import apply_aggs

    ev = _t(spark, sf_dir, "events").withColumn(
        "vc", F.round(F.col("value") * 100).cast("long")
    )
    out = apply_aggs(ev, _AGGS_TREE)
    return out.select(
        "agg_path",
        "per_day",
        "per_type",
        "doc_count",
        F.col("total_cents").cast("long").alias("total_cents"),
        F.col("users").cast("long").alias("users"),
        F.col("worst_cents").cast("long").alias("worst_cents"),
    )


# ---------------------------------------------------------------------------
# Full _search request: query + aggs composed (the actual POST body an
# ES user sends), via run_search_body.
# ---------------------------------------------------------------------------

_SEARCH_BODY = {
    "query": {
        "bool": {
            "must": [{"terms": {"event_type": ["click", "view", "purchase"]}}],
            "must_not": [{"range": {"vc": {"lt": 0}}}],
        }
    },
    "aggs": {
        "per_type": {
            "terms": {"field": "event_type"},
            "aggs": {
                "revenue_cents": {"sum": {"field": "vc"}},
                "biggest_cents": {"max": {"field": "vc"}},
            },
        }
    },
}

_SEARCH_REQ_ORACLE = """
SELECT 'per_type' AS agg_path,
       event_type AS per_type,
       count(*) AS doc_count,
       CAST(sum(vc) AS BIGINT) AS revenue_cents,
       CAST(max(vc) AS BIGINT) AS biggest_cents
FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
      FROM events)
WHERE event_type IN ('click', 'view', 'purchase')
  AND NOT (vc < 0)
GROUP BY event_type
"""


@q("es_search_request", _SEARCH_REQ_ORACLE)
def _es_search_request(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A complete ES ``_search`` POST body — query (bool with terms +
    negated range) AND aggs (terms bucket with sum/max leaves) —
    executed by run_search_body: aggregations over the query-filtered
    set, exactly ES's composition. The two interpreters fuse into ONE
    plan: pushable query conjuncts reach the scan, the agg tree is a
    single partial-agg shuffle."""
    from ..operators.querydsl import run_search_body

    ev = _t(spark, sf_dir, "events").withColumn(
        "vc", F.round(F.col("value") * 100).cast("long")
    )
    out = run_search_body(ev, _SEARCH_BODY)
    return out.select(
        "agg_path",
        "per_type",
        "doc_count",
        F.col("revenue_cents").cast("long").alias("revenue_cents"),
        F.col("biggest_cents").cast("long").alias("biggest_cents"),
    )


# ---------------------------------------------------------------------------
# ingest dissect + kv processors (round 4): fixed-delimiter log
# splitting and key-value extraction through the pipeline compiler.
# ---------------------------------------------------------------------------

_DISSECT_KV_ORACLE = r"""
WITH staged AS (
  SELECT event_id,
         'u=' || CAST(user_id AS VARCHAR)
           || '&t=' || event_type
           || '&c=' || CAST(CAST(round(value * 100) AS BIGINT)
                            AS VARCHAR) AS kvline,
         CAST(user_id AS VARCHAR) || ' ' || event_type || ' '
           || strftime(ts, '%Y-%m-%d') AS logline
  FROM events
),
parsed AS (
  SELECT event_id,
         CASE WHEN regexp_matches(logline, '^(.*?) (.*?) (.*)$')
              THEN regexp_extract(logline, '^(.*?) (.*?) (.*)$', 1)
              END AS who,
         CASE WHEN regexp_matches(logline, '^(.*?) (.*?) (.*)$')
              THEN regexp_extract(logline, '^(.*?) (.*?) (.*)$', 3)
              END AS day,
         regexp_extract(kvline, 'u=([^&]*)', 1) AS ku,
         regexp_extract(kvline, 'c=([^&]*)', 1) AS kc
  FROM staged
)
SELECT day, count(*) AS n,
       CAST(sum(CAST(kc AS BIGINT)) AS BIGINT) AS cents,
       CAST(sum(CASE WHEN who = ku THEN 1 ELSE 0 END) AS BIGINT)
         AS consistent
FROM parsed
GROUP BY day
"""


@q("ingest_dissect_kv_events", _DISSECT_KV_ORACLE)
def _ingest_dissect_kv_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-4 ingest processors end-to-end: a synthesized log
    line goes through ``dissect`` (fixed-delimiter %{} captures, the
    non-grok half of ES log parsing) and a synthesized query string
    through ``kv`` (include_keys plan-time schema), then the pipeline
    output aggregates per day — dissect capture boundaries, kv value
    extraction, and their NULL semantics are all under the value
    hash.

    Scale shape: the whole processor chain is ONE codegen projection
    (zero Python, zero shuffles before the final partial-agg
    groupBy)."""
    from ..operators.ingest import apply_ingest_pipeline

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.concat(
            F.lit("u="), F.col("user_id").cast("string"),
            F.lit("&t="), F.col("event_type"),
            F.lit("&c="),
            F.round(F.col("value") * 100).cast("long").cast("string"),
        ).alias("kvline"),
        F.concat(
            F.col("user_id").cast("string"), F.lit(" "),
            F.col("event_type"), F.lit(" "),
            F.date_format("ts", "yyyy-MM-dd"),
        ).alias("logline"),
    )
    out = apply_ingest_pipeline(ev, [
        {"dissect": {"field": "logline",
                     "pattern": "%{who} %{?etype} %{day}"}},
        {"kv": {"field": "kvline", "field_split": "&",
                "value_split": "=", "include_keys": ["u", "c"],
                "target_field": "kv"}},
    ])
    return out.groupBy("day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("`kv.c`").cast("long")).cast("long").alias("cents"),
        F.sum(
            F.when(F.col("who") == F.col("`kv.u`"), 1).otherwise(0)
        ).cast("long").alias("consistent"),
    )
