"""Full ES ``_search`` request bodies through the composed
interpreters (operators/querydsl.run_search_body +
operators/aggsdsl.apply_aggs): pipeline aggregations, filters /
missing / global buckets, top_hits, ES-exact overlapping ranges,
bucket_selector / bucket_sort pruning, BM25-scored hits, and the
``_doc`` tie-break — each the literal JSON body an ES user POSTs,
executed end-to-end and value-checked against a DuckDB oracle.

These close the round-3 interpreter gap: every construct here already
existed as a standalone lowering (plans/pipelineaggs.py,
plans/esaggstail*.py, plans/evalqa.explain_bm25_doc); now a user
sending the REQUEST BODY gets the same lowering through the
interpreter instead of a plan-time ValueError.

Reference context: the reference ships envelopes into Elasticsearch
(main.go sink wiring); these are the dashboards its users run on the
other side.

Float discipline (house rule): values stage through exact integer
cents per row; the only float ops are identical IEEE expressions
rounded the same on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .declared import _t, q

_K1 = 1.2
_B = 0.75


def _ev_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").withColumn(
        "vc", F.round(F.col("value") * 100).cast("long")
    )


# ---------------------------------------------------------------------------
# 1. Pipeline aggregations INSIDE a request body.
# ---------------------------------------------------------------------------

_PIPELINE_BODY = {
    "query": {"terms": {"event_type": ["click", "view", "purchase"]}},
    "aggs": {
        "per_day": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {
                "cents": {"sum": {"field": "vc"}},
                "cum_cents": {"cumulative_sum": {"buckets_path": "cents"}},
                "delta_cents": {"derivative": {"buckets_path": "cents"}},
                "wow_cents": {
                    "serial_diff": {"buckets_path": "cents", "lag": 7}
                },
                "trail3": {
                    "moving_fn": {
                        "buckets_path": "cents",
                        "window": 3,
                        "script": "MovingFunctions.unweightedAvg(values)",
                    }
                },
                "per_doc": {
                    "bucket_script": {
                        "buckets_path": {"c": "cents", "n": "_count"},
                        "script": "params.c / params.n",
                    }
                },
            },
        }
    },
}

_PIPELINE_ORACLE = """
WITH buckets AS (
  SELECT strftime(ts, '%Y-%m-%d') AS per_day,
         count(*) AS doc_count,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events
  WHERE event_type IN ('click', 'view', 'purchase')
  GROUP BY 1
)
SELECT 'per_day' AS agg_path, per_day, doc_count, cents,
       CAST(sum(cents) OVER w AS BIGINT) AS cum_cents,
       cents - lag(cents) OVER w AS delta_cents,
       cents - lag(cents, 7) OVER w AS wow_cents,
       round(avg(cents) OVER w3, 4) AS trail3,
       round(cents / CAST(doc_count AS DOUBLE), 4) AS per_doc
FROM buckets
WINDOW w AS (ORDER BY per_day),
       w3 AS (ORDER BY per_day ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
ORDER BY per_day
"""


@q("es_search_request_pipeline", _PIPELINE_ORACLE)
def _es_search_request_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A request body whose ``aggs`` carry the full pipeline-agg
    family — ``cumulative_sum`` / ``derivative`` / ``serial_diff``
    (lag 7, week-over-week) / ``moving_fn`` (trailing window 3,
    current bucket excluded, ES's default shift) / ``bucket_script``
    — executed through run_search_body, not as standalone lowerings.

    Scale shape: ONE partial-aggregated shuffle builds the daily
    bucket frame (pushable query conjuncts reach the scan); all five
    pipeline aggs are windows over that KB-sized frame sharing a
    single sort. First-bucket semantics match ES: derivative /
    serial_diff null until lag rows exist, moving_fn null on an empty
    trailing window."""
    from ..operators.querydsl import run_search_body

    out = run_search_body(_ev_cents(spark, sf_dir), _PIPELINE_BODY)
    return out.select(
        "agg_path",
        "per_day",
        "doc_count",
        F.col("cents").cast("long").alias("cents"),
        F.col("cum_cents").cast("long").alias("cum_cents"),
        F.col("delta_cents").cast("long").alias("delta_cents"),
        F.col("wow_cents").cast("long").alias("wow_cents"),
        F.round("trail3", 4).alias("trail3"),
        F.round("per_doc", 4).alias("per_doc"),
    ).orderBy("per_day")


# ---------------------------------------------------------------------------
# 2. filters + missing buckets with their own metrics.
# ---------------------------------------------------------------------------

_FILTERS_BODY = {
    "query": {"exists": {"field": "text"}},
    "aggs": {
        "length_class": {
            "filters": {
                "filters": {
                    "short": {"range": {"n_chars": {"lt": 200}}},
                    "long": {"range": {"n_chars": {"gte": 200}}},
                    "has_the": {"match": {"text": "the"}},
                }
            },
            "aggs": {
                "chars": {"sum": {"field": "n_chars"}},
                "langs": {"cardinality": {"field": "lang"}},
            },
        },
        "no_lang": {
            "missing": {"field": "lang"},
            "aggs": {"miss_chars": {"sum": {"field": "n_chars"}}},
        },
    },
}

_FILTERS_ORACLE = """
WITH d AS (SELECT * FROM documents WHERE text IS NOT NULL)
SELECT 'length_class' AS agg_path, 'short' AS length_class,
       count(*) AS doc_count,
       CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS langs,
       NULL AS miss_chars
FROM d WHERE n_chars < 200
UNION ALL
SELECT 'length_class', 'long', count(*),
       CAST(coalesce(sum(n_chars), 0) AS BIGINT),
       CAST(count(DISTINCT lang) AS BIGINT), NULL
FROM d WHERE n_chars >= 200
UNION ALL
SELECT 'length_class', 'has_the', count(*),
       CAST(coalesce(sum(n_chars), 0) AS BIGINT),
       CAST(count(DISTINCT lang) AS BIGINT), NULL
FROM d
WHERE list_contains(
        list_filter(string_split_regex(text, '\\s+'), x -> x <> ''),
        'the')
UNION ALL
SELECT 'no_lang', NULL, count(*), NULL, NULL,
       CAST(sum(n_chars) AS BIGINT)
FROM d WHERE lang IS NULL
"""


@q("es_search_request_filters", _FILTERS_ORACLE)
def _es_search_request_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A request body with a named ``filters`` aggregation (a doc
    lands in EVERY filter it matches — range bands overlap with the
    token filter) and a sibling ``missing`` bucket, each with its own
    metric leaves, through run_search_body. The ``missing`` bucket is
    honestly empty on this corpus (doc_count 0, zero-filled sum) —
    ES reports the empty bucket rather than omitting it.

    Scale shape: each filter is ONE compiled predicate inside the
    explode array — the corpus scans once per frame signature
    (filters and missing differ), never once per filter."""
    from ..operators.querydsl import run_search_body

    out = run_search_body(_t(spark, sf_dir, "documents"), _FILTERS_BODY)
    return out.select(
        "agg_path",
        "length_class",
        "doc_count",
        F.col("chars").cast("long").alias("chars"),
        F.col("langs").cast("long").alias("langs"),
        F.col("miss_chars").cast("long").alias("miss_chars"),
    )


# ---------------------------------------------------------------------------
# 3. global escape + top_hits.
# ---------------------------------------------------------------------------

_GLOBAL_BODY = {
    "query": {"term": {"event_type": "purchase"}},
    "aggs": {
        "by_type": {
            "terms": {"field": "event_type"},
            "aggs": {
                "best": {
                    "top_hits": {
                        "size": 2,
                        "sort": [
                            {"vc": {"order": "desc"}},
                            {"event_id": {"order": "asc"}},
                        ],
                        "_source": ["event_id", "vc"],
                    }
                }
            },
        },
        "all_docs": {
            "global": {},
            "aggs": {"total_cents": {"sum": {"field": "vc"}}},
        },
    },
}

_GLOBAL_ORACLE = """
WITH s AS (SELECT event_id, event_type,
                  CAST(round(value * 100) AS BIGINT) AS vc
           FROM events),
p AS (SELECT * FROM s WHERE event_type = 'purchase'),
ranked AS (
  SELECT event_type, event_id, vc,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY vc DESC, event_id) AS rn,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM p
)
SELECT 'by_type' AS agg_path, event_type AS by_type, n AS doc_count,
       CAST(rn AS BIGINT) AS hit_rank, event_id AS hit_id,
       vc AS hit_cents, NULL AS total_cents
FROM ranked WHERE rn <= 2
UNION ALL
SELECT 'all_docs', NULL, CAST(count(*) AS BIGINT), NULL, NULL, NULL,
       CAST(sum(vc) AS BIGINT)
FROM s
"""


@q("es_search_request_global_tophits", _GLOBAL_ORACLE)
def _es_search_request_global_tophits(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """A request body combining ``top_hits`` (the two best purchases
    per bucket, deterministic (cents desc, id) sort) with a ``global``
    bucket whose metric escapes the query filter — exactly ES's "show
    the filtered winners next to the unfiltered total" idiom, through
    run_search_body. The hit arrays are exploded to rows for the
    oracle comparison.

    Scale shape: top_hits is a per-bucket window (row_number <= 2)
    over the filtered frame — no collect of full buckets; the global
    branch is one map-side-combined sum over the base frame."""
    from ..operators.querydsl import run_search_body

    ev = _ev_cents(spark, sf_dir)
    out = run_search_body(ev, _GLOBAL_BODY)
    return out.select(
        "agg_path",
        "by_type",
        "doc_count",
        F.posexplode_outer("best"),
        F.col("total_cents").cast("long").alias("total_cents"),
    ).select(
        "agg_path",
        "by_type",
        "doc_count",
        (F.col("pos") + 1).cast("long").alias("hit_rank"),
        F.col("col.event_id").alias("hit_id"),
        F.col("col.vc").alias("hit_cents"),
        "total_cents",
    )


# ---------------------------------------------------------------------------
# 4. ES-exact overlapping ranges.
# ---------------------------------------------------------------------------

_RANGES_BODY = {
    "aggs": {
        "bands": {
            "range": {
                "field": "cents",
                "ranges": [
                    {"to": 5000000, "key": "under_50k"},
                    {"from": 2500000, "to": 10000000, "key": "mid"},
                    {"from": 5000000, "key": "over_50k"},
                    {"from": 90000000, "key": "never"},
                ],
            },
            "aggs": {
                "total": {"sum": {"field": "cents"}},
                "biggest": {"max": {"field": "cents"}},
            },
        }
    }
}

_RANGES_ORACLE = """
WITH s AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders)
SELECT 'bands' AS agg_path, 'under_50k' AS bands, count(*) AS doc_count,
       CAST(coalesce(sum(cents), 0) AS BIGINT) AS total,
       CAST(max(cents) AS BIGINT) AS biggest
FROM s WHERE cents < 5000000
UNION ALL
SELECT 'bands', 'mid', count(*), CAST(coalesce(sum(cents), 0) AS BIGINT),
       CAST(max(cents) AS BIGINT)
FROM s WHERE cents >= 2500000 AND cents < 10000000
UNION ALL
SELECT 'bands', 'over_50k', count(*),
       CAST(coalesce(sum(cents), 0) AS BIGINT), CAST(max(cents) AS BIGINT)
FROM s WHERE cents >= 5000000
UNION ALL
SELECT 'bands', 'never', count(*), CAST(coalesce(sum(cents), 0) AS BIGINT),
       CAST(max(cents) AS BIGINT)
FROM s WHERE cents >= 90000000
"""


@q("es_search_request_ranges", _RANGES_ORACLE)
def _es_search_request_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELIBERATELY overlapping ``range`` buckets (mid overlaps both
    neighbors) plus a requested-but-empty band: ES duplicates a doc
    into every matching range, emits the empty range with doc_count 0
    (additive metrics zero-filled, max NULL), and produces NO bucket
    for out-of-range docs — the explode lowering is ES-exact, not
    first-match CASE assignment.

    Scale shape: one explode of a per-row label array (a doc
    multiplies only by its matching-band count) + one partial-agg
    shuffle on (band); the zero-fill is a broadcast join against the
    4-row requested-band frame."""
    from ..operators.aggsdsl import apply_aggs

    orders = _t(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    out = apply_aggs(orders, _RANGES_BODY["aggs"])
    return out.select(
        "agg_path",
        "bands",
        "doc_count",
        F.col("total").cast("long").alias("total"),
        F.col("biggest").cast("long").alias("biggest"),
    )


# ---------------------------------------------------------------------------
# 5. bucket_selector + bucket_sort with descendant pruning.
# ---------------------------------------------------------------------------

_SELECTOR_BODY = {
    "query": {"terms": {"event_type": ["click", "view", "purchase"]}},
    "aggs": {
        "per_day": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {
                "cents": {"sum": {"field": "vc"}},
                "busy_only": {
                    "bucket_selector": {
                        "buckets_path": {"n": "_count"},
                        "script": "params.n >= 20",
                    }
                },
                "top5": {
                    "bucket_sort": {
                        "sort": [{"cents": {"order": "desc"}}],
                        "size": 5,
                    }
                },
                "per_type": {"terms": {"field": "event_type"}},
            },
        }
    },
}

_SELECTOR_ORACLE = """
WITH f AS (
  SELECT strftime(ts, '%Y-%m-%d') AS per_day, event_type,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events WHERE event_type IN ('click', 'view', 'purchase')
),
days AS (
  SELECT per_day, count(*) AS doc_count,
         CAST(sum(vc) AS BIGINT) AS cents
  FROM f GROUP BY 1
),
kept AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (ORDER BY cents DESC, per_day) AS rn
    FROM days WHERE doc_count >= 20
  ) WHERE rn <= 5
)
SELECT 'per_day' AS agg_path, per_day, NULL AS per_type,
       doc_count, cents
FROM kept
UNION ALL
SELECT 'per_day>per_type', t.per_day, t.event_type,
       count(*), NULL
FROM f t JOIN kept k USING (per_day)
GROUP BY 2, 3
"""


@q("es_search_request_selector", _SELECTOR_ORACLE)
def _es_search_request_selector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``bucket_selector`` (keep days with >= 20 docs) chained with
    ``bucket_sort`` (top-5 days by revenue) in one request body, with
    a nested ``terms`` level UNDER the pruned histogram — ES prunes
    the whole sub-tree of a dropped bucket, so the per-type rows of
    dropped days must vanish too (the descendant semi-join).

    Scale shape: the selector/sort are a filter + row_number window
    over the daily bucket frame; descendant pruning is a broadcast
    semi-join of the (<= 5 row) surviving-day frame against the
    per-type level."""
    from ..operators.querydsl import run_search_body

    out = run_search_body(_ev_cents(spark, sf_dir), _SELECTOR_BODY)
    return out.select(
        "agg_path",
        "per_day",
        "per_type",
        "doc_count",
        F.col("cents").cast("long").alias("cents"),
    )


# ---------------------------------------------------------------------------
# 6. BM25-scored hits through the request body.
# ---------------------------------------------------------------------------

_SCORED_TERMS = ("merge", "scan", "vector")

_SCORED_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
  FROM documents
),
withlen AS (SELECT doc_id, tk, len(tk) AS dl FROM toks),
stats AS (
  SELECT CAST(count(*) FILTER (WHERE len(tk) > 0) AS BIGINT) AS n_docs,
         CAST(sum(len(tk)) FILTER (WHERE len(tk) > 0) AS BIGINT)
           AS total_len
  FROM toks
),
dfreq AS (
  SELECT
    CAST(count(*) FILTER (WHERE list_contains(tk, 'merge')) AS BIGINT)
      AS df_0,
    CAST(count(*) FILTER (WHERE list_contains(tk, 'scan')) AS BIGINT)
      AS df_1,
    CAST(count(*) FILTER (WHERE list_contains(tk, 'vector')) AS BIGINT)
      AS df_2
  FROM toks
),
scored AS (
  SELECT w.doc_id, w.dl,
    len(list_filter(w.tk, x -> x = 'merge')) AS tf_0,
    len(list_filter(w.tk, x -> x = 'scan')) AS tf_1,
    len(list_filter(w.tk, x -> x = 'vector')) AS tf_2,
    s.n_docs, s.total_len, d.df_0, d.df_1, d.df_2
  FROM withlen w CROSS JOIN stats s CROSS JOIN dfreq d
  WHERE tf_0 > 0 OR tf_1 > 0 OR tf_2 > 0
),
formula AS (
  SELECT doc_id,
    0.0
    + CASE WHEN tf_0 > 0 THEN
        ln(1 + (n_docs - df_0 + 0.5) / (df_0 + 0.5))
        * (tf_0 * (1 + {_K1}))
        / (tf_0 + {_K1} * (1 - {_B} + {_B}
           * (dl / (CAST(total_len AS DOUBLE) / n_docs))))
      ELSE 0.0 END
    + CASE WHEN tf_1 > 0 THEN
        ln(1 + (n_docs - df_1 + 0.5) / (df_1 + 0.5))
        * (tf_1 * (1 + {_K1}))
        / (tf_1 + {_K1} * (1 - {_B} + {_B}
           * (dl / (CAST(total_len AS DOUBLE) / n_docs))))
      ELSE 0.0 END
    + CASE WHEN tf_2 > 0 THEN
        ln(1 + (n_docs - df_2 + 0.5) / (df_2 + 0.5))
        * (tf_2 * (1 + {_K1}))
        / (tf_2 + {_K1} * (1 - {_B} + {_B}
           * (dl / (CAST(total_len AS DOUBLE) / n_docs))))
      ELSE 0.0 END AS raw_score
  FROM scored
)
SELECT doc_id, round(raw_score, 6) AS score
FROM formula
ORDER BY raw_score DESC, doc_id
LIMIT 20
"""


@q("es_search_scored", _SCORED_ORACLE)
def _es_search_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A ``match`` query returning SCORE-ORDERED hits — the body has
    no ``sort``, so ES's default ``_score desc`` applies and
    run_search_body computes the real Lucene practical BM25 (k1=1.2,
    b=0.75, field statistics over docs that have the field) with the
    ``doc_id`` tie-break; top-20 with scores.

    Scale shape: ONE broadcast-sized stats aggregation (N, total
    length, df per query term) + a closed-form codegen score per doc
    + TakeOrdered(20) — documents never shuffle; this is the
    index-free scan form of sinks/textindex.bm25_topk."""
    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    out = run_search_body(
        docs,
        {
            "query": {"match": {"text": " ".join(_SCORED_TERMS)}},
            "size": 20,
            "_source": ["doc_id"],
        },
    )
    return out.select("doc_id", F.round("_score", 6).alias("score"))


# ---------------------------------------------------------------------------
# 7. Deliberately tied sort keys: the _doc tie-break.
# ---------------------------------------------------------------------------

_TIED_ORACLE = """
SELECT doc_id, lang FROM documents
ORDER BY lang, doc_id
LIMIT 15
"""


@q("es_search_tied_sort", _TIED_ORACLE)
def _es_search_tied_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A hit list sorted by a LOW-CARDINALITY key (``lang`` — dozens
    of ties at the size boundary on purpose): without a tie-break the
    selected top-15 SET would be partitioning-dependent;
    run_search_body appends the ``doc_id`` ``_doc`` tie-break so both
    engines pick the identical set in the identical order.

    Scale shape: TakeOrdered(15) on (lang, doc_id) — no shuffle
    beyond the top-k reduction."""
    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    return run_search_body(
        docs,
        {
            "query": {"match_all": {}},
            "sort": [{"lang": {"order": "asc"}}],
            "size": 15,
            "_source": ["doc_id", "lang"],
        },
    )


# ---------------------------------------------------------------------------
# 8. Round-4 query leaves: ids / regexp / fuzzy / terms_set composed
#    under dis_max / constant_score inside one bool request.
# ---------------------------------------------------------------------------

_LEAVES_ORACLE = r"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE (regexp_full_match(lang, 'e[sn]')
       OR levenshtein(source, 'src3') <= 1)
  AND (CAST(list_contains(string_split_regex(text, '\s+'),
                          'spark') AS INT)
       + CAST(list_contains(string_split_regex(text, '\s+'),
                            'window') AS INT)
       + CAST(list_contains(string_split_regex(text, '\s+'),
                            'merge') AS INT)) >= 2
  AND doc_id NOT IN (0, 1, 2, 3, 4)
ORDER BY n_chars DESC, doc_id
LIMIT 25
"""


@q("es_search_new_leaves", _LEAVES_ORACLE)
def _es_search_new_leaves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One request body exercising the round-4 query-DSL leaves:
    ``dis_max`` over an ANCHORED ``regexp`` (``e[sn]`` must not match
    longer values) and a ``fuzzy`` (Levenshtein <= 1 against the
    keyword ``source``), AND a ``constant_score``-wrapped
    ``terms_set`` (at least 2 of 3 analyzed tokens, constant script
    m), AND a ``must_not`` ``ids`` exclusion — all compiled into ONE
    Catalyst predicate (zero joins, zero UDFs), then sorted with the
    ``_doc`` tie-break.

    Reference context: these are the remaining everyday Lucene leaf
    queries a Kibana user runs against the shipped indices
    (main.go sink wiring)."""
    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    return run_search_body(
        docs,
        {
            "query": {"bool": {
                "must": [
                    {"dis_max": {"queries": [
                        {"regexp": {"lang": "e[sn]"}},
                        {"fuzzy": {"source": {"value": "src3",
                                              "fuzziness": 1}}},
                    ]}},
                    {"constant_score": {"filter": {"terms_set": {"text": {
                        "terms": ["spark", "window", "merge"],
                        "minimum_should_match_script": {"source": "2"},
                    }}}}},
                ],
                "must_not": [{"ids": {"values": [0, 1, 2, 3, 4]}}],
            }},
            "sort": [{"n_chars": {"order": "desc"}}],
            "size": 25,
            "_source": ["doc_id", "lang", "source", "n_chars"],
        },
    )


# ---------------------------------------------------------------------------
# 9. Field collapsing: best hit per group, then global top-N.
# ---------------------------------------------------------------------------

_COLLAPSE_ORACLE = """
WITH ranked AS (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents
  WHERE source <> 'src0'
)
SELECT doc_id, lang, n_chars FROM ranked
WHERE rn = 1
ORDER BY n_chars DESC, doc_id
LIMIT 10
"""


@q("es_search_collapse", _COLLAPSE_ORACLE)
def _es_search_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``collapse`` on ``lang``: the hit list keeps only the BEST doc
    per language under the request sort (longest text, ``_doc``
    tie-break), then the global top-10 applies over the group
    winners — ES field collapsing, the dashboard "one result per
    group" idiom.

    Scale shape: one window (partial per-key TakeOrdered) over the
    filtered scan + the global TakeOrdered — documents shuffle once
    by the collapse key, never twice."""
    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    return run_search_body(
        docs,
        {
            "query": {"bool": {"must_not": [
                {"term": {"source": "src0"}}]}},
            "collapse": {"field": "lang"},
            "sort": [{"n_chars": {"order": "desc"}}],
            "size": 10,
            "_source": ["doc_id", "lang", "n_chars"],
        },
    )


# ---------------------------------------------------------------------------
# 10. Scored multi_match over keyword fields (best_fields = max of
#     per-field BM25; single-token fields make the replayed formula
#     exact: tf=1, dl=avgdl=1 -> per-term score == idf).
# ---------------------------------------------------------------------------

_MULTI_MATCH_ORACLE = """
WITH stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (WHERE lang = 'es') AS BIGINT) AS df_les,
         CAST(count(*) FILTER (WHERE lang = 'fr') AS BIGINT) AS df_lfr,
         CAST(count(*) FILTER (WHERE source = 'src3') AS BIGINT) AS df_s3,
         CAST(count(*) FILTER (WHERE source = 'src7') AS BIGINT) AS df_s7
  FROM documents
),
scored AS (
  SELECT d.doc_id, d.lang, d.source,
    (CASE WHEN d.lang = 'es'
          THEN ln(1 + (s.n - s.df_les + 0.5) / (s.df_les + 0.5))
          ELSE 0.0 END
     + CASE WHEN d.lang = 'fr'
            THEN ln(1 + (s.n - s.df_lfr + 0.5) / (s.df_lfr + 0.5))
            ELSE 0.0 END) AS lang_score,
    (CASE WHEN d.source = 'src3'
          THEN ln(1 + (s.n - s.df_s3 + 0.5) / (s.df_s3 + 0.5))
          ELSE 0.0 END
     + CASE WHEN d.source = 'src7'
            THEN ln(1 + (s.n - s.df_s7 + 0.5) / (s.df_s7 + 0.5))
            ELSE 0.0 END) AS source_score
  FROM documents d CROSS JOIN stats s
  WHERE d.lang IN ('es', 'fr') OR d.source IN ('src3', 'src7')
)
SELECT doc_id, round(greatest(lang_score, source_score), 6) AS score
FROM scored
ORDER BY greatest(lang_score, source_score) DESC, doc_id
LIMIT 20
"""


@q("es_search_multi_match", _MULTI_MATCH_ORACLE)
def _es_search_multi_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-ordered ``multi_match`` (best_fields) over two keyword
    fields: each hit's ``_score`` is its best per-field BM25. The
    fields are single-token, so tf=1 and dl=avgdl collapse the
    practical scoring function to the pure idf sum — the oracle
    replays it closed-form, proving the interpreter's best_fields max
    and the per-field corpus statistics.

    Scale shape: one broadcast-sized stats row per field + codegen
    score + TakeOrdered(20); documents never shuffle."""
    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    out = run_search_body(
        docs,
        {
            "query": {"multi_match": {"query": "es fr src3 src7",
                                      "fields": ["lang", "source"]}},
            "size": 20,
            "_source": ["doc_id"],
        },
    )
    return out.select("doc_id", F.round("_score", 6).alias("score"))


# ---------------------------------------------------------------------------
# 11. Multi-value metric leaves in a request body: stats /
#     extended_stats / percentiles / weighted_avg per terms bucket.
# ---------------------------------------------------------------------------

_STATS_METRICS_ORACLE = """
SELECT 'per_type' AS agg_path,
       event_type AS per_type,
       count(*) AS doc_count,
       CAST(count(value) AS BIGINT) AS v_count,
       round(min(value), 6) AS v_min,
       round(max(value), 6) AS v_max,
       round(avg(value), 6) AS v_avg,
       round(sum(value), 6) AS v_sum,
       round(sum(value * value), 6) AS v_sum_sq,
       round(var_pop(value), 6) AS v_variance,
       round(stddev_pop(value), 6) AS v_std,
       round(quantile_cont(value, 0.25), 6) AS v_p25,
       round(quantile_cont(value, 0.50), 6) AS v_p50,
       round(quantile_cont(value, 0.95), 6) AS v_p95,
       round(sum(value * user_id) / sum(user_id), 6) AS v_wavg
FROM events
WHERE event_type IN ('click', 'view', 'purchase', 'signup')
GROUP BY event_type
ORDER BY event_type
"""


@q("es_search_stats_metrics", _STATS_METRICS_ORACLE)
def _es_search_stats_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A request body whose terms buckets carry the multi-value
    metric family — ``stats``, ``extended_stats`` (population
    variance/std like ES), ``percentiles`` (EXACT interpolated, the
    documented t-digest divergence), and ``weighted_avg`` — flattened
    to scalar columns for the value-hash oracle.

    Scale shape: ONE partial-aggregated shuffle computes every leaf
    (they all live in the same groupBy), percentiles included —
    Catalyst keeps the sort-based percentile inside the same
    aggregation."""
    from ..operators.querydsl import run_search_body

    ev = _ev_cents(spark, sf_dir)
    out = run_search_body(
        ev,
        {
            "query": {"terms": {"event_type": [
                "click", "view", "purchase", "signup"]}},
            "aggs": {
                "per_type": {"terms": {"field": "event_type"},
                             "aggs": {
                    "st": {"stats": {"field": "value"}},
                    "ext": {"extended_stats": {"field": "value"}},
                    "pct": {"percentiles": {"field": "value",
                                            "percents": [25, 50, 95]}},
                    "wa": {"weighted_avg": {"value": {"field": "value"},
                                            "weight": {"field": "user_id"}}},
                }},
            },
        },
    )
    return out.select(
        "agg_path",
        "per_type",
        "doc_count",
        F.col("st.count").alias("v_count"),
        F.round("st.min", 6).alias("v_min"),
        F.round("st.max", 6).alias("v_max"),
        F.round("st.avg", 6).alias("v_avg"),
        F.round("st.sum", 6).alias("v_sum"),
        F.round("ext.sum_of_squares", 6).alias("v_sum_sq"),
        F.round("ext.variance", 6).alias("v_variance"),
        F.round("ext.std_deviation", 6).alias("v_std"),
        F.round(F.col("pct")[0], 6).alias("v_p25"),
        F.round(F.col("pct")[1], 6).alias("v_p50"),
        F.round(F.col("pct")[2], 6).alias("v_p95"),
        F.round("wa", 6).alias("v_wavg"),
    )


# ---------------------------------------------------------------------------
# 12. Composite pagination: the scalable bucket iterator, page 2.
# ---------------------------------------------------------------------------

_COMPOSITE_ORACLE = """
WITH keyed AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type AS etype,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
  WHERE event_type IS NOT NULL
),
paged AS (
  SELECT day, etype, count(*) AS doc_count,
         CAST(sum(vc) AS BIGINT) AS cents
  FROM keyed
  WHERE (day > '2024-01-03')
     OR (day = '2024-01-03' AND etype > 'purchase')
  GROUP BY day, etype
)
SELECT 'pages' AS agg_path, day, etype, doc_count, cents
FROM paged
ORDER BY day, etype
LIMIT 12
"""


@q("es_search_composite_page", _COMPOSITE_ORACLE)
def _es_search_composite_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A ``composite`` aggregation resumed with ``after`` — page 2 of
    a (day, event_type) iteration, 12 buckets per page, with a sum
    sub-metric. This is ES's cursor for exhaustively paging an
    unbounded bucket space, and the lowering is the shape you want at
    100 TB: ONE partial-aggregated groupBy; the after-tuple predicate
    applies to the key EXPRESSIONS below the aggregation so delivered
    pages are filtered out before the shuffle, and TakeOrdered(12)
    replaces a full sort."""
    from ..operators.querydsl import run_search_body

    ev = _ev_cents(spark, sf_dir).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    return run_search_body(
        ev,
        {
            "query": {"exists": {"field": "event_type"}},
            "aggs": {"pages": {"composite": {
                "sources": [
                    {"day": {"terms": {"field": "day"}}},
                    {"etype": {"terms": {"field": "event_type"}}},
                ],
                "size": 12,
                "after": {"day": "2024-01-03", "etype": "purchase"},
            }, "aggs": {"cents": {"sum": {"field": "vc"}}}}},
        },
    ).select(
        "agg_path", "day", "etype", "doc_count",
        F.col("cents").cast("long").alias("cents"),
    )


# ---------------------------------------------------------------------------
# 13. adjacency_matrix + date_range side by side in one body.
# ---------------------------------------------------------------------------

_ADJ_ORACLE = """
WITH d AS (SELECT * FROM events),
flags AS (
  SELECT *,
         (event_type = 'click') AS f_click,
         (value >= 50) AS f_big,
         (user_id < 300) AS f_low
  FROM d
),
adj AS (
  SELECT 'interactions' AS agg_path, 'f_big' AS interactions,
         count(*) AS doc_count FROM flags WHERE f_big
  UNION ALL
  SELECT 'interactions', 'f_click', count(*) FROM flags WHERE f_click
  UNION ALL
  SELECT 'interactions', 'f_low', count(*) FROM flags WHERE f_low
  UNION ALL
  SELECT 'interactions', 'f_big&f_click', count(*) FROM flags
  WHERE f_big AND f_click
  UNION ALL
  SELECT 'interactions', 'f_big&f_low', count(*) FROM flags
  WHERE f_big AND f_low
  UNION ALL
  SELECT 'interactions', 'f_click&f_low', count(*) FROM flags
  WHERE f_click AND f_low
),
dr AS (
  SELECT 'week' AS agg_path, 'w1' AS week, count(*) AS doc_count
  FROM d WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
  UNION ALL
  SELECT 'week', 'rest', count(*)
  FROM d WHERE ts >= TIMESTAMP '2024-01-08'
)
SELECT agg_path, interactions, NULL AS week, doc_count
FROM adj WHERE doc_count > 0
UNION ALL
SELECT agg_path, NULL, week, doc_count FROM dr
"""


@q("es_search_adjacency_dateranges", _ADJ_ORACLE)
def _es_search_adjacency_dateranges(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One request body carrying an ``adjacency_matrix`` (three named
    filters -> per-filter buckets plus every non-empty pairwise
    intersection, names sorted — ES's co-occurrence matrix) NEXT TO a
    ``date_range`` (timestamp bounds, zero-filled requested buckets).

    Scale shape: both are explode lowerings over ONE scan per frame
    signature; the matrix multiplies each doc only by its matching
    bucket count (<= 3 + 3 pairs), never materializing a cross
    product."""
    from ..operators.querydsl import run_search_body

    ev = _t(spark, sf_dir, "events")
    return run_search_body(
        ev,
        {
            "aggs": {
                "interactions": {"adjacency_matrix": {"filters": {
                    "f_click": {"term": {"event_type": "click"}},
                    "f_big": {"range": {"value": {"gte": 50}}},
                    "f_low": {"range": {"user_id": {"lt": 300}}},
                }}},
                "week": {"date_range": {"field": "ts", "ranges": [
                    {"key": "w1", "from": "2024-01-01",
                     "to": "2024-01-08"},
                    {"key": "rest", "from": "2024-01-08"},
                ]}},
            },
        },
    ).select("agg_path", "interactions", "week", "doc_count")


# ---------------------------------------------------------------------------
# 14. Sibling pipeline aggs: avg/max/stats over a child's buckets.
# ---------------------------------------------------------------------------

_SIBLING_ORACLE = """
WITH buckets AS (
  SELECT strftime(ts, '%Y-%m-%d') AS per_day,
         count(*) AS doc_count,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events
  WHERE event_type = 'purchase'
  GROUP BY 1
)
SELECT '' AS agg_path, NULL AS per_day,
       (SELECT count(*) FROM events WHERE event_type = 'purchase')
         AS doc_count,
       NULL AS cents,
       round((SELECT avg(cents) FROM buckets), 4) AS avg_daily,
       (SELECT max(cents) FROM buckets) AS max_daily,
       (SELECT min(doc_count) FROM buckets) AS min_docs,
       (SELECT CAST(count(*) AS BIGINT) FROM buckets) AS n_days,
       round((SELECT sum(cents) FROM buckets), 4) AS sum_daily,
       round((SELECT quantile_cont(CAST(cents AS DOUBLE), 0.5)
              FROM buckets), 4) AS med_daily
UNION ALL
SELECT 'per_day', per_day, doc_count, cents, NULL, NULL, NULL, NULL,
       NULL, NULL
FROM buckets
"""


@q("es_search_sibling_pipelines", _SIBLING_ORACLE)
def _es_search_sibling_pipelines(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sibling pipeline aggregations — ``avg_bucket`` / ``max_bucket``
    / ``min_bucket`` / ``stats_bucket`` living NEXT TO the
    ``date_histogram`` they summarize — through a full request body.
    The root-level row (agg_path '') carries the cross-bucket
    summary; bucket rows carry their own metrics, exactly ES's
    response shape flattened.

    Scale shape: the child bucket frame is KB-sized; each sibling is
    one aggregate over it joined back as a broadcast single row — no
    second corpus scan."""
    from ..operators.querydsl import run_search_body

    out = run_search_body(
        _ev_cents(spark, sf_dir),
        {
            "query": {"term": {"event_type": "purchase"}},
            "aggs": {
                "per_day": {"date_histogram": {
                    "field": "ts", "calendar_interval": "day"},
                    "aggs": {"cents": {"sum": {"field": "vc"}}}},
                "avg_daily": {"avg_bucket": {
                    "buckets_path": "per_day>cents"}},
                "max_daily": {"max_bucket": {
                    "buckets_path": "per_day>cents"}},
                "min_docs": {"min_bucket": {
                    "buckets_path": "per_day>_count"}},
                "st": {"stats_bucket": {
                    "buckets_path": "per_day>cents"}},
                "pb": {"percentiles_bucket": {
                    "buckets_path": "per_day>cents",
                    "percents": [50]}},
            },
        },
    )
    return out.select(
        "agg_path",
        "per_day",
        "doc_count",
        F.col("cents").cast("long").alias("cents"),
        F.round("avg_daily", 4).alias("avg_daily"),
        F.col("max_daily").cast("long").alias("max_daily"),
        F.col("min_docs").cast("long").alias("min_docs"),
        F.col("st.count").alias("n_days"),
        F.round("st.sum", 4).alias("sum_daily"),
        F.round(F.col("pb")[0], 4).alias("med_daily"),
    )


# ---------------------------------------------------------------------------
# 15. significant_terms: JLH-scored foreground-vs-background terms.
# ---------------------------------------------------------------------------

_SIG_ORACLE = r"""
WITH fg AS (
  SELECT lang FROM documents
  WHERE list_contains(
          list_filter(string_split_regex(text, '\s+'), t -> t <> ''),
          'vector')
    AND lang IS NOT NULL
),
bg AS (SELECT lang FROM documents WHERE lang IS NOT NULL),
fg_counts AS (SELECT lang, count(*) AS doc_count FROM fg GROUP BY lang),
bg_counts AS (SELECT lang, count(*) AS bg_count FROM bg GROUP BY lang),
tot AS (
  SELECT (SELECT count(*) FROM fg) AS fg_total,
         (SELECT count(*) FROM bg) AS bg_total
),
scored AS (
  SELECT f.lang AS sig, f.doc_count, b.bg_count,
         (CAST(f.doc_count AS DOUBLE) / t.fg_total
          - CAST(b.bg_count AS DOUBLE) / t.bg_total)
         * ((CAST(f.doc_count AS DOUBLE) / t.fg_total)
            / (CAST(b.bg_count AS DOUBLE) / t.bg_total)) AS score
  FROM fg_counts f
  JOIN bg_counts b ON f.lang = b.lang
  CROSS JOIN tot t
  WHERE CAST(f.doc_count AS DOUBLE) / t.fg_total
        > CAST(b.bg_count AS DOUBLE) / t.bg_total
)
SELECT 'sig' AS agg_path, sig, doc_count, bg_count,
       round(score, 8) AS score
FROM scored
ORDER BY score DESC, sig
LIMIT 3
"""


@q("es_search_significant_terms", _SIG_ORACLE)
def _es_search_significant_terms(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``significant_terms`` through a request body: which languages
    are over-represented among docs that mention 'vector', scored
    with ES's JLH ((fg_rate - bg_rate) * fg_rate/bg_rate) against the
    WHOLE corpus background — computed exactly (ES samples shard-local
    candidates; one node == one shard here, so the exact answer is
    the ES answer).

    Scale shape: foreground and background term counts are
    vocabulary-sized aggregates; the join is broadcast; the corpus
    never shuffles."""
    from ..operators.querydsl import run_search_body

    out = run_search_body(
        _t(spark, sf_dir, "documents"),
        {
            "query": {"match": {"text": "vector"}},
            "aggs": {"sig": {"significant_terms": {
                "field": "lang", "size": 3}}},
        },
    )
    return out.select(
        "agg_path", "sig", "doc_count", "bg_count",
        F.round("score", 8).alias("score"),
    )


# ---------------------------------------------------------------------------
# 16. Deep pagination: search_after page (cheap at any depth).
# ---------------------------------------------------------------------------

_SEARCH_AFTER_ORACLE = """
SELECT doc_id, lang, n_chars FROM documents
WHERE (n_chars > 400) OR (n_chars = 400 AND doc_id > 120)
ORDER BY n_chars, doc_id
LIMIT 15
"""


@q("es_search_after_page", _SEARCH_AFTER_ORACLE)
def _es_search_after_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``search_after`` deep pagination: the next 15 hits strictly
    after the (n_chars=400, doc_id=120) cursor under an (n_chars,
    doc_id) sort — ES's scalable alternative to ``from`` offsets.

    Scale shape: the strict-after tuple predicate filters BEFORE the
    TakeOrdered, so page 10,000 costs exactly what page 1 costs — no
    offset scan, no accumulated skip."""
    from ..operators.querydsl import run_search_body

    return run_search_body(
        _t(spark, sf_dir, "documents"),
        {
            "query": {"match_all": {}},
            "sort": [{"n_chars": {"order": "asc"}},
                     {"doc_id": {"order": "asc"}}],
            "search_after": [400, 120],
            "size": 15,
            "_source": ["doc_id", "lang", "n_chars"],
        },
    )


# ---------------------------------------------------------------------------
# 17. Highlighting: matched tokens wrapped in <em> fragments.
# ---------------------------------------------------------------------------

_HIGHLIGHT_ORACLE = r"""
WITH hits AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS tk
  FROM documents
  WHERE list_contains(
          list_filter(string_split_regex(text, '\s+'), t -> t <> ''),
          'vector')
     OR list_contains(
          list_filter(string_split_regex(text, '\s+'), t -> t <> ''),
          'sketchy')
)
SELECT doc_id,
       array_to_string(
         list_transform(
           tk,
           t -> CASE WHEN t IN ('vector', 'sketchy')
                     THEN '<em>' || t || '</em>' ELSE t END),
         ' ') AS text_highlight
FROM hits
ORDER BY doc_id
LIMIT 20
"""


@q("es_search_highlight", _HIGHLIGHT_ORACLE)
def _es_search_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``highlight`` on a match query: each hit carries the analyzed
    field with every matched query token wrapped in ``<em>`` tags as
    one whole-field fragment (ES unified highlighter,
    number_of_fragments 0, whitespace analyzer).

    Scale shape: pure codegen split/transform/join in the same
    projection as the hit list — no second pass over the text."""
    from ..operators.querydsl import run_search_body

    return run_search_body(
        _t(spark, sf_dir, "documents"),
        {
            "query": {"match": {"text": "vector sketchy"}},
            "sort": [{"doc_id": {"order": "asc"}}],
            "size": 20,
            "highlight": {"fields": {"text": {}}},
            "_source": ["doc_id"],
        },
    )


# ---------------------------------------------------------------------------
# 18. knn section: exact cosine top-k with ES's (1+cos)/2 scaling.
# ---------------------------------------------------------------------------

_KNN_DIM = 64
_KNN_VEC = [round(((i * 7) % 13) / 13.0, 6) for i in range(_KNN_DIM)]

_KNN_ORACLE = f"""
WITH q AS (SELECT [{", ".join(str(x) for x in _KNN_VEC)}]::DOUBLE[] AS qv),
scored AS (
  SELECT e.vec_id, e.label,
         (1.0 + list_cosine_similarity(e.embedding::DOUBLE[], q.qv))
           / 2.0 AS score
  FROM embeddings e CROSS JOIN q
  WHERE e.label >= 1
)
SELECT vec_id, CAST(label AS BIGINT) AS label, round(score, 6) AS score
FROM scored
ORDER BY score DESC, vec_id
LIMIT 10
"""


@q("es_search_knn", _KNN_ORACLE)
def _es_search_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``knn`` search section: exact cosine top-10 of a literal
    64-dim query vector over the embeddings corpus with a standard
    query-DSL ``filter`` applied BEFORE the top-k (like ES), scored
    with the dense-vector scaling ``(1 + cos) / 2``.

    Scale shape: one codegen zip_with dot product per row +
    TakeOrdered(10); the corpus never shuffles. The IVF / LSH / PQ
    indexed variants of the same search live in
    operators/similarity.py + sinks/annindex.py (embedding_ivf_topk
    and friends)."""
    from ..operators.querydsl import run_search_body

    out = run_search_body(
        _t(spark, sf_dir, "embeddings"),
        {
            "knn": {
                "field": "embedding",
                "query_vector": _KNN_VEC,
                "k": 10,
                "filter": {"range": {"label": {"gte": 1}}},
            },
            "_source": ["vec_id", "label"],
        },
    )
    return out.select(
        "vec_id", "label", F.round("_score", 6).alias("score")
    )


# ---------------------------------------------------------------------------
# 19. terms ordered by a sub-metric, descendants pruned to survivors.
# ---------------------------------------------------------------------------

_TERMS_ORDER_ORACLE = """
WITH per_src AS (
  SELECT source, count(*) AS doc_count,
         CAST(sum(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY source
),
top3 AS (
  SELECT * FROM per_src
  ORDER BY chars DESC, source LIMIT 3
),
child AS (
  SELECT d.source, d.lang, count(*) AS doc_count
  FROM documents d JOIN top3 t ON d.source = t.source
  GROUP BY d.source, d.lang
)
SELECT 'top_src' AS agg_path, source, NULL AS lang, doc_count, chars
FROM top3
UNION ALL
SELECT 'top_src>per_lang', source, lang, doc_count, NULL FROM child
"""


@q("es_search_terms_order", _TERMS_ORDER_ORACLE)
def _es_search_terms_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``terms`` ordered by a SUB-METRIC (``order: {chars: desc}``,
    size 3) with a nested per-language terms level: the child rows
    exist only under the three SURVIVING parent buckets — ES computes
    sub-aggs only inside kept buckets, and so does the engine's
    pruning semi-join.

    Scale shape: one groupingSets aggregation for both levels, a
    KB-sized window for the top-3 cut, and a broadcast semi-join for
    the descendant prune."""
    from ..operators.querydsl import run_search_body

    out = run_search_body(
        _t(spark, sf_dir, "documents"),
        {
            "aggs": {"top_src": {
                "terms": {"field": "source", "size": 3,
                          "order": {"chars": "desc"}},
                "aggs": {
                    "chars": {"sum": {"field": "n_chars"}},
                    "per_lang": {"terms": {"field": "lang"}},
                },
            }},
        },
    )
    return out.select(
        "agg_path",
        F.col("top_src").alias("source"),
        F.col("per_lang").alias("lang"),
        "doc_count",
        F.col("chars").cast("long").alias("chars"),
    )


# ---------------------------------------------------------------------------
# 20. auto_date_histogram through the interpreter (data-driven
#     interval pick, replayed by the oracle from the same ladder).
# ---------------------------------------------------------------------------

_ADH_BODY_TARGET = 35

_ADH_REQ_ORACLE = f"""
WITH tt AS (
  SELECT (epoch_ms(min(ts)) // 1000)::BIGINT AS t0,
         (epoch_ms(max(ts)) // 1000)::BIGINT AS t1
  FROM events WHERE event_type = 'click'
),
pick AS (
  SELECT CASE
    WHEN t1 // 3600 - t0 // 3600 + 1 <= {_ADH_BODY_TARGET} THEN 1
    WHEN t1 // 10800 - t0 // 10800 + 1 <= {_ADH_BODY_TARGET} THEN 3
    WHEN t1 // 43200 - t0 // 43200 + 1 <= {_ADH_BODY_TARGET} THEN 12
    WHEN t1 // 86400 - t0 // 86400 + 1 <= {_ADH_BODY_TARGET} THEN 24
    WHEN t1 // 604800 - t0 // 604800 + 1 <= {_ADH_BODY_TARGET} THEN 168
    ELSE 720 END AS h
  FROM tt
)
SELECT 'span' AS agg_path,
       strftime(to_timestamp(((epoch_ms(ts) // 1000) // (h * 3600))
                             * (h * 3600)),
                '%Y-%m-%d %H:%M:%S') AS span,
       count(*) AS doc_count,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events CROSS JOIN pick
WHERE event_type = 'click'
GROUP BY 2
ORDER BY span
"""


@q("es_search_auto_date_histogram", _ADH_REQ_ORACLE)
def _es_search_auto_date_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``auto_date_histogram`` through a request body: the interval is
    picked from the OBSERVED span of the query-filtered docs (smallest
    ladder step giving <= 35 aligned buckets), then buckets like a
    date_histogram — the oracle replays the identical ladder probe in
    SQL, so a wrong pick OR wrong bucketing breaks the hash.

    Scale shape: one extra map-side-combined min/max scan reduced to a
    single broadcast row (no driver round-trip), then the usual one
    partial-aggregated groupBy."""
    from ..operators.querydsl import run_search_body

    out = run_search_body(
        _ev_cents(spark, sf_dir),
        {
            "query": {"term": {"event_type": "click"}},
            "aggs": {"span": {
                "auto_date_histogram": {"field": "ts",
                                        "buckets": _ADH_BODY_TARGET},
                "aggs": {"cents": {"sum": {"field": "vc"}}},
            }},
        },
    )
    return out.select(
        "agg_path", "span", "doc_count",
        F.col("cents").cast("long").alias("cents"),
    ).orderBy("span")


# ---------------------------------------------------------------------------
# 21. rescore: second-phase scoring over the primary top window.
# ---------------------------------------------------------------------------

_RESCORE_BODY_ORACLE = """
WITH stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (WHERE lang = 'es') AS BIGINT) AS df_es,
         CAST(count(*) FILTER (WHERE lang = 'fr') AS BIGINT) AS df_fr
  FROM documents
),
primary_scored AS (
  SELECT d.doc_id, d.lang, d.source,
         (CASE WHEN d.lang = 'es'
               THEN ln(1 + (s.n - s.df_es + 0.5) / (s.df_es + 0.5))
               ELSE 0.0 END
          + CASE WHEN d.lang = 'fr'
                 THEN ln(1 + (s.n - s.df_fr + 0.5) / (s.df_fr + 0.5))
                 ELSE 0.0 END) AS p_score
  FROM documents d CROSS JOIN stats s
  WHERE d.lang IN ('es', 'fr')
),
top_window AS (
  SELECT * FROM primary_scored
  ORDER BY p_score DESC, doc_id LIMIT 40
)
SELECT doc_id, lang, source,
       round(2.0 * p_score
             + CASE WHEN source = 'src3' THEN 7.0 ELSE 0.0 END, 6)
         AS score
FROM top_window
ORDER BY 2.0 * p_score
         + CASE WHEN source = 'src3' THEN 7.0 ELSE 0.0 END DESC,
         doc_id
LIMIT 12
"""


@q("es_search_rescore", _RESCORE_BODY_ORACLE)
def _es_search_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rescore`` through a request body: a BM25 ``match`` primary
    (single-token lang field — the scoring collapses to the exact idf
    sum) ranks everything; only the top window_size=40 hits get the
    secondary ``term`` boost (filter-context secondary scores 1.0 in
    ES too), combined as query_weight*primary +
    rescore_query_weight*secondary; final top-12 from the window.

    Scale shape: the primary phase is a TakeOrdered(40) over the
    filtered scan (per-partition top-k, no global sort); the
    secondary expression evaluates on 40 rows. Cheap scorer over
    everything, expensive scorer over a bounded window — rescore's
    entire point at 100 TB."""
    from ..operators.querydsl import run_search_body

    out = run_search_body(
        _t(spark, sf_dir, "documents"),
        {
            "query": {"match": {"lang": "es fr"}},
            "rescore": {"window_size": 40, "query": {
                "rescore_query": {"term": {"source": "src3"}},
                "query_weight": 2.0,
                "rescore_query_weight": 7.0,
            }},
            "size": 12,
            "_source": ["doc_id", "lang", "source"],
        },
    )
    return out.select(
        "doc_id", "lang", "source", F.round("_score", 6).alias("score")
    )


# ---------------------------------------------------------------------------
# 22. suggest: term suggester (did-you-mean) through a request body.
# ---------------------------------------------------------------------------

_SUGGEST_BODY_ORACLE = r"""
WITH vocab AS (
  SELECT t AS suggestion, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                  x -> x <> '')) AS t
        FROM documents)
  GROUP BY t
),
toks AS (SELECT unnest(['mergee', 'sparkk', 'windoww']) AS token),
missing AS (
  SELECT token FROM toks
  WHERE token NOT IN (SELECT suggestion FROM vocab)
),
probed AS (
  SELECT m.token, v.suggestion, v.freq,
         CAST(levenshtein(v.suggestion, m.token) AS BIGINT) AS distance
  FROM missing m CROSS JOIN vocab v
  WHERE levenshtein(v.suggestion, m.token) BETWEEN 1 AND 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY token
                               ORDER BY distance, freq DESC,
                                        suggestion) AS rn
  FROM probed
)
SELECT 'fix' AS suggest_name, token, suggestion, freq, distance
FROM ranked WHERE rn <= 4
"""


@q("es_search_suggest", _SUGGEST_BODY_ORACLE)
def _es_search_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``suggest`` section (term suggester): misspelled query
    tokens that are MISSING from the index vocabulary
    (suggest_mode=missing, ES's default) get corpus-term corrections
    within 2 edits, ordered by (distance, doc frequency desc, term) —
    ES's did-you-mean.

    Scale shape: the vocabulary is one explode+groupBy (vocabulary-
    sized result); each literal token probes it via an in-row explode
    so the Levenshtein runs per DISTINCT term, never per document."""
    from ..operators.querydsl import run_search_body

    return run_search_body(
        _t(spark, sf_dir, "documents"),
        {"suggest": {"fix": {
            "text": "mergee sparkk windoww",
            "term": {"field": "text", "size": 4},
        }}},
    )


# ---------------------------------------------------------------------------
# 23. _delete_by_query + _update_by_query over the partitioned lake.
# ---------------------------------------------------------------------------

_BYQUERY_ORACLE = """
WITH survivors AS (
  SELECT event_id, user_id, event_type,
         strftime(ts, '%Y-%m-%d') AS es_index,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
  WHERE NOT (event_type = 'view'
             AND CAST(round(value * 100) AS BIGINT) < 2000)
),
updated AS (
  SELECT event_id, user_id, es_index,
         CASE WHEN vc >= 8000 THEN upper(event_type)
              ELSE event_type END AS event_type,
         vc
  FROM survivors
)
SELECT es_index, event_type,
       count(*) AS n,
       CAST(sum(vc) AS BIGINT) AS cents
FROM updated
GROUP BY es_index, event_type
"""


@q("delete_update_by_query", _BYQUERY_ORACLE)
def _delete_update_by_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``_delete_by_query`` + ``_update_by_query`` against the
    day-partitioned lake (sinks/byquery.py): cheap views are deleted
    by a bool query, big-ticket rows get an ingest-processor uppercase
    via a second request, then the final table is read back and
    aggregated. The oracle replays both mutations over the raw events
    — so partition selection, the conditional projection (unmatched
    rows byte-identical), and the crash-safe swaps are all under the
    value hash.

    Scale shape: both APIs rewrite ONLY partitions containing matches
    (metadata-cheap match scan first); the update is one conditional
    projection per touched partition — never a join, never a second
    pass over untouched days."""
    import shutil
    import tempfile
    from pathlib import Path

    from ..sinks.byquery import delete_by_query, update_by_query

    ev = _ev_cents(spark, sf_dir).select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("es_index"),
        "vc",
    )
    sf = Path(sf_dir).name or "sf"
    root = Path(tempfile.gettempdir()) / "spark_graft_byquery" / sf
    shutil.rmtree(root, ignore_errors=True)
    ev.write.partitionBy("es_index").mode("overwrite").parquet(str(root))
    delete_by_query(
        spark,
        root,
        {"query": {"bool": {"must": [
            {"term": {"event_type": "view"}},
            {"range": {"vc": {"lt": 2000}}},
        ]}}},
        id_col="event_id",
    )
    update_by_query(
        spark,
        root,
        {"query": {"range": {"vc": {"gte": 8000}}}},
        [{"uppercase": {"field": "event_type"}}],
        id_col="event_id",
    )
    final = spark.read.parquet(str(root))
    # partition-value inference types the dir name as DATE; the
    # declared surface is scalar strings
    final = final.withColumn(
        "es_index", F.date_format("es_index", "yyyy-MM-dd")
    )
    return final.groupBy("es_index", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vc").cast("long").alias("cents"),
    )


# ---------------------------------------------------------------------------
# 24. script_score: painless arithmetic over doc fields as _score.
# ---------------------------------------------------------------------------

_SCRIPT_SCORE_ORACLE = """
SELECT doc_id, n_chars,
       round(CAST(round(n_chars / 10.0) AS DOUBLE)
             + CASE WHEN lang = 'en' THEN 100.0 ELSE 0.0 END, 6)
         AS score
FROM documents
WHERE source IN ('src1', 'src2', 'src3')
ORDER BY CAST(round(n_chars / 10.0) AS DOUBLE)
         + CASE WHEN lang = 'en' THEN 100.0 ELSE 0.0 END DESC,
         doc_id
LIMIT 15
"""


@q("es_search_script_score", _SCRIPT_SCORE_ORACLE)
def _es_search_script_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``script_score`` through a request body: the painless-subset
    script (``doc['field'].value`` references + arithmetic + a CASE
    comparison) becomes the hit ``_score``, ordered with the ``_doc``
    tie-break. The compiler rejects anything outside the arithmetic
    subset at plan time, like ES script compilation.

    Scale shape: the script lowers to one codegen projection over the
    filtered scan + TakeOrdered(15) — scoring by script costs the
    same plan as scoring by column."""
    from ..operators.querydsl import run_search_body

    out = run_search_body(
        _t(spark, sf_dir, "documents"),
        {
            "query": {"script_score": {
                "query": {"terms": {"source": ["src1", "src2", "src3"]}},
                "script": {"source":
                           "CAST(round(doc['n_chars'].value / 10.0) "
                           "AS DOUBLE) + "
                           "(CASE WHEN doc['lang'].value = 'en' "
                           "THEN CAST(100.0 AS DOUBLE) "
                           "ELSE CAST(0.0 AS DOUBLE) END)"},
            }},
            "size": 15,
            "_source": ["doc_id", "n_chars"],
        },
    )
    return out.select(
        "doc_id", "n_chars", F.round("_score", 6).alias("score")
    )


# ---------------------------------------------------------------------------
# 25. _count: the filtered-count endpoint.
# ---------------------------------------------------------------------------

_COUNT_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS count
FROM documents
WHERE lang IN ('en', 'es') AND n_chars >= 100
"""


@q("es_count_request", _COUNT_ORACLE)
def _es_count_request(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``_count`` endpoint: a query-DSL body reduced to one count
    row — every pushable conjunct reaches the scan, no hits
    materialize. The smallest useful request an ES user makes."""
    from ..operators.querydsl import run_count_body

    return run_count_body(
        _t(spark, sf_dir, "documents"),
        {"query": {"bool": {"must": [
            {"terms": {"lang": ["en", "es"]}},
            {"range": {"n_chars": {"gte": 100}}},
        ]}}},
    )


# ---------------------------------------------------------------------------
# 26. nested query: same-element conjunction over array<struct>.
# ---------------------------------------------------------------------------

_NESTED_ORACLE = """
WITH hits AS (
  SELECT DISTINCT l_orderkey
  FROM lineitem
  WHERE l_quantity >= 45 AND l_returnflag = 'R'
)
SELECT h.l_orderkey,
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        WHERE l.l_orderkey = h.l_orderkey) AS n_items
FROM hits h
ORDER BY h.l_orderkey
LIMIT 25
"""


@q("es_search_nested", _NESTED_ORACLE)
def _es_search_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``nested`` query: orders as parent docs with their
    lineitems collected into an ``array<struct>`` nested field; the
    query matches orders owning at least one item that is BOTH
    quantity >= 45 AND returnflag R — on the SAME element (the
    cross-element false positive is what ES nested exists to
    prevent, and what the flat-table oracle replays exactly).

    Scale shape: the nested lowering is ONE codegen F.exists over the
    array — no explode, no second shuffle beyond the parent-doc
    collect_list build."""
    from ..operators.querydsl import run_search_body

    li = _t(spark, sf_dir, "lineitem")
    parents = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(
                F.col("l_quantity").alias("qty"),
                F.col("l_returnflag").alias("flag"),
            )
        ).alias("items"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )
    out = run_search_body(
        parents,
        {
            "query": {"nested": {"path": "items", "query": {
                "bool": {"must": [
                    {"range": {"items.qty": {"gte": 45}}},
                    {"term": {"items.flag": "R"}},
                ]}}}},
            "sort": [{"l_orderkey": {"order": "asc"}}],
            "size": 25,
            "_source": ["l_orderkey", "n_items"],
        },
    )
    return out


# ---------------------------------------------------------------------------
# 27. min_doc_count 0: empty gap buckets in a date_histogram.
# ---------------------------------------------------------------------------

_GAPS_ORACLE = """
WITH hits AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         count(*) AS doc_count,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events
  WHERE event_type = 'signup' AND user_id % 487 = 3
  GROUP BY 1
),
span AS (SELECT min(day) AS lo, max(day) AS hi FROM hits),
grid AS (
  SELECT strftime(g.d, '%Y-%m-%d') AS day
  FROM span, LATERAL (
    SELECT unnest(generate_series(CAST(lo AS DATE), CAST(hi AS DATE),
                                  INTERVAL 1 DAY)) AS d) g
)
SELECT 'per_day' AS agg_path, g.day,
       coalesce(h.doc_count, 0) AS doc_count,
       coalesce(h.cents, 0) AS cents
FROM grid g LEFT JOIN hits h ON g.day = h.day
"""


@q("es_search_histogram_gaps", _GAPS_ORACLE)
def _es_search_histogram_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``min_doc_count: 0`` — ES's DEFAULT histogram behavior — through
    a request body: a sparse event slice (rare user ids) leaves empty
    days between its min and max, and the date_histogram emits every
    one of them zero-filled; the oracle generates the same calendar
    grid and left-joins the observed buckets.

    Scale shape: the grid explodes from ONE min/max row over the
    ALREADY-AGGREGATED bucket frame (KB-scale), then broadcast-joins
    the buckets back — the corpus is never re-read for the gaps."""
    from ..operators.querydsl import run_search_body

    out = run_search_body(
        _ev_cents(spark, sf_dir).withColumn(
            "sparse", F.col("user_id") % 487 == 3
        ),
        {
            "query": {"bool": {"must": [
                {"term": {"event_type": "signup"}},
                {"term": {"sparse": True}},
            ]}},
            "aggs": {"per_day": {
                "date_histogram": {"field": "ts",
                                   "calendar_interval": "day",
                                   "min_doc_count": 0},
                "aggs": {"cents": {"sum": {"field": "vc"}}},
            }},
        },
    )
    return out.select(
        "agg_path", F.col("per_day").alias("day"), "doc_count",
        F.col("cents").cast("long").alias("cents"),
    )


# ---------------------------------------------------------------------------
# 28. geo queries: distance radius + bounding box through the body.
# ---------------------------------------------------------------------------

_GEO_QUERY_ORACLE = """
WITH pts AS (
  SELECT c_custkey, c_acctbal,
         -6000 + (c_custkey * 7) % 12000 AS lat,
         -18000 + (c_custkey * 13) % 36000 AS lon
  FROM customer
)
SELECT c_custkey, lat, lon,
       CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
FROM pts
WHERE (lat - 1500) * (lat - 1500) + (lon + 2500) * (lon + 2500)
      <= 4000 * 4000
  AND lat <= 5000 AND lat >= -5000 AND lon >= -9000 AND lon <= 9000
ORDER BY c_custkey
LIMIT 30
"""


@q("es_search_geo", _GEO_QUERY_ORACLE)
def _es_search_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``geo_distance`` AND ``geo_bounding_box`` composed in one bool
    body over the repo's planar centi-degree customer coordinates: a
    4000-unit radius around (1500, -2500) intersected with a bounding
    box, both integer-exact (squared-distance comparison, no sqrt) so
    the oracle replays them verbatim.

    Scale shape: two pure codegen predicates on one scan +
    TakeOrdered(30) — geo filtering costs the same plan as numeric
    filtering."""
    from ..operators.querydsl import run_search_body

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.struct(
            (F.lit(-6000) + (F.col("c_custkey") * 7) % 12000).alias("lat"),
            (F.lit(-18000) + (F.col("c_custkey") * 13) % 36000).alias(
                "lon"
            ),
        ).alias("loc"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    )
    out = run_search_body(
        cust,
        {
            "query": {"bool": {"must": [
                {"geo_distance": {"distance": 4000,
                                  "loc": {"lat": 1500, "lon": -2500}}},
                {"geo_bounding_box": {"loc": {
                    "top_left": {"lat": 5000, "lon": -9000},
                    "bottom_right": {"lat": -5000, "lon": 9000},
                }}},
            ]}},
            "sort": [{"c_custkey": {"order": "asc"}}],
            "size": 30,
        },
    )
    return out.select(
        "c_custkey",
        F.col("loc.lat").alias("lat"),
        F.col("loc.lon").alias("lon"),
        "bal_c",
    )


# ---------------------------------------------------------------------------
# 29. hits AND aggs from ONE request body (ES's two-section response).
# ---------------------------------------------------------------------------

_HITS_AND_AGGS_ORACLE = """
WITH f AS (
  SELECT event_id, strftime(ts, '%Y-%m-%d') AS day,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events WHERE event_type = 'purchase'
),
hits AS (
  SELECT event_id, vc,
         CAST(row_number() OVER (ORDER BY vc DESC, event_id)
              AS BIGINT) AS hit_rank
  FROM f ORDER BY vc DESC, event_id LIMIT 5
),
ag AS (
  SELECT day, count(*) AS doc_count,
         CAST(sum(vc) AS BIGINT) AS cents
  FROM f GROUP BY day
)
SELECT 'hits' AS section, hit_rank, event_id, vc,
       NULL AS agg_path, NULL AS per_day,
       NULL::BIGINT AS doc_count, NULL::BIGINT AS cents
FROM hits
UNION ALL
SELECT 'aggs', NULL, NULL, NULL, 'per_day', day, doc_count, cents
FROM ag
"""


@q("es_search_hits_and_aggs", _HITS_AND_AGGS_ORACLE)
def _es_search_hits_and_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES's response ALWAYS carries both a hits section and an aggs
    section — this is the round-5 one-response contract: a body with
    ``query`` + ``sort`` + ``size`` + ``aggs`` returns a two-section
    union frame (section='hits' rows with hit_rank + _source columns;
    section='aggs' rows with the flat agg contract), and the aggs run
    over the FULL query-filtered set, not the hit page.

    Scale shape: one filtered scan feeds both branches — TakeOrdered
    (size) for the hit page, one partial-agg groupBy for the buckets;
    the union is page-plus-buckets sized."""
    from ..operators.querydsl import run_search_body

    out = run_search_body(
        _ev_cents(spark, sf_dir),
        {
            "query": {"term": {"event_type": "purchase"}},
            "sort": [{"vc": "desc"}],
            "size": 5,
            "_source": ["event_id", "vc"],
            "aggs": {"per_day": {
                "date_histogram": {"field": "ts",
                                   "calendar_interval": "day"},
                "aggs": {"cents": {"sum": {"field": "vc"}}},
            }},
        },
    )
    return out.select(
        "section", "hit_rank", "event_id", "vc", "agg_path", "per_day",
        "doc_count", F.col("cents").cast("long").alias("cents"),
    )


# ---------------------------------------------------------------------------
# 30. hybrid knn + query (ES 8): additive scores and rank.rrf fusion.
# ---------------------------------------------------------------------------

_KNN_HYBRID_ORACLE = f"""
WITH q AS (SELECT [{", ".join(str(x) for x in _KNN_VEC)}]::DOUBLE[] AS qv),
ks AS (
  SELECT e.vec_id, CAST(e.label AS BIGINT) AS label,
         2.0 * (1.0 + list_cosine_similarity(e.embedding::DOUBLE[], q.qv))
           / 2.0 AS kscore
  FROM embeddings e CROSS JOIN q
),
topk AS (SELECT vec_id, kscore FROM ks ORDER BY kscore DESC, vec_id LIMIT 10),
hybrid AS (
  SELECT k.vec_id, k.label,
         coalesce(t.kscore, 0.0)
           + CASE WHEN k.label >= 2 THEN 1.0 ELSE 0.0 END AS score
  FROM ks k LEFT JOIN topk t USING (vec_id)
  WHERE k.label >= 2 OR t.vec_id IS NOT NULL
)
SELECT vec_id, label, round(score, 6) AS score
FROM hybrid ORDER BY score DESC, vec_id LIMIT 12
"""


@q("es_search_knn_hybrid", _KNN_HYBRID_ORACLE)
def _es_search_knn_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES 8 hybrid search — ``knn`` AND ``query`` in one body: the knn
    section contributes ``boost * (1+cos)/2`` for its global top-k
    documents only, the query contributes its score (filter context
    1.0 here) for its matches only, the hit set is the union of both
    arms and the final order is the additive combined score.

    Scale shape: the k-row knn top-k frame broadcast-joins onto the
    corpus scan — documents never shuffle; the query arm is the same
    scan's codegen predicate."""
    from ..operators.querydsl import run_search_body

    out = run_search_body(
        _t(spark, sf_dir, "embeddings"),
        {
            "knn": {
                "field": "embedding",
                "query_vector": _KNN_VEC,
                "k": 10,
                "boost": 2.0,
            },
            "query": {"range": {"label": {"gte": 2}}},
            "size": 12,
            "_source": ["vec_id", "label"],
        },
    )
    return out.select(
        "vec_id", F.col("label").cast("long").alias("label"),
        F.round("_score", 6).alias("score"),
    )


_KNN_RRF_ORACLE = f"""
WITH q AS (SELECT [{", ".join(str(x) for x in _KNN_VEC)}]::DOUBLE[] AS qv),
knn_arm AS (
  SELECT vec_id, CAST(row_number() OVER (
           ORDER BY list_cosine_similarity(embedding::DOUBLE[], qv) DESC,
                    vec_id) AS BIGINT) AS r
  FROM embeddings CROSS JOIN q
  ORDER BY r LIMIT 20
),
q_arm AS (
  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) AS r
  FROM embeddings WHERE label >= 2
  ORDER BY r LIMIT 20
),
fused AS (
  SELECT vec_id, sum(1.0 / (60 + r)) AS score
  FROM (SELECT * FROM knn_arm UNION ALL SELECT * FROM q_arm)
  GROUP BY vec_id
)
SELECT f.vec_id, CAST(e.label AS BIGINT) AS label,
       round(f.score, 6) AS score
FROM fused f JOIN embeddings e USING (vec_id)
ORDER BY f.score DESC, f.vec_id LIMIT 10
"""


@q("es_search_knn_rrf", _KNN_RRF_ORACLE)
def _es_search_knn_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid knn + query under ``rank: {rrf: ...}`` — reciprocal-rank
    fusion: each arm ranks its top ``rank_window_size`` candidates,
    a document's fused score is the sum of ``1/(rank_constant +
    rank)`` over the arms that retrieved it (ES's RRF formula; the
    standalone twin is plans/esrelations.hybrid_rrf_search).

    Scale shape: both arm frames are window-row sized (TakeOrdered +
    a window-bounded row_number), fuse in one tiny groupBy, and
    broadcast-join back onto the corpus for the _source columns."""
    from ..operators.querydsl import run_search_body

    out = run_search_body(
        _t(spark, sf_dir, "embeddings"),
        {
            "knn": {
                "field": "embedding",
                "query_vector": _KNN_VEC,
                "k": 10,
            },
            "query": {"range": {"label": {"gte": 2}}},
            "rank": {"rrf": {"rank_window_size": 20,
                             "rank_constant": 60}},
            "size": 10,
            "_source": ["vec_id", "label"],
        },
    )
    return out.select(
        "vec_id", F.col("label").cast("long").alias("label"),
        F.round("_score", 6).alias("score"),
    )


# ---------------------------------------------------------------------------
# 31. function_score breadth: 3 function types, per-function filters,
#     non-default score_mode/boost_mode, max_boost.
# ---------------------------------------------------------------------------

_FSCORE_MODES_ORACLE = """
WITH f AS (
  SELECT event_id, user_id,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events WHERE event_type = 'purchase'
),
scored AS (
  SELECT event_id,
         CASE WHEN (CASE WHEN vc >= 5000 THEN TRUE ELSE FALSE END
                    OR TRUE OR user_id % 3 = 0)
              THEN least(
                (CASE WHEN vc >= 5000 THEN 3.0 ELSE 0.0 END)
                + 2.0 * sqrt(vc * 0.01)
                + (CASE WHEN user_id % 3 = 0
                        THEN CAST(user_id % 7 AS DOUBLE) ELSE 0.0 END),
                50.0)
              ELSE 1.0 END + 1.0 AS score
  FROM f
)
SELECT event_id, round(score, 6) AS score
FROM scored ORDER BY score DESC, event_id LIMIT 25
"""


@q("es_search_function_score_modes", _FSCORE_MODES_ORACLE)
def _es_search_function_score_modes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``function_score`` breadth (round-5 item 3): three function
    types in one body — a filtered bare ``weight``, a
    ``field_value_factor`` (sqrt modifier — IEEE-exact across
    engines), and a filtered painless-subset ``script_score`` —
    combined with score_mode=sum (non-default), capped by max_boost,
    then merged with the query score under boost_mode=sum
    (non-default). The oracle replays the exact arithmetic.

    Scale shape: the whole score is ONE codegen projection over the
    filtered scan + TakeOrdered(25) — no joins, no shuffle."""
    from ..operators.querydsl import run_search_body

    out = run_search_body(
        _ev_cents(spark, sf_dir).withColumn(
            "u3", F.col("user_id") % 3 == 0
        ),
        {
            "query": {"function_score": {
                "query": {"term": {"event_type": "purchase"}},
                "functions": [
                    {"filter": {"range": {"vc": {"gte": 5000}}},
                     "weight": 3.0},
                    {"field_value_factor": {"field": "vc",
                                            "factor": 0.01,
                                            "modifier": "sqrt",
                                            "missing": 0.0},
                     "weight": 2.0},
                    {"script_score": {"script": {
                        "source": "doc['user_id'].value % 7"}},
                     "filter": {"term": {"u3": True}}},
                ],
                "score_mode": "sum",
                "boost_mode": "sum",
                "max_boost": 50.0,
            }},
            "size": 25,
            "_source": ["event_id"],
        },
    )
    return out.select(
        "event_id", F.round("_score", 6).alias("score")
    )


# ---------------------------------------------------------------------------
# 32. date_histogram fidelity: fixed_interval + time_zone with empty
#     buckets, calendar week — through a request body.
# ---------------------------------------------------------------------------

_DH_FIXED_ORACLE = """
WITH f AS (
  SELECT ts + INTERVAL '5 hours 45 minutes' AS lts,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
  WHERE user_id % 31 = 7
    AND ts >= TIMESTAMP '2024-01-02' AND ts < TIMESTAMP '2024-01-03'
),
hits AS (
  SELECT strftime(to_timestamp(CAST(floor(epoch(lts) / 1800) * 1800
                                    AS BIGINT))::TIMESTAMP,
                  '%Y-%m-%d %H:%M:%S') AS b,
         count(*) AS doc_count, CAST(sum(vc) AS BIGINT) AS cents
  FROM f GROUP BY 1
),
span AS (SELECT min(b) AS lo, max(b) AS hi FROM hits),
grid AS (
  SELECT strftime(g.t, '%Y-%m-%d %H:%M:%S') AS b
  FROM span, LATERAL (
    SELECT unnest(generate_series(CAST(lo AS TIMESTAMP),
                                  CAST(hi AS TIMESTAMP),
                                  INTERVAL 30 MINUTE)) AS t) g
),
per30 AS (
  SELECT 'per_30m' AS agg_path, g.b AS per_30m, NULL AS per_week,
         coalesce(h.doc_count, 0) AS doc_count,
         coalesce(h.cents, 0) AS cents
  FROM grid g LEFT JOIN hits h USING (b)
),
wk AS (
  SELECT 'per_week' AS agg_path, NULL AS per_30m,
         strftime(date_trunc('week', lts), '%Y-%m-%d') AS per_week,
         count(*) AS doc_count, CAST(sum(vc) AS BIGINT) AS cents
  FROM f GROUP BY 3
)
SELECT * FROM per30 UNION ALL SELECT * FROM wk
"""


@q("es_search_date_histogram_fixed", _DH_FIXED_ORACLE)
def _es_search_date_histogram_fixed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """date_histogram fidelity (round-5 item 4): ``fixed_interval:
    30m`` bucketing under ``time_zone: +05:45`` (boundaries shift 15
    minutes off the UTC grid) with ``min_doc_count: 0`` emitting the
    empty half-hours of a sparse day, next to a calendar ``week``
    bucket in the same body — the first thing a real Kibana dashboard
    sends. Keys are local bucket-start strings (ES's key_as_string
    reading); the oracle shifts, floors and grids the same way.

    Scale shape: both levels share ONE groupingSets aggregation; the
    gap grid explodes from one min/max row over the KB-scale bucket
    frame."""
    from ..operators.querydsl import run_search_body

    out = run_search_body(
        _ev_cents(spark, sf_dir).withColumn(
            "sparse", F.col("user_id") % 31 == 7
        ),
        {
            "query": {"bool": {"must": [
                {"term": {"sparse": True}},
                {"range": {"ts": {"gte": "2024-01-02",
                                  "lt": "2024-01-03"}}},
            ]}},
            "aggs": {
                "per_30m": {
                    "date_histogram": {"field": "ts",
                                       "fixed_interval": "30m",
                                       "time_zone": "+05:45",
                                       "min_doc_count": 0},
                    "aggs": {"cents": {"sum": {"field": "vc"}}},
                },
                "per_week": {
                    "date_histogram": {"field": "ts",
                                       "calendar_interval": "week",
                                       "time_zone": "+05:45"},
                    "aggs": {"wcents": {"sum": {"field": "vc"}}},
                },
            },
        },
    )
    return out.select(
        "agg_path", "per_30m", "per_week", "doc_count",
        F.coalesce(F.col("cents"), F.col("wcents")).cast("long")
        .alias("cents"),
    )


# ---------------------------------------------------------------------------
# 33. terms paging semantics: shard_size / doc_count_error_upper_bound
#     through the body, multi_terms bucket source, ES default size.
# ---------------------------------------------------------------------------

_TERMS_PAGING_ORACLE = """
WITH base AS (
  SELECT source AS term,
         (('0x' || substr(md5('sh:' || CAST(doc_id AS VARCHAR)), 1, 4))
           ::BIGINT) % 8 AS shard
  FROM documents
),
pc AS (SELECT shard, term, count(*) AS cnt FROM base GROUP BY 1, 2),
r AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY shard ORDER BY cnt DESC, term ASC) AS rn,
         count(*) OVER (PARTITION BY shard) AS shard_terms
  FROM pc
),
kept AS (SELECT * FROM r WHERE rn <= 4),
thr AS (
  SELECT shard,
         CASE WHEN max(shard_terms) > 4 THEN min(cnt) ELSE 0 END AS thr
  FROM kept GROUP BY shard
),
tot AS (SELECT CAST(sum(thr) AS BIGINT) AS total_thr FROM thr),
merged AS (
  SELECT k.term, CAST(sum(k.cnt) AS BIGINT) AS doc_count,
         CAST(sum(t.thr) AS BIGINT) AS covered
  FROM kept k JOIN thr t USING (shard) GROUP BY k.term
),
tpart AS (
  SELECT 'top_src' AS agg_path, term AS top_src,
         NULL AS src_lang, doc_count,
         CAST(tot.total_thr - covered AS BIGINT)
           AS doc_count_error_upper_bound
  FROM merged CROSS JOIN tot
  ORDER BY doc_count DESC, term ASC LIMIT 6
),
mpart AS (
  SELECT 'src_lang' AS agg_path, NULL AS top_src,
         source || '|' || lang AS src_lang,
         count(*) AS doc_count, NULL::BIGINT AS doc_count_error_upper_bound
  FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL
  GROUP BY 3 ORDER BY doc_count DESC, src_lang ASC LIMIT 10
)
SELECT * FROM tpart UNION ALL SELECT * FROM mpart
"""


@q("es_search_terms_paging", _TERMS_PAGING_ORACLE)
def _es_search_terms_paging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms paging semantics through a request body (round-5 item
    8): a sharded ``terms`` (8 simulated md5 shards, shard_size 4,
    size 6) reproduces ES's shard-local top-K merge — possibly
    undercounted doc_counts and the exact per-bucket
    ``doc_count_error_upper_bound`` contract — next to a
    ``multi_terms`` source+lang bucket that exercises ES's DEFAULT
    size=10 reading (no explicit size in the body).

    Scale shape: the sharded terms is one partial-aggregated exchange
    to (shard, term) counts with everything after shard_size x shards
    rows; multi_terms shares the standard terms lowering (one
    groupBy + a KB-scale top-N window)."""
    from ..operators.querydsl import run_search_body

    out = run_search_body(
        _t(spark, sf_dir, "documents"),
        {
            "aggs": {
                "top_src": {"terms": {
                    "field": "source", "size": 6,
                    "shards": 8, "shard_size": 4, "shard_key": "doc_id",
                    "show_term_doc_count_error": True,
                }},
                "src_lang": {"multi_terms": {
                    "terms": [{"field": "source"}, {"field": "lang"}],
                }},
            },
        },
    )
    return out.select(
        "agg_path", "top_src", "src_lang", "doc_count",
        "doc_count_error_upper_bound",
    )


# ---------------------------------------------------------------------------
# 34. round-5 metric/bucket additions in one body: boxplot, MAD,
#     top_metrics, rate, rare_terms, histogram offset+extended_bounds.
# ---------------------------------------------------------------------------

_AGGS_R5_ORACLE = """
WITH f AS (
  SELECT event_id, user_id, value,
         CAST(round(value * 100) AS BIGINT) AS vc,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
  FROM events WHERE event_type IN ('click', 'purchase')
),
base AS (
  SELECT *, row_number() OVER (
    PARTITION BY day ORDER BY value DESC, vc ASC, event_id) AS rn
  FROM f
),
med AS (SELECT day, median(value) AS med FROM f GROUP BY day),
madt AS (
  SELECT f.day, median(abs(f.value - m.med)) AS mad
  FROM f JOIN med m USING (day) GROUP BY f.day
),
per_day AS (
  SELECT 'per_day' AS agg_path, b.day, NULL AS rare_user,
         NULL::DOUBLE AS band, count(*) AS doc_count,
         round(min(b.value), 6) AS box_min,
         round(quantile_cont(b.value, 0.25), 6) AS box_q1,
         round(quantile_cont(b.value, 0.50), 6) AS box_q2,
         round(quantile_cont(b.value, 0.75), 6) AS box_q3,
         round(max(b.value), 6) AS box_max,
         round(max(md.mad), 6) AS mad_v,
         round(CAST(sum(b.vc) AS DOUBLE) / 24.0, 6) AS hourly_cents,
         max(CASE WHEN b.rn = 1 THEN b.vc END) AS best_vc
  FROM base b JOIN madt md USING (day)
  GROUP BY b.day
),
rare AS (
  SELECT 'rare_user' AS agg_path, NULL AS day,
         CAST(user_id AS VARCHAR) AS rare_user, NULL::DOUBLE AS band,
         count(*) AS doc_count,
         NULL::DOUBLE AS box_min, NULL::DOUBLE AS box_q1,
         NULL::DOUBLE AS box_q2, NULL::DOUBLE AS box_q3,
         NULL::DOUBLE AS box_max, NULL::DOUBLE AS mad_v,
         NULL::DOUBLE AS hourly_cents, NULL::BIGINT AS best_vc
  FROM f GROUP BY user_id HAVING count(*) <= 2
),
hits AS (
  SELECT floor((value - 2.5) / 25.0) * 25.0 + 2.5 AS band,
         count(*) AS doc_count
  FROM f GROUP BY 1
),
span AS (
  SELECT least(CAST(round((min(band) - 2.5) / 25.0) AS BIGINT),
               CAST(floor((-20 - 2.5) / 25.0) AS BIGINT)) AS lo,
         greatest(CAST(round((max(band) - 2.5) / 25.0) AS BIGINT),
                  CAST(floor((120 - 2.5) / 25.0) AS BIGINT)) AS hi
  FROM hits
),
grid AS (
  SELECT g.s * 25.0 + 2.5 AS band
  FROM span, LATERAL (SELECT unnest(generate_series(lo, hi)) AS s) g
),
bands AS (
  SELECT 'bands' AS agg_path, NULL AS day, NULL AS rare_user,
         g.band, coalesce(h.doc_count, 0) AS doc_count,
         NULL::DOUBLE AS box_min, NULL::DOUBLE AS box_q1,
         NULL::DOUBLE AS box_q2, NULL::DOUBLE AS box_q3,
         NULL::DOUBLE AS box_max, NULL::DOUBLE AS mad_v,
         NULL::DOUBLE AS hourly_cents, NULL::BIGINT AS best_vc
  FROM grid g LEFT JOIN hits h USING (band)
)
SELECT * FROM per_day UNION ALL SELECT * FROM rare
UNION ALL SELECT * FROM bands
"""


@q("es_search_aggs_round5", _AGGS_R5_ORACLE)
def _es_search_aggs_round5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-5 aggregation additions in ONE request body:
    ``boxplot`` (exact five-number summary), ``median_absolute_
    deviation`` (exact median-of-deviations, two bucket-keyed
    passes), ``top_metrics`` (best document's field under a sort, flat
    column), ``rate`` (per-hour scaling inside day buckets),
    ``rare_terms`` (long-tail users, max_doc_count 2), and
    ``histogram`` with ``offset`` + ``min_doc_count: 0`` +
    ``extended_bounds`` (the grid stretches beyond the observed
    span). The oracle replays every formula, including the offset
    grid arithmetic.

    Scale shape: per_day/rare/bands levels each cost one partial-agg
    exchange; MAD adds two bucket-keyed passes with broadcast-back;
    top_metrics is one window; the gap grid explodes from a single
    min/max row."""
    from ..operators.querydsl import run_search_body

    out = run_search_body(
        _ev_cents(spark, sf_dir).withColumn(
            "user_str", F.col("user_id").cast("string")
        ),
        {
            "query": {"terms": {"event_type": ["click", "purchase"]}},
            "aggs": {
                "per_day": {
                    "date_histogram": {"field": "ts",
                                       "calendar_interval": "day"},
                    "aggs": {
                        "box": {"boxplot": {"field": "value"}},
                        "mad_v": {"median_absolute_deviation":
                                  {"field": "value"}},
                        "best": {"top_metrics": {
                            "metrics": [{"field": "vc"}],
                            "sort": [{"value": {"order": "desc"}}]}},
                        "hourly_cents": {"rate": {"field": "vc",
                                                  "unit": "hour"}},
                    },
                },
                "rare_user": {"rare_terms": {"field": "user_str",
                                             "max_doc_count": 2}},
                "bands": {"histogram": {
                    "field": "value", "interval": 25.0, "offset": 2.5,
                    "min_doc_count": 0,
                    "extended_bounds": {"min": -20, "max": 120},
                }},
            },
        },
    )
    return out.select(
        "agg_path",
        F.col("per_day").alias("day"),
        "rare_user",
        "bands" if "bands" in out.columns else F.lit(None).alias("bands"),
        "doc_count",
        F.round(F.col("box")["min"], 6).alias("box_min"),
        F.round(F.col("box")["q1"], 6).alias("box_q1"),
        F.round(F.col("box")["q2"], 6).alias("box_q2"),
        F.round(F.col("box")["q3"], 6).alias("box_q3"),
        F.round(F.col("box")["max"], 6).alias("box_max"),
        F.round("mad_v", 6).alias("mad_v"),
        F.round("hourly_cents", 6).alias("hourly_cents"),
        F.col("best_vc").cast("long").alias("best_vc"),
    ).withColumnRenamed("bands", "band")


# ---------------------------------------------------------------------------
# 35. round-5 ingest processors: user_agent, fingerprint, script,
#     urldecode — one pipeline, one codegen projection.
# ---------------------------------------------------------------------------

_INGEST_R5_ORACLE = """
WITH staged AS (
  SELECT event_id, user_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS vc,
         CASE user_id % 4
           WHEN 0 THEN 'Mozilla/5.0 AppleWebKit Chrome/'
                       || CAST(100 + user_id % 30 AS VARCHAR)
                       || '.0 Safari/537'
           WHEN 1 THEN 'curl/' || CAST(7 + user_id % 2 AS VARCHAR)
                       || '.88'
           WHEN 2 THEN 'Mozilla/5.0 Firefox/'
                       || CAST(90 + user_id % 40 AS VARCHAR) || '.0'
           ELSE 'custom-agent'
         END AS ua,
         'q%20' || CAST(user_id AS VARCHAR) AS q
  FROM events WHERE event_type = 'signup'
),
parsed AS (
  SELECT event_id,
         CASE WHEN ua LIKE '%Chrome/%' THEN 'chrome'
              WHEN ua LIKE 'curl/%' THEN 'curl'
              WHEN ua LIKE '%Firefox/%' THEN 'firefox'
              ELSE 'other' END AS agent_name,
         CASE WHEN ua LIKE '%Chrome/%'
                THEN CAST(regexp_extract(ua, 'Chrome/([0-9]+)', 1)
                          AS BIGINT)
              WHEN ua LIKE 'curl/%'
                THEN CAST(regexp_extract(ua, '^curl/([0-9]+)', 1)
                          AS BIGINT)
              WHEN ua LIKE '%Firefox/%'
                THEN CAST(regexp_extract(ua, 'Firefox/([0-9]+)', 1)
                          AS BIGINT)
              END AS agent_major,
         ua LIKE 'curl/%' AS agent_is_bot,
         md5(event_type || '|' || CAST(user_id AS VARCHAR)) AS fp,
         CAST(vc AS DOUBLE) / 100.0 + CAST(user_id AS DOUBLE)
           AS scripted,
         replace(q, '%20', ' ') AS qd
  FROM staged
)
SELECT agent_name, agent_is_bot,
       count(*) AS n,
       CAST(count(DISTINCT fp) AS BIGINT) AS n_fp,
       CAST(count(DISTINCT agent_major) AS BIGINT) AS n_majors,
       round(sum(scripted), 2) AS total_scripted,
       CAST(sum(CASE WHEN qd LIKE 'q %' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_decoded
FROM parsed
GROUP BY agent_name, agent_is_bot
"""


@q("ingest_processors_round5", _INGEST_R5_ORACLE)
def _ingest_processors_round5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 ingest processors end-to-end: a synthesized User-Agent
    string through ``user_agent`` (prioritized-regex classification —
    Chrome before Safari, curl flagged bot), ``fingerprint`` (MD5 over
    two fields in request order), ``script`` (painless arithmetic
    subset computing a derived number), and ``urldecode`` — then an
    aggregate whose every column depends on a processor output, so
    classification boundaries, hash bytes, script arithmetic and
    decoding are all under the value hash.

    Scale shape: the whole processor chain is ONE codegen projection
    (zero Python, zero shuffles before the final partial-agg
    groupBy)."""
    from ..operators.ingest import apply_ingest_pipeline

    ev = _ev_cents(spark, sf_dir).filter(
        F.col("event_type") == "signup"
    ).select(
        "event_id", "user_id", "event_type", "vc", "value",
        F.when(
            F.col("user_id") % 4 == 0,
            F.concat(F.lit("Mozilla/5.0 AppleWebKit Chrome/"),
                     (F.lit(100) + F.col("user_id") % 30).cast("string"),
                     F.lit(".0 Safari/537")),
        ).when(
            F.col("user_id") % 4 == 1,
            F.concat(F.lit("curl/"),
                     (F.lit(7) + F.col("user_id") % 2).cast("string"),
                     F.lit(".88")),
        ).when(
            F.col("user_id") % 4 == 2,
            F.concat(F.lit("Mozilla/5.0 Firefox/"),
                     (F.lit(90) + F.col("user_id") % 40).cast("string"),
                     F.lit(".0")),
        ).otherwise(F.lit("custom-agent")).alias("ua"),
        F.concat(F.lit("q%20"), F.col("user_id").cast("string"))
        .alias("q"),
    )
    out = apply_ingest_pipeline(ev, [
        {"user_agent": {"field": "ua", "target_field": "agent"}},
        {"fingerprint": {"fields": ["event_type", "user_id"],
                         "method": "MD5", "target_field": "fp"}},
        {"script": {"target_field": "scripted", "script": {
            "source": "doc['vc'].value / 100 + doc['user_id'].value"}}},
        {"urldecode": {"field": "q", "target_field": "qd"}},
    ])
    return out.groupBy(
        F.col("`agent.name`").alias("agent_name"),
        F.col("`agent.is_bot`").alias("agent_is_bot"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("fp").cast("long").alias("n_fp"),
        F.countDistinct("`agent.major`").cast("long").alias("n_majors"),
        F.round(F.sum("scripted"), 2).alias("total_scripted"),
        F.sum(F.when(F.col("qd").startswith("q "), 1).otherwise(0))
        .cast("long").alias("n_decoded"),
    )


# ---------------------------------------------------------------------------
# 36. post_filter faceted navigation + track_total_hits section.
# ---------------------------------------------------------------------------

_POST_FILTER_ORACLE = """
WITH f AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events WHERE event_type IN ('click', 'view', 'purchase')
),
hits AS (
  SELECT event_id, vc,
         CAST(row_number() OVER (ORDER BY vc DESC, event_id)
              AS BIGINT) AS hit_rank
  FROM f WHERE event_type = 'purchase'
  ORDER BY vc DESC, event_id LIMIT 5
),
ag AS (
  SELECT event_type, count(*) AS doc_count FROM f GROUP BY event_type
),
tot AS (SELECT count(*) AS doc_count FROM f
        WHERE event_type = 'purchase')
SELECT 'hits' AS section, hit_rank, event_id, vc,
       NULL AS agg_path, NULL AS per_type, NULL::BIGINT AS doc_count
FROM hits
UNION ALL
SELECT 'aggs', NULL, NULL, NULL, 'per_type', event_type, doc_count
FROM ag
UNION ALL
SELECT 'total', NULL, NULL, NULL, NULL, NULL, doc_count FROM tot
"""


@q("es_search_post_filter", _POST_FILTER_ORACLE)
def _es_search_post_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES faceted navigation: ``post_filter`` narrows the HIT list
    only, AFTER aggregations — the facet counts keep showing every
    event type while the hit page shows only the clicked one — plus
    ``track_total_hits`` as a third section row carrying the full
    post-filtered hit count (not the page size).

    Scale shape: one filtered scan feeds the agg branch; the hit
    branch adds the post_filter conjunct (still pushdown-eligible) +
    TakeOrdered; the total is one count row."""
    from ..operators.querydsl import run_search_body

    out = run_search_body(
        _ev_cents(spark, sf_dir),
        {
            "query": {"terms": {"event_type":
                                ["click", "view", "purchase"]}},
            "post_filter": {"term": {"event_type": "purchase"}},
            "sort": [{"vc": "desc"}],
            "size": 5,
            "_source": ["event_id", "vc"],
            "aggs": {"per_type": {"terms": {"field": "event_type"}}},
            "track_total_hits": True,
        },
    )
    return out.select(
        "section", "hit_rank", "event_id", "vc", "agg_path",
        "per_type", "doc_count",
    )


# ---------------------------------------------------------------------------
# 37. geo_distance aggregation rings + percentile_ranks per ring.
# ---------------------------------------------------------------------------

_GEO_RINGS_ORACLE = """
WITH pts AS (
  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c,
         -6000 + (c_custkey * 7) % 12000 AS lat,
         -18000 + (c_custkey * 13) % 36000 AS lon
  FROM customer
),
d AS (
  SELECT *, sqrt(CAST(lat * lat + lon * lon AS DOUBLE)) AS dist
  FROM pts
),
ring AS (
  SELECT CASE WHEN dist < 4000 THEN '*-4000'
              WHEN dist < 9000 THEN '4000-9000'
              ELSE '9000-*' END AS rings,
         bal_c
  FROM d
)
SELECT 'rings' AS agg_path, rings, count(*) AS doc_count,
       round(100.0 * sum(CASE WHEN bal_c <= 0 THEN 1 ELSE 0 END)
             / count(bal_c), 6) AS rank_zero,
       round(100.0 * sum(CASE WHEN bal_c <= 500000 THEN 1 ELSE 0 END)
             / count(bal_c), 6) AS rank_5k
FROM ring GROUP BY rings
"""


@q("es_search_geo_rings", _GEO_RINGS_ORACLE)
def _es_search_geo_rings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``geo_distance`` AGGREGATION (distance-banded rings from an
    origin over the planar centi-degree customer points — the agg twin
    of the geo_distance query) with a ``percentile_ranks`` metric per
    ring: the percent of customers at-or-below two account-balance
    marks, EXACT (count-based) where ES interpolates from t-digest.

    Scale shape: the rings are the standard explode lowering (one
    partial-agg exchange; docs land in every matching band — disjoint
    here), percentile_ranks is two codegen conditional sums in the
    same aggregation."""
    from ..operators.querydsl import run_search_body

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.struct(
            (F.lit(-6000) + (F.col("c_custkey") * 7) % 12000).alias("lat"),
            (F.lit(-18000) + (F.col("c_custkey") * 13) % 36000).alias(
                "lon"
            ),
        ).alias("loc"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    )
    out = run_search_body(
        cust,
        {
            "aggs": {"rings": {
                "geo_distance": {
                    "field": "loc",
                    "origin": {"lat": 0, "lon": 0},
                    "ranges": [{"to": 4000},
                               {"from": 4000, "to": 9000},
                               {"from": 9000}],
                },
                "aggs": {"ranks": {"percentile_ranks": {
                    "field": "bal_c", "values": [0, 500000]}}},
            }},
        },
    )
    return out.select(
        "agg_path",
        "rings",
        "doc_count",
        F.round(F.element_at("ranks", 1), 6).alias("rank_zero"),
        F.round(F.element_at("ranks", 2), 6).alias("rank_5k"),
    )


# ---------------------------------------------------------------------------
# 38. nested AGGREGATION + runtime_mappings + script sort in one body.
# ---------------------------------------------------------------------------

_NESTED_AGG_ORACLE = """
WITH parents AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_items
  FROM lineitem GROUP BY l_orderkey
),
kept AS (SELECT * FROM parents WHERE n_items >= 6 AND n_items % 5 >= 1),
nested AS (
  SELECT l.l_returnflag AS flag,
         count(*) AS doc_count,
         round(sum(l.l_extendedprice * (1 - l.l_discount)), 2)
           AS revenue
  FROM lineitem l JOIN kept k USING (l_orderkey)
  GROUP BY l.l_returnflag
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS doc_count
  FROM lineitem l JOIN kept k USING (l_orderkey)
),
hits AS (
  SELECT l_orderkey, n_items,
         CAST(row_number() OVER (
           ORDER BY n_items % 5 DESC, l_orderkey) AS BIGINT)
           AS hit_rank
  FROM kept ORDER BY n_items % 5 DESC, l_orderkey LIMIT 5
)
SELECT 'hits' AS section, hit_rank, l_orderkey, n_items,
       NULL AS agg_path, NULL AS flag,
       NULL::BIGINT AS doc_count, NULL::DOUBLE AS revenue
FROM hits
UNION ALL
SELECT 'aggs', NULL, NULL, NULL, 'items', NULL, doc_count, NULL
FROM tot
UNION ALL
SELECT 'aggs', NULL, NULL, NULL, 'items>per_flag', flag, doc_count,
       revenue
FROM nested
"""


@q("es_search_nested_agg", _NESTED_AGG_ORACLE)
def _es_search_nested_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``nested`` AGGREGATION (the agg twin of the nested query):
    orders carry their lineitems as an ``array<struct>`` field, a
    ``runtime_mappings`` field (items modulo 5 — defined IN the
    request) filters and script-sorts the hit page, and the nested
    agg re-scopes doc_count to NESTED docs with a per-returnflag
    revenue breakdown underneath.

    Scale shape: the nested level is ONE explode + partial-agg
    exchange; runtime fields are withColumn expressions visible to
    query, sort and aggs; hits stay TakeOrdered. The parent frame
    (the synthesized nested-document "index") is materialized ONCE
    with localCheckpoint: the hits section and the nested agg both
    consume it, and without the cut the collect_list aggregation (the
    whole corpus reshaped into arrays) re-executes per section —
    measured 1.8 -> 1.2 s at sf0.1, and at 100 TB it is the difference
    between building the nested index once or twice."""
    from ..operators.querydsl import run_search_body

    li = _t(spark, sf_dir, "lineitem")
    parents = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(
                F.col("l_returnflag").alias("flag"),
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).alias("rev"),
            )
        ).alias("items"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    ).localCheckpoint()
    out = run_search_body(
        parents,
        {
            "runtime_mappings": {"m5": {"type": "long", "script": {
                "source": "doc['n_items'].value % 5"}}},
            "query": {"bool": {"must": [
                {"range": {"n_items": {"gte": 6}}},
                {"range": {"m5": {"gte": 1}}},
            ]}},
            "sort": [{"_script": {"type": "number", "order": "desc",
                                  "script": {"source":
                                             "doc['n_items'].value % 5"
                                             }}}],
            "size": 5,
            "_source": ["l_orderkey", "n_items"],
            "aggs": {"items": {
                "nested": {"path": "items"},
                "aggs": {"per_flag": {
                    "terms": {"field": "items.flag"},
                    "aggs": {"revenue": {"sum": {"field": "items.rev"}}},
                }},
            }},
        },
    )
    return out.select(
        "section", "hit_rank", "l_orderkey", "n_items", "agg_path",
        F.col("per_flag").alias("flag"), "doc_count",
        F.round("revenue", 2).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# 39. significant_text + terms include + filters other_bucket.
# ---------------------------------------------------------------------------

_SIG_TEXT_ORACLE = r"""
WITH toks AS (
  SELECT doc_id, source, lang, n_chars,
         list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                     x -> x <> '') AS tok_list
  FROM documents
),
fg AS (SELECT * FROM toks WHERE source = 'src3'),
fgt AS (
  SELECT t.tok AS sig, count(*) AS doc_count
  FROM fg, unnest(list_distinct(tok_list)) AS t(tok) GROUP BY 1
),
bgt AS (
  SELECT t.tok AS sig, count(*) AS bg_count
  FROM toks, unnest(list_distinct(tok_list)) AS t(tok) GROUP BY 1
),
fgn AS (SELECT count(*) AS n FROM fg WHERE len(tok_list) > 0),
bgn AS (SELECT count(*) AS n FROM toks WHERE len(tok_list) > 0),
sig AS (
  SELECT f.sig, f.doc_count, b.bg_count,
         round((f.doc_count * 1.0 / fgn.n - b.bg_count * 1.0 / bgn.n)
               * ((f.doc_count * 1.0 / fgn.n)
                  / (b.bg_count * 1.0 / bgn.n)), 6) AS score
  FROM fgt f JOIN bgt b USING (sig) CROSS JOIN fgn CROSS JOIN bgn
  WHERE f.doc_count * 1.0 / fgn.n > b.bg_count * 1.0 / bgn.n
  ORDER BY score DESC, f.sig ASC LIMIT 5
),
langs AS (
  SELECT lang, count(*) AS doc_count FROM fg
  WHERE lang IN ('en', 'de') GROUP BY lang
),
cls AS (
  SELECT CASE WHEN n_chars < 150 THEN 'short' ELSE 'long' END AS c,
         count(*) AS doc_count
  FROM fg GROUP BY 1
)
SELECT 'sig' AS agg_path, sig, NULL AS langs, NULL AS len_cls,
       doc_count, bg_count, score
FROM sig
UNION ALL
SELECT 'langs', NULL, lang, NULL, doc_count, NULL, NULL FROM langs
UNION ALL
SELECT 'len_cls', NULL, NULL, c, doc_count, NULL, NULL FROM cls
"""


@q("es_search_significant_text", _SIG_TEXT_ORACLE)
def _es_search_significant_text(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``significant_text`` (the significant_terms machinery over
    ANALYZED TOKENS — what "what words distinguish these documents"
    dashboards send) next to a ``terms`` with an ``include`` gate and
    a ``filters`` agg with ``other_bucket_key``: foreground = one
    source's documents, background = the whole corpus, JLH-scored
    top-5 tokens; the oracle replays tokenization, doc-frequency
    counting and the score formula.

    Scale shape: fg/bg are one explode + vocabulary-sized groupBy
    each; totals ride single-row broadcast frames; the other levels
    share the standard lowering."""
    from ..operators.querydsl import run_search_body

    out = run_search_body(
        _t(spark, sf_dir, "documents"),
        {
            "query": {"term": {"source": "src3"}},
            "aggs": {
                "sig": {"significant_text": {"field": "text",
                                             "size": 5}},
                "langs": {"terms": {"field": "lang",
                                    "include": "en|de"}},
                "len_cls": {"filters": {
                    "filters": {"short": {"range":
                                          {"n_chars": {"lt": 150}}}},
                    "other_bucket_key": "long",
                }},
            },
        },
    )
    return out.select(
        "agg_path", "sig", "langs", "len_cls", "doc_count",
        "bg_count", F.round("score", 6).alias("score"),
    )


# ---------------------------------------------------------------------------
# 40. _msearch: several request bodies in one call.
# ---------------------------------------------------------------------------

_MSEARCH_ORACLE = """
WITH f AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
),
r1 AS (
  SELECT CAST(1 AS BIGINT) AS request, event_id, vc, NULL AS per_type,
         NULL::BIGINT AS doc_count
  FROM f WHERE event_type = 'purchase'
  ORDER BY vc DESC, event_id LIMIT 3
),
r2 AS (
  SELECT CAST(2 AS BIGINT) AS request, NULL::BIGINT AS event_id, NULL::BIGINT AS vc,
         event_type AS per_type, count(*) AS doc_count
  FROM f GROUP BY event_type
),
r3 AS (
  SELECT CAST(3 AS BIGINT) AS request, event_id, vc, NULL AS per_type,
         NULL::BIGINT AS doc_count
  FROM f WHERE event_type = 'signup'
  ORDER BY vc ASC, event_id LIMIT 2
)
SELECT request, event_id, vc, per_type, doc_count FROM r1
UNION ALL SELECT request, event_id, vc, per_type, doc_count FROM r2
UNION ALL SELECT request, event_id, vc, per_type, doc_count FROM r3
"""


@q("es_msearch_batch", _MSEARCH_ORACLE)
def _es_msearch_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``_msearch``: three request bodies against one index in a
    single call — a score-free top hit list, a terms aggregation, and
    a second hit list with the opposite sort — unioned with a 1-based
    ``request`` ordinal; each body's absent columns are NULL on its
    rows.

    Scale shape: one plan branch per body over the shared scan; no
    cross-body shuffles."""
    from ..operators.querydsl import run_msearch

    out = run_msearch(
        _ev_cents(spark, sf_dir),
        [
            {"query": {"term": {"event_type": "purchase"}},
             "sort": [{"vc": "desc"}], "size": 3,
             "_source": ["event_id", "vc"]},
            {"aggs": {"per_type": {"terms": {"field": "event_type"}}}},
            {"query": {"term": {"event_type": "signup"}},
             "sort": [{"vc": "asc"}], "size": 2,
             "_source": ["event_id", "vc"]},
        ],
    )
    return out.select(
        "request", "event_id", "vc", F.col("per_type"), "doc_count"
    )


# ---------------------------------------------------------------------------
# 41. scored bool: must + should clause scores ADD (ES relevance 101).
# ---------------------------------------------------------------------------

_BOOL_SCORED_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
  FROM documents
),
withlen AS (SELECT doc_id, tk, len(tk) AS dl FROM toks),
stats AS (
  SELECT CAST(count(*) FILTER (WHERE len(tk) > 0) AS BIGINT) AS n_docs,
         CAST(sum(len(tk)) FILTER (WHERE len(tk) > 0) AS BIGINT)
           AS total_len
  FROM toks
),
dfreq AS (
  SELECT
    CAST(count(*) FILTER (WHERE list_contains(tk, 'merge')) AS BIGINT)
      AS df_0,
    CAST(count(*) FILTER (WHERE list_contains(tk, 'scan')) AS BIGINT)
      AS df_1,
    CAST(count(*) FILTER (WHERE list_contains(tk, 'vector')) AS BIGINT)
      AS df_2
  FROM toks
),
scored AS (
  SELECT w.doc_id, w.dl, t.lang,
    len(list_filter(w.tk, x -> x = 'merge')) AS tf_0,
    len(list_filter(w.tk, x -> x = 'scan')) AS tf_1,
    len(list_filter(w.tk, x -> x = 'vector')) AS tf_2,
    s.n_docs, s.total_len, d.df_0, d.df_1, d.df_2
  FROM withlen w
  JOIN toks t USING (doc_id)
  CROSS JOIN stats s CROSS JOIN dfreq d
  WHERE tf_0 > 0 OR tf_1 > 0
),
formula AS (
  SELECT doc_id,
    0.0
    + CASE WHEN lang = 'en' THEN 0.5 ELSE 0.0 END
    + CASE WHEN tf_0 > 0 THEN
        ln(1 + (n_docs - df_0 + 0.5) / (df_0 + 0.5))
        * (tf_0 * (1 + {_K1}))
        / (tf_0 + {_K1} * (1 - {_B} + {_B}
           * (dl / (CAST(total_len AS DOUBLE) / n_docs))))
      ELSE 0.0 END
    + CASE WHEN tf_1 > 0 THEN
        ln(1 + (n_docs - df_1 + 0.5) / (df_1 + 0.5))
        * (tf_1 * (1 + {_K1}))
        / (tf_1 + {_K1} * (1 - {_B} + {_B}
           * (dl / (CAST(total_len AS DOUBLE) / n_docs))))
      ELSE 0.0 END
    + CASE WHEN tf_2 > 0 THEN
        ln(1 + (n_docs - df_2 + 0.5) / (df_2 + 0.5))
        * (tf_2 * (1 + {_K1}))
        / (tf_2 + {_K1} * (1 - {_B} + {_B}
           * (dl / (CAST(total_len AS DOUBLE) / n_docs))))
      ELSE 0.0 END AS score
  FROM scored
)
SELECT doc_id, round(score, 6) AS score
FROM formula ORDER BY score DESC, doc_id LIMIT 12
"""


@q("es_search_bool_scored", _BOOL_SCORED_ORACLE)
def _es_search_bool_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCORED ``bool`` — the everyday ES relevance query: every
    matching ``must`` / ``should`` clause ADDS its score (``filter`` /
    ``must_not`` add nothing); here a must ``match`` over two terms, a
    should ``match`` whose BM25 contribution appears only on documents
    containing it, and a should ``term`` with an explicit ``boost``
    0.5 — CONSTANT-SCORE leaves add their boost when they match
    (round-6: previously they added 0, so term-only matches could
    never outrank non-matches). The oracle replays the additive Lucene
    formula term by term plus the constant.

    Scale shape: corpus statistics are ONE broadcast-sized
    aggregation per scoring clause; the combined score is a codegen
    expression + TakeOrdered(12)."""
    from ..operators.querydsl import run_search_body

    out = run_search_body(
        _t(spark, sf_dir, "documents"),
        {
            "query": {"bool": {
                "must": [{"match": {"text": "merge scan"}}],
                "should": [
                    {"match": {"text": "vector"}},
                    {"term": {"lang": {"value": "en", "boost": 0.5}}},
                ],
            }},
            "size": 12,
            "_source": ["doc_id"],
        },
    )
    return out.select("doc_id", F.round("_score", 6).alias("score"))
