"""Round-6 ES ``_search`` surface: Lucene query syntax
(``query_string`` / ``simple_query_string`` — what Kibana's search bar
sends) and explicit ``minimum_should_match`` forms, each a literal
request body through the interpreter, value-checked against a
hand-written DuckDB oracle.

Reference context: the indices the reference ships (main.go:447) are
exactly what Kibana queries with this syntax.

Oracle convention: the whitespace analyzer is reproduced in DuckDB as
``list_filter(string_split_regex(text, '\\s+'), x -> x <> '')`` and
token membership / phrase containment are written against that list —
independent SQL, not a translation of the Spark lowering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .declared import _t, q

# ---------------------------------------------------------------------------
# 1. query_string: the Kibana search bar (strict Lucene subset)
# ---------------------------------------------------------------------------

_QS_ORACLE = """
WITH toks AS (
  SELECT *,
         list_filter(string_split_regex(text, '\\s+'),
                     x -> x <> '') AS tk
  FROM documents
)
SELECT doc_id, lang, source, n_chars
FROM toks
WHERE (
    ' ' || array_to_string(tk, ' ') || ' ' LIKE '% spark table %'
    OR len(list_filter(tk, x -> x LIKE 'quer%')) > 0
  )
  AND lang IN ('en', 'fr')
  AND source <> 'src3'
  AND n_chars >= 100 AND n_chars <= 400
ORDER BY doc_id
LIMIT 50
"""


@q("es_search_query_string", _QS_ORACLE)
def _es_search_query_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``query_string``: one Lucene-syntax line mixing a field-scoped
    group with a quoted phrase and a wildcard, field groups, boolean
    operators, a ``-`` prohibition and a half-open range — parsed by
    operators/luceneq.py and LOWERED to the engine's bool/match tree,
    so it compiles to the same single codegen predicate the
    hand-written DSL would.

    Scale shape: one filter + TakeOrdered — the pushable conjuncts
    (lang, source, n_chars) reach the parquet scan; the token
    predicates run in whole-stage codegen. A parsed Kibana query costs
    exactly what its DSL equivalent costs."""
    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    return run_search_body(docs, {
        "query": {"query_string": {
            "query": (
                'text:("spark table" OR quer*) AND lang:(en OR fr) '
                "AND -source:src3 AND n_chars:[100 TO 400]"
            ),
            "default_field": "text",
        }},
        "sort": [{"doc_id": "asc"}],
        "size": 50,
        "_source": ["doc_id", "lang", "source", "n_chars"],
    })


# ---------------------------------------------------------------------------
# 2. simple_query_string: error-tolerant — the trailing unbalanced
#    quote is DISCARDED (its word re-lexes as a plain term), never an
#    error, exactly ES's "simple" contract
# ---------------------------------------------------------------------------

_SQS_ORACLE = """
WITH toks AS (
  SELECT *,
         list_filter(string_split_regex(text, '\\s+'),
                     x -> x <> '') AS tk
  FROM documents
)
SELECT doc_id, lang, n_chars
FROM toks
WHERE (
    ' ' || array_to_string(tk, ' ') || ' ' LIKE '% batch window %'
    OR (list_contains(tk, 'stream') AND list_contains(tk, 'filter'))
    OR list_contains(tk, 'unbalanced')
  )
  AND NOT list_contains(tk, 'slow')
ORDER BY doc_id
LIMIT 50
"""


@q("es_search_simple_query_string", _SQS_ORACLE)
def _es_search_simple_query_string(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``simple_query_string``: phrase, ``|`` / ``+`` operators, a
    ``-`` prohibition, and a trailing UNBALANCED QUOTE — the quote
    character is dropped and its word degrades to a literal term
    (Lucene SimpleQueryParser's never-raise contract; the strict
    ``query_string`` rejects the same input at plan time).

    Lucene occurs-bucketing: the ``-slow`` operand lands in must_not
    of the enclosing bool, so the query means (phrase OR (stream AND
    filter) OR unbalanced) AND NOT slow."""
    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    return run_search_body(docs, {
        "query": {"simple_query_string": {
            "query": '"batch window" | stream + filter -slow "unbalanced',
            "fields": ["text"],
        }},
        "sort": [{"doc_id": "asc"}],
        "size": 50,
        "_source": ["doc_id", "lang", "n_chars"],
    })


# ---------------------------------------------------------------------------
# 3. minimum_should_match: explicit percentage / negative / default
#    forms over one should list, as an _msearch so all four contracts
#    sit in one oracle-checked frame
# ---------------------------------------------------------------------------

_MSM_ORACLE = """
WITH toks AS (
  SELECT *,
         list_filter(string_split_regex(text, '\\s+'),
                     x -> x <> '') AS tk
  FROM documents
),
m AS (
  SELECT doc_id, n_chars,
         (CASE WHEN list_contains(tk, 'spark') THEN 1 ELSE 0 END
          + CASE WHEN list_contains(tk, 'merge') THEN 1 ELSE 0 END
          + CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS hits,
         CASE WHEN list_contains(tk, 'spark') THEN 1 ELSE 0 END AS c_spark,
         CASE WHEN lang = 'fr' THEN 1 ELSE 0 END AS c_fr
  FROM toks
)
(SELECT CAST(1 AS BIGINT) AS request, doc_id FROM m
 WHERE hits >= 2 ORDER BY doc_id LIMIT 30)
UNION ALL
(SELECT CAST(2 AS BIGINT), doc_id FROM m
 WHERE hits >= 2 ORDER BY doc_id LIMIT 30)
UNION ALL
(SELECT CAST(3 AS BIGINT), doc_id FROM m
 WHERE hits >= 1 ORDER BY doc_id LIMIT 30)
UNION ALL
(SELECT CAST(4 AS BIGINT), doc_id FROM m
 WHERE n_chars <= 120 ORDER BY doc_id LIMIT 30)
"""


@q("es_search_min_should_match", _MSM_ORACLE)
def _es_search_min_should_match(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Explicit ``minimum_should_match`` on ``bool``, all documented
    simple forms in one ``_msearch``:

    1. ``"67%"`` of 3 clauses -> floor(2.01) = 2 required;
    2. ``-1`` -> 3 - 1 = 2 required (same hit set as request 1);
    3. should-only DEFAULT -> 1 required;
    4. mixed context DEFAULT (a ``must`` present) -> 0 required — the
       should clauses stop constraining matching entirely.

    Scale shape: four branches over one shared scan, each a single
    codegen predicate + TakeOrdered(30)."""
    from ..operators.querydsl import run_msearch

    docs = _t(spark, sf_dir, "documents")
    should = [
        {"match": {"text": "spark"}},
        {"match": {"text": "merge"}},
        {"term": {"lang": "en"}},
    ]
    common = {"sort": [{"doc_id": "asc"}], "size": 30,
              "_source": ["doc_id"]}
    return run_msearch(docs, [
        {"query": {"bool": {"should": should,
                            "minimum_should_match": "67%"}}, **common},
        {"query": {"bool": {"should": should,
                            "minimum_should_match": -1}}, **common},
        {"query": {"bool": {"should": should}}, **common},
        {"query": {"bool": {"must": [{"range": {"n_chars": {"lte": 120}}}],
                            "should": [{"match": {"text": "spark"}},
                                       {"term": {"lang": "fr"}}]}},
         **common},
    ])


# ---------------------------------------------------------------------------
# 4. standard analyzer: per-request tokenization for match/BM25
# ---------------------------------------------------------------------------

_K1, _B = 1.2, 0.75

_ANALYZER_SCORED_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS tk
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


@q("es_search_analyzer_standard", _ANALYZER_SCORED_ORACLE)
def _es_search_analyzer_standard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-request ``analyzer: standard`` on a SCORED ``match``: the
    query text ``"Merge,SCAN vector"`` — useless under the whitespace
    default (the token ``Merge,SCAN`` occurs nowhere) — analyzes to
    ``merge / scan / vector`` under standard (lowercase + split on
    non-alphanumerics), and the BM25 corpus statistics (N, avgdl, df)
    are computed over the SAME standard tokenization of the field.
    The oracle recomputes the full Lucene practical formula over
    standard-analyzed tokens in SQL.

    Scale shape: identical to the whitespace scored match — one
    broadcast stats row + closed-form codegen score + TakeOrdered."""
    from pyspark.sql import functions as F

    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    out = run_search_body(docs, {
        "query": {"match": {"text": {
            "query": "Merge,SCAN vector", "analyzer": "standard"}}},
        "size": 20,
        "_source": ["doc_id"],
    })
    return out.select("doc_id", F.round("_score", 6).alias("score"))


_ANALYZER_FIELD_ORACLE = """
SELECT event_id FROM events
WHERE list_contains(
        list_filter(string_split_regex(lower(props), '[^a-z0-9]+'),
                    x -> x <> ''),
        '3')
ORDER BY event_id
LIMIT 40
"""


@q("es_search_analyzer_field_tokens", _ANALYZER_FIELD_ORACLE)
def _es_search_analyzer_field_tokens(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``analyzer: standard`` tokenizing a PUNCTUATED field: the
    events ``props`` column holds JSON text (``{"k": 69}``) that the
    whitespace analyzer sees as two useless tokens; standard splits on
    the punctuation so ``match props "3"`` finds exactly the rows
    whose value token is 3 — the ``"Foo,bar" matches foo`` contract
    from the round-5 verdict, exercised on the field side."""
    from ..operators.querydsl import run_search_body

    ev = _t(spark, sf_dir, "events")
    return run_search_body(ev, {
        "query": {"match": {"props": {
            "query": "3", "analyzer": "standard"}}},
        "sort": [{"event_id": "asc"}],
        "size": 40,
        "_source": ["event_id"],
    })


# ---------------------------------------------------------------------------
# 5. join-field queries through the request body (has_child /
#    has_parent / parent_id) — the standalone lowerings of
#    plans/esrelations.py, now reachable from run_search_body via the
#    relations map
# ---------------------------------------------------------------------------

_HAS_CHILD_BODY_ORACLE = """
WITH hits AS (
  SELECT l_orderkey, count(*) AS n
  FROM lineitem
  WHERE l_returnflag = 'R' AND l_quantity > 45
  GROUP BY 1
)
SELECT o.o_orderkey, o.o_orderstatus, o.o_orderpriority
FROM orders o JOIN hits h ON h.l_orderkey = o.o_orderkey
WHERE h.n >= 2
ORDER BY o.o_orderkey
LIMIT 25
"""


@q("es_search_has_child_body", _HAS_CHILD_BODY_ORACLE)
def _es_search_has_child_body(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``has_child`` sent IN a ``_search`` body: parent orders having
    at least ``min_children: 2`` line items matching the child query,
    via ``relations={type: {df, local_key, foreign_key}}``.

    Scale shape (agg-before-join): the child query collapses to a
    (key, count) aggregate, min/max_children filter that KB-scale
    frame, and the parents stream through ONE left-semi join — no row
    multiplication, parents never scanned per child."""
    from ..operators.querydsl import run_search_body

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return run_search_body(
        orders,
        {
            "query": {"has_child": {
                "type": "lineitem",
                "query": {"bool": {"must": [
                    {"term": {"l_returnflag": "R"}},
                    {"range": {"l_quantity": {"gt": 45}}},
                ]}},
                "min_children": 2,
            }},
            "sort": [{"o_orderkey": "asc"}],
            "size": 25,
            "_source": ["o_orderkey", "o_orderstatus", "o_orderpriority"],
        },
        relations={"lineitem": {
            "df": li, "local_key": "o_orderkey",
            "foreign_key": "l_orderkey",
        }},
    )


_HAS_PARENT_BODY_ORACLE = """
SELECT 'by_flag' AS agg_path, l.l_returnflag AS by_flag,
       CAST(count(*) AS BIGINT) AS doc_count
FROM lineitem l
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_orderkey = l.l_orderkey
    AND o.o_orderpriority = '1-URGENT'
)
GROUP BY l.l_returnflag
"""


@q("es_search_has_parent_body", _HAS_PARENT_BODY_ORACLE)
def _es_search_has_parent_body(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``has_parent`` in a ``_search`` body with an aggregation over
    the matched children: line items whose parent order is 1-URGENT,
    bucketed per returnflag. The parent predicate reduces to a
    distinct key set and the children take one left-semi join."""
    from ..operators.querydsl import run_search_body

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return run_search_body(
        li,
        {
            "query": {"has_parent": {
                "parent_type": "orders",
                "query": {"term": {"o_orderpriority": "1-URGENT"}},
            }},
            "aggs": {"by_flag": {"terms": {"field": "l_returnflag"}}},
        },
        relations={"orders": {
            "df": orders, "local_key": "l_orderkey",
            "foreign_key": "o_orderkey",
        }},
    )


_PARENT_ID_BODY_ORACLE = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       l_returnflag
FROM lineitem
WHERE l_orderkey = 7
ORDER BY l_linenumber
LIMIT 10
"""


@q("es_search_parent_id_body", _PARENT_ID_BODY_ORACLE)
def _es_search_parent_id_body(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``parent_id`` in a ``_search`` body: the children of ONE parent
    — a pushable equality on the child's join column, no join at
    all."""
    from ..operators.querydsl import run_search_body

    li = _t(spark, sf_dir, "lineitem")
    return run_search_body(
        li,
        {
            "query": {"parent_id": {"type": "orders", "id": 7}},
            "sort": [{"l_linenumber": "asc"}],
            "size": 10,
            "_source": ["l_orderkey", "l_linenumber", "l_returnflag"],
        },
        relations={"orders": {"local_key": "l_orderkey"}},
    )


# ---------------------------------------------------------------------------
# 6. sampler / diversified_sampler aggregations in a request body —
#    deterministic first-N-by-identity sampling (the engine's stable
#    reading of ES's per-shard sample), diversity caps per value
# ---------------------------------------------------------------------------

_SAMPLER_BODY_ORACLE = """
WITH s AS (SELECT * FROM documents ORDER BY doc_id LIMIT 200),
d AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY source
                                 ORDER BY doc_id) AS rn
    FROM documents
  ) WHERE rn <= 5
  ORDER BY doc_id LIMIT 60
)
SELECT 'samp' AS agg_path, NULL AS by_lang,
       (SELECT CAST(count(*) AS BIGINT) FROM s) AS doc_count,
       (SELECT CAST(sum(n_chars) AS BIGINT) FROM s) AS chars,
       NULL AS langs
UNION ALL
SELECT 'samp>by_lang', lang, CAST(count(*) AS BIGINT), NULL, NULL
FROM s GROUP BY lang
UNION ALL
SELECT 'div', NULL, (SELECT CAST(count(*) AS BIGINT) FROM d), NULL,
       (SELECT CAST(count(DISTINCT lang) AS BIGINT) FROM d)
"""


@q("es_search_sampler_body", _SAMPLER_BODY_ORACLE)
def _es_search_sampler_body(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``sampler`` and ``diversified_sampler`` aggregations in ONE
    request body: the sampler trims the doc set to the first
    ``shard_size`` documents in identity order (the engine's
    DETERMINISTIC reading of ES's per-shard sample — stable across
    partitionings, so an oracle exists) before sub-aggs; the
    diversified variant caps ``max_docs_per_value: 5`` per source
    first.

    Scale shape: TakeOrdered(shard_size) + one per-key window for the
    diversity cap — never a full sort, never a full-corpus agg."""
    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    return run_search_body(docs, {
        "aggs": {
            "samp": {"sampler": {"shard_size": 200}, "aggs": {
                "by_lang": {"terms": {"field": "lang"}},
                "chars": {"sum": {"field": "n_chars"}},
            }},
            "div": {"diversified_sampler": {
                "field": "source", "max_docs_per_value": 5,
                "shard_size": 60,
            }, "aggs": {
                "langs": {"cardinality": {"field": "lang"}},
            }},
        },
    })


# ---------------------------------------------------------------------------
# 7. reverse_nested in a request body: climb from the nested scope
#    back to parent docs
# ---------------------------------------------------------------------------

_REVNESTED_BODY_ORACLE = """
WITH parents AS (
  SELECT l_orderkey,
         CAST(count(*) AS BIGINT) AS n_items,
         CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT)
           AS n_r
  FROM lineitem GROUP BY 1
),
p2 AS (
  SELECT *, CASE WHEN n_items >= 5 THEN 'big' ELSE 'small' END
           AS size_class
  FROM parents
)
SELECT 'it' AS agg_path, NULL AS by_class,
       (SELECT CAST(sum(n_items) AS BIGINT) FROM parents) AS doc_count,
       NULL AS avg_items
UNION ALL
SELECT 'it>returned', NULL,
       (SELECT CAST(sum(n_r) AS BIGINT) FROM parents), NULL
UNION ALL
SELECT 'it>returned>parents', NULL,
       (SELECT CAST(count(*) AS BIGINT) FROM p2 WHERE n_r > 0),
       (SELECT round(avg(n_items), 6) FROM p2 WHERE n_r > 0)
UNION ALL
SELECT 'it>returned>parents>by_class', size_class,
       CAST(count(*) AS BIGINT), NULL
FROM p2 WHERE n_r > 0 GROUP BY size_class
"""


@q("es_search_reverse_nested_body", _REVNESTED_BODY_ORACLE)
def _es_search_reverse_nested_body(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``reverse_nested`` in a request body: orders carry their line
    items as an ``array<struct>`` nested field; the agg descends into
    the nested scope, filters to returned items, then climbs BACK to
    parent granularity (``id_col`` engine extension names the parent
    identity) for a per-size-class breakdown and a parent-level
    average.

    Scale shape: one explode for the nested scope; the climb is one
    dropDuplicates exchange on the parent id; everything after
    aggregates parent-sized frames."""
    from pyspark.sql import functions as F

    from ..operators.querydsl import run_search_body

    li = _t(spark, sf_dir, "lineitem")
    parents = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(F.col("l_returnflag").alias("flag"))
        ).alias("items"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    ).withColumn(
        "size_class",
        F.when(F.col("n_items") >= 5, "big").otherwise("small"),
    )
    out = run_search_body(parents, {
        "aggs": {"it": {"nested": {"path": "items"}, "aggs": {
            "returned": {"filter": {"term": {"items.flag": "R"}},
                         "aggs": {
                "parents": {"reverse_nested": {"id_col": "l_orderkey"},
                            "aggs": {
                    "by_class": {"terms": {"field": "size_class"}},
                    "avg_items": {"avg": {"field": "n_items"}},
                }},
            }},
        }}},
    })
    return out.select(
        "agg_path", "by_class", "doc_count",
        F.round("avg_items", 6).alias("avg_items"),
    )


# ---------------------------------------------------------------------------
# 8. scroll / point-in-time export: disjoint, exhaustive pages that
#    are IMMUNE to concurrent appends
# ---------------------------------------------------------------------------

_SCROLL_ORACLE = """
SELECT CAST((row_number() OVER (ORDER BY doc_id) - 1) // 25 + 1
            AS BIGINT) AS page,
       doc_id, lang
FROM documents
WHERE doc_id < 60
ORDER BY doc_id
"""


@q("es_scroll_pit_export", _SCROLL_ORACLE)
def _es_scroll_pit_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scroll/PIT export contract, proven under a CONCURRENT APPEND:
    a 60-document snapshot is written to a scratch table, a
    point-in-time view opens (pinning the file listing), the first
    page is read, MORE documents are appended to the same path, and
    the scroll continues — the appended rows never appear, the pages
    are disjoint, and their union is exactly the snapshot (the
    oracle's row_number paging over the original 60 docs).

    Scale shape: each page is one filtered TakeOrdered scan (the
    search_after cursor predicate prunes before the top-N), and the
    driver holds one page of rows at a time — page 100 costs what
    page 1 costs, which is why ES deprecated scroll for this exact
    pattern."""
    import tempfile

    from pyspark.sql import functions as F

    from ..operators.querydsl import run_search_body
    from ..operators.scroll import open_pit, run_scroll

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    path = tempfile.mkdtemp(prefix="pit_export_") + "/docs"
    docs.filter(F.col("doc_id") < 60).write.parquet(path)

    pit = open_pit(spark, path)
    body = {"sort": [{"doc_id": "asc"}], "_source": ["doc_id", "lang"]}
    pages = run_scroll(pit, body, page_size=25)
    first = next(pages)

    # concurrent append AFTER the PIT opened: invisible to the scroll
    docs.filter(
        (F.col("doc_id") >= 60) & (F.col("doc_id") < 80)
    ).write.mode("append").parquet(path)

    collected = [(1, first)]
    for i, rows in enumerate(pages, start=2):
        collected.append((i, rows))
    # one partition: the whole export is a few pages of driver-held
    # rows; bare createDataFrame would parallelize them across 32
    # near-empty Python-RDD slices (pure task-launch overhead)
    out = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [
                (page, r["doc_id"], r["lang"])
                for page, rows in collected
                for r in rows
            ],
            1,
        ),
        "page long, doc_id long, lang string",
    )
    return out


# ---------------------------------------------------------------------------
# 9. more_like_this through the request body (scan-based term
#    selection; the index-backed variant is plans/searchindex.py)
# ---------------------------------------------------------------------------

_MLT_BODY_LIKE = "merge scan vector table window merge"
_MLT_BODY_N = 3

_MLT_BODY_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'),
                     t -> t <> '') AS tk
  FROM documents
),
tf AS (
  SELECT doc_id, unnest(tk) AS term FROM toks
),
tf2 AS (
  SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY doc_id, term
),
dl AS (SELECT doc_id, len(tk) AS dl FROM toks),
stats AS (
  SELECT CAST(count(*) FILTER (WHERE len(tk) > 0) AS BIGINT) AS n_docs,
         CAST(sum(len(tk)) FILTER (WHERE len(tk) > 0) AS BIGINT)
           AS total_len
  FROM toks
),
lt AS (
  SELECT term, count(*) AS ltf
  FROM (SELECT unnest(string_split('{_MLT_BODY_LIKE}', ' ')) AS term)
  GROUP BY term
),
ldf AS (
  SELECT term, count(DISTINCT doc_id) AS df
  FROM tf WHERE term IN (SELECT term FROM lt) GROUP BY term
),
selr AS (
  SELECT lt.term,
         row_number() OVER (
           ORDER BY lt.ltf * ln(1.0 + (stats.n_docs - ldf.df + 0.5)
                                      / (ldf.df + 0.5)) DESC,
                    lt.term ASC) AS rn
  FROM lt JOIN ldf USING (term) CROSS JOIN stats
),
sel AS (SELECT term FROM selr WHERE rn <= {_MLT_BODY_N}),
p AS (SELECT tf2.* FROM tf2 JOIN sel USING (term)),
c AS (
  SELECT p.doc_id,
         ln(1.0 + (stats.n_docs - ldf.df + 0.5) / (ldf.df + 0.5))
         * ((p.tf * (1.0 + {_K1}))
            / (p.tf + {_K1} * (1.0 - {_B} + {_B}
               * (dl.dl / (CAST(stats.total_len AS DOUBLE)
                           / stats.n_docs))))) AS contrib
  FROM p
  JOIN ldf USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
),
d AS (
  SELECT doc_id, round(list_sum(list(contrib ORDER BY doc_id)), 6)
           AS score
  FROM c GROUP BY doc_id
)
SELECT doc_id, score FROM d
ORDER BY score DESC, doc_id
LIMIT 15
"""


@q("es_search_more_like_this_body", _MLT_BODY_ORACLE)
def _es_search_more_like_this_body(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``more_like_this`` sent IN a ``_search`` body, index-free: the
    like text's terms rank by tf(like) x BM25-idf against the frame's
    document frequencies (duplicate like-terms boost tf), the top
    ``max_query_terms: 3`` become the query, docs sharing at least
    ``minimum_should_match: 60%`` (-> 1) of them match, and hits are
    score-ordered by the summed BM25 of the selected terms. The
    oracle replays term selection AND the ranking relationally.

    Scale shape: ONE like-term-bounded stats aggregation for the
    selection (a broadcast-sized row, corpus never shuffled), one for
    the BM25 score, then a codegen predicate + TakeOrdered(15)."""
    from pyspark.sql import functions as F

    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    out = run_search_body(docs, {
        "query": {"more_like_this": {
            "fields": ["text"],
            "like": _MLT_BODY_LIKE,
            "min_term_freq": 1,
            "min_doc_freq": 1,
            "max_query_terms": _MLT_BODY_N,
            "minimum_should_match": "60%",
        }},
        "size": 15,
        "_source": ["doc_id"],
    })
    return out.select("doc_id", F.round("_score", 6).alias("score"))


# ---------------------------------------------------------------------------
# 10. dis_max scoring with tie_breaker + query-level boost
# ---------------------------------------------------------------------------

_DISMAX_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'),
                     t -> t <> '') AS tk
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
      AS df_m,
    CAST(count(*) FILTER (WHERE list_contains(tk, 'scan')) AS BIGINT)
      AS df_s
  FROM toks
),
scored AS (
  SELECT w.doc_id, w.dl,
    len(list_filter(w.tk, x -> x = 'merge')) AS tf_m,
    len(list_filter(w.tk, x -> x = 'scan')) AS tf_s,
    s.n_docs, s.total_len, d.df_m, d.df_s
  FROM withlen w CROSS JOIN stats s CROSS JOIN dfreq d
  WHERE tf_m > 0 OR tf_s > 0
),
arms AS (
  SELECT doc_id,
    CASE WHEN tf_m > 0 THEN
      2.0 * ln(1 + (n_docs - df_m + 0.5) / (df_m + 0.5))
      * (tf_m * (1 + {_K1}))
      / (tf_m + {_K1} * (1 - {_B} + {_B}
         * (dl / (CAST(total_len AS DOUBLE) / n_docs))))
    END AS a_m,
    CASE WHEN tf_s > 0 THEN
      ln(1 + (n_docs - df_s + 0.5) / (df_s + 0.5))
      * (tf_s * (1 + {_K1}))
      / (tf_s + {_K1} * (1 - {_B} + {_B}
         * (dl / (CAST(total_len AS DOUBLE) / n_docs))))
    END AS a_s
  FROM scored
),
f AS (
  SELECT doc_id,
    greatest(coalesce(a_m, 0), coalesce(a_s, 0))
    + 0.4 * (coalesce(a_m, 0) + coalesce(a_s, 0)
             - greatest(coalesce(a_m, 0), coalesce(a_s, 0)))
      AS raw
  FROM arms
)
SELECT doc_id, round(raw, 6) AS score
FROM f ORDER BY raw DESC, doc_id LIMIT 15
"""


@q("es_search_dis_max_scored", _DISMAX_ORACLE)
def _es_search_dis_max_scored(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``dis_max`` in SCORING context: the best matching branch's
    score plus ``tie_breaker: 0.4`` times every other matching
    branch's — Lucene's DisjunctionMaxQuery proper, with a
    query-level ``boost: 2`` on the first branch (query boosts
    multiply the branch's BM25). The oracle replays both branch
    scores, the max, and the tie-breaker blend.

    Scale shape: one broadcast stats row per scoring branch, codegen
    greatest/sum, TakeOrdered(15)."""
    from pyspark.sql import functions as F

    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    out = run_search_body(docs, {
        "query": {"dis_max": {
            "queries": [
                {"match": {"text": {"query": "merge", "boost": 2.0}}},
                {"match": {"text": "scan"}},
            ],
            "tie_breaker": 0.4,
        }},
        "size": 15,
        "_source": ["doc_id"],
    })
    return out.select("doc_id", F.round("_score", 6).alias("score"))


# ---------------------------------------------------------------------------
# 11. terms LOOKUP: the term list fetched from another index's doc
# ---------------------------------------------------------------------------

_TERMS_LOOKUP_ORACLE = """
SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
FROM customer
WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                      WHERE n_regionkey = 2)
  AND c_acctbal >= 9000
ORDER BY c_custkey
LIMIT 30
"""


@q("es_search_terms_lookup", _TERMS_LOOKUP_ORACLE)
def _es_search_terms_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``terms`` LOOKUP form: the term list lives in ONE document of
    another index (``{"terms": {field: {index, id, path}}}``) and is
    fetched at plan time — exactly ES's GET-then-rewrite — so the
    query executes as a plain terms query at ANY depth of the tree
    (here inside a bool must). The lookup doc is a region row whose
    ``nation_ids`` array holds the region's nation keys.

    Scale shape: the lookup collects one row; the rewritten terms
    predicate is a pushable IN-list at the customer scan."""
    from pyspark.sql import functions as F

    from ..operators.querydsl import run_search_body

    cust = _t(spark, sf_dir, "customer").withColumn(
        "bal_cents", F.round(F.col("c_acctbal") * 100).cast("long")
    )
    regions = (
        _t(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(F.sort_array(F.collect_list("n_nationkey")).alias("nation_ids"))
    )
    return run_search_body(
        cust,
        {
            "query": {"bool": {"must": [
                {"terms": {"c_nationkey": {
                    "index": "regions", "id": 2, "path": "nation_ids"}}},
                {"range": {"c_acctbal": {"gte": 9000}}},
            ]}},
            "sort": [{"c_custkey": "asc"}],
            "size": 30,
            "_source": ["c_custkey", "c_nationkey", "bal_cents"],
        },
        relations={"regions": {"df": regions, "id_col": "n_regionkey"}},
    )


# ---------------------------------------------------------------------------
# 12. date math in range bounds (the Kibana time-picker syntax)
# ---------------------------------------------------------------------------

_DATE_MATH_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS doc_count
FROM events
WHERE ts >= date_trunc('week', TIMESTAMP '2024-01-10 12:00:00')
                       + INTERVAL 1 DAY
  AND ts < date_trunc('day', TIMESTAMP '2024-01-20 07:30:00')
GROUP BY event_type
"""


@q("es_search_range_date_math", _DATE_MATH_ORACLE)
def _es_search_range_date_math(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ES date math in ``range`` bounds — what Kibana's time picker
    sends: an anchored ``||`` expression with INTERVAL steps and
    ``/unit`` rounding (``now``-anchored math works identically but is
    untestable against a static oracle). The whole bound folds to a
    literal instant at optimization, so the range still pushes to the
    scan.

    Scale shape: one pushable predicate + partial-agg exchange over
    the 5-value event_type domain."""
    from ..operators.querydsl import run_search_body

    ev = _t(spark, sf_dir, "events")
    return run_search_body(ev, {
        "query": {"range": {"ts": {
            "gte": "2024-01-10 12:00:00||/w+1d",
            "lt": "2024-01-20 07:30:00||/d",
        }}},
        "aggs": {"event_type": {"terms": {"field": "event_type"}}},
    }).select("event_type", "doc_count")


# ---------------------------------------------------------------------------
# 13. sort with missing values: ES puts them LAST (Spark's asc()
#     default would put nulls first — the divergence this round fixed)
# ---------------------------------------------------------------------------

_SORT_MISSING_ORACLE = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars END AS maybe
  FROM documents
  WHERE doc_id < 40
)
(SELECT CAST(1 AS BIGINT) AS request, doc_id, maybe FROM d
 ORDER BY maybe ASC NULLS LAST, doc_id LIMIT 12)
UNION ALL
(SELECT CAST(2 AS BIGINT), doc_id, maybe FROM d
 ORDER BY maybe ASC NULLS FIRST, doc_id LIMIT 12)
"""


@q("es_search_sort_missing", _SORT_MISSING_ORACLE)
def _es_search_sort_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES sort-missing semantics: missing values land LAST by default
    (request 1) and ``missing: _first`` overrides (request 2) — the
    engine previously inherited Spark's nulls-first ascending default,
    a silent divergence on any nullable sort key.

    Scale shape: two TakeOrdered branches over one shared scan."""
    from pyspark.sql import functions as F

    from ..operators.querydsl import run_msearch

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 7 != 0, F.col("n_chars")).alias(
                "maybe"
            ),
        )
    )
    common = {"size": 12, "_source": ["doc_id", "maybe"]}
    return run_msearch(docs, [
        {"sort": [{"maybe": {"order": "asc"}}, {"doc_id": "asc"}],
         **common},
        {"sort": [{"maybe": {"order": "asc", "missing": "_first"}},
                  {"doc_id": "asc"}], **common},
    ])


# ---------------------------------------------------------------------------
# 14. _geo_distance sort (Kibana maps: nearest-first hit lists)
# ---------------------------------------------------------------------------

_GEO_SORT_ORACLE = """
WITH pts AS (
  SELECT c_custkey,
         -6000 + (c_custkey * 7) % 12000 AS lat,
         -18000 + (c_custkey * 13) % 36000 AS lon
  FROM customer
)
SELECT c_custkey, lat, lon
FROM pts
ORDER BY (lat - 1500) * (lat - 1500)
         + (lon + 2500) * (lon + 2500) ASC,
         c_custkey ASC
LIMIT 20
"""


@q("es_search_geo_sort", _GEO_SORT_ORACLE)
def _es_search_geo_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``_geo_distance`` SORT: nearest-first hit list around an origin
    (the Kibana-maps query shape). The sort key is the squared planar
    distance — order-identical to the distance and integer-exact under
    the repo's centi-degree convention, so the oracle replays it
    verbatim; the derived sort column is dropped from the page.

    Scale shape: one codegen expression + TakeOrdered(20)."""
    from pyspark.sql import functions as F

    from ..operators.querydsl import run_search_body

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.struct(
            (F.lit(-6000) + (F.col("c_custkey") * 7) % 12000).alias("lat"),
            (F.lit(-18000) + (F.col("c_custkey") * 13) % 36000).alias(
                "lon"
            ),
        ).alias("loc"),
    )
    out = run_search_body(cust, {
        "query": {"match_all": {}},
        "sort": [{"_geo_distance": {
            "loc": {"lat": 1500, "lon": -2500}, "order": "asc"}}],
        "size": 20,
        "_source": ["c_custkey", "loc"],
    })
    return out.select(
        "c_custkey",
        F.col("loc.lat").alias("lat"),
        F.col("loc.lon").alias("lon"),
    )


# ---------------------------------------------------------------------------
# 15. match_phrase slop: in-order proximity
# ---------------------------------------------------------------------------

_SLOP_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\\s+'),
                            x -> x <> '')) AS t,
         generate_subscripts(list_filter(string_split_regex(text, '\\s+'),
                                         x -> x <> ''), 1) AS p
  FROM documents
),
hits AS (
  SELECT DISTINCT a.doc_id
  FROM tok a JOIN tok b
    ON a.doc_id = b.doc_id
   AND b.p > a.p
   AND ((a.t = 'key' AND b.t = 'scan' AND b.p - a.p - 1 <= 2)
     -- slop 2 also buys the adjacent TRANSPOSITION (cost 2, so no
     -- residual gap budget): 'scan key' matches, 'scan x key' not
     OR (a.t = 'scan' AND b.t = 'key' AND b.p - a.p - 1 <= 0))
)
SELECT doc_id FROM hits ORDER BY doc_id LIMIT 30
"""


@q("es_search_phrase_slop", _SLOP_ORACLE)
def _es_search_phrase_slop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``match_phrase`` with ``slop: 2``: the tokens occur in order
    within two intervening positions, OR transposed at cost 2
    (Lucene's sloppy-phrase semantics — the round-6 in-order-only
    divergence is gone). A greedy position chain per token order in
    pure in-row HOFs; the oracle replays both orders with a position
    self-join.

    Scale shape: no explode, no shuffle — per-row array scans bounded
    by document length, then TakeOrdered(30)."""
    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    return run_search_body(docs, {
        "query": {"match_phrase": {"text": {
            "query": "key scan", "slop": 2}}},
        "sort": [{"doc_id": "asc"}],
        "size": 30,
        "_source": ["doc_id"],
    })


# ---------------------------------------------------------------------------
# 16. combined_fields: several fields scored as ONE (summed tf,
#     shared length) — ES 7.13+'s principled multi-field match
# ---------------------------------------------------------------------------

_COMBINED_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(
           string_split_regex(
             concat_ws(' ', coalesce(text, ''), coalesce(lang, '')),
             '\\s+'),
           t -> t <> '') AS tk
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
    CAST(count(*) FILTER (WHERE list_contains(tk, 'fr')) AS BIGINT)
      AS df_0,
    CAST(count(*) FILTER (WHERE list_contains(tk, 'merge')) AS BIGINT)
      AS df_1
  FROM toks
),
scored AS (
  SELECT w.doc_id, w.dl,
    len(list_filter(w.tk, x -> x = 'fr')) AS tf_0,
    len(list_filter(w.tk, x -> x = 'merge')) AS tf_1,
    s.n_docs, s.total_len, d.df_0, d.df_1
  FROM withlen w CROSS JOIN stats s CROSS JOIN dfreq d
  WHERE tf_0 > 0 OR tf_1 > 0
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
      ELSE 0.0 END AS raw
  FROM scored
)
SELECT doc_id, round(raw, 6) AS score
FROM formula ORDER BY raw DESC, doc_id LIMIT 15
"""


@q("es_search_combined_fields", _COMBINED_ORACLE)
def _es_search_combined_fields(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``combined_fields``: text and lang act as ONE field — term
    frequencies sum across fields and the BM25 length is the combined
    stream's (ES 7.13+'s principled multi-field match; contrast
    ``multi_match`` best_fields, which takes the max per-field score).
    The oracle recomputes BM25 over the concatenated token stream.

    Scale shape: exactly the match plan — one broadcast stats row
    over the synthesized column + codegen score + TakeOrdered(15)."""
    from pyspark.sql import functions as F

    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    out = run_search_body(docs, {
        "query": {"combined_fields": {
            "query": "fr merge", "fields": ["text", "lang"]}},
        "size": 15,
        "_source": ["doc_id"],
    })
    return out.select("doc_id", F.round("_score", 6).alias("score"))
