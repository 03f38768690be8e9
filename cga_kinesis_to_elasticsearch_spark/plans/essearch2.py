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
