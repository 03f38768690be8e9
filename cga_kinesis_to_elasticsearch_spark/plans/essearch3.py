"""Round-7 ES ``_search`` surface: the search-as-you-type match
family (``match_phrase_prefix`` / ``match_bool_prefix``), the
Unicode-aware ``standard`` analyzer, the ``rank_feature`` /
``distance_feature`` scoring leaves, the ``intervals`` proximity
query, sloppy-phrase transposition parity, and the sliced parallel
scroll export — each a literal request body through the interpreter,
value-checked against a hand-written DuckDB oracle.

Reference context: the reference's gorouter/app indices (main.go:447)
are exactly what ops dashboards autocomplete over (phrase_prefix on
every keystroke) and bulk-reindex with sliced scrolls.

Oracle conventions (independent SQL, not a translation): whitespace
tokens are ``list_filter(string_split_regex(text, '\\s+'), x -> x <>
'')``; token positions come from ``generate_subscripts``; the Unicode
standard analyzer is ``string_split_regex(lower(t),
'[^\\p{L}\\p{N}]+')`` (probed identical across Java regex / RE2 /
Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .declared import _t, q

# ---------------------------------------------------------------------------
# 1. match_phrase_prefix: search-as-you-type — a phrase whose LAST
#    token is a prefix (what autocomplete clients send per keystroke)
# ---------------------------------------------------------------------------

_PHRASE_PREFIX_ORACLE = """
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
    ON a.doc_id = b.doc_id AND b.p = a.p + 1
  WHERE a.t = 'key' AND b.t LIKE 'sc%'
)
SELECT doc_id FROM hits ORDER BY doc_id LIMIT 40
"""


@q("es_search_phrase_prefix", _PHRASE_PREFIX_ORACLE)
def _es_search_phrase_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``match_phrase_prefix`` — the query an autocomplete client
    sends on every keystroke: ``"key sc"`` matches documents where
    ``key`` is immediately followed by any token starting with ``sc``
    (scan/schema/...). The terminal prefix matches EVERY expansion
    (an explicit ``max_expansions`` is rejected at plan time — a cap
    would change results). The oracle replays it as a position
    self-join with a LIKE prefix on the follower.

    Scale shape: per-row position arrays in whole-stage codegen — no
    explode, no shuffle, then TakeOrdered(40); the autocomplete query
    costs one corpus scan like any match."""
    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    return run_search_body(docs, {
        "query": {"match_phrase_prefix": {"text": "key sc"}},
        "sort": [{"doc_id": "asc"}],
        "size": 40,
        "_source": ["doc_id"],
    })


# ---------------------------------------------------------------------------
# 2. match_bool_prefix: the term-level sibling — every token a term,
#    the last a prefix, combined like a bool
# ---------------------------------------------------------------------------

_BOOL_PREFIX_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(text, '\\s+'),
                     x -> x <> '') AS tk
  FROM documents
)
SELECT doc_id, lang
FROM toks
WHERE list_contains(tk, 'window')
  AND len(list_filter(tk, x -> x LIKE 'merg%')) > 0
ORDER BY doc_id
LIMIT 40
"""


@q("es_search_bool_prefix", _BOOL_PREFIX_ORACLE)
def _es_search_bool_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``match_bool_prefix`` with ``operator: and``: ``"window merg"``
    matches documents containing the ``window`` term AND any token
    with the ``merg`` prefix, at any positions — ES lowers the query
    to exactly this bool of term matches plus a terminal prefix.

    Scale shape: one codegen conjunction over the token array — a
    pushless but shuffle-free scan, then TakeOrdered(40)."""
    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    return run_search_body(docs, {
        "query": {"match_bool_prefix": {"text": {
            "query": "window merg", "operator": "and"}}},
        "sort": [{"doc_id": "asc"}],
        "size": 40,
        "_source": ["doc_id", "lang"],
    })


# ---------------------------------------------------------------------------
# 3. Unicode standard analyzer: accented text tokenizes as letters
# ---------------------------------------------------------------------------

_UNICODE_ANALYZER_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_filter(
           string_split_regex(lower(replace(text, 'e', 'é')),
                              '[^\\p{L}\\p{N}]+'),
           x -> x <> '') AS tk
  FROM documents
)
SELECT doc_id FROM t
WHERE list_contains(tk, 'mérgé') OR list_contains(tk, 'stréam')
ORDER BY doc_id
LIMIT 40
"""


@q("es_search_analyzer_unicode", _UNICODE_ANALYZER_ORACLE)
def _es_search_analyzer_unicode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The ``standard`` analyzer is Unicode-aware: accented letters
    are TOKEN CHARACTERS (``[^\\p{L}\\p{N}]+`` split + lowercase), so
    ``"MÉRGÉ, stréam"`` tokenizes to [mérgé, stréam] and matches an
    accented corpus — under the round-6 ASCII reading the é was a
    separator and this query text shredded to [m, rg, str, am]. The
    accented field is derived deterministically from the real corpus
    (e -> é) on BOTH engines; ASCII behavior is unchanged (covered by
    the round-6 analyzer queries, still green).

    Scale shape: identical to any match — one codegen predicate, one
    scan, TakeOrdered(40)."""
    from pyspark.sql import functions as F

    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text_acc", F.regexp_replace(F.col("text"), "e", "é")
    )
    return run_search_body(docs, {
        "query": {"match": {"text_acc": {
            "query": "MÉRGÉ, stréam", "analyzer": "standard"}}},
        "sort": [{"doc_id": "asc"}],
        "size": 40,
        "_source": ["doc_id"],
    })


# ---------------------------------------------------------------------------
# 4. rank_feature: static relevance signals in a scored bool
# ---------------------------------------------------------------------------

_RANK_FEATURE_ORACLE = """
SELECT doc_id,
       round(1.0
             + 2.0 * n_chars / (n_chars + 300.0)
             + ln(0.01 * n_chars + 1.0), 6) AS score
FROM documents
WHERE lang = 'en'
ORDER BY score DESC, doc_id
LIMIT 25
"""


@q("es_search_rank_feature", _RANK_FEATURE_ORACLE)
def _es_search_rank_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rank_feature`` leaves in a scored bool: a saturation function
    (boost 2) and a log function over the ``n_chars`` feature add to
    the matching ``term``'s constant 1.0 — ES's static-signal ranking
    (page rank, document quality) without a text score. Both
    functions are EXPLICIT; ES's default pivot is an index statistic
    the engine does not maintain, so omitting it fails at plan time.

    Scale shape: the whole score is one codegen arithmetic expression
    — no stats pass, no join; filter + TakeOrdered(25)."""
    from pyspark.sql import functions as F

    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    out = run_search_body(docs, {
        "query": {"bool": {
            "must": [{"term": {"lang": "en"}}],
            "should": [
                {"rank_feature": {"field": "n_chars",
                                  "saturation": {"pivot": 300},
                                  "boost": 2}},
                {"rank_feature": {"field": "n_chars",
                                  "log": {"scaling_factor": 0.01}}},
            ],
        }},
        "sort": [{"_score": "desc"}],
        "size": 25,
        "_source": ["doc_id"],
    })
    return out.select("doc_id", F.round("_score", 6).alias("score"))


# ---------------------------------------------------------------------------
# 5. distance_feature: closeness-to-origin ranking
# ---------------------------------------------------------------------------

_DISTANCE_FEATURE_ORACLE = """
SELECT doc_id,
       round(3.0 * 50.0 / (50.0 + abs(n_chars - 250.0)), 6) AS score
FROM documents
WHERE lang = 'en'
ORDER BY score DESC, doc_id
LIMIT 25
"""


@q("es_search_distance_feature", _DISTANCE_FEATURE_ORACLE)
def _es_search_distance_feature(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``distance_feature`` in a scored bool: documents rank by
    closeness of ``n_chars`` to an origin of 250 — ``boost * pivot /
    (pivot + |field - origin|)``, ES's recency/proximity boosting
    formula. The bool's ``filter`` clause contributes NO score (ES
    filter context), so the distance feature is the entire ranking.

    Scale shape: one codegen expression; filter + TakeOrdered(25)."""
    from pyspark.sql import functions as F

    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    out = run_search_body(docs, {
        "query": {"bool": {
            "filter": [{"term": {"lang": "en"}}],
            "should": [
                {"distance_feature": {"field": "n_chars", "origin": 250,
                                      "pivot": 50, "boost": 3}},
            ],
        }},
        "sort": [{"_score": "desc"}],
        "size": 25,
        "_source": ["doc_id"],
    })
    return out.select("doc_id", F.round("_score", 6).alias("score"))


# ---------------------------------------------------------------------------
# 6. intervals: structured proximity rules
# ---------------------------------------------------------------------------

_INTERVALS_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\\s+'),
                            x -> x <> '')) AS t,
         generate_subscripts(list_filter(string_split_regex(text, '\\s+'),
                                         x -> x <> ''), 1) AS p
  FROM documents
),
adj AS (  -- 'hash join' UNORDERED with max_gaps 0: adjacent, any order
  SELECT DISTINCT a.doc_id
  FROM tok a JOIN tok b
    ON a.doc_id = b.doc_id AND abs(b.p - a.p) = 1
  WHERE a.t = 'hash' AND b.t = 'join'
),
anyof AS (
  SELECT DISTINCT doc_id FROM tok WHERE t IN ('vector', 'stream')
)
SELECT adj.doc_id
FROM adj JOIN anyof ON adj.doc_id = anyof.doc_id
ORDER BY adj.doc_id
LIMIT 40
"""


@q("es_search_intervals", _INTERVALS_ORACLE)
def _es_search_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``intervals`` query: ``all_of`` over an UNORDERED two-token
    ``match`` with ``max_gaps: 0`` (hash/join adjacent in either
    order — lowered as an OR over permutation chains) and an
    ``any_of`` of single-token matches. Unsupported rules (fuzzy,
    wildcard, all_of with its own ordering constraints) reject at
    plan time.

    Scale shape: per-token position arrays + in-row chains — no
    explode, no shuffle; TakeOrdered(40)."""
    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    return run_search_body(docs, {
        "query": {"intervals": {"text": {"all_of": {"intervals": [
            {"match": {"query": "hash join", "max_gaps": 0}},
            {"any_of": {"intervals": [
                {"match": {"query": "vector"}},
                {"match": {"query": "stream"}},
            ]}},
        ]}}}},
        "sort": [{"doc_id": "asc"}],
        "size": 40,
        "_source": ["doc_id"],
    })


# ---------------------------------------------------------------------------
# 7. sloppy-phrase transpositions: the docs slop 2 buys BEYOND the
#    in-order chain (matches at slop 2, not at slop 1)
# ---------------------------------------------------------------------------

_SLOP_TRANSPOSED_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\\s+'),
                            x -> x <> '')) AS t,
         generate_subscripts(list_filter(string_split_regex(text, '\\s+'),
                                         x -> x <> ''), 1) AS p
  FROM documents
),
in_order AS (  -- what slop 1 already matched: key ... scan, gap <= 1
  SELECT DISTINCT a.doc_id
  FROM tok a JOIN tok b
    ON a.doc_id = b.doc_id AND b.p > a.p AND b.p - a.p - 1 <= 1
  WHERE a.t = 'key' AND b.t = 'scan'
),
slop2 AS (     -- slop 2: gap <= 2 in order, or adjacent transposed
  SELECT DISTINCT a.doc_id
  FROM tok a JOIN tok b
    ON a.doc_id = b.doc_id AND b.p > a.p
   AND ((a.t = 'key' AND b.t = 'scan' AND b.p - a.p - 1 <= 2)
     OR (a.t = 'scan' AND b.t = 'key' AND b.p - a.p - 1 <= 0))
)
SELECT doc_id FROM slop2
WHERE doc_id NOT IN (SELECT doc_id FROM in_order)
ORDER BY doc_id
LIMIT 40
"""


@q("es_search_phrase_slop_transposed", _SLOP_TRANSPOSED_ORACLE)
def _es_search_phrase_slop_transposed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sloppy-phrase TRANSPOSITION parity, isolated: the documents
    ``"key scan"~2`` matches that ``~1`` does not — the set where the
    slop budget paid for the adjacent transposition (``scan key``) or
    the 2-gap in-order chain. Lowered as the Spark-side difference of
    the two slop levels, so the oracle independently cross-checks the
    transposition semantics at BOTH budgets.

    Scale shape: two codegen predicates on one scan (left-anti on
    nothing — the difference is a boolean conjunction), then
    TakeOrdered(40)."""
    from ..operators.querydsl import compile_query

    docs = _t(spark, sf_dir, "documents")
    slop2 = compile_query(
        {"match_phrase": {"text": {"query": "key scan", "slop": 2}}}
    )
    slop1 = compile_query(
        {"match_phrase": {"text": {"query": "key scan", "slop": 1}}}
    )
    from pyspark.sql import functions as F

    return (
        docs.filter(slop2 & ~F.coalesce(slop1, F.lit(False)))
        .select("doc_id")
        .orderBy("doc_id")
        .limit(40)
    )


# ---------------------------------------------------------------------------
# 8. sliced scroll: the parallel bulk-export form
# ---------------------------------------------------------------------------

_SLICED_ORACLE = """
SELECT CAST(doc_id % 3 AS BIGINT) AS slice_id,
       CAST((row_number() OVER (PARTITION BY doc_id % 3
                                ORDER BY doc_id) - 1) // 20 + 1
            AS BIGINT) AS page,
       doc_id, lang
FROM documents
WHERE doc_id < 120
ORDER BY slice_id, doc_id
"""


@q("es_scroll_sliced_export", _SLICED_ORACLE)
def _es_scroll_sliced_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliced scroll (``slice: {id, max}``): the export partitions
    into 3 disjoint slices — numeric identity takes a plain modulo
    (deterministic on both engines; ES hashes ``_id``, any
    deterministic disjoint+exhaustive identity partition satisfies
    the contract) — and each slice pages independently. The result
    proves all three contract properties at once: slices disjoint
    (each doc in exactly one), exhaustive (union = the filtered set),
    each internally ordered (the per-slice page ordinals).

    Scale shape: each slice's pages are filtered TakeOrdered scans
    with the slice predicate AND the cursor pushed down — N clients
    export in parallel instead of one sequential cursor, which is the
    whole point of ES sliced scrolls."""
    from pyspark.sql import functions as F

    from ..operators.scroll import run_sliced_export

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    out = run_sliced_export(
        docs.filter(F.col("doc_id") < 120),
        {"sort": [{"doc_id": "asc"}], "_source": ["doc_id", "lang"]},
        page_size=20,
        n_slices=3,
    )
    return out.select("slice_id", "page", "doc_id", "lang")


# ---------------------------------------------------------------------------
# 9. boosting query: demote (don't exclude) by a negative query
# ---------------------------------------------------------------------------

_BOOSTING_ORACLE = """
SELECT doc_id,
       round(CASE WHEN lang = 'fr'
                  THEN 0.25 * n_chars / (n_chars + 300.0)
                  ELSE n_chars / (n_chars + 300.0) END, 6) AS score
FROM documents
WHERE n_chars > 0
ORDER BY score DESC, doc_id
LIMIT 30
"""


@q("es_search_boosting", _BOOSTING_ORACLE)
def _es_search_boosting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``boosting`` query: positive hits keep their score, hits the
    ``negative`` query ALSO matches are multiplied by
    ``negative_boost`` — ES's demote-without-excluding tool. The
    positive arm is a rank_feature saturation so the oracle is pure
    arithmetic; French documents sink by 4x but stay in the results.

    Scale shape: one codegen CASE over one scan + TakeOrdered(30)."""
    from pyspark.sql import functions as F

    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    out = run_search_body(docs, {
        "query": {"boosting": {
            "positive": {"rank_feature": {
                "field": "n_chars", "saturation": {"pivot": 300}}},
            "negative": {"term": {"lang": "fr"}},
            "negative_boost": 0.25,
        }},
        "sort": [{"_score": "desc"}],
        "size": 30,
        "_source": ["doc_id"],
    })
    return out.select("doc_id", F.round("_score", 6).alias("score"))


# ---------------------------------------------------------------------------
# 10. pinned query: promoted documents first, in list order
# ---------------------------------------------------------------------------

_PINNED_ORACLE = """
WITH scored AS (
  SELECT doc_id,
         CASE doc_id WHEN 7 THEN 1e12 + 3
                     WHEN 3 THEN 1e12 + 2
                     WHEN 11 THEN 1e12 + 1
         ELSE CASE WHEN lang = 'en'
                   THEN n_chars / (n_chars + 300.0)
                   ELSE 0.0 END END AS s
  FROM documents
  WHERE lang = 'en' OR doc_id IN (7, 3, 11)
)
-- the pin base is normalized out of the RETURNED value: round() of a
-- 1e12-scale double multiplies past 2^53 and differs at the last ulp
-- between engines, so the comparison surface is (pinned?, residual)
SELECT doc_id,
       (s >= 1e12) AS pinned,
       round(CASE WHEN s >= 1e12 THEN s - 1e12 ELSE s END, 6) AS score
FROM scored
ORDER BY s DESC, doc_id
LIMIT 20
"""


@q("es_search_pinned", _PINNED_ORACLE)
def _es_search_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``pinned`` query: ids [7, 3, 11] rank first IN LIST ORDER above
    every organic hit (scores 1e12+3/2/1 — exactly-representable
    doubles, the engine's documented stand-in for ES's float-max pin
    scores), then the organic rank_feature order follows. Pinned docs
    outside the organic match set still return (doc 7/3/11 regardless
    of language).

    Scale shape: a literal id CASE over the organic score expression —
    no joins; one scan + TakeOrdered(20)."""
    from pyspark.sql import functions as F

    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    out = run_search_body(docs, {
        "query": {"pinned": {
            "ids": [7, 3, 11],
            "organic": {"bool": {
                "filter": [{"term": {"lang": "en"}}],
                "should": [{"rank_feature": {
                    "field": "n_chars", "saturation": {"pivot": 300}}}],
            }},
        }},
        "sort": [{"_score": "desc"}],
        "size": 20,
        "_source": ["doc_id"],
    })
    pinned = F.col("_score") >= 1e12
    return out.select(
        "doc_id",
        pinned.alias("pinned"),
        F.round(
            F.when(pinned, F.col("_score") - 1e12).otherwise(
                F.col("_score")
            ),
            6,
        ).alias("score"),
    )


# ---------------------------------------------------------------------------
# 11. span queries: span_near (ordered proximity) + span_first
# ---------------------------------------------------------------------------

_SPAN_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\\s+'),
                            x -> x <> '')) AS t,
         generate_subscripts(list_filter(string_split_regex(text, '\\s+'),
                                         x -> x <> ''), 1) AS p
  FROM documents
),
near_hits AS (  -- span_near [key, scan] slop 3 in_order
  SELECT DISTINCT a.doc_id
  FROM tok a JOIN tok b
    ON a.doc_id = b.doc_id AND b.p > a.p AND b.p - a.p - 1 <= 3
  WHERE a.t = 'key' AND b.t = 'scan'
),
first_hits AS (  -- span_first: 'join' within the first 5 positions
  SELECT DISTINCT doc_id FROM tok WHERE t = 'join' AND p <= 5
)
SELECT n.doc_id
FROM near_hits n JOIN first_hits f ON n.doc_id = f.doc_id
ORDER BY n.doc_id
LIMIT 40
"""


@q("es_search_span_near_first", _SPAN_ORACLE)
def _es_search_span_near_first(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Lucene span queries through the DSL: ``span_near`` (key then
    scan, in order, slop 3) AND ``span_first`` (``join`` ending within
    the first 5 positions) composed in a bool — the classic legal/
    compliance proximity queries. Span clauses are span_terms; nested
    span compounds reject at plan time.

    Scale shape: per-token position arrays + in-row chains (the same
    machinery as slop/intervals) — no explode, no shuffle,
    TakeOrdered(40). NOTE the oracle's 1-based positions vs the
    engine's 0-based: p <= 5 == zero-based position < 5."""
    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    return run_search_body(docs, {
        "query": {"bool": {
            "must": [{"span_near": {
                "clauses": [
                    {"span_term": {"text": "key"}},
                    {"span_term": {"text": "scan"}},
                ],
                "slop": 3, "in_order": True,
            }}],
            "filter": [{"span_first": {
                "match": {"span_term": {"text": "join"}}, "end": 5}}],
        }},
        "sort": [{"doc_id": "asc"}],
        "size": 40,
        "_source": ["doc_id"],
    })


# ---------------------------------------------------------------------------
# 12. case_insensitive term / prefix / wildcard
# ---------------------------------------------------------------------------

_CASE_INSENSITIVE_ORACLE = """
SELECT c_custkey, c_mktsegment
FROM customer
WHERE lower(c_mktsegment) = lower('BuIlDiNg')
  AND lower(c_name) LIKE lower('CUSTOMER%9')
  AND lower(c_name) LIKE lower('CuStOmEr#%')
ORDER BY c_custkey
LIMIT 30
"""


@q("es_search_case_insensitive", _CASE_INSENSITIVE_ORACLE)
def _es_search_case_insensitive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``case_insensitive: true`` on the term / prefix / wildcard long
    forms (ES 7.10+): both sides lowercase, so 'BuIlDiNg' hits the
    BUILDING segment and a 'CUSTOMER*' wildcard hits the lowercase
    names. All three leaves stay single codegen predicates; the
    lower() wrap keeps them sargable enough for dictionary filters
    even though verbatim pushdown is off.

    Scale shape: one conjunction, one scan, TakeOrdered(30)."""
    from ..operators.querydsl import run_search_body

    cust = _t(spark, sf_dir, "customer")
    return run_search_body(cust, {
        "query": {"bool": {"filter": [
            {"term": {"c_mktsegment": {
                "value": "BuIlDiNg", "case_insensitive": True}}},
            {"wildcard": {"c_name": {
                "value": "CUSTOMER*9", "case_insensitive": True}}},
            {"prefix": {"c_name": {
                "value": "CuStOmEr#", "case_insensitive": True}}},
        ]}},
        "sort": [{"c_custkey": "asc"}],
        "size": 30,
        "_source": ["c_custkey", "c_mktsegment"],
    })


# ---------------------------------------------------------------------------
# 13. script_fields + docvalue_fields + _source: false — the response
#     shaping every reporting client uses
# ---------------------------------------------------------------------------

_SCRIPT_FIELDS_ORACLE = """
SELECT o_orderkey,
       round(o_totalprice * 0.1, 6) AS tenth,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate__dv
FROM orders
WHERE o_orderstatus = 'F'
ORDER BY o_orderkey
LIMIT 30
"""


@q("es_search_script_docvalue_fields", _SCRIPT_FIELDS_ORACLE)
def _es_search_script_docvalue_fields(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``script_fields`` (per-hit computed values, painless arithmetic
    subset) + ``docvalue_fields`` with a date ``format`` +
    ``_source: ["o_orderkey"]`` — the shaped response reporting
    clients request instead of whole documents. Script fields may
    reference columns ``_source`` drops (o_totalprice here) because
    they compute before the projection; the formatted docvalue column
    surfaces as ``<field>__dv`` so it never collides with a raw
    source column.

    Scale shape: two extra codegen projections on the hit page — no
    additional scan, no shuffle."""
    from pyspark.sql import functions as F

    from ..operators.querydsl import run_search_body

    orders = _t(spark, sf_dir, "orders")
    out = run_search_body(orders, {
        "query": {"term": {"o_orderstatus": "F"}},
        "sort": [{"o_orderkey": "asc"}],
        "size": 30,
        "_source": ["o_orderkey"],
        "script_fields": {"tenth": {"script": {
            "source": "doc['o_totalprice'].value * 0.1"}}},
        "docvalue_fields": [
            {"field": "o_orderdate", "format": "yyyy-MM-dd"}],
    })
    return out.select(
        "o_orderkey", F.round("tenth", 6).alias("tenth"),
        "o_orderdate__dv",
    )


# ---------------------------------------------------------------------------
# 14. _analyze: the analyzer-debugging endpoint
# ---------------------------------------------------------------------------

_ANALYZE_ORACLE = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT), CAST(0 AS BIGINT), 'quick',
   CAST(0 AS BIGINT), CAST(5 AS BIGINT)),
  (0, 1, 'brown', 6, 11),
  (0, 2, 'fox', 12, 15),
  (0, 3, '42', 16, 18),
  (1, 0, 'naïve', 0, 5),
  (1, 1, 'case', 6, 10)
) t(text_ordinal, position, token, start_offset, end_offset)
"""


@q("es_analyze_text", _ANALYZE_ORACLE)
def _es_analyze_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``_analyze`` with the Unicode ``standard`` analyzer: two texts
    tokenize to (position, token, offsets) rows — the endpoint every
    "why doesn't my match hit" investigation starts with. The token
    stream is asserted identical to the match-side analysis
    (one analyzer, one truth); offsets index the ORIGINAL text
    (``Quick,brown`` keeps its comma out of both tokens;
    ``naïve_case`` splits on the connector underscore — the
    documented UAX#29 divergence, visible right here).

    Scale shape: plan-time tokenization of literal text on the
    driver, exactly like ES's _analyze (no index touched)."""
    from ..operators.esapi import run_analyze

    return run_analyze(spark, {
        "text": ["Quick,brown Fox 42", "naïve_case"],
        "analyzer": "standard",
    })


# ---------------------------------------------------------------------------
# 15. search templates: mustache-parameterized stored queries
# ---------------------------------------------------------------------------

_TEMPLATE_ORACLE = """
SELECT c_custkey, c_mktsegment,
       CAST(c_nationkey AS BIGINT) AS c_nationkey
FROM customer
WHERE c_mktsegment = 'BUILDING'
  AND c_acctbal >= 4000
  AND c_nationkey IN (1, 5, 9)
ORDER BY c_custkey
LIMIT 25
"""


@q("es_search_template_render", _TEMPLATE_ORACLE)
def _es_search_template_render(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``_search/template``: one stored mustache template rendered
    with a string param (``{{seg}}``), a numeric param
    (``{{min_bal}}``) and a list param (``{{#toJson}}nations
    {{/toJson}}`` — the term-list idiom), then executed through the
    normal interpreter. Missing params fail LOUD at render time (ES
    renders them as empty strings, silently corrupting the query —
    the engine refuses instead).

    Scale shape: rendering is driver-side string work; the rendered
    body costs exactly what the literal body costs (same plan)."""
    from ..operators.esapi import run_search_template

    cust = _t(spark, sf_dir, "customer")
    cols = ["c_custkey", "c_mktsegment", "c_nationkey"]
    template = """
    {
      "query": {"bool": {"filter": [
        {"term": {"c_mktsegment": "{{seg}}"}},
        {"range": {"c_acctbal": {"gte": {{min_bal}}}}},
        {"terms": {"c_nationkey": {{#toJson}}nations{{/toJson}}}}
      ]}},
      "sort": [{"c_custkey": "asc"}],
      "size": 25,
      "_source": ["c_custkey", "c_mktsegment", "c_nationkey"]
    }
    """
    out = run_search_template(
        cust, template,
        {"seg": "BUILDING", "min_bal": 4000, "nations": [1, 5, 9]},
    )
    return out.select(*cols)


# ---------------------------------------------------------------------------
# 16. _validate/query: plan-time query linting
# ---------------------------------------------------------------------------

_VALIDATE_ORACLE = """
SELECT * FROM (VALUES
  ('good', true, false),
  ('bad_clause', false, true),
  ('bad_column', false, true)
) t(tag, valid, has_error)
"""


@q("es_validate_query", _VALIDATE_ORACLE)
def _es_validate_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``_validate/query``: the query-linting endpoint — a valid
    body, an unsupported clause, and a reference to a missing column
    each report (valid, has_error) instead of raising; CI pipelines
    lint stored queries with exactly this.

    Scale shape: compilation + analysis only; nothing executes."""
    from pyspark.sql import functions as F

    from ..operators.esapi import run_validate_query

    cust = _t(spark, sf_dir, "customer")
    cases = [
        ("good", {"query": {"term": {"c_mktsegment": "BUILDING"}}}),
        ("bad_clause", {"query": {"made_up_clause": {"x": 1}}}),
        ("bad_column", {"query": {"term": {"no_such_col": 1}}}),
    ]
    out = None
    for tag, body in cases:
        part = run_validate_query(cust, body).select(
            F.lit(tag).alias("tag"), "valid",
            (F.col("error") != "").alias("has_error"),
        )
        out = part if out is None else out.unionByName(part)
    return out


# ---------------------------------------------------------------------------
# 17. geo_bounds + geo_centroid aggregations (Kibana maps summaries)
# ---------------------------------------------------------------------------

_GEO_AGGS_ORACLE = """
WITH pts AS (
  SELECT c_mktsegment,
         -6000 + (c_custkey * 7) % 12000 AS lat,
         -18000 + (c_custkey * 13) % 36000 AS lon
  FROM customer
)
SELECT c_mktsegment AS segment,
       count(*) AS doc_count,
       CAST(max(lat) AS BIGINT) AS top,
       CAST(min(lat) AS BIGINT) AS bottom,
       CAST(min(lon) AS BIGINT) AS left_lon,
       CAST(max(lon) AS BIGINT) AS right_lon,
       round(avg(lat), 6) AS centroid_lat,
       round(avg(lon), 6) AS centroid_lon
FROM pts
GROUP BY c_mktsegment
"""


@q("es_aggs_geo_bounds_centroid", _GEO_AGGS_ORACLE)
def _es_aggs_geo_bounds_centroid(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``geo_bounds`` + ``geo_centroid`` metric aggs per terms bucket
    — the Kibana-maps summary pair (fit-to-bounds + cluster marker)
    over the repo's struct{lat,lon} centi-degree geo convention
    (planar, no dateline wrap — documented).

    Scale shape: plain grouped min/max/avg — one partial-agg shuffle
    on the segment key, KB-scale state per bucket."""
    from pyspark.sql import functions as F

    from ..operators.querydsl import run_search_body

    cust = _t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.struct(
            (F.lit(-6000) + (F.col("c_custkey") * 7) % 12000).alias("lat"),
            (F.lit(-18000) + (F.col("c_custkey") * 13) % 36000).alias(
                "lon"
            ),
        ).alias("loc"),
    )
    out = run_search_body(cust, {
        "aggs": {"by_seg": {"terms": {
            "field": "c_mktsegment", "size": 10}, "aggs": {
            "bnd": {"geo_bounds": {"field": "loc"}},
            "ctr": {"geo_centroid": {"field": "loc"}},
        }}},
    })
    return out.select(
        F.col("by_seg").alias("segment"),
        "doc_count",
        F.col("bnd.top").cast("long").alias("top"),
        F.col("bnd.bottom").cast("long").alias("bottom"),
        F.col("bnd.left").cast("long").alias("left_lon"),
        F.col("bnd.right").cast("long").alias("right_lon"),
        F.round("ctr.lat", 6).alias("centroid_lat"),
        F.round("ctr.lon", 6).alias("centroid_lon"),
    )


# ---------------------------------------------------------------------------
# 18. matrix_stats: covariance / correlation across numeric fields
# ---------------------------------------------------------------------------

_MATRIX_STATS_ORACLE = """
SELECT count(*) AS n,
       round(avg(l_quantity), 6) AS qty_mean,
       round(var_samp(l_quantity), 6) AS qty_variance,
       round(avg(l_discount), 6) AS disc_mean,
       round(covar_samp(l_quantity, l_extendedprice), 4)
         AS cov_qty_price,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(corr(l_quantity, l_discount), 6) AS corr_qty_disc
FROM lineitem
"""


@q("es_aggs_matrix_stats", _MATRIX_STATS_ORACLE)
def _es_aggs_matrix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``matrix_stats``: per-field mean/sample-variance + pairwise
    sample covariance and Pearson correlation in ONE aggregation pass
    — ES's multi-field statistics agg (docs missing any field are
    skipped, vacuous on this table). skewness/kurtosis are not
    lowered: Spark's estimators are population-biased where ES's are
    sample-corrected, and a silently-different number is worse than a
    plan-time absence.

    Scale shape: one map-side-combined global aggregate — every
    moment accumulates in the same partial pass, no second scan."""
    from pyspark.sql import functions as F

    from ..operators.querydsl import run_search_body

    li = _t(spark, sf_dir, "lineitem")
    out = run_search_body(li, {
        "aggs": {"m": {"matrix_stats": {
            "fields": ["l_quantity", "l_extendedprice", "l_discount"],
        }}},
    })
    return out.select(
        F.col("m.l_quantity_count").alias("n"),
        F.round("m.l_quantity_mean", 6).alias("qty_mean"),
        F.round("m.l_quantity_variance", 6).alias("qty_variance"),
        F.round("m.l_discount_mean", 6).alias("disc_mean"),
        F.round("m.cov_l_quantity_l_extendedprice", 4)
        .alias("cov_qty_price"),
        F.round("m.corr_l_quantity_l_extendedprice", 6)
        .alias("corr_qty_price"),
        F.round("m.corr_l_quantity_l_discount", 6)
        .alias("corr_qty_disc"),
    )


# ---------------------------------------------------------------------------
# 19. random_sampler: hash-sampled sub-aggregations
# ---------------------------------------------------------------------------

_RANDOM_SAMPLER_ORACLE = """
WITH s AS (
  SELECT * FROM documents
  WHERE (doc_id * 2654435761 + 7 * 40503) % 4294967296
        < CAST(0.25 * 4294967296 AS BIGINT)
)
SELECT 'samp' AS agg_path, NULL AS by_lang,
       (SELECT count(*) FROM s) AS doc_count,
       (SELECT CAST(sum(n_chars) AS BIGINT) FROM s) AS sum_chars
UNION ALL
SELECT 'samp>by_lang', lang, count(*), NULL
FROM s GROUP BY lang
"""


@q("es_aggs_random_sampler", _RANDOM_SAMPLER_ORACLE)
def _es_aggs_random_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``random_sampler`` bucket: sub-aggs run over a ~25% sample
    selected by a DETERMINISTIC multiplicative hash of the document
    identity (+ seed) — reproducible across engines and
    partitionings, unlike ES's per-shard RNG (documented divergence:
    raw sample statistics; the caller scales counts by 1/p). At
    100 TB this is the cheap corpus-distribution estimator: the
    sample predicate is one codegen expression at the scan, no sort.

    Scale shape: filter + grouped aggregates over ~p of the data —
    cost scales with p, not the corpus."""
    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    return run_search_body(docs, {
        "aggs": {"samp": {
            "random_sampler": {"probability": 0.25, "seed": 7},
            "aggs": {
                "sum_chars": {"sum": {"field": "n_chars"}},
                "by_lang": {"terms": {"field": "lang", "size": 10}},
            },
        }},
    })


# ---------------------------------------------------------------------------
# 20. multi_match types: most_fields / cross_fields / phrase /
#     bool_prefix through one _msearch batch
# ---------------------------------------------------------------------------

_MM_TYPES_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(text, '\\s+'),
                     x -> x <> '') AS tk
  FROM documents
)
SELECT CAST(1 AS BIGINT) AS request, doc_id FROM toks
WHERE list_contains(tk, 'merge') OR lang = 'merge'
   OR list_contains(tk, 'scan') OR lang = 'scan'
UNION ALL
-- cross_fields operator=and: EACH term in at least one field
SELECT 2, doc_id FROM toks
WHERE (list_contains(tk, 'en') OR lang = 'en')
  AND (list_contains(tk, 'merge') OR lang = 'merge')
UNION ALL
-- phrase: adjacent "merge scan" in either field (lang never has it)
SELECT 3, doc_id FROM toks
WHERE ' ' || array_to_string(tk, ' ') || ' ' LIKE '% merge scan %'
   OR lang = 'merge scan'
UNION ALL
-- bool_prefix operator=and: term 'window' + prefix 'sc' per field
SELECT 4, doc_id FROM toks
WHERE (list_contains(tk, 'window')
       AND len(list_filter(tk, x -> x LIKE 'sc%')) > 0)
   OR (lang = 'window' AND lang LIKE 'sc%')
ORDER BY request, doc_id
"""


@q("es_search_multi_match_types", _MM_TYPES_ORACLE)
def _es_search_multi_match_types(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The full ``multi_match`` type family beyond best_fields, one
    ``_msearch`` batch: ``most_fields`` (filter = any field matches),
    ``cross_fields`` with ``operator: and`` (TERM-centric — each term
    in at least one field, where field-centric and would wrongly
    demand both terms in ONE field), ``phrase`` (match_phrase per
    field), and ``bool_prefix`` (search-as-you-type across fields).
    Hit sets are doc_id-sorted per request; scoring dispatch
    (sum / blended-stats BM25) is pinned by unit tests.

    Scale shape: four codegen predicates over one shared scan — the
    msearch union reads the corpus once per branch, no joins."""
    from ..operators.querydsl import run_msearch

    docs = _t(spark, sf_dir, "documents")
    mk = lambda extra: {  # noqa: E731
        "sort": [{"doc_id": "asc"}], "size": 10000,
        "_source": ["doc_id"], **extra,
    }
    out = run_msearch(docs, [
        mk({"query": {"multi_match": {
            "query": "merge scan", "fields": ["text", "lang"],
            "type": "most_fields"}}}),
        mk({"query": {"multi_match": {
            "query": "en merge", "fields": ["text", "lang"],
            "type": "cross_fields", "operator": "and"}}}),
        mk({"query": {"multi_match": {
            "query": "merge scan", "fields": ["text", "lang"],
            "type": "phrase"}}}),
        mk({"query": {"multi_match": {
            "query": "window sc", "fields": ["text", "lang"],
            "type": "bool_prefix", "operator": "and"}}}),
    ])
    return out.select("request", "doc_id")


# ---------------------------------------------------------------------------
# 21. wrapper query: base64-encoded JSON through typed clients
# ---------------------------------------------------------------------------

_WRAPPER_ORACLE = """
SELECT doc_id, lang
FROM documents
WHERE lang = 'en' AND n_chars >= 200
ORDER BY doc_id
LIMIT 30
"""


@q("es_search_wrapper", _WRAPPER_ORACLE)
def _es_search_wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``wrapper`` query: the inner query ships BASE64-encoded (how
    strictly-typed client libraries smuggle raw JSON), decoded and
    compiled at plan time — it costs exactly what the inline query
    costs and composes inside bool like any leaf.

    Scale shape: identical to the decoded query's plan (pushable
    term+range conjuncts at the scan)."""
    import base64
    import json

    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    inner = {"bool": {"filter": [
        {"term": {"lang": "en"}},
        {"range": {"n_chars": {"gte": 200}}},
    ]}}
    b64 = base64.b64encode(json.dumps(inner).encode()).decode()
    return run_search_body(docs, {
        "query": {"wrapper": {"query": b64}},
        "sort": [{"doc_id": "asc"}],
        "size": 30,
        "_source": ["doc_id", "lang"],
    })


# ---------------------------------------------------------------------------
# 22. percolation: stored queries against incoming documents
# ---------------------------------------------------------------------------

_PERCOLATE_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'),
                     x -> x <> '') AS tk,
         lang, n_chars
  FROM documents
  WHERE doc_id < 150
)
SELECT 'alert_vector' AS query_id, doc_id FROM toks
WHERE list_contains(tk, 'vector')
UNION ALL
SELECT 'alert_long_fr', doc_id FROM toks
WHERE lang = 'fr' AND n_chars >= 300
UNION ALL
SELECT 'alert_phrase', doc_id FROM toks
WHERE ' ' || array_to_string(tk, ' ') || ' ' LIKE '% hash join %'
ORDER BY query_id, doc_id
"""


@q("es_percolate_alerts", _PERCOLATE_ORACLE)
def _es_percolate_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percolation — the alerting primitive: three STORED queries (a
    match, a bool of term+range, a phrase) run against a batch of
    incoming documents, returning every (stored query, document)
    match pair. This is ES's ``percolate`` query inverted exactly the
    way the percolator index executes it.

    Scale shape: all stored predicates compile into ONE projection
    (per-row array of (query_id, matched) structs, exploded
    in-stage) — one corpus scan for N alerts, no shuffle, no
    per-alert job. The 100 TB alerting bill is one pass."""
    from pyspark.sql import functions as F

    from ..operators.esapi import run_percolate

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    out = run_percolate(docs, [
        ("alert_vector", {"match": {"text": "vector"}}),
        ("alert_long_fr", {"bool": {"filter": [
            {"term": {"lang": "fr"}},
            {"range": {"n_chars": {"gte": 300}}},
        ]}}),
        ("alert_phrase", {"match_phrase": {"text": "hash join"}}),
    ])
    return out.orderBy("query_id", "doc_id")


# ---------------------------------------------------------------------------
# 23. categorize_text: log-pattern clustering
# ---------------------------------------------------------------------------

_CATEGORIZE_ORACLE = """
WITH msgs AS (
  SELECT 'user ' || user_id || ' did ' || event_type || ' in '
         || CAST(CAST(value * 100 AS BIGINT) AS VARCHAR) || ' ms'
         AS message
  FROM events
),
keyed AS (
  SELECT array_to_string(
           list_filter(string_split_regex(message, '\\s+'),
                       x -> x <> '' AND NOT regexp_matches(x, '[0-9]')),
           ' ') AS category
  FROM msgs
)
SELECT category, count(*) AS doc_count
FROM keyed
GROUP BY category
ORDER BY doc_count DESC, category
LIMIT 10
"""


@q("es_aggs_categorize_text", _CATEGORIZE_ORACLE)
def _es_aggs_categorize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``categorize_text``: log messages cluster by their token
    pattern with every digit-bearing token dropped — five synthetic
    log shapes (one per event type) emerge from ~N distinct messages,
    exactly the ops workflow the reference's log indices feed. The
    engine's DETERMINISTIC reading of ES's categorizer (the
    similarity-threshold merge pass is rejected at plan time, not
    imitated).

    Scale shape: one codegen key expression + a grouped count — the
    same partial-agg shuffle as any terms agg; category cardinality,
    not message cardinality, crosses the wire."""
    from pyspark.sql import functions as F

    from ..operators.querydsl import run_search_body

    ev = _t(spark, sf_dir, "events").select(
        F.concat(
            F.lit("user "), F.col("user_id"),
            F.lit(" did "), F.col("event_type"),
            F.lit(" in "),
            (F.col("value") * 100).cast("long").cast("string"),
            F.lit(" ms"),
        ).alias("message"),
    )
    out = run_search_body(ev, {
        "aggs": {"cats": {"categorize_text": {
            "field": "message", "size": 10}}},
    })
    return out.select(
        F.col("cats").alias("category"), "doc_count"
    ).orderBy(F.desc("doc_count"), "category")


# ---------------------------------------------------------------------------
# 24. random_score: deterministic reproducible randomness
# ---------------------------------------------------------------------------

_RANDOM_SCORE_ORACLE = """
SELECT doc_id,
       round(CAST((doc_id * 2654435761 + 42 * 40503) % 4294967296
                  AS DOUBLE) / 4294967296, 6) AS score
FROM documents
WHERE lang = 'en'
ORDER BY score DESC, doc_id
LIMIT 20
"""


@q("es_search_random_score", _RANDOM_SCORE_ORACLE)
def _es_search_random_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``function_score`` with ``random_score`` in ES's DETERMINISTIC
    form (seed + field): a reproducible uniform [0,1) score per
    document — A/B result shuffling and sampled relevance audits that
    must replay identically. The seedless per-shard-random form is
    rejected at plan time (unreplayable results can't be
    oracle-checked, or debugged).

    Scale shape: one integer-hash expression in codegen — no state,
    no shuffle; filter + TakeOrdered(20)."""
    from pyspark.sql import functions as F

    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    out = run_search_body(docs, {
        "query": {"function_score": {
            "query": {"term": {"lang": "en"}},
            "random_score": {"seed": 42, "field": "doc_id"},
            "boost_mode": "replace",
        }},
        "sort": [{"_score": "desc"}],
        "size": 20,
        "_source": ["doc_id"],
    })
    return out.select("doc_id", F.round("_score", 6).alias("score"))


# ---------------------------------------------------------------------------
# 25. script_score with params (the parameterized-script idiom)
# ---------------------------------------------------------------------------

_SCRIPT_PARAMS_ORACLE = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       round(l_extendedprice * (1 - l_discount) * 0.07 + 5.0, 6)
         AS score
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-11-01'
ORDER BY score DESC, l_orderkey, l_linenumber
LIMIT 20
"""


@q("es_search_script_params", _SCRIPT_PARAMS_ORACLE)
def _es_search_script_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``script_score`` with ``params``: the script references
    ``params.rate`` / ``params.base`` and the request supplies the
    values — ES's recommended pattern (parameterized scripts compile
    once; inlined constants recompile per value). Params substitute
    as plan-time literals; an unresolved ``params.`` reference fails
    at plan time.

    Scale shape: one codegen arithmetic expression; pushable date
    filter at the scan + TakeOrdered(20)."""
    from pyspark.sql import functions as F

    from ..operators.querydsl import run_search_body

    li = _t(spark, sf_dir, "lineitem")
    out = run_search_body(li, {
        "query": {"script_score": {
            "query": {"range": {"l_shipdate": {"gte": "1998-11-01"}}},
            "script": {
                "source": ("doc['l_extendedprice'].value * "
                           "(1 - doc['l_discount'].value) * params.rate "
                           "+ params.base"),
                "params": {"rate": 0.07, "base": 5.0},
            },
        }},
        "sort": [{"_score": "desc"},
                 {"l_orderkey": "asc"}, {"l_linenumber": "asc"}],
        "size": 20,
        "_source": ["l_orderkey", "l_linenumber"],
    })
    return out.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.round("_score", 6).alias("score"),
    )


# ---------------------------------------------------------------------------
# 26. knn with a similarity cutoff (quality floor on vector hits)
# ---------------------------------------------------------------------------

_KNN_DIM7 = 64
_KNN_VEC7 = [round(((i * 7) % 13) / 13.0, 6) for i in range(_KNN_DIM7)]

_KNN_SIMILARITY_ORACLE = f"""
WITH q AS (SELECT [{", ".join(str(x) for x in _KNN_VEC7)}]::DOUBLE[] AS qv),
scored AS (
  SELECT e.vec_id,
         list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS cos
  FROM embeddings e CROSS JOIN q
)
SELECT vec_id, round((1.0 + cos) / 2.0, 6) AS score
FROM scored
WHERE (1.0 + cos) / 2.0 >= (1.0 + 0.2) / 2.0
ORDER BY score DESC, vec_id
LIMIT 50
"""


@q("es_search_knn_similarity", _KNN_SIMILARITY_ORACLE)
def _es_search_knn_similarity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``knn`` with ``similarity``: the minimum RAW cosine a vector
    needs to count as a hit (ES applies it before boost) — the
    quality floor RAG retrieval uses so low-grade neighbors never
    reach the prompt. Fewer than k hits may return; that is the
    point.

    Scale shape: the cutoff is one more codegen comparison on the
    same zip_with dot product — no extra scan; TakeOrdered(k) over
    the thresholded set."""
    from pyspark.sql import functions as F

    from ..operators.querydsl import run_search_body

    emb = _t(spark, sf_dir, "embeddings")
    out = run_search_body(emb, {
        "knn": {
            "field": "embedding",
            "query_vector": _KNN_VEC7,
            "k": 50,
            "similarity": 0.2,
        },
        "_source": ["vec_id"],
    })
    return out.select("vec_id", F.round("_score", 6).alias("score"))


# ---------------------------------------------------------------------------
# 27. _field_caps: the index-pattern introspection Kibana runs first
# ---------------------------------------------------------------------------

_FIELD_CAPS_ORACLE = """
SELECT * FROM (VALUES
  ('l_linenumber', 'long', true, true),
  ('l_orderkey', 'long', true, true),
  ('l_quantity', 'double', true, true),
  ('l_returnflag', 'keyword', true, true),
  ('l_shipdate', 'date', true, true)
) t(field, type, searchable, aggregatable)
ORDER BY field
"""


@q("es_field_caps", _FIELD_CAPS_ORACLE)
def _es_field_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``_field_caps`` with a wildcard field filter: per-field ES
    capability rows (type, searchable, aggregatable) mapped from the
    resolved Spark schema — the introspection Kibana runs before
    rendering any index pattern. Plan-time only; nothing executes.

    The expected rows are hand-written (the oracle is the ES type
    mapping itself, independent of the implementation)."""
    from ..operators.esapi import run_field_caps

    li = _t(spark, sf_dir, "lineitem")
    return run_field_caps(li, [
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
        "l_shipdate",
    ])


# ---------------------------------------------------------------------------
# 28. highlight driven by a PARSED Lucene query (the Kibana-bar case)
# ---------------------------------------------------------------------------

_HIGHLIGHT_QS_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'),
                     x -> x <> '') AS tk
  FROM documents
),
hits AS (
  SELECT doc_id, tk FROM toks
  WHERE (' ' || array_to_string(tk, ' ') || ' ' LIKE '% hash join %'
         OR len(list_filter(tk, x -> x LIKE 'vect%')) > 0)
)
SELECT doc_id,
       array_to_string(
         list_transform(tk, x ->
           CASE WHEN x IN ('hash', 'join') OR x LIKE 'vect%'
                THEN '<em>' || x || '</em>' ELSE x END),
         ' ') AS text_highlight
FROM hits
ORDER BY doc_id
LIMIT 15
"""


@q("es_search_highlight_query_string", _HIGHLIGHT_QS_ORACLE)
def _es_search_highlight_query_string(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``highlight`` driven by a PARSED ``simple_query_string`` — the
    Kibana-bar case: the highlighter extracts terms RECURSIVELY from
    the lowered query tree (the phrase's tokens exact, the trailing-*
    prefix as a prefix mark), so what matched is what glows. Round-6
    highlighting only read top-level match/multi_match; every wrapped
    query raised.

    Scale shape: one extra in-row transform on the HIT page — the
    marking runs after the filter, never on non-hits."""
    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    return run_search_body(docs, {
        "query": {"simple_query_string": {
            "query": '"hash join" | vect*',
            "fields": ["text"],
        }},
        "highlight": {"fields": {"text": {}}},
        "sort": [{"doc_id": "asc"}],
        "size": 15,
        "_source": ["doc_id"],
    })


# ---------------------------------------------------------------------------
# 29. _rank_eval: offline search-quality grading
# ---------------------------------------------------------------------------

_RANK_EVAL_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'),
                     x -> x <> '') AS tk
  FROM documents
),
r1 AS (  -- request q_vector: first 5 docs (by id) containing 'vector'
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rk
  FROM toks WHERE list_contains(tk, 'vector')
  QUALIFY rk <= 5
),
r2 AS (  -- request q_merge: first 5 docs containing 'merge'
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rk
  FROM toks WHERE list_contains(tk, 'merge')
  QUALIFY rk <= 5
),
g1 AS (  -- ratings for q_vector: docs 1,2,4 relevant
  SELECT CAST(count(*) FILTER (WHERE doc_id IN (1, 2, 4)) AS DOUBLE)
         / 5 AS p
  FROM r1
),
g2 AS (  -- ratings for q_merge: docs 0,3 relevant
  SELECT CAST(count(*) FILTER (WHERE doc_id IN (0, 3)) AS DOUBLE)
         / 5 AS p
  FROM r2
)
SELECT 'q_vector' AS request_id, round((SELECT p FROM g1), 6)
       AS metric_score
UNION ALL
SELECT 'q_merge', round((SELECT p FROM g2), 6)
UNION ALL
SELECT '_overall',
       round(((SELECT p FROM g1) + (SELECT p FROM g2)) / 2, 6)
"""


@q("es_rank_eval_precision", _RANK_EVAL_ORACLE)
def _es_rank_eval_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``_rank_eval`` with ``precision@5``: two rated search requests
    run and grade against relevance judgments, plus ES's ``_overall``
    quality_level (the mean) — the offline search-quality harness CI
    uses to catch relevance regressions before they ship.

    Scale shape: each request is one TakeOrdered(k) plan over the
    corpus (k rows to the driver — the page being graded); grading is
    k-row arithmetic. The corpus is never collected."""
    from ..operators.esapi import run_rank_eval

    docs = _t(spark, sf_dir, "documents")
    return run_rank_eval(docs, {
        "requests": [
            {"id": "q_vector",
             "request": {"query": {"match": {"text": "vector"}},
                         "sort": [{"doc_id": "asc"}]},
             "ratings": [{"_id": 1, "rating": 1}, {"_id": 2, "rating": 1},
                         {"_id": 4, "rating": 1}]},
            {"id": "q_merge",
             "request": {"query": {"match": {"text": "merge"}},
                         "sort": [{"doc_id": "asc"}]},
             "ratings": [{"_id": 0, "rating": 1}, {"_id": 3, "rating": 1}]},
        ],
        "metric": {"precision": {"k": 5}},
    })


# ---------------------------------------------------------------------------
# 30. filtered index aliases: one name over many (filtered) indices
# ---------------------------------------------------------------------------

_ALIAS_ORACLE = """
SELECT event_type, count(*) AS n
FROM events
WHERE (event_type IN ('click', 'view') AND value >= 5.0)
   OR event_type = 'purchase'
GROUP BY event_type
"""


@q("es_alias_filtered_union", _ALIAS_ORACLE)
def _es_alias_filtered_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered index ALIASES: two physical "indices" (activity
    events and purchase events, written as separate parquet tables
    the way the day-rotated reference indices are) sit behind ONE
    alias; the activity member carries a filter (value >= 5), so a
    read through the alias sees the filtered union — ES's
    ``_aliases`` contract. The registry round-trips through its JSON
    persistence before resolution, proving the on-disk form.

    Scale shape: resolution is plan-time; each member's filter pushes
    into ITS OWN scan (union of pruned scans, no copy)."""
    import tempfile

    from pyspark.sql import functions as F

    from ..operators.aliases import (
        load_aliases,
        resolve_alias,
        save_aliases,
    )

    ev = _t(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="alias_idx_")
    p_act = f"{base}/activity"
    p_pur = f"{base}/purchases"
    ev.filter(F.col("event_type").isin("click", "view")).write.mode(
        "overwrite"
    ).parquet(p_act)
    ev.filter(F.col("event_type") == "purchase").write.mode(
        "overwrite"
    ).parquet(p_pur)
    registry = {"engagement": [
        {"path": p_act, "filter": {"range": {"value": {"gte": 5.0}}}},
        {"path": p_pur},
    ]}
    reg_path = f"{base}/aliases.json"
    save_aliases(registry, reg_path)
    frame = resolve_alias(spark, load_aliases(reg_path), "engagement")
    return frame.groupBy("event_type").agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# 31. sparse_vector: learned sparse retrieval (ELSER/SPLADE shape)
# ---------------------------------------------------------------------------

_SPARSE_VECTOR_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'),
                     x -> x <> '') AS tk
  FROM documents
),
tf AS (
  SELECT doc_id,
         len(list_filter(tk, x -> x = 'merge')) AS tf_merge,
         len(list_filter(tk, x -> x = 'vector')) AS tf_vector,
         len(list_filter(tk, x -> x = 'scan')) AS tf_scan
  FROM toks
)
SELECT doc_id,
       round(1.5 * tf_merge + 2.0 * tf_vector + 0.5 * tf_scan, 6)
         AS score
FROM tf
WHERE tf_merge > 0 OR tf_vector > 0 OR tf_scan > 0
ORDER BY score DESC, doc_id
LIMIT 25
"""


@q("es_search_sparse_vector", _SPARSE_VECTOR_ORACLE)
def _es_search_sparse_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sparse_vector`` — learned sparse retrieval, the ELSER/SPLADE
    query shape: documents carry a map<term, weight> of their
    NON-ZERO expansion terms (derived here as term frequencies over a
    small vocabulary, zero entries dropped — exactly what a sparse
    encoder emits), the request carries the query's expansion, and
    the score is their dot product. Matches docs holding ANY query
    term.

    Scale shape: the dot product is one codegen expression of
    try_element_at lookups — no explode of the map, no join, no
    shuffle; TakeOrdered(25). At 100 TB this is the cheap learned-
    retrieval path (the posting-list-backed variant would live in
    sinks/textindex.py like BM25's)."""
    from pyspark.sql import functions as F

    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    tk = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")

    def tf(term: str):
        return F.size(F.filter(tk, lambda t: t == F.lit(term))).cast(
            "double"
        )

    vocab = ["merge", "vector", "scan"]
    sparse = F.map_filter(
        F.map_from_arrays(
            F.array(*[F.lit(t) for t in vocab]),
            F.array(*[tf(t) for t in vocab]),
        ),
        lambda _k, v: v > 0,
    )
    docs = docs.withColumn("expansion", sparse)
    out = run_search_body(docs, {
        "query": {"sparse_vector": {
            "field": "expansion",
            "query_vector": {"merge": 1.5, "vector": 2.0, "scan": 0.5},
        }},
        "sort": [{"_score": "desc"}],
        "size": 25,
        "_source": ["doc_id"],
    })
    return out.select("doc_id", F.round("_score", 6).alias("score"))


# ---------------------------------------------------------------------------
# 32. _msearch/template: a batch of rendered stored queries
# ---------------------------------------------------------------------------

_MSEARCH_TEMPLATE_ORACLE = """
SELECT CAST(1 AS BIGINT) AS request, c_custkey
FROM customer WHERE c_mktsegment = 'BUILDING' AND c_acctbal >= 9000
UNION ALL
SELECT 2, c_custkey
FROM customer WHERE c_mktsegment = 'MACHINERY' AND c_acctbal >= 9500
ORDER BY request, c_custkey
"""


@q("es_msearch_template", _MSEARCH_TEMPLATE_ORACLE)
def _es_msearch_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``_msearch/template``: one stored template rendered twice with
    different params and executed as an msearch batch — the saved-
    search dashboard pattern (each panel a (template, params) pair).

    Scale shape: per-request plans over the shared scan, identical to
    literal msearch."""
    from ..operators.esapi import run_msearch_template

    cust = _t(spark, sf_dir, "customer")
    template = """
    {
      "query": {"bool": {"filter": [
        {"term": {"c_mktsegment": "{{seg}}"}},
        {"range": {"c_acctbal": {"gte": {{min_bal}}}}}
      ]}},
      "sort": [{"c_custkey": "asc"}],
      "size": 10000,
      "_source": ["c_custkey"]
    }
    """
    out = run_msearch_template(cust, [
        (template, {"seg": "BUILDING", "min_bal": 9000}),
        (template, {"seg": "MACHINERY", "min_bal": 9500}),
    ])
    return out.select("request", "c_custkey")


# ---------------------------------------------------------------------------
# 33. highlight fragments: snippets, not whole fields
# ---------------------------------------------------------------------------

_HIGHLIGHT_FRAGMENTS_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'),
                     x -> x <> '') AS tk
  FROM documents
),
hits AS (SELECT doc_id, tk FROM toks WHERE list_contains(tk, 'vector')),
marked AS (
  SELECT doc_id,
         list_transform(tk, x -> CASE WHEN x = 'vector'
                                 THEN '<em>' || x || '</em>'
                                 ELSE x END) AS mk
  FROM hits
),
pos AS (
  SELECT doc_id, mk,
         (list_filter(list_transform(mk, (x, i) ->
             CASE WHEN x LIKE '<em>%' THEN i ELSE -1 END),
           p -> p >= 0))[1:2] AS ps
  FROM marked
)
SELECT doc_id,
       array_to_string(
         list_transform(ps, p ->
           array_to_string(mk[greatest(1, p - 2):p + 2], ' ')),
         ' ... ') AS text_highlight
FROM pos
ORDER BY doc_id
LIMIT 12
"""


@q("es_search_highlight_fragments", _HIGHLIGHT_FRAGMENTS_ORACLE)
def _es_search_highlight_fragments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``highlight`` with ``number_of_fragments: 2``: SNIPPETS — token
    windows of radius 2 around the first two match positions, joined
    with " ... " — instead of the whole marked field (what result
    lists actually show; a 10 KB log line must not ship to render one
    matched word). ``fragment_token_radius`` is the engine's
    token-based reading of ES's char-sized fragments; char-based
    ``fragment_size`` rejects at plan time rather than approximating
    silently.

    Scale shape: the fragmenting is two more in-row HOFs on the HIT
    page only — no extra scan, and the returned bytes shrink from
    whole-document to 2x(2r+1) tokens."""
    from ..operators.querydsl import run_search_body

    docs = _t(spark, sf_dir, "documents")
    return run_search_body(docs, {
        "query": {"match": {"text": "vector"}},
        "highlight": {"fields": {"text": {
            "number_of_fragments": 2, "fragment_token_radius": 2}}},
        "sort": [{"doc_id": "asc"}],
        "size": 12,
        "_source": ["doc_id"],
    })


# ---------------------------------------------------------------------------
# 34. the retention sweep end-to-end: _cat/indices + the keep decision
# ---------------------------------------------------------------------------

_CAT_RETENTION_ORACLE = """
SELECT 'gorouter-' || strftime(ts, '%Y-%m-%d') AS index,
       count(*) AS doc_count,
       (strftime(ts, '%Y-%m-%d') >= '2024-01-15') AS keep
FROM events
GROUP BY 1, 3
ORDER BY index
"""


@q("es_cat_indices_retention", _CAT_RETENTION_ORACLE)
def _es_cat_indices_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's retention cron, end-to-end as one frame: events
    land through the day-partitioned bulk sink (``gorouter-YYYY-MM-DD``
    indices, main.go:400), ``_cat/indices`` lists each index with its
    doc count (main.go:214's listing), and the retention predicate
    (cutoff 2024-01-15, main.go:232-239) stamps the keep/drop
    decision — exactly what ``drop_expired`` then acts on
    (crash-safe partition drops, covered by the sink's unit tests).

    Scale shape: the listing is a grouped count on the PARTITION
    column (directory listing + parquet footer counts — no data
    columns read); the keep decision is one string predicate per
    index name, catalog-sized."""
    import tempfile

    from pyspark.sql import functions as F

    from ..operators.retention import retention_keep
    from ..sinks.bulk import ParquetIndexSink

    ev = _t(spark, sf_dir, "events")
    docs = ev.select(
        F.concat(
            F.lit("gorouter-"), F.date_format("ts", "yyyy-MM-dd")
        ).alias("es_index"),
        F.col("event_id").cast("string").alias("doc_id"),
        "event_type",
        "value",
    )
    sink = ParquetIndexSink(tempfile.mkdtemp(prefix="cat_idx_"))
    sink.write(docs)
    cat = sink.cat_indices(spark)
    return cat.select(
        "index",
        "doc_count",
        retention_keep(F.col("index"), "2024-01-15").alias("keep"),
    ).orderBy("index")


# ---------------------------------------------------------------------------
# 35. multi-knn: several vector fields in one request (ES 8.7)
# ---------------------------------------------------------------------------

_MULTI_KNN_VEC_A = [round(((i * 7) % 13) / 13.0, 6) for i in range(64)]
_MULTI_KNN_VEC_B = [round(((i * 5) % 11) / 11.0, 6) for i in range(64)]

_MULTI_KNN_ORACLE = f"""
WITH q AS (
  SELECT [{", ".join(str(x) for x in _MULTI_KNN_VEC_A)}]::DOUBLE[] AS qa,
         [{", ".join(str(x) for x in _MULTI_KNN_VEC_B)}]::DOUBLE[] AS qb
),
s AS (
  SELECT e.vec_id,
         (1.0 + list_cosine_similarity(e.embedding::DOUBLE[], q.qa))
           / 2.0 AS s1,
         ((1.0 + list_cosine_similarity(
             list_reverse(e.embedding)::DOUBLE[], q.qb)) / 2.0) * 2.0
           AS s2
  FROM embeddings e CROSS JOIN q
),
a1 AS (SELECT vec_id, s1 AS s FROM s ORDER BY s1 DESC, vec_id LIMIT 20),
a2 AS (SELECT vec_id, s2 AS s FROM s ORDER BY s2 DESC, vec_id LIMIT 20),
u AS (
  SELECT vec_id, sum(s) AS score
  FROM (SELECT * FROM a1 UNION ALL SELECT * FROM a2)
  GROUP BY vec_id
)
SELECT vec_id, round(score, 6) AS score
FROM u ORDER BY score DESC, vec_id LIMIT 15
"""


@q("es_search_multi_knn", _MULTI_KNN_ORACLE)
def _es_search_multi_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-knn (ES 8.7): TWO vector fields in one request — the
    multimodal pattern (a text embedding and an image embedding per
    document; here the second field is the reversed embedding, derived
    identically on both engines). Each section retrieves its own top
    20 (the second boosted 2x); a doc's score sums the sections that
    retrieved it.

    Scale shape: one codegen dot product + TakeOrdered(20) per
    section over the shared scan; the two 20-row arms union, group,
    and broadcast-join back — documents never shuffle."""
    from pyspark.sql import functions as F

    from ..operators.querydsl import run_search_body

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding_rev", F.reverse(F.col("embedding"))
    )
    out = run_search_body(emb, {
        "knn": [
            {"field": "embedding", "query_vector": _MULTI_KNN_VEC_A,
             "k": 20},
            {"field": "embedding_rev", "query_vector": _MULTI_KNN_VEC_B,
             "k": 20, "boost": 2.0},
        ],
        "size": 15,
        "_source": ["vec_id"],
    })
    return out.select("vec_id", F.round("_score", 6).alias("score"))


# ---------------------------------------------------------------------------
# 36. _terms_enum: field-value autocomplete over index terms
# ---------------------------------------------------------------------------

_TERMS_ENUM_ORACLE = """
SELECT DISTINCT t AS term
FROM (
  SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                            x -> x <> '')) AS t
  FROM documents
)
WHERE t LIKE 's%'
ORDER BY term
LIMIT 8
"""


@q("es_terms_enum_prefix", _TERMS_ENUM_ORACLE)
def _es_terms_enum_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``_terms_enum``: the distinct index terms starting with ``s``,
    in term order — the API behind Kibana's filter-bar value
    suggestions (field-value autocomplete, as opposed to
    match_phrase_prefix's document search).

    Scale shape: explode -> prefix filter -> distinct -> TakeOrdered;
    the distinct exchange carries only prefix-matching terms."""
    from ..operators.esapi import run_terms_enum

    docs = _t(spark, sf_dir, "documents")
    return run_terms_enum(docs, {
        "field": "text", "string": "s", "size": 8,
    })


# ---------------------------------------------------------------------------
# 37. ES|QL: the piped query language (Kibana Discover's default bar)
# ---------------------------------------------------------------------------

_ESQL_STATS_ORACLE = """
SELECT event_type,
       count(*) AS n,
       round(sum(value * 100), 4) AS total_cents,
       round(avg(value), 6) AS avg_value
FROM events
WHERE value > 4.0 AND event_type <> 'error'
GROUP BY event_type
ORDER BY total_cents DESC, event_type
LIMIT 5
"""


@q("esql_stats_pipeline", _ESQL_STATS_ORACLE)
def _esql_stats_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL — the piped query language Kibana Discover ships as its
    default bar (ES 8.11+): ``FROM | WHERE | EVAL | STATS .. BY |
    SORT | LIMIT`` executed by ``operators/esql.py``. ``==`` and
    double-quoted strings translate; the pipe chain compiles to ONE
    logical plan, so Catalyst pushes the WHERE through the EVAL to
    the scan and STATS is one partial-agg shuffle — piped syntax
    changes nothing about the physics.

    Scale shape: identical to the equivalent DataFrame query (the
    oracle's SQL): scan + one exchange + TakeOrdered."""
    from pyspark.sql import functions as F

    from ..operators.esql import run_esql

    ev = _t(spark, sf_dir, "events")
    out = run_esql(
        """
        FROM events
        | WHERE value > 4.0 AND event_type != "error"
        | EVAL cents = value * 100
        | STATS n = count(*), total_cents = sum(cents),
                avg_value = avg(value) BY event_type
        | SORT total_cents DESC, event_type ASC
        | LIMIT 5
        """,
        {"events": ev},
    )
    return out.select(
        "event_type", "n",
        F.round("total_cents", 4).alias("total_cents"),
        F.round("avg_value", 6).alias("avg_value"),
    )


_ESQL_GROK_ORACLE = """
SELECT event_type AS etype,
       count(*) AS n,
       CAST(sum(CAST(trunc(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
GROUP BY event_type
ORDER BY etype
"""


@q("esql_grok_logs", _ESQL_GROK_ORACLE)
def _esql_grok_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``GROK``: raw log lines parse into typed columns INSIDE
    the pipe chain, using the SAME grok compiler the reference-parity
    stream runs — so a Kibana ES|QL query and the ingest pipeline
    parse one log line identically. The synthesized line round-trips
    real event fields; the oracle re-derives them relationally, so a
    grok miss anywhere shows as a value mismatch.

    Scale shape: GROK is the packed single-pass parse (one
    projection, no shuffle); the STATS exchange is the only wire."""
    from pyspark.sql import functions as F

    from ..operators.esql import run_esql

    ev = _t(spark, sf_dir, "events").select(
        F.concat(
            F.col("user_id").cast("string"), F.lit(" "),
            F.col("event_type"), F.lit(" "),
            (F.col("value") * 100).cast("long").cast("string"),
        ).alias("log"),
    )
    return run_esql(
        """
        FROM logs
        | GROK log "%{INT:uid:int} %{WORD:etype} %{INT:cents:int}"
        | STATS n = count(*), sum_cents = sum(cents) BY etype
        | SORT etype ASC
        """,
        {"logs": ev},
    )


_ESQL_ENRICH_ORACLE = """
SELECT c.c_mktsegment AS segment,
       count(*) AS n,
       round(sum(e.value), 4) AS total_value
FROM events e
JOIN customer c ON c.c_custkey = (e.user_id % 1500) + 1
GROUP BY c.c_mktsegment
ORDER BY segment
"""


@q("esql_enrich_stats", _ESQL_ENRICH_ORACLE)
def _esql_enrich_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES|QL ``ENRICH``: the reference's app-metadata lookup join in
    pipe syntax — events gain the customer dimension's segment via a
    broadcast join on the derived key, then aggregate by the enriched
    field. The WITH clause narrows the added columns so the broadcast
    carries only what the query reads.

    Scale shape: one broadcast hash join (the dimension is the small
    side, like every enrichment in this engine) + one STATS
    partial-agg shuffle."""
    from pyspark.sql import functions as F

    from ..operators.esql import run_esql

    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")
    out = run_esql(
        """
        FROM events
        | EVAL c_custkey = user_id % 1500 + 1
        | ENRICH customers ON c_custkey WITH c_mktsegment
        | STATS n = count(*), total_value = sum(value) BY c_mktsegment
        | RENAME c_mktsegment AS segment
        | SORT segment ASC
        """,
        {"events": ev, "customers": cust},
    )
    return out.select(
        "segment", "n", F.round("total_value", 4).alias("total_value")
    )
