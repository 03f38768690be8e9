"""Declared queries for the persisted inverted text index + BM25
search (sinks/textindex.py) — the Elasticsearch-core parity family:
the reference ships documents INTO an inverted-index store
(main.go:189-207, bulk indexing); this engine also IS one.

Both queries run the full sink round-trip: build the physical index
(postings partitioned by term-hash bucket) under a temp root, then
serve the search from disk with partition-pruned scans. The oracle
recomputes the same answer straight from `documents` — the index
layout may change the plan, never the answer.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from .declared import q
from .northstar import _norm_sql, _tp

_TERMS = ["merge", "spark", "vector"]
_TERMS_SQL = ", ".join(f"'{t}'" for t in _TERMS)
_K1, _B, _TOPK = 1.2, 0.75, 10


def _index_root(sf_dir: str) -> Path:
    sf = Path(sf_dir).name or "sf"
    return Path(tempfile.gettempdir()) / "spark_graft_text_index" / sf


_BUILT: set[str] = set()


def _built_index(spark: SparkSession, sf_dir: str) -> Path:
    """Build (once per process per SF) and return the index root. The
    three search queries share one build instead of paying it each —
    a fresh driver process always rebuilds, so a stale index can only
    be seen within the process that just built it. (Concurrent
    PROCESSES would race on the shared temp root; the driver and bench
    run single-process, and tests use per-test tmp_paths.)"""
    from ..sinks.textindex import build_text_index

    root = _index_root(sf_dir)
    key = str(root)
    if key not in _BUILT:
        docs = _tp(spark, sf_dir, "documents")
        build_text_index(docs, root)
        _BUILT.add(key)
    return root


_AND_ORACLE = f"""
WITH n AS (SELECT doc_id, {_norm_sql('text')} AS norm FROM documents),
tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS term FROM n),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM tok WHERE term <> '' GROUP BY doc_id, term),
p AS (SELECT * FROM tf WHERE term IN ({_TERMS_SQL}))
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS total_tf
FROM p GROUP BY doc_id HAVING count(*) = {len(_TERMS)}
"""


@q("text_search_and", _AND_ORACLE)
def _text_search_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean AND search from the persisted inverted index: documents
    containing every query term, via posting-list intersection
    (groupBy-count over <= |terms| pruned posting lists). The bucket
    partition filter means only the queried terms' directories are
    read — work scales with posting sizes, not corpus size."""
    from ..sinks.textindex import search_and

    root = _built_index(spark, sf_dir)
    return search_and(spark, root, _TERMS)


# Rounded-score ordering on BOTH sides: two scores differing only past
# 6 decimals must tie identically, falling to the doc_id tiebreak.
_BM25_ORACLE = f"""
WITH n AS (SELECT doc_id, {_norm_sql('text')} AS norm FROM documents),
tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS term FROM n),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM tok WHERE term <> '' GROUP BY doc_id, term),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_len FROM dl),
p AS (SELECT * FROM tf WHERE term IN ({_TERMS_SQL})),
dfq AS (SELECT term, count(*) AS df FROM p GROUP BY term),
c AS (
  SELECT p.doc_id, p.term,
         ln(1.0 + (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
         * ((p.tf * (1.0 + {_K1}))
            / (p.tf + {_K1} * (1.0 - {_B} + {_B} *
               (dl.dl / (CAST(stats.total_len AS DOUBLE) / stats.n_docs)))))
           AS contrib
  FROM p JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
d AS (SELECT doc_id, count(*) AS n_hit_terms,
             round(list_sum(list(contrib ORDER BY term ASC)), 6) AS score
      FROM c GROUP BY doc_id)
SELECT doc_id, CAST(n_hit_terms AS BIGINT) AS n_hit_terms, score
FROM d ORDER BY score DESC, doc_id LIMIT {_TOPK}
"""


@q("bm25_search_topk", _BM25_ORACLE)
def _bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-ranked search from the persisted index — the Lucene/ES
    practical scoring function over partition-pruned posting lists.
    All score inputs are integers (tf, df, dl, N, total_len); the float
    tree is identical in the oracle and the per-doc term fold runs in
    ascending-term order, so scores hash-match bit-for-bit."""
    from ..sinks.textindex import bm25_topk

    root = _built_index(spark, sf_dir)
    return bm25_topk(spark, root, _TERMS, k=_TOPK, k1=_K1, b=_B)


_B_MUST = ["merge", "spark"]
_B_SHOULD = ["slow", "vector"]
_B_NOT = ["filter"]


def _sql_in(terms: list[str]) -> str:
    return ", ".join(f"'{t}'" for t in terms)


_BOOL_ORACLE = f"""
WITH n AS (SELECT doc_id, {_norm_sql('text')} AS norm FROM documents),
tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS term FROM n),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM tok WHERE term <> '' GROUP BY doc_id, term),
p AS (SELECT * FROM tf WHERE term IN ({_sql_in(_B_MUST + _B_SHOULD)})),
agg AS (
  SELECT doc_id,
         sum(CASE WHEN term IN ({_sql_in(_B_MUST)}) THEN 1 ELSE 0 END)
           AS n_must,
         sum(CASE WHEN term IN ({_sql_in(_B_SHOULD)}) THEN 1 ELSE 0 END)
           AS n_should,
         sum(tf) AS total_tf
  FROM p GROUP BY doc_id),
neg AS (SELECT DISTINCT doc_id FROM tf WHERE term IN ({_sql_in(_B_NOT)}))
SELECT doc_id,
       CAST(n_should AS BIGINT) AS n_should_hits,
       CAST(total_tf AS BIGINT) AS total_tf
FROM agg
WHERE n_must = {len(_B_MUST)} AND n_should >= 1
  AND doc_id NOT IN (SELECT doc_id FROM neg)
"""


@q("boolean_search_docs", _BOOL_ORACLE)
def _boolean_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES bool-query core from the persisted index
    (sinks/textindex.search_boolean): must=ALL / should=>=1 /
    must_not=NONE composed from bucket-pruned posting-list scans — the
    boolean retrieval layer under every ES filter context. The oracle
    recomputes membership straight from the corpus."""
    from ..sinks.textindex import search_boolean

    root = _built_index(spark, sf_dir)
    return search_boolean(
        spark, root, must=_B_MUST, should=_B_SHOULD, must_not=_B_NOT
    )


_SUGGEST_PREFIX = "s"
_SUGGEST_K = 8

_SUGGEST_ORACLE = f"""
WITH n AS (SELECT doc_id, {_norm_sql('text')} AS norm FROM documents),
tok AS (SELECT DISTINCT doc_id, unnest(string_split(norm, ' ')) AS term
        FROM n),
pt AS (SELECT term, count(*) AS df FROM tok
       WHERE term <> '' AND term LIKE '{_SUGGEST_PREFIX}%' GROUP BY term),
r AS (SELECT term, CAST(df AS BIGINT) AS df,
             row_number() OVER (ORDER BY df DESC, term ASC) AS rank
      FROM pt)
SELECT term, df, rank FROM r WHERE rank <= {_SUGGEST_K}
"""


@q("suggest_terms_prefix", _SUGGEST_ORACLE)
def _suggest_terms_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES completion-suggester analogue (sinks/textindex.suggest_terms):
    index terms under a prefix ranked by document frequency — the
    popularity contract a sorted dictionary sidecar must reproduce at
    serving scale."""
    from ..sinks.textindex import suggest_terms

    root = _built_index(spark, sf_dir)
    return suggest_terms(spark, root, _SUGGEST_PREFIX, k=_SUGGEST_K)


_MLT_TEXT = "slow merge spark table query slow zzzqx"  # dup term + OOV
_MLT_N = 4

_MLT_ORACLE = f"""
WITH n AS (SELECT doc_id, {_norm_sql('text')} AS norm FROM documents),
tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS term FROM n),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM tok WHERE term <> '' GROUP BY doc_id, term),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_len FROM dl),
lt AS (SELECT term, count(*) AS ltf
       FROM (SELECT unnest(string_split({_norm_sql(f"'{_MLT_TEXT}'")}, ' '))
                AS term)
       WHERE term <> '' GROUP BY term),
ldf AS (SELECT term, count(*) AS df FROM tf
        WHERE term IN (SELECT term FROM lt) GROUP BY term),
selr AS (
  SELECT lt.term,
         row_number() OVER (
           ORDER BY round(lt.ltf * ln(1.0 + (stats.n_docs - ldf.df + 0.5)
                                            / (ldf.df + 0.5)), 9) DESC,
                    lt.term ASC) AS rn
  FROM lt JOIN ldf USING (term) CROSS JOIN stats),
sel AS (SELECT term FROM selr WHERE rn <= {_MLT_N}),
p AS (SELECT tf.* FROM tf JOIN sel USING (term)),
dfq AS (SELECT term, count(*) AS df FROM p GROUP BY term),
c AS (
  SELECT p.doc_id, p.term,
         ln(1.0 + (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
         * ((p.tf * (1.0 + {_K1}))
            / (p.tf + {_K1} * (1.0 - {_B} + {_B} *
               (dl.dl / (CAST(stats.total_len AS DOUBLE) / stats.n_docs)))))
           AS contrib
  FROM p JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
d AS (SELECT doc_id, count(*) AS n_hit_terms,
             round(list_sum(list(contrib ORDER BY term ASC)), 6) AS score
      FROM c GROUP BY doc_id)
SELECT doc_id, CAST(n_hit_terms AS BIGINT) AS n_hit_terms, score
FROM d ORDER BY score DESC, doc_id LIMIT {_TOPK}
"""


@q("more_like_this_topk", _MLT_ORACLE)
def _more_like_this_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES more_like_this from the persisted index
    (sinks/textindex.more_like_this): the like-text's terms ranked by
    tf x BM25-idf against the INDEX's document frequencies (out-of-
    vocabulary terms dropped, duplicate terms boost tf), top
    {_MLT_N} become a bm25_topk query. Term selection AND the final
    ranking replay in SQL — the whole similar-documents pipeline is
    hash-checked."""
    from ..sinks.textindex import more_like_this

    root = _built_index(spark, sf_dir)
    return more_like_this(
        spark, root, _MLT_TEXT, max_query_terms=_MLT_N, k=_TOPK,
        k1=_K1, b=_B,
    )


_FUZZY_TERM = "low"  # matches 'row' (substitution) and 'slow' (insertion)

_FUZZY_ORACLE = f"""
WITH n AS (SELECT doc_id, {_norm_sql('text')} AS norm FROM documents),
tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS term FROM n),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM tok WHERE term <> '' GROUP BY doc_id, term),
m AS (SELECT DISTINCT term FROM tf
      WHERE levenshtein(term, '{_FUZZY_TERM}') <= 1),
p AS (SELECT tf.* FROM tf JOIN m USING (term))
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(tf) AS BIGINT) AS total_tf
FROM p GROUP BY doc_id
"""


@q("fuzzy_term_search", _FUZZY_ORACLE)
def _fuzzy_term_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES-style fuzzy matching (fuzziness: 1) from the persisted index
    (sinks/textindex.fuzzy_search): SymSpell deletion-neighborhood
    candidates over the term dictionary, exact levenshtein verify,
    bucket-pruned posting fetch for the matched terms only. The oracle
    recomputes membership with a straight levenshtein scan."""
    from ..sinks.textindex import fuzzy_search

    root = _built_index(spark, sf_dir)
    return fuzzy_search(spark, root, _FUZZY_TERM, max_edits=1)


_PHRASE = ["table", "hash"]

_PHRASE_ORACLE = f"""
WITH n AS (SELECT doc_id, {_norm_sql('text')} AS norm FROM documents),
tok AS (SELECT doc_id,
               unnest(string_split(norm, ' ')) AS t,
               generate_subscripts(string_split(norm, ' '), 1) - 1 AS p
        FROM n),
hits AS (
  SELECT a.doc_id
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.p = a.p + 1
  WHERE a.t = '{_PHRASE[0]}' AND b.t = '{_PHRASE[1]}')
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
FROM hits GROUP BY doc_id
"""


@q("phrase_search_count", _PHRASE_ORACLE)
def _phrase_search_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search from the positional inverted index
    (sinks/textindex.phrase_search): per-document occurrence counts of
    consecutive-token phrases via shifted position-array intersection
    over bucket-pruned postings — the ES match_phrase analogue. The
    oracle recomputes occurrences with a positional self-join straight
    from the corpus."""
    from ..sinks.textindex import phrase_search

    root = _built_index(spark, sf_dir)
    return phrase_search(spark, root, _PHRASE)


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 (lexical) + embedding cosine (semantic) fused
# with Reciprocal Rank Fusion — the standard two-tower serving recipe
# (ES "retriever: rrf" / hybrid search). Each arm retrieves to depth
# _RRF_DEPTH independently (the lexical arm from the persisted
# partition-pruned index, the semantic arm streaming the corpus against
# ONE broadcast query vector); fusion then touches only 2*depth rows.
# RRF score = sum over arms of 1 / (RRF_K + rank) — rank-only fusion,
# so the two arms' incomparable score scales never meet.
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_DEPTH = 20
_RRF_TOPK = 10
_RRF_QVEC = 0  # semantic query: embedding of vec_id 0 (doc_id-aligned)

_RRF_ORACLE = f"""
WITH n AS (SELECT doc_id, {_norm_sql('text')} AS norm FROM documents),
tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS term FROM n),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM tok WHERE term <> '' GROUP BY doc_id, term),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_len FROM dl),
p AS (SELECT * FROM tf WHERE term IN ({_TERMS_SQL})),
dfq AS (SELECT term, count(*) AS df FROM p GROUP BY term),
c AS (
  SELECT p.doc_id,
         ln(1.0 + (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
         * ((p.tf * (1.0 + {_K1}))
            / (p.tf + {_K1} * (1.0 - {_B} + {_B} *
               (dl.dl / (CAST(stats.total_len AS DOUBLE) / stats.n_docs)))))
           AS contrib,
         p.term
  FROM p JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
d AS (SELECT doc_id,
             round(list_sum(list(contrib ORDER BY term ASC)), 6) AS score
      FROM c GROUP BY doc_id),
bmr AS (SELECT doc_id,
               row_number() OVER (ORDER BY score DESC, doc_id) AS bm25_rank
        FROM d QUALIFY bm25_rank <= {_RRF_DEPTH}),
qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings
       WHERE vec_id = {_RRF_QVEC}),
sims AS (SELECT vec_id AS doc_id,
                round(list_cosine_similarity(qv, embedding::DOUBLE[]), 4)
                  AS sim
         FROM embeddings CROSS JOIN qv WHERE vec_id <> {_RRF_QVEC}),
semr AS (SELECT doc_id,
                row_number() OVER (ORDER BY sim DESC, doc_id) AS cos_rank
         FROM sims QUALIFY cos_rank <= {_RRF_DEPTH}),
fused AS (
  SELECT coalesce(b.doc_id, s.doc_id) AS doc_id,
         CAST(b.bm25_rank AS BIGINT) AS bm25_rank,
         CAST(s.cos_rank AS BIGINT) AS cos_rank,
         round(coalesce(1.0 / ({_RRF_K} + b.bm25_rank), 0.0)
               + coalesce(1.0 / ({_RRF_K} + s.cos_rank), 0.0), 6)
           AS rrf_score
  FROM bmr b FULL OUTER JOIN semr s ON b.doc_id = s.doc_id)
SELECT doc_id, bm25_rank, cos_rank, rrf_score
FROM fused ORDER BY rrf_score DESC, doc_id LIMIT {_RRF_TOPK}
"""


@q("hybrid_rrf_search", _RRF_ORACLE)
def _hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+semantic retrieval with Reciprocal Rank Fusion:
    BM25 top-N from the persisted inverted index fused with exact
    cosine top-N over the embedding corpus by 1/(k+rank) — the ES
    hybrid-search / "retriever: rrf" analogue. Each arm is the proven
    scale shape (pruned postings vs broadcast-query corpus stream);
    fusion is a full-outer join of two depth-N rank lists, trivially
    broadcastable at any corpus size. The oracle replays both arms and
    the fusion straight from the corpus tables."""
    from pyspark.sql import Window, functions as F

    from ..operators.similarity import cosine_topk
    from ..sinks.textindex import bm25_topk

    root = _built_index(spark, sf_dir)
    bm = bm25_topk(spark, root, _TERMS, k=_RRF_DEPTH, k1=_K1, b=_B)
    # depth-N frame: the no-partition window ranks <= _RRF_DEPTH rows
    bmr = bm.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col("doc_id")))
        .cast("long")
        .alias("bm25_rank"),
    )
    emb = _tp(spark, sf_dir, "embeddings")
    sem = cosine_topk(
        emb, emb.filter(F.col("vec_id") == _RRF_QVEC), k=_RRF_DEPTH
    ).select(
        F.col("vec_id").alias("doc_id"),
        F.col("rank").cast("long").alias("cos_rank"),
    )
    fused = bmr.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        "bm25_rank",
        "cos_rank",
        F.round(
            F.coalesce(1.0 / (_RRF_K + F.col("bm25_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (_RRF_K + F.col("cos_rank")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    return fused.orderBy(
        F.col("rrf_score").desc(), F.col("doc_id")
    ).limit(_RRF_TOPK)


# ---------------------------------------------------------------------------
# Rare-terms aggregation (ES `rare_terms`): the long tail a terms agg
# truncates away — terms appearing in at most N documents, count
# ascending. ES implements it with a CuckooFilter-backed streaming
# pass; an exact distributed groupBy IS the Spark-native equivalent
# (the shuffle moves (term, doc) pairs once, map-side combined).
# ---------------------------------------------------------------------------

_RARE_MAX_DOCS = 3

_RARE_ORACLE = f"""
WITH n AS (SELECT doc_id, string_split({_norm_sql('text')}, ' ') AS toks
           FROM documents),
g AS (SELECT DISTINCT doc_id, toks[p + 1] || ' ' || toks[p + 2] AS term
      FROM (SELECT doc_id, toks,
                   unnest(generate_series(0, len(toks) - 2)) AS p
            FROM n)),
d AS (SELECT term, count(*) AS doc_count FROM g GROUP BY term)
SELECT term, CAST(doc_count AS BIGINT) AS doc_count
FROM d WHERE doc_count <= {_RARE_MAX_DOCS}
"""


@q("rare_terms_docs", _RARE_ORACLE)
def _rare_terms_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rare_terms over word bigrams: phrases contained in at most
    _RARE_MAX_DOCS documents — the exact long-tail enumeration that
    top-N terms aggregations structurally cannot return (ES backs it
    with a CuckooFilter stream; an exact map-side-combined groupBy is
    the Spark-native equivalent). Per-doc distinct bigrams dedup
    IN-ROW (array_distinct before the explode), so the exchange
    carries each (bigram, doc) membership once."""
    from pyspark.sql import functions as F

    from ..operators.dedup import normalized_text

    docs = _tp(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.split(normalized_text(F.col("text")), " ").alias("__toks"),
    )
    n = F.size(F.col("__toks"))
    bigrams = F.array_distinct(
        F.transform(
            F.when(n >= 2, F.sequence(F.lit(0), n - 2))
            .otherwise(F.array().cast("array<int>")),
            lambda p: F.concat_ws(
                " ",
                F.element_at(F.col("__toks"), p + 1),
                F.element_at(F.col("__toks"), p + 2),
            ),
        )
    )
    tok = staged.select("doc_id", F.explode(bigrams).alias("term"))
    return (
        tok.groupBy("term")
        .agg(F.count("*").cast("long").alias("doc_count"))
        .filter(F.col("doc_count") <= _RARE_MAX_DOCS)
    )


# ---------------------------------------------------------------------------
# Adjacency-matrix aggregation (ES `adjacency_matrix`): doc counts for
# each named filter and each pairwise filter intersection — the
# co-occurrence view Kibana renders as a heat map. One corpus scan
# computes per-doc membership flags; the matrix is conditional sums of
# flag products; bucket rows unpivot from the single aggregate row.
# ---------------------------------------------------------------------------

_ADJ_FILTERS = ["merge", "spark", "vector"]

_ADJ_ORACLE = f"""
WITH n AS (SELECT doc_id, {_norm_sql('text')} AS norm FROM documents),
f AS (SELECT doc_id,
             {", ".join(
                 f"CASE WHEN list_contains(string_split(norm, ' '), '{t}') "
                 f"THEN 1 ELSE 0 END AS f{i}"
                 for i, t in enumerate(_ADJ_FILTERS))}
      FROM n),
a AS MATERIALIZED (
  SELECT {", ".join(f"sum(f{i}) AS n{i}" for i in range(3))},
         sum(f0 * f1) AS n01, sum(f0 * f2) AS n02, sum(f1 * f2) AS n12
  FROM f)
SELECT bucket, CAST(doc_count AS BIGINT) AS doc_count FROM (
  SELECT '{_ADJ_FILTERS[0]}' AS bucket, n0 AS doc_count FROM a
  UNION ALL SELECT '{_ADJ_FILTERS[1]}', n1 FROM a
  UNION ALL SELECT '{_ADJ_FILTERS[2]}', n2 FROM a
  UNION ALL SELECT '{_ADJ_FILTERS[0]}&{_ADJ_FILTERS[1]}', n01 FROM a
  UNION ALL SELECT '{_ADJ_FILTERS[0]}&{_ADJ_FILTERS[2]}', n02 FROM a
  UNION ALL SELECT '{_ADJ_FILTERS[1]}&{_ADJ_FILTERS[2]}', n12 FROM a)
"""


@q("adjacency_matrix_counts", _ADJ_ORACLE)
def _adjacency_matrix_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES adjacency_matrix: document counts for each named term filter
    and each pairwise intersection, from ONE corpus scan — per-doc 0/1
    membership flags, conditional sums, then a 6-way unpivot of the
    single aggregate row (the unpivot re-reads a one-row frame, not
    the corpus). A filters-per-pass union would rescan the corpus per
    bucket; this is the map-side-combined shape."""
    from pyspark.sql import functions as F

    from ..operators.dedup import normalized_text

    docs = _tp(spark, sf_dir, "documents")
    staged = docs.select(
        F.split(normalized_text(F.col("text")), " ").alias("__toks")
    )
    flags = staged.select(
        *[
            F.array_contains("__toks", t).cast("int").alias(f"f{i}")
            for i, t in enumerate(_ADJ_FILTERS)
        ]
    )
    a = flags.agg(
        F.sum("f0").alias("n0"),
        F.sum("f1").alias("n1"),
        F.sum("f2").alias("n2"),
        F.sum(F.col("f0") * F.col("f1")).alias("n01"),
        F.sum(F.col("f0") * F.col("f2")).alias("n02"),
        F.sum(F.col("f1") * F.col("f2")).alias("n12"),
    )
    t0, t1, t2 = _ADJ_FILTERS
    return a.select(
        F.expr(
            f"stack(6, '{t0}', n0, '{t1}', n1, '{t2}', n2, "
            f"'{t0}&{t1}', n01, '{t0}&{t2}', n02, '{t1}&{t2}', n12) "
            "AS (bucket, doc_count)"
        )
    ).select("bucket", F.col("doc_count").cast("long").alias("doc_count"))


# ---------------------------------------------------------------------------
# Percolator: match the corpus against STORED queries (ES percolate).
# Ten saved term queries (must / must_not sets over the fixture
# vocabulary, incl. a zero-match query and a 3-term conjunction); the
# oracle replays the same conjunctive-count + anti-join decomposition.
# ---------------------------------------------------------------------------

_PERC_QUERIES: tuple[tuple[str, tuple[str, ...], tuple[str, ...]], ...] = (
    ("q01", ("spark", "join"), ()),
    ("q02", ("window", "hash"), ()),
    ("q03", ("stream", "batch"), ("vector",)),
    ("q04", ("merge", "sort", "filter"), ()),
    ("q05", ("customer",), ("hash",)),
    ("q06", ("vector", "query"), ("slow",)),
    ("q07", ("agg", "group"), ()),
    ("q08", ("zzznomatch",), ()),
    ("q09", ("the", "a"), ()),
    ("q10", ("fast",), ("slow",)),
)


def _perc_values_sql() -> str:
    rows = []
    for qid, must, must_not in _PERC_QUERIES:
        m = "[" + ", ".join(f"'{t}'" for t in must) + "]"
        mn = "[" + ", ".join(f"'{t}'" for t in must_not) + "]::VARCHAR[]"
        rows.append(f"('{qid}', {m}, {mn})")
    return ",\n      ".join(rows)


_PERC_ORACLE = f"""
WITH n AS (SELECT doc_id, {_norm_sql('text')} AS norm FROM documents),
tok AS (SELECT DISTINCT doc_id, unnest(string_split(norm, ' ')) AS term
        FROM n),
tokf AS (SELECT doc_id, term FROM tok WHERE term <> ''),
qs AS (SELECT * FROM (VALUES
      {{values}}
  ) AS t(query_id, must, must_not)),
mt AS (SELECT query_id, len(must) AS n_must, unnest(must) AS term FROM qs),
cand AS (SELECT t.doc_id, m.query_id
         FROM tokf t JOIN mt m USING (term)
         GROUP BY t.doc_id, m.query_id, m.n_must
         HAVING count(*) = m.n_must),
bt AS (SELECT query_id, unnest(must_not) AS term FROM qs),
ban AS (SELECT DISTINCT t.doc_id, b.query_id
        FROM tokf t JOIN bt b USING (term)),
m AS (SELECT c.doc_id, c.query_id FROM cand c
      WHERE NOT EXISTS (SELECT 1 FROM ban b
                        WHERE b.doc_id = c.doc_id
                          AND b.query_id = c.query_id))
SELECT q.query_id,
       CAST(count(m.doc_id) AS BIGINT) AS n_docs,
       min(m.doc_id) AS min_doc, max(m.doc_id) AS max_doc
FROM qs q LEFT JOIN m ON q.query_id = m.query_id
GROUP BY q.query_id ORDER BY q.query_id
""".format(values=_perc_values_sql())


@q("percolate_matches", _PERC_ORACLE)
def percolate_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percolate parity: which stored queries match each document,
    aggregated per query (zero-match queries surface with n_docs=0).
    Equi-join decomposition — conjunctions as matched-term counting,
    must_not as a broadcast anti join; no doc x query cross product
    (operators/percolate.py)."""
    from pyspark.sql import functions as F

    from ..operators.dedup import normalized_text
    from ..operators.percolate import percolate

    docs = _tp(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.explode(
                F.split(normalized_text(F.col("text")), " ")
            ).alias("token"),
        )
        .where(F.col("token") != "")
        .distinct()
    )
    queries = spark.createDataFrame(
        [(qid, list(m), list(mn)) for qid, m, mn in _PERC_QUERIES],
        "query_id string, must array<string>, must_not array<string>",
    )
    matches = percolate(toks, queries)
    agg = matches.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )
    return (
        queries.select("query_id")
        .join(agg, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            "min_doc",
            "max_doc",
        )
        .orderBy("query_id")
    )


_HL_TERM = "spark"
_HL_WIN = 30

_HIGHLIGHT_ORACLE = f"""
WITH hit AS (
  SELECT doc_id, text,
         CAST(strpos(text, '{_HL_TERM}') AS BIGINT) AS pos
  FROM documents
  WHERE strpos(text, '{_HL_TERM}') > 0
),
cut AS (
  SELECT doc_id, text, pos,
         CASE WHEN pos - {_HL_WIN} > 1 THEN pos - {_HL_WIN} ELSE 1 END
           AS snip_start
  FROM hit
)
SELECT doc_id, pos,
       CAST((length(text) - length(replace(text, '{_HL_TERM}', '')))
            // {len(_HL_TERM)} AS BIGINT) AS n_occurrences,
       substr(text, snip_start, pos - snip_start)
         || '<em>' || '{_HL_TERM}' || '</em>'
         || substr(text, pos + {len(_HL_TERM)}, {_HL_WIN}) AS snippet
FROM cut
ORDER BY doc_id
"""


@q("highlight_snippets", _HIGHLIGHT_ORACLE)
def _highlight_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES highlight parity: for every document matching the term
    query, the first-occurrence offset, total occurrence count, and a
    +/-30-char snippet with <em> markers around the match. Pure narrow
    string expressions (instr/substr/replace) under whole-stage
    codegen — no tokenization, no shuffle except the output sort; the
    term filter is evaluated at the scan."""
    from pyspark.sql import functions as F

    term, L, W = _HL_TERM, len(_HL_TERM), _HL_WIN
    docs = _tp(spark, sf_dir, "documents")
    pos = F.instr("text", term).cast("long")
    hit = docs.select("doc_id", "text", pos.alias("pos")).where(
        F.col("pos") > 0
    )
    start = F.when(F.col("pos") - W > 1, F.col("pos") - W).otherwise(
        F.lit(1)
    )
    cut = hit.withColumn("snip_start", start)
    n_occ = (
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(term)))
        )
        / L
    ).cast("long")
    snippet = F.concat(
        F.expr("substr(text, snip_start, pos - snip_start)"),
        F.lit("<em>" + term + "</em>"),
        F.expr(f"substr(text, pos + {L}, {W})"),
    )
    return cut.select(
        "doc_id",
        "pos",
        n_occ.alias("n_occurrences"),
        snippet.alias("snippet"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# rank_eval: ES's search-quality evaluation API — precision@k and MRR
# of a ranked retrieval against a judgment set, computed over the
# hybrid RRF run above (judgments: deterministic doc_id % 3 == 0).
# ---------------------------------------------------------------------------

_EVAL_K = 10

_RANK_EVAL_ORACLE = f"""
WITH r AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rank,
         (doc_id % 3 = 0) AS rel
  FROM ({_RRF_ORACLE})
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_retrieved,
         CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
         CAST(sum(CASE WHEN rel AND rank <= {_EVAL_K} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_rel_at_k,
         min(CASE WHEN rel THEN rank END) AS first_rel
  FROM r)
SELECT n_retrieved, n_rel, n_rel_at_k,
       round(n_rel_at_k / {_EVAL_K}, 6) AS p_at_k,
       CASE WHEN first_rel IS NOT NULL
            THEN round(1.0 / first_rel, 9)
            ELSE CAST(0.0 AS DOUBLE) END AS mrr
FROM s
"""


@q("search_rank_eval", _RANK_EVAL_ORACLE)
def _search_rank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rank_eval parity: precision@{k} and reciprocal rank of the
    hybrid RRF retrieval against a deterministic judgment set
    (doc_id % 3 == 0) — the retrieval-quality readout that gates
    index/ranker changes. Metrics close over the depth-bounded rank
    list (a k-row frame at any corpus size); the oracle replays the
    full retrieval AND the metric arithmetic."""
    from pyspark.sql import Window, functions as F

    ranked = _hybrid_rrf_search(spark, sf_dir)
    w = Window.orderBy(F.col("rrf_score").desc(), F.col("doc_id"))
    r = ranked.select(
        "doc_id",
        F.row_number().over(w).cast("long").alias("rank"),
        (F.col("doc_id") % 3 == 0).alias("rel"),
    )
    s = r.agg(
        F.count(F.lit(1)).alias("n_retrieved"),
        F.sum(F.when(F.col("rel"), 1).otherwise(0)).alias("n_rel"),
        F.sum(
            F.when(F.col("rel") & (F.col("rank") <= _EVAL_K), 1).otherwise(0)
        ).alias("n_rel_at_k"),
        F.min(F.when(F.col("rel"), F.col("rank"))).alias("first_rel"),
    )
    return s.select(
        "n_retrieved",
        "n_rel",
        "n_rel_at_k",
        F.round(F.col("n_rel_at_k") / F.lit(_EVAL_K), 6).alias("p_at_k"),
        F.when(
            F.col("first_rel").isNotNull(),
            F.round(F.lit(1.0) / F.col("first_rel"), 9),
        )
        .otherwise(F.lit(0.0))
        .alias("mrr"),
    )


_search_rank_eval.__doc__ = _search_rank_eval.__doc__.format(k=_EVAL_K)


# ---------------------------------------------------------------------------
# phrase suggester: whole-phrase spelling correction against the
# corpus vocabulary (ES phrase suggester: per-token candidate
# generation by edit distance, ranked by frequency).
# ---------------------------------------------------------------------------

_PHRASE_PROBE = ["sloww", "merge", "qurey", "zzzqx"]
_PHRASE_VALUES = ", ".join(
    f"({i}, '{w}')" for i, w in enumerate(_PHRASE_PROBE)
)
_PHRASE_MAX_DIST = 2

_PHRASE_SUGGEST_ORACLE = f"""
WITH probe(pos, input_term) AS (VALUES {_PHRASE_VALUES}),
n AS (SELECT doc_id, {_norm_sql('text')} AS norm FROM documents),
tok AS (SELECT DISTINCT doc_id, unnest(string_split(norm, ' ')) AS term
        FROM n),
vocab AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tok
          WHERE term <> '' GROUP BY term),
cand AS (
  SELECT p.pos, p.input_term, v.term, v.df,
         levenshtein(v.term, p.input_term) AS dist
  FROM probe p JOIN vocab v
    ON levenshtein(v.term, p.input_term) <= {_PHRASE_MAX_DIST}
),
best AS (
  SELECT pos, term, df, dist,
         row_number() OVER (
           PARTITION BY pos
           ORDER BY dist ASC, df DESC, term ASC) AS rn
  FROM cand
)
SELECT CAST(p.pos AS BIGINT) AS pos, p.input_term,
       coalesce(b.term, p.input_term) AS suggestion,
       CAST(b.dist AS BIGINT) AS dist,
       coalesce(b.df, 0) AS df
FROM probe p LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
  ON p.pos = b.pos
ORDER BY pos
"""


@q("phrase_suggest_correction", _PHRASE_SUGGEST_ORACLE)
def _phrase_suggest_correction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ES phrase-suggester analogue: each probe token is corrected to
    the vocabulary term with the smallest edit distance (<= 2), ties
    broken by document frequency then term; tokens already in the
    vocabulary self-correct at distance 0 and OOV tokens with no
    candidate pass through with a NULL distance.

    Scale shape: the data-sized work is the distinct (doc, term)
    vocabulary aggregation (one term-keyed exchange, vocabulary-sized
    output); the probe is a literal handful of rows BROADCAST against
    the vocabulary, so candidate generation is a narrow map over
    distinct terms — never over documents — and the final window runs
    on the candidate handful."""
    from pyspark.sql import Window, functions as F

    from ..operators.dedup import normalized_text

    docs = _tp(spark, sf_dir, "documents")
    probe = spark.createDataFrame(
        list(enumerate(_PHRASE_PROBE)), "pos long, input_term string"
    )
    tok = (
        docs.select(
            "doc_id",
            F.explode(
                F.split(normalized_text(F.col("text")), " ")
            ).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    vocab = tok.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql.functions import broadcast

    cand = vocab.join(broadcast(probe)).where(
        F.levenshtein(F.col("term"), F.col("input_term"))
        <= _PHRASE_MAX_DIST
    )
    cand = cand.withColumn(
        "dist", F.levenshtein(F.col("term"), F.col("input_term"))
    )
    w = Window.partitionBy("pos").orderBy(
        F.col("dist").asc(), F.col("df").desc(), F.col("term").asc()
    )
    best = (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "pos",
            F.col("term").alias("suggestion0"),
            F.col("dist").cast("long").alias("dist"),
            F.col("df").alias("df0"),
        )
    )
    return (
        probe.join(best, "pos", "left")
        .select(
            "pos",
            "input_term",
            F.coalesce(F.col("suggestion0"), F.col("input_term")).alias(
                "suggestion"
            ),
            "dist",
            F.coalesce(F.col("df0"), F.lit(0).cast("long")).alias("df"),
        )
        .orderBy("pos")
    )
