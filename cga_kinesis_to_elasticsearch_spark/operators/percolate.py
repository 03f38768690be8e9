"""Percolator — reverse search: match documents against STORED queries.

Elasticsearch's percolator flips search around: queries are indexed,
and each incoming document is asked "which stored queries match me?"
(alerting, saved searches, routing rules). The reference ships every
record to ES where percolation is a built-in; this operator gives the
engine the same capability over a corpus.

Supported query shape (the percolator core): ``must`` terms (ALL must
appear in the document) and ``must_not`` terms (NONE may appear) —
term-set semantics over the tokenized document.

Scale design — the naive plan is ``docs CROSS JOIN queries`` with a
per-pair containment check: fine for 10 queries, quadratic death at
ES-scale (thousands of stored alerts x billions of docs). Instead the
match decomposes into EQUI-joins on the term, exactly how ES's query
index works:

1. docs explode ONCE into a distinct ``(doc_id, token)`` term set —
   set semantics, map-side dedup, no full-text shuffle;
2. queries explode into a single tagged term table: ``(query_id,
   token, n_must)`` rows for must terms and ``(query_id, token,
   NULL)`` rows for banned terms. ONE broadcast join against the doc
   term set finds every (doc, query, term) contact — the doc term set
   is scanned exactly once;
3. one aggregation per (doc, query) closes both clauses together:
   ``count(must hits) == n_must`` (conjunction as counting) and
   ``count(banned hits) == 0`` — no anti join, no second scan.

Everything after tokenization moves only (doc_id, query_id) pairs
with two small counters; the candidate set is bounded by the posting
lists of the query terms, not |docs| x |queries|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["percolate"]


def percolate(
    doc_terms: DataFrame,
    queries: DataFrame,
) -> DataFrame:
    """Match docs against stored term queries.

    ``doc_terms``: ``(doc_id, token)`` — the document term SET (caller
    dedups; ``sinks/textindex.py`` postings or a distinct explode both
    qualify). ``queries``: ``(query_id, must array<string>, must_not
    array<string>)``; ``must`` must be non-empty, ``must_not`` may be
    empty. Returns ``(doc_id, query_id)`` for every match.
    """
    must_terms = queries.select(
        "query_id",
        F.size("must").alias("__n_must"),
        F.explode("must").alias("token"),
    )
    ban_terms = queries.select(
        "query_id",
        F.lit(None).cast("int").alias("__n_must"),
        F.explode("must_not").alias("token"),
    )
    contacts = doc_terms.join(
        F.broadcast(must_terms.unionByName(ban_terms)), "token"
    )
    return (
        contacts.groupBy("doc_id", "query_id")
        .agg(
            F.count("__n_must").alias("__m_hits"),
            F.max("__n_must").alias("__n_must"),
            F.count_if(F.col("__n_must").isNull()).alias("__b_hits"),
        )
        # __n_must is NULL for pairs reached only through banned terms
        # -> the equality is NULL -> filtered, as required
        .where(
            (F.col("__m_hits") == F.col("__n_must"))
            & (F.col("__b_hits") == 0)
        )
        .select("doc_id", "query_id")
    )
