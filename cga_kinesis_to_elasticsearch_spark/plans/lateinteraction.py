"""Late-interaction retrieval (ColBERT-style MaxSim) and
matryoshka-truncation evaluation over the embeddings table.

Both are standard components of an embedding-serving stack the
reference's users would bolt onto the indexed corpus: MaxSim scores
token-level similarity that pooled dot products average away;
matryoshka (MRL) truncation grades how much recall a prefix-dim
coarse scan gives up — the evidence for choosing a cheap first-stage
dimension in two-stage retrieval (similarity.refine_topk).

Determinism: per-token dots are ascending-position folds (the same
contract as ``cosine_similarity``), maxima are order-free, token sums
add in ascending token order, one 4dp round at the close — both
engines evaluate the identical expression tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import similarity as S
from .declared import q
from .northstar import _tp

_N_QUERIES = 5
_N_TOKENS = 8
_TOKEN_DIM = 8
_K = 10
_MRL_DIM = 16


def _slice(col: str, lo: int, hi: int) -> str:
    return f"{col}[{lo}:{hi}]"


def _maxsim_expr() -> str:
    """sum_t greatest_s list_dot_product(qv[t], cv[s]) — the SQL mirror
    of operators/similarity.maxsim_topk's expression tree."""
    terms = []
    for t in range(_N_TOKENS):
        qlo, qhi = t * _TOKEN_DIM + 1, (t + 1) * _TOKEN_DIM
        dots = ", ".join(
            "list_dot_product("
            f"{_slice('qv', qlo, qhi)}, "
            f"{_slice('cv', s * _TOKEN_DIM + 1, (s + 1) * _TOKEN_DIM)})"
            for s in range(_N_TOKENS)
        )
        terms.append(f"greatest({dots})")
    return " + ".join(terms)


_MAXSIM_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {_N_QUERIES}),
c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
sims AS (
  SELECT query_id, vec_id, round({_maxsim_expr()}, 4) AS score
  FROM q JOIN c ON query_id <> vec_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, vec_id ASC) AS rank
  FROM sims)
SELECT query_id, vec_id, score, rank FROM ranked WHERE rank <= {_K}
"""


@q("maxsim_late_interaction", _MAXSIM_ORACLE)
def _maxsim_late_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction top-k
    (operators/similarity.maxsim_topk): each 64-dim embedding is read
    as 8 per-token 8-dim vectors; score = sum over query tokens of the
    best-matching document-token dot product (MaxSim).

    Scale shape: queries broadcast; the corpus streams through ONE
    narrow codegen-fused scoring projection (64 slice-dots, no Python,
    vectors never shuffle); only (query_id, vec_id, score) triples
    reach the rank window's exchange."""
    emb = _tp(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return S.maxsim_topk(
        emb, queries, n_tokens=_N_TOKENS, dim=_TOKEN_DIM, k=_K
    )


_MRL_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {_N_QUERIES}),
c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
exact AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY round(list_cosine_similarity(qv, cv), 4) DESC,
                      vec_id ASC) AS rank
    FROM q JOIN c ON query_id <> vec_id)
  WHERE rank <= {_K}),
trunc AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY round(list_cosine_similarity(
                        {_slice('qv', 1, _MRL_DIM)},
                        {_slice('cv', 1, _MRL_DIM)}), 4) DESC,
                      vec_id ASC) AS rank
    FROM q JOIN c ON query_id <> vec_id)
  WHERE rank <= {_K})
SELECT e.query_id,
       CAST(count(t.vec_id) AS BIGINT) AS n_hits,
       round(count(t.vec_id) / {_K}.0, 4) AS recall
FROM exact e
LEFT JOIN trunc t ON t.query_id = e.query_id AND t.vec_id = e.vec_id
GROUP BY e.query_id
"""


@q("matryoshka_recall", _MRL_ORACLE)
def _matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (MRL) truncation evaluation: recall@k of cosine
    retrieval over the FIRST {_MRL_DIM} dimensions against the exact
    64-dim top-k, per query. This is the accept/reject evidence for
    using a prefix-truncated coarse scan (4x fewer bytes touched) as
    stage one of two-stage retrieval.

    Scale shape: two broadcast-query corpus streams (the truncated arm
    reads a 4x narrower projection) and a k-row-per-query hit join —
    evaluation costs no more than the retrievals it grades."""
    emb = _tp(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    exact = S.cosine_topk(emb, queries, k=_K).select("query_id", "vec_id")
    sliced = emb.select(
        "vec_id", F.slice(F.col("embedding"), 1, _MRL_DIM).alias("embedding")
    )
    trunc = S.cosine_topk(
        sliced, sliced.filter(F.col("vec_id") < _N_QUERIES), k=_K
    ).select("query_id", F.col("vec_id").alias("__tv"))
    hits = (
        exact.join(
            trunc,
            (exact["query_id"] == trunc["query_id"])
            & (exact["vec_id"] == trunc["__tv"]),
            "left",
        )
        .groupBy(exact["query_id"].alias("query_id"))
        .agg(F.count("__tv").cast("long").alias("n_hits"))
    )
    return hits.select(
        "query_id",
        "n_hits",
        F.round(F.col("n_hits") / float(_K), 4).alias("recall"),
    )
