"""Quantized ANN queries: int8 scalar quantization (exact DuckDB
oracle — the quantize/dequantize arithmetic is replayed in SQL) and
product quantization (rows-only: k-means training is iterative, not
SQL-expressible; its quality is pinned by recall tests instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import similarity as S
from .declared import q
from .northstar import _tp

_DIM = 64
_N_QUERIES = 8
_TOPK = 5

_SHORTLIST = 20

# Shared coarse-scoring CTE chain (scalar-quantize -> dequantize ->
# asymmetric cosine -> per-query rank). `ranked` is consumed at rank<=k
# by the sq8 query and at rank<=shortlist by the refine query.
_SQ8_COARSE = f"""dims AS (
  SELECT r.i AS pos,
         min(embedding[r.i]::DOUBLE) AS mn,
         max(embedding[r.i]::DOUBLE) AS mx
  FROM embeddings CROSS JOIN range(1, {_DIM + 1}) r(i)
  GROUP BY r.i),
st AS (SELECT list(mn ORDER BY pos) AS mins,
              list((mx - mn) / 255.0 ORDER BY pos) AS scales
       FROM dims),
enc AS (
  SELECT vec_id,
         list_transform(range(1, {_DIM + 1}), i ->
           CASE WHEN scales[i] = 0 THEN 0
                ELSE CAST(least(255, greatest(0,
                       floor((embedding[i]::DOUBLE - mins[i]) / scales[i] + 0.5)))
                     AS BIGINT) END) AS codes
  FROM embeddings CROSS JOIN st),
dq AS (
  SELECT vec_id,
         list_transform(range(1, {_DIM + 1}),
                        i -> mins[i] + codes[i] * scales[i]) AS cv
  FROM enc CROSS JOIN st),
qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS v
       FROM embeddings WHERE vec_id < {_N_QUERIES}),
sims AS (SELECT query_id, vec_id,
                round(list_cosine_similarity(v, cv), 4) AS sim
         FROM qv JOIN dq ON query_id <> vec_id),
ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, vec_id ASC) AS rank
           FROM sims)"""

_SQ8_ORACLE = f"""
WITH {_SQ8_COARSE}
SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= {_TOPK}
"""

_REFINE_ORACLE = f"""
WITH {_SQ8_COARSE},
shortlist AS (SELECT query_id, vec_id FROM ranked WHERE rank <= {_SHORTLIST}),
fv AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
exact AS (SELECT s.query_id, s.vec_id,
                 round(list_cosine_similarity(q.v, f.cv), 4) AS sim
          FROM shortlist s
          JOIN qv q USING (query_id)
          JOIN fv f USING (vec_id)),
rr AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                    ORDER BY sim DESC, vec_id ASC) AS rank
       FROM exact)
SELECT query_id, vec_id, sim, rank FROM rr WHERE rank <= {_TOPK}
"""


@q("embedding_sq8_topk", _SQ8_ORACLE)
def _embedding_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _tp(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return S.sq8_topk(emb, queries, k=_TOPK, dim=_DIM)


@q("embedding_refine_topk", _REFINE_ORACLE)
def _embedding_refine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval (similarity.refine_topk): int8 coarse scan
    selects a {_SHORTLIST}-deep shortlist, full-precision vectors are
    touched only for shortlist ids, exact cosine re-ranks to top-k.
    The oracle replays the quantized arithmetic, the shortlist cutoff,
    AND the exact re-rank — so shortlist membership and final scores
    are both hash-checked."""
    emb = _tp(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return S.refine_topk(emb, queries, k=_TOPK, shortlist=_SHORTLIST, dim=_DIM)


@q("embedding_pq_topk", None)
def _embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC top-k (rows-only): deterministic sampled-k-means
    codebooks, 8 code bytes per 64-dim vector, asymmetric distance
    tables per query. Recall vs the exact path is pinned in
    tests/test_quantized.py."""
    emb = _tp(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    books = S.pq_train_codebooks(emb, m=8, n_centroids=16, sample_rows=256)
    return S.pq_adc_topk(emb, queries, books, k=_TOPK).orderBy(
        "query_id", "rank"
    )


@q("embedding_kmeans_ivf_topk", None)
def _embedding_kmeans_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search over TRAINED centroids (similarity.kmeans_train: 3
    distributed spherical-Lloyd's iterations, deterministic smallest-id
    init, cosine assignment identical to query-time probing) instead of
    the fixed snapshot embedding_ivf_topk uses. Rows-only: iterative
    argmax training is not one SQL statement; the training loop is
    pinned against a numpy Lloyd's reference in tests/test_kmeans.py."""
    from ..operators.similarity import kmeans_train

    emb = _tp(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    cen = kmeans_train(emb, k=8, iters=3)
    return S.ivf_topk(
        emb, queries, cen.select(F.col("cell_id").alias("vec_id"),
                                 F.col("centroid").alias("embedding")),
        k=_TOPK, nprobe=2,
    ).orderBy("query_id", "rank")


def _ivf_oracle() -> str:
    # the persisted index must return EXACTLY what the inline IVF
    # computes over the same centroid snapshot — same oracle string
    from .declared import QUERY_REGISTRY

    return QUERY_REGISTRY["embedding_ivf_topk"][1]


@q("ann_index_topk", _ivf_oracle())
def _ann_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted ANN index (sinks/annindex.py): corpus written
    partitionBy(cell_id), centroids persisted beside it, then top-k
    served by scanning ONLY the probed cells' partition directories
    (file-index pruning, visible as PartitionFilters — pinned in
    tests/test_annindex.py). Value-hash oracle: results must equal the
    inline IVF over the same centroid snapshot — the disk layout may
    change the plan, never the answer."""
    import tempfile
    from pathlib import Path

    from ..sinks.annindex import build_ann_index, query_ann_index

    emb = _tp(spark, sf_dir, "embeddings")
    cen = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 108)).select(
        "vec_id", "embedding"
    )
    sf = Path(sf_dir).name or "sf"
    root = Path(tempfile.gettempdir()) / "spark_graft_ann_index" / sf
    build_ann_index(spark, emb, cen, root)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return query_ann_index(spark, root, queries, k=_TOPK, nprobe=2)


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss +-1 random projection (similarity.random_projection):
# 64 -> 16 dims with a deterministic md5-parity sign matrix, then exact
# cosine top-k in the PROJECTED space. The oracle replays the identical
# projection (same literal sign matrix, same ascending-j fold order) —
# the 4x-cheaper scan must produce bit-identical rankings.
# ---------------------------------------------------------------------------

_RP_DIM, _RP_IN = 16, 64
_RP_SIGNS = S.rp_signs(_RP_DIM, _RP_IN)


def _rp_proj_sql(vec: str) -> str:
    rows = []
    for row in _RP_SIGNS:
        terms = " + ".join(
            f"{vec}[{j + 1}] * ({int(s)})" for j, s in enumerate(row)
        )
        rows.append(f"({terms})")
    return "[" + ", ".join(rows) + "]"


_RP_ORACLE = f"""
WITH p AS (SELECT vec_id, {_rp_proj_sql('(embedding::DOUBLE[])')} AS pv
           FROM embeddings),
q AS (SELECT vec_id AS query_id, pv AS qv FROM p WHERE vec_id < {_N_QUERIES}),
sims AS (
  SELECT query_id, p.vec_id,
         round(list_cosine_similarity(qv, pv), 4) AS sim
  FROM q JOIN p ON query_id <> p.vec_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, vec_id ASC) AS rank
  FROM sims)
SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= {_TOPK}
"""


@q("embedding_rp_topk", _RP_ORACLE)
def _embedding_rp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL-projected cosine top-k: the corpus scan reads 16-dim
    projections instead of 64-dim vectors (4x memory bandwidth), with
    distances preserved to ~1/sqrt(16) — the cheap first stage for
    100 TB embedding search (compose with refine_topk for exact
    re-ranking). Projection is a narrow literal-matrix fold; no
    shuffle is added over plain cosine_topk."""
    emb = _tp(spark, sf_dir, "embeddings")
    proj = S.random_projection(emb, _RP_SIGNS)
    queries = proj.filter(F.col("vec_id") < _N_QUERIES)
    return S.cosine_topk(proj, queries, k=_TOPK, vec_col="proj")
