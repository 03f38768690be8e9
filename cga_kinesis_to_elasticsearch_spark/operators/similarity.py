"""Similarity search over embedding columns (north star).

Two paths, as a real ANN system would tier them:

- ``cosine_topk``: brute-force exact top-k — the baseline and the
  verifier for the approximate path. Scale shape: queries are SMALL
  (broadcast), corpus is LARGE (streamed); cost is one pass over the
  corpus per query batch with a windowed top-k (partial top-k per
  partition under AQE, no full sort of the corpus).
- ``lsh_buckets`` / ``lsh_topk``: random-hyperplane-style LSH where the
  "hyperplanes" are coordinate-difference signs (deterministic, no RNG,
  reproducible in SQL) — candidates only within matching buckets; the
  per-bucket join replaces the full cross product.

All arithmetic is forced to DOUBLE before any fold so Spark and the
DuckDB oracle agree bit-for-bit at round(4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.functions import broadcast

__all__ = [
    "cosine_similarity",
    "cosine_topk",
    "lsh_buckets",
    "lsh_topk",
    "ivf_cells",
    "ivf_topk",
    "near_dup_pairs",
    "LSH_PAIRS",
]

# Fixed coordinate pairs for the sign-bit sketch (deterministic; chosen
# spread across the 64-dim embedding space).
LSH_PAIRS: tuple[tuple[int, int], ...] = (
    (0, 32),
    (8, 40),
    (16, 48),
    (24, 56),
    (4, 36),
    (12, 44),
    (20, 52),
    (28, 60),
)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine_similarity(a: Column, b: Column, ndigits: int | None = 4) -> Column:
    """Cosine similarity of two array<double> columns (sequential fold,
    same order as DuckDB's list_cosine_similarity)."""
    sim = _dot(a, b) / (_norm(a) * _norm(b))
    return F.round(sim, ndigits) if ndigits is not None else sim


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: (query_id, vec_id, sim, rank).

    Queries broadcast against the corpus; self-matches excluded; ties
    broken by vec_id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("__qv")
    )
    c = corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__cv"))
    sim = cosine_similarity(F.col("__qv"), F.col("__cv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        c.join(broadcast(q), F.col("query_id") != F.col(id_col))
        .select("query_id", id_col, sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pairs: tuple[tuple[int, int], ...] = LSH_PAIRS,
) -> DataFrame:
    """Sign-bit bucket per vector: bit i = (v[pi] > v[pj]). 8 bits ->
    256 buckets; deterministic, RNG-free, SQL-reproducible."""
    v = _as_double(F.col(vec_col))
    bits = [
        F.when(
            F.element_at(v, i + 1) > F.element_at(v, j + 1), F.lit("1")
        ).otherwise(F.lit("0"))
        for i, j in pairs
    ]
    return df.select(F.col(id_col), F.concat(*bits).alias("bucket"))


def ivf_cells(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """IVF cell assignment: (id, cell_id, cell_rank<=nprobe) by cosine
    to the (broadcast) centroid set; ties broken by centroid id.

    The scale path of an IVF index: centroids are tiny (broadcast), the
    corpus streams through one narrow pass; the downstream candidate
    join is per-cell, so search cost divides by #cells. Centroid
    *training* (k-means) is out of scope here — any fixed snapshot
    works, and the assignment/probe machinery is identical.
    """
    cen = centroids.select(
        F.col(id_col).alias("cell_id"), _as_double(F.col(vec_col)).alias("__cen")
    )
    v = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v"))
    sim = cosine_similarity(F.col("__v"), F.col("__cen"))
    w = Window.partitionBy(id_col).orderBy(F.desc("__csim"), F.asc("cell_id"))
    return (
        v.crossJoin(broadcast(cen))
        .select(id_col, "cell_id", sim.alias("__csim"))
        .withColumn("cell_rank", F.row_number().over(w))
        .filter(F.col("cell_rank") <= nprobe)
        .select(id_col, "cell_id", "cell_rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 2,
) -> DataFrame:
    """Approximate top-k via inverted-file probing: corpus vectors live
    in their nearest cell; each query probes its ``nprobe`` nearest
    cells and ranks only those candidates. (query_id, vec_id, sim, rank)."""
    c_cells = ivf_cells(corpus, centroids, id_col, vec_col, nprobe=1).select(
        id_col, "cell_id"
    )
    q_cells = ivf_cells(queries, centroids, id_col, vec_col, nprobe=nprobe).select(
        F.col(id_col).alias("query_id"), "cell_id"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("__qv")
    )
    c = corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__cv")).join(
        c_cells, id_col
    )
    # each corpus vector lives in exactly one cell (nprobe=1 above) and
    # the query's probed cells are distinct, so (query_id, vec_id)
    # pairs are already unique — no dedup shuffle needed
    cand = (
        c.join(broadcast(q_cells), "cell_id")
        .filter(F.col("query_id") != F.col(id_col))
        .select("query_id", id_col, "__cv")
    )
    sim = cosine_similarity(F.col("__qv"), F.col("__cv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        cand.join(broadcast(q), "query_id")
        .select("query_id", id_col, sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pairs: tuple[tuple[int, int], ...] = LSH_PAIRS,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's bucket.

    The bucket equi-join is the scale lever: per-bucket candidate sets
    replace the all-pairs product (recall traded for a ~#buckets-fold
    cost cut; verify with cosine_topk on a sample).
    """
    cb = lsh_buckets(corpus, id_col, vec_col, pairs)
    qb = lsh_buckets(queries, id_col, vec_col, pairs).select(
        F.col(id_col).alias("query_id"), "bucket"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("__qv")
    )
    c = corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__cv")).join(
        cb, id_col
    )
    cand = c.join(broadcast(qb), "bucket").filter(F.col("query_id") != F.col(id_col))
    sim = cosine_similarity(F.col("__qv"), F.col("__cv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        cand.join(broadcast(q), "query_id")
        .select("query_id", id_col, sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pairs: tuple[tuple[int, int], ...] = LSH_PAIRS,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, sim) for
    same-LSH-bucket pairs with cosine >= threshold, id_a < id_b.

    The dedup counterpart of ``lsh_topk``: the all-pairs O(N^2) cosine
    is cut to per-bucket self-joins (the only shuffle is on the bucket
    key, and what shuffles is (id, vector), never pairs). True near-dups
    agree on most sign bits, so recall is high exactly where it matters
    — at similarity near 1 a pair disagrees on few coordinate-order
    comparisons. Multi-band variants (re-run with a second ``pairs``
    set, union) buy more recall at 2x cost; thresholds in production
    dedup sit at 0.9+ where single-band recall is already near-perfect.
    """
    b = lsh_buckets(df, id_col, vec_col, pairs)
    v = df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__v")).join(
        b, id_col
    )
    left = v.select(
        F.col(id_col).alias("id_a"), F.col("__v").alias("__va"), "bucket"
    )
    right = v.select(
        F.col(id_col).alias("id_b"), F.col("__v").alias("__vb"), "bucket"
    )
    sim = cosine_similarity(F.col("__va"), F.col("__vb"))
    return (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )
