"""Distributed-ML primitives: a full-batch logistic-regression
gradient step over the embeddings table (the map-side-combinable
vector aggregation every distributed GD/L-BFGS round reduces to), and
learning-to-rank rescoring with a literal GBDT ensemble (the ES LTR
plugin's rescore-window contract).

Why these belong in a 100 TB data engine: model-in-the-loop curation
(quality classifiers, relevance models) needs (a) cheap distributed
training steps over the full corpus and (b) cheap inference/ranking
with a frozen model — both as plain aggregations/projections, not as
a separate ML runtime.

Float discipline: the sigmoid residual is ONE IEEE expression per row
(sequential-fold dot product, same operand order as DuckDB's
list_dot_product — the cosine house rule); per-row contributions are
quantized to 1e-9 fixed point so the cross-partition SUM is an exact
BIGINT (order-free). Tree scores are integers end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .declared import _t, q
from .northstar import _tp

# ---------------------------------------------------------------------------
# Full-batch logistic-regression gradient (one GD round).
# ---------------------------------------------------------------------------

_DIM = 64
# deterministic literal init weights, small enough that |z| stays tiny
_W = [((j * 37) % 21 - 10) / 100.0 for j in range(_DIM)]
_GRAD_SCALE = 10**9

_W_SQL = "[" + ", ".join(f"{w!r}" for w in _W) + "]"

_LOGREG_ORACLE = f"""
WITH s AS (
  SELECT vec_id, embedding::DOUBLE[] AS x,
         CASE WHEN label = 0 THEN 1.0 ELSE 0.0 END AS y
  FROM embeddings
),
r AS (
  SELECT vec_id, x,
         1.0 / (1.0 + exp(-list_dot_product(x, {_W_SQL}))) - y AS resid
  FROM s
),
contrib AS (
  SELECT u.j - 1 AS feature,
         CAST(round(resid * u.v * {_GRAD_SCALE}) AS BIGINT) AS g
  FROM (
    SELECT resid,
           unnest(list_transform(x, (v, i) -> {{'j': i, 'v': v}})) AS u
    FROM r
  )
  UNION ALL
  SELECT -1 AS feature,
         CAST(round(resid * {_GRAD_SCALE}) AS BIGINT) AS g
  FROM r
)
SELECT feature, CAST(sum(g) AS BIGINT) AS grad_fp,
       CAST(count(*) AS BIGINT) AS n_rows
FROM contrib GROUP BY feature
"""


@q("logreg_gradient_embeddings", _LOGREG_ORACLE)
def _logreg_gradient_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full-batch logistic-regression gradient over the corpus:
    predict ``label == 0`` from the 64-dim embedding with literal init
    weights; emit the per-feature gradient (feature -1 = bias) as an
    exact fixed-point BIGINT plus the contributing row count.

    This is the primitive every distributed trainer (GD, L-BFGS,
    mini-batch SGD with large batches) reduces to: per-row residuals
    are narrow codegen expressions, per-feature contributions combine
    MAP-SIDE, and the only shuffle carries (feature, partial-sum)
    pairs — d x partitions rows, independent of corpus size. The 1e-9
    quantization makes the sum order-free (exact BIGINT), so the
    gradient is bit-identical on any cluster layout — which is what
    lets a curation pipeline checkpoint/resume training mid-corpus.

    The driver loop (step, re-broadcast weights, repeat) composes
    exactly like kmeans_train (operators/similarity.py:687)."""
    emb = _tp(spark, sf_dir, "embeddings")
    x = F.col("embedding").cast("array<double>")
    w = F.array(*[F.lit(v) for v in _W])
    z = F.aggregate(
        F.zip_with(x, w, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    y = F.when(F.col("label") == 0, F.lit(1.0)).otherwise(F.lit(0.0))
    # stage resid as a projection ATTRIBUTE before the explode:
    # Catalyst re-inlines non-attribute subexpressions per reference,
    # which would re-evaluate the 64-term fold 64 times per row
    r = emb.select(
        x.alias("x"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - y).alias("resid"),
    )
    contrib = r.select(
        F.posexplode("x").alias("feature", "v"),
        F.col("resid"),
    ).select(
        "feature",
        F.round(F.col("resid") * F.col("v") * _GRAD_SCALE)
        .cast("long")
        .alias("g"),
    )
    bias = r.select(
        F.lit(-1).alias("feature"),
        F.round(F.col("resid") * _GRAD_SCALE).cast("long").alias("g"),
    )
    return (
        contrib.unionByName(bias)
        .groupBy("feature")
        .agg(
            F.sum("g").cast("long").alias("grad_fp"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .select(  # posexplode pos is int32; oracle emits BIGINT
            F.col("feature").cast("long").alias("feature"),
            "grad_fp",
            "n_rows",
        )
    )


# ---------------------------------------------------------------------------
# Learning-to-rank rescore: literal GBDT ensemble over cheap per-doc
# features.
# ---------------------------------------------------------------------------

_LTR_K = 10

_LTR_FEATURES_SQL = """
  SELECT doc_id,
         len(list_filter(tk, t -> t = 'scan')) AS tf_scan,
         len(list_filter(tk, t -> t = 'merge')) AS tf_merge,
         len(tk) AS dl
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(text, '\\s+'), t -> t <> '')
             AS tk
    FROM documents
  )
"""

# two literal depth-2 trees, integer leaves (model scores x100)
_TREE_SQL = """
  (CASE WHEN tf_scan >= 2
        THEN CASE WHEN tf_merge >= 1 THEN 500 ELSE 300 END
        ELSE CASE WHEN dl >= 60 THEN 100 ELSE 50 END END
   + CASE WHEN tf_merge >= 2 THEN 400
          ELSE CASE WHEN tf_scan >= 1 THEN 200 ELSE 0 END END)
"""

_LTR_ORACLE = f"""
WITH feats AS ({_LTR_FEATURES_SQL})
SELECT doc_id,
       CAST(tf_scan AS BIGINT) AS tf_scan,
       CAST(tf_merge AS BIGINT) AS tf_merge,
       CAST(dl AS BIGINT) AS dl,
       CAST({_TREE_SQL} AS BIGINT) AS ltr_score
FROM feats
WHERE tf_scan + tf_merge >= 1
ORDER BY ltr_score DESC, doc_id ASC
LIMIT {_LTR_K}
"""


@q("ltr_rescore_topk", _LTR_ORACLE)
def _ltr_rescore_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learning-to-rank rescore (the ES LTR plugin contract): docs
    matching the query context (>= 1 hit on the query terms) are
    scored by a frozen 2-tree GBDT over cheap per-doc features
    (term frequencies + doc length) and the top-10 returned.

    Scale shape: features and both trees are pure projection
    attributes (nested CASE inside whole-stage codegen — tree
    inference needs no ML runtime), the context filter prunes at the
    scan, and the ranking is a TakeOrdered(10). Integer leaf values
    (model scores x100) keep the ensemble sum exact; a real exported
    XGBoost/LightGBM model lowers to the same CASE-cascade form."""
    docs = _t(spark, sf_dir, "documents")
    tk = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    feats = docs.select(
        "doc_id",
        F.size(F.filter(tk, lambda t: t == "scan"))
        .cast("long")
        .alias("tf_scan"),
        F.size(F.filter(tk, lambda t: t == "merge"))
        .cast("long")
        .alias("tf_merge"),
        F.size(tk).cast("long").alias("dl"),
    )
    tree1 = F.when(
        F.col("tf_scan") >= 2,
        F.when(F.col("tf_merge") >= 1, 500).otherwise(300),
    ).otherwise(F.when(F.col("dl") >= 60, 100).otherwise(50))
    tree2 = F.when(F.col("tf_merge") >= 2, 400).otherwise(
        F.when(F.col("tf_scan") >= 1, 200).otherwise(0)
    )
    return (
        feats.filter(F.col("tf_scan") + F.col("tf_merge") >= 1)
        .select(
            "doc_id",
            "tf_scan",
            "tf_merge",
            "dl",
            (tree1 + tree2).cast("long").alias("ltr_score"),
        )
        .orderBy(F.desc("ltr_score"), F.asc("doc_id"))
        .limit(_LTR_K)
    )


# ---------------------------------------------------------------------------
# One PCA power-iteration step: u = sum_rows (x . v0) * x, exact fixed
# point — the distributed linear-algebra primitive under PCA/whitening.
# ---------------------------------------------------------------------------

_V0 = [((j * 17) % 13 - 6) / 10.0 for j in range(_DIM)]
_V0_SQL = "[" + ", ".join(f"{v!r}" for v in _V0) + "]"

_PCA_ORACLE = f"""
WITH s AS (
  SELECT embedding::DOUBLE[] AS x,
         list_dot_product(embedding::DOUBLE[], {_V0_SQL}) AS proj
  FROM embeddings
),
contrib AS (
  SELECT u.j - 1 AS feature,
         CAST(round(proj * u.v * {_GRAD_SCALE}) AS BIGINT) AS g
  FROM (
    SELECT proj,
           unnest(list_transform(x, (v, i) -> {{'j': i, 'v': v}})) AS u
    FROM s
  )
)
SELECT feature, CAST(sum(g) AS BIGINT) AS u_fp,
       CAST(count(*) AS BIGINT) AS n_rows
FROM contrib GROUP BY feature
"""


@q("pca_power_iteration", _PCA_ORACLE)
def _pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One power-iteration step toward the top principal component of
    the embedding matrix: ``u = X^T (X v0) = sum_rows (x.v0) x`` with a
    literal deterministic start vector, per-row contributions quantized
    to 1e-9 fixed point so the cross-partition vector sum is an exact
    BIGINT per feature.

    The same map-side-combinable vector-aggregation shape as
    logreg_gradient_embeddings (the only shuffle carries (feature,
    partial-sum) pairs — d x partitions rows); the driver loop
    (normalize u, re-broadcast, repeat; Rayleigh quotient for the
    eigenvalue) composes like kmeans_train. PCA whitening /
    top-component removal is the standard post-processing that
    improves embedding retrieval (and the basis of spectral outlier
    detection in curation)."""
    emb = _tp(spark, sf_dir, "embeddings")
    x = F.col("embedding").cast("array<double>")
    v0 = F.array(*[F.lit(v) for v in _V0])
    proj = F.aggregate(
        F.zip_with(x, v0, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # stage proj as an attribute before the explode (Catalyst would
    # otherwise re-inline the 64-term fold once per exploded element)
    s = emb.select(x.alias("x"), proj.alias("proj"))
    return (
        s.select(F.posexplode("x").alias("feature", "v"), "proj")
        .select(
            "feature",
            F.round(F.col("proj") * F.col("v") * _GRAD_SCALE)
            .cast("long")
            .alias("g"),
        )
        .groupBy("feature")
        .agg(
            F.sum("g").cast("long").alias("u_fp"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .select(  # posexplode pos is int32; oracle emits BIGINT
            F.col("feature").cast("long").alias("feature"),
            "u_fp",
            "n_rows",
        )
    )
