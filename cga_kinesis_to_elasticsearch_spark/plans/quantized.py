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


_PQ_M = 8
_PQ_NC = 16
_PQ_SAMPLE = 256
_PQ_ITERS = 10
_PQ_SUB = _DIM // _PQ_M


def _pq_oracle() -> str:
    """PQ training + encode + ADC search, fully replayed in SQL.

    The 10 per-subspace Lloyd's iterations are unrolled as CTE triples
    over a (subspace j, sample row) table — one triple per iteration
    handles ALL 8 subspaces at once. Exactness comes from the same
    levers as the k-means IVF oracle: centroids round to 9 decimals
    per iteration (summation-order independence), squared distances
    are explicit 8-term sequential sums (bit-identical to numpy's
    small-axis reduction), argmin ties break on the lower centroid
    index, and the final ADC score rounds to 4 before ranking —
    matching pq_train_codebooks / pq_encode / pq_adc_topk exactly."""
    d2 = " + ".join(
        f"(s.sv[{i}] - c.cent[{i}]) * (s.sv[{i}] - c.cent[{i}])"
        for i in range(1, _PQ_SUB + 1)
    )
    dot = " + ".join(
        f"q.sv[{i}] * c.cent[{i}]" for i in range(1, _PQ_SUB + 1)
    )
    ctes = [
        f"""v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
samp AS (
  SELECT row_number() OVER (ORDER BY vec_id) AS rn, v
  FROM v ORDER BY vec_id LIMIT {_PQ_SAMPLE}),
jidx AS (SELECT unnest(range(0, {_PQ_M})) AS j),
sub AS (
  SELECT s.rn, j.j,
         list_transform(range(1, {_PQ_SUB + 1}), i -> s.v[j.j * {_PQ_SUB} + i]) AS sv
  FROM samp s CROSS JOIN jidx j),
cents0 AS (
  SELECT j, CAST(rn - 1 AS INT) AS c, sv AS cent
  FROM sub WHERE rn <= {_PQ_NC})"""
    ]
    prev = "cents0"
    # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    # cents{{i}} references cents{{i-1}} twice — inlining would expand
    # the 10-iteration chain ~2^10-fold (observed as a hang)
    for i in range(1, _PQ_ITERS + 1):
        ctes.append(
            f"""a{i} AS MATERIALIZED (
  SELECT s.j, s.rn, s.sv, c.c,
         row_number() OVER (PARTITION BY s.j, s.rn
                            ORDER BY {d2} ASC, c.c ASC) AS a_rn
  FROM sub s JOIN {prev} c USING (j)),
m{i} AS (
  SELECT j, c, r.i AS pos, round(avg(sv[r.i]), 9) AS m
  FROM a{i} CROSS JOIN range(1, {_PQ_SUB + 1}) r(i)
  WHERE a_rn = 1 GROUP BY j, c, r.i),
n{i} AS (SELECT j, c, list(m ORDER BY pos) AS cent
         FROM m{i} GROUP BY j, c),
cents{i} AS MATERIALIZED (
  SELECT o.j, o.c, coalesce(n.cent, o.cent) AS cent
  FROM {prev} o LEFT JOIN n{i} n USING (j, c))"""
        )
        prev = f"cents{i}"
    ctes.append(
        f"""csub AS (
  SELECT t.vec_id, j.j,
         list_transform(range(1, {_PQ_SUB + 1}), i -> t.v[j.j * {_PQ_SUB} + i]) AS sv
  FROM v t CROSS JOIN jidx j),
casg AS (
  SELECT s.vec_id, s.j, c.c,
         row_number() OVER (PARTITION BY s.vec_id, s.j
                            ORDER BY {d2} ASC, c.c ASC) AS a_rn
  FROM csub s JOIN {prev} c USING (j)),
codes AS (SELECT vec_id, j, c FROM casg WHERE a_rn = 1),
qtab AS (
  SELECT q.vec_id AS query_id, c.j, c.c, {dot} AS dp
  FROM (SELECT * FROM csub WHERE vec_id < {_N_QUERIES}) q
  JOIN {prev} c USING (j)),
scores AS (
  SELECT t.query_id, k.vec_id, round(sum(t.dp), 4) AS score
  FROM codes k JOIN qtab t USING (j, c)
  WHERE t.query_id <> k.vec_id
  GROUP BY 1, 2),
ranked AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id ASC) AS rank
  FROM scores)"""
    )
    joined = ",\n".join(ctes)
    return (
        f"WITH {joined}\n"
        f"SELECT query_id, vec_id, score, rank FROM ranked"
        f" WHERE rank <= {_TOPK}"
    )


@q("embedding_pq_topk", _pq_oracle())
def _embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC top-k: deterministic sampled-k-means codebooks, 8 code
    bytes per 64-dim vector, asymmetric distance tables per query.
    Value-checked end to end: the oracle unrolls codebook training,
    corpus encoding AND ADC scoring in SQL (9-decimal centroid
    rounding makes the iterations engine-exact; scores round to 4
    before ranking on both sides) — on top of the recall pins in
    tests/test_quantized.py."""
    emb = _tp(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    books = S.pq_train_codebooks(
        emb, m=_PQ_M, n_centroids=_PQ_NC, sample_rows=_PQ_SAMPLE,
        iters=_PQ_ITERS,
    )
    return S.pq_adc_topk(emb, queries, books, k=_TOPK).orderBy(
        "query_id", "rank"
    )


_KM_K = 8
_KM_ITERS = 3
_KM_NPROBE = 2


def _kmeans_ivf_oracle() -> str:
    """The ENTIRE k-means training loop unrolled as SQL — every Lloyd's
    iteration is one (assign, mean, coalesce) CTE triple with the
    operator's exact deterministic rules: smallest-id init, round-4
    cosine argmax with cell-id-ascending tiebreak, per-(cell,dim) mean
    rounded to 9 decimals (the rounding that pins Spark's distributed
    summation to engine-independent values), empty cells keep their
    centroid. The final probing replays embedding_ivf_topk's pattern
    over the trained centroids."""
    ctes = [
        f"""v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cen0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell_id,
         v AS centroid
  FROM v ORDER BY vec_id LIMIT {_KM_K})"""
    ]
    prev = "cen0"
    # MATERIALIZED: each cen{{i}} references cen{{i-1}} twice; DuckDB
    # inlines plain CTEs, which would re-run the chain 2^iters times
    for i in range(1, _KM_ITERS + 1):
        ctes.append(
            f"""a{i} AS MATERIALIZED (
  SELECT vec_id, v, cell_id,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY round(list_cosine_similarity(v, centroid), 4) DESC,
                                     cell_id ASC) AS rn
  FROM v CROSS JOIN {prev}),
m{i} AS (
  SELECT cell_id, r.i AS pos, round(avg(v[r.i]), 9) AS m
  FROM a{i} CROSS JOIN range(1, {_DIM + 1}) r(i)
  WHERE rn = 1 GROUP BY cell_id, r.i),
n{i} AS (SELECT cell_id, list(m ORDER BY pos) AS centroid
         FROM m{i} GROUP BY cell_id),
cen{i} AS MATERIALIZED (
  SELECT c.cell_id, coalesce(n.centroid, c.centroid) AS centroid
  FROM {prev} c LEFT JOIN n{i} n USING (cell_id))"""
        )
        prev = f"cen{i}"
    ctes.append(
        f"""asgn AS (
  SELECT vec_id, cell_id,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY round(list_cosine_similarity(v, centroid), 4) DESC,
                                     cell_id ASC) AS cell_rank
  FROM v CROSS JOIN {prev}),
c_cells AS (SELECT vec_id, cell_id FROM asgn WHERE cell_rank = 1),
q_cells AS (SELECT vec_id AS query_id, cell_id FROM asgn
            WHERE cell_rank <= {_KM_NPROBE} AND vec_id < {_N_QUERIES}),
cand AS (
  SELECT q.query_id, c.vec_id
  FROM c_cells c JOIN q_cells q ON c.cell_id = q.cell_id
  WHERE q.query_id <> c.vec_id),
sims AS (
  SELECT cand.query_id, cand.vec_id,
         round(list_cosine_similarity(qe.v, ce.v), 4) AS sim
  FROM cand
  JOIN v qe ON qe.vec_id = cand.query_id
  JOIN v ce ON ce.vec_id = cand.vec_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, vec_id ASC) AS rank
  FROM sims)"""
    )
    joined = ",\n".join(ctes)
    return (
        f"WITH {joined}\n"
        f"SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= {_TOPK}"
    )


@q("embedding_kmeans_ivf_topk", _kmeans_ivf_oracle())
def _embedding_kmeans_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search over TRAINED centroids (similarity.kmeans_train: 3
    distributed spherical-Lloyd's iterations, deterministic smallest-id
    init, cosine assignment identical to query-time probing) instead of
    the fixed snapshot embedding_ivf_topk uses. Value-checked end to
    end: the oracle unrolls the full training loop in SQL (the 9-decimal
    mean rounding makes every iteration engine-exact), then replays the
    nprobe=2 probing — training AND serving are hash-checked, not just
    recall-pinned."""
    from ..operators.similarity import kmeans_train

    emb = _tp(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    cen = kmeans_train(emb, k=_KM_K, iters=_KM_ITERS)
    return S.ivf_topk(
        emb, queries, cen.select(F.col("cell_id").alias("vec_id"),
                                 F.col("centroid").alias("embedding")),
        k=_TOPK, nprobe=_KM_NPROBE,
    ).orderBy("query_id", "rank")


@q("pq_index_topk", _pq_oracle())
def _pq_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted PQ index (sinks/pqindex.py): codebooks trained once,
    every vector encoded to 8 code bytes, BOTH persisted (codebooks
    beside codes so scoring can never drift from encoding), then ADC
    top-k served by scanning the stored code table only — a 32x
    scan-bytes cut vs float vectors. Value oracle: the full SQL PQ
    replay (training + encode + ADC), i.e. the disk layout may change
    the plan, never the answer."""
    import tempfile
    from pathlib import Path

    from ..sinks.pqindex import build_pq_index, query_pq_index

    emb = _tp(spark, sf_dir, "embeddings")
    sf = Path(sf_dir).name or "sf"
    root = Path(tempfile.gettempdir()) / "spark_graft_pq_index" / sf
    build_pq_index(
        spark, emb, root, m=_PQ_M, n_centroids=_PQ_NC,
        sample_rows=_PQ_SAMPLE, iters=_PQ_ITERS,
    )
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return query_pq_index(spark, root, queries, k=_TOPK).orderBy(
        "query_id", "rank"
    )


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


# ---------------------------------------------------------------------------
# Greedy k-center coreset selection (diversity downsampling).
# ---------------------------------------------------------------------------

_KCENTER_K = 6
_KCENTER_SCALE = 10_000


def _kcenter_oracle(k: int) -> str:
    """Unrolled greedy k-center: every round is a MATERIALIZED CTE
    that cross-joins the (single-row) chosen centers and takes the
    exact integer max-min distance; mirrors operators/similarity.
    kcenter_greedy round for round."""

    def d2(center_cte: str) -> str:
        return (
            f"CAST(list_sum(list_transform(range(1, {_DIM + 1}), "
            f"j -> (c.q[j] - {center_cte}.q[j]) * (c.q[j] - {center_cte}.q[j])"
            f")) AS BIGINT)"
        )

    ctes = [
        f"""c0 AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * {_KCENTER_SCALE}) AS BIGINT)) AS q
  FROM embeddings
),
s0 AS MATERIALIZED (
  SELECT vec_id, q, CAST(0 AS BIGINT) AS d2 FROM c0 ORDER BY vec_id LIMIT 1
)"""
    ]
    for r in range(1, k):
        prev = ", ".join(f"s{i}" for i in range(r))
        dists = ", ".join(d2(f"s{i}") for i in range(r))
        md = dists if r == 1 else f"least({dists})"
        ctes.append(
            f"""m{r} AS MATERIALIZED (
  SELECT c.vec_id, c.q, {md} AS md FROM c0 c, {prev}
),
s{r} AS MATERIALIZED (
  SELECT vec_id, q, md AS d2 FROM m{r} ORDER BY md DESC, vec_id LIMIT 1
)"""
        )
    sel = " UNION ALL ".join(
        f"SELECT {r} AS sel_round, vec_id, d2 FROM s{r}" for r in range(k)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT CAST(sel_round AS BIGINT) AS sel_round, vec_id, d2 AS d2q"
        f" FROM ({sel}) ORDER BY sel_round"
    )


@q("coreset_kcenter_ids", _kcenter_oracle(_KCENTER_K))
def _coreset_kcenter_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset (k=6) over the embedding corpus:
    diversity downsampling for embedding-space curation — each round
    adds the point farthest (exact integer quantized squared L2) from
    the already-chosen set. See operators/similarity.kcenter_greedy
    for the per-round scale shape (k narrow scans, no corpus
    shuffle)."""
    emb = _tp(spark, sf_dir, "embeddings")
    return S.kcenter_greedy(emb, _KCENTER_K)
