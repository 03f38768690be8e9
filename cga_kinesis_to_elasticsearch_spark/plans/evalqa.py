"""Pipeline-evaluation / QA batch: LSH banding recall measured against
exact Jaccard ground truth on a fixed-size sample (the dedup analogue
of ann_recall_at_k — "measure, don't guess"), ES ``terms_set`` query
(minimum_should_match over a term set), ES ``_explain`` (per-term BM25
score breakdown), and padding-waste reporting for length-bucketed
training batches.

Float discipline: ratios/scores are single IEEE expressions closed
from integer counts (tf/df/dl/intersection sizes), rounded identically
on both engines; everything else is BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import dedup as D
from .declared import _t, q
from .northstar import _minhash_sql, _norm_sql, _shingle_sql, _tp

# ---------------------------------------------------------------------------
# LSH banding recall vs exact ground truth on a fixed-size eval sample.
# ---------------------------------------------------------------------------

_EVAL_SAMPLE = 250
_EVAL_J = 0.5
_MH_N = 4
_BAND = 2

_SAMPLE_SQL = f"""
  SELECT doc_id, text FROM documents
  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT {_EVAL_SAMPLE}
"""

_LSH_RECALL_ORACLE = f"""
WITH samp AS ({_SAMPLE_SQL}),
sh AS (
  SELECT doc_id, {_shingle_sql(_norm_sql('text'))} AS sg FROM samp
),
truth AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.sg, b.sg))
        / len(list_distinct(list_concat(a.sg, b.sg))) >= {_EVAL_J}
),
sig AS (
  SELECT doc_id,
         {_minhash_sql(_shingle_sql(_norm_sql('text')), 0)} AS mh0,
         {_minhash_sql(_shingle_sql(_norm_sql('text')), 1)} AS mh1,
         {_minhash_sql(_shingle_sql(_norm_sql('text')), 2)} AS mh2,
         {_minhash_sql(_shingle_sql(_norm_sql('text')), 3)} AS mh3
  FROM samp
),
banded AS (
  SELECT doc_id, 0 AS band_id, mh0 || '|' || mh1 AS band_key FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band_id, mh2 || '|' || mh3 AS band_key FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),
joined AS (
  SELECT coalesce(t.id_a, c.id_a) AS id_a,
         (t.id_a IS NOT NULL)::INT AS is_true,
         (c.id_a IS NOT NULL)::INT AS is_cand
  FROM truth t FULL JOIN cand c
    ON t.id_a = c.id_a AND t.id_b = c.id_b
)
SELECT CAST(sum(is_true) AS BIGINT) AS n_true,
       CAST(sum(is_cand) AS BIGINT) AS n_cand,
       CAST(sum(is_true * is_cand) AS BIGINT) AS n_hit,
       round(sum(is_true * is_cand) / sum(is_true), 4) AS recall,
       CASE WHEN sum(is_cand) = 0 THEN NULL
            ELSE round(sum(is_true * is_cand) / sum(is_cand), 4)
       END AS precision
FROM joined
"""


@q("lsh_recall_eval", _LSH_RECALL_ORACLE)
def _lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-recall evaluation harness: on a FIXED-SIZE random sample
    (the 250 docs with the smallest md5(doc_id) — deterministic and
    corpus-size-independent), compare the MinHash banding candidate
    set (4 hashes x 2 bands, the production recipe) against exact
    shingle-Jaccard ground truth at J >= 0.5, reporting recall and
    precision — the measured numbers that justify (or veto) the
    banding parameters before a 100 TB dedup run.

    Scale shape: the sample is a TakeOrdered(250) — per-partition
    top-n, no global sort — and every quadratic step (exact Jaccard,
    in-bucket pair expansion) runs on the CAPPED sample only, so the
    harness costs the same at any corpus size. This is the dedup
    counterpart of ann_recall_at_k; SCALING.md's exponent table is the
    other half of the measure-don't-guess discipline."""
    docs = _tp(spark, sf_dir, "documents")
    samp = (
        docs.select(
            "doc_id",
            "text",
            F.md5(F.col("doc_id").cast("string")).alias("__r"),
        )
        .orderBy("__r", "doc_id")
        .limit(_EVAL_SAMPLE)
        .drop("__r")
        # the sample feeds signatures AND both sides of the truth
        # join: cut lineage so the TakeOrdered runs once
        .localCheckpoint()
    )
    toks = samp.select(
        "doc_id",
        F.split(D.normalized_text(F.col("text")), " ").alias("__toks"),
    )
    sh = toks.select(
        "doc_id", D.word_shingles(F.col("__toks")).alias("sg")
    )
    # spread the pair-expansion side: the checkpointed TakeOrdered
    # sample lands in ONE partition, so the quadratic truth join
    # (|samp|^2/2 array-Jaccard evaluations) would run on one core;
    # a round-robin repartition of the capped 250-row frame costs
    # nothing and parallelizes the expansion (measured 1.9 -> 0.3 s
    # at 32 cores; the sample is fixed-size, so this is scale-free)
    a = (
        sh.repartition(spark.sparkContext.defaultParallelism)
        .select(F.col("doc_id").alias("id_a"), F.col("sg").alias("sga"))
    )
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sg").alias("sgb"))
    inter = F.size(F.array_intersect(F.col("sga"), F.col("sgb")))
    union = F.size(F.array_union(F.col("sga"), F.col("sgb")))
    truth = (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .filter(inter / union >= _EVAL_J)
        .select("id_a", "id_b")
    )
    sig = D.minhash_signatures(samp, "text", "doc_id", n_hashes=_MH_N)
    cand = D.lsh_candidate_pairs(
        sig, "doc_id", n_hashes=_MH_N, band_size=_BAND
    )
    joined = truth.withColumn("is_true", F.lit(1)).join(
        cand.withColumn("is_cand", F.lit(1)),
        ["id_a", "id_b"],
        "full_outer",
    )
    st = F.coalesce("is_true", F.lit(0))
    sc = F.coalesce("is_cand", F.lit(0))
    return joined.agg(
        F.sum(st).cast("long").alias("n_true"),
        F.sum(sc).cast("long").alias("n_cand"),
        F.sum(st * sc).cast("long").alias("n_hit"),
        F.round(F.sum(st * sc) / F.sum(st), 4).alias("recall"),
        F.when(
            F.sum(sc) == 0, F.lit(None).cast("double")
        )
        .otherwise(F.round(F.sum(st * sc) / F.sum(sc), 4))
        .alias("precision"),
    )


# ---------------------------------------------------------------------------
# terms_set query: match docs containing >= minimum_should_match of a
# term set.
# ---------------------------------------------------------------------------

_TS_TERMS = ("spark", "merge", "vector", "scan")
_TS_MIN = 3

_TERMS_SET_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         list_sort(list_intersect(
             list_distinct(list_filter(
                 string_split_regex(text, '\\s+'), x -> x <> '')),
             [{", ".join(f"'{t}'" for t in _TS_TERMS)}]
         )) AS matched
  FROM documents
)
SELECT doc_id,
       CAST(len(matched) AS BIGINT) AS n_matched,
       array_to_string(matched, ',') AS matched_terms
FROM t WHERE len(matched) >= {_TS_MIN}
"""


@q("terms_set_match", _TERMS_SET_ORACLE)
def _terms_set_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``terms_set`` query: documents containing at least
    ``minimum_should_match = 3`` of a 4-term set, with the matched
    subset reported (sorted, comma-joined — canonical on both
    engines).

    Scale shape: a pure per-row HOF over the token array — zero
    shuffles, zero joins; the term set is a literal array evaluated
    inside codegen. Against the persisted inverted index the same
    query is a postings merge with a >= N count filter
    (sinks/textindex.py); this is the index-free scan form."""
    docs = _t(spark, sf_dir, "documents")
    matched = F.sort_array(
        F.array_intersect(
            F.array_distinct(
                F.filter(
                    F.split(F.col("text"), r"\s+"), lambda x: x != ""
                )
            ),
            F.array(*[F.lit(t) for t in _TS_TERMS]),
        )
    )
    return (
        docs.select("doc_id", matched.alias("matched"))
        .filter(F.size("matched") >= _TS_MIN)
        .select(
            "doc_id",
            F.size("matched").cast("long").alias("n_matched"),
            F.array_join("matched", ",").alias("matched_terms"),
        )
    )


# ---------------------------------------------------------------------------
# _explain: per-term BM25 score breakdown for selected documents.
# ---------------------------------------------------------------------------

_EXPL_TERMS = ("scan", "merge", "window")
_EXPL_DOCS = 3
_EXPL_K1 = 1.2
_EXPL_B = 0.75

_EXPLAIN_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
  FROM documents
),
dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM toks),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(tk)) AS BIGINT) AS total_len
  FROM toks
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(tk) AS term FROM toks)
  WHERE term IN ({", ".join(f"'{t}'" for t in _EXPL_TERMS)})
  GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
)
SELECT t.doc_id, t.term, t.tf, d.dl, f.df,
       round(ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5)), 6) AS idf,
       round(ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
             * (t.tf * (1 + {_EXPL_K1}))
             / (t.tf + {_EXPL_K1} * (1 - {_EXPL_B} + {_EXPL_B}
                * (d.dl / (CAST(s.total_len AS DOUBLE) / s.n_docs)))),
             6) AS contrib
FROM tf t
JOIN dl d USING (doc_id)
JOIN dfreq f USING (term)
CROSS JOIN stats s
WHERE t.doc_id < {_EXPL_DOCS}
"""


@q("explain_bm25_doc", _EXPLAIN_ORACLE)
def _explain_bm25_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``_explain`` API: the per-term BM25 breakdown ("sum of:"
    tree) for selected documents against a 3-term query — tf, document
    length, df, idf and the term's score contribution, using the same
    Lucene practical scoring function as sinks/textindex.bm25_topk
    (k1=1.2, b=0.75, idf = ln(1+(N-df+0.5)/(df+0.5))).

    Scale shape: corpus statistics (df per query term, N, total token
    length) reduce map-side to a 3-row + 1-row frame; the requested
    documents' tf rows join against those broadcasts. Against the
    persisted index the stats come from the stored ``stats``/postings
    instead of a scan — same contract. idf/contrib are each ONE IEEE
    expression over integer inputs, rounded to 6 on both engines."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "").alias(
            "tk"
        ),
    )
    dl = toks.select(
        "doc_id", F.size("tk").cast("long").alias("dl")
    )
    stats = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size("tk")).cast("long").alias("total_len"),
    )
    tf_all = (
        toks.select("doc_id", F.explode("tk").alias("term"))
        .filter(F.col("term").isin(*_EXPL_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = tf_all.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = idf * (
        (F.col("tf") * (1 + _EXPL_K1))
        / (
            F.col("tf")
            + _EXPL_K1
            * (1 - _EXPL_B + _EXPL_B * (F.col("dl") / avgdl))
        )
    )
    return (
        tf_all.filter(F.col("doc_id") < _EXPL_DOCS)
        .join(dl, "doc_id")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            "tf",
            "dl",
            "df",
            F.round(idf, 6).alias("idf"),
            F.round(contrib, 6).alias("contrib"),
        )
    )


# ---------------------------------------------------------------------------
# Length-bucketed batching: padding-waste report.
# ---------------------------------------------------------------------------

_BUCKET_MULT = 32

_LENGTH_BUCKET_ORACLE = f"""
WITH lens AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(text, '\\s+'),
                              t -> t <> '')) AS BIGINT) AS n_toks
  FROM documents
),
bucketed AS (
  SELECT doc_id, n_toks,
         ((n_toks + {_BUCKET_MULT - 1}) // {_BUCKET_MULT})
           * {_BUCKET_MULT} AS bucket_len
  FROM lens
)
SELECT bucket_len,
       count(*) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS sum_tokens,
       CAST(bucket_len * count(*) AS BIGINT) AS padded_slots,
       round((bucket_len * count(*) - sum(n_toks))
             / (bucket_len * count(*)), 4) AS waste_frac
FROM bucketed
GROUP BY bucket_len
"""


@q("length_bucket_batches", _LENGTH_BUCKET_ORACLE)
def _length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching report: round each document's token
    count up to a multiple of 32 (its padded batch slot), then per
    bucket report document count, real tokens, padded slots, and the
    padding-waste fraction — the number that decides whether bucketing
    (vs pack_training_sequences' concat-and-chunk) is worth it for a
    given corpus.

    Scale shape: token counts are narrow per-row HOFs; the rollup is
    ONE partial-agg shuffle onto a bucket-length key whose domain is
    bounded by max_len/32, not corpus size. Integer floor division on
    both engines ((n+31) // 32 vs DIV); the waste ratio is one rounded
    division of exact BIGINTs."""
    docs = _t(spark, sf_dir, "documents")
    lens = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
        )
        .cast("long")
        .alias("n_toks"),
    )
    bucketed = lens.select(
        "n_toks",
        (
            F.expr(f"(n_toks + {_BUCKET_MULT - 1}) DIV {_BUCKET_MULT}")
            * _BUCKET_MULT
        ).alias("bucket_len"),
    )
    return bucketed.groupBy("bucket_len").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("long").alias("sum_tokens"),
        (F.col("bucket_len") * F.count(F.lit(1)))
        .cast("long")
        .alias("padded_slots"),
        F.round(
            (F.col("bucket_len") * F.count(F.lit(1)) - F.sum("n_toks"))
            / (F.col("bucket_len") * F.count(F.lit(1))),
            4,
        ).alias("waste_frac"),
    )


# ---------------------------------------------------------------------------
# NDCG@k of the IVF retrieval arm vs the exact-cosine ideal ranking —
# the graded-relevance upgrade of ann_recall_at_k.
# ---------------------------------------------------------------------------

_NDCG_K = 5
_NDCG_NQ = 8
_NDCG_NCENT = 8
_NDCG_NPROBE = 2

# IDCG@5 for graded gains (5,4,3,2,1) at positions 1..5 — a literal
# constant, identical on both engines
_IDCG_SQL = (
    "(5.0/log2(2) + 4.0/log2(3) + 3.0/log2(4) + 2.0/log2(5) + 1.0/log2(6))"
)

_NDCG_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {_NDCG_NQ}),
c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings),
exact AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
             ORDER BY round(list_cosine_similarity(qv, cv), 4) DESC,
                      vec_id ASC) AS erank
  FROM q JOIN c ON query_id <> vec_id
  QUALIFY erank <= {_NDCG_K}
),
cen AS (SELECT vec_id AS cell_id, embedding::DOUBLE[] AS cv
        FROM embeddings WHERE vec_id >= 100 AND vec_id < {100 + _NDCG_NCENT}),
asgn AS (
  SELECT vec_id, cell_id,
         row_number() OVER (PARTITION BY vec_id
             ORDER BY round(list_cosine_similarity(v, cv), 4) DESC,
                      cell_id ASC) AS cell_rank
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
  CROSS JOIN cen),
c_cells AS (SELECT vec_id, cell_id FROM asgn WHERE cell_rank = 1),
q_cells AS (SELECT vec_id AS query_id, cell_id FROM asgn
            WHERE cell_rank <= {_NDCG_NPROBE} AND vec_id < {_NDCG_NQ}),
cand AS (
  SELECT qc.query_id, cc.vec_id
  FROM c_cells cc JOIN q_cells qc ON cc.cell_id = qc.cell_id
  WHERE qc.query_id <> cc.vec_id),
approx AS (
  SELECT cand.query_id, cand.vec_id,
         row_number() OVER (PARTITION BY cand.query_id
             ORDER BY round(list_cosine_similarity(
                 qe.embedding::DOUBLE[], ce.embedding::DOUBLE[]), 4) DESC,
                      cand.vec_id ASC) AS arank
  FROM cand
  JOIN embeddings qe ON qe.vec_id = cand.query_id
  JOIN embeddings ce ON ce.vec_id = cand.vec_id
  QUALIFY arank <= {_NDCG_K}
),
gains AS (
  SELECT a.query_id, a.arank,
         CASE WHEN e.erank IS NOT NULL THEN 6 - e.erank ELSE 0 END AS rel
  FROM approx a LEFT JOIN exact e
    ON a.query_id = e.query_id AND a.vec_id = e.vec_id
),
dcg AS (
  SELECT query_id,
         list_sum(list(rel / log2(arank + 1) ORDER BY arank)) AS dcg_raw
  FROM gains GROUP BY query_id
)
SELECT query_id,
       round(dcg_raw, 4) AS dcg,
       round(dcg_raw / {_IDCG_SQL}, 4) AS ndcg
FROM dcg
"""


@q("ann_ndcg_eval", _NDCG_ORACLE)
def _ann_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@5 of IVF retrieval (nprobe=2, fixed centroid snapshot —
    the embedding_ivf_topk recipe) against the exact-cosine ideal —
    the graded-relevance companion of ann_recall_at_k (recall treats
    the 1st and 5th true neighbor alike; NDCG charges more for losing
    the top ones). Gain of the exact rank-r neighbor is 6-r; DCG folds
    in ascending approx-rank order (a fixed <= 5-term float sum,
    identical operand order in the SQL oracle's ORDER BY list fold).

    Scale shape: the cost IS the two retrievals it grades (broadcast
    queries over the streamed corpus; cell-pruned approx arm); the
    grading join touches k-row-per-query rank lists only."""
    from ..operators import similarity as S

    emb = _tp(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _NDCG_NQ)
    centroids = emb.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 100 + _NDCG_NCENT)
    )
    exact = S.cosine_topk(emb, queries, k=_NDCG_K).select(
        "query_id", "vec_id", F.col("rank").alias("erank")
    )
    approx = S.ivf_topk(
        emb, queries, centroids, k=_NDCG_K, nprobe=_NDCG_NPROBE
    ).select(
        F.col("query_id").alias("__aq"),
        F.col("vec_id").alias("__av"),
        F.col("rank").alias("arank"),
    )
    gains = approx.join(
        exact,
        (F.col("__aq") == F.col("query_id"))
        & (F.col("__av") == F.col("vec_id")),
        "left",
    ).select(
        F.col("__aq").alias("query_id"),
        "arank",
        F.coalesce(6 - F.col("erank"), F.lit(0)).alias("rel"),
    )
    # fold the <=5 DCG terms in fixed ascending-rank order so the
    # float sum's operand order matches the oracle's ordered list_sum
    term = (F.col("rel") / F.log2(F.col("arank") + 1)).alias("term")
    dcg_raw = F.aggregate(
        F.array_sort(
            F.collect_list(F.struct(F.col("arank"), term))
        ),
        F.lit(0.0),
        lambda acc, s: acc + s["term"],
    )
    idcg = sum((6.0 - r) / __import__("math").log2(r + 1) for r in range(1, 6))
    return (
        gains.groupBy("query_id")
        .agg(dcg_raw.alias("dcg_raw"))
        .select(
            "query_id",
            F.round("dcg_raw", 4).alias("dcg"),
            F.round(F.col("dcg_raw") / F.lit(idcg), 4).alias("ndcg"),
        )
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage curve: cumulative corpus-token share of the
# top-N terms — the "how large must the vocab be" readout.
# ---------------------------------------------------------------------------

_VC_CUTS = (5, 10, 20)

_VOCAB_COVERAGE_ORACLE = f"""
WITH tok AS (
  SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                            t -> t <> '')) AS term
  FROM documents
),
freq AS (SELECT term, count(*) AS f FROM tok GROUP BY term),
ranked AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, term ASC) AS r
  FROM freq
),
tot AS (SELECT CAST(sum(f) AS BIGINT) AS total_tokens FROM freq)
SELECT CAST(c.cutoff AS BIGINT) AS cutoff,
       CAST(sum(CASE WHEN r <= c.cutoff THEN f ELSE 0 END) AS BIGINT)
         AS covered_tokens,
       max(t.total_tokens) AS total_tokens,
       round(sum(CASE WHEN r <= c.cutoff THEN f ELSE 0 END)
             / max(t.total_tokens), 4) AS share
FROM ranked CROSS JOIN tot t
CROSS JOIN (SELECT unnest([{", ".join(str(c) for c in _VC_CUTS)}])
              AS cutoff) c
GROUP BY c.cutoff
"""


@q("vocab_coverage_curve", _VOCAB_COVERAGE_ORACLE)
def _vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction of all corpus tokens
    the top-N most-frequent terms cover (cutoffs sized to this
    corpus's ~31-term synthetic vocabulary; real corpora use
    1e4/1e5-scale cutoffs) — the readout that
    sizes a tokenizer vocabulary (or an OOV budget) before training
    one (bpe_train_merges / oov_rate are the downstream consumers).

    Scale shape: ONE map-side-combined (term, count) shuffle — the
    frequency table is vocabulary-sized, the rank window and the
    cutoff rollup run on that small frame, and the cutoffs are a
    3-row broadcast literal. The corpus never shuffles."""
    docs = _t(spark, sf_dir, "documents")
    freq = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.col("text"), r"\s+"), lambda t: t != ""
                )
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    from pyspark.sql import Window as W

    ranked = freq.select(
        "f",
        F.row_number()
        .over(W.orderBy(F.desc("f"), F.asc("term")))
        .alias("r"),
    )
    cuts = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(c) for c in _VC_CUTS])
        ).alias("cutoff")
    )
    return (
        ranked.crossJoin(F.broadcast(cuts))
        .groupBy("cutoff")
        .agg(
            F.sum(F.when(F.col("r") <= F.col("cutoff"), F.col("f")).otherwise(0))
            .cast("long")
            .alias("covered_tokens"),
            F.sum("f").cast("long").alias("total_tokens"),
        )
        .select(
            "cutoff",
            "covered_tokens",
            "total_tokens",
            F.round(
                F.col("covered_tokens") / F.col("total_tokens"), 4
            ).alias("share"),
        )
    )


# ---------------------------------------------------------------------------
# Quality-filter ablation: per-filter marginal removal analysis.
# ---------------------------------------------------------------------------

# the three hard keep-rules under study (cheap narrow signals; the
# same pattern extends to any of the text.py quality columns)
_FA_LEN = 200       # n_chars >= 200
_FA_DIVERSITY = 20  # distinct tokens >= 20
_FA_TOPSHARE = 20   # top token <= 20% of tokens (x100 fixed point)

_FILTER_ABLATION_ORACLE = f"""
WITH staged AS (
  SELECT doc_id, n_chars,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS tk
  FROM documents
),
sig AS (
  SELECT doc_id,
         (n_chars >= {_FA_LEN})::INT AS p_len,
         (len(list_distinct(tk)) >= {_FA_DIVERSITY})::INT AS p_div,
         (100 * list_max(list_transform(list_distinct(tk),
              u -> len(list_filter(tk, t -> t = u))))
          <= {_FA_TOPSHARE} * len(tk))::INT AS p_rep
  FROM staged
),
counts AS (
  SELECT count(*) AS n_docs,
         CAST(sum(1 - p_len) AS BIGINT) AS f_len,
         CAST(sum(1 - p_div) AS BIGINT) AS f_div,
         CAST(sum(1 - p_rep) AS BIGINT) AS f_rep,
         CAST(sum((1 - p_len) * p_div * p_rep) AS BIGINT) AS u_len,
         CAST(sum(p_len * (1 - p_div) * p_rep) AS BIGINT) AS u_div,
         CAST(sum(p_len * p_div * (1 - p_rep)) AS BIGINT) AS u_rep,
         CAST(sum(p_len * p_div * p_rep) AS BIGINT) AS n_pass_all
  FROM sig
)
SELECT 'min_length' AS filter, f_len AS n_fail, u_len AS n_unique_fail,
       n_docs, n_pass_all FROM counts
UNION ALL
SELECT 'min_diversity', f_div, u_div, n_docs, n_pass_all FROM counts
UNION ALL
SELECT 'max_repetition', f_rep, u_rep, n_docs, n_pass_all FROM counts
"""


@q("filter_ablation_matrix", _FILTER_ABLATION_ORACLE)
def _filter_ablation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter ablation report: for each hard keep-rule
    (min length, min lexical diversity, max top-token repetition),
    how many documents it rejects and how many it UNIQUELY rejects
    (would pass every other rule) — the marginal-contribution table
    that decides whether a filter earns its false-positive risk
    before a 100 TB curation run. The weak-supervision analogue is
    labeling_function_diagnostics; this is the hard-filter version.

    Scale shape: all predicates evaluate as narrow per-row HOFs in one
    scan; the whole report reduces MAP-SIDE to a single row of integer
    sums that is then unpivoted to one row per filter — KB-scale at
    any corpus size, adding a filter costs +2 sums, not +1 scan."""
    docs = _t(spark, sf_dir, "documents")
    tk = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    staged = docs.select(
        "n_chars", tk.alias("tk"), F.array_distinct(tk).alias("uk")
    )
    top_tf = F.array_max(
        F.transform(
            F.col("uk"),
            lambda u: F.size(F.filter(F.col("tk"), lambda t: t == u)),
        )
    )
    sig = staged.select(
        (F.col("n_chars") >= _FA_LEN).cast("int").alias("p_len"),
        (F.size("uk") >= _FA_DIVERSITY).cast("int").alias("p_div"),
        (100 * top_tf <= _FA_TOPSHARE * F.size("tk"))
        .cast("int")
        .alias("p_rep"),
    )
    counts = sig.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(1 - F.col("p_len")).cast("long").alias("f_len"),
        F.sum(1 - F.col("p_div")).cast("long").alias("f_div"),
        F.sum(1 - F.col("p_rep")).cast("long").alias("f_rep"),
        F.sum((1 - F.col("p_len")) * F.col("p_div") * F.col("p_rep"))
        .cast("long")
        .alias("u_len"),
        F.sum(F.col("p_len") * (1 - F.col("p_div")) * F.col("p_rep"))
        .cast("long")
        .alias("u_div"),
        F.sum(F.col("p_len") * F.col("p_div") * (1 - F.col("p_rep")))
        .cast("long")
        .alias("u_rep"),
        F.sum(F.col("p_len") * F.col("p_div") * F.col("p_rep"))
        .cast("long")
        .alias("n_pass_all"),
    )
    # unpivot the ONE-row aggregate with stack() — a 3-way union of
    # selects over `counts` would re-execute the corpus scan per arm
    return counts.select(
        F.expr(
            "stack(3,"
            " 'min_length', f_len, u_len,"
            " 'min_diversity', f_div, u_div,"
            " 'max_repetition', f_rep, u_rep"
            ") as (filter, n_fail, n_unique_fail)"
        ),
        "n_docs",
        "n_pass_all",
    )
