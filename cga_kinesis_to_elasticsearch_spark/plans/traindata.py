"""Training-data pipeline batch: metadata-filtered kNN (ES filtered
knn search), hard-negative mining for contrastive training,
preference-pair construction (RLHF reward-model data prep),
equi-depth curriculum epochs from a lexical-diversity score, and
cross-source priority dedup (keep the copy from the most-trusted
source).

These extend the north-star LLM-data families (plans/northstar.py,
plans/corpus.py, plans/webmix.py) with the selection/ordering steps a
pretraining + preference-tuning pipeline runs after dedup and quality
filtering.

Float discipline: similarities follow the cosine house rule (one
IEEE expression, round 4); everything else is BIGINT (cents, counts,
integer scores) so every oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators import similarity as S
from .declared import _t, q
from .northstar import _tp

_N_QUERIES = 8
_TOPK = 5

# ---------------------------------------------------------------------------
# Filtered kNN: ES knn search with a metadata pre-filter — the filter
# applies to CANDIDATES (the k results all satisfy it), not post-hoc
# to an unfiltered top-k (which could return < k survivors).
# ---------------------------------------------------------------------------

_FILTERED_ANN_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {_N_QUERIES}),
c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings
      WHERE label <= 2),
sims AS (
  SELECT query_id, vec_id,
         round(list_cosine_similarity(qv, cv), 4) AS sim
  FROM q JOIN c ON query_id <> vec_id),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, vec_id ASC) AS rank
  FROM sims)
SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= {_TOPK}
"""


@q("filtered_ann_topk", _FILTERED_ANN_ORACLE)
def _filtered_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES filtered kNN search: top-k cosine neighbors among candidates
    passing a metadata filter (``label <= 2``). The filter is a narrow
    predicate applied BEFORE the similarity join, so the guarantee is
    ES's: all k hits satisfy it, and the pruned candidates never cost
    a distance evaluation. Composes with every ANN index here the same
    way (IVF cell scan + filter + rank); with a very selective filter
    the planner's choice flips to filter-first brute force — exactly
    the ES _knn_search heuristic."""
    emb = _tp(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return S.cosine_topk(emb.filter(F.col("label") <= 2), queries, k=_TOPK)


# ---------------------------------------------------------------------------
# Hard-negative mining: per query, nearest neighbors with a DIFFERENT
# label — the contrastive-training negatives worth mining.
# ---------------------------------------------------------------------------

_HARD_NEG_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, label AS ql,
                  embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {_N_QUERIES}),
c AS (SELECT vec_id, label AS cl, embedding::DOUBLE[] AS cv
      FROM embeddings),
sims AS (
  SELECT query_id, vec_id,
         round(list_cosine_similarity(qv, cv), 4) AS sim
  FROM q JOIN c ON query_id <> vec_id AND ql <> cl),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, vec_id ASC) AS rank
  FROM sims)
SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= {_TOPK}
"""


@q("hard_negative_topk", _HARD_NEG_ORACLE)
def _hard_negative_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (see operators/similarity.py
    ``hard_negative_topk``): for each of the first 8 vectors, the 5
    most-similar vectors carrying a DIFFERENT label — the
    near-decision-boundary negatives a contrastive loss needs."""
    emb = _tp(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return S.hard_negative_topk(emb, queries, k=_TOPK)


# ---------------------------------------------------------------------------
# Preference pairs: per prompt (user), (chosen, rejected) = the
# highest- vs lowest-scored response — reward-model training rows.
# ---------------------------------------------------------------------------

_PREF_ORACLE = """
WITH scored AS (
  SELECT user_id, event_id,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events
  WHERE value IS NOT NULL
),
ranked AS (
  SELECT user_id, event_id, vc,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY vc DESC, event_id ASC) AS rb,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY vc ASC, event_id ASC) AS rw
  FROM scored
),
pairs AS (
  SELECT user_id,
         max(CASE WHEN rb = 1 THEN event_id END) AS chosen_event,
         max(CASE WHEN rb = 1 THEN vc END) AS chosen_cents,
         max(CASE WHEN rw = 1 THEN event_id END) AS rejected_event,
         max(CASE WHEN rw = 1 THEN vc END) AS rejected_cents
  FROM ranked GROUP BY user_id
)
SELECT user_id, chosen_event, rejected_event,
       chosen_cents - rejected_cents AS margin_cents
FROM pairs WHERE chosen_cents - rejected_cents > 0
"""


@q("preference_pairs", _PREF_ORACLE)
def _preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction for reward-model / DPO training:
    treating user_id as the prompt group and value as the response
    score, emit one (chosen, rejected) pair per group — the best- and
    worst-scored members — keeping only groups with a strictly
    positive margin (a zero margin carries no preference signal).

    Scale shape: ONE shuffle on the group key; both extreme picks ride
    the same partitioning (Spark plans one exchange, two in-partition
    sorts), and the pair assembly is a map-side conditional aggregate.
    Ties break on event_id so chosen/rejected are unique on both
    engines. At 100 TB this is the canonical groupBy-window recipe the
    RLHF data pipeline runs per prompt."""
    ev = _t(spark, sf_dir, "events")
    # unscored responses are EXCLUDED (not ranked): NULL scores order
    # differently in Spark (nulls first) vs SQL engines (nulls last),
    # and a null-scored "rejected" carries no training signal anyway
    scored = ev.filter(F.col("value").isNotNull()).select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.desc("vc"), F.asc("event_id")
    )
    ww = Window.partitionBy("user_id").orderBy(
        F.asc("vc"), F.asc("event_id")
    )
    ranked = scored.select(
        "user_id",
        "event_id",
        "vc",
        F.row_number().over(wb).alias("rb"),
        F.row_number().over(ww).alias("rw"),
    )
    pairs = ranked.groupBy("user_id").agg(
        F.max(F.when(F.col("rb") == 1, F.col("event_id"))).alias(
            "chosen_event"
        ),
        F.max(F.when(F.col("rb") == 1, F.col("vc"))).alias("chosen_cents"),
        F.max(F.when(F.col("rw") == 1, F.col("event_id"))).alias(
            "rejected_event"
        ),
        F.max(F.when(F.col("rw") == 1, F.col("vc"))).alias(
            "rejected_cents"
        ),
    )
    return pairs.select(
        "user_id",
        "chosen_event",
        "rejected_event",
        (F.col("chosen_cents") - F.col("rejected_cents")).alias(
            "margin_cents"
        ),
    ).filter(F.col("margin_cents") > 0)


# ---------------------------------------------------------------------------
# Curriculum epochs: equi-depth quartiles of an integer difficulty
# score WITHOUT a global row sort — the histogram-CDF formulation.
# ---------------------------------------------------------------------------

_N_EPOCHS = 4

_CURRICULUM_ORACLE = f"""
WITH scored AS (
  SELECT doc_id,
         CAST(len(list_distinct(
             list_filter(string_split_regex(coalesce(text, ''), '\\s+'),
                         t -> t <> '')
         )) AS BIGINT) AS score
  FROM documents
),
hist AS (
  SELECT score, count(*) AS c FROM scored GROUP BY score
),
cdf AS (
  SELECT score, c,
         CAST(coalesce(sum(c) OVER (ORDER BY score
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_before,
         CAST(sum(c) OVER () AS BIGINT) AS total
  FROM hist
),
buckets AS (
  SELECT score,
         least({_N_EPOCHS}, 1 + ({_N_EPOCHS} * cum_before) // total)
           AS epoch
  FROM cdf
)
SELECT b.epoch,
       count(*) AS n_docs,
       min(s.score) AS lo_score,
       max(s.score) AS hi_score,
       min(md5(CAST(s.doc_id AS VARCHAR))) AS shuffle_head
FROM scored s JOIN buckets b USING (score)
GROUP BY b.epoch
"""


@q("curriculum_epochs", _CURRICULUM_ORACLE)
def _curriculum_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum construction: order the corpus easy-to-hard by an
    integer difficulty score (distinct-token count — lexical
    diversity) and split it into equi-depth epochs, reporting each
    epoch's size, score bounds, and the md5 shuffle head (the
    deterministic within-epoch ordering key, per epoch_shuffle_heads).

    Scale shape — the point of this query: equi-depth WITHOUT ntile's
    global row sort. The per-doc score is narrow; the histogram is one
    partial-agg shuffle onto the score DOMAIN (bounded by vocabulary,
    not corpus size); the CDF window runs over that tiny frame; the
    epoch map broadcasts back onto the scan. Docs sharing a score
    share an epoch (value-atomic, like variable_width_histogram), so
    the assignment is order-free and SQL-replayable — and at 100 TB
    nothing but the histogram ever shuffles."""
    docs = _tp(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        # coalesce('') so a NULL text scores 0 on BOTH engines (a null
        # score would sort nulls-first in Spark but nulls-last in SQL
        # engines — the same nullable-contract trap topk.py fixed)
        F.size(
            F.array_distinct(
                F.filter(
                    F.split(F.coalesce(F.col("text"), F.lit("")), r"\s+"),
                    lambda t: t != "",
                )
            )
        )
        .cast("long")
        .alias("score"),
    )
    hist = scored.groupBy("score").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cdf = hist.select(
        "score",
        F.coalesce(F.sum("c").over(wc), F.lit(0))
        .cast("long")
        .alias("cum_before"),
        F.sum("c").over(Window.partitionBy()).cast("long").alias("total"),
    )
    buckets = cdf.select(
        "score",
        F.least(
            F.lit(_N_EPOCHS).cast("long"),
            # integer floor division on BOTH engines (DuckDB // / Spark
            # DIV) — a double division + cast would round on one engine
            # and truncate on the other
            F.expr(f"1 + ({_N_EPOCHS} * cum_before) DIV total"),
        ).alias("epoch"),
    )
    return (
        scored.join(F.broadcast(buckets), "score")
        .groupBy("epoch")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("score").alias("lo_score"),
            F.max("score").alias("hi_score"),
            F.min(F.md5(F.col("doc_id").cast("string"))).alias(
                "shuffle_head"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Cross-source priority dedup: within each exact-duplicate group keep
# the copy from the most-trusted source.
# ---------------------------------------------------------------------------

_PRIORITY_ORACLE = """
WITH staged AS (
  SELECT doc_id, source,
         coalesce(try_cast(regexp_extract(coalesce(source, ''),
                                          '([0-9]+)', 1) AS BIGINT),
                  9223372036854775807) AS priority,
         md5(coalesce(text, '')) AS content_hash
  FROM documents
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY content_hash
                               ORDER BY priority ASC, doc_id ASC) AS rn
  FROM staged
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped
FROM ranked
GROUP BY source
"""


@q("cross_source_priority_dedup", _PRIORITY_ORACLE)
def _cross_source_priority_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source exact dedup with a keep policy: when the same
    content appears in several sources, keep the copy from the
    highest-priority source (lower numeric suffix = more trusted;
    e.g. curated > crawl), tie-broken by doc_id — then report each
    source's kept/dropped split (the "how much of source X survived
    dedup against source Y" table every corpus-mixing decision needs).

    Scale shape: identical to dedup_exact — one shuffle on the md5
    content hash (fixed 32-byte key regardless of document size), a
    per-group window pick, one partial-agg rollup on the small source
    domain. The full text never shuffles."""
    docs = _tp(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        "source",
        # null/number-free sources sink to LOWEST priority instead of
        # riding engine-specific null ordering; null text hashes as ''
        F.coalesce(
            F.regexp_extract(F.coalesce(F.col("source"), F.lit("")),
                             "([0-9]+)", 1).try_cast("long"),
            F.lit(2**63 - 1),
        ).alias("priority"),
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("content_hash"),
    )
    w = Window.partitionBy("content_hash").orderBy(
        F.asc("priority"), F.asc("doc_id")
    )
    ranked = staged.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dropped"),
    )
