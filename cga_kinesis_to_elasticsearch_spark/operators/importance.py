"""DSIR-style importance weighting for training-data selection.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023 —
public method): featurize every document as a bag of HASHED n-grams
(unigrams + bigrams folded into ``n_buckets`` buckets), fit two
smoothed bucket distributions — one on a small TARGET set (the
distribution you want more of) and one on the RAW corpus — and score
each raw document with its importance log-weight

    log w(doc) = sum_b cnt_doc[b] * (log p_target[b] - log p_raw[b]).

High-weight documents look like the target; feeding the weights into
``sampling.weighted_hash_sample`` (or thresholding the top quantile)
completes the resampling step. This is the standard cheap alternative
to classifier-based quality selection.

Scale shape: featurization is one narrow explode -> groupBy (doc,
bucket) with map-side combine (features per doc are bounded by its
token count); each distribution is an ``n_buckets``-row aggregate that
broadcasts; the weight join touches (doc, bucket) rows only — the
corpus text is read once and never shuffled.

Determinism contract (same discipline as text.unigram_logprob): the
bucket hash is the engine-wide md5 trick (hex window of md5, exact in
any engine), probabilities are ratios of exact integers, and the
per-document sum of float log-ratios folds in ascending-bucket order
on BOTH engines — identical operand sequences give bit-identical
doubles, so weights are hash-comparable after round(6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import normalized_text

__all__ = [
    "hashed_ngram_features",
    "dsir_log_weights",
]


def _gram_bucket(gram: Column, n_buckets: int) -> Column:
    """Deterministic bucket in [0, n_buckets): integer value of a
    7-hex-char md5 window, mod n_buckets — the one-md5 hashing family
    shared with bloom/count-min (exact in Spark and DuckDB)."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit("g:"), gram)), 1, 7), 16, 10)
    return (h.cast("long") % n_buckets).cast("int")


def hashed_ngram_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """``(id, bucket INT, cnt LONG)``: hashed unigram+bigram bag of the
    normalized text. Bigrams join tokens with ``_`` (never produced by
    normalization, so unigram/bigram namespaces cannot collide)."""
    raw_toks = F.filter(
        F.split(normalized_text(F.col(text_col)), " "), lambda t: t != ""
    )
    # bind the token array ONCE through an explode(array(..)) barrier:
    # referenced directly, the normalize+split expression would be
    # INLINED into every element_at of the bigram transform (projection
    # collapse), re-running the full-text regex per token — O(tokens^2)
    # per document (measured 22 s for 5k docs without the barrier)
    staged = df.select(
        F.col(id_col), F.explode(F.array(raw_toks)).alias("__toks")
    )
    toks = F.col("__toks")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                "_",
                F.element_at(toks, i.cast("int")),
                F.element_at(toks, (i + 1).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(toks, bigrams)
    ex = staged.select(F.col(id_col), F.explode(grams).alias("__gram"))
    return (
        ex.select(
            F.col(id_col), _gram_bucket(F.col("__gram"), n_buckets).alias("bucket")
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-raw-document DSIR importance log-weight against ``target``.

    Returns ``(id, n_grams LONG, log_weight DOUBLE round-6)`` for every
    raw document (empty documents get n_grams=0, log_weight=0.0).
    Both distributions use Laplace smoothing — p(b) = (cnt_b + 1) /
    (total + n_buckets) — so unseen buckets stay finite and the ratio
    is well-defined everywhere.
    """
    # raw_f feeds BOTH the raw distribution and the per-doc contribution
    # join — materialize once so the tokenize+hash pipeline runs once
    raw_f = hashed_ngram_features(
        raw, text_col, id_col, n_buckets
    ).localCheckpoint()
    tgt_f = hashed_ngram_features(target, text_col, id_col, n_buckets)
    raw_b = raw_f.groupBy("bucket").agg(F.sum("cnt").alias("rc"))
    tgt_b = tgt_f.groupBy("bucket").agg(F.sum("cnt").alias("tc"))
    totals = raw_b.agg(F.sum("rc").alias("rt")).crossJoin(
        tgt_b.agg(F.sum("tc").alias("tt"))
    )
    m = F.lit(float(n_buckets))
    dist = (
        raw_b.join(tgt_b, "bucket", "full")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log(F.coalesce("tc", F.lit(0)) + 1.0)
                - F.log(F.col("tt") + m)
                - F.log(F.coalesce("rc", F.lit(0)) + 1.0)
                + F.log(F.col("rt") + m)
            ).alias("__lr"),
        )
    )
    contrib = raw_f.join(F.broadcast(dist), "bucket").select(
        F.col(id_col),
        "cnt",
        (F.col("cnt") * F.col("__lr")).alias("__c"),
        "bucket",
    )
    weights = contrib.groupBy(id_col).agg(
        F.sum("cnt").alias("n_grams"),
        # ascending-bucket fold: the determinism contract shared with
        # the SQL oracle (see module docstring)
        F.round(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct(F.col("bucket"), F.col("__c")))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["__c"],
            ),
            6,
        ).alias("log_weight"),
    )
    return (
        raw.select(id_col)
        .join(weights, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )
