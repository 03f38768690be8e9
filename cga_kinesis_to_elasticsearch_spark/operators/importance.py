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

Scale shape (optimization round 9 — guide §2.3/§2.4): featurization is
IN-ROW — each document folds to one ascending-sorted
``(bucket, cnt)`` array with no per-gram row explosion and no
(doc, bucket) exchange; the two distributions come out of ONE tiny
``n_buckets``-row aggregation over the feature frame; the per-document
score is a narrow in-row fold against a broadcast 1-row
``bucket -> log-ratio`` map. The corpus text is read once and never
shuffled, and no per-document state ever crosses an exchange — the
old shape shuffled (doc, bucket, cnt) rows twice (feature groupBy +
weight groupBy with a per-doc collect_list sort).

Determinism contract (same discipline as text.unigram_logprob): the
bucket hash is the engine-wide md5 trick (hex window of md5, exact in
any engine), probabilities are ratios of exact integers, and the
per-document sum of float log-ratios folds in ascending-bucket order
on BOTH engines — identical operand sequences give bit-identical
doubles, so weights are hash-comparable after round(6). The in-row
feature array is sorted ascending by bucket, so the fold order is the
same operand sequence the old (collect_list + array_sort) shape used.
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


def _inrow_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """``(id, *extra, fb array<struct<bucket int, cnt bigint>>)``: the
    hashed unigram+bigram bag of each document as ONE in-row array,
    sorted ascending by bucket — no per-gram rows, no exchange.
    Bigrams join tokens with ``_`` (never produced by normalization,
    so unigram/bigram namespaces cannot collide).

    The counts are built by run-length-encoding the sorted per-doc
    bucket array with higher-order functions: O(g log g) per document
    in whole-stage codegen, where g is the gram count."""
    raw_toks = F.filter(
        F.split(normalized_text(F.col(text_col)), " "), lambda t: t != ""
    )
    # bind the token array ONCE through an explode(array(..)) barrier:
    # referenced directly, the normalize+split expression would be
    # INLINED into every element_at of the bigram transform (projection
    # collapse), re-running the full-text regex per token — O(tokens^2)
    # per document (measured 22 s for 5k docs without the barrier)
    staged = df.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.explode(F.array(raw_toks)).alias("__toks"),
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
    bs = F.array_sort(
        F.transform(grams, lambda g: _gram_bucket(g, n_buckets))
    )
    st = staged.select(
        F.col(id_col), *[F.col(c) for c in extra_cols], bs.alias("__bs")
    ).withColumn(
        # run starts: indices where the sorted bucket value changes
        # (the i = 0 disjunct short-circuits before __bs[i - 1])
        "__starts",
        F.expr(
            "CASE WHEN size(__bs) > 0 THEN"
            " filter(sequence(0, size(__bs) - 1),"
            "        i -> i = 0 OR __bs[i] != __bs[i - 1])"
            " ELSE CAST(array() AS array<int>) END"
        ),
    )
    fb = F.expr(
        "transform(sequence(0, size(__starts) - 1), j -> struct("
        " __bs[__starts[j]] AS bucket,"
        " CAST((CASE WHEN j + 1 < size(__starts) THEN __starts[j + 1]"
        "       ELSE size(__bs) END) - __starts[j] AS BIGINT) AS cnt))"
    )
    empty = "CAST(array() AS array<struct<bucket:int,cnt:bigint>>)"
    return st.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.when(F.size("__starts") > 0, fb)
        .otherwise(F.expr(empty))
        .alias("fb"),
    )


def hashed_ngram_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """``(id, bucket INT, cnt LONG)``: hashed unigram+bigram bag of the
    normalized text. One row per (document, bucket) — the row form of
    ``_inrow_features``; since the in-row array is already aggregated
    per document, this is a narrow explode with NO groupBy exchange."""
    return _inrow_features(df, text_col, id_col, n_buckets).select(
        F.col(id_col), F.explode("fb").alias("__f")
    ).select(
        F.col(id_col),
        F.col("__f.bucket").alias("bucket"),
        F.col("__f.cnt").alias("cnt"),
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame | None,
    text_col: str,
    id_col: str,
    n_buckets: int = 1024,
    target_pred: Column | None = None,
) -> DataFrame:
    """Per-raw-document DSIR importance log-weight against ``target``.

    Returns ``(id, n_grams LONG, log_weight DOUBLE round-6)`` for every
    raw document (empty documents get n_grams=0, log_weight=0.0).
    Both distributions use Laplace smoothing — p(b) = (cnt_b + 1) /
    (total + n_buckets) — so unseen buckets stay finite and the ratio
    is well-defined everywhere.

    ``target_pred``: when the target set is a SUBSET of ``raw``
    selected by a row predicate (the common case — e.g. a source
    allowlist), pass the predicate instead of a second frame and the
    target distribution is derived from the raw feature pass — the
    target text is never tokenized twice. ``target`` is ignored (may
    be ``None``) when ``target_pred`` is given.
    """
    # feats feeds the distribution aggregation AND the scoring pass —
    # materialize once (the tokenize+hash pipeline is the expensive
    # part; everything downstream is a 1024-row agg or narrow)
    if target_pred is not None:
        feats = _inrow_features(
            raw.withColumn("__tgt", target_pred),
            text_col,
            id_col,
            n_buckets,
            ("__tgt",),
        ).localCheckpoint()
        ex = feats.select("__tgt", F.explode("fb").alias("__f"))
        both = ex.groupBy(F.col("__f.bucket").alias("bucket")).agg(
            F.sum("__f.cnt").alias("rc"),
            F.sum(F.when(F.col("__tgt"), F.col("__f.cnt"))).alias("tc"),
        )
    else:
        feats = _inrow_features(
            raw, text_col, id_col, n_buckets
        ).localCheckpoint()
        raw_b = (
            feats.select(F.explode("fb").alias("__f"))
            .groupBy(F.col("__f.bucket").alias("bucket"))
            .agg(F.sum("__f.cnt").alias("rc"))
        )
        tgt_b = (
            _inrow_features(target, text_col, id_col, n_buckets)
            .select(F.explode("fb").alias("__f"))
            .groupBy(F.col("__f.bucket").alias("bucket"))
            .agg(F.sum("__f.cnt").alias("tc"))
        )
        # full join: a separate target corpus may populate buckets the
        # raw corpus never touches (they still shift the target total)
        both = raw_b.join(tgt_b, "bucket", "full")
    m = F.lit(float(n_buckets))
    totals = both.agg(
        F.sum("rc").alias("rt"), F.sum("tc").alias("tt")
    )
    dist = both.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log(F.coalesce("tc", F.lit(0)) + 1.0)
            - F.log(F.coalesce("tt", F.lit(0)) + m)
            - F.log(F.coalesce("rc", F.lit(0)) + 1.0)
            + F.log(F.coalesce("rt", F.lit(0)) + m)
        ).alias("__lr"),
    )
    # ONE broadcast row: the whole bucket -> log-ratio table as a map
    # (n_buckets entries, KB-scale at any corpus size)
    lrmap = dist.agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "__lr"))
        ).alias("__lrm")
    )
    # narrow in-row score: ascending-bucket fold (fb is sorted), the
    # same operand sequence as the SQL oracle's ordered list_sum.
    # feats holds EVERY raw document (empty docs carry fb = []), so no
    # re-attach join is needed: empty folds give exactly (0, 0.0)
    return feats.crossJoin(F.broadcast(lrmap)).select(
        F.col(id_col),
        F.expr("aggregate(fb, 0L, (a, x) -> a + x.cnt)")
        .cast("long")
        .alias("n_grams"),
        F.round(
            F.expr(
                "aggregate(fb, 0.0D, (a, x) -> a + x.cnt * __lrm[x.bucket])"
            ),
            6,
        ).alias("log_weight"),
    )
