"""Composed corpus-curation pipeline: the corpus-side analogue of the
log `pipeline.py` — language gate, quality gate, exact-dedup keep-first
election, and per-survivor accounting, as ONE DataFrame function.

Why an operator and not a chain of the existing stage operators:
`quality_score` / `lang_id` / `fingerprint` each project (id, features)
off their own scan, so chaining them needs id-joins — three shuffles of
the whole corpus for what is per-row arithmetic. This composition uses
their Column builders (text.quality_columns / text.lang_guess_column)
to compute EVERY per-doc feature in one narrow pass; the only exchange
in the whole pipeline is the dedup election shuffle on the fingerprint
key. At 100 TB: scan -> codegen-fused feature/filter stage (drops
low-quality and off-language docs BEFORE the shuffle, so the exchange
moves only survivors) -> one hash exchange on md5 keys -> window
rank-1. Filter-before-shuffle is the whole design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import normalized_text
from .text import lang_guess_column, quality_columns

__all__ = ["curate_corpus", "curation_funnel"]


def curate_corpus(
    df: DataFrame,
    text_col: str,
    id_col: str,
    keep_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.05,
) -> DataFrame:
    """-> (id, lang_guess, quality, n_tokens, fingerprint) for the
    documents that survive language gate -> quality gate -> exact-dup
    keep-first election (lowest id per normalized-text fingerprint).
    """
    q = quality_columns(text_col)
    featured = df.select(
        F.col(id_col),
        lang_guess_column(text_col).alias("lang_guess"),
        q["quality"].alias("quality"),
        F.size(F.split(F.col(text_col), " ")).alias("n_tokens"),
        F.md5(normalized_text(F.col(text_col))).alias("fingerprint"),
    )
    gated = featured.filter(
        F.col("lang_guess").isin(*keep_langs)
        & (F.col("quality") >= min_quality)
    )
    w = Window.partitionBy("fingerprint").orderBy(F.asc(id_col))
    return (
        gated.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def curation_funnel(
    df: DataFrame,
    text_col: str,
    id_col: str,
    keep_langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.05,
) -> DataFrame:
    """Per-stage rejection accounting for the :func:`curate_corpus`
    pipeline — the observability readout a curation run ships with its
    output: one row per stage ``(stage, gate, rows_in, rows_out,
    rejected, reject_pct)`` for the language gate, the quality gate,
    and the exact-dedup keep-first election (each document is charged
    to the FIRST gate that rejects it, exactly matching what
    curate_corpus drops).

    Scale shape: two NARROW corpus scans (the gate counters close
    map-side into a 1-row aggregate on the first; the second shuffles
    only gate survivors for the dedup-election count — the same
    exchange curate_corpus needs anyway). Two IO-bound scans beat
    forcing the rejected rows through the fingerprint shuffle just to
    share one pass; the 3-row funnel assembles from two single-row
    frames with no driver loop.
    """
    q = quality_columns(text_col)
    featured = df.select(
        F.col(id_col),
        lang_guess_column(text_col).alias("lang_guess"),
        q["quality"].alias("quality"),
        F.md5(normalized_text(F.col(text_col))).alias("fingerprint"),
    )
    lang_ok = F.col("lang_guess").isin(*keep_langs)
    qual_ok = F.col("quality") >= min_quality
    gates = featured.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(~lang_ok, 1).otherwise(0)).alias("n_lang"),
        F.sum(F.when(lang_ok & ~qual_ok, 1).otherwise(0)).alias("n_qual"),
    )
    w = Window.partitionBy("fingerprint").orderBy(F.asc(id_col))
    dups = (
        featured.filter(lang_ok & qual_ok)
        .withColumn("__rn", F.row_number().over(w))
        .agg(F.sum(F.when(F.col("__rn") > 1, 1).otherwise(0)).alias("n_dup"))
    )
    row = gates.crossJoin(dups)
    t, nl = F.col("n_total"), F.col("n_lang")
    nq, nd = F.col("n_qual"), F.col("n_dup")
    stages = row.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).cast("long").alias("stage"),
                    F.lit("lang_gate").alias("gate"),
                    t.alias("rows_in"),
                    nl.alias("rejected"),
                ),
                F.struct(
                    F.lit(2).cast("long").alias("stage"),
                    F.lit("quality_gate").alias("gate"),
                    (t - nl).alias("rows_in"),
                    nq.alias("rejected"),
                ),
                F.struct(
                    F.lit(3).cast("long").alias("stage"),
                    F.lit("dedup_keep_first").alias("gate"),
                    (t - nl - nq).alias("rows_in"),
                    nd.alias("rejected"),
                ),
            )
        ).alias("s")
    )
    return stages.select(
        F.col("s.stage").alias("stage"),
        F.col("s.gate").alias("gate"),
        F.col("s.rows_in").alias("rows_in"),
        (F.col("s.rows_in") - F.col("s.rejected")).alias("rows_out"),
        F.col("s.rejected").alias("rejected"),
        F.when(
            F.col("s.rows_in") > 0,
            F.round(F.col("s.rejected") / F.col("s.rows_in"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("reject_pct"),
    )
