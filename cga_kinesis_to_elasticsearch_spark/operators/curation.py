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

__all__ = ["curate_corpus"]


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
