"""Snorkel-style weak supervision over the document corpus: a bank of
deterministic labeling functions (LFs) votes {+1 keep, -1 drop,
0 abstain} per document; a label model aggregates the votes
(majority with confidence) and a diagnostics pass reports the
standard LF health metrics (coverage / overlap / conflict) used to
debug a labeling bank before training a classifier on its output.

Scale design: every LF is a narrow codegen-fused Column over ONE
corpus scan — the vote matrix is projection attributes, never a join
of per-LF frames (an n-LF bank as n self-joins would shuffle the
corpus n times; this shuffles it zero times for the per-doc label and
once — pre-aggregated — for the bank diagnostics). Diagnostics
aggregate to one n_LF-row frame via an unpivot of map-side-combined
sums, so the output is KB-scale at any corpus size.

This mirrors what data-programming pipelines (Snorkel, and the
weak-supervision pass of large corpus curation) run before committing
GPU time: is each rule firing often enough (coverage), is it
redundant (overlap), and where do rules disagree (conflict)?
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["default_lf_bank", "weak_label_votes", "lf_diagnostics"]


def default_lf_bank() -> list[tuple[str, Column]]:
    """The built-in labeling bank over the documents schema. Each LF
    is (name, Column) where the Column evaluates to +1 / -1 / 0.
    Every rule is a pure narrow expression (no UDF, no join)."""
    digits = F.length(F.regexp_replace(F.col("text"), "[^0-9]", ""))
    return [
        ("lf_short", F.when(F.col("n_chars") < 150, -1).otherwise(0)),
        ("lf_longform", F.when(F.col("n_chars") >= 350, 1).otherwise(0)),
        ("lf_english", F.when(F.col("lang") == "en", 1).otherwise(0)),
        (
            "lf_noisy_source",
            F.when(F.col("source").isin("src0", "src1", "src2"), -1).otherwise(0),
        ),
        ("lf_digit_heavy", F.when(digits >= 5, -1).otherwise(0)),
    ]


def weak_label_votes(
    df: DataFrame,
    bank: Sequence[tuple[str, Column]] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document vote aggregate: (id, n_pos, n_neg, label,
    confidence). ``label`` is the sign of the vote margin (0 on tie or
    all-abstain); ``confidence`` is |margin| / votes-cast (0.0 when no
    LF fired). One narrow pass; exact integer counts with a single
    rounded division."""
    bank = list(bank) if bank is not None else default_lf_bank()
    votes = [col.alias(name) for name, col in bank]
    staged = df.select(F.col(id_col), *votes)
    n_pos = sum(F.when(F.col(name) == 1, 1).otherwise(0) for name, _ in bank)
    n_neg = sum(F.when(F.col(name) == -1, 1).otherwise(0) for name, _ in bank)
    out = staged.select(
        F.col(id_col),
        n_pos.cast("long").alias("n_pos"),
        n_neg.cast("long").alias("n_neg"),
    )
    margin = F.col("n_pos") - F.col("n_neg")
    cast_total = F.col("n_pos") + F.col("n_neg")
    return out.select(
        id_col,
        "n_pos",
        "n_neg",
        F.when(margin > 0, 1).when(margin < 0, -1).otherwise(0).alias("label"),
        F.when(cast_total > 0, F.round(F.abs(margin) * 1.0 / cast_total, 9))
        .otherwise(F.lit(0.0))
        .alias("confidence"),
    )


def lf_diagnostics(
    df: DataFrame,
    bank: Sequence[tuple[str, Column]] | None = None,
) -> DataFrame:
    """Per-LF health metrics over the corpus: ``coverage`` (fraction
    of docs where the LF fired), ``overlap`` (fired AND >= 1 other LF
    fired), ``conflict`` (fired AND >= 1 other LF fired the OPPOSITE
    sign) — the Snorkel LFAnalysis triple.

    Plan: one scan computes every LF's vote and the bank-wide
    pos/neg counts as projection attributes; per-LF fired/overlap/
    conflict indicators reduce to map-side-combined integer sums (one
    1-row frame), and the per-LF unpivot runs on that single row.
    Fractions close with one identical rounded division per metric."""
    bank = list(bank) if bank is not None else default_lf_bank()
    names = [name for name, _ in bank]
    staged = df.select(*[col.alias(name) for name, col in bank])
    bank_pos = sum(
        F.when(F.col(n) == 1, 1).otherwise(0) for n in names
    ).alias("__pos")
    bank_neg = sum(
        F.when(F.col(n) == -1, 1).otherwise(0) for n in names
    ).alias("__neg")
    staged = staged.select("*", bank_pos, bank_neg)

    aggs = [F.count(F.lit(1)).alias("__n")]
    for n in names:
        fired = F.col(n) != 0
        others_fired = (F.col("__pos") + F.col("__neg")) > 1
        opposite = F.when(
            F.col(n) == 1, F.col("__neg") >= 1
        ).otherwise(F.col("__pos") >= 1)
        aggs.append(F.sum(fired.cast("long")).alias(f"{n}__fired"))
        aggs.append(
            F.sum((fired & others_fired).cast("long")).alias(f"{n}__overlap")
        )
        aggs.append(
            F.sum((fired & opposite).cast("long")).alias(f"{n}__conflict")
        )
    row = staged.agg(*aggs)
    stack_args = ", ".join(
        f"'{n}', {n}__fired, {n}__overlap, {n}__conflict" for n in names
    )
    unpivoted = row.selectExpr(
        "__n",
        f"stack({len(names)}, {stack_args}) AS (lf, fired, overlap, conflict)",
    )
    return unpivoted.select(
        "lf",
        F.col("fired").cast("long").alias("fired"),
        F.round(F.col("fired") * 1.0 / F.col("__n"), 9).alias("coverage"),
        F.round(F.col("overlap") * 1.0 / F.col("__n"), 9).alias("overlap"),
        F.round(F.col("conflict") * 1.0 / F.col("__n"), 9).alias("conflict"),
    ).orderBy("lf")
