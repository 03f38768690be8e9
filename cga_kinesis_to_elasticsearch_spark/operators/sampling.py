"""Deterministic sampling / data-mixing operators for training-data
pipelines (north star, BASELINE.json).

A training-data pipeline rarely wants Bernoulli RNG sampling: runs must
be reproducible, resumable, and auditable, and the same document must
make the same keep/drop decision on every executor, every retry, every
re-run. The standard trick is HASH sampling — a document is kept iff a
salted hash of its stable id falls below a per-stratum threshold. That
is a pure map-side predicate: no shuffle, no state, no RNG, and the
decision for any given document can be replayed anywhere (including in
the DuckDB oracle, which reproduces the md5 arithmetic bit-for-bit).

Scale posture (100 TB): the predicate is one md5 + one string compare
per row, fully inside whole-stage codegen; sampling never moves data.
Changing mixture weights between runs only flips rows whose hash lies
between the old and new thresholds (nested samples — a 10% sample is a
strict subset of a 20% sample), which is exactly the property data-mixing
ablations need.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["hex_threshold", "sample_key", "stratified_hash_sample"]

#: hex digits of the md5 prefix used as the uniform variate; 8 digits
#: give 16^-8 ~ 2.3e-10 fraction granularity.
_DIGITS = 8


def hex_threshold(fraction: float, digits: int = _DIGITS) -> str:
    """The lexicographic threshold encoding ``fraction``: an md5 prefix
    (lowercase hex, uniform over [0, 16^digits)) is below this string
    with probability ``fraction`` (up to 16^-digits granularity)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction out of range: {fraction}")
    if fraction >= 1.0:
        return "g" * digits  # 'g' > 'f': keeps every hex prefix
    return format(int(fraction * (16**digits)), f"0{digits}x")


def sample_key(id_col: Column, seed: str) -> Column:
    """The uniform variate for a row: the first 8 hex chars of
    md5('{seed}:{id}'). Salting with the seed decorrelates independent
    samples drawn from the same corpus."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string"))), 1, _DIGITS
    )


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
    seed: str = "mix0",
) -> DataFrame:
    """Keep each row iff its deterministic hash variate falls under its
    stratum's fraction — per-stratum downsampling for dataset mixing
    (e.g. keep 30% of 'en', 100% of everything else).

    The threshold is resolved per row with a when-chain over the (small,
    static) mixture spec, so the whole operator is a narrow filter; no
    join, no shuffle, no RNG.
    """
    thr: Column = F.lit(hex_threshold(default_fraction))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(stratum_col) == stratum, F.lit(hex_threshold(frac))
        ).otherwise(thr)
    return df.filter(sample_key(F.col(id_col), seed) < thr)
