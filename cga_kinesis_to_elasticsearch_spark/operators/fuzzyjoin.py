"""Fuzzy key join (edit distance <= 1) via deletion-neighborhood
blocking — entity resolution for dirty join keys (typo'd app/source
names) without the quadratic cross join.

Principle (SymSpell/FastSS): two strings are within edit distance 1
iff their deletion neighborhoods intersect, where the neighborhood of
``s`` is ``{s} ∪ {s with one char deleted}``. Substitution meets in
the both-deleted variant, insert/delete in the shorter string itself.
The neighborhood join over-generates (e.g. "ab"/"ba" share variants at
distance 2), so candidates are verified with ``levenshtein`` — both
engines ship it, which is what makes the DuckDB oracle a genuinely
independent brute-force check of the blocking scheme's recall.

Scale shape: each side explodes to |s|+1 variant rows (keys are short
— bounded fan-out), ONE equi-join on the variant string replaces the
O(N x M) similarity join, the verify filter is a narrow expression,
and the distinct collapses multi-variant collisions of the same pair.
At 100 TB the variant join behaves like any equi-join: hash-partition
by variant, broadcast whichever side's distinct keys are small
(dimension cleanup — the common case).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["deletion_neighborhood", "fuzzy_join_edit1"]


def deletion_neighborhood(key: Column) -> Column:
    """``array(s, del_0(s), ..., del_{n-1}(s))`` — the string plus every
    single-character deletion, distinct."""
    deletions = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(key), F.lit(1))),
        lambda i: F.concat(
            F.substring(key, F.lit(1), i - 1),
            # from i+1 to end; length bound keeps ANSI substring happy
            F.substring(key, i + 1, F.length(key)),
        ),
    )
    return F.array_distinct(F.concat(F.array(key), deletions))


def fuzzy_join_edit1(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    broadcast_right: bool = True,
) -> DataFrame:
    """All (left_key, right_key) pairs with levenshtein distance <= 1.

    Returns distinct pairs with their distance; callers join the result
    back to their payloads by key. ``broadcast_right=True`` for the
    dimension-cleanup case (small right side of distinct canonical
    keys)."""
    lv = left.select(F.col(left_key).alias("l_key")).distinct()
    rv = right.select(F.col(right_key).alias("r_key")).distinct()
    le = lv.select(
        "l_key", F.explode(deletion_neighborhood(F.col("l_key"))).alias("__v")
    )
    re = rv.select(
        "r_key", F.explode(deletion_neighborhood(F.col("r_key"))).alias("__v")
    )
    if broadcast_right:
        re = F.broadcast(re)
    cand = le.join(re, "__v").select("l_key", "r_key").distinct()
    dist = F.levenshtein("l_key", "r_key")
    return cand.select(
        "l_key", "r_key", dist.alias("distance")
    ).filter(F.col("distance") <= 1)
