"""Misra-Gries heavy hitters: mergeable top-k frequency summaries.

The count-min sketch (operators/sketches.cm_sketch) answers point
frequency queries but cannot enumerate the heavy keys without knowing
them in advance. A Misra-Gries summary keeps at most ``k`` (key,
counter) pairs and guarantees that every key whose true frequency
exceeds N/(k+1) is present, with each stored counter underestimating
the true count by at most the summary's accumulated ``deficit``. The
summaries MERGE (Agarwal et al., "Mergeable Summaries", PODS'12):
pointwise-add two summaries, then PRUNE back to k entries by
subtracting the (k+1)-th largest counter from every entry and dropping
the non-positives — so per-day/per-batch summaries roll up to any
range, the same storage story as the HLL/KLL/theta family.

Everything here is deterministic DataFrame algebra — the prune
threshold is the (k+1)-th largest VALUE (a multiset property, no
tie-breaking needed: survivors are exactly the keys with count above
it), so the whole pipeline replays in the SQL oracle.

Scale shape: the exact per-key counts are one map-side-combined
aggregation; the prune threshold comes from a global top-(k+1)
(TakeOrdered — O(n log k) per partition, no full sort) collapsed to a
ONE-ROW broadcast joined back as a filter. Nothing driver-side, no
collect; counts never move twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["exact_counts", "mg_prune", "mg_merge"]


def exact_counts(df: DataFrame, key_col: str, k: int | None = None) -> DataFrame:
    """Per-key exact counts as ``(key STRING, cnt LONG, deficit LONG)``
    — an error-free Misra-Gries summary of the input (deficit 0).
    Pass ``k`` to immediately prune to a k-entry summary."""
    counts = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("deficit", F.lit(0).cast("long"))
    )
    return mg_prune(counts, k) if k is not None else counts


def mg_prune(summary: DataFrame, k: int) -> DataFrame:
    """Reduce ``(key, cnt, deficit)`` to at most ``k`` entries: subtract
    the (k+1)-th largest counter from every counter, keep the strictly
    positive remainder. The subtracted amount is added to ``deficit`` —
    the bound on how far any stored counter may undercount.

    The threshold is computed IN the plan: top-(k+1) counters via a
    global limit (TakeOrderedAndProject), collapsed to one row,
    broadcast back. With <= k entries the threshold is 0 and the
    summary passes through unchanged.

    The input is localCheckpoint-ed first: the threshold branch and
    the subtract branch both consume it, and downstream merges consume
    the output twice more — without the cut, every reference replays
    the full upstream lineage (the raw-fact count scan, once per
    branch; the un-cut plan audit showed 16 exchanges for one merge).
    One materialization of a <= vocabulary-sized count table is the
    price of scanning facts exactly once."""
    summary = summary.localCheckpoint()
    thr = (
        summary.select("cnt")
        .orderBy(F.col("cnt").desc())
        .limit(k + 1)
        .agg(
            F.when(F.count(F.lit(1)) >= k + 1, F.min("cnt"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("__thr")
        )
    )
    return (
        summary.join(F.broadcast(thr))
        .filter(F.col("cnt") > F.col("__thr"))
        .select(
            "key",
            (F.col("cnt") - F.col("__thr")).alias("cnt"),
            (F.col("deficit") + F.col("__thr")).alias("deficit"),
        )
    )


def mg_merge(a: DataFrame, b: DataFrame, k: int) -> DataFrame:
    """Merge two summaries: pointwise counter addition (full outer on
    key), then prune back to k. ``deficit`` is a SUMMARY-LEVEL scalar
    (identical on every row): the merged bound is deficit_a + deficit_b
    (a key absent from one side may be undercounted by that side's full
    deficit) and the prune adds its threshold on top — the standard
    mergeable-summaries guarantee. Summary sizes are <= 2k rows, so
    the join and the one-row deficit aggregates broadcast trivially."""
    da = a.agg(F.coalesce(F.max("deficit"), F.lit(0)).alias("__da"))
    db = b.agg(F.coalesce(F.max("deficit"), F.lit(0)).alias("__db"))
    aa = a.select("key", F.col("cnt").alias("__ca"))
    bb = b.select("key", F.col("cnt").alias("__cb"))
    merged = (
        aa.join(bb, "key", "full_outer")
        .join(F.broadcast(da))
        .join(F.broadcast(db))
        .select(
            "key",
            (F.coalesce("__ca", F.lit(0)) + F.coalesce("__cb", F.lit(0))).alias(
                "cnt"
            ),
            (F.col("__da") + F.col("__db")).alias("deficit"),
        )
    )
    return mg_prune(merged, k)
