"""Time-bounded event-sequence detection (MATCH_RECOGNIZE-lite).

Detects ordered patterns "step_0 then step_1 ... then step_{k-1}
within W ms" per key, where other events may interleave between steps
— the product-analytics / fraud-detection shape SQL standardizes as
MATCH_RECOGNIZE (absent from both Spark and the reference). The
funnel operator (plans/eventanalytics.py) answers "did the user EVER
complete the stages"; this one finds EVERY completion and enforces
the time bound.

Matching semantics (existential, max-origin): a row matching the
final step completes the pattern iff there exist earlier rows
matching each prior step in order, such that final.ts - origin.ts <=
within_ms for the LATEST feasible origin. Carrying the maximum
feasible origin timestamp forward makes the existence test exact: if
any chain completes in time, the max-origin chain does.

Execution shape: ONE hash exchange on the key — k-1 chained running
windows over the same (key, order) sort (Catalyst plans a single
Exchange + Sort; window i carries "latest origin ts of any completed
i-step prefix so far"), then a filter + aggregate. No self-joins: the
naive k-way join is k-1 shuffles of the full fact table and explodes
on hot keys; this is O(n log n) once.

Everything is integer epoch-millis arithmetic over built-ins, so the
SQL oracle replays it window-for-window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["sequence_matches"]


def sequence_matches(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    steps: list[Column],
    within_ms: int,
) -> DataFrame:
    """Per-key completed-sequence counts.

    ``steps`` are boolean step predicates in pattern order (length >=
    2). ``order_col`` breaks timestamp ties deterministically. Returns
    ``(key, n_matches, first_match_ms, last_match_ms)`` for keys with
    at least one completion, where a completion is counted at every
    final-step row whose best chain satisfies the bound."""
    if len(steps) < 2:
        raise ValueError("a sequence needs at least 2 steps")
    key = F.col(f"`{key_col}`")
    ts_ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(F.col("__k"))
        .orderBy(F.col(ts_col), F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cur = df.select(
        key.alias("__k"),
        F.col(ts_col),
        F.col(order_col),
        ts_ms.alias("__ts"),
        *[steps[i].alias(f"__s{i}") for i in range(len(steps))],
    )
    # chain[i]: latest origin (step-0) epoch-ms of any i+1-step prefix
    # completed STRICTLY BEFORE the current row
    chain = F.max(F.when(F.col("__s0"), F.col("__ts"))).over(w)
    for i in range(1, len(steps) - 1):
        cur = cur.withColumn(f"__c{i-1}", chain)
        chain = F.max(
            F.when(
                F.col(f"__s{i}") & F.col(f"__c{i-1}").isNotNull(),
                F.col(f"__c{i-1}"),
            )
        ).over(w)
    last = len(steps) - 1
    cur = cur.withColumn(f"__c{last-1}", chain)
    hit = (
        F.col(f"__s{last}")
        & F.col(f"__c{last-1}").isNotNull()
        & (F.col("__ts") - F.col(f"__c{last-1}") <= within_ms)
    )
    return (
        cur.filter(hit)
        .groupBy(F.col("__k").alias(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("__ts").alias("first_match_ms"),
            F.max("__ts").alias("last_match_ms"),
        )
    )
