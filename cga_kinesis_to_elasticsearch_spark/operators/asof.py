"""As-of join: for each probe row, the latest event row with the same
key whose timestamp is <= the probe's timestamp.

Spark has no built-in as-of join (north star: custom operators Spark
lacks, expressed as a composition of existing DataFrame ops). The
naive formulations both fail at scale: an inequality theta-join
explodes to a per-key cross product, and a per-probe subquery is a
correlated scan. The scalable shape used here is the **union-sort
trick**: tag events and probes, union them, and run ONE window pass
per key ordered by time — `last(event_value, ignorenulls)` carries the
most recent event forward onto each probe row. Cost: one shuffle on
the key (both inputs together), one sort per partition — the same
complexity as any windowed aggregation, with no pair blow-up. Skewed
keys fall under the same salting/AQE remedies as any window.

DuckDB expresses the identical semantics natively (``ASOF JOIN``),
which is the declared query's oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["asof_join"]


def asof_join(
    probes: DataFrame,
    events: DataFrame,
    key: str,
    probe_ts: str,
    event_ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """probes + latest-event-at-or-before columns.

    Output: all probe columns + one ``asof_<c>`` per value column
    (NULL when no event precedes the probe). ``direction='forward'``
    gives earliest-at-or-after instead.

    Ties (event_ts == probe_ts): the event counts (<= / >=), matching
    DuckDB ASOF JOIN.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    e = events.select(
        F.col(key).alias("__k"),
        F.col(event_ts).alias("__t"),
        F.lit(0).alias("__side"),  # events sort before probes at equal ts
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    p = probes.select(
        "*",
        F.col(key).alias("__k"),
        F.col(probe_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).alias(f"__v_{c}") for c in value_cols],
    )
    # align schemas: events get NULL probe columns
    probe_cols = [c for c in probes.columns]
    e_aligned = e.select(
        *[F.lit(None).cast(dict(probes.dtypes)[c]).alias(c) for c in probe_cols],
        "__k",
        "__t",
        "__side",
        *[F.col(f"__v_{c}") for c in value_cols],
    )
    unioned = e_aligned.unionByName(p)

    if direction == "backward":
        w = (
            Window.partitionBy("__k")
            .orderBy(F.asc("__t"), F.asc("__side"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = {c: F.last(f"__v_{c}", ignorenulls=True).over(w) for c in value_cols}
    else:
        w = (
            Window.partitionBy("__k")
            # desc time scan; at equal ts the event must still be seen
            # before the probe (inclusive >=), so __side stays asc
            .orderBy(F.desc("__t"), F.asc("__side"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = {c: F.last(f"__v_{c}", ignorenulls=True).over(w) for c in value_cols}

    out = unioned.select(
        *probe_cols,
        F.col("__side"),
        *[expr.alias(f"asof_{c}") for c, expr in carried.items()],
    )
    return out.filter(F.col("__side") == 1).drop("__side")
