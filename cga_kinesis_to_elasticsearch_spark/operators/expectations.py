"""Declarative data-quality expectations (Deequ/Great-Expectations
shape, Spark-first): a constraint suite evaluated against a table in
as few passes as the constraint mix allows, returning one row per
expectation with its measured metric and pass/fail.

Complements `operators/profile.py` (which DESCRIBES a table; this
VERIFIES one): a log/ETL pipeline gates loads on "o_custkey never
null, o_orderkey unique, status in {O,F,P}, every order's customer
exists" — exactly the checks the reference implicitly trusts its
upstream for (and silently corrupts on when they fail, e.g. the
missing-dimension tolerance J3).

Execution shape:

- All ROW-LEVEL constraints (not_null / in_set / in_range / matches)
  compile to conditional sums in ONE map-side-combined aggregate over
  a single scan, regardless of how many there are.
- `unique` adds exact distinct counts (count_distinct in the same
  Aggregate; Catalyst plans one Expand — still one scan).
- `foreign_key` requires the referenced table: one left-anti-join
  count per FK, joining KEYS only (broadcast when the dim is small).

Metrics are fractions in [0, 1] computed as exact integer-count
divisions (identical expression both engines — hash-comparable), and
``passed`` compares against the spec's threshold.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "Expectation",
    "not_null",
    "unique",
    "in_set",
    "in_range",
    "matches",
    "foreign_key",
    "check_expectations",
]


@dataclass
class Expectation:
    name: str
    kind: str
    col: str
    threshold: float = 1.0
    params: dict[str, Any] = field(default_factory=dict)
    ref: DataFrame | None = None
    ref_col: str = ""


def not_null(col: str, threshold: float = 1.0) -> Expectation:
    return Expectation(f"not_null({col})", "not_null", col, threshold)


def unique(col: str, threshold: float = 1.0) -> Expectation:
    return Expectation(f"unique({col})", "unique", col, threshold)


def in_set(col: str, values: list, threshold: float = 1.0) -> Expectation:
    return Expectation(
        f"in_set({col})", "in_set", col, threshold, {"values": list(values)}
    )


def in_range(
    col: str, lo: float, hi: float, threshold: float = 1.0
) -> Expectation:
    return Expectation(
        f"in_range({col})", "in_range", col, threshold, {"lo": lo, "hi": hi}
    )


def matches(col: str, pattern: str, threshold: float = 1.0) -> Expectation:
    return Expectation(
        f"matches({col})", "matches", col, threshold, {"pattern": pattern}
    )


def foreign_key(
    col: str, ref: DataFrame, ref_col: str, threshold: float = 1.0
) -> Expectation:
    e = Expectation(f"foreign_key({col})", "foreign_key", col, threshold)
    e.ref, e.ref_col = ref, ref_col
    return e


def _row_condition(e: Expectation) -> Column:
    c = F.col(f"`{e.col}`")
    if e.kind == "not_null":
        return c.isNotNull()
    if e.kind == "in_set":
        return c.isin(e.params["values"])
    if e.kind == "in_range":
        return c.isNotNull() & (c >= e.params["lo"]) & (c <= e.params["hi"])
    if e.kind == "matches":
        return c.isNotNull() & c.rlike(e.params["pattern"])
    raise ValueError(f"not a row-level expectation: {e.kind}")


def check_expectations(
    df: DataFrame, specs: list[Expectation]
) -> DataFrame:
    """Evaluate the suite; returns
    ``(expectation STRING, metric DOUBLE, threshold DOUBLE,
    passed BOOLEAN)`` — metric is the satisfied-row fraction (row
    kinds), distinct/total (unique), or referenced fraction (FK)."""
    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, e in enumerate(specs):
        if e.kind in ("not_null", "in_set", "in_range", "matches"):
            aggs.append(
                F.sum(_row_condition(e).cast("long")).alias(f"__ok{i}")
            )
        elif e.kind == "unique":
            aggs.append(
                F.count_distinct(F.col(f"`{e.col}`")).alias(f"__ok{i}")
            )
        elif e.kind == "foreign_key":
            pass  # joined below
        else:
            raise ValueError(f"unknown expectation kind: {e.kind}")
    counted = df.agg(*aggs)

    # one-row agg -> one exploded row per non-FK expectation: a UNION
    # of per-expectation selects over `counted` would re-evaluate the
    # scan once per branch; the array-explode keeps it ONE pass
    def _entry(name: str, raw, threshold: float):
        # `passed` compares the UNROUNDED metric: rounding to 6 digits
        # would let violation rates under ~5e-7 slip a threshold=1.0
        # gate (one bad row in 2M rounds to 1.0) — exactly the rows a
        # DQ gate exists to catch. The rounded metric is for display /
        # cross-engine hashing only.
        return F.struct(
            F.lit(name).alias("expectation"),
            F.round(raw, 6).alias("metric"),
            F.lit(float(threshold)).alias("threshold"),
            (raw >= F.lit(float(threshold))).alias("passed"),
        )

    entries = [
        _entry(
            e.name,
            F.when(F.col("__total") == 0, F.lit(1.0)).otherwise(
                F.col(f"__ok{i}").cast("double") / F.col("__total")
            ),
            e.threshold,
        )
        for i, e in enumerate(specs)
        if e.kind != "foreign_key"
    ]
    out: DataFrame | None = None
    if entries:
        out = counted.select(
            F.explode(F.array(*entries)).alias("e")
        ).select("e.expectation", "e.metric", "e.threshold", "e.passed")
    for e in specs:
        if e.kind != "foreign_key":
            continue
        keys = df.select(F.col(f"`{e.col}`").alias("__k")).filter(
            F.col("__k").isNotNull()
        )
        ref_keys = e.ref.select(
            F.col(f"`{e.ref_col}`").alias("__k"), F.lit(1).alias("__hit")
        ).dropDuplicates(["__k"])
        # one pass: left join (Catalyst/AQE picks broadcast when the
        # dim fits — not forced, so a huge referenced table degrades to
        # a shuffle join instead of OOMing the driver) + one aggregate
        # for both the total and the orphan count
        joined = keys.join(ref_keys, "__k", "left")
        row = joined.agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(
                F.when(F.col("__hit").isNull(), 1).otherwise(0)
            ).alias("__bad"),
        ).select(
            _entry(
                e.name,
                F.when(F.col("__n") == 0, F.lit(1.0)).otherwise(
                    (F.col("__n") - F.col("__bad")).cast("double")
                    / F.col("__n")
                ),
                e.threshold,
            ).alias("e")
        ).select("e.expectation", "e.metric", "e.threshold", "e.passed")
        out = row if out is None else out.unionByName(row)
    assert out is not None, "empty expectation suite"
    return out
