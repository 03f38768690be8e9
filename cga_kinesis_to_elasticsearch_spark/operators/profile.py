"""Single-pass table profiling (data-quality stage).

Per column: row count, null count, distinct count, min/max — the
pre-flight report a training-data pipeline runs before trusting a new
drop of 100 TB, and the freshness check it runs after every load.

Scale shape: ONE aggregation job over ONE scan of the table, whatever
the column count — all statistics are map-side-combinable partial aggs
fused into a single physical Aggregate; the result is one driver row
exploded into long format (per-column rows) with zero further shuffle.

Distinct counts have two modes:

- ``exact=False`` (default, the 100 TB path):
  ``approx_count_distinct`` (HyperLogLog++) — no Expand, the scan stays
  one pass with constant per-column state.
- ``exact=True``: exact distinct via Spark's Expand strategy — the
  input is replicated once per profiled column, which is exactly the
  cost the approx mode exists to avoid; used by the declared query so
  the DuckDB oracle can hash-compare.

Min/max serialize to strings so one long-format schema covers every
column type. Doubles go through DECIMAL(38,6) first: Java's
Double.toString uses scientific notation where DuckDB/Python do not,
so raw double->string is NOT cross-engine stable but fixed-scale
decimal rendering is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["profile_table"]

_NUMERIC = {"double", "float"}


def _minmax_str(col: Column, type_name: str) -> tuple[Column, Column]:
    if type_name in _NUMERIC:
        return (
            F.min(col).cast("decimal(38,6)").cast("string"),
            F.max(col).cast("decimal(38,6)").cast("string"),
        )
    return F.min(col).cast("string"), F.max(col).cast("string")


def profile_table(
    df: DataFrame, columns: list[str] | None = None, exact: bool = False
) -> DataFrame:
    """-> (column STRING, n_rows LONG, n_nulls LONG, n_distinct LONG,
    min_value STRING, max_value STRING), one row per profiled column,
    ordered by column name (deterministic output)."""
    cols = columns if columns is not None else df.columns
    distinct = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        type_name = dict(df.dtypes)[c]
        mn, mx = _minmax_str(F.col(c), type_name)
        aggs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_nulls"),
                distinct(c).cast("long").alias("n_distinct"),
                mn.alias("min_value"),
                mx.alias("max_value"),
            ).alias(f"__p_{c}")
        )
    one = df.agg(*aggs)
    stats = F.array(*[F.col(f"__p_{c}") for c in cols])
    return (
        one.select(F.col("__n"), F.explode(stats).alias("s"))
        .select(
            F.col("s.column").alias("column"),
            F.col("__n").cast("long").alias("n_rows"),
            "s.n_nulls",
            "s.n_distinct",
            "s.min_value",
            "s.max_value",
        )
        .orderBy("column")
    )
