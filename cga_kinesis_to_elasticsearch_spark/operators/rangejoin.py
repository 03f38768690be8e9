"""Range (interval) join: match each point row to the interval rows
that contain it.

A naive ``point >= start AND point <= end`` join compiles to
BroadcastNestedLoopJoin (or a cross product under SMJ) — quadratic and
cluster-killing at scale. The scalable formulation here is **bucketed
range join**: quantize time into fixed-width bins, explode each
interval to the bins it overlaps, tag each point with its bin, then
equi-join on (key, bin) and re-apply the exact predicate. The
equi-join hash-partitions both sides, so cost is
O(points + intervals x avg_bins + true matches) — the pair blow-up is
bounded by bin width, a tunable. (Databricks' range-join optimization
and Flink's interval join use the same binning idea.)

Bin width trade-off: wider bins = fewer explode rows but more false
candidates filtered post-join; set it near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["range_join"]


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    key: str | None = None,
    bin_width: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """points ⋈ intervals on containment (inclusive both ends), all
    columns from both sides.

    Numeric columns (epoch seconds/millis — caller picks the unit and a
    matching ``bin_width``). ``key``: optional extra equi-key (the
    per-entity case); without it the join fans out purely by bin.
    ``how``: 'inner' or 'left' (points with no interval survive with
    NULL interval columns).
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    p_bin = (F.col(point_col) / bin_width).cast("long").alias("__bin")
    i_bins = F.sequence(
        (F.col(start_col) / bin_width).cast("long"),
        (F.col(end_col) / bin_width).cast("long"),
    ).alias("__bins")

    p = points.withColumn("__bin", (F.col(point_col) / bin_width).cast("long"))
    i = intervals.select("*", F.explode(i_bins).alias("__bin"))

    on = [p["__bin"] == i["__bin"]]
    if key:
        on.append(p[key] == i[key])
    contained = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) <= F.col(end_col)
    )

    joined = p.join(i, on[0] if len(on) == 1 else (on[0] & on[1]), "inner").filter(
        contained
    )
    i_cols = [c for c in intervals.columns if not (key and c == key)]
    out = joined.select(
        *[p[c] for c in points.columns],
        *[i[c] for c in i_cols],
    )
    if how == "inner":
        return out
    # left: restore points that matched nothing
    matched_keys = out.select(*[F.col(c) for c in points.columns]).distinct()
    unmatched = points.join(matched_keys, points.columns, "left_anti")
    for c in i_cols:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(dict(intervals.dtypes)[c])
        )
    return out.unionByName(unmatched)
