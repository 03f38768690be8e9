"""Range-clustered sorted export: the file layout for key-range reads.

A 100 TB table queried by key range (time-travel reads, backfills,
point-in-time joins) wants files whose key ranges are DISJOINT and
sorted: then a range predicate prunes whole files from the manifest
(or directory listing) before any I/O, and parquet row-group min/max
stats prune within the survivors — the same two-level skipping
Delta/Iceberg data-skipping indexes formalize.

Two boundary modes:

- **sampled** (production default, ``boundaries=None``):
  ``repartitionByRange`` — Spark's reservoir-sampled equi-depth range
  partitioner. Best file-size balance; placement depends on sampling,
  so it is not bit-reproducible across engines.
- **explicit** (``boundaries=[...]``): caller-supplied ascending cut
  points; rows land in file ``#{b : key > b}``. Deterministic and
  exactly replayable in SQL — the oracle path.
  ``fixed_width_boundaries`` derives cut points from one (min, max)
  aggregate with pure integer arithmetic (equal-width, not
  equal-depth: sizes skew with the key distribution, placement never
  does).

Either way every output file is sorted by (key, tiebreaks) and file
ranges are disjoint (duplicate keys always co-locate: assignment is a
function of the key). The manifest is computed by READING BACK the
landed files — a manifest/oracle match proves the on-disk layout, not
the plan.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

__all__ = [
    "fixed_width_boundaries",
    "assign_range_file",
    "export_range_clustered",
    "read_key_range",
]

_FILE_COL = "file_id"


def fixed_width_boundaries(
    df: DataFrame, key_col: Column, n_files: int
) -> list[int]:
    """``n_files - 1`` ascending integer cut points over ``key_col``'s
    [min, max] span: ``b_j = lo + (hi - lo) * j // n``. One tiny
    min/max aggregate (map-side combinable); all arithmetic is exact
    integer, so any engine derives identical boundaries."""
    row = df.select(
        F.min(key_col).cast("long").alias("lo"),
        F.max(key_col).cast("long").alias("hi"),
    ).collect()[0]
    lo, hi = row.lo, row.hi
    return [lo + (hi - lo) * j // n_files for j in range(1, n_files)]


def assign_range_file(key: Column, boundaries: list[int]) -> Column:
    """File index = number of boundaries strictly below ``key`` — a
    narrow O(n_files) expression, no shuffle. Keys equal to a boundary
    stay in the lower file, so file ranges are strictly disjoint."""
    out = F.lit(0)
    for b in boundaries:
        out = out + F.when(key > F.lit(b), 1).otherwise(0)
    return out.cast("int")


def export_range_clustered(
    spark: SparkSession,
    df: DataFrame,
    root: str | Path,
    key_col: str,
    n_files: int,
    tiebreaks: tuple[str, ...] = (),
    boundaries: list[int] | None = None,
) -> DataFrame:
    """Write ``df`` under ``root/data/file_id=K/`` with one sorted
    parquet file per range bucket, and return the read-back manifest
    ``(file_id INT, n_rows LONG, min_key LONG, max_key LONG)``.

    ``key_col`` must be integer-valued (cast timestamps to epoch
    micros first). With ``boundaries=None`` placement uses
    ``repartitionByRange`` (sampled); with explicit boundaries it is
    the deterministic ``assign_range_file`` expression.
    """
    root = Path(root)
    data = root / "data"
    key = F.col(key_col)
    if boundaries is None:
        # range-partition on the KEY ONLY: including tiebreaks would
        # let a boundary land between two rows of the same key, and
        # duplicate keys straddling files breaks the disjoint-extent
        # invariant; tiebreaks only order rows within each file
        ranged = df.repartitionByRange(n_files, key).withColumn(
            _FILE_COL, F.spark_partition_id()
        )
    else:
        if list(boundaries) != sorted(boundaries):
            raise ValueError("boundaries must be ascending")
        ranged = df.withColumn(
            _FILE_COL, assign_range_file(key, list(boundaries))
        ).repartition(n_files, F.col(_FILE_COL))
    (
        ranged.sortWithinPartitions(_FILE_COL, key_col, *tiebreaks)
        .write.mode("overwrite")
        .partitionBy(_FILE_COL)
        .parquet(str(data))
    )
    landed = spark.read.parquet(str(data))
    return (
        landed.groupBy(F.col(_FILE_COL).cast("long").alias(_FILE_COL))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min(key_col).cast("long").alias("min_key"),
            F.max(key_col).cast("long").alias("max_key"),
        )
        .orderBy(_FILE_COL)
    )


def read_key_range(
    spark: SparkSession,
    root: str | Path,
    lo: int,
    hi: int,
    key_col: str,
) -> tuple[DataFrame, list[int]]:
    """Range read with manifest pruning: list the landed ``file_id=K``
    partition dirs, keep only buckets whose [min_key, max_key] span
    intersects [lo, hi] (computed from each dir's parquet footers —
    metadata only), and scan just those directories. Returns
    ``(rows, pruned_file_ids)``; the residual ``key BETWEEN`` filter
    also reaches the parquet scan, so row-group stats on the sorted
    key prune within the surviving files."""
    import pyarrow.parquet as pq

    data = Path(root) / "data"
    keep, pruned = [], []
    for part in sorted(data.glob(f"{_FILE_COL}=*")):
        fid = int(part.name.split("=", 1)[1])
        mins, maxs = [], []
        for f in part.glob("*.parquet"):
            md = pq.read_metadata(f)
            names = md.schema.names
            ki = names.index(key_col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ki).statistics
                mins.append(st.min)
                maxs.append(st.max)
        if mins and not (max(maxs) < lo or min(mins) > hi):
            keep.append(str(part))
        else:
            pruned.append(fid)
    if not keep:
        empty = spark.read.parquet(str(data)).filter(F.lit(False))
        return empty, pruned
    rows = (
        spark.read.option("basePath", str(data))
        .parquet(*keep)
        .filter(F.col(key_col).between(lo, hi))
    )
    return rows, pruned
