"""Targeted deletion ("right to be forgotten") over the
day-partitioned sink: remove every document matching a predicate
(e.g. a user/app id list) by rewriting ONLY the partitions that
contain matches, atomically, via the `_swap.py` crash-safe protocol.

The ES-backed equivalent is delete-by-query; on a parquet lake the
unit of rewrite is the partition file set. Shape chosen for scale:

1. a metadata-cheap MATCH SCAN finds the partitions that actually
   contain targets (predicate + partition column only — column
   pruning keeps payload bytes unread, and at 100 TB parquet
   row-group stats + the compaction job's `cluster_by` ordering skip
   most files outright);
2. each affected partition is rewritten by a distributed filter job
   into `.tmp-<part>` and swapped in (readers never see a partial
   partition; a crash at any step is repaired by `recover_and_sweep`,
   and the swapped-out dir holds the pre-delete data until the new
   content is fully in place);
3. untouched partitions are never read twice nor rewritten — cost is
   bounded by the data that actually contains the targets.

Deletion is idempotent: re-running the same request is a no-op (the
match scan finds nothing), so the job composes with at-least-once
schedulers. Deterministic file counts: the rewrite preserves the
partition's file count unless it would exceed the surviving rows.

Composition with the cross-batch dedup index (sinks/dedupindex.py):
forgetting a document does NOT automatically purge its content hash —
a deployment that must allow the same content to re-ingest runs forget
AGAIN over the index directory, keyed on the forgotten ids::

    forget(spark, index_root, F.col("first_id").isin(ids),
           partition_prefix="bucket=")

— the index is itself a partitioned table under this same protocol.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ._swap import part_paths, recover_and_sweep, swap_in

__all__ = ["ForgetStats", "forget"]


@dataclass
class ForgetStats:
    partitions_scanned: int = 0
    partitions_rewritten: int = 0
    rows_deleted: int = 0
    rows_kept: int = 0


def forget(
    spark: SparkSession,
    data_root: str | Path,
    predicate: Column,
    partition_prefix: str = "es_index=",
) -> ForgetStats:
    """Delete every row matching ``predicate`` from the partitioned
    table under ``data_root``. Returns per-run stats."""
    root = Path(data_root)
    stats = ForgetStats()
    if not root.exists():
        return stats
    recover_and_sweep(root)
    # Three-valued logic guard: a predicate that evaluates to NULL
    # (e.g. a comparison on a NULL enrichment column) must mean KEEP,
    # not delete — bare `~predicate` filters those rows out silently.
    hit = F.coalesce(predicate, F.lit(False))
    parts = [
        d
        for d in sorted(root.iterdir())
        if d.is_dir() and d.name.startswith(partition_prefix)
    ]
    stats.partitions_scanned = len(parts)
    for part_dir in parts:
        df = spark.read.parquet(str(part_dir))
        # one scan counts both sides; the rewrite below is the second
        # and last read of the partition
        row = df.agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(hit, 1).otherwise(0)).alias("n_match"),
        ).first()
        n_match = int(row.n_match or 0)
        if n_match == 0:
            continue
        survivors = df.filter(~hit)
        n_files = max(
            1, len([p for p in part_dir.glob("*.parquet") if p.is_file()])
        )
        _, tmp, _ = part_paths(root, part_dir.name)
        survivors.coalesce(n_files).write.mode("overwrite").parquet(str(tmp))
        for marker in tmp.glob("_*"):
            marker.unlink()
        swap_in(root, part_dir.name)
        stats.partitions_rewritten += 1
        stats.rows_deleted += n_match
        stats.rows_kept += int(row.n_total) - n_match
    return stats
