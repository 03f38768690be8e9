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
2. ONE distributed filter job rewrites every affected partition
   (partition pruning keeps untouched days unread; no extra shuffle,
   so parallelism tracks the input splits), staged under
   ``.tmp-rewrite`` and promoted per partition through the swap
   protocol (readers never see a partial partition; a crash at any
   step is repaired by `recover_and_sweep` — an interrupted staged
   write is a `.tmp-*` dir it drops);
3. untouched partitions are never read twice nor rewritten — cost is
   bounded by the data that actually contains the targets.

Deletion is idempotent: re-running the same request is a no-op (the
match scan finds nothing), so the job composes with at-least-once
schedulers. Output files per partition track the input layout (the
rewrite adds no shuffle); sinks/compact.py re-buckets if a lake needs
pinned file counts.

Composition with the cross-batch dedup index (sinks/dedupindex.py):
forgetting a document does NOT automatically purge its content hash —
a deployment that must allow the same content to re-ingest runs forget
AGAIN over the index directory, keyed on the forgotten ids::

    forget(spark, index_root, F.col("first_id").isin(ids),
           partition_prefix="bucket=")

— the index is itself a partitioned table under this same protocol.
"""

from __future__ import annotations

import shutil
from contextlib import contextmanager
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ._swap import promote_staged, recover_and_sweep

__all__ = [
    "ForgetStats",
    "forget",
    "raw_partition_values",
    "touched_values_predicate",
]


def touched_values_predicate(part_col: str, vals: list) -> Column:
    """Partition-pruning predicate selecting exactly the collected
    partition values, NULL included: ``isin`` alone never matches a
    NULL value (SQL three-valued logic), so a touched
    ``__HIVE_DEFAULT_PARTITION__`` partition would stage nothing and
    the promote step would abort the whole rewrite."""
    non_null = [v for v in vals if v is not None]
    cond = (
        F.col(part_col).isin(non_null) if non_null else F.lit(False)
    )
    if len(non_null) != len(vals):
        cond = cond | F.col(part_col).isNull()
    return cond


@contextmanager
def raw_partition_values(spark: SparkSession):
    """Scope a read so partition VALUES stay the exact (unescaped)
    strings from the directory names: partition-type inference would
    normalize values ('es_index=0123' -> int 123) and break the
    collected-value <-> staged-dir matching the rewrite protocol
    depends on. Scoped-and-restored like the SPARK-35703 conf."""
    key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


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
    if not any(
        d.is_dir() and d.name.startswith(partition_prefix)
        for d in root.iterdir()
    ):
        return stats
    # Three-valued logic guard: a predicate that evaluates to NULL
    # (e.g. a comparison on a NULL enrichment column) must mean KEEP,
    # not delete — bare `~predicate` filters those rows out silently.
    hit = F.coalesce(predicate, F.lit(False))
    part_col = partition_prefix.rstrip("=")
    # ONE match-scan job over the whole table (grouped by the
    # partition column) replaces a per-partition agg loop — at 30
    # daily partitions that is 30x fewer jobs, and the scan still
    # reads only the predicate's columns. Partition-type inference is
    # disabled for the whole rewrite so collected values are the exact
    # directory strings (see raw_partition_values).
    with raw_partition_values(spark):
        df = spark.read.parquet(str(root))
        counts = df.groupBy(part_col).agg(
            F.count(F.lit(1)).alias("__n_total"),
            F.sum(F.when(hit, 1).otherwise(0)).alias("__n_match"),
        ).collect()  # one row per partition
        stats.partitions_scanned = len(counts)
        touched = [r for r in counts if int(r["__n_match"] or 0) > 0]
        if not touched:
            return stats
        for r in touched:
            stats.rows_deleted += int(r["__n_match"])
            stats.rows_kept += int(r["__n_total"]) - int(r["__n_match"])
        stats.partitions_rewritten = len(touched)
        vals = [r[part_col] for r in touched]
        # ONE partitioned rewrite job for every touched partition: the
        # partition filter prunes untouched days at the scan, no extra
        # shuffle (parallelism = input splits, output files per
        # partition track the input layout), then each partition dir is
        # promoted through the same crash-safe swap. An interrupted
        # batched write leaves only `.tmp-*` dirs, which
        # recover_and_sweep drops. Promotion matches the dir names
        # Spark ACTUALLY wrote (escaping-safe) and only swaps in an
        # empty dir when the match scan counted the WHOLE partition as
        # deleted — any other staged/touched mismatch raises.
        tmp_root = root / ".tmp-rewrite"
        shutil.rmtree(tmp_root, ignore_errors=True)
        (
            df.filter(touched_values_predicate(part_col, vals))
            .filter(~hit)
            .write.partitionBy(part_col)
            .mode("overwrite")
            .parquet(str(tmp_root))
        )
        for marker in tmp_root.glob("_*"):
            marker.unlink()
        promote_staged(
            root,
            tmp_root,
            part_col,
            {
                r[part_col]: int(r["__n_match"]) == int(r["__n_total"])
                for r in touched
            },
        )
        shutil.rmtree(tmp_root, ignore_errors=True)
        return stats
