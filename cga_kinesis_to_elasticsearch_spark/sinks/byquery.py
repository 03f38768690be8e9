"""ES ``_delete_by_query`` / ``_update_by_query`` over the
day-partitioned parquet sink: the request BODY's query compiles
through operators/querydsl.compile_query and drives a
touched-partition-only rewrite under the `_swap.py` crash-safe
protocol — the lake twins of the REST APIs the reference's users run
against the shipped indices (main.go sink wiring).

``delete_by_query`` delegates to sinks/forget.forget (same predicate,
same swap protocol, same idempotence).

``update_by_query`` applies an ES ingest-processor chain
(operators/ingest.compile_pipeline) to MATCHING rows only, as ONE
conditional projection per touched partition::

    SELECT CASE WHEN <query> THEN <updated expr> ELSE col END ...

so unmatched rows pass through byte-identical, the partition is
rewritten once, and readers never see a partial state. Columnar
honesty: the processor chain must preserve the table schema (update
existing fields; no adds/drops/renames — ES mutates free-form JSON,
a parquet lake cannot), and ``grok`` processors are rejected (their
staged projection cannot be made row-conditional); both fail at PLAN
time.

Scale shape: identical to forget — ONE match-scan job grouped by the
partition column finds touched partitions (payload columns unread),
then ONE partition-pruned rewrite job covers every touched partition
(no shuffle; parallelism tracks input splits), promoted per partition
through the swap. Untouched partitions are never read twice.
Idempotence differs by design: delete is naturally idempotent;
update re-applies (ES's update_by_query also re-executes on retry —
use version-style guards in the processor chain when that matters).
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import SparkSession, functions as F

from ..operators.ingest import compile_pipeline
from ..operators.querydsl import compile_query
from ._swap import promote_staged, recover_and_sweep
from .forget import (
    ForgetStats,
    forget,
    raw_partition_values,
    touched_values_predicate,
)

__all__ = ["delete_by_query", "update_by_query", "UpdateStats"]


def delete_by_query(
    spark: SparkSession,
    data_root: str | Path,
    body: dict,
    partition_prefix: str = "es_index=",
    id_col: str = "doc_id",
) -> ForgetStats:
    """ES ``_delete_by_query``: remove every document matching the
    request body's ``query`` (full query-DSL support, plan-time
    validation) by rewriting only the partitions that contain
    matches."""
    if not isinstance(body, dict) or "query" not in body:
        raise ValueError(f"_delete_by_query needs a query: {body}")
    pred = compile_query(body["query"], id_col=id_col)
    return forget(
        spark, data_root, pred, partition_prefix=partition_prefix
    )


@dataclass
class UpdateStats:
    partitions_scanned: int = 0
    partitions_rewritten: int = 0
    rows_updated: int = 0
    rows_untouched: int = 0


def update_by_query(
    spark: SparkSession,
    data_root: str | Path,
    body: dict,
    processors: list[dict],
    partition_prefix: str = "es_index=",
    id_col: str = "doc_id",
) -> UpdateStats:
    """ES ``_update_by_query`` with an ingest-processor script: rows
    matching the body's ``query`` pass through the compiled processor
    chain, everything else is byte-identical; only touched partitions
    rewrite (crash-safe swap). The chain must preserve the schema and
    may not contain ``grok`` (plan-time errors)."""
    if not isinstance(body, dict) or "query" not in body:
        raise ValueError(f"_update_by_query needs a query: {body}")
    if any(len(p) == 1 and next(iter(p)) == "grok" for p in processors):
        raise ValueError(
            "_update_by_query: grok processors are not row-conditional"
        )
    pred = F.coalesce(
        compile_query(body["query"], id_col=id_col), F.lit(False)
    )
    root = Path(data_root)
    stats = UpdateStats()
    if not root.exists():
        return stats
    recover_and_sweep(root)
    if not any(
        d.is_dir() and d.name.startswith(partition_prefix)
        for d in root.iterdir()
    ):
        return stats
    part_col = partition_prefix.rstrip("=")
    # same two-job shape as forget: ONE match-scan grouped by the
    # partition column, then ONE conditional-projection rewrite over
    # every touched partition (partition-pruned scan, no shuffle),
    # promoted per partition through the crash-safe swap
    # Partition-type inference off for the whole rewrite so collected
    # partition values are the exact directory strings; promotion then
    # matches the dir names Spark actually wrote (escaping-safe) and
    # an update can never legitimately stage nothing for a touched
    # partition (rows are rewritten, not dropped), so every value maps
    # to may_be_empty=False and a missing staged dir raises.
    with raw_partition_values(spark):
        df = spark.read.parquet(str(root))
        data_cols = [c for c in df.columns if c != part_col]
        cols = compile_pipeline(data_cols, processors)
        if list(cols) != data_cols:
            raise ValueError(
                "_update_by_query must preserve the table schema: "
                f"{data_cols} -> {list(cols)}"
            )
        counts = df.groupBy(part_col).agg(
            F.count(F.lit(1)).alias("__n_total"),
            F.sum(F.when(pred, 1).otherwise(0)).alias("__n_match"),
        ).collect()
        stats.partitions_scanned = len(counts)
        touched = [r for r in counts if int(r["__n_match"] or 0) > 0]
        if not touched:
            return stats
        for r in touched:
            stats.rows_updated += int(r["__n_match"])
            stats.rows_untouched += (
                int(r["__n_total"]) - int(r["__n_match"])
            )
        stats.partitions_rewritten = len(touched)
        vals = [r[part_col] for r in touched]
        updated = df.filter(
            touched_values_predicate(part_col, vals)
        ).select(
            *[
                F.when(pred, expr)
                .otherwise(F.col(f"`{name}`"))
                .alias(name)
                for name, expr in cols.items()
            ],
            F.col(f"`{part_col}`"),
        )
        tmp_root = root / ".tmp-rewrite"
        shutil.rmtree(tmp_root, ignore_errors=True)
        updated.write.partitionBy(part_col).mode("overwrite").parquet(
            str(tmp_root)
        )
        for marker in tmp_root.glob("_*"):
            marker.unlink()
        promote_staged(
            root, tmp_root, part_col, {v: False for v in vals}
        )
        shutil.rmtree(tmp_root, ignore_errors=True)
        return stats
