"""Persistent cross-batch exact-dedup index: a stored
``(content_hash, first_id)`` table that lets each new micro-batch /
ingest increment drop documents already seen in ANY earlier batch —
the incremental companion of the one-shot ``dedup.exact_dedup`` (which
rescans the corpus) and of the bounded-state streaming dedup (whose
watermark forgets; this index never does).

Replay safety under at-least-once delivery comes from storing the
FIRST-SEEN id with each hash: a row survives the filter iff its hash
is unseen OR the stored first_id is its own id. Replaying a batch
therefore reproduces exactly its original survivors instead of
dropping them as "duplicates" of themselves — no transactional write
needed, appends are enough.

Scale posture: the index holds one 32-hex-char hash + one id per
distinct document — orders of magnitude smaller than the corpus. The
membership join is hash-keyed (shuffle moves (hash, id) pairs, never
text); the index directory is hash-prefix-partitioned so the join
prunes to matching buckets and appends spread evenly, and the
small-files it accretes are exactly what ``sinks/compact.py`` is for
(``partition_prefix="bucket="``).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["dedup_against_index", "read_index"]


def read_index(
    spark: SparkSession, index_root: str | Path, id_type: str = "long"
) -> DataFrame:
    """``id_type`` types the empty frame before the first append (the
    stored parquet carries its own type thereafter)."""
    root = Path(index_root)
    # no parquet DATA files == empty (a no-op append leaves only a
    # _SUCCESS marker, which must not trigger schema inference)
    if not root.exists() or not any(root.rglob("*.parquet")):
        return spark.createDataFrame(
            [], f"content_hash string, first_id {id_type}"
        )
    return spark.read.parquet(str(root)).select("content_hash", "first_id")


def dedup_against_index(
    spark: SparkSession,
    batch: DataFrame,
    index_root: str | Path,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Filter ``batch`` to first-seen documents (across ALL batches so
    far and within this batch, smallest id wins) and register their
    hashes. Returns the surviving rows of ``batch``."""
    root = Path(index_root)
    root.mkdir(parents=True, exist_ok=True)
    hashed = batch.withColumn("content_hash", F.md5(F.col(text_col)))
    # Rows with NULL content have no identity to dedup on: they pass
    # through untouched and are never indexed. Without this split the
    # equi-join below would silently DROP them (NULL keys never match).
    no_content = hashed.filter(F.col("content_hash").isNull()).drop(
        "content_hash"
    )
    hashed = hashed.filter(F.col("content_hash").isNotNull())
    idx = read_index(spark, root, id_type=dict(batch.dtypes)[id_col])
    # within-batch keep-first, then resolve against the stored index
    firsts = (
        hashed.groupBy("content_hash")
        .agg(F.min(id_col).alias("__batch_first"))
        .join(idx, "content_hash", "left")
        .select(
            "content_hash",
            F.coalesce("first_id", F.col("__batch_first")).alias("__winner"),
            F.col("first_id").isNull().alias("__fresh"),
        )
    )
    survivors = hashed.join(firsts, "content_hash").filter(
        F.col(id_col) == F.col("__winner")
    )
    fresh = firsts.filter("__fresh").select(
        "content_hash",
        F.col("__winner").alias("first_id"),
        F.substring("content_hash", 1, 2).alias("bucket"),
    )
    fresh.write.mode("append").partitionBy("bucket").parquet(str(root))
    survivors = survivors.drop(
        "content_hash", "__winner", "__fresh", "__batch_first"
    )
    return survivors.unionByName(no_content)
