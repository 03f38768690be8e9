"""Deterministic sharded export for training-data delivery.

The last stage of a corpus pipeline: ship the curated documents as N
stable shards with a verifiable manifest. Properties that matter at
100 TB:

- **Deterministic placement**: shard = md5(seed:id) mod N — a pure
  column expression, so re-running the export (or resuming after a
  crash) puts every row in the same shard; no RNG, no
  per-partition state, and any engine (including the DuckDB oracle)
  can replay the assignment.
- **One exchange**: the only shuffle is the repartition on the shard
  key; partitionBy then writes one file per shard directory.
- **Manifest from the FILES, not the plan**: after the write, the data
  is read back and the manifest (row count + order-free content
  checksum per shard) is computed from what actually landed on disk —
  a truncated or double-written shard shows up as a checksum mismatch
  against the source-side expectation, not as silent corruption.
- **Order-free checksum**: sum of per-row 32-bit md5 prefixes. Row
  order inside a shard is not part of the contract (readers shuffle
  anyway), so the checksum must not depend on it; a sum of bounded
  row hashes is associative, overflow-free for any realistic shard
  (2^31 rows of 2^32 max each < 2^63), and exactly reproducible in
  SQL on both engines.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

__all__ = [
    "shard_of",
    "row_checksum",
    "export_shards",
    "export_jsonl_shards",
    "read_manifest",
]


def shard_of(id_col: str, n_shards: int, seed: str = "shard") -> Column:
    """md5-based stable shard id in [0, n_shards)."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards
    ).cast("long")


def row_checksum(id_col: str, content_cols: list[str]) -> Column:
    """Order-free per-row content hash: 32-bit prefix of md5 over the
    ':'-joined canonical row representation."""
    canon = F.concat_ws(
        ":", F.col(id_col).cast("string"), *[F.col(c) for c in content_cols]
    )
    return F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("long")


def export_shards(
    spark: SparkSession,
    df: DataFrame,
    root: str | Path,
    n_shards: int,
    id_col: str,
    content_cols: list[str],
    seed: str = "shard",
) -> DataFrame:
    """Write ``df`` as ``root/data/shard=K/`` parquet plus
    ``root/manifest.json``; returns the manifest as a DataFrame
    ``(shard LONG, n_rows LONG, checksum LONG)`` computed from the
    files on disk (read-back), not from the input plan."""
    root = Path(root)
    data = root / "data"
    out = df.withColumn("shard", shard_of(id_col, n_shards, seed))
    (
        out.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(str(data))
    )
    landed = spark.read.parquet(str(data))
    manifest = (
        landed.groupBy(F.col("shard").cast("long").alias("shard"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(row_checksum(id_col, content_cols)).alias("checksum"),
        )
        .orderBy("shard")
    )
    rows = [r.asDict() for r in manifest.collect()]
    (root / "manifest.json").write_text(
        json.dumps(
            {"n_shards": n_shards, "seed": seed, "shards": rows}, indent=1
        )
    )
    return spark.createDataFrame(rows, "shard long, n_rows long, checksum long")


def read_manifest(root: str | Path) -> dict:
    return json.loads((Path(root) / "manifest.json").read_text())


def export_jsonl_shards(
    spark: SparkSession,
    df: DataFrame,
    root: str | Path,
    n_shards: int,
    id_col: str,
    content_cols: list[str],
    seed: str = "shard",
) -> DataFrame:
    """JSONL variant of export_shards — the delivery format most
    training loaders consume directly (one JSON object per line,
    gzip-compressed). Same deterministic md5 placement, same
    read-back manifest contract: counts and order-free checksums are
    computed from the LANDED .json.gz files, so the manifest certifies
    the text actually on disk (including that every value survived
    JSON serialization), not the input plan.

    Only ``id_col`` + ``content_cols`` are exported (JSONL is a
    delivery format, not a storage format — keep it lean); timestamps
    or other non-JSON-native types must be pre-rendered to strings by
    the caller, same as the CSV/JSONL source writers."""
    root = Path(root)
    data = root / "data"
    out = df.select(
        F.col(id_col), *[F.col(c) for c in content_cols]
    ).withColumn("shard", shard_of(id_col, n_shards, seed))
    (
        out.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .option("compression", "gzip")
        .json(str(data))
    )
    landed = spark.read.json(str(data)).select(
        "shard", F.col(id_col), *[F.col(c) for c in content_cols]
    )
    manifest = (
        landed.groupBy(F.col("shard").cast("long").alias("shard"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(row_checksum(id_col, content_cols)).alias("checksum"),
        )
        .orderBy("shard")
    )
    rows = [r.asDict() for r in manifest.collect()]
    (root / "manifest.json").write_text(
        json.dumps(
            {
                "n_shards": n_shards,
                "seed": seed,
                "format": "jsonl",
                "shards": rows,
            },
            indent=1,
        )
    )
    return spark.createDataFrame(rows, "shard long, n_rows long, checksum long")
