"""Persistent cross-batch NEAR-dup index: the fuzzy companion of
``sinks/dedupindex.py``.

The exact index stores one md5 per document; this index stores each
surviving document's MinHash **LSH band keys** — a new document is
dropped iff ANY of its bands collides with an earlier survivor (the
standard first-writer-wins bucket rule production LSH dedup services
use: greedy, order-dependent within the id order, no pair verification
— tune bands/band_size for the intended similarity threshold).

Decision rule per document, per batch:

    survive  iff  for EVERY band (band_id, band_key) of the doc:
                  coalesce(stored_first_id, min batch id on that band)
                  == own id

Replay safety under at-least-once delivery mirrors the exact index:
bands are stored with their survivor's id, so a replayed batch finds
its own ids in the index and reproduces its original survivors —
appends only, no transactions. Chained semantics are greedy: if B was
dropped for colliding with A, a later C colliding only with B's bands
is still dropped (B's bands belong to nobody, but within B's batch B
was the band winner) — deterministic, and exactly replayable in SQL,
which is what the ``neardup_index_batches`` oracle does.

Scale posture: the index holds #bands rows per surviving doc (ids and
short hex keys — never text); the membership join shuffles (band_key,
id) pairs; the directory is key-prefix-partitioned so lookups prune to
matching buckets and ``sinks/compact.py`` handles the append
small-files.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.dedup import lsh_band_keys, minhash_signatures

__all__ = ["neardup_against_index", "read_neardup_index"]


def read_neardup_index(
    spark: SparkSession, index_root: str | Path, id_type: str = "long"
) -> DataFrame:
    root = Path(index_root)
    # no parquet DATA files == empty (a no-op append leaves only a
    # _SUCCESS marker, which must not trigger schema inference)
    if not root.exists() or not any(root.rglob("*.parquet")):
        return spark.createDataFrame(
            [], f"band_id int, band_key string, first_id {id_type}"
        )
    return spark.read.parquet(str(root)).select(
        "band_id", "band_key", "first_id"
    )


def neardup_against_index(
    spark: SparkSession,
    batch: DataFrame,
    index_root: str | Path,
    text_col: str,
    id_col: str,
    n_hashes: int = 4,
    band_size: int = 2,
) -> DataFrame:
    """Filter ``batch`` to near-dup survivors (against all earlier
    batches AND within this batch) and register the survivors' bands.
    Returns the surviving rows of ``batch``."""
    root = Path(index_root)
    root.mkdir(parents=True, exist_ok=True)
    # NULL-text rows have no signature identity: they pass through
    # unindexed (same contract as the exact index's NULL split) instead
    # of all colliding on a NULL-derived band key.
    no_content = batch.filter(F.col(text_col).isNull())
    batch = batch.filter(F.col(text_col).isNotNull())
    sig = minhash_signatures(batch, text_col, id_col, n_hashes=n_hashes)
    bands = lsh_band_keys(sig, n_hashes, band_size)  # (id, band_id, band_key)
    idx = read_neardup_index(spark, root, id_type=dict(batch.dtypes)[id_col])
    winners = bands.groupBy("band_id", "band_key").agg(
        F.min(id_col).alias("__batch_first")
    )
    effective = (
        bands.join(winners, ["band_id", "band_key"])
        .join(idx, ["band_id", "band_key"], "left")
        .select(
            id_col,
            "band_id",
            "band_key",
            F.coalesce("first_id", F.col("__batch_first")).alias("__eff"),
            F.col("first_id").isNull().alias("__fresh"),
        )
    )
    verdict = effective.groupBy(id_col).agg(
        F.bool_and(F.col("__eff") == F.col(id_col)).alias("__keep")
    )
    survivors = batch.join(
        verdict.filter("__keep").select(id_col), id_col, "left_semi"
    )
    fresh_bands = (
        effective.filter("__fresh")
        .join(verdict.filter("__keep").select(id_col), id_col, "left_semi")
        .select(
            "band_id",
            "band_key",
            F.col(id_col).alias("first_id"),
            F.substring("band_key", 1, 2).alias("bucket"),
        )
        .distinct()
    )
    fresh_bands.write.mode("append").partitionBy("bucket").parquet(str(root))
    return survivors.unionByName(no_content)
