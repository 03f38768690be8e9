"""Persistent cross-batch exact-substring dedup index: a stored
``(gram_hash, owner_key)`` table that lets each new micro-batch /
ingest increment rewrite its documents against every w-token span
seen in ANY earlier batch — the incremental companion of the one-shot
``dedup.span_dedup`` (which rescans the corpus), completing the
maintained-dedup-state family (``dedupindex`` = exact doc level,
``neardupindex`` = near-dup doc level, this = substring level).

Replay safety under at-least-once delivery comes from storing the
FIRST-SEEN key ``(id * 2^31 + position)`` with each gram hash: on a
replayed batch, every gram the batch originally registered resolves
to its OWN key, so it is not a "duplicate of itself" and the rewrite
output is bit-identical to the original run — appends suffice, no
transactional write.

Equivalence contract (pinned in tests): appending batches in
ascending-id order produces, per document, exactly the one-shot
``span_dedup`` answer on the concatenated corpus — batch boundaries
must not change what gets rewritten.

Scale posture: the index holds one 32-hex gram hash + one 8-byte key
per DISTINCT window — bounded by corpus token count, stored
hash-prefix-partitioned (``bucket=xx``) so the membership join prunes
to touched buckets and appends spread evenly; ``sinks/compact.py``
handles the small-file accretion. Per batch, the gram stream is
evaluated once and checkpointed (it feeds the ownership window, the
rewrite AND the fresh-gram append — without the cut the md5 window
pipeline would re-run per consumer).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators.dedup import (
    _span_grams,
    _span_rewrite,
    _span_staged,
)

__all__ = ["span_dedup_against_index", "read_span_index"]


def read_span_index(spark: SparkSession, index_root: str | Path) -> DataFrame:
    root = Path(index_root)
    # emptiness = no parquet DATA files: an all-short-docs batch appends
    # only a _SUCCESS marker, which would defeat an iterdir() check and
    # make the schema-inference read throw on every later batch
    if not root.exists() or not any(root.rglob("*.parquet")):
        return spark.createDataFrame([], "gram_hash string, owner_key long")
    return spark.read.parquet(str(root)).select("gram_hash", "owner_key")


def span_dedup_against_index(
    spark: SparkSession,
    batch: DataFrame,
    index_root: str | Path,
    text_col: str,
    id_col: str,
    w: int = 10,
    bucket_width: int = 1,
) -> DataFrame:
    """Rewrite ``batch`` against all previously indexed w-token spans
    (and against itself, smallest (id, pos) first) and register the
    batch's first-seen grams. Returns per-doc
    ``(id, n_tokens, n_removed, retained_md5)`` — the same contract as
    ``span_dedup``.

    ``bucket_width``: hash-prefix hex chars for the partition layout —
    16^width buckets. The gram stream is clustered by bucket ONCE and
    that single exchange serves the ownership window, the index
    membership join AND the partitioned append (one file per touched
    bucket), so the bucket count is also the append stage's
    parallelism ceiling: 1 (16 buckets) suits test scales, 2 (256)
    a production cluster, 3 (4096) the 100 TB corpus. Appends with
    different widths compose (the bucket value is a plain partition
    column), so an index can be re-bucketed by compaction
    (sinks/compact.py) when it outgrows its width."""
    if w < 2:
        raise ValueError(f"window must be >= 2 tokens: {w}")
    if not 1 <= bucket_width <= 8:
        raise ValueError(f"bucket_width must be 1..8: {bucket_width}")
    root = Path(index_root)
    root.mkdir(parents=True, exist_ok=True)
    # the id/position recovery below (and the key ordering contract)
    # require integral ids, same loud guard as the one-shot span_dedup
    id_type = batch.schema[id_col].dataType.simpleString()
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            "span_dedup_against_index requires an integral id column"
            f" (non-negative, < 2^32); got {id_col}: {id_type}"
        )
    # tokenize the batch ONCE: staged feeds the gram pipeline (dup_pos
    # action) AND the final rewrite join — without the cut the rewrite
    # action re-tokenizes the whole batch (same 1.37x-at-10x finding
    # as the one-shot span_dedup)
    staged = _span_staged(batch, text_col, id_col).localCheckpoint()
    # ONE gram-wide exchange: cluster by the hash-prefix bucket, then
    # run the ownership window on (bucket, __ghb) — equal hash implies
    # equal bucket, so the min is identical to a plain hash window —
    # and join the stored index on (bucket, __ghb) too. With subset
    # co-partitioning allowed (session conf), the bucket clustering is
    # reused by the window, the membership sort-merge join (only the
    # INDEX side shuffles, by bucket) and the partitioned append (one
    # file per touched bucket), where the old shape shuffled the gram
    # stream twice (__gh window + pre-write cluster-by). The exchange
    # ships only (16-byte binary hash, 8-byte key, 1-char bucket) —
    # id and position are recovered arithmetically from the key
    # encoding (id * 2^31 + p) after the duplicate filter, and the
    # stored hex form is rebuilt as lower(hex(.)) for the few FRESH
    # grams — the same §2.2 byte cut as the one-shot span_dedup
    # (>2x fewer shuffle bytes per gram row).
    grams = _span_grams(staged, id_col, w).select(
        F.unhex("__gh").alias("__ghb"),
        "__key",
        F.substring("__gh", 1, bucket_width).alias("bucket"),
    )
    owned = grams.repartition(F.col("bucket")).withColumn(
        "__batch_owner",
        F.min("__key").over(Window.partitionBy("bucket", "__ghb")),
    )
    # on the very first append the index has no data files, so the
    # membership join is skipped outright (one fewer stage)
    if root.exists() and any(root.rglob("*.parquet")):
        # recompute the index-side bucket from gram_hash rather than
        # reading the partition column: joining on the partition
        # column triggers a dynamic-partition-pruning subquery that
        # RE-RUNS the whole gram pipeline, and uniform hash prefixes
        # touch every bucket anyway — pruning buys nothing here
        idx = (
            spark.read.parquet(str(root))
            .select(
                F.unhex("gram_hash").alias("__ghb"),
                "owner_key",
                F.substring("gram_hash", 1, bucket_width).alias(
                    "bucket"
                ),
            )
        )
        owned = owned.join(idx, ["bucket", "__ghb"], "left")
    else:
        owned = owned.withColumn("owner_key", F.lit(None).cast("long"))
    # The flagged frame feeds three consumers (ownership filter,
    # rewrite, fresh-gram append). The gram pipeline must run exactly
    # ONCE per batch: persist flagged, make the (tiny, per-doc)
    # duplicate-position frame the FIRST action — an eager
    # localCheckpoint, which both populates the cache and severs the
    # rewrite plan from the gram lineage — then run the append off the
    # cache and drop it. (The previous shape ran the append first and
    # returned a rewrite plan still rooted at the persisted frame;
    # measured on sf0.1, the parquet-write action did NOT leave the
    # cache populated, so the rewrite's dup_pos re-ran the whole
    # gram+window+index-join pipeline a second time — the checkpoint
    # ordering cuts a full duplicate pass per batch, 3.3 s -> 2.8 s
    # for span_index_batches, and lets the cache be released before
    # returning instead of leaking into the session.) A dup_pos
    # recompute after checkpoint loss is STILL correct — re-reading
    # the index then finds this batch's own grams stored under their
    # first-seen keys, so every winner resolves identically (the same
    # property that makes at-least-once replay safe).
    flagged = owned.withColumn(
        "__winner", F.coalesce("owner_key", F.col("__batch_owner"))
    ).persist()
    try:
        dup_pos = (
            flagged.filter(F.col("__key") != F.col("__winner"))
            .select(
                F.expr("__key div 2147483648").cast(id_type).alias(id_col),
                F.expr("__key % 2147483648").cast("int").alias("__p"),
            )
            .groupBy(id_col)
            .agg(F.sort_array(F.collect_list("__p")).alias("__dup"))
            .localCheckpoint()
        )
        fresh = flagged.filter(
            F.col("owner_key").isNull()
            & (F.col("__key") == F.col("__batch_owner"))
        ).select(
            # md5 hex is lowercase; hex() emits uppercase — lower()
            # makes the stored form byte-identical to the pre-r10
            # index (and to what replay-idempotence requires)
            F.lower(F.hex("__ghb")).alias("gram_hash"),
            F.col("__key").alias("owner_key"),
            "bucket",
        )
        # subset co-partitioning (SPARK-35703) lets the membership
        # join accept the bucket-only clustering instead of
        # re-shuffling both sides by (bucket, __gh). The conf
        # (spark.sql.requireAllClusterKeysForCoPartition=false) is
        # SESSION-WIDE engine conf (session._engine_conf) — the old
        # per-action set/UNSET toggle here raced concurrently
        # submitted jobs (r09 verdict item 4: another thread planning
        # a query between the set and the unset planned under the
        # wrong value). For sessions built outside get_spark /
        # tune_session, set it once and leave it — a monotonic set to
        # the engine-wide value cannot race anything.
        key = "spark.sql.requireAllClusterKeysForCoPartition"
        if spark.conf.get(key, "true") != "false":
            spark.conf.set(key, "false")
        fresh.write.mode("append").partitionBy("bucket").parquet(
            str(root)
        )
    finally:
        flagged.unpersist()
    return _span_rewrite(staged.join(dup_pos, id_col, "left"), id_col, w)
