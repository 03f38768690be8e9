"""Persisted ANN index: IVF cells as PHYSICAL partition directories.

``similarity.ivf_topk`` computes cell assignment inline per query run;
at serving scale you build the index ONCE — corpus vectors written
``partitionBy(cell_id)`` — and every query then reads ONLY its probed
cells' directories. Partition pruning happens in the file index before
any I/O: a query probing 2 of 64 cells scans ~1/32 of the corpus, and
the pruning is visible in the plan as ``PartitionFilters``.

Centroids come from any snapshot or from ``similarity.kmeans_train``;
they are persisted next to the data so the query path probes with
exactly the centroids the build assigned with (a probe/assign mismatch
silently destroys recall — pinning them together makes it impossible).

Layout:

    root/centroids/   (cell_id INT, centroid ARRAY<DOUBLE>)
    root/data/cell_id=K/   corpus rows of cell K

At 100 TB: the build is one narrow assignment pass + one shuffle into
the partitioned write; queries touch nprobe directories regardless of
corpus size. Rebuild = rerun build (atomic via overwrite); incremental
appends land in their cell directories and compaction
(``sinks/compact.py``) keeps file counts sane.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.functions import broadcast

from ..operators.similarity import (
    _as_double,
    cosine_similarity,
    ivf_cells,
)

__all__ = ["build_ann_index", "append_to_ann_index", "query_ann_index", "read_centroids"]


def build_ann_index(
    spark: SparkSession,
    corpus: DataFrame,
    centroids: DataFrame,
    root: str | Path,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Write the cell-partitioned index; returns the number of cells
    written. ``centroids`` is ``(vec_id|cell_id, embedding|centroid)``
    shaped like ``similarity`` functions expect."""
    root = Path(root)
    cen = centroids.select(
        F.col(centroids.columns[0]).cast("int").alias("cell_id"),
        _as_double(F.col(centroids.columns[1])).alias("centroid"),
    )
    cen.coalesce(1).write.mode("overwrite").parquet(str(root / "centroids"))
    assigned = ivf_cells(
        corpus,
        cen.select(F.col("cell_id").alias(id_col), F.col("centroid").alias(vec_col)),
        id_col,
        vec_col,
        nprobe=1,
    ).select(id_col, "cell_id")
    (
        corpus.join(assigned, id_col)
        .write.mode("overwrite")
        .partitionBy("cell_id")
        .parquet(str(root / "data"))
    )
    return len([p for p in (root / "data").glob("cell_id=*")])


def read_centroids(spark: SparkSession, root: str | Path) -> DataFrame:
    return spark.read.parquet(str(Path(root) / "centroids"))


def query_ann_index(
    spark: SparkSession,
    root: str | Path,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k over the persisted index: probe each query's ``nprobe``
    nearest cells (against the PERSISTED centroids), then scan only
    those cells' partition directories — the ``cell_id IN (...)``
    filter prunes at the file index, before any data I/O. Output:
    (query_id, vec_id, sim, rank), identical to ``ivf_topk`` over the
    same centroids."""
    root = Path(root)
    cen = read_centroids(spark, root).select(
        F.col("cell_id").alias(id_col), F.col("centroid").alias(vec_col)
    )
    q_cells = ivf_cells(queries, cen, id_col, vec_col, nprobe=nprobe).select(
        F.col(id_col).alias("query_id"), "cell_id"
    )
    probed = sorted(
        {r.cell_id for r in q_cells.select("cell_id").distinct().collect()}
    )
    data = spark.read.parquet(str(root / "data")).filter(
        F.col("cell_id").isin(probed)
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("__qv")
    )
    cand = (
        data.select(F.col(id_col), _as_double(F.col(vec_col)).alias("__cv"), "cell_id")
        .join(broadcast(q_cells), "cell_id")
        .filter(F.col("query_id") != F.col(id_col))
    )
    sim = cosine_similarity(F.col("__qv"), F.col("__cv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        cand.join(broadcast(q), "query_id")
        .select("query_id", id_col, sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def append_to_ann_index(
    spark: SparkSession,
    batch: DataFrame,
    root: str | Path,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Incremental index growth: assign ``batch`` against the PERSISTED
    centroids (never retrain mid-append — a centroid shift would strand
    earlier vectors in stale cells) and append into the cell
    directories; returns rows appended. Compaction of the accreted
    small files is ``sinks/compact.py``'s job; retraining is a full
    ``build_ann_index`` rebuild."""
    root = Path(root)
    cen = read_centroids(spark, root).select(
        F.col("cell_id").alias(id_col), F.col("centroid").alias(vec_col)
    )
    assigned = ivf_cells(batch, cen, id_col, vec_col, nprobe=1).select(
        id_col, "cell_id"
    )
    out = batch.join(assigned, id_col)
    # assignment is 1:1 (nprobe=1, one cell per vector), so the appended
    # row count equals the batch count — don't run the join twice
    n = batch.count()
    out.write.mode("append").partitionBy("cell_id").parquet(str(root / "data"))
    return n
