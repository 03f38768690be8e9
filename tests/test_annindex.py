"""Persisted ANN index (sinks/annindex.py): physical partition
pruning and equality with the inline IVF path."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cga_kinesis_to_elasticsearch_spark.io import load_table
from cga_kinesis_to_elasticsearch_spark.operators.similarity import (
    ivf_topk,
    kmeans_train,
)
from cga_kinesis_to_elasticsearch_spark.sinks.annindex import (
    build_ann_index,
    query_ann_index,
    read_centroids,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def index(spark, emb, tmp_path_factory):
    root = tmp_path_factory.mktemp("ann_index")
    cen = kmeans_train(emb, k=8, iters=2).select(
        F.col("cell_id").alias("vec_id"), F.col("centroid").alias("embedding")
    )
    n_cells = build_ann_index(spark, emb, cen, root)
    return root, cen, n_cells


class TestAnnIndex:
    def test_matches_inline_ivf_on_trained_centroids(self, spark, emb, index):
        root, cen, _ = index
        queries = emb.filter(F.col("vec_id") < 6)
        got = {
            (r.query_id, r.rank): (r.vec_id, r.sim)
            for r in query_ann_index(spark, root, queries, k=5, nprobe=2).collect()
        }
        want = {
            (r.query_id, r.rank): (r.vec_id, r.sim)
            for r in ivf_topk(emb, queries, cen, k=5, nprobe=2).collect()
        }
        assert got == want

    def test_partition_pruning_in_plan(self, spark, emb, index):
        root, _, n_cells = index
        queries = emb.filter(F.col("vec_id") < 2)
        plan = (
            query_ann_index(spark, root, queries, k=5, nprobe=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        scan = [l for l in plan.splitlines() if "PartitionFilters" in l]
        assert scan and "cell_id" in scan[0]
        # the data scan must NOT read every cell directory
        import re

        m = re.search(r"PartitionFilters: \[([^\]]*)\]", scan[0])
        assert m and m.group(1).strip(), "empty partition filter — no pruning"

    def test_centroids_roundtrip(self, spark, index):
        root, cen, n_cells = index
        stored = read_centroids(spark, root)
        assert stored.count() == cen.count() == n_cells

    def test_probed_cell_subset_scanned(self, spark, emb, index):
        """Fewer cells probed than exist: the isin list is a strict
        subset of the cell universe for a single query."""
        root, _, n_cells = index
        one = emb.filter(F.col("vec_id") == 0)
        out = query_ann_index(spark, root, one, k=3, nprobe=1)
        assert out.count() <= 3
        assert n_cells > 1

    def test_incremental_append_is_queryable(self, spark, emb, index):
        from cga_kinesis_to_elasticsearch_spark.sinks.annindex import (
            append_to_ann_index,
        )

        root, _, _ = index
        # re-append two known vectors under fresh ids
        extra = emb.filter(F.col("vec_id").isin([3, 4])).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
        )
        n = append_to_ann_index(spark, extra, root)
        assert n == 2
        # a query FOR vector 3 must now see its twin at full similarity
        q = emb.filter(F.col("vec_id") == 3)
        hits = query_ann_index(spark, root, q, k=3, nprobe=2).collect()
        assert any(r.vec_id == 1_000_003 and r.sim == 1.0 for r in hits)
