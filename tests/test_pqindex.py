"""Persisted PQ index (sinks/pqindex.py): build/serve equality with
the inline path, stored-codebook fidelity, replay-safe append, and
crash-window recovery via the shared swap protocol."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from cga_kinesis_to_elasticsearch_spark.io import load_table
from cga_kinesis_to_elasticsearch_spark.operators.similarity import (
    pq_adc_topk,
    pq_train_codebooks,
)
from cga_kinesis_to_elasticsearch_spark.sinks.pqindex import (
    append_to_pq_index,
    build_pq_index,
    query_pq_index,
    read_codebooks,
)

_PQ = dict(m=8, n_centroids=16, sample_rows=240, iters=5)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def index(spark, emb, tmp_path_factory):
    root = tmp_path_factory.mktemp("pq") / "idx"
    n = build_pq_index(spark, emb, root, **_PQ)
    assert n == emb.count()
    return root


class TestBuildAndServe:
    def test_equals_inline_pq(self, spark, emb, index):
        queries = emb.filter(F.col("vec_id") < 6)
        books = pq_train_codebooks(
            emb, m=_PQ["m"], n_centroids=_PQ["n_centroids"],
            sample_rows=_PQ["sample_rows"], iters=_PQ["iters"],
        )
        inline = {
            (r.query_id, r.vec_id, r.score, r.rank)
            for r in pq_adc_topk(emb, queries, books, k=5).collect()
        }
        served = {
            (r.query_id, r.vec_id, r.score, r.rank)
            for r in query_pq_index(spark, index, queries, k=5).collect()
        }
        assert served == inline and len(served) == 30

    def test_stored_codebooks_roundtrip(self, spark, emb, index):
        books = pq_train_codebooks(
            emb, m=_PQ["m"], n_centroids=_PQ["n_centroids"],
            sample_rows=_PQ["sample_rows"], iters=_PQ["iters"],
        )
        stored = read_codebooks(spark, index)
        np.testing.assert_array_equal(stored, books)

    def test_code_table_is_compact(self, spark, index):
        codes = spark.read.parquet(str(index / "codes"))
        row = codes.first()
        assert len(row["codes"]) == _PQ["m"]
        assert all(0 <= c < _PQ["n_centroids"] for c in row["codes"])


class TestAppend:
    def test_append_encodes_with_stored_books_and_skips_replays(
        self, spark, emb, tmp_path
    ):
        root = tmp_path / "idx"
        first = emb.filter(F.col("vec_id") < 400)
        rest = emb.filter(F.col("vec_id") >= 400)
        build_pq_index(spark, first, root, **_PQ)
        n1 = append_to_pq_index(spark, rest, root)
        assert n1 == rest.count()
        # replayed batch contributes nothing
        assert append_to_pq_index(spark, rest, root) == 0
        # served results use the union
        queries = emb.filter(F.col("vec_id") < 3)
        got_ids = {
            r.vec_id
            for r in query_pq_index(spark, root, queries, k=5).collect()
        }
        assert got_ids  # non-empty and can include appended ids
        total = spark.read.parquet(str(root / "codes")).count()
        assert total == emb.count()


class TestCrashSafety:
    def test_interrupted_rebuild_leaves_previous_servable(
        self, spark, emb, tmp_path
    ):
        import shutil

        root = tmp_path / "idx"
        build_pq_index(spark, emb, root, **_PQ)
        before = spark.read.parquet(str(root / "codes")).count()
        # simulate a crash mid-swap: stale .tmp- dirs left behind
        shutil.copytree(root / "codes", root / ".tmp-codes")
        build_pq_index(spark, emb, root, **_PQ)  # recovers + rebuilds
        assert spark.read.parquet(str(root / "codes")).count() == before
        assert not (root / ".tmp-codes").exists()
