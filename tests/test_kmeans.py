"""Distributed spherical k-means (similarity.kmeans_train) vs a numpy
Lloyd's reference with identical init, assignment, and tiebreaks."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from cga_kinesis_to_elasticsearch_spark.io import load_table
from cga_kinesis_to_elasticsearch_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
    kmeans_train,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def _ref_kmeans(vecs: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Reference Lloyd's: cosine assignment rounded to 4 digits with
    cell-id-ascending tiebreak, mean update rounded to 9 decimals
    (the operator's exact rules), empty cells keep their centroid."""
    cen = vecs[:k].astype(np.float64).copy()
    x = vecs.astype(np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    for _ in range(iters):
        cn = cen / np.linalg.norm(cen, axis=1, keepdims=True)
        sims = np.round(xn @ cn.T, 4)
        # argmax with lowest-cell-id tiebreak == np.argmax on ties
        assign = sims.argmax(axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                cen[c] = np.round(members.mean(axis=0), 9)
    return cen


class TestKMeansTrain:
    def test_matches_numpy_reference(self, spark, emb):
        rows = emb.orderBy("vec_id").select("vec_id", "embedding").collect()
        vecs = np.array([r.embedding for r in rows])
        want = _ref_kmeans(vecs, k=8, iters=3)
        got_rows = kmeans_train(emb, k=8, iters=3).orderBy("cell_id").collect()
        got = np.array([r.centroid for r in got_rows])
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)

    def test_trained_ivf_recall_reasonable(self, spark, emb):
        queries = emb.filter(F.col("vec_id") < 8)
        cen = kmeans_train(emb, k=8, iters=3).select(
            F.col("cell_id").alias("vec_id"), F.col("centroid").alias("embedding")
        )
        approx = ivf_topk(emb, queries, cen, k=5, nprobe=2)
        exact = cosine_topk(emb, queries, k=5)
        a, e = {}, {}
        for r in approx.collect():
            a.setdefault(r.query_id, set()).add(r.vec_id)
        for r in exact.collect():
            e.setdefault(r.query_id, set()).add(r.vec_id)
        recall = np.mean([len(a.get(q, set()) & ids) / 5 for q, ids in e.items()])
        assert recall >= 0.5  # nprobe=2 of k=8 cells

    def test_deterministic_across_runs(self, spark, emb):
        a = kmeans_train(emb, k=4, iters=2).orderBy("cell_id").collect()
        b = kmeans_train(emb, k=4, iters=2).orderBy("cell_id").collect()
        assert [r.centroid for r in a] == [r.centroid for r in b]
