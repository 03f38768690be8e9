"""Semantics tests for the distributed-ML primitives
(plans/mlprims.py): full-batch logistic gradient vs a numpy
recomputation, and GBDT rescore vs per-row tree walks."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.plans import QUERY_REGISTRY
from cga_kinesis_to_elasticsearch_spark.plans.mlprims import (
    _DIM,
    _GRAD_SCALE,
    _W,
)


def _run(name, spark, sf_dir):
    return QUERY_REGISTRY[name][0](spark, sf_dir)


class TestLogregGradient:
    def test_matches_numpy_full_batch_gradient(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
        X = np.array(
            [[float(v) for v in r.embedding] for r in emb], dtype=np.float64
        )
        y = np.array([1.0 if r.label == 0 else 0.0 for r in emb])
        w = np.array(_W)
        # replicate the engine's quantize-then-sum (per-row rounding)
        resid = 1.0 / (1.0 + np.exp(-(X @ w))) - y
        got = {
            r.feature: (r.grad_fp, r.n_rows)
            for r in _run(
                "logreg_gradient_embeddings", spark, sf_dir
            ).collect()
        }
        assert set(got) == set(range(-1, _DIM))
        for j in range(_DIM):
            want = int(
                np.round(resid * X[:, j] * _GRAD_SCALE).sum()
            )
            assert abs(got[j][0] - want) <= len(emb), j  # half-up vs
            # banker's rounding can differ by <= 1 per row on exact .5
            assert got[j][1] == len(emb)
        want_bias = int(np.round(resid * _GRAD_SCALE).sum())
        assert abs(got[-1][0] - want_bias) <= len(emb)

    def test_gradient_descends_the_loss(self, spark, sf_dir):
        # one step along -grad must reduce the full-batch log loss:
        # the end-to-end sanity a training loop depends on
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
        X = np.array(
            [[float(v) for v in r.embedding] for r in emb], dtype=np.float64
        )
        y = np.array([1.0 if r.label == 0 else 0.0 for r in emb])
        w = np.array(_W)
        got = {
            r.feature: r.grad_fp
            for r in _run(
                "logreg_gradient_embeddings", spark, sf_dir
            ).collect()
        }
        grad = np.array(
            [got[j] / _GRAD_SCALE for j in range(_DIM)]
        )

        def loss(wv):
            p = 1.0 / (1.0 + np.exp(-(X @ wv)))
            eps = 1e-12
            return -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum()

        lr = 0.01 / len(emb)
        assert loss(w - lr * grad) < loss(w)


class TestLtrRescore:
    def test_scores_match_tree_walk(self, spark, sf_dir):
        rows = _run("ltr_rescore_topk", spark, sf_dir).collect()
        assert rows

        def tree_walk(tf_scan, tf_merge, dl):
            t1 = (
                (500 if tf_merge >= 1 else 300)
                if tf_scan >= 2
                else (100 if dl >= 60 else 50)
            )
            t2 = 400 if tf_merge >= 2 else (200 if tf_scan >= 1 else 0)
            return t1 + t2

        for r in rows:
            assert r.ltr_score == tree_walk(r.tf_scan, r.tf_merge, r.dl)
            assert r.tf_scan + r.tf_merge >= 1  # query context

    def test_features_match_text_recount(self, spark, sf_dir):
        docs = {
            r.doc_id: r.text
            for r in spark.read.parquet(
                f"{sf_dir}/documents.parquet"
            ).collect()
        }
        for r in _run("ltr_rescore_topk", spark, sf_dir).collect():
            toks = [t for t in docs[r.doc_id].split() if t]
            assert r.tf_scan == toks.count("scan")
            assert r.tf_merge == toks.count("merge")
            assert r.dl == len(toks)


class TestPcaPowerIteration:
    def test_matches_numpy_xtx_product(self, spark, sf_dir):
        from cga_kinesis_to_elasticsearch_spark.plans.mlprims import _V0

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
        X = np.array(
            [[float(v) for v in r.embedding] for r in emb], dtype=np.float64
        )
        v0 = np.array(_V0)
        proj = X @ v0
        got = {
            r.feature: r.u_fp
            for r in _run("pca_power_iteration", spark, sf_dir).collect()
        }
        assert set(got) == set(range(_DIM))
        for j in range(_DIM):
            want = int(np.round(proj * X[:, j] * _GRAD_SCALE).sum())
            assert abs(got[j] - want) <= len(emb), j

    def test_iterating_converges_toward_top_component(self, spark, sf_dir):
        # the returned u, normalized, must be closer (in |cos|) to the
        # true top eigenvector of X^T X than v0 was — the property that
        # makes the loop converge
        from cga_kinesis_to_elasticsearch_spark.plans.mlprims import _V0

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
        X = np.array(
            [[float(v) for v in r.embedding] for r in emb], dtype=np.float64
        )
        got = {
            r.feature: r.u_fp
            for r in _run("pca_power_iteration", spark, sf_dir).collect()
        }
        u = np.array([got[j] / _GRAD_SCALE for j in range(_DIM)])
        w, vecs = np.linalg.eigh(X.T @ X)
        top = vecs[:, -1]
        v0 = np.array(_V0)
        cos = lambda a, b: abs(a @ b) / (
            np.linalg.norm(a) * np.linalg.norm(b)
        )
        assert cos(u, top) > cos(v0, top)
