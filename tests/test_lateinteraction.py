"""MaxSim late-interaction semantics (operators/similarity.maxsim_topk)
vs a numpy reference, plus the token-level-signal property that
motivates it."""

from __future__ import annotations

import numpy as np


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _numpy_maxsim(q, d, n_tokens, dim):
    qt = np.asarray(q, dtype=np.float64).reshape(n_tokens, dim)
    dt = np.asarray(d, dtype=np.float64).reshape(n_tokens, dim)
    return float((qt @ dt.T).max(axis=1).sum())


class TestMaxSim:
    def _run(self, spark, vecs, n_queries=1, **kw):
        from cga_kinesis_to_elasticsearch_spark.operators.similarity import (
            maxsim_topk,
        )

        emb = _emb(spark, vecs)
        out = maxsim_topk(
            emb, emb.filter(f"vec_id < {n_queries}"), **kw
        )
        return {(r.query_id, r.vec_id): r for r in out.collect()}

    def test_matches_numpy_on_random_vectors(self, spark):
        rnd = np.random.RandomState(3)
        vecs = rnd.randn(6, 64).round(3).tolist()
        got = self._run(spark, vecs, n_queries=2, n_tokens=8, dim=8, k=5)
        for (qi, di), r in got.items():
            want = _numpy_maxsim(vecs[qi], vecs[di], 8, 8)
            assert abs(float(r.score) - round(want, 4)) < 1e-9, (qi, di)

    def test_ranks_are_dense_and_capped(self, spark):
        rnd = np.random.RandomState(5)
        vecs = rnd.randn(8, 64).round(3).tolist()
        got = self._run(spark, vecs, n_queries=1, n_tokens=8, dim=8, k=3)
        ranks = sorted(r.rank for r in got.values())
        assert ranks == [1, 2, 3]

    def test_token_alignment_beats_pooled_dot(self, spark):
        # query = [e0-token, e1-token]; doc A matches both tokens but in
        # SWAPPED positions (pooled dot = 0); doc B matches token 0 in
        # place only. MaxSim must rank A (score 2) over B (score 1) —
        # the token-level signal a pooled dot product cannot see.
        z = [0.0] * 4
        e0, e1 = [1.0, 0, 0, 0], [0, 1.0, 0, 0]
        query = e0 + e1
        doc_a = e1 + e0
        doc_b = e0 + z
        got = self._run(
            spark, [query, doc_a, doc_b], n_queries=1, n_tokens=2, dim=4, k=2
        )
        assert float(got[(0, 1)].score) == 2.0
        assert float(got[(0, 2)].score) == 1.0
        assert got[(0, 1)].rank == 1 and got[(0, 2)].rank == 2


class TestMatryoshkaRecall:
    def test_zero_tail_vectors_give_perfect_recall(self, spark, monkeypatch):
        # every vector's dims 16..63 are zero -> truncated cosine keeps
        # the exact ordering, so recall@k must be 1.0 for every query
        from cga_kinesis_to_elasticsearch_spark.plans import (
            lateinteraction as L,
        )

        rnd = np.random.RandomState(9)
        vecs = np.zeros((12, 64))
        vecs[:, :16] = rnd.randn(12, 16)
        emb = _emb(spark, vecs.round(3).tolist())
        monkeypatch.setattr(L, "_tp", lambda s, d, n: emb)
        fn = getattr(L._matryoshka_recall, "__wrapped__", L._matryoshka_recall)
        out = fn(spark, "unused").collect()
        assert len(out) == L._N_QUERIES
        assert all(float(r.recall) == 1.0 for r in out)
