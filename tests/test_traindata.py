"""Semantics tests for the training-data batch (plans/traindata.py):
filtered kNN, hard-negative mining, preference pairs, curriculum
epochs, cross-source priority dedup."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.plans import QUERY_REGISTRY


def _run(name, spark, sf_dir):
    return QUERY_REGISTRY[name][0](spark, sf_dir)


def _emb(spark, vecs, labels):
    return spark.createDataFrame(
        [
            (i, [float(x) for x in v], int(l))
            for i, (v, l) in enumerate(zip(vecs, labels))
        ],
        "vec_id long, embedding array<float>, label int",
    )


class TestFilteredAnn:
    def test_every_hit_satisfies_filter(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        allowed = {
            r.vec_id for r in emb.filter(F.col("label") <= 2).collect()
        }
        rows = _run("filtered_ann_topk", spark, sf_dir).collect()
        assert rows and all(r.vec_id in allowed for r in rows)

    def test_filter_applies_to_candidates_not_posthoc(self, spark):
        # 1 query + 3 candidates; only ONE candidate passes the filter.
        # Candidate-side filtering still returns that one hit; post-hoc
        # filtering of an unfiltered top-1 would return nothing.
        from cga_kinesis_to_elasticsearch_spark.operators.similarity import (
            cosine_topk,
        )

        vecs = [[1.0, 0.0], [1.0, 0.01], [0.99, 0.0], [0.0, 1.0]]
        labels = [9, 5, 5, 1]  # the two most-similar candidates fail
        emb = _emb(spark, vecs, labels)
        out = cosine_topk(
            emb.filter(F.col("label") == 1),
            emb.filter("vec_id = 0"),
            k=1,
        ).collect()
        assert [r.vec_id for r in out] == [3]


class TestHardNegatives:
    def test_no_same_label_negative(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        labels = {r.vec_id: r.label for r in emb.collect()}
        rows = _run("hard_negative_topk", spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert labels[r.query_id] != labels[r.vec_id]
            assert r.query_id != r.vec_id

    def test_negatives_are_the_hardest(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.similarity import (
            hard_negative_topk,
        )

        rnd = np.random.RandomState(11)
        vecs = rnd.randn(12, 8).round(3)
        labels = [i % 3 for i in range(12)]
        emb = _emb(spark, vecs.tolist(), labels)
        out = hard_negative_topk(emb, emb.filter("vec_id = 0"), k=3)
        got = [r.vec_id for r in out.collect()]
        q = vecs[0] / np.linalg.norm(vecs[0])
        sims = {
            i: round(
                float(
                    np.dot(q, vecs[i] / np.linalg.norm(vecs[i]))
                ),
                4,
            )
            for i in range(1, 12)
            if labels[i] != labels[0]
        }
        want = sorted(sims, key=lambda i: (-sims[i], i))[:3]
        assert got == want


class TestPreferencePairs:
    def test_pairs_are_group_extremes_with_positive_margin(
        self, spark, sf_dir
    ):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "user_id",
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("vc"),
        )
        by_user: dict[int, list] = {}
        for r in ev.collect():
            by_user.setdefault(r.user_id, []).append((r.vc, r.event_id))
        rows = _run("preference_pairs", spark, sf_dir).collect()
        assert rows
        seen = set()
        for r in rows:
            evs = by_user[r.user_id]
            best = max(evs, key=lambda t: (t[0], -t[1]))
            worst = min(evs, key=lambda t: (t[0], -t[1]))
            assert r.chosen_event == best[1]
            assert r.rejected_event == worst[1]
            assert r.margin_cents == best[0] - worst[0] > 0
            seen.add(r.user_id)
        # zero-margin groups (single event or all-equal scores) excluded
        for uid, evs in by_user.items():
            vals = {v for v, _ in evs}
            assert (uid in seen) == (len(vals) > 1)


class TestCurriculum:
    def test_epochs_are_equidepth_and_ordered(self, spark, sf_dir):
        rows = sorted(
            _run("curriculum_epochs", spark, sf_dir).collect(),
            key=lambda r: r.epoch,
        )
        assert [r.epoch for r in rows] == list(
            range(1, len(rows) + 1)
        )
        # score ranges are non-overlapping and ascending: the
        # curriculum really is easy -> hard
        for a, b in zip(rows, rows[1:]):
            assert a.hi_score < b.lo_score
        total = sum(r.n_docs for r in rows)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        assert total == docs.count()
        # equi-depth up to score-atomicity: no epoch is empty
        assert all(r.n_docs >= 1 for r in rows)


class TestPriorityDedup:
    def test_kept_plus_dropped_covers_and_prefers_priority(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "same text", "src3"),
                (2, "same text", "src1"),
                (3, "same text", "src12"),
                (4, "unique a", "src12"),
                (5, "unique b", "src3"),
            ],
            "doc_id long, text string, source string",
        )
        from cga_kinesis_to_elasticsearch_spark.plans.traindata import (
            _cross_source_priority_dedup,
        )

        import tempfile

        with tempfile.TemporaryDirectory() as d:
            # single-file parquet, like the driver's testdata layout
            docs.toPandas().to_parquet(f"{d}/documents.parquet")
            out = {
                r.source: r
                for r in _cross_source_priority_dedup(spark, d).collect()
            }
        # src1 wins the duplicate group (lowest numeric priority)
        assert out["src1"].n_kept == 1 and out["src1"].n_dropped == 0
        assert out["src3"].n_dropped == 1  # its copy lost to src1
        assert out["src12"].n_dropped == 1 and out["src12"].n_kept == 1
        assert all(
            r.n_kept + r.n_dropped == r.n_docs for r in out.values()
        )


class TestNullContracts:
    """Legal-but-absent inputs must not silently change semantics —
    the nullable-contract discipline from operators/topk.py."""

    def test_priority_dedup_handles_null_text_and_source(self, spark):
        docs = spark.createDataFrame(
            [
                (1, None, "src2"),
                (2, None, "src1"),   # null texts form ONE dup group
                (3, "x", None),      # null source -> lowest priority
                (4, "x", "src9"),    # numbered source beats null
            ],
            "doc_id long, text string, source string",
        )
        import tempfile

        from cga_kinesis_to_elasticsearch_spark.plans.traindata import (
            _cross_source_priority_dedup,
        )

        with tempfile.TemporaryDirectory() as d:
            docs.toPandas().to_parquet(f"{d}/documents.parquet")
            out = {
                r.source: r
                for r in _cross_source_priority_dedup(spark, d).collect()
            }
        assert out["src1"].n_kept == 1 and out["src2"].n_dropped == 1
        assert out["src9"].n_kept == 1
        assert out[None].n_dropped == 1 and out[None].n_kept == 0

    def test_preference_pairs_exclude_null_scores(self, spark, tmp_path_factory):
        # a user whose only competition is a NULL-scored event gets no
        # pair; NULL never becomes chosen or rejected
        ev = spark.createDataFrame(
            [
                (1, 10, 5.0),
                (1, 11, None),
                (2, 20, 1.0),
                (2, 21, 2.0),
            ],
            "user_id long, event_id long, value double",
        )
        import tempfile

        from cga_kinesis_to_elasticsearch_spark.plans.traindata import (
            _preference_pairs,
        )

        with tempfile.TemporaryDirectory() as d:
            ev.select(
                "event_id",
                F.current_timestamp().alias("ts"),
                "user_id",
                F.lit("click").alias("event_type"),
                "value",
                F.lit("{}").alias("props"),
            ).toPandas().to_parquet(f"{d}/events.parquet")
            rows = {r.user_id: r for r in _preference_pairs(spark, d).collect()}
        assert 1 not in rows  # single scored event -> no margin
        assert rows[2].chosen_event == 21 and rows[2].rejected_event == 20

    def test_curriculum_scores_null_text_as_zero(self, spark):
        docs = spark.createDataFrame(
            [(1, None), (2, "a b c"), (3, "a b c d e")],
            "doc_id long, text string",
        )
        import tempfile

        from cga_kinesis_to_elasticsearch_spark.plans.traindata import (
            _curriculum_epochs,
        )

        with tempfile.TemporaryDirectory() as d:
            docs.toPandas().to_parquet(f"{d}/documents.parquet")
            rows = sorted(
                _curriculum_epochs(spark, d).collect(),
                key=lambda r: r.epoch,
            )
        assert sum(r.n_docs for r in rows) == 3
        assert rows[0].lo_score == 0  # the null-text doc, scored 0
