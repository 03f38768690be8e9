"""Weak-supervision semantics (operators/weaklabel.py): vote
aggregation edges (tie, all-abstain) and the LFAnalysis triple on a
hand-computable bank."""

from __future__ import annotations

from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.operators.weaklabel import (
    lf_diagnostics,
    weak_label_votes,
)


def _docs(spark, rows):
    """rows: (doc_id, text, lang, source, n_chars)"""
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _bank2():
    # built lazily: Column construction needs an active SparkContext
    return [
        ("lf_a", F.when(F.col("n_chars") >= 100, 1).otherwise(0)),
        ("lf_b", F.when(F.col("lang") == "xx", -1).otherwise(0)),
    ]


class TestVotes:
    def test_majority_tie_and_abstain(self, spark):
        rows = [
            (1, "t", "en", "s", 200),   # +1 only -> label 1, conf 1.0
            (2, "t", "xx", "s", 200),   # +1 and -1 -> tie -> 0, conf 0.0
            (3, "t", "xx", "s", 50),    # -1 only -> label -1
            (4, "t", "en", "s", 50),    # nothing fires -> 0, conf 0.0
        ]
        out = {
            r.doc_id: r
            for r in weak_label_votes(_docs(spark, rows), _bank2()).collect()
        }
        assert (out[1].label, out[1].confidence) == (1, 1.0)
        assert (out[2].label, out[2].confidence) == (0, 0.0)
        assert (out[3].label, out[3].confidence) == (-1, 1.0)
        assert (out[4].label, out[4].confidence, out[4].n_pos, out[4].n_neg) == (
            0,
            0.0,
            0,
            0,
        )


class TestDiagnostics:
    def test_coverage_overlap_conflict(self, spark):
        # 4 docs: lf_a fires on 1,2; lf_b fires on 2,3; they conflict
        # exactly on doc 2 (opposite signs)
        rows = [
            (1, "t", "en", "s", 200),
            (2, "t", "xx", "s", 200),
            (3, "t", "xx", "s", 50),
            (4, "t", "en", "s", 50),
        ]
        out = {
            r.lf: r for r in lf_diagnostics(_docs(spark, rows), _bank2()).collect()
        }
        a, b = out["lf_a"], out["lf_b"]
        assert (a.fired, a.coverage) == (2, 0.5)
        assert (b.fired, b.coverage) == (2, 0.5)
        assert a.overlap == 0.25 and b.overlap == 0.25  # doc 2 only
        assert a.conflict == 0.25 and b.conflict == 0.25

    def test_same_sign_overlap_without_conflict(self, spark):
        bank = [
            ("p1", F.when(F.col("n_chars") >= 10, 1).otherwise(0)),
            ("p2", F.when(F.col("lang") == "en", 1).otherwise(0)),
        ]
        rows = [(1, "t", "en", "s", 20), (2, "t", "de", "s", 5)]
        out = {r.lf: r for r in lf_diagnostics(_docs(spark, rows), bank).collect()}
        assert out["p1"].overlap == 0.5 and out["p1"].conflict == 0.0
        assert out["p2"].overlap == 0.5 and out["p2"].conflict == 0.0
