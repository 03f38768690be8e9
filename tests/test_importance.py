"""DSIR-style importance weighting (operators/importance.py):
feature extraction, weight semantics (target-like docs score higher),
smoothing edge cases, and determinism."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.operators.importance import (
    dsir_log_weights,
    hashed_ngram_features,
)

_N_BUCKETS = 64


def _ref_bucket(gram: str) -> int:
    return int(hashlib.md5(f"g:{gram}".encode()).hexdigest()[:7], 16) % _N_BUCKETS


def _ref_grams(text: str) -> list[str]:
    toks = [t for t in text.lower().split() if t]
    return toks + [f"{a}_{b}" for a, b in zip(toks, toks[1:])]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "alpha beta alpha", "tgt"),
        (1, "alpha beta gamma", "tgt"),
        (2, "delta epsilon zeta", "other"),
        (3, "alpha beta", "other"),  # target-like
        (4, "zeta zeta epsilon", "other"),  # raw-like
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


class TestFeatures:
    def test_matches_python_reference(self, spark, corpus):
        got = {
            (r["doc_id"], r["bucket"]): r["cnt"]
            for r in hashed_ngram_features(
                corpus, "text", "doc_id", _N_BUCKETS
            ).collect()
        }
        want: dict[tuple[int, int], int] = {}
        for doc_id, text, _ in corpus.collect():
            for b, c in Counter(
                _ref_bucket(g) for g in _ref_grams(text)
            ).items():
                want[(doc_id, b)] = c
        assert got == want

    def test_single_token_doc_has_no_bigrams(self, spark):
        df = spark.createDataFrame([(0, "solo")], "doc_id long, text string")
        rows = hashed_ngram_features(df, "text", "doc_id", _N_BUCKETS).collect()
        assert sum(r["cnt"] for r in rows) == 1


class TestWeights:
    def test_target_like_doc_outranks_raw_like(self, spark, corpus):
        target = corpus.filter(F.col("source") == "tgt")
        w = {
            r["doc_id"]: r["log_weight"]
            for r in dsir_log_weights(
                corpus, target, "text", "doc_id", _N_BUCKETS
            ).collect()
        }
        assert set(w) == {0, 1, 2, 3, 4}
        # doc 3 shares the target's grams; doc 4 shares none
        assert w[3] > w[4]
        # the target docs themselves score above the off-target docs
        assert min(w[0], w[1]) > max(w[2], w[4])

    def test_matches_python_reference(self, spark, corpus):
        target = corpus.filter(F.col("source") == "tgt")
        got = {
            r["doc_id"]: (r["n_grams"], r["log_weight"])
            for r in dsir_log_weights(
                corpus, target, "text", "doc_id", _N_BUCKETS
            ).collect()
        }
        raw_counts: Counter = Counter()
        tgt_counts: Counter = Counter()
        per_doc: dict[int, Counter] = {}
        for doc_id, text, source in corpus.collect():
            c = Counter(_ref_bucket(g) for g in _ref_grams(text))
            per_doc[doc_id] = c
            raw_counts.update(c)
            if source == "tgt":
                tgt_counts.update(c)
        rt, tt = sum(raw_counts.values()), sum(tgt_counts.values())
        for doc_id, c in per_doc.items():
            lw = sum(
                cnt
                * (
                    math.log(tgt_counts.get(b, 0) + 1.0)
                    - math.log(tt + _N_BUCKETS)
                    - math.log(raw_counts.get(b, 0) + 1.0)
                    + math.log(rt + _N_BUCKETS)
                )
                for b, cnt in sorted(c.items())
            )
            n, got_lw = got[doc_id]
            assert n == sum(c.values())
            assert got_lw == pytest.approx(round(lw, 6), abs=2e-6)

    def test_empty_doc_zero_weight(self, spark):
        df = spark.createDataFrame(
            [(0, "alpha"), (1, "")], "doc_id long, text string"
        )
        target = df.filter(F.col("doc_id") == 0)
        w = {
            r["doc_id"]: (r["n_grams"], r["log_weight"])
            for r in dsir_log_weights(df, target, "text", "doc_id", _N_BUCKETS).collect()
        }
        assert w[1] == (0, 0.0)

    def test_deterministic(self, spark, corpus):
        target = corpus.filter(F.col("source") == "tgt")
        a = sorted(
            dsir_log_weights(corpus, target, "text", "doc_id", _N_BUCKETS)
            .collect()
        )
        b = sorted(
            dsir_log_weights(corpus, target, "text", "doc_id", _N_BUCKETS)
            .collect()
        )
        assert a == b
