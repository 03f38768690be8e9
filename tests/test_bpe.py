"""Distributed BPE training (operators/bpe.py) vs a pure-Python
reference implementation: identical merge sequences, counts, and
greedy merge application."""

from __future__ import annotations

import re
from collections import Counter

import pyspark.sql.functions as F
import pytest

from cga_kinesis_to_elasticsearch_spark.io import load_table
from cga_kinesis_to_elasticsearch_spark.operators.bpe import (
    apply_merge,
    bpe_train,
    bpe_word_freqs,
)


def _normalize(text: str) -> list[str]:
    # mirror dedup.normalized_text: lowercase, strip non-alnum, squeeze
    t = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", "", text.lower())).strip()
    return [w for w in t.split(" ") if w]


def _ref_apply(syms: tuple, left: str, right: str) -> tuple:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_train(texts: list[str], n_merges: int):
    freqs = Counter(w for t in texts for w in _normalize(t))
    words = {tuple(w): f for w, f in freqs.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, f in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # count DESC, pair ASC — the operator's deterministic tiebreak
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((rank, l, r, n))
        words = {_ref_apply(s, l, r): f for s, f in words.items()}
    return merges


class TestBpeTrain:
    def test_matches_reference_on_documents(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        texts = [r.text for r in docs.select("text").collect()]
        got = [
            (r.rank, r.left, r.right, r.pair_count)
            for r in bpe_train(spark, docs, "text", n_merges=6)
            .orderBy("rank")
            .collect()
        ]
        assert got == _ref_train(texts, 6)

    def test_greedy_merge_application_on_runs(self, spark):
        """aaaa -> [aa, aa], aaa -> [aa, a]: non-overlapping
        left-to-right — the case naive string replace gets wrong."""
        df = spark.createDataFrame([(["a"] * 4,), (["a"] * 3,)], "syms array<string>")
        out = [tuple(r.m) for r in df.select(
            apply_merge(F.col("syms"), "a", "a").alias("m")
        ).collect()]
        assert sorted(out) == sorted([("aa", "aa"), ("aa", "a")])

    def test_word_freq_table_is_vocab_sized(self, spark, sf_dir):
        docs = load_table(spark, sf_dir, "documents")
        wf = bpe_word_freqs(docs, "text")
        assert wf.count() == wf.select("word").distinct().count()

    def test_early_stop_when_no_repeating_pairs(self, spark):
        df = spark.createDataFrame([("xy",), ("ab",)], "text string")
        out = bpe_train(spark, df, "text", n_merges=5).collect()
        assert out == []


class TestBpeEncode:
    def test_encode_matches_python_reference(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.bpe import (
            bpe_encode,
        )

        texts = [
            (0, "low lower lowest low low"),
            (1, "new newer newest new"),
            (2, "low new low new lowest"),
        ]
        merges = [("l", "o"), ("lo", "w"), ("n", "e"), ("ne", "w")]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_words"], r["n_tokens"], r["n_chars"])
            for r in bpe_encode(df, "text", "doc_id", merges).collect()
        }
        want = {}
        for i, t in texts:
            words = _normalize(t)
            n_tokens = 0
            for w in words:
                syms = tuple(w)
                for l, r in merges:
                    syms = _ref_apply(syms, l, r)
                n_tokens += len(syms)
            want[i] = (len(words), n_tokens, sum(len(w) for w in words))
        assert got == want
        # merges actually compress: tokens < chars
        for _, (nw, nt, nc) in got.items():
            assert nw <= nt < nc

    def test_trained_merges_roundtrip_into_encoder(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.bpe import (
            bpe_encode,
            bpe_train,
        )

        df = spark.createDataFrame(
            [(i, "the cat and the hat and the rat") for i in range(3)],
            "doc_id long, text string",
        )
        learned = [
            (r["left"], r["right"])
            for r in bpe_train(spark, df, "text", n_merges=4)
            .orderBy("rank")
            .collect()
        ]
        assert learned  # something was learnable
        out = bpe_encode(df, "text", "doc_id", learned).collect()
        assert all(r["n_tokens"] < r["n_chars"] for r in out)
