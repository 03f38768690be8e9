"""Training-data hygiene operators: benchmark decontamination,
deterministic stratified sampling (data mixing), repetition quality
signals."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.operators.dedup import ngram_contamination
from cga_kinesis_to_elasticsearch_spark.operators.sampling import (
    hex_threshold,
    stratified_hash_sample,
)
from cga_kinesis_to_elasticsearch_spark.operators.text import (
    chunk_tokens,
    repetition_signals,
)


class TestHexThreshold:
    def test_bounds(self):
        assert hex_threshold(0.0) == "00000000"
        assert hex_threshold(1.0) == "gggggggg"  # above every hex prefix
        assert hex_threshold(0.5) == "80000000"

    def test_monotone(self):
        ts = [hex_threshold(f / 20) for f in range(21)]
        assert ts == sorted(ts)

    def test_rejects_out_of_range(self):
        with pytest.raises(ValueError):
            hex_threshold(1.5)


class TestStratifiedSample:
    def _docs(self, spark):
        rows = [(i, "en" if i % 2 == 0 else "de") for i in range(400)]
        return spark.createDataFrame(rows, ["doc_id", "lang"])

    def test_fractions_approximate(self, spark):
        docs = self._docs(spark)
        out = stratified_hash_sample(
            docs, "doc_id", "lang", {"en": 0.25, "de": 0.75}
        )
        by_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
            F.count("*").alias("n")).collect()}
        assert 25 <= by_lang["en"] <= 75  # 200 * 0.25 = 50
        assert 120 <= by_lang["de"] <= 180  # 200 * 0.75 = 150

    def test_deterministic_and_nested(self, spark):
        docs = self._docs(spark)
        small = {r["doc_id"] for r in stratified_hash_sample(
            docs, "doc_id", "lang", {"en": 0.2, "de": 0.2}).collect()}
        again = {r["doc_id"] for r in stratified_hash_sample(
            docs, "doc_id", "lang", {"en": 0.2, "de": 0.2}).collect()}
        big = {r["doc_id"] for r in stratified_hash_sample(
            docs, "doc_id", "lang", {"en": 0.6, "de": 0.6}).collect()}
        assert small == again  # reproducible, no RNG
        assert small <= big  # nested: raising a weight only adds rows

    def test_seed_decorrelates(self, spark):
        docs = self._docs(spark)
        a = {r["doc_id"] for r in stratified_hash_sample(
            docs, "doc_id", "lang", {}, default_fraction=0.5, seed="a").collect()}
        b = {r["doc_id"] for r in stratified_hash_sample(
            docs, "doc_id", "lang", {}, default_fraction=0.5, seed="b").collect()}
        assert a != b


class TestContamination:
    def test_flags_only_overlapping_docs(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "completely unrelated words appear here instead now"),
                (3, "we also mention quick brown fox in passing"),
            ],
            ["doc_id", "text"],
        )
        bench = spark.createDataFrame(
            [(100, "a quick brown fox story")], ["doc_id", "text"]
        )
        out = {
            r["doc_id"]: (r["n_overlap"], r["contaminated"])
            for r in ngram_contamination(docs, bench, "text", "doc_id").collect()
        }
        assert out[1][1] and out[1][0] >= 1  # shares "quick brown fox"
        assert out[3][1]
        assert out[2] == (0, False)

    def test_self_contamination_complete(self, spark):
        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma delta {i}") for i in range(5)],
            ["doc_id", "text"],
        )
        out = ngram_contamination(docs, docs, "text", "doc_id")
        assert out.filter(~F.col("contaminated")).count() == 0


class TestChunkTokens:
    def test_chunks_reassemble_in_order(self, spark):
        text = " ".join(f"w{i}" for i in range(150))
        docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        rows = sorted(
            chunk_tokens(docs, "text", "doc_id", chunk_size=64).collect(),
            key=lambda r: r["chunk_id"],
        )
        assert [r["chunk_id"] for r in rows] == [0, 1, 2]
        assert [r["n_chunk_tokens"] for r in rows] == [64, 64, 22]  # ragged tail
        assert " ".join(r["chunk_text"] for r in rows) == text

    def test_short_doc_single_chunk(self, spark):
        docs = spark.createDataFrame([(1, "just three words")], ["doc_id", "text"])
        rows = chunk_tokens(docs, "text", "doc_id", chunk_size=64).collect()
        assert len(rows) == 1
        assert rows[0]["chunk_id"] == 0
        assert rows[0]["chunk_text"] == "just three words"
        assert rows[0]["n_chunk_tokens"] == 3

    def test_exact_multiple_no_empty_chunk(self, spark):
        text = " ".join(f"w{i}" for i in range(128))
        docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        rows = chunk_tokens(docs, "text", "doc_id", chunk_size=64).collect()
        assert len(rows) == 2
        assert all(r["n_chunk_tokens"] == 64 for r in rows)


class TestRepetitionSignals:
    def test_repetitive_doc_fails(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "buy now " * 30),
                (2, "a genuinely varied sentence with many distinct "
                    "interesting words about different topics entirely"),
            ],
            ["doc_id", "text"],
        )
        out = {r["doc_id"]: r for r in
               repetition_signals(docs, "text", "doc_id").collect()}
        assert out[1]["dup_token_frac"] > 0.9
        assert out[1]["top_bigram_frac"] > 0.4
        assert not out[1]["repetition_pass"]
        assert out[2]["dup_token_frac"] == 0.0
        assert out[2]["repetition_pass"]

    def test_single_token_doc(self, spark):
        docs = spark.createDataFrame([(1, "word")], ["doc_id", "text"])
        row = repetition_signals(docs, "text", "doc_id").collect()[0]
        assert row["dup_token_frac"] == 0.0
        assert row["top_bigram_frac"] == 1.0  # its lone token is the mode

    def test_symbol_heavy_doc(self, spark):
        docs = spark.createDataFrame(
            [(1, "x@#$ y%^& z*() only symbols !!! ???")], ["doc_id", "text"]
        )
        row = repetition_signals(docs, "text", "doc_id").collect()[0]
        assert row["symbol_ratio"] > 0.5
        assert not row["repetition_pass"]


class TestGroupSplit:
    def test_groups_never_straddle_splits(self, spark, sf_dir):
        from cga_kinesis_to_elasticsearch_spark.io import load_table
        from cga_kinesis_to_elasticsearch_spark.operators.sampling import group_split

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
        out = group_split(docs, "source", {"train": 0.8, "val": 0.1, "test": 0.1})
        per_group = out.groupBy("source").agg(
            F.count_distinct("split").alias("n_splits")
        )
        assert per_group.filter("n_splits > 1").count() == 0
        # every named split appears given enough groups, and nothing else
        got = {r.split for r in out.select("split").distinct().collect()}
        assert got <= {"train", "val", "test"}

    def test_deterministic_and_seed_sensitive(self, spark, sf_dir):
        from cga_kinesis_to_elasticsearch_spark.io import load_table
        from cga_kinesis_to_elasticsearch_spark.operators.sampling import group_split

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
        a = dict(
            (r.doc_id, r.split)
            for r in group_split(docs, "source", {"train": 0.5, "test": 0.5}).collect()
        )
        b = dict(
            (r.doc_id, r.split)
            for r in group_split(docs, "source", {"train": 0.5, "test": 0.5}).collect()
        )
        c = dict(
            (r.doc_id, r.split)
            for r in group_split(
                docs, "source", {"train": 0.5, "test": 0.5}, seed="other"
            ).collect()
        )
        assert a == b
        assert a != c

    def test_bad_fractions_rejected(self, spark, sf_dir):
        from cga_kinesis_to_elasticsearch_spark.io import load_table
        from cga_kinesis_to_elasticsearch_spark.operators.sampling import group_split

        docs = load_table(spark, sf_dir, "documents")
        with pytest.raises(ValueError, match="sum to 1"):
            group_split(docs, "source", {"train": 0.5, "test": 0.4})


class TestDupNgramCoverage:
    def _run(self, spark, rows, n=3):
        from cga_kinesis_to_elasticsearch_spark.operators.text import (
            dup_ngram_coverage,
        )

        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        return {
            r["doc_id"]: r
            for r in dup_ngram_coverage(docs, "text", "doc_id", n=n).collect()
        }

    def test_repeated_trigram_coverage(self, spark):
        # 'a b c' repeats at positions 1-3 and 4-6; x y uncovered
        out = self._run(spark, [(1, "a b c a b c x y")], n=3)
        assert out[1]["cov_chars"] == 6
        assert out[1]["tot_chars"] == 8
        assert out[1]["dup_ngram_char_frac"] == 0.75

    def test_no_repeats_is_zero(self, spark):
        out = self._run(spark, [(1, "all tokens here are unique words")])
        assert out[1]["cov_chars"] == 0
        assert out[1]["dup_ngram_char_frac"] == 0.0

    def test_doc_shorter_than_n(self, spark):
        out = self._run(spark, [(1, "two words")], n=5)
        assert out[1]["cov_chars"] == 0
        assert out[1]["tot_chars"] == 8
        assert out[1]["dup_ngram_char_frac"] == 0.0

    def test_full_repeat_covers_everything(self, spark):
        out = self._run(spark, [(1, "spam ham " * 10)], n=3)
        assert out[1]["cov_chars"] == out[1]["tot_chars"]
        assert out[1]["dup_ngram_char_frac"] == 1.0


class TestApplyMixture:
    def test_epochs_replicate_and_keep_fraction_prunes(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.sampling import (
            apply_mixture,
            mixture_plan,
        )

        # 'web': 40 tokens, 'code': 4 tokens; budget 40 with equal
        # shares -> web keep_fraction=0.5, code epochs=5.0
        rows = [(i, "w1 w2 w3 w4", "web") for i in range(10)]
        rows.append((100, "c1 c2 c3 c4", "code"))
        docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
        weights = {"web": 0.5, "code": 0.5}
        plan = {
            r.source: r
            for r in mixture_plan(docs, "text", "source", weights, 40).collect()
        }
        assert plan["web"].keep_fraction == 0.5
        assert plan["code"].epochs == 5.0
        out = apply_mixture(
            docs, "doc_id", "text", "source", weights, 40, seed="t0"
        ).collect()
        by_id = {}
        for r in out:
            by_id.setdefault(r.doc_id, []).append(r.copy)
        # code doc: exactly floor(5.0)=5 copies, numbered 1..5
        assert sorted(by_id[100]) == [1, 2, 3, 4, 5]
        # web docs: kept subset has exactly one copy each; roughly half
        kept_web = [i for i in by_id if i != 100]
        assert all(by_id[i] == [1] for i in kept_web)
        assert 1 <= len(kept_web) <= 9  # hash-dependent but not all/none

    def test_unweighted_source_dropped_and_deterministic(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.sampling import (
            apply_mixture,
        )

        docs = spark.createDataFrame(
            [(1, "a b", "web"), (2, "c d", "other")],
            ["doc_id", "text", "source"],
        )
        args = (docs, "doc_id", "text", "source", {"web": 1.0}, 100)
        a = sorted(tuple(r) for r in apply_mixture(*args).collect())
        b = sorted(tuple(r) for r in apply_mixture(*args).collect())
        assert a == b
        assert all(r[1] == "web" for r in a)
