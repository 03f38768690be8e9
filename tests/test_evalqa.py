"""Semantics tests for the evaluation/QA batch (plans/evalqa.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.plans import QUERY_REGISTRY


def _run(name, spark, sf_dir):
    return QUERY_REGISTRY[name][0](spark, sf_dir)


class TestLshRecall:
    def test_counts_are_consistent(self, spark, sf_dir):
        [r] = _run("lsh_recall_eval", spark, sf_dir).collect()
        assert r.n_hit <= min(r.n_true, r.n_cand)
        assert r.n_true >= 1  # the synthetic corpus injects near-dups
        assert abs(r.recall - round(r.n_hit / r.n_true, 4)) < 1e-9
        if r.n_cand:
            assert abs(r.precision - round(r.n_hit / r.n_cand, 4)) < 1e-9

    def test_high_jaccard_pairs_are_recalled(self, spark, sf_dir):
        # 4 hashes x 2 bands: P(candidate | J) = 1-(1-J^2)^2 -> ~0.99
        # at J=0.9; the injected dups sit near J~0.98, so recall on
        # this corpus should be high (not a tautology: a banding bug
        # that, e.g., never bucket-matches would drive this to 0).
        [r] = _run("lsh_recall_eval", spark, sf_dir).collect()
        assert r.recall >= 0.5


class TestTermsSet:
    def test_min_should_match_enforced(self, spark, sf_dir):
        rows = _run("terms_set_match", spark, sf_dir).collect()
        assert rows
        terms = {"spark", "merge", "vector", "scan"}
        for r in rows:
            matched = r.matched_terms.split(",")
            assert len(matched) == r.n_matched >= 3
            assert set(matched) <= terms
            assert matched == sorted(matched)

    def test_matches_recount_from_text(self, spark, sf_dir):
        docs = {
            r.doc_id: r.text
            for r in spark.read.parquet(
                f"{sf_dir}/documents.parquet"
            ).collect()
        }
        terms = {"spark", "merge", "vector", "scan"}
        want = {
            d: sorted(terms & set(t.split()))
            for d, t in docs.items()
            if len(terms & set(t.split())) >= 3
        }
        got = {
            r.doc_id: r.matched_terms.split(",")
            for r in _run("terms_set_match", spark, sf_dir).collect()
        }
        assert got == want


class TestExplainBm25:
    def test_contribs_sum_to_bm25_score(self, spark, sf_dir):
        # the _explain breakdown must reconcile with an independent
        # whole-corpus BM25 recomputation for the same docs/terms
        rows = _run("explain_bm25_doc", spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r.tf >= 1 and r.df >= 1 and r.dl >= r.tf
            assert r.idf > 0 and r.contrib > 0
            # contribution is bounded by idf * (k1 + 1)
            assert r.contrib <= r.idf * 2.2 + 1e-9

    def test_rarer_term_has_higher_idf(self, spark, sf_dir):
        rows = _run("explain_bm25_doc", spark, sf_dir).collect()
        by_term = {r.term: (r.df, r.idf) for r in rows}
        terms = sorted(by_term.values())
        for (df_a, idf_a), (df_b, idf_b) in zip(terms, terms[1:]):
            if df_a < df_b:
                assert idf_a > idf_b


class TestLengthBuckets:
    def test_buckets_cover_corpus_and_waste_is_coherent(
        self, spark, sf_dir
    ):
        rows = _run("length_bucket_batches", spark, sf_dir).collect()
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        assert sum(r.n_docs for r in rows) == docs.count()
        for r in rows:
            assert r.bucket_len % 32 == 0
            assert r.padded_slots == r.bucket_len * r.n_docs
            assert 0 <= r.waste_frac < 1
            # every doc fits its bucket and wouldn't fit the next
            # smaller one: waste per doc < 32 tokens
            assert r.padded_slots - r.sum_tokens < 32 * r.n_docs


class TestAnnNdcg:
    def test_ndcg_bounded_and_consistent_with_recall(self, spark, sf_dir):
        rows = _run("ann_ndcg_eval", spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 0.0 <= r.ndcg <= 1.0
            assert r.dcg >= 0.0
        # IVF with nprobe=2 finds SOME true neighbors on this corpus —
        # an all-zero table would mean the approx arm is broken
        assert any(r.ndcg > 0 for r in rows)

    def test_perfect_arm_scores_one(self, spark, sf_dir):
        # grading the exact arm against itself must yield ndcg == 1:
        # pin the IDCG constant and the fold order
        from cga_kinesis_to_elasticsearch_spark.operators import (
            similarity as S,
        )
        import math

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter("vec_id < 2")
        exact = S.cosine_topk(emb, queries, k=5)
        idcg = sum((6 - r) / math.log2(r + 1) for r in range(1, 6))
        for (qid,), grp in __import__("itertools").groupby(
            sorted(
                [(r.query_id, r.rank) for r in exact.collect()],
                key=lambda t: (t[0], t[1]),
            ),
            key=lambda t: (t[0],),
        ):
            dcg = sum((6 - rk) / math.log2(rk + 1) for _, rk in grp)
            assert abs(dcg / idcg - 1.0) < 1e-12


class TestVocabCoverage:
    def test_shares_monotone_and_consistent(self, spark, sf_dir):
        rows = sorted(
            _run("vocab_coverage_curve", spark, sf_dir).collect(),
            key=lambda r: r.cutoff,
        )
        assert [r.cutoff for r in rows] == [5, 10, 20]
        for a, b in zip(rows, rows[1:]):
            assert a.covered_tokens <= b.covered_tokens
            assert a.total_tokens == b.total_tokens
        for r in rows:
            assert 0 < r.share <= 1.0
            assert (
                abs(r.share - round(r.covered_tokens / r.total_tokens, 4))
                < 1e-9
            )

    def test_total_matches_corpus_token_count(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        want = sum(len([t for t in r.text.split() if t]) for r in docs)
        rows = _run("vocab_coverage_curve", spark, sf_dir).collect()
        assert all(r.total_tokens == want for r in rows)


class TestFilterAblation:
    def test_counts_reconcile_with_per_doc_recount(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        sigs = []
        for d in docs:
            toks = [t for t in d.text.split() if t]
            uniq = set(toks)
            top = max(toks.count(u) for u in uniq) if toks else 0
            sigs.append(
                (
                    d.n_chars >= 200,
                    len(uniq) >= 20,
                    100 * top <= 20 * len(toks),
                )
            )
        rows = {
            r["filter"]: r
            for r in _run("filter_ablation_matrix", spark, sf_dir).collect()
        }
        keys = ["min_length", "min_diversity", "max_repetition"]
        assert set(rows) == set(keys)
        for i, k in enumerate(keys):
            n_fail = sum(1 for s in sigs if not s[i])
            n_unique = sum(
                1
                for s in sigs
                if not s[i] and all(s[j] for j in range(3) if j != i)
            )
            assert rows[k].n_fail == n_fail, k
            assert rows[k].n_unique_fail == n_unique, k
        n_pass_all = sum(1 for s in sigs if all(s))
        assert all(r.n_pass_all == n_pass_all for r in rows.values())
        # unique-fail can never exceed total-fail
        assert all(
            r.n_unique_fail <= r.n_fail for r in rows.values()
        )
