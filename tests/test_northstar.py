"""Unit + property tests for the north-star operators (dedup,
similarity, text, multimodal, grok multimap) — semantics checks
independent of the DuckDB oracle harness."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import Row, functions as F

from cga_kinesis_to_elasticsearch_spark.operators import dedup as D
from cga_kinesis_to_elasticsearch_spark.operators import multimodal as M
from cga_kinesis_to_elasticsearch_spark.operators import similarity as S
from cga_kinesis_to_elasticsearch_spark.operators import text as T


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "The quick brown fox jumps over the lazy dog"),  # exact dup
        (3, "The QUICK, brown fox... jumps over the lazy dog!"),  # normalized dup
        (4, "the quick brown fox leaps over the lazy dog"),  # near dup
        (5, "completely different content about spark engines"),
        (6, "der hund und die katze und das haus"),
        (7, "12345 67890 999"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string").cache()


class TestDedup:
    def test_exact_dedup_groups_identical(self, docs):
        out = {
            r.representative_id: r.n_copies
            for r in D.exact_dedup(docs, "text", "doc_id").collect()
        }
        assert out[1] == 2  # docs 1 and 2 share a hash
        assert sum(out.values()) == 7

    def test_fingerprint_normalizes(self, spark, docs):
        fp = {r.doc_id: r.fingerprint for r in T.fingerprint(docs, "text", "doc_id").collect()}
        assert fp[1] == fp[2] == fp[3]  # punctuation/case stripped
        assert fp[1] != fp[4]

    def test_minhash_identical_signatures_for_dups(self, docs):
        sig = {
            r.doc_id: (r.mh0, r.mh1, r.mh2, r.mh3)
            for r in D.minhash_signatures(docs, "text", "doc_id", n_hashes=4).collect()
        }
        assert sig[1] == sig[2] == sig[3]
        assert sig[1] != sig[5]

    def test_lsh_candidates_find_near_dups_not_distinct_docs(self, docs):
        sig = D.minhash_signatures(docs, "text", "doc_id", n_hashes=4)
        pairs = {
            (r.id_a, r.id_b)
            for r in D.lsh_candidate_pairs(sig, "doc_id", n_hashes=4, band_size=2).collect()
        }
        assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
        assert not any(5 in p for p in pairs)

    def test_jaccard_bounds_and_self_similarity(self, spark):
        df = spark.createDataFrame(
            [(["a", "b", "c"], ["a", "b", "c"]), (["a"], ["b"]), ([], [])],
            "x array<string>, y array<string>",
        )
        vals = [r.j for r in df.select(D.jaccard(F.col("x"), F.col("y")).alias("j")).collect()]
        assert vals == [1.0, 0.0, 0.0]

    def test_simhash_close_for_near_dups(self, docs):
        t = docs.select("doc_id", D.tokens(F.col("text")).alias("tk"))
        t = t.select("doc_id", D.token_hashes(F.col("tk")).alias("th"))
        sh = {
            r.doc_id: r.s
            for r in t.select("doc_id", D.simhash_bits(F.col("th")).alias("s")).collect()
        }
        ham = lambda a, b: sum(x != y for x, y in zip(a, b))
        assert ham(sh[1], sh[4]) <= ham(sh[1], sh[5])
        assert sh[1] == sh[2] == sh[3]


class TestSimilarity:
    @pytest.fixture(scope="class")
    def vecs(self, spark):
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [0.0, 0.0, 1.0, 0.0]),
            (4, [-1.0, 0.0, 0.0, 0.0]),
        ]
        return spark.createDataFrame(rows, "vec_id int, embedding array<double>").cache()

    def test_cosine_topk_exact(self, vecs):
        out = S.cosine_topk(vecs, vecs.filter(F.col("vec_id") == 0), k=2)
        got = [(r.vec_id, r.rank, r.sim) for r in out.orderBy("rank").collect()]
        assert got[0][0] == 1 and got[0][2] == pytest.approx(0.9939, abs=1e-4)
        assert got[1][2] <= got[0][2]

    def test_cosine_orthogonal_and_opposite(self, spark, vecs):
        df = vecs.filter(F.col("vec_id").isin(0)).crossJoin(
            vecs.filter(F.col("vec_id").isin(2, 4)).select(
                F.col("embedding").alias("other"), F.col("vec_id").alias("oid")
            )
        )
        sims = {
            r.oid: r.s
            for r in df.select(
                "oid", S.cosine_similarity(F.col("embedding"), F.col("other")).alias("s")
            ).collect()
        }
        assert sims[2] == 0.0 and sims[4] == -1.0

    def test_ivf_topk_subset_of_exact(self, spark, sf_dir):
        from cga_kinesis_to_elasticsearch_spark.io import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        centroids = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 108))
        queries = emb.filter(F.col("vec_id") < 4)
        approx = S.ivf_topk(emb, queries, centroids, k=5, nprobe=8)
        exact = S.cosine_topk(emb, queries, k=5)
        # probing ALL 8 cells == exhaustive search -> must equal exact
        a = {(r.query_id, r.vec_id, r.rank) for r in approx.collect()}
        e = {(r.query_id, r.vec_id, r.rank) for r in exact.collect()}
        assert a == e

    def test_lsh_bucket_is_deterministic_bitstring(self, vecs):
        pairs = ((0, 1), (2, 3))
        out = {r.vec_id: r.bucket for r in S.lsh_buckets(vecs, pairs=pairs).collect()}
        assert out[0] == "10"  # v[0]>v[1]; v[2]==v[3] -> '0'
        assert out[3] == "01"  # v[0]==v[1]; v[2]>v[3]
        assert out[4] == "00"  # -1.0 < 0.0


class TestText:
    def test_token_stats(self, spark):
        df = spark.createDataFrame([(1, "ab cd efg")], "doc_id int, text string")
        r = T.token_stats(df, "text", "doc_id").first()
        assert (r.n_tokens, r.n_chars) == (3, 9)
        assert r.avg_token_len == pytest.approx(7 / 3, abs=1e-4)

    def test_lang_id_markers(self, docs):
        out = {r.doc_id: r.lang_guess for r in T.lang_id(docs, "text", "doc_id").collect()}
        assert out[1] == "en" and out[6] == "de" and out[7] == "und"

    def test_quality_penalizes_digits_and_short(self, spark):
        df = spark.createDataFrame(
            [
                (1, "the cat sat on the mat and it is a fine day for all of us here"),
                (2, "1234567890 1234567890"),
            ],
            "doc_id int, text string",
        )
        out = {r.doc_id: r.quality for r in T.quality_score(df, "text", "doc_id").collect()}
        assert out[1] > out[2]

    def test_bpe_count_splits_runs_and_marks(self, spark):
        df = spark.createDataFrame([(1, "abc123, def!")], "doc_id int, text string")
        # abc / 123 / , / def / ! -> 5
        assert T.bpe_ish_token_count(df, "text", "doc_id").first().n_bpe_tokens == 5


class TestMultimodal:
    def test_attach_and_extract_shape(self, spark):
        df = spark.createDataFrame([(1, "abcd"), (2, "")], "doc_id int, payload string")
        out = M.extract_features(M.attach_binary(df, "payload")).collect()
        by_id = {r.doc_id: r for r in out}
        assert by_id[1].media_meta.n_bytes == 4
        assert len(by_id[1].media_features) == 4
        assert sum(by_id[1].media_features) == pytest.approx(1.0, abs=1e-4)
        assert by_id[2].media_features == [0.0] * 4

    def test_features_deterministic(self):
        assert M.fake_decode_features(b"abcd") == M.fake_decode_features(b"abcd")
        assert M.fake_decode_features(b"") == [0.0, 0.0, 0.0, 0.0]

    def test_decode_image_stub_raises_without_library(self):
        try:
            import PIL  # noqa: F401

            pytest.skip("PIL available; stub not exercised")
        except ImportError:
            pass
        with pytest.raises(NotImplementedError):
            M.decode_image(b"\x89PNG")


class TestGrokMultimap:
    def test_duplicate_names_accumulate(self, spark):
        from cga_kinesis_to_elasticsearch_spark.grok import Grok
        from cga_kinesis_to_elasticsearch_spark.grok.spark import grok_multimap

        g = Grok()
        g.add_pattern("TRI", r"^%{WORD:w} %{WORD:w} %{INT:n:int}")
        df = spark.createDataFrame(
            [(1, "alpha beta 42"), (2, "no-match-here!")],
            "id int, line string",
        )
        out = {r.id: r for r in grok_multimap(g, df, "line", "TRI").collect()}
        assert out[1].w_values == ["alpha", "beta"]
        assert out[1].n_values == ["42"]
        assert out[2].w_values is None  # non-match -> NULL arrays

    def test_matches_python_multimap(self, spark):
        from cga_kinesis_to_elasticsearch_spark.grok import Grok
        from cga_kinesis_to_elasticsearch_spark.grok.spark import grok_multimap

        g = Grok()
        g.add_pattern("KV", r"%{WORD:k}=%{NOTSPACE:v} %{WORD:k}=%{NOTSPACE:v}")
        line = "a=1 b=2"
        cp = g.compile("KV")
        py = cp.parse_to_multimap(line)
        df = spark.createDataFrame([(line,)], "line string")
        row = grok_multimap(g, df, "line", "KV").first()
        assert row.k_values == py["k"] and row.v_values == py["v"]


# ---------------------------------------------------------------------------
# Property-based (SURVEY §5 item 5)
# ---------------------------------------------------------------------------

_texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200
)


class TestProperties:
    @given(_texts)
    @settings(max_examples=50, deadline=None)
    def test_fake_features_always_normalized(self, payload_text):
        payload = payload_text.encode()
        feats = M.fake_decode_features(payload)
        assert len(feats) == 4
        assert all(0.0 <= f <= 1.0 for f in feats)
        if payload:
            assert sum(feats) == pytest.approx(1.0, abs=1e-3)

    @given(st.lists(_texts, min_size=1, max_size=5))
    def test_grok_python_parse_never_raises(self, lines):
        from cga_kinesis_to_elasticsearch_spark.grok import default_grok

        g = default_grok()
        cp = g.compile("ROUTERACCESS")
        for line in lines:
            d = cp.parse(line)  # typed casts never throw (G5 contract)
            assert isinstance(d, dict)

    @given(
        st.floats(min_value=-10, max_value=10, allow_nan=False),
        st.floats(min_value=-10, max_value=10, allow_nan=False),
        st.floats(min_value=-10, max_value=10, allow_nan=False),
    )
    @settings(max_examples=30, deadline=None)
    def test_cosine_python_reference(self, x, y, z):
        """cosine_similarity's fold order matches the plain math within
        rounding, for one concrete vector pair per draw."""
        a = [x, y, z]
        b = [y, z, x]
        na = math.sqrt(sum(v * v for v in a))
        nb = math.sqrt(sum(v * v for v in b))
        if na == 0 or nb == 0:
            return
        expected = sum(p * r for p, r in zip(a, b)) / (na * nb)
        # evaluated lazily on the shared session in the class-level test
        TestProperties._pending.append((a, b, expected))

    _pending: list = []

    def test_cosine_pending_against_spark(self, spark):
        cases = TestProperties._pending or [([1.0, 2.0, 3.0], [3.0, 1.0, 2.0], 11 / 14)]
        df = spark.createDataFrame(
            [(a, b, e) for a, b, e in cases],
            "a array<double>, b array<double>, expected double",
        )
        rows = df.select(
            S.cosine_similarity(F.col("a"), F.col("b"), ndigits=None).alias("got"),
            "expected",
        ).collect()
        for r in rows:
            assert r.got == pytest.approx(r.expected, abs=1e-9)


class TestMultimodalStages:
    def test_resize_rewrites_payload_and_meta(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators import multimodal as MM

        df = spark.createDataFrame(
            [(1, "abcdefghij"), (2, "xy")], "doc_id int, payload string"
        )
        out = MM.resize_media(MM.attach_binary(df, "payload"), width=2, height=3)
        rows = {r.doc_id: r for r in out.collect()}
        assert len(bytes(rows[1].media)) == 6  # truncated
        assert len(bytes(rows[2].media)) == 6  # zero-padded
        assert rows[1].media_meta["width"] == 2
        assert rows[1].media_meta["height"] == 3
        assert rows[1].media_meta["n_bytes"] == 6
        assert rows[1].media_meta["media_type"] == "image"  # preserved

    def test_sample_frames_uniform(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators import multimodal as MM

        df = spark.createDataFrame([(1, "abcdefgh"), (2, "")], "doc_id int, p string")
        out = MM.sample_frames(MM.attach_binary(df, "p", media_type="video"), 4)
        rows = {r.doc_id: r for r in out.collect()}
        assert [bytes(f) for f in rows[1].frames] == [b"ab", b"cd", b"ef", b"gh"]
        assert rows[2].frames == []

    def test_full_stage_chain_values(self, spark):
        """attach -> resize -> features -> frames chained: values match
        a pure-Python replay (the multimodal_meta_pipeline contract)."""
        import hashlib

        from cga_kinesis_to_elasticsearch_spark.operators import multimodal as MM

        text = "the quick brown fox jumps"
        df = spark.createDataFrame([(1, text)], "doc_id int, p string")
        staged = MM.attach_binary(df, "p")
        staged = MM.resize_media(staged, 4, 4)  # 16 < len -> truncation
        staged = MM.extract_features(staged)
        staged = MM.sample_frames(staged, 4)
        r = staged.collect()[0]
        payload = text.encode()[:16]
        counts = [0] * 4
        for b in payload:
            counts[b % 4] += 1
        assert r.media_features == [round(c / 16, 6) for c in counts]
        assert bytes(r.frames[0]) == payload[:4]
        assert (
            hashlib.md5(bytes(r.frames[0])).hexdigest()
            == hashlib.md5(payload[:4]).hexdigest()
        )


class TestGrokPatternPath:
    def test_load_directory(self, tmp_path):
        from cga_kinesis_to_elasticsearch_spark.grok import Grok

        (tmp_path / "a.grok").write_text("MYWORD \\w+\n# comment\n")
        (tmp_path / "b.grok").write_text("MYLINE %{MYWORD:first} rest\n")
        g = Grok()
        assert g.add_patterns_from_path(tmp_path) == 2
        cp = g.compile("MYLINE")
        assert cp.parse("hello rest") == {"first": "hello"}

    def test_missing_path_raises(self, tmp_path):
        from cga_kinesis_to_elasticsearch_spark.grok import Grok
        from cga_kinesis_to_elasticsearch_spark.grok.compiler import GrokError

        with pytest.raises(GrokError):
            Grok().add_patterns_from_path(tmp_path / "nope")


class TestNearDupAndRollingFP:
    def test_near_dup_pairs_bucketed_cosine(self, spark):
        rows = [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0, 0.0]),  # near-dup of 0, same sign bucket
            (2, [0.0, 1.0, 0.0, 0.0]),  # orthogonal, different bucket
            (4, [-1.0, 0.0, 0.0, 0.0]),  # opposite, different bucket
        ]
        vecs = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
        out = S.near_dup_pairs(vecs, threshold=0.9, pairs=((0, 1), (2, 3)))
        got = {(r.id_a, r.id_b): r.sim for r in out.collect()}
        assert set(got) == {(0, 1)}
        assert got[(0, 1)] == pytest.approx(0.9939, abs=1e-4)

    def test_near_dup_requires_shared_bucket(self, spark):
        # identical vectors always share a bucket and score sim=1.0
        rows = [(i, [0.5, 0.25, 0.125, 1.0]) for i in range(3)]
        vecs = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
        out = S.near_dup_pairs(vecs, threshold=0.99, pairs=((0, 1), (1, 2)))
        pairs = {(r.id_a, r.id_b) for r in out.collect()}
        assert pairs == {(0, 1), (0, 2), (1, 2)}

    def test_rolling_fingerprint_normalization_invariance(self, docs):
        fp = {
            r.doc_id: r.rolling_fp
            for r in T.rolling_fingerprint(docs, "text", "doc_id").collect()
        }
        assert fp[1] == fp[2] == fp[3]  # case/punct stripped before hashing
        assert fp[1] != fp[5]

    def test_rolling_fingerprint_short_text_single_gram(self, spark):
        import hashlib

        df = spark.createDataFrame([(1, "Hi!")], "doc_id int, text string")
        out = T.rolling_fingerprint(df, "text", "doc_id").collect()[0]
        assert out.rolling_fp == hashlib.md5(b"hi").hexdigest()

    def test_rolling_fingerprint_detects_shared_window(self, spark):
        # two docs sharing a long run of text can share the min k-gram;
        # a doc with disjoint characters cannot
        df = spark.createDataFrame(
            [
                (1, "abcdefghijklmnop zz"),
                (2, "prefix abcdefghijklmnop"),
                (3, "QQQQQQQQQQQQQQQQQQQQ"),
            ],
            "doc_id int, text string",
        )
        fp = {
            r.doc_id: r.rolling_fp
            for r in T.rolling_fingerprint(df, "text", "doc_id").collect()
        }
        assert fp[3] != fp[1] and fp[3] != fp[2]


class TestFrameDedup:
    def test_frame_dedup_counts_conserve(self, spark, sf_dir):
        from cga_kinesis_to_elasticsearch_spark.plans.northstar import (
            _multimodal_frame_dedup,
        )

        out = _multimodal_frame_dedup(spark, sf_dir).collect()
        n_docs = 50  # sf0.001 documents
        total = sum(r.n_copies for r in out)
        assert total == spark.read.parquet(
            f"{sf_dir}/documents.parquet"
        ).count() * 4  # every (doc, frame) counted exactly once
        assert all(0 <= r.rep_frame < 4 for r in out)
        _ = n_docs


class TestContainment:
    def test_directed_subset_detected(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.dedup import (
            containment_pairs,
        )

        big = (
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon"
        )
        # high-overlap subset (18 of 20 words): banding keys on
        # JACCARD, so a candidate needs high symmetric overlap too —
        # the operator's documented recall contract
        small = (
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma"
        )
        other = "one two three four five six seven eight nine ten"
        df = spark.createDataFrame(
            [(1, big), (2, small), (3, other), (4, big)],
            "doc_id long, text string",
        )
        rows = {
            (r["id_a"], r["id_b"]): (
                r["containment_ab"],
                r["containment_ba"],
                r["relation"],
            )
            for r in containment_pairs(
                df, "text", "doc_id", threshold=0.95, n_hashes=4, band_size=2
            ).collect()
        }
        # small ⊂ big: the subset direction is exactly 1.0, the other
        # direction (16/18 shingles) misses the 0.95 bar -> directed
        assert (1, 2) in rows
        ab, ba, rel = rows[(1, 2)]
        assert ba == 1.0 and ab < 0.95 and rel == "b_in_a"
        # identical docs: mutual
        assert rows[(1, 4)][2] == "mutual"
        # unrelated doc never pairs
        assert not any(3 in p for p in rows)


class TestLanguageSegments:
    def test_mixed_doc_splits_at_language_boundary(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.text import (
            language_segments,
        )

        en = "the cat and the dog of the house " * 3  # 24 en tokens
        de = "der hund und das haus der baum und " * 3  # 24 de tokens
        df = spark.createDataFrame(
            [(1, (en + de).strip()), (2, en.strip())],
            "doc_id long, text string",
        )
        segs = {
            (r["doc_id"], r["seg_no"]): (r["lang"], r["from_win"], r["to_win"])
            for r in language_segments(df, "text", "doc_id", 8).collect()
        }
        doc1 = sorted(
            (k[1], v) for k, v in segs.items() if k[0] == 1
        )
        # doc 1: an en run then a de run (48 tokens / 8 = 6 windows)
        langs = [v[0] for _, v in doc1]
        assert langs == ["en", "de"], doc1
        assert doc1[0][1][1] == 0 and doc1[-1][1][2] == 5
        # doc 2: one pure-en segment
        doc2 = [(k, v) for k, v in segs.items() if k[0] == 2]
        assert len(doc2) == 1 and doc2[0][1][0] == "en"


class TestSourceOverlapMatrix:
    def test_canonical_pairs_and_bounds(self, spark):
        from cga_kinesis_to_elasticsearch_spark.plans.northstar import (
            _source_overlap_matrix,
        )

        rows = _source_overlap_matrix(spark, "/root/testdata/sf0.001").collect()
        assert rows, "expected at least one overlapping source pair"
        for r in rows:
            # unordered pair is canonicalized, counts are consistent
            assert r["source_a"] <= r["source_b"]
            assert 0 <= r["n_neardup"] <= r["n_candidates"]
        keys = [(r["source_a"], r["source_b"]) for r in rows]
        assert len(set(keys)) == len(keys)


class TestAdjacencyMatrix:
    def test_against_brute_force(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.dedup import (
            normalized_text,
        )
        from cga_kinesis_to_elasticsearch_spark.plans.searchindex import (
            _ADJ_FILTERS,
            _adjacency_matrix_counts,
        )

        sf = "/root/testdata/sf0.001"
        got = {
            r["bucket"]: r["doc_count"]
            for r in _adjacency_matrix_counts(spark, sf).collect()
        }
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        texts = [
            set(r[0].split(" "))
            for r in docs.select(normalized_text(F.col("text"))).collect()
        ]
        t0, t1, t2 = _ADJ_FILTERS
        want = {
            t0: sum(t0 in s for s in texts),
            t1: sum(t1 in s for s in texts),
            t2: sum(t2 in s for s in texts),
            f"{t0}&{t1}": sum(t0 in s and t1 in s for s in texts),
            f"{t0}&{t2}": sum(t0 in s and t2 in s for s in texts),
            f"{t1}&{t2}": sum(t1 in s and t2 in s for s in texts),
        }
        assert got == want
        assert got[f"{t0}&{t1}"] <= min(got[t0], got[t1])


class TestAnnRecall:
    def test_recall_bounds_and_consistency(self, spark):
        from cga_kinesis_to_elasticsearch_spark.plans.northstar import (
            _TOPK,
            _ann_recall_at_k,
        )

        rows = _ann_recall_at_k(spark, "/root/testdata/sf0.001").collect()
        assert len(rows) == 8  # one per query vector
        for r in rows:
            assert 0 <= r["n_hits"] <= _TOPK
            assert r["recall"] == round(r["n_hits"] / _TOPK, 4)
        # the LSH scheme must retrieve SOMETHING on this data, or the
        # eval is vacuous
        assert any(r["n_hits"] > 0 for r in rows)
