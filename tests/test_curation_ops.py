"""New curation operators: URL canonicalization, per-key caps, text
cleaning, winsorization, and concat-and-split sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.operators.sampling import per_key_cap
from cga_kinesis_to_elasticsearch_spark.operators.text import (
    clean_text,
    length_winsorize,
    pack_spans,
)
from cga_kinesis_to_elasticsearch_spark.operators.web import canonicalize_url


def _canon(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(canonicalize_url(F.col("url")).alias("c")).first().c


class TestCanonicalizeUrl:
    def test_case_www_port(self, spark):
        assert (
            _canon(spark, "HTTP://WWW.Example.ORG:80/a/1")
            == "http://example.org/a/1"
        )

    def test_https_default_port(self, spark):
        assert (
            _canon(spark, "https://example.org:443/p/2")
            == "https://example.org/p/2"
        )

    def test_non_default_port_kept(self, spark):
        assert (
            _canon(spark, "https://example.org:8443/p")
            == "https://example.org:8443/p"
        )

    def test_fragment_dropped(self, spark):
        assert _canon(spark, "https://e.org/p#frag") == "https://e.org/p"

    def test_utm_first_with_successor(self, spark):
        assert (
            _canon(spark, "https://e.org/p?utm_a=1&q=2")
            == "https://e.org/p?q=2"
        )

    def test_utm_middle(self, spark):
        assert (
            _canon(spark, "https://e.org/p?a=1&utm_b=2&c=3")
            == "https://e.org/p?a=1&c=3"
        )

    def test_utm_lone(self, spark):
        assert _canon(spark, "https://e.org/p?utm_only=x") == "https://e.org/p"

    def test_trailing_slash_nonroot(self, spark):
        assert _canon(spark, "https://e.org/a/b/") == "https://e.org/a/b"

    def test_root_slash_kept(self, spark):
        assert _canon(spark, "https://e.org/") == "https://e.org/"


class TestPerKeyCap:
    def test_cap_and_rank(self, spark):
        rows = [(i, "k" + str(i % 2)) for i in range(10)]
        df = spark.createDataFrame(rows, "id long, k string")
        out = per_key_cap(df, "k", "id", cap=2).collect()
        kept = sorted(r.id for r in out if r.kept)
        # first two ids of each key: k0 -> 0,2  k1 -> 1,3
        assert kept == [0, 1, 2, 3]
        assert all(r.key_rank <= 5 for r in out)

    def test_deterministic_order_col(self, spark):
        df = spark.createDataFrame(
            [(1, "k", 9), (2, "k", 1)], "id long, k string, w long"
        )
        out = {
            r.id: r.key_rank
            for r in per_key_cap(df, "k", "id", cap=1, order_col="w").collect()
        }
        assert out == {2: 1, 1: 2}


class TestCleanText:
    def test_counts_and_idempotence(self, spark):
        dirty = "<p>hello <b>world</b></p>\x07  spaced\tout  "
        df = spark.createDataFrame([(1, dirty)], "id long, t string")
        r = clean_text(df, "t", "id").first()
        assert r.n_html_tags == 4
        assert r.n_ctrl_chars == 1
        # cleaned string: "hello world spaced out"
        assert r.clean_len == len("hello world spaced out")
        clean = spark.createDataFrame(
            [(1, "hello world spaced out")], "id long, t string"
        )
        r2 = clean_text(clean, "t", "id").first()
        assert (r2.n_html_tags, r2.n_ctrl_chars) == (0, 0)
        assert r2.clean_md5 == r.clean_md5


class TestWinsorize:
    def test_clamp_and_flags(self, spark):
        rows = [(i, "s", float(v)) for i, v in enumerate([1, 2, 3, 4, 100])]
        df = spark.createDataFrame(rows, "id long, src string, v double")
        out = {
            r.id: r
            for r in length_winsorize(df, "v", "src", "id", 0.0, 0.8).collect()
        }
        # p0 = 1, p80 = 4*0.2+3*0.8 -> interpolated 3.8..? percentile(v,0.8)
        # of [1,2,3,4,100] = 4*(1-.2)+100*.2 interpolation between ranks
        assert out[4].is_outlier and not out[0].is_outlier
        assert out[4].clamped == out[4].p_hi
        assert out[0].clamped == 1.0

    def test_group_isolation(self, spark):
        rows = [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 1000.0)]
        df = spark.createDataFrame(rows, "id long, src string, v double")
        out = {r.id: r for r in length_winsorize(df, "v", "src", "id").collect()}
        assert out[3].p_hi == 1000.0  # b's own percentile, not a's


class TestPackSpans:
    def _df(self, spark, docs):
        return spark.createDataFrame(docs, "id long, s string, t string")

    def test_token_conservation(self, spark):
        docs = [(i, "s", " ".join(["w"] * (3 + i))) for i in range(20)]
        out = pack_spans(self._df(spark, docs), "t", "id", "s", budget=16)
        per_doc = {
            r.id: r.total
            for r in out.groupBy("id")
            .agg(F.sum("tokens_in_seq").alias("total"))
            .collect()
        }
        assert per_doc == {i: 3 + i for i in range(20)}

    def test_sequences_full_except_last(self, spark):
        docs = [(i, "s", " ".join(["w"] * 10)) for i in range(10)]  # 100 toks
        out = pack_spans(self._df(spark, docs), "t", "id", "s", budget=32)
        per_seq = {
            r.seq_id: r.total
            for r in out.groupBy("seq_id")
            .agg(F.sum("tokens_in_seq").alias("total"))
            .collect()
        }
        assert per_seq == {0: 32, 1: 32, 2: 32, 3: 4}

    def test_straddle(self, spark):
        docs = [(0, "s", " ".join(["w"] * 20)), (1, "s", " ".join(["w"] * 20))]
        out = pack_spans(self._df(spark, docs), "t", "id", "s", budget=32)
        spans = {(r.id, r.seq_id): r.tokens_in_seq for r in out.collect()}
        # doc 1 straddles the 32-token boundary: 12 in seq 0, 8 in seq 1
        assert spans == {(0, 0): 20, (1, 0): 12, (1, 1): 8}

    def test_streams_independent(self, spark):
        docs = [(0, "a", "w w w"), (1, "b", "w w w")]
        out = pack_spans(self._df(spark, docs), "t", "id", "s", budget=4)
        assert {(r.s, r.seq_id) for r in out.collect()} == {("a", 0), ("b", 0)}


from hypothesis import given, settings, strategies as st

_hosts = st.from_regex(r"[A-Za-z][A-Za-z0-9-]{0,10}\.(org|com|net)", fullmatch=True)
_paths = st.from_regex(r"(/[A-Za-z0-9_.-]{1,8}){0,3}/?", fullmatch=True)
_queries_st = st.one_of(
    st.just(""),
    st.from_regex(
        r"\?(utm_[a-z]{1,5}=[a-z0-9]{1,4}|[a-z]{1,4}=[a-z0-9]{1,4})"
        r"(&(utm_[a-z]{1,5}=[a-z0-9]{1,4}|[a-z]{1,4}=[a-z0-9]{1,4})){0,3}",
        fullmatch=True,
    ),
)
_frags = st.one_of(st.just(""), st.from_regex(r"#[a-z0-9]{0,6}", fullmatch=True))


class TestCanonicalizeProperties:
    @given(
        scheme=st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
        www=st.sampled_from(["", "www.", "WWW."]),
        host=_hosts,
        port=st.sampled_from(["", ":80", ":443", ":8080"]),
        path=_paths,
        query=_queries_st,
        frag=_frags,
    )
    @settings(max_examples=30, deadline=None)
    def test_idempotent(self, spark, scheme, www, host, port, path, query, frag):
        url = f"{scheme}://{www}{host}{port}{path}{query}{frag}"
        once = _canon(spark, url)
        twice = _canon(spark, once)
        assert twice == once
        # canonical forms never retain fragments or utm params
        assert "#" not in once and "utm_" not in once


class TestPackProperties:
    @given(
        lens=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=15),
        budget=st.sampled_from([7, 16, 64]),
    )
    @settings(max_examples=20, deadline=None)
    def test_conservation_and_bounds(self, spark, lens, budget):
        docs = [(i, "s", " ".join(["w"] * n)) for i, n in enumerate(lens)]
        df = spark.createDataFrame(docs, "id long, s string, t string")
        out = pack_spans(df, "t", "id", "s", budget=budget).collect()
        per_doc: dict[int, int] = {}
        per_seq: dict[int, int] = {}
        for r in out:
            assert 1 <= r.tokens_in_seq <= budget
            per_doc[r.id] = per_doc.get(r.id, 0) + r.tokens_in_seq
            per_seq[r.seq_id] = per_seq.get(r.seq_id, 0) + r.tokens_in_seq
        # every token lands exactly once
        assert per_doc == {i: n for i, n in enumerate(lens)}
        # every sequence is exactly full except possibly the last
        last = max(per_seq)
        for seq, total in per_seq.items():
            assert total == budget or seq == last


class TestPackNullText:
    def test_null_text_packs_like_empty(self, spark):
        docs = [(0, "s", "w w w"), (1, "s", None), (2, "s", "w w")]
        df = spark.createDataFrame(docs, "id long, s string, t string")
        out = {
            (r.id, r.seq_id): r.tokens_in_seq
            for r in pack_spans(df, "t", "id", "s", budget=4).collect()
        }
        # NULL doc contributes exactly one (empty) token, no negative
        # spans, and later docs' offsets stay consistent
        assert out == {(0, 0): 3, (1, 0): 1, (2, 1): 2}
