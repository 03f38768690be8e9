"""Property-based tests for the round-4 additions: the new query-DSL
leaves vs a python reference model, search_after page-reconstruction,
and composite pagination completeness."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
    apply_query,
    run_search_body,
)
from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import apply_aggs

_SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny-alphabet rows: forces fuzzy/terms_set/regexp boundary cases
_word = st.sampled_from(["ab", "abc", "abd", "ba", "xyz", ""])
_rows = st.lists(
    st.tuples(st.integers(0, 50), _word, st.integers(0, 9)),
    min_size=1,
    max_size=20,
    unique_by=lambda t: t[0],
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, w if w else None, n) for i, w, n in rows],
        "doc_id long, w string, n long",
    )


def _lev(a: str, b: str) -> int:
    if a is None:
        return 99
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class TestLeafModels:
    @_SLOW
    @given(rows=_rows, fuzz=st.integers(0, 2))
    def test_fuzzy_matches_python_levenshtein(self, spark, rows, fuzz):
        got = sorted(
            r.doc_id
            for r in apply_query(
                _df(spark, rows),
                {"fuzzy": {"w": {"value": "abc", "fuzziness": fuzz}}},
            ).collect()
        )
        want = sorted(
            i for i, w, _ in rows if w and _lev(w, "abc") <= fuzz
        )
        assert got == want

    @_SLOW
    @given(rows=_rows, m=st.integers(1, 3))
    def test_terms_set_counts_matches(self, spark, rows, m):
        terms = ["ab", "ba", "xyz"]
        got = sorted(
            r.doc_id
            for r in apply_query(
                _df(spark, rows),
                {"terms_set": {"w": {
                    "terms": terms,
                    "minimum_should_match_script": {"source": str(m)},
                }}},
            ).collect()
        )
        # whitespace analyzer: single-token field -> at most 1 term hit
        want = sorted(
            i for i, w, _ in rows
            if w and sum(t == w for t in terms) >= m
        )
        assert got == want

    @_SLOW
    @given(rows=_rows)
    def test_ids_and_dis_max_union(self, spark, rows):
        ids = [i for i, _, _ in rows][:2]
        got = sorted(
            r.doc_id
            for r in apply_query(
                _df(spark, rows),
                {"dis_max": {"queries": [
                    {"ids": {"values": ids}},
                    {"term": {"w": "xyz"}},
                ]}},
            ).collect()
        )
        want = sorted(
            {i for i, w, _ in rows if i in ids or w == "xyz"}
        )
        assert got == want


class TestPaginationProperties:
    @_SLOW
    @given(rows=_rows, page=st.integers(1, 4))
    def test_search_after_reconstructs_full_order(self, spark, rows, page):
        df = _df(spark, rows)
        full = run_search_body(df, {
            "query": {"match_all": {}},
            "sort": [{"n": "asc"}, {"doc_id": "asc"}],
            "size": len(rows),
            "_source": ["doc_id", "n"],
        }).collect()
        # page through with search_after; concatenation == full list
        seen = []
        cursor = None
        while True:
            body = {"query": {"match_all": {}},
                    "sort": [{"n": "asc"}, {"doc_id": "asc"}],
                    "size": page, "_source": ["doc_id", "n"]}
            if cursor is not None:
                body["search_after"] = cursor
            hits = run_search_body(df, body).collect()
            if not hits:
                break
            seen.extend(hits)
            cursor = [hits[-1].n, hits[-1].doc_id]
        assert [(r.doc_id, r.n) for r in seen] == [
            (r.doc_id, r.n) for r in full
        ]

    @_SLOW
    @given(rows=_rows, size=st.integers(1, 5))
    def test_composite_pages_cover_every_bucket(self, spark, rows, size):
        df = _df(spark, rows)
        want = {
            (w, n)
            for _, w, n in [(i, w, n) for i, w, n in rows if w]
        }
        got = set()
        after = None
        while True:
            body = {"composite": {
                "sources": [{"kw": {"terms": {"field": "w"}}},
                            {"kn": {"terms": {"field": "n"}}}],
                "size": size,
            }}
            if after is not None:
                body["composite"]["after"] = after
            page = apply_aggs(df, {"c": body}).collect()
            if not page:
                break
            got.update((r.kw, r.kn) for r in page)
            after = {"kw": page[-1].kw, "kn": page[-1].kn}
        assert got == want
