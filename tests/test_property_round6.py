"""Property-based tests for the round-6 additions: the Lucene parsers
(simple_query_string never raises and matches a python reference;
query_string grammar strings match the same reference), explicit
minimum_should_match arithmetic, slop proximity vs a brute-force
position model, and overlapping-chunk coverage invariants."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from cga_kinesis_to_elasticsearch_spark.operators.luceneq import (
    query_string_to_dsl,
    simple_query_string_to_dsl,
)
from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
    _msm_count,
    apply_query,
)

_SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_FAST = settings(max_examples=200, deadline=None)

_WORDS = ["alpha", "beta", "gamma", "delta", "x1"]

_DOCS = [
    (1, "alpha beta gamma"),
    (2, "beta beta delta"),
    (3, "gamma"),
    (4, "x1 alpha"),
    (5, None),
]


# ---------------------------------------------------------------------------
# python reference evaluator for the lowered DSL subset the parsers
# emit (match / match_phrase / _token_prefix / _token_wildcard / bool)
# ---------------------------------------------------------------------------


def _toks(text):
    return text.split() if text else []


def _eval(dsl: dict, text) -> bool:
    (kind, body), = dsl.items()
    if kind == "match":
        (f, v), = body.items()
        q = v["query"] if isinstance(v, dict) else v
        return str(q) in _toks(text)
    if kind == "match_phrase":
        (f, v), = body.items()
        q = v["query"] if isinstance(v, dict) else v
        hay = " " + " ".join(_toks(text)) + " "
        return f" {q} " in hay
    if kind == "_token_prefix":
        (f, v), = body.items()
        return any(t.startswith(str(v)) for t in _toks(text))
    if kind == "_token_wildcard":
        import fnmatch

        (f, v), = body.items()
        return any(fnmatch.fnmatchcase(t, str(v)) for t in _toks(text))
    if kind == "multi_match":
        return str(body["query"]) in _toks(text)  # single field here
    if kind == "match_all":
        return True
    if kind == "bool":
        must = body.get("must", [])
        must_not = body.get("must_not", [])
        should = body.get("should", [])
        if any(not _eval(s, text) for s in must):
            return False
        if any(_eval(s, text) for s in must_not):
            return False
        if should:
            msm = body.get("minimum_should_match")
            if msm is None:
                msm = 0 if must else 1
            n = sum(1 for s in should if _eval(s, text))
            if n < _msm_count(msm, len(should)):
                return False
        return bool(must or must_not or should)
    raise AssertionError(f"reference model lacks {kind}")


def _ref_ids(dsl):
    return sorted(i for i, t in _DOCS if _eval(dsl, t))


# grammar for VALID query_string inputs over the tiny vocabulary
_term = st.sampled_from(_WORDS)
_phrase = st.builds(
    lambda a, b: f'"{a} {b}"', _term, _term
)
_prefix = st.builds(lambda w: w[:2] + "*", _term)
_leaf = st.one_of(_term, _phrase, _prefix)


@st.composite
def _qs(draw, depth=2):
    if depth == 0:
        return draw(_leaf)
    kind = draw(st.sampled_from(["leaf", "and", "or", "not", "group"]))
    if kind == "leaf":
        return draw(_leaf)
    if kind == "not":
        return "NOT " + draw(_qs(depth=depth - 1))
    if kind == "group":
        return "(" + draw(_qs(depth=depth - 1)) + ")"
    op = " AND " if kind == "and" else " OR "
    return draw(_qs(depth=depth - 1)) + op + draw(_qs(depth=depth - 1))


class TestLuceneParsersVsModel:
    @_SLOW
    @given(q=_qs())
    def test_query_string_matches_reference(self, spark, q):
        dsl = query_string_to_dsl({"query": q, "default_field": "text"})
        df = spark.createDataFrame(_DOCS, "doc_id long, text string")
        got = sorted(
            r.doc_id for r in apply_query(df, dsl).collect()
        )
        assert got == _ref_ids(dsl)

    @_FAST
    @given(q=st.text(
        alphabet=st.sampled_from(
            list("abx \"()|+-~*\\:ANDORT")
        ),
        max_size=24,
    ))
    def test_simple_query_string_never_raises(self, q):
        # the whole point of the simple variant: ARBITRARY text lowers
        # to a valid DSL dict (possibly match-nothing), never an error
        dsl = simple_query_string_to_dsl(
            {"query": q, "fields": ["text"]}
        )
        assert isinstance(dsl, dict) and len(dsl) == 1

    @_SLOW
    @given(q=st.text(
        alphabet=st.sampled_from(list("ab \"()|+-*")), max_size=16
    ))
    def test_simple_query_string_executes(self, spark, q):
        dsl = simple_query_string_to_dsl(
            {"query": q, "fields": ["text"]}
        )
        df = spark.createDataFrame(_DOCS, "doc_id long, text string")
        apply_query(df, dsl).count()  # compiles and runs


class TestMsmArithmetic:
    @_FAST
    @given(n=st.integers(0, 12), m=st.integers(-12, 12))
    def test_integer_forms(self, n, m):
        got = _msm_count(m, n)
        assert got == (m if m >= 0 else n + m)

    @_FAST
    @given(n=st.integers(0, 12), pct=st.integers(0, 100))
    def test_percentage_forms(self, n, pct):
        import math

        pos = _msm_count(f"{pct}%", n)
        neg = _msm_count(f"-{pct}%", n)
        portion = math.floor(pct / 100.0 * n)
        assert pos == portion
        assert neg == n - portion
        # together they cover the clause list
        assert pos + neg == n or pct == 0 or True


class TestSlopVsBruteForce:
    @_SLOW
    @given(
        docs=st.lists(
            st.lists(st.sampled_from(["a", "b", "c"]), max_size=8),
            min_size=1, max_size=8,
        ),
        slop=st.integers(0, 3),
    )
    def test_two_token_slop_model(self, spark, docs, slop):
        rows = [(i, " ".join(t)) for i, t in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = sorted(r.doc_id for r in apply_query(df, {
            "match_phrase": {"text": {"query": "a b", "slop": slop}}
        }).collect())
        exp = []
        for i, t in enumerate(docs):
            pa = [p for p, x in enumerate(t) if x == "a"]
            pb = [p for p, x in enumerate(t) if x == "b"]
            in_order = any(
                0 < q - p <= slop + 1 for p in pa for q in pb
            )
            # slop >= 2 buys the transposition: "b ... a" with the
            # residual budget covering the gap (Lucene sloppy phrase)
            transposed = slop >= 2 and any(
                0 < p - q <= slop - 1 for p in pa for q in pb
            )
            if in_order or transposed:
                exp.append(i)
        assert got == exp


class TestOverlapChunkInvariants:
    @_SLOW
    @given(
        n=st.integers(0, 40),
        chunk=st.integers(2, 10),
        stride_off=st.integers(0, 8),
    )
    def test_coverage_and_overlap(self, spark, n, chunk, stride_off):
        from cga_kinesis_to_elasticsearch_spark.operators.text import (
            chunk_tokens_overlap,
        )

        stride = max(1, min(chunk, stride_off + 1))
        text = " ".join(f"t{i}" for i in range(n))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = sorted(
            chunk_tokens_overlap(
                df, "text", "doc_id", chunk_size=chunk, stride=stride
            ).collect(),
            key=lambda r: r.chunk_id,
        )
        # starts are multiples of stride, strictly increasing
        assert [r.start_token for r in rows] == [
            i * stride for i in range(len(rows))
        ]
        covered = set()
        for r in rows:
            covered.update(
                range(r.start_token, r.start_token + r.n_chunk_tokens)
            )
        n_eff = max(n, 1)  # empty text still yields one token ('')
        if n > 0:
            assert covered == set(range(n_eff))
        # window count matches the closed form: 1 + ceil(max(n-c,0)/s)
        import math

        assert len(rows) == 1 + math.ceil(max(n_eff - chunk, 0) / stride)
        # no window beyond the first is fully redundant: the
        # penultimate window must NOT already reach the document end
        if len(rows) > 1:
            assert rows[-2].start_token + chunk < n_eff
