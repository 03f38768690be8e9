"""Property-based tests for the round-3 additions: curriculum
equi-depth invariants, cross-source priority-dedup keep rule (vs a
python model), and ES-bulk action serialization (pure function —
cheap, many examples)."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row

from cga_kinesis_to_elasticsearch_spark.sinks.esbulk_sink import _serialize

_SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# documents with tiny-alphabet texts: forces score ties (curriculum
# value-atomicity) and content-hash collisions (dedup groups)
_text = st.lists(
    st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=6
).map(" ".join)
_corpus = st.dictionaries(
    st.integers(min_value=0, max_value=30), _text, min_size=2, max_size=12
)


def _write_docs(spark, tmpdir, corpus, sources=None):
    rows = [
        (
            k,
            v,
            (sources or {}).get(k, f"src{k % 4}"),
            len(v),
        )
        for k, v in corpus.items()
    ]
    import pandas as pd

    pd.DataFrame(
        rows, columns=["doc_id", "text", "source", "n_chars"]
    ).to_parquet(f"{tmpdir}/documents.parquet")
    return tmpdir


class TestCurriculumProperty:
    @_SLOW
    @given(corpus=_corpus)
    def test_equidepth_invariants(self, spark, tmp_path_factory, corpus):
        from cga_kinesis_to_elasticsearch_spark.plans.traindata import (
            _curriculum_epochs,
        )

        d = _write_docs(
            spark, str(tmp_path_factory.mktemp("cur")), corpus
        )
        rows = sorted(
            _curriculum_epochs(spark, d).collect(), key=lambda r: r.epoch
        )
        # partition: every doc in exactly one epoch
        assert sum(r.n_docs for r in rows) == len(corpus)
        # monotone non-overlapping score ranges, no empty epochs
        for a, b in zip(rows, rows[1:]):
            assert a.hi_score < b.lo_score
        assert all(r.n_docs >= 1 for r in rows)
        # value-atomicity + equi-depth: each epoch starts at the first
        # score whose preceding cumulative count maps to its quartile
        scores = sorted(
            len(set(t for t in v.split() if t)) for v in corpus.values()
        )
        n = len(scores)
        # python model of the histogram-CDF assignment
        from collections import Counter

        hist = Counter(scores)
        cum = 0
        model = {}
        for s in sorted(hist):
            model[s] = min(4, 1 + (4 * cum) // n)
            cum += hist[s]
        for r in rows:
            for s in range(int(r.lo_score), int(r.hi_score) + 1):
                if s in model:
                    assert model[s] == r.epoch, (s, model[s], r)


class TestPriorityDedupProperty:
    @_SLOW
    @given(
        corpus=_corpus,
        prios=st.lists(
            st.integers(min_value=0, max_value=3), min_size=31, max_size=31
        ),
    )
    def test_keep_rule_matches_python_model(
        self, spark, tmp_path_factory, corpus, prios
    ):
        from cga_kinesis_to_elasticsearch_spark.plans.traindata import (
            _cross_source_priority_dedup,
        )

        sources = {k: f"src{prios[k]}" for k in corpus}
        d = _write_docs(
            spark, str(tmp_path_factory.mktemp("pd")), corpus, sources
        )
        got = {
            r.source: (r.n_docs, r.n_kept, r.n_dropped)
            for r in _cross_source_priority_dedup(spark, d).collect()
        }
        # python model: winner per text group = min (priority, doc_id)
        groups: dict[str, list[int]] = {}
        for k, v in corpus.items():
            groups.setdefault(v, []).append(k)
        kept_ids = {
            min(ids, key=lambda i: (prios[i], i)) for ids in groups.values()
        }
        want: dict[str, list[int]] = {}
        for k in corpus:
            n, kp = want.setdefault(sources[k], [0, 0])
            want[sources[k]][0] += 1
            want[sources[k]][1] += 1 if k in kept_ids else 0
        for src, (n, kp) in want.items():
            assert got[src] == (n, kp, n - kp), src
        # exactly one survivor per content group
        assert sum(v[1] for v in got.values()) == len(groups)


_payload = st.dictionaries(
    st.sampled_from(["value", "text", "n", "flag"]),
    st.one_of(
        st.none(),
        st.integers(-(2**40), 2**40),
        st.text(max_size=8),
        st.booleans(),
    ),
    max_size=4,
)


class TestBulkSerializeProperty:
    @settings(max_examples=200, deadline=None)
    @given(doc_id=st.text(min_size=1, max_size=6), payload=_payload)
    def test_roundtrips_and_separates_meta(self, doc_id, payload):
        row = Row(doc_id=doc_id, es_index="idx-1", **payload)
        meta_line, src_line = _serialize(row, "doc_id", "es_index").split(
            "\n"
        )
        meta, src = json.loads(meta_line), json.loads(src_line)
        assert meta == {"index": {"_index": "idx-1", "_id": str(doc_id)}}
        assert set(src) == set(payload)
        for k, v in payload.items():
            assert src[k] == v
        # deterministic bytes: same row serializes identically
        assert _serialize(row, "doc_id", "es_index") == (
            meta_line + "\n" + src_line
        )


# --- query-DSL compiler vs a python evaluator over random bool trees


def _py_eval(dsl, row):
    """Reference evaluator with SQL three-valued logic collapsed to
    filter semantics (None/False both exclude)."""
    (kind, body), = dsl.items()
    if kind == "term":
        (f, v), = body.items()
        return row[f] is not None and row[f] == v
    if kind == "range":
        (f, bounds), = body.items()
        if row[f] is None:
            return False
        ok = True
        for b, v in bounds.items():
            ok &= {
                "gte": row[f] >= v,
                "gt": row[f] > v,
                "lte": row[f] <= v,
                "lt": row[f] < v,
            }[b]
        return ok
    if kind == "exists":
        return row[body["field"]] is not None
    if kind == "match":
        (f, v), = body.items()
        if row[f] is None:
            return False
        toks = set(row[f].split())
        return any(t in toks for t in v.split())
    if kind == "bool":
        musts = body.get("must", [])
        must_nots = body.get("must_not", [])
        shoulds = body.get("should", [])
        ok = all(_py_eval(m, row) for m in musts)
        ok &= all(not _py_eval(m, row) for m in must_nots)
        if shoulds:
            msm = body.get(
                "minimum_should_match", 0 if musts else 1
            )
            if msm > 0:
                ok &= sum(_py_eval(s, row) for s in shoulds) >= msm
        return ok
    raise AssertionError(kind)


_leaf = st.one_of(
    st.builds(lambda v: {"term": {"lang": v}}, st.sampled_from(["en", "de", None])),
    st.builds(
        lambda lo, hi: {"range": {"n": {"gte": lo, "lt": hi}}},
        st.integers(0, 50),
        st.integers(0, 50),
    ),
    st.builds(lambda f: {"exists": {"field": f}}, st.sampled_from(["lang", "text"])),
    st.builds(
        lambda w: {"match": {"text": w}},
        st.sampled_from(["alpha", "beta", "alpha beta", "zeta"]),
    ),
)
_bool_tree = st.builds(
    lambda must, must_not, should, msm: {
        "bool": {
            k: v
            for k, v in (
                ("must", must),
                ("must_not", must_not),
                ("should", should),
            )
            if v
        }
        | ({"minimum_should_match": msm} if should and msm else {})
    },
    st.lists(_leaf, max_size=2),
    st.lists(_leaf, max_size=1),
    st.lists(_leaf, max_size=3),
    st.integers(0, 2),
)


class TestQueryDslProperty:
    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(dsl=_bool_tree)
    def test_matches_python_model(self, spark, dsl):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            apply_query,
        )

        rows = [
            {"id": 1, "text": "alpha beta", "n": 10, "lang": "en"},
            {"id": 2, "text": "beta", "n": 25, "lang": "de"},
            {"id": 3, "text": None, "n": 40, "lang": None},
            {"id": 4, "text": "zeta alpha", "n": None, "lang": "en"},
        ]
        # term {lang: None} is not legal ES; normalize to exists-not
        def legal(d):
            (kind, body), = d.items()
            if kind == "term":
                (f, v), = body.items()
                return v is not None
            if kind == "bool":
                return all(
                    legal(s)
                    for k in ("must", "must_not", "should")
                    for s in body.get(k, [])
                )
            return True

        from hypothesis import assume

        assume(legal(dsl))
        df = spark.createDataFrame(
            [(r["id"], r["text"], r["n"], r["lang"]) for r in rows],
            "id long, text string, n long, lang string",
        )
        got = sorted(r.id for r in apply_query(df, dsl).collect())
        want = sorted(r["id"] for r in rows if _py_eval(dsl, r))
        assert got == want, dsl
