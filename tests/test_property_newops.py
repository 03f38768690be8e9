"""Property-based tests: snapshot_diff and percolate vs brute-force
python models over hypothesis-generated inputs. One Spark round-trip
per example is slow, so each property runs a handful of examples over
adversarial generators (tiny alphabets force key collisions, empty
strings, NULLs)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from cga_kinesis_to_elasticsearch_spark.operators.diff import snapshot_diff
from cga_kinesis_to_elasticsearch_spark.operators.percolate import percolate

_SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_val = st.one_of(st.none(), st.text(alphabet="ab:|", max_size=3))
_snapshot = st.dictionaries(
    st.integers(min_value=0, max_value=9), st.tuples(_val, _val), max_size=10
)


class TestSnapshotDiffProperty:
    @_SLOW
    @given(old=_snapshot, new=_snapshot)
    def test_matches_python_model(self, spark, old, new):
        def df(snap):
            return spark.createDataFrame(
                [(k, a, b) for k, (a, b) in snap.items()],
                "k int, a string, b string",
            )

        got = {
            r["k"]: r["change"]
            for r in snapshot_diff(df(old), df(new), ["k"], ["a", "b"]).collect()
        }
        want = {}
        for k in set(old) | set(new):
            if k not in old:
                want[k] = "added"
            elif k not in new:
                want[k] = "removed"
            elif old[k] == new[k]:
                want[k] = "unchanged"
            else:
                want[k] = "changed"
        assert got == want


_tok = st.text(alphabet="xyz", min_size=1, max_size=2)
_docs = st.dictionaries(
    st.integers(min_value=0, max_value=5),
    st.frozensets(_tok, max_size=4),
    max_size=6,
)
_queries = st.dictionaries(
    st.integers(min_value=0, max_value=3),
    st.tuples(
        st.frozensets(_tok, min_size=1, max_size=3),
        st.frozensets(_tok, max_size=2),
    ),
    max_size=4,
)


class TestPercolateProperty:
    @_SLOW
    @given(docs=_docs, qs=_queries)
    def test_matches_python_model(self, spark, docs, qs):
        doc_terms = spark.createDataFrame(
            [(d, t) for d, toks in docs.items() for t in toks]
            or [(None, None)],
            "doc_id int, token string",
        ).where("doc_id is not null")
        queries = spark.createDataFrame(
            [(str(q), sorted(m), sorted(mn)) for q, (m, mn) in qs.items()]
            or [(None, None, None)],
            "query_id string, must array<string>, must_not array<string>",
        ).where("query_id is not null")
        got = {
            (r["doc_id"], r["query_id"])
            for r in percolate(doc_terms, queries).collect()
        }
        want = {
            (d, str(q))
            for d, toks in docs.items()
            for q, (m, mn) in qs.items()
            if m <= toks and not (mn & toks)
        }
        assert got == want


class TestClosureProperty:
    @_SLOW
    @given(
        parents=st.lists(
            st.integers(min_value=0, max_value=11), min_size=1, max_size=12
        )
    )
    def test_matches_python_model(self, spark, parents):
        """Random functional graphs condensed to forests: node i points
        at parents[i] clamped to a lower id (guarantees acyclicity,
        including self-roots), then pointer doubling must equal the
        obvious python walk."""
        from cga_kinesis_to_elasticsearch_spark.operators.hierarchy import (
            closure_root_depth,
        )

        forest = {
            i: (min(p, i - 1) if i > 0 else None)
            for i, p in enumerate(parents)
        }
        rows = [(i, forest[i]) for i in forest]
        nodes = spark.createDataFrame(rows, "id long, parent long")
        got = {
            r["id"]: (r["root"], r["depth"])
            for r in closure_root_depth(nodes).collect()
        }

        def walk(i):
            d = 0
            while forest[i] is not None:
                i = forest[i]
                d += 1
            return i, d

        assert got == {i: walk(i) for i in forest}


class TestKcoreProperty:
    @_SLOW
    @given(
        edges=st.sets(
            st.tuples(
                st.integers(min_value=0, max_value=7),
                st.integers(min_value=0, max_value=7),
            ),
            max_size=14,
        ),
        k=st.integers(min_value=1, max_value=3),
    )
    def test_matches_python_peel(self, spark, edges, k):
        from cga_kinesis_to_elasticsearch_spark.operators.graph import kcore

        canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
        if not canon:
            return

        def peel(es, rounds):
            cur = set(es)
            for _ in range(rounds):
                deg: dict[int, int] = {}
                for a, b in cur:
                    deg[a] = deg.get(a, 0) + 1
                    deg[b] = deg.get(b, 0) + 1
                keep = {n for n, d in deg.items() if d >= k}
                cur = {(a, b) for a, b in cur if a in keep and b in keep}
            deg = {}
            for a, b in cur:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            return {(n, d) for n, d in deg.items() if d >= k}

        rounds = 8  # > max peel depth for 8 nodes
        df = spark.createDataFrame(sorted(canon), "a long, b long")
        got = {(r.n, r.deg) for r in kcore(df, k, rounds).collect()}
        assert got == peel(canon, rounds)


class TestWeakLabelProperty:
    @_SLOW
    @given(
        docs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=500),  # n_chars
                st.sampled_from(["en", "de", "xx"]),
                st.sampled_from(["src0", "src5"]),
                st.text(alphabet="a1", max_size=8),
            ),
            min_size=1,
            max_size=12,
        )
    )
    def test_majority_matches_python_model(self, spark, docs):
        from cga_kinesis_to_elasticsearch_spark.operators.weaklabel import (
            default_lf_bank,
            weak_label_votes,
        )

        rows = [
            (i, text, lang, src, n) for i, (n, lang, src, text) in enumerate(docs)
        ]
        df = spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        )

        def votes(n, lang, src, text):
            v = []
            v.append(-1 if n < 150 else 0)
            v.append(1 if n >= 350 else 0)
            v.append(1 if lang == "en" else 0)
            v.append(-1 if src in ("src0", "src1", "src2") else 0)
            v.append(-1 if sum(c.isdigit() for c in text) >= 5 else 0)
            return v

        got = {
            r.doc_id: (r.n_pos, r.n_neg, r.label)
            for r in weak_label_votes(df, default_lf_bank()).collect()
        }
        for i, (n, lang, src, text) in enumerate(docs):
            v = votes(n, lang, src, text)
            p, m = v.count(1), v.count(-1)
            lab = 1 if p > m else (-1 if p < m else 0)
            assert got[i] == (p, m, lab), (i, v)
