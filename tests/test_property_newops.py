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
