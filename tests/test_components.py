"""Connected components (operators/components.py)."""

from __future__ import annotations

import pytest

from cga_kinesis_to_elasticsearch_spark.operators.components import (
    connected_components,
)


def _df_edges(spark, pairs):
    return spark.createDataFrame(pairs or [(None, None)], "src long, dst long").filter(
        "src IS NOT NULL"
    )


def _df_vertices(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _union_find(ids, pairs):
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min id per component
    comp = {}
    for i in ids:
        root = find(i)
        comp.setdefault(root, []).append(i)
    return {i: min(members) for root, members in comp.items() for i in members}


def _result(spark, ids, pairs):
    out = connected_components(
        _df_vertices(spark, ids), _df_edges(spark, pairs)
    ).collect()
    return {r.id: r.component for r in out}


class TestConnectedComponents:
    def test_chain_needs_multiple_rounds(self, spark):
        """A long path graph exercises multi-round propagation (min
        label must travel the full diameter)."""
        ids = list(range(12))
        pairs = [(i, i + 1) for i in range(11)]
        assert _result(spark, ids, pairs) == {i: 0 for i in ids}

    def test_disjoint_components_and_singletons(self, spark):
        ids = list(range(8))
        pairs = [(0, 1), (1, 2), (4, 5)]
        got = _result(spark, ids, pairs)
        assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4, 6: 6, 7: 7}

    def test_matches_union_find_on_random_graph(self, spark):
        import random

        rnd = random.Random(13)
        ids = list(range(60))
        pairs = [(rnd.randrange(60), rnd.randrange(60)) for _ in range(45)]
        pairs = [(a, b) for a, b in pairs if a != b]
        assert _result(spark, ids, pairs) == _union_find(ids, pairs)

    def test_no_edges_all_singletons(self, spark):
        ids = [3, 9, 27]
        assert _result(spark, ids, []) == {3: 3, 9: 9, 27: 27}

    def test_non_convergence_raises(self, spark):
        ids = list(range(12))
        pairs = [(i, i + 1) for i in range(11)]
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(
                _df_vertices(spark, ids), _df_edges(spark, pairs), max_iter=2
            )
