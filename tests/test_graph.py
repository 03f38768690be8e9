"""Triangle counting / clustering coefficients (operators/graph.py)
on hand-drawn graphs with known answers."""

from __future__ import annotations

import itertools

import pytest

from cga_kinesis_to_elasticsearch_spark.operators.graph import (
    canonical_edges,
    clustering_coefficients,
    triangle_counts,
)


def _edges(spark, pairs):
    return canonical_edges(
        spark.createDataFrame(pairs, "s long, d long"), "s", "d"
    )


def _tri(spark, pairs):
    return {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(_edges(spark, pairs)).collect()
    }


class TestTriangles:
    def test_single_triangle(self, spark):
        assert _tri(spark, [(1, 2), (2, 3), (1, 3)]) == {1: 1, 2: 1, 3: 1}

    def test_chain_has_none(self, spark):
        assert _tri(spark, [(1, 2), (2, 3), (3, 4)]) == {}

    def test_k4_clique(self, spark):
        pairs = list(itertools.combinations(range(4), 2))
        # K4: each node in C(3,2)=3 triangles
        assert _tri(spark, pairs) == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_duplicate_and_reversed_edges_collapse(self, spark):
        pairs = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 1)]
        assert _tri(spark, pairs) == {1: 1, 2: 1, 3: 1}

    def test_matches_bruteforce_on_random_graph(self, spark):
        import random

        rnd = random.Random(7)
        pairs = list(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rnd.randrange(20), rnd.randrange(20)) for _ in range(80)
                )
                if a != b
            }
        )
        got = _tri(spark, pairs)
        es = set(pairs)
        want: dict[int, int] = {}
        for x, y, z in itertools.combinations(range(20), 3):
            if (x, y) in es and (y, z) in es and (x, z) in es:
                for n in (x, y, z):
                    want[n] = want.get(n, 0) + 1
        assert got == want

    def test_clustering_coefficient(self, spark):
        # node 1 neighbors {2,3,4}; edges (2,3) only -> c = 2*1/(3*2)
        pairs = [(1, 2), (1, 3), (1, 4), (2, 3)]
        rows = {
            r["node"]: (r["deg"], r["n_triangles"], r["clustering"])
            for r in clustering_coefficients(_edges(spark, pairs)).collect()
        }
        assert rows[1] == (3, 1, round(1 / 3, 6))
        assert rows[2] == (2, 1, 1.0)
        assert rows[3] == (2, 1, 1.0)
        assert 4 not in rows  # degree 1: undefined, excluded
