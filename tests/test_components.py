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
                _df_vertices(spark, ids),
                _df_edges(spark, pairs),
                max_iter=2,
                driver_threshold=0,  # force the distributed loop
            )

    def test_driver_and_distributed_paths_agree(self, spark):
        """The union-find fast path must replay the propagation
        fixpoint exactly — same labels, same output row set."""
        import random

        rnd = random.Random(99)
        ids = list(range(40))
        pairs = [(rnd.randrange(40), rnd.randrange(40)) for _ in range(30)]
        pairs = [(a, b) for a, b in pairs if a != b]
        fast = connected_components(
            _df_vertices(spark, ids), _df_edges(spark, pairs)
        ).collect()
        slow = connected_components(
            _df_vertices(spark, ids),
            _df_edges(spark, pairs),
            driver_threshold=0,
        ).collect()
        assert {(r.id, r.component) for r in fast} == {
            (r.id, r.component) for r in slow
        }

    def test_string_ids_take_typeagnostic_convergence(self, spark):
        """Non-numeric ids: the decimal-sum convergence metric would
        yield NULL == NULL after round one and silently return
        partially-propagated labels; the fallback set-difference check
        must propagate a min-label across the full diameter."""
        ids = [f"doc{i:02d}" for i in range(8)]
        pairs = [(f"doc{i:02d}", f"doc{i + 1:02d}") for i in range(7)]
        vertices = spark.createDataFrame([(i,) for i in ids], "id string")
        edges = spark.createDataFrame(pairs, "src string, dst string")
        out = connected_components(
            vertices, edges, driver_threshold=0
        ).collect()
        assert {r.id: r.component for r in out} == {i: "doc00" for i in ids}

    def test_many_isolated_vertices_fall_through_to_distributed(self, spark):
        """Few edges but a vertex set over the threshold: the fast path
        must NOT collect the vertices; the distributed loop handles it
        (ADVICE r09: edge-count-only gating would OOM the driver on a
        billion-singleton frame)."""
        ids = list(range(20))
        pairs = [(0, 1)]
        got = {
            r.id: r.component
            for r in connected_components(
                _df_vertices(spark, ids),
                _df_edges(spark, pairs),
                driver_threshold=5,  # edges (2 sym rows) pass, 20 vertices do not
            ).collect()
        }
        expect = {i: i for i in ids}
        expect[1] = 0
        assert got == expect

    def test_driver_path_seeds_labels_from_vertices_only(self, spark):
        """An edge endpoint outside the vertex set joins its
        component (labelled by the minimum VERTEX id, even when the
        outsider's id is smaller) and an all-outsider component is
        absent — the exact distributed-fixpoint semantics."""
        got = _result(spark, [5], [(5, 3), (100, 101)])
        assert got == {5: 5, 3: 5}


class TestFuzzyDedup:
    """End-to-end fuzzy dedup (operators/dedup.fuzzy_dedup): the verify
    stage must reject low-Jaccard LSH collisions, clusters must merge
    transitively, and exactly one doc per cluster survives."""

    def _corpus(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again today"
        rows = [
            # cluster {1,2,3}: near-identical (one-word edits)
            (1, base),
            (2, base.replace("today", "tomorrow")),
            (3, base.replace("quick", "swift")),
            # 4: unrelated
            (4, "completely different content about spark engines and parquet files"),
            # 5: shares a few words with 1 but far below threshold
            (5, "the dog sat alone watching boats drift slowly past the harbor wall"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_clusters_and_keep_list(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.dedup import fuzzy_dedup

        out = fuzzy_dedup(
            self._corpus(spark), "text", "doc_id", n_hashes=8, band_size=2
        ).collect()
        by_id = {r.doc_id: r for r in out}
        assert len(by_id) == 5
        # 1,2,3 collapse into one cluster with canonical 1
        assert {by_id[i].component for i in (1, 2, 3)} == {1}
        assert by_id[1].kept and not by_id[2].kept and not by_id[3].kept
        assert by_id[1].cluster_size == 3
        # 4 and 5 stay singletons (5's overlap with 1 is below 0.7)
        for i in (4, 5):
            assert by_id[i].component == i and by_id[i].kept
            assert by_id[i].cluster_size == 1

    def test_verify_rejects_low_jaccard_pairs(self, spark):
        """With a strict threshold (1/1 = exact token-set equality) even
        near-identical docs keep their own cluster — proving the verify
        stage, not LSH banding, decides the edge set."""
        from cga_kinesis_to_elasticsearch_spark.operators.dedup import fuzzy_dedup

        out = fuzzy_dedup(
            self._corpus(spark), "text", "doc_id",
            n_hashes=8, band_size=2, threshold_num=1, threshold_den=1,
        ).collect()
        assert all(r.kept and r.cluster_size == 1 for r in out)
