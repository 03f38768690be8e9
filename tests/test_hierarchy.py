"""Pointer-doubling ancestor closure (operators/hierarchy.py)."""

import pytest
from pyspark.sql import Row, functions as F

from cga_kinesis_to_elasticsearch_spark.operators.hierarchy import (
    closure_root_depth,
)


def _forest(spark, pairs):
    return spark.createDataFrame(
        [Row(id=i, parent=p) for i, p in pairs], "id long, parent long"
    )


class TestClosureRootDepth:
    def test_small_forest(self, spark):
        # 1 -> root; 2,3 children of 1; 4 child of 3; 10 isolated root
        nodes = _forest(
            spark, [(1, None), (2, 1), (3, 1), (4, 3), (10, None)]
        )
        got = {
            r["id"]: (r["root"], r["depth"])
            for r in closure_root_depth(nodes).collect()
        }
        assert got == {
            1: (1, 0),
            2: (1, 1),
            3: (1, 1),
            4: (1, 2),
            10: (10, 0),
        }

    def test_deep_chain_logarithmic(self, spark):
        # chain of depth 200: pointer doubling must finish in
        # ceil(log2(200)) + 1 = 9 rounds — max_iter=9 proves the
        # doubling (a per-level loop would need 200).
        pairs = [(1, None)] + [(i, i - 1) for i in range(2, 202)]
        nodes = _forest(spark, pairs)
        out = closure_root_depth(nodes, max_iter=9)
        rows = {r["id"]: r["depth"] for r in out.collect()}
        assert rows[201] == 200 and rows[1] == 0 and rows[100] == 99
        assert out.where(F.col("root") != 1).count() == 0

    def test_cycle_raises(self, spark):
        nodes = _forest(spark, [(1, 2), (2, 1)])
        with pytest.raises(RuntimeError, match="did not converge"):
            closure_root_depth(nodes, max_iter=5)

    def test_all_roots_fixpoint(self, spark):
        nodes = _forest(spark, [(1, None), (2, None)])
        got = closure_root_depth(nodes).collect()
        assert {(r["id"], r["root"], r["depth"]) for r in got} == {
            (1, 1, 0),
            (2, 2, 0),
        }

    def test_dangling_parent_raises(self, spark):
        nodes = _forest(spark, [(1, None), (2, 99)])
        with pytest.raises(ValueError, match="dangling parent"):
            closure_root_depth(nodes)
