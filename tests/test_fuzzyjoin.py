"""Fuzzy edit-distance-1 join via deletion-neighborhood blocking."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.operators.fuzzyjoin import (
    deletion_neighborhood,
    fuzzy_join_edit1,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


class TestNeighborhood:
    def test_contains_self_and_deletions(self, spark):
        df = spark.createDataFrame([("abc",)], "s string")
        out = set(
            df.select(
                F.explode(deletion_neighborhood(F.col("s"))).alias("v")
            ).toPandas()["v"]
        )
        assert out == {"abc", "bc", "ac", "ab"}

    def test_single_char(self, spark):
        df = spark.createDataFrame([("a",)], "s string")
        out = set(
            df.select(
                F.explode(deletion_neighborhood(F.col("s"))).alias("v")
            ).toPandas()["v"]
        )
        assert out == {"a", ""}


class TestFuzzyJoin:
    def _join(self, spark, lefts, rights):
        l = spark.createDataFrame([(s,) for s in lefts], "k string")
        r = spark.createDataFrame([(s,) for s in rights], "s string")
        return {
            (row.l_key, row.r_key): row.distance
            for row in fuzzy_join_edit1(l, r, "k", "s").collect()
        }

    def test_sub_ins_del_exact(self, spark):
        got = self._join(
            spark, ["cat", "cart", "ct", "dog"], ["cat", "cog"]
        )
        assert got[("cat", "cat")] == 0
        assert got[("cart", "cat")] == 1  # deletion
        assert got[("ct", "cat")] == 1  # insertion
        assert got[("dog", "cog")] == 1  # substitution
        assert ("dog", "cat") not in got

    def test_false_positives_filtered(self, spark):
        # "ab"/"ba" share deletion variants but are at distance 2
        assert self._join(spark, ["ab"], ["ba"]) == {}

    @given(
        lefts=st.lists(
            st.text(alphabet="abc", min_size=1, max_size=4),
            min_size=1,
            max_size=6,
            unique=True,
        ),
        rights=st.lists(
            st.text(alphabet="abc", min_size=1, max_size=4),
            min_size=1,
            max_size=6,
            unique=True,
        ),
    )
    @settings(max_examples=15, deadline=None)
    def test_recall_equals_brute_force(self, spark, lefts, rights):
        expected = {
            (a, b): _lev(a, b)
            for a in lefts
            for b in rights
            if _lev(a, b) <= 1
        }
        assert self._join(spark, lefts, rights) == expected
