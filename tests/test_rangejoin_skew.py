"""Range join (operators/rangejoin.py) and salted aggregation
(operators/skew.py) semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.operators.rangejoin import range_join
from cga_kinesis_to_elasticsearch_spark.operators.skew import salted_agg


@pytest.fixture(scope="module")
def pts(spark):
    return spark.createDataFrame(
        [("p1", 50), ("p2", 150), ("p3", 250), ("p4", 100)],
        "pid string, t long",
    )


@pytest.fixture(scope="module")
def ivs(spark):
    return spark.createDataFrame(
        [("i1", 0, 100), ("i2", 90, 200), ("i3", 400, 500)],
        "iid string, s long, e long",
    )


class TestRangeJoin:
    def test_inner_containment(self, pts, ivs):
        out = {
            (r.pid, r.iid)
            for r in range_join(pts, ivs, "t", "s", "e", bin_width=64).collect()
        }
        # p1@50 in i1; p2@150 in i2; p4@100 in BOTH (inclusive ends)
        assert out == {("p1", "i1"), ("p2", "i2"), ("p4", "i1"), ("p4", "i2")}

    def test_bin_width_invariance(self, pts, ivs):
        for bw in (1, 7, 50, 1000):
            n = range_join(pts, ivs, "t", "s", "e", bin_width=bw).count()
            assert n == 4, f"bin_width={bw}"

    def test_left_keeps_unmatched_points(self, pts, ivs):
        out = range_join(pts, ivs, "t", "s", "e", bin_width=64, how="left")
        rows = {(r.pid, r.iid) for r in out.collect()}
        assert ("p3", None) in rows  # 250 is in no interval
        assert out.count() == 5

    def test_no_duplicate_candidates_across_bins(self, spark):
        # an interval spanning many bins must still match a point once
        p = spark.createDataFrame([("p", 500)], "pid string, t long")
        i = spark.createDataFrame([("i", 0, 1000)], "iid string, s long, e long")
        assert range_join(p, i, "t", "s", "e", bin_width=10).count() == 1


class TestSaltedAgg:
    def test_equals_plain_groupby_on_skewed_data(self, spark):
        # 10k rows of one hot key + a long tail
        hot = spark.range(10000).select(
            F.lit("hot").alias("k"), F.col("id").alias("v")
        )
        tail = spark.range(100).select(
            F.concat(F.lit("t"), (F.col("id") % 7).cast("string")).alias("k"),
            F.col("id").alias("v"),
        )
        df = hot.unionAll(tail)
        salted = {
            r.k: (r.n, r.total, r.lo, r.hi)
            for r in salted_agg(
                df,
                ["k"],
                {
                    "n": ("count", "v"),
                    "total": ("sum", "v"),
                    "lo": ("min", "v"),
                    "hi": ("max", "v"),
                },
                salt_col="v",
            ).collect()
        }
        plain = {
            r.k: (r.n, r.total, r.lo, r.hi)
            for r in df.groupBy("k")
            .agg(
                F.count("v").alias("n"),
                F.sum("v").alias("total"),
                F.min("v").alias("lo"),
                F.max("v").alias("hi"),
            )
            .collect()
        }
        assert salted == plain

    def test_rejects_non_decomposable(self, spark):
        df = spark.range(5).select(F.lit("k").alias("k"), F.col("id").alias("v"))
        with pytest.raises(ValueError, match="non-decomposable"):
            salted_agg(df, ["k"], {"a": ("avg", "v")}, salt_col="v")


class TestSaltedJoin:
    """salted_join (operators/skew.py): exact equality with the plain
    join on heavily skewed keys, for inner and left flavors."""

    def _skewed(self, spark):
        # 90% of rows share one hot key; dim covers half the key space
        rows = [(i, "hot" if i % 10 else "cold%d" % (i % 7)) for i in range(600)]
        big = spark.createDataFrame(rows, "event_id long, k string")
        dim = spark.createDataFrame(
            [("hot", 1), ("cold1", 2), ("cold3", 3)], "k string, v int"
        )
        return big, dim

    def test_inner_equals_plain_join(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.skew import salted_join

        big, dim = self._skewed(spark)
        got = salted_join(big, dim, on=["k"], salt_col="event_id", n_salts=7)
        want = big.join(dim, "k")
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    def test_left_keeps_unmatched_rows(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.skew import salted_join

        big, dim = self._skewed(spark)
        got = salted_join(
            big, dim, on=["k"], salt_col="event_id", n_salts=5, how="left"
        )
        want = big.join(dim, "k", "left")
        assert sorted(
            map(tuple, got.fillna(-1).collect())
        ) == sorted(map(tuple, want.fillna(-1).collect()))

    def test_rejects_right_join(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.skew import salted_join

        big, dim = self._skewed(spark)
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(big, dim, on=["k"], salt_col="event_id", how="right")


class TestKeySkewReport:
    def _report(self, spark, key_rows, top_n=10):
        from cga_kinesis_to_elasticsearch_spark.operators.skew import (
            key_skew_report,
        )

        df = spark.createDataFrame([(k,) for k in key_rows], ["k"])
        return key_skew_report(df, "k", top_n=top_n).collect()[0]

    def test_matches_bruteforce_gini(self, spark):
        # skewed: key 0 hot, long tail
        rows = [0] * 50 + [1] * 20 + [2] * 20 + list(range(3, 13))
        r = self._report(spark, rows, top_n=3)
        counts = sorted([50, 20, 20] + [1] * 10)
        m, tot = len(counts), sum(counts)
        sum_ic = sum((i + 1) * c for i, c in enumerate(counts))
        gini = (2 * sum_ic - (m + 1) * tot) / (m * tot)
        assert r.n_keys == m and r.n_rows == tot and r.max_count == 50
        assert r.gini == round(gini, 9)
        assert r.topn_share == round(90 / tot, 9)

    def test_uniform_keys_gini_zero(self, spark):
        r = self._report(spark, list(range(20)) * 3)
        assert r.gini == 0.0
        assert r.max_count == 3
        assert r.avg_per_key == 3.0

    def test_topn_boundary_tie_is_stable(self, spark):
        # 5 keys tie at count 2; top_n=3 must take exactly 3 of them
        r = self._report(spark, [1, 1, 2, 2, 3, 3, 4, 4, 5, 5], top_n=3)
        assert r.topn_share == round(6 / 10, 9)
