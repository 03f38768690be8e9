"""Bloom-prefiltered semi join (operators/bloom.py): no false
negatives, measurable pruning, and the prefilter staying glued to the
fact scan (below the exchange)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cga_kinesis_to_elasticsearch_spark.io import load_table
from cga_kinesis_to_elasticsearch_spark.operators.bloom import (
    WORD_BITS,
    bloom_bucket,
    bloom_might_contain,
    bloom_prefilter,
    bloom_semi_join,
    build_bloom,
)


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey").cache()
    orders = load_table(spark, sf_dir, "orders")
    dim = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
        .cache()
    )
    return li, dim


@pytest.fixture(scope="module")
def words(spark, tables):
    _, dim = tables
    return build_bloom(dim, "o_orderkey")


class TestBloomSemiJoin:
    def test_no_false_negatives(self, spark, tables):
        li, dim = tables
        got = bloom_semi_join(li, dim, "l_orderkey", "o_orderkey")
        exact = li.join(
            dim.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_semi",
        )
        assert got.count() == exact.count()

    def test_words_encode_exactly_the_key_buckets(self, spark, tables, words):
        """The packed words decode back to precisely the dim keys'
        bucket set — construction is exact, not approximate."""
        _, dim = tables
        for j, probe_words in enumerate(words):
            want = {
                r.b
                for r in dim.select(
                    bloom_bucket(F.col("o_orderkey").cast("string"), j).alias("b")
                ).collect()
            }
            got = {
                wi * WORD_BITS + bit
                for wi, w in enumerate(probe_words)
                for bit in range(WORD_BITS)
                if (w >> bit) & 1
            }
            assert got == want

    def test_prefilter_prunes_most_nonmatches(self, spark, tables, words):
        li, dim = tables
        passed = li.filter(
            bloom_might_contain(F.col("l_orderkey").cast("string"), words)
        ).count()
        total = li.count()
        exact = li.join(
            dim.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_semi",
        ).count()
        assert exact <= passed
        fp = passed - exact
        # m=65536, k=2, a few hundred keys at sf0.001 -> tiny FP tail
        assert fp <= 0.05 * (total - exact)

    def test_filter_size_independent_of_keys(self, words):
        assert [len(w) for w in words] == [65536 // WORD_BITS] * 2

    def test_prefilter_stays_below_the_exchange(self, spark, tables):
        """With the dim too big to broadcast (forced), the semi join
        needs an exchange of the fact side — the bloom Filter must sit
        BELOW it (tree-printed deeper), on the fact scan, so only
        probable matches shuffle. This is the regression test for
        Catalyst's join reordering hoisting a cross-join-shaped probe
        above the semi join."""
        li, dim = tables
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
            plan = (
                bloom_semi_join(li, dim, "l_orderkey", "o_orderkey")
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old)
        lines = plan.splitlines()
        filt = [i for i, l in enumerate(lines) if "Filter" in l and "getbit" in l]
        exch = [i for i, l in enumerate(lines) if "Exchange hashpartitioning" in l]
        assert filt and exch, plan
        # deeper in the printed tree = larger line index
        assert min(filt) > min(exch)

    def test_fused_prefilter_matches_per_probe_predicate(
        self, spark, tables, words
    ):
        """bloom_prefilter (one md5/conv via the explode barrier) passes
        exactly the same rows as the per-probe bloom_might_contain."""
        li, _ = tables
        fused = {
            r.l_orderkey
            for r in bloom_prefilter(
                li, F.col("l_orderkey").cast("string"), words
            ).collect()
        }
        per_probe = {
            r.l_orderkey
            for r in li.filter(
                bloom_might_contain(F.col("l_orderkey").cast("string"), words)
            ).collect()
        }
        assert fused == per_probe

    def test_fused_prefilter_evaluates_one_md5(self, spark, tables, words):
        """The executed plan must contain exactly ONE md5 call — the
        point of the explode barrier (withColumn staging gets pushdown-
        substituted back to one md5 per probe)."""
        li, _ = tables
        plan = (
            bloom_prefilter(li, F.col("l_orderkey").cast("string"), words)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("md5") == 1, plan

    def test_fused_prefilter_drops_null_keys(self, spark, words):
        # equi-join semantics: a NULL key can never match, so the
        # prefilter must drop it (md5(NULL) -> NULL probes -> false)
        df = spark.createDataFrame(
            [(None,), (1,)], "l_orderkey long"
        )
        got = bloom_prefilter(
            df, F.col("l_orderkey").cast("string"), words
        ).collect()
        assert all(r.l_orderkey is not None for r in got)

    def test_empty_dim_rejects_everything(self, spark, tables):
        li, dim = tables
        empty = dim.filter(F.lit(False))
        assert bloom_semi_join(li, empty, "l_orderkey", "o_orderkey").count() == 0


class TestWideBuckets:
    def test_hex8_buckets_do_not_overflow(self, spark):
        """8 hex chars reach 2^32-1 — an int cast would throw under
        ANSI or yield NULL silently; buckets past 2^31 must survive."""
        keys = spark.range(500).select(F.col("id").cast("string").alias("k"))
        got = keys.select(
            bloom_bucket(F.col("k"), probe=0, hex_chars=8).alias("b")
        ).collect()
        assert all(r.b is not None and 0 <= r.b < 2**32 for r in got)
        assert any(r.b >= 2**31 for r in got)  # the overflow zone is hit

    def test_probe_budget_guard(self):
        with pytest.raises(ValueError, match="hex budget"):
            bloom_bucket(F.lit("x"), probe=4, hex_chars=8)
