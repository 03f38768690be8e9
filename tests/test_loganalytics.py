"""CIDR longest-prefix enrichment + UA classification."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from cga_kinesis_to_elasticsearch_spark.operators import iplookup as IP
from cga_kinesis_to_elasticsearch_spark.operators import useragent as UA


def _nets(spark):
    # /8 at 10.0.0.0 and a nested /16 at 10.5.0.0 — same bucket
    rows = [
        Row(net_key=1, prefix_len=8, octet1=10, net_name="wide",
            net_start=10 * 16777216, net_end=11 * 16777216 - 1),
        Row(net_key=2, prefix_len=16, octet1=10, net_name="narrow",
            net_start=10 * 16777216 + 5 * 65536,
            net_end=10 * 16777216 + 6 * 65536 - 1),
    ]
    return spark.createDataFrame(rows)


class TestCidrLookup:
    def test_longest_prefix_wins_and_misses_survive(self, spark):
        facts = spark.createDataFrame(
            [
                # inside both /8 and /16 -> narrow must win
                Row(fid=1, octet1=10, ip_long=10 * 16777216 + 5 * 65536 + 7),
                # inside /8 only
                Row(fid=2, octet1=10, ip_long=10 * 16777216 + 9 * 65536),
                # bucket exists but no range matches? impossible for /8
                # floor inside bucket 10 — use a different bucket: no
                # networks at o1=99 -> NULL payload row must survive
                Row(fid=3, octet1=99, ip_long=99 * 16777216 + 1),
            ]
        )
        out = {
            r["fid"]: r
            for r in IP.enrich_longest_prefix(facts, _nets(spark)).collect()
        }
        assert out[1]["net_name"] == "narrow" and out[1]["prefix_len"] == 16
        assert out[2]["net_name"] == "wide"
        assert out[3]["net_name"] is None and out[3]["net_key"] is None
        assert len(out) == 3

    def test_tie_breaks_on_smallest_net_key(self, spark):
        dup = _nets(spark).union(
            spark.createDataFrame(
                [
                    Row(net_key=0, prefix_len=16, octet1=10, net_name="first",
                        net_start=10 * 16777216 + 5 * 65536,
                        net_end=10 * 16777216 + 6 * 65536 - 1)
                ]
            )
        )
        facts = spark.createDataFrame(
            [Row(fid=1, octet1=10, ip_long=10 * 16777216 + 5 * 65536 + 7)]
        )
        row = IP.enrich_longest_prefix(facts, dup).collect()[0]
        assert row["net_name"] == "first"

    def test_plan_is_broadcast_hash_join(self, spark):
        facts = spark.createDataFrame(
            [Row(fid=1, octet1=10, ip_long=10 * 16777216 + 1)]
        )
        plan = IP.enrich_longest_prefix(facts, _nets(spark))._jdf.queryExecution(
        ).executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_cidr_bounds(self, spark):
        df = spark.range(1).select(
            *IP.cidr_bounds(
                F.lit(10 * 16777216 + 5 * 65536 + 123), F.lit(16)
            )
        )
        start, end = df.collect()[0]
        assert start == 10 * 16777216 + 5 * 65536
        assert end == 10 * 16777216 + 6 * 65536 - 1


class TestUaClassify:
    def test_priority_order(self, spark):
        rows = [
            Row(ua="Mozilla/5.0 (Windows) Chrome/120.0.0.0 Safari/537.36"),
            Row(ua="Mozilla/5.0 (Windows) Chrome/120.0 Safari/537.36 Edg/120.0"),
            Row(ua="Mozilla/5.0 (Mac) Version/16.1 Safari/605.1.15"),
            Row(ua="Mozilla/5.0 (compatible; Googlebot/2.1)"),
            Row(ua="curl/8.4.0"),
            Row(ua="-"),
            Row(ua=None),
        ]
        out = UA.with_ua_class(spark.createDataFrame(rows), "ua").collect()
        got = {(r["ua"] or ""): (r["ua_family"], r["ua_major"], r["ua_is_bot"])
               for r in out}
        assert got["Mozilla/5.0 (Windows) Chrome/120.0.0.0 Safari/537.36"] == (
            "chrome", 120, False)
        assert got[
            "Mozilla/5.0 (Windows) Chrome/120.0 Safari/537.36 Edg/120.0"
        ] == ("edge", 120, False)
        assert got["Mozilla/5.0 (Mac) Version/16.1 Safari/605.1.15"] == (
            "safari", 16, False)
        assert got["Mozilla/5.0 (compatible; Googlebot/2.1)"] == (
            "googlebot", 2, True)
        assert got["curl/8.4.0"] == ("curl", 8, True)
        assert got["-"] == ("other", None, False)
        # NULL ua -> rlike NULL -> falls through to 'other'
        assert got[""] == ("other", None, False)

    def test_no_python_stage(self, spark):
        df = spark.createDataFrame([Row(ua="curl/8.0.0")])
        plan = UA.with_ua_class(df, "ua")._jdf.queryExecution().executedPlan(
        ).toString()
        assert "Python" not in plan and "ArrowEval" not in plan


class TestFlattenNetworks:
    def test_disjoint_and_winner(self, spark):
        flat = IP.flatten_networks(_nets(spark)).collect()
        # the /16 [5*65536, 6*65536) must carve the /8 into three
        # disjoint segments, with the /16 winning its own slice
        segs = sorted((r["seg_start"], r["seg_end"], r["net_name"]) for r in flat)
        base = 10 * 16777216
        assert segs == [
            (base, base + 5 * 65536 - 1, "wide"),
            (base + 5 * 65536, base + 6 * 65536 - 1, "narrow"),
            (base + 6 * 65536, base + 16777216 - 1, "wide"),
        ]
        # pairwise disjoint
        for (s1, e1, _), (s2, _, _) in zip(segs, segs[1:]):
            assert e1 < s2

    def test_fact_side_has_no_aggregation(self, spark):
        facts = spark.createDataFrame(
            [Row(fid=1, octet1=10, ip_long=10 * 16777216 + 1)]
        )
        plan = IP.enrich_longest_prefix(facts, _nets(spark))._jdf.queryExecution(
        ).executedPlan().toString()
        # everything after the broadcast join must be a plain project:
        # the fact stream is joined once, never grouped or windowed
        after = plan.split("BroadcastHashJoin")[0]
        assert "HashAggregate" not in after and "Window" not in after
