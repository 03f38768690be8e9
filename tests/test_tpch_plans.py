"""Physical-plan assertions for the adapted TPC-H query shapes
(plans/tpch_extra.py): pushdown, broadcast strategy, and shuffle counts
— the properties that decide whether these plans survive a 100x
scale-up, pinned against regressions.
"""

from __future__ import annotations

import pytest

from cga_kinesis_to_elasticsearch_spark.plans import queries


@pytest.fixture(scope="module")
def qs():
    return queries()


def _plan(df) -> str:
    # formatted mode: full (untruncated) PushedFilters / ReadSchema
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


class TestPushdown:
    def test_q6_all_predicates_reach_scan(self, spark, sf_dir, qs):
        plan = _plan(qs["q6_forecast_revenue"](spark, sf_dir))
        pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
        for token in (
            "GreaterThanOrEqual(l_shipdate",
            "LessThan(l_shipdate",
            "GreaterThanOrEqual(l_discount,0.05)",
            "LessThanOrEqual(l_discount,0.07)",
            "LessThan(l_quantity,24.0)",
        ):
            assert token in pushed, f"missing pushed filter {token}"

    def test_q6_scan_prunes_columns(self, spark, sf_dir, qs):
        plan = _plan(qs["q6_forecast_revenue"](spark, sf_dir))
        schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
        # only the 4 referenced columns, not all 11
        assert schema.count(":") <= 6
        for col in ("l_quantity", "l_extendedprice", "l_discount", "l_shipdate"):
            assert col in schema
        assert "l_orderkey" not in schema


class TestJoinStrategy:
    @pytest.mark.parametrize(
        "name,min_broadcasts",
        [
            ("q2_min_supplier", 4),
            ("q5_regional_revenue", 4),
            ("q7_volume_shipping", 4),
            ("q8_market_share", 6),
            ("q9_product_profit", 3),
            ("q10_returned_items", 2),
        ],
    )
    def test_dims_broadcast_not_shuffled(
        self, spark, sf_dir, qs, name, min_broadcasts
    ):
        """Every dimension side must be a broadcast join; a SortMergeJoin
        against nation/region/part/supplier/customer would shuffle the
        fact table once per dim at scale."""
        plan = _plan(qs[name](spark, sf_dir))
        assert plan.count("BroadcastHashJoin") >= min_broadcasts
        assert "SortMergeJoin" not in plan

    @pytest.mark.parametrize(
        "name", ["q11_important_parts", "q15_top_supplier", "q22_global_sales"]
    )
    def test_scalar_subqueries_broadcast(self, spark, sf_dir, qs, name):
        """The 1-row aggregate (threshold / max / average) joins via
        broadcast, never a cartesian shuffle."""
        plan = _plan(qs[name](spark, sf_dir))
        assert "BroadcastExchange" in plan
        assert "CartesianProduct" not in plan

    def test_q16_anti_join_broadcast(self, spark, sf_dir, qs):
        plan = _plan(qs["q16_part_supplier_counts"](spark, sf_dir))
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan

    def test_q4_semi_join(self, spark, sf_dir, qs):
        plan = _plan(qs["q4_priority_check"](spark, sf_dir))
        assert "LeftSemi" in plan


def _hash_exchanges(plan: str) -> int:
    # formatted mode puts the partitioning in the Exchange op's
    # "Arguments:" detail line, never inline with the op name
    return sum(
        1 for l in plan.splitlines() if "Arguments: hashpartitioning" in l
    )


class TestShuffleBudget:
    def test_q21_single_wide_phase(self, spark, sf_dir, qs):
        """The window formulation keeps per-order max/distinct to ONE
        hash-partitioning of lineitem (plus the final tiny top-k)."""
        plan = _plan(qs["q21_waiting_suppliers"](spark, sf_dir))
        wide = _hash_exchanges(plan)
        assert 1 <= wide <= 3, f"q21 grew to {wide} hash exchanges"

    def test_near_dup_shuffles_bucket_key_only(self, spark, sf_dir, qs):
        """dedup_embedding_near moves (id, vector) rows keyed by bucket;
        pairs are formed after the exchange, never shuffled."""
        plan = _plan(qs["dedup_embedding_near"](spark, sf_dir))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_ivf_cell_assignment_is_narrow(self, spark, sf_dir, qs):
        """IVF cell assignment rides the corpus/query scans as an array
        expression against the ONE-row broadcast centroid table: no
        window, no self-join, no per-vector shuffle. The only Window op
        allowed is the final per-query top-k — and it must carry the
        WindowGroupLimit rank pushdown so each partition emits at most
        k candidates into the final exchange."""
        import re

        plan = _plan(qs["embedding_ivf_topk"](spark, sf_dir))
        window_ops = [
            l for l in plan.splitlines() if re.match(r"^\s*\(\d+\) Window$", l)
        ]
        assert len(window_ops) == 1, f"expected 1 Window op, saw {window_ops}"
        assert "WindowGroupLimit" in plan
        assert "SortMergeJoin" not in plan
        # the two BNLJs are the single-row centroid-array broadcasts
        # (corpus assignment + query probe) — anything more means a
        # real table started cross-joining
        assert plan.count(") BroadcastNestedLoopJoin") <= 2
