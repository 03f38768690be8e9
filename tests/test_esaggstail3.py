"""ES aggregation-tail part-3 semantics (plans/esaggstail3.py) on
controlled fixtures: top_hits tiebreaks and bucket caps, rollover
boundary exactness, nested/reverse_nested parent-vs-child counting."""

from __future__ import annotations

import datetime as dt

from cga_kinesis_to_elasticsearch_spark.plans import esaggstail3 as E3


def _unwrap(fn):
    return getattr(fn, "__wrapped__", fn)


def _events(spark, rows):
    """rows: (event_id, user_id, event_type, value) — ts = base+id h."""
    base = dt.datetime(2024, 1, 1, 12, 0)
    return spark.createDataFrame(
        [
            (eid, base + dt.timedelta(hours=eid), uid, et, v)
            for (eid, uid, et, v) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )


class TestTopHits:
    def _run(self, spark, monkeypatch, rows):
        monkeypatch.setattr(E3, "_t", lambda s, d, n: _events(spark, rows))
        return _unwrap(E3._top_hits_by_type)(spark, "unused").collect()

    def test_caps_at_three_and_breaks_ties_by_id(self, spark, monkeypatch):
        rows = [
            (1, 10, "click", 5.0),
            (2, 11, "click", 5.0),  # tie with id 1 -> lower id wins rank
            (3, 12, "click", 9.0),
            (4, 13, "click", 1.0),
            (5, 14, "click", 2.0),
            (6, 20, "view", 7.0),
        ]
        got = self._run(spark, monkeypatch, rows)
        clicks = [r for r in got if r.event_type == "click"]
        assert [r.event_id for r in sorted(clicks, key=lambda r: r.hit_rank)] == [
            3,
            1,
            2,
        ]
        views = [r for r in got if r.event_type == "view"]
        assert len(views) == 1 and views[0].hit_rank == 1

    def test_hit_carries_source_fields(self, spark, monkeypatch):
        got = self._run(spark, monkeypatch, [(7, 42, "click", 1.23)])
        (r,) = got
        assert (r.user_id, r.value_cents) == (42, 123)
        assert r.ts_str == "2024-01-01 19:00:00"


class TestRollover:
    def _run(self, spark, monkeypatch, rows, max_docs):
        monkeypatch.setattr(E3, "_t", lambda s, d, n: _events(spark, rows))
        monkeypatch.setattr(E3, "_ROLLOVER_MAX_DOCS", max_docs)
        out = _unwrap(E3._index_rollover_plan)(spark, "unused")
        return {(r.alias, r.generation): r for r in out.collect()}

    def test_rolls_exactly_at_max_docs(self, spark, monkeypatch):
        rows = [(i, 1, "click", 1.0) for i in range(5)]
        got = self._run(spark, monkeypatch, rows, max_docs=2)
        # 5 docs, max 2 -> generations of sizes 2, 2, 1
        assert got[("click", 0)].doc_count == 2
        assert got[("click", 1)].doc_count == 2
        assert got[("click", 2)].doc_count == 1
        assert got[("click", 2)].index_name == "click-000003"

    def test_generation_assignment_follows_arrival_order(
        self, spark, monkeypatch
    ):
        # ids 0..3 arrive in ts order; gen 0 must hold the EARLIEST two
        rows = [(i, 1, "view", 1.0) for i in range(4)]
        got = self._run(spark, monkeypatch, rows, max_docs=2)
        assert got[("view", 0)].first_ts == "2024-01-01 12:00:00"
        assert got[("view", 0)].last_ts == "2024-01-01 13:00:00"
        assert got[("view", 1)].first_ts == "2024-01-01 14:00:00"


class TestNestedAgg:
    def _run(self, spark, monkeypatch, orders, lines):
        odf = spark.createDataFrame(
            [
                (k, 1, st, 1.0, dt.datetime(2024, 1, 1), "1-URGENT")
                for (k, st) in orders
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, "
            "o_orderpriority string",
        )
        ldf = spark.createDataFrame(
            [(ok, rf, float(q), float(p)) for (ok, rf, q, p) in lines],
            "l_orderkey long, l_returnflag string, l_quantity double, "
            "l_extendedprice double",
        )
        monkeypatch.setattr(
            E3, "_t", lambda s, d, n: odf if n == "orders" else ldf
        )
        out = _unwrap(E3._nested_lineitem_agg)(spark, "unused")
        return {r.status: r for r in out.collect()}

    def test_parent_count_dedups_multi_hit_orders(self, spark, monkeypatch):
        orders = [(1, "O"), (2, "O"), (3, "F")]
        lines = [
            (1, "R", 2, 1.0),
            (1, "R", 3, 2.0),  # order 1 matches twice -> 1 parent
            (2, "N", 1, 1.0),  # no match -> order 2 absent
            (3, "R", 5, 3.0),
        ]
        got = self._run(spark, monkeypatch, orders, lines)
        assert got["O"].nested_hits == 2
        assert got["O"].parent_orders == 1
        assert got["O"].sum_qty == 5
        assert got["F"].parent_orders == 1
        assert "N" not in {  # unmatched-only statuses produce no bucket
            s for s in got if got[s].nested_hits == 0
        }

    def test_nested_scope_filters_items_not_parents(self, spark, monkeypatch):
        # a mixed order contributes ONLY its matching items' measures
        orders = [(1, "O")]
        lines = [(1, "R", 2, 1.0), (1, "N", 100, 100.0)]
        got = self._run(spark, monkeypatch, orders, lines)
        assert got["O"].sum_qty == 2
        assert got["O"].sum_price_cents == 100
