"""ES pipeline-aggregation parity (plans/pipelineaggs.py): ES-matching
null semantics for the lag-based aggs, bucket selector/sort behavior,
and categorize_text template grouping — all on controlled fixtures."""

from __future__ import annotations

import datetime as dt

from cga_kinesis_to_elasticsearch_spark.plans import pipelineaggs as PA


def _events(spark, rows):
    """rows: (event_id, user_id, day_offset, event_type, value)"""
    base = dt.datetime(2024, 1, 1, 12, 0)
    data = [
        (eid, base + dt.timedelta(days=d), uid, et, float(v))
        for (eid, uid, d, et, v) in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )


def _docs(spark, rows):
    """rows: (doc_id, text, source)"""
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for (i, t, s) in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )


def _unwrap(fn):
    return getattr(fn, "__wrapped__", fn)


class TestPipelineAggsDaily:
    def _run(self, spark, monkeypatch, rows):
        monkeypatch.setattr(PA, "_t", lambda s, d, n: _events(spark, rows))
        out = _unwrap(PA._pipeline_aggs_daily)(spark, "unused")
        return {(r.event_type, r.day): r for r in out.collect()}

    def test_lag_aggs_null_until_window_exists(self, spark, monkeypatch):
        # one type, 3 consecutive days, values 1.00 / 2.00 / 4.00
        rows = [(i, 1, i, "view", v) for i, v in enumerate([1.0, 2.0, 4.0])]
        got = self._run(spark, monkeypatch, rows)
        d0 = got[("view", "2024-01-01")]
        d1 = got[("view", "2024-01-02")]
        d2 = got[("view", "2024-01-03")]
        # ES: derivative/serial_diff null until the lag bucket exists
        assert d0.deriv_v_c is None and d0.serial_diff7 is None
        assert d1.deriv_v_c == 100 and d2.deriv_v_c == 200
        # moving_fn's trailing window EXCLUDES the current bucket
        assert d0.mov_avg3 is None
        assert d1.mov_avg3 == 1.0
        assert d2.mov_avg3 == 1.5  # avg(1.00, 2.00)
        # cumulative_sum includes the current bucket
        assert (d0.cum_v_c, d1.cum_v_c, d2.cum_v_c) == (100, 300, 700)

    def test_serial_diff_lag7(self, spark, monkeypatch):
        rows = [(i, 1, i, "view", float(i + 1)) for i in range(9)]
        got = self._run(spark, monkeypatch, rows)
        assert got[("view", "2024-01-07")].serial_diff7 is None
        # day 8 (value 8.00) minus day 1 (value 1.00)
        assert got[("view", "2024-01-08")].serial_diff7 == 700
        assert got[("view", "2024-01-09")].serial_diff7 == 700

    def test_types_partition_independently(self, spark, monkeypatch):
        rows = [
            (1, 1, 0, "view", 1.0),
            (2, 1, 1, "view", 2.0),
            (3, 1, 5, "click", 9.0),
        ]
        got = self._run(spark, monkeypatch, rows)
        # click's first bucket sees no view history
        assert got[("click", "2024-01-06")].deriv_v_c is None
        assert got[("click", "2024-01-06")].cum_v_c == 900


class TestBucketControl:
    def _run(self, spark, monkeypatch, rows):
        monkeypatch.setattr(PA, "_t", lambda s, d, n: _events(spark, rows))
        out = _unwrap(PA._bucket_control_topdays)(spark, "unused")
        return out.collect()

    def test_selector_drops_thin_buckets(self, spark, monkeypatch):
        rows = [(i, 1, 0, "view", 1.0) for i in range(3)]  # day0: n=3
        rows += [(10, 1, 1, "view", 50.0)]  # day1: n=1 -> dropped
        got = self._run(spark, monkeypatch, rows)
        assert [(r.day, r.n) for r in got] == [("2024-01-01", 3)]

    def test_topk_and_tiebreak(self, spark, monkeypatch):
        # 7 qualifying days; days 3 and 4 tie on revenue -> earlier day
        # wins the lower rank; only 5 buckets survive bucket_sort
        rows = []
        eid = 0
        revenue = [10, 20, 30, 25, 25, 5, 15]
        for d, rev in enumerate(revenue):
            for _ in range(3):  # n=3 qualifies every day
                rows.append((eid, 1, d, "view", rev / 3))
                eid += 1
        got = self._run(spark, monkeypatch, rows)
        assert len(got) == 5
        assert [r.rnk for r in got] == [1, 2, 3, 4, 5]
        days = [r.day for r in got]
        # 30 > 25(day4) == 25(day5, later) > 20 > 15
        assert days == [
            "2024-01-03",
            "2024-01-04",
            "2024-01-05",
            "2024-01-02",
            "2024-01-07",
        ]

    def test_bucket_script_exact_cents(self, spark, monkeypatch):
        rows = [(i, 1, 0, "view", 0.105) for i in range(3)]
        got = self._run(spark, monkeypatch, rows)
        # round(0.105*100)=10 or 11 cents per row depending on the IEEE
        # double — but BOTH engines see the same double; here
        # 0.105*100 = 10.500000000000002 -> 11 cents, avg 0.11
        assert got[0].v_c == 33 and got[0].avg_value == 0.11


class TestDateRangeFilters:
    def _run(self, spark, monkeypatch, rows):
        monkeypatch.setattr(PA, "_t", lambda s, d, n: _events(spark, rows))
        out = _unwrap(PA._date_range_filters_agg)(spark, "unused")
        return {r.bucket: r for r in out.collect()}

    def test_from_inclusive_to_exclusive(self, spark, monkeypatch):
        # base ts is 2024-01-01 12:00; offsets put events around the
        # 01-10 and 01-20 cuts: day 8 -> Jan 9 (before), day 9 ->
        # Jan 10 12:00 (AFTER the midnight cut: from is inclusive)
        rows = [
            (1, 1, 8, "view", 1.0),   # Jan 9  -> to-01-10
            (2, 1, 9, "view", 1.0),   # Jan 10 -> middle bucket
            (3, 1, 18, "view", 1.0),  # Jan 19 -> middle bucket
            (4, 1, 19, "view", 1.0),  # Jan 20 -> from-01-20
        ]
        got = self._run(spark, monkeypatch, rows)
        assert got["to-01-10"].n_total == 1
        assert got["01-10_to_01-20"].n_total == 2
        assert got["from-01-20"].n_total == 1

    def test_filters_overlap(self, spark, monkeypatch):
        # a high-value purchase counts in BOTH named filters (ES
        # filters-agg semantics: independent predicates)
        rows = [
            (1, 1, 0, "purchase", 150.0),
            (2, 1, 0, "view", 150.0),
            (3, 1, 0, "purchase", 1.0),
        ]
        got = self._run(spark, monkeypatch, rows)
        b = got["to-01-10"]
        assert b.n_total == 3
        assert b.n_purchase == 2
        assert b.n_high_value == 2
        assert b.v_c_total == 30100
        assert b.v_c_purchase == 15100


class TestCategorizeText:
    def _run(self, spark, monkeypatch, rows):
        monkeypatch.setattr(PA, "_t", lambda s, d, n: _docs(spark, rows))
        out = _unwrap(PA._categorize_text_templates)(spark, "unused")
        return out.collect()

    def test_digit_masking_groups_variants(self, spark, monkeypatch):
        rows = [
            (1, "error code 500 at node 3", "a"),
            (2, "error code 404 at node 17", "b"),
            (3, "error code 503 at node 9", "a"),
            (4, "startup complete ok", "a"),
        ]
        got = self._run(spark, monkeypatch, rows)
        assert got[0].category == "error code <num>"
        assert got[0].n_docs == 3
        assert got[0].n_sources == 2
        assert got[0].example_doc == 1
        assert got[1].category == "startup complete ok"

    def test_order_count_desc_then_name(self, spark, monkeypatch):
        rows = [
            (1, "b b b", "s"),
            (2, "a a a", "s"),
            (3, "c c c", "s"),
            (4, "a a a", "s"),
        ]
        got = self._run(spark, monkeypatch, rows)
        assert [r.category for r in got] == ["a a a", "b b b", "c c c"]


class TestMovingFnBreadth:
    def test_moving_fn_models(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.aggsdsl import (
            apply_aggs,
        )
        import datetime as dt

        df = spark.createDataFrame(
            [(dt.datetime(2024, 1, d), float(v))
             for d, v in [(1, 1), (2, 4), (3, 2), (4, 8)]],
            "ts timestamp, v double",
        )
        rows = apply_aggs(df, {"d": {
            "date_histogram": {"field": "ts", "calendar_interval": "day"},
            "aggs": {
                "s": {"sum": {"field": "v"}},
                "mx": {"moving_fn": {"buckets_path": "s", "window": 2,
                       "script": "MovingFunctions.max(values)"}},
                "sm": {"moving_fn": {"buckets_path": "s", "window": 2,
                       "script": "MovingFunctions.sum(values)"}},
            }}}).orderBy("d").collect()
        assert [r.mx for r in rows] == [None, 1.0, 4.0, 4.0]
        assert [r.sm for r in rows] == [None, 1.0, 5.0, 6.0]
        import pytest
        with pytest.raises(ValueError, match="exactly one of"):
            apply_aggs(df, {"d": {
                "date_histogram": {"field": "ts",
                                   "calendar_interval": "day"},
                "aggs": {"s": {"sum": {"field": "v"}},
                         "bad": {"moving_fn": {"buckets_path": "s",
                                 "window": 2,
                                 "script": "holtWinters(values)"}}}}})
