"""Event-analytics queries (plans/eventanalytics.py): funnel ordering
semantics on controlled fixtures + the single-exchange plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.plans import queries


def _events(spark, rows):
    """rows: (event_id, user_id, seconds_offset, event_type, value)"""
    base = dt.datetime(2024, 1, 1)
    data = [
        (eid, base + dt.timedelta(seconds=s), uid, et, float(v))
        for (eid, uid, s, et, v) in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


class TestFunnelSemantics:
    def _run(self, spark, monkeypatch, rows):
        from cga_kinesis_to_elasticsearch_spark.plans import eventanalytics as EA

        df = _events(spark, rows)
        monkeypatch.setattr(EA, "_t", lambda s, d, n: df)
        out = EA._funnel_conversion.__wrapped__ if hasattr(
            EA._funnel_conversion, "__wrapped__"
        ) else EA._funnel_conversion
        return {r.user_id: r for r in out(spark, "unused").collect()}

    def test_click_before_view_does_not_qualify(self, spark, monkeypatch):
        rows = [
            (1, 10, 0, "click", 1),  # pre-view click: not qualified
            (2, 10, 5, "view", 1),
            (3, 10, 9, "click", 1),  # qualified
            (4, 10, 20, "purchase", 1),  # qualified (after click at t9)
            (5, 20, 0, "purchase", 1),  # bare purchase: no funnel
        ]
        got = self._run(spark, monkeypatch, rows)
        assert got[10].n_views == 1
        assert got[10].n_qual_clicks == 1
        assert got[10].n_qual_purchases == 1 and got[10].converted
        assert got[20].n_qual_purchases == 0 and not got[20].converted

    def test_purchase_before_click_not_converted(self, spark, monkeypatch):
        rows = [
            (1, 7, 0, "view", 1),
            (2, 7, 1, "purchase", 1),  # before any click
            (3, 7, 2, "click", 1),
        ]
        got = self._run(spark, monkeypatch, rows)
        assert got[7].n_qual_clicks == 1
        assert got[7].n_qual_purchases == 0 and not got[7].converted


class TestPlanShapes:
    def test_funnel_is_single_exchange(self, spark, sf_dir):
        df = queries()["funnel_conversion"](spark, sf_dir)
        jvm = spark._jvm
        plan = df._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        n_hash = sum(
            1
            for l in plan.splitlines()
            if "Arguments: hashpartitioning" in l
        )
        assert n_hash == 1, f"funnel grew to {n_hash} exchanges"
        # both windows + the final agg share one sort order
        assert plan.count(") Sort") <= 1


class TestHistogramAndCohort:
    def test_histogram_bins(self, spark, monkeypatch):
        from cga_kinesis_to_elasticsearch_spark.plans import eventanalytics as EA

        df = _events(
            spark,
            [(1, 1, 0, "view", 4.0), (2, 1, 1, "view", 49.9), (3, 1, 2, "click", 150.0)],
        )
        monkeypatch.setattr(EA, "_t", lambda s, d, n: df)
        out = {(r.event_type, r.bin): r for r in
               EA._value_histogram(spark, "unused").collect()}
        assert out[("view", 0)].n == 2
        assert out[("view", 0)].bin_lo == 0
        assert out[("click", 3)].bin_lo == 150

    def test_cohort_offsets(self, spark, monkeypatch):
        from cga_kinesis_to_elasticsearch_spark.plans import eventanalytics as EA

        day = 86400
        df = _events(
            spark,
            [
                (1, 1, 0, "view", 1),          # day 0 (cohort)
                (2, 1, 2 * day, "view", 1),    # day 2
                (3, 1, 2 * day + 5, "click", 1),  # same day, still 1 user
                (4, 2, day, "view", 1),        # user 2 cohort day 1
            ],
        )
        monkeypatch.setattr(EA, "_t", lambda s, d, n: df)
        out = {(r.cohort_date, r.day_offset): r.n_active for r in
               EA._cohort_retention(spark, "unused").collect()}
        assert out[("2024-01-01", 0)] == 1
        assert out[("2024-01-01", 2)] == 1
        assert out[("2024-01-02", 0)] == 1
        assert len(out) == 3


class TestScd2Asof:
    def test_event_time_correct_plan(self, spark, monkeypatch):
        from cga_kinesis_to_elasticsearch_spark.plans import eventanalytics as EA

        day = 86400
        # user 1 upgrades on day (1 % 28) + 1 = 2
        df = _events(
            spark,
            [
                (1, 1, day, "view", 1),          # day 1: still free
                (2, 1, 3 * day, "view", 1),      # day 3: pro
                (3, 29, 0, "view", 1),           # day 0 first instant: free
            ],
        )
        monkeypatch.setattr(EA, "_t", lambda s, d, n: df)
        out = {r.event_id: r.asof_plan for r in
               EA._enrich_scd2_asof(spark, "u").collect()}
        assert out[1] == "free"
        assert out[2] == "pro"
        assert out[3] == "free"


class TestTopEventPaths:
    def test_paths_counted_in_stream_order(self, spark, sf_dir):
        from cga_kinesis_to_elasticsearch_spark.plans.eventanalytics import (
            _top_event_paths,
        )

        out = _top_event_paths(spark, sf_dir).collect()
        assert 0 < len(out) <= 15
        # ranks are dense from 1 and follow descending counts
        assert [r.rank for r in out] == list(range(1, len(out) + 1))
        ns = [r.n for r in out]
        assert ns == sorted(ns, reverse=True)
        assert all(r.path.count(">") == 2 for r in out)


class TestGapFillHourly:
    def test_grid_dense_with_zero_rows(self, spark, sf_dir):
        from cga_kinesis_to_elasticsearch_spark.plans.eventanalytics import (
            _gap_fill_hourly,
        )
        from pyspark.sql import functions as F

        out = _gap_fill_hourly(spark, sf_dir)
        per_type = out.groupBy("event_type").agg(
            F.count("*").alias("rows"),
            F.min("hour").alias("lo"),
            F.max("hour").alias("hi"),
        )
        for r in per_type.collect():
            from datetime import datetime

            lo = datetime.fromisoformat(r.lo)
            hi = datetime.fromisoformat(r.hi)
            expected = int((hi - lo).total_seconds() // 3600) + 1
            assert r.rows == expected  # dense: one row per hour in span


class TestValuePercentiles:
    """value_percentiles_by_type: exact percentile_disc semantics."""

    def test_cut_points_and_ties(self, spark):
        import cga_kinesis_to_elasticsearch_spark.plans.eventanalytics as EA
        from pyspark.sql import Window

        # 10 values with a tie block: percentile_disc picks INPUT
        # values (never interpolates), ties share one cume_dist
        vals = [1.0, 2.0, 2.0, 2.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0]
        df = spark.createDataFrame(
            [("a", v) for v in vals], "event_type string, value double"
        )
        cd = F.cume_dist().over(
            Window.partitionBy("event_type").orderBy("value")
        )
        c = df.select("event_type", "value", cd.alias("cd"))
        row = (
            c.groupBy("event_type")
            .agg(
                F.min(F.when(F.col("cd") >= 0.5, F.col("value"))).alias("p50"),
                F.min(F.when(F.col("cd") >= 0.95, F.col("value"))).alias("p95"),
            )
            .collect()[0]
        )
        # cume_dist(5.0)=0.5 exactly -> p50 is 5.0; p95 -> 10.0
        assert row["p50"] == 5.0
        assert row["p95"] == 10.0
        # full declared query runs over real data with a sane shape
        out = EA._value_percentiles_by_type(
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert len(out) >= 1
        for r in out:
            assert r["p50"] <= r["p95"] <= r["p99"]
            assert 0.0 <= r["rank_le_100"] <= 1.0


class TestCompositePagination:
    """composite_agg_page: keyset cursor semantics + plan shape."""

    def test_page_chain_and_plan(self, spark):
        import cga_kinesis_to_elasticsearch_spark.plans.eventanalytics as EA

        sf = "/root/testdata/sf0.001"
        page = EA._composite_agg_page(spark, sf)
        rows = page.collect()
        assert 0 < len(rows) <= EA._COMP_PAGE
        keys = [(r["event_type"], r["event_date"]) for r in rows]
        # strictly increasing, all strictly after the cursor
        assert keys == sorted(keys)
        assert len(set(keys)) == len(keys)
        assert all(k > EA._COMP_AFTER for k in keys)
        # ordered page must be a TakeOrderedAndProject, not a global sort
        plan = page._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        # chaining: a page cursored at THIS page's last key starts
        # strictly after it (no overlap, no gap at the boundary)
        last = keys[-1]
        ev = EA._t(spark, sf, "events")
        b = ev.groupBy(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        ).agg(F.count("*").alias("n"))
        nxt = (
            b.filter(
                F.struct("event_type", "event_date")
                > F.struct(F.lit(last[0]), F.lit(last[1]))
            )
            .orderBy("event_type", "event_date")
            .limit(EA._COMP_PAGE)
            .collect()
        )
        nxt_keys = [(r["event_type"], r["event_date"]) for r in nxt]
        assert all(k > last for k in nxt_keys)
        assert not (set(keys) & set(nxt_keys))


class TestNativeSessionWindow:
    def test_sessions_respect_gap(self, spark):
        import cga_kinesis_to_elasticsearch_spark.plans.eventanalytics as EA

        rows = EA._native_session_window_stats(
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert rows
        by_user = {}
        for r in rows:
            by_user.setdefault(r["user_id"], []).append(r)
        gap_ms = EA._SESSION_GAP_MIN * 60_000
        for sessions in by_user.values():
            sessions.sort(key=lambda r: r["start_ms"])
            for r in sessions:
                # end = last event + gap => duration >= gap
                assert r["end_ms"] - r["start_ms"] >= gap_ms
            for a, b in zip(sessions, sessions[1:]):
                # consecutive sessions must be separated by > gap
                # (else they'd have merged): next start > prev end
                assert b["start_ms"] > a["end_ms"] - 1
