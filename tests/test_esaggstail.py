"""ES aggregation-tail parity (plans/esaggstail.py): boxplot /
t_test / rate / multi_terms / change_point / fuzzy / ip_prefix /
random_sampler / variable_width_histogram semantics on controlled
fixtures."""

from __future__ import annotations

import datetime as dt
import math

from cga_kinesis_to_elasticsearch_spark.plans import esaggstail as ET


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
    """rows: (o_orderkey, status, price, date, priority)"""
    return spark.createDataFrame(
        [(k, 1, s, p, d, pr) for (k, s, p, d, pr) in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    )


def _lineitem(spark, rows):
    """rows: (flag, quantity)"""
    return spark.createDataFrame(
        [(i, f, float(qty)) for i, (f, qty) in enumerate(rows)],
        "l_orderkey long, l_returnflag string, l_quantity double",
    )


def _part(spark, names):
    return spark.createDataFrame(
        [(i, n, "B", "t", 1, 1.0) for i, n in enumerate(names)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )


class TestBoxplot:
    def _run(self, spark, monkeypatch, rows):
        monkeypatch.setattr(ET, "_t", lambda s, d, n: _events(spark, rows))
        out = _unwrap(ET._boxplot_value_by_type)(spark, "unused")
        return {r.event_type: r for r in out.collect()}

    def test_percentile_disc_quartiles(self, spark, monkeypatch):
        # 8 values: q1 = smallest v with cume_dist >= .25 (2nd), etc.
        vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
        rows = [(i, 1, "view", v) for i, v in enumerate(vals)]
        got = self._run(spark, monkeypatch, rows)["view"]
        assert (got.q1, got.q2, got.q3) == (2.0, 4.0, 6.0)
        assert (got.v_min, got.v_max, got.n) == (1.0, 8.0, 8)
        assert got.iqr == 4.0

    def test_whiskers_exclude_outliers(self, spark, monkeypatch):
        # tight cluster + one far outlier: whisker stops at the
        # nearest in-fence value, not the outlier
        vals = [10.0, 11.0, 12.0, 13.0, 14.0, 15.0, 16.0, 100.0]
        rows = [(i, 1, "view", v) for i, v in enumerate(vals)]
        got = self._run(spark, monkeypatch, rows)["view"]
        # q1=11, q3=15, iqr=4 -> hi fence 21: 100 is outside
        assert got.hi_whisker == 16.0
        assert got.lo_whisker == 10.0
        assert got.v_max == 100.0


class TestTTest:
    def test_welch_matches_closed_form(self, spark, monkeypatch):
        a = [10, 12, 14, 16]
        r = [20, 21, 22, 23, 24]
        rows = [("A", q) for q in a] + [("R", q) for q in r]
        monkeypatch.setattr(
            ET, "_t", lambda s, d, n: _lineitem(spark, rows)
        )
        out = _unwrap(ET._ttest_quantity_returnflag)(
            spark, "unused"
        ).collect()[0]
        ma, mr = sum(a) / len(a), sum(r) / len(r)
        va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
        vr = sum((x - mr) ** 2 for x in r) / (len(r) - 1)
        se2 = va / len(a) + vr / len(r)
        t = (ma - mr) / math.sqrt(se2)
        df = se2**2 / (
            (va / len(a)) ** 2 / (len(a) - 1)
            + (vr / len(r)) ** 2 / (len(r) - 1)
        )
        assert (out.na, out.nr) == (4, 5)
        assert abs(out.t_stat - round(t, 9)) < 1e-9
        assert abs(out.welch_df - round(df, 9)) < 1e-9


class TestRate:
    def test_normalizes_by_bucket_width(self, spark, monkeypatch):
        feb = dt.datetime(2023, 2, 10)  # 28-day month
        mar = dt.datetime(2023, 3, 10)  # 31-day month
        rows = [(i, "O", 100.0, feb, "1-URGENT") for i in range(28)] + [
            (100 + i, "O", 100.0, mar, "1-URGENT") for i in range(31)
        ]
        monkeypatch.setattr(
            ET, "_t", lambda s, d, n: _orders(spark, rows)
        )
        out = {
            r.month: r
            for r in _unwrap(ET._rate_orders_monthly)(
                spark, "unused"
            ).collect()
        }
        # same per-day rate despite different raw counts
        assert out["2023-02-01"].orders_per_day == 1.0
        assert out["2023-03-01"].orders_per_day == 1.0
        assert out["2023-02-01"].days_in_month == 28
        assert out["2023-02-01"].revenue_per_day_c == 10000


class TestMultiTerms:
    def test_count_then_key_tiebreak(self, spark, monkeypatch):
        d = dt.datetime(2024, 1, 1)
        rows = (
            [(i, "O", 10.0, d, "2-HIGH") for i in range(3)]
            + [(10 + i, "F", 10.0, d, "1-URGENT") for i in range(3)]
            + [(20 + i, "P", 10.0, d, "3-LOW") for i in range(2)]
        )
        monkeypatch.setattr(
            ET, "_t", lambda s, d_, n: _orders(spark, rows)
        )
        out = _unwrap(ET._multi_terms_status_priority)(
            spark, "unused"
        ).collect()
        # two count-3 buckets tie -> key order breaks it (F < O)
        assert [(r.o_orderstatus, r.doc_count) for r in out] == [
            ("F", 3),
            ("O", 3),
            ("P", 2),
        ]
        assert out[0].sum_price_c == 3000


class TestChangePoint:
    def test_finds_level_shift(self, spark, monkeypatch):
        base = dt.datetime(2024, 1, 1)
        rows = []
        k = 0
        for day in range(10):
            # 2/day for the first 5 days, 10/day after
            n = 2 if day < 5 else 10
            for _ in range(n):
                rows.append(
                    (k, "O", 10.0, base + dt.timedelta(days=day), "x")
                )
                k += 1
        monkeypatch.setattr(
            ET, "_t", lambda s, d, n: _orders(spark, rows)
        )
        out = _unwrap(ET._change_point_daily_orders)(
            spark, "unused"
        ).collect()
        assert len(out) == 1
        got = out[0]
        assert got.split_day == "2024-01-05"  # last day of the low level
        assert (got.n_left, got.n_right) == (5, 5)
        assert (got.mean_left, got.mean_right) == (2.0, 10.0)
        assert got.sse_split == 0.0
        assert got.sse_reduction == got.sse_single


class TestFuzzy:
    def test_distance_filter_and_df(self, spark, monkeypatch):
        names = ["green widget", "greyn widget", "purple bolt", "green cap"]
        monkeypatch.setattr(
            ET, "_t", lambda s, d, n: _part(spark, names)
        )
        out = _unwrap(ET._fuzzy_terms_part)(spark, "unused").collect()
        got = {r.term: (r.dist, r.n_parts) for r in out}
        # probe 'gren': green=1 (insert e), greyn=1 (delete y);
        # purple/widget/bolt/cap are all > 2 away
        assert got == {"green": (1, 2), "greyn": (1, 1)}
        # same distance -> term order breaks the tie
        assert [r.term for r in out] == ["green", "greyn"]


class TestIpPrefix:
    def test_prefix_grouping(self, spark, monkeypatch):
        # user_id 1 -> 11.1.0.0/16, user_id 201 -> 11.1.0.0/16 too
        # (201 % 4 == 1, 201 % 200 == 1); user_id 2 -> 12.2.0.0/16
        rows = [(1, 1, "view", 1.0), (2, 201, "view", 1.0), (3, 2, "view", 1.0)]
        monkeypatch.setattr(ET, "_t", lambda s, d, n: _events(spark, rows))
        out = _unwrap(ET._ip_prefix_counts)(spark, "unused").collect()
        got = {r.subnet: (r.n_events, r.n_users) for r in out}
        assert got == {"11.1.0.0/16": (2, 2), "12.2.0.0/16": (1, 1)}


class TestRandomSampler:
    def test_deterministic_and_scaled(self, spark, monkeypatch):
        rows = [(i, 1, "view", 1.0) for i in range(400)]
        monkeypatch.setattr(ET, "_t", lambda s, d, n: _events(spark, rows))
        fn = _unwrap(ET._random_sampler_estimate)
        a = fn(spark, "unused").collect()[0]
        b = fn(spark, "unused").collect()[0]
        assert a == b  # replayable: same hash predicate, same answer
        assert a.est_total_n == a.sampled_n / 0.25
        # value 1.00 each -> estimate = est_total_n dollars
        assert a.est_total_value == a.est_total_n
        # p=0.25 over 400 uniform hashes: sane acceptance band
        assert 50 <= a.sampled_n <= 150


class TestVariableWidthHistogram:
    def _run(self, spark, monkeypatch, prices):
        d = dt.datetime(2024, 1, 1)
        rows = [(i, "O", p, d, "x") for i, p in enumerate(prices)]
        monkeypatch.setattr(
            ET, "_t", lambda s, d_, n: _orders(spark, rows)
        )
        return _unwrap(ET._variable_width_histogram_price)(
            spark, "unused"
        ).collect()

    def test_equal_frequency_buckets(self, spark, monkeypatch):
        out = self._run(
            spark, monkeypatch, [float(i + 1) for i in range(16)]
        )
        assert [r.bucket for r in out] == list(range(8))
        assert all(r.doc_count == 2 for r in out)
        assert out[0].min_price == 1.0 and out[0].max_price == 2.0
        assert out[-1].max_price == 16.0

    def test_identical_values_never_split(self, spark, monkeypatch):
        # 12 copies of one price + 4 distinct: the heavy value stays
        # atomic in bucket 0 even though 12 > 16/8
        out = self._run(
            spark, monkeypatch, [5.0] * 12 + [6.0, 7.0, 8.0, 9.0]
        )
        by_bucket = {r.bucket: r for r in out}
        assert by_bucket[0].doc_count == 12
        assert by_bucket[0].min_price == by_bucket[0].max_price == 5.0


class TestTermsShardError:
    def test_matches_pure_python_merge(self, spark, monkeypatch):
        import hashlib
        from collections import Counter, defaultdict

        # 40 users x varying frequency; doc ids scatter over md5 shards
        rows = []
        eid = 0
        for uid in range(1, 41):
            for _ in range(uid % 7 + 1):
                rows.append((eid, uid, "view", 1.0))
                eid += 1
        monkeypatch.setattr(ET, "_t", lambda s, d, n: _events(spark, rows))
        out = _unwrap(ET._terms_shard_error_bounds)(
            spark, "unused"
        ).collect()

        # replicate the contract in plain python
        per_shard = defaultdict(Counter)
        for e, uid, _, _ in rows:
            h = hashlib.md5(f"sh:{e}".encode()).hexdigest()[:4]
            per_shard[int(h, 16) % ET._TSE_SHARDS][uid] += 1
        kept, thr = {}, {}
        for s, c in per_shard.items():
            ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
            kept[s] = dict(ranked[: ET._TSE_SHARD_SIZE])
            thr[s] = (
                min(kept[s].values())
                if len(ranked) > ET._TSE_SHARD_SIZE
                else 0
            )
        total_thr = sum(thr.values())
        doc_count, covered = Counter(), Counter()
        for s, ks in kept.items():
            for t, n in ks.items():
                doc_count[t] += n
                covered[t] += thr[s]
        exp = sorted(
            (
                (t, doc_count[t], total_thr - covered[t])
                for t in doc_count
            ),
            key=lambda r: (-r[1], r[0]),
        )[: ET._TSE_TOPN]
        got = [
            (r.term, r.doc_count, r.doc_count_error_upper_bound)
            for r in out
        ]
        assert got == exp
        # the bound must be a genuine upper bound on the true count
        true = Counter(uid for _, uid, _, _ in rows)
        for t, dc, err in got:
            assert dc <= true[t] <= dc + err
