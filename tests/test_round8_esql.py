"""Round-8 ES|QL surface: BUCKET() grouping (the query Kibana
Discover generates for every ES|QL date histogram), ES|QL null-sort
semantics (null = largest), MV_EXPAND's NULL-row retention,
KEEP/DROP wildcards with ES|QL precedence, LOOKUP JOIN (ES 8.18),
ENRICH's column-override rule, and the MV_* scalar family."""

from __future__ import annotations

import datetime as dt

import pytest

from cga_kinesis_to_elasticsearch_spark.operators.esql import run_esql


def _events(spark):
    return spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 10, 15), "a", 2.0, ["x", "y"]),
            (2, dt.datetime(2024, 1, 1, 10, 45), "b", None, None),
            (3, dt.datetime(2024, 1, 1, 11, 5), "a", 1.0, ["z"]),
            (4, dt.datetime(2024, 1, 2, 0, 30), "c", 8.0, []),
        ],
        "event_id long, ts timestamp, event_type string, "
        "value double, tags array<string>",
    )


class TestBucket:
    def test_calendar_hour(self, spark):
        out = run_esql(
            "FROM e | STATS n = count(*) BY h = BUCKET(ts, 1 hour) "
            "| SORT h ASC",
            {"e": _events(spark)},
        ).collect()
        assert [(r.h, r.n) for r in out] == [
            (dt.datetime(2024, 1, 1, 10), 2),
            (dt.datetime(2024, 1, 1, 11), 1),
            (dt.datetime(2024, 1, 2, 0), 1),
        ]

    def test_calendar_day_and_week(self, spark):
        out = run_esql(
            "FROM e | STATS n = count(*) BY d = BUCKET(ts, 1 day) "
            "| SORT d ASC",
            {"e": _events(spark)},
        ).collect()
        assert [r.n for r in out] == [3, 1]
        wk = run_esql(
            "FROM e | STATS n = count(*) BY w = BUCKET(ts, 1 week)",
            {"e": _events(spark)},
        ).collect()
        assert len(wk) == 1 and wk[0].n == 4  # same ISO week

    def test_fixed_multi_unit_epoch_aligned(self, spark):
        out = run_esql(
            "FROM e | STATS n = count(*) BY b = BUCKET(ts, 30 minutes) "
            "| SORT b ASC",
            {"e": _events(spark)},
        ).collect()
        assert [r.b.minute for r in out] == [0, 30, 0, 30]

    def test_numeric_bucket(self, spark):
        out = run_esql(
            "FROM e | WHERE value IS NOT NULL "
            "| STATS n = count(*) BY vb = BUCKET(value, 1.5) "
            "| SORT vb ASC",
            {"e": _events(spark)},
        ).collect()
        assert [(r.vb, r.n) for r in out] == [(0.0, 1), (1.5, 1), (7.5, 1)]

    def test_bucket_errors(self, spark):
        e = _events(spark)
        # round 9: the 4-arg auto form is now lowered; a 3-arg call
        # is the remaining arity error
        with pytest.raises(ValueError, match="BUCKET"):
            run_esql(
                "FROM e | STATS n = count(*) BY BUCKET(ts, 50, 0)",
                {"e": e},
            )
        with pytest.raises(ValueError, match="only bucket by 1"):
            run_esql(
                "FROM e | STATS n = count(*) BY BUCKET(ts, 2 weeks)",
                {"e": e},
            )
        with pytest.raises(ValueError, match="cannot parse span"):
            run_esql(
                "FROM e | STATS n = count(*) BY BUCKET(ts, soon)",
                {"e": e},
            )
        with pytest.raises(ValueError, match="must be positive"):
            run_esql(
                "FROM e | STATS n = count(*) BY BUCKET(value, 0)",
                {"e": e},
            )


class TestSortNulls:
    def test_default_null_is_largest(self, spark):
        e = _events(spark)
        asc = run_esql(
            "FROM e | SORT value ASC, event_id ASC | KEEP event_id",
            {"e": e},
        ).collect()
        assert [r.event_id for r in asc] == [3, 1, 4, 2]  # null LAST
        desc = run_esql(
            "FROM e | SORT value DESC, event_id ASC | KEEP event_id",
            {"e": e},
        ).collect()
        assert [r.event_id for r in desc] == [2, 4, 1, 3]  # null FIRST

    def test_explicit_override(self, spark):
        e = _events(spark)
        out = run_esql(
            "FROM e | SORT value ASC NULLS FIRST, event_id ASC "
            "| KEEP event_id",
            {"e": e},
        ).collect()
        assert [r.event_id for r in out] == [2, 3, 1, 4]

    def test_dangling_nulls_is_error(self, spark):
        with pytest.raises(ValueError, match="NULLS needs FIRST or LAST"):
            run_esql("FROM e | SORT value NULLS", {"e": _events(spark)})
        with pytest.raises(ValueError, match="unknown keyword"):
            run_esql("FROM e | SORT value ASCENDING",
                     {"e": _events(spark)})


class TestMvExpand:
    def test_null_and_empty_rows_survive(self, spark):
        out = run_esql(
            "FROM e | MV_EXPAND tags | KEEP event_id, tags "
            "| SORT event_id ASC, tags ASC",
            {"e": _events(spark)},
        ).collect()
        # id=2 (NULL array) and id=4 (empty array) both keep one row
        assert [(r.event_id, r.tags) for r in out] == [
            (1, "x"), (1, "y"), (2, None), (3, "z"), (4, None)]


class TestKeepDropWildcards:
    def test_keep_wildcard_order(self, spark):
        out = run_esql(
            "FROM e | KEEP event_*, ts", {"e": _events(spark)}
        )
        assert out.columns == ["event_id", "event_type", "ts"]

    def test_keep_exact_beats_wildcard_position(self, spark):
        # exact name wins over the wildcard and keeps ITS position
        out = run_esql(
            "FROM e | KEEP value, event_*, event_id",
            {"e": _events(spark)},
        )
        assert out.columns == ["value", "event_type", "event_id"]

    def test_keep_bare_star_lowest_precedence(self, spark):
        out = run_esql(
            "FROM e | KEEP value, *", {"e": _events(spark)}
        )
        assert out.columns[0] == "value"
        assert set(out.columns) == {
            "event_id", "ts", "event_type", "value", "tags"}

    def test_drop_wildcard(self, spark):
        out = run_esql("FROM e | DROP t*", {"e": _events(spark)})
        assert out.columns == ["event_id", "event_type", "value"]

    def test_unmatched_pattern_fails(self, spark):
        e = _events(spark)
        with pytest.raises(ValueError, match="KEEP: no column matches"):
            run_esql("FROM e | KEEP nope_*", {"e": e})
        with pytest.raises(ValueError, match="DROP: no column matches"):
            run_esql("FROM e | DROP nope_*", {"e": e})
        with pytest.raises(ValueError, match="cannot drop every"):
            run_esql("FROM e | DROP *", {"e": e})


class TestLookupJoin:
    def test_lookup_join_overrides_and_multiplies(self, spark):
        ev = spark.createDataFrame(
            [(1, "a", "old1"), (2, "b", "old2"), (3, "zz", "old3")],
            "event_id long, k string, label string",
        )
        lk = spark.createDataFrame(
            [("a", "A1", 10), ("a", "A2", 20), ("b", "B", 30)],
            "k string, label string, extra long",
        )
        out = run_esql(
            "FROM e | LOOKUP JOIN lk ON k "
            "| SORT event_id ASC, extra ASC NULLS LAST",
            {"e": ev, "lk": lk},
        ).collect()
        # lookup's label overrides the stream's; unmatched key -> NULLs;
        # two matching lookup rows multiply the stream row
        assert [(r.event_id, r.label, r.extra) for r in out] == [
            (1, "A1", 10), (1, "A2", 20), (2, "B", 30), (3, None, None)]

    def test_lookup_join_errors(self, spark):
        ev = spark.createDataFrame([(1, "a")], "id long, k string")
        lk = spark.createDataFrame([("a", 1)], "k string, v long")
        with pytest.raises(ValueError, match="unknown index"):
            run_esql("FROM e | LOOKUP JOIN nope ON k",
                     {"e": ev, "lk": lk})
        with pytest.raises(ValueError, match="no join field"):
            run_esql("FROM e | LOOKUP JOIN lk ON missing",
                     {"e": ev, "lk": lk})
        with pytest.raises(ValueError, match="stream has no join field"):
            run_esql("FROM e | LOOKUP JOIN lk ON v",
                     {"e": ev, "lk": lk})


class TestEnrichOverride:
    def test_enrich_overrides_existing_column(self, spark):
        ev = spark.createDataFrame(
            [(1, 10, "stale"), (2, 99, "stale")],
            "event_id long, cid long, tier string",
        )
        dim = spark.createDataFrame(
            [(10, "gold")], "cid long, tier string"
        )
        out = run_esql(
            "FROM e | ENRICH dim ON cid WITH tier | SORT event_id ASC",
            {"e": ev, "dim": dim},
        ).collect()
        # the enrich field REPLACES the stream's tier (ES rule) —
        # including a NULL for the unmatched key, never 'stale'
        assert [(r.event_id, r.tier) for r in out] == [
            (1, "gold"), (2, None)]

    def test_enrich_unknown_with_field_fails(self, spark):
        ev = spark.createDataFrame([(1, 10)], "id long, cid long")
        dim = spark.createDataFrame([(10, "g")], "cid long, tier string")
        with pytest.raises(ValueError, match="no field"):
            run_esql("FROM e | ENRICH dim ON cid WITH nope",
                     {"e": ev, "dim": dim})


class TestMvScalars:
    def test_mv_family(self, spark):
        out = run_esql(
            "FROM e | EVAL n = MV_COUNT(tags), lo = MV_MIN(tags), "
            'hi = MV_MAX(tags), j = MV_CONCAT(tags, ","), '
            "f = MV_FIRST(tags), l = MV_LAST(tags) "
            "| KEEP event_id, n, lo, hi, j, f, l | SORT event_id ASC",
            {"e": _events(spark)},
        ).collect()
        assert [r.asDict() for r in out] == [
            {"event_id": 1, "n": 2, "lo": "x", "hi": "y", "j": "x,y",
             "f": "x", "l": "y"},
            {"event_id": 2, "n": None, "lo": None, "hi": None,
             "j": None, "f": None, "l": None},
            {"event_id": 3, "n": 1, "lo": "z", "hi": "z", "j": "z",
             "f": "z", "l": "z"},
            {"event_id": 4, "n": 0, "lo": None, "hi": None, "j": "",
             "f": None, "l": None},
        ]

    def test_mv_numeric(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 2.0, 3.0]), (2, None), (3, [])],
            "id long, xs array<double>",
        )
        out = run_esql(
            "FROM t | EVAL s = MV_SUM(xs), a = MV_AVG(xs) "
            "| KEEP id, s, a | SORT id ASC",
            {"t": df},
        ).collect()
        assert [(r.id, r.s, r.a) for r in out] == [
            (1, 6.0, 2.0), (2, None, None), (3, None, None)]

    def test_nested_and_arity(self, spark):
        df = spark.createDataFrame(
            [(1, [[1.0, 2.0], [3.0]])],
            "id long, xss array<array<double>>",
        )
        out = run_esql(
            "FROM t | EVAL s = MV_SUM(MV_FIRST(xss)) | KEEP id, s",
            {"t": df},
        ).first()
        assert out.s == 3.0
        with pytest.raises(ValueError, match="expected 1 args"):
            run_esql("FROM t | EVAL s = MV_SUM(xss, 2)", {"t": df})


class TestEsqlFunctions:
    def test_to_conversions_null_on_failure(self, spark):
        df = spark.createDataFrame(
            [(1, "42", "Hello"), (2, "oops", "WORLD")],
            "id long, raw string, s string",
        )
        out = run_esql(
            "FROM t | EVAL n = TO_LONG(raw), d = TO_DOUBLE(raw), "
            "lo = TO_LOWER(s), up = TO_UPPER(s), st = TO_STRING(id) "
            "| SORT id ASC",
            {"t": df},
        ).collect()
        assert [(r.n, r.d) for r in out] == [(42, 42.0), (None, None)]
        assert (out[0].lo, out[1].up) == ("hello", "WORLD")
        assert out[0].st == "1"

    def test_date_family(self, spark):
        df = spark.createDataFrame(
            [(1, dt.datetime(2024, 3, 15, 10, 15, 30))],
            "id long, ts timestamp",
        )
        r = run_esql(
            'FROM t | EVAL y = DATE_EXTRACT("year", ts), '
            'dow = DATE_EXTRACT("day_of_week", ts), '
            'f = DATE_FORMAT("yyyy/MM/dd", ts), '
            'p = DATE_PARSE("yyyy-MM-dd", "2024-03-14"), '
            'dh = DATE_DIFF("hours", DATE_PARSE("yyyy-MM-dd", '
            '"2024-03-14"), ts)',
            {"t": df},
        ).first()
        assert (r.y, r.dow, r.f) == (2024, 5, "2024/03/15")  # ISO Friday=5
        assert r.p == dt.datetime(2024, 3, 14)
        assert r.dh == 34  # complete hours, ChronoUnit-style

    def test_date_errors(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError, match="unsupported ChronoField"):
            run_esql('FROM t | EVAL x = DATE_EXTRACT("nope", id)',
                     {"t": df})
        with pytest.raises(ValueError, match="unsupported unit"):
            run_esql('FROM t | EVAL x = DATE_DIFF("eons", id, id)',
                     {"t": df})
        with pytest.raises(ValueError, match="quoted string literal"):
            run_esql("FROM t | EVAL x = DATE_EXTRACT(id, id)",
                     {"t": df})

    def test_decimal_literals_are_double(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        out = run_esql("FROM t | EVAL x = 2.5, y = id + 0.25",
                       {"t": df})
        assert dict(out.dtypes)["x"] == "double"
        assert dict(out.dtypes)["y"] == "double"


class TestEsqlLikeRlike:
    def _df(self, spark):
        return spark.createDataFrame(
            [(1, "click"), (2, "view"), (3, "clack"), (4, "lick")],
            "id long, t string",
        )

    def test_like_star_question(self, spark):
        df = self._df(spark)
        ids = lambda q: [  # noqa: E731
            r.id for r in run_esql(q, {"t": df}).collect()]
        assert ids('FROM t | WHERE t LIKE "cl*ck" | SORT id') == [1, 3]
        assert ids('FROM t | WHERE t LIKE "cl?ck" | SORT id') == [1, 3]
        assert ids('FROM t | WHERE t LIKE "*ick*" | SORT id') == [1, 4]
        # whole-string: no implicit substring match
        assert ids('FROM t | WHERE t LIKE "lick" | SORT id') == [4]
        # SQL % is a LITERAL percent in ES|QL, not a wildcard
        assert ids('FROM t | WHERE t LIKE "%ick%" | SORT id') == []
        assert ids('FROM t | WHERE t NOT LIKE "*l*" | SORT id') == [2]

    def test_rlike_whole_string(self, spark):
        df = self._df(spark)
        ids = lambda q: [  # noqa: E731
            r.id for r in run_esql(q, {"t": df}).collect()]
        # 'lick' occurs INSIDE 'click' but ES|QL RLIKE is anchored
        assert ids('FROM t | WHERE t RLIKE "lick" | SORT id') == [4]
        assert ids('FROM t | WHERE t RLIKE "cl.ck" | SORT id') == [1, 3]
        assert ids('FROM t | WHERE t RLIKE ".*ick" | SORT id') == [1, 4]

    def test_like_in_string_literal_stays_literal(self, spark):
        df = spark.createDataFrame(
            [(1, "x LIKE 'y'"), (2, "plain")], "id long, t string"
        )
        out = run_esql(
            'FROM t | WHERE t == "x LIKE \'y\'"', {"t": df}
        ).collect()
        assert [r.id for r in out] == [1]


class TestEsqlRow:
    def test_row_source(self, spark):
        r = run_esql(
            'ROW a = 1, b = "x", c = 2.5 | EVAL d = a + c', {}
        ).first()
        assert (r.a, r.b, r.c, r.d) == (1, "x", 2.5, 3.5)

    def test_row_errors(self, spark):
        with pytest.raises(ValueError, match="needs 'name = expr'"):
            run_esql("ROW 42", {})
        with pytest.raises(ValueError, match="must start with FROM"):
            run_esql("WHERE x > 1", {})


class TestEsqlInlinestats:
    def _df(self, spark):
        return spark.createDataFrame(
            [(1, "a", 2.0), (2, "a", 4.0), (3, "b", 9.0),
             (4, None, 1.0), (5, None, 3.0)],
            "id long, k string, v double",
        )

    def test_by_key_with_null_group(self, spark):
        out = run_esql(
            "FROM t | INLINESTATS avg_v = avg(v) BY k | SORT id ASC",
            {"t": self._df(spark)},
        ).collect()
        assert [r.avg_v for r in out] == [3.0, 3.0, 9.0, 2.0, 2.0]
        assert len(out) == 5  # no collapse

    def test_global_broadcast_form(self, spark):
        df = self._df(spark)
        out = run_esql(
            "FROM t | INLINESTATS avg_v = avg(v), n = count(*) "
            "| WHERE v > avg_v | SORT id ASC",
            {"t": df},
        ).collect()
        assert [r.id for r in out] == [2, 3]
        assert all(r.n == 5 for r in out)
        # the plan must NOT contain a single-partition window
        plan = run_esql(
            "FROM t | INLINESTATS m = max(v)", {"t": df}
        )._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan

    def test_errors(self, spark):
        df = self._df(spark)
        with pytest.raises(ValueError, match="INLINESTATS: each"):
            run_esql("FROM t | INLINESTATS avg(v)", {"t": df})


class TestStatsWhere:
    def test_per_agg_filter(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 2.0), (2, "a", 5.0), (3, "b", 9.0), (4, "b", 1.0)],
            "id long, k string, v double",
        )
        out = run_esql(
            "FROM t | STATS n = count(*), big = count(*) WHERE v > 3, "
            "s = sum(v) WHERE v > 3 BY k | SORT k ASC",
            {"t": df},
        ).collect()
        assert [(r.k, r.n, r.big, r.s) for r in out] == [
            ("a", 2, 1, 5.0), ("b", 2, 1, 9.0)]

    def test_where_needs_condition(self, spark):
        df = spark.createDataFrame([(1, 1.0)], "id long, v double")
        with pytest.raises(ValueError, match="WHERE needs a condition"):
            run_esql("FROM t | STATS n = count(*) WHERE", {"t": df})


class TestCaseFunction:
    def test_case_with_default(self, spark):
        df = spark.createDataFrame(
            [(1, 5.0), (2, 2.0), (3, 0.5)], "id long, v double"
        )
        out = run_esql(
            'FROM t | EVAL lab = CASE(v > 4, "hi", v > 1, "mid", "lo") '
            "| SORT id ASC | KEEP lab",
            {"t": df},
        ).collect()
        assert [r.lab for r in out] == ["hi", "mid", "lo"]

    def test_case_without_default_yields_null(self, spark):
        df = spark.createDataFrame([(1, 0.5)], "id long, v double")
        r = run_esql(
            'FROM t | EVAL lab = CASE(v > 4, "hi")', {"t": df}
        ).first()
        assert r.lab is None

    def test_case_arity_error(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError, match="CASE: expected 2"):
            run_esql("FROM t | EVAL x = CASE(id)", {"t": df})


class TestReplaceSplit:
    def test_replace_is_regex(self, spark):
        df = spark.createDataFrame([(1, "x1y22z")], "id long, s string")
        r = run_esql(
            'FROM t | EVAL o = REPLACE(s, "[0-9]+", "#")', {"t": df}
        ).first()
        assert r.o == "x#y#z"

    def test_split_delimiter_is_literal(self, spark):
        df = spark.createDataFrame([(1, "a.b.c")], "id long, s string")
        r = run_esql(
            'FROM t | EVAL parts = SPLIT(s, ".")', {"t": df}
        ).first()
        assert r.parts == ["a", "b", "c"]  # '.' is NOT any-char


class TestMvWave3:
    def test_sort_dedupe_slice_append_zip(self, spark):
        df = spark.createDataFrame(
            [(1, [3, 1, 2, 1], ["x", "y"])],
            "id long, xs array<int>, ys array<string>",
        )
        r = run_esql(
            'FROM t | EVAL srt = MV_SORT(xs, "DESC"), '
            "dd = MV_DEDUPE(xs), sl = MV_SLICE(xs, 1, 2), "
            "one = MV_SLICE(xs, 0), neg = MV_SLICE(xs, -2, -1), "
            "ap = MV_APPEND(xs, xs), "
            'z = MV_ZIP(ys, ys, "-")',
            {"t": df},
        ).first()
        assert r.srt == [3, 2, 1, 1]
        assert sorted(r.dd) == [1, 2, 3]
        assert r.sl == [1, 2]
        assert r.one == [3]
        assert r.neg == [2, 1]
        assert r.ap == [3, 1, 2, 1, 3, 1, 2, 1]
        assert r.z == ["x-x", "y-y"]

    def test_slice_errors(self, spark):
        df = spark.createDataFrame([(1, [1, 2])], "id long, xs array<int>")
        with pytest.raises(ValueError, match="share a sign"):
            run_esql("FROM t | EVAL s = MV_SLICE(xs, -1, 1)", {"t": df})
        with pytest.raises(ValueError, match="end < start"):
            run_esql("FROM t | EVAL s = MV_SLICE(xs, 2, 1)", {"t": df})
        with pytest.raises(ValueError, match="integer literals"):
            run_esql("FROM t | EVAL s = MV_SLICE(xs, id, 1)", {"t": df})


class TestSample:
    def test_seeded_sample_reproducible(self, spark):
        big = spark.range(5000)
        a = run_esql("FROM t | SAMPLE 0.2 7", {"t": big}).count()
        b = run_esql("FROM t | SAMPLE 0.2 7", {"t": big}).count()
        assert a == b
        assert 700 < a < 1300  # ~1000 expected

    def test_sample_errors(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError, match="in \\(0, 1\\)"):
            run_esql("FROM t | SAMPLE 1.5", {"t": df})
        with pytest.raises(ValueError, match="probability"):
            run_esql("FROM t | SAMPLE 0.1 2 3", {"t": df})


class TestChangePoint:
    def test_step_marked_at_new_regime(self, spark):
        rows = [(float(i), 1.0 if i <= 10 else 11.0) for i in range(1, 21)]
        df = spark.createDataFrame(rows, "k double, v double")
        out = run_esql(
            "FROM t | CHANGE_POINT v ON k | WHERE type IS NOT NULL",
            {"t": df},
        ).collect()
        assert len(out) == 1
        assert out[0].k == 11.0  # first row of the NEW regime
        assert out[0].type == "step_change"
        assert out[0].pvalue < 0.01  # near-perfect split explains all

    def test_rows_preserved_and_custom_names(self, spark):
        rows = [(float(i), float(i > 5)) for i in range(1, 11)]
        df = spark.createDataFrame(rows, "k double, v double")
        out = run_esql(
            "FROM t | CHANGE_POINT v ON k AS cp, pv", {"t": df}
        )
        assert out.count() == 10
        assert {"cp", "pv"} <= set(out.columns)

    def test_errors(self, spark):
        df = spark.createDataFrame([(1.0, 2.0)], "k double, v double")
        with pytest.raises(ValueError, match="no column"):
            run_esql("FROM t | CHANGE_POINT nope ON k", {"t": df})
        with pytest.raises(ValueError, match="CHANGE_POINT needs"):
            run_esql("FROM t | CHANGE_POINT v", {"t": df})


class TestFork:
    def test_branches_union_with_discriminator(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 2.0), (2, "a", 5.0), (3, "b", 9.0)],
            "id long, k string, v double",
        )
        out = run_esql(
            'FROM t | FORK (WHERE v > 4 | EVAL tag = "big") '
            "(STATS n = count(*) BY k) "
            "| SORT _fork ASC, id ASC, k ASC",
            {"t": df},
        ).collect()
        forks = [r._fork for r in out]
        assert forks == ["fork1", "fork1", "fork2", "fork2"]
        assert out[0].tag == "big" and out[0].n is None
        assert out[2].n == 2 and out[2].tag is None  # NULL-filled

    def test_fork_errors(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError, match="2..8 parenthesized"):
            run_esql("FROM t | FORK (LIMIT 1)", {"t": df})
        with pytest.raises(ValueError, match="must be parenthesized"):
            run_esql("FROM t | FORK LIMIT 1", {"t": df})
        with pytest.raises(ValueError, match="unbalanced"):
            run_esql("FROM t | FORK ((LIMIT 1) (LIMIT 2)", {"t": df})

    def test_pipe_inside_string_inside_fork(self, spark):
        df = spark.createDataFrame([(1, "a|b")], "id long, s string")
        out = run_esql(
            'FROM t | FORK (WHERE s == "a|b") (WHERE s != "a|b") '
            "| SORT _fork ASC",
            {"t": df},
        ).collect()
        assert [r._fork for r in out] == ["fork1"]


class TestFromMetadata:
    def test_index_and_id(self, spark):
        a = spark.createDataFrame([(1, "x")], "doc_id long, t string")
        b = spark.createDataFrame([(2, "y")], "doc_id long, t string")
        out = run_esql(
            "FROM a, b METADATA _index, _id | SORT doc_id ASC",
            {"a": a, "b": b},
        ).collect()
        assert [(r._index, r._id) for r in out] == [("a", "1"), ("b", "2")]

    def test_unsupported_metadata_field(self, spark):
        a = spark.createDataFrame([(1,)], "doc_id long")
        with pytest.raises(ValueError, match="unsupported field"):
            run_esql("FROM a METADATA _version", {"a": a})


class TestMvMedian:
    def test_odd_even_null_empty(self, spark):
        df = spark.createDataFrame(
            [(1, [3.0, 1.0, 2.0]), (2, [4.0, 1.0, 3.0, 2.0]),
             (3, None), (4, [])],
            "id long, xs array<double>",
        )
        out = run_esql(
            "FROM t | EVAL med = MV_MEDIAN(xs) | KEEP id, med "
            "| SORT id ASC",
            {"t": df},
        ).collect()
        assert [r.med for r in out] == [2.0, 2.5, None, None]


class TestIpFunctions:
    def test_to_ip_and_cidr_match(self, spark):
        df = spark.createDataFrame(
            [(1, "10.128.3.7"), (2, "10.0.64.9"), (3, "10.0.0.1"),
             (4, "192.168.1.1"), (5, "not-an-ip"), (6, "10.256.0.1")],
            "id long, ip string",
        )
        out = run_esql(
            'FROM t | EVAL v = TO_IP(ip), '
            'm = CIDR_MATCH(ip, "10.128.0.0/9", "10.0.64.0/18") '
            "| KEEP id, v, m | SORT id ASC",
            {"t": df},
        ).collect()
        assert [(r.v, r.m) for r in out] == [
            ("10.128.3.7", True), ("10.0.64.9", True),
            ("10.0.0.1", False), ("192.168.1.1", False),
            (None, None),       # non-numeric piece folds to NULL
            # 256 octet: round 9 gates CIDR_MATCH's fold on the same
            # anchored IPv4 regex TO_IP uses, so a malformed address
            # is NULL (never a spurious integer), like ES
            (None, None),
        ]

    def test_cidr_exact_host(self, spark):
        df = spark.createDataFrame([(1, "1.2.3.4")], "id long, ip string")
        assert run_esql(
            'FROM t | WHERE CIDR_MATCH(ip, "1.2.3.4/32")', {"t": df}
        ).count() == 1
        assert run_esql(
            'FROM t | WHERE CIDR_MATCH(ip, "1.2.3.5")', {"t": df}
        ).count() == 0  # bare ip literal = /32

    def test_bad_cidr_literal(self, spark):
        df = spark.createDataFrame([(1, "1.2.3.4")], "id long, ip string")
        for bad in ["10.0.0.0/40", "10.0.0/8", "10.0.0.999/8", "x/8"]:
            with pytest.raises(ValueError, match="bad IPv4 CIDR"):
                run_esql(f'FROM t | WHERE CIDR_MATCH(ip, "{bad}")',
                         {"t": df})


class TestEsqlStreaming:
    def test_stateless_pipe_runs_on_a_stream(self, spark, tmp_path):
        """The stateless ES|QL commands (WHERE / EVAL / GROK / KEEP)
        run UNCHANGED over a Structured Streaming frame — the Kibana
        alerting shape: a live pipe filtering and parsing the stream,
        batch-equivalent by construction."""
        src = tmp_path / "src"
        spark.createDataFrame(
            [(1, "alice GET 200"), (2, "bob POST 500"),
             (3, "carol GET 404")],
            "id long, line string",
        ).write.parquet(str(src))

        pipe = (
            'FROM logs '
            '| GROK line "%{WORD:user} %{WORD:verb} %{INT:code:int}" '
            "| WHERE code >= 400 "
            "| EVAL sev = CASE(code >= 500, \"crit\", \"warn\") "
            "| KEEP id, user, code, sev"
        )
        stream = (
            spark.readStream.schema("id long, line string")
            .parquet(str(src))
        )
        out = run_esql(pipe, {"logs": stream})
        assert out.isStreaming
        q = (
            out.writeStream.format("memory")
            .queryName("esql_stream_t")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            spark.sql("SELECT * FROM esql_stream_t").collect(),
            key=lambda r: r.id,
        )
        batch = sorted(
            run_esql(pipe, {
                "logs": spark.read.parquet(str(src))}).collect(),
            key=lambda r: r.id,
        )
        assert [r.asDict() for r in got] == [r.asDict() for r in batch]
        assert [(r.id, r.sev) for r in got] == [(2, "crit"), (3, "warn")]


class TestSharedSqlCore:
    def test_passthrough_functions(self, spark):
        """The ES|QL scalar names that are ALREADY Spark SQL built-ins
        pass through the translator untouched — pin the shared core so
        a future rename in either dialect surfaces here."""
        df = spark.createDataFrame(
            [(1, "  Hello World  ", -3.7, 2.0)],
            "id long, s string, x double, y double",
        )
        r = run_esql(
            "FROM t | EVAL ln = LENGTH(TRIM(s)), "
            'sub = SUBSTRING(TRIM(s), 1, 5), '
            'cat = CONCAT("a", "-", "b"), '
            "ab = ABS(x), rd = ROUND(x, 1), fl = FLOOR(x), "
            "cl = CEIL(x), pw = POW(y, 3), sq = SQRT(y * 2), "
            "lg = LOG10(100), "
            "co = COALESCE(NULL, id), gr = GREATEST(id, 5), "
            "ls = LEAST(id, 5), lf = LEFT(TRIM(s), 2), "
            "rt = RIGHT(TRIM(s), 2)",
            {"t": df},
        ).first()
        assert r.ln == 11 and r.sub == "Hello"
        assert r.cat == "a-b"
        assert r.ab == 3.7 and r.rd == -3.7 and r.fl == -4 and r.cl == -3
        assert r.pw == 8.0 and r.sq == 2.0 and r.lg == 2.0
        assert r.co == 1 and r.gr == 5 and r.ls == 1
        assert (r.lf, r.rt) == ("He", "ld")


class TestDissectModifiers:
    def test_append_and_pad(self, spark):
        df = spark.createDataFrame(
            [(1, "2024 01 15   WARN disk full")],
            "id long, line string",
        )
        out = run_esql(
            'FROM t | DISSECT line '
            '"%{+date} %{+date} %{+date->} %{level} %{msg}" '
            'APPEND_SEPARATOR="-" | KEEP date, level, msg',
            {"t": df},
        ).first()
        # three appends joined by '-'; the -> pad eats the repeated
        # spaces before the level
        assert out.date == "2024-01-15"
        assert out.level == "WARN" and out.msg == "disk full"

    def test_append_default_empty_separator(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.ingest import (
            apply_ingest_pipeline,
        )

        df = spark.createDataFrame([(1, "ab cd")], "id long, s string")
        out = apply_ingest_pipeline(df, [{"dissect": {
            "field": "s", "pattern": "%{+w} %{+w}"}}]).first()
        assert out.w == "abcd"

    def test_reference_keys_rejected(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.ingest import (
            apply_ingest_pipeline,
        )

        df = spark.createDataFrame([(1, "a=b")], "id long, s string")
        with pytest.raises(ValueError, match="reference keys"):
            apply_ingest_pipeline(df, [{"dissect": {
                "field": "s", "pattern": "%{*k}=%{&k}"}}])

    def test_duplicate_key_still_rejected(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.ingest import (
            apply_ingest_pipeline,
        )

        df = spark.createDataFrame([(1, "a b")], "id long, s string")
        with pytest.raises(ValueError, match="duplicate key"):
            apply_ingest_pipeline(df, [{"dissect": {
                "field": "s", "pattern": "%{k} %{k}"}}])

    def test_nonmatch_still_null(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.ingest import (
            apply_ingest_pipeline,
        )

        df = spark.createDataFrame([(1, "nodelim")], "id long, s string")
        out = apply_ingest_pipeline(df, [{"dissect": {
            "field": "s", "pattern": "%{+a} %{+a}"}}]).first()
        assert out.a is None


class TestAggFunctions:
    def _df(self, spark):
        return spark.createDataFrame(
            [(1, "a", 2.0, 1.0), (2, "a", 4.0, 3.0), (3, "a", 9.0, 1.0),
             (4, "b", 5.0, 2.0), (5, "b", 5.0, 2.0)],
            "id long, k string, v double, w double",
        )

    def test_agg_family(self, spark):
        df = self._df(spark)
        out = run_esql(
            "FROM t | STATS cd = COUNT_DISTINCT(v), med = MEDIAN(v), "
            "p50 = PERCENTILE(v, 50), wavg = WEIGHTED_AVG(v, w), "
            'top2 = TOP(v, 2, "desc"), vals = VALUES(v) BY k '
            "| SORT k ASC",
            {"t": df},
        ).collect()
        a, b = out
        assert (a.k, a.cd, a.med, a.p50) == ("a", 3, 4.0, 4.0)
        assert a.wavg == pytest.approx((2 + 12 + 9) / 5.0)
        assert a.top2 == [9.0, 4.0] and a.vals == [2.0, 4.0, 9.0]
        assert (b.k, b.cd, b.med) == ("b", 1, 5.0)
        assert b.top2 == [5.0, 5.0] and b.vals == [5.0]

    def test_count_distinct_precision_ignored(self, spark):
        r = run_esql(
            "FROM t | STATS cd = COUNT_DISTINCT(v, 3000)",
            {"t": self._df(spark)},
        ).first()
        assert r.cd == 4  # exact, precision knob irrelevant

    def test_percentile_scale_is_0_to_100(self, spark):
        r = run_esql(
            "FROM t | STATS p100 = PERCENTILE(v, 100), "
            "p0 = PERCENTILE(v, 0)",
            {"t": self._df(spark)},
        ).first()
        assert (r.p0, r.p100) == (2.0, 9.0)

    def test_top_errors(self, spark):
        df = self._df(spark)
        with pytest.raises(ValueError, match="limit must be an integer"):
            run_esql('FROM t | STATS x = TOP(v, v, "asc")', {"t": df})
        with pytest.raises(ValueError, match="order must be"):
            run_esql('FROM t | STATS x = TOP(v, 2, "sideways")',
                     {"t": df})
