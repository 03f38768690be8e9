"""Round-9 ES|QL surface: string-literal backslash escapes, LIKE
escaped wildcards (``\\*`` / ``\\?`` as literals), the CIDR_MATCH
malformed-IP gate, MV_ZIP's longer-tail rule, the full-text WHERE
bridge (MATCH / QSTR), NOW() + datetime arithmetic, and the BUCKET()
4-arg auto form."""

from __future__ import annotations

import datetime as dt

import pytest

from cga_kinesis_to_elasticsearch_spark.operators.esql import run_esql


def _strings(spark):
    return spark.createDataFrame(
        [
            (1, "a*b"),
            (2, "axb"),
            (3, 'say "hi"'),
            (4, "back\\slash"),
            (5, "tab\there"),
        ],
        "id long, s string",
    )


class TestStringEscapes:
    def test_escaped_quote_in_literal(self, spark):
        out = run_esql(
            'FROM t | WHERE s == "say \\"hi\\""', {"t": _strings(spark)}
        ).collect()
        assert [r.id for r in out] == [3]

    def test_escaped_backslash_in_literal(self, spark):
        out = run_esql(
            'FROM t | WHERE s == "back\\\\slash"', {"t": _strings(spark)}
        ).collect()
        assert [r.id for r in out] == [4]

    def test_tab_escape(self, spark):
        out = run_esql(
            'FROM t | WHERE s == "tab\\there"', {"t": _strings(spark)}
        ).collect()
        assert [r.id for r in out] == [5]

    def test_pipe_inside_escaped_quote_string(self, spark):
        # the escaped quote must not end the literal early — the
        # following | is literal text, not a stage separator
        df = spark.createDataFrame([('a"|b',)], "s string")
        out = run_esql(
            'FROM t | WHERE s == "a\\"|b" | LIMIT 5', {"t": df}
        ).collect()
        assert len(out) == 1

    def test_unknown_escape_passes_through(self, spark):
        # "\d+" keeps its backslash (regex convenience) — RLIKE
        # sees the raw \d+ pattern
        df = spark.createDataFrame([("123",), ("abc",)], "s string")
        out = run_esql(
            'FROM t | WHERE s RLIKE "\\d+"', {"t": df}
        ).collect()
        assert [r.s for r in out] == ["123"]


class TestLikeEscapedWildcards:
    def test_literal_star(self, spark):
        out = run_esql(
            'FROM t | WHERE s LIKE "a\\\\*b"', {"t": _strings(spark)}
        ).collect()
        assert [r.s for r in out] == ["a*b"]

    def test_question_still_wildcard(self, spark):
        out = run_esql(
            'FROM t | WHERE s LIKE "a?b" | SORT id', {"t": _strings(spark)}
        ).collect()
        assert [r.s for r in out] == ["a*b", "axb"]

    def test_literal_question(self, spark):
        df = spark.createDataFrame([("a?b",), ("axb",)], "s string")
        out = run_esql(
            'FROM t | WHERE s LIKE "a\\\\?b"', {"t": df}
        ).collect()
        assert [r.s for r in out] == ["a?b"]

    def test_literal_backslash_in_pattern(self, spark):
        # ES|QL source "back\\\\*" -> raw pattern back\\* -> literal
        # backslash + wildcard run
        out = run_esql(
            'FROM t | WHERE s LIKE "back\\\\\\\\*"',
            {"t": _strings(spark)},
        ).collect()
        assert [r.s for r in out] == ["back\\slash"]

    def test_dangling_backslash_is_error(self, spark):
        with pytest.raises(ValueError, match="dangling backslash"):
            run_esql(
                'FROM t | WHERE s LIKE "ab\\\\"', {"t": _strings(spark)}
            )


class TestCidrMatchGate:
    def test_malformed_ips_never_match(self, spark):
        # '10.1' used to fold to a spurious small integer; '300.1.2.3'
        # has an octet > 255; both must be NULL (no match), like ES
        df = spark.createDataFrame(
            [("10.1.2.3",), ("10.1",), ("300.1.2.3",), ("1.2.3.4.5",),
             ("not-an-ip",), (None,)],
            "ip string",
        )
        out = run_esql(
            'FROM t | EVAL m = CIDR_MATCH(ip, "10.0.0.0/8") | KEEP ip, m',
            {"t": df},
        ).collect()
        got = {r.ip: r.m for r in out}
        assert got["10.1.2.3"] is True
        assert got["10.1"] is None
        assert got["300.1.2.3"] is None
        assert got["1.2.3.4.5"] is None
        assert got["not-an-ip"] is None
        assert got[None] is None

    def test_valid_ip_outside_block_is_false(self, spark):
        df = spark.createDataFrame([("11.0.0.1",)], "ip string")
        r = run_esql(
            'FROM t | EVAL m = CIDR_MATCH(ip, "10.0.0.0/8")', {"t": df}
        ).first()
        assert r.m is False


class TestMvZipTail:
    def test_longer_left_tail_kept(self, spark):
        df = spark.createDataFrame(
            [(["a", "b", "c"], ["1"])],
            "x array<string>, y array<string>",
        )
        r = run_esql(
            'FROM t | EVAL z = MV_ZIP(x, y, "-")', {"t": df}
        ).first()
        assert r.z == ["a-1", "b", "c"]

    def test_longer_right_tail_kept(self, spark):
        df = spark.createDataFrame(
            [(["a"], ["1", "2", "3"])],
            "x array<string>, y array<string>",
        )
        r = run_esql("FROM t | EVAL z = MV_ZIP(x, y)", {"t": df}).first()
        assert r.z == ["a,1", "2", "3"]


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "merge sort beats bubble sort"),
            (2, "vector scan with filters"),
            (3, "hash merge scan pipeline"),
            (4, None),
        ],
        "id long, body string",
    )


class TestFullTextBridge:
    def test_match_default_or(self, spark):
        out = run_esql(
            'FROM d | WHERE MATCH(body, "merge scan") | SORT id',
            {"d": _docs(spark)},
        ).collect()
        assert [r.id for r in out] == [1, 2, 3]

    def test_match_operator_and(self, spark):
        out = run_esql(
            'FROM d | WHERE MATCH(body, "merge scan", '
            '{"operator": "AND"})',
            {"d": _docs(spark)},
        ).collect()
        assert [r.id for r in out] == [3]

    def test_match_composes_with_booleans(self, spark):
        out = run_esql(
            'FROM d | WHERE NOT MATCH(body, "merge") AND id < 4',
            {"d": _docs(spark)},
        ).collect()
        assert [r.id for r in out] == [2]

    def test_qstr_fielded_lucene(self, spark):
        out = run_esql(
            'FROM d | WHERE QSTR("body:merge AND body:scan")',
            {"d": _docs(spark)},
        ).collect()
        assert [r.id for r in out] == [3]

    def test_qstr_phrase(self, spark):
        out = run_esql(
            'FROM d | WHERE QSTR("body:\\"merge scan\\"")',
            {"d": _docs(spark)},
        ).collect()
        assert [r.id for r in out] == [3]

    def test_qstr_default_field_option(self, spark):
        out = run_esql(
            'FROM d | WHERE QSTR("merge scan", '
            '{"default_field": "body", "default_operator": "and"})',
            {"d": _docs(spark)},
        ).collect()
        assert [r.id for r in out] == [3]

    def test_qstr_unfielded_without_default_fails(self, spark):
        with pytest.raises(ValueError, match="default_field or fields"):
            run_esql(
                'FROM d | WHERE QSTR("bare terms")', {"d": _docs(spark)}
            )

    def test_kql_lowers_like_match(self, spark):
        # KQL() is now a real parser (operators/kql; tests/test_kql.py
        # covers it) — here just pin the bridge parity with MATCH
        out = run_esql(
            'FROM d | WHERE KQL("body:scan")', {"d": _docs(spark)}
        ).collect()
        assert sorted(r.id for r in out) == [2, 3]

    def test_match_unsupported_option_fails(self, spark):
        with pytest.raises(ValueError, match="unsupported option"):
            run_esql(
                'FROM d | WHERE MATCH(body, "x", {"fuzziness": 1})',
                {"d": _docs(spark)},
            )

    def test_match_outside_where_fails(self, spark):
        with pytest.raises(ValueError, match="only supported in WHERE"):
            run_esql(
                'FROM d | EVAL m = MATCH(body, "x")', {"d": _docs(spark)}
            )

    def test_match_bad_arity(self, spark):
        with pytest.raises(ValueError, match="MATCH"):
            run_esql("FROM d | WHERE MATCH(body)", {"d": _docs(spark)})

    def test_match_query_must_be_literal(self, spark):
        with pytest.raises(ValueError, match="string literal"):
            run_esql(
                "FROM d | WHERE MATCH(body, id)", {"d": _docs(spark)}
            )

    def test_placeholders_dropped(self, spark):
        out = run_esql(
            'FROM d | WHERE MATCH(body, "merge") OR QSTR("body:vector")',
            {"d": _docs(spark)},
        )
        assert out.columns == ["id", "body"]
        assert sorted(r.id for r in out.collect()) == [1, 2, 3]


class TestNowAndIntervals:
    def test_now_anchor_datetime(self, spark):
        df = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1, 10, 0)),
             (2, dt.datetime(2024, 1, 1, 11, 30)),
             (3, dt.datetime(2024, 1, 2, 9, 0))],
            "id long, ts timestamp",
        )
        out = run_esql(
            "FROM e | WHERE ts > NOW() - 1 hour AND ts <= NOW()",
            {"e": df},
            now=dt.datetime(2024, 1, 1, 12, 0),
        ).collect()
        assert [r.id for r in out] == [2]

    def test_now_anchor_string(self, spark):
        df = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1, 10, 0))], "id long, ts timestamp"
        )
        n = run_esql(
            "FROM e | WHERE ts >= NOW() - 1 day | STATS n = count(*)",
            {"e": df},
            now="2024-01-02 09:00:00",
        ).first()
        assert n.n == 1

    def test_interval_arithmetic_in_eval(self, spark):
        df = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, 10, 0),)], "ts timestamp"
        )
        r = run_esql(
            "FROM e | EVAL w = ts + 2 weeks, q = ts + 1 quarter, "
            "ms = ts + 250 milliseconds",
            {"e": df},
        ).first()
        assert r.w == dt.datetime(2024, 1, 15, 10, 0)
        assert r.q == dt.datetime(2024, 4, 1, 10, 0)
        assert r.ms == dt.datetime(2024, 1, 1, 10, 0, 0, 250000)

    def test_duration_inside_string_untouched(self, spark):
        df = spark.createDataFrame([("wait 1 hour",)], "s string")
        out = run_esql(
            'FROM e | WHERE s == "wait 1 hour"', {"e": df}
        ).collect()
        assert len(out) == 1

    def test_bad_anchor_rejected(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError, match="bad now anchor"):
            run_esql("FROM e | LIMIT 1", {"e": df}, now="junk")

    def test_default_now_is_current(self, spark):
        df = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1),)], "ts timestamp"
        )
        n = run_esql(
            "FROM e | WHERE ts < NOW() | STATS n = count(*)", {"e": df}
        ).first()
        assert n.n == 1


class TestBucketAuto:
    def _events(self, spark):
        return spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, h), float(h)) for h in range(24)],
            "ts timestamp, v double",
        )

    def test_year_span_target20_is_month(self, spark):
        # the ES docs' own example: 1-year span, 20 buckets -> 1 month
        df = spark.createDataFrame(
            [(dt.datetime(1985, m, 15),) for m in (1, 4, 7)],
            "ts timestamp",
        )
        out = run_esql(
            'FROM e | STATS n = count(*) BY b = BUCKET(ts, 20, '
            '"1985-01-01T00:00:00Z", "1986-01-01T00:00:00Z") | SORT b',
            {"e": df},
        ).collect()
        assert [(r.b, r.n) for r in out] == [
            (dt.datetime(1985, 1, 1), 1),
            (dt.datetime(1985, 4, 1), 1),
            (dt.datetime(1985, 7, 1), 1),
        ]

    def test_day_span_target24_is_hour(self, spark):
        out = run_esql(
            'FROM e | STATS n = count(*) BY b = BUCKET(ts, 24, '
            '"2024-01-01", "2024-01-02")',
            {"e": self._events(spark)},
        ).collect()
        assert len(out) == 24  # hourly

    def test_numeric_auto_nice_width(self, spark):
        out = run_esql(
            "FROM e | STATS n = count(*) BY b = BUCKET(v, 5, 0, 24) "
            "| SORT b",
            {"e": self._events(spark)},
        ).collect()
        # raw 4.8 -> nice width 5
        assert [r.b for r in out] == [0.0, 5.0, 10.0, 15.0, 20.0]

    def test_three_args_rejected(self, spark):
        with pytest.raises(ValueError, match="BUCKET"):
            run_esql(
                'FROM e | STATS n = count(*) BY b = BUCKET(ts, 20, "2024-01-01")',
                {"e": self._events(spark)},
            )

    def test_non_literal_bound_rejected(self, spark):
        with pytest.raises(ValueError, match="LITERAL"):
            run_esql(
                "FROM e | STATS n = count(*) BY b = BUCKET(v, 5, v, 10)",
                {"e": self._events(spark)},
            )


class TestTsCommand:
    def test_ts_resolves_like_from(self, spark):
        df = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, 10), 1.0),
             (dt.datetime(2024, 1, 1, 11), 3.0)],
            "ts timestamp, v double",
        )
        out = run_esql(
            "TS m | STATS avg_v = avg(v) BY h = BUCKET(ts, 1 hour) "
            "| SORT h",
            {"m": df},
        ).collect()
        assert [r.avg_v for r in out] == [1.0, 3.0]

    def test_ts_aggs_need_dimensions(self, spark):
        df = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1), 1.0)], "ts timestamp, v double"
        )
        with pytest.raises(ValueError, match="ts_dimensions"):
            run_esql("TS m | STATS r = sum(RATE(v))", {"m": df})

    def test_ts_aggs_rejected_under_from(self, spark):
        df = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1), 1.0)], "ts timestamp, v double"
        )
        with pytest.raises(ValueError, match="TS source command"):
            run_esql("FROM m | STATS r = sum(RATE(v))", {"m": df})


def _series(spark):
    """Two series (h = host dimension): a counter that resets on h1
    and a clean counter on h2, sampled at 10 s intervals."""
    rows = [
        # h1: 0 -> 40 -> 10 (reset) -> 30: increase 40 + 10 + 20 = 70
        ("h1", dt.datetime(2024, 1, 1, 0, 0, 0), 0.0),
        ("h1", dt.datetime(2024, 1, 1, 0, 0, 10), 40.0),
        ("h1", dt.datetime(2024, 1, 1, 0, 0, 20), 10.0),
        ("h1", dt.datetime(2024, 1, 1, 0, 0, 30), 30.0),
        # h2: 5 -> 15 -> 45: increase 40 over 20 s
        ("h2", dt.datetime(2024, 1, 1, 0, 0, 0), 5.0),
        ("h2", dt.datetime(2024, 1, 1, 0, 0, 10), 15.0),
        ("h2", dt.datetime(2024, 1, 1, 0, 0, 20), 45.0),
    ]
    return spark.createDataFrame(rows, "h string, ts timestamp, v double")


class TestTsAggregates:
    def test_rate_reset_handling(self, spark):
        # h1: increase 70 over 30 s; h2: 40 over 20 s
        out = run_esql(
            "TS m | STATS r = sum(RATE(v)) BY h | SORT h",
            {"m": _series(spark)},
            ts_dimensions=["h"],
        ).collect()
        assert [(r.h, round(r.r, 6)) for r in out] == [
            ("h1", round(70 / 30, 6)),
            ("h2", 2.0),
        ]

    def test_increase_and_delta(self, spark):
        out = run_esql(
            "TS m | STATS inc = sum(INCREASE(v)), d = sum(DELTA(v)) "
            "BY h | SORT h",
            {"m": _series(spark)},
            ts_dimensions=["h"],
        ).collect()
        # DELTA is the gauge form: last - first, NO reset logic
        assert [(r.h, r.inc, r.d) for r in out] == [
            ("h1", 70.0, 30.0),
            ("h2", 40.0, 40.0),
        ]

    def test_irate_idelta_last_samples_only(self, spark):
        out = run_esql(
            "TS m | STATS ir = max(IRATE(v)), idl = max(IDELTA(v)) "
            "BY h | SORT h",
            {"m": _series(spark)},
            ts_dimensions=["h"],
        ).collect()
        # h1 last step: 10 -> 30 over 10 s; h2: 15 -> 45 over 10 s
        assert [(r.h, r.ir, r.idl) for r in out] == [
            ("h1", 2.0, 20.0),
            ("h2", 3.0, 30.0),
        ]

    def test_over_time_family(self, spark):
        out = run_esql(
            "TS m | STATS fst = min(FIRST_OVER_TIME(v)), "
            "lst = max(LAST_OVER_TIME(v)), "
            "n = sum(COUNT_OVER_TIME(v)), "
            "avg_of_avgs = avg(AVG_OVER_TIME(v)) BY h | SORT h",
            {"m": _series(spark)},
            ts_dimensions=["h"],
        ).collect()
        assert [(r.h, r.fst, r.lst, r.n) for r in out] == [
            ("h1", 0.0, 30.0, 4),
            ("h2", 5.0, 45.0, 3),
        ]
        assert out[0].avg_of_avgs == 20.0  # (0+40+10+30)/4

    def test_single_sample_series_rate_is_null(self, spark):
        df = spark.createDataFrame(
            [("h1", dt.datetime(2024, 1, 1), 7.0)],
            "h string, ts timestamp, v double",
        )
        out = run_esql(
            "TS m | STATS r = sum(RATE(v)), n = count(RATE(v))",
            {"m": df},
            ts_dimensions=["h"],
        ).collect()
        assert out[0].r is None and out[0].n == 0

    def test_global_by_omitted(self, spark):
        out = run_esql(
            "TS m | STATS total = sum(INCREASE(v))",
            {"m": _series(spark)},
            ts_dimensions=["h"],
        ).collect()
        assert out[0].total == 110.0

    def test_bare_inner_call_needs_outer(self, spark):
        with pytest.raises(ValueError, match="outer aggregate"):
            run_esql(
                "TS m | STATS r = RATE(v)",
                {"m": _series(spark)},
                ts_dimensions=["h"],
            )

    def test_plain_agg_mixed_in_is_ambiguous(self, spark):
        with pytest.raises(ValueError, match="ambiguous"):
            run_esql(
                "TS m | STATS r = sum(RATE(v)), n = count(*) BY h",
                {"m": _series(spark)},
                ts_dimensions=["h"],
            )

    def test_nested_ts_aggs_rejected(self, spark):
        with pytest.raises(ValueError, match="do not nest"):
            run_esql(
                "TS m | STATS r = sum(RATE(MAX_OVER_TIME(v)))",
                {"m": _series(spark)},
                ts_dimensions=["h"],
            )

    def test_per_agg_where_rejected(self, spark):
        with pytest.raises(ValueError, match="per-aggregate WHERE"):
            run_esql(
                "TS m | STATS r = sum(RATE(v)) WHERE v > 0 BY h",
                {"m": _series(spark)},
                ts_dimensions=["h"],
            )

    def test_absent_present_rejected(self, spark):
        with pytest.raises(ValueError, match="scrape interval"):
            run_esql(
                "TS m | STATS a = max(ABSENT_OVER_TIME(v))",
                {"m": _series(spark)},
                ts_dimensions=["h"],
            )

    def test_second_stats_collapse_rejected(self, spark):
        with pytest.raises(ValueError, match="already collapsed"):
            run_esql(
                "TS m | STATS r = sum(RATE(v)) BY h "
                "| STATS r2 = sum(RATE(r))",
                {"m": _series(spark)},
                ts_dimensions=["h"],
            )

    def test_plain_stats_after_ts_stats_ok(self, spark):
        out = run_esql(
            "TS m | STATS r = sum(RATE(v)) BY h | STATS n = count(*)",
            {"m": _series(spark)},
            ts_dimensions=["h"],
        ).collect()
        assert out[0].n == 2

    def test_ambiguous_time_col_fails(self, spark):
        df = spark.createDataFrame(
            [("h1", dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 1), 1.0)],
            "h string, ts timestamp, ts2 timestamp, v double",
        )
        with pytest.raises(ValueError, match="ts_time_col"):
            run_esql(
                "TS m | STATS r = sum(RATE(v)) BY h",
                {"m": df},
                ts_dimensions=["h"],
            )
        out = run_esql(
            "TS m | STATS n = sum(COUNT_OVER_TIME(v)) BY h",
            {"m": df},
            ts_dimensions=["h"],
            ts_time_col="ts",
        ).collect()
        assert out[0].n == 1

    def test_unknown_dimension_fails(self, spark):
        with pytest.raises(ValueError, match="dimension column"):
            run_esql(
                "TS m | STATS r = sum(RATE(v)) BY h",
                {"m": _series(spark)},
                ts_dimensions=["nope"],
            )

    def test_where_and_eval_compose_before_ts_stats(self, spark):
        # the pipe prefix runs unchanged; series split by the EVALed
        # dimension column is the caller's responsibility
        out = run_esql(
            "TS m | WHERE v >= 0 | EVAL v2 = v * 2 "
            "| STATS inc = sum(INCREASE(v2)) BY h | SORT h",
            {"m": _series(spark)},
            ts_dimensions=["h"],
        ).collect()
        assert [(r.h, r.inc) for r in out] == [
            ("h1", 140.0), ("h2", 80.0),
        ]


class TestKnnFunction:
    def test_knn_where(self, spark):
        emb = spark.createDataFrame(
            [
                (1, [1.0, 0.0], "a"),
                (2, [0.9, 0.1], "a"),
                (3, [0.0, 1.0], "b"),
                (4, [0.5, 0.5], "b"),
                (5, [1.0, 0.05], "a"),
            ],
            "vec_id long, v array<double>, g string",
        )
        out = run_esql(
            "FROM e | WHERE KNN(v, [1.0, 0.0], 2) | SORT vec_id",
            {"e": emb},
        ).collect()
        assert [r.vec_id for r in out] == [1, 5]

    def test_knn_prefilter_conjunct(self, spark):
        emb = spark.createDataFrame(
            [
                (1, [1.0, 0.0], "a"),
                (2, [0.9, 0.1], "b"),
                (3, [0.8, 0.2], "b"),
                (4, [0.0, 1.0], "b"),
            ],
            "vec_id long, v array<double>, g string",
        )
        # the conjunct pre-filters: top-2 among g == "b" only
        out = run_esql(
            'FROM e | WHERE KNN(v, [1.0, 0.0], 2) AND g == "b" '
            "| SORT vec_id",
            {"e": emb},
        ).collect()
        assert [r.vec_id for r in out] == [2, 3]

    def test_knn_score_metadata(self, spark):
        emb = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
            "vec_id long, v array<double>",
        )
        out = run_esql(
            "FROM e METADATA _score | WHERE KNN(v, [1.0, 0.0], 1)",
            {"e": emb},
        ).collect()
        assert out[0].vec_id == 1 and out[0]._score == 1.0

    def test_knn_default_k_and_options_map(self, spark):
        rows = [(i, [float(i), 1.0]) for i in range(20)]
        emb = spark.createDataFrame(rows, "vec_id long, v array<double>")
        assert (
            run_esql(
                "FROM e | WHERE KNN(v, [1.0, 0.0])", {"e": emb}
            ).count()
            == 10
        )
        assert (
            run_esql(
                'FROM e | WHERE KNN(v, [1.0, 0.0], {"k": 4})',
                {"e": emb},
            ).count()
            == 4
        )

    def test_knn_similarity_floor(self, spark):
        emb = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 0.1])],
            "vec_id long, v array<double>",
        )
        out = run_esql(
            'FROM e | WHERE KNN(v, [1.0, 0.0], {"k": 10, '
            '"similarity": 0.5}) | SORT vec_id',
            {"e": emb},
        ).collect()
        # only cos >= 0.5 qualify: vec 1 (1.0) and vec 3 (~0.995)
        assert [r.vec_id for r in out] == [1, 3]

    def test_knn_rejects_or_not_and_nesting(self, spark):
        emb = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, v array<double>"
        )
        with pytest.raises(ValueError, match="AND-conjuncts"):
            run_esql(
                "FROM e | WHERE KNN(v, [1.0]) OR vec_id == 1",
                {"e": emb},
            )
        with pytest.raises(ValueError, match="AND-conjuncts"):
            run_esql(
                "FROM e | WHERE NOT KNN(v, [1.0])", {"e": emb}
            )
        with pytest.raises(ValueError, match="top-level"):
            run_esql(
                "FROM e | WHERE (KNN(v, [1.0]) AND vec_id > 0)",
                {"e": emb},
            )
        with pytest.raises(ValueError, match="only supported in WHERE"):
            run_esql("FROM e | EVAL s = KNN(v, [1.0])", {"e": emb})
        with pytest.raises(ValueError, match="one call"):
            run_esql(
                "FROM e | WHERE KNN(v, [1.0]) AND KNN(v, [0.5])",
                {"e": emb},
            )


class TestLikePatternLists:
    def test_like_list_any_match(self, spark):
        df = spark.createDataFrame(
            [("alpha",), ("beta",), ("gamma",)], "s string"
        )
        out = run_esql(
            'FROM t | WHERE s LIKE ("al*", "b?ta")', {"t": df}
        ).collect()
        assert sorted(r.s for r in out) == ["alpha", "beta"]

    def test_rlike_list_whole_string(self, spark):
        df = spark.createDataFrame(
            [("123",), ("x9",), ("no",)], "s string"
        )
        out = run_esql(
            'FROM t | WHERE s RLIKE ("\\d+", "x.*")', {"t": df}
        ).collect()
        assert sorted(r.s for r in out) == ["123", "x9"]

    def test_list_needs_literals(self, spark):
        df = spark.createDataFrame([("a",)], "s string")
        with pytest.raises(ValueError, match="string literals"):
            run_esql("FROM t | WHERE s LIKE (s)", {"t": df})

    def test_escaped_wildcard_inside_list(self, spark):
        df = spark.createDataFrame([("a*b",), ("axb",)], "s string")
        out = run_esql(
            'FROM t | WHERE s LIKE ("a\\\\*b", "nope")', {"t": df}
        ).collect()
        assert [r.s for r in out] == ["a*b"]


class TestScalarFunctionBatch:
    def test_date_trunc_interval_first(self, spark):
        df = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, 10, 47, 31),)], "ts timestamp"
        )
        r = run_esql(
            "FROM t | EVAL h = DATE_TRUNC(1 hour, ts), "
            "h3 = DATE_TRUNC(3 hours, ts), d = DATE_TRUNC(1 day, ts)",
            {"t": df},
        ).first()
        assert r.h == dt.datetime(2024, 1, 1, 10)
        assert r.h3 == dt.datetime(2024, 1, 1, 9)  # epoch-aligned
        assert r.d == dt.datetime(2024, 1, 1)

    def test_locate_arg_order(self, spark):
        df = spark.createDataFrame([("beta",)], "s string")
        r = run_esql(
            'FROM t | EVAL l = LOCATE(s, "a"), '
            'l2 = LOCATE(s, "a", 3), miss = LOCATE(s, "z")',
            {"t": df},
        ).first()
        assert (r.l, r.l2, r.miss) == (4, 4, 0)

    def test_ip_prefix(self, spark):
        df = spark.createDataFrame(
            [("10.1.2.3",), ("192.168.5.77",), ("300.1.2.3",), (None,)],
            "ip string",
        )
        out = run_esql(
            "FROM t | EVAL p24 = IP_PREFIX(ip, 24, 112), "
            "p12 = IP_PREFIX(ip, 12, 112)",
            {"t": df},
        ).collect()
        got = {r.ip: (r.p24, r.p12) for r in out}
        assert got["10.1.2.3"] == ("10.1.2.0", "10.0.0.0")
        assert got["192.168.5.77"] == ("192.168.5.0", "192.160.0.0")
        assert got["300.1.2.3"] == (None, None)  # malformed -> NULL
        assert got[None] == (None, None)

    def test_ip_prefix_bad_length(self, spark):
        df = spark.createDataFrame([("1.2.3.4",)], "ip string")
        with pytest.raises(ValueError, match="0..32"):
            run_esql("FROM t | EVAL p = IP_PREFIX(ip, 40, 112)", {"t": df})

    def test_base64_roundtrip_and_lengths(self, spark):
        df = spark.createDataFrame([("héllo",)], "s string")
        r = run_esql(
            "FROM t | EVAL b = TO_BASE64(s), back = FROM_BASE64(TO_BASE64(s)), "
            "bytes = BYTE_LENGTH(s), chars = LENGTH(s)",
            {"t": df},
        ).first()
        assert r.back == "héllo"
        assert r.bytes == 6 and r.chars == 5  # é is 2 UTF-8 bytes

    def test_math_names(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        r = run_esql(
            "FROM t | EVAL tau = TAU(), dg = TO_DEGREES(PI()), "
            "rad = TO_RADIANS(180.0), h = SHA256(\"x\")",
            {"t": df},
        ).first()
        assert r.tau == pytest.approx(6.283185307179586)
        assert r.dg == pytest.approx(180.0)
        assert r.rad == pytest.approx(3.141592653589793)
        assert r.h == (
            "2d711642b726b04401627ca9fbac32f5c8530fb1903cc4db02258717921a4881"
        )


class TestMetadataScore:
    def _docs(self, spark):
        return spark.createDataFrame(
            [(1, "merge sort beats bubble sort"),
             (2, "vector scan with filters"),
             (3, "hash merge scan pipeline"),
             (4, "scan scan scan")],
            "doc_id long, body string",
        )

    def test_score_matches_search_ranking(self, spark):
        from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
            run_search_body,
        )

        df = self._docs(spark)
        out = run_esql(
            'FROM d METADATA _score | WHERE MATCH(body, "merge scan") '
            "| SORT _score DESC, doc_id | KEEP doc_id, _score",
            {"d": df},
        ).collect()
        hits = run_search_body(
            df, {"query": {"match": {"body": "merge scan"}}, "size": 10}
        ).collect()
        assert [r.doc_id for r in out] == [r.doc_id for r in hits]
        for a, b in zip(out, hits):
            assert a._score == pytest.approx(b._score, rel=1e-12)

    def test_score_zero_without_scoring_function(self, spark):
        out = run_esql(
            "FROM d METADATA _score | WHERE doc_id <= 2 | KEEP doc_id, _score",
            {"d": self._docs(spark)},
        ).collect()
        assert all(r._score == 0.0 for r in out)

    def test_scores_accumulate_across_functions(self, spark):
        df = self._docs(spark)
        both = run_esql(
            'FROM d METADATA _score | WHERE MATCH(body, "merge") '
            'OR MATCH(body, "scan") | KEEP doc_id, _score',
            {"d": df},
        ).collect()
        merge_only = run_esql(
            'FROM d METADATA _score | WHERE MATCH(body, "merge") '
            "| KEEP doc_id, _score",
            {"d": df},
        ).collect()
        m = {r.doc_id: r._score for r in merge_only}
        b = {r.doc_id: r._score for r in both}
        # doc 3 matches both functions: its OR score strictly exceeds
        # its merge-only score (the scan contribution added)
        assert b[3] > m[3]
        # doc 1 matches only merge: identical contribution
        assert b[1] == pytest.approx(m[1], rel=1e-12)

    def test_unsupported_metadata_field_still_loud(self, spark):
        with pytest.raises(ValueError, match="unsupported field"):
            run_esql(
                "FROM d METADATA _version | LIMIT 1",
                {"d": self._docs(spark)},
            )


class TestFuse:
    def _docs(self, spark):
        return spark.createDataFrame(
            [(1, "merge sort beats bubble sort"),
             (2, "vector scan with filters"),
             (3, "hash merge scan pipeline"),
             (4, "scan scan scan"),
             (5, "vector vector hash")],
            "doc_id long, body string",
        )

    _Q = '''
    FROM d METADATA _id, _score
    | FORK (WHERE MATCH(body, "merge") | SORT _score DESC, _id | LIMIT 3)
           (WHERE MATCH(body, "vector") | SORT _score DESC, _id | LIMIT 3)
    | FUSE
    | SORT _score DESC, _id
    | KEEP _id, _score
    '''

    def test_rrf_scores(self, spark):
        out = run_esql(self._Q, {"d": self._docs(spark)}).collect()
        got = {r._id: r._score for r in out}
        # doc 3 ranks 1st in the merge branch, doc 5 1st in vector;
        # docs 1 and 2 rank 2nd in theirs — classic 1/(60+rank)
        assert got["3"] == pytest.approx(1 / 61)
        assert got["5"] == pytest.approx(1 / 61)
        assert got["1"] == pytest.approx(1 / 62)
        assert got["2"] == pytest.approx(1 / 62)

    def test_rank_constant_override(self, spark):
        out = run_esql(
            self._Q.replace("| FUSE", "| FUSE rrf 10"),
            {"d": self._docs(spark)},
        ).collect()
        assert {round(r._score, 6) for r in out} == {
            round(1 / 11, 6), round(1 / 12, 6)
        }

    def test_linear_minmax(self, spark):
        out = run_esql(
            self._Q.replace("| FUSE", "| FUSE linear"),
            {"d": self._docs(spark)},
        ).collect()
        got = {r._id: r._score for r in out}
        assert got["3"] == 1.0 and got["5"] == 1.0
        assert got["1"] == 0.0 and got["2"] == 0.0

    def test_fork_column_dropped_and_dedup(self, spark):
        out = run_esql(self._Q, {"d": self._docs(spark)})
        assert out.columns == ["_id", "_score"]
        ids = [r._id for r in out.collect()]
        assert len(ids) == len(set(ids))

    def test_fuse_needs_metadata(self, spark):
        with pytest.raises(ValueError, match="_id"):
            run_esql(
                "FROM d | FORK (WHERE doc_id > 1) (WHERE doc_id < 3) "
                "| FUSE",
                {"d": self._docs(spark)},
            )

    def test_fuse_bad_method(self, spark):
        with pytest.raises(ValueError, match="rrf or linear"):
            run_esql(
                self._Q.replace("| FUSE", "| FUSE cosine"),
                {"d": self._docs(spark)},
            )


class TestCategorize:
    def test_digit_tokens_dropped(self, spark):
        df = spark.createDataFrame(
            [("GET /api/users/123 took 45ms",),
             ("GET /api/users/999 took 7ms",),
             ("POST /login failed for user42",),
             (None,)],
            "msg string",
        )
        out = run_esql(
            "FROM t | STATS n = count(*) BY cat = CATEGORIZE(msg) "
            "| SORT cat",
            {"t": df},
        ).collect()
        got = {r.cat: r.n for r in out}
        assert got["GET took"] == 2
        assert got["POST /login failed for"] == 1
        assert got[None] == 1  # NULL message forms the null group

    def test_usable_in_eval_too(self, spark):
        df = spark.createDataFrame([("a 1 b",)], "msg string")
        r = run_esql(
            "FROM t | EVAL cat = CATEGORIZE(msg)", {"t": df}
        ).first()
        assert r.cat == "a b"


class TestStatsByDistinctAndMvLiterals:
    def test_stats_by_without_aggs_is_distinct(self, spark):
        df = spark.createDataFrame(
            [(1, "a", "x"), (2, "a", "x"), (3, "b", "y")],
            "id long, k string, g string",
        )
        out = run_esql(
            "FROM t | STATS BY k, g | SORT k, g", {"t": df}
        ).collect()
        assert [(r.k, r.g) for r in out] == [("a", "x"), ("b", "y")]

    def test_stats_no_aggs_no_keys_still_error(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError, match="at least one aggregate"):
            run_esql("FROM t | STATS ", {"t": df})

    def test_row_mv_literal(self, spark):
        r = run_esql(
            "ROW a = [1, 2, 3], s = MV_SUM([1.5, 2.5]), "
            "nested = MV_COUNT([1, 2])",
            {},
        ).first()
        assert r.a == [1, 2, 3]
        assert r.s == 4.0
        assert r.nested == 2

    def test_index_access_untouched(self, spark):
        df = spark.createDataFrame(
            [(1, ["x", "y"]), (2, ["z"])], "id long, tags array<string>"
        )
        out = run_esql(
            'FROM t | WHERE tags[0] == "x" | KEEP id', {"t": df}
        ).collect()
        assert [r.id for r in out] == [1]

    def test_in_list_with_mv_literal(self, spark):
        df = spark.createDataFrame(
            [(1,), (2,), (3,)], "id long"
        )
        r = run_esql(
            "FROM t | WHERE id IN (1, 3) | STATS n = count(*)", {"t": df}
        ).first()
        assert r.n == 2


class TestFromWildcardsAndInlinestatsWhere:
    def test_from_wildcard_unions_matching_indices(self, spark):
        a = spark.createDataFrame([(1, "a")], "id long, src string")
        b = spark.createDataFrame([(2, "b")], "id long, src string")
        c = spark.createDataFrame([(3,)], "oid long")
        t = {"logs-2024.01": a, "logs-2024.02": b, "orders": c}
        out = run_esql("FROM logs-* | SORT id", t).collect()
        assert [r.id for r in out] == [1, 2]
        meta = run_esql(
            "FROM logs-* METADATA _index | SORT id | KEEP id, _index", t
        ).collect()
        assert [(r.id, r._index) for r in meta] == [
            (1, "logs-2024.01"), (2, "logs-2024.02")
        ]

    def test_from_wildcard_no_match_is_loud(self, spark):
        t = {"orders": spark.createDataFrame([(1,)], "id long")}
        with pytest.raises(ValueError, match="no index matches"):
            run_esql("FROM web-* | LIMIT 1", t)

    def test_inlinestats_per_agg_where(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 5.0), ("b", 2.0)], "k string, v double"
        )
        out = run_esql(
            "FROM e | INLINESTATS s = sum(v) WHERE v > 1.5, "
            "n = count(*) WHERE v > 1.5 BY k | SORT k, v",
            {"e": df},
        ).collect()
        assert [(r.k, r.s, r.n) for r in out] == [
            ("a", 5.0, 1), ("a", 5.0, 1), ("b", 2.0, 1)
        ]

    def test_date_format_default_iso(self, spark):
        df = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, 10, 47, 31, 123000),)],
            "ts timestamp",
        )
        r = run_esql(
            "FROM e | EVAL f = DATE_FORMAT(ts)", {"e": df}
        ).first()
        assert r.f == "2024-01-01T10:47:31.123Z"


class TestFullTextPhraseAndTerm:
    def test_match_phrase_consecutive_tokens(self, spark):
        out = run_esql(
            'FROM d | WHERE MATCH_PHRASE(body, "merge sort") | SORT id',
            {"d": _docs(spark)},
        ).collect()
        assert [r.id for r in out] == [1]

    def test_match_phrase_slop(self, spark):
        df = spark.createDataFrame(
            [(1, "merge sort"), (2, "sort merge"), (3, "merge a sort")],
            "id long, body string",
        )
        out = run_esql(
            'FROM d | WHERE MATCH_PHRASE(body, "merge sort", '
            '{"slop": 2}) | SORT id',
            {"d": df},
        ).collect()
        assert [r.id for r in out] == [1, 2, 3]

    def test_term_exact_unanalyzed(self, spark):
        df = spark.createDataFrame(
            [(1, "en"), (2, "de"), (3, "EN")], "id long, lang string"
        )
        out = run_esql(
            'FROM d | WHERE TERM(lang, "en")', {"d": df}
        ).collect()
        # no analysis on either side: "EN" does not match
        assert [r.id for r in out] == [1]

    def test_term_numeric_value(self, spark):
        df = spark.createDataFrame([(1,), (2,)], "id long")
        out = run_esql("FROM d | WHERE TERM(id, 2)", {"d": df}).collect()
        assert [r.id for r in out] == [2]

    def test_term_outside_where_fails(self, spark):
        df = spark.createDataFrame([(1, "en")], "id long, lang string")
        with pytest.raises(ValueError, match="only supported in WHERE"):
            run_esql('FROM d | EVAL x = TERM(lang, "en")', {"d": df})

    def test_match_phrase_bad_option_fails(self, spark):
        with pytest.raises(ValueError, match="MATCH_PHRASE"):
            run_esql(
                'FROM d | WHERE MATCH_PHRASE(body, "a b", '
                '{"operator": "AND"})',
                {"d": _docs(spark)},
            )


class TestRound9Scalars:
    def test_hash_named_digests(self, spark):
        import hashlib

        df = spark.createDataFrame([("hello",)], "s string")
        r = run_esql(
            'FROM t | EVAL m = HASH("md5", s), s1 = HASH("sha1", s), '
            's2 = HASH("sha256", s), s5 = HASH("SHA-512", s)',
            {"t": df},
        ).first()
        assert r.m == hashlib.md5(b"hello").hexdigest()
        assert r.s1 == hashlib.sha1(b"hello").hexdigest()
        assert r.s2 == hashlib.sha256(b"hello").hexdigest()
        assert r.s5 == hashlib.sha512(b"hello").hexdigest()

    def test_hash_rejects_unknown_and_nonliteral(self, spark):
        df = spark.createDataFrame([("x",)], "s string")
        with pytest.raises(ValueError, match="unsupported algorithm"):
            run_esql('FROM t | EVAL h = HASH("crc32", s)', {"t": df})
        with pytest.raises(ValueError, match="string literal"):
            run_esql("FROM t | EVAL h = HASH(s, s)", {"t": df})

    def test_mv_percentile_interpolation(self, spark):
        df = spark.createDataFrame(
            [([1.0, 3.0, 2.0, 10.0],)], "arr array<double>"
        )
        r = run_esql(
            "FROM t | EVAL p50 = MV_PERCENTILE(arr, 50), "
            "p0 = MV_PERCENTILE(arr, 0), p100 = MV_PERCENTILE(arr, 100), "
            "p75 = MV_PERCENTILE(arr, 75), bad = MV_PERCENTILE(arr, 150)",
            {"t": df},
        ).first()
        assert (r.p50, r.p0, r.p100) == (2.5, 1.0, 10.0)
        assert r.p75 == 3.0 + (10.0 - 3.0) * 0.25
        assert r.bad is None  # out-of-range p -> NULL, like ES

    def test_round_to_ladder(self, spark):
        df = spark.createDataFrame(
            [(1, 7000.0), (2, -5.0), (3, 100.0), (4, None)],
            "id long, v double",
        )
        out = run_esql(
            "FROM t | EVAL r = ROUND_TO(v, 0, 100, 5000, 10000) "
            "| SORT id",
            {"t": df},
        ).collect()
        # below every point clamps to the smallest; NULL stays NULL
        assert [r.r for r in out] == [5000, 0, 100, None]

    def test_round_to_rejects_nonliteral_points(self, spark):
        df = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(ValueError, match="numeric literals"):
            run_esql("FROM t | EVAL r = ROUND_TO(v, v)", {"t": df})


class TestSpatialScalars:
    def test_to_geopoint_wkt_and_accessors(self, spark):
        df = spark.createDataFrame(
            [("POINT (151.2093 -33.8688)",), ("POINT(1 2)",),
             ("not wkt",), (None,)],
            "wkt string",
        )
        out = run_esql(
            "FROM t | EVAL p = TO_GEOPOINT(wkt), x = ST_X(p), "
            "y = ST_Y(p)",
            {"t": df},
        ).collect()
        assert (out[0].x, out[0].y) == (151.2093, -33.8688)
        assert (out[1].x, out[1].y) == (1.0, 2.0)
        assert out[2].p is None and out[3].p is None

    def test_st_distance_haversine(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        r = run_esql(
            'FROM t | EVAL d = ST_DISTANCE('
            'TO_GEOPOINT("POINT (151.2093 -33.8688)"), '
            'TO_GEOPOINT("POINT (144.9631 -37.8136)"))',
            {"t": df},
        ).first()
        # Sydney -> Melbourne is ~713.4 km
        assert 710_000 < r.d < 717_000

    def test_st_distance_null_point_propagates(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        r = run_esql(
            'FROM t | EVAL d = ST_DISTANCE(TO_GEOPOINT("nope"), '
            'TO_GEOPOINT("POINT (0 0)"))',
            {"t": df},
        ).first()
        assert r.d is None

    def test_st_distance_zero(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        r = run_esql(
            'FROM t | EVAL d = ST_DISTANCE(TO_GEOPOINT("POINT (5 5)"), '
            'TO_GEOPOINT("POINT (5 5)"))',
            {"t": df},
        ).first()
        assert r.d == 0.0


class TestRerankAndCompletion:
    def _frame(self, spark):
        return spark.createDataFrame(
            [
                (1, "Merge scan vector!"),
                (2, "merge only here"),
                (3, "nothing relevant"),
                (4, None),
            ],
            "id long, body string",
        )

    def test_rerank_overwrites_score_and_resorts(self, spark):
        out = run_esql(
            'FROM d | RERANK "merge scan vector" ON body '
            "| KEEP id, _score",
            {"d": self._frame(spark)},
        ).collect()
        assert [(r.id, round(r._score, 4)) for r in out] == [
            (1, 1.0), (2, 0.3333), (3, 0.0), (4, 0.0),
        ]

    def test_rerank_target_form_keeps_order(self, spark):
        out = run_esql(
            'FROM d | RERANK rr = "merge scan vector" ON body '
            "| SORT id | KEEP id, rr",
            {"d": self._frame(spark)},
        ).collect()
        assert [r.id for r in out] == [1, 2, 3, 4]
        assert out[0].rr == 1.0 and out[3].rr == 0.0

    def test_rerank_after_match_overwrites_bm25(self, spark):
        # whitespace-analyzed MATCH keeps case, so only doc 2 is a
        # candidate; RERANK's standard-analyzer overlap rescales it
        out = run_esql(
            'FROM d METADATA _score | WHERE MATCH(body, "merge") '
            '| RERANK "merge scan" ON body | KEEP id, _score',
            {"d": self._frame(spark)},
        ).collect()
        assert [(r.id, r._score) for r in out] == [(2, 0.5)]

    def test_rerank_with_forms_and_errors(self, spark):
        df = self._frame(spark)
        run_esql(
            'FROM d | RERANK "x y" ON body WITH my_reranker', {"d": df}
        ).collect()
        run_esql(
            'FROM d | RERANK "x y" ON body WITH {"inference_id": "r"}',
            {"d": df},
        ).collect()
        with pytest.raises(ValueError, match="unknown field"):
            run_esql('FROM d | RERANK "q" ON nope', {"d": df})
        with pytest.raises(ValueError, match="no tokens"):
            run_esql('FROM d | RERANK "!!" ON body', {"d": df})
        with pytest.raises(ValueError, match="RERANK"):
            run_esql(
                'FROM d | RERANK "q" ON body WITH {"model": "x"}',
                {"d": df},
            )

    def test_completion_fails_loud(self, spark):
        with pytest.raises(ValueError, match="inference endpoint"):
            run_esql(
                'FROM d | COMPLETION "prompt" WITH model',
                {"d": self._frame(spark)},
            )
