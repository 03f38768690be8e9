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
