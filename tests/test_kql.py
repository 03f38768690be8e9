"""KQL — the Kibana search-bar language — parsed onto the engine's
query-DSL tree and bridged into ES|QL via ``KQL()``."""

from __future__ import annotations

import pytest

from cga_kinesis_to_elasticsearch_spark.operators.esql import run_esql
from cga_kinesis_to_elasticsearch_spark.operators.kql import kql_to_dsl
from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
    compile_query,
)


class TestKqlToDsl:
    def test_field_value_is_match(self):
        assert kql_to_dsl("status:active") == {
            "match": {"status": "active"}
        }

    def test_and_binds_tighter_than_or(self):
        dsl = kql_to_dsl("a:1 or b:2 and c:3")
        assert dsl == {
            "bool": {
                "should": [
                    {"match": {"a": "1"}},
                    {"bool": {"must": [
                        {"match": {"b": "2"}}, {"match": {"c": "3"}},
                    ]}},
                ],
                "minimum_should_match": 1,
            }
        }

    def test_grouped_values_apply_the_field(self):
        dsl = kql_to_dsl("tier:(gold or silver)")
        assert dsl == {
            "bool": {
                "should": [
                    {"match": {"tier": "gold"}},
                    {"match": {"tier": "silver"}},
                ],
                "minimum_should_match": 1,
            }
        }

    def test_grouped_values_with_not(self):
        dsl = kql_to_dsl("tier:(gold and not silver)")
        assert dsl == {
            "bool": {"must": [
                {"match": {"tier": "gold"}},
                {"bool": {"must_not": [{"match": {"tier": "silver"}}]}},
            ]}
        }

    def test_phrase_and_wildcard_and_exists(self):
        assert kql_to_dsl('t:"a b"') == {"match_phrase": {"t": "a b"}}
        assert kql_to_dsl("t:me*") == {"_token_wildcard": {"t": "me*"}}
        assert kql_to_dsl("t:*") == {"exists": {"field": "t"}}

    def test_ranges_coerce_numerics(self):
        assert kql_to_dsl("n >= 10") == {"range": {"n": {"gte": 10}}}
        assert kql_to_dsl("n < 2.5") == {"range": {"n": {"lt": 2.5}}}
        assert kql_to_dsl('d > "2024-01-01"') == {
            "range": {"d": {"gt": "2024-01-01"}}
        }

    def test_bare_terms_need_default(self):
        with pytest.raises(ValueError, match="default_field or fields"):
            kql_to_dsl("merge")
        assert kql_to_dsl("merge", default_field="t") == {
            "match": {"t": "merge"}
        }

    def test_fields_fan_out(self):
        dsl = kql_to_dsl("merge", fields=["a", "b"])
        assert set(dsl) == {"bool"}
        assert len(dsl["bool"]["should"]) == 2

    def test_juxtaposed_terms_rejected(self):
        # KQL's whitespace-OR is a common accidental match-everything;
        # the subset demands the operator
        with pytest.raises(ValueError, match="and/or"):
            kql_to_dsl("foo bar", default_field="t")

    def test_nested_rejected(self):
        with pytest.raises(ValueError, match="nested"):
            kql_to_dsl("obj:{ a:1 }")

    def test_escaped_colon_in_field(self):
        assert kql_to_dsl("a\\:b:val") == {"match": {"a:b": "val"}}

    def test_escaped_star_stays_literal(self):
        dsl = kql_to_dsl("t:a\\*b")
        # an escaped * never becomes a wildcard: exact match leaf
        assert dsl == {"match": {"t": "a*b"}}

    def test_boost_rejected(self):
        with pytest.raises(ValueError, match="boost"):
            kql_to_dsl("x", fields=["t^2"])

    def test_unbalanced_group(self):
        with pytest.raises(ValueError):
            kql_to_dsl("t:(a or")


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "merge sort beats bubble sort", "en", 28),
            (2, "vector scan with filters", "de", 24),
            (3, "hash merge scan pipeline", "en", 24),
            (4, None, "fr", 0),
        ],
        "doc_id long, body string, lang string, n long",
    )


class TestKqlExecution:
    def test_compiles_and_filters(self, spark):
        df = _docs(spark)
        dsl = kql_to_dsl("body:(merge and scan) and lang:en")
        out = df.filter(compile_query(dsl)).collect()
        assert [r.doc_id for r in out] == [3]

    def test_esql_kql_function(self, spark):
        out = run_esql(
            'FROM d | WHERE KQL("body:merge and lang:en") | SORT doc_id',
            {"d": _docs(spark)},
        ).collect()
        assert [r.doc_id for r in out] == [1, 3]

    def test_esql_kql_group_and_range(self, spark):
        out = run_esql(
            'FROM d | WHERE KQL("body:(merge or vector) and n >= 24")',
            {"d": _docs(spark)},
        ).collect()
        assert [r.doc_id for r in out] == [1, 2, 3]

    def test_esql_kql_default_field_option(self, spark):
        out = run_esql(
            'FROM d | WHERE KQL("merge", {"default_field": "body"})',
            {"d": _docs(spark)},
        ).collect()
        assert [r.doc_id for r in out] == [1, 3]

    def test_esql_kql_bad_option(self, spark):
        with pytest.raises(ValueError, match="unsupported option"):
            run_esql(
                'FROM d | WHERE KQL("x", {"boost": 2})',
                {"d": _docs(spark)},
            )

    def test_esql_kql_parity_with_match(self, spark):
        df = _docs(spark)
        a = run_esql(
            'FROM d | WHERE KQL("body:merge")', {"d": df}
        ).collect()
        b = run_esql(
            'FROM d | WHERE MATCH(body, "merge")', {"d": df}
        ).collect()
        assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)
