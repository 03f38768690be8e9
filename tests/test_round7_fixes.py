"""Round-7 ADVICE regressions: date-math grammar guard, NULL-aware
scroll cursors, _source-form cursor guard, PIT partition columns,
escaped wildcards in query_string."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.operators.luceneq import (
    query_string_to_dsl,
)
from cga_kinesis_to_elasticsearch_spark.operators.querydsl import (
    apply_query,
    run_search_body,
)
from cga_kinesis_to_elasticsearch_spark.operators.scroll import (
    open_pit,
    run_scroll,
)


class TestDateMathGrammarGuard:
    """A range bound is date math only when the WHOLE string parses as
    the date-math grammar; 'nowhere' stays a lexicographic literal."""

    def test_plain_string_starting_with_now_is_literal(self, spark):
        df = spark.createDataFrame(
            [(1, "movies"), (2, "nowhere"), (3, "zebra")],
            "doc_id long, title string",
        )
        got = sorted(
            r.doc_id
            for r in apply_query(
                df, {"range": {"title": {"gte": "nowhere"}}}
            ).collect()
        )
        assert got == [2, 3]

    def test_now_math_still_lowered(self, spark):
        df = spark.createDataFrame([(1,)], "doc_id long").withColumn(
            "ts", F.current_timestamp()
        )
        # now-7d/d is in the past: every current-timestamp row matches
        assert (
            apply_query(df, {"range": {"ts": {"gte": "now-7d/d"}}}).count()
            == 1
        )

    def test_invalid_now_suffix_is_literal_not_error(self, spark):
        # 'now-7x' fails the grammar -> literal string comparison (ES
        # only applies date math to date fields; we have no mapping)
        df = spark.createDataFrame(
            [(1, "now-7x"), (2, "abc")], "doc_id long, v string"
        )
        got = sorted(
            r.doc_id
            for r in apply_query(
                df, {"range": {"v": {"gte": "now-7x"}}}
            ).collect()
        )
        assert got == [1]


class TestScrollNullCursors:
    """A NULL sort-key tail must not terminate the scroll early: the
    search_after predicate is null-aware per the key's null position."""

    def _frame(self, spark):
        rows = [(i, None if i % 3 == 0 else f"g{i % 5}") for i in range(40)]
        return spark.createDataFrame(rows, "doc_id long, grp string")

    def test_null_tail_scroll_is_exhaustive(self, spark):
        df = self._frame(spark)
        pages = list(
            run_scroll(df, {"sort": [{"grp": "asc"}]}, page_size=7)
        )
        seen = [r["doc_id"] for p in pages for r in p]
        assert sorted(seen) == list(range(40))  # exhaustive
        assert len(seen) == len(set(seen))  # disjoint

    def test_null_first_scroll_is_exhaustive(self, spark):
        df = self._frame(spark)
        pages = list(
            run_scroll(
                df,
                {"sort": [{"grp": {"order": "desc", "missing": "_first"}}]},
                page_size=9,
            )
        )
        seen = [r["doc_id"] for p in pages for r in p]
        assert sorted(seen) == list(range(40))
        assert len(seen) == len(set(seen))

    def test_search_after_null_cursor_direct(self, spark):
        df = self._frame(spark)
        # page starting strictly after a NULL grp cursor (nulls sort
        # last): only later-doc_id null-grp rows may follow
        out = run_search_body(
            df,
            {
                "sort": [{"grp": "asc"}],
                "search_after": [None, 30],
                "size": 100,
            },
        ).collect()
        assert [r["doc_id"] for r in out] == [33, 36, 39]


class TestScrollSourceForms:
    def _df(self, spark):
        return spark.createDataFrame(
            [(i, f"g{i % 3}", i * 10) for i in range(12)],
            "doc_id long, grp string, val long",
        )

    def test_source_dict_includes(self, spark):
        df = self._df(spark)
        pages = list(
            run_scroll(
                df,
                {
                    "sort": [{"doc_id": "asc"}],
                    "_source": {"includes": ["doc_id", "grp"]},
                },
                page_size=5,
            )
        )
        assert sum(len(p) for p in pages) == 12
        assert set(pages[0][0].asDict()) == {"doc_id", "grp"}

    def test_source_wildcard_list(self, spark):
        df = self._df(spark)
        pages = list(
            run_scroll(
                df,
                {"sort": [{"doc_id": "asc"}], "_source": ["*"]},
                page_size=5,
            )
        )
        assert sum(len(p) for p in pages) == 12

    def test_source_single_string(self, spark):
        df = self._df(spark)
        pages = list(
            run_scroll(
                df,
                {"sort": [{"doc_id": "asc"}], "_source": "doc_id"},
                page_size=5,
            )
        )
        assert sum(len(p) for p in pages) == 12

    def test_source_dropping_cursor_still_rejected(self, spark):
        df = self._df(spark)
        with pytest.raises(ValueError, match="cursor columns"):
            list(
                run_scroll(
                    df,
                    {"sort": [{"grp": "asc"}], "_source": ["grp"]},
                    page_size=5,
                )
            )


class TestPitPartitionColumns:
    def test_pit_keeps_hive_partition_columns(self, spark, tmp_path):
        path = str(tmp_path / "t")
        spark.range(20).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 2).cast("string").alias("es_index"),
        ).write.partitionBy("es_index").parquet(path)
        pit = open_pit(spark, path)
        assert "es_index" in pit.columns
        assert pit.count() == 20


class TestIntWidthNotes:
    """The two round-6 int-width oracle notes are gone for good: the
    oracle SQL casts l_linenumber / c_nationkey to BIGINT, and the
    sweep's compare() now counts notes (non-zero exit on any)."""

    def test_previously_noted_queries_are_note_free(self, spark, sf_dir):
        import importlib.util
        from pathlib import Path

        import duckdb

        repo = Path(__file__).resolve().parent.parent
        spec = importlib.util.spec_from_file_location(
            "check_oracle", repo / "scripts" / "check_oracle.py"
        )
        co = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(co)

        from cga_kinesis_to_elasticsearch_spark.plans import (
            oracle_sql,
            queries,
        )

        con = duckdb.connect()
        for t in co.TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        qs, oracles = queries(), oracle_sql()
        for name in ("es_search_parent_id_body", "es_search_terms_lookup"):
            sdf = qs[name](spark, sf_dir).toPandas()
            odf = con.execute(oracles[name]).fetchdf()
            problems, notes = co.compare(name, sdf, odf)
            assert problems == [], f"{name}: {problems}"
            assert notes == 0, f"{name}: {notes} int-width notes"


class TestEscapedWildcard:
    def test_escaped_star_stays_literal(self):
        dsl = query_string_to_dsl(
            {"query": r"foo\*bar*", "default_field": "text"}
        )
        assert dsl == {"_token_wildcard": {"text": r"foo\*bar*"}}

    def test_escaped_star_matching(self, spark):
        df = spark.createDataFrame(
            [(1, "foo*barista x"), (2, "fooXbarista x"), (3, "foo*b x")],
            "doc_id long, text string",
        )
        dsl = query_string_to_dsl(
            {"query": r"foo\*bar*", "default_field": "text"}
        )
        got = sorted(
            r.doc_id for r in apply_query(df, dsl).collect()
        )
        # only the literal-star token with the bar prefix matches
        assert got == [1]

    def test_plain_wildcard_unchanged(self, spark):
        df = spark.createDataFrame(
            [(1, "foodbar y"), (2, "fo bar")], "doc_id long, text string"
        )
        dsl = query_string_to_dsl(
            {"query": "foo*bar", "default_field": "text"}
        )
        got = [r.doc_id for r in apply_query(df, dsl).collect()]
        assert got == [1]

    def test_public_wildcard_backslash_escape(self, spark):
        df = spark.createDataFrame(
            [(1, "a*b"), (2, "aXb")], "doc_id long, v string"
        )
        got = [
            r.doc_id
            for r in apply_query(
                df, {"wildcard": {"v": r"a\*b"}}
            ).collect()
        ]
        assert got == [1]
