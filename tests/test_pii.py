"""PII detection/redaction (operators/pii.py) and TF-IDF
(text.tf_idf_top_terms) — incl. the three-dialect regex probe."""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from cga_kinesis_to_elasticsearch_spark.operators import pii as P
from cga_kinesis_to_elasticsearch_spark.operators import text as T

PROBE = (
    "mail a.b_c%x+1@ex-ample.co.uk or bob@x.io, ip 10.1.200.7 and "
    "999.999.999.999, ssn 123-45-6789, card 1234-5678-9012-3456, "
    "call +1-555-123-4567 end"
)


class TestDialects:
    """Every pattern must behave identically in Java regex (Spark),
    RE2 (DuckDB) and Python re — the known cross-engine trap."""

    @pytest.mark.parametrize("name", list(P.PII_PATTERNS))
    def test_pattern_agrees_across_engines(self, spark, name):
        pat = P.PII_PATTERNS[name]
        py = re.findall(pat, PROBE)
        dk = duckdb.sql(
            "SELECT regexp_extract_all(?, ?)", params=[PROBE, pat]
        ).fetchone()[0]
        sp = (
            spark.createDataFrame([(PROBE,)], "t string")
            .select(F.regexp_extract_all("t", F.lit(pat), F.lit(0)).alias("m"))
            .collect()[0]
            .m
        )
        assert py == dk == sp
        assert py, f"probe text exercises no {name} matches"

    def test_redaction_chain_agrees(self, spark):
        expected = PROBE
        for name in P.REDACTION_ORDER:
            expected = re.sub(P.PII_PATTERNS[name], f"<{name.upper()}>", expected)
        got = (
            spark.createDataFrame([(PROBE,)], "t string")
            .select(P.redacted_col(F.col("t")).alias("r"))
            .collect()[0]
            .r
        )
        assert got == expected
        for name in P.PII_PATTERNS:
            assert not re.search(P.PII_PATTERNS[name], got)


class TestOperators:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [
            (0, PROBE),
            (1, "no pii here at all"),
            (2, "two mails a@b.co c@d.io and ip 1.2.3.4"),
        ]
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_detect_counts(self, docs):
        out = {r.doc_id: r for r in P.detect_pii(docs, "text", "doc_id").collect()}
        assert out[0].n_email == 2 and out[0].n_ssn == 1 and out[0].n_pii == 7
        assert out[1].n_pii == 0
        assert out[2].n_email == 2 and out[2].n_ipv4 == 1 and out[2].n_pii == 3

    def test_redact_leaves_clean_text_alone(self, docs):
        out = {r.doc_id: r.text for r in P.redact_pii(docs, "text").collect()}
        assert out[1] == "no pii here at all"
        assert "<EMAIL>" in out[0] and "<CARD>" in out[0]
        assert "a@b.co" not in out[2]

    def test_detection_counts_stay_jvm_side(self, docs):
        plan = P.detect_pii(docs, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestTfIdf:
    def test_top_terms_ordering_and_scores(self, spark):
        rows = [
            (1, "apple apple apple banana"),
            (2, "banana cherry cherry"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = T.tf_idf_top_terms(df, "text", "doc_id", top_k=2).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        # doc 1: apple (tf=3, df=1) far outscores banana (tf=1, df=2)
        assert [r.term for r in by_doc[1]] == ["apple", "banana"]
        assert by_doc[1][0].rank == 1 and by_doc[1][0].tf == 3
        # idf of a term in every doc: ln(3/3)+1 = 1 -> score == tf
        banana = [r for r in by_doc[1] if r.term == "banana"][0]
        assert banana.tf_idf == pytest.approx(1.0)
        # doc 2: cherry (tf=2, df=1) above banana
        assert [r.term for r in by_doc[2]] == ["cherry", "banana"]

    def test_rank_is_deterministic_on_ties(self, spark):
        df = spark.createDataFrame([(1, "zeta alpha")], "doc_id bigint, text string")
        out = T.tf_idf_top_terms(df, "text", "doc_id", top_k=2).collect()
        # equal scores -> term-ascending tiebreak
        assert [r.term for r in sorted(out, key=lambda r: r.rank)] == [
            "alpha",
            "zeta",
        ]
