"""TF-IDF and PII scrub queries (training-data pipeline stages) under
the DuckDB oracle.

The documents fixture is synthetic word-salad with no PII, so the PII
queries append deterministic PII spans (email/ip per doc, ssn/card/
phone on every third doc) identically on both sides before detecting /
redacting — the machinery is exercised with non-zero match counts.
Every regex is dialect-probed across Java/RE2/Python (tests/test_pii.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import pii as P
from ..operators import text as T
from .declared import q
from .northstar import _norm_sql, _tp

_EXTRA = " ssn 123-45-6789 card 1234-5678-9012-3456 tel +1-555-123-4567"

_SYNTH_SQL = (
    "text || ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com at 10.1.'"
    " || CAST(doc_id % 200 AS VARCHAR) || '.7'"
    f" || CASE WHEN doc_id % 3 = 0 THEN '{_EXTRA}' ELSE '' END"
)


def _synth(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com at 10.1."),
            (F.col("doc_id") % 200).cast("string"),
            F.lit(".7"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(_EXTRA)).otherwise(F.lit("")),
        ).alias("text"),
    )


def _detect_oracle() -> str:
    counts = ",\n           ".join(
        f"len(regexp_extract_all(t, '{p}')) AS n_{name}"
        for name, p in P.PII_PATTERNS.items()
    )
    total = " + ".join(f"n_{name}" for name in P.PII_PATTERNS)
    return f"""
    WITH s AS (SELECT doc_id, {_SYNTH_SQL} AS t FROM documents),
    c AS (SELECT doc_id,
           {counts}
    FROM s)
    SELECT *, {total} AS n_pii FROM c
    """


@q("pii_detect", _detect_oracle())
def _pii_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tp(spark, sf_dir, "documents")
    return P.detect_pii(_synth(docs), "text", "doc_id")


def _redact_oracle() -> str:
    expr = "t"
    for name in P.REDACTION_ORDER:
        expr = (
            f"regexp_replace({expr}, '{P.PII_PATTERNS[name]}',"
            f" '<{name.upper()}>', 'g')"
        )
    return f"""
    WITH s AS (SELECT doc_id, {_SYNTH_SQL} AS t FROM documents)
    SELECT doc_id, md5({expr}) AS redacted_md5 FROM s
    """


@q("pii_redact", _redact_oracle())
def _pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tp(spark, sf_dir, "documents")
    red = P.redact_pii(_synth(docs), "text")
    return red.select("doc_id", F.md5("text").alias("redacted_md5"))


_TFIDF_ORACLE = f"""
WITH n AS (SELECT doc_id, {_norm_sql('text')} AS norm FROM documents),
tok AS (SELECT doc_id, unnest(string_split(norm, ' ')) AS term FROM n),
tf AS (SELECT doc_id, term, count(*) AS tf
       FROM tok WHERE term <> '' GROUP BY doc_id, term),
dft AS (SELECT term, count(*) AS df_t FROM tf GROUP BY term),
nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
s AS (SELECT tf.doc_id, tf.term, tf.tf, dft.df_t,
             round(tf.tf * (ln((nd.n_docs + 1.0) / (dft.df_t + 1.0)) + 1.0), 6)
               AS tf_idf
      FROM tf JOIN dft USING (term) CROSS JOIN nd),
r AS (SELECT *, row_number() OVER
        (PARTITION BY doc_id ORDER BY tf_idf DESC, term ASC) AS rank
      FROM s)
SELECT doc_id, term, tf, df_t, tf_idf, rank FROM r WHERE rank <= 5
"""


@q("text_tfidf_top_terms", _TFIDF_ORACLE)
def _text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _tp(spark, sf_dir, "documents")
    return T.tf_idf_top_terms(docs, "text", "doc_id", top_k=5)


# ---------------------------------------------------------------------------
# k-anonymity audit: the privacy companion to PII detection/redaction
# and right-to-be-forgotten — how re-identifiable is a table through
# its quasi-identifier combination? One map-side-combined groupBy;
# the audit row aggregates group sizes, never raw rows.
# ---------------------------------------------------------------------------

_KANON_K = 10

_KANON_ORACLE = f"""
WITH g AS (SELECT c_nationkey, c_mktsegment, count(*) AS n
           FROM customer GROUP BY 1, 2)
SELECT CAST(min(n) AS BIGINT) AS k_anonymity,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(count(*) FILTER (WHERE n < {_KANON_K}) AS BIGINT)
         AS n_small_groups,
       CAST(coalesce(sum(n) FILTER (WHERE n < {_KANON_K}), 0) AS BIGINT)
         AS n_exposed_rows
FROM g
"""


@q("k_anonymity_audit", _KANON_ORACLE)
def _k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity of the customer table under the
    (nation, market-segment) quasi-identifier pair: the dataset's k is
    the SMALLEST group size (any member of a small group is
    re-identifiable by those two attributes alone); rows in groups
    below k=10 are counted as exposed. The release decision this
    feeds: suppress or generalize those groups before export."""
    cust = _tp(spark, sf_dir, "customer")
    g = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("n")
    )
    small = F.col("n") < _KANON_K
    return g.agg(
        F.min("n").cast("long").alias("k_anonymity"),
        F.count("*").cast("long").alias("n_groups"),
        F.count(F.when(small, 1)).cast("long").alias("n_small_groups"),
        F.coalesce(F.sum(F.when(small, F.col("n"))), F.lit(0))
        .cast("long")
        .alias("n_exposed_rows"),
    )


# ---------------------------------------------------------------------------
# l-diversity audit: k-anonymity's complement — a group can be large
# (k-safe) yet reveal everyone's sensitive attribute if all members
# share one value. Requires >= L distinct sensitive values per
# quasi-identifier group.
# ---------------------------------------------------------------------------

_LDIV_L = 3

_LDIV_ORACLE = f"""
WITH g AS (SELECT c_nationkey,
                  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
                  count(DISTINCT c_mktsegment) AS l,
                  count(*) AS n
           FROM customer GROUP BY 1, 2)
SELECT CAST(min(l) AS BIGINT) AS l_diversity,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(count(*) FILTER (WHERE l < {_LDIV_L}) AS BIGINT)
         AS n_weak_groups,
       CAST(coalesce(sum(n) FILTER (WHERE l < {_LDIV_L}), 0) AS BIGINT)
         AS n_exposed_rows
FROM g
"""


@q("l_diversity_audit", _LDIV_ORACLE)
def _l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity of the customer table: quasi-identifier =
    (nation, account-balance bucket), sensitive attribute = market
    segment. The dataset's l is the smallest count of DISTINCT
    sensitive values in any group; groups below l=3 leak their
    members' segment even when k-anonymous (homogeneity attack).
    One map-side-combined groupBy + one distinct expansion — the
    audit row aggregates group summaries, never raw rows."""
    cust = _tp(spark, sf_dir, "customer")
    g = cust.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).alias("bal_bucket"),
    ).agg(
        F.countDistinct("c_mktsegment").alias("l"),
        F.count("*").alias("n"),
    )
    weak = F.col("l") < _LDIV_L
    return g.agg(
        F.min("l").cast("long").alias("l_diversity"),
        F.count("*").cast("long").alias("n_groups"),
        F.count(F.when(weak, 1)).cast("long").alias("n_weak_groups"),
        F.coalesce(F.sum(F.when(weak, F.col("n"))), F.lit(0))
        .cast("long")
        .alias("n_exposed_rows"),
    )
