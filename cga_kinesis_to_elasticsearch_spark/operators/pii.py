"""PII detection and redaction (north-star training-data pipeline
stage; no reference counterpart — scrubbing is table stakes for
LLM corpus preparation).

Pure built-in regex expressions (JVM-side, codegen): detection is one
``regexp_extract_all``-count per type, redaction one ``regexp_replace``
chain — no Python on the data path, so the operators scan-scale like
any narrow projection at 100 TB.

Pattern dialect: every pattern is probed for identical behavior in
Java regex (Spark executors), RE2 (DuckDB oracle) and Python ``re``
(tests) — ASCII classes only, no lookarounds, ``\\b`` boundaries (all
three dialects agree on these constructs; see tests/test_pii.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["PII_PATTERNS", "REDACTION_ORDER", "detect_pii", "redact_pii", "redacted_col"]

# type -> regex. Deliberately high-recall shapes (e.g. the IPv4 pattern
# accepts out-of-range octets): corpus scrubbing prefers over-redaction
# over leakage.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "card": r"\b\d{4}-\d{4}-\d{4}-\d{4}\b",
    "phone": r"\+\d{1,2}-\d{3}-\d{3}-\d{4}",
}

# Longest/most-specific first so e.g. a card number is consumed before
# the SSN shape could match inside its tail.
REDACTION_ORDER = ("email", "card", "ssn", "phone", "ipv4")


def detect_pii(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per document with an ``n_<type>`` match count per PII
    type plus ``n_pii`` total — the filter-or-scrub routing signal."""
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(p), F.lit(0))).alias(
            f"n_{name}"
        )
        for name, p in PII_PATTERNS.items()
    ]
    out = df.select(id_col, *counts)
    total = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total)


def redacted_col(text: Column) -> Column:
    """The redaction expression: each PII type replaced by its
    ``<TYPE>`` token, applied in REDACTION_ORDER."""
    out = text
    for name in REDACTION_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[name], f"<{name.upper()}>")
    return out


def redact_pii(df: DataFrame, text_col: str) -> DataFrame:
    """Replace ``text_col`` with its redacted form."""
    return df.withColumn(text_col, redacted_col(F.col(text_col)))
