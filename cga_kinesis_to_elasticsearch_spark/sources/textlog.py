"""Text-log source: line stream -> grok-typed columns (SURVEY §2.3 G8,
grok ParseStream grok.go:371-392 — the reference reads an io.Reader
line-by-line with a per-line callback; here the same contract is
``spark.readStream.text`` + the single-pass grok compiler, so a
directory of raw log files becomes a typed streaming DataFrame).

Batch and streaming share one code path: ``parse_log_lines`` is a pure
DataFrame function; ``read_log_stream`` just points it at a streaming
text source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..grok import Grok
from ..grok.spark import grok_parse_into

__all__ = ["parse_log_lines", "read_log_stream", "read_log_batch"]


def parse_log_lines(
    lines: DataFrame, grok: Grok, pattern: str, line_col: str = "value"
) -> DataFrame:
    """(value STRING) -> value + ``parsed`` struct of typed captures
    (NULL on non-match — the callback-with-empty-map case)."""
    return grok_parse_into(grok, lines, line_col, pattern, "parsed")


def read_log_stream(
    spark: SparkSession, path: str, grok: Grok, pattern: str
) -> DataFrame:
    """Tail a directory of log files as a stream, grok-parsed. One
    input partition per file per micro-batch; the parse is the same
    single-regex-pass plan as the batch path."""
    return parse_log_lines(spark.readStream.text(path), grok, pattern)


def read_log_batch(
    spark: SparkSession, path: str, grok: Grok, pattern: str
) -> DataFrame:
    return parse_log_lines(spark.read.text(path), grok, pattern)
