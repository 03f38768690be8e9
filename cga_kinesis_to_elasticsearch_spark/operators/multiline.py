"""Multiline log reassembly: merge continuation lines (stack traces,
wrapped messages) into their parent event before parsing.

The reference consumes pre-framed LogMessage payloads, so it never
faces this; any engine ingesting raw log FILES does (the Filebeat /
Logstash ``multiline`` codec). Spark-first shape:

1. mark event STARTS with a pattern (``rlike``) — narrow;
2. number events with a running count of starts over the per-stream
   order — ONE window exchange on the stream key (a file/shard id,
   matching T3's per-shard ordering guarantee);
3. group by (stream, event_no) and rebuild the event text with an
   order-sorted fold — the groupBy shares the window's partitioning,
   so AQE reuses the exchange.

Lines before the first start of a stream ("orphan" continuations) get
event_no 0 and are emitted as their own event — dropping data on a
framing glitch is never right for a log pipeline (same philosophy as
the poison-record bucket, T2).

At 100 TB: the only data movement is the per-stream exchange that any
ordered reassembly fundamentally requires; state per task is one
running counter, and event text is rebuilt once, map-side after the
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["reassemble_multiline"]


def reassemble_multiline(
    df: DataFrame,
    line_col: str,
    stream_col: str,
    order_col: str,
    start_pattern: str,
    sep: str = "\n",
) -> DataFrame:
    """(stream, event_no, message, n_lines, first_order): one row per
    reassembled event. ``start_pattern`` is a Java regex matched with
    ``rlike``; a line that matches BEGINS a new event, every other
    line continues the previous one (within ``stream_col``, ordered
    by ``order_col``)."""
    is_start = F.col(line_col).rlike(start_pattern)
    w = (
        Window.partitionBy(stream_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = df.select(
        F.col(stream_col).alias("stream"),
        F.col(order_col).alias("__ord"),
        F.col(line_col).alias("__line"),
        F.sum(is_start.cast("long")).over(w).alias("event_no"),
    )
    packed = F.array_sort(F.collect_list(F.struct("__ord", "__line")))
    return (
        numbered.groupBy("stream", "event_no")
        .agg(
            F.array_join(
                F.transform(packed, lambda s: s["__line"]), sep
            ).alias("message"),
            F.count(F.lit(1)).alias("n_lines"),
            F.min("__ord").alias("first_order"),
        )
    )
