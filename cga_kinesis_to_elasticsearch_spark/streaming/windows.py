"""Event-time windowed aggregation with watermarked late-data handling
(north star — the reference is arrival-time-only, SURVEY T4; this is
the event-time upgrade Structured Streaming gives for free).

``windowed_counts`` is a pure DataFrame function: on a streaming input
it produces tumbling-window counts that wait ``late_threshold`` for
stragglers before a window finalizes (append mode emits each window
exactly once, on watermark passage); on a batch input the same code
degenerates to a plain date_trunc aggregation — which is exactly the
``tumbling_hour_stats`` declared query's oracle shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["windowed_counts", "late_drop_stats"]


def windowed_counts(
    events: DataFrame,
    ts_col: str = "arrival_ts",
    key_col: str | None = None,
    window_duration: str = "1 hour",
    late_threshold: str = "10 minutes",
    slide_duration: str | None = None,
) -> DataFrame:
    """Tumbling (default) or sliding (``slide_duration`` < window)
    event-time counts with a watermark.

    Output: (window_start, window_end[, key], n). Late rows within
    ``late_threshold`` still count toward their true window; older ones
    are dropped — a bounded-state guarantee no arrival-time design can
    give. State size: O(open windows x keys) — sliding multiplies open
    windows by window/slide, still independent of input volume.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, late_threshold)
    keys = [
        F.window(
            F.col(ts_col), window_duration, slide_duration or window_duration
        ).alias("w")
    ]
    if key_col:
        keys.append(F.col(key_col))
    out = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    cols = [
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
    ]
    if key_col:
        cols.append(F.col(key_col))
    return out.select(*cols, "n")


def late_drop_stats(query) -> dict:
    """Watermark observability for a running/finished StreamingQuery:
    totals of rows dropped for arriving later than the watermark and
    current state size, summed over the query's recorded progress.

    The reference has no event-time story at all (arrival-time only,
    SURVEY T4) — this surfaces the one operational number an
    event-time pipeline must alert on: how much data is too late to
    count. Reads the engine-maintained progress metrics; no extra
    instrumentation on the hot path."""
    dropped = 0
    state_rows = 0
    n_progress = 0
    for p in query.recentProgress:
        n_progress += 1
        for op in p.get("stateOperators", []) or []:
            dropped += int(op.get("numRowsDroppedByWatermark", 0) or 0)
            state_rows = max(state_rows, int(op.get("numRowsTotal", 0) or 0))
    return {
        "rows_dropped_late": dropped,
        "max_state_rows": state_rows,
        "progress_reports": n_progress,
    }
