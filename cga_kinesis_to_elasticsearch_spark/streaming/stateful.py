"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (north star — the reference has no stateful
ops, SURVEY §2.6/§2.11; this is the template for any custom state the
engine needs beyond built-in windowed aggs).

Semantics: events grouped by key; a session closes when no event
arrives within ``gap`` (processing-time timeout). On timeout the
operator emits one row per closed session: (key, session_start,
session_end, n_events). The same gap logic in batch is the
``sessionize_events`` declared query (lag-over-window), giving an
oracle for the state transition function itself.

Scale: state is per-key and O(1) (bounds, count) — no event buffering;
the shuffle is the groupBy key exchange that any stateful op pays.
GroupStateTimeout.ProcessingTimeTimeout closes idle sessions without a
watermark (arrival-time semantics, matching the reference's T4 model).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["SESSION_SCHEMA", "STATE_SCHEMA", "sessionize_stream", "session_update"]

SESSION_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("session_start", LongType()),  # epoch millis
        StructField("session_end", LongType()),
        StructField("n_events", IntegerType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start", LongType()),
        StructField("end", LongType()),
        StructField("n", IntegerType()),
    ]
)


def session_update(gap_ms: int):
    """Build the state-update function (closure keeps it cloudpickle-
    shippable without the package on executor PYTHONPATH)."""

    def update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "session_start": [start],
                    "session_end": [end],
                    "n_events": [n],
                }
            )
            return
        lo, hi, n = None, None, 0
        for pdf in pdfs:
            ts = pdf["ts_ms"]
            if len(ts) == 0:
                continue
            lo = int(ts.min()) if lo is None else min(lo, int(ts.min()))
            hi = int(ts.max()) if hi is None else max(hi, int(ts.max()))
            n += int(len(ts))
        if n:
            if state.exists:
                start, end, seen = state.get
                # gap exceeded between stored session and this batch's
                # earliest event -> close the old session, start fresh
                if lo is not None and lo - end > gap_ms:
                    yield pd.DataFrame(
                        {
                            "key": [key[0]],
                            "session_start": [start],
                            "session_end": [end],
                            "n_events": [seen],
                        }
                    )
                    state.update((lo, hi, n))
                else:
                    state.update((min(start, lo), max(end, hi), seen + n))
            else:
                state.update((lo, hi, n))
        state.setTimeoutDuration(gap_ms)
        return

    return update


def sessionize_stream(
    events: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts_ms",
    gap_ms: int = 1_800_000,
) -> DataFrame:
    """events (streaming, key + epoch-millis ts) -> closed sessions.

    Works on a streaming DataFrame in append output mode; the groupBy
    is the single key-exchange any stateful operator pays.
    """
    prepared = events.selectExpr(
        f"{key_col} AS key", f"CAST({ts_col} AS LONG) AS ts_ms"
    )
    return prepared.groupBy("key").applyInPandasWithState(
        session_update(gap_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
