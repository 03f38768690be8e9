"""Per-key quota enforcement (custom stateful streaming operator).

Semantics: events grouped by key; each key may emit at most ``limit``
rows per quota window. State is one (window_start_ms, count) pair per
key — O(1), no event buffering. When a key passes the limit, overflow
rows still flow through but carry ``quota_exceeded = true`` so the
sink can route them (drop, sample, or divert to a spill index) —
flagging, not dropping, keeps the operator composable and the
at-least-once accounting visible (same philosophy as the T2 poison
bucket: nothing silently disappears).

Windows are processing-time (arrival-driven, matching the reference's
T4 arrival-time model): the window rolls when the first event of a key
arrives >= window_ms after the stored window start.

Implemented on ``applyInPandasWithState``. The Spark 4
``transformWithStateInPandas`` successor is the drop-in upgrade on a
cluster whose Python env carries google-protobuf (its state-server
protocol needs it; this container's protobuf package is broken, so the
engine standardizes on the universally-available API).

Scale: the shuffle is the per-key exchange any stateful op pays; state
is 16 bytes/key. At 100 TB ingest the key cardinality (apps), not the
event rate, bounds the state store.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["quota_flag_stream", "quota_update", "QUOTA_OUTPUT_SCHEMA"]

QUOTA_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("ts_ms", LongType()),
        StructField("seq", LongType()),
        StructField("quota_exceeded", BooleanType()),
    ]
)

QUOTA_STATE_SCHEMA = StructType(
    [StructField("win_start", LongType()), StructField("count", LongType())]
)


def quota_update(
    limit: int, window_ms: int
) -> Any:
    """Build the per-group update function. Factored out so the state
    transition is unit-testable without a streaming query."""

    def _update(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            win_start, count = state.get
        else:
            win_start, count = None, 0
        for pdf in pdfs:
            pdf = pdf.sort_values("ts_ms", kind="stable")
            flags = []
            for ts in pdf["ts_ms"]:
                ts = int(ts)
                if win_start is None or ts - win_start >= window_ms:
                    win_start, count = ts, 0
                count += 1
                flags.append(count > limit)
            yield pdf.assign(quota_exceeded=flags)[
                ["key", "ts_ms", "seq", "quota_exceeded"]
            ]
        state.update((win_start if win_start is not None else 0, count))

    return _update


def quota_flag_stream(df: DataFrame, limit: int, window_ms: int) -> DataFrame:
    """Input columns: ``key string, ts_ms long, seq long`` (seq is any
    per-row id carried through). Output adds ``quota_exceeded``."""
    return df.groupBy("key").applyInPandasWithState(
        quota_update(limit, window_ms),
        outputStructType=QUOTA_OUTPUT_SCHEMA,
        stateStructType=QUOTA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
