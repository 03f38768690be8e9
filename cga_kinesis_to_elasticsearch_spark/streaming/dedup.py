"""Streaming deduplication (north star: the streaming face of the
dedup family in operators/dedup.py).

``stream_dedup`` drops repeated keys with BOUNDED state:
``dropDuplicatesWithinWatermark`` keeps a key in state only until the
watermark passes its event time + delay, so state is O(keys per
watermark horizon) instead of O(all keys ever) — the only formulation
that survives an unbounded stream. On a batch DataFrame the same
function degenerates to ``dropDuplicates`` (used by the batch oracle
path: dedup_exact's groupBy-hash shape keeps the richer per-group
counts).

The dedup key defaults to a content hash (md5 of the normalized text),
i.e. streaming exact-dedup; any key column works (e.g. ``doc_id`` for
at-least-once replay suppression — see streaming/replay.py for the
read-side variant).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..operators.dedup import normalized_text

__all__ = ["stream_dedup"]


def stream_dedup(
    df: DataFrame,
    ts_col: str,
    key: Column | str | None = None,
    text_col: str = "text",
    delay: str = "10 minutes",
    key_col_name: str = "__dedup_key",
) -> DataFrame:
    """Keep the first arrival per key; drop repeats seen within the
    watermark horizon.

    ``key``: dedup key column (defaults to md5(normalized(text_col))).
    ``delay``: how long a duplicate may lag its original and still be
    suppressed; also bounds the state kept per key.
    """
    if key is None:
        key = F.md5(normalized_text(F.col(text_col)))
    elif isinstance(key, str):
        key = F.col(key)
    out = df.withColumn(key_col_name, key)
    if out.isStreaming:
        return out.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
            [key_col_name]
        )
    return out.dropDuplicates([key_col_name])
