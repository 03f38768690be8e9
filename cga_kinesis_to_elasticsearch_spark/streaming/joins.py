"""Stream-stream time-bounded joins (north-star SQL surface; absent
from the reference — SURVEY §2.11 lists joins beyond the dimension
lookup as explicitly absent, so this is a Spark-native extension).

The canonical Structured Streaming pattern: both sides carry event-time
watermarks, and the join condition pairs key equality with a time-range
bound. The range bound is what makes the state store finite — each
side's buffered rows can be evicted once the watermark passes the
window in which the other side could still match them. Without the
time bound, stream-stream join state grows without limit; this module
refuses to build such a join.

At 100 TB the state store is the scale constraint, not the shuffle:
state is keyed by join key and bounded by (arrival rate x window x
delay); the shuffle on the join key is the same exchange a batch join
would do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["time_bounded_join"]


def time_bounded_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    lower: str,
    upper: str,
    watermark_delay: str = "10 minutes",
    how: str = "inner",
    stamp_left: bool = True,
    stamp_right: bool = True,
) -> DataFrame:
    """Join two (streaming or batch) DataFrames on key equality plus a
    time-range bound: ``left_time - lower <= right_time <= left_time +
    upper`` (intervals as SQL strings, e.g. ``"30 minutes"``).

    Column names other than ``on`` must be disjoint between the two
    sides. ``watermark_delay`` bounds state: rows older than
    (max event time - delay) are evicted, so a delay shorter than the
    real out-of-orderness can drop matches — the streaming-vs-batch
    equivalence tests pin this semantics. In batch mode the watermark
    is a no-op and the result equals the plain inequality join.

    ``stamp_left`` / ``stamp_right``: pass ``False`` for a side that
    ALREADY carries a watermark (the output of a previous
    time_bounded_join in a cascaded multi-way chain) — Spark disallows
    re-stamping a watermark downstream of a stateful operator, and the
    hop inherits the earlier delay through the join.
    """
    if not on:
        raise ValueError("stream-stream join requires at least one equality key")
    overlap = (set(left.columns) & set(right.columns)) - set(on)
    if overlap:
        raise ValueError(f"ambiguous non-key columns on both sides: {sorted(overlap)}")

    if left.isStreaming and stamp_left:
        left = left.withWatermark(left_time, watermark_delay)
    if right.isStreaming and stamp_right:
        right = right.withWatermark(right_time, watermark_delay)

    # alias-qualify both sides: the inputs may share plan lineage (two
    # filters of one scan), where bare df[col] references are ambiguous
    l, r = left.alias("__tbj_l"), right.alias("__tbj_r")
    lt, rt = F.col(f"__tbj_l.{left_time}"), F.col(f"__tbj_r.{right_time}")
    cond = (
        (rt >= lt - F.expr(f"INTERVAL {lower}"))
        & (rt <= lt + F.expr(f"INTERVAL {upper}"))
    )
    for k in on:
        cond = (F.col(f"__tbj_l.{k}") == F.col(f"__tbj_r.{k}")) & cond
    joined = l.join(r, cond, how)
    # key equality => the duplicated key columns are identical (or one
    # side NULL under outer joins); collapse to a single column per key
    key_cols = [
        F.coalesce(F.col(f"__tbj_l.{k}"), F.col(f"__tbj_r.{k}")).alias(k)
        for k in on
    ]
    rest = [F.col(f"__tbj_l.{c}") for c in left.columns if c not in on] + [
        F.col(f"__tbj_r.{c}") for c in right.columns if c not in on
    ]
    return joined.select(*key_cols, *rest)
