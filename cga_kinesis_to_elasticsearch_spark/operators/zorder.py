"""Z-order (Morton) clustering key: interleave the bits of two integer
dimensions so that sorting by the single key keeps rows close in BOTH
dimensions — multi-column row-group skipping for the compaction job's
``cluster_by`` (e.g. (app bucket, time bucket): a reader filtering on
either dimension skips most files, where a lexicographic sort only
serves its leading column).

Pure shift/mask arithmetic unrolled at plan time: ``2 * bits`` OR
terms, all inside whole-stage codegen — no UDF, no shuffle beyond the
sort the caller was already paying for the rewrite. Callers quantize
their dimensions to ``bits``-wide non-negative ints first
(``quantize`` helps: min-max scale to the bit budget).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["zorder_key", "quantize"]


def quantize(col: Column, lo: Column | float, hi: Column | float, bits: int = 16) -> Column:
    """Min-max scale a numeric column onto [0, 2^bits - 1] as a long —
    the per-dimension preparation for zorder_key. lo/hi may be literals
    or (broadcastable) per-partition bounds."""
    span = F.lit(hi) - F.lit(lo) if not isinstance(hi, Column) else hi - lo
    lo_c = F.lit(lo) if not isinstance(lo, Column) else lo
    frac = (col.cast("double") - lo_c) / F.when(span == 0, 1).otherwise(span)
    clamped = F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0))
    return F.floor(clamped * ((1 << bits) - 1)).cast("long")


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative long
    columns: bit i of ``a`` lands at position 2i+1, bit i of ``b`` at
    2i. Result is a long (bits <= 31)."""
    if bits > 31:
        raise ValueError("zorder_key supports at most 31 bits per dimension")
    one = F.lit(1).cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftright(a.cast("long"), i).bitwiseAND(one)
        bit_b = F.shiftright(b.cast("long"), i).bitwiseAND(one)
        key = key.bitwiseOR(F.shiftleft(bit_a, 2 * i + 1)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i)
        )
    return key
