"""Mergeable sketch rollups (DataSketches: HLL, KLL, theta).

``sinks/rollup.py`` deliberately recomputes touched days from raw facts
because classic aggregates (COUNT DISTINCT, percentiles) are not
additive — you cannot merge yesterday's distinct count with today's.
Sketches remove that limitation: an HLL/KLL/theta sketch IS the
mergeable partial. Store one small binary sketch per (day, dimension)
— kilobytes, independent of fact cardinality — and answer any date
range by unioning the stored sketches, never rescanning facts. At
100 TB this turns "distinct users last quarter" from a full-table
shuffle into a scan of a few hundred KB of sketch rows.

Theta sketches additionally support intersection/difference, so
cross-day overlap questions (returning users, churn) come from stored
per-day state as well.

The reference has only two monotonic counters (main.go:41-47); this is
a north-star extension. Estimates are DataSketches-deterministic (same
input + same lgk → same bytes), but not reproducible in DuckDB's
different HLL implementation — declared queries for these are
rows-only; value correctness is pinned in tests against exact counts
(error-bound + merge-associativity properties).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

__all__ = [
    "hll_day_sketches",
    "hll_range_distinct",
    "kll_day_sketches",
    "kll_range_quantiles",
    "theta_day_sketches",
    "theta_overlap",
    "cm_sketch",
    "cm_estimate",
]


def hll_day_sketches(
    df: "DataFrame", day_col: str, key_col: str, lgk: int = 14
) -> "DataFrame":
    """One HLL sketch (+ its estimate) per day: the stored rollup row.

    Map-side partial sketches merge in the exchange, so the shuffle
    moves sketches (≤ ~2^lgk bytes each), not keys.
    """
    day = F.to_date(F.col(day_col)).cast("string").alias("day")
    return (
        df.groupBy(day)
        .agg(F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("sketch"))
        .select(
            "day",
            "sketch",
            F.hll_sketch_estimate("sketch").cast("long").alias("distinct_est"),
        )
    )


def hll_range_distinct(
    sketches: "DataFrame", day_from: str, day_to: str
) -> "DataFrame":
    """Distinct-over-range from stored sketches only — no fact scan.

    Input is `hll_day_sketches` output (or its parquet). The union agg
    reads |days| sketch rows; cost is independent of fact cardinality.
    """
    return (
        sketches.where(F.col("day").between(day_from, day_to))
        .agg(F.hll_union_agg("sketch").alias("u"))
        .select(
            F.lit(day_from).alias("day_from"),
            F.lit(day_to).alias("day_to"),
            F.hll_sketch_estimate("u").cast("long").alias("distinct_est"),
        )
    )


def kll_day_sketches(
    df: "DataFrame", day_col: str, value_col: str, k: int = 2048
) -> "DataFrame":
    """One KLL(double) quantile sketch per day — the mergeable partial
    for percentile rollups (latency/size distributions)."""
    day = F.to_date(F.col(day_col)).cast("string").alias("day")
    return df.groupBy(day).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias(
            "sketch"
        ),
        F.count(value_col).alias("n"),
    )


def kll_range_quantiles(
    sketches: "DataFrame",
    day_from: str,
    day_to: str,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
) -> "DataFrame":
    """Quantiles over an arbitrary day range by merging stored KLL
    sketches — the percentile analogue of `hll_range_distinct`."""
    # kll_sketch_merge_double is a binary scalar (no agg form): collect
    # the |days| sketch blobs into one row and fold. |days| is tiny by
    # construction — this is the stored-rollup read path, not a fact scan.
    merged = (
        sketches.where(F.col("day").between(day_from, day_to))
        .agg(
            F.collect_list("sketch").alias("sks"),
            F.sum("n").alias("n"),
        )
        .select(
            F.expr(
                "aggregate(slice(sks, 2, size(sks) - 1), sks[0], "
                "(acc, x) -> kll_sketch_merge_double(acc, x))"
            ).alias("m"),
            "n",
        )
    )
    cols = [
        F.kll_sketch_get_quantile_double("m", F.lit(q)).alias(
            f"p{int(q * 100):02d}"
        )
        for q in quantiles
    ]
    return merged.select(
        F.lit(day_from).alias("day_from"),
        F.lit(day_to).alias("day_to"),
        F.col("n"),
        *cols,
    )


def theta_day_sketches(
    df: "DataFrame", day_col: str, key_col: str, lgk: int = 14
) -> "DataFrame":
    """One theta sketch per day; unlike HLL these also intersect and
    difference, enabling overlap analytics from stored state."""
    day = F.to_date(F.col(day_col)).cast("string").alias("day")
    return df.groupBy(day).agg(
        F.theta_sketch_agg(F.col(key_col), F.lit(lgk)).alias("sketch")
    )


def theta_overlap(sketches: "DataFrame", day_a: str, day_b: str) -> "DataFrame":
    """Returning/new/churned key counts between two days, computed
    entirely from the two stored sketches: |A∩B|, |A\\B|, |B\\A|."""
    a = sketches.where(F.col("day") == day_a).select(
        F.col("sketch").alias("sa")
    )
    b = sketches.where(F.col("day") == day_b).select(
        F.col("sketch").alias("sb")
    )
    both = a.crossJoin(b)  # two single-row frames
    return both.select(
        F.lit(day_a).alias("day_a"),
        F.lit(day_b).alias("day_b"),
        F.theta_sketch_estimate(F.theta_intersection("sa", "sb"))
        .cast("long")
        .alias("returning"),
        F.theta_sketch_estimate(F.theta_difference("sa", "sb"))
        .cast("long")
        .alias("churned"),
        F.theta_sketch_estimate(F.theta_difference("sb", "sa"))
        .cast("long")
        .alias("new"),
    )


# ---------------------------------------------------------------------------
# Count-min: mergeable FREQUENCY sketch (the family HLL/KLL/theta lack)
# ---------------------------------------------------------------------------


def _cm_bucket(row_col, key_col, hex_chars: int):
    """Bucket of a key in one sketch row: the first ``hex_chars`` hex
    chars of md5('r<row>:'+key). Width is 16^hex_chars; keeping the
    bucket as the hex PREFIX STRING (not an int) makes the function
    identical in any engine with md5 — no base conversion needed."""
    return F.substring(
        F.md5(F.concat(F.lit("r"), row_col, F.lit(":"), key_col)),
        1,
        hex_chars,
    )


def cm_sketch(
    df: "DataFrame",
    key_col: str,
    depth: int = 4,
    width_hex_chars: int = 2,
) -> "DataFrame":
    """Count-min sketch of a key column as a (row, bucket, cnt) table —
    depth x 16^width_hex_chars counters; bucket r of key k is the hex
    prefix of md5('r<r>:'+k). Estimates (cm_estimate) are biased HIGH
    only, with the classic eps = e/width guarantee; counters are
    ADDITIVE, so sketches of two data slices merge by summing matching
    cells — per-day frequency state for "how often did key X occur in
    any range" without fact rescans, at depth*width integers per slice
    regardless of key cardinality.

    Shape chosen for scale: the explode is a narrow depth-way fan-out
    of (row, bucket) PAIRS (not keys or payloads), and the groupBy is
    map-side combined onto at most depth*width cells — the shuffle
    carries bounded-cardinality partial counts, like any rollup. md5
    keeps bucket assignment reproducible in the DuckDB oracle.

    Day-state maintenance: because counters are additive, a REPLAYED
    batch would double-count — so per-day cm tables are maintained
    recompute-from-facts style via ``sinks.rollup.refresh_rollup`` with
    this function as the aggregate (idempotent), NOT by incremental
    merge like the HLL sketchmaint path (whose set semantics tolerate
    replay). Pinned in test_sketches.py."""
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row")
    keyed = df.select(F.col(key_col).cast("string").alias("__k"), rows)
    bucket = _cm_bucket(F.col("row"), F.col("__k"), width_hex_chars)
    return (
        keyed.select("row", bucket.alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_estimate(
    sketch: "DataFrame",
    keys: "DataFrame",
    key_col: str,
    depth: int = 4,
    width_hex_chars: int = 2,
) -> "DataFrame":
    """Estimated occurrence count for each probe key: min over the
    sketch's depth rows of the key's bucket counter (missing cell ->
    0). The sketch side is depth*width rows — always broadcastable —
    so probing any number of keys is one broadcast join + a tiny
    min-agg; the fact table is never touched."""
    from pyspark.sql.functions import broadcast

    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("row")
    probes = keys.select(F.col(key_col).cast("string").alias("key"), rows)
    bucket = _cm_bucket(F.col("row"), F.col("key"), width_hex_chars)
    probed = probes.select("key", "row", bucket.alias("bucket"))
    return (
        probed.join(broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count"))
    )
