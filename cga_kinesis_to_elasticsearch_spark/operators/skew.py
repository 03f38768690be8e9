"""Skew-aware aggregation: two-phase salted groupBy.

At 100 TB a handful of hot keys (one chatty app, one route class) can
pin a groupBy's shuffle on a single reducer. AQE splits skewed JOIN
partitions but a skewed AGGREGATION key still lands on one task unless
the map side pre-splits it. The classic fix: salt the key into S
sub-keys, aggregate partially per (key, salt), then aggregate the S
partials — two small shuffles instead of one stuck one.

Results are EXACTLY equal to the unsalted groupBy for any
decomposable aggregate (sum/count/min/max); the declared query's
oracle is therefore the plain GROUP BY.

The salt is deterministic (hash of a stable column mod S, not rand())
so replays and retries stay idempotent and the DuckDB oracle can
reproduce intermediate states if ever needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["salted_agg", "salted_join", "key_skew_report"]


def key_skew_report(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """One-row skew diagnostic for a grouping/join key — the numbers
    that decide whether :func:`salted_agg` / AQE skew handling is
    needed: key cardinality, max and mean rows per key, the row share
    of the ``top_n`` hottest keys, and the exact Gini coefficient of
    the per-key count distribution (0 = uniform, →1 = one key owns
    everything).

    Exactness without a global sort: ranking ``m`` keys by count would
    need a full sort of the (key,count) frame, so the Gini rank-sum is
    instead closed over the COUNT-OF-COUNTS histogram — keys sharing a
    count value occupy a contiguous rank run [s+1, s+f], whose rank sum
    is ``f*s + f*(f+1)/2`` in closed form. The histogram has one row
    per distinct multiplicity (tiny at any corpus size), so the only
    data-sized work is the per-key count; the two cumulative windows
    run on the histogram frame. Every SUM is exact int64; the Gini's
    closed form is evaluated in double (its int64 products would wrap
    at ~2e9 keys x 1e10 rows) — exact below 2^53 and within ~1e-16
    relative above it, identical on both engines either way.

    Ties make every statistic order-free: equal counts contribute
    ``v * sum(ranks)`` regardless of how ties are broken, and a top-N
    boundary tie contributes the same total rows whichever keys are
    chosen.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("v"))
    hist = counts.groupBy("v").agg(F.count(F.lit(1)).alias("f"))
    w_asc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    w_desc = Window.orderBy(F.col("v").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    staged = hist.select(
        "v",
        "f",
        F.coalesce(F.sum("f").over(w_asc), F.lit(0)).alias("s"),
        F.coalesce(F.sum("f").over(w_desc), F.lit(0)).alias("kb"),
    )
    take = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("f"), F.lit(top_n) - F.col("kb")),
    )
    agg = staged.agg(
        F.sum("f").alias("n_keys"),
        F.sum(F.col("v") * F.col("f")).alias("n_rows"),
        F.max("v").alias("max_count"),
        F.sum(F.col("v") * (F.col("f") * F.col("s") + F.expr("f * (f + 1) DIV 2"))).alias(
            "sum_ic"
        ),
        F.sum(F.col("v") * take).alias("topn_rows"),
    )
    m, t = F.col("n_keys"), F.col("n_rows")
    # close the Gini in DOUBLE: the int64 products m*t and 2*sum_ic
    # wrap silently at ~2e9 keys x 1e10 rows — exactly the scale this
    # diagnostic exists for. Every sum is exact int64 coming in; the
    # double closure is bit-identical across engines (and exact until
    # the products pass 2^53, where the Gini's 9-decimal rounding
    # absorbs the relative error of ~1e-16)
    md, td = m.cast("double"), t.cast("double")
    sic = F.col("sum_ic").cast("double")
    return agg.select(
        "n_keys",
        "n_rows",
        "max_count",
        F.round(t / m, 9).alias("avg_per_key"),
        F.round(F.col("topn_rows") / t, 9).alias("topn_share"),
        F.round((2 * sic - (md + 1) * td) / (md * td), 9).alias("gini"),
    )


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_col: str | Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over ``key_cols``.

    ``aggs``: output_name -> (function, input_col) with function in
    {sum, count, min, max} (the decomposable set; avg = sum/count at
    the call site).
    ``salt_col``: any stable, roughly-uniform column (an id, a
    sequence number) — hashed mod ``n_salts`` for the phase-1 split.
    """
    salt = (
        F.abs(F.hash(F.col(salt_col) if isinstance(salt_col, str) else salt_col))
        % n_salts
    )

    phase1_exprs = []
    phase2_exprs = []
    for out, (fn, col) in aggs.items():
        if fn == "sum":
            phase1_exprs.append(F.sum(col).alias(f"__p_{out}"))
            phase2_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "count":
            phase1_exprs.append(F.count(col).alias(f"__p_{out}"))
            phase2_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "min":
            phase1_exprs.append(F.min(col).alias(f"__p_{out}"))
            phase2_exprs.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            phase1_exprs.append(F.max(col).alias(f"__p_{out}"))
            phase2_exprs.append(F.max(f"__p_{out}").alias(out))
        else:
            raise ValueError(
                f"non-decomposable aggregate {fn!r}; salted_agg supports "
                "sum/count/min/max"
            )

    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*key_cols, "__salt")
        .agg(*phase1_exprs)
    )
    return partial.groupBy(*key_cols).agg(*phase2_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_col: str | Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi join: the big side's hot keys are split
    across ``n_salts`` sub-partitions (deterministic hash of
    ``salt_col`` — a stable big-side column such as an event id), the
    small side is replicated once per salt via a narrow
    ``explode(sequence(...))``, and the join runs on
    ``on + [salt]``. The result set is EXACTLY the plain join's (each
    big row matches the one replica carrying its salt), so the
    declared query's oracle is the unsalted join.

    When to use over AQE's skew-join splitting: AQE only rebalances
    sort-merge joins it can re-plan at runtime — a pre-committed
    layout (bucketed tables, stateful streaming joins, or a broadcast
    that OOMs) still needs the salt baked into the keys. Cost: the
    small side shuffles n_salts copies — keep n_salts ~ the skew
    factor, not the cluster size.

    ``how`` supports inner/left joins (semantics preserved per big
    row); right/full would need salt-aware null handling on the
    replicated side and are rejected."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    # pmod, NOT abs(hash) % n: abs(Integer.MIN_VALUE) stays negative, and
    # a negative salt matches no replica — a silently dropped row. (The
    # agg variant tolerates any consistent salt value; a join does not.)
    salt = F.pmod(
        F.hash(F.col(salt_col) if isinstance(salt_col, str) else salt_col),
        F.lit(n_salts),
    )
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, [*on, "__salt"], how).drop("__salt")
