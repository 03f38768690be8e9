"""Deterministic sampling / data-mixing operators for training-data
pipelines (north star, BASELINE.json).

A training-data pipeline rarely wants Bernoulli RNG sampling: runs must
be reproducible, resumable, and auditable, and the same document must
make the same keep/drop decision on every executor, every retry, every
re-run. The standard trick is HASH sampling — a document is kept iff a
salted hash of its stable id falls below a per-stratum threshold. That
is a pure map-side predicate: no shuffle, no state, no RNG, and the
decision for any given document can be replayed anywhere (including in
the DuckDB oracle, which reproduces the md5 arithmetic bit-for-bit).

Scale posture (100 TB): the predicate is one md5 + one string compare
per row, fully inside whole-stage codegen; sampling never moves data.
Changing mixture weights between runs only flips rows whose hash lies
between the old and new thresholds (nested samples — a 10% sample is a
strict subset of a 20% sample), which is exactly the property data-mixing
ablations need.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "hex_threshold",
    "sample_key",
    "stratified_hash_sample",
    "weighted_hash_sample",
    "negative_samples",
    "temperature_mix",
    "mixture_plan",
    "apply_mixture",
    "per_key_cap",
    "group_split",
]

#: hex digits of the md5 prefix used as the uniform variate; 8 digits
#: give 16^-8 ~ 2.3e-10 fraction granularity.
_DIGITS = 8


def hex_threshold(fraction: float, digits: int = _DIGITS) -> str:
    """The lexicographic threshold encoding ``fraction``: an md5 prefix
    (lowercase hex, uniform over [0, 16^digits)) is below this string
    with probability ``fraction`` (up to 16^-digits granularity)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction out of range: {fraction}")
    if fraction >= 1.0:
        return "g" * digits  # 'g' > 'f': keeps every hex prefix
    return format(int(fraction * (16**digits)), f"0{digits}x")


def sample_key(id_col: Column, seed: str) -> Column:
    """The uniform variate for a row: the first 8 hex chars of
    md5('{seed}:{id}'). Salting with the seed decorrelates independent
    samples drawn from the same corpus."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string"))), 1, _DIGITS
    )


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 1.0,
    seed: str = "mix0",
) -> DataFrame:
    """Keep each row iff its deterministic hash variate falls under its
    stratum's fraction — per-stratum downsampling for dataset mixing
    (e.g. keep 30% of 'en', 100% of everything else).

    The threshold is resolved per row with a when-chain over the (small,
    static) mixture spec, so the whole operator is a narrow filter; no
    join, no shuffle, no RNG.
    """
    thr: Column = F.lit(hex_threshold(default_fraction))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(stratum_col) == stratum, F.lit(hex_threshold(frac))
        ).otherwise(thr)
    return df.filter(sample_key(F.col(id_col), seed) < thr)


def _hex_threshold_col(frac: Column, digits: int = _DIGITS) -> Column:
    """hex_threshold as a column expression: the lexicographic md5-prefix
    threshold for a per-row fraction computed inside the plan. frac is
    rounded to 9 decimals first so a sub-ulp difference between engines
    (e.g. pow implementations) cannot flip the floor."""
    # clamp below at 0: a negative fraction (e.g. a negative weight
    # upstream) would make F.hex(negative long) a 16-char string whose
    # lpad(...,8) TRUNCATES to 'ffffffff' — keep-probability ~1 instead
    # of 0
    frac = F.greatest(F.lit(0.0), F.round(frac, 9))
    scaled = F.floor(frac * F.lit(float(16**digits))).cast("long")
    return F.when(frac >= 1.0, F.lit("g" * digits)).otherwise(
        F.lpad(F.lower(F.hex(scaled)), digits, "0")
    )


def weighted_hash_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    base_fraction: float,
    weight_cap: float,
    seed: str = "wmix0",
) -> DataFrame:
    """Weight-proportional deterministic sampling: each row is kept
    with probability ``base_fraction * min(weight, cap) / cap`` — e.g.
    quality- or length-weighted selection where better/longer documents
    are proportionally more likely to survive, a standard data-mixing
    move when a quality score is available.

    Same machinery as stratified_hash_sample, but the threshold is a
    per-ROW column expression instead of a per-stratum literal: still a
    pure narrow predicate (one md5 + one compare inside codegen), no
    RNG, no shuffle, replayable row-for-row in the SQL oracle. The
    keep decision is monotone in weight: raising a row's weight can
    only flip it from dropped to kept, never the reverse — useful for
    auditing reweighting ablations.

    Adds ``keep_p`` (the row's keep probability, rounded to the same 9
    decimals the threshold is derived from) to the kept rows.
    """
    if weight_cap <= 0:
        raise ValueError(f"weight_cap must be positive: {weight_cap}")
    p = F.lit(float(base_fraction)) * (
        F.least(F.col(weight_col).cast("double"), F.lit(float(weight_cap)))
        / F.lit(float(weight_cap))
    )
    return df.filter(
        sample_key(F.col(id_col), seed) < _hex_threshold_col(p)
    ).withColumn("keep_p", F.round(p, 9))


def temperature_mix(
    df: DataFrame,
    id_col: str,
    source_col: str,
    target_rows: int,
    alpha: float = 0.5,
    seed: str = "temp0",
) -> DataFrame:
    """Temperature-based source mixing (multilingual/multi-source
    rebalancing a la mT5/XLM-R): sampling weight per source is
    proportional to (source share)^alpha, so alpha < 1 upsamples rare
    sources relative to their natural proportion; alpha = 1 is
    proportional sampling. Each source's quota of ``target_rows`` is
    then drawn with the same deterministic hash predicate as
    stratified_hash_sample (reproducible, nested, auditable). Returns
    the kept rows as `(id, source, mix_fraction)`.

    Fully declarative — the per-source fraction is computed IN the plan
    (two tiny aggregations over source counts, rejoined by broadcast),
    not collected to the driver, so the same code runs over a 100 TB
    corpus with a million sources. The only full-data operations are
    the map-side-partial count and the final narrow filter; alpha = 0.5
    uses sqrt (correctly rounded in IEEE, unlike pow) wherever possible
    so the DuckDB oracle reproduces fractions bit-for-bit.
    """
    from pyspark.sql import Window

    counts = df.groupBy(source_col).agg(F.count("*").alias("__n"))
    if alpha == 0.5:
        weight = F.sqrt(F.col("__n").cast("double"))
    elif alpha == 1.0:
        weight = F.col("__n").cast("double")
    else:
        weight = F.pow(F.col("__n").cast("double"), F.lit(alpha))
    weighted = counts.select(source_col, "__n", weight.alias("__w"))
    # the weight-sum denominator is an unpartitioned window over the
    # TINY per-source table (one row per source), not a separate
    # aggregate + re-join: a second lineage would re-evaluate the
    # corpus count scan, and the single-partition window exchange
    # moves only (source, n, w) rows
    wsum = F.sum("__w").over(Window.partitionBy())
    frac = F.least(
        F.lit(1.0), F.lit(float(target_rows)) * F.col("__w") / wsum / F.col("__n")
    )
    fracs = weighted.select(
        source_col,
        F.round(frac, 9).alias("mix_fraction"),
        _hex_threshold_col(frac).alias("__thr"),
    )
    return (
        df.join(F.broadcast(fracs), source_col)
        .filter(sample_key(F.col(id_col), seed) < F.col("__thr"))
        .select(F.col(id_col), F.col(source_col), F.col("mix_fraction"))
    )


def mixture_plan(
    df: DataFrame,
    text_col: str,
    source_col: str,
    weights: dict[str, float],
    token_budget: int,
) -> DataFrame:
    """Explicit-weights data-mixture plan (the Pile/Dolma-style recipe
    spec): given target mixture ``weights`` per source and a total
    ``token_budget``, compute per source how many tokens it is
    allotted and how to get them — a keep ``fraction`` when the source
    has more than its allotment (downsample via
    ``stratified_hash_sample``), or an ``epochs`` repetition factor
    > 1 when it has less (the standard LLM-recipe oversampling of
    short high-value sources).

    Returns one row per source in ``weights`` — including sources the
    corpus does not contain (or whose texts total zero tokens), which
    get ``available_tokens=0, keep_fraction=0.0, epochs=1.0`` so the
    recipe consumer SEES the shortfall instead of silently losing the
    source: ``(source, available_tokens, target_share, allotted_tokens,
    keep_fraction, epochs)`` — ``keep_fraction`` = min(1, allotted /
    available) and ``epochs`` = max(1, allotted / available), both
    rounded to 9 decimals; ``allotted_tokens`` = floor(budget * share).
    Sources absent from ``weights`` are excluded (weight 0).

    Scale shape: ONE map-side-combinable aggregation over the corpus
    (per-source whitespace-token sums); everything after operates on
    the sources-sized table with literal weights — nothing is
    collected, no second corpus scan. All inputs to the ratios are
    exact integers, so the plan is hash-replayable in SQL.
    """
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive: {token_budget}")
    bad = {s: w for s, w in weights.items() if w < 0}
    if bad or not weights:
        raise ValueError(f"weights must be non-empty and >= 0: {bad}")
    total_w = float(sum(weights.values()))
    toks = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    )
    counts = (
        df.filter(F.col(source_col).isin(*weights))
        .groupBy(source_col)
        .agg(F.sum(toks).alias("__avail"))
        .withColumnRenamed(source_col, "source")
    )
    # the weights ARE the row set: a weighted source missing from the
    # corpus must still appear (available_tokens=0) — left join the
    # sources-sized counts onto the literal weight table
    srcs = df.sparkSession.createDataFrame(
        [(s, w / total_w) for s, w in sorted(weights.items())],
        schema="source string, __share double",
    )
    joined = srcs.join(F.broadcast(counts), "source", "left")
    avail = F.coalesce(F.col("__avail").cast("long"), F.lit(0))
    allotted = F.floor(F.lit(float(token_budget)) * F.col("__share")).cast(
        "long"
    )
    # avail == 0 would divide to NULL: there is nothing to keep and
    # nothing to repeat, so the defined answer is (0.0, 1.0)
    ratio = allotted / avail
    return joined.select(
        F.col("source"),
        avail.alias("available_tokens"),
        F.round(F.col("__share"), 9).alias("target_share"),
        allotted.alias("allotted_tokens"),
        F.when(avail > 0, F.round(F.least(F.lit(1.0), ratio), 9))
        .otherwise(F.lit(0.0))
        .alias("keep_fraction"),
        F.when(avail > 0, F.round(F.greatest(F.lit(1.0), ratio), 9))
        .otherwise(F.lit(1.0))
        .alias("epochs"),
    )


def apply_mixture(
    df: DataFrame,
    id_col: str,
    text_col: str,
    source_col: str,
    weights: dict[str, float],
    token_budget: int,
    seed: str = "mixapply0",
) -> DataFrame:
    """Materialize a :func:`mixture_plan` into the actual training mix:
    each document of a weighted source is kept with its plan's
    ``keep_fraction`` (deterministic md5 threshold on the id) and
    replicated ``epochs`` times — ``floor(epochs)`` whole copies plus
    one more with probability ``frac(epochs)`` (an independent salted
    hash), so the realized token mass converges on the plan's
    allotment. Emits one row per copy: ``(id, source, copy)`` with
    ``copy`` in 1..n_rep. Sources outside ``weights`` are dropped
    (they are not part of the recipe).

    Scale shape: the plan is a weights-sized frame broadcast onto the
    corpus (one extra corpus aggregation pass to size it — the layout
    job a real run amortizes); keep/replicate are narrow md5
    predicates + an explode bounded by ceil(epochs), so nothing
    shuffles and every decision replays bit-identically on any
    executor, retry, or the DuckDB oracle.
    """
    plan = mixture_plan(df, text_col, source_col, weights, token_budget)
    joined = df.select(F.col(id_col), F.col(source_col)).join(
        F.broadcast(plan.withColumnRenamed("source", source_col)),
        source_col,
    )
    kept = sample_key(F.col(id_col), seed) < _hex_threshold_col(
        F.col("keep_fraction")
    )
    whole = F.floor(F.col("epochs")).cast("long")
    extra = sample_key(F.col(id_col), f"{seed}r") < _hex_threshold_col(
        F.col("epochs") - F.floor(F.col("epochs"))
    )
    n_rep = F.when(
        kept, whole + F.when(extra, F.lit(1)).otherwise(F.lit(0))
    ).otherwise(F.lit(0).cast("long"))
    staged = joined.select(
        F.col(id_col), F.col(source_col), n_rep.alias("__n_rep")
    )
    # sequence(1, 0) would count down — explode of an empty array
    # drops the row, which is exactly the n_rep=0 semantics
    copies = F.when(
        F.col("__n_rep") >= 1,
        F.sequence(F.lit(1).cast("long"), F.col("__n_rep")),
    ).otherwise(F.array().cast("array<long>"))
    return staged.select(
        id_col, source_col, F.explode(copies).alias("copy")
    )


def per_key_cap(
    df: DataFrame,
    key_col: str,
    id_col: str,
    cap: int,
    order_col: str | None = None,
) -> DataFrame:
    """Cap the number of rows kept per key (RefinedWeb-style per-domain
    caps: no single site may dominate the corpus). Keeps the first
    ``cap`` rows of each key in deterministic ``order_col`` order
    (default: the id) and emits the rank plus a ``kept`` flag so the
    audit view preserves the full row set.

    Shape chosen for scale: one shuffle on the cap key and one
    per-key sort — the same exchange a later per-key aggregation would
    need anyway. Only (key, id, order) columns move; payloads rejoin by
    id afterwards. Skewed keys are exactly the ones the cap is FOR:
    a hot domain's partition is bounded because every row beyond the
    cap is droppable at the merge (rank never exceeds cap + spillover
    within a task), and AQE's skew splitting covers the scan side.
    """
    order = F.col(order_col) if order_col else F.col(id_col)
    w = Window.partitionBy(key_col).orderBy(order, F.col(id_col))
    return df.select(
        F.col(id_col),
        F.col(key_col),
        F.row_number().over(w).cast("long").alias("key_rank"),
    ).withColumn("kept", F.col("key_rank") <= cap)


def group_split(
    df: DataFrame,
    group_col: str,
    fractions: "dict[str, float]",
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the uniform variate is
    the md5 of the GROUP key (domain, source, dedup cluster id), so
    every row of a group lands in the SAME split — near-duplicate or
    otherwise correlated documents can never straddle train and eval,
    the contamination mode a row-level split invites.

    ``fractions`` maps split name -> fraction in declaration order;
    they must sum to 1 (within float tolerance) and the last bin
    absorbs the hex-granularity remainder. Adds ``out_col``; a narrow
    expression — no shuffle, no state, reproducible across runs and
    engines (the declared query replays the arithmetic in SQL)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if not fractions:
        raise ValueError("fractions is empty")
    key = sample_key(F.col(group_col), seed)
    names = list(fractions)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += fractions[name]
        clause = key < hex_threshold(cum)
        expr = (
            F.when(clause, F.lit(name))
            if expr is None
            else expr.when(clause, F.lit(name))
        )
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def negative_samples(
    df: DataFrame,
    id_col: str,
    n_negatives: int = 2,
    seed: str = "neg0",
    n_rings: int = 1,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    anchor row is paired with the next ``n_negatives`` rows along a
    salted md5 hash ring — effectively uniform-random partners, but
    reproducible across runs/engines/retries (the property RNG
    sampling can't give a resumable pipeline) and guaranteed
    anchor != negative. Rings wrap, so every anchor gets exactly
    ``n_negatives`` partners whenever its ring holds more than
    ``n_negatives`` rows (degenerate tiny rings yield fewer — size
    rings accordingly).

    Output: ``(anchor_id, negative_id, neg_rank 1..n)``.

    Scale shape: rows are dealt into ``n_rings`` INDEPENDENT rings by
    a second hash, and each ring sorts/pairs in its own partition —
    with n_rings ~ cluster parallelism this is an ordinary partitioned
    sort + lead(), no self-join, no RNG. n_rings=1 (the default, fine
    up to a few million rows) is a single-partition sort; at corpus
    scale ALWAYS set n_rings high enough that no task holds the whole
    table, and keep expected ring size >> n_negatives (ring
    membership is hash-uniform, so partners stay effectively uniform
    over the corpus). The per-ring wrap borrows that ring's first
    ``n_negatives`` rows via one tiny broadcast.
    """
    if n_negatives < 1:
        raise ValueError(f"n_negatives must be >= 1: {n_negatives}")
    if n_rings < 1:
        raise ValueError(f"n_rings must be >= 1: {n_rings}")
    pos = sample_key(F.col(id_col), seed)
    ring = df.select(
        F.col(id_col).alias("anchor_id"),
        pos.alias("__pos"),
        (F.conv(F.substring(pos, 1, 4), 16, 10).cast("int") % n_rings).alias(
            "__ring"
        ),
    )
    w = Window.partitionBy("__ring").orderBy("__pos", "anchor_id")
    leads = ring.select(
        "anchor_id",
        "__ring",
        *[
            F.lead("anchor_id", i).over(w).alias(f"__n{i}")
            for i in range(1, n_negatives + 1)
        ],
        F.row_number().over(w).alias("__rn"),
    )
    # per-ring wrap: row rn's partner i sits at ring position rn + i,
    # or rn + i - N_ring once past the end — always within the ring's
    # first n_negatives rows. Heads + sizes are n_rings tiny rows.
    ranked = ring.withColumn("__rn", F.row_number().over(w))
    heads = (
        ranked.filter(F.col("__rn") <= n_negatives)
        .groupBy("__ring")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__pos", "anchor_id"))
                ),
                lambda x: x["anchor_id"],
            ).alias("__head")
        )
    )
    sizes = ring.groupBy("__ring").agg(F.count(F.lit(1)).alias("__N"))
    out = (
        leads.join(F.broadcast(heads), "__ring")
        .join(F.broadcast(sizes), "__ring")
        .select(
            "anchor_id",
            F.posexplode(
                F.array(
                    *[
                        F.coalesce(
                            F.col(f"__n{i}"),
                            F.element_at(
                                F.col("__head"),
                                (F.col("__rn") + i - F.col("__N")).cast(
                                    "int"
                                ),
                            ),
                        )
                        for i in range(1, n_negatives + 1)
                    ]
                )
            ).alias("__i", "negative_id"),
        )
    )
    return (
        out.select(
            "anchor_id",
            "negative_id",
            (F.col("__i") + 1).alias("neg_rank"),
        )
        .filter(
            F.col("negative_id").isNotNull()
            & (F.col("negative_id") != F.col("anchor_id"))
        )
    )
