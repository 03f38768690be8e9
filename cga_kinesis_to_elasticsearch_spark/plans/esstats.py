"""ES statistics/query parity: ``matrix_stats`` (the covariance/
correlation matrix aggregation), ``percentile_ranks`` (inverse of the
percentiles agg), ``span_near`` proximity search, and ``weighted_avg``
— surfaces of the Elasticsearch analytics API the reference's users
query daily that were not yet mapped (significant_terms / rare_terms /
auto_date_histogram / highlight / rank_eval / geo_bounds live in their
own modules).

Float discipline (see BASELINE oracle notes): every statistic is
closed from INTEGER sums (quantity is a whole number; discount/tax
are exact cents), so the only floating-point work is one identical
IEEE expression evaluated on both engines and rounded to 9 decimals —
no float sums, no order sensitivity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import broadcast

from .declared import _t, q

# ---------------------------------------------------------------------------
# matrix_stats: per-group covariance/correlation matrix over
# (l_quantity, l_discount) — ES's matrix_stats aggregation
# (count/mean/variance/covariance/correlation per field pair).
# ---------------------------------------------------------------------------

_MATRIX_ORACLE = """
WITH staged AS (
  SELECT l_returnflag,
         CAST(l_quantity AS BIGINT) AS x,
         CAST(round(l_discount * 100, 0) AS BIGINT) AS y
  FROM lineitem
),
sums AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM staged GROUP BY l_returnflag
)
SELECT l_returnflag,
       n,
       round(sx / n, 9) AS mean_qty,
       round(sy / n, 9) AS mean_disc_c,
       round((nd * sxxd - sxd * sxd) / (nd * (nd - 1)), 9) AS var_qty,
       round((nd * syyd - syd * syd) / (nd * (nd - 1)), 9) AS var_disc_c,
       round((nd * sxyd - sxd * syd) / (nd * (nd - 1)), 9) AS cov_qd,
       round((nd * sxyd - sxd * syd) /
             (sqrt(nd * sxxd - sxd * sxd) *
              sqrt(nd * syyd - syd * syd)), 9) AS corr_qd
FROM (SELECT *,
             CAST(n AS DOUBLE) AS nd,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
             CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd,
             CAST(sxy AS DOUBLE) AS sxyd
      FROM sums)
"""


@q("matrix_stats_lineitem", _MATRIX_ORACLE)
def _matrix_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES matrix_stats parity: count/mean/variance/covariance/
    correlation of (quantity, discount-cents) per return flag.

    Scale shape: ONE partial-aggregated shuffle of 6 int64 sums per
    group (3 groups) — the moments close in the reducer, so the fact
    table is scanned once and never re-shuffled; all arithmetic stays
    in whole-stage codegen. The SUMS are exact int64; the moment
    closure (n*sxx - sx^2 etc.) is evaluated in double because its
    products pass int64 at ~SF30-size groups — exact below 2^53,
    ~1e-16 relative above, identical on both engines either way;
    correlation factors as sqrt(vx)*sqrt(vy) to avoid squaring the
    variance terms."""
    li = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.round(F.col("l_discount") * 100, 0).cast("long")
    sums = (
        li.select(
            F.col("l_returnflag"), x.alias("x"), y.alias("y")
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    # moment closure in DOUBLE (see docstring / the oracle's twin
    # subquery): int64 products like n*sxx wrap at large-SF groups
    nd = n.cast("double")
    sxd, syd = sx.cast("double"), sy.cast("double")
    sxxd = F.col("sxx").cast("double")
    syyd = F.col("syy").cast("double")
    sxyd = F.col("sxy").cast("double")
    vx = nd * sxxd - sxd * sxd
    vy = nd * syyd - syd * syd
    cxy = nd * sxyd - sxd * syd
    denom = nd * (nd - F.lit(1))
    return sums.select(
        "l_returnflag",
        "n",
        F.round(sx / n, 9).alias("mean_qty"),
        F.round(sy / n, 9).alias("mean_disc_c"),
        F.round(vx / denom, 9).alias("var_qty"),
        F.round(vy / denom, 9).alias("var_disc_c"),
        F.round(cxy / denom, 9).alias("cov_qd"),
        F.round(cxy / (F.sqrt(vx) * F.sqrt(vy)), 9).alias("corr_qd"),
    )


# ---------------------------------------------------------------------------
# percentile_ranks: per event type, the percent of values <= each
# given threshold — the inverse of the percentiles aggregation
# (value_percentiles_by_type covers the forward direction).
# ---------------------------------------------------------------------------

_RANK_THRESHOLDS = (10.0, 100.0, 500.0)

_RANKS_ORACLE = f"""
WITH sums AS (
  SELECT event_type,
         count(*) AS n,
         CAST(sum(CASE WHEN value <= {_RANK_THRESHOLDS[0]!r} THEN 1 ELSE 0 END)
              AS BIGINT) AS c0,
         CAST(sum(CASE WHEN value <= {_RANK_THRESHOLDS[1]!r} THEN 1 ELSE 0 END)
              AS BIGINT) AS c1,
         CAST(sum(CASE WHEN value <= {_RANK_THRESHOLDS[2]!r} THEN 1 ELSE 0 END)
              AS BIGINT) AS c2
  FROM events GROUP BY event_type
)
SELECT event_type, n,
       round(100 * c0 / n, 9) AS pct_le_10,
       round(100 * c1 / n, 9) AS pct_le_100,
       round(100 * c2 / n, 9) AS pct_le_500
FROM sums
"""


@q("percentile_ranks_by_type", _RANKS_ORACLE)
def _percentile_ranks_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percentile_ranks parity: percent of event values at or
    below each fixed threshold, per event type.

    Scale shape: the threshold comparisons fold into the ONE partial
    aggregation (3 int64 counters per group) — exact answers with the
    same cost envelope as a plain count, no sort and no full-data
    percentile pass."""
    ev = _t(spark, sf_dir, "events")
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(
            F.when(F.col("value") <= F.lit(t), F.lit(1)).otherwise(F.lit(0))
        ).alias(f"c{i}")
        for i, t in enumerate(_RANK_THRESHOLDS)
    ]
    sums = ev.groupBy("event_type").agg(*aggs)
    n = F.col("n")
    return sums.select(
        "event_type",
        "n",
        F.round(F.lit(100) * F.col("c0") / n, 9).alias("pct_le_10"),
        F.round(F.lit(100) * F.col("c1") / n, 9).alias("pct_le_100"),
        F.round(F.lit(100) * F.col("c2") / n, 9).alias("pct_le_500"),
    )


# ---------------------------------------------------------------------------
# span_near proximity search: documents where two terms co-occur
# within a position slop (ES span_near / match_phrase with slop,
# beyond the exact-adjacency phrase_search_count in searchindex.py).
# ---------------------------------------------------------------------------

_PROX_A = "scan"
_PROX_B = "merge"
_PROX_SLOP = 3

# DuckDB list lambdas index from 1; Spark transform() from 0 — both
# sides stage 1-based positions so the pairwise gaps are identical.
_PROX_ORACLE = f"""
WITH staged AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM documents
),
pos AS (
  SELECT doc_id,
         list_filter(list_transform(toks,
             (t, i) -> CASE WHEN t = '{_PROX_A}' THEN i ELSE -1 END),
             v -> v >= 0) AS pa,
         list_filter(list_transform(toks,
             (t, i) -> CASE WHEN t = '{_PROX_B}' THEN i ELSE -1 END),
             v -> v >= 0) AS pb
  FROM staged
),
gaps AS (
  SELECT doc_id,
         list_min(flatten(list_transform(pa,
             x -> list_transform(pb, y -> abs(x - y))))) AS min_gap
  FROM pos
)
SELECT doc_id, CAST(min_gap AS BIGINT) AS min_gap
FROM gaps WHERE min_gap <= {_PROX_SLOP}
"""


@q("proximity_search_docs", _PROX_ORACLE)
def _proximity_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """span_near proximity search: docs where '{a}' and '{b}' occur
    within {slop} token positions, with the minimum observed gap.

    Scale shape: entirely in-row higher-order functions over the
    token array (positions extracted per term, pairwise |gap| min) —
    zero shuffles, zero Python; the candidate pair expansion is
    bounded by per-doc term frequency, not corpus size. At index
    scale the same gap test runs over the positional postings of
    sinks/textindex.py instead of raw text."""
    from .northstar import _tp

    # _tp, not _t: the fixture parquet is one row group, and the HOF
    # pair expansion is the per-row hot loop — spread it first
    docs = _tp(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")

    def positions(term: str):
        return F.filter(
            F.transform(
                F.col("toks"),
                lambda t, i: F.when(t == term, i + 1).otherwise(F.lit(-1)),
            ),
            lambda v: v >= 0,
        )

    gaps = (
        docs.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            positions(_PROX_A).alias("pa"),
            positions(_PROX_B).alias("pb"),
        )
        .select(
            "doc_id",
            F.array_min(
                F.flatten(
                    F.transform(
                        F.col("pa"),
                        lambda x: F.transform(
                            F.col("pb"), lambda y: F.abs(x - y)
                        ),
                    )
                )
            ).alias("min_gap"),
        )
    )
    return gaps.filter(F.col("min_gap") <= _PROX_SLOP).select(
        "doc_id", F.col("min_gap").cast("long").alias("min_gap")
    )


_proximity_search_docs.__doc__ = _proximity_search_docs.__doc__.format(
    a=_PROX_A, b=_PROX_B, slop=_PROX_SLOP
)


# ---------------------------------------------------------------------------
# weighted_avg: ES's weighted-average aggregation — value weighted by
# another field (price weighted by quantity), exact via integer cents.
# ---------------------------------------------------------------------------

_WAVG_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
         CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                  * CAST(l_quantity AS BIGINT)) AS BIGINT) AS spq,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
         count(*) AS n
  FROM lineitem GROUP BY l_returnflag)
SELECT l_returnflag, n, sq AS total_weight,
       round(spq / (100.0 * sq), 9) AS weighted_avg_price
FROM s
"""


@q("weighted_avg_price", _WAVG_ORACLE)
def _weighted_avg_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES weighted_avg parity: extended price weighted by quantity per
    return flag, exact through integer cents x integer quantity sums
    (one partial-agg shuffle; the single division is the only float
    op, replayed identically by the oracle)."""
    li = _t(spark, sf_dir, "lineitem")
    pc = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    qt = F.col("l_quantity").cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.sum(pc * qt).alias("spq"),
        F.sum(qt).alias("sq"),
        F.count(F.lit(1)).alias("n"),
    )
    return s.select(
        "l_returnflag",
        "n",
        F.col("sq").alias("total_weight"),
        F.round(F.col("spq") / (F.lit(100.0) * F.col("sq")), 9).alias(
            "weighted_avg_price"
        ),
    )


# ---------------------------------------------------------------------------
# string_stats: ES's string_stats aggregation over documents.text —
# count / min_length / max_length / avg_length / Shannon char entropy.
# ---------------------------------------------------------------------------

_SSTATS_ORACLE = """
WITH chars AS (
  SELECT unnest(list_filter(string_split(text, ''), c -> c <> '')) AS ch
  FROM documents),
cc AS (SELECT ch, count(*) AS cnt FROM chars GROUP BY ch),
lens AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(min(length(text)) AS BIGINT) AS min_length,
         CAST(max(length(text)) AS BIGINT) AS max_length,
         CAST(sum(length(text)) AS BIGINT) AS total_chars
  FROM documents),
s AS (
  SELECT list_sum(list(cnt * ln(CAST(cnt AS DOUBLE)) ORDER BY ch ASC))
           AS slog,
         CAST(sum(cnt) AS BIGINT) AS n_chars
  FROM cc)
SELECT n_docs, min_length, max_length,
       round(total_chars / (1.0 * n_docs), 6) AS avg_length,
       round((ln(CAST(n_chars AS DOUBLE)) - slog / n_chars) / ln(2.0), 6)
         AS entropy
FROM lens CROSS JOIN s
"""


@q("string_stats_text", _SSTATS_ORACLE)
def _string_stats_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES string_stats parity over documents.text: value count, min/
    max/avg length, and Shannon entropy of the corpus character
    distribution (H = (ln N - sum(c*ln c)/N) / ln 2).

    Float discipline: char counts are integers; the entropy fold runs
    over the ascending-char sorted count array on BOTH engines
    (array_sort + left fold here, list ORDER BY ch in the oracle), so
    the float sum of c*ln(c) is the identical operand sequence — the
    same determinism contract as text.unigram_logprob.

    Scale shape: chars explode per-doc ALPHABET (array_distinct),
    never per character — the exploded row count is bounded by
    |alphabet| per doc (~10^2), and the global char-count table is
    |alphabet| rows, collapsing to one row for the fold. The length
    stats are one map-side-combinable agg. The two single-row frames
    cross-join at kilobyte cost."""
    docs = _t(spark, sf_dir, "documents")
    chars = F.filter(F.split(F.col("text"), ""), lambda c: c != "")
    per_doc = docs.select(
        F.explode(
            F.transform(
                F.array_distinct(chars),
                lambda c: F.struct(
                    c.alias("ch"),
                    F.size(F.filter(chars, lambda x: x == c)).alias("cnt"),
                ),
            )
        ).alias("p")
    )
    cc = per_doc.groupBy(F.col("p.ch").alias("ch")).agg(
        F.sum("p.cnt").alias("cnt")
    )
    lens = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(F.length("text")).cast("long").alias("min_length"),
        F.max(F.length("text")).cast("long").alias("max_length"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
    )
    s = (
        cc.agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("ch"), F.col("cnt")))
            ).alias("arr"),
            F.sum("cnt").alias("n_chars"),
        )
        .select(
            F.aggregate(
                "arr",
                F.lit(0.0),
                lambda acc, x: acc
                + x["cnt"] * F.log(x["cnt"].cast("double")),
            ).alias("slog"),
            "n_chars",
        )
    )
    return lens.crossJoin(s).select(
        "n_docs",
        "min_length",
        "max_length",
        F.round(F.col("total_chars") / (1.0 * F.col("n_docs")), 6).alias(
            "avg_length"
        ),
        F.round(
            (
                F.log(F.col("n_chars").cast("double"))
                - F.col("slog") / F.col("n_chars")
            )
            / F.log(F.lit(2.0)),
            6,
        ).alias("entropy"),
    )


# ---------------------------------------------------------------------------
# top_metrics: ES's top_metrics aggregation — per bucket, the metric
# values taken from the document with the greatest sort key.
# ---------------------------------------------------------------------------

_TOPM_ORACLE = """
WITH e AS (
  SELECT event_type, value, user_id,
         CAST(epoch_us(ts) AS BIGINT) AS ep,
         lpad(CAST(CAST(epoch_us(ts) AS BIGINT) AS VARCHAR), 20, '0')
           || lpad(CAST(event_id AS VARCHAR), 12, '0') AS sk
  FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(arg_max(value, sk), 2) AS top_value,
       CAST(arg_max(user_id, sk) AS BIGINT) AS top_user,
       CAST(max(ep) AS BIGINT) AS latest_ts_us
FROM e GROUP BY event_type
"""


@q("top_metrics_latest", _TOPM_ORACLE)
def _top_metrics_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES top_metrics parity: per event_type, the value and user of
    the LATEST event (sort = ts desc), plus bucket size — max_by over
    a zero-padded (epoch_micros, event_id) string key so ties break
    identically on both engines without a window.

    Scale shape: a single map-side-combinable aggregate (max_by
    partials carry one row per group) — no window, no per-group sort,
    one shuffle on the handful of event_type keys whose partials are
    already collapsed per map task, so hot types cannot skew a
    reducer."""
    ev = _t(spark, sf_dir, "events")
    ep = F.unix_micros(F.col("ts"))
    sk = F.concat(
        F.lpad(ep.cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    e = ev.select(
        "event_type", "value", "user_id", ep.alias("ep"), sk.alias("sk")
    )
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.max_by("value", F.col("sk")), 2).alias("top_value"),
        F.max_by("user_id", F.col("sk")).cast("long").alias("top_user"),
        F.max("ep").cast("long").alias("latest_ts_us"),
    )


# ---------------------------------------------------------------------------
# median_absolute_deviation: ES's MAD aggregation — robust dispersion,
# exact via integer cents and the interpolated median on both engines.
# ---------------------------------------------------------------------------

_MAD_ORACLE = """
WITH li AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS pc
  FROM lineitem),
med AS (
  SELECT l_returnflag, quantile_cont(pc, 0.5) AS med
  FROM li GROUP BY l_returnflag),
dev AS (
  SELECT li.l_returnflag, abs(li.pc - med.med) AS d
  FROM li JOIN med USING (l_returnflag)),
mad AS (
  SELECT l_returnflag, quantile_cont(d, 0.5) AS mad
  FROM dev GROUP BY l_returnflag)
SELECT med.l_returnflag,
       round(med.med / 100.0, 4) AS median_price,
       round(mad.mad / 100.0, 4) AS mad_price
FROM med JOIN mad USING (l_returnflag)
"""


@q("mad_price_by_flag", _MAD_ORACLE)
def _mad_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES median_absolute_deviation parity per return flag: median of
    |price - median(price)|, the robust alternative to stddev.

    Float discipline: prices stage as integer cents; both engines'
    interpolated median of integers is the midpoint of two ints
    (exactly representable), so the deviations are exact .5-step
    doubles and the second median is exact again — the closing
    round/divide is the only lossy float op, on identical operands.

    Scale shape: two exact-percentile aggregates (percentile()
    partials merge map-side, memory bounded by distinct cent values
    per group, not rows) with the per-group medians broadcast back
    between them; an unbounded value domain would swap in the KLL
    sketch (operators/sketches.py) at the same call shape."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("long")
        .alias("pc"),
    )
    # med is referenced by BOTH the deviation join and the closing
    # join; cut its lineage so the first exact-percentile pass (a full
    # fact scan) runs once, not once per reference.
    med = (
        li.groupBy("l_returnflag")
        .agg(F.expr("percentile(pc, 0.5)").alias("med"))
        .localCheckpoint()
    )
    dev = li.join(broadcast(med), "l_returnflag").select(
        "l_returnflag", F.abs(F.col("pc") - F.col("med")).alias("d")
    )
    mad = dev.groupBy("l_returnflag").agg(
        F.expr("percentile(d, 0.5)").alias("mad")
    )
    return med.join(mad, "l_returnflag").select(
        "l_returnflag",
        F.round(F.col("med") / 100.0, 4).alias("median_price"),
        F.round(F.col("mad") / 100.0, 4).alias("mad_price"),
    )
