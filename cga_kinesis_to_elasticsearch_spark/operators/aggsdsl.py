"""ES aggregation-DSL interpreter: a nested ``aggs`` tree executed
with ES's OWN bucket semantics — every sub-aggregation is computed at
its own bucket level — and returned as one flat DataFrame.

This is the response side of a search request, pairing with
operators/querydsl.py (the query side) and operators/ingest.py (the
write side). The reference ships events into Elasticsearch
(main.go sink wiring) precisely so users can POST these aggregation
trees; this module maps that query surface Spark-first.

Result contract (the relational encoding of ES's nested response):
ONE DataFrame with a row per bucket at EVERY level of the tree.

- ``agg_path``  — ``>``-joined agg names from the root, e.g.
  ``per_day`` or ``per_day>per_type`` (ES clients address buckets by
  exactly this path).
- one column per bucket agg name holding that level's bucket key
  (NULL on rows of other levels).
- ``doc_count`` — always present, per bucket, like every ES bucket.
- one column per metric / pipeline / top_hits agg name, populated on
  the rows of the level that declares it, NULL elsewhere.

A metric attached to an outer bucket is therefore computed over the
OUTER bucket's documents — never silently at the innermost
granularity (the composite-flattening bug this design replaces).

Bucket aggregations:

- ``terms``          {field[, missing][, size][, shard_size]
                     [, show_term_doc_count_error][, shards,
                     shard_key]} — group by value. ES semantics: docs
                     with a NULL field are OMITTED unless ``missing``
                     maps them to a stand-in value. ``size`` keeps
                     the top-N buckets per parent by (doc_count DESC,
                     key ASC) — ES's default order with a
                     deterministic tiebreak. Without ``size`` every
                     bucket is returned through THIS analytics API;
                     request bodies (querydsl.run_search_body) route
                     through apply_es_default_sizes, which injects
                     ES's interactive default size=10.
                     ``show_term_doc_count_error`` adds ES's
                     per-bucket ``doc_count_error_upper_bound`` (0 on
                     the default single shard — counts are exact);
                     ``shards`` + ``shard_key`` (engine stand-ins for
                     the index's shard layout) simulate ES's
                     shard-local top-``shard_size`` merge exactly,
                     including its undercounting (top level only, no
                     sub-aggs — see _terms_sharded).
- ``multi_terms``    {terms: [{field}, {field}, ...][, size]} — one
                     bucket per value COMBINATION; the key is the
                     '|'-joined string (ES's key_as_string); docs
                     missing any field are omitted; same size/order
                     contract as terms.
- ``date_histogram`` {field, calendar_interval: hour|day|week|month|
                     quarter|year | fixed_interval: Ns|Nm|Nh|Nd
                     [, time_zone][, offset][, min_doc_count]} —
                     keys are formatted bucket-START strings;
                     ``time_zone`` (IANA name or ``+HH:MM``) moves
                     boundaries into that zone, ``offset`` (``+6h``)
                     shifts them (full-timestamp keys). Pass
                     ``min_doc_count: 0`` (ES's default) to emit
                     EMPTY buckets between the observed min and max
                     (every interval grids); without it gap buckets
                     are omitted (documented divergence — the
                     engine's default is min_doc_count 1).
- ``auto_date_histogram`` {field[, buckets]} — ES picks the smallest
                     ladder interval (1h..30d) yielding <= ``buckets``
                     aligned buckets from the OBSERVED span; the pick
                     rides a single-row broadcast join (one extra
                     map-side-combined min/max scan, no driver
                     round-trip), then buckets like date_histogram.
- ``histogram``      {field, interval[, offset][, min_doc_count]
                     [, extended_bounds][, hard_bounds]} — fixed-width
                     numeric; NULL field values are omitted (no
                     bucket), like ES. ``offset`` shifts bucket
                     boundaries; ``hard_bounds`` drops buckets outside
                     [min, max]; ``min_doc_count: 0`` emits empty grid
                     buckets between the observed min and max per
                     parent (``extended_bounds`` widens that grid to
                     at least [min, max]), like ES's defaults.
                     date_histogram accepts ``extended_bounds`` too
                     (bucket-aligned key-format strings).
- ``rare_terms``     {field[, max_doc_count]} — the LONG TAIL: buckets
                     whose doc_count <= max_doc_count (default 1),
                     EXACT where ES uses a CuckooFilter
                     (may-miss-rare trade); descendant levels prune to
                     the surviving buckets like size-capped terms.
- ``range``          {field, ranges: [{from?, to?[, key]}]} — ES-exact:
                     a doc lands in EVERY matching range (explode
                     lowering), docs outside all ranges produce no
                     bucket, and every REQUESTED range is emitted even
                     with doc_count 0 (zero-filled per parent bucket).
- ``filters``        {filters: {name: <query DSL>}} — one bucket per
                     named filter (operators/querydsl.compile_query);
                     a doc lands in every filter it matches; all
                     requested filters are emitted (zero-filled).
- ``date_range``     {field, ranges: [{from?, to?[, key]}]} — ``range``
                     over a timestamp field, bounds parsed as
                     timestamps; same ES-exact explode/zero-fill.
- ``geo_distance``   {field, origin: {lat, lon}, ranges} — distance-
                     banded rings from an origin; PLANAR euclidean
                     distance in the field's units (the repo's
                     centi-degree convention — same documented
                     divergence as the geo_distance query); same
                     explode/zero-fill contract as range.
- ``adjacency_matrix`` {filters: {name: query}} — one bucket per
                     filter plus one per intersecting PAIR
                     (``a&b``, names sorted); empty buckets are
                     OMITTED, like ES (no zero-fill).
- ``composite``      {sources: [{name: terms|histogram|
                     date_histogram}], size, after} — ES's scalable
                     pagination bucket: multi-source key tuples in
                     per-source order, resumed strictly AFTER the
                     ``after`` tuple. Must be the only top-level agg
                     (ES's own restriction); sub-aggs are metric
                     leaves. One groupBy + TakeOrdered(size); the
                     after predicate applies to the key expressions
                     BELOW the aggregation, so a resumed page never
                     re-aggregates delivered pages.
- ``filter``         <query DSL> — single narrowing bucket.
- ``missing``        {field} — bucket of docs with a NULL field.
- ``nested``         {path} — the doc set becomes the NESTED docs of
                     the ``array<struct>`` column at ``path`` (one
                     explode; docs without nested docs contribute
                     nothing; doc_count counts nested docs, like ES);
                     sub-aggs address members by dotted path.
                     ``reverse_nested`` is not lowered — aggregate
                     parent fields before nesting instead.
- ``global``         {} — escapes the query: sub-aggs run over the
                     PRE-query frame (top level only, like ES).

Metric leaves: ``value_count`` / ``sum`` / ``avg`` / ``min`` /
``max`` {field}, ``cardinality`` {field} (EXACT distinct here; at
100 TB swap in the HLL sketch of operators/sketches.py exactly as ES
trades precision_threshold for memory), ``weighted_avg``
{value.field, weight.field} (pairs where either side is NULL are
excluded, like ES), ``stats`` {field} (a STRUCT of
count/min/max/avg/sum), ``extended_stats`` {field} (adds
sum_of_squares and ES's default POPULATION variance/std_deviation),
and ``percentiles`` {field[, percents]} (ARRAY in requested-percent
order; EXACT interpolated percentiles where ES uses t-digest — same
exactness trade as cardinality, swap in the KLL sketch of
operators/sketches.py at 100 TB). Round-5 metric additions:
``percentile_ranks`` {field, values} (ARRAY of exact
percent-at-or-below ranks in requested-value order),
``boxplot`` {field} (STRUCT min/q1/q2/q3/max, exact five-number
summary), ``median_absolute_deviation`` {field} (exact
median(|x - median|), two bucket-keyed passes),
``top_metrics`` {metrics: [{field}...], sort, size: 1} (the best
document's metric fields as flat ``<agg>_<field>`` columns —
deterministic tie-break on the metric fields), and ``rate``
{[field,] unit} inside a FIXED-length date_histogram (per-unit
scaling of sum/doc_count; calendar month/quarter/year buckets are
rejected at plan time). Round-7 additions: ``geo_bounds`` {field}
(STRUCT top/bottom/left/right over a struct{lat,lon} geo column,
planar), ``geo_centroid`` {field} (STRUCT lat/lon/count —
arithmetic mean under the centi-degree convention),
``matrix_stats`` {fields: [2..4]} (per-field count/mean/sample
variance + pairwise sample covariance and Pearson correlation over
docs with EVERY field, like ES; skewness/kurtosis not lowered —
Spark's estimators are population-biased where ES's are
sample-corrected), and the ``random_sampler`` bucket
{probability[, seed]} (deterministic multiplicative-hash sampling
of the doc set before sub-aggs; raw sample statistics — the caller
scales by 1/p).

Pipeline aggregations (siblings of the metrics they reference via
``buckets_path`` — a sibling metric name or ``_count``; the enclosing
bucket must be a histogram/date_histogram so bucket order is defined,
as ES requires):

- ``cumulative_sum`` {buckets_path}
- ``derivative``     {buckets_path}            — null first bucket
- ``serial_diff``    {buckets_path[, lag]}     — null until lag rows
- ``moving_fn``      {buckets_path, window}    — unweighted avg over
                     the trailing window EXCLUDING the current bucket
                     (ES's default shift); null on an empty window
- ``bucket_script``  {buckets_path: {p: path}, script} — arithmetic
                     ``params.p`` expressions (the painless subset
                     that lowers to a Column expression)
- ``bucket_selector``{buckets_path: {...}, script} — drops buckets
                     where the predicate is false; descendant-level
                     rows of dropped buckets are pruned too (ES prunes
                     the whole sub-tree)
- ``bucket_sort``    {sort: [{col: {order}}], size} — top-N buckets
                     per parent (descendants pruned likewise)

Sibling pipeline aggregations (live NEXT TO a bucket agg and
aggregate that CHILD's finished per-bucket values — after the child's
own selectors/sorts, like ES — onto the parent's row):

- ``avg_bucket`` / ``sum_bucket`` / ``min_bucket`` / ``max_bucket``
  {buckets_path: "child>metric" or "child>_count"}
- ``stats_bucket``   {buckets_path} — STRUCT of count/min/max/avg/sum
- ``percentiles_bucket`` {buckets_path[, percents]} — ARRAY of exact
  interpolated percentiles over the child's bucket values

``terms`` also accepts ``include`` / ``exclude`` (anchored Lucene
regex or exact-value list) and ``min_doc_count``; ``filters`` accepts
``other_bucket`` / ``other_bucket_key`` (docs matching no named
filter); ``histogram`` / ``date_histogram`` accept ``missing`` (the
stand-in buckets like a real value).

``significant_terms`` {field[, size]} (top level only): terms scored
with ES's JLH — (fg_rate - bg_rate) * (fg_rate / bg_rate), foreground
= the query-filtered frame, background = the pre-query frame, rates
among docs that have the field — EXACT where ES samples shard-local
top term candidates; only terms MORE frequent in the foreground
survive (ES's significance gate). Emits ``bg_count`` and ``score``
columns; top ``size`` by score. ``significant_text`` {field[, size]}
(top level only) runs the same machinery over the ANALYZED TOKENS of
a free-text field, doc frequencies counting documents (exact reading
of ES's sampled version — see _significant_text_frame).

``top_hits`` {size, sort, _source} returns per bucket an ARRAY of
``_source`` structs ordered by ``sort`` (explicit sort required —
this engine's filter context has no default ``_score`` order).

Scale shape: levels are grouped by "frame signature" (the chain of
filter / explode / global steps above them); all levels sharing a
signature compute in ONE groupingSets aggregation — one
partial-aggregated shuffle per signature, not per level, so the
everyday chain (terms > date_histogram > metrics) still costs a
single exchange. Bucket-key expressions are narrow codegen; explode
levels multiply only matching docs by their matching-bucket count.
Pipeline aggs are windows over the aggregated BUCKET frame (KB-sized
at any corpus scale), partitioned by the parent keys so the work
distributes. Unknown constructs fail at PLAN time (ES's validation).
"""

from __future__ import annotations

import functools
import math
import operator as _op
import re

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["compile_aggs", "apply_aggs", "apply_es_default_sizes"]

_CAL = {
    "hour": "yyyy-MM-dd HH:00:00",
    "day": "yyyy-MM-dd",
    "month": "yyyy-MM",
    "year": "yyyy",
}

# calendar intervals lowered via date_trunc (week starts Monday, ISO,
# like ES's default)
_CAL_TRUNC = {
    "hour": ("hour", "yyyy-MM-dd HH:00:00", "interval 1 hour", None),
    "day": ("day", "yyyy-MM-dd", "interval 1 day", None),
    "week": ("week", "yyyy-MM-dd", "interval 7 day", None),
    "month": ("month", "yyyy-MM", "interval 1 month", "yyyy-MM"),
    "quarter": ("quarter", "yyyy-MM-dd", "interval 3 month", None),
    "year": ("year", "yyyy", "interval 1 year", "yyyy"),
}

_DURATION_RE = re.compile(r"([+-]?)(\d+)(ms|s|m|h|d)")
_DURATION_SECS = {"s": 1, "m": 60, "h": 3600, "d": 86400}


def _parse_duration_secs(s, what: str) -> int:
    """ES duration string (``30m``, ``+6h``, ``1000ms``) -> signed
    whole seconds. Sub-second resolutions are rejected at plan time —
    the engine's timestamp surface is second-resolution."""
    m = _DURATION_RE.fullmatch(str(s))
    if not m:
        raise ValueError(f"{what}: bad duration {s!r}")
    sign = -1 if m.group(1) == "-" else 1
    n, unit = int(m.group(2)), m.group(3)
    if unit == "ms":
        if n % 1000:
            raise ValueError(
                f"{what}: sub-second duration {s!r} is not supported "
                "(second-resolution timestamp surface)"
            )
        return sign * (n // 1000)
    return sign * n * _DURATION_SECS[unit]


def _dh_lower(body: dict):
    """Lower a ``date_histogram`` body to
    ``(key_builder, step_sql, parse_fmt, out_fmt)``:

    - ``key_builder(field)`` — the bucket-key Column (a formatted
      bucket-START string);
    - ``step_sql`` — the SQL interval between consecutive buckets
      (min_doc_count=0 gap grids);
    - ``parse_fmt`` — explicit to_timestamp format for re-parsing the
      key string (None when the default parser handles it);
    - ``out_fmt`` — the key's date_format pattern.

    Exactly one of ``calendar_interval`` (hour/day/week/quarter/
    month/year) and ``fixed_interval`` (s/m/h/d multiples; ms only as
    whole seconds) is required. ``time_zone`` moves bucket boundaries
    into that zone (named IANA zone or ``+HH:MM`` offset — keys are
    the LOCAL bucket starts, ES's key_as_string reading);
    ``offset`` (``+6h``) shifts boundaries and widens the key format
    to full timestamps. Divergence note: with a DST zone, fixed
    intervals grid in local wall-clock (ES grids in UTC instants) —
    use fixed-offset zones for exact parity."""
    cal = body.get("calendar_interval")
    fix = body.get("fixed_interval")
    if (cal is None) == (fix is None):
        raise ValueError(
            "date_histogram needs exactly one of calendar_interval / "
            f"fixed_interval: {body}"
        )
    if cal is not None and cal not in _CAL_TRUNC:
        raise ValueError(
            f"date_histogram: unsupported calendar_interval {cal!r}"
        )
    tz = body.get("time_zone")
    off = (
        _parse_duration_secs(body["offset"], "date_histogram offset")
        if "offset" in body
        else 0
    )
    if cal is not None:
        trunc_unit, out_fmt, step_sql, parse_fmt = _CAL_TRUNC[cal]
        secs = None
    else:
        secs = _parse_duration_secs(fix, "date_histogram fixed_interval")
        if secs <= 0:
            raise ValueError(
                f"date_histogram: fixed_interval must be positive: {fix!r}"
            )
        trunc_unit = None
        out_fmt, step_sql, parse_fmt = (
            "yyyy-MM-dd HH:mm:ss",
            f"interval {secs} second",
            None,
        )
    if off:
        # shifted boundaries need full-timestamp keys (ES widens
        # key_as_string the same way)
        out_fmt, parse_fmt = "yyyy-MM-dd HH:mm:ss", None

    def build(field) -> Column:
        col = field if isinstance(field, Column) else F.col(field)
        if tz:
            col = F.from_utc_timestamp(col, tz)
        if off:
            col = col - F.expr(f"INTERVAL '{off}' SECOND")
        if trunc_unit is not None:
            if not off and tz is None and cal in _CAL:
                # common fast path: one date_format, no trunc
                return F.date_format(col, _CAL[cal])
            start = F.date_trunc(trunc_unit, col)
        else:
            n = F.lit(secs).cast("long")
            start = F.timestamp_seconds(
                F.floor(F.unix_timestamp(col) / n).cast("long") * n
            )
        if off:
            start = start + F.expr(f"INTERVAL '{off}' SECOND")
        return F.date_format(start, out_fmt)

    return build, step_sql, parse_fmt, out_fmt

_METRICS = {
    "value_count": lambda c: F.count(c),
    "sum": lambda c: F.sum(c),
    "avg": lambda c: F.avg(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "cardinality": lambda c: F.countDistinct(c),
}

# ES default percents for a percentiles agg without explicit percents
_DEFAULT_PERCENTS = (1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0)

# multi-value metric kinds (struct / array results)
_MULTI_METRICS = (
    "stats",
    "extended_stats",
    "percentiles",
    "percentile_ranks",
    "weighted_avg",
    "boxplot",
    "geo_bounds",
    "geo_centroid",
    "geo_line",
    "matrix_stats",
)


def _metric_expr(kind: str, body: dict) -> Column:
    """One aggregate expression per metric agg (single- or
    multi-valued). Multi-valued metrics return a STRUCT (stats /
    extended_stats) or ARRAY in requested-percent order (percentiles
    — EXACT interpolated percentiles here; ES trades exactness for
    t-digest memory, same trade as cardinality vs HLL). Raises at
    plan time on a malformed body."""
    if kind in _METRICS:
        return _METRICS[kind](F.col(body["field"]))
    if kind == "weighted_avg":
        try:
            v = F.col(body["value"]["field"])
            w = F.col(body["weight"]["field"])
        except (KeyError, TypeError):
            raise ValueError(
                f"weighted_avg needs value.field and weight.field: {body}"
            )
        both = v.isNotNull() & w.isNotNull()
        return F.sum(F.when(both, v * w)) / F.sum(F.when(both, w))
    if kind == "rate":
        # per-unit rate inside a fixed-length date_histogram bucket:
        # (sum(field) | doc_count) * unit_seconds / bucket_seconds.
        # __interval_secs is injected by compile_aggs from the
        # ENCLOSING date_histogram (plan-time validated).
        unit = body.get("unit")
        if unit not in _RATE_UNITS:
            raise ValueError(
                f"rate: unit must be one of {sorted(_RATE_UNITS)}: "
                f"{unit!r}"
            )
        interval_secs = body["__interval_secs"]
        val = (
            F.sum(F.col(body["field"]))
            if "field" in body
            else F.count(F.lit(1))
        )
        return val.cast("double") * F.lit(
            _RATE_UNITS[unit] / float(interval_secs)
        )
    if kind == "matrix_stats":
        # per-field count/mean/variance + pairwise covariance and
        # Pearson correlation over docs that have EVERY field (ES
        # matrix_stats skips docs missing any field). Sample
        # (unbiased) variance/covariance, like ES. skewness/kurtosis
        # are not lowered (Spark's estimators are population-biased
        # where ES's are sample-corrected — a silent mismatch).
        fields = body.get("fields")
        if (
            not isinstance(fields, (list, tuple))
            or not 2 <= len(fields) <= 4
        ):
            raise ValueError(
                f"matrix_stats needs 2..4 fields: {body}"
            )
        import itertools

        allnn = functools.reduce(
            _op.and_, [F.col(f).isNotNull() for f in fields]
        )

        def _gated(f: str) -> Column:
            return F.when(allnn, F.col(f).cast("double"))

        parts = []
        for f in fields:
            cf = _gated(f)
            parts += [
                F.count(cf).alias(f"{f}_count"),
                F.avg(cf).alias(f"{f}_mean"),
                F.var_samp(cf).alias(f"{f}_variance"),
            ]
        for a, b in itertools.combinations(fields, 2):
            parts += [
                F.covar_samp(_gated(a), _gated(b)).alias(f"cov_{a}_{b}"),
                F.corr(_gated(a), _gated(b)).alias(f"corr_{a}_{b}"),
            ]
        return F.struct(*parts)
    if kind == "geo_bounds":
        # bounding box of a struct{lat, lon} geo column (planar,
        # per the repo's centi-degree convention — no dateline wrap)
        g = F.col(body["field"])
        return F.struct(
            F.max(g["lat"]).alias("top"),
            F.min(g["lat"]).alias("bottom"),
            F.min(g["lon"]).alias("left"),
            F.max(g["lon"]).alias("right"),
        )
    if kind == "geo_centroid":
        g = F.col(body["field"])
        return F.struct(
            F.avg(g["lat"]).alias("lat"),
            F.avg(g["lon"]).alias("lon"),
            F.count(g).alias("count"),
        )
    if kind == "geo_line":
        # ES geo_line (Kibana maps' track layer): the bucket's points
        # as an ordered path — sorted by the ``sort`` field, capped at
        # ``size`` (ES default 10000, max 10000). Result struct:
        # type="LineString" + points as "lon lat" strings (the WKT
        # coordinate reading of ES's GeoJSON output). sort_order
        # "desc" keeps the LAST size points in reverse track order,
        # like ES's include_sort + sort_order contract.
        g = body["field"]
        sort_spec = body.get("sort")
        if not isinstance(sort_spec, dict) or "field" not in sort_spec:
            raise ValueError(
                f"geo_line needs sort: {{field: ..}}: {body}"
            )
        order = body.get("sort_order", "asc")
        if order not in ("asc", "desc"):
            raise ValueError(f"geo_line: bad sort_order {order!r}")
        size = body.get("size", 10000)
        if not isinstance(size, int) or not 1 <= size <= 10000:
            raise ValueError(
                f"geo_line: size must be 1..10000: {size!r}"
            )
        pt = F.col(g)
        pts = F.collect_list(
            F.when(
                pt.isNotNull()
                & F.col(sort_spec["field"]).isNotNull(),
                F.struct(
                    F.col(sort_spec["field"]).alias("s"),
                    F.concat_ws(
                        " ",
                        pt["lon"].cast("string"),
                        pt["lat"].cast("string"),
                    ).alias("p"),
                ),
            )
        )
        # array_sort orders by the leading struct field (the sort
        # key); collect_list order never matters
        line = F.transform(F.array_sort(pts), lambda x: x["p"])
        if order == "desc":
            line = F.reverse(line)
        line = F.slice(line, 1, size)
        return F.struct(
            F.lit("LineString").alias("type"),
            line.alias("points"),
        )
    c = F.col(body["field"])
    if kind == "stats":
        return F.struct(
            F.count(c).alias("count"),
            F.min(c).alias("min"),
            F.max(c).alias("max"),
            F.avg(c).alias("avg"),
            F.sum(c).alias("sum"),
        )
    if kind == "extended_stats":
        # ES defaults: population variance / std deviation
        return F.struct(
            F.count(c).alias("count"),
            F.min(c).alias("min"),
            F.max(c).alias("max"),
            F.avg(c).alias("avg"),
            F.sum(c).alias("sum"),
            F.sum(c * c).alias("sum_of_squares"),
            F.var_pop(c).alias("variance"),
            F.stddev_pop(c).alias("std_deviation"),
        )
    if kind == "percentiles":
        percents = body.get("percents", list(_DEFAULT_PERCENTS))
        if not percents or not all(
            isinstance(p, (int, float)) and 0 <= p <= 100 for p in percents
        ):
            raise ValueError(f"percentiles: bad percents {percents!r}")
        fracs = F.array(*[F.lit(float(p) / 100.0) for p in percents])
        return F.percentile(c, fracs)
    if kind == "percentile_ranks":
        # EXACT percent-below-or-equal per requested value (ES
        # interpolates from t-digest — the same exactness trade as
        # percentiles); docs with a NULL field are excluded, like ES
        values = body.get("values")
        if not values or not all(
            isinstance(v, (int, float)) for v in values
        ):
            raise ValueError(
                f"percentile_ranks needs numeric values: {body}"
            )
        return F.array(
            *[
                F.lit(100.0)
                * F.sum(F.when(c <= F.lit(float(v)), 1).otherwise(0))
                / F.count(c)
                for v in values
            ]
        )
    if kind == "boxplot":
        # EXACT five-number summary (ES uses t-digest — the same
        # exactness trade as percentiles/cardinality)
        return F.struct(
            F.min(c).alias("min"),
            F.percentile(c, F.lit(0.25)).alias("q1"),
            F.percentile(c, F.lit(0.5)).alias("q2"),
            F.percentile(c, F.lit(0.75)).alias("q3"),
            F.max(c).alias("max"),
        )
    raise AssertionError(kind)

_PIPELINES = (
    "cumulative_sum",
    "derivative",
    "serial_diff",
    "moving_fn",
    "bucket_script",
    "bucket_selector",
    "bucket_sort",
)

# sibling pipeline aggs: aggregate a CHILD bucket agg's per-bucket
# values into one value on the parent's row (buckets_path "child>metric"
# or "child>_count")
_SIBLING_FNS = {
    "avg_bucket": F.avg,
    "sum_bucket": F.sum,
    "min_bucket": F.min,
    "max_bucket": F.max,
    "stats_bucket": lambda c: F.struct(
        F.count(c).alias("count"),
        F.min(c).alias("min"),
        F.max(c).alias("max"),
        F.avg(c).alias("avg"),
        F.sum(c).alias("sum"),
    ),
    # percents resolved from the body in the sibling pass
    "percentiles_bucket": None,
}

# bucket kinds that key on a single grouped expression
_KEYED = (
    "terms",
    "multi_terms",
    "rare_terms",
    "date_histogram",
    "histogram",
    "auto_date_histogram",
    "categorize_text",
    "geotile_grid",
    "geohash_grid",
    "time_series",
)

# rate-agg units (fixed-seconds; ES's month/quarter/year rates need
# calendar-length bucket math — rejected at plan time)
_RATE_UNITS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def _dh_fixed_secs(body: dict) -> int | None:
    """Seconds per bucket of a date_histogram with a FIXED-length
    interval (hour/day/week calendars or fixed_interval); None for
    variable-length calendars (month/quarter/year)."""
    cal = body.get("calendar_interval")
    if cal in ("hour", "day", "week"):
        return {"hour": 3600, "day": 86400, "week": 604800}[cal]
    if body.get("fixed_interval"):
        return _parse_duration_secs(
            body["fixed_interval"], "date_histogram fixed_interval"
        )
    return None
# bucket kinds whose ``size`` keeps the top-N by (doc_count desc, key)
_SIZED = (
    "terms",
    "multi_terms",
    "categorize_text",
    "geotile_grid",
    "geohash_grid",
    "time_series",
)
# the grid aggs page much wider by default than terms (ES: 10000 vs
# 10) — apply_es_default_sizes consults this
_DEFAULT_SIZES = {
    "geotile_grid": 10000,
    "geohash_grid": 10000,
    "time_series": 10000,
}

# geohash's base32 alphabet (no a/i/l/o)
_GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"

# auto_date_histogram interval ladder (hours) — ES's rounding ladder
# clipped to this corpus's hour..month span
_ADH_LADDER_H = (1, 3, 12, 24, 168, 720)
# bucket kinds that EXPLODE a doc into every matching bucket
_EXPLODING = (
    "range",
    "date_range",
    "ip_range",
    "geo_distance",
    "filters",
    "adjacency_matrix",
)
# bucket kinds that narrow the frame without adding a key column
_CONDITION = ("filter", "missing", "global", "nested")

# frame-restricting buckets with window/limit lowerings (not a
# predicate): sampler / diversified_sampler trim the doc set before
# sub-aggs; reverse_nested climbs back to parent docs inside a nested
# scope
_SAMPLERS = ("sampler", "diversified_sampler", "random_sampler")


def _identity_candidates(frame: DataFrame) -> list[str]:
    for cand in ("doc_id", "id", "event_id", "vec_id"):
        if cand in frame.columns:
            return [cand]
    return list(frame.columns)


def _apply_sampler(frame: DataFrame, kind: str, body: dict) -> DataFrame:
    """``sampler`` / ``diversified_sampler``: restrict the doc set to
    the first ``shard_size`` docs before sub-aggs run. ES samples the
    top-scoring (or arbitrary) docs per shard; the engine's
    DETERMINISTIC reading takes the first docs in document-identity
    order (override with the ``sort_by`` engine extension), so the
    sampled set — and every oracle over it — is stable across
    partitionings. ``diversified_sampler`` additionally caps docs per
    ``field`` value (``max_docs_per_value``, default 1) BEFORE the
    global cut.

    ``random_sampler`` instead keeps each doc with ``probability`` via
    a DETERMINISTIC multiplicative hash of the document identity (+
    ``seed``) — reproducible across engines and partitionings, unlike
    ES's per-shard RNG; sub-agg values are RAW sample statistics (the
    caller scales counts by 1/p; ES's technical-preview auto-scaling
    is a documented divergence). At 100 TB this is the cheap way to
    estimate corpus-wide quality distributions: the predicate is one
    codegen expression, no sort, no limit.

    Scale shape: TakeOrdered(shard_size) — no full sort; the diversity
    cap is one per-key window over the pre-cut frame."""
    body = body or {}
    if kind == "random_sampler":
        p = body.get("probability")
        if not isinstance(p, (int, float)) or not 0 < p <= 1:
            raise ValueError(
                f"random_sampler needs probability in (0, 1]: {body}"
            )
        seed = int(body.get("seed", 0))
        ids = _identity_candidates(frame)
        idc = F.col(f"`{ids[0]}`")
        from pyspark.sql import types as T

        if not isinstance(
            frame.schema[ids[0]].dataType,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
        ):
            idc = F.xxhash64(idc)
        # Knuth multiplicative hash over 2^32 — plain integer
        # arithmetic, identical in Spark and any SQL oracle
        h = F.pmod(
            idc * F.lit(2654435761) + F.lit(seed * 40503),
            F.lit(2**32),
        )
        return frame.filter(h < F.lit(int(float(p) * 2**32)))
    shard_size = int(body.get("shard_size", 100))
    order_by = body.get("sort_by")
    order_cols = [order_by] if order_by else _identity_candidates(frame)
    missing = [c for c in order_cols if c not in frame.columns]
    if missing:
        raise ValueError(f"{kind}: sort column {missing} not in frame")
    order = [F.col(f"`{c}`").asc() for c in order_cols]
    if kind == "diversified_sampler":
        from pyspark.sql import Window

        m = int(body.get("max_docs_per_value", 1))
        w = Window.partitionBy(body["field"]).orderBy(*order)
        frame = (
            frame.withColumn("__div_rn", F.row_number().over(w))
            .filter(F.col("__div_rn") <= m)
            .drop("__div_rn")
        )
    return frame.orderBy(*order).limit(shard_size)


def _range_label(r: dict) -> str:
    if "key" in r:
        return str(r["key"])
    lo, hi = r.get("from"), r.get("to")
    return f"{lo if lo is not None else '*'}-{hi if hi is not None else '*'}"


def _key_expr(kind: str, body: dict) -> Column:
    if kind == "multi_terms":
        terms = body.get("terms")
        if (
            not isinstance(terms, list)
            or len(terms) < 2
            or not all(isinstance(t, dict) and "field" in t for t in terms)
        ):
            raise ValueError(
                "multi_terms needs terms: [{field}, {field}, ...] "
                f"(>= 2 fields): {body}"
            )
        cols = [F.col(t["field"]) for t in terms]
        notnull = functools.reduce(
            _op.and_, [c.isNotNull() for c in cols]
        )
        # ES omits docs missing ANY of the fields; the bucket key is
        # the ES key_as_string reading ('|'-joined values)
        return F.when(
            notnull, F.concat_ws("|", *[c.cast("string") for c in cols])
        )
    if kind == "time_series":
        # ES 8.7 TSDB bucket: one bucket per time series (_tsid = the
        # dimension-field combination). ES reads the dimension set
        # from the index mapping's time_series_dimension fields; the
        # file-backed stand-in must be told via the body extension
        # ``dimensions`` (same contract as run_esql's ts_dimensions).
        # Docs missing ANY dimension have no _tsid, like TSDB.
        dims = body.get("dimensions")
        if not isinstance(dims, list) or not dims:
            raise ValueError(
                "time_series needs dimensions: [..] — ES reads these "
                "from the index mapping's time_series_dimension "
                "fields; a file-backed index must be told"
            )
        extra = set(body) - {"dimensions", "size"}
        if extra:
            raise ValueError(
                f"time_series: unsupported options {sorted(extra)}"
            )
        cols = [F.col(d) for d in dims]
        notnull = functools.reduce(
            _op.and_, [c.isNotNull() for c in cols]
        )
        return F.when(
            notnull, F.concat_ws("|", *[c.cast("string") for c in cols])
        )
    field = body["field"]
    if kind == "categorize_text":
        # ES categorize_text (log-pattern clustering), the engine's
        # DETERMINISTIC reading: the category key is the message's
        # token sequence with every digit-bearing token dropped — the
        # same first step ES's categorizer takes (numbers are what
        # varies between repeats of one log pattern). ES's
        # similarity-threshold category MERGING is not lowered; its
        # tuning params are rejected at plan time so nobody mistakes
        # this for it.
        extra = set(body) - {"field", "size"}
        if extra:
            raise ValueError(
                f"categorize_text: unsupported options {sorted(extra)} "
                "(similarity-based category merging is not lowered)"
            )
        toks = F.filter(
            F.split(F.col(field), r"\s+"),
            lambda t: (t != "") & ~t.rlike("[0-9]"),
        )
        key = F.array_join(toks, " ")
        return F.when(F.col(field).isNotNull() & (key != ""), key)
    if kind == "significant_terms":
        return F.col(field)
    if kind == "auto_date_histogram":
        # data-dependent interval: the key column is attached by
        # _auto_date_key on the shared frame, not a pure expression;
        # this call only validates the body at plan time
        buckets = body.get("buckets", 10)
        if not isinstance(buckets, int) or buckets < 1:
            raise ValueError(
                f"auto_date_histogram: bad buckets {buckets!r}"
            )
        return F.col(field)
    if kind == "geotile_grid":
        # Kibana maps' cluster layer: the "z/x/y" Web-Mercator tile
        # key (OSM slippy-map scheme). Unlike the PLANAR centi-degree
        # geo_distance convention, the grid aggs read the struct's
        # lat/lon as DEGREES — the projection math needs real
        # coordinates. Determinism note: the tile edge is an
        # irrational mercator point, so both engines compute the
        # identical double chain and a real coordinate cannot
        # straddle it; latitudes clamp to the Web-Mercator bound
        # like ES.
        z = body.get("precision", 7)
        if not isinstance(z, int) or not 0 <= z <= 29:
            raise ValueError(
                f"geotile_grid: precision must be 0..29: {z!r}"
            )
        pt = F.col(field)
        n = float(1 << z)
        latc = F.greatest(
            F.least(pt["lat"].cast("double"), F.lit(85.05112878)),
            F.lit(-85.05112878),
        )
        latr = F.radians(latc)
        x = F.floor(
            (pt["lon"].cast("double") + F.lit(180.0))
            / F.lit(360.0) * F.lit(n)
        )
        y = F.floor(
            (
                F.lit(1.0)
                - F.log(F.tan(latr) + F.lit(1.0) / F.cos(latr))
                / F.lit(math.pi)
            )
            / F.lit(2.0) * F.lit(n)
        )
        hi = F.lit(int(n) - 1)
        x = F.least(F.greatest(x, F.lit(0)), hi).cast("long")
        y = F.least(F.greatest(y, F.lit(0)), hi).cast("long")
        return F.when(
            pt.isNotNull(),
            F.concat_ws("/", F.lit(str(z)), x, y),
        )
    if kind == "geohash_grid":
        # classic geohash cell key: quantize lon/lat, interleave the
        # bits (lon first), base32-encode. Precision is the key
        # LENGTH (1..12 chars = 5 bits each); all integer arithmetic
        # after the one quantizing floor, so every engine buckets
        # identically. Field read as DEGREES (see geotile_grid note).
        p = body.get("precision", 5)
        if not isinstance(p, int) or not 1 <= p <= 12:
            raise ValueError(
                f"geohash_grid: precision must be 1..12: {p!r}"
            )
        pt = F.col(field)
        total = 5 * p
        lon_bits = (total + 1) // 2
        lat_bits = total // 2
        lonq = F.least(
            F.floor(
                (pt["lon"].cast("double") + F.lit(180.0))
                / F.lit(360.0) * F.lit(float(1 << lon_bits))
            ).cast("long"),
            F.lit((1 << lon_bits) - 1),
        )
        latq = F.least(
            F.floor(
                (pt["lat"].cast("double") + F.lit(90.0))
                / F.lit(180.0) * F.lit(float(1 << lat_bits))
            ).cast("long"),
            F.lit((1 << lat_bits) - 1),
        )
        # interleaved code, built bit-by-bit at PLAN time (p <= 12 ->
        # <= 60 codegen terms, still one projection)
        code = F.lit(0).cast("long")
        for k in range(lon_bits):
            bit = F.shiftright(lonq, lon_bits - 1 - k).bitwiseAND(
                F.lit(1)
            )
            code = code + F.shiftleft(bit, total - 1 - 2 * k)
        for k in range(lat_bits):
            bit = F.shiftright(latq, lat_bits - 1 - k).bitwiseAND(
                F.lit(1)
            )
            code = code + F.shiftleft(bit, total - 1 - (2 * k + 1))
        b32 = F.array(*[F.lit(c) for c in _GEOHASH_B32])
        chars = [
            F.element_at(
                b32,
                (
                    F.shiftright(code, 5 * (p - 1 - g)).bitwiseAND(
                        F.lit(31)
                    )
                    + F.lit(1)
                ).cast("int"),
            )
            for g in range(p)
        ]
        return F.when(pt.isNotNull(), F.concat(*chars))
    if kind == "terms":
        col = F.col(field)
        if "missing" in body:
            col = F.coalesce(col, F.lit(body["missing"]))
        # ES include/exclude: anchored regex (Lucene) or exact-value
        # lists; a key failing the gate becomes NULL -> no bucket
        inc, exc = body.get("include"), body.get("exclude")
        if inc is not None:
            keep = (
                col.cast("string").isin([str(v) for v in inc])
                if isinstance(inc, (list, tuple))
                else col.cast("string").rlike(f"^({inc})$")
            )
            col = F.when(keep, col)
        if exc is not None:
            drop = (
                col.cast("string").isin([str(v) for v in exc])
                if isinstance(exc, (list, tuple))
                else col.cast("string").rlike(f"^({exc})$")
            )
            col = F.when(~F.coalesce(drop, F.lit(False)), col)
        return col
    if kind == "date_histogram":
        build, _step, _parse, _fmt = _dh_lower(body)
        if "missing" in body:
            # ES missing: the stand-in substitutes the RAW value, so
            # it buckets like any real timestamp
            return build(
                F.coalesce(
                    F.col(field),
                    F.to_timestamp(F.lit(str(body["missing"]))),
                )
            )
        return build(field)
    if kind == "histogram":
        iv = body["interval"]
        if not isinstance(iv, (int, float)) or iv <= 0:
            raise ValueError(f"histogram: bad interval {iv!r}")
        off = body.get("offset", 0)
        src = F.col(field)
        if "missing" in body:
            src = F.coalesce(src, F.lit(float(body["missing"])))
        if not isinstance(off, (int, float)) or not 0 <= off < iv:
            raise ValueError(
                f"histogram: offset must be in [0, interval): {off!r}"
            )
        key = (
            F.floor((src - F.lit(off)) / F.lit(iv)) * F.lit(iv)
            + F.lit(off)
        )
        hb = body.get("hard_bounds")
        if hb is not None:
            # ES hard_bounds: buckets outside [min, max] are never
            # created — docs falling in clipped buckets are dropped
            try:
                lo, hi = float(hb["min"]), float(hb["max"])
            except (KeyError, TypeError):
                raise ValueError(
                    f"histogram hard_bounds needs min and max: {hb!r}"
                )
            key = F.when((key >= F.lit(lo)) & (key <= F.lit(hi)), key)
        return key
    if kind == "rare_terms":
        mdc = body.get("max_doc_count", 1)
        if not isinstance(mdc, int) or mdc < 1:
            raise ValueError(
                f"rare_terms: bad max_doc_count {mdc!r} (>= 1)"
            )
        return F.col(field)
    raise AssertionError(kind)


def _explode_labels(kind: str, body: dict) -> tuple[Column, list[str]]:
    """Array of matching bucket labels for a doc (empty -> no bucket)."""
    if kind in ("range", "date_range"):
        ranges = body.get("ranges")
        if not ranges:
            raise ValueError(f"{kind} agg needs ranges")
        field = body["field"]

        def _bound(v):
            # date_range compares in the field's (timestamp) domain
            return (
                F.to_timestamp(F.lit(str(v)))
                if kind == "date_range"
                else F.lit(v)
            )

        arms = []
        labels = []
        for r in ranges:
            lo, hi = r.get("from"), r.get("to")
            cond = F.col(field).isNotNull()
            if lo is not None:
                cond = cond & (F.col(field) >= _bound(lo))
            if hi is not None:
                cond = cond & (F.col(field) < _bound(hi))
            label = _range_label(r)
            labels.append(label)
            arms.append(F.when(cond, F.lit(label)))
        if len(set(labels)) != len(labels):
            raise ValueError(f"{kind}: duplicate bucket labels {labels}")
        return F.array_compact(F.array(*arms)), labels
    if kind == "ip_range":
        # IPv4 range buckets over an ip-string column — the client-IP
        # slicing every router-log dashboard runs (the reference's
        # gorouter access logs carry the client address). Ranges are
        # {from, to} dotted-quads (half-open, like range) or {mask:
        # "10.0.0.0/25"} CIDR blocks; a non-IPv4 / NULL value lands in
        # no bucket (same malformed-value rule as TO_IP / CIDR_MATCH
        # in the ES|QL layer). IPv6 is not lowered — fails loud.
        ranges = body.get("ranges")
        if not ranges:
            raise ValueError("ip_range agg needs ranges")
        field = body["field"]
        ipc = F.col(field)
        oct_ = F.split(ipc, r"\.")
        as_long = (
            F.element_at(oct_, 1).cast("long") * 16777216
            + F.element_at(oct_, 2).cast("long") * 65536
            + F.element_at(oct_, 3).cast("long") * 256
            + F.element_at(oct_, 4).cast("long")
        )
        valid = ipc.rlike(
            r"^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.)"
            r"{3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"
        )

        def _ip_long(s: str, what: str) -> int:
            parts = str(s).split(".")
            if len(parts) != 4 or not all(
                p.isdigit() and 0 <= int(p) <= 255 for p in parts
            ):
                raise ValueError(
                    f"ip_range: bad IPv4 {what} {s!r} "
                    "(IPv6 is not lowered)"
                )
            return (
                int(parts[0]) * 16777216 + int(parts[1]) * 65536
                + int(parts[2]) * 256 + int(parts[3])
            )

        arms = []
        labels = []
        for r in ranges:
            if "mask" in r:
                mask = str(r["mask"])
                if "/" not in mask:
                    raise ValueError(f"ip_range: bad mask {mask!r}")
                base, bits_s = mask.rsplit("/", 1)
                if not bits_s.isdigit() or not 0 <= int(bits_s) <= 32:
                    raise ValueError(f"ip_range: bad mask {mask!r}")
                bits = int(bits_s)
                span = 1 << (32 - bits)
                lo_l = (_ip_long(base, "mask base") // span) * span
                hi_l = lo_l + span  # exclusive
                label = r.get("key", mask)
            else:
                lo, hi = r.get("from"), r.get("to")
                lo_l = _ip_long(lo, "from") if lo is not None else None
                hi_l = _ip_long(hi, "to") if hi is not None else None
                label = r.get(
                    "key", f"{lo or '*'}-{hi or '*'}"
                )
            cond = F.coalesce(valid, F.lit(False))
            if lo_l is not None:
                cond = cond & (as_long >= F.lit(lo_l))
            if hi_l is not None:
                cond = cond & (as_long < F.lit(hi_l))
            labels.append(label)
            arms.append(F.when(cond, F.lit(label)))
        if len(set(labels)) != len(labels):
            raise ValueError(f"ip_range: duplicate bucket labels {labels}")
        return F.array_compact(F.array(*arms)), labels
    if kind == "geo_distance":
        # distance-banded range buckets from an origin point; the geo
        # field is the repo's {lat, lon} struct and distance is PLANAR
        # euclidean in the field's units (same centi-degree convention
        # and documented divergence as the geo_distance query — ES
        # measures geodesic meters)
        ranges = body.get("ranges")
        origin = body.get("origin")
        field = body.get("field")
        if not ranges or not field or not isinstance(origin, dict):
            raise ValueError(
                "geo_distance agg needs field, origin {lat, lon} and "
                f"ranges: {body}"
            )
        pt = F.col(field)
        dlat = pt["lat"] - F.lit(float(origin["lat"]))
        dlon = pt["lon"] - F.lit(float(origin["lon"]))
        dist = F.sqrt(dlat * dlat + dlon * dlon)
        arms = []
        labels = []
        for r in ranges:
            lo, hi = r.get("from"), r.get("to")
            cond = pt.isNotNull()
            if lo is not None:
                cond = cond & (dist >= F.lit(float(lo)))
            if hi is not None:
                cond = cond & (dist < F.lit(float(hi)))
            label = _range_label(r)
            labels.append(label)
            arms.append(F.when(cond, F.lit(label)))
        if len(set(labels)) != len(labels):
            raise ValueError(f"{kind}: duplicate bucket labels {labels}")
        return F.array_compact(F.array(*arms)), labels
    if kind == "adjacency_matrix":
        named = body.get("filters")
        if not isinstance(named, dict) or not named:
            raise ValueError(
                "adjacency_matrix needs {'filters': {name: query, ...}}"
            )
        from .querydsl import compile_query

        preds = {
            name: F.coalesce(compile_query(q_), F.lit(False))
            for name, q_ in named.items()
        }
        names = sorted(preds)  # ES: keys and pair keys in sorted order
        arms = []
        labels = []
        for i, a in enumerate(names):
            labels.append(a)
            arms.append(F.when(preds[a], F.lit(a)))
            for b in names[i + 1:]:
                label = f"{a}&{b}"
                labels.append(label)
                arms.append(F.when(preds[a] & preds[b], F.lit(label)))
        return F.array_compact(F.array(*arms)), labels
    if kind == "filters":
        named = body.get("filters")
        if not isinstance(named, dict) or not named:
            raise ValueError(
                "filters agg needs {'filters': {name: query, ...}}"
            )
        from .querydsl import compile_query

        preds = {
            name: F.coalesce(compile_query(query), F.lit(False))
            for name, query in named.items()
        }
        arms = [F.when(pred, F.lit(name)) for name, pred in preds.items()]
        labels = list(named)
        if body.get("other_bucket") or body.get("other_bucket_key"):
            # ES other_bucket: docs matching NO named filter land in
            # one extra bucket (default key "_other_")
            other = str(body.get("other_bucket_key", "_other_"))
            if other in labels:
                raise ValueError(
                    f"filters: other_bucket_key {other!r} collides "
                    "with a named filter"
                )
            none = ~functools.reduce(_op.or_, preds.values())
            arms.append(F.when(none, F.lit(other)))
            labels.append(other)
        return F.array_compact(F.array(*arms)), labels
    raise AssertionError(kind)


def _condition_expr(kind: str, body: dict) -> Column | None:
    if kind == "filter":
        from .querydsl import compile_query

        return F.coalesce(compile_query(body), F.lit(False))
    if kind == "missing":
        if not isinstance(body, dict) or set(body) != {"field"}:
            raise ValueError(f"missing agg needs {{'field': name}}: {body}")
        return F.col(body["field"]).isNull()
    return None  # global: frame reset, no predicate


def _auto_date_key(frame: DataFrame, name: str, body: dict) -> DataFrame:
    """Attach the auto_date_histogram bucket key: probe the observed
    [min, max] span against the interval ladder, pick the smallest
    interval yielding <= ``buckets`` FLOOR-ALIGNED buckets, bucket by
    integer floor-div on epoch seconds. The pick rides a single-row
    broadcast join — no driver round-trip, the corpus scans once
    extra for the min/max (map-side combined to one row)."""
    field = body["field"]
    target = int(body.get("buckets", 10))
    secs = F.expr(f"unix_millis(`{field}`) DIV 1000")
    stats = frame.agg(F.min(secs).alias("__t0"), F.max(secs).alias("__t1"))
    pick_expr = None
    for h in _ADH_LADDER_H:
        cond = (
            F.expr(f"__t1 DIV ({h} * 3600) - __t0 DIV ({h} * 3600)") + 1
            <= target
        )
        pick_expr = (
            F.when(cond, F.lit(h))
            if pick_expr is None
            else pick_expr.when(cond, F.lit(h))
        )
    pick = stats.select(
        pick_expr.otherwise(F.lit(_ADH_LADDER_H[-1])).alias("__adh_h")
    )
    out = frame.crossJoin(F.broadcast(pick))
    bucket_s = F.expr(
        f"(unix_millis(`{field}`) DIV 1000) DIV (__adh_h * 3600) "
        "* (__adh_h * 3600)"
    )
    return out.withColumn(
        name,
        F.date_format(
            F.timestamp_seconds(bucket_s), "yyyy-MM-dd HH:mm:ss"
        ),
    ).drop("__adh_h")


class _Level:
    """One bucket node of the tree (or the implicit root)."""

    def __init__(self, path: tuple, segments: list):
        self.path = path            # agg names, root -> this node
        self.segments = segments    # (role, name, kind, body) per path step
        self.metrics: list[tuple] = []    # (name, kind, body)
        self.pipelines: list[tuple] = []  # (name, kind, body), tree order
        self.top_hits: list[tuple] = []   # (name, body)
        self.siblings: list[tuple] = []   # (name, kind, body)
        self.top_metrics: list[tuple] = []  # (name, body)
        self.mads: list[tuple] = []         # (name, body)

    @property
    def keys(self) -> list[str]:
        return [s[1] for s in self.segments if s[0] in ("key", "explode")]

    @property
    def signature(self) -> tuple:
        return tuple(
            (s[0], s[1])
            for s in self.segments
            if s[0]
            in ("explode", "cond", "global", "nested", "sample", "revnested")
        )

    @property
    def own_segment(self):
        return self.segments[-1] if self.segments else None


def compile_aggs(aggs: dict) -> list[_Level]:
    """Walk the agg tree into per-bucket-level specs (see module
    docstring). Raises ValueError at plan time on unsupported
    constructs, name collisions, or pipeline aggs outside a
    histogram parent — ES's request validation, at plan time."""
    if not isinstance(aggs, dict) or not aggs:
        raise ValueError(f"aggs must be a non-empty dict: {aggs!r}")
    root = _Level((), [])
    levels = [root]
    seen_names: set[str] = set()

    def _claim(name: str) -> None:
        if name in seen_names:
            raise ValueError(f"duplicate agg name {name!r} in tree")
        seen_names.add(name)

    def _walk(tree: dict, level: _Level) -> None:
        if not isinstance(tree, dict) or not tree:
            raise ValueError(f"aggs must be a non-empty dict: {tree!r}")
        for name, spec in tree.items():
            if not isinstance(spec, dict):
                raise ValueError(f"agg {name!r} must be a dict: {spec!r}")
            sub = {k: v for k, v in spec.items() if k != "aggs"}
            if len(sub) != 1:
                raise ValueError(
                    f"agg {name!r} must have exactly one type: {spec}"
                )
            kind, body = next(iter(sub.items()))
            _claim(name)
            if kind in _METRICS or kind in _MULTI_METRICS:
                if "aggs" in spec:
                    raise ValueError(
                        f"metric agg {name!r} cannot nest sub-aggs"
                    )
                _metric_expr(kind, body)  # plan-time body validation
                level.metrics.append((name, kind, body))
            elif kind == "rate":
                own = level.own_segment
                secs = (
                    _dh_fixed_secs(own[3])
                    if own is not None
                    and own[0] == "key"
                    and own[2] == "date_histogram"
                    else None
                )
                if secs is None:
                    raise ValueError(
                        f"rate {name!r} requires an enclosing "
                        "date_histogram with a FIXED-length interval "
                        "(hour/day/week or fixed_interval)"
                    )
                body = {**(body or {}), "__interval_secs": secs}
                _metric_expr(kind, body)
                level.metrics.append((name, kind, body))
            elif kind == "median_absolute_deviation":
                if not isinstance(body, dict) or "field" not in body:
                    raise ValueError(
                        f"median_absolute_deviation {name!r} needs a "
                        f"field: {body}"
                    )
                level.mads.append((name, body))
            elif kind == "top_metrics":
                metrics = (body or {}).get("metrics")
                sort = (body or {}).get("sort")
                if int((body or {}).get("size", 1)) != 1:
                    raise ValueError(
                        f"top_metrics {name!r}: only size 1 is lowered "
                        "(flat columns; use top_hits for arrays)"
                    )
                metrics = (
                    [metrics] if isinstance(metrics, dict) else metrics
                )
                if not metrics or not sort or not all(
                    isinstance(mi, dict) and "field" in mi
                    for mi in metrics
                ):
                    raise ValueError(
                        f"top_metrics {name!r} needs metrics "
                        f"[{{field}}, ...] and sort: {body}"
                    )
                level.top_metrics.append(
                    (name, {**body, "metrics": metrics})
                )
            elif kind in _PIPELINES:
                if "aggs" in spec:
                    raise ValueError(
                        f"pipeline agg {name!r} cannot nest sub-aggs"
                    )
                own = level.own_segment
                needs_order = kind in (
                    "cumulative_sum",
                    "derivative",
                    "serial_diff",
                    "moving_fn",
                )
                if needs_order and (
                    own is None
                    or own[0] != "key"
                    or own[2] not in ("histogram", "date_histogram")
                ):
                    raise ValueError(
                        f"pipeline agg {name!r} requires a histogram/"
                        "date_histogram enclosing bucket (ES: sequential "
                        "buckets)"
                    )
                if kind in ("bucket_selector", "bucket_sort") and not level.keys:
                    raise ValueError(
                        f"{kind} {name!r} requires an enclosing bucket "
                        "with at least one key"
                    )
                level.pipelines.append((name, kind, body))
            elif kind in _SIBLING_FNS:
                if "aggs" in spec:
                    raise ValueError(
                        f"sibling pipeline {name!r} cannot nest sub-aggs"
                    )
                path = (body or {}).get("buckets_path")
                if not isinstance(path, str) or ">" not in path:
                    raise ValueError(
                        f"{kind} {name!r} needs buckets_path "
                        f"'child>metric': {body}"
                    )
                level.siblings.append((name, kind, body))
            elif kind == "top_hits":
                level.top_hits.append((name, body))
            elif kind in ("significant_terms", "significant_text"):
                if level.segments:
                    raise ValueError(
                        f"{kind} is only supported at the "
                        "top level (background = the pre-query frame)"
                    )
                if not isinstance(body, dict) or "field" not in body:
                    raise ValueError(
                        f"{kind} needs a field: {body}"
                    )
                child = _Level(
                    level.path + (name,),
                    level.segments + [("key", name, kind, body)],
                )
                levels.append(child)
                if spec.get("aggs"):
                    raise ValueError(
                        f"{kind} sub-aggs are not supported"
                    )
            elif kind in _SAMPLERS + ("reverse_nested",):
                if kind == "diversified_sampler" and not (
                    isinstance(body, dict) and body.get("field")
                ):
                    raise ValueError(
                        f"diversified_sampler needs a field: {body}"
                    )
                if kind == "random_sampler":
                    p = (body or {}).get("probability")
                    if not isinstance(p, (int, float)) or not 0 < p <= 1:
                        raise ValueError(
                            "random_sampler needs probability in "
                            f"(0, 1]: {body}"
                        )
                if kind == "reverse_nested":
                    if not any(
                        s[2] == "nested" for s in level.segments
                    ):
                        raise ValueError(
                            "reverse_nested is only allowed under a "
                            "nested agg"
                        )
                    extra = set(body or ()) - {"id_col"}
                    if extra:
                        raise ValueError(
                            "reverse_nested supports only the engine's "
                            f"id_col extension, got {sorted(extra)} "
                            "(partial-path climbs are not lowered)"
                        )
                role = "revnested" if kind == "reverse_nested" else "sample"
                child = _Level(
                    level.path + (name,),
                    level.segments + [(role, name, kind, body)],
                )
                levels.append(child)
                if spec.get("aggs"):
                    _walk(spec["aggs"], child)
            elif kind in _KEYED + _EXPLODING + _CONDITION:
                if kind == "global":
                    if level.segments:
                        raise ValueError(
                            "global agg is only allowed at the top level"
                        )
                    if body not in ({}, None):
                        raise ValueError(f"global takes an empty body: {body}")
                if kind == "auto_date_histogram" and any(
                    s[0] in ("key", "explode") for s in level.segments
                ):
                    # ES picks a per-parent-bucket interval when
                    # nested under another bucket; this lowering picks
                    # ONE interval from the (possibly filtered) frame
                    # — honest only when no bucket key splits it
                    raise ValueError(
                        "auto_date_histogram cannot nest under a "
                        "bucket key here (per-bucket interval picks "
                        "are not lowered); use filter/global parents "
                        "or a fixed date_histogram"
                    )
                if kind in _SIZED and (
                    int(body.get("shards", 1) or 1) != 1
                    or body.get("show_term_doc_count_error")
                ):
                    if kind != "terms":
                        raise ValueError(
                            "shards / show_term_doc_count_error apply "
                            f"to terms only: {name!r}"
                        )
                    if level.segments:
                        raise ValueError(
                            "terms shards / show_term_doc_count_error "
                            "are supported at the top level only"
                        )
                    if int(body.get("shards", 1) or 1) != 1:
                        if "size" not in body:
                            raise ValueError(
                                "sharded terms needs an explicit size"
                            )
                        if not body.get("shard_key"):
                            raise ValueError(
                                "sharded terms needs shard_key (the "
                                "column whose md5 assigns the "
                                "simulated shard)"
                            )
                        if spec.get("aggs"):
                            raise ValueError(
                                "sharded terms cannot nest sub-aggs "
                                "(shard-local top-K merge keeps no "
                                "per-bucket doc set)"
                            )
                role = (
                    "key"
                    if kind in _KEYED
                    else "explode"
                    if kind in _EXPLODING
                    else "cond"
                    if kind in ("filter", "missing")
                    else "nested"
                    if kind == "nested"
                    else "global"
                )
                # validate the bucket definition at plan time
                if role == "key":
                    _key_expr(kind, body)
                elif role == "explode":
                    _explode_labels(kind, body)
                elif role == "nested":
                    if (
                        not isinstance(body, dict)
                        or not isinstance(body.get("path"), str)
                        or "." in body["path"]
                    ):
                        raise ValueError(
                            "nested agg needs {'path': <top-level "
                            f"array<struct> column>}}: {body}"
                        )
                else:
                    _condition_expr(kind, body)
                child = _Level(
                    level.path + (name,),
                    level.segments + [(role, name, kind, body)],
                )
                levels.append(child)
                nested = spec.get("aggs")
                if nested:
                    _walk(nested, child)
            else:
                raise ValueError(f"unsupported bucket aggregation {kind!r}")

    _walk(aggs, root)
    if len(levels) == 1 and not (
        root.metrics or root.top_hits or root.top_metrics or root.mads
    ):
        raise ValueError("empty aggregation tree")
    return levels


# ---------------------------------------------------------------------------
# Pipeline-agg helpers (windows over the aggregated bucket frame)
# ---------------------------------------------------------------------------

_PARAM_RE = re.compile(r"params\.([A-Za-z_][A-Za-z0-9_]*)")
_SCRIPT_OK_RE = re.compile(r"^[\w\s\.\+\-\*/\(\):><=!&|,?]*$")


def _resolve_bucket_path(path: str, level: _Level, frame: DataFrame) -> str:
    if path == "_count":
        return "doc_count"
    if path in frame.columns and path not in level.keys:
        return path
    raise ValueError(
        f"buckets_path {path!r} must name a sibling metric or '_count'"
    )


def _compile_script(script: str, paths: dict, level: _Level, frame: DataFrame) -> Column:
    """Painless arithmetic subset -> Column: ``params.x`` placeholders
    substituted with resolved bucket columns, remainder parsed as a
    SQL expression (painless arithmetic/comparison syntax is SQL-
    compatible for this subset; anything else fails at plan time)."""
    if not isinstance(paths, dict) or not paths:
        raise ValueError(
            f"bucket_script/bucket_selector need buckets_path params: {paths}"
        )
    if not _SCRIPT_OK_RE.match(script or ""):
        raise ValueError(f"unsupported script {script!r}")
    resolved = {
        p: _resolve_bucket_path(ref, level, frame) for p, ref in paths.items()
    }

    def _sub(m: re.Match) -> str:
        p = m.group(1)
        if p not in resolved:
            raise ValueError(
                f"script references params.{p} missing from buckets_path"
            )
        return f"`{resolved[p]}`"

    return F.expr(_PARAM_RE.sub(_sub, script))


def _apply_pipelines(level: _Level, frame: DataFrame) -> DataFrame:
    """Compute this level's pipeline aggs as windows over its bucket
    frame; bucket_selector/bucket_sort FILTER the frame (descendant
    pruning happens in apply_aggs)."""
    if not level.pipelines:
        return frame
    own_key = level.keys[-1] if level.keys else None
    parent_keys = level.keys[:-1]
    w = Window.partitionBy(*parent_keys).orderBy(F.col(own_key).asc()) if own_key else None
    for name, kind, body in level.pipelines:
        if kind in ("cumulative_sum", "derivative", "serial_diff", "moving_fn"):
            src = F.col(
                _resolve_bucket_path(body["buckets_path"], level, frame)
            )
            if kind == "cumulative_sum":
                expr = F.sum(src).over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                )
            elif kind == "derivative":
                expr = src - F.lag(src).over(w)
            elif kind == "serial_diff":
                expr = src - F.lag(src, int(body.get("lag", 1))).over(w)
            else:  # moving_fn: trailing window EXCLUDING current (ES
                # default shift); MovingFunctions.unweightedAvg / max /
                # min / sum / stdDev (population, like ES)
                n = int(body["window"])
                if n <= 0:
                    raise ValueError(f"moving_fn: bad window {n}")
                script = body.get("script") or "unweightedAvg"
                fns = {
                    "unweightedAvg": F.avg,
                    "max": F.max,
                    "min": F.min,
                    "sum": F.sum,
                    "stdDev": F.stddev_pop,
                }
                picked = [k for k in fns if k in script]
                if len(picked) != 1:
                    raise ValueError(
                        "moving_fn: script must name exactly one of "
                        f"MovingFunctions.{sorted(fns)}, got {script!r}"
                    )
                expr = fns[picked[0]](src).over(w.rowsBetween(-n, -1))
            frame = frame.withColumn(name, expr)
        elif kind == "bucket_script":
            frame = frame.withColumn(
                name,
                _compile_script(
                    body.get("script"), body.get("buckets_path"), level, frame
                ),
            )
        elif kind == "bucket_selector":
            pred = _compile_script(
                body.get("script"), body.get("buckets_path"), level, frame
            )
            frame = frame.filter(F.coalesce(pred.cast("boolean"), F.lit(False)))
        else:  # bucket_sort
            sort = body.get("sort") or []
            size = body.get("size")
            if not sort or size is None:
                raise ValueError("bucket_sort needs sort and size")
            order = []
            for s in sort:
                (colname, spec), = s.items()
                direction = (
                    spec.get("order", "asc") if isinstance(spec, dict) else spec
                )
                c = _resolve_bucket_path(colname, level, frame)
                order.append(
                    F.col(c).desc() if direction == "desc" else F.col(c).asc()
                )
            if own_key:  # deterministic tiebreak inside ties
                order.append(F.col(own_key).asc())
            ws = Window.partitionBy(*parent_keys).orderBy(*order)
            frame = (
                frame.withColumn("__bs_rn", F.row_number().over(ws))
                .filter(F.col("__bs_rn") <= int(size))
                .drop("__bs_rn")
            )
    return frame


def _apply_top_hits(
    level: _Level, keyed_frame: DataFrame, bucket_frame: DataFrame
) -> DataFrame:
    """Attach per-bucket top-hit arrays: window over the keyed doc
    frame, collect the top ``size`` ``_source`` structs in sort order.
    The join keys are the (small) bucket frame's keys."""
    for name, body in level.top_hits:
        sort = body.get("sort")
        src = body.get("_source")
        size = int(body.get("size", 3))
        if not sort or not src:
            raise ValueError(
                f"top_hits {name!r} needs explicit sort and _source "
                "(no _score order in filter context)"
            )
        order = []
        for s in sort:
            (colname, spec), = s.items()
            direction = (
                spec.get("order", "asc") if isinstance(spec, dict) else spec
            )
            order.append(
                F.col(colname).desc()
                if direction == "desc"
                else F.col(colname).asc()
            )
        w = Window.partitionBy(*level.keys).orderBy(*order)
        hits = (
            keyed_frame.withColumn("__th_rn", F.row_number().over(w))
            .filter(F.col("__th_rn") <= size)
            .groupBy(*level.keys)
            .agg(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("__th_rn").alias("__rn"),
                            *[F.col(c).alias(c) for c in src],
                        )
                    )
                ).alias("__th")
            )
            .select(
                *level.keys,
                F.transform(
                    "__th", lambda h: h.dropFields("__rn")
                ).alias(name),
            )
        )
        bucket_frame = bucket_frame.join(hits, level.keys, "left")
    return bucket_frame


def _apply_top_metrics(
    lv: _Level, keyed_frame: DataFrame, bucket_frame: DataFrame
) -> DataFrame:
    """ES ``top_metrics`` (size 1): per bucket, the metric fields of
    the best document under the requested sort, as FLAT
    ``<agg>_<field>`` columns (the frame contract has no nested
    response). Ties on the sort keys break by the metric fields
    ascending, so the picked row is deterministic where ES's is not.

    Scale shape: one window over the keyed doc frame per agg,
    rn=1 filter, broadcast join onto the KB-scale bucket frame."""
    for name, body in lv.top_metrics:
        order = []
        for s in body["sort"]:
            (colname, spec), = s.items()
            direction = (
                spec.get("order", "asc") if isinstance(spec, dict) else spec
            )
            order.append(
                F.col(colname).desc()
                if direction == "desc"
                else F.col(colname).asc()
            )
        order += [F.col(mi["field"]).asc() for mi in body["metrics"]]
        outs = [
            F.col(mi["field"]).alias(f"{name}_{mi['field']}")
            for mi in body["metrics"]
        ]
        if lv.keys:
            w = Window.partitionBy(*lv.keys).orderBy(*order)
            side = (
                keyed_frame.withColumn("__tm_rn", F.row_number().over(w))
                .filter(F.col("__tm_rn") == 1)
                .select(*lv.keys, *outs)
            )
            bucket_frame = bucket_frame.join(
                F.broadcast(side), lv.keys, "left"
            )
        else:
            side = keyed_frame.orderBy(*order).limit(1).select(*outs)
            bucket_frame = bucket_frame.crossJoin(F.broadcast(side))
    return bucket_frame


def _apply_mads(
    lv: _Level, keyed_frame: DataFrame, bucket_frame: DataFrame
) -> DataFrame:
    """ES ``median_absolute_deviation``, EXACT: median(|x - median(x)|)
    per bucket (ES approximates with t-digest — the usual exactness
    trade).

    Scale shape: two bucket-keyed partial-agg passes over the keyed
    doc frame (median, then deviation median with the bucket medians
    broadcast back), result broadcast onto the bucket frame."""
    for name, body in lv.mads:
        c = F.col(body["field"])
        if lv.keys:
            med = keyed_frame.groupBy(*lv.keys).agg(
                F.percentile(c, F.lit(0.5)).alias("__med")
            )
            dev = (
                keyed_frame.join(F.broadcast(med), lv.keys)
                .groupBy(*lv.keys)
                .agg(
                    F.percentile(
                        F.abs(c - F.col("__med")), F.lit(0.5)
                    ).alias(name)
                )
            )
            bucket_frame = bucket_frame.join(
                F.broadcast(dev), lv.keys, "left"
            )
        else:
            med = keyed_frame.agg(
                F.percentile(c, F.lit(0.5)).alias("__med")
            )
            dev = (
                keyed_frame.crossJoin(F.broadcast(med))
                .agg(
                    F.percentile(
                        F.abs(c - F.col("__med")), F.lit(0.5)
                    ).alias(name)
                )
            )
            bucket_frame = bucket_frame.crossJoin(F.broadcast(dev))
    return bucket_frame


# ---------------------------------------------------------------------------
# Executor
# ---------------------------------------------------------------------------


def _gap_fill(lv: _Level, frame: DataFrame) -> DataFrame:
    """ES min_doc_count=0 for histogram / date_histogram: emit EMPTY
    buckets between each parent's observed min and max key
    (doc_count 0, additive metrics 0, avg/min/max NULL — the same
    fill rules as requested range buckets). Every date_histogram
    interval grids (calendar hour..year and fixed intervals; the grid
    steps in the key's local/shifted domain, so time_zone/offset
    requests gap-fill correctly too).

    Scale shape: the grid explodes from ONE min/max row per parent
    bucket of the ALREADY-AGGREGATED frame (KB-scale), then
    left-joins the buckets back — the corpus is never re-read."""
    seg = lv.own_segment
    kind, body = seg[2], seg[3]
    key = lv.keys[-1]
    parent_keys = lv.keys[:-1]
    if kind == "histogram":
        iv = float(body["interval"])
        off = float(body.get("offset", 0) or 0)
        lo, hi = F.min(F.col(key)), F.max(F.col(key))
        spans = (
            frame.groupBy(*parent_keys).agg(
                lo.alias("__lo"), hi.alias("__hi")
            )
            if parent_keys
            else frame.agg(lo.alias("__lo"), hi.alias("__hi"))
        )
        lo_c, hi_c = F.col("__lo"), F.col("__hi")
        eb = body.get("extended_bounds")
        if eb is not None:
            # ES extended_bounds: the min_doc_count=0 grid covers at
            # least [min, max] even where no docs landed (least/
            # greatest skip the NULLs of an empty span)
            lo_c = F.least(lo_c, F.lit(float(eb["min"])))
            hi_c = F.greatest(hi_c, F.lit(float(eb["max"])))
        grid = spans.select(
            *parent_keys,
            F.explode(
                F.sequence(
                    F.floor((lo_c - F.lit(off)) / F.lit(iv)).cast("long"),
                    F.floor((hi_c - F.lit(off)) / F.lit(iv)).cast("long"),
                )
            ).alias("__step"),
        ).select(
            *parent_keys,
            (F.col("__step") * F.lit(iv) + F.lit(off)).alias(key),
        )
    else:
        _build, step, parse_fmt, fmt = _dh_lower(body)

        def _p(expr: str) -> str:
            return (
                f"to_timestamp({expr}, '{parse_fmt}')"
                if parse_fmt
                else f"to_timestamp({expr})"
            )

        lo_expr, hi_expr = _p("__lo"), _p("__hi")
        eb = body.get("extended_bounds")
        if eb is not None:
            # bucket-aligned strings in the key's format (documented
            # contract; ES also accepts epoch millis)
            lo_expr = f"least({lo_expr}, {_p(repr(str(eb['min'])))})"
            hi_expr = f"greatest({hi_expr}, {_p(repr(str(eb['max'])))})"
        parse = f"{lo_expr}, {hi_expr}"
        spans = (
            frame.groupBy(*parent_keys).agg(
                F.min(F.col(key)).alias("__lo"),
                F.max(F.col(key)).alias("__hi"),
            )
            if parent_keys
            else frame.agg(
                F.min(F.col(key)).alias("__lo"),
                F.max(F.col(key)).alias("__hi"),
            )
        )
        grid = spans.select(
            *parent_keys,
            F.explode(
                F.expr(f"sequence({parse}, {step})")
            ).alias("__t"),
        ).select(
            *parent_keys, F.date_format("__t", fmt).alias(key)
        )
    out = grid.join(F.broadcast(frame), lv.keys, "left")
    out = out.withColumn(
        "doc_count", F.coalesce(F.col("doc_count"), F.lit(0).cast("long"))
    )
    for name, mkind, _b in lv.metrics:
        if mkind in ("value_count", "sum", "cardinality"):
            out = out.withColumn(
                name, F.coalesce(F.col(name), F.lit(0).cast("long"))
            )
    return out


def _zero_fill(
    level: _Level, frame: DataFrame, parent_frame: DataFrame | None
) -> DataFrame:
    """range/filters levels emit every REQUESTED bucket per parent
    bucket, zero-filled — ES reports empty ranges/filters explicitly.
    Additive metrics zero-fill; avg/min/max stay NULL, like ES."""
    seg = level.own_segment
    _, labels = _explode_labels(seg[2], seg[3])
    spark = frame.sparkSession
    label_df = spark.createDataFrame(
        [(l,) for l in labels], f"`{seg[1]}` string"
    )
    parent_keys = level.keys[:-1]
    if parent_keys:
        parents = parent_frame.select(*parent_keys).distinct()
        full = parents.crossJoin(F.broadcast(label_df))
    else:
        full = label_df
    # both sides are bucket frames; build the (small) aggregated side
    out = full.join(F.broadcast(frame), level.keys, "left")
    out = out.withColumn(
        "doc_count", F.coalesce(F.col("doc_count"), F.lit(0).cast("long"))
    )
    for name, kind, _ in level.metrics:
        if kind in ("value_count", "sum", "cardinality"):
            out = out.withColumn(
                name, F.coalesce(F.col(name), F.lit(0).cast("long"))
            )
    return out


def apply_aggs(
    df: DataFrame, aggs: dict, base_df: DataFrame | None = None
) -> DataFrame:
    """Execute an ES ``aggs`` tree with per-level bucket semantics;
    returns the flat multi-level frame described in the module
    docstring. ``base_df`` is the PRE-query frame a ``global`` bucket
    escapes to (defaults to ``df``)."""
    if (
        isinstance(aggs, dict)
        and len(aggs) == 1
        and isinstance(next(iter(aggs.values())), dict)
        and "composite" in next(iter(aggs.values()))
    ):
        (name, spec), = aggs.items()
        return _apply_composite(df, name, spec)
    if (
        isinstance(aggs, dict)
        and len(aggs) == 1
        and isinstance(next(iter(aggs.values())), dict)
        and "frequent_item_sets" in next(iter(aggs.values()))
    ):
        (name, spec), = aggs.items()
        return _apply_frequent_item_sets(df, name, spec)
    for spec in aggs.values() if isinstance(aggs, dict) else []:
        if isinstance(spec, dict) and "composite" in spec:
            raise ValueError(
                "composite must be the only top-level aggregation"
            )
        if isinstance(spec, dict) and "frequent_item_sets" in spec:
            raise ValueError(
                "frequent_item_sets must be the only top-level "
                "aggregation"
            )
    levels = compile_aggs(aggs)
    base = base_df if base_df is not None else df

    # --- group levels by frame signature; one aggregation per group ---
    groups: dict[tuple, list[_Level]] = {}
    sharded: list[_Level] = []
    sig_text: list[_Level] = []
    for lv in levels:
        if not lv.path and not (
            lv.metrics
            or lv.top_hits
            or lv.pipelines
            or lv.siblings
            or lv.top_metrics
            or lv.mads
        ):
            continue  # trivial root: nothing to report at the top level
        seg = lv.own_segment
        if (
            seg is not None
            and seg[0] == "key"
            and seg[2] == "terms"
            and int(seg[3].get("shards", 1) or 1) > 1
        ):
            sharded.append(lv)  # shard-simulated merge, own lowering
            continue
        if seg is not None and seg[2] == "significant_text":
            sig_text.append(lv)  # token-exploded fg/bg, own lowering
            continue
        groups.setdefault(lv.signature, []).append(lv)

    def _needs_post(lv: _Level) -> bool:
        seg = lv.own_segment
        return bool(
            lv.pipelines
            or lv.top_hits
            or lv.siblings
            or lv.top_metrics
            or lv.mads
            or (seg is not None and seg[2] == "rare_terms")
            or (
                seg is not None
                and seg[0] == "key"
                and seg[2] in _SIZED
                and int(seg[3].get("min_doc_count", 1) or 0) > 1
            )
            or (seg is not None and seg[0] == "explode")
            or (seg is not None and seg[2] == "significant_terms")
            or (
                seg is not None
                and seg[0] == "key"
                and seg[2] in ("histogram", "date_histogram")
                and seg[3].get("min_doc_count", 1) == 0
            )
            or (
                seg is not None
                and seg[0] == "key"
                and seg[2] in _SIZED
                and seg[3].get("size") is not None
            )
        )

    any_pruning = any(
        kind in ("bucket_selector", "bucket_sort")
        for lv in levels
        for _n, kind, _b in lv.pipelines
    ) or any(
        # bucket-dropping levels prune descendants too — a fused
        # descendant group would skip the surviving-ancestor semi-join:
        # size-capped / min_doc_count-filtered terms and rare_terms
        lv.own_segment is not None
        and lv.own_segment[0] == "key"
        and (
            (
                lv.own_segment[2] in _SIZED
                and (
                    lv.own_segment[3].get("size") is not None
                    or int(lv.own_segment[3].get("min_doc_count", 1) or 0)
                    > 1
                )
            )
            or lv.own_segment[2] == "rare_terms"
        )
        and any(o.path[:len(lv.path)] == lv.path and o.path != lv.path
                for o in levels)
        for lv in levels
    )
    # sibling pipelines consume a CHILD level's finished metric
    # columns — the fused view keeps only keys + doc_count, so any
    # sibling in the tree rules fusing out
    any_siblings = any(lv.siblings for lv in levels)

    bucket_frames: dict[tuple, DataFrame] = {}
    keyed_frames: dict[tuple, DataFrame] = {}
    fused_for: dict[tuple, DataFrame] = {}  # level path -> fused frame
    for signature, group in groups.items():
        # build the shared frame: apply filter/explode/global steps in
        # path order, then add every key column any level in the group
        # groups on (taken from the DEEPEST level's segment chain —
        # same signature => same chain prefix for frame steps)
        deepest = max(group, key=lambda l: len(l.segments))
        frame = base if signature and signature[0][0] == "global" else df
        key_exprs: dict[str, tuple] = {}  # name -> (kind, body)
        nested_path: str | None = None
        for role, name, kind, body in deepest.segments:
            if role == "cond":
                frame = frame.filter(_condition_expr(kind, body))
            elif role == "explode":
                arr, _ = _explode_labels(kind, body)
                frame = frame.withColumn(name, F.explode(arr))
            elif role == "sample":
                frame = _apply_sampler(frame, kind, body)
            elif role == "revnested":
                # ES reverse_nested: climb from the nested-doc scope
                # back to ONE ROW PER PARENT doc that still has a
                # matching nested doc — drop the element column, dedup
                # on the parent identity (doc_id/... or the body's
                # id_col engine extension). One exchange on the id.
                if nested_path is not None:
                    frame = frame.drop(nested_path)
                idc = (body or {}).get("id_col")
                ids = [idc] if idc else _identity_candidates(frame)
                missing = [c for c in ids if c not in frame.columns]
                if missing:
                    raise ValueError(
                        f"reverse_nested: id_col {missing} not in the "
                        "parent columns"
                    )
                frame = frame.dropDuplicates(ids)
            elif role == "nested":
                # ES nested agg: the doc set becomes the NESTED docs —
                # the array column explodes to its elements (docs
                # without nested docs contribute nothing) and sub-aggs
                # address members by dotted path, which struct access
                # resolves after the explode
                path = body["path"]
                nested_path = path
                frame = frame.select(
                    *[c for c in frame.columns if c != path],
                    F.explode(F.col(f"`{path}`")).alias(path),
                )
            elif role == "key":
                key_exprs[name] = (kind, body)
        # sibling levels in the same group may key on columns outside
        # the deepest chain — collect them too
        for lv in group:
            for role, name, kind, body in lv.segments:
                if role == "key" and name not in key_exprs:
                    key_exprs[name] = (kind, body)
        for name, (kind, body) in key_exprs.items():
            if kind == "auto_date_histogram":
                frame = _auto_date_key(frame, name, body)
            else:
                frame = frame.withColumn(name, _key_expr(kind, body))

        metric_exprs = []
        for lv in group:
            for name, kind, body in lv.metrics:
                metric_exprs.append(_metric_expr(kind, body).alias(name))
        doc_count = F.count(F.lit(1)).cast("long").alias("doc_count")

        if len(group) == 1:
            lv = group[0]
            agged = (
                frame.groupBy(*lv.keys).agg(doc_count, *metric_exprs)
                if lv.keys
                else frame.agg(doc_count, *metric_exprs)
            )
            agged = _drop_null_key_rows(lv, agged)
            bucket_frames[lv.path] = agged
            keyed_frames[lv.path] = frame
            continue

        all_keys = []
        for lv in group:
            for k in lv.keys:
                if k not in all_keys:
                    all_keys.append(k)
        sets, set_of = [], {}
        for lv in group:
            ks = tuple(sorted(lv.keys))
            if ks not in set_of:
                set_of[ks] = len(sets)
                sets.append([F.col(k) for k in lv.keys])
        agged = frame.groupingSets(
            sets, *[F.col(k) for k in all_keys]
        ).agg(F.grouping_id().alias("__gid"), doc_count, *metric_exprs)

        gids = {lv.path: _expected_gid(all_keys, lv.keys) for lv in group}
        fuse = (
            not any_pruning
            and not any_siblings
            and not any(_needs_post(lv) for lv in group)
            and len(set(gids.values())) == len(gids)
        )
        if fuse:
            # every level is a plain slice of the ONE aggregation:
            # derive agg_path / metric masking from grouping_id so the
            # whole group stays a single plan branch (one fact scan,
            # one shuffle) instead of a union of per-level filters
            keep = None
            path_case = None
            for lv in group:
                cond = F.col("__gid") == gids[lv.path]
                for role, name, kind, body in lv.segments:
                    if role == "key" and not (
                        kind == "terms" and "missing" in body
                    ):
                        cond = cond & F.col(name).isNotNull()
                keep = cond if keep is None else keep | cond
                tag = F.lit(">".join(lv.path))
                path_case = (
                    F.when(F.col("__gid") == gids[lv.path], tag)
                    if path_case is None
                    else path_case.when(F.col("__gid") == gids[lv.path], tag)
                )
            masked = []
            for lv in group:
                for name, _kind, _b in lv.metrics:
                    masked.append(
                        F.when(
                            F.col("__gid") == gids[lv.path], F.col(name)
                        ).alias(name)
                    )
            fused = agged.filter(keep).select(
                path_case.alias("agg_path"),
                *all_keys,
                "doc_count",
                *masked,
            )
            for lv in group:
                fused_for[lv.path] = fused
                keyed_frames[lv.path] = frame
            continue

        # per-level branches over the SHARED aggregation: cut the
        # lineage so the fact scan runs once, not once per level (the
        # bucket frame is KB-scale at any corpus size)
        agged = agged.localCheckpoint(eager=False)
        for lv in group:
            mine = agged.filter(F.col("__gid") == gids[lv.path]).drop("__gid")
            mine = _drop_null_key_rows(lv, mine)
            mine = mine.select(
                *lv.keys,
                "doc_count",
                *[m[0] for m in lv.metrics],
            )
            bucket_frames[lv.path] = mine
            keyed_frames[lv.path] = frame

    for lv in sharded:
        # top-level sharded terms (plan-time enforced): attach the key
        # to the query frame, run the shard-simulated merge
        seg = lv.own_segment
        frame = df.withColumn(seg[1], _key_expr("terms", seg[3]))
        bucket_frames[lv.path] = _terms_sharded(lv, frame)
        keyed_frames[lv.path] = frame

    for lv in sig_text:
        seg = lv.own_segment
        bucket_frames[lv.path] = _significant_text_frame(
            df, base, seg[1], seg[3]
        )
        keyed_frames[lv.path] = df

    # --- per-level post passes, parents before children ---
    pruned_ancestor: dict[tuple, tuple] = {}  # path -> nearest pruned path
    final: dict[tuple, DataFrame] = {}
    for lv in sorted(levels, key=lambda l: len(l.path)):
        if lv.path in fused_for:
            # no post passes by construction; keep a per-level view for
            # descendants that need this level's bucket keys
            final[lv.path] = (
                fused_for[lv.path]
                .filter(F.col("agg_path") == ">".join(lv.path))
                .select(*lv.keys, "doc_count")
            )
            continue
        if lv.path not in bucket_frames:
            continue  # trivial root
        bf = bucket_frames[lv.path]
        keyed_frame = keyed_frames[lv.path]
        seg = lv.own_segment
        if seg is not None and seg[0] == "explode":
            # range/date_range/filters report every REQUESTED bucket
            # (zero-filled); adjacency_matrix OMITS empty
            # intersections, like ES
            if seg[2] != "adjacency_matrix":
                parent = final.get(lv.path[:-1])
                bf = _zero_fill(lv, bf, parent)
        # terms size: top-N per parent. Default order (doc_count desc,
        # key asc) — ES's default with a deterministic tiebreak; an
        # explicit ``order`` may instead reference ``_key``,
        # ``_count``, or a SIBLING METRIC of the same level (ES's
        # order-by-sub-aggregation)
        if (
            seg is not None
            and seg[0] == "key"
            and seg[2] in _SIZED
            and int(seg[3].get("min_doc_count", 1) or 0) > 1
        ):
            # ES terms min_doc_count: buckets below the floor are
            # dropped BEFORE the size cut
            bf = bf.filter(
                F.col("doc_count")
                >= F.lit(int(seg[3]["min_doc_count"]))
            )
        if seg is not None and seg[0] == "key" and seg[2] == "rare_terms":
            # ES rare_terms: buckets with doc_count <= max_doc_count,
            # long-tail first (doc_count asc, key asc)
            bf = bf.filter(
                F.col("doc_count")
                <= F.lit(int(seg[3].get("max_doc_count", 1)))
            )
        if seg is not None and seg[0] == "key" and seg[2] in _SIZED:
            size = seg[3].get("size")
            if size is not None:
                order = seg[3].get("order")
                key_col = lv.keys[-1]
                if order is None:
                    sort_cols = [F.col("doc_count").desc()]
                else:
                    if not isinstance(order, dict) or len(order) != 1:
                        raise ValueError(
                            f"terms order must be one {{ref: dir}}: {order}"
                        )
                    (ref, direction), = order.items()
                    if direction not in ("asc", "desc"):
                        raise ValueError(
                            f"terms order: bad direction {direction!r}"
                        )
                    if ref == "_key":
                        col = F.col(key_col)
                    elif ref == "_count":
                        col = F.col("doc_count")
                    elif ref in [m[0] for m in lv.metrics]:
                        col = F.col(ref)
                    else:
                        raise ValueError(
                            f"terms order ref {ref!r} must be _key, "
                            "_count, or a metric of this bucket"
                        )
                    sort_cols = [
                        col.asc() if direction == "asc" else col.desc()
                    ]
                wk = Window.partitionBy(*lv.keys[:-1]).orderBy(
                    *sort_cols, F.col(key_col).asc()
                )
                bf = (
                    bf.withColumn("__tn", F.row_number().over(wk))
                    .filter(F.col("__tn") <= int(size))
                    .drop("__tn")
                )
        if (
            seg is not None
            and seg[0] == "key"
            and seg[2] == "terms"
            and seg[3].get("show_term_doc_count_error")
            and "doc_count_error_upper_bound" not in bf.columns
        ):
            # one (simulated) shard: counts are exact, the bound is 0
            # — exactly what single-shard ES reports
            bf = bf.withColumn(
                "doc_count_error_upper_bound", F.lit(0).cast("long")
            )
        if (
            seg is not None
            and seg[0] == "key"
            and seg[2] in ("histogram", "date_histogram")
            and seg[3].get("min_doc_count", 1) == 0
        ):
            bf = _gap_fill(lv, bf)
        if seg is not None and seg[2] == "significant_terms":
            bf = _significant_terms(lv, bf, base)
        bf = _apply_pipelines(lv, bf)
        if lv.top_hits:
            bf = _apply_top_hits(lv, keyed_frame, bf)
        if lv.top_metrics:
            bf = _apply_top_metrics(lv, keyed_frame, bf)
        if lv.mads:
            bf = _apply_mads(lv, keyed_frame, bf)
        # prune to surviving ancestor buckets (bucket_selector/sort)
        anc = pruned_ancestor.get(lv.path[:-1])
        if anc is not None and lv.path != anc:
            anc_keys = [
                l for l in levels if l.path == anc
            ][0].keys
            bf = bf.join(
                F.broadcast(final[anc].select(*anc_keys).distinct()),
                anc_keys,
                "left_semi",
            )
        final[lv.path] = bf
        prunes = any(
            k in ("bucket_selector", "bucket_sort")
            for _, k, _b in lv.pipelines
        ) or (
            # a bucket-dropping level (size-capped or min_doc_count-
            # floored terms, rare_terms) forces descendant levels to
            # keep only rows under SURVIVING buckets (ES reports
            # sub-aggs only inside kept buckets)
            seg is not None
            and seg[0] == "key"
            and (
                (
                    seg[2] in _SIZED
                    and (
                        seg[3].get("size") is not None
                        or int(seg[3].get("min_doc_count", 1) or 0) > 1
                    )
                )
                or seg[2] == "rare_terms"
            )
        )
        if prunes:
            pruned_ancestor[lv.path] = lv.path
        elif anc is not None:
            pruned_ancestor[lv.path] = anc

    # --- sibling pipeline pass: aggregate a CHILD level's finished
    # buckets onto the parent's rows (runs after every level is final
    # so child-side pruning/selectors are respected, like ES) ---
    for lv in levels:
        if not lv.siblings or lv.path not in final:
            continue
        parent_bf = final[lv.path]
        for name, kind, body in lv.siblings:
            child_name, _, ref = body["buckets_path"].partition(">")
            child_path = lv.path + (child_name,)
            child_lv = next(
                (l for l in levels if l.path == child_path), None
            )
            if child_lv is None:
                raise ValueError(
                    f"{kind} {name!r}: buckets_path child "
                    f"{child_name!r} is not a bucket agg at this level"
                )
            child_bf = final[child_path]
            col = "doc_count" if ref == "_count" else ref
            if col not in child_bf.columns:
                raise ValueError(
                    f"{kind} {name!r}: buckets_path metric {ref!r} "
                    f"not produced by {child_name!r}"
                )
            if kind == "percentiles_bucket":
                percents = body.get("percents", list(_DEFAULT_PERCENTS))
                if not percents or not all(
                    isinstance(x, (int, float)) and 0 <= x <= 100
                    for x in percents
                ):
                    raise ValueError(
                        f"percentiles_bucket: bad percents {percents!r}"
                    )
                agg_expr = F.percentile(
                    F.col(col),
                    F.array(*[F.lit(float(x) / 100.0) for x in percents]),
                ).alias(name)
            else:
                agg_expr = _SIBLING_FNS[kind](F.col(col)).alias(name)
            if lv.keys:
                side = child_bf.groupBy(*lv.keys).agg(agg_expr)
                parent_bf = parent_bf.join(
                    F.broadcast(side), lv.keys, "left"
                )
            else:
                # root-level sibling: one scalar row joined crosswise
                side = child_bf.agg(agg_expr)
                parent_bf = parent_bf.crossJoin(F.broadcast(side))
        final[lv.path] = parent_bf

    # --- union the levels into the flat result frame ---
    out_levels = [lv for lv in levels if lv.path in final]
    canonical: list[str] = ["agg_path"]
    for lv in out_levels:  # key columns in tree order
        for k in lv.keys:
            if k not in canonical:
                canonical.append(k)
    canonical.append("doc_count")
    for lv in out_levels:
        for name, _kind, _b in lv.metrics:
            canonical.append(name)
        for name, kind, _b in lv.pipelines:
            if kind not in ("bucket_selector", "bucket_sort"):
                canonical.append(name)
        for name, _kind, _b in lv.siblings:
            canonical.append(name)
        seg = lv.own_segment
        if seg is not None and seg[2] in (
            "significant_terms",
            "significant_text",
        ):
            canonical.extend(["bg_count", "score"])
        if (
            seg is not None
            and seg[2] == "terms"
            and seg[3].get("show_term_doc_count_error")
        ):
            canonical.append("doc_count_error_upper_bound")
        for name, _b in lv.top_hits:
            canonical.append(name)
        for name, _b in lv.mads:
            canonical.append(name)
        for name, body in lv.top_metrics:
            for mi in body["metrics"]:
                canonical.append(f"{name}_{mi['field']}")

    result = None
    emitted_fused: set[int] = set()
    for lv in out_levels:
        if lv.path in fused_for:
            fused = fused_for[lv.path]
            if id(fused) in emitted_fused:
                continue
            emitted_fused.add(id(fused))
            part = fused
        else:
            part = final[lv.path].withColumn(
                "agg_path", F.lit(">".join(lv.path))
            )
        result = (
            part
            if result is None
            else result.unionByName(part, allowMissingColumns=True)
        )
    present = [c for c in canonical if c in result.columns]
    return result.select(*present)


def apply_es_default_sizes(aggs: dict) -> dict:
    """ES's interactive default: a terms / multi_terms aggregation
    WITHOUT ``size`` returns the top 10 buckets. The analytics API
    (apply_aggs) keeps the return-every-bucket reading; the request-
    body interpreter (querydsl.run_search_body) routes through this
    rewrite so a literal ES request paginates exactly like ES.
    Composite trees are untouched (their size contract is their
    own)."""
    out = {}
    for name, spec in aggs.items():
        if not isinstance(spec, dict):
            out[name] = spec
            continue
        spec = dict(spec)
        for kind in _SIZED:
            if (
                kind in spec
                and isinstance(spec[kind], dict)
                and "size" not in spec[kind]
            ):
                spec[kind] = {
                    **spec[kind],
                    "size": _DEFAULT_SIZES.get(kind, 10),
                }
        if isinstance(spec.get("aggs"), dict):
            spec["aggs"] = apply_es_default_sizes(spec["aggs"])
        out[name] = spec
    return out


def _terms_sharded(lv: _Level, frame: DataFrame) -> DataFrame:
    """ES terms aggregation with SIMULATED shards — body extensions
    ``shards`` (count) and ``shard_key`` (the column whose md5
    assigns the shard), the engine's stand-ins for an index's shard
    layout, which a lake has no physical analogue of. Each shard
    contributes its local top ``shard_size`` terms (ES default
    ``size*1.5+10``), the coordinator sums the RETURNED counts —
    possibly undercounting, exactly like real ES — and
    ``show_term_doc_count_error`` surfaces ES's per-bucket
    ``doc_count_error_upper_bound``: a term absent from a shard's
    list is charged that shard's smallest returned count (0 when the
    shard returned every term it had). Deterministic where real ES is
    not (md5 buckets, term tiebreaks). Standalone twin:
    plans/esaggstail.terms_shard_error_bounds.

    Scale shape: the data-sized work is ONE partial-aggregated
    exchange to (shard, term) counts; the per-shard top-K window runs
    on the count frame and everything after — thresholds, coverage
    join, final top-N — is shard_size x shards rows."""
    seg = lv.own_segment
    body = seg[3]
    key = lv.keys[-1]
    shards = int(body["shards"])
    size = int(body["size"])
    shard_size = int(body.get("shard_size", size * 1.5 + 10))
    shard = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("sh:"),
                        F.col(body["shard_key"]).cast("string"),
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % shards
    )
    pc = (
        frame.filter(F.col(key).isNotNull())
        .groupBy(shard.alias("__shard"), F.col(key))
        .agg(F.count(F.lit(1)).cast("long").alias("__cnt"))
    )
    ws = Window.partitionBy("__shard")
    wr = Window.partitionBy("__shard").orderBy(
        F.col("__cnt").desc(), F.col(key).asc()
    )
    kept = pc.select(
        "*",
        F.row_number().over(wr).alias("__rn"),
        F.count(F.lit(1)).over(ws).alias("__nterms"),
    ).where(F.col("__rn") <= shard_size)
    thr = kept.groupBy("__shard").agg(
        F.when(F.max("__nterms") > shard_size, F.min("__cnt"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("__thr")
    )
    tot = thr.agg(F.sum("__thr").cast("long").alias("__total_thr"))
    merged = (
        kept.join(F.broadcast(thr), "__shard")
        .groupBy(key)
        .agg(
            F.sum("__cnt").cast("long").alias("doc_count"),
            F.sum("__thr").cast("long").alias("__covered"),
        )
    )
    out = merged.crossJoin(F.broadcast(tot)).select(
        key,
        "doc_count",
        (F.col("__total_thr") - F.col("__covered"))
        .cast("long")
        .alias("doc_count_error_upper_bound"),
    )
    if not body.get("show_term_doc_count_error"):
        out = out.drop("doc_count_error_upper_bound")
    return out.orderBy(
        F.col("doc_count").desc(), F.col(key).asc()
    ).limit(size)


def _significant_text_frame(
    df: DataFrame, base: DataFrame, name: str, body: dict
) -> DataFrame:
    """ES ``significant_text``: the significant_terms machinery over
    the ANALYZED TOKENS of a free-text field — foreground = the
    query-filtered frame, background = the pre-query frame, doc
    frequencies count DOCUMENTS containing a token (array_distinct
    before the explode), JLH score, only terms MORE frequent in the
    foreground, top ``size`` by score.

    Scale shape: both sides are one explode + vocabulary-sized
    groupBy; totals ride single-row broadcast frames; the corpus
    never shuffles documents. (ES samples shard-local candidates —
    this is the exact reading, the same trade as significant_terms.)"""
    from .querydsl import _tokens

    field = body["field"]
    col = F.col(field)

    def _docfreq(frame: DataFrame, out: str) -> DataFrame:
        return (
            frame.select(
                F.explode(F.array_distinct(_tokens(col))).alias(name)
            )
            .groupBy(name)
            .agg(F.count(F.lit(1)).cast("long").alias(out))
        )

    has = F.coalesce(F.size(_tokens(col)) > 0, F.lit(False))
    fg = _docfreq(df, "doc_count")
    bg = _docfreq(base, "bg_count")
    fg_total = df.agg(F.sum(has.cast("long")).alias("__fg_total"))
    bg_total = base.agg(F.sum(has.cast("long")).alias("__bg_total"))
    out = (
        fg.join(F.broadcast(bg), name, "left")
        .crossJoin(F.broadcast(fg_total))
        .crossJoin(F.broadcast(bg_total))
    )
    fg_rate = F.col("doc_count") / F.col("__fg_total")
    bg_rate = F.col("bg_count") / F.col("__bg_total")
    out = (
        out.withColumn("score", (fg_rate - bg_rate) * (fg_rate / bg_rate))
        .filter(fg_rate > bg_rate)
        .drop("__fg_total", "__bg_total")
    )
    size = body.get("size")
    if size is not None:
        out = out.orderBy(
            F.col("score").desc(), F.col(name).asc()
        ).limit(int(size))
    return out


def _significant_terms(
    lv: _Level, bf: DataFrame, base: DataFrame
) -> DataFrame:
    """ES ``significant_terms`` with the JLH score, EXACT: foreground
    frequencies from this level's (query-filtered) buckets, background
    frequencies from the pre-query frame; terms kept only when more
    frequent in the foreground (ES's significance gate), top ``size``
    by score. Rates are computed among docs that HAVE the field.

    Scale shape: both sides are vocabulary-sized aggregates; the
    background counts broadcast-join onto the foreground buckets and
    the two totals ride single-row broadcast frames — the corpus
    scans twice (fg + bg) and never shuffles."""
    seg = lv.own_segment
    body = seg[3]
    field = body["field"]
    key = lv.keys[-1]
    bg = base.filter(F.col(field).isNotNull())
    bg_counts = bg.groupBy(F.col(field).alias(key)).agg(
        F.count(F.lit(1)).cast("long").alias("bg_count")
    )
    bg_total = bg.agg(
        F.count(F.lit(1)).cast("long").alias("__bg_total")
    )
    fg_total = bf.agg(
        F.sum("doc_count").cast("long").alias("__fg_total")
    )
    out = (
        bf.join(F.broadcast(bg_counts), key, "left")
        .crossJoin(F.broadcast(bg_total))
        .crossJoin(F.broadcast(fg_total))
    )
    fg_rate = F.col("doc_count") / F.col("__fg_total")
    bg_rate = F.col("bg_count") / F.col("__bg_total")
    out = (
        out.withColumn(
            "score", (fg_rate - bg_rate) * (fg_rate / bg_rate)
        )
        .filter(fg_rate > bg_rate)
        .drop("__bg_total", "__fg_total")
    )
    size = body.get("size")
    if size is not None:
        out = out.orderBy(
            F.col("score").desc(), F.col(key).asc()
        ).limit(int(size))
    return out


def _apply_frequent_item_sets(
    df: DataFrame, name: str, spec: dict
) -> DataFrame:
    """ES ``frequent_item_sets`` (8.4, the ML co-occurrence miner) —
    the DETERMINISTIC EXACT reading: frequent PAIRS of field values.
    ES mines arbitrary-size sets approximately (Eclat over a doc
    sample); this engine computes the size-2 layer exactly —
    reproducible across engines and partitionings — and rejects
    ``minimum_set_size > 2`` loudly (the combinatorial layers ES
    itself only approximates are not imitated). Items are
    ``field=value``; a doc contributes one item per non-null listed
    field; buckets report the sorted pair key, ``doc_count`` and
    ``support`` (doc_count / total docs), top ``size`` by doc_count
    (pair-key tiebreak).

    Scale shape: pairs are generated IN-ROW by a combination HOF
    over the (tiny) per-doc item array — no self-join, no doc-id
    shuffle; then explode -> ONE partial-agg shuffle on the pair key
    + TakeOrdered(size). The total-doc count is a single broadcast
    row."""
    body = spec["frequent_item_sets"]
    fields = body.get("fields")
    if not isinstance(fields, list) or not fields or not all(
        isinstance(f, dict) and "field" in f for f in fields
    ):
        raise ValueError(
            "frequent_item_sets needs fields: [{field}, ...]: "
            f"{body}"
        )
    if len(fields) < 2:
        raise ValueError(
            "frequent_item_sets needs >= 2 fields for a pair layer"
        )
    mss = body.get("minimum_set_size", 2)
    if mss not in (1, 2):
        raise ValueError(
            "frequent_item_sets: only the exact size-2 (pair) layer "
            f"is lowered; minimum_set_size {mss} is not (ES itself "
            "approximates larger sets by sampling)"
        )
    support = float(body.get("minimum_support", 0.1))
    if not 0.0 < support <= 1.0:
        raise ValueError(
            f"frequent_item_sets: minimum_support in (0, 1]: {support}"
        )
    size = int(body.get("size", 10))
    if spec.get("aggs"):
        raise ValueError(
            "frequent_item_sets takes no sub-aggregations"
        )
    items = F.array_compact(
        F.array(
            *[
                F.when(
                    F.col(f["field"]).isNotNull(),
                    F.concat_ws(
                        "=",
                        F.lit(f["field"]),
                        F.col(f["field"]).cast("string"),
                    ),
                )
                for f in fields
            ]
        )
    )
    # in-row pair combinations (i < j), key sorted for a canonical
    # bucket identity
    pairs = F.flatten(
        F.transform(
            items,
            lambda x, i: F.transform(
                F.slice(
                    items, i + 2, F.greatest(F.size(items), F.lit(1))
                ),
                lambda y: F.array_join(F.array_sort(F.array(x, y)), ","),
            ),
        )
    )
    total = df.count()  # one job; the support floor needs it
    floor = max(1, -(-support * total // 1))  # ceil
    out = (
        df.select(F.explode(pairs).alias(name))
        .groupBy(name)
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .filter(F.col("doc_count") >= F.lit(int(floor)))
        .withColumn(
            "support",
            F.col("doc_count").cast("double") / F.lit(float(total)),
        )
        .orderBy(F.col("doc_count").desc(), F.col(name).asc())
        .limit(size)
    )
    return out.select(
        F.lit(name).alias("agg_path"), name, "doc_count", "support"
    )


def _apply_composite(df: DataFrame, name: str, spec: dict) -> DataFrame:
    """ES ``composite`` aggregation — THE scalable pagination bucket:
    multi-source keys ordered as a tuple, resumed with ``after``,
    capped by ``size``. Sources are terms / histogram /
    date_histogram / geotile_grid, each with an optional per-source ``order``
    (default asc); sub-aggs are metric leaves. ES requires composite
    to be the only non-metric agg in the request — enforced by the
    caller.

    Lowering: ONE groupBy over all source key expressions (a single
    partial-aggregated shuffle) + the ``after`` tuple predicate
    (pushed BELOW the aggregation onto the key expressions, so a
    resumed page scans past pages' groups but never re-aggregates
    them... the predicate is on the group keys, so Catalyst applies
    it pre-shuffle) + TakeOrdered(size) in key order. NULL source
    keys are omitted (composite requires doc_values, missing docs
    produce no bucket) unless the source sets missing_bucket.
    """
    body = spec["composite"]
    sources = body.get("sources")
    if not isinstance(sources, list) or not sources:
        raise ValueError(f"composite needs a sources list: {body}")
    names: list[str] = []
    exprs: dict[str, Column] = {}
    orders: dict[str, str] = {}
    missing_ok: dict[str, bool] = {}
    for src in sources:
        if not isinstance(src, dict) or len(src) != 1:
            raise ValueError(f"composite source must be {{name: spec}}: {src}")
        (sname, sspec), = src.items()
        if not isinstance(sspec, dict) or len(sspec) != 1:
            raise ValueError(
                f"composite source {sname!r} must have one type: {sspec}"
            )
        (kind, kbody), = sspec.items()
        if kind not in (
            "terms", "histogram", "date_histogram", "geotile_grid"
        ):
            raise ValueError(
                f"composite source {sname!r}: unsupported type {kind!r}"
            )
        # geotile keys order LEXICOGRAPHICALLY here ("10/.." < "9/..")
        # — deterministic and resumable, same bucket contents; ES
        # orders by the packed tile long (documented divergence)
        order = kbody.get("order", "asc")
        if order not in ("asc", "desc"):
            raise ValueError(f"composite source {sname!r}: bad order {order}")
        kbody = {k: v for k, v in kbody.items()
                 if k not in ("order", "missing_bucket")}
        names.append(sname)
        exprs[sname] = _key_expr(kind, kbody)
        orders[sname] = order
        missing_ok[sname] = bool(sspec[kind].get("missing_bucket"))
    if len(set(names)) != len(names):
        raise ValueError(f"composite: duplicate source names {names}")

    metrics = []
    for mname, mspec in (spec.get("aggs") or {}).items():
        if not isinstance(mspec, dict) or len(mspec) != 1:
            raise ValueError(f"composite sub-agg {mname!r} must be a dict")
        (mkind, mbody), = mspec.items()
        if mkind not in _METRICS and mkind not in _MULTI_METRICS:
            raise ValueError(
                f"composite sub-aggs must be metric leaves, got {mkind!r}"
            )
        metrics.append(_metric_expr(mkind, mbody).alias(mname))

    frame = df
    for sname in names:
        frame = frame.withColumn(sname, exprs[sname])
        if not missing_ok[sname]:
            frame = frame.filter(F.col(sname).isNotNull())
    after = body.get("after")
    if after is not None:
        if set(after) != set(names):
            raise ValueError(
                f"after must give a value per source {names}: {after}"
            )
        # strict tuple ordering in per-source direction: the next page
        # starts AFTER the given key
        cond = F.lit(False)
        eq_prefix = F.lit(True)
        for sname in names:
            av = F.lit(after[sname])
            beyond = (
                F.col(sname) > av
                if orders[sname] == "asc"
                else F.col(sname) < av
            )
            cond = cond | (eq_prefix & beyond)
            eq_prefix = eq_prefix & (F.col(sname) == av)
        frame = frame.filter(cond)
    out = frame.groupBy(*names).agg(
        F.count(F.lit(1)).cast("long").alias("doc_count"), *metrics
    )
    sort_cols = [
        F.col(n).asc() if orders[n] == "asc" else F.col(n).desc()
        for n in names
    ]
    out = out.orderBy(*sort_cols)
    if "size" in body:
        out = out.limit(int(body["size"]))
    return out.select(F.lit(name).alias("agg_path"), "*")


def _expected_gid(all_keys: list[str], level_keys: list[str]) -> int:
    n = len(all_keys)
    return sum(
        1 << (n - 1 - i) for i, k in enumerate(all_keys) if k not in level_keys
    )


def _drop_null_key_rows(lv: _Level, frame: DataFrame) -> DataFrame:
    """ES omits docs whose bucket key is missing (terms without
    ``missing``, histogram/date_histogram on a NULL field) — drop the
    NULL-keyed group of this level's own keyed segments."""
    for role, name, kind, body in lv.segments:
        if role == "key":
            if kind == "terms" and "missing" in body:
                continue
            frame = frame.filter(F.col(name).isNotNull())
    return frame
