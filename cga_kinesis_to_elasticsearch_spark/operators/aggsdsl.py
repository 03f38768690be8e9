"""ES aggregation-DSL interpreter: a nested ``aggs`` tree compiled to
one groupBy/agg plan — the response side of a search request, pairing
with operators/querydsl.py (the query side) and operators/ingest.py
(the write side).

Supported bucket aggregations (nesting = one groupBy on the chained
bucket keys, the standard relational lowering ES's own ``composite``
agg exposes):

- ``terms``          {field}                    — group by value
- ``date_histogram`` {field, calendar_interval: hour|day|month|year}
- ``histogram``      {field, interval}          — fixed-width numeric
- ``range``          {field, ranges: [{from?, to?}, ...]} — CASE
                     buckets labeled "lo-hi" like ES ("*" for open).
                     Honest limit: OVERLAPPING ranges assign each row
                     to its FIRST matching bucket (a relational group
                     key is single-valued); ES duplicates the doc into
                     every matching range. Disjoint ranges — the
                     overwhelmingly common case — are identical.

Supported metric leaves:

- ``value_count`` / ``sum`` / ``avg`` / ``min`` / ``max`` {field}
- ``cardinality`` {field} — EXACT distinct here; at 100 TB swap in
  the HLL sketch (operators/sketches.py) exactly as ES trades
  precision_threshold for memory.

Every bucket level may carry nested ``aggs``; metric leaves terminate
the tree. The result is ONE DataFrame with a column per bucket key
(named after the agg) and a column per metric.

Scale: the whole tree lowers to a single partial-aggregated shuffle
on the composite bucket key (count/sum/min/max combine map-side;
exact cardinality adds the usual distinct expansion Spark plans for
countDistinct). Bucket-key expressions are narrow codegen; unknown
constructs fail at plan time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["compile_aggs", "apply_aggs"]

_CAL = {
    "hour": "yyyy-MM-dd HH:00:00",
    "day": "yyyy-MM-dd",
    "month": "yyyy-MM",
    "year": "yyyy",
}

_METRICS = {
    "value_count": lambda c: F.count(c),
    "sum": lambda c: F.sum(c),
    "avg": lambda c: F.avg(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "cardinality": lambda c: F.countDistinct(c),
}


def _range_bucket(field: str, ranges: list[dict]) -> Column:
    expr: Column | None = None
    cases = []
    for r in ranges:
        lo, hi = r.get("from"), r.get("to")
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col(field) >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(field) < F.lit(hi))
        label = f"{lo if lo is not None else '*'}-{hi if hi is not None else '*'}"
        cases.append((cond, F.lit(label)))
    expr = F.when(cases[0][0], cases[0][1])
    for cond, label in cases[1:]:
        expr = expr.when(cond, label)
    return expr  # rows outside every range bucket to NULL, like ES


def _bucket_key(name: str, kind: str, body: dict) -> Column:
    if kind == "terms":
        return F.col(body["field"]).alias(name)
    if kind == "date_histogram":
        cal = body.get("calendar_interval")
        if cal not in _CAL:
            raise ValueError(
                f"date_histogram: unsupported calendar_interval {cal!r}"
            )
        return F.date_format(F.col(body["field"]), _CAL[cal]).alias(name)
    if kind == "histogram":
        iv = body["interval"]
        if not isinstance(iv, (int, float)) or iv <= 0:
            raise ValueError(f"histogram: bad interval {iv!r}")
        return (
            (F.floor(F.col(body["field"]) / F.lit(iv)) * F.lit(iv))
            .alias(name)
        )
    if kind == "range":
        ranges = body.get("ranges")
        if not ranges:
            raise ValueError("range agg needs ranges")
        return _range_bucket(body["field"], ranges).alias(name)
    raise ValueError(f"unsupported bucket aggregation {kind!r}")


def compile_aggs(
    aggs: dict,
) -> tuple[list[Column], list[Column]]:
    """Walk the agg tree; return (bucket key columns, metric columns).
    Raises ValueError at plan time on unsupported constructs."""
    keys: list[Column] = []
    metrics: list[Column] = []

    def _walk(tree: dict) -> None:
        if not isinstance(tree, dict) or not tree:
            raise ValueError(f"aggs must be a non-empty dict: {tree!r}")
        for name, spec in tree.items():
            sub = {k: v for k, v in spec.items() if k != "aggs"}
            if len(sub) != 1:
                raise ValueError(
                    f"agg {name!r} must have exactly one type: {spec}"
                )
            kind, body = next(iter(sub.items()))
            if kind in _METRICS:
                if "aggs" in spec:
                    raise ValueError(
                        f"metric agg {name!r} cannot nest sub-aggs"
                    )
                metrics.append(
                    _METRICS[kind](F.col(body["field"])).alias(name)
                )
            else:
                keys.append(_bucket_key(name, kind, body))
                nested = spec.get("aggs")
                if nested:
                    _walk(nested)

    _walk(aggs)
    if not keys and not metrics:
        raise ValueError("empty aggregation tree")
    return keys, metrics


def apply_aggs(df: DataFrame, aggs: dict) -> DataFrame:
    """Execute an ES ``aggs`` tree: one groupBy on the chained bucket
    keys, one agg with every metric (see module docstring). Implicit
    ``doc_count`` is always included (every ES bucket reports it)."""
    keys, metrics = compile_aggs(aggs)
    doc_count = F.count(F.lit(1)).alias("doc_count")
    if not keys:
        return df.agg(doc_count, *metrics)
    # groupBy accepts aliased expressions directly: the grouping
    # column takes the agg's name — no staging projection needed
    return df.groupBy(*keys).agg(doc_count, *metrics)
