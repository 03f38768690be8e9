"""ES query-DSL compiler: the JSON query language users run against
the reference's indices, compiled to ONE Catalyst predicate.

The query-side twin of operators/ingest.py: ``compile_query`` takes
the same JSON shape ES accepts (the filter-context subset below) and
lowers it to a single Column expression — the whole tree evaluates
inside whole-stage codegen, filters push to the scan, and unknown
constructs fail at PLAN time (ES's query validation).

Supported leaves:

- ``term``         {field: value}            — exact keyword equality
- ``terms``        {field: [v, ...]}         — membership
- ``range``        {field: {gte|gt|lte|lt}}  — bound conjunction
- ``exists``       {"field": name}           — non-null
- ``prefix``       {field: value}            — startswith
- ``wildcard``     {field: "a*b?c"}          — * / ? translated to a
                   LIKE pattern (literal % _ escaped)
- ``match``        {field: "query text"}     — analyzed OR: at least
                   one whitespace token occurs in the tokenized field
                   (``"operator": "and"`` requires all tokens)
- ``match_phrase`` {field: "a b c"}          — consecutive tokens, via
                   delimited-substring containment over the
                   whitespace-normalized text (exact for the engine's
                   whitespace analyzer)
- ``match_all``    {}

Compound:

- ``bool`` with ``must`` / ``filter`` (AND), ``must_not`` (NOR) and
  ``should`` with ES's documented ``minimum_should_match`` default:
  1 when the bool has no must/filter context, else 0.

Scoring constructs (function_score, rescore, knn) live in their own
modules (plans/esaggstail2.py, plans/esrelations.py,
operators/similarity.py) — this module is filter context, where ES
itself skips scoring.

Scale: the compiled predicate is a plain boolean expression —
Catalyst pushes the pushable conjuncts to the parquet scan
(PushedFilters) and codegens the rest; a 50-clause bool costs one
scan, zero joins, zero UDFs.
"""

from __future__ import annotations

import functools
import operator as _op

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["compile_query", "apply_query", "run_search_body"]

_RANGE_OPS = {"gte": _op.ge, "gt": _op.gt, "lte": _op.le, "lt": _op.lt}


def _tokens(col: Column) -> Column:
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def _wildcard_to_like(pattern: str) -> str:
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def _one_field(kind: str, body: dict) -> tuple[str, object]:
    if not isinstance(body, dict) or len(body) != 1:
        raise ValueError(f"{kind} must target exactly one field: {body}")
    return next(iter(body.items()))


def compile_query(dsl: dict) -> Column:
    """Lower an ES query-DSL dict (filter-context subset, see module
    docstring) to one boolean Column. Raises ValueError at plan time
    on anything unsupported."""
    if not isinstance(dsl, dict) or len(dsl) != 1:
        raise ValueError(f"query must have exactly one root clause: {dsl}")
    kind, body = next(iter(dsl.items()))

    if kind == "match_all":
        return F.lit(True)
    if kind == "term":
        field, value = _one_field(kind, body)
        return F.col(field) == F.lit(value)
    if kind == "terms":
        field, values = _one_field(kind, body)
        if not isinstance(values, (list, tuple)) or not values:
            raise ValueError(f"terms needs a non-empty list: {body}")
        return F.col(field).isin(*values)
    if kind == "range":
        field, bounds = _one_field(kind, body)
        if not isinstance(bounds, dict) or not bounds:
            raise ValueError(f"range needs bounds: {body}")
        conjs = []
        for b, v in bounds.items():
            if b not in _RANGE_OPS:
                raise ValueError(f"range: unsupported bound {b!r}")
            conjs.append(_RANGE_OPS[b](F.col(field), F.lit(v)))
        return functools.reduce(_op.and_, conjs)
    if kind == "exists":
        if set(body) != {"field"}:
            raise ValueError(f"exists needs {{'field': name}}: {body}")
        return F.col(body["field"]).isNotNull()
    if kind == "prefix":
        field, value = _one_field(kind, body)
        return F.col(field).startswith(str(value))
    if kind == "wildcard":
        field, value = _one_field(kind, body)
        return F.col(field).like(_wildcard_to_like(str(value)))
    if kind == "match":
        field, value = _one_field(kind, body)
        op = "or"
        if isinstance(value, dict):
            op = value.get("operator", "or")
            value = value["query"]
        q_toks = [t for t in str(value).split() if t]
        if not q_toks:
            raise ValueError(f"match needs query tokens: {body}")
        toks = _tokens(F.col(field))
        hits = [F.array_contains(toks, t) for t in q_toks]
        red = _op.and_ if op == "and" else _op.or_
        return functools.reduce(red, hits)
    if kind == "match_phrase":
        field, value = _one_field(kind, body)
        phrase = " ".join(str(value).split())
        if not phrase:
            raise ValueError(f"match_phrase needs tokens: {body}")
        # whitespace analyzer: the phrase matches iff the normalized,
        # delimiter-padded text contains the padded phrase
        norm = F.concat(
            F.lit(" "),
            F.array_join(_tokens(F.col(field)), " "),
            F.lit(" "),
        )
        return norm.contains(f" {phrase} ")
    if kind == "bool":
        if not isinstance(body, dict):
            raise ValueError(f"bool needs a clause dict: {body}")
        unknown = set(body) - {
            "must",
            "filter",
            "must_not",
            "should",
            "minimum_should_match",
        }
        if unknown:
            raise ValueError(f"bool: unsupported clauses {sorted(unknown)}")
        parts: list[Column] = []
        for key in ("must", "filter"):
            for sub in _as_list(body.get(key)):
                parts.append(compile_query(sub))
        for sub in _as_list(body.get("must_not")):
            # ES match semantics, not SQL three-valued logic: a query
            # over a MISSING field does not match, so must_not PASSES
            # the doc — negate (pred IS TRUE), never plain NOT pred
            # (which turns NULL into NULL and silently drops the doc)
            parts.append(~F.coalesce(compile_query(sub), F.lit(False)))
        should = _as_list(body.get("should"))
        if should:
            msm = body.get("minimum_should_match")
            if msm is None:
                # ES default: 1 if nothing else constrains the bool
                msm = 0 if (body.get("must") or body.get("filter")) else 1
            msm = int(msm)
            if msm > 0:
                # same rule: a null-field should clause contributes 0
                # to the match count instead of poisoning the sum
                flags = [
                    F.coalesce(compile_query(sub), F.lit(False)).cast(
                        "int"
                    )
                    for sub in should
                ]
                parts.append(
                    functools.reduce(_op.add, flags) >= F.lit(msm)
                )
        if not parts:
            return F.lit(True)
        return functools.reduce(_op.and_, parts)
    raise ValueError(f"unsupported query clause {kind!r}")


def _as_list(v) -> list:
    if v is None:
        return []
    return list(v) if isinstance(v, (list, tuple)) else [v]


def apply_query(df: DataFrame, dsl: dict) -> DataFrame:
    """Filter a DataFrame with an ES query-DSL dict (one compiled
    predicate; see module docstring)."""
    return df.filter(compile_query(dsl))


def run_search_body(df: DataFrame, body: dict) -> DataFrame:
    """Execute a full ES ``_search`` request body: ``query`` (filter
    context, this module) + either ``aggs`` (operators/aggsdsl.py) or
    the hit list shaped by ``sort``/``size`` (+ ``_source`` column
    projection). The composition mirrors ES exactly: aggregations run
    over the query-filtered document set; hits are the top ``size``
    docs by the sort.

    Plan shape: filter + groupBy (aggs) or filter + TakeOrdered
    (hits) — one scan either way, with the query's pushable conjuncts
    in PushedFilters."""
    out = df
    if "query" in body:
        out = apply_query(out, body["query"])
    if "aggs" in body:
        from .aggsdsl import apply_aggs

        return apply_aggs(out, body["aggs"])
    sort = body.get("sort") or []
    if sort:
        cols = []
        for s in sort:
            if isinstance(s, str):
                cols.append(F.col(s).asc())
            else:
                (field, spec), = s.items()
                order = spec.get("order", "asc") if isinstance(spec, dict) else spec
                if order not in ("asc", "desc"):
                    raise ValueError(f"sort: bad order {order!r}")
                cols.append(
                    F.col(field).desc() if order == "desc" else F.col(field).asc()
                )
        out = out.orderBy(*cols)
    if "size" in body:
        out = out.limit(int(body["size"]))
    if "_source" in body:
        out = out.select(*body["_source"])
    return out
