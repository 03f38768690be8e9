"""Grok -> Spark column compilation (and DuckDB SQL emission for the
correctness oracle).

The default strategy keeps the hot path entirely JVM-side: one
``regexp_extract(line, rx, group_idx)`` (+ cast) per capture, all inside
whole-stage codegen. That evaluates the regex once per capture; for wide
patterns (ROUTERACCESS: 23 captures) ``grok_parse_pandas`` offers a
single-pass Arrow-batched alternative — benchmark decides per pattern
width (bench.py).

Equivalent reference behavior: grok Parse/ParseTyped/Match
(vendor/github.com/vjeantet/grok/grok.go:187-259).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .compiler import CompiledPattern, Grok

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

__all__ = [
    "grok_columns",
    "grok_struct",
    "grok_match",
    "grok_schema",
    "grok_parse_pandas",
    "duckdb_exprs",
]

_SPARK_TYPE = {"string": StringType(), "int": IntegerType(), "float": DoubleType()}
_SQL_CAST = {"int": "INTEGER", "float": "DOUBLE"}


def _resolve(grok: Grok, pattern: str | CompiledPattern) -> CompiledPattern:
    return pattern if isinstance(pattern, CompiledPattern) else grok.compile(pattern)


def grok_schema(grok: Grok, pattern: str | CompiledPattern) -> StructType:
    """Static output schema — derivable at plan time because the capture
    set of a pattern is static (SURVEY §1.1 'Parsed values')."""
    cp = _resolve(grok, pattern)
    return StructType(
        [StructField(c.name, _SPARK_TYPE[c.type], True) for c in cp.fields]
    )


def grok_columns(
    grok: Grok, col: Column | str, pattern: str | CompiledPattern
) -> list[Column]:
    """One typed column per capture; '' -> non-match or empty capture
    (same conflation as Go's FindStringSubmatch, grok.go:201-215).
    Typed casts of '' yield NULL (reference errors per-record; NULL is
    the columnar equivalent of 'value absent')."""
    cp = _resolve(grok, pattern)
    col = F.col(col) if isinstance(col, str) else col
    out = []
    for c in cp.fields:
        e = F.regexp_extract(col, cp.regex, c.group)
        # try_cast: '' (no match / empty capture) -> NULL under ANSI mode
        if c.type == "int":
            e = e.try_cast("int")
        elif c.type == "float":
            e = e.try_cast("double")
        out.append(e.alias(c.name))
    return out


def grok_struct(
    grok: Grok,
    col: Column | str,
    pattern: str | CompiledPattern,
    null_on_nonmatch: bool = True,
) -> Column:
    """All captures as one struct column; NULL struct when the line does
    not match (distinguishes no-match from matched-empty, which the
    reference signals via the empty capture map, grok.go:211-214)."""
    cp = _resolve(grok, pattern)
    col = F.col(col) if isinstance(col, str) else col
    s = F.struct(*grok_columns(grok, col, cp))
    if not null_on_nonmatch:
        return s
    return F.when(grok_match(grok, col, cp), s)


def grok_match(
    grok: Grok, col: Column | str, pattern: str | CompiledPattern
) -> Column:
    """Boolean match predicate (G7, grok.go:187-198). Unanchored search,
    like Go's FindStringSubmatch."""
    cp = _resolve(grok, pattern)
    col = F.col(col) if isinstance(col, str) else col
    return col.rlike(cp.regex)


def grok_parse_pandas(
    grok: Grok,
    df: "DataFrame",
    text_col: str,
    pattern: str | CompiledPattern,
    prefix: str = "",
) -> "DataFrame":
    """Single-pass parse via mapInPandas for wide patterns: the regex is
    evaluated once per row instead of once per capture. Python regex
    dialect (identical semantics for the shipped pattern library; the
    compiler guarantees plain groups only).

    Appends one column per capture to the input schema.
    """
    cp = _resolve(grok, pattern)
    import re as _re

    rx = _re.compile(cp.regex)
    fields = cp.fields
    schema = StructType(
        df.schema.fields
        + [StructField(prefix + c.name, _SPARK_TYPE[c.type], True) for c in fields]
    )

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        for pdf in batches:
            texts = pdf[text_col]
            cols: dict[str, list[object]] = {prefix + c.name: [] for c in fields}
            for t in texts:
                m = rx.search(t) if isinstance(t, str) else None
                for c in fields:
                    v: object = None
                    if m is not None:
                        raw = m.group(c.group) or ""
                        if c.type == "int":
                            v = int(raw) if raw else None
                        elif c.type == "float":
                            v = float(raw) if raw else None
                        else:
                            v = raw
                    cols[prefix + c.name].append(v)
            for k, vals in cols.items():
                pdf[k] = vals
            yield pdf

    return df.mapInPandas(run, schema)


def duckdb_exprs(
    grok: Grok,
    col_sql: str,
    pattern: str | CompiledPattern,
    prefix: str = "",
) -> list[str]:
    """DuckDB SQL select-list matching :func:`grok_columns` — the same
    plain-group regex string, so Spark and the oracle agree by
    construction. NULLIF-free: DuckDB regexp_extract also returns ''
    on no match, and casts of '' are handled via NULLIF to mirror
    Spark's cast('') -> NULL."""
    cp = _resolve(grok, pattern)
    rx = cp.regex.replace("'", "''")
    # DuckDB's numeric group index caps at 9; the name-list form is
    # positional and unbounded: name list[i] binds capture group i+1.
    # Place each semantic at its compile-time group index, fillers
    # elsewhere (names must be unique).
    max_group = max((c.group for c in cp.fields), default=0)
    names = [f"_g{i + 1}" for i in range(max_group)]
    for c in cp.fields:
        names[c.group - 1] = c.name
    name_list = "[" + ", ".join(f"'{n}'" for n in names) + "]"
    out = []
    for c in cp.fields:
        e = (
            f"struct_extract(regexp_extract({col_sql}, '{rx}', {name_list}), "
            f"'{c.name}')"
        )
        if c.type in _SQL_CAST:
            e = f"CAST(NULLIF({e}, '') AS {_SQL_CAST[c.type]})"
        out.append(f"{e} AS {prefix}{c.name}")
    return out
