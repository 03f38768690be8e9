"""ES ingest-pipeline interpreter: a declarative processor list
compiled to ONE narrow Spark projection.

The reference ships documents into Elasticsearch, where users attach
ingest pipelines (PUT _ingest/pipeline/...) — ordered processor lists
that reshape each document before indexing. This module reproduces
that API surface Spark-first: the pipeline definition is the same
JSON-shaped list of processors ES accepts (the supported subset
below), and ``apply_ingest_pipeline`` compiles it into a single
``select`` — every processor is a Column expression, the whole chain
whole-stage-codegens, nothing leaves the JVM.

Supported processors (the everyday subset):

- ``set``        {field, value}                  — literal assign
- ``copy``       {field, from}                   — copy another field
                 (ES spells this ``set`` + ``copy_from``)
- ``rename``     {field, target_field}
- ``remove``     {field}
- ``convert``    {field, type: int|long|double|string|boolean}
                 — ES convert semantics: unparseable input raises
                 unless ``ignore_failure`` is true, then passes null
                 (mapped to try_cast; ANSI cast is the raising path)
- ``lowercase`` / ``uppercase`` / ``trim``  {field}
- ``gsub``       {field, pattern, replacement}   — regexp_replace
- ``split``      {field, separator}              — string -> array
- ``date``       {field, target_field, output_format}
                 — parse timestamp-like string; formats are Spark/
                 Java patterns (ES date processor's Java formats)
- ``script`` is deliberately NOT supported: arbitrary painless has no
  declarative lowering — computed_columns / the grok compiler are the
  engine's answers for expression-level work.

Scale shape: the compiler folds the processor list LEFT TO RIGHT over
a column mapping (dict of name -> Column), exactly the sequential
semantics ES documents; the result is one projection, so a 40-
processor pipeline costs the same scan as a 1-processor one.

Reference context: day-partitioned index routing and computed columns
(operators/computed.py) are what main.go computes in code; ingest
pipelines are how ES users express the same reshaping declaratively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["apply_ingest_pipeline", "compile_pipeline"]

_CONVERT_TYPES = {
    "int": "int",
    "integer": "int",
    "long": "long",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
}


def compile_pipeline(
    columns: list[str], processors: list[dict]
) -> dict[str, Column]:
    """Fold the processor list over a name -> Column mapping (initially
    the input columns) and return the final mapping, in output order.
    Raises ValueError on unknown processors/fields/types — pipeline
    bugs should fail at PLAN time, like ES's pipeline validation."""
    # backtick-quote source names: document fields may contain dots
    # (the parity pipeline emits `@cf.env` etc.), which bare F.col
    # would parse as struct access
    cols: dict[str, Column] = {c: F.col(f"`{c}`") for c in columns}

    def _need(field: str, p: dict) -> Column:
        if field not in cols:
            raise ValueError(
                f"processor {p} references unknown field {field!r}"
            )
        return cols[field]

    for p in processors:
        if len(p) != 1:
            raise ValueError(f"each processor must have ONE key: {p}")
        kind, a = next(iter(p.items()))
        if kind == "set":
            cols[a["field"]] = F.lit(a["value"])
        elif kind == "copy":
            cols[a["field"]] = _need(a["from"], p)
        elif kind == "rename":
            cols[a["target_field"]] = _need(a["field"], p)
            del cols[a["field"]]
        elif kind == "remove":
            _need(a["field"], p)
            del cols[a["field"]]
        elif kind == "convert":
            t = _CONVERT_TYPES.get(a["type"])
            if t is None:
                raise ValueError(f"convert: unsupported type {a['type']!r}")
            src = _need(a["field"], p)
            cols[a["field"]] = (
                src.try_cast(t) if a.get("ignore_failure") else src.cast(t)
            )
        elif kind == "lowercase":
            cols[a["field"]] = F.lower(_need(a["field"], p))
        elif kind == "uppercase":
            cols[a["field"]] = F.upper(_need(a["field"], p))
        elif kind == "trim":
            cols[a["field"]] = F.trim(_need(a["field"], p))
        elif kind == "gsub":
            cols[a["field"]] = F.regexp_replace(
                _need(a["field"], p), a["pattern"], a["replacement"]
            )
        elif kind == "split":
            cols[a["field"]] = F.split(
                _need(a["field"], p), a["separator"]
            )
        elif kind == "date":
            src = _need(a["field"], p)
            ts = F.to_timestamp(src)
            out = a.get("target_field", a["field"])
            fmt = a.get("output_format")
            cols[out] = F.date_format(ts, fmt) if fmt else ts
        else:
            raise ValueError(f"unsupported processor {kind!r}")
    return cols


def apply_ingest_pipeline(
    df: DataFrame, processors: list[dict]
) -> DataFrame:
    """Apply an ES-style ingest pipeline to every row as ONE narrow
    projection (see module docstring)."""
    cols = compile_pipeline(df.columns, processors)
    return df.select(*[c.alias(name) for name, c in cols.items()])
