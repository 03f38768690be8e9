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
- ``grok``       {field, patterns: [...]
                 [, pattern_definitions: {name: body}]}
                 — THE on-theme processor (the reference's whole job
                 is grok parsing, main.go:396,402): each capture of
                 the first matching pattern becomes a top-level typed
                 column; a non-matching document gets NULL captures —
                 the engine's match-or-empty columnar contract (F5),
                 where ES's processor would route to on_failure.
                 Compiles through the SAME grok compiler as the parity
                 pipeline (grok/compiler.py), and parses with the
                 single-pass packed-capture rewrite of
                 grok/spark.grok_parse_many — one regex evaluation per
                 (row, pattern), not one per capture.
- ``json``       {field[, target_field][, schema][, add_to_root]}
                 — ``from_json``. Spark-first divergence: the value
                 SCHEMA is declared at plan time (DDL string; default
                 ``map<string,string>``) instead of ES's dynamic
                 parse — the columnar contract needs a type.
                 ``add_to_root`` expands the parsed struct's fields to
                 top-level columns (requires a struct schema).
- ``dot_expander`` {field} — regroups every ``field.suffix`` column
                 into ONE struct column ``field`` (ES expands dotted
                 keys into nested objects; here the object is a
                 struct). ``{"field": "*"}`` expands every dotted
                 column, like ES's wildcard form.
- ``dissect``    {field, pattern[, append_separator]} — ES's
                 fixed-delimiter splitter (%{key} captures separated
                 by literals), lowered to ONE anchored regex with a
                 non-greedy group per inner key (the final capture
                 consumes the rest, dissect's semantics); %{} /
                 %{?name} skip, %{+key} APPENDS to an earlier capture
                 (joined by ``append_separator``, ES default empty),
                 %{key->} skips repeated trailing delimiters (the
                 right-padding modifier). Reference keys (%{*k}/%{&k})
                 are rejected at plan time. A non-matching document
                 gets NULL captures (the same match-or-empty contract
                 as grok).
- ``kv``         {field, field_split, value_split, include_keys
                 [, target_field]} — key-value splitting;
                 ``include_keys`` is REQUIRED (the columnar schema
                 needs plan-time keys, where ES materializes keys
                 dynamically), one column per included key (prefixed
                 by target_field), NULL when absent.
- ``user_agent`` {field[, target_field]} — UA classification through
                 the prioritized-regex table of operators/useragent.py;
                 flat ``<target>.name`` / ``.major`` / ``.is_bot``
                 columns (the columnar reading of ES's nested object).
- ``urldecode``  {field[, target_field]}
- ``fingerprint`` {fields, [method: MD5|SHA-1|SHA-256|SHA-512]
                 [, target_field]} — stable hash of the named fields
                 joined in request order (ES default SHA-1).
- ``script``     {target_field, script.source} — the PAINLESS
                 ARITHMETIC SUBSET only (``doc['field'].value``
                 references + arithmetic/comparison, the same contract
                 as the query-side ``script_score``); references bind
                 to INPUT document fields. Arbitrary painless still
                 has no declarative lowering — computed_columns / the
                 grok compiler are the engine's answers for heavier
                 reshaping.

Validation is PLAN-time like ES's pipeline validation: unknown
processors, unknown fields, ``rename`` onto itself or onto an
existing field (ES's rename errors on both) all raise ValueError
before any job runs.

Scale shape: the compiler folds the processor list LEFT TO RIGHT over
a column mapping (dict of name -> Column), exactly the sequential
semantics ES documents; the result is one projection, so a 40-
processor pipeline costs the same scan as a 1-processor one. A
``grok`` processor splits the chain into staged projections (the
packed-capture rewrite needs attribute boundaries so Catalyst cannot
inline the regex once per field) — still zero shuffles, zero Python.

Reference context: day-partitioned index routing and computed columns
(operators/computed.py) are what main.go computes in code; ingest
pipelines are how ES users express the same reshaping declaratively.
"""

from __future__ import annotations

import re

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


class _TrackedCols(dict):
    """name -> Column mapping that records which fields a processor
    has written or removed AFTER construction — the script processor
    must not silently read a pre-modification value (ES's ``ctx`` is
    sequential), so a reference to a dirty field fails at plan time;
    apply_ingest_pipeline avoids the failure by staging a projection
    before each script."""

    def __init__(self, initial: dict):
        super().__init__(initial)
        self.dirty: set[str] = set()

    def __setitem__(self, key, value):
        if hasattr(self, "dirty"):
            self.dirty.add(key)
        super().__setitem__(key, value)

    def __delitem__(self, key):
        self.dirty.add(key)
        super().__delitem__(key)


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
    cols: _TrackedCols = _TrackedCols(
        {c: F.col(f"`{c}`") for c in columns}
    )

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
            target = a["target_field"]
            if target == a["field"]:
                raise ValueError(
                    f"rename: target_field equals field {target!r} "
                    "(ES's rename processor errors here)"
                )
            if target in cols:
                raise ValueError(
                    f"rename: target_field {target!r} already exists "
                    "(ES's rename processor errors here)"
                )
            cols[target] = _need(a["field"], p)
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
        elif kind == "json":
            src = _need(a["field"], p)
            ddl = a.get("schema", "map<string,string>")
            target = a.get("target_field", a["field"])
            parsed = F.from_json(src, ddl)
            if a.get("add_to_root"):
                from pyspark.sql.types import StructType, _parse_datatype_string

                st = _parse_datatype_string(ddl)
                if not isinstance(st, StructType):
                    raise ValueError(
                        f"json: add_to_root needs a struct schema, got {ddl!r}"
                    )
                for f in st.fields:
                    cols[f.name] = parsed.getField(f.name)
            else:
                cols[target] = parsed
        elif kind == "dot_expander":
            field = a["field"]
            if field == "*":
                prefixes = sorted(
                    {c.split(".", 1)[0] for c in cols if "." in c}
                )
            else:
                prefixes = [field]
            for prefix in prefixes:
                members = [c for c in cols if c.startswith(prefix + ".")]
                if not members:
                    raise ValueError(
                        f"dot_expander: no dotted fields under {prefix!r}"
                    )
                struct = F.struct(
                    *[
                        cols[c].alias(c.split(".", 1)[1])
                        for c in members
                    ]
                )
                for c in members:
                    del cols[c]
                cols[prefix] = struct
        elif kind == "dissect":
            # ES dissect: fixed literal delimiters between %{key}
            # captures — lowered to ONE anchored regex with a
            # non-greedy group per key (the dissect fixed-delimiter
            # semantics), one regexp_extract per emitted key.
            # %{} and %{?name} skip their capture, like ES.
            src = _need(a["field"], p)
            pattern = a.get("pattern")
            if not pattern:
                raise ValueError(f"dissect needs a pattern: {a}")
            parts = [x for x in re.split(r"(%\{[^}]*\})", pattern) if x]
            cap_idx = [
                i for i, x in enumerate(parts)
                if x.startswith("%{") and x.endswith("}")
            ]
            if not cap_idx:
                raise ValueError(
                    f"dissect: pattern has no captures: {pattern!r}"
                )
            rx = "^"
            keys: list[str] = []
            # key -> [(append ordinal or None, regex group index)]
            groups_of: dict[str, list[tuple[int | None, int]]] = {}
            gi = 0
            pad_next = False  # a %{key->} makes the NEXT literal
            # match one-or-more times (ES's skip-right-padding)
            for i, part in enumerate(parts):
                if i in dict.fromkeys(cap_idx):
                    key = part[2:-1]
                    if key.endswith("->"):
                        key = key[:-2]
                        pad_next = True
                    gi += 1
                    if key.startswith(("*", "&")):
                        raise ValueError(
                            "dissect: reference keys (%{*k} / %{&k}) "
                            f"are not lowered: {part!r}"
                        )
                    append = key.startswith("+")
                    if append:
                        key = key[1:]
                        if not key:
                            raise ValueError(
                                f"dissect: empty append key: {part!r}"
                            )
                    # %{+key/2}: the append-order ordinal — ES sorts
                    # the appended captures by /n, not pattern order.
                    # Only legal on append keys; anywhere else a '/'
                    # would silently become part of the column name,
                    # so reject it at plan time (like reference keys).
                    ordinal = None
                    if "/" in key:
                        base, _, ord_s = key.rpartition("/")
                        if not (append and base and ord_s.isdigit()):
                            raise ValueError(
                                "dissect: the /n append-order "
                                "modifier is only valid on %{+key} "
                                f"captures: {part!r}"
                            )
                        key, ordinal = base, int(ord_s)
                    if key and not key.startswith("?"):
                        if key in groups_of and not append:
                            raise ValueError(
                                f"dissect: duplicate key {key!r} "
                                "(use %{+" + key + "} to append)"
                            )
                        groups_of.setdefault(key, []).append(
                            (ordinal, gi)
                        )
                        if key not in keys:
                            keys.append(key)
                    # the FINAL capture is greedy (consumes the rest);
                    # inner captures stop at the next literal
                    rx += "(.*)" if i == cap_idx[-1] else "(.*?)"
                else:
                    lit = re.escape(part)
                    rx += f"(?:{lit})+" if pad_next else lit
                    pad_next = False
            rx += "$"
            if not keys:
                raise ValueError(
                    f"dissect: pattern emits no keys: {pattern!r}"
                )
            # non-match -> every key NULL (regexp_extract returns ''
            # on miss; dissect distinguishes empty capture via the
            # match test). %{+key} captures concatenate in pattern
            # order joined by append_separator (ES default: empty).
            sep = str(a.get("append_separator", ""))
            matched = src.rlike(rx)
            for key in keys:
                entries = groups_of[key]
                ords = [o for o, _ in entries]
                if any(o is not None for o in ords):
                    # /n ordinals order the append; mixing ordinal
                    # and plain appends of one key is ambiguous and
                    # duplicates silently reorder — both fail loud
                    if any(o is None for o in ords):
                        raise ValueError(
                            f"dissect: key {key!r} mixes /n and "
                            "plain appends — give every capture an "
                            "ordinal or none"
                        )
                    if len(set(ords)) != len(ords):
                        raise ValueError(
                            f"dissect: key {key!r} repeats an "
                            f"append ordinal: {sorted(ords)}"
                        )
                    entries = sorted(entries)
                gs = [g for _, g in entries]
                if len(gs) == 1:
                    val = F.regexp_extract(src, rx, gs[0])
                else:
                    val = F.concat_ws(
                        sep, *[F.regexp_extract(src, rx, g) for g in gs]
                    )
                cols[key] = F.when(matched, val)
        elif kind == "kv":
            # ES kv with include_keys (REQUIRED here: a columnar
            # schema needs plan-time keys): split pairs on
            # field_split, values on value_split, emit one column per
            # included key (prefix via target_field), NULL when the
            # key is absent.
            src = _need(a["field"], p)
            fs, vs = a.get("field_split"), a.get("value_split")
            include = a.get("include_keys")
            if not fs or not vs or not include:
                raise ValueError(
                    "kv needs field_split, value_split and "
                    f"include_keys (plan-time schema): {a}"
                )
            prefix = a.get("target_field")
            pairs = F.map_from_entries(
                F.filter(
                    F.transform(
                        F.split(src, fs),
                        lambda kvs: F.struct(
                            F.substring_index(kvs, vs, 1).alias("k"),
                            # ES kv splits key from value at the FIRST
                            # value_split occurrence ('u=a=b' -> 'a=b'),
                            # so take everything after it, not
                            # substring_index(..., -1) (last-split).
                            F.when(
                                kvs.contains(vs),
                                kvs.substr(
                                    F.instr(kvs, vs) + len(vs),
                                    F.length(kvs),
                                ),
                            ).alias("v"),
                        ),
                    ),
                    lambda e: e["v"].isNotNull(),
                )
            )
            for key in include:
                out_name = f"{prefix}.{key}" if prefix else key
                cols[out_name] = pairs[key]
        elif kind == "user_agent":
            # ES's user_agent processor (UA string -> object); lowered
            # through the prioritized-regex classifier of
            # operators/useragent.py — flat dotted columns
            # <target>.name / <target>.major / <target>.is_bot (the
            # columnar reading of ES's nested object)
            from .useragent import classify_ua

            src = _need(a["field"], p)
            target = a.get("target_field", "user_agent")
            family, major, is_bot = classify_ua(src)
            cols[f"{target}.name"] = family
            cols[f"{target}.major"] = major
            cols[f"{target}.is_bot"] = is_bot
        elif kind == "urldecode":
            src = _need(a["field"], p)
            cols[a.get("target_field", a["field"])] = F.url_decode(src)
        elif kind == "fingerprint":
            # ES fingerprint processor: a stable hash of the named
            # fields' values (md5/sha1/sha256; ES default SHA-1),
            # fields joined in REQUEST order with the ES separator
            fields = a.get("fields")
            if not fields:
                raise ValueError(f"fingerprint needs fields: {a}")
            method = a.get("method", "SHA-1")
            joined = F.concat_ws(
                "|", *[_need(f, p).cast("string") for f in fields]
            )
            if method == "MD5":
                h = F.md5(joined)
            elif method == "SHA-1":
                h = F.sha1(joined)
            elif method in ("SHA-256", "SHA-512"):
                h = F.sha2(joined, int(method.split("-")[1]))
            else:
                raise ValueError(
                    f"fingerprint: unsupported method {method!r}"
                )
            cols[a.get("target_field", "fingerprint")] = h
        elif kind == "script":
            # the PAINLESS ARITHMETIC SUBSET only (same contract as
            # query-side script_score): ctx.target = doc-field
            # arithmetic, declared as {target_field, source} with
            # doc['field'].value references; anything beyond the
            # subset fails at plan time. Arbitrary painless still has
            # no lowering — grok/computed_columns remain the answer
            # for heavier reshaping.
            from .querydsl import _compile_score_script

            target = a.get("target_field")
            source = (a.get("script") or {}).get("source") or a.get(
                "source"
            )
            if not target or not source:
                raise ValueError(
                    f"script needs target_field and source: {a}"
                )
            for ref in re.findall(r"doc\['([^']+)'\]", source):
                # the compiled expression binds to the INPUT frame, so
                # only UNMODIFIED input fields are addressable here: a
                # field an earlier processor wrote/removed would read
                # its PRE-modification value (ES's ctx is sequential).
                # apply_ingest_pipeline sidesteps this by staging a
                # projection before each script.
                if ref not in cols:
                    raise ValueError(
                        f"script references {ref!r}, which is not a "
                        "field of the document at this point in the "
                        "pipeline"
                    )
                if ref in cols.dirty:
                    raise ValueError(
                        f"script references {ref!r}, which an earlier "
                        "processor in this projection modified — the "
                        "script would read the pre-modification value. "
                        "Run through apply_ingest_pipeline (it stages "
                        "a projection before each script), or reorder "
                        "the processors."
                    )
            cols[target] = _compile_score_script(source)
        elif kind == "grok":
            raise ValueError(
                "grok processor requires apply_ingest_pipeline (it "
                "stages projections around the packed-capture parse)"
            )
        else:
            raise ValueError(f"unsupported processor {kind!r}")
    return cols


def _apply_grok(df: DataFrame, a: dict) -> DataFrame:
    """The ``grok`` processor: first matching pattern's captures become
    top-level typed columns (single-pass packed-capture parse per
    pattern; see grok/spark.grok_parse_many)."""
    from ..grok import default_grok
    from ..grok.spark import grok_match, grok_parse_many

    field = a["field"]
    patterns = a.get("patterns")
    if not patterns or not isinstance(patterns, (list, tuple)):
        raise ValueError(f"grok needs a non-empty patterns list: {a}")
    if field not in df.columns:
        raise ValueError(f"grok references unknown field {field!r}")
    grok = default_grok()
    for name, body in (a.get("pattern_definitions") or {}).items():
        grok.add_pattern(name, body)
    compiled = [grok.compile(p) for p in patterns]

    # first-match-wins: pattern i parses only rows no earlier pattern
    # matched (ES tries the patterns in order)
    specs = []
    src = F.col(f"`{field}`")
    prior = None
    for i, cp in enumerate(compiled):
        specs.append((f"__grok_{i}", cp, prior))
        m = grok_match(grok, src, cp)
        prior = (~m) if prior is None else (prior & ~m)
    parsed = grok_parse_many(grok, df, src, specs)

    # expose each capture as a top-level column: the value from the
    # FIRST pattern that matched and defines it
    capture_names: list[str] = []
    for cp in compiled:
        for c in cp.fields:
            if c.name not in capture_names:
                capture_names.append(c.name)
    out_cols = [F.col(f"`{c}`") for c in df.columns if c not in capture_names]
    for name in capture_names:
        sources = [
            F.col(f"__grok_{i}.{name}")
            for i, cp in enumerate(compiled)
            if any(c.name == name for c in cp.fields)
        ]
        out_cols.append(F.coalesce(*sources).alias(name))
    return parsed.select(*out_cols)


def apply_ingest_pipeline(
    df: DataFrame, processors: list[dict]
) -> DataFrame:
    """Apply an ES-style ingest pipeline: the processor chain compiles
    to ONE narrow projection (see module docstring); each ``grok``
    processor splits the chain into staged projections around the
    packed-capture parse — still zero shuffles, zero Python."""
    pending: list[dict] = []
    out = df

    def _flush():
        nonlocal out, pending
        if pending:
            cols = compile_pipeline(out.columns, pending)
            out = out.select(*[c.alias(name) for name, c in cols.items()])
            pending = []

    for p in processors:
        kind = next(iter(p)) if len(p) == 1 else None
        if kind == "grok":
            _flush()
            out = _apply_grok(out, p["grok"])
        elif kind == "script":
            # stage a projection BEFORE the script so its doc['field']
            # references bind to the values earlier processors
            # produced — ES's sequential ctx semantics. Projections
            # fuse in whole-stage codegen; the extra select costs no
            # shuffle and no pass over the data.
            _flush()
            pending.append(p)
        else:
            pending.append(p)
    if pending or not processors:
        cols = compile_pipeline(out.columns, pending)
        out = out.select(*[c.alias(name) for name, c in cols.items()])
    return out
