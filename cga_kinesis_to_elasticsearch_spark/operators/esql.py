"""ES|QL: Elasticsearch's piped query language (the syntax Kibana
Discover ships as its default query bar in ES 8.11+), executed on
Spark — ``FROM idx | WHERE ... | EVAL ... | STATS ... BY ... | SORT
... | LIMIT n`` compiles to the same DataFrame plan the equivalent
hand-written query would build.

Supported commands (each "| cmd ..." stage maps to ONE DataFrame
transformation; unknown commands fail at plan time):

- ``FROM index``            — the source frame (resolved from the
                              caller's table map; comma lists union)
- ``WHERE <expr>``          — filter
- ``EVAL name = <expr>, ..``— computed columns
- ``STATS a = agg(x), .. BY k1, k2`` — grouped aggregation (BY
                              omitted = global); aggs are the shared
                              SQL core (count/sum/avg/min/max/
                              count_distinct/percentile)
- ``SORT col [ASC|DESC] [NULLS FIRST|LAST], ...``
- ``LIMIT n``
- ``KEEP c1, c2`` / ``DROP c1`` / ``RENAME old AS new``
- ``GROK field "%{PATTERN:name} ..."`` — parse a text column with
  the engine's grok compiler (the SAME pattern library the parity
  pipeline runs, so the reference's log lines parse identically in
  ES|QL and in the stream)
- ``DISSECT field "pattern"`` — the ingest dissect processor as a
  command
- ``ENRICH policy ON key [WITH f1, ..]`` — lookup enrichment: the
  policy is a dimension frame in the table map, broadcast-joined on
  the shared key (missing keys tolerate as NULLs — the reference's
  app-metadata join, in pipe syntax)
- ``MV_EXPAND col`` — one row per element of a multi-value column

Expression dialect: the SQL core ES|QL shares with Spark SQL —
arithmetic, comparisons, AND/OR/NOT, IN, IS NULL, CASE, and plain
function calls. ES|QL's ``==`` lowers to ``=`` and double-quoted
string literals to single-quoted; everything else passes through
Spark's parser, which rejects what it doesn't know at plan time.

Scale shape: a pipe chain is ONE logical plan — Catalyst fuses the
stages (WHERE conjuncts push to the scan through EVALs when
independent), STATS is one partial-agg shuffle, SORT+LIMIT a
TakeOrdered. Piped syntax changes nothing about the physics.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["run_esql"]

_CMD_RE = re.compile(r"^\s*([A-Za-z_]+)\s*(.*)$", re.DOTALL)
# characters allowed in a translated expression (defense in depth on
# top of Spark's parser — no semicolons, no comments, no backslashes)
_EXPR_SAFE_RE = re.compile(r"^[\w\s\.\+\-\*/%\(\)<>=!,'\"\[\]:]*$")


def _split_pipes(query: str) -> list[str]:
    """Split on top-level ``|`` — pipes inside string literals stay."""
    parts: list[str] = []
    buf: list[str] = []
    quote: str | None = None
    for ch in query:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == "|":
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if quote:
        raise ValueError(f"ES|QL: unterminated string in {query!r}")
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def _tr_expr(expr: str) -> str:
    """ES|QL expression -> Spark SQL: ``==`` becomes ``=`` and
    double-quoted strings become single-quoted (identifiers in ES|QL
    are bare or backquoted, never double-quoted)."""
    out: list[str] = []
    skeleton: list[str] = []  # the expr with string CONTENTS blanked —
    # the safety check applies to syntax, not literal text
    i, n = 0, len(expr)
    while i < n:
        ch = expr[i]
        if ch == '"':
            j = i + 1
            while j < n and expr[j] != '"':
                j += 1
            if j >= n:
                raise ValueError(f"ES|QL: unterminated string in {expr!r}")
            inner = expr[i + 1:j].replace("'", "''")
            out.append(f"'{inner}'")
            skeleton.append("''")
            i = j + 1
        elif ch == "'":
            j = i + 1
            while j < n and expr[j] != "'":
                j += 1
            out.append(expr[i:j + 1])
            skeleton.append("''")
            i = j + 1
        elif expr.startswith("==", i):
            out.append("=")
            skeleton.append("=")
            i += 2
        else:
            out.append(ch)
            skeleton.append(ch)
            i += 1
    if not _EXPR_SAFE_RE.match("".join(skeleton)):
        raise ValueError(f"ES|QL: unsupported expression syntax: {expr!r}")
    return "".join(out)


def _expr_col(expr: str) -> Column:
    return F.expr(_tr_expr(expr))


def _split_top_commas(s: str) -> list[str]:
    """Split on commas outside parentheses and strings."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    quote: str | None = None
    for ch in s:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


_ASSIGN_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+)$", re.DOTALL)


def _stats(df: DataFrame, arg: str) -> DataFrame:
    upper = arg.upper()
    by_idx = None
    # find a top-level BY (not inside parens/strings)
    depth = 0
    quote = None
    for i, ch in enumerate(arg):
        if quote:
            if ch == quote:
                quote = None
        elif ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and upper.startswith("BY", i) and (
            i == 0 or not arg[i - 1].isalnum()
        ) and (
            i + 2 >= len(arg) or not arg[i + 2].isalnum()
        ):
            by_idx = i
            break
    aggs_src = arg[:by_idx] if by_idx is not None else arg
    keys_src = arg[by_idx + 2:] if by_idx is not None else ""
    aggs = []
    for part in _split_top_commas(aggs_src):
        m = _ASSIGN_RE.match(part)
        if not m:
            raise ValueError(
                f"ES|QL STATS: each aggregate needs 'name = agg(..)': "
                f"{part!r}"
            )
        aggs.append(_expr_col(m.group(2)).alias(m.group(1)))
    if not aggs:
        raise ValueError(f"ES|QL STATS needs at least one aggregate: {arg}")
    keys = _split_top_commas(keys_src) if keys_src.strip() else []
    if keys:
        return df.groupBy(*[_expr_col(k) for k in keys]).agg(*aggs)
    return df.agg(*aggs)


def _sort(df: DataFrame, arg: str) -> DataFrame:
    cols = []
    for part in _split_top_commas(arg):
        toks = part.split()
        expr = toks[0]
        rest = [t.upper() for t in toks[1:]]
        desc = "DESC" in rest
        c = _expr_col(expr)
        c = c.desc() if desc else c.asc()
        if "NULLS" in rest:
            last = rest[rest.index("NULLS") + 1] == "LAST" \
                if rest.index("NULLS") + 1 < len(rest) else True
            base = _expr_col(expr)
            if desc:
                c = base.desc_nulls_last() if last else base.desc_nulls_first()
            else:
                c = base.asc_nulls_last() if last else base.asc_nulls_first()
        cols.append(c)
    return df.orderBy(*cols)


_GROK_ARG_RE = re.compile(
    r"^([A-Za-z_][A-Za-z0-9_.]*)\s+\"(.+)\"\s*$", re.DOTALL
)


def run_esql(query: str, tables: dict[str, DataFrame]) -> DataFrame:
    """Execute an ES|QL query against the caller's table map (the
    engine's stand-in for the cluster's index catalog). See the module
    docstring for the supported command set."""
    stages = _split_pipes(query)
    if not stages:
        raise ValueError("ES|QL: empty query")
    m = _CMD_RE.match(stages[0])
    if not m or m.group(1).upper() != "FROM":
        raise ValueError("ES|QL must start with FROM <index>")
    df: DataFrame | None = None
    for name in _split_top_commas(m.group(2)):
        if name not in tables:
            raise ValueError(
                f"ES|QL: unknown index {name!r} "
                f"(known: {sorted(tables)})"
            )
        part = tables[name]
        df = part if df is None else df.unionByName(
            part, allowMissingColumns=True
        )
    for stage in stages[1:]:
        m = _CMD_RE.match(stage)
        if not m:
            raise ValueError(f"ES|QL: cannot parse stage {stage!r}")
        cmd, arg = m.group(1).upper(), m.group(2).strip()
        if cmd == "WHERE":
            df = df.filter(_expr_col(arg))
        elif cmd == "EVAL":
            for part in _split_top_commas(arg):
                am = _ASSIGN_RE.match(part)
                if not am:
                    raise ValueError(
                        f"ES|QL EVAL needs 'name = expr': {part!r}"
                    )
                df = df.withColumn(am.group(1), _expr_col(am.group(2)))
        elif cmd == "STATS":
            df = _stats(df, arg)
        elif cmd == "SORT":
            df = _sort(df, arg)
        elif cmd == "LIMIT":
            df = df.limit(int(arg))
        elif cmd == "KEEP":
            df = df.select(*[c for c in _split_top_commas(arg)])
        elif cmd == "DROP":
            df = df.drop(*[c for c in _split_top_commas(arg)])
        elif cmd == "RENAME":
            for part in _split_top_commas(arg):
                rm = re.match(
                    r"^(\S+)\s+AS\s+(\S+)$", part, re.IGNORECASE
                )
                if not rm:
                    raise ValueError(
                        f"ES|QL RENAME needs 'old AS new': {part!r}"
                    )
                df = df.withColumnRenamed(rm.group(1), rm.group(2))
        elif cmd == "GROK":
            gm = _GROK_ARG_RE.match(arg)
            if not gm:
                raise ValueError(
                    f'ES|QL GROK needs: field "pattern" — got {arg!r}'
                )
            from ..grok import default_grok, grok_columns

            g = default_grok()
            g.add_pattern("__ESQL__", gm.group(2))
            df = df.select(
                "*", *grok_columns(g, gm.group(1), "__ESQL__")
            )
        elif cmd == "ENRICH":
            # ENRICH policy ON key [WITH f1, f2] — ES|QL's lookup
            # enrichment (the reference's app-metadata join, in pipe
            # syntax): the policy is a dimension frame in the table
            # map, matched on the shared key column and broadcast
            # (missing keys tolerate as NULLs, like the enrich
            # processor). WITH narrows the added fields.
            em = re.match(
                r"^(\S+)\s+ON\s+(\S+)(?:\s+WITH\s+(.+))?$",
                arg,
                re.IGNORECASE | re.DOTALL,
            )
            if not em:
                raise ValueError(
                    f"ES|QL ENRICH needs 'policy ON key [WITH ..]': "
                    f"{arg!r}"
                )
            policy, key, withs = em.group(1), em.group(2), em.group(3)
            if policy not in tables:
                raise ValueError(
                    f"ES|QL ENRICH: unknown policy {policy!r} "
                    f"(known: {sorted(tables)})"
                )
            dim = tables[policy]
            if key not in dim.columns:
                raise ValueError(
                    f"ES|QL ENRICH: policy {policy!r} has no match "
                    f"field {key!r}"
                )
            keep = (
                _split_top_commas(withs)
                if withs
                else [c for c in dim.columns if c != key]
            )
            df = df.join(
                F.broadcast(dim.select(key, *keep)), on=key, how="left"
            )
        elif cmd == "MV_EXPAND":
            df = df.withColumn(arg.strip(), F.explode(arg.strip()))
        elif cmd == "DISSECT":
            gm = _GROK_ARG_RE.match(arg)
            if not gm:
                raise ValueError(
                    f'ES|QL DISSECT needs: field "pattern" — got {arg!r}'
                )
            from .ingest import apply_ingest_pipeline

            df = apply_ingest_pipeline(
                df,
                [{"dissect": {"field": gm.group(1),
                              "pattern": gm.group(2)}}],
            )
        else:
            raise ValueError(
                f"ES|QL: unsupported command {cmd!r} (supported: FROM "
                "WHERE EVAL STATS SORT LIMIT KEEP DROP RENAME GROK "
                "DISSECT ENRICH MV_EXPAND)"
            )
    return df
