"""KQL — the Kibana Query Language, the DEFAULT syntax of the Kibana
search bar since 7.0 — parsed and lowered onto the engine's query-DSL
tree (operators/querydsl.compile_query), the same lowering target the
Lucene ``query_string`` parser uses, so every KQL query scores and
filters exactly like its DSL equivalent.

Reference context: the reference ships gorouter/app logs into the
indices Kibana fronts (main.go:447); KQL is what an operator types
into Discover's bar over those indices all day.

Supported grammar (a STRICT subset — anything outside it raises at
plan time rather than silently matching wrong):

- ``field:value``       — analyzed-token match (``_term_leaf``: plain
                          word -> match; ``*``/``?`` wildcards ->
                          token-level wildcard; bare ``*`` -> exists)
- ``field:"a phrase"``  — match_phrase
- ``field:(a or b)``    — grouped values, combined with and/or/not,
                          each applied to the field
- ``field > 5`` (also >= < <=) — range (numeric bounds coerced)
- ``a and b``, ``a or b``, ``not a`` — case-insensitive keywords;
  ``and`` binds tighter than ``or``; parentheses group
- bare values search ``default_field``/``fields`` (required for
  unfielded terms — the engine has no index mapping to infer ``*``)
- backslash escapes the specials ``\\():<>\"*?`` and whitespace

NOT lowered (loud): nested queries (``obj:{ ... }``), juxtaposed
terms without an operator (``foo bar`` — KQL's whitespace-OR is a
common source of accidental match-everything filters; write the
operator).

Scale shape: pure plan-time parsing — the output tree compiles to ONE
boolean Column like any query-DSL input; nothing row-side changes.
"""

from __future__ import annotations

import re

from .luceneq import _coerce, _fan_out, _term_leaf

__all__ = ["kql_to_dsl"]

_KEYWORDS = {"and", "or", "not"}
_RANGE_OPS = {">": "gt", ">=": "gte", "<": "lt", "<=": "lte"}
_SPECIALS = '():<>"'


def _lex(q: str) -> list[tuple]:
    """Token stream: ``lparen rparen colon op word phrase``. A word
    carries its escape mask (so ``\\*`` stays a literal star through
    ``_term_leaf``); the and/or/not keywords lex case-insensitively.
    """
    toks: list[tuple] = []
    i, n = 0, len(q)
    while i < n:
        ch = q[i]
        if ch.isspace():
            i += 1
            continue
        if ch == "(":
            toks.append(("lparen",))
            i += 1
            continue
        if ch == ")":
            toks.append(("rparen",))
            i += 1
            continue
        if ch == ":":
            toks.append(("colon",))
            i += 1
            continue
        if ch == "{":
            raise ValueError(
                "KQL: nested queries (field:{ ... }) are not lowered "
                "(the engine's frames are flat columns)"
            )
        if ch in "<>":
            op = ch
            if i + 1 < n and q[i + 1] == "=":
                op += "="
                i += 1
            toks.append(("op", _RANGE_OPS[op]))
            i += 1
            continue
        if ch == '"':
            j = i + 1
            buf: list[str] = []
            while j < n and q[j] != '"':
                if q[j] == "\\" and j + 1 < n:
                    buf.append(q[j + 1])
                    j += 2
                    continue
                buf.append(q[j])
                j += 1
            if j >= n:
                raise ValueError(f"KQL: unterminated phrase in {q!r}")
            toks.append(("phrase", "".join(buf)))
            i = j + 1
            continue
        # word: runs to whitespace or an unescaped special
        buf = []
        esc: list[bool] = []
        j = i
        while j < n:
            c = q[j]
            if c == "\\" and j + 1 < n:
                buf.append(q[j + 1])
                esc.append(True)
                j += 2
                continue
            if c.isspace() or c in _SPECIALS or c == "{":
                break
            buf.append(c)
            esc.append(False)
            j += 1
        word = "".join(buf)
        if not word:
            raise ValueError(f"KQL: cannot lex at {q[i:]!r}")
        low = word.lower()
        if low in _KEYWORDS and not any(esc):
            toks.append((low,))
        else:
            toks.append(("word", word, esc))
        i = j
    return toks


def _untag(node: dict) -> dict:
    return node


class _Parser:
    """Recursive descent, precedence ``or < and < not``."""

    def __init__(self, toks: list[tuple], fields: list[str] | None):
        self.toks = toks
        self.i = 0
        self.fields = fields

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self) -> dict:
        node = self._or(self._field_atom)
        if self.peek() is not None:
            raise ValueError(
                f"KQL: unexpected {self.peek()!r} after a complete "
                "query — juxtaposed terms need an explicit and/or"
            )
        return node

    # the boolean combinators are shared between the top level (atoms
    # are field queries) and a field-scoped value group (atoms are
    # values applied to one field) — `atom` is the difference
    def _or(self, atom) -> dict:
        parts = [self._and(atom)]
        while self.peek() == ("or",):
            self.next()
            parts.append(self._and(atom))
        if len(parts) == 1:
            return parts[0]
        return {"bool": {"should": parts, "minimum_should_match": 1}}

    def _and(self, atom) -> dict:
        parts = [self._not(atom)]
        while self.peek() == ("and",):
            self.next()
            parts.append(self._not(atom))
        if len(parts) == 1:
            return parts[0]
        return {"bool": {"must": parts}}

    def _not(self, atom) -> dict:
        if self.peek() == ("not",):
            self.next()
            return {"bool": {"must_not": [self._not(atom)]}}
        return atom()

    def _field_atom(self) -> dict:
        t = self.peek()
        if t is None:
            raise ValueError("KQL: empty query/group")
        if t == ("lparen",):
            self.next()
            node = self._or(self._field_atom)
            if self.next() != ("rparen",):
                raise ValueError("KQL: expected ')'")
            return node
        if t[0] == "phrase":
            self.next()
            return self._bare(("phrase", t[1]))
        if t[0] != "word":
            raise ValueError(f"KQL: unexpected {t!r}")
        self.next()
        nxt = self.peek()
        if nxt == ("colon",):
            self.next()
            return self._value_part(t[1])
        if nxt is not None and nxt[0] == "op":
            self.next()
            vt = self.next()
            if vt is None or vt[0] not in ("word", "phrase"):
                raise ValueError(
                    f"KQL: {t[1]} {nxt[1]} needs a literal bound"
                )
            if vt[0] == "word" and any(
                c in "*?" and not e for c, e in zip(vt[1], vt[2])
            ):
                raise ValueError(
                    f"KQL: range bound cannot be a wildcard: {vt[1]!r}"
                )
            return {"range": {t[1]: {nxt[1]: _coerce(vt[1])}}}
        return self._bare(("word", t[1], t[2]))

    def _bare(self, tok: tuple) -> dict:
        if self.fields is None:
            word = tok[1]
            raise ValueError(
                f"KQL: unfielded term {word!r} needs default_field "
                "or fields (the engine has no index mapping to infer "
                "a default * expansion from)"
            )
        if tok[0] == "phrase":
            return _fan_out(
                self.fields, lambda f: {"match_phrase": {f: tok[1]}}
            )
        return _fan_out(
            self.fields, lambda f: _term_leaf(f, tok[1], tok[2])
        )

    def _value_part(self, field: str) -> dict:
        t = self.next()
        if t is None:
            raise ValueError(f"KQL: {field}: needs a value")
        if t == ("lparen",):
            def value_atom() -> dict:
                vt = self.next()
                if vt is None:
                    raise ValueError(
                        f"KQL: {field}:( ... ) ended mid-expression"
                    )
                if vt == ("lparen",):
                    node = self._or(value_atom)
                    if self.next() != ("rparen",):
                        raise ValueError("KQL: expected ')'")
                    return node
                if vt[0] == "phrase":
                    return {"match_phrase": {field: vt[1]}}
                if vt[0] == "word":
                    return _term_leaf(field, vt[1], vt[2])
                raise ValueError(
                    f"KQL: unexpected {vt!r} in {field}:( ... )"
                )

            node = self._or(value_atom)
            if self.next() != ("rparen",):
                raise ValueError("KQL: expected ')'")
            return node
        if t[0] == "phrase":
            return {"match_phrase": {field: t[1]}}
        if t[0] == "word":
            return _term_leaf(field, t[1], t[2])
        raise ValueError(f"KQL: {field}: has no value (got {t!r})")


def kql_to_dsl(
    query: str,
    *,
    default_field: str | None = None,
    fields: list[str] | None = None,
) -> dict:
    """Parse a KQL query to the engine's query-DSL tree. Strict: any
    syntax outside the documented subset raises ValueError at plan
    time. ``default_field``/``fields`` back unfielded terms; a fully
    fielded query needs neither."""
    if fields and default_field:
        raise ValueError("KQL: give default_field OR fields, not both")
    flds = list(fields) if fields else (
        [default_field] if default_field else None
    )
    if flds is not None:
        bad = [f for f in flds if "^" in f]
        if bad:
            raise ValueError(
                f"KQL: per-field boost is not supported: {bad}"
            )
    toks = _lex(query)
    if not toks:
        raise ValueError("KQL: empty query")
    return _Parser(toks, flds).parse()
