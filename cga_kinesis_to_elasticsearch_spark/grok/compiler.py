"""Grok pattern compiler: ``%{SYNTAX:semantic:type}`` -> one plain-group
regex + capture-group index map, derived entirely at plan time.

Reproduces the observable semantics of the reference's grok engine
(vendor/github.com/vjeantet/grok: ``denormalizePattern`` grok.go:319-367,
library management grok.go:112-184, dependency graph graph.go:13-58,
typed casts grok.go:228-259) with one deliberate dialect shift: instead
of Go named groups ``(?P<name>...)`` we emit *plain* capturing groups and
track each semantic's 1-based group index at compile time. The same
regex string is then valid in the Java dialect (Spark executors via
``regexp_extract(col, rx, idx)``) and in DuckDB (oracle SQL), and group
names never hit Java's no-underscores restriction.

Fidelity notes:
- every ``%{...}`` reference is wrapped in a group, so a quantifier after
  a reference binds to the whole expansion (e.g. ROUTERTIME's
  ``%{TIME}+``), exactly as the Go library compiles it;
- ``named_captures_only=True`` (default) captures only references with an
  explicit semantic; ``False`` reproduces the reference app's actual
  config (grok.Config zero value), where syntax names like BASE10NUM
  also appear as captures;
- duplicate capture names: last occurrence wins (Go map-assignment
  order, grok.go:218-225); ``parse_to_multimap`` keeps all;
- types: only ``int``/``float``/``string`` are legal (grok.go:241-250 —
  unknown type is an error, raised here at *compile* time).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import cached_property

from .patterns import APP_PATTERNS, DEFAULT_PATTERNS

__all__ = ["Capture", "CompiledPattern", "Grok", "GrokError", "default_grok"]

# %{SYNTAX}, %{SYNTAX:semantic}, %{SYNTAX:semantic:type}
# (same shape as the Go library's `normal` regex, grok.go:17)
_SYNTAX_RE = re.compile(r"%\{(\w+)(?::([\w@.\[\]\-]+))?(?::(\w+))?\}")

_VALID_TYPES = {"int", "float", "string"}

# Marker emitted during expansion, rewritten to a plain "(" afterwards.
_MARK = "(?P<GKMARK{i}>"
_MARK_RE = re.compile(r"\(\?P<GKMARK(\d+)>")


class GrokError(ValueError):
    """Compile-time grok error (unknown pattern, cycle, bad type)."""


@dataclass(frozen=True)
class Capture:
    """One named capture of a compiled pattern."""

    name: str
    group: int  # 1-based capturing-group index in CompiledPattern.regex
    type: str  # 'string' | 'int' | 'float'


@dataclass(frozen=True)
class CompiledPattern:
    """A fully-expanded grok pattern.

    ``regex`` contains only plain ``(...)`` / ``(?:...)`` groups, valid in
    Java, Go, RE2 and DuckDB dialects. ``captures`` lists every semantic
    in textual order (duplicates included).
    """

    source: str
    regex: str
    captures: tuple[Capture, ...]

    @cached_property
    def fields(self) -> tuple[Capture, ...]:
        """Captures deduped by name, last occurrence winning (the map
        overwrite order of grok.go:218-225), original order preserved."""
        last: dict[str, Capture] = {c.name: c for c in self.captures}
        seen: set[str] = set()
        out: list[Capture] = []
        for c in self.captures:
            if c.name in seen:
                continue
            seen.add(c.name)
            out.append(last[c.name])
        return tuple(out)

    @cached_property
    def python_regex(self) -> "re.Pattern[str]":
        # re.ASCII: Go's RE2 (the reference dialect) and Java's default
        # treat \w \d \s \b as ASCII; Python alone defaults to Unicode.
        # Compile ASCII so driver-side parse agrees with executor-side
        # regexp_extract and the DuckDB oracle on non-ASCII input.
        return re.compile(self.regex, re.ASCII)

    # -- driver-side (plan-time / test-time) row evaluation ------------

    def parse(self, text: str) -> dict[str, str]:
        """Pure-Python parse, mirroring grok Parse (grok.go:201-225):
        empty dict on no match; non-participating groups -> ''."""
        m = self.python_regex.search(text)
        if m is None:
            return {}
        return {c.name: m.group(c.group) or "" for c in self.fields}

    def parse_typed(self, text: str) -> dict[str, object]:
        """Typed parse per grok ParseTyped (grok.go:228-259)."""
        out: dict[str, object] = {}
        for name, raw in self.parse(text).items():
            typ = next(c.type for c in self.fields if c.name == name)
            if typ == "int":
                out[name] = int(raw) if raw else None
            elif typ == "float":
                out[name] = float(raw) if raw else None
            else:
                out[name] = raw
        return out

    def parse_to_multimap(self, text: str) -> dict[str, list[str]]:
        """Duplicate names accumulate (grok.go:264-283)."""
        m = self.python_regex.search(text)
        if m is None:
            return {}
        out: dict[str, list[str]] = {}
        for c in self.captures:
            out.setdefault(c.name, []).append(m.group(c.group) or "")
        return out

    def matches(self, text: str) -> bool:
        """Match predicate (grok.go:187-198)."""
        return self.python_regex.search(text) is not None


class Grok:
    """Pattern registry + compiler.

    Equivalent surface to the Go library's Config.Patterns /
    AddPatternsFromPath (grok.go:21-27, 112-184): a named pattern map
    that patterns may reference recursively; cycles are a compile error
    (graph.go:13-58 topo-sort's job in the reference — recursion with a
    visiting stack is equivalent here).
    """

    def __init__(
        self,
        patterns: dict[str, str] | None = None,
        include_defaults: bool = True,
        named_captures_only: bool = True,
    ) -> None:
        self._lib: dict[str, str] = dict(DEFAULT_PATTERNS) if include_defaults else {}
        if patterns:
            self._lib.update(patterns)
        self.named_captures_only = named_captures_only
        self._cache: dict[str, CompiledPattern] = {}

    # -- library management (G2) ---------------------------------------

    def add_pattern(self, name: str, body: str) -> None:
        self._lib[name] = body
        self._cache.clear()

    def add_patterns(self, patterns: dict[str, str]) -> None:
        self._lib.update(patterns)
        self._cache.clear()

    def add_patterns_from_text(self, text: str) -> None:
        """Load ``NAME regex`` lines (# comments), the PatternsDir file
        format of grok.go:150-184."""
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            name, _, body = line.partition(" ")
            if name and body:
                self.add_pattern(name, body)

    def add_patterns_from_path(self, path: "str | object") -> int:
        """Load every pattern file under a directory (or a single file)
        — the PatternsDir surface (grok.go:150-184; AddPatternsFromPath
        walks the dir and parses ``NAME regex`` lines). Returns the
        number of files loaded."""
        from pathlib import Path as _P

        p = _P(str(path))
        files = sorted(f for f in p.rglob("*") if f.is_file()) if p.is_dir() else [p]
        if not files or not p.exists():
            raise GrokError(f"no pattern files at {p}")
        for f in files:
            self.add_patterns_from_text(f.read_text())
        return len(files)

    def pattern_names(self) -> list[str]:
        return sorted(self._lib)

    # -- compilation (G1, G3) ------------------------------------------

    def compile(self, pattern: str) -> CompiledPattern:
        """Expand and compile; cached per pattern string (grok.go:290-317).

        ``pattern`` may be a raw grok expression or the name of a library
        pattern (convenience: ``compile("ROUTERACCESS")``).
        """
        if pattern in self._cache:
            return self._cache[pattern]
        source = self._lib.get(pattern, pattern) if "%{" not in pattern else pattern
        semantics: list[tuple[str, str]] = []  # (name, type) per marker id
        marked = self._expand(source, (), semantics)
        regex, group_of = _assign_group_indices(marked)
        captures = tuple(
            Capture(name=sem, group=group_of[i], type=typ)
            for i, (sem, typ) in enumerate(semantics)
            if i in group_of
        )
        compiled = CompiledPattern(source=source, regex=regex, captures=captures)
        try:
            re.compile(regex)
        except re.error as exc:  # pragma: no cover - guard
            raise GrokError(f"expanded regex failed to compile: {exc}") from exc
        self._cache[pattern] = compiled
        return compiled

    def _expand(
        self,
        pattern: str,
        stack: tuple[str, ...],
        semantics: list[tuple[str, str]],
    ) -> str:
        def repl(m: "re.Match[str]") -> str:
            syntax, semantic, typ = m.group(1), m.group(2), m.group(3)
            if syntax in stack:
                chain = " -> ".join((*stack, syntax))
                raise GrokError(f"cyclic pattern reference: {chain}")
            body = self._lib.get(syntax)
            if body is None:
                raise GrokError(f"no pattern found for %{{{syntax}}}")
            if typ is not None and typ not in _VALID_TYPES:
                raise GrokError(
                    f"invalid type '{typ}' for capture '{semantic}' "
                    f"(legal: int, float, string)"
                )
            sub = self._expand(body, (*stack, syntax), semantics)
            capture_name = semantic
            if capture_name is None and not self.named_captures_only:
                # Reference-app config: syntax name becomes the capture
                # (grok.go:324-326 semantic defaults to syntax).
                capture_name = syntax
            if capture_name is not None:
                marker_id = len(semantics)
                semantics.append((capture_name, typ or "string"))
                return _MARK.format(i=marker_id) + sub + ")"
            return "(?:" + sub + ")"

        return _SYNTAX_RE.sub(repl, pattern)


def _assign_group_indices(marked: str) -> tuple[str, dict[int, int]]:
    """Scan a marked regex, numbering capturing groups left-to-right.

    Returns the final plain-group regex (markers rewritten to ``(``) and
    a map marker-id -> 1-based group index. Handles escapes and
    character classes so a literal ``(`` inside ``[...]`` is not counted.
    """
    out: list[str] = []
    group_of: dict[int, int] = {}
    n_groups = 0
    i = 0
    in_class = False
    L = len(marked)
    while i < L:
        ch = marked[i]
        if ch == "\\" and i + 1 < L:
            out.append(marked[i : i + 2])
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
            out.append(ch)
            i += 1
            continue
        if ch == "[":
            in_class = True
            out.append(ch)
            i += 1
            # "[]" / "[^]" leading ] is literal
            if i < L and marked[i] == "^":
                out.append("^")
                i += 1
            if i < L and marked[i] == "]":
                out.append("]")
                i += 1
            continue
        if ch == "(":
            m = _MARK_RE.match(marked, i)
            if m:
                n_groups += 1
                group_of[int(m.group(1))] = n_groups
                out.append("(")
                i = m.end()
                continue
            if i + 1 < L and marked[i + 1] == "?":
                # conditional (?(id)...): the id parens are syntax, not
                # a capturing group — consume "(?(id)" whole
                if i + 2 < L and marked[i + 2] == "(":
                    j = marked.index(")", i + 2)
                    out.append(marked[i : j + 1])
                    i = j + 1
                    continue
                out.append(ch)  # non-capturing / lookaround / flags
                i += 1
                continue
            n_groups += 1
            out.append(ch)
            i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out), group_of


def default_grok(named_captures_only: bool = True) -> Grok:
    """Registry preloaded with the default library + the seven
    application patterns (main.go:558-568)."""
    return Grok(patterns=APP_PATTERNS, named_captures_only=named_captures_only)
