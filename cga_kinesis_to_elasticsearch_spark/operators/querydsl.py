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
                   LIKE pattern (literal % _ escaped); ``\\`` escapes
                   the next char (Lucene WildcardQuery), so ``a\\*b``
                   is a literal star
- ``match``        {field: "query text"}     — analyzed OR: at least
                   one whitespace token occurs in the tokenized field
                   (``"operator": "and"`` requires all tokens)
- ``match_phrase`` {field: "a b c"}          — consecutive tokens, via
                   delimited-substring containment over the
                   whitespace-normalized text (exact for the engine's
                   whitespace analyzer); with ``slop``, an in-order
                   position chain where slop>=2 also buys adjacent
                   TRANSPOSITIONS at cost 2 (Lucene sloppy phrase)
- ``match_phrase_prefix`` {field: "a b c"}   — search-as-you-type:
                   leading tokens as a phrase, the last as a prefix at
                   the following position (``slop`` supported;
                   ``max_expansions`` rejected at plan time — every
                   expansion matches here)
- ``match_bool_prefix`` {field: "a b c"}     — each token a term
                   match, the last a prefix; ``operator`` /
                   ``minimum_should_match`` like ES's lowered bool
- ``intervals``    {field: {match|all_of|any_of}} — proximity rules
                   over per-token position arrays: ``match`` with
                   ``max_gaps``/``ordered`` (unordered to 3 tokens),
                   ``all_of``/``any_of`` as boolean combinators;
                   anything else rejected at plan time
- ``rank_feature`` {field, saturation|log|sigmoid[, boost]} — matches
                   positive-feature docs; scores saturation
                   S/(S+pivot), log ln(a*S+1) or sigmoid
                   S^e/(S^e+pivot^e) (explicit function required)
- ``distance_feature`` {field, origin, pivot[, boost]} — matches
                   docs with the field; scores boost*pivot/(pivot+
                   |field-origin|) (numeric origin/pivot)
- ``sparse_vector`` {field, query_vector: {term: weight}} — learned
                   sparse retrieval (ELSER/SPLADE): dot product of
                   the query expansion with the doc's
                   map<term, weight> field; matches docs holding any
                   query term
- ``match_all``    {}
- ``ids``          {"values": [...]}         — document identity; the
                   engine's ``_id`` is the frame's identity column
                   (``doc_id`` by default, override via ``id_col``)
- ``regexp``       {field: pattern}          — Java regex, ANCHORED
                   over the whole value like ES/Lucene
- ``fuzzy``        {field: {value[, fuzziness]}} — Levenshtein edit
                   distance against the keyword value; ``fuzziness``
                   an int or "AUTO" (ES's 0/1/2 by term length).
                   ES applies Lucene's max of 2 edits; so does AUTO.
- ``terms_set``    {field: {terms, minimum_should_match_field |
                   minimum_should_match_script}} — at least m of the
                   terms occur in the whitespace-analyzed field, m
                   per-doc from a column or a constant script
- ``geo_bounding_box`` {field: {top_left, bottom_right}} — the geo
                   field is a STRUCT column with ``lat``/``lon``
                   members; pure comparisons (planar semantics per
                   the repo's centi-degree geo convention).
- ``geo_distance`` {distance, field: {lat, lon}} — squared planar
                   distance vs squared radius, integer-exact;
                   ``distance`` is a number in the field's units (ES
                   geodesic unit strings are the documented
                   divergence, consistent with plans/geo.py).
- ``nested``       {path, query} — matches when ANY element of the
                   ``array<struct>`` field at ``path`` satisfies the
                   inner query on the SAME element (fields addressed
                   by full dotted path, like ES); lowered to one
                   codegen F.exists, no explode, no shuffle

- ``query_string`` {query, default_field|fields[, default_operator]}
                   — Kibana's search-bar Lucene syntax, parsed and
                   LOWERED to this same DSL (operators/luceneq.py);
                   syntax errors fail at plan time
- ``simple_query_string`` — the error-tolerant variant (``+ | -``
                   operators, phrases, trailing-``*`` prefix); query
                   text never raises, invalid parts are discarded

Compound:

- ``bool`` with ``must`` / ``filter`` (AND), ``must_not`` (NOR) and
  ``should`` with ES's ``minimum_should_match``: explicit integer /
  negative / percentage forms (``3``, ``-1``, ``"75%"``, ``"-25%"``),
  defaulting to 1 when the bool has no must/filter context, else 0.
- ``constant_score`` {"filter": query} — the wrapped filter
- ``boosting``       {positive, negative, negative_boost} — matches
  positive; where negative also matches, the score multiplies by
  negative_boost (demote, don't exclude)
- ``pinned``         {ids, organic} — promoted ids first in list
  order above every organic hit, then organic by its own score
- ``span_term`` / ``span_near`` / ``span_first`` — Lucene span
  queries over per-token positions: span_near with ``slop`` /
  ``in_order`` (unordered to 3 clauses via permutations), span_first
  with an ``end`` bound; span clauses must be span_terms (nested
  span compounds rejected at plan time)
- ``case_insensitive: true`` on term / prefix / wildcard long forms
  (both sides lowercased)
- ``dis_max``        {"queries": [...]} — union of the branches
  (filter context: a doc matches if any branch matches; scoring
  context: best matching branch + ``tie_breaker`` x the others)
- ``multi_match``    {"query": text, "fields": [...]}
  — ``match`` over each field, doc matches if any field matches
  (best_fields, ES's default type); under score order the score is
  the best per-field BM25, again best_fields

Scoring context: ``run_search_body`` computes a real ``_score`` when
the request asks for score-ordered hits (an explicit ``_score`` sort,
or no ``sort`` at all with a hit-list request — ES's default order):

- a top-level ``match`` query scores with the Lucene practical BM25
  (k1=1.2, b=0.75, idf = ln(1+(N-df+0.5)/(df+0.5))) over the
  whitespace-analyzed field, with corpus statistics (N, avgdl, df)
  taken from the FULL index frame like ES takes them from the shard,
  not from the filtered set;
- a top-level ``function_score`` wraps a scored query with functions
  — decay (``gauss`` / ``exp`` / ``linear``), ``field_value_factor``
  (all ES modifiers + ``missing``), ``script_score``, bare ``weight``
  — each with an optional per-function ``filter``; matching
  functions' weighted values combine under ``score_mode`` (multiply /
  sum / avg / max / min / first), cap at ``max_boost``, merge with
  the inner query's score under ``boost_mode`` (multiply / replace /
  sum / avg / max / min), and ``min_score`` excludes low-scoring
  docs;
- a top-level ``multi_match`` scores best_fields (max per-field BM25);
- ``script_score`` computes ``_score`` from a painless-subset script
  (``doc['field'].value`` + arithmetic, plan-time rejection);
- ``rescore`` re-scores only the top ``window_size`` hits of the
  primary order (query_weight/rescore_query_weight combination);
  hits beyond the window keep their primary scores AFTER the
  rescored set, like ES;
- the ``knn`` section is an exact cosine top-k with ES's (1+cos)/2
  dense-vector scaling (indexed variants: operators/similarity.py);
  with ``query`` alongside it runs ES 8 hybrid search — additive
  scores, or reciprocal-rank fusion under ``rank: {rrf: ...}``;
- the ``suggest`` section (term suggester) returns did-you-mean
  corrections for tokens missing from the index vocabulary.

Every hit list is made deterministic with a ``_doc`` tie-break: after
the requested sort keys the engine appends the document-identity
column (``doc_id`` / ``id`` / ``event_id`` if present, else every
remaining column) so tied sort keys can never make the selected
top-N set engine- or partitioning-dependent.

Scale: the compiled predicate is a plain boolean expression —
Catalyst pushes the pushable conjuncts to the parquet scan
(PushedFilters) and codegens the rest; a 50-clause bool costs one
scan, zero joins, zero UDFs.
"""

from __future__ import annotations

import functools
import operator as _op

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "compile_query",
    "apply_query",
    "run_search_body",
    "run_msearch",
    "run_count_body",
]

_RANGE_OPS = {"gte": _op.ge, "gt": _op.gt, "lte": _op.le, "lt": _op.lt}

# multi_match types -> the per-field leaf each expands to
# (cross_fields is term-centric and handled separately)
_MM_TYPES = {
    "best_fields": "match",
    "most_fields": "match",
    "cross_fields": None,
    "phrase": "match_phrase",
    "phrase_prefix": "match_phrase_prefix",
    "bool_prefix": "match_bool_prefix",
}


# Analyzers: the engine's default stays WHITESPACE (the documented
# divergence from ES's standard default); per-request ``analyzer``
# selects ``standard`` — lowercase + split on any run of characters
# that are not Unicode letters or digits (\p{L}\p{N}), so accented /
# non-Latin text tokenizes like ES's standard analyzer for the common
# cases ("café au lait" -> [café, au, lait]). Identical to the old
# ASCII reading on ASCII text. Documented divergence from full UAX#29:
# no CJK ideogram-per-token splitting, and connector punctuation
# (a_b) separates where ES keeps one token. The DuckDB oracle form is
# list_filter(string_split_regex(lower(t), '[^\\p{L}\\p{N}]+'),
# x -> x <> '') — probed identical across Java regex / RE2 / Python.
_ANALYZERS = ("whitespace", "standard")


def _tokens(col: Column, analyzer: str = "whitespace") -> Column:
    if analyzer == "standard":
        return F.filter(
            F.split(F.lower(col), r"[^\p{L}\p{N}]+"), lambda t: t != ""
        )
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def _check_analyzer(a: str) -> str:
    if a not in _ANALYZERS:
        raise ValueError(
            f"unsupported analyzer {a!r} (supported: {_ANALYZERS})"
        )
    return a


def _analyze_text(text, analyzer: str) -> list[str]:
    """Analyze literal QUERY text the same way ``_tokens`` analyzes
    the field, so query and field tokens always agree."""
    if analyzer == "standard":
        import re

        # [\W_]+ == runs of non-(letter|digit): Python's unicode \w
        # minus the underscore — agrees with the Java/RE2
        # [^\p{L}\p{N}]+ split (probed on accented/non-Latin text)
        return [t for t in re.split(r"[\W_]+", str(text).lower()) if t]
    return [t for t in str(text).split() if t]


def _eq_positions(toks: Column, t: str) -> Column:
    """Positions (0-based) where the token array equals ``t``."""
    # closure factories, NOT default-arg lambdas: PySpark decides the
    # (x) vs (x, i) HOF form from the lambda's PARAMETER COUNT, so a
    # bound default would silently become the index argument
    return F.filter(
        F.transform(
            toks,
            lambda x, i: F.when(x == F.lit(t), i).otherwise(F.lit(-1)),
        ),
        lambda p: p >= 0,
    )


def _prefix_positions(toks: Column, prefix: str) -> Column:
    """Positions where a token STARTS WITH ``prefix`` (the expanded
    multi-term terminal of phrase_prefix — Lucene expands against the
    index terms; positions over the analyzed array are equivalent)."""
    return F.filter(
        F.transform(
            toks,
            lambda x, i: F.when(
                x.startswith(prefix), i
            ).otherwise(F.lit(-1)),
        ),
        lambda p: p >= 0,
    )


def _chain_cond(pos: list[Column], max_gaps: int | None) -> Column:
    """True when the position arrays admit an IN-ORDER chain (each
    later list takes its smallest position after the previous — greedy
    minimizes the end, hence the gaps, for every start), with total
    intervening positions bounded by ``max_gaps`` (None = unbounded).

    Scale shape: pure in-row HOFs (one transform + k filters per
    candidate start) — no explode, no shuffle; cost bounded by
    positions(first) x k array scans per row."""
    k = len(pos)
    if k == 1:
        return F.size(pos[0]) > 0

    # closure helper, NOT a default-arg lambda: a 2-param lambda would
    # select PySpark's (element, index) HOF form and clobber the bound
    # accumulator with the array index
    def _next_after(arr: Column, prev: Column) -> Column:
        return F.array_min(F.filter(arr, lambda p: p > prev))

    def chain(p1: Column) -> Column:
        acc = p1
        for arr in pos[1:]:
            acc = _next_after(arr, acc)
        return acc

    if max_gaps is None:
        test = lambda p1: chain(p1).isNotNull()  # noqa: E731
    else:
        test = lambda p1: (  # noqa: E731
            chain(p1) - p1 - F.lit(k - 1) <= F.lit(max_gaps)
        )
    return F.coalesce(F.exists(pos[0], test), F.lit(False))


def _transposition_orders(
    k: int, slop: int
) -> list[tuple[tuple[int, ...], int]]:
    """Token orderings a sloppy phrase may match in: the identity
    order with the full slop budget, plus every set of NON-OVERLAPPING
    adjacent transpositions, each costing 2 slop (Lucene's sloppy-
    phrase transposition cost). Returns (index order, residual gap
    budget) pairs; bounded by 64 variants at plan time."""
    out: list[tuple[tuple[int, ...], int]] = [(tuple(range(k)), slop)]

    def rec(cur: tuple[int, ...], start: int, rem: int) -> None:
        for i in range(start, k - 1):
            if rem < 2:
                return
            nxt = cur[:i] + (cur[i + 1], cur[i]) + cur[i + 2:]
            out.append((nxt, rem - 2))
            rec(nxt, i + 2, rem - 2)

    rec(tuple(range(k)), 0, slop)
    if len(out) > 64:
        raise ValueError(
            f"match_phrase slop: {len(out)} transposition variants "
            f"(k={k}, slop={slop}) exceed the 64-variant plan budget"
        )
    return out


def _phrase_slop(toks: Column, q_toks: list[str], slop: int) -> Column:
    """``match_phrase`` with ``slop``: the query tokens occur with at
    most ``slop`` total intervening positions, in order — or with
    adjacent-token TRANSPOSITIONS, each consuming 2 of the slop budget
    (Lucene sloppy-phrase semantics: "a b"~2 matches "b a", ~1 does
    not). Lowered as an OR over the bounded transposition orders, each
    an in-order greedy chain over per-token position arrays."""
    pos = {t: _eq_positions(toks, t) for t in dict.fromkeys(q_toks)}
    arrays = [pos[t] for t in q_toks]
    conds = [
        _chain_cond([arrays[i] for i in order], budget)
        for order, budget in _transposition_orders(len(q_toks), slop)
    ]
    return functools.reduce(_op.or_, conds)


_INTERVALS_RULES = ("match", "all_of", "any_of")


def _intervals_expr(col: Column, rule: dict) -> Column:
    """ES ``intervals`` query, minimal useful subset over the per-token
    position arrays: the ``match`` rule (``max_gaps`` bounds the
    intervening positions, ``ordered`` pins token order; unordered is
    lowered as an OR over permutations, supported to 3 tokens) and the
    ``all_of`` / ``any_of`` combinators (as boolean AND / OR of their
    sub-rules' interval existence; ``all_of`` with its own ``ordered``
    or ``max_gaps`` would need interval-endpoint algebra and is
    rejected at plan time, like every unsupported rule)."""
    if not isinstance(rule, dict) or len(rule) != 1:
        raise ValueError(f"intervals needs exactly one rule: {rule}")
    (rk, spec), = rule.items()
    if rk == "match":
        unknown = set(spec) - {"query", "max_gaps", "ordered", "analyzer"}
        if unknown:
            raise ValueError(
                f"intervals match: unsupported options {sorted(unknown)}"
            )
        analyzer = _check_analyzer(spec.get("analyzer", "whitespace"))
        q_toks = _analyze_text(spec.get("query", ""), analyzer)
        if not q_toks:
            raise ValueError(f"intervals match needs query tokens: {spec}")
        max_gaps = int(spec.get("max_gaps", -1))
        gaps = None if max_gaps < 0 else max_gaps
        toks = _tokens(col, analyzer)
        pos = {t: _eq_positions(toks, t) for t in dict.fromkeys(q_toks)}
        if spec.get("ordered") or len(q_toks) == 1:
            return _chain_cond([pos[t] for t in q_toks], gaps)
        if len(q_toks) > 3:
            raise ValueError(
                "intervals match: unordered supports up to 3 tokens "
                f"(permutation lowering): {q_toks}"
            )
        import itertools

        return functools.reduce(
            _op.or_,
            [
                _chain_cond([pos[t] for t in perm], gaps)
                for perm in sorted(set(itertools.permutations(q_toks)))
            ],
        )
    if rk in ("all_of", "any_of"):
        extra = set(spec) - {"intervals"}
        if extra:
            raise ValueError(
                f"intervals {rk}: only the intervals list is supported "
                f"(sub-interval {sorted(extra)} needs endpoint algebra)"
            )
        subs = spec.get("intervals")
        if not subs:
            raise ValueError(f"intervals {rk} needs intervals: {spec}")
        parts = [
            F.coalesce(_intervals_expr(col, s), F.lit(False)) for s in subs
        ]
        return functools.reduce(
            _op.and_ if rk == "all_of" else _op.or_, parts
        )
    raise ValueError(
        f"intervals: unsupported rule {rk!r} (supported: {_INTERVALS_RULES})"
    )


def _sparse_vector_score(body: dict, resolve=None) -> Column:
    """``sparse_vector`` scoring: the dot product of the request's
    ``query_vector`` (term -> weight dict, what an ELSER/SPLADE-style
    encoder emits) with the document's map<term, weight> field —
    learned sparse retrieval as one codegen expression (try_element_at
    per query term; absent terms contribute 0). The query vector is
    bounded (model top-k expansions), so the expression stays small."""
    r = resolve or F.col
    field = body.get("field")
    qv = body.get("query_vector")
    if not field or not isinstance(qv, dict) or not qv:
        raise ValueError(
            "sparse_vector needs field and a non-empty query_vector "
            f"dict: {body}"
        )
    bad = [t for t, w in qv.items() if not isinstance(w, (int, float))]
    if bad:
        raise ValueError(f"sparse_vector: non-numeric weights for {bad}")
    if len(qv) > 256:
        raise ValueError(
            f"sparse_vector: query_vector has {len(qv)} terms (cap 256 "
            "— pass the encoder's top expansions)"
        )
    m = r(field)
    return functools.reduce(
        _op.add,
        [
            F.lit(float(w))
            * F.coalesce(
                F.try_element_at(m, F.lit(str(t))).cast("double"),
                F.lit(0.0),
            )
            for t, w in qv.items()
        ],
    )


def _rank_feature_score(body: dict) -> Column:
    """ES ``rank_feature`` scoring: saturation ``S/(S+pivot)``, log
    ``ln(scaling_factor*S + 1)`` or sigmoid ``S^e/(S^e + pivot^e)``
    over the positive numeric feature column, times ``boost``. The
    function must be EXPLICIT — ES's default saturation pivot is an
    index statistic (approximate geometric mean) this engine does not
    maintain, so omitting it fails at plan time."""
    field = body.get("field")
    if not field:
        raise ValueError(f"rank_feature needs a field: {body}")
    unknown = set(body) - {"field", "boost", "saturation", "log", "sigmoid"}
    if unknown:
        raise ValueError(
            f"rank_feature: unsupported options {sorted(unknown)}"
        )
    fns = [k for k in ("saturation", "log", "sigmoid") if k in body]
    if len(fns) != 1:
        raise ValueError(
            "rank_feature needs exactly one explicit function "
            "(saturation {pivot} / log {scaling_factor} / sigmoid "
            f"{{pivot, exponent}}): {body}"
        )
    s = F.col(field).cast("double")
    if fns[0] == "saturation":
        pivot = float(body["saturation"]["pivot"])
        if pivot <= 0:
            raise ValueError(f"rank_feature saturation: bad pivot {pivot}")
        val = s / (s + F.lit(pivot))
    elif fns[0] == "log":
        a = float(body["log"]["scaling_factor"])
        val = F.log(F.lit(a) * s + F.lit(1.0))
    else:
        pivot = float(body["sigmoid"]["pivot"])
        e = float(body["sigmoid"]["exponent"])
        if pivot <= 0 or e <= 0:
            raise ValueError(f"rank_feature sigmoid: bad params {body}")
        val = F.pow(s, F.lit(e)) / (F.pow(s, F.lit(e)) + F.lit(pivot**e))
    return val * F.lit(float(body.get("boost", 1.0)))


def _distance_feature_score(body: dict) -> Column:
    """ES ``distance_feature`` scoring: ``boost * pivot / (pivot +
    |field - origin|)`` — rank boosting by closeness to an origin.
    Numeric origin/pivot only (dates: pass epoch numbers — the engine
    has no field mapping to read a duration pivot against)."""
    for key in ("field", "origin", "pivot"):
        if key not in body:
            raise ValueError(f"distance_feature needs {key}: {body}")
    unknown = set(body) - {"field", "origin", "pivot", "boost"}
    if unknown:
        raise ValueError(
            f"distance_feature: unsupported options {sorted(unknown)}"
        )
    origin, pivot = body["origin"], body["pivot"]
    if (
        isinstance(origin, bool)
        or isinstance(pivot, bool)
        or not isinstance(origin, (int, float))
        or not isinstance(pivot, (int, float))
        or pivot <= 0
    ):
        raise ValueError(
            "distance_feature: origin and pivot must be numbers "
            f"(pivot > 0); dates go in as epoch numbers: {body}"
        )
    dist = F.abs(F.col(body["field"]).cast("double") - F.lit(float(origin)))
    return (
        F.lit(float(body.get("boost", 1.0)))
        * F.lit(float(pivot))
        / (F.lit(float(pivot)) + dist)
    )


def _wildcard_to_like(pattern: str) -> str:
    """Lucene wildcard pattern -> SQL LIKE pattern. ``\\`` escapes the
    next character (Lucene WildcardQuery semantics), so ``foo\\*bar*``
    keeps the first star literal and only the trailing one is a
    wildcard; literal ``%``/``_``/``\\`` are LIKE-escaped."""
    out = []
    i = 0
    n = len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            out.append("\\" + nxt if nxt in ("%", "_", "\\") else nxt)
            i += 2
            continue
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def _combined_col(body: dict, resolve=None) -> Column:
    """The synthesized single-field view of a ``combined_fields``
    body: the fields' string values joined with spaces (missing
    fields contribute nothing), so one tokenization covers them all
    with summed term frequencies and a shared document length."""
    fields = body.get("fields")
    if not fields or "query" not in body:
        raise ValueError(f"combined_fields needs query and fields: {body}")
    if any("^" in f for f in fields):
        raise ValueError(
            "combined_fields: per-field boosts are not supported "
            f"(equal weights only): {fields}"
        )
    r = resolve or F.col
    return F.concat_ws(
        " ", *[F.coalesce(r(f).cast("string"), F.lit("")) for f in fields]
    )


def _span_term_of(clause: dict) -> tuple[str, str]:
    """The (field, term) of a span clause that must be a ``span_term``
    — nested span compounds (span_near in span_near) would need
    interval-endpoint algebra and are rejected at plan time."""
    if not isinstance(clause, dict) or set(clause) != {"span_term"}:
        raise ValueError(f"span clause here must be a span_term: {clause}")
    field, value = _one_field("span_term", clause["span_term"])
    if isinstance(value, dict):
        value = value["value"]
    return field, str(value)


def _one_field(kind: str, body: dict) -> tuple[str, object]:
    if not isinstance(body, dict) or len(body) != 1:
        raise ValueError(f"{kind} must target exactly one field: {body}")
    return next(iter(body.items()))


def _auto_fuzziness(term: str) -> int:
    """ES "AUTO": 0 edits below 3 chars, 1 up to 5, else 2."""
    n = len(term)
    return 0 if n < 3 else 1 if n <= 5 else 2


import re as _re

_DM_UNITS = {
    "y": ("year", "YEAR"),
    "M": ("month", "MONTH"),
    "w": ("week", "WEEK"),
    "d": ("day", "DAY"),
    "h": ("hour", "HOUR"),
    "H": ("hour", "HOUR"),
    "m": ("minute", "MINUTE"),
    "s": ("second", "SECOND"),
}

_DM_ANCHOR_RE = _re.compile(
    r"^\d{4}-\d{2}-\d{2}([T ]\d{2}:\d{2}(:\d{2}(\.\d+)?)?)?$"
)
_DM_OP_RE = _re.compile(r"([+\-]\d+[yMwdhHms]|/[yMwdhHms])")
# a now-anchored bound is date math only when the WHOLE string is
# valid date-math grammar — a plain string that merely starts with
# "now" ("nowhere") stays a literal lexicographic comparison, like ES
# (date math applies to date fields only)
_DM_NOW_RE = _re.compile(r"^now([+\-]\d+[yMwdhHms]|/[yMwdhHms])*$")


def _date_math_expr(s: str) -> Column | None:
    """ES date math in range bounds — the syntax Kibana's time picker
    sends: ``now-7d/d``, ``2024-01-15||+1M/d``. Returns a timestamp
    Column, or None when the string is not date math (a plain literal
    stays a plain comparison). ``now`` is Spark's query-stable
    current_timestamp; the math lowers to INTERVAL arithmetic and
    date_trunc — plain codegen, still pushdown-friendly because the
    whole expression folds to a literal instant at optimization."""
    if _DM_NOW_RE.match(s):
        anchor, math = F.current_timestamp(), s[3:]
    elif "||" in s:
        raw, math = s.split("||", 1)
        if not _DM_ANCHOR_RE.match(raw):
            raise ValueError(f"date math: bad anchor {raw!r} in {s!r}")
        anchor = F.to_timestamp(F.lit(raw.replace("T", " ")))
    else:
        return None
    pos = 0
    expr = anchor
    for m in _DM_OP_RE.finditer(math):
        if m.start() != pos:
            raise ValueError(f"date math: cannot parse {s!r}")
        pos = m.end()
        tok = m.group(0)
        if tok[0] == "/":
            expr = F.date_trunc(_DM_UNITS[tok[1]][0], expr)
        else:
            n = int(tok[:-1])  # keeps the sign
            unit = _DM_UNITS[tok[-1]][1]
            expr = expr + F.expr(f"INTERVAL '{n}' {unit}")
    if pos != len(math):
        raise ValueError(f"date math: cannot parse {s!r}")
    return expr


def compile_query(
    dsl: dict, *, id_col: str = "doc_id", resolve=None
) -> Column:
    """Lower an ES query-DSL dict (filter-context subset, see module
    docstring) to one boolean Column. Raises ValueError at plan time
    on anything unsupported. ``id_col`` names the frame's document
    identity column — what ES calls ``_id`` — for the ``ids`` query.
    ``resolve`` maps a field name to a Column (default ``F.col``);
    the ``nested`` query rebinds it to array-element access."""
    if resolve is None:
        resolve = F.col
    if not isinstance(dsl, dict) or len(dsl) != 1:
        raise ValueError(f"query must have exactly one root clause: {dsl}")
    kind, body = next(iter(dsl.items()))

    if kind == "query_string":
        from .luceneq import query_string_to_dsl

        return compile_query(
            query_string_to_dsl(body), id_col=id_col, resolve=resolve
        )
    if kind == "simple_query_string":
        from .luceneq import simple_query_string_to_dsl

        return compile_query(
            simple_query_string_to_dsl(body), id_col=id_col, resolve=resolve
        )
    # Internal token-level leaves — the lowering targets of
    # operators/luceneq.py: Lucene query syntax runs multi-term
    # queries against the ANALYZED tokens of a text field (ES expands
    # them against the index terms), unlike the public wildcard/
    # prefix/fuzzy leaves, which are whole-value (keyword semantics).
    if kind == "_token_wildcard":
        field, pattern = _one_field(kind, body)
        like = _wildcard_to_like(str(pattern))
        return F.exists(
            _tokens(resolve(field)), lambda t: t.like(like)
        )
    if kind == "_token_prefix":
        field, value = _one_field(kind, body)
        return F.exists(
            _tokens(resolve(field)), lambda t: t.startswith(str(value))
        )
    if kind == "_token_fuzzy":
        field, spec = _one_field(kind, body)
        if not isinstance(spec, dict) or "value" not in spec:
            raise ValueError(f"_token_fuzzy needs {{'value': term}}: {body}")
        term = str(spec["value"])
        fz = spec.get("fuzziness", "AUTO")
        edits = _auto_fuzziness(term) if fz == "AUTO" else int(fz)
        if not 0 <= edits <= 2:
            raise ValueError(f"_token_fuzzy: fuzziness must be 0..2: {fz!r}")
        return F.exists(
            _tokens(resolve(field)),
            lambda t: F.levenshtein(t, F.lit(term)) <= F.lit(edits),
        )
    if kind == "ids":
        if not isinstance(body, dict) or not body.get("values"):
            raise ValueError(f"ids needs non-empty values: {body}")
        return resolve(id_col).isin(*body["values"])
    if kind == "regexp":
        field, value = _one_field(kind, body)
        if isinstance(value, dict):
            value = value["value"]
        # Lucene regexp queries are anchored: the pattern must match
        # the ENTIRE value, so wrap in ^(...)$ for Java regex
        return resolve(field).rlike(f"^({value})$")
    if kind == "fuzzy":
        field, spec = _one_field(kind, body)
        if not isinstance(spec, dict) or "value" not in spec:
            raise ValueError(f"fuzzy needs {{'value': term}}: {body}")
        term = str(spec["value"])
        fuzz = spec.get("fuzziness", "AUTO")
        edits = _auto_fuzziness(term) if fuzz == "AUTO" else int(fuzz)
        if not 0 <= edits <= 2:
            raise ValueError(f"fuzzy: fuzziness must be 0..2: {fuzz!r}")
        return F.levenshtein(resolve(field), F.lit(term)) <= F.lit(edits)
    if kind == "terms_set":
        field, spec = _one_field(kind, body)
        terms = spec.get("terms") if isinstance(spec, dict) else None
        if not terms:
            raise ValueError(f"terms_set needs non-empty terms: {body}")
        msm_field = spec.get("minimum_should_match_field")
        msm_script = spec.get("minimum_should_match_script")
        if (msm_field is None) == (msm_script is None):
            raise ValueError(
                "terms_set needs exactly one of "
                "minimum_should_match_field / _script"
            )
        if msm_field is not None:
            m = resolve(msm_field)
        else:
            src = str(msm_script.get("source", "")).strip()
            if not src.isdigit():
                raise ValueError(
                    "terms_set: only constant-number "
                    f"minimum_should_match_script supported: {src!r}"
                )
            m = F.lit(int(src))
        toks = _tokens(resolve(field))
        hits = [
            F.array_contains(toks, str(t)).cast("int") for t in terms
        ]
        return functools.reduce(_op.add, hits) >= m
    if kind == "wrapper":
        # base64-encoded query JSON — how client libraries ship opaque
        # queries through strictly-typed APIs; decoded and compiled at
        # plan time like any inline query
        import base64
        import json

        if not isinstance(body, dict) or "query" not in body:
            raise ValueError(f"wrapper needs a base64 query: {body}")
        try:
            inner = json.loads(base64.b64decode(str(body["query"])))
        except Exception as exc:
            raise ValueError(f"wrapper: cannot decode query: {exc}")
        return compile_query(inner, id_col=id_col, resolve=resolve)
    if kind == "constant_score":
        if not isinstance(body, dict) or set(body) != {"filter"}:
            raise ValueError(f"constant_score needs a filter: {body}")
        return compile_query(body["filter"], id_col=id_col, resolve=resolve)
    if kind == "dis_max":
        queries = body.get("queries") if isinstance(body, dict) else None
        if not queries:
            raise ValueError(f"dis_max needs queries: {body}")
        return functools.reduce(
            _op.or_,
            [
                F.coalesce(compile_query(sub, id_col=id_col, resolve=resolve), F.lit(False))
                for sub in queries
            ],
        )
    if kind == "multi_match":
        if not isinstance(body, dict) or not body.get("fields"):
            raise ValueError(f"multi_match needs query and fields: {body}")
        mm_type = body.get("type", "best_fields")
        if mm_type not in _MM_TYPES:
            raise ValueError(
                f"multi_match: unsupported type {mm_type!r} "
                f"(supported: {sorted(_MM_TYPES)})"
            )
        mm_analyzer = _check_analyzer(body.get("analyzer", "whitespace"))
        fields = body["fields"]
        if mm_type == "cross_fields":
            # term-centric: EACH term must occur in at least one field
            # (under operator and; any term anywhere under or) — the
            # "first_name/last_name" query where field-centric and
            # would wrongly demand both terms in ONE field
            q_toks = _analyze_text(body["query"], mm_analyzer)
            if not q_toks:
                raise ValueError(f"multi_match needs query tokens: {body}")
            per_term = [
                functools.reduce(
                    _op.or_,
                    [
                        F.coalesce(
                            F.array_contains(
                                _tokens(resolve(f), mm_analyzer), t
                            ),
                            F.lit(False),
                        )
                        for f in fields
                    ],
                )
                for t in q_toks
            ]
            red = _op.and_ if body.get("operator", "or") == "and" else _op.or_
            return functools.reduce(red, per_term)
        leaf_kind = _MM_TYPES[mm_type]
        spec: dict = {"query": body["query"], "analyzer": mm_analyzer}
        if mm_type in ("best_fields", "most_fields", "bool_prefix"):
            spec["operator"] = body.get("operator", "or")
        if mm_type in ("phrase", "phrase_prefix") and "slop" in body:
            spec["slop"] = int(body["slop"])
        per_field = [
            compile_query(
                {leaf_kind: {f: dict(spec)}}, id_col=id_col,
                resolve=resolve,
            )
            for f in fields
        ]
        return functools.reduce(
            _op.or_,
            [F.coalesce(p, F.lit(False)) for p in per_field],
        )
    if kind == "nested":
        if not isinstance(body, dict) or "path" not in body \
                or "query" not in body:
            raise ValueError(f"nested needs path and query: {body}")
        path = body["path"]
        prefix = path + "."

        def _element_resolve(e):
            def _r(f: str) -> Column:
                if f == path:
                    raise ValueError(
                        f"nested: field {f!r} must address a member "
                        f"of {path!r}"
                    )
                member = f[len(prefix):] if f.startswith(prefix) else f
                return e[member]

            return _r

        arr = resolve(path)
        # ES nested semantics: the doc matches if ANY element of the
        # nested array matches the inner query (fields addressed by
        # their full dotted path, like ES)
        return F.coalesce(
            F.exists(
                arr,
                lambda e: F.coalesce(
                    compile_query(
                        body["query"],
                        id_col=id_col,
                        resolve=_element_resolve(e),
                    ),
                    F.lit(False),
                ),
            ),
            F.lit(False),
        )
    if kind == "geo_bounding_box":
        field, box = _one_field(kind, body)
        try:
            tl, br = box["top_left"], box["bottom_right"]
        except (KeyError, TypeError):
            raise ValueError(
                f"geo_bounding_box needs top_left/bottom_right: {body}"
            )
        pt = resolve(field)
        return (
            (pt["lat"] <= F.lit(tl["lat"]))
            & (pt["lat"] >= F.lit(br["lat"]))
            & (pt["lon"] >= F.lit(tl["lon"]))
            & (pt["lon"] <= F.lit(br["lon"]))
        )
    if kind == "geo_distance":
        if not isinstance(body, dict) or "distance" not in body:
            raise ValueError(f"geo_distance needs a distance: {body}")
        rest = {k: v for k, v in body.items() if k != "distance"}
        if len(rest) != 1:
            raise ValueError(
                f"geo_distance must name exactly one geo field: {body}"
            )
        (field, origin), = rest.items()
        try:
            olat, olon = origin["lat"], origin["lon"]
        except (KeyError, TypeError):
            raise ValueError(
                f"geo_distance origin needs lat/lon: {origin!r}"
            )
        dist = body["distance"]
        if not isinstance(dist, (int, float)) or dist <= 0:
            raise ValueError(
                "geo_distance: distance is a positive NUMBER in the "
                "field's planar units (the engine's centi-degree "
                f"convention; no geodesic unit strings): {dist!r}"
            )
        pt = resolve(field)
        dlat = pt["lat"] - F.lit(olat)
        dlon = pt["lon"] - F.lit(olon)
        # squared planar distance vs squared radius: integer-exact
        # under the repo's centi-degree convention (plans/geo.py) —
        # the documented divergence from ES's geodesic arcs
        return (dlat * dlat + dlon * dlon) <= F.lit(dist) * F.lit(dist)
    if kind == "combined_fields":
        # ES combined_fields: the named fields act as ONE field — the
        # token streams concatenate (term freqs sum, one shared
        # length), then ordinary match semantics apply. Equal field
        # weights only (per-field boosts are not lowered).
        return compile_query(
            {"match": {"__combined__": {
                "query": body.get("query"),
                "operator": body.get("operator", "or"),
            }}},
            id_col=id_col,
            resolve=lambda _f, _b=body: _combined_col(_b, resolve),
        )
    if kind == "match_all":
        return F.lit(True)
    if kind == "boosting":
        # filter context: boosting matches exactly what positive
        # matches (negative only demotes the score)
        for key in ("positive", "negative", "negative_boost"):
            if key not in body:
                raise ValueError(f"boosting needs {key}: {body}")
        compile_query(body["negative"], id_col=id_col, resolve=resolve)
        return compile_query(
            body["positive"], id_col=id_col, resolve=resolve
        )
    if kind == "pinned":
        ids = body.get("ids")
        organic = body.get("organic")
        if not ids or organic is None:
            raise ValueError(f"pinned needs ids and organic: {body}")
        return F.coalesce(
            compile_query(organic, id_col=id_col, resolve=resolve),
            F.lit(False),
        ) | resolve(id_col).isin(*ids)
    if kind == "span_term":
        field, value = _one_field(kind, body)
        if isinstance(value, dict):
            value = value["value"]
        return F.array_contains(_tokens(resolve(field)), str(value))
    if kind == "span_first":
        if "match" not in body or "end" not in body:
            raise ValueError(f"span_first needs match and end: {body}")
        field, term = _span_term_of(body["match"])
        pos = _eq_positions(_tokens(resolve(field)), term)
        end = int(body["end"])
        # Lucene: the span must END at or before `end`; a span_term's
        # end is position + 1, so position < end
        return F.coalesce(
            F.exists(pos, lambda p: p < F.lit(end)), F.lit(False)
        )
    if kind == "span_near":
        clauses = body.get("clauses")
        if not clauses:
            raise ValueError(f"span_near needs clauses: {body}")
        slop = int(body.get("slop", 0))
        in_order = bool(body.get("in_order", False))
        parsed = [_span_term_of(c) for c in clauses]
        fields = {f for f, _ in parsed}
        if len(fields) != 1:
            raise ValueError(
                f"span_near clauses must share one field: {sorted(fields)}"
            )
        toks = _tokens(resolve(parsed[0][0]))
        terms = [t for _, t in parsed]
        pos = {t: _eq_positions(toks, t) for t in dict.fromkeys(terms)}
        if in_order or len(terms) == 1:
            return _chain_cond([pos[t] for t in terms], slop)
        if len(terms) > 3:
            raise ValueError(
                "span_near: unordered supports up to 3 clauses "
                f"(permutation lowering): {terms}"
            )
        import itertools

        return functools.reduce(
            _op.or_,
            [
                _chain_cond([pos[t] for t in perm], slop)
                for perm in sorted(set(itertools.permutations(terms)))
            ],
        )
    if kind == "term":
        field, value = _one_field(kind, body)
        if isinstance(value, dict):
            # ES long form: {"term": {f: {"value": v[, "boost": b,
            # "case_insensitive": true]}}} (boost is consumed by the
            # scored-bool path)
            if "value" not in value:
                raise ValueError(f"term needs a value: {body}")
            if value.get("case_insensitive"):
                return F.lower(resolve(field)) == F.lit(
                    str(value["value"]).lower()
                )
            value = value["value"]
        return resolve(field) == F.lit(value)
    if kind == "terms":
        field, values = _one_field(kind, body)
        if not isinstance(values, (list, tuple)) or not values:
            raise ValueError(f"terms needs a non-empty list: {body}")
        return resolve(field).isin(*values)
    if kind == "range":
        field, bounds = _one_field(kind, body)
        if not isinstance(bounds, dict) or not bounds:
            raise ValueError(f"range needs bounds: {body}")
        conjs = []
        for b, v in bounds.items():
            if b == "boost":
                continue  # consumed by the scored-bool path
            if b not in _RANGE_OPS:
                raise ValueError(f"range: unsupported bound {b!r}")
            rhs = _date_math_expr(v) if isinstance(v, str) else None
            if rhs is None:
                rhs = F.lit(v)
            conjs.append(_RANGE_OPS[b](resolve(field), rhs))
        if not conjs:
            raise ValueError(f"range needs at least one bound: {body}")
        return functools.reduce(_op.and_, conjs)
    if kind == "exists":
        if not set(body) <= {"field", "boost"} or "field" not in body:
            raise ValueError(f"exists needs {{'field': name}}: {body}")
        return resolve(body["field"]).isNotNull()
    if kind == "prefix":
        field, value = _one_field(kind, body)
        if isinstance(value, dict):
            # ES long form: {"prefix": {f: {"value": v[, "boost",
            # "case_insensitive"]}}}
            if "value" not in value:
                raise ValueError(f"prefix needs a value: {body}")
            if value.get("case_insensitive"):
                return F.lower(resolve(field)).startswith(
                    str(value["value"]).lower()
                )
            value = value["value"]
        return resolve(field).startswith(str(value))
    if kind == "wildcard":
        field, value = _one_field(kind, body)
        if isinstance(value, dict):
            if "value" not in value:
                raise ValueError(f"wildcard needs a value: {body}")
            if value.get("case_insensitive"):
                # lowercase both sides — wildcards and LIKE escapes in
                # the pattern are caseless, literals fold
                return F.lower(resolve(field)).like(
                    _wildcard_to_like(str(value["value"]).lower())
                )
            value = value["value"]
        return resolve(field).like(_wildcard_to_like(str(value)))
    if kind == "match":
        field, value = _one_field(kind, body)
        op = "or"
        analyzer = "whitespace"
        if isinstance(value, dict):
            op = value.get("operator", "or")
            analyzer = _check_analyzer(value.get("analyzer", "whitespace"))
            value = value["query"]
        q_toks = _analyze_text(value, analyzer)
        if not q_toks:
            raise ValueError(f"match needs query tokens: {body}")
        toks = _tokens(resolve(field), analyzer)
        hits = [F.array_contains(toks, t) for t in q_toks]
        red = _op.and_ if op == "and" else _op.or_
        return functools.reduce(red, hits)
    if kind == "match_phrase":
        field, value = _one_field(kind, body)
        analyzer = "whitespace"
        slop = 0
        if isinstance(value, dict):
            analyzer = _check_analyzer(value.get("analyzer", "whitespace"))
            slop = int(value.get("slop", 0))
            value = value["query"]
        q_toks = _analyze_text(value, analyzer)
        if not q_toks:
            raise ValueError(f"match_phrase needs tokens: {body}")
        if slop > 0:
            return _phrase_slop(
                _tokens(resolve(field), analyzer), q_toks, slop
            )
        phrase = " ".join(q_toks)
        # slop 0: the phrase matches iff the normalized, delimiter-
        # padded analyzed text contains the padded analyzed phrase
        norm = F.concat(
            F.lit(" "),
            F.array_join(_tokens(resolve(field), analyzer), " "),
            F.lit(" "),
        )
        return norm.contains(f" {phrase} ")
    if kind == "match_phrase_prefix":
        # search-as-you-type: the leading tokens form a phrase, the
        # LAST token matches as a prefix at the following position —
        # the query autocomplete clients send on every keystroke
        field, value = _one_field(kind, body)
        analyzer = "whitespace"
        slop = 0
        if isinstance(value, dict):
            if "max_expansions" in value:
                raise ValueError(
                    "match_phrase_prefix: max_expansions is not "
                    "supported — this lowering matches EVERY prefix "
                    "expansion; an explicit cap would change results"
                )
            analyzer = _check_analyzer(value.get("analyzer", "whitespace"))
            slop = int(value.get("slop", 0))
            value = value["query"]
        q_toks = _analyze_text(value, analyzer)
        if not q_toks:
            raise ValueError(f"match_phrase_prefix needs tokens: {body}")
        toks = _tokens(resolve(field), analyzer)
        if len(q_toks) == 1:
            return F.coalesce(
                F.exists(toks, lambda t: t.startswith(q_toks[0])),
                F.lit(False),
            )
        pos = [_eq_positions(toks, t) for t in q_toks[:-1]]
        pos.append(_prefix_positions(toks, q_toks[-1]))
        return _chain_cond(pos, slop)
    if kind == "match_bool_prefix":
        # the term-level sibling: every token a plain term match, the
        # last a prefix — ES lowers it to exactly this bool
        field, value = _one_field(kind, body)
        analyzer = "whitespace"
        op = "or"
        msm = None
        if isinstance(value, dict):
            unknown = set(value) - {
                "query", "analyzer", "operator", "minimum_should_match",
            }
            if unknown:
                raise ValueError(
                    f"match_bool_prefix: unsupported options "
                    f"{sorted(unknown)}"
                )
            analyzer = _check_analyzer(value.get("analyzer", "whitespace"))
            op = value.get("operator", "or")
            msm = value.get("minimum_should_match")
            value = value["query"]
        q_toks = _analyze_text(value, analyzer)
        if not q_toks:
            raise ValueError(f"match_bool_prefix needs tokens: {body}")
        toks = _tokens(resolve(field), analyzer)
        clauses = [F.array_contains(toks, t) for t in q_toks[:-1]]
        clauses.append(
            F.coalesce(
                F.exists(toks, lambda t: t.startswith(q_toks[-1])),
                F.lit(False),
            )
        )
        if op == "and":
            return functools.reduce(_op.and_, clauses)
        if msm is not None:
            m = _msm_count(msm, len(clauses))
            if m <= 0:
                # ES: a should-only bool whose msm computes <= 0
                # constrains nothing
                return F.lit(True)
            flags = [
                F.coalesce(c, F.lit(False)).cast("int") for c in clauses
            ]
            return functools.reduce(_op.add, flags) >= F.lit(m)
        return functools.reduce(_op.or_, clauses)
    if kind == "intervals":
        field, rule = _one_field(kind, body)
        return _intervals_expr(resolve(field), rule)
    if kind == "sparse_vector":
        # learned sparse retrieval (ELSER/SPLADE-style): the field is
        # a map<term, weight> of the document's non-zero expansion
        # terms; a doc matches when ANY query term is present (its
        # dot-product score is positive). Scoring lives in
        # _score_and_filter.
        _sparse_vector_score(body, resolve)  # plan-time validation
        m = resolve(body["field"])
        return functools.reduce(
            _op.or_,
            [
                F.map_contains_key(m, F.lit(str(t)))
                for t in body["query_vector"]
            ],
        )
    if kind == "rank_feature":
        # matches docs that HAVE the feature: ES rank_feature fields
        # only index positive values, so existence == positivity here
        _rank_feature_score(body)  # plan-time validation
        return resolve(body["field"]).cast("double") > F.lit(0.0)
    if kind == "distance_feature":
        _distance_feature_score(body)  # plan-time validation
        return resolve(body["field"]).isNotNull()
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
                parts.append(compile_query(sub, id_col=id_col, resolve=resolve))
        for sub in _as_list(body.get("must_not")):
            # ES match semantics, not SQL three-valued logic: a query
            # over a MISSING field does not match, so must_not PASSES
            # the doc — negate (pred IS TRUE), never plain NOT pred
            # (which turns NULL into NULL and silently drops the doc)
            parts.append(
                ~F.coalesce(
                    compile_query(sub, id_col=id_col, resolve=resolve), F.lit(False)
                )
            )
        should = _as_list(body.get("should"))
        if should:
            msm = body.get("minimum_should_match")
            if msm is None:
                # ES default: 1 if nothing else constrains the bool
                msm = 0 if (body.get("must") or body.get("filter")) else 1
            msm = _msm_count(msm, len(should))
            if msm > 0:
                # same rule: a null-field should clause contributes 0
                # to the match count instead of poisoning the sum
                flags = [
                    F.coalesce(
                        compile_query(sub, id_col=id_col, resolve=resolve), F.lit(False)
                    ).cast(
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
    if kind in _RELATION_QUERIES:
        raise ValueError(
            f"{kind} is a frame-level join query: supported as the "
            "TOP-LEVEL query of run_search_body (with relations=...), "
            "not inside compound clauses"
        )
    if kind == "more_like_this":
        raise ValueError(
            "more_like_this is frame-level (term selection reads "
            "corpus statistics): supported as the TOP-LEVEL query of "
            "run_search_body, not inside compound clauses"
        )
    raise ValueError(f"unsupported query clause {kind!r}")


def _as_list(v) -> list:
    if v is None:
        return []
    return list(v) if isinstance(v, (list, tuple)) else [v]


def _msm_count(msm, n_should: int) -> int:
    """ES ``minimum_should_match`` spec -> required match count over
    ``n_should`` optional clauses. All documented simple forms:

    - positive integer (``3`` / ``"3"``): that many must match;
    - negative integer (``-2``): total minus that many must match;
    - positive percentage (``"75%"``): floor(p% of total) must match;
    - negative percentage (``"-25%"``): floor(p% of total) clauses MAY
      BE MISSING — required = total - floor(p% of total).

    The conditional multi-spec (``"3<90%"``) is rejected at plan time.
    A computed value > n_should can never match (same as ES); a value
    <= 0 removes the constraint (clamped to 0 by the caller's
    ``msm > 0`` gate)."""
    if isinstance(msm, bool):
        raise ValueError(f"minimum_should_match: bad spec {msm!r}")
    if isinstance(msm, int):
        m = msm
    else:
        s = str(msm).strip()
        if "<" in s:
            raise ValueError(
                "minimum_should_match: the conditional multi-spec "
                f"(N<S) is not supported: {s!r}"
            )
        if s.endswith("%"):
            try:
                pct = float(s[:-1])
            except ValueError:
                raise ValueError(
                    f"minimum_should_match: bad percentage {s!r}"
                )
            import math

            portion = int(math.floor(abs(pct) / 100.0 * n_should))
            # sign from the STRING: float("-0") loses it, and "-0%"
            # must mean "0 clauses may be missing" (= all required)
            m = n_should - portion if s.startswith("-") else portion
        else:
            try:
                m = int(s)
            except ValueError:
                raise ValueError(
                    f"minimum_should_match: bad spec {s!r}"
                )
    if m < 0:
        m = n_should + m
    return m


def apply_query(
    df: DataFrame, dsl: dict, *, id_col: str | None = None
) -> DataFrame:
    """Filter a DataFrame with an ES query-DSL dict (one compiled
    predicate; see module docstring). ``id_col`` defaults to the
    frame's document-identity column (doc_id / id / event_id)."""
    return df.filter(
        compile_query(dsl, id_col=id_col or _identity_col(df))
    )


def _identity_col(df: DataFrame) -> str:
    """The frame's document-identity column — ES's ``_id``."""
    for cand in ("doc_id", "id", "event_id", "vec_id"):
        if cand in df.columns:
            return cand
    return "doc_id"


_BM25_K1 = 1.2
_BM25_B = 0.75

_DECAY_FNS = ("gauss", "exp", "linear")


def _bm25_score(
    df: DataFrame,
    field: str | Column,
    query_text: str,
    analyzer: str = "whitespace",
) -> Column:
    """Per-row BM25 score of ``query_text`` against the analyzed
    ``field`` (whitespace default; per-request ``standard``), with
    corpus statistics (N, avgdl, per-term df) computed from ``df`` —
    the same Lucene practical scoring function as
    sinks/textindex.bm25_topk and plans/evalqa.explain_bm25_doc.
    Field statistics use the SAME tokenization as the match, so a
    standard-analyzer query scores over standard-analyzer stats.

    Scale shape: ONE map-side-combined stats aggregation produces a
    single broadcast row (N, total_len, df per query term); the score
    itself is a closed-form codegen expression per document — no
    joins, no shuffle of the documents."""
    terms = _analyze_text(query_text, analyzer)
    if not terms:
        raise ValueError(f"match scoring needs query tokens: {query_text!r}")
    toks = _tokens(
        F.col(field) if isinstance(field, str) else field, analyzer
    )
    # Lucene field statistics: docCount / avgdl are taken over docs
    # that HAVE at least one term for the field, not the whole index
    has = F.coalesce(F.size(toks) > 0, F.lit(False))
    stats = df.agg(
        F.sum(has.cast("long")).cast("long").alias("__n_docs"),
        F.sum(F.when(has, F.size(toks))).cast("long").alias("__total_len"),
        *[
            F.sum(F.array_contains(toks, t).cast("long")).alias(f"__df_{i}")
            for i, t in enumerate(terms)
        ],
    )
    row = stats.collect()[0]  # one tiny row: corpus statistics
    n_docs = int(row["__n_docs"]) or 1
    avgdl = (int(row["__total_len"] or 0) / n_docs) or 1.0
    df_by_term = {
        t: int(row[f"__df_{i}"] or 0) for i, t in enumerate(terms)
    }
    return _bm25_expr(toks, terms, n_docs, avgdl, df_by_term)


def _bm25_expr(
    toks: Column,
    terms: list[str],
    n_docs: int,
    avgdl: float,
    df_by_term: dict[str, int],
) -> Column:
    """The BM25 scoring expression given ALREADY-COLLECTED corpus
    statistics — lets callers that computed the stats in their own
    pass (more_like_this term selection) score without a second
    corpus scan."""
    import math

    dl = F.size(toks).cast("double")
    score = F.lit(0.0)
    for t in terms:
        df_t = df_by_term.get(t, 0)
        idf = math.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
        tf = F.size(F.filter(toks, lambda x: x == F.lit(t))).cast("double")
        contrib = F.lit(idf) * (
            (tf * (1 + _BM25_K1))
            / (tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * (dl / F.lit(avgdl))))
        )
        score = score + F.when(tf > 0, contrib).otherwise(F.lit(0.0))
    return score


def _decay_score(fn: str, field: str, spec: dict) -> Column:
    """ES decay functions over numeric distance: gauss / exp / linear
    with origin, scale, offset (default 0), decay (default 0.5)."""
    origin = float(spec["origin"])
    scale = float(spec["scale"])
    offset = float(spec.get("offset", 0))
    decay = float(spec.get("decay", 0.5))
    if scale <= 0:
        raise ValueError(f"decay: bad scale {scale!r}")
    dist = F.greatest(
        F.abs(F.col(field) - F.lit(origin)) - F.lit(offset), F.lit(0.0)
    )
    if fn == "gauss":
        # 0.5^((dist/scale)^2) parameterized so value at scale == decay
        import math

        sigma2 = -(scale**2) / (2.0 * math.log(decay))
        return F.exp(-(dist * dist) / F.lit(2.0 * sigma2))
    if fn == "exp":
        import math

        lam = math.log(decay) / scale
        return F.exp(F.lit(lam) * dist)
    # linear: max(0, (s - dist)/s) with s chosen so value at scale == decay
    s = scale / (1.0 - decay)
    return F.greatest(F.lit(0.0), (F.lit(s) - dist) / F.lit(s))


import re as _re

_DOC_REF_RE = _re.compile(r"doc\['([A-Za-z_][A-Za-z0-9_.]*)'\]\.value")
_PARAM_REF_RE = _re.compile(r"params\.([A-Za-z_][A-Za-z0-9_]*)")
_SCRIPT_SAFE_RE = _re.compile(r"^[\w\s\.\+\-\*/%\(\):><=!&|,?'\[\]]*$")


def _compile_score_script(
    source: str, params: dict | None = None
) -> Column:
    """Painless arithmetic subset for ``script_score``:
    ``doc['field'].value`` references lower to columns,
    ``params.name`` references substitute the request's script params
    (numbers / bools / strings — plan-time literals, like ES script
    params), and the rest must be plain arithmetic/comparison syntax
    (SQL-compatible). ``_score`` references are rejected — wrap with
    ``function_score`` or ``rescore`` for primary-score composition.
    Fails at PLAN time on anything else (an unreferenced param is
    fine; an unresolved ``params.`` reference is not), like ES script
    compilation."""
    if not source:
        raise ValueError(f"script_score: unsupported script {source!r}")
    params = params or {}

    def _param(m: _re.Match) -> str:
        name = m.group(1)
        if name not in params:
            raise ValueError(
                f"script_score: missing script param {name!r} in "
                f"{source!r}"
            )
        v = params[name]
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (int, float)):
            return repr(v)
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        raise ValueError(
            f"script_score: param {name!r} must be a number/bool/"
            f"string: {type(v).__name__}"
        )

    source = _PARAM_REF_RE.sub(_param, source)
    if "params." in source:
        raise ValueError(
            f"script_score: unresolved params reference in {source!r}"
        )
    if not _SCRIPT_SAFE_RE.match(source):
        raise ValueError(f"script_score: unsupported script {source!r}")
    if "_score" in source:
        raise ValueError(
            "script_score: _score references are not supported here"
        )
    sql = _DOC_REF_RE.sub(lambda m: f"`{m.group(1)}`", source)
    if "doc[" in sql:
        raise ValueError(
            f"script_score: unresolved doc[...] reference in {source!r}"
        )
    return F.expr(sql)


def _script_col(spec: dict | None) -> Column:
    """A ``{"script": {"source", "params"?}}`` spec -> Column."""
    script = (spec or {}).get("script") or {}
    return _compile_score_script(
        script.get("source"), script.get("params")
    )


def _random_score(spec: dict) -> Column:
    """ES ``random_score`` in its DETERMINISTIC form (seed AND field
    given — ES's reproducible mode): a uniform [0, 1) value from a
    multiplicative hash of the field (+ seed). Numeric fields use
    plain integer arithmetic (oracle-reproducible); anything else
    hashes through xxhash64 first. The seedless per-shard-random form
    is not lowered — results that change per run cannot be
    oracle-checked or replayed."""
    if not isinstance(spec, dict) or "field" not in spec \
            or "seed" not in spec:
        raise ValueError(
            "random_score here needs seed AND field (ES's "
            f"deterministic form): {spec}"
        )
    seed = int(spec["seed"])
    c = F.col(spec["field"])
    # try_cast, not cast: ANSI mode throws on non-numeric strings
    key = F.coalesce(c.try_cast("long"), F.xxhash64(c))
    h = F.pmod(
        key * F.lit(2654435761) + F.lit(seed * 40503), F.lit(2**32)
    )
    return h.cast("double") / F.lit(float(2**32))


# field_value_factor modifiers (ES's exact set; log* are base-10,
# ln* natural, like Lucene)
_FVF_MODIFIERS = {
    "none": lambda c: c,
    "log": lambda c: F.log10(c),
    "log1p": lambda c: F.log10(c + F.lit(1.0)),
    "log2p": lambda c: F.log10(c + F.lit(2.0)),
    "ln": lambda c: F.log(c),
    "ln1p": lambda c: F.log(c + F.lit(1.0)),
    "ln2p": lambda c: F.log(c + F.lit(2.0)),
    "square": lambda c: c * c,
    "sqrt": lambda c: F.sqrt(c),
    "reciprocal": lambda c: F.lit(1.0) / c,
}

_SCORE_MODES = ("multiply", "sum", "avg", "max", "min", "first")
_BOOST_MODES = ("multiply", "replace", "sum", "avg", "max", "min")

# inline single-function shorthand keys ES accepts directly under
# function_score (instead of a functions list)
_INLINE_FN_KEYS = _DECAY_FNS + (
    "field_value_factor",
    "script_score",
    "random_score",
)


def _field_value_factor(spec: dict) -> Column:
    """ES ``field_value_factor``: modifier(field * factor), with
    ``missing`` substituting the RAW field value before factor and
    modifier apply (ES's documented order)."""
    if not isinstance(spec, dict) or "field" not in spec:
        raise ValueError(f"field_value_factor needs a field: {spec}")
    factor = float(spec.get("factor", 1.0))
    modifier = spec.get("modifier", "none")
    if modifier not in _FVF_MODIFIERS:
        raise ValueError(
            f"field_value_factor: unsupported modifier {modifier!r}"
        )
    raw = F.col(spec["field"]).cast("double")
    if "missing" in spec:
        raw = F.coalesce(raw, F.lit(float(spec["missing"])))
    return _FVF_MODIFIERS[modifier](raw * F.lit(factor))


def _function_score_expr(
    body: dict, qscore: Column | None, id_col: str
) -> Column:
    """Combine a ``function_score`` body's functions into the final
    score: each function is (filter, weight, value) — decay /
    field_value_factor / script_score / bare weight — weighted values
    of MATCHING functions combine under ``score_mode``, the result is
    capped by ``max_boost`` and merged with the inner query's score
    under ``boost_mode``. A doc matching NO function keeps function
    score 1, like ES."""
    functions = body.get("functions")
    if functions is None:
        # ES single-function shorthand: the function spec sits inline
        inline = {
            k: body[k] for k in (*_INLINE_FN_KEYS, "weight") if k in body
        }
        if not inline:
            raise ValueError("function_score needs functions")
        functions = [inline]
    score_mode = body.get("score_mode", "multiply")
    if score_mode not in _SCORE_MODES:
        raise ValueError(
            f"function_score: unsupported score_mode {score_mode!r}"
        )
    boost_mode = body.get("boost_mode", "multiply")
    if boost_mode not in _BOOST_MODES:
        raise ValueError(
            f"function_score: unsupported boost_mode {boost_mode!r}"
        )
    parsed: list[tuple[Column, Column, Column]] = []  # (cond, w*val, w)
    for f in functions:
        f = dict(f)
        filt = f.pop("filter", None)
        weight = f.pop("weight", None)
        if len(f) > 1:
            raise ValueError(
                f"function_score: one function type per entry: {sorted(f)}"
            )
        if f:
            (fn, fbody), = f.items()
            if fn in _DECAY_FNS:
                (field, spec), = fbody.items()
                val = _decay_score(fn, field, spec)
            elif fn == "field_value_factor":
                val = _field_value_factor(fbody)
            elif fn == "script_score":
                val = _script_col(fbody)
            elif fn == "random_score":
                val = _random_score(fbody)
            else:
                raise ValueError(f"unsupported score function {fn!r}")
        else:
            val = F.lit(1.0)  # bare weight entry
        w = F.lit(float(weight)) if weight is not None else F.lit(1.0)
        cond = (
            F.coalesce(compile_query(filt, id_col=id_col), F.lit(False))
            if filt is not None
            else F.lit(True)
        )
        parsed.append((cond, val * w, w))
    if score_mode == "multiply":
        fs = functools.reduce(
            _op.mul,
            [F.when(c, ws).otherwise(F.lit(1.0)) for c, ws, _ in parsed],
        )
    elif score_mode == "sum":
        fs = functools.reduce(
            _op.add,
            [F.when(c, ws).otherwise(F.lit(0.0)) for c, ws, _ in parsed],
        )
    elif score_mode == "avg":
        # ES: the WEIGHTED average — sum(weight*value)/sum(weight)
        num = functools.reduce(
            _op.add,
            [F.when(c, ws).otherwise(F.lit(0.0)) for c, ws, _ in parsed],
        )
        den = functools.reduce(
            _op.add,
            [F.when(c, w).otherwise(F.lit(0.0)) for c, _, w in parsed],
        )
        fs = num / den
    elif score_mode in ("max", "min"):
        arms = [F.when(c, ws) for c, ws, _ in parsed]
        pick = F.greatest if score_mode == "max" else F.least
        fs = arms[0] if len(arms) == 1 else pick(*arms)  # NULLs skipped
    else:  # first: the first matching function in request order
        fs = F.coalesce(*[F.when(c, ws) for c, ws, _ in parsed], F.lit(1.0))
    any_match = functools.reduce(_op.or_, [c for c, _, _ in parsed])
    fs = F.when(any_match, fs).otherwise(F.lit(1.0))
    if "max_boost" in body:
        fs = F.least(fs, F.lit(float(body["max_boost"])))
    q = qscore if qscore is not None else F.lit(1.0)
    if boost_mode == "multiply":
        return q * fs
    if boost_mode == "replace":
        return fs
    if boost_mode == "sum":
        return q + fs
    if boost_mode == "avg":
        return (q + fs) / F.lit(2.0)
    if boost_mode == "max":
        return F.greatest(q, fs)
    return F.least(q, fs)  # min


def _score_and_filter(
    df: DataFrame, query: dict, need_score: bool
) -> tuple[DataFrame, Column | None]:
    """Lower the query to (filtered frame, _score column or None).
    Scoring applies to top-level ``match`` (BM25), ``multi_match``
    (best_fields), ``script_score`` and ``function_score`` (decay /
    field_value_factor / script_score functions with per-function
    filters, score_mode and boost_mode — see _function_score_expr);
    every other query is filter-context (score constant 1.0, like ES
    filter context)."""
    kind, body = next(iter(query.items())) if len(query) == 1 else (None, None)
    if kind in ("query_string", "simple_query_string"):
        # parse once, then score/filter the LOWERED tree — a
        # query_string scores exactly like the bool/match tree it
        # lowers to (scored-bool BM25 addition and all)
        from .luceneq import query_string_to_dsl, simple_query_string_to_dsl

        lowered = (
            query_string_to_dsl(body)
            if kind == "query_string"
            else simple_query_string_to_dsl(body)
        )
        return _score_and_filter(df, lowered, need_score)
    if kind == "more_like_this":
        # frame-level: term selection needs corpus statistics, so the
        # leaf resolves here (compile_query directs compound uses to
        # the top level). Scoring is the summed BM25 of the selected
        # terms, reusing the SELECTION pass's statistics — one corpus
        # scan total (the round-6 version paid a second stats scan).
        field, terms, n_docs, avgdl, df_by_term = _mlt_select_terms(
            df, body
        )
        filtered = apply_query(df, _mlt_filter_dsl(field, terms, body))
        if not need_score:
            return filtered, None
        return filtered, _bm25_expr(
            _tokens(F.col(field)), terms, n_docs, avgdl, df_by_term
        )
    if kind == "script_score":
        inner = body.get("query", {"match_all": {}})
        filtered = apply_query(df, inner)
        if not need_score:
            _script_col(body)  # plan-time validation regardless
            return filtered, None
        return filtered, _script_col(body)
    if kind == "function_score":
        inner = body.get("query", {"match_all": {}})
        min_score = body.get("min_score")
        must_score = need_score or min_score is not None
        filtered, qscore = _score_and_filter(df, inner, must_score)
        if not must_score:
            # plan-time validation even when the score is unused (a
            # malformed body must fail regardless of the sort)
            _function_score_expr(body, F.lit(1.0), _identity_col(df))
            return filtered, None
        score = _function_score_expr(body, qscore, _identity_col(df))
        if min_score is not None:
            # min_score EXCLUDES low-scoring docs (ES applies it to
            # the final combined score)
            filtered = filtered.filter(score >= F.lit(float(min_score)))
        return filtered, (score if need_score else None)
    if kind == "bool" and need_score:
        # ES bool scoring: every matching MUST / SHOULD clause adds
        # its score; filter / must_not add nothing. match/multi_match
        # (and sub-bools / parsed query strings) contribute their real
        # BM25; CONSTANT-SCORE leaves (term/range/prefix/...) add
        # their ``boost`` (default 1.0) when they match — ES's
        # constant_score semantics, so a should with one match and one
        # term can rank term-only matches ABOVE non-matches (the
        # round-5 one-sided divergence is gone; the remaining
        # divergence is constant-vs-idf magnitudes, documented). A
        # bool with no must/should clause keeps score 1.0 (pure
        # filter context).
        filtered = apply_query(df, query)
        score = F.lit(0.0)
        any_clause = False
        for key in ("must", "should"):
            for sub in _as_list(body.get(key)):
                if not (isinstance(sub, dict) and len(sub) == 1):
                    continue
                any_clause = True
                skind = next(iter(sub))
                if skind in (
                    "match",
                    "multi_match",
                    "combined_fields",
                    "bool",
                    "dis_max",
                    "query_string",
                    "simple_query_string",
                    "rank_feature",
                    "distance_feature",
                    "boosting",
                    "pinned",
                    "sparse_vector",
                ):
                    _, sub_score = _score_and_filter(df, sub, True)
                else:
                    sub_score = F.lit(_leaf_boost(sub))
                matched = F.coalesce(
                    compile_query(sub, id_col=_identity_col(df)),
                    F.lit(False),
                )
                score = score + F.when(matched, sub_score).otherwise(
                    F.lit(0.0)
                )
        return filtered, (score if any_clause else F.lit(1.0))
    if kind == "boosting":
        # demote, don't exclude: matches = positive's matches; where
        # negative ALSO matches, the score is multiplied by
        # negative_boost (ES's boosting query)
        for key in ("positive", "negative", "negative_boost"):
            if key not in body:
                raise ValueError(f"boosting needs {key}: {body}")
        nb = float(body["negative_boost"])
        filtered, pscore = _score_and_filter(
            df, body["positive"], need_score
        )
        if not need_score:
            return filtered, None
        neg = F.coalesce(
            compile_query(body["negative"], id_col=_identity_col(df)),
            F.lit(False),
        )
        return filtered, F.when(neg, pscore * F.lit(nb)).otherwise(pscore)
    if kind == "pinned":
        # promoted documents first, in LIST order, above every organic
        # hit: pinned scores are 1e12 + (n - i) — exactly-representable
        # doubles far above any BM25/feature score (documented stand-in
        # for ES's float-max-derived pin scores)
        ids = body.get("ids")
        organic = body.get("organic")
        if not ids or organic is None:
            raise ValueError(f"pinned needs ids and organic: {body}")
        filtered = apply_query(df, query)
        if not need_score:
            return filtered, None
        _, oscore = _score_and_filter(df, organic, True)
        omatched = F.coalesce(
            compile_query(organic, id_col=_identity_col(df)), F.lit(False)
        )
        idc = F.col(_identity_col(df))
        score = F.when(omatched, oscore).otherwise(F.lit(0.0))
        n = len(ids)
        for i, pid in enumerate(ids):
            score = F.when(
                idc == F.lit(pid), F.lit(1e12 + float(n - i))
            ).otherwise(score)
        return filtered, score
    if kind == "sparse_vector" and need_score:
        return apply_query(df, query), _sparse_vector_score(body)
    if kind == "rank_feature" and need_score:
        # a scoring-only leaf: the match set is docs with a positive
        # feature; the score is the chosen saturation/log/sigmoid form
        return apply_query(df, query), _rank_feature_score(body)
    if kind == "distance_feature" and need_score:
        return apply_query(df, query), _distance_feature_score(body)
    if kind == "match" and need_score:
        field, value = _one_field(kind, body)
        analyzer = "whitespace"
        text = value
        boost = 1.0
        if isinstance(value, dict):
            analyzer = _check_analyzer(value.get("analyzer", "whitespace"))
            boost = float(value.get("boost", 1.0))
            text = value["query"]
        score = _bm25_score(df, field, str(text), analyzer)
        if boost != 1.0:
            score = score * F.lit(boost)
        return apply_query(df, query), score
    if kind == "multi_match" and need_score:
        # best_fields: best single-field BM25 (Lucene's
        # DisjunctionMaxQuery, tie_breaker 0); most_fields: the SUM of
        # per-field BM25 (each field adds evidence); cross_fields:
        # BM25 over the fields blended as one synthesized column
        # (summed tf, shared length — blended statistics, the spirit
        # of ES's term-centric blended df); the phrase families score
        # constant 1.0 (Lucene phrase-frequency scoring is not
        # lowered — a match is a match, boost still applies)
        fields = body.get("fields") or []
        if not fields:
            raise ValueError(f"multi_match needs fields: {body}")
        text = str(body["query"])
        analyzer = _check_analyzer(body.get("analyzer", "whitespace"))
        mm_type = body.get("type", "best_fields")
        if mm_type == "best_fields":
            score = F.greatest(
                *[_bm25_score(df, f, text, analyzer) for f in fields]
            ) if len(fields) > 1 else _bm25_score(
                df, fields[0], text, analyzer
            )
        elif mm_type == "most_fields":
            score = functools.reduce(
                _op.add,
                [_bm25_score(df, f, text, analyzer) for f in fields],
            )
        elif mm_type == "cross_fields":
            score = _bm25_score(
                df,
                _combined_col({"query": text, "fields": fields}),
                text,
                analyzer,
            )
        else:  # phrase / phrase_prefix / bool_prefix
            score = F.lit(1.0)
        boost = float(body.get("boost", 1.0))
        if boost != 1.0:
            score = score * F.lit(boost)
        return apply_query(df, query), score
    if kind == "combined_fields" and need_score:
        # one BM25 over the synthesized combined field: summed term
        # freqs, shared length — ES's combined_fields with equal
        # weights (the same one-broadcast-stats-row plan as match)
        score = _bm25_score(df, _combined_col(body), str(body["query"]))
        boost = float(body.get("boost", 1.0))
        if boost != 1.0:
            score = score * F.lit(boost)
        return apply_query(df, query), score
    if kind == "dis_max" and need_score:
        # ES dis_max scoring: the BEST matching branch's score plus
        # tie_breaker times every other matching branch's score
        subs = body.get("queries") or []
        tie = float(body.get("tie_breaker", 0.0))
        arms = []
        for sub in subs:
            _, s = _score_and_filter(df, sub, True)
            matched = F.coalesce(
                compile_query(sub, id_col=_identity_col(df)), F.lit(False)
            )
            arms.append((matched, s))
        best_args = [F.when(m, s) for m, s in arms]
        best = best_args[0] if len(arms) == 1 else F.greatest(*best_args)
        total = functools.reduce(
            _op.add,
            [F.when(m, s).otherwise(F.lit(0.0)) for m, s in arms],
        )
        best = F.coalesce(best, F.lit(0.0))
        score = best + F.lit(tie) * (total - best)
        return apply_query(df, query), score
    return apply_query(df, query), (F.lit(1.0) if need_score else None)


def _mlt_select_terms(
    df: DataFrame, spec: dict
) -> tuple[str, list[str], int, float, dict[str, int]]:
    """ES ``more_like_this`` term selection, scan-based: the like
    text's terms rank by tf(like) x BM25-idf against the FRAME's
    document frequencies; out-of-vocabulary terms and terms outside
    the min/max_doc_freq band drop; the top ``max_query_terms``
    survive. Returns (field, selected terms, n_docs, avgdl,
    df-by-term) — the same pass collects EVERYTHING the BM25 scorer
    needs, so scoring never re-scans the corpus.

    Scale shape: ONE map-side-combined stats aggregation bounded by
    the like text's distinct term count (a broadcast-sized row) — the
    corpus is scanned once and never shuffled; selection itself is
    driver-side arithmetic over that row. The index-backed variant
    (sinks/textindex.more_like_this) reads the term dictionary
    instead; this is the index-free form run_search_body can serve."""
    import math
    from collections import Counter

    fields = spec.get("fields") or []
    if len(fields) != 1:
        raise ValueError(
            "more_like_this here supports exactly one field "
            f"(per-field df would need one stats pass each): {fields}"
        )
    field = fields[0]
    like = spec.get("like")
    if isinstance(like, (list, tuple)):
        like = " ".join(str(x) for x in like)
    if not like:
        raise ValueError(f"more_like_this needs like text: {spec}")
    min_tf = int(spec.get("min_term_freq", 2))
    min_df = int(spec.get("min_doc_freq", 5))
    max_df = spec.get("max_doc_freq")
    max_terms = int(spec.get("max_query_terms", 25))
    ltf = Counter(_analyze_text(like, "whitespace"))
    cands = sorted(t for t, n in ltf.items() if n >= min_tf)
    if not cands:
        raise ValueError(
            f"more_like_this: no like-term passes min_term_freq: {spec}"
        )
    toks = _tokens(F.col(field))
    has = F.coalesce(F.size(toks) > 0, F.lit(False))
    row = df.agg(
        F.sum(has.cast("long")).alias("__n"),
        F.sum(F.when(has, F.size(toks))).cast("long").alias("__len"),
        *[
            F.sum(F.array_contains(toks, t).cast("long")).alias(f"__df_{i}")
            for i, t in enumerate(cands)
        ],
    ).collect()[0]  # one broadcast-sized stats row
    n_docs = int(row["__n"]) or 1
    avgdl = (int(row["__len"] or 0) / n_docs) or 1.0
    df_by_term = {
        t: int(row[f"__df_{i}"] or 0) for i, t in enumerate(cands)
    }
    ranked = []
    for t in cands:
        df_t = df_by_term[t]
        if df_t < min_df or (max_df is not None and df_t > int(max_df)):
            continue
        idf = math.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
        ranked.append((-(ltf[t] * idf), t))
    if not ranked:
        raise ValueError(
            "more_like_this: no like-term survives the doc-freq band"
        )
    ranked.sort()
    selected = [t for _, t in ranked[:max_terms]]
    return field, selected, n_docs, avgdl, df_by_term


def _mlt_filter_dsl(field: str, terms: list[str], spec: dict) -> dict:
    """The selected mlt terms as a should-bool (one match per term)
    with ES's minimum_should_match default of 30%."""
    return {"bool": {
        "should": [{"match": {field: t}} for t in terms],
        "minimum_should_match": spec.get("minimum_should_match", "30%"),
    }}


def _leaf_boost(sub: dict) -> float:
    """The ``boost`` of a constant-score leaf (default 1.0): read from
    the one-field spec dict ({"term": {f: {"value": v, "boost": b}}},
    {"range": {f: {"gte": v, "boost": b}}}, ...) or from the body
    itself ({"exists": {"field": f, "boost": b}})."""
    _, body = next(iter(sub.items()))
    if isinstance(body, dict):
        if "boost" in body:
            return float(body["boost"])
        if len(body) == 1:
            spec = next(iter(body.values()))
            if isinstance(spec, dict) and "boost" in spec:
                return float(spec["boost"])
    return 1.0


def _source_columns(columns: list[str], spec) -> list[str]:
    """ES ``_source`` filtering, all request forms: ``false`` (no
    source — script/docvalue fields only), ``true`` (everything), a
    list of names (exact), a single string, ``*``-wildcard patterns,
    and the ``{"includes": [...], "excludes": [...]}`` dict. Resolves
    against the frame's columns in frame order (stable output
    schema)."""
    import fnmatch

    if spec is False:
        return []
    if spec is True:
        return list(columns)

    def _match(patterns) -> list[str]:
        out = []
        for c in columns:
            for pat in patterns:
                if c == pat or fnmatch.fnmatchcase(c, pat):
                    out.append(c)
                    break
        return out

    if isinstance(spec, str):
        spec = [spec]
    if isinstance(spec, dict):
        extra = set(spec) - {"includes", "excludes"}
        if extra:
            raise ValueError(
                f"_source dict supports includes/excludes: {sorted(extra)}"
            )
        inc = spec.get("includes")
        keep = _match([inc] if isinstance(inc, str) else inc) \
            if inc else list(columns)
        exc = spec.get("excludes")
        if exc:
            drop = set(_match([exc] if isinstance(exc, str) else exc))
            keep = [c for c in keep if c not in drop]
        return keep
    if not isinstance(spec, (list, tuple)):
        raise ValueError(f"unsupported _source form: {spec!r}")
    if any("*" in str(pat) or "?" in str(pat) for pat in spec):
        return _match(list(spec))
    missing = [c for c in spec if c not in columns]
    if missing:
        raise ValueError(f"_source names unknown columns: {missing}")
    return list(spec)


def _tiebreak_names(df: DataFrame, used: list[str]) -> list[str]:
    """Column names of the deterministic ``_doc`` tie-break: EMPTY
    when the requested sort already pins document identity (its keys
    are unique — appending more would only widen the scan's
    ReadSchema), else the identity column, else every remaining
    column."""
    cands = [c for c in ("doc_id", "id", "event_id", "vec_id")
             if c in df.columns]
    if any(c in used for c in cands):
        return []
    for cand in cands:
        if cand not in used:
            return [cand]
    return [c for c in df.columns if c not in used]


def _doc_tiebreak(df: DataFrame, used: list[str]) -> list[Column]:
    """Deterministic ``_doc`` tie-break: the document-identity column
    if one exists, else every remaining column, ascending."""
    return [F.col(c).asc() for c in _tiebreak_names(df, used)]


_RELATION_QUERIES = ("has_child", "has_parent", "parent_id")


def _resolve_terms_lookups(node, relations: dict | None):
    """ES terms LOOKUP form: ``{"terms": {field: {"index": t, "id": v,
    "path": p}}}`` fetches the term list from one document of another
    index at PLAN time (ES does the same — the lookup is a GET, then
    the query executes as a plain terms query). Works at ANY depth of
    the query tree: the body is rewritten with the fetched list before
    compilation. The fetch collects ONE row (driver-side, bounded).
    ``relations[index]`` must name the frame and its id column:
    ``{"df": frame, "id_col": name}`` (reuses the join-field relations
    map; id_col defaults to the frame's document identity)."""
    if isinstance(node, list):
        return [_resolve_terms_lookups(x, relations) for x in node]
    if not isinstance(node, dict):
        return node
    if len(node) == 1 and "terms" in node and isinstance(
        node["terms"], dict
    ) and len(node["terms"]) == 1:
        (field, spec), = node["terms"].items()
        if isinstance(spec, dict) and "index" in spec:
            if not {"id", "path"} <= set(spec):
                raise ValueError(
                    f"terms lookup needs index, id and path: {spec}"
                )
            rel = (relations or {}).get(spec["index"])
            if rel is None or "df" not in rel:
                raise ValueError(
                    f"terms lookup: unknown index {spec['index']!r} — "
                    "pass relations={index: {df[, id_col]}}"
                )
            other = rel["df"]
            id_col = rel.get("id_col") or _identity_col(other)
            rows = other.filter(
                F.col(id_col) == F.lit(spec["id"])
            ).select(spec["path"]).limit(2).collect()  # one lookup doc
            if len(rows) != 1:
                raise ValueError(
                    f"terms lookup: expected exactly one doc with "
                    f"{id_col}={spec['id']!r}, found {len(rows)}"
                )
            vals = rows[0][0]
            if vals is None:
                vals = []
            if not isinstance(vals, (list, tuple)):
                vals = [vals]
            if not vals:
                # ES: an empty lookup list matches nothing
                return {"bool": {"must_not": [{"match_all": {}}]}}
            return {"terms": {field: list(vals)}}
    return {k: _resolve_terms_lookups(v, relations) for k, v in node.items()}


def _apply_relation_query(
    df: DataFrame, query: dict, relations: dict | None
) -> DataFrame:
    """Frame-level join-field queries (ES parent/child): ``has_child``
    selects PARENT docs by a query over their children, ``has_parent``
    selects CHILD docs by a query over their parent, ``parent_id``
    selects the children of one parent. ``relations`` names each
    related type: ``{type: {"df": other_frame, "local_key": join col
    on THIS frame, "foreign_key": join col on the other frame}}``
    (for ``parent_id`` only ``local_key`` is required — the child's
    join column holding the parent id).

    Scale shape (the agg-before-join lowering of the standalone
    plans/esrelations.py queries): the related side collapses to a
    key set (one partial-agg shuffle) and this frame streams through
    ONE left-semi join — no row multiplication, no parent columns
    carried. ES executes join fields the same way (child ordinals ->
    parent bitset)."""
    (kind, spec), = query.items()
    if not isinstance(spec, dict):
        raise ValueError(f"{kind} needs a body: {spec}")
    tname = spec.get("type") or spec.get("parent_type")
    if not tname:
        raise ValueError(f"{kind} needs type/parent_type: {spec}")
    rel = (relations or {}).get(tname)
    if rel is None or "local_key" not in rel:
        raise ValueError(
            f"{kind}: unknown relation {tname!r} — pass relations="
            "{type: {df, local_key, foreign_key}} to run_search_body"
        )
    local_key = rel["local_key"]
    if kind == "parent_id":
        if "id" not in spec:
            raise ValueError(f"parent_id needs an id: {spec}")
        return df.filter(F.col(local_key) == F.lit(spec["id"]))
    other, foreign_key = rel.get("df"), rel.get("foreign_key")
    if other is None or not foreign_key:
        raise ValueError(
            f"{kind}: relation {tname!r} needs df and foreign_key"
        )
    inner = spec.get("query", {"match_all": {}})
    matched = other.filter(
        compile_query(inner, id_col=_identity_col(other))
    )
    if kind == "has_child":
        lo = int(spec.get("min_children", 1))
        hi = spec.get("max_children")
        per_parent = matched.groupBy(foreign_key).agg(
            F.count(F.lit(1)).alias("__n_children")
        )
        cond = F.col("__n_children") >= F.lit(lo)
        if hi is not None:
            cond = cond & (F.col("__n_children") <= F.lit(int(hi)))
        keys = per_parent.filter(cond).select(
            F.col(foreign_key).alias(local_key)
        )
    else:  # has_parent: distinct parent keys matching the query
        keys = matched.select(
            F.col(foreign_key).alias(local_key)
        ).distinct()
    return df.join(keys, local_key, "left_semi")


def lexical_overlap_score(field: str, query_text: str) -> Column:
    """The engine's DETERMINISTIC STAND-IN for inference-based text
    similarity (ES's semantic rerankers): distinct-token overlap
    between the query text and the field under the standard
    analyzer — matched distinct query tokens / distinct query
    tokens; NULL field scores 0.0. Shared by the ES|QL ``RERANK``
    command and the ``text_similarity_reranker`` retriever so the
    two surfaces can never rank differently. A codegen
    array_intersect per row — no UDF, no shuffle."""
    import re as _re

    qtoks = sorted(
        {t for t in _re.split(r"[\W_]+", query_text.lower()) if t}
    )
    if not qtoks:
        raise ValueError(
            f"text similarity: the query has no tokens: {query_text!r}"
        )
    overlap = F.size(
        F.array_intersect(
            F.array_distinct(_tokens(F.col(field), "standard")),
            F.array(*[F.lit(t) for t in qtoks]),
        )
    )
    # greatest(.., 0) absorbs the legacy size(NULL) = -1 convention
    return F.coalesce(
        F.greatest(overlap, F.lit(0)).cast("double")
        / F.lit(float(len(qtoks))),
        F.lit(0.0),
    )


def _run_text_similarity_reranker(
    df: DataFrame,
    body: dict,
    base_df: DataFrame | None,
    relations: dict | None,
) -> DataFrame:
    """ES 8.15+ ``text_similarity_reranker`` retriever — two-stage
    retrieve-then-rerank: the inner retriever's top
    ``rank_window_size`` hits are re-scored over ``field`` against
    ``inference_text`` and re-ranked. ES calls an inference endpoint
    (a cross-encoder) for the second stage; this engine scores with
    the documented deterministic lexical stand-in
    (``lexical_overlap_score`` — the same scorer the ES|QL RERANK
    command uses), so the retriever plumbing is real and
    oracle-checkable while the model stays an honest external
    dependency. ``inference_id`` is accepted and recorded nowhere —
    the stand-in runs regardless (documented).

    Scale shape: the inner retriever already bounds the frame to
    rank_window_size rows; the rescore is a codegen expression over
    that page and the final cut is TakeOrdered(size)."""
    spec = body["retriever"]["text_similarity_reranker"]
    inner = spec.get("retriever")
    field = spec.get("field")
    qtext = spec.get("inference_text")
    if not isinstance(inner, dict) or not field or not qtext:
        raise ValueError(
            "text_similarity_reranker needs retriever, field and "
            f"inference_text: {spec}"
        )
    extra = set(spec) - {
        "retriever", "field", "inference_text", "inference_id",
        "rank_window_size",
    }
    if extra:
        raise ValueError(
            f"text_similarity_reranker: unsupported options "
            f"{sorted(extra)}"
        )
    window = int(spec.get("rank_window_size", 10))
    if window < 1:
        raise ValueError(
            f"text_similarity_reranker: bad rank_window_size {window}"
        )
    bad_outer = set(body) - {"retriever", "size", "_source"}
    if bad_outer:
        raise ValueError(
            "text_similarity_reranker composes with size/_source "
            f"only, got {sorted(bad_outer)}"
        )
    hits = run_search_body(
        df, {"retriever": inner, "size": window}, base_df, relations
    )
    if field not in hits.columns:
        raise ValueError(
            f"text_similarity_reranker: field {field!r} not in the "
            f"inner hits (columns: {hits.columns})"
        )
    score = lexical_overlap_score(field, str(qtext))
    out = hits.withColumn("_score", score)
    out = out.orderBy(
        F.col("_score").desc(), *_doc_tiebreak(out, ["_score"])
    ).limit(int(body.get("size", 10)))
    if "_source" in body:
        keep = _source_columns(
            [c for c in out.columns if c != "_score"], body["_source"]
        )
        if "_score" not in keep:
            keep.append("_score")
        out = out.select(*keep)
    return out


def _lower_retriever(body: dict) -> dict:
    """ES 8.14+ ``retriever`` tree -> the legacy body form this
    engine already executes. Supported retrievers:

    - ``standard {query[, filter]}`` -> body ``query`` (filters fold
      into a bool);
    - ``knn {field, query_vector, k, ..}`` -> body ``knn``
      (``num_candidates`` — an ANN recall/latency knob — is dropped:
      this engine's knn section is exact, so every candidate is
      already considered);
    - ``rrf {retrievers: [standard, knn][, rank_window_size,
      rank_constant]}`` -> hybrid ``query`` + ``knn`` + ``rank.rrf``
      (the same reciprocal-rank fusion plan as ``es_search_knn_rrf``).

    ``text_similarity_reranker`` is EXECUTED (two-stage), not
    lowered — see ``_run_text_similarity_reranker``; nested rrf
    trees are not lowered and fail at plan time."""
    ret = body["retriever"]
    rest = {k: v for k, v in body.items() if k != "retriever"}
    if not isinstance(ret, dict) or len(ret) != 1:
        raise ValueError(
            f"retriever must hold exactly one retriever type: {ret}"
        )
    kind, spec = next(iter(ret.items()))
    if kind == "standard":
        q = spec.get("query")
        if q is None:
            raise ValueError(f"standard retriever needs a query: {spec}")
        filt = spec.get("filter")
        if filt is not None:
            q = {"bool": {"must": [q], "filter": _as_list(filt)}}
        return {**rest, "query": q}
    if kind == "knn":
        knn = {k: v for k, v in spec.items() if k != "num_candidates"}
        return {**rest, "knn": knn}
    if kind == "rrf":
        subs = _as_list(spec.get("retrievers"))
        std = [s for s in subs if isinstance(s, dict) and "standard" in s]
        knn = [s for s in subs if isinstance(s, dict) and "knn" in s]
        if len(subs) != 2 or len(std) != 1 or len(knn) != 1:
            raise ValueError(
                "rrf retriever: exactly two sub-retrievers, one "
                f"standard + one knn, are lowered (got {subs})"
            )
        rrf: dict = {}
        for key in ("rank_window_size", "rank_constant"):
            if key in spec:
                rrf[key] = spec[key]
        lowered_std = _lower_retriever({"retriever": std[0]})
        lowered_knn = _lower_retriever({"retriever": knn[0]})
        return {
            **rest,
            "query": lowered_std["query"],
            "knn": lowered_knn["knn"],
            "rank": {"rrf": rrf},
        }
    if kind == "linear":
        # ES 8.18 linear retriever: weighted sum of per-arm
        # normalized scores — the explicit-weights alternative to
        # rrf. Entries are {retriever: {...}[, weight][, normalizer]}
        # with normalizer minmax|none; one standard + one knn arm
        # lower (same pair rrf supports).
        entries = _as_list(spec.get("retrievers"))
        std_e = knn_e = None
        for e in entries:
            inner = e.get("retriever") if isinstance(e, dict) else None
            if isinstance(inner, dict) and "standard" in inner:
                std_e = e
            elif isinstance(inner, dict) and "knn" in inner:
                knn_e = e
        if len(entries) != 2 or std_e is None or knn_e is None:
            raise ValueError(
                "linear retriever: exactly two entries, one standard "
                f"+ one knn, are lowered (got {entries})"
            )
        lin: dict = {}
        if "rank_window_size" in spec:
            lin["rank_window_size"] = spec["rank_window_size"]
        for label, e in (("query", std_e), ("knn", knn_e)):
            arm = {}
            if "weight" in e:
                arm["weight"] = float(e["weight"])
            if "normalizer" in e:
                arm["normalizer"] = e["normalizer"]
            lin[label] = arm
        lowered_std = _lower_retriever({"retriever": std_e["retriever"]})
        lowered_knn = _lower_retriever({"retriever": knn_e["retriever"]})
        return {
            **rest,
            "query": lowered_std["query"],
            "knn": lowered_knn["knn"],
            "rank": {"linear": lin},
        }
    raise ValueError(
        f"retriever: unsupported type {kind!r} (supported: standard, "
        "knn, rrf, linear, text_similarity_reranker)"
    )


def run_search_body(
    df: DataFrame,
    body: dict,
    base_df: DataFrame | None = None,
    relations: dict | None = None,
) -> DataFrame:
    """Execute a full ES ``_search`` request body: ``query`` +
    ``aggs`` (operators/aggsdsl.py, per-level bucket semantics) and/or
    the hit list shaped by ``sort``/``size`` (+ ``_source``
    projection). The composition mirrors ES exactly: aggregations run
    over the query-filtered document set (``global`` buckets escape to
    ``base_df``, default the input frame); hits are the top ``size``
    docs by the sort, score-ordered when the request asks for
    ``_score`` (or gives no sort at all — ES's default), and ALWAYS
    carrying a ``_doc`` tie-break so tied keys select a deterministic
    set.

    ES's response always carries BOTH a hits section and an aggs
    section. When the body holds ``aggs`` alone the frame is the flat
    multi-level agg contract (the analytics reading); when it also
    asks for hits (``size`` present) the result is a two-section
    union: ``section='hits'`` rows carry ``hit_rank`` (1-based
    position in the returned page) plus the ``_source`` columns, and
    ``section='aggs'`` rows carry the agg frame's columns — each
    side's columns are NULL on the other side's rows.

    Also supported on the hit path: ``from`` (offset into the sorted
    hits), ``search_after`` (strict-after tuple over the requested
    sort keys, optionally + one extra value for the engine's appended
    ``_doc`` tie-break column so ties at a page boundary are never
    skipped or duplicated; mutually exclusive with ``from``),
    ``collapse`` (best hit per group), ``highlight`` (whitespace-
    analyzer unified highlighter), ``rescore`` (top ``window_size``
    hits re-scored and re-sorted; hits beyond the window keep their
    primary scores AFTER the rescored set, like ES), and ``knn``
    ({field, query_vector, k[, filter][, boost]} — exact cosine top-k
    with ES's (1+cos)/2 score scaling; composes with ``query`` as ES 8
    hybrid search: additive scores by default, reciprocal-rank fusion
    under ``rank: {rrf: {...}}``).

    Plan shape: filter + groupingSets passes (aggs) or filter +
    TakeOrdered (hits) — the query's pushable conjuncts reach the
    scan; BM25 scoring adds one broadcast-sized stats aggregation;
    knn is a codegen dot product + TakeOrdered(k); hybrid knn
    broadcast-joins the k-row top-k frame onto the corpus scan."""
    if "retriever" in body:
        # ES 8.14+ retriever tree — lowered to the legacy query/knn/
        # rank form before anything else looks at the body
        if "query" in body or "knn" in body:
            raise ValueError(
                "retriever is mutually exclusive with top-level "
                "query/knn (ES rejects the combination too)"
            )
        ret = body["retriever"]
        if (
            isinstance(ret, dict)
            and "text_similarity_reranker" in ret
        ):
            # two-stage retrieve-then-rerank: executes, not lowers
            return _run_text_similarity_reranker(
                df, body, base_df, relations
            )
        body = _lower_retriever(body)
    if "runtime_mappings" in body:
        df = _with_runtime_fields(df, body["runtime_mappings"])
        if base_df is not None:
            base_df = _with_runtime_fields(
                base_df, body["runtime_mappings"]
            )
    pre = base_df if base_df is not None else df
    if "query" in body and relations:
        resolved = _resolve_terms_lookups(body["query"], relations)
        if resolved != body["query"]:
            body = {**body, "query": resolved}
    if (
        isinstance(body.get("query"), dict)
        and len(body["query"]) == 1
        and next(iter(body["query"])) in _RELATION_QUERIES
    ):
        # join-field queries are FRAME-level (they join another
        # frame), so they resolve here, before the predicate compiler;
        # global buckets still escape to the unfiltered frame
        df = _apply_relation_query(df, body["query"], relations)
        body = {k: v for k, v in body.items() if k != "query"}
    if "knn" in body:
        if "aggs" in body or "suggest" in body:
            raise ValueError(
                "knn composes with query (hybrid scoring / rank.rrf), "
                "not with aggs or suggest"
            )
        return _run_knn(df, body)
    if "suggest" in body:
        if "query" in body or "aggs" in body:
            raise ValueError(
                "suggest-only bodies here: the one-DataFrame contract "
                "cannot carry hits AND suggestions"
            )
        return _run_suggest(df, body["suggest"])
    sort = body.get("sort")
    both = "aggs" in body and "size" in body
    wants_hits = "aggs" not in body or both
    # (field, order, missing) triples — missing is ES-default
    # _last for field sorts, irrelevant for _score/script sorts
    sort_specs: list[tuple[str, str, str]] = []
    script_sorts: list[tuple[str, Column]] = []
    for s in sort or []:
        if isinstance(s, str):
            sort_specs.append(
                (s, "desc" if s == "_score" else "asc", "_last")
            )
        elif len(s) == 1 and next(iter(s)) == "_script":
            # ES script sort: the painless-subset expression becomes a
            # derived sort column on the hit frame (dropped from the
            # returned page)
            spec = s["_script"]
            order = spec.get("order", "asc")
            if order not in ("asc", "desc"):
                raise ValueError(f"sort: bad order {order!r}")
            name = f"__script_sort_{len(script_sorts)}"
            script_sorts.append((name, _script_col(spec)))
            sort_specs.append((name, order, "_last"))
        elif len(s) == 1 and next(iter(s)) == "_geo_distance":
            # ES geo-distance sort (Kibana maps): the sort key is the
            # SQUARED planar distance — monotonic with distance under
            # the repo's centi-degree convention, so the order is
            # identical and the expression stays integer-exact; the
            # derived column is dropped from the returned page
            spec = s["_geo_distance"]
            order = spec.get("order", "asc")
            if order not in ("asc", "desc"):
                raise ValueError(f"sort: bad order {order!r}")
            rest = {
                k: v
                for k, v in spec.items()
                if k not in ("order", "unit", "distance_type", "mode")
            }
            if len(rest) != 1:
                raise ValueError(
                    f"_geo_distance must name exactly one geo field: {s}"
                )
            (gfield, origin), = rest.items()
            try:
                olat, olon = origin["lat"], origin["lon"]
            except (KeyError, TypeError):
                raise ValueError(
                    f"_geo_distance origin needs lat/lon: {origin!r}"
                )
            pt = F.col(gfield)
            dlat = pt["lat"] - F.lit(olat)
            dlon = pt["lon"] - F.lit(olon)
            name = f"__script_sort_geo{len(script_sorts)}"
            script_sorts.append((name, dlat * dlat + dlon * dlon))
            sort_specs.append((name, order, "_last"))
        else:
            (field, spec), = s.items()
            order = spec.get("order", "asc") if isinstance(spec, dict) else spec
            if order not in ("asc", "desc"):
                raise ValueError(f"sort: bad order {order!r}")
            # ES: missing values sort LAST by default (Spark's asc()
            # would put nulls first); explicit "missing" overrides
            missing = (
                spec.get("missing", "_last")
                if isinstance(spec, dict)
                else "_last"
            )
            if missing not in ("_first", "_last"):
                raise ValueError(
                    f"sort: missing must be _first/_last: {missing!r}"
                )
            sort_specs.append((field, order, missing))
    # ES default when a top-N hit list is requested without sort:
    # _score desc (an unsized, unsorted body stays a plain filtered
    # frame — the analytics passthrough)
    if wants_hits and not sort_specs and "size" in body:
        sort_specs = [("_score", "desc", "_last")]
    need_score = wants_hits and any(
        f == "_score" for f, _, _ in sort_specs
    )

    out = df
    score: Column | None = None
    # body-level min_score excludes docs during the QUERY phase (ES:
    # aggregations exclude them too), so the score is computed even
    # under a non-score sort
    must_score = need_score or "min_score" in body
    if "query" in body:
        out, score = _score_and_filter(out, body["query"], must_score)
    elif must_score:
        score = F.lit(1.0)
    if "min_score" in body:
        out = out.filter(score >= F.lit(float(body["min_score"])))

    if "post_filter" in body and not wants_hits:
        raise ValueError(
            "post_filter shapes the HIT list; this body requests no "
            "hits (add size, or drop post_filter)"
        )
    if body.get("track_total_hits") and not both:
        raise ValueError(
            "track_total_hits is returned as a section row — it needs "
            "the two-section (aggs + size) body"
        )
    # ES post_filter: narrows the HIT list only, AFTER aggregations —
    # the faceted-navigation contract (facet counts ignore the facet
    # the user just clicked)
    hit_in = (
        apply_query(out, body["post_filter"])
        if "post_filter" in body
        else out
    )
    for sname, sexpr in script_sorts:
        hit_in = hit_in.withColumn(sname, sexpr)

    if "aggs" in body and not both:
        from .aggsdsl import apply_aggs, apply_es_default_sizes

        return apply_aggs(
            out, apply_es_default_sizes(body["aggs"]), base_df=pre
        )
    if both:
        from .aggsdsl import apply_aggs, apply_es_default_sizes

        hits = _run_hits(
            df, hit_in, score, body, sort_specs, need_score,
            with_rank=True,
        )
        aggs = apply_aggs(
            out, apply_es_default_sizes(body["aggs"]), base_df=pre
        )
        overlap = (set(hits.columns) - {"hit_rank"}) & set(aggs.columns)
        if overlap:
            raise ValueError(
                "hits+aggs response: column collision "
                f"{sorted(overlap)} between hit _source and agg "
                "columns — narrow _source or rename the aggs"
            )
        hits = hits.select(F.lit("hits").alias("section"), "*")
        aggs = aggs.select(F.lit("aggs").alias("section"), "*")
        union = hits.unionByName(aggs, allowMissingColumns=True)
        if body.get("track_total_hits"):
            # hits.total as a section row: the FULL post-filtered hit
            # count, not the returned page size
            total = hit_in.agg(
                F.count(F.lit(1)).cast("long").alias("doc_count")
            ).select(F.lit("total").alias("section"), "doc_count")
            union = union.unionByName(total, allowMissingColumns=True)
        return union
    return _run_hits(
        df, hit_in, score, body, sort_specs, need_score, with_rank=False
    )


_RUNTIME_TYPES = {
    "long": "long",
    "double": "double",
    "keyword": "string",
    "boolean": "boolean",
    "date": "timestamp",
}


def _with_runtime_fields(df: DataFrame, mappings: dict) -> DataFrame:
    """ES ``runtime_mappings``: fields defined IN the request body and
    visible to query/sort/aggs — lowered to withColumn over the index
    frame with the painless arithmetic subset (same contract as
    script_score), cast to the declared runtime type."""
    for name, spec in mappings.items():
        rtype = (spec or {}).get("type")
        src = ((spec or {}).get("script") or {}).get("source")
        if rtype not in _RUNTIME_TYPES or not src:
            raise ValueError(
                f"runtime_mappings {name!r} needs type "
                f"{sorted(_RUNTIME_TYPES)} and script.source: {spec}"
            )
        df = df.withColumn(
            name, _script_col(spec).cast(_RUNTIME_TYPES[rtype])
        )
    return df


def _run_hits(
    df: DataFrame,
    out: DataFrame,
    score: Column | None,
    body: dict,
    sort_specs: list[tuple[str, str, str]],
    need_score: bool,
    with_rank: bool,
) -> DataFrame:
    """The hit-list half of a ``_search`` body (see run_search_body):
    ``df`` is the full index frame (corpus statistics / tie-break
    source), ``out`` the query-filtered frame, ``score`` the computed
    ``_score`` column when the request is score-ordered. With
    ``with_rank`` the returned page carries ``hit_rank`` — the 1-based
    position under the final order (computed on the already-limited
    page, so the single-partition window is size-bounded)."""
    from pyspark.sql import Window

    if need_score:
        out = out.withColumn("_score", score)
    if "highlight" in body:
        out = _apply_highlight(out, body)
    # ES script_fields: per-hit computed values (painless arithmetic
    # subset) — computed BEFORE the _source projection so they may
    # reference columns _source drops, returned alongside it
    script_field_names: list[str] = []
    for name, spec in (body.get("script_fields") or {}).items():
        if not ((spec or {}).get("script") or {}).get("source"):
            raise ValueError(
                f"script_fields {name!r} needs script.source: {spec}"
            )
        out = out.withColumn(name, _script_col(spec))
        script_field_names.append(name)
    # ES docvalue_fields / fields: extra returned columns, optionally
    # format-applied (dates); surfaced as <field>__dv so a formatted
    # copy never collides with the raw _source column
    dv_names: list[str] = []
    for spec in list(body.get("docvalue_fields") or []) + list(
        body.get("fields") or []
    ):
        if isinstance(spec, str):
            fld, fmt = spec, None
        elif isinstance(spec, dict) and "field" in spec:
            fld, fmt = spec["field"], spec.get("format")
        else:
            raise ValueError(f"docvalue/fields entry needs a field: {spec}")
        if fld not in out.columns:
            raise ValueError(f"docvalue/fields: unknown field {fld!r}")
        name = f"{fld}__dv"
        col = F.col(fld)
        if fmt == "epoch_millis":
            col = F.unix_millis(col)
        elif fmt:
            # ES date-format pattern (java.time compatible subset)
            col = F.date_format(col, fmt)
        out = out.withColumn(name, col)
        dv_names.append(name)
    cols = [
        (
            (F.col(f).desc_nulls_first() if missing == "_first"
             else F.col(f).desc_nulls_last())
            if order == "desc"
            else (F.col(f).asc_nulls_first() if missing == "_first"
                  else F.col(f).asc_nulls_last())
        )
        for f, order, missing in sort_specs
    ]
    tb_names = _tiebreak_names(df, [f for f, _, _ in sort_specs])
    cols += [F.col(c).asc() for c in tb_names]
    if "search_after" in body:
        if "from" in body:
            raise ValueError(
                "search_after and from are mutually exclusive (ES)"
            )
        values = body["search_after"]
        # the engine appends a _doc tie-break to the ORDER BY; one
        # extra search_after value addresses it so documents tied on
        # the requested keys at a page boundary are neither skipped
        # nor duplicated on the next page
        effective = list(sort_specs)
        if (
            len(values) == len(sort_specs) + 1
            and len(tb_names) == 1
            and tb_names[0] not in [f for f, _, _ in sort_specs]
        ):
            # the appended tie-break column sorts plain .asc() —
            # Spark's nulls-FIRST — so its null position is _first
            effective.append((tb_names[0], "asc", "_first"))
        elif not sort_specs or len(values) != len(sort_specs):
            raise ValueError(
                "search_after needs one value per sort key "
                f"{[f for f, _, _ in sort_specs]} (+ optionally one for "
                f"the {tb_names} tie-break): {values}"
            )
        # strict-after tuple in per-key direction: scalable deep
        # pagination — the predicate filters BEFORE the top-N, so
        # page 100 costs the same as page 1. NULL-AWARE in both the
        # cursor values and the document keys, consistent with each
        # key's missing=_first/_last null position, so a scroll whose
        # sort key has a NULL tail stays exhaustive (a NULL cursor
        # must not three-value the predicate to false)
        cond = F.lit(False)
        eq_prefix = F.lit(True)
        for (field, order, missing), v in zip(effective, values):
            c = F.col(field)
            nulls_last = missing == "_last"
            if v is None:
                # after a NULL cursor key: under nulls-last nothing in
                # this key sorts beyond NULL (ties break on later
                # keys); under nulls-first every non-null doc does
                beyond = F.lit(False) if nulls_last else c.isNotNull()
                eq = c.isNull()
            else:
                base = c > F.lit(v) if order == "asc" else c < F.lit(v)
                beyond = F.coalesce(base, F.lit(False))
                if nulls_last:
                    beyond = beyond | c.isNull()
                eq = c.eqNullSafe(F.lit(v))
            cond = cond | (eq_prefix & beyond)
            eq_prefix = eq_prefix & eq
        out = out.filter(cond)
    if "collapse" in body:
        # field collapsing: the result keeps only the BEST hit per
        # collapse-key group under the request's sort (ES semantics),
        # then the global sort/size applies over the group winners.
        # NULL keys form one group (SQL grouping; ES needs doc_values
        # so missing-field docs don't reach collapse at all).
        # Plan shape: one window over the filtered frame — the
        # per-group row_number is a partial TakeOrdered per key, no
        # extra scan.
        cfield = body["collapse"].get("field")
        if not cfield:
            raise ValueError(f"collapse needs a field: {body['collapse']}")
        wc = Window.partitionBy(cfield).orderBy(*cols)
        out = (
            out.withColumn("__c_rn", F.row_number().over(wc))
            .filter(F.col("__c_rn") == 1)
            .drop("__c_rn")
        )
    out = out.orderBy(*cols)
    order_cols = cols
    if "rescore" in body:
        # ES rescore: only the top window_size hits of the PRIMARY
        # score order are re-scored and re-sorted; combined =
        # query_weight * primary + rescore_query_weight * secondary
        # (secondary contributes only where the rescore query
        # matches). Hits BEYOND the window keep their primary scores
        # and follow the rescored set in primary order, so a size >
        # window_size request returns the same hit count as ES. ES
        # rejects rescore under an explicit non-_score sort — so does
        # this.
        if [(f, o) for f, o, _ in sort_specs] != [("_score", "desc")]:
            raise ValueError(
                "rescore requires _score-ordered hits (ES rejects an "
                "explicit sort)"
            )
        spec = body["rescore"]
        window = int(spec.get("window_size", 10))
        rq_spec = spec.get("query") or {}
        rq = rq_spec.get("rescore_query")
        if not rq:
            raise ValueError(f"rescore needs query.rescore_query: {spec}")
        w1 = float(rq_spec.get("query_weight", 1.0))
        w2 = float(rq_spec.get("rescore_query_weight", 1.0))
        # the secondary scorer evaluates on window rows only; its
        # corpus statistics (BM25 df/avgdl) still come from the full
        # index frame, like ES
        _, sec_score = _score_and_filter(df, rq, True)
        matches = F.coalesce(
            compile_query(rq, id_col=_identity_col(df)), F.lit(False)
        )
        combined = F.lit(w1) * F.col("_score") + F.when(
            matches, F.lit(w2) * sec_score
        ).otherwise(F.lit(0.0))
        win_frame = (
            out.limit(window)
            .withColumn("_score", combined)
            .withColumn("__seg", F.lit(0))
        )
        tail = out.offset(window).withColumn("__seg", F.lit(1))
        order_cols = [
            F.col("__seg").asc(),
            F.col("_score").desc(),
            *_doc_tiebreak(df, ["_score"]),
        ]
        out = win_frame.unionByName(tail).orderBy(*order_cols)
    if "from" in body:
        out = out.offset(int(body["from"]))
    if "size" in body:
        out = out.limit(int(body["size"]))
    if with_rank:
        # rank of the hit within the returned page (1-based, final
        # order) — computed AFTER the limit, so the single-partition
        # window covers at most ``size`` rows
        out = out.withColumn(
            "hit_rank",
            F.row_number().over(Window.orderBy(*order_cols)).cast("long"),
        )
    if "__seg" in out.columns:
        out = out.drop("__seg")
    out = out.drop(
        *[c for c in out.columns if c.startswith("__script_sort_")]
    )
    if "_source" in body:
        extras = set(script_field_names) | set(dv_names)
        keep = _source_columns(
            [
                c
                for c in out.columns
                if c not in ("_score", "hit_rank") and c not in extras
            ],
            body["_source"],
        )
        # script_fields / docvalue_fields are returned ALONGSIDE the
        # _source selection (ES keeps them in separate response
        # sections; the flat frame appends them), even under
        # _source: false
        keep += [c for c in (*script_field_names, *dv_names)
                 if c not in keep]
        if need_score and "_score" not in keep:
            keep.append("_score")
        if "highlight" in body:
            keep += [
                f"{f}_highlight"
                for f in body["highlight"].get("fields", {})
                if f"{f}_highlight" not in keep
            ]
        if with_rank:
            keep = ["hit_rank"] + [k for k in keep if k != "hit_rank"]
        out = out.select(*keep)
    return out



def run_msearch(
    df: DataFrame, bodies: list, base_df: DataFrame | None = None
) -> DataFrame:
    """ES ``_msearch``: several request bodies against one index frame
    in one call — the union of each body's response frame, tagged with
    a 1-based ``request`` ordinal (columns a given response lacks are
    NULL on its rows; same-named columns must agree in type across the
    bodies, enforced by the union at plan time).

    Plan shape: one branch per body over the shared scan — exactly the
    per-body plans run_search_body would build, so nothing is re-read
    per request beyond what each body needs."""
    if not isinstance(bodies, (list, tuple)) or not bodies:
        raise ValueError(f"_msearch needs a non-empty body list: {bodies}")
    out = None
    for i, body in enumerate(bodies, start=1):
        part = run_search_body(df, body, base_df=base_df).select(
            F.lit(i).cast("long").alias("request"), "*"
        )
        out = (
            part
            if out is None
            else out.unionByName(part, allowMissingColumns=True)
        )
    return out


def run_count_body(df: DataFrame, body: dict) -> DataFrame:
    """ES ``_count``: one (count) row for the body's query (match_all
    when absent) — the filtered count with every pushable conjunct at
    the scan, no sort, no hit materialization."""
    out = df
    if "query" in body:
        out = apply_query(out, body["query"])
    return out.agg(F.count(F.lit(1)).cast("long").alias("count"))


def _query_terms_for(
    query: dict, field: str
) -> tuple[list[str], list[str]]:
    """(exact terms, prefixes) the query holds for ``field`` — what
    the unified highlighter marks. Recurses through bool (must /
    filter / should — never must_not, like ES), dis_max,
    constant_score, boosting (positive), pinned (organic) and the
    parsed Lucene queries; collects from the match family including
    phrase and the search-as-you-type leaves (whose terminal token is
    a PREFIX mark)."""
    terms: list[str] = []
    prefixes: list[str] = []
    wildcards: list[str] = []

    def _text_of(value) -> str:
        return str(value["query"] if isinstance(value, dict) else value)

    def walk(q) -> None:
        if not isinstance(q, dict) or len(q) != 1:
            return
        kind, body = next(iter(q.items()))
        if kind in ("query_string", "simple_query_string"):
            from .luceneq import (
                query_string_to_dsl,
                simple_query_string_to_dsl,
            )

            walk(
                query_string_to_dsl(body)
                if kind == "query_string"
                else simple_query_string_to_dsl(body)
            )
        elif kind in ("match", "match_phrase"):
            f, value = _one_field(kind, body)
            if f == field:
                terms.extend(t for t in _text_of(value).split() if t)
        elif kind in ("match_phrase_prefix", "match_bool_prefix"):
            f, value = _one_field(kind, body)
            if f == field:
                toks = [t for t in _text_of(value).split() if t]
                terms.extend(toks[:-1])
                if toks:
                    prefixes.append(toks[-1])
        elif kind == "_token_prefix":
            f, value = _one_field(kind, body)
            if f == field:
                prefixes.append(str(value))
        elif kind == "_token_wildcard":
            f, value = _one_field(kind, body)
            if f == field:
                wildcards.append(str(value))
        elif kind == "multi_match" and field in (body.get("fields") or []):
            toks = [t for t in str(body["query"]).split() if t]
            if body.get("type") in ("phrase_prefix", "bool_prefix"):
                terms.extend(toks[:-1])
                if toks:
                    prefixes.append(toks[-1])
            else:
                terms.extend(toks)
        elif kind == "bool":
            # must_not terms are intentionally NOT highlighted
            for key in ("must", "filter", "should"):
                for sub in _as_list(body.get(key)):
                    walk(sub)
        elif kind == "dis_max":
            for sub in body.get("queries") or []:
                walk(sub)
        elif kind == "constant_score":
            walk(body.get("filter"))
        elif kind == "boosting":
            walk(body.get("positive"))
        elif kind == "pinned":
            walk(body.get("organic"))
        elif kind == "function_score":
            walk(body.get("query", {}))

    walk(query)
    # order-preserving dedup
    return (
        list(dict.fromkeys(terms)),
        list(dict.fromkeys(prefixes)),
        list(dict.fromkeys(wildcards)),
    )


def _apply_highlight(out: DataFrame, body: dict) -> DataFrame:
    """ES ``highlight`` for the whitespace analyzer: each requested
    field gains a ``<field>_highlight`` column — the analyzed field
    with every matched query token wrapped in ``<em>`` tags, as ONE
    whole-field fragment (ES ``number_of_fragments: 0``). Terms are
    extracted RECURSIVELY from the query like ES's unified
    highlighter (bool / dis_max / constant_score / boosting / pinned
    wrappers, the match family incl. phrase and the prefix leaves,
    parsed query_string) — must_not terms never highlight. Pure
    codegen (split / transform / join), no UDFs."""
    fields = body["highlight"].get("fields")
    if not isinstance(fields, dict) or not fields:
        raise ValueError(
            f"highlight needs a fields dict: {body['highlight']}"
        )
    query = body.get("query", {})
    for field, fopts in fields.items():
        fopts = fopts or {}
        if "fragment_size" in fopts:
            raise ValueError(
                "highlight: char-based fragment_size is not lowered — "
                "use number_of_fragments with fragment_token_radius "
                "(the engine's token-window fragments)"
            )
        nfrag = int(fopts.get("number_of_fragments", 0))
        radius = int(fopts.get("fragment_token_radius", 5))
        terms, prefixes, wildcards = _query_terms_for(query, field)
        if not terms and not prefixes and not wildcards:
            raise ValueError(
                f"highlight field {field!r}: the query holds no "
                "highlightable terms for it (term extraction covers "
                "the match family, query_string, and bool/dis_max/"
                "constant_score/boosting/pinned wrappers)"
            )

        def _hit(t: Column) -> Column:
            cond = t.isin(*terms) if terms else F.lit(False)
            for p in prefixes:
                cond = cond | t.startswith(p)
            for w in wildcards:
                cond = cond | t.like(_wildcard_to_like(w))
            return cond

        toks = _tokens(F.col(field))
        marked = F.transform(
            toks,
            lambda t: F.when(
                _hit(t), F.concat(F.lit("<em>"), t, F.lit("</em>"))
            ).otherwise(t),
        )
        if nfrag > 0:
            # snippet mode: up to number_of_fragments token windows of
            # +-fragment_token_radius around the FIRST N match
            # positions, joined with " ... " (the engine's token-based
            # reading of ES's char-sized fragments; windows at the
            # text edges clamp, close matches may produce overlapping
            # fragments — ES merges them, documented divergence)
            mpos = F.filter(
                F.transform(
                    marked,
                    lambda x, i: F.when(
                        x.startswith("<em>"), i
                    ).otherwise(F.lit(-1)),
                ),
                lambda p: p >= 0,
            )
            first_n = F.slice(mpos, 1, nfrag)

            def _frag(p: Column) -> Column:
                start = F.greatest(F.lit(1), p + 1 - radius)
                length = p + 1 + radius - start + 1
                return F.array_join(F.slice(marked, start, length), " ")

            hcol = F.array_join(F.transform(first_n, _frag), " ... ")
        else:
            hcol = F.array_join(marked, " ")
        out = out.withColumn(f"{field}_highlight", hcol)
    return out


def _run_suggest(df: DataFrame, suggest: dict) -> DataFrame:
    """ES ``suggest`` section, term suggester: for each whitespace
    token of ``text`` that is MISSING from the index vocabulary
    (suggest_mode=missing, ES's default), propose vocabulary terms
    within ``max_edits`` (default 2), ordered by (edit distance asc,
    doc frequency desc, term asc), ``size`` per token (default 5).
    Returns (suggest_name, token, suggestion, freq, distance) rows.

    Scale shape: the vocabulary is ONE explode + groupBy over the
    field (vocabulary-sized result); each literal query token probes
    it via an in-row explode — per-token work is vocabulary-sized,
    never corpus-sized, and the distance runs per DISTINCT term."""
    from pyspark.sql import Window

    out = None
    for name, spec in suggest.items():
        text = spec.get("text")
        term_spec = spec.get("term")
        if not text or not isinstance(term_spec, dict):
            raise ValueError(
                f"suggest {name!r} needs text and a term suggester: {spec}"
            )
        field = term_spec["field"]
        max_edits = int(term_spec.get("max_edits", 2))
        if not 1 <= max_edits <= 2:
            raise ValueError(f"max_edits must be 1..2 (ES): {max_edits}")
        size = int(term_spec.get("size", 5))
        q_toks = sorted({t for t in str(text).split() if t})
        if not q_toks:
            raise ValueError(f"suggest {name!r}: empty text")
        vocab = (
            df.select(F.explode(_tokens(F.col(field))).alias("suggestion"))
            .groupBy("suggestion")
            .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        )
        known = {
            r["suggestion"]
            for r in vocab.filter(
                F.col("suggestion").isin(*q_toks)
            ).collect()  # <= len(q_toks) rows
        }
        missing = [t for t in q_toks if t not in known]
        if not missing:
            part = vocab.limit(0).select(
                F.lit(name).alias("suggest_name"),
                F.lit("").alias("token"),
                "suggestion",
                "freq",
                F.lit(0).cast("long").alias("distance"),
            )
        else:
            probed = vocab.select(
                F.explode(
                    F.array(*[F.lit(t) for t in missing])
                ).alias("token"),
                "suggestion",
                "freq",
            ).withColumn(
                "distance",
                F.levenshtein(F.col("suggestion"), F.col("token")).cast(
                    "long"
                ),
            ).filter(
                (F.col("distance") <= max_edits) & (F.col("distance") > 0)
            )
            w = Window.partitionBy("token").orderBy(
                F.col("distance").asc(),
                F.col("freq").desc(),
                F.col("suggestion").asc(),
            )
            part = (
                probed.withColumn("__sn", F.row_number().over(w))
                .filter(F.col("__sn") <= size)
                .drop("__sn")
                .select(
                    F.lit(name).alias("suggest_name"),
                    "token",
                    "suggestion",
                    "freq",
                    "distance",
                )
            )
        out = part if out is None else out.unionByName(part)
    return out


def _knn_score(field: str, qv: list) -> Column:
    """ES dense-vector cosine score ``(1 + cos) / 2`` of a literal
    query vector against an ``array<float>`` column — a codegen
    zip_with dot product, no UDF."""
    import math

    qnorm = math.sqrt(sum(float(x) * float(x) for x in qv)) or 1.0
    lit_v = F.array(*[F.lit(float(x)) for x in qv])
    v = F.col(field).cast("array<double>")
    dot = F.aggregate(
        F.zip_with(v, lit_v, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    vnorm = F.sqrt(
        F.aggregate(
            F.transform(v, lambda a: a * a),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    cos = dot / (vnorm * F.lit(qnorm))
    return (F.lit(1.0) + cos) / F.lit(2.0)


def _run_knn(df: DataFrame, body: dict) -> DataFrame:
    """ES ``knn`` search section: exact cosine top-k of a literal
    query vector over an ``array<float>`` column, scored with ES's
    dense-vector scaling ``(1 + cosine) / 2``; the optional ``filter``
    is a standard query-DSL pre-filter (applied BEFORE the top-k,
    like ES).

    Hybrid search (ES 8): when the body ALSO carries ``query``, the
    final score is additive — the knn section contributes
    ``boost * knn_score`` only for documents in its global top ``k``,
    the query contributes its score only for matching documents, and
    the hit set is the union of both arms. Under
    ``rank: {rrf: {rank_window_size, rank_constant}}`` the arms fuse
    by reciprocal rank instead: sum of ``1 / (rank_constant +
    arm_rank)`` over the arms that retrieved the doc within the
    window (ES's RRF formula; same lowering as the standalone
    ``hybrid_rrf_search``).

    Scale shape: a codegen zip_with dot product per row +
    TakeOrdered(k) — the corpus never shuffles; the hybrid paths
    broadcast-join the k-row (or window-row) arm frames onto the
    corpus scan, so documents still never shuffle. Swap in the IVF /
    LSH / PQ index paths of operators/similarity.py when a physical
    index exists."""
    knn = body["knn"]
    if isinstance(knn, (list, tuple)):
        # ES 8.7 multi-knn: several sections (different vector fields
        # or query vectors), each retrieving its own top k; a doc's
        # score is the SUM of the sections that retrieved it
        return _run_knn_multi(df, body)
    try:
        field, qv, k = knn["field"], knn["query_vector"], int(knn["k"])
    except (KeyError, TypeError):
        raise ValueError(f"knn needs field, query_vector, k: {knn}")
    if not qv or not all(isinstance(x, (int, float)) for x in qv):
        raise ValueError("knn query_vector must be a non-empty number list")
    boost = float(knn.get("boost", 1.0))
    kscore = _knn_score(field, qv) * F.lit(boost)
    filtered = df
    if "filter" in knn:
        filtered = apply_query(filtered, knn["filter"])
    if "similarity" in knn:
        # ES knn similarity: the minimum RAW cosine a vector needs to
        # be a hit (applied before boost) — (1+cos)/2 >= (1+sim)/2
        sim = float(knn["similarity"])
        if not -1.0 <= sim <= 1.0:
            raise ValueError(f"knn similarity must be in [-1, 1]: {sim}")
        filtered = filtered.filter(
            _knn_score(field, qv) >= F.lit((1.0 + sim) / 2.0)
        )

    if "query" in body:
        return _run_knn_hybrid(df, filtered, kscore, k, body)

    out = filtered.withColumn("_score", kscore)
    cols = [F.col("_score").desc()] + _doc_tiebreak(df, ["_score"])
    # ES returns min(size, k) hits: knn retrieves k candidates, the
    # body-level size (default 10 in ES; default k here so a bare knn
    # body still returns its full top-k) trims the returned page
    out = out.orderBy(*cols).limit(min(k, int(body.get("size", k))))
    if "_source" in body:
        keep = _source_columns(
            [c for c in out.columns if c != "_score"], body["_source"]
        )
        if "_score" not in keep:
            keep.append("_score")
        out = out.select(*keep)
    return out


def _run_knn_multi(df: DataFrame, body: dict) -> DataFrame:
    """ES 8.7+ multi-knn: ``knn`` is a LIST of sections — multi-field
    vector search (e.g. a text embedding and an image embedding per
    document). Each section runs its own exact top-k (with its own
    filter / similarity / boost); the hit set is the union and a
    doc's ``_score`` sums the contributions of every section that
    retrieved it, like ES's additive combination. ``query`` does not
    compose with the list form here (use the single-knn hybrid path).

    Scale shape: one codegen dot product + TakeOrdered(k) per section
    over the shared scan; the k-row arm frames union and
    broadcast-join back onto the corpus — documents never shuffle."""
    if "query" in body:
        raise ValueError(
            "multi-knn does not compose with query here — use a "
            "single knn section for hybrid scoring"
        )
    sections = body["knn"]
    if not sections:
        raise ValueError("knn list must be non-empty")
    idc = _identity_col(df)
    if idc not in df.columns:
        raise ValueError(
            "multi-knn needs a document identity column "
            f"(doc_id / id / event_id) to union the arms: {df.columns}"
        )
    arms = []
    for knn in sections:
        try:
            field, qv, k = (
                knn["field"], knn["query_vector"], int(knn["k"])
            )
        except (KeyError, TypeError):
            raise ValueError(f"knn needs field, query_vector, k: {knn}")
        kscore = _knn_score(field, qv) * F.lit(float(knn.get("boost", 1.0)))
        filtered = df
        if "filter" in knn:
            filtered = apply_query(filtered, knn["filter"])
        if "similarity" in knn:
            sim = float(knn["similarity"])
            filtered = filtered.filter(
                _knn_score(field, qv) >= F.lit((1.0 + sim) / 2.0)
            )
        arms.append(
            filtered.withColumn("__s", kscore)
            .orderBy(F.col("__s").desc(), *_doc_tiebreak(df, []))
            .limit(k)
            .select(idc, "__s")
        )
    fused = (
        functools.reduce(lambda a, b: a.unionByName(b), arms)
        .groupBy(idc)
        .agg(F.sum("__s").alias("_score"))
    )
    out = df.join(F.broadcast(fused), idc, "inner")
    size = int(body.get("size", max(int(s["k"]) for s in sections)))
    out = out.orderBy(
        F.col("_score").desc(), *_doc_tiebreak(df, ["_score"])
    ).limit(size)
    if "_source" in body:
        keep = _source_columns(
            [c for c in out.columns if c != "_score"], body["_source"]
        )
        if "_score" not in keep:
            keep.append("_score")
        out = out.select(*keep)
    return out


def _run_knn_hybrid(
    df: DataFrame, knn_filtered: DataFrame, kscore: Column, k: int, body: dict
) -> DataFrame:
    """ES 8 hybrid ``knn`` + ``query``: additive score combination by
    default, reciprocal-rank fusion under ``rank: {rrf: ...}`` (see
    _run_knn). Returns the top ``size`` hits (default ``k``)."""
    idc = _identity_col(df)
    if idc not in df.columns:
        raise ValueError(
            "hybrid knn+query needs a document identity column "
            f"(doc_id / id / event_id) to join the arms: {df.columns}"
        )
    size = int(body.get("size", k))
    topk = (
        knn_filtered.withColumn("__knn_score", kscore)
        .orderBy(F.col("__knn_score").desc(), *_doc_tiebreak(df, []))
        .limit(k)
        .select(idc, "__knn_score")
    )
    # the query arm scores over the FULL index frame (BM25 corpus
    # statistics from df, like ES), matching docs only
    _, qscore = _score_and_filter(df, body["query"], True)
    matches = F.coalesce(
        compile_query(body["query"], id_col=idc), F.lit(False)
    )

    rank = body.get("rank")
    if rank is not None:
        if not isinstance(rank, dict) or set(rank) not in (
            {"rrf"}, {"linear"}
        ):
            raise ValueError(f"rank supports rrf or linear: {rank}")
        from pyspark.sql import Window

        def _arm(frame, score):
            # one arm's top-window page: TakeOrdered(window) then
            # rank/stats over the window-bounded frame (single
            # partition, <= window rows — the same bounded contract
            # ES's coordinator works on)
            return (
                frame.withColumn("__s", score)
                .orderBy(F.col("__s").desc(), *_doc_tiebreak(df, []))
                .limit(window)
            )

        if "rrf" in rank:
            spec = rank["rrf"] or {}
            window = int(spec.get("rank_window_size", size))
            const = int(spec.get("rank_constant", 60))
            if window < size:
                raise ValueError(
                    f"rank_window_size {window} must be >= size {size} (ES)"
                )
            w_all = Window.orderBy(
                F.col("__s").desc(), *_doc_tiebreak(df, [])
            )
            arms = [
                _arm(knn_filtered, kscore)
                .withColumn("__rank", F.row_number().over(w_all))
                .select(idc, "__rank"),
                _arm(df.filter(matches), qscore)
                .withColumn("__rank", F.row_number().over(w_all))
                .select(idc, "__rank"),
            ]
            fused = (
                arms[0].unionByName(arms[1])
                .groupBy(idc)
                .agg(
                    F.sum(
                        F.lit(1.0) / (F.lit(const) + F.col("__rank"))
                    ).alias("_score")
                )
            )
        else:
            # ES 8.18 linear retriever: score = sum over arms of
            # weight * normalized(arm score over its top window);
            # normalizer minmax maps the window page to [0, 1]
            # (degenerate all-equal page -> 1), none keeps raw scores
            spec = rank["linear"] or {}
            window = int(spec.get("rank_window_size", size))
            if window < size:
                raise ValueError(
                    f"rank_window_size {window} must be >= size {size} (ES)"
                )

            def _contrib(frame, score, aspec):
                weight = float(aspec.get("weight", 1.0))
                norm = str(aspec.get("normalizer", "none"))
                a = _arm(frame, score)
                if norm == "minmax":
                    wb = Window.partitionBy()
                    mn = F.min("__s").over(wb)
                    mx = F.max("__s").over(wb)
                    val = F.when(
                        mx > mn, (F.col("__s") - mn) / (mx - mn)
                    ).otherwise(F.lit(1.0))
                elif norm == "none":
                    val = F.col("__s")
                else:
                    raise ValueError(
                        f"linear rank: unsupported normalizer "
                        f"{norm!r} (minmax or none)"
                    )
                return a.withColumn(
                    "__c", val * F.lit(weight)
                ).select(idc, "__c")

            arms = [
                _contrib(knn_filtered, kscore, spec.get("knn", {})),
                _contrib(df.filter(matches), qscore, spec.get("query", {})),
            ]
            fused = (
                arms[0].unionByName(arms[1])
                .groupBy(idc)
                .agg(F.sum("__c").alias("_score"))
            )
        out = df.join(F.broadcast(fused), idc, "inner")
    else:
        qs = F.when(matches, qscore).otherwise(F.lit(0.0))
        out = (
            df.join(F.broadcast(topk), idc, "left")
            .filter(matches | F.col("__knn_score").isNotNull())
            .withColumn(
                "_score", qs + F.coalesce(F.col("__knn_score"), F.lit(0.0))
            )
            .drop("__knn_score")
        )
    cols = [F.col("_score").desc()] + _doc_tiebreak(df, ["_score"])
    out = out.orderBy(*cols).limit(size)
    if "_source" in body:
        keep = _source_columns(
            [c for c in out.columns if c != "_score"], body["_source"]
        )
        if "_score" not in keep:
            keep.append("_score")
        out = out.select(*keep)
    return out
