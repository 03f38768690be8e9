"""Small ES REST APIs around the query surface: ``_analyze`` (what
tokens does this analyzer produce — the debugging staple behind every
"why doesn't my match hit" ticket), ``_search/template`` (mustache-
parameterized stored queries — what Kibana saved searches send), and
``_validate/query`` (plan-time query validation).

Reference context: the reference's indices (main.go:447) are queried
by exactly these Kibana/ops workflows.

All three are PLAN-TIME utilities: ``_analyze`` tokenizes one literal
text on the driver (ES does the same — no index touched);
``render_search_template`` is textual substitution + JSON parse;
``run_validate_query`` compiles the query and reports instead of
raising. None launches a distributed job by itself.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession

from .querydsl import _analyze_text, _check_analyzer, compile_query

__all__ = [
    "run_analyze",
    "render_search_template",
    "run_search_template",
    "run_msearch_template",
    "run_validate_query",
    "run_percolate",
    "run_field_caps",
    "run_rank_eval",
    "run_terms_enum",
    "run_explain",
    "run_mget",
]


def _token_spans(text: str, analyzer: str) -> list[tuple[str, int, int]]:
    """(token, start_offset, end_offset) triples, offsets into the
    ORIGINAL text (ES _analyze's offsets). The span regex mirrors the
    analyzer split exactly: whitespace keeps raw tokens; standard
    lowercases and takes letter/digit runs."""
    if analyzer == "standard":
        return [
            (m.group(0).lower(), m.start(), m.end())
            for m in re.finditer(r"[^\W_]+", text)
        ]
    return [
        (m.group(0), m.start(), m.end())
        for m in re.finditer(r"\S+", text)
    ]


def run_analyze(spark: SparkSession, body: dict) -> DataFrame:
    """ES ``_analyze``: tokenize the request's literal ``text`` with
    the named ``analyzer`` (whitespace default, like the engine's
    match queries; ``standard`` supported) and return one row per
    token: (text_ordinal, position, token, start_offset, end_offset).
    ``text`` may be a string or a list of strings — positions restart
    per text like ES (no position_increment_gap; single-field
    semantics).

    The token stream is by construction identical to what
    query/match-side analysis produces (same ``_analyze_text``), so
    what _analyze shows IS what the engine matches on."""
    text = body.get("text")
    if text is None:
        raise ValueError(f"_analyze needs text: {body}")
    analyzer = _check_analyzer(body.get("analyzer", "whitespace"))
    texts = text if isinstance(text, (list, tuple)) else [text]
    rows = []
    for ti, t in enumerate(texts):
        spans = _token_spans(str(t), analyzer)
        # cross-check: the span tokens must equal the match-side
        # analysis — one analyzer, one truth
        assert [s[0] for s in spans] == _analyze_text(t, analyzer)
        for pos, (tok, start, end) in enumerate(spans):
            rows.append((ti, pos, tok, start, end))
    return spark.createDataFrame(
        rows,
        "text_ordinal long, position long, token string, "
        "start_offset long, end_offset long",
    )


_TOJSON_RE = re.compile(r"\{\{#toJson\}\}\s*(\w+)\s*\{\{/toJson\}\}")
_VAR_RE = re.compile(r"\{\{\s*(\w+)\s*\}\}")


def render_search_template(source: str, params: dict | None) -> dict:
    """ES ``_render/template``: substitute mustache params into the
    template SOURCE (a JSON string), then parse. Supported mustache
    subset — what search templates actually use:

    - ``{{var}}``: textual substitution. Strings substitute their
      JSON-escaped content (the template supplies the quotes, like
      mustache); numbers/bools substitute their JSON literal.
    - ``{{#toJson}}var{{/toJson}}``: the param as a JSON value
      (lists/dicts — the term-list idiom).

    Unknown params and unparseable results fail LOUD at plan time
    (ES renders missing params as empty strings, which silently
    corrupts queries — the engine refuses instead; pass explicit
    params)."""
    params = params or {}

    def _tojson(m: re.Match) -> str:
        name = m.group(1)
        if name not in params:
            raise ValueError(f"search template: missing param {name!r}")
        return json.dumps(params[name])

    def _var(m: re.Match) -> str:
        name = m.group(1)
        if name not in params:
            raise ValueError(f"search template: missing param {name!r}")
        v = params[name]
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (int, float)):
            return json.dumps(v)
        if isinstance(v, str):
            # inner content only — the template supplies the quotes
            return json.dumps(v)[1:-1]
        raise ValueError(
            f"search template: param {name!r} is {type(v).__name__}; "
            "wrap lists/dicts in {{#toJson}}...{{/toJson}}"
        )

    rendered = _VAR_RE.sub(_var, _TOJSON_RE.sub(_tojson, source))
    if "{{" in rendered:
        raise ValueError(
            f"search template: unsupported mustache left in {rendered!r}"
        )
    try:
        body = json.loads(rendered)
    except json.JSONDecodeError as exc:
        raise ValueError(
            f"search template: rendered source is not JSON: {exc}"
        ) from exc
    if not isinstance(body, dict):
        raise ValueError("search template must render a request body")
    return body


def run_search_template(
    df: DataFrame, source: str, params: dict | None, **kwargs
) -> DataFrame:
    """``_search/template``: render, then execute through
    run_search_body — the rendered body costs exactly what the literal
    body would."""
    from .querydsl import run_search_body

    return run_search_body(df, render_search_template(source, params),
                           **kwargs)


def run_validate_query(df: DataFrame, body: dict) -> DataFrame:
    """ES ``_validate/query``: compile the body's query against the
    frame and report one row (valid, error) instead of raising —
    what CI linting of stored queries calls. Valid means the query
    COMPILES (ES's lightweight validation); it does not execute."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    try:
        pred = compile_query(body.get("query", {"match_all": {}}))
        df.select(pred.alias("__v")).schema  # analysis-checks columns
        return spark.range(1).select(
            F.lit(True).alias("valid"), F.lit("").alias("error")
        )
    except Exception as exc:  # noqa: BLE001 - the API reports, never raises
        return spark.range(1).select(
            F.lit(False).alias("valid"),
            F.lit(f"{type(exc).__name__}: {exc}"[:500]).alias("error"),
        )


def run_percolate(
    df: DataFrame,
    stored_queries: list[tuple[object, dict]],
    id_col: str | None = None,
) -> DataFrame:
    """ES percolation: STORED queries run against INCOMING documents —
    the alerting/saved-search primitive (`percolate` query over a
    queries index). ``stored_queries`` is the registered
    [(query_id, query-DSL dict), ...] list; every document of ``df``
    is tested against every stored query and the matching
    (query_id, doc identity) pairs return.

    Scale shape: all stored predicates compile into ONE projection —
    a per-row array of (query_id, matched) structs, exploded and
    filtered in the same stage. One corpus scan total for N queries,
    no shuffle, no per-query job; the stored-query list is plan-time
    state (bounded — ES holds it in the percolator index the same
    way). At 100 TB the cost is one pass regardless of alert count."""
    from pyspark.sql import functions as F

    from .querydsl import _identity_col, compile_query

    if not stored_queries:
        raise ValueError("run_percolate needs stored queries")
    idc = id_col or _identity_col(df)
    if idc not in df.columns:
        raise ValueError(f"run_percolate: no identity column {idc!r}")
    arms = [
        F.struct(
            F.lit(str(qid)).alias("query_id"),
            F.coalesce(
                compile_query(dsl, id_col=idc), F.lit(False)
            ).alias("matched"),
        )
        for qid, dsl in stored_queries
    ]
    return (
        df.select(F.col(idc), F.explode(F.array(*arms)).alias("__p"))
        .filter(F.col("__p.matched"))
        .select(F.col("__p.query_id").alias("query_id"), F.col(idc))
    )


def run_field_caps(df: DataFrame, fields: list[str] | None = None) -> DataFrame:
    """ES ``_field_caps``: per-field capabilities — what Kibana calls
    before rendering any index pattern. Returns one row per (possibly
    wildcard-filtered) column: (field, type, searchable, aggregatable)
    with ES type names mapped from the Spark schema (long/double/
    keyword/text-ish string, boolean, date, dense_vector for
    array<float>, nested for array<struct>, object for struct).

    Plan-time only: reads the resolved schema, launches nothing."""
    import fnmatch

    from pyspark.sql import functions as F, types as T

    def _es_type(dt: T.DataType) -> tuple[str, bool]:
        # (es type, aggregatable)
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType,
                           T.LongType)):
            return "long", True
        if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
            return "double", True
        if isinstance(dt, T.BooleanType):
            return "boolean", True
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType,
                           T.DateType)):
            return "date", True
        if isinstance(dt, T.StringType):
            return "keyword", True
        if isinstance(dt, T.BinaryType):
            return "binary", False
        if isinstance(dt, T.ArrayType):
            if isinstance(dt.elementType, (T.FloatType, T.DoubleType)):
                return "dense_vector", False
            if isinstance(dt.elementType, T.StructType):
                return "nested", False
            return "keyword", False
        if isinstance(dt, T.StructType):
            return "object", False
        return "unsupported", False

    rows = []
    for f in df.schema.fields:
        if fields and not any(
            f.name == pat or fnmatch.fnmatchcase(f.name, pat)
            for pat in fields
        ):
            continue
        es_type, agg = _es_type(f.dataType)
        rows.append((f.name, es_type, True, agg))
    if not rows:
        raise ValueError(f"_field_caps: no field matches {fields!r}")
    spark = df.sparkSession
    return spark.createDataFrame(
        rows, "field string, type string, searchable boolean, "
        "aggregatable boolean",
    ).orderBy(F.col("field"))


_RANK_EVAL_METRICS = ("precision", "recall", "mean_reciprocal_rank", "dcg")


def run_rank_eval(df: DataFrame, body: dict) -> DataFrame:
    """ES ``_rank_eval``: grade a set of search requests against
    human relevance ratings — the offline search-quality harness
    (``requests: [{id, request, ratings: [{_id, rating}]}]`` +
    ``metric``). Metrics: ``precision`` / ``recall`` (at k, with
    ``relevant_rating_threshold``, default 1),
    ``mean_reciprocal_rank`` (first relevant hit), and ``dcg``
    (optionally ``normalize``d to nDCG against the ideal ordering of
    the request's OWN ratings, like ES). Returns one
    (request_id, metric_score) row per request plus the ``_overall``
    average — ES's ``quality_level``.

    Scale shape: exactly ES's execution — each request RUNS (one
    TakeOrdered(k) plan over the corpus; k rows reach the driver),
    the grading is k-row arithmetic per request. Requests are a
    bounded list; the corpus is scanned once per request and never
    collected."""
    import math

    from pyspark.sql import functions as F

    from .querydsl import _identity_col, run_search_body

    requests = body.get("requests")
    metric = body.get("metric")
    if not requests or not isinstance(metric, dict) or len(metric) != 1:
        raise ValueError(
            f"_rank_eval needs requests and exactly one metric: {body}"
        )
    (mkind, mspec), = metric.items()
    mspec = mspec or {}
    if mkind not in _RANK_EVAL_METRICS:
        raise ValueError(
            f"_rank_eval: unsupported metric {mkind!r} "
            f"(supported: {_RANK_EVAL_METRICS})"
        )
    k = int(mspec.get("k", 10))
    thr = int(mspec.get("relevant_rating_threshold", 1))
    idc = _identity_col(df)
    rows = []
    for req in requests:
        rid = req.get("id")
        request = req.get("request")
        ratings = req.get("ratings")
        if rid is None or not isinstance(request, dict) or ratings is None:
            raise ValueError(
                f"_rank_eval request needs id, request, ratings: {req}"
            )
        rating_by_id = {}
        for r in ratings:
            if "_id" not in r or "rating" not in r:
                raise ValueError(f"rating needs _id and rating: {r}")
            rating_by_id[r["_id"]] = int(r["rating"])
        hits = run_search_body(
            df, {**request, "size": k, "_source": [idc]}
        ).select(idc).collect()  # k rows: the page being graded
        ranked = [h[idc] for h in hits]
        rels = [
            1 if rating_by_id.get(h, 0) >= thr else 0 for h in ranked
        ]
        if mkind == "precision":
            score = sum(rels) / k
        elif mkind == "recall":
            total_rel = sum(
                1 for v in rating_by_id.values() if v >= thr
            )
            score = (sum(rels) / total_rel) if total_rel else 0.0
        elif mkind == "mean_reciprocal_rank":
            score = 0.0
            for i, rel in enumerate(rels, start=1):
                if rel:
                    score = 1.0 / i
                    break
        else:  # dcg
            gains = [rating_by_id.get(h, 0) for h in ranked]
            score = sum(
                (2**g - 1) / math.log2(i + 1)
                for i, g in enumerate(gains, start=1)
            )
            if mspec.get("normalize"):
                ideal = sorted(rating_by_id.values(), reverse=True)[:k]
                idcg = sum(
                    (2**g - 1) / math.log2(i + 1)
                    for i, g in enumerate(ideal, start=1)
                )
                score = score / idcg if idcg else 0.0
        rows.append((str(rid), float(score)))
    overall = sum(s for _, s in rows) / len(rows)
    rows.append(("_overall", float(overall)))
    spark = df.sparkSession
    return spark.createDataFrame(
        rows, "request_id string, metric_score double"
    ).select("request_id", F.round("metric_score", 6).alias("metric_score"))


def run_msearch_template(
    df: DataFrame,
    entries: list[tuple[str, dict | None]],
    **kwargs,
) -> DataFrame:
    """``_msearch/template``: several (template source, params) pairs
    against one index frame — each renders then executes, and the
    responses union with a 1-based ``request`` ordinal exactly like
    ``_msearch`` (same column-union contract). Render failures fail
    the whole batch at plan time; a rendered body costs what the
    literal body would."""
    from pyspark.sql import functions as F

    from .querydsl import run_search_body

    if not entries:
        raise ValueError("_msearch/template needs a non-empty list")
    out = None
    for i, (source, params) in enumerate(entries, start=1):
        body = render_search_template(source, params)
        part = run_search_body(df, body, **kwargs).select(
            F.lit(i).cast("long").alias("request"), "*"
        )
        out = (
            part
            if out is None
            else out.unionByName(part, allowMissingColumns=True)
        )
    return out


def run_terms_enum(df: DataFrame, body: dict) -> DataFrame:
    """ES ``_terms_enum``: the distinct index terms of a field that
    start with ``string`` (case-insensitive under
    ``case_insensitive: true``), in term order, up to ``size``
    (default 10) — what field-value autocomplete UIs call (Kibana's
    filter-bar value suggestions). The engine enumerates the ANALYZED
    tokens of text fields (its index terms) or the raw values of
    keyword fields (``analyzed: false`` engine extension).

    Scale shape: one scan -> in-row token filter -> distinct on the
    (prefix-bounded) term set -> TakeOrdered(size). The distinct
    shuffle carries only prefix-matching terms — vocabulary-sized at
    worst, prefix-bounded in practice."""
    from pyspark.sql import functions as F

    from .querydsl import _tokens

    field = body.get("field")
    if not field:
        raise ValueError(f"_terms_enum needs a field: {body}")
    prefix = str(body.get("string", ""))
    size = int(body.get("size", 10))
    ci = bool(body.get("case_insensitive"))
    analyzed = body.get("analyzed", True)
    if analyzed:
        terms = df.select(
            F.explode(_tokens(F.col(field))).alias("term")
        )
    else:
        terms = df.select(F.col(field).cast("string").alias("term"))
    t = F.col("term")
    if prefix:
        cond = (
            F.lower(t).startswith(prefix.lower())
            if ci
            else t.startswith(prefix)
        )
        terms = terms.filter(cond)
    return (
        terms.filter(t.isNotNull())
        .distinct()
        .orderBy("term")
        .limit(size)
    )


def run_explain(
    df: DataFrame, doc_id, body: dict, *, id_field: str | None = None
) -> DataFrame:
    """ES ``_explain`` endpoint form: why (and how much) ONE document
    scores for a query — the relevance-debugging staple. Returns one
    row per scoring clause plus a ``total`` row: ``(doc_id, clause,
    matched, value)``. The decomposition mirrors the engine's bool
    scoring exactly (operators/querydsl._score_and_filter): every
    matching must/should clause adds its score (BM25 for the match
    family, the clause ``boost`` for constant-score leaves);
    filter/must_not clauses report their matched status with value
    0.0 (they gate, never score); the ``total`` row is computed by
    the SAME scoring expression ``_search`` ranks by, so explain and
    search can never disagree. Nested bools explain RECURSIVELY with
    dotted path labels (``must[1].should[0]:match``): the nested
    bool's own row carries its composed score and its children
    decompose it; descendants of filter/must_not report matched
    status with value 0.0. A non-bool query explains as one
    ``query:<kind>`` clause + total. Like ES, the document's row set
    comes back even when it does NOT match (``matched: false``
    everywhere, value 0.0). The per-TERM breakdown inside one BM25
    clause is ``plans/evalqa.explain_bm25_doc``.

    Scale shape: scoring expressions embed broadcast corpus stats
    (one tiny stats row per BM25 clause, same as ``_search``); the
    document filter is an id equality that pushes to the scan, and
    the clause rows explode from ONE matched row — no shuffle at
    all."""
    from pyspark.sql import functions as F

    from .querydsl import (
        _as_list,
        _identity_col,
        _leaf_boost,
        _score_and_filter,
    )

    query = body.get("query")
    if not isinstance(query, dict) or len(query) != 1:
        raise ValueError(
            f"_explain needs a body with exactly one query clause: {body}"
        )
    idc = id_field or _identity_col(df)
    if idc not in df.columns:
        raise ValueError(f"_explain: no identity column {idc!r}")
    kind, qbody = next(iter(query.items()))

    # clause kinds whose score is real (BM25 / feature / composed);
    # everything else is constant-score (its boost) — the SAME split
    # _score_and_filter's bool branch applies
    scored_kinds = (
        "match", "multi_match", "combined_fields", "bool", "dis_max",
        "query_string", "simple_query_string", "rank_feature",
        "distance_feature", "boosting", "pinned", "sparse_vector",
        "function_score", "script_score",
    )

    def _match_form(sub: dict) -> dict:
        # frame-level scoring wrappers match whatever their inner
        # query matches (min_score handled below for the total row)
        k, b = next(iter(sub.items()))
        if k in ("function_score", "script_score"):
            return _match_form(b.get("query", {"match_all": {}}))
        return sub

    def _matched(sub: dict):
        return F.coalesce(
            compile_query(_match_form(sub), id_col=idc), F.lit(False)
        )

    def _scoring_part(label: str, sub: dict):
        skind = next(iter(sub))
        if skind in scored_kinds:
            _, s = _score_and_filter(df, sub, True)
        else:
            s = F.lit(_leaf_boost(sub))
        m = _matched(sub)
        return (f"{label}:{skind}", m, F.when(m, s).otherwise(F.lit(0.0)))

    parts: list[tuple] = []

    def _emit_bool(prefix: str, bbody: dict, scored: bool) -> None:
        """One row per clause at every bool depth, with dotted path
        labels (``must[1].should[0]:match``) — a Kibana-sized nested
        query explains fully. Invariants: the depth-1 scoring rows
        sum to the total, and a nested bool's own row equals the sum
        of ITS scoring children (its sub-decomposition). Inside
        filter/must_not context ``scored`` is False: every descendant
        reports matched-status with value 0.0 (they gate, never
        score). A sub-clause that is not a single-key dict is a
        plan-time error — silently skipping one would let the clause
        rows disagree with the total."""
        for key in ("must", "should", "filter", "must_not"):
            for i, sub in enumerate(_as_list(bbody.get(key))):
                if not isinstance(sub, dict) or len(sub) != 1:
                    raise ValueError(
                        f"_explain: bool {prefix}{key}[{i}] must be a "
                        f"single-clause dict: {sub!r}"
                    )
                label = f"{prefix}{key}[{i}]"
                skind = next(iter(sub))
                child_scored = scored and key in ("must", "should")
                if child_scored:
                    parts.append(_scoring_part(label, sub))
                else:
                    m = _matched(sub)
                    ok = ~m if key == "must_not" else m
                    parts.append((f"{label}:{skind}", ok, F.lit(0.0)))
                if skind == "bool":
                    _emit_bool(label + ".", sub["bool"], child_scored)

    if kind == "bool":
        _emit_bool("", qbody, True)
    else:
        parts.append(_scoring_part("query", query))

    # the total row runs the REAL search scoring path — the declared
    # contract is: explain total == the _score _search would rank by
    _, total_score = _score_and_filter(df, query, True)
    overall = _matched(query)
    if kind == "function_score" and qbody.get("min_score") is not None:
        # min_score EXCLUDES low-scoring docs from the match set
        overall = overall & (
            total_score >= F.lit(float(qbody["min_score"]))
        )
    parts.append((
        "total",
        overall,
        F.when(overall, total_score).otherwise(F.lit(0.0)),
    ))

    entries = F.array(*[
        F.struct(
            F.lit(label).alias("clause"),
            m.cast("boolean").alias("matched"),
            v.cast("double").alias("value"),
        )
        for label, m, v in parts
    ])
    one = df.filter(F.col(idc) == F.lit(doc_id))
    return (
        one.select(F.col(idc).alias("doc_id"), F.explode(entries).alias("e"))
        .select("doc_id", "e.clause", "e.matched", "e.value")
    )


def run_mget(
    df: DataFrame, body: dict, *, id_field: str | None = None
) -> DataFrame:
    """ES ``_mget``: fetch documents by id list — one result row per
    REQUESTED id, in REQUEST order, with a ``found`` flag (a missing
    id still yields its row, ``found = false`` and NULL source
    columns, exactly like ES). Accepts ``{"ids": [..]}`` or the
    ``{"docs": [{"_id": ..}, ..]}`` long form; ``_source`` narrows
    the returned columns.

    Scale shape: the id list pushes to the scan as an IN predicate
    (PushedFilters: In), the bounded hit set broadcasts back onto the
    request frame — the corpus never shuffles and the join build side
    is at most len(ids) rows."""
    from pyspark.sql import functions as F

    from .querydsl import _identity_col, _source_columns

    ids = body.get("ids")
    if ids is None and "docs" in body:
        try:
            ids = [d["_id"] for d in body["docs"]]
        except (TypeError, KeyError):
            raise ValueError(
                f"_mget docs entries need _id: {body['docs']}"
            ) from None
    if not ids:
        raise ValueError(f"_mget needs ids or docs: {body}")
    idc = id_field or _identity_col(df)
    if idc not in df.columns:
        raise ValueError(f"_mget: no identity column {idc!r}")
    hits = df.filter(F.col(idc).isin(list(ids)))
    if "_source" in body:
        keep = _source_columns(
            [c for c in df.columns if c != idc], body["_source"]
        )
        hits = hits.select(idc, *keep)
    req = df.sparkSession.createDataFrame(
        [(i + 1, v) for i, v in enumerate(ids)], ["pos", "__req_id"]
    )
    out = req.join(
        F.broadcast(hits), req["__req_id"] == hits[idc], "left"
    )
    src_cols = [c for c in hits.columns if c != idc]
    return (
        out.select(
            F.col("pos").cast("long").alias("pos"),
            F.col("__req_id").alias(idc),
            F.col(idc).isNotNull().alias("found"),
            *src_cols,
        )
        .orderBy("pos")
    )
