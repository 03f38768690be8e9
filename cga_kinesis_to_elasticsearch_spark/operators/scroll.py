"""Scroll / point-in-time export: the bulk-export path older ES
clients use (``scroll``) and its modern replacement (PIT +
``search_after``), re-expressed Spark-first.

- :func:`open_pit` pins a POINT-IN-TIME view of a parquet table: the
  file listing is captured once, so pages served later never see
  concurrent appends (ES's PIT contract). On parquet this is exactly
  a frozen file list — Spark's own resolved-relation behavior, made
  explicit and append-proof.
- :func:`run_scroll` walks the full result set of a ``_search`` body
  in fixed-size pages using the engine's ``search_after`` lowering:
  each page is one filtered TakeOrdered scan (the strict-after cursor
  predicate pushes toward the scan, so page 100 costs the same as
  page 1 — the reason ES itself deprecated scroll in favor of
  search_after). The driver holds only one page of rows at a time
  (the cursor), like any ES scroll client.

Reference context: the reference's indices (main.go:447) are exactly
what reindex/export jobs scroll over.

Pages are DISJOINT and EXHAUSTIVE by construction: the sort is pinned
(body ``sort`` + the engine's ``_doc`` tie-break on the document
identity column), and each page resumes strictly after the previous
page's last (sort keys, _doc) tuple — ties at a page boundary can
never duplicate or skip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .querydsl import _source_columns, _tiebreak_names, run_search_body

__all__ = ["open_pit", "run_scroll", "run_scroll_union"]


def open_pit(spark: SparkSession, path: str) -> DataFrame:
    """Pin a point-in-time view of the parquet table at ``path``: the
    CURRENT file listing is captured eagerly and later reads resolve
    only those files, so rows appended after the PIT opens are
    invisible to every page served from it."""
    files = spark.read.parquet(path).inputFiles()
    if not files:
        raise ValueError(f"open_pit: no parquet files under {path!r}")
    # basePath keeps hive-style directory-derived partition columns
    # (e.g. the bulk sink's data/es_index=... layout) in the PIT view —
    # a bare leaf-file read would silently drop them
    return spark.read.option("basePath", path).parquet(*files)


def run_scroll(
    df: DataFrame,
    body: dict,
    page_size: int,
    max_pages: int | None = None,
):
    """Iterate the FULL hit set of ``body`` over ``df`` in
    ``page_size`` pages (ES scroll semantics over the search_after
    lowering). Yields one list of Rows per page.

    The body must carry an explicit non-``_score`` ``sort`` (scroll is
    an export path; score-ordered exports would recompute corpus
    statistics per page) and no ``size``/``search_after``/``from`` of
    its own. Every sort key and the ``_doc`` tie-break column must
    survive ``_source`` so the cursor can be read off the last row."""
    sort = body.get("sort")
    if not sort:
        raise ValueError("run_scroll needs an explicit sort")
    for k in ("size", "search_after", "from"):
        if k in body:
            raise ValueError(f"run_scroll drives {k!r} itself: {body}")
    names = []
    for s in sort:
        field = s if isinstance(s, str) else next(iter(s))
        if field in ("_score", "_script"):
            raise ValueError(
                "run_scroll: score/script sorts are not scrollable "
                "(export paths pin a stable document order)"
            )
        names.append(field)
    if any(f in ("doc_id", "id", "event_id", "vec_id") for f in names):
        # the sort already pins document identity — every cursor tuple
        # is unique without an appended _doc tie-break
        tb = []
    else:
        tb = _tiebreak_names(df, names)
        if len(tb) != 1:
            raise ValueError(
                "run_scroll needs a document identity column "
                "(doc_id / id / event_id / vec_id) for the _doc tie-break"
            )
    if "_source" in body:
        # resolve every supported _source form (list / string /
        # wildcard patterns / includes-excludes dict) exactly the way
        # the search path will, then check the cursor columns survive
        kept = _source_columns(df.columns, body["_source"])
        missing = [c for c in (*names, *tb) if c not in kept]
        if missing:
            raise ValueError(
                f"run_scroll: _source must keep the cursor columns {missing}"
            )
    cursor = None
    pages = 0
    while True:
        b = {**body, "size": int(page_size)}
        if cursor is not None:
            b["search_after"] = cursor
        rows = run_search_body(df, b).collect()
        if not rows:
            return
        yield rows
        pages += 1
        last = rows[-1]
        cursor = [last[f] for f in names] + [last[t] for t in tb]
        if len(rows) < page_size:
            return
        if max_pages is not None and pages >= max_pages:
            return


def run_scroll_union(
    df: DataFrame,
    body: dict,
    page_size: int,
    max_pages: int | None = None,
) -> DataFrame:
    """All scroll pages as ONE DataFrame tagged with a 1-based
    ``page`` ordinal — the declarable/testable reading of the scroll
    contract (pages disjoint, union exhaustive)."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    out = None
    schema = None
    for i, rows in enumerate(run_scroll(df, body, page_size, max_pages),
                             start=1):
        if schema is None:
            probe = run_search_body(df, {**body, "size": 1})
            schema = probe.schema
        page = spark.createDataFrame(rows, schema).select(
            F.lit(i).cast("long").alias("page"), "*"
        )
        out = page if out is None else out.unionByName(page)
    if out is None:
        raise ValueError("run_scroll_union: empty result set")
    return out
