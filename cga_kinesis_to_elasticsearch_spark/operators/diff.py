"""Snapshot diff — added / removed / changed / unchanged between two
versions of a keyed dataset.

Data-versioning bread and butter: exports, CDC reconciliation, and
"what changed since the last crawl" audits all reduce to comparing two
snapshots by primary key. (The reference re-indexes every record
blindly; a diff is what lets an incremental pipeline ship only the
delta — the same motivation as the engine's CDC upsert sink,
``sinks/upsert.py``.)

Scale design: the full rows of either snapshot never shuffle. Each
side is first projected to ``(key..., row_fp)`` where ``row_fp`` is an
md5 over the NULL-tagged compare columns — computed map-side, so the
full-outer join that classifies rows exchanges only keys + one
128-bit fingerprint per row. At 100 TB the join is one co-partitioned
shuffle of ~(key + 16 B) per row; AQE handles skewed keys. Callers
that need the changed PAYLOAD join the changed-key set back to the new
snapshot (semi-join — payload moves only for changed rows).

NULL discipline: compare columns are length-tagged before hashing
(``len:value``) so (NULL, "x") and ("x", NULL) cannot collide with
("x", "x") under plain concatenation; NULL itself tags as a sentinel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["row_fingerprint", "snapshot_diff"]


def row_fingerprint(cols: list[str]) -> Column:
    """md5 over NULL-safe length-tagged column renderings."""
    parts = []
    for c in cols:
        s = F.col(c).cast("string")
        parts.append(
            F.when(s.isNull(), F.lit("\x00N")).otherwise(
                F.concat(F.length(s).cast("string"), F.lit(":"), s)
            )
        )
    return F.md5(F.concat_ws("|", *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """One row per key present in either snapshot, with ``change`` in
    ``('added', 'removed', 'changed', 'unchanged')``.

    Returns ``key_cols + [change]``. Only ``(keys, fingerprint)``
    shuffle — see module docstring.
    """
    o = old.select(*key_cols, row_fingerprint(compare_cols).alias("__old_fp"))
    n = new.select(*key_cols, row_fingerprint(compare_cols).alias("__new_fp"))
    joined = o.join(n, on=key_cols, how="full_outer")
    change = (
        F.when(F.col("__old_fp").isNull(), F.lit("added"))
        .when(F.col("__new_fp").isNull(), F.lit("removed"))
        .when(F.col("__old_fp") == F.col("__new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*key_cols, change.alias("change"))
