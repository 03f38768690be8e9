"""Index aliases over the lake: ES's ``_aliases`` API re-expressed —
an alias names one or more index tables (parquet paths or frames),
each optionally behind a FILTER query, and reads through the alias see
the filtered union. This is how ops teams point ``logs-current`` at
rotating daily indices and how filtered aliases scope one tenant's
view of a shared index (reference context: the day-rotated gorouter-*
indices of main.go:400 are exactly what an alias would front).

The registry is a plain dict — ``{alias: [{"path": p | "df": frame
[, "filter": query-DSL]}, ...]}`` — optionally persisted as JSON
beside the lake (paths only) so every engine sees one alias truth.

Scale shape: resolution is plan-time; the result is a UNION of
filtered scans, so each member's filter pushes into ITS scan and
partition pruning applies per member. An alias is never a copy.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "resolve_alias",
    "save_aliases",
    "load_aliases",
    "cat_aliases",
]


def _member_frame(spark: SparkSession, member: dict) -> DataFrame:
    from .querydsl import apply_query

    if "df" in member:
        frame = member["df"]
    elif "path" in member:
        frame = spark.read.parquet(member["path"])
    else:
        raise ValueError(f"alias member needs df or path: {member}")
    if member.get("filter"):
        frame = apply_query(frame, member["filter"])
    return frame


def resolve_alias(
    spark: SparkSession, registry: dict, alias: str
) -> DataFrame:
    """The alias's readable frame: the UNION (by name) of its members,
    each with its filter applied — what an ES read through the alias
    sees. Unknown aliases fail loud, like ES's 404."""
    members = registry.get(alias)
    if not members:
        raise ValueError(f"unknown alias {alias!r}")
    out = None
    for m in members:
        part = _member_frame(spark, m)
        out = part if out is None else out.unionByName(
            part, allowMissingColumns=True
        )
    return out


def save_aliases(registry: dict, path: str) -> None:
    """Persist a PATH-only registry as JSON (frames can't persist)."""
    for alias, members in registry.items():
        for m in members:
            if "path" not in m:
                raise ValueError(
                    f"save_aliases: alias {alias!r} has a frame "
                    "member — only path members persist"
                )
    Path(path).write_text(json.dumps(registry, indent=2, sort_keys=True))


def load_aliases(path: str) -> dict:
    return json.loads(Path(path).read_text())


def cat_aliases(spark: SparkSession, registry: dict) -> DataFrame:
    """``_cat/aliases``: one row per (alias, member) with whether the
    member carries a filter — the ops listing."""
    rows = [
        (alias, m.get("path", "<frame>"), bool(m.get("filter")))
        for alias, members in sorted(registry.items())
        for m in members
    ]
    if not rows:
        raise ValueError("cat_aliases: empty registry")
    return spark.createDataFrame(
        rows, "alias string, target string, filtered boolean"
    )
