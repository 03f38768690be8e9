"""Declared queries: the engine's public query surface, one entry per
SURVEY §2 operator + north-star extension, each with a DuckDB oracle.

Module registration is fail-safe but LOUD: if one plans module cannot
import in some host environment, its queries are lost and a warning is
printed, but every other module's queries still register — one bad
import must not vaporize the whole correctness surface. Local tests
pin the full registry size, so a silently-skipped module cannot pass
CI."""

import sys as _sys

from .declared import QUERY_REGISTRY, oracle_sql, queries

_MODULES = (
    "northstar",
    "streaming_query",
    "tpch_extra",
    "sql_extras",
    "protobuf",
    "textpii",
    "quantized",
    "components_query",
    "corpus",
    "webmix",
    "eventanalytics",
    "sketches_query",
    "formats",
    "timeseries",
    "mediahash",
    "searchindex",
    "loganalytics",
    "versioning",
    "geo",
    "privacy",
    "hierarchy_query",
    "esstats",
    "pipelineaggs",
    "esaggstail",
    "esaggstail2",
    "esaggstail3",
    "dpp",
    "weaklabel_query",
    "lateinteraction",
    "esrelations",
    "essearch",
    "essearch2",
    "essearch3",
    "esql2",
    "esql3",
    "traindata",
    "evalqa",
    "mlprims",
)

IMPORT_ERRORS: dict[str, str] = {}

for _name in _MODULES:
    try:  # noqa: SIM105 - collect, don't mask
        __import__(f"{__name__}.{_name}")
    except Exception as _exc:  # pragma: no cover - env-dependent
        IMPORT_ERRORS[_name] = f"{type(_exc).__name__}: {_exc}"
        print(
            f"WARNING: plans.{_name} failed to import; its queries are "
            f"unavailable: {IMPORT_ERRORS[_name]}",
            file=_sys.stderr,
        )

__all__ = ["QUERY_REGISTRY", "queries", "oracle_sql", "IMPORT_ERRORS"]
