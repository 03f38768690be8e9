"""Declared queries: the engine's public query surface, one entry per
SURVEY §2 operator + north-star extension, each with a DuckDB oracle."""

from .declared import QUERY_REGISTRY, oracle_sql, queries
from . import northstar as _northstar  # noqa: F401  (registers queries)
from . import streaming_query as _streaming_query  # noqa: F401
from . import tpch_extra as _tpch_extra  # noqa: F401
from . import sql_extras as _sql_extras  # noqa: F401
from . import protobuf as _protobuf  # noqa: F401
from . import textpii as _textpii  # noqa: F401
from . import quantized as _quantized  # noqa: F401
from . import components_query as _components_query  # noqa: F401
from . import corpus as _corpus  # noqa: F401
from . import webmix as _webmix  # noqa: F401
from . import eventanalytics as _eventanalytics  # noqa: F401
from . import sketches_query as _sketches_query  # noqa: F401
from . import formats as _formats  # noqa: F401

__all__ = ["QUERY_REGISTRY", "queries", "oracle_sql"]
