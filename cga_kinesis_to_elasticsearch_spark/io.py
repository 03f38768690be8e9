"""Table loading for the driver-generated testdata (TESTDATA.md).

The driver's parquet files carry INT64 TIMESTAMP(NANOS) columns, which
Spark refuses outright ([PARQUET_TYPE_ILLEGAL]). We flip the legacy
``nanosAsLong`` conf and rebuild proper TimestampType columns
(truncating to micros — the same truncation DuckDB applies when casting
TIMESTAMP_NS to its micros-native TIMESTAMP, so both engines agree).

Nanos columns are detected from the parquet footer via pyarrow — a
metadata-only read, no data scanned.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import TimestampType

__all__ = [
    "load_table",
    "TABLES",
    "register_immutable_root",
    "invalidate_cached_tables",
]

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _nanos_columns(path: str) -> tuple[str, ...]:
    import pyarrow.parquet as pq
    import pyarrow as pa
    from pathlib import Path

    p = Path(path)
    if p.is_dir():
        # Spark-written table: a directory of part files with one
        # shared schema — probe the first part's footer (the driver
        # testdata is flat single files; directory layouts come from
        # the scale-sweep generator, scripts/gen_scale_data.py)
        part = next(
            (q for q in sorted(p.rglob("*.parquet")) if q.is_file()), None
        )
        if part is None:
            return ()
        p = part
    schema = pq.read_schema(p)
    out = []
    for field in schema:
        t = field.type
        if pa.types.is_timestamp(t) and t.unit == "ns":
            out.append(field.name)
    return tuple(out)


# footer-schema memo, gated like _DF_CACHE: only immutable roots may
# cache (a rewritten mutable file could change its footer schema)
_nanos_columns_cached = lru_cache(maxsize=256)(_nanos_columns)


# Resolved-DataFrame cache: DataSource resolution (file listing +
# footer schema inference) costs ~100 ms of driver time PER
# spark.read.parquet call, and every declared query re-loads its
# tables — across a 47-query bench that is tens of seconds of pure
# plan-time overhead. The testdata is immutable and DataFrames are
# immutable logical plans, so the resolved frame is reusable; keyed by
# applicationId so a new session never sees a stale plan. (On a real
# cluster this is the role of catalog tables — resolve once, reference
# everywhere.)
#
# The memoized frame is a FROZEN file listing — a rewrite/append to a
# cached path inside the same application would serve stale reads or
# missing-file task failures. The cache therefore only engages for
# paths a caller has declared immutable (the testdata roots, by
# default), and ``invalidate_cached_tables`` exists for anything else.
_DF_CACHE: dict[tuple[str, str], DataFrame] = {}

# Path prefixes treated as immutable for the lifetime of the process.
# Mutating writers (sinks/upsert.py, forget.py, compact.py) operate on
# their own roots, which are never under these prefixes.
_IMMUTABLE_PREFIXES: list[str] = ["/root/testdata/"]


def register_immutable_root(prefix: str) -> None:
    """Opt a directory tree into resolved-frame caching. Only do this
    for data that is never rewritten within one Spark application."""
    if prefix and prefix not in _IMMUTABLE_PREFIXES:
        _IMMUTABLE_PREFIXES.append(prefix)


def invalidate_cached_tables(path_prefix: str = "") -> int:
    """Drop cached resolved frames whose path starts with
    ``path_prefix`` (all of them by default). Returns the number of
    entries dropped — call after mutating a cached path in-place."""
    hits = [k for k in _DF_CACHE if k[1].startswith(path_prefix)]
    for k in hits:
        del _DF_CACHE[k]
    return len(hits)


def _cacheable(path: str) -> bool:
    return any(path.startswith(p) for p in _IMMUTABLE_PREFIXES)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read ``<sf_dir>/<name>.parquet`` with timestamp normalization.

    All timestamp columns surface as TimestampType (UTC instants):
    nanos columns are repaired via the legacy long path; naive micros
    columns are kept out of TIMESTAMP_NTZ (the oracle treats them as
    UTC, and epoch functions reject NTZ) by disabling NTZ inference —
    with a cast fallback should the conf ever become static.
    """
    path = f"{sf_dir}/{name}.parquet"
    cacheable = _cacheable(path)
    nanos = (
        _nanos_columns_cached(path) if cacheable else _nanos_columns(path)
    )
    if nanos:
        # conf consulted at execution too — set it even on a cache hit
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    key = (spark.sparkContext.applicationId, path)
    if cacheable:
        cached = _DF_CACHE.get(key)
        if cached is not None:
            return cached
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass
    df = spark.read.parquet(path)
    for c in nanos:
        # integer `div`, NOT `/`: float division of int64 nanos loses
        # precision above 2^53 and rounds some values up a microsecond
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    for field in df.schema.fields:
        if field.dataType.typeName() == "timestamp_ntz":
            # Concrete TimestampType(), NOT the "timestamp" string alias:
            # under spark.sql.timestampType=TIMESTAMP_NTZ the alias maps
            # back to NTZ and the cast becomes a no-op.
            df = df.withColumn(
                field.name, F.col(field.name).cast(TimestampType())
            )
    if cacheable:
        _DF_CACHE[key] = df
    return df
