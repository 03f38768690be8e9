"""SparkSession factory tuned for this engine.

Mirrors the env-var configuration surface of the reference's ``main()``
(/root/reference/main.go:537-569) where it still makes sense on Spark;
cluster-sizing knobs replace the reference's single-process model.
"""

from __future__ import annotations

import hashlib
import io
import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

__all__ = ["get_spark", "tune_session", "ship_package"]


def get_spark(
    app_name: str = "cga-kinesis-to-elasticsearch-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    local[$SPARK_GRAFT_CPUS] in this environment; on a real cluster the
    master/conf come from spark-submit and the builder settings merge.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions else 32),
        )
        # STATIC conf, applied only when this factory launches the JVM
        # (getOrCreate on an existing session ignores it). The Spark
        # default is 1g — ~30 MB of heap per concurrent task on
        # local[32], which GC-thrashes and can fail wide in-row
        # aggregations on 10x-scale data (guide §5: size memory to the
        # concurrent tasks, not the default). Env-overridable so a
        # smaller host can turn it down.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
    )
    for k, v in _engine_conf().items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    tune_session(spark)
    return spark


def _engine_conf() -> dict[str, str]:
    return {
        # AQE: runtime partition coalescing + skew-join splitting — the
        # scale path for 100 TB (skewed route/app keys, §2.7).
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Dimension tables (cf_apps/spaces/orgs analogues) are small;
        # broadcast aggressively (replaces the reference's per-record
        # lookup cache, caching_lazyfill.go:87-127).
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # Arrow for the few pandas-UDF operators (multimodal decode).
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        # The testdata's naive (micros, no-tz) parquet timestamps must
        # surface as TimestampType, not TIMESTAMP_NTZ: the DuckDB oracle
        # treats them as UTC instants, and epoch functions (unix_millis)
        # reject NTZ outright.
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
        # A host session may run with timestampType=TIMESTAMP_NTZ, which
        # silently remaps the "timestamp" type alias (and timestamp
        # literals) to NTZ — epoch functions then fail at analysis.
        # Pin the alias back to instants; runtime-settable.
        "spark.sql.timestampType": "TIMESTAMP_LTZ",
        # Subset co-partitioning for joins (SPARK-35703): a join may
        # accept inputs clustered on a SUBSET of the join keys instead
        # of re-shuffling both sides on all of them (equal subset keys
        # still co-locate all equal full keys, so results are
        # unchanged; this only removes redundant exchanges). Set
        # SESSION-WIDE because the spanindex membership join relies on
        # it and a per-action set/unset toggle would race the engine's
        # concurrent-job submissions (scroll slices, bucketed layout
        # writes, heavy-hitter halves) — a thread planning a query
        # between the set and the unset would see the wrong value.
        "spark.sql.requireAllClusterKeysForCoPartition": "false",
    }


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an existing session.

    Used inside declared queries: the correctness driver owns the
    session, so we only touch confs that are settable at runtime.
    UTC matters because the DuckDB oracle reads parquet timestamps as
    naive UTC.
    """
    for k, v in _engine_conf().items():
        try:
            spark.conf.set(k, v)
        except Exception:  # static conf on this session — keep going
            pass
    ship_package(spark)
    return spark


_SHIPPED: set[str] = set()


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers via
    ``addPyFile`` — required for any pandas-UDF/mapInPandas operator
    whose closure references package code, when the session was created
    by a driver that has the repo on ``sys.path`` but not on
    ``PYTHONPATH`` (executors inherit only the latter)."""
    sc = spark.sparkContext
    if sc.applicationId in _SHIPPED:
        return
    pkg_dir = Path(__file__).resolve().parent
    zip_name = f"{pkg_dir.name}.zip"
    if zip_name in {Path(p).name for p in getattr(sc, "_python_includes", [])}:
        _SHIPPED.add(sc.applicationId)
        return
    # Deterministic bytes (fixed mtime, sorted entries): repeated adds of
    # the "same" zip must be byte-identical or Spark's file server rejects
    # them as a conflicting update.
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(pkg_dir.rglob("*.py")):
            info = zipfile.ZipInfo(
                f"{pkg_dir.name}/{py.relative_to(pkg_dir)}", (1980, 1, 1, 0, 0, 0)
            )
            zf.writestr(info, py.read_bytes())
    payload = buf.getvalue()
    # Stable content-addressed path, kept alive for the session: Spark's
    # file server serves the source path lazily at task-fetch time, so it
    # must outlive this call.
    digest = hashlib.md5(payload).hexdigest()[:12]
    staging = Path(tempfile.gettempdir()) / f"cga-spark-pkg-{digest}"
    staging.mkdir(exist_ok=True)
    zip_path = staging / zip_name
    if not zip_path.exists():
        zip_path.write_bytes(payload)
    sc.addPyFile(str(zip_path))
    _SHIPPED.add(sc.applicationId)
