"""Pluggable ES-bulk sink (Spark 4 Python DataSource API) — the write
side of SURVEY §2.5 K1 beyond the foreachBatch stand-in, the way
sources/kinesis_sim.py is the read side beyond the file stand-in.

The reference indexes via a BulkProcessor: actions accumulate and
flush as ``{"index": {"_index": ..., "_id": ...}}\\n{source}`` bulk
bodies (main.go:189; the es-hadoop production option map lives in
config.es_sink_options). This module reproduces the SINK CONTRACT as
a registered `format("es_bulk_sim")` with the DataSource V2 commit
protocol, writing bulk-body NDJSON into a directory that stands in
for the cluster:

- **task isolation**: each task writes to ``root/_tmp/<uuid>.ndjson``;
  nothing under ``root/bulk/`` is visible until the DRIVER commits —
  a failed/speculated task leaves only unreferenced tmp files
  (cleaned on the next commit), never partial output. This is the
  exactly-once-per-job batch contract es-hadoop itself cannot give
  (it indexes as tasks run); the simulated sink demonstrates the
  stronger protocol Spark's writer API provides.
- **batch commit**: tmp files move to ``root/bulk/`` and a
  ``_SUCCESS.json`` manifest records (files, doc count, per-run id);
  ``mode("overwrite")`` clears previous bulk output atomically at
  commit time, not at write time.
- **streaming commit**: each micro-batch's files land in
  ``root/bulk/epoch=<batchId>/`` and the epoch manifest is written
  LAST (``root/_commits/<batchId>.json``). An at-least-once REPLAY of
  a batch id clears and rewrites its own epoch directory before
  moving files in, so replays are idempotent at epoch granularity —
  the same first-writer-wins discipline as sinks/dedupindex.py.
- **action shape**: the id column (``es.mapping.id``, default doc_id)
  and index column (``index_col``, default es_index) become bulk
  metadata; every other column serializes into the ``_source`` JSON
  with sorted keys (deterministic bytes for replay comparison).

Scale: one NDJSON stream per task — the exact per-partition batching
the reference's 6 sink workers approximate; doc bytes never pass
through the driver (commit messages carry file NAMES + counts only).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass
from typing import Iterator, List, Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

__all__ = [
    "ESBulkSimDataSource",
    "write_es_bulk",
    "write_es_bulk_stream",
    "read_bulk_actions",
]


def _register_by_value() -> None:
    """Ship by value: the Python data-source worker is a bare
    interpreter that may not have the engine package on its path (see
    sources/kinesis_sim.py — same constraint, same fix). Everything
    reachable below is stdlib or pyspark."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])


@dataclass
class _Msg(WriterCommitMessage):
    tmp_name: str
    n_docs: int


def _serialize(row, id_col: str, index_col: str) -> str:
    d = row.asDict(recursive=True)
    doc_id = d.pop(id_col, None)
    index = d.pop(index_col, None)
    meta = {"index": {"_index": str(index), "_id": str(doc_id)}}
    # sorted keys + default=str: deterministic bytes across replays
    return (
        json.dumps(meta, sort_keys=True)
        + "\n"
        + json.dumps(d, sort_keys=True, default=str)
    )


class _TaskWriter:
    """Shared task-side write: spill the partition's bulk actions to
    ONE tmp NDJSON file and report (name, count) to the driver."""

    def __init__(self, options: dict) -> None:
        self._root = options["path"]
        self._id_col = options.get("es.mapping.id", "doc_id")
        self._index_col = options.get("index_col", "es_index")

    def write(self, iterator: Iterator) -> _Msg:
        os.makedirs(os.path.join(self._root, "_tmp"), exist_ok=True)
        name = f"{uuid.uuid4().hex}.ndjson"
        tmp = os.path.join(self._root, "_tmp", name)
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(_serialize(row, self._id_col, self._index_col))
                f.write("\n")
                n += 1
        return _Msg(tmp_name=name, n_docs=n)


def _publish(root: str, dest: str, messages: List[Optional[_Msg]]) -> dict:
    """Move committed tmp files into ``dest`` and return the manifest
    dict. Unreferenced tmp files (from failed/speculated tasks or a
    crashed previous job) are swept."""
    os.makedirs(dest, exist_ok=True)
    committed = {m.tmp_name for m in messages if m is not None}
    files, total = [], 0
    for m in messages:
        if m is None:
            continue
        src = os.path.join(root, "_tmp", m.tmp_name)
        os.replace(src, os.path.join(dest, m.tmp_name))
        files.append(m.tmp_name)
        total += m.n_docs
    tmp_dir = os.path.join(root, "_tmp")
    if os.path.isdir(tmp_dir):
        for leftover in os.listdir(tmp_dir):
            if leftover not in committed:
                os.unlink(os.path.join(tmp_dir, leftover))
    return {"files": sorted(files), "n_docs": total}


class _BatchWriter(_TaskWriter, DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool) -> None:
        _TaskWriter.__init__(self, options)
        self._overwrite = overwrite

    def commit(self, messages: List[Optional[_Msg]]) -> None:
        bulk = os.path.join(self._root, "bulk")
        if self._overwrite and os.path.isdir(bulk):
            shutil.rmtree(bulk)
        manifest = _publish(self._root, bulk, messages)
        with open(os.path.join(self._root, "_SUCCESS.json"), "w") as f:
            json.dump(manifest, f, sort_keys=True)

    def abort(self, messages: List[Optional[_Msg]]) -> None:
        for m in messages:
            if m is None:
                continue
            p = os.path.join(self._root, "_tmp", m.tmp_name)
            if os.path.exists(p):
                os.unlink(p)


class _StreamWriter(_TaskWriter, DataSourceStreamWriter):
    def commit(self, messages: List[Optional[_Msg]], batchId: int) -> None:
        epoch = os.path.join(self._root, "bulk", f"epoch={int(batchId)}")
        # at-least-once replay rewrites its OWN epoch dir: idempotent
        if os.path.isdir(epoch):
            shutil.rmtree(epoch)
        manifest = _publish(self._root, epoch, messages)
        commits = os.path.join(self._root, "_commits")
        os.makedirs(commits, exist_ok=True)
        # manifest LAST: a crash between publish and manifest leaves an
        # uncommitted epoch dir that the replay clears above
        with open(os.path.join(commits, f"{int(batchId)}.json"), "w") as f:
            json.dump(manifest, f, sort_keys=True)

    def abort(self, messages: List[Optional[_Msg]], batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            p = os.path.join(self._root, "_tmp", m.tmp_name)
            if os.path.exists(p):
                os.unlink(p)


def _check_meta_columns(schema, options: dict) -> None:
    """Fail at PLAN time when the configured id/index columns are
    absent: otherwise every bulk action would silently carry
    ``{"_index": "None", "_id": "None"}`` metadata."""
    id_col = options.get("es.mapping.id", "doc_id")
    index_col = options.get("index_col", "es_index")
    names = set(schema.fieldNames())
    for role, col in (("es.mapping.id", id_col), ("index_col", index_col)):
        if col not in names:
            raise ValueError(
                f"es_bulk_sim: {role} column {col!r} not in the "
                f"DataFrame schema {sorted(names)}"
            )


class ESBulkSimDataSource(DataSource):
    """`format("es_bulk_sim")`: batch + streaming ES-bulk-body sink
    with the DataSource V2 commit protocol (see module docstring)."""

    @classmethod
    def name(cls) -> str:
        return "es_bulk_sim"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        opts = {k if k.startswith("es.") else k.lower(): v
                for k, v in self.options.items()}
        _check_meta_columns(schema, opts)
        return _BatchWriter(opts, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:
        opts = {k if k.startswith("es.") else k.lower(): v
                for k, v in self.options.items()}
        _check_meta_columns(schema, opts)
        return _StreamWriter(opts)


def write_es_bulk(df, root: str, mode: str = "append", **options) -> None:
    """Register the sink and write a batch DataFrame as bulk bodies."""
    _register_by_value()
    df.sparkSession.dataSource.register(ESBulkSimDataSource)
    w = df.write.format("es_bulk_sim").option("path", root)
    for k, v in options.items():
        w = w.option(k, v)
    w.mode(mode).save()


def write_es_bulk_stream(df, root: str, checkpoint: str, **options):
    """Open a streaming write (caller triggers/drains); replay-safe at
    epoch granularity."""
    _register_by_value()
    df.sparkSession.dataSource.register(ESBulkSimDataSource)
    w = (
        df.writeStream.format("es_bulk_sim")
        .option("path", root)
        .option("checkpointLocation", checkpoint)
    )
    for k, v in options.items():
        w = w.option(k, v)
    return w


def read_bulk_actions(root: str) -> list[tuple[dict, dict]]:
    """Test/inspection helper: parse every COMMITTED bulk body under
    ``root`` into (meta, source) pairs — batch output plus committed
    epochs only (an epoch directory without its manifest is invisible,
    exactly as an uncommitted ES bulk would be)."""
    out: list[tuple[dict, dict]] = []
    bulk = os.path.join(root, "bulk")
    if not os.path.isdir(bulk):
        return out

    def _load(d: str) -> None:
        for name in sorted(os.listdir(d)):
            if not name.endswith(".ndjson"):
                continue
            with open(os.path.join(d, name)) as f:
                lines = [ln for ln in f.read().splitlines() if ln]
            for meta, src in zip(lines[::2], lines[1::2]):
                out.append((json.loads(meta), json.loads(src)))

    batch_success = os.path.exists(os.path.join(root, "_SUCCESS.json"))
    for entry in sorted(os.listdir(bulk)):
        p = os.path.join(bulk, entry)
        if entry.startswith("epoch="):
            bid = entry.split("=", 1)[1]
            if os.path.exists(
                os.path.join(root, "_commits", f"{bid}.json")
            ):
                _load(p)
        elif batch_success and entry.endswith(".ndjson"):
            for meta, src in _pairs(p):
                out.append((meta, src))
    return out


def _pairs(path: str):
    with open(path) as f:
        lines = [ln for ln in f.read().splitlines() if ln]
    return zip(
        (json.loads(x) for x in lines[::2]),
        (json.loads(x) for x in lines[1::2]),
    )
