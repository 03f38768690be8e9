"""Kinesis-simulating pluggable streaming source (Spark 4 Python
DataSource API) — SURVEY §2.1 S1/S2 beyond the file stand-in.

The reference consumes AWS Kinesis: per-shard ordered records addressed
by sequence number, resumable from a checkpointed position
(consumer.go:171-232). ``read_raw_record_stream`` reproduces the
DATA surface with a file source; this module reproduces the SOURCE
CONTRACT itself — a pluggable `readStream.format("kinesis_sim")` with

- real offset semantics: the offset is ``{shard_id: next_seq}``,
  written to Spark's offset/commit log exactly like the real
  connector's sequence-number checkpoints (S2 — restart resumes from
  the committed position, never re-serving committed records);
- per-shard ordering (T3): each micro-batch plans ONE input partition
  per shard, and records within a partition stream in sequence order;
- shard discovery: a shard directory that appears between batches is
  picked up at the next ``latestOffset`` and consumed from 0
  (resharding-lite — Kinesis child shards start at TRIM_HORIZON);
- backpressure (T5): ``maxRecordsPerBatch`` caps how far the offset
  may advance per shard per batch (like the connector's fetch
  limits). After a restart the first batch is uncapped — the cap
  throttles steady-state admission, not recovery.

The emitted rows are exactly ``RAW_RECORD_SCHEMA`` (shard_id,
sequence_number, partition_key, arrival_ts, data), so the whole
downstream plan (decode → route → grok → enrich → sink) is byte-for-
byte the one production runs; swapping in the real connector changes
only the format string and options (config.kinesis_source_options).

Stream layout on disk: ``root/<shard_id>/<first-seq>.<k>.jsonl``, each
line ``{"seq": int, "pk": str, "ts_ms": int, "data": <base64>}``; files
sort lexicographically by the seq of their first record and records
ascend by ``seq`` within a file (writer contract — this is what lets
planning tail-read files instead of scanning history). Appends must be
seq-monotone per shard, like the real stream (Kinesis sequence numbers
are unique and increasing); re-appending an already-written seq never
destroys data (filenames are never reused) but stores a duplicate the
reader would re-serve.
"""

from __future__ import annotations

import base64
import json
import os
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


def _register_by_value() -> None:
    """Ship this module BY VALUE inside the pickled DataSource: the
    Python data-source planning worker is a bare interpreter that may
    not have the engine package on its path (it ignores addPyFile
    includes in local mode), so by-reference pickling would crash
    stream planning with ModuleNotFoundError whenever the driver runs
    outside the repo root. Everything reachable from the classes below
    is stdlib or pyspark (always importable), so by-value is safe."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])


# applied lazily at registration (module import order: the module must
# exist in sys.modules before it can register itself)

__all__ = [
    "KinesisSimDataSource",
    "read_kinesis_sim_stream",
    "write_kinesis_sim_fixture",
]

from .records import RAW_RECORD_SCHEMA

#: Kinesis sequence numbers are decimal strings; zero-padding keeps
#: lexicographic order == numeric order (per-shard ordering tests).
_SEQ_WIDTH = 20


def _fmt_seq(seq: int) -> str:
    return f"{seq:0{_SEQ_WIDTH}d}"


def _shard_dirs(root: str) -> list[str]:
    try:
        return sorted(
            d
            for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
        )
    except FileNotFoundError:
        return []


def _last_seq_of_file(path: str) -> int | None:
    """seq of the last complete line, via a tail read (O(line), not
    O(file) — lines within a file ascend by writer contract)."""
    with open(path, "rb") as fh:
        fh.seek(0, os.SEEK_END)
        size = fh.tell()
        step, data = 4096, b""
        while size > 0:
            take = min(step, size)
            fh.seek(size - take)
            data = fh.read(take) + data
            size -= take
            lines = [ln for ln in data.split(b"\n") if ln.strip()]
            # lines[-1] is complete once a line boundary precedes it
            # (>= 2 lines seen) or the whole file is in the buffer
            if lines and (len(lines) >= 2 or size == 0):
                return json.loads(lines[-1])["seq"]
            step *= 2
    return None


def _shard_latest(root: str, shard: str) -> int:
    """next_seq for a shard = 1 + max seq present (0 if empty).

    Called once per shard per trigger: cost is one TAIL read per file
    (writer contract: seqs ascend within a file), never a scan of the
    stream history — per-trigger planning stays O(#files), not
    O(#records)."""
    latest = 0
    sdir = os.path.join(root, shard)
    for fname in sorted(os.listdir(sdir)):
        if not fname.endswith(".jsonl"):
            continue
        seq = _last_seq_of_file(os.path.join(sdir, fname))
        if seq is not None and seq + 1 > latest:
            latest = seq + 1
    return latest


@dataclass
class _ShardSlice(InputPartition):
    root: str
    shard: str
    start: int
    end: int


class _StreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("kinesis_sim requires option 'path'")
        self._root = path
        mx = options.get("maxrecordsperbatch")
        self._max = int(mx) if mx else None
        self._last: dict[str, int] | None = None

    # -- offsets ------------------------------------------------------
    def initialOffset(self) -> dict:
        # TRIM_HORIZON: every currently-known shard from 0
        return {shard: 0 for shard in _shard_dirs(self._root)}

    def latestOffset(self) -> dict:
        """The admission cap is steady-state only: the engine may call
        latestOffset BEFORE initialOffset and never tells this side the
        committed start, so the first answer of a (re)started query is
        the true latest (recovery drains the backlog), and every later
        answer advances at most ``max`` per shard. Offsets returned
        here are monotone — going backward would make the engine
        re-plan served ranges (duplicate delivery)."""
        true_latest = {
            shard: _shard_latest(self._root, shard)
            for shard in _shard_dirs(self._root)
        }
        if self._max is not None and self._last is not None:
            capped = {}
            for shard, hi in true_latest.items():
                lo = self._last.get(shard, 0)
                # min() throttles growth; max() keeps monotonicity even
                # if stream files were pruned out from under us
                capped[shard] = max(lo, min(hi, lo + self._max))
            true_latest = capped
        self._last = dict(true_latest)
        return true_latest

    # -- planning / reading -------------------------------------------
    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        out = []
        for shard, hi in sorted(end.items()):
            lo = int(start.get(shard, 0))
            if int(hi) > lo:
                out.append(_ShardSlice(self._root, shard, lo, int(hi)))
        # Spark requires >= 1 partition per batch; an empty batch
        # still plans one empty slice
        return out or [_ShardSlice(self._root, "", 0, 0)]

    def read(self, partition: _ShardSlice) -> Iterator[tuple]:
        if not partition.shard:
            return
        sdir = os.path.join(partition.root, partition.shard)
        for fname in sorted(os.listdir(sdir)):
            if not fname.endswith(".jsonl"):
                continue
            # filenames encode their first seq (writer contract):
            # a file starting at/after the window end has nothing
            try:
                if int(fname.split(".")[0]) >= partition.end:
                    continue
            except ValueError:
                pass  # foreign filename: parse it fully
            with open(os.path.join(sdir, fname), "rb") as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    rec = json.loads(line)
                    seq = rec["seq"]
                    if partition.start <= seq < partition.end:
                        yield (
                            partition.shard,
                            # Kinesis sequence numbers are opaque
                            # strings; the int is the offset index
                            rec.get("sn") or _fmt_seq(seq),
                            rec.get("pk", ""),
                            datetime.fromtimestamp(
                                rec["ts_ms"] / 1000.0, tz=timezone.utc
                            ),
                            base64.b64decode(rec["data"]),
                        )

    def commit(self, end: dict) -> None:
        pass  # the log is retained (Kinesis trims by age, not commit)


class _BatchReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self._inner = _StreamReader(options)

    def partitions(self) -> Sequence[InputPartition]:
        root = self._inner._root
        end = {s: _shard_latest(root, s) for s in _shard_dirs(root)}
        return self._inner.partitions({}, end)

    def read(self, partition: _ShardSlice) -> Iterator[tuple]:
        return self._inner.read(partition)


class KinesisSimDataSource(DataSource):
    """`format("kinesis_sim")`: batch + streaming reads of a simulated
    Kinesis stream directory (see module docstring)."""

    @classmethod
    def name(cls) -> str:
        return "kinesis_sim"

    def schema(self):
        return RAW_RECORD_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _BatchReader({k.lower(): v for k, v in self.options.items()})

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _StreamReader(
            {k.lower(): v for k, v in self.options.items()}
        )


def read_kinesis_sim_stream(
    spark, path: str, max_records_per_batch: int | None = None
):
    """Register the source and open the stream — the drop-in upgrade
    of records.read_raw_record_stream with true offset/commit
    semantics."""
    _register_by_value()
    spark.dataSource.register(KinesisSimDataSource)
    reader = spark.readStream.format("kinesis_sim").option("path", path)
    if max_records_per_batch is not None:
        reader = reader.option(
            "maxRecordsPerBatch", str(max_records_per_batch)
        )
    return reader.load()


def write_kinesis_sim_fixture(
    rows: list[tuple], root: str, records_per_file: int = 5
) -> None:
    """Test/fixture writer: rows are (shard_id, seq:int, pk, ts_ms:int,
    data:bytes[, sequence_number:str]); appends per-shard jsonl files
    named after the first seq they contain so later appends keep
    lexicographic = seq order. The optional 6th element carries the
    opaque Kinesis sequence-number string (defaults to the zero-padded
    offset int)."""
    by_shard: dict[str, list[tuple]] = {}
    for r in rows:
        by_shard.setdefault(r[0], []).append(r)
    for shard, recs in by_shard.items():
        sdir = os.path.join(root, shard)
        os.makedirs(sdir, exist_ok=True)
        recs.sort(key=lambda r: r[1])
        for i in range(0, len(recs), records_per_file):
            chunk = recs[i : i + records_per_file]
            # never reuse a filename: a re-append whose chunk starts at
            # an already-written seq must not truncate the older file —
            # a numeric suffix disambiguates while keeping the
            # first-seq prefix ordering the reader relies on
            stem = _fmt_seq(chunk[0][1])
            k = 0
            while os.path.exists(os.path.join(sdir, f"{stem}.{k}.jsonl")):
                k += 1
            fname = f"{stem}.{k}.jsonl"
            with open(os.path.join(sdir, fname), "x") as fh:
                for row in chunk:
                    shard_, seq, pk, ts_ms, data = row[:5]
                    line = {
                        "seq": seq,
                        "pk": pk,
                        "ts_ms": ts_ms,
                        "data": base64.b64encode(data).decode(),
                    }
                    if len(row) > 5:
                        line["sn"] = row[5]
                    fh.write(json.dumps(line) + "\n")
