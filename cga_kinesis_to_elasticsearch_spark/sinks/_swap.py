"""Crash-safe partition-directory swap protocol shared by the
incremental maintainers (rollup.py, sketchmaint.py).

Protocol per partition ``<part>`` (e.g. ``day=2024-01-03``) under a
root directory:

1. write the new content to ``.tmp-<part>``;
2. rename ``<part>`` -> ``.old-<part>`` (if it exists);
3. rename ``.tmp-<part>`` -> ``<part>``;
4. remove ``.old-<part>``.

Names are DETERMINISTIC, so a crash at any step leaves a state the
next run can classify and repair via :func:`recover_and_sweep`:

- ``.tmp-<part>`` present: the write never became visible. Safe to
  drop — foreachBatch sinks run at-least-once, so the batch that
  produced it is replayed against the last durable state.
- ``.old-<part>`` present, ``<part>`` present: crash between steps
  3 and 4 — the old dir is superseded; drop it.
- ``.old-<part>`` present, ``<part>`` missing: crash between steps
  2 and 3 — the old dir IS the last durable state; rename it back.

Single-writer assumption: streaming foreachBatch executes batches
sequentially, so recovery at refresh start never races a concurrent
swap. (At 100 TB scale on an object store this protocol maps onto a
commit-marker scheme — rename is the local-FS stand-in for an atomic
pointer flip.)
"""

from __future__ import annotations

import shutil
from pathlib import Path

__all__ = ["recover_and_sweep", "swap_in", "part_paths"]

_TMP = ".tmp-"
_OLD = ".old-"


def part_paths(root: Path, part: str) -> tuple[Path, Path, Path]:
    """(final, tmp, old) paths for a partition directory name."""
    return root / part, root / f"{_TMP}{part}", root / f"{_OLD}{part}"


def recover_and_sweep(root: Path) -> list[str]:
    """Repair any interrupted swap under ``root``; returns the names of
    partitions whose previous state was renamed back into place."""
    recovered: list[str] = []
    if not root.exists():
        return recovered
    for p in root.glob(f"{_TMP}*"):
        shutil.rmtree(p, ignore_errors=True)
    for p in root.glob(f"{_OLD}*"):
        final = root / p.name[len(_OLD):]
        if final.exists():
            shutil.rmtree(p, ignore_errors=True)
        else:
            p.rename(final)
            recovered.append(final.name)
    return recovered


def swap_in(root: Path, part: str) -> None:
    """Steps 2-4: atomically promote ``.tmp-<part>`` to ``<part>``.

    Caller must have written ``.tmp-<part>`` already (step 1)."""
    final, tmp, old = part_paths(root, part)
    if old.exists():  # stale survivor of a crash after step 3
        shutil.rmtree(old)
    if final.exists():
        final.rename(old)
    tmp.rename(final)
    if old.exists():
        shutil.rmtree(old)
