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
from urllib.parse import unquote

__all__ = [
    "recover_and_sweep",
    "swap_in",
    "part_paths",
    "decode_part_name",
    "promote_staged",
]

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


def decode_part_name(name: str) -> tuple[str, str | None]:
    """``col=escaped`` directory name -> ``(col, raw value)``.

    Spark's ``partitionBy`` %XX-escapes special characters (':', '#',
    '%', ...) in partition values (Hive ``escapePathName``), and writes
    NULL as ``__HIVE_DEFAULT_PARTITION__`` — so dir names must be
    DECODED to compare against collected column values, never
    re-encoded by string formatting."""
    col, _, raw = name.partition("=")
    if raw == "__HIVE_DEFAULT_PARTITION__":
        return col, None
    return col, unquote(raw)


def promote_staged(
    root: Path,
    tmp_root: Path,
    part_col: str,
    expected: dict[str, bool],
) -> None:
    """Promote every staged partition dir under ``tmp_root`` into
    ``root`` via the swap protocol, matching touched partition VALUES
    against the dir names Spark actually wrote — reconstructing
    ``f"{col}={value}"`` is unsafe because ``partitionBy`` escapes
    special characters.

    ``expected`` maps each touched partition's raw string value to
    whether the rewrite may legitimately have staged NOTHING for it
    (True = every row of the partition was deleted, swap in an empty
    dir). Any other mismatch — a touched partition with surviving rows
    but no staged dir, or a staged dir for an un-touched value — raises
    instead of silently swapping in an empty (data-losing) partition."""
    prefix = f"{part_col}="
    staged: dict[str | None, str] = {}
    for p in tmp_root.iterdir():
        if p.is_dir() and p.name.startswith(prefix):
            staged[decode_part_name(p.name)[1]] = p.name
    orig: dict[str | None, str] = {}
    for p in root.iterdir():
        if p.is_dir() and p.name.startswith(prefix):
            orig[decode_part_name(p.name)[1]] = p.name
    for val, may_be_empty in expected.items():
        name = staged.pop(val, None)
        if name is not None:
            _, tmp, _ = part_paths(root, name)
            (tmp_root / name).rename(tmp)
            swap_in(root, name)
            continue
        if not may_be_empty:
            raise RuntimeError(
                "partition rewrite staged no directory for touched "
                f"partition {part_col}={val!r} which still has "
                "surviving rows — refusing to swap in an empty dir"
            )
        name = orig.get(val)
        if name is None:
            raise RuntimeError(
                "fully-deleted touched partition "
                f"{part_col}={val!r} has no original directory under "
                f"{root} — partition listing out of sync with the scan"
            )
        _, tmp, _ = part_paths(root, name)
        tmp.mkdir()
        swap_in(root, name)
    if staged:
        raise RuntimeError(
            "partition rewrite staged directories for values the "
            f"match scan never touched: {sorted(staged.values())}"
        )


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
