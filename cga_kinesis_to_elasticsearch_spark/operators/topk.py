"""Shuffle-light per-key top-k.

The standard per-key top-k (window row_number + filter) SORTS every
key's full row set after shuffling every row — at 100 TB that is a
full-data exchange plus an O(n log n) sort to keep k rows per key.
This operator adds the map-side combine the window plan lacks:

1. **local prune** (mapInPandas, Arrow-batched): within each INPUT
   partition, keep at most k candidates per key via a pandas
   groupby-head over a partition-local sort — no shuffle yet; output
   is <= partitions x keys x k rows, typically a tiny fraction of the
   input (the same asymmetics as partial aggregation);
2. **exact finish**: the pruned candidate set shuffles and runs the
   ordinary window row_number — correct because any row in a key's
   global top-k is in its partition's local top-k (the top-k relation
   is monotone under subsetting).

Result is EXACTLY the window plan's output (pinned in tests and by
the SQL oracle); only the physical work changes. Worth it when k <<
rows-per-key; for k ~ rows-per-key the prune passes everything
through and only costs one Arrow pass.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["topk_per_key"]


def topk_per_key(
    df: DataFrame,
    key_col: str,
    order_col: str,
    k: int,
    tiebreak_col: str,
    ascending: bool = False,
) -> DataFrame:
    """Top-``k`` rows per key by ``(order_col, tiebreak_col)``; output
    adds ``rank`` (1-based). Deterministic: ties break on
    ``tiebreak_col`` in the same direction."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    schema = df.schema

    def prune(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        frames = [pdf for pdf in batches if len(pdf)]
        if not frames:
            return
        all_rows = pd.concat(frames, ignore_index=True)
        all_rows = all_rows.sort_values(
            [order_col, tiebreak_col],
            ascending=[ascending, ascending],
            kind="stable",
        )
        yield all_rows.groupby(key_col, sort=False).head(k)

    pruned = df.mapInPandas(prune, schema)
    oc = F.col(order_col)
    tc = F.col(tiebreak_col)
    w = Window.partitionBy(key_col).orderBy(
        oc.asc() if ascending else oc.desc(),
        tc.asc() if ascending else tc.desc(),
    )
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
