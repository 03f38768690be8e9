"""Shuffle-light per-key top-k.

The standard per-key top-k (window row_number + filter) SORTS every
key's full row set after shuffling every row — at 100 TB that is a
full-data exchange plus an O(n log n) sort to keep k rows per key.
This operator adds the map-side combine the window plan lacks:

1. **local prune** (mapInPandas, Arrow-batched): within each INPUT
   partition, keep at most k candidates per key via a pandas
   groupby-head over a sort — no shuffle yet; output is <= partitions
   x keys x k rows, typically a tiny fraction of the input (the same
   asymmetics as partial aggregation). Each Arrow batch is pruned as
   it arrives and only survivors accumulate, so executor memory is
   O(keys-in-partition x k), not O(partition) — the prune never holds
   a whole input partition in pandas;
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
    ``tiebreak_col`` in the same direction. Null semantics mirror the
    window plan exactly: a NULL key is one group (pandas groupby with
    ``dropna=False``), and NULL order values sort where Spark's
    ``asc()``/``desc()`` put them (nulls first when ascending, last
    when descending — pandas ``na_position`` is set to match)."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    schema = df.schema
    # Spark: asc() == asc_nulls_first, desc() == desc_nulls_last.
    na_position = "first" if ascending else "last"

    def prune(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        def local_topk(pdf: "pd.DataFrame") -> "pd.DataFrame":
            pdf = pdf.sort_values(
                [order_col, tiebreak_col],
                ascending=[ascending, ascending],
                kind="stable",
                na_position=na_position,
            )
            return pdf.groupby(key_col, sort=False, dropna=False).head(k)

        # fold batch-by-batch: prune each incoming batch, then re-prune
        # the (survivors + batch-survivors) union — memory stays
        # O(distinct keys x k), never O(partition)
        survivors: "pd.DataFrame | None" = None
        for pdf in batches:
            if not len(pdf):
                continue
            batch_top = local_topk(pdf)
            if survivors is None:
                survivors = batch_top
            else:
                survivors = local_topk(
                    pd.concat([survivors, batch_top], ignore_index=True)
                )
        if survivors is not None and len(survivors):
            yield survivors

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
