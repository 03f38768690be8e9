"""Stateful streaming sequence packing: the micro-batch counterpart of
``text.pack_spans`` (concat-and-split packing into fixed token
budgets), with the per-stream token offset carried across batches via
``applyInPandasWithState``.

Semantics: documents of a stream are packed in arrival order (the
source's per-shard ordering, T3); the state is ONE integer per stream
— the token offset where the next document starts. When the stream
delivers documents in the same order the batch operator would sort
them (id order), the emitted spans are IDENTICAL to batch
``pack_spans`` — asserted in tests/test_streaming_pack.py, which is
the oracle for the state transition itself.

Scale: state is O(1) per stream (a single LONG — no document
buffering), the shuffle is the stream-key exchange any stateful op
pays, and each batch's work is linear in its own rows. This is the
packing shape a continuous training-data ingest needs: sequences keep
numbering consistently across restarts because the offset rides in
the checkpointed state store.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

__all__ = ["PACK_SCHEMA", "PACK_STATE_SCHEMA", "pack_update", "pack_stream"]

PACK_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("stream", StringType()),
        StructField("seq_id", LongType()),
        StructField("tokens_in_seq", LongType()),
    ]
)

PACK_STATE_SCHEMA = StructType([StructField("offset", LongType())])


def pack_update(budget: int):
    """Build the state-update function (closure keeps it cloudpickle-
    shippable without the package on executor PYTHONPATH)."""

    def update(
        key: Tuple[str], pdfs: Iterator[Any], state: GroupState
    ) -> Iterator[Any]:
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        pdf = pd.concat(frames).sort_values("id")
        offset = state.get[0] if state.exists else 0
        ids, seqs, toks = [], [], []
        for doc_id, n_tok in zip(pdf["id"], pdf["n_tok"]):
            start, end = offset, offset + int(n_tok)
            for seq in range(start // budget, (end - 1) // budget + 1):
                ids.append(int(doc_id))
                seqs.append(seq)
                toks.append(
                    min(end, (seq + 1) * budget) - max(start, seq * budget)
                )
            offset = end
        state.update((offset,))
        yield pd.DataFrame(
            {
                "id": ids,
                "stream": key[0],
                "seq_id": seqs,
                "tokens_in_seq": toks,
            }
        )

    return update


def pack_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "id",
    stream_col: str = "stream",
    budget: int = 256,
) -> DataFrame:
    """docs (streaming: stream key, id, text) -> packed spans, offset
    state per stream. Append output mode; one key exchange."""
    prepared = docs.selectExpr(
        f"{stream_col} AS stream",
        f"CAST({id_col} AS LONG) AS id",
        # coalesce: NULL text packs like empty text (one empty token),
        # matching batch pack_spans — size(split(NULL)) would be -1
        f"CAST(size(split(coalesce({text_col}, ''), ' ')) AS LONG) AS n_tok",
    )
    return prepared.groupBy("stream").applyInPandasWithState(
        pack_update(budget),
        outputStructType=PACK_SCHEMA,
        stateStructType=PACK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
