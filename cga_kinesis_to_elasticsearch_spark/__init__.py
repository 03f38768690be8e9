"""PySpark-native analytics engine with the query and data-processing
capabilities of govau/cga-kinesis-to-elasticsearch.

The reference (at /root/reference, read-only) is a Go streaming ETL
pipeline: Kinesis -> protobuf decode -> filter/route -> grok parse ->
CF-dimension enrichment join -> computed columns -> day-partitioned
Elasticsearch bulk sink (see SURVEY.md). This package re-expresses every
operator Spark-first:

- every operator is a pure ``DataFrame -> DataFrame`` function that runs
  identically in batch (DuckDB-oracle testable) and under Structured
  Streaming;
- grok patterns compile at *plan time* into built-in ``regexp_extract``
  expressions (whole-stage codegen, no Python in the hot path);
- the per-record TTL'd lookup cache of the reference becomes a broadcast
  hash join against a pre-flattened dimension snapshot;
- the micro-batching bulk sink becomes ``foreachBatch`` with
  day-partitioned output and deterministic doc ids (effectively-once,
  an upgrade over the reference's at-least-once).

Beyond the reference surface, `operators/` adds the LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
designed for 100 TB scale.
"""

__version__ = "0.1.0"
