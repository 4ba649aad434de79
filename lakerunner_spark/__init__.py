"""lakerunner_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of cardinalhq/lakerunner.

The reference (at /root/reference, Go + DuckDB) is a telemetry lake:
it ingests OTEL logs/metrics/traces into sorted pre-aggregated Parquet
segments and answers LogQL/PromQL queries by compiling them to SQL.
This engine re-expresses every capability Spark-first:

- ``sources``   — file readers / sorted segment writers (SURVEY §2.1)
- ``logql``     — log pipeline stages: filters, parsers, formats (§2.2)
- ``operators`` — step/vector/range aggregation, vector matching,
  top-k, distinct, sorts (§2.3-2.7)
- ``functions`` — scalar function library: time bucketing, duration/
  bytes unwrap, deterministic hashes (§2.8)
- ``ingest``    — pre-aggregation, rollup chain, compaction (§2.4 A1/A2)
- ``dataops``   — large-scale training-data pipeline ops: dedup,
  similarity search, text analysis, multimodal plumbing
- ``streaming`` — Structured Streaming ingest (§2.9)
"""

__version__ = "0.1.0"
