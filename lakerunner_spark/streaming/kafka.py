"""S9: Kafka work-distribution source (Structured Streaming).

Reference: ingest/compact/rollup workers coordinate via Kafka topics
with a Postgres offset tracker for effective exactly-once
(docs/design/OVERVIEW.md:254-263, internal/metricsprocessing/
offset_tracker.go, kafka_offset_tracker migration).

Spark-first: ``readStream.format("kafka")`` — checkpointed offsets
replace the tracker table entirely (T4), ``maxOffsetsPerTrigger``
replaces the boxer/hunter batch sizing (T3). Requires the
spark-sql-kafka connector jar on the cluster; this module only builds
the plan, so it imports cleanly without one (constructing the stream
raises Spark's missing-data-source error — surfaced unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_ingest_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """ingest topic -> (kafka_ts, key, value bytes) stream.

    Payloads are object-store event notifications (or inline OTLP);
    chain with the otel/mapInPandas decode and preagg_stream.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    raw = reader.load()
    return raw.select(
        F.col("timestamp").alias("kafka_ts"),
        F.col("key").cast("string").alias("key"),
        F.col("value").alias("payload"),
        "topic",
        "partition",
        "offset",
    )
