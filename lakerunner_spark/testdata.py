"""Loaders adapting the driver's synthetic tables to the engine's data model.

The ``events`` table plays the role of a raw telemetry stream:
``event_type`` -> metric_name / log_level, ``user_id`` -> attribute,
``value`` -> sample value, ``props`` -> JSON payload, ``ts`` (ns) ->
``chq_timestamp`` epoch-ms (the engine's canonical time column,
SURVEY §1.2).

Parquet note: the testdata stores TIMESTAMP(NANOS) which Spark only
reads with ``spark.sql.legacy.parquet.nanosAsLong`` — the resulting
epoch-ns long is exactly the engine's integer time model; we floor-div
to ms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _enable_nanos(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # ms-precision date columns -> TIMESTAMP_NTZ consistently, so date
    # predicates compare calendar values (timezone-free on any session)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _enable_nanos(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> telemetry shape with chq_timestamp epoch-ms."""
    df = load_table(spark, sf_dir, "events")
    return df.select(
        "event_id",
        # integer `div`: epoch-ns exceeds 2^53, double division would
        # round a few rows into the wrong millisecond
        F.expr("ts div 1000000").cast("long").alias("chq_timestamp"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


# DuckDB-side equivalent of events_stream (oracle views are the raw tables)
EVENTS_MS_SQL = (
    "SELECT event_id, CAST(epoch_ns(ts) // 1000000 AS BIGINT) AS chq_timestamp, "
    "user_id, event_type, value, props FROM events"
)
