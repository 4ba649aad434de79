"""Loaders adapting the driver's synthetic tables to the engine's data model.

The ``events`` table plays the role of a raw telemetry stream:
``event_type`` -> metric_name / log_level, ``user_id`` -> attribute,
``value`` -> sample value, ``props`` -> JSON payload, ``ts`` (ns) ->
``chq_timestamp`` epoch-ms (the engine's canonical time column,
SURVEY §1.2).

Parquet note: the testdata's ``ts`` physical type varies by generator
version — TIMESTAMP(NANOS) (Spark reads it as an epoch-ns long under
``nanosAsLong``) or TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ under
``inferTimestampNTZ``).  ``events_stream`` inspects the loaded dtype
and normalizes either to epoch-ms, so the rest of the engine sees one
integer time model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _enable_nanos(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # ms-precision date columns -> TIMESTAMP_NTZ consistently, so date
    # predicates compare calendar values (timezone-free on any session)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    # epoch extraction from NTZ goes through an NTZ->LTZ cast, which uses
    # the session zone; pin UTC so it matches DuckDB's epoch_ns()
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _enable_nanos(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ts_to_epoch_ms(df: DataFrame, col: str = "ts") -> Column:
    """Normalize a raw ``ts`` column (epoch-ns long | timestamp[_ntz]) to epoch-ms."""
    dtype = dict(df.dtypes)[col]
    if dtype == "bigint":
        # integer `div`: epoch-ns exceeds 2^53, double division would
        # round a few rows into the wrong millisecond
        return F.expr(f"{col} div 1000000").cast("long")
    # TIMESTAMP_NTZ -> TIMESTAMP uses the session zone (pinned UTC above);
    # plain TIMESTAMP casts through unchanged
    return F.unix_millis(F.col(col).cast("timestamp")).cast("long")


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> telemetry shape with chq_timestamp epoch-ms."""
    df = load_table(spark, sf_dir, "events")
    return df.select(
        "event_id",
        _ts_to_epoch_ms(df).alias("chq_timestamp"),
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
