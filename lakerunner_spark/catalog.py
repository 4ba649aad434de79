"""Default catalogs binding the synthetic testdata to the front-ends.

``events`` plays the metric (value samples with labels event_type,
user_id) and the log stream (props JSON as the line body, event_type as
the stream label) — the same dual role the reference's exemplar
fixtures play in its DuckDB harness (queryapi/ddb_harness.go:42-180).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from lakerunner_spark.logql.compiler import LogSource
from lakerunner_spark.promql.compiler import LeafSource, MetricCatalog
from lakerunner_spark.testdata import events_stream


def default_metric_catalog(spark: SparkSession, sf_dir: str) -> MetricCatalog:
    ev = events_stream(spark, sf_dir)
    return MetricCatalog({"events": LeafSource(ev, ["event_type", "user_id"])})


def default_log_source(spark: SparkSession, sf_dir: str) -> LogSource:
    ev = events_stream(spark, sf_dir).withColumn("log_message", F.col("props"))
    return LogSource(ev, ["event_type"], line_col="log_message")
