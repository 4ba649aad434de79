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


def layout_metric_catalog(
    spark: SparkSession,
    metrics_path: str,
    step_ms: int,
    label_cols: list[str],
    available_tiers: list[int] | None = None,
) -> MetricCatalog:
    """Catalog over a cooked tiered layout (§3.1 step 4: segment lookup
    picks the best frequency tier for the step).

    Every metric name resolves lazily to the chosen tier's rows filtered
    to that metric — partition pruning on frequency_ms/dateint comes
    from the directory layout; rollup partials compose in step_agg.
    """
    from lakerunner_spark.plans.tiers import pick_rollup_tier

    tier = pick_rollup_tier(step_ms, tiers=available_tiers)
    # mergeSchema: the 10s tier carries chq_rollup_p* columns the rollup
    # tiers lack; without schema union the p* columns' visibility would
    # depend on which file's footer Spark samples first
    base = (
        spark.read.option("mergeSchema", "true")
        .parquet(metrics_path)
        .filter(F.col("frequency_ms") == tier)
    )

    class _LayoutCatalog(MetricCatalog):
        def __init__(self):
            super().__init__({})

        def resolve(self, metric: str) -> LeafSource:
            df = base.filter(F.col("metric_name") == metric)
            return LeafSource(
                df, list(label_cols), pre_aggregated=True, frequency_ms=tier
            )

    return _LayoutCatalog()
