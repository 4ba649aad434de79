"""Tier-aware layout catalog through the PromQL front-end + salted agg."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakerunner_spark.catalog import default_metric_catalog, layout_metric_catalog
from lakerunner_spark.operators.skew import salted_agg
from lakerunner_spark.promql.compiler import compile_promql
from lakerunner_spark.testdata import events_stream


@pytest.fixture(scope="module")
def cooked_metrics(spark, sf_dir, tmp_path_factory):
    """Tiered layout of events-as-metrics (10s + 60s), like test_e2e."""
    from lakerunner_spark.ingest.preagg import preaggregate_metrics
    from lakerunner_spark.ingest.rollup import rollup_tier
    from lakerunner_spark.schema import dateint
    from lakerunner_spark.sources.writers import write_segments

    base = str(tmp_path_factory.mktemp("layout"))
    e = events_stream(spark, sf_dir).select(
        "chq_timestamp",
        F.col("event_type").alias("metric_name"),
        F.col("user_id").cast("string").alias("attr_user"),
        "value",
    )
    t10 = preaggregate_metrics(e, ["metric_name", "attr_user"], value_col="value")
    t60 = rollup_tier(t10, ["metric_name", "attr_user"], 60_000)
    for grain, t in ((10_000, t10), (60_000, t60)):
        out = (
            t.withColumn("org_id", F.lit("org1"))
            .withColumn("dateint", dateint(F.col("chq_timestamp")))
            .withColumn("frequency_ms", F.lit(grain))
        )
        write_segments(out, f"{base}/metrics", "metrics")
    return f"{base}/metrics"


def test_promql_over_layout_matches_raw(spark, sf_dir, cooked_metrics):
    """The same PromQL string over the 60s rollup tier and over raw
    samples must agree (rollup partials compose exactly)."""
    step = 600_000
    q = 'sum by (attr_user) (rate(purchase[30m]))'
    layout_cat = layout_metric_catalog(
        spark, cooked_metrics, step, ["metric_name", "attr_user"],
        available_tiers=[10_000, 60_000],
    )
    got = compile_promql(q, layout_cat, step)

    raw = events_stream(spark, sf_dir).select(
        "chq_timestamp",
        F.col("event_type").alias("metric_name"),
        F.col("user_id").cast("string").alias("attr_user"),
        "value",
    )
    from lakerunner_spark.promql.compiler import LeafSource, MetricCatalog

    raw_cat = MetricCatalog(
        {"purchase": LeafSource(
            raw.filter(F.col("metric_name") == "purchase"),
            ["metric_name", "attr_user"],
        )}
    )
    want = compile_promql(q, raw_cat, step)

    g = {(r.bucket_ts, r.attr_user): round(r.value, 9) if r.value is not None else None
         for r in got.collect()}
    w = {(r.bucket_ts, r.attr_user): round(r.value, 9) if r.value is not None else None
         for r in want.collect()}
    assert g == w and len(g) > 0


def test_layout_rejects_raw_only_functions(spark, cooked_metrics):
    cat = layout_metric_catalog(
        spark, cooked_metrics, 60_000, ["metric_name", "attr_user"],
        available_tiers=[10_000, 60_000],
    )
    with pytest.raises(ValueError, match="raw samples"):
        compile_promql("quantile_over_time(0.9, purchase[10m])", cat, 60_000)
    with pytest.raises(ValueError, match="raw samples"):
        compile_promql("histogram_quantile(0.9, purchase)", cat, 60_000)


def test_salted_agg_equals_direct(spark, sf_dir):
    e = events_stream(spark, sf_dir)
    salted = salted_agg(
        e,
        ["event_type"],
        {
            "s": ("sum", "value"),
            "c": ("count", "value"),
            "mn": ("min", "value"),
            "mx": ("max", "value"),
        },
        salt_n=8,
    )
    direct = e.groupBy("event_type").agg(
        F.sum("value").alias("s"),
        F.count("value").alias("c"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    got = {
        (r.event_type, round(r.s, 6), r.c, r.mn, r.mx) for r in salted.collect()
    }
    want = {
        (r.event_type, round(r.s, 6), r.c, r.mn, r.mx) for r in direct.collect()
    }
    assert got == want


def test_salted_agg_rejects_non_algebraic(spark, sf_dir):
    e = events_stream(spark, sf_dir)
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(e, ["event_type"], {"a": ("avg", "value")})
