"""Density-based routing for the exact quantile/MAD raw-sample path.

The exact interpolated path buffers every raw sample of the trailing
range per output row (range_agg.py exact_quantile_over_time).  The
bucket-count gate (QUANTILE_SKETCH_MIN_BUCKETS) bounds the window span
but not samples-per-bucket, so a dense raw series must flip the route to
the DDSketch bucket algebra even when the range is short — and
mad_over_time, which has no sketch form, must fail closed.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lakerunner_spark.operators.density import (
    QUANTILE_EXACT_MAX_SAMPLES,
    estimate_range_samples,
)
from lakerunner_spark.promql.compiler import (
    LeafSource,
    MetricCatalog,
    compile_promql,
)


def _dense_df(spark, n_per_series=20_000, span_ms=600_000):
    """Two series, n samples each, evenly spread over span_ms (a ~33 Hz
    cadence — far denser than any step grid)."""
    step = span_ms / n_per_series
    return (
        spark.range(n_per_series)
        .select(
            (F.col("id") * F.lit(step)).cast("long").alias("chq_timestamp"),
            F.explode(F.array(F.lit("a"), F.lit("b"))).alias("job"),
            (F.col("id") % 1000).cast("double").alias("value"),
        )
        .cache()
    )


def _sparse_df(spark):
    rows = [(i * 60_000, "a", float(i % 7)) for i in range(40)]
    return spark.createDataFrame(
        rows, "chq_timestamp LONG, job STRING, value DOUBLE"
    )


def test_estimate_range_samples(spark):
    dense = _dense_df(spark)
    # 40k samples / 2 series / (600s span / 300s range = 2 windows) = 10k
    est = estimate_range_samples(
        dense, ["job"], 300_000, "chq_timestamp", "value"
    )
    assert 5_000 < est < 20_000
    sparse = _sparse_df(spark)
    est = estimate_range_samples(
        sparse, ["job"], 300_000, "chq_timestamp", "value"
    )
    assert est < 10
    empty = sparse.filter(F.lit(False))
    assert (
        estimate_range_samples(empty, ["job"], 300_000, "chq_timestamp", "value")
        == 0.0
    )


def test_dense_series_routes_to_sketch(spark):
    """[5m] at 10s step is only 30 buckets — under the bucket gate — but
    ~10k samples/window: the plan must be the sketch route (no
    collect_list arrays) and still quantile-accurate within the DDSketch
    relative-error contract."""
    dense = _dense_df(spark)
    cat = MetricCatalog({"m": LeafSource(df=dense, labels=["job"])})
    out = compile_promql("quantile_over_time(0.9, m[5m])", cat, 10_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan
    # accuracy: values uniform over 0..999 -> q90 ~ 899; DDSketch
    # relative error default 1%
    row = out.filter(F.col("bucket_ts") == 590_000).filter(
        F.col("job") == "a"
    ).first()
    assert row is not None
    assert abs(row.value - 899.0) / 899.0 < 0.02


def test_sparse_series_stays_exact(spark):
    sparse = _sparse_df(spark)
    cat = MetricCatalog({"m": LeafSource(df=sparse, labels=["job"])})
    out = compile_promql("quantile_over_time(0.5, m[5m])", cat, 60_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" in plan


def test_dense_mad_fails_closed(spark):
    dense = _dense_df(spark)
    cat = MetricCatalog({"m": LeafSource(df=dense, labels=["job"])})
    with pytest.raises(ValueError, match="dense"):
        compile_promql("mad_over_time(m[5m])", cat, 10_000)
    # sparse MAD still compiles and runs
    sparse = _sparse_df(spark)
    cat = MetricCatalog({"m": LeafSource(df=sparse, labels=["job"])})
    rows = compile_promql("mad_over_time(m[5m])", cat, 60_000).collect()
    assert any(r.value is not None and not math.isnan(r.value) for r in rows)


def test_subquery_quantile_bucket_gate(spark):
    """A subquery grid wider than QUANTILE_SKETCH_MIN_BUCKETS substeps
    ([2h:10s] = 720) must take the sketch route — the grid itself is the
    sample set, one value per substep."""
    sparse = _sparse_df(spark)
    cat = MetricCatalog({"m": LeafSource(df=sparse, labels=["job"])})
    out = compile_promql("quantile_over_time(0.9, m[2h:10s])", cat, 60_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan
    # short subquery grid keeps the exact path
    out2 = compile_promql("quantile_over_time(0.9, m[5m:60s])", cat, 60_000)
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" in plan2


def test_dense_logql_unwrap_routes_to_sketch(spark):
    from lakerunner_spark.logql.compiler import LogSource, compile_logql

    n = 30_000
    logs = (
        spark.range(n)
        .select(
            (F.col("id") * F.lit(600_000.0 / n)).cast("long").alias(
                "chq_timestamp"
            ),
            F.lit("api").alias("app"),
            F.concat(
                F.lit("dur="), (F.col("id") % 500).cast("string")
            ).alias("log_message"),
        )
        .cache()
    )
    src = LogSource(df=logs, labels=["app"])
    out = compile_logql(
        'quantile_over_time(0.9, {app="api"} | logfmt | unwrap dur [5m])',
        src,
        10_000,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan
