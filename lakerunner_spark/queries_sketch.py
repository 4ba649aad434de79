"""DDSketch query catalog (X1): declarative sketch build/merge/quantile
with exact DuckDB oracle parity (integer buckets + counts)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakerunner_spark.functions.rounding import portable_round as _pr
from lakerunner_spark.operators.ddsketch import (
    ddsketch_agg,
    ddsketch_merge,
    ddsketch_quantile,
    ddsketch_quantile_sql,
)
from lakerunner_spark.queries import register
from lakerunner_spark.testdata import EVENTS_MS_SQL, events_stream

_ABS_E = f"SELECT event_type, user_id, abs(value) AS v FROM ({EVENTS_MS_SQL})"


@register(
    "x1_ddsketch_p95",
    f"""
    SELECT event_type, pround(value, 6) AS value FROM (
      {ddsketch_quantile_sql(_ABS_E, ["event_type"], "v", 0.95)}
    )
    """,
)
def x1_ddsketch_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: DDSketch p95 per event_type — build + quantile walk."""
    from pyspark.sql import functions as F

    e = events_stream(spark, sf_dir).select(
        "event_type", "user_id", F.abs("value").alias("v")
    )
    sk = ddsketch_agg(e, ["event_type"], "v")
    out = ddsketch_quantile(sk, ["event_type"], 0.95)
    return out.withColumn("value", _pr("value", 6))


@register(
    "x1_ddsketch_merge",
    f"""
    SELECT event_type, pround(value, 6) AS value FROM (
      {ddsketch_quantile_sql(_ABS_E, ["event_type"], "v", 0.5)}
    )
    """,
)
def x1_ddsketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/A2: tiered sketch merge — build per (event_type, user_id),
    merge to event_type, then quantile. The oracle states the DIRECT
    single-level build: parity proves merge associativity (the property
    the 10s->1h rollup chain relies on)."""
    from pyspark.sql import functions as F

    e = events_stream(spark, sf_dir).select(
        "event_type", "user_id", F.abs("value").alias("v")
    )
    fine = ddsketch_agg(e, ["event_type", "user_id"], "v")
    coarse = ddsketch_merge(fine, ["event_type"])
    out = ddsketch_quantile(coarse, ["event_type"], 0.5)
    return out.withColumn("value", _pr("value", 6))


# deterministic mixed-sign transform: values recentred around zero so
# roughly half the samples land in the mirrored negative store
_SIGNED_E = (
    f"SELECT event_type, user_id, value - 50.0 AS v FROM ({EVENTS_MS_SQL})"
)


@register(
    "x1_ddsketch_signed_median",
    f"""
    SELECT event_type, pround(value, 6) AS value FROM (
      {ddsketch_quantile_sql(_SIGNED_E, ["event_type"], "v", 0.5)}
    )
    """,
)
def x1_ddsketch_signed_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 negative store: median over MIXED-SIGN data — the mirrored
    negative-bucket mapping keeps index order aligned with value order,
    so one cumulative walk answers quantiles across signs (no NaN; the
    DuckDB oracle reproduces the signed bucket algebra bit-for-bit)."""
    from pyspark.sql import functions as F

    e = events_stream(spark, sf_dir).select(
        "event_type", (F.col("value") - 50.0).alias("v")
    )
    sk = ddsketch_agg(e, ["event_type"], "v")
    out = ddsketch_quantile(sk, ["event_type"], 0.5)
    return out.withColumn("value", _pr("value", 6))
