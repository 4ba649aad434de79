"""Remaining A9/W3 range functions + without-aggregation, oracle-checked.

Completes the range-function inventory (promql/leaf_node.go:164-430):
increase, sum_over_time, count_over_time, min_over_time, last_over_time
(rate/avg_over_time/max_over_time/irate/quantile_over_time are covered
by a9_* / pqs4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakerunner_spark.functions.rounding import portable_round as _pr
from lakerunner_spark.operators.range_agg import range_agg
from lakerunner_spark.operators.step_agg import step_agg_raw
from lakerunner_spark.queries import register
from lakerunner_spark.testdata import EVENTS_MS_SQL, events_stream

_E = f"({EVENTS_MS_SQL})"

_BASE = f"""
      SELECT chq_timestamp - chq_timestamp % 60000 AS bucket_ts, event_type,
             sum(value) AS s, count(value) AS c,
             min(value) AS mn, max(value) AS mx
      FROM {_E} e
      GROUP BY 1, 2
"""

_W = """WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
                 RANGE BETWEEN 240000 PRECEDING AND CURRENT ROW)"""

_GATE = """CASE WHEN bucket_ts - min(bucket_ts) OVER (PARTITION BY event_type)
                     >= 240000"""


def _ranged(spark: SparkSession, sf_dir: str, fn: str) -> DataFrame:
    e = events_stream(spark, sf_dir)
    s = step_agg_raw(e, 60_000, ["event_type"])
    return range_agg(s, fn, 300_000, 60_000, ["event_type"])


@register(
    "a9_increase",
    f"""
    WITH base AS ({_BASE})
    SELECT bucket_ts, event_type,
           {_GATE} THEN pround(sum(s) OVER w, 4) END AS value
    FROM base {_W}
    """,
)
def a9_increase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: increase — windowed sum, coverage-gated (leaf_node.go Eval)."""
    return _ranged(spark, sf_dir, "increase").withColumn("value", _pr("value", 4))


@register(
    "a9_sum_over_time",
    f"""
    WITH base AS ({_BASE})
    SELECT bucket_ts, event_type,
           {_GATE} THEN pround(sum(s) OVER w, 4) END AS value
    FROM base {_W}
    """,
)
def a9_sum_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: sum_over_time — windowed sum, coverage-gated like every
    windowed range fn (leaf_node.go:357 gates the whole case list)."""
    return _ranged(spark, sf_dir, "sum_over_time").withColumn(
        "value", _pr("value", 4)
    )


@register(
    "a9_count_over_time",
    f"""
    WITH base AS ({_BASE})
    SELECT bucket_ts, event_type,
           {_GATE} THEN CAST(sum(c) OVER w AS DOUBLE) END AS value
    FROM base {_W}
    """,
)
def a9_count_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: count_over_time — windowed sample count, coverage-gated."""
    return _ranged(spark, sf_dir, "count_over_time")


@register(
    "a9_min_over_time",
    f"""
    WITH base AS ({_BASE})
    SELECT bucket_ts, event_type,
           {_GATE} THEN pround(min(mn) OVER w, 4) END AS value
    FROM base {_W}
    """,
)
def a9_min_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: min_over_time — the reference's min-deque as a window MIN,
    coverage-gated (leaf_node.go:394)."""
    return _ranged(spark, sf_dir, "min_over_time").withColumn(
        "value", _pr("value", 4)
    )


@register(
    "w3_last_over_time",
    f"""
    WITH base AS ({_BASE})
    SELECT bucket_ts, event_type,
           {_GATE} THEN pround(s / c, 6) END AS value
    FROM base {_W}
    """,
)
def w3_last_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: last_over_time ≈ latest bucket's average (leaf_node.go:346-356),
    coverage-gated like the rest of its case list (leaf_node.go:357)."""
    return _ranged(spark, sf_dir, "last_over_time").withColumn(
        "value", _pr("value", 6)
    )


@register(
    "pqs9_without_agg",
    f"""
    SELECT bucket_ts, user_id, pround(sum(value), 6) AS value
    FROM (
      SELECT chq_timestamp - chq_timestamp % 3600000 AS bucket_ts,
             event_type, user_id, avg(value) AS value
      FROM {_E} e GROUP BY 1, 2, 3
    )
    GROUP BY 1, 2
    """,
)
def pqs9_without_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 'without': group key = label complement, via the front-end
    (sum without (event_type) drops event_type, keeps user_id)."""
    from lakerunner_spark.catalog import default_metric_catalog
    from lakerunner_spark.promql.compiler import compile_promql

    df = compile_promql(
        "sum without (event_type) (events)",
        default_metric_catalog(spark, sf_dir),
        3_600_000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "a9_sparse_sum_over_time",
    f"""
    WITH base AS (
      SELECT chq_timestamp - chq_timestamp % 30000 AS bucket_ts, event_type,
             sum(value) AS s
      FROM {_E} e GROUP BY 1, 2
    ), spans AS (
      SELECT *, greatest(10000, coalesce(bucket_ts - lag(bucket_ts)
               OVER (PARTITION BY event_type ORDER BY bucket_ts), 10000))
               AS eff_span
      FROM base
    ), frames AS (
      SELECT event_type, bucket_ts, eff_span,
             list(struct_pack(ts := bucket_ts, s := s,
                              cut := bucket_ts + eff_span - 60000))
               OVER (PARTITION BY event_type ORDER BY bucket_ts
                     RANGE BETWEEN 50000 PRECEDING AND CURRENT ROW) AS entries
      FROM spans
    ), kept AS (
      SELECT event_type, bucket_ts, eff_span,
             list_filter(entries, e -> len(list_filter(entries,
                 e2 -> e2.ts >= e.ts AND e.ts < e2.cut)) = 0) AS k
      FROM frames
    )
    SELECT event_type, bucket_ts,
           CASE WHEN len(k) > 0 AND bucket_ts - k[1].ts + eff_span >= 60000
                THEN pround(list_sum(list_transform(k, x -> x.s)), 4)
           END AS value
    FROM kept
    """,
)
def a9_sparse_sum_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 sparse-cadence path: series bucketed at 30s, queried at step
    10s / range 60s, so eff_span (leaf_node.go:287-306 inferSpanMs) is
    the inferred 30s cadence, not the step. Both engines evaluate the
    identical eviction/coverage rule over identically-ordered lists, so
    the fold order of the double sum matches bit-for-bit."""
    from lakerunner_spark.operators.range_agg import range_agg_sparse

    e = events_stream(spark, sf_dir)
    s = step_agg_raw(e, 30_000, ["event_type"])
    out = range_agg_sparse(s, "sum_over_time", 60_000, 10_000, ["event_type"])
    return out.withColumn("value", _pr("value", 4))
