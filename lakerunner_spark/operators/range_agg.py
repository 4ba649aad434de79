"""Range functions over pre-bucketed series (A9/W1/W3/W4).

Reference: promql/leaf_node.go:54-430 slides a window of width ``range``
over per-series step buckets, maintaining sum/count and a min/max deque,
and gates the result on coverage (NaN until the window spans the full
range from the series' first sample).

Spark-first: a time-RANGE window frame over the step_agg output —

    Window.partitionBy(series).orderBy(bucket_ts)
          .rangeBetween(-(range - step), 0)

This keeps everything inside whole-stage codegen (no UDF), and the
window runs after the step_agg shuffle re-using the same partitioning
(partitionBy(series) ⊂ groupBy(bucket_ts, series) keys, so Catalyst
inserts one extra exchange on the much smaller aggregated data — at
100 TB the raw-data shuffle happens once, the window shuffle touches
only series×buckets rows).

Coverage gate: the reference yields NaN until the window covers the
full range (leaf_node.go:308-430). We reproduce it as
``bucket_ts - first_bucket(series) >= range - step`` → else NULL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# rangeAggOp -> (windowed value expression builder)
RANGE_FUNCS = [
    "rate",
    "irate",
    "increase",
    "sum_over_time",
    "count_over_time",
    "avg_over_time",
    "min_over_time",
    "max_over_time",
    "last_over_time",
    "rate_counter",
]


def range_agg(
    df: DataFrame,
    func: str,
    range_ms: int,
    step_ms: int,
    series_labels: list[str],
    coverage_gate: bool = True,
) -> DataFrame:
    """Apply a PromQL range function over step_agg output.

    Input df columns: bucket_ts, *series_labels, sum, count, min, max.
    Output: bucket_ts, *series_labels, value.
    """
    w = (
        Window.partitionBy(*series_labels)
        .orderBy(F.col("bucket_ts"))
        .rangeBetween(-(range_ms - step_ms), 0)
    )
    wfull = Window.partitionBy(*series_labels).orderBy(F.col("bucket_ts"))

    range_sec = range_ms / 1000.0
    wsum = F.sum("sum").over(w)
    wcount = F.sum("count").over(w)

    if func == "rate":
        value: Column = wsum / F.lit(range_sec)
    elif func == "increase":
        value = wsum
    elif func == "sum_over_time":
        value = wsum
    elif func == "count_over_time":
        value = wcount.cast("double")
    elif func == "avg_over_time":
        value = wsum / wcount
    elif func == "min_over_time":
        value = F.min("min").over(w)
    elif func == "max_over_time":
        value = F.max("max").over(w)
    elif func == "last_over_time":
        # reference approximates with the latest bucket's avg
        # (leaf_node.go:346-356)
        value = F.col("sum") / F.col("count")
    elif func == "rate_counter":
        # counter increase over the window / seconds (LogQL rate_counter,
        # promql/rewrite_result.go family): monotone counter delta
        # approximated from windowed min/max of the unwrapped value
        value = (F.max("max").over(w) - F.min("min").over(w)) / F.lit(range_sec)
    elif func == "irate":
        # instant rate from the two most recent buckets, both within the
        # range window (leaf_node.go:369-409)
        prev_ts = F.lag("bucket_ts", 1).over(wfull)
        dt_ms = F.col("bucket_ts") - prev_ts
        value = F.when(
            prev_ts.isNotNull() & (dt_ms <= F.lit(range_ms)),
            F.col("sum") / (dt_ms / 1000.0),
        )
    else:
        raise ValueError(f"unsupported range function: {func}")

    out = df.withColumn("value", value)

    if coverage_gate and func in {"rate", "increase", "avg_over_time"}:
        first_bucket = F.min("bucket_ts").over(
            Window.partitionBy(*series_labels)
            .orderBy("bucket_ts")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        covered = (F.col("bucket_ts") - first_bucket) >= F.lit(range_ms - step_ms)
        out = out.withColumn("value", F.when(covered, F.col("value")))

    return out.select("bucket_ts", *series_labels, "value")
