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
        # LogQL rate_counter: the reference rewrites it to plain PromQL
        # "rate" over the unwrapped synthetic metric
        # (rewrite_result.go:73 `case "rate_counter": fam, promOp =
        # SynthLogUnwrap, "rate"`) — windowed sum / range seconds, no
        # counter-reset special-casing. Reference-exact.
        value = wsum / F.lit(range_sec)
    elif func == "irate":
        # Extension beyond the reference (whose irate degenerates to
        # rate — sql_builder.go:51 "same SQL as rate; API can do
        # last-two-samples nuance later"): instant rate from the two
        # most recent buckets. Both must lie within the range window,
        # whose frame holds buckets back to range-step — a previous
        # bucket range_ms back would already be outside it.
        prev_ts = F.lag("bucket_ts", 1).over(wfull)
        dt_ms = F.col("bucket_ts") - prev_ts
        value = F.when(
            prev_ts.isNotNull() & (dt_ms <= F.lit(range_ms - step_ms)),
            F.col("sum") / (dt_ms / 1000.0),
        )
    else:
        raise ValueError(f"unsupported range function: {func}")

    out = df.withColumn("value", value)

    # The reference gates EVERY windowed range function on coverage —
    # evalRangeAwareScalar returns NaN while covered < range for
    # sum/count/avg/min/max/last_over_time, rate, and increase alike
    # (leaf_node.go:357,394) — so tier/path choice can't change results.
    # irate stays ungated (per-pair guard above; the reference has no
    # true irate path to mirror).
    if coverage_gate and func != "irate":
        first_bucket = F.min("bucket_ts").over(
            Window.partitionBy(*series_labels)
            .orderBy("bucket_ts")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        covered = (F.col("bucket_ts") - first_bucket) >= F.lit(range_ms - step_ms)
        out = out.withColumn("value", F.when(covered, F.col("value")))

    return out.select("bucket_ts", *series_labels, "value")


SPARSE_FUNCS = [
    "rate",
    "increase",
    "sum_over_time",
    "count_over_time",
    "avg_over_time",
    "min_over_time",
    "max_over_time",
]


def range_agg_sparse(
    df: DataFrame,
    func: str,
    range_ms: int,
    step_ms: int,
    series_labels: list[str],
) -> DataFrame:
    """Range function with the reference's exact sparse-series semantics.

    The reference (promql/leaf_node.go:287-306 inferSpanMs, :308-430
    evalRangeAwareScalar) adapts to series whose bucket cadence is
    coarser than the query step: per bucket,

    - ``eff_span = max(step, ts - prev_ts)`` (first bucket: step);
    - entries with ``e.ts < ts + eff_span - range`` are evicted — and
      stay evicted (running state), even if a later bucket's smaller
      eff_span would re-admit them; a gap wider than the range evicts
      the current bucket itself;
    - ``covered = (ts - first_kept) + eff_span``; the value is NaN
      until ``covered >= range``.

    :func:`range_agg`'s fixed RANGE frame equals this exactly when the
    series cadence <= step (dense data). This variant reproduces the
    sparse case declaratively: collect the fixed frame (always a
    superset of the survivor set, since eff_span >= step), then apply
    the eviction rule as a pairwise array filter — entry ``e`` survives
    at the current row iff no bucket ``e2`` processed at or after
    ``e`` (``e2.ts >= e.ts``) had an eviction cutoff above ``e.ts``.
    Everything stays JVM-side (higher-order functions, no UDF); the
    arrays hold at most range/step entries per row of *aggregated*
    series-resolution data, so the O(n^2) filter is on tiny n.
    """
    if func not in SPARSE_FUNCS:
        raise ValueError(f"unsupported sparse range function: {func}")

    wfull = Window.partitionBy(*series_labels).orderBy(F.col("bucket_ts"))
    wrange = wfull.rangeBetween(-(range_ms - step_ms), 0)

    prev_ts = F.lag("bucket_ts", 1).over(wfull)
    delta = F.col("bucket_ts") - prev_ts
    eff_span = F.greatest(F.lit(step_ms), F.coalesce(delta, F.lit(step_ms)))

    # per-bucket eviction cutoff, collected alongside the stats so the
    # pairwise survival test can see every later bucket's cutoff
    cut = F.col("bucket_ts") + eff_span - F.lit(range_ms)
    stats = F.struct(
        F.col("bucket_ts").alias("ts"),
        F.col("sum").alias("s"),
        F.col("count").alias("c"),
        F.col("min").alias("mn"),
        F.col("max").alias("mx"),
        cut.alias("cut"),
    )
    entries = F.collect_list(stats).over(wrange)

    df2 = (
        df.withColumn("eff_span", eff_span)
        .withColumn("entries", entries)
        .withColumn(
            "kept",
            F.expr(
                "filter(entries, e -> !exists(entries,"
                " e2 -> e2.ts >= e.ts AND e.ts < e2.cut))"
            ),
        )
        .withColumn(
            "covered",
            F.when(
                F.size("kept") > 0,
                F.col("bucket_ts") - F.element_at("kept", 1)["ts"] + F.col("eff_span"),
            ).otherwise(F.lit(0)),
        )
    )

    ksum = F.expr("aggregate(kept, 0D, (a, e) -> a + e.s)")
    kcnt = F.expr("aggregate(kept, 0D, (a, e) -> a + e.c)")
    if func == "rate":
        value = ksum / F.lit(range_ms / 1000.0)
    elif func in ("increase", "sum_over_time"):
        value = ksum
    elif func == "count_over_time":
        value = kcnt
    elif func == "avg_over_time":
        value = F.when(kcnt != 0, ksum / kcnt)
    elif func == "min_over_time":
        value = F.expr("array_min(transform(kept, e -> e.mn))")
    else:  # max_over_time
        value = F.expr("array_max(transform(kept, e -> e.mx))")

    gated = F.when(F.col("covered") >= F.lit(range_ms), value)
    return df2.withColumn("value", gated).select(
        "bucket_ts", *series_labels, "value"
    )
