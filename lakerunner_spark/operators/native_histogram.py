"""Prometheus native histograms as declarative bucket algebra (F13 ext).

Native histograms (Prometheus 2.40+, stable in 3.x) replace fixed
``le``-bucket series with exponential buckets: at ``schema`` s the base
is gamma = 2^(2^-s) and bucket i covers (gamma^(i-1), gamma^i] — double
resolution per +1 schema step. The reference engine has no native-
histogram evaluator (its histogram_quantile serves raw-sample
distributions, promql/quantile_node.go:35-114); this module is the
engine's extension, built on the SAME mergeable rows-of-(bucket, count)
contract the DDSketch path uses (operators/ddsketch.py, X1/A5) — a
native histogram IS a DDSketch with gamma pinned to 2^(2^-s), plus the
carried ``count``/``sum`` fields the PromQL accessor functions expose.

Representation: one row per (group..., bucket) with an integer count —
build is groupBy-count, merge is groupBy-sum (associative, tier-safe),
and both engines reproduce bucket indexes bit-for-bit for generic
doubles, so the DuckDB oracles are exact. (The one caveat, fuzz-proven
in tests/test_native_histogram.py: a value lying within an ulp of an
EXACT bucket boundary — x = gamma^i as a floating-point double — may
index one bucket apart across engines because JVM and libm ln()
disagree in the final ulp precisely there. Measure-zero inputs; the
divergence is bounded to ±1 bucket and asserted as such.) ``count``/``sum``/``avg`` come from a plain
companion aggregation over the same scan (upstream stores them as
histogram fields; an engine that builds histograms from raw samples
aggregates them alongside).

Function semantics follow prometheus/model/histogram + promql quantile:

- histogram_count / histogram_sum / histogram_avg: the carried fields
  (count is ALSO derivable as the bucket-row sum — the build test
  asserts the two agree, which is what makes merge trustworthy).
- histogram_quantile(q, h): rank = q * count; first bucket whose
  cumulative count reaches the rank, LINEAR interpolation between the
  bucket's bounds (upstream's uniform-within-bucket assumption). q < 0
  -> -Inf, q > 1 -> +Inf, NaN -> NaN. The zero bucket here holds exact
  zeros only (build-side; no zero_threshold widening), so a rank
  landing in it yields 0.0.
- histogram_fraction(lo, hi, h): sum over buckets of count * (overlap
  of [lo, hi] with the bucket's bounds, linear within the bucket),
  divided by count — upstream's interpolation contract. lo > hi -> 0;
  (-Inf, +Inf) -> 1.

Negative observations live in a mirrored negative store exactly as in
DDSketch (index ordering keeps one cumulative walk correct over
mixed-sign data).

At 100 TB: identical scale story to the DDSketch path — state is
(groups x occupied buckets) rows, build/merge are single-shuffle
partial aggregations, quantile/fraction are window/agg passes over
post-aggregation sketch rows (a few hundred per group at schema 3
across 9 decades), never over raw samples.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lakerunner_spark.operators.ddsketch import _NEG_BASE, _ZERO_BUCKET

DEFAULT_SCHEMA = 3  # gamma = 2^(1/8) ~ 1.0905, ~4.3% bucket width


def gamma_for_schema(schema: int) -> float:
    if not -4 <= schema <= 8:
        raise ValueError(f"native histogram schema out of range: {schema}")
    return 2.0 ** (2.0 ** -schema)


def nh_bucket_index(value, gamma: float) -> Column:
    """ceil(log_gamma(x)) positive store; mirrored negative store;
    reserved zero bucket — same index layout as DDSketch so one
    cumulative walk spans mixed signs."""
    c = F.col(value) if isinstance(value, str) else value
    lg = math.log(gamma)
    return (
        F.when(c > 0, F.ceil(F.log(c) / F.lit(lg)).cast("long"))
        .when(c == 0, F.lit(_ZERO_BUCKET))
        .otherwise(
            F.lit(_NEG_BASE) - F.ceil(F.log(-c) / F.lit(lg)).cast("long")
        )
    )


def nh_bucket_index_sql(value_sql: str, gamma: float) -> str:
    lg = repr(math.log(gamma))
    return (
        f"CASE WHEN {value_sql} > 0"
        f" THEN CAST(ceil(ln({value_sql}) / {lg}) AS BIGINT)"
        f" WHEN {value_sql} = 0 THEN {_ZERO_BUCKET}"
        f" ELSE {_NEG_BASE} - CAST(ceil(ln(-({value_sql})) / {lg}) AS BIGINT)"
        f" END"
    )


def native_histogram_agg(
    df: DataFrame,
    group_cols: list[str],
    value_col: str = "value",
    schema: int = DEFAULT_SCHEMA,
) -> DataFrame:
    """Build per-group native histograms: (group..., bucket, count)
    rows plus the carried fields as (group..., h_count, h_sum) — one
    scan, two partial aggregations. Returns the BUCKET rows; call
    :func:`native_histogram_stats` on the same input for the fields."""
    gamma = gamma_for_schema(schema)
    return (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("bucket", nh_bucket_index(value_col, gamma))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def native_histogram_merge(df: DataFrame, group_cols: list[str]) -> DataFrame:
    """Merge histograms to a coarser grouping (counts add per bucket —
    associative and order-free, the rollup-tier contract)."""
    return df.groupBy(*group_cols, "bucket").agg(F.sum("count").alias("count"))


def native_histogram_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str = "value",
) -> DataFrame:
    """The carried count/sum fields (+ avg): histogram_count,
    histogram_sum, histogram_avg accessors in one aggregation."""
    c = F.col(value_col)
    return (
        df.filter(c.isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("h_count"),
            F.sum(c).alias("h_sum"),
            (F.sum(c) / F.count(F.lit(1))).alias("h_avg"),
        )
    )


def _bounds(gamma: float):
    """(lower, upper] bucket bounds as Columns of the `bucket` col."""
    b = F.col("bucket")
    pos_l = F.pow(F.lit(gamma), b - 1)
    pos_u = F.pow(F.lit(gamma), b)
    neg_j = F.lit(_NEG_BASE) - b
    neg_l = -F.pow(F.lit(gamma), neg_j)
    neg_u = -F.pow(F.lit(gamma), neg_j - 1)
    lower = (
        F.when(b > _ZERO_BUCKET, pos_l)
        .when(b == _ZERO_BUCKET, F.lit(0.0))
        .otherwise(neg_l)
    )
    upper = (
        F.when(b > _ZERO_BUCKET, pos_u)
        .when(b == _ZERO_BUCKET, F.lit(0.0))
        .otherwise(neg_u)
    )
    return lower, upper


def histogram_quantile_native(
    sketch: DataFrame,
    group_cols: list[str],
    q: float,
    schema: int = DEFAULT_SCHEMA,
    out_col: str = "value",
) -> DataFrame:
    """Native-histogram quantile per group from bucket rows.

    rank = q * count; the answer interpolates linearly inside the
    first bucket whose cumulative count reaches the rank (upstream
    histogramQuantile's uniform-within-bucket assumption — NOT the
    DDSketch mid-bucket point, which optimizes relative error
    instead). q outside [0, 1] follows upstream: -Inf / +Inf; NaN
    propagates."""
    if math.isnan(q):
        return sketch.groupBy(*group_cols).agg(
            F.lit(float("nan")).alias(out_col)
        )
    if q < 0:
        return sketch.groupBy(*group_cols).agg(
            F.lit(float("-inf")).alias(out_col)
        )
    if q > 1:
        return sketch.groupBy(*group_cols).agg(
            F.lit(float("inf")).alias(out_col)
        )
    gamma = gamma_for_schema(schema)
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    totals = Window.partitionBy(*group_cols)
    cum = (
        sketch.withColumn("cum", F.sum("count").over(w))
        .withColumn("n", F.sum("count").over(totals))
    )
    rank = F.lit(q) * F.col("n")
    # first bucket whose cumulative count reaches the rank (ties at
    # rank==cum resolve INTO the bucket, matching upstream's >=); the
    # q==0 edge needs its own filter — rank 0 satisfies pcum < rank
    # nowhere — and lands on the first occupied bucket's lower bound.
    # Occupied buckets have count >= 1, so cum is strictly increasing
    # and exactly one row per group survives — no dedupe pass needed.
    cum = cum.withColumn("pcum", F.col("cum") - F.col("count"))
    if q == 0:
        first = cum.filter(F.col("pcum") == 0)
    else:
        first = cum.filter((F.col("cum") >= rank) & (F.col("pcum") < rank))
    lower, upper = _bounds(gamma)
    frac = (rank - F.col("pcum")) / F.col("count")
    value = F.when(
        F.col("bucket") == _ZERO_BUCKET, F.lit(0.0)
    ).otherwise(lower + (upper - lower) * frac)
    return first.select(*group_cols, value.alias(out_col))


def histogram_fraction(
    sketch: DataFrame,
    group_cols: list[str],
    lo: float,
    hi: float,
    schema: int = DEFAULT_SCHEMA,
    out_col: str = "fraction",
) -> DataFrame:
    """Estimated fraction of observations in [lo, hi] per group
    (upstream histogramFraction): each bucket contributes its count
    scaled by the linear overlap of [lo, hi] with its bounds; the zero
    bucket (exact zeros here) contributes fully iff lo <= 0 <= hi.
    lo > hi yields 0 (upstream returns 0 for inverted bounds)."""
    if math.isnan(lo) or math.isnan(hi):
        return sketch.groupBy(*group_cols).agg(
            F.lit(float("nan")).alias(out_col)
        )
    gamma = gamma_for_schema(schema)
    lower, upper = _bounds(gamma)
    if lo > hi:
        overlap = F.lit(0.0)
    else:
        zero_in = 1.0 if (lo <= 0.0 <= hi) else 0.0
        span = upper - lower
        clipped = F.greatest(
            F.lit(0.0),
            F.least(upper, F.lit(hi)) - F.greatest(lower, F.lit(lo)),
        )
        overlap = F.when(
            F.col("bucket") == _ZERO_BUCKET, F.lit(zero_in)
        ).otherwise(clipped / span)
    agg = sketch.groupBy(*group_cols).agg(
        F.sum(F.col("count") * overlap).alias("_in"),
        F.sum("count").alias("_n"),
    )
    return agg.select(
        *group_cols, (F.col("_in") / F.col("_n")).alias(out_col)
    )


# ---------------------------- DuckDB twins ----------------------------------


def _bounds_sql(gamma: float) -> tuple[str, str]:
    g = repr(gamma)
    lower = (
        f"CASE WHEN bucket > {_ZERO_BUCKET} THEN power({g}, bucket - 1)"
        f" WHEN bucket = {_ZERO_BUCKET} THEN 0.0"
        f" ELSE -power({g}, {_NEG_BASE} - bucket) END"
    )
    upper = (
        f"CASE WHEN bucket > {_ZERO_BUCKET} THEN power({g}, bucket)"
        f" WHEN bucket = {_ZERO_BUCKET} THEN 0.0"
        f" ELSE -power({g}, {_NEG_BASE} - bucket - 1) END"
    )
    return lower, upper


def native_histogram_quantile_sql(
    base_sql: str,
    group_cols: list[str],
    value_sql: str,
    q: float,
    schema: int = DEFAULT_SCHEMA,
    out_col: str = "value",
) -> str:
    """DuckDB oracle for build + native quantile over ``base_sql``."""
    gamma = gamma_for_schema(schema)
    keys = ", ".join(group_cols)
    b = nh_bucket_index_sql(value_sql, gamma)
    lower, upper = _bounds_sql(gamma)
    return f"""
    WITH rows_b AS (
      SELECT {keys}, {b} AS bucket FROM ({base_sql})
      WHERE {value_sql} IS NOT NULL
    ),
    sk AS (
      SELECT {keys}, bucket, count(*) AS cnt FROM rows_b GROUP BY {keys}, bucket
    ),
    cum AS (
      SELECT {keys}, bucket, cnt,
             sum(cnt) OVER (PARTITION BY {keys} ORDER BY bucket
                            ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cnt) OVER (PARTITION BY {keys}) AS n
      FROM sk
    ),
    hit AS (
      SELECT {keys}, bucket, cnt, cum - cnt AS pcum, {q} * n AS rank
      FROM cum
      WHERE {"cum - cnt = 0" if q == 0
             else f"cum >= {q} * n AND cum - cnt < {q} * n"}
    )
    SELECT {keys},
           CASE WHEN bucket = {_ZERO_BUCKET} THEN 0.0
                ELSE ({lower})
                     + (({upper}) - ({lower})) * ((rank - pcum) / cnt)
           END AS {out_col}
    FROM hit
    """


def histogram_fraction_sql(
    base_sql: str,
    group_cols: list[str],
    value_sql: str,
    lo: float,
    hi: float,
    schema: int = DEFAULT_SCHEMA,
    out_col: str = "fraction",
) -> str:
    """DuckDB oracle for build + fraction-in-[lo, hi] over ``base_sql``."""
    gamma = gamma_for_schema(schema)
    keys = ", ".join(group_cols)
    b = nh_bucket_index_sql(value_sql, gamma)
    lower, upper = _bounds_sql(gamma)
    if lo > hi:
        overlap = "0.0"
    else:
        zero_in = "1.0" if (lo <= 0.0 <= hi) else "0.0"
        overlap = (
            f"CASE WHEN bucket = {_ZERO_BUCKET} THEN {zero_in}"
            f" ELSE greatest(0.0, least(({upper}), {hi!r})"
            f"      - greatest(({lower}), {lo!r}))"
            f"      / (({upper}) - ({lower})) END"
        )
    return f"""
    WITH rows_b AS (
      SELECT {keys}, {b} AS bucket FROM ({base_sql})
      WHERE {value_sql} IS NOT NULL
    ),
    sk AS (
      SELECT {keys}, bucket, count(*) AS cnt FROM rows_b GROUP BY {keys}, bucket
    )
    SELECT {keys}, sum(cnt * ({overlap})) / sum(cnt) AS {out_col}
    FROM sk GROUP BY {keys}
    """


def histogram_stddev_stdvar(
    sketch: DataFrame,
    stats: DataFrame,
    group_cols: list[str],
    schema: int = DEFAULT_SCHEMA,
) -> DataFrame:
    """histogram_stddev / histogram_stdvar (upstream funcHistogramStdDev/
    StdVar): every observation in a bucket is assumed at the bucket's
    ARITHMETIC midpoint (upper+lower)/2 — zero bucket at 0 — and the
    variance is the count-weighted squared deviation from the TRUE mean
    (the carried sum/count, not a bucket estimate):

        variance = sum_b count_b * ((upper_b+lower_b)/2 - sum/count)^2
                   / count

    Returns (group..., h_stdvar, h_stddev). Joins the one-row-per-group
    stats table back to the bucket rows — the join side is bounded by
    group cardinality, never corpus rows."""
    gamma = gamma_for_schema(schema)
    lower, upper = _bounds(gamma)
    mid = F.when(F.col("bucket") == _ZERO_BUCKET, F.lit(0.0)).otherwise(
        (upper + lower) / 2
    )
    j = sketch.join(stats.select(*group_cols, "h_count", "h_sum"), group_cols)
    delta = mid - F.col("h_sum") / F.col("h_count")
    agg = j.groupBy(*group_cols).agg(
        (F.sum(F.col("count") * delta * delta) / F.max("h_count")).alias(
            "h_stdvar"
        )
    )
    return agg.withColumn("h_stddev", F.sqrt(F.col("h_stdvar")))


def histogram_stddev_sql(
    base_sql: str,
    group_cols: list[str],
    value_sql: str,
    schema: int = DEFAULT_SCHEMA,
) -> str:
    """DuckDB oracle: build + stddev/stdvar over ``base_sql`` rows."""
    gamma = gamma_for_schema(schema)
    keys = ", ".join(group_cols)
    b = nh_bucket_index_sql(value_sql, gamma)
    lower, upper = _bounds_sql(gamma)
    mid = (
        f"CASE WHEN bucket = {_ZERO_BUCKET} THEN 0.0"
        f" ELSE (({upper}) + ({lower})) / 2 END"
    )
    return f"""
    WITH rows_b AS (
      SELECT {keys}, {b} AS bucket, {value_sql} AS v FROM ({base_sql})
      WHERE {value_sql} IS NOT NULL
    ),
    sk AS (
      SELECT {keys}, bucket, count(*) AS cnt FROM rows_b GROUP BY {keys}, bucket
    ),
    st AS (
      SELECT {keys}, count(*) AS n, sum(v) AS s FROM rows_b GROUP BY {keys}
    ),
    dv AS (
      SELECT sk.*, st.n, ({mid}) - st.s / st.n AS delta
      FROM sk JOIN st USING ({keys})
    ),
    var AS (
      SELECT {keys}, sum(cnt * delta * delta) / max(n) AS h_stdvar
      FROM dv GROUP BY {keys}
    )
    SELECT {keys}, h_stdvar, sqrt(h_stdvar) AS h_stddev FROM var
    """
