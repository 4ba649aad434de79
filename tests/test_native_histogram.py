"""Native-histogram function semantics (upstream-derived cases).

Expectations re-derived by hand from Prometheus's documented native-
histogram behavior (promql/testdata native_histograms.test and
model/histogram quantile semantics): count/sum/avg accessors, quantile
edge handling (q outside [0,1], NaN), fraction boundary cases, and the
mergeable bucket-algebra contract (merge-then-evaluate equals
direct-build-then-evaluate). Interpolation follows Prometheus 3.x
(PR #14677): exponential within standard exponential buckets for
quantile/fraction, geometric bucket midpoints for stddev/stdvar.
The one documented divergence in operators/native_histogram.py: the
zero bucket holds exact zeros only (no zero_threshold widening).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lakerunner_spark.operators.native_histogram import (
    DEFAULT_SCHEMA,
    gamma_for_schema,
    histogram_fraction,
    histogram_quantile_native,
    native_histogram_agg,
    native_histogram_merge,
    native_histogram_stats,
)


def _df(spark, vals, group="g"):
    return spark.createDataFrame(
        [(group, float(v)) for v in vals], "g string, value double"
    )


SAMPLES = [0.5, 1.0, 2.0, 4.0, 8.0, -1.0, -2.0, 0.0, 3.0, 6.0]


def test_fields_count_sum_avg(spark):
    """histogram_count/sum/avg: the carried fields; bucket-row count
    sum must equal the carried count (no observation lost to the
    bucket mapping — the property merges rely on)."""
    df = _df(spark, SAMPLES)
    stats = native_histogram_stats(df, ["g"]).collect()[0]
    assert stats.h_count == len(SAMPLES)
    assert stats.h_sum == pytest.approx(sum(SAMPLES))
    assert stats.h_avg == pytest.approx(sum(SAMPLES) / len(SAMPLES))
    buckets = native_histogram_agg(df, ["g"])
    derived = buckets.agg(F.sum("count")).collect()[0][0]
    assert derived == len(SAMPLES)


def test_quantile_edges_follow_upstream(spark):
    """q < 0 -> -Inf, q > 1 -> +Inf, NaN -> NaN (funcHistogramQuantile
    edge behavior); q=0 -> lower bound of the first occupied bucket;
    q=1 -> upper bound of the last."""
    df = _df(spark, [1.0, 2.0, 4.0])
    sk = native_histogram_agg(df, ["g"])
    lo = histogram_quantile_native(sk, ["g"], -0.5).collect()[0].value
    hi = histogram_quantile_native(sk, ["g"], 1.5).collect()[0].value
    nn = histogram_quantile_native(sk, ["g"], float("nan")).collect()[0].value
    assert lo == float("-inf") and hi == float("inf") and math.isnan(nn)
    g = gamma_for_schema(DEFAULT_SCHEMA)
    q0 = histogram_quantile_native(sk, ["g"], 0.0).collect()[0].value
    q1 = histogram_quantile_native(sk, ["g"], 1.0).collect()[0].value
    # q=0: lower bound of the bucket containing 1.0 = gamma^(i-1)
    i = math.ceil(math.log(1.0) / math.log(g))
    assert q0 == pytest.approx(g ** (i - 1))
    # q=1: upper bound of the bucket containing 4.0
    j = math.ceil(math.log(4.0) / math.log(g))
    assert q1 == pytest.approx(g ** j)


def test_quantile_within_relative_error_and_monotone(spark):
    """Quantile estimates stay inside the target bucket (bounds within
    one gamma factor of the true order statistic) and are monotone in
    q — upstream's guarantee for exponential buckets."""
    vals = [float(v) for v in range(1, 101)]
    df = _df(spark, vals)
    sk = native_histogram_agg(df, ["g"])
    g = gamma_for_schema(DEFAULT_SCHEMA)
    prev = None
    for q in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = histogram_quantile_native(sk, ["g"], q).collect()[0].value
        true = vals[min(len(vals) - 1, int(math.ceil(q * len(vals))) - 1)]
        assert true / g <= est <= true * g, (q, est, true)
        if prev is not None:
            assert est >= prev
        prev = est


def test_quantile_mixed_sign_and_zero_bucket(spark):
    """The cumulative walk spans negative store -> zero bucket ->
    positive store: a rank landing among negatives interpolates there,
    a rank landing on the zero bucket returns 0.0."""
    df = _df(spark, [-4.0, -2.0, 0.0, 0.0, 2.0, 4.0])
    sk = native_histogram_agg(df, ["g"])
    med = histogram_quantile_native(sk, ["g"], 0.5).collect()[0].value
    assert med == 0.0  # rank 3 falls in the zero bucket (cum 2 -> 4)
    q20 = histogram_quantile_native(sk, ["g"], 0.2).collect()[0].value
    assert -4.0 * gamma_for_schema(DEFAULT_SCHEMA) <= q20 < 0


def test_fraction_boundary_cases(spark):
    """histogram_fraction: (-Inf, +Inf) -> 1; inverted bounds -> 0;
    a range spanning 0 includes the zero bucket fully; disjoint range
    -> 0; NaN propagates."""
    df = _df(spark, SAMPLES)
    sk = native_histogram_agg(df, ["g"])

    def frac(lo, hi):
        return histogram_fraction(sk, ["g"], lo, hi).collect()[0].fraction

    assert frac(float("-inf"), float("inf")) == pytest.approx(1.0)
    assert frac(5.0, 1.0) == 0.0
    assert frac(1000.0, 2000.0) == 0.0
    assert math.isnan(frac(float("nan"), 1.0))
    # [-0.1, 0.1]: only the zero bucket (one exact 0 of 10 samples)
    # plus a sliver of nothing — no bucket bounds fall inside
    assert frac(-0.1, 0.1) == pytest.approx(0.1)
    # monotone in widening: [0, 8] ⊂ [-8, 8]
    assert frac(0.0, 8.0) <= frac(-8.0, 8.0) <= 1.0


def test_merge_equals_direct_build(spark):
    """The rollup-tier contract: build per (g, sub), merge to g, then
    evaluate — identical bucket rows, hence identical quantile and
    fraction, as a direct one-level build (counts add associatively)."""
    rows = [("g", i % 7, float(v)) for i, v in enumerate(range(1, 51))]
    df = spark.createDataFrame(rows, "g string, sub int, value double")
    fine = native_histogram_agg(df, ["g", "sub"])
    merged = native_histogram_merge(fine, ["g"])
    direct = native_histogram_agg(df, ["g"])
    a = {(r.bucket, r["count"]) for r in merged.collect()}
    b = {(r.bucket, r["count"]) for r in direct.collect()}
    assert a == b
    qa = histogram_quantile_native(merged, ["g"], 0.9).collect()[0].value
    qb = histogram_quantile_native(direct, ["g"], 0.9).collect()[0].value
    assert qa == qb


def test_stddev_stdvar_bucket_midpoint_contract(spark):
    """histogram_stddev/stdvar: observations assumed at the GEOMETRIC
    bucket midpoint sqrt(lower*upper) = gamma^(i-0.5) (upstream
    funcHistogramStdDev for standard exponential buckets, Prometheus
    3.x; arithmetic midpoints are custom-bucket-only), deviation from
    the true mean (carried sum/count), count-weighted — recomputed
    here independently in Python from the same bucket layout."""
    vals = [0.5, 1.0, 2.0, 4.0, -1.0, 0.0]
    df = _df(spark, vals)
    sk = native_histogram_agg(df, ["g"])
    st = native_histogram_stats(df, ["g"])
    from lakerunner_spark.operators.native_histogram import (
        histogram_stddev_stdvar,
    )

    row = histogram_stddev_stdvar(sk, st, ["g"]).collect()[0]
    g = gamma_for_schema(DEFAULT_SCHEMA)
    mean = sum(vals) / len(vals)

    def mid(v):
        if v == 0:
            return 0.0
        i = math.ceil(math.log(abs(v)) / math.log(g))
        geo = math.sqrt(g ** (i - 1) * g ** i)
        return geo if v > 0 else -geo

    var = sum((mid(v) - mean) ** 2 for v in vals) / len(vals)
    assert row.h_stdvar == pytest.approx(var, rel=1e-9)
    assert row.h_stddev == pytest.approx(math.sqrt(var), rel=1e-9)


def test_quantile_exponential_interpolation_exact(spark):
    """PR #14677: the in-bucket interpolation is exponential — with 4
    equal samples in ONE positive bucket, the median must sit at
    gamma^(i-1+0.5) (log-space midpoint), NOT at the linear midpoint
    (lower+upper)/2; mirrored for a negative bucket."""
    g = gamma_for_schema(DEFAULT_SCHEMA)
    i = 17
    inside = math.sqrt(g ** (i - 1) * g ** i)  # strictly inside bucket i
    df = _df(spark, [inside] * 4)
    sk = native_histogram_agg(df, ["g"])
    got = histogram_quantile_native(sk, ["g"], 0.5).collect()[0].value
    assert got == pytest.approx(g ** (i - 1 + 0.5), rel=1e-12)
    linear = (g ** (i - 1) + g ** i) / 2
    assert got != pytest.approx(linear, rel=1e-9)

    dfn = _df(spark, [-inside] * 4)
    skn = native_histogram_agg(dfn, ["g"])
    gotn = histogram_quantile_native(skn, ["g"], 0.5).collect()[0].value
    assert gotn == pytest.approx(-(g ** (i - 0.5)), rel=1e-12)


def test_fraction_exponential_overlap_exact(spark):
    """Log-space overlap: with all samples in one positive bucket i,
    fraction(lower, gamma^(i-0.75)) must be 0.25 (a quarter of the
    bucket's LOG width), where the linear overlap would be
    (gamma^-0.75-gamma^-1)/(1-gamma^-1) of it."""
    g = gamma_for_schema(DEFAULT_SCHEMA)
    i = 9
    inside = math.sqrt(g ** (i - 1) * g ** i)
    df = _df(spark, [inside] * 8)
    sk = native_histogram_agg(df, ["g"])
    got = (
        histogram_fraction(sk, ["g"], g ** (i - 1), g ** (i - 0.75))
        .collect()[0]
        .fraction
    )
    assert got == pytest.approx(0.25, rel=1e-9)


def test_downscale_equals_direct_coarse_build(spark):
    """ceil(ceil(x)/2^k) = ceil(x/2^k): re-bucketing a schema-5
    histogram down to schema 3 must reproduce the direct schema-3
    build bucket for bucket, mixed signs and zeros included."""
    import random

    from lakerunner_spark.operators.native_histogram import nh_downscale

    rng = random.Random(7)
    vals = [0.0] + [
        (10.0 ** rng.uniform(-6, 6)) * rng.choice([1.0, -1.0])
        for _ in range(300)
    ]
    df = _df(spark, vals)
    fine = native_histogram_agg(df, ["g"], schema=5)
    down = nh_downscale(fine, ["g"], steps=2)
    direct = native_histogram_agg(df, ["g"], schema=3)
    a = {(r.bucket, r["count"]) for r in down.collect()}
    b = {(r.bucket, r["count"]) for r in direct.collect()}
    assert a == b


def test_mixed_merge_target_schema_pins_fine_only_groups(spark):
    """The pqs48 hazard: with per-group-min resolution, a group whose
    series are ALL at the finer schema stays fine, and a downstream
    evaluation hardcoding the coarse gamma silently mis-scales it.
    target_schema= pins every group; a fine-only group downscales to
    the target and equals a direct coarse build; a row coarser than
    the target raises."""
    import random

    import pytest

    from lakerunner_spark.operators.native_histogram import (
        native_histogram_merge_mixed,
    )

    rng = random.Random(29)
    vals = [10.0 ** rng.uniform(-2, 2) for _ in range(80)]
    fine_only = native_histogram_agg(
        _df(spark, vals, group="only_fine"), ["g"], schema=5
    ).withColumn("schema", F.lit(5))
    merged = native_histogram_merge_mixed(
        fine_only, ["g"], target_schema=3
    )
    assert {r.schema for r in merged.select("schema").collect()} == {3}
    direct = native_histogram_agg(
        _df(spark, vals, group="only_fine"), ["g"], schema=3
    )
    a = {(r.bucket, r["count"]) for r in merged.collect()}
    b = {(r.bucket, r["count"]) for r in direct.collect()}
    assert a == b

    too_coarse = native_histogram_agg(
        _df(spark, vals), ["g"], schema=2
    ).withColumn("schema", F.lit(2))
    with pytest.raises(Exception, match="coarser than target"):
        native_histogram_merge_mixed(
            too_coarse, ["g"], target_schema=3
        ).collect()


def test_mixed_schema_merge_resolves_to_coarsest(spark):
    """native_histogram_merge_mixed: two sub-series built at schemas 5
    and 3 merge into one group at schema 3, equal to building ALL the
    samples directly at schema 3 (upstream's reduce-to-lowest-schema
    merge); quantiles evaluated at the resolved schema agree."""
    import random

    from lakerunner_spark.operators.native_histogram import (
        native_histogram_merge_mixed,
    )

    rng = random.Random(13)
    fine_vals = [10.0 ** rng.uniform(-3, 3) for _ in range(150)]
    coarse_vals = [10.0 ** rng.uniform(-3, 3) for _ in range(150)]
    fine = native_histogram_agg(
        _df(spark, fine_vals), ["g"], schema=5
    ).withColumn("schema", F.lit(5))
    coarse = native_histogram_agg(
        _df(spark, coarse_vals), ["g"], schema=3
    ).withColumn("schema", F.lit(3))
    merged = native_histogram_merge_mixed(
        fine.unionByName(coarse), ["g"]
    )
    schemas = {r.schema for r in merged.select("schema").distinct().collect()}
    assert schemas == {3}
    direct = native_histogram_agg(
        _df(spark, fine_vals + coarse_vals), ["g"], schema=3
    )
    a = {(r.bucket, r["count"]) for r in merged.collect()}
    b = {(r.bucket, r["count"]) for r in direct.collect()}
    assert a == b
    qa = (
        histogram_quantile_native(merged.drop("schema"), ["g"], 0.9, schema=3)
        .collect()[0]
        .value
    )
    qb = histogram_quantile_native(direct, ["g"], 0.9, schema=3).collect()[0].value
    assert qa == qb


def test_bucket_index_cross_engine_fuzz(spark):
    """The sketch family's oracle-parity story rests on ceil(ln(x)/lg)
    agreeing between Spark (JVM Math.log) and DuckDB (libm log) — fuzz
    the TRUE contract directly, at two schemas over ~18 decades, both
    signs, and exact zeros:

    - GENERIC doubles (the random sweep) index identically, bit for
      bit — this is what every registered sketch/histogram oracle
      relies on, now asserted on 400 fresh values instead of only the
      corpus the queries happen to scan;
    - values sitting within an ulp of an EXACT bucket boundary
      (x = gamma^i computed in floating point) may legitimately land
      one bucket apart, because the engines' ln() differ in the final
      ulp exactly there (measure-zero inputs; this fuzz DID surface a
      real divergence at gamma^-1, schema 3). For those, assert the
      divergence is bounded to ±1 bucket — the documented contract."""
    import duckdb

    import random

    from lakerunner_spark.operators.native_histogram import (
        gamma_for_schema,
        nh_bucket_index,
        nh_bucket_index_sql,
    )

    rng = random.Random(42)
    generic = [0.0]
    for _ in range(400):
        mag = 10.0 ** rng.uniform(-9, 9)
        generic.append(mag * rng.choice([1.0, -1.0]))
    boundary = []
    for s in (0, 3):
        g = gamma_for_schema(s)
        for i in (-40, -1, 0, 1, 13, 200):
            boundary.extend(
                [g ** i, g ** i * (1 + 1e-15), g ** i * (1 - 1e-15)]
            )
    vals = generic + boundary
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    con = duckdb.connect()
    for s in (0, 3):
        gamma = gamma_for_schema(s)
        got = [
            r.b
            for r in df.select(nh_bucket_index("v", gamma).alias("b"))
            .collect()
        ]
        sql_b = nh_bucket_index_sql("v", gamma)
        exp = [
            r[0]
            for r in con.execute(
                f"SELECT {sql_b} FROM (SELECT unnest(?) AS v)", [vals]
            ).fetchall()
        ]
        n_gen = len(generic)
        assert got[:n_gen] == exp[:n_gen], (
            f"schema {s}: generic doubles bucket differently — the "
            "oracle-parity foundation is broken"
        )
        for i in range(n_gen, len(vals)):
            assert abs(got[i] - exp[i]) <= 1, (
                f"schema {s}: boundary value {vals[i]!r} diverged by "
                f"more than one bucket ({got[i]} vs {exp[i]})"
            )
