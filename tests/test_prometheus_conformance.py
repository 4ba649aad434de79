"""Prometheus-conformance sweep: table-driven cases derived from the
upstream promql test suite (prometheus/promql/promqltest/testdata/
aggregators.test, operators.test, functions.test, histograms.test —
expectations re-derived by hand from the documented semantics).

Where this engine deliberately diverges from upstream Prometheus it
does so to follow the REFERENCE's semantics; every divergent case is
marked ``diverges=`` with the reason and is also documented in
README.md's "ADR: Prometheus conformance divergences" section. The
divergence classes:

1. bucket-average sampling — the engine evaluates over step-bucket
   aggregates (sum/count/min/max), not raw samples with a 5m lookback;
   there are no staleness markers (reference leaf_node.go semantics).
2. no extrapolation — rate/increase/delta are windowed sums/differences
   without Prometheus's boundary extrapolation (sql_builder.go rate
   semantics; values are pre-aggregated deltas).
3. counter resets are NOT corrected — ingested values are treated as
   already-deltas (reference rewrite semantics), so decreasing raw
   counters are the caller's responsibility.
4. topk/bottomk skip NaN entirely (reference top_k_node.go collects
   finite entries only; upstream ranks NaN below every value), and rank
   globally per bucket even under by() (reference parser drops
   grouping for topk/bottomk).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lakerunner_spark.promql.compiler import (
    LeafSource,
    MetricCatalog,
    compile_promql,
)

STEP = 60_000
NAN = float("nan")
INF = float("inf")

# series data: metric -> rows of (ts, l, value); the "h" histogram
# metric carries (ts, l, le, value)
M3 = [(0, "a", 1.0), (0, "b", 2.0), (0, "c", 3.0)]
M_DUP = [(0, "a", 1.0), (0, "b", 1.0), (0, "c", 2.0)]
M_NAN = [(0, "a", NAN), (0, "b", 2.0)]
M_NEG = [(0, "a", -1.5), (0, "b", 0.0), (0, "c", 2.5)]
N2 = [(0, "a", 10.0), (0, "b", 20.0)]

# range series: one sample exactly on each step-bucket boundary, so the
# bucket average equals the raw sample and range windows are exact
def _ts_series(vals, label="a"):
    return [(i * STEP, label, float(v)) for i, v in enumerate(vals)]


CASES = [
    # -- aggregators (upstream aggregators.test) ------------------------
    dict(name="sum", expr="sum(m)", m=M3, expect={(): 6.0}),
    dict(name="avg", expr="avg(m)", m=M3, expect={(): 2.0}),
    dict(name="min", expr="min(m)", m=M3, expect={(): 1.0}),
    dict(name="max", expr="max(m)", m=M3, expect={(): 3.0}),
    dict(name="count", expr="count(m)", m=M3, expect={(): 3.0}),
    dict(
        name="stddev_pop",
        expr="stddev(m)",
        m=M3,
        expect={(): math.sqrt(2.0 / 3.0)},
    ),
    dict(name="stdvar_pop", expr="stdvar(m)", m=M3, expect={(): 2.0 / 3.0}),
    dict(name="group_one", expr="group(m)", m=M3, expect={(): 1.0}),
    dict(
        name="sum_by",
        expr="sum by (l) (m)",
        m=M3,
        expect={("a",): 1.0, ("b",): 2.0, ("c",): 3.0},
    ),
    dict(
        name="count_values",
        expr='count_values("v", m)',
        m=M_DUP,
        expect={("1",): 2.0, ("2",): 1.0},
    ),
    dict(
        name="quantile_interp",
        expr="quantile(0.5, m)",
        m=M3,
        expect={(): 2.0},
    ),
    dict(
        name="quantile_interp_09",
        expr="quantile(0.9, m)",
        m=M3,
        expect={(): 2.8},
    ),
    dict(
        name="topk2",
        expr="topk(2, m)",
        m=M3,
        expect={("b",): 2.0, ("c",): 3.0},
    ),
    dict(name="bottomk1", expr="bottomk(1, m)", m=M3, expect={("a",): 1.0}),
    dict(
        name="topk_nan_skipped",
        expr="topk(2, m)",
        m=M_NAN,
        expect={("b",): 2.0},
        diverges="upstream ranks NaN below all values and would return "
        "both series; the reference collects finite entries only "
        "(top_k_node.go), so NaN never occupies a slot — ADR class 4",
    ),
    # -- binary operators (upstream operators.test) ---------------------
    dict(
        name="vector_add_match",
        expr="m + n",
        m=M3,
        n=N2,
        expect={("a",): 11.0, ("b",): 22.0},
    ),
    dict(
        name="scalar_mul",
        expr="m * 2",
        m=M3,
        expect={("a",): 2.0, ("b",): 4.0, ("c",): 6.0},
    ),
    dict(
        name="scalar_sub_left",
        expr="2 - m",
        m=M3,
        expect={("a",): 1.0, ("b",): 0.0, ("c",): -1.0},
    ),
    dict(
        name="cmp_filter",
        expr="m > 1.5",
        m=M3,
        expect={("b",): 2.0, ("c",): 3.0},
    ),
    dict(
        name="cmp_bool",
        expr="m > bool 1.5",
        m=M3,
        expect={("a",): 0.0, ("b",): 1.0, ("c",): 1.0},
    ),
    dict(
        name="pow_right_assoc",
        expr="m ^ 3 ^ 2",
        m=[(0, "a", 2.0)],
        expect={("a",): 512.0},
    ),
    dict(
        name="atan2_binop",
        expr="m atan2 n",
        m=M3,
        n=N2,
        expect={
            ("a",): math.atan2(1.0, 10.0),
            ("b",): math.atan2(2.0, 20.0),
        },
    ),
    dict(
        name="mod_op",
        expr="m % 2",
        m=M3,
        expect={("a",): 1.0, ("b",): 0.0, ("c",): 1.0},
    ),
    dict(
        name="set_or",
        expr="m or n",
        m=[(0, "c", 3.0)],
        n=N2,
        expect={("a",): 10.0, ("b",): 20.0, ("c",): 3.0},
    ),
    dict(
        name="set_and",
        expr="m and n",
        m=M3,
        n=N2,
        expect={("a",): 1.0, ("b",): 2.0},
    ),
    dict(
        name="set_unless",
        expr="m unless n",
        m=M3,
        n=N2,
        expect={("c",): 3.0},
    ),
    # -- functions (upstream functions.test) ----------------------------
    dict(
        name="abs",
        expr="abs(m)",
        m=M_NEG,
        expect={("a",): 1.5, ("b",): 0.0, ("c",): 2.5},
    ),
    dict(
        name="ceil_floor",
        expr="ceil(m) + floor(m)",
        m=[(0, "a", 1.5)],
        expect={("a",): 3.0},  # ceil(1.5)=2, floor(1.5)=1
    ),
    dict(
        name="sqrt_negative_nan",
        expr="sqrt(m)",
        m=[(0, "a", -1.0)],
        expect={("a",): NAN},
    ),
    dict(
        name="ln_zero_neg_inf",
        expr="ln(m)",
        m=[(0, "a", 0.0)],
        expect={("a",): -INF},
    ),
    dict(
        name="exp_zero",
        expr="exp(m)",
        m=[(0, "a", 0.0)],
        expect={("a",): 1.0},
    ),
    dict(
        name="sgn",
        expr="sgn(m)",
        m=M_NEG,
        expect={("a",): -1.0, ("b",): 0.0, ("c",): 1.0},
    ),
    dict(
        name="clamp",
        expr="clamp(m, 2, 2.5)",
        m=M3,
        expect={("a",): 2.0, ("b",): 2.0, ("c",): 2.5},
    ),
    dict(
        name="round_tie_up",
        expr="round(m, 0.5)",
        m=[(0, "a", 1.25), (0, "b", -1.25)],
        expect={("a",): 1.5, ("b",): -1.0},
    ),
    # -- range functions over exact-grid series -------------------------
    # deriv/predict_linear are least-squares in upstream too, so exact
    # linear data matches bit-for-bit despite the bucket convention
    dict(
        name="deriv_linear",
        expr="deriv(m[3m])",
        m=_ts_series([0, 10, 20, 30]),
        at=3 * STEP,
        expect={("a",): 10.0 / 60.0},
    ),
    dict(
        name="predict_linear_exact",
        expr="predict_linear(m[3m], 60)",
        m=_ts_series([0, 10, 20, 30]),
        at=3 * STEP,
        expect={("a",): 40.0},
    ),
    dict(
        name="changes_window",
        expr="changes(m[3m])",
        m=_ts_series([1, 1, 2, 2, 3]),
        at=4 * STEP,
        # window at 4m = {2, 2, 3} -> one change; matches upstream's
        # left-open window on exact-grid data (see resets_window)
        expect={("a",): 1.0},
    ),
    dict(
        # on exact-grid data the engine's inclusive bucket window
        # [t-range+step, t] holds the same samples as upstream's
        # left-open (t-range, t], so resets/changes conform here:
        # window at 3m = {3, 4, 2} -> one reset (4 -> 2)
        name="resets_window",
        expr="resets(m[3m])",
        m=_ts_series([5, 3, 4, 2]),
        at=3 * STEP,
        expect={("a",): 1.0},
    ),
    dict(
        # NaN contract (explicit isnan logic in range_agg.py, the
        # upstream 3.x behavior): NaN<->number differs, NaN<->NaN does
        # not — window at 3m = {nan, nan, 1}: nan->nan no change,
        # nan->1 one change
        name="changes_nan_pair_not_counted",
        expr="changes(m[3m])",
        m=_ts_series([1, float("nan"), float("nan"), 1]),
        at=3 * STEP,
        expect={("a",): 1.0},
    ),
    dict(
        # resets NaN contract (explicit in range_agg.py, the upstream
        # 3.x funcResets shape): a decrease between numbers, or
        # recovering from a NaN gap (NaN -> number), counts.
        # window at 3m = {nan, 3, 4}
        name="resets_nan_to_number_counts",
        expr="resets(m[3m])",
        m=_ts_series([5, float("nan"), 3, 4]),
        at=3 * STEP,
        expect={("a",): 1.0},
    ),
    dict(
        # ...but number -> NaN is NOT a reset (cur NaN fails both
        # arms); window at 2m = {2, 3, nan}
        name="resets_number_to_nan_not_counted",
        expr="resets(m[3m])",
        m=_ts_series([2, 3, float("nan")]),
        at=2 * STEP,
        expect={("a",): 0.0},
    ),
    dict(
        # upstream's min/max_over_time accumulator loop skips NaN
        # unless the whole window is NaN (the `IsNaN(acc)` replace
        # pattern); this engine's bucket pre-aggregates propagate NaN
        # (both Spark and DuckDB order NaN greatest, so the bucket max
        # IS NaN once any sample is) — documented divergence, ADR
        # class 1: evaluation over bucket aggregates, not raw samples
        name="max_over_time_nan_propagates",
        expr="max_over_time(m[3m])",
        m=_ts_series([1, float("nan"), 3]),
        at=2 * STEP,
        expect={("a",): NAN},
        diverges="upstream ignores NaN in min/max_over_time except "
        "all-NaN windows (returns 3.0 here); the engine's step-bucket "
        "min/max pre-aggregates propagate NaN — ADR class 1",
    ),
    dict(
        # min_over_time on the same data CONFORMS: NaN orders greatest
        # in both engines, so the bucket/window min ignores it exactly
        # like upstream's accumulator does
        name="min_over_time_nan_ignored",
        expr="min_over_time(m[3m])",
        m=_ts_series([3, float("nan"), 1]),
        at=2 * STEP,
        expect={("a",): 1.0},
    ),
    dict(
        name="increase_no_extrapolation",
        expr="increase(m[2m])",
        m=_ts_series([1, 2, 3]),
        at=2 * STEP,
        # engine: windowed sum of the trailing range's bucket sums
        # = 2 + 3 = 5
        expect={("a",): 5.0},
        diverges="upstream increase extrapolates the counter difference "
        "(~2.0 here); this engine sums the window's pre-aggregated "
        "deltas (reference sql_builder.go rate semantics: stored values "
        "are already deltas) — ADR classes 2 and 3",
    ),
    # -- more upstream-derived cases ------------------------------------
    dict(
        name="label_replace_capture",
        # upstream: label_replace(up, "foo", "$1", "instance", "(.*):.*")
        expr='label_replace(m, "foo", "$1", "l", "(.*)-(.*)")',
        m=[(0, "host-9090", 4.0)],
        expect_label="foo",
        expect={("host", "host-9090"): 4.0},
    ),
    dict(
        name="label_replace_no_match_keeps_series",
        expr='label_replace(m, "foo", "$1", "l", "nomatch(.*)")',
        m=[(0, "a", 1.0)],
        expect_label="foo",
        expect={(None, "a"): 1.0},
    ),
    dict(
        name="clamp_min_max",
        expr="clamp_min(m, 1.5) + clamp_max(m, 1.5)",
        m=M3,
        expect={("a",): 1.5 + 1.0, ("b",): 2.0 + 1.5, ("c",): 3.0 + 1.5},
    ),
    dict(
        name="avg_by",
        expr="avg by (l) (m or n)",
        m=M3,
        n=N2,
        expect={("a",): 1.0, ("b",): 2.0, ("c",): 3.0},
    ),
    dict(
        name="unless_empty_right",
        expr='m unless (m > 100)',
        m=M3,
        expect={("a",): 1.0, ("b",): 2.0, ("c",): 3.0},
    ),
    dict(
        name="arith_precedence",
        # * binds tighter than +: 1 + v*2
        expr="1 + m * 2",
        m=[(0, "a", 3.0)],
        expect={("a",): 7.0},
    ),
    dict(
        name="unary_minus",
        expr="0 - m",
        m=M_NEG,
        expect={("a",): 1.5, ("b",): 0.0, ("c",): -2.5},
    ),
    dict(
        name="division_by_zero_drops",
        # PromQL vector/vector division by zero drops the sample
        expr="m / n",
        m=[(0, "a", 1.0), (0, "b", 2.0)],
        n=[(0, "a", 0.0), (0, "b", 4.0)],
        expect={("b",): 0.5},
    ),
    dict(
        name="scalar_division_by_zero_drops",
        expr="m / 0",
        m=[(0, "a", 1.0)],
        expect={},
        diverges="upstream is IEEE (+Inf by sign, NaN for 0/0); the "
        "reference's applyArith drops /0 samples (binary_node.go) and "
        "this engine mirrors it for both vector and scalar divisors — "
        "ADR class 6",
    ),
    dict(
        name="timestamp_fn",
        expr="timestamp(m)",
        m=[(120_000, "a", 5.0)],
        at=120_000,
        expect={("a",): 120.0},
    ),
    dict(
        name="agg_without",
        expr="sum without (l) (m)",
        m=M3,
        expect={(): 6.0},
    ),
    dict(
        name="bool_eq_nan",
        # NaN == bool NaN is 0 (IEEE: NaN compares unequal)
        expr="m == bool m",
        m=[(0, "a", NAN)],
        expect={("a",): 0.0},
    ),
    # -- time() and date components (upstream functions.test) -----------
    dict(
        name="time_minus_vector",
        expr="time() - m",
        m=[(3_600_000, "a", 120.0)],
        at=3_600_000,
        expect={("a",): 3480.0},
    ),
    dict(
        name="vector_cmp_time",
        expr="m > time()",
        m=[(60_000, "a", 10.0), (60_000, "b", 1e9)],
        at=60_000,
        expect={("b",): 1e9},
    ),
    dict(
        name="hour_of_vector",
        # 1706572800 = 2024-01-30T00:00:00Z; +7200 -> 02:00
        expr="hour(m)",
        m=[(0, "a", 1706572800.0 + 7200.0)],
        expect={("a",): 2.0},
    ),
    dict(
        name="day_of_week_tuesday",
        expr="day_of_week(m)",
        m=[(0, "a", 1706572800.0)],  # 2024-01-30 is a Tuesday
        expect={("a",): 2.0},
    ),
    dict(
        name="days_in_month_leap_feb",
        expr="days_in_month(m)",
        m=[(0, "a", 1707000000.0)],  # 2024-02-03; Feb 2024 has 29 days
        expect={("a",): 29.0},
    ),
    dict(
        name="month_year_minute",
        expr="month(m) + 100 * year(m) + 10000 * minute(m)",
        m=[(0, "a", 1706572980.0)],  # 2024-01-30T00:03:00Z
        expect={("a",): 1.0 + 100 * 2024.0 + 10000 * 3.0},
    ),
    dict(
        name="day_of_year",
        expr="day_of_year(m)",
        m=[(0, "a", 1706572800.0)],  # Jan 30 -> 30
        expect={("a",): 30.0},
    ),
    dict(
        name="idelta_pairs",
        expr="idelta(m[3m])",
        m=_ts_series([1, 4, 9]),
        at=2 * STEP,
        expect={("a",): 5.0},
    ),
    # -- histogram_quantile (upstream histograms.test) ------------------
    dict(
        name="histogram_quantile_interp",
        # the le-bucket interpolation path takes a computed vector
        # (the bare-selector form serves cooked value-distributions,
        # quantile_node.go semantics — ADR class 5)
        expr="histogram_quantile(0.5, sum by (l, le) (h))",
        h=[(0, "x", "0.1", 1.0), (0, "x", "0.2", 2.0), (0, "x", "+Inf", 3.0)],
        expect={("x",): 0.15},
    ),
    # -- NaN handling in min/max (upstream aggregation loop replaces a
    # NaN accumulator: `if h.value < v || math.IsNaN(h.value)`) --------
    dict(
        name="max_ignores_nan",
        expr="max(m)",
        m=[(0, "a", NAN), (0, "b", 2.0), (0, "c", 5.0)],
        expect={(): 5.0},
    ),
    dict(
        name="min_ignores_nan",
        expr="min(m)",
        m=[(0, "a", NAN), (0, "b", 2.0), (0, "c", 5.0)],
        expect={(): 2.0},
    ),
    dict(
        name="max_all_nan_is_nan",
        expr="max(m)",
        m=[(0, "a", NAN), (0, "b", NAN)],
        expect={(): NAN},
    ),
    dict(
        name="sum_propagates_nan",
        expr="sum(m)",
        m=[(0, "a", NAN), (0, "b", 2.0)],
        expect={(): NAN},
    ),
    # -- round: non-finite values pass through (Spark floor() returns
    # LONG, which would turn NaN into 0 without the guard) --------------
    dict(
        name="round_nan_propagates",
        expr="round(m, 0.5)",
        m=[(0, "a", NAN), (0, "b", 2.2), (0, "c", INF)],
        expect={("a",): NAN, ("b",): 2.0, ("c",): INF},
    ),
    # -- clamp with min > max drops every element (funcClamp returns
    # enh.Out unchanged) -------------------------------------------------
    dict(
        name="clamp_min_over_max_empty",
        expr="clamp(m, 3, 1)",
        m=M3,
        expect={},
    ),
    # -- negative offset looks forward (default since Prometheus 3.0) ---
    dict(
        name="negative_offset",
        expr="m offset -1m",
        m=_ts_series([1, 2, 3]),
        at=0,
        expect={("a",): 2.0},
    ),
    # -- scalar(): exactly one element -> value, else NaN (funcScalar) --
    dict(
        name="scalar_single_series",
        expr="scalar(m) + 1",
        m=[(0, "a", 4.0)],
        expect={(): 5.0},
    ),
    dict(
        name="scalar_multi_series_nan",
        expr="scalar(m) + 1",
        m=M3,
        expect={(): NAN},
    ),
    # -- sum/avg PROPAGATE NaN (only min/max skip it: upstream's
    # aggregation loop special-cases the comparison aggregators) ------
    dict(
        name="sum_propagates_nan",
        expr="sum(m)",
        m=M_NAN,
        expect={(): NAN},
    ),
    dict(
        name="avg_propagates_nan",
        expr="avg(m)",
        m=M_NAN,
        expect={(): NAN},
    ),
    # -- explicit on()/ignoring() matching ----------------------------
    dict(
        name="binop_on_label",
        expr="m + on(l) n",
        m=[(0, "a", 1.0), (0, "b", 2.0)],
        n=[(0, "a", 10.0), (0, "b", 20.0)],
        expect={("a",): 11.0, ("b",): 22.0},
    ),
    dict(
        name="binop_ignoring_label_collapses",
        # ignoring(l) leaves an EMPTY match key: legal only while each
        # side has one element per key — single-series fixtures here
        expr="m + ignoring(l) n",
        m=[(0, "a", 1.0)],
        n=[(0, "b", 20.0)],
        expect={(): 21.0},
    ),
    # -- label_join (concatenation of source labels) ------------------
    dict(
        name="label_join_concat",
        expr='label_join(m, "joined", "-", "l", "l")',
        m=[(0, "a", 1.0)],
        # label cols sort alphabetically in the compare key: (joined, l)
        expect={("a-a", "a"): 1.0},
    ),
]


def _build_catalog(spark, case):
    srcs = {}
    for metric in ("m", "n"):
        rows = case.get(metric)
        if rows is not None:
            df = spark.createDataFrame(
                rows, "chq_timestamp LONG, l STRING, value DOUBLE"
            )
            srcs[metric] = LeafSource(df=df, labels=["l"])
    if case.get("h") is not None:
        df = spark.createDataFrame(
            case["h"],
            "chq_timestamp LONG, l STRING, le STRING, value DOUBLE",
        )
        srcs["h"] = LeafSource(df=df, labels=["l", "le"])
    return MetricCatalog(srcs)


def _collect(df, at):
    rows = df.filter(F.col("bucket_ts") == at).collect()
    label_cols = sorted(set(df.columns) - {"bucket_ts", "value"})
    return {
        tuple(getattr(r, c) for c in label_cols): r.value for r in rows
    }


def _nan_key_ok(got, expect):
    return set(got) == set(expect)


def _same(a: float, b: float) -> bool:
    if a is None or b is None:
        return a is b
    if math.isnan(b):
        return math.isnan(a)
    if math.isinf(b):
        return a == b
    return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)


@pytest.mark.parametrize("case", CASES, ids=lambda c: c["name"])
def test_conformance(case, spark):
    cat = _build_catalog(spark, case)
    out = compile_promql(case["expr"], cat, STEP)
    got = _collect(out, case.get("at", 0))
    expect = case["expect"]
    assert set(got) == set(expect), (
        f"{case['name']}: series {set(got)} != {set(expect)}"
    )
    for k, v in expect.items():
        assert _same(got[k], v), f"{case['name']}[{k}]: {got[k]} != {v}"


def test_at_modifier(spark):
    """@ pins evaluation time (upstream at-modifier.test): the pinned
    vector broadcasts to every grid step, composes with offset, and
    start()/end() resolve against the query window; bare @ without a
    window fails closed."""
    rows = [(0, "a", 1.0), (60_000, "a", 5.0), (120_000, "a", 9.0)]
    df = spark.createDataFrame(
        rows, "chq_timestamp LONG, l STRING, value DOUBLE"
    )
    cat = MetricCatalog({"m": LeafSource(df=df, labels=["l"])})

    def run(q):
        return sorted(
            (r.bucket_ts, r.value)
            for r in compile_promql(q, cat, STEP, 0, 180_000).collect()
        )

    assert run("m @ 60") == [(0, 5.0), (60_000, 5.0), (120_000, 5.0)]
    assert run("m - m @ 0") == [(0, 0.0), (60_000, 4.0), (120_000, 8.0)]
    assert run("m @ start()") == [(0, 1.0), (60_000, 1.0), (120_000, 1.0)]
    assert run("sum(last_over_time(m[1m] @ end()))") == [
        (0, 9.0), (60_000, 9.0), (120_000, 9.0),
    ]
    # offset composes: value at (pinned 120s) - 60s = 5.0
    assert run("m @ 120 offset 1m") == [
        (0, 5.0), (60_000, 5.0), (120_000, 5.0),
    ]
    with pytest.raises(ValueError, match="explicit query window"):
        compile_promql("m @ 60", cat, STEP).collect()


def test_vector_literal_over_grid(spark):
    """vector(1) materializes a label-free constant vector over the
    explicit query grid; `m or vector(0)` fills absent buckets."""
    rows = [(60_000, "a", 5.0)]
    df = spark.createDataFrame(
        rows, "chq_timestamp LONG, l STRING, value DOUBLE"
    )
    cat = MetricCatalog({"m": LeafSource(df=df, labels=["l"])})
    got = sorted(
        (r.bucket_ts, r.value)
        for r in compile_promql(
            "vector(1)", cat, STEP, 0, 180_000
        ).collect()
    )
    assert got == [(0, 1.0), (60_000, 1.0), (120_000, 1.0)]
    # the alerting staple: sum(m) or vector(0)
    got = sorted(
        (r.bucket_ts, r.value)
        for r in compile_promql(
            "sum(m) or vector(0)", cat, STEP, 0, 180_000
        ).collect()
    )
    assert got == [(0, 0.0), (60_000, 5.0), (120_000, 0.0)]
    with pytest.raises(ValueError, match="explicit query window"):
        compile_promql("vector(1)", cat, STEP).collect()


def test_limitk_limit_ratio(spark):
    """limitk keeps exactly k series; limit_ratio(r) and
    limit_ratio(-r) partition the series set (upstream complement
    property); out-of-range ratios fail closed."""
    rows = [(0, l, float(i)) for i, l in enumerate("abcdefgh")]
    df = spark.createDataFrame(
        rows, "chq_timestamp LONG, l STRING, value DOUBLE"
    )
    cat = MetricCatalog({"m": LeafSource(df=df, labels=["l"])})
    kept = sorted(
        r.l for r in compile_promql("limitk(3, m)", cat, STEP).collect()
    )
    assert kept == ["a", "b", "c"]
    lo = {r.l for r in compile_promql("limit_ratio(0.5, m)", cat, STEP).collect()}
    hi = {r.l for r in compile_promql("limit_ratio(-0.5, m)", cat, STEP).collect()}
    assert lo | hi == set("abcdefgh") and not (lo & hi)
    with pytest.raises(ValueError, match="limit_ratio"):
        compile_promql("limit_ratio(1.5, m)", cat, STEP)
    with pytest.raises(ValueError, match="positive"):
        compile_promql("limitk(0, m)", cat, STEP)


def test_scalar_densifies_empty_steps_to_nan(spark):
    """Prometheus funcScalar evaluates at EVERY grid step: a step with
    zero samples yields NaN (never a dropped row), so arithmetic over
    scalar() propagates NaN instead of silently losing the step. With
    an explicit query window the engine densifies against the grid;
    the windowless form (no grid to densify against) keeps emitting
    observed buckets only — the documented coverage-gated deviation."""
    rows = [(60_000, "a", 4.0)]
    df = spark.createDataFrame(
        rows, "chq_timestamp LONG, l STRING, value DOUBLE"
    )
    cat = MetricCatalog({"m": LeafSource(df=df, labels=["l"])})
    got = {
        r.bucket_ts: r.value
        for r in compile_promql("scalar(m) + 1", cat, STEP, 0, 180_000).collect()
    }
    assert set(got) == {0, 60_000, 120_000}
    assert got[60_000] == 5.0
    assert math.isnan(got[0]) and math.isnan(got[120_000])
    # windowless: observed buckets only (unchanged behavior)
    wl = compile_promql("scalar(m) + 1", cat, STEP).collect()
    assert {(r.bucket_ts, r.value) for r in wl} == {(60_000, 5.0)}


def test_histogram_accessor_family_parses_and_computes(spark):
    """Native-histogram accessor functions as query text: count/sum/avg
    are the carried fields of the per-step synthesized histogram;
    stddev follows the bucket-midpoint contract; fraction bounds
    accept negative literals (unary-minus fold). Values checked
    against direct arithmetic on the fixture."""
    rows = [
        (0, "a", 1.0), (0, "a", 2.0), (0, "a", 4.0),
        (60_000, "a", 8.0),
    ]
    df = spark.createDataFrame(
        rows, "chq_timestamp LONG, l STRING, value DOUBLE"
    )
    cat = MetricCatalog({"m": LeafSource(df=df, labels=["l"])})

    def vals(q):
        return {
            r.bucket_ts: r.value for r in compile_promql(q, cat, STEP).collect()
        }

    assert vals("histogram_count(m)") == {0: 3.0, 60_000: 1.0}
    assert vals("histogram_sum(m)") == {0: 7.0, 60_000: 8.0}
    got = vals("histogram_avg(m)")
    assert got[0] == pytest.approx(7.0 / 3.0) and got[60_000] == 8.0
    # single-sample step: midpoint-vs-mean deviation is fixed, variance
    # = (mid(8)-8)^2 with the GEOMETRIC bucket midpoint gamma^(i-0.5)
    # (upstream funcHistogramStdVar for standard exponential buckets);
    # multi-sample step positive
    sv = vals("histogram_stdvar(m)")
    assert sv[0] > 0
    import math as _m
    g = 2.0 ** (2.0 ** -3)
    i = _m.ceil(_m.log(8.0) / _m.log(g))
    mid = _m.sqrt(g ** (i - 1) * g ** i)
    assert sv[60_000] == pytest.approx((mid - 8.0) ** 2, rel=1e-9)
    fr = vals("histogram_fraction(-5, 100, m)")
    assert fr[0] == pytest.approx(1.0) and fr[60_000] == pytest.approx(1.0)
    fr0 = vals("histogram_fraction(-5, 0, m)")
    assert fr0[0] == 0.0 and fr0[60_000] == 0.0
    # PR #14677 discrimination through the PARSER: the single sample 8
    # occupies one bucket (lower, upper]; a hi cutting that bucket at
    # its GEOMETRIC midpoint gamma^(i-0.5) covers exactly half the
    # bucket's LOG width -> fraction 0.5; the pre-3.x linear overlap
    # would give (sqrt(l*u)-l)/(u-l) != 0.5. Exercises the exponential
    # overlap, not just the full/empty cases above.
    lo, hi = g ** (i - 1), _m.sqrt(g ** (i - 1) * g ** i)
    frx = vals(f"histogram_fraction({lo!r}, {hi!r}, m)")
    assert frx[60_000] == pytest.approx(0.5, rel=1e-9)
    linear = (hi - lo) / (g ** i - lo)
    assert abs(frx[60_000] - linear) > 1e-4  # linear form would differ


def test_absent_emits_only_on_empty_steps(spark):
    """absent(m): 1 at every fully-covered grid step where m has no
    samples, no rows where it does (upstream funcAbsent); needs the
    explicit query window to know the grid."""
    rows = [(60_000, "a", 5.0)]
    df = spark.createDataFrame(
        rows, "chq_timestamp LONG, l STRING, value DOUBLE"
    )
    cat = MetricCatalog({"m": LeafSource(df=df, labels=["l"])})
    got = {
        r.bucket_ts: r.value
        for r in compile_promql("absent(m)", cat, STEP, 0, 180_000).collect()
    }
    assert got == {0: 1.0, 120_000: 1.0}
