"""Sparse-series range semantics vs a simulator of the reference algorithm.

The simulator below re-implements the *behavior* of
promql/leaf_node.go:287-430 (inferSpanMs + winSumCount eviction and
coverage) from its spec: per-series eff_span = max(step, delta to the
previous bucket), stateful eviction at ts + eff_span - range, coverage
(ts - first_kept) + eff_span, NaN until covered >= range.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lakerunner_spark.operators.range_agg import range_agg, range_agg_sparse

STEP = 10_000
RANGE = 60_000


def simulate(buckets, func, range_ms, step_ms):
    """Reference-semantics simulator for one series.

    buckets: ordered [(ts, sum, count, mn, mx)] -> {ts: value-or-nan}.
    """
    out = {}
    prev_ts = None
    entries = []  # surviving (ts, sum, count, mn, mx)
    for ts, s, c, mn, mx in buckets:
        span = step_ms if prev_ts is None or ts <= prev_ts else ts - prev_ts
        eff = max(step_ms, span)
        prev_ts = ts
        entries.append((ts, s, c, mn, mx))
        keep_from = ts + eff - range_ms
        entries = [e for e in entries if e[0] >= keep_from]
        if not entries:
            out[ts] = math.nan
            continue
        covered = (ts - entries[0][0]) + eff
        if covered < range_ms:
            out[ts] = math.nan
            continue
        ksum = sum(e[1] for e in entries)
        kcnt = sum(e[2] for e in entries)
        if func == "rate":
            out[ts] = ksum / (range_ms / 1000.0)
        elif func in ("increase", "sum_over_time"):
            out[ts] = ksum
        elif func == "count_over_time":
            out[ts] = kcnt
        elif func == "avg_over_time":
            out[ts] = ksum / kcnt if kcnt else math.nan
        elif func == "min_over_time":
            out[ts] = min(e[3] for e in entries)
        elif func == "max_over_time":
            out[ts] = max(e[4] for e in entries)
    return out


# a series that is dense, then 30s-sparse, then has a gap wider than the
# range (the self-eviction edge), then dense again
SPARSE_SERIES = [
    (t, float(i + 1), 2.0, float(i), float(10 * i))
    for i, t in enumerate(
        [0, 10_000, 20_000, 30_000, 60_000, 90_000, 120_000,
         300_000, 310_000, 320_000, 330_000, 340_000, 350_000]
    )
]

DENSE_SERIES = [
    (t * 10_000, float(t % 5 + 1), 1.0, float(t), float(t)) for t in range(12)
]


def _run_spark(spark, series_rows, func):
    df = spark.createDataFrame(
        [("s1",) + r for r in series_rows],
        "series string, bucket_ts long, sum double, count double, min double, max double",
    )
    res = range_agg_sparse(df, func, RANGE, STEP, ["series"])
    return {r["bucket_ts"]: r["value"] for r in res.collect()}


@pytest.mark.parametrize(
    "func",
    ["rate", "increase", "sum_over_time", "count_over_time",
     "avg_over_time", "min_over_time", "max_over_time"],
)
def test_sparse_matches_reference_simulation(spark, func):
    got = _run_spark(spark, SPARSE_SERIES, func)
    want = simulate(SPARSE_SERIES, func, RANGE, STEP)
    assert set(got) == set(want)
    for ts in want:
        w, g = want[ts], got[ts]
        if isinstance(w, float) and math.isnan(w):
            assert g is None, f"ts={ts}: want NaN, got {g}"
        else:
            assert g == pytest.approx(w), f"ts={ts}: want {w}, got {g}"


def test_gap_wider_than_range_self_evicts(spark):
    # bucket at 300s follows a 180s gap with range 60s: eff_span > range
    # evicts even the current bucket -> NaN
    got = _run_spark(spark, SPARSE_SERIES, "sum_over_time")
    assert got[300_000] is None


def test_dense_sparse_and_fixed_frame_agree(spark):
    """On dense data (cadence == step) the sparse path must equal the
    fixed-frame range_agg the engine uses everywhere else."""
    df = spark.createDataFrame(
        [("s1",) + r for r in DENSE_SERIES],
        "series string, bucket_ts long, sum double, count double, min double, max double",
    )
    fixed = {
        r["bucket_ts"]: r["value"]
        for r in range_agg(df, "rate", RANGE, STEP, ["series"]).collect()
    }
    sparse = {
        r["bucket_ts"]: r["value"]
        for r in range_agg_sparse(df, "rate", RANGE, STEP, ["series"]).collect()
    }
    assert set(fixed) == set(sparse)
    for ts, v in fixed.items():
        if v is None:
            assert sparse[ts] is None
        else:
            assert sparse[ts] == pytest.approx(v)
