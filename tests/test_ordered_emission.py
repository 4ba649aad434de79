"""O4: ordered incremental result emission (plans/ordered.py).

Reference: queryapi/metrics_evaluator.go runOrderedCoordinator —
range queries evaluate as parallel time-disjoint jobs whose results
stream to the caller strictly in time order, the first group's rows
arriving before the last group runs. These tests prove the harness
delivers exactly that on top of the compiler's start/end slicing:
(1) INCREMENTAL by construction — the last slice's execution BLOCKS
until the first slice's rows have been emitted to the consumer, so a
batch-complete implementation would fail with a timeout, never pass;
(2) ordered arrival; (3) for gate-free window functions the
concatenation equals the one-shot batch plan row for row; (4) the
documented divergence scope for coverage-gated functions (rate) is
exactly the per-slice warm-up region, nothing else.
"""

from __future__ import annotations

import threading

from pyspark.sql import functions as F

from lakerunner_spark.testdata import events_stream

_STEP = 60_000
_RANGE_MS = 300_000


def _window(spark, sf_dir):
    ev = events_stream(spark, sf_dir)
    lo, hi = ev.agg(
        F.min("chq_timestamp"), F.max("chq_timestamp")
    ).first()
    return int(lo), int(hi) + 1


def _r(v):
    return None if v is None else round(v, 6)


def test_range_slices_align_to_step():
    from lakerunner_spark.plans.ordered import range_slices

    s = range_slices(90_000, 1_000_000, 4, _STEP)
    assert s[0][0] == 90_000 and s[-1][1] == 1_000_000
    for a, _b in s[1:]:
        assert a % _STEP == 0
    for (_a0, b0), (a1, _b1) in zip(s, s[1:]):
        assert b0 == a1  # contiguous, non-overlapping


def test_emission_is_incremental_and_ordered(spark):
    """The last slice cannot RUN until slice 0's rows reached the
    consumer: a batch-complete coordinator would time out here."""
    from lakerunner_spark.plans.ordered import ordered_slice_results

    slices = [(0, 10), (10, 20), (20, 30), (30, 40)]
    first_emitted = threading.Event()

    def build(lo: int, hi: int):
        if (lo, hi) == slices[-1]:
            if not first_emitted.wait(timeout=120):
                raise RuntimeError("emission is not incremental")
        return spark.range(lo, hi).select(F.col("id"))

    seen, rows_total = [], 0
    for idx, lo, hi, rows in ordered_slice_results(build, slices,
                                                   max_parallel=3):
        if idx == 0:
            first_emitted.set()
        seen.append(idx)
        rows_total += len(rows)
        assert all(lo <= r["id"] < hi for r in rows)
    assert seen == [0, 1, 2, 3]
    assert rows_total == 40


import pytest


@pytest.mark.parametrize(
    "q",
    [
        # instant vector: no window at all — slices trivially disjoint
        "sum by (event_type) (events)",
        # irate: UNGATED pair function (range_agg.py keeps irate/idelta
        # outside the coverage gate) whose lag(1) at a slice's first
        # bucket must come from the LOOKBACK rows — exactness here
        # proves the lookback widening end to end
        "sum by (event_type) (irate(events[5m]))",
    ],
)
def test_gate_free_slicing_equals_one_shot(spark, sf_dir, q):
    """For gate-free shapes the lookback-widened slices concatenate to
    EXACTLY the one-shot plan."""
    from lakerunner_spark.catalog import default_metric_catalog
    from lakerunner_spark.plans.ordered import promql_ordered_range
    from lakerunner_spark.promql.compiler import compile_promql

    start, end = _window(spark, sf_dir)
    cat = default_metric_catalog(spark, sf_dir)

    one_shot = compile_promql(q, cat, _STEP, start_ms=start, end_ms=end)
    expect = sorted(
        (r["bucket_ts"], r["event_type"], _r(r["value"]))
        for r in one_shot.collect()
    )
    assert expect

    got, seen = [], []
    for idx, slo, shi, rows in promql_ordered_range(
        q, cat, _STEP, start, end, n_slices=4, max_parallel=3
    ):
        seen.append(idx)
        for r in rows:
            assert slo - slo % _STEP <= r["bucket_ts"] < shi
            got.append((r["bucket_ts"], r["event_type"], _r(r["value"])))
    assert seen == [0, 1, 2, 3]
    assert sorted(got) == expect


def test_gated_rate_diverges_exactly_at_slice_warmup(spark, sf_dir):
    """rate's coverage gate ("series has >= range of history",
    leaf_node.go:357,394) is evaluated against each slice's own
    lookback-widened scan — the per-group warm-up the reference
    evaluator also has. The slice gate is provably STRICTER-OR-EQUAL
    (its observed series start can only be later), so the divergence
    is fully predictable from the one-shot's own rows: a sliced
    bucket is None exactly where the slice-local gate is off, and
    EQUAL to the one-shot everywhere the slice-local gate is on.
    This test computes that prediction per series and requires it
    bucket for bucket — no tolerance window."""
    from lakerunner_spark.catalog import default_metric_catalog
    from lakerunner_spark.plans.ordered import promql_ordered_range
    from lakerunner_spark.promql.compiler import compile_promql

    q = "rate(events[5m])"  # series granularity: the gate is per series
    start, end = _window(spark, sf_dir)
    cat = default_metric_catalog(spark, sf_dir)

    one_shot = {}
    series_buckets: dict[tuple, list[int]] = {}
    for r in compile_promql(
        q, cat, _STEP, start_ms=start, end_ms=end
    ).collect():
        s = (r["event_type"], r["user_id"])
        one_shot[(r["bucket_ts"], s)] = _r(r["value"])
        series_buckets.setdefault(s, []).append(r["bucket_ts"])
    for b in series_buckets.values():
        b.sort()

    n_checked_gated = 0
    sliced_keys = set()
    for idx, slo, shi, rows in promql_ordered_range(
        q, cat, _STEP, start, end, n_slices=4, max_parallel=3
    ):
        scan_lo = slo - _RANGE_MS  # the compiler's lookback widening
        for r in rows:
            s = (r["event_type"], r["user_id"])
            k = (r["bucket_ts"], s)
            assert k in one_shot  # a slice never invents a row
            sliced_keys.add(k)
            first_in_scan = next(
                b for b in series_buckets[s] if b >= scan_lo
            )
            gate_on = r["bucket_ts"] - first_in_scan >= _RANGE_MS - _STEP
            if gate_on:
                assert _r(r["value"]) == one_shot[k], k
            else:
                assert r["value"] is None, k
                n_checked_gated += 1
    assert sliced_keys == set(one_shot)  # same rows, values as predicted
    # the warm-up case must actually occur for this test to mean much
    assert n_checked_gated > 0


def test_range_slices_properties():
    """Hypothesis sweep: for any window and slice count, slices are
    contiguous, non-overlapping, cover [start, end) exactly, and every
    interior cut is step-aligned."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lakerunner_spark.plans.ordered import range_slices

    @settings(max_examples=200, deadline=None)
    @given(
        start=st.integers(min_value=0, max_value=10**15),
        span=st.integers(min_value=1, max_value=10**10),
        n=st.integers(min_value=1, max_value=64),
        step=st.sampled_from([1, 1000, 60_000, 300_000]),
    )
    def check(start, span, n, step):
        s = range_slices(start, start + span, n, step)
        assert s[0][0] == start and s[-1][1] == start + span
        for (a, b) in s:
            assert a < b
        for (_a0, b0), (a1, _b1) in zip(s, s[1:]):
            assert b0 == a1
            assert a1 % step == 0
        assert 1 <= len(s) <= n

    check()


def test_single_slice_is_the_one_shot_plan(spark, sf_dir):
    """n_slices=1 degenerates to the one-shot evaluation exactly —
    including for the coverage-gated rate (no slice boundary, no
    warm-up divergence)."""
    from lakerunner_spark.catalog import default_metric_catalog
    from lakerunner_spark.plans.ordered import promql_ordered_range
    from lakerunner_spark.promql.compiler import compile_promql

    q = "sum by (event_type) (rate(events[5m]))"
    start, end = _window(spark, sf_dir)
    cat = default_metric_catalog(spark, sf_dir)
    expect = sorted(
        (r["bucket_ts"], r["event_type"], _r(r["value"]))
        for r in compile_promql(
            q, cat, _STEP, start_ms=start, end_ms=end
        ).collect()
    )
    out = list(promql_ordered_range(q, cat, _STEP, start, end, n_slices=1))
    assert len(out) == 1 and out[0][0] == 0
    got = sorted(
        (r["bucket_ts"], r["event_type"], _r(r["value"]))
        for r in out[0][3]
    )
    assert got == expect
