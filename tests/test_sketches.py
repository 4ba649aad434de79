"""Sketch operator contracts (A5/A6/X4): tolerance vs exact answers and
the merge identity that makes tiered rollups sound."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakerunner_spark.operators.sketches import (
    hll_cardinality,
    hll_estimate,
    hll_sketch_merge,
    hll_sketch_rollup,
    quantile_sketch_agg,
)
from lakerunner_spark.testdata import events_stream


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return events_stream(spark, sf_dir).cache()


def test_quantile_sketch_close_to_exact(events):
    approx = {
        r.event_type: r
        for r in quantile_sketch_agg(events, ["event_type"], "value").collect()
    }
    exact = {
        r.event_type: r
        for r in events.groupBy("event_type")
        .agg(
            *[
                F.percentile("value", q).alias(f"p{int(q * 100)}")
                for q in (0.25, 0.5, 0.75, 0.9, 0.95, 0.99)
            ]
        )
        .collect()
    }
    assert set(approx) == set(exact)
    # KLL's contract is RANK error, not value error: the fraction of
    # values <= the sketch's answer must sit within eps of q.
    values = {
        et: sorted(
            r.value
            for r in events.filter(F.col("event_type") == et)
            .select("value")
            .collect()
        )
        for et in approx
    }
    for et, a in approx.items():
        vs = values[et]
        n = len(vs)
        for q, col in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75"),
                       (0.9, "p90"), (0.95, "p95"), (0.99, "p99")]:
            got = getattr(a, col)
            rank = sum(1 for v in vs if v <= got) / n
            eps = max(0.01, 2.0 / n)  # sketch eps + discreteness of small n
            assert q - eps <= rank <= q + eps, (et, col, got, rank, q)
    # and the sketch answers must be actual sample values
    for et, a in approx.items():
        assert all(getattr(a, c) in values[et] for c in ("p25", "p50", "p99"))


def test_hll_cardinality_close_to_exact(events):
    approx = {
        r.event_type: r.cardinality
        for r in hll_cardinality(events, ["event_type"], "user_id", rsd=0.02).collect()
    }
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(2, 0.05 * n), (et, approx[et], n)


def test_hll_sketch_merge_identity(events):
    """union-of-sketches == sketch-of-union: the property that lets the
    rollup chain (A2) merge tiers without raw rescans."""
    fine = hll_sketch_rollup(events, ["event_type", "user_id"], "event_id")
    merged = hll_estimate(hll_sketch_merge(fine, ["event_type"]))
    direct = hll_estimate(hll_sketch_rollup(events, ["event_type"], "event_id"))
    m = {r.event_type: r.cardinality for r in merged.collect()}
    d = {r.event_type: r.cardinality for r in direct.collect()}
    assert m == d  # identical sketch state -> identical estimate


def test_topk_two_phase_identical(spark):
    """The opt-in two-phase rank (local top-k per partition, then
    global) returns exactly the single-window result — the total order
    from the tiebreak makes the global top-k a subset of the union of
    local top-ks regardless of partitioning."""
    import random

    from lakerunner_spark.operators.vector_agg import bottomk, topk

    rng = random.Random(11)
    rows = [
        (b * 1000, f"s{i}", rng.random() * 100)
        for b in range(5)
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "bucket_ts LONG, series STRING, value DOUBLE"
    ).repartition(16)
    for fn in (topk, bottomk):
        one = {(r.bucket_ts, r.series) for r in fn(df, 7, two_phase=False).collect()}
        two = {(r.bucket_ts, r.series) for r in fn(df, 7, two_phase=True).collect()}
        assert one == two and len(one) == 35


def test_topk_auto_routes_by_cardinality(spark):
    """The phase router (two_phase=None default): per-bucket series
    count >= threshold flips the plan to two-phase automatically —
    visible as the spark_partition_id local-rank stage — while
    low-cardinality inputs keep the single-window plan byte-identical
    to two_phase=False. Results are identical either way."""
    import random

    from lakerunner_spark.operators.vector_agg import topk

    rng = random.Random(7)
    rows = [
        (b * 1000, f"s{i}", rng.random() * 100)
        for b in range(3)
        for i in range(500)
    ]
    df = spark.createDataFrame(
        rows, "bucket_ts LONG, series STRING, value DOUBLE"
    ).repartition(8)

    def plan(d):
        import re

        # strip expression/plan ids — allocation order differs per call
        s = d._jdf.queryExecution().executedPlan().toString()
        return re.sub(r"plan_id=\d+", "plan_id=", re.sub(r"#\d+", "#", s))

    # high cardinality relative to the threshold -> auto flips to
    # two-phase (threshold lowered so the fixture stays test-sized;
    # the ratio is what the router sees)
    auto_hi = topk(df, 5, two_phase_threshold=100)
    assert "SPARK_PARTITION_ID" in plan(auto_hi).upper()
    # below threshold -> single phase, same plan as the explicit flag
    auto_lo = topk(df, 5)  # default threshold: 500 << 1M
    assert "SPARK_PARTITION_ID" not in plan(auto_lo).upper()
    assert plan(auto_lo) == plan(topk(df, 5, two_phase=False))
    # identical rows from all three
    expected = {(r.bucket_ts, r.series) for r in auto_lo.collect()}
    assert {(r.bucket_ts, r.series) for r in auto_hi.collect()} == expected


def test_topk_probe_is_cached_per_plan(spark):
    """The auto-router's cardinality probe is memoized per (child
    plan, bucket column): building topk twice over the same child runs
    the probe jobs once (plans/probe_cache.py). The probe is a routing
    hint only, so cache staleness can never change result rows — also
    asserted here by comparing both constructions' output."""
    from lakerunner_spark.operators.vector_agg import topk
    from lakerunner_spark.plans import probe_cache

    rows = [(b * 1000, f"s{i}", float(i)) for b in range(2) for i in range(50)]
    df = spark.createDataFrame(
        rows, "bucket_ts LONG, series STRING, value DOUBLE"
    )
    probe_cache.clear_cache()
    calls = {"n": 0}
    orig = probe_cache.cached_probe

    def counting(d, tag, compute):
        def wrapped():
            calls["n"] += 1
            return compute()
        return orig(d, tag, wrapped)

    import lakerunner_spark.plans.probe_cache as pc
    old = pc.cached_probe
    pc.cached_probe = counting
    try:
        a = topk(df, 3).collect()
        b = topk(df, 3).collect()
    finally:
        pc.cached_probe = old
        probe_cache.clear_cache()
    assert calls["n"] == 1, f"probe ran {calls['n']} times, expected 1"
    assert {(r.bucket_ts, r.series) for r in a} == {
        (r.bucket_ts, r.series) for r in b
    }
