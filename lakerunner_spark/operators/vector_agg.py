"""Vector aggregation (A7) and topk/bottomk (A8/W2).

Reference: promql/agg_node.go:30-314 — second-stage aggregation over
series at each bucket; ``by`` keeps listed labels, ``without`` drops
them from the group key. promql/top_k_node.go:25-100 keeps k series per
bucket ordered by value.

Spark-first: plain groupBy for by/without (the compiler resolves the
concrete column set — Spark needs static columns), and a ranking window
for topk. Both stay in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _var_pop(c):
    """Population variance via explicit windowed-sum formula (not
    F.var_pop): the Sum/SumSq composition is reproducible term-for-term
    in the DuckDB oracle, where Welford-style built-ins can differ in
    final ulps. Values are telemetry-scale, so the textbook formula has
    no cancellation hazard; epsilon-negative results clamp to 0.

    All-NULL groups yield NULL like every other aggregator (the
    absent-sample convention for coverage-gate warm-up rows) — without
    the count guard, F.greatest(NULL, 0.0) would skip the NULL and
    fabricate 0.0."""
    n = F.count(c).cast("double")
    mean = F.sum(c) / n
    return F.when(
        F.count(c) > 0,
        F.greatest(F.sum(c * c) / n - mean * mean, F.lit(0.0)),
    )


def _nan_skipping(agg):
    """Prometheus min/max semantics: NaN entries are ignored unless the
    group is ALL-NaN (the upstream loop replaces a NaN accumulator with
    any value: `if h.value < v || math.IsNaN(h.value)`). Spark's native
    max treats NaN as greater than every number, so an unguarded
    F.max would return NaN whenever one sample is NaN. sum/avg keep
    NaN-propagation — upstream propagates there too."""
    def f(c):
        nn = F.when(~F.isnan(c), c)
        return F.when(
            F.count(c) > 0, F.coalesce(agg(nn), F.lit(float("nan")))
        )
    return f


_AGG_FUNCS = {
    "sum": F.sum,
    "avg": F.avg,
    "min": _nan_skipping(F.min),
    "max": _nan_skipping(F.max),
    "count": lambda c: F.count(c).cast("double"),
    "stddev": lambda c: F.sqrt(_var_pop(c)),
    "stdvar": _var_pop,
    # PromQL `group`: 1 for every group with at least one present
    # sample; all-NULL groups stay NULL (absent) like the rest
    "group": lambda c: F.when(F.count(c) > 0, F.lit(1.0)),
}


def vector_agg(
    df: DataFrame,
    func: str,
    by: list[str] | None = None,
    without: list[str] | None = None,
    value_col: str = "value",
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """PromQL ``<func> by (labels) (vector)`` at each bucket.

    ``without`` resolves to the complement of the df's label columns
    (everything except bucket/value), matching agg_node.go:335-360.
    """
    if func not in _AGG_FUNCS:
        raise ValueError(f"unsupported vector aggregation: {func}")
    all_labels = [c for c in df.columns if c not in (bucket_col, value_col)]
    if without is not None:
        keys = [c for c in all_labels if c not in set(without)]
    elif by is not None:
        keys = list(by)
    else:
        keys = []
    return (
        df.groupBy(bucket_col, *keys)
        .agg(_AGG_FUNCS[func](F.col(value_col)).alias(value_col))
    )


# Per-bucket series count above which the rank auto-routes to the
# two-phase plan: below it the single window per bucket wins (measured
# ~3x faster at bench scale); above it the single-task-per-bucket
# window becomes the straggler and the extra shuffle pays for itself.
TWO_PHASE_THRESHOLD = 1_000_000


def _probe_bucket_series(df: DataFrame, bucket_col: str) -> int:
    """One-bucket cardinality probe for the topk phase router: count
    the rows of the FIRST observed bucket (PromQL grids carry a near-
    identical series set at every step, so one bucket is
    representative). The bucket filter is on the child aggregation's
    group key, so Catalyst pushes it beneath the aggregate down to the
    scan — the probe costs one filtered scan plus a tiny shuffle, not
    a full evaluation (the same bounded plan-time discovery pattern as
    the quantile density gate, operators/density.py).

    The result is memoized per (child logical plan, bucket column):
    repeated topk construction over the same child — bench iterations,
    recompiled dashboards — pays the probe jobs exactly once per
    session (plans/probe_cache.py; the route is a physical-strategy
    hint, both routes are row-identical, so staleness is a performance
    detail, never a correctness one)."""
    from lakerunner_spark.plans.probe_cache import cached_probe

    def compute() -> int:
        row = df.select(bucket_col).limit(1).collect()
        if not row or row[0][0] is None:
            return 0
        return df.filter(F.col(bucket_col) == row[0][0]).count()

    return cached_probe(df, f"bucket_series:{bucket_col}", compute)


def _ranked(
    df: DataFrame,
    k: int,
    ascending: bool,
    value_col: str,
    bucket_col: str,
    tiebreak: list[str],
    two_phase: bool | None = None,
    two_phase_threshold: int = TWO_PHASE_THRESHOLD,
) -> DataFrame:
    """Per-bucket rank-and-keep-k.

    ``two_phase=False``: one ranking window per bucket — the right
    plan up to ~10^5 series per bucket (the post-aggregation
    cardinality of telemetry queries), with zero extra shuffles.

    ``two_phase=True``: phase 1 keeps each input partition's local
    top-k first (the deterministic tiebreak makes the order total, so
    the global top-k is a subset of the union of local top-ks), and the
    final per-bucket window ranks at most k x partitions rows instead
    of every series. Costs one extra shuffle — measured ~3x slower at
    bench scale — but removes the single-task-per-bucket straggler at
    multi-million-series cardinality. Both modes return identical rows
    (equivalence property-tested).

    ``two_phase=None`` (default): AUTO — a one-bucket cardinality
    probe picks the phase (>= ``two_phase_threshold`` series per
    bucket routes two-phase). The explicit flag remains the override
    for callers who know their cardinality up front. The probe is
    memoized per child plan (plans/probe_cache.py), so repeated
    construction over the same child costs jobs only once; streaming
    children skip the probe entirely (no batch jobs can run on an
    unstarted stream) and take the single-window route.
    """
    # absent samples (coverage-gate NULLs) and NaN never occupy a rank
    # slot: the reference collects "scalar, finite entries only"
    # (top_k_node.go Eval skips NaN); without this, Spark's ASC NULLS
    # FIRST would hand bottomk's k slots to warm-up NULLs
    df = df.filter(F.col(value_col).isNotNull() & ~F.isnan(value_col))
    order = [F.col(value_col).asc() if ascending else F.col(value_col).desc()]
    # deterministic tiebreak so results are stable across engines/runs
    order += [F.col(c).asc() for c in tiebreak]
    if two_phase is None:
        if df.isStreaming:
            two_phase = False
        else:
            two_phase = (
                _probe_bucket_series(df, bucket_col) >= two_phase_threshold
            )
    if two_phase:
        w1 = Window.partitionBy(
            bucket_col, F.spark_partition_id().alias("_salt")
        ).orderBy(*order)
        df = (
            df.withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= k)
            .drop("_r1")
        )
    w = Window.partitionBy(bucket_col).orderBy(*order)
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= k)
        .drop("_rank")
    )


def topk(
    df: DataFrame,
    k: int,
    value_col: str = "value",
    bucket_col: str = "bucket_ts",
    tiebreak: list[str] | None = None,
    two_phase: bool | None = None,
    two_phase_threshold: int = TWO_PHASE_THRESHOLD,
) -> DataFrame:
    """Per-bucket top-k series by value (top_k_node.go:25-100).

    Ranking is GLOBAL per bucket even when the query carries a by/
    without grouping: the reference's parser drops Grouping for
    topk/bottomk (parser.go:404-419) and TopKNode ranks the whole
    child map, so `topk(2, x) by (job)` ranks across all jobs —
    reference-faithful, diverging from upstream Prometheus's per-group
    ranking by design.
    """
    tiebreak = tiebreak or [
        c for c in df.columns if c not in (bucket_col, value_col)
    ]
    return _ranked(
        df, k, False, value_col, bucket_col, tiebreak,
        two_phase=two_phase, two_phase_threshold=two_phase_threshold,
    )


def bottomk(
    df: DataFrame,
    k: int,
    value_col: str = "value",
    bucket_col: str = "bucket_ts",
    tiebreak: list[str] | None = None,
    two_phase: bool | None = None,
    two_phase_threshold: int = TWO_PHASE_THRESHOLD,
) -> DataFrame:
    tiebreak = tiebreak or [
        c for c in df.columns if c not in (bucket_col, value_col)
    ]
    return _ranked(
        df, k, True, value_col, bucket_col, tiebreak,
        two_phase=two_phase, two_phase_threshold=two_phase_threshold,
    )
