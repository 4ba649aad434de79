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


_AGG_FUNCS = {
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
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


def _ranked(
    df: DataFrame,
    k: int,
    ascending: bool,
    value_col: str,
    bucket_col: str,
    tiebreak: list[str],
    two_phase: bool = False,
) -> DataFrame:
    """Per-bucket rank-and-keep-k.

    ``two_phase=False`` (default): one ranking window per bucket — the
    right plan up to ~10^5 series per bucket (the post-aggregation
    cardinality of telemetry queries), with zero extra shuffles.

    ``two_phase=True``: phase 1 keeps each input partition's local
    top-k first (the deterministic tiebreak makes the order total, so
    the global top-k is a subset of the union of local top-ks), and the
    final per-bucket window ranks at most k x partitions rows instead
    of every series. Costs one extra shuffle — measured ~3x slower at
    bench scale, which is why it's opt-in — but removes the
    single-task-per-bucket straggler at multi-million-series
    cardinality. Callers with huge label spaces (e.g. per-user series)
    should pass two_phase=True; both modes return identical rows.
    """
    # absent samples (coverage-gate NULLs) and NaN never occupy a rank
    # slot: the reference collects "scalar, finite entries only"
    # (top_k_node.go Eval skips NaN); without this, Spark's ASC NULLS
    # FIRST would hand bottomk's k slots to warm-up NULLs
    df = df.filter(F.col(value_col).isNotNull() & ~F.isnan(value_col))
    order = [F.col(value_col).asc() if ascending else F.col(value_col).desc()]
    # deterministic tiebreak so results are stable across engines/runs
    order += [F.col(c).asc() for c in tiebreak]
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
    two_phase: bool = False,
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
        df, k, False, value_col, bucket_col, tiebreak, two_phase=two_phase
    )


def bottomk(
    df: DataFrame,
    k: int,
    value_col: str = "value",
    bucket_col: str = "bucket_ts",
    tiebreak: list[str] | None = None,
    two_phase: bool = False,
) -> DataFrame:
    tiebreak = tiebreak or [
        c for c in df.columns if c not in (bucket_col, value_col)
    ]
    return _ranked(
        df, k, True, value_col, bucket_col, tiebreak, two_phase=two_phase
    )
