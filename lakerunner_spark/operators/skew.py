"""Skew-resistant aggregation: two-phase salted groupBy.

AQE's skew-join splitting handles joins, but a groupBy with one giant
key still funnels that key's rows through a single reducer. Salting
splits each key into ``salt_n`` subkeys for the first (wide) exchange,
then merges the tiny per-salt partials — the standard remedy when a
telemetry tenant or dedup bucket dominates (SURVEY 'skewed keys hurt').

Only algebraic aggregates are offered (sum/count/min/max — the
engine's rollup core), because they compose across salts exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts add across salts
    "min": F.min,
    "max": F.max,
}
_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(c),
    "min": F.min,
    "max": F.max,
}


def spread_small_scan(
    df: DataFrame,
    min_parts: int | None = None,
    probe: DataFrame | None = None,
) -> DataFrame:
    """Round-robin repartition a scan that yields fewer partitions than
    the cluster has cores — otherwise every map operator adjacent to the
    scan (tokenize/hash/explode pipelines) runs on a single task while
    the rest of the cluster idles (the guide's input-skew remedy:
    "repartition immediately after the read").

    Scale-adaptive, not a local[32] constant: the target is
    ``defaultParallelism`` (tracks the session's core count, so the
    driver's low-core bench run sees a proportionally lower target), and
    when the scan already carries at least that many partitions — the
    normal case at production scale, where inputs are many files — this
    is a NO-OP adding no exchange. Only small single-row-group inputs
    (like the bench fixtures) pay the one cheap shuffle of the projected
    columns. Round-robin keeps retry-determinism via Spark's
    sort-before-repartition (on by default, SPARK-23207).

    ``probe``: partition count is read from this DataFrame instead of
    ``df`` when given. Building ``df.rdd`` EXECUTES any broadcast
    exchange inside ``df``'s plan (executeBroadcast fires during RDD
    construction, before any action) — so a caller spreading e.g. the
    pruned side of a broadcast semi-join must pass the underlying pure
    scan-projection as ``probe``; the stream side of such a join keeps
    the scan's partitioning, so the probe's count is the right answer.
    ``df`` itself must only be passed bare when its plan is
    scan+project (no joins, no subqueries).

    Streaming DataFrames pass through untouched: the partition probe
    (``df.rdd``) is illegal on a streaming plan, and a micro-batch's
    partitioning is the stream source's to decide — the spread is a
    batch-scan remedy.
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if (probe if probe is not None else df).rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_n: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) then groupBy(keys).

    ``aggs`` maps output column -> (func, input column), func in
    {sum, count, min, max}. Result is EXACTLY equal to the direct
    groupBy (tested), with the first shuffle's key cardinality
    multiplied by salt_n so no reducer owns a whole hot key.

    The salt is a DETERMINISTIC function of (map partition, row), never
    ``rand()``: a random salt is a nondeterministic shuffle key, and a
    fetch-failure map-stage retry would re-salt rows differently —
    reducers that committed partials from the first attempt then
    double-count (or drop) rows silently. ``spark_partition_id()`` is
    retry-deterministic (the same map partition recomputes with the
    same id) and spreads a hot key across as many salts as the input
    partitions holding it, independent of value cardinality — hashing
    the aggregated columns ALONE collapses to a handful of salts when a
    hot key's values are low-cardinality (e.g. a 0/1 flag under count),
    silently defeating the mitigation. The value-column hash is mixed
    in on top so a single giant input partition still fans out.
    """
    for func, _ in aggs.values():
        if func not in _PARTIAL:
            raise ValueError(f"salted_agg: non-algebraic func {func!r}")
    in_cols = sorted({col for _, col in aggs.values()})
    salted = df.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(F.spark_partition_id(), *[F.col(c) for c in in_cols]),
            salt_n,
        ),
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _PARTIAL[func](F.col(col)).alias(out)
            for out, (func, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGE[func](F.col(out)).alias(out)
            for out, (func, _col) in aggs.items()
        ]
    )
