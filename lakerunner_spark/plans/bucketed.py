"""Bucketed segment layout: shuffle-free joins and aggregations.

The reference co-locates work by consistent-hashing segment keys onto
workers (queryapi/base_discovery.go:58-135) so one worker owns all
segments of a series and partial aggregation never crosses nodes. The
Spark-native analogue is a **bucketed table**: `bucketBy(n, key)` hashes
rows into a fixed number of files per partition, and Catalyst then
recognizes that a scan of the table is already hash-partitioned on the
key — so

- joins of two tables bucketed on the same key with the same bucket
  count plan with **no Exchange on either side**, and
- `groupBy(key, ...)` over one bucketed table plans with **no Exchange
  at all** (HashPartitioning(key) satisfies ClusteredDistribution of
  any superset containing key).

At 100 TB this removes the dominant cost of the fact-fact join
(orders ⋈ lineitem on orderkey) and of per-series aggregation
(groupBy(chq_tid)): the shuffle of the largest table. The bucket count
is a layout-time decision — size it so one bucket × one date partition
fits an executor (e.g. 4096 buckets for a 100 TB year ≈ 25 GB/bucket
before partition pruning).

Family defaults mirror the segment sort orders (SURVEY §2.6 O5): the
bucket key is the first clustering key of each family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# family -> (bucket key, in-bucket sort keys)
FAMILY_BUCKET_KEYS: dict[str, tuple[str, list[str]]] = {
    "metrics": ("chq_tid", ["metric_name", "chq_tid", "chq_timestamp"]),
    "logs": ("chq_fingerprint", ["chq_fingerprint", "chq_tsns"]),
    "spans": ("span_trace_id", ["span_trace_id", "chq_tsns"]),
}


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed parquet table in the session catalog.

    Bucketing metadata lives in the catalog (not the parquet files), so
    readers must go through ``spark.table(table)`` / :func:`read_bucketed`
    for Catalyst to exploit the layout.
    """
    writer = (
        df.write.format("parquet")
        .option("compression", "zstd")
        .mode(mode)
        .bucketBy(num_buckets, bucket_col)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_bucketed_segments(
    df: DataFrame,
    table: str,
    family: str,
    num_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucket a cooked table family by its series/group identity key."""
    bucket_col, sort_cols = FAMILY_BUCKET_KEYS[family]
    sort_cols = [c for c in sort_cols if c in df.columns]
    write_bucketed_table(
        df, table, bucket_col, num_buckets, sort_cols=sort_cols, path=path, mode=mode
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Scan a bucketed table through the catalog (bucket-aware)."""
    return spark.table(table)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the final physical plan.

    Used by layout tests to prove a bucketed plan is shuffle-free; AQE
    keeps the initial plan's exchanges visible in the formatted string,
    so count on the pre-execution formatted plan.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )
