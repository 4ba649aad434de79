"""Segment compaction (SURVEY §3.3 step 5).

Reference: small segments are merged toward 512MB-1GB targets by
re-reading with schema union and re-sorting on the family sort key
(docs/design/OVERVIEW.md:76-99; writer_logs_duckdb.go:214-266 does
``read_parquet([...], union_by_name=true) ORDER BY ...``).

Spark-first: a batch job per (org_id, dateint[, frequency_ms])
partition — mergeSchema scan of that partition's files, repartition to
ceil(bytes/target) output files, sortWithinPartitions on the family
sort key, atomic directory swap. At 100 TB compaction parallelizes per
partition and never touches healthy partitions (plan_compaction
selects only partitions whose mean file size is below threshold).
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import SparkSession

from lakerunner_spark.schema import SEGMENT_SORT_KEYS

TARGET_SEGMENT_BYTES = 768 * 1024 * 1024  # mid of the 512MB-1GB band


def plan_compaction(
    partition_dir: str,
    target_bytes: int = TARGET_SEGMENT_BYTES,
    min_mean_fraction: float = 0.5,
) -> dict | None:
    """Inspect one partition directory; return a compaction task or None.

    Eligible when mean parquet file size < min_mean_fraction * target
    and there is more than one file (OVERVIEW.md:82 'optimal segment
    size' heuristic).
    """
    files = [
        os.path.join(partition_dir, f)
        for f in os.listdir(partition_dir)
        if f.endswith(".parquet")
    ]
    if len(files) <= 1:
        return None
    total = sum(os.path.getsize(f) for f in files)
    if total / len(files) >= min_mean_fraction * target_bytes:
        return None
    return {
        "dir": partition_dir,
        "files": sorted(files),
        "total_bytes": total,
        "target_files": max(1, math.ceil(total / target_bytes)),
    }


def plan_table_compaction(
    table_path: str,
    target_bytes: int = TARGET_SEGMENT_BYTES,
    min_mean_fraction: float = 0.5,
) -> list[dict]:
    """Walk a partitioned table tree; one task per fragmented partition.

    Healthy partitions produce no task, so the sweep cost is directory
    metadata only — at 100 TB this runs as a scheduled job enumerating
    partitions, then `compact_segments` tasks fan out per partition.
    """
    tasks: list[dict] = []
    for root, _dirs, files in os.walk(table_path):
        if any(f.endswith(".parquet") for f in files):
            task = plan_compaction(root, target_bytes, min_mean_fraction)
            if task:
                tasks.append(task)
    return sorted(tasks, key=lambda t: t["dir"])


def compact_segments(
    spark: SparkSession,
    task: dict,
    family: str,
    compression: str = "zstd",
) -> int:
    """Execute one compaction task; returns the output file count.

    Rewrite happens into a staging dir then swaps in, so a crashed job
    leaves the original segments intact (the reference gets the same
    from upload-then-republish semantics, OVERVIEW.md:277).
    """
    sort_keys = SEGMENT_SORT_KEYS[family]
    df = spark.read.option("mergeSchema", "true").parquet(*task["files"])
    sort_cols = [k for k in sort_keys if k in df.columns]

    staging = os.path.join(
        os.path.dirname(task["dir"]),
        f"_compact_{uuid.uuid4().hex[:8]}_{os.path.basename(task['dir'])}",
    )
    out = df.repartition(task["target_files"])
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").option("compression", compression).parquet(staging)

    # atomic-ish swap: move new files in, remove old ones
    for f in task["files"]:
        os.remove(f)
    n = 0
    for f in os.listdir(staging):
        if f.endswith(".parquet"):
            shutil.move(
                os.path.join(staging, f),
                os.path.join(task["dir"], f"compacted_{n:05d}.parquet"),
            )
            n += 1
    shutil.rmtree(staging, ignore_errors=True)
    return n
