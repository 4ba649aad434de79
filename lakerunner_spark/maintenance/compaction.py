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
        if os.path.basename(root).startswith("_compact_"):
            continue  # staging dir of an in-flight/crashed txn, not a partition
        if any(f.endswith(".parquet") for f in files):
            # repair any crashed prior compaction before planning over
            # this partition (roll forward/back per the commit record)
            recover_compaction(root)
            task = plan_compaction(root, target_bytes, min_mean_fraction)
            if task:
                tasks.append(task)
    return sorted(tasks, key=lambda t: t["dir"])


def _commit_path(partition_dir: str, txid: str) -> str:
    return os.path.join(partition_dir, f"_compact_commit_{txid}.json")


def _fsync_dir(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _write_commit(partition_dir: str, txid: str, record: dict) -> str:
    """Atomically publish the commit record (temp file + rename — the
    rename IS the transaction point). The file is fsync'd before the
    rename and the DIRECTORY after it, so the rename's directory entry
    is durable before any old-file deletion may hit disk — without the
    directory fsync a crash could persist a later unlink but not the
    rename, losing data with no record to roll forward."""
    import json

    path = _commit_path(partition_dir, txid)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(record, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    _fsync_dir(partition_dir)
    return path


def recover_compaction(partition_dir: str) -> str | None:
    """Repair a partition after a compaction crash; returns the action
    taken ('rolled_forward' | 'rolled_back' | None).

    Protocol invariants (see :func:`compact_segments`):
    - no commit record present -> the transaction never happened; any
      staging directory is garbage (original files are all intact,
      because old-file deletion only starts after the commit record is
      published). Roll BACK: delete staging.
    - commit record present -> the transaction is decided. Roll
      FORWARD: move any staged files not yet in place, delete any old
      files still present, then drop the record.
    """
    import glob
    import json

    action = None
    # a crash inside _write_commit can strand a .tmp record: the txn
    # never committed (the rename is the commit point) -> plain garbage
    for tmp in glob.glob(os.path.join(partition_dir, "_compact_commit_*.json.tmp")):
        os.remove(tmp)
    for commit in sorted(glob.glob(os.path.join(partition_dir, "_compact_commit_*.json"))):
        with open(commit) as f:
            rec = json.load(f)
        for src, dst in rec["moves"]:
            if os.path.exists(src) and not os.path.exists(dst):
                shutil.move(src, dst)
        for old in rec["old_files"]:
            if os.path.exists(old):
                os.remove(old)
        shutil.rmtree(rec["staging"], ignore_errors=True)
        os.remove(commit)
        action = "rolled_forward"
    if action is None:
        parent = os.path.dirname(partition_dir)
        base = os.path.basename(partition_dir)
        for stale in glob.glob(os.path.join(parent, f"_compact_*_{base}")):
            shutil.rmtree(stale, ignore_errors=True)
            action = "rolled_back"
    return action


def compact_segments(
    spark: SparkSession,
    task: dict,
    family: str,
    compression: str = "zstd",
) -> int:
    """Execute one compaction task; returns the output file count.

    Crash-safe write-ahead protocol (temp dir + manifest commit — the
    same transactional shape Structured Streaming's file-sink manifest
    gives the T4 path; the reference gets it from upload-then-republish
    + Postgres registration, OVERVIEW.md:277):

    1. write compacted output to a sibling staging dir; verify _SUCCESS;
    2. atomically publish a commit record (tmp + rename) listing the
       planned moves and the old files — this rename is the txn point;
    3. move new files in, delete old files, drop the record.

    A crash before (2) leaves the original segments untouched (staging
    is garbage-collected by :func:`recover_compaction`); a crash after
    (2) is rolled forward by replaying the record. Run
    recover_compaction over partitions at job start.
    """
    sort_keys = SEGMENT_SORT_KEYS[family]
    df = spark.read.option("mergeSchema", "true").parquet(*task["files"])
    sort_cols = [k for k in sort_keys if k in df.columns]

    txid = uuid.uuid4().hex[:8]
    staging = os.path.join(
        os.path.dirname(task["dir"]),
        f"_compact_{txid}_{os.path.basename(task['dir'])}",
    )
    out = df.repartition(task["target_files"])
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").option("compression", compression).parquet(staging)
    if not os.path.exists(os.path.join(staging, "_SUCCESS")):
        raise RuntimeError(f"compaction staging write incomplete: {staging}")

    staged = sorted(
        f for f in os.listdir(staging) if f.endswith(".parquet")
    )
    # the commit record must never be durable BEFORE the data it
    # promises to roll forward: fsync every staged file + the staging
    # dir entry first (Spark's local-FS writer does not fsync)
    for f in staged:
        fd = os.open(os.path.join(staging, f), os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
    _fsync_dir(staging)
    moves = [
        (
            os.path.join(staging, f),
            os.path.join(task["dir"], f"compacted_{txid}_{i:05d}.parquet"),
        )
        for i, f in enumerate(staged)
    ]
    _write_commit(
        task["dir"],
        txid,
        {"staging": staging, "moves": moves, "old_files": task["files"]},
    )
    for src, dst in moves:
        shutil.move(src, dst)
    for f in task["files"]:
        os.remove(f)
    shutil.rmtree(staging, ignore_errors=True)
    os.remove(_commit_path(task["dir"], txid))
    return len(moves)
