"""Maintenance plane tests: compaction preserves data + sort order;
retention sweeps exactly the expired dateint partitions."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lakerunner_spark.maintenance.compaction import compact_segments, plan_compaction
from lakerunner_spark.maintenance.retention import expired_partitions, sweep_retention
from lakerunner_spark.testdata import events_stream


def test_compaction_merges_small_files(spark, sf_dir, tmp_path):
    e = (
        events_stream(spark, sf_dir)
        .withColumnRenamed("event_type", "metric_name")
        .withColumn("chq_tid", F.col("user_id").cast("long"))
    )
    part = str(tmp_path / "dateint=20240101")
    # fragment: many tiny files
    e.repartition(16).write.mode("overwrite").parquet(part)
    for f in os.listdir(part):
        if not f.endswith(".parquet"):
            os.remove(os.path.join(part, f))
    n_before = len([f for f in os.listdir(part) if f.endswith(".parquet")])
    total_before = e.count()

    task = plan_compaction(part)
    assert task and task["target_files"] == 1 and len(task["files"]) == n_before

    n_out = compact_segments(spark, task, "metrics")
    assert n_out == 1
    files_after = [f for f in os.listdir(part) if f.endswith(".parquet")]
    assert len(files_after) == 1

    back = spark.read.parquet(part)
    assert back.count() == total_before
    # re-sorted on the family key
    one = (
        spark.read.parquet(os.path.join(part, files_after[0]))
        .select("metric_name", "chq_tid", "chq_timestamp")
        .collect()
    )
    keys = [(r.metric_name, r.chq_tid, r.chq_timestamp) for r in one]
    assert keys == sorted(keys)

    # healthy partition is left alone
    assert plan_compaction(part) is None


def test_plan_table_compaction_walks_partitions(spark, sf_dir, tmp_path):
    from lakerunner_spark.maintenance.compaction import plan_table_compaction

    e = events_stream(spark, sf_dir).limit(2000)
    table = tmp_path / "tbl"
    # two partitions: one fragmented, one healthy single-file
    e.repartition(8).write.parquet(str(table / "dateint=20240101"))
    e.coalesce(1).write.parquet(str(table / "dateint=20240102"))
    tasks = plan_table_compaction(str(table))
    assert len(tasks) == 1 and "dateint=20240101" in tasks[0]["dir"]


def test_retention_sweep(tmp_path):
    base = tmp_path / "logs-cooked" / "org_id=a"
    for d in ("20240101", "20240301", "20240501"):
        (base / f"dateint={d}").mkdir(parents=True)
        (base / f"dateint={d}" / "seg.parquet").write_bytes(b"x")

    now_ms = 1_714_521_600_000  # 2024-05-01 UTC
    doomed = expired_partitions(str(tmp_path), retention_days=90, now_ms=now_ms)
    assert [os.path.basename(p) for p in doomed] == ["dateint=20240101"]

    kept_probe = sweep_retention(
        str(tmp_path), retention_days=90, now_ms=now_ms, dry_run=True
    )
    assert kept_probe == doomed
    assert (base / "dateint=20240101").exists()  # dry run touches nothing

    removed = sweep_retention(str(tmp_path), retention_days=90, now_ms=now_ms)
    assert removed == doomed
    assert not (base / "dateint=20240101").exists()
    assert (base / "dateint=20240301").exists()
    assert (base / "dateint=20240501").exists()
