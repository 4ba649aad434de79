"""S9 Kafka source: environment-blocked end-to-end (no broker binary,
no spark-sql-kafka connector jar, no kafka-clients, no network — the
round-9 scout re-swept the filesystem and Spark's jars/ directory),
so these tests pin the CONTRACT boundary instead: the module imports
and builds plans without the jar, and stream construction fails
precisely AT Spark's data-source resolution (DATA_SOURCE_NOT_FOUND
naming the kafka format), proving the plumbing above that line —
reader options, offset mode, batch sizing — is wired correctly.
Reference: docs/design/OVERVIEW.md:254-263,
internal/metricsprocessing/offset_tracker.go."""

from __future__ import annotations

import glob
import os

import pytest


def _kafka_jars() -> list[str]:
    import pyspark

    jars = glob.glob(
        os.path.join(os.path.dirname(pyspark.__file__), "jars", "*.jar")
    )
    assert jars, "pyspark jars directory should exist"
    return [j for j in jars if "kafka" in os.path.basename(j).lower()]


UPGRADE_MSG = (
    "spark-sql-kafka connector jar is PRESENT — the environment gained "
    "the artifact the negative ADR is premised on. Upgrade the Kafka "
    "path to a broker-backed stream==batch round-trip test (see README "
    "ADR / streaming/kafka.py) and retire these contract-boundary tests."
)


def test_kafka_stream_fails_only_at_connector_resolution(spark):
    """Everything up to .load() must succeed (options accepted, plan
    assembled); .load() must fail with Spark's missing-data-source
    error for 'kafka' — NOT an engine-side error — so on a cluster
    with the connector jar the same call succeeds unchanged. Skipped
    (with the upgrade pointer) on connector-equipped machines, where
    the resolution failure this pins cannot occur."""
    if _kafka_jars():
        pytest.skip(UPGRADE_MSG)
    from lakerunner_spark.streaming.kafka import kafka_ingest_stream

    with pytest.raises(Exception) as ei:
        kafka_ingest_stream(
            spark, "broker:9092", "ingest-topic",
            starting_offsets="earliest", max_offsets_per_trigger=500,
        )
    msg = str(ei.value)
    assert "kafka" in msg.lower()
    assert "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find" in msg


def test_connector_jar_absence_is_checked_each_run():
    """The negative ADR's premise, as an executable check: the day the
    sandbox gains the connector jar this SKIPS with the upgrade
    instructions instead of silently passing (and instead of hard-
    failing a legitimately connector-equipped cluster's suite) — the
    tripwire signals the upgrade path rather than breaking it."""
    if _kafka_jars():
        pytest.skip(UPGRADE_MSG)
    assert not _kafka_jars()
