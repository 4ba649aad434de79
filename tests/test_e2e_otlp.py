"""End-to-end §3.3 with real OTLP bytes: .binpb -> cook -> LogQL query.

Exercises the full ingest lifecycle the reference runs per S3 event:
OTLP protobuf decode (real wire decode, no injected fake), fingerprint
translation, sorted segment write with companion tables, then both
LogQL query modes over the cooked layout.
"""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from lakerunner_spark.ingest.cook import cook_logs
from lakerunner_spark.logql.compiler import (
    LogSource,
    compile_logql,
    compile_logql_exemplar,
)
from lakerunner_spark.sources.otel import read_otlp_logs
from tests.test_protowire import (
    SVC,
    anyval_str,
    f_fixed64,
    f_len,
    f_str,
    keyvalue,
    resource,
)

BASE_NS = 1_700_000_000_000_000_000


def _record(ns: int, msg: str, level: str) -> bytes:
    return (
        f_fixed64(1, ns)
        + f_str(3, level)
        + f_len(5, anyval_str(msg))
    )


def _payload(service: str, recs: list[bytes]) -> bytes:
    res = resource(keyvalue("service.name", anyval_str(service)))
    scope_logs = b"".join(f_len(2, r) for r in recs)
    resource_logs = f_len(1, res) + f_len(2, scope_logs)
    return f_len(1, resource_logs)


@pytest.fixture(scope="module")
def cooked(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("otlp_e2e")
    raw = root / "raw"
    raw.mkdir()
    checkout = [
        _record(BASE_NS + i * 10_000_000_000, f"request {i} ok", "INFO")
        for i in range(20)
    ] + [
        _record(BASE_NS + i * 10_000_000_000 + 1, f"request {i} boom", "ERROR")
        for i in range(5)
    ]
    billing = [
        _record(BASE_NS + i * 10_000_000_000, f"invoice {i} sent", "INFO")
        for i in range(10)
    ]
    (raw / "checkout.binpb").write_bytes(_payload("checkout", checkout))
    (raw / "billing.binpb.gz").write_bytes(
        gzip.compress(_payload("billing", billing))
    )

    df = read_otlp_logs(spark, str(raw)).withColumn(
        "service_identifier", F.col("resource_service_name")
    )
    paths = cook_logs(df.drop("attr_keys", "attr_values"), str(root / "cooked"))
    return spark.read.parquet(paths["segments"])


def _source(segments):
    return LogSource(
        segments, ["service_identifier"], line_col="log_message"
    )


def test_exemplar_over_cooked_otlp(spark, cooked):
    out = compile_logql_exemplar(
        '{service_identifier="checkout"} |= "boom"',
        _source(cooked),
        limit=3,
        descending=True,
    )
    rows = out.collect()
    assert len(rows) == 3
    msgs = [r["log_message"] for r in rows]
    assert msgs == ["request 4 boom", "request 3 boom", "request 2 boom"]


def test_aggregate_over_cooked_otlp(spark, cooked):
    step = 60_000
    out = compile_logql(
        'sum by (service_identifier) '
        '(count_over_time({service_identifier=~"checkout|billing"}[1m]))',
        _source(cooked),
        step,
    )
    per_service = {}
    for r in out.collect():
        if r["value"] is not None:
            per_service[r["service_identifier"]] = per_service.get(
                r["service_identifier"], 0.0
            ) + r["value"]
    # every ingested record is counted once per service
    assert per_service["checkout"] == 25.0
    assert per_service["billing"] == 10.0


def test_cooked_layout_properties(cooked):
    # family columns present and fingerprints computed per message shape
    assert "chq_fingerprint" in cooked.columns
    assert "dateint" in cooked.columns
    shapes = (
        cooked.filter(F.col("service_identifier") == "checkout")
        .select("chq_fingerprint")
        .distinct()
        .count()
    )
    # "request # ok" and "request # boom" -> exactly two structural shapes
    assert shapes == 2


def test_otlp_histogram_to_quantile(spark, tmp_path):
    """Full path: OTLP wire bytes -> exploded per-bucket rows ->
    cumulative counts -> Prometheus le-bucket quantile. The payload's
    histogram has counts [1, 2, 3] at bounds [0.5, 2.5, +Inf]
    (cumulative 1/3/6): q=0.5 -> rank 3, target le=2.5:
    0.5 + (2.5-0.5)*(3-1)/(3-1) = 2.5."""
    from test_protowire import _metrics_payload

    from lakerunner_spark.operators.histogram import (
        cumulate_buckets,
        histogram_quantile_buckets,
    )
    from lakerunner_spark.sources.otel import read_otlp_metrics

    p = tmp_path / "m.binpb"
    p.write_bytes(_metrics_payload())
    rows = read_otlp_metrics(spark, str(tmp_path))
    hist = rows.filter(F.col("chq_metric_type") == "histogram").select(
        F.col("chq_timestamp").alias("bucket_ts"),
        "metric_name",
        F.col("bucket_le").alias("le"),
        "value",
    )
    cum = cumulate_buckets(hist)
    assert [r.value for r in cum.orderBy("le").collect()] == [1.0, 3.0, 6.0]
    out = histogram_quantile_buckets(cum, 0.5).collect()
    assert len(out) == 1 and out[0].value == 2.5 and out[0].metric_name == "latency"
