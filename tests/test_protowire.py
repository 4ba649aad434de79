"""Round-trip tests for the dependency-free OTLP wire decoder.

The encoder below writes protobuf wire format by hand (varints, tags,
length-delimited submessages) following the public opentelemetry-proto
v1 schemas — so the decode path is tested against independently
constructed payloads, not its own output.
"""

from __future__ import annotations

import gzip
import struct

from lakerunner_spark.sources.otel import (
    decode_otlp_logs_payload,
    decode_otlp_metrics_payload,
    decode_otlp_traces_payload,
    read_otlp_logs,
)

# --------------------------- tiny wire encoder ---------------------------


def vint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def tag(field: int, wtype: int) -> bytes:
    return vint(field << 3 | wtype)


def f_varint(field: int, v: int) -> bytes:
    return tag(field, 0) + vint(v)


def f_fixed64(field: int, v: int) -> bytes:
    return tag(field, 1) + struct.pack("<Q", v)


def f_double(field: int, v: float) -> bytes:
    return tag(field, 1) + struct.pack("<d", v)


def f_len(field: int, payload: bytes) -> bytes:
    return tag(field, 2) + vint(len(payload)) + payload


def f_str(field: int, s: str) -> bytes:
    return f_len(field, s.encode())


def anyval_str(s: str) -> bytes:
    return f_str(1, s)


def keyvalue(k: str, v: bytes) -> bytes:
    return f_str(1, k) + f_len(2, v)


def resource(*attrs: bytes) -> bytes:
    return b"".join(f_len(1, a) for a in attrs)


SVC = keyvalue("service.name", anyval_str("checkout"))

# ------------------------------- logs ------------------------------------


def _logs_payload() -> bytes:
    rec1 = (
        f_fixed64(1, 1_700_000_000_123_456_789)
        + f_str(3, "ERROR")
        + f_len(5, anyval_str("boom"))
        + f_len(6, keyvalue("http.status", f_varint(3, 500)))  # int attr
    )
    rec2 = f_fixed64(11, 1_700_000_001_000_000_000) + f_len(
        5, anyval_str("observed-only")
    )
    scope_logs = f_len(2, rec1) + f_len(2, rec2)
    resource_logs = f_len(1, resource(SVC)) + f_len(2, scope_logs)
    return f_len(1, resource_logs)


def test_logs_decode():
    rows = decode_otlp_logs_payload(_logs_payload())
    assert len(rows) == 2
    r1, r2 = rows
    assert r1["log_message"] == "boom"
    assert r1["log_level"] == "ERROR"
    assert r1["chq_timestamp"] == 1_700_000_000_123
    assert r1["chq_tsns"] == 1_700_000_000_123_456_789
    assert r1["resource_service_name"] == "checkout"
    assert r1["attr_keys"] == ["http.status"]
    assert r1["attr_values"] == ["500"]  # int attr stringified
    # falls back to observed_time_unix_nano
    assert r2["chq_tsns"] == 1_700_000_001_000_000_000
    assert r2["log_level"] is None


def test_logs_end_to_end_spark(spark, tmp_path):
    (tmp_path / "a.binpb").write_bytes(_logs_payload())
    (tmp_path / "b.binpb.gz").write_bytes(gzip.compress(_logs_payload()))
    df = read_otlp_logs(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 4  # two files x two records, gz transparently
    assert {r["log_message"] for r in rows} == {"boom", "observed-only"}


# ------------------------------ metrics ----------------------------------


def _metrics_payload() -> bytes:
    gauge_pt = (
        f_fixed64(3, 2_000_000_000_000_000_000)
        + f_double(4, 42.5)
        + f_len(7, keyvalue("host", anyval_str("h1")))
    )
    gauge_metric = f_str(1, "cpu_temp") + f_len(5, f_len(1, gauge_pt))

    sum_pt = f_fixed64(3, 2_000_000_000_000_000_000) + tag(6, 1) + struct.pack(
        "<q", 7
    )  # as_int sfixed64
    sum_metric = f_str(1, "requests_total") + f_len(
        7, f_len(1, sum_pt) + f_varint(2, 2) + f_varint(3, 1)
    )

    # histogram: packed bucket_counts + packed explicit_bounds
    counts = struct.pack("<3Q", 1, 2, 3)
    bounds = struct.pack("<2d", 0.5, 2.5)
    hist_pt = (
        f_fixed64(3, 2_000_000_000_000_000_000)
        + f_fixed64(4, 6)
        + f_double(5, 9.75)
        + f_len(6, counts)
        + f_len(7, bounds)
        + f_len(9, keyvalue("route", anyval_str("/pay")))
    )
    hist_metric = f_str(1, "latency") + f_len(9, f_len(1, hist_pt))

    scope_metrics = (
        f_len(2, gauge_metric) + f_len(2, sum_metric) + f_len(2, hist_metric)
    )
    resource_metrics = f_len(1, resource(SVC)) + f_len(2, scope_metrics)
    return f_len(1, resource_metrics)


def test_metrics_decode():
    rows = decode_otlp_metrics_payload(_metrics_payload())
    by_name = {}
    for r in rows:
        by_name.setdefault(r["metric_name"], []).append(r)
    g = by_name["cpu_temp"][0]
    assert g["chq_metric_type"] == "gauge" and g["value"] == 42.5
    assert g["attr_keys"] == ["host"] and g["attr_values"] == ["h1"]
    s = by_name["requests_total"][0]
    assert s["chq_metric_type"] == "count" and s["value"] == 7.0
    h = by_name["latency"]
    assert [r["value"] for r in h] == [1.0, 2.0, 3.0]
    assert [r["bucket_le"] for r in h] == [0.5, 2.5, float("inf")]
    assert all(r["attr_values"] == ["/pay"] for r in h)
    assert all(r["chq_timestamp"] == 2_000_000_000_000 for r in rows)


# ------------------------------- traces ----------------------------------


def _traces_payload() -> bytes:
    span = (
        f_len(1, bytes.fromhex("000102030405060708090a0b0c0d0e0f"))
        + f_len(2, bytes.fromhex("1112131415161718"))
        + f_len(4, bytes.fromhex("2122232425262728"))
        + f_str(5, "GET /pay")
        + f_varint(6, 2)
        + f_fixed64(7, 3_000_000_000_000_000_000)
        + f_fixed64(8, 3_000_000_000_500_000_000)
        + f_len(15, f_varint(3, 2) + f_str(2, "err"))
    )
    root = f_len(1, bytes(16)) + f_len(2, bytes(8)) + f_str(5, "root") \
        + f_fixed64(7, 1) + f_fixed64(8, 2)
    scope_spans = f_len(2, span) + f_len(2, root)
    resource_spans = f_len(1, resource(SVC)) + f_len(2, scope_spans)
    return f_len(1, resource_spans)


def test_traces_decode():
    rows = decode_otlp_traces_payload(_traces_payload())
    assert len(rows) == 2
    sp = rows[0]
    assert sp["span_trace_id"] == "000102030405060708090a0b0c0d0e0f"
    assert sp["span_id"] == "1112131415161718"
    assert sp["span_parent_span_id"] == "2122232425262728"
    assert sp["span_name"] == "GET /pay"
    assert sp["span_kind"] == "2"
    assert sp["span_status_code"] == "2"
    assert sp["span_duration"] == 500_000_000
    assert sp["resource_service_name"] == "checkout"
    root = rows[1]
    assert root["span_parent_span_id"] is None
    assert root["span_status_code"] == "0"  # unset status -> UNSET


# ------------------- wire-robustness (round-3 hardening) -------------------


def test_truncated_payload_raises():
    import pytest

    from lakerunner_spark.sources import protowire as pw

    good = f_str(1, "hello") + f_fixed64(2, 42)
    # whole message parses
    assert pw.fields_dict(good)
    # cut mid-LEN payload: must raise, not decode the prefix
    with pytest.raises(ValueError, match="truncated"):
        pw.fields_dict(good[:4])
    # cut mid-fixed64
    with pytest.raises(ValueError, match="truncated"):
        pw.fields_dict(good[:-3])
    # truncated fixed32
    with pytest.raises(ValueError, match="truncated"):
        pw.fields_dict(tag(1, 5) + b"\x01\x02")


def test_packed_decoders_consistent():
    import pytest

    from lakerunner_spark.sources import protowire as pw

    # legal explicit empty packed field -> no elements, no crash
    assert pw.packed_u64([b""]) == []
    assert pw.packed_double([b""]) == []
    # 16 bytes -> two elements for both
    two = struct.pack("<QQ", 7, 9)
    assert pw.packed_u64([two]) == [7, 9]
    # 8 bytes -> one element (ambiguous packed/unpacked, same decode)
    assert pw.packed_u64([struct.pack("<Q", 5)]) == [5]
    # non-multiple of 8 is truncation, not silent tail-drop
    with pytest.raises(ValueError, match="not a multiple"):
        pw.packed_u64([b"\x01\x02\x03"])
    with pytest.raises(ValueError, match="not a multiple"):
        pw.packed_double([b"\x01" * 12])


def test_split_submessage_occurrences_merge():
    """Protobuf: multiple occurrences of a non-repeated embedded message
    MERGE (concatenate-then-parse); datapoints split across two `sum`
    submessage occurrences must all decode."""
    from lakerunner_spark.sources.otel import decode_otlp_metrics_payload

    def dp(ts_ns: int, v: float) -> bytes:
        return f_fixed64(3, ts_ns) + f_double(4, v)

    sum1 = f_len(1, dp(1_700_000_000_000_000_000, 1.0))
    sum2 = f_len(1, dp(1_700_000_001_000_000_000, 2.0))
    metric = f_str(1, "reqs") + f_len(7, sum1) + f_len(7, sum2)
    scope = f_len(2, metric)
    rm = f_len(1, resource(SVC)) + f_len(2, scope)
    rows = decode_otlp_metrics_payload(f_len(1, rm))
    assert sorted(r["value"] for r in rows) == [1.0, 2.0]


def test_scalar_last_one_wins():
    from lakerunner_spark.sources import protowire as pw

    m = pw.fields_dict(f_str(1, "first") + f_str(1, "second"))
    assert pw.as_str(pw.first(m, 1)) == "second"


def test_exponential_histogram_decode():
    """OTLP exponential histogram -> le-bounded bucket rows: base =
    2^(2^-scale); positive bucket i upper edge base^(offset+i+1),
    negative buckets mirror, zero bucket at le=0. Hand-encoded payload,
    scale=0 (base 2), positive offset 1 -> buckets (2,4], (4,8]."""
    from lakerunner_spark.sources.otel import decode_otlp_metrics_payload

    # sint32 zigzag: 0 -> 0, 1 -> 2, -1 -> 1
    pos_buckets = f_varint(1, 2) + f_len(2, vint(3) + vint(5))  # offset=1
    neg_buckets = f_varint(1, 0) + f_len(2, vint(2))            # offset=0
    dp = (
        f_len(1, keyvalue("env", anyval_str("prod")))
        + f_fixed64(3, 7_000_000)     # time_unix_nano -> 7 ms
        + f_varint(4, 11)             # count
        + f_varint(6, 0)              # scale = 0 (zigzag 0)
        + f_varint(7, 1)              # zero_count
        + f_len(8, pos_buckets)
        + f_len(9, neg_buckets)
    )
    metric = f_str(1, "lat") + f_len(10, f_len(1, dp))
    payload = f_len(1, f_len(2, f_len(2, metric)))
    rows = decode_otlp_metrics_payload(payload)
    assert all(r["chq_metric_type"] == "exponential_histogram" for r in rows)
    got = sorted((r["bucket_le"], r["value"]) for r in rows)
    # neg bucket 0 covers (-2, -1] -> le = -(2^0) = -1
    assert got == [(-1.0, 2.0), (0.0, 1.0), (4.0, 3.0), (8.0, 5.0)]
    assert rows[0]["chq_timestamp"] == 7
    assert rows[0]["attr_keys"] == ["env"]


def test_exponential_histogram_to_quantile(spark):
    """The exploded exponential buckets feed cumulate_buckets +
    histogram_quantile exactly like explicit buckets: counts 3 in
    (2,4], 5 in (4,8] -> q50 of 8 positive samples interpolates inside
    (4,8]."""
    from lakerunner_spark.operators.histogram import (
        cumulate_buckets,
        histogram_quantile_buckets,
    )
    from pyspark.sql import functions as F

    # exponential histograms carry no +Inf bucket; the classic-bucket
    # bridge appends an empty one (cumulative top = total) before the
    # Prometheus quantile, whose guard requires it
    rows = [
        (0, "lat", 4.0, 3.0),
        (0, "lat", 8.0, 5.0),
        (0, "lat", float("inf"), 0.0),
    ]
    df = spark.createDataFrame(
        rows, "bucket_ts LONG, metric_name STRING, le DOUBLE, value DOUBLE"
    )
    cum = cumulate_buckets(df)
    out = histogram_quantile_buckets(cum, 0.5).collect()
    # rank 4 of 8: first bucket holds 3, interpolate (4-3)/5 into (4,8]
    assert len(out) == 1
    assert abs(out[0].value - (4.0 + (4 - 3) / 5 * 4.0)) < 1e-9


def test_summary_decode():
    """OTLP Summary (Metric field 11): each stored quantile becomes one
    row — value at the quantile, the rank carried in bucket_le with
    chq_metric_type='summary' disambiguating it from an le bound."""
    from lakerunner_spark.sources.otel import decode_otlp_metrics_payload

    qv50 = f_double(1, 0.5) + f_double(2, 42.0)
    qv99 = f_double(1, 0.99) + f_double(2, 99.5)
    dp = (
        f_len(7, keyvalue("env", anyval_str("prod")))
        + f_fixed64(3, 5_000_000)
        + f_varint(4, 100)
        + f_len(6, qv50)
        + f_len(6, qv99)
    )
    metric = f_str(1, "rt") + f_len(11, f_len(1, dp))
    payload = f_len(1, f_len(2, f_len(2, metric)))
    rows = decode_otlp_metrics_payload(payload)
    assert [r["chq_metric_type"] for r in rows] == ["summary", "summary"]
    assert sorted((r["bucket_le"], r["value"]) for r in rows) == [
        (0.5, 42.0), (0.99, 99.5),
    ]
    assert rows[0]["chq_timestamp"] == 5 and rows[0]["attr_keys"] == ["env"]
