"""Minimal OTLP protobuf wire ENCODER (fixture generation).

The decode path (sources/otel.py + sources/protowire.py) is exercised
end-to-end by registered queries; those need deterministic `.binpb`
payloads on disk. This module hand-writes protobuf wire format (varints,
tags, length-delimited submessages) per the public opentelemetry-proto
v1 schemas — the same independent-construction principle the unit tests
use (tests/test_protowire.py), packaged so query fixtures don't import
test code.

Reference parity note: the reference ingests OTLP via the official
protobuf bindings (internal/filereader/ingest_proto_*.go); this engine
decodes the wire directly, and this encoder exists only to synthesize
fixtures deterministically.
"""

from __future__ import annotations

import os
import struct


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


def zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def tag(field: int, wtype: int) -> bytes:
    return vint(field << 3 | wtype)


def f_varint(field: int, v: int) -> bytes:
    return tag(field, 0) + vint(v)


def f_fixed64(field: int, v: int) -> bytes:
    return tag(field, 1) + struct.pack("<Q", v)


def f_len(field: int, payload: bytes) -> bytes:
    return tag(field, 2) + vint(len(payload)) + payload


def f_str(field: int, s: str) -> bytes:
    return f_len(field, s.encode())


def keyvalue(key: str, sval: str) -> bytes:
    """KeyValue{key=1, value=2:AnyValue{string_value=1}}"""
    return f_str(1, key) + f_len(2, f_str(1, sval))


def exp_histogram_payload() -> bytes:
    """Deterministic ExportMetricsServiceRequest carrying exponential
    histograms: metric 'lat', 4 series (attribute svc=svc0..svc3), 2
    datapoints each (t in {0,1}, time (t+1) hours), scale=1 (base
    sqrt(2)), positive offset=2, 10 buckets with
    count(s,t,i) = (s*7 + i*3 + t) % 5 and zero_count = s % 3 — pure
    arithmetic a SQL oracle regenerates independently (the decode path
    skips zero-count buckets, so the oracle filters cnt > 0 the same
    way)."""
    dps = b""
    for s in range(4):
        for t in range(2):
            counts = b"".join(
                vint((s * 7 + i * 3 + t) % 5) for i in range(10)
            )
            pos = f_varint(1, zigzag(2)) + f_len(2, counts)
            dp = (
                f_len(1, keyvalue("svc", f"svc{s}"))
                + f_fixed64(3, (t + 1) * 3_600_000 * 1_000_000)  # ns
                # count (4) and zero_count (7) are declared fixed64 in
                # opentelemetry-proto v1 — encode them as such so the
                # fixture is spec-valid wire format that official
                # protobuf parsers accept (the in-repo decoder's as_u64
                # tolerates either, but the fixture should not rely on
                # that leniency)
                + f_fixed64(4, sum((s * 7 + i * 3 + t) % 5 for i in range(10)))
                + f_varint(6, zigzag(1))  # scale = 1 (sint32: varint)
                + f_fixed64(7, s % 3)     # zero_count
                + f_len(8, pos)
            )
            dps += f_len(1, dp)
    metric = f_str(1, "lat") + f_len(10, dps)
    scope = f_len(2, metric)
    rm = f_len(2, scope)
    return f_len(1, rm)


def write_fixture(path: str, payload: bytes) -> str:
    """Idempotent, atomic fixture write (concurrent query runs race on
    the same cache path): write to a temp name, rename into place."""
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)
    return path
