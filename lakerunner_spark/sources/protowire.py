"""Dependency-free protobuf wire-format decoding for OTLP payloads.

The container has no protobuf runtime, but the protobuf wire format and
the OpenTelemetry proto schemas are public and stable (opentelemetry-
proto v1: logs.proto / metrics.proto / trace.proto / common.proto).
This module implements the subset the OTLP readers need — varint,
fixed64/fixed32, and length-delimited fields, plus packed repeated
scalars — so S5/S6 decode real ``.binpb`` payloads with zero optional
dependencies. The reference links a DuckDB extension for the same job
(otel_logs_read / otel_metrics_read / otel_traces_read,
internal/metricsprocessing/logs_ingest_duckdb.go:232).

Only features OTLP actually uses are supported; groups (wire types 3/4)
are rejected.
"""

from __future__ import annotations

import struct

VARINT, I64, LEN, I32 = 0, 1, 2, 5


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7
        if shift > 70:
            raise ValueError("protowire: varint too long")


def iter_fields(buf: bytes):
    """Yield (field_no, wire_type, value) for one serialized message.

    value is int for VARINT, bytes for I64/I32/LEN.
    """
    i, n = 0, len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        field, wtype = tag >> 3, tag & 7
        # every branch bounds-checks: a truncated payload (cut upload)
        # must FAIL, not silently decode the prefix that happens to fit
        # — python slicing would shorten out-of-range reads without error
        if wtype == VARINT:
            val, i = _read_varint(buf, i)
        elif wtype == I64:
            if i + 8 > n:
                raise ValueError("protowire: truncated fixed64 field")
            val, i = buf[i : i + 8], i + 8
        elif wtype == LEN:
            ln, i = _read_varint(buf, i)
            if i + ln > n:
                raise ValueError(
                    f"protowire: truncated LEN field (need {ln} bytes, "
                    f"have {n - i})"
                )
            val, i = buf[i : i + ln], i + ln
        elif wtype == I32:
            if i + 4 > n:
                raise ValueError("protowire: truncated fixed32 field")
            val, i = buf[i : i + 4], i + 4
        else:
            raise ValueError(f"protowire: unsupported wire type {wtype}")
        yield field, wtype, val


def fields_dict(buf: bytes) -> dict[int, list]:
    """All fields of a message, keyed by field number (repeated-safe)."""
    out: dict[int, list] = {}
    for field, _, val in iter_fields(buf):
        out.setdefault(field, []).append(val)
    return out


def first(msg: dict[int, list], field: int, default=None):
    """Non-repeated SCALAR field value: protobuf's last-one-wins rule
    (a spec-valid encoder may emit the field twice; parsers must keep
    the last occurrence, not the first)."""
    vals = msg.get(field)
    return vals[-1] if vals else default


def merged(msg: dict[int, list], field: int) -> bytes | None:
    """Non-repeated EMBEDDED-MESSAGE field: protobuf requires MERGING
    multiple occurrences; for wire bytes, concatenation-then-parse is
    exactly that merge. Using only the first (or last) occurrence drops
    whatever the other occurrences carried (e.g. a Sum submessage split
    across two occurrences, each with some datapoints)."""
    vals = msg.get(field)
    return b"".join(vals) if vals else None


def as_u64(val) -> int:
    """fixed64 bytes OR varint int -> unsigned int."""
    return val if isinstance(val, int) else struct.unpack("<Q", val)[0]


def as_i64(val) -> int:
    return val if isinstance(val, int) else struct.unpack("<q", val)[0]


def as_double(val) -> float:
    return struct.unpack("<d", val)[0]


def as_sint(val) -> int:
    """zigzag varint (proto sint32/sint64) -> signed int."""
    u = as_u64(val)
    return (u >> 1) ^ -(u & 1)


def as_str(val: bytes) -> str:
    return val.decode("utf-8", errors="replace")


def _packed_fixed8(vals: list, fmt_char: str, caster) -> list:
    """Repeated 8-byte scalars, packed (LEN of 8-byte chunks) or
    unpacked. One consistent rule for both u64 and double:

    - a varint occurrence is a single unpacked value;
    - 8 bytes is ambiguous between one packed element and one unpacked
      I64 occurrence — identical decode either way;
    - any other multiple of 8 (including 0 — a legal explicit empty
      packed field) decodes as ``len/8`` packed elements;
    - a non-multiple of 8 is a truncated buffer and raises instead of
      silently dropping the tail.
    """
    out: list = []
    for v in vals:
        if isinstance(v, bytes):
            if len(v) % 8:
                raise ValueError(
                    f"protowire: packed fixed64 length {len(v)} is not a "
                    "multiple of 8"
                )
            out.extend(struct.unpack(f"<{len(v) // 8}{fmt_char}", v))
        else:
            out.append(caster(v))
    return out


def packed_varints(vals: list) -> list[int]:
    """repeated varint field (packed or unpacked occurrences) -> ints
    (e.g. ExponentialHistogram Buckets.bucket_counts, repeated uint64
    with varint encoding — unlike HistogramDataPoint's fixed64)."""
    out: list[int] = []
    for v in vals:
        if isinstance(v, int):
            out.append(v)
        else:
            i = 0
            while i < len(v):
                x, i = _read_varint(v, i)
                out.append(x)
    return out


def packed_u64(vals: list) -> list[int]:
    return _packed_fixed8(vals, "Q", as_u64)


def packed_double(vals: list) -> list[float]:
    return _packed_fixed8(vals, "d", as_double)


# ---------------------------------------------------------------------------
# OTLP common.proto
# ---------------------------------------------------------------------------

# AnyValue field numbers (common.proto)
_ANY_STRING, _ANY_BOOL, _ANY_INT, _ANY_DOUBLE = 1, 2, 3, 4


def any_value_str(buf: bytes | None) -> str | None:
    """AnyValue -> string form (scalars stringified, like attr columns)."""
    if buf is None:
        return None
    m = fields_dict(buf)
    if _ANY_STRING in m:
        return as_str(m[_ANY_STRING][0])
    if _ANY_INT in m:
        return str(as_i64(m[_ANY_INT][0]))
    if _ANY_DOUBLE in m:
        return repr(as_double(m[_ANY_DOUBLE][0]))
    if _ANY_BOOL in m:
        return "true" if m[_ANY_BOOL][0] else "false"
    return None


def keyvalues(vals: list) -> list[tuple[str, str | None]]:
    """Repeated KeyValue {key=1, value=2} -> [(key, str value)]."""
    out = []
    for kv in vals:
        m = fields_dict(kv)
        key = as_str(first(m, 1, b""))
        out.append((key, any_value_str(merged(m, 2))))
    return out


def resource_attrs(resource_buf: bytes | None) -> dict[str, str | None]:
    """Resource {attributes=1} -> {key: value}."""
    if resource_buf is None:
        return {}
    return dict(keyvalues(fields_dict(resource_buf).get(1, [])))
