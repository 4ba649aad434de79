"""Deterministic hash functions (F15/F16).

- ``fnv64a`` / ``compute_tid``: the reference identifies a time series by
  TID = fnv64a over the sorted ``k=v`` attribute pairs
  (internal/oteltools/pkg/fingerprinter/tid.go:69-117). Reimplemented
  bit-for-bit as a PURE Spark SQL expression (aggregate over the UTF-8
  byte sequence) — the ingest hot path stays inside whole-stage codegen,
  no Python anywhere. 64-bit wrapping arithmetic is ANSI-safe via 32-bit
  half decomposition: h is carried as (hi, lo) 32-bit halves and the FNV
  prime 0x100000001B3 = 2^40 + 435, so every intermediate fits well
  inside a signed 64-bit long (max ~2^42) and overflow never occurs.
- ``java_string_hash``: trigram fingerprint hash ``h = 31*h + c`` over
  UTF-16 code units (internal/fingerprint/fingerprint.go:144-172), same
  expression-only approach (surrogate pairs expanded in the fold).
- ``portable_hash64``: engine-neutral 64-bit hash built purely from
  ``md5`` + hex→int, available identically in Spark SQL and DuckDB —
  used by MinHash/SimHash so the correctness oracle can reproduce it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_FNV64_OFFSET = 0xCBF29CE484222325
_FNV64_PRIME = 0x100000001B3
_MASK64 = 0xFFFFFFFFFFFFFFFF


def _fnv64a_bytes(data: bytes) -> int:
    h = _FNV64_OFFSET
    for b in data:
        h ^= b
        h = (h * _FNV64_PRIME) & _MASK64
    return h


def fnv64a_py(s: str) -> int:
    """fnv64a of a UTF-8 string, as signed int64 (two's complement)."""
    h = _fnv64a_bytes(s.encode("utf-8"))
    return h - (1 << 64) if h >= (1 << 63) else h


def java_string_hash_py(s: str) -> int:
    """Java String.hashCode()-style loop, 32-bit wrap, over UTF-16 code
    units — supplementary code points hash as their surrogate pair,
    exactly like the JVM (fingerprint.go:149-172)."""
    h = 0
    for ch in s:
        cp = ord(ch)
        if cp >= 0x10000:
            cp -= 0x10000
            h = (31 * h + (0xD800 + (cp >> 10))) & 0xFFFFFFFF
            h = (31 * h + (0xDC00 + (cp & 0x3FF))) & 0xFFFFFFFF
        else:
            h = (31 * h + cp) & 0xFFFFFFFF
    return h - (1 << 32) if h >= (1 << 31) else h


# FNV offset basis split into 32-bit halves; prime = 2^40 + 435
_OFF_HI = _FNV64_OFFSET >> 32
_OFF_LO = _FNV64_OFFSET & 0xFFFFFFFF
_M32 = 0xFFFFFFFF


def _as_expr(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def fnv64a(col: Column | str) -> Column:
    """fnv64a of a UTF-8 string as a pure SQL expression (signed int64).

    Fold over the byte sequence with the state as two 32-bit halves
    (named_struct hi/lo). One step, h' = (h XOR b) * (2^40 + 435):

        lo1 = lo ^ b                       (b only touches the low byte)
        h'*435  -> lo: (lo1*435) & M32, carry: (lo1*435) >> 32
        h'<<40  -> contributes (lo1 << 8) & M32 to hi only
                   (hi<<40 overflows past bit 63 entirely; lo1<<40's
                   low 32 bits are zero)
        hi' = (hi*435 + carry + ((lo1 << 8) & M32)) & M32

    Every intermediate is < 2^42 — no 64-bit overflow, ANSI-safe.
    Byte extraction: hex(encode(s)) walked two nibbles at a time.
    """
    c = _as_expr(col)
    # Byte access via substring on the BINARY value — O(1) per byte
    # (binary substring is byte-indexed; substring/split on a STRING
    # would scan UTF-8 from the front, and a regex split-to-chars is
    # ~100x slower — both measured). hex+conv on a single byte is a
    # 2-char parse, cheap and codegen'd.
    bin_ = F.encode(c, "UTF-8")
    m32 = F.lit(_M32)
    bytes_arr = F.when(
        F.length(bin_) == 0, F.array().cast("array<bigint>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(bin_)),
            lambda i: F.conv(F.hex(F.substring(bin_, i, F.lit(1))), 16, 10).cast(
                "long"
            ),
        )
    )
    zero = F.struct(
        F.lit(_OFF_HI).cast("long").alias("hi"),
        F.lit(_OFF_LO).cast("long").alias("lo"),
    )

    def _step(acc: Column, b: Column) -> Column:
        lo1 = acc.getField("lo").bitwiseXOR(b)
        t1 = lo1 * 435
        new_lo = t1.bitwiseAND(m32)
        new_hi = (
            acc.getField("hi") * 435
            + F.shiftright(t1, 32)
            + F.shiftleft(lo1, 8).bitwiseAND(m32)
        ).bitwiseAND(m32)
        return F.struct(new_hi.alias("hi"), new_lo.alias("lo"))

    def _finish(acc: Column) -> Column:
        return F.shiftleft(acc.getField("hi"), 32).bitwiseOR(acc.getField("lo"))

    return F.when(c.isNotNull(), F.aggregate(bytes_arr, zero, _step, _finish))


def java_string_hash(col: Column | str) -> Column:
    """Java String.hashCode() (h = 31*h + c over UTF-16 code units) as a
    pure SQL expression. UTF-16BE encoding yields exactly the JVM's code
    unit sequence — supplementary code points arrive as their surrogate
    pair with no special-casing; each unit is two bytes read O(1) off
    the binary. 32-bit wrap via & mask (max intermediate < 2^38 —
    ANSI-safe)."""
    c = _as_expr(col)
    bin_ = F.encode(c, "UTF-16BE")
    units = F.when(
        F.length(bin_) == 0, F.array().cast("array<bigint>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), (F.length(bin_) / 2).cast("int")),
            lambda i: F.conv(
                F.hex(F.substring(bin_, i * 2 - 1, F.lit(2))), 16, 10
            ).cast("long"),
        )
    )
    folded = F.aggregate(
        units,
        F.lit(0).cast("long"),
        lambda h, u: (31 * h + u).bitwiseAND(F.lit(_M32)),
    )
    signed = F.when(folded >= 2147483648, folded - 4294967296).otherwise(folded)
    return F.when(c.isNotNull(), signed)


# ---------------------------------------------------------------------------
# Vectorized fast path (bulk ingest)
#
# The SQL-expression folds above are pure-JVM but run as higher-order
# functions (transform/aggregate), which are CodegenFallback: every
# byte-step is an interpreted expression-tree walk. Measured on this
# box (local[32], 1M rows of ~30-byte strings): expression fnv64a
# ~0.11M rows/s TOTAL (~3.5k rows/s/core); the numpy kernel below does
# ~0.7M rows/s on ONE core (~200x/core), Arrow-batched. Bulk ingest
# (translate_metrics/translate_logs) uses the fast path; the expression
# versions remain as the zero-Python option and the DuckDB-oracle twin
# (both produce identical bits — property-tested in test_hashing).
# ---------------------------------------------------------------------------


def _ragged_bytes(series, dtype):
    """(lens, offsets, flat) view of a pandas Series of bytes objects."""
    import numpy as np

    vals = series.to_numpy()
    lens = np.fromiter((len(b) for b in vals), dtype=np.int64, count=len(vals))
    total = b"".join(vals)
    flat = np.frombuffer(total, dtype=dtype)
    offs = np.concatenate(([0], np.cumsum(lens)[:-1])) if len(vals) else lens
    return lens, offs, flat


def fnv64a_batch(s):
    """Vectorized fnv64a over a pandas Series of strings -> nullable
    Int64 Series (NULL in = NULL out, same as the expression). The fold
    is position-parallel: one masked (xor, mul) over every still-active
    row per byte position, wrapping in uint64."""
    import numpy as np
    import pandas as pd

    mask = s.isna()
    b = s.fillna("").str.encode("utf-8")
    n = len(b)
    out = np.full(n, _FNV64_OFFSET, dtype=np.uint64)
    if n:
        lens, offs, flat = _ragged_bytes(b, np.uint8)
        prime = np.uint64(_FNV64_PRIME)
        with np.errstate(over="ignore"):
            for j in range(int(lens.max()) if len(lens) else 0):
                active = lens > j
                pos = offs[active] + j
                out[active] = (out[active] ^ flat[pos].astype(np.uint64)) * prime
    res = pd.Series(out.view(np.int64), index=s.index, dtype="Int64")
    res[mask] = pd.NA
    return res


def java_string_hash_batch(s):
    """Vectorized Java String.hashCode over a pandas Series of strings
    -> nullable Int64 (UTF-16BE code units, 31*h + u, 32-bit wrap,
    sign-extended) — same bits as :func:`java_string_hash`."""
    import numpy as np
    import pandas as pd

    mask = s.isna()
    b = s.fillna("").str.encode("utf-16-be")
    n = len(b)
    out = np.zeros(n, dtype=np.uint32)
    if n:
        lens, offs, flat = _ragged_bytes(b, ">u2")
        lens //= 2
        offs //= 2
        t31 = np.uint32(31)
        with np.errstate(over="ignore"):
            for j in range(int(lens.max()) if len(lens) else 0):
                active = lens > j
                pos = offs[active] + j
                out[active] = out[active] * t31 + flat[pos].astype(np.uint32)
    res = pd.Series(
        out.view(np.int32).astype(np.int64), index=s.index, dtype="Int64"
    )
    res[mask] = pd.NA
    return res


def _make_fast_udf(kernel):
    from pyspark.sql.types import LongType

    return F.pandas_udf(kernel, LongType())


def fnv64a_fast(col: Column | str) -> Column:
    """Arrow-batched vectorized fnv64a — identical bits to
    :func:`fnv64a`, ~200x the per-core throughput (see module note)."""
    return _make_fast_udf(fnv64a_batch)(_as_expr(col).cast("string"))


def java_string_hash_fast(col: Column | str) -> Column:
    """Arrow-batched vectorized Java string hash — identical bits to
    :func:`java_string_hash`."""
    return _make_fast_udf(java_string_hash_batch)(_as_expr(col).cast("string"))


def compute_tid(
    metric_name: Column | str, *attr_cols: str, fast: bool = False
) -> Column:
    """TID for a series: fnv64a over 'metric_name=<v>' + sorted 'attr=<v>'.

    Mirrors tid.go:69-117 — keys sorted lexicographically, null/empty
    attributes skipped, pairs joined with '|'. ``fast=True`` hashes via
    the vectorized Arrow kernel (same bits; use for bulk ingest).
    """
    name_col = F.col(metric_name) if isinstance(metric_name, str) else metric_name
    parts = [F.concat(F.lit("metric_name="), name_col)]
    for key in sorted(attr_cols):
        parts.append(
            F.when(
                F.col(key).isNotNull() & (F.col(key).cast("string") != ""),
                F.concat(F.lit(f"{key}="), F.col(key).cast("string")),
            )
        )
    joined = F.concat_ws("|", *parts)
    return fnv64a_fast(joined) if fast else fnv64a(joined)


def fnv64a_sql(s_sql: str) -> str:
    """DuckDB twin of :func:`fnv64a` — same hex-walk + 32-bit-half fold
    via ``list_reduce`` (the offset basis is prepended so the first
    lambda application is exactly ``(offset ^ b0) * prime``). Bit-for-bit
    parity lets the driver's oracle hash-match TID values (F15)."""
    hx = f"hex(encode({s_sql}))"
    xs = (
        f"[struct_pack(hi := {_OFF_HI}::BIGINT, lo := {_OFF_LO}::BIGINT)] || "
        f"list_transform(range(1, length({hx})//2 + 1), "
        f"i -> struct_pack(hi := 0::BIGINT, "
        f"lo := CAST(('0x' || substr({hx}, (i*2-1)::INT, 2)) AS BIGINT)))"
    )
    red = (
        f"list_reduce({xs}, (acc, e) -> struct_pack("
        f"hi := (acc.hi * 435 + ((xor(acc.lo, e.lo) * 435) >> 32)"
        f" + ((xor(acc.lo, e.lo) << 8) & {_M32})) & {_M32}, "
        f"lo := (xor(acc.lo, e.lo) * 435) & {_M32}))"
    )
    return (
        f"list_transform([{red}], r -> "
        f"(r.hi - CASE WHEN r.hi >= 2147483648 THEN 4294967296 ELSE 0 END)"
        f" * 4294967296 + r.lo)[1]"
    )


def compute_tid_sql(metric_sql: str, *attr_cols: str) -> str:
    """DuckDB twin of :func:`compute_tid` (concat_ws skips NULL parts in
    both engines; empty attr values are skipped like tid.go)."""
    parts = [f"'metric_name=' || {metric_sql}"]
    for key in sorted(attr_cols):
        parts.append(
            f"CASE WHEN {key} IS NOT NULL AND CAST({key} AS VARCHAR) != ''"
            f" THEN '{key}=' || CAST({key} AS VARCHAR) END"
        )
    joined = f"concat_ws('|', {', '.join(parts)})"
    return fnv64a_sql(joined)


def portable_hash64(col: Column | str, seed: int = 0) -> Column:
    """Engine-portable 64-bit-ish hash: int(md5(seed||s)[:15], 16).

    15 hex digits = 60 bits, fits a signed BIGINT in every engine.
    DuckDB equivalent: ``from_hex``-free form used in oracle SQL:
    CAST(('0x' || substr(md5(<seed> || s), 1, 15)) AS BIGINT)
    (DuckDB parses 0x literals) — see portable_hash64_sql.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(F.concat(F.lit(str(seed)), c)), 1, 15), 16, 10).cast(
        "long"
    )


def portable_hash64_sql(col_sql: str, seed: int = 0) -> str:
    """DuckDB SQL equivalent of portable_hash64."""
    return (
        f"CAST(('0x' || substr(md5('{seed}' || {col_sql}), 1, 15)) AS BIGINT)"
    )
