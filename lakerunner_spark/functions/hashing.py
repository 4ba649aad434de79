"""Deterministic hash functions (F15/F16).

- ``fnv64a`` / ``compute_tid``: the reference identifies a time series by
  TID = fnv64a over the sorted ``k=v`` attribute pairs
  (internal/oteltools/pkg/fingerprinter/tid.go:69-117). Reimplemented
  bit-for-bit so indexes stay compatible; vectorized as a Pandas UDF
  (Arrow batches — the ingest hot path must not be row-at-a-time Python).
- ``java_string_hash``: trigram fingerprint hash ``h = 31*h + c``
  (internal/fingerprint/fingerprint.go:144-172).
- ``portable_hash64``: engine-neutral 64-bit hash built purely from
  ``md5`` + hex→int, available identically in Spark SQL and DuckDB —
  used by MinHash/SimHash so the correctness oracle can reproduce it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

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
    """Java String.hashCode()-style loop, 32-bit wrap (fingerprint.go:149-172)."""
    h = 0
    for ch in s:
        h = (31 * h + ord(ch)) & 0xFFFFFFFF
    return h - (1 << 32) if h >= (1 << 31) else h


@pandas_udf(T.LongType())
def fnv64a(series: pd.Series) -> pd.Series:
    return series.map(lambda s: fnv64a_py(s) if s is not None else None).astype(
        "Int64"
    )


@pandas_udf(T.LongType())
def java_string_hash(series: pd.Series) -> pd.Series:
    return series.map(
        lambda s: java_string_hash_py(s) if s is not None else None
    ).astype("Int64")


def compute_tid(metric_name: Column | str, *attr_cols: str) -> Column:
    """TID for a series: fnv64a over 'metric_name=<v>' + sorted 'attr=<v>'.

    Mirrors tid.go:69-117 — keys sorted lexicographically, null/empty
    attributes skipped, pairs joined with '|'.
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
    return fnv64a(joined)


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
