"""LogQL unwrap conversion functions: duration() and bytes() (F6/F7, P12).

Reference emits a CASE over a regex-extracted number+unit
(logql/sql_builder.go:965-1015). We provide both a Column builder
(Spark) and an equivalent ANSI-SQL string builder (used to generate
oracle SQL for DuckDB parity tests) — both built from the same unit
tables so they can't drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# unit -> seconds multiplier (logql duration units; sql_builder.go:965-979)
DURATION_UNITS: list[tuple[str, float]] = [
    ("ns", 1e-9),
    ("us", 1e-6),
    ("µs", 1e-6),
    ("ms", 1e-3),
    ("s", 1.0),
    ("m", 60.0),
    ("h", 3600.0),
]

# unit -> bytes multiplier (sql_builder.go:981-1015)
BYTES_UNITS: list[tuple[str, float]] = [
    ("KiB", 1024.0),
    ("MiB", 1024.0**2),
    ("GiB", 1024.0**3),
    ("TiB", 1024.0**4),
    ("PiB", 1024.0**5),
    ("EiB", 1024.0**6),
    ("KB", 1e3),
    ("MB", 1e6),
    ("GB", 1e9),
    ("TB", 1e12),
    ("PB", 1e15),
    ("EB", 1e18),
    ("B", 1.0),
]

_NUM_RE = r"([0-9]*\.?[0-9]+)"
_DUR_UNIT_RE = r"(ns|us|µs|ms|s|m|h)"
# case-insensitive like the reference (sql_builder.go:983 upper()s the
# unit before matching — "2kb" and "2KB" both parse)
_BYTES_UNIT_RE = r"((?i:KiB|MiB|GiB|TiB|PiB|EiB|KB|MB|GB|TB|PB|EB|B))"


def duration_to_seconds(col: Column | str) -> Column:
    """Parse '250ms' / '1.5s' / '2m' ... -> seconds (double). A value
    with no recognized unit falls back to a plain numeric cast — the
    reference's CASE ... ELSE try_cast(col AS DOUBLE)
    (sql_builder.go:968-977), so bare numbers unwrap as seconds."""
    c = F.col(col) if isinstance(col, str) else col
    num = F.regexp_extract(c, _NUM_RE + _DUR_UNIT_RE, 1)
    unit = F.regexp_extract(c, _NUM_RE + _DUR_UNIT_RE, 2)
    value = F.when(num == "", F.lit(None)).otherwise(num.cast("double"))
    expr = None
    for u, m in DURATION_UNITS:
        cond = unit == F.lit(u)
        expr = F.when(cond, F.lit(m)) if expr is None else expr.when(cond, F.lit(m))
    mult = expr.otherwise(F.lit(None))
    return F.coalesce(value * mult, c.try_cast("double"))


def bytes_to_bytes(col: Column | str) -> Column:
    """Parse '5KiB' / '3MB' / '2kb' / '12B' ... -> bytes (double), else
    NULL. Unit matching is case-insensitive (the reference upper()s the
    unit before matching: KIB == KiB == kib, kb == KB)."""
    c = F.col(col) if isinstance(col, str) else col
    num = F.regexp_extract(c, _NUM_RE + _BYTES_UNIT_RE, 1)
    unit = F.upper(F.regexp_extract(c, _NUM_RE + _BYTES_UNIT_RE, 2))
    value = F.when(num == "", F.lit(None)).otherwise(num.cast("double"))
    expr = None
    for u, m in BYTES_UNITS:
        cond = unit == F.lit(u.upper())
        expr = F.when(cond, F.lit(m)) if expr is None else expr.when(cond, F.lit(m))
    mult = expr.otherwise(F.lit(None))
    # unit-less values fall back to a plain numeric cast (reference
    # CASE ... ELSE try_cast, sql_builder.go:985-999)
    return F.coalesce(value * mult, c.try_cast("double"))


def duration_to_seconds_sql(col_sql: str) -> str:
    """ANSI SQL equivalent of duration_to_seconds (for the DuckDB oracle)."""
    pat = _NUM_RE + _DUR_UNIT_RE
    num = f"try_cast(regexp_extract({col_sql}, '{pat}', 1) AS DOUBLE)"
    unit = f"regexp_extract({col_sql}, '{pat}', 2)"
    whens = " ".join(
        f"WHEN '{u}' THEN {m!r}" for u, m in DURATION_UNITS
    )
    return (f"coalesce({num} * (CASE {unit} {whens} ELSE NULL END),"
            f" try_cast({col_sql} AS DOUBLE))")


def bytes_to_bytes_sql(col_sql: str) -> str:
    """ANSI SQL equivalent of bytes_to_bytes (for the DuckDB oracle)."""
    pat = _NUM_RE + _BYTES_UNIT_RE
    num = f"try_cast(regexp_extract({col_sql}, '{pat}', 1) AS DOUBLE)"
    unit = f"upper(regexp_extract({col_sql}, '{pat}', 2))"
    whens = " ".join(f"WHEN '{u.upper()}' THEN {m!r}" for u, m in BYTES_UNITS)
    return (f"coalesce({num} * (CASE {unit} {whens} ELSE NULL END),"
            f" try_cast({col_sql} AS DOUBLE))")
