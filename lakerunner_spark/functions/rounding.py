"""Engine-portable rounding for cross-engine result parity.

Spark's ROUND rounds the double's shortest decimal representation
(BigDecimal.valueOf -> Double.toString), while DuckDB rounds the exact
binary value; they disagree on half-boundary values like 0.0626875.
``portable_round`` = floor(x*10^dp + 0.5)/10^dp is computed identically
by both engines given identical input doubles, so results hash-match.

``compile_pround`` rewrites the ``pround(expr, dp)`` pseudo-function in
oracle SQL strings into the same floor construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_round(col: Column | str, dp: int) -> Column:
    """NaN/±Inf pass through untouched: Spark's floor() goes through a
    LONG, so floor(NaN) is 0 and floor(±Inf) saturates at ±2^63-1 —
    which would silently turn a NaN result into 0.0 (and ±Inf into
    ±9.2e12) while DuckDB's floor keeps NaN/Inf, a cross-engine parity
    trap (this exact collapse fabricated changes()/resets()
    transitions before range_agg.py guarded it locally)."""
    scale = 10**dp
    c = F.col(col) if isinstance(col, str) else col
    rounded = F.floor(c * scale + F.lit(0.5)) / scale
    return F.when(F.isnan(c) | (F.abs(c) == float("inf")), c).otherwise(
        rounded
    )


def compile_pround(sql: str) -> str:
    """Rewrite pround(expr, dp) -> (floor((expr) * SCALE + 0.5) / SCALE)."""
    out = []
    i = 0
    token = "pround("
    while True:
        j = sql.find(token, i)
        if j < 0:
            out.append(sql[i:])
            return "".join(out)
        out.append(sql[j if False else i : j])
        depth = 1
        k = j + len(token)
        comma = -1
        while depth > 0:
            ch = sql[k]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 1:
                comma = k
            k += 1
        expr = compile_pround(sql[j + len(token) : comma])
        dp = int(sql[comma + 1 : k - 1].strip())
        scale = 10**dp
        out.append(f"(floor(({expr}) * {scale} + 0.5) / {scale})")
        i = k
