"""Skew-resistant aggregation: two-phase salted groupBy.

AQE's skew-join splitting handles joins, but a groupBy with one giant
key still funnels that key's rows through a single reducer. Salting
splits each key into ``salt_n`` subkeys for the first (wide) exchange,
then merges the tiny per-salt partials — the standard remedy when a
telemetry tenant or dedup bucket dominates (SURVEY 'skewed keys hurt').

Only algebraic aggregates are offered (sum/count/min/max — the
engine's rollup core), because they compose across salts exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts add across salts
    "min": F.min,
    "max": F.max,
}
_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(c),
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_n: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) then groupBy(keys).

    ``aggs`` maps output column -> (func, input column), func in
    {sum, count, min, max}. Result is EXACTLY equal to the direct
    groupBy (tested), with the first shuffle's key cardinality
    multiplied by salt_n so no reducer owns a whole hot key.

    The salt is a DETERMINISTIC function of the row (hash of every
    aggregated input column), never ``rand()``: a random salt is a
    nondeterministic shuffle key, and a fetch-failure map-stage retry
    would re-salt rows differently — reducers that committed partials
    from the first attempt then double-count (or drop) rows silently.
    Hashing the value columns also spreads a hot key's rows because hot
    keys are hot across many distinct values; identical rows land on
    one salt, which is correct (they aggregate the same either way).
    """
    for func, _ in aggs.values():
        if func not in _PARTIAL:
            raise ValueError(f"salted_agg: non-algebraic func {func!r}")
    in_cols = sorted({col for _, col in aggs.values()})
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in in_cols]), salt_n)
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _PARTIAL[func](F.col(col)).alias(out)
            for out, (func, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGE[func](F.col(out)).alias(out)
            for out, (func, _col) in aggs.items()
        ]
    )
