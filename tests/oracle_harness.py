"""Local replica of the driver's correctness gate.

Runs each queries() entry on Spark and its oracle_sql() on DuckDB over
the same sf dir, then compares row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted,
NaN==NULL). Used by tests/test_oracle_parity.py and by hand while
iterating.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        if v == int(v) and abs(v) < 2**53:
            return float(v)  # normalize -0.0 etc.
        return v
    return v


def _normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(type(x)), x) for x in r))


def compare(spark_df, oracle_df: pd.DataFrame) -> dict:
    sp = spark_df.toPandas()
    res = {
        "rows_spark": len(sp),
        "rows_oracle": len(oracle_df),
        "cols_spark": sorted(sp.columns),
        "cols_oracle": sorted(oracle_df.columns),
    }
    res["rows_match"] = res["rows_spark"] == res["rows_oracle"]
    res["cols_match"] = res["cols_spark"] == res["cols_oracle"]
    if not (res["rows_match"] and res["cols_match"]):
        res["values_match"] = False
        return res
    a = _normalize(sp)
    b = _normalize(oracle_df)
    res["values_match"] = a == b
    if not res["values_match"]:
        diffs = [(x, y) for x, y in zip(a, b) if x != y]
        res["first_diffs"] = diffs[:5]
    return res
