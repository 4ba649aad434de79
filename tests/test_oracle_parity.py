"""Mirror of the driver's correctness gate: every queries() entry must
hash-match its oracle_sql() on DuckDB at the test scale factor."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.oracle_harness import compare, duckdb_conn

QUERIES = entry_mod.queries()
ORACLE = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb_conn(sf_dir)
    yield con
    con.close()


# Empty since round 4: the former rows-only sketch queries
# (a5_sketch_quantiles, a6_hll_rollup_merge) are now value-checked via
# the poison pattern (queries_plans.py) — the plan itself certifies the
# sketch's error contract and emits oracle-matchable exact values.
ROWS_ONLY: set[str] = set()


def test_every_query_has_an_oracle():
    missing = set(QUERIES) - set(ORACLE) - ROWS_ONLY
    assert not missing, f"queries without oracle SQL: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(name, spark, sf_dir, oracle_con):
    sdf = QUERIES[name](spark, sf_dir)
    if name in ROWS_ONLY:
        assert sdf.count() > 0, f"{name}: rows-only check found no rows"
        return
    odf = oracle_con.execute(ORACLE[name]).df()
    res = compare(sdf, odf)
    assert res["rows_match"], f"{name}: rows {res['rows_spark']} != {res['rows_oracle']}"
    assert res["cols_match"], f"{name}: cols {res['cols_spark']} != {res['cols_oracle']}"
    assert res["values_match"], f"{name}: value mismatch {res.get('first_diffs')}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"bucket_ts", "event_type", "value"}
