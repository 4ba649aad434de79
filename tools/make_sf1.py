"""Deterministic sf1 scale-up: 10 key-shifted replicas of sf0.1.

The driver ships sf{0.001,0.01,0.1} only; the 100×-scale story needs at
least one measured scale step, so this derives an sf1 dataset from sf0.1
(read-only input) into a gitignored cache dir. Replication is pure
key-arithmetic — no RNG — so the output is bit-stable run to run:

- dims (region, nation) copy unchanged;
- customer/supplier/part/orders/lineitem replicate with every key
  column shifted by ``rep * STRIDE``, preserving referential integrity
  within each replica (orders.o_custkey -> customer replica r, lineitem
  follows its orders replica's part/supp keys);
- events replicates with shifted event_id/user_id at the SAME
  timestamps — a 10× denser fleet, which is how telemetry actually
  scales;
- documents replicate with shifted doc_id; replicas r >= 1 get every
  word suffixed with ``r{r}`` (space -> "r{r} " replacement), so word
  n-gram shingle sets across replicas are DISJOINT: the corpus is 10
  independent copies of the original near-dup problem (candidate volume
  scales ~10×), not a 10-way duplicate explosion (C(10,2) pair volume,
  which would measure the dataset trick, not the engine);
- embeddings replicate with shifted vec_id (vectors unchanged — ANN
  candidate lists grow 10×, recall structure preserved per replica).

DuckDB does the generation (columnar rewrite, ~seconds); a _READY
marker gates readers against partial output.
"""

from __future__ import annotations

import os

STRIDE = 1_000_000_000

TABLES = (
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
)

_KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}


def _replicated_sql(src: str, table: str, replicas: int) -> str:
    shift = ", ".join(
        f"t.{k} + rep * {STRIDE} AS {k}" for k in _KEYED.get(table, [])
    )
    if table == "documents":
        # replica 0 keeps the original text; later replicas suffix every
        # non-final word (token count unchanged, shingles disjoint)
        sel = (
            f"t.doc_id + rep * {STRIDE} AS doc_id, "
            "CASE WHEN rep = 0 THEN t.text "
            "ELSE replace(t.text, ' ', 'r' || rep || ' ') END AS text, "
            "t.lang, t.source, "
            "CASE WHEN rep = 0 THEN t.n_chars "
            "ELSE CAST(length(replace(t.text, ' ', 'r' || rep || ' ')) AS BIGINT) "
            "END AS n_chars"
        )
    else:
        keyed = set(_KEYED.get(table, []))
        rest = ", ".join(f"t.{c}" for c in _COLS[table] if c not in keyed)
        sel = ", ".join(x for x in (shift, rest) if x)
    return (
        f"SELECT {sel} FROM read_parquet('{src}/{table}.parquet') t "
        f"CROSS JOIN (SELECT unnest(range({replicas})) AS rep) reps"
    )


_COLS: dict[str, list[str]] = {}


def make_sf1(src: str, dst: str, replicas: int = 10) -> str:
    """Generate the scaled dataset under ``dst`` (idempotent)."""
    import duckdb

    marker = os.path.join(dst, "_READY")
    if os.path.exists(marker):
        return dst
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        _COLS[t] = [
            r[0]
            for r in con.execute(
                f"describe select * from read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        if t in ("region", "nation"):
            sql = f"SELECT * FROM read_parquet('{src}/{t}.parquet')"
        else:
            sql = _replicated_sql(src, t, replicas)
        con.execute(
            f"COPY ({sql}) TO '{dst}/{t}.parquet' "
            "(FORMAT PARQUET, COMPRESSION ZSTD)"
        )
    with open(marker, "w") as f:
        f.write("ok\n")
    return dst


if __name__ == "__main__":
    import sys

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(__file__)), ".localdata/sf1")
    )
    print(make_sf1(src, dst))
