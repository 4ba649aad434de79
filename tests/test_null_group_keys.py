"""NULL group keys, exercised with DATA (r9 verdict task #4).

r9 made the ds9s/txt12s/txt13 oracles null-safe (`IS NOT DISTINCT
FROM`, mirroring sampling._nullsafe_attach) — but the driver fixtures
contain no NULL lang/source, so those routes ran dead. This suite
builds a VARIANT fixture dir (documents with NULL lang + NULL source
slices planted; every other table linked from the real sf dir) and
re-runs the REGISTERED queries against their REGISTERED oracles over
it — the same compare the driver gate uses — plus direct route tests
for rank_buckets' NULL-score rule (sampling.py:451), which no oracle
covers because the documented parity scope excludes NULL scores.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod
from tests.oracle_harness import compare, duckdb_conn

QUERIES = entry_mod.queries()
ORACLE = entry_mod.oracle_sql()

# lang drives txt12s's tercile groups; source drives ds9s's filter
# groups; txt13's group key (pred_lang) is DERIVED from text, so its
# null-safe join is defensive — still run on the fixture to prove the
# pipeline tolerates NULL keys upstream.
NULL_KEY_QUERIES = [
    "ds9s_quality_sketch_filter",
    "txt12s_ccnet_sketch_buckets",
    "txt13_ccnet_pipeline",
]
LANG_NULL_MOD, LANG_NULL_RES = 17, 3
SRC_NULL_MOD, SRC_NULL_RES = 23, 5

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def null_sf_dir(sf_dir, tmp_path_factory) -> str:
    """sf_dir variant: documents.parquet rewritten with deterministic
    NULL-lang and NULL-source slices; other tables symlinked."""
    import duckdb

    dst = tmp_path_factory.mktemp("null_keys_sf")
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if t != "documents":
            os.symlink(src, dst / f"{t}.parquet")
            continue
        duckdb.connect().execute(
            f"""
            COPY (
              SELECT doc_id, text,
                     CASE WHEN doc_id % {LANG_NULL_MOD} = {LANG_NULL_RES}
                          THEN NULL ELSE lang END AS lang,
                     CASE WHEN doc_id % {SRC_NULL_MOD} = {SRC_NULL_RES}
                          THEN NULL ELSE source END AS source,
                     n_chars
              FROM read_parquet('{src}')
            ) TO '{dst / "documents.parquet"}' (FORMAT PARQUET)
            """
        )
    return str(dst)


@pytest.fixture(scope="module")
def null_oracle_con(null_sf_dir):
    con = duckdb_conn(null_sf_dir)
    yield con
    con.close()


def test_fixture_actually_contains_null_keys(null_sf_dir):
    """The regression the verdict asked for: if the planting ever
    stops producing NULL keys (schema change, generator drift), this
    fails before the parity tests silently go dead again."""
    import duckdb

    row = duckdb.connect().execute(
        f"""
        SELECT count(*) FILTER (lang IS NULL),
               count(*) FILTER (source IS NULL),
               count(*) FILTER (lang IS NOT NULL),
               count(*) FILTER (source IS NOT NULL)
        FROM read_parquet('{null_sf_dir}/documents.parquet')
        """
    ).fetchone()
    n_lang_null, n_src_null, n_lang, n_src = row
    assert n_lang_null >= 10 and n_src_null >= 10
    assert n_lang > 0 and n_src > 0  # mixed, not degenerate


@pytest.mark.parametrize("name", NULL_KEY_QUERIES)
def test_parity_with_null_group_keys(name, spark, null_sf_dir, null_oracle_con):
    """The registered query vs its registered oracle, over the fixture
    with NULL keys present — the exact compare the driver gate runs."""
    sdf = QUERIES[name](spark, null_sf_dir)
    odf = null_oracle_con.execute(ORACLE[name]).df()
    res = compare(sdf, odf)
    assert res["rows_match"], f"{name}: rows {res['rows_spark']} != {res['rows_oracle']}"
    assert res["cols_match"], f"{name}: cols {res['cols_spark']} != {res['cols_oracle']}"
    assert res["values_match"], f"{name}: value mismatch {res.get('first_diffs')}"


def test_null_group_rows_survive_into_results(spark, null_sf_dir):
    """The NULL group is a GROUP, not a dropped row: txt12s emits
    buckets for lang=NULL, and ds9s keeps NULL-source docs that clear
    their own group's threshold (a plain inner equi-join would have
    discarded every one of them)."""
    t = QUERIES["txt12s_ccnet_sketch_buckets"](spark, null_sf_dir)
    null_lang = [r for r in t.collect() if r["lang"] is None]
    assert null_lang, "txt12s lost the NULL-lang group"
    assert sum(r["n_docs"] for r in null_lang) >= 10

    d = QUERIES["ds9s_quality_sketch_filter"](spark, null_sf_dir)
    assert any(r["source"] is None for r in d.collect()), (
        "ds9s lost every NULL-source doc"
    )


def test_rank_buckets_null_scores_follow_the_documented_rule(spark):
    """sampling.py's NULL-score rule with live NULLs: the sketch route
    pins NULL scores to labels[0] (mirroring the window route's
    nulls-first ordering), including for a group whose EVERY score is
    NULL (its thresholds come back NULL through the left join), and
    the NULL GROUP still buckets its non-null scores correctly."""
    from lakerunner_spark.dataops.sampling import rank_buckets

    rows = []
    # group 'a': 9 real scores + one NULL (NULL fraction 0.1 < 1/3,
    # inside the documented exactness scope)
    rows += [("a", float(i), i) for i in range(1, 10)]
    rows += [("a", None, 10)]
    # group of ALL-NULL scores: no sketch row exists for it
    rows += [("allnull", None, 11), ("allnull", None, 12)]
    # NULL group key with real scores: gets its own thresholds
    rows += [(None, float(i), 20 + i) for i in range(1, 10)]
    df = spark.createDataFrame(rows, "g string, score double, id long")

    for mode in ("window", "sketch"):
        got = {
            r["id"]: r["bucket"]
            for r in rank_buckets(
                df, "score", "g", [1 / 3, 2 / 3],
                ["head", "middle", "tail"], mode=mode,
                tiebreak_col="id",
            ).collect()
        }
        assert len(got) == len(rows)  # no row dropped, either route
        assert got[10] == "head", mode      # NULL score -> lowest bucket
        # ALL-NULL group: the sketch route pins every row to labels[0]
        # (thresholds come back NULL through the left join); the window
        # route with a tiebreak gives NULL rows DISTINCT ranks and
        # SPREADS them — exactly the documented divergence scope
        # (sampling.py NULL-score note), asserted as such
        if mode == "sketch":
            assert got[11] == got[12] == "head"
        else:
            assert {got[11], got[12]} == {"head", "tail"}
        # NULL group key: terciles over ITS OWN 9 scores. The window
        # route is rank-exact; the sketch route may flip the doc AT a
        # boundary by its relative-error contract, so pin the exact
        # split only there and the unambiguous shape on both.
        null_grp = [got[20 + i] for i in range(1, 10)]
        if mode == "window":
            assert null_grp == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
        else:
            assert null_grp[0] == "head" and null_grp[-1] == "tail"
            assert set(null_grp) == {"head", "middle", "tail"}
            assert null_grp == sorted(
                null_grp, key=["head", "middle", "tail"].index
            )  # monotone in score
        # group 'a' non-null scores: the NULL occupies the bottom
        # rank, so the tail of each tercile is where the routes may
        # differ by sketch error — pin the unambiguous ends instead
        assert got[1] == "head" and got[9] == "tail", mode


def test_gate_variants_plant_null_keys_and_sit_in_top50(spark, sf_dir):
    """r10 verdict task #4's pin: the NULL-planted GATE variants
    (ds9n/txt12n/txt13n) actually contain NULL group keys at every sf
    (the planting is in-query, so a fixture regeneration can never
    silently drop it), emit NULL-key result groups, and sit inside the
    driver's 50-sample prefix so the gate certifies the NULL routes
    every round."""
    from lakerunner_spark.queries_dataops import _null_planted_docs

    d = _null_planted_docs(spark, sf_dir)
    assert d.filter("lang IS NULL").count() > 0
    assert d.filter("source IS NULL").count() > 0
    assert d.filter("lang IS NOT NULL").count() > 0  # slices, not all

    top50 = list(entry_mod.queries())[:50]
    for name in (
        "ds9n_sketch_filter_null_keys",
        "txt12n_sketch_buckets_null_keys",
        "txt13n_pipeline_null_keys",
    ):
        assert name in top50, name

    rows = QUERIES["ds9n_sketch_filter_null_keys"](spark, sf_dir).collect()
    assert any(r["source"] is None for r in rows)
    rows = QUERIES["txt12n_sketch_buckets_null_keys"](spark, sf_dir).collect()
    assert any(r["lang"] is None for r in rows)
