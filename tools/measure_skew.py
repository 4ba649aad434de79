"""Skew-shaped-claim measurement harness (the r7 verdict ask).

dd14/txt11/dd10's docstrings argue their groupBy-first shapes from plan
structure; the bench fixtures are replica-uniform, so the claim "a
min-over-window on the hash partition straggles on hot boilerplate
keys" was never a NUMBER. This tool makes it one:

1. :func:`make_skew` derives a ZIPF-HEADED corpus from sf0.1 — the
   make_sf1 replication (suffixed replicas, disjoint shingles) plus one
   32-token boilerplate banner (4 paragraph chunks) PREPENDED to ~30%
   of documents, the CCNet setting where cookie banners / license
   blurbs repeat across a large fraction of any real crawl. The banner
   is NOT replica-suffixed: its 4 chunk hashes are corpus-global hot
   keys, each carrying ~30% of documents.

2. :func:`measure` times dd14's two physical shapes over the SAME
   paragraph scan (_dd14_keyed):

   - ``groupby`` (shipped): groupBy(h).min(pk) — map-side partial
     aggregation collapses every hot key to one row PER MAPPER before
     the shuffle — then an unhinted join back on h, where AQE can
     skew-split the probe side.
   - ``window``:  min(pk) OVER (PARTITION BY h) — every occurrence of
     a hot hash shuffles to ONE task; AQE cannot split a window
     partition, so the hot key IS the straggler.

   Both shapes produce identical rows (asserted); the timing gap and
   the max-partition-row evidence land in PLANS.md.

Run: python tools/measure_skew.py [src_sf_dir] [dst_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 32 tokens = 4 eight-token paragraph chunks, all corpus-global hot keys
BANNER = (
    "this website uses cookies to ensure you get the best experience "
    "on our site by continuing to browse you accept our terms of "
    "service and privacy policy click here to dismiss this"
)
assert len(BANNER.split()) == 32, "banner must be exactly 4 paragraph chunks"
HOT_MOD, HOT_LT = 10, 3  # doc_id % 10 < 3 -> ~30% of docs carry the banner


def make_skew(src: str, dst: str, replicas: int = 100) -> str:
    """documents-only zipf fixture: make_sf1's replication with the
    banner prepended to the hot slice (idempotent, _READY-gated)."""
    import duckdb

    marker = os.path.join(dst, "_READY")
    if os.path.exists(marker):
        return dst
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    stride = 1_000_000_000
    body = (
        "CASE WHEN rep = 0 THEN t.text "
        "ELSE replace(t.text, ' ', 'r' || rep || ' ') END"
    )
    text = (
        f"CASE WHEN t.doc_id % {HOT_MOD} < {HOT_LT} "
        f"THEN '{BANNER} ' || {body} ELSE {body} END"
    )
    sql = (
        f"SELECT t.doc_id + rep * {stride} AS doc_id, {text} AS text, "
        f"t.lang, t.source, CAST(length({text}) AS BIGINT) AS n_chars "
        f"FROM read_parquet('{src}/documents.parquet') t "
        f"CROSS JOIN (SELECT unnest(range({replicas})) AS rep) reps"
    )
    con.execute(
        f"COPY ({sql}) TO '{dst}/documents.parquet' "
        "(FORMAT PARQUET, COMPRESSION ZSTD)"
    )
    with open(marker, "w") as f:
        f.write("ok\n")
    return dst


def _shapes(spark, skew_dir: str):
    """Returns (keyed_builder, {shape_name: builder}) — BUILDERS, not
    DataFrames: re-collecting one DataFrame object lets Spark skip its
    already-materialized shuffle stages (job-level stage reuse), which
    times the cache, not the shape. Each timed iteration constructs a
    fresh plan (the bench.py discipline)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lakerunner_spark.queries_dataops import _dd14_keyed

    def keyed():
        d = spark.read.parquet(os.path.join(skew_dir, "documents.parquet"))
        return _dd14_keyed(d)

    def census(marked):
        dup = F.col("pk") != F.col("mpk")
        return marked.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_paras"),
            F.sum(dup.cast("long")).alias("n_removed"),
        )

    def shape_groupby():
        k = keyed()
        firsts = k.groupBy("h").agg(F.min("pk").alias("mpk"))
        return census(k.join(firsts, "h"))

    def shape_window():
        k = keyed()
        w = Window.partitionBy("h")
        return census(k.withColumn("mpk", F.min("pk").over(w)))

    return keyed, {"groupby": shape_groupby, "window": shape_window}


def measure(skew_dir: str, iters: int = 3, shuffle_partitions: int = 512) -> dict:
    """Times both shapes at PRODUCTION-LIKE shuffle density.

    Why the partition override matters for an honest measurement: skew
    is the ratio of the hot key's rows to the AVERAGE partition. At the
    test default (32 partitions) the average partition already holds
    ~3% of the corpus, so a banner key with 3% of rows is invisible; a
    real cluster runs thousands of shuffle partitions, where the same
    key is a 100-1000x outlier one task must absorb. 512 partitions
    reproduce that regime at local scale (hot key ~18x the average
    partition here); AQE coalesces the small window partitions but can
    never SPLIT the hot one — only the groupBy shape's map-side
    partial aggregation removes the key before the shuffle."""
    from pyspark.sql import functions as F

    from lakerunner_spark.session import get_spark

    spark = get_spark(app_name="measure_skew")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        return _measure(spark, skew_dir, iters)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _measure(spark, skew_dir: str, iters: int) -> dict:
    from pyspark.sql import functions as F

    keyed, shapes = _shapes(spark, skew_dir)

    # the zipf head, quantified: rows behind the hottest hash keys
    k = keyed()
    hot = (
        k.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc())
        .limit(5)
        .collect()
    )
    total = k.count()
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    out = {
        "total_paras": total,
        "hot_keys": [int(r["n"]) for r in hot],
        "shuffle_partitions": n_part,
        "hot_vs_avg_partition": round(
            int(hot[0]["n"]) / (total / n_part), 1
        ),
    }
    results = {}
    for name, build in shapes.items():
        build().collect()  # warmup: codegen/compile outside the timing
        best = float("inf")
        for _ in range(iters):
            df = build()  # fresh plan per iteration (no stage reuse)
            t0 = time.perf_counter()
            rows = {tuple(r) for r in df.collect()}
            best = min(best, time.perf_counter() - t0)
        out[f"{name}_sec"] = round(best, 3)
        results[name] = sorted(rows)
    assert results["groupby"] == results["window"], "shapes disagree"
    # AQE skew evidence on the shipped shape's join (final plan)
    final = shapes["groupby"]()
    final.collect()
    plan = final._jdf.queryExecution().executedPlan().toString()
    out["groupby_plan_has_skew_handling"] = (
        "skew=true" in plan or "isSkew=true" in plan
    )
    return out


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".localdata/skew1",
        )
    )
    # dims etc. are not needed — documents only
    make_skew(src, dst)
    print(measure(dst))
