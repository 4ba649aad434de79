"""Telemetry-plane skew decade (r9 verdict task #3).

The dedup plane's skew story is measured (tools/measure_skew.py:
18.3x hot partition, groupBy-vs-window regime); the telemetry plane's
was not. This tool builds the "one noisy pod" fixture — ONE hot
series carrying ~30% of all samples, the zipf head every real metrics
corpus has — and times the two flagged paths over it vs the uniform
corpus at the same row count:

- a9_rate: step_agg (groupBy bucket_ts x series — partial agg
  collapses the hot series map-side, the key includes bucket_ts) ->
  range window partitionBy(series) over AGGREGATED buckets. The
  window partition of the hot series is its BUCKET count — bounded by
  time-range/step, identical for hot and cold series — so the plan is
  structurally skew-resistant; this tool turns that docstring claim
  into a number (reference semantics: promql/leaf_node.go:54-163,
  which walks per-series buckets the same way).
- pqs18_quantile_sketch_route: the DDSketch build's shuffle key is
  (series, log-bucket) with map-side partial counts — the hot series
  fans across its occupied buckets, each bounded by the value range,
  not the sample count.

If either path straggles (skewed/uniform wall ratio demanding it),
the mitigation is the salted two-phase window dd14 got — but the
expected (and r10-measured) answer is ~1x: both shuffles collapse the
hot key before it ever lands on one task.

Fixtures (_READY-gated under .localdata/series_skew{replicas}/):
  uniform/events.parquet — make_sf1-replicated events, untouched
  skewed/events.parquet  — same rows; event_id % 10 < 3 remapped to
                           the single series (event_type='hot_pod',
                           user_id=0), timestamps/values preserved

Usage: python tools/measure_series_skew.py [replicas=10] [iters=2]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT_MOD, HOT_LT = 10, 3  # event_id % 10 < 3 -> ~30% of samples


def make_series_skew(replicas: int) -> tuple[str, str]:
    """Build (uniform_dir, skewed_dir) events-only fixtures at
    replicas x sf0.1. Uniform is make_sf1's events (symlinked);
    skewed remaps the 30% slice onto one series."""
    import duckdb

    from tools.make_sf1 import make_sf1

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = make_sf1(
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        os.path.join(repo, ".localdata/sf1" if replicas == 10 else
                     f".localdata/sf{replicas // 10}0"
                     if replicas == 100 else f".localdata/sfx{replicas}"),
        replicas=replicas,
    )
    root = os.path.join(repo, f".localdata/series_skew{replicas}")
    uni, skw = os.path.join(root, "uniform"), os.path.join(root, "skewed")
    marker = os.path.join(root, "_READY")
    if os.path.exists(marker):
        return uni, skw
    os.makedirs(uni, exist_ok=True)
    os.makedirs(skw, exist_ok=True)
    src = os.path.join(base, "events.parquet")
    link = os.path.join(uni, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    glob = src if src.endswith(".parquet") and os.path.isfile(src) \
        else os.path.join(src, "*.parquet")
    con = duckdb.connect()
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{glob}')"
    ).fetchall()]
    sel = ", ".join(
        f"CASE WHEN event_id % {HOT_MOD} < {HOT_LT} THEN 'hot_pod' "
        f"ELSE {c} END AS {c}" if c == "event_type"
        else f"CASE WHEN event_id % {HOT_MOD} < {HOT_LT} THEN 0 "
             f"ELSE {c} END AS {c}" if c == "user_id"
        else c
        for c in cols
    )
    con.execute(
        f"COPY (SELECT {sel} FROM read_parquet('{glob}')) TO "
        f"'{skw}/events.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)"
    )
    with open(marker, "w") as f:
        f.write("ok\n")
    return uni, skw


def measure(replicas: int = 10, iters: int = 2,
            shuffle_partitions: int = 512) -> dict:
    """Production-like shuffle density (the measure_skew.py argument:
    at 32 partitions an average partition already holds 3% of rows and
    a 30% key is only ~10x it; at 512 the same key is a 150x outlier
    any per-row shuffle would have to absorb)."""
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    from lakerunner_spark.session import get_spark
    from lakerunner_spark.testdata import events_stream

    uni, skw = make_series_skew(replicas)
    spark = get_spark(app_name="measure_series_skew")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    queries = entry_mod.queries()
    try:
        ev = events_stream(spark, skw)
        total = ev.count()
        hot = ev.filter(
            (F.col("event_type") == "hot_pod") & (F.col("user_id") == 0)
        ).count()
        # the structural claim, quantified: the hot series' WINDOW
        # partition is its distinct 10s buckets, not its sample count
        hot_buckets = (
            ev.filter(F.col("event_type") == "hot_pod")
            .select((F.col("chq_timestamp") / 10_000).cast("long"))
            .distinct()
            .count()
        )
        out = {
            "replicas": replicas,
            "rows": total,
            "hot_series_rows": hot,
            "hot_share": round(hot / total, 4),
            "hot_samples_vs_avg_partition": round(
                hot / (total / shuffle_partitions), 1
            ),
            "hot_window_partition_rows": hot_buckets,
            "shuffle_partitions": shuffle_partitions,
        }
        for qname in ("a9_rate", "pqs18_quantile_sketch_route"):
            for tag, d in (("uniform", uni), ("skewed", skw)):
                queries[qname](spark, d).count()  # warmup
                best = float("inf")
                for _ in range(iters):
                    t0 = time.perf_counter()
                    queries[qname](spark, d).count()
                    best = min(best, time.perf_counter() - t0)
                out[f"{qname}_{tag}_sec"] = round(best, 3)
            out[f"{qname}_skew_ratio"] = round(
                out[f"{qname}_skewed_sec"] / out[f"{qname}_uniform_sec"], 3
            )
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


if __name__ == "__main__":
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    print(json.dumps(measure(replicas, iters)))
