#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: one per engine plane — scan-agg, window rate, vector join,
# multi-join relational, topk, dedup pipeline, ANN, text stats, plus the
# PromQL/LogQL front-ends and the planner-routing paths
HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q13_order_distribution",
    "tpch_q16_supplier_cnt",
    "tpch_q18_large_volume",
    "tpch_q21_waiting_supplier",
    "cook1_metrics_tid",
    "a3_step_agg",
    "a9_rate",
    "a9_sparse_sum_over_time",
    "a8_topk",
    "j1_vector_arith",
    "a14_summary",
    "o1_order_limit",
    "pqs1_sum_rate",
    "pqs18_quantile_sketch_route",
    "pqs20_predict_linear",
    "pqs23_group_left_share",
    "lqs3_unwrap_max",
    "lqs12_pattern",
    "lqs10_label_replace",
    "a13_aggfile_route",
    "a6_cardinality",
    "x1_ddsketch_p95",
    "dd2_minhash_lsh",
    "dd3_jaccard_verify",
    "dd4_simhash",
    "dd5_embedding_neardup",
    "sim1_cosine_topk",
    "txt1_text_stats",
    "mm1_byte_histogram",
    "fp1_structural_fingerprint",
    "dd7_neardup_clusters",
    "ds1_hash_split",
    "ds3_sequence_pack",
    "dd8_decontaminate",
    "ds4_domain_mixture",
    "txt5_repetition_filter",
    "txt7_quality_pipeline",
    "dd10_dedup_pipeline",
    "dd11_substring_dedup",
]

# the 10 heaviest plans, re-run at sf1 (10× rows) as the measured scale
# step — wall time should grow ~linearly if the plan audit is honest
SF1_HEADLINE = [
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q9_product_profit",
    "tpch_q18_large_volume",
    "tpch_q21_waiting_supplier",
    "dd2_minhash_lsh",
    "dd3_jaccard_verify",
    "dd7_neardup_clusters",
    "dd10_dedup_pipeline",
    "dd11_substring_dedup",
    "pqs18_quantile_sketch_route",
]


def main() -> None:
    from lakerunner_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="lakerunner_bench")
    queries = entry_mod.queries()

    # JVM/codegen warmup outside the measured window (steady-state is
    # what a long-running cluster serves)
    from lakerunner_spark.testdata import load_table

    load_table(spark, SF_DIR, "lineitem").limit(1000).count()
    load_table(spark, SF_DIR, "events").limit(1000).count()

    iterations = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "2"))
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = queries[name]
        best, n = float("inf"), 0
        for _ in range(iterations):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            n = df.count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.3f}s ({n} rows)", file=sys.stderr)

    out = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
    }
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out["sf"] = float(sf) if sf.replace(".", "").isdigit() else sf

    # sf1 scale step: the 10 heaviest queries at 10× the default bench
    # size (deterministic key-shifted replication of sf0.1 — see
    # tools/make_sf1.py). Measures that the plan shapes that argue
    # "scale-safe" actually grow ~linearly in wall time.
    if out["sf"] == 0.1 and os.environ.get("SPARK_GRAFT_SF1", "1") != "0":
        from tools.make_sf1 import make_sf1

        sf1_dir = make_sf1(
            SF_DIR, os.path.join(os.path.dirname(__file__), ".localdata/sf1")
        )
        sf1_timings: dict[str, float] = {}
        sf1_total = 0.0
        for name in SF1_HEADLINE:
            fn = queries[name]
            best, n = float("inf"), 0
            for _ in range(iterations):
                t0 = time.perf_counter()
                df = fn(spark, sf1_dir)
                n = df.count()
                best = min(best, time.perf_counter() - t0)
            sf1_timings[name] = round(best, 3)
            sf1_total += best
            print(f"# sf1 {name}: {best:.3f}s ({n} rows)", file=sys.stderr)
        out["sf1_queries"] = sf1_timings
        out["sf1_total_sec"] = round(sf1_total, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
