"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the operator catalog (lakerunner_spark.queries
and its registrations) for the DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import lakerunner_spark.queries as _q  # noqa: E402
import lakerunner_spark.queries_relational  # noqa: E402,F401 (registers)
import lakerunner_spark.queries_dataops  # noqa: E402,F401 (registers)
import lakerunner_spark.queries_frontends  # noqa: E402,F401 (registers)
import lakerunner_spark.queries_plans  # noqa: E402,F401 (registers)
import lakerunner_spark.queries_rangefns  # noqa: E402,F401 (registers)
import lakerunner_spark.queries_sketch  # noqa: E402,F401 (registers)
import lakerunner_spark.queries_multimodal  # noqa: E402,F401 (registers)
import lakerunner_spark.queries_spans  # noqa: E402,F401 (registers)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sum by (event_type) (rate(events[5m])) on sf0.001,
    through the FULL lifecycle — PromQL string -> parser -> AST ->
    DataFrame compiler (SURVEY §3.1/§7.2): leaf step aggregation (A3)
    -> sliding range window rate (A9) -> vector aggregation (A7).
    """
    from pyspark.sql import functions as F

    from lakerunner_spark.catalog import default_metric_catalog
    from lakerunner_spark.promql.compiler import compile_promql

    df = compile_promql(
        "sum by (event_type) (rate(events[5m]))",
        default_metric_catalog(spark, "/root/testdata/sf0.001"),
        60_000,
    )
    return df.filter(F.col("value").isNotNull()).withColumn(
        "value", F.round("value", 6)
    )


# Curated leading order: one high-value entry per operator family so a
# prefix sample of the catalog exercises every plane (scan/pipeline/
# ingest/join/agg/window/frontends/relational/dataops/multimodal) —
# the remaining registrations follow in registration order.
_PRIORITY = [
    # r13 rotation (r12 verdict task #6, the standing >=15-entry
    # protocol). Rotated IN (17), the longest-unseen rows the verdict
    # named plus this round's touched surfaces: a8_topk, pqs1, sp5,
    # sp8, otlp1, lqs23, lqs24, ds10, ds11, sim5/sim6/sim7 (the ANN
    # members under sim8's frontier — sim3/sim6's const-fold rewrite
    # re-certifies through them), dd11v, dd12s (the arrow k-means
    # route), txt12s (this round's unigram shared-pass rewrite),
    # ddm1/ddm5 (ddm1 re-certifies the vectorized BMP decode).
    # Rotated DOWN (17, every one gate-certified green in
    # CORRECTNESS_r12, families still above the line): mm2-mm7 (mm1
    # stays up for the byte-histogram plane; all seven passed their
    # first gate in r12), dd15/ds15 (funnel via dd7/dd10-family rows,
    # histogram via ds12), lqs15/lqs17/lqs19 (line/label filters via
    # lqs23/lqs24 + lqs1/lqs3), pqs37/pqs39/pqs40 (their range/limit
    # families via pqs1/pqs4/pqs18/pqs43), w3 (last_over_time via
    # pqs4/lqs1 range fns), f9/f10 (scalar math via f17), a14/a15/a16
    # (summary/metadata via a6/a13). The NULL-key trio stays under
    # the gate every round (r10 task #4 standing); cook1/chq2/chq3
    # stay up to re-certify the cook cascade after this round's
    # last-tier persist change.
    "s1_scan_project_filter",
    "cook1_metrics_tid",
    "a13_aggfile_route",
    "a6_hll_rollup_merge",
    "j1_vector_arith",
    "pqs4_quantile_over_time",
    "sp7_operation_latency_sketch",
    "pqs18_quantile_sketch_route",
    "lqs1_log_rate",
    "lqs3_unwrap_max",
    "f17_ts_normalize",
    "txt12n_sketch_buckets_null_keys",
    "ds9n_sketch_filter_null_keys",
    "txt13n_pipeline_null_keys",
    "tpch_q18_large_volume",
    "chq3_sketch_stats_segments",
    "pqs43_native_histogram_quantile",
    "maint1_compaction_requery",
    "dd7_neardup_clusters",
    "dd13_substring_decontaminate",
    "dd17_decontaminate_spans",
    "sim8_ann_frontier",
    "ds12_dsir_selection",
    "txt13_ccnet_pipeline",
    "dd18_substring_pipeline",
    "ddm3_video_neardup",
    "ddm4_semantic_image_dedup",
    "chq2_cooked_sketch_segments",
    "o4_ordered_slices_concat",
    "mm1_byte_histogram",
    "a8_topk",
    "pqs1_sum_rate",
    "sp5_trace_rollup",
    "sp8_error_trace_spans",
    "otlp1_exp_histogram_quantile",
    "lqs23_or_line_filter",
    "lqs24_label_filter_or",
    "ds10_temperature_mixture",
    "ds11_epoch_shuffle",
    "sim5_kmeans",
    "sim6_random_projection",
    "sim7_pq_topk",
    "dd11v_substring_verify",
    "dd12s_semantic_dedup_sampled",
    "txt12s_ccnet_sketch_buckets",
    "ddm1_image_neardup",
    "ddm5_audio_neardup",
    "pqs40_limitk",
    "lqs15_pattern_line_filter",
    "a14_summary",
    # -- below the driver's 50-sample line ------------------------------
    # r13 downs (all r12-gate-certified; see rotation note above):
    "mm2_png_features",
    "mm3_wav_features",
    "mm4_bmp_features",
    "mm5_avi_frame_stats",
    "mm6_audio_frames",
    "mm7_image_patches",
    "dd15_dedup_funnel",
    "ds15_length_histogram",
    "lqs17_ip_filter",
    "lqs19_unpack",
    "pqs37_time_arith",
    "pqs39_at_modifier",
    "w3_last_over_time",
    "f9_math_unary",
    "f10_clamp",
    "a15_distinct_values",
    "a16_metadata",
    # r12 downs (r11-gate-certified):
    "a9x_deriv",
    "pqs23_group_left_share",
    "tpch_q21_waiting_supplier",
    "ds9s_quality_sketch_filter",
    # (late-r11: ds13 moved down for chq3_sketch_stats_segments, the
    # round's new reference-faithful sketch-percentiles surface; ds13's
    # sampling family stays above via ds10/ds11/ds12)
    "ds13_weighted_sample",
    "a3_step_agg",
    "a9_rate",
    "dd11_substring_dedup",
    "chq1_sketch_interop_quantile",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "ds8_leakage_free_split",
    "ds14_shard_manifest",
    "dd2_minhash_lsh",
    "dd12_semantic_dedup",
    "dd16_substring_remove",
    "dd14_global_paragraph_dedup",
    "ds3_sequence_pack",
    "pqs48_native_histogram_mixed_schema",
    # below the driver's 50-sample line: every entry above touches a
    # distinct operator family; these variants stay oracle-checked in
    # tests/test_oracle_parity.py. Rotated down in r6 (certified by the
    # r5 driver gate): a1, a2, o1, p7, p8, p9, sp3; in r5 (by the r4
    # gate): a9x_deriv, a6_cardinality, lqs9, lqs15, pqs4, sp4. Late-r6
    # rotation makes room for the newest surface (sp8, txt11, ds10/11,
    # dd14, ds12, ds13): lqs19, pqs39, lqs12, dd8, sim1, fp1, mm1 move
    # down, all r5-gate-certified; lqs10, ds4, sim5 likewise for
    # mm6/mm7/sim7; pqs20 for ds14; a5 for chq1; txt10, sp5 for
    # ds15/dd15. r7: pqs42, ds11, and ds10 (all r6-gate-certified)
    # rotate down for pqs48 (cross-schema downscale merge), dd12s
    # (sampled two-level SemDeDup), and dd16 (exact-substring span
    # removal), the round's new surface.
    # (dd15 likewise r6-certified, down for txt12's CCNet terciles)
    # r8: txt11, mm6, pqs44, ds15, ds13 (all r7-gate-certified) rotate
    # down for the round's new surface — txt12s (windowless CCNet
    # terciles), dd17 (span-level decontamination), ddm1 (perceptual-
    # hash image dedup), sim8 (ANN quality frontier), txt13 (the CCNet
    # pipeline end-to-end); their families stay above the line via
    # dd14/txt12, mm7, pqs43/pqs48, ds12/ds14. r9: tpch_q9, ds9,
    # dd3, txt12 (all r8-gate-certified green) rotate down for the
    # round's new surface — dd18 (Lee et al. substring pipeline
    # end-to-end), ddm3 (video temporal-run near-dup), ddm4 (semantic
    # image dedup), chq2 (cooked chq_sketch segments read back by the
    # interop decode path); their families stay above the line via
    # q1/q3/q5/q18/q21, ds9s, dd2/dd11v, txt12s/txt13; sim7 likewise
    # (r8-certified) for ddm5 (audio near-dup), its PQ family carried
    # by sim8's frontier; x1 (r8-certified) for o4_ordered_slices_concat
    # (the O4 slice-concat equality under the gate), its DDSketch
    # family carried by chq1/chq2/pqs18.
    "x1_ddsketch_p95",
    "tpch_q9_product_profit",
    "ds9_quality_percentile_filter",
    "dd3_jaccard_verify",
    "txt12_ccnet_buckets",
    "txt11_paragraph_dedup",
    "pqs44_native_histogram_fraction",
    "pqs42_native_histogram_fields",
    "txt10_bm25",
    "a5_sketch_quantiles",
    "pqs20_predict_linear",
    "lqs10_label_replace",
    "ds4_domain_mixture",
    "lqs12_pattern",
    "dd8_decontaminate",
    "sim1_cosine_topk",
    "fp1_structural_fingerprint",
    "a1_preagg_10s",
    "a2_rollup_chain",
    "o1_order_limit",
    "p7_json_parser",
    "p8_logfmt_roundtrip",
    "p9_regexp_parser",
    "sp3_trace_lookup",
    "a6_cardinality",
    "lqs9_decolorize",
    "sp4_span_duration_rate",
    "lqs21_ipv6_filter",
    "lqs22_logfmt_error",
    "sp6_span_edges",
    "txt9_unigram_logprob",
    "dd5_embedding_neardup",
    "ds6_chunk_documents",
    "dd1_dedup_exact",
    "ds1_hash_split",
    "txt1_text_stats",
    "txt5_repetition_filter",
    "lqs16_duration_bytes_filter",
    "lqs18_error_label",
    "ds5_token_budget_cap",
    "pqs41_limit_ratio",
    "x1_ddsketch_signed_median",
    "j3_vector_and",
    "p3_time_range",
    "p6_line_filter",
    "pqs2_topk_count",
    "pqs16_label_replace",
    "lqs4_exemplar",
    "tpch_q13_order_distribution",
    "u2_union_streams",
    "w5_running_revenue",
]


def _ordered(d: dict) -> dict:
    out = {k: d[k] for k in _PRIORITY if k in d}
    out.update({k: v for k, v in d.items() if k not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY §2 (+ dataops)."""
    return _ordered(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return _ordered(_q.ORACLE)
