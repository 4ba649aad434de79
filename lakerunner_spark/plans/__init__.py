"""Planner-side routing rules (SURVEY §4 'custom' rows): rollup-tier
selection, agg-file routing (A13), and index-based segment pruning (J6).

These are plan-construction-time choices in plain Python — no Catalyst
surgery — exactly as the reference makes them in its query builders.
"""

from lakerunner_spark.plans.aggfile import build_agg_table, route_count_query
from lakerunner_spark.plans.pruning import build_fingerprint_index, pruned_scan
from lakerunner_spark.plans.tiers import pick_rollup_tier

__all__ = [
    "build_agg_table",
    "route_count_query",
    "build_fingerprint_index",
    "pruned_scan",
    "pick_rollup_tier",
]
