"""Planner/sketch query catalog: routing rules, index pruning, cardinality.

The routing queries (A13, J6) assert a plan-level property through the
oracle: the routed/pruned plan must produce byte-identical results to
the direct plan the oracle states — i.e. the optimization is
semantics-preserving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakerunner_spark.operators.sketches import (
    hll_estimate,
    hll_sketch_merge,
    hll_sketch_rollup,
    quantile_sketch_agg,
)
from lakerunner_spark.plans.aggfile import build_agg_table, route_count_query
from lakerunner_spark.plans.pruning import build_fingerprint_index, pruned_scan
from lakerunner_spark.queries import register
from lakerunner_spark.testdata import EVENTS_MS_SQL, events_stream, load_table

_E = f"({EVENTS_MS_SQL})"


@register(
    "a13_aggfile_route",
    f"""
    SELECT chq_timestamp - chq_timestamp % 600000 AS bucket_ts, event_type,
           count(*) AS count
    FROM {_E} e
    WHERE event_type IN ('error', 'click')
    GROUP BY 1, 2
    """,
)
def a13_aggfile_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: count query routed through the 10s pre-agg side table.

    The oracle states the direct raw-scan count — parity proves the
    routed plan (sum of 10s partial counts) is equivalent.
    """
    e = events_stream(spark, sf_dir)
    agg = build_agg_table(e, ["event_type"])
    out, used_agg = route_count_query(
        raw=e,
        agg=agg,
        agg_dims=["event_type"],
        step_ms=600_000,
        query_dims=["event_type"],
        filters=[F.col("event_type").isin("error", "click")],
        filter_dims=["event_type"],
    )
    assert used_agg, "router must choose the agg table here"
    return out


@register(
    "j6_index_prune",
    """
    SELECT source, count(*) AS n_docs
    FROM documents
    WHERE contains(lower(text), 'spark')
    GROUP BY source
    """,
)
def j6_index_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: fingerprint-index segment pruning before the scan.

    ``source`` plays the segment key. The pruned scan (trigram
    semi-join) + residual filter must equal the oracle's full-scan
    filter — pruning may never drop a matching segment.
    """
    d = load_table(spark, sf_dir, "documents")
    index = build_fingerprint_index(d, "source", "text")
    pruned = pruned_scan(d, index, "source", "spark")
    return (
        pruned.filter(F.lower(F.col("text")).contains("spark"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "a6_cardinality",
    f"""
    SELECT event_type, count(DISTINCT user_id) AS cardinality
    FROM {_E} e GROUP BY event_type
    """,
)
def a6_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 exact form: distinct users per event type (oracle-checkable).

    The approximate HLL forms are a5_hll_* (rows-only) with tolerance
    tests in tests/test_sketches.py.
    """
    e = events_stream(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("cardinality")
    )


@register(
    "a15_tag_names",
    f"""
    SELECT 'event_type' AS tag_name, count(event_type) AS n_nonnull FROM {_E} e
    UNION ALL SELECT 'user_id', count(user_id) FROM {_E} e
    UNION ALL SELECT 'value', count(value) FROM {_E} e
    UNION ALL SELECT 'props', count(props) FROM {_E} e
    """,
)
def a15_tag_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15 tag-names: which label columns exist with data (schema
    introspection + non-null count; logql/sql_builder.go:117-196)."""
    e = events_stream(spark, sf_dir)
    tags = ["event_type", "user_id", "value", "props"]
    counts = e.agg(
        *[F.count(c).alias(c) for c in tags]
    )
    stacked = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("tag_name"), F.col(c).alias("n_nonnull")
                    )
                    for c in tags
                ]
            )
        ).alias("kv")
    )
    return stacked.select("kv.tag_name", "kv.n_nonnull")


# -- rows-only sketch queries (no SQL oracle: approximate results) ----------


@register("a5_sketch_quantiles")
def a5_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: mergeable KLL quantile sketch per event_type (rows-only check;
    tolerance vs exact quantiles asserted in tests/test_sketches.py)."""
    e = events_stream(spark, sf_dir)
    return quantile_sketch_agg(e, ["event_type"], "value")


@register("a6_hll_rollup_merge")
def a6_hll_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/X4: HLL sketch bytes per (event_type, user bucket), merged to
    event_type tier, then estimated — the chq_sketch storage pattern."""
    e = events_stream(spark, sf_dir)
    fine = hll_sketch_rollup(e, ["event_type", "user_id"], "event_id")
    coarse = hll_sketch_merge(fine, ["event_type"])
    return hll_estimate(coarse).orderBy("event_type")
