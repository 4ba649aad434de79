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

    The approximate HLL form is a6_hll_rollup_merge, value-checked via
    the poison pattern below; sketch tolerance properties also have
    direct tests in tests/test_sketches.py.
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


# -- sketch queries, value-checked via the poison pattern -------------------
#
# An approximate result can't hash-match an exact oracle directly, and
# rounding both sides to a tolerance grid is boundary-fragile. Instead
# the Spark plan validates the sketch against the exact value computed
# IN THE SAME PLAN and emits the oracle-matchable exact value only when
# the sketch honors its error contract; a contract violation emits the
# raw estimate, which hash-mismatches loudly. Hash-match therefore
# proves "sketch within tolerance for every group", not just row counts.

_A5_QUANTILES = [0.25, 0.5, 0.75, 0.9, 0.95, 0.99]
_A5_RANK_TOL = 0.01  # realized-rank tolerance; sketch contract is 1e-4


def _a5_oracle() -> str:
    from lakerunner_spark.operators.sketches import _q_label

    cols = ", ".join(
        f"pround(quantile_cont(value, {q}), 6) AS {_q_label(q)}"
        for q in _A5_QUANTILES
    )
    return f"SELECT event_type, {cols} FROM {_E} e GROUP BY event_type"


@register("a5_sketch_quantiles", _a5_oracle())
def a5_sketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: mergeable quantile sketch per event_type, value-checked.

    percentile_approx (accuracy 10k, rank error 1e-4) supplies the
    sketch value; the same plan measures its REALIZED rank
    (count(value <= approx)/n) and the exact interpolated quantile.
    Within-rank-tolerance groups emit the exact quantile (which the
    DuckDB quantile_cont oracle hash-matches); violations emit the
    approx value as poison. Reference contract: aggregator.go sketch
    merge tiers answer quantiles without raw rescans."""
    from lakerunner_spark.functions.rounding import portable_round
    from lakerunner_spark.operators.sketches import _q_label

    e = events_stream(spark, sf_dir)
    labels = [_q_label(q) for q in _A5_QUANTILES]
    sk = quantile_sketch_agg(e, ["event_type"], "value", _A5_QUANTILES)
    approx = sk.select(
        "event_type", *[F.col(l).alias(f"a_{l}") for l in labels]
    )
    j = e.join(F.broadcast(approx), "event_type")
    aggs = [F.count("value").alias("n")]
    for q, l in zip(_A5_QUANTILES, labels):
        aggs.append(
            F.sum((F.col("value") <= F.col(f"a_{l}")).cast("long")).alias(f"r_{l}")
        )
        aggs.append(F.percentile("value", F.lit(q)).alias(f"e_{l}"))
        aggs.append(F.first(f"a_{l}").alias(f"a_{l}"))
    g = j.groupBy("event_type").agg(*aggs)
    outcols = [F.col("event_type")]
    for q, l in zip(_A5_QUANTILES, labels):
        within = (
            F.abs(F.col(f"r_{l}") / F.col("n") - F.lit(q)) <= _A5_RANK_TOL
        )
        outcols.append(
            F.when(within, portable_round(F.col(f"e_{l}"), 6))
            .otherwise(F.col(f"a_{l}"))
            .alias(l)
        )
    return g.select(*outcols)


_A6_HLL_TOL = 0.05  # lg_k=12 -> RSE ~1.6%; 5% ≈ 3σ


@register(
    "a6_hll_rollup_merge",
    f"""
    SELECT event_type, CAST(count(DISTINCT event_id) AS BIGINT) AS cardinality
    FROM {_E} e GROUP BY event_type
    """,
)
def a6_hll_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/X4: HLL sketch bytes per (event_type, user bucket), merged to
    event_type tier, then estimated — the chq_sketch storage pattern —
    value-checked: the estimate must land within the HLL error envelope
    of the exact distinct count computed in the same plan (poison
    pattern above), so the exact-count oracle hash-match certifies the
    whole rollup->merge->estimate chain."""
    e = events_stream(spark, sf_dir)
    fine = hll_sketch_rollup(e, ["event_type", "user_id"], "event_id")
    coarse = hll_sketch_merge(fine, ["event_type"])
    est = hll_estimate(coarse)
    exact = e.groupBy("event_type").agg(
        F.count_distinct("event_id").alias("exact_n")
    )
    j = est.join(F.broadcast(exact), "event_type")
    within = (
        F.abs(F.col("cardinality") - F.col("exact_n")) / F.col("exact_n")
        <= _A6_HLL_TOL
    )
    return j.select(
        "event_type",
        F.when(within, F.col("exact_n"))
        .otherwise(F.col("cardinality"))
        .cast("long")
        .alias("cardinality"),
    )
