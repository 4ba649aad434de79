"""Spans/trace query family + remaining PromQL agg coverage.

The spans table is synthesized from events (span_name <- event_type,
span_duration <- value-derived ns) exactly as the API's span view —
the reference's span worker SQL shapes (logql/spans_worker_sql.go:95-112)
are duration aggregates and exemplar selections over these columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakerunner_spark.functions.rounding import portable_round as _pr
from lakerunner_spark.queries import register
from lakerunner_spark.testdata import EVENTS_MS_SQL

_E = f"({EVENTS_MS_SQL})"

_SPANS_SQL = f"""
  SELECT CAST(event_id AS VARCHAR) AS span_trace_id,
         event_type AS span_name, chq_timestamp,
         CAST(round(value * 1000000) AS BIGINT) AS span_duration, user_id
  FROM {_E} e
"""


def _spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakerunner_spark.testdata import events_stream

    e = events_stream(spark, sf_dir)
    return e.select(
        F.col("event_id").cast("string").alias("span_trace_id"),
        F.col("event_type").alias("span_name"),
        "chq_timestamp",
        F.round(F.col("value") * 1e6).cast("long").alias("span_duration"),
        "user_id",
    )


@register(
    "sp1_span_duration_stats",
    f"""
    SELECT span_name, count(*) AS n_spans,
           CAST(sum(span_duration) AS BIGINT) AS total_ns,
           pround(quantile_cont(span_duration, 0.5), 4) AS p50_ns,
           pround(quantile_cont(span_duration, 0.95), 4) AS p95_ns,
           CAST(max(span_duration) AS BIGINT) AS max_ns
    FROM ({_SPANS_SQL})
    GROUP BY span_name
    """,
)
def sp1_span_duration_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span duration stats per operation (spans_worker_sql.go shapes)."""
    s = _spans(spark, sf_dir)
    return s.groupBy("span_name").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_duration").alias("total_ns"),
        _pr(F.percentile("span_duration", 0.5), 4).alias("p50_ns"),
        _pr(F.percentile("span_duration", 0.95), 4).alias("p95_ns"),
        F.max("span_duration").alias("max_ns"),
    )


@register(
    "sp2_slowest_traces",
    f"""
    SELECT span_trace_id, span_name, span_duration
    FROM ({_SPANS_SQL})
    WHERE span_name = 'purchase'
    ORDER BY span_duration DESC, span_trace_id ASC LIMIT 20
    """,
)
def sp2_slowest_traces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exemplar span query: slowest 20 purchase spans (global top-n)."""
    s = _spans(spark, sf_dir).filter(F.col("span_name") == "purchase")
    return (
        s.orderBy(F.col("span_duration").desc(), F.col("span_trace_id").asc())
        .limit(20)
        .select("span_trace_id", "span_name", "span_duration")
    )


@register(
    "pqs10_quantile_agg",
    f"""
    SELECT bucket_ts, pround(quantile_cont(value, 0.9), 6) AS value
    FROM (
      SELECT chq_timestamp - chq_timestamp % 3600000 AS bucket_ts,
             user_id, avg(value) AS value
      FROM {_E} e WHERE event_type = 'view'
      GROUP BY 1, 2
    )
    GROUP BY bucket_ts
    """,
)
def pqs10_quantile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 quantile aggregation over series at each bucket (front-end)."""
    from lakerunner_spark.catalog import default_metric_catalog
    from lakerunner_spark.promql.compiler import compile_promql

    df = compile_promql(
        'quantile(0.9, sum by (user_id) (events{event_type="view"}))',
        default_metric_catalog(spark, sf_dir),
        3_600_000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "pqs11_bottomk",
    f"""
    WITH base AS (
      SELECT chq_timestamp - chq_timestamp % 60000 AS bucket_ts, user_id,
             CAST(count(value) AS DOUBLE) AS value
      FROM {_E} e WHERE event_type = 'click' GROUP BY 1, 2
    )
    SELECT bucket_ts, user_id, value FROM (
      SELECT *, row_number() OVER (
        PARTITION BY bucket_ts ORDER BY value ASC, user_id ASC) AS rn
      FROM base
    ) WHERE rn <= 2
    """,
)
def pqs11_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 bottomk via the front-end (count-valued for exact ranking)."""
    from lakerunner_spark.catalog import default_metric_catalog
    from lakerunner_spark.promql.compiler import compile_promql

    return compile_promql(
        'bottomk(2, sum by (user_id) (count_over_time(events{event_type="click"}[1m])))',
        default_metric_catalog(spark, sf_dir),
        60_000,
    )

_TRACED_SPANS_SQL = f"""
  SELECT CAST(user_id AS VARCHAR) || '-' ||
           CAST(chq_timestamp - chq_timestamp % 3600000 AS VARCHAR)
           AS span_trace_id,
         CAST(event_id AS VARCHAR) AS span_id,
         event_type AS span_name, chq_timestamp,
         CAST(round(value * 1000000) AS BIGINT) AS span_duration
  FROM {_E} e
"""


def _traced_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span view with MULTI-SPAN traces: spans by the same user within
    the same hour share a trace (the synthetic analogue of the span
    table's span_trace_id/span_id base columns,
    spans_worker_sql.go:98-112)."""
    from lakerunner_spark.testdata import events_stream

    e = events_stream(spark, sf_dir)
    trace = F.concat(
        F.col("user_id").cast("string"),
        F.lit("-"),
        (F.col("chq_timestamp") - F.col("chq_timestamp") % 3_600_000).cast(
            "string"
        ),
    )
    return e.select(
        trace.alias("span_trace_id"),
        F.col("event_id").cast("string").alias("span_id"),
        F.col("event_type").alias("span_name"),
        "chq_timestamp",
        F.round(F.col("value") * 1e6).cast("long").alias("span_duration"),
    )


@register(
    "sp3_trace_lookup",
    f"""
    WITH s AS ({_TRACED_SPANS_SQL}),
    top_trace AS (
      SELECT span_trace_id FROM s GROUP BY span_trace_id
      ORDER BY count(*) DESC, span_trace_id ASC LIMIT 1
    )
    SELECT s.span_trace_id, s.span_id, s.span_name,
           s.chq_timestamp, s.span_duration
    FROM s JOIN top_trace USING (span_trace_id)
    ORDER BY s.chq_timestamp ASC, s.span_id ASC
    """,
)
def sp3_trace_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trace-id exemplar lookup: every span of one trace, time-ordered
    (the reference's exemplar finalizeSelect path orders by chq_tsns,
    spans_worker_sql.go:85-88). The trace is chosen deterministically
    (largest span count, id tiebreak); the lookup itself is a broadcast
    semi-join on span_trace_id — at 100 TB the same shape rides the
    fingerprint/segment index instead of a scan, but the per-trace
    result is always tiny."""
    s = _traced_spans(spark, sf_dir)
    top = (
        s.groupBy("span_trace_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), F.col("span_trace_id").asc())
        .limit(1)
        .select("span_trace_id")
    )
    return (
        s.join(F.broadcast(top), "span_trace_id")
        .orderBy(F.col("chq_timestamp").asc(), F.col("span_id").asc())
        .select(
            "span_trace_id", "span_id", "span_name",
            "chq_timestamp", "span_duration",
        )
    )


@register(
    "sp4_span_duration_rate",
    f"""
    SELECT chq_timestamp - chq_timestamp % 3600000 AS bucket_ts,
           span_name,
           pround(sum(span_duration) / 3600.0 / 1000000.0, 6) AS rate_ms
    FROM ({_SPANS_SQL})
    GROUP BY 1, 2
    """,
)
def sp4_span_duration_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """span_duration-unwrap range aggregation over spans, THROUGH the
    LogQL compiler (the reference compiles spans range aggs with the
    same LogLeaf pipeline + unwrap machinery as logs,
    spans_worker_sql.go:21-88): rate({span_name=~".+"} | unwrap
    span_duration [1h]) at 1h step — windowed sum / range seconds per
    span_name, scaled ns->ms for float-parity-friendly magnitudes."""
    from lakerunner_spark.logql.compiler import LogSource, compile_logql

    s = _spans(spark, sf_dir)
    src = LogSource(
        s,
        labels=["span_name", "span_duration"],
        line_col="span_name",
        ts_col="chq_timestamp",
    )
    df = compile_logql(
        'rate({span_name=~".+"} | unwrap span_duration [1h])',
        src,
        3_600_000,
    )
    return df.select(
        "bucket_ts",
        "span_name",
        _pr(F.col("value") / 1e6, 6).alias("rate_ms"),
    )


@register(
    "sp5_trace_rollup",
    f"""
    WITH RECURSIVE s AS (
      SELECT span_trace_id, span_id, span_name, span_duration,
             row_number() OVER (PARTITION BY span_trace_id
                                ORDER BY chq_timestamp, span_id) AS rank
      FROM ({_TRACED_SPANS_SQL})
    ),
    walk AS (
      SELECT span_trace_id, rank, span_name, 0 AS depth,
             span_duration AS path_ns
      FROM s WHERE rank = 1
      UNION ALL
      SELECT s.span_trace_id, s.rank, s.span_name, w.depth + 1,
             w.path_ns + s.span_duration
      FROM s JOIN walk w
        ON s.span_trace_id = w.span_trace_id AND s.rank // 2 = w.rank
      WHERE s.rank > 1
    ),
    root AS (
      SELECT span_trace_id, span_name AS root_name, path_ns AS root_ns
      FROM walk WHERE depth = 0
    )
    SELECT w.span_trace_id, r.root_name,
           CAST(r.root_ns AS BIGINT) AS root_ns,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(max(w.depth) AS BIGINT) AS max_depth,
           CAST(max(w.path_ns) AS BIGINT) AS critical_path_ns
    FROM walk w JOIN root r USING (span_trace_id)
    GROUP BY 1, 2, 3
    """,
)
def sp5_trace_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trace-tree assembly: parent->child rollup over the span
    hierarchy (root-span latency, per-trace span count, tree depth,
    critical-path duration). The reference's span schema carries
    span_parent_span_id (spans_worker_sql.go:95-112) but its workers
    never traverse it; this is the natural spans extension.

    The synthetic hierarchy is deterministic: spans ranked by
    (chq_timestamp, span_id) within a trace; rank 1 is the root, rank
    r's parent is rank r DIV 2 — a binary-heap tree, so tree depth is
    O(log n_spans) and the traversal terminates in
    ceil(log2(max_rank)) BFS rounds. The Spark plan does a GENUINE
    level-by-level traversal (the recursive CTE's fixpoint, unrolled):
    each round joins exactly one heap level [2^i, 2^(i+1)) of children
    against the previous frontier on (trace, parent_rank),
    accumulating depth and root-to-node path sums; the per-level
    static pruning means every span participates in exactly one join.
    The round count comes from a one-row max-rank probe (plan-time
    bounded discovery, same pattern as the quantile density probe).

    100 TB design: each level join shuffles on span_trace_id — the
    same key the span table is already laid out by — and level k's
    frontier is at most half of level k+1, so the deepest rounds
    dominate and total work is O(n log depth) with no driver state
    beyond the single probe row. The oracle walks the identical tree
    with a recursive CTE."""
    import math

    from pyspark.sql import Window

    s = _traced_spans(spark, sf_dir)
    w = Window.partitionBy("span_trace_id").orderBy("chq_timestamp", "span_id")
    ranked = s.select(
        "span_trace_id", "span_id", "span_name", "span_duration",
        F.row_number().over(w).alias("rank"),
    ).withColumn("parent_rank", F.expr("rank DIV 2"))

    max_rank = ranked.agg(F.max("rank")).first()[0] or 1
    rounds = max(1, math.ceil(math.log2(max_rank + 1)))

    walk = ranked.filter(F.col("rank") == 1).select(
        "span_trace_id", "rank", "span_name",
        F.lit(0).alias("depth"),
        F.col("span_duration").alias("path_ns"),
    )
    frontier, all_walk = walk, walk
    for i in range(rounds):
        level = ranked.filter(
            (F.col("rank") >= 2 ** (i + 1)) & (F.col("rank") < 2 ** (i + 2))
        )
        nxt = level.join(
            frontier.select(
                "span_trace_id",
                F.col("rank").alias("parent_rank"),
                "depth",
                "path_ns",
            ),
            ["span_trace_id", "parent_rank"],
        ).select(
            "span_trace_id", "rank", "span_name",
            (F.col("depth") + 1).alias("depth"),
            (F.col("path_ns") + F.col("span_duration")).alias("path_ns"),
        )
        all_walk, frontier = all_walk.unionByName(nxt), nxt

    root = all_walk.filter(F.col("depth") == 0).select(
        "span_trace_id",
        F.col("span_name").alias("root_name"),
        F.col("path_ns").alias("root_ns"),
    )
    agg = all_walk.groupBy("span_trace_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.max("depth").cast("long").alias("max_depth"),
        F.max("path_ns").alias("critical_path_ns"),
    )
    return agg.join(root, "span_trace_id").select(
        "span_trace_id", "root_name", "root_ns",
        "n_spans", "max_depth", "critical_path_ns",
    )


@register(
    "sp6_span_edges",
    f"""
    WITH s AS (
      SELECT span_trace_id, span_name, span_duration,
             row_number() OVER (PARTITION BY span_trace_id
                                ORDER BY chq_timestamp, span_id) AS rank
      FROM ({_TRACED_SPANS_SQL})
    )
    SELECT p.span_name AS parent_name, c.span_name AS child_name,
           CAST(count(*) AS BIGINT) AS n_calls,
           CAST(sum(c.span_duration) AS BIGINT) AS child_ns,
           pround(avg(c.span_duration), 4) AS avg_child_ns
    FROM s c JOIN s p
      ON c.span_trace_id = p.span_trace_id AND c.rank // 2 = p.rank
    WHERE c.rank > 1
    GROUP BY 1, 2
    """,
)
def sp6_span_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Service-graph edges: one parent->child self-join over the span
    hierarchy (the aggregation a tracing UI's dependency graph is built
    from — call counts and child-latency stats per (parent, child)
    operation pair). Complements sp5's full-tree rollup with the
    single-hop shape: no recursion, one self-join on the trace key the
    span table is already partitioned by, then a count/sum/avg
    aggregate over the (tiny) name-pair space. At 100 TB the join is
    an SMJ sharing the table's trace-id layout; the aggregate's
    partial pair collapses per-executor before the one small shuffle."""
    from pyspark.sql import Window

    s = _traced_spans(spark, sf_dir)
    w = Window.partitionBy("span_trace_id").orderBy("chq_timestamp", "span_id")
    ranked = s.select(
        "span_trace_id", "span_name", "span_duration",
        F.row_number().over(w).alias("rank"),
    ).withColumn("parent_rank", F.expr("rank DIV 2"))
    child = ranked.filter(F.col("rank") > 1).select(
        "span_trace_id",
        F.col("span_name").alias("child_name"),
        F.col("span_duration").alias("child_dur"),
        "parent_rank",
    )
    parent = ranked.select(
        "span_trace_id",
        F.col("span_name").alias("parent_name"),
        F.col("rank").alias("parent_rank"),
    )
    return (
        child.join(parent, ["span_trace_id", "parent_rank"])
        .groupBy("parent_name", "child_name")
        .agg(
            F.count(F.lit(1)).alias("n_calls"),
            F.sum("child_dur").alias("child_ns"),
            _pr(F.avg("child_dur"), 4).alias("avg_child_ns"),
        )
    )


def _sp7_oracle() -> str:
    from lakerunner_spark.operators.ddsketch import ddsketch_quantile_sql

    return f"""
    SELECT span_name, pround(p95_ns, 6) AS p95_ns FROM (
      {ddsketch_quantile_sql(_SPANS_SQL, ["span_name"], "span_duration",
                             0.95, out_col="p95_ns")}
    )
    """


@register("sp7_operation_latency_sketch", _sp7_oracle())
def sp7_operation_latency_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metrics-from-traces (the Tempo span-metrics shape): per-operation
    p95 latency through the DDSketch algebra — the path that merges
    across workers/time-tiers mergeably, unlike sp1's exact
    percentile which needs the raw durations in one place. At 100 TB
    the per-(operation, bucket) sketch rows are the ONLY thing that
    shuffles; raw span durations reduce map-side into bucket counts
    (one HashAggregate pair), and rollup tiers merge by summing bucket
    counts. Reference: span stats shapes in spans_worker_sql.go, the
    same sketch contract as chq_sketch rollups."""
    from lakerunner_spark.operators.ddsketch import (
        ddsketch_agg,
        ddsketch_quantile,
    )

    s = _spans(spark, sf_dir)
    sk = ddsketch_agg(s, ["span_name"], "span_duration")
    out = ddsketch_quantile(sk, ["span_name"], 0.95, out_col="p95_ns")
    return out.withColumn("p95_ns", _pr("p95_ns", 6))


@register(
    "sp8_error_trace_spans",
    f"""
    WITH logs AS (
      SELECT CAST(event_id - event_id % 5 AS VARCHAR) AS trace_ref
      FROM {_E} e WHERE event_type = 'error'
    ),
    implicated AS (
      SELECT s.* FROM ({_SPANS_SQL}) s
      WHERE s.span_trace_id IN (SELECT trace_ref FROM logs)
    )
    SELECT span_name, CAST(count(*) AS BIGINT) AS n_spans,
           pround(quantile_cont(span_duration, 0.5), 4) AS p50_ns,
           CAST(max(span_duration) AS BIGINT) AS max_ns
    FROM implicated GROUP BY span_name
    """,
)
def sp8_error_trace_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-signal correlation (the exemplar workflow: an error LOG
    carries a trace id; operators ask "what do the implicated TRACES
    look like?"): error-stream log lines resolve to trace references,
    the span table is semi-joined on them, and the implicated spans'
    latency profile is aggregated per operation. The log->trace
    reference here maps each error event to its 5-row trace group —
    synthetic, but the join, semi-join pruning, and attribution shapes
    are the production ones.

    Scale: the reference list can be corpus-proportional (every trace
    with an error), so the semi-join is deliberately UNhinted — AQE
    broadcasts it only when it measures small (the ds8 lesson); spans
    never shuffle more than once, on their own trace key."""
    from lakerunner_spark.testdata import events_stream

    e = events_stream(spark, sf_dir)
    logs = e.filter(F.col("event_type") == "error").select(
        (F.col("event_id") - F.col("event_id") % 5)
        .cast("string")
        .alias("span_trace_id")
    )
    s = _spans(spark, sf_dir)
    implicated = s.join(logs.distinct(), "span_trace_id", "left_semi")
    return implicated.groupBy("span_name").agg(
        F.count(F.lit(1)).alias("n_spans"),
        _pr(F.percentile("span_duration", 0.5), 4).alias("p50_ns"),
        F.max("span_duration").alias("max_ns"),
    )
