"""Front-end-driven query catalog: PromQL / LogQL strings -> plans.

Each entry here exercises the full reference lifecycle (§3.1/§3.2):
query STRING -> parser -> AST -> DataFrame compiler -> result, with a
hand-written DuckDB oracle stating the expected semantics.

Instant-vector semantics (documented in promql/compiler.py): a bare
selector yields the bucket average (sum/count) — the reference's
last_over_time approximation over pre-aggregated buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakerunner_spark.catalog import default_log_source, default_metric_catalog
from lakerunner_spark.functions.rounding import portable_round as _pr
from lakerunner_spark.logql.compiler import compile_logql, compile_logql_exemplar
from lakerunner_spark.promql.compiler import compile_promql
from lakerunner_spark.queries import register
from lakerunner_spark.testdata import EVENTS_MS_SQL

_E = f"({EVENTS_MS_SQL})"


def _pq(spark: SparkSession, sf_dir: str, query: str, step_ms: int) -> DataFrame:
    return compile_promql(query, default_metric_catalog(spark, sf_dir), step_ms)


def _lq(spark: SparkSession, sf_dir: str, query: str, step_ms: int) -> DataFrame:
    return compile_logql(query, default_log_source(spark, sf_dir), step_ms)


# -- helper SQL fragments ----------------------------------------------------

# instant vector = per-(bucket, series) average, single-event_type slice
_AVG_SERIES = f"""
      SELECT chq_timestamp - chq_timestamp % {{step}} AS bucket_ts, user_id,
             avg(value) AS value
      FROM {_E} e WHERE event_type = '{{etype}}'
      GROUP BY 1, 2
"""


@register(
    "pqs1_sum_rate",
    f"""
    WITH base AS (
      SELECT chq_timestamp - chq_timestamp % 60000 AS bucket_ts,
             event_type, user_id, sum(value) AS s
      FROM {_E} e GROUP BY 1, 2, 3
    ),
    r AS (
      SELECT bucket_ts, event_type, user_id,
             CASE WHEN bucket_ts - min(bucket_ts)
                       OVER (PARTITION BY event_type, user_id) >= 240000
                  THEN sum(s) OVER w / 300.0 END AS value
      FROM base
      WINDOW w AS (PARTITION BY event_type, user_id ORDER BY bucket_ts
                   RANGE BETWEEN 240000 PRECEDING AND CURRENT ROW)
    )
    SELECT bucket_ts, event_type, pround(sum(value), 6) AS value
    FROM r GROUP BY 1, 2
    """,
)
def pqs1_sum_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL string -> plan: sum by (event_type) (rate(events[5m]))."""
    df = _pq(spark, sf_dir, 'sum by (event_type) (rate(events[5m]))', 60_000)
    return df.withColumn("value", _pr("value", 6))


@register(
    "pqs19_offset_rate",
    f"""
    WITH base AS (
      SELECT (chq_timestamp + 3600000)
             - (chq_timestamp + 3600000) % 60000 AS bucket_ts,
             event_type, user_id, sum(value) AS s
      FROM {_E} e WHERE event_type = 'click' GROUP BY 1, 2, 3
    ),
    r AS (
      SELECT bucket_ts, event_type, user_id,
             CASE WHEN bucket_ts - min(bucket_ts)
                       OVER (PARTITION BY event_type, user_id) >= 540000
                  THEN sum(s) OVER w / 600.0 END AS value
      FROM base
      WINDOW w AS (PARTITION BY event_type, user_id ORDER BY bucket_ts
                   RANGE BETWEEN 540000 PRECEDING AND CURRENT ROW)
    )
    SELECT bucket_ts, event_type, pround(sum(value), 6) AS value
    FROM r GROUP BY 1, 2
    """,
)
def pqs19_offset_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL vector offset (`[10m] offset 1h`): the leaf shifts data
    forward by the offset before bucketing (exec_planner offset
    semantics), so every evaluation bucket reads one hour earlier."""
    df = _pq(
        spark, sf_dir,
        'sum by (event_type) (rate(events{event_type="click"}[10m] offset 1h))',
        60_000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "pqs2_topk_count",
    f"""
    WITH base AS (
      SELECT chq_timestamp - chq_timestamp % 60000 AS bucket_ts, user_id,
             count(value) AS c
      FROM {_E} e WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    r AS (
      SELECT bucket_ts, user_id,
             CASE WHEN bucket_ts - min(bucket_ts)
                         OVER (PARTITION BY user_id) >= 540000
                  THEN CAST(sum(c) OVER w AS DOUBLE) END AS value
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY bucket_ts
                   RANGE BETWEEN 540000 PRECEDING AND CURRENT ROW)
    )
    SELECT bucket_ts, user_id, value FROM (
      SELECT *, row_number() OVER (
        PARTITION BY bucket_ts ORDER BY value DESC, user_id ASC) AS rn
      FROM r WHERE value IS NOT NULL
    ) WHERE rn <= 2
    """,
)
def pqs2_topk_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """topk(2, sum by (user_id) (count_over_time(events{...}[10m])))."""
    return _pq(
        spark, sf_dir,
        'topk(2, sum by (user_id) (count_over_time(events{event_type="purchase"}[10m])))',
        60_000,
    )


@register(
    "pqs3_ratio",
    f"""
    WITH l AS ({_AVG_SERIES.format(step=3600000, etype="error")}),
         r AS ({_AVG_SERIES.format(step=3600000, etype="click")})
    SELECT l.bucket_ts, l.user_id, pround(l.value / r.value, 6) AS value
    FROM l JOIN r ON l.bucket_ts = r.bucket_ts AND l.user_id = r.user_id
    WHERE r.value != 0
    """,
)
def pqs3_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector / vector matching on the shared label (user_id)."""
    df = _pq(
        spark, sf_dir,
        'sum by (user_id) (events{event_type="error"})'
        ' / sum by (user_id) (events{event_type="click"})',
        3_600_000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "pqs4_quantile_over_time",
    f"""
    SELECT DISTINCT bucket_ts, event_type, user_id,
           pround(quantile_cont(value, 0.9) OVER (
             PARTITION BY event_type, user_id ORDER BY bucket_ts
             RANGE BETWEEN 540000 PRECEDING AND CURRENT ROW), 6) AS value
    FROM (
      SELECT chq_timestamp - chq_timestamp % 60000 AS bucket_ts,
             event_type, user_id, value
      FROM {_E} e WHERE event_type = 'purchase'
    )
    """,
)
def pqs4_quantile_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quantile_over_time: exact interpolated quantile over a 10m window."""
    df = _pq(
        spark, sf_dir,
        'quantile_over_time(0.9, events{event_type="purchase"}[10m])',
        60_000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "pqs5_unless",
    f"""
    WITH l AS ({_AVG_SERIES.format(step=3600000, etype="error")}),
         r AS ({_AVG_SERIES.format(step=3600000, etype="click")})
    SELECT l.bucket_ts, l.user_id, pround(l.value, 6) AS value
    FROM l ANTI JOIN r ON l.bucket_ts = r.bucket_ts AND l.user_id = r.user_id
    """,
)
def pqs5_unless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op via the front-end: error-series unless click-series."""
    df = _pq(
        spark, sf_dir,
        'sum by (user_id) (events{event_type="error"})'
        ' unless sum by (user_id) (events{event_type="click"})',
        3_600_000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "pqs6_math_clamp",
    f"""
    SELECT bucket_ts, event_type,
           pround(least(abs(sum(value)), 100.0), 6) AS value
    FROM (
      SELECT chq_timestamp - chq_timestamp % 3600000 AS bucket_ts,
             event_type, user_id, avg(value) AS value
      FROM {_E} e GROUP BY 1, 2, 3
    )
    GROUP BY 1, 2
    """,
)
def pqs6_math_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """clamp_max(abs(sum by (event_type) (events)), 100)."""
    df = _pq(
        spark, sf_dir,
        'clamp_max(abs(sum by (event_type) (events)), 100)',
        3_600_000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "pqs7_histogram_quantile",
    f"""
    SELECT chq_timestamp - chq_timestamp % 600000 AS bucket_ts,
           event_type, user_id,
           pround(quantile_cont(value, 0.95), 6) AS value
    FROM {_E} e WHERE event_type = 'purchase'
    GROUP BY 1, 2, 3
    """,
)
def pqs7_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram_quantile over raw distributions (F13; sketch-free exact)."""
    df = _pq(
        spark, sf_dir,
        'histogram_quantile(0.95, events{event_type="purchase"})',
        600_000,
    )
    return df.select(
        "bucket_ts", "event_type", "user_id", _pr("value", 6).alias("value")
    )


@register(
    "pqs8_bool_cmp",
    f"""
    WITH base AS ({_AVG_SERIES.format(step=3600000, etype="purchase")})
    SELECT bucket_ts, user_id,
           CASE WHEN value > 100.0 THEN 1.0 ELSE 0.0 END AS value
    FROM base
    """,
)
def pqs8_bool_cmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison with the bool modifier via the front-end."""
    return _pq(
        spark, sf_dir,
        'sum by (user_id) (events{event_type="purchase"}) > bool 100',
        3_600_000,
    )


# ---------------------------------------------------------------------------
# LogQL strings
# ---------------------------------------------------------------------------


@register(
    "lqs1_log_rate",
    f"""
    WITH base AS (
      SELECT chq_timestamp - chq_timestamp % 60000 AS bucket_ts, event_type,
             CAST(count(*) AS DOUBLE) AS c
      FROM {_E} e WHERE regexp_full_match(event_type, 'error|click')
      GROUP BY 1, 2
    ),
    r AS (
      SELECT bucket_ts, event_type,
             CASE WHEN bucket_ts - min(bucket_ts)
                       OVER (PARTITION BY event_type) >= 540000
                  THEN sum(c) OVER w / 600.0 END AS value
      FROM base
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
                   RANGE BETWEEN 540000 PRECEDING AND CURRENT ROW)
    )
    SELECT bucket_ts, event_type, pround(sum(value), 6) AS value
    FROM r WHERE value IS NOT NULL GROUP BY 1, 2
    """,
)
def lqs1_log_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LogQL string: sum by (event_type) (rate({event_type=~"error|click"}[10m]))."""
    df = _lq(
        spark, sf_dir,
        'sum by (event_type) (rate({event_type=~"error|click"}[10m]))',
        60_000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "lqs2_bytes_over_time",
    f"""
    WITH base AS (
      SELECT chq_timestamp - chq_timestamp % 60000 AS bucket_ts, event_type,
             sum(CAST(strlen(props) AS DOUBLE)) AS b
      FROM {_E} e WHERE event_type = 'error'
      GROUP BY 1, 2
    ),
    r AS (
      SELECT bucket_ts, event_type,
             CASE WHEN bucket_ts - min(bucket_ts)
                         OVER (PARTITION BY event_type) >= 540000
                  THEN sum(b) OVER w END AS value
      FROM base
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
                   RANGE BETWEEN 540000 PRECEDING AND CURRENT ROW)
    )
    SELECT bucket_ts, event_type, pround(sum(value), 4) AS value
    FROM r WHERE value IS NOT NULL GROUP BY 1, 2
    """,
)
def lqs2_bytes_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LogQL bytes_over_time on the synthetic log-bytes metric (A10):
    strlen (bytes, matching octet_length) and coverage-gated like every
    windowed range fn."""
    df = _lq(
        spark, sf_dir,
        'sum by (event_type) (bytes_over_time({event_type="error"}[10m]))',
        60_000,
    )
    return df.withColumn("value", _pr("value", 4))


@register(
    "lqs3_unwrap_max",
    f"""
    WITH base AS (
      SELECT chq_timestamp - chq_timestamp % 60000 AS bucket_ts, event_type,
             max(try_cast(json_extract_string(props, '$.k') AS DOUBLE)) AS mx
      FROM {_E} e
      WHERE regexp_full_match(event_type, 'purchase|view')
        AND try_cast(json_extract_string(props, '$.k') AS DOUBLE) > 10.0
      GROUP BY 1, 2
    )
    SELECT bucket_ts, event_type, value FROM (
      SELECT bucket_ts, event_type,
             CASE WHEN bucket_ts - min(bucket_ts)
                         OVER (PARTITION BY event_type) >= 540000
                  THEN pround(max(mx) OVER (
                         PARTITION BY event_type ORDER BY bucket_ts
                         RANGE BETWEEN 540000 PRECEDING AND CURRENT ROW), 4)
             END AS value
      FROM base
    ) WHERE value IS NOT NULL
    """,
)
def lqs3_unwrap_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LogQL unwrap pipeline: json parse, numeric filter, unwrap, max_over_time."""
    df = _lq(
        spark, sf_dir,
        'max by (event_type) (max_over_time({event_type=~"purchase|view"}'
        ' | json k="$.k" | k > 10 | unwrap k [10m]))',
        60_000,
    )
    return df.withColumn("value", _pr("value", 4))


@register(
    "pqs12_rate_ratio_on",
    f"""
    WITH base AS (
      SELECT chq_timestamp - chq_timestamp % 60000 AS bucket_ts,
             event_type, user_id, sum(value) AS s
      FROM {_E} e WHERE event_type IN ('error', 'click')
      GROUP BY 1, 2, 3
    ),
    r AS (
      SELECT bucket_ts, event_type, user_id,
             CASE WHEN bucket_ts - min(bucket_ts)
                       OVER (PARTITION BY event_type, user_id) >= 540000
                  THEN sum(s) OVER w / 600.0 END AS value
      FROM base
      WINDOW w AS (PARTITION BY event_type, user_id ORDER BY bucket_ts
                   RANGE BETWEEN 540000 PRECEDING AND CURRENT ROW)
    )
    SELECT l.bucket_ts, l.user_id, pround(l.value / r.value, 6) AS value
    FROM (SELECT * FROM r WHERE event_type = 'error') l
    JOIN (SELECT * FROM r WHERE event_type = 'click') r
      ON l.bucket_ts = r.bucket_ts AND l.user_id = r.user_id
    WHERE r.value != 0
    """,
)
def pqs12_rate_ratio_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rate / on(user_id) rate — binary op between two range functions
    with an explicit match subset through the string front-end."""
    df = _pq(
        spark, sf_dir,
        'rate(events{event_type="error"}[10m])'
        ' / on(user_id) rate(events{event_type="click"}[10m])',
        60_000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "lqs7_bytes_rate",
    f"""
    WITH base AS (
      SELECT chq_timestamp - chq_timestamp % 60000 AS bucket_ts, event_type,
             sum(CAST(strlen(props) AS DOUBLE)) AS b
      FROM {_E} e WHERE event_type = 'view'
      GROUP BY 1, 2
    )
    SELECT bucket_ts, event_type,
           CASE WHEN bucket_ts - min(bucket_ts)
                     OVER (PARTITION BY event_type) >= 540000
                THEN pround(sum(b) OVER w / 600.0, 6) END AS value
    FROM base
    WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
                 RANGE BETWEEN 540000 PRECEDING AND CURRENT ROW)
    """,
)
def lqs7_bytes_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LogQL bytes_rate: windowed log-bytes per second (A10 family)."""
    df = _lq(
        spark, sf_dir,
        'bytes_rate({event_type="view"}[10m])',
        60_000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "pqs13_pushed_sum_rate",
    f"""
    WITH base AS (
      SELECT chq_timestamp - chq_timestamp % 60000 AS bucket_ts,
             event_type, sum(value) AS s
      FROM {_E} e GROUP BY 1, 2
    )
    SELECT bucket_ts, event_type,
           CASE WHEN bucket_ts - min(bucket_ts)
                     OVER (PARTITION BY event_type) >= 240000
                THEN pround(sum(s) OVER w / 300.0, 6) END AS value
    FROM base
    WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
                 RANGE BETWEEN 240000 PRECEDING AND CURRENT ROW)
    """,
)
def pqs13_pushed_sum_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum by (event_type) (rate(events[5m])) with grouping PUSHED into
    the leaf (exec_planner.go keepsAll): one shuffle to event_type
    cardinality, group-level coverage gate — the oracle states exactly
    that semantics."""
    df = compile_promql(
        'sum by (event_type) (rate(events[5m]))',
        default_metric_catalog(spark, sf_dir),
        60_000,
        push_grouping=True,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "pqs14_or",
    f"""
    WITH l AS ({_AVG_SERIES.format(step=3600000, etype="error")}),
         r AS ({_AVG_SERIES.format(step=3600000, etype="click")})
    SELECT coalesce(l.bucket_ts, r.bucket_ts) AS bucket_ts,
           coalesce(l.user_id, r.user_id) AS user_id,
           pround(coalesce(l.value, r.value), 6) AS value
    FROM l FULL OUTER JOIN r
      ON l.bucket_ts = r.bucket_ts AND l.user_id = r.user_id
    """,
)
def pqs14_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """or through the string front-end: union preferring LHS on collision."""
    df = _pq(
        spark, sf_dir,
        'sum by (user_id) (events{event_type="error"})'
        ' or sum by (user_id) (events{event_type="click"})',
        3_600_000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "lqs5_json_auto",
    f"""
    SELECT chq_timestamp - chq_timestamp % 600000 AS bucket_ts, event_type,
           CAST(count(*) AS DOUBLE) AS value
    FROM {_E} e
    WHERE try_cast(json_extract_string(props, '$.k') AS DOUBLE) >= 30.0
      AND event_type = 'view'
    GROUP BY 1, 2
    """,
)
def lqs5_json_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """| json auto-discovery: keys found by sampling, then filtered on.

    range == step so the window is a single bucket (pure bucket count).
    """
    df = _lq(
        spark, sf_dir,
        'count_over_time({event_type="view"} | json | k >= 30 [10m])',
        600_000,
    )
    # auto-discovered label k joins the series identity; collapse it for
    # the oracle's bucket-level count
    from lakerunner_spark.operators.vector_agg import vector_agg

    return vector_agg(
        df.filter(F.col("value").isNotNull()), "sum", by=["event_type"]
    )


@register(
    "lqs6_rate_counter",
    f"""
    WITH base AS (
      SELECT chq_timestamp - chq_timestamp % 60000 AS bucket_ts, event_type,
             sum(try_cast(json_extract_string(props, '$.k') AS DOUBLE)) AS s
      FROM {_E} e
      WHERE event_type = 'purchase'
        AND try_cast(json_extract_string(props, '$.k') AS DOUBLE) IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT bucket_ts, event_type,
           CASE WHEN bucket_ts - min(bucket_ts)
                       OVER (PARTITION BY event_type) >= 540000
                THEN pround(sum(s) OVER w / 600.0, 6) END AS value
    FROM base
    WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
                 RANGE BETWEEN 540000 PRECEDING AND CURRENT ROW)
    """,
)
def lqs6_rate_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LogQL rate_counter: the reference rewrites it to plain PromQL
    rate over the unwrapped synthetic metric (rewrite_result.go:73) —
    windowed sum / range seconds, coverage-gated."""
    df = _lq(
        spark, sf_dir,
        'rate_counter({event_type="purchase"} | json k="$.k" | unwrap k [10m])',
        60_000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "lqs8_label_format_drop",
    f"""
    WITH base AS (
      SELECT chq_timestamp - chq_timestamp % 60000 AS bucket_ts,
             event_type || '-lvl' AS sev, CAST(count(*) AS DOUBLE) AS c
      FROM {_E} e WHERE regexp_full_match(event_type, 'error|click')
      GROUP BY 1, 2
    )
    SELECT bucket_ts, sev,
           CASE WHEN bucket_ts - min(bucket_ts)
                       OVER (PARTITION BY sev) >= 540000
                THEN sum(c) OVER w END AS value
    FROM base
    WINDOW w AS (PARTITION BY sev ORDER BY bucket_ts
                 RANGE BETWEEN 540000 PRECEDING AND CURRENT ROW)
    """,
)
def lqs8_label_format_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """label_format template + drop through the string front-end: the
    derived label replaces the stream label in the series identity."""
    return _lq(
        spark, sf_dir,
        'count_over_time({event_type=~"error|click"}'
        ' | label_format sev="{{.event_type}}-lvl" | drop event_type [10m])',
        60_000,
    )


@register(
    "lqs4_exemplar",
    f"""
    SELECT event_id, chq_timestamp, event_type,
           json_extract_string(props, '$.k') AS k
    FROM {_E} e
    WHERE event_type = 'error' AND contains(props, '7')
    ORDER BY chq_timestamp DESC, event_id DESC LIMIT 50
    """,
)
def lqs4_exemplar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LogQL exemplar mode: newest 50 matching lines (O1/O2 global limit)."""
    src = default_log_source(spark, sf_dir)
    df = compile_logql_exemplar(
        '{event_type="error"} |= "7" | json k="$.k"',
        src,
        limit=50,
        tiebreak=["event_id"],
    )
    return df.select("event_id", "chq_timestamp", "event_type", "k")


def _lqs9_oracle() -> str:
    from lakerunner_spark.logql.stages import decolorize_sql

    d = decolorize_sql("colored")
    return f"""
    SELECT event_id, chq_timestamp, event_type,
           json_extract_string({d}, '$.k') AS k, {d} AS log_message
    FROM (SELECT event_id, chq_timestamp, event_type,
                 chr(27) || '[31m' || props || chr(27) || '[0m' AS colored
          FROM {_E} e WHERE event_type = 'error')
    ORDER BY chq_timestamp DESC, event_id DESC LIMIT 50
    """


@register("lqs9_decolorize", _lqs9_oracle())
def lqs9_decolorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``| decolorize`` strips ANSI SGR sequences (logql/parser.go:677):
    the colored wrapper breaks JSON parsing, so the parsed key is the
    observable — it extracts only if decolorize ran first."""
    from lakerunner_spark.logql.compiler import LogSource
    from lakerunner_spark.testdata import events_stream

    ev = events_stream(spark, sf_dir).withColumn(
        "log_message",
        F.concat(F.lit("\x1b[31m"), F.col("props"), F.lit("\x1b[0m")),
    )
    src = LogSource(ev, ["event_type"], line_col="log_message")
    df = compile_logql_exemplar(
        '{event_type="error"} | decolorize | json k="$.k"',
        src,
        limit=50,
        tiebreak=["event_id"],
    )
    return df.select("event_id", "chq_timestamp", "event_type", "k", "log_message")


@register(
    "lqs10_label_replace",
    f"""
    WITH base AS (
      SELECT chq_timestamp - chq_timestamp % 60000 AS bucket_ts, event_type,
             CASE WHEN regexp_full_match(event_type, '(err)or')
                  THEN regexp_replace(event_type, '^(?:(err)or)$', '\\1!')
             END AS klass,
             CAST(count(*) AS DOUBLE) AS c
      FROM {_E} e WHERE regexp_full_match(event_type, 'error|click')
      GROUP BY 1, 2, 3
    ),
    r AS (
      SELECT bucket_ts, event_type, klass,
             CASE WHEN bucket_ts - min(bucket_ts)
                         OVER (PARTITION BY event_type, klass) >= 540000
                  THEN sum(c) OVER w END AS value
      FROM base
      WINDOW w AS (PARTITION BY event_type, klass ORDER BY bucket_ts
                   RANGE BETWEEN 540000 PRECEDING AND CURRENT ROW)
    )
    SELECT bucket_ts, klass, pround(sum(value), 6) AS value
    FROM r WHERE value IS NOT NULL GROUP BY 1, 2
    """,
)
def lqs10_label_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """label_replace as a LogQL pipeline stage (logql/parser.go:677):
    series gain a derived klass label mid-pipeline; the final vector
    aggregation groups by it (non-matching series keep klass NULL)."""
    df = _lq(
        spark, sf_dir,
        'sum by (klass) (count_over_time({event_type=~"error|click"}'
        ' | label_replace(klass, "$1!", event_type, "(err)or") [10m]))',
        60_000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "lqs11_range_offset",
    f"""
    WITH base AS (
      SELECT (chq_timestamp + 3600000)
             - (chq_timestamp + 3600000) % 60000 AS bucket_ts, event_type,
             CAST(count(*) AS DOUBLE) AS c
      FROM {_E} e WHERE event_type = 'error'
      GROUP BY 1, 2
    ),
    r AS (
      SELECT bucket_ts, event_type,
             CASE WHEN bucket_ts - min(bucket_ts)
                         OVER (PARTITION BY event_type) >= 540000
                  THEN sum(c) OVER w END AS value
      FROM base
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
                   RANGE BETWEEN 540000 PRECEDING AND CURRENT ROW)
    )
    SELECT bucket_ts, event_type, pround(sum(value), 6) AS value
    FROM r WHERE value IS NOT NULL GROUP BY 1, 2
    """,
)
def lqs11_range_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LogQL range offset (`[10m] offset 1h`, exec_planner.go:71): the
    window evaluates against data shifted back by the offset — every
    bucket reads one hour earlier."""
    df = _lq(
        spark, sf_dir,
        'sum by (event_type) (count_over_time({event_type="error"}[10m] offset 1h))',
        60_000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "pqs15_median_over_time",
    f"""
    SELECT DISTINCT bucket_ts, event_type, user_id,
           pround(quantile_cont(value, 0.5) OVER (
             PARTITION BY event_type, user_id ORDER BY bucket_ts
             RANGE BETWEEN 540000 PRECEDING AND CURRENT ROW), 6) AS value
    FROM (
      SELECT chq_timestamp - chq_timestamp % 60000 AS bucket_ts,
             event_type, user_id, value
      FROM {_E} e WHERE event_type = 'error'
    )
    """,
)
def pqs15_median_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """median_over_time: an extension beyond the reference (its rewriter
    marks it unsupported); delegates to exact quantile_over_time q=0.5."""
    df = _pq(
        spark, sf_dir,
        'median_over_time(events{event_type="error"}[10m])',
        60_000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "pqs16_label_replace",
    f"""
    SELECT bucket_ts, event_type, value, CASE
             WHEN regexp_full_match(event_type, '(err).*')
             THEN regexp_replace(event_type, '^(?:(err).*)$', '\\1-class')
           END AS klass
    FROM (
      SELECT chq_timestamp - chq_timestamp % 3600000 AS bucket_ts,
             event_type, pround(sum(value), 6) AS value
      FROM (
        SELECT chq_timestamp, event_type, user_id, avg(value) AS value
        FROM (
          SELECT chq_timestamp - chq_timestamp % 3600000 AS chq_timestamp,
                 event_type, user_id, value FROM {_E} e
        ) GROUP BY 1, 2, 3
      ) GROUP BY 1, 2
    )
    """,
)
def pqs16_label_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """label_replace: anchored regex against the src label, $1 expansion
    into a new dst label, non-matching series unchanged (dst stays NULL)."""
    df = _pq(
        spark, sf_dir,
        'label_replace(sum by (event_type) (events), '
        '"klass", "$1-class", "event_type", "(err).*")',
        3_600_000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "pqs17_sort_desc",
    f"""
    SELECT bucket_ts, event_type, pround(value, 6) AS value FROM (
      SELECT chq_timestamp - chq_timestamp % 3600000 AS bucket_ts,
             event_type, sum(value) AS value
      FROM (
        SELECT chq_timestamp, event_type, user_id, avg(value) AS value
        FROM (
          SELECT chq_timestamp - chq_timestamp % 3600000 AS chq_timestamp,
                 event_type, user_id, value FROM {_E} e
        ) GROUP BY 1, 2, 3
      ) GROUP BY 1, 2
    )
    """,
)
def pqs17_sort_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sort_desc: presentation ordering by value within each bucket; value
    parity via the oracle (order-insensitive), row ordering asserted in
    tests/test_frontends.py::test_sort_desc_ordering."""
    df = _pq(
        spark, sf_dir,
        'sort_desc(sum by (event_type) (events))',
        3_600_000,
    )
    return df.withColumn("value", _pr("value", 6))


def _pqs18_oracle() -> str:
    from lakerunner_spark.operators.ddsketch import (
        ddsketch_quantile_over_time_sql,
    )

    inner = ddsketch_quantile_over_time_sql(
        f"SELECT chq_timestamp, event_type, user_id, value "
        f"FROM {_E} e WHERE event_type = 'purchase'",
        ["event_type", "user_id"],
        range_ms=7_200_000,
        step_ms=60_000,
        q=0.95,
    )
    return (
        "SELECT bucket_ts, event_type, user_id, pround(value, 6) AS value "
        f"FROM ({inner})"
    )


@register("pqs18_quantile_sketch_route", _pqs18_oracle())
def pqs18_quantile_sketch_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-range quantile_over_time served from the DDSketch bucket
    algebra (promql/quantile_node.go:35-114 contract): [2h] at 60s step
    is 120 buckets > QUANTILE_SKETCH_MIN_BUCKETS, so the compiler routes
    away from the exact collect_list path — no raw-value arrays in the
    plan (asserted in tests/test_frontends.py::test_quantile_sketch_route_plan);
    the oracle reproduces the sketch algebra bit-for-bit."""
    df = _pq(
        spark, sf_dir,
        'quantile_over_time(0.95, events{event_type="purchase"}[2h])',
        60_000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "pqs20_predict_linear",
    f"""
    WITH base AS (
      SELECT chq_timestamp - chq_timestamp % 60000 AS bucket_ts,
             event_type, user_id, sum(value) AS s, count(value) AS c
      FROM {_E} e WHERE event_type = 'purchase' GROUP BY 1, 2, 3
    ),
    b3 AS (SELECT bucket_ts, event_type, user_id,
                  (bucket_ts - min(bucket_ts) OVER
                     (PARTITION BY event_type, user_id)) / 1000.0 AS x,
                  s / c AS y,
                  min(bucket_ts) OVER (PARTITION BY event_type, user_id) AS t0
           FROM base),
    wd AS (SELECT bucket_ts, event_type, user_id, x, t0,
                  CAST(count(*) OVER w AS DOUBLE) AS n,
                  sum(x) OVER w AS sx, sum(y) OVER w AS sy,
                  sum(x * y) OVER w AS sxy, sum(x * x) OVER w AS sxx
           FROM b3
           WINDOW w AS (PARTITION BY event_type, user_id ORDER BY bucket_ts
                        RANGE BETWEEN 540000 PRECEDING AND CURRENT ROW))
    SELECT bucket_ts, event_type, user_id,
           CASE WHEN bucket_ts - t0 >= 540000 THEN
             pround(CASE WHEN n * sxx - sx * sx != 0
                         THEN sy / n + ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                              * (x + 600 - sx / n) END, 6)
           END AS value
    FROM wd
    """,
)
def pqs20_predict_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """predict_linear through the PromQL front end (extension function:
    parser + compiler route the horizon argument into the windowed
    least-squares expressions — operators/range_agg.py)."""
    df = _pq(
        spark, sf_dir,
        'predict_linear(events{event_type="purchase"}[10m], 600)',
        60_000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "lqs12_pattern",
    f"""
    SELECT kv, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT regexp_extract(props, '^\\{{"k": (.*?)\\}}$', 1) AS kv
          FROM {_E} e WHERE event_type = 'error')
    GROUP BY kv
    """,
)
def lqs12_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``| pattern`` (extension beyond the reference's stage list):
    template captures compile to the same regexp_extract plan as
    ``| regexp`` via the Java/RE2-portable translation in
    logql/stages.pattern_to_regex — the oracle runs the identical
    generated regex."""
    from lakerunner_spark.logql.compiler import compile_logql_lines

    src = default_log_source(spark, sf_dir)
    df = compile_logql_lines(
        '{event_type="error"} | pattern "{\\"k\\": <kv>}"', src
    )
    return df.groupBy("kv").agg(F.count(F.lit(1)).alias("n"))


def _lqs15_oracle() -> str:
    from lakerunner_spark.logql.stages import pattern_to_regex

    keep, _ = pattern_to_regex('{"k": 1<_>}', as_filter=True)
    drop, _ = pattern_to_regex("<_>7}", as_filter=True)
    return f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM {_E} e
    WHERE event_type = 'error'
      AND regexp_matches(props, '{keep}')
      AND NOT regexp_matches(props, '{drop}')
    GROUP BY event_type
    """


@register("lqs15_pattern_line_filter", _lqs15_oracle())
def lqs15_pattern_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``|>`` / ``!>`` pattern line filters (Loki 3.x): the reference
    maps LineMatchPattern/LineMatchNotPattern onto regex line filters
    (logql/parser.go:347-350); the template compiles through the same
    pattern_to_regex translation as the ``| pattern`` stage with all
    captures demoted to wildcards, so the oracle runs the identical
    generated regex."""
    from lakerunner_spark.logql.compiler import compile_logql_lines

    src = default_log_source(spark, sf_dir)
    df = compile_logql_lines(
        '{event_type="error"} |> "{\\"k\\": 1<_>}" !> "<_>7}"', src
    )
    return df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@register(
    "pqs21_round_label_join",
    f"""
    SELECT bucket_ts, event_type, user_id,
           event_type || ':' || CAST(user_id AS VARCHAR) AS series_key,
           floor(value / 0.5 + 0.5) * 0.5 AS value
    FROM (
      SELECT chq_timestamp - chq_timestamp % 3600000 AS bucket_ts,
             event_type, user_id, avg(value) AS value
      FROM {_E} e GROUP BY 1, 2, 3
    )
    """,
)
def pqs21_round_label_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round(v, 0.5) + label_join (extensions): nearest-multiple
    rounding with ties away from the floor, then a joined series key
    label from the existing labels."""
    df = _pq(
        spark, sf_dir,
        'label_join(round(events, 0.5), "series_key", ":",'
        ' "event_type", "user_id")',
        3_600_000,
    )
    return df.select("bucket_ts", "event_type", "user_id", "series_key", "value")


@register(
    "pqs22_timestamp_clamp",
    f"""
    SELECT bucket_ts, event_type,
           least(greatest(bucket_ts / 1000.0, 1.0), 1e18) AS value
    FROM (
      SELECT DISTINCT chq_timestamp - chq_timestamp % 3600000 AS bucket_ts,
             event_type
      FROM {_E} e
    )
    """,
)
def pqs22_timestamp_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """timestamp(v) + 3-arg clamp (extensions): element evaluation time
    in epoch seconds, clamped into a wide band."""
    return _pq(
        spark, sf_dir,
        'clamp(timestamp(sum by (event_type) (events)), 1, 1e18)',
        3_600_000,
    )


@register(
    "pqs23_group_left_share",
    f"""
    WITH s AS (
      SELECT chq_timestamp - chq_timestamp % 3600000 AS bucket_ts,
             event_type, user_id, avg(value) AS v
      FROM {_E} e GROUP BY 1, 2, 3
    ),
    d AS (SELECT bucket_ts, event_type, sum(v) AS dv FROM s GROUP BY 1, 2)
    SELECT s.bucket_ts, s.event_type, s.user_id,
           pround(s.v / d.dv, 6) AS value
    FROM s JOIN d USING (bucket_ts, event_type)
    WHERE d.dv != 0
    """,
)
def pqs23_group_left_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_left many-to-one matching (extension — the reference
    rejects group modifiers, promql parser.go:455-460): each
    (event_type, user_id) series divides by its event_type total, the
    classic share-of-group query that one-to-one matching cannot
    express."""
    df = _pq(
        spark, sf_dir,
        'sum by (event_type, user_id) (events)'
        ' / on(event_type) group_left sum by (event_type) (events)',
        3_600_000,
    )
    return df.withColumn("value", _pr("value", 6))


_SERIES_1H = f"""
      SELECT chq_timestamp - chq_timestamp % 3600000 AS bucket_ts,
             event_type, user_id, avg(value) AS v
      FROM {_E} e GROUP BY 1, 2, 3
"""


@register(
    "pqs24_stddev_agg",
    f"""
    WITH s AS ({_SERIES_1H})
    SELECT bucket_ts, event_type,
           pround(sqrt(greatest(
             sum(v * v) / CAST(count(v) AS DOUBLE)
             - (sum(v) / CAST(count(v) AS DOUBLE))
               * (sum(v) / CAST(count(v) AS DOUBLE)), 0.0)), 6) AS value
    FROM s GROUP BY 1, 2
    """,
)
def pqs24_stddev_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev aggregation (extension): population stddev across the
    series of each group, explicit sum/sumsq formula mirrored by the
    oracle term for term."""
    df = _pq(spark, sf_dir, 'stddev by (event_type) (events)', 3_600_000)
    return df.withColumn("value", _pr("value", 6))


@register(
    "pqs25_stdvar_group_agg",
    f"""
    WITH s AS ({_SERIES_1H}),
    sv AS (
      SELECT bucket_ts, event_type,
             pround(greatest(
               sum(v * v) / CAST(count(v) AS DOUBLE)
               - (sum(v) / CAST(count(v) AS DOUBLE))
                 * (sum(v) / CAST(count(v) AS DOUBLE)), 0.0), 6) AS stdvar_v
      FROM s GROUP BY 1, 2
    )
    SELECT bucket_ts, event_type, stdvar_v, 1.0 AS group_v FROM sv
    """,
)
def pqs25_stdvar_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stdvar + group aggregations (extensions) joined on the group key
    — group marks presence with 1.0 per populated group."""
    sv = _pq(spark, sf_dir, 'stdvar by (event_type) (events)', 3_600_000) \
        .withColumnRenamed("value", "stdvar_v")
    gp = _pq(spark, sf_dir, 'group by (event_type) (events)', 3_600_000) \
        .withColumnRenamed("value", "group_v")
    return sv.join(gp, ["bucket_ts", "event_type"]).select(
        "bucket_ts", "event_type", _pr("stdvar_v", 6).alias("stdvar_v"), "group_v"
    )


@register(
    "lqs13_quantile_unwrap",
    f"""
    SELECT DISTINCT bucket_ts, event_type,
           pround(quantile_cont(v, 0.9) OVER (
             PARTITION BY event_type ORDER BY bucket_ts
             RANGE BETWEEN 540000 PRECEDING AND CURRENT ROW), 6) AS value
    FROM (
      SELECT chq_timestamp - chq_timestamp % 60000 AS bucket_ts, event_type,
             try_cast(json_extract_string(props, '$.k') AS DOUBLE) AS v
      FROM {_E} e WHERE event_type = 'purchase'
        AND try_cast(json_extract_string(props, '$.k') AS DOUBLE) IS NOT NULL
    )
    """,
)
def lqs13_quantile_unwrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LogQL quantile_over_time over unwrapped raw samples (extension):
    exact interpolated quantile shared with the PromQL short-range
    path (operators/range_agg.exact_quantile_over_time)."""
    df = _lq(
        spark, sf_dir,
        'quantile_over_time(0.9, {event_type="purchase"}'
        ' | json k="$.k" | unwrap k [10m])',
        60_000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "lqs14_first_stddev_unwrap",
    f"""
    WITH base AS (
      SELECT chq_timestamp - chq_timestamp % 60000 AS bucket_ts, event_type,
             sum(try_cast(json_extract_string(props, '$.k') AS DOUBLE)) AS s,
             count(try_cast(json_extract_string(props, '$.k') AS DOUBLE)) AS c
      FROM {_E} e WHERE event_type = 'purchase'
        AND try_cast(json_extract_string(props, '$.k') AS DOUBLE) IS NOT NULL
      GROUP BY 1, 2
    ),
    b2 AS (SELECT bucket_ts, event_type, s / c AS y,
                  min(bucket_ts) OVER (PARTITION BY event_type) AS t0
           FROM base)
    SELECT bucket_ts, event_type, first_v, stddev_v FROM (
      SELECT bucket_ts, event_type,
             CASE WHEN bucket_ts - t0 >= 540000 THEN
               pround(first_value(y) OVER w, 6) END AS first_v,
             CASE WHEN bucket_ts - t0 >= 540000 THEN
               pround(sqrt(greatest(
                 sum(y * y) OVER w / CAST(count(*) OVER w AS DOUBLE)
                 - (sum(y) OVER w / CAST(count(*) OVER w AS DOUBLE))
                   * (sum(y) OVER w / CAST(count(*) OVER w AS DOUBLE)), 0.0)), 6)
             END AS stddev_v
      FROM b2
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
                   RANGE BETWEEN 540000 PRECEDING AND CURRENT ROW)
    ) WHERE first_v IS NOT NULL OR stddev_v IS NOT NULL
    """,
)
def lqs14_first_stddev_unwrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LogQL first_over_time + stddev_over_time over unwrap
    (extensions): per-step-value window expressions, coverage-gated
    like the A9 family."""
    q = ('{event_type="purchase"} | json k="$.k" | unwrap k [10m]')
    first = _lq(spark, sf_dir, f'first_over_time({q})', 60_000) \
        .withColumnRenamed("value", "first_v")
    sd = _lq(spark, sf_dir, f'stddev_over_time({q})', 60_000) \
        .withColumnRenamed("value", "stddev_v")
    out = first.join(sd, ["bucket_ts", "event_type"]).filter(
        F.col("first_v").isNotNull() | F.col("stddev_v").isNotNull()
    )
    return out.select(
        "bucket_ts", "event_type",
        _pr("first_v", 6).alias("first_v"), _pr("stddev_v", 6).alias("stddev_v"),
    )


@register(
    "pqs26_histogram_quantile_buckets",
    f"""
    WITH s AS (
      SELECT chq_timestamp - chq_timestamp % 3600000 AS bucket_ts,
             event_type, value
      FROM {_E} e
    ),
    les AS (SELECT unnest([25.0, 50.0, 75.0, CAST('inf' AS DOUBLE)]) AS le),
    b AS (
      SELECT bucket_ts, event_type, le,
             CAST(sum(CASE WHEN value <= le THEN 1 ELSE 0 END) AS DOUBLE) AS cum
      FROM s CROSS JOIN les GROUP BY 1, 2, 3
    ),
    w AS (
      SELECT bucket_ts, event_type, le, cum,
             max(cum) OVER (PARTITION BY bucket_ts, event_type) AS total,
             lag(le) OVER (PARTITION BY bucket_ts, event_type
                           ORDER BY le) AS ple,
             lag(cum) OVER (PARTITION BY bucket_ts, event_type
                            ORDER BY le) AS pcum
      FROM b
    )
    SELECT bucket_ts, event_type, pround(
        CASE WHEN le = CAST('inf' AS DOUBLE) THEN ple
             WHEN ple IS NULL THEN
               CASE WHEN le <= 0 THEN le ELSE le * (0.9 * total) / cum END
             ELSE ple + (le - ple) * (0.9 * total - pcum) / (cum - pcum)
        END, 6) AS value
    FROM w
    WHERE total > 0 AND cum >= 0.9 * total
      AND (pcum IS NULL OR pcum < 0.9 * total)
      AND NOT (le = CAST('inf' AS DOUBLE) AND ple IS NULL)
    """,
)
def pqs26_histogram_quantile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic le-bucket histogram_quantile (extension): cumulative
    bucket counts synthesized from events (the OTLP exploded-histogram
    shape), interpolated with Prometheus's bucketQuantile rules —
    oracle replicates the interpolation term for term."""
    from lakerunner_spark.operators.histogram import histogram_quantile_buckets
    from lakerunner_spark.testdata import events_stream

    e = events_stream(spark, sf_dir)
    les = spark.createDataFrame(
        [(25.0,), (50.0,), (75.0,), (float("inf"),)], ["le"]
    )
    b = (
        e.crossJoin(F.broadcast(les))
        .groupBy(
            (F.col("chq_timestamp") - F.col("chq_timestamp") % 3_600_000)
            .alias("bucket_ts"),
            "event_type",
            "le",
        )
        .agg(
            F.sum(F.when(F.col("value") <= F.col("le"), 1).otherwise(0))
            .cast("double")
            .alias("value")
        )
    )
    out = histogram_quantile_buckets(b, 0.9)
    return out.withColumn("value", _pr("value", 6))


@register(
    "pqs27_count_values",
    f"""
    SELECT bucket_ts,
           CAST(CAST(least(greatest(floor(v + 0.5) * 1.0, 0.0), 999999.0)
                AS BIGINT) AS VARCHAR) AS bucketed,
           CAST(count(*) AS DOUBLE) AS value
    FROM (
      SELECT chq_timestamp - chq_timestamp % 3600000 AS bucket_ts,
             event_type, user_id, avg(value) AS v
      FROM {_E} e GROUP BY 1, 2, 3
    )
    GROUP BY 1, 2
    """,
)
def pqs27_count_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_values aggregation (extension): per-bucket histogram of
    rounded series values as a new label; without `by` every original
    label drops, like Prometheus. round(v) pre-buckets to integral
    doubles whose string rendering is identical across engines."""
    df = _pq(
        spark, sf_dir,
        'count_values("bucketed", round('
        'sum by (event_type, user_id) (events)))',
        3_600_000,
    )
    return df


@register(
    "pqs28_absent",
    f"""
    WITH grid AS (
      SELECT unnest(range(1706572800000, 1706745600000, 3600000)) AS bucket_ts
    ),
    present AS (
      SELECT DISTINCT chq_timestamp - chq_timestamp % 3600000 AS bucket_ts
      FROM {_E} e
      WHERE event_type = 'error'
        AND chq_timestamp >= 1706572800000 AND chq_timestamp < 1706745600000
    )
    SELECT g.bucket_ts, 1.0 AS value
    FROM grid g ANTI JOIN present p ON p.bucket_ts = g.bucket_ts
    """,
)
def pqs28_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """absent() (extension): 1 at every step of the query window where
    the inner vector has no samples — the step grid anti-joined against
    the materialized buckets. The window straddles the testdata's final
    day, so the result mixes present (excluded) and absent buckets."""
    from lakerunner_spark.catalog import default_metric_catalog
    from lakerunner_spark.promql.compiler import compile_promql

    return compile_promql(
        'absent(sum by (event_type) (events{event_type="error"}))',
        default_metric_catalog(spark, sf_dir),
        3_600_000,
        start_ms=1_706_572_800_000,
        end_ms=1_706_745_600_000,
    )


@register(
    "pqs29_subquery_max",
    f"""
    WITH inner_v AS (
      SELECT bucket_ts, event_type, sum(v) AS value
      FROM (
        SELECT chq_timestamp - chq_timestamp % 1200000 AS bucket_ts,
               event_type, user_id, avg(value) AS v
        FROM {_E} e GROUP BY 1, 2, 3
      ) GROUP BY 1, 2
    ),
    w AS (
      SELECT bucket_ts, event_type,
             CASE WHEN bucket_ts - min(bucket_ts)
                       OVER (PARTITION BY event_type) >= 6000000 THEN
               pround(max(value) OVER (
                 PARTITION BY event_type ORDER BY bucket_ts
                 RANGE BETWEEN 6000000 PRECEDING AND CURRENT ROW), 6)
             END AS value
      FROM inner_v
    )
    SELECT bucket_ts, event_type, value
    FROM w WHERE bucket_ts % 3600000 = 0 AND value IS NOT NULL
    """,
)
def pqs29_subquery_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subquery (extension): max_over_time over an inner vector sampled
    at a 20m substep, windowed 2h, results aligned to the 1h query
    grid — the classic 'max of a rate' dashboard shape the plain range
    selector can't express."""
    df = _pq(
        spark, sf_dir,
        'max_over_time((sum by (event_type) (events))[2h:20m])',
        3_600_000,
    )
    return df.filter(F.col("value").isNotNull()).withColumn(
        "value", _pr("value", 6)
    )


_SUM_ETYPE_1H = f"""
      SELECT bucket_ts, event_type, sum(v) AS v
      FROM ({_SERIES_1H}) GROUP BY 1, 2
"""


@register(
    "pqs30_trig",
    f"""
    WITH g AS ({_SUM_ETYPE_1H})
    SELECT bucket_ts, event_type,
           pround(sin(v) * sin(v) + cos(v) * cos(v)
                  + degrees(atan(v)) / 90.0, 6) AS value
    FROM g
    """,
)
def pqs30_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trig + angle-conversion + '^' power extensions: the Pythagorean
    identity plus a degrees-normalized arctangent, exercising sin/cos/
    atan/deg, vector^scalar pow, and '^'-over-'*' precedence in one
    expression (all JVM-side builtins)."""
    v = 'sum by (event_type) (events)'
    df = _pq(
        spark, sf_dir,
        f'sin({v}) ^ 2 + cos({v}) ^ 2 + deg(atan({v})) / 90',
        3_600_000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "pqs31_hyperbolic",
    f"""
    WITH g AS ({_SUM_ETYPE_1H})
    SELECT bucket_ts, event_type,
           pround(
             (CASE WHEN v >= 0 THEN 1 - 2 / (exp(2 * v) + 1)
                   ELSE 2 / (exp(-2 * v) + 1) - 1 END)
             + (CASE WHEN v >= 0 THEN ln(v + sqrt(v * v + 1))
                     ELSE -ln(-v + sqrt(v * v + 1)) END), 6) AS value
    FROM g
    """,
)
def pqs31_hyperbolic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperbolic extensions tanh/asinh: DuckDB has no hyperbolic
    builtins, so the oracle states them via overflow-stable exp/ln
    identities (tanh saturates to ±1 where exp overflows to inf,
    exactly like java.lang.Math.tanh)."""
    v = 'sum by (event_type) (events)'
    df = _pq(spark, sf_dir, f'tanh({v}) + asinh({v})', 3_600_000)
    return df.withColumn("value", _pr("value", 6))


@register(
    "pqs32_pow_atan2",
    f"""
    WITH g AS ({_SUM_ETYPE_1H})
    SELECT bucket_ts, event_type,
           pround(atan2(pow(abs(v), 0.5), pi()), 6) AS value
    FROM g
    """,
)
def pqs32_pow_atan2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'^' power and the atan2 infix operator (extensions beyond the
    reference's operator table), with pi() as the zero-argument scalar
    on the x side of atan2."""
    v = 'sum by (event_type) (events)'
    df = _pq(spark, sf_dir, f'abs({v}) ^ 0.5 atan2 pi()', 3_600_000)
    return df.withColumn("value", _pr("value", 6))


@register(
    "pqs33_present_over_time",
    f"""
    WITH b AS (
      SELECT DISTINCT chq_timestamp - chq_timestamp % 600000 AS s,
             event_type, user_id
      FROM {_E} e WHERE event_type = 'purchase'
    )
    SELECT DISTINCT bucket_ts, event_type, user_id, 1.0 AS value FROM (
      SELECT unnest(range(s, s + 1800000, 600000)) AS bucket_ts,
             event_type, user_id
      FROM b
    )
    """,
)
def pqs33_present_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """present_over_time (extension): each sample bucket s marks steps
    [s, s + range - step] present for its series — the oracle explodes
    the identical spans and dedupes."""
    return _pq(
        spark, sf_dir,
        'present_over_time(events{event_type="purchase"}[30m])',
        600_000,
    )


@register(
    "pqs34_absent_over_time",
    f"""
    WITH grid AS (
      SELECT unnest(range(1706572800000, 1706745600000, 3600000)) AS bucket_ts
    ),
    b AS (
      SELECT DISTINCT chq_timestamp - chq_timestamp % 3600000 AS s
      FROM {_E} e
      WHERE event_type = 'error'
        AND chq_timestamp >= 1706572800000 AND chq_timestamp < 1706745600000
    ),
    present AS (
      SELECT DISTINCT bucket_ts FROM (
        SELECT unnest(range(s, s + 7200000, 3600000)) AS bucket_ts FROM b
      ) WHERE bucket_ts < 1706745600000
    )
    SELECT g.bucket_ts, 1.0 AS value
    FROM grid g ANTI JOIN present p ON p.bucket_ts = g.bucket_ts
    """,
)
def pqs34_absent_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """absent_over_time (extension): 1 at every step of the explicit
    query grid whose trailing [2h] window holds no sample of any
    matching series — the dual of pqs28's instant absent()."""
    return compile_promql(
        'absent_over_time(events{event_type="error"}[2h])',
        default_metric_catalog(spark, sf_dir),
        3_600_000,
        start_ms=1_706_572_800_000,
        end_ms=1_706_745_600_000,
    )


@register(
    "pqs35_mad_over_time",
    f"""
    SELECT DISTINCT bucket_ts, event_type, user_id,
           pround(mad(value) OVER (
             PARTITION BY event_type, user_id ORDER BY bucket_ts
             RANGE BETWEEN 540000 PRECEDING AND CURRENT ROW), 6) AS value
    FROM (
      SELECT chq_timestamp - chq_timestamp % 60000 AS bucket_ts,
             event_type, user_id, value
      FROM {_E} e WHERE event_type = 'purchase'
    )
    """,
)
def pqs35_mad_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mad_over_time (extension; Prometheus experimental): exact
    interpolated median absolute deviation over the raw samples of a
    10m sliding window — DuckDB's mad() window aggregate is the oracle,
    both medians quantile_cont-interpolated."""
    df = _pq(
        spark, sf_dir,
        'mad_over_time(events{event_type="purchase"}[10m])',
        60_000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "pqs36_holt_winters",
    f"""
    WITH RECURSIVE base AS (
      SELECT chq_timestamp - chq_timestamp % 3600000 AS bucket_ts,
             event_type, user_id, avg(value) AS y
      FROM {_E} e WHERE event_type = 'purchase' GROUP BY 1, 2, 3
    ),
    fr AS (
      SELECT b1.bucket_ts, b1.event_type, b1.user_id,
             list(b2.y ORDER BY b2.bucket_ts) AS vals
      FROM base b1 JOIN base b2
        ON b2.event_type = b1.event_type AND b2.user_id = b1.user_id
       AND b2.bucket_ts BETWEEN b1.bucket_ts - 10800000 AND b1.bucket_ts
      GROUP BY 1, 2, 3
    ),
    cov AS (
      SELECT bucket_ts, event_type, user_id, vals,
             min(bucket_ts) OVER (PARTITION BY event_type, user_id) AS t0
      FROM fr
    ),
    rec AS (
      SELECT bucket_ts, event_type, user_id, len(vals) AS n, vals, 1 AS i,
             CAST(0 AS DOUBLE) AS s0, vals[1] AS s1, vals[2] - vals[1] AS b
      FROM cov WHERE len(vals) >= 2 AND bucket_ts - t0 >= 10800000
      UNION ALL
      SELECT bucket_ts, event_type, user_id, n, vals, i + 1, s1,
             0.3 * vals[i + 1] + 0.7 * (s1 +
               CASE WHEN i = 1 THEN b ELSE 0.6 * (s1 - s0) + 0.4 * b END),
             CASE WHEN i = 1 THEN b ELSE 0.6 * (s1 - s0) + 0.4 * b END
      FROM rec WHERE i < n
    )
    SELECT bucket_ts, event_type, user_id, pround(s1, 6) AS value
    FROM rec WHERE i = n
    """,
)
def pqs36_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """holt_winters (extension; Prometheus trend-aware smoothing): the
    sequential level/trend fold over each [4h] window's per-step
    values, stated declaratively on both sides — a SQL `aggregate`
    fold in Spark, a recursive CTE unrolling the identical recurrence
    in the oracle (same float literals, same operation order)."""
    df = _pq(
        spark, sf_dir,
        'holt_winters(events{event_type="purchase"}[4h], 0.3, 0.6)',
        3_600_000,
    )
    return df.filter(F.col("value").isNotNull()).withColumn(
        "value", _pr("value", 6)
    )


@register(
    "pqs37_time_arith",
    f"""
    SELECT bucket_ts, event_type,
           pround(bucket_ts / 1000.0 - s, 6) AS value
    FROM (
      SELECT bucket_ts, event_type, sum(v) AS s
      FROM (
        SELECT chq_timestamp - chq_timestamp % 3600000 AS bucket_ts,
               event_type, user_id, avg(value) AS v
        FROM {_E} e GROUP BY 1, 2, 3
      ) GROUP BY 1, 2
    )
    """,
)
def pqs37_time_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """time() in vector arithmetic (extension: Prometheus scalar-time
    semantics): ``time() - v`` keeps v's labels — time() is a SCALAR
    whose value is the per-bucket evaluation timestamp, inlined as a
    bucket_ts-derived column (no join, no grid materialization)."""
    df = _pq(
        spark, sf_dir,
        "time() - sum by (event_type) (events)",
        3_600_000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "pqs38_date_components",
    """
    SELECT bucket_ts,
           CAST((bucket_ts // 3600000) % 24
                + 100 * (((bucket_ts // 86400000) + 4) % 7)
                AS DOUBLE) AS value
    FROM (SELECT unnest(range(1706572800000, 1706745600000, 3600000))
          AS bucket_ts)
    """,
)
def pqs38_date_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time component functions over the evaluation grid
    (extensions: Prometheus hour()/day_of_week() etc., all UTC):
    ``hour(time()) + 100 * day_of_week(time())`` composes time-scalar
    builds lazily and materializes once over the explicit query window.
    The oracle states the same components as pure epoch arithmetic
    (epoch day 0 was a Thursday, hence the +4 mod 7)."""
    from lakerunner_spark.promql.compiler import compile_promql

    df = compile_promql(
        "hour(time()) + 100 * day_of_week(time())",
        default_metric_catalog(spark, sf_dir),
        3_600_000,
        start_ms=1706572800000,
        end_ms=1706745600000,
    )
    return df.select("bucket_ts", F.col("value").cast("double").alias("value"))


@register(
    "lqs16_duration_bytes_filter",
    f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM {_E} e
    WHERE event_type = 'error' AND value / 1000.0 > 0.05
      AND value * 1000.0 >= 20000.0
    GROUP BY event_type
    """,
)
def lqs16_duration_bytes_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration/bytes label filters (extensions; Loki unit literals —
    the reference's asNumericSQL degrades them to NULL casts,
    sql_builder.go:572-579): `lat > 50ms` parses the label as a
    duration in seconds, `sz >= 20kb` as bytes; the oracle states the
    same comparisons in raw units."""
    from lakerunner_spark.logql.compiler import LogSource, compile_logql_lines
    from lakerunner_spark.testdata import events_stream

    ev = events_stream(spark, sf_dir).withColumn(
        "log_message",
        F.concat(
            F.lit("lat="), F.col("value").cast("string"), F.lit("ms"),
            F.lit(" sz="), (F.col("value")).cast("string"), F.lit("kb"),
        ),
    )
    src = LogSource(ev, ["event_type"])
    df = compile_logql_lines(
        '{event_type="error"} | logfmt | lat > 50ms | sz >= 20kb', src
    )
    return df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@register(
    "lqs17_ip_filter",
    f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM {_E} e
    WHERE event_type = 'click' AND (user_id % 256) IN (4, 5)
    GROUP BY event_type
    """,
)
def lqs17_ip_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ip() line filter (extension; Loki ip matchers): candidate IPv4s
    are pulled with regexp_extract_all and range-tested with an exists
    lambda — pure expressions, no UDF. The synthetic address embeds
    user_id so the oracle can state the range test as modular
    arithmetic."""
    from lakerunner_spark.logql.compiler import LogSource, compile_logql_lines
    from lakerunner_spark.testdata import events_stream

    ev = events_stream(spark, sf_dir).withColumn(
        "log_message",
        F.concat(
            F.lit("conn from 10.0."),
            (F.col("user_id") % 256).cast("string"),
            F.lit("."),
            (F.col("user_id") % 250).cast("string"),
            F.lit(" ok"),
        ),
    )
    src = LogSource(ev, ["event_type"])
    df = compile_logql_lines(
        '{event_type="click"} |= ip("10.0.4.0-10.0.5.255")', src
    )
    return df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@register(
    "lqs18_error_label",
    f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_clean,
           CAST((SELECT count(*) FROM {_E} e2
                 WHERE e2.event_type = 'error'
                   AND e2.user_id % 5 = 0) AS BIGINT) AS n_broken
    FROM {_E} e
    WHERE event_type = 'error' AND user_id % 5 != 0
    GROUP BY event_type
    """,
)
def lqs18_error_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loki ``__error__`` label semantics (extension; the reference has
    no parser-error channel): malformed JSON lines get
    ``__error__="JSONParserErr"`` from the json stage, so
    ``| __error__ = ""`` keeps clean lines and ``!= ""`` selects broken
    ones. The synthetic corpus breaks every 5th user's line; the oracle
    states the same split arithmetically."""
    from lakerunner_spark.logql.compiler import LogSource, compile_logql_lines
    from lakerunner_spark.testdata import events_stream

    ev = events_stream(spark, sf_dir).withColumn(
        "log_message",
        F.when(F.col("user_id") % 5 == 0, F.lit("broken{")).otherwise(
            F.col("props")
        ),
    )
    src = LogSource(ev, ["event_type"])
    clean = compile_logql_lines(
        '{event_type="error"} | json k="$.k" | __error__ = ""', src
    ).groupBy("event_type").agg(F.count(F.lit(1)).alias("n_clean"))
    broken = compile_logql_lines(
        '{event_type="error"} | json k="$.k" | __error__ != ""', src
    ).groupBy("event_type").agg(F.count(F.lit(1)).alias("n_broken"))
    return clean.join(F.broadcast(broken), "event_type")


@register(
    "pqs39_at_modifier",
    f"""
    WITH grid AS (
      SELECT unnest(range(1706572800000, 1706745600000, 3600000)) AS bucket_ts
    ),
    pinned AS (
      SELECT event_type, sum(v) AS pin
      FROM (
        SELECT chq_timestamp - chq_timestamp % 3600000 AS b, event_type,
               user_id, avg(value) AS v
        FROM {_E} e GROUP BY 1, 2, 3
      ) WHERE b = 1706572800000
      GROUP BY event_type
    ),
    now_v AS (
      SELECT b AS bucket_ts, event_type, sum(v) AS cur
      FROM (
        SELECT chq_timestamp - chq_timestamp % 3600000 AS b, event_type,
               user_id, avg(value) AS v
        FROM {_E} e GROUP BY 1, 2, 3
      )
      WHERE b >= 1706572800000 AND b < 1706745600000
      GROUP BY 1, 2
    )
    SELECT n.bucket_ts, n.event_type, pround(n.cur - p.pin, 6) AS value
    FROM now_v n JOIN pinned p USING (event_type)
    """,
)
def pqs39_at_modifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """@ modifier (extension; Prometheus at-modifier semantics): the
    pinned selector evaluates once at the fixed time and broadcasts to
    every grid step via an explode over the grid sequence — no join, so
    the plan stays cartesian-free. Query: deviation of each series'
    current value from its value at the window start."""
    from lakerunner_spark.promql.compiler import compile_promql

    df = compile_promql(
        "sum by (event_type) (events)"
        " - sum by (event_type) (events @ start())",
        default_metric_catalog(spark, sf_dir),
        3_600_000,
        start_ms=1706572800000,
        end_ms=1706745600000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "pqs40_limitk",
    f"""
    WITH base AS (
      SELECT bucket_ts, event_type, pround(s, 6) AS value FROM (
        SELECT bucket_ts, event_type, sum(v) AS s FROM (
          SELECT chq_timestamp - chq_timestamp % 3600000 AS bucket_ts,
                 event_type, user_id, avg(value) AS v
          FROM {_E} e GROUP BY 1, 2, 3
        ) GROUP BY 1, 2
      )
    )
    SELECT bucket_ts, event_type, value FROM (
      SELECT *, row_number() OVER (
        PARTITION BY bucket_ts ORDER BY event_type ASC) AS rn
      FROM base
    ) WHERE rn <= 3
    """,
)
def pqs40_limitk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """limitk (extension; Prometheus 3.x experimental): keeps k series
    per bucket. Upstream samples pseudo-randomly; here the pick is
    DETERMINISTIC — first k in label-tuple order — so the oracle can
    restate it as a ranking window."""
    df = _pq(
        spark, sf_dir,
        "limitk(3, sum by (event_type) (events))",
        3_600_000,
    )
    return df.withColumn("value", _pr("value", 6))


def _pqs41_oracle() -> str:
    from lakerunner_spark.functions.hashing import fnv64a_sql

    h = fnv64a_sql("event_type")
    return f"""
    SELECT bucket_ts, event_type, pround(s, 6) AS value FROM (
      SELECT bucket_ts, event_type, sum(v) AS s FROM (
        SELECT chq_timestamp - chq_timestamp % 3600000 AS bucket_ts,
               event_type, user_id, avg(value) AS v
        FROM {_E} e GROUP BY 1, 2, 3
      ) GROUP BY 1, 2
    )
    WHERE ((({h}) % 1000 + 1000) % 1000) / 1000.0 < 0.5
    """


@register("pqs41_limit_ratio", _pqs41_oracle())
def pqs41_limit_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """limit_ratio (extension; Prometheus 3.x experimental):
    deterministic hash-based series sampling — a series is kept when
    its fnv64a(label identity) bucket lands under the ratio, so r and
    -r partition the series set exactly (upstream's complement
    property). The oracle reuses the bit-identical fnv64a SQL twin."""
    df = _pq(
        spark, sf_dir,
        "limit_ratio(0.5, sum by (event_type) (events))",
        3_600_000,
    )
    return df.withColumn("value", _pr("value", 6))


@register(
    "lqs19_unpack",
    f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM {_E} e
    WHERE event_type = 'error'
      AND contains(json_extract_string(
            '{{"_entry": "msg k=' || CAST(json_extract(props, '$.k') AS VARCHAR)
              || '", "pod": "p' || CAST(user_id % 3 AS VARCHAR) || '"}}',
            '$._entry'), 'k=1')
      AND json_extract_string(
            '{{"_entry": "msg k=' || CAST(json_extract(props, '$.k') AS VARCHAR)
              || '", "pod": "p' || CAST(user_id % 3 AS VARCHAR) || '"}}',
            '$.pod') = 'p1'
    GROUP BY event_type
    """,
)
def lqs19_unpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``| unpack`` (extension; Loki promtail pack format): the JSON
    ``_entry`` key replaces the line body, other keys become labels —
    so a line filter after unpack matches the ORIGINAL message and the
    promoted pod label filters like any label. The oracle applies the
    same json_extract arithmetic to the synthesized packed lines."""
    from lakerunner_spark.logql.compiler import LogSource, compile_logql_lines
    from lakerunner_spark.testdata import events_stream

    ev = events_stream(spark, sf_dir).withColumn(
        "log_message",
        F.concat(
            F.lit('{"_entry": "msg k='),
            F.get_json_object("props", "$.k"),
            F.lit('", "pod": "p'),
            (F.col("user_id") % 3).cast("string"),
            F.lit('"}'),
        ),
    )
    src = LogSource(ev, ["event_type"])
    df = compile_logql_lines(
        '{event_type="error"} | unpack |= "k=1" | pod = "p1"', src
    )
    return df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@register(
    "lqs20_nested_topk",
    f"""
    WITH counted AS (
      SELECT bucket_ts, event_type, CAST(count(*) AS DOUBLE) AS value
      FROM (
        SELECT chq_timestamp - chq_timestamp % 600000 AS bucket_ts,
               event_type
        FROM {_E} e
      ) GROUP BY 1, 2
    )
    SELECT bucket_ts, event_type, value FROM (
      SELECT *, row_number() OVER (
        PARTITION BY bucket_ts ORDER BY value DESC, event_type ASC) AS rn
      FROM counted
    ) WHERE rn <= 2
    """,
)
def lqs20_nested_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested LogQL vector aggregation (extension; Loki allows
    arbitrary nesting, the reference's parser requires vector-agg-over-
    range-agg): topk(2, sum by (event_type) (count_over_time(...))) —
    the sum collapses streams to event_type series, then the ranking
    window keeps the 2 busiest per bucket."""
    df = _lq(
        spark, sf_dir,
        'topk(2, sum by (event_type) '
        '(count_over_time({event_type=~".+"} [10m])))',
        600_000,
    )
    return df


@register(
    "lqs21_ipv6_filter",
    f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM {_E} e
    WHERE event_type = 'click' AND (user_id % 256) BETWEEN 64 AND 79
    GROUP BY event_type
    """,
)
def lqs21_ipv6_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv6 ip() matchers (extension; Loki supports v6 CIDRs/ranges):
    the line filter and the label matcher both range-test 128-bit
    addresses by expanding the textual form ('::'-compressed, mixed
    case, IPv4-mapped tails) to its 32-hex-digit canonical string —
    lexicographic order there IS numeric order, so the comparison is a
    plain string BETWEEN, pure expressions end to end. The synthetic
    address embeds user_id so the oracle states both range tests as
    modular arithmetic (line filter keeps [0x10,0x4f]; the /122 CIDR
    label matcher keeps the [0x40,0x7f] block; intersection [64,79])."""
    from lakerunner_spark.logql.compiler import LogSource, compile_logql_lines
    from lakerunner_spark.testdata import events_stream

    ev = events_stream(spark, sf_dir).withColumn(
        "log_message",
        F.concat(
            F.lit("conn addr=2001:DB8::"),
            F.upper(F.hex(F.col("user_id") % 256)),
            F.lit(" ok"),
        ),
    )
    src = LogSource(ev, ["event_type"])
    df = compile_logql_lines(
        '{event_type="click"} |= ip("2001:db8::10-2001:db8::4f")'
        ' | logfmt | addr = ip("2001:db8::40/122")',
        src,
    )
    return df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@register(
    "lqs22_logfmt_error",
    f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_clean,
           CAST((SELECT count(*) FROM {_E} e2
                 WHERE e2.event_type = 'error'
                   AND e2.user_id % 7 = 0) AS BIGINT) AS n_broken
    FROM {_E} e
    WHERE event_type = 'error' AND user_id % 7 != 0
    GROUP BY event_type
    """,
)
def lqs22_logfmt_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``__error__`` for the logfmt parser (Loki LogfmtParserErr):
    lines with unterminated quoted values surface as parse errors
    instead of silently passing a fabricated clean label (the json
    stage already had this; logfmt now emits it too — Loki's regexp
    parser never sets __error__, so the clean-line fallback remains
    correct there). Every 7th user's line drops its closing quote; the
    oracle states the clean/broken split arithmetically."""
    from lakerunner_spark.logql.compiler import LogSource, compile_logql_lines
    from lakerunner_spark.testdata import events_stream

    ev = events_stream(spark, sf_dir).withColumn(
        "log_message",
        F.when(
            F.col("user_id") % 7 == 0, F.lit('k="broken v=1')
        ).otherwise(F.lit('k="ok" v=1')),
    )
    src = LogSource(ev, ["event_type"])
    clean = compile_logql_lines(
        '{event_type="error"} | logfmt | __error__ = ""', src
    ).groupBy("event_type").agg(F.count(F.lit(1)).alias("n_clean"))
    broken = compile_logql_lines(
        '{event_type="error"} | logfmt | __error__ != ""', src
    ).groupBy("event_type").agg(F.count(F.lit(1)).alias("n_broken"))
    return clean.join(F.broadcast(broken), "event_type")


@register(
    "lqs23_or_line_filter",
    f"""
    SELECT CAST(sum(CASE WHEN event_type IN ('click', 'purchase')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
           CAST(sum(CASE WHEN event_type NOT IN ('click', 'purchase')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_rest
    FROM {_E} e
    """,
)
def lqs23_or_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loki 3.x `or` chains in line filters (extension; the reference
    compiles single-needle filters only): ``|= "a" or "b"`` keeps
    lines matching ANY term, and a negated head op negates the WHOLE
    disjunction (``!= "a" or "b"`` keeps lines matching neither) —
    terms may mix strings and ip() patterns. The oracle states both
    sides of the partition as IN / NOT IN arithmetic."""
    from lakerunner_spark.logql.compiler import LogSource, compile_logql_lines
    from lakerunner_spark.testdata import events_stream

    ev = events_stream(spark, sf_dir).withColumn(
        "log_message",
        F.concat(F.lit("evt="), F.col("event_type"),
                 F.lit(" uid="), F.col("user_id").cast("string")),
    )
    src = LogSource(ev, ["event_type"])
    match = compile_logql_lines(
        '{event_type=~".+"} |= "evt=click " or "evt=purchase "', src
    ).agg(F.count(F.lit(1)).alias("n_match"))
    rest = compile_logql_lines(
        '{event_type=~".+"} != "evt=click " or "evt=purchase "', src
    ).agg(F.count(F.lit(1)).alias("n_rest"))
    return match.crossJoin(F.broadcast(rest))


@register(
    "lqs24_label_filter_or",
    f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM {_E} e
    WHERE event_type = 'view'
      AND (value / 1000.0 >= 0.2 OR value * 1000.0 < 20000.0
           OR user_id = 0)
    GROUP BY event_type
    """,
)
def lqs24_label_filter_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loki label-filter expressions (extension past the reference's
    single-predicate filters): ``| p or q or r`` passes rows where ANY
    predicate holds, mixing conversion classes (duration literal,
    bytes literal, numeric) in one disjunction; ``and``/``,`` chains
    compile to sequential filters. The synthetic logfmt line carries
    value-derived duration/size labels and user_id, so the oracle
    states the disjunction as raw arithmetic."""
    from lakerunner_spark.logql.compiler import LogSource, compile_logql_lines
    from lakerunner_spark.testdata import events_stream

    ev = events_stream(spark, sf_dir).withColumn(
        "log_message",
        F.concat(
            F.lit("lat="), F.col("value").cast("string"), F.lit("ms"),
            F.lit(" sz="), F.col("value").cast("string"), F.lit("kb"),
            F.lit(" uid="), F.col("user_id").cast("string"),
        ),
    )
    src = LogSource(ev, ["event_type"])
    df = compile_logql_lines(
        '{event_type="view"} | logfmt'
        ' | lat >= 200ms or sz < 20kb or uid == 0',
        src,
    )
    return df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


def _pqs46_oracle() -> str:
    from lakerunner_spark.operators.native_histogram import (
        histogram_stddev_sql,
    )

    base = (
        f"SELECT chq_timestamp - chq_timestamp % 60000 AS bucket_ts,"
        f" event_type, user_id, value FROM {_E} e"
    )
    inner = histogram_stddev_sql(
        base, ["bucket_ts", "event_type", "user_id"], "value"
    )
    return f"""
    SELECT bucket_ts, event_type, user_id, pround(h_stddev, 6) AS value
    FROM ({inner})
    """


@register("pqs46_histogram_stddev_parser", _pqs46_oracle())
def pqs46_histogram_stddev_parser(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``histogram_stddev(events)`` through the PromQL PARSER (native-
    histogram accessor family as first-class query text, usable via the
    HTTP API shim): the per-step native histogram is synthesized from
    the step bucket's raw samples (the engine's F13 raw-distribution
    convention), then upstream's bucket-midpoint stddev contract runs
    per (step, series). Oracle replays bucket index, midpoint, and
    variance arithmetic term for term."""
    df = _pq(spark, sf_dir, "histogram_stddev(events)", 60_000)
    return df.withColumn("value", _pr("value", 6))


def _pqs47_oracle() -> str:
    from lakerunner_spark.operators.native_histogram import (
        histogram_fraction_sql,
    )

    base = (
        f"SELECT chq_timestamp - chq_timestamp % 60000 AS bucket_ts,"
        f" event_type, user_id, value FROM {_E} e"
    )
    inner = histogram_fraction_sql(
        base, ["bucket_ts", "event_type", "user_id"], "value", -5.0, 10.0,
        out_col="value",
    )
    return f"""
    SELECT bucket_ts, event_type, user_id, pround(value, 6) AS value
    FROM ({inner})
    """


@register("pqs47_histogram_fraction_parser", _pqs47_oracle())
def pqs47_histogram_fraction_parser(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``histogram_fraction(-5, 10, events)`` through the PromQL parser
    (negative bound exercises the unary-minus literal fold): per-step
    per-series share of observations inside [lo, hi] from the
    exponential bucket overlap algebra."""
    df = _pq(spark, sf_dir, "histogram_fraction(-5, 10, events)", 60_000)
    return df.withColumn("value", _pr("value", 6))


@register(
    "o4_ordered_slices_concat",
    f"""
    WITH base AS (
      SELECT chq_timestamp - chq_timestamp % 60000 AS bucket_ts,
             event_type, user_id, sum(value) AS s
      FROM {_E} e GROUP BY 1, 2, 3
    )
    SELECT bucket_ts, event_type, user_id,
           pround(s / ((bucket_ts - lag(bucket_ts) OVER w) / 1000.0), 6)
             AS value
    FROM base
    WINDOW w AS (PARTITION BY event_type, user_id ORDER BY bucket_ts)
    QUALIFY lag(bucket_ts) OVER w IS NOT NULL
        AND bucket_ts - lag(bucket_ts) OVER w <= 1740000
    """,
)
def o4_ordered_slices_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 under the driver gate: the ordered-emission slicing
    (plans/ordered.py — runOrderedCoordinator's time-disjoint slice
    plans) evaluated as a BATCH CONCAT of its four slices, against the
    one-shot oracle. irate is the gate-carrying-free shape whose
    exactness proves the machinery end to end: each slice's first
    bucket takes its lag() from the LOOKBACK rows the compiler scans
    below the slice start, and the per-slice output clip keeps every
    bucket owned by exactly one slice — so four independently
    compiled, partition-pruned plans concatenate to the identical
    result the single full-window plan produces, value for value.
    (The incremental-arrival half of O4 — first slice's rows before
    the last slice runs — is a generator property pytest pins in
    tests/test_ordered_emission.py; this entry pins the equality half
    where the driver can hash it.) The window-bounds probe is one
    bounded 1-row aggregate at plan time (the documented probe
    class). The slice build/clip comes from plans/ordered.py's
    build_slice_plan — the SAME closure the emission harness runs —
    so this gate entry certifies the harness's actual semantics, not
    a parallel re-implementation of them."""
    from functools import reduce

    from lakerunner_spark.plans.ordered import build_slice_plan, range_slices
    from lakerunner_spark.testdata import events_stream

    step = 60_000
    cat = default_metric_catalog(spark, sf_dir)
    ev = events_stream(spark, sf_dir)
    lo, hi = ev.agg(
        F.min("chq_timestamp"), F.max("chq_timestamp")
    ).first()
    start, end = int(lo), int(hi) + 1
    slices = range_slices(start, end, 4, step)

    out = reduce(
        lambda a, b: a.unionByName(b),
        (
            build_slice_plan("irate(events[30m])", cat, step, start, a, b)
            for a, b in slices
        ),
    )
    return out.filter(F.col("value").isNotNull()).withColumn(
        "value", _pr("value", 6)
    )
