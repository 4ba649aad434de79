"""DDSketch query catalog (X1): declarative sketch build/merge/quantile
with exact DuckDB oracle parity (integer buckets + counts)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakerunner_spark.functions.rounding import portable_round as _pr
from lakerunner_spark.operators.ddsketch import (
    ddsketch_agg,
    ddsketch_merge,
    ddsketch_quantile,
    ddsketch_quantile_sql,
    ddsketch_quantiles,
    ddsketch_quantiles_sql,
)
from lakerunner_spark.queries import register
from lakerunner_spark.testdata import EVENTS_MS_SQL, events_stream

_ABS_E = f"SELECT event_type, user_id, abs(value) AS v FROM ({EVENTS_MS_SQL})"


@register(
    "x1_ddsketch_p95",
    f"""
    SELECT event_type, pround(value, 6) AS value FROM (
      {ddsketch_quantile_sql(_ABS_E, ["event_type"], "v", 0.95)}
    )
    """,
)
def x1_ddsketch_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: DDSketch p95 per event_type — build + quantile walk."""
    from pyspark.sql import functions as F

    e = events_stream(spark, sf_dir).select(
        "event_type", "user_id", F.abs("value").alias("v")
    )
    sk = ddsketch_agg(e, ["event_type"], "v")
    out = ddsketch_quantile(sk, ["event_type"], 0.95)
    return out.withColumn("value", _pr("value", 6))


@register(
    "x1_ddsketch_merge",
    f"""
    SELECT event_type, pround(value, 6) AS value FROM (
      {ddsketch_quantile_sql(_ABS_E, ["event_type"], "v", 0.5)}
    )
    """,
)
def x1_ddsketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/A2: tiered sketch merge — build per (event_type, user_id),
    merge to event_type, then quantile. The oracle states the DIRECT
    single-level build: parity proves merge associativity (the property
    the 10s->1h rollup chain relies on)."""
    from pyspark.sql import functions as F

    e = events_stream(spark, sf_dir).select(
        "event_type", "user_id", F.abs("value").alias("v")
    )
    fine = ddsketch_agg(e, ["event_type", "user_id"], "v")
    coarse = ddsketch_merge(fine, ["event_type"])
    out = ddsketch_quantile(coarse, ["event_type"], 0.5)
    return out.withColumn("value", _pr("value", 6))


# deterministic mixed-sign transform: values recentred around zero so
# roughly half the samples land in the mirrored negative store
_SIGNED_E = (
    f"SELECT event_type, user_id, value - 50.0 AS v FROM ({EVENTS_MS_SQL})"
)


@register(
    "x1_ddsketch_signed_median",
    f"""
    SELECT event_type, pround(value, 6) AS value FROM (
      {ddsketch_quantile_sql(_SIGNED_E, ["event_type"], "v", 0.5)}
    )
    """,
)
def x1_ddsketch_signed_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 negative store: median over MIXED-SIGN data — the mirrored
    negative-bucket mapping keeps index order aligned with value order,
    so one cumulative walk answers quantiles across signs (no NaN; the
    DuckDB oracle reproduces the signed bucket algebra bit-for-bit)."""
    from pyspark.sql import functions as F

    e = events_stream(spark, sf_dir).select(
        "event_type", (F.col("value") - 50.0).alias("v")
    )
    sk = ddsketch_agg(e, ["event_type"], "v")
    out = ddsketch_quantile(sk, ["event_type"], 0.5)
    return out.withColumn("value", _pr("value", 6))


@register(
    "otlp1_exp_histogram_quantile",
    """
    WITH series AS (SELECT unnest(range(4)) AS s),
    ts AS (SELECT unnest(range(2)) AS t),
    idx AS (SELECT unnest(range(10)) AS i),
    b0 AS (
      SELECT (t + 1) * 3600000 AS bucket_ts, 'svc' || s AS svc,
             0.0 AS le, CAST(s % 3 AS DOUBLE) AS cnt
      FROM series CROSS JOIN ts WHERE s % 3 > 0
    ),
    bp AS (
      SELECT (t + 1) * 3600000 AS bucket_ts, 'svc' || s AS svc,
             power(power(2.0, power(2.0, -1)), 2 + i + 1) AS le,
             CAST((s * 7 + i * 3 + t) % 5 AS DOUBLE) AS cnt
      FROM series CROSS JOIN ts CROSS JOIN idx
      WHERE (s * 7 + i * 3 + t) % 5 > 0
    ),
    binf AS (
      SELECT (t + 1) * 3600000 AS bucket_ts, 'svc' || s AS svc,
             CAST('inf' AS DOUBLE) AS le, 0.0 AS cnt
      FROM series CROSS JOIN ts
    ),
    b AS (SELECT * FROM b0 UNION ALL SELECT * FROM bp
          UNION ALL SELECT * FROM binf),
    cum AS (
      SELECT bucket_ts, svc, le,
             sum(cnt) OVER (PARTITION BY bucket_ts, svc
                            ORDER BY le) AS cum
      FROM b
    ),
    w AS (
      SELECT bucket_ts, svc, le, cum,
             max(cum) OVER (PARTITION BY bucket_ts, svc) AS total,
             lag(le) OVER (PARTITION BY bucket_ts, svc ORDER BY le) AS ple,
             lag(cum) OVER (PARTITION BY bucket_ts, svc ORDER BY le) AS pcum
      FROM cum
    )
    SELECT bucket_ts, svc, pround(
        CASE WHEN le = CAST('inf' AS DOUBLE) THEN ple
             WHEN ple IS NULL THEN
               CASE WHEN le <= 0 THEN le ELSE le * (0.5 * total) / cum END
             ELSE ple + (le - ple) * (0.5 * total - pcum) / (cum - pcum)
        END, 6) AS value
    FROM w
    WHERE total > 0 AND cum >= 0.5 * total
      AND (pcum IS NULL OR pcum < 0.5 * total)
      AND NOT (le = CAST('inf' AS DOUBLE) AND ple IS NULL)
    """,
)
def otlp1_exp_histogram_quantile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """S6 end-to-end: OTLP exponential-histogram payload bytes ->
    protowire decode (zigzag scale/offset, packed bucket varints ->
    le-bounded rows, sources/otel.py) -> +Inf bridge -> cumulative
    buckets -> Prometheus histogram_quantile interpolation, as ONE
    registered plan. The fixture payload is deterministic arithmetic
    (sources/otlp_encode.py): the oracle regenerates the identical
    bucket table from the same formulas — skipping zero-count buckets
    exactly as the decoder does — and replicates the interpolation
    term for term (pqs26's CTE), so the hash certifies the whole
    decode + bucket-math + quantile composition, not just row counts.

    Reference: metric_ingest_duckdb.go:238 (otel_metrics_read explodes
    histogram datapoints); promql/quantile_node.go serves quantiles
    from raw samples — exponential-histogram le-bucket evaluation is
    this engine's extension (SURVEY §2 S6/F13)."""
    import os

    from pyspark.sql import functions as F

    from lakerunner_spark.operators.histogram import (
        cumulate_buckets,
        histogram_quantile_buckets,
        with_inf_bucket,
    )
    from lakerunner_spark.sources.otel import read_otlp_metrics
    from lakerunner_spark.sources.otlp_encode import (
        exp_histogram_payload,
        write_fixture,
    )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = write_fixture(
        # v2: counts/zero_counts encoded fixed64 per the proto schema
        # (new name so stale cached v1 fixtures are never reused)
        os.path.join(root, ".localdata", "otlp_fixtures", "exp_hist_v2.binpb"),
        exp_histogram_payload(),
    )
    m = read_otlp_metrics(spark, path)
    b = (
        m.filter(F.col("chq_metric_type") == "exponential_histogram")
        .select(
            F.col("chq_timestamp").alias("bucket_ts"),
            F.element_at("attr_values", 1).alias("svc"),
            F.col("bucket_le").alias("le"),
            F.col("value"),
        )
    )
    cum = cumulate_buckets(with_inf_bucket(b))
    out = histogram_quantile_buckets(cum, 0.5)
    return out.withColumn("value", _pr("value", 6))


# ---------------------- Prometheus native histograms ------------------------
# (extension; the reference has no native-histogram evaluator — see
# operators/native_histogram.py module docstring)

from lakerunner_spark.operators.native_histogram import (  # noqa: E402
    histogram_fraction_sql,
    native_histogram_quantile_sql,
)


@register(
    "pqs42_native_histogram_fields",
    f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS h_count,
           pround(sum(v), 6) AS h_sum,
           pround(sum(v) / count(*), 6) AS h_avg
    FROM ({_SIGNED_E}) GROUP BY event_type
    """,
)
def pqs42_native_histogram_fields(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """histogram_count / histogram_sum / histogram_avg over native
    histograms built from raw samples. h_count is deliberately derived
    from the BUCKET rows (sum of per-bucket counts), while h_sum/h_avg
    come from the carried-fields aggregation — the oracle's plain
    count(*)/sum certifies that the bucket algebra loses no
    observations, which is exactly the property that makes bucket-row
    merges (rollup tiers) trustworthy."""
    from pyspark.sql import functions as F

    from lakerunner_spark.operators.native_histogram import (
        native_histogram_agg,
        native_histogram_stats,
    )

    e = events_stream(spark, sf_dir).select(
        "event_type", (F.col("value") - 50.0).alias("v")
    )
    buckets = native_histogram_agg(e, ["event_type"], "v")
    h_count = buckets.groupBy("event_type").agg(
        F.sum("count").alias("h_count")
    )
    stats = native_histogram_stats(e, ["event_type"], "v")
    return h_count.join(stats.drop("h_count"), "event_type").select(
        "event_type",
        "h_count",
        _pr("h_sum", 6).alias("h_sum"),
        _pr("h_avg", 6).alias("h_avg"),
    )


@register(
    "pqs43_native_histogram_quantile",
    f"""
    SELECT event_type, pround(value, 6) AS value FROM (
      {native_histogram_quantile_sql(_SIGNED_E, ["event_type"], "v", 0.5)}
    )
    """,
)
def pqs43_native_histogram_quantile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Native histogram_quantile (median) over mixed-sign samples:
    exponential buckets at schema 3 (gamma = 2^(1/8)), cumulative walk
    across the mirrored negative store / zero bucket / positive store,
    EXPONENTIAL interpolation inside the target bucket (Prometheus 3.x
    PR #14677's log-space rule for standard exponential buckets,
    unlike DDSketch's mid-bucket point). The oracle replays the
    identical bucket math."""
    from pyspark.sql import functions as F

    from lakerunner_spark.operators.native_histogram import (
        histogram_quantile_native,
        native_histogram_agg,
    )

    e = events_stream(spark, sf_dir).select(
        "event_type", (F.col("value") - 50.0).alias("v")
    )
    sk = native_histogram_agg(e, ["event_type"], "v")
    out = histogram_quantile_native(sk, ["event_type"], 0.5)
    return out.withColumn("value", _pr("value", 6))


@register(
    "pqs44_native_histogram_fraction",
    f"""
    SELECT event_type, pround(fraction, 6) AS fraction FROM (
      {histogram_fraction_sql(_SIGNED_E, ["event_type"], "v", -5.0, 10.0)}
    )
    """,
)
def pqs44_native_histogram_fraction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """histogram_fraction(-5, 10, h): estimated share of observations
    inside [lo, hi] — each bucket contributes its count scaled by the
    LOG-SPACE overlap of the interval with the bucket's bounds (the
    PR #14677 exponential-interpolation contract); the zero bucket
    contributes fully when the interval spans 0. Fraction and
    quantile answer from the SAME merged bucket rows, so a tier
    rollup serves both."""
    from pyspark.sql import functions as F

    from lakerunner_spark.operators.native_histogram import (
        histogram_fraction,
        native_histogram_agg,
    )

    e = events_stream(spark, sf_dir).select(
        "event_type", (F.col("value") - 50.0).alias("v")
    )
    sk = native_histogram_agg(e, ["event_type"], "v")
    out = histogram_fraction(sk, ["event_type"], -5.0, 10.0)
    return out.withColumn("fraction", _pr("fraction", 6))


# ------------------------- maintenance plane --------------------------------


@register(
    "maint1_compaction_requery",
    f"""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           pround(sum(value), 6) AS total
    FROM ({EVENTS_MS_SQL}) GROUP BY event_type
    """,
)
def maint1_compaction_requery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintenance plane end-to-end, oracle-parity-gated: cook the
    events stream into the metrics segment shape, write it DELIBERATELY
    fragmented (16 tiny files — the post-ingest state compaction
    exists to fix), run the crash-safe compaction protocol
    (maintenance/compaction.py: plan -> staged write -> manifest
    commit -> swap), then RE-QUERY the compacted partition and
    aggregate. The oracle aggregates the raw events directly, so the
    hash certifies that a full fragment->compact->swap cycle loses,
    duplicates, and reorders nothing — the invariant the reference's
    upload-then-republish flow guarantees via Postgres registration
    (OVERVIEW.md:277).

    This registration EXECUTES the compaction job at DataFrame-build
    time (it is a filesystem job, not a lazy plan) into a gitignored
    per-invocation scratch dir; stale scratch from prior invocations
    is swept on entry."""
    import shutil
    import time as _time
    import uuid

    import os as _os

    from pyspark.sql import functions as F

    from lakerunner_spark.maintenance.compaction import (
        compact_segments,
        plan_compaction,
    )

    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    cache = _os.path.join(root, ".localdata", "maint_bench")
    _os.makedirs(cache, exist_ok=True)
    now = _time.time()
    for old in _os.listdir(cache):
        p = _os.path.join(cache, old)
        try:
            if now - _os.path.getmtime(p) > 3600:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass

    e = (
        events_stream(spark, sf_dir)
        .withColumnRenamed("event_type", "metric_name")
        .withColumn("chq_tid", F.col("user_id").cast("long"))
    )
    part = _os.path.join(cache, uuid.uuid4().hex, "dateint=20240101")
    e.repartition(16).write.mode("overwrite").parquet(part)
    for f in _os.listdir(part):
        if not f.endswith(".parquet"):
            _os.remove(_os.path.join(part, f))
    task = plan_compaction(part)
    if task is None:  # pragma: no cover - 16-way fragment always plans
        raise RuntimeError("maint1: fragmented partition did not plan")
    n_out = compact_segments(spark, task, "metrics")
    if n_out < 1:  # pragma: no cover
        raise RuntimeError("maint1: compaction produced no output")
    back = spark.read.parquet(part)
    return back.groupBy(
        F.col("metric_name").alias("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        _pr(F.sum("value"), 6).alias("total"),
    )


def _pqs45_oracle() -> str:
    from lakerunner_spark.operators.native_histogram import (
        histogram_stddev_sql,
    )

    return f"""
    SELECT event_type, pround(h_stdvar, 6) AS h_stdvar,
           pround(h_stddev, 6) AS h_stddev
    FROM ({histogram_stddev_sql(_SIGNED_E, ["event_type"], "v")})
    """


@register("pqs45_native_histogram_stddev", _pqs45_oracle())
def pqs45_native_histogram_stddev(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """histogram_stddev / histogram_stdvar (upstream funcHistogramStdDev):
    observations assumed at each bucket's GEOMETRIC midpoint
    gamma^(i-0.5) (the standard-exponential-bucket rule; arithmetic
    midpoints are custom-bucket-only upstream), deviation measured
    from the TRUE mean (the carried sum/count — not a bucket
    estimate), count-weighted. The stats join-back is one row per
    group; bucket rows never re-scan raw samples. Oracle replays the
    identical midpoint/variance arithmetic."""
    from pyspark.sql import functions as F

    from lakerunner_spark.operators.native_histogram import (
        histogram_stddev_stdvar,
        native_histogram_agg,
        native_histogram_stats,
    )

    e = events_stream(spark, sf_dir).select(
        "event_type", (F.col("value") - 50.0).alias("v")
    )
    sk = native_histogram_agg(e, ["event_type"], "v")
    st = native_histogram_stats(e, ["event_type"], "v")
    out = histogram_stddev_stdvar(sk, st, ["event_type"])
    return out.select(
        "event_type",
        _pr("h_stdvar", 6).alias("h_stdvar"),
        _pr("h_stddev", 6).alias("h_stddev"),
    )


def _pqs48_oracle() -> str:
    from lakerunner_spark.operators.native_histogram import (
        downscaled_bucket_sql,
        gamma_for_schema,
        native_histogram_quantile_from_rows_sql,
        nh_bucket_index_sql,
    )

    b4 = nh_bucket_index_sql("v", gamma_for_schema(4))
    b3 = nh_bucket_index_sql("v", gamma_for_schema(3))
    rows = f"""
      SELECT event_type,
             CASE WHEN user_id % 2 = 0
                  THEN ({downscaled_bucket_sql(b4, 1)})
                  ELSE ({b3}) END AS bucket
      FROM ({_SIGNED_E}) WHERE v IS NOT NULL
    """
    inner = native_histogram_quantile_from_rows_sql(
        rows, ["event_type"], 0.9, schema=3
    )
    return f"SELECT event_type, pround(value, 6) AS value FROM ({inner})"


@register("pqs48_native_histogram_mixed_schema", _pqs48_oracle())
def pqs48_native_histogram_mixed_schema(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-schema native-histogram merge (upstream model/histogram
    reduceResolution): even-user samples build at schema 4, odd-user
    samples at schema 3, and the merge PINS every group to
    target_schema=3 — every schema-4 bucket i re-buckets to ceil(i/2),
    which commutes with the build, so the merged histogram is exactly
    the one a schema-3 build of all samples produces (tested in
    test_native_histogram.py). p90 then evaluates at the pinned
    schema. The oracle replays the fine bucket index, the downscale
    floor arithmetic, and the cumulative walk term for term.

    Scale: the downscale is a map-side expression over bucket rows
    (state ~ occupied buckets, never samples); with a pinned target
    no per-group table or join exists at all — the per-group-min mode
    (and its unhinted group-cardinality join) serves callers that
    evaluate at each group's own resolved schema."""
    from pyspark.sql import functions as F

    from lakerunner_spark.operators.native_histogram import (
        histogram_quantile_native,
        native_histogram_agg,
        native_histogram_merge_mixed,
    )

    e = events_stream(spark, sf_dir).select(
        "event_type", "user_id", (F.col("value") - 50.0).alias("v")
    )
    fine = native_histogram_agg(
        e.filter(F.col("user_id") % 2 == 0), ["event_type"], "v", schema=4
    ).withColumn("schema", F.lit(4))
    coarse = native_histogram_agg(
        e.filter(F.col("user_id") % 2 != 0), ["event_type"], "v", schema=3
    ).withColumn("schema", F.lit(3))
    # target_schema pinned, NOT the per-group min: the quantile below
    # hardcodes gamma(3), and a group that happened to hold only
    # schema-4 rows would otherwise stay at schema 4 and be evaluated
    # with the wrong gamma (silently squaring its value scale)
    merged = native_histogram_merge_mixed(
        fine.unionByName(coarse), ["event_type"], target_schema=3
    )
    out = histogram_quantile_native(
        merged.drop("schema"), ["event_type"], 0.9, schema=3
    )
    return out.withColumn("value", _pr("value", 6))


# ---------------------------------------------------------------------------
# chq_sketch binary interop (the reference's sketches-go wire format)
# ---------------------------------------------------------------------------

# deterministic fixture shared by query and oracle: 8 metric streams,
# 2 sketch blobs each (merge must be exercised), values mixing
# positive / zero / negative samples
_CHQ_STREAMS = 8
_CHQ_N = 200


def _chq_value(s: int, i: int) -> float:
    if i % 50 == 0:
        return 0.0
    v = ((s * 31 + i * 7) % 997) / 10.0 + 0.05
    return -v if i % 37 == 0 else v


_CHQ_VALUES_SQL = f"""
      SELECT s, i,
             CASE WHEN i % 50 = 0 THEN 0.0
                  WHEN i % 37 = 0
                    THEN -(((s*31 + i*7) % 997) / 10.0 + 0.05)
                  ELSE ((s*31 + i*7) % 997) / 10.0 + 0.05 END AS v
      FROM range(0, {_CHQ_STREAMS}) t0(s)
      CROSS JOIN range(0, {_CHQ_N}) t1(i)
"""

_CHQ_BASE = f"SELECT 'm' || CAST(s AS VARCHAR) AS metric, v FROM ({_CHQ_VALUES_SQL})"


@register(
    "chq1_sketch_interop_quantile",
    f"""
    WITH p50 AS (
      {ddsketch_quantile_sql(_CHQ_BASE, ["metric"], "v", 0.5, out_col="p50")}
    ),
    p95 AS (
      {ddsketch_quantile_sql(_CHQ_BASE, ["metric"], "v", 0.95, out_col="p95")}
    ),
    n AS (
      SELECT metric, CAST(count(*) AS BIGINT) AS n_samples
      FROM ({_CHQ_BASE}) GROUP BY metric
    )
    SELECT metric, n_samples, pround(p50.p50, 6) AS p50,
           pround(p95.p95, 6) AS p95
    FROM n JOIN p50 USING (metric) JOIN p95 USING (metric)
    """,
)
def chq1_sketch_interop_quantile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """chq_sketch BINARY interop end-to-end: sketches-go-format blobs
    (the reference's sketch BLOB column — promql/aggregator.go:49-60,
    artifact_parser.go:216) -> pure-Python wire decode
    (sources/chq_sketch.py, format validated bit-for-bit against
    17,450 reference artifact rows) -> engine bucket rows -> per-metric
    MERGE of two blobs per stream (counts sum; the mergeability
    contract) -> the engine's cumulative-walk quantile, as ONE
    registered oracled plan. The oracle regenerates the identical
    bucket table from the same closed-form values, so the hash
    certifies decode + index bridge + merge + quantile together.

    Scale: decode is mapInPandas over the blob scan (payload bytes
    never shuffle; output rows ~ occupied buckets, not samples); merge
    is one (metric, bucket)-keyed HashAggregate pair; the quantile
    walk windows over per-metric bucket rows — O(buckets), regardless
    of how many samples the sketches absorbed."""
    import math

    from pyspark.sql import functions as F

    from lakerunner_spark.operators.ddsketch import gamma_for
    from lakerunner_spark.sources.chq_sketch import (
        chq_sketch_bucket_rows,
        encode_chq_sketch,
    )

    gamma = gamma_for(0.01)
    lg = math.log(gamma)

    def build_blobs() -> DataFrame:
        rows = []
        for s in range(_CHQ_STREAMS):
            for half in range(2):  # two blobs per stream: merge exercised
                pos: dict[int, float] = {}
                neg: dict[int, float] = {}
                zero = 0.0
                lo = half * (_CHQ_N // 2)
                for i in range(lo, lo + _CHQ_N // 2):
                    v = _chq_value(s, i)
                    if v == 0.0:
                        zero += 1.0
                    elif v > 0:
                        idx = math.ceil(math.log(v) / lg) - 1
                        pos[idx] = pos.get(idx, 0.0) + 1.0
                    else:
                        idx = math.ceil(math.log(-v) / lg) - 1
                        neg[idx] = neg.get(idx, 0.0) + 1.0
                rows.append(
                    (f"m{s}",
                     bytearray(encode_chq_sketch(gamma, pos, neg, zero)))
                )
        return spark.createDataFrame(rows, "metric string, sketch binary")

    # deterministic fixture: python-encode + serialize once per session
    # (the r9 driver-latency cluster; see probe_cache.session_memo)
    from lakerunner_spark.plans.probe_cache import session_memo

    blobs = session_memo(spark, "fixture:chq1_blobs", build_blobs)
    decoded = chq_sketch_bucket_rows(blobs, "sketch", keep=["metric"])
    merged = decoded.groupBy("metric", "bucket").agg(
        F.sum("count").alias("count")
    )
    # ONE cumulative walk yields both quantiles AND n (r9: the prior
    # shape paid two single-quantile window passes plus an n aggregate
    # and two joins — pure plan overhead on a tiny bucket table, and
    # the dominant term of this driver-latency-bound query)
    q = ddsketch_quantiles(
        merged, ["metric"], [0.5, 0.95], out_cols=["p50", "p95"],
        n_col="n_samples",
    )
    return q.select(
        "metric",
        "n_samples",
        _pr("p50", 6).alias("p50"),
        _pr("p95", 6).alias("p95"),
    )


_CHQ2_GRAIN = 600_000
_CHQ2_BASE = (
    "SELECT event_type AS metric_name, "
    f"CAST(chq_timestamp - chq_timestamp % {_CHQ2_GRAIN} AS BIGINT) AS bucket_ts, "
    f"value FROM ({EVENTS_MS_SQL})"
)


@register(
    "chq2_cooked_sketch_segments",
    f"""
    WITH p90 AS (
      {ddsketch_quantile_sql(_CHQ2_BASE, ["metric_name", "bucket_ts"], "value", 0.9, out_col="p90")}
    ),
    n AS (
      SELECT metric_name, bucket_ts, CAST(count(*) AS BIGINT) AS n_samples
      FROM ({_CHQ2_BASE}) WHERE value IS NOT NULL GROUP BY 1, 2
    )
    SELECT metric_name, bucket_ts, n_samples, pround(p90.p90, 6) AS p90
    FROM n JOIN p90 USING (metric_name, bucket_ts)
    """,
)
def chq2_cooked_sketch_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chq_sketch WRITE-side interop end-to-end (the reverse of chq1):
    raw samples -> cook_metrics with ``sketch_accuracy`` -> tiered
    segments whose rollup rows carry a ``chq_sketch`` BINARY column in
    the sketches-go wire format (reference writers:
    internal/metricsprocessing/writer_metrics_duckdb.go `chq_sketch`,
    promql/eval_types.go:22-33) -> read the 600s tier back -> the SAME
    decode path that reads the reference's own artifacts
    (sources/chq_sketch.py chq_sketch_bucket_rows) -> engine quantile
    walk. The oracle recomputes the per-(metric, 600s-bucket) DDSketch
    p90 and sample count directly from the raw events, so a hash match
    certifies encode + tier merge + segment write + read + decode +
    quantile together — the interop loop closed in both directions.

    Scale: the sketch travels the cascade as a typed map column
    (pure-JVM exact merge); bytes are produced once per rollup row at
    the write boundary (Arrow codec seam) and decode output is
    proportional to occupied buckets, not samples."""
    import tempfile

    from pyspark.sql import functions as F

    from lakerunner_spark.ingest.cook import cook_metrics
    from lakerunner_spark.operators.ddsketch import ddsketch_quantiles
    from lakerunner_spark.sources.chq_sketch import chq_sketch_bucket_rows
    from lakerunner_spark.testdata import events_stream

    base = tempfile.mkdtemp(prefix="chq2_cook_")
    raw = events_stream(spark, sf_dir).select(
        "chq_timestamp", F.col("event_type").alias("metric_name"), "value"
    )
    cook_metrics(
        raw, base, org_id="chq2", attr_cols=[],
        tiers_ms=[10_000, _CHQ2_GRAIN], sketch_accuracy=0.01,
    )
    seg = spark.read.parquet(f"{base}/metrics").filter(
        F.col("frequency_ms") == _CHQ2_GRAIN
    )
    rows = chq_sketch_bucket_rows(
        seg, "chq_sketch", keep=["metric_name", "chq_timestamp"]
    )
    # ONE cumulative walk yields p90 AND n (the chq1 r9 lesson —
    # separate p90/n branches would re-run the segment read + decode
    # per aliased branch)
    q = ddsketch_quantiles(
        rows, ["metric_name", "chq_timestamp"], [0.9],
        out_cols=["p90"], n_col="n_samples",
    )
    return q.select(
        "metric_name",
        F.col("chq_timestamp").alias("bucket_ts"),
        "n_samples",
        _pr("p90", 6).alias("p90"),
    )


_CHQ3_TIERS = (10_000, 600_000)


def _chq3_oracle() -> str:
    """Per-tier DDSketch p50/p95 + sample count recomputed from the
    raw events with the same bucket algebra the stats seam uses, one
    UNION ALL branch per cooked grain."""
    parts = []
    for grain in _CHQ3_TIERS:
        base = (
            "SELECT event_type AS metric_name, "
            f"CAST(chq_timestamp - chq_timestamp % {grain} AS BIGINT)"
            f" AS bucket_ts, value FROM ({EVENTS_MS_SQL})"
        )
        th = ddsketch_quantiles_sql(
            base,
            ["metric_name", "bucket_ts"],
            "value",
            [0.5, 0.95],
            out_cols=["p50", "p95"],
        )
        parts.append(f"""
    SELECT t.metric_name, t.bucket_ts,
           CAST({grain} AS BIGINT) AS frequency_ms, n.n_samples,
           pround(t.p50, 6) AS p50, pround(t.p95, 6) AS p95
    FROM ({th}) t
    JOIN (SELECT metric_name, bucket_ts,
                 CAST(count(*) AS BIGINT) AS n_samples
          FROM ({base}) WHERE value IS NOT NULL GROUP BY 1, 2) n
    ON t.metric_name = n.metric_name AND t.bucket_ts = n.bucket_ts""")
    return " UNION ALL ".join(parts)


@register("chq3_sketch_stats_segments", _chq3_oracle())
def chq3_sketch_stats_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference-faithful ddsketch_stats_agg surface END TO END:
    cook_metrics with ``sketch_percentiles=True`` derives the
    chq_rollup_p* columns FROM the DDSketch — the reference explodes
    its per-window sketch into p25..p99 next to chq_sketch in the one
    ingest pass (metric_ingest_duckdb.go:351-459) — so EVERY tier
    carries percentiles (exact sketch merge up the cascade), where the
    KLL path only has them at the 10s grain. Reads BOTH cooked tiers
    back and emits the STORED p50/p95; the oracle recomputes the
    DDSketch quantiles from the raw events with the identical bucket
    algebra at both grains. A hash match certifies the fused
    collect -> per-tier list concat -> Arrow stats seam (blob +
    percentiles in one fold) against the pure-SQL bucket math.

    Scale posture: identical to chq2's — the per-sample bucket ids
    ride the ingest aggregation's own shuffles; the only Python is
    the one per-rollup-row codec seam."""
    import tempfile

    from pyspark.sql import functions as F

    from lakerunner_spark.ingest.cook import cook_metrics

    base = tempfile.mkdtemp(prefix="chq3_cook_")
    raw = events_stream(spark, sf_dir).select(
        "chq_timestamp", F.col("event_type").alias("metric_name"), "value"
    )
    cook_metrics(
        raw, base, org_id="chq3", attr_cols=[],
        tiers_ms=list(_CHQ3_TIERS), sketch_accuracy=0.01,
        sketch_percentiles=True,
    )
    seg = spark.read.parquet(f"{base}/metrics")
    return seg.select(
        "metric_name",
        F.col("chq_timestamp").alias("bucket_ts"),
        "frequency_ms",
        F.col("chq_rollup_count").alias("n_samples"),
        _pr("chq_rollup_p50", 6).alias("p50"),
        _pr("chq_rollup_p95", 6).alias("p95"),
    )
