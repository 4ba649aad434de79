"""Object-store (S8) configuration: s3a:// paths through Hadoop-S3A.

The reference talks to S3/GCS/Azure through its cloudstorage layer
(internal/cloudstorage) with per-profile credentials; in Spark the
entire surface collapses to configuration — every reader/writer in
this package is path-based, so ``read_parquet(spark,
"s3a://bucket/db/table")`` works unchanged once the Hadoop-S3A
connector is configured. No engine code changes: this module is that
configuration, centralized.

Only public Hadoop/Spark settings are used (hadoop-aws docs). The
sandbox has no object store, so the proof here is configuration-shape
only (test_sources asserts the keys land in the session conf); the
read/write path itself is identical to the local-path tests.

Scale notes (100 TB): the two settings that matter at fleet scale are
the **magic committer** (S3 has no atomic rename — the default
FileOutputCommitter's rename-based commit is both slow and unsafe on
S3; the magic committer commits via multipart-upload completion) and
**maxPartitionBytes/openCostInBytes** tuning so a 1000-executor scan
of many ~512MB-1GB segments (the reference's compaction target,
OVERVIEW.md:82,299) packs into right-sized input splits.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

S3A_DEFAULTS: dict[str, str] = {
    # credential resolution, tried in list order (most-explicit first so
    # operator-supplied credentials can override an ambient instance
    # role): fs.s3a.access.key conf (+session token) -> env vars ->
    # instance/pod role. Matches S3A's own documented default chain.
    "spark.hadoop.fs.s3a.aws.credentials.provider": (
        "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider,"
        "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider,"
        "com.amazonaws.auth.EnvironmentVariableCredentialsProvider,"
        "org.apache.hadoop.fs.s3a.auth.IAMInstanceCredentialsProvider"
    ),
    # S3 has no atomic rename: commit output via multipart completion
    "spark.hadoop.fs.s3a.committer.name": "magic",
    "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
    "spark.sql.sources.commitProtocolClass": (
        "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
    ),
    "spark.sql.parquet.output.committer.class": (
        "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
    ),
    # connection pool sized for wide scans
    "spark.hadoop.fs.s3a.connection.maximum": "96",
    "spark.hadoop.fs.s3a.threads.max": "64",
    # random-access reads for parquet footers + column chunks
    "spark.hadoop.fs.s3a.experimental.input.fadvise": "random",
}


def configure_s3a(
    spark: SparkSession,
    endpoint: str | None = None,
    path_style_access: bool = False,
    extra: dict[str, str] | None = None,
    skipped_out: list[str] | None = None,
) -> SparkSession:
    """Apply s3a settings to a live session (hadoopConfiguration is
    mutable at runtime; the spark.sql.* committer settings must be set
    before first write — pass them at session build time on a real
    cluster).

    ``endpoint``/``path_style_access`` cover S3-compatible stores
    (MinIO, GCS interop, Ceph). Returns the session for chaining.

    The committer spark.sql.* settings validate their class at set time,
    so they only take effect where the ``spark-hadoop-cloud`` jar is on
    the classpath (any real S3-capable cluster); elsewhere — like this
    sandbox — they are skipped, appended to the caller-owned
    ``skipped_out`` list for callers that want to assert (a caller-owned
    list, not a function attribute, so concurrent configurations can't
    clobber each other's reports).
    """
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    skipped: list[str] = skipped_out if skipped_out is not None else []
    for k, v in {**S3A_DEFAULTS, **(extra or {})}.items():
        if k.startswith("spark.hadoop."):
            hconf.set(k[len("spark.hadoop."):], v)
        else:
            try:
                spark.conf.set(k, v)
            except Exception:  # class not loadable: no cloud jar here
                skipped.append(k)
    if endpoint:
        hconf.set("fs.s3a.endpoint", endpoint)
    if path_style_access:
        hconf.set("fs.s3a.path.style.access", "true")
    return spark
