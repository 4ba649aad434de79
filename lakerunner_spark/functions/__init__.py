"""Scalar function library (SURVEY §2.8)."""

from lakerunner_spark.functions.timeops import (  # noqa: F401
    bucket_ts,
    step_for_duration,
    ROLLUP_CHAIN_MS,
)
from lakerunner_spark.functions.unwrap import (  # noqa: F401
    duration_to_seconds,
    bytes_to_bytes,
    duration_to_seconds_sql,
    bytes_to_bytes_sql,
)
from lakerunner_spark.functions.hashing import (  # noqa: F401
    fnv64a,
    java_string_hash,
    compute_tid,
    portable_hash64,
)
