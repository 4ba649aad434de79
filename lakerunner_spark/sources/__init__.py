"""Scans / sources / sinks (SURVEY §2.1)."""

from lakerunner_spark.sources.readers import (  # noqa: F401
    read_parquet,
    read_parquet_union,
    read_csv,
    read_jsonlines,
    read_any,
)
from lakerunner_spark.sources.writers import write_segments  # noqa: F401
