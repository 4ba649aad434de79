"""Structured Streaming ingest plane (SURVEY §2.9, §3.3)."""

from lakerunner_spark.streaming.pipeline import (
    preagg_stream,
    run_file_ingest_stream,
)

__all__ = ["preagg_stream", "run_file_ingest_stream"]
