"""Ingest + maintenance plane: pre-aggregation, rollup chain, compaction."""

from lakerunner_spark.ingest.preagg import preaggregate_metrics  # noqa: F401
from lakerunner_spark.ingest.rollup import rollup_tier, rollup_chain  # noqa: F401
