"""Maintenance plane: compaction, rollup cascade scheduling, retention."""

from lakerunner_spark.maintenance.compaction import compact_segments, plan_compaction
from lakerunner_spark.maintenance.retention import expired_partitions, sweep_retention

__all__ = [
    "compact_segments",
    "plan_compaction",
    "expired_partitions",
    "sweep_retention",
]
