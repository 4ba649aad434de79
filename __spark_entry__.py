"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the operator catalog (lakerunner_spark.queries
and its registrations) for the DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import lakerunner_spark.queries as _q  # noqa: E402
import lakerunner_spark.queries_relational  # noqa: E402,F401 (registers)
import lakerunner_spark.queries_dataops  # noqa: E402,F401 (registers)
import lakerunner_spark.queries_frontends  # noqa: E402,F401 (registers)
import lakerunner_spark.queries_plans  # noqa: E402,F401 (registers)
import lakerunner_spark.queries_rangefns  # noqa: E402,F401 (registers)
import lakerunner_spark.queries_sketch  # noqa: E402,F401 (registers)
import lakerunner_spark.queries_multimodal  # noqa: E402,F401 (registers)
import lakerunner_spark.queries_spans  # noqa: E402,F401 (registers)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sum by (event_type) (rate(events[5m])) on sf0.001.

    The reference's bread-and-butter PromQL shape (SURVEY §7.2): leaf
    step aggregation (A3) -> sliding range window rate (A9) -> vector
    aggregation (A7).
    """
    from pyspark.sql import functions as F

    from lakerunner_spark.operators.range_agg import range_agg
    from lakerunner_spark.operators.step_agg import step_agg_raw
    from lakerunner_spark.operators.vector_agg import vector_agg
    from lakerunner_spark.testdata import events_stream

    e = events_stream(spark, "/root/testdata/sf0.001")
    s = step_agg_raw(e, 60_000, ["event_type", "user_id"])
    r = range_agg(s, "rate", 300_000, 60_000, ["event_type", "user_id"])
    v = vector_agg(r.filter(F.col("value").isNotNull()), "sum", by=["event_type"])
    return v.withColumn("value", F.round("value", 6))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY §2 (+ dataops)."""
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return dict(_q.ORACLE)
