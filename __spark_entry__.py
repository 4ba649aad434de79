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
    """Flagship: sum by (event_type) (rate(events[5m])) on sf0.001,
    through the FULL lifecycle — PromQL string -> parser -> AST ->
    DataFrame compiler (SURVEY §3.1/§7.2): leaf step aggregation (A3)
    -> sliding range window rate (A9) -> vector aggregation (A7).
    """
    from pyspark.sql import functions as F

    from lakerunner_spark.catalog import default_metric_catalog
    from lakerunner_spark.promql.compiler import compile_promql

    df = compile_promql(
        "sum by (event_type) (rate(events[5m]))",
        default_metric_catalog(spark, "/root/testdata/sf0.001"),
        60_000,
    )
    return df.filter(F.col("value").isNotNull()).withColumn(
        "value", F.round("value", 6)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY §2 (+ dataops)."""
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return dict(_q.ORACLE)
