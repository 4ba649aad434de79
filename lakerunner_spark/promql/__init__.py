"""PromQL front-end: query string -> AST -> DataFrame plan.

Mirrors the reference's pipeline (promql/parser.go:180-479 wraps the
upstream Prometheus parser into an Expr IR; promql/exec_planner.go
compiles it to eval nodes). Here the "eval nodes" are the engine's
DataFrame operators, so Catalyst plans the distribution.
"""

from lakerunner_spark.promql.parser import parse_promql
from lakerunner_spark.promql.compiler import (
    LeafSource,
    MetricCatalog,
    compile_promql,
    step_for_duration,
)

__all__ = [
    "parse_promql",
    "compile_promql",
    "LeafSource",
    "MetricCatalog",
    "step_for_duration",
]
