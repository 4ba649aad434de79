"""Query-plane operators (SURVEY §2.3-§2.7)."""

from lakerunner_spark.operators.step_agg import step_agg, count_only_agg  # noqa: F401
from lakerunner_spark.operators.range_agg import (  # noqa: F401
    range_agg,
    RANGE_FUNCS,
)
from lakerunner_spark.operators.vector_agg import (  # noqa: F401
    vector_agg,
    topk,
    bottomk,
)
from lakerunner_spark.operators.binary import (  # noqa: F401
    vector_match,
    vector_or,
    vector_and,
    vector_unless,
)
