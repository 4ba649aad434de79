"""LogQL pipeline plane: stage builders over log DataFrames (SURVEY §2.2)."""

from lakerunner_spark.logql.stages import (  # noqa: F401
    line_filter,
    label_matcher,
    numeric_label_filter,
    json_parser,
    logfmt_parser,
    regexp_parser,
    label_format,
    line_format,
    unwrap,
    keep_fields,
    time_range,
)
