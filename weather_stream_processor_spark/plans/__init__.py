from weather_stream_processor_spark.plans.inspect import (
    explain_string,
    operator_names,
    pushed_filters,
    read_schema_columns,
    require_plan,
)

__all__ = [
    "explain_string",
    "operator_names",
    "pushed_filters",
    "read_schema_columns",
    "require_plan",
]
