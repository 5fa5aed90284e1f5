from weather_stream_processor_spark.sources.tables import (
    TABLES,
    ensure_session_defaults,
    load_table,
    load_tables,
    spread,
)

__all__ = [
    "TABLES",
    "ensure_session_defaults",
    "load_table",
    "load_tables",
    "spread",
]
