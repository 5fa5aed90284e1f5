from weather_stream_processor_spark.sources.tables import (
    TABLES,
    load_table,
    load_tables,
    spread,
)

__all__ = ["TABLES", "load_table", "load_tables", "spread"]
