from weather_stream_processor_spark.streaming.pipeline import (
    dedup_within_watermark,
    hourly_precipitation_aggregate,
    kafka_weather_source,
    parse_weather_wire,
    session_aggregate,
    sliding_aggregate,
    weather_wire_schema,
)
from weather_stream_processor_spark.streaming.replay import (
    events_as_weather_wire,
    events_replay_source,
    run_to_memory,
)
from weather_stream_processor_spark.streaming.sinks import (
    foreach_batch_jdbc_writer,
    foreach_batch_parquet_writer,
    run_foreach_batch,
)

__all__ = [
    "dedup_within_watermark",
    "events_as_weather_wire",
    "events_replay_source",
    "foreach_batch_jdbc_writer",
    "foreach_batch_parquet_writer",
    "hourly_precipitation_aggregate",
    "kafka_weather_source",
    "parse_weather_wire",
    "run_foreach_batch",
    "run_to_memory",
    "session_aggregate",
    "sliding_aggregate",
    "weather_wire_schema",
]
