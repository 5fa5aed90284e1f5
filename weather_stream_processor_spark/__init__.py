"""PySpark-native analytics engine with the capabilities of
DanMartyns/weather-stream-processor, re-expressed Spark-first.

The reference (/root/reference) is a Kafka -> Spark Structured Streaming ->
PostgreSQL weather pipeline (weather_stream.py, weather_processor.py). This
package re-expresses its query semantics as a library of composable
DataFrame/SQL query builders (batch, over parquet fixtures) plus a
checkpointed, watermarked Structured Streaming runner, and extends the
surface with relational completion + LLM-data-pipeline operators (dedup,
similarity search, multimodal columns, text analysis), each designed for
100 TB scale on Catalyst built-ins.

Layout:
  session.py    SparkSession factory tuned for local[N] testing / cluster use
  registry.py   query registry: (name, spark builder, DuckDB oracle SQL)
  sources/      batch parquet loaders + streaming source builders
  operators/    query builders, grouped by domain (importing registers them)
  functions/    reusable Column-expression helpers (pure, JVM-side)
  streaming/    the streaming pipeline (parse -> watermark -> window -> sink)
  plans/        plan-inspection helpers (broadcast/pushdown assertions)
"""

from weather_stream_processor_spark.registry import all_queries, get_query

__all__ = ["all_queries", "get_query"]
