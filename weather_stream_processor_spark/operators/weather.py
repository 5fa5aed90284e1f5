"""Reference pipeline surface, recast as batch queries over `events`.

The reference consumer (``/root/reference/weather_processor.py:127-141``)
does: CAST value to string -> from_json with explicit schema -> flatten the
nested struct -> groupBy(timestamp, lat, lon).sum(total_precipitation); the
producer (``/root/reference/weather_stream.py:124-138``) reduces a per-minute
forecast array to one scalar with a missing-key default and 5-decimal
rounding. `events` is the structural analog (ts ↔ timestamp, value ↔
total_precipitation, user_id ↔ location, props JSON ↔ wire format), so each
query here is one reference operator made explicit and scale-safe:

- the implicit 1-hour bucketing (SURVEY §2.5 St5) becomes an explicit
  tumbling ``window(ts, "1 hour")`` — at 100 TB this is a single hash
  aggregation keyed on (window, key), map-side partial agg included, no
  unbounded state;
- rounding at 5 decimals (T9) is applied on BOTH the Spark and oracle side
  so float summation order can never flip the driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_stream_processor_spark.registry import register
from weather_stream_processor_spark.sources import load_table


@register(
    "hourly_value_by_type",
    oracle="""
        SELECT date_trunc('hour', ts) AS hour,
               event_type,
               ROUND(SUM(value), 5) AS total_value,
               COUNT(*) AS n_events
        FROM events
        GROUP BY 1, 2
    """,
    doc=(
        "FLAGSHIP. The reference's streaming grouped SUM "
        "(weather_processor.py:139-141) with the implicit hourly bucketing "
        "(weather_stream.py:129) made an explicit tumbling window."
    ),
    tags=("reference", "aggregation", "flagship"),
)
def hourly_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.round(F.sum("value"), 5).alias("total_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "total_value", "n_events")
    )


@register(
    "weather_pipeline_batch",
    oracle="""
        SELECT date_trunc('hour', ts) AS hour,
               user_id,
               ROUND(SUM(value), 5) AS hourly_value
        FROM events
        WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL
        GROUP BY 1, 2
    """,
    doc=(
        "The complete consumer path in one plan: not-null quarantine filter "
        "(weather_processor.py:230-235, T4) -> per-hour per-key SUM "
        "(weather_processor.py:139-141, A2) with T9 rounding. Keyed by "
        "user_id (the location analog)."
    ),
    tags=("reference", "aggregation"),
)
def weather_pipeline_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clean = ev.filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    return (
        clean.groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.round(F.sum("value"), 5).alias("hourly_value"))
        .select(F.col("w.start").alias("hour"), "user_id", "hourly_value")
    )


@register(
    "json_parse_props",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) IS NOT NULL
    """,
    doc=(
        "T1+T2: CAST wire value AS STRING then from_json with an explicit "
        "StructType (weather_processor.py:127-129). Permissive parse: "
        "malformed JSON -> null -> quarantined by filter (the reference drops "
        "silently; we filter declaratively). Catalyst's OptimizeJsonExprs "
        "prunes the parse to the single accessed field."
    ),
    tags=("reference", "json", "projection"),
)
def json_parse_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id",
        F.from_json(F.col("props").cast("string"), "k INT").getField("k").alias("k"),
    )
    return parsed.filter(F.col("k").isNotNull())


@register(
    "array_reduce_hof",
    oracle="""
        SELECT user_id,
               MIN(ts) AS first_ts,
               ROUND(SUM(COALESCE(value, 0)), 5) AS total_value
        FROM events
        GROUP BY user_id
    """,
    doc=(
        "A1+T7+T8+T9: the producer's minutely-array reduction "
        "(weather_stream.py:124-129) as Spark higher-order functions — "
        "collect the per-key series, take element 1's timestamp "
        "(element_at, T7), fold the values with a missing-key default "
        "(aggregate + coalesce, T8), round to 5 (T9). sort_array makes the "
        "first element deterministic. At scale the collect_list per key is "
        "bounded by key cardinality (one forecast hour per poll in the "
        "reference); unbounded series should use the windowed agg instead."
    ),
    tags=("reference", "array", "hof"),
)
def array_reduce_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    series = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "value"))).alias("series")
    )
    return series.select(
        "user_id",
        F.element_at("series", 1).getField("ts").alias("first_ts"),
        F.round(
            F.aggregate(
                "series",
                F.lit(0.0),
                lambda acc, x: acc + F.coalesce(x.getField("value"), F.lit(0.0)),
            ),
            5,
        ).alias("total_value"),
    )


@register(
    "epoch_roundtrip",
    oracle="""
        SELECT event_id,
               CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s,
               date_trunc('second', ts) AS ts_s
        FROM events
    """,
    doc=(
        "T5: the reference converts epoch-string -> timestamp per row in "
        "driver-side Python (weather_processor.py:245); here it is "
        "unix_timestamp/timestamp_seconds inside the plan — JVM codegen, "
        "zero Python boundary."
    ),
    tags=("reference", "datetime"),
)
def epoch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.unix_timestamp("ts").alias("epoch_s"),
        F.timestamp_seconds(F.unix_timestamp("ts")).alias("ts_s"),
    )


@register(
    "notnull_projection",
    oracle="""
        SELECT event_id, ts, user_id, event_type, value
        FROM events
        WHERE ts IS NOT NULL
          AND user_id IS NOT NULL
          AND event_type IS NOT NULL
          AND value IS NOT NULL
    """,
    doc=(
        "T3+T4: flattening projection + conjunctive not-null filter "
        "(weather_processor.py:130-135, :230-235). Both push into the "
        "parquet scan (PushedFilters: IsNotNull) — verified in tests."
    ),
    tags=("reference", "filter", "projection"),
)
def notnull_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "ts", "user_id", "event_type", "value").filter(
        F.col("ts").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("value").isNotNull()
    )
