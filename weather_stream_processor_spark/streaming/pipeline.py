"""The reference pipeline (Kafka -> parse -> aggregate -> sink), rebuilt
idiomatically on Structured Streaming.

Reference path (consumer, ``/root/reference/weather_processor.py``):
  readStream kafka (:59-65) -> CAST value AS STRING (:128) -> from_json with
  declared schema (:108-129) -> flatten (:130-135) -> groupBy(timestamp,
  lat, lon).sum (:139-141) -> foreachBatch collect()+per-row INSERT
  (:224-259), outputMode update, no watermark, no checkpoint.

What we fix by design (SURVEY §3.3/§4.2):
  Q1  the fake connection-probe retry around a lazy ``load()``  -> gone;
      errors surface at ``start()`` where Structured Streaming retries.
  Q4  dead console sink config                                  -> one sink.
  Q5  no checkpointLocation                                     -> required
      argument on every runner.
  Q6  unbounded state + duplicate-accumulating append sink      -> watermark
      + explicit event-time window + deduped idempotent batch writes.

At 100 TB/day the only stateful operator is the windowed aggregation; with
a watermark its state is bounded by (#keys x watermark/window) regardless
of retention, and state lives in the per-executor state store keyed by the
shuffle partitioning of (window, keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def weather_wire_schema() -> T.StructType:
    """The reference's declared message schema (weather_processor.py:108-124).

    `timestamp` is kept as the wire's epoch-seconds *string* exactly as the
    reference declares it; parse_weather_wire converts it in-plan (the
    reference deferred conversion to driver-side Python at the sink, :245).
    """
    return T.StructType(
        [
            T.StructField("timestamp", T.StringType(), True),
            T.StructField("total_precipitation", T.DoubleType(), True),
            T.StructField(
                "location",
                T.StructType(
                    [
                        T.StructField("lat", T.DoubleType(), True),
                        T.StructField("lon", T.DoubleType(), True),
                    ]
                ),
                True,
            ),
        ]
    )


KAFKA_SOURCE_FORMAT = "kafka"


def kafka_source_options(
    bootstrap_servers: str,
    topic: str = "weather",
    starting_offsets: str = "earliest",
) -> dict[str, str]:
    """The exact connector options of the reference's consumer
    (weather_processor.py:59-65) — kept as a pure dict so tests can pin
    the contract without a broker or the kafka jar on the classpath."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def kafka_weather_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "weather",
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka streaming source (weather_processor.py:59-65, identical options).

    Requires the spark-sql-kafka package on the classpath (not bundled in
    this test environment — the replay source is the test twin). ``load()``
    is lazy: nothing validates connectivity here, by design.
    """
    return (
        spark.readStream.format(KAFKA_SOURCE_FORMAT)
        .options(**kafka_source_options(bootstrap_servers, topic, starting_offsets))
        .load()
    )


def parse_weather_wire(
    raw: DataFrame, dead_letter: bool = False, observe: bool = False
) -> DataFrame:
    """T1+T2+T3+T5 as one declarative stage over a Kafka-shaped frame
    (``value: binary``):

    CAST value AS STRING -> from_json(declared schema) -> flatten nested
    location -> epoch-string to TimestampType in-plan. With
    ``dead_letter=True`` returns the *rejected* rows (malformed JSON or
    nulls) instead of silently dropping them like the reference (:230-235).

    ``observe=True`` attaches accumulator-backed pipeline metrics
    (rows_in / rows_rejected per micro-batch) via ``Dataset.observe`` —
    surfaced in ``StreamingQueryProgress.observedMetrics["parse_metrics"]``
    with ZERO extra passes or shuffles over the data (the reference's only
    observability was per-row INSERT logging on the driver,
    weather_processor.py:251-254). At 100 TB the quarantine RATE, not the
    quarantined rows, is what an operator monitors."""
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), weather_wire_schema()).alias("m")
    ).select(
        F.timestamp_seconds(F.col("m.timestamp").cast("long")).alias("event_ts"),
        F.col("m.total_precipitation").alias("total_precipitation"),
        F.col("m.location.lat").alias("lat"),
        F.col("m.location.lon").alias("lon"),
    )
    ok = (
        F.col("event_ts").isNotNull()
        & F.col("total_precipitation").isNotNull()
        & F.col("lat").isNotNull()
        & F.col("lon").isNotNull()
    )
    if observe:
        parsed = parsed.observe(
            "parse_metrics",
            F.count(F.lit(1)).alias("rows_in"),
            F.sum(F.when(~ok, 1).otherwise(0)).alias("rows_rejected"),
        )
    return parsed.filter(~ok) if dead_letter else parsed.filter(ok)


def hourly_precipitation_aggregate(
    parsed: DataFrame,
    watermark: str = "2 hours",
    window_duration: str = "1 hour",
    ts_col: str = "event_ts",
    keys: tuple[str, ...] = ("lat", "lon"),
    value_col: str = "total_precipitation",
) -> DataFrame:
    """The reference's grouped SUM (weather_processor.py:139-141) with the
    implicit hourly bucketing (weather_stream.py:129) made an explicit
    tumbling window + watermark (fixes St3/St5).
    """
    return (
        parsed.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("w"), *keys)
        .agg(F.round(F.sum(value_col), 5).alias("hourly_precipitation"))
        .select(F.col("w.start").alias("hour"), *keys, "hourly_precipitation")
    )


def sliding_aggregate(
    parsed: DataFrame,
    ts_col: str,
    keys: tuple[str, ...],
    value_col: str,
    window_duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window extension (St5): each event lands in
    window/slide overlapping windows."""
    return (
        parsed.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration, slide).alias("w"), *keys)
        .agg(F.round(F.sum(value_col), 5).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), *keys, "total_value")
    )


def session_aggregate(
    parsed: DataFrame,
    ts_col: str,
    keys: tuple[str, ...],
    value_col: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session-window extension (St5): gap-based sessions per key.

    Session semantics: a new session starts when the next event is >= gap
    after the previous one; merged sessions span [min(ts), max(ts)+gap).
    """
    return (
        parsed.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 5).alias("total_value"),
        )
        .select(F.col("w.start").alias("session_start"), *keys, "n_events", "total_value")
    )


def dedup_within_watermark(
    stream: DataFrame, ts_col: str, id_cols: list[str], watermark: str = "2 hours"
) -> DataFrame:
    """St6 fix: at-least-once delivery -> effectively-once via
    dropDuplicatesWithinWatermark — state holds ids only within the
    watermark horizon, so it is bounded (the reference kept no dedup state
    and wrote duplicates, SURVEY Q6)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        id_cols
    )
