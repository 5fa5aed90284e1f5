"""Runnable pipeline application — the reference's consumer main
(`/root/reference/weather_processor.py:262-268`), rebuilt.

The reference wires Kafka -> parse -> hourly aggregate -> Postgres with
hardcoded hosts and no recovery. This CLI wires the same pipeline from
composable parts with every quirk fixed: explicit source/sink selection,
mandatory checkpoint for unbounded runs, watermarked windows, and an
executor-parallel idempotent sink.

    python -m weather_stream_processor_spark \
        --source spool --spool-dir /tmp/weather_spool \
        --sink parquet --out /tmp/weather_out \
        --checkpoint /tmp/weather_ckpt --bounded

    python -m weather_stream_processor_spark \
        --source kafka --brokers kafka:9092 --topic weather \
        --sink jdbc --jdbc-url jdbc:postgresql://db/weather \
        --jdbc-table weather_data --checkpoint /ckpt/weather

``--bounded`` replays what is currently available (availableNow) and
exits — the test/backfill mode; without it the query runs until signalled
like the reference's awaitTermination.
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession


def build_source(spark: SparkSession, args: argparse.Namespace) -> DataFrame:
    from weather_stream_processor_spark.streaming.pipeline import (
        kafka_weather_source,
        parse_weather_wire,
    )

    if args.source == "kafka":
        raw = kafka_weather_source(spark, args.brokers, args.topic)
        return parse_weather_wire(raw)
    # spool: JSON files written by sources.http_poll (S1's file twin)
    stream = spark.readStream.schema(
        "timestamp long, total_precipitation double, "
        "location struct<lat:double, lon:double>"
    ).json(args.spool_dir)
    from pyspark.sql import functions as F

    return stream.select(
        F.timestamp_seconds("timestamp").alias("event_ts"),
        "total_precipitation",
        F.col("location.lat").alias("lat"),
        F.col("location.lon").alias("lon"),
    ).filter(
        F.col("event_ts").isNotNull()
        & F.col("total_precipitation").isNotNull()
        & F.col("lat").isNotNull()
        & F.col("lon").isNotNull()
    )


def build_sink(args: argparse.Namespace):
    from weather_stream_processor_spark.streaming.sinks import (
        foreach_batch_jdbc_upsert_writer,
        foreach_batch_jdbc_writer,
        foreach_batch_parquet_writer,
    )

    if args.sink == "jdbc-upsert":
        return foreach_batch_jdbc_upsert_writer(
            args.jdbc_url,
            args.jdbc_table,
            key_cols=["hour", "lat", "lon"],
            properties={"driver": args.jdbc_driver} if args.jdbc_driver else {},
            dialect=args.upsert_dialect,
        )
    if args.sink == "jdbc":
        return foreach_batch_jdbc_writer(
            args.jdbc_url,
            args.jdbc_table,
            {"driver": args.jdbc_driver} if args.jdbc_driver else {},
            dedup_keys=["hour", "lat", "lon"],
        )
    if args.sink == "console":
        return lambda batch_df, batch_id: batch_df.show(20, truncate=False)
    return foreach_batch_parquet_writer(args.out, partition_cols=None)


def apply_trigger(writer, bounded: bool, trigger_interval: str | None):
    """St1 trigger selection: ``--bounded`` replays what's available and
    stops (availableNow); otherwise an optional ``processingTime`` cadence
    — the reference's 60 s poll loop (weather_stream.py:26,159) expressed
    as a trigger instead of a sleep(). No interval = micro-batches as fast
    as data arrives."""
    if bounded:
        return writer.trigger(availableNow=True)
    if trigger_interval:
        return writer.trigger(processingTime=trigger_interval)
    return writer


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="weather_stream_processor_spark")
    p.add_argument("--source", choices=("kafka", "spool"), required=True)
    p.add_argument("--brokers", default="localhost:9092")
    p.add_argument("--topic", default="weather")
    p.add_argument("--spool-dir")
    p.add_argument(
        "--sink",
        choices=("parquet", "jdbc", "jdbc-upsert", "console"),
        default="parquet",
    )
    p.add_argument(
        "--upsert-dialect",
        choices=("merge", "on_conflict"),
        default="merge",
        help="upsert SQL dialect for --sink jdbc-upsert",
    )
    p.add_argument(
        "--trigger-interval",
        default=None,
        help="processingTime trigger cadence for unbounded runs, e.g. "
        "'60 seconds' (the reference's poll period, weather_stream.py:26); "
        "omit for as-fast-as-possible micro-batches",
    )
    p.add_argument("--out", help="parquet sink base path")
    p.add_argument("--jdbc-url")
    p.add_argument("--jdbc-table", default="weather_data")
    p.add_argument("--jdbc-driver", default="org.postgresql.Driver")
    p.add_argument("--checkpoint", required=True, help="checkpoint dir (fixes Q5)")
    p.add_argument("--watermark", default="2 hours")
    p.add_argument("--window", default="1 hour")
    p.add_argument("--bounded", action="store_true", help="availableNow replay, then exit")
    args = p.parse_args(argv)
    if args.source == "spool" and not args.spool_dir:
        p.error("--spool-dir is required with --source spool")
    if args.sink == "parquet" and not args.out:
        p.error("--out is required with --sink parquet")
    if args.sink in ("jdbc", "jdbc-upsert") and not args.jdbc_url:
        p.error(f"--jdbc-url is required with --sink {args.sink}")
    if args.bounded and args.trigger_interval:
        p.error("--trigger-interval only applies to unbounded runs "
                "(--bounded uses availableNow)")

    from weather_stream_processor_spark.session import get_spark
    from weather_stream_processor_spark.streaming.pipeline import (
        hourly_precipitation_aggregate,
    )

    spark = get_spark("weather-pipeline")
    parsed = build_source(spark, args)
    agg = hourly_precipitation_aggregate(
        parsed, watermark=args.watermark, window_duration=args.window
    )
    writer = (
        agg.writeStream.outputMode("update")
        .foreachBatch(build_sink(args))
        .option("checkpointLocation", args.checkpoint)
    )
    writer = apply_trigger(writer, args.bounded, args.trigger_interval)
    if args.bounded:
        q = writer.start()
        q.awaitTermination()
        ex = q.exception()
        if ex is not None:
            raise ex
    else:  # run until signalled, like the reference's awaitTermination (:151)
        writer.start().awaitTermination()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
