"""Micro-batch sinks (SURVEY §2.4 K2/K3/K5, rebuilt).

The reference's sink (weather_processor.py:224-259) collect()s every batch
to the driver and INSERTs row-by-row over one psycopg2 connection, catching
and swallowing all errors while offsets advance. Replacements:

- foreach_batch_jdbc_writer: executor-parallel ``batch_df.write.jdbc`` with
  connector-level batching; per-batch dedup on the grouping key makes the
  append idempotent under update-mode re-emission (Q6). Errors propagate so
  Structured Streaming retries the batch (offsets do NOT advance past a
  failed write).
- foreach_batch_parquet_writer: the analytical-store sink — partitioned
  parquet append, exactly-once per batch via deterministic overwrite of the
  batch's own output path.

Both are plain functions returning a ``foreachBatch`` callable; the runner
must always pass ``checkpointLocation`` (Q5).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame


def foreach_batch_jdbc_writer(
    url: str,
    table: str,
    properties: dict[str, str],
    dedup_keys: list[str] | None = None,
    batchsize: int = 10_000,
) -> Callable[[DataFrame, int], None]:
    """JDBC batch writer: executors write partitions in parallel with
    statement batching — no driver collect, no per-row round-trips.

    For true upsert targets, write to a staging table here and MERGE in the
    same transaction (connector-specific); append+dedup suffices for the
    reference's accumulate-snapshots semantics.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_df.dropDuplicates(dedup_keys) if dedup_keys else batch_df
        props = {**properties, "batchsize": str(batchsize)}
        out.write.jdbc(url=url, table=table, mode="append", properties=props)

    return write


def foreach_batch_parquet_writer(
    base_path: str, partition_cols: list[str] | None = None
) -> Callable[[DataFrame, int], None]:
    """Parquet sink with per-batch-id output paths: re-running a batch
    overwrites its own directory (idempotent replay after failure), never
    another batch's."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        writer = batch_df.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(os.path.join(base_path, f"batch_id={batch_id}"))

    return write


def kafka_value_sink(
    stream_df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    output_mode: str = "append",
):
    """Kafka producer sink (SURVEY §2.4 K4, rebuilt): the input must carry a
    binary/string ``value`` column (use to_json(struct(...)) upstream, the
    declarative twin of the reference's json.dumps serializer,
    weather_stream.py:72-74). Delivery is the connector's at-least-once
    with checkpointed offsets — no per-message blocking ack (the
    reference's .get(timeout=30) capped throughput at one message per
    round-trip, weather_stream.py:142).

    Requires the spark-sql-kafka package on the classpath; not bundled in
    this test environment (the parquet/JDBC sinks are the test twins).
    """
    return (
        stream_df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .start()
    )


def run_foreach_batch(
    stream_df: DataFrame,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    output_mode: str = "update",
    timeout_s: int = 300,
):
    """Start a checkpointed foreachBatch query with availableNow and block
    until the replay drains. checkpointLocation is mandatory (fixes Q5)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    ex = q.exception()
    if ex is not None:
        raise ex
    return q
