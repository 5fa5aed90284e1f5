"""Ingestion adapter (S1) tests: the producer transform is pure and the
spool is a real FileStreamSource the engine can stream — end to end with a
fake HTTP fetch, no network."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from weather_stream_processor_spark.sources.http_poll import (
    build_url,
    poll_forever,
    reduce_minutely,
    spool_writer,
)


def test_reduce_minutely_sums_and_stamps():
    payload = {
        "minutely": [
            {"dt": 1700000000, "precipitation": 0.1},
            {"dt": 1700000060, "precipitation": 0.25},
            {"dt": 1700000120},  # missing key counts as 0 (T8)
        ]
    }
    msg = reduce_minutely(payload, 40.0, -8.0)
    assert msg == {
        "timestamp": 1700000000,  # first entry's dt (St2)
        "total_precipitation": 0.35,  # rounded to 5dp (T9)
        "location": {"lat": 40.0, "lon": -8.0},
    }


def test_reduce_minutely_skips_when_absent():
    assert reduce_minutely({}, 0.0, 0.0) is None
    assert reduce_minutely({"minutely": []}, 0.0, 0.0) is None


def test_build_url_shape():
    url = build_url(41.15, -8.61, "KEY")
    assert url.startswith("https://api.openweathermap.org/data/3.0/onecall?")
    assert "exclude=hourly,daily,current" in url and "units=metric" in url


def test_poll_to_spool_to_streaming_agg(spark):
    # two locations x three cycles through the FULL path: poll loop (fake
    # fetch) -> spool files -> FileStreamSource -> windowed agg -> memory
    def fake_fetch(url: str) -> dict:
        return {
            "minutely": [
                {"dt": 1700000000 + i * 60, "precipitation": 0.01} for i in range(60)
            ]
        }

    spool = tempfile.mkdtemp(prefix="ingest_spool_")
    n = poll_forever(
        [(40.0, -8.0), (41.15, -8.61)],
        api_key="KEY",
        emit=spool_writer(spool),
        fetch=fake_fetch,
        interval_s=0,
        max_cycles=3,
    )
    assert n == 6

    stream = (
        spark.readStream.schema(
            "timestamp long, total_precipitation double, "
            "location struct<lat:double, lon:double>"
        )
        .json(spool)
        .select(
            F.timestamp_seconds("timestamp").alias("event_ts"),
            "total_precipitation",
            F.col("location.lat").alias("lat"),
            F.col("location.lon").alias("lon"),
        )
    )
    from weather_stream_processor_spark.streaming.pipeline import (
        hourly_precipitation_aggregate,
    )
    from weather_stream_processor_spark.streaming.replay import run_to_memory

    out = run_to_memory(
        hourly_precipitation_aggregate(stream), "ingest_spool_agg"
    ).collect()
    # one hour bucket per location; 3 polls x 0.6 accumulate (Q6 semantics
    # preserved deliberately: repeated forecast snapshots sum)
    assert {(r.lat, r.lon, r.hourly_precipitation) for r in out} == {
        (40.0, -8.0, 1.8),
        (41.15, -8.61, 1.8),
    }


def test_cli_spool_to_parquet_end_to_end(spark, tmp_path):
    """The full application: poll (fake fetch) -> spool -> CLI pipeline
    (spool source, hourly agg, parquet sink, bounded) -> verify output."""
    from weather_stream_processor_spark.cli import main

    def fake_fetch(url: str) -> dict:
        return {
            "minutely": [
                {"dt": 1700003600 + i * 60, "precipitation": 0.02} for i in range(60)
            ]
        }

    spool = str(tmp_path / "spool")
    poll_forever(
        [(40.0, -8.0)], "KEY", spool_writer(spool), fake_fetch, interval_s=0, max_cycles=2
    )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rc = main(
        [
            "--source", "spool", "--spool-dir", spool,
            "--sink", "parquet", "--out", out,
            "--checkpoint", ckpt, "--bounded",
        ]
    )
    assert rc == 0
    result = spark.read.parquet(f"{out}/batch_id=*").collect()
    assert len(result) == 1  # one location, one hour bucket
    assert result[0].lat == 40.0 and abs(result[0].hourly_precipitation - 2.4) < 1e-9

    # re-run with the same checkpoint: committed offsets -> no new data,
    # output unchanged (Q5 fixed by construction)
    rc = main(
        [
            "--source", "spool", "--spool-dir", spool,
            "--sink", "parquet", "--out", out,
            "--checkpoint", ckpt, "--bounded",
        ]
    )
    assert rc == 0
    assert len(spark.read.parquet(f"{out}/batch_id=*").collect()) == 1
