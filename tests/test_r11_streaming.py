"""Round-11 streaming operator: the anytime-CS monitor's state must
carry integer cumulatives across micro-batch boundaries and reproduce
the batch oracle bit-for-bit (the sprt/funnel cross-batch discipline)."""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_streaming_cs_state_crosses_micro_batches(spark, duck):
    """Split the replay into 4 time-ordered micro-batches (one file per
    trigger): trials/successes must continue across batch boundaries,
    and the full emission set must equal the relational oracle's
    windowed reconstruction."""
    from pyspark.sql.window import Window

    from weather_stream_processor_spark.registry import all_queries
    from weather_stream_processor_spark.sources import load_table
    from weather_stream_processor_spark.streaming.replay import run_to_memory
    from weather_stream_processor_spark.streaming.stateful import (
        cs_band_stream,
    )

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type", "event_id", "ts", "value"
    )
    src = tempfile.mkdtemp(prefix="cs_src_")
    quart = ev.withColumn(
        "q", F.ntile(4).over(Window.orderBy("ts", "event_id"))
    )
    for i in range(1, 5):
        quart.filter(F.col("q") == i).drop("q").coalesce(1).write.parquet(
            f"{src}/part{i}.parquet"
        )
        t = time.time() + i
        for root, _, files in os.walk(f"{src}/part{i}.parquet"):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    stream = (
        spark.readStream.schema(
            "event_type string, event_id long, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part*.parquet")
    )
    rows = run_to_memory(
        cs_band_stream(stream), "cs_xbatch", output_mode="append"
    ).collect()
    got = {
        (r.event_type, r.event_id, r.trials, r.successes, r.p_hat, r.radius,
         r.ci_lo, r.ci_hi, r.h0_in_band)
        for r in rows
    }

    oracle = all_queries()["streaming_anytime_cs_monitor"].oracle
    expected = {
        (r.event_type, r.event_id, r.trials, r.successes, r.p_hat, r.radius,
         r.ci_lo, r.ci_hi, r.h0_in_band)
        for r in duck.execute(oracle).fetchdf().itertuples(index=False)
    }
    assert got == expected
    # per-key trial counters must end at the key's full event count —
    # i.e. state genuinely accumulated across all four batches
    totals = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    max_trials = {}
    for et, _eid, trials, *_ in got:
        max_trials[et] = max(max_trials.get(et, 0), trials)
    assert max_trials == totals


def test_cs_radius_monotone_and_band_valid(spark):
    from weather_stream_processor_spark.registry import all_queries

    out = (
        all_queries()["streaming_anytime_cs_monitor"]
        .builder(spark, SF_SMOKE)
        .collect()
    )
    by_key = {}
    for r in out:
        by_key.setdefault(r.event_type, []).append(r)
    for et, rows in by_key.items():
        rows.sort(key=lambda r: r.trials)
        radii = [r.radius for r in rows]
        assert radii == sorted(radii, reverse=True), et
        for r in rows:
            assert 0.0 <= r.ci_lo <= r.ci_hi <= 1.0
            assert r.h0_in_band == (r.ci_lo <= 0.45 <= r.ci_hi)
