"""Phase-decompose the streaming headliners (guide §1: measure first).

Patches run_to_memory to capture StreamingQueryProgress for each replay,
then runs each streaming headliner once and prints the per-batch
durationMs breakdown (addBatch / getBatch / latestOffset / walCommit /
commitOffsets / queryPlanning / triggerExecution) plus the wall around
the whole builder — so the engine floor is attributed, not argued.

Usage: python tools/streaming_probe.py [sf_dir] [q1,q2,...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

QUERIES = [
    "streaming_hourly_agg",
    "streaming_dedup_replay",
    "streaming_cusum_monitor",
    "streaming_scd2_dimension",
    "streaming_weather_wire_pipeline",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else QUERIES

    from weather_stream_processor_spark.registry import all_queries
    from weather_stream_processor_spark.session import get_spark
    from weather_stream_processor_spark.streaming import replay

    spark = get_spark("streaming-probe")
    # warm (JVM, Arrow pool, parquet reader)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    progresses: list[dict] = []
    orig = replay.run_to_memory

    def capturing(stream_df, name, output_mode="complete", timeout_s=300):
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
        ex = q.exception()
        if ex is not None:
            raise ex
        progresses.extend(json.loads(p.json) for p in q.recentProgress)
        return stream_df.sparkSession.table(name)

    replay.run_to_memory = capturing
    # operators imported `run_to_memory` by name; patch their module too
    import weather_stream_processor_spark.operators.streaming_ops as so

    so.run_to_memory = capturing

    specs = all_queries()
    try:
        for name in names:
            for attempt in ("cold", "warm"):
                progresses.clear()
                t0 = time.perf_counter()
                df = specs[name].builder(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                wall = time.perf_counter() - t0
                phases: dict[str, float] = {}
                for p in progresses:
                    for k, v in (p.get("durationMs") or {}).items():
                        phases[k] = phases.get(k, 0.0) + v / 1000.0
                n_batches = len(progresses)
                print(
                    f"{name} [{attempt}]: wall={wall:.2f}s batches={n_batches} "
                    + " ".join(f"{k}={v:.2f}" for k, v in sorted(phases.items()))
                )
                sys.stdout.flush()
    finally:
        replay.run_to_memory = orig
        so.run_to_memory = orig


if __name__ == "__main__":
    main()
