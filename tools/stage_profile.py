"""Per-stage empirical profiler (optimization guide §1.1/§7.1).

Runs the named headline queries with the Spark UI's REST API enabled and
prints, per query, every stage of its jobs: wall duration, executor run
time, task count, shuffle read/write bytes, and the stage name — the
"where is the time actually going" loop the UI would provide.

Usage: python tools/stage_profile.py name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def main() -> None:
    from bench import materialize
    from weather_stream_processor_spark.registry import all_queries
    from weather_stream_processor_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    spark = get_spark("stage-profile", extra_conf={"spark.ui.enabled": "true"})
    specs = all_queries()

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()
    from weather_stream_processor_spark.sources import load_table

    load_table(spark, sf_dir, "region").count()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    for name in names:
        sc = spark.sparkContext
        sc.setJobGroup(name, name)
        before_jobs = {j["jobId"] for j in _get(f"{base}/jobs")}
        t0 = time.perf_counter()
        df = specs[name].builder(spark, sf_dir)
        t1 = time.perf_counter()
        materialize(df)
        t2 = time.perf_counter()
        sc.setJobGroup(None, None)

        jobs = [j for j in _get(f"{base}/jobs") if j["jobId"] not in before_jobs]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        print(
            f"\n=== {name}: build={t1-t0:.2f}s exec={t2-t1:.2f}s "
            f"jobs={len(jobs)} stages={len(stage_ids)} ==="
        )
        rows = []
        for sid in stage_ids:
            try:
                infos = _get(f"{base}/stages/{sid}")
            except Exception:
                continue
            for s in infos:
                if s["status"] == "SKIPPED":
                    rows.append((0.0, 0.0, 0, 0, 0, f"[skipped] {s['name']}"))
                    continue
                dur = (s.get("completionTime") is not None) and (
                    _ts(s["completionTime"]) - _ts(s["firstTaskLaunchedTime"])
                ) or 0.0
                rows.append(
                    (
                        dur,
                        s.get("executorRunTime", 0) / 1000.0,
                        s.get("numCompleteTasks", 0),
                        s.get("shuffleReadBytes", 0),
                        s.get("shuffleWriteBytes", 0),
                        s["name"].split("\n")[0],
                    )
                )
        rows.sort(key=lambda r: -r[0])
        for dur, ert, nt, srb, swb, nm in rows:
            print(
                f"  {dur:7.3f}s run={ert:7.2f}s tasks={nt:4d} "
                f"sr={srb/1e6:8.2f}MB sw={swb/1e6:8.2f}MB  {nm[:70]}"
            )


def _ts(s: str) -> float:
    from datetime import datetime

    return datetime.strptime(s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z").timestamp()


if __name__ == "__main__":
    main()
