"""Phase profiler for the headline bench queries (optimization round).

For each headline query, splits the bench's timed wall into:
  t_build -- Python-side builder() call (py4j expression-tree construction;
             for persisted_result operators this includes eager execution)
  t_plan  -- analysis + optimization + physical planning (executedPlan())
  t_exec  -- noop materialization of the already-planned DataFrame
and counts plan features (Exchange / ArrowEvalPython / scans) from the
formatted physical plan.

Usage: python tools/profile_bench.py [name ...]   (default: full HEADLINE)
Writes tools/profile_bench.json and prints a sorted table.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    from bench import HEADLINE, materialize
    from weather_stream_processor_spark.registry import all_queries
    from weather_stream_processor_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or HEADLINE
    spark = get_spark("profile-bench")
    specs = all_queries()

    # same warm-up as bench.py
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()
    from weather_stream_processor_spark.sources import load_table

    load_table(spark, sf_dir, "region").count()

    import contextlib
    import io

    rows = []
    for name in names:
        t0 = time.perf_counter()
        df = specs[name].builder(spark, sf_dir)
        t1 = time.perf_counter()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        t2 = time.perf_counter()
        materialize(df)
        t3 = time.perf_counter()
        rows.append(
            {
                "name": name,
                "t_build": round(t1 - t0, 3),
                "t_plan": round(t2 - t1, 3),
                "t_exec": round(t3 - t2, 3),
                "t_total": round(t3 - t0, 3),
                "n_exchange": plan.count("Exchange"),
                "n_python": plan.count("EvalPython")
                + plan.count("MapInPandas")
                + plan.count("MapInArrow"),
                "n_scans": plan.count("Scan parquet"),
                "plan_lines": plan.count("\n"),
            }
        )
        print(
            f"{rows[-1]['t_total']:7.2f}s build={rows[-1]['t_build']:6.2f} "
            f"plan={rows[-1]['t_plan']:6.2f} exec={rows[-1]['t_exec']:6.2f} "
            f"ex={rows[-1]['n_exchange']:3d} py={rows[-1]['n_python']:2d} "
            f"scan={rows[-1]['n_scans']:2d} lines={rows[-1]['plan_lines']:4d}  {name}",
            flush=True,
        )

    out = Path(_REPO) / "tools" / "profile_bench.json"
    out.write_text(json.dumps(rows, indent=1) + "\n")
    rows.sort(key=lambda r: -r["t_total"])
    print("\n=== sorted by total ===")
    for r in rows[:20]:
        print(
            f"{r['t_total']:7.2f}s build={r['t_build']:6.2f} plan={r['t_plan']:6.2f} "
            f"exec={r['t_exec']:6.2f}  {r['name']}"
        )


if __name__ == "__main__":
    main()
