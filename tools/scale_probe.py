"""Scaling spot-check: wall-clock ratio of selected queries at 1x vs a
Kx replicated fixture set.

Builds a replica dir where the named fact tables are unioned K times with
key offsets (so join/group cardinalities scale, not just row counts),
symlinks the dimension tables, then times each query at both scales on
the same session. A query whose wall ratio stays well under K on a
32-thread local mode has headroom (idle cores absorbed the work); a ratio
far above K means the plan degrades superlinearly — investigate before
any 100 TB claim.

Usage:
    python tools/scale_probe.py [K] [query ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# fact tables replicated with offset keys; everything else symlinks
_FACTS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
_KEY_OFFSET = 1 << 32  # far above any fixture key


def build_replica_dir(spark, k: int) -> str:
    from pyspark.sql import functions as F

    from weather_stream_processor_spark.sources import TABLES, load_table

    out = os.path.join(tempfile.gettempdir(), f"scale_probe_{k}x")
    # reuse a previously-built replica of the same (k, source): the bench
    # may be invoked several times per round and the replica write is the
    # expensive part. The marker is written LAST, so a half-built replica
    # (crash mid-write) never carries one and is rebuilt.
    marker = os.path.join(out, "_REPLICA_META.json")
    # fingerprint the SOURCE files (size + mtime) and the full table list,
    # not just the path: a regenerated fixture at the same path, or a table
    # added to sources.TABLES, must invalidate the cached replica
    meta = {
        "k": k,
        "sf_dir": SF_DIR,
        "tables": sorted(_FACTS),
        "all_tables": sorted(TABLES),
        "sources": {
            name: (
                lambda st: [st.st_size, int(st.st_mtime)]
            )(os.stat(os.path.join(SF_DIR, f"{name}.parquet")))
            for name in sorted(TABLES)
        },
    }
    if os.path.isfile(marker):
        try:
            with open(marker, encoding="utf-8") as f:
                if json.load(f) == meta:
                    return out
        except (OSError, ValueError):
            pass
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out)
    for name in TABLES:
        src = os.path.join(SF_DIR, f"{name}.parquet")
        if name not in _FACTS:
            os.symlink(src, os.path.join(out, f"{name}.parquet"))
            continue
        df = spark.read.parquet(src)
        key = _FACTS[name]
        parts = [
            df.withColumn(key, F.col(key) + F.lit(i * _KEY_OFFSET)) for i in range(k)
        ]
        rep = parts[0]
        for p in parts[1:]:
            rep = rep.unionAll(p)
        rep.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
    with open(marker, "w", encoding="utf-8") as f:
        json.dump(meta, f)
    return out


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or [
        "q10_returned_items",
        "q18_large_volume_customers",
        "q21_waiting_supplier",
        "funnel_conversion",
        "repetition_quality_filter",
        "near_dup_keep_list",
    ]
    from weather_stream_processor_spark.registry import all_queries
    from weather_stream_processor_spark.session import get_spark

    spark = get_spark("scale-probe")
    replica = build_replica_dir(spark, k)
    specs = all_queries()
    results = {}
    for name in names:
        b = specs[name].builder
        t0 = time.time()
        n1 = b(spark, SF_DIR).count()
        t1 = time.time() - t0
        t0 = time.time()
        nk = b(spark, replica).count()
        tk = time.time() - t0
        results[name] = {
            "t_1x": round(t1, 2),
            f"t_{k}x": round(tk, 2),
            "ratio": round(tk / t1, 2),
            "rows_1x": n1,
            f"rows_{k}x": nk,
        }
        print(name, results[name], flush=True)
    print(json.dumps({"k": k, "sf_dir": SF_DIR, "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
