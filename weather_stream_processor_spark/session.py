"""SparkSession factory.

Defaults are tuned for the test harness (local[N], one JVM) but every
setting is the one you would also want on a 1000-executor cluster against
~100 TB: AQE on (runtime shuffle coalescing + skew-join splitting),
UTC session timezone (oracle comparability), Arrow for the few Pandas-UDF
operators, and shuffle partitions sized to the parallelism at hand rather
than the 200 default.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "weather-stream-processor-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    On a real cluster, drop ``master`` and let spark-submit supply it; AQE
    then re-sizes shuffles at runtime so ``shuffle_partitions`` is only the
    upper bound for the coalescer.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # fixture `events.ts` is TIMESTAMP(NANOS) parquet, which Spark's
        # reader rejects; read as long and convert in load_table (ns -> us
        # truncation, matching DuckDB's coercion of the same file)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # fixture timestamps are isAdjustedToUTC=false micros; surface them
        # as plain TimestampType (epoch-identical under the UTC session tz)
        # instead of TIMESTAMP_NTZ, which unix_micros/window() reject
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # plan strings must never truncate ("... N more fields"): the
        # mechanical guards (tests/test_window_partition_guard.py,
        # tools/window_audit.py) and the repo's plan-shape pins parse
        # executedPlan().toString() — a spec hidden past the default
        # 25-field cutoff would silently escape the screens
        .config("spark.sql.debug.maxToStringFields", "100000")
        .config("spark.ui.enabled", "false")
        # managed tables (bucketing demos/tests) land in tmp, never the repo
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_WAREHOUSE_DIR",
                os.path.join(tempfile.gettempdir(), "wsp_spark_warehouse"),
            ),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # reliable checkpoints (plans/caching.truncate_lineage on the
        # cluster path) must be reclaimed when their RDD is GC'd — the
        # default (false) leaks one O(result) directory per invocation
        # into the checkpoint store for the session lifetime
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
