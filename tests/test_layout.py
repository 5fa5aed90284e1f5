"""Storage-layout evidence: date partitioning prunes directories and
bucketing eliminates the join shuffle — asserted from the physical plan,
not assumed."""

from __future__ import annotations

import re
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from weather_stream_processor_spark.plans import explain_string, operator_names
from weather_stream_processor_spark.sources import load_table
from weather_stream_processor_spark.sources.layout import (
    write_bucketed_table,
    write_date_partitioned,
)


def test_date_partitioning_prunes_scan(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    path = tempfile.mkdtemp(prefix="part_events_") + "/events"
    write_date_partitioned(ev, path, "ts")

    part = spark.read.parquet(path)
    n_days = part.select("p_date").distinct().count()
    assert n_days > 3

    one_day = part.select("p_date").orderBy("p_date").first().p_date
    pruned = part.filter(F.col("p_date") == F.lit(one_day))
    plan = explain_string(pruned, "formatted")
    assert "PartitionFilters" in plan
    # the scan must touch exactly one of the n_days partitions
    m = re.search(r"partition count: (\d+)", explain_string(pruned, "simple")) or re.search(
        r"(\d+) partitions", explain_string(pruned, "simple")
    )
    if m:  # format varies across Spark versions; row check below is the gate
        assert int(m.group(1)) == 1
    # and pruning must not change semantics
    expected = ev.filter(F.to_date("ts") == F.lit(one_day)).count()
    assert pruned.count() == expected


def test_bucketed_join_eliminates_exchange(spark):
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed_table(orders, spark, "orders_b", "o_orderkey")
    write_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        spark,
        "lineitem_b",
        "o_orderkey",
    )
    # force the large-table join path: at fixture size the planner would
    # broadcast instead and skip bucketed scans entirely ("Bucketed: false
    # (disabled by query planner)"); at real fact-fact scale SMJ is the
    # strategy bucketing exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
        ops = operator_names(joined)
        assert "SortMergeJoin" in ops
        # co-located buckets: no shuffle on either side of the join
        assert "Exchange" not in ops, ops
        # sanity: same row count as the shuffle join over the raw tables
        raw = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        )
        assert joined.count() == raw.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
