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


def test_bucketed_tables_join_without_exchange(spark):
    """Bucketing both join sides on the key (CLUSTERED BY custkey) makes
    the fact-dim join EXCHANGE-FREE: each bucket pair joins in place.
    This is the co-located-join layout a 100 TB deployment keeps its fact
    tables in — the shuffle that dominates every sort-merge join is paid
    ONCE at write time and amortized over every subsequent join. The
    test pins Catalyst actually exploiting the layout: zero Exchange
    operators in the joined plan (vs 2 for the unbucketed same join)."""
    import pyspark.sql.functions as F

    from tests.conftest import SF_SMOKE
    from weather_stream_processor_spark.sources import load_table

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, SF_SMOKE, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    try:
        # force the shuffle-join path so the assertion is about bucketing,
        # not about broadcasting the small fixture dim
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        (
            orders.write.mode("overwrite")
            .bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .saveAsTable("b_orders")
        )
        (
            cust.write.mode("overwrite")
            .bucketBy(8, "c_custkey")
            .sortBy("c_custkey")
            .saveAsTable("b_customer")
        )
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # unbucketed control: the identical join pays two exchanges
        control = orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        cplan = control._jdf.queryExecution().executedPlan().toString()
        assert cplan.count("Exchange") >= 2
        # and values agree
        assert joined.count() == control.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
