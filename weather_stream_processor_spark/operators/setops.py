"""Set operations (SURVEY §2.6 'set ops'). Absent from the reference.

Scale notes: UNION is plan-level concatenation (zero shuffle); DISTINCT /
INTERSECT / EXCEPT each shuffle on the full row — at 100 TB prefer
aggregating before deduplicating (as union_nationkey_counts does) and keep
set ops on key columns, not wide rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_stream_processor_spark.registry import register
from weather_stream_processor_spark.sources import load_table, load_tables


@register(
    "union_distinct_nationkeys",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="UNION (distinct): concat + one shuffle-dedup on the key column only.",
    tags=("setop",),
)
def union_distinct_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, s = load_tables(spark, sf_dir, "customer", "supplier")
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .union(s.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )


@register(
    "union_all_nationkey_counts",
    oracle="""
        SELECT nationkey, COUNT(*) AS n
        FROM (
            SELECT c_nationkey AS nationkey FROM customer
            UNION ALL
            SELECT s_nationkey AS nationkey FROM supplier
        )
        GROUP BY nationkey
    """,
    doc="UNION ALL + aggregate: the scale-friendly shape (no row-level dedup).",
    tags=("setop",),
)
def union_all_nationkey_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, s = load_tables(spark, sf_dir, "customer", "supplier")
    u = c.select(F.col("c_nationkey").alias("nationkey")).unionByName(
        s.select(F.col("s_nationkey").alias("nationkey"))
    )
    return u.groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@register(
    "intersect_nationkeys",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="INTERSECT (distinct semantics) — nations with both customers and suppliers.",
    tags=("setop",),
)
def intersect_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, s = load_tables(spark, sf_dir, "customer", "supplier")
    return c.select(F.col("c_nationkey").alias("nationkey")).intersect(
        s.select(F.col("s_nationkey").alias("nationkey"))
    )


@register(
    "except_sources",
    oracle="""
        SELECT source FROM documents WHERE lang = 'zh'
        EXCEPT
        SELECT source FROM documents WHERE lang = 'fr'
    """,
    doc="EXCEPT (distinct semantics) — sources with Chinese docs but no French docs.",
    tags=("setop",),
)
def except_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    (d,) = load_tables(spark, sf_dir, "documents")
    return d.filter(F.col("lang") == "zh").select("source").subtract(
        d.filter(F.col("lang") == "fr").select("source")
    )


@register(
    "distinct_segments",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
    doc="DISTINCT projection on a single low-cardinality column.",
    tags=("setop", "distinct"),
)
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    (c,) = load_tables(spark, sf_dir, "customer")
    return c.select("c_mktsegment").distinct()


@register(
    "intersect_all_priorities",
    oracle="""
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        INTERSECT ALL
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    """,
    doc=(
        "INTERSECT ALL (multiset semantics): each priority kept "
        "min(count_F, count_O) times — Spark's intersectAll plans as a "
        "counted anti-semi aggregation, one shuffle per side."
    ),
    tags=("setop", "multiset"),
)
def intersect_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    (o,) = load_tables(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    return f.intersectAll(op)


@register(
    "except_all_priorities",
    oracle="""
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
        EXCEPT ALL
        SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'P'
    """,
    doc=(
        "EXCEPT ALL (multiset semantics): occurrences surviving = "
        "count_F - count_P per value, floor 0."
    ),
    tags=("setop", "multiset"),
)
def except_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    (o,) = load_tables(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    p = o.filter(F.col("o_orderstatus") == "P").select("o_orderpriority")
    return f.exceptAll(p)


@register(
    "unpivot_qty_by_status",
    oracle="""
        WITH wide AS (
            SELECT l_returnflag,
                   ROUND(COALESCE(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0), 2) AS qty_open,
                   ROUND(COALESCE(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0), 2) AS qty_finished
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'qty_open' AS status, qty_open AS qty FROM wide
        UNION ALL
        SELECT l_returnflag, 'qty_finished' AS status, qty_finished AS qty FROM wide
    """,
    doc=(
        "UNPIVOT/melt (wide -> long), the inverse of pivot_qty_by_status: "
        "Spark's native unpivot() plans as an Expand (each input row "
        "emitted once per value column) — no shuffle, no join, output = "
        "rows x value-columns. The pivot/unpivot pair round-trips the "
        "same data between layouts; at scale unpivot is the cheap "
        "direction (map-side only)."
    ),
    tags=("setop", "unpivot", "reshape"),
)
def unpivot_qty_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").pivot("l_linestatus", ["O", "F"]).agg(
        F.sum("l_quantity")
    ).select(
        "l_returnflag",
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("qty_open"),
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("qty_finished"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["qty_open", "qty_finished"],
        variableColumnName="status",
        valueColumnName="qty",
    )
