"""Join surface (SURVEY §2.6 'joins'). Absent from the reference entirely;
built here Catalyst-first with explicit physical intent per query:

- dimension joins annotate `F.broadcast` on the small side (at 100 TB,
  region/nation are always broadcast-safe; customer/supplier/part only up
  to executor memory — AQE converts to broadcast at runtime when the
  post-filter size allows);
- fact-fact joins (lineitem ⋈ orders) stay shuffle/sort-merge on the join
  key — at scale both sides would be bucketed on orderkey so the shuffle
  disappears (see docs/SCALE.md);
- semi/anti joins use the dedicated left_semi/left_anti types (no
  row-multiplication, build side only keeps keys);
- the non-equi band join keeps an equality conjunct so Catalyst can hash
  on it instead of falling back to BroadcastNestedLoopJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from weather_stream_processor_spark.registry import register
from weather_stream_processor_spark.sources import load_table, load_tables


@register(
    "broadcast_dim_join",
    oracle="""
        SELECT r.r_name, n.n_name,
               COUNT(*) AS n_customers,
               ROUND(AVG(c.c_acctbal), 6) AS avg_acctbal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    """,
    doc=(
        "Star-schema dimension join: fact side streams, nation/region are "
        "broadcast (constant-size at any SF) — zero shuffle until the final "
        "low-cardinality aggregation."
    ),
    tags=("join", "broadcast", "headline"),
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, n, r = load_tables(spark, sf_dir, "customer", "nation", "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 6).alias("avg_acctbal"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
        SELECT l.l_orderkey,
               ROUND(CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                   * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0, 2) AS revenue,
               o.o_orderdate
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    doc=(
        "TPC-H Q3 shape: filtered dim ⋈ fact ⋈ fact, grouped revenue, "
        "deterministic top-10 (revenue rounded before ranking; orderkey "
        "tie-break). Customer side is broadcast after its segment filter; "
        "orders⋈lineitem is the sort-merge/bucketed pair at scale. TopK is "
        "TakeOrderedAndProject — per-partition heaps, no global sort."
    ),
    tags=("join", "headline", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o, li = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .filter(
            (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") > F.lit("1996-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                        + F.lit(0.5)
                    ).cast("bigint")
                ).cast("bigint")
                / 10000.0,
                2,
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
        SELECT n.n_name,
               ROUND(CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                   * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0, 2) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND s.s_nationkey = c.c_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY n.n_name
    """,
    doc=(
        "TPC-H Q5 shape: six-way join with a two-column join conjunct "
        "(supplier nation = customer nation). Catalyst reorders so the "
        "region filter prunes nation before the fact joins."
    ),
    tags=("join", "headline"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o, li, s, n, r = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                        + F.lit(0.5)
                    ).cast("bigint")
                ).cast("bigint")
                / 10000.0,
                2,
            ).alias("revenue")
        )
    )


@register(
    "semi_join_customers_with_orders",
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 200000)
    """,
    doc=(
        "Left-semi join (EXISTS): probe side emitted at most once per row, "
        "build side reduced to distinct keys — no row multiplication."
    ),
    tags=("join", "semi"),
)
def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = load_tables(spark, sf_dir, "customer", "orders")
    big = o.filter(F.col("o_totalprice") > 200000)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "anti_join_customers_without_orders",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 400000)
    """,
    doc="Left-anti join (NOT EXISTS): customers with no jumbo order.",
    tags=("join", "anti"),
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = load_tables(spark, sf_dir, "customer", "orders")
    jumbo = o.filter(F.col("o_totalprice") > 400000)
    return c.join(jumbo, c.c_custkey == jumbo.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "outer_join_order_counts",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               COUNT(o.o_orderkey) AS n_orders,
               ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS total_spent
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey, c.c_name
    """,
    doc=(
        "Left-outer join preserving customers with zero orders; COUNT over "
        "the nullable key counts matches only."
    ),
    tags=("join", "outer"),
)
def outer_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = load_tables(spark, sf_dir, "customer", "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@register(
    "range_join_ship_latency",
    oracle="""
        SELECT o.o_orderpriority,
               COUNT(*) AS n_lineitems,
               ROUND(AVG(date_diff('day', o.o_orderdate, l.l_shipdate)), 6) AS avg_latency_days
        FROM orders o
        JOIN lineitem l
          ON l.l_orderkey = o.o_orderkey
         AND l.l_shipdate >= o.o_orderdate
         AND l.l_shipdate < o.o_orderdate + INTERVAL 90 DAY
        GROUP BY o.o_orderpriority
    """,
    doc=(
        "Range join with an equality conjunct: Catalyst hashes on "
        "l_orderkey = o_orderkey and applies the ship-window band as a "
        "post-join filter — never a nested-loop. Pure-range joins (no equi "
        "key) should bucketize the range dimension first (see "
        "theta_join_price_band)."
    ),
    tags=("join", "range"),
)
def range_join_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, li = load_tables(spark, sf_dir, "orders", "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    )
    return (
        o.join(li, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.round(F.avg(F.datediff("l_shipdate", "o_orderdate")), 6).alias(
                "avg_latency_days"
            ),
        )
    )


@register(
    "theta_join_price_band",
    oracle="""
        SELECT a.p_brand,
               COUNT(*) AS n_pairs
        FROM part a
        JOIN part b
          ON a.p_brand = b.p_brand
         AND a.p_partkey < b.p_partkey
         AND abs(a.p_size - b.p_size) <= 1
        GROUP BY a.p_brand
    """,
    doc=(
        "Theta join: self-join of part on a size band. The brand equality "
        "conjunct keeps it a hash join (the band + key inequality are "
        "post-join filters); a band join with NO equality key must be "
        "rewritten onto a bucketized equi key exactly like this to avoid "
        "the O(n^2) nested loop at scale."
    ),
    tags=("join", "theta"),
)
def theta_join_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    a = p.alias("a")
    b = p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey"))
            & (F.abs(F.col("a.p_size") - F.col("b.p_size")) <= 1),
        )
        .groupBy(F.col("a.p_brand").alias("p_brand"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "asof_join_last_view",
    oracle="""
        SELECT p.user_id, p.event_id, p.ts AS purchase_ts,
               (SELECT MAX(v.ts) FROM events v
                WHERE v.event_type = 'view'
                  AND v.user_id = p.user_id
                  AND v.ts <= p.ts) AS last_view_ts
        FROM events p
        WHERE p.event_type = 'purchase'
    """,
    doc=(
        "AS-OF join (point-in-time lookup): each purchase picks up the "
        "latest view of the same user at-or-before its timestamp. Spark "
        "has no asof join operator; the scalable form is NOT a range join "
        "(unbounded O(n*m) band) but the union-sort trick: union both "
        "sides tagged, one window sort per user, last(view_ts, "
        "ignorenulls) carried forward. One shuffle on user_id, linear "
        "state — survives 100 TB where a correlated-subquery or interval "
        "join would not. Ties (view.ts == purchase.ts) sort view-first, "
        "giving <= semantics."
    ),
    tags=("join", "asof"),
)
def asof_join_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("view_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        "event_id",
        F.lit(None).cast("timestamp").alias("view_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = views.unionByName(purchases).withColumn(
        "last_view_ts", F.last("view_ts", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("side") == 1).select(
        "user_id", "event_id", F.col("ts").alias("purchase_ts"), "last_view_ts"
    )


@register(
    "cross_join_region_pairs",
    oracle="""
        SELECT a.r_name AS region_a, b.r_name AS region_b
        FROM region a CROSS JOIN region b
        WHERE a.r_regionkey < b.r_regionkey
    """,
    doc=(
        "Explicit cross join (tiny dims only — BroadcastNestedLoopJoin). "
        "Registered to cover the operator; at scale cross joins are always "
        "a design smell unless one side is O(1)."
    ),
    tags=("join", "cross"),
)
def cross_join_region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    a = r.alias("a")
    b = r.alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.r_regionkey") < F.col("b.r_regionkey"))
        .select(F.col("a.r_name").alias("region_a"), F.col("b.r_name").alias("region_b"))
    )


@register(
    "salted_skew_join",
    oracle="""
        WITH user_totals AS (
            SELECT user_id, ROUND(SUM(value), 5) AS user_total
            FROM events GROUP BY user_id
        )
        SELECT e.event_id, e.user_id,
               ROUND(e.value, 5) AS value,
               t.user_total
        FROM events e JOIN user_totals t USING (user_id)
    """,
    doc=(
        "SALTED skew join: enriching a fact with a per-key dim when a few "
        "keys are hot. The dim side is replicated once per salt value "
        "(explode over [0, NSALT)), the fact side salts by "
        "pmod(hash(event_id), NSALT), and the join key becomes (user_id, "
        "salt) — a hot key's rows now land on NSALT reducers instead of "
        "one. Result is row-identical to the plain join (the oracle IS the "
        "plain join). AQE's skewJoin handles post-shuffle partition skew "
        "automatically; explicit salting is the belt-and-braces form that "
        "also fixes single-key skew AQE cannot split below key "
        "granularity."
    ),
    tags=("join", "skew", "scale"),
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    NSALT = 16
    ev = load_table(spark, sf_dir, "events")
    totals = ev.groupBy("user_id").agg(F.round(F.sum("value"), 5).alias("user_total"))
    dim_salted = totals.select(
        "user_id", "user_total", F.explode(F.array(*[F.lit(i) for i in range(NSALT)])).alias("salt")
    )
    fact_salted = ev.withColumn("salt", F.pmod(F.hash("event_id"), F.lit(NSALT)))
    return (
        fact_salted.join(dim_salted, ["user_id", "salt"])
        .select(
            "event_id",
            "user_id",
            F.round(F.col("value"), 5).alias("value"),
            "user_total",
        )
    )


@register(
    "lateral_join_latest_order",
    oracle="""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate
        FROM customer c,
             LATERAL (SELECT o_orderkey, o_orderdate
                      FROM orders
                      WHERE o_custkey = c.c_custkey
                      ORDER BY o_orderdate DESC, o_orderkey
                      LIMIT 1) o
    """,
    doc=(
        "LATERAL join (correlated per-row subquery, SQL API): each "
        "customer picks its latest order. Catalyst DECORRELATES this into "
        "the same plan as the window top-1 formulation (rank over "
        "o_custkey, WindowGroupLimit) — registered to pin that the "
        "correlated-subquery surface exists AND that it never executes as "
        "a per-row re-scan; at 100 TB a truly row-at-a-time lateral would "
        "be O(customers) table scans."
    ),
    tags=("join", "lateral", "sql-api"),
)
def lateral_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate
        FROM customer_lat c,
             LATERAL (SELECT o_orderkey, o_orderdate
                      FROM orders_lat
                      WHERE o_custkey = c.c_custkey
                      ORDER BY o_orderdate DESC, o_orderkey
                      LIMIT 1) o
        """
    )


@register(
    "scd2_segment_update",
    oracle="""
        WITH updates AS (
            SELECT c_custkey, 'PREMIUM' AS new_segment
            FROM customer WHERE c_acctbal > 7000
        )
        SELECT c.c_custkey,
               c.c_mktsegment AS segment,
               TIMESTAMP '1990-01-01 00:00:00' AS valid_from,
               CASE WHEN u.c_custkey IS NOT NULL
                    THEN TIMESTAMP '2024-01-01 00:00:00' END AS valid_to,
               (u.c_custkey IS NULL) AS is_current
        FROM customer c LEFT JOIN updates u USING (c_custkey)
        UNION ALL
        SELECT c_custkey, 'PREMIUM' AS segment,
               TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to,
               TRUE AS is_current
        FROM updates
    """,
    doc=(
        "SCD TYPE-2 dimension update (the MERGE every warehouse sink "
        "needs): an update set closes out the affected rows (valid_to "
        "stamped, is_current=false) and appends new versions — expressed "
        "as one left join + union, no row-level mutation, so it runs on "
        "immutable parquet at any scale. The update set is dim-sized "
        "(broadcast); the surviving plan is scan -> broadcast join -> "
        "union. In a streaming foreachBatch this exact shape is the "
        "staging+MERGE the JDBC sink performs (SURVEY §4.3c)."
    ),
    tags=("join", "scd2", "warehouse"),
)
def scd2_segment_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    updates = c.filter(F.col("c_acctbal") > 7000).select(
        "c_custkey", F.lit("PREMIUM").alias("new_segment")
    )
    t0 = F.lit("1990-01-01 00:00:00").cast("timestamp")
    t1 = F.lit("2024-01-01 00:00:00").cast("timestamp")
    closed = (
        c.join(F.broadcast(updates), "c_custkey", "left")
        .select(
            "c_custkey",
            F.col("c_mktsegment").alias("segment"),
            t0.alias("valid_from"),
            F.when(F.col("new_segment").isNotNull(), t1).alias("valid_to"),
            F.col("new_segment").isNull().alias("is_current"),
        )
    )
    fresh = updates.select(
        "c_custkey",
        F.col("new_segment").alias("segment"),
        t1.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed.unionByName(fresh)


# --- Round-6: Allen's interval algebra ------------------------------------------


@register(
    "allen_interval_relations",
    oracle="""
        WITH iv AS (
            SELECT user_id,
                   date_trunc('day', ts) AS day,
                   MIN(ts) AS s, MAX(ts) AS e
            FROM events
            GROUP BY 1, 2
            HAVING MIN(ts) < MAX(ts)
        ),
        pairs AS (
            SELECT a.s AS s1, a.e AS e1, b.s AS s2, b.e AS e2
            FROM iv a JOIN iv b
              ON a.day = b.day AND a.user_id < b.user_id
        ),
        rel AS (
            SELECT CASE
                WHEN e1 < s2 THEN 'before'
                WHEN e2 < s1 THEN 'after'
                WHEN e1 = s2 THEN 'meets'
                WHEN e2 = s1 THEN 'met_by'
                WHEN s1 = s2 AND e1 = e2 THEN 'equal'
                WHEN s1 = s2 AND e1 < e2 THEN 'starts'
                WHEN s1 = s2 AND e1 > e2 THEN 'started_by'
                WHEN e1 = e2 AND s1 > s2 THEN 'finishes'
                WHEN e1 = e2 AND s1 < s2 THEN 'finished_by'
                WHEN s1 > s2 AND e1 < e2 THEN 'during'
                WHEN s1 < s2 AND e1 > e2 THEN 'contains'
                WHEN s1 < s2 AND e1 > s2 AND e1 < e2 THEN 'overlaps'
                WHEN s2 < s1 AND e2 > s1 AND e2 < e1 THEN 'overlapped_by'
                END AS relation
            FROM pairs
        )
        SELECT relation, CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM rel GROUP BY relation
    """,
    doc=(
        "ALLEN'S INTERVAL ALGEBRA (Allen 1983 — the 13 exhaustive, "
        "mutually exclusive relations between two intervals: before/"
        "after, meets/met_by, overlaps/overlapped_by, starts/started_by, "
        "during/contains, finishes/finished_by, equal) classifying every "
        "same-day pair of user activity spans — the temporal-join "
        "vocabulary behind overlap joins, conflict detection, and "
        "temporal aggregation, made explicit as a relation histogram. "
        "The CASE ladder is order-sensitive and EXHAUSTIVE (the 13 "
        "relations partition all pair geometries — pytest-gated: no "
        "NULL relation, totals equal the per-day pair count). Plan: "
        "day-blocked self-equi-join (pairs scale with per-day user "
        "density, never the corpus square — the geo grid-blocking "
        "argument), timestamp comparisons only, one bounded (<=13-row) "
        "aggregate."
    ),
    tags=("join", "timeseries", "analytics", "temporal"),
)
def allen_interval_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    iv = (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
        .filter(F.col("s") < F.col("e"))
    )
    a = iv.alias("a")
    b = iv.alias("b")
    pairs = a.join(
        b,
        (F.col("a.day") == F.col("b.day")) & (F.col("a.user_id") < F.col("b.user_id")),
    ).select(
        F.col("a.s").alias("s1"),
        F.col("a.e").alias("e1"),
        F.col("b.s").alias("s2"),
        F.col("b.e").alias("e2"),
    )
    s1, e1, s2, e2 = (F.col(c) for c in ("s1", "e1", "s2", "e2"))
    relation = (
        F.when(e1 < s2, "before")
        .when(e2 < s1, "after")
        .when(e1 == s2, "meets")
        .when(e2 == s1, "met_by")
        .when((s1 == s2) & (e1 == e2), "equal")
        .when((s1 == s2) & (e1 < e2), "starts")
        .when((s1 == s2) & (e1 > e2), "started_by")
        .when((e1 == e2) & (s1 > s2), "finishes")
        .when((e1 == e2) & (s1 < s2), "finished_by")
        .when((s1 > s2) & (e1 < e2), "during")
        .when((s1 < s2) & (e1 > e2), "contains")
        .when((s1 < s2) & (e1 > s2) & (e1 < e2), "overlaps")
        .when((s2 < s1) & (e2 > s1) & (e2 < e1), "overlapped_by")
    )
    return (
        pairs.select(relation.alias("relation"))
        .groupBy("relation")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


# --- Round-6: entity-resolution blocking-quality audit ----------------------------

_BQ_RESIDUE = 97  # ground-truth proxy: name-number residues agree mod this


@register(
    "blocking_quality_audit",
    oracle=f"""
        WITH c AS (
            SELECT c_nationkey AS nation,
                   CAST(substr(c_name, 10) AS BIGINT) % {_BQ_RESIDUE} AS r
            FROM customer
        ),
        s AS (
            SELECT s_nationkey AS nation,
                   CAST(substr(s_name, 10) AS BIGINT) % {_BQ_RESIDUE} AS r
            FROM supplier
        ),
        nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
        ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s),
        cand AS (
            SELECT CAST(SUM(cc.n * ss.n) AS BIGINT) AS n FROM
            (SELECT nation, COUNT(*) AS n FROM c GROUP BY 1) cc
            JOIN (SELECT nation, COUNT(*) AS n FROM s GROUP BY 1) ss
              USING (nation)
        ),
        truth AS (
            SELECT CAST(SUM(cc.n * ss.n) AS BIGINT) AS n FROM
            (SELECT r, COUNT(*) AS n FROM c GROUP BY 1) cc
            JOIN (SELECT r, COUNT(*) AS n FROM s GROUP BY 1) ss USING (r)
        ),
        hit AS (
            SELECT CAST(COALESCE(SUM(cc.n * ss.n), 0) AS BIGINT) AS n FROM
            (SELECT nation, r, COUNT(*) AS n FROM c GROUP BY 1, 2) cc
            JOIN (SELECT nation, r, COUNT(*) AS n FROM s GROUP BY 1, 2) ss
              USING (nation, r)
        )
        SELECT nc.n AS n_cust, ns.n AS n_supp,
               nc.n * ns.n AS total_pairs,
               cand.n AS cand_pairs,
               truth.n AS true_pairs,
               hit.n AS true_blocked,
               CAST((nc.n * ns.n - cand.n) * 1000000 // (nc.n * ns.n)
                    AS BIGINT) AS reduction_ratio_e6,
               CAST(hit.n * 1000000 // truth.n AS BIGINT)
                   AS pair_completeness_e6
        FROM nc CROSS JOIN ns CROSS JOIN cand CROSS JOIN truth CROSS JOIN hit
    """,
    doc=(
        "BLOCKING-QUALITY AUDIT (Christen's record-linkage evaluation "
        "pair): for the nation blocking the linkage family uses "
        "(fellegi_sunter_linkage, jaro_winkler_linkage_topk), the two "
        "numbers every blocking scheme is judged by — REDUCTION RATIO "
        "(fraction of the |C|x|S| pair space the blocking never "
        "compares) and PAIR COMPLETENESS (fraction of true matches the "
        "blocking retains; truth proxy: name-number residues agree mod "
        f"{_BQ_RESIDUE}). The audit NEVER materializes a pair: every "
        "quantity is a sum of products of group cardinalities "
        "(Σ|C_b|x|S_b| over block values), so it runs at any corpus "
        "scale for the same cost as three small aggregates — the trick "
        "that makes blocking evaluation feasible at all. Exact integer "
        "ppm ratios; one-row output."
    ),
    tags=("join", "dedup", "linkage", "audit"),
)
def blocking_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nation"),
        (F.expr("CAST(substr(c_name, 10) AS BIGINT)") % _BQ_RESIDUE).alias("r"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nation"),
        (F.expr("CAST(substr(s_name, 10) AS BIGINT)") % _BQ_RESIDUE).alias("r"),
    )

    def _pairsum(left, right, keys):
        lc = left.groupBy(*keys).agg(F.count(F.lit(1)).alias("ln"))
        rc = right.groupBy(*keys).agg(F.count(F.lit(1)).alias("rn"))
        return (
            lc.join(rc, list(keys))
            .agg(F.coalesce(F.sum(F.col("ln") * F.col("rn")), F.lit(0)).alias("n"))
        )

    nc = cust.agg(F.count(F.lit(1)).cast("bigint").alias("n_cust"))
    ns = supp.agg(F.count(F.lit(1)).cast("bigint").alias("n_supp"))
    cand = _pairsum(cust, supp, ("nation",)).select(
        F.col("n").cast("bigint").alias("cand_pairs")
    )
    truth = _pairsum(cust, supp, ("r",)).select(
        F.col("n").cast("bigint").alias("true_pairs")
    )
    hit = _pairsum(cust, supp, ("nation", "r")).select(
        F.col("n").cast("bigint").alias("true_blocked")
    )
    row = (
        nc.crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(cand))
        .crossJoin(F.broadcast(truth))
        .crossJoin(F.broadcast(hit))
    )
    total = F.col("n_cust") * F.col("n_supp")
    return row.select(
        "n_cust",
        "n_supp",
        total.alias("total_pairs"),
        "cand_pairs",
        "true_pairs",
        "true_blocked",
        F.expr(
            "CAST((n_cust * n_supp - cand_pairs) * 1000000 div (n_cust * n_supp) AS BIGINT)"
        ).alias("reduction_ratio_e6"),
        F.expr("CAST(true_blocked * 1000000 div true_pairs AS BIGINT)").alias(
            "pair_completeness_e6"
        ),
    )
