"""TPC-H-shaped relational suite (SURVEY §2.6 extension surface).

The fixture tables are trimmed TPC-H (no partsupp, no l_commitdate /
l_receiptdate / c_phone / o_comment / p_container), so the classic
queries that need those columns are ADAPTED, keeping each one's defining
plan shape:

  q2   min-cost supplier -> correlated MIN subquery, decorrelated to an
                            aggregate-of-aggregate + equi join (supply
                            cost := best observed lineitem unit price)
  q4   EXISTS            -> left-semi join with a non-equi conjunct
  q7   two-nation volume -> 6-way join, disjunctive nation-pair filter
  q8   market share      -> 8-way join, conditional share aggregate
  q9   product profit    -> LIKE-filtered 5-way join (cost := retailprice)
  q10  returned items    -> fact-heavy join + deterministic top-k
  q11  important stock   -> HAVING vs a global-fraction scalar subquery
                            over the same aggregate (value := one
                            nation's shipped extendedprice)
  q12  priority classes  -> join + conditional counts (CASE aggregates)
  q13  order-count dist  -> left join preserved under a join-side filter,
                            aggregate-of-aggregate
  q14  promo share       -> one-month scan + conditional ratio
  q16  supplier counts   -> NOT IN -> anti join, negated-predicate dim
                            prune, exact COUNT(DISTINCT)
  q17  small-qty orders  -> correlated scalar subquery, decorrelated to a
                            per-key aggregate + broadcast join
  q18  large-volume      -> HAVING semi-filter + multi-key rollup + top-k
  q20  part promotion    -> nested semi joins (LIKE part list -> HAVING
                            aggregate -> supplier probe)
  q21  waiting supplier  -> EXISTS + NOT EXISTS (semi AND anti correlated
                            on the same key, "late" := shipped > 90 days
                            after order date)
  q22  idle customers    -> global scalar subquery + anti join

Every query is a single declarative Catalyst tree: dimension filters sit
below the joins (pushdown), small filtered sides broadcast, and the
top-k queries tie-break on a key column so LIMIT is deterministic for
the value-hash gate. At 100 TB the fact-side scans partition-prune on
the date predicates if the table is laid out by month (docs/SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_stream_processor_spark.registry import register
from weather_stream_processor_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]


def _revenue():
    # built lazily: module-level Column construction would crash when this
    # package is imported inside a Python worker (no active SparkContext)
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "q4_order_priority",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
    """,
    doc=(
        "TPC-H Q4 shape (order-priority checking): quarter-filtered orders "
        "semi-joined to lineitem on an equi key PLUS a non-equi date "
        "conjunct (shipped after ordered — the trimmed schema's stand-in "
        "for commit<receipt). LEFT SEMI join never duplicates or widens "
        "rows, so the count is order-grain with no post-join dedup; the "
        "date filter on orders cuts the build side before the join."
    ),
    tags=("tpch", "join", "semi"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, li = _t(spark, sf_dir, "orders", "lineitem")
    quarter = o.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    with_ship = quarter.join(
        li,
        (li.l_orderkey == quarter.o_orderkey) & (li.l_shipdate > quarter.o_orderdate),
        "left_semi",
    )
    return with_ship.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q7_volume_shipping",
    oracle="""
        SELECT supp_nation, cust_nation, l_year,
               ROUND(CAST(SUM(CAST(FLOOR(volume * 10000 + 0.5) AS BIGINT))
                     AS BIGINT) / 10000.0, 2) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM supplier s
            JOIN lineitem l ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                                 AND TIMESTAMP '1997-12-31'
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
    doc=(
        "TPC-H Q7 shape (volume shipping between two nations): six-way "
        "join where the selective predicate is a DISJUNCTION over a pair "
        "of dimension attributes. The two nation lookups broadcast; "
        "Catalyst keeps the disjunctive filter above the nation joins but "
        "below the aggregate, so only the two nations' traffic reaches "
        "the final shuffle."
    ),
    tags=("tpch", "join"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s, li, o, c, n = _t(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair_filter = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    joined = (
        li.filter(F.col("l_shipdate").between("1996-01-01", "1997-12-31"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair_filter)
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("bigint").alias("l_year"),
    ).agg(
        F.round(
            F.sum(F.floor(_revenue() * 10000 + F.lit(0.5)).cast("bigint")).cast(
                "bigint"
            )
            / 10000.0,
            2,
        ).alias("revenue")
    )


@register(
    "q8_market_share",
    oracle="""
        SELECT o_year,
               ROUND(CAST(SUM(CASE WHEN nation = 'NATION_3'
                           THEN CAST(FLOOR(volume * 10000 + 0.5) AS BIGINT)
                           ELSE 0 END) AS DOUBLE)
                     / CAST(SUM(CAST(FLOOR(volume * 10000 + 0.5) AS BIGINT))
                            AS DOUBLE), 6) AS mkt_share
        FROM (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   l_extendedprice * (1 - l_discount) AS volume,
                   n2.n_name AS nation
            FROM part p
            JOIN lineitem l ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
            JOIN region r ON n1.n_regionkey = r.r_regionkey
            JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
            WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
              AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                  AND TIMESTAMP '1997-12-31'
        ) all_nations
        GROUP BY o_year
    """,
    doc=(
        "TPC-H Q8 shape (national market share): the widest join in the "
        "suite — part, supplier, two nation roles, region, customer, "
        "orders, lineitem. Every dimension is filtered BEFORE its join "
        "and broadcast; the conditional-share aggregate (share of volume "
        "from one supplier nation) is two co-computed sums in one "
        "HashAggregate, not two passes."
    ),
    tags=("tpch", "join", "aggregation"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p, li, s, o, c, n, r = _t(
        spark,
        sf_dir,
        "part",
        "lineitem",
        "supplier",
        "orders",
        "customer",
        "nation",
        "region",
    )
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    asia = r.filter(F.col("r_name") == "ASIA")
    promo_parts = p.filter(F.col("p_type") == "PROMO").select("p_partkey")
    joined = (
        li.join(F.broadcast(promo_parts), li.l_partkey == F.col("p_partkey"))
        .join(
            o.filter(F.col("o_orderdate").between("1996-01-01", "1997-12-31")),
            li.l_orderkey == o.o_orderkey,
        )
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(asia), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    volume_i = F.floor(_revenue() * 10000 + F.lit(0.5)).cast("bigint")
    return joined.groupBy(
        F.year("o_orderdate").cast("bigint").alias("o_year")
    ).agg(
        F.round(
            F.sum(
                F.when(F.col("nation") == "NATION_3", volume_i).otherwise(
                    F.lit(0).cast("bigint")
                )
            ).cast("double")
            / F.sum(volume_i).cast("double"),
            6,
        ).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    oracle="""
        SELECT nation, o_year,
               ROUND(CAST(SUM(amount_i) AS BIGINT) / 10000.0, 2) AS sum_profit
        FROM (
            SELECT n.n_name AS nation,
                   CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   CAST(FLOOR((l_extendedprice * (1 - l_discount)
                               - p_retailprice * l_quantity) * 10000 + 0.5)
                        AS BIGINT) AS amount_i
            FROM lineitem l
            JOIN part p ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE p.p_name LIKE '%gear%'
        ) profit
        GROUP BY nation, o_year
    """,
    doc=(
        "TPC-H Q9 shape (product-type profit; cost := p_retailprice since "
        "the trimmed schema has no partsupp): LIKE-filtered part list "
        "broadcast into the fact, profit expression computed in-scan, "
        "grouped by supplier nation x order year. The LIKE predicate "
        "cannot push to parquet as a range but still prunes before any "
        "join because the part scan is dimension-sized. The profit sum is "
        "integer-lifted (floor(amount*1e4+0.5) as bigint, q10's pattern): "
        "at sf0.1 one nation-year cell's float sum landed exactly on a "
        "2-dp rounding boundary and engine summation order flipped the "
        "hash — the r6 sf0.1 strict sweep caught it; exact integer sums "
        "are partition-order-invariant at any scale."
    ),
    tags=("tpch", "join", "aggregation"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, p, s, o, n = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "orders", "nation"
    )
    gears = p.filter(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice"
    )
    joined = (
        li.join(F.broadcast(gears), li.l_partkey == F.col("p_partkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    amount_i = F.floor(
        (_revenue() - F.col("p_retailprice") * F.col("l_quantity")) * 10000
        + F.lit(0.5)
    ).cast("bigint")
    return joined.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("bigint").alias("o_year"),
    ).agg(
        F.round(F.sum(amount_i).cast("bigint") / 10000.0, 2).alias("sum_profit")
    )


@register(
    "q10_returned_items",
    oracle="""
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(FLOOR(
                   l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT))
                   AS BIGINT) / 10000.0 AS revenue,
               ROUND(c_acctbal, 2) AS c_acctbal, n_name
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    doc=(
        "TPC-H Q10 shape (returned-item reporting): quarter + returnflag "
        "filters land in the two fact scans (PushedFilters), nation "
        "broadcasts, and the top-20 is revenue-ranked with a c_custkey "
        "tie-break so LIMIT is deterministic. TakeOrderedAndProject keeps "
        "the top-k merge driver-light regardless of group count. Revenue "
        "is summed as exact 1/10000ths (bigint) then scaled back WITHOUT "
        "re-rounding: float summation order differs between engines, and "
        "with this many groups one WILL land on a round-half boundary "
        "(Spark rounds the shortest decimal repr HALF_UP, DuckDB rounds "
        "the raw double — 307843.595 goes .60 vs .59). Same bigint / "
        "same constant divides to the identical double everywhere."
    ),
    tags=("tpch", "join", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o, li, n = _t(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    joined = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1996-04-01")
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    exact_rev = F.sum(F.floor(_revenue() * 10000 + 0.5).cast("long")) / 10000.0
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(exact_rev.alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q12_priority_classes",
    oracle="""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_linestatus
    """,
    doc=(
        "TPC-H Q12 shape (shipping-priority classes; grouped by "
        "l_linestatus since the trimmed schema has no l_shipmode): "
        "year-filtered fact join + two complementary conditional counts "
        "in one aggregate. Integer CASE sums are CAST to BIGINT in the "
        "oracle — DuckDB widens integer SUM to HUGEINT, which breaks the "
        "cross-engine value hash otherwise."
    ),
    tags=("tpch", "join", "aggregation"),
)
def q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, li = _t(spark, sf_dir, "orders", "lineitem")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = li.filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).join(o, li.l_orderkey == o.o_orderkey)
    return joined.groupBy("l_linestatus").agg(
        F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
    )


@register(
    "q13_order_count_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                 AND o.o_orderpriority <> '5-LOW'
            GROUP BY c.c_custkey
        ) c_orders
        GROUP BY c_count
    """,
    doc=(
        "TPC-H Q13 shape (customer order-count distribution): the filter "
        "lives in the LEFT JOIN's ON clause (filtering WHERE would turn "
        "the join inner and silently drop zero-order customers — the "
        "classic outer-join bug), then aggregate-of-aggregate: per-key "
        "count, histogram of counts. COUNT(col) counts non-null matches "
        "only, so unmatched customers land in the c_count=0 bucket on "
        "both engines."
    ),
    tags=("tpch", "join", "outer", "aggregation"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        c.join(
            o.filter(F.col("o_orderpriority") != "5-LOW"),
            c.c_custkey == o.o_custkey,
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q14_promo_revenue",
    oracle="""
        SELECT ROUND(
            100.0 * SUM(CASE WHEN p_type = 'PROMO'
                             THEN l_extendedprice * (1 - l_discount)
                             ELSE 0 END)
            / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
    doc=(
        "TPC-H Q14 shape (promotion-revenue share): one month of the fact "
        "(pushed-down range), part broadcast, conditional ratio in a "
        "single global aggregate — no grouping shuffle at all, partials "
        "reduce to one row."
    ),
    tags=("tpch", "join", "aggregation"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, p = _t(spark, sf_dir, "lineitem", "part")
    joined = li.filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    ).join(F.broadcast(p.select("p_partkey", "p_type")), li.l_partkey == F.col("p_partkey"))
    promo = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(0.0)
    return joined.agg(
        F.round(100.0 * F.sum(promo) / F.sum(_revenue()), 4).alias("promo_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
        SELECT ROUND(CAST(SUM(CAST(FLOOR(l_extendedprice * 10000 + 0.5)
                   AS BIGINT)) AS BIGINT) / 10000.0 / 7.0, 2) AS avg_yearly
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#11'
          AND l.l_quantity < (
            SELECT 0.2 * AVG(l2.l_quantity)
            FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
          )
    """,
    doc=(
        "TPC-H Q17 shape (small-quantity-order revenue): correlated "
        "scalar subquery — the oracle states it correlated; the Spark "
        "builder is the DECORRELATED form Catalyst itself would produce: "
        "per-part AVG as a broadcast dimension joined back, then the "
        "threshold filter. Per-part averages are corpus-wide aggregates "
        "O(|parts|), broadcastable at any fact scale."
    ),
    tags=("tpch", "join", "subquery"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, p = _t(spark, sf_dir, "lineitem", "part")
    brand_parts = p.filter(F.col("p_brand") == "Brand#11").select("p_partkey")
    thresholds = (
        li.groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg((0.2 * F.avg("l_quantity")).alias("qty_threshold"))
    )
    return (
        li.join(F.broadcast(brand_parts), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(thresholds), li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(
                    F.floor(F.col("l_extendedprice") * 10000 + F.lit(0.5)).cast(
                        "bigint"
                    )
                ).cast("bigint")
                / 10000.0
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


@register(
    "q18_large_volume_customers",
    oracle="""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               ROUND(o_totalprice, 2) AS o_totalprice,
               ROUND(SUM(l_quantity), 2) AS total_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
        )
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    doc=(
        "TPC-H Q18 shape (large-volume customers): IN over a grouped "
        "HAVING = semi join against an aggregate (the qualifying-orders "
        "set is tiny after HAVING, so it broadcasts), then the detail "
        "rollup and a deterministic top-100 (totalprice desc, orderkey "
        "tie-break)."
    ),
    tags=("tpch", "join", "semi", "topk"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 250)
        .select("l_orderkey")
    )
    qualified = o.join(
        F.broadcast(big_orders), o.o_orderkey == big_orders.l_orderkey, "left_semi"
    )
    joined = qualified.join(c, qualified.o_custkey == c.c_custkey).join(
        li, qualified.o_orderkey == li.l_orderkey
    )
    return (
        joined.groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
        SELECT ROUND(CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                   * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0, 2)
                   AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    doc=(
        "TPC-H Q19 shape (disjunctive predicate join): three OR branches "
        "mixing part attributes and lineitem attributes. The join stays a "
        "single equi hash join on partkey with the disjunction evaluated "
        "as a post-join filter; the branch predicates that touch only one "
        "side (brand/size, quantity hull) are inferred down to their "
        "scans by Catalyst's constraint propagation."
    ),
    tags=("tpch", "join", "filter"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, p = _t(spark, sf_dir, "lineitem", "part")
    joined = li.join(
        F.broadcast(p.select("p_partkey", "p_brand", "p_size")),
        li.l_partkey == F.col("p_partkey"),
    )
    branch = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#21")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return joined.filter(branch).agg(
        F.round(
            F.sum(F.floor(_revenue() * 10000 + F.lit(0.5)).cast("bigint")).cast(
                "bigint"
            )
            / 10000.0,
            2,
        ).alias("revenue")
    )


@register(
    "q21_waiting_supplier",
    oracle="""
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_5'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    doc=(
        "TPC-H Q21 shape (suppliers who kept orders waiting; 'late' := "
        "shipped >90 days after order date since the trimmed schema has "
        "no commit/receipt dates): the suite's hardest correlation — an "
        "EXISTS and a NOT EXISTS on the same key. Spark form: one "
        "LEFT SEMI (another supplier participated) and one LEFT ANTI "
        "(no OTHER supplier was late) against per-order supplier "
        "summaries, both aggregate-sized and broadcastable."
    ),
    tags=("tpch", "join", "semi", "anti"),
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s, li, o, n = _t(spark, sf_dir, "supplier", "lineitem", "orders", "nation")
    late = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    base = (
        late.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(
            F.broadcast(n.filter(F.col("n_name") == "NATION_5")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    ).distinct()
    late_others = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    ).distinct()
    with_other = base.join(
        others,
        (base.l_orderkey == F.col("o2_orderkey"))
        & (base.l_suppkey != F.col("o2_suppkey")),
        "left_semi",
    )
    sole_late = with_other.join(
        late_others,
        (with_other.l_orderkey == F.col("o3_orderkey"))
        & (with_other.l_suppkey != F.col("o3_suppkey")),
        "left_anti",
    )
    return (
        sole_late.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@register(
    "q22_idle_customers",
    oracle="""
        SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
               ROUND(CAST(SUM(CAST(FLOOR(c_acctbal * 10000 + 0.5) AS BIGINT))
                     AS BIGINT) / 10000.0, 2) AS totacctbal
        FROM customer c
        WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
          AND c_acctbal > (
            SELECT AVG(c_acctbal) FROM customer
            WHERE c_acctbal > 0.0 AND c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
          )
          AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-07-01'
          )
        GROUP BY c_nationkey
    """,
    doc=(
        "TPC-H Q22 shape (global-sales opportunity; country code := "
        "c_nationkey since the trimmed schema has no c_phone): a global "
        "scalar subquery (the positive-balance average — one row, "
        "broadcast via cross join) plus a NOT EXISTS anti join against "
        "RECENT orders (every fixture customer has some order, so the "
        "idleness cutoff keeps the anti join meaningful). The anti join "
        "shuffles only custkeys; the scalar threshold never touches the "
        "driver."
    ),
    tags=("tpch", "join", "anti", "subquery"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = _t(spark, sf_dir, "customer", "orders")
    cohort = c.filter(F.col("c_nationkey").isin(0, 1, 2, 3, 4, 5, 6))
    avg_bal = cohort.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cohort.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            o.filter(F.col("o_orderdate") >= "2000-07-01"),
            cohort.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(
                F.sum(
                    F.floor(F.col("c_acctbal") * 10000 + F.lit(0.5)).cast("bigint")
                ).cast("bigint")
                / 10000.0,
                2,
            ).alias("totacctbal"),
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(SUM(CAST(FLOOR(
                       l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT))
                       AS BIGINT) / 10000.0 AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc=(
        "TPC-H Q15 shape (top supplier): a quarter's per-supplier revenue "
        "aggregate, then the rows equal to its own MAX — a scalar "
        "subquery OVER an aggregate, which Catalyst executes as a 1-row "
        "broadcast filter over the reused revenue subtree (ReuseExchange "
        "computes the aggregate once). Revenue is summed as exact bigint "
        "1/10000ths: with float sums the argmax itself could flip between "
        "engines when two suppliers are within a ulp."
    ),
    tags=("tpch", "aggregation", "subquery"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    s, li = _t(spark, sf_dir, "supplier", "lineitem")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            (F.sum(F.floor(_revenue() * 10000 + 0.5).cast("long")) / 10000.0).alias(
                "total_revenue"
            )
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
        WITH cost AS (
            SELECT l_partkey, l_suppkey,
                   CAST(MIN(CAST(ROUND(l_extendedprice / l_quantity * 100, 0)
                                 AS BIGINT)) AS BIGINT) AS unit_cost_cents
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            JOIN region ON r_regionkey = n_regionkey
            WHERE r_name = 'EUROPE'
            GROUP BY 1, 2
        )
        SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name,
               c.unit_cost_cents
        FROM part p
        JOIN cost c ON c.l_partkey = p.p_partkey
        JOIN supplier s ON s.s_suppkey = c.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE p.p_size = 15
          AND c.unit_cost_cents = (
            SELECT MIN(c2.unit_cost_cents) FROM cost c2
            WHERE c2.l_partkey = p.p_partkey
          )
        ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
        LIMIT 10
    """,
    doc=(
        "TPC-H Q2 shape (minimum-cost supplier; supply cost := the "
        "supplier's best observed unit price in lineitem, since the "
        "trimmed schema has no partsupp): the defining feature is the "
        "CORRELATED MIN subquery — 'the supplier(s) achieving the per-part "
        "minimum'. The oracle states it correlated; the Spark builder is "
        "the decorrelated plan Catalyst itself produces: the per-part MIN "
        "is a second aggregate over the SAME cost subtree, equi-joined "
        "back on (partkey, min) — ReuseExchange computes cost once. The "
        "region filter prunes the supplier side BEFORE the fact aggregate; "
        "top-10 fully tie-broken for the hash gate."
    ),
    tags=("tpch", "join", "subquery", "topk"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, s, n, r, p = _t(
        spark, sf_dir, "lineitem", "supplier", "nation", "region", "part"
    )
    euro_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.join(F.broadcast(euro_supp.select("s_suppkey")),
                li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100, 0)
                .cast("long")
            ).alias("unit_cost_cents")
        )
    )
    min_cost = cost.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("unit_cost_cents").alias("min_cost")
    )
    return (
        cost.join(
            min_cost,
            (cost.l_partkey == F.col("mk"))
            & (cost.unit_cost_cents == F.col("min_cost")),
        )
        .join(F.broadcast(p.filter(F.col("p_size") == 15)),
              cost.l_partkey == p.p_partkey)
        .join(F.broadcast(euro_supp), cost.l_suppkey == F.col("s_suppkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                "unit_cost_cents")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(10)
    )


@register(
    "q11_important_parts",
    oracle="""
        WITH value AS (
            SELECT l_partkey,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS value_cents
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            WHERE n_name = 'NATION_9'
            GROUP BY 1
        )
        SELECT l_partkey AS p_partkey, value_cents
        FROM value
        WHERE value_cents > (
            SELECT CAST(SUM(value_cents) * 0.001 AS BIGINT) FROM value
        )
        ORDER BY value_cents DESC, p_partkey
    """,
    doc=(
        "TPC-H Q11 shape (important stock; supply value := one nation's "
        "shipped extendedprice per part, since the trimmed schema has no "
        "partsupp availqty): HAVING-against-a-global-fraction — the "
        "threshold is a scalar subquery over the SAME aggregate the rows "
        "come from. Spark form: one grouped aggregate, its one-row total "
        "cross-joined back (broadcast), ReuseExchange sharing the "
        "aggregate subtree. Values in exact bigint cents so the >-cutoff "
        "cannot flip on float summation order between engines."
    ),
    tags=("tpch", "aggregation", "subquery"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, s, n = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    nation_supp = (
        s.join(
            F.broadcast(n.filter(F.col("n_name") == "NATION_9")),
            s.s_nationkey == n.n_nationkey,
        ).select("s_suppkey")
    )
    value = (
        li.join(F.broadcast(nation_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
             .alias("value_cents"))
    )
    threshold = value.agg(
        (F.sum("value_cents") * 0.001).cast("long").alias("cutoff")
    )
    return (
        value.crossJoin(F.broadcast(threshold))
        .filter(F.col("value_cents") > F.col("cutoff"))
        .select(F.col("l_partkey").alias("p_partkey"), "value_cents")
        .orderBy(F.desc("value_cents"), "p_partkey")
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_type NOT LIKE 'PROMO%'
          AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc=(
        "TPC-H Q16 shape (parts/supplier relationship; the supplier-part "
        "catalog := observed lineitem pairs, complaint filter := negative "
        "account balance, since the trimmed schema has no partsupp or "
        "s_comment): NOT IN over a non-nullable key = left-anti join "
        "against the (tiny, broadcast) excluded-supplier list; the "
        "negated brand / NOT LIKE / IN(size list) predicates all stay on "
        "the part dimension and prune it BEFORE its broadcast join into "
        "the fact; exact COUNT(DISTINCT) shuffles only the surviving "
        "(brand,type,size,suppkey) tuples."
    ),
    tags=("tpch", "join", "anti", "aggregation"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, p, s = _t(spark, sf_dir, "lineitem", "part", "supplier")
    parts = p.filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(parts), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(bad_supp), li.l_suppkey == F.col("s_suppkey"),
              "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_part_promotion",
    oracle="""
        SELECT s_name, s_acctbal
        FROM supplier JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_9'
          AND s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
              )
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_suppkey
            HAVING SUM(l_quantity) > 300
          )
        ORDER BY s_name
    """,
    doc=(
        "TPC-H Q20 shape (potential part promotion; 'excess stock' := "
        "shipped more than a threshold quantity of the LIKE-named parts "
        "in the year, since the trimmed schema has no partsupp availqty): "
        "NESTED semi joins — a LIKE-filtered part list semi-filters the "
        "fact, a HAVING aggregate over that filtered fact semi-filters "
        "the suppliers. Both inner sets are tiny after their filters and "
        "broadcast; the supplier probe side is never widened (semi join, "
        "no dedup needed). The year predicate lands in PushedFilters."
    ),
    tags=("tpch", "join", "semi", "subquery"),
)
def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, p, s, n = _t(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    small_parts = p.filter(F.col("p_name").like("small%")).select("p_partkey")
    heavy_shippers = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(F.broadcast(small_parts), li.l_partkey == F.col("p_partkey"),
              "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_suppkey")
    )
    return (
        s.join(
            F.broadcast(n.filter(F.col("n_name") == "NATION_9")),
            s.s_nationkey == n.n_nationkey,
        )
        .join(F.broadcast(heavy_shippers), s.s_suppkey == F.col("l_suppkey"),
              "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
