"""Customer/behavioral analytics operators (SURVEY §2.6 extension
surface): cohort revenue retention, RFM segmentation, market-basket
affinity — the standard decision-support queries a warehouse user runs
daily, each as one declarative Catalyst tree with a DuckDB oracle.

Determinism rules applied throughout (they are what make these
oracle-checkable): money sums as exact bigint cents (float summation
order differs between engines), NTILE orderings tie-broken on the key,
top-k fully tie-broken.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from weather_stream_processor_spark.registry import register
from weather_stream_processor_spark.sources import load_table


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100, 0).cast("long")


@register(
    "cohort_revenue_retention",
    oracle="""
        WITH firsts AS (
            SELECT o_custkey,
                   date_trunc('month', MIN(o_orderdate)) AS cohort_month
            FROM orders GROUP BY o_custkey
        )
        SELECT f.cohort_month,
               CAST(date_diff('month', f.cohort_month,
                              date_trunc('month', o.o_orderdate)) AS BIGINT)
                   AS months_since,
               COUNT(DISTINCT o.o_custkey) AS n_active,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) / 100.0 AS revenue
        FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
        GROUP BY 1, 2
    """,
    doc=(
        "COHORT REVENUE RETENTION: customers grouped by first-order month, "
        "revenue and active count tracked by months-since-acquisition — "
        "the LTV curve. The first-order table is a per-customer aggregate "
        "(|customers|-sized, broadcastable); the fact join and the final "
        "rollup both shuffle on custkey-derived keys. Revenue sums exact "
        "bigint cents: with ~thousands of (cohort, age) cells, float "
        "summation order WILL hit a rounding boundary somewhere."
    ),
    tags=("analytics", "cohort", "aggregation"),
)
def cohort_revenue_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_month")
    )
    joined = o.join(F.broadcast(firsts), "o_custkey")
    months_since = F.months_between(
        F.date_trunc("month", F.col("o_orderdate")), F.col("cohort_month")
    ).cast("bigint")
    return joined.groupBy(
        "cohort_month", months_since.alias("months_since")
    ).agg(
        F.countDistinct("o_custkey").alias("n_active"),
        (F.sum(_cents("o_totalprice")) / 100.0).alias("revenue"),
    )


@register(
    "rfm_segments",
    oracle="""
        WITH agg AS (
            SELECT o_custkey,
                   MAX(o_orderdate) AS last_order,
                   COUNT(*) AS frequency,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS monetary_cents
            FROM orders GROUP BY o_custkey
        )
        SELECT o_custkey AS c_custkey,
               NTILE(5) OVER (ORDER BY last_order, o_custkey) AS r_score,
               NTILE(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
               NTILE(5) OVER (ORDER BY monetary_cents, o_custkey) AS m_score
        FROM agg
    """,
    doc=(
        "RFM SEGMENTATION: quintile scores for recency / frequency / "
        "monetary per customer. Every NTILE ordering tie-breaks on the "
        "customer key — without that, equal metric values land in "
        "engine-dependent quintiles and the result is not reproducible "
        "(same reason df.sample is banned from the sampling operators). "
        "Scale form: exact_global_ntiles (see operators/windows.py) — "
        "coarse percentile cutoffs + PARTITIONED rank windows + collected "
        "per-bucket offsets, all three metrics' cutoffs and counts in one "
        "aggregate pass each over the persisted per-customer aggregate. "
        "Bit-for-bit NTILE semantics; no unpartitioned WindowExec. "
        "Recency ranks on unix_micros(last_order) — strictly monotonic in "
        "the timestamp, numeric for percentile cutoffs."
    ),
    tags=("analytics", "window", "segmentation"),
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_stream_processor_spark.operators.windows import exact_global_ntiles

    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_custkey").agg(
        F.unix_micros(F.max("o_orderdate").cast("timestamp")).alias("last_order_us"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(_cents("o_totalprice")).alias("monetary_cents"),
    )
    # persisted: exact_global_ntiles makes two tiny-output passes (cutoffs,
    # per-bucket counts) before the final one — don't re-run the groupBy.
    agg = agg.persist()
    scored = exact_global_ntiles(
        agg,
        [
            (5, ["last_order_us", "o_custkey"], "r_score"),
            (5, ["frequency", "o_custkey"], "f_score"),
            (5, ["monetary_cents", "o_custkey"], "m_score"),
        ],
    )
    return scored.select(
        F.col("o_custkey").alias("c_custkey"), "r_score", "f_score", "m_score"
    )


@register(
    "brand_affinity_pairs",
    oracle="""
        WITH ob AS (
            SELECT DISTINCT l_orderkey, p_brand
            FROM lineitem JOIN part ON p_partkey = l_partkey
        )
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               COUNT(*) AS n_orders
        FROM ob a
        JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY 1, 2
        ORDER BY n_orders DESC, brand_a, brand_b
        LIMIT 20
    """,
    doc=(
        "MARKET-BASKET AFFINITY (frequent-itemset support, pairs): brands "
        "co-occurring in an order, top 20 by support with full "
        "tie-breaks. The DISTINCT (order, brand) projection collapses the "
        "fact to basket-grain BEFORE the self-join, so the quadratic step "
        "is per-basket over |distinct brands in basket| (tiny, bounded by "
        "the 25-brand dimension) — the same collapse-then-pair shape as "
        "the shingle inverted index in dedup. Part is broadcast into the "
        "fact scan."
    ),
    tags=("analytics", "join", "basket"),
)
def brand_affinity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, p = (load_table(spark, sf_dir, t) for t in ("lineitem", "part"))
    ob = (
        li.join(F.broadcast(p.select("p_partkey", "p_brand")), li.l_partkey == F.col("p_partkey"))
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a = ob.select(F.col("l_orderkey").alias("k"), F.col("p_brand").alias("brand_a"))
    b = ob.select(F.col("l_orderkey").alias("k2"), F.col("p_brand").alias("brand_b"))
    return (
        a.join(b, (F.col("k") == F.col("k2")) & (F.col("brand_a") < F.col("brand_b")))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("brand_a"), F.asc("brand_b"))
        .limit(20)
    )


@register(
    "daily_user_accession",
    oracle="""
        WITH d AS (
            SELECT CAST(ts AS DATE) AS day, user_id FROM events
        ),
        active AS (
            SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active
            FROM d GROUP BY day
        ),
        firsts AS (
            SELECT user_id, MIN(day) AS day FROM d GROUP BY user_id
        ),
        news AS (
            SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new FROM firsts GROUP BY day
        )
        SELECT a.day, a.n_active,
               COALESCE(n.n_new, 0) AS n_new,
               CAST(SUM(COALESCE(n.n_new, 0)) OVER (
                   ORDER BY a.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_users
        FROM active a LEFT JOIN news n USING (day)
    """,
    doc=(
        "Daily active / new / cumulative users — the DAU & accession "
        "curve every growth dashboard starts from. Actives are an exact "
        "distinct count per day (partial aggregation on (day, user) "
        "first, so the shuffle carries one row per active pair, not per "
        "event); new users come from the per-user MIN(day) first-seen "
        "aggregate; the cumulative sum runs over the DAY SPINE — "
        "cardinality O(days), thousands of rows at any corpus size, so "
        "the unpartitioned window is spine-sized by construction, never "
        "data-sized (same argument as forward_fill_hourly). At 100 TB "
        "the per-user first-seen table is the one big shuffle and it is "
        "keyed, mergeable, and incrementally maintainable."
    ),
    tags=("analytics", "timeseries"),
)
def daily_user_accession(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(F.to_date("ts").alias("day"), "user_id")
    active = d.groupBy("day").agg(F.countDistinct("user_id").alias("n_active"))
    firsts = d.groupBy("user_id").agg(F.min("day").alias("day"))
    news = firsts.groupBy("day").agg(F.count(F.lit(1)).alias("n_new"))
    joined = active.join(news, "day", "left").withColumn(
        "n_new", F.coalesce("n_new", F.lit(0).cast("bigint"))
    )
    spine = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        "day",
        "n_active",
        "n_new",
        F.sum("n_new").over(spine).cast("bigint").alias("cum_users"),
    )
