"""Time-series operators over the `events` stream-analog table.

The reference's implicit time axis (hourly forecast buckets,
weather_stream.py:129) generalizes to the standard warehouse time-series
toolkit: a generated time spine + gap-filled aggregates. The spine is
`sequence()` exploded from the data's own min/max bounds — a one-row
broadcast, never a driver-side loop, so the same plan holds at any scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_stream_processor_spark.operators._normal_tail import (
    normal_sf_signed_sql,
    normal_sf_sql,
)
from weather_stream_processor_spark.registry import register
from weather_stream_processor_spark.sources import load_table


@register(
    "time_spine_gap_fill",
    oracle="""
        WITH e AS (SELECT * FROM events WHERE event_type = 'error'),
        h AS (
            SELECT date_trunc('hour', ts) AS hour,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 5) AS total_value
            FROM e GROUP BY 1
        ),
        b AS (
            SELECT date_trunc('hour', MIN(ts)) AS h0,
                   date_trunc('hour', MAX(ts)) AS h1
            FROM e
        ),
        spine AS (
            SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
            FROM b
        )
        SELECT spine.hour,
               COALESCE(h.n_events, 0) AS n_events,
               COALESCE(h.total_value, 0.0) AS total_value
        FROM spine LEFT JOIN h USING (hour)
    """,
    doc=(
        "Gap-filled hourly series: a time spine generated in-plan "
        "(sequence() between the data's own min/max hour, exploded from a "
        "one-row aggregate) left-joined onto the hourly aggregate, empty "
        "hours coalesced to zero. The spine side is O(hours) regardless of "
        "data volume and broadcasts; the aggregate is the usual "
        "partial+final pair — the whole gap-fill adds zero extra shuffles "
        "over the plain hourly rollup. This is the batch twin of the "
        "streaming engine's closed-window emission."
    ),
    tags=("timeseries", "aggregation", "spine"),
)
def time_spine_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 5).alias("total_value"),
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    return spine.join(F.broadcast(hourly), "hour", "left").select(
        "hour",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
    )


@register(
    "forward_fill_hourly",
    oracle="""
        WITH e AS (SELECT * FROM events WHERE event_type = 'error'),
        h AS (
            SELECT date_trunc('hour', ts) AS hour,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 5) AS total_value
            FROM e GROUP BY 1
        ),
        b AS (
            SELECT date_trunc('hour', MIN(ts)) AS h0,
                   date_trunc('hour', MAX(ts)) AS h1
            FROM e
        ),
        spine AS (
            SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
            FROM b
        ),
        filled AS (
            SELECT spine.hour,
                   COALESCE(h.n_events, 0) AS n_events,
                   h.total_value
            FROM spine LEFT JOIN h USING (hour)
        )
        SELECT hour, n_events,
               last_value(total_value IGNORE NULLS) OVER (
                   ORDER BY hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_value
        FROM filled
    """,
    doc=(
        "FORWARD FILL (last observation carried forward): empty spine "
        "hours inherit the most recent non-null hourly value via "
        "last(col, ignorenulls=True) over an ordered frame — the standard "
        "completion of gap-fill for state-like series (sensor readings, "
        "account balances; the weather analog: 'latest forecast stands "
        "until replaced'). The unpartitioned window is O(hours) — spine-"
        "sized, NOT data-sized — so the single-reducer sort is bounded "
        "regardless of corpus TB; partition by entity key when filling "
        "per-entity series and it shares the aggregate's shuffle."
    ),
    tags=("timeseries", "window", "spine"),
)
def forward_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    filled = time_spine_gap_fill(spark, sf_dir).select(
        "hour",
        "n_events",
        F.when(F.col("n_events") > 0, F.col("total_value")).alias("raw_value"),
    )
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return filled.select(
        "hour",
        "n_events",
        F.last("raw_value", ignorenulls=True).over(w).alias("filled_value"),
    )


@register(
    "weekly_retention",
    oracle="""
        WITH active AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS week
            FROM events
        ),
        cohort AS (
            SELECT a.week,
                   COUNT(*) AS n_active,
                   CAST(SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_retained
            FROM active a
            LEFT JOIN active b
              ON b.user_id = a.user_id
             AND b.week = a.week + INTERVAL 7 DAY
            GROUP BY a.week
        )
        SELECT week, n_active, n_retained,
               ROUND(n_retained * 1.0 / n_active, 6) AS retention_rate
        FROM cohort
    """,
    doc=(
        "WEEKLY COHORT RETENTION: distinct (user, week) activity "
        "self-joined onto week+1 — the canonical engagement query over an "
        "event stream. The distinct aggregate collapses the fact table to "
        "|users|x|weeks| rows BEFORE the self-join, so the join sides are "
        "activity-grid-sized, not event-sized; both the dedup and the "
        "join shuffle on user_id and share partitioning. At 100 TB the "
        "distinct is the only event-scale stage and is a map-side-partial "
        "aggregate."
    ),
    tags=("timeseries", "join", "retention"),
)
def weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    active = ev.select("user_id", F.date_trunc("week", "ts").alias("week")).distinct()
    a = active.alias("a")
    b = active.alias("b")
    joined = a.join(
        b,
        (F.col("b.user_id") == F.col("a.user_id"))
        & (F.col("b.week") == F.col("a.week") + F.expr("INTERVAL 7 DAYS")),
        "left",
    )
    return (
        joined.groupBy(F.col("a.week").alias("week"))
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum(F.when(F.col("b.user_id").isNotNull(), 1).otherwise(0)).alias(
                "n_retained"
            ),
        )
        .select(
            "week",
            "n_active",
            "n_retained",
            F.round(F.col("n_retained") / F.col("n_active"), 6).alias("retention_rate"),
        )
    )


@register(
    "funnel_signup_view_purchase",
    oracle="""
        WITH s AS (
            SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = 'signup' GROUP BY user_id
        ),
        v AS (
            SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN s USING (user_id)
            WHERE e.event_type = 'view' AND e.ts > s.t1
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN v USING (user_id)
            WHERE e.event_type = 'purchase' AND e.ts > v.t2
            GROUP BY e.user_id
        )
        SELECT (SELECT COUNT(*) FROM s) AS n_signed_up,
               (SELECT COUNT(*) FROM v) AS n_viewed_after,
               (SELECT COUNT(*) FROM p) AS n_purchased_after
    """,
    doc=(
        "ORDERED FUNNEL (signup -> view -> purchase): each stage is the "
        "earliest qualifying event strictly after the previous stage's "
        "time — min-aggregate per user, then an equi-join feeding the "
        "next stage's filter. Three shuffles, all on user_id (shared "
        "partitioning), each stage's frame is |users| rows not |events|. "
        "This is the strict-ordering funnel; a windowed-deadline variant "
        "adds `AND e.ts < t_prev + INTERVAL ...` to each stage with the "
        "same plan."
    ),
    tags=("timeseries", "funnel", "join"),
)
def funnel_signup_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def stage(event_type: str, prev: DataFrame | None, prev_col: str, out_col: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == event_type)
        if prev is not None:
            e = e.join(prev, "user_id").filter(F.col("ts") > F.col(prev_col))
        return e.groupBy("user_id").agg(F.min("ts").alias(out_col))

    s = stage("signup", None, "", "t1")
    v = stage("view", s, "t1", "t2")
    p = stage("purchase", v, "t2", "t3")
    counts = [
        df.agg(F.count(F.lit(1)).alias(name))
        for df, name in ((s, "n_signed_up"), (v, "n_viewed_after"), (p, "n_purchased_after"))
    ]
    return counts[0].crossJoin(counts[1]).crossJoin(counts[2])


@register(
    "event_transition_matrix",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        )
        SELECT event_type, next_type, COUNT(*) AS n_transitions
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    """,
    doc=(
        "EVENT TRANSITION MATRIX (Markov adjacency counts): lead() per "
        "user over event time pairs each event with its successor, then "
        "one grouped count over (from, to) — the sequence-analytics "
        "primitive behind next-action prediction features and anomalous-"
        "flow detection. One shuffle on user_id for the window + one "
        "|types|^2-group aggregate; at any scale the output is "
        "O(|event_types|^2)."
    ),
    tags=("timeseries", "window", "sequence"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@register(
    "rolling_zscore_anomalies",
    oracle="""
        WITH scored AS (
            SELECT event_id, user_id, ts, value,
                   AVG(value) OVER w AS mu,
                   stddev_samp(value) OVER w AS sd,
                   COUNT(*) OVER w AS n_window
            FROM events
            WINDOW w AS (
                PARTITION BY event_type
                ORDER BY ts NULLS LAST, event_id NULLS LAST
                ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING
            )
        )
        SELECT event_id, user_id, ts,
               ROUND(value, 5) AS value,
               ROUND((value - mu) / sd, 4) AS zscore
        FROM scored
        WHERE n_window >= 20 AND sd > 0
          AND ABS((value - mu) / sd) > 3
    """,
    doc=(
        "ROLLING Z-SCORE anomaly detection: each event scored against the "
        "mean/std of the PRECEDING 50 events of its type (frame ends at "
        "1 PRECEDING — the current value never contaminates its own "
        "baseline), flagged at |z| > 3 with a 20-event warm-up. One "
        "shuffle on event_type + one sort; mean/std over a sliding ROWS "
        "frame are incremental per partition. The batch twin of a "
        "streaming alerting rule (the streaming form is "
        "applyInPandasWithState keeping running moments per key — same "
        "math, O(1) state)."
    ),
    tags=("timeseries", "window", "anomaly"),
)
def rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    # Explicit NULLS LAST on both engines: Spark asc() defaults nulls
    # first, DuckDB defaults NULLS LAST — a NULL ts would silently shift
    # every 50-row frame between the two otherwise.
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.asc_nulls_last("ts"), F.asc_nulls_last("event_id"))
        .rowsBetween(-50, -1)
    )
    scored = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("n_window"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        scored.filter((F.col("n_window") >= 20) & (F.col("sd") > 0) & (F.abs(z) > 3))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.round("value", 5).alias("value"),
            F.round(z, 4).alias("zscore"),
        )
    )


@register(
    "funnel_conversion",
    oracle="""
        WITH v AS (
            SELECT user_id, MIN(ts) AS t_view
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS t_click
            FROM events e JOIN v ON v.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.ts >= v.t_view
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS t_purchase
            FROM events e JOIN c ON c.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
            GROUP BY e.user_id
        )
        SELECT 'view' AS stage, 1 AS stage_order, COUNT(*) AS n_users FROM v
        UNION ALL
        SELECT 'click', 2, COUNT(*) FROM c
        UNION ALL
        SELECT 'purchase', 3, COUNT(*) FROM p
    """,
    doc=(
        "ORDERED FUNNEL (view -> click -> purchase): a user advances a "
        "stage only with an event AT OR AFTER their entry into the "
        "previous stage — the temporal ordering is the whole point (a "
        "user who purchased before ever viewing does not convert). Each "
        "stage is a keyed min-aggregate joined to the previous stage's "
        "per-user entry time; every shuffle keys on user_id so the three "
        "stages share partitioning, and each stage's input is pre-filtered "
        "to one event type at the scan."
    ),
    tags=("timeseries", "funnel", "analytics"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )

    def stage(df: DataFrame, name: str, order: int) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.lit(order).alias("stage_order"),
            F.count(F.lit(1)).alias("n_users"),
        ).select("stage", "stage_order", "n_users")

    return (
        stage(views, "view", 1)
        .unionAll(stage(clicks, "click", 2))
        .unionAll(stage(purchases, "purchase", 3))
    )


@register(
    "ohlc_bars_15min",
    oracle="""
        WITH base AS (
            SELECT event_type,
                   epoch_us(ts) // 900000000 AS bar,
                   ts, event_id, value
            FROM events
        ),
        ranked AS (
            SELECT *,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type, bar ORDER BY ts, event_id
                   ) AS rn_a,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type, bar ORDER BY ts DESC, event_id DESC
                   ) AS rn_d
            FROM base
        )
        SELECT event_type,
               make_timestamp(bar * 900000000) AS bar_start,
               MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(AVG(value), 6) AS mean_value
        FROM ranked
        GROUP BY event_type, bar
    """,
    doc=(
        "Time-series DOWNSAMPLING to 15-minute OHLC bars per event type — "
        "the resample/rollup every metrics store performs before charting "
        "or feature extraction. Open/close are made deterministic with "
        "row_number over (ts, event_id) both directions (first/last are "
        "otherwise partition-order-dependent — not reproducible); "
        "high/low/count/mean are plain aggregates. The two windows and "
        "the final groupBy all share the (event_type, bar) partitioning, "
        "so the whole operator is ONE shuffle; bars are dense integer "
        "keys derived by integer division on epoch-micros (identical "
        "truncation in Spark and DuckDB). At 100 TB this is the "
        "hierarchical-rollup building block: bars aggregate again into "
        "hours/days without touching raw events."
    ),
    tags=("timeseries", "window"),
)
def ohlc_bars_15min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.expr("unix_micros(ts) div 900000000").alias("bar"),
        "ts",
        "event_id",
        "value",
    )
    from pyspark.sql.window import Window

    wa = Window.partitionBy("event_type", "bar").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    wd = Window.partitionBy("event_type", "bar").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    ranked = base.withColumn("rn_a", F.row_number().over(wa)).withColumn(
        "rn_d", F.row_number().over(wd)
    )
    return (
        ranked.groupBy("event_type", "bar")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("mean_value"),
        )
        .select(
            "event_type",
            F.timestamp_micros(F.col("bar") * 900_000_000).alias("bar_start"),
            "open",
            "high",
            "low",
            "close",
            "n_events",
            "mean_value",
        )
    )


@register(
    "interval_merge_coverage",
    oracle="""
        WITH iv AS (
            SELECT user_id, event_id,
                   epoch_us(ts) // 1000000 AS s
            FROM events
        ),
        flags AS (
            SELECT user_id, s, s + 300 AS e, event_id,
                   CASE WHEN MAX(s + 300) OVER (
                            PARTITION BY user_id ORDER BY s, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                        ) IS NULL
                        OR s > MAX(s + 300) OVER (
                            PARTITION BY user_id ORDER BY s, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                        )
                   THEN 1 ELSE 0 END AS new_island
            FROM iv
        ),
        isl AS (
            SELECT user_id, s, e,
                   CAST(SUM(new_island) OVER (
                       PARTITION BY user_id ORDER BY s, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS island_id
            FROM flags
        ),
        merged AS (
            SELECT user_id, island_id,
                   MIN(s) AS m_start, MAX(e) AS m_end
            FROM isl GROUP BY user_id, island_id
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_intervals,
               CAST(SUM(m_end - m_start) AS BIGINT) AS coverage_sec,
               CAST(MAX(m_end - m_start) AS BIGINT) AS max_interval_sec
        FROM merged GROUP BY user_id
    """,
    doc=(
        "Gaps-and-islands INTERVAL MERGE: each event projects a 5-minute "
        "activity interval [ts, ts+300s); overlapping or touching "
        "intervals per user are merged (running-max-end vs next start — "
        "the classic island flag), then each user's merged islands roll "
        "up to interval count / total covered seconds / longest island. "
        "This is the coverage/uptime primitive (machine utilization, "
        "user active time, sensor online windows). All three windows and "
        "both aggregates share the user_id partitioning: ONE shuffle, "
        "per-user sorted scans, no global state — unchanged at 100 TB "
        "where user_id is the natural distribution key. Epoch seconds by "
        "integer division so Spark and DuckDB truncate identically."
    ),
    tags=("timeseries", "window", "session"),
)
def interval_merge_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.expr("unix_micros(ts) div 1000000").alias("s"),
    ).withColumn("e", F.col("s") + 300)
    order = Window.partitionBy("user_id").orderBy("s", "event_id")
    prev_max_end = F.max("e").over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flags = iv.withColumn(
        "new_island",
        F.when(prev_max_end.isNull() | (F.col("s") > prev_max_end), 1).otherwise(0),
    )
    isl = flags.withColumn(
        "island_id",
        F.sum("new_island")
        .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    merged = isl.groupBy("user_id", "island_id").agg(
        F.min("s").alias("m_start"), F.max("e").alias("m_end")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.col("m_end") - F.col("m_start")).alias("coverage_sec"),
        F.max(F.col("m_end") - F.col("m_start")).alias("max_interval_sec"),
    )


@register(
    "delta_event_compression",
    oracle="""
        WITH seq AS (
            SELECT event_type, value,
                   LAG(value) OVER w AS prev_value,
                   epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
            FROM events
            WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
        ),
        flags AS (
            SELECT event_type,
                   CASE WHEN gap_us IS NULL
                         OR abs(value - prev_value) > 0.5
                         OR gap_us > 3600000000
                        THEN 1 ELSE 0 END AS keep
            FROM seq
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(SUM(keep) AS BIGINT) AS n_kept,
               ROUND(SUM(keep) * 1.0 / COUNT(*), 6) AS keep_ratio
        FROM flags
        GROUP BY event_type
    """,
    doc=(
        "Delta compression of a sensor stream (per-series deadband): "
        "within each (user, event_type) series ordered by time, a reading "
        "survives iff it is the first, differs from its PREDECESSOR by "
        "more than eps=0.5, or follows a gap > 1h (heartbeat retention). "
        "This is the lag-based variant of swinging-door/deadband "
        "compression -- window-expressible, so it runs as one partitioned "
        "sort per series with zero extra shuffle beyond the keyed "
        "exchange; true deadband (delta vs last KEPT value) is inherently "
        "sequential and would need applyInPandasWithState, documented "
        "trade. Emits the per-type compression report (total/kept/ratio) "
        "a 100 TB telemetry pipeline uses to size its downsampled tier; "
        "epoch arithmetic is integer microseconds in both engines."
    ),
    tags=("timeseries", "compression"),
)
def delta_event_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    seq = ev.select(
        "event_type",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        (us - F.lag(us).over(w)).alias("gap_us"),
    )
    keep = (
        F.when(
            F.col("gap_us").isNull()
            | (F.abs(F.col("value") - F.col("prev_value")) > 0.5)
            | (F.col("gap_us") > 3_600_000_000),
            1,
        )
        .otherwise(0)
    )
    return (
        seq.select("event_type", keep.alias("keep"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("keep").alias("n_kept"),
            F.round(F.sum("keep") / F.count(F.lit(1)), 6).alias("keep_ratio"),
        )
    )


@register(
    "seasonal_trend_decompose",
    oracle="""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS hr, AVG(value) AS hm
            FROM events GROUP BY 1, 2
        ),
        trended AS (
            SELECT event_type, hr, hm,
                   AVG(hm) OVER (
                       PARTITION BY event_type ORDER BY hr
                       ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING
                   ) AS trend
            FROM hourly
        )
        SELECT event_type,
               CAST(EXTRACT(hour FROM hr) AS BIGINT) AS hour_of_day,
               CAST(COUNT(*) AS BIGINT) AS n_hours,
               ROUND(AVG(hm - trend), 6) AS seasonal_index
        FROM trended
        GROUP BY 1, 2
    """,
    doc=(
        "STL-lite seasonal decomposition of the sensor feed: hourly means "
        "per event type, a centered 24-point moving-average TREND over the "
        "hourly series, and the diurnal SEASONAL profile as the mean "
        "detrended residual per hour-of-day -- the classical "
        "moving-average decomposition, the baseline behind every "
        "seasonality-aware anomaly detector. Scale shape: the raw scan "
        "collapses to the hourly aggregate FIRST (spine-sized, O(types x "
        "hours)), so the ordered window and the final profile run over "
        "metadata-scale data; the only full-data pass is the initial "
        "map-side-combined groupBy. Partial frames at the series edges "
        "are averaged identically by both engines (frame = existing "
        "rows)."
    ),
    tags=("timeseries", "seasonality", "stats"),
)
def seasonal_trend_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.avg("value").alias("hm"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-12, 11)
    )
    trended = hourly.withColumn("trend", F.avg("hm").over(w))
    return (
        trended.groupBy(
            "event_type", F.hour("hr").cast("bigint").alias("hour_of_day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.round(F.avg(F.col("hm") - F.col("trend")), 6).alias(
                "seasonal_index"
            ),
        )
    )


_EWMA_ALPHA = 0.3
_EWMA_LAGS = 8


def _ewma_oracle() -> str:
    """Truncated-EWMA oracle: the identical weight literals and the same
    fixed-shape sum Spark builds, so values are bit-identical."""
    num, den = [], []
    for j in range(_EWMA_LAGS):
        wt = repr(_EWMA_ALPHA * (1 - _EWMA_ALPHA) ** j)
        x = "value" if j == 0 else f"LAG(value, {j}) OVER w"
        num.append(f"COALESCE({x}, 0.0) * {wt}")
        den.append(f"(CASE WHEN {x} IS NULL THEN 0.0 ELSE {wt} END)")
    return f"""
        WITH smoothed AS (
            SELECT event_id, event_type, value,
                   ({" + ".join(num)}) AS num,
                   ({" + ".join(den)}) AS den
            FROM events
            WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
        )
        SELECT event_id, event_type, value,
               ROUND(num / den, 6) AS ewma
        FROM smoothed
    """


@register(
    "ewma_truncated_smoothing",
    oracle=_ewma_oracle(),
    doc=(
        "Exponentially-weighted moving average per sensor series "
        "(alpha=0.3), truncated at 8 lags and renormalized over the "
        "weights actually present -- the window-expressible form of EWMA "
        "smoothing. True infinite-history EWMA is a sequential recurrence "
        "(needs applyInPandasWithState; streaming_record_breakers shows "
        "that pattern); truncating at K lags keeps it a partitioned "
        "window over (user, type) with ZERO extra shuffle and bounds the "
        "error by (1-a)^K < 6% of total weight. The 8 lag terms form a "
        "fixed expression tree with Python-injected weight literals, so "
        "Spark and DuckDB compute bit-identical doubles before the 6dp "
        "round."
    ),
    tags=("timeseries", "smoothing"),
)
def ewma_truncated_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(_EWMA_LAGS):
        wt = _EWMA_ALPHA * (1 - _EWMA_ALPHA) ** j
        x = F.col("value") if j == 0 else F.lag("value", j).over(w)
        num = num + F.coalesce(x, F.lit(0.0)) * F.lit(wt)
        den = den + F.when(x.isNull(), F.lit(0.0)).otherwise(F.lit(wt))
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.round(num / den, 6).alias("ewma"),
    )


@register(
    "linear_interpolate_hourly",
    oracle="""
        WITH e AS (SELECT * FROM events WHERE event_type = 'error'),
        h AS (
            SELECT date_trunc('hour', ts) AS hour,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 5) AS total_value
            FROM e GROUP BY 1
        ),
        b AS (
            SELECT date_trunc('hour', MIN(ts)) AS h0,
                   date_trunc('hour', MAX(ts)) AS h1
            FROM e
        ),
        spine AS (
            SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
            FROM b
        ),
        filled AS (
            SELECT spine.hour,
                   COALESCE(h.n_events, 0) AS n_events,
                   h.total_value AS raw
            FROM spine LEFT JOIN h USING (hour)
        ),
        ctx AS (
            SELECT hour, n_events, raw,
                   last_value(raw IGNORE NULLS) OVER wp AS prev_val,
                   last_value(CASE WHEN raw IS NOT NULL THEN hour END
                              IGNORE NULLS) OVER wp AS prev_hour,
                   first_value(raw IGNORE NULLS) OVER wf AS next_val,
                   first_value(CASE WHEN raw IS NOT NULL THEN hour END
                               IGNORE NULLS) OVER wf AS next_hour
            FROM filled
            WINDOW wp AS (ORDER BY hour
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wf AS (ORDER BY hour
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT hour, n_events,
               CASE
                   WHEN raw IS NOT NULL THEN raw
                   WHEN prev_val IS NOT NULL AND next_val IS NOT NULL THEN
                       ROUND(prev_val + (next_val - prev_val)
                             * date_diff('hour', prev_hour, hour)
                             / date_diff('hour', prev_hour, next_hour), 6)
                   ELSE COALESCE(prev_val, next_val)
               END AS filled_value
        FROM ctx
    """,
    doc=(
        "LINEAR interpolation over the gap-filled hourly spine: missing "
        "hours take prev + (next - prev) * elapsed/gap between the "
        "bracketing observations (edges fall back to nearest-observation "
        "fill) -- the measurement-series completion where forward-fill's "
        "step function misstates a continuously-varying signal; "
        "forward_fill_hourly remains the right tool for state-like "
        "series. Both bracketing scans are IGNORE NULLS frames over the "
        "spine (O(hours), never data-sized -- same bound as "
        "forward_fill_hourly); hour distances are integer date_diffs, "
        "and the interpolation expression tree is identical in both "
        "engines before the 6dp round."
    ),
    tags=("timeseries", "window", "spine"),
)
def linear_interpolate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    filled = time_spine_gap_fill(spark, sf_dir).select(
        "hour",
        "n_events",
        F.when(F.col("n_events") > 0, F.col("total_value")).alias("raw"),
    )
    wp = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    wf = Window.orderBy("hour").rowsBetween(0, Window.unboundedFollowing)
    obs_hour = F.when(F.col("raw").isNotNull(), F.col("hour"))
    ctx = filled.select(
        "hour",
        "n_events",
        "raw",
        F.last("raw", ignorenulls=True).over(wp).alias("prev_val"),
        F.last(obs_hour, ignorenulls=True).over(wp).alias("prev_hour"),
        F.first("raw", ignorenulls=True).over(wf).alias("next_val"),
        F.first(obs_hour, ignorenulls=True).over(wf).alias("next_hour"),
    )
    dh = (F.unix_micros("hour") - F.unix_micros("prev_hour")) / F.lit(3_600_000_000)
    gap = (F.unix_micros("next_hour") - F.unix_micros("prev_hour")) / F.lit(
        3_600_000_000
    )
    interp = F.round(
        F.col("prev_val") + (F.col("next_val") - F.col("prev_val")) * dh / gap, 6
    )
    return ctx.select(
        "hour",
        "n_events",
        F.when(F.col("raw").isNotNull(), F.col("raw"))
        .when(
            F.col("prev_val").isNotNull() & F.col("next_val").isNotNull(), interp
        )
        .otherwise(F.coalesce("prev_val", "next_val"))
        .alias("filled_value"),
    )


_ACF_MAX_LAG = 7


def _acf_oracle() -> str:
    """Unrolled lag columns -> stacked corr per lag, mirroring the builder."""
    lag_cols = ",\n                   ".join(
        f"lag(x, {k}) OVER (PARTITION BY event_type ORDER BY day) AS x{k}"
        for k in range(1, _ACF_MAX_LAG + 1)
    )
    arms = "\n        UNION ALL\n".join(
        f"""        SELECT event_type, {k} AS lag,
               ROUND(corr(x, x{k}), 6) AS acf
        FROM lagged GROUP BY event_type"""
        for k in range(1, _ACF_MAX_LAG + 1)
    )
    return f"""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   ROUND(SUM(value), 5) AS x
            FROM events GROUP BY 1, 2
        ),
        lagged AS (
            SELECT event_type, x,
                   {lag_cols}
            FROM daily
        )
{arms}
    """


@register(
    "acf_daily_value",
    oracle=_acf_oracle(),
    doc=(
        "AUTOCORRELATION FUNCTION (lags 1..7) of the daily total `value` "
        "per event_type — the seasonality screen run before choosing a "
        "forecast model (a weekly cycle shows as a lag-7 peak). One "
        "grouped daily aggregate, ONE window pass materializing all seven "
        "row-lag columns (lag over day order within the event_type "
        "partition — keyed, never a global window), then stack() to long "
        "form and a corr() aggregate per (event_type, lag). Daily totals "
        "are rounded before the corr so engine summation order cannot "
        "leak into the moments; corr itself is rounded(6) on both sides "
        "because co-moment accumulation order differs. At 100 TB the "
        "daily rollup collapses the fact to |types|x|days| rows — "
        "everything after the first aggregate is dimension-sized."
    ),
    tags=("timeseries", "statistics", "window"),
)
def acf_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.round(F.sum("value"), 5).alias("x"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "x",
        *[F.lag("x", k).over(w).alias(f"x{k}") for k in range(1, _ACF_MAX_LAG + 1)],
    )
    stacked = lagged.select(
        "event_type",
        F.expr(
            "stack({n}, {args}) AS (lag, y)".format(
                n=_ACF_MAX_LAG,
                args=", ".join(
                    f"{k}, x{k}" for k in range(1, _ACF_MAX_LAG + 1)
                ),
            )
        ),
        "x",
    )
    return stacked.groupBy("event_type", "lag").agg(
        F.round(F.corr("x", "y"), 6).alias("acf")
    )


_CUSUM_SIGMA = 3.0


@register(
    "cusum_level_shift",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   CAST(ROUND(AVG(value) * 100000, 0) AS BIGINT) AS xi
            FROM events GROUP BY 1, 2
        ),
        stats AS (
            SELECT event_type,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(xi) AS DOUBLE) AS s1,
                   CAST(SUM(xi * xi) AS DOUBLE) AS s2
            FROM daily GROUP BY 1
        ),
        cum AS (
            SELECT d.event_type, d.day, s.n, s.s1, s.s2,
                   CAST(FLOOR(s.s1 / s.n) AS BIGINT) AS mu_i,
                   SUM(d.xi) OVER (
                       PARTITION BY d.event_type ORDER BY d.day
                   ) AS c,
                   ROW_NUMBER() OVER (
                       PARTITION BY d.event_type ORDER BY d.day
                   ) AS t
            FROM daily d JOIN stats s USING (event_type)
        )
        SELECT event_type, day,
               ROUND(CAST(c - t * mu_i AS DOUBLE) / 100000, 5) AS cusum,
               (CASE WHEN n > 1 THEN
                   ABS(CAST(c - t * mu_i AS DOUBLE)) >
                   {_CUSUM_SIGMA} * sqrt((n * s2 - s1 * s1) / (n * (n - 1)))
                ELSE FALSE END) AS is_shift
        FROM cum
    """,
    doc=(
        "CUSUM LEVEL-SHIFT DETECTION: cumulative sum of the daily-mean "
        "deviation from the per-type mean, flagged where |S_t| exceeds "
        f"{_CUSUM_SIGMA} sigma — the classic drift/changepoint screen for a "
        "metric whose level quietly moved. Determinism is the hard part "
        "and rounding alone is NOT enough: a cumulative sum amplifies a "
        "single 1e-5 round-boundary flip in the mean into t*1e-5 drift "
        "at day t (observed at sf0.01 before this design). So the daily "
        "mean is quantized ONCE to an exact scaled bigint (1e-5 units) "
        "and everything downstream stays in exact integer arithmetic: "
        "the reference mean is itself quantized (floor(s1/n) — floor, "
        "not round, because round ties at remainder n/2 hit the "
        "HALF_UP-vs-HALF_EVEN engine difference), so the deviation "
        "c - t*mu_i is an exact bigint, the emitted cusum has <= 5 true "
        "decimals (its final round can never land on a tie), and sigma "
        "comes from the (n*s2 - s1^2) moment identity over exact sums "
        "with identical IEEE expressions in both engines. No "
        "engine-ordered float summation exists anywhere in the plan. "
        "The stats join is a broadcast (|types| rows). At 100 TB: the "
        "fact collapses to |types|x|days| at the first aggregate; the "
        "window partitions by type, never global."
    ),
    tags=("timeseries", "statistics", "window", "quality"),
)
def cusum_level_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cusum_from_events(load_table(spark, sf_dir, "events"))


def cusum_from_events(ev: DataFrame) -> DataFrame:
    """CUSUM core over any events-shaped frame (event_type, ts, value) —
    split out so the property tests can drive it with hypothesis-drawn
    series and check the exact-integer formulation against a pure-Python
    reference bit for bit."""
    from pyspark.sql.window import Window

    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.round(F.avg("value") * 100000, 0).cast("bigint").alias("xi"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("xi").cast("double").alias("s1"),
        F.sum(F.col("xi") * F.col("xi")).cast("double").alias("s2"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    joined = daily.join(F.broadcast(stats), "event_type")
    mu_i = F.floor(F.col("s1") / F.col("n")).cast("bigint")
    c = F.sum("xi").over(w)
    t = F.row_number().over(wo).cast("bigint")
    dev = (c - t * mu_i).cast("double")
    sigma = F.sqrt(
        (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
        / (F.col("n") * (F.col("n") - 1))
    )
    return joined.select(
        "event_type",
        "day",
        F.round(dev / 100000, 5).alias("cusum"),
        F.when(F.col("n") > 1, F.abs(dev) > _CUSUM_SIGMA * sigma)
        .otherwise(F.lit(False))
        .alias("is_shift"),
    )


@register(
    "theilsen_trend_by_user",
    oracle="""
        WITH pts AS (
            SELECT user_id, event_id, epoch_us(ts) AS t, value FROM events
        ),
        slopes AS (
            SELECT a.user_id,
                   (b.value - a.value)
                   / ((b.t - a.t) / 86400000000.0) AS slope
            FROM pts a JOIN pts b
              ON a.user_id = b.user_id AND a.t < b.t
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND(quantile_cont(slope, 0.5), 6) AS theil_sen_slope
        FROM slopes GROUP BY user_id
    """,
    doc=(
        "THEIL-SEN ROBUST TREND per user: the median of all pairwise "
        "slopes (value units per day) over the user's event history — "
        "the estimator that shrugs off the outliers that wreck the OLS "
        "slope in regression_trend_by_user (up to ~29% contamination). "
        "Pairs are strictly time-ordered (a.t < b.t, equal-timestamp "
        "pairs excluded — slope undefined); each slope is one double "
        "division of exact integers (epoch micros, raw value), so both "
        "engines build the identical slope multiset and exact-median "
        "interpolation agrees bit-for-bit before the shared round(6). "
        "The self-join is keyed on user_id — quadratic ONLY within a "
        "key (~67 events -> ~2.2k pairs per user in the fixtures, and "
        "the fixture generator keeps events/user constant as SF grows, "
        "so per-key cost is flat at any SF). For genuinely unbounded "
        "keys the scale form is the repeated-median / sampled-pairs "
        "variant (cap pairs per key by windowing each point against its "
        "K successors), same plan shape with a bounded fan-out."
    ),
    tags=("timeseries", "statistics", "robust"),
)
def theilsen_trend_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id", F.unix_micros("ts").alias("t"), "value"
    )
    a = pts.select("user_id", F.col("t").alias("ta"), F.col("value").alias("va"))
    b = pts.select("user_id", F.col("t").alias("tb"), F.col("value").alias("vb"))
    slopes = (
        a.join(b, "user_id")
        .filter(F.col("ta") < F.col("tb"))
        .select(
            "user_id",
            (
                (F.col("vb") - F.col("va"))
                / ((F.col("tb") - F.col("ta")) / 86400000000.0)
            ).alias("slope"),
        )
    )
    return slopes.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.percentile("slope", F.lit(0.5)), 6).alias("theil_sen_slope"),
    )


@register(
    "seasonal_naive_backtest",
    oracle="""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   CAST(ROUND(SUM(value) * 100000, 0) AS BIGINT) AS xi
            FROM events GROUP BY 1, 2
        ),
        lagged AS (
            SELECT event_type, xi,
                   lag(xi, 7) OVER (PARTITION BY event_type ORDER BY day)
                       AS l7,
                   lag(xi, 1) OVER (PARTITION BY event_type ORDER BY day)
                       AS l1
            FROM daily
        ),
        m AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(ABS(xi - l7)) AS DOUBLE) AS e7,
                   CAST(COUNT(l7) AS DOUBLE) AS n7,
                   CAST(SUM(ABS(xi - l1)) AS DOUBLE) AS e1,
                   CAST(COUNT(l1) AS DOUBLE) AS n1
            FROM lagged GROUP BY 1
        )
        SELECT event_type, n_days,
               ROUND(e7 / n7 / 100000, 5) AS mae_seasonal,
               ROUND(e1 / n1 / 100000, 5) AS mae_naive,
               CASE WHEN e1 > 0
                    THEN ROUND((e7 / n7) / (e1 / n1), 6) END AS mase
        FROM m
    """,
    doc=(
        "SEASONAL-NAIVE FORECAST BACKTEST: per event_type, the MAE of the "
        "lag-7 (weekly) naive forecast over the daily total series, the "
        "lag-1 naive MAE, and their ratio — MASE with the in-sample naive "
        "denominator (Hyndman & Koehler 2006), the standard 'is there "
        "exploitable weekly structure' screen run before fitting any "
        "model (MASE < 1 means the weekly naive beats the daily naive). "
        "Exact-arithmetic discipline: daily totals quantize once to "
        "scaled bigints, absolute-error SUMS are exact integers, and the "
        "only float ops are the final identical-expression divisions — "
        "AVG() itself is never used because engines disagree on its "
        "internal accumulation. The lag window partitions by type; "
        "constant series (zero naive error) yield NULL MASE in both "
        "engines. At 100 TB: the fact collapses to |types|x|days| at the "
        "first aggregate, identical to cusum_level_shift."
    ),
    tags=("timeseries", "forecast", "window", "statistics"),
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.round(F.sum("value") * 100000, 0).cast("bigint").alias("xi"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "xi",
        F.lag("xi", 7).over(w).alias("l7"),
        F.lag("xi", 1).over(w).alias("l1"),
    )
    m = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.abs(F.col("xi") - F.col("l7"))).cast("double").alias("e7"),
        F.count("l7").cast("double").alias("n7"),
        F.sum(F.abs(F.col("xi") - F.col("l1"))).cast("double").alias("e1"),
        F.count("l1").cast("double").alias("n1"),
    )
    return m.select(
        "event_type",
        "n_days",
        F.round(F.col("e7") / F.col("n7") / 100000, 5).alias("mae_seasonal"),
        F.round(F.col("e1") / F.col("n1") / 100000, 5).alias("mae_naive"),
        F.when(
            F.col("e1") > 0,
            F.round((F.col("e7") / F.col("n7")) / (F.col("e1") / F.col("n1")), 6),
        ).alias("mase"),
    )


@register(
    "time_weighted_average_daily",
    oracle="""
        WITH pts AS (
            SELECT user_id, date_trunc('day', ts) AS day, ts, event_id,
                   CAST(ROUND(value * 100000, 0) AS BIGINT) AS xi
            FROM events
        ),
        seg AS (
            SELECT user_id, day, xi,
                   (epoch_us(COALESCE(
                        lead(ts) OVER (
                            PARTITION BY user_id, day
                            ORDER BY ts, event_id),
                        day + INTERVAL 1 DAY))
                    - epoch_us(ts)) // 1000 AS dur_ms
            FROM pts
        )
        SELECT user_id, day,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(CAST(SUM(xi * dur_ms) AS DOUBLE)
                     / CAST(SUM(dur_ms) AS DOUBLE) / 100000, 5) AS twap
        FROM seg GROUP BY user_id, day
    """,
    doc=(
        "TIME-WEIGHTED AVERAGE (TWAP) per user-day: each observation "
        "holds its value until the next one (last until day end), so the "
        "mean weights by holding DURATION, not by sample count — the "
        "correct daily summary for state-like series sampled at uneven "
        "intervals (a plain AVG over-weights bursts; the weather analog: "
        "a forecast stands until replaced). One keyed lead() window per "
        "(user, day) with a full (ts, event_id) tie-break, then a keyed "
        "aggregate. Exact arithmetic: values quantize to 1e-5 bigints, "
        "durations are integer milliseconds (micros floor-divided by "
        "1000 — headroom: max |xi*dur_ms| ~ 1e15 per segment, int64-safe "
        "for ~8000 segments/day/user), so both weighted sums are exact "
        "integers and the single final division is the identical IEEE "
        "expression in both engines. At 100 TB: one shuffle on "
        "user_id-derived keys shared by window and aggregate; output is "
        "|users|x|days|."
    ),
    tags=("timeseries", "window", "statistics"),
)
def time_weighted_average_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return twap_from_events(load_table(spark, sf_dir, "events"))


def twap_from_events(ev: DataFrame) -> DataFrame:
    """TWAP core over any events-shaped frame — split out so the property
    tests can drive it on hypothesis-drawn series against a pure-Python
    exact-integer reference."""
    from pyspark.sql.window import Window

    pts = ev.select(
        "user_id",
        F.date_trunc("day", "ts").alias("day"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100000, 0).cast("bigint").alias("xi"),
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    nxt = F.coalesce(
        F.lead("ts").over(w), F.col("day") + F.expr("INTERVAL 1 DAY")
    )
    seg = pts.select(
        "user_id",
        "day",
        "xi",
        F.floor((F.unix_micros(nxt) - F.unix_micros("ts")) / 1000).alias(
            "dur_ms"
        ),
    )
    return seg.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.col("xi") * F.col("dur_ms")).cast("double")
            / F.sum("dur_ms").cast("double")
            / 100000,
            5,
        ).alias("twap"),
    )


@register(
    "interarrival_profile",
    oracle="""
        WITH gaps AS (
            SELECT event_type,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id
                   ) AS gap_us
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
               ROUND(CAST(SUM(gap_us) AS DOUBLE)
                     / CAST(COUNT(gap_us) AS DOUBLE) / 1000000, 5)
                   AS mean_gap_s,
               ROUND(quantile_cont(gap_us, 0.5) / 1000000, 5) AS p50_gap_s,
               ROUND(quantile_cont(gap_us, 0.9) / 1000000, 5) AS p90_gap_s,
               ROUND(CAST(COUNT(gap_us) AS DOUBLE)
                     / CAST(SUM(gap_us) AS DOUBLE) * 1000000, 8)
                   AS rate_per_s
        FROM gaps
        WHERE gap_us IS NOT NULL
        GROUP BY event_type
    """,
    doc=(
        "INTER-ARRIVAL PROFILE per event type: gap count, mean gap, "
        "exact p50/p90 gaps, and the exponential MLE arrival rate "
        "(n/sum-of-gaps) — the load model behind capacity planning and "
        "anomaly thresholds (a Poisson stream's p90/p50 ratio is "
        "ln10/ln2 ~ 3.32; a much larger ratio means bursts). Gaps are "
        "exact integer microseconds from one keyed lag window; mean and "
        "rate are identical-expression divisions of exact integer sums; "
        "exact percentiles interpolate over the same integer multiset "
        "in both engines. At 100 TB: one user-free keyed window over "
        "|types| partitions — for high-cardinality keys swap the exact "
        "percentile for KLL, same as every percentile operator here."
    ),
    tags=("timeseries", "statistics", "window", "profiling"),
)
def interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gaps = ev.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.round(
            F.sum("gap_us").cast("double")
            / F.count("gap_us").cast("double")
            / 1000000,
            5,
        ).alias("mean_gap_s"),
        F.round(F.percentile("gap_us", F.lit(0.5)) / 1000000, 5).alias(
            "p50_gap_s"
        ),
        F.round(F.percentile("gap_us", F.lit(0.9)) / 1000000, 5).alias(
            "p90_gap_s"
        ),
        F.round(
            F.count("gap_us").cast("double")
            / F.sum("gap_us").cast("double")
            * 1000000,
            8,
        ).alias("rate_per_s"),
    )


@register(
    "funnel_time_to_convert",
    oracle="""
        WITH s AS (
            SELECT user_id, MIN(ts) AS signup_ts
            FROM events WHERE event_type = 'signup' GROUP BY user_id
        ),
        p AS (
            SELECT e.user_id,
                   MIN(epoch_us(e.ts) - epoch_us(s.signup_ts)) AS gap_us
            FROM events e JOIN s ON s.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
            GROUP BY e.user_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
               ROUND(quantile_cont(gap_us, 0.5) / 3600000000.0, 5)
                   AS p50_hours,
               ROUND(quantile_cont(gap_us, 0.9) / 3600000000.0, 5)
                   AS p90_hours,
               ROUND(CAST(SUM(gap_us) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE) / 3600000000.0, 5)
                   AS mean_hours
        FROM p
    """,
    doc=(
        "FUNNEL TIME-TO-CONVERT: for every user whose first purchase "
        "follows their first signup, the signup->purchase delay — "
        "count, exact p50/p90, and mean hours. This is the latency "
        "companion to funnel_conversion's rate: the number that decides "
        "how long an activation campaign waits before intervening. Both "
        "stage tables are per-user min-aggregates (|users|-sized, the "
        "scan pre-filters one event type each — the funnel discipline); "
        "delays are exact integer microseconds, the mean is an "
        "identical-expression division of exact sums, and the "
        "percentiles interpolate the same integer multiset in both "
        "engines. One-row output. At 100 TB: two pre-filtered scans "
        "sharing user_id partitioning, then a 1-row reduce."
    ),
    tags=("timeseries", "funnel", "percentile", "statistics"),
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.unix_micros("ts") - F.unix_micros("signup_ts")
            ).alias("gap_us")
        )
    )
    return p.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.percentile("gap_us", F.lit(0.5)) / 3600000000.0, 5).alias(
            "p50_hours"
        ),
        F.round(F.percentile("gap_us", F.lit(0.9)) / 3600000000.0, 5).alias(
            "p90_hours"
        ),
        F.round(
            F.sum("gap_us").cast("double")
            / F.count(F.lit(1)).cast("double")
            / 3600000000.0,
            5,
        ).alias("mean_hours"),
    )


@register(
    "sax_daily_symbols",
    oracle="""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   AVG(value) AS daily_mean
            FROM events GROUP BY 1, 2
        ),
        stats AS (
            SELECT event_type,
                   AVG(daily_mean) AS mu,
                   STDDEV(daily_mean) AS sigma
            FROM daily GROUP BY event_type
        ),
        z AS (
            SELECT d.event_type, d.day,
                   ROUND(d.daily_mean, 5) AS daily_mean,
                   ROUND((d.daily_mean - s.mu) / s.sigma, 6) AS znorm
            FROM daily d JOIN stats s USING (event_type)
        )
        SELECT event_type, day, daily_mean, znorm,
               CASE WHEN znorm < -0.6745 THEN 'a'
                    WHEN znorm < 0.0     THEN 'b'
                    WHEN znorm < 0.6745  THEN 'c'
                    ELSE 'd' END AS symbol
        FROM z
    """,
    doc=(
        "SAX SYMBOLIZATION (Lin/Keogh et al., DMKD'07) of the per-type "
        "daily series: z-normalize each event type's daily means against "
        "its OWN mean/stddev, then map to a 4-letter alphabet at the "
        "Gaussian equiprobable breakpoints (-0.6745, 0, +0.6745) — the "
        "discretization that turns numeric series into strings so motif "
        "discovery, anomaly grammars, and shingle-based series dedup can "
        "reuse the text machinery (the SAX word is exactly a token "
        "stream; doc_fingerprints/winnowing apply verbatim downstream). "
        "Deterministic across engines: the z-score is rounded to 6dp "
        "BEFORE the breakpoint comparison, so both engines bucket the "
        "same values. Plan: two hash aggregates (daily means: |types x "
        "days| rows; per-type moments: |types| rows) and one broadcast "
        "join back — a map-side projection does the bucketing. Per-type "
        "normalization keys every aggregate; nothing is global."
    ),
    tags=("timeseries", "symbolization", "llm"),
)
def sax_daily_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.avg("value").alias("daily_mean_raw"))
    stats = daily.groupBy("event_type").agg(
        F.avg("daily_mean_raw").alias("mu"),
        F.stddev("daily_mean_raw").alias("sigma"),
    )
    z = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        F.round("daily_mean_raw", 5).alias("daily_mean"),
        F.round((F.col("daily_mean_raw") - F.col("mu")) / F.col("sigma"), 6).alias(
            "znorm"
        ),
    )
    symbol = (
        F.when(F.col("znorm") < -0.6745, "a")
        .when(F.col("znorm") < 0.0, "b")
        .when(F.col("znorm") < 0.6745, "c")
        .otherwise("d")
    )
    return z.select("event_type", "day", "daily_mean", "znorm", symbol.alias("symbol"))


@register(
    "sax_motif_counts",
    oracle="""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   AVG(value) AS daily_mean
            FROM events GROUP BY 1, 2
        ),
        stats AS (
            SELECT event_type,
                   AVG(daily_mean) AS mu,
                   STDDEV(daily_mean) AS sigma
            FROM daily GROUP BY event_type
        ),
        sym AS (
            SELECT d.event_type, d.day,
                   CASE WHEN ROUND((d.daily_mean - s.mu) / s.sigma, 6) < -0.6745 THEN 'a'
                        WHEN ROUND((d.daily_mean - s.mu) / s.sigma, 6) < 0.0     THEN 'b'
                        WHEN ROUND((d.daily_mean - s.mu) / s.sigma, 6) < 0.6745  THEN 'c'
                        ELSE 'd' END AS symbol
            FROM daily d JOIN stats s USING (event_type)
        ),
        words AS (
            SELECT event_type,
                   symbol
                   || lead(symbol, 1) OVER w
                   || lead(symbol, 2) OVER w AS motif
            FROM sym
            WINDOW w AS (PARTITION BY event_type ORDER BY day)
            QUALIFY lead(symbol, 2) OVER w IS NOT NULL
        )
        SELECT event_type, motif, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM words
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2
    """,
    doc=(
        "SAX MOTIF DISCOVERY: 3-day symbol words over each type's SAX "
        "stream, keeping motifs that recur (>= 2 occurrences) — the "
        "classic Lin/Keogh consumer of symbolization, turning 'find "
        "repeated numeric shapes' (a continuous all-subsequences match "
        "problem) into an exact string group-by. A recurring 'dba' says "
        "the type repeatedly spikes then decays over three days; "
        "operations reads these as rhythm signatures, anomaly grammars "
        "alarm on NEW words instead of thresholds. Plan: the SAX "
        "projection (two bounded aggregates + broadcast join), two "
        "lead() windows PARTITIONED BY event_type (frames are one "
        "type's day series), one hash aggregate on (type, word). "
        "Output is bounded by alphabet^length x types."
    ),
    tags=("timeseries", "symbolization", "motif", "llm"),
)
def sax_motif_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.avg("value").alias("daily_mean_raw"))
    stats = daily.groupBy("event_type").agg(
        F.avg("daily_mean_raw").alias("mu"),
        F.stddev("daily_mean_raw").alias("sigma"),
    )
    z = F.round(
        (F.col("daily_mean_raw") - F.col("mu")) / F.col("sigma"), 6
    )
    sym = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        F.when(z < -0.6745, "a")
        .when(z < 0.0, "b")
        .when(z < 0.6745, "c")
        .otherwise("d")
        .alias("symbol"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    words = sym.select(
        "event_type",
        F.concat(
            F.col("symbol"),
            F.lead("symbol", 1).over(w),
            F.lead("symbol", 2).over(w),
        ).alias("motif"),
    ).filter(F.col("motif").isNotNull())
    return (
        words.groupBy("event_type", "motif")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= 2)
    )


@register(
    "event_pattern_regex",
    oracle="""
        WITH seq AS (
            SELECT user_id,
                   string_agg(substr(event_type, 1, 1), ''
                              ORDER BY ts, event_id) AS s
            FROM events GROUP BY user_id
        )
        SELECT user_id,
               CAST(length(s) AS BIGINT) AS n_events,
               CAST(len(regexp_extract_all(s, 's[vc]*p')) AS BIGINT)
                   AS n_activation_paths,
               CAST(len(regexp_extract_all(s, 'vp')) AS BIGINT)
                   AS n_immediate_conversions,
               CAST(len(regexp_extract_all(s, 'ee+')) AS BIGINT)
                   AS n_error_bursts
        FROM seq
        WHERE len(regexp_extract_all(s, 's[vc]*p')) > 0
           OR len(regexp_extract_all(s, 'ee+')) > 0
    """,
    doc=(
        "EVENT-SEQUENCE PATTERN MATCHING by string collapse: encode each "
        "user's time-ordered event stream as a character string (one "
        "initial per event) and count regex matches — activation paths "
        "(signup, any browsing, then purchase: 's[vc]*p'), immediate "
        "view->purchase adjacencies, and error bursts ('ee+'). This is "
        "the poor-man's MATCH_RECOGNIZE: sequence questions that would "
        "need k self-joins or a k-step window chain become ONE ordered "
        "string aggregate plus codegen'd regexp_count — and adding a "
        "new pattern is a new column, not a new plan. The regex is "
        "restricted to greedy ASCII classes Java regex (Spark) and RE2 "
        "(DuckDB) scan identically (leftmost, non-overlapping). Plan: "
        "one user-keyed aggregate with an in-group sort (rows per user "
        "are session-scale, bounded), then a map-side projection. The "
        "string is bounded by events-per-user; for power users beyond "
        "memory, split per (user, day) first — same trick "
        "top_event_paths documents."
    ),
    tags=("timeseries", "sequence", "analytics", "regex"),
)
def event_pattern_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "ts", "event_id", F.substring("event_type", 1, 1).alias("c")
                        )
                    )
                ),
                lambda s: s.getField("c"),
            ),
            "",
        ).alias("s")
    )
    n_act = F.regexp_count("s", F.lit(r"s[vc]*p")).cast("bigint")
    n_imm = F.regexp_count("s", F.lit(r"vp")).cast("bigint")
    n_err = F.regexp_count("s", F.lit(r"ee+")).cast("bigint")
    return (
        seq.select(
            "user_id",
            F.length("s").cast("bigint").alias("n_events"),
            n_act.alias("n_activation_paths"),
            n_imm.alias("n_immediate_conversions"),
            n_err.alias("n_error_bursts"),
        )
        .filter(
            (F.col("n_activation_paths") > 0) | (F.col("n_error_bursts") > 0)
        )
    )


_CONF_ALPHA_Q = 0.9  # split-conformal quantile => ~90% target coverage


@register(
    "conformal_interval_coverage",
    oracle=f"""
        WITH base AS (
            SELECT event_type, hour(ts) AS hod, value,
                   event_id % 2 = 0 AS is_cal
            FROM events WHERE value IS NOT NULL
        ),
        model AS (
            SELECT event_type, hod, ROUND(AVG(value), 6) AS pred
            FROM base WHERE is_cal GROUP BY 1, 2
        ),
        cal_resid AS (
            SELECT b.event_type, ROUND(ABS(b.value - m.pred), 6) AS r
            FROM base b JOIN model m USING (event_type, hod)
            WHERE b.is_cal
        ),
        widths AS (
            SELECT event_type,
                   ROUND(quantile_cont(r, {_CONF_ALPHA_Q}), 6) AS halfwidth,
                   CAST(COUNT(*) AS BIGINT) AS n_cal
            FROM cal_resid GROUP BY 1
        ),
        test AS (
            SELECT b.event_type,
                   CASE WHEN ROUND(ABS(b.value - m.pred), 6) <= w.halfwidth
                        THEN 1 ELSE 0 END AS covered
            FROM base b
            JOIN model m USING (event_type, hod)
            JOIN widths w ON b.event_type = w.event_type
            WHERE NOT b.is_cal
        )
        SELECT w.event_type, w.n_cal,
               CAST(COUNT(*) AS BIGINT) AS n_test,
               w.halfwidth,
               ROUND(SUM(covered) * 1.0 / COUNT(*), 6) AS coverage
        FROM test t JOIN widths w USING (event_type)
        GROUP BY w.event_type, w.n_cal, w.halfwidth
    """,
    doc=(
        "SPLIT-CONFORMAL PREDICTION-INTERVAL CALIBRATION (Vovk; Lei et "
        "al. JASA'18) over the event stream: a deterministic even/odd "
        "event_id split carves calibration and test halves; the point "
        "model is the per-(event_type, hour-of-day) calibration mean; "
        f"the interval halfwidth is the exact q={_CONF_ALPHA_Q} "
        "quantile of absolute calibration residuals per event_type; "
        "and the audit reports EMPIRICAL test-half coverage next to the "
        "nominal target — the distribution-free way to attach honest "
        "error bars to any point forecast, and the standard check that "
        "a monitoring threshold derived from history actually holds "
        "out-of-sample. Plan: one scan splits both halves via a "
        "projection flag (no second read); the model and width tables "
        "are bounded by |event_type| x 24 and |event_type| and both "
        "broadcast into the test probe; the exact per-group quantile "
        "sorts only per-group residual lists (the percentile_moment_"
        "stats machinery). Test rows whose (type, hour) never occurred "
        "in calibration are excluded by the inner join on BOTH sides — "
        "conformal guarantees only cover exchangeable points the model "
        "could score. All comparisons happen on 6dp-rounded values so "
        "the coverage boundary cannot flip between engines."
    ),
    tags=("timeseries", "stats", "audit"),
)
def conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    base = ev.select(
        "event_type",
        F.hour("ts").alias("hod"),
        "value",
        (F.col("event_id") % 2 == 0).alias("is_cal"),
    )
    model = (
        base.filter("is_cal")
        .groupBy("event_type", "hod")
        .agg(F.round(F.avg("value"), 6).alias("pred"))
    )
    resid = F.round(F.abs(F.col("value") - F.col("pred")), 6)
    cal_resid = (
        base.filter("is_cal")
        .join(F.broadcast(model), ["event_type", "hod"])
        .select("event_type", resid.alias("r"))
    )
    widths = cal_resid.groupBy("event_type").agg(
        F.round(F.percentile("r", _CONF_ALPHA_Q), 6).alias("halfwidth"),
        F.count(F.lit(1)).cast("bigint").alias("n_cal"),
    )
    test = (
        base.filter(~F.col("is_cal"))
        .join(F.broadcast(model), ["event_type", "hod"])
        .join(F.broadcast(widths), "event_type")
        .select(
            "event_type",
            "n_cal",
            "halfwidth",
            (resid <= F.col("halfwidth")).cast("int").alias("covered"),
        )
    )
    return test.groupBy("event_type", "n_cal", "halfwidth").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.round(F.sum("covered") / F.count(F.lit(1)), 6).alias("coverage"),
    ).select("event_type", "n_cal", "n_test", "halfwidth", "coverage")


# ---------------------------------------------------------------------------
# Round-5n: feature-store primitives — point-in-time-correct feature
# assembly and leakage-safe future-window label generation.
# ---------------------------------------------------------------------------


@register(
    "point_in_time_features",
    oracle="""
        WITH ordered AS (
            SELECT event_id, user_id, ts, event_type,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents,
                   SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       OVER w AS clicks_before,
                   SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                       OVER w AS views_before,
                   SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                       OVER w AS errors_before,
                   SUM(CAST(ROUND(value * 100) AS BIGINT))
                       OVER w AS value_cents_before,
                   MAX(CASE WHEN event_type = 'click'
                            THEN epoch_us(ts) END) OVER w AS last_click_us
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        )
        SELECT event_id, user_id, ts AS label_ts,
               CAST(COALESCE(clicks_before, 0) AS BIGINT) AS clicks_before,
               CAST(COALESCE(views_before, 0) AS BIGINT) AS views_before,
               CAST(COALESCE(errors_before, 0) AS BIGINT) AS errors_before,
               CAST(COALESCE(value_cents_before, 0) AS BIGINT)
                   AS value_cents_before,
               CAST(epoch_us(ts) - last_click_us AS BIGINT)
                   AS last_click_gap_us
        FROM ordered
        WHERE event_type = 'purchase'
    """,
    doc=(
        "POINT-IN-TIME-CORRECT FEATURE ASSEMBLY (the feature-store "
        "primitive): for every purchase label row, the feature vector "
        "as of STRICTLY BEFORE the label instant — running click/view/"
        "error counts, cumulative value (exact integer cents), and the "
        "recency gap to the last click — computed in ONE pass as "
        "user-partitioned cumulative windows with a 1-PRECEDING frame "
        "edge, so no feature can leak the label row itself or anything "
        "after it ('before' = earlier in the total (ts, event_id) "
        "order; same-instant ties resolve by id, deterministically). "
        "This is the leakage-safe alternative to joining a feature "
        "table built over all time, and the multi-feature superset of "
        "asof_join_last_view. Plan: one scan, one partitioned window "
        "(scales with user count), filter to label rows afterward so "
        "feature state never materializes per non-label row downstream. "
        "All counters integer-exact; the gap is exact epoch "
        "microseconds."
    ),
    tags=("timeseries", "llm", "features", "ml"),
)
def point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    us = F.unix_micros(F.col("ts"))
    ordered = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .over(w)
        .alias("clicks_before"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .over(w)
        .alias("views_before"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .over(w)
        .alias("errors_before"),
        F.sum(cents).over(w).alias("value_cents_before"),
        F.max(F.when(F.col("event_type") == "click", us)).over(w).alias(
            "last_click_us"
        ),
    )
    return ordered.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("label_ts"),
        F.coalesce("clicks_before", F.lit(0)).cast("bigint").alias("clicks_before"),
        F.coalesce("views_before", F.lit(0)).cast("bigint").alias("views_before"),
        F.coalesce("errors_before", F.lit(0)).cast("bigint").alias("errors_before"),
        F.coalesce("value_cents_before", F.lit(0))
        .cast("bigint")
        .alias("value_cents_before"),
        (us - F.col("last_click_us")).cast("bigint").alias("last_click_gap_us"),
    )


_FWL_HORIZON_US = 7 * 24 * 3600 * 1_000_000


@register(
    "future_window_labels",
    oracle=f"""
        WITH ordered AS (
            SELECT event_id, user_id, ts, event_type,
                   MIN(CASE WHEN event_type = 'purchase'
                            THEN epoch_us(ts) END) OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS next_purchase_us
            FROM events
        )
        SELECT event_id, user_id, ts,
               CAST(next_purchase_us - epoch_us(ts) AS BIGINT)
                   AS next_purchase_gap_us,
               CASE WHEN next_purchase_us - epoch_us(ts)
                         <= {_FWL_HORIZON_US} THEN 1 ELSE 0 END
                   AS label_purchase_7d
        FROM ordered
        WHERE event_type <> 'purchase'
    """,
    doc=(
        "LEAKAGE-SAFE FUTURE-WINDOW LABEL GENERATION: every non-"
        "purchase event becomes an observation labeled 'does this user "
        "purchase within the next 7 days' — the churn/conversion label "
        "construction step, built so the label window looks STRICTLY "
        "FORWARD (next purchase = running MIN of purchase timestamps "
        "over the user's later events, a 1-PRECEDING frame on the "
        "DESCENDING (ts, event_id) order — the mirror of "
        "point_in_time_features' backward frame). Emits the exact gap "
        "so other horizons re-derive by comparison, and NULL gap (no "
        "future purchase ever) labels 0 via SQL NULL-comparison "
        "semantics identically on both engines. One scan, one "
        "user-partitioned window; pairs with point_in_time_features to "
        "assemble a complete training set in two passes with zero "
        "leakage either direction."
    ),
    tags=("timeseries", "llm", "features", "ml"),
)
def future_window_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ordered = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.min(F.when(F.col("event_type") == "purchase", us)).over(w).alias(
            "next_purchase_us"
        ),
    )
    return ordered.filter(F.col("event_type") != "purchase").select(
        "event_id",
        "user_id",
        "ts",
        (F.col("next_purchase_us") - us).cast("bigint").alias(
            "next_purchase_gap_us"
        ),
        F.when(
            F.col("next_purchase_us") - us <= _FWL_HORIZON_US, 1
        )
        .otherwise(0)
        .alias("label_purchase_7d"),
    )


# ---------------------------------------------------------------------------
# PACF via Durbin-Levinson (round-5o): the AR-order screen next to ACF.
# ---------------------------------------------------------------------------


def _durbin_levinson(r: list[float]) -> list[float]:
    """PACF values phi_kk for k=1..len(r) from autocorrelations r_1..r_K
    (pure Python on the bounded |types| x K ACF table)."""
    K = len(r)
    pacf = []
    prev: list[float] = []
    for k in range(1, K + 1):
        if k == 1:
            phi_kk = r[0]
            cur = [phi_kk]
        else:
            num = r[k - 1] - sum(prev[j] * r[k - 2 - j] for j in range(k - 1))
            den = 1.0 - sum(prev[j] * r[j] for j in range(k - 1))
            phi_kk = num / den if den != 0 else 0.0
            cur = [
                prev[j] - phi_kk * prev[k - 2 - j] for j in range(k - 1)
            ] + [phi_kk]
        pacf.append(phi_kk)
        prev = cur
    return pacf


@register(
    "pacf_durbin_levinson",
    oracle=None,  # iterative recursion over the ACF values; pytest
    # re-derives the Durbin-Levinson recursion in pure Python and the
    # lag-1 identity pacf(1) == acf(1) (tests/test_labeling.py)
    doc=(
        "PARTIAL AUTOCORRELATION FUNCTION per event_type via the "
        "Durbin-Levinson recursion over the registered acf_daily_value "
        "output — the AR-order identification screen that pairs with "
        "ACF (an AR(p) series shows PACF cutting off after lag p while "
        "ACF tails; MA shows the reverse). The distributed work IS the "
        "ACF (daily rollup + keyed lag windows + corr aggregate, "
        "|types| x 7 rows out); the recursion then runs driver-side on "
        "that bounded table — the same bounded-collect class as the PQ "
        "codebook pull; 100 TB changes the ACF values, not the "
        "recursion size. Rows-only: the K-step recursion is not "
        "SQL-expressible; determinism comes from recursing over the "
        "6-dp-rounded ACF values in fixed lag order."
    ),
    tags=("timeseries", "statistics", "iterative"),
)
def pacf_durbin_levinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from weather_stream_processor_spark.registry import _REGISTRY

    acf = _REGISTRY["acf_daily_value"].builder(spark, sf_dir)
    rows = acf.collect()  # bounded: |event types| x K lags
    by_type: dict[str, dict[int, float]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, {})[int(r.lag)] = (
            float(r.acf) if r.acf is not None else 0.0
        )
    out = []
    for et in sorted(by_type):
        lags = by_type[et]
        K = max(lags)
        series = [lags.get(k, 0.0) for k in range(1, K + 1)]
        for k, v in enumerate(_durbin_levinson(series), start=1):
            out.append((et, k, round(v, 6)))
    schema = StructType(
        [
            StructField("event_type", StringType(), False),
            StructField("lag", IntegerType(), False),
            StructField("pacf", DoubleType(), False),
        ]
    )
    return spark.createDataFrame(out, schema)


# ---------------------------------------------------------------------------
# Round-5t: day-grid financial diagnostics — max drawdown and
# gaps-and-islands streaks.
# ---------------------------------------------------------------------------


@register(
    "max_drawdown_daily",
    oracle="""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY 1, 2
        ),
        cum1 AS (
            SELECT event_type, day,
                   CAST(SUM(cents) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum_cents
            FROM daily
        ),
        cum AS (
            SELECT event_type, day, cum_cents,
                   CAST(MAX(cum_cents) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS peak_cents
            FROM cum1
        ),
        dd AS (
            SELECT event_type, day, cum_cents, peak_cents,
                   peak_cents - cum_cents AS draw_cents
            FROM cum
        )
        SELECT event_type,
               MAX(draw_cents) / 100.0 AS max_drawdown,
               CAST(MIN(CASE WHEN draw_cents = mx THEN day END) AS DATE)
                   AS trough_day,
               MAX(peak_cents) / 100.0 AS peak_cumulative
        FROM (SELECT *, MAX(draw_cents) OVER (PARTITION BY event_type) AS mx
              FROM dd)
        GROUP BY event_type
    """,
    doc=(
        "MAXIMUM DRAWDOWN per event_type of the cumulative daily value "
        "series: running peak minus current cumulative, maximized — "
        "the worst peak-to-trough slide, with the (earliest) trough "
        "day. The risk statistic every cumulative-metric dashboard "
        "(revenue, tokens ingested, storage written) wants next to the "
        "trend line; here daily sums are EXACT INTEGER CENTS so peak/"
        "drawdown arithmetic is integer-exact and the hash gate is "
        "exact. Plan: one hash aggregate to the (type, day) grid — "
        "bounded by type-domain x day-span — then keyed cumulative "
        "windows over that grid only (documented-bounded class); the "
        "trough day ties break earliest-first deterministically."
    ),
    tags=("timeseries", "statistics", "window"),
)
def max_drawdown_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("cents"))
    w = W.partitionBy("event_type").orderBy("day").rowsBetween(
        W.unboundedPreceding, 0
    )
    cum = daily.select(
        "event_type",
        "day",
        F.sum("cents").over(w).cast("bigint").alias("cum_cents"),
    ).withColumn(
        "peak_cents",
        F.max("cum_cents")
        .over(
            W.partitionBy("event_type").orderBy("day").rowsBetween(
                W.unboundedPreceding, 0
            )
        )
        .cast("bigint"),
    )
    dd = cum.withColumn("draw_cents", F.col("peak_cents") - F.col("cum_cents"))
    w_t = W.partitionBy("event_type")
    flagged = dd.withColumn("mx", F.max("draw_cents").over(w_t))
    return flagged.groupBy("event_type").agg(
        (F.max("draw_cents") / F.lit(100.0)).alias("max_drawdown"),
        F.min(F.when(F.col("draw_cents") == F.col("mx"), F.col("day")))
        .cast("date")
        .alias("trough_day"),
        (F.max("peak_cents") / F.lit(100.0)).alias("peak_cumulative"),
    )


@register(
    "longest_updays_streak",
    oracle="""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY 1, 2
        ),
        flagged AS (
            SELECT event_type, day,
                   CASE WHEN cents > LAG(cents) OVER w THEN 1 ELSE 0 END
                       AS up
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day)
        ),
        islands AS (
            SELECT event_type, day, up,
                   CAST(ROW_NUMBER() OVER w
                        - SUM(up) OVER (PARTITION BY event_type ORDER BY day
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS BIGINT) AS grp
            FROM flagged
            WINDOW w AS (PARTITION BY event_type ORDER BY day)
        ),
        streaks AS (
            SELECT event_type, grp,
                   CAST(SUM(up) AS BIGINT) AS streak_len,
                   CAST(MIN(CASE WHEN up = 1 THEN day END) AS DATE)
                       AS streak_start
            FROM islands GROUP BY event_type, grp
        )
        SELECT event_type, streak_len AS longest_up_streak, streak_start
        FROM streaks
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY event_type
            ORDER BY streak_len DESC, streak_start ASC NULLS LAST) = 1
    """,
    doc=(
        "LONGEST UP-DAY STREAK per event_type (consecutive days whose "
        "daily value total rose vs the previous day) via the GAPS-AND-"
        "ISLANDS identity: row_number minus the running count of "
        "up-days is CONSTANT within each unbroken run, so one grouped "
        "aggregate over that derived key measures every streak without "
        "any iterative pass — the canonical SQL-pattern answer to "
        "sequence questions (login streaks, SLA streaks, green-build "
        "streaks). Daily sums are exact integer cents, so the up/down "
        "comparison is exact; ties (equal days) break streaks, the "
        "conservative convention. All windows run keyed on event_type "
        "over the bounded day grid; the winner per type ties toward "
        "the earliest streak."
    ),
    tags=("timeseries", "window", "statistics"),
)
def longest_updays_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("cents"))
    w = W.partitionBy("event_type").orderBy("day")
    w_run = w.rowsBetween(W.unboundedPreceding, 0)
    flagged = daily.select(
        "event_type",
        "day",
        F.when(F.col("cents") > F.lag("cents").over(w), 1).otherwise(0).alias("up"),
    )
    islands = flagged.select(
        "event_type",
        "day",
        "up",
        (
            F.row_number().over(w) - F.sum("up").over(w_run)
        ).cast("bigint").alias("grp"),
    )
    streaks = islands.groupBy("event_type", "grp").agg(
        F.sum("up").cast("bigint").alias("streak_len"),
        F.min(F.when(F.col("up") == 1, F.col("day"))).cast("date").alias(
            "streak_start"
        ),
    )
    w_pick = W.partitionBy("event_type").orderBy(
        F.desc("streak_len"), F.asc_nulls_last("streak_start")
    )
    return (
        streaks.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("streak_len").alias("longest_up_streak"),
            "streak_start",
        )
    )


# ---------------------------------------------------------------------------
# Round-5z: pinball-loss quantile backtest.
# ---------------------------------------------------------------------------

_PINBALL_SPLIT = "2024-01-16"
_PINBALL_QS = (0.1, 0.5, 0.9)


@register(
    "pinball_loss_backtest",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY 1, 2
        ),
        train AS (
            SELECT event_type, cents FROM daily
            WHERE day < TIMESTAMP '{_PINBALL_SPLIT}'
        ),
        qs AS (
            SELECT event_type,
                   CAST(quantile_disc(cents, 0.1) AS BIGINT) AS q10,
                   CAST(quantile_disc(cents, 0.5) AS BIGINT) AS q50,
                   CAST(quantile_disc(cents, 0.9) AS BIGINT) AS q90
            FROM train GROUP BY event_type
        ),
        test AS (
            SELECT event_type, cents FROM daily
            WHERE day >= TIMESTAMP '{_PINBALL_SPLIT}'
        ),
        loss AS (
            SELECT t.event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_test_days,
                   SUM(CASE WHEN t.cents >= q.q10
                            THEN 0.1 * (t.cents - q.q10)
                            ELSE 0.9 * (q.q10 - t.cents) END) / COUNT(*)
                       / 100.0 AS pinball_q10,
                   SUM(CASE WHEN t.cents >= q.q50
                            THEN 0.5 * (t.cents - q.q50)
                            ELSE 0.5 * (q.q50 - t.cents) END) / COUNT(*)
                       / 100.0 AS pinball_q50,
                   SUM(CASE WHEN t.cents >= q.q90
                            THEN 0.9 * (t.cents - q.q90)
                            ELSE 0.1 * (q.q90 - t.cents) END) / COUNT(*)
                       / 100.0 AS pinball_q90,
                   SUM(CASE WHEN t.cents <= q.q90 AND t.cents >= q.q10
                            THEN 1.0 ELSE 0 END) / COUNT(*) AS coverage_80
            FROM test t JOIN qs q USING (event_type)
            GROUP BY t.event_type
        )
        SELECT event_type, n_test_days,
               ROUND(pinball_q10, 4) AS pinball_q10,
               ROUND(pinball_q50, 4) AS pinball_q50,
               ROUND(pinball_q90, 4) AS pinball_q90,
               ROUND(coverage_80, 4) AS coverage_80
        FROM loss
    """,
    doc=(
        "PINBALL-LOSS QUANTILE BACKTEST: per event_type, constant "
        "q10/q50/q90 forecasts fitted on the pre-split training days "
        "(exact discrete quantiles of integer daily cents, tie "
        "convention pinned by quantile_disc <-> the cumulative-count "
        "selection) are scored on the held-out days with the PINBALL "
        "(quantile) loss — the proper scoring rule for quantile "
        "forecasts that MAE/RMSE cannot replace (it is minimized "
        "exactly by the true quantile), plus the empirical 80% "
        "interval coverage. Completes the forecast-eval story next to "
        "seasonal_naive_backtest (point forecasts) and "
        "conformal_interval_coverage (calibrated intervals). All "
        "arithmetic is exact integer cents scaled once at the end; the "
        "day grid bounds every window."
    ),
    tags=("timeseries", "statistics", "evals"),
)
def pinball_loss_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(_PINBALL_SPLIT).cast("timestamp")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    train = daily.filter(F.col("day") < split)
    # exact discrete quantiles via sorted-array selection on the bounded
    # per-type day list (<= day-span values per type)
    qs = train.groupBy("event_type").agg(
        F.sort_array(F.collect_list("cents")).alias("xs")
    )

    def qsel(q: float):
        # quantile_disc convention: element at ceil(q * n) (1-based)
        n = F.size("xs")
        idx = F.greatest(F.ceil(q * n), F.lit(1)).cast("int")
        return F.element_at("xs", idx).cast("bigint")

    qs = qs.select(
        "event_type",
        qsel(0.1).alias("q10"),
        qsel(0.5).alias("q50"),
        qsel(0.9).alias("q90"),
    )
    test = daily.filter(F.col("day") >= split)

    def pinball(q: float, qcol: str):
        c, qq = F.col("cents"), F.col(qcol)
        return F.sum(
            F.when(c >= qq, F.lit(q) * (c - qq)).otherwise(
                F.lit(1.0 - q) * (qq - c)
            )
        ) / F.count(F.lit(1)) / F.lit(100.0)

    loss = test.join(F.broadcast(qs), "event_type").groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test_days"),
        F.round(pinball(0.1, "q10"), 4).alias("pinball_q10"),
        F.round(pinball(0.5, "q50"), 4).alias("pinball_q50"),
        F.round(pinball(0.9, "q90"), 4).alias("pinball_q90"),
        F.round(
            F.sum(
                F.when(
                    (F.col("cents") <= F.col("q90"))
                    & (F.col("cents") >= F.col("q10")),
                    F.lit(1.0),
                ).otherwise(0)
            )
            / F.count(F.lit(1)),
            4,
        ).alias("coverage_80"),
    )
    return loss


# ---------------------------------------------------------------------------
# Mann-Kendall trend test (round-6a): the significance partner of the
# Theil-Sen slope.
# ---------------------------------------------------------------------------

# shared A&S tail constants (house convention; see mann_whitney_u_test)
_MK_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_MK_AS_P = 0.2316419


def _mk_sf_sql(z: str) -> str:
    t = f"(1.0 / (1.0 + {_MK_AS_P} * {z}))"
    poly = (
        f"({t} * ({_MK_AS_B[0]} + {t} * ({_MK_AS_B[1]} + {t} * ({_MK_AS_B[2]}"
        f" + {t} * ({_MK_AS_B[3]} + {t} * {_MK_AS_B[4]})))))"
    )
    return f"(exp(-({z}) * ({z}) / 2.0) / sqrt(2.0 * pi()) * {poly})"


@register(
    "mann_kendall_trend",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a.event_type,
                   CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                                 WHEN b.cents < a.cents THEN -1
                                 ELSE 0 END) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND b.day > a.day
            GROUP BY a.event_type
        ),
        counts AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(t3t) AS BIGINT) AS tie_term
            FROM (
                SELECT event_type, cents,
                       COUNT(*) * (COUNT(*) - 1) * (2 * COUNT(*) + 5) AS t3t
                FROM daily GROUP BY event_type, cents
            ) g
            GROUP BY event_type
        ),
        stat AS (
            SELECT p.event_type, p.s, c.n,
                   (c.n * (c.n - 1.0) * (2.0 * c.n + 5.0) - c.tie_term)
                   / 18.0 AS var_s
            FROM pairs p JOIN counts c USING (event_type)
        ),
        z AS (
            SELECT event_type, s, n, var_s,
                   CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                        WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                        ELSE 0.0 END AS z
            FROM stat
        )
        SELECT event_type, n AS n_days, s AS mk_s,
               ROUND(z, 6) AS z_score,
               ROUND(2.0 * {_mk_sf_sql("abs(z)")}, 6) AS p_value,
               z > 0 AS increasing
        FROM z
    """,
    doc=(
        "MANN-KENDALL TREND TEST per event_type on the daily value "
        "series: S = sum over day pairs of sign(x_later - x_earlier), "
        "tie-corrected variance n(n-1)(2n+5)/18 - sum t(t-1)(2t+5)/18, "
        "continuity-corrected z, two-sided p via the shared A&S tail — "
        "the distribution-free 'is there a monotonic trend AT ALL' "
        "test that partners theilsen_trend_by_user's slope estimate "
        "with its significance (slope says how steep; MK says whether "
        "to believe it). The pair sum runs as a self-join over the "
        "BOUNDED day grid per type (day-span^2 tuples, a constant of "
        "the observation window, never of row count); every quantity "
        "is an exact bigint until z. Integer cents make sign() exact."
    ),
    tags=("timeseries", "statistics", "quality"),
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    a = daily.select(
        F.col("event_type").alias("et"),
        F.col("day").alias("da"),
        F.col("cents").alias("ca"),
    )
    b = daily.select(
        F.col("event_type").alias("et"),
        F.col("day").alias("db"),
        F.col("cents").alias("cb"),
    )
    pairs = (
        a.join(b, "et")
        .filter(F.col("db") > F.col("da"))
        .groupBy("et")
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s")
        )
    )
    counts = (
        daily.groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("t").cast("bigint").alias("n"),
            F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5))
            .cast("bigint")
            .alias("tie_term"),
        )
    )
    j = pairs.withColumnRenamed("et", "event_type").join(counts, "event_type")
    n = F.col("n")
    var_s = (n * (n - 1.0) * (2.0 * n + 5.0) - F.col("tie_term")) / F.lit(18.0)
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(var_s))
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    az = F.abs(z)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_MK_AS_P) * az)
    poly = t * (
        F.lit(_MK_AS_B[0])
        + t
        * (
            F.lit(_MK_AS_B[1])
            + t * (F.lit(_MK_AS_B[2]) + t * (F.lit(_MK_AS_B[3]) + t * F.lit(_MK_AS_B[4])))
        )
    )
    p = (
        F.lit(2.0)
        * F.exp(-az * az / F.lit(2.0))
        / F.sqrt(F.lit(2.0) * F.lit(math.pi))
        * poly
    )
    return j.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("s").alias("mk_s"),
        F.round(z, 6).alias("z_score"),
        F.round(p, 6).alias("p_value"),
        (z > 0).alias("increasing"),
    )


# ---------------------------------------------------------------------------
# Cross-correlation lead-lag panel: which daily series LEADS which.
# ---------------------------------------------------------------------------

_CCF_MAX_LAG = 7


@register(
    "ccf_click_purchase_leadlag",
    oracle=f"""
        WITH daily AS (
            SELECT date_diff('day', DATE '1970-01-01',
                             CAST(date_trunc('day', ts) AS DATE)) AS d,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                        AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                        AS BIGINT) AS y
            FROM events GROUP BY 1
        ),
        lags AS (
            SELECT unnest(range(-{_CCF_MAX_LAG}, {_CCF_MAX_LAG} + 1)) AS lag
        ),
        pairs AS (
            SELECT lags.lag,
                   a.x AS x, b.y AS y
            FROM lags
            JOIN daily a ON TRUE
            JOIN daily b ON b.d = a.d + lags.lag
        ),
        mom AS (
            SELECT lag,
                   CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy
            FROM pairs GROUP BY lag
        )
        SELECT CAST(lag AS BIGINT) AS lag, n_days, sx, sy, sxy, sxx, syy,
               ROUND((n_days * 1.0 * sxy - sx * 1.0 * sy)
                     / sqrt((n_days * 1.0 * sxx - sx * 1.0 * sx)
                            * (n_days * 1.0 * syy - sy * 1.0 * sy)), 6)
                   AS ccf
        FROM mom
    """,
    doc=(
        "CROSS-CORRELATION FUNCTION between the daily click-count and "
        "purchase-count series at lags -7..+7 — the LEAD-LAG discovery "
        "panel beside the single-series ACF: a peak at positive lag "
        "says clicks LEAD purchases by that many days (the attribution "
        "window a marketing model should use); a negative-lag peak "
        "says the causality assumption is backwards. Pearson r per lag "
        "over the overlapping days, with all six sufficient statistics "
        "(overlap count, both sums, cross- and self-products) as EXACT "
        "BIGINTs in the hashed output — daily counts are integers, so "
        "unlike the ACF's rounded daily totals nothing is quantized "
        "before the moments and the r finish is one mirrored rounded "
        "expression. Days are keyed by integer epoch-day (a "
        "date_diff both engines compute identically; no interval "
        "arithmetic or timezone exposure in the join key). Plan: one "
        "conditional-count rollup collapses the fact table to the "
        "bounded |days| grid; the 15-lag band join and everything "
        "after run on that grid ONLY (|days| x 15 rows) — at 100 TB "
        "the single corpus-sized stage is the first aggregate, the "
        "same shape as the ACF/CUSUM family."
    ),
    tags=("timeseries", "statistics", "analytics"),
)
def ccf_click_purchase_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("d")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("y"),
    )
    lags = spark.range(-_CCF_MAX_LAG, _CCF_MAX_LAG + 1).select(
        F.col("id").cast("bigint").alias("lag")
    )
    a = daily.select(F.col("d").alias("da"), "x")
    b = daily.select(F.col("d").alias("db"), "y")
    pairs = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(b, F.col("db") == F.col("da") + F.col("lag"))
    )
    mom = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    nd = F.col("n_days") * F.lit(1.0)
    num = nd * F.col("sxy") - F.col("sx") * F.lit(1.0) * F.col("sy")
    den = F.sqrt(
        (nd * F.col("sxx") - F.col("sx") * F.lit(1.0) * F.col("sx"))
        * (nd * F.col("syy") - F.col("sy") * F.lit(1.0) * F.col("sy"))
    )
    return mom.select(
        "lag",
        "n_days",
        "sx",
        "sy",
        "sxy",
        "sxx",
        "syy",
        F.round(num / den, 6).alias("ccf"),
    )


# ---------------------------------------------------------------------------
# Round 9: Western Electric runs rules — the pattern-based control-chart
# monitor beside the cumulative CUSUM and the EWMA smoother.
# ---------------------------------------------------------------------------


@register(
    "western_electric_rules",
    oracle="""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS d,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ),
        mom AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS s,
                   CAST(SUM(cents * cents) AS BIGINT) AS ss
            FROM daily GROUP BY event_type
        ),
        zed AS (
            SELECT d.event_type, d.d, d.cents,
                   (d.cents - m.s * 1.0 / m.n)
                   / SQRT(m.ss * 1.0 / m.n
                          - (m.s * 1.0 / m.n) * (m.s * 1.0 / m.n)) AS z
            FROM daily d JOIN mom m USING (event_type)
        ),
        flags AS (
            SELECT event_type, d, cents, z,
                   CASE WHEN ABS(z) > 3.0 THEN 1 ELSE 0 END AS r1,
                   CASE WHEN SUM(CASE WHEN z > 2.0 THEN 1 ELSE 0 END)
                            OVER w3 >= 2
                          OR SUM(CASE WHEN z < -2.0 THEN 1 ELSE 0 END)
                            OVER w3 >= 2
                        THEN 1 ELSE 0 END AS r2,
                   CASE WHEN SUM(CASE WHEN z > 1.0 THEN 1 ELSE 0 END)
                            OVER w5 >= 4
                          OR SUM(CASE WHEN z < -1.0 THEN 1 ELSE 0 END)
                            OVER w5 >= 4
                        THEN 1 ELSE 0 END AS r3,
                   CASE WHEN SUM(CASE WHEN z > 0.0 THEN 1 ELSE 0 END)
                            OVER w8 = 8
                          OR SUM(CASE WHEN z < 0.0 THEN 1 ELSE 0 END)
                            OVER w8 = 8
                        THEN 1 ELSE 0 END AS r4
            FROM zed
            WINDOW w3 AS (PARTITION BY event_type ORDER BY d
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                   w5 AS (PARTITION BY event_type ORDER BY d
                          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
                   w8 AS (PARTITION BY event_type ORDER BY d
                          ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
        )
        SELECT event_type, d, cents, ROUND(z, 6) AS z_score,
               r1, r2, r3, r4,
               CASE WHEN r1 + r2 + r3 + r4 > 0 THEN 1 ELSE 0 END
                   AS any_signal
        FROM flags
        WHERE r1 + r2 + r3 + r4 > 0
    """,
    doc=(
        "WESTERN ELECTRIC RUNS RULES over the per-type daily value "
        "series — the pattern-based control-chart monitor that catches "
        "what a single-point 3-sigma check misses (drifts and "
        "sustained shifts that never breach 3 sigma): R1 = point "
        "beyond 3 sigma; R2 = 2 of 3 consecutive beyond 2 sigma on "
        "the same side; R3 = 4 of 5 consecutive beyond 1 sigma same "
        "side; R4 = 8 consecutive on one side of center. Completes "
        "the monitoring family: CUSUM accumulates small persistent "
        "shifts, EWMA smooths, WE rules pattern-match the zones. "
        "Center/sigma are the per-type population moments of the "
        "DAILY-GRID values, computed from exact BIGINT cents sums "
        "with the identical double expression in both engines (IEEE "
        "ops in the same order are bit-deterministic, sqrt is "
        "correctly rounded); the rule windows are short lag frames "
        "(2/4/7 preceding) over the day-span-bounded grid partitioned "
        "by type. Same-side counting is literal ('2 of 3 ABOVE +2' OR "
        "'2 of 3 BELOW -2'), not net-sign arithmetic. One (type, day) "
        "hash aggregate is the only corpus-scale shuffle; the output "
        "is the flagged-day exception report."
    ),
    tags=("timeseries", "statistics", "monitoring", "window"),
)
def western_electric_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("bigint").alias("ss"),
    )
    mean = F.col("s") * F.lit(1.0) / F.col("n")
    var = F.col("ss") * F.lit(1.0) / F.col("n") - mean * mean
    zed = daily.join(F.broadcast(mom), "event_type").select(
        "event_type",
        "d",
        "cents",
        ((F.col("cents") - mean) / F.sqrt(var)).alias("z"),
    )
    w3 = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-2, 0)
    )
    w5 = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-4, 0)
    )
    w8 = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-7, 0)
    )

    def above(th):
        return F.when(F.col("z") > th, 1).otherwise(0)

    def below(th):
        return F.when(F.col("z") < th, 1).otherwise(0)

    flags = zed.select(
        "event_type",
        "d",
        "cents",
        "z",
        F.when(F.abs(F.col("z")) > 3.0, 1).otherwise(0).alias("r1"),
        F.when(
            (F.sum(above(2.0)).over(w3) >= 2)
            | (F.sum(below(-2.0)).over(w3) >= 2),
            1,
        )
        .otherwise(0)
        .alias("r2"),
        F.when(
            (F.sum(above(1.0)).over(w5) >= 4)
            | (F.sum(below(-1.0)).over(w5) >= 4),
            1,
        )
        .otherwise(0)
        .alias("r3"),
        F.when(
            (F.sum(above(0.0)).over(w8) == 8)
            | (F.sum(below(0.0)).over(w8) == 8),
            1,
        )
        .otherwise(0)
        .alias("r4"),
    )
    return flags.filter(
        F.col("r1") + F.col("r2") + F.col("r3") + F.col("r4") > 0
    ).select(
        "event_type",
        "d",
        "cents",
        F.round(F.col("z"), 6).alias("z_score"),
        "r1",
        "r2",
        "r3",
        "r4",
        F.when(
            F.col("r1") + F.col("r2") + F.col("r3") + F.col("r4") > 0, 1
        )
        .otherwise(0)
        .alias("any_signal"),
    )


# ---------------------------------------------------------------------------
# Round-10 randomness/autocorrelation diagnostics: Ljung-Box, the
# Wald-Wolfowitz runs test, and the turning-point test — the "is this
# series even serially dependent / non-random" screens that partner the
# monitoring family (CUSUM/EWMA/Western-Electric say WHERE a shift is;
# these say whether the residual series is white at all).
# ---------------------------------------------------------------------------

_LB_MAX_LAG = 7  # Ljung-Box lags tested (df = m); matches the CCF band


@register(
    "ljung_box_autocorr",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   date_diff('day', DATE '1970-01-01',
                             CAST(date_trunc('day', ts) AS DATE)) AS d,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY 1, 2
        ),
        mom AS (
            -- squared daily cents overflow int64 at large scale:
            -- accumulate in HUGEINT (Spark: DECIMAL(38,0)), the
            -- bland_altman / linear-CKA exact-moment convention
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS s,
                   SUM(CAST(cents AS HUGEINT) * cents) AS ss
            FROM daily GROUP BY event_type
        ),
        lags AS (SELECT unnest(range(1, {_LB_MAX_LAG} + 1)) AS lag),
        lagged AS (
            SELECT a.event_type, lags.lag,
                   SUM(CAST(a.cents AS HUGEINT) * b.cents) AS c_k,
                   CAST(SUM(b.cents) AS BIGINT) AS head_k,
                   CAST(SUM(a.cents) AS BIGINT) AS tail_k,
                   CAST(COUNT(*) AS BIGINT) AS n_k
            FROM lags
            JOIN daily a ON TRUE
            JOIN daily b ON b.event_type = a.event_type
                        AND b.d = a.d - lags.lag
            GROUP BY 1, 2
        ),
        rk AS (
            -- r_k scaled by n^2 in both numerator and denominator so
            -- every term is an exact HUGEINT before ONE double division:
            -- n^2*num = n^2*C_k - n*S*(head+tail) + n_k*S^2
            -- n^2*den = n^2*SS - n*S^2
            SELECT l.event_type, l.lag, m.n,
                   CAST(CAST(m.n AS HUGEINT) * m.n * l.c_k
                        - CAST(m.n AS HUGEINT) * m.s * (l.head_k + l.tail_k)
                        + CAST(l.n_k AS HUGEINT) * m.s * m.s AS DOUBLE)
                   / CAST(CAST(m.n AS HUGEINT) * m.n * m.ss
                          - CAST(m.n AS HUGEINT) * m.s * m.s AS DOUBLE)
                       AS r_k
            FROM lagged l JOIN mom m USING (event_type)
        ),
        q AS (
            SELECT event_type, MAX(n) AS n,
                   SUM(r_k * r_k / (n - lag)) AS qsum,
                   MAX(CASE WHEN lag = 1 THEN r_k END) AS r1,
                   CAST(COUNT(*) AS BIGINT) AS m
            FROM rk GROUP BY event_type
        ),
        stat AS (
            SELECT event_type, n AS n_days, m AS df, r1,
                   n * (n + 2.0) * qsum AS lb_q
            FROM q
        ),
        wh AS (
            SELECT event_type, n_days, df, r1, lb_q,
                   (pow(lb_q / df, 1.0 / 3.0)
                    - (1.0 - 2.0 / (9.0 * df)))
                   / sqrt(2.0 / (9.0 * df)) AS z_wh
            FROM stat
        )
        SELECT event_type, n_days, CAST(df AS BIGINT) AS df,
               ROUND(r1, 6) AS r1,
               ROUND(lb_q, 6) AS lb_q,
               ROUND({normal_sf_signed_sql("z_wh")}, 6) AS p_wilson_hilferty
        FROM wh
    """,
    doc=(
        "LJUNG-BOX PORTMANTEAU TEST per event_type on the daily cents "
        f"series: Q = n(n+2) * sum_k r_k^2/(n-k) over lags 1..{_LB_MAX_LAG} "
        "— the 'is there ANY serial correlation' omnibus that must "
        "reject before an AR model (pacf_durbin_levinson picks the "
        "order) or a monitoring chart (CUSUM/EWMA assume exchangeable "
        "residuals) is trusted. Autocorrelations use the standard "
        "full-series-mean ACF (not per-lag Pearson): each r_k is the "
        "exact integer form n^2*C_k - n*S*(head+tail) + n_k*S^2 over "
        "n^2*SS - n*S^2, accumulated in HUGEINT/DECIMAL(38,0) because "
        "squared daily cents overflow int64 at corpus scale, divided "
        "ONCE into a double. p via the Wilson-Hilferty cube-root map "
        "at df=m through the shared signed A&S tail. Plan: one "
        "corpus-scale (type, day) aggregate; the lag co-moments are a "
        f"{_LB_MAX_LAG}-band self-join ON THE BOUNDED DAY GRID (day-span "
        "x lags tuples per type, a constant of the observation window); "
        "nothing else shuffles at 100 TB."
    ),
    tags=("timeseries", "statistics", "quality", "monitoring"),
)
def ljung_box_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_stream_processor_spark.operators._normal_tail import (
        normal_sf_col,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"), F.lit("1970-01-01").cast("date")
        ).cast("bigint").alias("d"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    dec = "decimal(38,0)"
    from weather_stream_processor_spark.plans.caching import persisted_result

    # the day grid feeds the moment pass AND both sides of the lag
    # self-join: without the persist, Catalyst plans THREE scans of the
    # events parquet (the scan-count audit that followed the
    # wald_wolfowitz pin found it) — persist the bounded grid (~day-span
    # x |types| rows) so the corpus is scanned once
    def _build(daily: DataFrame) -> DataFrame:
        spark = daily.sparkSession
        mom = daily.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("s"),
            F.sum(F.col("cents").cast(dec) * F.col("cents")).alias("ss"),
        )
        lags = spark.range(1, _LB_MAX_LAG + 1).select(F.col("id").alias("lag"))
        a = daily.select(
            F.col("event_type").alias("et"), F.col("d").alias("da"),
            F.col("cents").alias("ca"),
        )
        b = daily.select(
            F.col("event_type").alias("et_b"), F.col("d").alias("db"),
            F.col("cents").alias("cb"),
        )
        # the CCF construction: broadcast the bounded lag frame onto the
        # day grid, then EQUI-join the lagged side on the computed day
        # key — the only nested-loop site is the 7-row lags cross
        lagged = (
            F.broadcast(lags)
            .crossJoin(a)
            .join(
                b,
                (F.col("et_b") == F.col("et"))
                & (F.col("db") == F.col("da") - F.col("lag")),
            )
            .groupBy(F.col("et").alias("event_type"), "lag")
            .agg(
                F.sum(F.col("ca").cast(dec) * F.col("cb")).alias("c_k"),
                F.sum("cb").cast("bigint").alias("head_k"),
                F.sum("ca").cast("bigint").alias("tail_k"),
                F.count(F.lit(1)).cast("bigint").alias("n_k"),
            )
        )
        return _ljung_finish(lagged, mom)

    return persisted_result(daily, _build)


def _ljung_finish(lagged: DataFrame, mom: DataFrame) -> DataFrame:
    from weather_stream_processor_spark.operators._normal_tail import (
        normal_sf_col,
    )

    dec = "decimal(38,0)"
    num = (
        F.col("n").cast(dec) * F.col("n") * F.col("c_k")
        - F.col("n").cast(dec) * F.col("s") * (F.col("head_k") + F.col("tail_k"))
        + F.col("n_k").cast(dec) * F.col("s") * F.col("s")
    ).cast("double")
    den = (
        F.col("n").cast(dec) * F.col("n") * F.col("ss")
        - F.col("n").cast(dec) * F.col("s") * F.col("s")
    ).cast("double")
    rk = lagged.join(mom, "event_type").select(
        "event_type", "lag", "n", (num / den).alias("r_k")
    )
    q = rk.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.sum(F.col("r_k") * F.col("r_k") / (F.col("n") - F.col("lag"))).alias(
            "qsum"
        ),
        F.max(F.when(F.col("lag") == 1, F.col("r_k"))).alias("r1"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    n = F.col("n").cast("double")
    df_ = F.col("m").cast("double")
    lb_q = n * (n + 2) * F.col("qsum")
    stat = q.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("m").alias("df"),
        "r1",
        lb_q.alias("lb_q"),
        df_.alias("dfd"),
    )
    z_wh = (
        F.pow(F.col("lb_q") / F.col("dfd"), F.lit(1.0) / F.lit(3.0))
        - (F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * F.col("dfd")))
    ) / F.sqrt(F.lit(2.0) / (F.lit(9.0) * F.col("dfd")))
    p = F.when(z_wh >= 0, normal_sf_col(z_wh)).otherwise(
        F.lit(1.0) - normal_sf_col(-z_wh)
    )
    return stat.select(
        "event_type",
        "n_days",
        F.col("df").cast("bigint").alias("df"),
        F.round("r1", 6).alias("r1"),
        F.round("lb_q", 6).alias("lb_q"),
        F.round(p, 6).alias("p_wilson_hilferty"),
    )


@register(
    "wald_wolfowitz_runs",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   date_diff('day', DATE '1970-01-01',
                             CAST(date_trunc('day', ts) AS DATE)) AS d,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY 1, 2
        ),
        withtot AS (
            -- per-type totals as WINDOWS over the bounded day grid, not
            -- a join back to a re-aggregated copy: the join form made
            -- Catalyst scan the events parquet twice (caught by the
            -- test_plans scan pin); the window runs on the grid only
            SELECT event_type, d, cents,
                   CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                       AS n,
                   CAST(SUM(cents) OVER (PARTITION BY event_type) AS BIGINT)
                       AS s
            FROM daily
        ),
        signs AS (
            -- above/below the per-type mean decided by the exact integer
            -- cross-multiplication cents*n <> s (the mantel_haenszel
            -- outcome convention: no division, no float, no tie
            -- ambiguity); exact-equal days are excluded, the standard
            -- runs-test treatment of cutpoint ties
            SELECT event_type, d,
                   CASE WHEN cents * n > s THEN 1 ELSE 0 END AS sgn
            FROM withtot
            WHERE cents * n <> s
        ),
        runs AS (
            SELECT event_type,
                   CAST(SUM(sgn) AS BIGINT) AS n1,
                   CAST(COUNT(*) - SUM(sgn) AS BIGINT) AS n2,
                   CAST(1 + SUM(CASE WHEN sgn <> prev THEN 1 ELSE 0 END)
                        AS BIGINT) AS r
            FROM (
                SELECT event_type, sgn,
                       LAG(sgn) OVER (
                           PARTITION BY event_type ORDER BY d) AS prev
                FROM signs)
            GROUP BY event_type
        ),
        stat AS (
            SELECT event_type, n1, n2, r,
                   2.0 * n1 * n2 / (n1 + n2) + 1.0 AS e_r,
                   (2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2))
                   / ((n1 + n2) * 1.0 * (n1 + n2) * (n1 + n2 - 1)) AS var_r
            FROM runs
            WHERE n1 > 0 AND n2 > 0 AND n1 + n2 > 1
        ),
        zed AS (
            SELECT event_type, n1, n2, r, e_r,
                   (r - e_r) / sqrt(var_r) AS z
            FROM stat
        )
        SELECT event_type, n1 AS n_above, n2 AS n_below, r AS n_runs,
               ROUND(e_r, 6) AS expected_runs,
               ROUND(z, 6) AS z_score,
               ROUND(2.0 * {{SF}}, 6) AS p_value
        FROM zed
    """.replace("{SF}", normal_sf_sql("abs(z)")),
    doc=(
        "WALD-WOLFOWITZ RUNS TEST per event_type on the daily cents "
        "series: is the sequence of above-mean/below-mean days RANDOM, "
        "or does it cluster (too few runs = regime persistence / level "
        "shifts; too many = oscillation)? The distribution-free "
        "randomness screen that complements Ljung-Box (which sees "
        "linear autocorrelation only — runs clustering catches "
        "nonlinear persistence too). Above/below is decided by the "
        "exact integer cross-product cents*n vs s — no float mean, no "
        "tie ambiguity; exact-equal days are excluded per the standard "
        "treatment. R = 1 + sign changes via LAG over the bounded "
        "per-type day grid; E[R] = 2*n1*n2/(n1+n2) + 1 and the classic "
        "variance give z, two-sided p through the shared A&S tail. "
        "Types with a degenerate split (n1=0 or n2=0) are excluded — "
        "the statistic is undefined there. One corpus-scale (type, "
        "day) aggregate; everything after lives on the day grid."
    ),
    tags=("timeseries", "statistics", "quality", "monitoring"),
)
def wald_wolfowitz_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from weather_stream_processor_spark.operators._normal_tail import (
        normal_sf_col,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"),
            F.lit("1970-01-01").cast("date"),
        ).cast("bigint").alias("d"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    # per-type totals as windows over the bounded day grid — the join
    # form re-scanned the events parquet (test_plans scan pin)
    w_type = Window.partitionBy("event_type")
    withtot = daily.select(
        "event_type",
        "d",
        "cents",
        F.count(F.lit(1)).over(w_type).cast("bigint").alias("n"),
        F.sum("cents").over(w_type).cast("bigint").alias("s"),
    )
    signs = withtot.filter(
        F.col("cents") * F.col("n") != F.col("s")
    ).select(
        "event_type",
        "d",
        F.when(F.col("cents") * F.col("n") > F.col("s"), 1)
        .otherwise(0)
        .alias("sgn"),
    )
    # per-type day grid: bounded by the observation window, never corpus
    w_day = Window.partitionBy("event_type").orderBy("d")
    runs = (
        signs.select(
            "event_type", "sgn", F.lag("sgn").over(w_day).alias("prev")
        )
        .groupBy("event_type")
        .agg(
            F.sum("sgn").cast("bigint").alias("n1"),
            (F.count(F.lit(1)) - F.sum("sgn")).cast("bigint").alias("n2"),
            (
                1
                + F.sum(
                    F.when(F.col("sgn") != F.col("prev"), 1).otherwise(0)
                )
            )
            .cast("bigint")
            .alias("r"),
        )
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    e_r = F.lit(2.0) * n1 * n2 / (n1 + n2) + F.lit(1.0)
    var_r = (
        F.lit(2.0) * n1 * n2 * (F.lit(2.0) * n1 * n2 - n1 - n2)
    ) / ((n1 + n2) * F.lit(1.0) * (n1 + n2) * (n1 + n2 - 1))
    stat = runs.filter((n1 > 0) & (n2 > 0) & (n1 + n2 > 1)).select(
        "event_type", "n1", "n2", "r", e_r.alias("e_r"), var_r.alias("var_r")
    )
    z = (F.col("r") - F.col("e_r")) / F.sqrt(F.col("var_r"))
    return stat.select(
        "event_type",
        F.col("n1").alias("n_above"),
        F.col("n2").alias("n_below"),
        F.col("r").alias("n_runs"),
        F.round(F.col("e_r"), 6).alias("expected_runs"),
        F.round(z, 6).alias("z_score"),
        F.round(F.lit(2.0) * normal_sf_col(F.abs(z)), 6).alias("p_value"),
    )


@register(
    "turning_point_test",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   date_diff('day', DATE '1970-01-01',
                             CAST(date_trunc('day', ts) AS DATE)) AS d,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY 1, 2
        ),
        nb AS (
            SELECT event_type, cents,
                   LAG(cents) OVER (
                       PARTITION BY event_type ORDER BY d) AS prev,
                   LEAD(cents) OVER (
                       PARTITION BY event_type ORDER BY d) AS nxt
            FROM daily
        ),
        tp AS (
            SELECT event_type,
                   CAST(COUNT(*) + 2 AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN (prev < cents AND nxt < cents)
                                   OR (prev > cents AND nxt > cents)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS t
            FROM nb
            WHERE prev IS NOT NULL AND nxt IS NOT NULL
            GROUP BY event_type
        ),
        stat AS (
            SELECT event_type, n, t,
                   2.0 * (n - 2) / 3.0 AS e_t,
                   (16.0 * n - 29.0) / 90.0 AS var_t
            FROM tp WHERE n > 3
        ),
        zed AS (
            SELECT event_type, n, t, e_t,
                   (t - e_t) / sqrt(var_t) AS z
            FROM stat
        )
        SELECT event_type, n AS n_days, t AS n_turning,
               ROUND(e_t, 6) AS expected_turning,
               ROUND(z, 6) AS z_score,
               ROUND(2.0 * {{SF}}, 6) AS p_value
        FROM zed
    """.replace("{SF}", normal_sf_sql("abs(z)")),
    doc=(
        "TURNING-POINT TEST per event_type on the daily cents series "
        "(Kendall's classic randomness check): count interior days that "
        "are a STRICT local max or min of their 3-day neighborhood; "
        "under i.i.d. randomness E[T] = 2(n-2)/3 and Var[T] = "
        "(16n-29)/90, so too few turning points flags trend/persistence "
        "and too many flags alternation — the third member of the "
        "randomness-diagnostics trio (Ljung-Box: linear "
        "autocorrelation; runs test: above-mean clustering; turning "
        "points: local-extremum rate). Strict inequalities on exact "
        "integer cents make tie handling deterministic (a flat "
        "neighbor is NOT a turning point, the conservative "
        "convention); types with n <= 3 are excluded (the moments are "
        "undefined). LAG/LEAD run on the bounded per-type day grid; "
        "the single corpus-scale operation is the (type, day) "
        "aggregate, identical in shape to every daily-series operator "
        "at 100 TB."
    ),
    tags=("timeseries", "statistics", "quality", "monitoring"),
)
def turning_point_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from weather_stream_processor_spark.operators._normal_tail import (
        normal_sf_col,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"),
            F.lit("1970-01-01").cast("date"),
        ).cast("bigint").alias("d"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w_day = Window.partitionBy("event_type").orderBy("d")
    nb = daily.select(
        "event_type",
        "cents",
        F.lag("cents").over(w_day).alias("prev"),
        F.lead("cents").over(w_day).alias("nxt"),
    )
    is_tp = (
        ((F.col("prev") < F.col("cents")) & (F.col("nxt") < F.col("cents")))
        | ((F.col("prev") > F.col("cents")) & (F.col("nxt") > F.col("cents")))
    )
    tp = (
        nb.filter(F.col("prev").isNotNull() & F.col("nxt").isNotNull())
        .groupBy("event_type")
        .agg(
            (F.count(F.lit(1)) + 2).cast("bigint").alias("n"),
            F.sum(F.when(is_tp, 1).otherwise(0)).cast("bigint").alias("t"),
        )
    )
    n, t = F.col("n"), F.col("t")
    e_t = F.lit(2.0) * (n - 2) / F.lit(3.0)
    var_t = (F.lit(16.0) * n - F.lit(29.0)) / F.lit(90.0)
    stat = tp.filter(n > 3).select(
        "event_type", "n", "t", e_t.alias("e_t"), var_t.alias("var_t")
    )
    z = (F.col("t") - F.col("e_t")) / F.sqrt(F.col("var_t"))
    return stat.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("t").alias("n_turning"),
        F.round(F.col("e_t"), 6).alias("expected_turning"),
        F.round(z, 6).alias("z_score"),
        F.round(F.lit(2.0) * normal_sf_col(F.abs(z)), 6).alias("p_value"),
    )


_KUPIEC_P = 0.1  # VaR coverage under test: P(breach) = 1 - 0.9


@register(
    "kupiec_pof_backtest",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY 1, 2
        ),
        train AS (
            SELECT event_type, cents FROM daily
            WHERE day < TIMESTAMP '{_PINBALL_SPLIT}'
        ),
        qs AS (
            SELECT event_type,
                   CAST(quantile_disc(cents, 0.9) AS BIGINT) AS var90
            FROM train GROUP BY event_type
        ),
        test AS (
            SELECT event_type, cents FROM daily
            WHERE day >= TIMESTAMP '{_PINBALL_SPLIT}'
        ),
        breaches AS (
            SELECT t.event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN t.cents > q.var90
                                 THEN 1 ELSE 0 END) AS BIGINT) AS x
            FROM test t JOIN qs q USING (event_type)
            GROUP BY t.event_type
        ),
        lr AS (
            -- x*ln(x/n) and (n-x)*ln(1-x/n) with the 0*ln(0) = 0
            -- convention made explicit (x = 0 and x = n are legal)
            SELECT event_type, n, x,
                   -2.0 * ((n - x) * ln(1.0 - {_KUPIEC_P!r})
                           + x * ln({_KUPIEC_P!r})
                           - (CASE WHEN x < n
                                   THEN (n - x) * ln(1.0 - x * 1.0 / n)
                                   ELSE 0.0 END)
                           - (CASE WHEN x > 0
                                   THEN x * ln(x * 1.0 / n)
                                   ELSE 0.0 END)) AS lr_pof
            FROM breaches WHERE n > 0
        )
        SELECT event_type, n AS n_test_days, x AS n_breaches,
               ROUND(x * 1.0 / n, 6) AS breach_rate,
               ROUND(lr_pof, 6) AS lr_pof,
               ROUND(2.0 * {{SF}}, 6) AS p_value
        FROM lr
    """.replace("{SF}", normal_sf_sql("sqrt(lr_pof)")),
    doc=(
        "KUPIEC PROPORTION-OF-FAILURES BACKTEST of the q90 daily-revenue "
        "VaR forecast: the likelihood-ratio test LR = -2 ln[(1-p)^(n-x) "
        "p^x / ((1-x/n)^(n-x) (x/n)^x)] of whether the OBSERVED breach "
        "count x out of n held-out days is consistent with the promised "
        "10% breach rate — the SIGNIFICANCE layer pinball_loss_backtest's "
        "raw coverage_80 column lacks (12% observed vs 10% promised: "
        "bad luck or a broken forecast? Kupiec answers with a p-value; "
        "this is the Basel-style VaR validation run against every "
        "quantile forecaster). Same train/test split and exact integer "
        "quantile convention as pinball_loss_backtest (quantile_disc on "
        "integer daily cents); x and n are exact BIGINTs; the 0*ln(0)=0 "
        "boundary cases (x=0, x=n) are explicit mirrored CASE branches. "
        "Under H0 LR ~ chi-square(1), whose survival is EXACTLY "
        "2*Phi-bar(sqrt(LR)) — the shared A&S tail, no Wilson-Hilferty "
        "needed at df=1. One (type, day) aggregate; day-grid arithmetic "
        "after."
    ),
    tags=("timeseries", "statistics", "evals"),
)
def kupiec_pof_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_stream_processor_spark.operators._normal_tail import (
        normal_sf_col,
    )

    ev = load_table(spark, sf_dir, "events")
    split = F.lit(_PINBALL_SPLIT).cast("timestamp")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    train = daily.filter(F.col("day") < split)
    # exact discrete q90 via the sorted-array selection on the bounded
    # per-type day list (the pinball_loss_backtest convention)
    xs = train.groupBy("event_type").agg(
        F.sort_array(F.collect_list("cents")).alias("xs")
    )
    # quantile_disc convention: element at ceil(q * n) (1-based) — the
    # exact pinball_loss_backtest selection
    idx = F.greatest(F.ceil(0.9 * F.size("xs")), F.lit(1)).cast("int")
    qs = xs.select(
        "event_type", F.element_at("xs", idx).cast("bigint").alias("var90")
    )
    test = daily.filter(F.col("day") >= split)
    breaches = (
        test.join(qs, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("cents") > F.col("var90"), 1).otherwise(0))
            .cast("bigint")
            .alias("x"),
        )
    )
    n, x = F.col("n"), F.col("x")
    rate = x * F.lit(1.0) / n
    lr = F.lit(-2.0) * (
        (n - x) * F.lit(math.log(1.0 - _KUPIEC_P))
        + x * F.lit(math.log(_KUPIEC_P))
        - F.when(x < n, (n - x) * F.log(F.lit(1.0) - rate)).otherwise(
            F.lit(0.0)
        )
        - F.when(x > 0, x * F.log(rate)).otherwise(F.lit(0.0))
    )
    stat = breaches.filter(n > 0).select(
        "event_type", "n", "x", lr.alias("lr_pof")
    )
    return stat.select(
        "event_type",
        F.col("n").alias("n_test_days"),
        F.col("x").alias("n_breaches"),
        F.round(F.col("x") * F.lit(1.0) / F.col("n"), 6).alias("breach_rate"),
        F.round(F.col("lr_pof"), 6).alias("lr_pof"),
        F.round(
            F.lit(2.0) * normal_sf_col(F.sqrt(F.col("lr_pof"))), 6
        ).alias("p_value"),
    )


@register(
    "poisson_dispersion_test",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   date_trunc('day', ts) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ),
        mom AS (
            -- squared daily counts overflow int64 at corpus scale:
            -- HUGEINT/DECIMAL(38,0), the house exact-moment guard
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS s,
                   SUM(CAST(x AS HUGEINT) * x) AS ss
            FROM daily GROUP BY event_type
            HAVING COUNT(*) >= 2 AND SUM(x) > 0
        ),
        stat AS (
            -- chi2 = sum (x - xbar)^2 / xbar = (n*ss - s^2) / s exactly:
            -- one double division of exact integers
            SELECT event_type, n, s,
                   CAST(CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s
                        AS DOUBLE) / s AS d_stat,
                   CAST(CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s
                        AS DOUBLE) / (CAST(n AS DOUBLE) * s) * n / (n - 1.0)
                       AS vmr,
                   n - 1.0 AS df
            FROM mom
        ),
        wh AS (
            SELECT event_type, n, s, d_stat, vmr, df,
                   (pow(d_stat / df, 1.0 / 3.0)
                    - (1.0 - 2.0 / (9.0 * df)))
                   / sqrt(2.0 / (9.0 * df)) AS z_wh
            FROM stat
        )
        SELECT event_type, n AS n_days, s AS n_events,
               ROUND(vmr, 6) AS vmr,
               ROUND(d_stat, 6) AS dispersion_chi2,
               CAST(df AS BIGINT) AS df,
               ROUND({{SIGNED_SF}}, 6) AS p_wilson_hilferty
        FROM wh
    """.replace("{SIGNED_SF}", normal_sf_signed_sql("z_wh")),
    doc=(
        "POISSON DISPERSION TEST per event_type on the daily COUNT "
        "series (Fisher's index-of-dispersion / variance test): under "
        "a homogeneous Poisson arrival process the daily counts have "
        "variance = mean, and D = sum (x - xbar)^2 / xbar ~ "
        "chi-square(n-1); D >> df means OVERDISPERSION (bursty, "
        "clustered arrivals — the signature of bot traffic, batch "
        "imports, and incident storms) and D << df means suspicious "
        "regularity (rate-limited or synthetic traffic). The "
        "arrival-process diagnostic under the whole monitoring family: "
        "CUSUM/EWMA/WE-rules assume a stable in-control distribution, "
        "and this test says whether 'Poisson daily counts' is even the "
        "right null. D is computed as (n*ss - s^2)/s — ONE double "
        "division of exact integers (squared counts in "
        "HUGEINT/DECIMAL(38,0) since they pass int64 at corpus scale); "
        "the sample VMR (variance-to-mean ratio, Fisher-corrected "
        "n/(n-1)) is emitted beside it. Wilson-Hilferty p through the "
        "shared signed A&S tail. One (type, day) count aggregate is "
        "the only corpus-scale stage; token_burstiness covers the "
        "per-token VMR analog — this is the per-ARRIVAL-process one."
    ),
    tags=("timeseries", "statistics", "monitoring", "quality"),
)
def poisson_dispersion_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_stream_processor_spark.operators._normal_tail import (
        normal_sf_col,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    dec = "decimal(38,0)"
    mom = (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("s"),
            F.sum(F.col("x").cast(dec) * F.col("x")).alias("ss"),
        )
        .filter((F.col("n") >= 2) & (F.col("s") > 0))
    )
    num = (
        F.col("n").cast(dec) * F.col("ss")
        - F.col("s").cast(dec) * F.col("s")
    ).cast("double")
    d_stat = num / F.col("s")
    vmr = (
        num
        / (F.col("n").cast("double") * F.col("s"))
        * F.col("n")
        / (F.col("n") - F.lit(1.0))
    )
    df_ = F.col("n") * F.lit(1.0) - F.lit(1.0)
    stat = mom.select(
        "event_type",
        "n",
        "s",
        d_stat.alias("d_stat"),
        vmr.alias("vmr"),
        df_.alias("df"),
    )
    z_wh = (
        F.pow(F.col("d_stat") / F.col("df"), F.lit(1.0) / F.lit(3.0))
        - (F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * F.col("df")))
    ) / F.sqrt(F.lit(2.0) / (F.lit(9.0) * F.col("df")))
    p = F.when(z_wh >= 0, normal_sf_col(z_wh)).otherwise(
        F.lit(1.0) - normal_sf_col(-z_wh)
    )
    return stat.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("s").alias("n_events"),
        F.round(F.col("vmr"), 6).alias("vmr"),
        F.round(F.col("d_stat"), 6).alias("dispersion_chi2"),
        F.col("df").cast("bigint").alias("df"),
        F.round(p, 6).alias("p_wilson_hilferty"),
    )


@register(
    "seasonal_mann_kendall",
    oracle=f"""
        WITH monthly AS (
            SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS lvl,
                   CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
                   CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1, 2, 3
        ),
        pairs AS (
            -- within each (type, calendar-month) season: sign over
            -- year pairs — the cross-season pairs a plain MK would
            -- count are exactly what the seasonal form EXCLUDES
            SELECT a.lvl,
                   CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                                 WHEN b.cents < a.cents THEN -1
                                 ELSE 0 END) AS BIGINT) AS s
            FROM monthly a JOIN monthly b
              ON a.lvl = b.lvl AND a.mo = b.mo
             AND b.yr > a.yr
            GROUP BY a.lvl
        ),
        seasons AS (
            SELECT lvl, mo, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(t3t) AS BIGINT) AS tie_term
            FROM (
                SELECT lvl, mo, cents,
                       COUNT(*) * (COUNT(*) - 1) * (2 * COUNT(*) + 5) AS t3t
                FROM monthly GROUP BY lvl, mo, cents
            ) g
            GROUP BY lvl, mo
        ),
        vars_ AS (
            SELECT lvl,
                   SUM((n * (n - 1.0) * (2.0 * n + 5.0) - tie_term) / 18.0)
                       AS var_s,
                   CAST(SUM(n) AS BIGINT) AS n_points,
                   CAST(COUNT(*) AS BIGINT) AS n_seasons
            FROM seasons GROUP BY lvl
        ),
        zed AS (
            SELECT p.lvl, p.s, v.var_s, v.n_points, v.n_seasons,
                   CASE WHEN p.s > 0 THEN (p.s - 1) / sqrt(v.var_s)
                        WHEN p.s < 0 THEN (p.s + 1) / sqrt(v.var_s)
                        ELSE 0.0 END AS z
            FROM pairs p JOIN vars_ v USING (lvl)
        )
        SELECT lvl AS priority_level, n_points, n_seasons, s AS smk_s,
               ROUND(var_s, 6) AS var_s,
               ROUND(z, 6) AS z_score,
               ROUND(2.0 * {{SF}}, 6) AS p_value,
               z > 0 AS increasing
        FROM zed
    """.replace("{SF}", normal_sf_sql("abs(z)")),
    doc=(
        "SEASONAL MANN-KENDALL TREND TEST (Hirsch-Slack 1984) per "
        "order priority on MONTHLY revenue (the orders table spans 6.5 "
        "years; the events fixture spans one month, far too short for "
        "a seasonal design): the trend test the plain "
        "mann_kendall_trend gives WRONG answers on seasonal data — a "
        "strong annual cycle creates millions of cross-season "
        "discordant pairs that drown a real multi-year trend (or "
        "fabricate one). The seasonal form computes Kendall's S ONLY "
        "within each calendar-month season across years (Jan-vs-Jan, "
        "Feb-vs-Feb), then sums S and the tie-corrected variances over "
        "the 12 seasons; continuity-corrected z, two-sided p via the "
        "shared A&S tail — the standard in hydrology/climate "
        "monitoring, squarely this engine's weather heritage. Pair "
        "sums run as self-joins over the BOUNDED (priority, month, year) "
        "grid (~years^2/2 pairs per season); every count is an exact "
        "BIGINT; integer cents make sign() exact. One (priority, yr, mo) "
        "hash aggregate is the only corpus-scale stage."
    ),
    tags=("timeseries", "statistics", "quality"),
)
def seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_stream_processor_spark.operators._normal_tail import (
        normal_sf_col,
    )

    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("lvl"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    from weather_stream_processor_spark.plans.caching import persisted_result

    # the monthly grid feeds both sides of the season pair join AND the
    # tie-term rollup — three parquet scans without the persist (the r10
    # scan-count audit); the grid is ~|priorities| x 12 x years rows
    return persisted_result(monthly, _smk_build)


def _smk_build(monthly: DataFrame) -> DataFrame:
    from weather_stream_processor_spark.operators._normal_tail import (
        normal_sf_col,
    )

    a = monthly.select(
        F.col("lvl").alias("et"), F.col("mo").alias("moa"),
        F.col("yr").alias("ya"), F.col("cents").alias("ca"),
    )
    b = monthly.select(
        F.col("lvl").alias("et"), F.col("mo").alias("moa"),
        F.col("yr").alias("yb"), F.col("cents").alias("cb"),
    )
    pairs = (
        a.join(b, ["et", "moa"])
        .filter(F.col("yb") > F.col("ya"))
        .groupBy(F.col("et").alias("lvl"))
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s")
        )
    )
    # per-season point count and MK tie term from the tie-group sizes
    per_season = (
        monthly.groupBy("lvl", "mo", "cents")
        .agg(F.count(F.lit(1)).alias("tcnt"))
        .groupBy("lvl", "mo")
        .agg(
            F.sum("tcnt").cast("bigint").alias("n"),
            F.sum(
                F.col("tcnt") * (F.col("tcnt") - 1) * (2 * F.col("tcnt") + 5)
            )
            .cast("bigint")
            .alias("tie_term"),
        )
    )
    vars_ = per_season.groupBy("lvl").agg(
        F.sum(
            (
                F.col("n") * (F.col("n") - F.lit(1.0)) * (2.0 * F.col("n") + 5.0)
                - F.col("tie_term")
            )
            / F.lit(18.0)
        ).alias("var_s"),
        F.sum("n").cast("bigint").alias("n_points"),
        F.count(F.lit(1)).cast("bigint").alias("n_seasons"),
    )
    zed = pairs.join(vars_, "lvl")
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(F.col("var_s")))
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(F.col("var_s")))
        .otherwise(F.lit(0.0))
    )
    return zed.select(
        F.col("lvl").alias("priority_level"),
        "n_points",
        "n_seasons",
        F.col("s").alias("smk_s"),
        F.round(F.col("var_s"), 6).alias("var_s"),
        F.round(z, 6).alias("z_score"),
        F.round(F.lit(2.0) * normal_sf_col(F.abs(z)), 6).alias("p_value"),
        (z > 0).alias("increasing"),
    )


# ---------------------------------------------------------------------------
# Round-11 spectral / long-memory / residual-diagnostic closers. The daily
# cents grid (the ljung_box construction) gains the frequency domain
# (periodogram + Fisher's g), the long-range-dependence axis (Hurst R/S),
# the trend-residual autocorrelation check (Durbin-Watson), and offline
# change-point LOCALIZATION (binary segmentation) to complement the
# cusum_level_shift detector's online form.
# ---------------------------------------------------------------------------

_PG_KMAX = 16  # Fourier frequencies scanned: k = 1..min(KMAX, (n-1)/2)
_TWO_PI = 6.283185307179586  # literal in BOTH engines (no fold-order risk)

_DAILY_CENTS_CTE = """
        daily AS (
            SELECT event_type,
                   date_diff('day', DATE '1970-01-01',
                             CAST(date_trunc('day', ts) AS DATE)) AS d,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY 1, 2
        )"""


def _daily_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts").cast("date"),
            F.lit("1970-01-01").cast("date"),
        )
        .cast("bigint")
        .alias("d"),
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )


@register(
    "periodogram_fisher_g",
    oracle=f"""
        WITH {_DAILY_CENTS_CTE},
        idx AS (
            SELECT event_type, d, cents,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY d
                   ) - 1 AS t,
                   CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                       AS n,
                   CAST(SUM(cents) OVER (PARTITION BY event_type) AS BIGINT)
                       AS s
            FROM daily
        ),
        ks AS (SELECT unnest(range(1, {_PG_KMAX} + 1)) AS k),
        terms AS (
            SELECT i.event_type, ks.k, i.n,
                   CAST(i.cents * i.n - i.s AS DOUBLE) / i.n AS xd,
                   {_TWO_PI} * (CAST((ks.k * i.t) % i.n AS DOUBLE) / i.n)
                       AS angle
            FROM idx i CROSS JOIN ks
            WHERE 2 * ks.k <= i.n - 1
        ),
        fk AS (
            SELECT event_type, k, MAX(n) AS n,
                   SUM(CAST(FLOOR(xd * cos(angle) * 1000000.0 + 0.5)
                            AS HUGEINT)) AS ck,
                   SUM(CAST(FLOOR(xd * sin(angle) * 1000000.0 + 0.5)
                            AS HUGEINT)) AS sk
            FROM terms GROUP BY 1, 2
        ),
        ii AS (
            SELECT event_type, k, n, ck * ck + sk * sk AS i_int
            FROM fk
        ),
        ranked AS (
            SELECT event_type, k, n, i_int,
                   SUM(i_int) OVER (PARTITION BY event_type) AS i_sum,
                   CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                       AS m,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY i_int DESC, k ASC
                   ) AS rk
            FROM ii
        )
        SELECT event_type, n AS n_days, m AS m_band,
               CAST(k AS BIGINT) AS peak_k,
               ROUND(CAST(n AS DOUBLE) / k, 6) AS period_days,
               ROUND(CAST(i_int AS DOUBLE) / CAST(i_sum AS DOUBLE), 6)
                   AS fisher_g,
               ROUND(LEAST(1.0,
                   CAST(m AS DOUBLE)
                   * pow(1.0 - CAST(i_int AS DOUBLE) / CAST(i_sum AS DOUBLE),
                         CAST(m AS DOUBLE) - 1.0)), 6) AS p_upper_bound
        FROM ranked
        WHERE rk = 1 AND m >= 2 AND i_sum > 0
    """,
    doc=(
        "PERIODOGRAM PEAK + FISHER'S g TEST per event_type on the daily "
        "cents series: the frequency-domain completion of the "
        "time-domain diagnostics (Ljung-Box asks 'any autocorrelation', "
        "seasonal-MK assumes a KNOWN period; Fisher's g finds WHICH "
        f"period). Power at Fourier frequencies k = 1..min({_PG_KMAX}, "
        "(n-1)/2) — the low-frequency band where business seasonality "
        "lives; at multi-year spans widen _PG_KMAX, the plan shape is "
        "unchanged — with g = max I_k / sum I_k and the standard "
        "m*(1-g)^(m-1) upper bound for its null tail (the first term "
        "of Fisher's exact alternating series, exact to ~1e-3 at "
        "fixture m). Engine parity: the DFT angle is reduced mod n "
        "BEFORE cos/sin (exact bigint (k*t) % n, so libm never sees a "
        "large argument), the centered series (cents*n - s)/n is one "
        "identical double per row, and each cos/sin term is dyadically "
        "lifted (floor(x*1e6 + 0.5)) into DECIMAL(38,0)/HUGEINT so the "
        "per-frequency sums are ORDER-FREE exact integers — the "
        "covariance-spectrum contract applied to spectral moments; "
        "|C_k| < 1e18 holds to ~10-year spans at 1e8 daily cents, so "
        "C_k^2 + S_k^2 stays inside DECIMAL(38,0). Plan: one corpus "
        "scan to the (type, day) grid, per-type windows for the index, "
        f"a {_PG_KMAX}-row broadcast frequency spine, one hash "
        "aggregate to |types| x m rows; nothing else shuffles at "
        "100 TB."
    ),
    tags=("timeseries", "statistics", "monitoring"),
)
def periodogram_fisher_g(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    daily = _daily_cents(spark, sf_dir)
    w_t = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "d",
        "cents",
        (
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("d")
            )
            - 1
        ).alias("t"),
        F.count(F.lit(1)).over(w_t).cast("bigint").alias("n"),
        F.sum("cents").over(w_t).cast("bigint").alias("s"),
    )
    ks = spark.range(1, _PG_KMAX + 1).select(F.col("id").alias("k"))
    j = idx.crossJoin(F.broadcast(ks)).filter(
        2 * F.col("k") <= F.col("n") - 1
    )
    xd = (F.col("cents") * F.col("n") - F.col("s")).cast("double") / F.col(
        "n"
    )
    angle = F.lit(_TWO_PI) * (
        ((F.col("k") * F.col("t")) % F.col("n")).cast("double") / F.col("n")
    )
    dec = "decimal(38,0)"
    term_c = F.floor(xd * F.cos(angle) * F.lit(1000000.0) + F.lit(0.5)).cast(
        dec
    )
    term_s = F.floor(xd * F.sin(angle) * F.lit(1000000.0) + F.lit(0.5)).cast(
        dec
    )
    fk = j.groupBy("event_type", "k").agg(
        F.max("n").alias("n"),
        F.sum(term_c).alias("ck"),
        F.sum(term_s).alias("sk"),
    )
    ii = fk.select(
        "event_type",
        "k",
        "n",
        (F.col("ck") * F.col("ck") + F.col("sk") * F.col("sk")).alias(
            "i_int"
        ),
    )
    w_rank = Window.partitionBy("event_type").orderBy(
        F.desc("i_int"), F.asc("k")
    )
    ranked = ii.select(
        "event_type",
        "k",
        "n",
        "i_int",
        F.sum("i_int").over(w_t).alias("i_sum"),
        F.count(F.lit(1)).over(w_t).cast("bigint").alias("m"),
        F.row_number().over(w_rank).alias("rk"),
    )
    top = ranked.filter(
        (F.col("rk") == 1) & (F.col("m") >= 2) & (F.col("i_sum") > 0)
    )
    g = F.col("i_int").cast("double") / F.col("i_sum").cast("double")
    md = F.col("m").cast("double")
    p = F.least(
        F.lit(1.0), md * F.pow(F.lit(1.0) - g, md - F.lit(1.0))
    )
    return top.select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("m").alias("m_band"),
        F.col("k").cast("bigint").alias("peak_k"),
        F.round(F.col("n").cast("double") / F.col("k"), 6).alias(
            "period_days"
        ),
        F.round(g, 6).alias("fisher_g"),
        F.round(p, 6).alias("p_upper_bound"),
    )


_HURST_WS = (4, 8, 16)  # dyadic block sizes; H = endpoint slope in log2


@register(
    "hurst_rescaled_range",
    oracle=f"""
        WITH {_DAILY_CENTS_CTE},
        idx AS (
            SELECT event_type, cents,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY d
                   ) - 1 AS t,
                   CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                       AS n
            FROM daily
        ),
        ws AS (SELECT unnest([{", ".join(str(w) for w in _HURST_WS)}]) AS w),
        blk AS (
            SELECT i.event_type, ws.w, i.t, i.cents,
                   CAST((i.t - (i.t % ws.w)) / ws.w AS BIGINT) AS blockno
            FROM idx i CROSS JOIN ws
            WHERE i.t < i.n - (i.n % ws.w)
        ),
        dev AS (
            SELECT event_type, w, blockno, t, cents,
                   CAST(SUM(cents) OVER (
                       PARTITION BY event_type, w, blockno
                   ) AS BIGINT) AS bs,
                   SUM(CAST(cents AS HUGEINT) * cents) OVER (
                       PARTITION BY event_type, w, blockno
                   ) AS ssq
            FROM blk
        ),
        cum AS (
            SELECT event_type, w, blockno, bs, ssq,
                   CAST(SUM(cents * w - bs) OVER (
                       PARTITION BY event_type, w, blockno
                       ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS z
            FROM dev
        ),
        rsq AS (
            SELECT event_type, w, blockno,
                   MAX(z) - MIN(z) AS zrange,
                   CAST(MAX(w) AS HUGEINT) * MAX(ssq)
                       - CAST(MAX(bs) AS HUGEINT) * MAX(bs) AS dd
            FROM cum GROUP BY 1, 2, 3
        ),
        lift AS (
            SELECT event_type, w,
                   CAST(FLOOR(CAST(zrange AS DOUBLE)
                              / sqrt(CAST(dd AS DOUBLE))
                              * 1000000000.0 + 0.5) AS BIGINT) AS rs_q
            FROM rsq WHERE dd > 0
        ),
        per_w AS (
            SELECT event_type, w,
                   CAST(COUNT(*) AS BIGINT) AS nb,
                   (CAST(SUM(rs_q) AS DOUBLE) / COUNT(*)) / 1000000000.0
                       AS rs_mean
            FROM lift GROUP BY 1, 2
        ),
        piv AS (
            SELECT event_type,
                   COALESCE(MAX(CASE WHEN w = 4 THEN nb END), 0) AS nb4,
                   COALESCE(MAX(CASE WHEN w = 8 THEN nb END), 0) AS nb8,
                   COALESCE(MAX(CASE WHEN w = 16 THEN nb END), 0) AS nb16,
                   MAX(CASE WHEN w = 4 THEN rs_mean END) AS rs4,
                   MAX(CASE WHEN w = 8 THEN rs_mean END) AS rs8,
                   MAX(CASE WHEN w = 16 THEN rs_mean END) AS rs16
            FROM per_w GROUP BY event_type
        )
        SELECT p.event_type,
               MAX(i.n) AS n_days,
               p.nb4, p.nb8, p.nb16,
               ROUND(p.rs4, 6) AS rs_w4,
               ROUND(p.rs8, 6) AS rs_w8,
               ROUND(p.rs16, 6) AS rs_w16,
               ROUND(CASE WHEN p.rs4 > 0 AND p.rs16 > 0
                          THEN ln(p.rs16 / p.rs4) / 1.3862943611198906
                     END, 6) AS hurst_exponent
        FROM piv p JOIN (SELECT DISTINCT event_type, n FROM idx) i
            USING (event_type)
        GROUP BY p.event_type, p.nb4, p.nb8, p.nb16,
                 p.rs4, p.rs8, p.rs16
    """,
    doc=(
        "HURST EXPONENT by RESCALED-RANGE (R/S) ANALYSIS per event_type "
        "on the daily cents series — the long-range-dependence axis the "
        "rest of the diagnostic suite cannot see (Ljung-Box detects "
        "short-lag correlation; H > 0.5 detects PERSISTENT long memory, "
        "H < 0.5 anti-persistence; white noise sits at 0.5). The series "
        f"is cut into complete blocks of w in {_HURST_WS} days; per "
        "block, R = range of the cumulative deviations from the block "
        "mean and S = population std, with R/S computed as ONE double "
        "division of two exact integers: the cumulative deviations are "
        "kept x w-scaled (cents*w - blocksum, an exact BIGINT prefix "
        "sum) and w^2*S^2 = w*ssq - bs^2 in HUGEINT/DECIMAL(38,0), so "
        "R/S = (maxZ - minZ)/sqrt(w*ssq - bs^2) — the w cancels. "
        "Per-block ratios are dyadically lifted (floor(x*1e9 + 0.5)) "
        "before the cross-block mean so the average is an order-free "
        "integer sum; H = ln(RS_16/RS_4)/ln(16/4), the exact OLS slope "
        "for equally-log-spaced sizes (endpoint form). Zero-variance "
        "blocks are excluded, mirrored; types lacking either endpoint "
        "size emit NULL H rather than a fabricated slope. Plan: one "
        "corpus scan to the day grid, a 3-row broadcast size spine, "
        "per-(type,w,block) windows — everything after the first "
        "aggregate is day-grid-bounded at any corpus size."
    ),
    tags=("timeseries", "statistics", "quality"),
)
def hurst_rescaled_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    daily = _daily_cents(spark, sf_dir)
    w_t = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "cents",
        (
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("d")
            )
            - 1
        ).alias("t"),
        F.count(F.lit(1)).over(w_t).cast("bigint").alias("n"),
    )
    ws = spark.createDataFrame(
        [(w,) for w in _HURST_WS], "w bigint"
    )
    blk = idx.crossJoin(F.broadcast(ws)).filter(
        F.col("t") < F.col("n") - (F.col("n") % F.col("w"))
    )
    blk = blk.select(
        "event_type",
        "w",
        "t",
        "cents",
        "n",
        ((F.col("t") - (F.col("t") % F.col("w"))) / F.col("w"))
        .cast("bigint")
        .alias("blockno"),
    )
    dec = "decimal(38,0)"
    w_blk = Window.partitionBy("event_type", "w", "blockno")
    dev = blk.select(
        "event_type",
        "w",
        "blockno",
        "t",
        "cents",
        "n",
        F.sum("cents").over(w_blk).cast("bigint").alias("bs"),
        F.sum(F.col("cents").cast(dec) * F.col("cents"))
        .over(w_blk)
        .alias("ssq"),
    )
    w_cum = Window.partitionBy("event_type", "w", "blockno").orderBy(
        "t"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = dev.select(
        "event_type",
        "w",
        "blockno",
        "bs",
        "ssq",
        "n",
        F.sum(F.col("cents") * F.col("w") - F.col("bs"))
        .over(w_cum)
        .cast("bigint")
        .alias("z"),
    )
    rsq = cum.groupBy("event_type", "w", "blockno").agg(
        (F.max("z") - F.min("z")).alias("zrange"),
        (
            F.max("w").cast(dec) * F.max("ssq")
            - F.max("bs").cast(dec) * F.max("bs")
        ).alias("dd"),
        F.max("n").alias("n"),
    )
    lift = rsq.filter(F.col("dd") > 0).select(
        "event_type",
        "w",
        "n",
        F.floor(
            F.col("zrange").cast("double")
            / F.sqrt(F.col("dd").cast("double"))
            * F.lit(1000000000.0)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("rs_q"),
    )
    per_w = lift.groupBy("event_type", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        (
            (F.sum("rs_q").cast("double") / F.count(F.lit(1)))
            / F.lit(1000000000.0)
        ).alias("rs_mean"),
        F.max("n").alias("n"),
    )
    piv = per_w.groupBy("event_type").agg(
        F.coalesce(
            F.max(F.when(F.col("w") == 4, F.col("nb"))), F.lit(0)
        ).cast("bigint").alias("nb4"),
        F.coalesce(
            F.max(F.when(F.col("w") == 8, F.col("nb"))), F.lit(0)
        ).cast("bigint").alias("nb8"),
        F.coalesce(
            F.max(F.when(F.col("w") == 16, F.col("nb"))), F.lit(0)
        ).cast("bigint").alias("nb16"),
        F.max(F.when(F.col("w") == 4, F.col("rs_mean"))).alias("rs4"),
        F.max(F.when(F.col("w") == 8, F.col("rs_mean"))).alias("rs8"),
        F.max(F.when(F.col("w") == 16, F.col("rs_mean"))).alias("rs16"),
        F.max("n").alias("n_days"),
    )
    hurst = F.when(
        (F.col("rs4") > 0) & (F.col("rs16") > 0),
        F.log(F.col("rs16") / F.col("rs4")) / F.lit(1.3862943611198906),
    )
    return piv.select(
        "event_type",
        "n_days",
        "nb4",
        "nb8",
        "nb16",
        F.round("rs4", 6).alias("rs_w4"),
        F.round("rs8", 6).alias("rs_w8"),
        F.round("rs16", 6).alias("rs_w16"),
        F.round(hurst, 6).alias("hurst_exponent"),
    )


@register(
    "durbin_watson_trend_residuals",
    oracle=f"""
        WITH {_DAILY_CENTS_CTE},
        idx AS (
            SELECT event_type, d, cents,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY d
                   ) - 1 AS t,
                   CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                       AS n
            FROM daily
        ),
        ctr AS (
            -- symmetric integer time 2t-(n-1): sum(tc) == 0 exactly, so
            -- the OLS intercept decouples and every residual is exact
            SELECT event_type, t, cents, n, 2 * t - (n - 1) AS tc
            FROM idx
        ),
        mom AS (
            SELECT event_type, t, cents, n, tc,
                   CAST(SUM(cents) OVER (PARTITION BY event_type)
                        AS BIGINT) AS sx,
                   CAST(SUM(tc * cents) OVER (PARTITION BY event_type)
                        AS BIGINT) AS bnum,
                   CAST(SUM(tc * tc) OVER (PARTITION BY event_type)
                        AS BIGINT) AS delta
            FROM ctr
        ),
        resid AS (
            -- E_t = n*delta*e_t: the x n*delta lift makes the OLS
            -- residual an EXACT integer (covariance-spectrum contract)
            SELECT event_type, t, n, sx, bnum, delta,
                   CAST(n AS HUGEINT) * delta * cents
                       - CAST(delta AS HUGEINT) * sx
                       - CAST(n AS HUGEINT) * bnum * tc AS e
            FROM mom
        ),
        lagged AS (
            SELECT event_type, n, bnum, delta, e,
                   LAG(e) OVER (
                       PARTITION BY event_type ORDER BY t
                   ) AS e_prev
            FROM resid
        ),
        agg AS (
            SELECT event_type, MAX(n) AS n_days,
                   MAX(bnum) AS bnum, MAX(delta) AS delta,
                   SUM(CASE WHEN e_prev IS NOT NULL
                            THEN (e - e_prev) * (e - e_prev) END) AS num,
                   SUM(e * e) AS den
            FROM lagged GROUP BY event_type
        )
        SELECT event_type, n_days,
               ROUND((2.0 * CAST(bnum AS DOUBLE)) / CAST(delta AS DOUBLE),
                     6) AS trend_slope_cents_per_day,
               ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
                   AS dw_stat,
               ROUND(1.0 - (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
                           / 2.0, 6) AS rho_lag1
        FROM agg
        WHERE n_days >= 3 AND den > 0
    """,
    doc=(
        "DURBIN-WATSON TEST on the residuals of a per-type linear DAY "
        "TREND — the diagnostic that closes the trend-fitting loop: "
        "mann_kendall_trend DETECTS monotone trend, theilsen/OLS FIT "
        "it, and DW asks whether what the line leaves behind is still "
        "serially correlated (DW ~ 2(1 - rho1); near 0 = positive "
        "autocorrelation, the residual structure that invalidates the "
        "fit's naive standard errors and any iid-residual monitor "
        "downstream). Exactness: time is re-centered to the symmetric "
        "integer grid tc = 2t-(n-1) (sum tc = 0, so the intercept "
        "decouples), and every residual is kept x n*delta-scaled — "
        "E_t = n*delta*cents - delta*Sx - n*Bnum*tc, an EXACT "
        "DECIMAL(38,0)/HUGEINT integer (the scale factor cancels in "
        "the DW ratio), so numerator and denominator are order-free "
        "integer sums with ONE double division each; exact within "
        "DECIMAL(38,0) to ~1-year day spans at 1e8 daily |cents| "
        "(|E| <= ~7e18, E^2 <= ~5e37), beyond which re-center cents "
        "first. Constant series (den = 0) and n < 3 are excluded, "
        "mirrored. Plan: one corpus scan to the day grid; per-type "
        "windows and one k-row aggregate after."
    ),
    tags=("timeseries", "statistics", "quality"),
)
def durbin_watson_trend_residuals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    daily = _daily_cents(spark, sf_dir)
    w_t = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "cents",
        (
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("d")
            )
            - 1
        ).alias("t"),
        F.count(F.lit(1)).over(w_t).cast("bigint").alias("n"),
    )
    ctr = idx.select(
        "event_type",
        "t",
        "cents",
        "n",
        (2 * F.col("t") - (F.col("n") - 1)).alias("tc"),
    )
    mom = ctr.select(
        "event_type",
        "t",
        "cents",
        "n",
        "tc",
        F.sum("cents").over(w_t).cast("bigint").alias("sx"),
        F.sum(F.col("tc") * F.col("cents"))
        .over(w_t)
        .cast("bigint")
        .alias("bnum"),
        F.sum(F.col("tc") * F.col("tc"))
        .over(w_t)
        .cast("bigint")
        .alias("delta"),
    )
    dec = "decimal(38,0)"
    e = (
        F.col("n").cast(dec) * F.col("delta") * F.col("cents")
        - F.col("delta").cast(dec) * F.col("sx")
        - F.col("n").cast(dec) * F.col("bnum") * F.col("tc")
    )
    resid = mom.select(
        "event_type", "t", "n", "bnum", "delta", e.alias("e")
    )
    w_lag = Window.partitionBy("event_type").orderBy("t")
    lagged = resid.select(
        "event_type",
        "n",
        "bnum",
        "delta",
        "e",
        F.lag("e").over(w_lag).alias("e_prev"),
    )
    agg = lagged.groupBy("event_type").agg(
        F.max("n").alias("n_days"),
        F.max("bnum").alias("bnum"),
        F.max("delta").alias("delta"),
        F.sum(
            F.when(
                F.col("e_prev").isNotNull(),
                (F.col("e") - F.col("e_prev"))
                * (F.col("e") - F.col("e_prev")),
            )
        ).alias("num"),
        F.sum(F.col("e") * F.col("e")).alias("den"),
    )
    dw = F.col("num").cast("double") / F.col("den").cast("double")
    return agg.filter((F.col("n_days") >= 3) & (F.col("den") > 0)).select(
        "event_type",
        "n_days",
        F.round(
            (F.lit(2.0) * F.col("bnum").cast("double"))
            / F.col("delta").cast("double"),
            6,
        ).alias("trend_slope_cents_per_day"),
        F.round(dw, 6).alias("dw_stat"),
        F.round(F.lit(1.0) - dw / F.lit(2.0), 6).alias("rho_lag1"),
    )


@register(
    "binseg_change_point",
    oracle=f"""
        WITH {_DAILY_CENTS_CTE},
        idx AS (
            SELECT event_type, d, cents,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY d
                   ) AS t,
                   CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                       AS n,
                   CAST(SUM(cents) OVER (PARTITION BY event_type)
                        AS BIGINT) AS s,
                   SUM(CAST(cents AS HUGEINT) * cents) OVER (
                       PARTITION BY event_type
                   ) AS ssq
            FROM daily
        ),
        pre AS (
            SELECT event_type, d, t, n, s, ssq,
                   CAST(SUM(cents) OVER (
                       PARTITION BY event_type ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS p
            FROM idx
        ),
        cand AS (
            SELECT event_type, d, t, n, s, ssq, p,
                   CAST(n AS HUGEINT) * p - CAST(t AS HUGEINT) * s AS gap,
                   CAST(n AS HUGEINT) * ssq
                       - CAST(s AS HUGEINT) * s AS tss_n
            FROM pre WHERE t < n
        ),
        scored AS (
            SELECT event_type, d, t, n, s, p, tss_n,
                   CAST(gap * gap AS DOUBLE)
                       / CAST(t * (n - t) AS DOUBLE) AS score,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY CAST(gap * gap AS DOUBLE)
                                / CAST(t * (n - t) AS DOUBLE) DESC,
                                t ASC
                   ) AS rk
            FROM cand
        )
        SELECT event_type, n AS n_days,
               CAST(t AS BIGINT) AS tau,
               d AS split_epoch_day,
               ROUND((CAST(p AS DOUBLE) / t) / 100.0, 6)
                   AS mean_before_value,
               ROUND((CAST(s - p AS DOUBLE) / (n - t)) / 100.0, 6)
                   AS mean_after_value,
               ROUND((score / CAST(tss_n AS DOUBLE)) * n, 6) AS r2_split
        FROM scored
        WHERE rk = 1 AND n >= 4 AND tss_n > 0
    """,
    doc=(
        "BINARY-SEGMENTATION CHANGE-POINT LOCALIZATION per event_type "
        "on the daily cents series — the OFFLINE complement of the "
        "online detectors (cusum_level_shift raises a flag as data "
        "arrives; binseg answers WHERE the level shifted, the first "
        "split of the classic recursive segmentation). For every "
        "candidate split tau the between-segment sum of squares is the "
        "exact integer form BSS(tau) = (n*P_tau - tau*S)^2 / "
        "(n*tau*(n-tau)) over the prefix sums P — numerator an exact "
        "HUGEINT/DECIMAL(38,0) square (n*P <= ~1.3e15 at 10-year spans "
        "x 1e8 daily cents, squared ~1.7e30, well inside 38 digits), "
        "denominator one double division per row so the argmax "
        "compares IDENTICAL doubles in both engines, tie-broken to the "
        "earliest tau. Emits the split day, segment means, and "
        "r2_split = BSS/TSS (the variance share one break explains, "
        "with n*TSS = n*SSQ - S^2 exact). Degenerate series (constant "
        "cents, n < 4) are excluded, mirrored. Plan: one corpus scan "
        "to the day grid; per-type ordered windows over it; one "
        "rank-1 slice — day-grid-bounded forever."
    ),
    tags=("timeseries", "statistics", "monitoring"),
)
def binseg_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    daily = _daily_cents(spark, sf_dir)
    w_t = Window.partitionBy("event_type")
    dec = "decimal(38,0)"
    idx = daily.select(
        "event_type",
        "d",
        "cents",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("d"))
        .alias("t"),
        F.count(F.lit(1)).over(w_t).cast("bigint").alias("n"),
        F.sum("cents").over(w_t).cast("bigint").alias("s"),
        F.sum(F.col("cents").cast(dec) * F.col("cents"))
        .over(w_t)
        .alias("ssq"),
    )
    w_pre = Window.partitionBy("event_type").orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = idx.select(
        "event_type",
        "d",
        "t",
        "n",
        "s",
        "ssq",
        F.sum("cents").over(w_pre).cast("bigint").alias("p"),
    )
    cand = pre.filter(F.col("t") < F.col("n")).select(
        "event_type",
        "d",
        "t",
        "n",
        "s",
        "p",
        (
            F.col("n").cast(dec) * F.col("p")
            - F.col("t").cast(dec) * F.col("s")
        ).alias("gap"),
        (
            F.col("n").cast(dec) * F.col("ssq")
            - F.col("s").cast(dec) * F.col("s")
        ).alias("tss_n"),
    )
    score = (F.col("gap") * F.col("gap")).cast("double") / (
        F.col("t") * (F.col("n") - F.col("t"))
    ).cast("double")
    w_rank = Window.partitionBy("event_type").orderBy(
        score.desc(), F.asc("t")
    )
    scored = cand.select(
        "event_type",
        "d",
        "t",
        "n",
        "s",
        "p",
        "tss_n",
        score.alias("score"),
        F.row_number().over(w_rank).alias("rk"),
    )
    return scored.filter(
        (F.col("rk") == 1) & (F.col("n") >= 4) & (F.col("tss_n") > 0)
    ).select(
        "event_type",
        F.col("n").alias("n_days"),
        F.col("t").cast("bigint").alias("tau"),
        F.col("d").alias("split_epoch_day"),
        F.round(
            (F.col("p").cast("double") / F.col("t")) / F.lit(100.0), 6
        ).alias("mean_before_value"),
        F.round(
            ((F.col("s") - F.col("p")).cast("double") / (F.col("n") - F.col("t")))
            / F.lit(100.0),
            6,
        ).alias("mean_after_value"),
        F.round(
            (F.col("score") / F.col("tss_n").cast("double")) * F.col("n"), 6
        ).alias("r2_split"),
    )


@register(
    "anytime_confidence_sequence",
    oracle="""
        WITH daily AS (
            SELECT date_diff('day', DATE '1970-01-01',
                             CAST(date_trunc('day', ts) AS DATE)) AS d,
                   CAST(COUNT(*) AS BIGINT) AS m_d,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS s_d
            FROM events GROUP BY 1
        ),
        run AS (
            SELECT d,
                   CAST(SUM(m_d) OVER (
                       ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS m_cum,
                   CAST(SUM(s_d) OVER (
                       ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS s_cum,
                   CAST(SUM(m_d) OVER () AS BIGINT) AS m_tot,
                   CAST(SUM(s_d) OVER () AS BIGINT) AS s_tot
            FROM daily
        ),
        band AS (
            SELECT d, m_cum, s_cum,
                   CAST(s_cum AS DOUBLE) / m_cum AS p_hat,
                   CAST(s_tot AS DOUBLE) / m_tot AS p_fin,
                   1.7 * sqrt((ln(ln(2.0 * m_cum)) + 3.8430274173849486)
                              / m_cum) AS radius
            FROM run
        )
        SELECT d AS epoch_day, m_cum AS trials_cum, s_cum AS successes_cum,
               ROUND(p_hat, 6) AS p_hat,
               ROUND(radius, 6) AS radius,
               ROUND(GREATEST(0.0, p_hat - radius), 6) AS ci_lo,
               ROUND(LEAST(1.0, p_hat + radius), 6) AS ci_hi,
               (p_fin >= GREATEST(0.0, p_hat - radius)
                AND p_fin <= LEAST(1.0, p_hat + radius))
                   AS final_in_interval
        FROM band
    """,
    doc=(
        "ANYTIME-VALID CONFIDENCE SEQUENCE for the running purchase "
        "share — the always-valid inference the fixed-n intervals "
        "cannot give: wilson_score_intervals is valid at ONE "
        "preplanned n, while a confidence sequence holds "
        "SIMULTANEOUSLY over every prefix, so the monitor can peek "
        "daily and stop on the first boundary crossing without "
        "inflating alpha (the continuous-monitoring discipline behind "
        "sprt_conversion_monitor, in interval rather than decision "
        "form). Radius is the stitched sub-Gaussian boundary of "
        "Howard et al. 2021 with the standard practical constants, "
        "1.7*sqrt((ln ln(2t) + 0.72*ln(10.4/alpha))/t) at alpha=0.05 "
        "— 0.72*ln(208) is precomputed to the literal "
        "3.8430274173849486 so neither engine folds it differently. "
        "Cumulative trials/successes are exact integer prefix sums; "
        "every emitted double derives from them by one identical "
        "expression. final_in_interval tracks whether the corpus-final "
        "share sits inside each day's band — the coverage diagnostic. "
        "Plan: one corpus scan to the day grid; ordered windows over "
        "the O(days) spine only."
    ),
    tags=("timeseries", "experimentation", "statistics", "streaming"),
)
def anytime_confidence_sequence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(
            F.date_trunc("day", "ts").cast("date"),
            F.lit("1970-01-01").cast("date"),
        )
        .cast("bigint")
        .alias("d")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("m_d"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("s_d"),
    )
    w_run = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    run = daily.select(
        "d",
        F.sum("m_d").over(w_run).cast("bigint").alias("m_cum"),
        F.sum("s_d").over(w_run).cast("bigint").alias("s_cum"),
        F.sum("m_d").over(w_all).cast("bigint").alias("m_tot"),
        F.sum("s_d").over(w_all).cast("bigint").alias("s_tot"),
    )
    p_hat = F.col("s_cum").cast("double") / F.col("m_cum")
    p_fin = F.col("s_tot").cast("double") / F.col("m_tot")
    radius = F.lit(1.7) * F.sqrt(
        (
            F.log(F.log(F.lit(2.0) * F.col("m_cum")))
            + F.lit(3.8430274173849486)
        )
        / F.col("m_cum")
    )
    band = run.select(
        "d",
        "m_cum",
        "s_cum",
        p_hat.alias("p_hat"),
        p_fin.alias("p_fin"),
        radius.alias("radius"),
    )
    lo = F.greatest(F.lit(0.0), F.col("p_hat") - F.col("radius"))
    hi = F.least(F.lit(1.0), F.col("p_hat") + F.col("radius"))
    return band.select(
        F.col("d").alias("epoch_day"),
        F.col("m_cum").alias("trials_cum"),
        F.col("s_cum").alias("successes_cum"),
        F.round("p_hat", 6).alias("p_hat"),
        F.round("radius", 6).alias("radius"),
        F.round(lo, 6).alias("ci_lo"),
        F.round(hi, 6).alias("ci_hi"),
        ((F.col("p_fin") >= lo) & (F.col("p_fin") <= hi)).alias(
            "final_in_interval"
        ),
    )


@register(
    "distance_correlation_daily",
    oracle="""
        WITH daily AS (
            SELECT date_diff('day', DATE '1970-01-01',
                             CAST(date_trunc('day', ts) AS DATE)) AS d,
                   CAST(SUM(CASE WHEN event_type = 'click'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS x,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN CAST(ROUND(value * 100) AS BIGINT)
                                 ELSE 0 END) AS BIGINT) AS y
            FROM events GROUP BY 1
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
        pairs AS (
            SELECT a.d AS di, b.d AS dj,
                   ABS(a.x - b.x) AS aij,
                   ABS(a.y - b.y) AS bij
            FROM daily a CROSS JOIN daily b
        ),
        rowsums AS (
            SELECT di, CAST(SUM(aij) AS BIGINT) AS ai,
                   CAST(SUM(bij) AS BIGINT) AS bi
            FROM pairs GROUP BY di
        ),
        grand AS (
            SELECT CAST(SUM(ai) AS BIGINT) AS adot,
                   CAST(SUM(bi) AS BIGINT) AS bdot
            FROM rowsums
        ),
        centered AS (
            -- x n^2 lift: A_ij = n^2*a_ij - n*a_i. - n*a_.j + a..
            -- is an EXACT integer; the lift cancels in the dCor ratio
            SELECT CAST(n.n AS HUGEINT) * n.n * p.aij
                       - CAST(n.n AS HUGEINT) * ri.ai
                       - CAST(n.n AS HUGEINT) * rj.ai
                       + g.adot AS aa,
                   CAST(n.n AS HUGEINT) * n.n * p.bij
                       - CAST(n.n AS HUGEINT) * ri.bi
                       - CAST(n.n AS HUGEINT) * rj.bi
                       + g.bdot AS bb
            FROM pairs p
            JOIN rowsums ri ON p.di = ri.di
            JOIN rowsums rj ON p.dj = rj.di
            CROSS JOIN grand g CROSS JOIN n
        ),
        sums AS (
            SELECT SUM(aa * bb) AS sab,
                   SUM(aa * aa) AS saa,
                   SUM(bb * bb) AS sbb
            FROM centered
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   SUM(CAST(x AS HUGEINT) * x) AS sxx,
                   SUM(CAST(y AS HUGEINT) * y) AS syy,
                   SUM(CAST(x AS HUGEINT) * y) AS sxy
            FROM daily
        )
        SELECT m.n AS n_days,
               ROUND(CAST(CAST(m.n AS HUGEINT) * m.sxy
                          - CAST(m.sx AS HUGEINT) * m.sy AS DOUBLE)
                     / sqrt(CAST(CAST(m.n AS HUGEINT) * m.sxx
                                 - CAST(m.sx AS HUGEINT) * m.sx AS DOUBLE)
                            * CAST(CAST(m.n AS HUGEINT) * m.syy
                                   - CAST(m.sy AS HUGEINT) * m.sy
                                   AS DOUBLE)), 6) AS pearson_r,
               ROUND(sqrt(CAST(s.sab AS DOUBLE)
                          / sqrt(CAST(s.saa AS DOUBLE)
                                 * CAST(s.sbb AS DOUBLE))), 6) AS dcor
        FROM mom m CROSS JOIN sums s
        WHERE s.saa > 0 AND s.sbb > 0
          AND CAST(m.n AS HUGEINT) * m.sxx
              > CAST(m.sx AS HUGEINT) * m.sx
          AND CAST(m.n AS HUGEINT) * m.syy
              > CAST(m.sy AS HUGEINT) * m.sy
    """,
    doc=(
        "DISTANCE CORRELATION (Szekely et al. 2007 energy statistics) "
        "between the daily click-count and daily purchase-cents series "
        "— the dependence measure that is ZERO if and only if the two "
        "series are independent, catching the nonlinear and "
        "non-monotone couplings Pearson (linear) and Spearman/Kendall "
        "(monotone) are provably blind to (a V-shaped demand response, "
        "a threshold effect); pearson_r is emitted beside it so the "
        "gap |dcor| - |r| IS the nonlinearity evidence. Exactness: the "
        "double-centered distance matrices are kept x n^2-lifted — "
        "A_ij = n^2*a_ij - n*a_i. - n*a_.j + a.. is an EXACT "
        "HUGEINT/DECIMAL(38,0) integer since the distances |x_i - x_j| "
        "are integer counts/cents — so the three Frobenius sums are "
        "order-free exact integers and the lift cancels in dCor^2 = "
        "sum(AB)/sqrt(sum(A^2)*sum(B^2)): TWO double divisions and two "
        "sqrt in the whole operator (exact within DECIMAL(38,0) to "
        "~10-year day spans at 1e8 daily cents). The n^2 day-PAIR "
        "frame is observation-window-bounded (900 pairs at the "
        "fixture's 30 days, ~13M at 10 years) — never data-sized; the "
        "corpus is scanned once into the day grid, which is persisted "
        "because it feeds both pair sides, the row sums, and the "
        "Pearson moments. Degenerate (constant) series excluded, "
        "mirrored."
    ),
    tags=("timeseries", "statistics", "quality"),
)
def distance_correlation_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(
            F.date_trunc("day", "ts").cast("date"),
            F.lit("1970-01-01").cast("date"),
        )
        .cast("bigint")
        .alias("d")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 100).cast("bigint"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("y"),
    )
    dec = "decimal(38,0)"
    from weather_stream_processor_spark.plans.caching import persisted_result

    def _build(g: DataFrame) -> DataFrame:
        n_df = g.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        a = g.select(
            F.col("d").alias("di"), F.col("x").alias("xi"),
            F.col("y").alias("yi"),
        )
        b = g.select(
            F.col("d").alias("dj"), F.col("x").alias("xj"),
            F.col("y").alias("yj"),
        )
        pairs = a.crossJoin(b).select(
            "di",
            "dj",
            F.abs(F.col("xi") - F.col("xj")).alias("aij"),
            F.abs(F.col("yi") - F.col("yj")).alias("bij"),
        )
        rowsums = pairs.groupBy("di").agg(
            F.sum("aij").cast("bigint").alias("ai"),
            F.sum("bij").cast("bigint").alias("bi"),
        )
        grand = rowsums.agg(
            F.sum("ai").cast("bigint").alias("adot"),
            F.sum("bi").cast("bigint").alias("bdot"),
        )
        ri = rowsums.select(
            F.col("di").alias("r_di"),
            F.col("ai").alias("ai_i"),
            F.col("bi").alias("bi_i"),
        )
        rj = rowsums.select(
            F.col("di").alias("r_dj"),
            F.col("ai").alias("ai_j"),
            F.col("bi").alias("bi_j"),
        )
        centered = (
            pairs.join(ri, pairs.di == ri.r_di)
            .join(rj, pairs.dj == rj.r_dj)
            .crossJoin(F.broadcast(grand))
            .crossJoin(F.broadcast(n_df))
            .select(
                (
                    F.col("n").cast(dec) * F.col("n") * F.col("aij")
                    - F.col("n").cast(dec) * F.col("ai_i")
                    - F.col("n").cast(dec) * F.col("ai_j")
                    + F.col("adot")
                ).alias("aa"),
                (
                    F.col("n").cast(dec) * F.col("n") * F.col("bij")
                    - F.col("n").cast(dec) * F.col("bi_i")
                    - F.col("n").cast(dec) * F.col("bi_j")
                    + F.col("bdot")
                ).alias("bb"),
            )
        )
        sums = centered.agg(
            F.sum(F.col("aa") * F.col("bb")).alias("sab"),
            F.sum(F.col("aa") * F.col("aa")).alias("saa"),
            F.sum(F.col("bb") * F.col("bb")).alias("sbb"),
        )
        mom = g.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
            F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
            F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
        )
        j = mom.crossJoin(sums)
        num = (
            F.col("n").cast(dec) * F.col("sxy")
            - F.col("sx").cast(dec) * F.col("sy")
        ).cast("double")
        vx = (
            F.col("n").cast(dec) * F.col("sxx")
            - F.col("sx").cast(dec) * F.col("sx")
        )
        vy = (
            F.col("n").cast(dec) * F.col("syy")
            - F.col("sy").cast(dec) * F.col("sy")
        )
        pearson = num / F.sqrt(vx.cast("double") * vy.cast("double"))
        dcor = F.sqrt(
            F.col("sab").cast("double")
            / F.sqrt(
                F.col("saa").cast("double") * F.col("sbb").cast("double")
            )
        )
        return j.filter(
            (F.col("saa") > 0)
            & (F.col("sbb") > 0)
            & (vx > 0)
            & (vy > 0)
        ).select(
            F.col("n").alias("n_days"),
            F.round(pearson, 6).alias("pearson_r"),
            F.round(dcor, 6).alias("dcor"),
        )

    return persisted_result(daily, _build)


@register(
    "crps_ensemble_backtest",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY 1, 2
        ),
        train AS (
            SELECT event_type, cents FROM daily
            WHERE day < TIMESTAMP '{_PINBALL_SPLIT}'
        ),
        test AS (
            SELECT event_type, cents FROM daily
            WHERE day >= TIMESTAMP '{_PINBALL_SPLIT}'
        ),
        ranked AS (
            SELECT event_type, cents,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY cents, event_type) AS BIGINT) AS rn,
                   CAST(COUNT(*) OVER (
                       PARTITION BY event_type) AS BIGINT) AS mm
            FROM train
        ),
        spread AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM((2 * rn - 1 - mm) * cents) AS BIGINT)
                       AS pair_abs
            FROM ranked GROUP BY event_type
        ),
        absterm AS (
            SELECT t.event_type,
                   CAST(COUNT(*) AS BIGINT) AS nm,
                   CAST(SUM(ABS(t.cents - r.cents)) AS BIGINT) AS tot_abs,
                   CAST(COUNT(*) / MAX(s.m) AS BIGINT) AS n_test_days
            FROM test t
            JOIN train r USING (event_type)
            JOIN spread s USING (event_type)
            GROUP BY t.event_type
        )
        SELECT a.event_type,
               a.n_test_days,
               s.m AS n_ens,
               ROUND(CAST(a.tot_abs AS DOUBLE) / a.nm / 100.0
                     - CAST(s.pair_abs AS DOUBLE) / (1.0 * s.m * s.m)
                       / 100.0, 4) AS crps,
               ROUND(CAST(a.tot_abs AS DOUBLE) / a.nm / 100.0, 4)
                   AS abs_term,
               ROUND(CAST(s.pair_abs AS DOUBLE) / (1.0 * s.m * s.m)
                     / 100.0, 4) AS spread_term
        FROM absterm a JOIN spread s USING (event_type)
        WHERE s.m >= 1 AND a.nm >= 1
    """,
    doc=(
        "CRPS ENSEMBLE BACKTEST (Gneiting & Raftery 2007): per "
        "event_type, the pre-split training days form an EMPIRICAL "
        "ENSEMBLE forecast of daily cents (the climatological "
        "distribution) and every held-out day's actual y is scored "
        "with the continuous ranked probability score CRPS(F, y) = "
        "E|X - y| - E|X - X'|/2 — the proper scoring rule for the "
        "WHOLE predictive distribution, which generalizes what "
        "pinball_loss_backtest measures at three fixed quantiles "
        "(CRPS = 2 * integral of pinball loss over ALL quantile "
        "levels) and collapses to MAE for a point forecast. Both "
        "expectations are EXACT INTEGER sums of cents: E|X - y| from "
        "the bounded test-day x train-day equi-join (day-span^2 rows "
        "per type, never data-sized), and the ensemble spread "
        "E|X - X'|/2 = sum_{i<j} (x_(j) - x_(i)) / M^2 via the sorted-"
        "rank identity sum_j (2j - 1 - M) x_(j) (the i<j HALF-sum, so "
        "the /2 is already folded in) — O(M log M), no pair "
        "materialization; the two divisions at the end are the only "
        "doubles. abs_term/spread_term are emitted so the "
        "calibration-vs-sharpness split is visible (a sharp but "
        "biased ensemble and a vague centered one can tie on CRPS). "
        "Plan: one corpus scan to the persisted day grid; rank "
        "window partitioned BY event_type over the bounded per-type "
        "day list."
    ),
    tags=("timeseries", "statistics", "evals"),
)
def crps_ensemble_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from weather_stream_processor_spark.plans.caching import persisted_result

    ev = load_table(spark, sf_dir, "events")
    split = F.lit(_PINBALL_SPLIT).cast("timestamp")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )

    def _build(daily_c: DataFrame) -> DataFrame:
        train = daily_c.filter(F.col("day") < split).select(
            "event_type", "cents"
        )
        test = daily_c.filter(F.col("day") >= split).select(
            "event_type", "cents"
        )
        w_rank = Window.partitionBy("event_type").orderBy(
            "cents", "event_type"
        )
        w_cnt = Window.partitionBy("event_type")
        ranked = train.select(
            "event_type",
            "cents",
            F.row_number().over(w_rank).cast("bigint").alias("rn"),
            F.count(F.lit(1)).over(w_cnt).cast("bigint").alias("mm"),
        )
        spread = ranked.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("m"),
            F.sum(
                (2 * F.col("rn") - 1 - F.col("mm")) * F.col("cents")
            )
            .cast("bigint")
            .alias("pair_abs"),
        )
        absterm = (
            test.join(
                train.withColumnRenamed("cents", "ens_cents"), "event_type"
            )
            .join(F.broadcast(spread), "event_type")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("nm"),
                F.sum(F.abs(F.col("cents") - F.col("ens_cents")))
                .cast("bigint")
                .alias("tot_abs"),
                (F.count(F.lit(1)) / F.max("m"))
                .cast("bigint")
                .alias("n_test_days"),
            )
        )
        j = absterm.join(F.broadcast(spread), "event_type").filter(
            (F.col("m") >= 1) & (F.col("nm") >= 1)
        )
        abs_d = F.col("tot_abs").cast("double") / F.col("nm") / F.lit(100.0)
        spr_d = (
            F.col("pair_abs").cast("double")
            / (F.lit(1.0) * F.col("m") * F.col("m"))
            / F.lit(100.0)
        )
        return j.select(
            "event_type",
            "n_test_days",
            F.col("m").alias("n_ens"),
            F.round(abs_d - spr_d, 4).alias("crps"),
            F.round(abs_d, 4).alias("abs_term"),
            F.round(spr_d, 4).alias("spread_term"),
        )

    return persisted_result(daily, _build)


@register(
    "negative_binomial_fit",
    oracle="""
        WITH cells AS (
            SELECT event_type, user_id, date_trunc('day', ts) AS day,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2, 3
        ),
        spine AS (
            SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                   CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days
            FROM cells
        ),
        mom AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS nnz,
                   CAST(SUM(c) AS BIGINT) AS s,
                   CAST(SUM(c * c) AS BIGINT) AS ss
            FROM cells GROUP BY event_type
        ),
        fit AS (
            SELECT m.event_type,
                   sp.n_users * sp.n_days AS n,
                   m.nnz, m.s, m.ss,
                   CAST(m.s AS DOUBLE) / (sp.n_users * sp.n_days) AS mu,
                   (CAST(sp.n_users * sp.n_days AS DOUBLE) * m.ss
                    - CAST(m.s AS DOUBLE) * m.s)
                   / (CAST(sp.n_users * sp.n_days AS DOUBLE)
                      * (sp.n_users * sp.n_days - 1)) AS v
            FROM mom m CROSS JOIN spine sp
        )
        SELECT event_type,
               n AS n_cells,
               nnz AS n_nonzero,
               ROUND(mu, 6) AS mean_count,
               ROUND(v, 6) AS var_count,
               ROUND(mu * mu / (v - mu), 6) AS nb_r,
               ROUND(CAST(n - nnz AS DOUBLE) / n, 6) AS obs_zero_frac,
               ROUND(EXP(-mu), 6) AS poisson_zero_frac,
               ROUND(POWER((mu * mu / (v - mu))
                           / ((mu * mu / (v - mu)) + mu),
                           mu * mu / (v - mu)), 6) AS nb_zero_frac
        FROM fit
        WHERE n >= 2 AND v > mu
    """,
    doc=(
        "NEGATIVE-BINOMIAL METHOD-OF-MOMENTS FIT per event_type on the "
        "(user x day) count grid — the MODELING follow-up to "
        "poisson_dispersion_test (that op DETECTS overdispersion; "
        "this one FITS the model you switch to once it is detected, "
        "and scores the switch on the zeros): NB with mean mu and "
        "shape r = mu^2/(var - mu) (MoM on the gamma-Poisson mixture), "
        "scored by the three zero fractions side by side — observed "
        "P(count = 0), Poisson's e^(-mu), and NB's (r/(r+mu))^r — the "
        "columns a capacity/anomaly model reads to decide which "
        "arrival law to simulate user-days under. The zero-filled "
        "spine is NEVER materialized: N = n_users * n_days, zero "
        "cells = N - nonzero, and the spine moments are algebraic in "
        "the nonzero-cell integer sums (S, SS unchanged by zeros) — "
        "one corpus scan to the nonzero (type, user, day) cells, "
        "global distinct counts from the same persisted frame, per-"
        "type closed forms after. Under-dispersed or equi-dispersed "
        "types (var <= mean: NB undefined, Poisson already fits) "
        "excluded, mirrored. All inputs to every double expression "
        "are exact BIGINTs, so both engines evaluate identical IEEE "
        "arithmetic; the six emitted doubles are 6dp-rounded and "
        "margin-audited."
    ),
    tags=("timeseries", "statistics", "llm"),
)
def negative_binomial_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_stream_processor_spark.plans.caching import persisted_result

    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))

    def _build(cells_c: DataFrame) -> DataFrame:
        spine = cells_c.agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.countDistinct("day").cast("bigint").alias("n_days"),
        )
        mom = cells_c.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("nnz"),
            F.sum("c").cast("bigint").alias("s"),
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ss"),
        )
        n = F.col("n_users") * F.col("n_days")
        mu = F.col("s").cast("double") / n
        v = (n.cast("double") * F.col("ss") - F.col("s").cast("double") * F.col("s")) / (
            n.cast("double") * (n - 1)
        )
        fit = mom.crossJoin(F.broadcast(spine)).select(
            "event_type",
            n.alias("n"),
            "nnz",
            mu.alias("mu"),
            v.alias("v"),
        )
        mu2, v2 = F.col("mu"), F.col("v")
        r2 = mu2 * mu2 / (v2 - mu2)
        return fit.filter((F.col("n") >= 2) & (v2 > mu2)).select(
            "event_type",
            F.col("n").alias("n_cells"),
            F.col("nnz").alias("n_nonzero"),
            F.round(mu2, 6).alias("mean_count"),
            F.round(v2, 6).alias("var_count"),
            F.round(r2, 6).alias("nb_r"),
            F.round(
                (F.col("n") - F.col("nnz")).cast("double") / F.col("n"), 6
            ).alias("obs_zero_frac"),
            F.round(F.exp(-mu2), 6).alias("poisson_zero_frac"),
            F.round(F.pow(r2 / (r2 + mu2), r2), 6).alias("nb_zero_frac"),
        )

    return persisted_result(cells, _build)


@register(
    "markov_entropy_rate",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        ),
        tm AS (
            SELECT event_type AS src, next_type AS dst,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY 1, 2
        ),
        row_tot AS (
            SELECT src, CAST(SUM(c) AS BIGINT) AS r FROM tm GROUP BY src
        ),
        tot AS (
            SELECT CAST(SUM(r) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_states
            FROM row_tot
        ),
        cond_terms AS (
            SELECT CAST(FLOOR(
                       -(CAST(t.c AS DOUBLE) / n.n)
                       * LOG2(CAST(t.c AS DOUBLE) / r.r)
                       * 1000000000.0 + 0.5) AS BIGINT) AS tq
            FROM tm t
            JOIN row_tot r USING (src)
            CROSS JOIN tot n
        ),
        marg_terms AS (
            SELECT CAST(FLOOR(
                       -(CAST(r.r AS DOUBLE) / n.n)
                       * LOG2(CAST(r.r AS DOUBLE) / n.n)
                       * 1000000000.0 + 0.5) AS BIGINT) AS mq
            FROM row_tot r CROSS JOIN tot n
        ),
        hsum AS (
            SELECT (SELECT CAST(SUM(tq) AS BIGINT) FROM cond_terms) AS ht,
                   (SELECT CAST(SUM(mq) AS BIGINT) FROM marg_terms) AS hm
        )
        SELECT t.n AS n_transitions,
               t.n_states,
               ROUND(CAST(h.ht AS DOUBLE) / 1000000000.0, 6)
                   AS cond_entropy_bits,
               ROUND(CAST(h.hm AS DOUBLE) / 1000000000.0, 6)
                   AS marginal_entropy_bits,
               ROUND(CAST(h.hm - h.ht AS DOUBLE) / 1000000000.0, 6)
                   AS predictability_gain_bits,
               ROUND(POWER(2.0, CAST(h.ht AS DOUBLE) / 1000000000.0), 6)
                   AS transition_perplexity
        FROM hsum h CROSS JOIN tot t
        WHERE t.n >= 1
    """,
    doc=(
        "MARKOV ENTROPY RATE of the per-user event stream — the "
        "PREDICTABILITY reduction of event_transition_matrix (that op "
        "emits the k x k transition counts; this one answers the "
        "question they exist for: how many bits does the NEXT action "
        "cost once you know the current one): plug-in conditional "
        "entropy H(X_next | X_cur) = -sum_ij (n_ij/N) log2(n_ij/n_i) "
        "over the same (user-partitioned, ts/event_id-ordered) LEAD "
        "pairs, beside the iid baseline H(X) on the from-state "
        "marginal — their gap is the predictability the sequence "
        "structure buys (0 bits = memoryless stream; the gap is what "
        "a next-event model can ever exploit), and 2^H is the "
        "effective branching factor (transition perplexity, the "
        "capacity number a session-simulator or prefetcher sizes "
        "against). Every probability is a ratio of exact BIGINT "
        "counts (identical IEEE doubles both engines); the k^2 "
        "entropy terms are 1e9-floor-lifted before summation so the "
        "cross-row sums of transcendental outputs are order-free "
        "integer sums (the eb_rate_shrinkage discipline at the "
        "periodogram's transcendental-lift scale). Plan: one corpus "
        "scan through the per-user LEAD window, a k^2-row aggregate, "
        "k^2-row arithmetic after; deterministic rows (p = 1) "
        "contribute an exact 0."
    ),
    tags=("timeseries", "statistics", "llm", "window"),
)
def markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    tm = seq.groupBy(
        F.col("event_type").alias("src"), F.col("next_type").alias("dst")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    from weather_stream_processor_spark.plans.caching import persisted_result

    def _build(tm_c: DataFrame) -> DataFrame:
        row_tot = tm_c.groupBy("src").agg(
            F.sum("c").cast("bigint").alias("r")
        )
        tot = row_tot.agg(
            F.sum("r").cast("bigint").alias("n"),
            F.count(F.lit(1)).cast("bigint").alias("n_states"),
        )
        cond = (
            tm_c.join(F.broadcast(row_tot), "src")
            .crossJoin(F.broadcast(tot))
            .select(
                F.floor(
                    -(F.col("c").cast("double") / F.col("n"))
                    * F.log2(F.col("c").cast("double") / F.col("r"))
                    * F.lit(1e9)
                    + F.lit(0.5)
                )
                .cast("bigint")
                .alias("tq")
            )
            .agg(F.sum("tq").cast("bigint").alias("ht"))
        )
        marg = (
            row_tot.crossJoin(F.broadcast(tot))
            .select(
                F.floor(
                    -(F.col("r").cast("double") / F.col("n"))
                    * F.log2(F.col("r").cast("double") / F.col("n"))
                    * F.lit(1e9)
                    + F.lit(0.5)
                )
                .cast("bigint")
                .alias("mq")
            )
            .agg(F.sum("mq").cast("bigint").alias("hm"))
        )
        h = F.col("ht").cast("double") / F.lit(1e9)
        return (
            cond.crossJoin(F.broadcast(marg))
            .crossJoin(F.broadcast(tot))
            .filter(F.col("n") >= 1)
            .select(
                F.col("n").alias("n_transitions"),
                "n_states",
                F.round(h, 6).alias("cond_entropy_bits"),
                F.round(F.col("hm").cast("double") / F.lit(1e9), 6).alias(
                    "marginal_entropy_bits"
                ),
                F.round(
                    (F.col("hm") - F.col("ht")).cast("double") / F.lit(1e9),
                    6,
                ).alias("predictability_gain_bits"),
                F.round(F.pow(F.lit(2.0), h), 6).alias(
                    "transition_perplexity"
                ),
            )
        )

    return persisted_result(tm, _build)


_NW_MAX_LAG = 7


@register(
    "newey_west_robust_se",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY 1, 2
        ),
        idx AS (
            SELECT event_type, cents,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY day) AS BIGINT)
                       AS t
            FROM daily
        ),
        tot AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS s
            FROM idx GROUP BY event_type
        ),
        centered AS (
            SELECT i.event_type, i.t, t.n, t.s,
                   t.n * i.cents - t.s AS z
            FROM idx i JOIN tot t USING (event_type)
        ),
        lags AS (
            SELECT a.event_type, b.t - a.t AS k,
                   CAST(SUM(a.z * b.z) AS BIGINT) AS lk,
                   MAX(a.n) AS n
            FROM centered a
            JOIN centered b
              ON a.event_type = b.event_type
             AND b.t - a.t BETWEEN 0 AND {_NW_MAX_LAG}
            GROUP BY a.event_type, b.t - a.t
        ),
        gam AS (
            SELECT event_type, n,
                   SUM(CASE WHEN k = 0 THEN CAST(lk AS DOUBLE) END)
                       / (CAST(n AS DOUBLE) * n * n) AS g0,
                   SUM(CASE WHEN k > 0 THEN
                       2.0 * (1.0 - CAST(k AS DOUBLE)
                              / ({_NW_MAX_LAG} + 1.0))
                       * CAST(lk AS DOUBLE) END)
                       / (CAST(n AS DOUBLE) * n * n) AS g2
            FROM lags GROUP BY event_type, n
        )
        SELECT event_type,
               n AS n_days,
               ROUND(SQRT(g0) / 100.0, 6) AS sd_daily_usd,
               ROUND(SQRT(g0 * n / (n - 1.0) / n) / 100.0, 6)
                   AS se_iid_usd,
               ROUND(SQRT(GREATEST(
                   (g0 + COALESCE(g2, 0.0)) / n, 0.0)) / 100.0, 6)
                   AS se_newey_west_usd,
               ROUND((g0 * n / (n - 1.0) / n)
                     / ((g0 + COALESCE(g2, 0.0)) / n), 6) AS ess_ratio
        FROM gam
        WHERE n > {_NW_MAX_LAG} + 1 AND g0 > 0
              AND (g0 + COALESCE(g2, 0.0)) > 0
    """,
    doc=(
        "NEWEY-WEST (HAC) ROBUST STANDARD ERROR of the daily-cents "
        "mean per event_type — the honest-uncertainty member for "
        "SERIALLY CORRELATED series, completing the inference family "
        "(poisson_bootstrap_ci assumes exchangeable docs, "
        "jackknife_source_se clusters by source — both assume "
        "independent units; a DAILY series is autocorrelated, so the "
        "iid s/sqrt(n) understates the SE exactly when Ljung-Box "
        "fires): Var_NW(xbar) = (gamma_0 + 2 sum_k (1 - k/(L+1)) "
        f"gamma_k)/n with the Bartlett kernel at L = {_NW_MAX_LAG} "
        "(PSD by construction, clamped mirrored anyway), emitted in DOLLARS (sqrt scale — the margin audit flagged raw "
        "cents^2 gamma_0 at ~1e15 as sub-ulp for a 6dp grid) next "
        "to the iid SE and their squared ratio — the EFFECTIVE-"
        "SAMPLE-SIZE deflation (ess_ratio 0.5 means your 30 days "
        "carry 15 days of information; the number that corrects "
        "every downstream CI on the series). Every lag covariance is "
        "an EXACT integer: centering lifts by n (z_t = n*x_t - S), "
        "so L_k = sum z_t z_(t+k) is an exact BIGINT and gamma_k = "
        "L_k/n^3 — identical IEEE doubles both engines; the lag "
        "pairing is a banded self-join on the day index (day-span x "
        "(L+1) rows per type, never data-sized). Short series "
        "(n <= L+1) and constant series excluded mirrored. Plan: one "
        "corpus scan to the day grid, a type-partitioned row_number, "
        "one banded equi-range join on the bounded grid."
    ),
    tags=("timeseries", "statistics", "window"),
)
def newey_west_robust_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    from weather_stream_processor_spark.plans.caching import persisted_result

    def _build(daily_c: DataFrame) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy("day")
        idx = daily_c.select(
            "event_type",
            "cents",
            F.row_number().over(w).cast("bigint").alias("t"),
        )
        tot = idx.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cents").cast("bigint").alias("s"),
        )
        centered = idx.join(F.broadcast(tot), "event_type").select(
            "event_type",
            "t",
            "n",
            (F.col("n") * F.col("cents") - F.col("s")).alias("z"),
        )
        a = centered.select(
            "event_type",
            F.col("t").alias("ta"),
            F.col("z").alias("za"),
            "n",
        )
        b = centered.select(
            "event_type", F.col("t").alias("tb"), F.col("z").alias("zb")
        )
        lags = (
            a.join(b, "event_type")
            .filter(
                (F.col("tb") - F.col("ta") >= 0)
                & (F.col("tb") - F.col("ta") <= _NW_MAX_LAG)
            )
            .groupBy("event_type", (F.col("tb") - F.col("ta")).alias("k"))
            .agg(
                F.sum(F.col("za") * F.col("zb")).cast("bigint").alias("lk"),
                F.max("n").alias("n"),
            )
        )
        n_d = F.col("n").cast("double")
        gam = lags.groupBy("event_type", "n").agg(
            (
                F.sum(
                    F.when(F.col("k") == 0, F.col("lk").cast("double"))
                )
                / (n_d * F.col("n") * F.col("n"))
            ).alias("g0"),
            (
                F.sum(
                    F.when(
                        F.col("k") > 0,
                        F.lit(2.0)
                        * (
                            F.lit(1.0)
                            - F.col("k").cast("double")
                            / F.lit(_NW_MAX_LAG + 1.0)
                        )
                        * F.col("lk").cast("double"),
                    )
                )
                / (n_d * F.col("n") * F.col("n"))
            ).alias("g2"),
        )
        g0, g2 = F.col("g0"), F.coalesce(F.col("g2"), F.lit(0.0))
        se_iid2 = g0 * F.col("n") / (F.col("n") - F.lit(1.0)) / F.col("n")
        var_nw = (g0 + g2) / F.col("n")
        return gam.filter(
            (F.col("n") > _NW_MAX_LAG + 1)
            & (g0 > 0)
            & ((g0 + g2) > 0)
        ).select(
            "event_type",
            F.col("n").alias("n_days"),
            F.round(F.sqrt(g0) / F.lit(100.0), 6).alias("sd_daily_usd"),
            F.round(F.sqrt(se_iid2) / F.lit(100.0), 6).alias("se_iid_usd"),
            F.round(
                F.sqrt(F.greatest(var_nw, F.lit(0.0))) / F.lit(100.0), 6
            ).alias("se_newey_west_usd"),
            F.round(se_iid2 / var_nw, 6).alias("ess_ratio"),
        )

    return persisted_result(daily, _build)


@register(
    "cooks_distance_trend",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   date_diff('day', DATE '1970-01-01',
                             CAST(date_trunc('day', ts) AS DATE)) AS d,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY 1, 2
        ),
        idx AS (
            SELECT event_type, d, cents,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY d
                   ) - 1 AS t,
                   CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT)
                       AS n
            FROM daily
        ),
        ctr AS (
            SELECT event_type, d, t, cents, n, 2 * t - (n - 1) AS tc
            FROM idx
        ),
        mom AS (
            SELECT event_type, d, t, cents, n, tc,
                   CAST(SUM(cents) OVER (PARTITION BY event_type)
                        AS BIGINT) AS sx,
                   CAST(SUM(tc * cents) OVER (PARTITION BY event_type)
                        AS BIGINT) AS bnum,
                   CAST(SUM(tc * tc) OVER (PARTITION BY event_type)
                        AS BIGINT) AS delta
            FROM ctr
        ),
        resid AS (
            SELECT event_type, d, t, n, tc, delta,
                   CAST(n AS HUGEINT) * delta * cents
                       - CAST(delta AS HUGEINT) * sx
                       - CAST(n AS HUGEINT) * bnum * tc AS e
            FROM mom
        ),
        sums AS (
            SELECT event_type,
                   SUM(CAST(e AS HUGEINT) * e) AS sse
            FROM resid GROUP BY event_type
        ),
        scored AS (
            SELECT r.event_type, r.d, r.t, r.n, r.tc, r.delta, r.e, s.sse,
                   CAST(r.e AS DOUBLE)
                       / (CAST(r.n AS DOUBLE) * r.delta) / 100.0
                       AS resid_usd,
                   (CAST(r.delta AS DOUBLE) + r.n * r.tc * r.tc)
                       / (CAST(r.n AS DOUBLE) * r.delta) AS lev,
                   (CAST(r.e AS DOUBLE) * CAST(r.e AS DOUBLE)
                    / CAST(s.sse AS DOUBLE))
                   * (r.n - 2)
                   * (CAST(r.delta AS DOUBLE) + r.n * r.tc * r.tc)
                   * r.n * CAST(r.delta AS DOUBLE)
                   / (2.0 * (CAST(r.n AS DOUBLE) * r.delta - r.delta
                             - r.n * r.tc * r.tc)
                          * (CAST(r.n AS DOUBLE) * r.delta - r.delta
                             - r.n * r.tc * r.tc)) AS cd
            FROM resid r JOIN sums s USING (event_type)
            WHERE r.n >= 4 AND r.delta > 0 AND s.sse > 0
        )
        SELECT event_type,
               CAST(t AS BIGINT) AS day_index,
               ROUND(resid_usd, 6) AS resid_usd,
               ROUND(lev, 6) AS leverage,
               ROUND(cd, 6) AS cooks_d,
               CASE WHEN cd * n > 4.0 THEN 1 ELSE 0 END AS influential
        FROM scored
    """,
    doc=(
        "COOK'S DISTANCE + LEVERAGE per day for the per-type daily "
        "linear-day-trend fit — the INFLUENCE diagnostic that closes "
        "the trend loop (mann_kendall DETECTS, theilsen/OLS FIT, "
        "durbin_watson checks residual AUTOCORRELATION; this names "
        "WHICH DAYS the fitted slope actually rests on): D_t = "
        "e_t^2 h_t / (p s^2 (1-h_t)^2) with p = 2, flagged at the "
        "standard 4/n cut — a flagged day is one whose removal moves "
        "the trend line materially (the single-day outage or bot "
        "burst that manufactures a fake trend). Shares durbin_"
        "watson's EXACT residual lift verbatim (symmetric integer "
        "time tc = 2t-(n-1) decouples the intercept; E_t = n*delta*"
        "y_t - delta*S - n*bnum*tc is an exact HUGEINT/DECIMAL(38,0) "
        "integer), leverage h_t = (delta + n tc^2)/(n delta) is a "
        "ratio of exact integers, and D_t algebra is arranged so "
        "every factor is a ratio/product of exact integers cast to "
        "double in the SAME order in both engines — E^2 and "
        "sum(E^2) stay exact 128-bit/DECIMAL(38,0) integers "
        "(~1e28 at fixture scale, documented bound |E| < 1e19 ceil). "
        "resid_usd emitted in dollars (the newey_west sub-ulp "
        "lesson). Degenerate fits (n < 4, zero delta or SSE) "
        "excluded mirrored. Plan: one corpus scan to the day grid, "
        "type-partitioned windows, one per-type SSE aggregate "
        "broadcast back — day-grid-bounded everywhere."
    ),
    tags=("timeseries", "statistics", "window"),
)
def cooks_distance_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    daily = _daily_cents(spark, sf_dir)
    w_t = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "cents",
        (
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("d")
            )
            - 1
        ).alias("t"),
        F.count(F.lit(1)).over(w_t).cast("bigint").alias("n"),
    )
    ctr = idx.select(
        "event_type",
        "t",
        "cents",
        "n",
        (2 * F.col("t") - (F.col("n") - 1)).alias("tc"),
    )
    mom = ctr.select(
        "event_type",
        "t",
        "cents",
        "n",
        "tc",
        F.sum("cents").over(w_t).cast("bigint").alias("sx"),
        F.sum(F.col("tc") * F.col("cents"))
        .over(w_t)
        .cast("bigint")
        .alias("bnum"),
        F.sum(F.col("tc") * F.col("tc"))
        .over(w_t)
        .cast("bigint")
        .alias("delta"),
    )
    dec = "decimal(38,0)"
    e = (
        F.col("n").cast(dec) * F.col("delta") * F.col("cents")
        - F.col("delta").cast(dec) * F.col("sx")
        - F.col("n").cast(dec) * F.col("bnum") * F.col("tc")
    )
    from weather_stream_processor_spark.plans.caching import truncate_lineage

    # the residual frame is day-grid bounded: one eager checkpoint means
    # the corpus scan runs once instead of once per consumer (sums +
    # scored — the plan audit saw 2 parquet scans)
    resid = truncate_lineage(
        mom.select("event_type", "t", "n", "tc", "delta", e.alias("e"))
    )
    sums = resid.groupBy("event_type").agg(
        F.sum(F.col("e") * F.col("e")).alias("sse")
    )
    nd = F.col("n").cast("double")
    dd = F.col("delta").cast("double")
    ed = F.col("e").cast("double")
    hnum = dd + F.col("n") * F.col("tc") * F.col("tc")
    onemh = nd * F.col("delta") - F.col("delta") - F.col("n") * F.col(
        "tc"
    ) * F.col("tc")
    cd = (
        (ed * ed / F.col("sse").cast("double"))
        * (F.col("n") - 2)
        * hnum
        * F.col("n")
        * dd
        / (F.lit(2.0) * onemh.cast("double") * onemh.cast("double"))
    )
    scored = (
        resid.join(F.broadcast(sums), "event_type")
        .filter(
            (F.col("n") >= 4) & (F.col("delta") > 0) & (F.col("sse") > 0)
        )
        .select(
            "event_type",
            F.col("t").cast("bigint").alias("day_index"),
            F.round(ed / (nd * F.col("delta")) / F.lit(100.0), 6).alias(
                "resid_usd"
            ),
            F.round(hnum / (nd * F.col("delta")), 6).alias("leverage"),
            F.round(cd, 6).alias("cooks_d"),
            F.when(cd * F.col("n") > 4.0, 1).otherwise(0).alias(
                "influential"
            ),
        )
    )
    return scored
