"""Streaming operators surfaced as oracle-checkable queries.

Each builder drives the REAL Structured Streaming engine (FileStreamSource
replay, state store, watermarks, memory sink) to completion with
``availableNow`` and returns the drained result — so the driver's DuckDB
oracle verifies end-to-end streaming semantics, not a batch re-derivation.
Complete output mode makes a bounded replay equivalent to the batch
query, which is exactly what the oracle SQL expresses.

Memory-sink table names are unique per invocation (the driver may call a
builder repeatedly in one session).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_stream_processor_spark.registry import register
from weather_stream_processor_spark.streaming.pipeline import (
    hourly_precipitation_aggregate,
    parse_weather_wire,
    session_aggregate,
    sliding_aggregate,
)
from weather_stream_processor_spark.streaming.replay import (
    events_as_weather_wire,
    events_replay_source,
    run_to_memory,
)

_COUNTER = itertools.count()


def _sink_name(base: str) -> str:
    return f"{base}_{next(_COUNTER)}"


@register(
    "streaming_hourly_agg",
    oracle="""
        SELECT date_trunc('hour', ts) AS hour,
               event_type,
               ROUND(SUM(value), 5) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
    doc=(
        "The flagship aggregation THROUGH the streaming engine: replay "
        "events via FileStreamSource, watermarked tumbling 1h window sum, "
        "complete mode, memory sink. The oracle proves the incremental "
        "stateful plan (StateStoreRestore/Save around partial+final agg) "
        "converges to the batch answer."
    ),
    tags=("streaming", "headline"),
)
def streaming_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_replay_source(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.round(F.sum("value"), 5).alias("total_value"))
        .select(F.col("w.start").alias("hour"), "event_type", "total_value")
    )
    return run_to_memory(agg, _sink_name("streaming_hourly_agg"))


@register(
    "streaming_weather_wire_pipeline",
    oracle="""
        SELECT date_trunc('hour', date_trunc('second', ts)) AS hour,
               CAST(user_id AS DOUBLE) AS lat,
               CAST(-user_id AS DOUBLE) AS lon,
               ROUND(SUM(value), 5) AS hourly_precipitation
        FROM events
        GROUP BY 1, 2, 3
    """,
    doc=(
        "The COMPLETE reference consumer, end to end, on the streaming "
        "engine: events re-encoded as the Kafka wire format (binary JSON "
        "value, epoch-seconds string timestamp, nested location) -> "
        "CAST AS STRING -> from_json(declared schema) -> flatten -> "
        "epoch->timestamp -> null filter -> watermarked hourly window SUM "
        "per location (weather_processor.py:127-141 with Q5/Q6/St3/St5 "
        "fixed). Oracle mirrors the epoch-second truncation of the wire."
    ),
    tags=("streaming", "reference", "headline"),
)
def streaming_weather_wire_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    wire = events_as_weather_wire(spark, sf_dir)
    parsed = parse_weather_wire(wire)
    agg = hourly_precipitation_aggregate(parsed)
    return run_to_memory(agg, _sink_name("streaming_weather_wire"))


@register(
    "streaming_sliding_window",
    oracle="""
        SELECT ws AS window_start,
               event_type,
               ROUND(SUM(value), 5) AS total_value
        FROM (
            SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                           time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS ws,
                   event_type, value
            FROM events
        )
        GROUP BY 1, 2
    """,
    doc=(
        "Sliding window (1h length, 30m slide) by event_type through the "
        "streaming engine; each event contributes to exactly 2 windows. "
        "Oracle expands the window membership explicitly."
    ),
    tags=("streaming", "window"),
)
def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_replay_source(spark, sf_dir)
    agg = sliding_aggregate(
        ev, ts_col="ts", keys=("event_type",), value_col="value"
    )
    return run_to_memory(agg, _sink_name("streaming_sliding"))


@register(
    "streaming_session_window",
    oracle="""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                        OR LAG(ts) OVER w IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING
                   ) AS session_id
            FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 5) AS total_value
        FROM sessions
        GROUP BY user_id, session_id
    """,
    doc=(
        "Gap-based session windows (30m) per user through the streaming "
        "engine's session_window operator (merging state store). Oracle "
        "recomputes sessions relationally via lag + running session ids; "
        "boundary semantics matched (a gap of exactly 30m starts a new "
        "session in both)."
    ),
    tags=("streaming", "session"),
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_replay_source(spark, sf_dir)
    agg = session_aggregate(ev, ts_col="ts", keys=("user_id",), value_col="value")
    return run_to_memory(agg, _sink_name("streaming_session")).select(
        "user_id", "session_start", "n_events", "total_value"
    )


@register(
    "streaming_dedup_replay",
    oracle="""
        SELECT event_id, user_id, event_type, ROUND(value, 5) AS value
        FROM events
    """,
    doc=(
        "At-least-once -> effectively-once (St6/Q6 fix): every event is "
        "delivered twice (in-plan duplication off one source scan) and "
        "dropDuplicatesWithinWatermark(event_id) restores exactly the "
        "original rows — verified by the oracle being plain SELECT over "
        "events. Dedup state is bounded by the watermark horizon."
    ),
    tags=("streaming", "dedup", "headline"),
)
def streaming_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 (guide §1.2 — don't compute things you throw away): the doubled
    # delivery used to be a self-union of TWO FileStreamSource instances,
    # i.e. the parquet was scanned twice per micro-batch just to create
    # the duplicates the dedup state then removes. An in-plan explode
    # delivers each event exactly twice off ONE scan — the dedup operator
    # sees the identical doubled row stream (verified equal output, A/B
    # min-of-3 at sf0.1: 2.23 -> 1.90 s). On a real at-least-once source
    # the duplicates arrive IN the stream; this replay twin only chooses
    # how to synthesize them.
    ev = events_replay_source(spark, sf_dir)
    doubled = ev.withColumn(
        "_copy", F.explode(F.array(F.lit(1), F.lit(2)))
    ).drop("_copy")
    deduped = (
        doubled.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type", F.round("value", 5).alias("value"))
    )
    return run_to_memory(deduped, _sink_name("streaming_dedup"), output_mode="append")


@register(
    "streaming_record_breakers",
    oracle="""
        SELECT user_id, event_id, ts, ROUND(value, 5) AS value
        FROM (
            SELECT user_id, event_id, ts, value,
                   MAX(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS prev_max
            FROM events
        )
        WHERE prev_max IS NULL OR value > prev_max
    """,
    doc=(
        "CUSTOM stateful operator (applyInPandasWithState): per-user record "
        "tracker emitting only rows that strictly exceed the running max of "
        "value — state is ONE float per key across micro-batches, O(#keys) "
        "regardless of throughput. Spark has no built-in for cross-batch "
        "arbitrary state; this is the mandated escape hatch, oracle-checked "
        "against a relational running-max reformulation (the bounded replay "
        "delivers events in (ts, event_id) order, making both equivalent)."
    ),
    tags=("streaming", "stateful", "pandas-udf"),
)
def streaming_record_breakers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_stream_processor_spark.streaming.stateful import (
        record_breaking_events,
    )

    ev = events_replay_source(spark, sf_dir)
    breakers = record_breaking_events(ev)
    out = run_to_memory(
        breakers, _sink_name("streaming_record_breakers"), output_mode="append"
    )
    return out.select("user_id", "event_id", "ts", F.round("value", 5).alias("value"))


@register(
    "streaming_stream_static_join",
    oracle="""
        SELECT CASE WHEN event_type IN ('purchase', 'signup') THEN 'conversion'
                    WHEN event_type IN ('view', 'click') THEN 'engagement'
                    ELSE 'other' END AS category,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 5) AS total_value
        FROM events
        GROUP BY 1
    """,
    doc=(
        "Stream-static enrichment (SURVEY §2.6 'stream-static enrich'): "
        "the replay stream broadcast-joined to a static category dimension, "
        "then aggregated in complete mode. The static side never shuffles "
        "the stream at any scale."
    ),
    tags=("streaming", "join"),
)
def streaming_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_replay_source(spark, sf_dir)
    dim = ev.sparkSession.createDataFrame(
        [
            ("purchase", "conversion"),
            ("signup", "conversion"),
            ("view", "engagement"),
            ("click", "engagement"),
            ("error", "other"),
        ],
        ["event_type", "category"],
    )
    joined = ev.join(F.broadcast(dim), "event_type", "left").fillna(
        {"category": "other"}
    )
    agg = joined.groupBy("category").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 5).alias("total_value"),
    )
    return run_to_memory(agg, _sink_name("streaming_enrich"))


@register(
    "streaming_stream_stream_join",
    oracle="""
        SELECT v.user_id,
               v.event_id AS view_id,
               p.event_id AS purchase_id,
               CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS secs_to_purchase
        FROM (SELECT * FROM events WHERE event_type = 'view') v
        JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON v.user_id = p.user_id
         AND p.ts >= v.ts
         AND p.ts <= v.ts + INTERVAL 1 HOUR
    """,
    doc=(
        "STREAM-STREAM interval join: views joined to same-user purchases "
        "within the following hour — both sides are unbounded streams with "
        "watermarks, so the join state on each side is bounded by the "
        "interval + watermark horizon and rows age out as event time "
        "advances (Spark buffers both sides in the state store keyed by "
        "user_id). The attribution-window shape every event pipeline "
        "needs; oracle is the relational interval join."
    ),
    tags=("streaming", "join", "interval"),
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    views = (
        events_replay_source(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
    )
    purchases = (
        events_replay_source(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = views.join(
        purchases,
        (F.col("v_user_id") == F.col("p_user_id"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        F.col("v_user_id").alias("user_id"),
        "view_id",
        "purchase_id",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts")).alias(
            "secs_to_purchase"
        ),
    )
    return run_to_memory(
        joined, _sink_name("streaming_ss_join"), output_mode="append"
    )


@register(
    "streaming_stream_stream_left_join",
    # The availableNow endpoint IS deterministic and SQL-expressible:
    # matches, plus views evicted unmatched once the final global
    # watermark W = least(max view ts, max purchase ts) - 2h passes their
    # join horizon (v_ts + 1h < W; Spark's state eviction predicate is
    # strict). Views still in state when the replay ends are NOT emitted
    # — the oracle's horizon filter reproduces exactly that.
    oracle="""
        WITH v AS (
            SELECT user_id, event_id AS view_id, ts AS v_ts
            FROM events WHERE event_type = 'view'
        ),
        p AS (
            SELECT user_id, event_id AS purchase_id, ts AS p_ts
            FROM events WHERE event_type = 'purchase'
        ),
        wm AS (
            SELECT LEAST((SELECT MAX(v_ts) FROM v),
                         (SELECT MAX(p_ts) FROM p)) - INTERVAL 2 HOUR AS w
        ),
        matched AS (
            SELECT v.user_id, v.view_id, p.purchase_id,
                   -- floor each side to whole seconds BEFORE subtracting:
                   -- Spark's unix_timestamp() truncates per-timestamp,
                   -- while a fractional epoch difference would round
                   CAST(FLOOR(epoch(p.p_ts)) - FLOOR(epoch(v.v_ts)) AS BIGINT)
                       AS secs_to_purchase
            FROM v JOIN p ON v.user_id = p.user_id
                AND p.p_ts >= v.v_ts
                AND p.p_ts <= v.v_ts + INTERVAL 1 HOUR
        ),
        unmatched AS (
            SELECT v.user_id, v.view_id,
                   CAST(NULL AS BIGINT) AS purchase_id,
                   CAST(NULL AS BIGINT) AS secs_to_purchase
            FROM v, wm
            WHERE NOT EXISTS (
                    SELECT 1 FROM p
                    WHERE p.user_id = v.user_id
                      AND p.p_ts >= v.v_ts
                      AND p.p_ts <= v.v_ts + INTERVAL 1 HOUR)
              AND v.v_ts + INTERVAL 1 HOUR < wm.w
        )
        SELECT * FROM matched UNION ALL SELECT * FROM unmatched
    """,
    doc=(
        "STREAM-STREAM LEFT OUTER interval join: like the inner "
        "attribution join, but views with NO purchase in the hour are "
        "ALSO emitted (null purchase columns) — once the watermark passes "
        "their join horizon and their state is evicted. This is the "
        "'abandoned view' feed a funnel alerting pipeline consumes. State "
        "and shuffle identical to the inner join; the only addition is "
        "null emission at eviction, which is why outer stream-stream "
        "joins REQUIRE watermarks on both sides. The oracle models the "
        "final-watermark closure: matches + left rows unmatched below "
        "W = least(max side ts) - delay, minus the 1h join horizon."
    ),
    tags=("streaming", "join", "interval", "outer"),
)
def streaming_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    views = (
        events_replay_source(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
    )
    purchases = (
        events_replay_source(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = views.join(
        purchases,
        (F.col("v_user_id") == F.col("p_user_id"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    ).select(
        F.col("v_user_id").alias("user_id"),
        "view_id",
        "purchase_id",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts")).alias(
            "secs_to_purchase"
        ),
    )
    return run_to_memory(
        joined, _sink_name("streaming_ss_left_join"), output_mode="append"
    )


@register(
    "streaming_stream_stream_full_join",
    # Same final-watermark closure technique as the left join, both
    # directions: matches; views evicted unmatched once their join
    # horizon passes (v_ts + 1h < W); purchases evicted unmatched once
    # the watermark passes the latest view timestamp they could still
    # match (p_ts < W — a purchase matches views with v_ts in
    # [p_ts - 1h, p_ts], so its horizon IS p_ts).
    oracle="""
        WITH v AS (
            SELECT user_id, event_id AS view_id, ts AS v_ts
            FROM events WHERE event_type = 'view'
        ),
        p AS (
            SELECT user_id, event_id AS purchase_id, ts AS p_ts
            FROM events WHERE event_type = 'purchase'
        ),
        wm AS (
            SELECT LEAST((SELECT MAX(v_ts) FROM v),
                         (SELECT MAX(p_ts) FROM p)) - INTERVAL 2 HOUR AS w
        ),
        matched AS (
            SELECT v.user_id, v.view_id, p.purchase_id,
                   CAST(FLOOR(epoch(p.p_ts)) - FLOOR(epoch(v.v_ts)) AS BIGINT)
                       AS secs_to_purchase
            FROM v JOIN p ON v.user_id = p.user_id
                AND p.p_ts >= v.v_ts
                AND p.p_ts <= v.v_ts + INTERVAL 1 HOUR
        ),
        left_un AS (
            SELECT v.user_id, v.view_id,
                   CAST(NULL AS BIGINT) AS purchase_id,
                   CAST(NULL AS BIGINT) AS secs_to_purchase
            FROM v, wm
            WHERE NOT EXISTS (
                    SELECT 1 FROM p
                    WHERE p.user_id = v.user_id
                      AND p.p_ts >= v.v_ts
                      AND p.p_ts <= v.v_ts + INTERVAL 1 HOUR)
              AND v.v_ts + INTERVAL 1 HOUR < wm.w
        ),
        right_un AS (
            SELECT p.user_id,
                   CAST(NULL AS BIGINT) AS view_id,
                   p.purchase_id,
                   CAST(NULL AS BIGINT) AS secs_to_purchase
            FROM p, wm
            WHERE NOT EXISTS (
                    SELECT 1 FROM v
                    WHERE v.user_id = p.user_id
                      AND p.p_ts >= v.v_ts
                      AND p.p_ts <= v.v_ts + INTERVAL 1 HOUR)
              AND p.p_ts < wm.w
        )
        SELECT user_id, view_id, purchase_id, secs_to_purchase FROM matched
        UNION ALL SELECT * FROM left_un
        UNION ALL SELECT * FROM right_un
    """,
    doc=(
        "STREAM-STREAM FULL OUTER interval join — completes the "
        "streaming join matrix (inner/left/full): abandoned views AND "
        "orphan purchases (no view within the preceding hour) both "
        "surface with null far-side columns at state eviction. Same "
        "state/shuffle as the inner form; each side evicts at its own "
        "horizon (views at v_ts + 1h, purchases at p_ts). The oracle "
        "models the availableNow endpoint: matches plus each side\'s "
        "unmatched rows below the final watermark."
    ),
    tags=("streaming", "join", "interval", "outer"),
)
def streaming_stream_stream_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    views = (
        events_replay_source(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
    )
    purchases = (
        events_replay_source(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = views.join(
        purchases,
        (F.col("v_user_id") == F.col("p_user_id"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        "full_outer",
    ).select(
        F.coalesce("v_user_id", "p_user_id").alias("user_id"),
        "view_id",
        "purchase_id",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("v_ts")).alias(
            "secs_to_purchase"
        ),
    )
    return run_to_memory(
        joined, _sink_name("streaming_ss_full_join"), output_mode="append"
    )


@register(
    "streaming_chained_window_agg",
    oracle="""
        WITH wm AS (SELECT MAX(ts) - INTERVAL 2 HOUR AS w FROM events),
        hourly AS (
            SELECT date_trunc('hour', ts) AS h, event_type, SUM(value) AS hv
            FROM events, wm
            WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm.w
            GROUP BY 1, 2
        )
        SELECT date_trunc('day', h) AS day, event_type,
               ROUND(SUM(hv), 5) AS daily_value,
               COUNT(*) AS n_hours
        FROM hourly, wm
        WHERE date_trunc('day', h) + INTERVAL 1 DAY <= wm.w
        GROUP BY 1, 2
    """,
    doc=(
        "CHAINED STATEFUL AGGREGATION (multiple stateful operators in one "
        "streaming query, Spark 3.5+): hourly window sums feed a second "
        "windowed aggregation rolling them into daily totals, both "
        "incremental, in append mode. The pre-aggregation means the daily "
        "state sees |hours x types| rows, not |events| — the streaming "
        "form of partial aggregation, and the shape of every metrics-"
        "rollup topology (1m -> 1h -> 1d). Oracle replicates append-mode "
        "closure: only windows wholly before the final watermark "
        "(max ts - 2h) are emitted, at both levels."
    ),
    tags=("streaming", "window", "chained"),
)
def streaming_chained_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_replay_source(spark, sf_dir).withWatermark("ts", "2 hours")
    hourly = ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.sum("value").alias("hourly_value")
    )
    daily = hourly.groupBy(F.window(F.col("w"), "1 day").alias("d"), "event_type").agg(
        F.round(F.sum("hourly_value"), 5).alias("daily_value"),
        F.count(F.lit(1)).alias("n_hours"),
    )
    out = daily.select(
        F.col("d.start").alias("day"), "event_type", "daily_value", "n_hours"
    )
    return run_to_memory(
        out, _sink_name("streaming_chained"), output_mode="append"
    )


@register(
    "streaming_cusum_monitor",
    oracle="""
        WITH b AS (
            SELECT date_trunc('day', MIN(ts)) + INTERVAL 10 DAY AS cutoff
            FROM events
        ),
        q AS (
            SELECT event_type, event_id, ts,
                   CAST(ROUND(value * 100000, 0) AS BIGINT) AS xi
            FROM events
        ),
        base AS (
            SELECT q.event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(q.xi) AS BIGINT) AS s1,
                   CAST(SUM(q.xi * q.xi) AS BIGINT) AS s2
            FROM q, b WHERE q.ts < b.cutoff
            GROUP BY 1
        ),
        mon AS (
            SELECT q.event_type, q.event_id, q.ts,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.event_type ORDER BY q.ts, q.event_id
                   ) AS t,
                   SUM(q.xi) OVER (
                       PARTITION BY q.event_type ORDER BY q.ts, q.event_id
                   ) AS c
            FROM q, b WHERE q.ts >= b.cutoff
        )
        SELECT m.event_type, m.event_id, m.ts,
               ROUND(CAST(m.c - m.t * CAST(FLOOR(s.s1 / s.n) AS BIGINT)
                          AS DOUBLE) / 100000, 5) AS cusum,
               (ABS(CAST(m.c - m.t * CAST(FLOOR(s.s1 / s.n) AS BIGINT)
                         AS DOUBLE)) >
                4.0 * sqrt((CAST(s.n AS DOUBLE) * CAST(s.s2 AS DOUBLE)
                            - CAST(s.s1 AS DOUBLE) * CAST(s.s1 AS DOUBLE))
                           / (CAST(s.n AS DOUBLE)
                              * (CAST(s.n AS DOUBLE) - 1.0)))) AS is_alert
        FROM mon m JOIN base s USING (event_type)
        WHERE s.n > 1
    """,
    doc=(
        "STREAMING CUSUM MONITOR (applyInPandasWithState): the online twin "
        "of cusum_level_shift — the first 10 days of the replay calibrate "
        "a per-event-type baseline (exact integer count/sum/sum-of-squares "
        "of the 1e-5-quantized value), then every monitored event emits "
        "its cumulative deviation from the floored baseline mean and an "
        "alert flag at 4 baseline sigmas. This is the production drift "
        "monitor shape: a FIXED reference mean (CUSUM's mu_0), per-key "
        "state of five bigints across micro-batches, alerts in event "
        "order. Exact integer arithmetic end to end (same design as the "
        "batch operator) makes a custom stateful streaming op fully "
        "hash-checkable against a relational oracle — the bounded "
        "time-ordered replay guarantees baseline-before-monitor "
        "delivery, and within a batch rows are globally sorted per key "
        "before applying. The calibration cutoff is a one-row batch "
        "pre-scan (min ts + 10 days), mirrored by the oracle's subquery. "
        "At scale: state is O(#keys); the quantization unit bounds "
        "sum-of-squares within int64 (see streaming/stateful.py)."
    ),
    tags=("streaming", "stateful", "pandas-udf", "quality"),
)
def streaming_cusum_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datetime import timedelta

    from weather_stream_processor_spark.sources import load_table
    from weather_stream_processor_spark.streaming.stateful import (
        cusum_alert_stream,
    )

    min_day = (
        load_table(spark, sf_dir, "events")
        .agg(F.date_trunc("day", F.min("ts")).alias("d0"))
        .collect()[0]["d0"]
    )
    cutoff = min_day + timedelta(days=10)
    ev = events_replay_source(spark, sf_dir)
    out = run_to_memory(
        cusum_alert_stream(ev, cutoff),
        _sink_name("streaming_cusum_monitor"),
        output_mode="append",
    )
    return out.select("event_type", "event_id", "ts", "cusum", "is_alert")


@register(
    "streaming_windowed_topk_users",
    oracle="""
        WITH counts AS (
            SELECT date_trunc('hour', ts) AS hour, user_id,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   ROUND(SUM(value), 5) AS total_value
            FROM events
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT hour, user_id, n_events, total_value,
                   ROW_NUMBER() OVER (
                       PARTITION BY hour
                       ORDER BY n_events DESC, user_id ASC
                   ) AS rnk
            FROM counts
        )
        SELECT hour, user_id, n_events, total_value, CAST(rnk AS BIGINT) AS rnk
        FROM ranked WHERE rnk <= 3
    """,
    doc=(
        "STREAMING HEAVY HITTERS: top-3 most active users per hourly "
        "window — the live 'who is hammering the API' leaderboard. The "
        "streaming engine incrementally maintains the (window, user) "
        "count/sum state (watermarked tumbling window, complete mode "
        "through the real StateStore); the RANKING is a serving-side "
        "view over the drained sink, because per-window top-k is not an "
        "incremental stateful operator — this split (stream maintains "
        "the aggregate, the serving layer ranks it) is the standard "
        "production topology, same as every metrics dashboard. Ties "
        "break on user_id so both engines agree. State cardinality is "
        "|hours x active users per hour|, bounded by the watermark "
        "horizon; the serving rank partitions by hour (bounded rows per "
        "partition = users active that hour)."
    ),
    tags=("streaming", "topk", "window"),
)
def streaming_windowed_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = events_replay_source(spark, sf_dir).withWatermark("ts", "2 hours")
    counts = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 5).alias("total_value"),
        )
        .select(F.col("w.start").alias("hour"), "user_id", "n_events", "total_value")
    )
    drained = run_to_memory(counts, _sink_name("streaming_topk_users"))
    rnk = F.row_number().over(
        Window.partitionBy("hour").orderBy(F.desc("n_events"), F.asc("user_id"))
    )
    return (
        drained.withColumn("rnk", rnk.cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("hour", "user_id", "n_events", "total_value", "rnk")
    )


@register(
    "streaming_stream_stream_semi_join",
    oracle="""
        WITH v AS (
            SELECT user_id, event_id AS view_id, ts AS v_ts
            FROM events WHERE event_type = 'view'
        ),
        p AS (
            SELECT user_id, ts AS p_ts
            FROM events WHERE event_type = 'purchase'
        )
        SELECT v.user_id, v.view_id
        FROM v
        WHERE EXISTS (
            SELECT 1 FROM p
            WHERE p.user_id = v.user_id
              AND p.p_ts >= v.v_ts
              AND p.p_ts <= v.v_ts + INTERVAL 1 HOUR)
    """,
    doc=(
        "STREAM-STREAM LEFT SEMI interval join (Spark 3.4+): emit each "
        "view ONCE as soon as any purchase lands inside its 1-hour "
        "horizon — the 'converted view' feed, deduplicated by "
        "construction (semi join state marks a left row matched instead "
        "of fanning out per match, so a view with five purchases emits "
        "one row, where the inner join emits five). Completes the "
        "stream-stream matrix next to inner/left-outer/full-outer. "
        "State and watermark bounds are identical to the inner join; "
        "the oracle is the EXISTS form — matched rows are emitted on "
        "match, so no final-watermark closure term is needed (unlike "
        "the outer variants, whose null rows emit only at eviction)."
    ),
    tags=("streaming", "join", "interval", "semi"),
)
def streaming_stream_stream_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    views = (
        events_replay_source(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
    )
    purchases = (
        events_replay_source(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = views.join(
        purchases,
        (F.col("v_user_id") == F.col("p_user_id"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_semi",
    ).select(F.col("v_user_id").alias("user_id"), "view_id")
    return run_to_memory(
        joined, _sink_name("streaming_ss_semi_join"), output_mode="append"
    )


@register(
    "streaming_blocklist_decontam",
    oracle="""
        WITH blocked AS (
            SELECT user_id
            FROM events
            WHERE event_type = 'error'
            GROUP BY user_id
            HAVING COUNT(*) >= 5
        )
        SELECT date_trunc('hour', e.ts) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n_clean,
               ROUND(SUM(e.value), 5) AS clean_value
        FROM events e
        WHERE e.event_type = 'purchase'
          AND NOT EXISTS (SELECT 1 FROM blocked b WHERE b.user_id = e.user_id)
        GROUP BY 1
    """,
    doc=(
        "STREAMING BLOCKLIST DECONTAMINATION: a stream-STATIC LEFT ANTI "
        "join — live purchases minus a batch-derived denylist (users "
        "with >= 5 errors: the bot/abuse screen), rolled into hourly "
        "clean totals through the real streaming engine. This is the "
        "streaming twin of the batch decontamination operator and the "
        "shape of every 'filter the firehose against yesterday's "
        "blocklist' pipeline: the static side is computed ONCE per "
        "restart with batch semantics, broadcast into every micro-batch "
        "(|blocklist| rows, never a stream shuffle), and the watermarked "
        "window agg downstream is unchanged. Unlike stream-stream anti "
        "(unsupported: negatives against a moving right side cannot be "
        "proven until eviction), stream-static anti is exact per batch."
    ),
    tags=("streaming", "join", "anti", "llm"),
)
def streaming_blocklist_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_stream_processor_spark.sources import load_table

    blocked = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_err"))
        .filter(F.col("n_err") >= 5)
        .select("user_id")
    )
    ev = events_replay_source(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    clean = ev.join(F.broadcast(blocked), "user_id", "left_anti")
    agg = (
        clean.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clean"),
            F.round(F.sum("value"), 5).alias("clean_value"),
        )
        .select(F.col("w.start").alias("hour"), "n_clean", "clean_value")
    )
    return run_to_memory(agg, _sink_name("streaming_blocklist"))


@register(
    "streaming_abandoned_views_anti",
    # Same availableNow closure model as the left-outer variant: an
    # unmatched view emits only once the final global watermark
    # W = least(max view ts, max purchase ts) - 2h strictly passes its
    # join horizon; views still in state at end-of-replay never emit.
    oracle="""
        WITH v AS (
            SELECT user_id, event_id AS view_id, ts AS v_ts
            FROM events WHERE event_type = 'view'
        ),
        p AS (
            SELECT user_id, ts AS p_ts
            FROM events WHERE event_type = 'purchase'
        ),
        wm AS (
            SELECT LEAST((SELECT MAX(v_ts) FROM v),
                         (SELECT MAX(p_ts) FROM p)) - INTERVAL 2 HOUR AS w
        )
        SELECT v.user_id, v.view_id
        FROM v, wm
        WHERE NOT EXISTS (
                SELECT 1 FROM p
                WHERE p.user_id = v.user_id
                  AND p.p_ts >= v.v_ts
                  AND p.p_ts <= v.v_ts + INTERVAL 1 HOUR)
          AND v.v_ts + INTERVAL 1 HOUR < wm.w
    """,
    doc=(
        "STREAM-STREAM ANTI join (the abandonment feed): views with NO "
        "purchase inside their 1-hour horizon, emitted exactly once at "
        "state eviction — the negative-space complement of the semi "
        "join's converted-view feed, and the remaining cell of the "
        "stream-stream matrix (inner/left/full/semi/anti). Spark has no "
        "native stream-stream left_anti, and the composition that "
        "expresses it is LEFT OUTER + post-join IS NULL filter: the "
        "outer join's null-padded eviction rows ARE the anti rows, and "
        "the stateless filter drops matched rows at zero extra state — "
        "same watermark bounds, same shuffle, same state store as the "
        "outer join. The oracle is the NOT EXISTS form gated by the "
        "final-watermark closure term (an unmatched view still inside "
        "the watermark at end-of-replay is NOT emitted, exactly like "
        "the outer variants' null rows)."
    ),
    tags=("streaming", "join", "interval", "anti"),
)
def streaming_abandoned_views_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    views = (
        events_replay_source(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
    )
    purchases = (
        events_replay_source(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    joined = (
        views.join(
            purchases,
            (F.col("v_user_id") == F.col("p_user_id"))
            & (F.col("p_ts") >= F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
            "left_outer",
        )
        .filter(F.col("p_user_id").isNull())
        .select(F.col("v_user_id").alias("user_id"), "view_id")
    )
    return run_to_memory(
        joined, _sink_name("streaming_ss_anti_join"), output_mode="append"
    )


@register(
    "streaming_error_then_purchase",
    oracle="""
        WITH err AS (
            SELECT user_id, event_id, ts FROM events
            WHERE event_type = 'error'
        ),
        pur AS (
            SELECT user_id, event_id, ts FROM events
            WHERE event_type = 'purchase'
        ),
        m AS (
            SELECT e.user_id, e.event_id AS error_id, e.ts AS error_ts,
                   p.event_id AS purchase_id, p.ts AS purchase_ts,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.event_id ORDER BY p.ts, p.event_id
                   ) AS rn
            FROM err e JOIN pur p
              ON p.user_id = e.user_id
             AND p.ts > e.ts
             AND p.ts <= e.ts + INTERVAL 3600 SECOND
        )
        SELECT user_id, error_id, error_ts, purchase_id, purchase_ts,
               CAST(FLOOR((epoch_us(purchase_ts) - epoch_us(error_ts))
                          / 1000000.0) AS BIGINT) AS lag_sec
        FROM m WHERE rn = 1
    """,
    doc=(
        "STREAMING SEQUENCE-PATTERN DETECTION (MATCH_RECOGNIZE-class, "
        "via applyInPandasWithState): per user, every 'error' event is "
        "matched to its FIRST 'purchase' strictly after it within 3600 s "
        "— the error-then-converted-anyway funnel a reliability team "
        "alerts on. Spark has no MATCH_RECOGNIZE; the stateful seam "
        "carries each user's PENDING-ERROR list across micro-batches, "
        "a purchase closes (and consumes) every pending error inside "
        "its window, and anything older than purchase_ts - window is "
        "pruned because no later purchase can ever reach it — so state "
        "is bounded by one window's error rate per key, NOT by history "
        "(the eviction argument is in streaming/stateful.py, next to "
        "the per-batch (ts, event_id) sort that makes the replay "
        "deterministic). The relational oracle states the same "
        "semantics declaratively — errors x purchases range join, "
        "first-match by ROW_NUMBER — proving the incremental stateful "
        "program equals the batch definition end to end; the strict "
        "p.ts > e.ts bound makes same-timestamp pairs unmatchable in "
        "both formulations, so in-batch processing order cannot leak "
        "into the result."
    ),
    tags=("streaming", "stateful", "pandas-udf", "pattern"),
)
def streaming_error_then_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_stream_processor_spark.streaming.stateful import (
        error_purchase_pattern_stream,
    )

    ev = events_replay_source(spark, sf_dir)
    out = run_to_memory(
        error_purchase_pattern_stream(ev),
        _sink_name("streaming_error_purchase"),
        output_mode="append",
    )
    return out.select(
        "user_id", "error_id", "error_ts", "purchase_id", "purchase_ts",
        "lag_sec",
    )


@register(
    "streaming_scd2_dimension",
    oracle="""
        WITH ordered AS (
            SELECT user_id, event_type, ts, event_id,
                   LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_type
            FROM events
        ),
        changes AS (
            SELECT user_id, event_type, ts, event_id
            FROM ordered
            WHERE prev_type IS NULL OR event_type <> prev_type
        ),
        dim AS (
            SELECT user_id,
                   event_type AS attr_value,
                   ts AS valid_from,
                   LEAD(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS valid_to,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS BIGINT) AS version
            FROM changes
        )
        SELECT user_id, attr_value, valid_from, valid_to, version
        FROM dim WHERE valid_to IS NOT NULL
    """,
    doc=(
        "STREAMING SCD2 DIMENSION MAINTENANCE: the Kimball Type-2 build "
        "(scd2_dimension_build) executed INCREMENTALLY with "
        "applyInPandasWithState — per user, the open version (attribute, "
        "valid_from, version counter) lives in the state store and a "
        "history row is EMITTED the moment the observed attribute "
        "changes (append mode); the open current version is state, not "
        "output, so the streaming result is exactly the batch build's "
        "CLOSED rows — which is what the hash-checked oracle pins, "
        "through the real incremental engine (StateStore save/restore, "
        "availableNow replay). This is how a warehouse keeps an SCD2 "
        "dimension fresh without nightly rebuilds: the emitted rows ARE "
        "the MERGE feed. State per key: one string + two bigints — "
        "O(#users), independent of throughput; timestamps carried as "
        "epoch micros so they round-trip the store exactly."
    ),
    tags=("streaming", "stateful", "pandas-udf", "scd", "warehouse"),
)
def streaming_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_stream_processor_spark.streaming.stateful import (
        scd2_closed_versions,
    )

    ev = events_replay_source(spark, sf_dir)
    out = run_to_memory(
        scd2_closed_versions(ev),
        _sink_name("streaming_scd2_dimension"),
        output_mode="append",
    )
    return out.select("user_id", "attr_value", "valid_from", "valid_to", "version")


@register(
    "streaming_sprt_monitor",
    oracle="""
        WITH q AS (
            SELECT event_type, event_id, ts,
                   CASE WHEN value >= {CUT} THEN 1 ELSE 0 END AS succ
            FROM events
        ),
        run AS (
            -- integer cumulatives only; the LLR is the closed form
            -- s*LA + (t - s)*LB. A float window SUM would accumulate in
            -- whatever order the engine's segment tree chooses, which
            -- diverges from the sequential walk in the last ulp and
            -- flipped one 6-dp rounding at sf0.1.
            SELECT event_type, event_id, ts,
                   CAST(SUM(succ) OVER w AS BIGINT) * {LA}
                   + (ROW_NUMBER() OVER w
                      - CAST(SUM(succ) OVER w AS BIGINT)) * {LB} AS llr,
                   ROW_NUMBER() OVER w AS rn
            FROM q
            WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
        ),
        firstx AS (
            SELECT event_type,
                   MIN(CASE WHEN llr >= {UP} THEN rn END) AS up_rn,
                   MIN(CASE WHEN llr <= {LOW} THEN rn END) AS dn_rn
            FROM run GROUP BY event_type
        )
        SELECT r.event_type, r.event_id, r.ts,
               ROUND(r.llr, 6) AS llr,
               CASE WHEN f.up_rn IS NOT NULL AND f.up_rn <= r.rn
                         AND (f.dn_rn IS NULL OR f.up_rn <= f.dn_rn)
                        THEN 'accept_h1'
                    WHEN f.dn_rn IS NOT NULL AND f.dn_rn <= r.rn
                        THEN 'accept_h0'
                    ELSE 'continue'
               END AS decision
        FROM run r JOIN firstx f USING (event_type)
    """.replace("{CUT}", "50.0")
    .replace("{LA}", "0.10536051565782635")
    .replace("{LB}", "-0.0953101798043249")
    .replace("{UP}", "2.9444389791664403")
    .replace("{LOW}", "-2.9444389791664403"),
    doc=(
        "STREAMING WALD SPRT MONITOR (applyInPandasWithState): the "
        "online form of the sequential probability ratio test — per "
        "event type, every event nudges a cumulative log-likelihood "
        "walk for H1 'share of high-value events is 0.50' vs H0 '0.45' "
        "(value >= 50.0, increments and ln(19) boundaries are module "
        "literals mirrored verbatim into the oracle; the LLR at each "
        "row is the CLOSED FORM s*LA + (t-s)*LB over integer "
        "cumulative counts — a float window SUM accumulates in tree "
        "order and flipped one 6-dp rounding at sf0.1), and the decision "
        "LATCHES at the first boundary crossing while the LLR column "
        "keeps evolving — which is what makes the whole output "
        "hash-checkable against the batch oracle at every row, decided "
        "rows included. Sequential tests are native to streams (this "
        "is the operator sprt_conversion_monitor's day-grid batch form "
        "approximates offline); state is (successes, trials, decided) "
        "— three integer scalars per key, O(#keys), NO float state — "
        "so the emitted value is order-free and bit-identical across "
        "engines and micro-batch boundaries. The replay source is "
        "time-ordered and rows are sorted per key within each batch "
        "(the streaming_cusum_monitor delivery contract)."
    ),
    tags=("streaming", "stateful", "pandas-udf", "statistics"),
)
def streaming_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_stream_processor_spark.streaming.stateful import (
        sprt_decision_stream,
    )

    ev = events_replay_source(spark, sf_dir)
    out = run_to_memory(
        sprt_decision_stream(ev),
        _sink_name("streaming_sprt_monitor"),
        output_mode="append",
    )
    return out.select("event_type", "event_id", "ts", "llr", "decision")


@register(
    "streaming_funnel_discovery",
    oracle="""
        WITH f AS (
            SELECT user_id, substr(event_type, 1, 1) AS letter,
                   ts, event_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, substr(event_type, 1, 1)
                       ORDER BY ts, event_id) AS rn
            FROM events
            WHERE event_type IN ('signup', 'view', 'click', 'purchase')
        ),
        firsts AS (SELECT * FROM f WHERE rn = 1)
        SELECT user_id, event_id, ts,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS step,
               string_agg(letter, '') OVER (
                   w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS seq_so_far
        FROM firsts
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc=(
        "STREAMING FUNNEL DISCOVERY (applyInPandasWithState): the "
        "ONLINE form of funnel_conformance_sequences — per user, the "
        "stream emits a row at exactly the moment a NEW funnel stage "
        "(signup/view/click/purchase; error filtered as process noise "
        "BEFORE the stateful operator) first appears, carrying the "
        "triggering event's id/ts, the step number, and the "
        "first-occurrence prefix so far. This is the live 'user just "
        "reached stage k by path X' signal activation systems key on, "
        "where the batch twin only reports yesterday's journeys. State "
        "is ONE <=4-ASCII-letter string per user — bounded, no floats, "
        "its value a pure function of the event SET seen, so emissions "
        "are identical across any micro-batch boundaries and every "
        "output row hash-checks against the batch oracle's windowed "
        "reconstruction (first event per (user, letter) by (ts, "
        "event_id), prefix string_agg over the per-user <=4-row "
        "window). The replay source is time-ordered and rows sort per "
        "key within each batch (the streaming_cusum_monitor delivery "
        "contract). At 100 TB the per-(user, letter) first-occurrence "
        "dedup is the only corpus-scale state."
    ),
    tags=("streaming", "stateful", "pandas-udf", "funnel"),
)
def streaming_funnel_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_stream_processor_spark.streaming.stateful import (
        funnel_discovery_stream,
    )

    ev = events_replay_source(spark, sf_dir)
    out = run_to_memory(
        funnel_discovery_stream(ev),
        _sink_name("streaming_funnel_discovery"),
        output_mode="append",
    )
    return out.select("user_id", "event_id", "ts", "step", "seq_so_far")


@register(
    "streaming_anytime_cs_monitor",
    oracle="""
        WITH q AS (
            SELECT event_type, event_id, ts,
                   CASE WHEN value >= {CUT} THEN 1 ELSE 0 END AS succ
            FROM events
        ),
        run AS (
            -- integer cumulatives only (the SPRT-monitor discipline):
            -- p_hat and the stitched radius are closed forms of the
            -- exact counts, never float accumulators
            SELECT event_type, event_id, ts,
                   CAST(ROW_NUMBER() OVER w AS BIGINT) AS trials,
                   CAST(SUM(succ) OVER w AS BIGINT) AS successes
            FROM q
            WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
        ),
        band AS (
            SELECT event_type, event_id, ts, trials, successes,
                   CAST(successes AS DOUBLE) / trials AS p_hat,
                   1.7 * sqrt((ln(ln(2.0 * trials)) + {C}) / trials)
                       AS radius
            FROM run
        )
        SELECT event_type, event_id, ts, trials, successes,
               -- floor-lift instead of ROUND: p_hat is a ratio of small
               -- integers and lands EXACTLY on the 6-dp half grid (e.g.
               -- 49/128); the handler rounds half-away via
               -- floor(x*1e6 + 0.5)/1e6, so the oracle uses the literal
               -- same form — floor has no half-grid (margin audit)
               FLOOR(p_hat * 1000000.0 + 0.5) / 1000000.0 AS p_hat,
               FLOOR(radius * 1000000.0 + 0.5) / 1000000.0 AS radius,
               FLOOR(GREATEST(0.0, p_hat - radius) * 1000000.0 + 0.5)
                   / 1000000.0 AS ci_lo,
               FLOOR(LEAST(1.0, p_hat + radius) * 1000000.0 + 0.5)
                   / 1000000.0 AS ci_hi,
               (GREATEST(0.0, p_hat - radius) <= {P0}
                AND {P0} <= LEAST(1.0, p_hat + radius)) AS h0_in_band
        FROM band
    """.replace("{CUT}", "50.0")
    .replace("{C}", "3.8430274173849486")
    .replace("{P0}", "0.45"),
    doc=(
        "STREAMING ANYTIME CONFIDENCE SEQUENCE (applyInPandasWithState): "
        "the INTERVAL form of sequential inference, deliberately paired "
        "with streaming_sprt_monitor's DECISION form on the same "
        "quantity (share of value >= 50.0 events per type, p0 = 0.45): "
        "SPRT tells you when to stop, the CS tells you what you can "
        "claim at every moment in between — the band is simultaneously "
        "valid over ALL prefixes (Howard et al. 2021 stitched "
        "sub-Gaussian boundary, the same 1.7/0.72-literal constants as "
        "the batch twin anytime_confidence_sequence), so h0_in_band "
        "flipping false IS a valid-at-first-look rejection. State is "
        "(successes, trials) — two integer scalars per key, O(#keys), "
        "NO float state; every emitted double is a closed form of the "
        "exact integer cumulatives (one division, ln-ln, sqrt on "
        "identical doubles), so each output row hash-checks against "
        "the batch oracle's windowed reconstruction regardless of "
        "micro-batch boundaries. The replay source is time-ordered and "
        "rows sort per key within each batch (the "
        "streaming_cusum_monitor delivery contract)."
    ),
    tags=("streaming", "stateful", "pandas-udf", "statistics"),
)
def streaming_anytime_cs_monitor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from weather_stream_processor_spark.streaming.stateful import (
        cs_band_stream,
    )

    ev = events_replay_source(spark, sf_dir)
    out = run_to_memory(
        cs_band_stream(ev),
        _sink_name("streaming_anytime_cs_monitor"),
        output_mode="append",
    )
    return out.select(
        "event_type",
        "event_id",
        "ts",
        "trials",
        "successes",
        "p_hat",
        "radius",
        "ci_lo",
        "ci_hi",
        "h0_in_band",
    )
