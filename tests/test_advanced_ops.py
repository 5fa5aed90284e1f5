"""Semantic unit tests on tiny literal DataFrames for the advanced
operators: as-of join tie handling, connected-component transitivity,
sampling split disjointness, and gap-fill completeness. These pin the
boundary semantics the sf-fixture oracle comparison can't isolate."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(day: int, hour: int, minute: int = 0):
    return dt.datetime(2024, 1, day, hour, minute)


def test_asof_join_tie_is_inclusive(spark, monkeypatch):
    """A view at exactly the purchase timestamp must be picked up (<=)."""
    from weather_stream_processor_spark.operators import joins

    rows = [
        # user 1: view strictly before, view at tie, purchase
        (1, _ts(1, 9), 1, "view", 1.0),
        (2, _ts(1, 10), 1, "view", 1.0),
        (3, _ts(1, 10), 1, "purchase", 5.0),
        # user 2: purchase with NO prior view -> null
        (4, _ts(1, 8), 2, "purchase", 2.0),
        # user 2: later view is AFTER the purchase, must not leak backwards
        (5, _ts(1, 9), 2, "view", 1.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    monkeypatch.setattr(joins, "load_table", lambda *_: ev)
    out = {
        r.event_id: r.last_view_ts
        for r in joins.asof_join_last_view(spark, "ignored").collect()
    }
    assert out[3] == _ts(1, 10)  # tie included
    assert out[4] is None  # no prior view
    assert set(out) == {3, 4}


def test_connected_components_transitivity(spark, monkeypatch):
    """A~B and B~C (but A!~C directly) must land in ONE component with
    min-id representative, via >1 propagation round (a chain, not a star)."""
    from weather_stream_processor_spark.operators import dedup

    words = [f"w{i}" for i in range(48)]
    # sliding 42-word windows, stride 3: J(A,B)=J(B,C)~0.86 >= 0.8 but
    # J(A,C)~0.74 < 0.8 — a genuine chain, only closed transitively
    docs = spark.createDataFrame(
        [
            (10, " ".join(words[0:42])),
            (11, " ".join(words[3:45])),
            (12, " ".join(words[6:48])),
            (50, "zz yy xx ww vv uu tt ss rr"),  # isolated -> excluded
        ],
        "doc_id long, text string",
    )
    monkeypatch.setattr(dedup, "load_table", lambda *_: docs)
    out = dedup.dedup_connected_components(spark, "ignored").collect()
    comp = {r.doc_id: r.component_id for r in out}
    sizes = {r.doc_id: r.n_members for r in out}
    assert set(comp) == {10, 11, 12}
    assert comp[10] == comp[11] == comp[12] == 10
    assert sizes[10] == 3


def test_hash_sampling_splits_are_disjoint_and_deterministic(spark):
    from weather_stream_processor_spark.operators.sampling import (
        deterministic_hash_sample,
    )
    from tests.conftest import SF_SMOKE

    a = {r.doc_id for r in deterministic_hash_sample(spark, SF_SMOKE).collect()}
    b = {r.doc_id for r in deterministic_hash_sample(spark, SF_SMOKE).collect()}
    assert a == b  # replayable
    from weather_stream_processor_spark.sources import load_table

    all_ids = {r.doc_id for r in load_table(spark, SF_SMOKE, "documents").collect()}
    assert a < all_ids  # proper subset: sample + complement partition the corpus


def test_gap_fill_spine_is_dense(spark):
    from weather_stream_processor_spark.operators.timeseries import time_spine_gap_fill
    from tests.conftest import SF_SMOKE

    rows = time_spine_gap_fill(spark, SF_SMOKE).collect()
    hours = sorted(r.hour for r in rows)
    # dense hourly spine: every consecutive pair is exactly 1h apart
    deltas = {int((b - a).total_seconds()) for a, b in zip(hours, hours[1:])}
    assert deltas == {3600}
    # and gap hours exist with zeroed aggregates (sf0.001 is sparse)
    assert any(r.n_events == 0 and r.total_value == 0.0 for r in rows)


def test_stratified_mixture_respects_rates(spark):
    from weather_stream_processor_spark.operators.sampling import (
        stratified_sample_mixture,
    )
    from tests.conftest import SF_SMOKE

    kept = stratified_sample_mixture(spark, SF_SMOKE).groupBy("lang").count().collect()
    by_lang = {r.lang: r["count"] for r in kept}
    # en is downsampled to ~10%, others to ~50% — with 1000 buckets the
    # realized rate can wobble; assert ordering + hard caps instead
    assert by_lang["en"] < 218 * 0.25
    for lang in ("zh", "es", "de", "fr"):
        assert by_lang[lang] > 0


def test_approx_percentile_within_rank_error(spark):
    """Sketch estimates must land between exact quantiles at p±eps."""
    from weather_stream_processor_spark.registry import all_queries
    from weather_stream_processor_spark.sources import load_table
    from tests.conftest import SF_SMOKE
    import pyspark.sql.functions as F

    approx = {
        r.l_returnflag: (r.approx_median, r.approx_p95)
        for r in all_queries()["approx_percentile_prices"].builder(spark, SF_SMOKE).collect()
    }
    eps = 0.01  # accuracy=10000 -> rank error 1e-4; test with wide margin
    exact = load_table(spark, SF_SMOKE, "lineitem").groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5 - eps)).alias("lo50"),
        F.percentile("l_extendedprice", F.lit(0.5 + eps)).alias("hi50"),
        F.percentile("l_extendedprice", F.lit(0.95 - eps)).alias("lo95"),
        F.percentile("l_extendedprice", F.lit(0.95 + eps)).alias("hi95"),
    ).collect()
    for r in exact:
        med, p95 = approx[r.l_returnflag]
        assert r.lo50 <= med <= r.hi50
        assert r.lo95 <= p95 <= r.hi95


def test_connected_components_with_reliable_checkpoint(spark, tmp_path):
    """With sc.setCheckpointDir configured (the cluster deployment), the
    iterative loop must switch from localCheckpoint to reliable
    checkpoint() and produce the identical clustering."""
    from tests.conftest import SF_SMOKE
    from weather_stream_processor_spark.operators import dedup

    baseline = {
        (r.doc_id, r.component_id, r.n_members)
        for r in dedup.dedup_connected_components(spark, SF_SMOKE).collect()
    }
    assert spark.sparkContext.getCheckpointDir() is None
    # setCheckpointDir mutates the session-scoped SparkContext and the JVM
    # API has no unset — restore via the underlying Scala Option so later
    # tests in the same session keep localCheckpoint behavior.
    try:
        spark.sparkContext.setCheckpointDir(str(tmp_path / "reliable_ckpt"))
        assert spark.sparkContext.getCheckpointDir() is not None
        reliable = {
            (r.doc_id, r.component_id, r.n_members)
            for r in dedup.dedup_connected_components(spark, SF_SMOKE).collect()
        }
        assert reliable == baseline
    finally:
        jsc = spark.sparkContext._jsc.sc()
        getattr(jsc, "checkpointDir_$eq")(spark._jvm.scala.Option.empty())
        assert spark.sparkContext.getCheckpointDir() is None


def test_two_phase_cc_bounds_rounds_on_adversarial_path_graph(spark):
    """Large-star/small-star alternation (Kiveris et al.) is the
    adversarial-diameter path for connected components: on a 1000-node
    path graph — the worst case for min-label propagation, whose round
    count equals the graph diameter — it must converge to one component
    in O(log n) rounds."""
    from weather_stream_processor_spark.operators.dedup import _cc_two_phase

    n = 1000
    chain = spark.range(n - 1).selectExpr("id AS s", "id + 1 AS d")
    sym = chain.union(chain.selectExpr("d AS s", "s AS d"))
    labels, rounds = _cc_two_phase(sym)
    got = {(r.doc_id, r.comp) for r in labels.collect()}
    assert got == {(i, 0) for i in range(n)}
    assert rounds <= 25, f"expected O(log n) rounds, took {rounds}"


def test_two_phase_cc_matches_propagation_on_fixture_pairs(spark):
    """Both algorithms must produce the identical clustering on the real
    near-dup pair graph (the oracle-checked surface)."""
    from tests.conftest import SF_SMOKE
    from weather_stream_processor_spark.operators import dedup

    base = {
        (r.doc_id, r.component_id, r.n_members)
        for r in dedup.dedup_connected_components(spark, SF_SMOKE).collect()
    }
    alt = {
        (r.doc_id, r.component_id, r.n_members)
        for r in dedup.dedup_connected_components(
            spark, SF_SMOKE, algorithm="two_phase"
        ).collect()
    }
    assert alt == base


def test_ohlc_bars_bounds_and_determinism(spark):
    """OHLC invariants: low <= open/close/mean <= high, n >= 1; and the
    open/close tie-break makes the result identical across reruns with
    different partitioning."""
    from tests.conftest import SF_SMOKE
    from weather_stream_processor_spark.operators import timeseries as t

    rows = t.ohlc_bars_15min(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.low <= r.mean_value <= r.high + 1e-9
        assert r.n_events >= 1
    again = {
        (r.event_type, r.bar_start): (r.open, r.close)
        for r in t.ohlc_bars_15min(spark, SF_SMOKE).collect()
    }
    assert {(r.event_type, r.bar_start): (r.open, r.close) for r in rows} == again


def test_interval_merge_coverage_invariants(spark):
    """Merged-interval algebra: every island is >= one interval long
    (300 s), coverage is bounded by [300 * n_intervals <= sum of raw
    interval lengths] and max <= coverage; islands never overlap so
    coverage <= span of the user's activity + 300."""
    from tests.conftest import SF_SMOKE
    from weather_stream_processor_spark.operators import timeseries as t
    from pyspark.sql import functions as F
    from weather_stream_processor_spark.sources import load_table

    res = {r.user_id: r for r in t.interval_merge_coverage(spark, SF_SMOKE).collect()}
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("unix_micros(max(ts)) div 1000000 - unix_micros(min(ts)) div 1000000").alias("span"),
        )
        .collect()
    )
    stats = {r.user_id: r for r in ev}
    assert set(res) == set(stats)
    for uid, r in res.items():
        assert 1 <= r.n_intervals <= stats[uid].n_events
        assert r.max_interval_sec >= 300
        assert r.max_interval_sec <= r.coverage_sec
        assert 300 * r.n_intervals <= r.coverage_sec <= 300 * stats[uid].n_events
        assert r.coverage_sec <= stats[uid].span + 300


def test_daily_user_accession_cumulative_closure(spark):
    """cum_users on the last day equals the total distinct-user count,
    n_new sums to the same, and n_active <= cum_users on every day."""
    from tests.conftest import SF_SMOKE
    from weather_stream_processor_spark.operators import analytics as a
    from weather_stream_processor_spark.sources import load_table
    from pyspark.sql import functions as F

    rows = sorted(a.daily_user_accession(spark, SF_SMOKE).collect(), key=lambda r: r.day)
    total = (
        load_table(spark, SF_SMOKE, "events")
        .select(F.countDistinct("user_id"))
        .first()[0]
    )
    assert rows[-1].cum_users == total == sum(r.n_new for r in rows)
    for r in rows:
        assert r.n_active <= r.cum_users
