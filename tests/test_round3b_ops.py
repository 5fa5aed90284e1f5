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
