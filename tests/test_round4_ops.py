"""Round-4 regression tests: the r3 advice fixes that need constructed
inputs the standard fixtures can't produce (constant embedding dimension,
non-0.8 Jaccard thresholds), plus cache-scope hygiene."""

from __future__ import annotations

import math
import os
import tempfile

from tests.conftest import SF_SMOKE


def _run(spark, name, sf=SF_SMOKE):
    from weather_stream_processor_spark.registry import all_queries

    return all_queries()[name].builder(spark, sf)


def test_int8_quant_guards_constant_dimension(spark):
    """A constant dimension (hi == lo) must contribute code 0 / error 0,
    not divide by a zero scale and poison every vector's mse with NaN
    (r3 advice, similarity.py)."""
    sf_dir = tempfile.mkdtemp(prefix="quant_guard_")
    rows = [
        (0, [1.0, 5.0, -2.0]),
        (1, [1.0, 7.0, 3.0]),
        (2, [1.0, 6.0, 0.5]),
    ]  # dim 1 is constant (1.0) across the corpus
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    out = {r.vec_id: r for r in _run(spark, "embedding_int8_quant_error", sf_dir).collect()}
    assert set(out) == {0, 1, 2}
    for r in out.values():
        assert r.n_dims == 3
        assert not math.isnan(r.mse), "constant dim poisoned mse with NaN"
        # int8 reconstruction error per dim is bounded by half a step:
        # (hi-lo)/255/2; with ranges <= 5.0 here the mse bound is tiny
        assert 0 <= r.mse <= (5.0 / 255 / 2) ** 2 + 1e-12


def test_prefix_filter_integer_arithmetic_follows_threshold(spark):
    """The prefix length and PPJoin overlap bound are derived from the
    exact rational form of JACCARD_THRESHOLD — not hardcoded for 0.8
    (r3 advice, dedup.py). At a lower threshold the exact join must
    still equal the exhaustive-verify oracle, now with MORE pairs."""
    from weather_stream_processor_spark.operators import dedup

    base = {(r.doc_a, r.doc_b) for r in _run(spark, "ngram_jaccard_pairs").collect()}
    strict = {
        (r.doc_a, r.doc_b)
        for r in _run(spark, "prefix_filter_jaccard_join").collect()
    }
    assert strict == base  # t = 0.8 unchanged

    old = dedup.JACCARD_THRESHOLD
    dedup.JACCARD_THRESHOLD = 0.5
    try:
        loose = _run(spark, "prefix_filter_jaccard_join").collect()
        pairs = {(r.doc_a, r.doc_b) for r in loose}
        assert pairs >= base, "lowering t lost pairs that pass the higher t"
        assert all(r.jaccard >= 0.5 for r in loose)
        # exhaustive reference at t=0.5: every verified pair, no prefix
        exhaustive = {
            (r.doc_a, r.doc_b)
            for r in _run(spark, "ngram_jaccard_pairs").collect()
        }
        assert pairs == exhaustive
    finally:
        dedup.JACCARD_THRESHOLD = old


def test_snapshot_diff_ids_cannot_collide(spark):
    """Re-added docs carry negative namespaced ids -(doc_id+1): disjoint
    from every real non-negative doc_id at any corpus size (r3 advice: a
    fixed +1e6 offset collides past a million docs), so added/removed/
    changed counts obey conservation exactly."""
    from pyspark.sql import functions as F

    from weather_stream_processor_spark.sources import load_table

    counts = {r.status: r.n_docs for r in _run(spark, "corpus_snapshot_diff").collect()}
    docs = load_table(spark, SF_SMOKE, "documents")
    n = docs.count()
    n_dropped = docs.filter(F.col("doc_id") % 10 == 0).count()
    n_readded = docs.filter(F.col("doc_id") % 13 == 0).count()
    # every snapshot-A doc is removed/changed/unchanged; every re-added
    # id is new (negative), so 'added' == the re-added count exactly
    assert counts.get("added", 0) == n_readded
    assert counts.get("removed", 0) == n_dropped
    assert (
        counts.get("removed", 0)
        + counts.get("changed", 0)
        + counts.get("unchanged", 0)
        == n
    )


def test_registered_builders_leave_nothing_cached(spark):
    """The two persist sites (prefix_filter_jaccard_join, rfm_segments)
    must release their cache once the result is materialized — a
    long-lived session serving many queries must not accumulate cached
    postings/aggregates (r3 verdict item 5)."""
    # DataFrame-level persists register with the session CacheManager;
    # the result's own localCheckpoint blocks (O(result), released on GC)
    # intentionally do not. Compare against the pre-existing cache count
    # so an unrelated test's leftover cache can't mask or fake a leak.
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    before = cache_mgr.cachedData().size()
    for name in ("prefix_filter_jaccard_join", "rfm_segments"):
        df = _run(spark, name)
        df.count()
        after = cache_mgr.cachedData().size()
        assert after == before, f"{name} left a DataFrame cache behind"


# Rows-only queries deliberately staged in the driver window. The r8
# verdict (task 2) asked for the three r01-era sketch queries — whose
# cumulative driver record still ended on a pre-conversion red hash row —
# to be re-sampled so the record closed on their CURRENT rows-only
# contract (that closed in r09). The r9 verdict (task 1) then asked for
# the ENTIRE never-driver-sampled backlog to drain, which includes the
# registry's remaining rows-only names (sketch internals, LAPACK SVD,
# iterative inductions — each carries property/replay pytest gates
# instead of a DuckDB twin); staging them completes the full-registry
# driver record with their documented rows-only contract. Any OTHER
# rows-only name in the priority is still a bug.
_ROWS_ONLY_STAGED = {
    # r8-verdict re-staging (record closed on no_oracle in r09)
    "approx_count_distinct_parts",
    "approx_percentile_prices",
    "hll_mergeable_rollup",
    # r9-verdict backlog drain (first-time sampling of the rows-only set)
    "theta_sketch_set_algebra",
    "kll_quantile_mergeable_rollup",
    "embedding_whitening_audit",
    "embedding_procrustes_drift",
    "frequent_directions_sketch",
    "bpe_merge_induction",
    "alias_method_sampling_table",
    "compression_ratio_quality",
    "pacf_durbin_levinson",
    "v_optimal_histogram",
    "bradley_terry_strengths",
}


def test_sample_priority_names_resolve(spark):
    """__spark_entry__._SAMPLE_PRIORITY must stay a subset of the registry
    (a renamed operator would silently fall out of the driver's sample
    window) and must keep every entry oracle-backed, except the three
    deliberately re-staged rows-only sketches (_ROWS_ONLY_STAGED)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(entry._SAMPLE_PRIORITY) <= set(qs)
    assert len(set(entry._SAMPLE_PRIORITY)) == len(entry._SAMPLE_PRIORITY)
    for name in entry._SAMPLE_PRIORITY:
        assert name in oracles or name in _ROWS_ONLY_STAGED, (
            f"{name} has no oracle; priority slots are for hash-checked "
            "rows (rows-only re-staging needs an explicit entry in "
            "_ROWS_ONLY_STAGED with a verdict rationale)"
        )
    assert list(qs)[: len(entry._SAMPLE_PRIORITY)] == list(entry._SAMPLE_PRIORITY)


def test_bpe_merges_match_reference_python(spark):
    """bpe_merge_induction must reproduce Sennrich-style BPE exactly:
    replay the induction in pure Python (word-frequency table, weighted
    adjacent-pair counts with overlapping positions, greedy left-to-right
    merge application, count-desc/pair-asc tie-break) and require the
    IDENTICAL merge sequence."""
    import re
    from collections import Counter

    from weather_stream_processor_spark.operators.text import BPE_MERGES
    from weather_stream_processor_spark.sources import load_table

    texts = [
        r.text for r in load_table(spark, SF_SMOKE, "documents").select("text").collect()
    ]
    weights = Counter()
    for t in texts:
        for w in re.split(r"[^a-z]+", t.lower()):
            if len(w) >= 2:
                weights[w] += 1
    vocab = {tuple(w): c for w, c in weights.items()}

    expected = []
    for rank in range(1, BPE_MERGES + 1):
        pair_counts = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += c
        if not pair_counts:
            break
        (left, right), count = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if count < 2:
            break
        expected.append((rank, left, right, left + right, count))
        new_vocab = Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += c
        vocab = dict(new_vocab)

    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_count)
        for r in _run(spark, "bpe_merge_induction").orderBy("rank").collect()
    ]
    assert got == expected


def test_bench_and_quality_tool_names_resolve(spark):
    """bench.py's HEADLINE/SF1_QUERIES and tools/ann_quality.py's query
    names are executed by the round driver, not by pytest — a renamed
    operator must fail here, not at driver time."""
    import bench
    from weather_stream_processor_spark.registry import all_queries

    specs = all_queries()
    for name in bench.HEADLINE:
        assert name in specs, f"bench HEADLINE references unknown query {name}"
    for name in bench.SF1_QUERIES:
        assert name in specs, f"bench SF1_QUERIES references unknown query {name}"
    assert set(bench.SF1_QUERIES) <= set(bench.HEADLINE) | {
        "q3_shipping_priority",
        "ann_lsh_topk",
    }
    for name in (
        "cosine_topk_exact",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "ann_pq_topk",
        "embedding_covariance_spectrum",
        "ngram_jaccard_pairs",
        "minhash_lsh_near_dup",
    ):
        assert name in specs, f"ann_quality references unknown query {name}"
