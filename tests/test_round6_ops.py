"""Round-6 operator tests: trained product-quantization ANN, the
distributed covariance spectrum, the theta/KLL mergeable sketches, and the
pigeonhole-blocked SimHash Hamming pairs — semantic properties the oracle
hash-gate can't express (recall floors, rerank exactness, PSD-ness, sketch
accuracy/mergeability, candidate completeness, plan shapes), verified
against brute-force numpy/python on the smoke fixture."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_SMOKE


def _run(spark, name, sf=SF_SMOKE):
    from weather_stream_processor_spark.registry import all_queries

    return all_queries()[name].builder(spark, sf)


def _embeddings(spark, sf=SF_SMOKE):
    from weather_stream_processor_spark.sources import load_table

    rows = load_table(spark, sf, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def test_pq_rerank_distances_are_exact(spark):
    """The PQ pipeline's final distances come from the exact-L2 rerank, so
    every returned dist2 must equal the brute-force squared distance."""
    ids, mat = _embeddings(spark)
    q = mat[ids == 0][0]
    d2 = {int(i): round(float(((v - q) ** 2).sum()), 6) for i, v in zip(ids, mat)}

    out = _run(spark, "ann_pq_topk").collect()
    assert len(out) == 10
    for r in out:
        assert abs(r.dist2 - d2[r.vec_id]) < 1e-6, r


def test_pq_recall_floor_vs_exact_l2(spark):
    """Trained codebooks + a 100-candidate shortlist must recover most of
    the true L2 top-10 (measured 0.9-1.0 on the fixtures; floor at 0.7 so
    fixture regeneration can't flake the gate)."""
    ids, mat = _embeddings(spark)
    q = mat[ids == 0][0]
    l2 = np.round(((mat - q) ** 2).sum(axis=1), 6)
    mask = ids != 0
    exact = set(ids[mask][np.lexsort((ids[mask], l2[mask]))][:10].tolist())

    got = {r.vec_id for r in _run(spark, "ann_pq_topk").collect()}
    assert len(got & exact) / 10 >= 0.7


def test_pq_ranking_is_sorted_and_tiebroken(spark):
    out = _run(spark, "ann_pq_topk").orderBy("rn").collect()
    keys = [(r.dist2, r.vec_id) for r in out]
    assert keys == sorted(keys)
    assert [r.rn for r in out] == list(range(1, len(out) + 1))


def test_covariance_matches_numpy(spark):
    """The partition-Gram + single-aggregation plan must reproduce the
    population covariance matrix computed by numpy in one shot."""
    _, mat = _embeddings(spark)
    expected = np.cov(mat, rowvar=False, bias=True)

    out = _run(spark, "embedding_covariance_spectrum").collect()
    d = mat.shape[1]
    assert len(out) == d * (d + 1) // 2
    from weather_stream_processor_spark.operators.similarity import (
        cov_from_moments,
    )

    for r in out:
        cov = cov_from_moments(r)
        assert abs(cov - expected[r.i - 1, r.j - 1]) < 2e-6, (r.i, r.j)


def test_covariance_spectrum_is_psd_with_trace_parity(spark):
    """Assembling the triangle into a symmetric matrix must yield a PSD
    spectrum (covariance matrices are PSD up to the 6dp rounding) whose
    trace equals the summed per-dimension variances."""
    out = _run(spark, "embedding_covariance_spectrum").collect()
    d = max(r.j for r in out)
    C = np.zeros((d, d))
    from weather_stream_processor_spark.operators.similarity import (
        cov_from_moments,
    )

    for r in out:
        cov = cov_from_moments(r)
        C[r.i - 1, r.j - 1] = cov
        C[r.j - 1, r.i - 1] = cov

    eig = np.linalg.eigvalsh(C)
    assert eig.min() >= -1e-4, eig.min()

    _, mat = _embeddings(spark)
    assert abs(np.trace(C) - mat.var(axis=0).sum()) < 1e-3


def test_theta_set_algebra_exact_below_capacity(spark):
    """Below theta retention capacity (4096 entries; the fixture regime)
    the sketches hold every hash, so all six set-algebra estimates must
    EQUAL the exact cardinalities — and inclusion-exclusion must hold."""
    from weather_stream_processor_spark.operators.aggregates import (
        THETA_VALUE_THRESHOLD,
    )
    from weather_stream_processor_spark.sources import load_table

    ev = load_table(spark, SF_SMOKE, "events").collect()
    A = {r.user_id for r in ev if r.event_type == "click" and r.value > THETA_VALUE_THRESHOLD}
    B = {r.user_id for r in ev if r.event_type == "purchase" and r.value > THETA_VALUE_THRESHOLD}

    got = {r.set_op: r.approx_users for r in _run(spark, "theta_sketch_set_algebra").collect()}
    assert got == {
        "a": len(A),
        "b": len(B),
        "union": len(A | B),
        "intersection": len(A & B),
        "a_only": len(A - B),
        "b_only": len(B - A),
    }
    assert got["union"] == got["a"] + got["b"] - got["intersection"]


def test_kll_rollup_rank_accuracy_and_mergeability(spark):
    """Each reported quantile's TRUE rank must sit within the KLL rank
    error bound of its target, and the merged '__ALL__' row must cover
    exactly the full row count (merge-of-parts, not a rescan)."""
    from weather_stream_processor_spark.sources import load_table

    vals = {}
    for r in load_table(spark, SF_SMOKE, "events").select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    vals["__ALL__"] = [v for g in list(vals.values()) for v in g]

    out = _run(spark, "kll_quantile_mergeable_rollup").collect()
    assert {r.event_type for r in out} == set(vals)
    EPS = 0.02  # k=200 single-sketch rank error ~1.65%; margin for merge
    for r in out:
        xs = np.sort(np.array(vals[r.event_type]))
        assert r.n == len(xs)
        for target, est in ((0.5, r.p50), (0.95, r.p95), (0.99, r.p99)):
            true_rank = np.searchsorted(xs, est, side="right") / len(xs)
            assert abs(true_rank - target) <= EPS + 1.0 / len(xs), (
                r.event_type,
                target,
                est,
                true_rank,
            )


def test_pq_plan_shapes(spark):
    """ADC scoring must broadcast the 256-row distance table (never
    shuffle the code table against it), the shortlist must be
    TakeOrderedAndProject (per-partition heaps), and nothing may fall
    back to a cartesian product."""
    from weather_stream_processor_spark.plans import require_plan

    require_plan(
        _run(spark, "ann_pq_topk"),
        contains=("BroadcastHashJoin", "TakeOrderedAndProject"),
        not_contains=("CartesianProduct", "SortMergeJoin"),
    )


def test_covariance_spectrum_single_aggregation(spark):
    """The partial-Gram plan must finish with ONE hash aggregation over
    the (i, j) triangle keys — no join, no window, no second shuffle."""
    from weather_stream_processor_spark.plans import operator_names

    names = operator_names(_run(spark, "embedding_covariance_spectrum"))
    assert not any("Join" in n for n in names), names
    assert not any("Window" in n for n in names), names
    # exactly two exchanges: the spread() repartition that balances the
    # Arrow batches before the Gram pass, and the (i, j) partial->final
    # aggregate boundary — nothing else may shuffle
    assert sum("Exchange" in n for n in names) == 2, names
    # partial + final HashAggregate pair (map-side combine of the Gram rows)
    assert sum(n == "HashAggregate" for n in names) == 2, names


def test_simhash_hamming_candidates_complete_and_verified(spark):
    """Pigeonhole completeness: EVERY pair within HAMMING_MAX bits must be
    emitted (verified brute-force over all fingerprint pairs), and every
    emitted pair's distance must be correct. Also pins the recall floor
    vs the exact-Jaccard pairs (different similarity notions — SimHash is
    token-multiset cosine-ish — so 100% overlap is not expected)."""
    from weather_stream_processor_spark.operators.dedup import HAMMING_MAX

    fps = {
        r.doc_id: r.simhash
        for r in _run(spark, "simhash_buckets").select("doc_id", "simhash").collect()
    }
    expected = {}
    ids = sorted(fps)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            h = bin(fps[a] ^ fps[b]).count("1")
            if h <= HAMMING_MAX:
                expected[(a, b)] = h

    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in _run(spark, "simhash_hamming_near_dup").collect()
    }
    assert got == expected

    jac = {(r.doc_a, r.doc_b) for r in _run(spark, "ngram_jaccard_pairs").collect()}
    assert len(set(got) & jac) / max(len(jac), 1) >= 0.6
