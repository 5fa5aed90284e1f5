"""Round-5 operator tests: the curation module (SemDeDup semantic dedup,
DSIR importance weighting, embedding eval decontamination) — semantic
properties the oracle hash-gate can't express, verified against
brute-force numpy on the smoke fixture."""

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


def test_semdedup_drop_rule_matches_brute_force(spark):
    """A vector is dropped iff some LOWER-id vector in the SAME cluster has
    rounded cosine >= threshold — verified exhaustively in numpy."""
    from weather_stream_processor_spark.operators.similarity import NEAR_DUP_COSINE

    out = _run(spark, "semdedup_keep_list").collect()
    cluster = {r.vec_id: r.cluster_id for r in out}
    kept = {r.vec_id: r.is_kept for r in out}

    ids, mat = _embeddings(spark)
    norms = np.sqrt((mat * mat).sum(axis=1))
    cos = np.round((mat @ mat.T) / np.outer(norms, norms), 6)

    for j, vid in enumerate(ids):
        should_drop = any(
            cluster[ids[i]] == cluster[vid] and cos[i, j] >= NEAR_DUP_COSINE
            for i in range(j)
        )
        assert kept[vid] == (not should_drop), f"vec {vid}"


def test_semdedup_clusters_match_kmeans_operator(spark):
    """The SemDeDup clustering IS kmeans_embedding_clusters' assignment
    (shared deterministic k-means), not a private variant."""
    sem = {r.vec_id: r.cluster_id for r in _run(spark, "semdedup_keep_list").collect()}
    km = {
        r.vec_id: r.cluster_id
        for r in _run(spark, "kmeans_embedding_clusters").collect()
    }
    assert sem == km


def test_dsir_scores_separate_target_from_rest(spark):
    """Target-language docs must score higher on average than the rest —
    the minimal 'importance weights point at the target' property — and
    token counts must agree with token_counts."""
    from weather_stream_processor_spark.operators.curation import DSIR_TARGET_LANG
    from weather_stream_processor_spark.sources import load_table

    out = {r.doc_id: r for r in _run(spark, "dsir_importance_weights").collect()}
    langs = {
        r.doc_id: r.lang
        for r in load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang").collect()
    }
    tgt = [out[d].dsir_logratio for d in out if langs[d] == DSIR_TARGET_LANG]
    rest = [out[d].dsir_logratio for d in out if langs[d] != DSIR_TARGET_LANG]
    assert tgt and rest
    assert np.mean(tgt) > np.mean(rest)
    # target_like flag is exactly the sign of the score
    for r in out.values():
        assert r.target_like == (r.dsir_logratio > 0)

    ntok = {r.doc_id: r.n_tokens for r in _run(spark, "token_counts").collect()}
    for d, r in out.items():
        assert r.n_tokens == ntok[d]


def test_eval_decontam_matches_brute_force(spark):
    """Eval rows are excluded; every corpus row's (nearest_eval_id,
    max_eval_cos) matches the numpy argmax with the same rounding and
    eid tie-break."""
    from weather_stream_processor_spark.operators.curation import EVAL_VEC_MODULUS
    from weather_stream_processor_spark.operators.similarity import NEAR_DUP_COSINE

    out = {r.vec_id: r for r in _run(spark, "embedding_eval_decontam").collect()}
    assert all(v % EVAL_VEC_MODULUS != 0 for v in out)

    ids, mat = _embeddings(spark)
    norms = np.sqrt((mat * mat).sum(axis=1))
    ev = ids % EVAL_VEC_MODULUS == 0
    assert ev.sum() > 1
    cos = np.round(
        (mat[~ev] @ mat[ev].T) / np.outer(norms[~ev], norms[ev]), 6
    )
    corpus_ids, eval_ids = ids[~ev], ids[ev]
    assert set(out) == set(corpus_ids.tolist())
    for ci, vid in enumerate(corpus_ids):
        best = min(zip(-cos[ci], eval_ids))  # max cos, then smallest eid
        r = out[vid]
        assert r.nearest_eval_id == best[1]
        assert abs(r.max_eval_cos - (-best[0])) < 1e-9
        assert r.is_contaminated == (r.max_eval_cos >= NEAR_DUP_COSINE)
