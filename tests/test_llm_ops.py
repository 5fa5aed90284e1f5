"""Quality gates for the operators the DuckDB oracle can't express:
hash-based near-dup (MinHash LSH, SimHash), approximate sketches, and
LSH ANN — each checked against its exact counterpart."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _run(spark, name, sf=SF_SMOKE):
    from weather_stream_processor_spark.registry import all_queries

    return all_queries()[name].builder(spark, sf)


def test_minhash_verified_pairs_equal_exact_jaccard(spark):
    exact = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in _run(spark, "ngram_jaccard_pairs").collect()
    }
    lsh = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in _run(spark, "minhash_lsh_near_dup").collect()
    }
    # LSH+verify can only miss candidates, never invent pairs; at the
    # fixtures' near-dup similarity (~0.99) the banding threshold (~0.59)
    # should catch everything.
    assert lsh <= exact
    assert lsh == exact, f"LSH missed {exact - lsh}"


def test_ann_lsh_recall_vs_exact(spark):
    """Multi-table LSH: 4 tables x 6 bits at probe radius 2 gives ~0.96
    expected recall@10 at per-bit agreement 0.6. The graded measurement
    is tools/ann_quality.py at sf0.01 (recall 1.0, ANN_QUALITY.json);
    this regression floor runs on the 500-vector sf0.001 fixture whose
    top-10 "neighbors" are barely above random cosine (deterministic
    recall 0.8 there — two tail neighbors land outside every probed
    bucket), so the floor is set under that, not under the sf0.01 law."""
    exact = [r.vec_id for r in _run(spark, "cosine_topk_exact").collect()]
    ann = [r.vec_id for r in _run(spark, "ann_lsh_topk").collect()]
    recall = len(set(exact) & set(ann)) / len(exact)
    assert recall >= 0.75, f"recall@10 too low: {recall} (ann={ann}, exact={exact})"


def test_ann_ivf_recall_vs_exact(spark):
    exact = [r.vec_id for r in _run(spark, "cosine_topk_exact").collect()]
    ivf = [r.vec_id for r in _run(spark, "ann_ivf_topk").collect()]
    recall = len(set(exact) & set(ivf)) / len(exact)
    # NPROBE/K = 1/8 of the corpus scanned; near-orthogonal fixtures make
    # this the hardest case for coarse quantization, so the bar is modest.
    assert recall >= 0.3, f"recall@10 too low: {recall} (ivf={ivf}, exact={exact})"


def test_embedding_near_dup_symmetric_and_thresholded(spark):
    rows = _run(spark, "embedding_cosine_near_dup").collect()
    assert len(rows) > 0
    for r in rows:
        assert r.vec_id_a < r.vec_id_b
        assert r.cosine_sim >= 0.35


def test_registered_near_dup_has_no_driver_collect(spark):
    """The registered near-dup op must never materialize the corpus on
    the driver; the broadcast GEMM lives only in the guarded, unregistered
    small-corpus utility."""
    import inspect

    from weather_stream_processor_spark.operators import similarity

    src = inspect.getsource(similarity.embedding_cosine_near_dup)
    assert ".collect()" not in src
    blocked = {
        (r.vec_id_a, r.vec_id_b, r.cosine_sim)
        for r in _run(spark, "embedding_cosine_near_dup").collect()
    }
    broadcast = {
        (r.vec_id_a, r.vec_id_b, r.cosine_sim)
        for r in similarity.embedding_near_dup_broadcast(spark, SF_SMOKE).collect()
    }
    assert blocked == broadcast


def test_broadcast_near_dup_refuses_oversized_corpus(spark, monkeypatch):
    from weather_stream_processor_spark.operators import similarity

    monkeypatch.setattr(similarity, "BROADCAST_CORPUS_MAX_ROWS", 1)
    import pytest

    with pytest.raises(ValueError, match="embedding_near_dup_blocked"):
        similarity.embedding_near_dup_broadcast(spark, SF_SMOKE)


def test_simhash_deterministic_across_runs(spark):
    a = {(r.doc_id, r.simhash) for r in _run(spark, "simhash_buckets").collect()}
    b = {(r.doc_id, r.simhash) for r in _run(spark, "simhash_buckets").collect()}
    assert a == b
    assert len(a) > 0


def test_approx_count_distinct_within_5pct(spark):
    for r in _run(spark, "approx_count_distinct_parts").collect():
        assert abs(r.approx_parts - r.exact_parts) / r.exact_parts < 0.05


def test_multimodal_codec_seam_contract(spark):
    """r8: the seam is real for image (netpbm) and audio (WAV). An
    unsupported container raises a loud ValueError (never a silent
    wrong decode); video stays the documented NotImplementedError."""
    import pytest

    from weather_stream_processor_spark.operators.multimodal import decode_payload

    with pytest.raises(ValueError, match="magic"):
        decode_payload(b"\x89PNG", "image")
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x00\x00\x00\x18ftypmp42", "video")


def test_multimodal_features_deterministic(spark):
    a = sorted(
        (r.asset_id, r.n_bytes, r.header_sum)
        for r in _run(spark, "multimodal_asset_features").collect()
    )
    b = sorted(
        (r.asset_id, r.n_bytes, r.header_sum)
        for r in _run(spark, "multimodal_asset_features").collect()
    )
    assert a == b


def test_chunk_dedup_reconstruct_invariants(spark):
    """Chunk-level dedup with reconstruction: (a) per-doc kept <= total,
    (b) the total number of kept chunk occurrences equals the number of
    DISTINCT chunks in the corpus (first-wins keeps exactly one occurrence
    per distinct chunk), (c) the fixture actually exercises removal, and
    (d) a document whose chunks are all first occurrences reconstructs to
    its original text (sha equality)."""
    from tests.conftest import SF_SMOKE
    from weather_stream_processor_spark.operators import dedup as d
    from pyspark.sql import functions as F

    res = d.chunk_dedup_reconstruct(spark, SF_SMOKE)
    rows = res.collect()
    assert all(r.n_kept <= r.n_chunks for r in rows)

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    toks = F.split("text", " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(d._CHUNK_W))).cast("int")
    chunks = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(F.slice(toks, i * d._CHUNK_W + 1, d._CHUNK_W), " "),
            )
        ).alias("chunk"),
    )
    n_distinct = chunks.select("chunk").distinct().count()
    assert sum(r.n_kept for r in rows) == n_distinct
    assert any(r.n_kept < r.n_chunks for r in rows), "fixture should contain dup chunks"

    intact = {r.doc_id: r.dedup_sha for r in rows if r.n_kept == r.n_chunks}
    orig = {
        r.doc_id: r.sha
        for r in docs.select("doc_id", F.sha2("text", 256).alias("sha")).collect()
        if r.doc_id in intact
    }
    assert intact and all(intact[k] == orig[k] for k in intact)


def test_gopher_quality_rules_flag_consistency(spark):
    """keep is exactly the conjunction of the three published rules."""
    from tests.conftest import SF_SMOKE
    from weather_stream_processor_spark.operators import text as t

    rows = t.gopher_quality_rules(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        expect = (
            30 <= r.n_words <= 500
            and 2.0 <= r.mean_word_len <= 8.0
            and r.stopword_hits >= 1
        )
        assert r.keep == expect, r


def test_kmeans_matches_numpy_reference(spark):
    """The distributed Lloyd's implementation must equal an independent
    single-machine numpy implementation of the same pinned algorithm
    (first-k init, 6dp rounding of distances and centroids, cid
    tie-break) — assignment-for-assignment."""
    import numpy as np
    from tests.conftest import SF_SMOKE
    from weather_stream_processor_spark.operators import similarity as s

    rows = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    order = np.argsort(ids)
    ids = ids[order]
    X = np.array([rows[i].embedding for i in order], dtype=np.float64)

    k, iters = s._KMEANS_K, s._KMEANS_ITERS
    cent = {int(ids[j]): X[ids < k][j] for j in range(int((ids < k).sum()))}
    assign = None
    for it in range(iters):
        cids = sorted(cent)
        D = np.round(
            ((X[:, None, :] - np.array([cent[c] for c in cids])[None, :, :]) ** 2).sum(
                axis=2
            ),
            6,
        )
        best_idx = np.argmin(D, axis=1)  # np.argmin takes first = lowest cid
        assign = {int(v): (int(cids[b]), float(D[i, b])) for i, (v, b) in enumerate(zip(ids, best_idx))}
        if it < iters - 1:
            cent = {}
            for c in set(b for b, _ in assign.values()):
                members = X[[b == c for b, _ in (assign[int(v)] for v in ids)]]
                cent[c] = np.round(members.mean(axis=0), 6)

    got = {
        r.vec_id: (r.cluster_id, r.dist2)
        for r in s.kmeans_embedding_clusters(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(assign)
    for v in got:
        assert got[v][0] == assign[v][0], (v, got[v], assign[v])
        assert abs(got[v][1] - assign[v][1]) < 1e-9
