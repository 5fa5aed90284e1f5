"""Quantified quality artifact for the approximate operators.

The pytest gates (tests/test_llm_ops.py) assert recall floors; this script
emits the NUMBERS as one JSON line so round artifacts can cite measured
recall instead of test names:

  recall@10 vs exact cosine top-k for ann_lsh_topk and ann_ivf_topk
  (plus the LSH candidate fraction that pays for it), recall@10 vs the
  exact L2 scan for ann_pq_topk (with its shortlist size), verified-pair
  parity (LSH-found / exact, plus false-positive count) for
  minhash_lsh_near_dup vs the exhaustive ngram_jaccard_pairs, and the
  covariance eigen-spectrum of the embedding store (effective rank +
  top-8 explained-variance share) from embedding_covariance_spectrum.

Usage:
    python tools/ann_quality.py [sf_dir] [out_path]
    # defaults: /root/testdata/sf0.01, ANN_QUALITY.json
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else str(Path(_REPO) / "ANN_QUALITY.json")

    from weather_stream_processor_spark.registry import all_queries
    from weather_stream_processor_spark.session import get_spark

    spark = get_spark("ann-quality")
    specs = all_queries()

    def run(name):
        return specs[name].builder(spark, sf_dir).collect()

    exact = [r.vec_id for r in run("cosine_topk_exact")]
    lsh = [r.vec_id for r in run("ann_lsh_topk")]
    ivf = [r.vec_id for r in run("ann_ivf_topk")]
    pq = [r.vec_id for r in run("ann_pq_topk")]

    from weather_stream_processor_spark.operators.similarity import (
        PQ_SHORTLIST,
        _lsh_candidate_sims,
    )
    from weather_stream_processor_spark.sources import load_table

    n_candidates = _lsh_candidate_sims(spark, sf_dir).count()
    n_corpus = load_table(spark, sf_dir, "embeddings").count() - 1  # minus query

    # PQ approximates L2 (not cosine) ranking, so its recall baseline is
    # the exact L2 top-k, computed here by brute force (tool-only collect)
    import numpy as np

    erows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    eids = np.array([r.vec_id for r in erows], dtype=np.int64)
    emat = np.array([r.embedding for r in erows], dtype=np.float64)
    qv = emat[eids == 0][0]
    l2 = np.round(((emat - qv) ** 2).sum(axis=1), 6)
    msk = eids != 0
    exact_l2 = eids[msk][np.lexsort((eids[msk], l2[msk]))][: len(pq)].tolist()

    # eigen-spectrum of the distributed covariance matrix: effective rank
    # (exp of eigenvalue entropy) and top-8 explained-variance share — the
    # numbers behind truncation / whitening decisions
    cov_rows = run("embedding_covariance_spectrum")
    dim = max(r.j for r in cov_rows)
    C = np.zeros((dim, dim))
    for r in cov_rows:
        C[r.i - 1, r.j - 1] = C[r.j - 1, r.i - 1] = r.cov
    eig = np.clip(np.linalg.eigvalsh(C), 0, None)[::-1]
    p = eig / eig.sum()
    effective_rank = float(np.exp(-(p[p > 0] * np.log(p[p > 0])).sum()))

    # IVF recall-vs-scan-fraction curve: the trade a deployment tunes.
    # Each point is (nprobe, recall@10 vs exact cosine, candidate fraction
    # of corpus scanned by the rerank).
    from weather_stream_processor_spark.operators.similarity import ivf_plan

    ivf_curve = []
    for nprobe in (2, 4, 8, 16):
        plan = ivf_plan(spark, sf_dir, nprobe)
        got = [r.vec_id for r in plan["top"].collect()]
        frac = plan["candidates"].count() / max(n_corpus, 1)
        ivf_curve.append(
            {
                "nprobe": nprobe,
                "recall_at_k": round(len(set(exact) & set(got)) / len(exact), 4),
                "scan_fraction": round(frac, 4),
            }
        )

    exact_pairs = {(r.doc_a, r.doc_b) for r in run("ngram_jaccard_pairs")}
    minhash_pairs = {(r.doc_a, r.doc_b) for r in run("minhash_lsh_near_dup")}

    # hubness profile of the embedding space: skewness of the k-occurrence
    # distribution (S_k > ~1 predicts ANN recall loss; Radovanovic JMLR'10)
    # plus the anti-hub fraction (vectors no other vector retrieves)
    hub_rows = [(r.n_in, r.n_vectors) for r in run("knn_hubness_audit")]
    tot_v = sum(nv for _, nv in hub_rows)
    mean_k = sum(n * nv for n, nv in hub_rows) / tot_v
    var_k = sum(nv * (n - mean_k) ** 2 for n, nv in hub_rows) / tot_v
    skew_k = (
        sum(nv * (n - mean_k) ** 3 for n, nv in hub_rows) / tot_v / var_k**1.5
        if var_k > 0
        else 0.0
    )
    antihub = sum(nv for n, nv in hub_rows if n == 0) / tot_v
    n_mutual = len([1 for _ in run("mutual_knn_pairs")])

    result = {
        "sf_dir": sf_dir,
        "k": len(exact),
        "ann_lsh_recall_at_k": round(len(set(exact) & set(lsh)) / len(exact), 4),
        "ann_lsh_candidate_fraction": round(n_candidates / max(n_corpus, 1), 4),
        "ann_ivf_recall_at_k": round(len(set(exact) & set(ivf)) / len(exact), 4),
        "ann_ivf_recall_curve": ivf_curve,
        "ann_pq_recall_at_k": round(
            len(set(exact_l2) & set(pq)) / max(len(exact_l2), 1), 4
        ),
        "ann_pq_shortlist": PQ_SHORTLIST,
        "minhash_exact_pairs": len(exact_pairs),
        "minhash_found_pairs": len(minhash_pairs & exact_pairs),
        "minhash_pair_recall": round(
            len(minhash_pairs & exact_pairs) / max(len(exact_pairs), 1), 4
        ),
        "minhash_false_positives": len(minhash_pairs - exact_pairs),
        "covariance_effective_rank": round(effective_rank, 2),
        "covariance_dim": int(dim),
        "explained_variance_top8": round(float(p[:8].sum()), 4),
        "hubness_k_occurrence_skew": round(float(skew_k), 4),
        "hubness_antihub_fraction": round(antihub, 4),
        "mutual_knn_pair_count": n_mutual,
    }
    Path(out_path).write_text(json.dumps(result) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
