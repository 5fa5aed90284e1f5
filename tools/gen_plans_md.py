"""Regenerate docs/PLANS.md: the formatted physical plan of representative
headline queries, so plan quality is reviewable as a checked-in artifact
(the plan-shape tests assert the load-bearing properties; this file shows
the whole plan those assertions sample).

Usage: python tools/gen_plans_md.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# one per family: scan+agg, dim join, window top-k, dedup, similarity,
# text, graph, sampling, streaming-batch-twin-free picks only (streaming
# plans materialize per micro-batch and don't explain statically)
SHOWCASE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "top3_orders_per_customer",
    "exact_dedup_by_hash",
    "minhash_lsh_near_dup",
    "cosine_topk_exact",
    "tfidf_top_term_per_doc",
    "winnowing_fingerprints",
    "tfidf_cosine_doc_pairs",
    "degree_assortativity",
    "ks_drift_two_sample",
    "train_test_time_split_audit",
    # round-5 additions: joinless bloom probe, MG-prefiltered recount,
    # cross-label blocked GEMM, RI audit union
    "bloom_filter_decontam",
    "heavy_hitters_exact",
    "hard_negative_mining",
    "referential_integrity_audit",
    # round-5c..5g additions: grid-bounded AUC (one scan), shuffle-free
    # chunker, all-kNN-grid LOF, single-scan layout audit, pandas_udf
    # linkage join
    "roc_auc_exact",
    "rag_chunk_manifest",
    "lof_outlier_scores",
    "minmax_pruning_audit",
    "jaro_winkler_linkage_topk",
    # round-5h additions: sortless MRR (aggregate-only ranking), PAV-as-
    # joins isotonic calibration, vocab-bounded count-min probe
    "mrr_first_relevant",
    "isotonic_calibration_bins",
    "countmin_sketch_rollup",
    # round-5n/5p additions: single-window feature assembly, cell-blocked
    # spatial join
    "point_in_time_features",
    "geo_block_pair_join",
    # round-6 additions: keyed prefix-sum packing, single-exchange SCD2,
    # HRW argmax explode, bitmap popcount algebra, bounded frontier-join
    # recursion, blocked Allen pairs, decimal-exact CKA Gram
    "concat_chunk_packing_manifest",
    "scd2_dimension_build",
    "rendezvous_shard_rebalance",
    "bitmap_index_set_algebra",
    "bom_rollup_explosion",
    "allen_interval_relations",
    "linear_cka_truncation_audit",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from weather_stream_processor_spark.plans import explain_string
    from weather_stream_processor_spark.registry import all_queries
    from weather_stream_processor_spark.session import get_spark

    spark = get_spark("gen_plans")
    specs = all_queries()

    out = [
        "# Physical plans (generated)",
        "",
        f"Regenerate with `python tools/gen_plans_md.py` (fixture: `{sf_dir}`).",
        "One representative query per operator family; the plan-shape tests in",
        "`tests/test_plans.py` assert the load-bearing properties (pushdown,",
        "pruning, broadcast vs shuffle, TakeOrderedAndProject, WindowGroupLimit,",
        "partial aggregation) on every release — this file is the full text",
        "those assertions sample, for human review.",
        "",
    ]
    for name in SHOWCASE:
        spec = specs[name]
        plan = explain_string(spec.builder(spark, sf_dir), "formatted")
        # keep the operator tree + per-operator details; they are the review
        # surface. Strip trailing whitespace noise.
        body = "\n".join(line.rstrip() for line in plan.splitlines()).strip()
        out.append(f"## {name}")
        out.append("")
        out.append("```")
        out.append(body)
        out.append("```")
        out.append("")
    Path(_REPO, "docs", "PLANS.md").write_text("\n".join(out) + "\n")
    print(f"wrote docs/PLANS.md: {len(SHOWCASE)} plans")


if __name__ == "__main__":
    main()
