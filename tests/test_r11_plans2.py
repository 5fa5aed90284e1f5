"""Plan-shape pins for the round-11 continuation crop (the same
load-bearing properties test_r11_plans.py pins for the first r11 crop):
scan counts and pruned read schemas are the 100 TB contract — a future
edit that silently re-expands a lineage into extra corpus scans or
widens a scan to all columns fails here, not in a bench regression."""

from __future__ import annotations

import re

import pytest

from tests.conftest import SF_SMOKE
from weather_stream_processor_spark.registry import all_queries


def _plan(spark, name):
    df = all_queries()[name].builder(spark, str(SF_SMOKE))
    return df._jdf.queryExecution().executedPlan().toString()


def _schemas(plan):
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def test_rouge_is_single_pruned_scan(spark):
    """The tagged-struct-array explode form: ONE corpus scan pruned to
    (doc_id, text) — the union-of-branches form scanned 4x."""
    plan = _plan(spark, "rouge_n_generation_eval")
    assert plan.count("Scan parquet") == 1
    (rs,) = _schemas(plan)
    assert set(rs.split(",")) == {"doc_id:bigint", "text:string"}


def test_soundex_scans_twice_pruned_to_name(spark):
    """Both sides of the self-join read ONLY p_name (the
    fuzzy_name_pairs shape)."""
    plan = _plan(spark, "soundex_phonetic_blocking")
    assert plan.count("Scan parquet") == 2
    for rs in _schemas(plan):
        assert rs == "p_name:string"


def test_bloom_advisor_scans_one_key_column_each(spark):
    """Five distinct-aggregates, each scan pruned to its single key
    column — an advisor that read whole tables would be wrong."""
    plan = _plan(spark, "bloom_filter_sizing_advisor")
    assert plan.count("Scan parquet") == 5
    for rs in _schemas(plan):
        assert len(rs.split(",")) == 1, rs


@pytest.mark.parametrize(
    "name",
    [
        # persisted_result / truncate_lineage boundaries: the corpus
        # work runs eagerly exactly once at build; the registered plan
        # is a checkpoint scan with ZERO visible parquet scans
        "crps_ensemble_backtest",
        "negative_binomial_fit",
        "subclassification_ate",
        "markov_entropy_rate",
        "jackknife_source_se",
        "newey_west_robust_se",
        "davies_bouldin_index",
        "cooks_distance_trend",
        "weibull_survival_fit",
        "kaplan_meier_retention",
        # bleu: tagged-struct single-scan form + checkpointed gram
        # counts feeding both the precision rows and the length totals
        # (was 9 scans: 8 union branches + the separate length agg)
        "corpus_bleu_eval",
    ],
)
def test_checkpoint_boundary_hides_corpus_lineage(spark, name):
    assert _plan(spark, name).count("Scan parquet") == 0, name
