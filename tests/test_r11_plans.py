"""Plan-shape pins for the round-11 operator crop: single corpus scan,
pruned read schemas, and materialization boundaries where a split
consumer would otherwise duplicate the corpus lineage."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from weather_stream_processor_spark.plans import (
    operator_names,
    read_schema_columns,
)


def _df(spark, name, sf=SF_SMOKE):
    from weather_stream_processor_spark.registry import all_queries

    return all_queries()[name].builder(spark, sf)


def test_day_grid_quartet_single_scan_pruned(spark):
    """The spectral/long-memory/residual/change-point quartet each read
    the events parquet exactly ONCE and only the three needed columns —
    every window and spine join downstream runs on the bounded day
    grid."""
    for name in (
        "periodogram_fisher_g",
        "hurst_rescaled_range",
        "durbin_watson_trend_residuals",
        "binseg_change_point",
    ):
        df = _df(spark, name)
        ops = operator_names(df)
        assert ops.count("Scan parquet") == 1, (name, ops)
        for cols in read_schema_columns(df):
            assert set(cols) == {"ts", "event_type", "value"}, name


def test_cs_and_dp_audit_prune_to_two_columns(spark):
    """anytime_confidence_sequence needs only (ts, event_type); the DP
    audit only (user_id, event_type) — value never reaches the scan."""
    df = _df(spark, "anytime_confidence_sequence")
    assert operator_names(df).count("Scan parquet") == 1
    [cols] = read_schema_columns(df)
    assert set(cols) == {"ts", "event_type"}

    df = _df(spark, "dp_contribution_clipping_audit")
    assert operator_names(df).count("Scan parquet") == 1
    [cols] = read_schema_columns(df)
    assert set(cols) == {"user_id", "event_type"}


def test_hilbert_single_scan_two_columns(spark):
    """Both curve walks explode from ONE <=256-row cell grid — a
    UNION-style twin would scan orders twice."""
    df = _df(spark, "hilbert_vs_zorder_locality")
    ops = operator_names(df)
    assert ops.count("Scan parquet") == 1, ops
    assert "Union" not in ops
    [cols] = read_schema_columns(df)
    assert set(cols) == {"o_custkey", "o_orderdate"}


def test_matryoshka_persist_boundary(spark):
    """The trunc/full split formerly duplicated the ENTIRE corpus cosine
    lineage into both branches (4 parquet scans, caught by the r11 plan
    audit); the <=240-row top-k frame is persisted, so the registered
    plan is a checkpoint scan with zero parquet scans."""
    df = _df(spark, "matryoshka_truncation_recall")
    assert operator_names(df).count("Scan parquet") == 0


def test_persisted_r11_builders_are_checkpoint_scans(spark):
    """lilliefors (moments + grid from one persisted projection) and
    eb_rate_shrinkage (source grid feeding hyperparams AND the output)
    both materialize their bounded inputs — no corpus re-scan can hide
    downstream."""
    for name in ("lilliefors_normal_drift", "eb_rate_shrinkage"):
        assert operator_names(_df(spark, name)).count("Scan parquet") == 0, name
