"""Round-11 time-series operators: semantics pinned on CONSTRUCTED daily
series where the expected behavior is known in closed form (fixture
oracle parity is covered by tools/oracle_check.py; these tests pin what
the oracle merely mirrors)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from weather_stream_processor_spark.registry import all_queries


def _write_day_events(tmp_path, day_values, event_type="click"):
    """One event per (day, value) pair; day is an offset from 2024-01-01."""
    rows = []
    for day, vals in day_values:
        if not isinstance(vals, (list, tuple)):
            vals = [vals]
        for v in vals:
            rows.append((day, v))
    n = len(rows)
    pdf = pd.DataFrame(
        {
            "event_id": list(range(1, n + 1)),
            "ts": [
                pd.Timestamp("2024-01-01") + pd.Timedelta(days=d, hours=1)
                for d, _ in rows
            ],
            "user_id": pd.array([i % 5 for i in range(n)], dtype="Int64"),
            "event_type": [event_type] * n,
            "value": [v for _, v in rows],
            "props": ["{}"] * n,
        }
    )
    duckdb.connect().execute(
        f"COPY (SELECT * FROM pdf) TO '{tmp_path}/events.parquet' "
        "(FORMAT PARQUET)"
    )


def _run(spark, name, sf):
    return all_queries()[name].builder(spark, str(sf)).collect()


def test_periodogram_finds_planted_period(spark, tmp_path):
    # 20 days, pure period-5 sinusoid -> ALL band power at k = 20/5 = 4
    # (an impulse train would split power across its harmonics 4 and 8
    # and cap g at 0.5 — the tone isolates the peak)
    series = [
        (d, 5.0 + 3.0 * math.sin(2 * math.pi * d / 5.0)) for d in range(20)
    ]
    _write_day_events(str(tmp_path), series)
    rows = _run(spark, "periodogram_fisher_g", tmp_path)
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["n_days"] == 20
    assert r["peak_k"] == 4
    assert r["period_days"] == pytest.approx(5.0)
    # a pure planted tone concentrates nearly all band power
    assert r["fisher_g"] > 0.9
    assert r["p_upper_bound"] < 0.01


def test_periodogram_flat_series_excluded(spark, tmp_path):
    _write_day_events(str(tmp_path), [(d, 2.0) for d in range(12)])
    rows = _run(spark, "periodogram_fisher_g", tmp_path)
    assert rows == []  # zero residual power -> i_sum == 0 -> excluded


def test_hurst_trend_is_persistent_alternation_is_not(spark, tmp_path):
    trend = [(d, float(d + 1)) for d in range(16)]
    _write_day_events(str(tmp_path), trend, event_type="click")
    rows = {r["event_type"]: r.asDict() for r in _run(spark, "hurst_rescaled_range", tmp_path)}
    h_trend = rows["click"]["hurst_exponent"]
    assert h_trend is not None and h_trend > 0.8  # monotone ramp: persistent

    alt = [(d, 5.0 if d % 2 == 0 else 1.0) for d in range(16)]
    _write_day_events(str(tmp_path), alt, event_type="click")
    rows = {r["event_type"]: r.asDict() for r in _run(spark, "hurst_rescaled_range", tmp_path)}
    h_alt = rows["click"]["hurst_exponent"]
    assert h_alt is not None and h_alt < 0.5  # alternation: anti-persistent
    # block accounting: 16 days -> 4/2/1 full blocks of sizes 4/8/16
    assert (rows["click"]["nb4"], rows["click"]["nb8"], rows["click"]["nb16"]) == (4, 2, 1)


def test_durbin_watson_detects_alternating_residuals(spark, tmp_path):
    # flat trend + alternating noise: e_t = +a, -a, ... -> DW -> 4
    alt = [(d, 10.0 + (1.0 if d % 2 == 0 else -1.0)) for d in range(20)]
    _write_day_events(str(tmp_path), alt)
    r = _run(spark, "durbin_watson_trend_residuals", tmp_path)[0].asDict()
    assert r["dw_stat"] > 3.0
    assert r["rho_lag1"] < -0.5
    assert abs(r["trend_slope_cents_per_day"]) < 10.0  # ~flat in cents

    # slow level drift the line can't fully track both halves of:
    # low half then high half -> residuals positively correlated -> DW < 2
    step = [(d, 1.0) for d in range(10)] + [(d, 21.0) for d in range(10, 20)]
    _write_day_events(str(tmp_path), step)
    r = _run(spark, "durbin_watson_trend_residuals", tmp_path)[0].asDict()
    assert r["dw_stat"] < 1.5
    assert r["rho_lag1"] > 0.25


def test_durbin_watson_excludes_perfect_line(spark, tmp_path):
    # exact line -> zero residuals -> den = 0 -> excluded (mirrored)
    _write_day_events(str(tmp_path), [(d, float(d)) for d in range(10)])
    assert _run(spark, "durbin_watson_trend_residuals", tmp_path) == []


def test_binseg_localizes_planted_step(spark, tmp_path):
    series = [(d, 2.0) for d in range(12)] + [(d, 8.0) for d in range(12, 30)]
    _write_day_events(str(tmp_path), series)
    r = _run(spark, "binseg_change_point", tmp_path)[0].asDict()
    assert r["tau"] == 12  # split AFTER the 12th point
    assert r["mean_before_value"] == pytest.approx(2.0)
    assert r["mean_after_value"] == pytest.approx(8.0)
    assert r["r2_split"] > 0.99
    # split day is the last day of the left segment (1-based t = 12
    # -> 0-based day offset 11 from 2024-01-01 = epoch day 19723 + 11)
    assert r["split_epoch_day"] == 19723 + 11


def test_binseg_excludes_constant_series(spark, tmp_path):
    _write_day_events(str(tmp_path), [(d, 3.0) for d in range(10)])
    assert _run(spark, "binseg_change_point", tmp_path) == []


def test_confidence_sequence_shrinks_and_covers(spark, tmp_path):
    # 10 days x 20 events/day, 5 purchases/day -> p = 0.25 every prefix
    rows = []
    for d in range(10):
        rows.append((d, [1.0] * 20))
    _write_day_events(str(tmp_path), rows, event_type="view")
    # overwrite: mixed types needed -> build manually
    pdf_rows = []
    eid = 1
    for d in range(10):
        for i in range(20):
            pdf_rows.append(
                (
                    eid,
                    pd.Timestamp("2024-01-01") + pd.Timedelta(days=d, hours=1),
                    i % 5,
                    "purchase" if i < 5 else "view",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    pdf = pd.DataFrame(
        pdf_rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    duckdb.connect().execute(
        f"COPY (SELECT * FROM pdf) TO '{tmp_path}/events.parquet' "
        "(FORMAT PARQUET)"
    )
    out = sorted(
        (r.asDict() for r in _run(spark, "anytime_confidence_sequence", tmp_path)),
        key=lambda r: r["epoch_day"],
    )
    assert len(out) == 10
    radii = [r["radius"] for r in out]
    assert radii == sorted(radii, reverse=True)  # shrinks monotonically
    assert all(r["p_hat"] == pytest.approx(0.25) for r in out)
    # stationary truth: every band must contain the final share
    assert all(r["final_in_interval"] for r in out)
    # radius formula spot-check at the last day (t = 200)
    t = 200.0
    expect = 1.7 * math.sqrt((math.log(math.log(2 * t)) + 0.72 * math.log(10.4 / 0.05)) / t)
    assert out[-1]["radius"] == pytest.approx(expect, abs=1e-6)


def _write_xy_days(tmp_path, day_xy):
    """day_xy: list of (day, n_clicks, purchase_value) -> events where
    day has n_clicks 'click' rows and ONE 'purchase' row of the value."""
    rows = []
    for d, nx, pv in day_xy:
        for _ in range(nx):
            rows.append((d, "click", 1.0))
        rows.append((d, "purchase", pv))
    n = len(rows)
    pdf = pd.DataFrame(
        {
            "event_id": list(range(1, n + 1)),
            "ts": [
                pd.Timestamp("2024-01-01") + pd.Timedelta(days=d, hours=2)
                for d, _, _ in rows
            ],
            "user_id": pd.array([i % 5 for i in range(n)], dtype="Int64"),
            "event_type": [t for _, t, _ in rows],
            "value": [v for _, _, v in rows],
            "props": ["{}"] * n,
        }
    )
    duckdb.connect().execute(
        f"COPY (SELECT * FROM pdf) TO '{tmp_path}/events.parquet' "
        "(FORMAT PARQUET)"
    )


def test_dcor_sees_v_shape_pearson_misses(spark, tmp_path):
    # y = |x - 5| (V-shape): Pearson ~0 by symmetry, dCor decisively > 0
    xs = list(range(11))
    _write_xy_days(
        str(tmp_path), [(d, x, float(abs(x - 5)) + 0.01) for d, x in enumerate(xs)]
    )
    r = _run(spark, "distance_correlation_daily", tmp_path)[0].asDict()
    assert abs(r["pearson_r"]) < 0.05
    assert r["dcor"] > 0.4


def test_dcor_equals_one_on_perfect_line(spark, tmp_path):
    _write_xy_days(
        str(tmp_path), [(d, x, float(2 * x) + 0.005) for d, x in enumerate(range(1, 13))]
    )
    r = _run(spark, "distance_correlation_daily", tmp_path)[0].asDict()
    assert r["pearson_r"] == pytest.approx(1.0, abs=1e-6)
    assert r["dcor"] == pytest.approx(1.0, abs=1e-6)


def test_dcor_constant_series_excluded(spark, tmp_path):
    _write_xy_days(str(tmp_path), [(d, 3, 5.0) for d in range(10)])
    assert _run(spark, "distance_correlation_daily", tmp_path) == []
