"""Round-10 operator tests, batch 1: the randomness/autocorrelation
diagnostics trio (Ljung-Box portmanteau, Wald-Wolfowitz runs test,
turning-point test) — each checked against an independent pure-Python
rederivation on the smoke fixture (oracle parity is covered by
tools/oracle_check.py; these tests pin the semantics the oracle merely
mirrors).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from tests.conftest import SF_SMOKE
from weather_stream_processor_spark.registry import all_queries


def _as_sf(z: float) -> float:
    b = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
    t = 1.0 / (1.0 + 0.2316419 * z)
    poly = t * (b[0] + t * (b[1] + t * (b[2] + t * (b[3] + t * b[4]))))
    return math.exp(-z * z / 2.0) / math.sqrt(2.0 * math.pi) * poly


def _daily_series() -> dict[str, list[int]]:
    """Per-type daily integer-cents series in day order (the shared input
    construction of all three operators), rebuilt independently in DuckDB."""
    rows = duckdb.connect().execute(
        f"""
        SELECT event_type,
               date_diff('day', DATE '1970-01-01',
                         CAST(date_trunc('day', ts) AS DATE)) AS d,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM read_parquet('{SF_SMOKE}/events.parquet')
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[int]] = {}
    for et, _, cents in rows:
        series.setdefault(et, []).append(int(cents))
    return series


def _run(spark, name):
    return all_queries()[name].builder(spark, SF_SMOKE)


# --------------------------------------------------------------------------
# ljung_box_autocorr
# --------------------------------------------------------------------------


def test_ljung_box_matches_python(spark):
    series = _daily_series()
    out = {r.event_type: r for r in _run(spark, "ljung_box_autocorr").collect()}
    assert set(out) == set(series)
    for et, xs in series.items():
        n = len(xs)
        mean = sum(xs) / n
        den = sum((x - mean) ** 2 for x in xs)
        q = 0.0
        r1 = None
        m = 7
        for k in range(1, m + 1):
            num = sum(
                (xs[t] - mean) * (xs[t - k] - mean) for t in range(k, n)
            )
            rk = num / den
            if k == 1:
                r1 = rk
            q += rk * rk / (n - k)
        q *= n * (n + 2)
        row = out[et]
        assert row.n_days == n and row.df == m
        assert abs(row.r1 - r1) < 1e-4, (et, row.r1, r1)
        assert abs(row.lb_q - q) < max(1e-3, 1e-4 * abs(q)), (et, row.lb_q, q)
        # Wilson-Hilferty p re-derivation
        z = ((q / m) ** (1.0 / 3.0) - (1.0 - 2.0 / (9.0 * m))) / math.sqrt(
            2.0 / (9.0 * m)
        )
        p = _as_sf(z) if z >= 0 else 1.0 - _as_sf(-z)
        assert abs(row.p_wilson_hilferty - p) < 1e-4


def test_ljung_box_detects_constructed_autocorrelation():
    """Sanity of the statistic itself: a strongly autocorrelated series
    must yield a much larger Q than a fixed pseudo-random one."""

    def lb_q(xs, m=7):
        n = len(xs)
        mean = sum(xs) / n
        den = sum((x - mean) ** 2 for x in xs)
        q = 0.0
        for k in range(1, m + 1):
            num = sum((xs[t] - mean) * (xs[t - k] - mean) for t in range(k, n))
            q += (num / den) ** 2 / (n - k)
        return n * (n + 2) * q

    trend = [t * 10 for t in range(120)]  # maximal persistence
    # fixed LCG so the test is deterministic
    x, rnd = 12345, []
    for _ in range(120):
        x = (1103515245 * x + 12345) % (1 << 31)
        rnd.append(x % 1000)
    assert lb_q(trend) > 50 * lb_q(rnd)


# --------------------------------------------------------------------------
# wald_wolfowitz_runs
# --------------------------------------------------------------------------


def test_runs_test_matches_python(spark):
    series = _daily_series()
    out = {r.event_type: r for r in _run(spark, "wald_wolfowitz_runs").collect()}
    for et, xs in series.items():
        n, s = len(xs), sum(xs)
        signs = [1 if x * n > s else 0 for x in xs if x * n != s]
        n1, n2 = sum(signs), len(signs) - sum(signs)
        if n1 == 0 or n2 == 0 or n1 + n2 <= 1:
            assert et not in out
            continue
        r = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        e_r = 2.0 * n1 * n2 / (n1 + n2) + 1.0
        var_r = (
            2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        ) / ((n1 + n2) ** 2 * (n1 + n2 - 1))
        z = (r - e_r) / math.sqrt(var_r)
        row = out[et]
        assert (row.n_above, row.n_below, row.n_runs) == (n1, n2, r)
        assert abs(row.z_score - z) < 1e-5
        assert abs(row.p_value - 2.0 * _as_sf(abs(z))) < 1e-4


def test_runs_test_extremes():
    """Closed-form check: perfectly alternating signs give the maximum
    run count n1+n2; perfectly blocked signs give exactly 2 runs."""
    alt = [i % 2 for i in range(20)]
    blocked = [0] * 10 + [1] * 10
    runs = lambda s: 1 + sum(1 for a, b in zip(s, s[1:]) if a != b)
    assert runs(alt) == 20
    assert runs(blocked) == 2


# --------------------------------------------------------------------------
# turning_point_test
# --------------------------------------------------------------------------


def test_turning_point_matches_python(spark):
    series = _daily_series()
    out = {r.event_type: r for r in _run(spark, "turning_point_test").collect()}
    for et, xs in series.items():
        n = len(xs)
        if n <= 3:
            assert et not in out
            continue
        t = sum(
            1
            for i in range(1, n - 1)
            if (xs[i - 1] < xs[i] and xs[i + 1] < xs[i])
            or (xs[i - 1] > xs[i] and xs[i + 1] > xs[i])
        )
        e_t = 2.0 * (n - 2) / 3.0
        var_t = (16.0 * n - 29.0) / 90.0
        z = (t - e_t) / math.sqrt(var_t)
        row = out[et]
        assert (row.n_days, row.n_turning) == (n, t)
        assert abs(row.expected_turning - e_t) < 1e-6
        assert abs(row.z_score - z) < 1e-6
        assert abs(row.p_value - 2.0 * _as_sf(abs(z))) < 1e-4


def test_turning_point_tie_convention():
    """A flat neighbor is NOT a turning point (strict inequalities):
    the plateau [1, 5, 5, 1] has zero turning points under the
    convention, while [1, 5, 1] has one."""

    def count(xs):
        return sum(
            1
            for i in range(1, len(xs) - 1)
            if (xs[i - 1] < xs[i] and xs[i + 1] < xs[i])
            or (xs[i - 1] > xs[i] and xs[i + 1] > xs[i])
        )

    assert count([1, 5, 5, 1]) == 0
    assert count([1, 5, 1]) == 1
