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


# --------------------------------------------------------------------------
# jarque_bera_normality
# --------------------------------------------------------------------------


def test_jarque_bera_matches_python(spark):
    rows = duckdb.connect().execute(
        f"""
        SELECT source,
               CAST(ROUND(len(list_distinct(string_split(text, ' '))) * 1.0
                          / len(string_split(text, ' ')) * 10000) AS BIGINT)
        FROM read_parquet('{SF_SMOKE}/documents.parquet')
        """
    ).fetchall()
    by_src: dict[str, list[int]] = {}
    for src, s4 in rows:
        by_src.setdefault(src, []).append(int(s4))
    out = {
        r.source: r for r in _run(spark, "jarque_bera_normality").collect()
    }
    for src, xs in by_src.items():
        n = len(xs)
        if n < 2:
            assert src not in out
            continue
        xb = sum(xs) / n
        m2 = sum((x - xb) ** 2 for x in xs) / n
        if m2 == 0:
            assert src not in out
            continue
        m3 = sum((x - xb) ** 3 for x in xs) / n
        m4 = sum((x - xb) ** 4 for x in xs) / n
        skew = m3 / m2**1.5
        exk = m4 / m2**2 - 3.0
        jb = n / 6.0 * (skew**2 + exk**2 / 4.0)
        row = out[src]
        assert row.n_docs == n
        assert abs(row.skewness - skew) < 1e-4
        assert abs(row.ex_kurtosis - exk) < 1e-4
        assert abs(row.jb_stat - jb) < max(1e-3, 1e-5 * abs(jb))
        assert abs(row.p_value - math.exp(-jb / 2.0)) < 1e-4


def test_jarque_bera_normal_vs_skewed_construction():
    """The statistic itself: a symmetric light-tailed sample scores far
    lower than an exponential-ish skewed one of the same size."""

    def jb(xs):
        n = len(xs)
        xb = sum(xs) / n
        m2 = sum((x - xb) ** 2 for x in xs) / n
        m3 = sum((x - xb) ** 3 for x in xs) / n
        m4 = sum((x - xb) ** 4 for x in xs) / n
        s, k = m3 / m2**1.5, m4 / m2**2 - 3.0
        return n / 6.0 * (s**2 + k**2 / 4.0)

    sym = [i for i in range(-50, 51)]  # uniform: skew 0, mild kurtosis
    # geometric growth at the same n: extreme skew AND kurtosis
    skewed = [int(1.6**i) for i in range(101)]
    assert jb(skewed) > 10 * jb(sym)


# --------------------------------------------------------------------------
# bartlett_variance_test
# --------------------------------------------------------------------------


def test_bartlett_matches_python(spark):
    rows = duckdb.connect().execute(
        f"""
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT)
        FROM read_parquet('{SF_SMOKE}/events.parquet')
        """
    ).fetchall()
    by_grp: dict[str, list[int]] = {}
    for g, cent in rows:
        by_grp.setdefault(g, []).append(int(cent))
    variances = {}
    for g, xs in by_grp.items():
        n = len(xs)
        if n < 2:
            continue
        xb = sum(xs) / n
        s2 = sum((x - xb) ** 2 for x in xs) / (n - 1)
        if s2 > 0:
            variances[g] = (n, s2)
    k = len(variances)
    n_total = sum(n for n, _ in variances.values())
    sp2 = sum((n - 1) * s2 for n, s2 in variances.values()) / (n_total - k)
    t = (
        (n_total - k) * math.log(sp2)
        - sum((n - 1) * math.log(s2) for n, s2 in variances.values())
    ) / (
        1.0
        + (
            sum(1.0 / (n - 1) for n, _ in variances.values())
            - 1.0 / (n_total - k)
        )
        / (3.0 * (k - 1))
    )
    out = _run(spark, "bartlett_variance_test").collect()
    assert len(out) == k
    for row in out:
        n, s2 = variances[row.grp]
        assert row.n_g == n
        assert abs(row.variance_cents2 - s2) < max(1e-2, 1e-6 * s2)
        assert abs(row.bartlett_t - t) < max(1e-3, 1e-5 * abs(t))
        assert row.df == k - 1


# --------------------------------------------------------------------------
# mood_median_test
# --------------------------------------------------------------------------


def test_mood_median_matches_python(spark):
    rows = duckdb.connect().execute(
        f"""
        SELECT event_type,
               CAST(floor(value * 100 + 0.5) AS BIGINT)
        FROM read_parquet('{SF_SMOKE}/events.parquet')
        """
    ).fetchall()
    cents = sorted(c for _, c in rows)
    # min cent with 2*cum >= N (the operator's grid-walk median)
    n_all, cum, med = len(cents), 0, None
    from collections import Counter

    for c, cnt in sorted(Counter(cents).items()):
        cum += cnt
        if 2 * cum >= n_all:
            med = c
            break
    cells: dict[str, list[int]] = {}
    for g, c in rows:
        a = cells.setdefault(g, [0, 0])
        if c > med:
            a[0] += 1
        elif c < med:
            a[1] += 1
    k = len(cells)
    a_all = sum(v[0] for v in cells.values())
    b_all = sum(v[1] for v in cells.values())
    n_inc = a_all + b_all
    chi2 = 0.0
    for above, below in cells.values():
        rn = above + below
        ea, eb = rn * a_all / n_inc, rn * b_all / n_inc
        chi2 += (above - ea) ** 2 / ea + (below - eb) ** 2 / eb
    out = _run(spark, "mood_median_test").collect()
    assert len(out) == k
    for row in out:
        assert (row.n_above, row.n_below) == tuple(cells[row.grp])
        assert abs(row.chi2 - chi2) < max(1e-3, 1e-5 * chi2)
        assert row.df == k - 1


# --------------------------------------------------------------------------
# page_trend_test
# --------------------------------------------------------------------------


def test_page_trend_matches_python(spark):
    rows = duckdb.connect().execute(
        f"""
        SELECT date_trunc('month', o_orderdate) AS d,
               CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS lvl,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        FROM read_parquet('{SF_SMOKE}/orders.parquet')
        GROUP BY 1, 2
        """
    ).fetchall()
    blocks: dict = {}
    for d, lvl, c in rows:
        blocks.setdefault(d, {})[int(lvl)] = int(c)
    k = len({lvl for b in blocks.values() for lvl in b})
    complete = {d: b for d, b in blocks.items() if len(b) == k}
    r2_sum = {lvl: 0 for lvl in range(1, k + 1)}
    for b in complete.values():
        vals = sorted(b.values())
        for lvl, c in b.items():
            rank = vals.index(c) + 1  # min rank of the tie group
            ties = vals.count(c)
            r2_sum[lvl] += 2 * rank + ties - 1
    nb = len(complete)
    l2 = sum(lvl * r for lvl, r in r2_sum.items())
    e_l2 = nb * k * (k + 1) ** 2 / 2.0
    var_l2 = nb * (k**3 - k) ** 2 / (36.0 * (k - 1))
    z = (l2 - e_l2) / math.sqrt(var_l2)
    out = {r.priority_level: r for r in _run(spark, "page_trend_test").collect()}
    assert len(out) == k
    for lvl, row in out.items():
        assert row.r2_sum == r2_sum[lvl]
        assert row.n_blocks == nb and row.page_l2 == l2
        assert abs(row.z_score - z) < 1e-5
        p = _as_sf(z) if z >= 0 else 1.0 - _as_sf(-z)
        assert abs(row.p_one_sided - p) < 1e-4


def test_page_l_extremes():
    """Closed form: with b identical blocks ranked 1..k in the scored
    order, L = b * sum j^2 (the maximum); in the reversed order
    L = b * sum j*(k+1-j) (the minimum)."""
    k, b = 5, 7
    lmax = b * sum(j * j for j in range(1, k + 1))
    lmin = b * sum(j * (k + 1 - j) for j in range(1, k + 1))
    e_l = b * k * (k + 1) ** 2 / 4.0
    assert lmin < e_l < lmax


# --------------------------------------------------------------------------
# err_retrieval_eval
# --------------------------------------------------------------------------


def test_err_matches_python(spark):
    """Recompute ERR@k from the operator's own (grade, rank) output —
    pins the cascade recursion AND the exact-integer witness: err_num
    must equal ERR * 8^10 * 2520 computed in exact Fraction arithmetic."""
    from fractions import Fraction

    out = sorted(_run(spark, "err_retrieval_eval").collect(), key=lambda r: r.rnk)
    assert [r.rnk for r in out] == list(range(1, 11))
    err, miss = Fraction(0), Fraction(1)
    den = 8**10 * 2520
    for r in out:
        ri = Fraction(2**r.grade - 1, 8)
        assert abs(r.stop_mass - float(ri * miss)) < 1e-6
        err += ri / r.rnk * miss
        miss *= 1 - ri
        witness = err * den
        assert witness.denominator == 1
        assert r.err_num == witness.numerator, (r.rnk, r.err_num, witness)
        assert abs(r.err_at_k - float(err)) < 1e-6, (r.rnk, r.err_at_k)


def test_err_cascade_semantics():
    """The property that separates ERR from NDCG: a perfect document at
    rank 1 makes later relevant documents nearly worthless."""

    def err(grades, gmax=3):
        total, miss = 0.0, 1.0
        for i, g in enumerate(grades, 1):
            ri = (2**g - 1) / 2**gmax
            total += ri / i * miss
            miss *= 1 - ri
        return total

    front = err([3, 3, 3] + [0] * 7)
    spread = err([0, 0, 0, 0, 0, 0, 0, 3, 3, 3])
    assert front > 4 * spread
    # and the rank-1 stop probability dominates: ERR([3,0,...]) ~ 7/8
    assert abs(err([3] + [0] * 9) - 7 / 8) < 1e-12


# --------------------------------------------------------------------------
# spiegelhalter_z_calibration
# --------------------------------------------------------------------------


def test_spiegelhalter_matches_python(spark):
    rows = duckdb.connect().execute(
        f"""
        SELECT CAST(ROUND(len(list_distinct(string_split(text, ' '))) * 1.0
                          / len(string_split(text, ' ')) * 10000) AS BIGINT),
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END
        FROM read_parquet('{SF_SMOKE}/documents.parquet')
        """
    ).fetchall()
    num = sum((y * 10000 - s4) * (10000 - 2 * s4) for s4, y in rows)
    den = sum((10000 - 2 * s4) ** 2 * s4 * (10000 - s4) for s4, y in rows)
    z = num / math.sqrt(den)
    row = _run(spark, "spiegelhalter_z_calibration").collect()[0]
    assert row.n_docs == len(rows)
    assert abs(row.z_spiegelhalter - z) < 1e-5
    assert abs(row.p_value - 2.0 * _as_sf(abs(z))) < 1e-4


def test_spiegelhalter_perfectly_calibrated_construction():
    """A perfectly calibrated score (p equal to the true rate within
    each score group, balanced groups) gives z = 0 exactly when the
    group's empirical rate equals p."""
    # p=0.5 groups with exactly half positives: each pair contributes
    # (1-2p)=0 to every term -> z numerator 0 (0/0 guarded by p=0.25 rows)
    rows = [(2500, 1), (2500, 0), (2500, 0), (2500, 0)]  # p=.25, rate=.25
    num = sum((y * 10000 - s4) * (10000 - 2 * s4) for s4, y in rows)
    assert num == 0


# --------------------------------------------------------------------------
# kupiec_pof_backtest
# --------------------------------------------------------------------------


def test_kupiec_matches_python(spark):
    rows = duckdb.connect().execute(
        f"""
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
        FROM read_parquet('{SF_SMOKE}/events.parquet')
        GROUP BY 1, 2
        """
    ).fetchall()
    import datetime

    split = datetime.datetime(2024, 1, 16)
    by_type: dict[str, dict] = {}
    for et, day, cents in rows:
        if not isinstance(day, datetime.datetime):
            day = datetime.datetime.combine(day, datetime.time())
        d = by_type.setdefault(et, {"train": [], "test": []})
        d["train" if day < split else "test"].append(int(cents))
    out = {r.event_type: r for r in _run(spark, "kupiec_pof_backtest").collect()}
    p0 = 0.1
    for et, d in by_type.items():
        if not d["train"] or not d["test"]:
            assert et not in out
            continue
        xs = sorted(d["train"])
        var90 = xs[max(math.ceil(0.9 * len(xs)), 1) - 1]
        n = len(d["test"])
        x = sum(1 for c in d["test"] if c > var90)
        lr = -2.0 * (
            (n - x) * math.log(1 - p0)
            + x * math.log(p0)
            - ((n - x) * math.log(1 - x / n) if x < n else 0.0)
            - (x * math.log(x / n) if x > 0 else 0.0)
        )
        row = out[et]
        assert (row.n_test_days, row.n_breaches) == (n, x)
        assert abs(row.lr_pof - lr) < max(1e-4, 1e-6 * abs(lr))
        assert abs(row.p_value - 2.0 * _as_sf(math.sqrt(lr))) < 1e-4


def test_kupiec_boundary_cases():
    """x = 0 and x = n are legal and finite under the 0*ln(0) = 0
    convention; LR is 0 exactly when x/n = p0."""
    p0 = 0.1

    def lr(n, x):
        return -2.0 * (
            (n - x) * math.log(1 - p0)
            + x * math.log(p0)
            - ((n - x) * math.log(1 - x / n) if x < n else 0.0)
            - (x * math.log(x / n) if x > 0 else 0.0)
        )

    assert lr(100, 0) > 0 and math.isfinite(lr(100, 0))
    assert lr(100, 100) > 0 and math.isfinite(lr(100, 100))
    assert abs(lr(100, 10)) < 1e-12  # observed rate == promised rate


# --------------------------------------------------------------------------
# cramer_von_mises_drift / anderson_darling_drift
# --------------------------------------------------------------------------


def _bucketed_two_sample():
    rows = duckdb.connect().execute(
        f"""
        SELECT CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS g,
               CAST(FLOOR(value * 10) AS BIGINT) AS bucket
        FROM read_parquet('{SF_SMOKE}/events.parquet')
        WHERE event_type IN ('click', 'purchase')
        """
    ).fetchall()
    from collections import Counter

    ca = Counter(b for g, b in rows if g == 0)
    cb = Counter(b for g, b in rows if g == 1)
    return ca, cb


def test_cvm_matches_python(spark):
    ca, cb = _bucketed_two_sample()
    na, nb = sum(ca.values()), sum(cb.values())
    n = na + nb
    cum_a = cum_b = 0
    t_num = 0
    for bucket in sorted(set(ca) | set(cb)):
        cum_a += ca.get(bucket, 0)
        cum_b += cb.get(bucket, 0)
        t_k = ca.get(bucket, 0) + cb.get(bucket, 0)
        t_num += t_k * (cum_a * nb - cum_b * na) ** 2
    t = t_num / (n * n * na * nb)
    row = _run(spark, "cramer_von_mises_drift").collect()[0]
    assert (row.n_a, row.n_b) == (na, nb)
    assert abs(row.cvm_t - t) < 1e-6
    assert row.drifted == (t > 0.461)


def test_ad_matches_python(spark):
    ca, cb = _bucketed_two_sample()
    na, nb = sum(ca.values()), sum(cb.values())
    n = na + nb
    cum_a = h = 0
    s = 0.0
    for bucket in sorted(set(ca) | set(cb)):
        cum_a += ca.get(bucket, 0)
        t_k = ca.get(bucket, 0) + cb.get(bucket, 0)
        h += t_k
        if h < n:
            s += t_k * (cum_a * n - na * h) ** 2 / (h * (n - h))
    a2 = s / (na * nb)
    row = _run(spark, "anderson_darling_drift").collect()[0]
    assert (row.n_a, row.n_b) == (na, nb)
    assert abs(row.ad_a2 - a2) < max(1e-5, 1e-8 * a2)
    assert row.drifted == (a2 > 2.492)


def test_drift_quartet_sensitivity_profiles():
    """The reason all four drift tests ship: a TAIL-ONLY shift moves AD
    proportionally far more than CvM. Constructed grids, pure Python."""

    def stats(ca, cb):
        na, nb = sum(ca.values()), sum(cb.values())
        n = na + nb
        cum_a = cum_b = h = 0
        t_num, ad = 0, 0.0
        for bucket in sorted(set(ca) | set(cb)):
            cum_a += ca.get(bucket, 0)
            cum_b += cb.get(bucket, 0)
            t_k = ca.get(bucket, 0) + cb.get(bucket, 0)
            h += t_k
            t_num += t_k * (cum_a * nb - cum_b * na) ** 2
            if h < n:
                ad += t_k * (cum_a * n - na * h) ** 2 / (h * (n - h))
        return t_num / (n * n * na * nb), ad / (na * nb)

    base = {i: 100 for i in range(10)}
    # tail-only drift: sample b moves 3% of mass from bucket 9 to a new
    # extreme bucket 30
    tail = dict(base)
    tail[9] = 70
    tail[30] = 30
    # center drift of the same mass: bucket 4 -> 5
    center = dict(base)
    center[4] = 70
    center[5] = 130
    cvm_tail, ad_tail = stats(base, tail)
    cvm_center, ad_center = stats(base, center)
    # AD amplifies the tail case relative to CvM
    assert ad_tail / ad_center > 2.0 * (cvm_tail / cvm_center)


# --------------------------------------------------------------------------
# poisson_dispersion_test
# --------------------------------------------------------------------------


def test_poisson_dispersion_matches_python(spark):
    rows = duckdb.connect().execute(
        f"""
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT)
        FROM read_parquet('{SF_SMOKE}/events.parquet')
        GROUP BY 1, 2
        """
    ).fetchall()
    by_type: dict[str, list[int]] = {}
    for et, _, x in rows:
        by_type.setdefault(et, []).append(int(x))
    out = {r.event_type: r for r in _run(spark, "poisson_dispersion_test").collect()}
    for et, xs in by_type.items():
        n, s = len(xs), sum(xs)
        if n < 2 or s == 0:
            assert et not in out
            continue
        ss = sum(x * x for x in xs)
        d = (n * ss - s * s) / s
        vmr = (n * ss - s * s) / (n * s) * n / (n - 1)
        row = out[et]
        assert (row.n_days, row.n_events) == (n, s)
        assert abs(row.dispersion_chi2 - d) < max(1e-4, 1e-7 * d)
        assert abs(row.vmr - vmr) < 1e-4
        assert row.df == n - 1


def test_poisson_dispersion_closed_forms():
    """A perfectly regular series (constant counts) has D = 0; a maximally
    bursty one (all events on one day) has D = s*(n-1)/... specifically
    D = (n*s^2 - s^2)/s = s*(n-1)."""
    xs = [7] * 30
    n, s, ss = len(xs), sum(xs), sum(x * x for x in xs)
    assert n * ss - s * s == 0
    burst = [0] * 29 + [100]
    n, s, ss = len(burst), sum(burst), sum(x * x for x in burst)
    assert (n * ss - s * s) / s == s * (n - 1) / 1  # == 2900


# --------------------------------------------------------------------------
# seasonal_mann_kendall
# --------------------------------------------------------------------------


def test_seasonal_mk_matches_python(spark):
    rows = duckdb.connect().execute(
        f"""
        SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS lvl,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
               CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        FROM read_parquet('{SF_SMOKE}/orders.parquet')
        GROUP BY 1, 2, 3
        """
    ).fetchall()
    series: dict[int, dict[int, list[tuple[int, int]]]] = {}
    for lvl, yr, mo, c in rows:
        series.setdefault(int(lvl), {}).setdefault(int(mo), []).append(
            (int(yr), int(c))
        )
    out = {
        r.priority_level: r
        for r in _run(spark, "seasonal_mann_kendall").collect()
    }
    from collections import Counter

    for lvl, months in series.items():
        s_tot, var_tot, n_pts = 0, 0.0, 0
        for mo, pts in months.items():
            pts.sort()
            vals = [c for _, c in pts]
            n = len(vals)
            n_pts += n
            for i in range(n):
                for j in range(i + 1, n):
                    s_tot += (vals[j] > vals[i]) - (vals[j] < vals[i])
            ties = Counter(vals)
            tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
            var_tot += (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
        z = (
            (s_tot - 1) / math.sqrt(var_tot)
            if s_tot > 0
            else (s_tot + 1) / math.sqrt(var_tot)
            if s_tot < 0
            else 0.0
        )
        row = out[lvl]
        assert row.smk_s == s_tot
        assert row.n_points == n_pts and row.n_seasons == len(months)
        assert abs(row.var_s - var_tot) < 1e-4
        assert abs(row.z_score - z) < 1e-5
        assert abs(row.p_value - 2.0 * _as_sf(abs(z))) < 1e-4


def test_seasonal_mk_excludes_cross_season_pairs():
    """The defining property: a pure seasonal cycle with NO cross-year
    trend yields S = 0 under the seasonal form, while plain MK on the
    same series sees a huge |S| from cross-season comparisons."""
    # 3 years x 4 seasons, strong cycle, zero trend
    seasons = {m: [(y, 100 * m) for y in range(3)] for m in range(1, 5)}
    s_seasonal = 0
    for pts in seasons.values():
        vals = [c for _, c in pts]
        for i in range(len(vals)):
            for j in range(i + 1, len(vals)):
                s_seasonal += (vals[j] > vals[i]) - (vals[j] < vals[i])
    assert s_seasonal == 0
    flat = [100 * m for _ in range(3) for m in range(1, 5)]
    s_plain = sum(
        (flat[j] > flat[i]) - (flat[j] < flat[i])
        for i in range(len(flat))
        for j in range(i + 1, len(flat))
    )
    assert abs(s_plain) > 0  # the cycle alone fabricates comparisons


# --------------------------------------------------------------------------
# theil_inequality_decomposition
# --------------------------------------------------------------------------


def test_theil_matches_python_and_decomposes(spark):
    rows = duckdb.connect().execute(
        f"""
        SELECT source, CAST(n_chars AS BIGINT)
        FROM read_parquet('{SF_SMOKE}/documents.parquet')
        WHERE n_chars > 0
        """
    ).fetchall()
    by_src: dict[str, list[int]] = {}
    for src, x in rows:
        by_src.setdefault(src, []).append(int(x))
    n = sum(len(v) for v in by_src.values())
    s = sum(sum(v) for v in by_src.values())
    mu = s / n
    theil_total = sum(
        x * math.log(x) for v in by_src.values() for x in v
    ) / s - math.log(mu)
    between = within = 0.0
    per_src = {}
    for src, v in by_src.items():
        sg, ng = sum(v), len(v)
        mug = sg / ng
        tg = sum(x * math.log(x) for x in v) / sg - math.log(mug)
        share = sg / s
        per_src[src] = (ng, sg, tg, share * math.log(mug / mu), share * tg)
        between += share * math.log(mug / mu)
        within += share * tg
    # Theil's additive decomposition identity
    assert abs(theil_total - (between + within)) < 1e-12
    out = {
        r.source: r
        for r in _run(spark, "theil_inequality_decomposition").collect()
    }
    for src, (ng, sg, tg, bt, wt) in per_src.items():
        row = out[src]
        assert (row.n_docs, row.total_chars) == (ng, sg)
        assert abs(row.theil_within_source - tg) < 1e-4
        assert abs(row.between_contribution - bt) < 1e-4
        assert abs(row.within_contribution - wt) < 1e-4
        assert abs(row.theil_total - theil_total) < 1e-4
        assert abs(row.theil_between - between) < 1e-4
        assert abs(row.theil_within - within) < 1e-4


# --------------------------------------------------------------------------
# holm_bonferroni_stepdown
# --------------------------------------------------------------------------


def test_holm_stepdown_properties(spark):
    """Holm invariants against the operator output: p_adj is monotone
    non-decreasing in rank order, >= raw p, <= min(1, m*p) (Bonferroni),
    and equals max_j<=i (m-j+1)p_(j) recomputed from the raw p column."""
    out = _run(spark, "holm_bonferroni_stepdown").collect()
    m = len(out)
    rows = sorted(out, key=lambda r: (r.p_value, r.source))
    run_max, prev_adj = 0.0, 0.0
    for i, r in enumerate(rows, 1):
        run_max = max(run_max, r.p_value * (m - i + 1))
        expect = min(run_max, 1.0)
        assert abs(r.p_adj - expect) < 2e-5, (r.source, r.p_adj, expect)
        assert r.p_adj >= r.p_value - 1e-9
        assert r.p_adj <= min(1.0, m * r.p_value) + 2e-5
        assert r.p_adj >= prev_adj - 1e-9  # monotone step-down
        prev_adj = r.p_adj
        assert r.significant == (r.p_adj < 0.05)


def test_holm_vs_bh_ordering_construction():
    """On any p family: Holm adjustments are >= BH adjustments (FWER
    control is stricter than FDR control)."""
    ps = [0.001, 0.004, 0.012, 0.02, 0.09, 0.3, 0.7]
    m = len(ps)
    holm, run = [], 0.0
    for i, p in enumerate(ps, 1):
        run = max(run, p * (m - i + 1))
        holm.append(min(run, 1.0))
    bh, best = [0.0] * m, 1.0
    for i in range(m, 0, -1):
        best = min(best, ps[i - 1] * m / i)
        bh[i - 1] = best
    assert all(h >= b - 1e-12 for h, b in zip(holm, bh))


# --------------------------------------------------------------------------
# funnel_conformance_sequences
# --------------------------------------------------------------------------


def test_funnel_conformance_matches_python(spark):
    rows = duckdb.connect().execute(
        f"""
        SELECT user_id, substr(event_type, 1, 1) AS letter, MIN(ts)
        FROM read_parquet('{SF_SMOKE}/events.parquet')
        WHERE event_type IN ('signup', 'view', 'click', 'purchase')
        GROUP BY 1, 2
        """
    ).fetchall()
    by_user: dict[int, list] = {}
    for uid, letter, ts in rows:
        by_user.setdefault(uid, []).append((ts, letter))

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    from collections import Counter

    seqs = Counter(
        "".join(l for _, l in sorted(pts)) for pts in by_user.values()
    )
    n = sum(seqs.values())
    out = {r.first_seq: r for r in _run(spark, "funnel_conformance_sequences").collect()}
    assert set(out) == set(seqs)
    for seq, cnt in seqs.items():
        row = out[seq]
        assert row.n_users == cnt
        assert row.edit_distance == lev(seq, "svcp"), seq
        assert abs(row.user_share - cnt / n) < 1e-6


def test_funnel_conformance_bounded_output():
    """First-occurrence sequences are permutations of subsets of 4
    letters: at most sum_k P(4,k) = 65 variants at ANY corpus size."""
    total = sum(
        math.factorial(4) // math.factorial(4 - k) for k in range(0, 5)
    )
    assert total == 65


# --------------------------------------------------------------------------
# temperature_scaling_fit
# --------------------------------------------------------------------------


def test_temperature_scaling_matches_python(spark):
    rows = duckdb.connect().execute(
        f"""
        SELECT CAST(ROUND(len(list_distinct(string_split(text, ' '))) * 1.0
                          / len(string_split(text, ' ')) * 10000) AS BIGINT),
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END
        FROM read_parquet('{SF_SMOKE}/documents.parquet')
        """
    ).fetchall()
    pts = [(s4, y) for s4, y in rows if 0 < s4 < 10000]

    def newton(iters=6):
        t = 1.0
        for _ in range(iters):
            g = h = 0.0
            for s4, y in pts:
                z = math.log(s4 / (10000 - s4))
                sg = 1.0 / (1.0 + math.exp(-z / t))
                g += (sg - y) * (-z) / (t * t)
                h += sg * (1 - sg) * z * z / t**4 + (sg - y) * 2 * z / t**3
            t = max(t - g / h, 0.25)
        return t

    def nll(t):
        s = 0.0
        for s4, y in pts:
            u = math.log(s4 / (10000 - s4)) / t
            s += max(u, 0.0) - y * u + math.log(1.0 + math.exp(-abs(u)))
        return s / len(pts)

    t_hat = newton()
    row = _run(spark, "temperature_scaling_fit").collect()[0]
    assert row.n_docs == len(pts)
    assert abs(row.t_hat - t_hat) < 1e-4
    assert abs(row.nll_per_doc_t1 - nll(1.0)) < 1e-4
    assert abs(row.nll_per_doc_that - nll(t_hat)) < 1e-4
    # the fitted temperature can only improve (or match) the NLL
    assert row.nll_per_doc_that <= row.nll_per_doc_t1 + 1e-9


def test_temperature_scaling_recovers_known_temperature():
    """Construction: scores produced by sigmoid(z/T*) with labels drawn
    to match sigmoid(z) exactly (deterministic fractional counts) are
    re-calibrated to T ~ T*."""
    # grid of logits, 'counts' via weights: y=1 mass sigma(z), y=0 rest
    zs = [(-6 + 0.5 * i) for i in range(25)]
    T_STAR = 2.0

    def fit(iters=40):
        t = 1.0
        for _ in range(iters):
            g = h = 0.0
            for z in zs:
                # observed z' = z * T_STAR (over-confident logits)
                zz = z * T_STAR
                p1 = 1.0 / (1.0 + math.exp(-z))  # true label mass
                for y, w in ((1, p1), (0, 1 - p1)):
                    sg = 1.0 / (1.0 + math.exp(-zz / t))
                    g += w * (sg - y) * (-zz) / (t * t)
                    h += w * (
                        sg * (1 - sg) * zz * zz / t**4
                        + (sg - y) * 2 * zz / t**3
                    )
            t = max(t - g / h, 0.25)
        return t

    assert abs(fit() - T_STAR) < 1e-6


# --------------------------------------------------------------------------
# source_lm_divergence_matrix
# --------------------------------------------------------------------------


def test_lm_divergence_matches_python(spark):
    rows = duckdb.connect().execute(
        f"""
        SELECT source, tok, CAST(COUNT(*) AS BIGINT)
        FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM read_parquet('{SF_SMOKE}/documents.parquet'))
        GROUP BY source, tok
        """
    ).fetchall()
    cnts: dict[str, dict[str, int]] = {}
    for src, tok, c in rows:
        cnts.setdefault(src, {})[tok] = int(c)
    totals = {s: sum(d.values()) for s, d in cnts.items()}
    v = len({t for d in cnts.values() for t in d})
    out = {
        (r.source_a, r.source_b): r
        for r in _run(spark, "source_lm_divergence_matrix").collect()
    }
    srcs = sorted(cnts)
    assert len(out) == len(srcs) ** 2
    import random

    random.seed(7)
    for a in srcs:
        h_self = -sum(
            (c / totals[a]) * math.log(c / totals[a]) for c in cnts[a].values()
        )
        for b_ in random.sample(srcs, 4):
            h_cross = -sum(
                (c / totals[a])
                * math.log((cnts[b_].get(tok, 0) + 1.0) / (totals[b_] + v))
                for tok, c in cnts[a].items()
            )
            row = out[(a, b_)]
            assert row.n_tokens_a == totals[a]
            assert abs(row.cross_entropy - h_cross) < 1e-4
            assert abs(row.self_entropy_a - h_self) < 1e-4
            assert abs(row.kl_a_to_b - (h_cross - h_self)) < 1e-4


def test_lm_divergence_gibbs_inequality(spark):
    """Information-theoretic invariants on the operator output: KL(a||b)
    is minimized at b = a for every row-source (Gibbs' inequality up to
    the smoothing floor), and the matrix is genuinely asymmetric."""
    out = _run(spark, "source_lm_divergence_matrix").collect()
    by_a: dict[str, dict[str, float]] = {}
    for r in out:
        by_a.setdefault(r.source_a, {})[r.source_b] = r.kl_a_to_b
    asym = 0
    for a, row in by_a.items():
        # the diagonal must be the row minimum (smoothing adds the same
        # +1/(n+V) floor everywhere, preserving the argmin)
        assert row[a] == min(row.values()), a
        for b_, v in row.items():
            if abs(v - by_a[b_][a]) > 1e-6:
                asym += 1
    assert asym > 0  # directional: KL(a||b) != KL(b||a) somewhere
