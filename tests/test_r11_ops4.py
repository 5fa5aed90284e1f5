"""Round-11 operators, batch 4: delete-group jackknife over sources —
semantics pinned against a pure-Python rederivation (fixture + synthetic
constructions) and the Tukey pseudo-value identity."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE
from weather_stream_processor_spark.registry import all_queries


def _run(spark, name, sf=SF_SMOKE):
    return all_queries()[name].builder(spark, str(sf)).collect()


def _write_docs(tmp_path, sources_texts):
    n = len(sources_texts)
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(1, n + 1)),
            "text": [t for _, t in sources_texts],
            "lang": ["en"] * n,
            "source": [s for s, _ in sources_texts],
            "n_chars": pd.array([16] * n, dtype="Int64"),
        }
    )
    duckdb.connect().execute(
        f"COPY (SELECT * FROM pdf) TO '{tmp_path}/documents.parquet' "
        "(FORMAT PARQUET)"
    )


def _py_jackknife(groups):
    """groups: {source: (n_i, s_i)} with s_i the 1e4-lifted integer score
    sum — mirror the operator's exact dyadic lifts."""
    n = sum(ni for ni, _ in groups.values())
    s = sum(si for _, si in groups.values())
    g = len(groups)
    theta_full = s / n / 1e4
    loo = {
        src: (s - si) / (n - ni) / 1e4
        for src, (ni, si) in groups.items()
        if n - ni >= 1
    }
    stq = sum(math.floor(t * 1e12 + 0.5) for t in loo.values())
    mean_loo = (stq / g) / 1e12
    sdq = sum(
        math.floor((t - mean_loo) ** 2 * 1e12 + 0.5) for t in loo.values()
    )
    se = math.sqrt((g - 1) / g * (sdq / 1e12))
    bias = (g - 1) * ((stq / g) / 1e12 - theta_full)
    pseudo = {src: g * theta_full - (g - 1) * t for src, t in loo.items()}
    return theta_full, loo, pseudo, se, bias


def _fixture_groups():
    """Per-source (n_i, s_i) from the fixture with the operator's lift."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    rows = con.execute(
        """
        SELECT source, COUNT(*),
               SUM(CAST(ROUND(
                   ROUND(len(list_distinct(string_split(text, ' '))) * 1.0
                         / len(string_split(text, ' ')), 4) * 10000
               ) AS BIGINT))
        FROM documents GROUP BY source
        """
    ).fetchall()
    return {src: (ni, si) for src, ni, si in rows}


def test_jackknife_matches_python_rederivation(spark):
    got = {r["source"]: r.asDict() for r in _run(spark, "jackknife_source_se")}
    groups = _fixture_groups()
    theta_full, loo, pseudo, se, bias = _py_jackknife(groups)
    assert set(got) == set(loo)
    for src, row in got.items():
        assert row["n_docs"] == groups[src][0]
        assert row["theta_full"] == pytest.approx(theta_full, abs=1e-6)
        assert row["theta_loo"] == pytest.approx(loo[src], abs=1e-6)
        assert row["pseudo_value"] == pytest.approx(pseudo[src], abs=1e-5)
        assert row["jack_se"] == pytest.approx(se, abs=1e-7)
        assert row["jack_bias"] == pytest.approx(bias, abs=1e-7)


def test_jackknife_pseudo_value_identity(spark):
    """g*theta_full - (g-1)*theta_loo row by row, and the pseudo-value
    mean telescopes back to theta_full - jack_bias/(g-1)*(g-1) form:
    mean(pseudo) = g*theta - (g-1)*mean_loo = theta - bias."""
    rows = [r.asDict() for r in _run(spark, "jackknife_source_se")]
    g = len(rows)
    theta = rows[0]["theta_full"]
    for r in rows:
        assert r["pseudo_value"] == pytest.approx(
            g * theta - (g - 1) * r["theta_loo"], abs=2e-4
        )
    mean_pseudo = sum(r["pseudo_value"] for r in rows) / g
    assert mean_pseudo == pytest.approx(
        theta - rows[0]["jack_bias"], abs=2e-4
    )


def test_jackknife_single_source_excluded(spark, tmp_path):
    _write_docs(str(tmp_path), [("only", "alpha beta gamma")] * 5)
    assert _run(spark, "jackknife_source_se", tmp_path) == []


def test_jackknife_synthetic_two_point(spark, tmp_path):
    """Two sources with exactly-representable scores 1.0 and 0.25:
    closed-form jackknife checked to the digit."""
    rows = (
        [("pure", "a b c d")] * 3       # score 1.0
        + [("dupey", "a a a a")] * 1    # score 0.25
    )
    _write_docs(str(tmp_path), rows)
    got = {
        r["source"]: r.asDict()
        for r in _run(spark, "jackknife_source_se", tmp_path)
    }
    groups = {"pure": (3, 30000), "dupey": (1, 2500)}
    theta_full, loo, pseudo, se, bias = _py_jackknife(groups)
    assert theta_full == pytest.approx(0.8125)
    assert loo["pure"] == pytest.approx(0.25)   # delete pure -> only dupey
    assert loo["dupey"] == pytest.approx(1.0)   # delete dupey -> only pure
    for src in groups:
        assert got[src]["theta_loo"] == pytest.approx(loo[src], abs=1e-6)
        assert got[src]["jack_se"] == pytest.approx(se, abs=1e-7)
        assert got[src]["jack_bias"] == pytest.approx(bias, abs=1e-7)
        assert got[src]["pseudo_value"] == pytest.approx(
            pseudo[src], abs=1e-5
        )


# --------------------------------------------------------------------------
# weibull_survival_fit
# --------------------------------------------------------------------------


def _py_weibull_from_lives(lives):
    """lives: [(lifetime_days, churned)] -> operator output dict, via an
    independent KM + probability-plot OLS implementation."""
    n = len(lives)
    grid = {}
    for t, c in lives:
        d, e = grid.get(t, (0, 0))
        grid[t] = (d + c, e + 1)
    at_risk, pts, surv = n, [], 1.0
    for t in sorted(grid):
        d, e = grid[t]
        surv *= 1.0 - d / at_risk
        s6 = round(surv, 6)
        if t > 0 and d > 0 and 0.0 < s6 < 1.0:
            pts.append((math.log(t), math.log(-math.log(s6))))
        at_risk -= e
    m = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    syy = sum(y * y for _, y in pts)
    slope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    icept = (sy - slope * sx) / m
    return {
        "n_points": m,
        "shape_k": slope,
        "scale_days": math.exp(-icept / slope),
        "r2": (m * sxy - sx * sy) ** 2
        / ((m * sxx - sx * sx) * (m * syy - sy * sy)),
        "s180_weibull": math.exp(-math.exp(icept + slope * math.log(180.0))),
        "s365_weibull": math.exp(-math.exp(icept + slope * math.log(365.0))),
    }


def _fixture_lives():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet'"
    )
    return con.execute(
        """
        WITH horizon AS (SELECT MAX(o_orderdate) AS h FROM orders)
        SELECT CAST(date_diff('day', MIN(o_orderdate), MAX(o_orderdate))
                    AS BIGINT),
               CASE WHEN date_diff('day', MAX(o_orderdate), ho.h) > 90
                    THEN 1 ELSE 0 END
        FROM orders CROSS JOIN horizon ho
        GROUP BY o_custkey, ho.h
        """
    ).fetchall()


def test_weibull_matches_python_rederivation(spark):
    (row,) = _run(spark, "weibull_survival_fit")
    exp = _py_weibull_from_lives(_fixture_lives())
    assert row["n_points"] == exp["n_points"]
    for k in ("shape_k", "scale_days", "r2", "s180_weibull", "s365_weibull"):
        assert row[k] == pytest.approx(exp[k], abs=2e-5), k


def _write_orders(tmp_path, custs):
    """custs: [(custkey, first_day, last_day)] with day 0 = 2024-01-01;
    two orders per customer pin (first, last)."""
    import datetime

    base = datetime.date(2024, 1, 1)
    rows = []
    for ck, a, b in custs:
        rows.append((ck, base + datetime.timedelta(days=a)))
        rows.append((ck, base + datetime.timedelta(days=b)))
    pdf = pd.DataFrame(rows, columns=["o_custkey", "o_orderdate"])
    duckdb.connect().execute(
        f"COPY (SELECT o_custkey, CAST(o_orderdate AS DATE) AS o_orderdate "
        f"FROM pdf) TO '{tmp_path}/orders.parquet' (FORMAT PARQUET)"
    )


def test_weibull_recovers_planted_shape(spark, tmp_path):
    """Plant S(t) ~ exp(-(t/100)^2) on a 2000-customer cohort (all
    churned; one sentinel far in the future sets the horizon and is
    censored): the fit must recover shape ~2, scale ~100, r2 ~1."""
    n = 2000
    ts = [25, 50, 75, 100, 125, 150]
    cum = [round(n * (1.0 - math.exp(-((t / 100.0) ** 2)))) for t in ts]
    custs, ck, prev = [], 1, 0
    for t, c in zip(ts, cum):
        for _ in range(c - prev):
            custs.append((ck, 0, t))
            ck += 1
        prev = c
    # survivors: last order within the 90-day churn horizon of the
    # anchor, so they are CENSORED (not a 7th event time)
    for _ in range(n - prev):
        custs.append((ck, 0, 340))
        ck += 1
    custs.append((ck, 0, 400))  # sentinel: horizon anchor, censored
    _write_orders(str(tmp_path), custs)
    (row,) = _run(spark, "weibull_survival_fit", tmp_path)
    assert row["n_points"] == len(ts)
    assert row["shape_k"] == pytest.approx(2.0, abs=0.05)
    assert row["scale_days"] == pytest.approx(100.0, abs=2.0)
    assert row["r2"] > 0.999
    assert 0.0 < row["s365_weibull"] < row["s180_weibull"] < 1.0


def test_weibull_single_event_time_excluded(spark, tmp_path):
    """One distinct event time -> m = 1 -> zero x-variance: no fit row
    (the mirrored degenerate-fit guard)."""
    custs = [(i, 0, 50) for i in range(1, 40)]
    custs.append((99, 300, 400))  # horizon sentinel (censored)
    _write_orders(str(tmp_path), custs)
    assert _run(spark, "weibull_survival_fit", tmp_path) == []


# --------------------------------------------------------------------------
# crps_ensemble_backtest
# --------------------------------------------------------------------------


def _write_events(tmp_path, day_values, event_type="purchase"):
    """day_values: [(day_offset_from_2024_01_01, value or [values])]."""
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


def _py_crps(train_cents, test_cents):
    """Empirical-ensemble CRPS decomposition, independent O(N*M) form."""
    m, n = len(train_cents), len(test_cents)
    tot_abs = sum(abs(y - x) for y in test_cents for x in train_cents)
    pair = sum(
        abs(a - b) for a in train_cents for b in train_cents
    )  # includes both orders = 2 * sum_{i<j}
    abs_term = tot_abs / (n * m) / 100.0
    spread_term = pair / (2.0 * m * m) / 100.0
    return abs_term - spread_term, abs_term, spread_term


def test_crps_matches_python_rederivation(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'"
    )
    daily = con.execute(
        """
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
        FROM events GROUP BY 1, 2
        """
    ).fetchall()
    split = pd.Timestamp("2024-01-16")
    tr, te = {}, {}
    for et, day, cents in daily:
        (tr if pd.Timestamp(day) < split else te).setdefault(et, []).append(
            cents
        )
    got = {r["event_type"]: r.asDict() for r in _run(spark, "crps_ensemble_backtest")}
    expect_types = {et for et in tr if et in te}
    assert set(got) == expect_types
    for et in expect_types:
        crps, abs_t, spr_t = _py_crps(tr[et], te[et])
        row = got[et]
        assert row["n_ens"] == len(tr[et])
        assert row["n_test_days"] == len(te[et])
        assert row["crps"] == pytest.approx(crps, abs=2e-4), et
        assert row["abs_term"] == pytest.approx(abs_t, abs=1e-4)
        assert row["spread_term"] == pytest.approx(spr_t, abs=1e-4)
        assert row["crps"] >= 0


def test_crps_point_ensemble_is_mae(spark, tmp_path):
    """A single training day makes the ensemble a POINT forecast:
    spread term 0, CRPS = plain MAE — the degenerate identity that
    pins the decomposition."""
    # train: one day at 100.0; test: days at 110.0 and 90.0 -> MAE 10
    _write_events(
        str(tmp_path), [(0, 100.0), (20, 110.0), (21, 90.0)]
    )
    (row,) = _run(spark, "crps_ensemble_backtest", tmp_path)
    assert row["n_ens"] == 1
    assert row["n_test_days"] == 2
    assert row["spread_term"] == pytest.approx(0.0)
    assert row["crps"] == pytest.approx(10.0, abs=1e-4)
    assert row["abs_term"] == pytest.approx(10.0, abs=1e-4)


def test_crps_sharp_beats_vague_on_centered_truth(spark, tmp_path):
    """Two ensembles with the same mean 100: tight {99,100,101} vs
    vague {60,100,140}; truth at 100 every test day. The proper score
    must prefer the sharp one."""
    tight = [(d, [99.0, 100.0, 101.0][d % 3]) for d in range(0, 9)]
    vague = [(d, [60.0, 100.0, 140.0][d % 3]) for d in range(0, 9)]
    tests = [(d, 100.0) for d in range(20, 26)]
    _write_events(str(tmp_path), tight + tests)
    (sharp_row,) = _run(spark, "crps_ensemble_backtest", tmp_path)
    _write_events(str(tmp_path), vague + tests)
    (vague_row,) = _run(spark, "crps_ensemble_backtest", tmp_path)
    assert sharp_row["crps"] < vague_row["crps"]
    assert sharp_row["spread_term"] < vague_row["spread_term"]


# --------------------------------------------------------------------------
# subclassification_ate
# --------------------------------------------------------------------------


def _write_user_events(tmp_path, rows):
    """rows: [(user_id, day_offset, event_type, value)]."""
    n = len(rows)
    pdf = pd.DataFrame(
        {
            "event_id": list(range(1, n + 1)),
            "ts": [
                pd.Timestamp("2024-01-01") + pd.Timedelta(days=d, hours=1)
                for _, d, _, _ in rows
            ],
            "user_id": pd.array([u for u, _, _, _ in rows], dtype="Int64"),
            "event_type": [t for _, _, t, _ in rows],
            "value": [v for _, _, _, v in rows],
            "props": ["{}"] * n,
        }
    )
    duckdb.connect().execute(
        f"COPY (SELECT * FROM pdf) TO '{tmp_path}/events.parquet' "
        "(FORMAT PARQUET)"
    )


def _py_subclass(users):
    """users: [(pre_n, pre_clicks, post_cents)] -> operator row dict,
    independent implementation of the quantile/stratify/pool pipeline."""
    n = len(users)

    def qdisc(vals, q):
        s = sorted(vals)
        return s[max(math.ceil(q * n), 1) - 1]

    q50 = qdisc([c for _, c, _ in users], 0.5)
    b = [qdisc([e for e, _, _ in users], q) for q in (0.25, 0.5, 0.75)]
    cells = {}
    for e, c, y in users:
        t = 1 if c >= q50 else 0
        s = sum(1 for bk in b if e >= bk)
        kk = cells.setdefault(s, {0: [0, 0], 1: [0, 0]})
        kk[t][0] += 1
        kk[t][1] += y
    kept = {
        s: v
        for s, v in cells.items()
        if v[0][0] >= 1 and v[1][0] >= 1
    }
    n_treat = sum(v[1][0] for v in kept.values())
    n_control = sum(v[0][0] for v in kept.values())
    st = sum(v[1][1] for v in kept.values())
    sc = sum(v[0][1] for v in kept.values())
    n_kept = n_treat + n_control
    naive = (st / n_treat - sc / n_control) / 100.0
    wdiff = sum(
        (v[0][0] + v[1][0]) * (v[1][1] / v[1][0] - v[0][1] / v[0][0])
        for v in kept.values()
    )
    adj = wdiff / n_kept / 100.0
    return {
        "n_strata": len(kept),
        "n_treat": n_treat,
        "n_control": n_control,
        "naive_diff": naive,
        "subclass_ate": adj,
        "confounding_bias": naive - adj,
    }


def _fixture_users():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'"
    )
    return con.execute(
        """
        WITH span AS (SELECT CAST(MIN(epoch_us(ts)) AS BIGINT) lo,
                             CAST(MAX(epoch_us(ts)) AS BIGINT) hi
                      FROM events)
        SELECT CAST(SUM(CASE WHEN 2*epoch_us(ts) < lo+hi THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(SUM(CASE WHEN 2*epoch_us(ts) < lo+hi
                              AND event_type='click' THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(SUM(CASE WHEN 2*epoch_us(ts) >= lo+hi
                              AND event_type='purchase'
                             THEN CAST(ROUND(value*100) AS BIGINT)
                             ELSE 0 END) AS BIGINT)
        FROM events CROSS JOIN span GROUP BY user_id
        """
    ).fetchall()


def test_subclass_matches_python_rederivation(spark):
    (row,) = _run(spark, "subclassification_ate")
    exp = _py_subclass(_fixture_users())
    assert row["n_strata"] == exp["n_strata"]
    assert row["n_treat"] == exp["n_treat"]
    assert row["n_control"] == exp["n_control"]
    for k in ("naive_diff", "subclass_ate", "confounding_bias"):
        assert row[k] == pytest.approx(exp[k], abs=2e-4), k


def test_subclass_removes_planted_confounding(spark, tmp_path):
    """Within every stratum the exposure has ZERO effect, but heavy
    users both click more and buy more: naive_diff must be visibly
    positive while subclass_ate is exactly 0 — the definitional
    deconfounding check."""
    rows = []

    def add_user(u, pre_n, pre_clicks, cents):
        for i in range(pre_clicks):
            rows.append((u, i % 10, "click", 1.0))
        for i in range(pre_n - pre_clicks):
            rows.append((u, i % 10, "view", 1.0))
        rows.append((u, 25, "purchase", cents / 100.0))

    # stratum L (pre_n=4): outcome 100 regardless of arm
    add_user(1, 4, 1, 10000)
    add_user(2, 4, 1, 10000)
    add_user(3, 4, 3, 10000)
    add_user(4, 4, 3, 10000)
    # stratum H (pre_n=8): outcome 300 regardless of arm
    add_user(5, 8, 1, 30000)
    add_user(6, 8, 3, 30000)
    add_user(7, 8, 3, 30000)
    add_user(8, 8, 3, 30000)
    _write_user_events(str(tmp_path), rows)
    (row,) = _run(spark, "subclassification_ate", tmp_path)
    # treatment = clicks >= median(=3); strata split 4s from 8s
    assert row["n_strata"] == 2
    assert row["naive_diff"] > 50.0
    assert row["subclass_ate"] == pytest.approx(0.0, abs=1e-9)
    assert row["confounding_bias"] == pytest.approx(
        row["naive_diff"], abs=1e-9
    )


def test_subclass_single_arm_strata_dropped(spark, tmp_path):
    """A stratum where everyone is treated violates positivity and
    must be excluded from BOTH the ATE and the pooled counts."""
    rows = []

    def add_user(u, pre_n, pre_clicks, cents):
        for i in range(pre_clicks):
            rows.append((u, i % 10, "click", 1.0))
        for i in range(pre_n - pre_clicks):
            rows.append((u, i % 10, "view", 1.0))
        rows.append((u, 25, "purchase", cents / 100.0))

    # mixed stratum (pre_n=8): both arms
    add_user(1, 8, 1, 10000)
    add_user(2, 8, 5, 20000)
    add_user(3, 8, 1, 10000)
    add_user(4, 8, 5, 20000)
    # all-treated stratum (pre_n=16): must be dropped
    add_user(5, 16, 5, 90000)
    add_user(6, 16, 5, 90000)
    add_user(7, 16, 5, 90000)
    add_user(8, 16, 5, 90000)
    _write_user_events(str(tmp_path), rows)
    (row,) = _run(spark, "subclassification_ate", tmp_path)
    exp = _py_subclass(
        [(8, 1, 10000), (8, 5, 20000), (8, 1, 10000), (8, 5, 20000),
         (16, 5, 90000), (16, 5, 90000), (16, 5, 90000), (16, 5, 90000)]
    )
    assert row["n_strata"] == exp["n_strata"] == 1
    assert row["n_treat"] == 2 and row["n_control"] == 2
    assert row["subclass_ate"] == pytest.approx(100.0, abs=1e-9)


# --------------------------------------------------------------------------
# rouge_n_generation_eval
# --------------------------------------------------------------------------


def _py_rouge(texts, max_n=2, drop=5):
    """Independent ROUGE-N macro implementation with the 1e9 lifts."""
    from collections import Counter

    agg = {n: [0, 0, 0, 0] for n in range(1, max_n + 1)}  # rq,pq,fq,docs
    for text in texts:
        ref = text.split(" ")
        cand = [t for i, t in enumerate(ref) if (i + 1) % drop != 0]
        for n in range(1, max_n + 1):
            rg = Counter(
                " ".join(ref[i : i + n]) for i in range(len(ref) - n + 1)
            )
            cg = Counter(
                " ".join(cand[i : i + n]) for i in range(len(cand) - n + 1)
            )
            refn, candn = sum(rg.values()), sum(cg.values())
            if refn == 0 or candn == 0:
                continue
            match = sum(min(c, rg.get(g, 0)) for g, c in cg.items())
            r, p = match / refn, match / candn
            f1 = 0.0 if match == 0 else 2.0 * p * r / (p + r)
            agg[n][0] += math.floor(r * 1e9 + 0.5)
            agg[n][1] += math.floor(p * 1e9 + 0.5)
            agg[n][2] += math.floor(f1 * 1e9 + 0.5)
            agg[n][3] += 1
    return {
        n: {
            "n_docs": d,
            "macro_recall": rq / d / 1e9,
            "macro_precision": pq / d / 1e9,
            "macro_f1": fq / d / 1e9,
        }
        for n, (rq, pq, fq, d) in agg.items()
        if d
    }


def test_rouge_matches_python_rederivation(spark):
    texts = [
        t
        for (t,) in duckdb.connect()
        .execute(f"SELECT text FROM '{SF_SMOKE}/documents.parquet'")
        .fetchall()
    ]
    exp = _py_rouge(texts)
    got = {r["n"]: r.asDict() for r in _run(spark, "rouge_n_generation_eval")}
    assert set(got) == set(exp)
    for n in exp:
        assert got[n]["n_docs"] == exp[n]["n_docs"]
        for k in ("macro_recall", "macro_precision", "macro_f1"):
            assert got[n][k] == pytest.approx(exp[n][k], abs=2e-6), (n, k)


def test_rouge_exact_on_five_token_doc(spark, tmp_path):
    """'a b c d e' drops only 'e': ROUGE-1 R=4/5 P=1 F1=8/9;
    ROUGE-2 R=3/4 P=1 F1=6/7 — checked to the digit."""
    _write_docs(str(tmp_path), [("s", "a b c d e")])
    got = {
        r["n"]: r.asDict()
        for r in _run(spark, "rouge_n_generation_eval", tmp_path)
    }
    assert got[1]["macro_recall"] == pytest.approx(0.8)
    assert got[1]["macro_precision"] == pytest.approx(1.0)
    assert got[1]["macro_f1"] == pytest.approx(8.0 / 9.0, abs=1e-6)
    assert got[2]["macro_recall"] == pytest.approx(0.75)
    assert got[2]["macro_precision"] == pytest.approx(1.0)
    assert got[2]["macro_f1"] == pytest.approx(6.0 / 7.0, abs=1e-6)


def test_rouge_gap_bigram_breaks_precision(spark, tmp_path):
    """Dropping a token invents the cross-gap bigram 'd f', so ROUGE-2
    precision < 1 while ROUGE-1 precision stays exactly 1 (a dropped
    token can never invent a unigram)."""
    _write_docs(str(tmp_path), [("s", "a b c d e f g h i j")])
    got = {
        r["n"]: r.asDict()
        for r in _run(spark, "rouge_n_generation_eval", tmp_path)
    }
    assert got[1]["macro_precision"] == pytest.approx(1.0)
    assert got[2]["macro_precision"] == pytest.approx(6.0 / 7.0, abs=1e-6)
    assert got[2]["macro_recall"] == pytest.approx(6.0 / 9.0, abs=1e-6)


# --------------------------------------------------------------------------
# bloom_filter_sizing_advisor
# --------------------------------------------------------------------------


def test_bloom_sizing_matches_python_rederivation(spark):
    con = duckdb.connect()
    for t in ("lineitem", "orders", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    keys = [
        ("lineitem", "l_orderkey"),
        ("lineitem", "l_partkey"),
        ("lineitem", "l_suppkey"),
        ("orders", "o_custkey"),
        ("events", "user_id"),
    ]
    got = {
        r["key_column"]: r.asDict()
        for r in _run(spark, "bloom_filter_sizing_advisor")
    }
    assert set(got) == {f"{t}.{c}" for t, c in keys}
    bpk, ln2 = 9.585962623247, 0.693147180560
    for t, c in keys:
        (n,) = con.execute(f"SELECT COUNT(DISTINCT {c}) FROM {t}").fetchone()
        row = got[f"{t}.{c}"]
        m = math.ceil(n * bpk)
        k = math.floor(m / n * ln2 + 0.5)
        assert row["n_keys"] == n
        assert row["m_bits"] == m
        assert row["k_hashes"] == k
        assert row["bits_per_key"] == pytest.approx(m / n, abs=5e-3)
        assert row["mbytes"] == pytest.approx(m / 8 / 1048576, abs=5e-4)
        fpp = (1.0 - math.exp(-(k * n) / m)) ** k
        assert row["achieved_fpp"] == pytest.approx(fpp, abs=2e-6)


def test_bloom_sizing_hits_the_one_percent_target(spark):
    """Optimal integer-k sizing must land within a small neighborhood of
    the 1% FPP target (k = 7 at ~9.59 bits/key is the textbook point),
    never above ~1.25% or below ~0.8%."""
    for row in _run(spark, "bloom_filter_sizing_advisor"):
        assert row["k_hashes"] == 7
        assert 9.58 <= row["bits_per_key"] <= 9.66
        assert 0.008 <= row["achieved_fpp"] <= 0.0125


# --------------------------------------------------------------------------
# davies_bouldin_index
# --------------------------------------------------------------------------


def test_db_index_consistent_with_kmeans_operator(spark):
    """n_members and S_i must agree with the independently-verified
    kmeans operator's own output (mean of sqrt(dist2) per cluster with
    the 1e6 lift), and db_index must equal the mean of the emitted
    r_max values — the internal identity."""
    km = _run(spark, "kmeans_embedding_clusters")
    sizes, sums = {}, {}
    for r in km:
        sizes[r["cluster_id"]] = sizes.get(r["cluster_id"], 0) + 1
        sums[r["cluster_id"]] = sums.get(r["cluster_id"], 0) + math.floor(
            math.sqrt(r["dist2"]) * 1e6 + 0.5
        )
    rows = [r.asDict() for r in _run(spark, "davies_bouldin_index")]
    assert {r["cluster_id"] for r in rows} == set(sizes)
    for r in rows:
        cid = r["cluster_id"]
        assert r["n_members"] == sizes[cid]
        exp_s = math.floor(sums[cid] / sizes[cid] + 0.5) / 1e6
        assert r["s_intra"] == pytest.approx(exp_s, abs=2e-6)
        assert r["worst_pair"] != cid
        assert r["r_max"] > 0
    db = rows[0]["db_index"]
    assert all(r["db_index"] == db for r in rows)
    assert db == pytest.approx(
        sum(r["r_max"] for r in rows) / len(rows), abs=2e-4
    )


def _write_embeddings(tmp_path, vecs):
    pdf = pd.DataFrame(
        {
            "vec_id": list(range(len(vecs))),
            "embedding": [list(map(float, v)) for v in vecs],
            "label": [0] * len(vecs),
        }
    )
    duckdb.connect().execute(
        f"COPY (SELECT vec_id, CAST(embedding AS FLOAT[]) AS embedding, "
        f"CAST(label AS INTEGER) AS label FROM pdf) "
        f"TO '{tmp_path}/embeddings.parquet' (FORMAT PARQUET)"
    )


def test_db_index_zero_on_perfect_clusters(spark, tmp_path):
    """Vectors sitting exactly on 8 well-separated points (the first 8
    vec_ids are the init centroids): S_i = 0 everywhere, so every R_ij
    and the DB index are exactly 0 — the definitional floor."""
    import itertools

    dim = 16
    protos = []
    for c in range(8):
        v = [0.0] * dim
        v[c] = 50.0
        protos.append(v)
    vecs = list(protos)
    for extra in range(24):  # 3 copies of each prototype
        vecs.append(protos[extra % 8])
    _write_embeddings(str(tmp_path), vecs)
    rows = [r.asDict() for r in _run(spark, "davies_bouldin_index", tmp_path)]
    assert len(rows) == 8
    for r in rows:
        assert r["n_members"] == 4
        assert r["s_intra"] == pytest.approx(0.0)
        assert r["r_max"] == pytest.approx(0.0)
        assert r["db_index"] == pytest.approx(0.0)


def test_db_index_tight_beats_loose(spark, tmp_path):
    """Same centroids, wider within-cluster spread -> larger DB index
    (the monotonicity that makes it a model-selection score)."""

    def blobs(spread_amt):
        dim = 16
        vecs = []
        for c in range(8):
            proto = [0.0] * dim
            proto[c] = 50.0
            vecs.append(list(proto))
        for extra in range(24):
            c = extra % 8
            v = [0.0] * dim
            v[c] = 50.0
            v[(c + 1) % dim] = spread_amt * (1 + extra % 3)
            vecs.append(v)
        return vecs

    _write_embeddings(str(tmp_path), blobs(0.5))
    tight = _run(spark, "davies_bouldin_index", tmp_path)[0]["db_index"]
    _write_embeddings(str(tmp_path), blobs(5.0))
    loose = _run(spark, "davies_bouldin_index", tmp_path)[0]["db_index"]
    assert 0 < tight < loose


# --------------------------------------------------------------------------
# negative_binomial_fit
# --------------------------------------------------------------------------


def _py_nb_fit(cells, n_users, n_days):
    """cells: {(type, user, day): count} -> {type: row}, independent."""
    out = {}
    by_type = {}
    for (et, _, _), c in cells.items():
        nnz, s, ss = by_type.get(et, (0, 0, 0))
        by_type[et] = (nnz + 1, s + c, ss + c * c)
    n = n_users * n_days
    for et, (nnz, s, ss) in by_type.items():
        mu = s / n
        v = (n * ss - s * s) / (n * (n - 1))
        if n < 2 or v <= mu:
            continue
        r = mu * mu / (v - mu)
        out[et] = {
            "n_cells": n,
            "n_nonzero": nnz,
            "mean_count": mu,
            "var_count": v,
            "nb_r": r,
            "obs_zero_frac": (n - nnz) / n,
            "poisson_zero_frac": math.exp(-mu),
            "nb_zero_frac": (r / (r + mu)) ** r,
        }
    return out


def test_nb_fit_matches_python_rederivation(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'"
    )
    rows = con.execute(
        """
        SELECT event_type, user_id, date_trunc('day', ts), COUNT(*)
        FROM events GROUP BY 1, 2, 3
        """
    ).fetchall()
    cells = {(et, u, d): c for et, u, d, c in rows}
    n_users = len({u for _, u, _ in cells})
    n_days = len({d for _, _, d in cells})
    exp = _py_nb_fit(cells, n_users, n_days)
    got = {r["event_type"]: r.asDict() for r in _run(spark, "negative_binomial_fit")}
    assert set(got) == set(exp)
    for et in exp:
        for k in exp[et]:
            assert got[et][k] == pytest.approx(exp[et][k], abs=2e-6), (et, k)


def test_nb_fit_closed_form_tiny_grid(spark, tmp_path):
    """2 users x 2 days, counts {8, 1, 1} + one empty cell: N=4, S=10,
    SS=66 -> mean 2.5, var 41/3, r = 6.25/(41/3 - 2.5) — to the digit,
    and NB's zero prediction must beat Poisson's against the observed
    25% zeros."""
    rows = []
    for _ in range(8):
        rows.append((1, 0, "purchase", 1.0))
    rows.append((2, 0, "purchase", 1.0))
    rows.append((2, 1, "purchase", 1.0))
    _write_user_events(str(tmp_path), rows)
    (row,) = _run(spark, "negative_binomial_fit", tmp_path)
    assert row["n_cells"] == 4 and row["n_nonzero"] == 3
    mu, v = 2.5, (4 * 66 - 100) / 12
    r = mu * mu / (v - mu)
    assert row["mean_count"] == pytest.approx(mu)
    assert row["var_count"] == pytest.approx(v, abs=1e-6)
    assert row["nb_r"] == pytest.approx(r, abs=1e-6)
    assert row["obs_zero_frac"] == pytest.approx(0.25)
    nb0, po0 = (r / (r + mu)) ** r, math.exp(-mu)
    assert row["nb_zero_frac"] == pytest.approx(nb0, abs=1e-6)
    assert row["poisson_zero_frac"] == pytest.approx(po0, abs=1e-6)
    assert abs(row["nb_zero_frac"] - 0.25) < abs(
        row["poisson_zero_frac"] - 0.25
    )


def test_nb_fit_excludes_equidispersed(spark, tmp_path):
    """Every user-day cell holding exactly one event has zero variance:
    var <= mean, NB undefined, the type must be excluded (mirrored)."""
    rows = [
        (u, d, "purchase", 1.0) for u in range(1, 4) for d in range(0, 3)
    ]
    _write_user_events(str(tmp_path), rows)
    assert _run(spark, "negative_binomial_fit", tmp_path) == []


# --------------------------------------------------------------------------
# soundex_phonetic_blocking
# --------------------------------------------------------------------------


def _py_soundex(word):
    """Third, independent US-Census soundex (textbook recursion) that
    pins BOTH the Spark builtin and the oracle's translate chain."""
    codes = {}
    for letters, d in (
        ("BFPV", "1"), ("CGJKQSXZ", "2"), ("DT", "3"),
        ("L", "4"), ("MN", "5"), ("R", "6"),
    ):
        for ch in letters:
            codes[ch] = d
    u = word.upper()
    first = u[0]
    out, prev = [], codes.get(first, "")
    for ch in u[1:]:
        if ch in "HW":
            continue  # transparent: prev code survives across H/W
        d = codes.get(ch, "")
        if d and d != prev:
            out.append(d)
        prev = d  # vowels reset prev (break adjacency)
    return first + ("".join(out) + "000")[:3]


def test_soundex_textbook_vector():
    vec = {
        "robert": "R163", "rupert": "R163", "ashcraft": "A261",
        "ashcroft": "A261", "tymczak": "T522", "pfister": "P236",
        "honeyman": "H555", "washington": "W252", "lee": "L000",
    }
    for w, sx in vec.items():
        assert _py_soundex(w) == sx, w


def test_soundex_three_implementations_agree(spark):
    """Spark's JVM builtin, the oracle's translate/regexp chain, and
    the textbook Python recursion must agree on EVERY head token in the
    fixture vocabulary."""
    from pyspark.sql import functions as F

    from weather_stream_processor_spark.operators.dedup import _soundex_sql

    toks = [
        t
        for (t,) in duckdb.connect()
        .execute(
            f"SELECT DISTINCT string_split(p_name, ' ')[-1] "
            f"FROM '{SF_SMOKE}/part.parquet'"
        )
        .fetchall()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE toks(t VARCHAR)")
    con.executemany("INSERT INTO toks VALUES (?)", [(t,) for t in toks])
    oracle = dict(
        con.execute(f"SELECT t, {_soundex_sql('t')} FROM toks").fetchall()
    )
    spark_sx = {
        r.t: r.sx
        for r in spark.createDataFrame([(t,) for t in toks], "t string")
        .select("t", F.soundex("t").alias("sx"))
        .collect()
    }
    for t in toks:
        assert spark_sx[t] == oracle[t] == _py_soundex(t), t


def _write_part(tmp_path, names):
    pdf = pd.DataFrame(
        {"p_partkey": list(range(1, len(names) + 1)), "p_name": names}
    )
    duckdb.connect().execute(
        f"COPY (SELECT * FROM pdf) TO '{tmp_path}/part.parquet' "
        "(FORMAT PARQUET)"
    )


def test_soundex_blocking_recovers_spelling_variant(spark, tmp_path):
    """'smith'/'smyth' share S530 but not the exact head token: the
    pair must appear with exact_block_miss = 1, while same-head pairs
    carry 0 and phonetically distinct heads never pair."""
    _write_part(
        str(tmp_path),
        ["alpha smith", "alpha smyth", "beta smith", "gamma jones"],
    )
    rows = {
        (r["name_a"], r["name_b"]): r.asDict()
        for r in _run(spark, "soundex_phonetic_blocking", tmp_path)
    }
    key = ("alpha smith", "alpha smyth")
    assert key in rows
    assert rows[key]["exact_block_miss"] == 1
    assert rows[key]["edit_distance"] == 1
    assert rows[key]["block_code"] == "S530"
    same_head = ("alpha smith", "beta smith")
    assert same_head in rows and rows[same_head]["exact_block_miss"] == 0
    assert not any("jones" in a or "jones" in b for a, b in rows)


# --------------------------------------------------------------------------
# markov_entropy_rate
# --------------------------------------------------------------------------


def _py_entropy_rate(trans):
    """trans: {(src, dst): count} -> row dict, independent plug-in."""
    row = {}
    for (s, _), c in trans.items():
        row[s] = row.get(s, 0) + c
    n = sum(row.values())
    ht = sum(
        math.floor(-(c / n) * math.log2(c / row[s]) * 1e9 + 0.5)
        for (s, _), c in trans.items()
    )
    hm = sum(
        math.floor(-(r / n) * math.log2(r / n) * 1e9 + 0.5)
        for r in row.values()
    )
    return {
        "n_transitions": n,
        "n_states": len(row),
        "cond_entropy_bits": ht / 1e9,
        "marginal_entropy_bits": hm / 1e9,
        "predictability_gain_bits": (hm - ht) / 1e9,
        "transition_perplexity": 2.0 ** (ht / 1e9),
    }


def test_entropy_rate_matches_python_rederivation(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'"
    )
    rows = con.execute(
        """
        WITH seq AS (
            SELECT event_type,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS nxt
            FROM events
        )
        SELECT event_type, nxt, COUNT(*) FROM seq
        WHERE nxt IS NOT NULL GROUP BY 1, 2
        """
    ).fetchall()
    exp = _py_entropy_rate({(s, d): c for s, d, c in rows})
    (row,) = _run(spark, "markov_entropy_rate")
    for k in exp:
        assert row[k] == pytest.approx(exp[k], abs=2e-5), k


def test_entropy_rate_deterministic_chain_is_zero(spark, tmp_path):
    """A strictly periodic per-user sequence (view -> click -> view ->
    click...) has ONE possible next state everywhere: conditional
    entropy 0, perplexity 1, while the marginal entropy stays 1 bit —
    the full gap is predictability."""
    rows = []
    for u in (1, 2):
        for i in range(20):
            rows.append((u, i, "view" if i % 2 == 0 else "click", 1.0))
    _write_user_events(str(tmp_path), rows)
    (row,) = _run(spark, "markov_entropy_rate", tmp_path)
    assert row["cond_entropy_bits"] == pytest.approx(0.0)
    assert row["transition_perplexity"] == pytest.approx(1.0)
    assert row["marginal_entropy_bits"] == pytest.approx(1.0, abs=0.02)
    assert row["predictability_gain_bits"] == pytest.approx(
        row["marginal_entropy_bits"], abs=1e-9
    )


def test_entropy_rate_uniform_chain_has_no_gain(spark, tmp_path):
    """A sequence whose next state is uniform over 2 types regardless
    of the current one: conditional entropy = marginal entropy = 1 bit,
    gain ~ 0, perplexity ~ 2 (memoryless stream)."""
    pat = ["view", "view", "click", "click"]  # every (src,dst) pair once
    rows = []
    for u in (1, 2, 3):
        for i in range(40):
            rows.append((u, i, pat[i % 4], 1.0))
    _write_user_events(str(tmp_path), rows)
    (row,) = _run(spark, "markov_entropy_rate", tmp_path)
    assert row["predictability_gain_bits"] == pytest.approx(0.0, abs=0.01)
    assert row["transition_perplexity"] == pytest.approx(2.0, abs=0.05)


# --------------------------------------------------------------------------
# newey_west_robust_se
# --------------------------------------------------------------------------


def _py_newey_west(cents, L=7):
    """cents: day-ordered list -> row dict, independent implementation."""
    n = len(cents)
    s = sum(cents)
    z = [n * x - s for x in cents]
    lk = {
        k: sum(z[t] * z[t + k] for t in range(n - k)) for k in range(L + 1)
    }
    g0 = lk[0] / (n ** 3)
    g2 = sum(2.0 * (1 - k / (L + 1)) * lk[k] for k in range(1, L + 1)) / (
        n ** 3
    )
    se_iid2 = g0 * n / (n - 1) / n
    var_nw = (g0 + g2) / n
    return {
        "n_days": n,
        "sd_daily_usd": math.sqrt(g0) / 100.0,
        "se_iid_usd": math.sqrt(se_iid2) / 100.0,
        "se_newey_west_usd": math.sqrt(max(var_nw, 0.0)) / 100.0,
        "ess_ratio": se_iid2 / var_nw,
    }


def test_newey_west_matches_python_rederivation(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'"
    )
    rows = con.execute(
        """
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series = {}
    for et, _, c in rows:
        series.setdefault(et, []).append(c)
    got = {r["event_type"]: r.asDict() for r in _run(spark, "newey_west_robust_se")}
    exp = {
        et: _py_newey_west(cs)
        for et, cs in series.items()
        if len(cs) > 8 and any(c != cs[0] for c in cs)
    }
    exp = {et: e for et, e in exp.items() if e["se_newey_west_usd"] > 0}
    assert set(got) == set(exp)
    for et in exp:
        for k in exp[et]:
            assert got[et][k] == pytest.approx(
                exp[et][k], rel=1e-4, abs=1e-5
            ), (et, k)


def test_newey_west_positive_autocorr_inflates_se(spark, tmp_path):
    """Long same-level blocks (strong positive autocorrelation): the
    honest SE must exceed the iid SE, i.e. the effective sample size
    deflates (ess_ratio < 1)."""
    days = [(d, 10.0 if (d // 8) % 2 == 0 else 20.0) for d in range(32)]
    _write_events(str(tmp_path), days)
    (row,) = _run(spark, "newey_west_robust_se", tmp_path)
    assert row["se_newey_west_usd"] > row["se_iid_usd"]
    assert row["ess_ratio"] < 1.0
    exp = _py_newey_west([1000 if (d // 8) % 2 == 0 else 2000 for d in range(32)])
    assert row["se_newey_west_usd"] == pytest.approx(
        exp["se_newey_west_usd"], rel=1e-5
    )


def test_newey_west_alternating_deflates_se(spark, tmp_path):
    """Strict alternation (negative lag-1 autocorrelation): the mean is
    BETTER estimated than iid sampling suggests — se_nw < se_iid and
    ess_ratio > 1."""
    days = [(d, 10.0 if d % 2 == 0 else 20.0) for d in range(32)]
    _write_events(str(tmp_path), days)
    (row,) = _run(spark, "newey_west_robust_se", tmp_path)
    assert row["se_newey_west_usd"] < row["se_iid_usd"]
    assert row["ess_ratio"] > 1.0


# --------------------------------------------------------------------------
# cooks_distance_trend
# --------------------------------------------------------------------------


def _py_cooks(cents):
    """cents: day-ordered list -> [(t, resid_usd, lev, cd, flag)]."""
    n = len(cents)
    tcs = [2 * t - (n - 1) for t in range(n)]
    s = sum(cents)
    bnum = sum(tc * y for tc, y in zip(tcs, cents))
    delta = sum(tc * tc for tc in tcs)
    es = [
        n * delta * y - delta * s - n * bnum * tc
        for tc, y in zip(tcs, cents)
    ]
    sse = sum(e * e for e in es)
    out = []
    for t, (tc, e) in enumerate(zip(tcs, es)):
        hnum = delta + n * tc * tc
        onemh = n * delta - delta - n * tc * tc
        cd = (
            (e * e / sse) * (n - 2) * hnum * n * delta
            / (2.0 * onemh * onemh)
        )
        out.append(
            (
                t,
                e / (n * delta) / 100.0,
                hnum / (n * delta),
                cd,
                1 if cd * n > 4.0 else 0,
            )
        )
    return out


def test_cooks_matches_python_rederivation(spark):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'"
    )
    rows = con.execute(
        """
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series = {}
    for et, _, c in rows:
        series.setdefault(et, []).append(c)
    got = {}
    for r in _run(spark, "cooks_distance_trend"):
        got[(r["event_type"], r["day_index"])] = r.asDict()
    for et, cs in series.items():
        for t, resid, lev, cd, flag in _py_cooks(cs):
            row = got[(et, t)]
            assert row["resid_usd"] == pytest.approx(resid, abs=2e-6)
            assert row["leverage"] == pytest.approx(lev, abs=1e-6)
            assert row["cooks_d"] == pytest.approx(cd, abs=2e-6)
            assert row["influential"] == flag
    assert len(got) == sum(len(cs) for cs in series.values())


def test_cooks_flags_planted_outlier(spark, tmp_path):
    """A perfect line plus one massive end-day spike: only the spike
    day is influential, and endpoint leverage is the maximum."""
    days = [(d, float(100 + 10 * d)) for d in range(20)]
    days[19] = (19, 5000.0)  # the spike
    _write_events(str(tmp_path), days)
    rows = {r["day_index"]: r.asDict() for r in _run(spark, "cooks_distance_trend", tmp_path)}
    assert rows[19]["influential"] == 1
    flagged = [t for t, r in rows.items() if r["influential"] == 1]
    assert flagged == [19]
    max_lev = max(r["leverage"] for r in rows.values())
    assert rows[19]["leverage"] == pytest.approx(max_lev)
    assert rows[0]["leverage"] == pytest.approx(max_lev)


def test_cooks_leverage_sums_to_two(spark, tmp_path):
    """sum_t h_t = p = 2 for the two-parameter fit — the trace
    identity that pins the leverage formula."""
    days = [(d, float(100 + 7 * d + (d % 3))) for d in range(15)]
    _write_events(str(tmp_path), days)
    rows = _run(spark, "cooks_distance_trend", tmp_path)
    assert sum(r["leverage"] for r in rows) == pytest.approx(2.0, abs=1e-4)
