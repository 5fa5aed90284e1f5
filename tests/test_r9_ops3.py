"""Round-9 operator tests, batch 3: the lexical-diversity pair (Yule's K,
nucleus top-p vocabulary), the survival inference pair (log-rank, RMST),
the agreement pair (Krippendorff's alpha, Kendall's W), B-cubed, the
Hanley-McNeil AUC interval, covariate-balance SMD, fixed-effect
meta-analysis, and the Wald SPRT monitor — each checked against an independent pure-Python rederivation
(fixture oracle parity is covered by tools/oracle_check.py; these tests
pin the semantics the oracle merely mirrors).
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE
from weather_stream_processor_spark.registry import all_queries

_KNUTH = 2654435761
_MOD = 2147483647


def _write_docs(tmp_path, texts, sources=None):
    n = len(texts)
    rows = pd.DataFrame(
        {
            "doc_id": list(range(1, n + 1)),
            "text": texts,
            "lang": ["en"] * n,
            "source": sources or ["s0"] * n,
            "n_chars": pd.array([len(t) for t in texts], dtype="Int64"),
        }
    )
    duckdb.connect().execute(
        f"COPY (SELECT * FROM rows) TO '{tmp_path}/documents.parquet' "
        "(FORMAT PARQUET)"
    )


def _write_orders(tmp_path, rows_spec):
    """rows_spec: list of (o_orderkey, o_custkey, o_orderdate str,
    o_totalprice)."""
    rows = pd.DataFrame(
        {
            "o_orderkey": [r[0] for r in rows_spec],
            "o_custkey": [r[1] for r in rows_spec],
            "o_orderstatus": ["O"] * len(rows_spec),
            "o_totalprice": [float(r[3]) for r in rows_spec],
            "o_orderdate": pd.to_datetime([r[2] for r in rows_spec]),
            "o_orderpriority": ["1-URGENT"] * len(rows_spec),
        }
    )
    duckdb.connect().execute(
        f"COPY (SELECT * FROM rows) TO '{tmp_path}/orders.parquet' "
        "(FORMAT PARQUET)"
    )


def _arm(key: int) -> int:
    return (((key % _MOD) * _KNUTH) >> 16) % 2


# --------------------------------------------------------------------------
# yule_k_lexical_diversity
# --------------------------------------------------------------------------


def test_yule_k_closed_form(spark, tmp_path):
    # one source, hand-countable spectrum: "a a a b b c" ->
    # N=6, V=3, V_1=1 (c), V_2=1 (b), V_3=1 (a)
    _write_docs(tmp_path, ["a a a b b c"], sources=["s0"])
    row = (
        all_queries()["yule_k_lexical_diversity"]
        .builder(spark, str(tmp_path))
        .collect()[0]
    )
    n, m2 = 6, 1 * 1 + 4 * 1 + 9 * 1  # sum m^2 V_m = 14
    rep = 0 * 1 + 2 * 1 + 6 * 1  # sum m(m-1) V_m = 8
    assert row["n_tokens"] == n and row["vocab_size"] == 3
    assert row["hapax"] == 1
    assert row["yule_k"] == round(10000.0 * (m2 - n) / n**2, 6)
    assert row["simpson_d"] == round(rep / (n * (n - 1)), 6)
    assert row["hapax_share"] == round(1 / 3, 6)


# --------------------------------------------------------------------------
# nucleus_topp_vocab
# --------------------------------------------------------------------------


def test_nucleus_topp_closed_form(spark, tmp_path):
    # freqs: a x 8, b x 6, c x 3, d x 2, e x 1 -> N=20, target=ceil(18)=18
    # mass above freq grid desc: 8 (a), 14 (+b), 17 (+c), 19 (+d), 20 (+e)
    # boundary at freq 2 (d): mass_above=17 < 18 <= 19; take ceil(1/2)=1
    # p90_vocab = types_above(3) + 1 = 4; covered = 17 + 2 = 19
    text = " ".join(["a"] * 8 + ["b"] * 6 + ["c"] * 3 + ["d"] * 2 + ["e"])
    _write_docs(tmp_path, [text], sources=["s0"])
    row = (
        all_queries()["nucleus_topp_vocab"]
        .builder(spark, str(tmp_path))
        .collect()[0]
    )
    assert row["n_tokens"] == 20 and row["vocab_size"] == 5
    assert row["boundary_freq"] == 2
    assert row["p90_vocab"] == 4
    assert row["covered_mass"] == 19
    assert row["p90_vocab_share"] == round(4 / 5, 6)


def test_nucleus_mass_invariant_fixture(spark):
    # covered mass must reach ceil(0.9 N) and the boundary take must not
    # overshoot by a full boundary-frequency step, for every source
    for r in (
        all_queries()["nucleus_topp_vocab"].builder(spark, SF_SMOKE).collect()
    ):
        target = -(-9 * r["n_tokens"] // 10)
        assert r["covered_mass"] >= target
        assert r["covered_mass"] - r["boundary_freq"] < target
        assert 1 <= r["p90_vocab"] <= r["vocab_size"]


# --------------------------------------------------------------------------
# logrank_test_arms + rmst_restricted_mean_survival
# --------------------------------------------------------------------------


def _lifetimes(rows_spec, horizon_gap=90):
    per = {}
    for k, c, d, _ in rows_spec:
        lo, hi = per.get(c, (d, d))
        per[c] = (min(lo, d), max(hi, d))
    h = max(hi for _, hi in per.values())
    out = []
    for c, (lo, hi) in per.items():
        out.append(
            (
                _arm(c),
                (pd.Timestamp(hi) - pd.Timestamp(lo)).days,
                1 if (pd.Timestamp(h) - pd.Timestamp(hi)).days > horizon_gap else 0,
            )
        )
    return out


def _py_logrank(lives):
    times = sorted({t for _, t, _ in lives})
    n0 = sum(1 for a, _, _ in lives if a == 0)
    n1 = len(lives) - n0
    o1 = e1 = v = 0.0
    for t in times:
        d0 = sum(1 for a, lt, c in lives if a == 0 and lt == t and c)
        d1 = sum(1 for a, lt, c in lives if a == 1 and lt == t and c)
        r0 = sum(1 for a, lt, _ in lives if a == 0 and lt >= t)
        r1 = sum(1 for a, lt, _ in lives if a == 1 and lt >= t)
        d, r = d0 + d1, r0 + r1
        if d == 0:
            continue
        o1 += d1
        e1 += d * r1 / r
        if r > 1:
            v += d * r0 * r1 * (r - d) / (r * r * (r - 1))
    return n0, n1, o1, e1, v


def test_logrank_matches_python(spark, tmp_path):
    rows = []
    for c in range(1, 41):
        first = pd.Timestamp("2020-01-01") + pd.Timedelta(days=c * 3 % 17)
        last = first + pd.Timedelta(days=(c * 37) % 400)
        rows.append((2 * c, c, str(first.date()), 100.0))
        rows.append((2 * c + 1, c, str(last.date()), 100.0))
    _write_orders(tmp_path, rows)
    got = (
        all_queries()["logrank_test_arms"]
        .builder(spark, str(tmp_path))
        .collect()[0]
    )
    n0, n1, o1, e1, v = _py_logrank(_lifetimes(rows))
    assert got["n_control"] == n0 and got["n_treat"] == n1
    assert got["observed_treat"] == o1
    assert got["expected_treat"] == pytest.approx(e1, abs=2e-6)
    assert got["variance"] == pytest.approx(v, abs=2e-6)
    z = (o1 - e1) / math.sqrt(v)
    assert got["z_score"] == pytest.approx(z, abs=2e-6)
    assert 0.0 <= got["p_value"] <= 1.0


def _py_rmst(lives, tau):
    out = {}
    for arm in (0, 1):
        al = [(t, c) for a, t, c in lives if a == arm]
        n = len(al)
        times = sorted({t for t, _ in al})
        s, area, prev_t, prev_s = 1.0, 0.0, 0, 1.0
        for t in times:
            d = sum(1 for lt, c in al if lt == t and c)
            r = sum(1 for lt, _ in al if lt >= t)
            if t > tau:
                break
            area += prev_s * (t - prev_t)
            s *= 1.0 - d / r
            prev_t, prev_s = t, s
        area += prev_s * (tau - prev_t)
        out[arm] = (n, area)
    return out


def test_rmst_matches_python(spark, tmp_path):
    rows = []
    for c in range(1, 41):
        first = pd.Timestamp("2020-01-01")
        last = first + pd.Timedelta(days=(c * 97) % 2100)
        rows.append((2 * c, c, str(first.date()), 100.0))
        rows.append((2 * c + 1, c, str(last.date()), 100.0))
    _write_orders(tmp_path, rows)
    got = {
        r["arm"]: r
        for r in all_queries()["rmst_restricted_mean_survival"]
        .builder(spark, str(tmp_path))
        .collect()
    }
    exp = _py_rmst(_lifetimes(rows), 1460)
    assert set(got) == set(exp)
    for arm, (n, area) in exp.items():
        assert got[arm]["n_customers"] == n
        assert got[arm]["rmst_days"] == pytest.approx(area, abs=2e-5)
        assert got[arm]["rmst_share"] == pytest.approx(area / 1460, abs=2e-6)


def test_rmst_no_events_equals_tau(spark, tmp_path):
    # every customer ordered once on the horizon date: lifetime 0,
    # censored -> KM stays at 1 until 0 where d=0 ... all customers have
    # lifetime 0 and churned=0, so S=1 and RMST = tau exactly
    rows = [(c, c, "2020-01-01", 50.0) for c in range(1, 21)]
    _write_orders(tmp_path, rows)
    for r in (
        all_queries()["rmst_restricted_mean_survival"]
        .builder(spark, str(tmp_path))
        .collect()
    ):
        assert r["rmst_days"] == 1460.0 and r["rmst_share"] == 1.0


# --------------------------------------------------------------------------
# krippendorff_alpha_nominal
# --------------------------------------------------------------------------


def _py_krippendorff(units):
    """units: list of per-unit label lists (len >= 2). Canonical
    coincidence-matrix alpha (Krippendorff, nominal metric), in floats."""
    o = Counter()
    for vals in units:
        m = len(vals)
        if m < 2:
            continue
        for i, c in enumerate(vals):
            for j, k in enumerate(vals):
                if i != j:
                    o[(c, k)] += 1.0 / (m - 1)
    n = sum(o.values())
    nc = Counter()
    for (c, _), w in o.items():
        nc[c] += w
    d_o = sum(w for (c, k), w in o.items() if c != k) / n
    d_e = sum(
        nc[c] * nc[k] for c in nc for k in nc if c != k
    ) / (n * (n - 1))
    return 1.0 - d_o / d_e


def test_krippendorff_matches_python(spark):
    spec = all_queries()["krippendorff_alpha_nominal"]
    got = spec.builder(spark, SF_SMOKE).collect()[0]
    docs = duckdb.connect().execute(
        f"SELECT doc_id FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    units = []
    for (doc_id,) in docs:
        vals = []
        for r in range(3):
            if r == 2 and (((doc_id * 31 + 17) % _MOD) * _KNUTH >> 16) % 5 == 0:
                continue
            flip = (((doc_id * 31 + r) % _MOD) * _KNUTH >> 16) % 10 == 0
            vals.append(1 if flip else 0)
        units.append(vals)
    assert got["n_units"] == sum(1 for u in units if len(u) >= 2)
    assert got["n_vals"] == sum(len(u) for u in units if len(u) >= 2)
    assert got["alpha"] == pytest.approx(_py_krippendorff(units), abs=2e-6)
    # some units must actually be 2-rater (the missing-data path is live)
    assert any(len(u) == 2 for u in units)


# --------------------------------------------------------------------------
# kendall_w_concordance
# --------------------------------------------------------------------------


def _write_lineitem_part(tmp_path, brand_rows):
    """brand_rows: list of (brand, price, qty) line items; partkey=index."""
    li = pd.DataFrame(
        {
            "l_orderkey": list(range(1, len(brand_rows) + 1)),
            "l_partkey": list(range(1, len(brand_rows) + 1)),
            "l_suppkey": [1] * len(brand_rows),
            "l_linenumber": [1] * len(brand_rows),
            "l_quantity": [float(q) for _, _, q in brand_rows],
            "l_extendedprice": [float(p) for _, p, _ in brand_rows],
            "l_discount": [0.0] * len(brand_rows),
            "l_tax": [0.0] * len(brand_rows),
            "l_returnflag": ["N"] * len(brand_rows),
            "l_linestatus": ["O"] * len(brand_rows),
            "l_shipdate": pd.to_datetime(["2020-01-01"] * len(brand_rows)),
        }
    )
    pt = pd.DataFrame(
        {
            "p_partkey": list(range(1, len(brand_rows) + 1)),
            "p_name": ["p"] * len(brand_rows),
            "p_brand": [b for b, _, _ in brand_rows],
            "p_type": ["t"] * len(brand_rows),
            "p_size": [1] * len(brand_rows),
            "p_retailprice": [1.0] * len(brand_rows),
        }
    )
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM li) TO '{tmp_path}/lineitem.parquet' "
        "(FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT * FROM pt) TO '{tmp_path}/part.parquet' "
        "(FORMAT PARQUET)"
    )


def test_kendall_w_perfect_concordance(spark, tmp_path):
    # one line item per brand with price, qty, and count rankings all
    # agreeing (count ties at 1 everywhere -> fully tied judge), so the
    # exact tie-corrected W is computable by the python formula below
    rows = [(f"B{i:02d}", 100.0 * i, i) for i in range(1, 6)]
    _write_lineitem_part(tmp_path, rows)
    got = (
        all_queries()["kendall_w_concordance"]
        .builder(spark, str(tmp_path))
        .collect()[0]
    )
    # python rederivation with mid-ranks
    n, m = 5, 3
    ranks = {
        b: 2 * [1, 2, 3, 4, 5][i] for i, (b, _, _) in enumerate(rows)
    }  # judges 1 and 2: strict order, x2 lift
    tied = n + 1  # judge 3 (count) all tied: mid-rank (n+1)/2, x2 = n+1
    r2 = {b: 2 * ranks[b] // 2 * 1 for b in ranks}
    s4 = sum(
        (2 * (i + 1) + 2 * (i + 1) + tied - m * (n + 1)) ** 2
        for i in range(n)
    )
    tie_term = n**3 - n  # one fully tied group of size n
    w = 3.0 * s4 / (m * m * (n**3 - n) - m * tie_term)
    assert got["n_items"] == n and got["m_judges"] == m
    assert got["s4"] == s4 and got["tie_term"] == tie_term
    assert got["kendall_w"] == round(w, 6)


def test_kendall_w_fixture_range(spark):
    got = (
        all_queries()["kendall_w_concordance"]
        .builder(spark, SF_SMOKE)
        .collect()[0]
    )
    assert 0.0 <= got["kendall_w"] <= 1.0
    assert got["m_judges"] == 3


# --------------------------------------------------------------------------
# bcubed_cluster_eval
# --------------------------------------------------------------------------


def test_bcubed_matches_per_element_python(spark):
    from weather_stream_processor_spark.registry import _REGISTRY

    assign = {
        r["vec_id"]: r["cluster_id"]
        for r in _REGISTRY["kmeans_embedding_clusters"]
        .builder(spark, SF_SMOKE)
        .select("vec_id", "cluster_id")
        .collect()
    }
    labels = dict(
        duckdb.connect()
        .execute(
            f"SELECT vec_id, label FROM "
            f"read_parquet('{SF_SMOKE}/embeddings.parquet')"
        )
        .fetchall()
    )
    csize = Counter(assign.values())
    lsize = Counter(labels.values())
    cell = Counter((assign[v], labels[v]) for v in assign)
    n = len(assign)
    p = sum(cell[(c, l)] ** 2 / csize[c] for c, l in cell) / n
    r = sum(cell[(c, l)] ** 2 / lsize[l] for c, l in cell) / n
    got = (
        all_queries()["bcubed_cluster_eval"].builder(spark, SF_SMOKE).collect()[0]
    )
    assert got["n_points"] == n
    assert got["bcubed_precision"] == pytest.approx(p, abs=2e-6)
    assert got["bcubed_recall"] == pytest.approx(r, abs=2e-6)
    assert got["bcubed_f1"] == pytest.approx(2 * p * r / (p + r), abs=2e-6)


# --------------------------------------------------------------------------
# auc_hanley_mcneil_ci
# --------------------------------------------------------------------------


def test_hanley_mcneil_matches_python(spark):
    rows = duckdb.connect().execute(
        f"""
        SELECT ROUND(len(list_distinct(string_split(text, ' '))) * 1.0
                     / len(string_split(text, ' ')), 4) AS score,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
        FROM read_parquet('{SF_SMOKE}/documents.parquet')
        """
    ).fetchall()
    pos = sorted(s for s, l in rows if l == 1)
    neg = sorted(s for s, l in rows if l == 0)
    import bisect

    u = 0.0
    for s in pos:
        u += bisect.bisect_left(neg, s)
        u += 0.5 * (bisect.bisect_right(neg, s) - bisect.bisect_left(neg, s))
    a = u / (len(pos) * len(neg))
    q1, q2 = a / (2 - a), 2 * a * a / (1 + a)
    se = math.sqrt(
        (a * (1 - a) + (len(pos) - 1) * (q1 - a * a) + (len(neg) - 1) * (q2 - a * a))
        / (len(pos) * len(neg))
    )
    got = (
        all_queries()["auc_hanley_mcneil_ci"].builder(spark, SF_SMOKE).collect()[0]
    )
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    assert got["auc"] == pytest.approx(a, abs=2e-6)
    assert got["se_hm"] == pytest.approx(se, abs=2e-6)
    assert got["ci_low"] == pytest.approx(a - 1.96 * se, abs=2e-6)
    assert got["ci_high"] == pytest.approx(a + 1.96 * se, abs=2e-6)


# --------------------------------------------------------------------------
# smd_covariate_balance
# --------------------------------------------------------------------------


def test_smd_matches_python(spark):
    ev = duckdb.connect().execute(
        f"""
        SELECT user_id, event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               epoch_us(ts) AS us
        FROM read_parquet('{SF_SMOKE}/events.parquet')
        """
    ).fetchdf()
    lo, hi = int(ev.us.min()), int(ev.us.max())
    pre = ev[2 * ev.us < lo + hi]
    per = pre.groupby("user_id").agg(
        n_events=("event_type", "size"),
        n_clicks=("event_type", lambda s: int((s == "click").sum())),
        value_cents=("cents", "sum"),
    )
    per["arm"] = [(int(u) % _MOD) * _KNUTH >> 16 & 0xFFFFFFFFFFFF for u in per.index]
    per["arm"] = [
        (((int(u) % _MOD) * _KNUTH) >> 16) % 2 for u in per.index
    ]
    got = {
        r["covariate"]: r
        for r in all_queries()["smd_covariate_balance"]
        .builder(spark, SF_SMOKE)
        .collect()
    }
    for cov, col in (
        ("pre_events", "n_events"),
        ("pre_clicks", "n_clicks"),
        ("pre_value_cents", "value_cents"),
    ):
        g0 = per[per.arm == 0][col].astype(float)
        g1 = per[per.arm == 1][col].astype(float)
        smd = (g1.mean() - g0.mean()) / math.sqrt(
            (g0.var(ddof=1) + g1.var(ddof=1)) / 2
        )
        assert got[cov]["n_control"] == len(g0)
        assert got[cov]["n_treat"] == len(g1)
        assert got[cov]["mean_control"] == pytest.approx(g0.mean(), abs=2e-6)
        assert got[cov]["smd"] == pytest.approx(smd, abs=2e-6)
        assert got[cov]["imbalanced"] == (1 if abs(smd) > 0.1 else 0)


# --------------------------------------------------------------------------
# meta_analysis_fixed_effect
# --------------------------------------------------------------------------


def test_meta_analysis_matches_python(spark):
    df = duckdb.connect().execute(
        f"""
        SELECT source,
               CAST(ROUND(ROUND(len(list_distinct(string_split(text, ' ')))
                    * 1.0 / len(string_split(text, ' ')), 4) * 10000)
                    AS BIGINT) AS s4
        FROM read_parquet('{SF_SMOKE}/documents.parquet')
        """
    ).fetchdf()
    studies = {}
    for src, grp in df.groupby("source"):
        n = len(grp)
        eff = grp.s4.sum() / n / 10000.0
        var = (
            (grp.s4.astype(float) ** 2).sum()
            - grp.s4.sum() ** 2 / n
        ) / (n - 1) / n / 1e8
        studies[src] = (n, eff, var)
    sw = sum(1 / v for _, _, v in studies.values())
    swe = sum(e / v for _, e, v in studies.values())
    pooled = swe / sw
    q = sum((e - pooled) ** 2 / v for _, e, v in studies.values())
    k = len(studies)
    i2 = max((q - (k - 1)) / q, 0.0) * 100
    got = {
        r["source"]: r
        for r in all_queries()["meta_analysis_fixed_effect"]
        .builder(spark, SF_SMOKE)
        .collect()
    }
    assert set(got) == set(studies)
    for src, (n, eff, var) in studies.items():
        assert got[src]["n_docs"] == n
        assert got[src]["effect"] == pytest.approx(eff, abs=2e-6)
        assert got[src]["pooled_effect"] == pytest.approx(pooled, abs=2e-6)
        assert got[src]["cochran_q_het"] == pytest.approx(q, rel=2e-5)
        assert got[src]["df"] == k - 1
        assert got[src]["i2_pct"] == pytest.approx(i2, rel=2e-5)


# --------------------------------------------------------------------------
# sprt_conversion_monitor
# --------------------------------------------------------------------------


def test_sprt_matches_python(spark):
    ev = duckdb.connect().execute(
        f"""
        SELECT user_id, CAST(ts AS DATE) AS d,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted
        FROM read_parquet('{SF_SMOKE}/events.parquet')
        GROUP BY user_id, CAST(ts AS DATE)
        """
    ).fetchdf()
    la = math.log(0.35 / 0.30)
    lb = math.log(0.65 / 0.70)
    up, low = math.log(19.0), -math.log(19.0)
    grid = ev.groupby("d").agg(
        trials=("converted", "size"), conv=("converted", "sum")
    )
    grid = grid.sort_index()
    llr, series = 0.0, {}
    first_up = first_low = None
    for d, row in grid.iterrows():
        d = str(pd.Timestamp(d).date())
        llr += row.conv * la + (row.trials - row.conv) * lb
        series[d] = llr
        if first_up is None and llr >= up:
            first_up = d
        if first_low is None and llr <= low:
            first_low = d
    if first_up is not None and (first_low is None or first_up <= first_low):
        decision, decided = "accept_h1", first_up
    elif first_low is not None:
        decision, decided = "accept_h0", first_low
    else:
        decision, decided = "continue", None
    got = (
        all_queries()["sprt_conversion_monitor"].builder(spark, SF_SMOKE).collect()
    )
    assert len(got) == len(grid)
    for r in got:
        d = str(pd.Timestamp(r["d"]).date())
        assert r["llr"] == pytest.approx(series[d], abs=2e-6)
        assert r["final_decision"] == decision
        dec = (
            None
            if r["decided_on"] is None
            else str(pd.Timestamp(r["decided_on"]).date())
        )
        assert dec == decided
