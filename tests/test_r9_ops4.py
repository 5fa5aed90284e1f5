"""Round-9 operator tests, batch 4: Mantel-Haenszel pooled odds ratio,
Dunn's post-hoc pairs, the Jonckheere-Terpstra trend test, weighted
kappa (ordinal), Western Electric runs rules, and Wilson score
intervals — each checked against an independent pure-Python
rederivation on the smoke fixture (oracle parity is covered by
tools/oracle_check.py; these tests pin the semantics the oracle merely
mirrors).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE
from weather_stream_processor_spark.registry import all_queries

_KNUTH = 2654435761
_MOD = 2147483647


def _arm(key: int) -> int:
    return (((key % _MOD) * _KNUTH) >> 16) % 2


def _as_sf(z: float) -> float:
    b = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
    t = 1.0 / (1.0 + 0.2316419 * z)
    poly = t * (b[0] + t * (b[1] + t * (b[2] + t * (b[3] + t * b[4]))))
    return math.exp(-z * z / 2.0) / math.sqrt(2.0 * math.pi) * poly


# --------------------------------------------------------------------------
# mantel_haenszel_pooled_or
# --------------------------------------------------------------------------


def test_mantel_haenszel_matches_python(spark):
    df = duckdb.connect().execute(
        f"""
        SELECT n.n_name AS stratum, s.o_custkey AS ck, s.cents
        FROM (SELECT o_custkey,
                     CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS cents
              FROM read_parquet('{SF_SMOKE}/orders.parquet')
              GROUP BY o_custkey) s
        JOIN read_parquet('{SF_SMOKE}/customer.parquet') c
          ON s.o_custkey = c.c_custkey
        JOIN read_parquet('{SF_SMOKE}/nation.parquet') n
          ON c.c_nationkey = n.n_nationkey
        """
    ).fetchdf()
    total, ncust = int(df.cents.sum()), len(df)
    cells = defaultdict(lambda: [0, 0, 0, 0])  # a, b, c, d
    for _, r in df.iterrows():
        exp = _arm(int(r.ck))
        out = 1 if int(r.cents) * ncust >= total else 0
        idx = (1 - exp) * 2 + (1 - out)
        cells[r.stratum][idx] += 1
    ad = bc = sa = se = sv = 0.0
    for a, b, c, d in cells.values():
        n = a + b + c + d
        ad += a * d / n
        bc += b * c / n
        sa += a
        se += (a + b) * (a + c) / n
        if n > 1:
            sv += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
    mh_or = ad / bc
    chi2 = (abs(sa - se) - 0.5) ** 2 / sv
    got = {
        r["stratum"]: r
        for r in all_queries()["mantel_haenszel_pooled_or"]
        .builder(spark, SF_SMOKE)
        .collect()
    }
    assert set(got) == set(cells)
    any_row = next(iter(got.values()))
    assert any_row["mh_or"] == pytest.approx(mh_or, abs=2e-6)
    assert any_row["mh_chi2"] == pytest.approx(chi2, abs=2e-5)
    for s, (a, b, c, d) in cells.items():
        assert (got[s]["a"], got[s]["b"], got[s]["c"], got[s]["d"]) == (
            a,
            b,
            c,
            d,
        )


# --------------------------------------------------------------------------
# dunn_posthoc_pairs
# --------------------------------------------------------------------------


def test_dunn_matches_python(spark):
    rows = duckdb.connect().execute(
        f"""
        SELECT event_type AS grp, CAST(FLOOR(value * 10) AS BIGINT) AS b
        FROM read_parquet('{SF_SMOKE}/events.parquet')
        """
    ).fetchall()
    per_bucket = Counter(b for _, b in rows)
    below, r2 = 0, {}
    for b in sorted(per_bucket):
        t = per_bucket[b]
        r2[b] = 2 * below + t + 1
        below += t
    n_total = len(rows)
    tie = sum(t**3 - t for t in per_bucket.values())
    groups = sorted({g for g, _ in rows})
    stats = {
        g: (
            sum(1 for gg, _ in rows if gg == g),
            sum(r2[b] for gg, b in rows if gg == g),
        )
        for g in groups
    }
    sig2 = n_total * (n_total + 1) / 12.0 - tie / (12.0 * (n_total - 1))
    exp = {}
    for i, gi in enumerate(groups):
        for gj in groups[i + 1 :]:
            ni, rsi = stats[gi]
            nj, rsj = stats[gj]
            z = (rsi / (2 * ni) - rsj / (2 * nj)) / math.sqrt(
                sig2 * (1 / ni + 1 / nj)
            )
            exp[(gi, gj)] = (z, 2 * _as_sf(abs(z)))
    got = {
        (r["grp_a"], r["grp_b"]): r
        for r in all_queries()["dunn_posthoc_pairs"]
        .builder(spark, SF_SMOKE)
        .collect()
    }
    assert set(got) == set(exp)
    # BH step-up over the python p-values
    items = sorted(exp.items(), key=lambda kv: (kv[1][1], kv[0]))
    m = len(items)
    adj, best = {}, math.inf
    for i in range(m, 0, -1):
        pair, (z, p) = items[i - 1]
        best = min(best, p * m / i)
        adj[pair] = best
    for pair, (z, p) in exp.items():
        assert got[pair]["z_score"] == pytest.approx(z, abs=2e-6)
        assert got[pair]["p_value"] == pytest.approx(p, abs=2e-6)
        assert got[pair]["p_bh"] == pytest.approx(adj[pair], abs=2e-6)


# --------------------------------------------------------------------------
# jonckheere_terpstra_trend
# --------------------------------------------------------------------------


def test_jonckheere_matches_python(spark):
    rows = duckdb.connect().execute(
        f"""
        SELECT o_orderpriority AS grp,
               CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS b
        FROM read_parquet('{SF_SMOKE}/orders.parquet')
        """
    ).fetchall()
    groups = sorted({g for g, _ in rows})
    vals = {g: sorted(b for gg, b in rows if gg == g) for g in groups}
    import bisect

    j2 = 0
    for i, gi in enumerate(groups):
        for gj in groups[i + 1 :]:
            for x in vals[gj]:
                lo = bisect.bisect_left(vals[gi], x)
                hi = bisect.bisect_right(vals[gi], x)
                j2 += 2 * lo + (hi - lo)
    n = len(rows)
    ns = [len(vals[g]) for g in groups]
    e_j = (n * n - sum(x * x for x in ns)) / 4.0
    tcnt = Counter(b for _, b in rows)
    var = (
        (
            n * (n - 1) * (2 * n + 5)
            - sum(x * (x - 1) * (2 * x + 5) for x in ns)
            - sum(t * (t - 1) * (2 * t + 5) for t in tcnt.values())
        )
        / 72.0
        + sum(x * (x - 1) * (x - 2) for x in ns)
        * sum(t * (t - 1) * (t - 2) for t in tcnt.values())
        / (36.0 * n * (n - 1) * (n - 2))
        + sum(x * (x - 1) for x in ns)
        * sum(t * (t - 1) for t in tcnt.values())
        / (8.0 * n * (n - 1))
    )
    z = (j2 / 2.0 - e_j) / math.sqrt(var)
    got = (
        all_queries()["jonckheere_terpstra_trend"]
        .builder(spark, SF_SMOKE)
        .collect()[0]
    )
    assert got["n_total"] == n and got["k"] == len(groups)
    assert got["j2"] == j2
    assert got["e_j"] == pytest.approx(e_j, abs=2e-6)
    assert got["var_j"] == pytest.approx(var, rel=2e-9)
    assert got["z_score"] == pytest.approx(z, abs=2e-6)
    assert got["p_value"] == pytest.approx(2 * _as_sf(abs(z)), abs=2e-6)


# --------------------------------------------------------------------------
# weighted_kappa_ordinal
# --------------------------------------------------------------------------


def test_weighted_kappa_matches_python(spark):
    rows = duckdb.connect().execute(
        f"""
        SELECT LEAST(CAST(FLOOR(
                   ROUND(len(list_distinct(string_split(text, ' ')))
                         * 1.0 / len(string_split(text, ' ')), 4) * 5)
                   AS BIGINT), 4) AS ra,
               LEAST(CAST(FLOOR(n_chars / 200) AS BIGINT), 4) AS rb
        FROM read_parquet('{SF_SMOKE}/documents.parquet')
        """
    ).fetchall()
    n = len(rows)
    cont = Counter(rows)
    ra_m = Counter(a for a, _ in rows)
    rb_m = Counter(b for _, b in rows)
    qo = sum((a - b) ** 2 * c for (a, b), c in cont.items())
    lo = sum(abs(a - b) * c for (a, b), c in cont.items())
    qe = sum(
        (a - b) ** 2 * ra_m[a] * rb_m[b] for a in ra_m for b in rb_m
    )
    le = sum(abs(a - b) * ra_m[a] * rb_m[b] for a in ra_m for b in rb_m)
    got = (
        all_queries()["weighted_kappa_ordinal"].builder(spark, SF_SMOKE).collect()[0]
    )
    assert got["n_docs"] == n and got["qo"] == qo and got["qe"] == qe
    assert got["kappa_quadratic"] == pytest.approx(1 - n * qo / qe, abs=2e-6)
    assert got["kappa_linear"] == pytest.approx(1 - n * lo / le, abs=2e-6)
    # perfect-agreement identity: kappa of a rater with itself is 1
    assert -1.0 <= got["kappa_quadratic"] <= 1.0


# --------------------------------------------------------------------------
# western_electric_rules
# --------------------------------------------------------------------------


def test_western_electric_matches_python(spark):
    df = duckdb.connect().execute(
        f"""
        SELECT event_type, CAST(ts AS DATE) AS d,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM read_parquet('{SF_SMOKE}/events.parquet')
        GROUP BY event_type, CAST(ts AS DATE)
        """
    ).fetchdf()
    exp_flags = {}
    for et, grp in df.groupby("event_type"):
        grp = grp.sort_values("d")
        x = grp.cents.astype(float).to_numpy()
        mu = x.sum() / len(x)
        sig = math.sqrt((x * x).sum() / len(x) - mu * mu)
        z = (x - mu) / sig
        for i in range(len(z)):
            w3 = z[max(0, i - 2) : i + 1]
            w5 = z[max(0, i - 4) : i + 1]
            w8 = z[max(0, i - 7) : i + 1]
            r1 = int(abs(z[i]) > 3.0)
            r2 = int((w3 > 2.0).sum() >= 2 or (w3 < -2.0).sum() >= 2)
            r3 = int((w5 > 1.0).sum() >= 4 or (w5 < -1.0).sum() >= 4)
            r4 = int(
                len(w8) == 8 and ((w8 > 0).all() or (w8 < 0).all())
            )
            if r1 + r2 + r3 + r4:
                d = str(pd.Timestamp(grp.d.iloc[i]).date())
                exp_flags[(et, d)] = (r1, r2, r3, r4, z[i])
    got = {
        (r["event_type"], str(pd.Timestamp(r["d"]).date())): r
        for r in all_queries()["western_electric_rules"]
        .builder(spark, SF_SMOKE)
        .collect()
    }
    assert set(got) == set(exp_flags)
    for key, (r1, r2, r3, r4, z) in exp_flags.items():
        r = got[key]
        assert (r["r1"], r["r2"], r["r3"], r["r4"]) == (r1, r2, r3, r4)
        assert r["z_score"] == pytest.approx(z, abs=2e-6)
        assert r["any_signal"] == 1


# --------------------------------------------------------------------------
# wilson_score_intervals
# --------------------------------------------------------------------------


def test_wilson_matches_python(spark):
    ev = duckdb.connect().execute(
        f"""
        SELECT user_id,
               CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) * 1.0 / COUNT(*) >= 0.22
                    THEN 1 ELSE 0 END AS conv
        FROM read_parquet('{SF_SMOKE}/events.parquet')
        GROUP BY user_id
        """
    ).fetchall()
    per = defaultdict(lambda: [0, 0])
    for u, c in ev:
        a = _arm(int(u))
        per[a][0] += 1
        per[a][1] += c
    got = {
        r["arm"]: r
        for r in all_queries()["wilson_score_intervals"]
        .builder(spark, SF_SMOKE)
        .collect()
    }
    z = 1.96
    for arm, (n, conv) in per.items():
        p = conv / n
        denom = 1 + z * z / n
        center = p + z * z / (2 * n)
        half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        r = got[arm]
        assert r["n"] == n and r["conv"] == conv
        assert r["wilson_low"] == pytest.approx((center - half) / denom, abs=2e-6)
        assert r["wilson_high"] == pytest.approx((center + half) / denom, abs=2e-6)
        # Wilson stays inside [0, 1]; Wald need not
        assert 0.0 <= r["wilson_low"] <= r["wilson_high"] <= 1.0


# --------------------------------------------------------------------------
# embedding_isotropy_audit
# --------------------------------------------------------------------------


def test_isotropy_matches_python(spark):
    import numpy as np

    rows = duckdb.connect().execute(
        f"SELECT vec_id, embedding, label FROM "
        f"read_parquet('{SF_SMOKE}/embeddings.parquet')"
    ).fetchall()
    by_label = defaultdict(list)
    for _, emb, lab in rows:
        v = np.asarray(emb, dtype=np.float64)
        by_label[str(lab)].append(v / math.sqrt(float(v @ v)))
    got = {
        r["label"]: r
        for r in all_queries()["embedding_isotropy_audit"]
        .builder(spark, SF_SMOKE)
        .collect()
    }
    all_vecs = [v for vs in by_label.values() for v in vs]
    for lab, vs in list(by_label.items()) + [("__ALL__", all_vecs)]:
        n = len(vs)
        s = np.sum(vs, axis=0)
        s2 = float(s @ s)
        mean_pw = (s2 - n) / (n * (n - 1))
        # identity check: direct pairwise mean equals the resultant form
        if lab != "__ALL__" and n <= 60:
            direct = np.mean(
                [
                    float(vs[i] @ vs[j])
                    for i in range(n)
                    for j in range(n)
                    if i != j
                ]
            )
            assert mean_pw == pytest.approx(direct, abs=1e-9)
        r = got[lab]
        assert r["n"] == n
        assert r["mean_pairwise_cos"] == pytest.approx(mean_pw, abs=2e-6)
        assert r["resultant_norm_share"] == pytest.approx(
            math.sqrt(s2) / n, abs=2e-6
        )


# --------------------------------------------------------------------------
# cochran_armitage_trend
# --------------------------------------------------------------------------


def test_cochran_armitage_matches_python(spark):
    ev = duckdb.connect().execute(
        f"""
        SELECT LEAST(CAST(FLOOR(COUNT(*) / 20) AS BIGINT), 4) AS lvl,
               CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                             THEN 1 ELSE 0 END) * 1.0 / COUNT(*) >= 0.22
                    THEN 1 ELSE 0 END AS conv
        FROM read_parquet('{SF_SMOKE}/events.parquet')
        GROUP BY user_id
        """
    ).fetchall()
    n = len(ev)
    r_tot = sum(c for _, c in ev)
    cells = defaultdict(lambda: [0, 0])
    for lvl, c in ev:
        cells[lvl][0] += 1
        cells[lvl][1] += c
    wr = sum(lvl * rc for lvl, (_, rc) in cells.items())
    wn = sum(lvl * ni for lvl, (ni, _) in cells.items())
    wwn = sum(lvl * lvl * ni for lvl, (ni, _) in cells.items())
    t = (n * wr - r_tot * wn) / n
    p = r_tot / n
    var = p * (1 - p) * (wwn - wn * wn / n)
    z = t / math.sqrt(var)
    got = (
        all_queries()["cochran_armitage_trend"].builder(spark, SF_SMOKE).collect()[0]
    )
    assert got["n_users"] == n and got["n_converted"] == r_tot
    assert got["t_stat"] == pytest.approx(t, abs=2e-6)
    assert got["var_t"] == pytest.approx(var, rel=2e-9)
    assert got["z_score"] == pytest.approx(z, abs=2e-6)
    assert got["p_value"] == pytest.approx(2 * _as_sf(abs(z)), abs=2e-6)


# --------------------------------------------------------------------------
# bland_altman_agreement
# --------------------------------------------------------------------------


def test_bland_altman_matches_python(spark):
    rows = duckdb.connect().execute(
        f"""
        SELECT CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                   - d.detail_cents AS diff
        FROM read_parquet('{SF_SMOKE}/orders.parquet') o
        JOIN (SELECT l_orderkey,
                     CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                          AS BIGINT) AS detail_cents
              FROM read_parquet('{SF_SMOKE}/lineitem.parquet')
              GROUP BY l_orderkey) d
          ON o.o_orderkey = d.l_orderkey
        """
    ).fetchall()
    diffs = [int(d) for (d,) in rows]
    n = len(diffs)
    s = sum(diffs)
    ss = sum(d * d for d in diffs)  # python ints: no overflow
    bias = s / n
    sd = math.sqrt((ss - s * s / n) / (n - 1))
    lo, hi = bias - 1.96 * sd, bias + 1.96 * sd
    n_out = sum(1 for d in diffs if d < lo or d > hi)
    got = (
        all_queries()["bland_altman_agreement"].builder(spark, SF_SMOKE).collect()[0]
    )
    assert got["n_orders"] == n
    assert got["bias_cents"] == pytest.approx(bias, abs=2e-2)
    assert got["sd_cents"] == pytest.approx(sd, abs=2e-2)
    assert got["loa_low"] == pytest.approx(lo, abs=2e-2)
    assert got["loa_high"] == pytest.approx(hi, abs=2e-2)
    assert got["n_outside"] == n_out
    assert got["share_outside"] == pytest.approx(n_out / n, abs=2e-6)


# --------------------------------------------------------------------------
# friedman_test_daily
# --------------------------------------------------------------------------


def test_friedman_matches_python(spark):
    df = duckdb.connect().execute(
        f"""
        SELECT CAST(ts AS DATE) AS d, event_type,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM read_parquet('{SF_SMOKE}/events.parquet')
        GROUP BY CAST(ts AS DATE), event_type
        """
    ).fetchall()
    types = sorted({t for _, t, _ in df})
    k = len(types)
    by_day = defaultdict(dict)
    for d, t, c in df:
        by_day[d][t] = c
    blocks = {d: v for d, v in by_day.items() if len(v) == k}
    n = len(blocks)
    r2_sum = Counter()
    a2 = 0
    for d, v in blocks.items():
        vals = sorted(v.values())
        for t, c in v.items():
            below = sum(1 for x in vals if x < c)
            ties = sum(1 for x in vals if x == c)
            r2 = 2 * below + ties + 1
            r2_sum[t] += r2
            a2 += r2 * r2
    num = sum((r2_sum[t] - n * (k + 1)) ** 2 for t in types)
    chi2 = (k - 1) * num / (a2 - n * k * (k + 1) ** 2)
    got = {
        r["event_type"]: r
        for r in all_queries()["friedman_test_daily"]
        .builder(spark, SF_SMOKE)
        .collect()
    }
    assert set(got) == set(types)
    for t in types:
        assert got[t]["r2_sum"] == r2_sum[t]
        assert got[t]["n_blocks"] == n and got[t]["k"] == k
        assert got[t]["friedman_chi2"] == pytest.approx(chi2, rel=2e-9)
    # Wilson-Hilferty p in range
    assert all(0.0 <= r["p_wilson_hilferty"] <= 1.0 for r in got.values())


# --------------------------------------------------------------------------
# theils_u_uncertainty
# --------------------------------------------------------------------------


def test_theils_u_matches_python(spark):
    rows = duckdb.connect().execute(
        f"SELECT lang, source FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()
    n = len(rows)
    cl = Counter(l for l, _ in rows)
    cs = Counter(s for _, s in rows)
    cc = Counter(rows)
    h_l = -sum(v / n * math.log(v / n) for v in cl.values())
    h_s = -sum(v / n * math.log(v / n) for v in cs.values())
    mi = sum(
        v / n * math.log(n * v / (cl[l] * cs[s]))
        for (l, s), v in cc.items()
    )
    got = (
        all_queries()["theils_u_uncertainty"].builder(spark, SF_SMOKE).collect()[0]
    )
    assert got["n_docs"] == n
    assert got["h_lang"] == pytest.approx(h_l, abs=2e-6)
    assert got["h_source"] == pytest.approx(h_s, abs=2e-6)
    assert got["mutual_information"] == pytest.approx(mi, abs=2e-6)
    assert got["u_lang_given_source"] == pytest.approx(mi / h_l, abs=2e-6)
    assert got["u_source_given_lang"] == pytest.approx(mi / h_s, abs=2e-6)
    # U is a [0,1] coefficient in each direction
    assert 0.0 <= got["u_lang_given_source"] <= 1.0
    assert 0.0 <= got["u_source_given_lang"] <= 1.0


# --------------------------------------------------------------------------
# hosmer_lemeshow_gof
# --------------------------------------------------------------------------


def test_hosmer_lemeshow_matches_python(spark):
    rows = duckdb.connect().execute(
        f"""
        SELECT LEAST(CAST(FLOOR(
                   ROUND(len(list_distinct(string_split(text, ' ')))
                         * 1.0 / len(string_split(text, ' ')), 4) * 10)
                   AS BIGINT), 9) AS bin,
               CAST(ROUND(ROUND(len(list_distinct(string_split(text, ' ')))
                         * 1.0 / len(string_split(text, ' ')), 4) * 10000)
                   AS BIGINT) AS s4,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
        FROM read_parquet('{SF_SMOKE}/documents.parquet')
        """
    ).fetchall()
    bins = defaultdict(lambda: [0, 0, 0])  # n, observed, s4_sum
    for b, s4, lab in rows:
        bins[b][0] += 1
        bins[b][1] += lab
        bins[b][2] += s4
    chi2 = 0.0
    for n, o, s4s in bins.values():
        e = s4s / 10000.0
        p_bar = s4s / (n * 10000.0)
        chi2 += (o - e) ** 2 / (e * (1 - p_bar))
    g = len(bins)
    got = (
        all_queries()["hosmer_lemeshow_gof"].builder(spark, SF_SMOKE).collect()
    )
    assert len(got) == g
    for r in got:
        n, o, s4s = bins[r["bin"]]
        assert r["n"] == n and r["observed"] == o
        assert r["p_bar"] == pytest.approx(s4s / (n * 10000.0), abs=2e-6)
        assert r["hl_chi2"] == pytest.approx(chi2, abs=1e-6)
        assert r["df"] == g - 2
        assert 0.0 <= r["p_wilson_hilferty"] <= 1.0
