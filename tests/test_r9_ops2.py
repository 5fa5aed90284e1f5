"""Round-9 operator tests, batch 2: Kruskal-Wallis H, Welch ANOVA, chrF
components, the Flesch readability panel, and the quadratic-kernel MMD
two-sample moments — each checked against an independent pure-Python
rederivation on a CONSTRUCTED table where the expected behavior is known
in closed form (fixture oracle parity is covered by tools/oracle_check.py;
these tests pin the semantics the oracle merely mirrors).
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pandas as pd
import pytest

from weather_stream_processor_spark.registry import all_queries


def _write_docs(tmp_path, texts, langs=None, sources=None):
    n = len(texts)
    rows = pd.DataFrame(
        {
            "doc_id": list(range(1, n + 1)),
            "text": texts,
            "lang": langs or ["en"] * n,
            "source": sources or [f"s{i % 2}" for i in range(n)],
            "n_chars": pd.array([len(t) for t in texts], dtype="Int64"),
        }
    )
    duckdb.connect().execute(
        f"COPY (SELECT * FROM rows) TO '{tmp_path}/documents.parquet' "
        "(FORMAT PARQUET)"
    )


def _write_events(tmp_path, types_values):
    n = len(types_values)
    rows = pd.DataFrame(
        {
            "event_id": list(range(1, n + 1)),
            "ts": pd.to_datetime(
                [f"2024-01-01 00:{i % 60:02d}:00" for i in range(n)]
            ),
            "user_id": pd.array([i % 7 for i in range(n)], dtype="Int64"),
            "event_type": [t for t, _ in types_values],
            "value": [v for _, v in types_values],
            "props": ["{}"] * n,
        }
    )
    duckdb.connect().execute(
        f"COPY (SELECT * FROM rows) TO '{tmp_path}/events.parquet' "
        "(FORMAT PARQUET)"
    )


# --------------------------------------------------------------------------
# kruskal_wallis_h
# --------------------------------------------------------------------------


def _py_kruskal(types_values):
    """Classic mid-rank Kruskal-Wallis on the 0.1-bucketed values."""
    buckets = sorted({math.floor(v * 10) for _, v in types_values})
    per_bucket = Counter(math.floor(v * 10) for _, v in types_values)
    below, ranks2 = 0, {}
    for b in buckets:
        t = per_bucket[b]
        ranks2[b] = 2 * below + t + 1  # 2 * mid-rank, exact integer
        below += t
    groups = sorted({t for t, _ in types_values})
    n_total = len(types_values)
    stats = {}
    for g in groups:
        vals = [math.floor(v * 10) for t, v in types_values if t == g]
        stats[g] = (len(vals), sum(ranks2[b] for b in vals))
    h_raw = (
        3.0
        / (n_total * (n_total + 1))
        * sum(r2 * r2 / n_g for n_g, r2 in stats.values())
        - 3.0 * (n_total + 1)
    )
    ties = sum(t**3 - t for t in per_bucket.values())
    c = 1.0 - ties / (n_total**3 - n_total)
    return stats, n_total, h_raw, h_raw / c


def test_kruskal_wallis_matches_python_rederivation(spark, tmp_path):
    # three groups: one clearly shifted, heavy ties via shared buckets
    tv = (
        [("click", 0.15)] * 4
        + [("click", 0.35)] * 3
        + [("view", 0.15)] * 2
        + [("view", 0.55), ("view", 0.75)]
        + [("purchase", 9.15), ("purchase", 9.35), ("purchase", 0.15)]
    )
    _write_events(str(tmp_path), tv)
    spec = all_queries()["kruskal_wallis_h"]
    rows = {r["grp"]: r.asDict() for r in spec.builder(spark, str(tmp_path)).collect()}
    stats, n_total, h_raw, h_adj = _py_kruskal(tv)
    assert set(rows) == set(stats)
    for g, (n_g, r2) in stats.items():
        assert int(rows[g]["n_g"]) == n_g
        assert int(rows[g]["rank_sum2"]) == r2
        assert int(rows[g]["n_total"]) == n_total
        assert int(rows[g]["k"]) == len(stats)
        assert float(rows[g]["h_raw"]) == pytest.approx(h_raw, abs=1e-6)
        assert float(rows[g]["h_adj"]) == pytest.approx(h_adj, abs=1e-6)
        assert 0.0 <= float(rows[g]["p_wilson_hilferty"]) <= 1.0
    # a genuinely shifted group must push H above the all-same-values floor
    assert h_adj > 2.0


def test_kruskal_rank_sum_identity(spark, tmp_path):
    # sum of all mid-ranks == N(N+1)/2, i.e. sum(rank_sum2) == N(N+1)
    tv = [("a", 0.1), ("a", 0.2), ("b", 0.2), ("b", 0.3), ("c", 0.9)]
    _write_events(str(tmp_path), tv)
    spec = all_queries()["kruskal_wallis_h"]
    rows = spec.builder(spark, str(tmp_path)).collect()
    n = len(tv)
    assert sum(int(r["rank_sum2"]) for r in rows) == n * (n + 1)


# --------------------------------------------------------------------------
# welch_anova_sources
# --------------------------------------------------------------------------


def _py_welch(lengths_by_source):
    k = len(lengths_by_source)
    w_sum = wm_sum = 0.0
    per = {}
    for s, xs in lengths_by_source.items():
        n = len(xs)
        m = sum(xs) / n
        v = sum((x - m) ** 2 for x in xs) / (n - 1)
        per[s] = (n, sum(xs), sum(x * x for x in xs), n / v, m)
        w_sum += n / v
        wm_sum += (n / v) * m
    grand = wm_sum / w_sum
    a_num = sum(w * (m - grand) ** 2 for (_, _, _, w, m) in per.values())
    lam = sum(
        (1 - w / w_sum) ** 2 / (n - 1) for (n, _, _, w, _) in per.values()
    )
    f = (a_num / (k - 1)) / (1 + 2 * (k - 2) / (k * k - 1) * lam)
    df2 = (k * k - 1) / (3 * lam)
    return per, f, df2


def test_welch_anova_matches_python_rederivation(spark, tmp_path):
    by_src = {
        "s0": [10, 12, 14, 16],  # tight, low mean
        "s1": [100, 140, 90, 160, 110],  # wide, high mean
        "s2": [50, 52, 49, 51],  # tight, middle
    }
    texts, sources = [], []
    for s, xs in by_src.items():
        for ln in xs:
            texts.append("x" * ln)
            sources.append(s)
    _write_docs(str(tmp_path), texts, sources=sources)
    spec = all_queries()["welch_anova_sources"]
    rows = {r["source"]: r.asDict() for r in spec.builder(spark, str(tmp_path)).collect()}
    per, f, df2 = _py_welch(by_src)
    assert set(rows) == set(per)
    for s, (n, s1, s2, _, _) in per.items():
        assert int(rows[s]["n_g"]) == n
        assert int(rows[s]["sum_chars"]) == s1
        assert int(rows[s]["sumsq_chars"]) == s2
        assert int(rows[s]["k"]) == len(per)
        assert int(rows[s]["df1"]) == len(per) - 1
        assert float(rows[s]["welch_f"]) == pytest.approx(f, rel=1e-6)
        assert float(rows[s]["df2"]) == pytest.approx(df2, rel=1e-6)
    # the constructed groups are clearly separated: F must be large
    assert f > 10.0


# --------------------------------------------------------------------------
# chrf_generation_eval
# --------------------------------------------------------------------------


def _py_chrf_components(texts, drop=5, max_n=6):
    comp = {}
    for n in range(1, max_n + 1):
        ov = ct = rt = 0
        for t in texts:
            toks = t.split(" ")
            cand = "".join(
                w for i, w in enumerate(toks, start=1) if i % drop != 0
            )
            ref = "".join(toks)
            cg = Counter(cand[i : i + n] for i in range(len(cand) - n + 1))
            rg = Counter(ref[i : i + n] for i in range(len(ref) - n + 1))
            ov += sum(min(c, rg[g]) for g, c in cg.items())
            ct += sum(cg.values())
            rt += sum(rg.values())
        comp[n] = (ov, ct, rt)
    return comp


def test_chrf_matches_python_rederivation(spark, tmp_path):
    texts = [
        "the cat sat on the mat",  # drops 'the' (token 5): char overlap stays high
        "abcdef",  # single token, survives whole
        "a bb ccc dddd eeeee ffffff g",  # 7 tokens, drops 'eeeee'
        "xy",  # shorter than most n: empty gram sets guard
    ]
    _write_docs(str(tmp_path), texts)
    spec = all_queries()["chrf_generation_eval"]
    got = {
        int(r["n"]): (
            int(r["overlap_total"]),
            int(r["cand_total"]),
            int(r["ref_total"]),
        )
        for r in spec.builder(spark, str(tmp_path)).collect()
    }
    assert got == _py_chrf_components(texts)
    # chrF2 finish over the component table is well-defined and in [0, 1]
    scores = [
        (ov / ct, ov / rt) for ov, ct, rt in got.values() if ct and rt
    ]
    chrf2 = sum(
        5 * p * r / (4 * p + r) for p, r in scores if (4 * p + r) > 0
    ) / len(scores)
    assert 0.0 < chrf2 <= 1.0


# --------------------------------------------------------------------------
# flesch_readability_panel
# --------------------------------------------------------------------------


def _py_syllables(word):
    import re

    runs = len(re.findall(r"[aeiouy]+", word.lower()))
    return max(1, runs)


def test_flesch_matches_python_rederivation(spark, tmp_path):
    texts = [
        "the cat sat. the dog ran! did it?",  # 3 sentences
        "rhythm crwth tsk",  # zero-vowel words: floor-1 correction binds
        "beautiful examination onomatopoeia",  # long vowel runs
        "no terminator here",  # 0 marks -> sentence floor of 1
    ]
    sources = ["s0", "s0", "s1", "s1"]
    _write_docs(str(tmp_path), texts, sources=sources)
    spec = all_queries()["flesch_readability_panel"]
    rows = {r["source"]: r.asDict() for r in spec.builder(spark, str(tmp_path)).collect()}
    import re

    for src in ("s0", "s1"):
        docs = [t for t, s in zip(texts, sources) if s == src]
        words = sum(len(t.split(" ")) for t in docs)
        syl = sum(_py_syllables(w) for t in docs for w in t.split(" "))
        sent = sum(max(1, len(re.findall(r"[.!?]+", t))) for t in docs)
        r = rows[src]
        assert int(r["n_docs"]) == len(docs)
        assert int(r["words"]) == words
        assert int(r["syllables"]) == syl
        assert int(r["sentences"]) == sent
        fre = 206.835 - 1.015 * words / sent - 84.6 * syl / words
        fkgl = 0.39 * words / sent + 11.8 * syl / words - 15.59
        assert float(r["flesch_reading_ease"]) == pytest.approx(fre, abs=1e-6)
        assert float(r["fk_grade_level"]) == pytest.approx(fkgl, abs=1e-6)


# --------------------------------------------------------------------------
# embedding_mmd_two_sample
# --------------------------------------------------------------------------


def test_mmd_moments_match_bruteforce_kernel(spark, tmp_path):
    import numpy as np

    from weather_stream_processor_spark.operators.similarity import (
        _MMD_SCALE,
        mmd2_from_moments,
    )

    rng_rows = []
    # group 0 drawn near one shape, group 1 scaled: MMD must be > 0
    for i in range(1, 21):
        base = [(((i * 5 + j * 11) % 17) - 8) / 20.0 for j in range(8)]
        if i % 2 == 1:
            base = [2.0 * x for x in base]
        rng_rows.append((i, base, i % 2))
    emb = pd.DataFrame(
        {
            "vec_id": [r[0] for r in rng_rows],
            "embedding": [r[1] for r in rng_rows],
            "label": pd.array([r[2] for r in rng_rows], dtype="int32"),
        }
    )
    duckdb.connect().execute(
        f"COPY (SELECT * FROM emb) TO '{tmp_path}/embeddings.parquet' "
        "(FORMAT PARQUET)"
    )
    spec = all_queries()["embedding_mmd_two_sample"]
    rows = spec.builder(spark, str(tmp_path)).collect()

    K = {
        i: np.floor(np.array(v) * float(_MMD_SCALE) + 0.5).astype("int64")
        for i, v, _ in rng_rows
    }
    grp = {i: g % 2 for i, _, g in ((r[0], r[1], r[2]) for r in rng_rows)}
    A = [K[i] for i in K if grp[i] == 0]
    B = [K[i] for i in K if grp[i] == 1]

    # moment-table exactness: every (i, j) cell equals the direct sum
    for r in rows:
        i, j = int(r["i"]) - 1, int(r["j"]) - 1
        assert int(r["s_a"]) == sum(int(x[i]) * int(x[j]) for x in A)
        assert int(r["s_b"]) == sum(int(x[i]) * int(x[j]) for x in B)
        assert int(r["n_a"]) == len(A) and int(r["n_b"]) == len(B)
        assert int(r["q4_a"]) == sum(int(x @ x) ** 2 for x in A)
        assert int(r["q4_b"]) == sum(int(x @ x) ** 2 for x in B)

    # finish seam vs the O(n^2) kernel definition it avoids computing
    def kern(x, y):
        return float(int(x @ y)) ** 2

    n_a, n_b = len(A), len(B)
    e_aa = sum(
        kern(x, y) for xi, x in enumerate(A) for yi, y in enumerate(A) if xi != yi
    ) / (n_a * (n_a - 1))
    e_bb = sum(
        kern(x, y) for xi, x in enumerate(B) for yi, y in enumerate(B) if xi != yi
    ) / (n_b * (n_b - 1))
    e_ab = sum(kern(x, y) for x in A for y in B) / (n_a * n_b)
    direct = (e_aa + e_bb - 2 * e_ab) / float(_MMD_SCALE) ** 4
    via_moments = mmd2_from_moments(rows)
    assert via_moments == pytest.approx(direct, rel=1e-12)
    # the scaled group genuinely shifts the second moments
    assert via_moments > 0


# --------------------------------------------------------------------------
# brown_forsythe_spread_test
# --------------------------------------------------------------------------


def _py_brown_forsythe(types_values):
    cents = {}
    for t, v in types_values:
        cents.setdefault(t, []).append(math.floor(v * 100 + 0.5))
    med = {}
    for t, xs in cents.items():
        xs = sorted(xs)
        # lower median: smallest value whose cumulative count doubles past n
        cum = 0
        for x in xs:
            cum += 1
            if 2 * cum >= len(xs):
                med[t] = x
                break
    z = {t: [abs(x - med[t]) for x in xs] for t, xs in cents.items()}
    k = len(z)
    n_total = sum(len(v) for v in z.values())
    grand = sum(sum(v) for v in z.values()) / n_total
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in z.values())
    ssw = sum(
        sum(x * x for x in v) - sum(v) ** 2 / len(v) for v in z.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n_total - k))
    stats = {
        t: (len(v), med[t], sum(v), sum(x * x for x in v))
        for t, v in z.items()
    }
    return stats, f, k, n_total


def test_brown_forsythe_matches_python_rederivation(spark, tmp_path):
    tv = (
        [("a", 0.10), ("a", 0.12), ("a", 0.14), ("a", 0.16)]  # tight
        + [("b", 0.10), ("b", 1.50), ("b", 3.00), ("b", 9.90)]  # wide
        + [("c", 0.50), ("c", 0.50), ("c", 0.52)]  # ties at the median
    )
    _write_events(str(tmp_path), tv)
    spec = all_queries()["brown_forsythe_spread_test"]
    rows = {r["grp"]: r.asDict() for r in spec.builder(spark, str(tmp_path)).collect()}
    stats, f, k, n_total = _py_brown_forsythe(tv)
    assert set(rows) == set(stats)
    for g, (n_g, m, sz, ssz) in stats.items():
        r = rows[g]
        assert int(r["n_g"]) == n_g
        assert int(r["med_cents"]) == m
        assert int(r["sum_z"]) == sz
        assert int(r["sumsq_z"]) == ssz
        assert int(r["k"]) == k
        assert int(r["df1"]) == k - 1
        assert int(r["df2"]) == n_total - k
        assert float(r["bf_f"]) == pytest.approx(f, rel=1e-6)
    # the wide group must dominate: F clearly above 1
    assert f > 1.0


# --------------------------------------------------------------------------
# cochran_q_screens
# --------------------------------------------------------------------------


def test_cochran_q_matches_python_rederivation(spark, tmp_path):
    # construct docs that disagree across the three screens
    long_doc = "tok " * 99 + "tok"  # 100 tokens, 1 distinct: fails unique
    rich_doc = " ".join(f"w{i}" for i in range(60))  # passes tokens+unique
    short_doc = "a b a"  # fails all but unique (2 distinct of 3)
    texts = [long_doc, rich_doc, short_doc, rich_doc]
    _write_docs(str(tmp_path), texts)
    spec = all_queries()["cochran_q_screens"]
    r = spec.builder(spark, str(tmp_path)).collect()[0].asDict()
    flags = []
    for t in texts:
        toks = t.split(" ")
        flags.append(
            (
                1 if len(t) >= 300 else 0,
                1 if len(toks) >= 50 else 0,
                1 if 2 * len(set(toks)) >= len(toks) else 0,
            )
        )
    c = [sum(fl[j] for fl in flags) for j in range(3)]
    rsum = sum(sum(fl) for fl in flags)
    r2sum = sum(sum(fl) ** 2 for fl in flags)
    q = 2.0 * (3.0 * sum(x * x for x in c) - rsum**2) / (3.0 * rsum - r2sum)
    assert int(r["n"]) == len(texts)
    assert [int(r["c_len"]), int(r["c_tok"]), int(r["c_uniq"])] == c
    assert int(r["sum_r"]) == rsum and int(r["sum_r2"]) == r2sum
    assert float(r["q_stat"]) == pytest.approx(q, abs=1e-6)
    assert float(r["p_value"]) == pytest.approx(math.exp(-q / 2), abs=1e-6)


# --------------------------------------------------------------------------
# cronbach_alpha_reliability
# --------------------------------------------------------------------------


def test_cronbach_alpha_matches_python_rederivation(spark, tmp_path):
    texts = [
        " ".join(f"w{i}" for i in range(10)),
        " ".join(f"w{i % 5}" for i in range(30)),
        "x " * 199 + "x",
        " ".join(f"t{i}" for i in range(80)),
    ]
    _write_docs(str(tmp_path), texts)
    spec = all_queries()["cronbach_alpha_reliability"]
    r = spec.builder(spark, str(tmp_path)).collect()[0].asDict()
    items = []
    for t in texts:
        toks = t.split(" ")
        items.append((min(len(t), 400), len(toks), len(set(toks))))
    n = len(items)
    totals = [sum(it) for it in items]

    def var(xs):
        m = sum(xs) / len(xs)
        return sum((x - m) ** 2 for x in xs) / len(xs)

    alpha = 1.5 * (
        1 - sum(var([it[j] for it in items]) for j in range(3)) / var(totals)
    )
    assert int(r["n"]) == n
    for j, (s_col, ss_col) in enumerate(
        [("s1", "ss1"), ("s2", "ss2"), ("s3", "ss3")]
    ):
        assert int(r[s_col]) == sum(it[j] for it in items)
        assert int(r[ss_col]) == sum(it[j] ** 2 for it in items)
    assert int(r["st"]) == sum(totals)
    assert int(r["sst"]) == sum(t * t for t in totals)
    assert float(r["cronbach_alpha"]) == pytest.approx(alpha, abs=1e-6)


# --------------------------------------------------------------------------
# ccf_click_purchase_leadlag
# --------------------------------------------------------------------------


def test_ccf_detects_constructed_lead(spark, tmp_path):
    # clicks on day d, purchases echo exactly 2 days later: ccf peak at +2
    rows = []
    counts = [5, 9, 2, 7, 3, 8, 1, 6, 4, 10]
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append(("click", d))
        for _ in range(c):
            rows.append(("purchase", d + 2))
    n = len(rows)
    pdf = pd.DataFrame(
        {
            "event_id": list(range(1, n + 1)),
            "ts": pd.to_datetime(
                [f"2024-01-{d + 1:02d} 12:00:00" for _, d in rows]
            ),
            "user_id": pd.array([i % 5 for i in range(n)], dtype="Int64"),
            "event_type": [t for t, _ in rows],
            "value": [1.0] * n,
            "props": ["{}"] * n,
        }
    )
    duckdb.connect().execute(
        f"COPY (SELECT * FROM pdf) TO '{tmp_path}/events.parquet' "
        "(FORMAT PARQUET)"
    )
    spec = all_queries()["ccf_click_purchase_leadlag"]
    got = {
        int(r["lag"]): r.asDict()
        for r in spec.builder(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(range(-7, 8))
    # the echoed series correlates perfectly at lag +2
    assert float(got[2]["ccf"]) == pytest.approx(1.0, abs=1e-6)
    # moments are exact integers: verify one lag by hand
    x = {d: c for d, c in enumerate(counts)}  # clicks per day
    y = {d + 2: c for d, c in enumerate(counts)}  # purchases per day
    days = sorted(set(x) | set(y))
    xs = {d: x.get(d, 0) for d in days}
    ys = {d: y.get(d, 0) for d in days}
    lag = 2
    # the operator's overlap rule: day-grid self-join on d + lag
    pairs = [
        (xs[d], ys.get(d + lag, 0)) for d in days if (d + lag) in days
    ]
    assert int(got[lag]["n_days"]) == len(pairs)
    assert int(got[lag]["sx"]) == sum(p[0] for p in pairs)
    assert int(got[lag]["sy"]) == sum(p[1] for p in pairs)
    assert int(got[lag]["sxy"]) == sum(p[0] * p[1] for p in pairs)


# --------------------------------------------------------------------------
# cer_generation_eval
# --------------------------------------------------------------------------


def _py_lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


def test_cer_matches_python_rederivation(spark, tmp_path):
    import re

    texts = [
        "the cat sat on the mat today",  # 7 tokens: drops token 6 ('mat')
        "a b c d e f g h i j k l",  # 12 tokens: drops 2
        "short",  # survives whole, edits = 0
        "naïve café test µ",  # non-ASCII: projection contract binds
    ]
    sources = ["s0", "s0", "s1", "s1"]
    _write_docs(str(tmp_path), texts, sources=sources)
    spec = all_queries()["cer_generation_eval"]
    rows = {r["source"]: r.asDict() for r in spec.builder(spark, str(tmp_path)).collect()}
    for src in ("s0", "s1"):
        docs = [t for t, s in zip(texts, sources) if s == src]
        edits = chars = 0
        for t in docs:
            toks = t.split(" ")
            cand = " ".join(
                w for i, w in enumerate(toks, start=1) if i % 6 != 0
            )
            proj = lambda s: re.sub(r"[^\x20-\x7e]", "#", s)
            edits += _py_lev(proj(cand), proj(t))
            chars += len(proj(t))
        r = rows[src]
        assert int(r["n_docs"]) == len(docs)
        assert int(r["total_edits"]) == edits
        assert int(r["total_ref_chars"]) == chars
        assert float(r["cer"]) == pytest.approx(edits / chars, abs=1e-6)


# --------------------------------------------------------------------------
# effect_size_panel
# --------------------------------------------------------------------------


def test_effect_size_matches_python_rederivation(spark, tmp_path):
    by_src = {"s0": [10, 12, 14], "s1": [100, 120, 140, 160], "s2": [50, 52]}
    texts, sources = [], []
    for s, xs in by_src.items():
        for ln in xs:
            texts.append("y" * ln)
            sources.append(s)
    _write_docs(str(tmp_path), texts, sources=sources)
    spec = all_queries()["effect_size_panel"]
    rows = {r["source"]: r.asDict() for r in spec.builder(spark, str(tmp_path)).collect()}
    for s, xs in by_src.items():
        rest = []
        for s2, xs2 in by_src.items():
            if s2 != s:
                rest.extend(xs2)
        n_g, n_r = len(xs), len(rest)
        m_g, m_r = sum(xs) / n_g, sum(rest) / n_r
        css_g = sum((x - m_g) ** 2 for x in xs)
        css_r = sum((x - m_r) ** 2 for x in rest)
        pooled = math.sqrt((css_g + css_r) / (n_g + n_r - 2))
        d = (m_g - m_r) / pooled
        g_h = d * (1 - 3 / (4 * (n_g + n_r) - 9))
        r = rows[s]
        assert int(r["n_g"]) == n_g
        assert int(r["sum_chars"]) == sum(xs)
        assert int(r["sumsq_chars"]) == sum(x * x for x in xs)
        assert float(r["cohens_d"]) == pytest.approx(d, abs=1e-6)
        assert float(r["hedges_g"]) == pytest.approx(g_h, abs=1e-6)
        assert float(r["log_mean_ratio"]) == pytest.approx(
            math.log(m_g / m_r), abs=1e-6
        )


# --------------------------------------------------------------------------
# partial_correlation_screen
# --------------------------------------------------------------------------


def test_partial_correlation_identity_on_fixture(spark):
    """On the smoke fixture: partials must satisfy the defining identity
    against raw correlations computed independently by DuckDB."""
    from tests.conftest import SF_SMOKE

    spec = all_queries()["partial_correlation_screen"]
    rows = {r["pair"]: r.asDict() for r in spec.builder(spark, SF_SMOKE).collect()}
    con = duckdb.connect()
    r_qp, r_qd, r_pd = con.execute(
        f"""SELECT corr(l_quantity, l_extendedprice),
                   corr(l_quantity, l_discount),
                   corr(l_extendedprice, l_discount)
            FROM read_parquet('{SF_SMOKE}/lineitem.parquet')"""
    ).fetchone()

    def part(rxy, rxz, ryz):
        return (rxy - rxz * ryz) / math.sqrt(
            (1 - rxz * rxz) * (1 - ryz * ryz)
        )

    assert float(
        rows["quantity__extendedprice"]["r_partial"]
    ) == pytest.approx(part(r_qp, r_qd, r_pd), abs=2e-6)
    assert float(rows["quantity__discount"]["r_partial"]) == pytest.approx(
        part(r_qd, r_qp, r_pd), abs=2e-6
    )
    assert float(
        rows["extendedprice__discount"]["r_partial"]
    ) == pytest.approx(part(r_pd, r_qp, r_qd), abs=2e-6)
    # controlling a near-independent third variable barely moves r
    assert abs(
        float(rows["quantity__extendedprice"]["r_raw"])
        - float(rows["quantity__extendedprice"]["r_partial"])
    ) < 0.2


# --------------------------------------------------------------------------
# image_phash_near_dup
# --------------------------------------------------------------------------


def test_image_phash_matches_bruteforce_all_pairs(spark):
    """Brute-force rederivation on the smoke fixture: recompute every
    asset's aHash bands from the pixel closed form in numpy, then compare
    (a) every band integer and (b) the banded join's partner counts
    against an ALL-PAIRS Hamming scan — empirically certifying the
    pigeonhole exact-recall lemma (4 bands, threshold 3)."""
    import numpy as np

    from tests.conftest import SF_SMOKE
    from weather_stream_processor_spark.operators.multimodal import (
        _PH_HAM_MAX,
        _ahash_bands,
    )

    spec = all_queries()["image_phash_near_dup"]
    rows = {
        int(r["asset_id"]): r.asDict()
        for r in spec.builder(spark, SF_SMOKE).collect()
    }
    con = duckdb.connect()
    ids = [
        i
        for (i,) in con.execute(
            f"SELECT doc_id FROM read_parquet('{SF_SMOKE}/documents.parquet') "
            "WHERE doc_id % 3 = 0"
        ).fetchall()
    ]
    assert set(rows) == set(ids)
    bands = {}
    for aid in ids:
        w, h = aid % 32 + 4, aid % 24 + 4
        rr = (np.arange(h, dtype=np.int64) * 31)[:, None]
        cc = (np.arange(w, dtype=np.int64) * 13)[None, :]
        arr = ((aid * 7 + rr + cc) % 256).astype(np.int64)
        bands[aid] = _ahash_bands(arr)
        got = rows[aid]
        assert [int(got[f"band{i}"]) for i in range(4)] == bands[aid]
    # all-pairs truth vs the banded join's partner counts
    partners = {aid: 0 for aid in ids}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = sum(
                bin(x ^ y).count("1") for x, y in zip(bands[a], bands[b])
            )
            if ham <= _PH_HAM_MAX:
                partners[a] += 1
                partners[b] += 1
    for aid in ids:
        assert int(rows[aid]["near_dups"]) == partners[aid], aid
    # the fixture genuinely contains near-duplicate images
    assert sum(partners.values()) > 0


def test_chrf_single_pass_equals_union_form(spark, tmp_path):
    """The registered gear-pass chrF plan must be bit-identical to BOTH
    relational twins (grid explode and 12-way union — the CDC explode-
    form pattern): all three count the same gram multisets, so the
    exact-integer component tables cannot differ — this pins that each
    plan rewrite stays a pure reformulation."""
    from weather_stream_processor_spark.operators.evals import (
        _chrf_grid_form,
        _chrf_union_form,
        chrf_generation_eval,
    )

    texts = [
        "the cat sat on the mat today and yesterday",
        "abcdef",
        "a bb ccc dddd eeeee ffffff g",
        "xy",
        "",  # empty doc: zero grams at every order
    ]
    from tests.conftest import SF_SMOKE

    _write_docs(str(tmp_path), texts)
    for sf_dir in (str(tmp_path), SF_SMOKE):
        new = {
            int(r["n"]): (int(r["overlap_total"]), int(r["cand_total"]), int(r["ref_total"]))
            for r in chrf_generation_eval(spark, sf_dir).collect()
        }
        for twin in (_chrf_grid_form, _chrf_union_form):
            old = {
                int(r["n"]): (int(r["overlap_total"]), int(r["cand_total"]), int(r["ref_total"]))
                for r in twin(spark, sf_dir).collect()
            }
            assert new == old, twin.__name__


def test_mmd_null_label_contract(spark, tmp_path):
    """NULL-labeled vectors are EXCLUDED by explicit contract on both
    engines (the oracle's conditional sums would silently drop them while
    the numpy % crashes on object dtype — the asymmetric edge-contract
    class the r8 advice flagged)."""
    emb = pd.DataFrame(
        {
            "vec_id": [1, 2, 3, 4, 5, 6],
            "embedding": [[0.1 * i, -0.2 * i, 0.05] for i in range(1, 7)],
            "label": pd.array([0, 1, None, 0, 1, None], dtype="Int32"),
        }
    )
    duckdb.connect().execute(
        f"COPY (SELECT * FROM emb) TO '{tmp_path}/embeddings.parquet' "
        "(FORMAT PARQUET)"
    )
    spec = all_queries()["embedding_mmd_two_sample"]
    rows = spec.builder(spark, str(tmp_path)).collect()
    assert rows, "non-null labels must still produce the moment table"
    for r in rows:
        assert int(r["n_a"]) == 2 and int(r["n_b"]) == 2
    oracle = duckdb.connect()
    oracle.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    opdf = oracle.execute(spec.oracle).fetchdf()
    assert len(opdf) == len(rows)
    assert int(opdf["n_a"].iloc[0]) == 2 and int(opdf["n_b"].iloc[0]) == 2
