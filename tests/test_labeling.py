"""Labeling/model-eval batch tests: Cohen's kappa, majority vote, pass@k,
MRR, average precision, isotonic calibration, Bradley-Terry, and the
count-min sketch rollup — each re-derived in pure Python on the smoke
fixture, beyond what the oracle hash-gate proves (the hash says
Spark==DuckDB; these say both equal the textbook definition)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from tests.conftest import SF_SMOKE

STOP = ("the", "a", "of", "and", "to", "in")
_KNUTH = 2654435761
_MOD = 2147483647


def _run(spark, name, sf=SF_SMOKE):
    from weather_stream_processor_spark.registry import all_queries

    return all_queries()[name].builder(spark, sf)


def _docs(spark, sf=SF_SMOKE):
    from weather_stream_processor_spark.sources import load_table

    return [
        (int(r.doc_id), r.text, r.lang, r.source)
        for r in load_table(spark, sf, "documents")
        .select("doc_id", "text", "lang", "source")
        .collect()
    ]


def _predict(text: str) -> str:
    toks = text.split(" ")
    dens = sum(1 for t in toks if t in STOP) / len(toks)
    return "en" if dens >= 0.05 else "unknown"  # fixture text has no CJK


def test_cohens_kappa_matches_confusion_matrix(spark):
    docs = _docs(spark)
    a = [_predict(t) for _, t, _, _ in docs]
    b = [lang for _, _, lang, _ in docs]
    n = len(docs)
    po = sum(1 for x, y in zip(a, b) if x == y) / n
    ca, cb = Counter(a), Counter(b)
    pe = sum(ca[c] * cb.get(c, 0) for c in ca) / (n * n)
    kappa = (po - pe) / (1 - pe)
    row = _run(spark, "cohens_kappa_agreement").collect()[0]
    assert row.n_items == n
    assert abs(row.po - po) < 1e-6
    assert abs(row.pe - pe) < 1e-6
    assert abs(row.kappa - kappa) < 1e-6


def test_majority_vote_rederivation(spark):
    docs = _docs(spark)
    flips = {
        (d, r): ((((d * 31 + r) % _MOD) * _KNUTH) >> 16) % 10 == 0
        for d, _, _, _ in docs
        for r in range(3)
    }
    rows = {r.annotator: r for r in _run(spark, "majority_vote_labels").collect()}
    assert set(rows) == {0, 1, 2}
    for r in range(3):
        match = flip_n = 0
        for d, _, _, _ in docs:
            consensus = sum(flips[(d, rr)] for rr in range(3)) >= 2
            match += flips[(d, r)] == consensus
            flip_n += flips[(d, r)]
        assert rows[r].n_docs == len(docs)
        assert rows[r].n_match_consensus == match
        assert abs(rows[r].accuracy - match / len(docs)) < 1e-6
        assert abs(rows[r].flip_rate - flip_n / len(docs)) < 1e-6
        # an annotator that flips ~10% must still mostly agree with the
        # 2-of-3 consensus
        assert rows[r].accuracy > 0.8


def test_pass_at_k_matches_comb(spark):
    from weather_stream_processor_spark.sources import load_table

    ev = [
        (int(r.user_id), r.event_type)
        for r in load_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_type")
        .collect()
    ]
    n = Counter(u for u, _ in ev)
    c = Counter(u for u, t in ev if t == "purchase")
    rows = {r.k: r for r in _run(spark, "pass_at_k_estimator").collect()}
    for k in (1, 5, 10):
        vals = []
        for u, nu in n.items():
            if nu < k:
                continue
            cu = c.get(u, 0)
            if nu - cu < k:
                vals.append(1.0)
            else:
                vals.append(1.0 - math.comb(nu - cu, k) / math.comb(nu, k))
        assert rows[k].n_tasks == len(vals)
        assert abs(rows[k].pass_at_k - sum(vals) / len(vals)) < 1e-6
    # monotone in k: more samples can only help
    assert rows[1].pass_at_k <= rows[5].pass_at_k <= rows[10].pass_at_k


def _scored_docs(docs):
    out = []
    for d, t, lang, src in docs:
        toks = t.split(" ")
        out.append((d, src, round(len(set(toks)) / len(toks), 4), lang == "en"))
    return out


def test_mrr_matches_bruteforce_sort(spark):
    docs = _scored_docs(_docs(spark))
    by_src = defaultdict(list)
    for d, src, score, rel in docs:
        by_src[src].append((d, score, rel))
    rows = {r.source: r for r in _run(spark, "mrr_first_relevant").collect()}
    rrs = []
    for src, items in by_src.items():
        ranked = sorted(items, key=lambda x: (-x[1], x[0]))
        rank = next(i + 1 for i, (_, _, rel) in enumerate(ranked) if rel)
        doc = ranked[rank - 1][0]
        assert rows[src].first_rel_rank == rank
        assert rows[src].first_rel_doc == doc
        assert abs(rows[src].reciprocal_rank - round(1.0 / rank, 6)) < 1e-9
        rrs.append(1.0 / rank)
    mrr = sum(rrs) / len(rrs)
    for r in rows.values():
        assert abs(r.mrr - mrr) < 1e-6


def test_average_precision_matches_step_curve(spark):
    docs = _scored_docs(_docs(spark))
    grid = defaultdict(lambda: [0, 0])
    for _, _, score, rel in docs:
        grid[score][0 if rel else 1] += 1
    n_pos = sum(v[0] for v in grid.values())
    cum_pos = cum_all = 0
    ap = 0.0
    for s in sorted(grid, reverse=True):
        pos, neg = grid[s]
        cum_pos += pos
        cum_all += pos + neg
        ap += pos * (cum_pos / cum_all)
    ap /= n_pos
    row = _run(spark, "average_precision_exact").collect()[0]
    assert row.n_pos == n_pos
    assert abs(row.average_precision - ap) < 1e-6
    # AP of any non-degenerate ranking beats 0 and is at most 1
    assert 0.0 < row.average_precision <= 1.0


def _pav(pairs):
    """Classic pool-adjacent-violators on [(weight, value)] in order."""
    pools = [[w, w * v] for w, v in pairs]  # [weight, weighted-sum]
    out_idx = [[i] for i in range(len(pairs))]
    i = 0
    while i < len(pools) - 1:
        if pools[i][1] / pools[i][0] > pools[i + 1][1] / pools[i + 1][0] + 1e-15:
            pools[i][0] += pools[i + 1][0]
            pools[i][1] += pools[i + 1][1]
            out_idx[i].extend(out_idx[i + 1])
            del pools[i + 1], out_idx[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    fitted = {}
    for pool, idxs in zip(pools, out_idx):
        for j in idxs:
            fitted[j] = pool[1] / pool[0]
    return fitted


def test_isotonic_matches_pav_and_is_monotone(spark):
    docs = _scored_docs(_docs(spark))
    bins = defaultdict(lambda: [0, 0])
    for _, _, score, rel in docs:
        b = min(int(score * 50), 49)
        bins[b][0] += 1
        bins[b][1] += 1 if rel else 0
    order = sorted(bins)
    fitted = _pav([(bins[b][0], bins[b][1] / bins[b][0]) for b in order])
    expect = {b: fitted[i] for i, b in enumerate(order)}
    rows = sorted(
        _run(spark, "isotonic_calibration_bins").collect(), key=lambda r: r.bin
    )
    assert [r.bin for r in rows] == order
    for r in rows:
        assert r.n == bins[r.bin][0]
        assert r.pos == bins[r.bin][1]
        assert abs(r.calibrated - expect[r.bin]) < 1e-6, r.bin
    # monotone non-decreasing (allow 6-dp rounding slack)
    for prev, cur in zip(rows, rows[1:]):
        assert cur.calibrated >= prev.calibrated - 1e-6


def _bt_matrix(spark):
    from weather_stream_processor_spark.sources import load_table

    li = [
        (int(r.l_orderkey), int(r.l_partkey), float(r.l_extendedprice))
        for r in load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey", "l_extendedprice")
        .collect()
    ]
    brand = {
        int(r.p_partkey): r.p_brand
        for r in load_table(spark, SF_SMOKE, "part")
        .select("p_partkey", "p_brand")
        .collect()
    }
    best = {}
    for ok, pk, price in li:
        key = (ok, brand[pk])
        best[key] = max(best.get(key, 0.0), price)
    wins, games = Counter(), Counter()
    per_order = defaultdict(list)
    for (ok, b), price in best.items():
        per_order[ok].append((b, price))
    for items in per_order.values():
        for i, (ba, pa) in enumerate(items):
            for bb, pb in items[i + 1 :]:
                lo, plo, hi, phi = (
                    (ba, pa, bb, pb) if ba < bb else (bb, pb, ba, pa)
                )
                games[(lo, hi)] += 1
                if plo >= phi:
                    wins[(lo, hi)] += 1
    return wins, games


def test_bradley_terry_rederivation(spark):
    from weather_stream_processor_spark.operators.labeling import _bt_mm

    wins, games = _bt_matrix(spark)
    rows = [
        {"brand_a": a, "brand_b": b, "wins_a": wins[(a, b)], "games": g}
        for (a, b), g in games.items()
    ]
    expect = _bt_mm(rows)
    out = _run(spark, "bradley_terry_strengths").collect()
    assert abs(sum(r.strength for r in out) - 1.0) < 1e-4
    got = {r.brand: r for r in out}
    assert set(got) == set(expect)
    for b, p in expect.items():
        assert abs(got[b].strength - round(p, 6)) < 1e-9, b
        w = sum(wins[k] for k in wins if k[0] == b) + sum(
            games[k] - wins[k] for k in wins if k[1] == b
        )
        assert got[b].wins == w
    # ranks are 1..B by strength desc, brand asc
    ranked = sorted(out, key=lambda r: (-r.strength, r.brand))
    assert [r.rank for r in ranked] == list(range(1, len(out) + 1))


def test_countmin_overestimates_and_matches_python_sketch(spark):
    from weather_stream_processor_spark.operators.aggregates import (
        _CMS_A,
        _CMS_B,
        _CMS_D,
        _CMS_W,
    )
    from weather_stream_processor_spark.operators.dedup import (
        _SH_MOD,
        _SH_POW31,
        _SH_POW37,
    )

    docs = _docs(spark)
    counts = Counter(t for _, text, _, _ in docs for t in text.split(" "))

    def vhash(tok: str) -> int:
        s31 = sum(ord(c) * _SH_POW31[i % 16] for i, c in enumerate(tok)) % _SH_MOD
        s37 = sum(ord(c) * _SH_POW37[i % 16] for i, c in enumerate(tok)) % _SH_MOD
        return s31 + s37 * 2147483648

    sketch = [Counter() for _ in range(_CMS_D)]
    for tok, cnt in counts.items():
        h = vhash(tok) % _SH_MOD
        for r in range(_CMS_D):
            sketch[r][((h * _CMS_A[r] + _CMS_B[r]) % _SH_MOD) % _CMS_W] += cnt

    rows = _run(spark, "countmin_sketch_rollup").collect()
    assert len(rows) == 20
    probes = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert {r.tok for r in rows} == {t for t, _ in probes}
    for r in rows:
        h = vhash(r.tok) % _SH_MOD
        est = min(
            sketch[d][((h * _CMS_A[d] + _CMS_B[d]) % _SH_MOD) % _CMS_W]
            for d in range(_CMS_D)
        )
        assert r.exact_cnt == counts[r.tok]
        assert r.est_cnt == est
        # the CMS one-sided guarantee
        assert r.overestimate >= 0
        assert r.est_cnt >= r.exact_cnt


# ---------------------------------------------------------------------------
# Round-5i: clustering external metrics, Fleiss, Dawid-Skene, gains chart,
# Good-Turing.
# ---------------------------------------------------------------------------


def test_clustering_metrics_match_sklearn_formulas(spark):
    """Re-derive purity/ARI/NMI from the kmeans assignment + labels with
    the textbook contingency-table formulas."""
    from weather_stream_processor_spark.registry import all_queries
    from weather_stream_processor_spark.sources import load_table

    assign = {
        int(r.vec_id): int(r.cluster_id)
        for r in all_queries()["kmeans_embedding_clusters"]
        .builder(spark, SF_SMOKE)
        .collect()
    }
    labels = {
        int(r.vec_id): int(r.label)
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    cont = Counter((assign[v], labels[v]) for v in assign)
    n = sum(cont.values())
    a = Counter()
    b = Counter()
    for (ci, lj), nij in cont.items():
        a[ci] += nij
        b[lj] += nij
    purity = sum(
        max(nij for (ci, _), nij in cont.items() if ci == c) for c in a
    ) / n

    def c2(x):
        return x * (x - 1) // 2

    idx = sum(c2(nij) for nij in cont.values())
    sa, sb = sum(c2(x) for x in a.values()), sum(c2(x) for x in b.values())
    exp = sa * sb / c2(n)
    ari = (idx - exp) / ((sa + sb) / 2 - exp)
    mi = sum(
        (nij / n) * math.log(n * nij / (a[ci] * b[lj]))
        for (ci, lj), nij in cont.items()
    )
    hu = -sum((x / n) * math.log(x / n) for x in a.values())
    hv = -sum((x / n) * math.log(x / n) for x in b.values())
    nmi = mi / math.sqrt(hu * hv)

    row = _run(spark, "clustering_external_metrics").collect()[0]
    assert row.n_points == n
    assert abs(row.purity - purity) < 1e-6
    assert abs(row.ari - ari) < 1e-6
    assert abs(row.nmi - nmi) < 1e-6
    assert -0.5 <= row.ari <= 1.0 and 0.0 <= row.nmi <= 1.0


def _vote_cat(doc_id, r, lang):
    flip = ((((doc_id * 31 + r) % _MOD) * _KNUTH) >> 16) % 10 == 0
    return "noise" if flip else lang


def test_fleiss_kappa_rederivation(spark):
    docs = _docs(spark)
    cells = Counter()
    for d, _, lang, _ in docs:
        for r in range(3):
            cells[(d, _vote_cat(d, r, lang))] += 1
    n_items, n_r = len(docs), 3
    sum_sq = sum(v * v for v in cells.values())
    p_bar = (sum_sq - n_items * n_r) / (n_items * n_r * (n_r - 1))
    cat_tot = Counter()
    for (_, c), v in cells.items():
        cat_tot[c] += v
    p_e = sum(v * v for v in cat_tot.values()) / (n_items * n_items * n_r * n_r)
    kappa = (p_bar - p_e) / (1 - p_e)
    row = _run(spark, "fleiss_kappa_agreement").collect()[0]
    assert row.n_items == n_items
    assert abs(row.p_bar - p_bar) < 1e-6
    assert abs(row.p_e - p_e) < 1e-6
    assert abs(row.fleiss_kappa - kappa) < 1e-6


def test_dawid_skene_rederivation(spark):
    docs = _docs(spark)
    votes = {
        (d, r): _vote_cat(d, r, lang) for d, _, lang, _ in docs for r in range(3)
    }
    cons = {}
    for d, _, lang, _ in docs:
        noise = sum(votes[(d, r)] == "noise" for r in range(3))
        cons[d] = "noise" if noise >= 2 else lang
    conf = Counter()
    denom = Counter()
    for (d, r), obs in votes.items():
        conf[(r, cons[d], obs)] += 1
        denom[(r, cons[d])] += 1
    prior = Counter(cons.values())
    n_docs = len(docs)
    cats = sorted({v for v in votes.values()})
    expect = {}
    for d, _, lang, _ in docs:
        best = None
        for t in cats:
            if prior[t] == 0:
                continue
            score = prior[t] / n_docs
            for r in range(3):
                o = votes[(d, r)]
                score = score * (
                    conf[(r, t, o)] / denom[(r, t)] if denom[(r, t)] else 0.0
                )
            score_e9 = math.floor(score * 1e9)
            if best is None or (-score_e9, t) < (-best[0], best[1]):
                best = (score_e9, t)
        expect[d] = best
    rows = {r.doc_id: r for r in _run(spark, "dawid_skene_correction").collect()}
    assert set(rows) == set(expect)
    for d, (score_e9, t) in expect.items():
        assert rows[d].ds_label == t, d
        assert rows[d].score_e9 == score_e9, d
        assert rows[d].consensus == cons[d]
        assert rows[d].changed == int(t != cons[d])


def test_cumulative_gains_rederivation(spark):
    docs = _scored_docs(_docs(spark))
    grid = defaultdict(lambda: [0, 0])
    for _, _, score, rel in docs:
        grid[score][0 if rel else 1] += 1
    n = len(docs)
    n_pos = sum(v[0] for v in grid.values())
    rows = {r.decile: r for r in _run(spark, "cumulative_gains_deciles").collect()}
    assert set(rows) == set(range(1, 11))
    prev_gain = 0.0
    for d in range(1, 11):
        cutoff = (n * d + 9) // 10
        ab = pb = 0
        for s in sorted(grid, reverse=True):
            pos, neg = grid[s]
            if ab + pos + neg >= cutoff:
                captured = pb + pos * (cutoff - ab) / (pos + neg)
                break
            ab += pos + neg
            pb += pos
        r = rows[d]
        assert r.cutoff_rows == cutoff
        assert abs(r.captured_pos - captured) < 1e-6
        assert abs(r.gain - captured / n_pos) < 1e-6
        assert abs(r.lift - (captured / n_pos) / (cutoff / n)) < 1e-5
        # gains are monotone; lift at decile 10 is exactly 1
        assert r.gain >= prev_gain - 1e-9
        prev_gain = r.gain
    assert abs(rows[10].gain - 1.0) < 1e-9
    assert abs(rows[10].lift - 1.0) < 1e-9


def test_good_turing_rederivation(spark):
    docs = _docs(spark)
    counts = Counter(t for _, text, _, _ in docs for t in text.split(" "))
    total = sum(counts.values())
    v = len(counts)
    f1 = sum(1 for c in counts.values() if c == 1)
    f2 = sum(1 for c in counts.values() if c == 2)
    row = _run(spark, "good_turing_vocab_coverage").collect()[0]
    assert row.total_tokens == total
    assert row.vocab_size == v
    assert row.f1 == f1 and row.f2 == f2
    assert abs(row.missing_mass - f1 / total) < 1e-6
    assert abs(row.coverage - (1 - f1 / total)) < 1e-6
    assert abs(row.chao1_vocab - (v + f1 * (f1 - 1) / (2 * (f2 + 1)))) < 0.01
    # the richness bound can never be below the observed vocabulary
    assert row.chao1_vocab >= v


# ---------------------------------------------------------------------------
# Round-5j: QL retrieval, Mann-Whitney, Poisson bootstrap, binary quant.
# ---------------------------------------------------------------------------


def test_query_likelihood_matches_dense_scoring(spark):
    """The sparse const+delta decomposition must equal the dense
    textbook score sum_t ln((tf + mu*p)/(dl + mu)) for every ranked doc."""
    docs = _docs(spark)
    terms = ("spark", "join", "window")
    mu = 2000.0
    total = sum(len(t.split(" ")) for _, t, _, _ in docs)
    cf = Counter()
    for _, text, _, _ in docs:
        for t in text.split(" "):
            if t in terms:
                cf[t] += 1
    scores = {}
    for d, text, _, _ in docs:
        toks = text.split(" ")
        tfs = Counter(t for t in toks if t in terms)
        s = sum(
            math.log((tfs[t] + mu * cf[t] / total) / (len(toks) + mu))
            for t in terms
        )
        scores[d] = round(s, 6)
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = [
        (r.doc_id, r.ql_score)
        for r in _run(spark, "query_likelihood_dirichlet").collect()
    ]
    got = sorted(rows, key=lambda kv: (-kv[1], kv[0]))
    assert [d for d, _ in got] == [d for d, _ in expect]
    for (gd, gs), (ed, es) in zip(got, expect):
        assert abs(gs - es) < 2e-6, gd


def test_mann_whitney_matches_midrank_u(spark):
    from weather_stream_processor_spark.sources import load_table

    ev = [
        (r.event_type, float(r.value))
        for r in load_table(spark, SF_SMOKE, "events")
        .select("event_type", "value")
        .collect()
        if r.event_type in ("click", "purchase")
    ]
    a = sorted(math.floor(v * 10) for t, v in ev if t == "click")
    b = sorted(math.floor(v * 10) for t, v in ev if t == "purchase")
    # brute-force mid-rank U
    u = 0.0
    for x in a:
        for y in b:
            u += 1.0 if x > y else (0.5 if x == y else 0.0)
    n1, n2 = len(a), len(b)
    n = n1 + n2
    ties = Counter(a + b)
    tie_term = sum(t**3 - t for t in ties.values())
    var = n1 * n2 / 12.0 * ((n + 1) - tie_term / (n * (n - 1)))
    z = (u - n1 * n2 / 2.0) / math.sqrt(var)
    row = _run(spark, "mann_whitney_u_test").collect()[0]
    assert row.n_a == n1 and row.n_b == n2
    assert abs(row.u_stat - u) < 1e-6
    assert abs(row.z_score - z) < 1e-6
    assert abs(row.rank_biserial - (2 * u / (n1 * n2) - 1)) < 1e-6
    assert 0.0 <= row.p_value <= 1.0


def test_poisson_bootstrap_ci_properties(spark):
    """Deterministic weights; CI brackets the point estimate; SE is
    positive and on the right scale (~sd/sqrt(n))."""
    from weather_stream_processor_spark.sources import load_table

    prices = [
        float(r.o_totalprice)
        for r in load_table(spark, SF_SMOKE, "orders")
        .select("o_totalprice")
        .collect()
    ]
    row = _run(spark, "poisson_bootstrap_ci").collect()[0]
    mean = sum(round(p * 100) for p in prices) / len(prices) / 100.0
    assert row.n_rows == len(prices)
    assert abs(row.point_est - mean) < 1e-4
    assert row.ci_lo < row.point_est < row.ci_hi
    sd = math.sqrt(
        sum((p - mean) ** 2 for p in prices) / (len(prices) - 1)
    )
    se_theory = sd / math.sqrt(len(prices))
    assert 0.3 * se_theory < row.boot_se < 3.0 * se_theory
    # determinism: second run bit-identical
    again = _run(spark, "poisson_bootstrap_ci").collect()[0]
    assert again == row


def test_binary_quant_recall_matches_numpy(spark):
    import numpy as np

    from weather_stream_processor_spark.sources import load_table

    emb = {
        int(r.vec_id): np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }
    ids = sorted(emb)
    rows = {r.qid: r for r in _run(spark, "binary_quant_recall").collect()}
    assert set(rows) == set(range(8))
    for qid in range(8):
        qv = emb[qid]
        sims = {
            v: round(
                float(emb[v] @ qv / (np.linalg.norm(emb[v]) * np.linalg.norm(qv))),
                6,
            )
            for v in ids
            if v != qid
        }
        exact = {
            v
            for v, _ in sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        }
        qb = qv > 0
        hams = {
            v: int(np.sum((emb[v] > 0) != qb)) for v in ids if v != qid
        }
        btop = {
            v for v, _ in sorted(hams.items(), key=lambda kv: (kv[1], kv[0]))[:10]
        }
        assert rows[qid].n_overlap == len(exact & btop), qid
    # quality floor is aggregate only: the fixture embeddings are
    # near-orthogonal (sign-sketch's documented worst case, see the LSH
    # commentary in similarity.py), so individual queries can land 0
    assert sum(r.n_overlap for r in rows.values()) >= 4


# ---------------------------------------------------------------------------
# Round-5k: CUPED, Brier decomposition, BH-FDR.
# ---------------------------------------------------------------------------


def test_cuped_matches_numpy_moments(spark):
    import numpy as np

    from weather_stream_processor_spark.sources import load_table

    ev = [
        (int(r.user_id), r.ts.isoformat(), r.event_type)
        for r in load_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_type")
        .collect()
    ]
    split = "2024-01-16"
    xs, ys = Counter(), Counter()
    users = set()
    for u, ts, et in ev:
        users.add(u)
        if ts < split:
            xs[u] += 1
        elif et == "purchase":
            ys[u] += 1
    u_list = sorted(users)
    x = np.array([xs[u] for u in u_list], dtype=float)
    y = np.array([ys[u] for u in u_list], dtype=float)
    cov = (x * y).mean() - x.mean() * y.mean()
    var_x, var_y = x.var(), y.var()
    row = _run(spark, "cuped_variance_reduction").collect()[0]
    assert row.n == len(u_list)
    assert abs(row.theta - cov / var_x) < 1e-6
    assert abs(row.var_y - var_y) < 1e-6
    assert abs(row.var_y_cuped - (var_y - cov**2 / var_x)) < 1e-6
    # adjusted variance can never exceed the raw variance
    assert row.var_y_cuped <= row.var_y + 1e-9
    assert 0.0 <= row.var_reduction <= 1.0


def test_brier_decomposition_identity(spark):
    """brier == reliability - resolution + uncertainty + within_bin_var
    (exact for binned forecasts), and brier matches the direct mean
    squared error."""
    docs = _scored_docs(_docs(spark))
    n = len(docs)
    brier = sum((s - (1 if rel else 0)) ** 2 for _, _, s, rel in docs) / n
    row = _run(spark, "brier_score_decomposition").collect()[0]
    assert row.n == n
    assert abs(row.brier - brier) < 1e-6
    lhs = (
        row.reliability
        - row.resolution
        + row.uncertainty
        + row.within_bin_var
        - 2 * row.within_bin_cov
    )
    assert abs(row.brier - lhs) < 1e-5  # each term rounded 6dp
    assert row.reliability >= 0 and row.resolution >= 0
    assert 0 <= row.uncertainty <= 0.25


def test_bh_fdr_rederivation(spark):
    import numpy as np

    docs = _docs(spark)
    from weather_stream_processor_spark.sources import load_table

    chars = defaultdict(list)
    for r in (
        load_table(spark, SF_SMOKE, "documents")
        .select("source", "n_chars")
        .collect()
    ):
        chars[r.source].append(int(r.n_chars))
    sources = sorted(chars)
    m = len(sources)

    def sf(z):
        t = 1.0 / (1.0 + 0.2316419 * z)
        poly = t * (
            0.319381530
            + t * (-0.356563782 + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429)))
        )
        return math.exp(-z * z / 2.0) / math.sqrt(2 * math.pi) * poly

    ps = {}
    for s in sources:
        a = np.array(chars[s], dtype=float)
        rest = np.array(
            [v for s2 in sources if s2 != s for v in chars[s2]], dtype=float
        )
        z = (a.mean() - rest.mean()) / math.sqrt(
            a.var(ddof=1) / len(a) + rest.var(ddof=1) / len(rest)
        )
        ps[s] = 2.0 * sf(abs(z))
    order = sorted(sources, key=lambda s: (ps[s], s))
    adj = {}
    running = 1.0
    for i in range(m - 1, -1, -1):
        s = order[i]
        running = min(running, ps[s] * m / (i + 1))
        adj[s] = running
    rows = {r.source: r for r in _run(spark, "bh_fdr_correction").collect()}
    assert set(rows) == set(sources)
    for s in sources:
        assert abs(rows[s].p_value - ps[s]) < 1e-6, s
        assert abs(rows[s].p_adj - adj[s]) < 1e-6, s
        assert rows[s].significant == (adj[s] < 0.05)
        # BH can only raise p-values
        assert rows[s].p_adj >= rows[s].p_value - 1e-9


# ---------------------------------------------------------------------------
# Round-5l: Spark-4-native VARIANT and XML wire handling.
# ---------------------------------------------------------------------------


def test_variant_extraction_matches_json_strings(spark):
    from weather_stream_processor_spark.sources import load_table

    import json

    ev = [
        (r.event_type, r.props)
        for r in load_table(spark, SF_SMOKE, "events")
        .select("event_type", "props")
        .collect()
    ]
    sums = Counter()
    ns = Counter()
    for et, props in ev:
        sums[et] += json.loads(props)["k"]
        ns[et] += 1
    rows = {r.event_type: r for r in _run(spark, "variant_props_pipeline").collect()}
    assert set(rows) == set(ns)
    for et in ns:
        assert rows[et].n_events == ns[et]
        assert rows[et].sum_k == sums[et]
        # a missing path must be NULL for every row, never an error
        assert rows[et].n_missing_path == ns[et]
        assert rows[et].variant_schema == "OBJECT<k: BIGINT>"


def test_xml_roundtrip_is_lossless(spark):
    df = _run(spark, "xml_wire_roundtrip")
    n = df.count()
    assert n > 0
    from pyspark.sql import functions as F

    mismatched = df.filter(
        (F.col("event_id") != F.col("event_id_rt"))
        | (F.col("event_type") != F.col("event_type_rt"))
    ).count()
    assert mismatched == 0
    # the wire format is the pinned element form
    one = df.limit(1).collect()[0]
    assert one.wire_xml.startswith("<ROW>") and one.wire_xml.endswith("</ROW>")
    assert f"<event_id>{one.event_id}</event_id>" in one.wire_xml


# ---------------------------------------------------------------------------
# Round-5m: deterministic shuffle, join-order advisor.
# ---------------------------------------------------------------------------


def test_corpus_shuffle_is_a_permutation(spark):
    docs = _docs(spark)
    rows = _run(spark, "deterministic_corpus_shuffle").collect()
    assert len(rows) == len(docs)
    # bijection: every doc appears exactly once
    assert {r.doc_id for r in rows} == {d for d, _, _, _ in docs}
    # positions within each shard are exactly 1..n_shard
    shards = defaultdict(list)
    for r in rows:
        assert r.shard == r.h % 64
        shards[r.shard].append(r.pos)
    for poss in shards.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # determinism: re-run bit-identical
    again = _run(spark, "deterministic_corpus_shuffle").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))
    # it actually shuffles: shard order must not follow doc_id order
    by_doc = sorted(rows, key=lambda r: r.doc_id)
    assert len({r.shard for r in by_doc[:64]}) > 8


def test_join_order_advisor_counts_and_pick(spark):
    from weather_stream_processor_spark.sources import load_table

    orders = {
        int(r.o_orderkey): r.o_orderdate.isoformat()
        for r in load_table(spark, SF_SMOKE, "orders")
        .select("o_orderkey", "o_orderdate")
        .collect()
    }
    keep = {k for k, d in orders.items() if "1995-01-01" <= d < "1996-01-01"}
    li = [
        int(r.l_orderkey)
        for r in load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey")
        .collect()
    ]
    n_ol = sum(1 for k in li if k in keep)
    rows = {r.plan: r for r in _run(spark, "join_order_advisor").collect()}
    assert rows["orders_lineitem_first"].intermediate_rows == n_ol
    assert rows["orders_customer_first"].intermediate_rows == len(keep)
    assert all(r.final_rows == n_ol for r in rows.values())
    # PK-FK fan-out: lineitem-first is always the bigger intermediate
    assert rows["orders_customer_first"].recommended
    assert not rows["orders_lineitem_first"].recommended


# ---------------------------------------------------------------------------
# Round-5n: feature-store primitives.
# ---------------------------------------------------------------------------


def _events(spark):
    from weather_stream_processor_spark.sources import load_table

    return [
        (int(r.event_id), int(r.user_id), r.ts, r.event_type, float(r.value))
        for r in load_table(spark, SF_SMOKE, "events")
        .select("event_id", "user_id", "ts", "event_type", "value")
        .collect()
    ]


def test_point_in_time_features_no_leakage(spark):
    ev = _events(spark)
    by_user = defaultdict(list)
    for e in ev:
        by_user[e[1]].append(e)
    rows = {r.event_id: r for r in _run(spark, "point_in_time_features").collect()}
    n_purch = sum(1 for e in ev if e[3] == "purchase")
    assert len(rows) == n_purch
    for u, items in by_user.items():
        items.sort(key=lambda e: (e[2], e[0]))
        clicks = views = errors = cents = 0
        last_click = None
        for eid, _, ts, et, val in items:
            if et == "purchase":
                r = rows[eid]
                assert r.clicks_before == clicks, eid
                assert r.views_before == views
                assert r.errors_before == errors
                assert r.value_cents_before == cents
                if last_click is None:
                    assert r.last_click_gap_us is None
                else:
                    gap = int(
                        (ts - last_click).total_seconds() * 1_000_000
                    )
                    assert abs(r.last_click_gap_us - gap) <= 1, eid
            if et == "click":
                clicks += 1
                last_click = ts
            elif et == "view":
                views += 1
            elif et == "error":
                errors += 1
            cents += round(val * 100)


def test_future_window_labels_rederivation(spark):
    ev = _events(spark)
    by_user = defaultdict(list)
    for e in ev:
        by_user[e[1]].append(e)
    rows = {r.event_id: r for r in _run(spark, "future_window_labels").collect()}
    horizon = 7 * 24 * 3600 * 1_000_000
    checked = 0
    for u, items in by_user.items():
        items.sort(key=lambda e: (e[2], e[0]))
        for i, (eid, _, ts, et, _) in enumerate(items):
            if et == "purchase":
                continue
            future = [
                x[2]
                for x in items[i + 1 :]
                if x[3] == "purchase"
            ]
            r = rows[eid]
            if not future:
                assert r.next_purchase_gap_us is None
                assert r.label_purchase_7d == 0
            else:
                gap = int((min(future) - ts).total_seconds() * 1_000_000)
                assert abs(r.next_purchase_gap_us - gap) <= 1, eid
                assert r.label_purchase_7d == (1 if gap <= horizon else 0)
            checked += 1
    assert checked == len(rows)
    # sanity: with ~30 days of data some rows are positive and some not
    labels = {r.label_purchase_7d for r in rows.values()}
    assert labels == {0, 1}


# ---------------------------------------------------------------------------
# Round-5o: rank correlations + PACF.
# ---------------------------------------------------------------------------


def _user_xy(spark):
    ev = _events(spark)
    agg = defaultdict(lambda: [0, 0])
    for _, u, _, _, val in ev:
        agg[u][0] += 1
        agg[u][1] += round(val * 100)
    return [(x, cents // 1000) for x, cents in agg.values()]


def test_spearman_matches_midrank_pearson(spark):
    import numpy as np

    pairs = _user_xy(spark)
    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]

    def midranks(v):
        order = sorted(range(len(v)), key=lambda i: v[i])
        ranks = [0.0] * len(v)
        i = 0
        while i < len(v):
            j = i
            while j < len(v) and v[order[j]] == v[order[i]]:
                j += 1
            for t in order[i:j]:
                ranks[t] = (i + j + 1) / 2.0
            i = j
        return np.array(ranks)

    rx, ry = midranks(xs), midranks(ys)
    rho = float(np.corrcoef(rx, ry)[0, 1])
    row = _run(spark, "spearman_rank_correlation").collect()[0]
    assert row.n == len(pairs)
    assert abs(row.spearman_rho - rho) < 1e-6


def test_kendall_tau_b_matches_bruteforce(spark):
    pairs = _user_xy(spark)
    c = d = 0
    for i in range(len(pairs)):
        for j in range(i + 1, len(pairs)):
            dx = pairs[i][0] - pairs[j][0]
            dy = pairs[i][1] - pairs[j][1]
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
    n = len(pairs)
    n0 = n * (n - 1) // 2
    tx = Counter(p[0] for p in pairs)
    ty = Counter(p[1] for p in pairs)
    n1 = sum(v * (v - 1) // 2 for v in tx.values())
    n2 = sum(v * (v - 1) // 2 for v in ty.values())
    tau = (c - d) / math.sqrt((n0 - n1) * (n0 - n2))
    row = _run(spark, "kendall_tau_b").collect()[0]
    assert row.n == n
    assert row.concordant == c and row.discordant == d
    assert abs(row.kendall_tau_b - tau) < 1e-6
    # with ties, |tau| <= 1 must still hold
    assert -1.0 <= row.kendall_tau_b <= 1.0


def test_pacf_rederivation_and_lag1_identity(spark):
    from weather_stream_processor_spark.operators.timeseries import (
        _durbin_levinson,
    )

    acf = {
        (r.event_type, r.lag): (float(r.acf) if r.acf is not None else 0.0)
        for r in _run(spark, "acf_daily_value").collect()
    }
    rows = {
        (r.event_type, r.lag): r.pacf
        for r in _run(spark, "pacf_durbin_levinson").collect()
    }
    types = sorted({t for t, _ in acf})
    for et in types:
        series = [acf[(et, k)] for k in range(1, 8)]
        expect = _durbin_levinson(series)
        for k in range(1, 8):
            assert abs(rows[(et, k)] - round(expect[k - 1], 6)) < 1e-9
        # lag-1 identity: pacf(1) == acf(1)
        assert abs(rows[(et, 1)] - round(acf[(et, 1)], 6)) < 1e-9


# ---------------------------------------------------------------------------
# Round-5p: geospatial ops.
# ---------------------------------------------------------------------------


def _geo_coords(ids):
    out = {}
    for i in ids:
        hy = (((i * 7) % _MOD) * _KNUTH) >> 16
        hx = (((i * 13) % _MOD) * _KNUTH) >> 16
        out[i] = (40 + (hy % 2000) / 1000.0, -74 + (hx % 4000) / 1000.0)
    return out


def _haversine(p, q):
    from math import asin, cos, radians, sin, sqrt

    dlat = radians(q[0] - p[0]) / 2
    dlon = radians(q[1] - p[1]) / 2
    a = sin(dlat) ** 2 + cos(radians(p[0])) * cos(radians(q[0])) * sin(dlon) ** 2
    return 2 * 6371.0 * asin(sqrt(a))


def test_nearest_station_matches_bruteforce(spark):
    ev = _events(spark)
    users = sorted({e[1] for e in ev})
    ucoords = _geo_coords(users)
    scoords = _geo_coords([s + 10007 for s in range(20)])
    rows = {r.user_id: r for r in _run(spark, "haversine_nearest_station").collect()}
    assert set(rows) == set(users)
    for u in users:
        dists = sorted(
            (round(_haversine(ucoords[u], scoords[s + 10007]), 4), s)
            for s in range(20)
        )
        d, s = dists[0]
        assert rows[u].station_id == s, u
        assert abs(rows[u].dist_km - d) < 1e-9


def test_geo_block_join_complete_vs_bruteforce(spark):
    """The grid blocking must find EVERY pair within the radius that the
    O(n^2) sweep finds — the no-false-negative claim, tested."""
    ev = _events(spark)
    users = sorted({e[1] for e in ev})
    coords = _geo_coords(users)
    expect = set()
    for i, a in enumerate(users):
        for b in users[i + 1 :]:
            d = round(_haversine(coords[a], coords[b]), 4)
            if d <= 5.0:
                expect.add((min(a, b), max(a, b), d))
    got = {
        (r.user_a, r.user_b, r.dist_km)
        for r in _run(spark, "geo_block_pair_join").collect()
    }
    assert got == expect
    # the blocking premise itself: 0.1 deg of longitude at lat 42 is
    # ~8.2 km > the 5 km radius, so one-cell probing suffices
    assert _haversine((42.0, 0.0), (42.0, 0.1)) > 5.0


# ---------------------------------------------------------------------------
# Round-5q: alias table + v-optimal histogram.
# ---------------------------------------------------------------------------


def test_alias_table_mass_reconstruction(spark):
    rows = _run(spark, "alias_method_sampling_table").collect()
    n = len(rows)
    assert n > 0
    mass = defaultdict(float)
    p_target = {}
    for r in rows:
        assert 0.0 <= r.cell_prob <= 1.0 + 1e-9
        # each cell contributes cell_prob/n to its own term and the
        # remainder to the alias
        mass[r.term] += r.cell_prob / n
        mass[r.alias_term] += (1.0 - r.cell_prob) / n
        p_target[r.term] = r.p_target
    assert abs(sum(p_target.values()) - 1.0) < 1e-3  # 6dp rounding
    tot_t = sum(p_target.values())
    for t, p in p_target.items():
        # reconstruction matches the (renormalized) published target
        assert abs(mass[t] - p / tot_t) < 5e-6, t
    # determinism
    again = _run(spark, "alias_method_sampling_table").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in rows]


def test_v_optimal_histogram_beats_equi_width_and_is_optimal(spark):
    from itertools import combinations

    from weather_stream_processor_spark.operators.evals import _v_optimal_dp

    docs = _docs(spark)
    from weather_stream_processor_spark.sources import load_table

    chars = [
        int(r.n_chars)
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("n_chars")
        .collect()
    ]
    grid = sorted(Counter(chars).items())
    rows = sorted(_run(spark, "v_optimal_histogram").collect(), key=lambda r: r.bucket)
    # buckets partition the grid contiguously and count every row
    assert rows[0].lo == grid[0][0] and rows[-1].hi == grid[-1][0]
    assert sum(r.n_rows for r in rows) == len(chars)
    for a, b in zip(rows, rows[1:]):
        assert a.hi < b.lo
    total_sse = sum(r.sse for r in rows)
    # beats (or matches) equi-width on the same grid
    assert total_sse <= rows[0].equi_width_sse + 1e-6
    # optimality vs exhaustive enumeration at B=3 on the same grid
    def seg_sse(i, j):
        w = sum(c for _, c in grid[i : j + 1])
        s = sum(c * v for v, c in grid[i : j + 1])
        s2 = sum(c * v * v for v, c in grid[i : j + 1])
        return s2 - s * s / w

    g = len(grid)
    best = min(
        seg_sse(0, c1 - 1) + seg_sse(c1, c2 - 1) + seg_sse(c2, g - 1)
        for c1, c2 in combinations(range(1, g), 2)
    )
    dp = _v_optimal_dp(grid, 3)
    dp_sse = sum(seg_sse(i, j) for i, j in dp)
    assert abs(dp_sse - best) < 1e-6


# ---------------------------------------------------------------------------
# Round-5r: Qini uplift curve.
# ---------------------------------------------------------------------------


def test_qini_curve_rederivation(spark):
    ev = _events(spark)
    per_user = defaultdict(lambda: [0, 0, 0])  # events, purchases, clicks
    for _, u, _, et, _ in ev:
        per_user[u][0] += 1
        if et == "purchase":
            per_user[u][1] += 1
        elif et == "click":
            per_user[u][2] += 1
    users = []
    for u, (n, p, c) in per_user.items():
        arm = ((((u % _MOD) * _KNUTH) >> 16) % 2)
        conv = 1 if p / n >= 0.22 else 0
        users.append((c, arm, conv))
    # rank desc by score with fractional ties exactly as the operator
    grid = defaultdict(lambda: [0, 0, 0, 0])
    for s, arm, conv in users:
        g = grid[s]
        if arm == 1:
            g[0] += 1
            g[1] += conv
        else:
            g[2] += 1
            g[3] += conv
    n = len(users)
    rows = {int(r.decile): r for r in _run(spark, "qini_curve_deciles").collect()}
    assert set(rows) == set(range(1, 11))
    for d in range(1, 11):
        cutoff = (n * d + 9) // 10
        pop_b = tnb = tpb = cnb = cpb = 0
        for s in sorted(grid, reverse=True):
            tn, tp, cn, cp = grid[s]
            block = tn + cn
            if pop_b + block >= cutoff:
                frac = (cutoff - pop_b) / block
                t_n, t_p = tnb + tn * frac, tpb + tp * frac
                c_n, c_p = cnb + cn * frac, cpb + cp * frac
                break
            pop_b += block
            tnb += tn
            tpb += tp
            cnb += cn
            cpb += cp
        r = rows[d]
        assert r.cutoff_rows == cutoff
        assert abs(r.t_n - t_n) < 1e-6 and abs(r.c_n - c_n) < 1e-6
        qini = t_p - c_p * (t_n / c_n)
        assert abs(r.qini - qini) < 1e-5, d
    # the curve ends at the overall qini; the random baseline is linear
    # through the same endpoint
    assert abs(rows[10].qini - rows[10].qini_random) < 1e-5


def test_competing_risks_identity_and_rederivation(spark):
    """AJ identity CIF1 + CIF2 == 1 - S(t) on every grid row, plus a full
    pure-Python re-derivation of the estimator."""
    ev = _events(spark)
    per = {}
    for eid, u, ts, et, val in ev:
        rec = per.setdefault(u, {"e": None, "l": None, "p": None, "er": None})
        rec["e"] = ts if rec["e"] is None else min(rec["e"], ts)
        rec["l"] = ts if rec["l"] is None else max(rec["l"], ts)
        if et == "purchase" and val > 90:
            rec["p"] = ts if rec["p"] is None else min(rec["p"], ts)
        if et == "error" and val > 90:
            rec["er"] = ts if rec["er"] is None else min(rec["er"], ts)
    lives = []
    for rec in per.values():
        if rec["p"] is not None and (rec["er"] is None or rec["p"] <= rec["er"]):
            lives.append(((rec["p"].date() - rec["e"].date()).days, 1))
        elif rec["er"] is not None:
            lives.append(((rec["er"].date() - rec["e"].date()).days, 2))
        else:
            lives.append(((rec["l"].date() - rec["e"].date()).days, 0))
    n = len(lives)
    grid = sorted({d for d, _ in lives})
    rows = {r.lifetime_days: r for r in _run(spark, "competing_risks_incidence").collect()}
    assert set(rows) == set(grid)
    at_risk = n
    s = 1.0
    cif1 = cif2 = 0.0
    for d in grid:
        d1 = sum(1 for dd, e in lives if dd == d and e == 1)
        d2 = sum(1 for dd, e in lives if dd == d and e == 2)
        ending = sum(1 for dd, _ in lives if dd == d)
        r = rows[d]
        assert r.n_at_risk == at_risk
        assert r.d_purchase == d1 and r.d_error == d2
        cif1 += s * d1 / at_risk
        cif2 += s * d2 / at_risk
        s *= 1.0 - (d1 + d2) / at_risk
        assert abs(r.survival - s) < 1e-5, d
        assert abs(r.cif_purchase - cif1) < 1e-5, d
        assert abs(r.cif_error - cif2) < 1e-5, d
        # the AJ identity
        assert abs((r.cif_purchase + r.cif_error) - (1.0 - r.survival)) < 2e-5
        at_risk -= ending


# ---------------------------------------------------------------------------
# Round-5s: diff-in-diff + Horvitz-Thompson.
# ---------------------------------------------------------------------------


def test_diff_in_diff_rederivation(spark):
    ev = _events(spark)
    cells = defaultdict(lambda: [0, 0])  # (arm, post) -> [events, purchases]
    daily = defaultdict(lambda: [0, 0])  # (arm, day) pre-period
    import datetime

    origin = datetime.date(2024, 1, 1)
    for _, u, ts, et, _ in ev:
        arm = (((u % _MOD) * _KNUTH) >> 16) % 2
        post = 1 if ts.isoformat() >= "2024-01-16" else 0
        y = 1 if et == "purchase" else 0
        cells[(arm, post)][0] += 1
        cells[(arm, post)][1] += y
        if post == 0:
            d = (ts.date() - origin).days
            daily[(arm, d)][0] += 1
            daily[(arm, d)][1] += y

    def rate(a, p):
        n, s = cells[(a, p)]
        return s / n

    did = rate(1, 1) - rate(1, 0) - (rate(0, 1) - rate(0, 0))

    def slope(a):
        pts = [(d, s / n) for (ar, d), (n, s) in daily.items() if ar == a]
        nd = len(pts)
        sx = sum(d for d, _ in pts)
        sy = sum(r for _, r in pts)
        sxy = sum(d * r for d, r in pts)
        sxx = sum(d * d for d, _ in pts)
        return (sxy / nd - (sx / nd) * (sy / nd)) / (
            sxx / nd - (sx / nd) ** 2
        )

    row = _run(spark, "diff_in_diff_estimator").collect()[0]
    assert row._chk
    assert abs(row.treat_pre - rate(1, 0)) < 1e-6
    assert abs(row.ctrl_post - rate(0, 1)) < 1e-6
    assert abs(row.did_estimate - did) < 1e-6
    assert abs(row.pre_trend_gap - (slope(1) - slope(0))) < 1e-6
    # hash arms on the same traffic: pre-trends should be near-parallel
    assert abs(row.pre_trend_gap) < 0.05


def test_horvitz_thompson_design_unbiasedness(spark):
    from weather_stream_processor_spark.sources import load_table

    orders = [
        (int(r.o_orderkey), r.o_orderpriority[0], round(float(r.o_totalprice) * 100))
        for r in load_table(spark, SF_SMOKE, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .collect()
    ]
    ds = {"1": 5, "2": 4, "3": 3, "4": 2, "5": 1}  # d = pi*10
    rows = {r.stratum: r for r in _run(spark, "horvitz_thompson_total").collect()}
    for st, d in ds.items():
        pop = [(k, c) for k, s, c in orders if s == st]
        samp = [
            c
            for k, c in pop
            if ((((k % _MOD) * _KNUTH) >> 16) % 1000) < d * 100
        ]
        r = rows[st]
        assert r.pi_pct == d * 10
        assert r.n_sampled == len(samp)
        assert r.true_count == len(pop)
        # exact Euclidean pairs: q*d + rem reconstructs the scaled value
        assert r.ht_count_q * d + r.ht_count_r == len(samp) * 10
        assert 0 <= r.ht_count_r < d
        s_cents = sum(samp)
        assert r.ht_total_cents_q * d + r.ht_total_cents_r == s_cents * 10
        assert 0 <= r.ht_total_cents_r < d
        t_cents = sum(c for _, c in pop)
        assert r.true_total_cents == t_cents
        # exact integer fraction for the relative error; design recovers
        # the stratum total to sampling accuracy
        assert r.rel_num == abs(s_cents * 10 - t_cents * d)
        assert r.rel_den == t_cents * d
        assert r.rel_num / r.rel_den < 0.2
        # HT with uniform in-stratum pi equals the classic expansion
        # estimator: floor(n/pi) == ht_count_q
        assert r.ht_count_q == (len(samp) * 10) // d


# ---------------------------------------------------------------------------
# Round-5t: drawdown + streaks.
# ---------------------------------------------------------------------------


def _daily_cents(spark):
    ev = _events(spark)
    daily = defaultdict(int)
    for _, _, ts, et, val in ev:
        daily[(et, ts.date())] += round(val * 100)
    return daily


def test_max_drawdown_rederivation(spark):
    daily = _daily_cents(spark)
    types = sorted({t for t, _ in daily})
    rows = {r.event_type: r for r in _run(spark, "max_drawdown_daily").collect()}
    for et in types:
        days = sorted(d for t, d in daily if t == et)
        cum = peak = 0
        best = 0
        trough = None
        peak_cum = 0
        for d in days:
            cum += daily[(et, d)]
            peak = max(peak, cum)
            peak_cum = max(peak_cum, peak)
            draw = peak - cum
            if draw > best:
                best, trough = draw, d
        r = rows[et]
        assert abs(r.max_drawdown - best / 100.0) < 1e-6, et
        assert abs(r.peak_cumulative - peak_cum / 100.0) < 1e-6
        if best > 0:
            assert r.trough_day == trough, et


def test_longest_streak_rederivation(spark):
    daily = _daily_cents(spark)
    types = sorted({t for t, _ in daily})
    rows = {
        r.event_type: r for r in _run(spark, "longest_updays_streak").collect()
    }
    for et in types:
        days = sorted(d for t, d in daily if t == et)
        best = cur = 0
        best_start = cur_start = None
        for prev, d in zip(days, days[1:]):
            if daily[(et, d)] > daily[(et, prev)]:
                if cur == 0:
                    cur_start = d
                cur += 1
                if cur > best:
                    best, best_start = cur, cur_start
            else:
                cur = 0
        r = rows[et]
        assert r.longest_up_streak == best, et
        if best > 0:
            assert r.streak_start == best_start, et


# ---------------------------------------------------------------------------
# Round-5u: information gain.
# ---------------------------------------------------------------------------


def test_information_gain_rederivation(spark):
    docs = _docs(spark)
    feats = []
    for d, text, lang, src in docs:
        y = 1 if lang == "en" else 0
        feats.append(
            {
                "source": src,
                "len_bucket": str(len(text) // 100),
                "tok_bucket": str(len(text.split(" ")) // 20),
                "y": y,
            }
        )

    def h(pos, n):
        if pos == 0 or pos == n:
            return 0.0
        p, q = pos / n, (n - pos) / n
        return -(p * math.log(p) + q * math.log(q)) / math.log(2)

    rows = {r.feature: r for r in _run(spark, "information_gain_features").collect()}
    n = len(feats)
    pos = sum(f["y"] for f in feats)
    hy = h(pos, n)
    for feat in ("source", "len_bucket", "tok_bucket"):
        cells = defaultdict(lambda: [0, 0])
        for f in feats:
            cells[f[feat]][0] += 1
            cells[f[feat]][1] += f["y"]
        cond = sum((c / n) * h(p, c) for c, p in cells.values())
        hf = sum(-(c / n) * math.log(c / n) / math.log(2) for c, _ in cells.values())
        r = rows[feat]
        assert r.n_values == len(cells)
        assert abs(r.h_y - hy) < 1e-6
        assert abs(r.cond_h - cond) < 1e-6
        assert abs(r.info_gain - (hy - cond)) < 1e-6
        assert abs(r.gain_ratio - (hy - cond) / hf) < 1e-6
        # IG is non-negative and bounded by H(y)
        assert -1e-9 <= r.info_gain <= hy + 1e-9


def test_eval_scorecard_consistent_with_constituents(spark):
    """Every scorecard row must equal the value its registered
    constituent reports directly — the composition can never drift."""
    rows = {r.metric: r.value for r in _run(spark, "eval_scorecard_report").collect()}
    auc = _run(spark, "roc_auc_exact").collect()[0]
    ap = _run(spark, "average_precision_exact").collect()[0]
    brier = _run(spark, "brier_score_decomposition").collect()[0]
    ece = max(r.ece for r in _run(spark, "calibration_bins_ece").collect())
    gains = {r.decile: r.lift for r in _run(spark, "cumulative_gains_deciles").collect()}
    assert rows["auc"] == auc.auc and rows["gini"] == auc.gini
    assert rows["average_precision"] == ap.average_precision
    assert rows["prevalence"] == ap.prevalence
    assert rows["ece"] == ece
    assert rows["brier"] == brier.brier
    assert rows["brier_reliability"] == brier.reliability
    assert rows["lift_top_decile"] == gains[1]
    assert len(rows) == 10


# ---------------------------------------------------------------------------
# Round-5w/5x: ratio-metric delta method, SRM, experiment readout.
# ---------------------------------------------------------------------------


def test_ratio_delta_method_rederivation(spark):
    import numpy as np

    ev = _events(spark)
    per = defaultdict(lambda: [0, 0])
    for _, u, _, et, _ in ev:
        per[u][0] += 1
        per[u][1] += 1 if et == "purchase" else 0
    arms = defaultdict(list)
    for u, (n, y) in per.items():
        arm = (((u % _MOD) * _KNUTH) >> 16) % 2
        arms[arm].append((n, y))

    def est(vals):
        n = np.array([v[0] for v in vals], dtype=float)
        y = np.array([v[1] for v in vals], dtype=float)
        u = len(vals)
        r = y.sum() / n.sum()
        v = (y.var() + r * r * n.var() - 2 * r * (n * y).mean() + 2 * r * n.mean() * y.mean()) / (
            u * n.mean() ** 2
        )
        return r, v

    r1, v1 = est(arms[1])
    r0, v0 = est(arms[0])
    row = _run(spark, "ratio_metric_delta_method").collect()[0]
    assert row.n_users == len(per)
    assert abs(row.r_treat - r1) < 1e-6 and abs(row.r_ctrl - r0) < 1e-6
    assert abs(row.diff - (r1 - r0)) < 1e-6
    assert abs(row.se - math.sqrt(v1 + v0)) < 1e-6
    assert 0.0 <= row.p_value <= 1.0


def test_srm_check_rederivation(spark):
    ev = _events(spark)
    users = {u for _, u, _, _, _ in ev}
    nt = sum(1 for u in users if (((u % _MOD) * _KNUTH) >> 16) % 2 == 1)
    nc = len(users) - nt
    half = len(users) / 2.0
    chi2 = (nt - half) ** 2 / half + (nc - half) ** 2 / half
    row = _run(spark, "sample_ratio_mismatch_check").collect()[0]
    assert row.n_treat == nt and row.n_ctrl == nc
    assert abs(row.chi2 - chi2) < 1e-6
    # a hash split of real traffic must NOT flag SRM
    assert not row.srm_flag


def test_experiment_readout_consistent_with_constituents(spark):
    rows = {
        r.metric: r.value
        for r in _run(spark, "experiment_readout_report").collect()
    }
    srm = _run(spark, "sample_ratio_mismatch_check").collect()[0]
    ratio = _run(spark, "ratio_metric_delta_method").collect()[0]
    did = _run(spark, "diff_in_diff_estimator").collect()[0]
    qini = {r.decile: r.qini for r in _run(spark, "qini_curve_deciles").collect()}
    assert rows["srm_p_value"] == srm.p_value
    assert rows["ratio_metric_diff"] == ratio.diff
    assert rows["did_estimate"] == did.did_estimate
    assert rows["qini_top_decile"] == qini[1]
    assert len(rows) == 10


# ---------------------------------------------------------------------------
# Round-5y: Procrustes drift.
# ---------------------------------------------------------------------------


def test_procrustes_matches_numpy_and_bounds(spark):
    import numpy as np

    from weather_stream_processor_spark.sources import load_table

    X = np.array(
        [
            r.embedding
            for r in load_table(spark, SF_SMOKE, "embeddings")
            .select("embedding")
            .orderBy("vec_id")
            .collect()
        ],
        dtype=np.float64,
    )
    lo, hi = X.min(axis=0), X.max(axis=0)
    scale = np.where(hi > lo, (hi - lo) / 255.0, 1.0)
    code = np.where(hi > lo, np.floor((X - lo) / scale + 0.5), 0.0)
    Y = lo + code * scale
    M = Y.T @ X
    U, sig, Vt = np.linalg.svd(M)
    R = U @ Vt
    rows = sorted(
        _run(spark, "embedding_procrustes_drift").collect(), key=lambda r: r.k
    )
    assert len(rows) == X.shape[1]
    for k, r in enumerate(rows):
        assert abs(r.sigma - round(float(sig[k]), 4)) < 1e-9, k
    rot_dev = float(np.linalg.norm(R - np.eye(X.shape[1])))
    resid = float(
        np.sqrt(max(0.0, (X * X).sum() + (Y * Y).sum() - 2 * sig.sum()))
        / np.sqrt((X * X).sum())
    )
    assert abs(rows[0].rotation_dev - rot_dev) < 1e-5
    assert abs(rows[0].alignment_residual - resid) < 1e-5
    # R solves an orthogonal problem; quantization barely rotates the
    # space and the residual is quantization-noise-sized
    assert np.allclose(R @ R.T, np.eye(X.shape[1]), atol=1e-8)
    assert rows[0].rotation_dev < 0.1
    assert rows[0].alignment_residual < 0.02


# ---------------------------------------------------------------------------
# Round-5z: pinball backtest + extreme-value fit.
# ---------------------------------------------------------------------------


def test_pinball_backtest_rederivation(spark):
    daily = _daily_cents(spark)
    import datetime

    split = datetime.date(2024, 1, 16)
    rows = {r.event_type: r for r in _run(spark, "pinball_loss_backtest").collect()}
    types = sorted({t for t, _ in daily})
    for et in types:
        train = sorted(c for (t, d), c in daily.items() if t == et and d < split)
        test = [c for (t, d), c in daily.items() if t == et and d >= split]
        qs = {q: train[max(math.ceil(q * len(train)), 1) - 1] for q in (0.1, 0.5, 0.9)}
        r = rows[et]
        assert r.n_test_days == len(test)
        for q, col in ((0.1, "pinball_q10"), (0.5, "pinball_q50"), (0.9, "pinball_q90")):
            loss = sum(
                q * (c - qs[q]) if c >= qs[q] else (1 - q) * (qs[q] - c)
                for c in test
            ) / len(test) / 100.0
            assert abs(getattr(r, col) - loss) < 1e-3, (et, q)
        cov = sum(1 for c in test if qs[0.1] <= c <= qs[0.9]) / len(test)
        assert abs(r.coverage_80 - cov) < 1e-4
        # pinball at the median is always <= half the MAE-minimizing
        # bound; sanity: losses are non-negative
        assert r.pinball_q10 >= 0 and r.pinball_q90 >= 0


def test_extreme_value_fit_rederivation(spark):
    from weather_stream_processor_spark.sources import load_table

    cents = [
        round(float(r.o_totalprice) * 100)
        for r in load_table(spark, SF_SMOKE, "orders")
        .select("o_totalprice")
        .collect()
    ]
    n = len(cents)
    grid = Counter(c // 10000 for c in cents)
    cum = 0
    u = None
    for b in sorted(grid):
        cum += grid[b]
        if cum >= 0.95 * n:
            u = b * 10000
            break
    exc = [(c - u) / 100.0 for c in cents if c > u]
    k = len(exc)
    m = sum(exc) / k
    v = sum(y * y for y in exc) / k - m * m
    xi = (1 - m * m / v) / 2
    sigma = m * (1 - xi)
    rl = u / 100.0 + sigma / xi * ((k / n / 0.001) ** xi - 1)
    row = _run(spark, "extreme_value_tail_fit").collect()[0]
    assert row.n == n and row.n_exceed == k
    assert abs(row.threshold - u / 100.0) < 1e-9
    assert abs(row.xi - xi) < 1e-5
    assert abs(row.sigma - sigma) < 0.02
    assert abs(row.return_level_p001 - rl) < 0.5
    # the extrapolated 1-in-1000 level must sit above the threshold
    assert row.return_level_p001 > row.threshold


def test_drift_panel_consistent_with_constituents(spark):
    rows = {r.metric: r.value for r in _run(spark, "drift_panel_report").collect()}
    ks = _run(spark, "ks_drift_two_sample").collect()[0]
    w1 = _run(spark, "wasserstein_drift_1d").collect()[0]
    mwu = _run(spark, "mann_whitney_u_test").collect()[0]
    psi_total = sum(r.psi_term for r in _run(spark, "psi_feature_drift").collect())
    kl_total = sum(r.kl_term for r in _run(spark, "mixture_drift_kl").collect())
    assert rows["ks_stat"] == ks.ks_stat
    assert rows["w1_distance"] == w1.w1_distance
    assert rows["mwu_z"] == mwu.z_score and rows["mwu_p"] == mwu.p_value
    assert abs(rows["psi_total"] - psi_total) < 1e-9
    assert abs(rows["kl_divergence"] - kl_total) < 1e-9
    assert len(rows) == 9


# ---------------------------------------------------------------------------
# Round-6a: Mann-Kendall + capture-recapture.
# ---------------------------------------------------------------------------


def test_mann_kendall_rederivation(spark):
    daily = _daily_cents(spark)
    types = sorted({t for t, _ in daily})
    rows = {r.event_type: r for r in _run(spark, "mann_kendall_trend").collect()}
    for et in types:
        series = [daily[(et, d)] for d in sorted(d for t, d in daily if t == et)]
        n = len(series)
        s = sum(
            (1 if series[j] > series[i] else (-1 if series[j] < series[i] else 0))
            for i in range(n)
            for j in range(i + 1, n)
        )
        ties = Counter(series)
        tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
        z = (
            (s - 1) / math.sqrt(var_s)
            if s > 0
            else ((s + 1) / math.sqrt(var_s) if s < 0 else 0.0)
        )
        r = rows[et]
        assert r.n_days == n
        assert r.mk_s == s, et
        assert abs(r.z_score - z) < 1e-6
        assert r.increasing == (z > 0)
        assert 0.0 <= r.p_value <= 1.0


def test_capture_recapture_consistency(spark):
    """Chapman estimate must match the closed form of the two tiers'
    catch counts, and bound the union from above (you can't have seen
    more than exist)."""
    c1 = {
        (r.doc_a, r.doc_b)
        for r in _run(spark, "ngram_jaccard_pairs").select("doc_a", "doc_b").collect()
    }
    c2 = {
        (r.doc_a, r.doc_b)
        for r in _run(spark, "simhash_hamming_near_dup")
        .select("doc_a", "doc_b")
        .collect()
    }
    m = len(c1 & c2)
    row = _run(spark, "capture_recapture_dup_estimate").collect()[0]
    assert row.caught_jaccard == len(c1)
    assert row.caught_simhash == len(c2)
    assert row.overlap == m
    chap = (len(c1) + 1) * (len(c2) + 1) / (m + 1) - 1
    assert abs(row.chapman_estimate - chap) < 0.01
    assert row.chapman_estimate >= len(c1 | c2) - 1e-9 or m == min(len(c1), len(c2))


# ---------------------------------------------------------------------------
# Round-6b: TOST, power/MDE, Bayesian readout.
# ---------------------------------------------------------------------------


def _arm_counts(spark):
    ev = _events(spark)
    per = defaultdict(lambda: [0, 0])
    for _, u, _, et, _ in ev:
        per[u][0] += 1
        per[u][1] += 1 if et == "purchase" else 0
    nt = nc = ct = cc = 0
    for u, (n, p) in per.items():
        arm = (((u % _MOD) * _KNUTH) >> 16) % 2
        conv = 1 if p / n >= 0.22 else 0
        if arm:
            nt += 1
            ct += conv
        else:
            nc += 1
            cc += conv
    return nt, nc, ct, cc


def _phi_sf(z):
    t = 1.0 / (1.0 + 0.2316419 * abs(z))
    poly = t * (
        0.319381530
        + t * (-0.356563782 + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429)))
    )
    tail = math.exp(-z * z / 2.0) / math.sqrt(2 * math.pi) * poly
    return tail if z >= 0 else 1.0 - tail


def test_tost_equivalence_rederivation(spark):
    nt, nc, ct, cc = _arm_counts(spark)
    pt, pc = ct / nt, cc / nc
    diff = pt - pc
    se = math.sqrt(pt * (1 - pt) / nt + pc * (1 - pc) / nc)
    z_lo, z_hi = (diff + 0.02) / se, (diff - 0.02) / se
    tost_p = max(_phi_sf(z_lo), _phi_sf(-z_hi))
    row = _run(spark, "tost_equivalence_test").collect()[0]
    assert row.n_treat == nt and row.n_ctrl == nc
    assert abs(row.diff - diff) < 1e-6
    assert abs(row.tost_p - tost_p) < 1e-6
    assert row.equivalent == (tost_p < 0.05)


def test_power_mde_rederivation(spark):
    nt, nc, ct, cc = _arm_counts(spark)
    pt, pc = ct / nt, cc / nc
    se = math.sqrt(pt * (1 - pt) / nt + pc * (1 - pc) / nc)
    mde = (1.959963984540054 + 0.8416212335729143) * se
    row = _run(spark, "ab_power_mde").collect()[0]
    assert abs(row.mde_abs - mde) < 1e-6
    assert abs(row.mde_rel - mde / pc) < 1e-6
    # an experiment can never detect less than ~2.8 standard errors
    assert row.mde_abs > 2.5 * row.se_diff


def test_bayesian_ab_rederivation(spark):
    nt, nc, ct, cc = _arm_counts(spark)
    mt, mc = (ct + 1) / (nt + 2), (cc + 1) / (nc + 2)
    vt = (ct + 1) * (nt - ct + 1) / ((nt + 2) ** 2 * (nt + 3))
    vc = (cc + 1) * (nc - cc + 1) / ((nc + 2) ** 2 * (nc + 3))
    z = (mt - mc) / math.sqrt(vt + vc)
    p_better = _phi_sf(z)
    row = _run(spark, "bayesian_ab_probability").collect()[0]
    assert abs(row.posterior_treat - mt) < 1e-6
    assert abs(row.p_treat_better - p_better) < 1e-6
    # the two tails are complementary
    assert abs(row.p_treat_better + row.p_treat_worse - 1.0) < 2e-6


def test_compression_ratio_matches_python_zlib(spark):
    import zlib

    docs = _docs(spark)
    per_source = defaultdict(list)
    for _, text, _, src in docs:
        per_source[src].append(
            round(len(zlib.compress(text.encode("utf-8"), 6)) / len(text), 4)
        )
    rows = {r.source: r for r in _run(spark, "compression_ratio_quality").collect()}
    assert set(rows) == set(per_source)
    for src, ratios in per_source.items():
        r = rows[src]
        assert r.n_docs == len(ratios)
        assert abs(r.avg_ratio - round(sum(ratios) / len(ratios), 4)) < 1e-3
        assert abs(r.min_ratio - min(ratios)) < 1e-9
        assert r.n_flagged == sum(1 for x in ratios if x < 0.35)
    # the screen's premise: repeated text compresses far better than prose
    prose = "the quick brown fox jumps over the lazy dog " * 3
    spam = "buy now " * 16
    cr = lambda t: len(zlib.compress(t.encode(), 6)) / len(t)  # noqa: E731
    assert cr(spam) < cr(prose)
