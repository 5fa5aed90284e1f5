"""Round-5c operator-batch tests: the evaluation/experimentation module
(exact AUC, calibration ECE, NDCG scorecard, A/B lift), the privacy and
layout audits (l-diversity, encoding advisor), RAG chunking, the
multi-pattern scan, LOF outlier scores, Nelson-Aalen hazard, and
Adamic-Adar link prediction — semantic properties re-derived in pure
Python/numpy on the smoke fixture, beyond what the oracle hash-gate
already proves (the hash says Spark==DuckDB; these say both equal the
textbook definition)."""

from __future__ import annotations

import hashlib
import math

import numpy as np

from tests.conftest import SF_SMOKE


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


def test_roc_auc_matches_rank_sum(spark):
    """AUC must equal the Mann-Whitney U statistic computed by explicit
    mid-rank assignment over the rounded scores (what sklearn does)."""
    docs = _docs(spark)
    pairs = []
    for _, text, lang, _ in docs:
        toks = text.split(" ")
        score = round(len(set(toks)) / len(toks), 4)
        pairs.append((score, 1 if lang == "en" else 0))
    scores = np.array([p[0] for p in pairs])
    labels = np.array([p[1] for p in pairs])
    order = np.argsort(scores, kind="stable")
    ranks = np.empty(len(scores))
    # mid-ranks over ties
    s_sorted = scores[order]
    i = 0
    while i < len(s_sorted):
        j = i
        while j < len(s_sorted) and s_sorted[j] == s_sorted[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # 1-based mid-rank
        i = j
    n_pos, n_neg = labels.sum(), (1 - labels).sum()
    auc = (ranks[labels == 1].sum() - n_pos * (n_pos + 1) / 2) / (
        n_pos * n_neg
    )
    [row] = _run(spark, "roc_auc_exact").collect()
    assert row.n_pos == n_pos and row.n_neg == n_neg
    assert abs(row.auc - round(auc, 6)) < 1e-6
    assert abs(row.gini - (2 * row.auc - 1)) < 2e-6


def test_calibration_ece_matches_numpy(spark):
    docs = _docs(spark)
    bins: dict[int, list[tuple[float, int]]] = {}
    for _, text, lang, _ in docs:
        toks = text.split(" ")
        score = round(len(set(toks)) / len(toks), 4)
        b = min(int(score * 10), 9)
        bins.setdefault(b, []).append((score, 1 if lang == "en" else 0))
    rows = {r.bin: r for r in _run(spark, "calibration_bins_ece").collect()}
    assert set(rows) == set(bins)
    n_tot = sum(len(v) for v in bins.values())
    ece = sum(
        len(v)
        * abs(
            round(np.mean([s for s, _ in v]), 6)
            - round(np.mean([l for _, l in v]), 6)
        )
        for v in bins.values()
    ) / n_tot
    for b, members in bins.items():
        r = rows[b]
        assert r.n == len(members)
        assert abs(r.avg_score - np.mean([s for s, _ in members])) < 1e-5
        assert abs(r.pos_rate - np.mean([l for _, l in members])) < 1e-5
        assert abs(r.ece - ece) < 1e-5


def test_ndcg_metrics_match_python_from_grades(spark):
    """Given the returned (rnk, grade) list and the corpus grade
    histogram, running NDCG/precision/recall must equal the direct
    python computation — including the ideal-DCG-from-histogram trick
    equaling the naive sort-all-grades IDCG."""
    docs = _docs(spark)
    terms = ("spark", "join", "window")
    grades = {}
    for doc_id, text, _, _ in docs:
        toks = set(text.split(" "))
        g = sum(1 for t in terms if t in toks)
        if g:
            grades[doc_id] = g
    rows = sorted(_run(spark, "ndcg_retrieval_eval").collect(), key=lambda r: r.rnk)
    assert [r.rnk for r in rows] == list(range(1, 11))
    # naive IDCG: sort ALL positive grades desc, take 10
    ideal = sorted(grades.values(), reverse=True)[:10]
    idcg = sum((2**g - 1) / math.log2(i + 2) for i, g in enumerate(ideal))
    n_rel = len(grades)
    dcg = hits = 0.0
    for r in rows:
        assert r.grade == grades.get(r.doc_id, 0)
        dcg += (2**r.grade - 1) / math.log2(r.rnk + 1)
        hits += 1 if r.grade > 0 else 0
        assert abs(r.ndcg_at_k - dcg / idcg) < 1e-5
        assert abs(r.precision_at_k - hits / r.rnk) < 1e-5
        assert abs(r.recall_at_k - hits / n_rel) < 1e-5
    assert 0 < rows[-1].ndcg_at_k <= 1.0


def test_ab_lift_matches_pure_python(spark):
    from weather_stream_processor_spark.sources import load_table

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_type")
        .collect()
    )
    per_user: dict[int, list[int]] = {}
    for r in ev:
        per_user.setdefault(int(r.user_id), []).append(
            1 if r.event_type == "purchase" else 0
        )
    KNUTH, MOD = 2654435761, 2147483647
    arms = {0: [0, 0], 1: [0, 0]}  # arm -> [users, conversions]
    for uid, flags in per_user.items():
        arm = (((uid % MOD) * KNUTH) >> 16) % 2
        arms[arm][0] += 1
        arms[arm][1] += int(sum(flags) / len(flags) >= 0.22)
    [row] = _run(spark, "ab_conversion_lift").collect()
    assert (row.n_control, row.conv_control) == tuple(arms[0])
    assert (row.n_treat, row.conv_treat) == tuple(arms[1])
    r0, r1 = arms[0][1] / arms[0][0], arms[1][1] / arms[1][0]
    pooled = (arms[0][1] + arms[1][1]) / (arms[0][0] + arms[1][0])
    z = (r1 - r0) / math.sqrt(
        pooled * (1 - pooled) * (1 / arms[0][0] + 1 / arms[1][0])
    )
    assert abs(row.abs_lift - (r1 - r0)) < 1e-6
    assert abs(row.z_score - z) < 1e-5
    # both outcome classes populated — the fixture-degeneracy guard
    assert 0 < row.conv_control < row.n_control
    assert 0 < row.conv_treat < row.n_treat


def test_l_diversity_matches_python_entropy(spark):
    docs = _docs(spark)
    combos: dict[tuple, dict[str, int]] = {}
    for _, text, lang, source in docs:
        key = (lang, len(text) // 100)
        combos.setdefault(key, {}).setdefault(source, 0)
        combos[key][source] += 1
    rows = {
        (r.lang, r.len_bucket): r
        for r in _run(spark, "l_diversity_audit").collect()
    }
    assert set(rows) == set(combos)
    for key, dist in combos.items():
        r = rows[key]
        n = sum(dist.values())
        ent = -sum((c / n) * math.log(c / n) for c in dist.values())
        assert r.n_docs == n
        assert r.distinct_sources == len(dist)
        assert abs(r.entropy - ent) < 1e-5
        assert r.at_risk_distinct == int(len(dist) < 3)
        assert r.at_risk_entropy == int(ent < math.log(3))


def test_rag_chunks_reconstruct_documents(spark):
    """Non-overlap prefixes of consecutive chunks must reassemble the
    exact original text; md5s must match hashlib on python slices."""
    docs = {d: t for d, t, _, _ in _docs(spark)}
    rows = _run(spark, "rag_chunk_manifest").collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(int(r.doc_id), []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        text = docs[doc_id]
        chunks.sort(key=lambda r: r.chunk_idx)
        expected_n = math.ceil(max(len(text) - 200, 0) / 150) + 1
        assert [c.n_chunks for c in chunks] == [expected_n] * expected_n
        rebuilt = ""
        for c in chunks:
            piece = text[c.start_pos - 1 : c.start_pos - 1 + 200]
            assert c.chunk_len == len(piece)
            assert c.chunk_md5 == hashlib.md5(piece.encode()).hexdigest()
            rebuilt = rebuilt[: c.start_pos - 1] + piece
        assert rebuilt == text


def test_multi_pattern_match_equals_str_count(spark):
    docs = {d: t for d, t, _, _ in _docs(spark)}
    pats = (
        "data quality",
        "neural network",
        "spark",
        "weather station",
        "gradient",
    )
    expected = {}
    for d, t in docs.items():
        for p in pats:
            if p in t:
                expected[(d, p)] = (t.count(p), t.index(p) + 1)
    got = {
        (int(r.doc_id), r.pattern): (r.n_hits, r.first_pos)
        for r in _run(spark, "multi_pattern_match").collect()
    }
    assert got == expected
    assert len(got) > 0


def test_encoding_advisor_matches_pandas_profile(spark):
    import duckdb

    con = duckdb.connect()
    pdf = con.sql(
        f"SELECT * FROM read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).df()
    rows = {r.col_name: r for r in _run(spark, "column_encoding_advisor").collect()}
    assert len(rows) == 11
    for col, r in rows.items():
        assert r.n_rows == len(pdf)
        assert r.n_distinct == pdf[col].nunique()
        assert r.n_nulls == int(pdf[col].isna().sum())
        frac = r.n_distinct / r.n_rows
        if frac <= 0.05:
            assert r.encoding == "dictionary"
        elif pdf[col].dtype == object:
            assert r.encoding == "plain"
        else:
            assert r.encoding == "delta_binary_packed"
    # the flag columns must land on dictionary — the advisor's raison d'etre
    assert rows["l_returnflag"].encoding == "dictionary"
    assert rows["l_linestatus"].encoding == "dictionary"


def test_lof_matches_pure_numpy(spark):
    """Full textbook LOF re-derivation (cosine distance, k=10, distances
    rounded to 6dp before ranking, vec_id tie-breaks) on the smoke
    embeddings."""
    from weather_stream_processor_spark.sources import load_table

    rows = (
        load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    n, k = len(ids), 10
    norms = np.sqrt((mat * mat).sum(axis=1))
    sims = np.round((mat @ mat.T) / np.outer(norms, norms), 6)
    dist = np.round(1 - sims, 6)
    np.fill_diagonal(dist, np.inf)
    knn = {}
    for i in range(n):
        nb = sorted(range(n), key=lambda j: (dist[i, j], ids[j]))[:k]
        knn[i] = nb
    kdist = {i: max(dist[i, j] for j in knn[i]) for i in range(n)}
    lrd = {
        i: round(
            k / max(sum(max(kdist[j], dist[i, j]) for j in knn[i]), 1e-12), 6
        )
        for i in range(n)
    }
    expected = {
        int(ids[i]): (
            round(np.mean([lrd[j] for j in knn[i]]) / lrd[i], 4),
            round(kdist[i], 6),
        )
        for i in range(n)
    }
    got = {
        int(r.vec_id): (r.lof, r.k_distance)
        for r in _run(spark, "lof_outlier_scores").collect()
    }
    assert set(got) == set(expected)
    for v, (lof, kd) in expected.items():
        assert abs(got[v][0] - lof) < 2e-4, v
        assert abs(got[v][1] - kd) < 1e-6, v
    # LOF must actually discriminate: scores are not a constant (the
    # smoke embeddings are well-clustered, so the spread is small but
    # must be present on both sides of 1)
    lofs = [l for l, _ in got.values()]
    assert max(lofs) > 1.0 > min(lofs)


def test_nelson_aalen_matches_python_and_bounds_km(spark):
    from weather_stream_processor_spark.sources import load_table

    orders = (
        load_table(spark, SF_SMOKE, "orders")
        .select("o_custkey", "o_orderdate")
        .collect()
    )
    per_cust: dict[int, list] = {}
    for r in orders:
        per_cust.setdefault(int(r.o_custkey), []).append(r.o_orderdate)
    horizon = max(d for ds in per_cust.values() for d in ds)
    lives = []
    for ds in per_cust.values():
        first, last = min(ds), max(ds)
        lives.append(
            ((last - first).days, int((horizon - last).days > 90))
        )
    grid: dict[int, list[int]] = {}
    for lt, churn in lives:
        grid.setdefault(lt, []).append(churn)
    at_risk = len(lives)
    H = 0.0
    var = 0.0
    expected = {}
    for lt in sorted(grid):
        d = sum(grid[lt])
        if d > 0:
            H += d / at_risk
            var += d * (at_risk - d) / at_risk**3
            expected[lt] = (at_risk, d, round(H, 6), round(math.sqrt(var), 6))
        at_risk -= len(grid[lt])
    got = {
        r.lifetime_days: (r.n_at_risk, r.n_churned, r.cum_hazard, r.hazard_se)
        for r in _run(spark, "nelson_aalen_hazard").collect()
    }
    assert got.keys() == expected.keys()
    for lt, exp in expected.items():
        assert got[lt][0] == exp[0] and got[lt][1] == exp[1]
        assert abs(got[lt][2] - exp[2]) < 1e-5
        assert abs(got[lt][3] - exp[3]) < 1e-5
    # exp(-H) >= KM survival at every event time (Jensen): cross-check
    # against the registered KM curve on the same construction
    km = {
        r.lifetime_days: r.survival
        for r in _run(spark, "kaplan_meier_retention").collect()
        if r.n_churned > 0
    }
    for lt, (_, _, h, _) in got.items():
        assert math.exp(-h) >= km[lt] - 1e-9


def test_adamic_adar_matches_python(spark):
    from weather_stream_processor_spark.sources import load_table

    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    baskets: dict[int, set[int]] = {}
    for r in li:
        baskets.setdefault(int(r.l_orderkey), set()).add(int(r.l_partkey))
    support: dict[tuple[int, int], int] = {}
    for parts in baskets.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                support[(ps[i], ps[j])] = support.get((ps[i], ps[j]), 0) + 1
    edges = {e for e, n in support.items() if n >= 2}
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    scores = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if (a, b) in edges:
                continue
            common = adj[a] & adj[b]
            if common:
                scores[(a, b)] = (
                    len(common),
                    round(sum(1 / math.log(len(adj[z])) for z in common), 6),
                )
    top = sorted(
        scores.items(), key=lambda kv: (-kv[1][1], kv[0][0], kv[0][1])
    )[:20]
    got = [
        ((r.part_a, r.part_b), (r.n_common, r.aa_score))
        for r in _run(spark, "adamic_adar_link_prediction").collect()
    ]
    assert len(got) == 20
    for (pair, vals), (epair, evals_) in zip(got, top):
        assert pair == epair
        assert vals[0] == evals_[0]
        assert abs(vals[1] - evals_[1]) < 1e-6


# --- round-5d: privacy trio closer, feature engineering, clustering eval,
# IVM algebra, TextRank, sampling table ---------------------------------------


def test_t_closeness_matches_python_tv(spark):
    docs = _docs(spark)
    combos: dict[tuple, dict[str, int]] = {}
    global_dist: dict[str, int] = {}
    for _, text, lang, source in docs:
        key = (lang, len(text) // 100)
        combos.setdefault(key, {}).setdefault(source, 0)
        combos[key][source] += 1
        global_dist[source] = global_dist.get(source, 0) + 1
    g = sum(global_dist.values())
    rows = {
        (r.lang, r.len_bucket): r
        for r in _run(spark, "t_closeness_audit").collect()
    }
    assert set(rows) == set(combos)
    for key, dist in combos.items():
        n = sum(dist.values())
        tv = 0.5 * sum(
            abs(dist.get(s, 0) / n - gc / g) for s, gc in global_dist.items()
        )
        r = rows[key]
        assert r.n_docs == n
        assert abs(r.tv_distance - tv) < 1e-5
        assert r.at_risk == int(tv > 0.2)
    # the audit must use the FULL sensitive domain: a combo missing a
    # source entirely still pays |0 - q|, so tv > 0 whenever any source
    # is absent from the combo
    for key, dist in combos.items():
        if len(dist) < len(global_dist):
            assert rows[key].tv_distance > 0


def test_target_encoding_is_out_of_fold(spark):
    from weather_stream_processor_spark.sources import load_table

    orders = (
        load_table(spark, SF_SMOKE, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .collect()
    )
    KNUTH, MOD = 2654435761, 2147483647
    agg: dict[tuple, list] = {}
    for r in orders:
        fold = (((int(r.o_orderkey) % MOD) * KNUTH) >> 16) % 5
        cents = round(r.o_totalprice * 100)
        cell = agg.setdefault((r.o_orderpriority, fold), [0, 0])
        cell[0] += 1
        cell[1] += cents
    keys = {k for k, _ in agg}
    rows = {
        (r.key, r.fold): r
        for r in _run(spark, "target_encoding_kfold").collect()
    }
    assert set(rows) == set(agg)
    for (key, fold), (n, s) in agg.items():
        nk = sum(v[0] for (k2, f2), v in agg.items() if k2 == key)
        sk = sum(v[1] for (k2, f2), v in agg.items() if k2 == key)
        r = rows[(key, fold)]
        assert r.n_rows == n
        oof = (sk - s) / (nk - n)
        assert abs(r.oof_mean_cents - round(oof, 4)) < 1e-9
        # leakage-freedom: the encoding differs from the naive all-fold
        # mean whenever the fold's own mean differs from the rest
        if abs(s / n - oof) > 1e-9:
            assert abs(r.oof_mean_cents - sk / nk) > 0 or n == nk


def test_woe_iv_matches_python(spark):
    docs = _docs(spark)
    bins: dict[int, list[int]] = {}
    for _, text, lang, _ in docs:
        toks = text.split(" ")
        score = round(len(set(toks)) / len(toks), 4)
        b = min(int(score * 10), 9)
        bins.setdefault(b, []).append(1 if lang == "en" else 0)
    G = sum(sum(v) for v in bins.values())
    B = sum(len(v) - sum(v) for v in bins.values())
    nb = len(bins)
    rows = {r.bin: r for r in _run(spark, "woe_iv_binning").collect()}
    assert set(rows) == set(bins)
    iv_total = 0.0
    for b, labels in bins.items():
        g, bad = sum(labels), len(labels) - sum(labels)
        gs = (g + 0.5) / (G + 0.5 * nb)
        bs = (bad + 0.5) / (B + 0.5 * nb)
        woe = math.log(gs / bs)
        r = rows[b]
        assert (r.n_good, r.n_bad) == (g, bad)
        assert abs(r.woe - woe) < 1e-5
        assert abs(r.iv_contrib - (gs - bs) * woe) < 1e-5
        iv_total += (gs - bs) * woe
    # IV contributions are individually >= 0 by construction
    assert all(r.iv_contrib >= -1e-9 for r in rows.values())
    assert iv_total >= 0


def test_incremental_merge_equals_direct_rollup(spark):
    """The IVM algebra: merged base+delta states must equal the direct
    full-table rollup computed independently (and min/max/avg must be
    internally consistent)."""
    from weather_stream_processor_spark.sources import load_table

    direct = {
        (r.month, r.o_orderpriority): r
        for r in (
            load_table(spark, SF_SMOKE, "orders")
            .groupBy(
                __import__("pyspark.sql.functions", fromlist=["F"]).date_trunc(
                    "month", "o_orderdate"
                ).alias("month"),
                "o_orderpriority",
            )
            .agg(
                __import__("pyspark.sql.functions", fromlist=["F"])
                .count("*")
                .alias("n")
            )
            .collect()
        )
    }
    rows = _run(spark, "incremental_rollup_merge").collect()
    assert {(r.month, r.o_orderpriority) for r in rows} == set(direct)
    for r in rows:
        assert r.n_orders == direct[(r.month, r.o_orderpriority)].n
        assert r.min_cents <= r.max_cents
        assert r.min_cents * r.n_orders <= r.sum_cents <= r.max_cents * r.n_orders
        # exact Euclidean pair: q*n + r == sum, 0 <= r < n
        assert r.avg_cents_q * r.n_orders + r.avg_cents_r == r.sum_cents
        assert 0 <= r.avg_cents_r < r.n_orders


def test_simplified_silhouette_matches_numpy(spark):
    from weather_stream_processor_spark.sources import load_table

    assign = {
        int(r.vec_id): int(r.cluster_id)
        for r in _run(spark, "kmeans_embedding_clusters").collect()
    }
    rows = (
        load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    vecs = {int(r.vec_id): np.array(r.embedding, dtype=np.float64) for r in rows}
    cents = {}
    for cid in set(assign.values()):
        members = np.stack([vecs[v] for v, c in assign.items() if c == cid])
        cents[cid] = np.round(members.mean(axis=0), 6)
    per_cluster: dict[int, list[float]] = {}
    for v, own in assign.items():
        d2 = {
            cid: round(float(((vecs[v] - c) ** 2).sum()), 6)
            for cid, c in cents.items()
        }
        a = math.sqrt(d2[own])
        b = math.sqrt(min(d for cid, d in d2.items() if cid != own))
        sil = round((b - a) / max(a, b, 1e-12), 6)
        per_cluster.setdefault(own, []).append(sil)
    got = {r.cluster_id: r for r in _run(spark, "simplified_silhouette").collect()}
    assert set(got) == set(per_cluster)
    for cid, sils in per_cluster.items():
        assert got[cid].n_points == len(sils)
        assert abs(got[cid].avg_silhouette - np.mean(sils)) < 1e-5
        assert abs(got[cid].min_silhouette - min(sils)) < 1e-6


def test_textrank_matches_python_power_iteration(spark):
    docs = _docs(spark)
    und: dict[tuple[str, str], float] = {}
    for _, text, _, _ in docs:
        toks = text.split(" ")
        for x, y in zip(toks, toks[1:]):
            if x == y:
                continue
            und[(x, y)] = und.get((x, y), 0) + 1
    und = {e: w for e, w in und.items() if w >= 10}
    out: dict[str, dict[str, float]] = {}
    for (a, b), w in und.items():
        out.setdefault(a, {}).setdefault(b, 0)
        out.setdefault(b, {}).setdefault(a, 0)
        out[a][b] += w
        out[b][a] += w
    nodes = sorted(out)
    n = len(nodes)
    wdeg = {u: sum(out[u].values()) for u in nodes}
    rank = {u: 1 / n for u in nodes}
    for _ in range(5):
        nxt = {}
        for u in nodes:
            s = sum(rank[v] * out[v][u] / wdeg[v] for v in out[u])
            nxt[u] = 0.15 / n + 0.85 * s
        rank = nxt
    top = sorted(rank.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:20]
    got = [(r.term, r.textrank) for r in _run(spark, "textrank_keyphrases").collect()]
    assert len(got) == 20
    for (term, score), (eterm, escore) in zip(got, top):
        assert term == eterm
        assert abs(score - round(escore, 6)) < 1e-6
    # mass conservation: undirected construction leaves no dangling mass
    assert abs(sum(rank.values()) - 1.0) < 1e-9


def test_unigram_sampling_table_properties(spark):
    docs = _docs(spark)
    counts: dict[str, int] = {}
    for _, text, _, _ in docs:
        for t in text.split(" "):
            counts[t] = counts.get(t, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    ws = {t: round(c**0.75, 6) for t, c in top}
    W = sum(ws.values())
    rows = sorted(
        _run(spark, "unigram_sampling_table").collect(),
        key=lambda r: (-r.c, r.term),
    )
    assert [(r.term, r.c) for r in rows] == top
    cum = 0.0
    for r in rows:
        assert abs(r.p_sample - ws[r.term] / W) < 1e-5
        cum += ws[r.term]
        assert abs(r.cum_p - cum / W) < 1e-5
    # the inverse-CDF column ends at exactly 1
    assert abs(rows[-1].cum_p - 1.0) < 1e-6
    # flattening: the top term's sampling share is strictly below its
    # raw frequency share (that is what the 0.75 exponent is FOR)
    raw_share = rows[0].c / sum(c for _, c in top)
    assert rows[0].p_sample < raw_share


# --- round-5e: MMR, Rocchio PRF, Wasserstein drift, pruning audit,
# streaming sequence pattern ------------------------------------------------


def _embeddings_np(spark, sf=SF_SMOKE):
    from weather_stream_processor_spark.sources import load_table

    rows = (
        load_table(spark, sf, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def test_mmr_matches_greedy_rederivation(spark):
    ids, mat = _embeddings_np(spark)
    q = mat[ids == 0][0]
    rest = ids != 0
    rids, rmat = ids[rest], mat[rest]
    norms = np.sqrt((rmat * rmat).sum(axis=1))
    rels = np.round(rmat @ q / (norms * np.sqrt(q @ q)), 6)
    order = sorted(range(len(rids)), key=lambda i: (-rels[i], rids[i]))[:30]
    pids = rids[order]
    prel = rels[order]
    pm = rmat[order]
    pn = norms[order]
    sims = np.round((pm @ pm.T) / np.outer(pn, pn), 6)
    chosen, remaining = [], list(range(30))
    expected = []
    for rank in range(1, 11):
        if rank == 1:
            sc = {i: prel[i] for i in remaining}
        else:
            sc = {
                i: round(
                    0.7 * prel[i] - 0.3 * max(sims[i][j] for j in chosen), 6
                )
                for i in remaining
            }
        best = min(remaining, key=lambda i: (-sc[i], pids[i]))
        expected.append((rank, int(pids[best]), prel[best], sc[best]))
        chosen.append(best)
        remaining.remove(best)
    got = sorted(
        (
            (r.mmr_rank, r.vec_id, r.relevance, r.mmr_score)
            for r in _run(spark, "mmr_diversified_rerank").collect()
        )
    )
    assert len(got) == 10
    for (rk, v, rel, sc), (erk, ev_, erel, esc) in zip(got, expected):
        assert (rk, v) == (erk, ev_)
        assert abs(rel - erel) < 1e-6
        assert abs(sc - esc) < 1e-6
    # after rank 1 the MMR score is strictly below pure relevance
    # whenever any selected neighbor is positively similar
    for rk, v, rel, sc in got[1:]:
        assert sc <= rel + 1e-9


def test_rocchio_expansion_matches_python(spark):
    docs = _docs(spark)
    run = sorted(
        (
            (r.doc_id, r.bm25)
            for r in _run(spark, "bm25_top_docs").collect()
        ),
        key=lambda t: (-t[1], t[0]),
    )
    fb = {d for d, _ in run[:10]}
    tf_fb: dict[str, int] = {}
    df: dict[str, set] = {}
    for d, text, _, _ in docs:
        for t in text.split(" "):
            df.setdefault(t, set()).add(d)
            if d in fb:
                tf_fb[t] = tf_fb.get(t, 0) + 1
    n = len(docs)
    weights = {
        t: round(c * math.log(n / len(df[t])), 6)
        for t, c in tf_fb.items()
        if t not in ("spark", "join", "window")
    }
    top = sorted(weights.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r.term, r.tf_fb, r.df, r.rocchio_weight)
        for r in _run(spark, "rocchio_query_expansion").collect()
    ]
    assert len(got) == 10
    for (term, tfv, dfv, w), (eterm, ew) in zip(got, top):
        assert term == eterm
        assert tfv == tf_fb[term]
        assert dfv == len(df[term])
        assert abs(w - ew) < 1e-6


def test_wasserstein_matches_python_and_bounds_mean_shift(spark):
    from weather_stream_processor_spark.sources import load_table

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("event_type", "value")
        .collect()
    )
    a = sorted(
        math.floor(r.value * 10) for r in ev if r.event_type == "click"
    )
    b = sorted(
        math.floor(r.value * 10) for r in ev if r.event_type == "purchase"
    )
    buckets = sorted(set(a) | set(b))
    ca = cb = 0.0
    w1 = 0.0
    for i, bk in enumerate(buckets):
        ca += sum(1 for x in a if x == bk) / len(a)
        cb += sum(1 for x in b if x == bk) / len(b)
        if i + 1 < len(buckets):
            w1 += abs(ca - cb) * (buckets[i + 1] - bk) * 0.1
    [row] = _run(spark, "wasserstein_drift_1d").collect()
    assert (row.n_a, row.n_b) == (len(a), len(b))
    assert row.n_buckets == len(buckets)
    assert abs(row.w1_distance - w1) < 1e-5
    # W1 lower-bounds the absolute mean shift of the quantized values
    mean_shift = abs(
        sum(a) / len(a) - sum(b) / len(b)
    ) * 0.1
    assert row.w1_distance >= mean_shift - 1e-9


def test_minmax_pruning_clustered_beats_hash(spark):
    from weather_stream_processor_spark.sources import load_table

    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .collect()
    )
    KNUTH, MOD = 2654435761, 2147483647
    import datetime

    lo = datetime.datetime(1996, 3, 1)
    hi = datetime.datetime(1996, 3, 31, 23, 59, 59)
    layouts: dict[str, dict[int, list]] = {"hash_orderkey": {}, "cluster_shipdate": {}}
    for r in li:
        hf = (((int(r.l_orderkey) % MOD) * KNUTH) >> 16) % 64
        df_ = r.l_shipdate.year * 12 + r.l_shipdate.month
        layouts["hash_orderkey"].setdefault(hf, []).append(r.l_shipdate)
        layouts["cluster_shipdate"].setdefault(df_, []).append(r.l_shipdate)
    expected = {}
    for name, files in layouts.items():
        n_pruned = scanned = total = 0
        for ds in files.values():
            total += len(ds)
            if max(ds) < lo or min(ds) > hi:
                n_pruned += 1
            else:
                scanned += len(ds)
        expected[name] = (len(files), n_pruned, round(scanned / total, 6))
    got = {
        r.layout: (r.n_files, r.n_pruned, r.scan_frac)
        for r in _run(spark, "minmax_pruning_audit").collect()
    }
    assert got.keys() == expected.keys()
    for name in expected:
        assert got[name][0] == expected[name][0]
        assert got[name][1] == expected[name][1]
        assert abs(got[name][2] - expected[name][2]) < 1e-6
    # the lesson itself: clustering prunes, hashing doesn't
    assert got["cluster_shipdate"][2] < got["hash_orderkey"][2]
    assert got["cluster_shipdate"][1] > got["hash_orderkey"][1]


def test_streaming_pattern_equals_batch_rederivation(spark):
    from weather_stream_processor_spark.sources import load_table

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_id", "ts", "event_type")
        .collect()
    )
    errors = [r for r in ev if r.event_type == "error"]
    purchases = [r for r in ev if r.event_type == "purchase"]
    by_user: dict[int, list] = {}
    for p in purchases:
        by_user.setdefault(int(p.user_id), []).append(p)
    expected = {}
    for e in errors:
        cands = [
            p
            for p in by_user.get(int(e.user_id), [])
            if e.ts < p.ts
            and (p.ts - e.ts).total_seconds() <= 3600
        ]
        if cands:
            first = min(cands, key=lambda p: (p.ts, p.event_id))
            lag = int(
                (first.ts - e.ts).total_seconds()
            )  # floor: both are micro-precise, diff >= 0
            expected[int(e.event_id)] = (
                int(e.user_id),
                int(first.event_id),
                lag,
            )
    got = {
        int(r.error_id): (int(r.user_id), int(r.purchase_id), int(r.lag_sec))
        for r in _run(spark, "streaming_error_then_purchase").collect()
    }
    assert got == expected
    assert len(got) >= 3  # non-vacuous at the smoke scale


# --- round-5f: exact Shapley attribution + Heaps' law -----------------------


def test_shapley_matches_python_and_is_efficient(spark):
    from itertools import combinations

    from weather_stream_processor_spark.sources import load_table

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_type", "ts")
        .collect()
    )
    channels = ("click", "view", "signup", "error")
    firstp: dict[int, object] = {}
    for r in ev:
        if r.event_type == "purchase":
            u = int(r.user_id)
            if u not in firstp or r.ts < firstp[u]:
                firstp[u] = r.ts
    masks: dict[int, int] = {u: 0 for u in firstp}
    for r in ev:
        u = int(r.user_id)
        if (
            u in firstp
            and r.event_type in channels
            and r.ts < firstp[u]
        ):
            masks[u] |= 1 << channels.index(r.event_type)

    def v(S: int) -> int:
        return sum(1 for m in masks.values() if (m | S) == S)

    import math as m

    n = len(channels)
    expected = {}
    for i, ch in enumerate(channels):
        phi = 0.0
        for size in range(n):
            for subset in combinations(
                [j for j in range(n) if j != i], size
            ):
                S = sum(1 << j for j in subset)
                w = m.factorial(size) * m.factorial(n - 1 - size) / m.factorial(n)
                phi += w * (v(S | (1 << i)) - v(S))
        expected[ch] = round(phi, 6)
    got = {
        r.channel: r.shapley_conversions
        for r in _run(spark, "shapley_channel_attribution").collect()
    }
    assert set(got) == set(channels)
    for ch in channels:
        assert abs(got[ch] - expected[ch]) < 1e-6, ch
    # efficiency: Shapley values sum to v(full) - v(empty)
    assert abs(sum(got.values()) - (v(15) - v(0))) < 1e-4


def test_heaps_fit_matches_python_ols(spark):
    docs = _docs(spark)
    ids = [d for d, _, _, _ in docs]
    dmin, dmax = min(ids), max(ids)
    bounds = [
        dmin + math.floor(i * (dmax - dmin) / 10) for i in range(1, 11)
    ]
    pts = []
    for b in bounds:
        n_tok = sum(
            len(t.split(" ")) for d, t, _, _ in docs if d <= b
        )
        vocab = len(
            {w for d, t, _, _ in docs if d <= b for w in t.split(" ")}
        )
        pts.append((b, n_tok, vocab))
    xs = [math.log(n) for _, n, _ in pts]
    ys = [math.log(v) for _, _, v in pts]
    n = len(pts)
    mx, my = sum(xs) / n, sum(ys) / n
    beta = (sum(x * y for x, y in zip(xs, ys)) - n * mx * my) / (
        sum(x * x for x in xs) - n * mx * mx
    )
    k = math.exp(my - beta * mx)
    rows = sorted(_run(spark, "heaps_law_fit").collect(), key=lambda r: r.checkpoint)
    assert [(r.doc_id_bound, r.n_tokens, r.vocab) for r in rows] == pts
    for r in rows:
        assert abs(r.heaps_beta - beta) < 1e-5
        assert abs(r.heaps_k - k) < max(1e-4, abs(k) * 1e-5)
    # sub-linear growth: the fixture vocabulary saturates hard
    assert rows[0].heaps_beta < 1.0
    # monotone growth curves
    for a, b in zip(rows, rows[1:]):
        assert a.n_tokens <= b.n_tokens and a.vocab <= b.vocab


def test_release_audit_is_consistent_with_constituents(spark):
    """The report's per-gate counts must equal filtering each registered
    constituent's own output, and the summary rows must satisfy the
    union/complement identities."""
    rows = {r.gate: r for r in _run(spark, "release_audit_report").collect()}
    assert set(rows) == {
        "exact_sha256",
        "near_dup_jaccard",
        "quality_gopher",
        "repetition",
        "decontamination",
        "memorization",
        "privacy_combo",
        "any_gate",
        "released_clean",
    }
    n_docs = len(_docs(spark))
    keep_list = _run(spark, "near_dup_keep_list").collect()
    assert rows["near_dup_jaccard"].n_flagged == sum(
        1 for r in keep_list if not r.keep
    )
    gopher = _run(spark, "gopher_quality_rules").collect()
    assert rows["quality_gopher"].n_flagged == sum(
        1 for r in gopher if not r.keep
    )
    decon = _run(spark, "decontamination_overlap").collect()
    assert rows["decontamination"].n_flagged == len(decon)
    memo = _run(spark, "memorization_risk_scores").collect()
    assert rows["memorization"].n_flagged == sum(
        1 for r in memo if r.action == "trim"
    )
    # union bounds: max(per-gate) <= any <= sum(per-gate), and the
    # complement identity
    per_gate = [
        rows[g].n_flagged
        for g in (
            "exact_sha256",
            "near_dup_jaccard",
            "quality_gopher",
            "repetition",
            "decontamination",
            "memorization",
            "privacy_combo",
        )
    ]
    any_n = rows["any_gate"].n_flagged
    assert max(per_gate) <= any_n <= sum(per_gate)
    assert rows["released_clean"].n_flagged == n_docs - any_n
    assert abs(rows["released_clean"].corpus_frac + rows["any_gate"].corpus_frac - 1.0) < 2e-6
    # non-vacuity: gates disagree — at least one flags something and at
    # least one passes most docs. (At the 500-doc smoke scale any_gate
    # can legitimately equal n_docs: a corpus that small cannot be
    # 5-anonymous, so the privacy gate alone flags nearly everything —
    # which is exactly what the report should say.)
    assert any_n > 0
    assert min(per_gate) < n_docs // 2


def test_broadcast_advisor_matches_width_model(spark):
    import duckdb

    con = duckdb.connect()
    rows = {
        r.table_name: r
        for r in _run(spark, "broadcast_join_advisor").collect()
    }
    assert len(rows) == 10
    # spot-check the width model on two tables via duckdb
    n_li, bytes_li = con.sql(
        f"SELECT COUNT(*), SUM(76 + length(l_returnflag) + length(l_linestatus))"
        f" FROM read_parquet('{SF_SMOKE}/lineitem.parquet')"
    ).fetchone()
    assert rows["lineitem"].n_rows == n_li
    assert rows["lineitem"].est_bytes == bytes_li
    n_e, bytes_e = con.sql(
        f"SELECT COUNT(*), SUM(12 + 4 * len(embedding))"
        f" FROM read_parquet('{SF_SMOKE}/embeddings.parquet')"
    ).fetchone()
    assert rows["embeddings"].est_bytes == bytes_e
    # decision consistency + fixture sanity: every smoke table fits the
    # 10 MB broadcast budget, and the flag agrees with the strategy
    for r in rows.values():
        assert r.broadcastable == int(r.est_bytes <= 10 * 1024 * 1024)
        assert (r.join_strategy == "broadcast") == bool(r.broadcastable)


def test_jaro_winkler_udf_matches_duckdb_native(spark):
    """The pandas_udf metric must equal DuckDB's native
    jaro_winkler_similarity on adversarial cases (transpositions, empty
    strings, prefix boosts, disjoint alphabets), not just fixture
    names — the two implementations are independent."""
    import duckdb

    from weather_stream_processor_spark.operators.dedup import (
        _jaro_winkler_py,
    )

    cases = [
        ("martha", "marhta"),
        ("dixon", "dicksonx"),
        ("jellyfish", "smellyfish"),
        ("", ""),
        ("a", ""),
        ("abc", "abc"),
        ("ab", "ba"),
        ("abcd", "dcba"),
        ("Customer#000000123", "Supplier#000000123"),
        ("aaaaaaaaaa", "aaaaaaaaab"),
        ("xyz", "abc"),
        ("prefix_same_tail_x", "prefix_same_tail_y"),
    ]
    con = duckdb.connect()
    for a, b in cases:
        (expected,) = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()
        assert abs(_jaro_winkler_py(a, b) - expected) < 1e-12, (a, b)
    # and the registered top-k is fully tie-broken + descending
    rows = _run(spark, "jaro_winkler_linkage_topk").collect()
    assert len(rows) == 20
    sims = [r.jw_sim for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_fellegi_sunter_weights_match_python_rederivation(spark):
    """The FS match weight must equal the textbook sum of per-field
    log2(m/u) / log2((1-m)/(1-u)) contributions re-derived in pure
    Python from the raw blocked pair, and the decision thresholds must
    partition the weight line exactly."""
    from weather_stream_processor_spark.operators.dedup import (
        _FS_FIELDS,
        _fs_weights,
    )
    from weather_stream_processor_spark.sources import load_table

    rows = _run(spark, "fellegi_sunter_linkage").collect()
    assert len(rows) == 50
    weights = [float(r.fs_weight) for r in rows]
    assert weights == sorted(weights, reverse=True)
    assert {r.fs_decision for r in rows} <= {"match", "possible", "non_match"}

    cust = {
        int(r.c_custkey): r
        for r in load_table(spark, SF_SMOKE, "customer").collect()
    }
    supp = {
        int(r.s_suppkey): r
        for r in load_table(spark, SF_SMOKE, "supplier").collect()
    }
    for r in rows[:10]:
        c, s = cust[int(r.c_custkey)], supp[int(r.s_suppkey)]
        assert c.c_nationkey == s.s_nationkey  # blocking invariant
        cnum = int(c.c_name[9:])
        snum = int(s.s_name[9:])
        agree = {
            "balance_band": math.floor(c.c_acctbal / 1000.0)
            == math.floor(s.s_acctbal / 1000.0),
            "balance_sign": (c.c_acctbal < 0.0) == (s.s_acctbal < 0.0),
            "name_num_100": cnum % 100 == snum % 100,
            "name_num_7": cnum % 7 == snum % 7,
        }
        expect = 0.0
        for field, (m, u) in _FS_FIELDS.items():
            wa, wd = _fs_weights(m, u)
            expect += wa if agree[field] else wd
        assert abs(float(r.fs_weight) - round(expect, 6)) < 1e-9
        if expect >= 6.0:
            assert r.fs_decision == "match"
        elif expect >= 0.0:
            assert r.fs_decision == "possible"
        else:
            assert r.fs_decision == "non_match"


def test_agreement_patterns_are_a_complete_contingency_table(spark):
    """The pattern histogram must partition the blocked pair set (cell
    counts sum to the exact join size) and the independence-expected
    column must itself sum back to the pair total (the product measure
    is a probability measure over the 2^4 cells)."""
    from weather_stream_processor_spark.sources import load_table

    rows = _run(spark, "linkage_agreement_patterns").collect()
    assert 1 <= len(rows) <= 16
    c = load_table(spark, SF_SMOKE, "customer").select("c_nationkey")
    s = load_table(spark, SF_SMOKE, "supplier").select("s_nationkey")
    n_pairs = c.join(s, c.c_nationkey == s.s_nationkey).count()
    assert sum(r.observed for r in rows) == n_pairs
    # expected_indep sums to n_pairs only over ALL 16 cells; the emitted
    # cells cover every OBSERVED pattern, so the partial sum is <= total
    # and the gap is exactly the unobserved cells' expected mass
    assert sum(r.expected_indep for r in rows) <= n_pairs + 1e-6
    for r in rows:
        assert r.observed > 0
        assert r.expected_indep >= 0.0


def test_fs_em_step_matches_numpy_rederivation(spark):
    """One EM iteration re-derived in numpy from the agreement-pattern
    histogram must reproduce every (m_new, u_new, lambda_new) exactly
    (same fixed-order arithmetic), and the update must sharpen the
    vague priors: each field's m_new must exceed its u_new."""
    from weather_stream_processor_spark.operators.dedup import (
        _FS_EM_INIT,
        _FS_EM_LAMBDA,
        _FS_FIELDS,
    )

    fields = list(_FS_FIELDS)
    cells = {
        tuple(int(r[f"ag_{f}"]) for f in fields): float(r.observed)
        for r in _run(spark, "linkage_agreement_patterns").collect()
    }
    rows = {r.field: r for r in _run(spark, "fellegi_sunter_em_step").collect()}
    assert set(rows) == set(fields)

    lam = _FS_EM_LAMBDA
    g = {}
    for pat, obs in cells.items():
        pm = pu = 1.0
        for i, f in enumerate(fields):
            m0, u0 = _FS_EM_INIT[f]
            pm *= m0 if pat[i] == 1 else 1.0 - m0
            pu *= u0 if pat[i] == 1 else 1.0 - u0
        g[pat] = (lam * pm) / (lam * pm + (1.0 - lam) * pu)
    n = sum(cells.values())
    gm = sum(g[p] * o for p, o in cells.items())
    gu = sum((1.0 - g[p]) * o for p, o in cells.items())
    for i, f in enumerate(fields):
        m_new = sum(g[p] * o * p[i] for p, o in cells.items()) / gm
        u_new = sum((1.0 - g[p]) * o * p[i] for p, o in cells.items()) / gu
        r = rows[f]
        assert abs(float(r.m_new) - round(m_new, 6)) < 2e-6
        assert abs(float(r.u_new) - round(u_new, 6)) < 2e-6
        assert abs(float(r.lambda_new) - round(gm / n, 6)) < 2e-6
        assert float(r.m_new) > float(r.u_new)
        assert 0.0 < float(r.lambda_new) < 1.0
