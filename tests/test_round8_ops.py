"""Round-5 operator-batch tests: Bloom decontamination prefilter,
hard-negative mining, k-center coreset, sketch-prefiltered heavy hitters,
the training-layout audits, and the corpus-statistics closers (diversity
curve, memorization scores, quantile calibration, HITS, chi-square) —
semantic properties the oracle hash-gate can't express (no-false-negative
guarantee, greedy-trace optimality structure, mass conservation,
distribution normalization), verified against numpy/pure-Python on the
smoke fixture."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_SMOKE


def _run(spark, name, sf=SF_SMOKE):
    from weather_stream_processor_spark.registry import all_queries

    return all_queries()[name].builder(spark, sf)


def _docs(spark, sf=SF_SMOKE):
    from weather_stream_processor_spark.sources import load_table

    return {
        int(r.doc_id): r.text
        for r in load_table(spark, sf, "documents").select("doc_id", "text").collect()
    }


def _embeddings(spark, sf=SF_SMOKE):
    from weather_stream_processor_spark.sources import load_table

    rows = (
        load_table(spark, sf, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    labs = np.array([r.label for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], labs[order], mat[order]


def _shingles(text: str, n: int = 3) -> set[str]:
    toks = text.split(" ")
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_bloom_decontam_no_false_negatives_and_exact_hits(spark):
    """The Bloom filter may overcount (bloom_hits >= exact_hits, FPs) but
    NEVER undercount — a missed blocklist entry is the one failure mode
    decontamination cannot tolerate. exact_hits must equal the direct
    pure-Python shingle-set intersection per doc."""
    docs = _docs(spark)
    eval_sh: set[str] = set()
    for d, t in docs.items():
        if d % 20 == 0:
            eval_sh |= _shingles(t)
    got = {
        int(r.doc_id): (int(r.n_shingles), int(r.exact_hits), int(r.bloom_hits))
        for r in _run(spark, "bloom_filter_decontam").collect()
    }
    train = {d for d in docs if d % 20 != 0}
    assert set(got) == train  # every training doc reports
    for d in train:
        sh = _shingles(docs[d])
        n_sh, exact, bloom = got[d]
        assert n_sh == len(sh)
        assert exact == len(sh & eval_sh)
        assert bloom >= exact, f"false negative on doc {d}"


def test_hard_negative_mining_matches_brute_force(spark):
    """Per anchor, the blocked-GEMM cross-label argmax must equal the full
    numpy cross join under the same (round(sim,6) DESC, id ASC) order."""
    ids, labs, mat = _embeddings(spark)
    nrm = np.sqrt((mat * mat).sum(axis=1))
    sims = np.round((mat @ mat.T) / np.outer(nrm, nrm), 6)
    sims[ids[:, None] == ids[None, :]] = -np.inf
    sims[labs[:, None] == labs[None, :]] = -np.inf
    want = {}
    for r in range(len(ids)):
        order = np.lexsort((ids, -sims[r]))
        c = order[0]
        if sims[r][c] != -np.inf:
            want[int(ids[r])] = (int(ids[c]), float(sims[r][c]))
    got = {
        int(r.vec_id): (int(r.negative_id), float(r.cosine_sim))
        for r in _run(spark, "hard_negative_mining").collect()
    }
    assert got == want


def test_kcenter_trace_matches_greedy_and_is_monotone(spark):
    """The selection trace must replay the exact greedy farthest-first
    recursion (numpy, same 6dp rounding and id tie-break), and sep_dist
    must be non-increasing — each new center can only shrink the
    farthest remaining distance (the property that makes the trace a
    diversity-vs-budget curve)."""
    from weather_stream_processor_spark.operators.similarity import KCENTER_K

    ids, _, mat = _embeddings(spark)
    centers = [int(ids.min())]
    dmin = np.round(((mat - mat[ids == centers[0]][0]) ** 2).sum(axis=1), 6)
    want = [(0, centers[0], 0.0)]
    for r in range(1, KCENTER_K):
        order = np.lexsort((ids, -dmin))
        nxt = order[0]
        want.append((r, int(ids[nxt]), float(dmin[nxt])))
        dmin = np.minimum(dmin, np.round(((mat - mat[nxt]) ** 2).sum(axis=1), 6))
    got = [
        (int(r.round), int(r.center_id), float(r.sep_dist))
        for r in _run(spark, "kcenter_coreset").orderBy("round").collect()
    ]
    assert got == want
    seps = [s for _, _, s in got[1:]]
    assert all(a >= b for a, b in zip(seps, seps[1:])), "sep_dist not monotone"


def test_heavy_hitters_equal_plain_counting(spark):
    """Sketch-prefilter + recount must equal the trivial full count — on
    ANY partitioning (the candidate superset varies; the output must
    not). The fixture parquet arrives as one split, so the invariance
    claim is additionally exercised by re-running phase 1 over an
    explicit 8-way repartition of the same corpus."""
    from collections import Counter

    from weather_stream_processor_spark.operators.aggregates import (
        _HH_CAPACITY,
        _HH_SUPPORT,
    )
    from weather_stream_processor_spark.sources import load_table

    docs = _docs(spark)
    counts: Counter = Counter()
    for t in docs.values():
        counts.update(t.split(" "))
    n = sum(counts.values())
    want = {
        tok: c for tok, c in counts.items() if c / n >= _HH_SUPPORT
    }
    got = {
        r.token: int(r.occurrences)
        for r in _run(spark, "heavy_hitters_exact").collect()
    }
    assert got == want

    # partitioning invariance: phase 1 over 8 splits must yield a
    # candidate SUPERSET of the truth, so the recounted output is equal
    base = load_table(spark, SF_SMOKE, "documents").select("text").repartition(8)
    import pandas as pd

    def phase1(batches):
        local: Counter = Counter()
        n_local = 0
        under = 0
        from weather_stream_processor_spark.operators.aggregates import _mg_compact

        for pdf in batches:
            for toks in pdf["text"].str.split(" "):
                local.update(toks)
                n_local += len(toks)
            under += _mg_compact(local, _HH_CAPACITY)
        thresh = n_local * _HH_SUPPORT - under
        yield pd.DataFrame({"token": [t for t, c in local.items() if c >= thresh]})

    cand8 = {
        r.token for r in base.mapInPandas(phase1, "token string").distinct().collect()
    }
    assert set(want) <= cand8, "8-way phase 1 lost a true heavy hitter"


def test_length_bucketed_batches_conserve_mass(spark):
    """Batches partition the corpus: sum of sum_tokens equals the corpus
    token count, no batch exceeds the batch size, and padding_waste sits
    in [0, 1) with max_len >= every member's implied mean."""
    from weather_stream_processor_spark.operators.sampling import _LB_BATCH

    docs = _docs(spark)
    total = sum(len(t.split(" ")) for t in docs.values())
    rows = _run(spark, "length_bucketed_batches").collect()
    assert sum(int(r.sum_tokens) for r in rows) == total
    assert sum(int(r.n_docs) for r in rows) == len(docs)
    for r in rows:
        assert 1 <= r.n_docs <= _LB_BATCH
        assert 0.0 <= r.padding_waste < 1.0
        assert r.max_len * r.n_docs >= r.sum_tokens


def test_stratified_kfold_is_reproducible_arithmetic(spark):
    """Fold ids must equal the pure-Python multiplicative hash for every
    doc (the reproducibility contract), and per-lang fold sizes must sum
    to the stratum size."""
    from weather_stream_processor_spark.operators.sampling import (
        _KFOLD,
        _KFOLD_MULT,
    )
    from weather_stream_processor_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang").collect()
    want: dict[tuple[str, int], int] = {}
    for r in docs:
        f = (((r.doc_id % 2147483648) * _KFOLD_MULT) % 4294967296) % _KFOLD
        key = (r.lang, f)
        want[key] = want.get(key, 0) + 1
    got = {
        (r.lang, int(r.fold)): int(r.n_docs)
        for r in _run(spark, "stratified_kfold_assignment").collect()
    }
    assert got == want


def test_ngram_diversity_bounds_and_unigram_consistency(spark):
    """Diversity ratios live in (0, 1]; the n=1 row must equal the exact
    type/token ratio computed in pure Python."""
    docs = _docs(spark)
    toks = [t for d in docs.values() for t in d.split(" ")]
    rows = {int(r.n): r for r in _run(spark, "ngram_diversity_curve").collect()}
    assert set(rows) == {1, 2, 3, 4}
    for r in rows.values():
        assert 0.0 < r.diversity <= 1.0
        assert r.distinct_ngrams <= r.total_ngrams
    assert rows[1].total_ngrams == len(toks)
    assert rows[1].distinct_ngrams == len(set(toks))


def test_memorization_scores_match_pure_python(spark):
    """Per-doc repeated-window fractions re-derived with pure-Python window
    sets; 'trim' fires exactly at the threshold."""
    from weather_stream_processor_spark.operators.text import (
        _MEMO_TRIM,
        _MEMO_WIN,
    )

    docs = _docs(spark)
    wins = {
        d: [
            " ".join(t.split(" ")[i : i + _MEMO_WIN])
            for i in range(len(t.split(" ")) - _MEMO_WIN + 1)
        ]
        for d, t in docs.items()
    }
    owners: dict[str, set[int]] = {}
    for d, ws in wins.items():
        for w in ws:
            owners.setdefault(w, set()).add(d)
    got = {
        int(r.doc_id): (int(r.n_windows), int(r.n_repeated), r.action)
        for r in _run(spark, "memorization_risk_scores").collect()
    }
    for d, ws in wins.items():
        if not ws:
            continue
        rep = sum(1 for w in ws if len(owners[w]) >= 2)
        n_w, n_r, action = got[d]
        assert (n_w, n_r) == (len(ws), rep)
        assert action == ("trim" if rep / len(ws) >= _MEMO_TRIM else "keep")


def test_quantile_norm_cutpoints_are_monotone_per_source(spark):
    """Decile cutpoints must be non-decreasing in d within every source
    and globally (they are order statistics of the same distribution)."""
    rows = _run(spark, "quality_score_quantile_norm").collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append((int(r.decile), r.source_cut, r.global_cut))
    for cuts in by_src.values():
        cuts.sort()
        sc = [c for _, c, _ in cuts]
        gc = [g for _, _, g in cuts]
        assert all(a <= b for a, b in zip(sc, sc[1:]))
        assert all(a <= b for a, b in zip(gc, gc[1:]))


def test_hits_authority_is_normalized_distribution(spark):
    """Authorities are an L1-normalized score vector: positive, summing to
    1 (6dp rounding tolerance), defined for every purchased brand."""
    rows = _run(spark, "hits_brand_authority").collect()
    assert len(rows) > 1
    total = sum(r.authority for r in rows)
    assert abs(total - 1.0) < 1e-4
    assert all(r.authority > 0 for r in rows)


def test_chi_square_matches_pure_python(spark):
    """Chi-square, dof and Cramer's V re-derived from the raw contingency
    table in pure Python."""
    import math

    from weather_stream_processor_spark.sources import load_table

    rows = (
        load_table(spark, SF_SMOKE, "documents").select("lang", "source").collect()
    )
    cells: dict[tuple[str, str], int] = {}
    for r in rows:
        cells[(r.lang, r.source)] = cells.get((r.lang, r.source), 0) + 1
    langs = {k[0] for k in cells}
    srcs = {k[1] for k in cells}
    n = len(rows)
    rl = {la: sum(c for (l2, _), c in cells.items() if l2 == la) for la in langs}
    cs = {s: sum(c for (_, s2), c in cells.items() if s2 == s) for s in srcs}
    # full grid, zero-observed cells included: (0 - e)^2 / e = e
    chi = sum(
        (cells.get((la, s), 0) - rl[la] * cs[s] / n) ** 2 / (rl[la] * cs[s] / n)
        for la in langs
        for s in srcs
    )
    [got] = _run(spark, "lang_source_chi_square").collect()
    assert abs(got.chi_square - round(chi, 6)) < 1e-6
    assert got.dof == (len(langs) - 1) * (len(srcs) - 1)
    want_v = math.sqrt(chi / (n * min(len(langs) - 1, len(srcs) - 1)))
    assert abs(got.cramers_v - round(want_v, 6)) < 1e-6


def test_fold_leakage_partitions_all_near_dup_pairs(spark):
    """The fold-pair matrix must PARTITION the near-dup pair set: cell
    counts sum to the ngram_jaccard_pairs row count, shares sum to 1,
    and each cell's labels match a pure-Python re-derivation of the
    kfold hash on the pair list."""
    pairs = [
        (int(r.doc_a), int(r.doc_b))
        for r in _run(spark, "ngram_jaccard_pairs").collect()
    ]

    def fold(d: int) -> int:
        return (((d % 2147483648) * 2654435761) % 4294967296) % 5

    from collections import Counter

    expected = Counter(
        (min(fold(a), fold(b)), max(fold(a), fold(b))) for a, b in pairs
    )
    rows = _run(spark, "cv_fold_leakage_audit").collect()
    got = {(int(r.fold_a), int(r.fold_b)): int(r.n_pairs) for r in rows}
    assert got == dict(expected)
    assert sum(got.values()) == len(pairs)
    assert abs(sum(float(r.pair_share) for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert int(r.cross_fold) == (0 if r.fold_a == r.fold_b else 1)


def test_phrase_match_positions_are_exact_occurrences(spark):
    """Every reported (doc, pos) must be a literal occurrence of the
    phrase at that 1-based token position, the phrase must be the
    corpus-wide most frequent trigram (lexicographic tie-break), and NO
    occurrence may be missing."""
    from collections import Counter

    docs = _docs(spark)
    tri_count: Counter = Counter()
    occs: dict[str, list[tuple[int, int]]] = {}
    for d, t in docs.items():
        toks = t.split(" ")
        for i in range(len(toks) - 2):
            g = " ".join(toks[i : i + 3])
            tri_count[g] += 1
            occs.setdefault(g, []).append((d, i + 1))
    top = min(tri_count, key=lambda g: (-tri_count[g], g))
    rows = _run(spark, "phrase_match_positions").collect()
    assert {r.phrase for r in rows} == {top}
    assert {(int(r.doc_id), int(r.pos)) for r in rows} == set(occs[top])


def test_k_anonymity_audit_flags_and_shares(spark):
    """Anonymity sets must sum to the corpus size, the at_risk flag must
    equal (anonymity_set < 5), and a pure-Python regroup of the
    quasi-identifier tuple must reproduce every cell."""
    from collections import Counter

    from weather_stream_processor_spark.sources import load_table

    meta = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "lang", "source", "n_chars")
        .collect()
    )
    expected = Counter((r.lang, r.source, int(r.n_chars) // 100) for r in meta)
    rows = _run(spark, "k_anonymity_audit").collect()
    got = {(r.lang, r.source, int(r.len_bucket)): int(r.anonymity_set) for r in rows}
    assert got == dict(expected)
    assert sum(got.values()) == len(meta)
    for r in rows:
        assert int(r.at_risk) == (1 if int(r.anonymity_set) < 5 else 0)
        assert abs(float(r.doc_share) - int(r.anonymity_set) / len(meta)) < 1e-5


def test_conformal_coverage_matches_numpy_and_is_calibrated(spark):
    """Re-derive the whole split-conformal pipeline in numpy/pure Python
    (even/odd split, per-(type,hour) calibration mean, exact interpolated
    q0.9 residual quantile, test coverage) and require cell-identical
    output. The coverage BAND is deliberately loose: on the ~200-events-
    per-type smoke fixture each (type, hour) cell holds ~5 calibration
    points, so in-sample residuals are biased low (the mean was fit on
    them) and measured coverage sits at 0.71-0.82; at sf0.01 (~2000 per
    type) the same operator measures 0.86-0.90 against the nominal 0.9 —
    the conformal guarantee needs exchangeability and n >> cells, both of
    which the smoke fixture intentionally lacks."""
    from weather_stream_processor_spark.sources import load_table

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .selectExpr("event_type", "hour(ts) AS hod", "value", "event_id")
        .where("value IS NOT NULL")
        .collect()
    )
    cal = [r for r in ev if r.event_id % 2 == 0]
    test = [r for r in ev if r.event_id % 2 != 0]
    preds: dict[tuple[str, int], float] = {}
    acc: dict[tuple[str, int], list[float]] = {}
    for r in cal:
        acc.setdefault((r.event_type, r.hod), []).append(r.value)
    preds = {k: round(float(np.mean(v)), 6) for k, v in acc.items()}
    resid: dict[str, list[float]] = {}
    for r in cal:
        resid.setdefault(r.event_type, []).append(
            round(abs(r.value - preds[(r.event_type, r.hod)]), 6)
        )
    rows = _run(spark, "conformal_interval_coverage").collect()
    assert rows, "no output"
    for row in rows:
        rs = resid[row.event_type]
        assert int(row.n_cal) == len(rs)
        q = round(float(np.quantile(rs, 0.9, method="linear")), 6)
        assert abs(float(row.halfwidth) - q) < 1e-6, (row.event_type, row.halfwidth, q)
        tt = [
            r
            for r in test
            if r.event_type == row.event_type and (r.event_type, r.hod) in preds
        ]
        cov = sum(
            1
            for r in tt
            if round(abs(r.value - preds[(r.event_type, r.hod)]), 6) <= q
        ) / len(tt)
        assert int(row.n_test) == len(tt)
        assert abs(float(row.coverage) - cov) < 1e-6
        assert 0.65 <= float(row.coverage) <= 1.0


def test_streaming_anti_and_semi_partition_the_closed_views(spark):
    """Anti (abandoned) and semi (converted) feeds must be disjoint, and
    their union must cover every view whose join horizon the final
    watermark closed: anti = closed views minus semi-matched views."""
    from weather_stream_processor_spark.sources import load_table

    anti = {int(r.view_id) for r in _run(spark, "streaming_abandoned_views_anti").collect()}
    semi = {int(r.view_id) for r in _run(spark, "streaming_stream_stream_semi_join").collect()}
    assert not (anti & semi)
    ev = load_table(spark, SF_SMOKE, "events").collect()
    views = [(int(r.event_id), r.user_id, r.ts) for r in ev if r.event_type == "view"]
    pur = [(r.user_id, r.ts) for r in ev if r.event_type == "purchase"]
    import datetime as dt

    wmax = min(max(t for _, _, t in views), max(t for _, t in pur)) - dt.timedelta(hours=2)
    matched = {
        vid
        for vid, u, t in views
        if any(pu == u and t <= pt <= t + dt.timedelta(hours=1) for pu, pt in pur)
    }
    closed_unmatched = {
        vid
        for vid, u, t in views
        if vid not in matched and t + dt.timedelta(hours=1) < wmax
    }
    assert anti == closed_unmatched


def test_group_aware_folds_eliminate_leakage(spark):
    """The whole point: under group-aware assignment every near-dup pair
    is co-fold (cross_fold_pairs identically 0), doc counts cover the
    corpus, and a pure-Python re-derivation (CC via union-find over the
    jaccard pairs, fold = kfold hash of the cluster-min id) reproduces
    every per-fold cell."""
    pairs = [
        (int(r.doc_a), int(r.doc_b))
        for r in _run(spark, "ngram_jaccard_pairs").collect()
    ]
    docs = sorted(_docs(spark))
    parent = {d: d for d in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    def fold(g: int) -> int:
        return (((g % 2147483648) * 2654435761) % 4294967296) % 5

    from collections import Counter, defaultdict

    n_docs: Counter = Counter()
    groups = defaultdict(set)
    for d in docs:
        g = find(d)
        f = fold(g)
        n_docs[f] += 1
        groups[f].add(g)
    rows = _run(spark, "group_aware_fold_assignment").collect()
    assert {int(r.fold): int(r.n_docs) for r in rows} == dict(n_docs)
    assert {int(r.fold): int(r.n_groups) for r in rows} == {
        f: len(g) for f, g in groups.items()
    }
    assert all(int(r.cross_fold_pairs) == 0 for r in rows)
    assert sum(int(r.n_docs) for r in rows) == len(docs)


def test_knn_label_noise_matches_brute_force(spark):
    """Exact re-derivation: numpy full cosine matrix, top-5 neighbors per
    vector ((sim DESC, id ASC) total order on 6dp-rounded sims), noise =
    neighbor-label disagreement fraction — must match every row, and the
    action flag must follow the 0.8 threshold."""
    ids, labs, mat = _embeddings(spark)
    n = len(ids)
    nrm = mat / np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    sims = np.round(nrm @ nrm.T, 6)
    np.fill_diagonal(sims, -np.inf)
    expected = {}
    for r in range(n):
        order = np.lexsort((ids, -sims[r]))[:5]
        dis = int(sum(labs[o] != labs[r] for o in order))
        expected[int(ids[r])] = (int(labs[r]), dis, round(dis / 5, 6))
    rows = _run(spark, "knn_label_noise_scores").collect()
    assert len(rows) == n
    for row in rows:
        lab, dis, score = expected[int(row.vec_id)]
        assert (int(row.label), int(row.n_disagree)) == (lab, dis)
        assert abs(float(row.noise_score) - score) < 1e-9
        assert row.action == ("review" if score >= 0.8 else "keep")


def test_jl_distortion_matches_numpy_and_concentrates(spark):
    """The projection must equal numpy's S@x/sqrt(m) with the same sign
    constants, per-pair ratios must match, and the JL concentration must
    hold loosely: mean ratio within 15% of 1, ~all ratios in [0.2, 2.5]
    at m=16 — and the TAILS are honest: with only m=16 Rademacher sums
    the squared-ratio is roughly chi^2_16/16 (stddev ~0.35) but
    individual pairs land out to ~0.08x / ~5.5x on this fixture
    (correlated dims concentrate some pair differences in few
    directions), so the band asserts the bulk, not a clip the data
    does not obey: mean within 15% of 1, >=97% of ratios in
    [0.05, 4.0]."""
    from weather_stream_processor_spark.operators.similarity import (
        _JL_SIGNS,
        JL_M,
    )

    ids, _, mat = _embeddings(spark)
    S = np.array(_JL_SIGNS, dtype=np.float64)  # (m, d)
    Y = np.round(mat @ S.T / np.sqrt(JL_M), 6)
    idx = {int(v): i for i, v in enumerate(ids)}
    rows = _run(spark, "jl_projection_distortion").collect()
    assert rows
    ratios = []
    for r in rows:
        a, b = idx[int(r.vec_a)], idx[int(r.vec_b)]
        d2o = round(float(((mat[a] - mat[b]) ** 2).sum()), 6)
        d2p = float(
            sum((Y[a][j] - Y[b][j]) * (Y[a][j] - Y[b][j]) for j in range(JL_M))
        )
        assert abs(float(r.d2_orig) - d2o) < 1e-6
        assert abs(float(r.d2_proj) - round(d2p, 6)) < 1e-6
        ratios.append(float(r.ratio))
    assert abs(float(np.mean(ratios)) - 1.0) < 0.15
    assert np.mean([(0.05 <= x <= 4.0) for x in ratios]) > 0.97
