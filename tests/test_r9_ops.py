"""Round-9 operator tests: corpus BLEU components, leave-one-source-out
influence, and the Condorcet cycle audit — each checked against an
independent pure-Python rederivation on a CONSTRUCTED corpus where the
expected behavior is known in closed form (the fixture oracle parity is
covered by tools/oracle_check.py; these tests pin the semantics the
oracle merely mirrors).
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


# --------------------------------------------------------------------------
# corpus_bleu_eval
# --------------------------------------------------------------------------


def _py_bleu_components(texts, drop=7, max_n=4):
    comp = {}
    cand_len = ref_len = 0
    for n in range(1, max_n + 1):
        clipped = cand_tot = 0
        for t in texts:
            ref = t.split(" ")
            cand = [w for i, w in enumerate(ref, start=1) if i % drop != 0]
            rg = Counter(
                tuple(ref[i : i + n]) for i in range(len(ref) - n + 1)
            )
            cg = Counter(
                tuple(cand[i : i + n]) for i in range(len(cand) - n + 1)
            )
            cand_tot += sum(cg.values())
            clipped += sum(min(c, rg[g]) for g, c in cg.items())
        comp[n] = (clipped, cand_tot)
    cand_len = sum(
        len([w for i, w in enumerate(t.split(" "), start=1) if i % drop != 0])
        for t in texts
    )
    ref_len = sum(len(t.split(" ")) for t in texts)
    return comp, cand_len, ref_len


def test_corpus_bleu_matches_python_rederivation(spark, tmp_path):
    texts = [
        "the cat sat on the mat while the dog sat on the cat",  # repeats: clipping binds
        "a b c d e f g h i j k l m n o",  # > drop period, loses tokens 7 and 14
        "one two three",  # shorter than max_n for 4-grams
        "x y",  # shorter than 3
        "solo",  # single token: no bigrams at all
    ]
    _write_docs(str(tmp_path), texts)
    spec = all_queries()["corpus_bleu_eval"]
    got = {
        int(r["n"]): (
            int(r["clipped_total"]),
            int(r["cand_total"]),
            int(r["cand_len"]),
            int(r["ref_len"]),
        )
        for r in (x.asDict() for x in spec.builder(spark, str(tmp_path)).collect())
    }
    comp, cand_len, ref_len = _py_bleu_components(texts)
    assert set(got) == {1, 2, 3, 4}
    for n, (clipped, cand_tot) in comp.items():
        assert got[n] == (clipped, cand_tot, cand_len, ref_len), f"n={n}"
    # unigram clipping can NEVER bind for a drop-derived candidate (its
    # token multiset is a subset of the reference's) ...
    assert got[1][0] == got[1][1]
    # ... the damage appears at n>=2, where dropping a token makes its
    # neighbors adjacent and mints bigrams absent from the reference,
    # and in the brevity penalty (candidate strictly shorter)
    assert got[2][0] < got[2][1]
    assert got[2][2] < got[2][3]


def test_corpus_bleu_identity_when_nothing_dropped(spark, tmp_path):
    """Docs shorter than the drop period keep every token, so the
    candidate IS the reference: clipped == cand_total at every n and the
    corpus BLEU assembled from the components is exactly 1."""
    texts = ["alpha beta gamma delta epsilon zeta", "one two three four"]
    _write_docs(str(tmp_path), texts)
    spec = all_queries()["corpus_bleu_eval"]
    rows = [r.asDict() for r in spec.builder(spark, str(tmp_path)).collect()]
    assert all(int(r["clipped_total"]) == int(r["cand_total"]) for r in rows)
    assert all(int(r["cand_len"]) == int(r["ref_len"]) for r in rows)
    bleu = math.exp(
        sum(
            0.25 * math.log(int(r["clipped_total"]) / int(r["cand_total"]))
            for r in rows
        )
    )
    assert bleu == pytest.approx(1.0)


# --------------------------------------------------------------------------
# loo_source_influence
# --------------------------------------------------------------------------


def test_loo_influence_moment_identity_vs_numpy(spark, tmp_path):
    """The hashed integer moments must reproduce the directly-computed
    leave-one-source-out centroid shift: for each source g,
    ||mu_all - mu_wo_g||^2 == (n^2*sgg - 2*n*n_g*sgt + n_g^2*stt)
    / (n*(n-n_g))^2 on the lifted integer vectors."""
    import numpy as np

    rng_rows = []
    # deterministic vectors: v[j] = ((i * 7 + j * 3) % 13 - 6) / 10
    for i in range(1, 13):
        vec = [(((i * 7 + j * 3) % 13) - 6) / 10.0 for j in range(32)]
        rng_rows.append((i, vec, i % 3))
    emb = pd.DataFrame(
        {
            "vec_id": [r[0] for r in rng_rows],
            "embedding": [r[1] for r in rng_rows],
            "label": pd.array([r[2] for r in rng_rows], dtype="int32"),
        }
    )
    texts = [f"doc {i}" for i in range(1, 13)]
    _write_docs(
        str(tmp_path), texts, sources=[f"src{i % 3}" for i in range(1, 13)]
    )
    duckdb.connect().execute(
        f"COPY (SELECT * FROM emb) TO '{tmp_path}/embeddings.parquet' "
        "(FORMAT PARQUET)"
    )
    spec = all_queries()["loo_source_influence"]
    rows = [r.asDict() for r in spec.builder(spark, str(tmp_path)).collect()]
    lifted = {
        r[0]: np.floor(np.array(r[1]) * 10000.0 + 0.5).astype("int64")
        for r in rng_rows
    }
    sources = {i: f"src{i % 3}" for i in range(1, 13)}
    all_ids = list(lifted)
    S = sum(lifted[i] for i in all_ids)
    n = len(all_ids)
    for r in rows:
        g_ids = [i for i in all_ids if sources[i] == r["source"]]
        S_g = sum(lifted[i] for i in g_ids)
        n_g = len(g_ids)
        assert int(r["n_g"]) == n_g and int(r["n"]) == n
        sgg, sgt, stt = int(r["sgg"]), int(r["sgt"]), int(r["stt"])
        assert sgg == int(S_g @ S_g) and sgt == int(S_g @ S) and stt == int(S @ S)
        # consumer seam: reconstruct the actual centroid shift
        mu_all = S / n
        mu_wo = (S - S_g) / (n - n_g)
        direct = float(((mu_all - mu_wo) ** 2).sum())
        num = n * n * sgg - 2 * n * n_g * sgt + n_g * n_g * stt
        den = (n * (n - n_g)) ** 2
        assert num / den == pytest.approx(direct, rel=1e-12)


# --------------------------------------------------------------------------
# condorcet_cycle_audit
# --------------------------------------------------------------------------


def _write_pref_fixture(tmp_path, spends):
    """spends: {cust: {brand: spend_int}} — build minimal lineitem/
    orders/part parquet where each (cust, brand) buys one line item at
    exactly spend/10000 extendedprice with zero discount."""
    li, orders, part = [], [], []
    partkey = {}
    okey = 0
    lno = 0
    for cust, by_brand in spends.items():
        okey += 1
        orders.append((okey, cust))
        for brand, spend in by_brand.items():
            if brand not in partkey:
                partkey[brand] = len(partkey) + 1
                part.append((partkey[brand], brand))
            lno += 1
            li.append((okey, partkey[brand], spend / 10000.0, 0.0, lno))
    li_df = pd.DataFrame(
        li,
        columns=["l_orderkey", "l_partkey", "l_extendedprice", "l_discount", "l_linenumber"],
    )
    o_df = pd.DataFrame(orders, columns=["o_orderkey", "o_custkey"])
    p_df = pd.DataFrame(part, columns=["p_partkey", "p_brand"])
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM li_df) TO '{tmp_path}/lineitem.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT * FROM o_df) TO '{tmp_path}/orders.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT * FROM p_df) TO '{tmp_path}/part.parquet' (FORMAT PARQUET)"
    )


def test_condorcet_detects_constructed_paradox(spark, tmp_path):
    """The canonical 3-voter Condorcet paradox: majority prefers A>B,
    B>C, C>A — exactly one directed 3-cycle, zero ties."""
    spends = {
        1: {"A": 30000, "B": 20000, "C": 10000},  # A > B > C
        2: {"B": 30000, "C": 20000, "A": 10000},  # B > C > A
        3: {"C": 30000, "A": 20000, "B": 10000},  # C > A > B
    }
    _write_pref_fixture(str(tmp_path), spends)
    spec = all_queries()["condorcet_cycle_audit"]
    row = spec.builder(spark, str(tmp_path)).collect()[0].asDict()
    assert row == {"n_brands": 3, "n_edges": 3, "n_ties": 0, "n_cycles": 1}


def test_condorcet_transitive_majority_has_no_cycles(spark, tmp_path):
    """Aligned voters produce a transitive majority order: full edge set
    C(3,2)=3, zero cycles; and an exactly-split pair records a tie."""
    spends = {
        1: {"A": 30000, "B": 20000, "C": 10000},
        2: {"A": 30000, "B": 20000, "C": 10000},
        3: {"A": 10000, "B": 20000, "C": 30000},  # dissent, outvoted
    }
    _write_pref_fixture(str(tmp_path), spends)
    spec = all_queries()["condorcet_cycle_audit"]
    row = spec.builder(spark, str(tmp_path)).collect()[0].asDict()
    assert row["n_cycles"] == 0 and row["n_edges"] == 3 and row["n_ties"] == 0

    # two-voter exact split on every pair -> all ties, no edges
    spends2 = {
        1: {"A": 30000, "B": 10000},
        2: {"A": 10000, "B": 30000},
    }
    import shutil, os

    sub = tmp_path / "split"
    os.makedirs(sub, exist_ok=True)
    _write_pref_fixture(str(sub), spends2)
    row2 = spec.builder(spark, str(sub)).collect()[0].asDict()
    assert row2 == {"n_brands": 2, "n_edges": 0, "n_ties": 1, "n_cycles": 0}


# --------------------------------------------------------------------------
# rank_biased_overlap
# --------------------------------------------------------------------------


def test_rbo_identical_rankings_closed_form(spark, tmp_path):
    """With a single query term both rankers order identically, so
    overlap_d = d and truncated RBO@10 collapses to the closed form
    1 - p^10: rbo_num must be exactly 2520 * (10^10 - 9^10)."""
    # 12 docs, doc i contains 'spark' (13 - i) times -> strict order
    texts = [" ".join(["spark"] * (13 - i)) for i in range(1, 13)]
    _write_docs(str(tmp_path), texts)
    spec = all_queries()["rank_biased_overlap"]
    rows = [r.asDict() for r in spec.builder(spark, str(tmp_path)).collect()]
    assert len(rows) == 10
    for r in rows:
        assert int(r["overlap"]) == int(r["d"])
    assert int(rows[0]["rbo_num"]) == 2520 * (10**10 - 9**10)
    assert int(rows[0]["rbo_den"]) == 2520 * 10**10


def test_rbo_matches_fraction_rederivation(spark, tmp_path):
    """Two terms with different document frequencies make the TF and
    rarity-weighted rankings disagree; the integer numerator must equal
    the exact Fraction computation from first principles."""
    from fractions import Fraction

    # 'spark' is common (low rarity weight), 'window' is rare (high)
    texts = []
    for i in range(1, 15):
        parts = ["spark"] * (i % 5 + 1)
        if i % 4 == 0:
            parts += ["window"] * (i % 3 + 1)
        parts += ["filler"] * 3
        texts.append(" ".join(parts))
    _write_docs(str(tmp_path), texts)
    spec = all_queries()["rank_biased_overlap"]
    rows = sorted(
        (r.asDict() for r in spec.builder(spark, str(tmp_path)).collect()),
        key=lambda r: int(r["d"]),
    )
    # rederive: per-doc s_tf / s_idf
    n_docs = len(texts)
    terms = ("spark", "join", "window")
    tf = {}
    for i, t in enumerate(texts, start=1):
        toks = t.split(" ")
        for term in terms:
            c = toks.count(term)
            if c:
                tf[(i, term)] = c
    df = {term: sum(1 for (_, tm) in tf if tm == term) for term in terms}
    docs_matched = sorted({i for (i, _) in tf})
    s_tf = {i: sum(c for (d, tm), c in tf.items() if d == i) for i in docs_matched}
    s_idf = {
        i: sum(c * (n_docs - df[tm]) for (d, tm), c in tf.items() if d == i)
        for i in docs_matched
    }
    rank_a = {
        d: r + 1
        for r, d in enumerate(sorted(docs_matched, key=lambda d: (-s_tf[d], d)))
    }
    rank_b = {
        d: r + 1
        for r, d in enumerate(sorted(docs_matched, key=lambda d: (-s_idf[d], d)))
    }
    p = Fraction(9, 10)
    rbo = Fraction(0)
    for d in range(1, 11):
        ov = sum(1 for i in docs_matched if rank_a[i] <= d and rank_b[i] <= d)
        assert ov == int(rows[d - 1]["overlap"]), f"depth {d}"
        rbo += (1 - p) * p ** (d - 1) * Fraction(ov, d)
    assert Fraction(int(rows[0]["rbo_num"]), int(rows[0]["rbo_den"])) == rbo


# --------------------------------------------------------------------------
# scaling_law_ols_fit
# --------------------------------------------------------------------------


def test_scaling_law_fit_matches_numpy_lstsq(spark):
    """The Cramer 3x3 closed form must agree with numpy's least-squares
    solve on the same (ln n_docs, ln n_tokens) -> ln vocab cell points
    from the real sf0.001 fixture."""
    import numpy as np

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    pts = con.execute(
        """
        SELECT ln(COUNT(*)) AS x1,
               ln(SUM(len(string_split(text, ' ')))) AS x2,
               ln(COUNT(DISTINCT tok)) AS y
        FROM (SELECT source, lang, text,
                     unnest(string_split(text, ' ')) AS tok
              FROM documents)
        GROUP BY source, lang
        """
    ).fetchnumpy()
    # careful: the doubled rows from unnest inflate COUNT(*); recompute
    cells = con.execute(
        """
        WITH c AS (
            SELECT source, lang, COUNT(*) AS n_docs,
                   SUM(len(string_split(text, ' '))) AS n_tokens
            FROM documents GROUP BY source, lang
        ),
        v AS (
            SELECT source, lang, COUNT(DISTINCT tok) AS v
            FROM (SELECT source, lang, unnest(string_split(text, ' ')) AS tok
                  FROM documents) GROUP BY source, lang
        )
        SELECT ln(c.n_docs) AS x1, ln(c.n_tokens) AS x2, ln(v.v) AS y
        FROM c JOIN v USING (source, lang)
        """
    ).fetchnumpy()
    X = np.column_stack(
        [np.ones(len(cells["x1"])), cells["x1"], cells["x2"]]
    )
    coef, *_ = np.linalg.lstsq(X, cells["y"], rcond=None)
    spec = all_queries()["scaling_law_ols_fit"]
    row = spec.builder(spark, "/root/testdata/sf0.001").collect()[0].asDict()
    assert int(row["n_cells"]) == len(cells["x1"])
    assert float(row["alpha"]) == pytest.approx(coef[0], abs=2e-6)
    assert float(row["beta_docs"]) == pytest.approx(coef[1], abs=2e-6)
    assert float(row["beta_tokens"]) == pytest.approx(coef[2], abs=2e-6)
