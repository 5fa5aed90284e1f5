"""Property-style invariants (SURVEY §5.2): semantics that must hold for
ARBITRARY inputs, not just the fixtures — hypothesis generates the rows,
Spark evaluates the same builders' core expressions on literal DataFrames.

Example counts are kept small: each example round-trips through a Spark
job, so the value is in the input diversity, not volume."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

_SETTINGS = dict(max_examples=10, deadline=None)

_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # user_id (few keys -> collisions)
        st.integers(min_value=0, max_value=3_600_000),  # offset seconds
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
    ),
    min_size=1,
    max_size=40,
)


def _ev_df(spark, rows):
    base = datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (uid, i, base + timedelta(seconds=off), float(val))
            for i, (uid, off, val) in enumerate(rows)
        ],
        "user_id long, event_id long, ts timestamp, value double",
    )


@given(rows=_events)
@settings(**_SETTINGS)
def test_hourly_windows_partition_the_global_sum(spark, rows):
    """Tumbling windows are a partition of event time: the windowed sums
    must add up to the global sum exactly (same float op order modulo
    associativity — tolerance covers reassociation only)."""
    df = _ev_df(spark, rows)
    windowed = (
        df.groupBy(F.window("ts", "1 hour"))
        .agg(F.sum("value").alias("s"))
        .agg(F.sum("s"))
        .collect()[0][0]
    )
    total = df.agg(F.sum("value")).collect()[0][0]
    assert math.isclose(windowed, total, rel_tol=1e-9, abs_tol=1e-6)


@given(rows=_events, n_salts=st.integers(min_value=1, max_value=32))
@settings(**_SETTINGS)
def test_salting_preserves_aggregation(spark, rows, n_salts):
    df = _ev_df(spark, rows)
    direct = {
        r.user_id: (r.n, r.s)
        for r in df.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    salted = df.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(n_salts)))
    two_phase = {
        r.user_id: (r.n, r.s)
        for r in salted.groupBy("user_id", "salt")
        .agg(F.count(F.lit(1)).alias("pn"), F.sum("value").alias("ps"))
        .groupBy("user_id")
        .agg(F.sum("pn").alias("n"), F.sum("ps").alias("s"))
        .collect()
    }
    assert set(direct) == set(two_phase)
    for k in direct:
        assert direct[k][0] == two_phase[k][0]
        assert math.isclose(direct[k][1], two_phase[k][1], rel_tol=1e-9, abs_tol=1e-6)


@given(rows=_events)
@settings(**_SETTINGS)
def test_min_per_key_dedup_is_idempotent_and_minimal(spark, rows):
    df = _ev_df(spark, rows)
    once = df.groupBy("user_id").agg(F.min("event_id").alias("event_id"))
    twice = once.groupBy("user_id").agg(F.min("event_id").alias("event_id"))
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    # survivor really is the minimum id of its key group
    mins = {r.user_id: r.event_id for r in once.collect()}
    for i, (uid, _, _) in enumerate(rows):
        assert mins[uid] <= i


@given(
    words=st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=4), min_size=0, max_size=12
    )
)
@settings(**_SETTINGS)
def test_word_shingles_are_trigrams_and_guarded(spark, words):
    from weather_stream_processor_spark.functions import tokens, word_shingles

    text = " ".join(words)
    df = spark.createDataFrame([(text,)], "text string")
    [row] = df.select(
        word_shingles(tokens(F.col("text")), 3).alias("sh")
    ).collect()
    toks = text.split(" ")  # split semantics: "" -> [""]
    if len(toks) < 3:
        assert row.sh == []
    else:
        assert len(row.sh) == len(set(row.sh))  # distinct
        assert set(row.sh) <= {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
        for sh in row.sh:
            assert len(sh.split(" ")) == 3


_ntile_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # value: few levels -> heavy ties
        st.integers(min_value=0, max_value=10_000),  # unique-ish id source
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[1],  # ids unique -> strict total order
)


@given(rows=_ntile_rows, n=st.integers(min_value=1, max_value=7))
@settings(**_SETTINGS)
def test_exact_global_ntiles_matches_spark_ntile(spark, rows, n):
    """exact_global_ntiles must agree with Spark's own NTILE bit-for-bit
    on arbitrary data: heavy value ties (cutoff-straddling buckets),
    n > N, N % n != 0, single-row, and constant-column inputs are all in
    the strategy's range. The helper's whole reason to exist is replacing
    the single-reducer window WITHOUT changing one output row."""
    from pyspark.sql.window import Window

    from weather_stream_processor_spark.operators.windows import exact_global_ntiles

    df = spark.createDataFrame(
        [(int(v), int(i)) for v, i in rows], "v long, id long"
    )
    expected = {
        (r.id, r.t)
        for r in df.select(
            "id", F.ntile(n).over(Window.orderBy("v", "id")).alias("t")
        ).collect()
    }
    # coarse=4 forces multi-bucket paths even on tiny inputs
    got = {
        (r.id, r.t)
        for r in exact_global_ntiles(df, [(n, ["v", "id"], "t")], coarse=4)
        .select("id", "t")
        .collect()
    }
    assert got == expected


@given(rows=_ntile_rows)
@settings(**_SETTINGS)
def test_exact_global_ranks_matches_spark_row_number(spark, rows):
    """The n=None path: exact_global_ranks must equal an unpartitioned
    ROW_NUMBER over the same strict total order."""
    from pyspark.sql.window import Window

    from weather_stream_processor_spark.operators.windows import exact_global_ranks

    df = spark.createDataFrame(
        [(int(v), int(i)) for v, i in rows], "v long, id long"
    )
    expected = {
        (r.id, r.rn)
        for r in df.select(
            "id", F.row_number().over(Window.orderBy("v", "id")).alias("rn")
        ).collect()
    }
    got = {
        (r.id, r.rn)
        for r in exact_global_ranks(df, [(["v", "id"], "rn")], coarse=4)
        .select("id", "rn")
        .collect()
    }
    assert got == expected


_edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=24),
        st.integers(min_value=0, max_value=24),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


@given(edges=_edge_lists)
@settings(max_examples=5, deadline=None)
def test_cc_two_phase_equals_propagation_on_random_graphs(spark, edges):
    """Both connected-component algorithms must induce the identical
    min-label clustering on arbitrary graphs (chains, stars, cliques,
    disconnected pieces — whatever hypothesis draws)."""
    from weather_stream_processor_spark.operators.dedup import (
        _cc_label_propagation,
        _cc_two_phase,
    )

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "s long, d long"
    )
    sym = df.union(df.selectExpr("d AS s", "s AS d"))
    lp, _ = _cc_label_propagation(sym)
    tp, _ = _cc_two_phase(sym)
    assert {(r.doc_id, r.comp) for r in lp.collect()} == {
        (r.doc_id, r.comp) for r in tp.collect()
    }


def test_cc_iteration_cap_guard_fires_on_deep_chains(spark):
    """r4 verdict task 4: a too-shallow round cap must REFUSE to emit an
    un-converged connected-components result, not silently truncate. A
    path graph 0-1-2-...-N has diameter N: with max_rounds below the
    propagation depth, both CC variants must raise IterationCapExceeded;
    with an adequate cap the same input converges and no guard fires."""
    import pytest

    from weather_stream_processor_spark.operators.dedup import (
        _cc_label_propagation,
        _cc_two_phase,
    )
    from weather_stream_processor_spark.plans.convergence import (
        IterationCapExceeded,
    )

    n = 30  # chain depth 30 >> cap 3
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "s long, d long"
    )
    sym = df.union(df.selectExpr("d AS s", "s AS d"))
    with pytest.raises(IterationCapExceeded):
        _cc_label_propagation(sym, max_rounds=3)
    with pytest.raises(IterationCapExceeded):
        _cc_two_phase(sym, max_rounds=1)
    # adequate caps: the identical input converges — guard must NOT fire,
    # and the labels are the single component rooted at node 0
    lp, _ = _cc_label_propagation(sym)
    assert {r.comp for r in lp.collect()} == {0}


def test_bfs_kcore_cap_guard_warns_not_raises(spark, monkeypatch):
    """The k-core/BFS caps are semantic ("within N rounds" — the oracle
    unrolls the SAME rounds), so exhausting them warns instead of raising:
    the truncated result still matches the declared semantics. A cap that
    genuinely under-iterates the fixture graph must emit the
    RuntimeWarning; the default caps must stay silent. (Post peek-fix, a
    cap equal to the graph's productive-round count converges cleanly —
    the confirmation peek detects the fixpoint — so the under-iteration
    caps here sit strictly BELOW the fixture's productive rounds: BFS
    needs >=2 productive relaxations, the k-core cascade only 1, hence
    cap 0 for k-core.)"""
    import warnings

    import pytest

    from weather_stream_processor_spark.operators import analytics

    sf_dir = "/root/testdata/sf0.001"
    monkeypatch.setattr(analytics, "_BFS_ROUNDS", 1)
    with pytest.warns(RuntimeWarning, match="bfs_shortest_paths"):
        analytics.bfs_shortest_paths(spark, sf_dir).collect()
    monkeypatch.setattr(analytics, "_BFS_ROUNDS", 6)
    monkeypatch.setattr(analytics, "_KCORE_ROUNDS", 0)
    with pytest.warns(RuntimeWarning, match="kcore_decomposition"):
        analytics.kcore_decomposition(spark, sf_dir).collect()
    monkeypatch.setattr(analytics, "_KCORE_ROUNDS", 8)
    # cap == productive rounds: the peek confirms the fixpoint, no warning
    # (this exact case spuriously warned before the peek-then-commit fix)
    monkeypatch.setattr(analytics, "_KCORE_ROUNDS", 1)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        analytics.kcore_decomposition(spark, sf_dir).collect()
    monkeypatch.setattr(analytics, "_KCORE_ROUNDS", 8)
    # default caps: fixture converges inside them -> no warning at all
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        analytics.bfs_shortest_paths(spark, sf_dir).collect()


@given(
    stream=st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=400),
    capacity=st.integers(min_value=4, max_value=32),
)
@settings(max_examples=50, deadline=None)
def test_misra_gries_superset_guarantee(stream, capacity):
    """heavy_hitters_exact's phase 1 is sound only if batched Misra-Gries
    compaction preserves: estimate >= true_count - sum(decrements), and
    sum(decrements) <= n/(capacity+1). Then every token with true share
    >= s survives the emission cutoff s*n - under — hypothesis drives
    adversarial streams through forced tiny capacities (the parquet
    fixtures never overflow the real capacity, so this is the only gate
    exercising compaction)."""
    from collections import Counter

    from weather_stream_processor_spark.operators.aggregates import _mg_compact

    counts: Counter = Counter()
    under = 0
    # feed in chunks to force repeated compactions mid-stream
    for i in range(0, len(stream), 16):
        counts.update(stream[i : i + 16])
        under += _mg_compact(counts, capacity)
    assert len(counts) <= capacity
    n = len(stream)
    assert under <= n // (capacity + 1)
    true = Counter(stream)
    for tok, c in true.items():
        est = counts.get(tok, 0)
        assert est >= c - under, (tok, c, est, under)


def test_doc_counts_match_registry():
    """README.md and OPERATORS.md carry operator counts that have drifted
    from the registry in two consecutive rounds; this pins them. On
    failure, run `python tools/gen_operators_md.py` — it regenerates
    OPERATORS.md and patches the README sentence from the live registry."""
    from pathlib import Path

    from weather_stream_processor_spark.registry import all_queries

    specs = all_queries()
    n = len(specs)
    n_oracle = sum(1 for s in specs.values() if s.oracle)
    repo = Path(__file__).resolve().parent.parent
    readme = (repo / "README.md").read_text(encoding="utf-8")
    operators = (repo / "OPERATORS.md").read_text(encoding="utf-8")
    assert f"**{n} registered operators**" in readme, (
        f"README.md coverage count is stale (registry has {n}); "
        "run python tools/gen_operators_md.py"
    )
    assert f"{n_oracle} of them hash-checked" in readme
    assert f"the remaining {n - n_oracle} (sketch-valued" in readme
    assert f"**{n} operators**, {n_oracle} oracle-checked" in operators, (
        "OPERATORS.md is stale; run python tools/gen_operators_md.py"
    )


_corpora = st.lists(
    st.lists(
        st.sampled_from("abcde"),  # tiny alphabet -> heavy shingle overlap
        min_size=0,
        max_size=12,
    ),
    min_size=0,
    max_size=8,
)


@given(docs=_corpora)
@settings(**_SETTINGS)
def test_containment_pairs_match_brute_force(spark, docs):
    """Containment over ARBITRARY corpora equals the set-arithmetic
    definition: |A∩B| / |smaller shingle set|, pairs with fewer than one
    shingle on either side absent, direction and tie-breaks deterministic.
    Exercises what the fixture can't: shingle-less docs (<3 tokens),
    identical docs, and total containment (subset) cases."""
    from weather_stream_processor_spark.operators.dedup import (
        CONTAINMENT_THRESHOLD,
        _containment_pairs,
    )

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r.doc_inner, r.doc_outer): r.containment
        for r in _containment_pairs(df).collect()
    }

    def shingles(toks):
        return {tuple(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sh = {i: shingles(t) for i, t in enumerate(docs) if len(t) >= 3}
    expected = {}
    for a in sh:
        for b in sh:
            if a >= b or not (sh[a] & sh[b]):
                continue
            na, nb = len(sh[a]), len(sh[b])
            inner, outer = (a, b) if (na, a) <= (nb, b) else (b, a)
            c = len(sh[a] & sh[b]) / min(na, nb)
            if c >= CONTAINMENT_THRESHOLD:
                expected[(inner, outer)] = round(c, 6)

    assert set(got) == set(expected)
    for k in got:
        assert math.isclose(got[k], expected[k], abs_tol=1e-6), k


@given(docs=_corpora)
@settings(**_SETTINGS)
def test_novelty_scores_match_brute_force(spark, docs):
    """Novelty over ARBITRARY corpora: for every doc with at least one
    shingle, the fraction of its distinct shingles whose corpus-wide
    first occurrence (min doc_id) is that doc."""
    from weather_stream_processor_spark.operators.dedup import _novelty_scores

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_shingles, r.novel_fraction)
        for r in _novelty_scores(df).collect()
    }

    def shingles(toks):
        return {tuple(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sh = {i: shingles(t) for i, t in enumerate(docs) if len(t) >= 3}
    first = {}
    for i in sorted(sh):
        for s in sh[i]:
            first.setdefault(s, i)
    expected = {
        i: (len(sh[i]), round(sum(1 for s in sh[i] if first[s] == i) / len(sh[i]), 6))
        for i in sh
    }

    assert set(got) == set(expected)
    for i in got:
        assert got[i][0] == expected[i][0]
        assert math.isclose(got[i][1], expected[i][1], abs_tol=1e-6), i


_lpa_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=14),
        st.integers(min_value=0, max_value=14),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=30,
)


@given(edges=_lpa_edges)
@settings(max_examples=5, deadline=None)
def test_lpa_matches_python_reference(spark, edges):
    """Synchronous 3-round label propagation on ARBITRARY symmetrized
    graphs must equal a pure-Python reference: every node starts labeled
    with itself; each round adopts the plurality in-neighbor label with a
    min-label tie-break, counting edge multiplicity."""
    from weather_stream_processor_spark.operators.analytics import _lpa_rounds

    iters = 3
    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in edges], "src string, dst string"
    )
    sym = df.union(df.selectExpr("dst AS src", "src AS dst"))
    got = {(r.brand, r.community) for r in _lpa_rounds(sym, iters).collect()}

    sym_edges = [(str(a), str(b)) for a, b in edges] + [
        (str(b), str(a)) for a, b in edges
    ]
    labels = {v: v for v, _ in sym_edges}
    from collections import Counter

    for _ in range(iters):
        votes: dict[str, Counter] = {}
        for u, v in sym_edges:
            votes.setdefault(v, Counter())[labels[u]] += 1
        labels = {
            v: min(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            for v, c in votes.items()
        }
    assert got == set(labels.items())


_cusum_series = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),  # event_type index
        st.integers(min_value=0, max_value=30),  # day offset
        st.integers(min_value=-1_000_000, max_value=1_000_000),  # value*1e5
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda r: (r[0], r[1]),  # one event per (type, day)
)


@given(rows=_cusum_series)
@settings(max_examples=5, deadline=None)
def test_cusum_exact_on_arbitrary_series(spark, rows):
    """The exact-integer CUSUM formulation must reproduce a pure-Python
    integer reference bit for bit on arbitrary series — the property the
    quantized design buys (a float formulation drifts t*1e-5 by day t)."""
    from weather_stream_processor_spark.operators.timeseries import (
        _CUSUM_SIGMA,
        cusum_from_events,
    )

    base = datetime(2024, 3, 1)
    types = ("alpha", "beta")
    ev = spark.createDataFrame(
        [
            (types[t], base + timedelta(days=d, hours=7), k / 100000)
            for t, d, k in rows
        ],
        "event_type string, ts timestamp, value double",
    )
    got = {
        (r.event_type, r.day.day): (r.cusum, r.is_shift)
        for r in cusum_from_events(ev).collect()
    }

    expected = {}
    for tname in types:
        series = sorted((d, k) for t, d, k in rows if types[t] == tname)
        if not series:
            continue
        xs = [k for _, k in series]
        n, s1, s2 = len(xs), sum(xs), sum(x * x for x in xs)
        mu_i = s1 // n  # floor(s1/n), exact on ints
        sigma = (
            math.sqrt((n * s2 - s1 * s1) / (n * (n - 1))) if n > 1 else None
        )
        c = 0
        for t_idx, (d, k) in enumerate(series, start=1):
            c += k
            dev = c - t_idx * mu_i
            shift = bool(sigma is not None and abs(dev) > _CUSUM_SIGMA * sigma)
            day = (base + timedelta(days=d)).day
            expected[(tname, day)] = (round(dev / 100000, 5), shift)

    assert set(got) == set(expected)
    for key in got:
        assert math.isclose(got[key][0], expected[key][0], abs_tol=1e-9), key
        assert got[key][1] == expected[key][1], key


_rake_corpora = st.lists(
    st.lists(
        st.sampled_from(
            ["the", "a", "of", "and", "to", "in", "alpha", "beta", "gamma",
             "delta", "epsilon", "zeta"]
        ),
        min_size=1,
        max_size=25,
    ),
    min_size=1,
    max_size=8,
)


@given(docs=_rake_corpora)
@settings(max_examples=5, deadline=None)
def test_rake_matches_python_reference(spark, docs):
    """RAKE over ARBITRARY corpora (stopwords interleaved with a small
    content vocabulary) must equal a pure-Python reference: island
    segmentation on stopword boundaries, corpus-level deg/freq word
    scores, phrase score = sum of word scores, identical-text phrases
    merged with occurrence counts."""
    from collections import Counter

    from weather_stream_processor_spark.operators.text import (
        STOPWORDS,
        rake_from_docs,
    )

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r.phrase, r.rake_score, r.n_occurrences)
        for r in rake_from_docs(df, topk=1_000_000).collect()
    }

    stop = set(STOPWORDS)
    phrases = []  # list of tuples of words
    for toks in docs:
        run = []
        for t in toks:
            if t in stop:
                if run:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(t)
        if run:
            phrases.append(tuple(run))
    freq, deg = Counter(), Counter()
    for ph in phrases:
        for w_ in ph:
            freq[w_] += 1
            deg[w_] += len(ph)
    scored = Counter()
    for ph in phrases:
        score = round(sum(deg[w_] / freq[w_] for w_ in ph), 6)
        scored[(" ".join(ph), score)] += 1
    expected = {(p, s, n) for (p, s), n in scored.items()}

    assert {(p, n) for p, s, n in got} == {(p, n) for p, s, n in expected}
    exp_scores = {p: s for p, s, n in expected}
    for p, s, n in got:
        assert math.isclose(s, exp_scores[p], abs_tol=1e-6), p


_fh_corpora = st.lists(
    st.lists(
        st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz0123456789",
            min_size=1,
            max_size=24,
        ),
        min_size=1,
        max_size=15,
    ),
    min_size=1,
    max_size=6,
)


@given(docs=_fh_corpora)
@settings(max_examples=5, deadline=None)
def test_portable_hash_and_feature_hashing_match_python(spark, docs):
    """The portable 62-bit token hash (char polynomial, bases 31/37 with
    16-cycled exponents mod 2^31-1) and the signed feature-hashing rollup
    built on it must match a pure-Python reference on arbitrary ASCII
    corpora — the property that makes the sketch family cross-engine
    checkable."""
    from collections import defaultdict

    from weather_stream_processor_spark.operators.dedup import (
        _FH_DIM,
        _SH_MOD,
        _SH_POW_CYCLE,
        _vocab_hash,
    )

    def pyhash(tok: str) -> int:
        h1 = sum(
            ord(c) * pow(31, k % _SH_POW_CYCLE, _SH_MOD)
            for k, c in enumerate(tok)
        ) % _SH_MOD
        h2 = sum(
            ord(c) * pow(37, k % _SH_POW_CYCLE, _SH_MOD)
            for k, c in enumerate(tok)
        ) % _SH_MOD
        return h1 + h2 * 2_147_483_648

    toks_df = spark.createDataFrame(
        [(i, t) for i, d in enumerate(docs) for t in d],
        "doc_id long, tok string",
    )
    got_hash = {r.tok: r.h for r in _vocab_hash(toks_df).collect()}
    vocab = {t for d in docs for t in d}
    assert got_hash == {t: pyhash(t) for t in vocab}

    cells = defaultdict(lambda: [0, 0])
    for i, d in enumerate(docs):
        for t in d:
            h = pyhash(t)
            sign = 1 if (h >> 61) & 1 else -1
            cell = cells[(i, h % _FH_DIM)]
            cell[0] += sign
            cell[1] += 1
    expected = {
        (doc, feat, w, n) for (doc, feat), (w, n) in cells.items()
    }

    sdf = toks_df.sparkSession.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id long, text string",
    )
    from pyspark.sql import functions as SF

    th = (
        sdf.select("doc_id", SF.explode(SF.split("text", " ")).alias("tok"))
        .join(_vocab_hash(
            sdf.select("doc_id", SF.explode(SF.split("text", " ")).alias("tok"))
        ), "tok", "left")
        .select("doc_id", SF.coalesce("h", SF.lit(0)).alias("h"))
    )
    sign = SF.when(
        SF.shiftright("h", 61).bitwiseAND(SF.lit(1)) == 1, SF.lit(1)
    ).otherwise(SF.lit(-1))
    got = {
        (r.doc_id, r.feature, r.weight, r.n_tokens)
        for r in th.groupBy("doc_id", (SF.col("h") % _FH_DIM).alias("feature"))
        .agg(SF.sum(sign).alias("weight"), SF.count(SF.lit(1)).alias("n_tokens"))
        .collect()
    }
    assert got == expected


_twap_series = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user
        st.integers(min_value=0, max_value=86_399),  # second offset in day
        st.integers(min_value=-10_000_000, max_value=10_000_000),  # value*1e5
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda r: (r[0], r[1]),
)


@given(rows=_twap_series)
@settings(max_examples=5, deadline=None)
def test_twap_exact_on_arbitrary_series(spark, rows):
    """Daily TWAP must match a pure-Python exact-integer reference on
    arbitrary single-day series: segment durations to the next event
    (last until day end) in integer milliseconds, 1e-5-quantized values,
    one final division."""
    from weather_stream_processor_spark.operators.timeseries import (
        twap_from_events,
    )

    base = datetime(2024, 5, 3)
    ev = spark.createDataFrame(
        [
            (u, i, base + timedelta(seconds=sec), k / 100000)
            for i, (u, sec, k) in enumerate(rows)
        ],
        "user_id long, event_id long, ts timestamp, value double",
    )
    got = {
        (r.user_id, r.n_events): r.twap
        for r in twap_from_events(ev).collect()
    }

    expected = {}
    day_end_ms = 86_400_000
    for u in {r[0] for r in rows}:
        series = sorted(
            (sec, k) for uu, sec, k in rows if uu == u
        )
        num = den = 0
        for j, (sec, k) in enumerate(series):
            start_ms = sec * 1000
            end_ms = (
                series[j + 1][0] * 1000 if j + 1 < len(series) else day_end_ms
            )
            dur = end_ms - start_ms
            num += k * dur
            den += dur
        expected[(u, len(series))] = round(num / den / 100000, 5)

    assert set(got) == set(expected)
    for key in got:
        assert math.isclose(got[key], expected[key], abs_tol=1e-9), key


_journeys = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.integers(min_value=0, max_value=20 * 86_400),  # second offset
        st.sampled_from(["view", "click", "signup", "purchase"]),
        st.integers(min_value=0, max_value=1_000_000),  # value*1e5
    ),
    min_size=1,
    max_size=30,
)


@given(rows=_journeys)
@settings(max_examples=5, deadline=None)
def test_last_touch_attribution_matches_python(spark, rows):
    """Last-touch attribution on ARBITRARY journeys: every purchase
    credits the user's most recent preceding non-purchase event within 7
    days (ties broken by event_id), else 'direct'; channel sums are exact
    1e-5 units."""
    from weather_stream_processor_spark.operators.analytics import (
        attribution_from_events,
    )

    base = datetime(2024, 7, 1)
    ev = spark.createDataFrame(
        [
            (u, i, base + timedelta(seconds=sec), t, k / 100000)
            for i, (u, sec, t, k) in enumerate(rows)
        ],
        "user_id long, event_id long, ts timestamp, event_type string, value double",
    )
    got = {
        (r.channel, r.n_purchases, round(r.attributed_value, 5))
        for r in attribution_from_events(ev).collect()
    }

    from collections import defaultdict

    chan = defaultdict(lambda: [0, 0])
    by_user = defaultdict(list)
    for i, (u, sec, t, k) in enumerate(rows):
        by_user[u].append((sec, i, t, k))
    for u, evs in by_user.items():
        evs.sort()
        last_touch = None  # (sec, type)
        for sec, i, t, k in evs:
            if t == "purchase":
                if last_touch is not None and last_touch[0] >= sec - 7 * 86_400:
                    c = last_touch[1]
                else:
                    c = "direct"
                cell = chan[c]
                cell[0] += 1
                cell[1] += k
            else:
                last_touch = (sec, t)
    expected = {
        (c, n, round(v / 100000, 5)) for c, (n, v) in chan.items()
    }
    assert got == expected


_weighted_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # group
        st.integers(min_value=1, max_value=500),  # price cents
        st.integers(min_value=1, max_value=9),  # weight
    ),
    min_size=1,
    max_size=30,
)


@given(rows=_weighted_rows)
@settings(max_examples=5, deadline=None)
def test_weighted_median_crossing_matches_python(spark, rows):
    """The cumulative-weight crossing must pick the FIRST value whose
    doubled cumulative weight reaches the total, per group, on arbitrary
    integer-weighted multisets — the interpolation-free weighted median
    both engines agree on exactly."""
    from pyspark.sql import functions as SF
    from pyspark.sql.window import Window

    df = spark.createDataFrame(rows, "g long, v long, w long")
    grain = df.groupBy("g", "v").agg(SF.sum("w").alias("w"))
    cum_w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = grain.select(
        "g",
        "v",
        SF.sum("w").over(cum_w).alias("cum"),
        SF.sum("w").over(Window.partitionBy("g")).alias("total"),
    )
    got = {
        (r.g, r.med)
        for r in c.filter(SF.col("cum") * 2 >= SF.col("total"))
        .groupBy("g")
        .agg(SF.min("v").alias("med"))
        .collect()
    }

    from collections import defaultdict

    groups = defaultdict(list)
    for g, v, w in rows:
        groups[g].append((v, w))
    expected = set()
    for g, vw in groups.items():
        vw.sort()
        total = sum(w for _, w in vw)
        cum = 0
        for v, w in vw:
            cum += w
            if cum * 2 >= total:
                expected.add((g, v))
                break
    assert got == expected


_docs_tokens = st.lists(
    st.lists(
        # tokens drawn from a small alphabet so k-gram hash COLLISIONS and
        # repeated shingles actually occur (the tie-break path is the part
        # a fixture of distinct word-soup never exercises)
        st.sampled_from(["a", "bb", "c", "dd", "e", "a", "bb"]),
        min_size=0,
        max_size=30,
    ),
    min_size=1,
    max_size=12,
)


@given(docs=_docs_tokens)
@settings(**_SETTINGS)
def test_winnowing_core_matches_reference_on_arbitrary_docs(spark, docs):
    """The distributed winnowing selection equals the direct Python
    implementation of the Schleimer et al. rule (rightmost-min per
    window, dedupe) on hypothesis-drawn documents — including repeated
    tokens, hash ties, and docs shorter than k."""
    from weather_stream_processor_spark.functions import tokens as _  # noqa: F401
    from weather_stream_processor_spark.operators.text import (
        _WINNOW_P,
        WINNOW_K,
        WINNOW_W,
        winnowing_select,
    )

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_kgrams, r.n_selected, r.fp_checksum)
        for r in winnowing_select(df).collect()
    }

    for doc_id, toks in enumerate(docs):
        # NOTE: split(" ") of a joined empty list yields [""], matching
        # the builder's behavior on empty text
        toks = " ".join(toks).split(" ")
        codes = [(ord(t[0]) if t else 0) * 31 + len(t) for t in toks]
        hs = [
            (codes[i] * 1000003 + codes[i + 1] * 101 + codes[i + 2]) % _WINNOW_P
            for i in range(len(codes) - WINNOW_K + 1)
        ]
        if not hs:
            assert doc_id not in got
            continue
        n_win = max(len(hs) - WINNOW_W + 1, 1)
        selected = set()
        for s in range(n_win):
            window = hs[s : s + WINNOW_W]
            m = min(window)
            pos = s + max(i for i, h in enumerate(window) if h == m)
            selected.add((pos, hs[pos]))
        checksum = sum(h for _, h in selected) % _WINNOW_P
        assert got[doc_id] == (len(hs), len(selected), checksum), doc_id


@given(rows=_ntile_rows)
@settings(**_SETTINGS)
def test_exact_global_ranks_multi_spec_matches_row_number(spark, rows):
    """exact_global_ranks (the n=None branch of the ntiles machinery,
    round-8's replacement for fagin's three unpartitioned rankings) must
    agree with ROW_NUMBER bit-for-bit on arbitrary data — including the
    DESC-as-ASC-over-negated-key composition the fagin rewrite relies
    on, and several specs resolved in ONE machinery call (shared
    cutoff/count jobs must not cross-contaminate the specs)."""
    from pyspark.sql.window import Window

    from weather_stream_processor_spark.operators.windows import (
        exact_global_ranks,
    )

    df = spark.createDataFrame(
        [(int(v), int(i)) for v, i in rows], "v long, id long"
    ).select("v", "id", (-F.col("v")).alias("nv"))
    expected = {
        (r.id, r.asc_rank, r.desc_rank)
        for r in df.select(
            "id",
            F.row_number().over(Window.orderBy("v", "id")).alias("asc_rank"),
            F.row_number()
            .over(Window.orderBy(F.desc("v"), F.asc("id")))
            .alias("desc_rank"),
        ).collect()
    }
    got = {
        (r.id, r.asc_rank, r.desc_rank)
        for r in exact_global_ranks(
            df,
            [(["v", "id"], "asc_rank"), (["nv", "id"], "desc_rank")],
            coarse=4,
        )
        .select("id", "asc_rank", "desc_rank")
        .collect()
    }
    assert got == expected


_prefix_rows = st.lists(
    st.tuples(
        st.sampled_from([None, "a", "b"]),  # partition key, NULLs first-class
        st.integers(min_value=0, max_value=200),  # order key (uniq per part)
        st.integers(min_value=-50, max_value=50),  # value, signs mixed
    ),
    min_size=1,
    max_size=50,
    unique_by=lambda t: (t[0], t[1]),  # strict total order within part
)


@given(rows=_prefix_rows, span=st.sampled_from([1, 2, 4, 16]))
@settings(**_SETTINGS)
def test_two_phase_prefix_property_matches_window(spark, rows, span):
    """two_phase_exclusive_prefix == the unpartitioned-window form on
    arbitrary data: NULL partition keys, arbitrary bucket gaps/fill
    (span down to 1 forces every level's residual window to do real
    work), negative values, single-row groups — hypothesis drives the
    shapes the fixture never reaches."""
    from pyspark.sql.window import Window

    from weather_stream_processor_spark.plans.prefix_sum import (
        two_phase_exclusive_prefix,
    )

    df = spark.createDataFrame(
        [(g, int(k), int(v)) for g, k, v in rows],
        "grp string, k long, v long",
    ).withColumn("_pb", F.expr(f"k div {span}"))
    w = (
        Window.partitionBy("grp")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    expected = {
        (r.grp, r.k, r.out)
        for r in df.select(
            "grp", "k", F.coalesce(F.sum("v").over(w), F.lit(0)).alias("out")
        ).collect()
    }
    got = {
        (r.grp, r.k, r.out)
        for r in two_phase_exclusive_prefix(
            df, ["grp"], "_pb", ["k"], F.col("v"), "out", span=span
        )
        .select("grp", "k", "out")
        .collect()
    }
    assert got == expected
