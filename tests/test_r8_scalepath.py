"""Round-8 scale-path + edge-contract hardening (r7 verdict task 2, r8 advice).

Pins for this round's changes:
- peak_concurrent_sessions: the last corpus-growing unpartitioned window
  (the sweep-line running sum over 2x|sessions| marks) is now a segmented
  scan through the shared two_phase_exclusive_prefix (bucket = epoch_day).
  Bit-equality vs the naive sweep it replaced, at both fixture scales,
  plus a plan pin proving the marks-scale unpartitioned window is gone.
- two_phase_exclusive_prefix NULL-key contract: the offset re-attach joins
  are null-safe, so NULL partition/bucket keys are KEPT (the naive window
  form keeps them; plain name-list joins silently dropped them — the r8
  advice's medium finding).
- curriculum_interleave_order edge contract: difficulty is COALESCEd to a
  -1 sentinel in BOTH engines, making the ordering total and
  engine-agreed on NULL n_chars/text rows (constructed-corpus test vs the
  DuckDB oracle — fixtures have no NULLs, so only this test reaches it).
- CDC explode twin on non-ASCII text: Spark 4 ascii() returns full
  codepoints (BMP and supplementary), matching both DuckDB ascii() and
  the registered gear pass's utf-32 view — proven on a constructed
  corpus, closing the twin's ASCII-only gap (r8 advice, low).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from tests.conftest import SF_ORACLE as SF_DIR
from tests.conftest import SF_SMOKE
from weather_stream_processor_spark.plans.prefix_sum import (
    two_phase_exclusive_prefix,
)
from weather_stream_processor_spark.registry import all_queries


def _rows(df, key_cols):
    return sorted(
        tuple(r) for r in df.select(*key_cols).collect()
    )


def _naive_peak_sweep(spark, sf_dir):
    """The r2-era registered form: one unpartitioned cumulative window."""
    from weather_stream_processor_spark.operators.windows import (
        batch_sessionization,
    )

    base = batch_sessionization(spark, sf_dir)
    starts = base.select(
        F.col("session_start").alias("at"),
        F.lit(1).alias("delta"),
        F.lit(0).alias("kind"),
        "user_id",
        "session_id",
    )
    ends = base.select(
        F.col("session_end").alias("at"),
        F.lit(-1).alias("delta"),
        F.lit(-1).alias("kind"),
        "user_id",
        "session_id",
    )
    marks = starts.unionAll(ends)
    w = Window.orderBy("at", "kind", "user_id", "session_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sweep = marks.select("at", F.sum("delta").over(w).alias("concurrency"))
    return sweep.groupBy(F.date_trunc("day", "at").alias("day")).agg(
        F.max("concurrency").alias("peak_concurrency")
    )


def test_peak_concurrency_two_phase_equals_naive_sweep(spark):
    builder = all_queries()["peak_concurrent_sessions"].builder
    cols = ["day", "peak_concurrency"]
    for sf in (SF_SMOKE, SF_DIR):
        assert _rows(builder(spark, sf), cols) == _rows(
            _naive_peak_sweep(spark, sf), cols
        ), sf


def test_peak_concurrency_plan_has_no_marks_scale_window(spark):
    """The naive form's signature is a cumulative window whose FIRST
    windowspecdefinition element is the order key `at` (no partition
    columns). The registered plan must instead carry the day-bucketed
    residual window (_db, at) — groups are single days of marks — and
    its only unpartitioned window runs over day-super-buckets (_sb)."""
    import re

    df = all_queries()["peak_concurrent_sessions"].builder(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not re.search(
        r"windowspecdefinition\(at#\d+", plan
    ), "marks-scale unpartitioned sweep window is back"
    assert re.search(
        r"windowspecdefinition\(_db#\d+L?, at#\d+", plan
    ), "day-bucketed residual window missing"


def test_two_phase_prefix_keeps_null_keys(spark):
    """NULL partition AND bucket keys must survive (null-safe offset
    joins) and reproduce the naive window form bit-for-bit — windows
    treat NULL as an ordinary group/order value, so the helper must too."""
    # contract note: a NULL bucket sorts FIRST under Spark's window
    # ordering, so NULL-bucket rows must carry the partition's smallest
    # order keys (true at the real call site: curriculum's bucket was
    # difficulty div span with difficulty itself the order key — NULL
    # bucket iff NULL order key, and both sort first).
    rows = [
        (None, None, 1, 10),
        (None, None, 2, 20),
        (None, 5, 5, 1),  # NULL part, real bucket after the NULL bucket
        ("a", None, None, 7),  # real part, NULL bucket + NULL order key
        ("a", 0, 0, 1),
        ("a", 0, 1, 2),
        ("a", 4, 4, 100),
        ("b", 0, 2, 50),
    ]
    df = spark.createDataFrame(
        rows, "grp string, _pb bigint, k bigint, v bigint"
    )
    got = two_phase_exclusive_prefix(
        df, ["grp"], "_pb", ["k"], F.col("v"), "out", span=4
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    naive = df.select(
        "grp", "k", F.coalesce(F.sum("v").over(w), F.lit(0)).alias("out")
    )
    # NOTE: within-part order here is k alone and the NULL-bucket row's k
    # sorts consistently (bucket NULL groups with Spark's NULLS FIRST in
    # both the helper's bucket offsets and the naive window's order) —
    # this pins SPARK-side self-consistency, the helper's actual contract.
    def _nrows(df):
        key = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
        return sorted(
            (tuple(r) for r in df.select("grp", "k", "out").collect()), key=key
        )

    assert _nrows(got) == _nrows(naive)
    assert got.count() == len(rows), "NULL-keyed rows were dropped"


def test_curriculum_edge_contract_vs_oracle(spark, tmp_path):
    """Constructed corpus with NULL n_chars and NULL text: the -1
    difficulty sentinel makes builder, naive Spark windows, and the
    DuckDB oracle agree row-for-row (fixtures have no NULLs, so only
    this test reaches the edge)."""
    import duckdb
    import pandas as pd

    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": ["aa bb cc", "a much longer doc here", None,
                     "zz", "mid size text", "x y"],
            "lang": ["en"] * 6,
            "source": ["s0", "s1", "s0", "s1", "s0", "s1"],
            "n_chars": pd.array([8, 22, 30, None, 13, 3], dtype="Int64"),
        }
    )
    sf = str(tmp_path)
    duckdb.connect().execute(
        f"COPY (SELECT * FROM rows) TO '{sf}/documents.parquet' (FORMAT PARQUET)"
    )
    spec = all_queries()["curriculum_interleave_order"]
    cols = ["doc_id", "source", "difficulty", "stage_rank", "global_pos"]
    got = _rows(spec.builder(spark, sf), cols)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    oracle = sorted(tuple(row) for row in con.execute(spec.oracle).fetchall())
    assert [tuple(int(v) if not isinstance(v, str) else v for v in r) for r in got] == [
        tuple(int(v) if not isinstance(v, str) else v for v in r) for r in oracle
    ]
    # all six docs present; the two NULL-stat docs carry the -1 sentinel
    # and schedule FIRST within their sources
    by_id = {r[0]: r for r in got}
    assert set(by_id) == {1, 2, 3, 4, 5, 6}
    assert by_id[3][2] == -1 and by_id[4][2] == -1
    assert by_id[3][3] == 1 and by_id[4][3] == 1  # stage_rank 1 in s0/s1


def test_cdc_twin_matches_gear_pass_and_oracle_on_non_ascii(spark, tmp_path):
    """Non-ASCII contract for the CDC forms: Spark 4 ascii() (the explode
    twin) == utf-32 codepoints (the registered gear pass) == DuckDB
    ascii() (the oracle), including BMP accents/CJK and a supplementary-
    plane character."""
    import duckdb
    import pandas as pd

    from weather_stream_processor_spark.operators.dedup import (
        _cdc_explode_form,
    )

    t1 = "héllo wörld — café naïve résumé " * 6
    t2 = "日本語のテキストです。" * 12
    t3 = ("ascii and 𝄞 clef mixed " * 8)  # U+1D11E, supplementary plane
    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [t1, t2, t3, t1],
            "lang": ["en", "ja", "en", "en"],
            "source": ["s0", "s1", "s0", "s1"],
            "n_chars": pd.array(
                [len(t1), len(t2), len(t3), len(t1)], dtype="Int64"
            ),
        }
    )
    sf = str(tmp_path)
    duckdb.connect().execute(
        f"COPY (SELECT * FROM rows) TO '{sf}/documents.parquet' (FORMAT PARQUET)"
    )
    spec = all_queries()["content_defined_chunking"]
    cols = ["doc_id", "n_chunks", "n_chars", "n_dup_chunks", "dup_chars"]
    got = _rows(spec.builder(spark, sf), cols)
    twin = _rows(_cdc_explode_form(spark, sf), cols)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    oracle = sorted(
        tuple(int(v) for v in row) for row in con.execute(spec.oracle).fetchall()
    )
    assert got == twin == oracle
    # the duplicated doc pair (1, 4) must attribute duplicate chunks
    by_id = {r[0]: r for r in got}
    assert by_id[4][3] > 0, "non-ASCII duplicate chunks not detected"


def _naive_pps(spark, sf_dir):
    """The r5-era registered form: one unpartitioned cumulative window
    over every order."""
    from weather_stream_processor_spark.operators.infra_ops import (
        _PPS_TARGET,
    )
    from weather_stream_processor_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    w = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("wt"),
    )
    win = Window.orderBy("o_orderkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = w.select(
        "o_orderkey", "wt", F.sum("wt").over(win).cast("bigint").alias("c")
    )
    tot = w.agg(F.sum("wt").cast("bigint").alias("t"))
    n = _PPS_TARGET
    joined = cum.crossJoin(F.broadcast(tot))
    hi = F.expr(f"(c * {n}) div t")
    lo = F.expr(f"((c - wt) * {n}) div t")
    return joined.filter(hi > lo).select(
        "o_orderkey",
        "wt",
        (hi - lo).cast("bigint").alias("n_hits"),
        F.expr(f"CAST((wt * {n} * 1000000) div t AS BIGINT)").alias("pi_e6"),
    )


def test_pps_two_phase_equals_naive_window(spark):
    builder = all_queries()["pps_systematic_sample"].builder
    cols = ["o_orderkey", "wt", "n_hits", "pi_e6"]
    for sf in (SF_SMOKE, SF_DIR):
        assert _rows(builder(spark, sf), cols) == _rows(
            _naive_pps(spark, sf), cols
        ), sf


def test_pps_plan_has_no_order_scale_window(spark):
    import re

    df = all_queries()["pps_systematic_sample"].builder(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not re.search(
        r"windowspecdefinition\(o_orderkey#\d+", plan
    ), "order-scale unpartitioned cumsum window is back"
    assert re.search(
        r"windowspecdefinition\(_pb#\d+L?, o_orderkey#\d+", plan
    ), "bucket-partitioned residual window missing"


def _naive_quantile_cuts(spark, sf_dir):
    """The pre-r8 registered form: ROW_NUMBER over every (source-
    partitioned / global) document, cut = q at rank ceil(d*n/10)."""
    import pyspark.sql.functions as F  # noqa: F811

    from weather_stream_processor_spark.operators.text import (
        _QNORM_DECILES,
        STOPWORDS,
        tokens,
    )
    from weather_stream_processor_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    feats = docs.select(
        "doc_id",
        "source",
        F.size(toks).cast("bigint").alias("_nt"),
        F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        .cast("bigint")
        .alias("_sn"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("_un"),
    ).select(
        "doc_id",
        "source",
        F.coalesce(
            8 * F.least(F.col("_nt"), F.lit(50))
            + F.expr("(300 * _sn) div _nt")
            + F.expr("(300 * _un) div _nt"),
            F.lit(-1),
        )
        .cast("bigint")
        .alias("q"),
    )
    ds = spark.createDataFrame([(d,) for d in _QNORM_DECILES], "d int")
    sw_src = Window.partitionBy("source").orderBy("q", "doc_id")
    src_ranked = feats.select(
        "source",
        "q",
        F.row_number().over(sw_src).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n"),
    )
    src_cuts = (
        src_ranked.join(
            F.broadcast(ds),
            F.col("rn") == F.ceil(F.col("d") * F.col("n") / 10.0).cast("long"),
        )
        .groupBy("source", "d")
        .agg(F.min("q").alias("source_cut"))
    )
    gw = Window.orderBy("q", "doc_id")
    glob_ranked = feats.select(
        "q",
        F.row_number().over(gw).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    glob_cuts = (
        glob_ranked.join(
            F.broadcast(ds),
            F.col("rn") == F.ceil(F.col("d") * F.col("n") / 10.0).cast("long"),
        )
        .groupBy("d")
        .agg(F.min("q").alias("global_cut"))
    )
    return src_cuts.join(F.broadcast(glob_cuts), "d").select(
        "source",
        F.col("d").cast("bigint").alias("decile"),
        F.col("source_cut").cast("bigint").alias("source_cut"),
        F.col("global_cut").cast("bigint").alias("global_cut"),
        (F.col("source_cut") - F.col("global_cut")).cast("bigint").alias("shift"),
    )


def test_quantile_cuts_histogram_equals_rank_form(spark):
    """cut = min q with cumcount >= rank IS the q at that rank: every row
    of a score tie shares the q the cut reports, so the histogram form
    must match the full ROW_NUMBER form exactly."""
    builder = all_queries()["quality_score_quantile_norm"].builder
    cols = ["source", "decile", "source_cut", "global_cut", "shift"]
    for sf in (SF_SMOKE, SF_DIR):
        assert _rows(builder(spark, sf), cols) == _rows(
            _naive_quantile_cuts(spark, sf), cols
        ), sf


def test_quantile_cuts_plan_windows_are_domain_sized(spark):
    """No window (partitioned or not) may order by doc_id anymore — every
    window in the registered plan runs over the (source,) q-histogram,
    whose cardinality the 0-1000 integer score bounds by construction."""
    import re

    df = all_queries()["quality_score_quantile_norm"].builder(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not re.search(
        r"windowspecdefinition\([^)]*doc_id#\d+", plan
    ), "document-scale ranking window is back"


def _naive_fagin(spark, sf_dir):
    """The r6-era registered form: three unpartitioned ROW_NUMBER windows
    over the per-customer aggregate."""
    from weather_stream_processor_spark.operators.infra_ops import (
        _TA_COUNT_WEIGHT,
        _TA_K,
    )
    from weather_stream_processor_spark.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("s1"),
        F.count(F.lit(1)).cast("bigint").alias("s2"),
    )
    r = c.select(
        "custkey",
        "s1",
        "s2",
        (F.col("s1") + F.col("s2") * _TA_COUNT_WEIGHT).alias("combined"),
        F.row_number()
        .over(Window.orderBy(F.desc("s1"), F.asc("custkey")))
        .alias("pos1"),
        F.row_number()
        .over(Window.orderBy(F.desc("s2"), F.asc("custkey")))
        .alias("pos2"),
    )
    a, b = r.alias("a"), r.alias("b")
    depths = a.join(b, F.col("a.pos1") == F.col("b.pos2")).select(
        F.col("a.pos1").alias("d"),
        (F.col("a.s1") + F.col("b.s2") * _TA_COUNT_WEIGHT).alias("threshold"),
    )
    reach = (
        depths.join(
            r,
            (F.least(F.col("pos1"), F.col("pos2")) <= F.col("d"))
            & (F.col("combined") >= F.col("threshold")),
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_confirmed"))
    )
    stop = reach.filter(F.col("n_confirmed") >= _TA_K).agg(
        F.min("d").cast("bigint").alias("stop_depth")
    )
    topk = r.select(
        "custkey",
        "s1",
        "s2",
        "combined",
        F.row_number()
        .over(Window.orderBy(F.desc("combined"), F.asc("custkey")))
        .alias("rank"),
    ).filter(F.col("rank") <= _TA_K)
    return topk.crossJoin(F.broadcast(stop)).select(
        F.col("rank").cast("bigint").alias("rank"),
        "custkey",
        F.col("s1").alias("spend_cents"),
        F.col("s2").alias("n_orders"),
        "combined",
        "stop_depth",
    )


def test_fagin_global_ranks_equal_naive_windows(spark):
    builder = all_queries()["fagin_ta_topk"].builder
    cols = ["rank", "custkey", "spend_cents", "n_orders", "combined", "stop_depth"]
    for sf in (SF_SMOKE, SF_DIR):
        assert _rows(builder(spark, sf), cols) == _rows(
            _naive_fagin(spark, sf), cols
        ), sf


def test_fagin_plan_has_no_unpartitioned_window(spark):
    from tools.window_audit import unpartitioned_specs

    df = all_queries()["fagin_ta_topk"].builder(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert unpartitioned_specs(plan) == []


def test_quantile_cuts_null_text_edge_vs_oracle(spark, tmp_path):
    """Constructed corpus with a NULL-text doc: the -1 score sentinel
    makes the histogram ordering total and engine-agreed (Spark windows
    sort NULL first, DuckDB last — without the sentinel the cumulative
    counts, and therefore the cuts, would diverge)."""
    import duckdb
    import pandas as pd

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a a a a a a a a",
        None,
        "completely distinct words everywhere in this one",
        "the the the and and and of of of",
        None,
    ]
    rows = pd.DataFrame(
        {
            "doc_id": range(1, 7),
            "text": texts,
            "lang": ["en"] * 6,
            "source": ["s0", "s1", "s0", "s1", "s0", "s1"],
            "n_chars": pd.array(
                [len(t) if t else None for t in texts], dtype="Int64"
            ),
        }
    )
    sf = str(tmp_path)
    duckdb.connect().execute(
        f"COPY (SELECT * FROM rows) TO '{sf}/documents.parquet' (FORMAT PARQUET)"
    )
    spec = all_queries()["quality_score_quantile_norm"]
    cols = ["source", "decile", "source_cut", "global_cut", "shift"]
    got = _rows(spec.builder(spark, sf), cols)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    oracle = sorted(
        tuple(v if isinstance(v, str) else int(v) for v in row)
        for row in con.execute(spec.oracle).fetchall()
    )
    assert [
        tuple(v if isinstance(v, str) else int(v) for v in r) for r in got
    ] == oracle
    # each source has one NULL-text doc out of 3 -> its decile-1..3 cuts
    # (rank ceil(d*3/10) = 1) are the -1 sentinel
    by = {(r[0], r[1]): r[2] for r in got}
    assert by[("s0", 1)] == -1 and by[("s1", 1)] == -1


def test_bitext_margin_mining_rederivation(spark):
    """Pure-numpy rederivation of the margin miner at the smoke fixture:
    lifted dots, top-K neighborhood sums, ratio-margin argmax per source,
    global top-N — every emitted integer must match exactly."""
    import numpy as np

    from weather_stream_processor_spark.operators.similarity import (
        _BITEXT_K,
        _BITEXT_TOPN,
    )
    from weather_stream_processor_spark.sources import load_table

    rows = (
        load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    lift = {
        int(r.vec_id): np.floor(
            np.asarray(r.embedding, dtype="float64") * 10000.0 + 0.5
        ).astype("int64")
        for r in rows
    }
    side = {int(r.vec_id): int(r.label) % 2 for r in rows}
    A = sorted(v for v, s in side.items() if s == 0)
    B = sorted(v for v, s in side.items() if s == 1)
    d = {(x, y): int(lift[x] @ lift[y]) for x in A for y in B}
    a_x = {
        x: sum(
            dv
            for dv, _ in sorted(
                ((d[(x, y)], y) for y in B), key=lambda t: (-t[0], t[1])
            )[:_BITEXT_K]
        )
        for x in A
    }
    b_y = {
        y: sum(
            dv
            for dv, _ in sorted(
                ((d[(x, y)], x) for x in A), key=lambda t: (-t[0], t[1])
            )[:_BITEXT_K]
        )
        for y in B
    }
    best = []
    for x in A:
        cands = [
            (2 * _BITEXT_K * d[(x, y)], a_x[x] + b_y[y], y)
            for y in B
            if d[(x, y)] > 0 and a_x[x] + b_y[y] > 0
        ]
        if not cands:
            continue
        num, den, y = min(cands, key=lambda t: (-(t[0] / t[1]), t[2]))
        best.append((x, y, d[(x, y)], num, den))
    expect = sorted(best, key=lambda t: (-(t[3] / t[4]), t[0]))[:_BITEXT_TOPN]
    got = [
        (r.x_id, r.y_id, r.dot_i, r.margin_num, r.margin_den)
        for r in all_queries()["bitext_margin_mining"]
        .builder(spark, SF_SMOKE)
        .collect()
    ]
    assert sorted(got) == sorted(expect)
