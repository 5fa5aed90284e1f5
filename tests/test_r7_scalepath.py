"""Round-7 scale-path rewrites (r6 verdict tasks 3+4).

The r6 verdict confirmed two registered plans as correct-but-not-100TB:
the packing manifest's per-source cumulative window and the curriculum's
ranking windows funnel every row of a partition through one task's sort.
Both are now two-phase distributed prefix sums (bucketed on dense integer
keys — pure functions of the data, so plan-branch re-evaluation can never
disagree). These tests pin BIT-IDENTICAL equality between the registered
two-phase plans and the naive single-window forms they replaced.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from tests.conftest import SF_ORACLE as SF_DIR
from tests.conftest import SF_SMOKE
from weather_stream_processor_spark.registry import all_queries
from weather_stream_processor_spark.sources import load_table


def _rows(df, key_cols):
    return sorted(tuple(r) for r in df.select(*key_cols).collect())


def _naive_packing_spans(spark, sf_dir):
    from weather_stream_processor_spark.functions.text_features import tokens

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return d.select(
        "source",
        "doc_id",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        .cast("bigint")
        .alias("start_tok"),
    )


def _two_phase_packing_spans(spark, sf_dir):
    from weather_stream_processor_spark.functions.text_features import tokens
    from weather_stream_processor_spark.operators.infra_ops import (
        _PS_SPAN,
        _two_phase_exclusive_prefix,
    )

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
        F.expr(f"doc_id div {_PS_SPAN}").alias("_pb"),
    )
    return _two_phase_exclusive_prefix(
        d, ["source"], "_pb", ["doc_id"], F.col("n_tokens"), "start_tok"
    ).select("source", "doc_id", "start_tok")


def test_two_phase_prefix_equals_window_form(spark):
    for sf in (SF_SMOKE, SF_DIR):
        naive = _rows(
            _naive_packing_spans(spark, sf), ["source", "doc_id", "start_tok"]
        )
        two = _rows(
            _two_phase_packing_spans(spark, sf), ["source", "doc_id", "start_tok"]
        )
        assert naive == two, sf


def test_two_phase_prefix_spans_multiple_buckets(spark):
    """The sf0.01 fixture (500 docs, span 1024) exercises only one bucket
    per source; force a tiny span so bucket AND super-bucket offsets are
    actually crossed, against an independent driver-side prefix sum."""
    from weather_stream_processor_spark.operators.infra_ops import (
        _two_phase_exclusive_prefix,
    )

    rows = [(k % 3, k, k * k % 97 + 1) for k in range(500)]
    df = spark.createDataFrame(rows, ["grp", "k", "v"]).withColumn(
        "_pb", F.expr("k div 4")
    )
    got = {
        (r.grp, r.k): r.out
        for r in _two_phase_exclusive_prefix(
            df, ["grp"], "_pb", ["k"], F.col("v"), "out", span=4
        ).collect()
    }
    seen: dict[int, int] = {0: 0, 1: 0, 2: 0}
    for g, k, v in sorted(rows, key=lambda t: (t[0], t[1])):
        assert got[(g, k)] == seen[g], (g, k)
        seen[g] += v


def test_curriculum_two_phase_equals_naive_windows(spark):
    builder = all_queries()["curriculum_interleave_order"].builder
    for sf in (SF_SMOKE, SF_DIR):
        docs = load_table(spark, sf, "documents")
        d = docs.select(
            "doc_id",
            "source",
            F.expr(
                "CAST((n_chars * 1000) div size(split(text, ' ')) AS BIGINT)"
            ).alias("difficulty"),
        )
        staged = d.withColumn(
            "stage_rank",
            F.row_number()
            .over(Window.partitionBy("source").orderBy("difficulty", "doc_id"))
            .cast("bigint"),
        )
        naive = staged.withColumn(
            "global_pos",
            F.row_number()
            .over(Window.orderBy("stage_rank", "source", "doc_id"))
            .cast("bigint"),
        )
        cols = ["doc_id", "source", "difficulty", "stage_rank", "global_pos"]
        assert _rows(builder(spark, sf), cols) == _rows(naive, cols), sf


def test_packing_plan_has_no_per_source_row_window(spark):
    """The r6-verdict defect: a Window partitioned by source alone, ordered
    by doc_id, pulls every row of a source through one task. The registered
    plan must carry the bucketed residual window (source, _pb) instead."""
    import re

    df = all_queries()["concat_chunk_packing_manifest"].builder(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not re.search(
        r"windowspecdefinition\(source#\d+, doc_id#\d+L? ASC", plan
    ), "per-source row-level cumulative window is back"
    assert re.search(
        r"windowspecdefinition\(source#\d+, _pb#\d+L?, doc_id#\d+L? ASC", plan
    ), "bucketed residual window missing"


def test_curriculum_plan_has_no_global_row_window(spark):
    """global_pos must not be a whole-corpus single-partition row_number:
    the only remaining global window runs over the per-stage_rank count
    table (≤ max stage rows) and the per-stage window groups are bounded
    by the number of sources."""
    import re

    df = all_queries()["curriculum_interleave_order"].builder(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the naive form's signature: a row_number ordered by (stage_rank,
    # source, doc_id) with NO partition columns (the within-stage window
    # keyed BY stage_rank is allowed and expected)
    assert not re.search(
        r"windowspecdefinition\(stage_rank#\d+L ASC", plan
    ), "global row_number window is back"


def test_cdc_gear_pass_equals_explode_form(spark):
    """The registered Arrow gear pass must be bit-identical to the r6
    explode/window twin (whose plan mirrors the DuckDB oracle) — chunk
    counts, lengths, and cross-corpus dup attribution all exact."""
    from weather_stream_processor_spark.operators.dedup import (
        _cdc_explode_form,
    )

    builder = all_queries()["content_defined_chunking"].builder
    cols = ["doc_id", "n_chunks", "n_chars", "n_dup_chunks", "dup_chars"]
    for sf in (SF_SMOKE, SF_DIR):
        assert _rows(builder(spark, sf), cols) == _rows(
            _cdc_explode_form(spark, sf), cols
        ), sf


def test_cdc_gear_pass_plan_has_no_char_explode(spark):
    """The registered plan must shuffle chunks, not characters: no
    Generate/explode node, one Arrow eval over docs. r11: the gear-pass
    output is lineage-cut (it fed two consumers, running the Python stage
    twice), so the Arrow node is asserted on the lazy cdc_gear_fps twin
    and the registered plan is checked for no explode/window AND no
    re-expansion of the Arrow stage (it must run behind the cut, once)."""
    from weather_stream_processor_spark.operators.dedup import cdc_gear_fps
    from weather_stream_processor_spark.plans import operator_names

    lazy = operator_names(cdc_gear_fps(spark, SF_SMOKE))
    assert not any("Generate" in n for n in lazy), lazy
    assert any(
        "ArrowEvalPython" in n or "MapInPandas" in n for n in lazy
    ), lazy

    names = operator_names(
        all_queries()["content_defined_chunking"].builder(spark, SF_SMOKE)
    )
    assert not any("Generate" in n for n in names), names
    assert not any("Window" in n for n in names), names
    assert not any(
        "ArrowEvalPython" in n or "MapInPandas" in n for n in names
    ), names  # gear pass runs ONCE, behind the cut


def test_two_phase_prefix_property_random_sparse_keys(spark):
    """Hypothesis-style adversarial coverage for the helper's contract:
    sparse, gappy, clustered non-negative keys across unbalanced groups
    must all reproduce an independent driver-side prefix sum (correctness
    must not depend on dense keys or even bucket fill)."""
    import random

    from weather_stream_processor_spark.operators.infra_ops import (
        _two_phase_exclusive_prefix,
    )

    rng = random.Random(0xC0FFEE)
    for trial in range(3):
        keys: set[tuple[int, int]] = set()
        while len(keys) < 400:
            g = rng.choice([0, 1, 7])
            # clustered near 0, a hole, then a sparse far band
            k = rng.choice(
                [rng.randrange(50), rng.randrange(10_000, 10_050),
                 rng.randrange(10**9, 10**9 + 10**6)]
            )
            keys.add((g, k))
        rows = [(g, k, rng.randrange(1, 1000)) for g, k in sorted(keys)]
        df = spark.createDataFrame(rows, ["grp", "k", "v"]).withColumn(
            "_pb", F.expr("k div 16")
        )
        got = {
            (r.grp, r.k): r.out
            for r in _two_phase_exclusive_prefix(
                df, ["grp"], "_pb", ["k"], F.col("v"), "out", span=16
            ).collect()
        }
        run: dict[int, int] = {}
        for g, k, v in rows:
            assert got[(g, k)] == run.get(g, 0), (trial, g, k)
            run[g] = run.get(g, 0) + v


def test_cdc_gear_pass_edge_contract_vs_oracle(spark, tmp_path):
    """Fixture rows keep n_chars == length(text); this pins the CONTRACT
    edges the fixtures cannot reach: n_chars shorter than the text
    (truncate), longer (oracle pads with ascii('') = 0), NULL text
    (drops from the output — NULL fp never survives the equi-join), and
    n_chars = 0 — builder, explode twin, and the DuckDB oracle must
    agree on a constructed corpus exercising all four."""
    import duckdb
    import pandas as pd

    from weather_stream_processor_spark.operators.dedup import (
        _cdc_explode_form,
    )

    base = "the quick brown fox jumps over the lazy dog " * 8
    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5, 6, 7],
            "text": [base, base, base[:50], None, "", base[::-1], base],
            "lang": ["en"] * 7,
            "source": ["s0", "s1", "s0", "s1", "s0", "s1", "s0"],
            # doc 7: n_chars IS NULL -> oracle range(1, NULL+1) yields no
            # rows; all three forms must drop it (not crash on int(None))
            "n_chars": pd.array(
                [len(base), 100, 80, 10, 0, len(base), None], dtype="Int64"
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
        tuple(int(v) for v in row)
        for row in con.execute(spec.oracle).fetchall()
    )
    assert got == twin == oracle
    # the NULL-text doc (4) and the empty doc (5) are absent; the
    # truncated/padded docs (2, 3) are present
    present = {r[0] for r in got}
    assert present == {1, 2, 3, 6}
