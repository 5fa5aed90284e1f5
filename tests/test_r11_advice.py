"""Round-11 regression tests for the r10 ADVICE items: each fix is pinned
on a CONSTRUCTED degenerate fixture where the pre-fix code diverged
between the engines (the fixture tables never exercise these paths —
that's exactly why the advice could find them latent)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from tools.oracle_check import compare
from weather_stream_processor_spark.registry import all_queries


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


def _oracle_on(tmp_path, sql, tables=("events",)):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{tmp_path}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def test_bartlett_excludes_zero_variance_group_in_both_engines(
    spark, tmp_path
):
    """r10 ADVICE #1: the oracle's stat CTE formerly read the UNFILTERED
    group-variance table, so a constant-cent group appeared as an oracle
    output row while the Spark plan (filtered to s2 > 0) omitted it.
    Construct exactly that degeneracy: one group with constant value."""
    tv = (
        [("click", 0.11), ("click", 0.27), ("click", 0.93)]
        + [("view", 0.45), ("view", 0.18), ("view", 0.71)]
        + [("frozen", 0.25)] * 4  # constant cents -> s2 == 0
    )
    _write_events(str(tmp_path), tv)
    spec = all_queries()["bartlett_variance_test"]
    spark_pdf = spec.builder(spark, str(tmp_path)).toPandas()
    oracle_pdf = _oracle_on(str(tmp_path), spec.oracle)
    assert compare(spark_pdf, oracle_pdf) == [], "engines diverged"
    grps = set(spark_pdf["grp"])
    assert grps == {"click", "view"}
    assert "frozen" not in set(oracle_pdf["grp"])
    # k counts only the surviving groups
    assert set(spark_pdf["k"]) == {2}


def test_bartlett_singleton_group_excluded(spark, tmp_path):
    tv = [("a", 0.11), ("a", 0.29), ("b", 0.43), ("b", 0.91), ("solo", 0.5)]
    _write_events(str(tmp_path), tv)
    spec = all_queries()["bartlett_variance_test"]
    spark_pdf = spec.builder(spark, str(tmp_path)).toPandas()
    oracle_pdf = _oracle_on(str(tmp_path), spec.oracle)
    assert compare(spark_pdf, oracle_pdf) == []
    assert set(spark_pdf["grp"]) == {"a", "b"}


def test_holm_excludes_singleton_source_in_both_engines(spark, tmp_path):
    """r10 ADVICE #2: a 1-doc source made the Welch variance divide by
    ns-1 = 0, producing Inf/NaN p-values with engine-divergent NULL
    semantics that poison the rank and cumulative-max windows. The
    tested family now requires ns >= 2 AND a >= 2-doc complement, in
    BOTH engines; the singleton still counts inside the rest-of-corpus
    moments."""
    texts = [
        "alpha beta gamma delta",
        "alpha alpha alpha alpha",
        "one two three four five six",
        "one one two two three three",
        "lone wolf document here",  # the singleton source
    ]
    sources = ["s0", "s0", "s1", "s1", "solo"]
    _write_docs(str(tmp_path), texts, sources=sources)
    spec = all_queries()["holm_bonferroni_stepdown"]
    spark_pdf = spec.builder(spark, str(tmp_path)).toPandas()
    oracle_pdf = _oracle_on(str(tmp_path), spec.oracle, tables=("documents",))
    assert compare(spark_pdf, oracle_pdf) == [], "engines diverged"
    assert set(spark_pdf["source"]) == {"s0", "s1"}
    # p-values are finite and the step-down is monotone
    ps = spark_pdf.sort_values("p_value")["p_adj"].tolist()
    assert all(0.0 <= p <= 1.0 for p in ps)
    assert ps == sorted(ps)


def test_holm_all_but_one_source_excluded(spark, tmp_path):
    """The complement guard: a source holding all-but-one doc leaves a
    1-doc complement ((n-ns)-1 = 0) — excluded from the tested family
    on both sides."""
    texts = [
        "alpha beta gamma delta",
        "alpha alpha beta beta",
        "one two three four",
        "five six seven eight",
        "lone wolf document here",
    ]
    sources = ["big", "big", "big", "big", "solo"]
    _write_docs(str(tmp_path), texts, sources=sources)
    spec = all_queries()["holm_bonferroni_stepdown"]
    spark_pdf = spec.builder(spark, str(tmp_path)).toPandas()
    oracle_pdf = _oracle_on(str(tmp_path), spec.oracle, tables=("documents",))
    assert compare(spark_pdf, oracle_pdf) == []
    # 'big' fails the complement guard (n-ns = 1); 'solo' fails ns >= 2
    assert len(spark_pdf) == 0 and len(oracle_pdf) == 0


def test_temperature_scaling_unchanged_after_persist(spark, duck):
    """r10 ADVICE #3 is a PLAN-only change (persisted grid, one corpus
    scan — pinned in test_plans); the fitted values must be identical
    to the oracle's CTE unroll as before."""
    from tests.conftest import SF_SMOKE

    spec = all_queries()["temperature_scaling_fit"]
    spark_pdf = spec.builder(spark, SF_SMOKE).toPandas()
    oracle_pdf = duck.execute(spec.oracle).fetchdf()
    assert compare(spark_pdf, oracle_pdf) == []
    assert len(spark_pdf) == 1
