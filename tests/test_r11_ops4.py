"""Round-11 operators, batch 4: delete-group jackknife over sources —
semantics pinned against a pure-Python rederivation (fixture + synthetic
constructions) and the Tukey pseudo-value identity."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE
from weather_stream_processor_spark.registry import all_queries


def _run(spark, name, sf=SF_SMOKE):
    return all_queries()[name].builder(spark, str(sf)).collect()


def _write_docs(tmp_path, sources_texts):
    n = len(sources_texts)
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(1, n + 1)),
            "text": [t for _, t in sources_texts],
            "lang": ["en"] * n,
            "source": [s for s, _ in sources_texts],
            "n_chars": pd.array([16] * n, dtype="Int64"),
        }
    )
    duckdb.connect().execute(
        f"COPY (SELECT * FROM pdf) TO '{tmp_path}/documents.parquet' "
        "(FORMAT PARQUET)"
    )


def _py_jackknife(groups):
    """groups: {source: (n_i, s_i)} with s_i the 1e4-lifted integer score
    sum — mirror the operator's exact dyadic lifts."""
    n = sum(ni for ni, _ in groups.values())
    s = sum(si for _, si in groups.values())
    g = len(groups)
    theta_full = s / n / 1e4
    loo = {
        src: (s - si) / (n - ni) / 1e4
        for src, (ni, si) in groups.items()
        if n - ni >= 1
    }
    stq = sum(math.floor(t * 1e12 + 0.5) for t in loo.values())
    mean_loo = (stq / g) / 1e12
    sdq = sum(
        math.floor((t - mean_loo) ** 2 * 1e12 + 0.5) for t in loo.values()
    )
    se = math.sqrt((g - 1) / g * (sdq / 1e12))
    bias = (g - 1) * ((stq / g) / 1e12 - theta_full)
    pseudo = {src: g * theta_full - (g - 1) * t for src, t in loo.items()}
    return theta_full, loo, pseudo, se, bias


def _fixture_groups():
    """Per-source (n_i, s_i) from the fixture with the operator's lift."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    rows = con.execute(
        """
        SELECT source, COUNT(*),
               SUM(CAST(ROUND(
                   ROUND(len(list_distinct(string_split(text, ' '))) * 1.0
                         / len(string_split(text, ' ')), 4) * 10000
               ) AS BIGINT))
        FROM documents GROUP BY source
        """
    ).fetchall()
    return {src: (ni, si) for src, ni, si in rows}


def test_jackknife_matches_python_rederivation(spark):
    got = {r["source"]: r.asDict() for r in _run(spark, "jackknife_source_se")}
    groups = _fixture_groups()
    theta_full, loo, pseudo, se, bias = _py_jackknife(groups)
    assert set(got) == set(loo)
    for src, row in got.items():
        assert row["n_docs"] == groups[src][0]
        assert row["theta_full"] == pytest.approx(theta_full, abs=1e-6)
        assert row["theta_loo"] == pytest.approx(loo[src], abs=1e-6)
        assert row["pseudo_value"] == pytest.approx(pseudo[src], abs=1e-5)
        assert row["jack_se"] == pytest.approx(se, abs=1e-7)
        assert row["jack_bias"] == pytest.approx(bias, abs=1e-7)


def test_jackknife_pseudo_value_identity(spark):
    """g*theta_full - (g-1)*theta_loo row by row, and the pseudo-value
    mean telescopes back to theta_full - jack_bias/(g-1)*(g-1) form:
    mean(pseudo) = g*theta - (g-1)*mean_loo = theta - bias."""
    rows = [r.asDict() for r in _run(spark, "jackknife_source_se")]
    g = len(rows)
    theta = rows[0]["theta_full"]
    for r in rows:
        assert r["pseudo_value"] == pytest.approx(
            g * theta - (g - 1) * r["theta_loo"], abs=2e-4
        )
    mean_pseudo = sum(r["pseudo_value"] for r in rows) / g
    assert mean_pseudo == pytest.approx(
        theta - rows[0]["jack_bias"], abs=2e-4
    )


def test_jackknife_single_source_excluded(spark, tmp_path):
    _write_docs(str(tmp_path), [("only", "alpha beta gamma")] * 5)
    assert _run(spark, "jackknife_source_se", tmp_path) == []


def test_jackknife_synthetic_two_point(spark, tmp_path):
    """Two sources with exactly-representable scores 1.0 and 0.25:
    closed-form jackknife checked to the digit."""
    rows = (
        [("pure", "a b c d")] * 3       # score 1.0
        + [("dupey", "a a a a")] * 1    # score 0.25
    )
    _write_docs(str(tmp_path), rows)
    got = {
        r["source"]: r.asDict()
        for r in _run(spark, "jackknife_source_se", tmp_path)
    }
    groups = {"pure": (3, 30000), "dupey": (1, 2500)}
    theta_full, loo, pseudo, se, bias = _py_jackknife(groups)
    assert theta_full == pytest.approx(0.8125)
    assert loo["pure"] == pytest.approx(0.25)   # delete pure -> only dupey
    assert loo["dupey"] == pytest.approx(1.0)   # delete dupey -> only pure
    for src in groups:
        assert got[src]["theta_loo"] == pytest.approx(loo[src], abs=1e-6)
        assert got[src]["jack_se"] == pytest.approx(se, abs=1e-7)
        assert got[src]["jack_bias"] == pytest.approx(bias, abs=1e-7)
        assert got[src]["pseudo_value"] == pytest.approx(
            pseudo[src], abs=1e-5
        )
