"""Contract tests for tools/round_margin_audit.py (round 9).

The round-9 rework fixed two false-positive classes the all-sites macro
swap produced, while keeping genuine final-block ties detectable:

1. CTE-internal ROUNDs were swapped too, so a lift like _SCORE_CTE's
   ROUND(x, 4) became x*10^4 and corrupted every probe downstream
   (brier_score_decomposition showed phantom ties on values whose true
   margins are >1e10 ulps).
2. Columns that merely pass a CTE-rounded value through the final block
   were read as pre-round probes, so any final value legitimately
   ending in .5 on its own grid flagged dist=0 (a 2-dp revenue of
   ...540.50, a pos_rate of exactly 0.5).

These are pure-DuckDB tests — no Spark session needed.
"""

from __future__ import annotations

import duckdb
import pytest

from tools.round_margin_audit import (
    _final_block_start,
    _swap_final_block_rounds,
    _swapped_aliases,
)


def test_final_block_start_skips_cte_bodies():
    sql = "WITH a AS (SELECT 1 AS x), b AS (SELECT 2) SELECT x FROM a"
    assert sql[_final_block_start(sql):].startswith("SELECT x")


def test_final_block_start_no_cte_is_whole_query():
    sql = "SELECT ROUND(1.2345, 2) AS v"
    assert _final_block_start(sql) == 0


def test_cte_internal_rounds_left_intact():
    sql = (
        "WITH s AS (SELECT ROUND(0.12345, 4) AS score) "
        "SELECT ROUND(score * 3, 2) AS v FROM s"
    )
    patched, inner = _swap_final_block_rounds(sql)
    assert inner == 1
    # the CTE round survives; only the final-block round is swapped
    assert "ROUND(0.12345, 4)" in patched
    assert "probe_round2(score * 3, 2)" in patched


def test_passthrough_columns_are_not_probed():
    sql = (
        "WITH r AS (SELECT ROUND(540.50, 2) AS revenue) "
        "SELECT revenue, ROUND(revenue / 2, 6) AS share FROM r"
    )
    patched, _ = _swap_final_block_rounds(sql)
    probed = _swapped_aliases(patched)
    assert probed == {"share"}  # revenue passes through un-probed


def test_unaliased_probe_falls_back_to_audit_all():
    patched, _ = _swap_final_block_rounds("SELECT ROUND(1.5, 0) FROM (SELECT 1)")
    assert _swapped_aliases(patched) is None


def test_union_branches_both_probed():
    sql = (
        "SELECT ROUND(1.1, 2) AS a FROM (SELECT 1) "
        "UNION ALL SELECT ROUND(2.2, 2) AS b FROM (SELECT 1)"
    )
    patched, inner = _swap_final_block_rounds(sql)
    assert inner == 0
    assert _swapped_aliases(patched) == {"a", "b"}


def test_genuine_final_block_tie_still_detected():
    """End-to-end through audit(): a final-block ROUND sitting exactly on
    a half-grid must flag tie-proximity, and a passthrough .5 must not."""
    import tools.round_margin_audit as rma

    class _Spec:
        # 0.000125 * 10^4 = 1.25 -> fr 0.25, safe; 0.00015 * 10^4 = 1.5 -> tie
        oracle = (
            "WITH c AS (SELECT ROUND(0.5, 1) AS passthrough) "
            "SELECT passthrough, ROUND(0.00015, 4) AS hot FROM c"
        )

    con = duckdb.connect()
    con.execute("CREATE MACRO probe_round1(x) AS x")
    con.execute("CREATE MACRO probe_round2(x, k) AS x * pow(10.0, k)")
    patched, inner = _swap_final_block_rounds(_Spec.oracle)
    probed = _swapped_aliases(patched)
    assert inner == 1 and probed == {"hot"}
    row = con.execute(patched).fetchdf()
    assert float(row["hot"][0]) == pytest.approx(1.5)
    assert float(row["passthrough"][0]) == 0.5  # would be a phantom tie
