"""ULP-proximity audit of every ROUNDed oracle output (round 7).

The repo's two driver hash failures (q9 r6, embedding_covariance_spectrum
r5+r6) and the round-7 linear-CKA near-miss share one mechanism: a
ROUND(x, k) whose pre-round scaled value x*10^k sits ON or WITHIN a few
ulps of a half-grid boundary, where Spark (BigDecimal HALF_UP on the
exact binary expansion) and DuckDB (scaled float arithmetic) — or two
different DuckDB builds — may disagree on the final digit.

This tool re-runs every oracle with ROUND(x, k) macro-swapped to the
scaled pre-round value x*10^k and flags columns whose values come within
64 ulps of a .5 boundary while the scaled ulp is still sub-integer (when
ulp(x*10^k) >= 1 the double has no fractional part and ROUND is a no-op
in both engines — reported separately as 'subulp-round', a false-
precision smell rather than a divergence risk).

Found on first run: linear_cka_truncation_audit's fro_xx sat EXACTLY on
a tie (dist 0.0 at ulp 0.25) — since fixed to FLOOR(sqrt) BIGINT (IEEE
sqrt is correctly rounded on every build; floor has no half-grid).

Round 9: the swap is restricted to the FINAL query block (everything
from the first paren-depth-0 SELECT onward — i.e. after the WITH
clause). Swapping CTE-internal ROUNDs corrupted every probe downstream
of them: brier_score_decomposition's _SCORE_CTE round(x, 4) became
x*10^4, cascading 1e8 into the integer lifts and producing phantom
tie-proximity findings on values whose true margins are >1e10 ulps.
CTE-internal rounds keep their semantics (so the final-block probes are
faithful) and are reported once per query as 'inner-rounds-intact' so
the unaudited surface is visible rather than silent. Inner rounds that
feed GROUP BY keys or integer lifts are boundary-relevant through a
different mechanism (key divergence) and need a per-site probe, not
this whole-query macro — tracked in the finding note.

Usage: python tools/round_margin_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import re
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _final_block_start(sql: str) -> int:
    """Offset of the first paren-depth-0 SELECT — the main query block
    after any WITH clause (CTE bodies are parenthesized, so they never
    host a depth-0 SELECT; top-level UNION branches all start at or
    after this offset). 0 when the oracle has no WITH clause."""
    depth = 0
    pat = re.compile(r"\bSELECT\b", re.I)
    for m in pat.finditer(sql):
        depth = sql.count("(", 0, m.start()) - sql.count(")", 0, m.start())
        if depth == 0:
            return m.start()
    return 0


def _subquery_depth(tail: str) -> list[int]:
    """Per-char depth of enclosing SUBQUERY parens (a paren group whose
    first non-space token is SELECT or WITH). Expression parens — CAST,
    function calls, arithmetic grouping — do not count."""
    n = len(tail)
    depth = [0] * n
    stack: list[bool] = []
    d = 0
    for i, ch in enumerate(tail):
        depth[i] = d
        if ch == "(":
            is_sub = bool(re.match(r"\s*(SELECT|WITH)\b", tail[i + 1 :], re.I))
            stack.append(is_sub)
            if is_sub:
                d += 1
        elif ch == ")" and stack:
            if stack.pop():
                d -= 1
    return depth


def _swap_final_block_rounds(sql: str) -> tuple[str, int]:
    """Swap ROUNDs only in the final query block, and only those OUTSIDE
    parenthesized subqueries; return (patched SQL, count of ROUNDs left
    intact). Round 9: capstone reports UNION parenthesized subqueries
    each carrying its own WITH clause AFTER the top-level cut — swapping
    those re-created the CTE-corruption class the final-block scoping
    fixed (eval_scorecard_report's probed 4-dp score cascaded 10^4 into
    a downstream integer lift and overflowed the BIGINT cast at sf0.1).
    Subquery-internal ROUNDs keep their semantics and are counted in the
    intact tally so the unaudited surface stays visible; capstones are
    audited through their registered constituents."""
    cut = _final_block_start(sql)
    head, tail = sql[:cut], sql[cut:]
    inner = len(re.findall(r"\bROUND\s*\(", head, re.I))
    sub = _subquery_depth(tail)
    out: list[str] = []
    i = 0
    pat = re.compile(r"\bROUND\s*\(", re.I)
    while True:
        m = pat.search(tail, i)
        if not m:
            out.append(tail[i:])
            break
        if sub[m.start()] > 0:
            inner += 1
            out.append(tail[i : m.end()])
            i = m.end()
            continue
        # count top-level commas of THIS call to pick the macro arity
        j = m.end()
        depth = 1
        commas = 0
        while j < len(tail) and depth:
            ch = tail[j]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 1:
                commas += 1
            j += 1
        fn = "probe_round2(" if commas else "probe_round1("
        out.append(tail[i : m.start()] + fn)
        # resume INSIDE the body (not past it): nested ROUNDs are then
        # re-screened against the SAME subquery-depth map, so a scalar
        # subquery's internal ROUND inside a probed expression stays
        # intact instead of being handed to the depth-unaware
        # _swap_rounds (which would re-create the cascade-corruption
        # class the subquery scoping exists to prevent)
        i = m.end()
    return head + "".join(out), inner


def _swapped_aliases(patched: str) -> set[str] | None:
    """Output aliases whose final-block projection item contains a probe
    swap — the ONLY columns whose values are pre-round probes. Columns
    that merely pass a CTE-rounded value through are final values on
    their own decimal grid; reading them as probes produced phantom ties
    (a 2-dp revenue ending in .50, a pos_rate of exactly 0.5). Returns
    None (audit everything) if any probed item lacks an AS alias."""
    out: set[str] = set()
    start = _final_block_start(patched)
    # absolute paren depth at each char (subquery SELECTs sit at depth>0)
    depth_at = []
    d = 0
    for ch in patched:
        depth_at.append(d)
        if ch == "(":
            d += 1
        elif ch == ")":
            d -= 1
    sel = re.compile(r"\bSELECT\b", re.I)
    from_kw = re.compile(r"\bFROM\b", re.I)
    for m in sel.finditer(patched, start):
        if depth_at[m.start()] != 0:
            continue
        # projection list runs to the next depth-0 FROM (or end)
        end = len(patched)
        for fm in from_kw.finditer(patched, m.end()):
            if depth_at[fm.start()] == 0:
                end = fm.start()
                break
        proj = patched[m.end() : end]
        # split on depth-0 commas
        items, buf, d = [], [], 0
        for ch in proj:
            if ch == "(":
                d += 1
            elif ch == ")":
                d -= 1
            if ch == "," and d == 0:
                items.append("".join(buf))
                buf = []
            else:
                buf.append(ch)
        items.append("".join(buf))
        for item in items:
            if "probe_round" not in item:
                continue
            al = re.search(r'\bAS\s+"?(\w+)"?\s*$', item.strip(), re.I)
            if not al:
                return None  # unaliased probe: fall back to audit-all
            out.add(al.group(1).lower())
    return out


def audit(sf_dir: str, names: list[str] | None = None) -> list[tuple]:
    import duckdb

    from weather_stream_processor_spark.registry import all_queries

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    # 2-arg ROUND -> scaled pre-round value; 1-arg ROUND -> unscaled
    # pre-round value (the cents lifts — boundary-avoiding by
    # construction, but reported all the same). DuckDB macros don't
    # overload on arity, so the rewriter paren-matches each call and
    # picks the macro by top-level comma count.
    con.execute("CREATE MACRO probe_round1(x) AS x")
    con.execute("CREATE MACRO probe_round2(x, k) AS x * pow(10.0, k)")

    findings: list[tuple] = []
    specs = all_queries()
    for name, spec in specs.items():
        if names and name not in names:
            continue
        sql = spec.oracle
        if not sql or "ROUND" not in sql.upper():
            continue
        patched, inner = _swap_final_block_rounds(sql)
        if inner:
            findings.append(
                (name, "*", "inner-rounds-intact",
                 f"n={inner} (CTE-internal; audited only via final-block "
                 "propagation — key/lift divergence needs a per-site probe)")
            )
        probed = _swapped_aliases(patched)
        try:
            pdf = con.execute(patched).fetchdf()
        except Exception as ex:  # pragma: no cover - surface, don't die
            findings.append((name, "*", "probe-error", str(ex)[:100]))
            continue
        for c in pdf.columns:
            s = pdf[c]
            if s.dtype.kind != "f":
                continue
            if probed is not None and c.lower() not in probed:
                continue  # passthrough of a CTE-rounded value, not a probe
            worst = None
            subulp = None
            coarse = None
            for v in s.dropna():
                if not math.isfinite(v):
                    continue
                u = math.ulp(abs(v)) if v else math.ulp(1.0)
                if u >= 1.0:
                    # integral-by-magnitude: ROUND is a no-op; note it but
                    # KEEP scanning — a large value must not mask a real
                    # half-grid tie elsewhere in the same column
                    subulp = subulp or f"|v|~{abs(v):.2e}"
                    continue
                if u >= 1.0 / 128:
                    # 64*ulp >= 0.5: the tie test is VACUOUS at this
                    # magnitude (every double is 'within 64 ulps' of a .5
                    # boundary, including exactly-on-grid integer lifts —
                    # r9's mann_whitney u_stat at 2e14 scaled). Note the
                    # coarse grid once per column instead of a fake tie.
                    coarse = coarse or f"|v|~{abs(v):.2e} ulp={u:.1e}"
                    continue
                fr = v - math.floor(v)
                dist = abs(fr - 0.5)
                if worst is None or dist < worst[0]:
                    worst = (dist, v, u)
            if subulp:
                findings.append((name, c, "subulp-round", subulp))
            if coarse:
                findings.append((name, c, "coarse-grid", coarse))
            if worst is not None and worst[0] <= 64 * worst[2]:
                findings.append(
                    (name, c, "tie-proximity",
                     f"dist={worst[0]:.3e} ulp={worst[2]:.1e} v={worst[1]!r}")
                )
    return findings


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = audit(sf, sys.argv[2:] or None)
    for row in out:
        print(" ".join(str(x) for x in row))
    print(f"{len(out)} findings")
