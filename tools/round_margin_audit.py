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


def _swap_rounds(sql: str) -> str:
    """Replace each ROUND(...) call with probe_round1/probe_round2 by
    top-level argument count (paren-matched — regex can't see nesting)."""
    out = []
    i = 0
    pat = re.compile(r"\bROUND\s*\(", re.I)
    while True:
        m = pat.search(sql, i)
        if not m:
            out.append(sql[i:])
            break
        out.append(sql[i : m.start()])
        j = m.end()
        depth = 1
        commas = 0
        while j < len(sql) and depth:
            ch = sql[j]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 1:
                commas += 1
            j += 1
        body = sql[m.end() : j]  # includes the closing paren
        fn = "probe_round2(" if commas else "probe_round1("
        out.append(fn + _swap_rounds(body[:-1]) + ")")
        i = j
    return "".join(out)


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
        patched = _swap_rounds(sql)
        try:
            pdf = con.execute(patched).fetchdf()
        except Exception as ex:  # pragma: no cover - surface, don't die
            findings.append((name, "*", "probe-error", str(ex)[:100]))
            continue
        for c in pdf.columns:
            s = pdf[c]
            if s.dtype.kind != "f":
                continue
            worst = None
            subulp = None
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
                fr = v - math.floor(v)
                dist = abs(fr - 0.5)
                if worst is None or dist < worst[0]:
                    worst = (dist, v, u)
            if subulp:
                findings.append((name, c, "subulp-round", subulp))
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
