"""Mechanical audit of unpartitioned windows across every registered plan.

r7 verdict task 3: the repo's ~46 unpartitioned-window call sites were
audited by hand ("the input relation is a bounded grid"), but a new
operator can silently add site 47 whose input GROWS with the corpus — the
exact failure class `peak_concurrent_sessions` carried until round 8.
This tool makes that audit mechanical: it builds every registered query's
executed plan at the smoke fixture and reports each query whose plan
contains a window spec with NO partition columns, together with the spec's
order keys (to identify the call site).

`tests/test_window_partition_guard.py` pins the result against an explicit
allowlist that carries the per-query boundedness rationale; a query with a
new unpartitioned window fails the guard until a human writes down why the
window's input relation is corpus-bounded.

Detection is string-based on the executed plan: an optimized
`windowspecdefinition(...)` lists partition expressions first, then order
expressions (tagged ASC/DESC), then the frame. A spec whose FIRST
top-level argument is an order expression or the frame itself has no
partition columns. String parsing (vs JVM tree walking) also sees window
specs inside subquery plans, which `children()` traversal would miss.

Usage:
    python tools/window_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_SMOKE = "/root/testdata/sf0.001"

_SPEC = "windowspecdefinition("


def _balanced_args(s: str, start: int) -> str:
    """Return the argument string of the call whose '(' is at ``start``."""
    depth = 0
    for i in range(start, len(s)):
        c = s[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return s[start + 1 : i]
    raise ValueError("unbalanced parens in plan string")


def _split_top_level(args: str) -> list[str]:
    out, depth, cur = [], 0, []
    for c in args:
        if c == "(" or c == "[":
            depth += 1
        elif c == ")" or c == "]":
            depth -= 1
        if c == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
    if cur:
        out.append("".join(cur).strip())
    return out


_ORDER_TAG = re.compile(r"\b(ASC|DESC) NULLS (FIRST|LAST)$")


def unpartitioned_specs(plan: str) -> list[str]:
    """Order-key signatures of every zero-partition window spec in ``plan``.

    Signature = the comma-joined order arguments with expression IDs
    stripped (``at#123`` -> ``at``), so it is stable across plan builds.
    """
    found = []
    pos = 0
    while True:
        pos = plan.find(_SPEC, pos)
        if pos < 0:
            break
        args = _balanced_args(plan, pos + len(_SPEC) - 1)
        pos += len(_SPEC)
        parts = _split_top_level(args)
        if not parts:
            continue
        first = parts[0]
        if not (_ORDER_TAG.search(first) or first.startswith("specifiedwindowframe(")):
            continue  # has at least one partition column
        order_keys = [p for p in parts if _ORDER_TAG.search(p)]
        sig = ", ".join(re.sub(r"#\d+L?", "", k) for k in order_keys) or "<no order>"
        found.append(sig)
    return found


def audit(sf_dir: str, only: list[str] | None = None) -> dict[str, list[str]]:
    """Map query name -> sorted unique unpartitioned-window signatures."""
    from weather_stream_processor_spark.registry import all_queries
    from weather_stream_processor_spark.session import get_spark

    spark = get_spark("window-audit", shuffle_partitions=8)
    result: dict[str, list[str]] = {}
    for name, spec in all_queries().items():
        if only and name not in only:
            continue
        df = spec.builder(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        sigs = unpartitioned_specs(plan)
        if sigs:
            result[name] = sorted(set(sigs))
    return result


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else SF_SMOKE
    only = sys.argv[2:] or None
    result = audit(sf_dir, only)
    total = sum(len(v) for v in result.values())
    for name in sorted(result):
        for sig in result[name]:
            print(f"{name}\t{sig}")
    print(f"# {len(result)} queries carry {total} unpartitioned window spec(s)")


if __name__ == "__main__":
    main()


# --- companion screen: nested-loop / cartesian join operators ---------------

_JOIN_OPS = ("CartesianProduct", "BroadcastNestedLoopJoin")


def nested_loop_joins(plan: str) -> list[str]:
    """Occurrences of quadratic-class join operators in ``plan``.

    Returns one entry per operator line, e.g. ``BroadcastNestedLoopJoin
    BuildRight, Inner`` — enough signature to identify the call site
    without expression IDs. A BNLJ over two bounded inputs (broadcast
    decile/bucket grids, k-row frames) is a deliberate plan choice; one
    whose streamed side grows with the corpus AND whose build side is
    data-sized is the quadratic blowup class this screen exists to pin.
    """
    import re as _re

    out = []
    for line in plan.splitlines():
        for op in _JOIN_OPS:
            m = _re.search(rf"\b{op}\b(?: (Build\w+))?(?:, (\w+))?", line)
            if m:
                parts = [op] + [g for g in m.groups() if g]
                out.append(" ".join(parts))
    return sorted(out)
