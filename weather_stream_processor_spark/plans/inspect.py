"""Physical-plan introspection.

The engine adds no custom IR (SURVEY §3.4): correctness of the *plan
shape* — broadcast vs shuffle join, filter/column pushdown into the scan,
whole-stage codegen coverage — IS the optimizer surface we own, so it gets
first-class helpers and tests like any operator. These are also the tools
for the per-operator ``.explain`` reviews the build process mandates.

Everything reads Spark's own EXPLAIN output; no private planner state.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """``df.explain(mode)`` as a string instead of stdout."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )


def operator_names(df: DataFrame) -> list[str]:
    """Physical operator names in plan order, e.g. ['HashAggregate',
    'Exchange', 'Scan parquet']. AQE wrapper nodes are included as-is;
    before execution this is the *initial* plan (AQE may re-plan joins at
    runtime — assertions on broadcastability should hold even pre-AQE)."""
    out = []
    for line in explain_string(df, "formatted").splitlines():
        m = re.match(r"^\(\d+\)\s+(.*?)(?:\s+\[codegen id : \d+\])?$", line.strip())
        if m:
            out.append(m.group(1))
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans (flattened)."""
    found: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_string(df)):
        entry = m.group(1).strip()
        if entry:
            found.extend(p.strip() for p in entry.split(","))
    return found


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each scan (column-pruning evidence)."""
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_string(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def require_plan(
    df: DataFrame,
    contains: tuple[str, ...] = (),
    not_contains: tuple[str, ...] = (),
) -> None:
    """Assert operator presence/absence in the physical plan.

    Raises AssertionError naming the offending operator with the full plan
    attached, so a failed plan-shape test shows exactly what Catalyst chose.
    """
    plan = explain_string(df, "formatted")
    for needle in contains:
        if needle not in plan:
            raise AssertionError(f"expected {needle!r} in plan:\n{plan}")
    for needle in not_contains:
        if needle in plan:
            raise AssertionError(f"unexpected {needle!r} in plan:\n{plan}")
