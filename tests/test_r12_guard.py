"""Round-12 guard coverage for plan surfaces hidden behind eager cuts.

r11 advice: the release audit's bounded crosses moved behind the flags
lineage cut, so the registered plan — a checkpoint scan — no longer shows
them to the nested-loop-join guard. The LAZY flags-union twin
(release_audit_flags_plan) restores visibility: every quadratic-class
join in the seven-gate union layer must be a broadcast-bounded build.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from tools.window_audit import nested_loop_joins


def test_release_audit_gate_union_surface(spark):
    from weather_stream_processor_spark.operators.report import (
        release_audit_flags_plan,
    )

    flags = release_audit_flags_plan(spark, SF_SMOKE)
    plan = flags._jdf.queryExecution().executedPlan().toString()
    sigs = nested_loop_joins(plan)
    # no raw CartesianProduct anywhere in the gate union
    assert not any(s.startswith("CartesianProduct") for s in sigs), sigs
    # pin the exact bounded-build surface (the other gate joins execute
    # eagerly inside the gate builders and are audited under their own
    # registered names); a new site must be classified here
    assert sigs == ["BroadcastNestedLoopJoin BuildRight Cross"], sigs
