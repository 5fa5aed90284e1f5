"""Capture .explain("formatted") for headline queries into plans/<round>/.

Usage: [PLANS_ROUND=r12] python tools/capture_plans.py before|after [name ...]
Default query set: the full bench HEADLINE list; default round dir: r12.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    suffix = sys.argv[1]
    assert suffix in ("before", "after"), "first arg must be before|after"
    from bench import HEADLINE
    from weather_stream_processor_spark.registry import all_queries
    from weather_stream_processor_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[2:] or HEADLINE
    spark = get_spark("capture-plans")
    specs = all_queries()
    out_dir = Path(_REPO) / "plans" / os.environ.get("PLANS_ROUND", "r12")
    out_dir.mkdir(parents=True, exist_ok=True)

    import contextlib
    import io

    for name in names:
        df = specs[name].builder(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({plan.count(chr(10))} lines)", flush=True)


if __name__ == "__main__":
    main()
