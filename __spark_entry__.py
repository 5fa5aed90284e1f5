"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``weather_stream_processor_spark``; this module is
a thin adapter over its query registry (one entry per operator from
SURVEY.md §2, each a (PySpark builder, DuckDB oracle SQL) pair).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from weather_stream_processor_spark.registry import all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Tumbling 1-hour window SUM of `value` by `event_type` over `events` —
    the reference's core semantics (weather_processor.py:139-141) with the
    implicit hourly bucketing made an explicit window (SURVEY §2.5 St5).
    """
    spec = all_queries()["hourly_value_by_type"]
    return spec.builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each SQL-expressible query (others: rows-only check)."""
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }
