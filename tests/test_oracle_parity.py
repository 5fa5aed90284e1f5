"""Mirror of the driver's t2 gate at sf0.001: every registered query with an
oracle must match DuckDB on row count, columns, and values; rows-only
queries must at least run and return a stable schema."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tools.oracle_check import compare


def _specs():
    from weather_stream_processor_spark.registry import all_queries

    return sorted(all_queries().items())


@pytest.mark.parametrize("name,spec", _specs(), ids=[n for n, _ in _specs()])
def test_query_matches_oracle(spark, duck, name, spec):
    sdf = spec.builder(spark, SF_SMOKE)
    spark_pdf = sdf.toPandas()
    if spec.oracle is None:
        assert len(sdf.schema.fields) > 0
        return
    oracle_pdf = duck.execute(spec.oracle).fetchdf()
    errs = compare(spark_pdf, oracle_pdf)
    assert not errs, f"{name}: " + "; ".join(errs)


def test_entry_smoke(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entrymod", str(__import__("tests.conftest", fromlist=["REPO"]).REPO / "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    df = m.entry(spark)
    assert df.count() > 0
    assert set(m.oracle_sql()) <= set(m.queries())
