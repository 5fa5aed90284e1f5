"""Mirror of the driver's t2 gate at sf0.001: every registered query with an
oracle must match DuckDB on row count, columns, and values; rows-only
queries must at least run and return a stable schema."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tools.oracle_check import compare, driver_canonicalize


def _specs():
    from weather_stream_processor_spark.registry import all_queries

    return sorted(all_queries().items())


@pytest.mark.parametrize("name,spec", _specs(), ids=[n for n, _ in _specs()])
def test_query_matches_oracle(registry_walk, duck, name, spec):
    # build + execution happen ONCE per query in the shared parallel
    # registry walk (conftest.registry_walk); this test consumes the
    # recorded frame and does the DuckDB comparison on the main thread
    rec = registry_walk[name]
    if rec.error is not None:
        raise rec.error
    if spec.oracle is not None:
        # Registry guard (VERDICT r5 #1/#7): the driver's value hash can
        # only digest scalar columns — an oracle-backed query must never
        # emit array/map/struct (r5's array_set_operations failure).
        from pyspark.sql.types import ArrayType, MapType, StructType

        for f_ in rec.schema.fields:
            assert not isinstance(f_.dataType, (ArrayType, MapType, StructType)), (
                f"{name}: oracle-backed query emits non-scalar column "
                f"{f_.name!r} ({f_.dataType.simpleString()}) — the driver "
                "canonicalizer cannot hash it; array_join/to_json it"
            )
    spark_pdf = rec.pdf
    if spec.oracle is None:
        assert len(rec.schema.fields) > 0
        return
    oracle_pdf = duck.execute(spec.oracle).fetchdf()
    errs = compare(spark_pdf, oracle_pdf)
    assert not errs, f"{name}: " + "; ".join(errs)
    # Round-trip through the driver's literal canonicalization steps
    # (sort_values + factorize over object columns) — raises on anything
    # the driver would die on, before the driver sees it.
    driver_canonicalize(spark_pdf)
    driver_canonicalize(oracle_pdf)


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
