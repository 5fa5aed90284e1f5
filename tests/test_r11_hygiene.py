"""Round-11 hygiene gates from the r10 verdict.

The r10 driver red (`loo_source_influence`) was a DTYPE bug, not a math
bug: the query emitted raw ``DECIMAL(38,0)`` columns, which ``toPandas()``
lands as Python ``Decimal`` objects while DuckDB's ``fetchdf()`` lands the
same values as float64 — numerically equal, so the local mirror's
object-equality branch passed, but the driver's canonical-STRING hash
differs (``'1487435822'`` vs ``'1.4874e+09'``-class rendering). Two
permanent gates follow (VERDICT r10 tasks 1–2):

1. registry-wide: NO query may emit a raw ``DecimalType`` output column
   (cast to BIGINT/DOUBLE/STRING before emission);
2. tool-level: the hardened ``tools/oracle_check.compare`` must FAIL a
   Decimal-vs-float64 frame pair — regression-tested here against a
   reconstruction of the exact pre-fix failure shape.
"""

from __future__ import annotations

import decimal

import pandas as pd
import pytest

from tests.conftest import SF_SMOKE
from tools.oracle_check import compare, driver_canonicalize


def _specs():
    from weather_stream_processor_spark.registry import all_queries

    return sorted(all_queries().items())


def _has_decimal(dt) -> bool:
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    if isinstance(dt, DecimalType):
        return True
    if isinstance(dt, ArrayType):
        return _has_decimal(dt.elementType)
    if isinstance(dt, MapType):
        return _has_decimal(dt.keyType) or _has_decimal(dt.valueType)
    if isinstance(dt, StructType):
        return any(_has_decimal(f.dataType) for f in dt.fields)
    return False


@pytest.mark.parametrize("name,spec", _specs(), ids=[n for n, _ in _specs()])
def test_no_raw_decimal_output_column(registry_walk, name, spec):
    """Plan-construction-only scan: DECIMAL is a legitimate INTERNAL
    accumulator contract (exact integer moments past int64), but it must
    never reach the emitted schema — the driver hash renders Decimal and
    float64 differently even when values are identical (r10 red).
    Schemas come from the shared parallel registry walk (r12)."""
    rec = registry_walk[name]
    if rec.error is not None:
        raise rec.error
    for f_ in rec.schema.fields:
        assert not _has_decimal(f_.dataType), (
            f"{name}: output column {f_.name!r} is "
            f"{f_.dataType.simpleString()} — raw DecimalType output is "
            "banned (r10 loo_source_influence driver red); CAST to "
            "BIGINT/DOUBLE/STRING before emission"
        )


def test_compare_rejects_decimal_vs_float():
    """The exact pre-fix failure shape: Spark side carrying Decimal
    objects, oracle side carrying the numerically-identical float64.
    The old mirror passed this (Decimal == float compares numerically);
    the hardened tool must fail it on BOTH sides independently."""
    dec = pd.DataFrame({"sgg": [decimal.Decimal("1487435822")]})
    flt = pd.DataFrame({"sgg": [1487435822.0]})
    errs = compare(dec, flt)
    assert errs and any("Decimal" in e for e in errs), errs
    errs = compare(flt, dec)
    assert errs and any("Decimal" in e for e in errs), errs


def test_compare_still_accepts_matching_bigint():
    a = pd.DataFrame({"sgg": pd.array([1487435822], dtype="int64")})
    b = pd.DataFrame({"sgg": pd.array([1487435822], dtype="int64")})
    assert compare(a, b) == []


def test_loo_source_influence_post_fix(spark, duck):
    """The fixed query: all-int64 emission, oracle parity, and identical
    driver-canonical hashes (the reduction the r10 driver actually
    failed on)."""
    from weather_stream_processor_spark.registry import all_queries

    spec = all_queries()["loo_source_influence"]
    sdf = spec.builder(spark, SF_SMOKE)
    assert {f.dataType.simpleString() for f in sdf.schema.fields} == {
        "string",
        "bigint",
    }
    spark_pdf = sdf.toPandas()
    oracle_pdf = duck.execute(spec.oracle).fetchdf()
    assert compare(spark_pdf, oracle_pdf) == []
    assert driver_canonicalize(spark_pdf) == driver_canonicalize(oracle_pdf)
