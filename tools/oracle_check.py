"""Local mirror of the driver's t2 correctness gate.

Runs every registered query's Spark builder and its DuckDB oracle SQL on
the same parquet fixtures, then compares row count, schema (column names),
and order-insensitively compared values (floats via np.isclose after the
builders' own rounding).

Usage:
    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object and len(s) and isinstance(s.dropna().iloc[0] if s.dropna().size else None, (list, np.ndarray)):
            df[c] = s.map(lambda v: tuple(np.asarray(v).tolist()) if v is not None else None)
    sort_cols = [c for c in df.columns]
    try:
        df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    except TypeError:
        df = df.sort_values(sort_cols, kind="mergesort", key=lambda s: s.astype(str)).reset_index(drop=True)
    return df


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        errs.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        errs.append(f"columns: spark={sc} oracle={oc}")
        return errs
    if errs:
        return errs
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    for c in a.columns:
        x, y = a[c], b[c]
        # dtype-KIND mismatch (int one side, float the other) is exactly
        # what the driver's strict value hash rejects even when the values
        # compare numerically equal — e.g. DuckDB widening an integer SUM
        # to HUGEINT, which fetchdf() lands as float64 vs Spark's int64.
        # Fail it here so it can never pass locally and fail the driver.
        kinds = tuple(
            "f" if pd.api.types.is_float_dtype(s)
            else "i" if pd.api.types.is_integer_dtype(s)
            else None
            for s in (x, y)
        )
        if kinds[0] != kinds[1] and None not in kinds:
            errs.append(
                f"col {c!r}: numeric dtype kind mismatch spark={x.dtype} "
                f"oracle={y.dtype} (driver hash would differ; CAST the "
                "oracle, e.g. integer SUM -> BIGINT)"
            )
            continue
        if pd.api.types.is_float_dtype(x) and pd.api.types.is_float_dtype(y):
            ok = np.isclose(x.fillna(np.nan), y.fillna(np.nan), rtol=1e-9, atol=1e-9, equal_nan=True)
        else:
            ok = (x.fillna("\0NULL") == y.fillna("\0NULL")) if x.dtype == object else (
                x.isna() & y.isna()
            ) | (x == y)
        bad = (~np.asarray(ok)).nonzero()[0]
        if len(bad):
            i = bad[0]
            errs.append(
                f"col {c!r}: {len(bad)} mismatches, first at sorted-row {i}: "
                f"spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}"
            )
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from weather_stream_processor_spark.registry import all_queries
    from weather_stream_processor_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb_con(sf_dir)
    specs = all_queries()
    failed, rows_only = [], []
    for name, spec in sorted(specs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = spec.builder(spark, sf_dir)
        spark_pdf = sdf.toPandas()
        if spec.oracle is None:
            rows_only.append(name)
            print(f"  ~ {name}: rows-only ({len(spark_pdf)} rows) [{time.time()-t0:.1f}s]")
            continue
        oracle_pdf = con.execute(spec.oracle).fetchdf()
        errs = compare(spark_pdf, oracle_pdf)
        if errs:
            failed.append(name)
            print(f"  ✗ {name} [{time.time()-t0:.1f}s]")
            for e in errs:
                print(f"      {e}")
        else:
            print(f"  ✓ {name}: {len(spark_pdf)} rows match [{time.time()-t0:.1f}s]")
    print(
        f"\n{len(specs) if not only else len(only)} checked, {len(failed)} failed, "
        f"{len(rows_only)} rows-only"
    )
    if failed:
        print("FAILED:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
