"""Local mirror of the driver's t2 correctness gate.

Runs every registered query's Spark builder and its DuckDB oracle SQL on
the same parquet fixtures, then compares row count, schema (column names),
and order-insensitively compared values.

Driver-strict by design (r5 lesson — "pass local" must imply "pass
driver"): floats compare EXACTLY (the builders do their own rounding, and
the driver hashes exact values), and any array/map/struct output column is
an immediate failure (the driver's pandas canonicalizer factorizes object
columns and dies on unhashable lists).

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
    sort_cols = [c for c in df.columns]
    try:
        df = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    except TypeError:
        df = df.sort_values(sort_cols, kind="mergesort", key=lambda s: s.astype(str)).reset_index(drop=True)
    return df


def driver_canonicalize(pdf: pd.DataFrame) -> int:
    """Replicate the driver's t2 canonicalization steps LITERALLY so any
    output that would crash or surprise the driver crashes here first
    (VERDICT r5 #7): columns sorted by name, object columns factorized
    (raises ``TypeError: unhashable type`` on array values — the r5
    ``array_set_operations`` failure), rows sorted by every column, then a
    stable hash over the canonical string form. Returns the hash so tests
    can also assert Spark == oracle under the driver's own reduction."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pd.factorize(pdf[c])  # driver step; dies on unhashable values
    pdf = pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)
    import hashlib

    payload = pdf.to_csv(index=False, float_format="%.12g").encode()
    return int(hashlib.sha256(payload).hexdigest()[:16], 16)


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
    # Driver-strictness gate #1: no non-scalar output column may reach the
    # hash. The driver's canonicalizer (pandas sort_values + factorize over
    # object columns) raises `unhashable type: 'list'` on array values —
    # exactly how array_set_operations failed the r5 driver while the old
    # tuple-coercing mirror passed it. Fail here, before sorting.
    import decimal

    for frame, side in ((spark_pdf, "spark"), (oracle_pdf, "oracle")):
        for c in frame.columns:
            s = frame[c]
            if s.dtype == object and s.dropna().size:
                v = s.dropna().iloc[0]
                if isinstance(v, (list, tuple, dict, np.ndarray)):
                    errs.append(
                        f"col {c!r} ({side}): non-scalar {type(v).__name__} "
                        "values — the driver canonicalizer cannot hash "
                        "arrays; emit array_join/to_json strings instead"
                    )
                # Driver-strictness gate #1b (the r10 loo_source_influence
                # lesson): a raw DECIMAL output column lands as Python
                # Decimal objects on the Spark side but float64 on DuckDB's
                # fetchdf() side; Decimal == float compares NUMERICALLY in
                # the object-equality branch below, so the mirror passed
                # what the driver's canonical-string hash failed
                # ('1487435822' vs '1.4874e+09'-class rendering). Reject
                # raw Decimal outright, like the non-scalar gate — builders
                # must CAST to BIGINT/DOUBLE/STRING before emission.
                elif isinstance(v, decimal.Decimal):
                    errs.append(
                        f"col {c!r} ({side}): raw Decimal values — the "
                        "driver hashes the rendered string, which differs "
                        "between Decimal and float64; CAST the output to "
                        "BIGINT/DOUBLE/STRING in both engines"
                    )
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
            # Driver-strictness gate #2: EXACT float equality, bit-for-bit
            # after the builders' own rounding — the driver hashes exact
            # values, and np.isclose here is how embedding_covariance_
            # spectrum's 6-dp order-dependent-sum flip passed locally but
            # failed the r5 driver.
            xa, ya = np.asarray(x, dtype="float64"), np.asarray(y, dtype="float64")
            ok = (xa == ya) | (np.isnan(xa) & np.isnan(ya))
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
