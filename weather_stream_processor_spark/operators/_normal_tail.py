"""Shared Abramowitz-Stegun 26.2.17 normal upper-tail (round 9).

One home for the five polynomial literals and the two mirrored forms —
the SQL string both engines parse to identical doubles, and the Column
expression Spark evaluates with the same literals in the same order —
so a future correction lands once instead of at every call site (the
round-9 review found four fresh copies of the 15-line polynomial).

The approximation is stated for z >= 0; callers pass |z| and double the
result for a two-sided p. Pre-existing modules (sampling, timeseries,
evals) still carry their own historical copies of the same literals;
they are bit-identical, and migrating greened operators' files is
deliberately deferred — new code must import from here.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
AS_P = 0.2316419


def normal_sf_sql(z: str) -> str:
    """Upper-tail P(Z > z) for z >= 0 as a literal SQL expression."""
    t = f"(1.0 / (1.0 + {AS_P} * {z}))"
    poly = (
        f"({t} * ({AS_B[0]} + {t} * ({AS_B[1]} + {t} * ({AS_B[2]}"
        f" + {t} * ({AS_B[3]} + {t} * {AS_B[4]})))))"
    )
    return f"(exp(-({z}) * ({z}) / 2.0) / sqrt(2.0 * pi()) * {poly})"


def normal_sf_col(az: Column) -> Column:
    """Upper-tail P(Z > az) for a NON-NEGATIVE Column (pass F.abs(z));
    term-by-term the same arithmetic as normal_sf_sql."""
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(AS_P) * az)
    poly = t * (
        F.lit(AS_B[0])
        + t
        * (
            F.lit(AS_B[1])
            + t * (F.lit(AS_B[2]) + t * (F.lit(AS_B[3]) + t * F.lit(AS_B[4])))
        )
    )
    return (
        F.exp(-az * az / F.lit(2.0)) / F.sqrt(F.lit(2.0) * F.lit(math.pi)) * poly
    )


def normal_sf_signed_sql(z: str) -> str:
    """Tail for ANY sign of z via sf(z) = 1 - sf(-z) — one identical
    branch expression in both engines (sampling.py's historical
    convention, shared here for new call sites)."""
    return (
        f"(CASE WHEN ({z}) >= 0 THEN {normal_sf_sql(f'({z})')} "
        f"ELSE 1.0 - {normal_sf_sql(f'(-({z}))')} END)"
    )
