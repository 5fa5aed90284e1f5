"""Distributed prefix sums — the shared scale-path for running totals.

A single cumulative window (``SUM() OVER (ORDER BY ...)`` with no — or a
corpus-growing — partition) funnels every row through ONE task's sort: the
canonical 100 TB skew killer the r6/r7 verdicts flagged in the packing
manifest, the curriculum ranks, and the session sweep line. This module
owns the two-phase replacement; it moved here from ``operators/infra_ops``
when the window/sessionization family became its third call-site family
(an ``operators -> plans`` import keeps the dependency graph layered).

Reference parity note: the reference engine (weather_processor.py /
weather_stream.py) has no counterpart — this is scale infrastructure for
the mandated extension surface (SURVEY.md §2.6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PS_SPAN = 1024  # rows per prefix-sum bucket (div-bucketing on an int key)


def _null_safe_equi_join(left: DataFrame, right: DataFrame, keys: list[str]) -> DataFrame:
    """Inner equi-join on ``keys`` that MATCHES NULL keys (``<=>``), then
    drops the right-side key copies — the ``join(on=[names])`` shape with
    SQL's NULL-drop surprise removed. A plain name-list join silently
    loses every row whose key is NULL; the naive window forms this module
    replaces KEEP such rows (NULL is an ordinary partition/order value to
    a window), so the join must too or the bit-equality contract breaks
    on NULL-keyed data (round-8 advice finding: ``curriculum_interleave_
    order`` partitions on a derived ``difficulty`` that is NULL when
    ``n_chars``/``text`` is NULL). ``<=>`` is still an equi-predicate —
    Spark plans the same hash/sort-merge join, no BNLJ regression.
    """
    renamed = right
    for k in keys:
        renamed = renamed.withColumnRenamed(k, f"__r_{k}")
    cond = None
    for k in keys:
        c = F.col(k).eqNullSafe(F.col(f"__r_{k}"))
        cond = c if cond is None else (cond & c)
    return left.join(renamed, cond).drop(*[f"__r_{k}" for k in keys])


def two_phase_exclusive_prefix(
    df: DataFrame,
    part_cols: list[str],
    bucket_col: str,
    order_cols: list[str],
    value_col: Column,
    out_col: str,
    span: int = PS_SPAN,
) -> DataFrame:
    """Distributed EXCLUSIVE prefix sum of ``value_col`` in ``order_cols``
    order within ``part_cols`` — the two-phase replacement for
    ``SUM() OVER (PARTITION BY part ORDER BY ord ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)``. A single cumulative window funnels every
    row of a partition through ONE task's sort (r6 verdict: at 100 TB a
    packing "source" holds billions of docs — the canonical skew killer);
    this form keeps every window group at every level under ``span`` rows.

    ``bucket_col`` must be a NON-NEGATIVE integer column already on
    ``df`` that is a MONOTONE coarsening of the order (bucket(a) <
    bucket(b) implies key(a) < key(b) within a partition — e.g.
    ``doc_id div span`` for order (doc_id), or ``epoch_day(at)`` for
    order (at, ...)). Correctness holds for ANY such bucketing (gaps and
    uneven fill included — offsets are summed, never assumed dense); the
    ≤span BALANCE guarantee additionally needs each bucket's row count
    bounded (unique primary order key with div-bucketing, or a bucket
    that is itself a bounded slice such as one calendar day of marks) —
    duplicated order keys all land in one bucket and re-concentrate
    there. NULL partition/bucket keys are first-class: aggregates and
    windows already group them, and the offset re-attach joins use
    null-safe equality, so the result stays bit-identical to the naive
    window form (which keeps NULL-keyed rows) on ANY input.
    Because bucketing is a pure function of the DATA — no sampled range
    boundaries, no spark_partition_id — re-evaluated plan branches can
    never disagree, and the result is bit-identical to the single-window
    form under ANY physical partitioning.

    Levels (all balanced hash aggregates / bounded windows):
      1. per-(part, bucket) sums        — groupBy, map-side combined;
      2. per-(part, super) sums          with super = bucket div span;
      3. residual per-part window over SUPERS — corpus/span^2 rows per
         part (1 B docs -> ~1 k supers; recurse with a third div level
         if a single stream ever exceeds span^3 = 1e9 buckets);
      4. bucket offsets: a window over (part, super) groups (≤span rows);
      5. row residuals: a window over (part, bucket) groups (≤span keys).
    """
    bsum = df.groupBy(*part_cols, bucket_col).agg(
        F.sum(value_col).alias("_bsum")
    )
    bsum = bsum.withColumn("_sb", F.expr(f"{bucket_col} div {span}"))
    ssum = bsum.groupBy(*part_cols, "_sb").agg(F.sum("_bsum").alias("_ssum"))
    w_s = (
        Window.partitionBy(*part_cols)
        .orderBy("_sb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    soff = ssum.select(
        *part_cols,
        "_sb",
        F.coalesce(F.sum("_ssum").over(w_s), F.lit(0)).alias("_soff"),
    )
    w_b = (
        Window.partitionBy(*part_cols, "_sb")
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boff = _null_safe_equi_join(bsum, soff, [*part_cols, "_sb"]).select(
        *part_cols,
        bucket_col,
        (
            F.col("_soff") + F.coalesce(F.sum("_bsum").over(w_b), F.lit(0))
        ).alias("_boff"),
    )
    w_r = (
        Window.partitionBy(*part_cols, bucket_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        _null_safe_equi_join(df, boff, [*part_cols, bucket_col])
        .withColumn(
            out_col,
            (
                F.col("_boff") + F.coalesce(F.sum(value_col).over(w_r), F.lit(0))
            ).cast("bigint"),
        )
        .drop("_boff")
    )
