"""Format IO beyond parquet: CSV and JSON-lines read/write, plus
date-partitioned parquet — the interchange surface a pipeline needs at
its edges (vendor drops arrive as CSV/JSONL; curated tables leave as
partitioned parquet).

Rules enforced here, because at 100 TB each one is a real incident:

- **Schemas are mandatory on read.** Schema inference is a full extra
  pass over the data AND type-unstable across samples (a column of "1",
  "2", "x" flips type depending on which files the sampler saw). Every
  reader takes an explicit DDL/StructType.
- **Malformed rows are quarantined, not dropped.** CSV/JSON readers run
  PERMISSIVE with ``columnNameOfCorruptRecord`` so bad lines land in a
  ``_corrupt_record`` column the caller can route to a dead-letter sink —
  the batch twin of the streaming parser's dead-letter path
  (streaming/pipeline.py parse_weather_wire).
- **Partitioned writes partition on low-cardinality derived keys** (e.g.
  a date column), never raw timestamps (one directory per microsecond),
  and readers prune on the partition column (asserted in tests via the
  scan's partition filters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"


def _reader(spark: SparkSession, fmt: str, schema, options: dict | None):
    if schema is None:
        raise ValueError(
            f"{fmt} read requires an explicit schema: inference costs a "
            "full extra pass and is type-unstable across file samples"
        )
    r = spark.read.format(fmt).schema(schema)
    for k, v in (options or {}).items():
        r = r.option(k, v)
    return r


def read_csv(
    spark: SparkSession,
    path: str,
    schema,
    header: bool = True,
    options: dict | None = None,
) -> DataFrame:
    """Schema-enforced CSV read; malformed rows land in _corrupt_record."""
    opts = {
        "header": str(header).lower(),
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
        **(options or {}),
    }
    return _reader(spark, "csv", schema, opts).load(path)


def read_jsonl(
    spark: SparkSession, path: str, schema, options: dict | None = None
) -> DataFrame:
    """Schema-enforced JSON-lines read; malformed rows -> _corrupt_record."""
    opts = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": CORRUPT_COL,
        **(options or {}),
    }
    return _reader(spark, "json", schema, opts).load(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    """CSV export. Executor-parallel (one file per partition); coalesce
    upstream only when a single file is a hard requirement — a driver-side
    single-file write is the anti-pattern."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(
    spark: SparkSession, path: str, schema, options: dict | None = None
) -> DataFrame:
    """Schema-enforced ORC read (columnar like parquet: pushdown and
    pruning apply; the schema argument guards against silent drift between
    writer versions rather than paying an inference pass)."""
    return _reader(spark, "orc", schema, options).load(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet: one directory level per partition
    column. Partition columns must be low-cardinality (dates, langs,
    sources) — a timestamp-partitioned table is a small-files factory.
    Readers filtering on a partition column prune directories before any
    IO (PartitionFilters in the scan, asserted in tests)."""
    if not partition_cols:
        raise ValueError("use df.write.parquet for unpartitioned writes")
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_parquet_merged_schema(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet generations whose schema EVOLVED (columns added over
    the table's lifetime) as one DataFrame.

    ``mergeSchema`` unions the footer schemas across all inputs; rows from
    older generations surface the newer columns as nulls — the lakehouse
    additive-evolution contract (column ADDS are safe; renames/retypes are
    rewrites, not evolution, and fail loudly here as incompatible types).
    Cost note: schema merging reads every file footer up front, so at
    100 TB pin the merged schema in the catalog once per generation rather
    than paying footer discovery per query; the per-row read path is
    unchanged either way (parquet is columnar — absent columns cost
    nothing to "read").
    """
    return spark.read.option("mergeSchema", "true").parquet(*paths)
