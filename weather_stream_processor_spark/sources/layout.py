"""Storage layout management: date partitioning + join-key bucketing.

The fixture tables are single parquet files; at 100 TB the same tables are
laid out so the two dominant costs disappear before the query runs:

- **date partitioning** (`l_shipdate`/`o_orderdate`/`ts` date) — time-range
  predicates become directory pruning: the scan never opens files outside
  the range (PartitionFilters in the plan, `partitionCount` < total).
- **join-key bucketing** (lineitem/orders by orderkey, documents/embeddings
  by id) — both sides of a fact-fact equi-join are pre-hashed into the
  same bucket count, so the sort-merge join runs with NO Exchange on
  either side: the one-time write cost replaces a shuffle in *every*
  subsequent join.

These writers materialize that layout (tests do so on a temp dir and
assert the pruning/shuffle-elimination evidence in the physical plan);
``load_table`` keeps a single call site so pointing the engine at a
partitioned+bucketed warehouse is one change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame, path: str, ts_col: str, partition_col: str = "p_date"
) -> str:
    """Write parquet partitioned by the date of ``ts_col``.

    The derived partition column is ADDED (the original timestamp column
    is preserved for intra-day predicates); readers filter on
    ``partition_col`` for pruning and on ``ts_col`` for exactness.
    """
    out = df.withColumn(partition_col, F.to_date(F.col(ts_col)))
    out.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    return path


def write_bucketed_table(
    df: DataFrame,
    spark: SparkSession,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> str:
    """Register ``df`` as a bucketed+sorted managed table.

    Bucketed scans expose their hash partitioning to the planner; an
    equi-join of two tables bucketed on the join key with the same bucket
    count needs no Exchange (and with sortBy, no Sort) on either side.
    """
    import os
    import shutil

    # a previous session may have left the managed location behind after
    # the in-memory catalog forgot the table; clear both
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    loc = os.path.join(warehouse.removeprefix("file:"), table_name.lower())
    if loc and os.path.isdir(loc):
        shutil.rmtree(loc)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )
    return table_name
