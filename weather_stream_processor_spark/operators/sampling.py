"""Deterministic sampling operators (training-data pipeline surface).

A 100 TB training-data pipeline samples constantly — to downweight
over-represented sources, to carve eval splits, to cap per-domain volume.
Two properties matter at scale and neither comes from `df.sample()`:

1. **Determinism / reproducibility** — membership must be a pure function
   of the row key, not of partition layout or RNG seeds, so a re-run (or a
   different engine) selects the identical rows and splits stay disjoint.
2. **No coordination** — the decision is per-row map-side; no shuffle, no
   global count, no driver involvement.

Both operators key membership on a multiplicative integer hash of the row
id (Knuth's 2654435761, top bits taken via a 16-bit shift). In production
you would use `pmod(xxhash64(key), 1000)` — same plan shape, stronger
mixing — but xxhash64 is engine-specific, and the oracle gate runs the
exact same arithmetic in DuckDB, so the registered form uses the
cross-engine-checkable hash. The sampling *mechanism* (hash -> bucket ->
per-stratum threshold) is identical either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_stream_processor_spark.registry import register
from weather_stream_processor_spark.sources import load_table

# bucket(doc_id) in [0, 1000): deterministic, engine-independent
_BUCKETS = 1000
_KNUTH = 2654435761


def _bucket(col: Column) -> Column:
    return F.shiftright(col * F.lit(_KNUTH), 16) % _BUCKETS


_BUCKET_SQL = f"((doc_id * {_KNUTH}) >> 16) % {_BUCKETS}"


@register(
    "deterministic_hash_sample",
    oracle=f"""
        SELECT doc_id, lang, {_BUCKET_SQL} AS bucket
        FROM documents
        WHERE {_BUCKET_SQL} < 50
    """,
    doc=(
        "5% deterministic sample of the corpus: keep rows whose hash "
        "bucket < 50/1000. Pure map-side predicate on the key — no "
        "shuffle, no RNG state, reproducible across engines and re-runs "
        "(df.sample() is seed- and partition-layout-dependent, so it is "
        "NOT replayable under repartitioning). Disjoint splits fall out "
        "for free: train = bucket >= 50, eval = bucket < 50."
    ),
    tags=("sampling", "llm", "deterministic"),
)
def deterministic_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"))
    return docs.select("doc_id", "lang", b.alias("bucket")).filter(F.col("bucket") < 50)


# per-language keep rates (per mille): downsample the dominant language,
# keep half of everything else — the classic mixture-rebalancing shape
_RATES = {"en": 100, "zh": 500, "es": 500, "de": 500, "fr": 500}


@register(
    "stratified_sample_mixture",
    oracle=f"""
        WITH b AS (
            SELECT doc_id, lang, {_BUCKET_SQL} AS bucket FROM documents
        )
        SELECT doc_id, lang FROM b
        WHERE bucket < CASE lang
            WHEN 'en' THEN 100 WHEN 'zh' THEN 500 WHEN 'es' THEN 500
            WHEN 'de' THEN 500 WHEN 'fr' THEN 500 ELSE 0 END
    """,
    doc=(
        "Stratified mixture sampling: per-language keep rates (en 10%, "
        "others 50%) applied via the same deterministic hash bucket — the "
        "rebalancing step of a training-data mixture. Still a pure "
        "map-side predicate (the rate table folds into the row predicate; "
        "at scale a rate *table* joins in as a broadcast). Contrast "
        "df.sampleBy(), which is RNG-based and non-replayable."
    ),
    tags=("sampling", "llm", "stratified"),
)
def stratified_sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(0)
    for lang, permille in _RATES.items():
        rate = F.when(F.col("lang") == lang, permille).otherwise(rate)
    return (
        docs.select("doc_id", "lang", _bucket(F.col("doc_id")).alias("bucket"), rate.alias("rate"))
        .filter(F.col("bucket") < F.col("rate"))
        .select("doc_id", "lang")
    )
