"""Cross-operator reports: the dedup CASCADE every production corpus
pipeline actually runs, as one auditable table.

Imported LAST by ``operators/__init__`` so it can reuse the already-
registered tier operators (builders AND their oracle SQL verbatim —
each registered oracle is a complete SELECT, legal as a derived table
with its own WITH chain in DuckDB, so the cascade oracle composes the
exact per-tier semantics instead of re-deriving them)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_stream_processor_spark.registry import _REGISTRY, register
from weather_stream_processor_spark.sources import load_table

# tier order is cost order — each tier only pays for what cheaper tiers
# missed; the report's n_new column IS the marginal value of each tier
_CASCADE_TIERS = (
    ("exact_sha256", None),  # tier 1 is inlined (digest grouping)
    ("jaccard_0.8", "ngram_jaccard_pairs"),
    ("simhash_h3", "simhash_hamming_near_dup"),
    ("embedding_cosine", "embedding_cosine_near_dup"),
)


def _cascade_oracle() -> str:
    jac = _REGISTRY["ngram_jaccard_pairs"].oracle
    sim = _REGISTRY["simhash_hamming_near_dup"].oracle
    emb = _REGISTRY["embedding_cosine_near_dup"].oracle
    return f"""
        WITH digs AS (
            SELECT doc_id, sha256(text) AS dig FROM documents
        ),
        f1 AS (
            SELECT doc_id FROM (
                SELECT doc_id, MIN(doc_id) OVER (PARTITION BY dig) AS keeper
                FROM digs
            ) WHERE doc_id <> keeper
        ),
        f2 AS (SELECT DISTINCT doc_b AS doc_id FROM ({jac})),
        f3 AS (SELECT DISTINCT doc_b AS doc_id FROM ({sim})),
        f4 AS (SELECT DISTINCT vec_id_b AS doc_id FROM ({emb})),
        flags AS (
            SELECT doc_id, 1 AS tier_rank FROM f1
            UNION ALL SELECT doc_id, 2 FROM f2
            UNION ALL SELECT doc_id, 3 FROM f3
            UNION ALL SELECT doc_id, 4 FROM f4
        ),
        firsts AS (
            SELECT doc_id, MIN(tier_rank) AS first_tier FROM flags
            GROUP BY doc_id
        ),
        news AS (
            SELECT first_tier AS tier_rank, CAST(COUNT(*) AS BIGINT) AS n_new
            FROM firsts GROUP BY first_tier
        ),
        own AS (
            SELECT tier_rank, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_flagged
            FROM flags GROUP BY tier_rank
        ),
        n_docs AS (SELECT COUNT(*) AS n FROM documents),
        tiers(tier_rank, tier) AS (VALUES
            (1, 'exact_sha256'), (2, 'jaccard_0.8'),
            (3, 'simhash_h3'), (4, 'embedding_cosine'))
        SELECT t.tier_rank, t.tier,
               COALESCE(o.n_flagged, 0) AS n_flagged,
               COALESCE(w.n_new, 0) AS n_new,
               CAST(SUM(COALESCE(w.n_new, 0)) OVER (
                   ORDER BY t.tier_rank
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_flagged,
               ROUND(SUM(COALESCE(w.n_new, 0)) OVER (
                   ORDER BY t.tier_rank
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) * 1.0 / ANY_VALUE(d.n) OVER (), 6) AS corpus_frac
        FROM tiers t
        LEFT JOIN own o USING (tier_rank)
        LEFT JOIN news w USING (tier_rank)
        CROSS JOIN n_docs d
    """


@register(
    "dedup_cascade_report",
    oracle=_cascade_oracle(),
    doc=(
        "DEDUP CASCADE REPORT: the four near-dup tiers this engine ships "
        "— exact sha-256, word-3-gram Jaccard >= 0.8, SimHash Hamming "
        "<= 3, embedding cosine — run as the cost-ordered cascade a "
        "production corpus pipeline actually deploys, with each tier's "
        "own flag count, its MARGINAL catch (docs no cheaper tier "
        "already flagged — the column that justifies or kills a tier's "
        "compute budget), the cumulative removal, and the corpus "
        "fraction. Flag rule is uniform and deterministic: a doc is "
        "flagged by a tier iff it is the larger id of at least one of "
        "that tier's pairs (min-id survivor convention, matching "
        "near_dup_keep_list). Plan: each tier reuses its registered "
        "operator's execution verbatim (banded/blocked joins, never "
        "all-pairs); flag sets are doc_id-only unions aggregated to a "
        "4-row report — the report layer adds one flags-keyed "
        "aggregate on top of the tiers, nothing corpus-sized. The "
        "oracle embeds the tier operators' registered oracle SQL as "
        "derived tables, so the cascade is hash-verified against the "
        "same per-tier semantics the driver already checks "
        "individually."
    ),
    tags=("dedup", "llm", "report", "headline"),
)
def dedup_cascade_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    digs = docs.select("doc_id", F.sha2("text", 256).alias("dig"))
    keeper = F.min("doc_id").over(Window.partitionBy("dig"))
    f1 = (
        digs.select("doc_id", keeper.alias("keeper"))
        .filter(F.col("doc_id") != F.col("keeper"))
        .select("doc_id")
    )
    f2 = (
        _REGISTRY["ngram_jaccard_pairs"]
        .builder(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    f3 = (
        _REGISTRY["simhash_hamming_near_dup"]
        .builder(spark, sf_dir)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    f4 = (
        _REGISTRY["embedding_cosine_near_dup"]
        .builder(spark, sf_dir)
        .select(F.col("vec_id_b").alias("doc_id"))
        .distinct()
    )
    flags = None
    for rank, df in ((1, f1), (2, f2), (3, f3), (4, f4)):
        part = df.select("doc_id", F.lit(rank).alias("tier_rank"))
        flags = part if flags is None else flags.unionAll(part)

    firsts = flags.groupBy("doc_id").agg(F.min("tier_rank").alias("first_tier"))
    news = firsts.groupBy(F.col("first_tier").alias("tier_rank")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new")
    )
    own = flags.groupBy("tier_rank").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_flagged")
    )
    n_docs = docs.count()  # 1-row driver scalar, bounded

    tiers = spark.createDataFrame(
        [(rank + 1, name) for rank, (name, _) in enumerate(_CASCADE_TIERS)],
        "tier_rank int, tier string",
    )
    w = (
        Window.orderBy("tier_rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tiers.join(own, "tier_rank", "left")
        .join(news, "tier_rank", "left")
        .select(
            "tier_rank",
            "tier",
            F.coalesce("n_flagged", F.lit(0)).cast("bigint").alias("n_flagged"),
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
            # 4-row frame: the unpartitioned window is bounded by the
            # tier count, not the corpus
            F.sum(F.coalesce("n_new", F.lit(0))).over(w).cast("bigint").alias(
                "cum_flagged"
            ),
            F.round(
                F.sum(F.coalesce("n_new", F.lit(0))).over(w) / F.lit(float(n_docs)),
                6,
            ).alias("corpus_frac"),
        )
    )


_KANON_K = 5  # minimum anonymity-set size (the classic k in k-anonymity)
_KANON_LEN_BUCKET = 100  # chars per length bucket (quasi-identifier 3)


@register(
    "k_anonymity_audit",
    oracle=f"""
        WITH combos AS (
            SELECT lang, source,
                   CAST(FLOOR(n_chars / {_KANON_LEN_BUCKET}) AS BIGINT)
                       AS len_bucket,
                   CAST(COUNT(*) AS BIGINT) AS anonymity_set
            FROM documents
            GROUP BY 1, 2, 3
        ),
        tot AS (SELECT SUM(anonymity_set) AS n FROM combos)
        SELECT lang, source, len_bucket, anonymity_set,
               CAST(anonymity_set < {_KANON_K} AS INT) AS at_risk,
               ROUND(anonymity_set * 1.0 / tot.n, 6) AS doc_share
        FROM combos CROSS JOIN tot
    """,
    doc=(
        f"K-ANONYMITY AUDIT over the release-metadata quasi-identifiers "
        f"(lang, source, {_KANON_LEN_BUCKET}-char length bucket): the "
        "anonymity set of each combination — how many documents share "
        f"it — with combos below k={_KANON_K} flagged, the privacy "
        "screen run before publishing a corpus WITH its provenance "
        "metadata (Sweeney's k-anonymity: a document unique in its "
        "quasi-identifier combo is re-identifiable from metadata alone "
        "even with the text redacted; pii_scrub removes identifiers IN "
        "the text, this catches identification BY the catalog row). "
        "Plan: one scan, one hash aggregate on the quasi-identifier "
        "tuple — partial map-side combine, output bounded by the "
        "attribute-domain product (|langs| x |sources| x buckets), a "
        "1-row total broadcast for the share column. At 100 TB this is "
        "the cheapest query in the audit family; generalization ladders "
        "(coarsen buckets until min anonymity_set >= k) just re-run it "
        "with a different bucket width."
    ),
    tags=("audit", "llm", "privacy", "curation"),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    combos = (
        docs.groupBy(
            "lang",
            "source",
            F.floor(F.col("n_chars") / _KANON_LEN_BUCKET)
            .cast("bigint")
            .alias("len_bucket"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("anonymity_set"))
    )
    tot = combos.agg(F.sum("anonymity_set").alias("n"))
    return combos.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "len_bucket",
        "anonymity_set",
        (F.col("anonymity_set") < _KANON_K).cast("int").alias("at_risk"),
        F.round(F.col("anonymity_set") / F.col("n"), 6).alias("doc_share"),
    )
