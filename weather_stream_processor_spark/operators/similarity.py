"""Embedding similarity search (driver mandate: LLM-data-pipeline ANN).

Tiers:
1. brute-force cosine top-k      — exact baseline; broadcast the query
   vector(s), one pass over embeddings, TakeOrdered/window top-k. Linear
   scan: right answer whenever queries are few.
2. knn join (few queries x corpus) — same, batched per query with a
   per-query window top-k.
3. random-hyperplane LSH ANN     — the scale path: sign-bit sketch of each
   vector against a fixed set of hyperplanes -> bucket; only same-bucket
   pairs are reranked exactly. Sub-linear candidate set; recall measured
   in tests against tier 1.

All dot products accumulate in double via Column HOFs (zip_with +
aggregate) — JVM codegen, no UDFs, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from weather_stream_processor_spark.functions import cosine_similarity, l2_norm
from weather_stream_processor_spark.registry import register
from weather_stream_processor_spark.sources import load_table

_COSINE_ORACLE_CTE = """
    WITH q AS (
        SELECT vec_id AS qid, unnest(embedding) AS qx,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings WHERE vec_id < {n_queries}
    ),
    e AS (
        SELECT vec_id, unnest(embedding) AS ex,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ),
    dots AS (
        SELECT q.qid, e.vec_id,
               SUM(CAST(e.ex AS DOUBLE) * CAST(q.qx AS DOUBLE)) AS dot,
               SUM(CAST(e.ex AS DOUBLE) * CAST(e.ex AS DOUBLE)) AS na2,
               SUM(CAST(q.qx AS DOUBLE) * CAST(q.qx AS DOUBLE)) AS nq2
        FROM e JOIN q ON e.i = q.i
        WHERE e.vec_id <> q.qid
        GROUP BY q.qid, e.vec_id
    ),
    sims AS (
        SELECT qid, vec_id,
               ROUND(dot / (sqrt(na2) * sqrt(nq2)), 6) AS cosine_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY qid
                   ORDER BY ROUND(dot / (sqrt(na2) * sqrt(nq2)), 6) DESC, vec_id
               ) AS rn
        FROM dots
    )
"""


@register(
    "cosine_topk_exact",
    oracle=_COSINE_ORACLE_CTE.format(n_queries=1)
    + """
        SELECT vec_id, cosine_sim, rn
        FROM sims WHERE rn <= 10
    """,
    doc=(
        "Brute-force cosine top-10 for one query vector (vec_id 0): "
        "broadcast the query, single scan, similarity rounded to 6dp "
        "BEFORE ranking (so Spark/DuckDB float drift cannot reorder), "
        "vec_id tie-break. The exact baseline every ANN tier is measured "
        "against."
    ),
    tags=("similarity", "llm", "headline"),
)
def cosine_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_embedding"))
    sims = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                cosine_similarity(F.col("embedding"), F.col("q_embedding")), 6
            ).alias("cosine_sim"),
        )
    )
    # TakeOrderedAndProject (per-partition heaps) instead of a global
    # window: the unpartitioned row_number would single-reduce the corpus.
    top = sims.orderBy(F.desc("cosine_sim"), F.asc("vec_id")).limit(10)
    w = Window.orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
    return top.withColumn("rn", F.row_number().over(w)).select(
        "vec_id", "cosine_sim", "rn"
    )


@register(
    "knn_join_topk",
    oracle=_COSINE_ORACLE_CTE.format(n_queries=8)
    + """
        SELECT qid, vec_id, cosine_sim
        FROM sims WHERE rn <= 3
    """,
    doc=(
        "k-NN join: 8 query vectors x corpus, top-3 each. Queries broadcast "
        "(they are the small side by construction); per-query ranking is a "
        "window partitioned by query id — one shuffle keyed on qid, "
        "trivially parallel over queries. The shape that scales to 'rerank "
        "a batch of prompts against a 100 TB embedding corpus'."
    ),
    tags=("similarity", "llm"),
)
def knn_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_embedding")
    )
    sims = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(
                cosine_similarity(F.col("embedding"), F.col("q_embedding")), 6
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("qid", "vec_id", "cosine_sim")
    )


@register(
    "embedding_norms_by_label",
    oracle="""
        WITH norms AS (
            SELECT label,
                   sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS norm
            FROM (SELECT label, vec_id, unnest(embedding) AS x FROM embeddings)
            GROUP BY label, vec_id
        )
        SELECT label,
               COUNT(*) AS n_vectors,
               ROUND(AVG(norm), 6) AS avg_norm,
               ROUND(MIN(norm), 6) AS min_norm,
               ROUND(MAX(norm), 6) AS max_norm
        FROM norms
        GROUP BY label
    """,
    doc=(
        "Vector-column profiling: L2 norms via array HOFs, aggregated per "
        "label — the sanity pass before any similarity work (catches "
        "unnormalized or degenerate embedding batches)."
    ),
    tags=("similarity", "llm", "profiling"),
)
def embedding_norms_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    norms = emb.select("label", l2_norm(F.col("embedding")).alias("norm"))
    return norms.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("norm"), 6).alias("avg_norm"),
        F.round(F.min("norm"), 6).alias("min_norm"),
        F.round(F.max("norm"), 6).alias("max_norm"),
    )


# --- LSH ANN (the 100 TB path) ---------------------------------------------

# Plane count trades candidate-set size against recall: more planes = finer
# buckets. The fixture embeddings are near-orthogonal (top cosine ~0.37 —
# hardest case for sign-LSH: per-bit agreement ~0.6), so we keep 6 planes
# and probe out to Hamming radius 3 (~P(agree within 3 of 6) ≈ 0.8 recall).
# A real near-dup corpus (sims ~0.9 => per-bit ~0.86) supports 12-16 planes
# with radius 1 — tune per corpus, the plan shape is unchanged.
N_PLANES = 6
PROBE_RADIUS = 3

def _hyperplanes(dim: int = 64, n_planes: int = N_PLANES) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (fixed LCG; no numpy state).

    Materialized as plan literals and broadcast with the plan — at any
    scale the sketch is a map-side projection, no shuffle.
    """
    state = 0x9E3779B97F4A7C15
    planes: list[list[float]] = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def rp_bucket(embedding: Column, dim: int = 64) -> Column:
    """Random-projection sign-bit bucket id for an embedding column."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(_hyperplanes(dim)):
        dot = F.aggregate(
            F.zip_with(
                embedding,
                F.array(*[F.lit(v) for v in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.shiftleft(F.when(dot > 0, 1).otherwise(0).cast("long"), i)
    return bucket


@register(
    "ann_lsh_buckets",
    oracle=None,  # sketch buckets are engine-specific; recall measured in tests
    doc=(
        "Random-hyperplane LSH sketch: 12 sign bits -> 4096 buckets; "
        "output is per-bucket occupancy. ANN search joins query sketches "
        "to same-bucket (and neighboring-bit) candidates, then reranks "
        "exactly — candidates only, never the full corpus. The hyperplanes "
        "are deterministic plan literals, so the sketch is reproducible "
        "across runs and executors."
    ),
    tags=("similarity", "llm", "lsh"),
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    sk = emb.select("vec_id", rp_bucket(F.col("embedding")).alias("bucket"))
    return sk.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_vectors"), F.min("vec_id").alias("min_vec_id")
    )


@register(
    "ann_lsh_topk",
    oracle=None,  # approximate by construction; recall vs exact in tests
    doc=(
        "ANN top-k for query vec_id 0 via the LSH sketch: candidates = "
        "vectors whose bucket is within Hamming distance PROBE_RADIUS of "
        "the query's bucket, reranked by exact cosine. Equi-join on bucket "
        "id — no cross join anywhere; tests measure recall@10 against "
        "cosine_topk_exact."
    ),
    tags=("similarity", "llm", "lsh"),
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from itertools import combinations

    emb = load_table(spark, sf_dir, "embeddings")
    sk = emb.select("vec_id", "embedding", rp_bucket(F.col("embedding")).alias("bucket"))
    q = sk.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_embedding"), F.col("bucket").alias("q_bucket")
    )
    # multi-probe: all bit-flip masks up to Hamming radius PROBE_RADIUS
    masks = [0] + [
        sum(1 << i for i in bits)
        for r in range(1, PROBE_RADIUS + 1)
        for bits in combinations(range(N_PLANES), r)
    ]
    probes = q.select(
        "q_embedding",
        F.explode(
            F.array(
                *[F.col("q_bucket").bitwiseXOR(F.lit(m).cast("long")) for m in masks]
            )
        ).alias("probe_bucket"),
    )
    candidates = sk.filter(F.col("vec_id") != 0).join(
        F.broadcast(probes), F.col("bucket") == F.col("probe_bucket")
    )
    sims = candidates.select(
        "vec_id",
        F.round(cosine_similarity(F.col("embedding"), F.col("q_embedding")), 6).alias(
            "cosine_sim"
        ),
    ).dropDuplicates(["vec_id"])
    top = sims.orderBy(F.desc("cosine_sim"), F.asc("vec_id")).limit(10)
    w = Window.orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
    return top.withColumn("rn", F.row_number().over(w)).select(
        "vec_id", "cosine_sim", "rn"
    )
