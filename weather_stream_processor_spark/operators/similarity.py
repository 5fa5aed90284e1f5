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

from weather_stream_processor_spark.functions import dot, l2_norm
from weather_stream_processor_spark.plans.caching import truncate_lineage
from weather_stream_processor_spark.registry import register
from weather_stream_processor_spark.sources import load_table, spread


def _with_norm(emb: DataFrame) -> DataFrame:
    """(vec_id, embedding, nrm) with the L2 norm computed ONCE per row.

    Array HOFs run interpreted, so ``cosine_similarity`` inside a pairwise
    join would traverse each array three times per PAIR; hoisting the norm
    makes it one traversal per pair (the dot) plus one per row. Bit-identical
    values — ``dot/(nrm_a*nrm_b)`` is the same arithmetic, just cached.
    ``spread`` first: a single-file parquet scan is one task, and the
    per-pair HOF work downstream is the expensive part to balance.
    """
    return spread(emb, "vec_id").select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("nrm")
    )


def _pair_cosine(prefix_a: str = "", query_cols: tuple[str, str] = ("q_embedding", "q_nrm")) -> Column:
    q_emb, q_nrm = query_cols
    return dot(F.col(prefix_a + "embedding"), F.col(q_emb)) / (
        F.col(prefix_a + "nrm") * F.col(q_nrm)
    )

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
def cosine_topk_exact(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    # ``k`` beyond the registered top-10: tools/ann_quality.py requests a
    # deeper list at the replica scale point so the clone-group-aware
    # recall has >=10 DISTINCT canonical originals to measure against
    # (at 10x replication the raw top-10 is ~one clone group)
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_embedding"), F.col("nrm").alias("q_nrm")
    )
    sims = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(_pair_cosine(), 6).alias("cosine_sim"),
        )
    )
    # TakeOrderedAndProject (per-partition heaps) instead of a global
    # window: the unpartitioned row_number would single-reduce the corpus.
    top = sims.orderBy(F.desc("cosine_sim"), F.asc("vec_id")).limit(k)
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
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_embedding"),
        F.col("nrm").alias("q_nrm"),
    )
    sims = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(_pair_cosine(), 6).alias("cosine_sim"),
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

# Multi-table sign-LSH (the E2LSH architecture): L independent tables of
# b sign bits each; a query probes every bucket within Hamming radius r in
# EVERY table and the candidate set is the union. Recall compounds across
# tables — with per-bit agreement p the single-table hit rate is
# P1 = sum_{i<=r} C(b,i) p^(b-i) (1-p)^i and L tables give 1-(1-P1)^L —
# while candidate cost grows only additively. The fixture embeddings are
# near-orthogonal (top cosine ~0.37 => per-bit agreement ~0.6, sign-LSH's
# hardest case): b=6, r=2 gives P1~0.54 and L=4 tables lift recall@10 to
# ~0.96 expected (measured in ANN_QUALITY.json, alongside the candidate
# fraction that pays for it). CANDIDATE-FRACTION CAVEAT (measured at two
# scale points in ANN_QUALITY.json): on THIS near-orthogonal fixture the
# union of 4 tables at radius 2 admits ~0.79 of the corpus at 500 vectors
# and ~0.82 at 20k (10x replica) — the fraction is a property of the
# per-bit agreement distribution, so it neither decays nor explodes with
# corpus size, but at >0.5 the LSH tier is no cheaper than the exact scan
# HERE. That is the fixture being adversarial, not the operator: a real
# near-dup corpus (sims ~0.9 => per-bit ~0.86) supports 12-16 planes with
# r<=1 and a near-zero candidate fraction — tune (b, r, L) per corpus
# (more planes/lower radius as intra-corpus similarity rises), the plan
# shape is unchanged. Deployments should gate the tier on a measured
# candidate fraction << 1; below that the exact blocked scan wins.
N_PLANES = 6
PROBE_RADIUS = 2
N_TABLES = 4

def _planes_values_sql() -> str:
    """The hyperplane bank as a DuckDB VALUES list (table_id, plane_idx,
    i, w) — the planes are deterministic plan literals, so the ORACLE can
    rebuild the identical sketch and the driver hash-checks the LSH
    operators instead of settling for rows-only."""
    rows = []
    for t in range(N_TABLES):
        for pidx, plane in enumerate(_hyperplanes(table=t)):
            for i, w in enumerate(plane, start=1):
                rows.append(f"({t},{pidx},{i},{w!r})")
    return ",".join(rows)


def _lsh_buckets_cte() -> str:
    """Shared oracle CTEs: per-(vec, table) sign-bit bucket ids."""
    return f"""
        WITH planes(table_id, plane_idx, i, w) AS (VALUES {_planes_values_sql()}),
        e AS (
            SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        ),
        dots AS (
            SELECT e.vec_id, p.table_id, p.plane_idx, SUM(e.x * p.w) AS dot
            FROM e JOIN planes p USING (i)
            GROUP BY e.vec_id, p.table_id, p.plane_idx
        ),
        buckets AS (
            SELECT vec_id, table_id,
                   CAST(SUM(CASE WHEN dot > 0 THEN 1 << plane_idx ELSE 0 END)
                        AS BIGINT) AS bucket
            FROM dots GROUP BY vec_id, table_id
        )
    """


def _hyperplanes(
    dim: int = 64, n_planes: int = N_PLANES, table: int = 0
) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (fixed LCG; no numpy state),
    independently seeded per LSH table.

    Materialized as plan literals and broadcast with the plan — at any
    scale the sketch is a map-side projection, no shuffle.
    """
    state = (0x9E3779B97F4A7C15 ^ (table * 0xBF58476D1CE4E5B9)) % (1 << 64) or 1
    planes: list[list[float]] = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 11) / float(1 << 53)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def rp_bucket(embedding: Column, dim: int = 64, table: int = 0) -> Column:
    """Random-projection sign-bit bucket id for an embedding column, using
    LSH table ``table``'s hyperplanes."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(_hyperplanes(dim, table=table)):
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
    # the deterministic plane literals let DuckDB rebuild the sketch
    # bit-for-bit, so the occupancy table is HASH-checked, not rows-only
    oracle=_lsh_buckets_cte()
    + """
        SELECT table_id, bucket, CAST(COUNT(*) AS BIGINT) AS n_vectors,
               MIN(vec_id) AS min_vec_id
        FROM buckets GROUP BY table_id, bucket
    """,
    doc=(
        "Random-hyperplane LSH sketch, multi-table: N_TABLES independent "
        "tables of N_PLANES sign bits each; output is per-(table, bucket) "
        "occupancy. ANN search joins query sketches to same-bucket (and "
        "neighboring-bit) candidates in every table and unions them, then "
        "reranks exactly — candidates only, never the full corpus. The "
        "hyperplanes are deterministic plan literals, so the sketch is "
        "reproducible across runs and executors."
    ),
    tags=("similarity", "llm", "lsh"),
)
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    sk = emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table_id"),
                        rp_bucket(F.col("embedding"), table=t).alias("bucket"),
                    )
                    for t in range(N_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "tb.table_id", "tb.bucket")
    return sk.groupBy("table_id", "bucket").agg(
        F.count(F.lit(1)).alias("n_vectors"), F.min("vec_id").alias("min_vec_id")
    )


@register(
    "ann_lsh_topk",
    # approximate by construction, but DETERMINISTICALLY approximate: the
    # oracle replays the identical multi-table sketch (literal planes),
    # Hamming-radius probe (xor + bit_count) and exact rerank, so even
    # the ANN result is hash-checked against an independent engine
    oracle=_lsh_buckets_cte()
    + f"""
        ,
        qb AS (SELECT table_id, bucket AS q_bucket FROM buckets WHERE vec_id = 0),
        cand AS (
            SELECT DISTINCT b.vec_id
            FROM buckets b JOIN qb ON b.table_id = qb.table_id
            WHERE b.vec_id <> 0
              AND bit_count(xor(b.bucket, qb.q_bucket)) <= {PROBE_RADIUS}
        ),
        norms AS (SELECT vec_id, SUM(x * x) AS n2 FROM e GROUP BY vec_id),
        qe AS (SELECT i, x AS qx FROM e WHERE vec_id = 0),
        sims AS (
            SELECT e.vec_id,
                   ROUND(SUM(e.x * qe.qx)
                         / (sqrt(MAX(n.n2))
                            * sqrt((SELECT n2 FROM norms WHERE vec_id = 0))),
                         6) AS cosine_sim
            FROM e
            JOIN qe USING (i)
            JOIN cand c ON c.vec_id = e.vec_id
            JOIN norms n ON n.vec_id = e.vec_id
            GROUP BY e.vec_id
        ),
        ranked AS (
            SELECT vec_id, cosine_sim,
                   ROW_NUMBER() OVER (ORDER BY cosine_sim DESC, vec_id) AS rn
            FROM sims
        )
        SELECT vec_id, cosine_sim, rn FROM ranked WHERE rn <= 10
    """,
    doc=(
        "ANN top-k for query vec_id 0 via the multi-table LSH sketch: "
        "candidates = union over all N_TABLES tables of vectors whose "
        "bucket is within Hamming distance PROBE_RADIUS of the query's "
        "bucket in that table, deduped and reranked by exact cosine. One "
        "equi-join on (table_id, bucket) — no cross join anywhere; "
        "tools/ann_quality.py records recall@10 against cosine_topk_exact "
        "and the candidate fraction the union scanned."
    ),
    tags=("similarity", "llm", "lsh"),
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    # ``k``: see cosine_topk_exact — deeper lists for replica-scale recall
    sims = _lsh_candidate_sims(spark, sf_dir)
    top = sims.orderBy(F.desc("cosine_sim"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
    return top.withColumn("rn", F.row_number().over(w)).select(
        "vec_id", "cosine_sim", "rn"
    )


def _lsh_candidate_sims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduped (vec_id, cosine_sim) over the multi-table LSH candidate
    union for query vec_id 0 — shared by ann_lsh_topk and the quality
    tool's candidate-fraction measurement."""
    from itertools import combinations

    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    sk = emb.select(
        "vec_id",
        "embedding",
        "nrm",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table_id"),
                        rp_bucket(F.col("embedding"), table=t).alias("bucket"),
                    )
                    for t in range(N_TABLES)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "embedding", "nrm", "tb.table_id", "tb.bucket")
    q = sk.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_embedding"),
        F.col("nrm").alias("q_nrm"),
        F.col("table_id").alias("q_table_id"),
        F.col("bucket").alias("q_bucket"),
    )
    # multi-probe: all bit-flip masks up to Hamming radius PROBE_RADIUS,
    # applied within each table
    masks = [0] + [
        sum(1 << i for i in bits)
        for r in range(1, PROBE_RADIUS + 1)
        for bits in combinations(range(N_PLANES), r)
    ]
    probes = q.select(
        "q_embedding",
        "q_nrm",
        "q_table_id",
        F.explode(
            F.array(
                *[F.col("q_bucket").bitwiseXOR(F.lit(m).cast("long")) for m in masks]
            )
        ).alias("probe_bucket"),
    )
    candidates = sk.filter(F.col("vec_id") != 0).join(
        F.broadcast(probes),
        (F.col("bucket") == F.col("probe_bucket"))
        & (F.col("table_id") == F.col("q_table_id")),
    )
    return candidates.select(
        "vec_id",
        F.round(_pair_cosine(), 6).alias("cosine_sim"),
    ).dropDuplicates(["vec_id"])


# --- embedding-cosine near-dup + IVF ANN (vectorized scale paths) -----------

NEAR_DUP_COSINE = 0.35  # fixture embeddings are near-orthogonal (max pairwise
# cosine ~0.51); a real near-dup corpus would use ~0.95. Same plan either way.


@register(
    "embedding_cosine_near_dup",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        ),
        pairs AS (
            SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
                   SUM(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS dot,
                   SQRT(SUM(CAST(a.x AS DOUBLE) * CAST(a.x AS DOUBLE))) AS na,
                   SQRT(SUM(CAST(b.x AS DOUBLE) * CAST(b.x AS DOUBLE))) AS nb
            FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
            GROUP BY 1, 2
        )
        SELECT vec_id_a, vec_id_b,
               ROUND(dot / (na * nb), 6) AS cosine_sim
        FROM pairs
        WHERE ROUND(dot / (na * nb), 6) >= {NEAR_DUP_COSINE}
    """,
    doc=(
        "Embedding-cosine near-duplicate detection (dedup family, mandate "
        "row 'embedding-cosine near-dup'): all unordered pairs with cosine "
        ">= threshold, float64 raw-dot / (norm_a * norm_b) rounded to 6dp "
        "before the threshold test — arithmetic mirrors the oracle "
        "exactly. Delegates to the block-grid execution "
        "(embedding_near_dup_blocked): NO driver-side corpus collect, no "
        "side need fit in any single memory; per-cell working set is 2/B "
        "of the corpus. A broadcast small-corpus utility "
        "(embedding_near_dup_broadcast, unregistered, hard row-cap) exists "
        "for sub-driver-memory corpora; the production fast path is LSH/"
        "banding candidates (ann_lsh_buckets) feeding the GEMM."
    ),
    tags=("dedup", "similarity", "llm", "pandas-udf"),
)
def embedding_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_near_dup_blocked(spark, sf_dir)


# Hard cap for the driver-side broadcast utility below. Above this the
# corpus does NOT belong in driver memory — use embedding_near_dup_blocked.
BROADCAST_CORPUS_MAX_ROWS = 100_000


def embedding_near_dup_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-corpus near-dup via driver-collected broadcast GEMM.

    DELIBERATELY UNREGISTERED: this MATERIALIZES THE WHOLE CORPUS ON THE
    DRIVER (``emb.collect()``) before broadcasting it to executors, so it
    is only safe when the embedding table fits in driver memory. It
    refuses to run above BROADCAST_CORPUS_MAX_ROWS; the scale path is
    ``embedding_near_dup_blocked`` (identical output, no collect).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    if n > BROADCAST_CORPUS_MAX_ROWS:
        raise ValueError(
            f"corpus has {n} rows > {BROADCAST_CORPUS_MAX_ROWS}; "
            "use embedding_near_dup_blocked (no driver collect) instead"
        )
    rows = emb.collect()  # driver-side materialization — guarded above
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    out_schema = StructType(
        [
            StructField("vec_id_a", LongType()),
            StructField("vec_id_b", LongType()),
            StructField("cosine_sim", DoubleType()),
        ]
    )

    def gemm_blocks(batches):
        g_ids, g_mat, g_norms = bc.value
        for pdf in batches:
            a_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            a_mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
            sims = np.round(
                (a_mat @ g_mat.T) / np.outer(a_norms, g_norms), 6
            )
            ai, gi = np.nonzero(
                (sims >= NEAR_DUP_COSINE) & (a_ids[:, None] < g_ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "vec_id_a": a_ids[ai],
                    "vec_id_b": g_ids[gi],
                    "cosine_sim": sims[ai, gi],
                }
            )

    return spread(emb, "vec_id").mapInPandas(gemm_blocks, schema=out_schema)


# IVF coarse quantization: K "centroids" partition the corpus into cells;
# a query probes only its NPROBE nearest cells and reranks those exactly.
# Centroids here are a deterministic sample (first K vectors) — production
# would k-means-train them; every plan shape below is unchanged by that.
IVF_K = 32
IVF_NPROBE = 4


def _ivf_assign_ctes(k: int) -> str:
    """The shared IVF index-build CTEs (exploded vectors, centroid set,
    rounded assignment cosines, argmax cell per vector) — reused by the
    top-k oracle and the cell-balance audit."""
    return f"""e AS (
            SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        ),
        c AS (SELECT vec_id AS cid, i, x FROM e WHERE vec_id < {k}),
        ac AS (
            SELECT e.vec_id, c.cid,
                   ROUND(SUM(e.x * c.x)
                         / (SQRT(SUM(e.x * e.x)) * SQRT(SUM(c.x * c.x))),
                         6) AS cos
            FROM e JOIN c USING (i)
            GROUP BY e.vec_id, c.cid
        ),
        cells AS (
            SELECT vec_id, cid AS cell FROM (
                SELECT vec_id, cid,
                       ROW_NUMBER() OVER (
                           PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
                FROM ac) WHERE rn = 1
        )"""


def _ivf_oracle(k: int, nprobe: int) -> str:
    """IVF replayed in SQL: the cell assignment, the query's probe set, and
    the rerank are all deterministic once assignment cosines are rounded to
    6dp (same quantize-before-argmax trick as k-means) — so the
    'approximate' index is exactly reproducible cross-engine even though
    its RESULT is approximate relative to cosine_topk_exact."""
    return f"""
        WITH {_ivf_assign_ctes(k)},
        probes AS (
            SELECT cid AS cell FROM (
                SELECT cid, ROW_NUMBER() OVER (ORDER BY cos DESC, cid) AS rn
                FROM ac WHERE vec_id = 0) WHERE rn <= {nprobe}
        ),
        cand AS (
            SELECT cells.vec_id FROM cells JOIN probes USING (cell)
            WHERE cells.vec_id <> 0
        ),
        q AS (SELECT i, x FROM e WHERE vec_id = 0),
        sims AS (
            SELECT e.vec_id,
                   ROUND(SUM(e.x * q.x)
                         / (SQRT(SUM(e.x * e.x)) * SQRT(SUM(q.x * q.x))),
                         6) AS cosine_sim
            FROM e JOIN cand USING (vec_id) JOIN q USING (i)
            GROUP BY e.vec_id
        )
        SELECT vec_id, cosine_sim, rn FROM (
            SELECT vec_id, cosine_sim,
                   ROW_NUMBER() OVER (
                       ORDER BY cosine_sim DESC, vec_id) AS rn
            FROM sims) WHERE rn <= 10
    """


@register(
    "ann_ivf_topk",
    oracle=_ivf_oracle(IVF_K, IVF_NPROBE),
    doc=(
        "IVF ANN top-10 for query vec_id 0: (1) assign every vector to its "
        "nearest of IVF_K sampled centroids with one blocked GEMM "
        "(mapInPandas, Arrow) — this is the inverted-file index, a plain "
        "(cell, vec_id) column pair, shuffle-free; (2) the query probes its "
        "IVF_NPROBE closest cells; (3) only vectors in probed cells are "
        "redranked by exact HOF cosine. Scan fraction ~NPROBE/K of the "
        "corpus vs the brute-force baseline; recall@10 measured in tests "
        "against cosine_topk_exact, and the full recall-vs-scan-fraction "
        "curve (nprobe 2/4/8/16) is recorded in ANN_QUALITY.json — at "
        "sf0.01: 0.8@8.6%, 0.9@14%, 1.0@27% scanned; the registered "
        "operating point keeps nprobe=4. Assignment/probe cosines are rounded "
        "to 6dp BEFORE their argmax (ties to the lowest cell) — the same "
        "quantization that makes k-means hash-comparable — so the index "
        "build is bit-reproducible cross-engine and the whole operator is "
        "value-hash-checked, even though its RESULT is approximate "
        "relative to cosine_topk_exact."
    ),
    tags=("similarity", "llm", "ivf"),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_plan(spark, sf_dir, IVF_NPROBE)["top"]


def ivf_plan(spark: SparkSession, sf_dir: str, nprobe: int, k: int = 10) -> dict:
    """IVF index + probe at a caller-chosen ``nprobe``: returns both the
    reranked top-k plan (default 10) and the candidate plan, so the
    quality tool can record the measured recall-vs-scan-fraction curve
    (the trade a real IVF deployment tunes) instead of a single operating
    point. ``k``: see cosine_topk_exact — deeper lists at replica scale."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    cent_rows = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < IVF_K)
        .select("vec_id", "embedding")
        .collect()
    )
    C = np.array(
        [r.embedding for r in sorted(cent_rows, key=lambda r: r.vec_id)],
        dtype=np.float64,
    )
    C /= np.sqrt((C * C).sum(axis=1, keepdims=True))
    bc = emb.sparkSession.sparkContext.broadcast(C)

    assign_schema = StructType(
        [StructField("vec_id", LongType()), StructField("cell", LongType())]
    )

    def assign(batches):
        cm = bc.value
        for pdf in batches:
            m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            m /= np.sqrt((m * m).sum(axis=1, keepdims=True))
            # round BEFORE argmax (ties -> first/lowest cell): quantizes
            # away GEMM-vs-SQL summation-order drift so the assignment is
            # reproducible by the DuckDB oracle
            sims = np.round(m @ cm.T, 6)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(dtype=np.int64),
                    "cell": np.argmax(sims, axis=1).astype(np.int64),
                }
            )

    cells = spread(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        "vec_id",
    ).mapInPandas(assign, schema=assign_schema)

    indexed = emb.join(cells, "vec_id")

    # the query's NPROBE nearest cells, computed the same way (driver-side:
    # one 64-float vector against K centroids)
    q_row = next(r for r in cent_rows if r.vec_id == 0)
    qv = np.array(q_row.embedding, dtype=np.float64)
    qv /= np.sqrt((qv * qv).sum())
    # rounded cosines, ties to the lowest cell id (lexsort: last key is
    # primary) — mirrors the oracle's ORDER BY cos DESC, cid
    q_sims = np.round(C @ qv, 6)
    order = np.lexsort((np.arange(len(q_sims)), -q_sims))
    probe_cells = [int(c) for c in order[:nprobe]]

    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_embedding"), F.col("nrm").alias("q_nrm")
    )
    candidates = (
        indexed.filter(F.col("cell").isin(probe_cells))
        .filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
    )
    sims = candidates.select(
        "vec_id", F.round(_pair_cosine(), 6).alias("cosine_sim")
    )
    top = sims.orderBy(F.desc("cosine_sim"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
    return {
        "top": top.withColumn("rn", F.row_number().over(w)).select(
            "vec_id", "cosine_sim", "rn"
        ),
        "candidates": candidates.select("vec_id"),
        "cells": cells,
    }


# Block-grid exact all-pairs: B blocks -> B*(B+1)/2 cells; every row is
# replicated to the B cells its block participates in, so shuffle volume is
# B x input while compute stays the inherent O(n^2) GEMM, spread evenly
# over cells. Choose B ~ sqrt(desired parallelism) on a real cluster.
N_SIM_BLOCKS = 8


@register(
    "embedding_near_dup_blocked",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        ),
        pairs AS (
            SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
                   SUM(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS dot,
                   SQRT(SUM(CAST(a.x AS DOUBLE) * CAST(a.x AS DOUBLE))) AS na,
                   SQRT(SUM(CAST(b.x AS DOUBLE) * CAST(b.x AS DOUBLE))) AS nb
            FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
            GROUP BY 1, 2
        )
        SELECT vec_id_a, vec_id_b,
               ROUND(dot / (na * nb), 6) AS cosine_sim
        FROM pairs
        WHERE ROUND(dot / (na * nb), 6) >= {NEAR_DUP_COSINE}
    """,
    doc=(
        "Embedding-cosine near-dup WITHOUT any driver-side corpus collect "
        "— the true 100 TB form of embedding_cosine_near_dup. Rows are "
        "hashed into B blocks; each row is shuffled to the B grid cells "
        "(i<=j) its block belongs to; one applyInPandas per cell runs a "
        "float64 GEMM between the two blocks (within-block pairs on the "
        "diagonal cells), emitting pairs over threshold. No side need fit "
        "anywhere whole: cell working-set is 2/B of the corpus and B "
        "scales with the cluster. Same oracle as the broadcast variant."
    ),
    tags=("dedup", "similarity", "llm", "pandas-udf", "scale"),
)
def embedding_near_dup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    NB = N_SIM_BLOCKS
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    blk = F.pmod(F.col("vec_id"), F.lit(NB))
    cells = F.transform(
        F.sequence(F.lit(0), F.lit(NB - 1)),
        lambda m: F.least(blk, m) * NB + F.greatest(blk, m),
    )
    expl = emb.select(
        "vec_id",
        "embedding",
        blk.alias("blk"),
        F.explode(F.array_distinct(cells)).alias("cell"),
    )

    def cell_gemm(pdf: pd.DataFrame) -> pd.DataFrame:
        cell = int(pdf["cell"].iloc[0])
        i, j = divmod(cell, NB)
        left = pdf[pdf["blk"] == i]
        right = pdf[pdf["blk"] == j]
        if left.empty or right.empty:
            return pd.DataFrame({"vec_id_a": [], "vec_id_b": [], "cosine_sim": []})
        A = np.array(left["embedding"].tolist(), dtype=np.float64)
        Bm = np.array(right["embedding"].tolist(), dtype=np.float64)
        a_ids = left["vec_id"].to_numpy(dtype=np.int64)
        b_ids = right["vec_id"].to_numpy(dtype=np.int64)
        na = np.sqrt((A * A).sum(axis=1))
        nb = np.sqrt((Bm * Bm).sum(axis=1))
        sims = np.round((A @ Bm.T) / np.outer(na, nb), 6)
        if i == j:
            # same rows on both sides: keep each unordered pair once
            mask = (sims >= NEAR_DUP_COSINE) & (a_ids[:, None] < b_ids[None, :])
        else:
            # disjoint blocks: every cross pair is unique to this cell;
            # canonicalize the id order on output (the smaller id may live
            # in EITHER block)
            mask = sims >= NEAR_DUP_COSINE
        ai, bi = np.nonzero(mask)
        lo = np.minimum(a_ids[ai], b_ids[bi])
        hi = np.maximum(a_ids[ai], b_ids[bi])
        return pd.DataFrame(
            {"vec_id_a": lo, "vec_id_b": hi, "cosine_sim": sims[ai, bi]}
        )

    return expl.groupBy("cell").applyInPandas(
        cell_gemm, schema="vec_id_a long, vec_id_b long, cosine_sim double"
    )


@register(
    "embedding_centroids_by_label",
    oracle="""
        WITH expl AS (
            SELECT label,
                   CAST(unnest(range(len(embedding))) AS INT) AS dim,
                   unnest(embedding) AS v
            FROM embeddings
        )
        SELECT label, dim,
               COUNT(*) AS n_vectors,
               ROUND(AVG(CAST(v AS DOUBLE)), 6) AS centroid_val
        FROM expl
        GROUP BY label, dim
    """,
    doc=(
        "Per-label embedding CENTROIDS in long (label, dim) format: "
        "posexplode the vector once, one grouped AVG keyed on (label, "
        "dim). This is the monitoring/bootstrap aggregate of vector "
        "pipelines (IVF centroid seeding, per-class drift tracking). "
        "Long format keeps the aggregate a plain mergeable partial+final "
        "pair — shuffle volume = |labels| x dims rows, independent of "
        "corpus size; re-collect to array<float> only at the consumer "
        "edge (array_agg sorted by dim) if needed."
    ),
    tags=("similarity", "llm", "profiling"),
)
def embedding_centroids_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid_val"),
        )
    )


_KMEANS_K = 8
_KMEANS_ITERS = 3


def _kmeans_oracle(k: int, iters: int) -> str:
    """Unrolled Lloyd's iterations as chained CTEs (DuckDB has no
    iteration; the driver oracle must be one SQL string). Element-long
    form: e = (vec_id, i, x); each round is assign (argmin of rounded
    squared L2, tie-break on centroid id) then re-center (rounded AVG
    per (cid, i)). Rounding to 6dp at BOTH steps on BOTH engines is what
    makes an iterative float algorithm hash-comparable: per-step
    summation-order drift (~1e-12) is quantized away before it can
    compound across rounds."""
    sql = [
        """
        WITH e AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        ),
        c0 AS (SELECT vec_id AS cid, i, x FROM e WHERE vec_id < """
        + str(k)
        + ")"
    ]
    for t in range(1, iters + 1):
        sql.append(
            f""",
        a{t} AS (
            SELECT e.vec_id, c.cid,
                   ROUND(SUM((e.x - c.x) * (e.x - c.x)), 6) AS d
            FROM e JOIN c{t - 1} c USING (i)
            GROUP BY e.vec_id, c.cid
        ),
        b{t} AS (
            SELECT vec_id, cid, d,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
            FROM a{t}
        )"""
        )
        if t < iters:
            sql.append(
                f""",
        c{t} AS (
            SELECT b.cid, e.i, ROUND(AVG(e.x), 6) AS x
            FROM (SELECT vec_id, cid FROM b{t} WHERE rn = 1) b
            JOIN e USING (vec_id)
            GROUP BY b.cid, e.i
        )"""
            )
    sql.append(
        f"""
        SELECT vec_id, cid AS cluster_id, d AS dist2
        FROM b{iters} WHERE rn = 1"""
    )
    return "".join(sql)


@register(
    "kmeans_embedding_clusters",
    oracle=_kmeans_oracle(_KMEANS_K, _KMEANS_ITERS),
    doc=(
        f"Deterministic k-means (k={_KMEANS_K}, {_KMEANS_ITERS} Lloyd "
        "rounds) over the embedding corpus — the semantic-clustering "
        "primitive behind cluster-balanced sampling and SemDeDup-style "
        "semantic dedup. Everything that usually makes k-means "
        "non-reproducible is pinned: init is the first k vec_ids (not "
        "random), the argmin tie-breaks on centroid id, and distances / "
        "centroid means are rounded to 6dp each round so float "
        "summation-order drift cannot compound across iterations — "
        "which is exactly what lets an ITERATIVE algorithm pass a "
        "cross-engine value-hash gate. Plan per round: centroids are a "
        "k-row broadcast into a crossJoin (k x corpus, map-side), "
        "argmin via a row_number window partitioned by vec_id (8 rows "
        "per partition), re-center via posexplode -> hash agg keyed on "
        "(cid, dim) — bounded by k x dim, not corpus size. No driver "
        "collect anywhere; at 100 TB the same plan runs with the "
        "centroid table staying k x dim rows regardless of corpus "
        "scale. The ANN/IVF tier (ann_ivf_topk) consumes exactly this "
        "clustering as its cell index."
    ),
    tags=("similarity", "llm", "clustering"),
)
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cent = emb.filter(F.col("vec_id") < _KMEANS_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )
    best = None
    for it in range(_KMEANS_ITERS):
        d = F.round(
            F.aggregate(
                F.zip_with(F.col("v"), F.col("c"), lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, z: acc + z,
            ),
            6,
        )
        assigned = emb.crossJoin(F.broadcast(cent)).select(
            "vec_id", "v", "cid", d.alias("d")
        )
        w = Window.partitionBy("vec_id").orderBy("d", "cid")
        best = assigned.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") == 1
        )
        if it < _KMEANS_ITERS - 1:
            cent = (
                best.select("cid", F.posexplode("v").alias("i", "x"))
                .groupBy("cid", "i")
                .agg(F.round(F.avg("x"), 6).alias("x"))
                .groupBy("cid")
                .agg(F.array_sort(F.collect_list(F.struct("i", "x"))).alias("sx"))
                .select(
                    "cid", F.transform("sx", lambda s: s.getField("x")).alias("c")
                )
            )
    return best.select(
        "vec_id", F.col("cid").alias("cluster_id"), F.col("d").alias("dist2")
    )


@register(
    "embedding_int8_quant_error",
    oracle="""
        WITH e AS (
            SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        ),
        dims AS (
            SELECT i, MIN(x) AS lo, MAX(x) AS hi FROM e GROUP BY i
        ),
        q AS (
            SELECT e.vec_id, e.x, d.lo,
                   (d.hi - d.lo) / 255.0 AS scale,
                   CASE WHEN d.hi = d.lo THEN 0 ELSE
                   LEAST(GREATEST(
                       FLOOR((e.x - d.lo) / ((d.hi - d.lo) / 255.0) + 0.5),
                       0), 255) END AS code
            FROM e JOIN dims d USING (i)
        )
        SELECT vec_id,
               CAST(COUNT(*) AS BIGINT) AS n_dims,
               ROUND(AVG((x - (lo + code * scale))
                         * (x - (lo + code * scale))), 9) AS mse,
               CAST(SUM(CASE WHEN code = 0 OR code = 255 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_extreme_codes
        FROM q GROUP BY vec_id
    """,
    doc=(
        "Scalar int8 quantization of the embedding store with per-vector "
        "reconstruction error: per-DIMENSION min/max over the corpus (a "
        "|dims|-row aggregate, broadcast back), affine code = "
        "floor((x-lo)/scale + 0.5) clamped to [0,255], then per-vector "
        "MSE and the count of dims landing on the extreme codes 0/255 (with corpus-exact lo/hi nothing ever CLAMPS -- the guard exists for the streaming case where stats come from a sample). This is the 4x-compression baseline every "
        "100 TB vector store starts with (and the quality gate before "
        "switching distance kernels to int8 SIMD): the stats pass and "
        "the encode pass are both single scans, the join is 64 rows "
        "broadcast. floor(x+0.5) -- never round() -- keeps codes "
        "bit-identical across engines; floats are widened to double "
        "BEFORE any arithmetic on both sides. A constant dimension "
        "(hi == lo) is guarded to code 0 / error 0 in both engines "
        "instead of dividing by a zero scale."
    ),
    tags=("similarity", "llm", "quantization"),
)
def embedding_int8_quant_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = spread(emb, "vec_id").select(
        "vec_id",
        (F.posexplode(F.col("embedding").cast("array<double>"))).alias("p", "x"),
    ).select("vec_id", (F.col("p") + 1).alias("i"), "x")
    dims = e.groupBy("i").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    scale = (F.col("hi") - F.col("lo")) / F.lit(255.0)
    q = (
        e.join(F.broadcast(dims), "i")
        .withColumn("scale", scale)
        .withColumn(
            "code",
            # constant dimension (hi == lo): scale is 0 and the affine
            # division is undefined — code 0 reconstructs to lo == x, so
            # the error contribution is exactly 0 in both engines (r3
            # advice: the unguarded divide made NaN poison every mse)
            F.when(F.col("scale") == 0, F.lit(0)).otherwise(
                F.least(
                    F.greatest(
                        F.floor((F.col("x") - F.col("lo")) / F.col("scale") + 0.5),
                        F.lit(0),
                    ),
                    F.lit(255),
                )
            ),
        )
    )
    err = F.col("x") - (F.col("lo") + F.col("code") * F.col("scale"))
    return q.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n_dims"),
        F.round(F.avg(err * err), 9).alias("mse"),
        F.sum(
            F.when((F.col("code") == 0) | (F.col("code") == 255), 1).otherwise(0)
        ).alias("n_extreme_codes"),
    )


@register(
    "embedding_truncation_energy",
    oracle="""
        WITH e AS (
            SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        ),
        pv AS (
            SELECT vec_id, label,
                   SUM(x * x) AS full_e,
                   SUM(CASE WHEN i <= 8  THEN x * x ELSE 0 END) AS e8,
                   SUM(CASE WHEN i <= 16 THEN x * x ELSE 0 END) AS e16,
                   SUM(CASE WHEN i <= 32 THEN x * x ELSE 0 END) AS e32
            FROM e GROUP BY vec_id, label
        )
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_vectors,
               ROUND(AVG(CASE WHEN full_e = 0 THEN 0
                              ELSE SQRT(e8  / full_e) END), 6) AS retained_cos_8,
               ROUND(AVG(CASE WHEN full_e = 0 THEN 0
                              ELSE SQRT(e16 / full_e) END), 6) AS retained_cos_16,
               ROUND(AVG(CASE WHEN full_e = 0 THEN 0
                              ELSE SQRT(e32 / full_e) END), 6) AS retained_cos_32
        FROM pv GROUP BY label
    """,
    doc=(
        "Matryoshka-style truncation audit for the embedding store: the "
        "cosine between a vector and its d-dim prefix truncation equals "
        "sqrt(prefix energy / full energy), so per-label averages of that "
        "retained cosine at d in {8,16,32} measure exactly how much ANN "
        "quality a dimension cut would keep — the audit run before "
        "shipping a cheaper index (truncation halves/quarters both "
        "storage and GEMM cost). Pure per-row fold (F.aggregate over the "
        "sliced array) + one label-bounded aggregation; no shuffle wider "
        "than |labels| at any corpus size, embeddings column never "
        "leaves the scan projection."
    ),
    tags=("similarity", "llm", "quantization"),
)
def embedding_truncation_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")

    def energy(col: Column) -> Column:
        return F.aggregate(
            col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )

    full_e = energy(F.col("embedding"))
    # all-zero vector guard: Spark's non-ANSI 0/0 is NULL (silently dropped
    # from AVG) while DuckDB's is NaN (poisons AVG) — pin both to 0
    pv = emb.select(
        "label",
        *[
            F.when(full_e == 0, F.lit(0.0))
            .otherwise(F.sqrt(energy(F.slice("embedding", 1, d)) / full_e))
            .alias(f"rc{d}")
            for d in (8, 16, 32)
        ],
    )
    return pv.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        *[F.round(F.avg(f"rc{d}"), 6).alias(f"retained_cos_{d}") for d in (8, 16, 32)],
    )


# Product quantization (Jegou, Douze & Schmid, "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011): the d dims are split into PQ_M
# contiguous subspaces of PQ_DSUB dims; per subspace a PQ_K-codeword
# codebook is TRAINED with PQ_ITERS deterministic Lloyd rounds (init = the
# subvectors of the first PQ_K vectors, the same pinned-init convention as
# kmeans_embedding_clusters) on the PINNED SAMPLE vec_id < PQ_TRAIN_N —
# nobody trains PQ on the full corpus at 100 TB; the codebook converges on
# a bounded training set and the corpus is touched exactly ONCE, by the
# final encoding pass (r9 verdict task 3; previously every Lloyd round was
# a full-corpus pass). Each subvector is then replaced by its nearest
# codeword id. Memory per vector drops from d*4 bytes to PQ_M bytes, and a
# query scores the WHOLE corpus with PQ_M table lookups per vector
# (asymmetric distance, ADC) instead of a d-term dot product; the ADC
# shortlist of PQ_SHORTLIST candidates is then reranked by exact L2 — the
# standard FAISS IndexPQ-with-refine shape.
PQ_M = 16
PQ_DSUB = 4
PQ_K = 16
PQ_ITERS = 3
PQ_SHORTLIST = 100
PQ_TRAIN_N = 256  # pinned Lloyd training sample: vec_id < PQ_TRAIN_N


def _pq_oracle(
    m: int, dsub: int, k: int, iters: int, shortlist: int, train_n: int
) -> str:
    """Trained PQ replayed in SQL: the per-subspace Lloyd rounds are the
    kmeans_embedding_clusters CTE unrolling with the subspace id joining
    every key (one chain trains all m codebooks at once), restricted to
    the pinned training sample ``vec_id < train_n`` — only the FINAL
    encoding assignment touches the full corpus, mirroring the Spark
    plan's single corpus pass. Distances and centroid means are rounded
    to 6dp each round, argmins tie-break on codeword id, so the trained
    codebooks — and therefore the codes, the ADC shortlist, and the
    reranked top-10 — are bit-reproducible cross-engine."""
    sql = [
        f"""
        WITH e AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        ),
        se AS (
            SELECT vec_id, CAST((i - 1) // {dsub} AS BIGINT) AS s, i, x
            FROM e
        ),
        samp AS (SELECT vec_id, s, i, x FROM se WHERE vec_id < {train_n}),
        c0 AS (SELECT vec_id AS cid, s, i, x FROM se WHERE vec_id < {k})"""
    ]
    for t in range(1, iters + 1):
        # training rounds (t < iters) assign the SAMPLE only; the final
        # round is the corpus-wide encoding pass
        rel = "se" if t == iters else "samp"
        sql.append(
            f""",
        a{t} AS (
            SELECT {rel}.vec_id, {rel}.s, c.cid,
                   ROUND(SUM(({rel}.x - c.x) * ({rel}.x - c.x)), 6) AS d
            FROM {rel} JOIN c{t - 1} c ON {rel}.i = c.i
            GROUP BY 1, 2, 3
        ),
        b{t} AS (
            SELECT vec_id, s, cid, d,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id, s ORDER BY d, cid) AS rn
            FROM a{t}
        )"""
        )
        if t < iters:
            sql.append(
                f""",
        c{t} AS (
            SELECT b.cid, samp.s, samp.i, ROUND(AVG(samp.x), 6) AS x
            FROM (SELECT vec_id, s, cid FROM b{t} WHERE rn = 1) b
            JOIN samp ON samp.vec_id = b.vec_id AND samp.s = b.s
            GROUP BY 1, 2, 3
        )"""
            )
    sql.append(
        f""",
        codes AS (SELECT vec_id, s, cid FROM b{iters} WHERE rn = 1),
        qdt AS (SELECT s, cid, d FROM a{iters} WHERE vec_id = 0),
        adc AS (
            SELECT codes.vec_id, ROUND(SUM(qdt.d), 6) AS adc_d
            FROM codes JOIN qdt USING (s, cid)
            WHERE codes.vec_id <> 0
            GROUP BY codes.vec_id
        ),
        short AS (
            SELECT vec_id FROM (
                SELECT vec_id,
                       ROW_NUMBER() OVER (ORDER BY adc_d, vec_id) AS rn
                FROM adc) WHERE rn <= {shortlist}
        ),
        q AS (SELECT i, x FROM e WHERE vec_id = 0),
        rerank AS (
            SELECT e.vec_id,
                   ROUND(SUM((e.x - q.x) * (e.x - q.x)), 6) AS dist2
            FROM e JOIN short USING (vec_id) JOIN q USING (i)
            GROUP BY 1
        )
        SELECT vec_id, dist2, rn FROM (
            SELECT vec_id, dist2,
                   ROW_NUMBER() OVER (ORDER BY dist2, vec_id) AS rn
            FROM rerank) WHERE rn <= 10"""
    )
    return "".join(sql)


@register(
    "ann_pq_topk",
    oracle=_pq_oracle(PQ_M, PQ_DSUB, PQ_K, PQ_ITERS, PQ_SHORTLIST, PQ_TRAIN_N),
    doc=(
        "Trained product-quantization ANN top-10 for query vec_id 0 "
        "(Jegou et al. TPAMI 2011, the FAISS IndexPQ-with-refine shape): "
        "(1) per-subspace codebooks trained with PQ_ITERS Lloyd rounds "
        "ON THE PINNED SAMPLE vec_id < PQ_TRAIN_N — one bounded collect "
        "(<= PQ_TRAIN_N vectors, ~130 KB regardless of corpus size), "
        "Lloyd driver-side in numpy; the corpus itself is scanned "
        "exactly ONCE, by the encoding pass (r9 verdict task 3 — the "
        "prior shape re-scanned the full corpus per round, 3x avoidable "
        "IO at 100 TB); (2) that single blocked Arrow pass encodes "
        "every vector as PQ_M codeword ids against the broadcast "
        "PQ_M*PQ_K*PQ_DSUB codebook (16x compression; raw embeddings "
        "are never touched again until rerank); (3) the query's ADC "
        "table (PQ_M*PQ_K rows, computed driver-side from the trained "
        "codebook) broadcast onto the codes, one SUM per vector, "
        "top-PQ_SHORTLIST kept via TakeOrderedAndProject; (4) the "
        "shortlist — a fixed candidate count, so a VANISHING corpus "
        "fraction at scale — reranked by exact L2. Distances and "
        "centroid means are rounded to 6dp each round with codeword-id "
        "tie-breaks (quantize-before-argmax), so codebooks, codes, "
        "shortlist, and the final ranking are bit-reproducible "
        "cross-engine and value-hash-checked (the oracle's training "
        "CTEs are restricted to the same pinned sample). Recall@10 vs "
        "the exact L2 scan is recorded in ANN_QUALITY.json."
    ),
    tags=("similarity", "llm", "quantization", "pq", "pandas-udf"),
)
def ann_pq_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 10,
    shortlist: int = PQ_SHORTLIST,
) -> DataFrame:
    # ``k``/``shortlist`` beyond the registered defaults: the quality tool
    # scales both by the replica factor so the deeper final list is not
    # truncated by a shortlist sized for the fixture corpus (see
    # cosine_topk_exact on why replica recall needs deeper lists)
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    emb_raw = spread(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        "vec_id",
    )

    # pinned Lloyd training sample — bounded collect: <= PQ_TRAIN_N rows
    # (256 vectors x 64 float64 dims ~ 130 KB) regardless of corpus size.
    # Training runs entirely driver-side in numpy, so the corpus is
    # scanned exactly once, by the encoding pass below (previously each
    # Lloyd round was a full-corpus mapInPandas pass + collect).
    train_rows = sorted(
        emb_raw.filter(F.col("vec_id") < PQ_TRAIN_N).collect(),
        key=lambda r: r.vec_id,
    )
    T = np.array([r.embedding for r in train_rows], dtype=np.float64)
    Ts = T.reshape(len(T), PQ_M, PQ_DSUB)
    # init codebook: subvectors of the first PQ_K vectors (PQ_K <=
    # PQ_TRAIN_N, so the init rows are inside the sample), the same
    # pinned-init convention as kmeans_embedding_clusters / IVF.
    # cbs[s]: list of (cid, centroid) sorted by cid — empty codewords can
    # drop during training, so codeword ids are tracked explicitly
    cbs: list[list[tuple[int, np.ndarray]]] = [
        [(c, T[c, s * PQ_DSUB : (s + 1) * PQ_DSUB]) for c in range(PQ_K)]
        for s in range(PQ_M)
    ]
    for _ in range(PQ_ITERS - 1):
        new_cbs: list[list[tuple[int, np.ndarray]]] = []
        for s in range(PQ_M):
            cids = np.array([c for c, _ in cbs[s]], dtype=np.int64)
            C = np.array([v for _, v in cbs[s]], dtype=np.float64)
            # distances rounded to 6dp BEFORE the argmin; argmin ties ->
            # lowest cid via the cid-sorted codebook (ORDER BY d, cid)
            dists = np.round(
                ((Ts[:, s, None, :] - C[None, :, :]) ** 2).sum(axis=2), 6
            )
            best = cids[np.argmin(dists, axis=1)]
            new_cbs.append(
                [
                    # centroid mean rounded to 6dp — ROUND(AVG(x), 6)
                    (int(cid), np.round(Ts[best == cid, s, :].mean(axis=0), 6))
                    for cid in np.unique(best)
                ]
            )
        cbs = new_cbs

    # the query's ADC lookup tables, driver-side from the trained codebook
    # (the query vector is sample row 0, available from the same collect):
    # per subspace, codeword id -> round(||q_s - c||^2, 6)
    qsub = T[0].reshape(PQ_M, PQ_DSUB)
    dtabs = [
        {int(cid): float(np.round(((qsub[s] - v) ** 2).sum(), 6)) for cid, v in cbs[s]}
        for s in range(PQ_M)
    ]

    def adc_pass(bc):
        """The single corpus pass — one blocked Arrow scan emitting
        (vec_id, adc_d): every vector's nearest trained codeword per
        subspace, immediately looked up in the query's ADC table and
        summed. Distances rounded to 6dp BEFORE the argmin (ties ->
        lowest cid via the cid-sorted codebook) — mirrors the oracle's
        ORDER BY d, cid; per-subspace table entries are rounded to 6dp
        and their 8-term sum re-rounded, the oracle's ROUND(SUM(d), 6).

        r11 (guide §4.2/§2.4): the ADC table was previously a broadcast
        join against an exploded (vec_id, s, cid) frame — 8 rows per
        vector through an exchange and a vec_id-keyed re-aggregate. The
        table is driver-resident anyway, so the lookup+sum now happens
        inside the same numpy batch that computes the argmin: one Arrow
        row per vector, no join, no re-aggregation (A/B at sf0.1:
        2.61 → 1.41 s, byte-identical output)."""
        schema = StructType(
            [
                StructField("vec_id", LongType()),
                StructField("adc_d", DoubleType()),
            ]
        )

        def work(batches):
            books, dtab = bc.value
            for pdf in batches:
                X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
                if len(X) == 0:
                    continue
                ids = pdf["vec_id"].to_numpy(dtype=np.int64)
                Xs = X.reshape(len(X), PQ_M, PQ_DSUB)
                acc = np.zeros(len(X), dtype=np.float64)
                for s in range(PQ_M):
                    cids = np.array([c for c, _ in books[s]], dtype=np.int64)
                    C = np.array([v for _, v in books[s]], dtype=np.float64)
                    dists = np.round(
                        ((Xs[:, s, None, :] - C[None, :, :]) ** 2).sum(axis=2),
                        6,
                    )
                    best = cids[np.argmin(dists, axis=1)]
                    lut = dtab[s]
                    acc += np.array(
                        [lut[int(c)] for c in best], dtype=np.float64
                    )
                yield pd.DataFrame({"vec_id": ids, "adc_d": np.round(acc, 6)})

        return emb_raw.mapInPandas(work, schema=schema)

    adc = adc_pass(
        spark.sparkContext.broadcast((cbs, dtabs))
    ).filter(F.col("vec_id") != 0)
    short = (
        adc.orderBy(F.asc("adc_d"), F.asc("vec_id"))
        .limit(shortlist)
        .select("vec_id")
    )
    qv = emb_raw.filter(F.col("vec_id") == 0).select(
        F.transform("embedding", lambda x: x.cast("double")).alias("qv")
    )
    dist2 = F.round(
        F.aggregate(
            F.zip_with(
                F.transform("embedding", lambda x: x.cast("double")),
                F.col("qv"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, z: acc + z,
        ),
        6,
    )
    rr = (
        emb_raw.join(short, "vec_id")
        .crossJoin(F.broadcast(qv))
        .select("vec_id", dist2.alias("dist2"))
    )
    top = rr.orderBy(F.asc("dist2"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.asc("dist2"), F.asc("vec_id"))
    return top.withColumn("rn", F.row_number().over(w)).select(
        "vec_id", "dist2", "rn"
    )


def cov_from_moments(r) -> float:
    """Recover cov[i,j] from an embedding_covariance_spectrum row of raw
    integer moments: cov = (sxy - sx_i*sx_j/n) / (n*1e8). THE one place
    this formula lives — the output schema has changed twice (r6 cov ->
    r7 cov_num -> r7 raw moments) and each change had to hand-sync every
    consumer; new consumers must call this instead of inlining it."""
    return (r.sxy - r.sx_i * r.sx_j / r.n) / (r.n * 1e8)


@register(
    "embedding_covariance_spectrum",
    oracle="""
        WITH e AS (
            SELECT vec_id,
                   CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000.0
                              + 0.5) AS BIGINT) AS k,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        ),
        n AS (SELECT COUNT(*) AS n FROM embeddings),
        m AS (SELECT i, CAST(SUM(k) AS BIGINT) AS sx FROM e GROUP BY i),
        g AS (
            SELECT a.i AS i, b.i AS j, CAST(SUM(a.k * b.k) AS BIGINT) AS sxy
            FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY 1, 2
        )
        SELECT g.i, g.j, g.sxy,
               ma.sx AS sx_i,
               mb.sx AS sx_j,
               CAST(n.n AS BIGINT) AS n
        FROM g CROSS JOIN n
        JOIN m ma ON ma.i = g.i
        JOIN m mb ON mb.i = g.j
    """,
    doc=(
        "Full d x d covariance matrix of the embedding store (upper "
        "triangle, 1-based dims) — the input to the PCA/eigen-spectrum "
        "audit that decides how many dimensions an index truncation or "
        "whitening transform can drop. Distributed one-pass moment "
        "computation: each partition computes its LOCAL Gram matrix "
        "(X^T X, a d x d float64 GEMM over Arrow batches), column sums, "
        "and row count, and emits only the d(d+1)/2 triangle entries; one "
        "hash aggregation sums the partials and finishes cov = E[xy] - "
        "E[x]E[y] in-plan. The float32 cells are lifted to scaled int64 "
        "(floor(x*1e4 + 0.5) — the same IEEE expression in numpy and in "
        "the DuckDB oracle, so both engines derive bit-identical integers "
        "with no round-half tie ambiguity) and every accumulated moment is "
        "an EXACT integer sum: permutation-invariant, so the cross-engine "
        "hash is stable under ANY partitioning (r5's driver hash-mismatch "
        "was a 6-dp rounding flip on order-dependent float sums; r6's was "
        "the FINAL engine-native ROUND(double, 6) — Spark rounds via "
        "BigDecimal HALF_UP on the exact binary expansion, DuckDB via "
        "scaled float arithmetic, and near a 5e-7 boundary the 6th digit "
        "flips between builds). The output is therefore the ALL-INTEGER "
        "raw moments themselves: (sxy, sx_i, sx_j, n), each a "
        "LINEAR-magnitude BIGINT (sxy <= n*1e8, so the int64 cliff sits "
        "at ~9e10 vectors — beyond a 100 TB embedding store; no n*sxy "
        "product ever forms, the review-caught overflow class), so "
        "cov = (sxy - sx_i*sx_j/n)/(n*1e8) is recoverable downstream "
        "with full information and NOTHING is rounded or even computed "
        "in the hashed result. Shuffle volume is "
        "#partitions x d^2/2 rows REGARDLESS of corpus size — the 100 TB "
        "plan is identical to the fixture plan — and nothing d^2-sized "
        "ever sits on the driver. "
        "The eigen decomposition itself is a d x d problem, bounded by "
        "dimension not rows; tests assert PSD-ness and trace parity and "
        "record the explained-variance curve."
    ),
    tags=("similarity", "llm", "statistics", "pandas-udf", "scale"),
)
def embedding_covariance_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    part_schema = StructType(
        [
            StructField("i", LongType()),
            StructField("j", LongType()),
            StructField("sxy", LongType()),
            StructField("sx_i", LongType()),
            StructField("sx_j", LongType()),
            StructField("nrows", LongType()),
        ]
    )

    def local_gram(batches):
        G = None
        s = None
        n = 0
        for pdf in batches:
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            if len(X) == 0:
                continue
            # Integer lift: floor(x*1e4 + 0.5) in float64 — the exact same
            # IEEE expression the DuckDB oracle evaluates, so both engines
            # hold bit-identical int64 cells and every downstream sum is
            # exact and partition-order-invariant.
            K = np.floor(X * 10000.0 + 0.5).astype(np.int64)
            if G is None:
                d = K.shape[1]
                G = np.zeros((d, d), dtype=np.int64)
                s = np.zeros(d, dtype=np.int64)
            G += K.T @ K
            s += K.sum(axis=0)
            n += len(K)
        if G is None:
            return
        iu, ju = np.triu_indices(G.shape[0])
        yield pd.DataFrame(
            {
                "i": (iu + 1).astype(np.int64),
                "j": (ju + 1).astype(np.int64),
                "sxy": G[iu, ju],
                "sx_i": s[iu],
                "sx_j": s[ju],
                "nrows": np.full(len(iu), n, dtype=np.int64),
            }
        )

    partials = spread(emb, "vec_id").mapInPandas(local_gram, schema=part_schema)
    agg = partials.groupBy("i", "j").agg(
        F.sum("sxy").alias("sxy"),
        F.sum("sx_i").alias("sx_i"),
        F.sum("sx_j").alias("sx_j"),
        F.sum("nrows").alias("n"),
    )
    # No finish arithmetic at all: the hashed output IS the exact raw
    # moments (every one a linear-magnitude int64 — no n*sxy product, no
    # cast cliff). cov = (sxy - sx_i*sx_j/n) / (n*1e8) downstream.
    return agg.select("i", "j", "sxy", "sx_i", "sx_j", "n")


@register(
    "embedding_robust_scaling",
    oracle="""
        WITH cells AS (
            SELECT e.vec_id,
                   generate_subscripts(e.embedding, 1) - 1 AS dim,
                   CAST(unnest(e.embedding) AS DOUBLE) AS x
            FROM embeddings e
        ),
        stats AS (
            SELECT dim,
                   quantile_cont(x, 0.5) AS med,
                   quantile_cont(x, 0.75) - quantile_cont(x, 0.25) AS iqr
            FROM cells GROUP BY 1
        )
        SELECT c.dim,
               ROUND(s.med, 6) AS median,
               ROUND(s.iqr, 6) AS iqr,
               CAST(SUM(CASE WHEN ABS(c.x - s.med) > 1.5 * s.iqr
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outlier_cells
        FROM cells c JOIN stats s USING (dim)
        GROUP BY c.dim, s.med, s.iqr
    """,
    doc=(
        "ROBUST PER-DIMENSION SCALING AUDIT: exact median and IQR for "
        "every embedding dimension plus the count of cells outside "
        "median +/- 1.5*IQR — the feature-scaling pass run before "
        "distance-based indexing (a fat-tailed dimension dominates L2 "
        "and cosine tails; this finds it). Exact percentiles via "
        "F.percentile keyed BY DIMENSION — |dims| independent groups, "
        "each a mergeable percentile accumulator, never a global sort "
        "(contrast exact_global_ntiles, which is the row-keyed hard "
        "case). Both engines linear-interpolate on doubles cast from "
        "the same float32 cells, so quantiles agree bit-for-bit before "
        "the shared round(6). The outlier recount joins the |dims|-row "
        "stats back as a broadcast. At 100 TB: posexplode is linear, "
        "both aggregates key on dim (64 groups) — map-side combine "
        "carries nearly all of it; no skew because every vector "
        "contributes one cell per dim."
    ),
    tags=("similarity", "statistics", "quality"),
)
def embedding_robust_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cells = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
    )
    from weather_stream_processor_spark.plans.caching import persisted_result

    def build(cells: DataFrame) -> DataFrame:
        stats = cells.groupBy("dim").agg(
            F.percentile("x", F.lit(0.5)).alias("med"),
            (
                F.percentile("x", F.lit(0.75)) - F.percentile("x", F.lit(0.25))
            ).alias("iqr"),
        )
        return (
            cells.join(F.broadcast(stats), "dim")
            .groupBy("dim", "med", "iqr")
            .agg(
                F.sum(
                    F.when(
                        F.abs(F.col("x") - F.col("med")) > 1.5 * F.col("iqr"), 1
                    ).otherwise(0)
                ).alias("n_outlier_cells")
            )
            .select(
                "dim",
                F.round("med", 6).alias("median"),
                F.round("iqr", 6).alias("iqr"),
                "n_outlier_cells",
            )
        )

    return persisted_result(cells, build)


@register(
    "ivf_cell_balance",
    oracle=f"""
        WITH {_ivf_assign_ctes(IVF_K)},
        counts AS (
            SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vectors
            FROM cells GROUP BY cell
        ),
        tot AS (
            SELECT CAST(SUM(n_vectors) AS DOUBLE) AS total,
                   CAST(COUNT(*) AS DOUBLE) AS n_cells
            FROM counts
        )
        SELECT c.cell, c.n_vectors,
               ROUND(c.n_vectors / t.total, 6) AS share,
               ROUND(c.n_vectors / (t.total / t.n_cells), 6)
                   AS imbalance_factor
        FROM counts c CROSS JOIN tot t
        ORDER BY c.n_vectors DESC, c.cell
    """,
    doc=(
        "IVF CELL BALANCE AUDIT: per-cell vector counts, corpus share, "
        "and imbalance factor (cell size over the perfectly-balanced "
        "mean) for the inverted-file index — the health check run after "
        "every index build, because one hot cell silently turns "
        "nprobe/K expected scan fraction into that cell's share (a "
        "2x-mean cell probed every query doubles rerank cost; the fix "
        "is re-training centroids or splitting the cell). Reuses the "
        "registered index's assignment verbatim — same blocked-GEMM "
        "builder path, same rounded-argmax CTEs in the oracle — so the "
        "audit can never drift from the index it audits. Aggregates are "
        "cell-domain-sized (K rows); the only corpus-scale stage is the "
        "assignment itself, shared with ann_ivf_topk. Fully tie-broken "
        "ordering."
    ),
    tags=("similarity", "ivf", "profiling"),
)
def ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = ivf_plan(spark, sf_dir, IVF_NPROBE)["cells"]
    counts = cells.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vectors"))
    tot = counts.agg(
        F.sum("n_vectors").cast("double").alias("total"),
        F.count(F.lit(1)).cast("double").alias("n_cells"),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "cell",
            "n_vectors",
            F.round(F.col("n_vectors") / F.col("total"), 6).alias("share"),
            F.round(
                F.col("n_vectors") / (F.col("total") / F.col("n_cells")), 6
            ).alias("imbalance_factor"),
        )
        .orderBy(F.desc("n_vectors"), F.asc("cell"))
    )


# --- all-kNN graph operators: mutual neighbors + hubness audit --------------

MUTUAL_K = 5
HUBNESS_K = 10

_ALLKNN_ORACLE_CTE = """
    WITH e AS (
        SELECT vec_id, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ),
    dots AS (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               SUM(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS dot,
               SUM(CAST(a.x AS DOUBLE) * CAST(a.x AS DOUBLE)) AS na2,
               SUM(CAST(b.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS nb2
        FROM e a JOIN e b ON a.i = b.i AND a.vec_id <> b.vec_id
        GROUP BY 1, 2
    ),
    knn AS (
        SELECT va, vb,
               ROUND(dot / (sqrt(na2) * sqrt(nb2)), 6) AS cosine_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY va
                   ORDER BY ROUND(dot / (sqrt(na2) * sqrt(nb2)), 6) DESC, vb
               ) AS rnk
        FROM dots
    )
"""


def _allknn_directed(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """Directed exact k-NN lists (vec_id, nbr_id, cosine_sim, rnk) for EVERY
    corpus vector, via the B-block grid of embedding_near_dup_blocked.

    Each row is shuffled to the B cells pairing its block with every other
    block, one Arrow GEMM per cell emits that row's top-k WITHIN the cell
    (so cell output is |rows| * k, never |rows|^2), and a window partitioned
    by vec_id folds the <= B*k per-row candidates into the global top-k.
    Cell working-set stays 2/B of the corpus; nothing is collected. Sims are
    rounded to 6dp inside the cell and ties broken on neighbor id with
    numpy lexsort — the same (sim DESC, id ASC) total order the oracle and
    the final window use, so the per-cell truncation is lossless.
    """
    import numpy as np
    import pandas as pd

    NB = N_SIM_BLOCKS
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    blk = F.pmod(F.col("vec_id"), F.lit(NB))
    cells = F.transform(
        F.sequence(F.lit(0), F.lit(NB - 1)),
        lambda m: F.least(blk, m) * NB + F.greatest(blk, m),
    )
    expl = emb.select(
        "vec_id",
        "embedding",
        blk.alias("blk"),
        F.explode(F.array_distinct(cells)).alias("cell"),
    )

    def cell_topk(pdf: pd.DataFrame) -> pd.DataFrame:
        cell = int(pdf["cell"].iloc[0])
        i, j = divmod(cell, NB)
        left = pdf[pdf["blk"] == i]
        right = pdf[pdf["blk"] == j]
        out_v, out_n, out_s = [], [], []

        def emit(A_ids, A, B_ids, Bm, mask_self: bool) -> None:
            na = np.sqrt((A * A).sum(axis=1))
            nb = np.sqrt((Bm * Bm).sum(axis=1))
            sims = np.round((A @ Bm.T) / np.outer(na, nb), 6)
            if mask_self:
                sims[A_ids[:, None] == B_ids[None, :]] = -np.inf
            kk = min(k, sims.shape[1] - (1 if mask_self else 0))
            if kk <= 0:
                return
            for r in range(sims.shape[0]):
                order = np.lexsort((B_ids, -sims[r]))[:kk]
                out_v.extend([A_ids[r]] * len(order))
                out_n.extend(B_ids[order])
                out_s.extend(sims[r][order])

        if not left.empty and not right.empty:
            A = np.array(left["embedding"].tolist(), dtype=np.float64)
            Bm = np.array(right["embedding"].tolist(), dtype=np.float64)
            a_ids = left["vec_id"].to_numpy(dtype=np.int64)
            b_ids = right["vec_id"].to_numpy(dtype=np.int64)
            if i == j:
                emit(a_ids, A, a_ids, A, mask_self=True)
            else:
                emit(a_ids, A, b_ids, Bm, mask_self=False)
                emit(b_ids, Bm, a_ids, A, mask_self=False)
        return pd.DataFrame(
            {"vec_id": out_v, "nbr_id": out_n, "cosine_sim": out_s}
        )

    cand = expl.groupBy("cell").applyInPandas(
        cell_topk, schema="vec_id long, nbr_id long, cosine_sim double"
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cosine_sim"), F.asc("nbr_id")
    )
    return cand.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )


@register(
    "mutual_knn_pairs",
    oracle=_ALLKNN_ORACLE_CTE
    + f"""
        SELECT k1.va AS vec_id_a, k1.vb AS vec_id_b, k1.cosine_sim,
               CAST(k1.rnk AS BIGINT) AS rank_ab,
               CAST(k2.rnk AS BIGINT) AS rank_ba
        FROM (SELECT * FROM knn WHERE rnk <= {MUTUAL_K}) k1
        JOIN (SELECT * FROM knn WHERE rnk <= {MUTUAL_K}) k2
          ON k1.va = k2.vb AND k1.vb = k2.va
        WHERE k1.va < k1.vb
    """,
    doc=(
        f"MUTUAL k-NN pairs (k={MUTUAL_K}): vector pairs that rank in EACH "
        "OTHER'S exact cosine top-k — the reciprocal-best-match criterion "
        "used for entity alignment across embedding spaces and as the "
        "high-precision edge set for kNN-graph clustering (a one-way "
        "neighbor is often just a hub; mutuality filters hub edges out). "
        "Plan: the all-kNN helper runs the B-block grid with PER-CELL "
        "top-k (cell output |rows|*k, not |rows|^2), a vec_id-partitioned "
        "window folds cells into global lists, and mutuality is one "
        "self-equi-join on the swapped key — shuffle keyed on (a,b), "
        "|rows|*k each side. Exact-verified against the full O(n^2) "
        "DuckDB oracle."
    ),
    tags=("similarity", "llm", "pandas-udf", "scale"),
)
def mutual_knn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11 (guide §2.4): knn feeds BOTH join sides (fwd + rev), which
    # physically re-ran the whole B-block GEMM grid twice; the O(n*k)
    # narrow list is lineage-cut so the grid runs once.
    knn = truncate_lineage(_allknn_directed(spark, sf_dir, MUTUAL_K))
    fwd = knn.select(
        F.col("vec_id").alias("vec_id_a"),
        F.col("nbr_id").alias("vec_id_b"),
        "cosine_sim",
        F.col("rnk").cast("bigint").alias("rank_ab"),
    )
    rev = knn.select(
        F.col("nbr_id").alias("vec_id_a"),
        F.col("vec_id").alias("vec_id_b"),
        F.col("rnk").cast("bigint").alias("rank_ba"),
    )
    return fwd.join(rev, ["vec_id_a", "vec_id_b"]).filter(
        F.col("vec_id_a") < F.col("vec_id_b")
    ).select("vec_id_a", "vec_id_b", "cosine_sim", "rank_ab", "rank_ba")


@register(
    "knn_hubness_audit",
    oracle=_ALLKNN_ORACLE_CTE
    + f"""
        , occ AS (
            SELECT vb, CAST(COUNT(*) AS BIGINT) AS n_in
            FROM knn WHERE rnk <= {HUBNESS_K}
            GROUP BY vb
        ),
        per_vec AS (
            SELECT e.vec_id, COALESCE(o.n_in, 0) AS n_in
            FROM (SELECT DISTINCT vec_id FROM embeddings) e
            LEFT JOIN occ o ON e.vec_id = o.vb
        )
        SELECT n_in, CAST(COUNT(*) AS BIGINT) AS n_vectors
        FROM per_vec GROUP BY n_in
    """,
    doc=(
        f"HUBNESS AUDIT of the embedding space (k={HUBNESS_K}): the "
        "k-occurrence histogram — for each vector, how many OTHER vectors "
        "list it in their exact top-k, bucketed into (n_in, n_vectors) "
        "rows. High-dimensional spaces grow hubs (n_in >> k) and "
        "anti-hubs (n_in = 0, unreachable by retrieval); a right-skewed "
        "histogram predicts degraded ANN recall and biased dedup/"
        "retrieval long before any downstream eval does (Radovanovic et "
        "al., JMLR'10). Plan: same blocked per-cell top-k helper, one "
        "count aggregate keyed on the neighbor id, a left anti-ish join "
        "against the distinct id list to restore the zero bucket, one "
        "tiny histogram aggregate. Nothing exceeds |rows|*k intermediate "
        "size; the histogram is at most max(n_in) rows."
    ),
    tags=("similarity", "llm", "pandas-udf", "profiling"),
)
def knn_hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    knn = _allknn_directed(spark, sf_dir, HUBNESS_K)
    occ = knn.groupBy(F.col("nbr_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_in")
    )
    ids = load_table(spark, sf_dir, "embeddings").select("vec_id").distinct()
    per_vec = ids.join(
        occ.withColumnRenamed("nbr_id", "vec_id"), "vec_id", "left"
    ).select(F.coalesce(F.col("n_in"), F.lit(0).cast("bigint")).alias("n_in"))
    return per_vec.groupBy("n_in").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors")
    )


# --- ZCA whitening audit ----------------------------------------------------

_WHITEN_EPS = 1e-6


def whitened_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding) with the ZCA whitening transform applied:
    W = U diag(1/sqrt(eig+eps)) U^T from the DISTRIBUTED covariance
    (embedding_covariance_spectrum's one-pass moment plan). The d x d
    triangle (d(d+1)/2 rows, bounded by DIMENSION, not corpus) is the
    only driver collect; the eigendecomposition is a d x d numpy problem;
    W broadcasts back into an Arrow mapInPandas GEMM — the same
    bounded-model/unbounded-data split as the IVF centroids."""
    import numpy as np
    import pandas as pd

    cov_rows = embedding_covariance_spectrum(spark, sf_dir).collect()
    d = max(r.j for r in cov_rows)
    C = np.zeros((d, d))
    for r in cov_rows:
        cov = cov_from_moments(r)
        C[r.i - 1, r.j - 1] = cov
        C[r.j - 1, r.i - 1] = cov
    mean_rows = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.posexplode("embedding").alias("i", "x"))
        .groupBy("i")
        .agg(F.avg("x").alias("mu"))
        .collect()
    )
    mu = np.zeros(d)
    for r in mean_rows:
        mu[r.i] = r.mu
    eig, U = np.linalg.eigh(C)
    Wm = U @ np.diag(1.0 / np.sqrt(np.maximum(eig, 0) + _WHITEN_EPS)) @ U.T
    bc = spark.sparkContext.broadcast((Wm, mu))

    def transform(batches):
        Wl, ml = bc.value
        for pdf in batches:
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            Xw = (X - ml) @ Wl.T
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "embedding": list(Xw)}
            )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return emb.mapInPandas(transform, "vec_id long, embedding array<double>")


@register(
    "embedding_whitening_audit",
    oracle=None,  # eigendecomposition is not SQL-expressible; the rows-only
    # driver check covers shape/stability and the pytest property gate
    # asserts cov(whitened) ~ I against numpy on the smoke fixture
    doc=(
        "ZCA WHITENING AUDIT: whiten the embedding store against its own "
        "covariance (W = U diag(1/sqrt(eig+eps)) U^T) and report per-"
        "dimension mean and variance of the whitened output — the "
        "preprocessing step that equalizes the spectrum before cosine "
        "retrieval (anisotropic embedding spaces rank by dominant "
        "directions; whitening is the standard fix, cf. the post-"
        "processing in similarity-search literature) and this audit is "
        "its acceptance test: var ~ 1 per dim, mean ~ 0. Plan: the "
        "covariance comes from the distributed one-pass moment operator "
        "(shuffle bounded by d^2, corpus-independent); only the d x d "
        "triangle is collected (bounded by DIMENSION); the eigh is a "
        "64 x 64 numpy call; the transform is a broadcast GEMM over "
        "Arrow batches — no corpus collect anywhere. Output is d rows. "
        "No SQL oracle (eigendecomposition); the property test gate "
        "verifies cov(whitened) ~ identity against numpy."
    ),
    tags=("similarity", "llm", "statistics", "pandas-udf", "scale"),
)
def embedding_whitening_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    wh = whitened_embeddings(spark, sf_dir)
    return (
        wh.select(F.posexplode("embedding").alias("dim", "x"))
        .groupBy("dim")
        .agg(
            F.round(F.avg("x"), 6).alias("mean_w"),
            F.round(F.var_pop("x"), 6).alias("var_w"),
        )
    )


# --- contrastive curation: hard negatives & coreset selection ---------------

_HN_ORACLE_CTE = """
    WITH e AS (
        SELECT vec_id, label, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ),
    dots AS (
        SELECT a.vec_id AS va, ANY_VALUE(a.label) AS la,
               b.vec_id AS vb, ANY_VALUE(b.label) AS lb,
               SUM(CAST(a.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS dot,
               SUM(CAST(a.x AS DOUBLE) * CAST(a.x AS DOUBLE)) AS na2,
               SUM(CAST(b.x AS DOUBLE) * CAST(b.x AS DOUBLE)) AS nb2
        FROM e a JOIN e b ON a.i = b.i AND a.vec_id <> b.vec_id
        GROUP BY a.vec_id, b.vec_id
    ),
    ranked AS (
        SELECT va, la, vb, lb,
               ROUND(dot / (sqrt(na2) * sqrt(nb2)), 6) AS cosine_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY va
                   ORDER BY ROUND(dot / (sqrt(na2) * sqrt(nb2)), 6) DESC, vb
               ) AS rnk
        FROM dots
        WHERE la <> lb
    )
"""


@register(
    "hard_negative_mining",
    oracle=_HN_ORACLE_CTE
    + """
        SELECT va AS vec_id, CAST(la AS BIGINT) AS label,
               vb AS negative_id, CAST(lb AS BIGINT) AS negative_label,
               cosine_sim
        FROM ranked WHERE rnk = 1
    """,
    doc=(
        "HARD-NEGATIVE MINING for contrastive / metric learning: for "
        "every vector, the single most-cosine-similar vector carrying a "
        "DIFFERENT label — the 'hardest negative' that contrastive "
        "objectives (InfoNCE, triplet) need per anchor, and the pair "
        "set a curation pipeline audits for label noise (a cross-label "
        "pair at cosine ~1 is usually a mislabel). Plan: the same "
        "B-block cell grid as the all-kNN operator — each cell's Arrow "
        "GEMM emits only each row's best CROSS-LABEL match within the "
        "cell (cell output = |rows|, never |rows|^2), then one window "
        "keyed on vec_id folds the <= B candidates into the global "
        "argmax; ties broken (sim DESC, id ASC) identically in the "
        "cell, the window, and the oracle, so per-cell truncation is "
        "lossless. Nothing collects; cell working set stays 2/B of the "
        "corpus. Exact-verified against the full O(n^2) DuckDB oracle."
    ),
    tags=("similarity", "llm", "pandas-udf", "scale"),
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    NB = N_SIM_BLOCKS
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    blk = F.pmod(F.col("vec_id"), F.lit(NB))
    cells = F.transform(
        F.sequence(F.lit(0), F.lit(NB - 1)),
        lambda m: F.least(blk, m) * NB + F.greatest(blk, m),
    )
    expl = emb.select(
        "vec_id",
        "label",
        "embedding",
        blk.alias("blk"),
        F.explode(F.array_distinct(cells)).alias("cell"),
    )

    def cell_best(pdf: pd.DataFrame) -> pd.DataFrame:
        cell = int(pdf["cell"].iloc[0])
        i, j = divmod(cell, NB)
        left = pdf[pdf["blk"] == i]
        right = pdf[pdf["blk"] == j]
        out = {"vec_id": [], "label": [], "negative_id": [],
               "negative_label": [], "cosine_sim": []}

        def emit(A_ids, A_lab, A, B_ids, B_lab, Bm) -> None:
            na = np.sqrt((A * A).sum(axis=1))
            nb = np.sqrt((Bm * Bm).sum(axis=1))
            sims = np.round((A @ Bm.T) / np.outer(na, nb), 6)
            # mask self and SAME-label pairs: negatives only
            sims[A_ids[:, None] == B_ids[None, :]] = -np.inf
            sims[A_lab[:, None] == B_lab[None, :]] = -np.inf
            for r in range(sims.shape[0]):
                order = np.lexsort((B_ids, -sims[r]))
                c = order[0]
                if sims[r][c] == -np.inf:
                    continue  # no cross-label vector in this cell
                out["vec_id"].append(A_ids[r])
                out["label"].append(A_lab[r])
                out["negative_id"].append(B_ids[c])
                out["negative_label"].append(B_lab[c])
                out["cosine_sim"].append(sims[r][c])

        if not left.empty and not right.empty:
            A = np.array(left["embedding"].tolist(), dtype=np.float64)
            Bm = np.array(right["embedding"].tolist(), dtype=np.float64)
            a_ids = left["vec_id"].to_numpy(dtype=np.int64)
            b_ids = right["vec_id"].to_numpy(dtype=np.int64)
            a_lab = left["label"].to_numpy(dtype=np.int64)
            b_lab = right["label"].to_numpy(dtype=np.int64)
            if i == j:
                emit(a_ids, a_lab, A, a_ids, a_lab, A)
            else:
                emit(a_ids, a_lab, A, b_ids, b_lab, Bm)
                emit(b_ids, b_lab, Bm, a_ids, a_lab, A)
        return pd.DataFrame(out)

    cand = expl.groupBy("cell").applyInPandas(
        cell_best,
        schema=(
            "vec_id long, label long, negative_id long, "
            "negative_label long, cosine_sim double"
        ),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cosine_sim"), F.asc("negative_id")
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .drop("rnk")
    )


KCENTER_K = 8


def _kcenter_oracle(k: int) -> str:
    """Unrolled greedy farthest-first traversal (the same generated-CTE
    trick as the k-means/PQ oracles): round r's center is the argmax of
    the running min-L2 to the chosen set, distances rounded to 6dp BEFORE
    the argmax in both engines so reassociation drift cannot flip it."""
    ctes = [
        """
        e AS (
            SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        ),
        n0 AS (SELECT MIN(vec_id) AS c FROM e),
        d1 AS MATERIALIZED (
            SELECT a.vec_id,
                   ROUND(SUM((CAST(a.x AS DOUBLE) - CAST(c.x AS DOUBLE)) ^ 2), 6)
                       AS dmin
            FROM e a
            JOIN e c ON c.i = a.i AND c.vec_id = (SELECT c FROM n0)
            GROUP BY a.vec_id
        )"""
    ]
    for r in range(1, k):
        ctes.append(
            f"""
        n{r} AS MATERIALIZED (
            SELECT vec_id AS c, dmin FROM d{r}
            ORDER BY dmin DESC, vec_id LIMIT 1
        ),
        d{r + 1} AS MATERIALIZED (
            SELECT p.vec_id, LEAST(p.dmin, nd.d) AS dmin
            FROM d{r} p JOIN (
                SELECT a.vec_id,
                       ROUND(SUM((CAST(a.x AS DOUBLE) - CAST(c.x AS DOUBLE)) ^ 2),
                             6) AS d
                FROM e a
                JOIN e c ON c.i = a.i AND c.vec_id = (SELECT c FROM n{r})
                GROUP BY a.vec_id
            ) nd USING (vec_id)
        )"""
        )
    rounds = ["SELECT 0 AS round, (SELECT c FROM n0) AS center_id, 0.0 AS sep_dist"]
    rounds += [
        f"SELECT {r} AS round, (SELECT c FROM n{r}) AS center_id,"
        f" (SELECT dmin FROM n{r}) AS sep_dist"
        for r in range(1, k)
    ]
    return (
        "WITH " + ",".join(ctes) + " " + "\nUNION ALL\n".join(rounds)
    )


@register(
    "kcenter_coreset",
    oracle=_kcenter_oracle(KCENTER_K),
    doc=(
        f"K-CENTER CORESET SELECTION (k={KCENTER_K}) by greedy "
        "farthest-first traversal (Gonzalez 1985, the 2-approximation "
        "for k-center): start from the min-id vector, then repeatedly "
        "take the point FARTHEST (L2) from the chosen set — the "
        "max-coverage subset used for diverse data selection, "
        "active-learning seed pools, and as k-means++-style "
        "initialization. Output is the selection trace (round, "
        "center_id, separation distance), whose sep_dist column is the "
        "standard diversity-vs-budget curve. Plan: the running "
        "min-distance column updates with ONE narrow zip_with "
        "projection per round against only the NEWEST center "
        "(broadcast scalar, no re-scan of the chosen set, no shuffle); "
        "the argmax is a 1-row TakeOrderedAndProject; lineage is "
        "truncated per round. Per-round cost is one corpus map — "
        "O(k * corpus) total, the textbook bound. Distances round to "
        "6dp BEFORE the argmax in both engines (sums of 64 doubles sit "
        "far inside 1e-6 reassociation tolerance) and ties break on "
        "vec_id, so the trace is hash-verified against the unrolled "
        "DuckDB recursion."
    ),
    tags=("similarity", "llm", "sampling", "iterative", "scale"),
)
def kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_stream_processor_spark.operators.dedup import _truncate_lineage

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    first = emb.agg(F.min("vec_id")).collect()[0][0]  # 1-row bounded

    def dist_to(center_vec) -> Column:
        carr = F.array(*[F.lit(float(v)) for v in center_vec])
        return F.round(
            F.aggregate(
                F.zip_with(
                    "embedding", carr, lambda a, b: (a.cast("double") - b) ** 2
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            6,
        )

    cvec = emb.filter(F.col("vec_id") == first).collect()[0].embedding
    cur = _truncate_lineage(
        emb.select("vec_id", "embedding", dist_to(cvec).alias("dmin"))
    )
    trace = [(0, int(first), 0.0)]
    for r in range(1, KCENTER_K):
        # 1-row argmax: the farthest point from the chosen set
        far = (
            cur.orderBy(F.desc("dmin"), F.asc("vec_id"))
            .select("vec_id", "dmin", "embedding")
            .limit(1)
            .collect()[0]
        )
        trace.append((r, int(far.vec_id), float(far.dmin)))
        if r < KCENTER_K - 1:
            cur = _truncate_lineage(
                cur.select(
                    "vec_id",
                    "embedding",
                    F.least("dmin", dist_to(far.embedding)).alias("dmin"),
                )
            )
    return emb.sparkSession.createDataFrame(
        trace, "round int, center_id long, sep_dist double"
    )


_NOISE_REVIEW = 0.8  # neighborhood-disagreement fraction that flags a label


@register(
    "knn_label_noise_scores",
    oracle=_ALLKNN_ORACLE_CTE
    + f"""
        , scored AS (
            SELECT k.va AS vec_id, ea.label,
                   SUM(CASE WHEN eb.label <> ea.label THEN 1 ELSE 0 END)
                       AS n_disagree,
                   COUNT(*) AS n_nbrs
            FROM (SELECT * FROM knn WHERE rnk <= {MUTUAL_K}) k
            JOIN embeddings ea ON ea.vec_id = k.va
            JOIN embeddings eb ON eb.vec_id = k.vb
            GROUP BY 1, 2
        )
        SELECT vec_id, label,
               CAST(n_disagree AS BIGINT) AS n_disagree,
               ROUND(n_disagree * 1.0 / n_nbrs, 6) AS noise_score,
               CASE WHEN n_disagree * 1.0 / n_nbrs >= {_NOISE_REVIEW}
                    THEN 'review' ELSE 'keep' END AS action
        FROM scored
    """,
    doc=(
        f"k-NN LABEL-NOISE SCORING (k={MUTUAL_K}): for every labeled "
        "vector, the fraction of its exact cosine top-k neighbors whose "
        "label DISAGREES with its own, plus the actionable verdict "
        f"(disagreement >= {_NOISE_REVIEW} -> 'review') — the "
        "neighborhood-consistency screen (confident-learning family, "
        "Northcutt et al.) that surfaces mislabeled training examples "
        "before they poison a classifier: a point deep inside another "
        "class's cluster is overwhelmingly outvoted by its neighbors. "
        "Plan: the SAME B-block all-kNN grid as mutual_knn_pairs / the "
        "hubness audit (per-cell Arrow GEMM top-k, |rows|*k cell output, "
        "never |rows|^2), then two vec_id-keyed equi-joins attach the "
        "self and neighbor labels (label table scales with the corpus — "
        "shuffled joins, not broadcasts) and one aggregate folds each "
        "neighborhood to a score. Exact-verified against the full "
        "O(n^2) DuckDB oracle. At 100 TB the grid is the cost and is "
        "shared infrastructure: noise scoring piggybacks on whichever "
        "kNN graph the pipeline already builds."
    ),
    tags=("similarity", "llm", "pandas-udf", "scale", "audit"),
)
def knn_label_noise_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    knn = _allknn_directed(spark, sf_dir, MUTUAL_K)
    lab = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    self_lab = lab.select(F.col("vec_id"), F.col("label"))
    nbr_lab = lab.select(
        F.col("vec_id").alias("nbr_id"), F.col("label").alias("nbr_label")
    )
    scored = (
        knn.join(self_lab, "vec_id")
        .join(nbr_lab, "nbr_id")
        .groupBy("vec_id", "label")
        .agg(
            F.sum((F.col("nbr_label") != F.col("label")).cast("int"))
            .cast("bigint")
            .alias("n_disagree"),
            F.count(F.lit(1)).alias("n_nbrs"),
        )
    )
    noise = F.col("n_disagree") / F.col("n_nbrs")
    return scored.select(
        "vec_id",
        "label",
        "n_disagree",
        F.round(noise, 6).alias("noise_score"),
        F.when(noise >= _NOISE_REVIEW, "review").otherwise("keep").alias("action"),
    )


# Deterministic Rademacher (+/-1) sign matrix for the JL projection:
# compile-time constants from the Knuth multiplicative hash, so BOTH
# engines consume identical literals and no cross-engine hash arithmetic
# runs at query time. JL_M=16 target dims from the 64-dim fixture space.
JL_M = 16
_JL_DIM = 64
_JL_SIGNS = [
    [
        1 if (((i * _JL_DIM + j + 1) * 2654435761) % (1 << 32)) < (1 << 31) else -1
        for i in range(_JL_DIM)
    ]
    for j in range(JL_M)
]


def _jl_oracle() -> str:
    y_cols = ",\n                   ".join(
        f"ROUND(list_inner_product(embedding::DOUBLE[], "
        f"[{', '.join(str(s) + '.0' for s in _JL_SIGNS[j])}]) / {JL_M**0.5!r}, 6)"
        f" AS y{j}"
        for j in range(JL_M)
    )
    d2_proj = " + ".join(f"(a.y{j} - b.y{j}) * (a.y{j} - b.y{j})" for j in range(JL_M))
    return f"""
        WITH proj AS (
            SELECT vec_id, embedding,
                   {y_cols}
            FROM embeddings
        ),
        pairs AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   ROUND(list_sum([(a.embedding[i]::DOUBLE
                                    - b.embedding[i]::DOUBLE)
                                   * (a.embedding[i]::DOUBLE
                                      - b.embedding[i]::DOUBLE)
                                   FOR i IN range(1, {_JL_DIM + 1})]), 6)
                       AS d2_orig,
                   ROUND({d2_proj}, 6) AS d2_proj
            FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1
        )
        SELECT vec_a, vec_b, d2_orig, d2_proj,
               ROUND(d2_proj / d2_orig, 6) AS ratio
        FROM pairs WHERE d2_orig > 0
    """


@register(
    "jl_projection_distortion",
    oracle=_jl_oracle(),
    doc=(
        f"JOHNSON-LINDENSTRAUSS PROJECTION + DISTORTION AUDIT: project "
        f"the {_JL_DIM}-dim embeddings to {JL_M} dims with a "
        "deterministic Rademacher sign matrix (y = Sx/sqrt(m); Achlioptas "
        "2003 — database-friendly random projections), then measure the "
        "squared-distance ratio d2_proj/d2_orig on the consecutive-id "
        "pair spine — the per-pair certificate of how much geometry a "
        "4x compression costs (JL: ratios concentrate near 1 with "
        "stddev ~ sqrt(2/m) ~ 0.35 at m=16). Complements "
        "embedding_truncation_energy (energy-based truncation) and the "
        "int8 quant audit with the projection-based third compression "
        "lever. Plan: the sign matrix is a COMPILE-TIME literal in both "
        "engines; the projection is m in-plan zip_with/aggregate HOFs "
        "per row (one scan, JVM codegen, no UDF, no shuffle); the pair "
        "spine is one self equi-join on vec_id+1 (shuffle keyed on "
        "vec_id — at 100 TB use a range-partitioned sort so consecutive "
        "ids co-locate); projections are 6dp-rounded BEFORE distances "
        "so both engines difference identical values. At 100 TB the "
        "projected table is the artifact (16/64 the bytes) and the "
        "audit rides along on the write pass."
    ),
    tags=("similarity", "llm", "scale", "audit"),
)
def jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def proj(j: int):
        signs = F.array(*[F.lit(float(s)) for s in _JL_SIGNS[j]])
        return F.round(
            F.aggregate(
                F.zip_with(
                    "embedding", signs, lambda a, b: a.cast("double") * b
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / F.lit(JL_M**0.5),
            6,
        ).alias(f"y{j}")

    p = emb.select("vec_id", "embedding", *[proj(j) for j in range(JL_M)])
    a = p.alias("a")
    b = p.alias("b")
    d2_orig = F.round(
        F.aggregate(
            F.zip_with(
                F.col("a.embedding"),
                F.col("b.embedding"),
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )
    d2_proj_expr = None
    for j in range(JL_M):
        t = (F.col(f"a.y{j}") - F.col(f"b.y{j}")) * (
            F.col(f"a.y{j}") - F.col(f"b.y{j}")
        )
        d2_proj_expr = t if d2_proj_expr is None else d2_proj_expr + t
    return (
        a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            d2_orig.alias("d2_orig"),
            F.round(d2_proj_expr, 6).alias("d2_proj"),
        )
        .filter(F.col("d2_orig") > 0)
        .select(
            "vec_a",
            "vec_b",
            "d2_orig",
            "d2_proj",
            F.round(F.col("d2_proj") / F.col("d2_orig"), 6).alias("ratio"),
        )
    )


# --- Local Outlier Factor (density-based outlier scores) --------------------

_LOF_K = 10


@register(
    "lof_outlier_scores",
    oracle=_ALLKNN_ORACLE_CTE
    + f""",
        knn_k AS (
            SELECT va, vb, ROUND(1 - cosine_sim, 6) AS dist
            FROM knn WHERE rnk <= {_LOF_K}
        ),
        kd AS (SELECT va AS v, MAX(dist) AS kdist FROM knn_k GROUP BY va),
        reach AS (
            SELECT k.va, k.vb, GREATEST(d.kdist, k.dist) AS rdist
            FROM knn_k k JOIN kd d ON d.v = k.vb
        ),
        lrd AS (
            SELECT va AS v,
                   ROUND({_LOF_K} / GREATEST(SUM(rdist), 1e-12), 6) AS lrd
            FROM reach GROUP BY va
        )
        SELECT k.va AS vec_id,
               ROUND(AVG(lo.lrd) / ANY_VALUE(lp.lrd), 4) AS lof,
               ROUND(ANY_VALUE(d.kdist), 6) AS k_distance
        FROM knn_k k
        JOIN lrd lo ON lo.v = k.vb
        JOIN lrd lp ON lp.v = k.va
        JOIN kd d ON d.v = k.va
        GROUP BY k.va
    """,
    doc=(
        f"LOCAL OUTLIER FACTOR (Breunig et al. 2000) over the embedding "
        f"corpus, k={_LOF_K}, cosine distance: per vector its LOF score "
        "(ratio of the average local reachability density of its "
        "neighbors to its own — ~1 inside a cluster of any density, >1 "
        "in sparse territory relative to its neighborhood) and its "
        "k-distance. LOF is the density-ADAPTIVE outlier screen a "
        "curation pipeline runs where a global distance threshold fails "
        "(a point 0.1 away from a tight cluster is anomalous; 0.1 away "
        "inside a diffuse cluster is normal). Plan: the exact kNN lists "
        "come from the same B-block grid as mutual_knn_pairs (per-cell "
        "Arrow GEMM top-k, cell output |rows|*k, never |rows|^2); "
        "everything after is keyed joins and hash aggregates over the "
        "O(n*k) neighbor table — k-distance (per-point max), "
        "reachability distances (join on the neighbor's k-distance), "
        "lrd (per-point sum), and the final neighbor-average ratio. "
        "Nothing corpus-quadratic, nothing driver-side. Distances are "
        "rounded to 6dp before ranking (the house rank-determinism "
        "rule), lrd to 6dp and LOF to 4dp so the two engines' float "
        "summation drift cannot flip the hash. Verified against the "
        "full O(n^2) DuckDB oracle."
    ),
    tags=("similarity", "llm", "curation", "pandas-udf", "scale", "headline"),
)
def lof_outlier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11 (guide §2.4): the LOF dataflow references knn_k / kd / lrd in
    # several subtrees each; without a materialization boundary Spark
    # re-expanded the whole B-block GEMM grid per reference (12 parquet
    # scans, 36 exchanges — the grid ran up to 12x). knn_k is O(n*k)
    # narrow rows, lrd O(n): lineage-cut both, so the GEMM runs ONCE and
    # everything downstream is keyed joins/aggregates over checkpoints.
    knn_k = truncate_lineage(
        _allknn_directed(spark, sf_dir, _LOF_K).select(
            F.col("vec_id").alias("va"),
            F.col("nbr_id").alias("vb"),
            F.round(1 - F.col("cosine_sim"), 6).alias("dist"),
        )
    )
    kd = knn_k.groupBy(F.col("va").alias("v")).agg(
        F.max("dist").alias("kdist")
    )
    reach = knn_k.join(kd, knn_k.vb == kd.v).select(
        "va", "vb", F.greatest("kdist", "dist").alias("rdist")
    )
    lrd = truncate_lineage(
        reach.groupBy(F.col("va").alias("v")).agg(
            F.round(
                F.lit(float(_LOF_K))
                / F.greatest(F.sum("rdist"), F.lit(1e-12)),
                6,
            ).alias("lrd")
        )
    )
    lo = lrd.select(F.col("v").alias("vb_"), F.col("lrd").alias("lrd_nbr"))
    lp = lrd.select(F.col("v").alias("va_"), F.col("lrd").alias("lrd_self"))
    return (
        knn_k.join(lo, knn_k.vb == F.col("vb_"))
        .join(lp, knn_k.va == F.col("va_"))
        .join(kd, knn_k.va == kd.v)
        .groupBy(F.col("va").alias("vec_id"))
        .agg(
            F.round(F.avg("lrd_nbr") / F.first("lrd_self"), 4).alias("lof"),
            F.round(F.first("kdist"), 6).alias("k_distance"),
        )
    )


# --- Simplified silhouette: clustering quality next to the kmeans tier -----


@register(
    "simplified_silhouette",
    oracle=f"""
        WITH assign AS ({_kmeans_oracle(_KMEANS_K, _KMEANS_ITERS)}),
        e AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        ),
        cent AS (
            SELECT a.cluster_id AS cid, e.i, ROUND(AVG(e.x), 6) AS cx
            FROM assign a JOIN e USING (vec_id)
            GROUP BY a.cluster_id, e.i
        ),
        d AS (
            SELECT e.vec_id, a.cluster_id, c.cid,
                   ROUND(SUM((e.x - c.cx) * (e.x - c.cx)), 6) AS d2
            FROM e
            JOIN assign a USING (vec_id)
            JOIN cent c ON c.i = e.i
            GROUP BY e.vec_id, a.cluster_id, c.cid
        ),
        ab AS (
            SELECT vec_id, cluster_id,
                   MAX(CASE WHEN cid = cluster_id THEN d2 END) AS a2,
                   MIN(CASE WHEN cid <> cluster_id THEN d2 END) AS b2
            FROM d GROUP BY vec_id, cluster_id
        ),
        s AS (
            SELECT cluster_id,
                   ROUND((SQRT(b2) - SQRT(a2))
                         / GREATEST(SQRT(a2), SQRT(b2), 1e-12), 6) AS sil
            FROM ab
        )
        SELECT cluster_id,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               ROUND(AVG(sil), 6) AS avg_silhouette,
               ROUND(MIN(sil), 6) AS min_silhouette
        FROM s GROUP BY cluster_id
    """,
    doc=(
        "SIMPLIFIED SILHOUETTE per cluster of the registered "
        f"deterministic k-means (k={_KMEANS_K}): s(i) = (b-a)/max(a,b) "
        "with a = distance to the OWN final centroid and b = distance to "
        "the nearest OTHER centroid — the centroid-based silhouette "
        "(Hruschka et al.) that replaces classic silhouette's O(n²) "
        "all-pairs mean distances with k centroid distances per point, "
        "which is the ONLY silhouette you can afford at 100 TB, and the "
        "quality gate that tells you whether the kmeans feeding the IVF "
        "index / cluster-balanced sampler actually separated anything "
        "(avg ~0: overlapping cells; negative min: misassigned points). "
        "Plan: reuses kmeans_embedding_clusters' registered execution "
        "verbatim, recomputes final centroids as one (cid, dim)-keyed "
        "aggregate (k x dim rows, broadcast back), scores each point "
        "against k broadcast centroids map-side, and folds to a k-row "
        "report. Distances rounded to 6dp before sqrt (IEEE sqrt is "
        "correctly rounded, so it is engine-exact on equal inputs); the "
        "oracle composes the kmeans oracle's CTE chain verbatim, so the "
        "hash certifies the full pipeline assignment->centroid->score."
    ),
    tags=("similarity", "llm", "clustering", "evals"),
)
def simplified_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_stream_processor_spark.registry import _REGISTRY

    assign = (
        _REGISTRY["kmeans_embedding_clusters"]
        .builder(spark, sf_dir)
        .select("vec_id", "cluster_id")
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    pts = emb.join(assign, "vec_id")
    cent = (
        pts.select("cluster_id", F.posexplode("v").alias("i", "x"))
        .groupBy("cluster_id", "i")
        .agg(F.round(F.avg("x"), 6).alias("cx"))
        .groupBy("cluster_id")
        .agg(F.array_sort(F.collect_list(F.struct("i", "cx"))).alias("sx"))
        .select(
            F.col("cluster_id").alias("cid"),
            F.transform("sx", lambda s: s.getField("cx")).alias("c"),
        )
    )
    d2 = F.round(
        F.aggregate(
            F.zip_with(F.col("v"), F.col("c"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, z: acc + z,
        ),
        6,
    )
    d = pts.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cluster_id", "cid", d2.alias("d2")
    )
    ab = d.groupBy("vec_id", "cluster_id").agg(
        F.max(F.when(F.col("cid") == F.col("cluster_id"), F.col("d2"))).alias(
            "a2"
        ),
        F.min(F.when(F.col("cid") != F.col("cluster_id"), F.col("d2"))).alias(
            "b2"
        ),
    )
    sil = F.round(
        (F.sqrt("b2") - F.sqrt("a2"))
        / F.greatest(F.sqrt("a2"), F.sqrt("b2"), F.lit(1e-12)),
        6,
    )
    return (
        ab.select("cluster_id", sil.alias("sil"))
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.round(F.avg("sil"), 6).alias("avg_silhouette"),
            F.round(F.min("sil"), 6).alias("min_silhouette"),
        )
    )


# --- MMR diversified rerank: the retrieval-side diversity selector ----------

_MMR_POOL = 30
_MMR_K = 10
_MMR_LAMBDA = 0.7


def _mmr_oracle(pool: int, k: int, lam: float) -> str:
    """Unrolled greedy MMR selection (same generated-CTE trick as the
    k-center trace): round r picks argmax of lam*rel - (1-lam)*max-sim-
    to-selected over the remaining pool, scores rounded to 6dp before
    the argmax, vec_id tie-break."""
    parts = [
        _COSINE_ORACLE_CTE.format(n_queries=1)
        + f""",
    pool AS (SELECT vec_id, cosine_sim AS rel FROM sims WHERE rn <= {pool}),
    pe AS (
        SELECT e.vec_id, e.i, CAST(e.ex AS DOUBLE) AS x
        FROM e JOIN pool p ON p.vec_id = e.vec_id
    ),
    ps AS (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               ROUND(SUM(a.x * b.x)
                     / (sqrt(SUM(a.x * a.x)) * sqrt(SUM(b.x * b.x))), 6)
                   AS sim
        FROM pe a JOIN pe b ON a.i = b.i AND a.vec_id <> b.vec_id
        GROUP BY 1, 2
    ),
    n0 AS MATERIALIZED (
        SELECT vec_id, rel, rel AS mmr FROM pool
        ORDER BY rel DESC, vec_id LIMIT 1
    ),
    sel0 AS (SELECT vec_id FROM n0)"""
    ]
    for r in range(1, k):
        parts.append(
            f""",
    n{r} AS MATERIALIZED (
        SELECT p.vec_id, p.rel,
               ROUND({lam} * p.rel - {1 - lam} * MAX(ps.sim), 6) AS mmr
        FROM pool p
        JOIN ps ON ps.va = p.vec_id
               AND ps.vb IN (SELECT vec_id FROM sel{r - 1})
        WHERE p.vec_id NOT IN (SELECT vec_id FROM sel{r - 1})
        GROUP BY p.vec_id, p.rel
        ORDER BY mmr DESC, p.vec_id LIMIT 1
    ),
    sel{r} AS (SELECT vec_id FROM sel{r - 1}
               UNION ALL SELECT vec_id FROM n{r})"""
        )
    rounds = [
        f"SELECT {r + 1} AS mmr_rank, vec_id, rel AS relevance,"
        f" mmr AS mmr_score FROM n{r}"
        for r in range(k)
    ]
    return "WITH " + "".join(parts)[9:] + "\n" + "\nUNION ALL\n".join(rounds)


@register(
    "mmr_diversified_rerank",
    oracle=_mmr_oracle(_MMR_POOL, _MMR_K, _MMR_LAMBDA),
    doc=(
        f"MAXIMAL MARGINAL RELEVANCE rerank (Carbonell & Goldstein "
        f"1998): from the top-{_MMR_POOL} cosine candidates for query "
        f"vector 0, greedily select {_MMR_K} results maximizing "
        f"lambda*relevance - (1-lambda)*max-similarity-to-already-"
        f"selected (lambda={_MMR_LAMBDA}) — the diversity-aware rerank "
        "every RAG retriever needs when the raw top-k is ten paraphrases "
        "of the same passage (near-dup corpora make this the default, "
        "not the exception). Plan: the corpus-sized work is ONLY the "
        "top-pool TakeOrderedAndProject over the broadcast-query scan; "
        f"the greedy loop runs on the {_MMR_POOL}-row pool — a bounded "
        "driver pull of the same documented class as the PQ codebooks "
        "and NTILE cutoffs (pool size is fixed by the API, independent "
        "of corpus scale). Relevance is rounded in-plan BEFORE the pool "
        "cut; pool pairwise sims and MMR scores round to 6dp before "
        "every argmax with vec_id tie-breaks, so the greedy trace "
        "hash-matches the unrolled DuckDB recursion."
    ),
    tags=("similarity", "llm", "retrieval", "headline"),
)
def mmr_diversified_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_embedding"), F.col("nrm").alias("q_nrm")
    )
    pool = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(_pair_cosine(), 6).alias("rel"),
            "embedding",
        )
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(_MMR_POOL)
        .collect()  # bounded pool pull (_MMR_POOL rows), documented above
    )
    ids = np.array([r.vec_id for r in pool], dtype=np.int64)
    rels = np.array([r.rel for r in pool], dtype=np.float64)
    mat = np.array([r.embedding for r in pool], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    sims = np.round((mat @ mat.T) / np.outer(norms, norms), 6)

    chosen: list[int] = []
    trace = []
    remaining = list(range(len(ids)))
    for rank in range(1, _MMR_K + 1):
        if rank == 1:
            scores = {i: rels[i] for i in remaining}
        else:
            scores = {
                i: round(
                    _MMR_LAMBDA * rels[i]
                    - (1 - _MMR_LAMBDA) * max(sims[i, j] for j in chosen),
                    6,
                )
                for i in remaining
            }
        best = min(remaining, key=lambda i: (-scores[i], ids[i]))
        trace.append(
            (rank, int(ids[best]), float(rels[best]), float(scores[best]))
        )
        chosen.append(best)
        remaining.remove(best)
    return spark.createDataFrame(
        trace, "mmr_rank int, vec_id long, relevance double, mmr_score double"
    )


# ---------------------------------------------------------------------------
# Binary (sign) quantization recall (round-5j): completes the compression
# family — int8 (quant error), PQ (trained codes), and now 1-bit signs.
# ---------------------------------------------------------------------------

_BQ_NQ = 8  # same query convention as knn_join_topk
_BQ_K = 10


def _bq_words_sql() -> str:
    """sketch(vec_id, w0, w1): 64 sign bits packed into two bigints
    (dims 1-32 and 33-64; bit 63 of a single word would collide with the
    sign bit)."""
    return """
        sk AS (
            SELECT vec_id,
                   CAST(SUM(CASE WHEN i <= 32 AND x > 0
                                 THEN (CAST(1 AS BIGINT) << (i - 1))
                                 ELSE 0 END) AS BIGINT) AS w0,
                   CAST(SUM(CASE WHEN i > 32 AND x > 0
                                 THEN (CAST(1 AS BIGINT) << (i - 33))
                                 ELSE 0 END) AS BIGINT) AS w1
            FROM (SELECT vec_id, unnest(embedding) AS x,
                         generate_subscripts(embedding, 1) AS i
                  FROM embeddings)
            GROUP BY vec_id
        )
    """


@register(
    "binary_quant_recall",
    oracle=f"""
        WITH {_bq_words_sql()},
        e AS (
            SELECT vec_id, unnest(embedding) AS ex,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        ),
        nrm AS (
            SELECT vec_id, sqrt(SUM(CAST(ex AS DOUBLE) * ex)) AS nrm
            FROM e GROUP BY vec_id
        ),
        q AS (SELECT vec_id AS qid, i, ex AS qx FROM e WHERE vec_id < {_BQ_NQ}),
        cos AS (
            SELECT q.qid, e.vec_id,
                   ROUND(SUM(CAST(e.ex AS DOUBLE) * q.qx)
                         / (nq.nrm * ne.nrm), 6) AS sim
            FROM e JOIN q USING (i)
            JOIN nrm nq ON nq.vec_id = q.qid
            JOIN nrm ne ON ne.vec_id = e.vec_id
            WHERE e.vec_id <> q.qid
            GROUP BY q.qid, e.vec_id, nq.nrm, ne.nrm
        ),
        exact_top AS (
            SELECT qid, vec_id FROM cos
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY qid ORDER BY sim DESC, vec_id ASC) <= {_BQ_K}
        ),
        ham AS (
            SELECT sq.vec_id AS qid, sv.vec_id,
                   bit_count(xor(sq.w0, sv.w0))
                   + bit_count(xor(sq.w1, sv.w1)) AS hd
            FROM sk sq JOIN sk sv ON sv.vec_id <> sq.vec_id
            WHERE sq.vec_id < {_BQ_NQ}
        ),
        bin_top AS (
            SELECT qid, vec_id FROM ham
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY qid ORDER BY hd ASC, vec_id ASC) <= {_BQ_K}
        )
        SELECT e.qid,
               CAST(COUNT(b.vec_id) AS BIGINT) AS n_overlap,
               ROUND(COUNT(b.vec_id) * 1.0 / {_BQ_K}, 6) AS recall_at_k
        FROM exact_top e
        LEFT JOIN bin_top b USING (qid, vec_id)
        GROUP BY e.qid
    """,
    doc=(
        "BINARY (SIGN) QUANTIZATION RECALL: embeddings compress to one "
        "bit per dimension (64 dims -> two bigint words, a 32x "
        "compression), candidate ranking becomes XOR + popcount, and "
        f"the operator scores recall@{_BQ_K} of the Hamming top-k "
        "against the exact cosine top-k for the same {n} query vectors "
        "— the cheapest tier of the compression ladder next to "
        "embedding_int8_quant_error (8-bit) and ann_pq_topk (trained "
        "codes), and the measurement that tells you whether 1-bit "
        "sketches suffice as a FIRST-PASS filter before exact rerank "
        "(sign-sketch Hamming ~ angle, the SimHash identity). Plan: the "
        "sketch is one aggregate over the exploded corpus (per-row "
        "state: two longs); the Hamming join ships only (vec_id, w0, "
        "w1) — 16 bytes/vector instead of 256 — broadcast on the "
        f"{_BQ_NQ}-query side; both top-k windows partition per query. "
        "Integer bit arithmetic end to end, so the oracle hash is "
        "exact.".replace("{n}", str(_BQ_NQ))
    ),
    tags=("similarity", "llm", "quantization"),
)
def binary_quant_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _with_norm(load_table(spark, sf_dir, "embeddings"))
    bit = lambda i, base: F.when(  # noqa: E731
        F.element_at("embedding", i + 1).cast("double") > 0,
        F.shiftleft(F.lit(1).cast("bigint"), i - base),
    ).otherwise(F.lit(0).cast("bigint"))
    w0 = None
    w1 = None
    for i in range(32):
        w0 = bit(i, 0) if w0 is None else w0 + bit(i, 0)
    for i in range(32, 64):
        w1 = bit(i, 32) if w1 is None else w1 + bit(i, 32)
    sk = emb.select("vec_id", w0.alias("w0"), w1.alias("w1"))

    q = emb.filter(F.col("vec_id") < _BQ_NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_embedding"),
        F.col("nrm").alias("q_nrm"),
    )
    cos = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", F.round(_pair_cosine(), 6).alias("sim"))
    )
    w_cos = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    exact_top = (
        cos.withColumn("rn", F.row_number().over(w_cos))
        .filter(F.col("rn") <= _BQ_K)
        .select("qid", "vec_id")
    )

    sq = sk.filter(F.col("vec_id") < _BQ_NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("w0").alias("qw0"),
        F.col("w1").alias("qw1"),
    )
    ham = (
        sk.crossJoin(F.broadcast(sq))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            (
                F.bit_count(F.col("w0").bitwiseXOR(F.col("qw0")))
                + F.bit_count(F.col("w1").bitwiseXOR(F.col("qw1")))
            ).alias("hd"),
        )
    )
    w_ham = Window.partitionBy("qid").orderBy(F.asc("hd"), F.asc("vec_id"))
    bin_top = (
        ham.withColumn("rn", F.row_number().over(w_ham))
        .filter(F.col("rn") <= _BQ_K)
        .select("qid", F.col("vec_id").alias("b_vec_id"))
    )
    return (
        exact_top.join(
            bin_top,
            (exact_top.qid == bin_top.qid)
            & (exact_top.vec_id == bin_top.b_vec_id),
            "left",
        )
        .groupBy(exact_top.qid)
        .agg(
            F.count("b_vec_id").cast("bigint").alias("n_overlap"),
            F.round(F.count("b_vec_id") * F.lit(1.0) / _BQ_K, 6).alias(
                "recall_at_k"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Orthogonal Procrustes alignment (round-5y): how far has an embedding
# space rotated/distorted between two versions — measured properly.
# ---------------------------------------------------------------------------


@register(
    "embedding_procrustes_drift",
    oracle=None,  # SVD-based: the rotation solve is numpy LAPACK on the
    # bounded d x d cross-covariance; pytest re-derives the full
    # procrustes solution in numpy and checks orthogonality + residual
    # bounds (tests/test_labeling.py)
    doc=(
        "ORTHOGONAL PROCRUSTES DRIFT between two versions of the "
        "embedding space — here the original vectors X and their "
        "int8-quantized reconstruction Y (the registered quantization "
        "from embedding_int8_quant_error), the stand-in for 'same "
        "corpus re-embedded by a new model checkpoint'. R = argmin "
        "over rotations of ||YR - X||_F solves in closed form from the "
        "SVD of M = Y^T X; the report gives the singular-value "
        "spectrum of M (where the alignment energy lives), ||R - I||_F "
        "(how much the space actually rotated), and the relative "
        "alignment residual (distortion no rotation can undo — for "
        "quantization this IS the quantization noise, cross-checked "
        "against embedding_int8_quant_error's MSE). The 100 TB shape "
        "is the covariance_spectrum pattern: per-partition numpy "
        "accumulates the d x d cross-covariance and the two norms "
        "(mapInPandas, Arrow), shuffle is O(#partitions * d^2), and "
        "the SVD runs driver-side on the d x d matrix — corpus size "
        "changes the VALUES, never the solve. Per-dim quantization "
        "ranges are a bounded 2xd collect broadcast into the workers."
    ),
    tags=("similarity", "llm", "quantization", "iterative"),
)
def embedding_procrustes_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    ranges = (
        emb.select(F.posexplode("v").alias("i", "x"))
        .groupBy("i")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .collect()
    )  # bounded: one row per dimension
    d = len(ranges)
    lo = np.zeros(d)
    hi = np.zeros(d)
    for r in ranges:
        lo[r.i] = r.lo
        hi[r.i] = r.hi
    scale = np.where(hi > lo, (hi - lo) / 255.0, 1.0)

    part_schema = StructType(
        [
            StructField("i", LongType()),
            StructField("j", LongType()),
            StructField("m", DoubleType()),
            StructField("xx", DoubleType()),
            StructField("yy", DoubleType()),
        ]
    )

    def local_cross(batches):
        M = np.zeros((d, d))
        xx = yy = 0.0
        seen = False
        for pdf in batches:
            X = np.array(pdf["v"].tolist(), dtype=np.float64)
            if len(X) == 0:
                continue
            seen = True
            code = np.where(
                hi > lo, np.floor((X - lo) / scale + 0.5), 0.0
            )
            Y = lo + code * scale
            M += Y.T @ X
            xx += float((X * X).sum())
            yy += float((Y * Y).sum())
        if not seen:
            return
        ii, jj = np.meshgrid(range(d), range(d), indexing="ij")
        yield pd.DataFrame(
            {
                "i": ii.ravel().astype(np.int64),
                "j": jj.ravel().astype(np.int64),
                "m": M.ravel(),
                "xx": np.full(d * d, xx / (d * d)),
                "yy": np.full(d * d, yy / (d * d)),
            }
        )

    partials = spread(emb, "vec_id").mapInPandas(local_cross, schema=part_schema)
    agg = (
        partials.groupBy("i", "j")
        .agg(
            F.sum("m").alias("m"),
            F.sum("xx").alias("xx"),
            F.sum("yy").alias("yy"),
        )
        .collect()
    )  # bounded: d^2 rows
    M = np.zeros((d, d))
    xx = yy = 0.0
    for r in agg:
        M[int(r.i), int(r.j)] = r.m
    # the per-cell xx/yy carry the partition totals split over d^2 cells
    xx = sum(r.xx for r in agg)
    yy = sum(r.yy for r in agg)
    U, sig, Vt = np.linalg.svd(M)
    R = U @ Vt
    rot_dev = float(np.linalg.norm(R - np.eye(d)))
    resid2 = max(0.0, xx + yy - 2.0 * float(sig.sum()))
    resid_rel = float(np.sqrt(resid2) / np.sqrt(xx))
    energy = np.cumsum(sig) / sig.sum()
    out = [
        (
            k + 1,
            round(float(sig[k]), 4),
            round(float(energy[k]), 6),
            round(rot_dev, 6),
            round(resid_rel, 6),
        )
        for k in range(d)
    ]
    schema = StructType(
        [
            StructField("k", LongType(), False),
            StructField("sigma", DoubleType(), False),
            StructField("cum_energy", DoubleType(), False),
            StructField("rotation_dev", DoubleType(), False),
            StructField("alignment_residual", DoubleType(), False),
        ]
    )
    return spark.createDataFrame(out, schema)


# --- Round-6: intrinsic dimension + triplet mining ---------------------------

# Shared integer lift for exact cross-engine distance arithmetic: cells ->
# floor(x*1e4 + 0.5) as int64 (same IEEE expression in Spark SQL and
# DuckDB), so squared L2 distances and dot products are EXACT integer sums
# — permutation-invariant, hash-stable at any partitioning (the
# embedding_covariance_spectrum fix, reused as this family's convention).
_LIFT_SPARK = "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000.0 + 0.5) AS BIGINT))"
_LIFT_DUCK = "[CAST(floor(CAST(u AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) FOR u IN embedding]"


@register(
    "twonn_intrinsic_dimension",
    oracle=f"""
        WITH k AS (
            SELECT vec_id, {_LIFT_DUCK} AS kv FROM embeddings
        ),
        d AS (
            SELECT a.vec_id,
                   b.vec_id AS nb_id,
                   CAST(list_sum([(a.kv[i] - b.kv[i]) * (a.kv[i] - b.kv[i])
                                  FOR i IN range(1, len(a.kv) + 1)])
                        AS BIGINT) AS dist_sq
            FROM k a JOIN k b ON a.vec_id <> b.vec_id
        ),
        ranked AS (
            SELECT vec_id, nb_id, dist_sq,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id ORDER BY dist_sq, nb_id
                   ) AS rn
            FROM d WHERE dist_sq > 0
        )
        SELECT r1.vec_id,
               r1.nb_id AS nn1_id,
               r2.nb_id AS nn2_id,
               r1.dist_sq AS d1_sq,
               r2.dist_sq AS d2_sq,
               ROUND(CAST(r2.dist_sq AS DOUBLE) / r1.dist_sq, 6) AS mu_sq
        FROM ranked r1 JOIN ranked r2
          ON r1.vec_id = r2.vec_id AND r1.rn = 1 AND r2.rn = 2
    """,
    doc=(
        "TwoNN INTRINSIC-DIMENSION statistics (Facco et al. 2017, the "
        "estimator data-pruning work uses to measure how 'thin' an "
        "embedding manifold really is): per vector, its two nearest "
        "non-coincident neighbors by EXACT squared L2 and the ratio "
        "mu^2 = d2^2/d1^2; the global estimate d_hat = n / sum(ln mu) "
        "follows in the (libm-free) property test — ln differs across "
        "engines' math libraries, so the hashed surface stays on exact "
        "integers plus ONE rounded division. Cells are integer-lifted "
        "(floor(x*1e4+0.5), identical IEEE expression both engines), so "
        "every distance is an exact int64 and the ranking is untieable "
        "drift-free; coincident clones (dist 0) are excluded from the "
        "neighbor set, as the estimator requires. Exact O(n^2) baseline "
        "by design — the scale path is the registered ANN family "
        "(LSH/IVF candidates feeding the same ranking), mirroring "
        "mutual_knn_pairs' exact-oracle convention."
    ),
    tags=("similarity", "llm", "statistics", "curation"),
)
def twonn_intrinsic_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_LIFT_SPARK).alias("kv")
    )
    a = spread(emb, "vec_id").alias("a")
    b = emb.alias("b")
    dist_sq = F.aggregate(
        F.zip_with("a.kv", "b.kv", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, z: acc + z,
    )
    d = (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("nb_id"),
            dist_sq.alias("dist_sq"),
        )
        .filter(F.col("dist_sq") > 0)
    )
    w = Window.partitionBy("vec_id").orderBy("dist_sq", "nb_id")
    ranked = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    r1 = ranked.filter(F.col("rn") == 1).select(
        "vec_id", F.col("nb_id").alias("nn1_id"), F.col("dist_sq").alias("d1_sq")
    )
    r2 = ranked.filter(F.col("rn") == 2).select(
        "vec_id", F.col("nb_id").alias("nn2_id"), F.col("dist_sq").alias("d2_sq")
    )
    return r1.join(r2, "vec_id").select(
        "vec_id",
        "nn1_id",
        "nn2_id",
        "d1_sq",
        "d2_sq",
        F.round(F.col("d2_sq").cast("double") / F.col("d1_sq"), 6).alias("mu_sq"),
    )


@register(
    "triplet_mining",
    oracle=f"""
        WITH k AS (
            SELECT vec_id, label, {_LIFT_DUCK} AS kv FROM embeddings
        ),
        p AS (
            SELECT a.vec_id, a.label,
                   b.vec_id AS nb_id, b.label AS nb_label,
                   CAST(list_sum([a.kv[i] * b.kv[i]
                                  FOR i IN range(1, len(a.kv) + 1)])
                        AS BIGINT) AS dot_i
            FROM k a JOIN k b ON a.vec_id <> b.vec_id
        ),
        pos AS (
            SELECT vec_id, nb_id AS pos_id, dot_i AS pos_dot
            FROM (SELECT vec_id, nb_id, dot_i,
                         ROW_NUMBER() OVER (
                             PARTITION BY vec_id ORDER BY dot_i DESC, nb_id
                         ) AS rn
                  FROM p WHERE label = nb_label)
            WHERE rn = 1
        ),
        neg AS (
            SELECT vec_id, nb_id AS neg_id, dot_i AS neg_dot
            FROM (SELECT vec_id, nb_id, dot_i,
                         ROW_NUMBER() OVER (
                             PARTITION BY vec_id ORDER BY dot_i DESC, nb_id
                         ) AS rn
                  FROM p WHERE label <> nb_label)
            WHERE rn = 1
        )
        SELECT vec_id, pos_id, neg_id, pos_dot, neg_dot,
               pos_dot - neg_dot AS margin_i
        FROM pos JOIN neg USING (vec_id)
    """,
    doc=(
        "TRIPLET MINING for contrastive / metric learning: for every "
        "anchor, the hardest POSITIVE to keep (most-similar same-label "
        "vector — batch-hard triplet loss pairs it with the hardest "
        "negative) and the hardest NEGATIVE (most-similar different-label "
        "vector, as in hard_negative_mining), plus the integer margin "
        "between them — the quantity a triplet loss drives positive. "
        "Similarity is the EXACT integer-lifted dot product (floor(x*1e4 "
        "+0.5) cells; unnormalized dot is rank-equivalent to cosine on "
        "this fixture's near-constant-norm vectors and keeps the hashed "
        "surface divisionless). Deterministic min-id tie-breaks. Exact "
        "O(n^2) baseline like its siblings (mutual_knn_pairs, "
        "hard_negative_mining); at 100 TB the candidate set comes from "
        "the ANN family and per-label block GEMMs — same ranking, "
        "bounded candidates."
    ),
    tags=("similarity", "llm", "curation", "contrastive"),
)
def triplet_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.expr(_LIFT_SPARK).alias("kv")
    )
    a = spread(emb, "vec_id").alias("a")
    b = emb.alias("b")
    dot_i = F.aggregate(
        F.zip_with("a.kv", "b.kv", lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, z: acc + z,
    )
    p = a.join(b, F.col("a.vec_id") != F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("a.label").alias("label"),
        F.col("b.vec_id").alias("nb_id"),
        F.col("b.label").alias("nb_label"),
        dot_i.alias("dot_i"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("dot_i"), F.asc("nb_id"))
    pos = (
        p.filter(F.col("label") == F.col("nb_label"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("nb_id").alias("pos_id"), F.col("dot_i").alias("pos_dot"))
    )
    neg = (
        p.filter(F.col("label") != F.col("nb_label"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("nb_id").alias("neg_id"), F.col("dot_i").alias("neg_dot"))
    )
    return pos.join(neg, "vec_id").select(
        "vec_id",
        "pos_id",
        "neg_id",
        "pos_dot",
        "neg_dot",
        (F.col("pos_dot") - F.col("neg_dot")).alias("margin_i"),
    )


# --- Round-6: Frequent Directions matrix sketch -------------------------------

_FD_ELL = 16  # sketch rows (error bound ||A'A - B'B||_2 <= ||A||_F^2 / (ell/2))


@register(
    "frequent_directions_sketch",
    oracle=None,  # SVD-based shrinkage is not SQL-reproducible; the
    # spectral error bound and Frobenius accounting are pytest-gated
    # against the exact integer-lifted Gram (embedding_covariance_spectrum)
    doc=(
        "FREQUENT DIRECTIONS matrix sketch (Liberty 2013 / Ghashami et "
        f"al. 2016): a {_FD_ELL}-row deterministic sketch B of the "
        "n x d embedding matrix A with the PROVABLE spectral guarantee "
        "||A'A - B'B||_2 <= ||A||_F^2 / (ell/2) — the streaming/"
        "mergeable way to carry second-moment structure (PCA direction "
        "estimates, lever-score proxies) at 100 TB where even the d x d "
        "Gram is too hot to recompute per consumer. Plan: each "
        "partition folds its rows into a local ell-row sketch (SVD "
        "shrink every time the buffer fills — O(ell*d) state, Arrow "
        "batches); local sketches are FD-MERGED (concatenate + one "
        "shrink — FD's mergeability theorem) into the final B via a "
        "single bounded reduce (#partitions x ell x d floats, ~128 KB "
        "here). Output is long-form scalars: the sketch's singular "
        "values and per-dimension row norms. Registered rows-only: SVD "
        "sign/rounding is not cross-engine-reproducible; correctness "
        "is the spectral-bound property test against the exact "
        "integer-lifted Gram, which IS hash-verified."
    ),
    tags=("similarity", "llm", "sketch", "pandas-udf", "scale"),
)
def frequent_directions_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    ell = _FD_ELL
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def _shrink(buf: "np.ndarray") -> "np.ndarray":
        _, s, vt = np.linalg.svd(buf, full_matrices=False)
        delta = s[ell - 1] ** 2 if len(s) >= ell else 0.0
        s2 = np.sqrt(np.maximum(s**2 - delta, 0.0))
        return (s2[:, None] * vt)[:ell]

    part_schema = StructType(
        [
            StructField("row_idx", IntegerType()),
            StructField("dim", IntegerType()),
            StructField("val", DoubleType()),
        ]
    )

    def local_fd(batches):
        buf = None
        for pdf in batches:
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            if len(X) == 0:
                continue
            buf = X if buf is None else np.vstack([buf, X])
            while buf.shape[0] >= 2 * ell:
                buf = np.vstack([_shrink(buf[: 2 * ell]), buf[2 * ell :]])
        if buf is None:
            return
        sk = _shrink(buf) if buf.shape[0] > ell else buf
        i, j = np.indices(sk.shape)
        yield pd.DataFrame(
            {
                "row_idx": i.ravel().astype(np.int32),
                "dim": j.ravel().astype(np.int32),
                "val": sk.ravel(),
            }
        )

    partials = spread(emb, "vec_id").mapInPandas(local_fd, schema=part_schema)
    # FD merge: concatenate all partition sketches (bounded: #partitions x
    # ell x d values) and shrink once — coalesce(1) is a bounded reduce of
    # sketch rows, never corpus rows
    merged_in = partials.coalesce(1)

    out_schema = StructType(
        [
            StructField("stat", StringType()),
            StructField("idx", IntegerType()),
            StructField("value", DoubleType()),
        ]
    )

    def merge_fd(batches):
        rows = pd.concat(list(batches), ignore_index=True)
        if rows.empty:
            return
        d = int(rows["dim"].max()) + 1
        # rebuild each partition sketch (row-major by (row order within
        # the arriving frame)) then stack and shrink once
        n = len(rows) // d
        stacked = np.zeros((n, d))
        # rows arrive grouped per original sketch row
        key = rows.index.values // d
        stacked[key, rows["dim"].values] = rows["val"].values
        sk = _shrink(stacked) if stacked.shape[0] > ell else stacked
        svals = np.linalg.svd(sk, compute_uv=False)
        out = [("sigma", int(i), float(round(v, 6))) for i, v in enumerate(svals)]
        out += [
            ("dim_norm", int(j), float(round(np.linalg.norm(sk[:, j]), 6)))
            for j in range(sk.shape[1])
        ]
        yield pd.DataFrame(out, columns=["stat", "idx", "value"])

    return merged_in.mapInPandas(merge_fd, schema=out_schema)


# --- Round-6: linear CKA between the space and its matryoshka truncation ------

_CKA_TRUNC_D = 16  # truncated prefix dimensionality (matryoshka cut)
_CKA_LIFT = "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100.0 + 0.5) AS BIGINT))"
_CKA_LIFT_DUCK = "[CAST(floor(CAST(u AS DOUBLE) * 100.0 + 0.5) AS BIGINT) FOR u IN embedding]"


@register(
    "linear_cka_truncation_audit",
    oracle=f"""
        WITH k AS (
            SELECT vec_id, {_CKA_LIFT_DUCK} AS kv FROM embeddings
        ),
        e AS (
            SELECT vec_id, generate_subscripts(kv, 1) AS i, unnest(kv) AS x
            FROM k
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM k),
        s AS (SELECT i, CAST(SUM(x) AS BIGINT) AS sx FROM e GROUP BY i),
        graw AS (
            SELECT a.i AS i, b.i AS j, CAST(SUM(a.x * b.x) AS BIGINT) AS g
            FROM e a JOIN e b ON a.vec_id = b.vec_id
            GROUP BY 1, 2
        ),
        gc AS (
            SELECT g.i, g.j,
                   CAST(n.n AS HUGEINT) * g.g
                       - CAST(sa.sx AS HUGEINT) * sb.sx AS c
            FROM graw g
            CROSS JOIN n
            JOIN s sa ON sa.i = g.i
            JOIN s sb ON sb.i = g.j
        ),
        fro AS (
            SELECT
                SUM(CASE WHEN i <= {_CKA_TRUNC_D} AND j <= {_CKA_TRUNC_D}
                         THEN CAST(c AS HUGEINT) * c ELSE 0 END) AS fyy2,
                SUM(CASE WHEN j <= {_CKA_TRUNC_D}
                         THEN CAST(c AS HUGEINT) * c ELSE 0 END) AS fxy2,
                SUM(CAST(c AS HUGEINT) * c) AS fxx2
            FROM gc
        )
        SELECT ROUND(CAST(fxy2 AS DOUBLE)
                     / (sqrt(CAST(fxx2 AS DOUBLE))
                        * sqrt(CAST(fyy2 AS DOUBLE))), 6) AS cka,
               CAST(FLOOR(sqrt(CAST(fxx2 AS DOUBLE))) AS BIGINT) AS fro_xx,
               CAST(FLOOR(sqrt(CAST(fyy2 AS DOUBLE))) AS BIGINT) AS fro_yy,
               CAST(FLOOR(sqrt(CAST(fxy2 AS DOUBLE))) AS BIGINT) AS fro_xy
        FROM fro
    """,
    doc=(
        "LINEAR CKA (centered kernel alignment, Kornblith et al. 2019 — "
        "THE standard metric for comparing two representations of the "
        "same items) between the embedding space and its "
        f"{_CKA_TRUNC_D}-dim matryoshka prefix truncation: CKA = "
        "||Yc'Xc||_F^2 / (||Xc'Xc||_F ||Yc'Yc||_F). Because Y is a "
        "COLUMN SUBSET of X, all three Frobenius blocks are sub-blocks "
        "of ONE centered Gram — and centering is done ALGEBRAICALLY on "
        "exact integers (c = n*Graw - Sx_i*Sx_j, one factor of n dropped "
        "from Gc = n*c since CKA is scale-invariant — the emitted "
        "Frobenius norms are of Gc/n — from the raw "
        "integer-lifted Gram and column sums; the naive subtract-the-"
        "mean route would leave rationals). Every Gram cell is an exact "
        "int64; the Frobenius sums of squared cells need ~1e35 head-"
        "room, so they accumulate in DECIMAL(38,0)/HUGEINT — exact and "
        "permutation-invariant — and doubles appear only in the final "
        "mirrored sqrt/divide. Complements embedding_truncation_energy "
        "(per-vector retained cosine) with the REPRESENTATION-level "
        "answer to 'what does cutting to 16 dims cost'. Plan: the "
        "covariance-spectrum partial-Gram mapInPandas (shuffle = "
        "#partitions x d^2/2), one bounded Gram aggregate, one 3-cell "
        "reduction."
    ),
    tags=("similarity", "llm", "statistics", "pandas-udf", "scale"),
)
def linear_cka_truncation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_CKA_LIFT).alias("kv")
    )

    part_schema = StructType(
        [
            StructField("i", LongType()),
            StructField("j", LongType()),
            StructField("g", LongType()),
            StructField("sx_i", LongType()),
            StructField("sx_j", LongType()),
            StructField("nrows", LongType()),
        ]
    )

    def local_gram(batches):
        G = None
        s = None
        n = 0
        for pdf in batches:
            K = np.array(pdf["kv"].tolist(), dtype=np.int64)
            if len(K) == 0:
                continue
            if G is None:
                d = K.shape[1]
                G = np.zeros((d, d), dtype=np.int64)
                s = np.zeros(d, dtype=np.int64)
            G += K.T @ K
            s += K.sum(axis=0)
            n += len(K)
        if G is None:
            return
        i, j = np.indices(G.shape)
        yield pd.DataFrame(
            {
                "i": (i.ravel() + 1).astype(np.int64),
                "j": (j.ravel() + 1).astype(np.int64),
                "g": G.ravel(),
                "sx_i": s[i.ravel()],
                "sx_j": s[j.ravel()],
                "nrows": np.full(G.size, n, dtype=np.int64),
            }
        )

    partials = spread(emb, "vec_id").mapInPandas(local_gram, schema=part_schema)
    agg = partials.groupBy("i", "j").agg(
        F.sum("g").alias("g"),
        F.sum("sx_i").alias("sx_i"),
        F.sum("sx_j").alias("sx_j"),
        F.sum("nrows").alias("n"),
    )
    # ONE factor of n (the covariance-numerator pattern): Gc = n * c with
    # c = n*Graw - Sx Sx^T, and CKA is scale-invariant, so dropping the
    # common factor leaves cka untouched while |c| <= ~2n^2*1e4 (int64-safe
    # to ~2e7 vectors vs ~8e4 for the old n^3-growing form — the same
    # silent-wrap class the covariance raw-moment fix eliminated). The
    # DECIMAL(38,0) intermediates (== DuckDB HUGEINT, both exact) carry the
    # c^2 sums to ~1e38; past ~2e7 vectors run the audit on a sample, like
    # PQ codebook training. The bound is ENFORCED, not just documented:
    # non-ANSI Spark decimals return NULL on overflow silently (the oracle's
    # HUGEINT raises loudly in DuckDB — an asymmetric failure mode, r8
    # advice), so n past the bound raises here too instead of emitting
    # NULL cka/fro_*. The guard is woven into c itself — a detached
    # assert_true column would be pruned by Catalyst as unused.
    _CKA_N_LIMIT = 20_000_000
    gc = agg.select(
        "i",
        "j",
        F.when(
            F.col("n") <= F.lit(_CKA_N_LIMIT),
            F.col("n").cast("decimal(38,0)") * F.col("g")
            - F.col("sx_i").cast("decimal(38,0)") * F.col("sx_j"),
        )
        .otherwise(
            F.raise_error(
                F.lit(
                    "linear_cka_truncation_audit: n exceeds the int64-exact "
                    f"bound ({_CKA_N_LIMIT}); run the audit on a sample"
                )
            ).cast("decimal(38,0)")
        )
        .alias("c"),
    )
    c_dec = F.col("c") * F.col("c")
    td = _CKA_TRUNC_D
    fro = gc.agg(
        F.sum(
            F.when((F.col("i") <= td) & (F.col("j") <= td), c_dec).otherwise(
                F.lit(0).cast("decimal(38,0)")
            )
        ).alias("fyy2"),
        F.sum(
            F.when(F.col("j") <= td, c_dec).otherwise(
                F.lit(0).cast("decimal(38,0)")
            )
        ).alias("fxy2"),
        F.sum(c_dec).alias("fxx2"),
    )
    return fro.select(
        F.round(
            F.col("fxy2").cast("double")
            / (
                F.sqrt(F.col("fxx2").cast("double"))
                * F.sqrt(F.col("fyy2").cast("double"))
            ),
            6,
        ).alias("cka"),
        # floor(sqrt(...)) as BIGINT, not ROUND(..., 4): at ~1e11 the
        # double's ulp is ~2e-5, so 4dp digits are sub-ulp noise and the
        # pre-round scaled value sat EXACTLY on a half-grid tie at sf0.01
        # (caught by the round-7 ulp-proximity audit — the covariance
        # failure class). IEEE sqrt is correctly rounded (bit-identical
        # on every engine/build) and floor has no half-grid, so the
        # integer Frobenius norms are deterministic everywhere.
        F.floor(F.sqrt(F.col("fxx2").cast("double"))).cast("long").alias("fro_xx"),
        F.floor(F.sqrt(F.col("fyy2").cast("double"))).cast("long").alias("fro_yy"),
        F.floor(F.sqrt(F.col("fxy2").cast("double"))).cast("long").alias("fro_xy"),
    )


# --- Round-8: bitext mining with the margin criterion --------------------------

_BITEXT_K = 4  # neighborhood size the margin normalizes against
_BITEXT_TOPN = 20  # mined pairs emitted


@register(
    "bitext_margin_mining",
    oracle=f"""
        WITH lift AS (
            SELECT vec_id, label, {_LIFT_DUCK} AS kv FROM embeddings
        ),
        sa AS (SELECT vec_id, kv FROM lift WHERE label % 2 = 0),
        sb AS (SELECT vec_id, kv FROM lift WHERE label % 2 = 1),
        p AS (
            SELECT sa.vec_id AS x_id, sb.vec_id AS y_id,
                   CAST(list_sum([sa.kv[i] * sb.kv[i]
                                  FOR i IN range(1, len(sa.kv) + 1)])
                        AS BIGINT) AS dot_i
            FROM sa, sb
        ),
        ax AS (
            SELECT x_id, CAST(SUM(dot_i) AS BIGINT) AS a_x
            FROM (SELECT x_id, dot_i,
                         ROW_NUMBER() OVER (
                             PARTITION BY x_id ORDER BY dot_i DESC, y_id
                         ) AS rn
                  FROM p)
            WHERE rn <= {_BITEXT_K} GROUP BY x_id
        ),
        byy AS (
            SELECT y_id, CAST(SUM(dot_i) AS BIGINT) AS b_y
            FROM (SELECT y_id, dot_i,
                         ROW_NUMBER() OVER (
                             PARTITION BY y_id ORDER BY dot_i DESC, x_id
                         ) AS rn
                  FROM p)
            WHERE rn <= {_BITEXT_K} GROUP BY y_id
        ),
        cand AS (
            SELECT p.x_id, p.y_id, p.dot_i,
                   CAST(2 * {_BITEXT_K} * p.dot_i AS BIGINT) AS margin_num,
                   CAST(ax.a_x + byy.b_y AS BIGINT) AS margin_den
            FROM p JOIN ax USING (x_id) JOIN byy USING (y_id)
            WHERE p.dot_i > 0 AND ax.a_x + byy.b_y > 0
        ),
        best AS (
            SELECT x_id, y_id, dot_i, margin_num, margin_den
            FROM (SELECT c.*,
                         ROW_NUMBER() OVER (
                             PARTITION BY x_id
                             ORDER BY margin_num * 1.0 / margin_den DESC,
                                      y_id
                         ) AS rn
                  FROM cand c)
            WHERE rn = 1
        )
        SELECT x_id, y_id, dot_i, margin_num, margin_den
        FROM best
        ORDER BY margin_num * 1.0 / margin_den DESC, x_id
        LIMIT {_BITEXT_TOPN}
    """,
    doc=(
        "BITEXT MINING with the MARGIN CRITERION (Artetxe & Schwenk "
        "2019, the LASER/CCMatrix parallel-pair miner): embeddings split "
        "into two 'languages' by label parity; for every source vector "
        "the best target is the one maximizing the RATIO margin "
        "score(x,y) / mean(top-K neighborhood similarities of x and y) — "
        "the normalization that kills hubness false positives a raw "
        f"cosine threshold admits. Top-{_BITEXT_TOPN} mined pairs "
        "emitted. Similarity is the EXACT integer-lifted dot product "
        "(unit-norm fixture vectors, so dot IS cosine at 1e8 scale), "
        "and the margin ships as the exact integer fraction "
        f"(margin_num, margin_den) = (2K*dot, a_x + b_y) with K={_BITEXT_K} "
        "— the ranking divides the two exact BIGINTs once (identical "
        "IEEE double both engines) and every tie breaks on ids. "
        "Non-positive dots/denominators are filtered (mining only keeps "
        "high-similarity pairs; sign-flipped ratios are meaningless). "
        "Exact O(|A|x|B|) baseline like its siblings (triplet_mining, "
        "mutual_knn_pairs); at 100 TB the candidate pairs come from the "
        "ANN family (LSH/IVF over the union corpus) and the margin "
        "normalizer from the candidates' own top-K — same ranking, "
        "bounded candidates."
    ),
    tags=("similarity", "llm", "retrieval", "curation"),
)
def bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.expr(_LIFT_SPARK).alias("kv")
    )
    sa = spread(emb.filter(F.col("label") % 2 == 0), "vec_id").alias("sa")
    sb = emb.filter(F.col("label") % 2 == 1).alias("sb")
    dot_i = F.aggregate(
        F.zip_with("sa.kv", "sb.kv", lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, z: acc + z,
    )
    p = sa.join(sb).select(
        F.col("sa.vec_id").alias("x_id"),
        F.col("sb.vec_id").alias("y_id"),
        dot_i.alias("dot_i"),
    )
    wx = Window.partitionBy("x_id").orderBy(F.desc("dot_i"), F.asc("y_id"))
    wy = Window.partitionBy("y_id").orderBy(F.desc("dot_i"), F.asc("x_id"))
    ax = (
        p.withColumn("rn", F.row_number().over(wx))
        .filter(F.col("rn") <= _BITEXT_K)
        .groupBy("x_id")
        .agg(F.sum("dot_i").cast("bigint").alias("a_x"))
    )
    byy = (
        p.withColumn("rn", F.row_number().over(wy))
        .filter(F.col("rn") <= _BITEXT_K)
        .groupBy("y_id")
        .agg(F.sum("dot_i").cast("bigint").alias("b_y"))
    )
    cand = (
        p.join(ax, "x_id")
        .join(byy, "y_id")
        .filter((F.col("dot_i") > 0) & (F.col("a_x") + F.col("b_y") > 0))
        .select(
            "x_id",
            "y_id",
            "dot_i",
            (2 * _BITEXT_K * F.col("dot_i")).cast("bigint").alias("margin_num"),
            (F.col("a_x") + F.col("b_y")).cast("bigint").alias("margin_den"),
        )
    )
    ratio = F.col("margin_num") * 1.0 / F.col("margin_den")
    wbest = Window.partitionBy("x_id").orderBy(ratio.desc(), F.asc("y_id"))
    best = (
        cand.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return best.orderBy(ratio.desc(), F.asc("x_id")).limit(_BITEXT_TOPN)


# ---------------------------------------------------------------------------
# Kernel two-sample test (MMD^2, quadratic kernel) from exact moments.
# ---------------------------------------------------------------------------

_MMD_SCALE = 100  # k = floor(x*100 + 0.5): |k| <= ~60 on unit-ish embeddings
_MMD_N_LIMIT = 200_000_000  # int64-exact bound for the q4 fourth-moment sums


def mmd2_from_moments(rows) -> float:
    """Finish MMD^2 (quadratic kernel k(x,y) = (x.y)^2) from the
    embedding_mmd_two_sample moment table — THE one place the finish
    lives (the covariance-spectrum consumer-seam rule). rows carry the
    upper triangle (i <= j) of both group second-moment matrices plus
    the per-group row counts and fourth-moment scalars; exact Python
    ints throughout, one float division at the end.

    E[(x.y)^2] over independent x~A, y~B is <Sa, Sb>_F / (na*nb); the
    unbiased within-group terms subtract the diagonal q4 = sum ||x||^4
    before dividing by n(n-1). Result is in original embedding units
    (the 1/SCALE^4 de-quantization happens here, never in the hashed
    output)."""
    fro_aa = fro_bb = fro_ab = 0
    n_a = n_b = q4_a = q4_b = None
    for r in rows:
        mult = 1 if r.i == r.j else 2  # upper triangle -> full matrix
        fro_aa += mult * r.s_a * r.s_a
        fro_bb += mult * r.s_b * r.s_b
        fro_ab += mult * r.s_a * r.s_b
        n_a, n_b, q4_a, q4_b = r.n_a, r.n_b, r.q4_a, r.q4_b
    e_aa = (fro_aa - q4_a) / (n_a * (n_a - 1))
    e_bb = (fro_bb - q4_b) / (n_b * (n_b - 1))
    e_ab = fro_ab / (n_a * n_b)
    return (e_aa + e_bb - 2.0 * e_ab) / float(_MMD_SCALE) ** 4


@register(
    "embedding_mmd_two_sample",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, label % 2 AS grp,
                   CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                              * {_MMD_SCALE}.0 + 0.5) AS BIGINT) AS k,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings WHERE label IS NOT NULL
        ),
        g AS (
            SELECT a.i AS i, b.i AS j,
                   CAST(SUM(CASE WHEN a.grp = 0 THEN a.k * b.k ELSE 0 END)
                        AS BIGINT) AS s_a,
                   CAST(SUM(CASE WHEN a.grp = 1 THEN a.k * b.k ELSE 0 END)
                        AS BIGINT) AS s_b
            FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY 1, 2
        ),
        rownorm AS (
            SELECT vec_id, grp, SUM(k * k) AS sq FROM e GROUP BY vec_id, grp
        ),
        scal AS (
            SELECT CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_a,
                   CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_b,
                   CAST(SUM(CASE WHEN grp = 0 THEN sq * sq ELSE 0 END)
                        AS BIGINT) AS q4_a,
                   CAST(SUM(CASE WHEN grp = 1 THEN sq * sq ELSE 0 END)
                        AS BIGINT) AS q4_b
            FROM rownorm
        )
        SELECT g.i, g.j, g.s_a, g.s_b,
               scal.n_a, scal.n_b, scal.q4_a, scal.q4_b
        FROM g CROSS JOIN scal
    """,
    doc=(
        "KERNEL TWO-SAMPLE TEST moments (MMD^2 with the QUADRATIC kernel "
        "k(x,y) = (x.y)^2, Gretton et al. 2012) between two embedding "
        "populations (label parity as the fixture's two 'sources') — the "
        "DISTRIBUTION-level shift detector the drift suite lacked for "
        "embeddings: centroid-shift (loo_source_influence) only sees "
        "FIRST-moment drift; the quadratic-kernel MMD also detects "
        "covariance/shape drift between corpora embedded by the same "
        "model, because E[(x.y)^2] = <E[xx^T], E[yy^T]>_F contracts the "
        "full SECOND-moment matrices. That identity is the whole scale "
        "story: MMD^2 needs NO pairwise n^2 kernel matrix — each "
        "partition computes its local int64 Gram (the covariance-"
        "spectrum pass, extended with per-group split and the per-row "
        "fourth-moment scalar q4 = sum ||x||^4 that unbiases the "
        "within-group terms), one hash aggregate sums the d(d+1)/2 "
        "triangle, and the hashed output is the ALL-INTEGER moment "
        f"table. Cells are lifted by floor(x*{_MMD_SCALE} + 0.5) (the "
        "identical IEEE expression in numpy and DuckDB); with |k| <= "
        "~60, q4 per row is <= ~3.3e10, so the int64 cliff sits at "
        f"~{_MMD_N_LIMIT:.0e} rows per group — ENFORCED loudly in both "
        "the Arrow pass (numpy int64 wraps silently) and the final "
        "plan (non-ANSI Spark sums NULL silently), the CKA guard rule. "
        "mmd2_from_moments() is the single driver-side finish seam; "
        "shuffle volume is #partitions x d^2/2 rows regardless of "
        "corpus size, the 100 TB plan identical to the fixture plan."
    ),
    tags=("similarity", "llm", "statistics", "drift", "pandas-udf", "scale"),
)
def embedding_mmd_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    # Explicit NULL-label contract, mirrored in the oracle's WHERE: a NULL
    # grp would silently drop out of the oracle's conditional sums while
    # the numpy `% 2` CRASHES on object dtype — the asymmetric edge-
    # contract class the r8 advice flagged on the prefix-sum joins.
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("label").isNotNull())
        .select("vec_id", "embedding", "label")
    )

    part_schema = StructType(
        [
            StructField("i", LongType()),
            StructField("j", LongType()),
            StructField("s_a", LongType()),
            StructField("s_b", LongType()),
            StructField("n_a", LongType()),
            StructField("n_b", LongType()),
            StructField("q4_a", LongType()),
            StructField("q4_b", LongType()),
        ]
    )

    def local_moments(batches):
        G = {0: None, 1: None}
        n = {0: 0, 1: 0}
        q4 = {0: 0, 1: 0}
        d = None
        for pdf in batches:
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            if len(X) == 0:
                continue
            K = np.floor(X * float(_MMD_SCALE) + 0.5).astype(np.int64)
            # TRUNCATED modulo (np.fmod), not numpy's floored `%`: the
            # oracle's `label % 2` and Spark SQL `%` both keep the sign of
            # the dividend, so label -1 maps to -1 and falls in NEITHER
            # group on either engine; numpy `%` would have claimed it for
            # group 1 — a divergence fixture labels (0..9) cannot surface.
            grp = np.fmod(
                pdf["label"].to_numpy(dtype=np.int64), 2
            ).astype(np.int64)
            d = K.shape[1]
            # Loud overflow guards BEFORE any product that could wrap
            # (numpy int64 wraps silently; a guard that reads a possibly
            # wrapped value can pass on garbage). Python-int arithmetic
            # throughout the checks, so the checks themselves cannot wrap:
            # k_max^2 * d bounds every row's sq; sq_max^2 * rows bounds
            # the partition q4 sum.
            k_max = int(np.abs(K).max()) if K.size else 0
            if k_max * k_max * d >= 2**62:
                raise ValueError(
                    "embedding_mmd_two_sample: |quantized cell| too large "
                    f"({k_max}); row norm sum would overflow int64 — "
                    "rescale or run on a sample"
                )
            for g in (0, 1):
                Kg = K[grp == g]
                if len(Kg) == 0:
                    continue
                if G[g] is None:
                    G[g] = np.zeros((d, d), dtype=np.int64)
                G[g] += Kg.T @ Kg
                sq = (Kg * Kg).sum(axis=1)  # int64-safe by the k_max guard
                sq_max = int(sq.max())
                if sq_max * sq_max * len(sq) >= 2**62:
                    raise ValueError(
                        "embedding_mmd_two_sample: partition fourth-moment "
                        "sum would overflow int64; corpus exceeds the "
                        f"documented bound (~{_MMD_N_LIMIT} rows/group) — "
                        "run on a sample"
                    )
                rowq = sq * sq  # safe: guarded above, pre-product
                q4[g] += int(rowq.sum())
                n[g] += len(Kg)
        if d is None:
            return
        for g in (0, 1):
            if G[g] is None:
                G[g] = np.zeros((d, d), dtype=np.int64)
        iu, ju = np.triu_indices(d)
        yield pd.DataFrame(
            {
                "i": (iu + 1).astype(np.int64),
                "j": (ju + 1).astype(np.int64),
                "s_a": G[0][iu, ju],
                "s_b": G[1][iu, ju],
                "n_a": np.full(len(iu), n[0], dtype=np.int64),
                "n_b": np.full(len(iu), n[1], dtype=np.int64),
                "q4_a": np.full(len(iu), q4[0], dtype=np.int64),
                "q4_b": np.full(len(iu), q4[1], dtype=np.int64),
            }
        )

    partials = spread(emb, "vec_id").mapInPandas(local_moments, schema=part_schema)
    agg = partials.groupBy("i", "j").agg(
        F.sum("s_a").alias("s_a"),
        F.sum("s_b").alias("s_b"),
        F.sum("n_a").alias("n_a"),
        F.sum("n_b").alias("n_b"),
        F.sum("q4_a").alias("q4_a"),
        F.sum("q4_b").alias("q4_b"),
    )
    # Loud bound on the CROSS-partition q4 sum too (Spark-side int64 sums
    # NULL silently under non-ANSI past 2^63) — woven into the output
    # column so Catalyst cannot prune it, the CKA guard rule.
    # Documented-bound check plus a wrap tripwire: each partition emits a
    # non-negative q4 partial (the Arrow pass guards its own sums), so a
    # negative TOTAL can only mean the cross-partition int64 sum wrapped
    # (non-ANSI Spark wraps bigint sums silently rather than erroring).
    # Per-group bound (not the weaker combined-sum form): one group at
    # 390M rows with the other at 10M must trip even though the sum fits,
    # and a wrapped int64 sum can land non-negative so the q4 tripwire
    # alone is not airtight.
    guard = (
        (F.col("n_a") <= F.lit(_MMD_N_LIMIT))
        & (F.col("n_b") <= F.lit(_MMD_N_LIMIT))
        & (F.col("q4_a") >= 0)
        & (F.col("q4_b") >= 0)
    )
    err = F.raise_error(
        F.lit(
            "embedding_mmd_two_sample: rows exceed the int64-exact bound "
            f"({_MMD_N_LIMIT}/group); run on a sample"
        )
    ).cast("bigint")
    return agg.select(
        "i",
        "j",
        "s_a",
        "s_b",
        "n_a",
        "n_b",
        F.when(guard, F.col("q4_a")).otherwise(err).alias("q4_a"),
        F.when(guard, F.col("q4_b")).otherwise(err).alias("q4_b"),
    )


# ---------------------------------------------------------------------------
# Round 9: embedding isotropy audit — anisotropy is the classic failure
# mode of LLM embedding spaces (Mu-Viswanath 2018, Ethayarajh 2019).
# ---------------------------------------------------------------------------


@register(
    "embedding_isotropy_audit",
    oracle="""
        WITH nrm AS (
            SELECT vec_id,
                   SQRT(list_sum(list_transform(embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n2
            FROM embeddings
        ),
        comp AS (
            SELECT CAST(e.label AS VARCHAR) AS label, gs.i,
                   SUM(CAST(e.embedding[gs.i] AS DOUBLE) / n.n2) AS s
            FROM embeddings e
            JOIN nrm n USING (vec_id)
            CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) gs
            GROUP BY e.label, gs.i
        ),
        per_label AS (
            SELECT CAST(label AS VARCHAR) AS label,
                   CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n
            FROM embeddings GROUP BY label
        ),
        s2 AS (
            SELECT label, SUM(s * s) AS s2 FROM comp GROUP BY label
        ),
        unioned AS (
            SELECT p.label, p.n, s2.s2 FROM per_label p JOIN s2 USING (label)
            UNION ALL
            SELECT '__ALL__' AS label,
                   CAST(SUM(p.n) AS BIGINT) AS n,
                   (SELECT SUM(t.s * t.s) FROM (
                        SELECT i, SUM(s) AS s FROM comp GROUP BY i) t) AS s2
            FROM per_label p
        )
        SELECT label, n,
               ROUND((s2 - n) / (n * 1.0 * (n - 1)), 6)
                   AS mean_pairwise_cos,
               ROUND(SQRT(s2) / n, 6) AS resultant_norm_share
        FROM unioned
    """,
    doc=(
        "EMBEDDING ISOTROPY AUDIT per label and corpus-wide — "
        "anisotropy ('embeddings live in a narrow cone') is THE classic "
        "degeneracy of learned embedding spaces (Mu-Viswanath's "
        "all-but-the-top, Ethayarajh 2019): when mean pairwise cosine "
        "is high, cosine similarity stops discriminating and every "
        "downstream near-dup/ANN threshold silently recalibrates. The "
        "audit needs NO pairs: for unit-normalized vectors, sum of all "
        "pairwise cosines = ||sum v||^2 - n exactly, so mean pairwise "
        "cos = (S2 - n)/(n(n-1)) and the resultant-vector share "
        "||sum v||/n (= mean cosine to the mean direction) both derive "
        "from ONE per-(label, dimension) sum table — the von Mises "
        "resultant-length trick. Plan: one normalized posexplode with "
        "map-side combine to |labels| x 64 component sums; the '__ALL__' "
        "row re-aggregates those 64-row partials, never the corpus. "
        "Per-dimension float sums are order-sensitive doubles rounded "
        "at 6dp (house float contract). At 100 TB the explode-aggregate "
        "is the only shuffle and it carries 64 rows per partition after "
        "partial aggregation."
    ),
    tags=("similarity", "llm", "statistics", "quality"),
)
def embedding_isotropy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # _with_norm drops label; compute the norm inline on the spread scan
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id").select(
        "vec_id",
        F.col("label").cast("string").alias("label"),
        "embedding",
        l2_norm(F.col("embedding")).alias("nrm"),
    )
    comp = (
        emb.select(
            "label",
            F.posexplode("embedding").alias("i0", "x"),
            F.col("nrm"),
        )
        .select(
            "label",
            (F.col("i0") + 1).alias("i"),
            (F.col("x").cast("double") / F.col("nrm")).alias("xn"),
        )
        .groupBy("label", "i")
        .agg(F.sum("xn").alias("s"))
    )
    per_label = emb.groupBy("label").agg(
        F.count_distinct("vec_id").cast("bigint").alias("n")
    )
    from weather_stream_processor_spark.plans.caching import persisted_result

    def build(comp: DataFrame) -> DataFrame:
        s2 = comp.groupBy("label").agg(
            F.sum(F.col("s") * F.col("s")).alias("s2")
        )
        lab = per_label.join(s2, "label")
        all_s2 = (
            comp.groupBy("i")
            .agg(F.sum("s").alias("s"))
            .agg(F.sum(F.col("s") * F.col("s")).alias("s2"))
        )
        all_n = per_label.agg(F.sum("n").cast("bigint").alias("n"))
        allrow = all_n.crossJoin(all_s2).select(
            F.lit("__ALL__").alias("label"), "n", "s2"
        )
        both = lab.select("label", "n", "s2").unionAll(allrow)
        return both.select(
            "label",
            "n",
            F.round(
                (F.col("s2") - F.col("n"))
                / (F.col("n") * F.lit(1.0) * (F.col("n") - 1)),
                6,
            ).alias("mean_pairwise_cos"),
            F.round(F.sqrt(F.col("s2")) / F.col("n"), 6).alias(
                "resultant_norm_share"
            ),
        )

    # the component table feeds both the per-label and corpus-wide
    # reductions — persist so the normalized explode runs once
    return persisted_result(comp, build)


_MRL_DIMS = (8, 16)  # truncation prefixes evaluated against the full 32
_MRL_QUERIES = 8
_MRL_K = 10


@register(
    "matryoshka_truncation_recall",
    oracle=f"""
        WITH d AS (SELECT unnest([{", ".join(str(d) for d in _MRL_DIMS)}, 32])
                       AS dims),
        e AS (
            SELECT vec_id, unnest(embedding) AS ex,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        ),
        q AS (
            SELECT vec_id AS qid, unnest(embedding) AS qx,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings WHERE vec_id < {_MRL_QUERIES}
        ),
        dots AS (
            SELECT d.dims, q.qid, e.vec_id,
                   SUM(CAST(e.ex AS DOUBLE) * CAST(q.qx AS DOUBLE)) AS dot,
                   SUM(CAST(e.ex AS DOUBLE) * CAST(e.ex AS DOUBLE)) AS na2,
                   SUM(CAST(q.qx AS DOUBLE) * CAST(q.qx AS DOUBLE)) AS nq2
            FROM e JOIN q ON e.i = q.i CROSS JOIN d
            WHERE e.i <= d.dims AND e.vec_id <> q.qid
            GROUP BY 1, 2, 3
        ),
        sims AS (
            SELECT dims, qid, vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY dims, qid
                       ORDER BY ROUND(dot / (sqrt(na2) * sqrt(nq2)), 6)
                                    DESC, vec_id
                   ) AS rn
            FROM dots
        ),
        top AS (SELECT dims, qid, vec_id FROM sims WHERE rn <= {_MRL_K}),
        per_q AS (
            SELECT t.dims, t.qid,
                   CAST(SUM(CASE WHEN f.vec_id IS NOT NULL
                                 THEN 1 ELSE 0 END) AS BIGINT) AS matches
            FROM (SELECT * FROM top WHERE dims < 32) t
            LEFT JOIN (SELECT * FROM top WHERE dims = 32) f
              ON t.qid = f.qid AND t.vec_id = f.vec_id
            GROUP BY 1, 2
        )
        SELECT CAST(dims AS BIGINT) AS dims,
               CAST(COUNT(*) AS BIGINT) AS n_queries,
               CAST({_MRL_K} AS BIGINT) AS k,
               CAST(SUM(matches) AS BIGINT) AS total_matches,
               ROUND(CAST(SUM(matches) AS DOUBLE)
                     / (COUNT(*) * {_MRL_K}.0), 6) AS mean_recall,
               ROUND(CAST(MIN(matches) AS DOUBLE) / {_MRL_K}.0, 6)
                   AS min_recall
        FROM per_q GROUP BY dims
    """,
    doc=(
        "MATRYOSHKA TRUNCATION RECALL (Kusupati et al. 2022): top-"
        f"{_MRL_K} retrieval recall when the embedding is truncated to "
        f"its first d in {_MRL_DIMS} dimensions, against the full-32 "
        "exact top-k — the RETRIEVAL-grade answer to 'how many "
        "dimensions does this index actually need', completing the "
        "truncation triptych: embedding_truncation_energy measures "
        "variance retained, linear_cka_truncation_audit measures "
        "representational similarity, and this measures the thing "
        "production cares about — whether the short index returns the "
        "same neighbors (the standard Matryoshka/MRL deployment "
        "question, since a d/4 index is ~4x cheaper to scan and "
        "store). Per (prefix, query): exact cosine top-k with the "
        "6-dp-rounded-before-ranking + vec_id tie-break contract of "
        "cosine_topk_exact; per-query matches against the full-width "
        "list are exact integers, so mean/min recall are single "
        f"divisions. Plan: the {_MRL_QUERIES} queries x 3 prefix "
        "widths broadcast into ONE corpus scan (slice + dot per "
        "pair); per-(width, query) window top-k — the knn_join_topk "
        "shape with a 3-row width spine, linear in the corpus at any "
        "scale."
    ),
    tags=("similarity", "llm", "evals"),
)
def matryoshka_truncation_recall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id").select(
        "vec_id", "embedding"
    )
    dims = spark.createDataFrame(
        [(d,) for d in (*_MRL_DIMS, 32)], "dims bigint"
    )
    q = emb.filter(F.col("vec_id") < _MRL_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("q_emb")
    )
    qd = q.crossJoin(dims).select(
        "qid",
        "dims",
        F.slice(F.col("q_emb"), F.lit(1), F.col("dims")).alias("q_emb"),
    )
    pairs = emb.crossJoin(F.broadcast(qd)).filter(
        F.col("vec_id") != F.col("qid")
    )
    e_d = F.slice(F.col("embedding"), F.lit(1), F.col("dims"))
    cos = F.round(
        dot(e_d, F.col("q_emb")) / (l2_norm(e_d) * l2_norm(F.col("q_emb"))),
        6,
    )
    sims = pairs.select("dims", "qid", "vec_id", cos.alias("cosine_sim"))
    w = Window.partitionBy("dims", "qid").orderBy(
        F.desc("cosine_sim"), F.asc("vec_id")
    )
    top0 = (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MRL_K)
        .select("dims", "qid", "vec_id")
    )
    # the trunc and full branches both consume the top-k frame; without
    # a materialization boundary Catalyst duplicates the ENTIRE corpus
    # cosine lineage into each branch (4 parquet scans — caught by the
    # r11 plan audit). The frame is <=240 rows (3 widths x 8 queries x
    # k), so persist-and-split halves the job.
    from weather_stream_processor_spark.plans.caching import persisted_result

    def _recall(top: DataFrame) -> DataFrame:
        trunc = top.filter(F.col("dims") < 32)
        full = top.filter(F.col("dims") == 32).select(
            F.col("qid").alias("f_qid"), F.col("vec_id").alias("f_vid")
        )
        per_q = (
            trunc.join(
                full,
                (trunc.qid == full.f_qid) & (trunc.vec_id == full.f_vid),
                "left",
            )
            .groupBy("dims", "qid")
            .agg(
                F.sum(F.when(F.col("f_vid").isNotNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("matches")
            )
        )
        return _mrl_finish(per_q)

    return persisted_result(top0, _recall)


def _mrl_finish(per_q: DataFrame) -> DataFrame:
    return per_q.groupBy("dims").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.lit(_MRL_K).cast("bigint").alias("k"),
        F.sum("matches").cast("bigint").alias("total_matches"),
        F.round(
            F.sum("matches").cast("double")
            / (F.count(F.lit(1)) * F.lit(float(_MRL_K))),
            6,
        ).alias("mean_recall"),
        F.round(
            F.min("matches").cast("double") / F.lit(float(_MRL_K)), 6
        ).alias("min_recall"),
    )


def _davies_bouldin_oracle(k: int, iters: int) -> str:
    """The kmeans CTE chain (same unrolled Lloyd rounds, same 6dp
    quantization contract) extended with the Davies-Bouldin reduction:
    per-member sqrt distances are 1e6-floor-lifted before the
    cross-member cluster sum (sqrt IS correctly rounded in IEEE 754, so
    the lift input is an identical double in both engines), centroid
    separations round the cross-dim squared sum at 6dp BEFORE the sqrt
    (the kmeans convention), and the k-row R_i maxima are 1e9-lifted
    before the final mean."""
    base = _kmeans_oracle(k, iters)
    final = f"SELECT vec_id, cid AS cluster_id, d AS dist2\n        FROM b{iters} WHERE rn = 1"
    assert final in base
    prefix = base.replace(final, "").rstrip().rstrip(",")
    return f"""{prefix},
        members AS (
            SELECT vec_id, cid, d FROM b{iters} WHERE rn = 1
        ),
        s AS (
            SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_m,
                   CAST(SUM(CAST(FLOOR(SQRT(d) * 1000000.0 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS sq
            FROM members GROUP BY cid
        ),
        pairs AS (
            SELECT a.cid AS ci, b.cid AS cj,
                   SQRT(ROUND(SUM((a.x - b.x) * (a.x - b.x)), 6)) AS m
            FROM c{iters - 1} a JOIN c{iters - 1} b USING (i)
            WHERE a.cid != b.cid
            GROUP BY a.cid, b.cid
        ),
        r AS (
            SELECT p.ci, p.cj,
                   (CAST(si.sq AS DOUBLE) / si.n_m / 1000000.0
                    + CAST(sj.sq AS DOUBLE) / sj.n_m / 1000000.0) / p.m
                       AS rij
            FROM pairs p
            JOIN s si ON si.cid = p.ci
            JOIN s sj ON sj.cid = p.cj
            WHERE p.m > 0
        ),
        picked AS (
            SELECT ci, cj, rij,
                   ROW_NUMBER() OVER (PARTITION BY ci
                                      ORDER BY rij DESC, cj) AS rn
            FROM r
        ),
        lifted AS (
            SELECT ci, cj, rij,
                   CAST(FLOOR(rij * 1000000000.0 + 0.5) AS BIGINT) AS rq
            FROM picked WHERE rn = 1
        ),
        db AS (
            SELECT CAST(SUM(rq) AS BIGINT) AS tot,
                   CAST(COUNT(*) AS BIGINT) AS kk
            FROM lifted
        )
        SELECT l.ci AS cluster_id,
               s.n_m AS n_members,
               CAST(FLOOR(CAST(s.sq AS DOUBLE) / s.n_m + 0.5) AS BIGINT)
                   / 1000000.0 AS s_intra,
               l.cj AS worst_pair,
               ROUND(l.rij, 6) AS r_max,
               ROUND(CAST(d.tot AS DOUBLE) / d.kk / 1000000000.0, 6)
                   AS db_index
        FROM lifted l JOIN s ON s.cid = l.ci CROSS JOIN db d
    """


@register(
    "davies_bouldin_index",
    oracle=_davies_bouldin_oracle(_KMEANS_K, _KMEANS_ITERS),
    doc=(
        "DAVIES-BOULDIN INDEX of the registered k-means clustering — "
        "the INTERNAL cluster-validity twin of simplified_silhouette "
        "(silhouette scores each POINT against its own and nearest "
        "cluster; DB scores each CLUSTER against its worst neighbor: "
        "R_ij = (S_i + S_j) / M_ij with S = mean member-to-centroid "
        "distance and M = centroid separation, DB = mean_i max_j "
        "R_ij — lower is better, and the k that minimizes it is the "
        "standard model-selection rule). Consumes EXACTLY "
        "kmeans_embedding_clusters' pinned Lloyd state (same init, "
        "same 6dp per-round quantization, same argmin tie-break), so "
        "the oracle replays the identical CTE chain and extends it "
        "with the DB reduction. Determinism: sqrt is CORRECTLY "
        "ROUNDED in IEEE 754, so per-member sqrt(d) of the 6dp-"
        "rounded assignment distance is an identical double in both "
        "engines and the 1e6 floor-lift before the corpus-scale "
        "cluster sum is exact; centroid separations round the 64-dim "
        "squared sum at 6dp BEFORE the sqrt (the kmeans convention "
        "for cross-dim sums); the k-row maxima are 1e9-lifted before "
        "the final mean; s_intra is emitted via floor-lift, not ROUND "
        "(a ratio of exact integers CAN sit exactly on the 6dp half "
        "grid — the margin audit caught 967310.5 doing it at sf0.01); zero-separation pairs excluded mirrored, "
        "worst-pair ties broken on cluster id. Per-cluster output "
        "(n_members, S_i, worst neighbor, R_i) with the corpus DB "
        "index repeated — the drill-down a cluster-count sweep reads. "
        "Plan: the kmeans rounds (k-row broadcast crossJoins + "
        "per-vec argmin windows), one corpus-scale cluster aggregate, "
        "then k^2-row arithmetic."
    ),
    tags=("similarity", "llm", "clustering", "evals"),
)
def davies_bouldin_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_stream_processor_spark.plans.caching import truncate_lineage

    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cent = emb.filter(F.col("vec_id") < _KMEANS_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )
    best = None
    for it in range(_KMEANS_ITERS):
        d = F.round(
            F.aggregate(
                F.zip_with(
                    F.col("v"), F.col("c"), lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0.0),
                lambda acc, z: acc + z,
            ),
            6,
        )
        assigned = emb.crossJoin(F.broadcast(cent)).select(
            "vec_id", "v", "cid", d.alias("d")
        )
        w = Window.partitionBy("vec_id").orderBy("d", "cid")
        best = assigned.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") == 1
        )
        if it < _KMEANS_ITERS - 1:
            # eager k x dim checkpoint per round: each corpus scan runs
            # exactly ONCE, instead of re-executing per downstream
            # consumer (the matryoshka persist-boundary lesson — the
            # first build re-expanded the Lloyd lineage into 26 crosses)
            cent = truncate_lineage(
                best.select("cid", F.posexplode("v").alias("i", "x"))
                .groupBy("cid", "i")
                .agg(F.round(F.avg("x"), 6).alias("x"))
                .groupBy("cid")
                .agg(
                    F.array_sort(F.collect_list(F.struct("i", "x"))).alias(
                        "sx"
                    )
                )
                .select(
                    "cid",
                    F.transform("sx", lambda s: s.getField("x")).alias("c"),
                )
            )
    s = truncate_lineage(best.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_m"),
        F.sum(
            F.floor(F.sqrt("d") * F.lit(1e6) + F.lit(0.5)).cast("bigint")
        )
        .cast("bigint")
        .alias("sq"),
    ))
    ca = cent.select(F.col("cid").alias("ci"), F.col("c").alias("va"))
    cb = cent.select(F.col("cid").alias("cj"), F.col("c").alias("vb"))
    pairs = (
        ca.crossJoin(F.broadcast(cb))
        .filter(F.col("ci") != F.col("cj"))
        .select(
            "ci",
            "cj",
            F.sqrt(
                F.round(
                    F.aggregate(
                        F.zip_with(
                            F.col("va"),
                            F.col("vb"),
                            lambda x, y: (x - y) * (x - y),
                        ),
                        F.lit(0.0),
                        lambda acc, z: acc + z,
                    ),
                    6,
                )
            ).alias("m"),
        )
    )
    si = s.select(
        F.col("cid").alias("ci"),
        F.col("n_m").alias("n_i"),
        F.col("sq").alias("sq_i"),
    )
    sj = s.select(
        F.col("cid").alias("cj"),
        F.col("n_m").alias("n_j"),
        F.col("sq").alias("sq_j"),
    )
    rij = (
        F.col("sq_i").cast("double") / F.col("n_i") / F.lit(1e6)
        + F.col("sq_j").cast("double") / F.col("n_j") / F.lit(1e6)
    ) / F.col("m")
    r = (
        pairs.join(F.broadcast(si), "ci")
        .join(F.broadcast(sj), "cj")
        .filter(F.col("m") > 0)
        .select("ci", "cj", rij.alias("rij"))
    )
    w_pick = Window.partitionBy("ci").orderBy(
        F.col("rij").desc(), F.col("cj")
    )
    lifted = (
        r.withColumn("rn", F.row_number().over(w_pick))
        .filter(F.col("rn") == 1)
        .select(
            "ci",
            "cj",
            "rij",
            F.floor(F.col("rij") * F.lit(1e9) + F.lit(0.5))
            .cast("bigint")
            .alias("rq"),
        )
    )
    db = lifted.agg(
        F.sum("rq").cast("bigint").alias("tot"),
        F.count(F.lit(1)).cast("bigint").alias("kk"),
    )
    return (
        lifted.join(
            F.broadcast(s.withColumnRenamed("cid", "ci")), "ci"
        )
        .crossJoin(F.broadcast(db))
        .select(
            F.col("ci").alias("cluster_id"),
            F.col("n_m").alias("n_members"),
            (
                F.floor(
                    F.col("sq").cast("double") / F.col("n_m") + F.lit(0.5)
                ).cast("bigint")
                / F.lit(1e6)
            ).alias("s_intra"),
            F.col("cj").alias("worst_pair"),
            F.round(F.col("rij"), 6).alias("r_max"),
            F.round(
                F.col("tot").cast("double") / F.col("kk") / F.lit(1e9), 6
            ).alias("db_index"),
        )
    )
