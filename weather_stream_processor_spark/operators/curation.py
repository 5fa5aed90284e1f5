"""Corpus-curation operators: semantic dedup, importance resampling,
embedding-space decontamination.

These are the cluster-then-prune / distribution-matching passes a
large-scale training-data pipeline runs AFTER exact/near-dup dedup
(``dedup.py``) and quality filtering (``text.py``):

- SemDeDup-style semantic dedup (Abbas et al. 2023, "SemDeDup: Data-
  efficient learning at web-scale through semantic deduplication"):
  k-means-cluster the embedding corpus, then drop within-cluster members
  whose cosine to a lower-id member clears a threshold. The clustering
  bounds the pairwise work — |cluster|^2 instead of |corpus|^2 — which is
  exactly what makes semantic dedup feasible at 100 TB (pick k so the
  expected cluster size stays bounded as the corpus grows).
- DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling"): score every document by
  the average log-likelihood ratio of its tokens under a target-corpus
  unigram model vs the raw-corpus model (add-one smoothing over the
  shared vocabulary). Vocabulary-bounded hash aggregations + one
  broadcast token join — no per-document state, no driver collect.
- Embedding decontamination: flag corpus vectors whose cosine to ANY
  eval-set vector clears a threshold — the semantic complement of the
  n-gram ``decontamination_overlap`` in ``dedup.py`` (catches
  paraphrased eval leakage that shingle overlap misses).

Reference parity note: the reference engine (weather_processor.py /
weather_stream.py) has no curation surface; these rows are the SURVEY
§2.6 mandated-extension operators for LLM training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from weather_stream_processor_spark.functions import dot, l2_norm, tokens
from weather_stream_processor_spark.registry import register
from weather_stream_processor_spark.sources import load_table, spread
from weather_stream_processor_spark.operators.similarity import (
    _KMEANS_ITERS,
    _KMEANS_K,
    _kmeans_oracle,
    NEAR_DUP_COSINE,
    kmeans_embedding_clusters,
)

# Every N-th vector is the held-out eval set for decontamination. A real
# pipeline reads the eval table from its own source; the modulus keeps the
# fixture self-contained while preserving the plan shape (small eval side,
# broadcast into the corpus scan).
EVAL_VEC_MODULUS = 25


def _semdedup_oracle() -> str:
    """SemDeDup oracle: the k-means assignment CTEs (shared with
    ``kmeans_embedding_clusters`` so both engines agree bit-for-bit on the
    clustering) + a within-cluster pairwise cosine join + the drop rule."""
    kmeans = _kmeans_oracle(_KMEANS_K, _KMEANS_ITERS)
    # _kmeans_oracle ends with the final SELECT; wrap it as a CTE.
    return f"""
        WITH assign AS ({kmeans}),
        ev AS (
            SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        ),
        m AS (
            SELECT a.vec_id, a.cluster_id, e.i, e.x
            FROM assign a JOIN ev e USING (vec_id)
        ),
        pairs AS (
            SELECT a.vec_id AS keep_id, b.vec_id AS drop_id,
                   SUM(a.x * b.x) AS dot,
                   SQRT(SUM(a.x * a.x)) AS na,
                   SQRT(SUM(b.x * b.x)) AS nb
            FROM m a JOIN m b
              ON a.i = b.i AND a.cluster_id = b.cluster_id
             AND a.vec_id < b.vec_id
            GROUP BY 1, 2
        ),
        dropped AS (
            SELECT DISTINCT drop_id
            FROM pairs
            WHERE ROUND(dot / (na * nb), 6) >= {NEAR_DUP_COSINE}
        )
        SELECT a.vec_id, a.cluster_id,
               (d.drop_id IS NULL) AS is_kept
        FROM assign a LEFT JOIN dropped d ON a.vec_id = d.drop_id
    """


@register(
    "semdedup_keep_list",
    oracle=_semdedup_oracle(),
    doc=(
        "SemDeDup semantic dedup (Abbas et al. 2023): deterministic "
        f"k-means (k={_KMEANS_K}, shared with kmeans_embedding_clusters) "
        "partitions the embedding corpus, then WITHIN each cluster every "
        "pair is cosine-compared and the higher-id member of any pair at "
        f">= {NEAR_DUP_COSINE} is dropped (lowest id survives as the "
        "representative — deterministic, so both engines agree without a "
        "union-find). Output: (vec_id, cluster_id, is_kept). Plan: the "
        "k-means assignment reuses the broadcast-centroid crossJoin plan; "
        "the pairwise stage is an equi-join ON cluster_id — shuffle keyed "
        "on cluster, quadratic ONLY in cluster size, never corpus size. "
        "At 100 TB, k grows with the corpus so E[|cluster|] stays "
        "bounded (the paper's regime: 50k clusters over web scale), and "
        "the per-cluster GEMM drops into the same Arrow-batched kernel "
        "as embedding_near_dup_blocked. Threshold is the fixture-tuned "
        "NEAR_DUP_COSINE; a production corpus uses ~0.95+."
    ),
    tags=("dedup", "similarity", "llm", "curation"),
)
def semdedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_stream_processor_spark.plans.caching import persisted_result

    assign0 = kmeans_embedding_clusters(spark, sf_dir).select(
        "vec_id", "cluster_id"
    )
    # the 3-round Lloyd assignment chain feeds the a-side, the b-side, and
    # the final keep join; persist it for the build and release (same
    # cache-scope pattern as prefix_filter_jaccard_join)
    return persisted_result(assign0, lambda assign: _semdedup_tree(spark, sf_dir, assign))


def _semdedup_tree(spark: SparkSession, sf_dir: str, assign: DataFrame) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id").select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("nrm")
    )
    m = assign.join(emb, "vec_id")
    a = m.select(
        F.col("cluster_id"),
        F.col("vec_id").alias("keep_id"),
        F.col("embedding").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
    )
    b = m.select(
        F.col("cluster_id"),
        F.col("vec_id").alias("drop_id"),
        F.col("embedding").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
    )
    cos = F.round(
        dot(F.col("a_emb"), F.col("b_emb")) / (F.col("a_nrm") * F.col("b_nrm")), 6
    )
    dropped = (
        a.join(b, on=["cluster_id"])
        .filter(F.col("keep_id") < F.col("drop_id"))
        .filter(cos >= F.lit(NEAR_DUP_COSINE))
        .select("drop_id")
        .distinct()
    )
    return (
        assign.join(dropped, assign.vec_id == dropped.drop_id, "left")
        .select(
            "vec_id",
            "cluster_id",
            F.col("drop_id").isNull().alias("is_kept"),
        )
    )


# Target distribution for DSIR scoring: English documents. A production
# pipeline would point this at a curated target corpus (Wikipedia, books);
# the fixture's `lang` column gives a deterministic stand-in with the same
# two-distribution shape.
DSIR_TARGET_LANG = "en"


@register(
    "dsir_importance_weights",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
            FROM documents
        ),
        ca AS (SELECT w, COUNT(*) AS ca FROM tok GROUP BY w),
        ct AS (
            SELECT w, COUNT(*) AS ct FROM tok
            WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY w
        ),
        tot AS (
            SELECT (SELECT SUM(ca) FROM ca) AS ts,
                   (SELECT COALESCE(SUM(ct), 0) FROM ct) AS tt,
                   (SELECT COUNT(*) FROM ca) AS v
        ),
        llr AS (
            SELECT ca.w,
                   LN((COALESCE(ct.ct, 0) + 1.0) / (tot.tt + tot.v))
                   - LN((ca.ca + 1.0) / (tot.ts + tot.v)) AS llr
            FROM ca LEFT JOIN ct USING (w) CROSS JOIN tot
        )
        SELECT tok.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               ROUND(AVG(llr.llr), 6) AS dsir_logratio,
               (ROUND(AVG(llr.llr), 6) > 0) AS target_like
        FROM tok JOIN llr USING (w)
        GROUP BY tok.doc_id
    """,
    doc=(
        "DSIR-style importance weights (Xie et al. 2023): per-document "
        "average log-likelihood ratio of its tokens under the TARGET "
        f"unigram model (lang = '{DSIR_TARGET_LANG}') vs the RAW-corpus "
        "model, add-one smoothing over the shared vocabulary. Positive "
        "score = more target-like; importance resampling samples "
        "proportionally to exp(score). Plan: two vocabulary-bounded hash "
        "aggregations (map-side partials; shuffle = |vocab|, not "
        "|tokens|), a one-row totals aggregate crossed in (broadcast "
        "NestedLoopJoin of a single row), and the per-token scoring join "
        "broadcasts the |vocab|-row log-ratio table into the token "
        "explode — the corpus-sized side never shuffles. At 100 TB the "
        "vocab table is hashed-feature-bounded (the paper buckets n-grams "
        "to 10k features); the plan is unchanged."
    ),
    tags=("text", "llm", "curation", "sampling"),
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_stream_processor_spark.plans.caching import persisted_result

    docs = load_table(spark, sf_dir, "documents")
    tok0 = spread(docs, "doc_id").select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("w")
    )
    # the token explode feeds the corpus model, the target model, AND the
    # scoring join; persist it for the build and release
    return persisted_result(tok0, _dsir_tree)


def _dsir_tree(tok: DataFrame) -> DataFrame:
    ca = tok.groupBy("w").agg(F.count(F.lit(1)).alias("ca"))
    ct = (
        tok.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    tot = ca.join(ct, "w", "left").agg(
        F.sum("ca").alias("ts"),
        F.coalesce(F.sum("ct"), F.lit(0)).alias("tt"),
        F.count(F.lit(1)).alias("v"),
    )
    llr = (
        ca.join(ct, "w", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "w",
            (
                F.log((F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0)) / (F.col("tt") + F.col("v")))
                - F.log((F.col("ca") + F.lit(1.0)) / (F.col("ts") + F.col("v")))
            ).alias("llr"),
        )
    )
    return (
        tok.join(F.broadcast(llr), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            # the boolean derives from the ROUNDED score so the published
            # (score, flag) pair is self-consistent and the 6dp quantization
            # protects the sign near zero in both engines
            F.round(F.avg("llr"), 6).alias("dsir_logratio"),
        )
        .withColumn("target_like", F.col("dsir_logratio") > 0)
    )


@register(
    "embedding_eval_decontam",
    oracle=f"""
        WITH ev AS (
            SELECT vec_id AS eid, CAST(unnest(embedding) AS DOUBLE) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings WHERE vec_id % {EVAL_VEC_MODULUS} = 0
        ),
        corpus AS (
            SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings WHERE vec_id % {EVAL_VEC_MODULUS} <> 0
        ),
        sims AS (
            SELECT c.vec_id, e.eid,
                   ROUND(SUM(c.x * e.x)
                         / (SQRT(SUM(c.x * c.x)) * SQRT(SUM(e.x * e.x))),
                         6) AS cos,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.vec_id
                       ORDER BY ROUND(SUM(c.x * e.x)
                                / (SQRT(SUM(c.x * c.x)) * SQRT(SUM(e.x * e.x))),
                                6) DESC, e.eid
                   ) AS rn
            FROM corpus c JOIN ev e USING (i)
            GROUP BY c.vec_id, e.eid
        )
        SELECT vec_id, eid AS nearest_eval_id, cos AS max_eval_cos,
               cos >= {NEAR_DUP_COSINE} AS is_contaminated
        FROM sims WHERE rn = 1
    """,
    doc=(
        "Embedding-space eval decontamination: every corpus vector is "
        "scored by its max cosine to the held-out eval set (every "
        f"{EVAL_VEC_MODULUS}th vec_id) and flagged at >= "
        f"{NEAR_DUP_COSINE} — the semantic complement of the n-gram "
        "decontamination_overlap (catches paraphrased leakage that "
        "shingle overlap misses). Plan: the eval side is SMALL BY "
        "CONSTRUCTION (an eval suite is thousands of rows, not "
        "billions), so it broadcasts into a single corpus scan — "
        "map-side crossJoin, no corpus shuffle; the argmax window "
        "partitions by corpus vec_id with |eval| rows per partition "
        "(bounded). Cosine rounded to 6dp BEFORE the argmax ordering so "
        "Spark/DuckDB float drift cannot flip the nearest-eval "
        "tie-break. At 100 TB: same plan; if the eval suite outgrows "
        "broadcast, block it like embedding_near_dup_blocked."
    ),
    tags=("similarity", "llm", "curation", "dedup"),
)
def embedding_eval_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id").select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("nrm")
    )
    is_eval = F.col("vec_id") % EVAL_VEC_MODULUS == 0
    ev = emb.filter(is_eval).select(
        F.col("vec_id").alias("eid"),
        F.col("embedding").alias("e_emb"),
        F.col("nrm").alias("e_nrm"),
    )
    corpus = emb.filter(~is_eval)
    cos = F.round(
        dot(F.col("embedding"), F.col("e_emb")) / (F.col("nrm") * F.col("e_nrm")), 6
    )
    sims = corpus.crossJoin(F.broadcast(ev)).select(
        "vec_id", "eid", cos.alias("cos")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("eid"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("eid").alias("nearest_eval_id"),
            F.col("cos").alias("max_eval_cos"),
            (F.col("cos") >= NEAR_DUP_COSINE).alias("is_contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# Information-gain feature ranking (round-5u).
# ---------------------------------------------------------------------------


@register(
    "information_gain_features",
    oracle="""
        WITH base AS (
            SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                   source,
                   CAST(n_chars // 100 AS BIGINT) AS len_bucket,
                   CAST(len(string_split(text, ' ')) // 20 AS BIGINT)
                       AS tok_bucket
            FROM documents
        ),
        melted AS (
            SELECT 'source' AS feature, source AS val, y FROM base
            UNION ALL
            SELECT 'len_bucket', CAST(len_bucket AS VARCHAR), y FROM base
            UNION ALL
            SELECT 'tok_bucket', CAST(tok_bucket AS VARCHAR), y FROM base
        ),
        cells AS (
            SELECT feature, val,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS pos
            FROM melted GROUP BY feature, val
        ),
        tot AS (
            SELECT feature,
                   CAST(SUM(n) AS BIGINT) AS nt,
                   CAST(SUM(pos) AS BIGINT) AS post
            FROM cells GROUP BY feature
        ),
        ent AS (
            SELECT c.feature,
                   CAST(COUNT(*) AS BIGINT) AS n_values,
                   -- H(y): same for every feature, from that feature's total
                   -(CASE WHEN t.post = 0 OR t.post = t.nt THEN 0.0
                          ELSE t.post * 1.0 / t.nt * ln(t.post * 1.0 / t.nt)
                               + (t.nt - t.post) * 1.0 / t.nt
                                 * ln((t.nt - t.post) * 1.0 / t.nt)
                     END) / ln(2.0) AS h_y,
                   SUM(
                       (c.n * 1.0 / t.nt)
                       * (-(CASE WHEN c.pos = 0 OR c.pos = c.n THEN 0.0
                                 ELSE c.pos * 1.0 / c.n * ln(c.pos * 1.0 / c.n)
                                      + (c.n - c.pos) * 1.0 / c.n
                                        * ln((c.n - c.pos) * 1.0 / c.n)
                            END)) / ln(2.0)
                   ) AS cond_h,
                   SUM(-(c.n * 1.0 / t.nt) * ln(c.n * 1.0 / t.nt)) / ln(2.0)
                       AS h_feature
            FROM cells c JOIN tot t USING (feature)
            GROUP BY c.feature, t.nt, t.post
        )
        SELECT feature, n_values,
               ROUND(h_y, 6) AS h_y,
               ROUND(cond_h, 6) AS cond_h,
               ROUND(h_y - cond_h, 6) AS info_gain,
               ROUND((h_y - cond_h) / h_feature, 6) AS gain_ratio
        FROM ent
    """,
    doc=(
        "INFORMATION-GAIN FEATURE RANKING against the lang='en' label: "
        "for each candidate feature (source, 100-char length bucket, "
        "20-token count bucket), IG = H(y) - H(y|feature) plus the "
        "Quinlan GAIN RATIO (IG / H(feature), the correction that stops "
        "high-cardinality features winning by fragmentation) — the "
        "screen run before training any metadata-based quality "
        "classifier, and the principled version of 'which column "
        "predicts quality'. Plan: one scan melts the features via "
        "UNION-ALL projections (Spark: one stack()), one hash aggregate "
        "to the (feature, value, label) CONTINGENCY cells — bounded by "
        "the feature-value domains — and entropies are per-cell exact-"
        "count arithmetic summed over those bounded cells (6-dp "
        "rounded). Zero-entropy cells guard the ln explicitly so both "
        "engines stay on the arithmetic path."
    ),
    tags=("curation", "llm", "statistics", "features"),
)
def information_gain_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        "source",
        F.floor(F.col("n_chars") / 100).cast("bigint").alias("len_bucket"),
        F.floor(F.size(tokens(F.col("text"))) / 20).cast("bigint").alias(
            "tok_bucket"
        ),
    )
    melted = base.select(
        F.expr(
            "stack(3, 'source', source, "
            "'len_bucket', CAST(len_bucket AS STRING), "
            "'tok_bucket', CAST(tok_bucket AS STRING)) AS (feature, val)"
        ),
        "y",
    )
    cells = melted.groupBy("feature", "val").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    tot = cells.groupBy("feature").agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("pos").cast("bigint").alias("post"),
    )

    def h2(pos, n):
        p = pos * F.lit(1.0) / n
        q = (n - pos) * F.lit(1.0) / n
        return (
            F.when((pos == 0) | (pos == n), F.lit(0.0))
            .otherwise(-(p * F.log(p) + q * F.log(q)))
            / F.log(F.lit(2.0))
        )

    j = cells.join(tot, "feature")
    share = F.col("n") * F.lit(1.0) / F.col("nt")
    ent = j.groupBy("feature", "nt", "post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_values"),
        F.any_value(h2(F.col("post"), F.col("nt"))).alias("h_y"),
        F.sum(share * h2(F.col("pos"), F.col("n"))).alias("cond_h"),
        F.sum(-share * F.log(share) / F.log(F.lit(2.0))).alias("h_feature"),
    )
    return ent.select(
        "feature",
        "n_values",
        F.round("h_y", 6).alias("h_y"),
        F.round("cond_h", 6).alias("cond_h"),
        F.round(F.col("h_y") - F.col("cond_h"), 6).alias("info_gain"),
        F.round((F.col("h_y") - F.col("cond_h")) / F.col("h_feature"), 6).alias(
            "gain_ratio"
        ),
    )


# ---------------------------------------------------------------------------
# Leave-one-source-out influence: which source moves the embedding
# distribution most (round 9).
# ---------------------------------------------------------------------------

_LOO_LIFT_DUCK = (
    "[CAST(floor(CAST(u AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)"
    " FOR u IN embedding]"
)
_LOO_LIFT_SPARK = (
    "transform(embedding, x ->"
    " CAST(floor(CAST(x AS DOUBLE) * 10000.0 + 0.5) AS BIGINT))"
)


@register(
    "loo_source_influence",
    oracle=f"""
        WITH v AS (
            SELECT d.source, {_LOO_LIFT_DUCK} AS kv
            FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        ),
        dims AS (
            SELECT source, i, kv[i] AS x
            FROM v, (SELECT unnest(range(1, 33)) AS i)
        ),
        gd AS (
            SELECT source, i, CAST(SUM(x) AS BIGINT) AS s_gi
            FROM dims GROUP BY source, i
        ),
        td AS (
            SELECT i, CAST(SUM(s_gi) AS BIGINT) AS s_i FROM gd GROUP BY i
        ),
        cnt AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_g
            FROM v GROUP BY source
        ),
        tot AS (
            SELECT CAST(SUM(n_g) AS BIGINT) AS n,
                   (SELECT CAST(CAST(SUM(s_i * s_i) AS DECIMAL(38, 0))
                                AS BIGINT) FROM td)
                       AS stt
            FROM cnt
        ),
        mom AS (
            SELECT gd.source,
                   CAST(CAST(SUM(gd.s_gi * gd.s_gi) AS DECIMAL(38, 0))
                        AS BIGINT) AS sgg,
                   CAST(CAST(SUM(gd.s_gi * td.s_i) AS DECIMAL(38, 0))
                        AS BIGINT) AS sgt
            FROM gd JOIN td USING (i) GROUP BY gd.source
        )
        SELECT c.source, c.n_g, t.n, m.sgg, m.sgt, t.stt
        FROM cnt c JOIN mom m USING (source) CROSS JOIN tot t
    """,
    doc=(
        "LEAVE-ONE-SOURCE-OUT INFLUENCE (datamodel-lite attribution): "
        "how far does the corpus embedding centroid move when one "
        "source's documents are removed? With exact integer group sums "
        "S_g and total S, mu_all - mu_without_g = (n*S_g - n_g*S) / "
        "(n*(n - n_g)) per dimension, so the squared shift's numerator "
        "is n^2*sgg - 2*n*n_g*sgt + n_g^2*stt over the three moments "
        "(sgg = |S_g|^2, sgt = S_g.S, stt = |S|^2) — the consumer "
        "divides by (n*(n - n_g))^2 once, outside the hashed result "
        "(the covariance-spectrum all-integer contract). The moments "
        "accumulate in DECIMAL(38,0) internally but EMIT as BIGINT in "
        "both engines: Spark's Decimal objects and DuckDB's float64 "
        "rendering of the same DECIMAL(38,0) value hash differently "
        "(the r10 driver red), while int64 is wire-identical. BIGINT "
        "emission is exact while 32*(n_g*1e4)^2 < 2^63, i.e. to ~5e4 "
        "docs/source worst-case and ~5e6 under the observed mixed-sign "
        "cancellation; past that, re-emit as STRING, not DECIMAL. "
        "Plan: one doc-embedding join (vec_id = doc_id), one hash "
        "aggregate to |sources| rows of 32 per-dim sums, a 1-row total "
        "broadcast back — per-source work is a single corpus scan, "
        "nothing pairwise. Exact under |S_g[i]| <= n_g*1e4, so the "
        "DECIMAL(38,0) moments hold past 1e14 vectors; the BIGINT "
        "per-dim sums overflow loudly (ANSI/strict on both engines) "
        "long after that. At 100 TB this is the cheap first-pass "
        "attribution before anything gradient-based: sources whose "
        "removal barely moves the distribution are safe ablation "
        "candidates; outsized movers get audited."
    ),
    tags=("curation", "llm", "similarity", "attribution"),
)
def loo_source_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(_LOO_LIFT_SPARK).alias("kv")
    )
    v = docs.join(emb, docs.doc_id == emb.vec_id).select("source", "kv")
    dim_sums = [
        F.sum(F.element_at("kv", i)).cast("bigint").alias(f"s{i}")
        for i in range(1, 33)
    ]
    g = v.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"), *dim_sums
    )
    s_g = F.array(*[F.col(f"s{i}") for i in range(1, 33)])
    g = g.select("source", "n_g", s_g.alias("s_g"))
    tot = g.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.array(
            *[
                F.sum(F.element_at("s_g", i)).cast("bigint")
                for i in range(1, 33)
            ]
        ).alias("s"),
    )

    def sq_dot(a: str, b: str) -> F.Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("decimal(38,0)"),
            lambda acc, z: acc + z.cast("decimal(38,0)"),
        )

    return g.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_g",
        "n",
        sq_dot("s_g", "s_g").cast("bigint").alias("sgg"),
        sq_dot("s_g", "s").cast("bigint").alias("sgt"),
        sq_dot("s", "s").cast("bigint").alias("stt"),
    )


@register(
    "dp_contribution_clipping_audit",
    oracle="""
        WITH contrib AS (
            SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        hist AS (
            SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS n_c
            FROM contrib GROUP BY 1, 2
        ),
        run AS (
            SELECT event_type, c, n_c,
                   CAST(SUM(n_c) OVER (
                       PARTITION BY event_type ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum_users,
                   CAST(SUM(c * n_c) OVER (
                       PARTITION BY event_type ORDER BY c
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum_mass,
                   CAST(SUM(n_c) OVER (PARTITION BY event_type)
                        AS BIGINT) AS tot_users,
                   CAST(SUM(c * n_c) OVER (PARTITION BY event_type)
                        AS BIGINT) AS tot_mass,
                   CAST(MAX(c) OVER (PARTITION BY event_type)
                        AS BIGINT) AS max_c
            FROM hist
        ),
        ret AS (
            SELECT event_type, c, cum_users, tot_users, tot_mass, max_c,
                   cum_mass + c * (tot_users - cum_users) AS retained
            FROM run
        ),
        pick AS (
            SELECT event_type, c, cum_users, tot_users, tot_mass, max_c,
                   retained,
                   ROW_NUMBER() OVER (
                       PARTITION BY event_type ORDER BY c ASC
                   ) AS rk
            FROM ret
            WHERE retained * 20 >= tot_mass * 19
        )
        SELECT event_type,
               tot_users AS n_users,
               tot_mass AS total_contributions,
               max_c AS max_contribution,
               c AS clip_c,
               retained AS retained_contributions,
               ROUND(CAST(retained AS DOUBLE) / tot_mass, 6)
                   AS retained_fraction,
               tot_users - cum_users AS clipped_users,
               c AS l1_sensitivity
        FROM pick WHERE rk = 1
    """,
    doc=(
        "DIFFERENTIAL-PRIVACY CONTRIBUTION-CLIPPING AUDIT per "
        "event_type: the deterministic sizing pass every user-level DP "
        "release starts with — a DP count/sum's noise scales with the "
        "L1 sensitivity, which is the per-user contribution CAP, so "
        "the engineering question is 'what is the smallest clip C that "
        "keeps >= 95% of the contribution mass' (clip too high and the "
        "Laplace/Gaussian noise drowns the statistic; too low and the "
        "clipping bias does). Per-user counts roll to a contribution "
        "HISTOGRAM (bounded by max contribution, metadata-sized), "
        "running sums give retained(C) = mass_below + C * users_above "
        "for every candidate C, and the 95% gate is the exact integer "
        "comparison retained*20 >= 19*total (no float threshold "
        "anywhere); the chosen C IS the L1 sensitivity the release "
        "would use, and clipped_users counts who the cap touches. The "
        "noise injection itself is the (seeded) release step, out of "
        "scope by the determinism contract — this operator is the "
        "sizing audit. Plan: one corpus scan to the (type, user) "
        "aggregate, one histogram aggregate, ordered windows on the "
        "bounded histogram; at 100 TB the only data-sized stage is "
        "the first aggregate."
    ),
    tags=("curation", "privacy", "llm", "statistics"),
)
def dp_contribution_clipping_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    contrib = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    hist = contrib.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_c")
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    run = hist.select(
        "event_type",
        "c",
        "n_c",
        F.sum("n_c").over(w_run).cast("bigint").alias("cum_users"),
        F.sum(F.col("c") * F.col("n_c"))
        .over(w_run)
        .cast("bigint")
        .alias("cum_mass"),
        F.sum("n_c").over(w_all).cast("bigint").alias("tot_users"),
        F.sum(F.col("c") * F.col("n_c"))
        .over(w_all)
        .cast("bigint")
        .alias("tot_mass"),
        F.max("c").over(w_all).cast("bigint").alias("max_c"),
    )
    ret = run.select(
        "event_type",
        "c",
        "cum_users",
        "tot_users",
        "tot_mass",
        "max_c",
        (
            F.col("cum_mass") + F.col("c") * (F.col("tot_users") - F.col("cum_users"))
        ).alias("retained"),
    )
    w_pick = Window.partitionBy("event_type").orderBy(F.asc("c"))
    pick = (
        ret.filter(F.col("retained") * 20 >= F.col("tot_mass") * 19)
        .withColumn("rk", F.row_number().over(w_pick))
        .filter(F.col("rk") == 1)
    )
    return pick.select(
        "event_type",
        F.col("tot_users").alias("n_users"),
        F.col("tot_mass").alias("total_contributions"),
        F.col("max_c").alias("max_contribution"),
        F.col("c").alias("clip_c"),
        F.col("retained").alias("retained_contributions"),
        F.round(
            F.col("retained").cast("double") / F.col("tot_mass"), 6
        ).alias("retained_fraction"),
        (F.col("tot_users") - F.col("cum_users")).alias("clipped_users"),
        F.col("c").alias("l1_sensitivity"),
    )
