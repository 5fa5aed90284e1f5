"""The composed training-mixture pipeline — every LLM-data stage this
engine provides, chained into ONE declarative plan:

    exact dedup -> quality filter -> benchmark decontamination ->
    stratified language sampling -> per-source cap -> token-budget packing

The point of registering the composition (beyond the per-stage operators)
is that Catalyst optimizes it as a single tree: column pruning reaches the
one scan shared by the dedup digest, the quality features and the shingle
stage; the decontamination eval set broadcasts; and the cap + packing
windows share the partitioning story documented per-stage. At 100 TB each
stage's posture is unchanged from its standalone registration — see
docs/SCALE.md — because composition adds no new shuffles beyond the
stages' own.

Stage semantics are IDENTICAL to the standalone operators:
dedup: min-doc_id survivor per sha-256 digest (exact_dedup_by_hash);
quality: the quality_scores formula, keep score >= 0.45;
decontamination: drop eval docs (doc_id % 20 == 0) and training docs with
  >= 10% shingle overlap with eval (decontamination_overlap);
sampling: per-language hash-bucket rates (stratified_sample_mixture);
cap: first 10 docs per source (per_source_cap);
packing: 4096-token shards per language (token_budget_packing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from weather_stream_processor_spark.functions import tokens
from weather_stream_processor_spark.operators.dedup import (
    _DECON_THRESHOLD,
    _SHINGLES_CTES,
    _exploded_shingles,
)
from weather_stream_processor_spark.operators.sampling import (
    _BUCKET_SQL,
    _RATES,
    _bucket,
)
from weather_stream_processor_spark.operators.text import STOPWORDS
from weather_stream_processor_spark.registry import register
from weather_stream_processor_spark.sources import load_table

_QUALITY_MIN = 0.45

_RATE_CASE = "CASE lang " + " ".join(
    f"WHEN '{lang}' THEN {permille}" for lang, permille in _RATES.items()
) + " ELSE 0 END"


@register(
    "training_mixture_pipeline",
    oracle=f"""
        WITH {_SHINGLES_CTES},
        survivors AS (
            SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY sha256(text)
        ),
        base AS (
            SELECT d.doc_id, d.lang, d.source, d.text
            FROM documents d JOIN survivors USING (doc_id)
        ),
        feats AS (
            SELECT doc_id, lang, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   ROUND(
                     LEAST(len(string_split(text, ' ')) / 50.0, 1.0) * 0.4
                     + (len(list_filter(string_split(text, ' '),
                            t -> list_contains({list(STOPWORDS)}, t)))
                        * 1.0 / len(string_split(text, ' '))) * 0.3
                     + (len(list_distinct(string_split(text, ' ')))
                        * 1.0 / len(string_split(text, ' '))) * 0.3, 6
                   ) AS quality_score
            FROM base
        ),
        eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0),
        train AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 20 <> 0),
        tsizes AS (SELECT doc_id, COUNT(*) AS n FROM train GROUP BY doc_id),
        hits AS (
            SELECT t.doc_id, COUNT(*) AS n_hits
            FROM train t JOIN eval_sh e USING (shingle)
            GROUP BY t.doc_id
        ),
        contaminated AS (
            SELECT h.doc_id FROM hits h JOIN tsizes s USING (doc_id)
            WHERE h.n_hits * 1.0 / s.n >= {_DECON_THRESHOLD}
        ),
        qualified AS (
            SELECT * FROM feats
            WHERE quality_score >= {_QUALITY_MIN}
              AND doc_id % 20 <> 0
              AND doc_id NOT IN (SELECT doc_id FROM contaminated)
        ),
        sampled AS (
            SELECT * FROM qualified
            WHERE {_BUCKET_SQL} < {_RATE_CASE}
        ),
        capped AS (
            SELECT doc_id, lang, source, n_tokens,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
            FROM sampled
        ),
        packed AS (
            SELECT doc_id, lang, source, n_tokens,
                   SUM(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum_tokens
            FROM capped WHERE rn <= 10
        )
        SELECT doc_id, lang, source, n_tokens,
               CAST(FLOOR((cum_tokens - n_tokens) / 4096) AS BIGINT) AS shard_id
        FROM packed
    """,
    doc=(
        "END-TO-END TRAINING-MIXTURE PIPELINE: exact dedup -> quality "
        "filter (>= 0.45) -> decontamination (drop eval + >=10% overlap) "
        "-> stratified language sampling -> per-source cap (10) -> "
        "4096-token shard packing, as ONE Catalyst plan. Deterministic "
        "from raw corpus to shard manifest: a re-run (or another engine, "
        "per the oracle) reproduces the identical mixture byte-for-byte."
    ),
    tags=("llm", "pipeline", "headline", "dedup", "sampling"),
)
def training_mixture_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    # 1. exact dedup: min-doc_id survivor per content digest
    survivors = (
        docs.groupBy(F.sha2("text", 256).alias("digest"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    base = docs.join(survivors, "doc_id", "left_semi")

    # 2. quality features (identical formula to quality_scores)
    toks = tokens(F.col("text"))
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(toks).cast("bigint")
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / F.size(toks)
    uniq_ratio = F.size(F.array_distinct(toks)) / F.size(toks)
    quality = F.round(
        F.least(F.size(toks) / 50.0, F.lit(1.0)) * 0.4
        + stop_ratio * 0.3
        + uniq_ratio * 0.3,
        6,
    )
    feats = base.select(
        "doc_id", "lang", "source", n_tokens.alias("n_tokens"), quality.alias("quality_score")
    )

    # 3. decontamination: eval shingle set broadcast, overlap >= threshold
    sh = _exploded_shingles(docs)
    is_eval = F.col("doc_id") % 20 == 0
    eval_sh = sh.filter(is_eval).select("shingle").distinct()
    contaminated = (
        sh.filter(~is_eval)
        .join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") / F.col("n_shingles") >= _DECON_THRESHOLD)
        .select("doc_id")
    )
    qualified = (
        feats.filter((F.col("quality_score") >= _QUALITY_MIN) & ~is_eval)
        .join(contaminated, "doc_id", "left_anti")
    )

    # 4. stratified language sampling (deterministic hash buckets)
    rate = F.lit(0)
    for lang, permille in _RATES.items():
        rate = F.when(F.col("lang") == lang, permille).otherwise(rate)
    sampled = qualified.filter(_bucket(F.col("doc_id")) < rate)

    # 5. per-source cap
    cap_w = Window.partitionBy("source").orderBy("doc_id")
    capped = (
        sampled.withColumn("rn", F.row_number().over(cap_w))
        .filter(F.col("rn") <= 10)
        .drop("rn", "quality_score")
    )

    # 6. token-budget shard packing
    pack_w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = capped.withColumn("cum_tokens", F.sum("n_tokens").over(pack_w))
    return cum.select(
        "doc_id",
        "lang",
        "source",
        "n_tokens",
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(4096)).alias("shard_id"),
    )


# --- Round-6: corpus concentration panel ---------------------------------------


@register(
    "source_concentration_panel",
    oracle="""
        WITH per AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_toks
            FROM documents GROUP BY source
        ),
        tot AS (
            SELECT CAST(SUM(n_docs) AS BIGINT) AS nd,
                   CAST(SUM(n_toks) AS BIGINT) AS nt,
                   CAST(SUM(n_toks * n_toks) AS BIGINT) AS sq,
                   CAST(COUNT(*) AS BIGINT) AS k
            FROM per
        ),
        top3 AS (
            SELECT CAST(SUM(n_toks) AS BIGINT) AS t3 FROM (
                SELECT n_toks,
                       ROW_NUMBER() OVER (ORDER BY n_toks DESC, source) AS rn
                FROM per
            ) WHERE rn <= 3
        ),
        ent AS (
            SELECT ROUND(SUM(-(CAST(p.n_toks AS DOUBLE) / t.nt)
                              * ln(CAST(p.n_toks AS DOUBLE) / t.nt)), 6)
                       AS shannon
            FROM per p CROSS JOIN tot t
        )
        SELECT t.k AS n_sources, t.nd AS n_docs, t.nt AS n_tokens,
               CAST(t.sq * 1000000000 // (t.nt * t.nt) AS BIGINT) AS hhi_e9,
               CAST(t.nt * t.nt * 1000000 // t.sq AS BIGINT)
                   AS effective_sources_e6,
               CAST(p3.t3 * 1000000 // t.nt AS BIGINT) AS top3_share_e6,
               e.shannon AS token_entropy
        FROM tot t CROSS JOIN top3 p3 CROSS JOIN ent e
    """,
    doc=(
        "CORPUS CONCENTRATION PANEL over the source token mix — the "
        "'is my training mixture actually diverse' audit run before "
        "fixing mixture weights: Herfindahl-Hirschman index (sum of "
        "squared token shares, the antitrust concentration measure), "
        "its reciprocal EFFECTIVE NUMBER OF SOURCES (the inverse-"
        "Simpson diversity — 20 equal sources scores 20.0, one "
        "dominant source collapses toward 1), the top-3 share, and the "
        "Shannon entropy of the mix. HHI / effective-N / top-share are "
        "EXACT integer ratios (n_s^2 sums never leave int64 here; at "
        "token counts past ~3e9 lift to DECIMAL(38,0) like the CKA "
        "Frobenius sums); entropy is the one mirrored-ln double. One "
        "source-keyed aggregate + three one-row reductions — constant "
        "output at any corpus size."
    ),
    tags=("sampling", "llm", "mixture", "statistics"),
)
def source_concentration_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_toks"),
    )
    tot = per.agg(
        F.sum("n_docs").cast("bigint").alias("nd"),
        F.sum("n_toks").cast("bigint").alias("nt"),
        F.sum(F.col("n_toks") * F.col("n_toks")).cast("bigint").alias("sq"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    top3 = (
        per.withColumn(
            "rn",
            F.row_number().over(Window.orderBy(F.desc("n_toks"), F.asc("source"))),
        )
        .filter(F.col("rn") <= 3)
        .agg(F.sum("n_toks").cast("bigint").alias("t3"))
    )
    ent = (
        per.crossJoin(F.broadcast(tot.select("nt")))
        .agg(
            F.round(
                F.sum(
                    -(F.col("n_toks").cast("double") / F.col("nt"))
                    * F.log(F.col("n_toks").cast("double") / F.col("nt"))
                ),
                6,
            ).alias("shannon")
        )
    )
    return (
        tot.crossJoin(F.broadcast(top3))
        .crossJoin(F.broadcast(ent))
        .select(
            F.col("k").alias("n_sources"),
            F.col("nd").alias("n_docs"),
            F.col("nt").alias("n_tokens"),
            F.expr("CAST(sq * 1000000000 div (nt * nt) AS BIGINT)").alias("hhi_e9"),
            F.expr("CAST(nt * nt * 1000000 div sq AS BIGINT)").alias(
                "effective_sources_e6"
            ),
            F.expr("CAST(t3 * 1000000 div nt AS BIGINT)").alias("top3_share_e6"),
            F.col("shannon").alias("token_entropy"),
        )
    )


@register(
    "source_lm_divergence_matrix",
    oracle="""
        WITH cnts AS (
            SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
                  FROM documents)
            GROUP BY source, tok
        ),
        totals AS (
            SELECT source, CAST(SUM(c) AS BIGINT) AS n
            FROM cnts GROUP BY source
        ),
        vocab AS (
            SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM cnts
        ),
        selfent AS (
            -- MLE self-entropy per source: -sum p ln p over its own
            -- observed tokens (vocabulary-bounded float sum, 6-dp
            -- contract as in the perplexity family)
            SELECT c.source,
                   -SUM((c.c * 1.0 / t.n) * ln(c.c * 1.0 / t.n)) AS h_self
            FROM cnts c JOIN totals t USING (source)
            GROUP BY c.source
        ),
        pairs AS (
            -- p-side tokens expanded against every q source; missing
            -- q counts take the add-1 smoothing floor via the left join
            SELECT a.source AS source_a, tb.source AS source_b,
                   ta.n AS n_a, tb.n AS n_b,
                   a.c AS c_a, COALESCE(b.c, 0) AS c_b, vocab.v
            FROM cnts a
            JOIN totals ta ON ta.source = a.source
            CROSS JOIN totals tb
            LEFT JOIN cnts b ON b.source = tb.source AND b.tok = a.tok
            CROSS JOIN vocab
        ),
        ce AS (
            SELECT source_a, source_b,
                   CAST(MAX(n_a) AS BIGINT) AS n_tokens_a,
                   -SUM((c_a * 1.0 / n_a)
                        * ln((c_b + 1.0) / (n_b + v))) AS h_cross
            FROM pairs GROUP BY source_a, source_b
        )
        SELECT ce.source_a, ce.source_b, ce.n_tokens_a,
               ROUND(ce.h_cross, 6) AS cross_entropy,
               ROUND(s.h_self, 6) AS self_entropy_a,
               ROUND(ce.h_cross - s.h_self, 6) AS kl_a_to_b
        FROM ce JOIN selfent s ON s.source = ce.source_a
    """,
    doc=(
        "SOURCE LANGUAGE-MODEL DIVERGENCE MATRIX: for every ordered "
        "source pair (a, b), the cross-entropy (nats/token) of source "
        "a's unigram distribution under source b's add-1-smoothed "
        "unigram LM, a's MLE self-entropy, and the KL excess — the "
        "DOMAIN-AFFINITY matrix mixture design actually uses (DoReMi/ "
        "DoGE-class reweighting and curriculum ordering need 'which "
        "sources are linguistically close', and the shingle-Jaccard "
        "cross_source_overlap_matrix cannot say it: passage overlap "
        "sees literal duplication, cross-entropy sees DISTRIBUTIONAL "
        "kinship with no shared text at all — and it is ASYMMETRIC, "
        "distinguishing 'a is predictable under b' from the reverse, "
        "which matters when one source is a subset-register of "
        "another). mixture_drift_kl covers the label-level mixture; "
        "this is the content-level affinity. Plan: ONE token explode "
        "into the (source, token) count table (vocabulary-bounded); "
        "the pair expansion joins that table to the |sources|-row "
        "totals and back to itself per token — |vocab| x |sources| "
        "rows, bounded by vocabulary not corpus; per-pair sums follow "
        "the perplexity family's 6-dp float contract; smoothing "
        "constants (add-1 over the shared vocab) are identical integer "
        "expressions in both engines. Output is the |sources|^2 "
        "matrix. At 100 TB estimate the per-source LMs on a sampled "
        "slice; the plan shape is unchanged."
    ),
    tags=("mixture", "llm", "statistics", "curation"),
)
def source_lm_divergence_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cnts = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    from weather_stream_processor_spark.plans.caching import persisted_result

    # the count table feeds totals, vocab, self-entropy, and BOTH sides
    # of the pair expansion — persist the vocabulary-bounded grid so the
    # corpus explodes once (the r10 scan-count discipline)
    return persisted_result(cnts, _lm_divergence_build)


def _lm_divergence_build(cnts: DataFrame) -> DataFrame:
    totals = cnts.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    vocab = cnts.agg(F.count_distinct("tok").cast("bigint").alias("v"))
    p = F.col("c") * F.lit(1.0) / F.col("n")
    selfent = (
        cnts.join(totals, "source")
        .groupBy("source")
        .agg((-F.sum(p * F.log(p))).alias("h_self"))
    )
    a = cnts.select(
        F.col("source").alias("source_a"), "tok", F.col("c").alias("c_a")
    )
    b = cnts.select(
        F.col("source").alias("sb"),
        F.col("tok").alias("tok_b"),
        F.col("c").alias("c_b"),
    )
    ta = totals.select(
        F.col("source").alias("source_a"), F.col("n").alias("n_a")
    )
    tb = totals.select(
        F.col("source").alias("source_b"), F.col("n").alias("n_b")
    )
    pairs = (
        a.join(F.broadcast(ta), "source_a")
        .crossJoin(F.broadcast(tb))
        .join(
            b,
            (F.col("sb") == F.col("source_b"))
            & (F.col("tok_b") == F.col("tok")),
            "left",
        )
        .crossJoin(F.broadcast(vocab))
    )
    h_cross = -F.sum(
        (F.col("c_a") * F.lit(1.0) / F.col("n_a"))
        * F.log(
            (F.coalesce(F.col("c_b"), F.lit(0)) + F.lit(1.0))
            / (F.col("n_b") + F.col("v"))
        )
    )
    ce = pairs.groupBy("source_a", "source_b").agg(
        F.max("n_a").cast("bigint").alias("n_tokens_a"),
        h_cross.alias("h_cross"),
    )
    return ce.join(
        selfent.select(
            F.col("source").alias("source_a"), F.col("h_self")
        ),
        "source_a",
    ).select(
        "source_a",
        "source_b",
        "n_tokens_a",
        F.round(F.col("h_cross"), 6).alias("cross_entropy"),
        F.round(F.col("h_self"), 6).alias("self_entropy_a"),
        F.round(F.col("h_cross") - F.col("h_self"), 6).alias("kl_a_to_b"),
    )
