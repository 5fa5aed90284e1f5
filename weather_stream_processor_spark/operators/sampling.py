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

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_stream_processor_spark.registry import register
from weather_stream_processor_spark.sources import load_table

# bucket(doc_id) in [0, 1000): deterministic, engine-independent.
# The id is first reduced mod the Mersenne prime 2^31-1 so the product
# (2^31-2) * 2654435761 < 2^63 never overflows int64 in EITHER engine
# (Spark with ANSI off would wrap silently; DuckDB would raise — the
# mod-prime form makes both compute the identical in-range value for any
# bigint doc_id, including 100 TB-scale keyspaces beyond 2^31). For
# doc_id < 2^31-1 the reduction is the identity, so bucket values are
# unchanged for existing fixtures.
_BUCKETS = 1000
_KNUTH = 2654435761
_MOD = 2147483647  # 2^31 - 1 (Mersenne prime)


def _bucket(col: Column) -> Column:
    return F.shiftright((col % _MOD) * F.lit(_KNUTH), 16) % _BUCKETS


_BUCKET_SQL = f"(((doc_id % {_MOD}) * {_KNUTH}) >> 16) % {_BUCKETS}"


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


@register(
    "token_budget_packing",
    oracle="""
        WITH counted AS (
            SELECT doc_id, lang,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ),
        packed AS (
            SELECT doc_id, lang, n_tokens,
                   SUM(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum_tokens
            FROM counted
        )
        SELECT doc_id, lang, n_tokens,
               CAST(FLOOR((cum_tokens - n_tokens) / 4096) AS BIGINT) AS shard_id
        FROM packed
    """,
    doc=(
        "Token-budget SHARD PACKING (training-data prep): assign documents "
        "to ~4096-token shards per language via a running token sum — "
        "shard_id = floor(tokens_before_me / budget), so a shard's docs "
        "are contiguous in the deterministic (lang, doc_id) order and "
        "every shard except the last holds >= budget tokens' worth of "
        "starts. One shuffle on lang + one sort — but a LANGUAGE is a hot "
        "partition at 100 TB, so the production form first range-buckets "
        "each lang by doc_id into O(corpus/executor-mem) slices and packs "
        "within (lang, slice): identical window, bounded partitions, "
        "shard ids offset by slice. Deterministic => re-runs produce "
        "byte-identical shard manifests (the property that makes "
        "checkpoint/resume of a tokenization run possible)."
    ),
    tags=("sampling", "llm", "packing"),
)
def token_budget_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    counted = docs.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counted.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return cum.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(4096)).alias(
            "shard_id"
        ),
    )


@register(
    "per_source_cap",
    oracle="""
        WITH ranked AS (
            SELECT doc_id, source, lang,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
            FROM documents
        )
        SELECT doc_id, source, lang FROM ranked WHERE rn <= 10
    """,
    doc=(
        "Per-source document CAP: keep the first 10 docs (deterministic "
        "doc_id order) of every source — how a training mixture bounds "
        "over-represented domains/crawls. One shuffle on source + a "
        "per-partition rank; Catalyst plans the rn <= k filter as "
        "WindowGroupLimit (per-partition top-k heaps BEFORE the shuffle), "
        "so a 10M-doc domain contributes 10 rows to the exchange, not "
        "10M. At 100 TB prefer doc_id order over quality-score order only "
        "when you need replayability; score-ordered capping is the same "
        "plan with a different sort key."
    ),
    tags=("sampling", "llm", "cap", "topk"),
)
def per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("doc_id", "source", "lang")
    )


@register(
    "mixture_drift_kl",
    oracle=f"""
        WITH full_dist AS (
            SELECT lang, COUNT(*) * 1.0 / (SELECT COUNT(*) FROM documents) AS q
            FROM documents GROUP BY lang
        ),
        sample_dist AS (
            SELECT lang,
                   COUNT(*) * 1.0 / (SELECT COUNT(*) FROM documents
                                     WHERE {_BUCKET_SQL} < 50) AS p
            FROM documents
            WHERE {_BUCKET_SQL} < 50
            GROUP BY lang
        )
        SELECT s.lang,
               ROUND(s.p, 6) AS p_sample,
               ROUND(f.q, 6) AS q_corpus,
               ROUND(s.p * LN(s.p / f.q), 6) AS kl_term
        FROM sample_dist s JOIN full_dist f USING (lang)
    """,
    doc=(
        "MIXTURE DRIFT monitoring: per-language KL-divergence terms "
        "p*ln(p/q) between the deterministic 5% sample's language "
        "distribution (p) and the full corpus (q) — the check that a "
        "sampling/filter stage did not skew the mixture (sum the kl_term "
        "column for the scalar divergence). Two tiny grouped aggregates + "
        "a broadcast join on lang; at 100 TB both sides are "
        "|languages|-row tables derived from one-pass counts. Emitted "
        "per-language (not pre-summed) so the drift's SOURCE is visible."
    ),
    tags=("sampling", "llm", "monitoring"),
)
def mixture_drift_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sample = docs.filter(_bucket(F.col("doc_id")) < 50)

    def dist(df: DataFrame, colname: str) -> DataFrame:
        counts = df.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
        total = df.agg(F.count(F.lit(1)).alias("tot"))
        return counts.crossJoin(F.broadcast(total)).select(
            "lang", (F.col("n") / F.col("tot")).alias(colname)
        )

    p = dist(sample, "p")
    q = dist(docs, "q")
    return p.join(F.broadcast(q), "lang").select(
        "lang",
        F.round(F.col("p"), 6).alias("p_sample"),
        F.round(F.col("q"), 6).alias("q_corpus"),
        F.round(F.col("p") * F.log(F.col("p") / F.col("q")), 6).alias("kl_term"),
    )


@register(
    "shard_manifest_stats",
    oracle=f"""
        WITH counted AS (
            SELECT doc_id, lang,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ),
        packed AS (
            SELECT doc_id, lang, n_tokens,
                   SUM(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum_tokens
            FROM counted
        )
        SELECT lang,
               CAST(FLOOR((cum_tokens - n_tokens) / 4096) AS BIGINT) AS shard_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
               CAST(MIN(doc_id) AS BIGINT) AS first_doc,
               CAST(MAX(doc_id) AS BIGINT) AS last_doc
        FROM packed
        GROUP BY lang, shard_id
    """,
    doc=(
        "SHARD MANIFEST validation, the step after token_budget_packing: "
        "per-(lang, shard) document count, token fill, and the doc-id "
        "span proving shards are contiguous in the deterministic order. "
        "A tokenization run checkpoints against exactly this manifest — "
        "re-running the packer must reproduce it byte-for-byte before a "
        "resume is allowed. Plan: the packing window plus one further "
        "aggregate on the SAME (lang) partitioning — no extra exchange "
        "for the lang-level rollup."
    ),
    tags=("sampling", "llm", "packing", "quality"),
)
def shard_manifest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    packed = token_budget_packing(spark, sf_dir)
    return packed.groupBy("lang", "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("shard_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "temperature_mixture_weights",
    oracle="""
        WITH counts AS (
            SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
        ),
        z AS (SELECT SUM(POW(n_docs, 0.7)) AS z FROM counts)
        SELECT source, n_docs,
               ROUND(POW(n_docs, 0.7) / z, 6) AS weight,
               CAST(FLOOR(POW(n_docs, 0.7) / z * 100000 + 0.5) AS BIGINT)
                   AS target_docs
        FROM counts CROSS JOIN z
    """,
    doc=(
        "TEMPERATURE-BASED MIXTURE WEIGHTING (the alpha-sampling used to "
        "rebalance web-scale training mixtures, e.g. multilingual "
        "upsampling): per-source weight proportional to n_docs^alpha "
        "(alpha=0.7) normalized over sources, plus the realized per-source "
        "document target for a 100k-doc budget. Plan: one hash aggregate "
        "to source grain (map-side partials; |sources| rows), a one-row "
        "normalizer broadcast back — the corpus is scanned once and "
        "nothing bigger than the source dimension ever shuffles. Feed "
        "target_docs into per_source_cap to materialize the sample."
    ),
    tags=("sampling", "llm", "mixture"),
)
def temperature_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    z = counts.agg(F.sum(F.pow("n_docs", F.lit(0.7))).alias("z"))
    w = F.pow("n_docs", F.lit(0.7)) / F.col("z")
    return counts.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        F.round(w, 6).alias("weight"),
        F.floor(w * 100000 + F.lit(0.5)).cast("bigint").alias("target_docs"),
    )


@register(
    "weighted_bernoulli_sample",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, lang, n_chars,
                   {_BUCKET_SQL} AS bucket,
                   LEAST(n_chars, 500) AS wcap
            FROM documents
        )
        SELECT doc_id, lang, n_chars,
               ROUND(1000.0 / ((4 * wcap + 4) // 5), 6) AS ht_weight
        FROM w
        WHERE bucket * 5 < 4 * wcap
    """,
    doc=(
        "Length-weighted Bernoulli (Poisson) sample with Horvitz-Thompson "
        "weights: inclusion probability proportional to min(n_chars, 500), "
        "decided by the SAME deterministic hash bucket as the uniform "
        "sampler — membership is a pure integer predicate of (key, "
        "weight), so the sample is replayable across engines and re-runs "
        "and the HT weight (1/p) lets downstream aggregates stay unbiased. "
        "All-integer threshold arithmetic (bucket*5 < 4*w) avoids any "
        "float boundary between Spark and DuckDB. Map-side only: no "
        "shuffle, no global pass — at 100 TB this is a scan predicate. "
        "Contrast A-Res/exponential-keys weighted reservoirs, which need a "
        "global top-k; this is the scan-friendly form used when a fixed "
        "RATE (not a fixed SIZE) is wanted."
    ),
    tags=("sampling", "llm", "weighted"),
)
def weighted_bernoulli_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wcap = F.least(F.col("n_chars"), F.lit(500))
    kept_buckets = F.expr("(4 * least(n_chars, 500) + 4) div 5")
    return (
        docs.select(
            "doc_id",
            "lang",
            "n_chars",
            _bucket(F.col("doc_id")).alias("bucket"),
            kept_buckets.alias("kb"),
        )
        .filter(F.col("bucket") * 5 < 4 * wcap)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(1000.0 / F.col("kb"), 6).alias("ht_weight"),
        )
    )


# z-order: interleave the low 4 bits of two bucketized dimensions. Both
# engines get the same arithmetic; only the shift spelling differs
# (DuckDB infix >>, Spark shiftright()).
def _interleave_duckdb(x: str, y: str) -> str:
    terms = []
    for i in range(4):
        terms.append(f"((({x} >> {i}) & 1) * {1 << (2 * i)})")
        terms.append(f"((({y} >> {i}) & 1) * {1 << (2 * i + 1)})")
    return " + ".join(terms)


@register(
    "zorder_cell_stats",
    oracle=f"""
        WITH cells AS (
            SELECT o_totalprice,
                   o_custkey % 16 AS xb,
                   (epoch_ms(o_orderdate) // 86400000 // 180) % 16 AS yb
            FROM orders
        )
        SELECT {_interleave_duckdb('xb', 'yb')} AS zcell,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(CAST(SUM(CAST(FLOOR(o_totalprice * 10000 + 0.5) AS BIGINT))
                   AS BIGINT) / 10000.0, 2) AS cell_revenue
        FROM cells
        GROUP BY zcell
    """,
    doc=(
        "Z-order (Morton) cell assignment over two scan dimensions "
        "(customer-key bucket x order-date half-year bucket): interleaving "
        "the low 4 bits of each gives a 1-D key whose contiguous ranges "
        "cover RECTANGLES in (customer, time) space. Sorting/range-"
        "partitioning a 100 TB table by this key before writing makes "
        "parquet row-group min/max tight in BOTH dimensions at once, so "
        "either predicate prunes — the multi-dimensional data-skipping "
        "layout (Z-order clustering) that single-column sort cannot give. "
        "The registered query computes the cell stats a layout optimizer "
        "inspects; the key itself is pure bit arithmetic, identical in "
        "both engines."
    ),
    tags=("sampling", "layout", "scale"),
)
def zorder_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    x = F.col("o_custkey") % 16
    y = (F.expr("unix_micros(o_orderdate) div 86400000000 div 180")) % 16
    z = F.lit(0)
    for i in range(4):
        z = z + F.shiftright(x.cast("int"), i).bitwiseAND(1) * (1 << (2 * i))
        z = z + F.shiftright(y.cast("int"), i).bitwiseAND(1) * (1 << (2 * i + 1))
    return (
        orders.select(z.alias("zcell"), "o_totalprice")
        .groupBy("zcell")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(
                    F.floor(F.col("o_totalprice") * 10000 + F.lit(0.5)).cast("bigint")
                ).cast("bigint")
                / 10000.0,
                2,
            ).alias("cell_revenue"),
        )
    )


@register(
    "weighted_reservoir_topk",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, lang, n_chars,
                   ({_BUCKET_SQL} + 0.5) / 1000.0 AS u,
                   LEAST(n_chars, 500) AS wt
            FROM documents
        ),
        r AS (
            SELECT doc_id, lang, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang ORDER BY ln(u) / wt DESC, doc_id
                   ) AS rn
            FROM w
        )
        SELECT lang, doc_id, n_chars, CAST(rn AS BIGINT) AS rn
        FROM r WHERE rn <= 50
    """,
    doc=(
        "Fixed-SIZE weighted sample (A-Res / Efraimidis-Spirakis): per "
        "language keep the 50 docs with the largest u^(1/w) -- equivalently "
        "largest ln(u)/w -- where w = min(n_chars, 500) and u comes from "
        "the SAME deterministic doc_id hash bucket as the uniform sampler "
        "(u = (bucket + 0.5)/1000, never 0 so ln is finite). This is the "
        "weighted-without-replacement reservoir from the sampling "
        "literature, made replayable by swapping the RNG for the keyed "
        "hash. The per-group top-k compiles to WindowGroupLimit: each "
        "partition keeps a local 50, only survivors shuffle -- O(groups * "
        "k) exchange at 100 TB, no global sort. Complements "
        "weighted_bernoulli_sample (fixed RATE) with the fixed-SIZE form. "
        "Keys on the 1/1000 u-grid are well-separated doubles computed by "
        "the identical IEEE ops in both engines; exact (bucket, w) ties "
        "break on doc_id."
    ),
    tags=("sampling", "llm", "weighted"),
)
def weighted_reservoir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    u = (_bucket(F.col("doc_id")) + F.lit(0.5)) / F.lit(1000.0)
    key = F.log(u) / F.least(F.col("n_chars"), F.lit(500))
    w = Window.partitionBy("lang").orderBy(F.desc("key"), F.asc("doc_id"))
    return (
        docs.select("doc_id", "lang", "n_chars", key.alias("key"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .select("lang", "doc_id", "n_chars", F.col("rn").cast("bigint").alias("rn"))
    )


@register(
    "neyman_allocation",
    oracle="""
        WITH strata AS (
            SELECT lang,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   stddev_samp(n_chars) AS s
            FROM documents GROUP BY lang
        ),
        tot AS (SELECT SUM(n_docs * s) AS z FROM strata)
        SELECT lang, n_docs,
               ROUND(s, 6) AS stddev_chars,
               ROUND(n_docs * s / tot.z, 6) AS weight,
               CAST(FLOOR(1000 * n_docs * s / tot.z + 0.5) AS BIGINT)
                   AS allocated
        FROM strata CROSS JOIN tot
    """,
    doc=(
        "Neyman (minimum-variance) allocation for stratified sampling: "
        "given a 1000-doc budget, each language stratum gets n_h "
        "proportional to N_h * S_h (stratum size times stratum standard "
        "deviation of the measured variable) -- the classical "
        "survey-sampling optimum that spends budget where the variance "
        "is, instead of proportionally. One pass computes per-stratum "
        "(count, stddev) as a mergeable aggregate; the normalizer is a "
        "|strata|-row broadcast. Pairs with stratified_sample_mixture "
        "(which applies fixed rates) by COMPUTING the rates; floor(x+0.5) "
        "keeps the integer allocation identical across engines."
    ),
    tags=("sampling", "llm", "stats"),
)
def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    strata = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.stddev_samp("n_chars").alias("s"),
    )
    tot = strata.agg(F.sum(F.col("n_docs") * F.col("s")).alias("z"))
    w = F.col("n_docs") * F.col("s") / F.col("z")
    return strata.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.round("s", 6).alias("stddev_chars"),
        F.round(w, 6).alias("weight"),
        F.floor(1000 * w + F.lit(0.5)).cast("bigint").alias("allocated"),
    )


@register(
    "top_p_sources_per_lang",
    oracle="""
        WITH counts AS (
            SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY lang, source
        ),
        tot AS (
            SELECT lang, SUM(n_docs) AS total FROM counts GROUP BY lang
        ),
        ranked AS (
            SELECT c.lang, c.source, c.n_docs, t.total,
                   SUM(c.n_docs) OVER (
                       PARTITION BY c.lang
                       ORDER BY c.n_docs DESC, c.source
                   ) AS cum_n
            FROM counts c JOIN tot t USING (lang)
        )
        SELECT lang, source, n_docs,
               ROUND(n_docs * 1.0 / total, 6) AS share,
               ROUND(cum_n * 1.0 / total, 6) AS cum_share
        FROM ranked
        WHERE (cum_n - n_docs) * 10 < 9 * total
    """,
    doc=(
        "Nucleus (top-p) selection per group: within each language keep "
        "the largest sources until their cumulative share reaches p=0.9 "
        "-- the mixture-curation step that drops each slice's long tail "
        "of scraps while keeping 90% of its mass. The cumulative sum "
        "runs over the (lang, source) AGGREGATE (domain-bounded, "
        "partitioned by lang -- never a row-level window), and the "
        "keep predicate compares INTEGER cumulative counts "
        "((cum - n) * 10 < 9 * total), so no float boundary can "
        "disagree between engines at share ties."
    ),
    tags=("sampling", "llm", "mixture"),
)
def top_p_sources_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = counts.groupBy("lang").agg(F.sum("n_docs").alias("total"))
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("n_docs"), F.asc("source"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = counts.join(F.broadcast(tot), "lang").withColumn(
        "cum_n", F.sum("n_docs").over(w)
    )
    return ranked.filter(
        (F.col("cum_n") - F.col("n_docs")) * 10 < 9 * F.col("total")
    ).select(
        "lang",
        "source",
        "n_docs",
        F.round(F.col("n_docs") / F.col("total"), 6).alias("share"),
        F.round(F.col("cum_n") / F.col("total"), 6).alias("cum_share"),
    )


@register(
    "compaction_bin_packing",
    oracle="""
        WITH files AS (
            SELECT source, lang,
                   CAST(SUM(n_chars) AS BIGINT) AS size_chars,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY source, lang
        ),
        packed AS (
            SELECT *,
                   COALESCE(SUM(size_chars) OVER (
                       ORDER BY source, lang
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum_before
            FROM files
        )
        SELECT CAST(cum_before // 20000 AS BIGINT) AS group_id,
               CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(SUM(n_docs) AS BIGINT) AS n_docs,
               CAST(SUM(size_chars) AS BIGINT) AS total_chars
        FROM packed
        GROUP BY 1
    """,
    doc=(
        "Compaction planning -- the small-files maintenance pass every "
        "100 TB lakehouse table needs: treat each (source, lang) slice as "
        "a 'file' with its byte size, order deterministically, and cut "
        "~20k-char target groups by INTEGER division of the running size "
        "(cumulative-sum packing; groups can overshoot by at most one "
        "file, the standard streaming bin-pack bound). The running sum is "
        "an unpartitioned window BY DESIGN over the FILE MANIFEST -- "
        "metadata-sized (|sources| x |langs| here; at scale, one row per "
        "data file, e.g. ~100k rows for 100 TB of 1 GB files), never the "
        "data -- the same domain-bounded-window argument as "
        "skyline_size_price. All arithmetic is integer, so group "
        "boundaries are engine-exact."
    ),
    tags=("sampling", "maintenance", "layout"),
)
def compaction_bin_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    files = docs.groupBy("source", "lang").agg(
        F.sum("n_chars").alias("size_chars"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    w = (
        Window.orderBy("source", "lang")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = files.withColumn(
        "cum_before", F.coalesce(F.sum("size_chars").over(w), F.lit(0))
    )
    return (
        packed.groupBy(F.expr("cum_before div 20000").alias("group_id"))
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("size_chars").alias("total_chars"),
        )
    )


_PSI_DECILES = [i / 10.0 for i in range(1, 10)]


@register(
    "psi_feature_drift",
    oracle=f"""
        WITH ref AS (
            SELECT event_type,
                   list_transform(
                       quantile_cont(value, {_PSI_DECILES}),
                       c -> ROUND(c, 6)) AS cuts
            FROM events WHERE user_id % 2 = 0
            GROUP BY event_type
        ),
        bucketed AS (
            SELECT e.event_type,
                   e.user_id % 2 AS cohort,
                   1 + len(list_filter(r.cuts, c -> c < e.value)) AS bucket
            FROM events e JOIN ref r USING (event_type)
        ),
        shares AS (
            SELECT event_type, bucket,
                   CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
                   CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
            FROM bucketed GROUP BY event_type, bucket
        ),
        tot AS (
            SELECT event_type,
                   SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur
            FROM shares GROUP BY event_type
        )
        SELECT s.event_type, s.bucket, s.n_ref, s.n_cur,
               ROUND((s.n_cur + 0.5) / (t.t_cur + 5.0)
                     - (s.n_ref + 0.5) / (t.t_ref + 5.0), 6) AS share_delta,
               ROUND(((s.n_cur + 0.5) / (t.t_cur + 5.0)
                      - (s.n_ref + 0.5) / (t.t_ref + 5.0))
                     * ln(((s.n_cur + 0.5) / (t.t_cur + 5.0))
                          / ((s.n_ref + 0.5) / (t.t_ref + 5.0))), 9) AS psi_term
        FROM shares s JOIN tot t USING (event_type)
    """,
    doc=(
        "Population Stability Index between two user cohorts per event "
        "type -- the standard ML-monitoring drift score over a NUMERIC "
        "feature (complement of mixture_drift_kl's categorical form): "
        "decile cutoffs from the reference cohort, both cohorts bucketed "
        "map-side against the broadcast cutoffs, PSI terms "
        "(p_cur - p_ref) * ln(p_cur/p_ref) with +0.5 Laplace smoothing "
        "so empty buckets stay finite. Cutoffs are QUANTIZED to 6dp "
        "before any comparison -- exact-percentile interpolation is the "
        "one place Spark and DuckDB doubles could diverge by 1 ulp and "
        "flip a boundary row's bucket; quantizing makes the binning "
        "engine-exact. At 100 TB: approx_percentile cutoffs, same "
        "broadcast + map-side-bucket plan."
    ),
    tags=("sampling", "monitoring", "drift"),
)
def psi_feature_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ref = (
        ev.filter(F.col("user_id") % 2 == 0)
        .groupBy("event_type")
        .agg(
            F.transform(
                F.percentile("value", F.array(*[F.lit(p) for p in _PSI_DECILES])),
                lambda c: F.round(c, 6),
            ).alias("cuts")
        )
    )
    bucketed = ev.join(F.broadcast(ref), "event_type").select(
        "event_type",
        (F.col("user_id") % 2).alias("cohort"),
        (
            1 + F.size(F.filter("cuts", lambda c: c < F.col("value")))
        ).alias("bucket"),
    )
    shares = bucketed.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)).alias("n_cur"),
    )
    tot = shares.groupBy("event_type").agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p_ref = (F.col("n_ref") + 0.5) / (F.col("t_ref") + 5.0)
    p_cur = (F.col("n_cur") + 0.5) / (F.col("t_cur") + 5.0)
    return shares.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "bucket",
        "n_ref",
        "n_cur",
        F.round(p_cur - p_ref, 6).alias("share_delta"),
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 9).alias("psi_term"),
    )


@register(
    "ks_drift_two_sample",
    oracle="""
        WITH b AS (
            SELECT CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS g,
                   CAST(FLOOR(value * 10) AS BIGINT) AS bucket
            FROM events WHERE event_type IN ('click', 'purchase')
        ),
        counts AS (
            SELECT bucket,
                   SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS n_a,
                   SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS n_b
            FROM b GROUP BY bucket
        ),
        tot AS (
            SELECT CAST(SUM(n_a) AS BIGINT) AS t_a,
                   CAST(SUM(n_b) AS BIGINT) AS t_b,
                   CAST(COUNT(*) AS BIGINT) AS n_buckets
            FROM counts
        ),
        cdf AS (
            SELECT SUM(n_a) OVER (ORDER BY bucket) * 1.0 / t.t_a AS ca,
                   SUM(n_b) OVER (ORDER BY bucket) * 1.0 / t.t_b AS cb
            FROM counts CROSS JOIN tot t
        )
        SELECT t.t_a AS n_a, t.t_b AS n_b, t.n_buckets,
               ROUND(MAX(ABS(ca - cb)), 6) AS ks_stat,
               ROUND(1.358 * SQRT((t.t_a + t.t_b) * 1.0 / (t.t_a * t.t_b)), 6)
                   AS ks_critical_05,
               MAX(ABS(ca - cb)) >
                   1.358 * SQRT((t.t_a + t.t_b) * 1.0 / (t.t_a * t.t_b))
                   AS drifted
        FROM cdf CROSS JOIN tot t
        GROUP BY t.t_a, t.t_b, t.n_buckets
    """,
    doc=(
        "TWO-SAMPLE KOLMOGOROV-SMIRNOV drift test (quantized): the max "
        "CDF gap between the click and purchase value distributions, "
        "with the alpha=0.05 critical value (1.358*sqrt((na+nb)/(na*nb)))"
        " — the distribution-shape drift detector that complements "
        "psi_feature_drift's binned-share view (PSI misses shape shifts "
        "that preserve bin mass; KS is exactly the sup-norm shift). "
        "Values are quantized to 0.1 buckets with FLOOR (portable across "
        "engines, unlike banker's-vs-half-up rounding), making the CDF a "
        "cumulative sum over a BOUNDED bucket domain (<= 10*max_value "
        "buckets) instead of a global sort of raw rows — that is what "
        "makes the plan scale: two map-side conditional counts into "
        "|buckets| rows, one ordered window over those bounded rows "
        "(documented-bounded, like the Zipf ranks), one max. Exact KS "
        "on unquantized values would need a global sort of both samples; "
        "the quantized statistic differs by at most the bucket mass and "
        "is the standard production form."
    ),
    tags=("sampling", "drift", "statistics", "quality"),
)
def ks_drift_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    b = ev.select(
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("g"),
        F.floor(F.col("value") * 10).cast("bigint").alias("bucket"),
    )
    counts = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("n_b"),
    )
    tot = counts.agg(
        F.sum("n_a").cast("bigint").alias("t_a"),
        F.sum("n_b").cast("bigint").alias("t_b"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
    )
    # ordered window over the quantized bucket domain: bounded by
    # 10 * max(value) rows (fixture: <5k), NOT by |events| — boundedness
    # is the scale argument, same class as the Zipf rank window.
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cdf = counts.crossJoin(F.broadcast(tot)).select(
        "t_a",
        "t_b",
        "n_buckets",
        (F.sum("n_a").over(w) / F.col("t_a")).alias("ca"),
        (F.sum("n_b").over(w) / F.col("t_b")).alias("cb"),
    )
    crit = 1.358 * F.sqrt((F.col("t_a") + F.col("t_b")) / (F.col("t_a") * F.col("t_b")))
    return cdf.groupBy("t_a", "t_b", "n_buckets").agg(
        F.round(F.max(F.abs(F.col("ca") - F.col("cb"))), 6).alias("ks_stat"),
        F.round(F.max(crit), 6).alias("ks_critical_05"),
        (F.max(F.abs(F.col("ca") - F.col("cb"))) > F.max(crit)).alias("drifted"),
    ).select(
        F.col("t_a").alias("n_a"),
        F.col("t_b").alias("n_b"),
        "n_buckets",
        "ks_stat",
        "ks_critical_05",
        "drifted",
    )


@register(
    "train_test_time_split_audit",
    oracle="""
        WITH cut AS (
            SELECT quantile_cont(epoch_us(ts), 0.8) AS cutoff_us FROM events
        ),
        tagged AS (
            SELECT user_id,
                   CASE WHEN epoch_us(ts) <= c.cutoff_us THEN 0 ELSE 1 END AS side
            FROM events CROSS JOIN cut c
        ),
        sides AS (
            SELECT user_id,
                   MAX(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS in_train,
                   MAX(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS in_test,
                   SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS n_train_rows,
                   SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS n_test_rows
            FROM tagged GROUP BY user_id
        )
        SELECT CAST(SUM(n_train_rows) AS BIGINT) AS n_train,
               CAST(SUM(n_test_rows) AS BIGINT) AS n_test,
               CAST(SUM(in_train) AS BIGINT) AS n_users_train,
               CAST(SUM(in_test) AS BIGINT) AS n_users_test,
               CAST(SUM(in_train * in_test) AS BIGINT) AS n_users_both,
               ROUND(SUM(in_train * in_test) * 1.0 / SUM(in_test), 6)
                   AS test_user_leakage_rate
        FROM sides
    """,
    doc=(
        "TEMPORAL TRAIN/TEST SPLIT with GROUP-LEAKAGE AUDIT: split events "
        "at the 80th-percentile timestamp, then count users that appear "
        "on BOTH sides — the pre-training check that catches the classic "
        "evaluation bug (a model 'predicting' users it already saw). A "
        "high leakage rate says the split must be BY USER (hash split), "
        "not by time, for user-level tasks; deterministic_hash_sample is "
        "the companion operator that does exactly that. Plan: the cutoff "
        "is a 1-row exact-percentile aggregate broadcast back as a "
        "map-side predicate (membership is engine-stable: the cutoff "
        "interpolates strictly between two consecutive order statistics, "
        "so no event can sit between the two engines' float results); "
        "the audit is one hash aggregate keyed on user_id + a 1-row "
        "rollup. Two scans + one user-keyed shuffle at any scale."
    ),
    tags=("sampling", "split", "quality", "llm"),
)
def train_test_time_split_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cut = ev.agg(F.percentile(F.unix_micros("ts"), F.lit(0.8)).alias("cutoff_us"))
    tagged = ev.crossJoin(F.broadcast(cut)).select(
        "user_id",
        F.when(F.unix_micros("ts") <= F.col("cutoff_us"), 0).otherwise(1).alias("side"),
    )
    sides = tagged.groupBy("user_id").agg(
        F.max(F.when(F.col("side") == 0, 1).otherwise(0)).alias("in_train"),
        F.max(F.when(F.col("side") == 1, 1).otherwise(0)).alias("in_test"),
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("n_train_rows"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("n_test_rows"),
    )
    return sides.agg(
        F.sum("n_train_rows").cast("bigint").alias("n_train"),
        F.sum("n_test_rows").cast("bigint").alias("n_test"),
        F.sum("in_train").cast("bigint").alias("n_users_train"),
        F.sum("in_test").cast("bigint").alias("n_users_test"),
        F.sum(F.col("in_train") * F.col("in_test")).cast("bigint").alias("n_users_both"),
        F.round(
            F.sum(F.col("in_train") * F.col("in_test"))
            / F.sum("in_test"),
            6,
        ).alias("test_user_leakage_rate"),
    )


_TARGET_PARTITION_MB = 128


@register(
    "shuffle_partition_advisor",
    oracle=f"""
        WITH widths AS (
            SELECT 'documents' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(FLOOR(8 + 8 + AVG(length(text)) + AVG(length(lang))
                        + AVG(length(source))) AS BIGINT) AS est_row_bytes
            FROM documents
            UNION ALL
            SELECT 'embeddings', CAST(COUNT(*) AS BIGINT),
                   CAST(FLOOR(8 + 4 + 4 * AVG(len(embedding))) AS BIGINT)
            FROM embeddings
            UNION ALL
            SELECT 'events', CAST(COUNT(*) AS BIGINT),
                   CAST(FLOOR(8 + 8 + 8 + 8 + AVG(length(event_type))
                        + AVG(length(props))) AS BIGINT)
            FROM events
            UNION ALL
            SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
                   CAST(FLOOR(8 * 5 + 8 + AVG(length(l_returnflag))
                        + AVG(length(l_linestatus))) AS BIGINT)
            FROM lineitem
        )
        SELECT tbl, n_rows, est_row_bytes,
               CAST(n_rows * est_row_bytes AS BIGINT) AS est_total_bytes,
               GREATEST(CAST(CEIL(n_rows * est_row_bytes
                             / ({_TARGET_PARTITION_MB} * 1048576.0)) AS BIGINT),
                        1) AS recommended_partitions
        FROM widths
    """,
    doc=(
        "SHUFFLE-PARTITION ADVISOR: per-table row counts, measured "
        "average row width (typed-column widths + observed string/array "
        "lengths — not guesses), estimated total bytes, and the "
        f"partition count that lands ~{_TARGET_PARTITION_MB} MB per "
        "partition — the sizing pass run before setting spark.sql."
        "shuffle.partitions / files.maxPartitionBytes on a new dataset, "
        "and the quantitative backbone of the 'size partitions to fit "
        "executor memory' posture every operator docstring claims. Each "
        "branch is one aggregate over one table (count + avg lengths "
        "share a partial+final pair); the union is |tables| rows. The "
        "in-memory row estimate is deliberately the UNCOMPRESSED width "
        "— shuffle and executor memory see decoded rows, not parquet's "
        "encoded bytes."
    ),
    tags=("sampling", "layout", "diagnostics", "scale"),
)
def shuffle_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    target = _TARGET_PARTITION_MB * 1048576.0
    docs = load_table(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (
            8 + 8 + F.avg(F.length("text")) + F.avg(F.length("lang"))
            + F.avg(F.length("source"))
        )
        .cast("bigint")
        .alias("est_row_bytes"),
    ).select(F.lit("documents").alias("tbl"), "n_rows", "est_row_bytes")
    emb = load_table(spark, sf_dir, "embeddings").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (8 + 4 + 4 * F.avg(F.size("embedding"))).cast("bigint").alias(
            "est_row_bytes"
        ),
    ).select(F.lit("embeddings").alias("tbl"), "n_rows", "est_row_bytes")
    ev = load_table(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (
            8 + 8 + 8 + 8 + F.avg(F.length("event_type"))
            + F.avg(F.length("props"))
        )
        .cast("bigint")
        .alias("est_row_bytes"),
    ).select(F.lit("events").alias("tbl"), "n_rows", "est_row_bytes")
    li = load_table(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (
            8 * 5 + 8 + F.avg(F.length("l_returnflag"))
            + F.avg(F.length("l_linestatus"))
        )
        .cast("bigint")
        .alias("est_row_bytes"),
    ).select(F.lit("lineitem").alias("tbl"), "n_rows", "est_row_bytes")
    u = docs.unionAll(emb).unionAll(ev).unionAll(li)
    return u.select(
        "tbl",
        "n_rows",
        "est_row_bytes",
        (F.col("n_rows") * F.col("est_row_bytes")).cast("bigint").alias(
            "est_total_bytes"
        ),
        F.greatest(
            F.ceil(F.col("n_rows") * F.col("est_row_bytes") / F.lit(target)).cast(
                "bigint"
            ),
            F.lit(1).cast("bigint"),
        ).alias("recommended_partitions"),
    )


# --- training-efficiency layout: length-bucketed batching -------------------

_LB_BATCH = 32  # sequences per batch (a typical per-device micro-batch)


@register(
    "length_bucketed_batches",
    oracle=f"""
        WITH lens AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(CEIL(LOG2(GREATEST(len(string_split(text, ' ')), 1)))
                        AS BIGINT) AS bucket
            FROM documents
        ),
        batched AS (
            SELECT bucket, n_tokens,
                   CAST((ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id)
                         - 1) // {_LB_BATCH} AS BIGINT) AS batch_id
            FROM lens
        )
        SELECT bucket, batch_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               MAX(n_tokens) AS max_len,
               CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
               ROUND(1.0 - SUM(n_tokens) * 1.0 / (COUNT(*) * MAX(n_tokens)), 6)
                   AS padding_waste
        FROM batched
        GROUP BY bucket, batch_id
    """,
    doc=(
        "LENGTH-BUCKETED BATCH PACKING audit: assign every document to a "
        "power-of-two token-length bucket, fill fixed-size batches of "
        f"{_LB_BATCH} in deterministic doc_id order within the bucket, "
        "and report each batch's padding waste (1 - sum_len / (n * "
        "max_len)) — the fraction of a padded training batch that is "
        "pad tokens. Length bucketing is the standard fix for the "
        "quadratic attention cost of padding mixed-length sequences to "
        "a batch max; this operator IS the measurement that justifies "
        "it (unbucketed waste is the bucket=global degenerate case). "
        "Plan: token counts and bucket ids are one codegen projection "
        "on the scan; the only exchange is the hash partition on "
        "bucket for the row_number window — within-bucket order is by "
        "doc_id, so the assignment is total-ordered and hash-stable. "
        "At 100 TB the bucket count stays ~log2(max_len) (~16), so the "
        "window parallelizes per bucket; for skewed buckets, range-"
        "partition on (bucket, doc_id) and compute batch_id from a "
        "per-partition offset join, same result."
    ),
    tags=("sampling", "llm", "layout", "window"),
)
def length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("bigint")
    lens = docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.ceil(F.log2(F.greatest(n_tokens, F.lit(1)))).cast("bigint").alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy("doc_id")
    batched = lens.select(
        "bucket",
        "n_tokens",
        ((F.row_number().over(w) - 1) / _LB_BATCH).cast("bigint").alias("batch_id"),
    )
    return batched.groupBy("bucket", "batch_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.max("n_tokens").alias("max_len"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.round(
            1.0 - F.sum("n_tokens") / (F.count(F.lit(1)) * F.max("n_tokens")), 6
        ).alias("padding_waste"),
    )


# --- deterministic stratified k-fold assignment -----------------------------

_KFOLD = 5
# Knuth's multiplicative constant: fold = ((doc_id mod 2^31) * A mod 2^32)
# mod k is a fixed public mixing step, identical integer arithmetic in
# both engines. The mod-2^31 pre-reduction keeps the product under
# 2^31 * A ~ 5.7e18 < 2^63-1 for ANY doc_id — without it, ids above
# ~3.5e9 (e.g. offset-keyed shards at 100 TB; caught by the 10x replica
# probe) overflow signed-64 multiplication, which ANSI Spark rejects.
_KFOLD_MULT = 2654435761
_KFOLD_PREMOD = 2147483648  # 2^31


@register(
    "stratified_kfold_assignment",
    oracle=f"""
        WITH folds AS (
            SELECT lang,
                   (((doc_id % {_KFOLD_PREMOD}) * {_KFOLD_MULT})
                    % 4294967296) % {_KFOLD} AS fold
            FROM documents
        ),
        per AS (
            SELECT lang, fold, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM folds GROUP BY lang, fold
        )
        SELECT lang, CAST(fold AS BIGINT) AS fold, n_docs,
               ROUND(n_docs * 1.0 / SUM(n_docs) OVER (PARTITION BY lang), 6)
                   AS fold_share,
               ROUND(MAX(n_docs) OVER (PARTITION BY lang) * 1.0
                     / MIN(n_docs) OVER (PARTITION BY lang), 6) AS imbalance
        FROM per
    """,
    doc=(
        f"DETERMINISTIC STRATIFIED {_KFOLD}-FOLD ASSIGNMENT audit: every "
        "document lands in a fold via fixed multiplicative hashing on "
        "doc_id (mod 2^31, Knuth constant, mod 2^32, mod k — pure "
        "overflow-safe integer "
        "arithmetic, so any engine recomputes the identical split: the "
        "property that makes cross-validation and train/holdout splits "
        "reproducible across reruns, engines, and years), and the "
        "output audits per-language fold balance: fold sizes, shares, "
        "and the max/min imbalance ratio per stratum. A skewed ratio "
        "flags id-space structure leaking into the split (sequential "
        "ids + bad constant), THE silent killer of offline eval "
        "validity. Plan: one codegen projection for the fold id, one "
        "hash aggregate on (lang, fold), and windows over the "
        "k-bounded per-stratum frames — nothing else moves; the "
        "assignment itself never shuffles and at 100 TB stays a "
        "zero-cost scan column any downstream query can recompute."
    ),
    tags=("sampling", "llm", "statistics"),
)
def stratified_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    fold = (
        (F.col("doc_id") % _KFOLD_PREMOD) * _KFOLD_MULT
    ) % F.lit(4294967296) % _KFOLD
    per = (
        docs.select("lang", fold.cast("bigint").alias("fold"))
        .groupBy("lang", "fold")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    w = Window.partitionBy("lang")
    return per.select(
        "lang",
        "fold",
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6).alias("fold_share"),
        F.round(
            F.max("n_docs").over(w).cast("double") / F.min("n_docs").over(w), 6
        ).alias("imbalance"),
    )


def _fold_of(col: str) -> "Column":
    """The stratified-kfold fold id as a pure column expression — shared
    by stratified_kfold_assignment and the leakage audit so both label
    identically (same premod-overflow guard, same multiplier)."""
    return (
        ((F.col(col) % _KFOLD_PREMOD) * _KFOLD_MULT) % F.lit(4294967296) % _KFOLD
    ).cast("bigint")


def _fold_sql(col: str) -> str:
    return f"((({col} % {_KFOLD_PREMOD}) * {_KFOLD_MULT}) % 4294967296) % {_KFOLD}"


def _leakage_oracle() -> str:
    from weather_stream_processor_spark.operators.dedup import _JACCARD_PAIRS_CTES

    return f"""
        WITH {_JACCARD_PAIRS_CTES},
        lab AS (
            SELECT LEAST({_fold_sql('doc_a')}, {_fold_sql('doc_b')}) AS fold_a,
                   GREATEST({_fold_sql('doc_a')}, {_fold_sql('doc_b')}) AS fold_b
            FROM pairs
        ),
        cells AS (
            SELECT fold_a, fold_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM lab GROUP BY fold_a, fold_b
        )
        SELECT fold_a, fold_b, n_pairs,
               CAST(fold_a <> fold_b AS INT) AS cross_fold,
               ROUND(n_pairs * 1.0 / SUM(n_pairs) OVER (), 6) AS pair_share
        FROM cells
    """


@register(
    "cv_fold_leakage_audit",
    oracle=_leakage_oracle(),
    doc=(
        "CROSS-VALIDATION FOLD-LEAKAGE AUDIT: near-duplicate pairs "
        "(exact word-3-gram Jaccard >= 0.8, the ngram_jaccard_pairs "
        "surface) labeled with the stratified-kfold fold of BOTH "
        "members — a pair straddling two folds is train/test "
        "contamination that inflates every CV metric (the Lee et al. "
        "leakage argument applied to split hygiene; eval-decontam ops "
        "catch train-vs-benchmark overlap, this catches train-vs-train "
        "split overlap). Output is the fold-pair matrix (unordered fold "
        "pair, pair count, cross_fold flag, share of all near-dup "
        "pairs). Plan: the fold label is PURE doc_id ARITHMETIC (the "
        "same premod/multiplier expression the kfold assignment uses), "
        "so labeling adds ZERO joins and zero shuffles on top of the "
        "banded near-dup join itself; the final aggregate is bounded by "
        "K^2 = 25 cells. At 100 TB the near-dup pair computation is the "
        "whole cost — swap in minhash_lsh_near_dup as the pair source "
        "and the audit plumbing is unchanged. The actionable fix for "
        "flagged mass: group-aware splitting (assign dedup_connected_"
        "components clusters to folds, not raw doc_ids)."
    ),
    tags=("sampling", "llm", "dedup", "audit"),
)
def cv_fold_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_stream_processor_spark.operators.dedup import ngram_jaccard_pairs

    from pyspark.sql.window import Window

    pairs = ngram_jaccard_pairs(spark, sf_dir)
    fa, fb = _fold_of("doc_a"), _fold_of("doc_b")
    lab = pairs.select(
        F.least(fa, fb).alias("fold_a"), F.greatest(fa, fb).alias("fold_b")
    )
    cells = lab.groupBy("fold_a", "fold_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    # the share denominator is a window over the ALREADY-grouped cells
    # (<= K^2 = 25 rows — the audited bounded-cardinality window class),
    # NOT a second aggregate over the pair source: Catalyst does not
    # dedupe common subtrees, so a count-then-crossJoin form would
    # execute the whole banded near-dup join TWICE (caught by the
    # join-count plan test)
    return cells.select(
        "fold_a",
        "fold_b",
        "n_pairs",
        (F.col("fold_a") != F.col("fold_b")).cast("int").alias("cross_fold"),
        F.round(
            F.col("n_pairs") / F.sum("n_pairs").over(Window.partitionBy()), 6
        ).alias("pair_share"),
    )


def _group_fold_oracle() -> str:
    from weather_stream_processor_spark.operators.dedup import _COMPONENTS_CTES

    return f"""
        WITH RECURSIVE {_COMPONENTS_CTES},
        gmap AS (
            SELECT d.doc_id,
                   COALESCE(c.component_id, d.doc_id) AS group_id
            FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
        ),
        fmap AS (
            SELECT doc_id, group_id, {_fold_sql('group_id')} AS fold FROM gmap
        ),
        x AS (
            SELECT LEAST(fa.fold, fb.fold) AS fold,
                   CAST(COUNT(*) AS BIGINT) AS cross_pairs
            FROM pairs p
            JOIN fmap fa ON p.doc_a = fa.doc_id
            JOIN fmap fb ON p.doc_b = fb.doc_id
            WHERE fa.fold <> fb.fold
            GROUP BY 1
        ),
        per AS (
            SELECT fold,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(COUNT(DISTINCT group_id) AS BIGINT) AS n_groups
            FROM fmap GROUP BY fold
        )
        SELECT per.fold, per.n_docs, per.n_groups,
               ROUND(per.n_docs * 1.0 / SUM(per.n_docs) OVER (), 6)
                   AS fold_share,
               COALESCE(x.cross_pairs, 0) AS cross_fold_pairs
        FROM per LEFT JOIN x USING (fold)
    """


@register(
    "group_aware_fold_assignment",
    oracle=_group_fold_oracle(),
    doc=(
        "GROUP-AWARE CV FOLD ASSIGNMENT — the FIX for what "
        "cv_fold_leakage_audit measures: fold membership is keyed on the "
        "near-dup CLUSTER id (connected-components canonical min-doc_id; "
        "singletons key on themselves), so every member of a duplicate "
        "cluster lands in the SAME fold by construction and cross-fold "
        "near-dup leakage is provably zero. The output certifies it "
        "in-band: per-fold doc/group counts and balance PLUS the "
        "cross_fold_pairs column, computed (not asserted) by labeling "
        "both ends of every near-dup pair — the hash-checked zero is "
        "the point of the operator. Plan: the CC labels (component-"
        "member-sized) broadcast-join into the doc list; the fold is "
        "pure arithmetic on the group id; the per-fold aggregate is "
        "K-bounded with the share as a window over <= K rows; the "
        "certificate pass re-labels the pair list via two doc-keyed "
        "joins of the (doc_id, fold) projection. At 100 TB the pair "
        "tier swaps to minhash exactly as in the audit; the assignment "
        "itself adds one broadcast join + a projection to the corpus "
        "scan — group-aware splitting costs nothing more than having "
        "run dedup, which the pipeline runs anyway."
    ),
    tags=("sampling", "llm", "dedup", "audit"),
)
def group_aware_fold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from weather_stream_processor_spark.operators.dedup import (
        dedup_connected_components,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    labels = dedup_connected_components(spark, sf_dir).select(
        F.col("doc_id").alias("c_doc_id"), "component_id"
    )
    fmap = (
        docs.join(F.broadcast(labels), docs.doc_id == F.col("c_doc_id"), "left")
        .select(
            "doc_id", F.coalesce("component_id", "doc_id").alias("group_id")
        )
        .select("doc_id", "group_id", _fold_of("group_id").alias("fold"))
    )
    pairs = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    fa = fmap.select(F.col("doc_id").alias("doc_a"), F.col("fold").alias("fold_a"))
    fb = fmap.select(F.col("doc_id").alias("doc_b"), F.col("fold").alias("fold_b"))
    cross = (
        pairs.join(fa, "doc_a")
        .join(fb, "doc_b")
        .filter(F.col("fold_a") != F.col("fold_b"))
        .groupBy(F.least("fold_a", "fold_b").alias("fold"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cross_pairs"))
    )
    per = fmap.groupBy("fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("group_id").cast("bigint").alias("n_groups"),
    )
    return (
        per.join(F.broadcast(cross), "fold", "left")
        .select(
            "fold",
            "n_docs",
            "n_groups",
            F.round(
                F.col("n_docs") / F.sum("n_docs").over(Window.partitionBy()), 6
            ).alias("fold_share"),
            F.coalesce("cross_pairs", F.lit(0).cast("bigint")).alias(
                "cross_fold_pairs"
            ),
        )
    )


@register(
    "wasserstein_drift_1d",
    oracle="""
        WITH b AS (
            SELECT CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS g,
                   CAST(FLOOR(value * 10) AS BIGINT) AS bucket
            FROM events WHERE event_type IN ('click', 'purchase')
        ),
        counts AS (
            SELECT bucket,
                   SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS n_a,
                   SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS n_b
            FROM b GROUP BY bucket
        ),
        cdf AS (
            SELECT bucket,
                   LEAD(bucket, 1, bucket) OVER (ORDER BY bucket) AS nxt,
                   SUM(n_a) OVER (ORDER BY bucket) * 1.0
                       / SUM(n_a) OVER () AS ca,
                   SUM(n_b) OVER (ORDER BY bucket) * 1.0
                       / SUM(n_b) OVER () AS cb,
                   CAST(SUM(n_a) OVER () AS BIGINT) AS t_a,
                   CAST(SUM(n_b) OVER () AS BIGINT) AS t_b,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n_buckets
            FROM counts
        )
        SELECT t_a AS n_a, t_b AS n_b, n_buckets,
               ROUND(SUM(ABS(ca - cb) * (nxt - bucket) * 0.1), 6)
                   AS w1_distance
        FROM cdf
        GROUP BY t_a, t_b, n_buckets
    """,
    doc=(
        "1-D WASSERSTEIN (earth-mover) drift distance between the click "
        "and purchase value distributions on the same 0.1-quantized grid "
        "as ks_drift_two_sample: W1 = integral of |CDF_a - CDF_b|, "
        "computed as the CDF-gap sum weighted by the REAL inter-bucket "
        "width (lead(bucket) - bucket, so runs of empty buckets between "
        "observed ones contribute their full constant-gap mass — the "
        "subtlety a naive per-observed-bucket sum silently drops). "
        "Completes the drift triptych: PSI sees bin-share shifts, KS "
        "sees the worst single point of CDF separation, W1 integrates "
        "HOW FAR mass moved — the only one of the three that "
        "distinguishes a small shift of everything from a large shift "
        "of a sliver, which is what a 'values now 2x larger' pipeline "
        "bug looks like. Plan identical to KS: two map-side conditional "
        "counts to the bounded bucket domain, one ordered window over "
        "those rows, one aggregate. CDF gaps difference exact bigint "
        "counts; 6-dp rounding happens once at the end."
    ),
    tags=("sampling", "drift", "statistics", "quality"),
)
def wasserstein_drift_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    b = ev.select(
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("g"),
        F.floor(F.col("value") * 10).cast("bigint").alias("bucket"),
    )
    counts = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("n_b"),
    )
    # bounded bucket-domain windows, same class as the KS statistic;
    # totals come from a whole-frame window over the SAME grid so events
    # is scanned exactly once (a separate agg would re-scan)
    w_run = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_lead = Window.orderBy("bucket")
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cdf = counts.select(
        "bucket",
        F.lead("bucket", 1, None).over(w_lead).alias("nxt_raw"),
        (
            F.sum("n_a").over(w_run) * 1.0 / F.sum("n_a").over(w_all)
        ).alias("ca"),
        (
            F.sum("n_b").over(w_run) * 1.0 / F.sum("n_b").over(w_all)
        ).alias("cb"),
        F.sum("n_a").over(w_all).cast("bigint").alias("t_a"),
        F.sum("n_b").over(w_all).cast("bigint").alias("t_b"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n_buckets"),
    ).select(
        "t_a",
        "t_b",
        "n_buckets",
        "bucket",
        F.coalesce("nxt_raw", F.col("bucket")).alias("nxt"),
        "ca",
        "cb",
    )
    return cdf.groupBy(
        F.col("t_a").alias("n_a"),
        F.col("t_b").alias("n_b"),
        "n_buckets",
    ).agg(
        F.round(
            F.sum(
                F.abs(F.col("ca") - F.col("cb"))
                * (F.col("nxt") - F.col("bucket"))
                * 0.1
            ),
            6,
        ).alias("w1_distance")
    )


_PRUNE_FILES = 64  # synthetic file count for the layout comparison
_PRUNE_LO = "1996-03-01 00:00:00"
_PRUNE_HI = "1996-03-31 23:59:59"


@register(
    "minmax_pruning_audit",
    oracle=f"""
        WITH rows_ AS (
            SELECT l_shipdate,
                   CAST((((l_orderkey % {_MOD}) * {_KNUTH}) >> 16)
                        % {_PRUNE_FILES} AS BIGINT) AS hash_file,
                   CAST(date_part('year', l_shipdate) * 12
                        + date_part('month', l_shipdate) AS BIGINT)
                       AS date_file
            FROM lineitem
        ),
        layouts AS (
            SELECT 'hash_orderkey' AS layout, hash_file AS file_id,
                   l_shipdate FROM rows_
            UNION ALL
            SELECT 'cluster_shipdate' AS layout, date_file AS file_id,
                   l_shipdate FROM rows_
        ),
        files AS (
            SELECT layout, file_id,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   MIN(l_shipdate) AS f_min, MAX(l_shipdate) AS f_max
            FROM layouts GROUP BY layout, file_id
        )
        SELECT layout,
               CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(SUM(CASE WHEN f_max < TIMESTAMP '{_PRUNE_LO}'
                              OR f_min > TIMESTAMP '{_PRUNE_HI}'
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned,
               ROUND(SUM(CASE WHEN f_max < TIMESTAMP '{_PRUNE_LO}'
                               OR f_min > TIMESTAMP '{_PRUNE_HI}'
                              THEN 0 ELSE n_rows END) * 1.0
                     / SUM(n_rows), 6) AS scan_frac
        FROM files
        GROUP BY layout
    """,
    doc=(
        "MIN-MAX PRUNING AUDIT — the data-layout lesson as one "
        f"measured table: lineitem is assigned to {_PRUNE_FILES} "
        "synthetic files two ways (hash of orderkey — the layout you "
        "get by default — vs clustered by shipdate month), per-file "
        "min/max zone maps are computed, and a one-month probe "
        "predicate is tested against them. The hash layout prunes ~0 "
        "files (every file spans the full date range, scan_frac ~1.0); "
        "the clustered layout prunes everything but the probed month "
        "(scan_frac ~= month share) — the quantified argument for "
        "sort/cluster-on-write that zorder_cell_stats makes in 2-D, "
        "here in the 1-D form every lakehouse zone-map implements. "
        "Plan: one scan, one (layout, file) hash aggregate (2 x "
        f"{_PRUNE_FILES}-row output), one rollup; the probe evaluates "
        "against FILE STATS, never rows — which is the entire point: "
        "at 100 TB the audit costs one pass, and the layout decision "
        "it informs saves every future scan."
    ),
    tags=("sampling", "layout", "scale", "profiling"),
)
def minmax_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rows_ = li.select(
        "l_shipdate",
        (
            F.shiftright((F.col("l_orderkey") % _MOD) * F.lit(_KNUTH), 16)
            % _PRUNE_FILES
        )
        .cast("bigint")
        .alias("hash_file"),
        (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
        .cast("bigint")
        .alias("date_file"),
    )
    # one scan: each row fans out to its two layout assignments via an
    # exploded 2-element array (a unionAll of two selects would scan
    # lineitem twice — Catalyst does not dedupe the shared subtree)
    layouts = rows_.select(
        "l_shipdate",
        F.explode(
            F.array(
                F.struct(
                    F.lit("hash_orderkey").alias("layout"),
                    F.col("hash_file").alias("file_id"),
                ),
                F.struct(
                    F.lit("cluster_shipdate").alias("layout"),
                    F.col("date_file").alias("file_id"),
                ),
            )
        ).alias("lf"),
    ).select(
        F.col("lf.layout").alias("layout"),
        F.col("lf.file_id").alias("file_id"),
        "l_shipdate",
    )
    files = layouts.groupBy("layout", "file_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("l_shipdate").alias("f_min"),
        F.max("l_shipdate").alias("f_max"),
    )
    pruned = (F.col("f_max") < F.lit(_PRUNE_LO).cast("timestamp")) | (
        F.col("f_min") > F.lit(_PRUNE_HI).cast("timestamp")
    )
    return files.groupBy("layout").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum(F.when(pruned, 1).otherwise(0)).cast("bigint").alias("n_pruned"),
        F.round(
            F.sum(F.when(pruned, 0).otherwise(F.col("n_rows")))
            * 1.0
            / F.sum("n_rows"),
            6,
        ).alias("scan_frac"),
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U rank test (round-5j): the rank-based two-sample companion
# to KS/PSI/Wasserstein on the same quantized bucket grid.
# ---------------------------------------------------------------------------

# Abramowitz-Stegun 26.2.17 normal-tail polynomial: both engines evaluate
# the IDENTICAL literal expression, so the p-value is bit-deterministic.
_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_AS_P = 0.2316419


def _normal_sf_sql(z: str) -> str:
    t = f"(1.0 / (1.0 + {_AS_P} * {z}))"
    poly = (
        f"({t} * ({_AS_B[0]} + {t} * ({_AS_B[1]} + {t} * ({_AS_B[2]}"
        f" + {t} * ({_AS_B[3]} + {t} * {_AS_B[4]})))))"
    )
    return f"(exp(-({z}) * ({z}) / 2.0) / sqrt(2.0 * pi()) * {poly})"


@register(
    "mann_whitney_u_test",
    oracle=f"""
        WITH b AS (
            SELECT CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS g,
                   CAST(FLOOR(value * 10) AS BIGINT) AS bucket
            FROM events WHERE event_type IN ('click', 'purchase')
        ),
        counts AS (
            SELECT bucket,
                   CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                   CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
            FROM b GROUP BY bucket
        ),
        run AS (
            SELECT n_a, n_b,
                   CAST(COALESCE(SUM(n_b) OVER (
                       ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS b_below,
                   CAST(SUM(n_a) OVER () AS BIGINT) AS t_a,
                   CAST(SUM(n_b) OVER () AS BIGINT) AS t_b,
                   CAST(SUM((n_a + n_b) * (n_a + n_b) * (n_a + n_b)
                            - (n_a + n_b)) OVER () AS BIGINT) AS tie_term
            FROM counts
        ),
        stat AS (
            SELECT t_a AS n_a, t_b AS n_b,
                   SUM(n_a * (b_below + 0.5 * n_b)) AS u_stat,
                   ANY_VALUE(tie_term) AS ties,
                   t_a + t_b AS n
            FROM run GROUP BY t_a, t_b
        ),
        z AS (
            SELECT n_a, n_b, u_stat,
                   (u_stat - n_a * n_b / 2.0)
                   / sqrt(n_a * 1.0 * n_b / 12.0
                          * ((n + 1) - ties * 1.0 / (n * (n - 1)))) AS z
            FROM stat
        )
        SELECT n_a, n_b,
               ROUND(u_stat, 6) AS u_stat,
               ROUND(2.0 * u_stat / (n_a * 1.0 * n_b) - 1.0, 6)
                   AS rank_biserial,
               ROUND(z, 6) AS z_score,
               ROUND(2.0 * {_normal_sf_sql("abs(z)")}, 6) AS p_value
        FROM z
    """,
    doc=(
        "MANN-WHITNEY U rank test between the click and purchase value "
        "distributions on the same FLOOR(value*10) bucket grid as "
        "ks_drift_two_sample: U from the mid-rank identity (sum over "
        "the bucket grid of n_a * (b-below + half the ties at the "
        "bucket)), the tie-corrected normal approximation z, the "
        "two-sided p via the Abramowitz-Stegun 26.2.17 tail polynomial "
        "(a literal expression both engines evaluate identically — "
        "neither ships erf), and the rank-biserial effect size 2U/"
        "(n_a*n_b)-1. Completes the drift suite: PSI (bin shares), KS "
        "(CDF sup gap), W1 (CDF integral), chi-square (categorical), "
        "and now the RANK test that detects location shift with no "
        "distributional assumptions. Plan identical in shape to the KS "
        "twin: two conditional counts to the bounded bucket grid, "
        "ordered windows over that grid only; U / the tie term / both "
        "sample sizes are exact integer arithmetic, so z and p derive "
        "from bit-identical doubles."
    ),
    tags=("sampling", "drift", "statistics", "quality"),
)
def mann_whitney_u_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    b = ev.select(
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("g"),
        F.floor(F.col("value") * 10).cast("bigint").alias("bucket"),
    )
    counts = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
    )
    w_below = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = F.col("n_a") + F.col("n_b")
    run = counts.select(
        "n_a",
        "n_b",
        F.coalesce(F.sum("n_b").over(w_below), F.lit(0)).cast("bigint").alias(
            "b_below"
        ),
        F.sum("n_a").over(w_all).cast("bigint").alias("t_a"),
        F.sum("n_b").over(w_all).cast("bigint").alias("t_b"),
        F.sum(t * t * t - t).over(w_all).cast("bigint").alias("tie_term"),
    )
    stat = run.groupBy("t_a", "t_b").agg(
        F.sum(F.col("n_a") * (F.col("b_below") + 0.5 * F.col("n_b"))).alias(
            "u_stat"
        ),
        F.any_value("tie_term").alias("ties"),
    )
    n = F.col("t_a") + F.col("t_b")
    z = (F.col("u_stat") - F.col("t_a") * F.col("t_b") / F.lit(2.0)) / F.sqrt(
        F.col("t_a")
        * F.lit(1.0)
        * F.col("t_b")
        / F.lit(12.0)
        * ((n + 1) - F.col("ties") * F.lit(1.0) / (n * (n - 1)))
    )
    az = F.abs(z)
    tt = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_P) * az)
    poly = tt * (
        F.lit(_AS_B[0])
        + tt
        * (
            F.lit(_AS_B[1])
            + tt * (F.lit(_AS_B[2]) + tt * (F.lit(_AS_B[3]) + tt * F.lit(_AS_B[4])))
        )
    )
    sf = F.exp(-az * az / F.lit(2.0)) / F.sqrt(F.lit(2.0) * F.lit(math.pi)) * poly
    return stat.select(
        F.col("t_a").alias("n_a"),
        F.col("t_b").alias("n_b"),
        F.round(F.col("u_stat"), 6).alias("u_stat"),
        F.round(
            F.lit(2.0) * F.col("u_stat") / (F.col("t_a") * F.lit(1.0) * F.col("t_b"))
            - F.lit(1.0),
            6,
        ).alias("rank_biserial"),
        F.round(z, 6).alias("z_score"),
        F.round(F.lit(2.0) * sf, 6).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# Kruskal-Wallis H: the K-SAMPLE generalization of Mann-Whitney.
# ---------------------------------------------------------------------------


def _normal_sf_signed_sql(z: str) -> str:
    # A&S 26.2.17 is stated for z >= 0; extend to the whole line by the
    # symmetry sf(z) = 1 - sf(-z) so both engines evaluate ONE identical
    # branch expression for any sign of z.
    return (
        f"(CASE WHEN ({z}) >= 0 THEN {_normal_sf_sql(f'({z})')} "
        f"ELSE 1.0 - {_normal_sf_sql(f'(-({z}))')} END)"
    )


@register(
    "kruskal_wallis_h",
    oracle=f"""
        WITH b AS (
            SELECT event_type AS grp,
                   CAST(floor(value * 10) AS BIGINT) AS bucket
            FROM events
        ),
        cnt AS (
            SELECT bucket, grp, CAST(COUNT(*) AS BIGINT) AS n
            FROM b GROUP BY bucket, grp
        ),
        tb AS (
            SELECT bucket, CAST(SUM(n) AS BIGINT) AS t FROM cnt GROUP BY bucket
        ),
        run AS (
            SELECT bucket, t,
                   CAST(COALESCE(SUM(t) OVER (ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS below
            FROM tb
        ),
        grps AS (
            SELECT cnt.grp,
                   CAST(SUM(cnt.n) AS BIGINT) AS n_g,
                   CAST(SUM(cnt.n * (2 * run.below + run.t + 1))
                        AS BIGINT) AS rank_sum2
            FROM cnt JOIN run USING (bucket)
            GROUP BY cnt.grp
        ),
        tot AS (
            SELECT CAST(SUM(t) AS BIGINT) AS n_total,
                   CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term,
                   (SELECT COUNT(*) FROM grps) AS k
            FROM tb
        ),
        h AS (
            SELECT (SELECT 3.0 / (n_total * (n_total + 1.0))
                           * SUM(rank_sum2 * 1.0 * rank_sum2 / n_g)
                    FROM grps)
                   - 3.0 * (n_total + 1) AS h_raw,
                   1.0 - tie_term * 1.0 / (n_total * 1.0 * n_total * n_total
                                           - n_total) AS c_ties,
                   k * 1.0 - 1.0 AS df,
                   n_total, k
            FROM tot
        ),
        wh AS (
            SELECT grp, n_g, rank_sum2, n_total, k,
                   h_raw, h_raw / c_ties AS h_adj, df,
                   (pow((h_raw / c_ties) / df, 1.0 / 3.0)
                    - (1.0 - 2.0 / (9.0 * df)))
                   / sqrt(2.0 / (9.0 * df)) AS z_wh
            FROM grps CROSS JOIN h
        )
        SELECT grp, n_g, rank_sum2, n_total, CAST(k AS BIGINT) AS k,
               ROUND(h_raw, 6) AS h_raw,
               ROUND(h_adj, 6) AS h_adj,
               ROUND({_normal_sf_signed_sql("z_wh")}, 6) AS p_wilson_hilferty
        FROM wh
    """,
    doc=(
        "KRUSKAL-WALLIS H: the K-SAMPLE rank test the drift suite "
        "lacked — Mann-Whitney compares TWO event-value distributions; "
        "this ranks ALL five event types at once and asks whether any "
        "one of them is location-shifted (the omnibus screen run before "
        "pairwise tests, exactly as ANOVA precedes t-tests). Same "
        "FLOOR(value*10) bucket grid as the KS/MW twins; mid-ranks come "
        "from the grid identity 2*rank = 2*below + t + 1, so every "
        "per-group rank sum is an EXACT integer when lifted by 2 "
        "(rank_sum2) — the hashed per-group columns carry no float "
        "arithmetic at all. H = 3/(N(N+1)) * sum(rank_sum2^2/n_g) "
        "- 3(N+1) (the x2 lift folds the classic 12 to 3), tie-corrected "
        "by C = 1 - sum(t^3-t)/(N^3-N), and the p-value uses the "
        "WILSON-HILFERTY cube-root chi-square-to-normal map (works for "
        "any df, closed-form, both engines evaluate the identical "
        "literal expression) through the shared A&S tail polynomial "
        "extended to negative z by sf(z) = 1-sf(-z). Plan: one "
        "conditional-count aggregate to the bounded value-bucket grid "
        "(<=4901 buckets at any corpus size — value is a bounded "
        "metric), one ordered window over THAT GRID ONLY, one 5-row "
        "group rollup; the corpus never meets a window, identical shape "
        "to the MW/KS plan at 100 TB."
    ),
    tags=("sampling", "drift", "statistics", "quality"),
)
def kruskal_wallis_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 10).cast("bigint").alias("bucket"),
    )
    cnt = b.groupBy("bucket", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tb = cnt.groupBy("bucket").agg(F.sum("n").cast("bigint").alias("t"))
    w_below = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    run = tb.select(
        "bucket",
        "t",
        F.coalesce(F.sum("t").over(w_below), F.lit(0))
        .cast("bigint")
        .alias("below"),
    )
    grps = (
        cnt.join(run, "bucket")
        .groupBy("grp")
        .agg(
            F.sum("n").cast("bigint").alias("n_g"),
            F.sum(
                F.col("n") * (2 * F.col("below") + F.col("t") + 1)
            )
            .cast("bigint")
            .alias("rank_sum2"),
        )
    )
    tot = tb.agg(
        F.sum("t").cast("bigint").alias("n_total"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie_term"),
    )
    kdf = grps.agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    # tot and kdf are 1-row aggregates: the cross joins broadcast them.
    g = grps.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(kdf))
    n_tot = F.col("n_total").cast("double")
    h_raw_df = g.groupBy(
        "n_total", "tie_term", "k"
    ).agg(
        (
            F.lit(3.0)
            / (n_tot * (n_tot + 1))
            * F.sum(
                F.col("rank_sum2")
                * F.lit(1.0)
                * F.col("rank_sum2")
                / F.col("n_g")
            )
            - F.lit(3.0) * (n_tot + 1)
        ).alias("h_raw")
    )
    g = g.join(F.broadcast(h_raw_df), ["n_total", "tie_term", "k"])
    c_ties = F.lit(1.0) - F.col("tie_term") * F.lit(1.0) / (
        n_tot * n_tot * n_tot - n_tot
    )
    df_ = F.col("k") * F.lit(1.0) - F.lit(1.0)
    h_adj = F.col("h_raw") / c_ties
    z_wh = (
        F.pow(h_adj / df_, F.lit(1.0) / F.lit(3.0))
        - (F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * df_))
    ) / F.sqrt(F.lit(2.0) / (F.lit(9.0) * df_))

    def _sf_pos(az):
        tt = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_P) * az)
        poly = tt * (
            F.lit(_AS_B[0])
            + tt
            * (
                F.lit(_AS_B[1])
                + tt
                * (F.lit(_AS_B[2]) + tt * (F.lit(_AS_B[3]) + tt * F.lit(_AS_B[4])))
            )
        )
        return (
            F.exp(-az * az / F.lit(2.0)) / F.sqrt(F.lit(2.0) * F.lit(math.pi)) * poly
        )

    p_wh = F.when(z_wh >= 0, _sf_pos(z_wh)).otherwise(
        F.lit(1.0) - _sf_pos(-z_wh)
    )
    return g.select(
        "grp",
        "n_g",
        "rank_sum2",
        "n_total",
        "k",
        F.round(F.col("h_raw"), 6).alias("h_raw"),
        F.round(h_adj, 6).alias("h_adj"),
        F.round(p_wh, 6).alias("p_wilson_hilferty"),
    )


# ---------------------------------------------------------------------------
# Welch's one-way ANOVA: the parametric k-sample twin of Kruskal-Wallis.
# ---------------------------------------------------------------------------


@register(
    "welch_anova_sources",
    oracle="""
        WITH g AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_g,
                   CAST(SUM(n_chars) AS BIGINT) AS s1,
                   CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
            FROM documents GROUP BY source
        ),
        w AS (
            SELECT source, n_g, s1, s2,
                   s1 * 1.0 / n_g AS m,
                   (n_g * 1.0 * s2 - s1 * 1.0 * s1)
                       / (n_g * 1.0 * (n_g - 1.0)) AS v
            FROM g
        ),
        ww AS (SELECT *, n_g / v AS wt FROM w),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   SUM(wt) AS w_sum,
                   SUM(wt * m) AS wm_sum
            FROM ww
        ),
        parts AS (
            SELECT k, w_sum,
                   SUM(wt * (m - wm_sum / w_sum)
                          * (m - wm_sum / w_sum)) AS a_num,
                   SUM((1.0 - wt / w_sum) * (1.0 - wt / w_sum)
                       / (n_g - 1.0)) AS lam
            FROM ww CROSS JOIN tot
            GROUP BY k, w_sum
        ),
        f AS (
            SELECT k,
                   (a_num / (k - 1.0))
                   / (1.0 + 2.0 * (k - 2.0) / (k * 1.0 * k - 1.0) * lam)
                       AS f_stat,
                   (k * 1.0 * k - 1.0) / (3.0 * lam) AS df2
            FROM parts
        )
        SELECT g.source, g.n_g, g.s1 AS sum_chars, g.s2 AS sumsq_chars,
               CAST(f.k AS BIGINT) AS k,
               ROUND(f.f_stat, 6) AS welch_f,
               CAST(f.k - 1 AS BIGINT) AS df1,
               ROUND(f.df2, 6) AS df2
        FROM g CROSS JOIN f
    """,
    doc=(
        "WELCH'S ONE-WAY ANOVA of document length across sources — the "
        "PARAMETRIC k-sample location test beside the rank-based "
        "Kruskal-Wallis twin, in the heteroscedastic (Welch 1951) form "
        "because per-source length variances genuinely differ and "
        "classic ANOVA's pooled variance would be wrong exactly when "
        "the answer matters (deciding whether a source's length profile "
        "is shifted enough to need its own mixture weight). Every "
        "per-source sufficient statistic (n, sum, sum-of-squares of the "
        "BIGINT n_chars) is an EXACT integer in the hashed output; the "
        "Welch weights w_g = n_g/var_g, the weighted grand mean, the "
        "between-group numerator A/(k-1), the Satterthwaite-style "
        "denominator 1 + 2(k-2)/(k^2-1)*lambda and df2 = (k^2-1)/"
        "(3*lambda) are closed forms over those integers, mirrored "
        "literally in both engines and rounded once at the end. Plan: "
        "ONE map-side-combined aggregate corpus scan to |sources| rows, "
        "then two 1-row reductions over that 20-row table re-attached "
        "by broadcast cross join — at 100 TB the only corpus-sized "
        "stage is the first partial aggregate; everything after is "
        "metadata-sized."
    ),
    tags=("sampling", "statistics", "quality", "llm"),
)
def welch_anova_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("n_chars").cast("bigint").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("s2"),
    )
    m = F.col("s1") * F.lit(1.0) / F.col("n_g")
    v = (
        F.col("n_g") * F.lit(1.0) * F.col("s2")
        - F.col("s1") * F.lit(1.0) * F.col("s1")
    ) / (F.col("n_g") * F.lit(1.0) * (F.col("n_g") - F.lit(1.0)))
    ww = g.select("source", "n_g", "s1", "s2", m.alias("m"), (F.col("n_g") / v).alias("wt"))
    tot = ww.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("wt").alias("w_sum"),
        F.sum(F.col("wt") * F.col("m")).alias("wm_sum"),
    )
    j = ww.crossJoin(F.broadcast(tot))
    dev = F.col("m") - F.col("wm_sum") / F.col("w_sum")
    parts = j.groupBy("k", "w_sum").agg(
        F.sum(F.col("wt") * dev * dev).alias("a_num"),
        F.sum(
            (F.lit(1.0) - F.col("wt") / F.col("w_sum"))
            * (F.lit(1.0) - F.col("wt") / F.col("w_sum"))
            / (F.col("n_g") - F.lit(1.0))
        ).alias("lam"),
    )
    kd = F.col("k") * F.lit(1.0)
    f = parts.select(
        "k",
        (
            (F.col("a_num") / (kd - 1))
            / (
                F.lit(1.0)
                + F.lit(2.0) * (kd - 2) / (kd * kd - 1) * F.col("lam")
            )
        ).alias("f_stat"),
        ((kd * kd - 1) / (F.lit(3.0) * F.col("lam"))).alias("df2"),
    )
    return g.crossJoin(F.broadcast(f)).select(
        "source",
        "n_g",
        F.col("s1").alias("sum_chars"),
        F.col("s2").alias("sumsq_chars"),
        "k",
        F.round(F.col("f_stat"), 6).alias("welch_f"),
        (F.col("k") - 1).cast("bigint").alias("df1"),
        F.round(F.col("df2"), 6).alias("df2"),
    )


# ---------------------------------------------------------------------------
# Deterministic corpus shuffle (round-5m): reproducible training order.
# ---------------------------------------------------------------------------

_SHUF_SHARDS = 64
_SHUF_KNUTH = 2654435761
_SHUF_MOD = 2147483647


@register(
    "deterministic_corpus_shuffle",
    oracle=f"""
        WITH h AS (
            SELECT doc_id,
                   (((doc_id % {_SHUF_MOD}) * {_SHUF_KNUTH}) >> 16)
                       % {_SHUF_MOD} AS h
            FROM documents
        )
        SELECT doc_id, h,
               CAST(h % {_SHUF_SHARDS} AS BIGINT) AS shard,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY h % {_SHUF_SHARDS}
                   ORDER BY h, doc_id) AS BIGINT) AS pos
        FROM h
    """,
    doc=(
        "DETERMINISTIC CORPUS SHUFFLE: every document gets a "
        "REPRODUCIBLE pseudo-random training position — Knuth-hash the "
        f"id, shard = h % {_SHUF_SHARDS}, position = rank by (h, "
        "doc_id) within the shard — so two runs (or two engines: the "
        "oracle hash-checks the full permutation) produce the IDENTICAL "
        "data order, the property training reproducibility and "
        "mid-epoch resume both depend on and that rand()-based "
        "shuffles cannot give you. Plan: one projection plus a window "
        "partitioned BY SHARD — shard count scales with the corpus, so "
        "each partition sorts |corpus|/shards rows and the sort IS the "
        "deliverable (training shards are consumed in order; the write "
        "path is repartitionByRange(shard) + sortWithinPartitions, the "
        "same plan shape). Bijectivity (a true permutation, no "
        "collisions dropped) is pytest-gated."
    ),
    tags=("sampling", "llm", "curation"),
)
def deterministic_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    h = (
        F.shiftright((F.col("doc_id") % _SHUF_MOD) * F.lit(_SHUF_KNUTH), 16)
        % _SHUF_MOD
    )
    hashed = docs.select("doc_id", h.alias("h"))
    w = Window.partitionBy(F.col("h") % _SHUF_SHARDS).orderBy("h", "doc_id")
    return hashed.select(
        "doc_id",
        "h",
        (F.col("h") % _SHUF_SHARDS).cast("bigint").alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


# ---------------------------------------------------------------------------
# Round-5o: exact rank correlations on bounded grids — Spearman rho and
# Kendall tau-b between per-user activity and spend.
# ---------------------------------------------------------------------------

_RANK_Y_BUCKET = 1000  # cents -> $10 buckets (grid-bounding quantization,
# same convention as the KS/MWU value buckets)


def _rank_pairs_sql() -> str:
    return f"""
        per_user AS (
            SELECT user_id,
                   CAST(COUNT(*) AS BIGINT) AS x,
                   CAST(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                        // {_RANK_Y_BUCKET} AS BIGINT) AS y
            FROM events GROUP BY user_id
        )
    """


@register(
    "spearman_rank_correlation",
    oracle=f"""
        WITH {_rank_pairs_sql()},
        xg AS (
            SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(COALESCE(SUM(COUNT(*)) OVER (
                       ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS BIGINT) AS below
            FROM per_user GROUP BY x
        ),
        yg AS (
            SELECT y, CAST(COUNT(*) AS BIGINT) AS cnt,
                   CAST(COALESCE(SUM(COUNT(*)) OVER (
                       ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS BIGINT) AS below
            FROM per_user GROUP BY y
        ),
        ranked AS (
            SELECT p.user_id,
                   xg.below + (xg.cnt + 1) / 2.0 AS rx,
                   yg.below + (yg.cnt + 1) / 2.0 AS ry
            FROM per_user p
            JOIN xg USING (x) JOIN yg USING (y)
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(rx) AS sx, SUM(ry) AS sy,
                   SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy,
                   SUM(rx * ry) AS sxy
            FROM ranked
        )
        SELECT n,
               ROUND((sxy / n - (sx / n) * (sy / n))
                     / sqrt((sxx / n - (sx / n) * (sx / n))
                            * (syy / n - (sy / n) * (sy / n))), 6)
                   AS spearman_rho
        FROM mom
    """,
    doc=(
        "SPEARMAN RANK CORRELATION between per-user activity (event "
        "count) and spend (value, quantized to $10 buckets — the same "
        "grid-bounding convention as the KS/MWU tests): mid-ranks come "
        "from the DISTINCT-VALUE grids (below-count + (ties+1)/2), not "
        "from sorting users — two bounded-grid windows plus broadcast "
        "rank joins, then one exact moment aggregate; Pearson over "
        "mid-ranks IS Spearman with the textbook tie correction. Ranks "
        "are exact .5-multiples, so the moment sums accumulate exactly "
        "representable doubles and both engines derive identical "
        "moments (order-free) before the one rounded division. The "
        "monotone-association screen that corr_covar_lineitem's "
        "Pearson misses when the relation is nonlinear."
    ),
    tags=("sampling", "statistics", "quality"),
)
def spearman_rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("x"),
        F.floor(
            F.sum(F.round(F.col("value") * 100).cast("bigint")) / _RANK_Y_BUCKET
        )
        .cast("bigint")
        .alias("y"),
    )

    def grid(col: str) -> DataFrame:
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        g = per_user.groupBy(col).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        return g.select(
            col,
            "cnt",
            F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("bigint").alias("below"),
        )

    xg = grid("x").select("x", F.col("cnt").alias("xc"), F.col("below").alias("xb"))
    yg = grid("y").select("y", F.col("cnt").alias("yc"), F.col("below").alias("yb"))
    ranked = (
        per_user.join(F.broadcast(xg), "x")
        .join(F.broadcast(yg), "y")
        .select(
            (F.col("xb") + (F.col("xc") + 1) / F.lit(2.0)).alias("rx"),
            (F.col("yb") + (F.col("yc") + 1) / F.lit(2.0)).alias("ry"),
        )
    )
    mom = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    n = F.col("n")
    mx, my = F.col("sx") / n, F.col("sy") / n
    return mom.select(
        "n",
        F.round(
            (F.col("sxy") / n - mx * my)
            / F.sqrt(
                (F.col("sxx") / n - mx * mx) * (F.col("syy") / n - my * my)
            ),
            6,
        ).alias("spearman_rho"),
    )


@register(
    "kendall_tau_b",
    oracle=f"""
        WITH {_rank_pairs_sql()},
        cells AS (
            SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM per_user GROUP BY x, y
        ),
        pairs AS (
            SELECT CAST(SUM(CASE WHEN c2.x > c1.x AND c2.y > c1.y
                                 THEN c1.cnt * c2.cnt ELSE 0 END) AS BIGINT)
                       AS concordant,
                   CAST(SUM(CASE WHEN c2.x > c1.x AND c2.y < c1.y
                                 THEN c1.cnt * c2.cnt ELSE 0 END) AS BIGINT)
                       AS discordant
            FROM cells c1 CROSS JOIN cells c2
        ),
        marg AS (
            SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                   CAST(SUM(cnt * (cnt - 1) / 2) AS BIGINT) AS pair_ties_xy
            FROM cells
        ),
        tx AS (SELECT CAST(SUM(s * (s - 1) / 2) AS BIGINT) AS n1
               FROM (SELECT CAST(SUM(cnt) AS BIGINT) AS s
                     FROM cells GROUP BY x)),
        ty AS (SELECT CAST(SUM(s * (s - 1) / 2) AS BIGINT) AS n2
               FROM (SELECT CAST(SUM(cnt) AS BIGINT) AS s
                     FROM cells GROUP BY y))
        SELECT m.n, p.concordant, p.discordant,
               ROUND((p.concordant - p.discordant)
                     / sqrt((m.n * (m.n - 1) / 2.0 - t1.n1)
                            * (m.n * (m.n - 1) / 2.0 - t2.n2)), 6)
                   AS kendall_tau_b
        FROM pairs p CROSS JOIN marg m CROSS JOIN tx t1 CROSS JOIN ty t2
    """,
    doc=(
        "KENDALL TAU-B between the same per-user (activity, $10-bucket "
        "spend) pairs: concordant/discordant PAIR counts computed from "
        "the 2-D CONTINGENCY GRID — cell-pair products over the bounded "
        "(distinct-x x distinct-y) grid instead of the O(n^2) "
        "observation-pair sweep — with the tau-b tie denominator from "
        "the marginal tie counts; every quantity is an exact bigint "
        "until the final division, so the hash is exact. The grid "
        "self-join is |grid|^2, a constant governed by the bucket "
        "quantization, never by user count — the trick that makes an "
        "inherently O(n^2) statistic computable at 100 TB. Reported "
        "next to spearman_rho because tau's pair semantics react "
        "differently to heavy ties."
    ),
    tags=("sampling", "statistics", "quality"),
)
def kendall_tau_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("x"),
        F.floor(
            F.sum(F.round(F.col("value") * 100).cast("bigint")) / _RANK_Y_BUCKET
        )
        .cast("bigint")
        .alias("y"),
    )
    cells = per_user.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    from weather_stream_processor_spark.plans.caching import persisted_result

    def build(cells_c: DataFrame) -> DataFrame:
        c1 = cells_c.select(
            F.col("x").alias("x1"), F.col("y").alias("y1"), F.col("cnt").alias("n1c")
        )
        c2 = cells_c.select(
            F.col("x").alias("x2"), F.col("y").alias("y2"), F.col("cnt").alias("n2c")
        )
        pairs = c1.crossJoin(F.broadcast(c2)).agg(
            F.sum(
                F.when(
                    (F.col("x2") > F.col("x1")) & (F.col("y2") > F.col("y1")),
                    F.col("n1c") * F.col("n2c"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("concordant"),
            F.sum(
                F.when(
                    (F.col("x2") > F.col("x1")) & (F.col("y2") < F.col("y1")),
                    F.col("n1c") * F.col("n2c"),
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("discordant"),
        )
        marg = cells_c.agg(F.sum("cnt").cast("bigint").alias("n"))
        tx = (
            cells_c.groupBy("x")
            .agg(F.sum("cnt").cast("bigint").alias("s"))
            .agg(F.sum(F.col("s") * (F.col("s") - 1) / 2).cast("bigint").alias("n1"))
        )
        ty = (
            cells_c.groupBy("y")
            .agg(F.sum("cnt").cast("bigint").alias("s"))
            .agg(F.sum(F.col("s") * (F.col("s") - 1) / 2).cast("bigint").alias("n2"))
        )
        n0 = F.col("n") * (F.col("n") - 1) / F.lit(2.0)
        return (
            pairs.crossJoin(marg)
            .crossJoin(tx)
            .crossJoin(ty)  # all 1-row frames
            .select(
                "n",
                "concordant",
                "discordant",
                F.round(
                    (F.col("concordant") - F.col("discordant"))
                    / F.sqrt((n0 - F.col("n1")) * (n0 - F.col("n2"))),
                    6,
                ).alias("kendall_tau_b"),
            )
        )

    return persisted_result(cells, build)


# ---------------------------------------------------------------------------
# Horvitz-Thompson estimation (round-5s): design-unbiased totals from the
# deterministic stratified sample.
# ---------------------------------------------------------------------------

# per-stratum sampling fractions (deterministic Knuth-hash inclusion):
# priority strata get deeper samples — the unequal-probability design HT
# exists to correct for
_HT_FRACS = {"1": 0.5, "2": 0.4, "3": 0.3, "4": 0.2, "5": 0.1}
_HT_MOD_BASE = 1000


def _ht_d_sql() -> str:
    # d = pi*10 as an exact small integer (pi are exact tenths by design)
    return " ".join(
        f"WHEN substr(o_orderpriority, 1, 1) = '{k}' THEN {round(v * 10)}"
        for k, v in _HT_FRACS.items()
    )


@register(
    "horvitz_thompson_total",
    oracle=f"""
        WITH pop AS (
            SELECT o_orderkey,
                   substr(o_orderpriority, 1, 1) AS stratum,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
                   CASE {_ht_d_sql()} ELSE 1 END AS d,
                   ((((o_orderkey % {{mod}}) * {{kn}}) >> 16)
                    % {_HT_MOD_BASE}) AS h
            FROM orders
        ),
        est AS (
            SELECT stratum, d,
                   CAST(COUNT(*) AS BIGINT) AS n_sampled,
                   CAST(SUM(cents) AS BIGINT) AS s_cents
            FROM pop WHERE h < d * 100 GROUP BY stratum, d
        ),
        truth AS (
            SELECT stratum,
                   CAST(COUNT(*) AS BIGINT) AS true_count,
                   CAST(SUM(cents) AS BIGINT) AS t_cents
            FROM pop GROUP BY stratum
        )
        SELECT e.stratum,
               CAST(e.d * 10 AS BIGINT) AS pi_pct,
               e.n_sampled,
               CAST((e.n_sampled * 10) // e.d AS BIGINT) AS ht_count_q,
               CAST((e.n_sampled * 10) % e.d AS BIGINT) AS ht_count_r,
               t.true_count,
               CAST((e.s_cents * 10) // e.d AS BIGINT) AS ht_total_cents_q,
               CAST((e.s_cents * 10) % e.d AS BIGINT) AS ht_total_cents_r,
               t.t_cents AS true_total_cents,
               CAST(ABS(e.s_cents * 10 - t.t_cents * e.d) AS BIGINT)
                   AS rel_num,
               CAST(t.t_cents * e.d AS BIGINT) AS rel_den
        FROM est e JOIN truth t USING (stratum)
    """.replace("{mod}", "2147483647").replace("{kn}", "2654435761"),
    doc=(
        "HORVITZ-THOMPSON ESTIMATION from an unequal-probability "
        "stratified sample: order priorities sample at 50/40/30/20/10% "
        "via the deterministic Knuth-hash inclusion rule (h < d*100 on "
        "the 0-999 hash, d = pi*10 — pure integers, so both engines "
        "draw the identical sample), and the HT estimator sum(y_i/pi_i) "
        "recovers design-unbiased stratum totals and counts — the "
        "correction every downstream consumer of a non-uniform sample "
        "must apply (averaging the raw sample would overweight the "
        "deeply-sampled strata ~5x). INTEGER-EXACT output (r8 ULP "
        "audit: the former ROUND(sum(cents/pi)/100, 2) sat exactly on "
        "a half-grid tie): pi is CONSTANT within a stratum, so "
        "sum(y/pi) = sum(cents)*10/d — emitted as the exact Euclidean "
        "pair (q, r), likewise ht_count; the relative error ships as "
        "the exact integer fraction rel_num/rel_den = "
        "|S*10 - T*d| / (T*d). No float enters the hashed result. The "
        "truth columns ride along because the fixture still has the "
        "full population — exactly how a sampling design is validated "
        "before the full data stops being kept. Plan: one projection, "
        "two hash aggregates on the bounded stratum domain, one "
        "stratum-keyed join."
    ),
    tags=("sampling", "statistics", "llm"),
)
def horvitz_thompson_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    stratum = F.substring("o_orderpriority", 1, 1)
    d = F.lit(1)
    for k, v in _HT_FRACS.items():
        d = F.when(stratum == k, F.lit(round(v * 10))).otherwise(d)
    h = (
        F.shiftright((F.col("o_orderkey") % 2147483647) * F.lit(2654435761), 16)
        % _HT_MOD_BASE
    )
    pop = o.select(
        stratum.alias("stratum"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        d.alias("d"),
        h.alias("h"),
    )
    from weather_stream_processor_spark.plans.caching import persisted_result

    def build(pop_c: DataFrame) -> DataFrame:
        est = (
            pop_c.filter(F.col("h") < F.col("d") * 100)
            .groupBy("stratum", "d")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
                F.sum("cents").cast("bigint").alias("s_cents"),
            )
        )
        truth = pop_c.groupBy("stratum").agg(
            F.count(F.lit(1)).cast("bigint").alias("true_count"),
            F.sum("cents").cast("bigint").alias("t_cents"),
        )
        return (
            est.join(truth, "stratum")
            .select(
                "stratum",
                (F.col("d") * 10).cast("bigint").alias("pi_pct"),
                "n_sampled",
                F.expr("(n_sampled * 10) div d").cast("bigint").alias("ht_count_q"),
                ((F.col("n_sampled") * 10) % F.col("d"))
                .cast("bigint")
                .alias("ht_count_r"),
                "true_count",
                F.expr("(s_cents * 10) div d").cast("bigint").alias("ht_total_cents_q"),
                ((F.col("s_cents") * 10) % F.col("d"))
                .cast("bigint")
                .alias("ht_total_cents_r"),
                F.col("t_cents").alias("true_total_cents"),
                F.abs(F.col("s_cents") * 10 - F.col("t_cents") * F.col("d"))
                .cast("bigint")
                .alias("rel_num"),
                (F.col("t_cents") * F.col("d")).cast("bigint").alias("rel_den"),
            )
        )

    return persisted_result(pop, build)


# ---------------------------------------------------------------------------
# Brown-Forsythe: k-sample EQUALITY-OF-SPREAD test (location tests above
# assume it; this checks it).
# ---------------------------------------------------------------------------


@register(
    "brown_forsythe_spread_test",
    oracle="""
        WITH c AS (
            SELECT event_type AS grp,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cent
            FROM events
        ),
        cnt AS (
            SELECT grp, cent, CAST(COUNT(*) AS BIGINT) AS n
            FROM c GROUP BY grp, cent
        ),
        ng AS (SELECT grp, CAST(SUM(n) AS BIGINT) AS n_g FROM cnt GROUP BY grp),
        cum AS (
            SELECT grp, cent, n,
                   CAST(SUM(n) OVER (PARTITION BY grp ORDER BY cent)
                        AS BIGINT) AS cum
            FROM cnt
        ),
        med AS (
            SELECT cum.grp, CAST(MIN(cent) AS BIGINT) AS med_cents
            FROM cum JOIN ng ON cum.grp = ng.grp
            WHERE 2 * cum.cum >= ng.n_g
            GROUP BY cum.grp
        ),
        z AS (
            SELECT c.grp, abs(c.cent - med.med_cents) AS z
            FROM c JOIN med ON c.grp = med.grp
        ),
        g AS (
            SELECT grp,
                   CAST(COUNT(*) AS BIGINT) AS n_g,
                   CAST(SUM(z) AS BIGINT) AS sum_z,
                   CAST(SUM(z * z) AS BIGINT) AS sumsq_z
            FROM z GROUP BY grp
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(n_g) AS BIGINT) AS n_total,
                   CAST(SUM(sum_z) AS BIGINT) AS sum_z_all
            FROM g
        ),
        parts AS (
            SELECT k, n_total,
                   SUM(n_g * (sum_z * 1.0 / n_g - sum_z_all * 1.0 / n_total)
                           * (sum_z * 1.0 / n_g - sum_z_all * 1.0 / n_total))
                       AS ssb,
                   SUM(sumsq_z - sum_z * 1.0 * sum_z / n_g) AS ssw
            FROM g CROSS JOIN tot
            GROUP BY k, n_total
        )
        SELECT g.grp, g.n_g, med.med_cents, g.sum_z, g.sumsq_z,
               CAST(parts.k AS BIGINT) AS k,
               ROUND((parts.ssb / (parts.k - 1.0))
                     / (parts.ssw / (parts.n_total - parts.k)), 6) AS bf_f,
               CAST(parts.k - 1 AS BIGINT) AS df1,
               CAST(parts.n_total - parts.k AS BIGINT) AS df2
        FROM g JOIN med ON g.grp = med.grp CROSS JOIN parts
    """,
    doc=(
        "BROWN-FORSYTHE EQUALITY-OF-SPREAD TEST across event types — the "
        "check every k-sample LOCATION test above silently assumes: are "
        "the group DISPERSIONS comparable, or is one event type's value "
        "distribution wider (which inflates location-test false "
        "positives and, operationally, flags the metric whose variance "
        "needs per-group modeling)? Levene's test centered on the mean "
        "is outlier-fragile; the Brown-Forsythe variant centers each "
        "observation on its GROUP MEDIAN and runs one-way ANOVA on the "
        "absolute deviations. Everything is exact integer arithmetic on "
        "the 0.01-quantized cent grid: the group median is the smallest "
        "cent whose within-group cumulative count doubles past n_g "
        "(lower median — an integer, no midpoint float), deviations "
        "|cent - med| are integers, and the hashed per-group columns "
        "(n, median, sum, sum-of-squares of deviations) carry no float "
        "at all; the F statistic assembles from them in one mirrored "
        "rounded expression (sum-of-squares cliff ~4e9 rows/group at "
        "this grid width — document-scale, not web-scale; past it, "
        "lift to DECIMAL). Plan: one aggregate to the bounded "
        "(group x cent) grid, the cumulative window runs PARTITIONED "
        "by group over that grid only, medians broadcast back for one "
        "more map-side pass, then |groups|-row reductions — at 100 TB "
        "two corpus scans (count grid, deviation moments), no global "
        "window, no corpus-sized shuffle beyond the grid keys."
    ),
    tags=("sampling", "statistics", "drift", "quality"),
)
def brown_forsythe_spread_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cent"),
    )
    cnt = c.groupBy("grp", "cent").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ng = cnt.groupBy("grp").agg(F.sum("n").cast("bigint").alias("n_g"))
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("cent")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cnt.select("grp", "cent", F.sum("n").over(w_cum).cast("bigint").alias("cum"))
    med = (
        cum.join(ng, "grp")
        .filter(2 * F.col("cum") >= F.col("n_g"))
        .groupBy("grp")
        .agg(F.min("cent").cast("bigint").alias("med_cents"))
    )
    z = c.join(F.broadcast(med), "grp").select(
        "grp", F.abs(F.col("cent") - F.col("med_cents")).alias("z")
    )
    g = z.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("z").cast("bigint").alias("sum_z"),
        F.sum(F.col("z") * F.col("z")).cast("bigint").alias("sumsq_z"),
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_g").cast("bigint").alias("n_total"),
        F.sum("sum_z").cast("bigint").alias("sum_z_all"),
    )
    j = g.crossJoin(F.broadcast(tot))
    dev = F.col("sum_z") * F.lit(1.0) / F.col("n_g") - F.col("sum_z_all") * F.lit(
        1.0
    ) / F.col("n_total")
    parts = j.groupBy("k", "n_total").agg(
        F.sum(F.col("n_g") * dev * dev).alias("ssb"),
        F.sum(
            F.col("sumsq_z")
            - F.col("sum_z") * F.lit(1.0) * F.col("sum_z") / F.col("n_g")
        ).alias("ssw"),
    )
    kd = F.col("k") * F.lit(1.0)
    nd = F.col("n_total") * F.lit(1.0)
    return (
        g.join(F.broadcast(med), "grp")
        .crossJoin(F.broadcast(parts))
        .select(
            "grp",
            "n_g",
            "med_cents",
            "sum_z",
            "sumsq_z",
            "k",
            F.round(
                (F.col("ssb") / (kd - 1)) / (F.col("ssw") / (nd - kd)), 6
            ).alias("bf_f"),
            (F.col("k") - 1).cast("bigint").alias("df1"),
            (F.col("n_total") - F.col("k")).cast("bigint").alias("df2"),
        )
    )


# ---------------------------------------------------------------------------
# Effect-size panel: HOW BIG is each source's shift (the tests above only
# say WHETHER one exists).
# ---------------------------------------------------------------------------


@register(
    "effect_size_panel",
    oracle="""
        WITH g AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_g,
                   CAST(SUM(n_chars) AS BIGINT) AS s1,
                   CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
            FROM documents GROUP BY source
        ),
        tot AS (
            SELECT CAST(SUM(n_g) AS BIGINT) AS n_all,
                   CAST(SUM(s1) AS BIGINT) AS s1_all,
                   CAST(SUM(s2) AS BIGINT) AS s2_all
            FROM g
        ),
        d AS (
            SELECT source, n_g, s1, s2,
                   n_all - n_g AS n_r,
                   s1 * 1.0 / n_g AS m_g,
                   (s1_all - s1) * 1.0 / (n_all - n_g) AS m_r,
                   (s2 - s1 * 1.0 * s1 / n_g) AS css_g,
                   ((s2_all - s2)
                    - (s1_all - s1) * 1.0 * (s1_all - s1)
                          / (n_all - n_g)) AS css_r
            FROM g CROSS JOIN tot
        )
        SELECT source, n_g, s1 AS sum_chars, s2 AS sumsq_chars,
               ROUND((m_g - m_r)
                     / sqrt((css_g + css_r) / (n_g + n_r - 2.0)), 6)
                   AS cohens_d,
               ROUND((m_g - m_r)
                     / sqrt((css_g + css_r) / (n_g + n_r - 2.0))
                     * (1.0 - 3.0 / (4.0 * (n_g + n_r) - 9.0)), 6)
                   AS hedges_g,
               ROUND(ln(m_g / m_r), 6) AS log_mean_ratio
        FROM d
    """,
    doc=(
        "EFFECT-SIZE PANEL per source (each source vs the REST of the "
        "corpus, on document length): Cohen's d on the pooled standard "
        "deviation, the Hedges small-sample correction g = d*(1 - "
        "3/(4N-9)), and the log response ratio ln(m_g/m_r) — the "
        "MAGNITUDE estimates that belong NEXT TO every significance "
        "test in the suite, because at corpus scale everything is "
        "'significant' (a 1e9-document test detects a 0.1-character "
        "shift) and mixture decisions need HOW BIG, not whether. "
        "One-vs-rest moments come FREE from the per-group sums: rest = "
        "global minus group, so the plan is ONE map-side-combined "
        "aggregate corpus scan to |sources| rows, one 1-row total "
        "broadcast back, and every derived quantity is a closed form "
        "over the exact BIGINT moments (which are the hashed columns; "
        "the three effect sizes are mirrored rounded expressions). "
        "Centered sums of squares use the css = s2 - s1^2/n identity "
        "on exact integers — no two-pass mean subtraction, no "
        "accumulation-order exposure. At 100 TB: identical plan, "
        "20-row output."
    ),
    tags=("sampling", "statistics", "quality", "llm"),
)
def effect_size_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("n_chars").cast("bigint").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("s2"),
    )
    tot = g.agg(
        F.sum("n_g").cast("bigint").alias("n_all"),
        F.sum("s1").cast("bigint").alias("s1_all"),
        F.sum("s2").cast("bigint").alias("s2_all"),
    )
    j = g.crossJoin(F.broadcast(tot))
    n_r = F.col("n_all") - F.col("n_g")
    m_g = F.col("s1") * F.lit(1.0) / F.col("n_g")
    m_r = (F.col("s1_all") - F.col("s1")) * F.lit(1.0) / n_r
    css_g = F.col("s2") - F.col("s1") * F.lit(1.0) * F.col("s1") / F.col("n_g")
    css_r = (F.col("s2_all") - F.col("s2")) - (
        F.col("s1_all") - F.col("s1")
    ) * F.lit(1.0) * (F.col("s1_all") - F.col("s1")) / n_r
    pooled = F.sqrt((css_g + css_r) / (F.col("n_g") + n_r - F.lit(2.0)))
    d = (m_g - m_r) / pooled
    corr_h = F.lit(1.0) - F.lit(3.0) / (
        F.lit(4.0) * (F.col("n_g") + n_r) - F.lit(9.0)
    )
    return j.select(
        "source",
        "n_g",
        F.col("s1").alias("sum_chars"),
        F.col("s2").alias("sumsq_chars"),
        F.round(d, 6).alias("cohens_d"),
        F.round(d * corr_h, 6).alias("hedges_g"),
        F.round(F.log(m_g / m_r), 6).alias("log_mean_ratio"),
    )


# ---------------------------------------------------------------------------
# Round 9: Dunn's post-hoc pairwise test — the follow-up kruskal_wallis_h
# needs (a significant H says 'some group differs'; Dunn says WHICH pairs),
# with Benjamini-Hochberg adjustment across the bounded pair family.
# ---------------------------------------------------------------------------


@register(
    "dunn_posthoc_pairs",
    oracle=f"""
        WITH b AS (
            SELECT event_type AS grp,
                   CAST(FLOOR(value * 10) AS BIGINT) AS bucket
            FROM events
        ),
        cnt AS (
            SELECT bucket, grp, CAST(COUNT(*) AS BIGINT) AS n
            FROM b GROUP BY bucket, grp
        ),
        tb AS (
            SELECT bucket, CAST(SUM(n) AS BIGINT) AS t
            FROM cnt GROUP BY bucket
        ),
        run AS (
            SELECT bucket, t,
                   CAST(COALESCE(SUM(t) OVER (
                       ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS below
            FROM tb
        ),
        grps AS (
            SELECT grp,
                   CAST(SUM(n) AS BIGINT) AS n_g,
                   CAST(SUM(n * (2 * below + t + 1)) AS BIGINT) AS rank_sum2
            FROM cnt JOIN run USING (bucket)
            GROUP BY grp
        ),
        tot AS (
            SELECT CAST(SUM(t) AS BIGINT) AS n_total,
                   CAST(SUM(t * t * t - t) AS BIGINT) AS tie_term
            FROM tb
        ),
        pairs AS (
            SELECT g1.grp AS grp_a, g2.grp AS grp_b,
                   g1.n_g AS n_a, g2.n_g AS n_b,
                   -- mean ranks from the x2-lifted exact rank sums
                   (g1.rank_sum2 * 1.0 / (2 * g1.n_g)
                    - g2.rank_sum2 * 1.0 / (2 * g2.n_g))
                   / SQRT((t.n_total * 1.0 * (t.n_total + 1) / 12.0
                           - t.tie_term * 1.0 / (12.0 * (t.n_total - 1)))
                          * (1.0 / g1.n_g + 1.0 / g2.n_g)) AS z
            FROM grps g1 JOIN grps g2 ON g1.grp < g2.grp
            CROSS JOIN tot t
        ),
        pvals AS (
            SELECT grp_a, grp_b, n_a, n_b, z,
                   2.0 * {_normal_sf_sql("abs(z)")} AS p
            FROM pairs
        ),
        ranked AS (
            SELECT grp_a, grp_b, n_a, n_b, z, p,
                   ROW_NUMBER() OVER (ORDER BY p, grp_a, grp_b) AS i,
                   CAST(COUNT(*) OVER () AS BIGINT) AS m
            FROM pvals
        )
        SELECT grp_a, grp_b, n_a, n_b,
               ROUND(z, 6) AS z_score,
               ROUND(p, 6) AS p_value,
               ROUND(MIN(p * m / i) OVER (
                   ORDER BY i DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                   AS p_bh
        FROM ranked
    """,
    doc=(
        "DUNN'S POST-HOC PAIRWISE TEST after Kruskal-Wallis, "
        "BH-adjusted — the follow-up a significant H statistic "
        "requires (H says SOME group distribution differs; Dunn says "
        "WHICH pairs, using the SAME pooled mid-ranks rather than "
        "re-ranking each pair, which is what distinguishes it from "
        "running pairwise Mann-Whitney tests): z_ij = (Rbar_i - "
        "Rbar_j) / sqrt((N(N+1)/12 - T/(12(N-1)))(1/n_i + 1/n_j)) "
        "with the tie correction T = sum(t^3 - t), two-sided p from "
        "the shared A&S tail literal, and Benjamini-Hochberg step-up "
        "across the K(K-1)/2 pair family as a reverse cumulative MIN "
        "over the bounded pair table. Mean ranks derive from the "
        "exact x2-lifted integer rank sums of the kruskal_wallis_h "
        "bucket grid (<=4901 rows by quantization); the pair join is "
        "K^2 over the |event_type| domain. One corpus-scale hash "
        "aggregate; everything after is grid- or pair-sized."
    ),
    tags=("sampling", "statistics", "window"),
)
def dunn_posthoc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 10).cast("bigint").alias("bucket"),
    )
    cnt = b.groupBy("bucket", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tb = cnt.groupBy("bucket").agg(F.sum("n").cast("bigint").alias("t"))
    w_below = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    run = tb.select(
        "bucket",
        "t",
        F.coalesce(F.sum("t").over(w_below), F.lit(0))
        .cast("bigint")
        .alias("below"),
    )
    grps = (
        cnt.join(run, "bucket")
        .groupBy("grp")
        .agg(
            F.sum("n").cast("bigint").alias("n_g"),
            F.sum(F.col("n") * (2 * F.col("below") + F.col("t") + 1))
            .cast("bigint")
            .alias("rank_sum2"),
        )
    )
    tot = tb.agg(
        F.sum("t").cast("bigint").alias("n_total"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("bigint")
        .alias("tie_term"),
    )
    g1 = grps.select(
        F.col("grp").alias("grp_a"),
        F.col("n_g").alias("n_a"),
        F.col("rank_sum2").alias("rs2_a"),
    )
    g2 = grps.select(
        F.col("grp").alias("grp_b"),
        F.col("n_g").alias("n_b"),
        F.col("rank_sum2").alias("rs2_b"),
    )
    pairs = (
        g1.join(g2, F.col("grp_a") < F.col("grp_b"))
        .crossJoin(F.broadcast(tot))
    )
    nt = F.col("n_total") * F.lit(1.0)
    z = (
        F.col("rs2_a") * F.lit(1.0) / (2 * F.col("n_a"))
        - F.col("rs2_b") * F.lit(1.0) / (2 * F.col("n_b"))
    ) / F.sqrt(
        (
            nt * (nt + 1) / F.lit(12.0)
            - F.col("tie_term") * F.lit(1.0) / (F.lit(12.0) * (nt - 1))
        )
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    from weather_stream_processor_spark.operators._normal_tail import (
        normal_sf_col,
    )

    p = F.lit(2.0) * normal_sf_col(F.abs(z))
    pvals = pairs.select("grp_a", "grp_b", "n_a", "n_b", z.alias("z"), p.alias("p"))
    w_rank = Window.orderBy("p", "grp_a", "grp_b")
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = pvals.select(
        "grp_a",
        "grp_b",
        "n_a",
        "n_b",
        "z",
        "p",
        F.row_number().over(w_rank).alias("i"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("m"),
    )
    w_rev = Window.orderBy(F.col("i").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return ranked.select(
        "grp_a",
        "grp_b",
        "n_a",
        "n_b",
        F.round(F.col("z"), 6).alias("z_score"),
        F.round(F.col("p"), 6).alias("p_value"),
        F.round(
            F.min(F.col("p") * F.col("m") / F.col("i")).over(w_rev), 6
        ).alias("p_bh"),
    )


# ---------------------------------------------------------------------------
# Round 9: Jonckheere-Terpstra ordered-alternative trend test.
# ---------------------------------------------------------------------------


@register(
    "jonckheere_terpstra_trend",
    oracle=f"""
        WITH b AS (
            SELECT o_orderpriority AS grp,
                   CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS bucket
            FROM orders
        ),
        cnt AS (
            SELECT grp, bucket, CAST(COUNT(*) AS BIGINT) AS n
            FROM b GROUP BY grp, bucket
        ),
        -- expand every group onto the FULL bucket spine before the
        -- cumulative: group i's below-count must be known at every
        -- bucket where group j has mass, including buckets where i has
        -- none (a bucket-equality join on i's own rows silently drops
        -- those cross terms — caught by the pure-Python replay test)
        spine AS (SELECT DISTINCT bucket FROM cnt),
        grid AS (
            SELECT g.grp, s.bucket, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
            FROM (SELECT DISTINCT grp FROM cnt) g
            CROSS JOIN spine s
            LEFT JOIN cnt c ON c.grp = g.grp AND c.bucket = s.bucket
        ),
        cum AS (
            SELECT grp, bucket, n,
                   CAST(COALESCE(SUM(n) OVER (
                       PARTITION BY grp ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS below
            FROM grid
        ),
        -- x2-lifted pairwise Mann-Whitney masses for every ORDERED group
        -- pair (priority strings order by their leading digit)
        j2 AS (
            SELECT CAST(SUM(2 * cj.n * ci.below + ci.n * cj.n) AS BIGINT)
                       AS j2
            FROM cum ci JOIN cnt cj
              ON ci.bucket = cj.bucket AND ci.grp < cj.grp
        ),
        grps AS (
            SELECT grp, CAST(SUM(n) AS BIGINT) AS n_g
            FROM cnt GROUP BY grp
        ),
        gm AS (
            SELECT CAST(SUM(n_g) AS BIGINT) AS n_total,
                   CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(n_g * n_g) AS BIGINT) AS sq,
                   CAST(SUM(n_g * (n_g - 1) * (2 * n_g + 5)) AS BIGINT)
                       AS g25,
                   CAST(SUM(n_g * (n_g - 1) * (n_g - 2)) AS BIGINT) AS g3,
                   CAST(SUM(n_g * (n_g - 1)) AS BIGINT) AS g2
            FROM grps
        ),
        ties AS (
            SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS t25,
                   CAST(SUM(t * (t - 1) * (t - 2)) AS BIGINT) AS t3,
                   CAST(SUM(t * (t - 1)) AS BIGINT) AS t2
            FROM (SELECT bucket, CAST(SUM(n) AS BIGINT) AS t
                  FROM cnt GROUP BY bucket)
        ),
        stat AS (
            SELECT j2, n_total, k,
                   (n_total * 1.0 * n_total - sq) / 4.0 AS e_j,
                   (n_total * 1.0 * (n_total - 1) * (2 * n_total + 5)
                    - g25 - t25) / 72.0
                   + g3 * 1.0 * t3
                     / (36.0 * n_total * (n_total - 1) * (n_total - 2))
                   + g2 * 1.0 * t2 / (8.0 * n_total * (n_total - 1))
                       AS var_j
            FROM j2 CROSS JOIN gm CROSS JOIN ties
        ),
        zed AS (
            SELECT j2, n_total, k, e_j, var_j,
                   (j2 / 2.0 - e_j) / SQRT(var_j) AS z
            FROM stat
        )
        SELECT n_total, k, j2,
               ROUND(e_j, 6) AS e_j,
               ROUND(var_j, 6) AS var_j,
               ROUND(z, 6) AS z_score,
               ROUND(2.0 * {_normal_sf_sql("abs(z)")}, 6) AS p_value
        FROM zed
    """,
    doc=(
        "JONCKHEERE-TERPSTRA ORDERED-ALTERNATIVE TREND TEST: does "
        "order value trend MONOTONICALLY across the five priority "
        "levels (1-URGENT .. 5-LOW — the natural ordering their "
        "leading digit gives)? Kruskal-Wallis tests 'any difference'; "
        "JT tests the ORDERED alternative and therefore has power "
        "exactly where a priority effect would live. J = sum of "
        "pairwise Mann-Whitney masses over ordered group pairs, "
        "computed as exact x2-lifted BIGINTs from the per-(group, "
        "bucket) count grid and each group's within-grid cumulative "
        "(n_j at bucket x n_i strictly below + half the same-bucket "
        "ties) — never a row-level pair join. Null mean (N^2 - sum "
        "n_i^2)/4 and the FULL Hollander-Wolfe tie-corrected variance "
        "(group and tie third-moment terms, all exact integer sums "
        "over bounded grids); two-sided p from the shared A&S tail. "
        "Grid: $1000 price buckets (~600 rows) x 5 groups. Under the "
        "TPC-H-ish fixture priorities are value-independent, so the "
        "expected answer is 'no trend' — the null certifies the "
        "machinery. One corpus-scale hash aggregate; the pair join is "
        "K^2 x buckets, grid-sized."
    ),
    tags=("sampling", "statistics", "window"),
)
def jonckheere_terpstra_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    b = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") / 1000).cast("bigint").alias("bucket"),
    )
    cnt = b.groupBy("grp", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # expand onto the full bucket spine first: group i's below-count must
    # exist at every bucket where group j has mass (see oracle comment)
    spine = cnt.select("bucket").distinct()
    grp_list = cnt.select("grp").distinct()
    grid = (
        grp_list.crossJoin(spine)
        .join(cnt, ["grp", "bucket"], "left")
        .select(
            "grp",
            "bucket",
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
        )
    )
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = grid.select(
        "grp",
        "bucket",
        "n",
        F.coalesce(F.sum("n").over(w_cum), F.lit(0))
        .cast("bigint")
        .alias("below"),
    )
    ci = cum.select(
        F.col("grp").alias("grp_i"),
        F.col("bucket").alias("bucket_i"),
        F.col("n").alias("n_i"),
        F.col("below").alias("below_i"),
    )
    cj = cnt.select(
        F.col("grp").alias("grp_j"),
        F.col("bucket").alias("bucket_j"),
        F.col("n").alias("n_j"),
    )
    j2 = (
        ci.join(
            cj,
            (F.col("bucket_i") == F.col("bucket_j"))
            & (F.col("grp_i") < F.col("grp_j")),
        )
        .agg(
            F.sum(
                2 * F.col("n_j") * F.col("below_i")
                + F.col("n_i") * F.col("n_j")
            )
            .cast("bigint")
            .alias("j2")
        )
    )
    grps = cnt.groupBy("grp").agg(F.sum("n").cast("bigint").alias("n_g"))
    ng = F.col("n_g")
    gm = grps.agg(
        F.sum(ng).cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(ng * ng).cast("bigint").alias("sq"),
        F.sum(ng * (ng - 1) * (2 * ng + 5)).cast("bigint").alias("g25"),
        F.sum(ng * (ng - 1) * (ng - 2)).cast("bigint").alias("g3"),
        F.sum(ng * (ng - 1)).cast("bigint").alias("g2"),
    )
    tb = cnt.groupBy("bucket").agg(F.sum("n").cast("bigint").alias("t"))
    t_ = F.col("t")
    ties = tb.agg(
        F.sum(t_ * (t_ - 1) * (2 * t_ + 5)).cast("bigint").alias("t25"),
        F.sum(t_ * (t_ - 1) * (t_ - 2)).cast("bigint").alias("t3"),
        F.sum(t_ * (t_ - 1)).cast("bigint").alias("t2"),
    )
    nt = F.col("n_total") * F.lit(1.0)
    stat = (
        j2.crossJoin(F.broadcast(gm))
        .crossJoin(F.broadcast(ties))
        .select(
            "j2",
            "n_total",
            "k",
            ((nt * nt - F.col("sq")) / F.lit(4.0)).alias("e_j"),
            (
                (
                    nt * (nt - 1) * (2 * F.col("n_total") + 5)
                    - F.col("g25")
                    - F.col("t25")
                )
                / F.lit(72.0)
                + F.col("g3")
                * F.lit(1.0)
                * F.col("t3")
                / (F.lit(36.0) * nt * (nt - 1) * (nt - 2))
                + F.col("g2")
                * F.lit(1.0)
                * F.col("t2")
                / (F.lit(8.0) * nt * (nt - 1))
            ).alias("var_j"),
        )
    )
    from weather_stream_processor_spark.operators._normal_tail import (
        normal_sf_col,
    )

    z = (F.col("j2") / F.lit(2.0) - F.col("e_j")) / F.sqrt(F.col("var_j"))
    sf = normal_sf_col(F.abs(z))
    return stat.select(
        "n_total",
        "k",
        "j2",
        F.round(F.col("e_j"), 6).alias("e_j"),
        F.round(F.col("var_j"), 6).alias("var_j"),
        F.round(z, 6).alias("z_score"),
        F.round(F.lit(2.0) * sf, 6).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# Round 9: Friedman test — the BLOCKED (repeated-measures) member of the
# rank-test family (KW = independent groups; Friedman = k treatments
# measured within each block).
# ---------------------------------------------------------------------------


@register(
    "friedman_test_daily",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d, event_type,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events GROUP BY CAST(ts AS DATE), event_type
        ),
        kk AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
               FROM daily),
        complete_blocks AS (
            SELECT d FROM daily CROSS JOIN kk
            GROUP BY d, kk.k HAVING COUNT(*) = ANY_VALUE(kk.k)
        ),
        ranked AS (
            SELECT daily.d, event_type,
                   CAST(2 * RANK() OVER (PARTITION BY daily.d
                                         ORDER BY cents)
                        + COUNT(*) OVER (PARTITION BY daily.d, cents) - 1
                        AS BIGINT) AS r2
            FROM daily JOIN complete_blocks USING (d)
        ),
        treat AS (
            SELECT event_type, CAST(SUM(r2) AS BIGINT) AS r2_sum
            FROM ranked GROUP BY event_type
        ),
        tots AS (
            SELECT CAST(COUNT(DISTINCT d) AS BIGINT) AS n_blocks,
                   CAST(SUM(r2 * r2) AS BIGINT) AS a2
            FROM ranked
        ),
        stat AS (
            SELECT t.event_type, t.r2_sum, o.n_blocks, kk.k,
                   (kk.k - 1) * 1.0
                   * SUM((t.r2_sum - o.n_blocks * (kk.k + 1))
                         * (t.r2_sum - o.n_blocks * (kk.k + 1))) OVER ()
                   / (o.a2 - o.n_blocks * kk.k * (kk.k + 1) * (kk.k + 1))
                       AS chi2
            FROM treat t CROSS JOIN tots o CROSS JOIN kk
        )
        SELECT event_type, r2_sum, n_blocks, k,
               ROUND(chi2, 6) AS friedman_chi2,
               ROUND({_normal_sf_signed_sql(
                   "((pow(chi2 / (k - 1.0), 1.0 / 3.0)"
                   " - (1.0 - 2.0 / (9.0 * (k - 1.0))))"
                   " / sqrt(2.0 / (9.0 * (k - 1.0))))"
               )}, 6) AS p_wilson_hilferty
        FROM stat
    """,
    doc=(
        "FRIEDMAN TEST over (day x event type) daily value totals — the "
        "BLOCKED rank test that completes the family: Kruskal-Wallis "
        "compares independent groups, Friedman compares k treatments "
        "measured WITHIN each block (here: do the event types keep the "
        "same value ordering day after day?), which removes the "
        "between-day variance KW would drown in. Only COMPLETE blocks "
        "(days where all k types appear) enter, per the textbook "
        "design. Within-block mid-ranks are x2-lifted exact integers "
        "(2*rank + ties - 1 over the k-row block), the tie-general "
        "Conover form chi2 = (k-1) sum_j (R2_j - n(k+1))^2 / "
        "(A2 - n k (k+1)^2) is ALL integer arithmetic up to one "
        "division (the x4 lifts cancel exactly), and the p-value maps "
        "through the same Wilson-Hilferty cube-root + shared A&S tail "
        "the KW operator uses. Plan: one (day, type) hash aggregate; "
        "rank windows are partitioned per day over k rows; everything "
        "after is k-row arithmetic. One corpus-scale shuffle at 100 TB."
    ),
    tags=("sampling", "statistics", "window"),
)
def friedman_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from weather_stream_processor_spark.operators._normal_tail import (
        normal_sf_col,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("d"), "event_type"
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    kk = daily.agg(F.count_distinct("event_type").cast("bigint").alias("k"))
    complete = (
        daily.crossJoin(F.broadcast(kk))
        .groupBy("d", "k")
        .agg(F.count(F.lit(1)).alias("_nt"))
        .filter(F.col("_nt") == F.col("k"))
        .select("d")
    )
    w_rank = Window.partitionBy("d").orderBy("cents")
    w_tie = Window.partitionBy("d", "cents")
    ranked = daily.join(complete, "d").select(
        "d",
        "event_type",
        (
            F.lit(2) * F.rank().over(w_rank)
            + F.count(F.lit(1)).over(w_tie)
            - 1
        )
        .cast("bigint")
        .alias("r2"),
    )
    treat = ranked.groupBy("event_type").agg(
        F.sum("r2").cast("bigint").alias("r2_sum")
    )
    tots = ranked.agg(
        F.count_distinct("d").cast("bigint").alias("n_blocks"),
        F.sum(F.col("r2") * F.col("r2")).cast("bigint").alias("a2"),
    )
    g = treat.crossJoin(F.broadcast(tots)).crossJoin(F.broadcast(kk))
    dev = F.col("r2_sum") - F.col("n_blocks") * (F.col("k") + 1)
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    chi2 = (
        (F.col("k") - 1)
        * F.lit(1.0)
        * F.sum(dev * dev).over(w_all)
        / (
            F.col("a2")
            - F.col("n_blocks")
            * F.col("k")
            * (F.col("k") + 1)
            * (F.col("k") + 1)
        )
    )
    stat = g.select(
        "event_type", "r2_sum", "n_blocks", "k", chi2.alias("chi2")
    )
    df_ = F.col("k") * F.lit(1.0) - F.lit(1.0)
    z_wh = (
        F.pow(F.col("chi2") / df_, F.lit(1.0) / F.lit(3.0))
        - (F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * df_))
    ) / F.sqrt(F.lit(2.0) / (F.lit(9.0) * df_))
    p_wh = F.when(z_wh >= 0, normal_sf_col(z_wh)).otherwise(
        F.lit(1.0) - normal_sf_col(-z_wh)
    )
    return stat.select(
        "event_type",
        "r2_sum",
        "n_blocks",
        "k",
        F.round(F.col("chi2"), 6).alias("friedman_chi2"),
        F.round(p_wh, 6).alias("p_wilson_hilferty"),
    )


# ---------------------------------------------------------------------------
# Round-10 inference closers: Bartlett's variance test (the parametric
# twin of Brown-Forsythe), Mood's median test (the robust 2xK location
# screen), and Page's trend test (the BLOCKED ordered alternative —
# Friedman : Kruskal-Wallis :: Page : Jonckheere-Terpstra).
# ---------------------------------------------------------------------------


@register(
    "bartlett_variance_test",
    oracle=f"""
        WITH c AS (
            SELECT event_type AS grp,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cent
            FROM events
        ),
        g AS (
            -- squared cents sums overflow int64 at corpus scale:
            -- HUGEINT/DECIMAL(38,0), the house exact-moment guard
            SELECT grp,
                   CAST(COUNT(*) AS BIGINT) AS n_g,
                   CAST(SUM(cent) AS BIGINT) AS s,
                   SUM(CAST(cent AS HUGEINT) * cent) AS ss
            FROM c GROUP BY grp
            HAVING COUNT(*) >= 2
        ),
        v AS (
            SELECT grp, n_g,
                   (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n_g)
                       / (n_g - 1) AS s2
            FROM g
        ),
        -- zero-variance exclusion shared by BOTH tot and the output rows
        -- (r10 advice: stat formerly read the unfiltered v, so a
        -- degenerate constant-cent group would appear as an output row
        -- here but not in the Spark plan)
        v2 AS (SELECT * FROM v WHERE s2 > 0),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(n_g) AS BIGINT) AS n_total,
                   SUM((n_g - 1) * s2) AS ssw,
                   SUM((n_g - 1) * ln(s2)) AS sum_ln,
                   SUM(1.0 / (n_g - 1)) AS sum_inv
            FROM v2
        ),
        stat AS (
            SELECT v.grp, v.n_g, v.s2, tot.k,
                   ((tot.n_total - tot.k)
                        * ln(tot.ssw / (tot.n_total - tot.k))
                    - tot.sum_ln)
                   / (1.0 + (tot.sum_inv - 1.0 / (tot.n_total - tot.k))
                            / (3.0 * (tot.k - 1.0))) AS t_stat,
                   tot.k - 1.0 AS df
            FROM v2 AS v CROSS JOIN tot
        ),
        wh AS (
            SELECT grp, n_g, s2, k, t_stat, df,
                   (pow(t_stat / df, 1.0 / 3.0)
                    - (1.0 - 2.0 / (9.0 * df)))
                   / sqrt(2.0 / (9.0 * df)) AS z_wh
            FROM stat
        )
        SELECT grp, n_g,
               ROUND(s2, 4) AS variance_cents2,
               CAST(k AS BIGINT) AS k,
               ROUND(t_stat, 6) AS bartlett_t,
               CAST(df AS BIGINT) AS df,
               ROUND({{SIGNED_SF}}, 6) AS p_wilson_hilferty
        FROM wh
    """.replace("{SIGNED_SF}", _normal_sf_signed_sql("z_wh")),
    doc=(
        "BARTLETT'S TEST of equal variances across event types — the "
        "PARAMETRIC twin of the registered brown_forsythe_spread_test "
        "(Bartlett is the uniformly-most-powerful choice when the "
        "groups are near-normal, but is notoriously sensitive to "
        "kurtosis — which is exactly why both belong in the suite, and "
        "why jarque_bera_normality gates the choice between them): "
        "T = [(N-k) ln(sp^2) - sum (n_i-1) ln(s_i^2)] / C with the "
        "classic Bartlett correction C, chi-square(k-1) under H0, p "
        "via the shared Wilson-Hilferty + signed A&S tail. Group "
        "variances come from exact integer cent moments (squared sums "
        "in HUGEINT/DECIMAL(38,0), one double conversion); ln is "
        "evaluated on identical doubles in both engines (the theils_u "
        "/ Dunning-G2 precedent). Zero-variance or singleton groups "
        "are excluded, mirrored. One corpus-scale hash aggregate; "
        "everything after is k-row arithmetic."
    ),
    tags=("sampling", "statistics", "quality"),
)
def bartlett_variance_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cent"),
    )
    dec = "decimal(38,0)"
    g = (
        c.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_g"),
            F.sum("cent").cast("bigint").alias("s"),
            F.sum(F.col("cent").cast(dec) * F.col("cent")).alias("ss"),
        )
        .filter(F.col("n_g") >= 2)
    )
    s2 = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("n_g")
    ) / (F.col("n_g") - 1)
    v = g.select("grp", "n_g", s2.alias("s2")).filter(F.col("s2") > 0)
    tot = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_g").cast("bigint").alias("n_total"),
        F.sum((F.col("n_g") - 1) * F.col("s2")).alias("ssw"),
        F.sum((F.col("n_g") - 1) * F.log(F.col("s2"))).alias("sum_ln"),
        F.sum(F.lit(1.0) / (F.col("n_g") - 1)).alias("sum_inv"),
    )
    j = v.crossJoin(F.broadcast(tot))
    nk = F.col("n_total") - F.col("k")
    t_stat = (
        nk * F.log(F.col("ssw") / nk) - F.col("sum_ln")
    ) / (
        F.lit(1.0)
        + (F.col("sum_inv") - F.lit(1.0) / nk)
        / (F.lit(3.0) * (F.col("k") - F.lit(1.0)))
    )
    df_ = F.col("k") * F.lit(1.0) - F.lit(1.0)
    stat = j.select(
        "grp", "n_g", "s2", "k", t_stat.alias("t_stat"), df_.alias("df")
    )
    z_wh = (
        F.pow(F.col("t_stat") / F.col("df"), F.lit(1.0) / F.lit(3.0))
        - (F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * F.col("df")))
    ) / F.sqrt(F.lit(2.0) / (F.lit(9.0) * F.col("df")))

    def _sf_pos(az):
        t = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_P) * az)
        poly = t * (
            F.lit(_AS_B[0])
            + t
            * (
                F.lit(_AS_B[1])
                + t * (F.lit(_AS_B[2]) + t * (F.lit(_AS_B[3]) + t * F.lit(_AS_B[4])))
            )
        )
        return (
            F.exp(-az * az / F.lit(2.0))
            / F.sqrt(F.lit(2.0) * F.lit(math.pi))
            * poly
        )

    p_wh = F.when(z_wh >= 0, _sf_pos(z_wh)).otherwise(
        F.lit(1.0) - _sf_pos(-z_wh)
    )
    return stat.select(
        "grp",
        "n_g",
        F.round(F.col("s2"), 4).alias("variance_cents2"),
        F.col("k").cast("bigint").alias("k"),
        F.round(F.col("t_stat"), 6).alias("bartlett_t"),
        F.col("df").cast("bigint").alias("df"),
        F.round(p_wh, 6).alias("p_wilson_hilferty"),
    )


@register(
    "mood_median_test",
    oracle=f"""
        WITH c AS (
            SELECT event_type AS grp,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cent
            FROM events
        ),
        grid AS (
            -- ONE corpus aggregate; every later stage (global counts,
            -- median walk, 2xK cells) derives from this bounded grid —
            -- the raw-row formulation re-scanned events six times (r10
            -- scan-count audit)
            SELECT grp, cent, CAST(COUNT(*) AS BIGINT) AS n
            FROM c GROUP BY grp, cent
        ),
        cnt AS (
            SELECT cent, CAST(SUM(n) AS BIGINT) AS n
            FROM grid GROUP BY cent
        ),
        tot0 AS (SELECT CAST(SUM(n) AS BIGINT) AS n_all FROM cnt),
        cum AS (
            SELECT cent,
                   CAST(SUM(n) OVER (ORDER BY cent) AS BIGINT) AS cum
            FROM cnt
        ),
        med AS (
            SELECT CAST(MIN(cent) AS BIGINT) AS med_cents
            FROM cum CROSS JOIN tot0
            WHERE 2 * cum >= n_all
        ),
        cells AS (
            -- exact-median ties EXCLUDED (the runs-test convention:
            -- integer cents make equality exact and deterministic)
            SELECT grp,
                   CAST(SUM(CASE WHEN cent > med_cents THEN n ELSE 0 END)
                        AS BIGINT) AS above,
                   CAST(SUM(CASE WHEN cent < med_cents THEN n ELSE 0 END)
                        AS BIGINT) AS below
            FROM grid CROSS JOIN med
            GROUP BY grp
        ),
        marg AS (
            SELECT CAST(SUM(above) AS BIGINT) AS a_all,
                   CAST(SUM(below) AS BIGINT) AS b_all,
                   CAST(SUM(above + below) AS BIGINT) AS n_inc,
                   CAST(COUNT(*) AS BIGINT) AS k
            FROM cells
        ),
        chi AS (
            SELECT c.grp, c.above, c.below, m.k,
                   SUM((c.above - (c.above + c.below) * 1.0 * m.a_all / m.n_inc)
                       * (c.above - (c.above + c.below) * 1.0 * m.a_all / m.n_inc)
                       / ((c.above + c.below) * 1.0 * m.a_all / m.n_inc)
                       + (c.below - (c.above + c.below) * 1.0 * m.b_all / m.n_inc)
                       * (c.below - (c.above + c.below) * 1.0 * m.b_all / m.n_inc)
                       / ((c.above + c.below) * 1.0 * m.b_all / m.n_inc))
                       OVER () AS chi2,
                   m.k - 1.0 AS df
            FROM cells c CROSS JOIN marg m
        ),
        wh AS (
            SELECT grp, above, below, k, chi2, df,
                   (pow(chi2 / df, 1.0 / 3.0)
                    - (1.0 - 2.0 / (9.0 * df)))
                   / sqrt(2.0 / (9.0 * df)) AS z_wh
            FROM chi
        )
        SELECT grp, above AS n_above, below AS n_below,
               CAST(k AS BIGINT) AS k,
               ROUND(chi2, 6) AS chi2,
               CAST(df AS BIGINT) AS df,
               ROUND({{SIGNED_SF}}, 6) AS p_wilson_hilferty
        FROM wh
    """.replace("{SIGNED_SF}", _normal_sf_signed_sql("z_wh")),
    doc=(
        "MOOD'S MEDIAN TEST across event types: the 2xK contingency "
        "chi-square of above-GLOBAL-median vs below counts — the "
        "maximally-robust k-sample location screen (it uses only the "
        "side of the median each value falls on, so single wild "
        "outliers cannot move it at all; less powerful than "
        "Kruskal-Wallis when tails are clean, indispensable when they "
        "are not — which is why the suite carries both). The global "
        "median comes from the cumulative-count walk over the bounded "
        "integer-cent grid (the brown_forsythe construction, global "
        "instead of per-group); exact-median ties are EXCLUDED, made "
        "deterministic by integer cents. All 2xK cells are exact "
        "BIGINTs; chi2 = sum (o-e)^2/e over the k-row grid, df = k-1, "
        "p via the shared Wilson-Hilferty + signed A&S tail. One "
        "conditional-count aggregate to the bounded cent grid + one "
        "k-row rollup shuffle at 100 TB."
    ),
    tags=("sampling", "statistics", "drift", "window"),
)
def mood_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cent"),
    )
    # ONE corpus aggregate to the bounded (grp, cent) grid; persisted so
    # the median walk and the 2xK cells don't re-scan the corpus (the
    # raw-row formulation planned SIX parquet scans — r10 audit)
    grid0 = c.groupBy("grp", "cent").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    from weather_stream_processor_spark.plans.caching import persisted_result

    return persisted_result(grid0, _mood_build)


def _mood_build(grid: DataFrame) -> DataFrame:
    from pyspark.sql.window import Window

    cnt = grid.groupBy("cent").agg(F.sum("n").cast("bigint").alias("n"))
    tot0 = cnt.agg(F.sum("n").cast("bigint").alias("n_all"))
    # cumulative over the bounded cent grid only (<= |distinct cents| rows)
    w_cum = Window.orderBy("cent").rowsBetween(Window.unboundedPreceding, 0)
    cum = cnt.select("cent", F.sum("n").over(w_cum).cast("bigint").alias("cum"))
    med = (
        cum.crossJoin(F.broadcast(tot0))
        .filter(2 * F.col("cum") >= F.col("n_all"))
        .agg(F.min("cent").cast("bigint").alias("med_cents"))
    )
    cells = (
        grid.crossJoin(F.broadcast(med))
        .groupBy("grp")
        .agg(
            F.sum(
                F.when(F.col("cent") > F.col("med_cents"), F.col("n")).otherwise(0)
            )
            .cast("bigint")
            .alias("above"),
            F.sum(
                F.when(F.col("cent") < F.col("med_cents"), F.col("n")).otherwise(0)
            )
            .cast("bigint")
            .alias("below"),
        )
    )
    marg = cells.agg(
        F.sum("above").cast("bigint").alias("a_all"),
        F.sum("below").cast("bigint").alias("b_all"),
        F.sum(F.col("above") + F.col("below")).cast("bigint").alias("n_inc"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    j = cells.crossJoin(F.broadcast(marg))
    row_n = (F.col("above") + F.col("below")) * F.lit(1.0)
    e_a = row_n * F.col("a_all") / F.col("n_inc")
    e_b = row_n * F.col("b_all") / F.col("n_inc")
    term = (
        (F.col("above") - e_a) * (F.col("above") - e_a) / e_a
        + (F.col("below") - e_b) * (F.col("below") - e_b) / e_b
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    chi = j.select(
        "grp",
        "above",
        "below",
        "k",
        F.sum(term).over(w_all).alias("chi2"),
        (F.col("k") * F.lit(1.0) - 1).alias("df"),
    )
    z_wh = (
        F.pow(F.col("chi2") / F.col("df"), F.lit(1.0) / F.lit(3.0))
        - (F.lit(1.0) - F.lit(2.0) / (F.lit(9.0) * F.col("df")))
    ) / F.sqrt(F.lit(2.0) / (F.lit(9.0) * F.col("df")))

    def _sf_pos(az):
        t = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_P) * az)
        poly = t * (
            F.lit(_AS_B[0])
            + t
            * (
                F.lit(_AS_B[1])
                + t * (F.lit(_AS_B[2]) + t * (F.lit(_AS_B[3]) + t * F.lit(_AS_B[4])))
            )
        )
        return (
            F.exp(-az * az / F.lit(2.0))
            / F.sqrt(F.lit(2.0) * F.lit(math.pi))
            * poly
        )

    p_wh = F.when(z_wh >= 0, _sf_pos(z_wh)).otherwise(
        F.lit(1.0) - _sf_pos(-z_wh)
    )
    return chi.select(
        F.col("grp"),
        F.col("above").alias("n_above"),
        F.col("below").alias("n_below"),
        F.col("k").cast("bigint").alias("k"),
        F.round(F.col("chi2"), 6).alias("chi2"),
        F.col("df").cast("bigint").alias("df"),
        F.round(p_wh, 6).alias("p_wilson_hilferty"),
    )


@register(
    "page_trend_test",
    oracle=f"""
        WITH daily AS (
            SELECT date_trunc('month', o_orderdate) AS d,
                   CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS lvl,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders GROUP BY 1, 2
        ),
        kk AS (SELECT CAST(COUNT(DISTINCT lvl) AS BIGINT) AS k FROM daily),
        complete_blocks AS (
            SELECT d FROM daily CROSS JOIN kk
            GROUP BY d, kk.k HAVING COUNT(*) = ANY_VALUE(kk.k)
        ),
        ranked AS (
            SELECT daily.d, lvl,
                   CAST(2 * RANK() OVER (PARTITION BY daily.d
                                         ORDER BY cents)
                        + COUNT(*) OVER (PARTITION BY daily.d, cents) - 1
                        AS BIGINT) AS r2
            FROM daily JOIN complete_blocks USING (d)
        ),
        treat AS (
            SELECT lvl, CAST(SUM(r2) AS BIGINT) AS r2_sum
            FROM ranked GROUP BY lvl
        ),
        tots AS (
            SELECT CAST(COUNT(DISTINCT d) AS BIGINT) AS b FROM ranked
        ),
        stat AS (
            SELECT t.lvl, t.r2_sum, o.b, kk.k,
                   CAST(SUM(t.lvl * t.r2_sum) OVER () AS BIGINT) AS l2,
                   o.b * kk.k * (kk.k + 1.0) * (kk.k + 1.0) / 2.0 AS e_l2,
                   o.b * (kk.k * kk.k * kk.k - kk.k)
                       * (kk.k * kk.k * kk.k - kk.k)
                       / (36.0 * (kk.k - 1.0)) AS var_l2
            FROM treat t CROSS JOIN tots o CROSS JOIN kk
        ),
        zed AS (
            SELECT lvl, r2_sum, b, k, l2, e_l2,
                   (l2 - e_l2) / sqrt(var_l2) AS z
            FROM stat
        )
        SELECT lvl AS priority_level, r2_sum, b AS n_blocks, k,
               l2 AS page_l2,
               ROUND(e_l2, 6) AS expected_l2,
               ROUND(z, 6) AS z_score,
               ROUND({{SIGNED_SF}}, 6) AS p_one_sided
        FROM zed
    """.replace("{SIGNED_SF}", _normal_sf_signed_sql("z")),
    doc=(
        "PAGE'S TREND TEST over (order-MONTH block x order-priority "
        "treatment) daily revenue: does daily revenue trend "
        "MONOTONICALLY across the five a-priori-ORDERED priority "
        "levels ('1-URGENT'..'5-LOW', scores = the leading digit, an "
        "ordering that exists BEFORE the data — Page's precondition)? "
        "The blocked ordered-alternative member completing the "
        "2x2 test family: Friedman : Kruskal-Wallis :: Page : "
        "Jonckheere-Terpstra (Friedman asks 'any difference within "
        "blocks'; Page asks 'THIS ordered difference', buying power "
        "exactly when the ordering is right). L = sum_j j*R_j on "
        "within-block mid-ranks; everything is x2-lifted so L2 = "
        "sum j*R2_j is an EXACT BIGINT; E[L2] = b*k(k+1)^2/2 and "
        "Var[L2] = b(k^3-k)^2/(36(k-1)) (the classic no-tie variance "
        "with mid-ranks — ties across priorities in integer daily "
        "cents are rare and the convention is documented), one-sided "
        "upper p via the shared signed A&S tail. Complete blocks only "
        "(every priority present in the month), the friedman_test_daily "
        "construction on the orders table with MONTH blocks (day blocks "
        "are too sparse for complete k-level coverage at small scale "
        "and the monthly design is the standard seasonal framing). One "
        "(month, priority) hash aggregate; rank windows live on k-row "
        "blocks; k-row arithmetic after."
    ),
    tags=("sampling", "statistics", "window"),
)
def page_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("d"),
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("lvl"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    kk = daily.agg(F.count_distinct("lvl").cast("bigint").alias("k"))
    complete = (
        daily.crossJoin(F.broadcast(kk))
        .groupBy("d", "k")
        .agg(F.count(F.lit(1)).alias("_nt"))
        .filter(F.col("_nt") == F.col("k"))
        .select("d")
    )
    w_rank = Window.partitionBy("d").orderBy("cents")
    w_tie = Window.partitionBy("d", "cents")
    ranked = daily.join(complete, "d").select(
        "d",
        "lvl",
        (
            F.lit(2) * F.rank().over(w_rank)
            + F.count(F.lit(1)).over(w_tie)
            - 1
        )
        .cast("bigint")
        .alias("r2"),
    )
    treat = ranked.groupBy("lvl").agg(
        F.sum("r2").cast("bigint").alias("r2_sum")
    )
    tots = ranked.agg(F.count_distinct("d").cast("bigint").alias("b"))
    g = treat.crossJoin(F.broadcast(tots)).crossJoin(F.broadcast(kk))
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    kf = F.col("k") * F.lit(1.0)
    l2 = F.sum(F.col("lvl") * F.col("r2_sum")).over(w_all).cast("bigint")
    e_l2 = F.col("b") * kf * (kf + 1) * (kf + 1) / F.lit(2.0)
    var_l2 = (
        F.col("b")
        * (kf * kf * kf - kf)
        * (kf * kf * kf - kf)
        / (F.lit(36.0) * (kf - 1))
    )
    stat = g.select(
        "lvl",
        "r2_sum",
        "b",
        "k",
        l2.alias("l2"),
        e_l2.alias("e_l2"),
        var_l2.alias("var_l2"),
    )
    z = (F.col("l2") - F.col("e_l2")) / F.sqrt(F.col("var_l2"))

    def _sf_pos(az):
        t = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_P) * az)
        poly = t * (
            F.lit(_AS_B[0])
            + t
            * (
                F.lit(_AS_B[1])
                + t * (F.lit(_AS_B[2]) + t * (F.lit(_AS_B[3]) + t * F.lit(_AS_B[4])))
            )
        )
        return (
            F.exp(-az * az / F.lit(2.0))
            / F.sqrt(F.lit(2.0) * F.lit(math.pi))
            * poly
        )

    p = F.when(z >= 0, _sf_pos(z)).otherwise(F.lit(1.0) - _sf_pos(-z))
    return stat.select(
        F.col("lvl").alias("priority_level"),
        "r2_sum",
        F.col("b").alias("n_blocks"),
        "k",
        F.col("l2").alias("page_l2"),
        F.round(F.col("e_l2"), 6).alias("expected_l2"),
        F.round(z, 6).alias("z_score"),
        F.round(p, 6).alias("p_one_sided"),
    )


# ---------------------------------------------------------------------------
# Round-10 drift-quartet completion: KS is the sup-norm member and
# Wasserstein the L1 member; Cramér-von Mises adds the L2 member and
# Anderson-Darling the tail-weighted member. Same click/purchase
# quantized-bucket-grid construction as ks_drift_two_sample.
# ---------------------------------------------------------------------------


@register(
    "cramer_von_mises_drift",
    oracle="""
        WITH b AS (
            SELECT CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS g,
                   CAST(FLOOR(value * 10) AS BIGINT) AS bucket
            FROM events WHERE event_type IN ('click', 'purchase')
        ),
        counts AS (
            SELECT bucket,
                   CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_a,
                   CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_b
            FROM b GROUP BY bucket
        ),
        run AS (
            SELECT bucket, n_a, n_b,
                   CAST(SUM(n_a) OVER (ORDER BY bucket) AS BIGINT) AS ca,
                   CAST(SUM(n_b) OVER (ORDER BY bucket) AS BIGINT) AS cb,
                   CAST(SUM(n_a) OVER () AS BIGINT) AS t_a,
                   CAST(SUM(n_b) OVER () AS BIGINT) AS t_b
            FROM counts
        ),
        num AS (
            -- the T numerator is an exact HUGEINT: sum of integer
            -- terms t_k * (A_k*n_b - B_k*n_a)^2, so the cross-bucket
            -- accumulation is ORDER-FREE (an integer sum) and the
            -- statistic is one double division at the end. Exactness
            -- bound: term <= N*(n_a*n_b)^2, within DECIMAL(38,0) to
            -- ~4e7 rows per side; beyond that the lift needs staging
            -- (documented, same honesty rule as the MMD int64 guards)
            SELECT SUM(CAST(n_a + n_b AS HUGEINT)
                       * (ca * t_b - cb * t_a) * (ca * t_b - cb * t_a))
                       AS t_num,
                   MAX(t_a) AS t_a, MAX(t_b) AS t_b
            FROM run
        )
        SELECT t_a AS n_a, t_b AS n_b,
               ROUND(CAST(t_num AS DOUBLE)
                     / ((t_a + t_b) * 1.0 * (t_a + t_b) * t_a * t_b), 6)
                   AS cvm_t,
               0.461 AS cvm_critical_05,
               CAST(t_num AS DOUBLE)
                   / ((t_a + t_b) * 1.0 * (t_a + t_b) * t_a * t_b)
                   > 0.461 AS drifted
        FROM num
    """,
    doc=(
        "TWO-SAMPLE CRAMER-VON MISES drift test (quantized): the "
        "L2-norm member of the drift quartet — KS reacts to the single "
        "worst CDF gap, Wasserstein to the total transport mass, CvM "
        "T = (n_a n_b / N^2) sum_k t_k (F_a - F_b)^2 to the SQUARED gap "
        "integrated over the distribution, which detects many small "
        "coherent shifts KS's sup-norm dilutes. Same FLOOR(value*10) "
        "bucket grid as ks_drift_two_sample; the numerator is an exact "
        "HUGEINT/DECIMAL(38,0) sum of integer terms t_k*(A_k n_b - "
        "B_k n_a)^2 — cross-bucket accumulation is an ORDER-FREE "
        "integer sum, one double division at the end (exact to ~4e7 "
        "rows per side; the bound is documented rather than silently "
        "approximate). Decision at the asymptotic alpha=0.05 critical "
        "value 0.461, the KS-operator convention. Two conditional "
        "counts into the bounded grid; one ordered window over the "
        "grid only."
    ),
    tags=("sampling", "drift", "statistics", "quality"),
)
def cramer_von_mises_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    b = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("g"),
        F.floor(F.col("value") * 10).cast("bigint").alias("bucket"),
    )
    counts = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    run = counts.select(
        "bucket",
        "n_a",
        "n_b",
        F.sum("n_a").over(w_cum).cast("bigint").alias("ca"),
        F.sum("n_b").over(w_cum).cast("bigint").alias("cb"),
        F.sum("n_a").over(w_all).cast("bigint").alias("t_a"),
        F.sum("n_b").over(w_all).cast("bigint").alias("t_b"),
    )
    dec = "decimal(38,0)"
    d = F.col("ca") * F.col("t_b") - F.col("cb") * F.col("t_a")
    num = run.agg(
        F.sum((F.col("n_a") + F.col("n_b")).cast(dec) * d * d).alias("t_num"),
        F.max("t_a").alias("t_a"),
        F.max("t_b").alias("t_b"),
    )
    # literally mirrors the oracle's denominator expression tree
    t_stat = F.col("t_num").cast("double") / (
        (F.col("t_a") + F.col("t_b"))
        * F.lit(1.0)
        * (F.col("t_a") + F.col("t_b"))
        * F.col("t_a")
        * F.col("t_b")
    )
    return num.select(
        F.col("t_a").alias("n_a"),
        F.col("t_b").alias("n_b"),
        F.round(t_stat, 6).alias("cvm_t"),
        F.lit(0.461).alias("cvm_critical_05"),
        (t_stat > 0.461).alias("drifted"),
    )


@register(
    "anderson_darling_drift",
    oracle="""
        WITH b AS (
            SELECT CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS g,
                   CAST(FLOOR(value * 10) AS BIGINT) AS bucket
            FROM events WHERE event_type IN ('click', 'purchase')
        ),
        counts AS (
            SELECT bucket,
                   CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_a,
                   CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_b
            FROM b GROUP BY bucket
        ),
        run AS (
            SELECT bucket, n_a, n_b,
                   CAST(SUM(n_a) OVER (ORDER BY bucket) AS BIGINT) AS ca,
                   CAST(SUM(n_a + n_b) OVER (ORDER BY bucket) AS BIGINT) AS h,
                   CAST(SUM(n_a) OVER () AS BIGINT) AS t_a,
                   CAST(SUM(n_b) OVER () AS BIGINT) AS t_b
            FROM counts
        ),
        terms AS (
            -- Pettitt's discrete two-sample AD terms: the last bucket
            -- (H = N) contributes 0/0 and is excluded per the classic
            -- j = 1..N-1 sum. Each numerator is an exact HUGEINT; the
            -- per-bucket division is unavoidable (denominators vary),
            -- so the cross-bucket sum is a double over the BOUNDED
            -- grid, 6-dp rounded and margin-audited.
            SELECT CAST(n_a + n_b AS HUGEINT)
                       * (ca * (t_a + t_b) - t_a * h)
                       * (ca * (t_a + t_b) - t_a * h)
                       * 1.0 / (h * 1.0 * ((t_a + t_b) - h)) AS term,
                   t_a, t_b
            FROM run WHERE h < t_a + t_b
        )
        SELECT t_a AS n_a, t_b AS n_b,
               ROUND(SUM(term) / (t_a * 1.0 * t_b), 6) AS ad_a2,
               2.492 AS ad_critical_05,
               SUM(term) / (t_a * 1.0 * t_b) > 2.492 AS drifted
        FROM terms GROUP BY t_a, t_b
    """,
    doc=(
        "TWO-SAMPLE ANDERSON-DARLING drift test (quantized, Pettitt "
        "1976): the TAIL-WEIGHTED member completing the drift quartet "
        "— the 1/(H(N-H)) weight blows up near the distribution edges, "
        "so AD catches tail-only drifts (a new heavy tail of extreme "
        "values) that KS, CvM, and Wasserstein all under-weight; tail "
        "drift is exactly what degrades p99-sensitive consumers first. "
        "A^2 = (1/(n_a n_b)) sum_{H<N} t_k (N*A_k - n_a*H_k)^2 / "
        "(H_k (N - H_k)) on the same FLOOR(value*10) bucket grid as "
        "the KS/CvM twins; numerators are exact HUGEINTs, the "
        "per-bucket division is unavoidable (denominators vary), so "
        "the grid sum is a 6-dp-rounded double — margin-audited. The "
        "H = N terminal bucket is excluded per the classic j<N sum "
        "(0/0 otherwise), mirrored. Decision at the asymptotic "
        "alpha=0.05 critical value 2.492. Same bounded-grid plan as "
        "the siblings: nothing beyond the conditional-count aggregate "
        "is corpus-scale."
    ),
    tags=("sampling", "drift", "statistics", "quality"),
)
def anderson_darling_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    b = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("g"),
        F.floor(F.col("value") * 10).cast("bigint").alias("bucket"),
    )
    counts = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    run = counts.select(
        "bucket",
        "n_a",
        "n_b",
        F.sum("n_a").over(w_cum).cast("bigint").alias("ca"),
        F.sum(F.col("n_a") + F.col("n_b")).over(w_cum).cast("bigint").alias("h"),
        F.sum("n_a").over(w_all).cast("bigint").alias("t_a"),
        F.sum("n_b").over(w_all).cast("bigint").alias("t_b"),
    )
    dec = "decimal(38,0)"
    n_tot = F.col("t_a") + F.col("t_b")
    dnum = F.col("ca") * n_tot - F.col("t_a") * F.col("h")
    term = (
        (F.col("n_a") + F.col("n_b")).cast(dec) * dnum * dnum
    ).cast("double") / (F.col("h") * F.lit(1.0) * (n_tot - F.col("h")))
    terms = run.filter(F.col("h") < n_tot).select(
        term.alias("term"), "t_a", "t_b"
    )
    a2 = F.sum("term") / (F.col("t_a") * F.lit(1.0) * F.col("t_b"))
    return (
        terms.groupBy("t_a", "t_b")
        .agg(F.sum("term").alias("_s"))
        .select(
            F.col("t_a").alias("n_a"),
            F.col("t_b").alias("n_b"),
            F.round(F.col("_s") / (F.col("t_a") * F.lit(1.0) * F.col("t_b")), 6).alias(
                "ad_a2"
            ),
            F.lit(2.492).alias("ad_critical_05"),
            (
                F.col("_s") / (F.col("t_a") * F.lit(1.0) * F.col("t_b"))
                > 2.492
            ).alias("drifted"),
        )
    )


# ---------------------------------------------------------------------------
# Round-11 distribution closers: Lilliefors (one-sample KS against the
# FITTED normal — the composite-null member the two-sample drift suite
# lacks) and Mood's rank-based scale test (the nonparametric third leg of
# the equal-variance triple: Bartlett parametric / Brown-Forsythe robust /
# Mood rank).
# ---------------------------------------------------------------------------


@register(
    "lilliefors_normal_drift",
    oracle=f"""
        WITH c AS (
            SELECT event_type,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cent
            FROM events
        ),
        mom AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cent) AS BIGINT) AS s,
                   SUM(CAST(cent AS HUGEINT) * cent) AS ss
            FROM c GROUP BY event_type
        ),
        grid AS (
            SELECT event_type, cent, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM c GROUP BY event_type, cent
        ),
        cum AS (
            SELECT event_type, cent, cnt,
                   CAST(SUM(cnt) OVER (
                       PARTITION BY event_type ORDER BY cent
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cumc
            FROM grid
        ),
        gaps AS (
            SELECT g.event_type, m.n, m.s, m.ss,
                   CAST(m.n AS HUGEINT) * m.ss
                       - CAST(m.s AS HUGEINT) * m.s AS d2,
                   GREATEST(
                       ABS(CAST(g.cumc AS DOUBLE) / m.n
                           - (1.0 - {_normal_sf_signed_sql(
                               "CAST(g.cent * m.n - m.s AS DOUBLE)"
                               " / sqrt(CAST(CAST(m.n AS HUGEINT) * m.ss"
                               " - CAST(m.s AS HUGEINT) * m.s AS DOUBLE)"
                               " * m.n / (m.n - 1.0))")})),
                       ABS((1.0 - {_normal_sf_signed_sql(
                               "CAST(g.cent * m.n - m.s AS DOUBLE)"
                               " / sqrt(CAST(CAST(m.n AS HUGEINT) * m.ss"
                               " - CAST(m.s AS HUGEINT) * m.s AS DOUBLE)"
                               " * m.n / (m.n - 1.0))")})
                           - CAST(g.cumc - g.cnt AS DOUBLE) / m.n)
                   ) AS gap
            FROM cum g JOIN mom m USING (event_type)
            -- degenerate guard BEFORE the z division (Spark runs ANSI:
            -- a constant series would raise DIVIDE_BY_ZERO inside the
            -- expression, not merely produce an excludable row)
            WHERE m.n >= 4
              AND CAST(m.n AS HUGEINT) * m.ss
                  - CAST(m.s AS HUGEINT) * m.s > 0
        ),
        d AS (
            SELECT event_type, MAX(n) AS n, MAX(d2) AS d2,
                   MAX(gap) AS d_stat
            FROM gaps GROUP BY event_type
        )
        SELECT event_type, n AS n_events,
               ROUND(d_stat, 6) AS d_stat,
               ROUND(d_stat * (sqrt(CAST(n AS DOUBLE)) - 0.01
                               + 0.85 / sqrt(CAST(n AS DOUBLE))), 6)
                   AS d_modified,
               d_stat * (sqrt(CAST(n AS DOUBLE)) - 0.01
                         + 0.85 / sqrt(CAST(n AS DOUBLE))) > 0.895
                   AS reject_5pct
        FROM d
        WHERE n >= 4 AND d2 > 0
    """,
    doc=(
        "LILLIEFORS TEST per event_type: one-sample KS distance between "
        "the empirical value CDF and the NORMAL FITTED to the same data "
        "— the composite-null member the drift suite lacks (ks_drift "
        "compares two samples; Jarque-Bera tests normality through "
        "moments and misses shape deviations with matching "
        "skew/kurtosis; Lilliefors tests the whole CDF against "
        "N(mean, s) with the parameter-estimation penalty folded into "
        "Stephens' modified statistic D*(sqrt(n) - 0.01 + 0.85/sqrt(n)) "
        "vs the 0.895 5%-critical constant — both literals, no table). "
        "D is the sup over the integer-cent grid of the two one-sided "
        "gaps (F_emp vs Phi at and just below each atom); the z "
        "argument is assembled drift-free as (cent*n - s) / "
        "sqrt((n*ss - s^2) * n/(n-1)) — exact HUGEINT/DECIMAL(38,0) "
        "integers into ONE division — and Phi is the shared A&S "
        "26.2.17 polynomial both engines evaluate identically. "
        "Constant series (d2 = 0) and n < 4 excluded, mirrored. Plan: "
        "one corpus scan feeding the moment aggregate and the bounded "
        "cent grid; ordered windows on the grid only. The per-type "
        "max-gap compares identical doubles, so the hash is stable."
    ),
    tags=("sampling", "drift", "statistics", "quality"),
)
def lilliefors_normal_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from weather_stream_processor_spark.operators._normal_tail import (
        normal_sf_col,
    )

    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias(
            "cent"
        ),
    )
    dec = "decimal(38,0)"
    from weather_stream_processor_spark.plans.caching import persisted_result

    def _build(c_c: DataFrame) -> DataFrame:
        mom = c_c.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("cent").cast("bigint").alias("s"),
            F.sum(F.col("cent").cast(dec) * F.col("cent")).alias("ss"),
        )
        grid = c_c.groupBy("event_type", "cent").agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        )
        w_cum = (
            Window.partitionBy("event_type")
            .orderBy("cent")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = grid.select(
            "event_type",
            "cent",
            "cnt",
            F.sum("cnt").over(w_cum).cast("bigint").alias("cumc"),
        )
        d2 = F.col("n").cast(dec) * F.col("ss") - F.col("s").cast(
            dec
        ) * F.col("s")
        # degenerate guard BEFORE the z division (ANSI divide-by-zero)
        j = cum.join(mom, "event_type").filter(
            (F.col("n") >= 4) & (d2 > 0)
        )
        z = (F.col("cent") * F.col("n") - F.col("s")).cast(
            "double"
        ) / F.sqrt(
            d2.cast("double") * F.col("n") / (F.col("n") - F.lit(1.0))
        )
        phi = F.when(z >= 0, F.lit(1.0) - normal_sf_col(z)).otherwise(
            F.lit(1.0) - (F.lit(1.0) - normal_sf_col(-z))
        )
        gap = F.greatest(
            F.abs(F.col("cumc").cast("double") / F.col("n") - phi),
            F.abs(
                phi
                - (F.col("cumc") - F.col("cnt")).cast("double") / F.col("n")
            ),
        )
        gaps = j.select(
            "event_type", "n", d2.alias("d2"), gap.alias("gap")
        )
        d = gaps.groupBy("event_type").agg(
            F.max("n").alias("n"),
            F.max("d2").alias("d2"),
            F.max("gap").alias("d_stat"),
        )
        nd = F.col("n").cast("double")
        dmod = F.col("d_stat") * (
            F.sqrt(nd) - F.lit(0.01) + F.lit(0.85) / F.sqrt(nd)
        )
        return d.filter((F.col("n") >= 4) & (F.col("d2") > 0)).select(
            "event_type",
            F.col("n").alias("n_events"),
            F.round("d_stat", 6).alias("d_stat"),
            F.round(dmod, 6).alias("d_modified"),
            (dmod > F.lit(0.895)).alias("reject_5pct"),
        )

    return persisted_result(c, _build)


@register(
    "mood_scale_rank_test",
    oracle=f"""
        WITH b AS (
            SELECT CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS g,
                   CAST(floor(value * 10) AS BIGINT) AS bucket
            FROM events WHERE event_type IN ('click', 'view')
        ),
        counts AS (
            SELECT bucket,
                   CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_a,
                   CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_b
            FROM b GROUP BY bucket
        ),
        run AS (
            SELECT bucket, n_a, n_b, n_a + n_b AS t,
                   CAST(COALESCE(SUM(n_a + n_b) OVER (
                       ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS below,
                   CAST(SUM(n_a) OVER () AS BIGINT) AS ta,
                   CAST(SUM(n_b) OVER () AS BIGINT) AS tb,
                   CAST(SUM(n_a + n_b) OVER () AS BIGINT) AS nn
            FROM counts
        ),
        scores AS (
            -- u = 2*midrank - (N+1) is an EXACT integer per bucket:
            -- 2*(below + (t+1)/2) - (N+1) = 2*below + t - N
            SELECT n_a, n_b, t, ta, tb, nn,
                   2 * below + t - nn AS u
            FROM run
        ),
        agg AS (
            SELECT MAX(ta) AS ta, MAX(tb) AS tb, MAX(nn) AS nn,
                   SUM(CAST(n_a AS HUGEINT) * u * u) AS t4,
                   SUM(CAST(t AS HUGEINT) * u * u) AS s1,
                   SUM(CAST(t AS HUGEINT) * u * u * u * u) AS s2
            FROM scores
        )
        SELECT ta AS n_a, tb AS n_b,
               CAST(t4 AS BIGINT) AS t4_stat,
               ROUND(CAST(CAST(nn AS HUGEINT) * t4 AS DOUBLE)
                     / CAST(CAST(ta AS HUGEINT) * s1 AS DOUBLE), 6)
                   AS dispersion_ratio,
               ROUND(CAST(CAST(nn AS HUGEINT) * t4
                          - CAST(ta AS HUGEINT) * s1 AS DOUBLE)
                     / sqrt(CAST(ta AS DOUBLE) * tb
                            * CAST(CAST(nn AS HUGEINT) * s2
                                   - s1 * s1 AS DOUBLE)
                            / (nn - 1.0)), 6) AS z_score,
               ROUND(2.0 * {_normal_sf_sql(
                   "abs(CAST(CAST(nn AS HUGEINT) * t4"
                   " - CAST(ta AS HUGEINT) * s1 AS DOUBLE)"
                   " / sqrt(CAST(ta AS DOUBLE) * tb"
                   " * CAST(CAST(nn AS HUGEINT) * s2"
                   " - s1 * s1 AS DOUBLE)"
                   " / (nn - 1.0)))")}, 6) AS p_value
        FROM agg
        WHERE ta >= 2 AND tb >= 2 AND nn * s2 > s1 * s1
    """,
    doc=(
        "MOOD'S RANK-BASED SCALE TEST between the click and view value "
        "distributions — the NONPARAMETRIC third leg of the "
        "equal-dispersion triple (bartlett_variance_test is the "
        "parametric UMP-near-normal leg, brown_forsythe the "
        "median-robust ANOVA leg; Mood needs no moments at all: under "
        "H0 the squared centered midranks of one sample are an "
        "exchangeable draw). T = sum over the first sample of "
        "(r_i - (N+1)/2)^2, computed x4-lifted so every score is the "
        "EXACT integer u^2 with u = 2*below + t - N from the same "
        "FLOOR(value*10) bucket grid as mann_whitney (midranks make "
        "the statistic tie-safe); mean and variance use the general "
        "linear-rank-statistic forms E = n_a*S1/N and Var = "
        "n_a*n_b*(N*S2 - S1^2)/(N^2*(N-1)) with S1 = sum t*u^2, S2 = "
        "sum t*u^4 — all HUGEINT/DECIMAL(38,0) exact (u^4*N bounds "
        "exactness at ~3e7 rows/pair, the CvM documentation "
        "convention; past that, subsample or widen to a 128-bit "
        "accumulator), z assembled from ONE double division. Plan: "
        "two conditional counts to the bounded bucket grid, ordered "
        "windows over that grid only — the mann_whitney plan shape "
        "with quadratic scores."
    ),
    tags=("sampling", "drift", "statistics", "quality"),
)
def mood_scale_rank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    b = ev.select(
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("g"),
        F.floor(F.col("value") * 10).cast("bigint").alias("bucket"),
    )
    counts = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    w_below = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = F.col("n_a") + F.col("n_b")
    run = counts.select(
        "bucket",
        "n_a",
        "n_b",
        t.alias("t"),
        F.coalesce(F.sum(t).over(w_below), F.lit(0))
        .cast("bigint")
        .alias("below"),
        F.sum("n_a").over(w_all).cast("bigint").alias("ta"),
        F.sum("n_b").over(w_all).cast("bigint").alias("tb"),
        F.sum(t).over(w_all).cast("bigint").alias("nn"),
    )
    scores = run.select(
        "n_a",
        "n_b",
        "t",
        "ta",
        "tb",
        "nn",
        (2 * F.col("below") + F.col("t") - F.col("nn")).alias("u"),
    )
    dec = "decimal(38,0)"
    u2 = F.col("u") * F.col("u")
    agg = scores.agg(
        F.max("ta").alias("ta"),
        F.max("tb").alias("tb"),
        F.max("nn").alias("nn"),
        F.sum(F.col("n_a").cast(dec) * u2).alias("t4"),
        F.sum(F.col("t").cast(dec) * u2).alias("s1"),
        F.sum(F.col("t").cast(dec) * u2 * u2).alias("s2"),
    )
    num = (
        F.col("nn").cast(dec) * F.col("t4")
        - F.col("ta").cast(dec) * F.col("s1")
    ).cast("double")
    den = F.sqrt(
        F.col("ta").cast("double")
        * F.col("tb")
        * (F.col("nn").cast(dec) * F.col("s2") - F.col("s1") * F.col("s1"))
        .cast("double")
        / (F.col("nn") - F.lit(1.0))
    )
    z = num / den
    az = F.abs(z)
    tt = F.lit(1.0) / (F.lit(1.0) + F.lit(_AS_P) * az)
    poly = tt * (
        F.lit(_AS_B[0])
        + tt
        * (
            F.lit(_AS_B[1])
            + tt
            * (F.lit(_AS_B[2]) + tt * (F.lit(_AS_B[3]) + tt * F.lit(_AS_B[4])))
        )
    )
    sf = (
        F.exp(-az * az / F.lit(2.0))
        / F.sqrt(F.lit(2.0) * F.lit(math.pi))
        * poly
    )
    return agg.filter(
        (F.col("ta") >= 2)
        & (F.col("tb") >= 2)
        & (
            F.col("nn").cast(dec) * F.col("s2")
            > F.col("s1") * F.col("s1")
        )
    ).select(
        F.col("ta").alias("n_a"),
        F.col("tb").alias("n_b"),
        F.col("t4").cast("bigint").alias("t4_stat"),
        F.round(
            (F.col("nn").cast(dec) * F.col("t4")).cast("double")
            / (F.col("ta").cast(dec) * F.col("s1")).cast("double"),
            6,
        ).alias("dispersion_ratio"),
        F.round(z, 6).alias("z_score"),
        F.round(F.lit(2.0) * sf, 6).alias("p_value"),
    )


def _hilbert_stage_sql(prev: str, s: int) -> str:
    """One unrolled stage of the Hilbert xy2d walk (side s), as a CTE
    body over columns (xb, yb, d [, carried cols]). Integer CASE
    arithmetic only — no xor function, no floats — so both engines
    compute identical values by construction."""
    rx = f"(CASE WHEN (xb & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (yb & {s}) > 0 THEN 1 ELSE 0 END)"
    inc = (
        f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
        f"WHEN {rx} = 0 AND {ry} = 1 THEN 1 "
        f"WHEN {rx} = 1 AND {ry} = 1 THEN 2 ELSE 3 END)"
    )
    x_new = (
        f"(CASE WHEN {ry} = 1 THEN xb "
        f"WHEN {rx} = 1 THEN {s} - 1 - yb ELSE yb END)"
    )
    y_new = (
        f"(CASE WHEN {ry} = 1 THEN yb "
        f"WHEN {rx} = 1 THEN {s} - 1 - xb ELSE xb END)"
    )
    return (
        f"SELECT x0, y0, n_orders, d + {s * s} * {inc} AS d, "
        f"{x_new} AS xb, {y_new} AS yb FROM {prev}"
    )


def _hilbert_col(x0, y0):
    """Mirrored Spark form of the unrolled Hilbert walk: same CASE
    arithmetic, same stage order."""
    x, y, d = x0, y0, F.lit(0)
    for s in (8, 4, 2, 1):
        rx = F.when((x.bitwiseAND(F.lit(s))) > 0, 1).otherwise(0)
        ry = F.when((y.bitwiseAND(F.lit(s))) > 0, 1).otherwise(0)
        inc = (
            F.when((rx == 0) & (ry == 0), 0)
            .when((rx == 0) & (ry == 1), 1)
            .when((rx == 1) & (ry == 1), 2)
            .otherwise(3)
        )
        d = d + F.lit(s * s) * inc
        x_new = (
            F.when(ry == 1, x)
            .when(rx == 1, F.lit(s) - 1 - y)
            .otherwise(y)
        )
        y_new = (
            F.when(ry == 1, y)
            .when(rx == 1, F.lit(s) - 1 - x)
            .otherwise(x)
        )
        x, y = x_new, y_new
    return d


def _hilbert_oracle() -> str:
    stages = []
    prev = "h0"
    for i, s in enumerate((8, 4, 2, 1), start=1):
        stages.append(f"h{i} AS ({_hilbert_stage_sql(prev, s)})")
        prev = f"h{i}"
    chain = ",\n        ".join(stages)
    return f"""
        WITH cells AS (
            SELECT CAST(o_custkey % 16 AS BIGINT) AS x0,
                   CAST((epoch_ms(o_orderdate) // 86400000 // 180) % 16
                        AS BIGINT) AS y0,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY 1, 2
        ),
        h0 AS (SELECT x0, y0, n_orders, 0 AS d, x0 AS xb, y0 AS yb
               FROM cells),
        {chain},
        keys AS (
            SELECT x0, y0, n_orders, d AS hcell,
                   {_interleave_duckdb('x0', 'y0')} AS zcell
            FROM h4
        ),
        curves AS (
            SELECT CASE WHEN tag = 0 THEN 'zorder' ELSE 'hilbert' END
                       AS curve,
                   CASE WHEN tag = 0 THEN zcell ELSE hcell END AS k,
                   x0, y0, n_orders
            FROM keys CROSS JOIN (SELECT unnest([0, 1]) AS tag)
        ),
        adj AS (
            SELECT curve, n_orders,
                   ABS(x0 - LAG(x0) OVER w) + ABS(y0 - LAG(y0) OVER w)
                       AS l1
            FROM curves
            WINDOW w AS (PARTITION BY curve ORDER BY k)
        )
        SELECT curve,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               CAST(SUM(n_orders) AS BIGINT) AS total_orders,
               ROUND(CAST(SUM(l1) AS DOUBLE) / COUNT(l1), 6)
                   AS mean_adjacent_l1,
               CAST(MAX(l1) AS BIGINT) AS max_adjacent_l1
        FROM adj GROUP BY curve
    """


@register(
    "hilbert_vs_zorder_locality",
    oracle=_hilbert_oracle(),
    doc=(
        "HILBERT vs Z-ORDER LAYOUT LOCALITY AUDIT on the same 16x16 "
        "(customer-bucket x half-year) cell grid as zorder_cell_stats: "
        "for each curve, walk the occupied cells in KEY order and "
        "measure the L1 grid distance between consecutive cells — the "
        "metric that decides which space-filling curve to cluster a "
        "100 TB table by. A perfect Hilbert walk moves exactly 1 cell "
        "per step (adjacent keys are ALWAYS grid-adjacent, so a "
        "contiguous key-range scan touches a compact blob and parquet "
        "min/max zones stay tight in both dimensions), while Z-order "
        "takes 2^k-sized jumps at bit boundaries (mean ~1.88, max 16 "
        "on the full grid) — cheaper to compute, worse tail locality; "
        "this operator puts the actual numbers for the actual data "
        "side by side. The Hilbert index is the standard xy2d walk "
        "UNROLLED into 4 integer CASE stages (reflect-then-swap "
        "rotation, no xor builtin, no floats — both engines compute "
        "identical integers by construction; the adjacency-1 property "
        "of the variant is pinned in tests). Plan: ONE corpus scan to "
        "the <=256-row cell grid; the two curve walks explode from "
        "that grid (no second scan) and the windows partition by "
        "curve. mean_adjacent_l1 is one division of exact integers."
    ),
    tags=("sampling", "layout", "scale"),
)
def hilbert_vs_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    x0 = (F.col("o_custkey") % 16).cast("bigint")
    y0 = (
        F.expr("unix_micros(o_orderdate) div 86400000000 div 180") % 16
    ).cast("bigint")
    cells = (
        orders.select(x0.alias("x0"), y0.alias("y0"))
        .groupBy("x0", "y0")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )
    zc = F.lit(0)
    for i in range(4):
        zc = zc + F.shiftright(F.col("x0").cast("int"), i).bitwiseAND(1) * (
            1 << (2 * i)
        )
        zc = zc + F.shiftright(F.col("y0").cast("int"), i).bitwiseAND(1) * (
            1 << (2 * i + 1)
        )
    keys = cells.select(
        "x0",
        "y0",
        "n_orders",
        _hilbert_col(F.col("x0"), F.col("y0")).alias("hcell"),
        zc.cast("bigint").alias("zcell"),
    )
    curves = keys.select(
        "x0",
        "y0",
        "n_orders",
        F.explode(
            F.array(
                F.struct(
                    F.lit("zorder").alias("curve"),
                    F.col("zcell").alias("k"),
                ),
                F.struct(
                    F.lit("hilbert").alias("curve"),
                    F.col("hcell").alias("k"),
                ),
            )
        ).alias("c"),
    ).select("x0", "y0", "n_orders", F.col("c.curve").alias("curve"), F.col("c.k").alias("k"))
    w = Window.partitionBy("curve").orderBy("k")
    adj = curves.select(
        "curve",
        "n_orders",
        (
            F.abs(F.col("x0") - F.lag("x0").over(w))
            + F.abs(F.col("y0") - F.lag("y0").over(w))
        ).alias("l1"),
    )
    return adj.groupBy("curve").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("n_orders").cast("bigint").alias("total_orders"),
        F.round(
            F.sum("l1").cast("double") / F.count("l1"), 6
        ).alias("mean_adjacent_l1"),
        F.max("l1").cast("bigint").alias("max_adjacent_l1"),
    )


@register(
    "eb_rate_shrinkage",
    oracle="""
        WITH src AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                        AS BIGINT) AS k
            FROM documents GROUP BY source
        ),
        tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS nn,
                   CAST(SUM(k) AS BIGINT) AS kk,
                   CAST(COUNT(*) AS BIGINT) AS ng
            FROM src
        ),
        lifted AS (
            -- per-source squared deviation and reciprocal, dyadically
            -- lifted (x1e12) so the cross-source sums are ORDER-FREE
            -- exact integers (K-row double sums are the known
            -- summation-order hash hazard)
            SELECT s.source, s.n, s.k, t.nn, t.kk, t.ng,
                   CAST(FLOOR(
                       (CAST(s.k AS DOUBLE) / s.n
                        - CAST(t.kk AS DOUBLE) / t.nn)
                       * (CAST(s.k AS DOUBLE) / s.n
                          - CAST(t.kk AS DOUBLE) / t.nn)
                       * 1000000000000.0 + 0.5) AS BIGINT) AS dev2_q,
                   CAST(FLOOR(1000000000000.0 / s.n + 0.5) AS BIGINT)
                       AS inv_q
            FROM src s CROSS JOIN tot t
        ),
        hyper AS (
            SELECT MAX(nn) AS nn, MAX(kk) AS kk, MAX(ng) AS ng,
                   CAST(SUM(dev2_q) AS BIGINT) AS sdev2,
                   CAST(SUM(inv_q) AS BIGINT) AS sinv
            FROM lifted
        ),
        tau AS (
            SELECT nn, kk, ng, sdev2, sinv,
                   CAST(kk AS DOUBLE) / nn AS pbar,
                   GREATEST(0.0,
                       CAST(sdev2 AS DOUBLE) / 1000000000000.0 / (ng - 1)
                       - (CAST(kk AS DOUBLE) / nn)
                         * (1.0 - CAST(kk AS DOUBLE) / nn)
                         / ng
                         * (CAST(sinv AS DOUBLE) / 1000000000000.0))
                       AS tau2
            FROM hyper
        )
        SELECT s.source,
               s.n AS n_docs,
               s.k AS en_docs,
               ROUND(CAST(s.k AS DOUBLE) / s.n, 6) AS raw_rate,
               ROUND(t.pbar, 6) AS pooled_rate,
               ROUND(t.tau2, 8) AS tau2,
               ROUND(t.tau2
                     / (t.tau2 + t.pbar * (1.0 - t.pbar) / s.n), 6)
                   AS shrinkage_weight,
               ROUND(t.pbar
                     + t.tau2 / (t.tau2 + t.pbar * (1.0 - t.pbar) / s.n)
                       * (CAST(s.k AS DOUBLE) / s.n - t.pbar), 6)
                   AS shrunk_rate
        FROM src s CROSS JOIN tau t
        WHERE t.kk > 0 AND t.kk < t.nn AND t.ng >= 2
    """,
    doc=(
        "EMPIRICAL-BAYES RATE SHRINKAGE (James-Stein / random-effects "
        "MoM) of the per-source English share: the partial-pooling "
        "estimator every per-segment league table should use instead "
        "of raw rates — a 10-doc source's 0.9 is mostly noise, a "
        "10k-doc source's 0.9 is signal, and the EB weight B_i = "
        "tau^2/(tau^2 + pbar(1-pbar)/n_i) encodes exactly that (B -> 0 "
        "pools completely, B -> 1 trusts the raw rate; the "
        "source_quality_league ranks raw, this REPAIRS). tau^2 is the "
        "DerSimonian-Laird-flavored method-of-moments between-source "
        "variance, max(0, between-var - mean sampling var), clamped at "
        "zero so complete pooling is the degenerate answer rather than "
        "a negative variance. Determinism: the two cross-source sums "
        "(squared deviations, reciprocals) are dyadically 1e12-lifted "
        "per source before summation so they are ORDER-FREE exact "
        "integers — the K-row double sum is the known summation-order "
        "hash hazard; everything after is per-row arithmetic on "
        "identical doubles. Degenerate pools (all-en, no-en, single "
        "source) excluded, mirrored. Plan: one corpus scan to the "
        "|sources| grid; 1-row hyperparameter broadcast back."
    ),
    tags=("sampling", "statistics", "quality", "llm"),
)
def eb_rate_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("bigint")
        .alias("k"),
    )
    from weather_stream_processor_spark.plans.caching import persisted_result

    def _build(src_c: DataFrame) -> DataFrame:
        tot = src_c.agg(
            F.sum("n").cast("bigint").alias("nn"),
            F.sum("k").cast("bigint").alias("kk"),
            F.count(F.lit(1)).cast("bigint").alias("ng"),
        )
        j = src_c.crossJoin(F.broadcast(tot))
        r = F.col("k").cast("double") / F.col("n")
        pbar = F.col("kk").cast("double") / F.col("nn")
        lifted = j.select(
            "source",
            "n",
            "k",
            "nn",
            "kk",
            "ng",
            F.floor((r - pbar) * (r - pbar) * F.lit(1e12) + F.lit(0.5))
            .cast("bigint")
            .alias("dev2_q"),
            F.floor(F.lit(1e12) / F.col("n") + F.lit(0.5))
            .cast("bigint")
            .alias("inv_q"),
        )
        hyper = lifted.agg(
            F.max("nn").alias("nn"),
            F.max("kk").alias("kk"),
            F.max("ng").alias("ng"),
            F.sum("dev2_q").cast("bigint").alias("sdev2"),
            F.sum("inv_q").cast("bigint").alias("sinv"),
        )
        pbar2 = F.col("kk").cast("double") / F.col("nn")
        tau2 = F.greatest(
            F.lit(0.0),
            F.col("sdev2").cast("double")
            / F.lit(1e12)
            / (F.col("ng") - 1)
            - pbar2
            * (F.lit(1.0) - pbar2)
            / F.col("ng")
            * (F.col("sinv").cast("double") / F.lit(1e12)),
        )
        tau = hyper.select(
            "nn",
            "kk",
            "ng",
            pbar2.alias("pbar"),
            tau2.alias("tau2"),
        )
        out = src_c.crossJoin(F.broadcast(tau))
        r2 = F.col("k").cast("double") / F.col("n")
        b = F.col("tau2") / (
            F.col("tau2")
            + F.col("pbar") * (F.lit(1.0) - F.col("pbar")) / F.col("n")
        )
        return out.filter(
            (F.col("kk") > 0) & (F.col("kk") < F.col("nn")) & (F.col("ng") >= 2)
        ).select(
            "source",
            F.col("n").alias("n_docs"),
            F.col("k").alias("en_docs"),
            F.round(r2, 6).alias("raw_rate"),
            F.round(F.col("pbar"), 6).alias("pooled_rate"),
            F.round(F.col("tau2"), 8).alias("tau2"),
            F.round(b, 6).alias("shrinkage_weight"),
            F.round(
                F.col("pbar") + b * (r2 - F.col("pbar")), 6
            ).alias("shrunk_rate"),
        )

    return persisted_result(src, _build)
