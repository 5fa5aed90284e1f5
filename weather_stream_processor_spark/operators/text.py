"""Text analysis operators (driver mandate: LLM-data-pipeline text).

Token counting, term frequencies, TF-IDF, quality scoring, language-ID
heuristics, and document fingerprinting — all as Column expressions over
the `documents` table. No UDFs anywhere: tokenization is `split`, set ops
are array HOFs, and the fingerprint uses portable integer arithmetic so
the DuckDB oracle computes bit-identical values.

Scale shape: everything is either per-row projection (embarrassingly
parallel) or one explode + one hash aggregation; the only global state is
the document count / document frequencies in TF-IDF, which are tiny
aggregates broadcast back into the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from weather_stream_processor_spark.functions import tokens
from weather_stream_processor_spark.registry import register
from weather_stream_processor_spark.sources import load_table, spread

STOPWORDS = ("the", "a", "of", "and", "to", "in")


@register(
    "token_counts",
    oracle="""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique_tokens,
               n_chars,
               ROUND(n_chars * 1.0 / len(string_split(text, ' ')), 6) AS chars_per_token
        FROM documents
    """,
    doc=(
        "Token counting per document: total + unique whitespace tokens, "
        "chars-per-token. Pure projection — no shuffle at any scale."
    ),
    tags=("text", "llm"),
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique_tokens"),
        "n_chars",
        F.round(F.col("n_chars") / F.size(toks), 6).alias("chars_per_token"),
    )


@register(
    "term_frequency_top20",
    oracle="""
        SELECT tok AS term, COUNT(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY tok
        ORDER BY n DESC, term
        LIMIT 20
    """,
    doc=(
        "Corpus term frequencies, top 20 (count tie-broken on the term). "
        "explode -> hash agg; map-side partial aggregation keeps the "
        "shuffle at |vocabulary| not |tokens|."
    ),
    tags=("text", "llm"),
)
def term_frequency_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(20)
    )


@register(
    "tfidf_top_term_per_doc",
    oracle="""
        WITH tf AS (
            SELECT doc_id, tok AS term, COUNT(*) AS tf
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
            GROUP BY doc_id, tok
        ),
        df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   ROUND(tf.tf * ln(n.n_docs * 1.0 / df.df), 6) AS tfidf,
                   ROW_NUMBER() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY ROUND(tf.tf * ln(n.n_docs * 1.0 / df.df), 6) DESC, tf.term
                   ) AS rn
            FROM tf JOIN df USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tfidf FROM scored WHERE rn = 1
    """,
    doc=(
        "TF-IDF (tf * ln(N/df)) with the most characteristic term per "
        "document. df and N are small aggregates joined back broadcast; "
        "score rounded to 6dp before the per-doc argmax so ranking is "
        "engine-stable."
    ),
    tags=("text", "llm", "headline"),
)
def tfidf_top_term_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        spread(docs, "doc_id")
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # tf rows are already distinct (doc_id, term) pairs, so document
    # frequency is a plain count — no distinct aggregation needed; the tf
    # aggregate below it is an identical subtree on both sides of the join,
    # which ReuseExchange computes once
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()  # scalar; embedded as a literal in the plan
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "term", "tfidf")
    )


@register(
    "quality_scores",
    oracle=f"""
        WITH feats AS (
            SELECT doc_id, lang, n_chars,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(len(list_filter(string_split(text, ' '),
                                        t -> list_contains({list(STOPWORDS)}, t)))
                        AS BIGINT) AS n_stopwords,
                   CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique
            FROM documents
        )
        SELECT doc_id, lang, n_tokens,
               ROUND(n_stopwords * 1.0 / n_tokens, 6) AS stopword_ratio,
               ROUND(n_unique * 1.0 / n_tokens, 6) AS unique_ratio,
               ROUND(LEAST(n_tokens / 50.0, 1.0) * 0.4
                     + (n_stopwords * 1.0 / n_tokens) * 0.3
                     + (n_unique * 1.0 / n_tokens) * 0.3, 6) AS quality_score
        FROM feats
    """,
    doc=(
        "Heuristic document quality score: length saturation, stopword "
        "ratio (fluency proxy), unique-token ratio (repetition penalty) — "
        "the standard pre-training corpus filter features, as one "
        "projection pass."
    ),
    tags=("text", "llm", "headline"),
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    feats = docs.select(
        "doc_id",
        "lang",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        .cast("bigint")
        .alias("n_stopwords"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique"),
    )
    stop_ratio = F.col("n_stopwords") / F.col("n_tokens")
    uniq_ratio = F.col("n_unique") / F.col("n_tokens")
    return feats.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(uniq_ratio, 6).alias("unique_ratio"),
        F.round(
            F.least(F.col("n_tokens") / 50.0, F.lit(1.0)) * 0.4
            + stop_ratio * 0.3
            + uniq_ratio * 0.3,
            6,
        ).alias("quality_score"),
    )


@register(
    "lang_id_heuristic",
    oracle=f"""
        SELECT lang,
               CASE
                 WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
                 WHEN len(list_filter(string_split(text, ' '),
                                      t -> list_contains({list(STOPWORDS)}, t)))
                      * 1.0 / len(string_split(text, ' ')) >= 0.05 THEN 'en'
                 ELSE 'unknown'
               END AS predicted_lang,
               COUNT(*) AS n_docs
        FROM documents
        GROUP BY 1, 2
    """,
    doc=(
        "Language-ID heuristic: CJK-codepoint detection, then English "
        "stopword density, else unknown — a cheap n-gram-style classifier "
        "as pure regex/array expressions. (The fixture text is synthetic "
        "English word-soup with random lang labels, so the *accuracy* is "
        "meaningless by construction — the oracle checks the classifier's "
        "determinism and plumbing, which is what transfers to a real "
        "fastText-style scorer via pandas_udf.)"
    ),
    tags=("text", "llm"),
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_density = F.size(F.filter(toks, lambda t: F.array_contains(sw, t))) / F.size(toks)
    predicted = (
        F.when(F.col("text").rlike("[一-鿿]"), "zh")
        .when(stop_density >= 0.05, "en")
        .otherwise("unknown")
    )
    return (
        docs.select("lang", predicted.alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "doc_fingerprints",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS tok,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
            FROM documents
        )
        SELECT doc_id,
               CAST(SUM((ascii(tok) * 31 + length(tok)) * pos) % 1000000007
                    AS BIGINT) AS fingerprint
        FROM toks
        GROUP BY doc_id
    """,
    doc=(
        "Order-sensitive document fingerprint: position-weighted polynomial "
        "over per-token codes, mod 1e9+7. Deliberately built from portable "
        "integer ops (ascii/length/position) rather than an engine hash so "
        "the oracle verifies bit-identical values; swap the token code for "
        "xxhash64 in production for better dispersion (same plan shape: "
        "posexplode -> one hash aggregation)."
    ),
    tags=("text", "llm", "fingerprint"),
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    exploded = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos0", "tok")
    )
    code = (F.ascii("tok") * 31 + F.length("tok")).cast("bigint") * (F.col("pos0") + 1)
    return exploded.groupBy("doc_id").agg((F.sum(code) % 1000000007).alias("fingerprint"))


# GPT-2-style pretokenizer, restricted to ASCII classes both Java regex
# (Spark) and RE2 (DuckDB) interpret identically: a token is an optional
# leading space + a letter run, digit run, or punctuation run.
BPE_PRETOKEN_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


@register(
    "bpe_token_counts",
    oracle=f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{BPE_PRETOKEN_RE}')) AS BIGINT)
                   AS n_bpe_tokens,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
               ROUND(len(regexp_extract_all(text, '{BPE_PRETOKEN_RE}'))
                     * 1.0 / len(string_split(text, ' ')), 6) AS bpe_per_word
        FROM documents
    """,
    doc=(
        "BPE-ish token counting (mandate: 'whitespace + a BPE-ish regex'): "
        "a GPT-2-style pretokenizer regex (space-prefixed letter/digit/"
        "punctuation runs) next to the whitespace count, plus the "
        "tokens-per-word fertility ratio used for corpus budgeting. Pure "
        "projection — regexp_extract_all is codegen'd; no shuffle at any "
        "scale. A real BPE vocab merge step would follow as a pandas_udf "
        "over these pretokens."
    ),
    tags=("text", "llm", "tokenizer"),
)
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all("text", F.lit(BPE_PRETOKEN_RE), 0)
    ws = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(bpe).cast("bigint").alias("n_bpe_tokens"),
        F.size(ws).cast("bigint").alias("n_ws_tokens"),
        F.round(F.size(bpe) / F.size(ws), 6).alias("bpe_per_word"),
    )


@register(
    "pii_scrub",
    oracle="""
        WITH augmented AS (
            -- synthesize a contact block so the scrub has real matches
            -- (the fixture corpus is clean word-soup by construction)
            SELECT doc_id,
                   text || ' contact: user' || doc_id ||
                   '@example.com or 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   AS raw
            FROM documents WHERE doc_id < 200
        )
        SELECT doc_id,
               len(regexp_extract_all(raw, '[a-z0-9._]+@[a-z0-9.]+')) AS n_emails,
               len(regexp_extract_all(raw, '[0-9]{3}-[0-9]{4}')) AS n_phones,
               ROUND(len(raw) * 1.0, 1) AS raw_len,
               md5(regexp_replace(regexp_replace(raw,
                       '[a-z0-9._]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                       '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS scrubbed_md5
        FROM augmented
    """,
    doc=(
        "PII SCRUB: regex masking of emails/phone patterns with "
        "per-document match accounting (regexp_count) — the redaction "
        "pass a training corpus runs before packing. Pure codegen'd "
        "string expressions, map-side only, zero shuffles; the scrubbed "
        "text is md5'd for the cross-engine check so the oracle verifies "
        "byte-identical redaction output, not just counts. Patterns kept "
        "to the regex subset Java and RE2 dialects share; a production "
        "scrubber swaps in a curated pattern table (broadcast) and/or an "
        "NER pandas_udf for names — same plumbing."
    ),
    tags=("text", "llm", "pii"),
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    raw = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    email = "[a-z0-9._]+@[a-z0-9.]+"
    phone = "[0-9]{3}-[0-9]{4}"
    scrubbed = F.regexp_replace(
        F.regexp_replace(raw, email, "<EMAIL>"), phone, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(raw, F.lit(email)).alias("n_emails"),
        F.regexp_count(raw, F.lit(phone)).alias("n_phones"),
        F.round(F.length(raw) * 1.0, 1).alias("raw_len"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


@register(
    "repetition_quality_filter",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t FROM documents
        ),
        g AS (
            SELECT doc_id,
                   [array_to_string(t[i:i+2], ' ')
                    FOR i IN range(1, len(t) - 1)] AS grams
            FROM toks
        )
        SELECT doc_id,
               CAST(len(grams) AS BIGINT) AS n_grams,
               CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_grams,
               ROUND(1.0 - len(list_distinct(grams)) * 1.0 / len(grams), 6)
                   AS rep_fraction,
               (1.0 - len(list_distinct(grams)) * 1.0 / len(grams)) <= 0.2
                   AS keep
        FROM g
    """,
    doc=(
        "Within-document REPETITION filter (the Gopher-rules family): the "
        "fraction of word 3-grams that are repeats of an earlier 3-gram in "
        "the same document; docs above 20% repetition are flagged for "
        "drop. Boilerplate, spam and degenerate generations score high "
        "while natural prose stays near zero. Entirely per-row array "
        "expressions (no explode, no shuffle, no UDF) — the cheapest "
        "quality gate in the stack, run it before anything pairwise."
    ),
    tags=("text", "llm", "quality"),
)
def repetition_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_stream_processor_spark.functions import word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    grams = word_ngrams(tokens(F.col("text")))
    n_grams = F.size(grams).cast("bigint")
    n_distinct = F.size(F.array_distinct(grams)).cast("bigint")
    rep = 1.0 - n_distinct / n_grams
    return docs.select(
        "doc_id",
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct_grams"),
        F.round(rep, 6).alias("rep_fraction"),
        (rep <= 0.2).alias("keep"),
    )


@register(
    "gopher_quality_rules",
    oracle="""
        WITH m AS (
            SELECT doc_id,
                   string_split(text, ' ') AS t,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                   ROUND((length(text) - len(string_split(text, ' ')) + 1) * 1.0
                         / len(string_split(text, ' ')), 6) AS mean_word_len
            FROM documents
        )
        SELECT doc_id, n_words, mean_word_len,
               CAST(len(list_filter(t, x -> x IN ('the','a','of','and','to','in'))) AS BIGINT)
                   AS stopword_hits,
               (n_words BETWEEN 30 AND 500
                AND mean_word_len BETWEEN 2.0 AND 8.0
                AND len(list_filter(t, x -> x IN ('the','a','of','and','to','in'))) >= 1)
                   AS keep
        FROM m
    """,
    doc=(
        "Gopher-style document quality rules (Rae et al. 2021 §A1.1, "
        "adapted to this corpus): word-count bounds, mean word length "
        "bounds, and a minimum stop-word hit count, combined into a "
        "boolean keep flag. Mean word length is computed arithmetically "
        "from (n_chars - n_words + 1) / n_words — exact for a "
        "single-space-joined corpus and cheaper than a second array "
        "traversal. Pure per-row Column expressions: zero shuffle, "
        "whole-stage codegen end to end, embarrassingly parallel at any "
        "scale. The real-corpus additions (symbol ratio, bullet ratio, "
        "alpha-word fraction) are the same expression shape over the "
        "same token array."
    ),
    tags=("text", "llm", "quality"),
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_words = F.size(toks).cast("bigint")
    mean_word_len = F.round(
        (F.length("text") - n_words + 1) / n_words, 6
    )
    stop_hits = F.size(
        F.filter(toks, lambda x: x.isin(*STOPWORDS))
    ).cast("bigint")
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        stop_hits.alias("stopword_hits"),
        (
            n_words.between(30, 500)
            & mean_word_len.between(2.0, 8.0)
            & (stop_hits >= 1)
        ).alias("keep"),
    )
