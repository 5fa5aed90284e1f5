"""Scalar function coverage (SURVEY §2.6 'scalar fns' + reference T1/T9/T10).

Everything stays inside whole-stage codegen — no UDFs. Each query batches a
family of functions whose semantics are identical (or made identical by
explicit casts) between Spark and DuckDB:

- integer-returning date parts differ in width (Spark INT vs DuckDB
  BIGINT) — cast Spark side to BIGINT;
- day-of-week numbering differs (Spark dayofweek is 1=Sunday, DuckDB
  dayofweek is 0=Sunday) — both sides use ISO weekday instead;
- ceil/floor on DOUBLE return BIGINT in Spark, DOUBLE in DuckDB — cast;
- libm-backed fns (sqrt/ln/pow) are rounded on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_stream_processor_spark.registry import register
from weather_stream_processor_spark.sources import load_table


@register(
    "string_functions",
    oracle="""
        SELECT p_partkey,
               lower(p_name) AS name_lower,
               upper(p_brand) AS brand_upper,
               CAST(length(p_name) AS BIGINT) AS name_len,
               substring(p_type, 1, 4) AS type_prefix,
               regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
               CAST(length(string_split(p_name, ' ')) AS BIGINT) AS n_words,
               concat(p_brand, ':', p_type) AS brand_type,
               replace(p_name, ' ', '_') AS name_snake,
               trim('  ' || p_name || ' ') AS name_trimmed,
               (p_name LIKE '%%re%%') AS has_re,
               starts_with(p_name, 're') AS starts_re
        FROM part
    """,
    doc=(
        "T1-family string surface: lower/upper/length/substring/"
        "regexp_extract/split/concat/replace/trim/LIKE/startswith — all "
        "codegen'd Column expressions, no Python."
    ),
    tags=("scalar", "string"),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_type", 1, 4).alias("type_prefix"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.size(F.split("p_name", " ")).cast("bigint").alias("n_words"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
        F.col("p_name").like("%re%").alias("has_re"),
        F.col("p_name").startswith("re").alias("starts_re"),
    )


@register(
    "date_functions",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS BIGINT) AS order_year,
               CAST(month(o_orderdate) AS BIGINT) AS order_month,
               CAST(day(o_orderdate) AS BIGINT) AS order_day,
               CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
               CAST(isodow(o_orderdate) AS BIGINT) AS iso_weekday,
               date_trunc('month', o_orderdate) AS month_start,
               o_orderdate + INTERVAL 30 DAY AS due_date,
               CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER)
                   AS days_since_epoch_start
        FROM orders
    """,
    doc=(
        "T5-family datetime surface: parts, ISO weekday (numbering unified "
        "across engines), truncation, interval arithmetic, datediff."
    ),
    tags=("scalar", "datetime"),
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
        F.quarter("o_orderdate").cast("bigint").alias("order_quarter"),
        (F.weekday("o_orderdate") + 1).cast("bigint").alias("iso_weekday"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff("o_orderdate", F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_epoch_start"
        ),
    )


@register(
    "math_functions",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(abs(l_extendedprice - 50000), 2) AS abs_dev,
               CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
               CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
               ROUND(sqrt(l_extendedprice), 6) AS price_sqrt,
               ROUND(ln(l_extendedprice + 1), 6) AS price_ln,
               ROUND(pow(1 - l_discount, 2), 6) AS disc_sq,
               l_linenumber % 3 AS line_mod,
               ROUND(greatest(l_discount, l_tax), 2) AS max_rate,
               ROUND(least(l_discount, l_tax), 2) AS min_rate,
               CAST(sign(l_extendedprice - 50000) AS DOUBLE) AS dev_sign
        FROM lineitem
    """,
    doc="T9-family math surface: abs/ceil/floor/sqrt/ln/pow/mod/greatest/least/sign.",
    tags=("scalar", "math"),
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 50000), 2).alias("abs_dev"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.pow(1 - F.col("l_discount"), 2), 6).alias("disc_sq"),
        (F.col("l_linenumber") % 3).alias("line_mod"),
        F.round(F.greatest("l_discount", "l_tax"), 2).alias("max_rate"),
        F.round(F.least("l_discount", "l_tax"), 2).alias("min_rate"),
        F.signum(F.col("l_extendedprice") - 50000).alias("dev_sign"),
    )


@register(
    "case_when_price_buckets",
    oracle="""
        SELECT CASE
                 WHEN o_totalprice < 50000 THEN 'small'
                 WHEN o_totalprice < 150000 THEN 'medium'
                 WHEN o_totalprice < 300000 THEN 'large'
                 ELSE 'jumbo'
               END AS price_bucket,
               COUNT(*) AS n_orders,
               ROUND(CAST(SUM(CAST(FLOOR(o_totalprice * 10000 + 0.5) AS BIGINT))
                   AS BIGINT) / 10000.0, 2) AS total
        FROM orders
        GROUP BY 1
    """,
    doc="CASE WHEN bucketing + aggregation (conditional expression surface).",
    tags=("scalar", "case"),
)
def case_when_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
    )
    return (
        o.groupBy(bucket.alias("price_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(
                    F.floor(F.col("o_totalprice") * 10000 + F.lit(0.5)).cast("bigint")
                ).cast("bigint")
                / 10000.0,
                2,
            ).alias("total"),
        )
    )


@register(
    "in_like_between_filters",
    oracle="""
        SELECT p_partkey, p_name, p_brand, p_size, p_retailprice
        FROM part
        WHERE p_size IN (5, 11, 28)
          AND p_name LIKE '%%o%%'
          AND p_retailprice BETWEEN 500 AND 2000
          AND p_brand IS NOT NULL
    """,
    doc=(
        "T4-family predicate surface: IN, LIKE, BETWEEN, IS NOT NULL in one "
        "conjunction — IN/BETWEEN/null-test push into the parquet scan."
    ),
    tags=("scalar", "filter"),
)
def in_like_between_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_size").isin(5, 11, 28)
        & F.col("p_name").like("%o%")
        & F.col("p_retailprice").between(500, 2000)
        & F.col("p_brand").isNotNull()
    ).select("p_partkey", "p_name", "p_brand", "p_size", "p_retailprice")


@register(
    "json_wire_roundtrip",
    oracle="""
        SELECT event_id,
               CAST(event_id AS VARCHAR) AS event_id_str,
               CAST(to_json(struct_pack(event_id := event_id,
                                        event_type := event_type)) AS VARCHAR) AS wire_value
        FROM events
    """,
    doc=(
        "T1+T10: the producer's wire serialization "
        "(weather_stream.py:72-74) as to_json(struct(...)) — plus the "
        "binary->string cast direction. Field order fixed by the struct."
    ),
    tags=("scalar", "json", "reference"),
)
def json_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("event_id").cast("string").alias("event_id_str"),
        F.to_json(F.struct("event_id", "event_type")).alias("wire_value"),
    )


@register(
    "json_path_extraction",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_path,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_tuple,
               CAST(json_extract_string(props, '$.missing') AS BIGINT) AS absent
        FROM events
    """,
    doc=(
        "Schema-less JSON path access (SURVEY §2.6 map/json row): "
        "get_json_object for one-off $.paths and json_tuple for extracting "
        "several top-level fields in a single parse — the exploratory "
        "complement to the declared-schema from_json path "
        "(json_parse_props); absent paths yield NULL, not errors. Both are "
        "codegen'd (Jackson inside the JVM), no UDF."
    ),
    tags=("scalar", "json", "path"),
)
def json_path_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    props = F.col("props").cast("string")
    # json_tuple is a generator: it must stand alone in its projection
    tupled = ev.select(
        "event_id", props.alias("props_str"), F.json_tuple(props, "k").alias("k_raw")
    )
    return tupled.select(
        "event_id",
        F.get_json_object("props_str", "$.k").cast("bigint").alias("k_path"),
        F.col("k_raw").cast("bigint").alias("k_tuple"),
        F.get_json_object("props_str", "$.missing").cast("bigint").alias("absent"),
    )


@register(
    "map_functions",
    oracle="""
        SELECT s_suppkey,
               MAP {'balance': s_acctbal, 'nation': CAST(s_nationkey AS DOUBLE)}['balance'][1]
                   AS balance,
               CAST(cardinality(MAP {'balance': s_acctbal,
                                     'nation': CAST(s_nationkey AS DOUBLE)}) AS INTEGER)
                   AS n_entries,
               array_to_string(map_keys(MAP {'balance': s_acctbal,
                                             'nation': CAST(s_nationkey AS DOUBLE)}), ',')
                   AS keys_csv
        FROM supplier
    """,
    doc=(
        "MapType surface (SURVEY §2.6 map/json row): create_map, "
        "element_at lookup, map_keys, size — emitted as scalars so the "
        "cross-engine hash compares primitive values, not engine-specific "
        "map encodings."
    ),
    tags=("scalar", "map"),
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    m = F.create_map(
        F.lit("balance"),
        F.col("s_acctbal"),
        F.lit("nation"),
        F.col("s_nationkey").cast("double"),
    )
    return s.select(
        "s_suppkey",
        F.element_at(m, "balance").alias("balance"),
        F.size(m).alias("n_entries"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
    )


@register(
    "posexplode_tokens",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS t
            FROM documents WHERE doc_id < 20
        )
        SELECT doc_id,
               CAST(unnest(range(len(t))) AS INT) AS pos,
               unnest(t) AS tok
        FROM toks
    """,
    doc=(
        "Generator variants (SURVEY §2.6 array row): posexplode preserves "
        "the element ordinal — required whenever order inside the array "
        "carries meaning (token position, frame index of a sampled video). "
        "The ordinal is generated during the explode, not reconstructed by "
        "a window afterwards (which would cost a sort the Generate gets "
        "for free)."
    ),
    tags=("scalar", "array", "generator"),
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )


@register(
    "array_set_operations",
    oracle="""
        WITH pair AS (
            SELECT a.doc_id,
                   string_split(a.text, ' ') AS ta,
                   string_split(b.text, ' ') AS tb
            FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
            WHERE a.doc_id < 30
        )
        SELECT doc_id,
               array_to_string(list_sort(list_distinct(list_cat(ta, tb)))[1:5],
                               ' ') AS union_head,
               len(list_distinct(list_cat(ta, tb))) AS n_union,
               len(list_filter(list_distinct(ta), t -> list_contains(tb, t))) AS n_intersect,
               len(list_filter(list_distinct(ta), t -> NOT list_contains(tb, t))) AS n_except
        FROM pair
    """,
    doc=(
        "ARRAY-level set algebra (array_union/intersect/except + sort + "
        "slice) between each doc's token set and its successor's — the "
        "within-row complement of the table-level set operators. All "
        "codegen'd array expressions; per-row cost is O(|a|+|b|) hash-set "
        "work, no shuffle beyond the self-join. Counts are emitted and the "
        "union head is sorted, sliced AND array_join'd to a flat string so "
        "every output column is a hashable scalar — the driver's "
        "canonicalizer (pandas factorize over object columns) dies on raw "
        "array values (r5 driver failure), so oracle-backed queries must "
        "never emit array/map/struct columns."
    ),
    tags=("scalar", "array", "setop"),
)
def array_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") < 30).alias("a")
    b = docs.alias("b")
    pair = a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1).select(
        F.col("a.doc_id").alias("doc_id"),
        F.split(F.col("a.text"), " ").alias("ta"),
        F.split(F.col("b.text"), " ").alias("tb"),
    )
    union = F.array_union("ta", "tb")
    return pair.select(
        "doc_id",
        F.array_join(F.slice(F.array_sort(union), 1, 5), " ").alias("union_head"),
        F.size(union).alias("n_union"),
        F.size(F.array_intersect(F.array_distinct("ta"), "tb")).alias("n_intersect"),
        F.size(F.array_except("ta", "tb")).alias("n_except"),
    )


# ---------------------------------------------------------------------------
# Round-5l: Spark-4-native semi-structured handling — VARIANT and XML.
# ---------------------------------------------------------------------------


@register(
    "variant_props_pipeline",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)),
                     4) AS avg_k,
               CAST(SUM(CASE WHEN json_extract_string(props, '$.absent')
                             IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_missing_path,
               'OBJECT<k: BIGINT>' AS variant_schema
        FROM events
        GROUP BY event_type
    """,
    doc=(
        "SPARK 4 VARIANT pipeline over the schema-less props column: "
        "parse_json lifts the string to the binary VARIANT encoding "
        "once, variant_get extracts '$.k' as a typed bigint, "
        "try_variant_get probes a missing path WITHOUT erroring (NULL, "
        "counted), and schema_of_variant reports the inferred shape — "
        "the Spark-4-native path for semi-structured columns that "
        "replaces repeated get_json_object string re-parsing with a "
        "parse-once binary format (the open-source answer to shredded "
        "JSON columns; at 100 TB the win is parsing each props value "
        "ONCE per row instead of once per extracted path). The oracle "
        "pins the extracted values/aggregates via DuckDB's JSON "
        "functions and the inferred schema as the literal contract "
        "'OBJECT<k: BIGINT>'. All expressions JVM-side, no UDF."
    ),
    tags=("scalar", "json", "variant", "llm"),
)
def variant_props_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props").cast("string"))
    parsed = ev.select(
        "event_type",
        F.variant_get(v, "$.k", "bigint").alias("k"),
        F.try_variant_get(v, "$.absent", "bigint").alias("absent"),
        F.schema_of_variant(v).alias("variant_schema"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.round(F.avg("k"), 4).alias("avg_k"),
        F.sum(F.when(F.col("absent").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_missing_path"),
        F.any_value("variant_schema").alias("variant_schema"),
    )


@register(
    "xml_wire_roundtrip",
    oracle="""
        SELECT event_id, event_type,
               '<ROW>' || chr(10)
               || '    <event_id>' || event_id || '</event_id>' || chr(10)
               || '    <event_type>' || event_type || '</event_type>'
               || chr(10) || '</ROW>' AS wire_xml,
               event_id AS event_id_rt,
               event_type AS event_type_rt
        FROM events
    """,
    doc=(
        "XML WIRE ROUNDTRIP (Spark 4 native XML): to_xml(struct(...)) "
        "serializes each event to the element form a legacy XML consumer "
        "expects, from_xml parses it straight back through the declared "
        "schema, and the output carries BOTH the wire string and the "
        "roundtripped fields — the XML twin of json_wire_roundtrip "
        "(K4's value-serialization fidelity proof, for the second wire "
        "format Spark 4 ships built-in). The oracle reconstructs the "
        "exact serialized bytes (rowTag ROW, newline + 4-space indent — "
        "pinned as the cross-engine contract) so the hash certifies the "
        "serializer's byte output AND the parser's inverse; a field "
        "mangled either way breaks the value hash. JVM codegen both "
        "directions, no UDF."
    ),
    tags=("scalar", "xml", "reference"),
)
def xml_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    ev = load_table(spark, sf_dir, "events")
    wired = ev.select(
        "event_id",
        "event_type",
        F.to_xml(F.struct("event_id", "event_type")).alias("wire_xml"),
    )
    sch = StructType(
        [
            StructField("event_id", LongType()),
            StructField("event_type", StringType()),
        ]
    )
    return wired.select(
        "event_id",
        "event_type",
        "wire_xml",
        F.from_xml("wire_xml", sch).alias("p"),
    ).select(
        "event_id",
        "event_type",
        "wire_xml",
        F.col("p.event_id").alias("event_id_rt"),
        F.col("p.event_type").alias("event_type_rt"),
    )
