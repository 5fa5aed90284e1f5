"""Multimodal columns (driver mandate: image/audio/video as opaque binary
with typed metadata).

Design: an asset is ``(id, modality, payload: binary, meta: struct)``. The
payload is never interpreted by the query layer — decode / resize /
feature-extract run as Arrow-batched ``mapInPandas`` stages with explicit
output schemas, so the exchange format, partitioning, and batch shape are
real Spark plumbing even where the codec itself is stubbed (no image/audio
libs in this container; the decode seam raises NotImplementedError and the
tests exercise a deterministic fake).

Scale notes: binary payloads dominate row size — the asset table would be
stored with the payload in its own parquet column (column pruning skips it
unless a stage needs bytes), partitioned by modality/date, and the
mapInPandas stages sized via spark.sql.execution.arrow.maxRecordsPerBatch
so a batch of decoded frames fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_stream_processor_spark.registry import register
from weather_stream_processor_spark.sources import load_table, load_tables, spread


@register(
    "multimodal_doc_vector_join",
    oracle="""
        WITH norms AS (
            SELECT vec_id, label,
                   sqrt(SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS norm
            FROM (SELECT vec_id, label, unnest(embedding) AS x FROM embeddings)
            GROUP BY vec_id, label
        )
        SELECT d.doc_id, d.lang, d.source, d.n_chars,
               n.label, ROUND(n.norm, 6) AS embedding_norm
        FROM documents d
        JOIN norms n ON d.doc_id = n.vec_id
    """,
    doc=(
        "The multimodal join: text modality (documents) ⋈ vector modality "
        "(embeddings) on doc_id = vec_id, profiling both sides. 1:1 key "
        "join — bucketed co-location at scale makes it shuffle-free."
    ),
    tags=("multimodal", "llm", "join"),
)
def multimodal_doc_vector_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, emb = load_tables(spark, sf_dir, "documents", "embeddings")
    from weather_stream_processor_spark.functions import l2_norm

    vec = emb.select(
        "vec_id", "label", F.round(l2_norm(F.col("embedding")), 6).alias("embedding_norm")
    )
    return docs.join(vec, docs.doc_id == vec.vec_id).select(
        "doc_id", "lang", "source", "n_chars", "label", "embedding_norm"
    )


# --- binary asset pipeline --------------------------------------------------

ASSET_SCHEMA = (
    "asset_id bigint, modality string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int>"
)

FEATURE_SCHEMA = (
    "asset_id bigint, modality string, n_bytes bigint, "
    "header_sum bigint, thumb_width int, thumb_height int"
)


def synthesize_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake asset table derived from `documents`.

    Each document's UTF-8 bytes stand in for an encoded payload; metadata
    is derived arithmetically. This is the fixture for the binary-column
    plumbing — schema and partitioning identical to a real asset table.
    """
    docs = load_table(spark, sf_dir, "documents")
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
            (F.col("n_chars") % 24 + 1).cast("int").alias("n_frames"),
            F.lit(16000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def decode_payload(payload: bytes, modality: str) -> object:
    """THE CODEC SEAM — deliberately unimplemented.

    In production this dispatches to PIL/ffmpeg/soundfile per modality.
    Those libs are absent here; callers must use extract_features' fake
    path (guarded by use_real_codec=False) which never touches this.
    """
    raise NotImplementedError(
        f"no codec available for modality={modality!r} in this environment"
    )


def extract_features(assets: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each batch arrives as a pandas DataFrame with the payload
    as bytes; output schema is declared (FEATURE_SCHEMA) so downstream
    plans are fully typed. The deterministic fake computes byte-level
    features (length, header checksum, thumbnail dims from metadata) —
    the exact shape a real decode-resize-embed stage has.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if use_real_codec:
                pdf["payload"].map(lambda b: decode_payload(b, "?"))  # pragma: no cover
            meta = pd.DataFrame(list(pdf["meta"]))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "header_sum": pdf["payload"]
                    .map(lambda b: int(sum(b[:8])))
                    .astype("int64"),
                    "thumb_width": (meta["width"] // 4 + 1).astype("int32"),
                    "thumb_height": (meta["height"] // 4 + 1).astype("int32"),
                }
            )

    return assets.mapInPandas(_batches, schema=FEATURE_SCHEMA)


@register(
    "multimodal_asset_features",
    oracle="""
        SELECT doc_id AS asset_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS modality,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(list_sum(list_transform(
                        list_filter(string_split_regex(substring(text, 1, 8), ''), c -> c <> ''),
                        c -> unicode(c))) AS BIGINT) AS header_sum,
               CAST((n_chars % 640 + 1) // 4 + 1 AS INTEGER) AS thumb_width,
               CAST((n_chars % 480 + 1) // 4 + 1 AS INTEGER) AS thumb_height
        FROM documents
    """,
    doc=(
        "Binary-column pipeline end-to-end: synthesize assets (payload = "
        "utf-8 bytes, typed metadata struct) -> Arrow-batched mapInPandas "
        "feature extraction (deterministic fake codec; real decode is a "
        "NotImplementedError seam). The oracle recomputes the byte "
        "features relationally, proving the Pandas-UDF path is "
        "deterministic and schema-stable."
    ),
    tags=("multimodal", "llm", "pandas-udf"),
)
def multimodal_asset_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the single-file fixture scan is one task; without it the
    # whole Arrow decode stage runs serially on one core
    assets = spread(synthesize_assets(spark, sf_dir), "asset_id")
    return extract_features(assets)


@register(
    "multimodal_modality_stats",
    oracle="""
        SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS modality,
               COUNT(*) AS n_assets,
               CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               CAST(MAX(n_chars % 640 + 1) AS INTEGER) AS max_width
        FROM documents
        GROUP BY 1
    """,
    doc=(
        "Typed-metadata aggregation over the asset table: per-modality "
        "row/byte accounting via struct-field access — the partition-"
        "planning query for a multimodal corpus (payload column pruned "
        "from the scan; only octet_length is needed)."
    ),
    tags=("multimodal", "llm"),
)
def multimodal_modality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = synthesize_assets(spark, sf_dir)
    return assets.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.max(F.col("meta.width")).alias("max_width"),
    )


@register(
    "frame_sample_manifest",
    oracle="""
        WITH video AS (
            SELECT doc_id AS asset_id,
                   n_chars % 24 + 1 AS n_frames
            FROM documents WHERE doc_id % 3 = 2
        )
        SELECT asset_id, n_frames,
               CAST(unnest(range(0, n_frames,
                    CAST(CEIL(n_frames / 4.0) AS BIGINT))) AS BIGINT) AS frame_idx
        FROM video
    """,
    doc=(
        "FRAME-SAMPLE manifest (mandate row 'frame-sample'): for every "
        "video asset, the uniform-stride frame indices to decode — "
        "sequence(0, n_frames-1, ceil(n_frames/4)) exploded, <= 4 frames "
        "per asset. The manifest is generated IN-PLAN from metadata alone "
        "(payload column never read — check ReadSchema), then joins back "
        "to payloads only for the selected frames: at 100 TB of video the "
        "decode stage downstream (extract_features' mapInPandas seam) "
        "touches 4/n_frames of the bytes instead of all of them."
    ),
    tags=("multimodal", "llm", "sampling"),
)
def frame_sample_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = synthesize_assets(spark, sf_dir)
    video = assets.filter(F.col("modality") == "video").select(
        "asset_id", F.col("meta.n_frames").cast("bigint").alias("n_frames")
    )
    stride = F.ceil(F.col("n_frames") / 4.0).cast("bigint")
    return video.select(
        "asset_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.col("n_frames") - 1, stride)
        ).alias("frame_idx"),
    )


RESIZE_SCHEMA = (
    "asset_id long, modality string, orig_bytes long, resized_bytes long, "
    "budget long, resized_head_sum long"
)


def resize_payloads(assets: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Arrow-batched RESIZE stage (mandate row 'resize').

    Deterministic fake codec: "resizing" truncates the payload to a
    byte budget derived from the target thumbnail dims (width/4 x
    height/4) — byte-level stand-in with the exact plumbing of a real
    resampler (binary in -> binary out, metadata-driven output size,
    batch-wise Arrow transfer). The real path is the decode_payload
    NotImplementedError seam.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if use_real_codec:
                pdf["payload"].map(lambda b: decode_payload(b, "?"))  # pragma: no cover
            meta = pd.DataFrame(list(pdf["meta"]))
            budget = ((meta["width"] // 4 + 1) * (meta["height"] // 4 + 1)).astype(
                "int64"
            )
            resized = [b[:n] for b, n in zip(pdf["payload"], budget)]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "orig_bytes": pdf["payload"].map(len).astype("int64"),
                    "resized_bytes": [len(b) for b in resized],
                    "budget": budget,
                    "resized_head_sum": [int(sum(b[:8])) for b in resized],
                }
            )

    return assets.mapInPandas(_batches, schema=RESIZE_SCHEMA)


@register(
    "multimodal_resize",
    oracle="""
        WITH a AS (
            SELECT doc_id AS asset_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'image'
                        WHEN doc_id % 3 = 1 THEN 'audio'
                        ELSE 'video' END AS modality,
                   encode(text) AS payload,
                   CAST(((n_chars % 640 + 1) // 4 + 1)
                        * ((n_chars % 480 + 1) // 4 + 1) AS BIGINT) AS budget
            FROM documents
        )
        SELECT asset_id, modality,
               CAST(octet_length(payload) AS BIGINT) AS orig_bytes,
               CAST(LEAST(octet_length(payload), budget) AS BIGINT) AS resized_bytes,
               budget,
               CAST(list_sum(list_transform(
                        list_filter(string_split_regex(
                            substring(decode(payload), 1,
                                      CAST(LEAST(octet_length(payload), budget, 8) AS INT)), ''),
                            c -> c <> ''),
                        c -> unicode(c))) AS BIGINT) AS resized_head_sum
        FROM a
    """,
    doc=(
        "RESIZE stage through the Arrow seam: metadata-driven byte-budget "
        "truncation standing in for a real thumbnailer (same signature: "
        "binary -> binary, output size from target dims). The oracle "
        "recomputes original/resized sizes and the resized header "
        "checksum relationally — pinning that the Pandas batch path "
        "resizes every row deterministically to the metadata-derived "
        "budget. At 100 TB this stage is the bandwidth hot spot: it runs "
        "map-side on Arrow batches, no shuffle, and emits budget-bounded "
        "bytes downstream."
    ),
    tags=("multimodal", "llm", "pandas-udf"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = spread(synthesize_assets(spark, sf_dir), "asset_id")
    return resize_payloads(assets)
