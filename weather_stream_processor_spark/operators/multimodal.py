"""Multimodal columns (driver mandate: image/audio/video as opaque binary
with typed metadata).

Design: an asset is ``(id, modality, payload: binary, meta: struct)``. The
payload is never interpreted by the query layer — decode / resize /
feature-extract run as Arrow-batched ``mapInPandas`` stages with explicit
output schemas, so the exchange format, partitioning, and batch shape are
real Spark plumbing. Since round 8 the codec seam is REAL for two of the
three modalities — netpbm P5/P6 images (pure numpy) and RIFF/WAV 16-bit
PCM audio (stdlib wave) — each certified end-to-end by an oracle-checked
decode-stats query; video remains the one documented closure (needs a
codec library the container lacks; production dispatches to ffmpeg).

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


def _decode_netpbm(payload: bytes):
    """Pure-numpy netpbm decoder: binary P5 (grayscale) / P6 (RGB), 8-bit.

    Full header grammar — magic, then width/height/maxval as ASCII
    tokens separated by whitespace, '#' comments allowed anywhere between
    tokens, exactly one whitespace byte before the raster. Returns
    (pixels, maxval): a uint8 ndarray of shape (h, w) for P5 or
    (h, w, 3) for P6, plus the header's parsed maxval — callers must
    not assume 255 (the stats stage reports what the header SAYS).
    """
    import numpy as np

    pos = 0

    def next_token() -> bytes:
        nonlocal pos
        while pos < len(payload):
            c = payload[pos : pos + 1]
            if c == b"#":
                while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                    pos += 1
            elif c.isspace():
                pos += 1
            else:
                break
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("netpbm: truncated header")
        return payload[start:pos]

    magic = next_token()
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"netpbm: unsupported magic {magic!r}")
    w, h, maxval = (int(next_token()) for _ in range(3))
    if not (0 < maxval <= 255):
        raise ValueError(f"netpbm: 16-bit maxval {maxval} unsupported")
    if w <= 0 or h <= 0:
        raise ValueError(f"netpbm: bad dimensions {w}x{h}")
    pos += 1  # the single whitespace byte terminating the header
    ch = 1 if magic == b"P5" else 3
    need = w * h * ch
    raster = payload[pos : pos + need]
    if len(raster) != need:
        raise ValueError(f"netpbm: raster {len(raster)} bytes, need {need}")
    arr = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, ch)
    return (arr[:, :, 0] if ch == 1 else arr), maxval


def _decode_wav(payload: bytes):
    """Stdlib-only WAV PCM decoder (RIFF container, 16-bit samples).

    Returns (sample_rate: int, samples: int16 ndarray of shape
    (n_frames, n_channels)).
    """
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError(f"wav: {8 * wf.getsampwidth()}-bit unsupported")
        rate = wf.getframerate()
        nch = wf.getnchannels()
        frames = wf.readframes(wf.getnframes())
    return rate, np.frombuffer(frames, dtype="<i2").reshape(-1, nch)


def decode_payload(payload: bytes, modality: str) -> object:
    """THE CODEC SEAM — real for image (netpbm P5/P6, pure numpy) and
    audio (WAV 16-bit PCM, stdlib wave); a documented closure for video.

    Video is the one modality that genuinely needs a codec library the
    environment lacks (there is no stdlib/numpy-parseable video container
    with compressed frames) — in production this dispatches to ffmpeg;
    here it stays a loud NotImplementedError by design, and the
    frame_sample_manifest query shows the metadata-only planning path
    that avoids decoding in the first place.
    """
    if modality == "image":
        return _decode_netpbm(payload)
    if modality == "audio":
        return _decode_wav(payload)
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
        "feature extraction over the raw bytes (no decode; the REAL "
        "decode paths are the multimodal_*_decode_stats queries, r8). "
        "The oracle recomputes the byte features relationally, proving "
        "the Pandas-UDF path is deterministic and schema-stable."
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
    batch-wise Arrow transfer). A real resampler would decode first —
    see decode_payload (real for image/audio since r8; video is the
    documented closure).
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


# --- real-codec decode paths (round 8: the seam is no longer all-stub) ------

IMG_DIMS = ("doc_id % 32 + 4", "doc_id % 24 + 4")  # (width, height) formulas
IMG_DECODE_SCHEMA = (
    "asset_id bigint, width int, height int, maxval int, pixel_sum bigint"
)


def synthesize_netpbm_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image assets with REAL binary-P5 netpbm payloads.

    Pixel (r, c) of asset a is ((a*7 + r*31 + c*13) % 256) — a closed
    form both engines can recompute relationally, so the decode path is
    oracle-checkable without the oracle parsing a single byte. The
    encoder writes a genuine P5 header (with a comment line, exercising
    the parser's comment grammar) + raster, via numpy.
    """
    w_sql, h_sql = IMG_DIMS
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 0
    )
    dims = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.expr(w_sql).cast("int").alias("w"),
        F.expr(h_sql).cast("int").alias("h"),
    )

    def _encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            payloads = []
            for aid, w, h in zip(pdf["asset_id"], pdf["w"], pdf["h"]):
                aid, w, h = int(aid), int(w), int(h)
                rr = (np.arange(h, dtype=np.int64) * 31)[:, None]
                cc = (np.arange(w, dtype=np.int64) * 13)[None, :]
                px = ((aid * 7 + rr + cc) % 256).astype(np.uint8)
                header = f"P5\n# synthetic asset {aid}\n{w} {h}\n255\n"
                payloads.append(header.encode("ascii") + px.tobytes())
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "payload": payloads}
            )

    return spread(dims, "asset_id").mapInPandas(
        _encode, schema="asset_id bigint, payload binary"
    )


def decode_image_stats(assets: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode: parse each netpbm payload back into a
    pixel array and emit its stats. This is the production signature —
    binary in, typed features out — with the decoder actually running."""

    def _decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws, hs, mvs, sums = [], [], [], []
            for b in pdf["payload"]:
                arr, maxval = decode_payload(bytes(b), "image")
                hs.append(arr.shape[0])
                ws.append(arr.shape[1])
                mvs.append(maxval)
                sums.append(int(arr.sum(dtype="int64")))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "maxval": pd.Series(mvs, dtype="int32"),
                    "pixel_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return assets.mapInPandas(_decode, schema=IMG_DECODE_SCHEMA)


@register(
    "multimodal_image_decode_stats",
    oracle=f"""
        WITH img AS (
            SELECT doc_id AS asset_id,
                   {IMG_DIMS[0]} AS w, {IMG_DIMS[1]} AS h
            FROM documents WHERE doc_id % 3 = 0
        ),
        rows_ AS (
            SELECT asset_id, w, h, unnest(range(0, h)) AS r FROM img
        ),
        cells AS (
            SELECT asset_id, w, h, r, unnest(range(0, w)) AS c FROM rows_
        )
        SELECT asset_id,
               CAST(w AS INTEGER) AS width,
               CAST(h AS INTEGER) AS height,
               CAST(255 AS INTEGER) AS maxval,
               CAST(SUM((asset_id * 7 + r * 31 + c * 13) % 256) AS BIGINT)
                   AS pixel_sum
        FROM cells
        GROUP BY asset_id, w, h
    """,
    doc=(
        "REAL image decode through the codec seam (round 8: the seam is "
        "implemented for netpbm): synthesize binary-P5 payloads whose "
        "pixels follow a closed form, push the bytes through an Arrow "
        "mapInPandas stage that PARSES the netpbm container (magic, "
        "comment-tolerant header, raster) with the pure-numpy decoder in "
        "decode_payload, and emit per-asset pixel statistics. The oracle "
        "recomputes the stats from the generating formula relationally — "
        "certifying encode -> bytes -> parse -> ndarray -> stats "
        "end-to-end without DuckDB touching a byte. Plan: two chained "
        "Arrow stages in one task pipeline (no shuffle between encode "
        "and decode); at 100 TB the decode stage is map-only and the "
        "payload column prunes from every stage that doesn't need it."
    ),
    tags=("multimodal", "llm", "pandas-udf"),
)
def multimodal_image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_image_stats(synthesize_netpbm_assets(spark, sf_dir))


AUDIO_N_SQL = "doc_id % 800 + 32"
AUDIO_RATE = 16000
AUDIO_DECODE_SCHEMA = (
    "asset_id bigint, sample_rate int, n_samples bigint, "
    "amp_sum bigint, amp_min int, amp_max int"
)


def synthesize_wav_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio assets with REAL RIFF/WAV 16-bit PCM payloads.

    Sample i of asset a is ((a*13 + i*17) % 65536) - 32768 — int16 by
    construction and relationally recomputable, like the image twin.
    Encoded with the stdlib wave writer (a genuine RIFF container,
    fmt + data chunks), mono at {AUDIO_RATE} Hz.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 1
    )
    spec = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.expr(AUDIO_N_SQL).cast("int").alias("n"),
    )

    def _encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in it:
            payloads = []
            for aid, n in zip(pdf["asset_id"], pdf["n"]):
                aid, n = int(aid), int(n)
                i = np.arange(n, dtype=np.int64)
                samples = ((aid * 13 + i * 17) % 65536 - 32768).astype("<i2")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wf:
                    wf.setnchannels(1)
                    wf.setsampwidth(2)
                    wf.setframerate(AUDIO_RATE)
                    wf.writeframes(samples.tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "payload": payloads}
            )

    return spread(spec, "asset_id").mapInPandas(
        _encode, schema="asset_id bigint, payload binary"
    )


def decode_audio_stats(assets: DataFrame) -> DataFrame:
    """Arrow-batched REAL WAV decode -> per-asset amplitude statistics."""

    def _decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rates, ns, sums, mins, maxs = [], [], [], [], []
            for b in pdf["payload"]:
                rate, samples = decode_payload(bytes(b), "audio")
                mono = samples[:, 0].astype("int64")
                rates.append(rate)
                ns.append(len(mono))
                sums.append(int(mono.sum()))
                mins.append(int(mono.min()))
                maxs.append(int(mono.max()))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "amp_sum": pd.Series(sums, dtype="int64"),
                    "amp_min": pd.Series(mins, dtype="int32"),
                    "amp_max": pd.Series(maxs, dtype="int32"),
                }
            )

    return assets.mapInPandas(_decode, schema=AUDIO_DECODE_SCHEMA)


@register(
    "multimodal_audio_decode_stats",
    oracle=f"""
        WITH aud AS (
            SELECT doc_id AS asset_id, {AUDIO_N_SQL} AS n
            FROM documents WHERE doc_id % 3 = 1
        ),
        samples AS (
            SELECT asset_id, n,
                   (asset_id * 13 + unnest(range(0, n)) * 17) % 65536
                       - 32768 AS v
            FROM aud
        )
        SELECT asset_id,
               CAST({AUDIO_RATE} AS INTEGER) AS sample_rate,
               CAST(n AS BIGINT) AS n_samples,
               CAST(SUM(v) AS BIGINT) AS amp_sum,
               CAST(MIN(v) AS INTEGER) AS amp_min,
               CAST(MAX(v) AS INTEGER) AS amp_max
        FROM samples
        GROUP BY asset_id, n
    """,
    doc=(
        "REAL audio decode through the codec seam: synthesize genuine "
        "RIFF/WAV 16-bit PCM payloads (stdlib wave writer) whose samples "
        "follow a closed form, parse them back through decode_payload's "
        "stdlib WAV reader in an Arrow mapInPandas stage, and emit "
        "per-asset amplitude statistics the oracle recomputes from the "
        "formula. Together with the netpbm twin this retires the codec "
        "seam's NotImplementedError for image and audio; video remains "
        "the one documented closure (no stdlib/numpy-parseable video "
        "container exists — production dispatches to ffmpeg, and "
        "frame_sample_manifest shows the metadata-only path that "
        "minimizes what a real decoder must touch)."
    ),
    tags=("multimodal", "llm", "pandas-udf"),
)
def multimodal_audio_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_audio_stats(synthesize_wav_assets(spark, sf_dir))


# ---------------------------------------------------------------------------
# Perceptual-hash image dedup: the LAION-style near-duplicate pipeline,
# run through the REAL codec seam end to end.
# ---------------------------------------------------------------------------

_PH_GRID = 8  # aHash block grid: 8x8 = 64 bits
_PH_BANDS = 4  # 4 x 16-bit bands; pigeonhole => exact recall at Hamming <= 3
_PH_HAM_MAX = 3


def _ahash_bands(arr):
    """64-bit average-hash of a decoded grayscale array, as four 16-bit
    band integers. Pure integer arithmetic: bit(br, bc) = 1 iff
    block_sum * total_px > total_sum * block_px (cross-multiplied mean
    comparison — no division, exact in any engine); empty blocks (images
    narrower than the grid) compare 0 > 0 and yield 0."""
    import numpy as np

    h, w = arr.shape
    r_blk = np.arange(h, dtype=np.int64) * _PH_GRID // h
    c_blk = np.arange(w, dtype=np.int64) * _PH_GRID // w
    sums = np.zeros((_PH_GRID, _PH_GRID), dtype=np.int64)
    cnts = np.zeros((_PH_GRID, _PH_GRID), dtype=np.int64)
    np.add.at(sums, (r_blk[:, None], c_blk[None, :]), arr.astype(np.int64))
    np.add.at(cnts, (r_blk[:, None], c_blk[None, :]), 1)
    tot_s = int(arr.sum(dtype=np.int64))
    tot_n = h * w
    bits = (sums * tot_n > tot_s * cnts).astype(np.int64).ravel()
    bands = []
    for b in range(_PH_BANDS):
        chunk = bits[b * 16 : (b + 1) * 16]
        bands.append(int((chunk << np.arange(16, dtype=np.int64)).sum()))
    return bands


@register(
    "image_phash_near_dup",
    oracle=f"""
        WITH img AS (
            SELECT doc_id AS asset_id,
                   {IMG_DIMS[0]} AS w, {IMG_DIMS[1]} AS h
            FROM documents WHERE doc_id % 3 = 0
        ),
        rows_ AS (
            SELECT asset_id, w, h, unnest(range(0, h)) AS r FROM img
        ),
        cells AS (
            SELECT asset_id, w, h, r, unnest(range(0, w)) AS c FROM rows_
        ),
        px AS (
            SELECT asset_id, w, h,
                   r * {_PH_GRID} // h AS br, c * {_PH_GRID} // w AS bc,
                   (asset_id * 7 + r * 31 + c * 13) % 256 AS v
            FROM cells
        ),
        blocks AS (
            SELECT asset_id, br, bc,
                   CAST(SUM(v) AS BIGINT) AS bs,
                   CAST(COUNT(*) AS BIGINT) AS bn
            FROM px GROUP BY asset_id, br, bc
        ),
        tot AS (
            SELECT asset_id, CAST(SUM(bs) AS BIGINT) AS ts,
                   CAST(SUM(bn) AS BIGINT) AS tn
            FROM blocks GROUP BY asset_id
        ),
        grid AS (
            SELECT img.asset_id, g.br, g.bc
            FROM img, (SELECT a.a AS br, b.b AS bc
                       FROM (SELECT unnest(range(0, {_PH_GRID})) AS a) a,
                            (SELECT unnest(range(0, {_PH_GRID})) AS b) b) g
        ),
        bits AS (
            SELECT grid.asset_id, grid.br, grid.bc,
                   CASE WHEN COALESCE(blocks.bs, 0) * tot.tn
                             > tot.ts * COALESCE(blocks.bn, 0)
                        THEN 1 ELSE 0 END AS bit
            FROM grid
            LEFT JOIN blocks ON blocks.asset_id = grid.asset_id
                            AND blocks.br = grid.br AND blocks.bc = grid.bc
            JOIN tot ON tot.asset_id = grid.asset_id
        ),
        hashes AS (
            SELECT asset_id,
                   CAST(SUM(CASE WHEN (br * {_PH_GRID} + bc) // 16 = 0
                       THEN bit << ((br * {_PH_GRID} + bc) % 16) ELSE 0 END)
                       AS BIGINT) AS band0,
                   CAST(SUM(CASE WHEN (br * {_PH_GRID} + bc) // 16 = 1
                       THEN bit << ((br * {_PH_GRID} + bc) % 16) ELSE 0 END)
                       AS BIGINT) AS band1,
                   CAST(SUM(CASE WHEN (br * {_PH_GRID} + bc) // 16 = 2
                       THEN bit << ((br * {_PH_GRID} + bc) % 16) ELSE 0 END)
                       AS BIGINT) AS band2,
                   CAST(SUM(CASE WHEN (br * {_PH_GRID} + bc) // 16 = 3
                       THEN bit << ((br * {_PH_GRID} + bc) % 16) ELSE 0 END)
                       AS BIGINT) AS band3
            FROM bits GROUP BY asset_id
        ),
        cand AS (
            SELECT DISTINCT a.asset_id AS asset_a, b.asset_id AS asset_b,
                   bit_count(xor(a.band0, b.band0))
                   + bit_count(xor(a.band1, b.band1))
                   + bit_count(xor(a.band2, b.band2))
                   + bit_count(xor(a.band3, b.band3)) AS hamming
            FROM hashes a JOIN hashes b
              ON a.asset_id < b.asset_id
             AND (a.band0 = b.band0 OR a.band1 = b.band1
                  OR a.band2 = b.band2 OR a.band3 = b.band3)
        ),
        np_ AS (
            SELECT asset_a AS asset_id, COUNT(*) AS c FROM cand
            WHERE hamming <= {_PH_HAM_MAX} GROUP BY asset_a
            UNION ALL
            SELECT asset_b, COUNT(*) FROM cand
            WHERE hamming <= {_PH_HAM_MAX} GROUP BY asset_b
        ),
        partners AS (
            SELECT asset_id, CAST(SUM(c) AS BIGINT) AS near_dups
            FROM np_ GROUP BY asset_id
        )
        SELECT h.asset_id, h.band0, h.band1, h.band2, h.band3,
               CAST(COALESCE(p.near_dups, 0) AS BIGINT) AS near_dups
        FROM hashes h LEFT JOIN partners p ON h.asset_id = p.asset_id
    """,
    doc=(
        "PERCEPTUAL-HASH NEAR-DUPLICATE DETECTION for the image "
        "modality — the visual dedup step a LAION-class corpus runs "
        "that no text fingerprint covers (re-encoded, renamed, or "
        "lightly edited copies of one picture carry different bytes "
        "and different captions but the same visual content). aHash: "
        "partition each raster into an 8x8 block grid, bit = 1 iff "
        "block mean exceeds image mean, evaluated as the cross-"
        "multiplied comparison block_sum*total_px > total_sum*block_px "
        "so no division exists and every bit is identical under numpy "
        "or SQL; rasters narrower than the grid leave empty blocks "
        "pinned to bit 0 by the same comparison. Matching: the 64 "
        "bits ship as four 16-bit BAND integers, pairs equi-join on "
        "(band_id, band_value), and the pigeonhole lemma makes recall "
        "at Hamming<=3 EXACT (3 differing bits cannot touch 4 bands) "
        "— never an all-pairs pass. Per raster the result row carries "
        "its four band integers and near-dup partner count. Parity is "
        "certified through the whole chain (bytes -> parse -> hash -> "
        "banded join) because the pixels follow the deterministic "
        "generation formula the cross-engine check can re-derive "
        "relationally. At 100 TB: hashing rides the payload scan, the "
        "pair search is |assets| x 4 equi-join keys with candidate "
        "volume set by band selectivity, and a brute-force test pins "
        "the recall lemma."
    ),
    tags=("multimodal", "dedup", "llm", "pandas-udf", "scale"),
)
def image_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = synthesize_netpbm_assets(spark, sf_dir)

    def _hash(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"asset_id": [], "band0": [], "band1": [], "band2": [], "band3": []}
            for aid, b in zip(pdf["asset_id"], pdf["payload"]):
                arr, _maxval = decode_payload(bytes(b), "image")
                bands = _ahash_bands(arr)
                out["asset_id"].append(int(aid))
                for i in range(_PH_BANDS):
                    out[f"band{i}"].append(bands[i])
            yield pd.DataFrame(out)

    hashes = assets.mapInPandas(
        _hash,
        schema="asset_id bigint, band0 bigint, band1 bigint, "
        "band2 bigint, band3 bigint",
    )
    from weather_stream_processor_spark.plans.caching import persisted_result

    # LSH banding EQUI-join (the SimHash-twin shape): explode each hash to
    # (band_id, band_val) keys and shuffle-hash-join on those — an OR of
    # band equalities would plan a nested-loop over |assets|^2, exactly
    # the all-pairs class this operator exists to avoid. The hash table is
    # consumed in THREE subtrees (both join sides + the final partner
    # attach), so it runs under persisted_result — otherwise the whole
    # Python encode->decode->hash chain re-executes per subtree.
    def _build(hashes: DataFrame) -> DataFrame:
        keyed = hashes.select(
            "asset_id",
            "band0",
            "band1",
            "band2",
            "band3",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("band_id"),
                            F.col(f"band{i}").alias("band_val"),
                        )
                        for i in range(_PH_BANDS)
                    ]
                )
            ).alias("k"),
        ).select(
            "asset_id", "band0", "band1", "band2", "band3", "k.band_id", "k.band_val"
        )
        cols = ("asset_id", "band0", "band1", "band2", "band3")
        a = keyed.select(
            *[F.col(c).alias(f"a_{c}") for c in cols], "band_id", "band_val"
        )
        b = keyed.select(
            *[F.col(c).alias(f"b_{c}") for c in cols], "band_id", "band_val"
        )
        hamming = None
        for i in range(_PH_BANDS):
            h = F.bit_count(
                F.col(f"a_band{i}").bitwiseXOR(F.col(f"b_band{i}"))
            )
            hamming = h if hamming is None else (hamming + h)
        cand = (
            a.join(b, ["band_id", "band_val"])
            .filter(F.col("a_asset_id") < F.col("b_asset_id"))
            .select(
                F.col("a_asset_id").alias("asset_a"),
                F.col("b_asset_id").alias("asset_b"),
                hamming.alias("hamming"),
            )
            .distinct()
            .filter(F.col("hamming") <= _PH_HAM_MAX)
        )
        partners = (
            cand.select(F.col("asset_a").alias("asset_id"))
            .unionAll(cand.select(F.col("asset_b").alias("asset_id")))
            .groupBy("asset_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("near_dups"))
        )
        return hashes.join(partners, "asset_id", "left").select(
            "asset_id",
            "band0",
            "band1",
            "band2",
            "band3",
            F.coalesce(F.col("near_dups"), F.lit(0))
            .cast("bigint")
            .alias("near_dups"),
        )

    return persisted_result(hashes, _build)
