"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the DECODE step is stubbed:
``decode_images`` tries Pillow and otherwise falls back to a clearly-marked
deterministic fake decoder (dimensions derived from a content hash). The
Spark-side plumbing — schema, batch shape, partition preservation, UDF
signatures — is real and tested; swapping the stub for a real decoder
changes one function body, no plan changes.

Scale posture: media bytes never shuffle — decode/feature/frame-sample are
all narrow mapInPandas stages over the media table; only the small typed
outputs (dims, embeddings, frame indexes) flow further.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as ST

MEDIA_SCHEMA = ST.StructType([
    ST.StructField("doc_id", ST.StringType(), False),
    ST.StructField("media_ref", ST.StringType(), False),
    ST.StructField("kind", ST.StringType(), False),   # image|audio|video
    ST.StructField("content", ST.BinaryType(), True),
    ST.StructField("meta", ST.MapType(ST.StringType(), ST.StringType()), False),
])

DECODED_SCHEMA = ST.StructType([
    ST.StructField("doc_id", ST.StringType(), False),
    ST.StructField("media_ref", ST.StringType(), False),
    ST.StructField("width", ST.IntegerType(), False),
    ST.StructField("height", ST.IntegerType(), False),
    ST.StructField("channels", ST.IntegerType(), False),
    ST.StructField("decoder", ST.StringType(), False),
])

FEATURE_DIM = 64

FEATURES_SCHEMA = ST.StructType([
    ST.StructField("doc_id", ST.StringType(), False),
    ST.StructField("media_ref", ST.StringType(), False),
    ST.StructField("embedding", ST.ArrayType(ST.FloatType()), False),
])

FRAMES_SCHEMA = ST.StructType([
    ST.StructField("doc_id", ST.StringType(), False),
    ST.StructField("media_ref", ST.StringType(), False),
    ST.StructField("frame_idx", ST.IntegerType(), False),
    ST.StructField("ts_ms", ST.IntegerType(), False),
])


def media_table(documents: DataFrame) -> DataFrame:
    """P0b: non-text spans of the interleaved documents -> media rows.
    Content bytes are synthesized deterministically from the media_ref
    (sandbox stand-in for an object-store fetch, which at scale would be a
    mapInPandas ranged GET keyed by media_ref)."""
    spans = (documents
             .select("doc_id", F.explode("spans").alias("s"))
             .where(F.col("s.kind") != "text")
             .select("doc_id", F.col("s.media_ref").alias("media_ref"),
                     F.col("s.kind").alias("kind")))
    content = F.sha2(F.col("media_ref"), 256).cast("binary")
    return spans.select(
        "doc_id", "media_ref", "kind", content.alias("content"),
        F.create_map(F.lit("src"), F.col("media_ref")).alias("meta"))


def _fake_dims(content: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: dims from the content hash. STUB — a
    real deployment replaces this with PIL/libvips decode."""
    h = hashlib.blake2b(content or b"", digest_size=6).digest()
    return (64 + h[0] % 192, 64 + h[1] % 192, 1 + h[2] % 3)


def decode_images(media: DataFrame) -> DataFrame:
    """Decode step (narrow mapInPandas). Tries Pillow; falls back to the
    deterministic fake decoder when unavailable."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401
            import io
            decoder = "pillow"

            def dims(b):
                try:
                    with Image.open(io.BytesIO(b)) as im:
                        return im.width, im.height, len(im.getbands())
                except Exception:
                    return _fake_dims(b)
        except ImportError:
            decoder = "stub"
            dims = _fake_dims

        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "media_ref", "width",
                                    "height", "channels", "decoder")}
            for doc_id, ref, content in zip(pdf["doc_id"], pdf["media_ref"],
                                            pdf["content"]):
                w, h, c = dims(bytes(content) if content is not None else b"")
                rows["doc_id"].append(doc_id)
                rows["media_ref"].append(ref)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(c)
                rows["decoder"].append(decoder)
            if rows["doc_id"]:
                yield pd.DataFrame(rows)

    return (media.where(F.col("kind") == "image")
            .mapInPandas(gen, schema=DECODED_SCHEMA))


def media_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature-extract step: content bytes -> fixed-dim float embedding.
    STUB featurizer (hash-derived, deterministic); the real model runs in
    the same mapInPandas slot with identical schema/batching."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            rows = {"doc_id": [], "media_ref": [], "embedding": []}
            for doc_id, ref, content in zip(pdf["doc_id"], pdf["media_ref"],
                                            pdf["content"]):
                raw = hashlib.blake2b(
                    bytes(content) if content is not None else b"",
                    digest_size=dim).digest()
                vec = (np.frombuffer(raw, dtype=np.uint8)
                       .astype("float32") / 255.0 - 0.5)
                rows["doc_id"].append(doc_id)
                rows["media_ref"].append(ref)
                rows["embedding"].append(vec.tolist())
            if rows["doc_id"]:
                yield pd.DataFrame(rows)

    return media.mapInPandas(gen, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  max_frames: int = 8) -> DataFrame:
    """Video frame sampling: emit (frame_idx, ts_ms) rows per video. The
    duration comes from meta (or a deterministic stub); actual frame
    extraction is the decode stub's job. Pure JVM explode — the plumbing
    that matters (fan-out row shape) is real."""
    dur = F.coalesce(
        F.element_at("meta", "duration_ms").cast("int"),
        (F.abs(F.xxhash64("media_ref")) % 8000 + 1000).cast("int"))
    n = F.least(F.floor(dur / every_ms).cast("int") + 1, F.lit(max_frames))
    idx = F.explode(F.sequence(F.lit(0), n - 1))
    return (media.where(F.col("kind") == "video")
            .select("doc_id", "media_ref", idx.alias("frame_idx"))
            .withColumn("ts_ms", (F.col("frame_idx") * every_ms).cast("int")))
