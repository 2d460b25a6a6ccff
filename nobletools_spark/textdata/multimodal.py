"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The DECODE chain is: Pillow if available -> a REAL pure-stdlib image
HEADER decoder (PNG IHDR / GIF logical screen / BMP info header / JPEG
SOFn — public container formats, no image library needed) -> a
clearly-marked deterministic fake for non-image bytes. The sandbox media
bytes are synthesized minimal-valid PNG headers (dimensions derived from
sha256(media_ref)), so the header decoder runs for real end-to-end and
the decode output is independently recomputable by the DuckDB oracle.
Full pixel decode / the ML featurizer remain sandbox stubs with real
Spark plumbing (schema, batching, partition shape).

Scale posture: media bytes never shuffle — decode/feature/frame-sample are
all narrow mapInPandas stages over the media table; only the small typed
outputs (dims, embeddings, frame indexes) flow further.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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


def synth_png(ref: str) -> bytes:
    """Minimal VALID PNG (signature + IHDR chunk with correct CRC);
    dimensions/colortype derive from sha256(media_ref) so the DuckDB
    oracle can recompute them from the hex digest. Sandbox stand-in for
    an object-store fetch, which at scale would be a mapInPandas ranged
    GET keyed by media_ref."""
    d = hashlib.sha256(ref.encode()).digest()
    w = 64 + d[0] % 192
    h = 64 + d[1] % 192
    colortype = (0, 2, 6)[d[2] % 3]      # gray / rgb / rgba
    ihdr = struct.pack(">II", w, h) + bytes([8, colortype, 0, 0, 0])
    chunk = (struct.pack(">I", 13) + b"IHDR" + ihdr
             + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))
    return b"\x89PNG\r\n\x1a\n" + chunk


def media_table(documents: DataFrame) -> DataFrame:
    """P0b: non-text spans of the interleaved documents -> media rows
    with synthesized-PNG content bytes (narrow mapInPandas fetch)."""
    spans = (documents
             .select("doc_id", F.explode("spans").alias("s"))
             .where(F.col("s.kind") != "text")
             .select("doc_id", F.col("s.media_ref").alias("media_ref"),
                     F.col("s.kind").alias("kind")))

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "content": [synth_png(r) for r in pdf["media_ref"]],
                    "meta": [{"src": r} for r in pdf["media_ref"]]})

    return spans.mapInPandas(fetch, schema=MEDIA_SCHEMA)


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def header_dims(b: bytes) -> tuple[int, int, int, str] | None:
    """REAL pure-stdlib image header decode — (width, height, channels,
    format) for PNG / GIF / BMP / JPEG containers, None otherwise. These
    are the published container layouts; no image library involved."""
    if len(b) >= 26 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return w, h, _PNG_CHANNELS.get(b[25], 3), "png-header"
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return w, h, 3, "gif-header"
    if len(b) >= 30 and b[:2] == b"BM":
        w, h = struct.unpack("<ii", b[18:26])
        bpp = struct.unpack("<H", b[28:30])[0]
        return w, abs(h), max(1, bpp // 8), "bmp-header"
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5:i + 9])
                return w, h, b[i + 9], "jpeg-header"
            i += 2 + seg_len
    return None


def _fake_dims(content: bytes) -> tuple[int, int, int]:
    """Deterministic fake for NON-image bytes. STUB — only reached when
    the content is not a recognizable image container."""
    h = hashlib.blake2b(content or b"", digest_size=6).digest()
    return (64 + h[0] % 192, 64 + h[1] % 192, 1 + h[2] % 3)


def decode_images(media: DataFrame) -> DataFrame:
    """Decode step (narrow mapInPandas): Pillow if importable, else the
    real stdlib header decoder, else the marked fake."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401
            import io
            have_pillow = True
        except ImportError:
            have_pillow = False

        def dims(b: bytes) -> tuple[int, int, int, str]:
            if have_pillow:
                try:
                    import io
                    from PIL import Image
                    with Image.open(io.BytesIO(b)) as im:
                        return (im.width, im.height,
                                len(im.getbands()), "pillow")
                except Exception:
                    pass
            got = header_dims(b)
            if got is not None:
                return got
            w, h, c = _fake_dims(b)
            return w, h, c, "stub"

        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "media_ref", "width",
                                    "height", "channels", "decoder")}
            for doc_id, ref, content in zip(pdf["doc_id"], pdf["media_ref"],
                                            pdf["content"]):
                w, h, c, dec = dims(bytes(content)
                                    if content is not None else b"")
                rows["doc_id"].append(doc_id)
                rows["media_ref"].append(ref)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(c)
                rows["decoder"].append(dec)
            if rows["doc_id"]:
                yield pd.DataFrame(rows)

    return (media.where(F.col("kind") == "image")
            .mapInPandas(gen, schema=DECODED_SCHEMA))


def media_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature-extract step: media row -> fixed-dim float embedding.
    STUB featurizer, deterministic and externally checkable: the bytes
    derive from sha256(media_ref) blocks (sha256(ref), sha256(ref+':1'),
    ...) so an independent SQL engine can recompute the embedding from
    the ref alone, and each component is byte/256 - 0.5 — an exact
    multiple of 1/256, representable without error in float32 AND
    float64, so sums/rounds agree bit-for-bit across engines. The real
    model runs in the same mapInPandas slot with identical
    schema/batching (it would read ``content`` instead of the ref)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            rows = {"doc_id": [], "media_ref": [], "embedding": []}
            for doc_id, ref in zip(pdf["doc_id"], pdf["media_ref"]):
                raw = b""
                block = 0
                while len(raw) < dim:
                    key = ref if block == 0 else f"{ref}:{block}"
                    raw += hashlib.sha256(str(key).encode()).digest()
                    block += 1
                vec = (np.frombuffer(raw[:dim], dtype=np.uint8)
                       .astype("float32") / 256.0 - 0.5)
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


# ------------------------------------------------------ audio headers ----

AUDIO_SCHEMA = ST.StructType([
    ST.StructField("doc_id", ST.LongType(), False),
    ST.StructField("media_ref", ST.StringType(), False),
    ST.StructField("channels", ST.IntegerType(), False),
    ST.StructField("sample_rate", ST.IntegerType(), False),
    ST.StructField("duration_ms", ST.IntegerType(), False),
    ST.StructField("decoder", ST.StringType(), False),
])


def synth_wav(ref: str) -> bytes:
    """Minimal VALID RIFF/WAVE (fmt + data chunks, silence payload);
    channels/rate/length derive from sha256(media_ref) so tests and any
    external checker recompute them from the hex digest."""
    d = hashlib.sha256(ref.encode()).digest()
    channels = 1 + d[0] % 2
    rate = (8000, 16000, 44100)[d[1] % 3]
    n_frames = 100 + d[2]                 # 100-355 frames
    bits = 16
    block = channels * bits // 8
    data = b"\x00" * (n_frames * block)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block,
                      bits)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _f80_to_int(b: bytes) -> int:
    """80-bit IEEE 754 extended float (AIFF sample rate) -> int."""
    sign = -1 if b[0] & 0x80 else 1
    exp = ((b[0] & 0x7F) << 8 | b[1]) - 16383
    mant = int.from_bytes(b[2:10], "big")
    return int(sign * mant * 2.0 ** (exp - 63))


def audio_header_meta(b: bytes) -> tuple[int, int, int, str] | None:
    """REAL pure-stdlib audio header decode — (channels, sample_rate,
    duration_ms, format) for RIFF/WAVE and AIFF containers, None
    otherwise. Chunk walks over the published layouts; no audio library
    involved."""
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        i, channels, rate, byte_rate, data_len = 12, None, None, None, None
        while i + 8 <= len(b):
            cid = b[i:i + 4]
            clen = struct.unpack("<I", b[i + 4:i + 8])[0]
            if cid == b"fmt " and i + 8 + 16 <= len(b):
                _, channels, rate, byte_rate, _, _ = struct.unpack(
                    "<HHIIHH", b[i + 8:i + 24])
            elif cid == b"data":
                data_len = clen
            i += 8 + clen + (clen & 1)
        if channels and rate and byte_rate and data_len is not None:
            return (channels, rate,
                    int(data_len * 1000 / byte_rate), "wav-header")
    if len(b) >= 12 and b[:4] == b"FORM" and b[8:12] in (b"AIFF", b"AIFC"):
        i = 12
        while i + 8 <= len(b):
            cid = b[i:i + 4]
            clen = struct.unpack(">I", b[i + 4:i + 8])[0]
            if cid == b"COMM" and i + 8 + 18 <= len(b):
                channels, n_frames = struct.unpack(">HI", b[i + 8:i + 14])
                rate = _f80_to_int(b[i + 16:i + 26])
                if channels and rate:
                    return (channels, rate,
                            int(n_frames * 1000 / rate), "aiff-header")
            i += 8 + clen + (clen & 1)
    return None


def decode_audio(media: DataFrame) -> DataFrame:
    """Audio decode step (narrow mapInPandas over the audio rows): the
    real WAV/AIFF header walk, falling back to a MARKED deterministic
    fake for unrecognized containers — the same honesty contract as
    ``decode_images``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "media_ref", "channels",
                                    "sample_rate", "duration_ms",
                                    "decoder")}
            for doc_id, ref, content in zip(pdf["doc_id"], pdf["media_ref"],
                                            pdf["content"]):
                b = bytes(content) if content is not None else b""
                got = audio_header_meta(b)
                if got is None:
                    h = hashlib.blake2b(b, digest_size=6).digest()
                    got = (1 + h[0] % 2, 8000 * (1 + h[1] % 5),
                           500 + h[2] * 16, "stub")
                ch, rate, dur, dec = got
                rows["doc_id"].append(doc_id)
                rows["media_ref"].append(ref)
                rows["channels"].append(ch)
                rows["sample_rate"].append(rate)
                rows["duration_ms"].append(dur)
                rows["decoder"].append(dec)
            if rows["doc_id"]:
                yield pd.DataFrame(rows)

    return (media.where(F.col("kind") == "audio")
            .mapInPandas(gen, schema=AUDIO_SCHEMA))


# ------------------------------------------------------ video headers ----

def synth_mp4(ref: str) -> bytes:
    """Minimal VALID ISO-BMFF shell (ftyp + moov>mvhd v0); timescale and
    duration derive from sha256(media_ref)."""
    d = hashlib.sha256(ref.encode()).digest()
    timescale = (600, 1000, 90000)[d[0] % 3]
    duration_ms = 1000 + (d[1] << 8 | d[2]) % 30000   # 1-31 s
    duration = duration_ms * timescale // 1000
    mvhd_body = (b"\x00\x00\x00\x00"             # version 0 + flags
                 + struct.pack(">II", 0, 0)      # ctime, mtime
                 + struct.pack(">II", timescale, duration)
                 + b"\x00" * 80)                 # rate..next_track_id
    mvhd = struct.pack(">I", 8 + len(mvhd_body)) + b"mvhd" + mvhd_body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00\x00\x02\x00"
    return ftyp + moov


def video_header_meta(b: bytes) -> tuple[int, int, str] | None:
    """REAL pure-stdlib video header decode — (timescale, duration_ms,
    format) from the ISO-BMFF ``moov > mvhd`` box (MP4/MOV), None for
    unrecognized containers. A top-level box walk plus one nested walk;
    handles mvhd version 0 (32-bit) and 1 (64-bit) layouts."""
    def walk(lo: int, hi: int):
        i = lo
        while i + 8 <= hi:
            size = struct.unpack(">I", b[i:i + 4])[0]
            typ = b[i + 4:i + 8]
            if size == 1 and i + 16 <= hi:     # 64-bit largesize
                size = struct.unpack(">Q", b[i + 8:i + 16])[0]
            if size < 8:
                return
            yield typ, i + 8, min(i + size, hi)
            i += size

    if len(b) < 12 or b[4:8] not in (b"ftyp", b"moov"):
        return None
    for typ, lo, hi in walk(0, len(b)):
        if typ != b"moov":
            continue
        for t2, l2, h2 in walk(lo, hi):
            if t2 != b"mvhd" or h2 - l2 < 20:
                continue
            version = b[l2]
            if version == 1 and h2 - l2 >= 28:
                timescale = struct.unpack(">I", b[l2 + 20:l2 + 24])[0]
                duration = struct.unpack(">Q", b[l2 + 24:l2 + 32])[0]
            else:
                timescale = struct.unpack(">I", b[l2 + 12:l2 + 16])[0]
                duration = struct.unpack(">I", b[l2 + 16:l2 + 20])[0]
            if timescale:
                return (timescale, int(duration * 1000 / timescale),
                        "mp4-header")
    return None


def video_meta(media: DataFrame) -> DataFrame:
    """-> (doc_id, media_ref, duration_ms, decoder): real mvhd decode
    with the marked deterministic fallback; feed the result's
    duration_ms into ``sample_frames``'s meta map to drive REAL
    frame-grid fan-out instead of the stub duration."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "media_ref", "duration_ms",
                                    "decoder")}
            for doc_id, ref, content in zip(pdf["doc_id"], pdf["media_ref"],
                                            pdf["content"]):
                b = bytes(content) if content is not None else b""
                got = video_header_meta(b)
                if got is None:
                    h = hashlib.blake2b(b, digest_size=4).digest()
                    dur, dec = 1000 + (h[0] << 8 | h[1]) % 8000, "stub"
                else:
                    _, dur, dec = got
                rows["doc_id"].append(doc_id)
                rows["media_ref"].append(ref)
                rows["duration_ms"].append(dur)
                rows["decoder"].append(dec)
            if rows["doc_id"]:
                yield pd.DataFrame(rows)

    return (media.where(F.col("kind") == "video")
            .mapInPandas(gen, schema=ST.StructType([
                ST.StructField("doc_id", ST.LongType(), False),
                ST.StructField("media_ref", ST.StringType(), False),
                ST.StructField("duration_ms", ST.IntegerType(), False),
                ST.StructField("decoder", ST.StringType(), False)])))
