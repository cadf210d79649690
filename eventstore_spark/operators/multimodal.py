"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The engine treats media as ``binary`` payload columns with a typed metadata
struct, processed by Arrow-batched ``mapInPandas`` operators. The Spark-side
plumbing (schema, batch iteration, partition sizing, UDF signatures) is
real and tested; the actual codec work (image decode, resampling, frame
extraction) requires native libraries not present in this container and is
stubbed behind ``DECODERS`` — swap in real implementations (PIL/ffmpeg)
without touching the plan shape.

Scale notes: media rows are large — ``repartition`` by size budget before
mapInPandas so an Arrow batch stays within executor memory;
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("duration_ms", T.LongType(), True),
        ]), True),
    ]
)


def _fake_decode_image(content: bytes) -> dict:
    """Deterministic stand-in for an image decoder: derives pseudo
    dimensions + a content digest from the bytes. Replace with PIL."""
    if content is None:
        return {"width": None, "height": None, "digest": None}
    h = hashlib.sha256(content).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "digest": h.hex()[:16],
    }


def _real_decode_image(content: bytes) -> dict:  # pragma: no cover
    raise NotImplementedError(
        "image decode needs PIL/opencv — not available in this container; "
        "register a real decoder in DECODERS['image']"
    )


DECODERS = {"image": _fake_decode_image, "audio": _fake_decode_image, "video": _fake_decode_image}

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("digest", T.StringType()),
    ]
)


def extract_media_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches of binary)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                content = bytes(r.content) if r.content is not None else None
                d = DECODERS[r.kind](content)
                rows.append(
                    (r.media_id, r.kind, len(content) if content else 0,
                     d["width"], d["height"], d["digest"])
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _FEATURES_SCHEMA.fields])

    return media.mapInPandas(run, _FEATURES_SCHEMA)


def exact_media_dedup(media: DataFrame) -> DataFrame:
    """Exact binary dedup: sha2 over content, JVM-side (no decode)."""
    return (
        media.withColumn("content_hash", F.sha2(F.col("content"), 256))
        .groupBy("content_hash")
        .agg(
            F.min("media_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("copies"),
        )
    )


# ---------------------------------------------------------------------------
# Frame sampling (video) and resize (image) — one-to-many / transform plumbing
# ---------------------------------------------------------------------------

FRAME_INTERVAL_MS = 1000

_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame_digest", T.StringType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def _fake_duration_ms(content: bytes) -> int:
    """Deterministic stand-in for container-header probing (ffprobe):
    1-5 seconds derived from the content digest."""
    h = hashlib.sha256(content).digest()
    return 1000 * (1 + h[2] % 5)


def _fake_extract_frame(content: bytes, idx: int) -> str:
    """Deterministic stand-in for an ffmpeg frame grab: a digest standing
    in for the frame's pixels. Replace with a real decoder."""
    return hashlib.sha256(content + b":" + str(idx).encode()).hexdigest()[:16]


def sample_frames(media: DataFrame,
                  interval_ms: int = FRAME_INTERVAL_MS) -> DataFrame:
    """Video frame sampling: one row PER FRAME at a fixed interval — the
    one-to-many mapInPandas shape (a 2-hour video explodes to ~7k rows
    inside the executor, never on the driver). Duration comes from the
    metadata struct when present, else from the (stubbed) header probe;
    frame extraction itself is the documented decoder stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "video" or r.content is None:
                    continue
                content = bytes(r.content)
                meta_dur = r.meta.get("duration_ms") if isinstance(r.meta, dict) else None
                duration = int(meta_dur) if meta_dur is not None else _fake_duration_ms(content)
                for idx in range(max(duration // interval_ms, 1)):
                    rows.append(
                        (r.media_id, idx, idx * interval_ms,
                         _fake_extract_frame(content, idx), duration)
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _FRAMES_SCHEMA.fields])

    return media.mapInPandas(run, _FRAMES_SCHEMA)


_CHUNKS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("chunk_idx", T.LongType()),
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("chunk_digest", T.StringType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def segment_audio(media: DataFrame, chunk_ms: int = 250) -> DataFrame:
    """Audio segmentation: fixed windows of ``chunk_ms`` over each audio
    track — the ASR/feature-extraction pre-step. Same one-to-many
    mapInPandas plumbing as ``sample_frames``; the last chunk is clipped
    to the track end. Waveform slicing is the documented decoder stub
    (the digest stands in for the chunk's samples)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "audio" or r.content is None:
                    continue
                content = bytes(r.content)
                meta_dur = r.meta.get("duration_ms") if isinstance(r.meta, dict) else None
                duration = int(meta_dur) if meta_dur is not None else _fake_duration_ms(content)
                n = max(-(-duration // chunk_ms), 1)
                for idx in range(n):
                    start = idx * chunk_ms
                    rows.append(
                        (r.media_id, idx, start, min(start + chunk_ms, duration),
                         _fake_extract_frame(content, idx), duration)
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _CHUNKS_SCHEMA.fields])

    return media.mapInPandas(run, _CHUNKS_SCHEMA)


_RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("digest", T.StringType()),
    ]
)


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize to a fixed training resolution: binary in → binary out
    through Arrow batches (the memory-shape that matters: resized bytes
    are produced and consumed executor-side). The pixel work is the
    documented stub — a digest token standing in for the resized image."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "image" or r.content is None:
                    continue
                content = bytes(r.content)
                token = hashlib.sha256(
                    content + f":{width}x{height}".encode()
                ).digest()
                rows.append((r.media_id, width, height, token, token.hex()[:16]))
            yield pd.DataFrame(rows, columns=[f.name for f in _RESIZED_SCHEMA.fields])

    return media.mapInPandas(run, _RESIZED_SCHEMA)


def sniff_media_headers(media: DataFrame, content_col: str = "content",
                        id_col: str = "media_id") -> DataFrame:
    """REAL (non-stubbed) container-format sniffing — no codecs needed:
    magic bytes and fixed-offset header fields parsed with JVM hex
    arithmetic. PNG (IHDR big-endian dims), GIF (little-endian dims) and
    WAV (fmt-chunk channels + sample rate) are covered; anything else
    surfaces as 'unknown' with null fields.

    Scale shape: only a 32-byte prefix of each blob is ever hexed, and the
    whole parse is one codegen'd projection — this is how format stats /
    corrupt-file triage run over 100 TB of media without decoding a single
    frame. Returns (media_id, format, width, height, channels,
    sample_rate)."""
    hx = F.upper(F.hex(F.expr(f"substring({content_col}, 1, 32)")))

    def be(off: int, n: int):  # big-endian uint at 1-based byte offset
        return F.conv(F.substring(hx, 2 * (off - 1) + 1, 2 * n), 16, 10).cast("long")

    def le(off: int, n: int):  # little-endian uint
        parts = [F.substring(hx, 2 * (off - 1 + i) + 1, 2) for i in reversed(range(n))]
        return F.conv(F.concat(*parts), 16, 10).cast("long")

    is_png = F.substring(hx, 1, 16) == "89504E470D0A1A0A"
    is_gif = F.substring(hx, 1, 8) == "47494638"  # GIF87a / GIF89a
    is_wav = (F.substring(hx, 1, 8) == "52494646") & (
        F.substring(hx, 17, 8) == "57415645"
    )
    null = F.lit(None).cast("long")
    return media.select(
        F.col(id_col).alias("media_id"),
        F.when(is_png, F.lit("png")).when(is_gif, F.lit("gif"))
        .when(is_wav, F.lit("wav")).otherwise(F.lit("unknown")).alias("format"),
        F.when(is_png, be(17, 4)).when(is_gif, le(7, 2)).otherwise(null).alias("width"),
        F.when(is_png, be(21, 4)).when(is_gif, le(9, 2)).otherwise(null).alias("height"),
        F.when(is_wav, le(23, 2)).otherwise(null).alias("channels"),
        F.when(is_wav, le(25, 4)).otherwise(null).alias("sample_rate"),
    )
