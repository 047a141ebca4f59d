"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload is an opaque `binary`
column; metadata (format, dims, duration) is typed columns next to it;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas iterators (`mapInPandas`) so each task processes whole record
batches without JVM<->Python per-row serde.

The container has no image/audio libs, so the DECODE step is stubbed: a
deterministic fake decoder parses our synthetic payload header (and
`decode_image_real` raises NotImplementedError where PIL would be called).
Everything Spark-side — schema, partitioning, UDF signature, batch shape —
is real and tested.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from banking_streaming_etl_spark import datamodel

#: synthetic payload: 16-byte header (magic, width, height, channels) +
#: pseudo-pixel bytes derived from the doc text.
_MAGIC = b"FAKE"

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_format", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("thumb", T.ArrayType(T.DoubleType())),
    ]
)


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a deterministic media table from `documents`: payload bytes =
    header + text bytes (stands in for real image data on disk)."""
    docs = datamodel.load_table(spark, sf_dir, "documents")
    width = (F.col("doc_id") % 64 + 16).cast("int")
    height = (F.col("doc_id") % 48 + 16).cast("int")
    header = F.concat(
        F.lit(_MAGIC),
        F.encode(F.lpad(width.cast("string"), 6, "0"), "utf-8"),
        F.encode(F.lpad(height.cast("string"), 6, "0"), "utf-8"),
    )
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "png")
        .when(F.col("doc_id") % 3 == 1, "jpeg")
        .otherwise("webp")
        .alias("media_format"),
        width.alias("width"),
        height.alias("height"),
        F.concat(header, F.encode(F.col("text"), "utf-8")).alias("payload"),
    )


def decode_image_real(payload: bytes) -> tuple[int, int, bytes]:
    """Real image decode when PIL is importable: (width, height, raw RGB
    bytes) — the same tuple contract as `_decode_fake`, so downstream
    feature extraction is decoder-agnostic. This container ships no
    imaging libs, so the gate raises the documented NotImplementedError
    there; on a cluster with Pillow installed the decode is live
    (differential-tested against the contract in
    tests/test_extensions.py, skipif no PIL)."""
    try:
        from PIL import Image  # optional dep — not in this container
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires PIL/libvips; wire it here on a real cluster"
        ) from exc
    import io

    with Image.open(io.BytesIO(payload)) as im:
        rgb = im.convert("RGB")
        return rgb.size[0], rgb.size[1], rgb.tobytes()


def _decode_fake(payload: bytes) -> tuple[int, int, bytes]:
    assert payload[:4] == _MAGIC, "bad magic"
    width = int(payload[4:10])
    height = int(payload[10:16])
    return width, height, payload[16:]


def extract_media_features(media: DataFrame, thumb_dim: int = 4) -> DataFrame:
    """mapInPandas feature extraction: checksum, byte stats, and a fixed-dim
    'thumbnail' (mean byte value per chunk — the stubbed stand-in for a
    resize). Repartitions by doc_id so batches are balanced across tasks."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, fmt, payload in zip(
                pdf["doc_id"], pdf["media_format"], pdf["payload"]
            ):
                raw = bytes(payload)
                _, _, body = _decode_fake(raw)
                n = len(body)
                chunk = max(1, n // thumb_dim)
                thumb = [
                    (sum(body[i * chunk : (i + 1) * chunk]) / max(1, len(body[i * chunk : (i + 1) * chunk])))
                    for i in range(thumb_dim)
                ]
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "media_format": fmt,
                        "n_bytes": n,
                        "checksum": zlib.crc32(raw),
                        "mean_byte": sum(body) / n if n else 0.0,
                        "thumb": thumb,
                    }
                )
            yield pd.DataFrame(rows)

    return media.repartition("doc_id").mapInPandas(extract, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_offset", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling — the video-pipeline shape: each payload expands to
    `n_frames` evenly-spaced records (1 -> N row explosion inside the
    Arrow batch, the exact pattern a real ffmpeg-backed sampler uses; the
    'frame' here is a deterministic byte slice because no codec ships in
    this container). Output rows are independent units downstream ops
    (embed, dedup, caption) fan out over — at 100 TB that independence is
    what lets frame work distribute beyond the video count."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                _, _, body = _decode_fake(raw)
                n = len(body)
                step = max(1, n // n_frames)
                for i in range(n_frames):
                    off = min(i * step, max(0, n - 1))
                    frame = body[off : off + step]
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": i,
                            "frame_offset": off,
                            "frame_bytes": frame,
                            "frame_checksum": zlib.crc32(frame),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.repartition("doc_id").mapInPandas(sample, FRAME_SCHEMA)


def media_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end frame sampling over the synthetic media table
    (rows-only check; determinism + row-count contract pinned in tests)."""
    return sample_frames(synthesize_media(spark, sf_dir))


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: synthesize -> mapInPandas extract (rows-only check —
    the pipeline shape is the point; pytest asserts determinism)."""
    return extract_media_features(synthesize_media(spark, sf_dir))


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("sample_offset", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zero_crossings", T.IntegerType()),
    ]
)


def audio_energy_windows(
    media: DataFrame, window_samples: int = 256, stride: int = 128
) -> DataFrame:
    """Audio-pipeline shape: treat the payload body as mono PCM int8
    samples and emit per-window energy features (RMS, peak, zero
    crossings) over a sliding window — the VAD/segmentation front-end of
    a speech pipeline. 1 payload -> N overlapping windows inside the
    Arrow batch (numpy-vectorized, no per-sample Python); a real
    soundfile/ffmpeg decode slots in where the byte view is taken.
    Window rows are independent downstream units, same scale argument as
    frame sampling."""
    import numpy as np

    def windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, _, body = _decode_fake(bytes(payload))
                pcm = np.frombuffer(body, dtype=np.int8).astype(np.float64)
                n = len(pcm)
                k = 0
                for off in range(0, max(1, n - window_samples + 1), stride):
                    w = pcm[off : off + window_samples]
                    if len(w) == 0:
                        break
                    signs = np.sign(w[w != 0])
                    zc = int(np.sum(signs[1:] != signs[:-1])) if len(signs) > 1 else 0
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "window_idx": k,
                            "sample_offset": off,
                            "rms": float(np.sqrt(np.mean(w * w))),
                            "peak": int(np.max(np.abs(w))),
                            "zero_crossings": zc,
                        }
                    )
                    k += 1
            yield pd.DataFrame(rows)

    return media.repartition("doc_id").mapInPandas(windows, AUDIO_WINDOW_SCHEMA)


def media_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end audio windowing over the synthetic media table
    (rows-only check; determinism + coverage contract pinned in tests)."""
    return audio_energy_windows(synthesize_media(spark, sf_dir))


# --- perceptual-hash image dedup ---------------------------------------------

PHASH_GRID = 8  # 8x8 grid -> 64-bit hash
PHASH_BANDS = 8  # 8 bands x 8 bits: blocking for the near-dup join
PHASH_MAX_HAMMING = 7  # pigeonhole: <=7 bit flips leave >=1 band intact

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def _phash_from_body(body: bytes) -> int:
    """64-bit perceptual hash of the fake-decoded pixel body: mean byte
    per cell of an 8x8 grid, bit = cell mean > global mean (the aHash
    construction; a real image path would DCT a PIL-decoded grayscale
    thumbnail — same signature, same downstream join)."""
    n = len(body)
    cells = PHASH_GRID * PHASH_GRID
    if n == 0:
        return 0
    chunk = max(1, n // cells)
    means = []
    for i in range(cells):
        piece = body[i * chunk : (i + 1) * chunk] or body[-chunk:]
        means.append(sum(piece) / len(piece))
    overall = sum(means) / len(means)
    h = 0
    for i, m in enumerate(means):
        if m > overall:
            h |= 1 << i
    return h - (1 << 63) if h >= (1 << 63) else h


def phash_media(media: DataFrame) -> DataFrame:
    """Arrow-batched perceptual hashing of binary payloads (one 64-bit
    hash per asset — narrow, parallel, the only Python touching bytes)."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, _, body = _decode_fake(bytes(payload))
                rows.append(
                    {"doc_id": int(doc_id), "phash": _phash_from_body(body)}
                )
            yield pd.DataFrame(rows)

    return media.repartition("doc_id").mapInPandas(compute, PHASH_SCHEMA)


def near_dup_images(media: DataFrame) -> DataFrame:
    """Image near-dup pairs by perceptual hash: band-blocked candidate
    join (8 bands x 8 bits — pigeonhole guarantees recall for hamming
    <= 7), then an exact popcount verify. The SimHash dedup pattern
    applied to the multimodal payload column; JVM-side join + verify,
    Python only in the per-asset hash above."""
    h = phash_media(media)
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("phash"), b * PHASH_BANDS)
            .bitwiseAND(F.lit(255).cast("long"))
            .alias("bits"),
        )
        for b in range(PHASH_BANDS)
    ]
    blocked = h.select(
        "doc_id", "phash", F.explode(F.array(*bands)).alias("blk")
    )
    a = blocked.select(
        F.col("blk").alias("blk_a"),
        F.col("doc_id").alias("doc_a"),
        F.col("phash").alias("ha"),
    )
    b = blocked.select(
        F.col("blk").alias("blk_b"),
        F.col("doc_id").alias("doc_b"),
        F.col("phash").alias("hb"),
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        a.join(
            b,
            (F.col("blk_a") == F.col("blk_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= PHASH_MAX_HAMMING)
    )


def media_near_dup_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered entry: perceptual near-dup pairs over the synthetic
    media table (rows-only — the hash rides Python byte math that DuckDB
    can't mirror; recall/precision pinned by the planted-pair test)."""
    return near_dup_images(synthesize_media(spark, sf_dir))
