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
    return media_projection(datamodel.load_table(spark, sf_dir, "documents"))


def media_projection(docs: DataFrame) -> DataFrame:
    """The documents -> media projection as a pure stateless expression
    set, shared by the batch synthesize_media and the streaming ingest
    screen (works unchanged on a streaming frame — narrow, no shuffle).
    The wire envelope's `event_ts` column, when present, passes through
    so stateful streaming consumers (the watermarked CAS dedup) keep
    their event-time column; the batch documents table has no such
    column and is unaffected."""
    width = (F.col("doc_id") % 64 + 16).cast("int")
    height = (F.col("doc_id") % 48 + 16).cast("int")
    header = F.concat(
        F.lit(_MAGIC),
        F.encode(F.lpad(width.cast("string"), 6, "0"), "utf-8"),
        F.encode(F.lpad(height.cast("string"), 6, "0"), "utf-8"),
    )
    passthrough = [c for c in ("event_ts",) if c in docs.columns]
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "png")
        .when(F.col("doc_id") % 3 == 1, "jpeg")
        .otherwise("webp")
        .alias("media_format"),
        width.alias("width"),
        height.alias("height"),
        F.concat(header, F.encode(F.col("text"), "utf-8")).alias("payload"),
        *passthrough,
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


def _sniff_case(hexcol: str):
    """Magic-byte format sniff over a hex(payload) column — the CASE
    ladder shared by media_byte_entropy, media_sniff, and the streaming
    ingest screen (real container magics first, then the synthetic
    'FAKE' header, else unknown)."""
    return (
        F.when(F.expr(f"substring({hexcol}, 1, 8)") == "89504E47", "png")
        .when(F.expr(f"substring({hexcol}, 1, 6)") == "FFD8FF", "jpeg")
        .when(F.expr(f"substring({hexcol}, 1, 8)") == "47494638", "gif")
        .when(F.expr(f"substring({hexcol}, 1, 8)") == "52494646", "riff")
        .when(F.expr(f"substring({hexcol}, 1, 8)") == "46414B45", "fake-rgb")
        .otherwise("desconhecido")
    )


def media_sniff(media: DataFrame) -> DataFrame:
    """Ingest-time media screen: declared vs sniffed format, octet
    length, and the header-stripped body digest — the stateless front
    door of a media pipeline (mismatched magic, truncated payloads, and
    CAS identity established before any decode). Pure narrow JVM
    projection, so it runs unchanged on batch AND streaming frames."""
    hx = media.withColumn("h", F.hex("payload"))
    return hx.select(
        "doc_id",
        "media_format",
        _sniff_case("h").alias("formato_detectado"),
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.sha2(
            F.expr("substring(payload, 17, 2147483647)"), 256
        ).alias("corpo_sha256"),
    )


def media_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-asset byte-level statistics over the binary media payloads —
    the multimodal family's first oracle-checkable operator (round-9
    verdict task #7): no decode, pure byte math the DuckDB twin can
    re-derive on the same blob bytes.

    Per asset: magic-byte format sniff (the container-format check a
    media-ingest pipeline runs before ever decoding), octet length,
    distinct-byte count, modal-byte count, and the byte-histogram
    Shannon entropy (nats) — near ln(256) for compressed/encrypted
    payloads, low for flat fakes; the classic cheap screen for
    mislabeled or corrupt assets.

    Engine parity: both dialects hex() the SAME payload bytes and split
    the hex string into per-byte tokens (Spark `transform(sequence(..))`
    / DuckDB `unnest(range(..))`), so the histogram is integer-exact;
    the only float is the entropy, whose p*ln(p) terms are rounded to 6
    and accumulated in DECIMAL (the lexical_diversity_scores template),
    with the final negation applied AFTER the double cast plus a `+ 0.0`
    sign normalization in both dialects. Scale: the explode is bounded
    by corpus BYTE volume (the tokenization shape — partial aggregation
    collapses it map-side); at real media sizes the histogram would move
    into the existing Arrow-batched mapInPandas extractors, but the
    query surface stays this one.
    """
    from banking_streaming_etl_spark.functions import exact

    m = synthesize_media(spark, sf_dir)
    hx = m.select("doc_id", "media_format", F.hex("payload").alias("h"))
    meta = hx.select(
        "doc_id",
        "media_format",
        _sniff_case("h").alias("formato_detectado"),
    )
    bytes_ = hx.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(h) DIV 2), "
                "i -> substring(h, (i - 1) * 2 + 1, 2))"
            )
        ).alias("b"),
    )
    cnt = bytes_.groupBy("doc_id", "b").agg(F.count("*").alias("c"))
    # total bytes per asset from the BOUNDED histogram (<= 256 rows per
    # doc), not a second scan of the per-byte explode — the explode is
    # the expensive frame, and deriving n = SUM(c) off the counts keeps
    # it single-scan (round-11 bench adjudication of this query's cost)
    n = cnt.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    agg = (
        cnt.join(n, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.max("n").cast("bigint").alias("n_bytes"),
            F.count("*").cast("bigint").alias("bytes_distintos"),
            F.max("c").cast("bigint").alias("contagem_modal"),
            ((-F.sum(F.round(p * F.log(p), 6).cast(exact.DEC))
              .cast("double")) + F.lit(0.0)).alias("entropia_bytes"),
        )
    )
    return meta.join(agg, "doc_id").select(
        "doc_id", "media_format", "formato_detectado",
        "n_bytes", "bytes_distintos", "contagem_modal", "entropia_bytes",
    )


#: DuckDB twin: rebuilds the synthetic payload from `documents` with the
#: same derivation as synthesize_media (header 'FAKE' + zero-padded dims
#: + utf-8 text — hex() of a VARCHAR concat hexes the identical bytes).
MEDIA_BYTE_ENTROPY_SQL = """
WITH m AS (
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'png'
                WHEN doc_id % 3 = 1 THEN 'jpeg'
                ELSE 'webp' END AS media_format,
           hex('FAKE'
               || lpad(CAST(doc_id % 64 + 16 AS VARCHAR), 6, '0')
               || lpad(CAST(doc_id % 48 + 16 AS VARCHAR), 6, '0')
               || text) AS h
    FROM documents
),
b AS (
    SELECT doc_id, substring(h, (i - 1) * 2 + 1, 2) AS b
    FROM (SELECT doc_id, h,
                 unnest(range(1, length(h) // 2 + 1)) AS i
          FROM m)
),
cnt AS (SELECT doc_id, b, COUNT(*) AS c FROM b GROUP BY 1, 2),
n AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
agg AS (
    SELECT doc_id,
           CAST(MAX(n) AS BIGINT) AS n_bytes,
           CAST(COUNT(*) AS BIGINT) AS bytes_distintos,
           CAST(MAX(c) AS BIGINT) AS contagem_modal,
           (-CAST(SUM(CAST(ROUND(
                CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
                * LN(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 6)
              AS DECIMAL(28,6))) AS DOUBLE)) + 0.0 AS entropia_bytes
    FROM cnt JOIN n USING (doc_id)
    GROUP BY doc_id
)
SELECT m.doc_id, m.media_format,
       CASE WHEN substring(h, 1, 8) = '89504E47' THEN 'png'
            WHEN substring(h, 1, 6) = 'FFD8FF' THEN 'jpeg'
            WHEN substring(h, 1, 8) = '47494638' THEN 'gif'
            WHEN substring(h, 1, 8) = '52494646' THEN 'riff'
            WHEN substring(h, 1, 8) = '46414B45' THEN 'fake-rgb'
            ELSE 'desconhecido' END AS formato_detectado,
       n_bytes, bytes_distintos, contagem_modal, entropia_bytes
FROM m JOIN agg USING (doc_id)
"""


def media_body_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact binary dedup of media payloads by BODY digest — the
    content-addressed-storage step a media pipeline runs before any
    decode: sha-256 over the payload with its container header
    stripped, so the same asset re-encapsulated under different
    metadata (here: differing width/height header fields) still
    collapses to one cluster.

    Per asset: body digest, cluster size, canonical doc (min doc_id in
    the cluster — the keep-earliest policy of dedup_exact), a canonical
    flag, and how many distinct DECLARED container formats share the
    body (the re-encapsulation signal). All columns are integer /
    string exact — no floats, no rounding hazards. Scale: one digest
    shuffle (32-byte keys, the dedup_exact shape) + an equi-join of the
    per-digest aggregate back onto the asset frame; payload bytes never
    shuffle beyond the digest projection.
    """
    m = synthesize_media(spark, sf_dir)
    body = m.select(
        "doc_id",
        "media_format",
        F.sha2(
            F.expr("substring(payload, 17, 2147483647)"), 256
        ).alias("corpo_sha256"),
    )
    clusters = body.groupBy("corpo_sha256").agg(
        F.count("*").cast("bigint").alias("n_copias"),
        F.min("doc_id").alias("doc_canonico"),
        F.count_distinct("media_format").alias("formatos_no_cluster"),
    )
    return body.join(clusters, "corpo_sha256").select(
        "doc_id",
        "media_format",
        "corpo_sha256",
        "n_copias",
        "doc_canonico",
        (F.col("doc_id") == F.col("doc_canonico")).alias("eh_canonico"),
        "formatos_no_cluster",
    )


#: DuckDB twin on the same rebuilt payload bytes; the 16-char header is
#: pure ASCII, so VARCHAR substring(17) strips exactly the 16 header
#: BYTES and sha256 hashes the identical remaining utf-8 body bytes.
MEDIA_BODY_DEDUP_SQL = """
WITH m AS (
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'png'
                WHEN doc_id % 3 = 1 THEN 'jpeg'
                ELSE 'webp' END AS media_format,
           sha256(substring(
               'FAKE'
               || lpad(CAST(doc_id % 64 + 16 AS VARCHAR), 6, '0')
               || lpad(CAST(doc_id % 48 + 16 AS VARCHAR), 6, '0')
               || text, 17)) AS corpo_sha256
    FROM documents
),
clusters AS (
    SELECT corpo_sha256,
           CAST(COUNT(*) AS BIGINT) AS n_copias,
           MIN(doc_id) AS doc_canonico,
           CAST(COUNT(DISTINCT media_format) AS BIGINT)
               AS formatos_no_cluster
    FROM m
    GROUP BY corpo_sha256
)
SELECT doc_id, media_format, corpo_sha256, n_copias, doc_canonico,
       doc_id = doc_canonico AS eh_canonico, formatos_no_cluster
FROM m JOIN clusters USING (corpo_sha256)
"""
