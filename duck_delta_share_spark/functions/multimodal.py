"""Multimodal column plumbing (§2C): image/audio/video as opaque ``binary``
payloads with typed metadata structs, processed by Arrow-batched
``mapInPandas`` pipelines.

The decode step itself is STUBBED — the real image/audio libraries are not
in this environment — behind ``decoder=`` hooks: pass a real decoder
(PIL/av/soundfile) in production; the default is either a clearly-marked
``NotImplementedError`` (``strict=True``) or a deterministic fake that
exercises the full Spark plumbing (schema, partitioning, UDF signature,
Arrow batch shapes) end-to-end in tests.

Scale notes: payloads never pass through the driver; ``mapInPandas``
streams Arrow batches executor-side, and feature extraction is
embarrassingly parallel over input partitions (no shuffle). Batch size is
governed by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — lower it
for large payloads so a batch fits executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed metadata carried alongside every opaque payload.
MEDIA_META_FIELDS = [
    StructField("media_type", StringType()),  # image/audio/video
    StructField("format", StringType()),  # png/jpeg/wav/mp4/...
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", LongType()),
]

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha_hex", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for decode + feature-extract: a 16-d feature
    from the payload's byte histogram — stable across runs/partitions so
    pipelines built on it are testable."""
    if payload is None:
        return [0.0] * FEATURE_DIM
    counts = [0] * FEATURE_DIM
    for b in payload:
        counts[b % FEATURE_DIM] += 1
    n = max(len(payload), 1)
    return [c / n for c in counts]


def strict_decode(payload: bytes) -> list[float]:
    """REAL image decode → feature vector: PIL when installed, else the
    pure-Python PNG codec (``functions/png_codec.py``); the feature is a
    16-bin normalized luminance histogram either way. Non-image payloads
    raise — strict mode must never silently featurize garbage."""
    if payload is None:
        return [0.0] * FEATURE_DIM
    from duck_delta_share_spark.functions import png_codec, wav_codec

    data = bytes(payload)
    # Audio first: PIL raises UnidentifiedImageError (not ImportError) on
    # WAV bytes, which used to make the WAV branch unreachable wherever
    # PIL is installed (ADVICE r2).
    if wav_codec.is_wav(data):
        rate, ch, width, samples = wav_codec.decode_wav(data)
        # pass the REAL sample width and channel count: a 32-bit or stereo
        # WAV featurized under the old hardcoded 16-bit-mono assumption
        # clamped the histogram and doubled the duration
        return wav_codec.audio_features(
            rate, samples, sampwidth=width, channels=ch, bins=FEATURE_DIM
        )
    try:
        from PIL import Image  # real imaging lib, when the cluster has it
    except ImportError:
        Image = None
    if Image is not None:
        import io as _io

        try:
            img = Image.open(_io.BytesIO(data))
            img.load()
            # palette ('P') / exotic modes: expand to RGB so the feature
            # matches the pure-Python codec's PLTE expansion — same
            # payload must featurize identically on every cluster
            if img.mode not in ("L", "LA", "RGB", "RGBA"):
                img = img.convert("RGB")
            channels = len(img.getbands())
            return png_codec.luminance_histogram(
                img.tobytes(), channels, bins=FEATURE_DIM
            )
        except Exception:
            pass  # fall through to the pure-Python decoders
    if png_codec.is_png(data):
        _, _, channels, pixels = png_codec.decode_png(data)
        return png_codec.luminance_histogram(pixels, channels, bins=FEATURE_DIM)
    raise NotImplementedError(
        "strict decode supports PNG and WAV natively; other formats "
        "(jpeg/mp4/...) need an imaging/av library — pass decoder=... or "
        "use fake_decode"
    )


def with_payload(df: DataFrame, src_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload + metadata struct from a source
    column (in production the payload arrives from the lake as binary)."""
    return df.withColumn("payload", F.col(src_col).cast("binary")).withColumn(
        "media_meta",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            F.octet_length(F.col(src_col).cast("binary")).alias("width"),
            F.lit(1).alias("height"),
            F.lit(0).cast("long").alias("duration_ms"),
        ),
    )


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: Callable[[bytes], list[float]] = fake_decode,
) -> DataFrame:
    """Decode + featurize payloads via mapInPandas (Arrow batches, no
    shuffle). Output: (doc_id, n_bytes, sha_hex, features: array<float>).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else 0),
                    "sha_hex": payloads.map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                    "features": payloads.map(decoder),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, FEATURES_SCHEMA)


def frame_sample(
    df: DataFrame,
    every_n_bytes: int = 64,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Video-style frame sampling stub: split each payload into fixed-size
    'frames' and emit one row per sampled frame (posexplode keeps frame
    order). The chunking is real distributed plumbing; only the frame
    *decode* is faked downstream."""
    n_frames = F.ceil(F.octet_length(payload_col) / F.lit(every_n_bytes)).cast("int")
    # sequence(0, -1) counts DOWN ([0, -1]) — an empty payload must yield
    # an empty array (posexplode then emits zero rows), not two bogus frames
    idx = F.when(n_frames > 0, F.sequence(F.lit(0), n_frames - 1)).otherwise(
        F.array().cast("array<int>")
    )
    frames = F.transform(
        idx,
        lambda i: F.substring(
            F.col(payload_col), (i * every_n_bytes + 1).cast("int"), every_n_bytes
        ),
    )
    return df.select(
        id_col, F.posexplode(frames).alias("frame_idx", "frame_payload")
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_meta", StructType(MEDIA_META_FIELDS)),
    ]
)


def fake_resize(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Deterministic stand-in for image resize: nearest-neighbor byte
    resampling to exactly ``target_w * target_h`` bytes. Preserves the
    determinism contract (same input → same output on any partition)."""
    n = target_w * target_h
    if not payload:
        return bytes(n)
    src = len(payload)
    return bytes(payload[(i * src) // n] for i in range(n))


def strict_resize(payload: bytes, target_w: int, target_h: int) -> bytes:
    """REAL image resize: decode PNG (pure-Python codec), nearest-neighbor
    resample, re-encode PNG. Non-PNG payloads raise rather than corrupt."""
    from duck_delta_share_spark.functions import png_codec

    data = bytes(payload or b"")
    if not png_codec.is_png(data):
        raise NotImplementedError(
            "strict resize supports PNG natively; other formats need an "
            "imaging library — pass resizer=... or use fake_resize"
        )
    w, h, channels, pixels = png_codec.decode_png(data)
    resized = png_codec.resize_nearest(pixels, w, h, channels, target_w, target_h)
    return png_codec.encode_png(target_w, target_h, channels, resized)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    resizer: Callable[[bytes, int, int], bytes] = fake_resize,
) -> DataFrame:
    """Resize every image payload via mapInPandas (Arrow batches, no
    shuffle); emits the resized payload with updated width/height metadata.
    At scale this is the classic embarrassingly-parallel media transform:
    cost scales with bytes scanned, batch size bounds executor memory."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        png_magic = b"\x89PNG\r\n\x1a\n"

        for pdf in it:
            resized = pdf[payload_col].map(lambda p: resizer(p, target_w, target_h))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": resized,
                    # format from the ACTUAL output bytes: strict_resize
                    # re-encodes PNG containers, fake_resize emits raw
                    # buffers — a hardcoded 'raw' label would make
                    # consumers misread PNG bytes as pixels
                    "media_meta": [
                        {
                            "media_type": "image",
                            "format": "png"
                            if (p or b"")[:8] == png_magic
                            else "raw",
                            "width": target_w,
                            "height": target_h,
                            "duration_ms": 0,
                        }
                        for p in resized
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, RESIZED_SCHEMA)
