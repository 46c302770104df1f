"""Multimodal plumbing tests: the decode is a deterministic fake, but the
Spark-side schema / Arrow batching / partitioning must be real."""

from __future__ import annotations

import pytest

from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.functions import multimodal as mm
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def payloads(spark):
    return mm.with_payload(load_table(spark, SF_DIR, "documents"))


def test_payload_schema(payloads):
    dtypes = dict(payloads.dtypes)
    assert dtypes["payload"] == "binary"
    assert dtypes["media_meta"].startswith("struct<media_type:string")


def test_extract_features_shape_and_determinism(payloads):
    feats = mm.extract_features(payloads).collect()
    assert len(feats) == 500
    row = next(r for r in feats if r.doc_id == 0)
    assert len(row.features) == mm.FEATURE_DIM
    assert row.n_bytes > 0 and len(row.sha_hex) == 64
    # deterministic across a second run
    again = {r.doc_id: r.features for r in mm.extract_features(payloads).collect()}
    assert again[0] == row.features
    # histogram features sum to ~1 (normalized by byte count)
    assert abs(sum(row.features) - 1.0) < 1e-6


def test_strict_decoder_raises(payloads):
    import pyspark.errors

    with pytest.raises(Exception) as ei:
        mm.extract_features(payloads, decoder=mm.strict_decode).collect()
    assert "NotImplementedError" in str(ei.value) or "decode" in str(ei.value)


def test_frame_sample_chunks(payloads):
    frames = mm.frame_sample(payloads, every_n_bytes=64)
    pdf = frames.filter("doc_id = 1").orderBy("frame_idx").collect()
    total = sum(len(r.frame_payload) for r in pdf)
    orig = payloads.filter("doc_id = 1").collect()[0].payload
    assert total == len(orig)
    assert b"".join(r.frame_payload for r in pdf) == bytes(orig)
    assert all(len(r.frame_payload) <= 64 for r in pdf)


def test_resize_images_shapes_and_determinism(payloads):
    from duck_delta_share_spark.functions import multimodal as mm

    out = mm.resize_images(payloads, target_w=8, target_h=4).collect()
    assert len(out) == payloads.count()
    for r in out:
        assert len(r.payload) == 32
        assert r.media_meta.width == 8 and r.media_meta.height == 4
    again = {r.doc_id: bytes(r.payload) for r in mm.resize_images(payloads, 8, 4).collect()}
    assert {r.doc_id: bytes(r.payload) for r in out} == again


def test_strict_resize_raises(payloads):
    import pytest as _pytest

    from duck_delta_share_spark.functions import multimodal as mm

    with _pytest.raises(Exception, match="NotImplementedError|imaging"):
        mm.resize_images(payloads, 4, 4, resizer=mm.strict_resize).collect()


# ---------------------------------------------------------------------------
# Pure-Python PNG codec + strict mode on real image bytes (VERDICT r1 #1)
# ---------------------------------------------------------------------------


def _make_pixels(w, h, channels, seed=0):
    import random

    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(w * h * channels))


def test_png_roundtrip_all_channel_counts():
    from duck_delta_share_spark.functions import png_codec as pc

    for channels in (1, 2, 3, 4):
        w, h = 13, 7
        pixels = _make_pixels(w, h, channels, seed=channels)
        data = pc.encode_png(w, h, channels, pixels)
        assert pc.is_png(data)
        rw, rh, rc, rpix = pc.decode_png(data)
        assert (rw, rh, rc) == (w, h, channels)
        assert rpix == pixels


def test_png_decode_all_scanline_filters():
    """Hand-build IDAT streams exercising filters 1-4 (our encoder only
    emits 0); the unfilter must reconstruct the same pixels."""
    import struct
    import zlib

    from duck_delta_share_spark.functions import png_codec as pc

    w, h, channels = 5, 4, 3
    pixels = _make_pixels(w, h, channels, seed=9)
    stride = w * channels

    def filtered_stream(ftypes):
        out = bytearray()
        for y, ft in enumerate(ftypes):
            row = pixels[y * stride : (y + 1) * stride]
            prev = pixels[(y - 1) * stride : y * stride] if y else bytes(stride)
            out.append(ft)
            for x in range(stride):
                left = row[x - channels] if x >= channels else 0
                up = prev[x]
                ul = prev[x - channels] if x >= channels else 0
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = left
                elif ft == 2:
                    pred = up
                elif ft == 3:
                    pred = (left + up) // 2
                else:
                    pred = pc._paeth(left, up, ul)
                out.append((row[x] - pred) & 0xFF)
        return bytes(out)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        pc.PNG_SIGNATURE
        + pc._chunk(b"IHDR", ihdr)
        + pc._chunk(b"IDAT", zlib.compress(filtered_stream([1, 2, 3, 4])))
        + pc._chunk(b"IEND", b"")
    )
    assert pc.decode_png(png) == (w, h, channels, pixels)


def test_png_palette_expands_to_rgb():
    import struct
    import zlib

    from duck_delta_share_spark.functions import png_codec as pc

    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red green blue
    idx_rows = [bytes([0, 1, 2]), bytes([2, 1, 0])]
    stream = b"".join(b"\x00" + r for r in idx_rows)
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    png = (
        pc.PNG_SIGNATURE
        + pc._chunk(b"IHDR", ihdr)
        + pc._chunk(b"PLTE", palette)
        + pc._chunk(b"IDAT", zlib.compress(stream))
        + pc._chunk(b"IEND", b"")
    )
    w, h, c, pix = pc.decode_png(png)
    assert (w, h, c) == (3, 2, 3)
    assert pix == bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 255, 0, 255, 0, 255, 0, 0]
    )


def test_png_unsupported_variants_raise():
    import struct

    import pytest as _pytest

    from duck_delta_share_spark.functions import png_codec as pc

    with _pytest.raises(pc.UnsupportedImageError):
        pc.decode_png(b"JFIF not a png")
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    png16 = pc.PNG_SIGNATURE + pc._chunk(b"IHDR", ihdr16) + pc._chunk(b"IEND", b"")
    with _pytest.raises(pc.UnsupportedImageError, match="bit depth"):
        pc.decode_png(png16)
    ihdr_il = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    png_il = pc.PNG_SIGNATURE + pc._chunk(b"IHDR", ihdr_il) + pc._chunk(b"IEND", b"")
    with _pytest.raises(pc.UnsupportedImageError, match="interlaced"):
        pc.decode_png(png_il)


def test_strict_decode_real_png_features(spark):
    """strict mode on ACTUAL image bytes end-to-end through mapInPandas:
    features are the luminance histogram of the decoded pixels."""
    from duck_delta_share_spark.functions import png_codec as pc

    rows = []
    for doc_id in range(8):
        w, h = 6 + doc_id, 5
        pixels = _make_pixels(w, h, 3, seed=doc_id)
        rows.append((doc_id, bytearray(pc.encode_png(w, h, 3, pixels)), pixels))
    df = spark.createDataFrame(
        [(i, p) for i, p, _ in rows], "doc_id long, payload binary"
    )
    feats = {
        r.doc_id: r.features
        for r in mm.extract_features(df, decoder=mm.strict_decode).collect()
    }
    assert len(feats) == 8
    for doc_id, _, pixels in rows:
        expected = pc.luminance_histogram(pixels, 3, bins=mm.FEATURE_DIM)
        assert feats[doc_id] == pytest.approx(expected)


def test_strict_resize_real_png(spark):
    from duck_delta_share_spark.functions import png_codec as pc

    w, h = 16, 12
    pixels = _make_pixels(w, h, 3, seed=3)
    df = spark.createDataFrame(
        [(1, bytearray(pc.encode_png(w, h, 3, pixels)))],
        "doc_id long, payload binary",
    )
    out = mm.resize_images(df, 4, 4, resizer=mm.strict_resize).collect()[0]
    rw, rh, rc, rpix = pc.decode_png(bytes(out.payload))
    assert (rw, rh, rc) == (4, 4, 3)
    assert rpix == pc.resize_nearest(pixels, w, h, 3, 4, 4)
    # solid-color image stays solid through resize
    solid = pc.encode_png(10, 10, 3, bytes([7, 99, 200] * 100))
    resized = mm.strict_resize(solid, 3, 3)
    assert pc.decode_png(resized)[3] == bytes([7, 99, 200] * 9)


def test_wav_roundtrip_and_features():
    import math

    from duck_delta_share_spark.functions import wav_codec as wc

    samples = [int(10_000 * math.sin(2 * math.pi * 440 * t / 8000)) for t in range(1600)]
    data = wc.encode_wav(samples, sample_rate=8000)
    assert wc.is_wav(data)
    rate, channels, width, back = wc.decode_wav(data)
    assert (rate, channels, width) == (8000, 1, 2)
    assert back == samples

    f = wc.audio_features(rate, back)
    assert len(f) == 16
    # 440 Hz sine at 8 kHz: ~2*440/8000 crossings per sample, RMS ~ A/sqrt(2)
    assert abs(f[1] - 2 * 440 / 8000) < 0.01
    assert abs(f[0] - (10_000 / 32768) / 2**0.5) < 0.01
    assert abs(sum(f[3:]) - 1.0) < 1e-9  # histogram normalized


def test_strict_decode_dispatches_wav(spark):
    import math

    from duck_delta_share_spark.functions import multimodal as mm
    from duck_delta_share_spark.functions import wav_codec as wc

    samples = [int(5_000 * math.sin(2 * math.pi * 200 * t / 8000)) for t in range(400)]
    feats = mm.strict_decode(wc.encode_wav(samples, sample_rate=8000))
    assert len(feats) == 16 and feats[0] > 0

    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="PNG and WAV"):
        mm.strict_decode(b"\x00\x01garbage-not-a-media-file")


def test_multimodal_wav_strict_query(spark):
    from duck_delta_share_spark.plans import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["multimodal_wav_strict"].spark_fn(spark, SF_DIR).collect()
    assert len(rows) > 0
    # features arrive CSV-serialized (driver canonicalizer contract)
    by_id = {
        r.doc_id: tuple(float(v) for v in r.features.split(",")) for r in rows
    }
    # distinct tones -> distinct zero-crossing rates; all features real
    zcrs = {round(f[1], 4) for f in by_id.values()}
    assert len(zcrs) > 1
    assert all(f[0] > 0 for f in by_id.values())


def test_strict_decode_wav_wins_over_pil(monkeypatch):
    """With an imaging lib installed, Image.open raises on WAV bytes —
    strict_decode must route WAV payloads to the audio decoder BEFORE
    trying PIL (ADVICE r2)."""
    import sys
    import types

    from duck_delta_share_spark.functions import wav_codec as wc

    class _Boom:
        @staticmethod
        def open(*_a, **_k):
            raise ValueError("cannot identify image file")

    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = _Boom
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", _Boom)

    samples = [int(5000 * ((t % 50) / 25 - 1)) for t in range(400)]
    feats = mm.strict_decode(wc.encode_wav(samples, sample_rate=8000))
    assert len(feats) == mm.FEATURE_DIM
    assert any(f != 0 for f in feats)


def test_strict_decode_pil_failure_falls_back_to_pure_codec(monkeypatch):
    """A PIL that can't parse a (valid) PNG must fall through to the
    pure-Python codec, not crash the batch."""
    import sys
    import types

    class _Boom:
        @staticmethod
        def open(*_a, **_k):
            raise OSError("truncated file?")

    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = _Boom
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", _Boom)

    from duck_delta_share_spark.functions import png_codec as pc

    data = pc.encode_png(4, 4, 3, bytes(range(48)))
    feats = mm.strict_decode(data)
    assert len(feats) == mm.FEATURE_DIM
    assert abs(sum(feats) - 1.0) < 1e-6  # normalized histogram
