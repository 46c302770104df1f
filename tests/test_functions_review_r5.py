"""Regression tests for the round-5 functions/ + remaining-operators
self-review findings: WAV sample-width/sign handling, stereo audio
features, as-of NULL timestamps + tie determinism, empty-payload frame
sampling, resize metadata honesty, salted-agg salt range, and LSH band
divisibility validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# WAV codec: widths and signedness
# ---------------------------------------------------------------------------


def test_wav_8bit_unsigned_roundtrip_and_silence():
    from duck_delta_share_spark.functions import wav_codec as wc

    silence = [0] * 100
    data = wc.encode_wav(silence, sample_rate=8000, sampwidth=1)
    # spec: 8-bit PCM silence is 0x80 bytes
    with_header = data
    assert b"\x80" * 50 in with_header
    rate, ch, width, back = wc.decode_wav(data)
    assert (rate, ch, width) == (8000, 1, 1)
    assert back == silence
    f = wc.audio_features(rate, back, sampwidth=1)
    assert f[0] == pytest.approx(0.0)  # silent, not full-scale

    loud = [100, -100] * 50
    rt = wc.decode_wav(wc.encode_wav(loud, sampwidth=1))[3]
    assert rt == loud


def test_wav_24bit_roundtrip():
    from duck_delta_share_spark.functions import wav_codec as wc

    samples = [0, 1, -1, 8_000_000, -8_000_000]
    data = wc.encode_wav(samples, sampwidth=3)
    rate, ch, width, back = wc.decode_wav(data)
    assert width == 3 and back == samples


def test_wav_32bit_features_use_real_width():
    from duck_delta_share_spark.functions import multimodal, wav_codec as wc

    # full-scale-ish 32-bit sine: rms must be ~A/(2^31)/sqrt(2), not >1
    import math

    amp = 1_000_000_000
    samples = [
        int(amp * math.sin(2 * math.pi * 440 * t / 8000)) for t in range(800)
    ]
    data = wc.encode_wav(samples, sample_rate=8000, sampwidth=4)
    f = multimodal.strict_decode(data)
    assert f[0] == pytest.approx(amp / (1 << 31) / 2**0.5, rel=0.01)
    assert all(0.0 <= h <= 1.0 for h in f[3:])


def test_wav_stereo_duration_and_zcr():
    import io
    import struct
    import wave

    from duck_delta_share_spark.functions import wav_codec as wc

    # stereo: L = +1000 constant, R = -1000 constant — NO zero crossings
    # within either channel; interleaved comparison would cross every step
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(
            b"".join(struct.pack("<hh", 1000, -1000) for _ in range(8000))
        )
    rate, ch, width, samples = wc.decode_wav(buf.getvalue())
    assert ch == 2
    f = wc.audio_features(rate, samples, sampwidth=width, channels=ch)
    assert f[1] == 0.0  # per-channel zero-crossing rate
    assert f[2] == pytest.approx(1.0 / 60.0)  # 1 second, frames not samples


# ---------------------------------------------------------------------------
# as-of join: NULL timestamps and deterministic ties
# ---------------------------------------------------------------------------


def test_asof_null_timestamps_never_match(spark):
    from duck_delta_share_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", "2024-01-01 00:00:30"), ("k", None)],
        "id string, lts string",
    ).select("id", F.col("lts").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [("k", None, 99.0), ("k", "2024-01-01 00:00:10", 1.0)],
        "id string, rts string, val double",
    ).select("id", F.col("rts").cast("timestamp").alias("rts"), "val")

    out = {
        (str(r["lts"]), r["asof_value"])
        for r in asof_join(left, right, "id", "lts", "rts", "val").collect()
    }
    # NULL right ts must not be carried; NULL left ts matches nothing
    assert out == {("2024-01-01 00:00:30", 1.0), ("None", None)}

    fwd = {
        (str(r["lts"]), r["asof_value"])
        for r in asof_join(
            left, right, "id", "lts", "rts", "val", direction="forward"
        ).collect()
    }
    assert fwd == {("2024-01-01 00:00:30", None), ("None", None)}


def test_asof_duplicate_right_ts_deterministic(spark):
    from duck_delta_share_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", "2024-01-01 00:01:00")], "id string, lts string"
    ).select("id", F.col("lts").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [("k", "2024-01-01 00:00:10", v) for v in (5.0, 2.0, 9.0)],
        "id string, rts string, val double",
    ).select("id", F.col("rts").cast("timestamp").alias("rts"), "val")
    vals = {
        asof_join(left, right.repartition(8), "id", "lts", "rts", "val")
        .collect()[0]["asof_value"]
        for _ in range(3)
    }
    assert vals == {9.0}  # last() over value-ordered ties: stable maximum


# ---------------------------------------------------------------------------
# frame_sample: empty payloads emit zero frames
# ---------------------------------------------------------------------------


def test_frame_sample_empty_payload(spark):
    from duck_delta_share_spark.functions.multimodal import frame_sample

    df = spark.createDataFrame(
        [(1, b""), (2, None), (3, b"x" * 130)], "doc_id long, payload binary"
    )
    got = frame_sample(df, every_n_bytes=64).groupBy("doc_id").count().collect()
    counts = {r["doc_id"]: r["count"] for r in got}
    assert counts == {3: 3}  # 130 bytes -> 3 frames; empty/NULL -> none


# ---------------------------------------------------------------------------
# resize metadata reflects the actual output format
# ---------------------------------------------------------------------------


def test_resize_metadata_format(spark):
    from duck_delta_share_spark.functions import png_codec
    from duck_delta_share_spark.functions.multimodal import (
        fake_resize,
        resize_images,
        strict_resize,
    )

    png = png_codec.encode_png(4, 4, 1, bytes(range(16)))
    df = spark.createDataFrame([(1, png)], "doc_id long, payload binary")
    raw_fmt = resize_images(df, 2, 2, resizer=fake_resize).collect()[0]
    assert raw_fmt["media_meta"]["format"] == "raw"
    png_fmt = resize_images(df, 2, 2, resizer=strict_resize).collect()[0]
    assert png_fmt["media_meta"]["format"] == "png"
    assert png_codec.is_png(bytes(png_fmt["payload"]))


# ---------------------------------------------------------------------------
# salted_agg: salt range honors n_salts (pmod, not signed %)
# ---------------------------------------------------------------------------


def test_salted_agg_salt_range(spark):
    from duck_delta_share_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [("a", i, 1.0) for i in range(500)], "k string, event_id long, v double"
    )
    out = salted_agg(
        df,
        ["k"],
        {"n": (F.count(F.lit(1)), F.sum("n"))},
        salt_col="event_id",
        n_salts=8,
    )
    assert out.collect()[0]["n"] == 500
    # phase-1 partial count must respect the documented spread
    salt = F.pmod(F.xxhash64(F.col("event_id")), F.lit(8))
    n_partials = df.select(salt.alias("s")).distinct().count()
    assert n_partials <= 8


# ---------------------------------------------------------------------------
# LSH: bands must divide num_hashes
# ---------------------------------------------------------------------------


def test_lsh_bands_must_divide(spark):
    from duck_delta_share_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    sigs = minhash_signatures(df, num_hashes=32)
    with pytest.raises(ValueError, match="divide"):
        lsh_candidate_pairs(sigs, num_hashes=32, bands=5)


# ---------------------------------------------------------------------------
# simhash: pigeonhole blocking has exact recall at the hamming budget
# ---------------------------------------------------------------------------


def test_simhash_pigeonhole_exact_recall(spark):
    from duck_delta_share_spark.operators.dedup import simhash_near_pairs

    # signatures differing ONLY in the top prefix bits: prefix blocking
    # (the old default) separates them into different buckets and misses
    # the pair; pigeonhole must find every pair within the budget
    sig = spark.createDataFrame(
        [
            (1, (0b1 << 47) | 0b1010),
            (2, 0b1010),              # hamming 1 from doc 1 (top bit)
            (3, 0b1010 ^ 0b11),       # hamming 2 from doc 2 (low bits)
            (4, (1 << 40) | (1 << 20) | (1 << 5)),  # far from everything
        ],
        "doc_id long, simhash long",
    )
    prefix = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(
            sig, max_hamming=2, prefix_bits=8, bits=48
        ).collect()
    }
    pigeon = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(
            sig, max_hamming=2, bits=48, method="pigeonhole"
        ).collect()
    }
    assert (1, 2) not in prefix  # the old mode's documented miss
    assert pigeon == {(1, 2), (2, 3)}  # exact recall, no false pairs kept
