"""Corrupt-bytes lens (r8) on the multimodal strict codecs: a lake
corpus WILL contain truncated uploads, bit-rotted blobs, and adversarial
headers. The contract for strict_decode on any byte string: return a
feature vector OR raise a CLEAN, typed codec error — never leak
struct.error / zlib.error / wave.Error / EOFError / IndexError out of an
executor UDF, never hang, never balloon memory on a declared-huge or
decompression-bomb payload.

Found + fixed with this lens: IHDR struct.error and IDAT zlib.error
leaks, palette-overrun IndexError, an UNBOUNDED zlib.decompress (a
300-byte IDAT legally inflates to gigabytes before any length check),
wave.Error/EOFError leaks on truncated RIFF, and struct.error on a
stream truncated mid-sample.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from duck_delta_share_spark.functions.multimodal import strict_decode
from duck_delta_share_spark.functions.png_codec import (
    MAX_PIXELS,
    UnsupportedImageError,
    encode_png,
)
from duck_delta_share_spark.functions.wav_codec import encode_wav

CLEAN = (UnsupportedImageError, NotImplementedError, ValueError)


def _contract(payload: bytes) -> None:
    """strict_decode must featurize or fail with a CLEAN error type."""
    try:
        out = strict_decode(payload)
    except CLEAN:
        return
    assert isinstance(out, list) and len(out) == 16


def _png() -> bytes:
    pixels = bytes((x * 7 + y * 13) % 256 for y in range(6) for x in range(8 * 3))
    return encode_png(8, 6, 3, pixels)


def _wav() -> bytes:
    return encode_wav([int(1000 * ((i % 7) - 3)) for i in range(200)])


def test_truncations_fail_clean():
    png, wav = _png(), _wav()
    for payload in (png, wav):
        for k in range(1, len(payload), 3):
            _contract(payload[:k])


def test_bit_flips_fail_clean_or_featurize():
    png, wav = _png(), _wav()
    for payload in (png, wav):
        for pos in range(0, len(payload), 2):
            corrupted = bytearray(payload)
            corrupted[pos] ^= 0xFF
            _contract(bytes(corrupted))


def test_declared_huge_dims_refused_fast():
    """A tiny payload declaring 2^24 x 2^24 pixels must be refused
    loudly BEFORE any allocation proportional to the declared size."""
    ihdr_body = struct.pack(">IIBBBBB", 1 << 24, 1 << 24, 8, 2, 0, 0, 0)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr_body)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 64))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(UnsupportedImageError, match="MAX_PIXELS"):
        strict_decode(bomb)
    assert (1 << 48) > MAX_PIXELS  # the declared size is over the budget


def test_decompression_bomb_capped():
    """Modest declared dims but an IDAT that inflates to ~256 MB: the
    inflate must be capped at the header's pixel budget, not
    materialize the whole stream before the length check."""
    import resource

    ihdr_body = struct.pack(">IIBBBBB", 8, 6, 8, 2, 0, 0, 0)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    # ~256 MB of zeros compresses to ~256 KB
    bomb_idat = zlib.compress(b"\x00" * (256 * 1024 * 1024), 9)
    assert len(bomb_idat) < 1024 * 1024
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr_body)
        + chunk(b"IDAT", bomb_idat)
        + chunk(b"IEND", b"")
    )
    before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    out = strict_decode(bomb)  # 8x6 prefix decodes fine; tail ignored
    after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert isinstance(out, list) and len(out) == 16
    # ru_maxrss is KB on Linux: the decode must not have inflated the
    # 256 MB tail (allow generous slack for interpreter noise)
    assert after - before < 128 * 1024, f"rss grew {after - before} KB"


def test_palette_overrun_fails_clean():
    """A palette image whose indices exceed the PLTE table must raise the
    codec error, not IndexError from the expansion."""

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr_body = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    raw = bytes([0, 5, 9])  # filter 0 + indices 5 and 9, palette has 2
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr_body)
        + chunk(b"PLTE", bytes(6))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(UnsupportedImageError, match="palette"):
        strict_decode(bad)


def test_garbage_with_magic_prefixes_fails_clean():
    import random

    rng = random.Random(31)
    for magic in (b"\x89PNG\r\n\x1a\n", b"RIFF\x00\x00\x00\x00WAVE"):
        for n in (0, 1, 7, 64, 500):
            _contract(magic + bytes(rng.randrange(256) for _ in range(n)))
