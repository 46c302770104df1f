"""Pure-stdlib WAV (PCM) codec + audio featurizer — the audio twin of
``png_codec.py``: strict multimodal mode gets REAL audio decode without
any external library (``wave``/``struct`` are stdlib), so the
decode→featurize pipeline runs on actual RIFF/WAVE bytes end-to-end.

Scope: mono or multi-channel integer PCM (8/16/24/32-bit), the format
the ``wave`` module handles. 8-bit PCM is UNSIGNED per the WAV spec
(silence = 0x80) — decoded samples are re-centered to signed. Features
are deterministic pure-Python math — same input bytes → same vector on
every executor.
"""

from __future__ import annotations

import io
import struct
import wave

FEATURE_DIM = 16


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def _pack_sample(s: int, sampwidth: int) -> bytes:
    limit = (1 << (8 * sampwidth - 1)) - 1
    s = max(-limit - 1, min(limit, int(s)))
    if sampwidth == 1:
        # WAV 8-bit PCM is UNSIGNED: signed value + 128 (silence = 0x80)
        return struct.pack("B", s + 128)
    if sampwidth == 3:
        return int(s & 0xFFFFFF).to_bytes(3, "little")
    return struct.pack({2: "<h", 4: "<i"}[sampwidth], s)


def encode_wav(
    samples: list[int], sample_rate: int = 16_000, sampwidth: int = 2
) -> bytes:
    """Mono PCM WAV from SIGNED integer samples (clamped to the sample
    width; 8-bit re-biased to the spec's unsigned encoding)."""
    if sampwidth not in (1, 2, 3, 4):
        raise ValueError(f"unsupported PCM sample width {sampwidth}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(b"".join(_pack_sample(s, sampwidth) for s in samples))
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, int, list[int]]:
    """(sample_rate, n_channels, sampwidth, interleaved SIGNED samples).

    8-bit PCM (unsigned per spec) re-centers to signed; 24-bit unpacks
    3-byte little-endian two's complement (no struct code exists for it).
    """
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            rate, channels, width = (
                w.getframerate(), w.getnchannels(), w.getsampwidth()
            )
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError, struct.error, RuntimeError) as e:
        # truncated/bit-flipped RIFF container must fail as a CLEAN codec
        # error, never a leaked wave.Error/EOFError — nor the bare
        # RuntimeError stdlib wave raises on some corrupt chunk sizes
        # (r8 corrupt-bytes lens, found by the bit-flip sweep)
        raise ValueError(f"corrupt WAV payload: {e}") from None
    if width == 1:
        samples = [b - 128 for b in raw]
    elif width == 3:
        samples = [
            int.from_bytes(raw[i : i + 3], "little", signed=True)
            for i in range(0, len(raw) - len(raw) % 3, 3)
        ]
    elif width in (2, 4):
        fmt = {2: "h", 4: "i"}[width]
        # slice to the divisible prefix: a stream truncated MID-sample
        # otherwise makes struct.unpack reject the buffer length
        usable = len(raw) - len(raw) % width
        samples = list(struct.unpack(f"<{usable // width}{fmt}", raw[:usable]))
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    return rate, channels, width, samples


def audio_features(
    sample_rate: int,
    samples: list[int],
    sampwidth: int = 2,
    bins: int = FEATURE_DIM,
    channels: int = 1,
) -> list[float]:
    """``bins``-d deterministic feature vector:

    [0] RMS amplitude (normalized to full scale)
    [1] zero-crossing rate (per sample)
    [2] duration in seconds / 60, capped at 1
    [3:] normalized |amplitude| histogram over ``bins - 3`` equal ranges —
         the spectral-envelope stand-in that needs no FFT library.
    """
    full = float(1 << (8 * sampwidth - 1))
    n = len(samples)
    if n == 0:
        return [0.0] * bins
    rms = (sum(s * s for s in samples) / n) ** 0.5 / full
    # zero crossings on ONE channel: interleaved multi-channel samples
    # would compare L against R (mono path unchanged: [::1])
    ch0 = samples[:: max(channels, 1)]
    zc = sum(
        1 for a, b in zip(ch0, ch0[1:]) if (a >= 0) != (b >= 0)
    ) / max(len(ch0) - 1, 1)
    # duration counts FRAMES, not interleaved samples
    dur = min(n / max(channels, 1) / max(sample_rate, 1) / 60.0, 1.0)
    n_hist = bins - 3
    hist = [0] * n_hist
    for s in samples:
        idx = min(int(abs(s) / full * n_hist), n_hist - 1)
        hist[idx] += 1
    return [rms, zc, dur] + [h / n for h in hist]
