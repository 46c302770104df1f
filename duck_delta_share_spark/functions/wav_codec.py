"""Pure-stdlib WAV (PCM) codec + audio featurizer — the audio twin of
``png_codec.py``: strict multimodal mode gets REAL audio decode without
any external library (``wave``/``struct`` are stdlib), so the
decode→featurize pipeline runs on actual RIFF/WAVE bytes end-to-end.

Scope: mono or multi-channel integer PCM (8/16/32-bit), the format the
``wave`` module handles. Features are deterministic pure-Python math —
same input bytes → same vector on every executor.
"""

from __future__ import annotations

import io
import struct
import wave

FEATURE_DIM = 16


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def encode_wav(
    samples: list[int], sample_rate: int = 16_000, sampwidth: int = 2
) -> bytes:
    """Mono PCM WAV from integer samples (clamped to the sample width)."""
    limit = (1 << (8 * sampwidth - 1)) - 1
    fmt = {1: "b", 2: "<h", 4: "<i"}[sampwidth]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(
            b"".join(
                struct.pack(fmt, max(-limit - 1, min(limit, int(s)))) for s in samples
            )
        )
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """(sample_rate, n_channels, interleaved integer samples)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        rate, channels, width = w.getframerate(), w.getnchannels(), w.getsampwidth()
        raw = w.readframes(w.getnframes())
    fmt = {1: "b", 2: "h", 4: "i"}[width]
    samples = list(struct.unpack(f"<{len(raw) // width}{fmt}", raw))
    return rate, channels, samples


def audio_features(
    sample_rate: int, samples: list[int], sampwidth: int = 2, bins: int = FEATURE_DIM
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
    zc = sum(
        1 for a, b in zip(samples, samples[1:]) if (a >= 0) != (b >= 0)
    ) / max(n - 1, 1)
    dur = min(n / max(sample_rate, 1) / 60.0, 1.0)
    n_hist = bins - 3
    hist = [0] * n_hist
    for s in samples:
        idx = min(int(abs(s) / full * n_hist), n_hist - 1)
        hist[idx] += 1
    return [rms, zc, dur] + [h / n for h in hist]
