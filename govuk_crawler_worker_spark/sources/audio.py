"""Deterministic PCM WAV codec — a REAL audio container, stdlib+numpy only.

The multimodal contract (SURVEY.md §2 training-data ops; reference has no
audio — this is part of the LLM-pipeline operator family the engine adds)
treats audio as an opaque ``binary`` column with typed metadata.  Unlike
JPEG/ffmpeg (no codec libs in this environment — those decode slots are
honest stand-ins, sources/images.py), canonical RIFF/WAVE PCM 16-bit LE is
fully specifiable in a page of struct-packing, so the audio path ships a
REAL format end-to-end: encode, chunk-walking decode, resample, windowed
features — no stubs.

Layout (little-endian):

    RIFF <u32 size> WAVE
    fmt  <u32 16> <u16 pcm=1> <u16 ch> <u32 rate> <u32 byte_rate>
         <u16 block_align> <u16 bits=16>
    data <u32 nbytes> <i16 interleaved samples>

Decoder walks chunks (skipping unknown ones, as the spec requires), so WAVs
with LIST/INFO chunks from other tools parse too.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """PCM 16-bit WAV from float samples in [-1, 1] (or int16 passthrough).

    ``samples``: shape (n,) mono or (n, ch) interleaved-by-row."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        samples = (np.clip(samples, -1.0, 1.0) * 32767.0).round().astype("<i2")
    ch = samples.shape[1]
    data = np.ascontiguousarray(samples.astype("<i2")).tobytes()
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = b"WAVE" + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """(samples float64 (n, ch) in [-1, 1], sample_rate).  Raises ValueError
    on anything that is not a PCM-16 RIFF/WAVE stream."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, rate, ch, raw = 12, None, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        chunk = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            if len(chunk) < 16:
                raise ValueError("truncated fmt chunk")
            codec, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", chunk[:16])
            if codec != 1 or bits != 16:
                raise ValueError(f"unsupported WAV codec={codec} bits={bits}")
        elif tag == b"data":
            raw = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    n = len(raw) // (2 * ch)
    samples = np.frombuffer(raw[: n * 2 * ch], dtype="<i2").reshape(n, ch)
    return samples.astype(np.float64) / 32767.0, int(rate)


def make_sine(
    freq_hz: float, amp: float, rate: int, duration_s: float, phase: float = 0.0
) -> np.ndarray:
    """Deterministic mono test tone (the audio analogue of make_pixels)."""
    t = np.arange(int(round(rate * duration_s)), dtype=np.float64) / rate
    return amp * np.sin(2.0 * np.pi * freq_hz * t + phase)


def resample_linear(samples: np.ndarray, rate: int, target_rate: int) -> np.ndarray:
    """Linear-interpolation resample, per channel (the classic cheap
    resampler; a production pipeline would swap in polyphase/sinc — the
    Spark-side plumbing is identical)."""
    if rate == target_rate:
        return samples
    n = samples.shape[0]
    m = max(1, int(round(n * target_rate / rate)))
    src = np.arange(n, dtype=np.float64)
    dst = np.linspace(0.0, n - 1, m)
    return np.stack(
        [np.interp(dst, src, samples[:, c]) for c in range(samples.shape[1])], axis=1
    )
