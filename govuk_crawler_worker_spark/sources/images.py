"""Deterministic image codecs for the image+caption payload.

The payload schema is the BASELINE input_hint:
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)``.

The sandbox has no image libraries (no PIL/opencv), so the codecs here are
self-contained and deterministic:

* ``png``  — a REAL minimal PNG (8-bit RGB, zlib, filter 0): lossless,
  readable by any standard decoder.  Exercises the exact-equality branch of
  the per-row invariant.
* ``jpeg`` — STUB LOSSY CODEC ("QIM1"): a clearly-marked stand-in for a JPEG
  encoder.  It quantizes pixels to a step of 4 (drops 2 LSBs) and
  zlib-compresses, giving a deterministic ~46.9 dB PSNR — comfortably above
  the ≥40 dB gate — while keeping all Spark-side plumbing (binary column,
  batch decode inside mapInPandas, PSNR validation) real and tested.  A real
  deployment swaps ``encode_lossy``/``decode_lossy`` for libjpeg bindings;
  nothing else changes.

phash: 8×8 mean hash over a grayscale box-downsample → int64, the payload's
``phash`` column and the near-duplicate key for image dedup.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_QIM_MAGIC = b"QIM1"
_QIM_STEP = 4  # quantization step → PSNR = 10*log10(255^2/(step^2/12)) ≈ 46.9 dB


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """8-bit RGB (h, w, 3) → standard PNG bytes (filter 0 per scanline)."""
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNGs produced by encode_png (8-bit RGB, filters 0-only)."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos, w = 8, 0
    h = 0
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h = struct.unpack(">II", body[:8])
        elif tag == b"IDAT":
            idat += body
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    if raw[:, 0].any():
        raise ValueError("unsupported PNG filter")
    return raw[:, 1:].reshape(h, w, 3).copy()


def encode_lossy(pixels: np.ndarray) -> bytes:
    """STUB lossy encoder (see module docstring) — NOT real JPEG bytes."""
    h, w, _ = pixels.shape
    q = (pixels.astype(np.int32) // _QIM_STEP * _QIM_STEP + _QIM_STEP // 2).clip(
        0, 255
    ).astype(np.uint8)
    return _QIM_MAGIC + struct.pack(">IIB", w, h, _QIM_STEP) + zlib.compress(
        q.tobytes(), 6
    )


def decode_lossy(data: bytes) -> np.ndarray:
    if not data.startswith(_QIM_MAGIC):
        raise ValueError("not a QIM1 payload")
    w, h, _step = struct.unpack(">IIB", data[4:13])
    return np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8).reshape(h, w, 3).copy()


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Dispatch on the payload ``fmt`` column."""
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        return decode_lossy(data)
    raise NotImplementedError(
        f"decode for fmt={fmt!r} requires an image library not present in this "
        "container; plumbing is format-agnostic"
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def phash64(pixels: np.ndarray) -> int:
    """8×8 mean hash → signed int64 (the payload ``phash`` column)."""
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    small = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (small > small.mean()).flatten()
    value = 0
    for bit in bits:
        value = (value << 1) | int(bit)
    return value - (1 << 64) if value >= (1 << 63) else value


def make_pixels(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Deterministic structured test image: smooth gradient + seeded noise
    (smooth content keeps lossy PSNR meaningful, noise keeps phashes apart)."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 / max(w - 1, 1)),
            (yy * 255 / max(h - 1, 1)),
            ((xx + yy) * 255 / max(w + h - 2, 1)),
        ],
        axis=-1,
    )
    noise = rng.integers(-16, 17, size=(h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


# -- deterministic raw video container ("NVID1") -----------------------------
# The sandbox has no ffmpeg, so (as with the QIM1 lossy image stand-in) the
# CONTAINER is self-contained and deterministic while the Spark-side
# plumbing that consumes it (operators/multimodal.frame_sample) is real: a
# production deployment swaps these two functions for ffmpeg bindings
# without touching plan shape, schema, or partitioning.
#
#   NVID1 := b"NVID1" | u16 n_frames | u16 w | u16 h | n·(w·h·3 raw RGB)

VIDEO_MAGIC = b"NVID1"


def encode_video(frames: "list[np.ndarray]") -> bytes:
    import struct

    h, w, _ = frames[0].shape
    out = [VIDEO_MAGIC, struct.pack(">HHH", len(frames), w, h)]
    for f in frames:
        assert f.shape == (h, w, 3)
        out.append(f.astype(np.uint8).tobytes())
    return b"".join(out)


def decode_video(data: bytes) -> "list[np.ndarray]":
    import struct

    if data[:5] != VIDEO_MAGIC:
        raise NotImplementedError(
            "unknown video container; real deployments plug ffmpeg here"
        )
    n, w, h = struct.unpack(">HHH", data[5:11])
    frame_sz = w * h * 3
    return [
        np.frombuffer(data[11 + i * frame_sz : 11 + (i + 1) * frame_sz], np.uint8)
        .reshape(h, w, 3)
        .copy()
        for i in range(n)
    ]
