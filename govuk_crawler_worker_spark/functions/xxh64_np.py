"""Vectorized XXH64 over batches of short byte strings (numpy, uint64).

Implements the public XXH64 spec (Yann Collet, BSD) — the same function
Spark's ``xxhash64`` expression computes with its fixed seed 42 — over a
padded byte matrix, one masked pass per 8-byte lane instead of one call per
string.  Purpose: Arrow-side operators (simhash) whose ORACLE is defined in
terms of ``xxhash64(token)`` can hash tokens inside the vectorized kernel
instead of round-tripping through a JVM projection; equality with Spark's
expression is pinned by ``tests/test_xxh64_np.py`` over lengths 0..100,
multi-byte UTF-8, and the corpus vocabulary.

All arithmetic is uint64 with numpy's natural mod-2^64 wraparound.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def xxh64_bytes_matrix(mat8: np.ndarray, lens: np.ndarray, seed: int = 42) -> np.ndarray:
    """XXH64 of row i = first ``lens[i]`` bytes of ``mat8[i]`` (zero-padded).

    ``mat8``: (n, W) uint8 with W a multiple of 8 and W >= max(lens) rounded
    up to a stripe boundary; ``lens``: int64 byte lengths.  Returns uint64.
    """
    n, W = mat8.shape
    lanes = mat8.view("<u8")  # (n, W//8) little-endian 8-byte lanes
    lens = lens.astype(np.int64)
    seed_u = np.uint64(seed)

    with np.errstate(over="ignore"):
        h = np.empty(n, dtype=np.uint64)
        long_mask = lens >= 32
        # ---- >=32-byte inputs: 4 stripe accumulators ----
        if long_mask.any():
            li = np.flatnonzero(long_mask)
            v = [
                seed_u + _P1 + _P2,
                seed_u + _P2,
                seed_u,
                seed_u - _P1,
            ]
            acc = [np.full(len(li), x, dtype=np.uint64) for x in v]
            n_stripes = (lens[li] // 32).astype(np.int64)
            max_stripes = int(n_stripes.max())
            for s in range(max_stripes):
                active = n_stripes > s
                for j in range(4):
                    lane = lanes[li, s * 4 + j]
                    upd = _rotl(acc[j] + lane * _P2, 31) * _P1
                    acc[j] = np.where(active, upd, acc[j])
            hl = (
                _rotl(acc[0], 1) + _rotl(acc[1], 7) + _rotl(acc[2], 12) + _rotl(acc[3], 18)
            )
            for j in range(4):
                hl = (hl ^ (_rotl(acc[j] * _P2, 31) * _P1)) * _P1 + _P4
            h[li] = hl
        h[~long_mask] = seed_u + _P5
        h += lens.astype(np.uint64)

        # ---- tail: 8-byte words from the stripe boundary ----
        tail_start = (lens // 32) * 32  # byte offset where the tail begins
        rem = lens - tail_start
        n_words = rem // 8
        max_words = int(n_words.max(initial=0))
        word_idx = (tail_start // 8).astype(np.int64)
        rows = np.arange(n)
        for w in range(max_words):
            active = n_words > w
            lane = lanes[rows, np.minimum(word_idx + w, W // 8 - 1)]
            k = _rotl(lane * _P2, 31) * _P1
            upd = _rotl(h ^ k, 27) * _P1 + _P4
            h = np.where(active, upd, h)
        # ---- optional 4-byte word ----
        off = tail_start + n_words * 8
        has4 = (lens - off) >= 4
        if has4.any():
            b0 = mat8[rows, np.minimum(off + 0, W - 1)].astype(np.uint64)
            b1 = mat8[rows, np.minimum(off + 1, W - 1)].astype(np.uint64)
            b2 = mat8[rows, np.minimum(off + 2, W - 1)].astype(np.uint64)
            b3 = mat8[rows, np.minimum(off + 3, W - 1)].astype(np.uint64)
            lane4 = b0 | (b1 << np.uint64(8)) | (b2 << np.uint64(16)) | (b3 << np.uint64(24))
            upd = _rotl(h ^ (lane4 * _P1), 23) * _P2 + _P3
            h = np.where(has4, upd, h)
            off = off + np.where(has4, 4, 0)
        # ---- remaining single bytes (0..3) ----
        left = lens - off
        max_left = int(left.max(initial=0))
        for b in range(max_left):
            active = left > b
            byte = mat8[rows, np.minimum(off + b, W - 1)].astype(np.uint64)
            upd = _rotl(h ^ (byte * _P5), 11) * _P1
            h = np.where(active, upd, h)
        # ---- avalanche ----
        h ^= h >> np.uint64(33)
        h *= _P2
        h ^= h >> np.uint64(29)
        h *= _P3
        h ^= h >> np.uint64(32)
    return h


def xxh64_strings(strs: list, seed: int = 42) -> np.ndarray:
    """XXH64 over a list of Python strings (UTF-8 bytes), vectorized.

    Returns int64 (Spark ``xxhash64`` convention: the uint64 reinterpreted
    as a signed long)."""
    n = len(strs)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    bs = [s.encode("utf-8") for s in strs]
    lens = np.fromiter((len(b) for b in bs), np.int64, n)
    W = max(8, int(-(-int(lens.max(initial=1)) // 8) * 8))
    buf = b"".join(b.ljust(W, b"\x00") for b in bs)
    mat8 = np.frombuffer(buf, dtype=np.uint8).reshape(n, W)
    return xxh64_bytes_matrix(mat8, lens, seed).view(np.int64)


def xxh64_tokens_unique(tokens: np.ndarray, seed: int = 42) -> np.ndarray:
    """XXH64 per token with a per-batch DICTIONARY: hash each distinct token
    once, gather through the inverse index — tokens in a corpus batch repeat
    heavily, so this is usually 10-100x less hashing work."""
    uniq, inv = np.unique(tokens, return_inverse=True)
    return xxh64_strings(uniq.tolist(), seed)[inv]
