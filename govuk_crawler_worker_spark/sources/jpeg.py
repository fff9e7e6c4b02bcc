"""Self-contained baseline JPEG codec (ITU-T T.81) in pure numpy.

The container has no libjpeg/PIL/opencv, so this module implements the
baseline sequential DCT process from the PUBLIC spec — ITU-T T.81 (1992)
with the JFIF APP0 wrapper and the standard Annex K quantization/Huffman
tables (also reproduced in RFC 2435 §Appendix A):

* ``encode_jpeg`` — 8-bit RGB → interchange-format JFIF bytes: YCbCr
  (BT.601 full-range as in JFIF), 4:4:4 sampling, 8×8 orthonormal FDCT
  (one einsum over all blocks), IJG-style quality scaling of the Annex K
  tables, zigzag + DC-differential + run-length/magnitude Huffman coding
  with byte stuffing.  The output is a standard baseline JPEG any decoder
  can read.
* ``decode_jpeg`` — general BASELINE decoder: parses DQT/DHT/SOF0/DRI/SOS,
  builds canonical Huffman tables from the file (not from assumptions),
  entropy-decodes interleaved MCUs at arbitrary sampling factors (4:4:4,
  4:2:0, 4:2:2, …), handles restart markers, dequantizes, IDCTs, upsamples
  and converts back to RGB.  Progressive (SOF2) and arithmetic-coded files
  are rejected with a clear error.

Scale note (r7): BOTH entropy directions are vectorized — the decoder
resolves Huffman symbols with memoized 16-bit LUTs over unstuffed segments
and batches all numeric work (DC cumsum, de-zigzag, dequant, einsum IDCT,
block scatter); the encoder generates code/amplitude items as whole-
component arrays and renders the bitstream with one vectorized pass per
bit position.  The only remaining per-SYMBOL Python is the decoder's
sequential code walk (Huffman decoding is inherently serial per segment;
restart intervals are the parallel unit).  A production deployment can
still swap libjpeg in at the ``encode_lossy``/``decode_lossy`` seam in
``sources/images.py`` without touching any Spark plan.  Reference parity: the reference worker stores
fetched bodies verbatim and never decodes images (crawler_message_item.go);
this module is beyond-parity training-data surface.
"""

from __future__ import annotations

import struct

import numpy as np

# -- constants from ITU-T T.81 Annex K (public) --------------------------------

#: zigzag position → raster index inside an 8×8 block
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# standard Huffman specs: (BITS counts for code lengths 1..16, HUFFVAL)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

#: orthonormal 8-point DCT-II matrix: FDCT = M @ block @ M.T, IDCT = M.T @ c @ M
_M = np.array([
    [
        (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
        * np.cos((2 * x + 1) * u * np.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
])


def _scaled_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling (1..100) of the Annex K base tables."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QT_LUMA, _QT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def _canonical_codes(bits, vals) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per T.81 Annex C code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _entropy_encode(comps: list, n_blocks: int) -> bytes:
    """Vectorized interleaved-scan baseline entropy coder (T.81 F.1.2):
    the r7 counterpart of the vectorized decoder.  Items (DC/AC Huffman
    codes, amplitude bits, ZRLs, EOBs) are generated as whole-component
    numpy arrays with a (block, component, intra-block-slot) sort key, bit
    lengths cumsum'd into offsets, and the bitstream rendered by one
    vectorized pass per bit position (≤26; code‖amplitude merged into one
    item) — no per-coefficient Python.
    Output is bit-identical to the former per-block writer (same canonical
    codes, 1-padding, 0xFF00 stuffing).

    ``comps``: [(qz zigzag blocks (n,64) int64, dc_codes, ac_codes), …] in
    component order; MCU order is (block, component) — 4:4:4, one block per
    component per MCU."""
    vals_l: list = []
    lens_l: list = []
    bi_l: list = []
    ci_l: list = []
    slot_l: list = []

    def lut(codes: dict) -> tuple[np.ndarray, np.ndarray]:
        cv = np.zeros(256, dtype=np.uint32)
        cl = np.zeros(256, dtype=np.int64)
        for sym, (c, length) in codes.items():
            cv[sym] = c
            cl[sym] = length
        return cv, cl

    def bitlen(v: np.ndarray) -> np.ndarray:
        # exact for |v| < 2^52 (quantized DCT is ≤ 2^13): ceil(log2(|v|+1))
        return np.ceil(np.log2(np.abs(v).astype(np.float64) + 1.0)).astype(
            np.int64
        )

    def emit(val, length, bi, ci, slot) -> None:
        vals_l.append(np.asarray(val, dtype=np.uint32))
        lens_l.append(np.asarray(length, dtype=np.int64))
        bi_l.append(np.asarray(bi, dtype=np.int64))
        ci_l.append(np.full(len(vals_l[-1]), ci, dtype=np.int64))
        slot_l.append(np.asarray(slot, dtype=np.int64))

    arange_n = np.arange(n_blocks, dtype=np.int64)
    for ci, (qz, dc_codes, ac_codes) in enumerate(comps):
        dcv, dcl = lut(dc_codes)
        acv, acl = lut(ac_codes)
        # ---- DC: differential size symbol + amplitude (slots 3, 4 at k=0)
        d = np.empty(n_blocks, dtype=np.int64)
        d[0] = qz[0, 0]
        d[1:] = qz[1:, 0] - qz[:-1, 0]
        sz = np.where(d == 0, 0, bitlen(d))
        if (dcl[sz] == 0).any():
            raise ValueError("DC difference exceeds the Huffman table")
        amp = np.where(d >= 0, d, d + np.left_shift(np.int64(1), sz) - 1)
        # code and amplitude concatenated into ONE item (≤ 11+11 bits):
        # halves the item count the sort and render passes must touch
        emit(
            (dcv[sz].astype(np.int64) << sz) | amp,
            dcl[sz] + sz,
            arange_n,
            ci,
            np.full(n_blocks, 3),
        )
        # ---- AC: run/size symbols with ZRL expansion, per-nonzero
        ac = qz[:, 1:]
        nzb, nzk0 = np.nonzero(ac)
        k = nzk0 + 1  # zigzag index 1..63
        if k.size:
            prevk = np.empty_like(k)
            prevk[0] = 0
            prevk[1:] = k[:-1]
            first = np.ones(k.size, dtype=bool)
            first[1:] = nzb[1:] != nzb[:-1]
            prevk[first] = 0
            run = k - prevk - 1
            zc = run >> 4
            v = ac[nzb, nzk0]
            vsz = bitlen(v)
            sym = ((run & 15) << 4) | vsz
            if (acl[sym] == 0).any():
                raise ValueError("AC run/size exceeds the Huffman table")
            zidx = np.repeat(np.arange(k.size), zc)
            if zidx.size:  # ZRLs precede their coefficient: slots k*8+0..2
                occ = np.arange(zidx.size) - np.repeat(
                    np.cumsum(zc) - zc, zc
                )
                zv, zl = ac_codes[0xF0]
                emit(
                    np.full(zidx.size, zv),
                    np.full(zidx.size, zl),
                    nzb[zidx],
                    ci,
                    k[zidx] * 8 + occ,
                )
            vamp = np.where(
                v >= 0, v, v + np.left_shift(np.int64(1), vsz) - 1
            )
            emit(  # code ‖ amplitude as one ≤ 16+10-bit item
                (acv[sym].astype(np.int64) << vsz) | vamp,
                acl[sym] + vsz,
                nzb,
                ci,
                k * 8 + 3,
            )
        # ---- EOB for blocks whose last nonzero sits before k=63
        last_k = np.zeros(n_blocks, dtype=np.int64)
        if k.size:
            np.maximum.at(last_k, nzb, k)
        eob = last_k < 63
        ev, el = ac_codes[0x00]
        n_eob = int(eob.sum())
        emit(
            np.full(n_eob, ev),
            np.full(n_eob, el),
            arange_n[eob],
            ci,
            np.full(n_eob, 64 * 8),
        )

    vals = np.concatenate(vals_l).astype(np.uint64)
    lens = np.concatenate(lens_l)
    # one composite int64 key (slot < 528, unique per item within a block)
    # sorts ~2x faster than a 3-key lexsort
    key = (np.concatenate(bi_l) * 3 + np.concatenate(ci_l)) * 528 + (
        np.concatenate(slot_l)
    )
    order = np.argsort(key)
    vals = vals[order]
    lens = lens[order]
    offs = np.concatenate([[0], np.cumsum(lens)])
    total = int(offs[-1])
    pad = (-total) % 8
    bits = np.empty(total + pad, dtype=np.uint8)
    bits[total:] = 1  # pad with 1-bits (T.81 F.1.2.3), like flush() did
    starts = offs[:-1]
    for j in range(int(lens.max(initial=0))):
        m = lens > j
        bits[starts[m] + j] = (
            vals[m] >> (lens[m] - 1 - j).astype(np.uint64)
        ) & np.uint64(1)
    packed = np.packbits(bits)  # MSB-first == the old writer's bit order
    ffs = np.flatnonzero(packed == 0xFF)
    if ffs.size:  # byte stuffing, including a 0xFF final padded byte
        packed = np.insert(packed, ffs + 1, 0)
    return packed.tobytes()


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    p = px.astype(np.float64)
    y = 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
    cb = -0.168736 * p[..., 0] - 0.331264 * p[..., 1] + 0.5 * p[..., 2] + 128.0
    cr = 0.5 * p[..., 0] - 0.418688 * p[..., 1] - 0.081312 * p[..., 2] + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _fdct_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) level-shifted plane, H/W multiples of 8 → (n_blocks, 8, 8)
    DCT coefficients, blocks in raster order — one einsum for the lot."""
    h, w = plane.shape
    b = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    c = np.einsum("ux,byxz,vz->byuv", _M, b, _M)
    return c.reshape(-1, 8, 8)


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """8-bit RGB (h, w, 3) → baseline JFIF bytes (4:4:4, Annex K tables at
    the given IJG quality, standard Huffman tables)."""
    h, w, _ = pixels.shape
    qt_l, qt_c = _scaled_tables(quality)
    ycc = _rgb_to_ycbcr(pixels)
    ph, pw = -h % 8, -w % 8  # edge-replicate to block multiples
    ycc = np.pad(ycc, ((0, ph), (0, pw), (0, 0)), mode="edge")

    comps = []  # (quantized zigzag blocks, dc_codes, ac_codes)
    dc_l = _canonical_codes(*_DC_LUMA)
    ac_l = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)
    for ci in range(3):
        qt = qt_l if ci == 0 else qt_c
        coef = _fdct_blocks(ycc[..., ci] - 128.0)
        # quantize in raster order, then reorder each block to zigzag
        qz = np.round(coef.reshape(-1, 64) / qt[None, :]).astype(np.int64)
        qz = qz[:, ZIGZAG]
        comps.append((qz, (dc_l if ci == 0 else dc_c), (ac_l if ci == 0 else ac_c)))

    entropy = _entropy_encode(comps, comps[0][0].shape[0])

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = [struct.pack(">H", 0xFFD8)]  # SOI
    out.append(seg(0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)))
    out.append(seg(0xFFDB, bytes([0x00]) + bytes(qt_l[ZIGZAG].tolist())))
    out.append(seg(0xFFDB, bytes([0x01]) + bytes(qt_c[ZIGZAG].tolist())))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, tq)  # h=v=1 (4:4:4)
    out.append(seg(0xFFC0, sof))
    for tc_th, (bits, vals) in (
        (0x00, _DC_LUMA), (0x10, _AC_LUMA), (0x01, _DC_CHROMA), (0x11, _AC_CHROMA),
    ):
        out.append(seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals)))
    sos = struct.pack(">B", 3)
    for cid, tdta in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos += struct.pack(">BB", cid, tdta)
    sos += b"\x00\x3f\x00"
    out.append(seg(0xFFDA, sos))
    out.append(entropy)
    out.append(struct.pack(">H", 0xFFD9))  # EOI
    return b"".join(out)


# -- decoder --------------------------------------------------------------------


def _entropy_segments(data: bytes, pos: int) -> list:
    """Unstuffed entropy bytes from ``pos``, split at RSTn boundaries (each
    restart interval is independently decodable, T.81 F.2.1.3.1); stops at
    any other marker.  Vectorized: only the (rare) 0xFF positions are walked
    in Python — returns a list of np.uint8 arrays."""
    a = np.frombuffer(data, dtype=np.uint8)
    segs: list = []
    pieces: list = []

    def flush() -> None:
        segs.append(
            np.concatenate(pieces) if len(pieces) != 1 else pieces[0]
        )
        pieces.clear()

    start = pos
    for f in (np.flatnonzero(a[pos:] == 0xFF) + pos).tolist():
        if f < start:  # already consumed as stuffing / marker tail
            continue
        nxt = data[f + 1] if f + 1 < len(data) else 0xD9
        if nxt == 0x00:
            pieces.append(a[start : f + 1])  # keep the 0xFF, drop the 0x00
            start = f + 2
        elif 0xD0 <= nxt <= 0xD7:
            pieces.append(a[start:f])
            flush()
            start = f + 2
        else:  # real marker (EOI/next segment): the scan ends here
            pieces.append(a[start:f])
            flush()
            return segs
    pieces.append(a[start:])
    flush()
    return segs


def _u32_words(seg: "np.ndarray") -> list:
    """Big-endian 32-bit window at every byte offset (+2 zero-padded words):
    one list index + shifts replaces per-bit reads.  Python ints via tolist()
    — scalar numpy indexing in the symbol loop would be slower."""
    b = np.concatenate([seg, np.zeros(16, np.uint8)]).astype(np.uint32)
    return ((b[:-3] << 24) | (b[1:-2] << 16) | (b[2:-1] << 8) | b[3:]).tolist()


_LUT_CACHE: dict = {}


def _huff_lut(table: dict) -> tuple[list, list]:
    """Canonical (length, code)→symbol dict → 65536-entry (length, symbol)
    lists: any baseline code (≤16 bits) resolves with ONE 16-bit peek.
    Memoized by table content — corpus images overwhelmingly share the
    standard Annex-K tables, and the build dominates small-image decodes."""
    key = tuple(sorted(table.items()))
    hit = _LUT_CACHE.get(key)
    if hit is None:
        ln = np.zeros(65536, dtype=np.uint8)
        sym = np.zeros(65536, dtype=np.uint8)
        for (length, code), s in table.items():
            base = code << (16 - length)
            span = 1 << (16 - length)
            ln[base : base + span] = length
            sym[base : base + span] = s
        if len(_LUT_CACHE) >= 64:  # worker-lifetime bound
            _LUT_CACHE.clear()
        _LUT_CACHE[key] = hit = (ln.tolist(), sym.tolist())
    return hit


def _decode_tables(bits, vals) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, canonical assignment (decoder side)."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF/JPEG bytes → 8-bit RGB (h, w, 3).  General baseline
    decoder: tables and sampling factors come from the FILE."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    scan_pos = -1
    scan_comps: list[dict] = []
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                flat = np.zeros(64, dtype=np.int64)
                flat[ZIGZAG] = np.frombuffer(
                    body[bpos + 1 : bpos + 65], dtype=np.uint8
                ).astype(np.int64)
                qts[tq] = flat
                bpos += 65
        elif marker in (0xC0, 0xC1):  # SOF0/1 (baseline + extended sequential)
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2) not supported")
        elif marker in (0xC9, 0xCA, 0xCB):
            raise NotImplementedError("arithmetic-coded JPEG not supported")
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0x0F
                bits = list(body[bpos + 1 : bpos + 17])
                n = sum(bits)
                vals = list(body[bpos + 17 : bpos + 17 + n])
                huff[(tc, th)] = _decode_tables(bits, vals)
                bpos += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cid, tdta = body[1 + 2 * i : 3 + 2 * i]
                comp = next(c for c in comps if c["id"] == cid)
                scan_comps.append({**comp, "td": tdta >> 4, "ta": tdta & 0x0F})
            scan_pos = pos + 2 + seg_len
            break  # single interleaved scan (all SOF components covered)
        pos += 2 + seg_len
    if scan_pos < 0 or not comps:
        raise ValueError("no SOS/SOF found")
    if len(scan_comps) < len(comps):
        # A legal baseline stream may carry several non-interleaved scans
        # (one component each); this decoder handles only the ubiquitous
        # single interleaved scan — fail LOUD (like SOF2/arithmetic above)
        # instead of returning the uncovered components as silent zeros.
        raise NotImplementedError(
            "multi-scan (non-interleaved) baseline JPEG not supported: "
            f"first SOS covers {len(scan_comps)} of {len(comps)} components"
        )

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    idct = _M.T

    # ---- entropy decode: LUT symbol resolution over unstuffed segments ----
    # One 16-bit window peek resolves a whole Huffman code (vs 1 dict probe
    # PER BIT before — the r6 per-block hot loop); coefficients land in flat
    # Python lists and ALL numeric work (DC cumsum, de-zigzag, dequant,
    # IDCT, block placement) happens afterwards as batched numpy.
    luts = {key: _huff_lut(tab) for key, tab in huff.items()}
    segs = _entropy_segments(data, scan_pos)
    state: dict[int, dict] = {}
    for c in scan_comps:
        state[c["id"]] = {
            "dc": [],  # per-block DC diffs in decode order
            "bl": [],  # AC scatter triplets (block, zigzag-k, value)
            "kl": [],
            "vl": [],
            "seg_starts": [0],  # dc index where each restart segment begins
        }
    u32 = _u32_words(segs[0])
    seg_i = 0
    bp = 0
    mcu_count = 0
    try:
        for _my in range(mcuy):
            for _mx in range(mcux):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    seg_i += 1
                    if seg_i >= len(segs):
                        raise EOFError("expected restart marker")
                    u32 = _u32_words(segs[seg_i])
                    bp = 0
                    for st in state.values():
                        st["seg_starts"].append(len(st["dc"]))
                mcu_count += 1
                for c in scan_comps:
                    st = state[c["id"]]
                    dlen, dsym = luts[(0, c["td"])]
                    alen, asym = luts[(1, c["ta"])]
                    dc, bl, kl, vl = st["dc"], st["bl"], st["kl"], st["vl"]
                    for _blk in range(c["v"] * c["h"]):
                        word = u32[bp >> 3]
                        code = (word >> (16 - (bp & 7))) & 0xFFFF
                        length = dlen[code]
                        if length == 0:
                            raise ValueError("invalid Huffman code")
                        size = dsym[code]
                        bp += length
                        if size:
                            word = u32[bp >> 3]
                            amp = (word >> (32 - (bp & 7) - size)) & (
                                (1 << size) - 1
                            )
                            bp += size
                            # T.81 F.2.2.1 EXTEND, inlined
                            dc.append(
                                amp
                                if amp >= (1 << (size - 1))
                                else amp - (1 << size) + 1
                            )
                        else:
                            dc.append(0)
                        bi = len(dc) - 1
                        k = 1
                        while k < 64:
                            word = u32[bp >> 3]
                            code = (word >> (16 - (bp & 7))) & 0xFFFF
                            length = alen[code]
                            if length == 0:
                                raise ValueError("invalid Huffman code")
                            rs = asym[code]
                            bp += length
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            size = rs & 0x0F
                            if k > 63:
                                raise ValueError("AC index overflow")
                            word = u32[bp >> 3]
                            amp = (word >> (32 - (bp & 7) - size)) & (
                                (1 << size) - 1
                            )
                            bp += size
                            bl.append(bi)
                            kl.append(k)
                            vl.append(
                                amp
                                if amp >= (1 << (size - 1))
                                else amp - (1 << size) + 1
                            )
                            k += 1
    except IndexError:
        raise ValueError("truncated JPEG scan") from None

    # ---- batched assembly: everything below is whole-array numpy ----------
    planes: dict[int, np.ndarray] = {}
    for c in comps:
        st = state[c["id"]]
        cv, ch = c["v"], c["h"]
        n = len(st["dc"])
        dc = np.asarray(st["dc"], dtype=np.int64)
        starts = st["seg_starts"] + [n]
        for s0, s1 in zip(starts, starts[1:]):
            # DC prediction resets at every restart boundary
            dc[s0:s1] = np.cumsum(dc[s0:s1])
        zz = np.zeros((n, 64), dtype=np.float64)
        zz[:, 0] = dc
        if st["bl"]:
            zz[np.asarray(st["bl"]), np.asarray(st["kl"])] = np.asarray(
                st["vl"], dtype=np.float64
            )
        raster = np.zeros_like(zz)
        raster[:, ZIGZAG] = zz  # de-zigzag → raster order, all blocks at once
        raster *= qts[c["tq"]].astype(np.float64)
        pix = (
            np.einsum("ij,bjk,kl->bil", idct, raster.reshape(n, 8, 8), _M)
            + 128.0
        )
        # decode order is (my, mx, by, bx) — regenerate block coordinates
        # vectorized instead of appending them in the hot loop
        my_i = np.repeat(np.arange(mcuy), mcux * cv * ch)
        mx_i = np.tile(np.repeat(np.arange(mcux), cv * ch), mcuy)
        by_i = np.tile(np.repeat(np.arange(cv), ch), mcuy * mcux)
        bx_i = np.tile(np.arange(ch), mcuy * mcux * cv)
        rows_b, cols_b = mcuy * cv, mcux * ch
        grid = np.zeros((rows_b, cols_b, 8, 8), dtype=np.float64)
        grid[my_i * cv + by_i, mx_i * ch + bx_i] = pix
        planes[c["id"]] = grid.transpose(0, 2, 1, 3).reshape(
            rows_b * 8, cols_b * 8
        )

    full = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0].round(), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    return _ycbcr_to_rgb(full[0], full[1], full[2])
