"""Minimal real baseline-JPEG codec — pure stdlib + numpy, no image
library.

Closes the JPEG half of the multimodal codec seam the same way
``functions/png.py`` closed PNG: everything here is from the public
spec (ITU-T T.81 / ISO 10918-1) — marker structure (B.2), baseline
sequential DCT (A.3, F.1/F.2), byte stuffing (F.1.2.3), restart
markers (E.2.4), the Annex K.1/K.2 quantization tables and K.3-K.6
Huffman tables, and the JFIF YCbCr conversion (JFIF 1.02 spec).

Scope (documented, checked, raising on anything else):
* baseline sequential (SOF0), 8-bit samples, Huffman entropy coding
* 1-component (grayscale) and 3-component (YCbCr) scans
* sampling factors 1 or 2 per axis (covers 4:4:4, 4:2:2, 4:2:0)
* restart markers (DRI/RSTn) honored, DC predictors reset
* progressive (SOF2), arithmetic coding, 12-bit, DNL: explicit errors

The encoder exists to make the decoder testable offline (the sandbox
has no image libraries and no network): round-trip tests bound the
reconstruction error by the quantization step, and the DCT/Huffman
pieces are each cross-checked against independent from-the-formula
recomputations in tests/test_jpeg.py.

Like ``decode_png``, the decoder targets untrusted crawl media: frame
dimensions are capped (``max_pixels``) before any allocation.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# spec constants (T.81 Annex K — interchange-format example tables)
# ---------------------------------------------------------------------------

#: zig-zag scan order (T.81 Figure A.6): index i of the scan holds the
#: raster position ZIGZAG[i] of the 8x8 block.
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

#: K.1 luminance / K.2 chrominance quantization tables (raster order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Huffman table specs: (BITS[1..16] code-length counts, HUFFVAL symbols)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
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
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
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
]

#: same decode ceiling rationale as png.MAX_PIXELS
MAX_PIXELS = 64_000_000


# ---------------------------------------------------------------------------
# Huffman code construction (T.81 C.1-C.3: canonical codes from BITS)
# ---------------------------------------------------------------------------

def build_huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) canonical Huffman assignment."""
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


def build_huffman_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol lookup for sequential bit decoding."""
    return {(ln, c): s for s, (c, ln) in build_huffman_codes(bits, vals).items()}


# ---------------------------------------------------------------------------
# 8x8 DCT (orthonormal, vectorized over all blocks at once)
# ---------------------------------------------------------------------------

_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.sqrt((1 if _k else 0.5) / 4.0) * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(N, 8, 8) spatial -> (N, 8, 8) DCT-II coefficients (A.3.3)."""
    return _C @ blocks @ _C.T


def idct_blocks(coeffs: np.ndarray) -> np.ndarray:
    """(N, 8, 8) coefficients -> (N, 8, 8) spatial (A.3.3 inverse)."""
    return _C.T @ coeffs @ _C


def quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base quantization table (public libjpeg
    convention, quality 1..100)."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------------------
# color transforms (JFIF 1.02)
# ---------------------------------------------------------------------------

def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i].astype(np.float64) for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack([r, g, b], axis=-1)


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (F.1.2.3)
                self.out.append(0x00)

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (F.1.2.3)."""
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """Entropy-segment bit reader with byte unstuffing; stops at any
    marker other than stuffed FF00. RSTn markers are surfaced to the
    caller via ``take_rst``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy segment")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError("hit marker inside entropy segment")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._nbits += 8

    def read_bit(self) -> int:
        if self._nbits == 0:
            self._fill()
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_take_rst(self) -> None:
        """Byte-align and consume an expected RSTn marker (E.2.4)."""
        self._acc = 0
        self._nbits = 0
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise ValueError("expected RST marker at restart interval")

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy segment")


def _extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude (T.81 F.2.2.1 EXTEND)."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    """Magnitude category SSSS of a coefficient value (F.1.2.1)."""
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _subsample(plane: np.ndarray, fx: int, fy: int) -> np.ndarray:
    """Box-average subsample by integer factors (encoder side)."""
    if fx == 1 and fy == 1:
        return plane
    h, w = plane.shape
    ph, pw = -h % fy, -w % fx
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    h2, w2 = plane.shape
    return plane.reshape(h2 // fy, fy, w2 // fx, fx).mean(axis=(1, 3))


def _plane_to_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Pad plane to (8*bh, 8*bw) with edge replication, return (bh*bw, 8, 8)."""
    h, w = plane.shape
    plane = np.pad(plane, ((0, 8 * bh - h), (0, 8 * bw - w)), mode="edge")
    return plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(bh * bw, 8, 8)


def encode_jpeg(arr: np.ndarray, quality: int = 85, subsampling: str = "4:4:4",
                restart_interval: int = 0) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 -> baseline JFIF bytes.

    ``subsampling``: "4:4:4", "4:2:2" or "4:2:0" (3-component only).
    ``restart_interval``: MCUs per restart (0 = none) — emits DRI +
    RSTn markers so the decoder's restart path is testable."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError("encode_jpeg takes (H, W) gray or (H, W, 3) RGB")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    factors = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}
    if subsampling not in factors:
        raise ValueError(f"subsampling must be one of {sorted(factors)}")
    hmax, vmax = (1, 1) if gray else factors[subsampling]

    qluma = quality_scale(QUANT_LUMA, quality)
    qchroma = quality_scale(QUANT_CHROMA, quality)

    if gray:
        planes = [a.astype(np.float64)]
        samp = [(1, 1)]
        qtab = [qluma]
    else:
        ycc = rgb_to_ycbcr(a)
        planes = [ycc[..., 0],
                  _subsample(ycc[..., 1], hmax, vmax),
                  _subsample(ycc[..., 2], hmax, vmax)]
        samp = [(hmax, vmax), (1, 1), (1, 1)]
        qtab = [qluma, qchroma, qchroma]

    # per-component quantized coefficient blocks, in MCU traversal order
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comp_blocks = []
    for plane, (fh, fv), q in zip(planes, samp, qtab):
        bw, bh = mcux * fh, mcuy * fv
        blocks = _plane_to_blocks(plane, bh, bw) - 128.0
        coeff = fdct_blocks(blocks)
        qz = np.round(coeff / q.reshape(8, 8)).astype(np.int64)
        comp_blocks.append((qz.reshape(bh, bw, 8, 8), fh, fv))

    dc_codes = [build_huffman_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
                build_huffman_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    ac_codes = [build_huffman_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
                build_huffman_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]

    bw_ = _BitWriter()
    pred = [0] * len(planes)
    mcu_count = 0
    rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw_.flush()
                bw_.out.extend(bytes([0xFF, 0xD0 + rst_idx]))
                rst_idx = (rst_idx + 1) % 8
                pred = [0] * len(planes)
            for ci, (qz, fh, fv) in enumerate(comp_blocks):
                tsel = 0 if ci == 0 else 1
                dct, act = dc_codes[tsel], ac_codes[tsel]
                for by in range(fv):
                    for bx in range(fh):
                        block = qz[my * fv + by, mx * fh + bx].ravel()[ZIGZAG]
                        diff = int(block[0]) - pred[ci]
                        pred[ci] = int(block[0])
                        t = _category(diff)
                        code, ln = dct[t]
                        bw_.write(code, ln)
                        if t:
                            bw_.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                        run = 0
                        last_nz = int(np.max(np.nonzero(block)[0])) if np.any(block[1:]) else 0
                        for k in range(1, 64):
                            v = int(block[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = act[0xF0]  # ZRL
                                bw_.write(code, ln)
                                run -= 16
                            t = _category(v)
                            code, ln = act[(run << 4) | t]
                            bw_.write(code, ln)
                            bw_.write(v if v >= 0 else v + (1 << t) - 1, t)
                            run = 0
                            if k == last_nz:
                                break
                        if last_nz < 63:
                            code, ln = act[0x00]  # EOB
                            bw_.write(code, ln)
            mcu_count += 1
    bw_.flush()

    # ---- assemble markers ----
    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")  # APP0
    out += seg(0xDB, bytes([0]) + bytes(qluma[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(qchroma[ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    for ci in range(ncomp):
        fh, fv = samp[ci]
        sof += bytes([ci + 1, (fh << 4) | fv, 0 if ci == 0 else 1])
    out += seg(0xC0, bytes(sof))
    for cls, tid, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS), (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS), (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        if gray and tid == 1:
            continue
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        tsel = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tsel << 4) | tsel])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, bytes(sos))
    out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(data: bytes, max_pixels: int = MAX_PIXELS) -> np.ndarray:
    """Baseline JFIF bytes -> (H, W) uint8 gray or (H, W, 3) uint8 RGB.

    Raises ``ValueError`` on non-baseline frames (progressive SOF2,
    arithmetic coding, 12-bit), structural corruption, or frames
    declaring more than ``max_pixels`` pixels (same untrusted-media
    bomb rationale as ``png.decode_png``)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    restart_interval = 0

    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG (no SOS)")
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:
            raise ValueError("EOI before SOS")
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        payload = data[pos + 4:pos + 2 + seglen]
        if len(payload) != seglen - 2:
            raise ValueError("truncated marker segment")
        pos += 2 + seglen

        if marker == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not baseline")
                tbl = np.frombuffer(payload[p + 1:p + 65], dtype=np.uint8).astype(np.int64)
                qtables[tq] = tbl[UNZIGZAG]  # store raster order
                p += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1:p + 17])
                n = sum(bits)
                vals = list(payload[p + 17:p + 17 + n])
                (dc_tabs if cls == 0 else ac_tabs)[tid] = build_huffman_decoder(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec, fh, fw, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise ValueError(f"unsupported precision {prec} (baseline = 8)")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            if fh == 0 or fw == 0 or fh * fw > max_pixels:
                raise ValueError(
                    f"refusing {fw}x{fh} JPEG (> {max_pixels} px cap — bomb guard)")
            comps = []
            for ci in range(nc):
                cid, hv, tq = payload[6 + 3 * ci:9 + 3 * ci]
                fx, fy = hv >> 4, hv & 0xF
                if fx not in (1, 2) or fy not in (1, 2):
                    raise ValueError(f"unsupported sampling factor {fx}x{fy}")
                comps.append({"id": cid, "fh": fx, "fv": fy, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker == 0xC2:
            raise ValueError("progressive JPEG (SOF2) not supported (baseline only)")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0xFF{marker:02X} (baseline only)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scan_sel = []
            for si in range(ns):
                cs, tt = payload[1 + 2 * si], payload[2 + 2 * si]
                scan_sel.append((cs, tt >> 4, tt & 0xF))
            break
        # APPn/COM/others: skipped via the generic length field

    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["fh"] for c in comps)
    vmax = max(c["fv"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    order = []
    for cs, td, ta in scan_sel:
        ci = next(i for i, c in enumerate(comps) if c["id"] == cs)
        order.append((ci, td, ta))

    nblocks = [mcux * c["fh"] * mcuy * c["fv"] for c in comps]
    coeff = [np.zeros((nb, 64), dtype=np.int64) for nb in nblocks]

    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_and_take_rst()
                pred = [0] * len(comps)
            for ci, td, ta in order:
                c = comps[ci]
                dct = dc_tabs.get(td)
                act = ac_tabs.get(ta)
                if dct is None or act is None:
                    raise ValueError("scan references missing Huffman table")
                bw = mcux * c["fh"]
                for by in range(c["fv"]):
                    for bx in range(c["fh"]):
                        blk = np.zeros(64, dtype=np.int64)
                        t = reader.decode_symbol(dct)
                        diff = _extend(reader.receive(t), t) if t else 0
                        pred[ci] += diff
                        blk[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            blk[k] = _extend(reader.receive(s), s)
                            k += 1
                        bi = (my * c["fv"] + by) * bw + mx * c["fh"] + bx
                        coeff[ci][bi] = blk
            mcu_count += 1

    # dequantize + dezigzag + IDCT per component (vectorized)
    planes = []
    for c, cf in zip(comps, coeff):
        q = qtables.get(c["tq"])
        if q is None:
            raise ValueError("frame references missing quant table")
        full = np.zeros_like(cf)
        full[:, ZIGZAG] = cf  # zigzag stream index i -> raster position
        deq = (full * q).reshape(-1, 8, 8).astype(np.float64)
        spatial = idct_blocks(deq) + 128.0
        bw = mcux * c["fh"]
        bh = mcuy * c["fv"]
        plane = spatial.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        # upsample to full frame grid, crop to (h, w)
        ry, rx = vmax // c["fv"], hmax // c["fh"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    ycc = np.stack(planes, axis=-1)
    rgb = ycbcr_to_rgb(ycc)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def parse_jpeg_dims(data: bytes) -> tuple[int, int] | None:
    """Cheap header-only (width, height) from any SOFn marker, or None."""
    if data[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(data):
            return None
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 9 > len(data):
                return None
            _, fh, fw = struct.unpack(">BHH", data[pos + 4:pos + 9])
            return fw, fh
        pos += 2 + seglen
    return None
