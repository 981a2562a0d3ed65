"""Minimal real JPEG codec (baseline + progressive) — pure stdlib +
numpy, no image library.

Closes the JPEG half of the multimodal codec seam the same way
``functions/png.py`` closed PNG: everything here is from the public
spec (ITU-T T.81 / ISO 10918-1) — marker structure (B.2), baseline
sequential DCT (A.3, F.1/F.2), progressive DCT (G.1/G.2: spectral
selection, successive approximation, EOB runs), byte stuffing
(F.1.2.3), restart markers (E.2.4), the Annex K.1/K.2 quantization
tables and K.3-K.6 Huffman tables, and the JFIF YCbCr conversion
(JFIF 1.02 spec).

Scope (documented, checked, raising on anything else):
* baseline sequential (SOF0/1) AND progressive (SOF2) frames, 8-bit
  samples, Huffman entropy coding, multi-scan with inter-scan
  DHT/DRI, interleaved and non-interleaved scans
* 1-component (grayscale) and 3-component (YCbCr) frames
* sampling factors 1 or 2 per axis (covers 4:4:4, 4:2:2, 4:2:0)
* restart markers (DRI/RSTn) honored; DC predictors + EOB runs reset
* arithmetic coding, 12-bit, hierarchical, lossless: explicit errors

The encoders exist to make the decoder testable offline (the sandbox
has no image libraries and no network): round-trip tests bound the
reconstruction error by the quantization step, the DCT/Huffman pieces
are each cross-checked against independent from-the-formula
recomputations, and — because both encoders quantize identically —
progressive and baseline encodings of the same image must decode to
bit-identical pixels (tests/test_jpeg.py).

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


def _prepare_encode(arr: np.ndarray, quality: int, subsampling: str) -> dict:
    """Shared encoder front half: color transform, subsampling, 8x8
    forward DCT, quantization. Returns per-component quantized
    coefficient grids in MCU traversal order."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError("encoder takes (H, W) gray or (H, W, 3) RGB")
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

    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    comp_blocks = []
    for plane, (fh, fv), q in zip(planes, samp, qtab):
        bw, bh = mcux * fh, mcuy * fv
        blocks = _plane_to_blocks(plane, bh, bw) - 128.0
        coeff = fdct_blocks(blocks)
        qz = np.round(coeff / q.reshape(8, 8)).astype(np.int64)
        comp_blocks.append((qz.reshape(bh, bw, 8, 8), fh, fv))
    return {"gray": gray, "h": h, "w": w, "samp": samp, "mcux": mcux,
            "mcuy": mcuy, "comp_blocks": comp_blocks, "qluma": qluma,
            "qchroma": qchroma}


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _emit_frame_headers(prep: dict, sof_marker: int,
                        restart_interval: int) -> bytearray:
    """SOI + APP0 + DQT + SOFn + DHT (+DRI) shared by both encoders."""
    gray, h, w, samp = prep["gray"], prep["h"], prep["w"], prep["samp"]
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(prep["qluma"][ZIGZAG].astype(np.uint8)))
    if not gray:
        out += _seg(0xDB, bytes([1]) + bytes(prep["qchroma"][ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    for ci in range(ncomp):
        fh, fv = samp[ci]
        sof += bytes([ci + 1, (fh << 4) | fv, 0 if ci == 0 else 1])
    out += _seg(sof_marker, bytes(sof))
    for cls, tid, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS), (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS), (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        if gray and tid == 1:
            continue
        out += _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    return out


def encode_jpeg(arr: np.ndarray, quality: int = 85, subsampling: str = "4:4:4",
                restart_interval: int = 0) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 -> baseline JFIF bytes.

    ``subsampling``: "4:4:4", "4:2:2" or "4:2:0" (3-component only).
    ``restart_interval``: MCUs per restart (0 = none) — emits DRI +
    RSTn markers so the decoder's restart path is testable."""
    prep = _prepare_encode(arr, quality, subsampling)
    gray, h, w = prep["gray"], prep["h"], prep["w"]
    samp, mcux, mcuy = prep["samp"], prep["mcux"], prep["mcuy"]
    comp_blocks, qluma, qchroma = prep["comp_blocks"], prep["qluma"], prep["qchroma"]

    dc_codes = [build_huffman_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
                build_huffman_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    ac_codes = [build_huffman_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
                build_huffman_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]

    bw_ = _BitWriter()
    pred = [0] * len(comp_blocks)
    mcu_count = 0
    rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw_.flush()
                bw_.out.extend(bytes([0xFF, 0xD0 + rst_idx]))
                rst_idx = (rst_idx + 1) % 8
                pred = [0] * len(comp_blocks)
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

    out = _emit_frame_headers(prep, 0xC0, restart_interval)
    ncomp = 1 if gray else 3
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        tsel = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tsel << 4) | tsel])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, bytes(sos))
    out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 85,
                            subsampling: str = "4:4:4",
                            restart_interval: int = 0,
                            spectral_split: int = 5) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 -> progressive (SOF2) JFIF.

    Exists primarily so the progressive *decoder* path is testable
    offline (the sandbox has no image library to produce SOF2 files):
    because both encoders quantize identically, progressive and
    baseline encodings of the same image MUST decode to bit-identical
    pixels — the parity test in tests/test_jpeg.py.

    Scan script (the common libjpeg-style shape):
    1. DC first scan, interleaved, successive approximation Al=1
    2. DC refinement, Ah=1 -> Al=0 (raw bits, no Huffman)
    3. per component: AC first scans with spectral selection
       (1..spectral_split, spectral_split+1..63) at Al=1
    4. per component: AC refinement scans (same bands), Ah=1 -> Al=0

    EOB runs are emitted per-block (EOB0); ``restart_interval`` (in
    scan units: MCUs for DC scans, blocks for AC scans) exercises the
    decoder's progressive restart handling."""
    prep = _prepare_encode(arr, quality, subsampling)
    gray = prep["gray"]
    samp, mcux, mcuy = prep["samp"], prep["mcux"], prep["mcuy"]
    comp_blocks = prep["comp_blocks"]
    ncomp = 1 if gray else 3

    dc_codes = [build_huffman_codes(_DC_LUMA_BITS, _DC_LUMA_VALS),
                build_huffman_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)]
    ac_codes = [build_huffman_codes(_AC_LUMA_BITS, _AC_LUMA_VALS),
                build_huffman_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)]

    # zigzag-ordered coefficient streams per component, MCU-grid layout
    zz = [qz.reshape(qz.shape[0], qz.shape[1], 64)[..., ZIGZAG]
          for qz, _fh, _fv in comp_blocks]

    out = _emit_frame_headers(prep, 0xC2, restart_interval)

    class _ScanWriter:
        """Bit writer + per-scan restart emission."""

        def __init__(self):
            self.bw = _BitWriter()
            self.rst_idx = 0
            self.unit = 0

        def maybe_restart(self, reset_fn) -> None:
            if restart_interval and self.unit and self.unit % restart_interval == 0:
                self.bw.flush()
                self.bw.out.extend(bytes([0xFF, 0xD0 + self.rst_idx]))
                self.rst_idx = (self.rst_idx + 1) % 8
                reset_fn()
            self.unit += 1

        def finish(self) -> bytes:
            self.bw.flush()
            return bytes(self.bw.out)

    def sos_header(comps_sel: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        sos = bytearray([len(comps_sel)])
        for ci in comps_sel:
            tsel = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (tsel << 4) | tsel])
        sos += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, bytes(sos))

    # ---- scan 1: DC first, interleaved, Al=1 ----
    sw = _ScanWriter()
    pred = [0] * ncomp

    def _reset_pred():
        pred[:] = [0] * ncomp

    for my in range(mcuy):
        for mx in range(mcux):
            sw.maybe_restart(_reset_pred)
            for ci in range(ncomp):
                _, fh, fv = comp_blocks[ci]
                for by in range(fv):
                    for bx in range(fh):
                        dc = int(zz[ci][my * fv + by, mx * fh + bx, 0]) >> 1
                        diff = dc - pred[ci]
                        pred[ci] = dc
                        t = _category(diff)
                        code, ln = dc_codes[0 if ci == 0 else 1][t]
                        sw.bw.write(code, ln)
                        if t:
                            sw.bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    out += sos_header(list(range(ncomp)), 0, 0, 0, 1)
    out += sw.finish()

    # ---- scan 2: DC refinement, Ah=1 Al=0 (raw bits) ----
    sw = _ScanWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            sw.maybe_restart(lambda: None)
            for ci in range(ncomp):
                _, fh, fv = comp_blocks[ci]
                for by in range(fv):
                    for bx in range(fh):
                        sw.bw.write(int(zz[ci][my * fv + by, mx * fh + bx, 0]) & 1, 1)
    out += sos_header(list(range(ncomp)), 0, 0, 1, 0)
    out += sw.finish()

    def _trunc_shift(v: int, n: int) -> int:
        """AC point transform: v / 2^n truncated toward zero (G.1.2.2)."""
        return -((-v) >> n) if v < 0 else v >> n

    def _real_grid(ci: int) -> tuple[int, int, int]:
        _, fh, fv = comp_blocks[ci]
        hmax = max(s[0] for s in samp)
        vmax = max(s[1] for s in samp)
        comp_w = -(-prep["w"] * fh // hmax)
        comp_h = -(-prep["h"] * fv // vmax)
        return -(-comp_h // 8), -(-comp_w // 8), mcux * fh

    def ac_first_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        act = ac_codes[0 if ci == 0 else 1]
        sw = _ScanWriter()
        bh_real, bw_real, bw_pad = _real_grid(ci)
        for by in range(bh_real):
            for bx in range(bw_real):
                sw.maybe_restart(lambda: None)
                band = [_trunc_shift(int(v), al) for v in zz[ci][by, bx, ss:se + 1]]
                run = 0
                emitted_any = False
                last_nz = -1
                for i, v in enumerate(band):
                    if v:
                        last_nz = i
                for i in range(last_nz + 1):
                    v = band[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = act[0xF0]
                        sw.bw.write(code, ln)
                        run -= 16
                    t = _category(v)
                    code, ln = act[(run << 4) | t]
                    sw.bw.write(code, ln)
                    sw.bw.write(v if v >= 0 else v + (1 << t) - 1, t)
                    run = 0
                    emitted_any = True
                if last_nz < len(band) - 1 or not emitted_any:
                    code, ln = act[0x00]  # EOB0 (eobrun = 1)
                    sw.bw.write(code, ln)
        return sos_header([ci], ss, se, 0, al) + sw.finish()

    def ac_refine_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        """Ah = al+1 -> Al = al refinement (G.1.2.3). The correction
        bits must appear in EXACTLY the order the decoder consumes
        them (it reads one bit at every nonzero-history coefficient it
        passes while advancing over a symbol's zero-run), so this
        encoder SIMULATES the decoder's advance per symbol and emits
        each bit at the moment the decoder would read it — consistency
        by construction."""
        act = ac_codes[0 if ci == 0 else 1]
        sw = _ScanWriter()
        ah = al + 1
        bh_real, bw_real, _ = _real_grid(ci)
        for by in range(bh_real):
            for bx in range(bw_real):
                sw.maybe_restart(lambda: None)
                band = [int(v) for v in zz[ci][by, bx, ss:se + 1]]
                hist = [_trunc_shift(v, ah) for v in band]
                refine_bit = [(abs(v) >> al) & 1 for v in band]
                new_pos = [i for i, v in enumerate(band)
                           if hist[i] == 0 and _trunc_shift(v, al) != 0]
                k = 0  # decoder's cursor into the band

                def advance(consume_zeros: int) -> None:
                    """Mirror the decoder: pass ``consume_zeros``
                    zero-history slots, emitting a refinement bit at
                    every nonzero-history slot passed; leave the cursor
                    ON the (consume_zeros+1)th zero-history slot."""
                    nonlocal k
                    left = consume_zeros
                    while k < len(band):
                        if hist[k] != 0:
                            sw.bw.write(refine_bit[k], 1)
                        else:
                            if left == 0:
                                return
                            left -= 1
                        k += 1

                for p in new_pos:
                    # zero-history slots strictly before p from cursor
                    r = sum(1 for i in range(k, p) if hist[i] == 0)
                    while r > 15:
                        code, ln = act[0xF0]
                        sw.bw.write(code, ln)
                        advance(15)  # 15 decrements ...
                        k += 1       # ... plus the slot consumed by k++
                        r -= 16
                    code, ln = act[(r << 4) | 1]
                    sw.bw.write(code, ln)
                    sw.bw.write(1 if band[p] > 0 else 0, 1)
                    advance(r)  # cursor lands on p (a zero-history slot)
                    k += 1      # decoder writes newval at p, then k++
                if k < len(band):
                    code, ln = act[0x00]  # EOB0: decoder refines the rest
                    sw.bw.write(code, ln)
                    while k < len(band):
                        if hist[k] != 0:
                            sw.bw.write(refine_bit[k], 1)
                        k += 1
        return sos_header([ci], ss, se, ah, al) + sw.finish()

    splits = [(1, spectral_split), (spectral_split + 1, 63)] if 1 <= spectral_split < 63 \
        else [(1, 63)]
    for ci in range(ncomp):
        for ss, se in splits:
            out += ac_first_scan(ci, ss, se, 1)
    for ci in range(ncomp):
        for ss, se in splits:
            out += ac_refine_scan(ci, ss, se, 0)

    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder (multi-scan: baseline SOF0/1 and progressive SOF2)
# ---------------------------------------------------------------------------

def _next_marker(data: bytes, pos: int) -> int:
    """Advance past any non-marker/fill bytes to the next real marker
    (B.1.1.2: markers may be preceded by any number of 0xFF fill
    bytes)."""
    n = len(data)
    while pos < n:
        if data[pos] == 0xFF and pos + 1 < n and data[pos + 1] not in (0x00, 0xFF):
            return pos
        pos += 1
    return pos


def _decode_scan(data: bytes, pos: int, frame: dict, scan: dict,
                 dc_tabs: dict, ac_tabs: dict, restart_interval: int,
                 coeff: list[np.ndarray]) -> int:
    """Decode one entropy-coded scan into the per-component coefficient
    arrays (progressive scans accumulate; a baseline scan is the
    degenerate single full-band scan). Returns the stream position
    after the scan's entropy data.

    Implements T.81 F.2 (sequential) and G.2 (progressive): spectral
    selection (Ss..Se bands), successive approximation (Ah/Al point
    transform, refinement bit planes), EOB runs, restart intervals."""
    comps = frame["comps"]
    hmax, vmax, mcux, mcuy = frame["hmax"], frame["vmax"], frame["mcux"], frame["mcuy"]
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    order = scan["order"]  # [(ci, td, ta)]
    progressive = frame["progressive"]
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    eobrun = 0

    def dc_first(ci: int, td: int, blk: np.ndarray) -> None:
        t = reader.decode_symbol(dc_tabs[td])
        if t > 16:  # corrupt DHT: magnitude category beyond any precision
            raise ValueError(f"invalid DC magnitude category {t}")
        diff = _extend(reader.receive(t), t) if t else 0
        pred[ci] += diff
        blk[0] = pred[ci] << al

    def dc_refine(blk: np.ndarray) -> None:
        if reader.read_bit():
            blk[0] |= 1 << al

    def ac_first(ta: int, blk: np.ndarray) -> None:
        nonlocal eobrun
        if eobrun > 0:
            eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = reader.decode_symbol(ac_tabs[ta])
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) - 1  # EOBn: this block + eobrun more
                if r:
                    eobrun += reader.receive(r)
                return
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            blk[k] = _extend(reader.receive(s), s) << al
            k += 1

    def _refine_nonzero(blk: np.ndarray, k: int) -> None:
        """Append the next approximation bit to an already-nonzero
        coefficient (G.1.2.3 correction bits)."""
        if reader.read_bit() and not (blk[k] & (1 << al)):
            blk[k] += (1 << al) if blk[k] > 0 else -(1 << al)

    def ac_refine(ta: int, blk: np.ndarray) -> None:
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = reader.decode_symbol(ac_tabs[ta])
                r, s = rs >> 4, rs & 0xF
                newval = 0
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.receive(r)
                        break  # rest of band handled by the EOB tail
                    # r == 15: run of 16 zero-history positions
                else:
                    if s != 1:
                        raise ValueError("refinement scan with s > 1")
                    newval = (1 << al) if reader.read_bit() else -(1 << al)
                # advance past r zero-history positions, refining
                # nonzero-history coefficients along the way (they do
                # not count against the run)
                while k <= se:
                    if blk[k] != 0:
                        _refine_nonzero(blk, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval:
                    if k > se:
                        raise ValueError("refinement run past band end")
                    blk[k] = newval
                k += 1
        if eobrun > 0:
            while k <= se:
                if blk[k] != 0:
                    _refine_nonzero(blk, k)
                k += 1
            eobrun -= 1

    def ac_baseline(ta: int, blk: np.ndarray) -> None:
        k = 1
        while k < 64:
            rs = reader.decode_symbol(ac_tabs[ta])
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

    def decode_block(ci: int, td: int, ta: int, bi: int) -> None:
        blk = coeff[ci][bi]
        if not progressive:
            dc_first(ci, td, blk)
            ac_baseline(ta, blk)
        elif ss == 0:
            if ah == 0:
                dc_first(ci, td, blk)
            else:
                dc_refine(blk)
        else:
            if ah == 0:
                ac_first(ta, blk)
            else:
                ac_refine(ta, blk)

    def restart() -> None:
        nonlocal eobrun
        reader.align_and_take_rst()
        pred[:] = [0] * len(comps)
        eobrun = 0

    if len(order) > 1:
        # interleaved MCU traversal (multi-component scans; a
        # single-component scan — baseline grayscale or progressive
        # AC — takes the non-interleaved real-grid path below, which
        # coincides with the MCU grid when sampling factors are 1)
        unit = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and unit and unit % restart_interval == 0:
                    restart()
                for ci, td, ta in order:
                    c = comps[ci]
                    bw = mcux * c["fh"]
                    for by in range(c["fv"]):
                        for bx in range(c["fh"]):
                            bi = (my * c["fv"] + by) * bw + mx * c["fh"] + bx
                            decode_block(ci, td, ta, bi)
                unit += 1
    else:
        # non-interleaved: one component, REAL block grid raster order
        # (A.2.2 — the grid of ceil(comp_dim / 8), NOT the padded
        # interleaved grid; they differ when the image doesn't fill the
        # last MCU column/row of a subsampled component)
        ci, td, ta = order[0]
        c = comps[ci]
        bw_pad = mcux * c["fh"]
        comp_w = -(-frame["w"] * c["fh"] // hmax)
        comp_h = -(-frame["h"] * c["fv"] // vmax)
        bw_real = -(-comp_w // 8)
        bh_real = -(-comp_h // 8)
        unit = 0
        for by in range(bh_real):
            for bx in range(bw_real):
                if restart_interval and unit and unit % restart_interval == 0:
                    restart()
                decode_block(ci, td, ta, by * bw_pad + bx)
                unit += 1

    return reader.pos


def decode_jpeg(data: bytes, max_pixels: int = MAX_PIXELS) -> np.ndarray:
    """JFIF bytes -> (H, W) uint8 gray or (H, W, 3) uint8 RGB.

    Handles baseline sequential (SOF0/1) and progressive (SOF2) frames
    — spectral selection, successive approximation, EOB runs, restart
    markers. Raises ``ValueError`` on arithmetic coding, 12-bit,
    hierarchical frames, structural corruption, or frames declaring
    more than ``max_pixels`` pixels (same untrusted-media bomb
    rationale as ``png.decode_png``)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    coeff: list[np.ndarray] = []
    restart_interval = 0
    saw_scan = False

    while True:
        pos = _next_marker(data, pos)
        if pos + 2 > len(data):
            if saw_scan:
                break  # tolerate a missing EOI after complete scans
            raise ValueError("truncated JPEG (no SOS)")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # stray RST/TEM
            continue
        if pos + 2 > len(data):
            raise ValueError("truncated marker segment")
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        payload = data[pos + 2:pos + seglen]
        if len(payload) != seglen - 2:
            raise ValueError("truncated marker segment")
        pos += seglen

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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 (sequential), SOF2 (progressive)
            if frame is not None:
                raise ValueError("multiple SOF markers")
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
            hmax = max(c["fh"] for c in comps)
            vmax = max(c["fv"] for c in comps)
            frame = {
                "h": fh, "w": fw, "comps": comps,
                "hmax": hmax, "vmax": vmax,
                "mcux": -(-fw // (8 * hmax)), "mcuy": -(-fh // (8 * vmax)),
                "progressive": marker == 0xC2,
            }
            coeff = [
                np.zeros((frame["mcux"] * c["fh"] * frame["mcuy"] * c["fv"], 64),
                         dtype=np.int64)
                for c in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported SOF marker 0xFF{marker:02X} (sequential/progressive "
                "Huffman only — arithmetic/hierarchical/lossless out of scope)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            order = []
            for si in range(ns):
                cs, tt = payload[1 + 2 * si], payload[2 + 2 * si]
                ci = next((i for i, c in enumerate(frame["comps"]) if c["id"] == cs), None)
                if ci is None:
                    raise ValueError(f"scan selects unknown component id {cs}")
                order.append((ci, tt >> 4, tt & 0xF))
            ss_, se_, a_ = payload[1 + 2 * ns:4 + 2 * ns]
            scan = {"order": order, "ss": ss_, "se": se_, "ah": a_ >> 4, "al": a_ & 0xF}
            if se_ > 63 or ss_ > se_:
                raise ValueError(f"invalid spectral band {ss_}..{se_}")
            if frame["progressive"]:
                # G.1.1.1.1: DC and AC never share a progressive scan;
                # AC scans are single-component
                if ss_ == 0 and se_ != 0:
                    raise ValueError("progressive DC scan must have Se=0")
                if ss_ > 0 and ns != 1:
                    raise ValueError("progressive AC scan must be single-component")
            elif ss_ != 0 or se_ != 63 or scan["ah"] or scan["al"]:
                raise ValueError("sequential scan must be the full 0..63 band")
            for _, td, ta in order:
                need_dc = scan["ss"] == 0 and scan["ah"] == 0
                need_ac = scan["se"] > 0
                if need_dc and td not in dc_tabs:
                    raise ValueError("scan references missing DC Huffman table")
                if need_ac and ta not in ac_tabs:
                    raise ValueError("scan references missing AC Huffman table")
            pos = _decode_scan(data, pos, frame, scan, dc_tabs, ac_tabs,
                               restart_interval, coeff)
            saw_scan = True
        # APPn/COM/others: skipped via the generic length field

    if frame is None or not saw_scan:
        raise ValueError("no frame/scan decoded")
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax, vmax, mcux, mcuy = frame["hmax"], frame["vmax"], frame["mcux"], frame["mcuy"]

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
