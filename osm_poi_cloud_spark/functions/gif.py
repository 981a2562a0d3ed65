"""Minimal real GIF decoder — pure stdlib + numpy, no image library.

Closes the GIF corner of the multimodal codec seam from the public
GIF87a/GIF89a specification (CompuServe, 1987/1989; also covered by
RFC 2083's citations and the W3C note): logical screen descriptor,
global/local color tables, variable-code-width LZW decompression,
sub-block packing, interlacing, and the GIF89a graphic-control /
transparency extension.

Scope (documented, checked, raising on anything else):
* GIF87a and GIF89a, global and local palettes, interlaced images
* first frame decoded to (H, W, 3) RGB (or (H, W, 4) RGBA when a
  transparency index is declared); later animation frames are counted
  but not composited (frame compositing with disposal methods is the
  remaining GIF seam, honestly marked)
* LZW with dynamic code width 3..12 bits, clear/EOI codes, the
  deferred-clear convention real encoders use

An encoder (``encode_gif``) exists for offline round-trip testing:
palette-exact images survive encode -> decode bit-identically.

Same untrusted-media stance as the other codecs: declared dimensions
are capped (``max_pixels``) before any allocation, and LZW output is
bounded by the declared frame size.
"""

from __future__ import annotations

import struct

import numpy as np

#: same rationale as png.MAX_PIXELS
MAX_PIXELS = 64_000_000


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable code width, LSB-first bit packing)
# ---------------------------------------------------------------------------

def lzw_decompress(data: bytes, min_code_size: int, max_out: int) -> bytes:
    """GIF-flavor LZW: codes are packed LSB-first; width starts at
    min_code_size+1 and grows after the table fills, capped at 12 bits;
    CLEAR resets the table, EOI ends the stream. Output is hard-capped
    at ``max_out`` (bomb guard — the declared frame size)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader state
    acc = 0
    nbits = 0
    pos = 0

    def init_table():
        return {i: bytes([i]) for i in range(clear)}

    table = init_table()
    next_code = eoi + 1
    width = min_code_size + 1
    prev: bytes | None = None

    while True:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)  # truncated stream: return what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = init_table()
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError("LZW: first code not in table")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]
        else:
            raise ValueError("LZW: code out of range")
        out.extend(entry)
        if len(out) > max_out:
            raise ValueError("LZW output exceeds declared frame size (bomb guard)")
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


def lzw_compress(indices: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW encoder (for round-trip tests)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = b""
    for b in indices:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        if next_code < 4096:
            table[cur] = next_code
            # GIF width grows when next_code EXCEEDS the width capacity
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([b])
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[order] = rows
    return out


def encode_gif(indices: np.ndarray, palette: np.ndarray,
               interlace: bool = False,
               transparent_index: int | None = None) -> bytes:
    """(H, W) uint8 palette indices + (N, 3) uint8 palette -> GIF89a."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= len(pal) <= 256:
        raise ValueError("palette must be (N<=256, 3) uint8")
    if idx.max(initial=0) >= len(pal):
        raise ValueError("index out of palette range")
    # palette size must be a power of two >= 2
    pbits = max(1, int(len(pal) - 1).bit_length())
    pal_full = np.zeros((1 << pbits, 3), np.uint8)
    pal_full[:len(pal)] = pal

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (pbits - 1), 0, 0])  # GCT present, size 2^pbits
    out += pal_full.tobytes()
    if transparent_index is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent_index, 0])
    out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0])
    if interlace:
        order = []
        for start, step in _INTERLACE_PASSES:
            order.extend(range(start, h, step))
        idx = idx[order]
    mcs = max(2, pbits)
    out += bytes([mcs])
    payload = lzw_compress(idx.tobytes(), mcs)
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])  # block terminator + trailer
    return bytes(out)


def decode_gif(data: bytes, max_pixels: int = MAX_PIXELS) -> np.ndarray:
    """GIF bytes -> first frame as (H, W, 3) uint8 RGB, or (H, W, 4)
    RGBA when the frame declares a transparency index."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    sw, sh = struct.unpack("<HH", data[6:10])
    flags, bg, _ = data[10], data[11], data[12]
    if sw == 0 or sh == 0 or sw * sh > max_pixels:
        raise ValueError(
            f"refusing {sw}x{sh} GIF (> {max_pixels} px cap — bomb guard)")
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(-1, 3)
        if len(gct) != n:
            raise ValueError("truncated global color table")
        pos += 3 * n

    transparent = None
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9 and data[pos] >= 4:  # graphic control
                gflags = data[pos + 1]
                if gflags & 1:
                    transparent = data[pos + 4]
            # skip sub-blocks
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor — decode first frame
            ix, iy, iw, ih = struct.unpack("<HHHH", data[pos + 1:pos + 9])
            iflags = data[pos + 9]
            pos += 10
            if iw == 0 or ih == 0 or iw * ih > max_pixels:
                raise ValueError("frame exceeds pixel cap (bomb guard)")
            pal = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 7)
                pal = np.frombuffer(data[pos:pos + 3 * n], np.uint8).reshape(-1, 3)
                if len(pal) != n:
                    raise ValueError("truncated local color table")
                pos += 3 * n
            if pal is None:
                raise ValueError("no color table for frame")
            mcs = data[pos]
            pos += 1
            if not 2 <= mcs <= 11:
                raise ValueError(f"bad LZW min code size {mcs}")
            chunks = bytearray()
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                chunks += data[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            raw = lzw_decompress(bytes(chunks), mcs, iw * ih)
            if len(raw) < iw * ih:
                raise ValueError("LZW stream shorter than declared frame")
            idx = np.frombuffer(raw[:iw * ih], np.uint8).reshape(ih, iw)
            if iflags & 0x40:
                idx = _deinterlace(idx)
            if idx.max(initial=0) >= len(pal):
                raise ValueError("pixel index outside color table")
            rgb = pal[idx]
            if (ix, iy, iw, ih) != (0, 0, sw, sh):
                # frame smaller than / offset within the logical screen:
                # composite onto the canvas so pixel positions are
                # canvas-relative (clip frames that overhang the edge)
                cw = min(iw, max(sw - ix, 0))
                ch = min(ih, max(sh - iy, 0))
                if transparent is not None:
                    canvas = np.zeros((sh, sw, 4), np.uint8)
                    alpha = np.where(idx == transparent, 0, 255).astype(np.uint8)
                    frame = np.dstack([rgb, alpha])
                    canvas[iy:iy + ch, ix:ix + cw] = frame[:ch, :cw]
                    return canvas
                # the logical-screen background index refers to the
                # GLOBAL color table (GIF89a spec §18), not the active
                # frame's local palette; black when no global table
                bg_rgb = (gct[bg] if gct is not None and bg < len(gct)
                          else np.zeros(3, np.uint8))
                canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
                canvas[iy:iy + ch, ix:ix + cw] = rgb[:ch, :cw]
                return canvas
            if transparent is not None:
                alpha = np.where(idx == transparent, 0, 255).astype(np.uint8)
                return np.dstack([rgb, alpha])
            return rgb
        else:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
    raise ValueError("GIF contains no image frame")


def parse_gif_dims(data: bytes) -> tuple[int, int] | None:
    """Header-only (width, height), or None."""
    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 10:
        return None
    w, h = struct.unpack("<HH", data[6:10])
    return w, h
