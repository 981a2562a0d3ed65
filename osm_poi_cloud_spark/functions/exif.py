"""EXIF / TIFF-IFD metadata: from-spec reader + GPS writer (pure
stdlib — the codec-suite discipline of functions/{png,jpeg,gif,wav}.py).

Why it's here: the reference pipeline mines POI entities out of web
pages; the web's OTHER geo source is camera metadata — a page's photos
carry GPS in their EXIF APP1 segment. This module parses that segment
(JPEG marker walk -> TIFF byte order -> IFD entry walk -> GPS sub-IFD
-> degree/minute/second rationals) and writes it (for fixtures and the
writer∘parser==id contract oracle).

Spec: JPEG segments are ``FF xx [len16 payload]``; APP1 (``FF E1``)
with an ``Exif\\0\\0`` preamble wraps a TIFF block: 2-byte byte order
(``II``/``MM``), magic 42, IFD0 offset. Each IFD is a 2-byte entry
count then 12-byte entries (tag, type, count, value-or-offset); values
wider than 4 bytes live at an offset inside the TIFF block. GPS data
hangs off IFD0 tag 0x8825 (pointer to the GPS IFD): tags 1/3 are the
N|S / E|W refs, tags 2/4 are three RATIONALs (deg, min, sec).

Robustness (the codec-fuzz lesson): every read is bounds-checked;
truncated segments, out-of-range offsets, zero denominators and
unknown types return ``None`` / skip the entry — never raise on
untrusted bytes.
"""

from __future__ import annotations

import struct

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}

GPS_IFD_POINTER = 0x8825
EXIF_IFD_POINTER = 0x8769


def iter_jpeg_segments(data: bytes):
    """Yield (marker, payload) for each JPEG segment up to SOS/EOI.
    Tolerant of fill bytes; stops (instead of raising) on truncation."""
    if len(data) < 2 or data[0:2] != b"\xff\xd8":
        return
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            return
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xDA:  # SOS: entropy data follows, no more metadata
            return
        ln = struct.unpack(">H", data[i + 2:i + 4])[0]
        if ln < 2 or i + 2 + ln > len(data):
            return
        yield marker, data[i + 4:i + 2 + ln]
        i += 2 + ln


def _read_ifd(t: bytes, e: str, off: int, out: dict, prefix: str) -> None:
    if off + 2 > len(t):
        return
    (n,) = struct.unpack_from(e + "H", t, off)
    for k in range(n):
        ent = off + 2 + 12 * k
        if ent + 12 > len(t):
            return
        tag, typ, cnt = struct.unpack_from(e + "HHI", t, ent)
        size = _TYPE_SIZES.get(typ)
        if size is None or cnt > len(t):
            continue
        total = size * cnt
        if total <= 4:
            voff = ent + 8
        else:
            (voff,) = struct.unpack_from(e + "I", t, ent + 8)
        if voff + total > len(t):
            continue
        raw = t[voff:voff + total]
        if typ == 2:  # ASCII, NUL-terminated
            val = raw.split(b"\x00", 1)[0].decode("ascii", "replace")
        elif typ == 3:
            val = struct.unpack(e + f"{cnt}H", raw)
            val = val[0] if cnt == 1 else val
        elif typ == 4:
            val = struct.unpack(e + f"{cnt}I", raw)
            val = val[0] if cnt == 1 else val
        elif typ == 5:  # RATIONAL: (num, den) pairs
            flat = struct.unpack(e + f"{2 * cnt}I", raw)
            val = tuple(zip(flat[::2], flat[1::2]))
            val = val[0] if cnt == 1 else val
        elif typ == 10:  # SRATIONAL
            flat = struct.unpack(e + f"{2 * cnt}i", raw)
            val = tuple(zip(flat[::2], flat[1::2]))
            val = val[0] if cnt == 1 else val
        else:
            val = raw
        out[prefix + format(tag, "#06x")] = val


def parse_exif(data: bytes) -> dict | None:
    """Parse the first APP1/Exif segment of a JPEG byte string into a
    flat {'ifd0:0x....': value, 'gps:0x....': value, 'exif:0x....':
    value} dict (plus 'byte_order'). None if absent/corrupt."""
    app1 = None
    for marker, payload in iter_jpeg_segments(data):
        if marker == 0xE1 and payload[:6] == b"Exif\x00\x00":
            app1 = payload
            break
    if app1 is None:
        return None
    t = app1[6:]
    if len(t) < 8 or t[:2] not in (b"II", b"MM"):
        return None
    e = "<" if t[:2] == b"II" else ">"
    magic, ifd0 = struct.unpack_from(e + "HI", t, 2)
    if magic != 42:
        return None
    out: dict = {"byte_order": t[:2].decode()}
    _read_ifd(t, e, ifd0, out, "ifd0:")
    gps_ptr = out.get("ifd0:" + format(GPS_IFD_POINTER, "#06x"))
    if isinstance(gps_ptr, int):
        _read_ifd(t, e, gps_ptr, out, "gps:")
    exif_ptr = out.get("ifd0:" + format(EXIF_IFD_POINTER, "#06x"))
    if isinstance(exif_ptr, int):
        _read_ifd(t, e, exif_ptr, out, "exif:")
    return out


def _dms_to_degrees(dms) -> float | None:
    """(deg, min, sec) rationals -> decimal degrees with a FIXED
    left-associated IEEE chain (deg + (mn/md)/60 + (sn/sd)/3600) so the
    value is bit-reproducible by any engine mirroring the chain."""
    if not isinstance(dms, tuple) or len(dms) != 3:
        return None
    try:
        (dn, dd), (mn, md), (sn, sd) = dms
    except (TypeError, ValueError):
        return None
    if dd == 0 or md == 0 or sd == 0:
        return None
    return dn / dd + (mn / md) / 60.0 + (sn / sd) / 3600.0


def exif_gps_latlon(data: bytes) -> tuple[float, float] | None:
    """(lat, lon) decimal degrees from a JPEG's EXIF GPS IFD, or None.
    Sign from the N/S / E/W reference tags; out-of-range values
    rejected (corrupt rationals shouldn't produce fake coordinates)."""
    tags = parse_exif(data)
    if not tags:
        return None
    lat = _dms_to_degrees(tags.get("gps:0x0002"))
    lon = _dms_to_degrees(tags.get("gps:0x0004"))
    if lat is None or lon is None:
        return None
    if tags.get("gps:0x0001") == "S":
        lat = -lat
    if tags.get("gps:0x0003") == "W":
        lon = -lon
    if not (-90.0 <= lat <= 90.0 and -180.0 <= lon <= 180.0):
        return None
    return lat, lon


def build_exif_gps_app1(lat_dms, lat_ref: str, lon_dms, lon_ref: str,
                        byte_order: str = "II") -> bytes:
    """APP1/Exif payload (without the FF E1 len framing) carrying ONE
    GPS IFD with refs + (deg, min, sec) rationals — the writer half of
    the writer∘parser==id oracle. ``*_dms`` are three (num, den) int
    pairs; ``byte_order`` 'II' (little) or 'MM' (big)."""
    if byte_order not in ("II", "MM"):
        raise ValueError(f"byte_order must be 'II' or 'MM', got {byte_order!r}")
    if lat_ref not in ("N", "S") or lon_ref not in ("E", "W"):
        raise ValueError("lat_ref must be N|S and lon_ref E|W")
    for dms in (lat_dms, lon_dms):
        if len(dms) != 3 or any(len(p) != 2 for p in dms):
            raise ValueError("dms must be three (num, den) pairs")
    e = "<" if byte_order == "II" else ">"
    # TIFF layout: header(8) | IFD0: count + 1 entry + next(4)
    #              | GPS IFD: count + 4 entries + next(4) | rational data
    ifd0_off = 8
    gps_off = ifd0_off + 2 + 12 + 4
    data_off = gps_off + 2 + 4 * 12 + 4
    lat_raw = struct.pack(e + "6I", *[v for p in lat_dms for v in p])
    lon_raw = struct.pack(e + "6I", *[v for p in lon_dms for v in p])

    t = bytearray()
    t += byte_order.encode() + struct.pack(e + "HI", 42, ifd0_off)
    t += struct.pack(e + "H", 1)
    t += struct.pack(e + "HHII", GPS_IFD_POINTER, 4, 1, gps_off)
    t += struct.pack(e + "I", 0)
    assert len(t) == gps_off
    t += struct.pack(e + "H", 4)
    t += struct.pack(e + "HHI", 1, 2, 2) + lat_ref.encode() + b"\x00\x00\x00"
    t += struct.pack(e + "HHII", 2, 5, 3, data_off)
    t += struct.pack(e + "HHI", 3, 2, 2) + lon_ref.encode() + b"\x00\x00\x00"
    t += struct.pack(e + "HHII", 4, 5, 3, data_off + len(lat_raw))
    t += struct.pack(e + "I", 0)
    assert len(t) == data_off
    t += lat_raw + lon_raw
    return b"Exif\x00\x00" + bytes(t)


def insert_app1(jpeg: bytes, app1_payload: bytes) -> bytes:
    """Splice an APP1 segment right after SOI (valid placement per
    spec; existing segments shift down)."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    ln = len(app1_payload) + 2
    if ln > 0xFFFF:
        raise ValueError("APP1 payload too large")
    return jpeg[:2] + b"\xff\xe1" + struct.pack(">H", ln) + app1_payload + jpeg[2:]
