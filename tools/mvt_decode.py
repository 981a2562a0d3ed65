"""Independent MVT / PMTiles readers for verification.

Minimal spec-following decoders (protobuf wire format + PMTiles v3
layout) written separately from the encoder so tests and the golden
generator can round-trip engine output back to features without
trusting encoder internals. Shared by tests/test_mvt.py and
tools/make_goldens.py.
"""

from __future__ import annotations

import gzip
import struct


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a protobuf message.
    value: int for varint(0)/fixed(1,5), bytes for length-delimited(2)."""
    pos = 0
    while pos < len(buf):
        key, pos = read_varint(buf, pos)
        num, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = read_varint(buf, pos)
        elif wire == 1:
            val = struct.unpack("<Q", buf[pos:pos + 8])[0]
            pos += 8
        elif wire == 2:
            ln, pos = read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:
            val = struct.unpack("<I", buf[pos:pos + 4])[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield num, wire, val


def decode_value(buf: bytes):
    for num, _, val in iter_fields(buf):
        if num == 1:
            return val.decode("utf-8")
        if num == 2:
            return struct.unpack("<f", struct.pack("<I", val))[0]
        if num == 3:
            return struct.unpack("<d", struct.pack("<Q", val))[0]
        if num in (4, 5):
            return val
        if num == 6:
            return unzigzag(val)
        if num == 7:
            return bool(val)
    return None


def decode_mvt(buf: bytes) -> list[dict]:
    """MVT bytes -> list of layers: {name, extent, version, features:
    [{id, type, props, points: [(px, py), ...]}]}."""
    layers = []
    for num, _, layer_buf in iter_fields(buf):
        if num != 3:
            continue
        name, extent, version = None, 4096, None
        keys, values, raw_feats = [], [], []
        for fnum, _, fval in iter_fields(layer_buf):
            if fnum == 1:
                name = fval.decode("utf-8")
            elif fnum == 2:
                raw_feats.append(fval)
            elif fnum == 3:
                keys.append(fval.decode("utf-8"))
            elif fnum == 4:
                values.append(decode_value(fval))
            elif fnum == 5:
                extent = fval
            elif fnum == 15:
                version = fval
        feats = []
        for fbuf in raw_feats:
            fid, ftype, tags, geom = None, None, [], []
            for gnum, gwire, gval in iter_fields(fbuf):
                if gnum == 1:
                    fid = gval
                elif gnum == 2:
                    pos = 0
                    while pos < len(gval):
                        v, pos = read_varint(gval, pos)
                        tags.append(v)
                elif gnum == 3:
                    ftype = gval
                elif gnum == 4:
                    pos = 0
                    while pos < len(gval):
                        v, pos = read_varint(gval, pos)
                        geom.append(v)
            props = {keys[tags[i]]: values[tags[i + 1]] for i in range(0, len(tags), 2)}
            # point geometry: sequence of MoveTo commands with cursor deltas
            points = []
            cx = cy = 0
            gpos = 0
            while gpos < len(geom):
                cmd = geom[gpos]
                cid, count = cmd & 7, cmd >> 3
                gpos += 1
                assert cid == 1, f"expected MoveTo, got {cid}"
                for _ in range(count):
                    cx += unzigzag(geom[gpos])
                    cy += unzigzag(geom[gpos + 1])
                    gpos += 2
                    points.append((cx, cy))
            feats.append({"id": fid, "type": ftype, "props": props, "points": points})
        layers.append({"name": name, "extent": extent, "version": version, "features": feats})
    return layers


# ---------------------------------------------------------------------------
# PMTiles v3
# ---------------------------------------------------------------------------

def read_pmtiles(path: str) -> dict:
    """Parse a PMTiles v3 file -> {header fields, entries, metadata,
    get(z, x, y) -> tile bytes or None}."""
    with open(path, "rb") as fh:
        blob = fh.read()
    assert blob[:8] == b"PMTiles\x03", "bad magic/version"
    (root_off, root_len, meta_off, meta_len, leaf_off, leaf_len,
     data_off, data_len, n_addressed, n_entries, n_contents) = struct.unpack(
        "<11Q", blob[8:96])
    clustered, internal_comp, tile_comp, tile_type = blob[96:100]
    min_zoom, max_zoom = blob[100], blob[101]
    bounds = struct.unpack("<iiii", blob[102:118])

    def _unz(raw: bytes) -> bytes:
        return gzip.decompress(raw) if internal_comp == 2 else raw

    def _parse_dir(buf: bytes) -> list[tuple[int, int, int, int]]:
        pos = 0
        n, pos = read_varint(buf, pos)
        tids, runs, lens, offs = [], [], [], []
        last = 0
        for _ in range(n):
            d, pos = read_varint(buf, pos)
            last += d
            tids.append(last)
        for _ in range(n):
            v, pos = read_varint(buf, pos)
            runs.append(v)
        for _ in range(n):
            v, pos = read_varint(buf, pos)
            lens.append(v)
        for i in range(n):
            v, pos = read_varint(buf, pos)
            if v == 0:
                offs.append(offs[i - 1] + lens[i - 1])
            else:
                offs.append(v - 1)
        return list(zip(tids, offs, lens, runs))

    root_entries = _parse_dir(_unz(blob[root_off:root_off + root_len]))
    metadata = _unz(blob[meta_off:meta_off + meta_len])

    leaf_cache: dict[int, list[tuple[int, int, int, int]]] = {}

    def _leaf(off: int, ln: int) -> list[tuple[int, int, int, int]]:
        if off not in leaf_cache:
            leaf_cache[off] = _parse_dir(_unz(blob[leaf_off + off:leaf_off + off + ln]))
        return leaf_cache[off]

    _keys_cache: dict[int, list[int]] = {}

    def _find(entries, tid):
        """Last entry with entry.tid <= tid (spec directory search)."""
        import bisect

        keys = _keys_cache.get(id(entries))
        if keys is None:
            keys = _keys_cache[id(entries)] = [e[0] for e in entries]
        i = bisect.bisect_right(keys, tid) - 1
        return entries[i] if i >= 0 else None

    # fully-expanded tile entries (root + every leaf) for inspection;
    # leaf pointers are the run_length == 0 rows of the root
    entries = []
    for t, o, ln, rl in root_entries:
        if rl == 0:
            entries.extend(_leaf(o, ln))
        else:
            entries.append((t, o, ln, rl))

    def tile_id(z, x, y):
        acc = ((1 << (2 * z)) - 1) // 3
        rx = ry = 0
        d = 0
        s = (1 << z) >> 1
        while s > 0:
            rx = 1 if (x & s) else 0
            ry = 1 if (y & s) else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = s - 1 - x
                    y = s - 1 - y
                x, y = y, x
            s >>= 1
        return acc + d

    def get(z, x, y):
        tid = tile_id(z, x, y)
        e = _find(root_entries, tid)
        if e is not None and e[3] == 0:  # leaf directory pointer
            e = _find(_leaf(e[1], e[2]), tid)
        if e is None or e[3] == 0 or tid >= e[0] + e[3]:
            return None
        _, o, ln, _ = e
        raw = blob[data_off + o:data_off + o + ln]
        return gzip.decompress(raw) if tile_comp == 2 else raw

    return {
        "n_entries": n_entries, "n_addressed": n_addressed, "n_contents": n_contents,
        "min_zoom": min_zoom, "max_zoom": max_zoom, "bounds": bounds,
        "clustered": clustered, "tile_type": tile_type, "entries": entries,
        "root_entries": root_entries, "n_leaves": sum(1 for e in root_entries if e[3] == 0),
        "metadata": metadata, "get": get,
    }
