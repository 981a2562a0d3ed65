"""Binary vector-tile encoding: Mapbox Vector Tile (MVT) layers + a
PMTiles v3 archive writer — the engine's analog of the reference's
tippecanoe step (``stack/tiles/generate_pmtiles.py:135-162``: z2-14,
layer ``pois``, one servable PMTiles artifact).

Design:

* ``encode_mvt`` — dependency-free MVT 2.1 protobuf encoder for point
  features. Pixel coordinates REUSE the engine's bit-exact tile math:
  a 4096-extent pixel at zoom z is exactly the tile index at zoom z+12
  minus ``x << 12`` (same float64 formula as P9, so a feature's pixel
  cell always agrees with its tile assignment). Keys/values tables and
  feature order are deterministic (build_tiles pins feature order).
* ``encode_tiles_mvt`` — Spark surface: one Arrow-batched pandas UDF
  over the ``build_tiles`` output (already one row per tile), emitting
  a ``mvt`` binary column. Distributed: tiles encode where they live;
  nothing funnels through the driver.
* ``write_pmtiles`` — assembles the (small, bounded: <= 4^max_zoom
  entries) tile directory into a PMTiles v3 file: Hilbert tile ids,
  clustered tile data, identical-tile dedup, gzipped root directory +
  JSON metadata. The directory/merge step is the only driver-side part
  (same shape as the reference, where tippecanoe runs single-node on
  the merged table); tile *encoding* stays distributed.

MVT spec: https://github.com/mapbox/vector-tile-spec (2.1).
PMTiles v3 spec: https://github.com/protomaps/PMTiles/blob/main/spec/v3.
"""

from __future__ import annotations

import gzip
import json
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import tile_math as tm

EXTENT = 4096
_EXTENT_BITS = 12  # log2(EXTENT)


# ---------------------------------------------------------------------------
# protobuf primitives
# ---------------------------------------------------------------------------

def _varint(v: int) -> bytes:
    out = bytearray()
    v &= 0xFFFFFFFFFFFFFFFF
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _len_field(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def _packed(num: int, ints) -> bytes:
    return _len_field(num, b"".join(_varint(i) for i in ints))


# ---------------------------------------------------------------------------
# MVT encoding
# ---------------------------------------------------------------------------

def _mvt_value(v) -> bytes:
    """Tile.Value message for a property value."""
    if isinstance(v, bool):
        return _field(7, 0) + _varint(1 if v else 0)
    if isinstance(v, (int, np.integer)):
        return _field(6, 0) + _varint(_zigzag(int(v)))  # sint_value
    if isinstance(v, (float, np.floating)):
        return _field(3, 1) + struct.pack("<d", float(v))  # double_value
    s = ("" if v is None else str(v)).encode("utf-8")
    return _len_field(1, s)


def encode_mvt(
    z: int,
    x: int,
    y: int,
    lon: np.ndarray,
    lat: np.ndarray,
    props: dict[str, list],
    ids: np.ndarray | None = None,
    layer_name: str = "pois",
) -> bytes:
    """Encode one point layer for tile (z, x, y) -> MVT bytes.

    ``props``: column-name -> per-feature value list. Features must
    already belong to the tile (encode clamps stray pixels to the
    extent edge rather than dropping them).
    """
    px_all, py_all = tm.lon_lat_to_tile(lon, lat, z + _EXTENT_BITS)
    px = np.clip(px_all - (int(x) << _EXTENT_BITS), 0, EXTENT - 1)
    py = np.clip(py_all - (int(y) << _EXTENT_BITS), 0, EXTENT - 1)

    keys = list(props.keys())
    values: list = []
    value_idx: dict = {}
    feats = []
    n = len(lon)
    for i in range(n):
        tags = []
        for ki, k in enumerate(keys):
            v = props[k][i]
            if v is None or (isinstance(v, float) and np.isnan(v)):
                continue
            vk = (type(v).__name__, v)
            if vk not in value_idx:
                value_idx[vk] = len(values)
                values.append(v)
            tags.extend((ki, value_idx[vk]))
        geom = _packed(4, [(1 << 3) | 1, _zigzag(int(px[i])), _zigzag(int(py[i]))])
        body = b""
        if ids is not None:
            body += _field(1, 0) + _varint(int(ids[i]))
        body += _packed(2, tags) + _field(3, 0) + _varint(1) + geom  # type=POINT
        feats.append(_len_field(2, body))

    layer = bytearray()
    layer += _field(15, 0) + _varint(2)  # version
    layer += _len_field(1, layer_name.encode("utf-8"))
    for f in feats:
        layer += f
    for k in keys:
        layer += _len_field(3, k.encode("utf-8"))
    for v in values:
        layer += _len_field(4, _mvt_value(v))
    layer += _field(5, 0) + _varint(EXTENT)
    return bytes(_len_field(3, bytes(layer)))


def encode_tiles_mvt(
    tiles: DataFrame,
    layer_name: str = "pois",
    prop_cols: tuple[str, ...] = ("name", "class"),
    id_col: str = "poi_id",
) -> DataFrame:
    """``build_tiles`` output (z, x, y, n_features, features) -> adds a
    ``mvt`` binary column. One Arrow-batched UDF; feature order inside
    the array is already pinned, so bytes are deterministic."""

    @F.pandas_udf(T.BinaryType())
    def enc(z: pd.Series, x: pd.Series, y: pd.Series, features: pd.Series) -> pd.Series:
        out = []
        for zi, xi, yi, fl in zip(z, x, y, features):
            fl = list(fl)
            lon = np.array([f["lon"] for f in fl], dtype=np.float64)
            lat = np.array([f["lat"] for f in fl], dtype=np.float64)
            props = {c: [f[c] for f in fl] for c in prop_cols if fl and c in fl[0]}
            ids = None
            if fl and id_col in fl[0] and isinstance(fl[0][id_col], (int, np.integer)):
                ids = np.array([f[id_col] for f in fl], dtype=np.int64)
            elif fl and id_col in fl[0]:
                props[id_col] = [f[id_col] for f in fl]
            out.append(encode_mvt(int(zi), int(xi), int(yi), lon, lat, props, ids, layer_name))
        return pd.Series(out)

    return tiles.withColumn("mvt", enc(F.col("z"), F.col("x"), F.col("y"), F.col("features")))


# ---------------------------------------------------------------------------
# PMTiles v3
# ---------------------------------------------------------------------------

def hilbert_tile_id(z: int, x: int, y: int) -> int:
    """PMTiles v3 tile id: cumulative pyramid offset + Hilbert d(x, y)."""
    acc = ((1 << (2 * z)) - 1) // 3  # sum of 4^i for i < z
    n = 1 << z
    rx = ry = 0
    d = 0
    s = n >> 1
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        # rotate
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return acc + d


def _serialize_directory(entries: list[tuple[int, int, int, int]]) -> bytes:
    """entries: sorted (tile_id, offset, length, run_length) -> spec bytes."""
    out = bytearray(_varint(len(entries)))
    last = 0
    for tid, _, _, _ in entries:
        out += _varint(tid - last)
        last = tid
    for _, _, _, rl in entries:
        out += _varint(rl)
    for _, _, ln, _ in entries:
        out += _varint(ln)
    for i, (_, off, ln, _) in enumerate(entries):
        if i > 0 and off == entries[i - 1][1] + entries[i - 1][2]:
            out += _varint(0)  # contiguous with previous
        else:
            out += _varint(off + 1)
    return bytes(out)


def _gz(data: bytes) -> bytes:
    return gzip.compress(data, mtime=0)


def write_pmtiles(
    rows,
    path: str,
    min_zoom: int,
    max_zoom: int,
    bounds: tuple[float, float, float, float] = (-180.0, -85.05112878, 180.0, 85.05112878),
    metadata: dict | None = None,
) -> dict:
    """Write (z, x, y, mvt_bytes) rows to a PMTiles v3 archive.

    ``rows``: iterable of (z, x, y, bytes) — e.g. the collected
    ``encode_tiles_mvt`` output (bounded by 4^max_zoom entries; the
    directory build is the deliberate driver-side merge step).
    Identical tile payloads are stored once (tile_contents_count <
    tile_entries_count). Returns summary stats."""
    tiles = sorted((hilbert_tile_id(int(z), int(x), int(y)), bytes(b)) for z, x, y, b in rows)
    data = bytearray()
    offsets: dict[bytes, tuple[int, int]] = {}
    entries: list[tuple[int, int, int, int]] = []
    for tid, blob in tiles:
        if blob in offsets:
            off, ln = offsets[blob]
        else:
            off, ln = len(data), len(blob)
            data += blob
            offsets[blob] = (off, ln)
        entries.append((tid, off, ln, 1))

    root = _gz(_serialize_directory(entries))
    meta = _gz(json.dumps(metadata or {
        "name": "osm_poi_cloud_spark tiles",
        "vector_layers": [{"id": "pois", "fields": {"name": "String", "class": "String"}}],
    }, sort_keys=True).encode("utf-8"))

    header_len = 127
    root_off = header_len
    meta_off = root_off + len(root)
    leaf_off = meta_off + len(meta)
    data_off = leaf_off  # no leaf directories at these entry counts
    e7 = 10_000_000

    header = bytearray()
    header += b"PMTiles\x03"
    header += struct.pack("<QQ", root_off, len(root))
    header += struct.pack("<QQ", meta_off, len(meta))
    header += struct.pack("<QQ", leaf_off, 0)
    header += struct.pack("<QQ", data_off, len(data))
    header += struct.pack("<QQQ", len(entries), len(entries), len(offsets))
    # clustered=1, internal_compression=2 (gzip dirs/meta),
    # tile_compression=1 (none: MVT payloads stored raw), tile_type=1 (MVT)
    header += bytes([1, 2, 1, 1])
    header += bytes([min_zoom, max_zoom])
    header += struct.pack("<iiii", int(bounds[0] * e7), int(bounds[1] * e7),
                          int(bounds[2] * e7), int(bounds[3] * e7))
    header += bytes([min_zoom]) + struct.pack(
        "<ii", int((bounds[0] + bounds[2]) / 2 * e7), int((bounds[1] + bounds[3]) / 2 * e7))
    assert len(header) == header_len, len(header)

    with open(path, "wb") as fh:
        fh.write(bytes(header))
        fh.write(root)
        fh.write(meta)
        fh.write(bytes(data))
    return {
        "tiles": len(entries),
        "unique_payloads": len(offsets),
        "data_bytes": len(data),
        "root_dir_bytes": len(root),
    }
