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
* ``PMTilesWriter`` / ``write_pmtiles`` / ``write_pmtiles_streamed`` —
  assemble tiles into a PMTiles v3 archive: Hilbert tile ids, clustered
  tile data, identical-payload dedup, run-length coalescing, gzipped
  root + LEAF directories (spec: root stays <= 16 KiB; overflow entries
  go to leaves), JSON metadata. Payload bytes STREAM through a temp
  data file — driver memory holds only the integer directory entries
  and a 16-byte-digest dedup map, so a planet z2-14 archive (the
  reference's actual artifact, generate_pmtiles.py:139-152) assembles
  without buffering tile data. The archive-assembly step is the only
  driver-side part (same shape as the reference, where tippecanoe runs
  single-node on the merged table); tile *encoding* stays distributed,
  and ``write_pmtiles_streamed`` lets Spark do the Hilbert sort.

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


def _serialize_directory(entries) -> bytes:
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
    prev_end = None
    for _, off, ln, _ in entries:
        if prev_end is not None and off == prev_end:
            out += _varint(0)  # contiguous with previous
        else:
            out += _varint(off + 1)
        prev_end = off + ln
    return bytes(out)


def _gz(data: bytes) -> bytes:
    return gzip.compress(data, mtime=0)


MAX_ROOT_BYTES = 16384  # PMTiles v3 spec: root directory should stay <= 16 KiB


def _build_directories(tids, offs, lens, runs,
                       max_root_bytes: int = MAX_ROOT_BYTES) -> tuple[bytes, bytes, int]:
    """Split entries (four parallel int sequences, tile-id sorted) into a
    gzipped root directory + concatenated gzipped leaf directories so the
    root stays within ``max_root_bytes`` (spec v3 layout).

    Returns (root_gz, leaves_blob, n_leaves). Root-only when everything
    fits; otherwise leaf entries carry run_length=0 and their offset /
    length address the leaf inside the leaf-directory section. Each leaf
    is serialized from a bounded slice, so peak extra memory is one leaf,
    not the full entry set."""
    n = len(tids)
    if n <= max_root_bytes:  # small enough that a root-only attempt is cheap
        root = _gz(_serialize_directory(list(zip(tids, offs, lens, runs))))
        if len(root) <= max_root_bytes:
            return root, b"", 0
    leaf_size = 4096
    while True:
        leaves = bytearray()
        root_entries: list[tuple[int, int, int, int]] = []
        for i in range(0, n, leaf_size):
            j = min(i + leaf_size, n)
            leaf = _gz(_serialize_directory(list(zip(tids[i:j], offs[i:j], lens[i:j], runs[i:j]))))
            root_entries.append((tids[i], len(leaves), len(leaf), 0))
            leaves += leaf
        root = _gz(_serialize_directory(root_entries))
        if len(root) <= max_root_bytes or len(root_entries) == 1:
            return root, bytes(leaves), len(root_entries)
        leaf_size = leaf_size + (leaf_size >> 1)  # grow 1.5x until the root fits


class PMTilesWriter:
    """Incremental PMTiles v3 archive writer.

    ``add(tile_id, blob)`` in strictly increasing Hilbert tile-id order;
    ``finalize()`` assembles the file. Payload bytes go straight to a
    temp data file — the writer holds only four int arrays of directory
    entries (~32 B per entry; run-length coalescing collapses identical
    consecutive tiles, e.g. empty ocean) plus a 16-byte-digest dedup map,
    so a planet z2-14 directory fits in driver memory while the multi-TB
    data section never does more than stream through. This is the scale
    fix for the r2 root-only / one-bytearray assembly
    (``stack/tiles/generate_pmtiles.py:139-152`` is the reference's
    planet-scale artifact)."""

    def __init__(self, path: str, min_zoom: int, max_zoom: int,
                 bounds: tuple[float, float, float, float] = (-180.0, -85.05112878, 180.0, 85.05112878),
                 metadata: dict | None = None, dedup: bool = True):
        from array import array

        self.path = path
        self.min_zoom = min_zoom
        self.max_zoom = max_zoom
        self.bounds = bounds
        self.metadata = metadata
        self._tmp = path + ".data.tmp"
        self._fh = open(self._tmp, "wb")
        self._tids = array("q")
        self._offs = array("q")
        self._lens = array("q")
        self._runs = array("q")
        self._digests: dict[bytes, tuple[int, int]] | None = {} if dedup else None
        self._data_len = 0
        self._addressed = 0
        self._contents = 0
        self._last_tid = -1

    def add(self, tile_id: int, blob: bytes) -> None:
        tile_id = int(tile_id)
        if tile_id <= self._last_tid:
            raise ValueError(f"tile ids must be strictly increasing (got {tile_id} after {self._last_tid})")
        loc = None
        if self._digests is not None:
            import hashlib

            key = hashlib.md5(blob).digest()
            loc = self._digests.get(key)
        if loc is None:
            loc = (self._data_len, len(blob))
            self._fh.write(blob)
            self._data_len += len(blob)
            self._contents += 1
            if self._digests is not None:
                self._digests[key] = loc
        off, ln = loc
        t, o, l, r = self._tids, self._offs, self._lens, self._runs
        if t and o[-1] == off and l[-1] == ln and tile_id == t[-1] + r[-1]:
            r[-1] += 1  # identical payload, contiguous id: extend the run
        else:
            t.append(tile_id)
            o.append(off)
            l.append(ln)
            r.append(1)
        self._addressed += 1
        self._last_tid = tile_id

    def finalize(self) -> dict:
        import os

        self._fh.close()
        root, leaves, n_leaves = _build_directories(self._tids, self._offs, self._lens, self._runs)
        meta = _gz(json.dumps(self.metadata or {
            "name": "osm_poi_cloud_spark tiles",
            "vector_layers": [{"id": "pois", "fields": {"name": "String", "class": "String"}}],
        }, sort_keys=True).encode("utf-8"))

        header_len = 127
        root_off = header_len
        meta_off = root_off + len(root)
        leaf_off = meta_off + len(meta)
        data_off = leaf_off + len(leaves)
        e7 = 10_000_000
        b = self.bounds

        header = bytearray()
        header += b"PMTiles\x03"
        header += struct.pack("<QQ", root_off, len(root))
        header += struct.pack("<QQ", meta_off, len(meta))
        header += struct.pack("<QQ", leaf_off, len(leaves))
        header += struct.pack("<QQ", data_off, self._data_len)
        header += struct.pack("<QQQ", self._addressed, len(self._tids), self._contents)
        # clustered=1, internal_compression=2 (gzip dirs/meta),
        # tile_compression=1 (none: MVT payloads stored raw), tile_type=1 (MVT)
        header += bytes([1, 2, 1, 1])
        header += bytes([self.min_zoom, self.max_zoom])
        header += struct.pack("<iiii", int(b[0] * e7), int(b[1] * e7), int(b[2] * e7), int(b[3] * e7))
        header += bytes([self.min_zoom]) + struct.pack(
            "<ii", int((b[0] + b[2]) / 2 * e7), int((b[1] + b[3]) / 2 * e7))
        assert len(header) == header_len, len(header)

        with open(self.path, "wb") as out:
            out.write(bytes(header))
            out.write(root)
            out.write(meta)
            out.write(leaves)
            with open(self._tmp, "rb") as data:  # chunked copy, never in memory
                while chunk := data.read(1 << 20):
                    out.write(chunk)
        os.unlink(self._tmp)
        return {
            "tiles": self._addressed,
            "entries": len(self._tids),
            "unique_payloads": self._contents,
            "data_bytes": self._data_len,
            "root_dir_bytes": len(root),
            "leaf_dir_bytes": len(leaves),
            "n_leaves": n_leaves,
        }


def write_pmtiles(
    rows,
    path: str,
    min_zoom: int,
    max_zoom: int,
    bounds: tuple[float, float, float, float] = (-180.0, -85.05112878, 180.0, 85.05112878),
    metadata: dict | None = None,
) -> dict:
    """Write (z, x, y, mvt_bytes) rows to a PMTiles v3 archive.

    ``rows``: iterable of (z, x, y, bytes), any order — payloads are
    buffered for the in-driver Hilbert sort, so this convenience form is
    for bounded inputs (tests, low-zoom archives). For large archives
    use ``write_pmtiles_streamed`` (Spark sorts, payloads stream).
    Identical tile payloads are stored once and coalesced into runs.
    Returns summary stats."""
    w = PMTilesWriter(path, min_zoom, max_zoom, bounds, metadata)
    for tid, blob in sorted((hilbert_tile_id(int(z), int(x), int(y)), bytes(b)) for z, x, y, b in rows):
        w.add(tid, blob)
    return w.finalize()


def write_pmtiles_streamed(
    tiles: DataFrame,
    path: str,
    min_zoom: int,
    max_zoom: int,
    bounds: tuple[float, float, float, float] = (-180.0, -85.05112878, 180.0, 85.05112878),
    metadata: dict | None = None,
) -> dict:
    """Archive a (z, x, y, mvt) DataFrame at scale: Spark computes the
    Hilbert tile id and does the global sort (a distributed range sort,
    not a driver sort); the driver consumes the sorted stream with
    ``toLocalIterator`` — one partition in flight — and feeds the
    incremental writer. Driver memory is O(directory entries), disk I/O
    is one pass; matches the tippecanoe-stage shape of the reference at
    planet scale."""

    @F.pandas_udf(T.LongType())
    def _tid(z: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series([hilbert_tile_id(int(zz), int(xx), int(yy))
                          for zz, xx, yy in zip(z, x, y)], dtype="int64")

    ordered = (
        tiles.select(_tid(F.col("z"), F.col("x"), F.col("y")).alias("tid"), "mvt")
        .orderBy("tid")
    )
    w = PMTilesWriter(path, min_zoom, max_zoom, bounds, metadata)
    for row in ordered.toLocalIterator(prefetchPartitions=True):
        w.add(row["tid"], bytes(row["mvt"]))
    return w.finalize()
