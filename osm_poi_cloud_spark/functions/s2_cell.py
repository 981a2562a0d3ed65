"""S2 cell encoding — pure, vectorized numpy implementation.

The north rule pins the point index to "H3 res-8 / S2 level-12 cells".
This engine uses **S2 level-12** as its canonical cell index (the `h3`
library is not available in this environment, and S2's algorithm is
fully self-contained — no large constant tables to transcribe — so it
can be implemented exactly and verified by an independent slow path;
see tests/test_s2_cell.py).

Implements the public S2 geometry algorithm (s2geometry.io; the C++
reference implementation's ``S2CellId::FromLatLng``):

  lat/lng -> unit xyz -> cube face (argmax |component|) -> (u, v) via
  per-face central projection -> (s, t) via the quadratic projection ->
  (i, j) 30-bit leaf coordinates -> 64-bit cell id by interleaving
  (i, j) along the Hilbert curve with per-quadrant orientation tracking.

Hierarchy is free: the parent of a cell at level L is a prefix
truncation (``(id & -lsb) | lsb``), the analog of the reference's
multi-resolution ``h3_r3..h3_r9`` columns (``stack/batch/process.py:159-165``).

Everything here is array-in/array-out; the Spark surface is a single
Arrow-batched pandas UDF (`osm_poi_cloud_spark.functions.cell_udfs`).
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1  # 61
LOOKUP_BITS = 4
SWAP_MASK = 0x01
INVERT_MASK = 0x02

# Hilbert sub-cell traversal tables (public S2 constants).
POS_TO_ORIENTATION = (SWAP_MASK, 0, 0, INVERT_MASK + SWAP_MASK)
POS_TO_IJ = (
    (0, 1, 3, 2),  # canonical order: (0,0) (0,1) (1,1) (1,0)
    (0, 2, 3, 1),  # axes swapped
    (3, 2, 0, 1),  # bits inverted
    (3, 1, 0, 2),  # swapped & inverted
)


def _build_lookup_tables() -> tuple[np.ndarray, np.ndarray]:
    """Generate the 4-bit Hilbert lookup tables the same way the S2
    reference builds them at init (recursive subdivision), rather than
    transcribing literals."""
    lookup_pos = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)
    lookup_ij = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)

    def init_cell(level: int, i: int, j: int, orig_orientation: int, pos: int, orientation: int) -> None:
        if level == LOOKUP_BITS:
            ij = (i << LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orientation] = (pos << 2) + orientation
            lookup_ij[(pos << 2) + orig_orientation] = (ij << 2) + orientation
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = POS_TO_IJ[orientation]
        for index in range(4):
            init_cell(
                level,
                i + (r[index] >> 1),
                j + (r[index] & 1),
                orig_orientation,
                pos + index,
                orientation ^ POS_TO_ORIENTATION[index],
            )

    init_cell(0, 0, 0, 0, 0, 0)
    init_cell(0, 0, 0, SWAP_MASK, 0, SWAP_MASK)
    init_cell(0, 0, 0, INVERT_MASK, 0, INVERT_MASK)
    init_cell(0, 0, 0, SWAP_MASK | INVERT_MASK, 0, SWAP_MASK | INVERT_MASK)
    return lookup_pos, lookup_ij


LOOKUP_POS, LOOKUP_IJ = _build_lookup_tables()


# ---------------------------------------------------------------------------
# lat/lng -> face (i, j)
# ---------------------------------------------------------------------------

def latlng_to_face_uv(lat_deg, lng_deg):
    """Unit sphere point -> (face, u, v). Vectorized."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lng = np.radians(np.asarray(lng_deg, dtype=np.float64))
    cos_lat = np.cos(lat)
    x = cos_lat * np.cos(lng)
    y = cos_lat * np.sin(lng)
    z = np.sin(lat)

    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # face = axis of largest |component|, + 3 if that component is negative
    axis = np.where(az >= np.maximum(ax, ay), 2, np.where(ay >= ax, 1, 0))
    comp = np.choose(axis, [x, y, z])
    face = np.where(comp >= 0, axis, axis + 3).astype(np.int64)

    # per-face central (gnomonic) projection to (u, v)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve, de) in enumerate(
        [
            (lambda: y / x, lambda: z / x, None),      # face 0 (+x)
            (lambda: -x / y, lambda: z / y, None),     # face 1 (+y)
            (lambda: -x / z, lambda: -y / z, None),    # face 2 (+z)
            (lambda: z / x, lambda: y / x, None),      # face 3 (-x)
            (lambda: z / y, lambda: -x / y, None),     # face 4 (-y)
            (lambda: -y / z, lambda: -x / z, None),    # face 5 (-z)
        ]
    ):
        m = face == f
        if np.any(m):
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face, u, v


def uv_to_st(u):
    """S2's quadratic projection (``S2::UVtoST``), vectorized."""
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):  # np.where evaluates both branches
        return np.where(
            u >= 0.0,
            0.5 * np.sqrt(1.0 + 3.0 * u),
            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u),
        )


def st_to_uv(s):
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def st_to_ij(s):
    ij = np.floor(np.asarray(s, dtype=np.float64) * float(1 << MAX_LEVEL))
    return np.clip(ij, 0, (1 << MAX_LEVEL) - 1).astype(np.int64)


def latlng_to_face_ij(lat_deg, lng_deg):
    face, u, v = latlng_to_face_uv(lat_deg, lng_deg)
    return face, st_to_ij(uv_to_st(u)), st_to_ij(uv_to_st(v))


# ---------------------------------------------------------------------------
# face (i, j) -> cell id (vectorized Hilbert interleave)
# ---------------------------------------------------------------------------

def face_ij_to_cell_id(face, i, j) -> np.ndarray:
    """Leaf (level-30) cell ids. Fixed 8-round table lookup, vectorized."""
    face = np.asarray(face, dtype=np.uint64)
    i = np.asarray(i, dtype=np.uint64)
    j = np.asarray(j, dtype=np.uint64)
    n = face << np.uint64(POS_BITS - 1)
    bits = face & np.uint64(SWAP_MASK)
    mask = np.uint64((1 << LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        ks = np.uint64(k * LOOKUP_BITS)
        bits += ((i >> ks) & mask) << np.uint64(LOOKUP_BITS + 2)
        bits += ((j >> ks) & mask) << np.uint64(2)
        bits = LOOKUP_POS[bits.astype(np.int64)]
        n |= (bits >> np.uint64(2)) << np.uint64(k * 2 * LOOKUP_BITS)
        bits &= np.uint64(SWAP_MASK | INVERT_MASK)
    return n * np.uint64(2) + np.uint64(1)


def latlng_to_cell_id(lat_deg, lng_deg, level: int = MAX_LEVEL) -> np.ndarray:
    """(lat, lng) degrees -> uint64 S2 cell id at ``level``. Vectorized."""
    face, i, j = latlng_to_face_ij(lat_deg, lng_deg)
    leaf = face_ij_to_cell_id(face, i, j)
    return cell_parent(leaf, level)


def lsb_for_level(level: int) -> np.uint64:
    return np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))


def cell_parent(cell_id, level: int) -> np.ndarray:
    """Truncate a cell id to ``level`` (must be <= the id's level)."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    lsb = lsb_for_level(level)
    # (id & -lsb) | lsb  in two's-complement uint64 arithmetic
    neg_lsb = (~lsb + np.uint64(1)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return (cell_id & neg_lsb) | lsb


def cell_level(cell_id) -> np.ndarray:
    """Level of a cell id = 30 - (trailing_zero_count >> 1)."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    tz = np.zeros(cell_id.shape, dtype=np.int64)
    c = cell_id.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = (c & ((np.uint64(1) << np.uint64(shift)) - np.uint64(1))) == 0
        tz = np.where(m & (c != 0), tz + shift, tz)
        c = np.where(m, c >> np.uint64(shift), c)
    return MAX_LEVEL - (tz >> 1)


def cell_id_to_token(cell_id) -> np.ndarray:
    """Canonical S2 token: 16-hex-digit id with trailing zeros stripped."""
    ids = np.atleast_1d(np.asarray(cell_id, dtype=np.uint64))
    out = np.empty(ids.shape, dtype=object)
    for idx, v in enumerate(ids):
        h = format(int(v), "016x").rstrip("0")
        out[idx] = h if h else "X"
    return out


# ---------------------------------------------------------------------------
# cell id -> face (i, j) -> lat/lng (for centers / round-trip tests / kNN)
# ---------------------------------------------------------------------------

def cell_id_to_face_ij(cell_id):
    """Invert the Hilbert interleave. Returns (face, i, j, orientation)."""
    cell_id = np.asarray(cell_id, dtype=np.uint64)
    face = (cell_id >> np.uint64(POS_BITS)).astype(np.int64)
    bits = (face.astype(np.uint64)) & np.uint64(SWAP_MASK)
    i = np.zeros(cell_id.shape, dtype=np.uint64)
    j = np.zeros(cell_id.shape, dtype=np.uint64)
    for k in range(7, -1, -1):
        nbits = MAX_LEVEL - 7 * LOOKUP_BITS if k == 7 else LOOKUP_BITS
        bits += ((cell_id >> np.uint64(k * 2 * LOOKUP_BITS + 1)) & np.uint64((1 << (2 * nbits)) - 1)) << np.uint64(2)
        bits = LOOKUP_IJ[bits.astype(np.int64)]
        ks = np.uint64(k * LOOKUP_BITS)
        i += (bits >> np.uint64(LOOKUP_BITS + 2)) << ks
        j += ((bits >> np.uint64(2)) & np.uint64((1 << LOOKUP_BITS) - 1)) << ks
        bits &= np.uint64(SWAP_MASK | INVERT_MASK)
    return face, i.astype(np.int64), j.astype(np.int64), bits.astype(np.int64)


def face_uv_to_xyz(face, u, v):
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.ones_like(u)
    outs = [
        (one, u, v),        # face 0
        (-u, one, v),       # face 1
        (-u, -v, one),      # face 2
        (-one, -v, -u),     # face 3
        (v, -one, -u),      # face 4
        (v, u, -one),       # face 5
    ]
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    face = np.asarray(face)
    for f, (xf, yf, zf) in enumerate(outs):
        m = face == f
        x[m], y[m], z[m] = xf[m], yf[m], zf[m]
    return x, y, z


def cell_id_to_center_latlng(cell_id):
    """Approximate cell center lat/lng in degrees (exact S2 center math
    on the st grid at the cell's level)."""
    cell_id = np.atleast_1d(np.asarray(cell_id, dtype=np.uint64))
    face, i, j, _ = cell_id_to_face_ij(cell_id)
    level = cell_level(cell_id)
    # center of the cell's ij square (size = 2^(30-level) leaf units)
    size = np.left_shift(np.int64(1), (MAX_LEVEL - level).astype(np.int64))
    i_base = i & ~(size - 1)
    j_base = j & ~(size - 1)
    s = (i_base.astype(np.float64) + size.astype(np.float64) * 0.5) / float(1 << MAX_LEVEL)
    t = (j_base.astype(np.float64) + size.astype(np.float64) * 0.5) / float(1 << MAX_LEVEL)
    u = st_to_uv(s)
    v = st_to_uv(t)
    x, y, z = face_uv_to_xyz(face, u, v)
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    lng = np.degrees(np.arctan2(y, x))
    return lat, lng


# ---------------------------------------------------------------------------
# Independent slow-path (bit-by-bit) implementation for cross-validation
# ---------------------------------------------------------------------------

def _slow_face_ij_to_cell_id(face: int, i: int, j: int) -> int:
    """Bit-at-a-time Hilbert walk straight from POS_TO_IJ — shares no code
    with the 4-bit-lookup fast path. Test oracle only."""
    pos = 0
    orientation = face & SWAP_MASK
    for k in range(MAX_LEVEL - 1, -1, -1):
        ij2 = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        index = POS_TO_IJ[orientation].index(ij2)
        pos = (pos << 2) | index
        orientation ^= POS_TO_ORIENTATION[index]
    return (face << POS_BITS) | (pos << 1) | 1
