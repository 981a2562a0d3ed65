"""Web-Mercator tile math — the exact-match-critical kernel.

Reproduces, bit-for-bit in IEEE-754 float64 with the same operation
order, the reference's tile assignment and inverse:

* ``lon_lat_to_tile``  — reference ``stack/sharding/src/main.rs:311-331``
  (lat clamped to ±85.05112878, ``x/y`` floored then clamped to ``n-1``)
* ``tile_bbox``        — reference ``stack/sharding/src/main.rs:333-343``
  and the duplicated Python variant ``stack/batch/common.py:82-97``
* ``tile_ring``        — reference ``stack/sharding/src/main.rs:345-354``

Three synchronized forms are provided so the engine, the tests, and the
DuckDB oracle all evaluate the *same* formula:

1. numpy vectorized kernels (used by tests and by pandas-UDF paths),
2. Spark ``Column`` builders (pure ``pyspark.sql.functions`` — stays in
   whole-stage codegen, no Python in the hot path),
3. SQL text fragments valid in BOTH Spark SQL and DuckDB (used to keep
   ``queries()`` and ``oracle_sql()`` in lockstep).
"""

from __future__ import annotations

import math

import numpy as np

try:  # allow pure-numpy use without a Spark runtime (unit tests, planners)
    from pyspark.sql import Column
    from pyspark.sql import functions as F
except ImportError:  # pragma: no cover
    Column = None  # type: ignore[assignment]
    F = None  # type: ignore[assignment]

MERCATOR_LAT_LIMIT = 85.05112878


# ---------------------------------------------------------------------------
# numpy kernels
# ---------------------------------------------------------------------------

def lon_lat_to_tile(lon, lat, zoom: int):
    """Vectorized (lon, lat) -> (x, y) Web-Mercator tile at ``zoom``.

    Mirrors ``main.rs:311-331`` exactly: clamp lat to ±85.05112878,
    ``x = floor((lon+180)/360*n)``,
    ``y = floor((1 - ln(tan(φ) + 1/cos(φ))/π)/2 * n)``,
    both clamped to ``[0, n-1]``. Non-finite inputs yield -1 (the Rust
    code returns ``None``; callers filter those rows).
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = float(1 << zoom)
    finite = np.isfinite(lon) & np.isfinite(lat)
    lon_s = np.where(finite, lon, 0.0)
    lat_c = np.clip(np.where(finite, lat, 0.0), -MERCATOR_LAT_LIMIT, MERCATOR_LAT_LIMIT)

    x = np.floor((lon_s + 180.0) / 360.0 * n)
    lat_rad = np.radians(lat_c)
    y = np.floor((1.0 - np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / np.pi) / 2.0 * n)

    x = np.clip(x, 0.0, n - 1.0).astype(np.int64)
    y = np.clip(y, 0.0, n - 1.0).astype(np.int64)
    x = np.where(finite, x, -1)
    y = np.where(finite, y, -1)
    return x, y


def tile_bbox(zoom, x, y):
    """Vectorized (z, x, y) -> (west, south, east, north) degrees.

    Mirrors ``main.rs:333-343`` / ``common.py:82-97``:
    ``lat(y) = atan(sinh(π(1 - 2y/n)))``.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = np.asarray(2.0 ** np.asarray(zoom, dtype=np.float64), dtype=np.float64)
    west = (x / n) * 360.0 - 180.0
    east = ((x + 1.0) / n) * 360.0 - 180.0
    # Transcendentals go through libm (math.*) rather than numpy's SIMD
    # kernels, which round differently in the last ulp: tile_bbox is only
    # ever evaluated over small driver-side shard manifests, and bit-exact
    # parity with the reference (common.py:82-97 uses math.*) wins here.
    _lat = np.frompyfunc(
        lambda t: math.degrees(math.atan(math.sinh(math.pi * (1.0 - 2.0 * t)))), 1, 1
    )
    north = np.asarray(_lat(y / n), dtype=np.float64)
    south = np.asarray(_lat((y + 1.0) / n), dtype=np.float64)
    return west, south, east, north


def tile_ring(zoom: int, x: int, y: int) -> list[list[float]]:
    """Closed 5-point CCW-from-SW ring for a tile (``main.rs:345-354``)."""
    west, south, east, north = (float(v) for v in tile_bbox(zoom, x, y))
    return [[west, south], [east, south], [east, north], [west, north], [west, south]]


def parent_tile(x, y, from_zoom: int, to_zoom: int):
    """Bubble a tile key up the pyramid by right-shifting (``main.rs:143-147``)."""
    if to_zoom > from_zoom:
        raise ValueError("to_zoom must be <= from_zoom")
    shift = from_zoom - to_zoom
    return np.asarray(x) >> shift, np.asarray(y) >> shift


# ---------------------------------------------------------------------------
# Shared SQL fragments (valid in Spark SQL AND DuckDB)
# ---------------------------------------------------------------------------

def sql_tile_x(lon_expr: str, zoom: int) -> str:
    n = 1 << zoom
    return (
        f"CAST(LEAST(GREATEST(FLOOR(({lon_expr} + 180.0) / 360.0 * {n}.0), 0.0), "
        f"{n - 1}.0) AS BIGINT)"
    )


def sql_tile_y(lat_expr: str, zoom: int) -> str:
    n = 1 << zoom
    clamped = f"LEAST(GREATEST({lat_expr}, -85.05112878), 85.05112878)"
    return (
        f"CAST(LEAST(GREATEST(FLOOR((1.0 - LN(TAN(RADIANS({clamped})) "
        f"+ 1.0 / COS(RADIANS({clamped}))) / PI()) / 2.0 * {n}.0), 0.0), "
        f"{n - 1}.0) AS BIGINT)"
    )


def sql_lon_bucket(lon_expr: str) -> str:
    """``FLOOR(lon)::INT`` pruning key (reference ``process_region.py:265``)."""
    return f"CAST(FLOOR({lon_expr}) AS INT)"


# ---------------------------------------------------------------------------
# Spark Column builders (native expressions -> whole-stage codegen)
# ---------------------------------------------------------------------------

def tile_cols(lon_name: str, lat_name: str, zoom: int) -> tuple["Column", "Column"]:
    """(x, y) tile columns at ``zoom`` from lon/lat column *names*.

    Built via ``F.expr`` on the shared SQL fragment so the engine and the
    DuckDB oracle execute character-identical formulas.
    """
    return (
        F.expr(sql_tile_x(lon_name, zoom)),
        F.expr(sql_tile_y(lat_name, zoom)),
    )


def tile_key_col(lon_name: str, lat_name: str, zoom: int) -> "Column":
    """Single BIGINT key ``(x << zoom+1) | y`` — join/partition key.

    A packed long beats the reference's ``"z-x-y"`` string id for shuffle
    width and parquet encoding; ``shard_id_col`` provides the string form
    for parity with the reference schema.
    """
    x, y = tile_cols(lon_name, lat_name, zoom)
    return F.shiftleft(x, zoom + 1) + y


def shard_id_col(zoom_col: "Column", x_col: "Column", y_col: "Column") -> "Column":
    """Reference-format shard id ``"z-x-y"`` (``main.rs:285``)."""
    return F.concat_ws("-", zoom_col.cast("string"), x_col.cast("string"), y_col.cast("string"))


# ---------------------------------------------------------------------------
# Bing/Azure quadkeys (interop encoding over the same XYZ tile grid)
# ---------------------------------------------------------------------------

def sql_quadkey(x_expr: str, y_expr: str, zoom: int, div: str = "DIV") -> str:
    """Quadkey string from (x, y) tile coordinates at ``zoom`` — the
    Bing Maps tile id (one base-4 digit per level, MSB first:
    ``digit = x_bit + 2 * y_bit``). Generated as a z-term CONCAT so
    the one formula runs in BOTH engines; the only dialect token is
    integer division (Spark ``DIV`` / DuckDB ``//``), wired through
    ``div`` — the established identical-IEEE dialect-split pattern
    (here it's exact ints throughout). Published anchor: tile (3, 5)
    at level 3 is quadkey ``"213"`` (pinned in tests)."""
    if zoom < 1:
        raise ValueError(f"zoom must be >= 1, got {zoom}")
    parts = []
    for i in range(zoom):
        k = 1 << (zoom - 1 - i)
        d = (f"((({x_expr}) {div} {k}) % 2 + 2 * ((({y_expr}) {div} {k}) % 2))")
        parts.append(f"CAST({d} AS STRING)")
    return "CONCAT(" + ", ".join(parts) + ")"


def quadkey_col(x_name: str, y_name: str, zoom: int) -> "Column":
    """Native quadkey Column from tile x/y column *names* (codegen'd —
    the CONCAT of 2*zoom exact integer ops, no UDF)."""
    return F.expr(sql_quadkey(x_name, y_name, zoom))


def quadkey_to_tile_cols(qk_name: str) -> tuple["Column", "Column", "Column"]:
    """(x, y, zoom) decoded from a quadkey column name — MSB-first
    fold (``acc * 2 + bit``) over the digit characters via native
    ``aggregate`` HOFs; zoom is just the string length. Exact inverse
    of ``quadkey_col`` for any zoom (round-trip property-tested)."""
    x = F.expr(
        f"aggregate(sequence(1, length({qk_name})), 0L, "
        f"(acc, i) -> acc * 2L + CAST(substring({qk_name}, i, 1) AS BIGINT) % 2)")
    y = F.expr(
        f"aggregate(sequence(1, length({qk_name})), 0L, "
        f"(acc, i) -> acc * 2L + CAST(substring({qk_name}, i, 1) AS BIGINT) DIV 2)")
    return x, y, F.length(F.expr(qk_name)).cast("int")


# ---------------------------------------------------------------------------
# Geohash (base-32 interleaved lat/lon — the third interop cell encoding,
# alongside quadkeys and S2 tokens; Niemeyer 2008 / geohash.org convention)
# ---------------------------------------------------------------------------

_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_grid_bits(precision: int) -> tuple[int, int]:
    """(n_lon_bits, n_lat_bits) for ``precision`` base-32 chars: 5 bits
    per char, alternating lon-first, so lon gets the extra bit when
    5 * precision is odd."""
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be in [1, 12], got {precision}")
    nbits = 5 * precision
    return (nbits + 1) // 2, nbits // 2


def sql_geohash_cells(lon_expr: str, lat_expr: str,
                      precision: int) -> tuple[str, str]:
    """(xi_expr, yi_expr) — integer lon/lat cell indexes at the geohash
    grid resolution for ``precision``. Exactly the quadkey/tile float
    discipline: one multiply + one divide in fixed textual order, then
    ``FLOOR``-then-cast (DuckDB's bare CAST double->BIGINT ROUNDS),
    clamped so the +180/+90 edges stay in range. The text is the
    shared Spark/DuckDB dialect subset."""
    nlon, nlat = geohash_grid_bits(precision)
    xi = (f"LEAST(CAST(FLOOR((({lon_expr}) + 180.0) * {1 << nlon} / 360.0) "
          f"AS BIGINT), {(1 << nlon) - 1})")
    yi = (f"LEAST(CAST(FLOOR((({lat_expr}) + 90.0) * {1 << nlat} / 180.0) "
          f"AS BIGINT), {(1 << nlat) - 1})")
    return xi, yi


def sql_geohash(xi_expr: str, yi_expr: str, precision: int,
                div: str = "DIV") -> str:
    """Geohash string from the INTEGER cell indexes of
    ``sql_geohash_cells`` — one CONCAT of ``precision`` base-32 digit
    expressions, each summing its 5 interleaved bits (lon on even
    global bit positions, MSB first) with exact integer ops only. Same
    two-dialect template contract as ``sql_quadkey`` (``div`` is the
    only dialect token); pass the xi/yi through a CTE / withColumn so
    the float cell math is evaluated once, not per bit."""
    nlon, nlat = geohash_grid_bits(precision)
    chars = []
    for i in range(precision):
        terms = []
        for j in range(5):
            b = 5 * i + j
            if b % 2 == 0:
                src, shift = xi_expr, nlon - 1 - b // 2
            else:
                src, shift = yi_expr, nlat - 1 - (b - 1) // 2
            terms.append(f"((({src}) {div} {1 << shift}) % 2) * {1 << (4 - j)}")
        v = " + ".join(terms)
        chars.append(f"SUBSTRING('{_GEOHASH32}', CAST(({v}) AS INT) + 1, 1)")
    return "CONCAT(" + ", ".join(chars) + ")"


def geohash_col(lon_name: str, lat_name: str, precision: int) -> "Column":
    """Native geohash Column from lon/lat column names (codegen'd; the
    cell indexes are inlined — fine for Column use, Catalyst CSEs the
    repeated subexpression; use sql_geohash_cells + withColumn when
    generating shared SQL text)."""
    xi, yi = sql_geohash_cells(lon_name, lat_name, precision)
    return F.expr(sql_geohash(f"({xi})", f"({yi})", precision))


def geohash_to_cell_cols(gh_name: str) -> tuple["Column", "Column", "Column"]:
    """(xi, yi, precision) decoded from a geohash column — exact
    inverse of ``geohash_col`` for any precision. One ``aggregate``
    HOF: each char contributes 3 bits to one axis and 2 to the other,
    ALTERNATING per char (5 is odd, so the interleave parity flips
    every char: even chars are lon-major). The fold carries a
    (x, y, i) struct; digit value via ``instr`` on the base-32
    alphabet (1-based, so the -1 recovers 0..31)."""
    v = f"CAST(instr('{_GEOHASH32}', substring({gh_name}, i, 1)) AS BIGINT) - 1"
    hi3 = f"(({v}) DIV 16) % 2 * 4 + (({v}) DIV 4) % 2 * 2 + ({v}) % 2"
    lo2 = f"(({v}) DIV 8) % 2 * 2 + (({v}) DIV 2) % 2"
    fold = F.expr(
        f"aggregate(sequence(1, length({gh_name})), "
        f"named_struct('x', 0L, 'y', 0L, 'i', 0), "
        f"(acc, i) -> IF(acc.i % 2 = 0, "
        f"named_struct('x', acc.x * 8 + ({hi3}), "
        f"'y', acc.y * 4 + ({lo2}), 'i', acc.i + 1), "
        f"named_struct('x', acc.x * 4 + ({lo2}), "
        f"'y', acc.y * 8 + ({hi3}), 'i', acc.i + 1)))")
    return fold["x"], fold["y"], F.length(F.expr(gh_name)).cast("int")


def geohash_cell_bounds(xi: "Column", yi: "Column",
                        precision: int) -> tuple["Column", "Column", "Column", "Column"]:
    """(lon_lo, lat_lo, lon_hi, lat_hi) of a geohash cell from its
    integer indexes — exact inverse of the cell quantization (the
    tile_bbox analog)."""
    nlon, nlat = geohash_grid_bits(precision)
    lon_w, lat_w = 360.0 / (1 << nlon), 180.0 / (1 << nlat)
    return (xi.cast("double") * lon_w - 180.0,
            yi.cast("double") * lat_w - 90.0,
            (xi.cast("double") + 1.0) * lon_w - 180.0,
            (yi.cast("double") + 1.0) * lat_w - 90.0)
