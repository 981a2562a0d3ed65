"""Tile math parity with the reference (stack/sharding/src/main.rs:311-354,
stack/batch/common.py:82-97)."""

import math

import numpy as np
from pyspark.sql import functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from osm_poi_cloud_spark.functions import tile_math as tm


def ref_lon_lat_to_tile(lon: float, lat: float, zoom: int):
    """Literal scalar transcription of the reference math (main.rs:311-331)
    used as the oracle for the vectorized kernel."""
    if not (math.isfinite(lon) and math.isfinite(lat)):
        return None
    lat = min(max(lat, -85.05112878), 85.05112878)
    n = 2**zoom
    x = math.floor((lon + 180.0) / 360.0 * float(n))
    lat_rad = math.radians(lat)
    y = math.floor((1.0 - math.log(math.tan(lat_rad) + 1.0 / math.cos(lat_rad)) / math.pi) / 2.0 * float(n))
    x = int(min(max(x, 0.0), float(n - 1)))
    y = int(min(max(y, 0.0), float(n - 1)))
    return x, y


def ref_tile_bbox(zoom: int, x: int, y: int):
    n = float(2**zoom)
    west = (x / n) * 360.0 - 180.0
    east = ((x + 1) / n) * 360.0 - 180.0
    north = math.degrees(math.atan(math.sinh(math.pi * (1.0 - 2.0 * (y / n)))))
    south = math.degrees(math.atan(math.sinh(math.pi * (1.0 - 2.0 * ((y + 1) / n)))))
    return west, south, east, north


KNOWN = [
    # (lon, lat, zoom, x, y) — hand-checked anchors
    (0.0, 0.0, 0, 0, 0),
    (0.0, 0.0, 1, 1, 1),
    (-180.0, 85.05112878, 4, 0, 0),
    (179.9999, -85.05112878, 4, 15, 15),
    (180.0, 0.0, 4, 15, 8),        # x clamp at east edge
    (-122.4183, 37.7753, 12, 655, 1583),  # San Francisco z12
    (0.0, 90.0, 8, 128, 0),        # lat beyond mercator limit clamps to top row
    (0.0, -90.0, 8, 128, 255),
]


def test_known_tiles():
    for lon, lat, z, ex, ey in KNOWN:
        x, y = tm.lon_lat_to_tile(lon, lat, z)
        assert (int(x), int(y)) == (ex, ey), (lon, lat, z, int(x), int(y))


@settings(max_examples=500, deadline=None)
@given(
    lon=st.floats(min_value=-180.0, max_value=180.0, allow_nan=False),
    lat=st.floats(min_value=-90.0, max_value=90.0, allow_nan=False),
    zoom=st.integers(min_value=0, max_value=20),
)
def test_matches_reference_scalar(lon, lat, zoom):
    x, y = tm.lon_lat_to_tile(lon, lat, zoom)
    rx, ry = ref_lon_lat_to_tile(lon, lat, zoom)
    assert (int(x), int(y)) == (rx, ry)


def test_nonfinite_rejected():
    x, y = tm.lon_lat_to_tile([float("nan"), 1.0], [0.0, float("inf")], 5)
    assert list(x) == [-1, -1] and list(y) == [-1, -1]


@settings(max_examples=200, deadline=None)
@given(
    zoom=st.integers(min_value=0, max_value=16),
    data=st.data(),
)
def test_bbox_matches_reference_and_roundtrips(zoom, data):
    n = 2**zoom
    x = data.draw(st.integers(min_value=0, max_value=n - 1))
    y = data.draw(st.integers(min_value=0, max_value=n - 1))
    w, s, e, nn = (float(v) for v in tm.tile_bbox(zoom, x, y))
    rw, rs, re, rn = ref_tile_bbox(zoom, x, y)
    assert (w, s, e, nn) == (rw, rs, re, rn)  # bit-exact
    # center of bbox maps back to the same tile
    cx, cy = tm.lon_lat_to_tile((w + e) / 2, (s + nn) / 2, zoom)
    assert (int(cx), int(cy)) == (x, y)


def test_ring_shape():
    ring = tm.tile_ring(3, 2, 5)
    assert len(ring) == 5 and ring[0] == ring[-1]
    w, s, e, n = (float(v) for v in tm.tile_bbox(3, 2, 5))
    assert ring == [[w, s], [e, s], [e, n], [w, n], [w, s]]


def test_parent_tile_shift():
    x, y = tm.parent_tile(655, 1583, 12, 10)
    assert (int(x), int(y)) == (655 >> 2, 1583 >> 2)


def test_sql_fragments_match_numpy(spark):
    """The shared SQL fragments (used by both the Spark queries and the
    DuckDB oracle) must agree with the numpy kernel."""
    import duckdb
    import pandas as pd

    rng = np.random.RandomState(42)
    lon = rng.uniform(-180, 180, 300)
    lat = rng.uniform(-90, 90, 300)
    # include clamp-path lats
    lat[:10] = np.linspace(85.1, 90, 10)
    lat[10:20] = np.linspace(-90, -85.1, 10)
    pdf = pd.DataFrame({"lon": lon, "lat": lat})
    zoom = 12
    nx, ny = tm.lon_lat_to_tile(lon, lat, zoom)

    sdf = spark.createDataFrame(pdf)
    got = (
        sdf.selectExpr(f"{tm.sql_tile_x('lon', zoom)} AS x", f"{tm.sql_tile_y('lat', zoom)} AS y")
        .toPandas()
    )
    assert (got["x"].to_numpy() == nx).all()
    assert (got["y"].to_numpy() == ny).all()

    ddf = duckdb.connect().execute(
        f"SELECT {tm.sql_tile_x('lon', zoom)} AS x, {tm.sql_tile_y('lat', zoom)} AS y FROM pdf"
    ).df()
    assert (ddf["x"].to_numpy() == nx).all()
    assert (ddf["y"].to_numpy() == ny).all()


def _py_quadkey(x: int, y: int, z: int) -> str:
    """Independent from-spec recompute (Bing tile-system doc)."""
    out = []
    for i in range(z, 0, -1):
        mask = 1 << (i - 1)
        d = (1 if x & mask else 0) + (2 if y & mask else 0)
        out.append(str(d))
    return "".join(out)


def test_quadkey_bing_anchor_and_roundtrip(spark):
    import pandas as pd

    from pyspark.sql import functions as F

    # published Bing example: tile (3, 5) at level 3 -> "213"
    assert _py_quadkey(3, 5, 3) == "213"
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["x", "y"]))
    enc = df.withColumn("qk", tm.quadkey_col("x", "y", 3))
    got = enc.toPandas()
    for r in got.itertuples():
        assert r.qk == _py_quadkey(r.x, r.y, 3), (r.x, r.y)
    assert got.set_index(["x", "y"]).loc[(3, 5), "qk"] == "213"
    # decode is the exact inverse (and zoom = length)
    xb, yb, zb = tm.quadkey_to_tile_cols("qk")
    back = enc.select("x", "y", xb.alias("xb"), yb.alias("yb"),
                      zb.alias("zb")).toPandas()
    assert (back["x"] == back["xb"]).all()
    assert (back["y"] == back["yb"]).all()
    assert (back["zb"] == 3).all()


def test_quadkey_sql_matches_duckdb(spark):
    import duckdb
    import pandas as pd

    rng = np.random.RandomState(11)
    z = 9
    pdf = pd.DataFrame({"x": rng.randint(0, 1 << z, 300),
                        "y": rng.randint(0, 1 << z, 300)})
    sdf = spark.createDataFrame(pdf)
    got = sdf.selectExpr(f"{tm.sql_quadkey('x', 'y', z)} AS qk") \
        .toPandas()["qk"].tolist()
    exp = duckdb.connect().execute(
        f"SELECT {tm.sql_quadkey('x', 'y', z, div='//')} AS qk FROM pdf"
    ).df()["qk"].tolist()
    assert got == exp
    assert got[0] == _py_quadkey(int(pdf.x[0]), int(pdf.y[0]), z)
    import pytest

    with pytest.raises(ValueError):
        tm.sql_quadkey("x", "y", 0)


# ----------------------------------------------------------------- geohash


def _py_geohash(lon, lat, p):
    """From-spec recompute (Niemeyer convention): bisection == integer
    cell index bits, lon first, 5 bits per base-32 char."""
    a = "0123456789bcdefghjkmnpqrstuvwxyz"
    nbits = 5 * p
    nlon, nlat = (nbits + 1) // 2, nbits // 2
    xi = min(int(math.floor((lon + 180.0) * (1 << nlon) / 360.0)), (1 << nlon) - 1)
    yi = min(int(math.floor((lat + 90.0) * (1 << nlat) / 180.0)), (1 << nlat) - 1)
    out = []
    for i in range(p):
        v = 0
        for j in range(5):
            b = 5 * i + j
            bit = ((xi >> (nlon - 1 - b // 2)) if b % 2 == 0
                   else (yi >> (nlat - 1 - (b - 1) // 2))) & 1
            v = v * 2 + bit
        out.append(a[v])
    return "".join(out), xi, yi


def test_geohash_published_anchors(spark):
    # geohash.org canonical examples: these strings are published
    # anchors, not round-trip artifacts
    df = spark.createDataFrame(
        [(-5.6, 42.6), (10.40744, 57.64911)], "lon double, lat double")
    got5 = [r[0] for r in df.select(tm.geohash_col("lon", "lat", 5)).collect()]
    assert got5[0] == "ezs42"
    got11 = [r[0] for r in df.select(tm.geohash_col("lon", "lat", 11)).collect()]
    assert got11[1] == "u4pruydqqvj"
    # edge clamps
    edge = spark.createDataFrame([(180.0, 90.0), (-180.0, -90.0)],
                                 "lon double, lat double")
    assert [r[0] for r in edge.select(tm.geohash_col("lon", "lat", 6)).collect()] \
        == ["zzzzzz", "000000"]


def test_geohash_roundtrip_and_python_parity(spark):
    rng = np.random.RandomState(3)
    pdf = {
        "lon": rng.uniform(-180, 180, 300),
        "lat": rng.uniform(-90, 90, 300),
    }
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame(pdf))
    for p in (1, 5, 8, 12):
        enc = df.select("lon", "lat", tm.geohash_col("lon", "lat", p).alias("gh"))
        xb, yb, pb = tm.geohash_to_cell_cols("gh")
        rows = enc.select("lon", "lat", "gh", xb.alias("xi"),
                          yb.alias("yi"), pb.alias("p")).collect()
        for r in rows:
            eg, exi, eyi = _py_geohash(r["lon"], r["lat"], p)
            assert r["gh"] == eg
            assert (r["xi"], r["yi"], r["p"]) == (exi, eyi, p)
    # cell bounds contain the point (exact inverse of the quantization)
    enc = df.select("lon", "lat", tm.geohash_col("lon", "lat", 6).alias("gh"))
    xb, yb, _ = tm.geohash_to_cell_cols("gh")
    b = tm.geohash_cell_bounds(xb, yb, 6)
    chk = enc.select((
        (b[0] <= F.col("lon")) & (F.col("lon") < b[2])
        & (b[1] <= F.col("lat")) & (F.col("lat") < b[3])).alias("inside"))
    assert all(r["inside"] for r in chk.collect())


def test_geohash_validation():
    import pytest

    with pytest.raises(ValueError):
        tm.geohash_grid_bits(0)
    with pytest.raises(ValueError):
        tm.sql_geohash("x", "y", 13)
