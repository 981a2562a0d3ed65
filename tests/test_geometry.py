"""Polygon centroid kernels (P4): numpy vs hand-computed values, the
Spark-native higher-order form vs numpy, and the ST_Centroid-style
polygon->point collapse round-trip into tile assignment."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osm_poi_cloud_spark.functions import geometry as g
from osm_poi_cloud_spark.functions import tile_math as tm
from osm_poi_cloud_spark.operators.spatial_join import with_tile_key

SQUARE = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
# L-shape: 2x1 base + 1x2 upright, area 3+... hand-computed below
L_SHAPE = [(0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0), (2.0, 6.0), (0.0, 6.0)]
TRIANGLE = [(0.0, 0.0), (6.0, 0.0), (0.0, 6.0)]


def test_ring_centroid_hand_computed():
    cx, cy, a = g.ring_centroid(SQUARE)
    assert (cx, cy, a) == (5.0, 5.0, 100.0)

    # triangle centroid = vertex mean for triangles
    cx, cy, a = g.ring_centroid(TRIANGLE)
    assert (cx, cy, a) == (2.0, 2.0, 18.0)

    # L-shape = [0,4]x[0,2] (area 8, c=(2,1)) + [0,2]x[2,6] (area 8, c=(1,4))
    cx, cy, a = g.ring_centroid(L_SHAPE)
    assert a == 16.0
    assert (cx, cy) == ((2 * 8 + 1 * 8) / 16, (1 * 8 + 4 * 8) / 16)

    # winding order flips the signed area but not the centroid
    cx2, cy2, a2 = g.ring_centroid(L_SHAPE[::-1])
    assert (cx2, cy2, a2) == (cx, cy, -16.0)

    # closed input == open input
    assert g.ring_centroid(SQUARE + SQUARE[:1]) == (5.0, 5.0, 100.0)

    # degenerate ring falls back to vertex mean
    cx, cy, a = g.ring_centroid([(1.0, 2.0), (3.0, 2.0), (1.0, 2.0)])
    assert a == 0.0 and cy == 2.0


def test_polygon_centroid_holes_and_shells():
    # square with off-center hole [6,8]x[6,8]: w = 100 - 4 = 96
    cx, cy, w = g.polygon_centroid([SQUARE], holes=[[(6, 6), (8, 6), (8, 8), (6, 8)]])
    assert w == 96.0
    assert cx == pytest.approx((5 * 100 - 7 * 4) / 96)
    assert cy == pytest.approx((5 * 100 - 7 * 4) / 96)
    # hole winding must not matter
    assert g.polygon_centroid([SQUARE], holes=[[(6, 6), (6, 8), (8, 8), (8, 6)]]) == (cx, cy, w)

    # two disjoint shells: area-weighted mean of the two centroids
    far = [(100.0, 0.0), (110.0, 0.0), (110.0, 10.0), (100.0, 10.0)]
    cx, cy, w = g.polygon_centroid([SQUARE, far])
    assert w == 200.0 and cx == (5 + 105) / 2 and cy == 5.0

    with pytest.raises(ValueError):
        g.polygon_centroid([[(0, 0), (1, 1), (2, 2)]])  # zero area


def test_spark_centroid_matches_numpy(spark):
    """Native zip_with/aggregate centroid == numpy kernel on random
    simple polygons (star-convex rings around random centers)."""
    rng = np.random.RandomState(23)
    rows = []
    for pid in range(40):
        n = rng.randint(3, 9)
        cx, cy = rng.uniform(-100, 100, 2)
        angles = np.sort(rng.uniform(0, 2 * np.pi, n))
        radii = rng.uniform(0.5, 5.0, n)
        ring = [[float(cx + r * np.cos(t)), float(cy + r * np.sin(t))] for t, r in zip(angles, radii)]
        rows.append((pid, ring))
    schema = T.StructType([
        T.StructField("pid", T.LongType()),
        T.StructField("ring", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ])
    df = g.with_ring_centroid(spark.createDataFrame(rows, schema))
    got = df.select("pid", "centroid_lon", "centroid_lat", "ring_area").toPandas().set_index("pid")
    for pid, ring in rows:
        ecx, ecy, ea = g.ring_centroid(np.array(ring))
        assert got.loc[pid, "centroid_lon"] == pytest.approx(ecx, rel=1e-12)
        assert got.loc[pid, "centroid_lat"] == pytest.approx(ecy, rel=1e-12)
        assert got.loc[pid, "ring_area"] == pytest.approx(abs(ea), rel=1e-12)


def test_spark_centroid_degenerate_ring_no_ansi_crash(spark):
    """ANSI mode is on: a zero-area ring must fall back to the vertex
    mean (matching ring_centroid), not DIVIDE_BY_ZERO the whole job."""
    schema = T.StructType([
        T.StructField("pid", T.LongType()),
        T.StructField("ring", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ])
    rows = [
        (0, [[1.0, 2.0], [3.0, 2.0], [1.0, 2.0]]),            # collinear, closed
        (1, [[1.0, 2.0], [3.0, 2.0], [5.0, 2.0]]),            # collinear, open
        (2, [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]]),  # normal
    ]
    got = g.with_ring_centroid(spark.createDataFrame(rows, schema)).toPandas().set_index("pid")
    for pid, ring in rows:
        ecx, ecy, ea = g.ring_centroid(np.array(ring))
        assert got.loc[pid, "centroid_lon"] == pytest.approx(ecx)
        assert got.loc[pid, "centroid_lat"] == pytest.approx(ecy)
        assert got.loc[pid, "ring_area"] == abs(ea)


def test_collapse_polygons_round_trip(spark):
    """Polygon entities -> centroid points -> tile assignment lands each
    polygon in the tile of its hand-computed centroid (the ST_Centroid
    -> index round trip, process.py:209)."""
    polys = [
        ("sq", [[-122.5, 37.5], [-122.0, 37.5], [-122.0, 38.0], [-122.5, 38.0]]),
        ("l", [[float(x), float(y)] for x, y in L_SHAPE]),
        ("tri", [[10.0, -45.0], [11.0, -45.0], [10.0, -44.0]]),
    ]
    schema = T.StructType([
        T.StructField("polygon_id", T.StringType()),
        T.StructField("ring", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ])
    pts = g.collapse_polygons_to_points(spark.createDataFrame(polys, schema))
    assert "ring" not in pts.columns
    out = with_tile_key(pts, zoom=12).toPandas().set_index("polygon_id")
    for pid, ring in polys:
        ecx, ecy, _ = g.ring_centroid(np.array(ring))
        ex, ey = tm.lon_lat_to_tile(np.float64(ecx), np.float64(ecy), 12)
        assert out.loc[pid, "lon"] == pytest.approx(ecx, rel=1e-12)
        assert (out.loc[pid, "tile_x"], out.loc[pid, "tile_y"]) == (ex, ey)


# ---------------------------------------------------------------------------
# Douglas-Peucker simplification
# ---------------------------------------------------------------------------

def _dp_recursive(pts, tol):
    """Textbook recursive DP reference (different shape from the
    engine's iterative stack + argmax kernel): scalar max scan,
    first-max tie rule, cross^2 > tol^2 * |chord|^2 comparison."""
    n = len(pts)
    keep = {0, n - 1}
    t2 = tol * tol

    def rec(i, j):
        if j <= i + 1:
            return
        ax, ay = pts[i]
        bx, by = pts[j]
        dx, dy = bx - ax, by - ay
        l2 = dx * dx + dy * dy
        best, bestv = -1, -1.0
        for m in range(i + 1, j):
            px, py = pts[m]
            if l2 == 0.0:
                v = (px - ax) ** 2 + (py - ay) ** 2
            else:
                c = dx * (py - ay) - dy * (px - ax)
                v = c * c
            if v > bestv:
                best, bestv = m, v
        if bestv > (t2 if l2 == 0.0 else t2 * l2):
            keep.add(best)
            rec(i, best)
            rec(best, j)

    rec(0, n - 1)
    return sorted(keep)


def test_dp_hand_computed():
    # collinear interior vertices all dropped
    line = np.array([[0, 0], [1, 0], [2, 0], [3, 0]], dtype=np.float64)
    assert g.dp_keep_indices(line, 0.5).tolist() == [0, 3]
    # a spike above tolerance is kept
    spike = np.array([[0, 0], [1, 5], [2, 0]], dtype=np.float64)
    assert g.dp_keep_indices(spike, 1.0).tolist() == [0, 1, 2]
    # ...and dropped when within tolerance
    assert g.dp_keep_indices(spike, 6.0).tolist() == [0, 2]
    # n <= 2 returns everything
    assert g.dp_keep_indices(np.zeros((2, 2)), 1.0).tolist() == [0, 1]
    assert g.dp_keep_indices(np.zeros((1, 2)), 1.0).tolist() == [0]


def test_dp_tie_keeps_lowest_index():
    # v1=(1,1) and v2=(2,1) are equidistant from chord (0,0)-(3,0):
    # the FIRST max (v1) is the split vertex; v2 then falls within
    # tolerance of the (1,1)-(3,0) chord and is dropped.
    line = np.array([[0, 0], [1, 1], [2, 1], [3, 0]], dtype=np.float64)
    assert g.dp_keep_indices(line, 0.5).tolist() == [0, 1, 3]


def test_dp_degenerate_chord():
    # closed loop: chord endpoints coincide -> plain-distance branch
    loop = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
                    dtype=np.float64)
    kept = g.dp_keep_indices(loop, 1.0).tolist()
    assert kept[0] == 0 and kept[-1] == 4 and len(kept) >= 4


def test_dp_matches_recursive_reference():
    rng = np.random.default_rng(42)
    for trial in range(40):
        n = int(rng.integers(3, 60))
        # integer lattice -> every comparison exact in float64
        pts = rng.integers(-50, 50, size=(n, 2)).astype(np.float64)
        pts[:, 0] = np.arange(n) * 3.0  # monotone x, noisy y
        for tol in (1.0, 4.0, 9.0):
            got = g.dp_keep_indices(pts, tol).tolist()
            assert got == _dp_recursive(pts.tolist(), tol), (trial, tol)


def test_simplify_polylines_spark_map_only(spark):
    lines = [(int(k), [[float(3 * i), float((k * 7 + i * i * 13) % 41 - 20)]
                       for i in range(20 + k % 11)]) for k in range(60)]
    schema = T.StructType([
        T.StructField("line_id", T.LongType()),
        T.StructField("line", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ])
    df = g.simplify_polylines(spark.createDataFrame(lines, schema), tol=4.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only projection, no shuffle
    out = {r["line_id"]: r["kept_idx"] for r in df.collect()}
    for k, line in lines:
        exp = g.dp_keep_indices(np.asarray(line, dtype=np.float64), 4.0)
        assert out[k] == exp.tolist(), k
    # simplified geometry materializes natively from the index array
    mat = df.withColumn("simp", F.expr("transform(kept_idx, i -> line[i])"))
    row = mat.where(F.col("line_id") == 7).select("simp", "kept_idx", "line").first()
    assert row["simp"] == [row["line"][i] for i in row["kept_idx"]]


def test_dp_tolerances_persistence_equivalence():
    """dp_tolerances > tol^2 must reproduce dp_keep_indices(tol) for
    every tolerance — the nesting identity simplify_pyramid rests on."""
    rng = np.random.default_rng(11)
    for trial in range(30):
        n = int(rng.integers(3, 70))
        pts = rng.integers(-50, 50, size=(n, 2)).astype(np.float64)
        pts[:, 0] = np.arange(n) * 3.0
        d2 = g.dp_tolerances(pts)
        assert np.isinf(d2[0]) and np.isinf(d2[-1])
        for tol in (0.5, 1.0, 2.0, 4.0, 8.0, 16.0):
            exp = g.dp_keep_indices(pts, tol).tolist()
            got = np.nonzero(d2 > tol * tol)[0].tolist()
            assert got == exp, (trial, tol)


def test_simplify_pyramid_spark(spark):
    lines = [(int(k), [[float(3 * i), float((k * 7 + i * i * 13) % 41 - 20)]
                       for i in range(20 + k % 11)]) for k in range(30)]
    schema = T.StructType([
        T.StructField("line_id", T.LongType()),
        T.StructField("line", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ])
    df = g.simplify_pyramid(spark.createDataFrame(lines, schema),
                            base_tol=1.0, min_zoom=11, max_zoom=14)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # ONE Python stage for the whole pyramid; selection is native
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan
    by = {(r["line_id"], r["z"]): r["simp"] for r in df.collect()}
    for k, line in lines:
        pts = np.asarray(line, dtype=np.float64)
        prev = None
        for z in range(11, 15):
            kept = g.dp_keep_indices(pts, 1.0 * 2 ** (14 - z))
            assert by[(k, z)] == [line[i] for i in kept], (k, z)
            cur = {tuple(p) for p in by[(k, z)]}
            if prev is not None:
                assert prev <= cur, (k, z)  # coarser zoom nests in finer
            prev = cur
