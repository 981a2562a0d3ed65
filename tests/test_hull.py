"""Distributed convex hulls (operators/hull.py): independent
gift-wrapping oracle (different algorithm family from the engine's
monotone chain), degenerate groups, the partial-hull monoid identity,
canonical vertex order, and the DBSCAN composition."""

import random

import pytest
from pyspark.sql import functions as F

from osm_poi_cloud_spark.operators import hull as H


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _gift_wrap(points):
    """Jarvis march, strict hull, CCW from the lexicographic min —
    O(n*h) scalar loop, no sorting-based chain logic shared with the
    engine kernel."""
    pts = sorted(set(points))
    if len(pts) <= 2:
        return pts
    if all(_cross(pts[0], pts[1], c) == 0 for c in pts):
        return [pts[0], pts[-1]]          # fully collinear
    start = pts[0]
    hull, p = [], start
    while True:
        hull.append(p)
        q = None
        for c in pts:
            if c == p:
                continue
            if q is None:
                q = c
                continue
            cr = _cross(p, q, c)
            d2q = (q[0] - p[0]) ** 2 + (q[1] - p[1]) ** 2
            d2c = (c[0] - p[0]) ** 2 + (c[1] - p[1]) ** 2
            if cr < 0 or (cr == 0 and d2c > d2q):
                q = c
        p = q
        if p == start:
            break
    return hull


def _area2(hull):
    if len(hull) < 3:
        return 0.0
    s = 0.0
    for i in range(len(hull)):
        x0, y0 = hull[i]
        x1, y1 = hull[(i + 1) % len(hull)]
        s += x0 * y1 - x1 * y0
    return abs(s)


def _mk_groups(seed=7, n_groups=6, n_pts=120):
    rng = random.Random(seed)
    rows = []
    for g in range(n_groups):
        for _ in range(n_pts):
            rows.append((g, float(rng.randrange(0, 50)),
                         float(rng.randrange(0, 50))))
    # plant duplicates + collinear runs
    rows += [(0, 10.0, 10.0)] * 5
    rows += [(1, float(i), float(i)) for i in range(20)]
    return rows


def test_matches_gift_wrap_oracle(spark):
    rows = _mk_groups()
    df = spark.createDataFrame(rows, "g long, x double, y double")
    got = {r["g"]: r for r in H.convex_hulls(df, "g").collect()}
    by_g = {}
    for g, x, y in rows:
        by_g.setdefault(g, []).append((x, y))
    for g, pts in by_g.items():
        exp = _gift_wrap(pts)
        hull = [(p["x"], p["y"]) for p in got[g]["hull"]]
        assert hull == exp, f"group {g}"
        assert got[g]["n_vertices"] == len(exp)
        assert got[g]["n_points"] == len(set(pts))
        assert got[g]["area2"] == _area2(exp)


def test_degenerate_groups(spark):
    rows = [(1, 5.0, 5.0),                       # single point
            (2, 0.0, 0.0), (2, 3.0, 3.0),        # two points
            (3, 0.0, 0.0), (3, 1.0, 1.0), (3, 2.0, 2.0), (3, 4.0, 4.0)]
    df = spark.createDataFrame(rows, "g long, x double, y double")
    got = {r["g"]: r for r in H.convex_hulls(df, "g").collect()}
    assert [(p["x"], p["y"]) for p in got[1]["hull"]] == [(5.0, 5.0)]
    assert got[1]["area2"] == 0.0
    assert [(p["x"], p["y"]) for p in got[2]["hull"]] \
        == [(0.0, 0.0), (3.0, 3.0)]
    # collinear run collapses to its extremes
    assert [(p["x"], p["y"]) for p in got[3]["hull"]] \
        == [(0.0, 0.0), (4.0, 4.0)]
    assert got[3]["n_points"] == 4 and got[3]["n_vertices"] == 2


def test_partial_hull_monoid_identity(spark):
    rows = _mk_groups(seed=11, n_groups=4, n_pts=300)
    df = spark.createDataFrame(rows, "g long, x double, y double")
    one = H.convex_hulls(df, "g").orderBy("g").collect()
    two = H.convex_hulls(df, "g", n_partials=5).orderBy("g").collect()
    assert [r.asDict(recursive=True) for r in one] \
        == [r.asDict(recursive=True) for r in two]
    with pytest.raises(ValueError):
        H.convex_hulls(df, "g", n_partials=1)


def test_canonical_order_and_partitioning(spark):
    rows = _mk_groups(seed=23)
    df = spark.createDataFrame(rows, "g long, x double, y double")
    a = H.convex_hulls(df, "g").orderBy("g").collect()
    b = H.convex_hulls(df.repartition(17), "g").orderBy("g").collect()
    assert [r.asDict(recursive=True) for r in a] \
        == [r.asDict(recursive=True) for r in b]
    for r in a:
        hull = [(p["x"], p["y"]) for p in r["hull"]]
        assert hull[0] == min(hull)            # starts at lex min
        if len(hull) >= 3:                     # strictly CCW turns
            for i in range(len(hull)):
                o, p1, p2 = (hull[i], hull[(i + 1) % len(hull)],
                             hull[(i + 2) % len(hull)])
                assert _cross(o, p1, p2) > 0


def test_known_square_area(spark):
    pts = [(0, x, y) for x in (0.0, 10.0) for y in (0.0, 10.0)]
    pts += [(0, 5.0, 5.0), (0, 5.0, 0.0)]      # interior + edge point
    df = spark.createDataFrame(pts, "g long, x double, y double")
    r = H.convex_hulls(df, "g").first()
    assert r["n_vertices"] == 4 and r["area2"] == 200.0


def test_dbscan_cluster_hulls(spark):
    # two dense 3x3 blobs far apart + isolated noise
    rows = []
    pid = 0
    for cx, cy in ((0.0, 0.0), (100.0, 100.0)):
        for dx in range(3):
            for dy in range(3):
                rows.append((pid, cx + dx, cy + dy)); pid += 1
    rows.append((pid, 50.0, 50.0))
    df = spark.createDataFrame(rows, "point_id long, lon double, lat double")
    got = H.dbscan_cluster_hulls(df, eps=1.5, min_pts=4).collect()
    assert len(got) == 2
    for r in got:
        assert r["n_points"] == 9 and r["n_vertices"] == 4
        assert r["area2"] == 8.0               # 2 * (2x2 square)
