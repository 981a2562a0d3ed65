"""Point-to-segment snap join (operators/snap.py)."""

import pytest
from pyspark.sql import functions as F

from osm_poi_cloud_spark.operators import snap as sp


def _d2(px, py, ax, ay, bx, by):
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    if len2 == 0.0:
        t = 0.0
    else:
        t = ((px - ax) * dx + (py - ay) * dy) / len2
        t = min(max(t, 0.0), 1.0)
    qx, qy = ax + t * dx, ay + t * dy
    return (px - qx) * (px - qx) + (py - qy) * (py - qy)


SEGS = [(1, 0.0, 0.0, 10.0, 0.0),      # horizontal
        (2, 5.0, -3.0, 5.0, 3.0),      # vertical, crosses seg 1
        (3, 20.0, 20.0, 26.0, 28.0),   # diagonal
        (4, 40.0, 40.0, 40.0, 40.0)]   # zero length
PTS = [(100, 5.0, 1.0), (101, -2.0, 0.0), (102, 12.0, 0.5),
       (103, 23.0, 24.5), (104, 40.5, 40.5), (105, 300.0, 300.0),
       (106, 5.0, -1.0)]


@pytest.fixture(scope="module")
def segs(spark):
    return spark.createDataFrame(
        SEGS, "seg_id long, ax double, ay double, bx double, by double")


@pytest.fixture(scope="module")
def pts(spark):
    return spark.createDataFrame(PTS, "pid long, x double, y double")


@pytest.mark.parametrize("radius", [1.0, 2.5, 6.0])
def test_candidates_match_brute_force(spark, segs, pts, radius):
    got = {(r["pid"], r["seg_id"]): r["d2"]
           for r in sp.snap_candidates(pts, segs, radius).collect()}
    exp = {}
    for pid, px, py in PTS:
        for sid, ax, ay, bx, by in SEGS:
            d2 = _d2(px, py, ax, ay, bx, by)
            if d2 <= radius * radius:
                exp[(pid, sid)] = d2
    assert got == exp  # incl. bit-equal d2 and the zero-length segment


def test_nearest_and_tie_break(spark, segs, pts):
    got = {r["pid"]: (r["seg_id"], r["d2"])
           for r in sp.snap_nearest(pts, segs, 2.5).collect()}
    # point 100 is 1.0 above seg 1 and 0 away from seg 2's span? no:
    # dist to seg2 (x=5, y in [-3,3]) is 0 horizontally at y=1 -> d2=0
    assert got[100] == (2, 0.0)
    assert got[104][0] == 4  # snaps to the degenerate segment
    assert 105 not in got    # far point matches nothing
    # tie: point 106 at (5,-1): seg1 d2=1.0, seg2 d2=0.0 -> seg2
    assert got[106] == (2, 0.0)
    # plant an exact tie and check min seg_id wins
    tie_segs = spark.createDataFrame(
        [(7, 0.0, 1.0, 10.0, 1.0), (5, 0.0, -1.0, 10.0, -1.0)],
        "seg_id long, ax double, ay double, bx double, by double")
    tie_pt = spark.createDataFrame([(1, 5.0, 0.0)], "pid long, x double, y double")
    r = sp.snap_nearest(tie_pt, tie_segs, 2.0).first()
    assert r["seg_id"] == 5 and r["d2"] == 1.0


def test_partitioning_independent(spark, segs, pts):
    a = sorted(map(tuple, sp.snap_nearest(pts, segs, 2.5).collect()))
    b = sorted(map(tuple, sp.snap_nearest(
        pts.repartition(3), segs.repartition(2), 2.5).collect()))
    assert a == b


def test_validation(spark, segs, pts):
    with pytest.raises(ValueError):
        sp.snap_candidates(pts, segs, 0.0)
