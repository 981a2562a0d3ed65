"""Getis-Ord Gi* hotspot detection (operators/hotspot.py)."""

import math

import pytest
from pyspark.sql import functions as F

from osm_poi_cloud_spark.operators import hotspot as hs


def _gi_expected(cells, zoom):
    """Scalar textbook recompute over the full lattice definition."""
    n = 1 << zoom
    N = n * n
    vals = dict(cells)
    tot = sum(vals.values())
    tot2 = sum(v * v for v in vals.values())
    xbar = tot / N
    s = math.sqrt(tot2 / N - xbar * xbar)
    cand = set()
    for (x, y) in vals:
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if 0 <= x + dx < n and 0 <= y + dy < n:
                    cand.add((x + dx, y + dy))
    out = {}
    for (x, y) in cand:
        nsum = sum(vals.get((x + dx, y + dy), 0)
                   for dx in (-1, 0, 1) for dy in (-1, 0, 1))
        w = ((min(x + 1, n - 1) - max(x - 1, 0) + 1)
             * (min(y + 1, n - 1) - max(y - 1, 0) + 1))
        gi = (nsum - xbar * w) / (s * math.sqrt((w * N - w * w) / (N - 1)))
        out[(x, y)] = (vals.get((x, y), 0), w, nsum, math.floor(1e6 * gi))
    return out


CELLS = [((0, 0), 5), ((0, 1), 3), ((1, 0), 2), ((3, 3), 9),
         ((7, 7), 1), ((6, 7), 4), ((5, 2), 2)]


def test_matches_scalar_recompute(spark):
    df = spark.createDataFrame([(x, y, v) for (x, y), v in CELLS],
                               "x long, y long, v long")
    got = {(r["x"], r["y"]): (r["v"], r["w"], r["nsum"], r["gi_ppm"])
           for r in hs.getis_ord_gi_star(df, zoom=3).collect()}
    assert got == _gi_expected(CELLS, 3)


def test_edge_window_sizes_and_empty_candidates(spark):
    df = spark.createDataFrame([(0, 0, 10)], "x long, y long, v long")
    got = {(r["x"], r["y"]): r for r in
           hs.getis_ord_gi_star(df, zoom=3).collect()}
    # corner itself: 2x2 window; its neighbors are empty candidates
    assert got[(0, 0)]["w"] == 4 and got[(0, 0)]["v"] == 10
    assert got[(1, 1)]["w"] == 9 and got[(1, 1)]["v"] == 0
    assert got[(0, 1)]["w"] == 6
    # all candidates see the single occupied cell's mass
    assert all(r["nsum"] == 10 for r in got.values())
    assert set(got) == {(x, y) for x in (0, 1) for y in (0, 1)}


def test_planted_cluster_is_hottest(spark):
    # dense 2x2 block of mass vs scattered singles
    cells = ([(20, 20, 50), (20, 21, 50), (21, 20, 50), (21, 21, 50)]
             + [(i * 7 % 60 + 2, i * 11 % 60 + 2, 1) for i in range(30)])
    df = spark.createDataFrame(cells, "x long, y long, v long")
    top = hs.top_hotspots(df, zoom=6, k=4).collect()
    assert {(r["x"], r["y"]) for r in top} <= {(x, y) for x in (19, 20, 21, 22)
                                              for y in (19, 20, 21, 22)}
    assert all(r["gi_ppm"] > 0 for r in top)


def test_plan_broadcasts_stats_no_cartesian(spark):
    df = spark.createDataFrame([(1, 1, 2), (2, 2, 3)], "x long, y long, v long")
    plan = (hs.getis_ord_gi_star(df, zoom=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row stats cross-join
    assert "CartesianProduct" not in plan


def test_validation(spark):
    df = spark.createDataFrame([(1, 1, 2)], "x long, y long, v long")
    with pytest.raises(ValueError):
        hs.getis_ord_gi_star(df, zoom=31)
    with pytest.raises(ValueError):
        hs.top_hotspots(df, zoom=4, k=0)
