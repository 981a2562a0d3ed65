"""Distributed 2-D skyline vs n^2 brute force."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_poi_cloud_spark.operators.skyline import skyline_2d


def _brute(rows, key=lambda r: ()):
    out = []
    for b in rows:
        dominated = any(
            key(a) == key(b)
            and a[-2] <= b[-2] and a[-1] <= b[-1]
            and (a[-2] < b[-2] or a[-1] < b[-1])
            for a in rows)
        if not dominated:
            out.append(b)
    return sorted(out)


def test_skyline_hand_case(spark):
    rows = [
        (1, 1.0, 5.0),   # frontier
        (2, 2.0, 5.0),   # dominated by 1 (equal y, larger x)
        (3, 2.0, 3.0),   # frontier
        (4, 3.0, 3.0),   # dominated by 3
        (5, 4.0, 1.0),   # frontier
        (6, 4.0, 1.0),   # exact duplicate of 5 -> BOTH kept
        (7, 0.5, 9.0),   # frontier (best x)
        (8, 9.0, 9.0),   # dominated by everything
        (9, None, 1.0),  # NULL coordinate -> excluded
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    got = sorted(r["id"] for r in skyline_2d(df, "x", "y").collect())
    assert got == [1, 3, 5, 6, 7]


def test_skyline_matches_brute_force_random(spark):
    rng = np.random.RandomState(13)
    rows = [(int(i), int(rng.randint(0, 60)), int(rng.randint(0, 60)))
            for i in range(500)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    for nparts in (None, 3, 17):
        got = sorted((r["id"], r["x"], r["y"]) for r in
                     skyline_2d(df, "x", "y", num_partitions=nparts).collect())
        exp = sorted((i, x, y) for i, x, y in rows
                     if (i, x, y) in {tuple(t) for t in _brute(rows)})
        assert got == exp, nparts


def test_skyline_grouped(spark):
    rng = np.random.RandomState(21)
    rows = [(int(i), f"g{i % 5}", float(rng.randint(0, 40)),
             float(rng.randint(0, 40))) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, g string, x double, y double")
    got = sorted((r["g"], r["id"]) for r in
                 skyline_2d(df, "x", "y", group_cols=("g",),
                            num_partitions=7).collect())
    exp = sorted((g, i) for i, g, x, y in rows
                 if not any(a[1] == g and a[2] <= x and a[3] <= y
                            and (a[2] < x or a[3] < y) for a in rows))
    assert got == exp
    assert len({g for g, _ in got}) == 5  # every group has a frontier

    with pytest.raises(ValueError):
        skyline_2d(df, "x", "x")
