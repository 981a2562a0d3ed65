"""DBSCAN operator vs a pure-Python brute-force reimplementation
(n^2 neighbor scan + union-find) on planted-cluster and random data."""

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from osm_poi_cloud_spark.operators.clustering import dbscan


def _dbscan_brute(pdf, eps, min_pts):
    """Independent recompute: neighbor lists, core flags, union-find
    over core-core pairs, border = min core-neighbor label."""
    ids = pdf["pid"].tolist()
    xy = {r.pid: (float(r.x), float(r.y)) for r in pdf.itertuples()}
    neigh = {i: [] for i in ids}
    for i in ids:
        xi, yi = xy[i]
        for j in ids:
            xj, yj = xy[j]
            if math.sqrt((xi - xj) ** 2 + (yi - yj) ** 2) <= eps:
                neigh[i].append(j)
    core = {i for i in ids if len(neigh[i]) >= min_pts}
    parent = {i: i for i in core}

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in core:
        for j in neigh[i]:
            if j in core:
                a, b = find(i), find(j)
                if a != b:
                    parent[max(a, b)] = min(a, b)
    label = {}
    for i in core:
        comp = [j for j in core if find(j) == find(i)]
        label[i] = min(comp)
    out = {}
    for i in ids:
        if i in core:
            out[i] = (label[i], "core")
        else:
            cands = [label[j] for j in neigh[i] if j in core and j != i]
            out[i] = (min(cands), "border") if cands else (-1, "noise")
    return out


def _run(spark, pdf, eps, min_pts):
    got = dbscan(
        spark.createDataFrame(pdf), eps, min_pts,
        id_col="pid", x_col="x", y_col="y",
    ).toPandas().set_index("pid")
    exp = _dbscan_brute(pdf, eps, min_pts)
    assert len(got) == len(pdf)
    for pid, (cl, role) in exp.items():
        assert int(got.loc[pid, "cluster"]) == int(cl), pid
        assert got.loc[pid, "role"] == role, pid


def test_dbscan_planted_clusters(spark):
    """Two tight blobs + a bridge-free scatter: blobs become two
    clusters, scatter points are noise or border exactly as brute."""
    rng = np.random.RandomState(5)
    blob_a = np.array([[100, 100]]) + rng.randint(-5, 6, (20, 2))
    blob_b = np.array([[500, 500]]) + rng.randint(-5, 6, (20, 2))
    scatter = rng.randint(0, 1000, (30, 2))
    xy = np.vstack([blob_a, blob_b, scatter])
    pdf = pd.DataFrame({"pid": np.arange(len(xy)),
                        "x": xy[:, 0].astype(np.int64),
                        "y": xy[:, 1].astype(np.int64)})
    _run(spark, pdf, eps=12.0, min_pts=4)
    roles = dbscan(spark.createDataFrame(pdf), 12.0, 4,
                   id_col="pid", x_col="x", y_col="y") \
        .groupBy("role").count().toPandas().set_index("role")["count"]
    assert roles.get("core", 0) >= 30 and roles.get("noise", 0) >= 10


def test_dbscan_random_grid(spark):
    rng = np.random.RandomState(17)
    pdf = pd.DataFrame({"pid": np.arange(120),
                        "x": rng.randint(0, 400, 120).astype(np.int64),
                        "y": rng.randint(0, 400, 120).astype(np.int64)})
    _run(spark, pdf, eps=40.0, min_pts=3)


def test_dbscan_min_pts_one_everything_core(spark):
    pdf = pd.DataFrame({"pid": [1, 2, 9],
                        "x": [0, 1, 100], "y": [0, 0, 100]})
    got = dbscan(spark.createDataFrame(pdf), 2.0, 1,
                 id_col="pid", x_col="x", y_col="y").toPandas()
    assert set(got["role"]) == {"core"}
    by = got.set_index("pid")["cluster"]
    assert by[1] == 1 and by[2] == 1 and by[9] == 9
