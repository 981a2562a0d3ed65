"""Z-order layout: key correctness vs a pure-Python bit interleave,
monotone locality, and the actual payoff — per-file bbox tightness of
the written parquet (the min-max stats parquet pruning runs on)."""

import glob
import os

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from osm_poi_cloud_spark.operators import layout as LY


def _morton_py(x: int, y: int) -> int:
    z = 0
    for b in range(16):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_key_matches_bitloop(spark):
    rng = np.random.RandomState(3)
    xs = rng.randint(0, 1 << 16, 300)
    ys = rng.randint(0, 1 << 16, 300)
    df = spark.createDataFrame(pd.DataFrame({
        "x": xs.astype(np.int64), "y": ys.astype(np.int64)}))
    got = (df.select("x", "y", LY.zorder_key(F.col("x"), F.col("y"))
                     .alias("z")).toPandas())
    exp = [_morton_py(int(x), int(y)) for x, y in zip(got.x, got.y)]
    assert list(got.z) == exp
    # corners pin the bit convention: x fills even bits, y odd
    one = spark.createDataFrame(pd.DataFrame(
        {"x": [0xFFFF, 0, 1], "y": [0, 0xFFFF, 1]}))
    vals = one.select(LY.zorder_key(F.col("x"), F.col("y")).alias("z")) \
        .toPandas()["z"].tolist()
    assert vals == [0x55555555, 0xAAAAAAAA, 3]


def test_write_zordered_file_bboxes_are_tight(spark, tmp_path):
    """Uniform points on a 1024x1024 grid written Z-ordered across 16
    files: the sum of per-file bbox areas must be a small fraction of
    16 x the full grid (a single-column sort would leave every file
    spanning the full y range -> fraction ~= 1). This is exactly the
    quantity parquet min-max pruning keys off."""
    rng = np.random.RandomState(9)
    n = 40_000
    pdf = pd.DataFrame({
        "gx": rng.randint(0, 1024, n).astype(np.int64),
        "gy": rng.randint(0, 1024, n).astype(np.int64),
        "payload": np.arange(n),
    })
    path = os.path.join(tmp_path, "zordered")
    LY.write_zordered(spark.createDataFrame(pdf), path, "gx", "gy",
                      num_files=16)

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    assert len(files) >= 8  # range partitioner may merge tiny ends
    total_area = 0.0
    for f in files:
        d = pd.read_parquet(f)
        total_area += float((d.gx.max() - d.gx.min() + 1)
                            * (d.gy.max() - d.gy.min() + 1))
    frac = total_area / (len(files) * 1024.0 * 1024.0)
    assert frac < 0.35, f"file bboxes too loose: {frac:.2f}"

    # nothing lost, helper column dropped
    back = spark.read.parquet(path)
    assert back.count() == n and "_zkey" not in back.columns

    # and a bbox probe's filters actually reach the scan
    probe = back.filter((F.col("gx") < 100) & (F.col("gy") < 100))
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan(gx,100)" in plan
