"""Trajectory reconstruction (operators/trajectory.py)."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from osm_poi_cloud_spark.operators import trajectory as tj

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(uid, sec, x, y, eid):
    return (uid, eid, T0 + dt.timedelta(seconds=sec), float(x), float(y))


@pytest.fixture(scope="module")
def traj(spark):
    rows = [
        # user 1: unit square walk, 10 s per edge
        _ev(1, 0, 0, 0, 100), _ev(1, 10, 3, 4, 101), _ev(1, 20, 3, 0, 102),
        # a teleport: 1000 units in 1 second
        _ev(1, 21, 1003, 0, 103),
        # user 2: single point (no steps)
        _ev(2, 0, 50, 50, 200),
        # user 3: timestamp tie broken by event id, incl. dt=0 hop
        _ev(3, 5, 0, 0, 301), _ev(3, 5, 6, 8, 302), _ev(3, 7, 6, 8, 303),
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, x double, y double")


def test_steps_hand_computed(spark, traj):
    out = {r["event_id"]: r for r in tj.trajectory_steps(
        traj, order_cols=("event_id",), max_speed_mm_s=100_000).collect()}
    assert out[100]["step_mm"] is None and out[100]["dt_us"] is None
    assert out[101]["step_mm"] == 5000 and out[101]["dt_us"] == 10_000_000
    assert out[102]["step_mm"] == 4000
    # teleport: 1000 units/s = 1e6 mm/s > bound
    assert out[103]["step_mm"] == 1_000_000 and out[103]["teleport"] is True
    assert out[101]["teleport"] is False
    # dt=0 with displacement flags as teleport (division-free rule)
    assert out[302]["dt_us"] == 0 and out[302]["step_mm"] == 10_000
    assert out[302]["teleport"] is True
    # zero displacement at positive dt: not a teleport
    assert out[303]["step_mm"] == 0 and out[303]["teleport"] is False


def test_stats_hand_computed(spark, traj):
    out = {r["user_id"]: r for r in tj.trajectory_stats(
        traj, order_cols=("event_id",), max_speed_mm_s=100_000).collect()}
    assert out[1]["n_points"] == 4
    assert out[1]["path_mm"] == 5000 + 4000 + 1_000_000
    assert out[1]["max_step_mm"] == 1_000_000
    assert out[1]["duration_us"] == 21_000_000
    assert out[1]["n_teleports"] == 1
    assert out[2]["n_points"] == 1 and out[2]["path_mm"] == 0
    assert out[2]["duration_us"] == 0 and out[2]["n_teleports"] == 0
    assert out[3]["n_teleports"] == 1


def test_floor_mm_matches_scalar_math(spark):
    rows = [(1, i, T0 + dt.timedelta(seconds=i),
             float((i * 31) % 17) / 3.0, float((i * 57) % 23) / 7.0)
            for i in range(50)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, x double, y double")
    got = [r["step_mm"] for r in tj.trajectory_steps(df).orderBy("ts").collect()]
    exp = [None]
    for i in range(1, 50):
        dx = rows[i][3] - rows[i - 1][3]
        dy = rows[i][4] - rows[i - 1][4]
        exp.append(math.floor(1000.0 * math.sqrt(dx * dx + dy * dy)))
    assert got == exp


def test_single_shuffle_and_partition_independence(spark, traj):
    df = tj.trajectory_stats(traj, order_cols=("event_id",))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # stats reuse the window's hash
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, tj.trajectory_stats(
        traj.repartition(5), order_cols=("event_id",)).collect()))
    assert a == b


def test_validation(spark, traj):
    with pytest.raises(ValueError):
        tj.trajectory_steps(traj, max_speed_mm_s=0)
