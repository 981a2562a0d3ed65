"""As-of join: hand-checked semantics, tolerance, forward direction,
partitioning independence, native plan."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_poi_cloud_spark.operators.temporal import asof_join


def _fixtures(spark):
    trades = spark.createDataFrame(pd.DataFrame({
        "sym": ["a", "a", "a", "b", "b", "c"],
        "ts":  [5,   10,  20,  7,   8,   4],
        "qty": [1,   2,   3,   4,   5,   6],
    }))
    quotes = spark.createDataFrame(pd.DataFrame({
        "sym":   ["a", "a", "a", "b", "d"],
        "ts":    [4,   10,  15,  9,   1],
        "price": [100, 110, 120, 200, 999],
    }))
    return trades, quotes


def test_backward_semantics(spark):
    trades, quotes = _fixtures(spark)
    got = asof_join(trades, quotes, "sym").toPandas() \
        .sort_values(["sym", "ts"]).reset_index(drop=True)
    # a@5 -> quote@4; a@10 -> quote@10 (equal matches); a@20 -> quote@15
    assert list(got["r_price"].fillna(-1)) == [100, 110, 120, -1, -1, -1]
    assert list(got["r_ts"].fillna(-1)) == [4, 10, 15, -1, -1, -1]
    # left columns intact
    assert list(got["qty"]) == [1, 2, 3, 4, 5, 6]


def test_forward_and_tolerance(spark):
    trades, quotes = _fixtures(spark)
    fwd = asof_join(trades, quotes, "sym", direction="forward").toPandas() \
        .sort_values(["sym", "ts"]).reset_index(drop=True)
    # a@5 -> quote@10; a@10 -> quote@10; a@20 -> none; b@7,8 -> quote@9
    assert list(fwd["r_price"].fillna(-1)) == [110, 110, -1, 200, 200, -1]
    tol = asof_join(trades, quotes, "sym", tolerance_seconds=2).toPandas() \
        .sort_values(["sym", "ts"]).reset_index(drop=True)
    # a@5 (dist 1) keeps; a@10 (0) keeps; a@20 (5) dropped
    assert list(tol["r_price"].fillna(-1)) == [100, 110, -1, -1, -1, -1]


def test_partitioning_independent_and_native(spark):
    trades, quotes = _fixtures(spark)
    a = asof_join(trades, quotes, "sym").toPandas().sort_values(["sym", "ts"]).reset_index(drop=True)
    b = asof_join(trades.repartition(7), quotes.repartition(3), "sym") \
        .toPandas().sort_values(["sym", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    plan = asof_join(trades, quotes, "sym")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan


def test_equal_time_right_ties_deterministic(spark):
    left = spark.createDataFrame(pd.DataFrame({"k": ["x"], "ts": [10], "v": [1]}))
    right = spark.createDataFrame(pd.DataFrame({
        "k": ["x", "x"], "ts": [10, 10], "price": [7, 9]}))
    for _ in range(3):
        got = asof_join(left, right.repartition(5), "k").toPandas()
        assert list(got["r_price"]) == [9]  # largest payload struct wins


def test_validation(spark):
    trades, quotes = _fixtures(spark)
    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, "sym", direction="nearest")
    with pytest.raises(ValueError, match="differ"):
        asof_join(trades, quotes, "ts")
