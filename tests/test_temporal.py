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


def test_interval_join_semantics_and_bin_invariance(spark):
    from osm_poi_cloud_spark.operators.temporal import interval_join

    la = spark.createDataFrame(pd.DataFrame({
        "a": [1, 2, 3, 4],
        "s": [0.0, 100.0, 250.0, 400.0],
        "e": [50.0, 200.0, 300.0, 400.0],  # 4 is a point interval
    }))
    rb = spark.createDataFrame(pd.DataFrame({
        "b": [10, 11, 12, 13],
        "s": [40.0, 199.0, 301.0, 400.0],
        "e": [60.0, 260.0, 350.0, 500.0],
    }))
    got = interval_join(la, rb, "s", "e", "s", "e", left_id="a", right_id="b",
                        bin_width=30).toPandas()
    pairs = set(map(tuple, got[["a", "b"]].itertuples(index=False)))
    # brute force truth: touch counts as overlap (<=)
    lp = la.toPandas(); rp = rb.toPandas()
    want = {(int(x["a"]), int(y["b"]))
            for _, x in lp.iterrows() for _, y in rp.iterrows()
            if x["s"] <= y["e"] and y["s"] <= x["e"]}
    assert pairs == want and (1, 10) in pairs and (4, 13) in pairs
    # bin width is candidate-generation only: result invariant
    for bw in (7, 100, 1000):
        g2 = interval_join(la, rb, "s", "e", "s", "e", bin_width=bw).toPandas()
        assert set(map(tuple, g2[["a", "b"]].itertuples(index=False))) == want
    # equality key restricts pairs
    la2 = la.withColumn("k", F.col("a") % 2)
    rb2 = rb.withColumn("k", F.col("b") % 2)
    gk = interval_join(la2, rb2, "s", "e", "s", "e", on="k", bin_width=30).toPandas()
    for _, r in gk.iterrows():
        assert r["a"] % 2 == r["b"] % 2 == r["k"]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="bin_width"):
        interval_join(la, rb, "s", "e", "s", "e", bin_width=0)


def test_time_rollup_hand_computed(spark):
    """4 events, 2 types, 2 hours: every grain recomputed by hand.
    The plan must be ONE aggregation over expanded grouping sets
    (an Expand node), not a union of four aggs."""
    import pandas as pd
    from datetime import datetime
    from osm_poi_cloud_spark.operators.temporal import time_rollup

    rows = pd.DataFrame({
        "ts": [datetime(2024, 1, 1, 10, 5), datetime(2024, 1, 1, 10, 50),
               datetime(2024, 1, 1, 11, 5), datetime(2024, 1, 2, 10, 5)],
        "event_type": ["a", "a", "b", "a"],
        "value": [1.25, 2.0, 0.5, -1.75],
    })
    out = time_rollup(spark.createDataFrame(rows)).toPandas()
    idx = out.set_index(["dim", "day", "hour"])

    def row(dim, day, hour):
        return idx.loc[(dim, day, hour)]

    # leaf grain (0): per (type, day, hour)
    r = row("a", "2024-01-01", "2024-01-01 10")
    assert r["n_events"] == 2 and r["value_milli_sum"] == 1250 + 2000
    assert r["grain"] == 0
    r = row("a", "2024-01-02", "2024-01-02 10")
    assert r["n_events"] == 1 and r["value_milli_sum"] == -1750
    # day grain (1)
    r = row("a", "2024-01-01", "ALL")
    assert r["n_events"] == 2 and r["grain"] == 1
    # type grain (3)
    r = row("b", "ALL", "ALL")
    assert r["n_events"] == 1 and r["value_milli_sum"] == 500
    assert r["grain"] == 3
    # grand total (7)
    r = row("ALL", "ALL", "ALL")
    assert r["n_events"] == 4 and r["value_milli_sum"] == 2000
    assert r["grain"] == 7
    # single-shuffle shape: grouping sets expand, one HashAggregate pair
    plan = time_rollup(spark.createDataFrame(rows)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan
    assert plan.count("Exchange") == 1
