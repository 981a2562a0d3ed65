"""Mixture planner: hand-computed water-filling, achieved-mixture
accuracy, exact keep-rule vs from-spec XXH64, partition independence."""

import sys
from pathlib import Path

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_poi_cloud_spark.operators import mixture as MX

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def _corpus(spark, per_source):
    rows = []
    i = 0
    for src, (n_docs, tokens_each) in per_source.items():
        for _ in range(n_docs):
            rows.append((i, src, tokens_each))
            i += 1
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "n_tokens"]))


def test_water_filling_hand_computed(spark):
    # avail: a=1000, b=10000, c=10000; budget 6000 at weights 4:1:1
    # round 1: a's share = 4000 > 1000 -> a caps (rate 1e6), budget 5000
    # round 2: b,c get 2500 each -> rate 250000 ppm
    df = _corpus(spark, {"a": (10, 100), "b": (100, 100), "c": (100, 100)})
    rates = MX.plan_mixture(df, {"a": 4.0, "b": 1.0, "c": 1.0}, 6000)
    assert rates == {"a": MX.PPM, "b": 250000, "c": 250000}


def test_zero_weight_and_unknown_source(spark):
    df = _corpus(spark, {"a": (10, 100), "b": (10, 100)})
    rates = MX.plan_mixture(df, {"a": 1.0, "ghost": 5.0}, 500)
    assert rates["a"] == MX.PPM // 2  # 500 of a's 1000 tokens
    assert "b" not in rates or rates.get("b", 0) == 0
    kept = MX.apply_mixture(df, rates).toPandas()
    assert set(kept["source"]) <= {"a"}


def test_budget_exceeding_everything_keeps_all(spark):
    df = _corpus(spark, {"a": (10, 100), "b": (10, 100)})
    rates = MX.plan_mixture(df, {"a": 1.0, "b": 1.0}, 10**9)
    assert rates == {"a": MX.PPM, "b": MX.PPM}
    assert MX.apply_mixture(df, rates).count() == 20


def test_keep_rule_matches_independent_xxh64(spark):
    from make_goldens import xxh64

    df = _corpus(spark, {"a": (200, 50)})
    rates = {"a": 300000}
    kept = set(MX.apply_mixture(df, rates, seed=23).toPandas()["doc_id"])
    seed_h = xxh64(int(23).to_bytes(4, "little"), 42)
    exp = set()
    for d in range(200):
        h = xxh64(int(d).to_bytes(8, "little", signed=True), seed_h)
        if h >= 1 << 63:
            h -= 1 << 64
        if h % MX.PPM < 300000:
            exp.add(d)
    assert kept == exp and 0 < len(kept) < 200


def test_achieved_mixture_and_partition_independence(spark):
    df = _corpus(spark, {"a": (2000, 10), "b": (2000, 10), "c": (2000, 10)})
    rates = MX.plan_mixture(df, {"a": 2.0, "b": 1.0, "c": 1.0}, 30000)
    got = MX.mixture_report(MX.apply_mixture(df, rates)).toPandas() \
        .set_index("source")["tokens_kept"]
    # a: 15000 target of 20000 avail; b,c: 7500 each; +-5% sampling noise
    assert abs(got["a"] - 15000) / 15000 < 0.08
    assert abs(got["b"] - 7500) / 7500 < 0.08
    a = MX.apply_mixture(df, rates).toPandas()["doc_id"]
    b = MX.apply_mixture(df.repartition(17), rates).toPandas()["doc_id"]
    assert sorted(a) == sorted(b)


def test_validation(spark):
    df = _corpus(spark, {"a": (5, 10)})
    with pytest.raises(ValueError):
        MX.plan_mixture(df, {"a": 1.0}, 0)
    with pytest.raises(ValueError):
        MX.plan_mixture(df, {"a": -1.0}, 100)
    assert MX.apply_mixture(df, {}).count() == 0
