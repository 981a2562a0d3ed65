"""Skew-aware join: result parity with the plain join (the semantic
contract), deterministic salt spread over the hot key, bounded
heavy-key detection, left-outer semantics."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_poi_cloud_spark.operators import skew as SK


def _skewed_tables(spark):
    # key 7 carries 2000 fact rows; every other key has 5
    facts = spark.range(2000).selectExpr(
        "id AS row_id", "7 AS k", "id * 3 AS payload").unionByName(
        spark.range(2000, 2100).selectExpr(
            "id AS row_id", "CAST(id % 20 AS BIGINT) AS k",
            "id * 3 AS payload"))
    dims = spark.range(20).selectExpr(
        "id AS k", "concat('dim', CAST(id AS STRING)) AS label")
    return facts, dims


def test_detect_heavy_keys(spark):
    facts, _ = _skewed_tables(spark)
    assert SK.detect_heavy_keys(facts, "k", threshold=100) == [7]
    assert SK.detect_heavy_keys(facts, "k", threshold=10_000) == []
    with pytest.raises(ValueError):
        SK.detect_heavy_keys(facts, "k", threshold=0)


def test_salted_join_parity_inner(spark):
    facts, dims = _skewed_tables(spark)
    plain = facts.join(dims, on="k").toPandas() \
        .sort_values(["row_id"]).reset_index(drop=True)
    salted = SK.salted_join(facts, dims, "k", [7], "row_id",
                            n_salts=8).toPandas() \
        .sort_values(["row_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        plain[sorted(plain.columns)], salted[sorted(salted.columns)])
    # no salt artifact leaks into the output schema
    assert "_salt" not in salted.columns


def test_salted_join_parity_left_with_misses(spark):
    facts, dims = _skewed_tables(spark)
    dims_missing = dims.filter(F.col("k") != 3)  # key 3 unmatched
    plain = facts.join(dims_missing, on="k", how="left").toPandas()
    salted = SK.salted_join(facts, dims_missing, "k", [7, 3], "row_id",
                            n_salts=4, how="left").toPandas()
    key = ["row_id"]
    pd.testing.assert_frame_equal(
        plain.sort_values(key).reset_index(drop=True)[sorted(plain.columns)],
        salted.sort_values(key).reset_index(drop=True)[sorted(salted.columns)])
    assert salted[salted.k == 3]["label"].isna().all()


def test_salt_spread_and_replication(spark):
    """The hot key's fact rows actually spread over many salts (the
    point of the rewrite), and the dim side replicates ONLY its heavy
    slice — light dim rows appear once in the plan's exploded branch."""
    facts, dims = _skewed_tables(spark)
    n_salts = 8
    salt = F.pmod(F.xxhash64(F.col("row_id")), F.lit(n_salts)).cast("int")
    spread = (facts.filter(F.col("k") == 7).withColumn("s", salt)
              .select("s").distinct().count())
    assert spread == n_salts  # 2000 rows over 8 salts: all hit

    out = SK.salted_join(facts, dims, "k", [7], "row_id", n_salts=n_salts)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan and ("Explode" in plan or "explode" in plan)


def test_empty_heavy_falls_back(spark):
    facts, dims = _skewed_tables(spark)
    out = SK.salted_join(facts, dims, "k", [], "row_id")
    # no salted branch: plain join, nothing exploded (facts itself is a
    # union of two ranges, so assert on the generator instead)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "xplode" not in plan and "_salt" not in plan
    assert out.count() == facts.join(dims, "k").count()


def test_null_keys_survive_left_join_and_detection(spark):
    """r5 ADVICE: array_contains(heavy, NULL) is NULL, which used to
    fail BOTH branch filters and drop NULL-key left rows under
    how='left'; and a heavy NULL key used to TypeError in
    detect_heavy_keys' sorted(). NULL keys must ride the light branch
    (plain-left semantics) and never be reported heavy."""
    facts = spark.createDataFrame(
        [(i, 7 if i < 300 else None, i * 3) for i in range(320)],
        "row_id: long, k: long, payload: long")
    dims = spark.range(20).selectExpr(
        "id AS k", "concat('dim', CAST(id AS STRING)) AS label")
    # detection: 20 NULL rows over threshold must not raise / appear
    assert SK.detect_heavy_keys(facts, "k", threshold=10) == [7]
    plain = facts.join(dims, on="k", how="left").toPandas()
    salted = SK.salted_join(facts, dims, "k", [7], "row_id",
                            n_salts=4, how="left").toPandas()
    key = ["row_id"]
    pd.testing.assert_frame_equal(
        plain.sort_values(key).reset_index(drop=True)[sorted(plain.columns)],
        salted.sort_values(key).reset_index(drop=True)[sorted(salted.columns)])
    assert (salted.k.isna().sum() == 20
            and salted[salted.k.isna()]["label"].isna().all())


def test_validation(spark):
    facts, dims = _skewed_tables(spark)
    with pytest.raises(ValueError):
        SK.salted_join(facts, dims, "k", [7], "row_id", n_salts=1)
    with pytest.raises(ValueError):
        SK.salted_join(facts, dims, "k", [7], "row_id", how="full")
