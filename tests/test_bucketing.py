"""Bucketed tables: the join of two same-bucketed tables must plan
ZERO shuffle exchanges and return exactly the plain join's rows."""

import uuid

import pandas as pd
import pytest
from pyspark.sql import functions as F

from osm_poi_cloud_spark.plans import bucketing as B


@pytest.fixture
def tables(spark):
    tag = uuid.uuid4().hex[:8]
    lt, rt = f"pois_b_{tag}", f"visits_b_{tag}"
    left = spark.range(0, 5000).select(
        F.col("id").alias("poi_id"),
        (F.col("id") % 97).alias("cell"),
        F.md5(F.col("id").cast("string")).alias("name"),
    )
    right = spark.range(0, 20000).select(
        (F.col("id") % 6500).alias("poi_id"),
        (F.col("id") * 7 % 1000).alias("visits"),
    )
    B.write_bucketed(left, lt, "poi_id", 8, sort_cols=("poi_id",))
    B.write_bucketed(right, rt, "poi_id", 8, sort_cols=("poi_id",))
    yield lt, rt, left, right
    spark.sql(f"DROP TABLE IF EXISTS {lt}")
    spark.sql(f"DROP TABLE IF EXISTS {rt}")


def test_bucketed_join_is_shuffle_free_and_correct(spark, tables):
    lt, rt, left, right = tables
    joined = B.bucketed_join(spark, lt, rt, on="poi_id")
    assert B.is_shuffle_free_join(joined), \
        joined._jdf.queryExecution().executedPlan().toString()[:2000]

    got = joined.toPandas().sort_values(["poi_id", "visits"]).reset_index(drop=True)
    exp = (left.join(right, on="poi_id").toPandas()
           .sort_values(["poi_id", "visits"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)],
                                  check_dtype=False)
    assert len(got) > 10000


def test_unbucketed_join_does_shuffle(spark, tables):
    """Control: the same join off raw DataFrames (no bucketing, with
    broadcast disabled) MUST contain a shuffle — proving the assertion
    above is detecting bucketing, not a trivial plan."""
    lt, rt, left, right = tables
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = left.join(right, on="poi_id")
        assert not B.is_shuffle_free_join(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_bucketed_groupby_partial_agg(spark, tables):
    lt, rt, *_ = tables
    agg = spark.table(rt).groupBy("poi_id").agg(F.sum("visits").alias("v"))
    # grouping == bucketing: no exchange needed at all
    assert B.is_shuffle_free_join(agg), \
        agg._jdf.queryExecution().executedPlan().toString()[:1500]


def test_validation(spark):
    with pytest.raises(ValueError):
        B.write_bucketed(spark.range(5), "t_bad", "id", 0)
