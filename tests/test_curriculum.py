"""Curriculum interleave ordering (operators/curriculum.py)."""

import pytest
from pyspark.sql import functions as F

from osm_poi_cloud_spark.operators import curriculum as cu

W = {"a": 666_667, "b": 333_333}  # 2:1 mixture


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "a" if i % 3 != 0 else "b", float(100 - i)) for i in range(60)]
    rows.append((999, "unknown", 50.0))  # unweighted source -> dropped
    return spark.createDataFrame(rows, "doc_id long, source string, score double")


def test_keys_match_scalar_recompute(spark, docs):
    got = {r["doc_id"]: (r["rank_in_source"], r["interleave_key"])
           for r in cu.curriculum_keys(docs, W).collect()}
    pdf = docs.toPandas()
    pdf = pdf[pdf.source.isin(W)]
    exp = {}
    for src, grp in pdf.groupby("source"):
        grp = grp.sort_values(["score", "doc_id"], ascending=[False, True])
        for rank, doc_id in enumerate(grp.doc_id, start=1):
            exp[doc_id] = (rank, (rank - 1) * 1_000_000 // W[src])
    assert got == exp
    assert 999 not in got


def test_interleave_is_proportional(spark, docs):
    rows = (cu.curriculum_keys(docs, W)
            .orderBy("interleave_key", "source", "rank_in_source")
            .collect())
    first30 = [r["source"] for r in rows[:30]]
    # a 2:1 mixture delivers ~2/3 'a' from the very start
    assert 17 <= first30.count("a") <= 23
    # every prefix is within one document of the ideal share
    seen_a = 0
    for i, s in enumerate(first30, start=1):
        seen_a += s == "a"
        assert abs(seen_a - i * 2 / 3) <= 2.0


def test_materialize_order_is_globally_sorted(spark, docs):
    keyed = cu.curriculum_keys(docs, W)
    ordered = cu.materialize_order(keyed, num_partitions=4)
    # partition-concatenation order == driver-side full sort
    got = [r["doc_id"] for r in ordered.collect()]
    exp = [r["doc_id"] for r in keyed.orderBy(
        "interleave_key", "source", "doc_id").collect()]
    assert got == exp
    # and the plan really range-partitions (no single-partition funnel)
    plan = ordered._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()


def test_validation(spark, docs):
    with pytest.raises(ValueError):
        cu.curriculum_keys(docs, {})
    with pytest.raises(ValueError):
        cu.curriculum_keys(docs, {"a": 0})
    with pytest.raises(ValueError):
        cu.materialize_order(docs, 0)
